"""Spark-vs-DuckDB parity for every oracle-backed query at sf0.001.

The same comparison the driver's correctness gate applies at sf0.01:
row count, column-name set, order-insensitive canonical values.
(sf0.001 keeps the pytest loop fast; tools/check_parity.py runs the
full sf0.01 sweep.)
"""

from __future__ import annotations

import math

import pytest

import __spark_entry__ as entrymod
from tests.conftest import SF_SMALL

QS = entrymod.queries()
ORACLES = entrymod.oracle_sql()


def canon_cell(v):
    if v is None:
        return "∅"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        if v == 0:
            return "0"
        return f"{v:.9g}"
    return str(v)


def canon(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i].lower())
    out = sorted(tuple(canon_cell(r[i]) for i in order) for r in rows)
    return out


@pytest.mark.parametrize("name", sorted(ORACLES))
def test_oracle_parity(spark, duck, name):
    sdf = QS[name](spark, SF_SMALL)
    srows = [tuple(r) for r in sdf.collect()]
    res = duck.execute(ORACLES[name])
    dcols = [d[0] for d in res.description]
    drows = res.fetchall()
    assert sorted(c.lower() for c in sdf.columns) == sorted(c.lower() for c in dcols)
    assert len(srows) == len(drows)
    assert canon([c.lower() for c in sdf.columns], srows) == canon(
        [c.lower() for c in dcols], drows
    )


@pytest.mark.parametrize("name", sorted(set(QS) - set(ORACLES)))
def test_rows_only_queries_run(spark, name):
    df = QS[name](spark, SF_SMALL)
    assert df.count() >= 0


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    assert df.count() > 0
    assert set(df.columns) == {"d", "day_share", "daily_consumption"}
