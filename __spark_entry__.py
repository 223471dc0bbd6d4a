"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

Implementation lives in ``energy_consumption_forecasting_spark/queries/``
(one module per SURVEY.md §2 operator family); this file only exposes the
registry.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from energy_consumption_forecasting_spark.queries import load_all

SMOKE_SF_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query: monthly→daily proportional disaggregation (the EP2
    two-window dataflow, SURVEY.md §2.5 W18) on /root/testdata/sf0.001."""
    qs, _ = load_all()
    return qs["w18_disaggregation"](spark, SMOKE_SF_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    qs, _ = load_all()
    return dict(qs)


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL equivalent for each SQL-expressible query.

    Queries without an oracle entry (custom stateful / iterative /
    model-fitting ops) get the driver's weaker rows-only check.
    """
    _, oracles = load_all()
    return dict(oracles)
