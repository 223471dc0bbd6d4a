"""Testdata contract probe — the round-2 postmortem test.

Round 2 died because the driver regenerated the testdata and changed
``events.ts`` from parquet TIMESTAMP(NANOS) to ``timestamp[us]``; the
readers assumed the old physical type and either crashed or silently
collapsed every timestamp to 1970.  These tests pin the ENGINE-FACING
contract (what load_table / the stream sources must hand downstream)
while staying agnostic about the on-disk physical types:

* every table raw-reads at every SF;
* ``load_table`` output dtypes are stable: events.ts is TimestampType
  no matter what the files hold, and event time is not collapsed
  (multiple distinct days, year within the plausible window);
* the probed stream schema agrees with the batch reader.

If the driver regenerates the data again and this file goes red, the
fix belongs in tables.py / streaming/source.py — never in a query.
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from energy_consumption_forecasting_spark.tables import (
    TABLE_NAMES,
    load_table,
    probe_arrow_schema,
)

SF_DIRS = [
    d for d in ("/root/testdata/sf0.001", "/root/testdata/sf0.01", "/root/testdata/sf0.1")
    if os.path.isdir(d)
]


@pytest.mark.parametrize("sf_dir", SF_DIRS)
def test_all_tables_raw_readable(spark, sf_dir):
    for name in TABLE_NAMES:
        df = load_table(spark, sf_dir, name)
        assert df.limit(1).count() == 1, f"{name} at {sf_dir} is empty"


@pytest.mark.parametrize("sf_dir", SF_DIRS)
def test_events_ts_engine_facing_type(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    assert isinstance(ev.schema["ts"].dataType, T.TimestampType)


def test_events_time_not_collapsed(spark):
    """The silent round-2 failure mode: micros read as nanos shrink time
    1000x and every timestamp lands on 1970-01-01."""
    ev = load_table(spark, SF_DIRS[0], "events")
    row = ev.agg(
        F.countDistinct(F.to_date("ts")).alias("days"),
        F.min(F.year("ts")).alias("y_min"),
        F.max(F.year("ts")).alias("y_max"),
    ).collect()[0]
    assert row["days"] > 1, "all events collapsed onto one day"
    assert 2000 <= row["y_min"] <= row["y_max"] <= 2100, (
        f"event years [{row['y_min']}, {row['y_max']}] outside plausible "
        "window — timestamp unit mis-read"
    )


def test_stream_schema_matches_batch(spark):
    """Probe-derived stream source and batch load_table must agree on
    columns and on the normalized ts type."""
    from energy_consumption_forecasting_spark.streaming.source import (
        events_stream,
    )

    sf = SF_DIRS[0]
    batch = load_table(spark, sf, "events")
    stream = events_stream(spark, sf, "events.parquet")
    assert stream.isStreaming
    assert [f.name for f in stream.schema] == [f.name for f in batch.schema]
    assert isinstance(stream.schema["ts"].dataType, T.TimestampType)


def test_probe_is_footer_only(spark):
    """probe_arrow_schema must work on every table path (file or dir)."""
    for name in TABLE_NAMES:
        sch = probe_arrow_schema(f"{SF_DIRS[0]}/{name}.parquet")
        assert len(sch) > 0


def test_docs_stream_has_event_time(spark):
    """documents currently ships without ts; docs_stream must synthesize a
    deterministic one so watermarked operators still work."""
    from energy_consumption_forecasting_spark.streaming.source import (
        docs_stream,
    )

    stream = docs_stream(spark, SF_DIRS[0], "documents.parquet")
    assert "ts" in stream.columns
    assert isinstance(stream.schema["ts"].dataType, T.TimestampType)


def test_non_utc_session_date_grouping(spark):
    """The driver hands an arbitrary session; a non-UTC timezone must
    not shift date-grouped events results (ensure_utc in _util.tbl is
    the guard — this pins it)."""
    from energy_consumption_forecasting_spark.queries import load_all

    qs, _ = load_all()

    def run():
        daily = {
            r["ship_date"]: round(r["avg_qty"], 9)
            for r in qs["a1_daily_mean"](spark, SF_DIRS[0]).collect()
        }
        pivot = {
            tuple(r) for r in qs["a3_pivot"](spark, SF_DIRS[0]).collect()
        }
        return daily, pivot

    prev = spark.conf.get("spark.sql.session.timeZone")
    try:
        utc = run()
        spark.conf.set("spark.sql.session.timeZone", "America/New_York")
        ny = run()
    finally:
        spark.conf.set("spark.sql.session.timeZone", prev)
    assert utc == ny and len(utc[0]) > 0 and len(utc[1]) > 0
