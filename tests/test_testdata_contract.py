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


# --- distribution pins (round-6 VERDICT item 8) -------------------------------------
# If the driver regenerates the testdata with a different SHAPE (row
# counts, key cardinalities, value domains), diagnose it HERE in one
# failing test instead of a red 371-query sweep.  Exact pins for the
# structural facts queries build on (scale-linear row counts, dimension
# sizes, label domains, embedding width); loose range pins for the
# seeded value distributions (a reseed must not fail the contract, a
# domain change must).
_ROWS = {
    # table: rows per SF keyed by the sf directory suffix
    "region": {"0.001": 5, "0.01": 5, "0.1": 5},
    "nation": {"0.001": 25, "0.01": 25, "0.1": 25},
    "customer": {"0.001": 150, "0.01": 1500, "0.1": 15000},
    "supplier": {"0.001": 10, "0.01": 100, "0.1": 1000},
    "part": {"0.001": 200, "0.01": 2000, "0.1": 20000},
    "orders": {"0.001": 1500, "0.01": 15000, "0.1": 150000},
    "lineitem": {"0.001": 6000, "0.01": 60000, "0.1": 600000},
    "events": {"0.001": 1000, "0.01": 10000, "0.1": 100000},
    "documents": {"0.001": 500, "0.01": 500, "0.1": 5000},
    "embeddings": {"0.001": 500, "0.01": 500, "0.1": 2000},
}


def _sf_key(sf_dir: str) -> str:
    return sf_dir.rstrip("/").rsplit("sf", 1)[-1]


@pytest.mark.parametrize("sf_dir", SF_DIRS)
def test_row_counts_pinned(spark, sf_dir):
    key = _sf_key(sf_dir)
    got = {
        name: load_table(spark, sf_dir, name).count() for name in TABLE_NAMES
    }
    want = {name: _ROWS[name][key] for name in TABLE_NAMES}
    assert got == want, f"testdata regenerated with different row counts at {sf_dir}"


@pytest.mark.parametrize("sf_dir", SF_DIRS)
def test_key_cardinalities_and_domains(spark, sf_dir):
    key = _sf_key(sf_dir)

    o = load_table(spark, sf_dir, "orders").agg(
        F.countDistinct("o_orderkey").alias("ok"),
        F.countDistinct("o_custkey").alias("ck"),
        F.min(F.year("o_orderdate")).alias("y0"),
        F.max(F.year("o_orderdate")).alias("y1"),
        F.min("o_totalprice").alias("p0"),
        F.max("o_totalprice").alias("p1"),
    ).first()
    assert o["ok"] == _ROWS["orders"][key], "o_orderkey is not unique"
    # every customer (minus seed jitter) places orders
    assert o["ck"] >= 0.99 * _ROWS["customer"][key]
    assert 1992 <= o["y0"] <= o["y1"] <= 2005, "order-date window moved"
    assert 0 < o["p0"] and o["p1"] < 1_000_000, "price domain moved"

    li = load_table(spark, sf_dir, "lineitem").agg(
        F.countDistinct("l_partkey").alias("pk"),
        F.countDistinct("l_suppkey").alias("sk"),
        F.min("l_quantity").alias("q0"),
        F.max("l_quantity").alias("q1"),
    ).first()
    assert li["pk"] == _ROWS["part"][key], "lineitem does not cover parts"
    assert li["sk"] == _ROWS["supplier"][key], "lineitem does not cover suppliers"
    assert (li["q0"], li["q1"]) == (1.0, 50.0), "quantity domain moved"

    ev = load_table(spark, sf_dir, "events").agg(
        F.countDistinct("event_id").alias("eid"),
        F.countDistinct("user_id").alias("uid"),
        F.countDistinct("event_type").alias("et"),
        F.min("value").alias("v0"),
    ).first()
    assert ev["eid"] == _ROWS["events"][key], "event_id is not unique"
    assert ev["et"] == 5, "event_type domain changed"
    assert 0 < ev["uid"] < _ROWS["events"][key], "user fan-out collapsed"
    assert ev["v0"] >= 0, "event values went negative"

    doc = load_table(spark, sf_dir, "documents").agg(
        F.countDistinct("doc_id").alias("did"),
        F.countDistinct("source").alias("src"),
        F.min(F.length("text")).alias("t0"),
    ).first()
    assert doc["did"] == _ROWS["documents"][key], "doc_id is not unique"
    assert doc["src"] == 20, "documents.source domain changed"
    assert doc["t0"] > 0, "empty documents appeared"

    em = load_table(spark, sf_dir, "embeddings").agg(
        F.countDistinct("vec_id").alias("vid"),
        F.countDistinct("label").alias("lab"),
        F.min(F.size("embedding")).alias("d0"),
        F.max(F.size("embedding")).alias("d1"),
    ).first()
    assert em["vid"] == _ROWS["embeddings"][key], "vec_id is not unique"
    assert em["lab"] == 10, "embedding label domain changed"
    assert em["d0"] == em["d1"] == 64, "embedding width changed"

    cu = load_table(spark, sf_dir, "customer").agg(
        F.countDistinct("c_custkey").alias("ck"),
        F.countDistinct("c_mktsegment").alias("seg"),
        F.countDistinct("c_nationkey").alias("nk"),
    ).first()
    assert cu["ck"] == _ROWS["customer"][key]
    assert cu["seg"] == 5 and cu["nk"] == 25, "customer dims changed"


def test_load_events_adapts_to_every_physical_ts_type(spark, tmp_path):
    """The round-2 postmortem, proactively: write the SAME events with
    each physical ts encoding a driver regeneration could produce —
    timestamp[ns] (no tz), timestamp[us] (no tz), timestamp[us, UTC],
    and raw int64 epoch-nanos — and assert load_events normalizes all
    four to the identical TimestampType values.  Until now only the
    CURRENT file's branch was exercised; a regeneration flipping the
    encoding hit untested code."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    base = spark.read.parquet(f"{SF_DIRS[0]}/events.parquet").limit(200)
    pdf = base.toPandas()
    want = None
    from energy_consumption_forecasting_spark.tables import load_events

    variants = {}
    ts_us = pa.Array.from_pandas(pdf["ts"]).cast(pa.timestamp("us"))
    variants["us_ntz"] = ts_us
    variants["ns_ntz"] = ts_us.cast(pa.timestamp("ns"))
    variants["us_utc"] = ts_us.cast(pa.timestamp("us", tz="UTC"))
    variants["int64_nanos"] = ts_us.cast(pa.timestamp("ns")).cast(pa.int64())

    others = {
        c: pa.Array.from_pandas(pdf[c]) for c in pdf.columns if c != "ts"
    }
    for name, ts_arr in variants.items():
        path = str(tmp_path / f"events_{name}.parquet")
        cols = {}
        for c in pdf.columns:
            cols[c] = ts_arr if c == "ts" else others[c]
        pq.write_table(pa.table(cols), path)
        df = load_events(spark, path)
        assert isinstance(df.schema["ts"].dataType, T.TimestampType), name
        got = {
            r["event_id"]: r["ts"]
            for r in df.select("event_id", "ts").collect()
        }
        if want is None:
            want = got
        assert got == want, f"{name}: normalized timestamps diverge"
    assert len(want) == 200 and len(set(want.values())) > 1

    # the streaming source shares the footer probe — the nanos file is
    # the branch that crashes Spark's vectorized reader if mishandled
    from energy_consumption_forecasting_spark.streaming.source import (
        events_stream,
    )

    stream = events_stream(spark, str(tmp_path), "events_ns_ntz.parquet")
    assert stream.isStreaming
    assert isinstance(stream.schema["ts"].dataType, T.TimestampType)
