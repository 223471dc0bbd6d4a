"""RocksDB state store: the scale-path provider produces results
identical to the default heap-backed provider on the same drain.

State correctness is provider-independent by contract; this pins that
the bundled RocksDB provider actually loads and checkpoints in this
Spark build, so the 100-TB posture (off-heap state on SSD) is a config
flip, not a hope.
"""

from pyspark.sql import functions as F

from tests.conftest import SF_SMALL


def _rollup_result(spark):
    from energy_consumption_forecasting_spark.streaming.daily_rollup import (
        run_available_now,
    )

    return {
        (r["d"], r["event_type"]): (r["n"], round(r["avg_value"], 9))
        for r in run_available_now(spark, SF_SMALL).collect()
    }


def test_rocksdb_provider_matches_default(spark):
    from energy_consumption_forecasting_spark.session import ensure_utc
    from energy_consumption_forecasting_spark.streaming import rocksdb_state_store

    ensure_utc(spark)
    default_res = _rollup_result(spark)
    with rocksdb_state_store(spark):
        rocks_res = _rollup_result(spark)
    assert rocks_res == default_res
    assert len(rocks_res) > 0


def test_rocksdb_stateful_session_windows(spark):
    """A session_window aggregation (real keyed state, not just a
    windowed count) drains identically under RocksDB."""
    import tempfile, uuid

    from energy_consumption_forecasting_spark.session import ensure_utc
    from energy_consumption_forecasting_spark.streaming import (
        pinned_stream_partitions,
        rocksdb_state_store,
    )
    from energy_consumption_forecasting_spark.streaming.session_stream import (
        session_window_stream,
    )

    ensure_utc(spark)

    def drain():
        sink = f"rocks_sess_{uuid.uuid4().hex[:8]}"
        with pinned_stream_partitions(spark):
            q = (
                session_window_stream(spark, SF_SMALL)
                .writeStream.format("memory")
                .queryName(sink)
                .outputMode("complete")
                .option(
                    "checkpointLocation",
                    tempfile.mkdtemp(prefix="ecf_rocks_ckpt_"),
                )
                .trigger(availableNow=True)
                .start()
            )
            q.awaitTermination()
        return {
            tuple(r): None for r in spark.table(sink).collect()
        }

    base = drain()
    with rocksdb_state_store(spark):
        rocks = drain()
    assert rocks == base


def test_rocksdb_changelog_checkpointing(spark):
    """Changelog checkpointing (write the per-batch delta, snapshot
    lazily) is the low-latency commit mode for RocksDB state at scale;
    pin that it engages without breaking results."""
    from energy_consumption_forecasting_spark.session import ensure_utc
    from energy_consumption_forecasting_spark.streaming import rocksdb_state_store

    ensure_utc(spark)
    key = "spark.sql.streaming.stateStore.rocksdb.changelogCheckpointing.enabled"
    base = _rollup_result(spark)
    with rocksdb_state_store(spark):
        spark.conf.set(key, "true")
        try:
            got = _rollup_result(spark)
        finally:
            spark.conf.unset(key)
    assert got == base


def test_observation_metrics_piggyback(spark):
    """df.observe(): ingest-quality counters collected DURING the main
    action — no second scan; the pattern for pipeline metrics at scale."""
    from pyspark.sql import Observation
    from pyspark.sql import functions as F

    from energy_consumption_forecasting_spark.tables import load_table

    docs = load_table(spark, SF_SMALL, "documents")
    obs = Observation("ingest")
    observed = docs.observe(
        obs,
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(F.col("text").isNull().cast("long")).alias("null_text"),
        F.max("n_chars").alias("max_chars"),
    )
    n = observed.count()
    m = obs.get
    assert m["n_rows"] == n and m["null_text"] == 0 and m["max_chars"] > 0
