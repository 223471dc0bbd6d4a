"""Streaming hourly→daily rollup — the A1 aggregate as a stream.

``readStream`` over the events directory → 1-day tumbling window with a
watermark for late data → aggregated sink.  On a static directory with
``availableNow`` the result equals the batch A1 aggregate, which is the
test contract (tests/test_streaming.py) and the correctness-gate query.

Scale: the aggregation state is keyed by (window, event_type) — bounded
by calendar × type cardinality, so state store size is independent of
input rate; the watermark bounds retained state to one day + lateness.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .source import events_stream


def daily_rollup_stream(
    spark: SparkSession, events_dir: str, glob: str = "events.parquet"
) -> DataFrame:
    """Streaming DataFrame: per-day per-type counts + exact-decimal mean.

    ``events_dir`` must be a directory (FileStreamSource requirement);
    ``glob`` selects the event files inside it.  The stream schema is
    probed from the files (streaming/source.py), never hardcoded."""
    stream = events_stream(spark, events_dir, glob)
    return (
        stream.withWatermark("ts", "1 day")
        .groupBy(F.window("ts", "1 day").alias("w"), "event_type")
        .agg(
            F.count("*").alias("n"),
            (
                F.sum(F.col("value").cast("decimal(18,2)")).cast("double")
                / F.count("*")
            ).alias("avg_value"),
        )
        .select(
            F.to_date(F.col("w.start")).alias("d"),
            "event_type",
            "n",
            "avg_value",
        )
    )


def run_available_now(
    spark: SparkSession, events_dir: str, glob: str = "events.parquet"
) -> DataFrame:
    """Drain the (static) directory through the streaming engine once and
    return the final aggregate as a batch DataFrame — the batch-equiv
    harness for the correctness gate.

    GATE-ONLY pattern: complete-mode + memory sink re-emits the whole
    result table per trigger and holds it on the driver — fine for a
    bounded drain of (days x types) rows, wrong for an unbounded
    keyspace.  Production streams route through the foreachBatch
    merge in incremental_rollup.py (update-semantics upsert into a
    versioned store); tests/test_incremental_rollup.py asserts the two
    paths agree on the final state."""
    from . import drain_available_now

    return drain_available_now(
        daily_rollup_stream(spark, events_dir, glob), "rollup"
    )
