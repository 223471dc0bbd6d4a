"""Streaming sliding-window heavy hitters — trending event types.

``readStream`` over the events directory → 2-day windows sliding by
1 day (each event lands in two windows) with a watermark → per-window
per-type counts in the streaming engine → deterministic top-k per
window ranked on the drained aggregate.  On a static directory with
``availableNow`` the final state equals the batch sliding-window
count, which is what the correctness-gate oracle asserts.

Scale shape: streaming state is keyed by (window, event_type) —
calendar × type cardinality, independent of event rate; the watermark
evicts windows older than the lateness horizon.  The top-k rank runs
on the DRAINED aggregate (windows × types rows, KB-sized), never on
the raw stream — ranking per window is not stream-expressible in
Spark, and does not need to be: the aggregate is already tiny.  For
an unbounded type universe the count side would ride the CMS sketch
(queries/dedup.py sketch_cms_heavyhitters) instead of an exact
groupBy; this op is the exact tier.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .source import events_stream

WINDOW = "2 days"
SLIDE = "1 day"
TOP_K = 3


def heavy_hitters_stream(
    spark: SparkSession, events_dir: str, glob: str = "events.parquet"
) -> DataFrame:
    """Streaming DataFrame: per-sliding-window per-type event counts."""
    stream = events_stream(spark, events_dir, glob)
    return (
        stream.withWatermark("ts", "1 day")
        .groupBy(F.window("ts", WINDOW, SLIDE).alias("w"), "event_type")
        .agg(F.count("*").alias("n"))
        .select(F.to_date(F.col("w.start")).alias("w_start"), "event_type", "n")
    )


def run_heavy_hitters_available_now(
    spark: SparkSession, events_dir: str, glob: str = "events.parquet"
) -> DataFrame:
    """Drain the static directory once, then rank top-k per window.

    GATE-ONLY drain pattern (complete-mode memory sink) shared with
    daily_rollup.py; production routes the same aggregate through the
    foreachBatch upsert of incremental_rollup.py."""
    from . import drain_available_now

    drained = drain_available_now(
        heavy_hitters_stream(spark, events_dir, glob), "hh"
    )
    # bounded frame (windows × types): the rank window partitions on
    # w_start with at most |types| rows per partition — no skew risk.
    r = F.row_number().over(
        Window.partitionBy("w_start").orderBy(F.desc("n"), F.asc("event_type"))
    )
    return (
        drained.withColumn("rnk", r.cast("int"))
        .filter(F.col("rnk") <= TOP_K)
        .select("w_start", "rnk", "event_type", F.col("n").cast("long").alias("n"))
    )
