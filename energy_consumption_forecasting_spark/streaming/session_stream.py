"""Streaming sessionization via native ``session_window``.

Spark's session window (dynamic-length, gap-merged) is the streaming
twin of the batch gaps-and-islands sessionization in
``queries/more_relational.w_sessionize`` — but here the engine manages
the merge in the state store: per-key sessions extend while events
arrive within the gap, and the watermark finalizes (and evicts) a
session once no event can extend it.  State is bounded by
(active users × open sessions), independent of total input volume.

Boundary semantics: a session window is the half-open interval
[first_ts, last_ts + gap); windows merge on *overlap*, so an event
exactly ``gap`` after the previous one starts a NEW session — the
batch oracle must use ``>=`` on the gap, where a pure lag-based
sessionizer might use ``>``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .source import events_stream

SESSION_GAP = "30 minutes"


def session_agg(events: DataFrame) -> DataFrame:
    """Shared batch/streaming session aggregation over an events frame
    (works identically on a static or streaming DataFrame — the same
    physical operator family, which is the point)."""
    return (
        events.groupBy("user_id", F.session_window("ts", SESSION_GAP).alias("sw"))
        .agg(
            F.count("*").alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,2)"))
            .cast("double")
            .alias("total_value"),
        )
        .select(
            "user_id",
            F.unix_micros("sw.start").alias("session_start_us"),
            F.unix_micros("sw.end").alias("session_end_us"),
            "n_events",
            "total_value",
        )
    )


def session_window_stream(
    spark: SparkSession, events_dir: str, glob: str = "events.parquet"
) -> DataFrame:
    stream = events_stream(spark, events_dir, glob)
    return session_agg(stream.withWatermark("ts", "1 hour"))


def run_sessions_available_now(
    spark: SparkSession, events_dir: str, glob: str = "events.parquet"
) -> DataFrame:
    """Drain the static directory once; final per-session rows."""
    from . import drain_available_now

    return drain_available_now(
        session_window_stream(spark, events_dir, glob), "sessions"
    )
