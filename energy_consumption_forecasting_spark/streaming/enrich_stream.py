"""Stream-static enrichment join: the streaming pattern missing from
the other gate drains — a live event stream joined against a STATIC
dimension table (customer segments), then aggregated.

This is the canonical "enrich at ingest" topology: the dim side is a
batch DataFrame, so Spark plans a broadcast hash join against every
micro-batch (no state store involvement for the join — only the
downstream aggregation holds state).  At 100 TB of stream the dim table
rides the executors once per batch trigger; the join never shuffles the
stream.

Gate contract: availableNow drain over the static events directory ==
the identical batch aggregation == the DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .source import events_stream


def enriched_segment_agg(events: DataFrame, customer: DataFrame) -> DataFrame:
    """(event stream|frame) x customer dim -> per (segment, event_type)
    counts and exact-decimal value sums."""
    dim = customer.select(
        F.col("c_custkey").alias("user_id"), "c_mktsegment"
    )
    return (
        events.join(F.broadcast(dim), "user_id")
        .groupBy("c_mktsegment", "event_type")
        .agg(
            F.count("*").alias("n"),
            F.sum(F.col("value").cast("decimal(18,2)"))
            .cast("double")
            .alias("total_value"),
        )
    )


def enrich_stream(
    spark: SparkSession,
    events_dir: str,
    customer: DataFrame,
    glob: str = "events.parquet",
) -> DataFrame:
    stream = events_stream(spark, events_dir, glob)
    return enriched_segment_agg(stream, customer)


def run_enrich_available_now(
    spark: SparkSession,
    events_dir: str,
    customer: DataFrame,
    glob: str = "events.parquet",
) -> DataFrame:
    from . import drain_available_now

    return drain_available_now(
        enrich_stream(spark, events_dir, customer, glob), "enrich"
    )
