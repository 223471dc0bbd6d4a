"""Shared helpers for query definitions."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..session import ensure_utc
from ..tables import load_table


def tbl(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    ensure_utc(spark)
    return load_table(spark, sf_dir, name)


def fanout(df: DataFrame, cols: str | list[str] = "doc_id") -> DataFrame:
    """Unsplittable-source fan-out: repartition to default parallelism
    before a compute-heavy row-local stage.

    The testdata parquet files are single row groups, so Spark cannot
    split the scan — without this, hash/HOF-heavy projections run as
    ONE task (measured: minhash sketches 2.7s single-core → ~0.6s
    spread over 32).  The shuffle payload is the source bytes
    themselves, exactly the cost a properly-split source (many row
    groups / files) would not pay; at 100 TB the input is splittable
    and callers can drop this, but it is also harmless there — one
    extra map-side pass.  Row-local downstream math is unaffected by
    the reordering."""
    cols = [cols] if isinstance(cols, str) else cols
    return df.repartition(df.sparkSession.sparkContext.defaultParallelism, *cols)
