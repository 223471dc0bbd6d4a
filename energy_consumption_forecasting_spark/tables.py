"""Testdata table access.

``load_table(spark, sf_dir, name)`` is the single scan entry point for the
star-schema testdata; reading Parquet directly keeps Catalyst's column
pruning and predicate pushdown intact (check ``PushedFilters`` in
``df.explain``).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

TABLE_NAMES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name not in TABLE_NAMES:
        raise KeyError(f"unknown table {name!r}; expected one of {TABLE_NAMES}")
    path = f"{sf_dir.rstrip('/')}/{name}.parquet"
    if name == "events":
        # events.ts is parquet TIMESTAMP(NANOS), which the vectorized
        # Spark reader rejects; read the raw int64 nanos and rebuild a
        # micros timestamp with exact integer arithmetic (no double
        # round-trip — 1e18 ns overflows a 53-bit mantissa).
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        from pyspark.sql import functions as F

        df = spark.read.parquet(path)
        return df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return spark.read.parquet(path)


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every testdata table as a temp view (for spark.sql use)."""
    for name in TABLE_NAMES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
