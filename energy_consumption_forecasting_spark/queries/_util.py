"""Shared helpers for query definitions."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..session import ensure_utc
from ..tables import load_table


def tbl(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    ensure_utc(spark)
    return load_table(spark, sf_dir, name)
