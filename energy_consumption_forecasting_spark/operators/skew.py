"""Skew mitigation + co-location operators (ARCHITECTURE §scale).

Two techniques the 100 TB plan needs beyond AQE's automatic skew-join
splitting:

* **Salted aggregation** — two-phase aggregate for heavy-hitter keys:
  partial aggregate on (key, salt), then final aggregate on key.  The
  hot key's rows spread over ``n_salts`` reducers instead of one.
* **Salted join** — replicate the small side per salt so a skewed probe
  key joins against every salt bucket.
* **Bucketed tables** — co-located joins: writing both fact tables
  bucketed by the join key lets Spark sort-merge join them with ZERO
  exchange (the shuffle happened once at write time and is amortized
  over every subsequent join).  See tests/test_scale_ops.py for the
  no-Exchange plan assertion.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_sum(
    df: DataFrame,
    key_cols: list[str],
    value_col: str,
    n_salts: int = 16,
    out_col: str | None = None,
) -> DataFrame:
    """Two-phase sum: groupBy(key, salt) → groupBy(key).

    Decimal-safe: sums are associative, so the two-phase result is
    exactly the single-phase result.  (Means/variances must aggregate
    (sum, count) pairs, not partial means.)"""
    out_col = out_col or f"sum_{value_col}"
    salted = df.withColumn(
        "__salt", (F.crc32(F.concat_ws("|", *key_cols)) + F.spark_partition_id()) % n_salts
    )
    partial = salted.groupBy(*key_cols, "__salt").agg(
        F.sum(value_col).alias("__partial")
    )
    return partial.groupBy(*key_cols).agg(F.sum("__partial").alias(out_col))


def salted_join(
    big: DataFrame,
    small: DataFrame,
    key: str,
    n_salts: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Join a skew-keyed big side against a small side by salting the
    big side and replicating the small side across all salts."""
    big_salted = big.withColumn("__salt", (F.rand(seed=42) * n_salts).cast("int"))
    small_rep = small.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)))
    )
    joined = big_salted.join(small_rep, [key, "__salt"], how)
    return joined.drop("__salt")


def write_bucketed(
    df: DataFrame, name: str, bucket_col: str, n_buckets: int = 8
) -> None:
    """Persist as a bucketed managed table — subsequent equi-joins /
    aggregations on ``bucket_col`` between co-bucketed tables need no
    exchange."""
    (
        df.write.mode("overwrite")
        .bucketBy(n_buckets, bucket_col)
        .sortBy(bucket_col)
        .saveAsTable(name)
    )
