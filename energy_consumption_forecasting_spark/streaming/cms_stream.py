"""Streaming Count-Min-Sketch — mergeable sketch state as a stream.

The streaming twin of ``sketch_cms_heavyhitters``
(queries/behavior.py): documents arrive as micro-batches, each batch's
token occurrences fold into (a) the 4×256-bucket CMS and (b) the
per-token exact counts used to verify the estimates.  Both states are
INTEGER-ADDITIVE, so micro-batch boundaries cannot move a single
count — the drained result is bit-identical to the one-shot batch
sketch, which is exactly what sharing the batch oracle asserts.

Scale shape: the CMS side is the point — its streaming state is ≤
salts × 256 rows no matter the token rate (the sketch property that
makes frequency tracking viable on an unbounded stream); the exact
per-token count side is the VERIFICATION harness (vocabulary-bounded
here), which a production stream would drop or replace with sampled
ground truth.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .source import docs_stream

from ..queries.behavior import _CMS_SALTS, _CMS_TOPK  # one source of truth with the batch sketch


def _occ(stream: DataFrame) -> DataFrame:
    return stream.select(
        F.explode(
            F.filter(F.split("text", r"\s+"), lambda x: x != "")
        ).alias("w")
    )


def _bucket(salt_col, w_col):
    return F.substring(F.md5(F.concat(salt_col, F.lit(":"), w_col)), 1, 2)


def run_cms_available_now(
    spark: SparkSession, docs_dir: str, glob: str = "documents.parquet"
) -> DataFrame:
    """Drain the static directory through TWO streaming aggregations
    (token counts; CMS bucket counts), then derive the heavy-hitter
    report exactly as the batch query does."""
    from . import drain_available_now

    salts = F.explode(F.array(*[F.lit(s) for s in _CMS_SALTS])).alias("salt")

    counts = drain_available_now(
        _occ(docs_stream(spark, docs_dir, glob))
        .groupBy("w")
        .agg(F.count("*").alias("true_cnt")),
        "cms_counts",
    )
    cms = drain_available_now(
        _occ(docs_stream(spark, docs_dir, glob))
        .select("w", salts)
        .groupBy("salt", _bucket(F.col("salt"), F.col("w")).alias("bucket"))
        .agg(F.count("*").alias("bucket_cnt")),
        "cms_buckets",
    )

    top = counts.orderBy(F.desc("true_cnt"), "w").limit(_CMS_TOPK)
    probes = top.select(
        "w", "true_cnt", F.explode(F.array(*[F.lit(s) for s in _CMS_SALTS])).alias("salt")
    ).withColumn("bucket", _bucket(F.col("salt"), F.col("w")))
    est = (
        probes.join(F.broadcast(cms), ["salt", "bucket"])
        .groupBy("w", "true_cnt")
        .agg(F.min("bucket_cnt").alias("cms_est"))
    )
    return est.select(
        "w",
        F.col("true_cnt").cast("long").alias("true_cnt"),
        F.col("cms_est").cast("long").alias("cms_est"),
        (F.col("cms_est") - F.col("true_cnt")).cast("long").alias("overcount"),
    )
