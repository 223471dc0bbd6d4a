"""Similarity search over embeddings (SURVEY §7 phase 5).

Brute-force cosine top-k is the verification baseline; the bucketed
variant is the scale path (prune before you score).  Both use the
sequential-fold vector math from functions/vectors.py — JVM-side,
bit-deterministic, no Python in the hot loop.

Scale design: brute force is O(Q·N) and only acceptable for small query
sets; the bucketed search keys candidates on a coarse partition (here
the stored ``label``, standing in for an IVF/k-means cell id) so each
query scores one bucket instead of the corpus.  MLlib's
BucketedRandomProjectionLSH variant lives in ml_queries.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from . import query
from ..functions.vectors import as_double, cosine
from ._util import tbl

N_QUERIES = 5
TOP_K = 5

_COS_SQL = (
    "list_dot_product(q.v, c.v)"
    " / (sqrt(list_dot_product(q.v, q.v)) * sqrt(list_dot_product(c.v, c.v)))"
)


# --- brute-force cosine top-k ---------------------------------------------------
@query(
    "sim_topk_bruteforce",
    oracle=f"""
    WITH e AS (SELECT vec_id, label, embedding::DOUBLE[] AS v FROM embeddings),
    q AS (SELECT * FROM e WHERE vec_id < {N_QUERIES}),
    scored AS (
      SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
             {_COS_SQL} AS cos_sim
      FROM q, e c
      WHERE q.vec_id <> c.vec_id
    )
    SELECT query_id, neighbor_id, cos_sim,
           CAST(rnk AS INT) AS rank
    FROM (
      SELECT *, row_number() OVER (
        PARTITION BY query_id ORDER BY cos_sim DESC, neighbor_id) AS rnk
      FROM scored
    )
    WHERE rnk <= {TOP_K}
    """,
)
def sim_topk_bruteforce(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact top-k cosine neighbors for a query set: broadcast the
    queries against the corpus, score with fold dot products, keep the
    per-query top-k with a rank window partitioned by query (never a
    global sort)."""
    e = tbl(spark, sf_dir, "embeddings").select(
        "vec_id", "label", as_double("embedding").alias("v")
    )
    q = e.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"), F.col("v").alias("qv")
    )
    scored = (
        e.join(F.broadcast(q), F.col("query_id") != F.col("vec_id"))
        .select(
            "query_id",
            F.col("vec_id").alias("neighbor_id"),
            cosine(F.col("qv"), F.col("v")).alias("cos_sim"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos_sim").desc(), F.col("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("int"))
        .filter(F.col("rank") <= TOP_K)
        .select("query_id", "neighbor_id", "cos_sim", "rank")
    )


# --- bucketed (IVF-style) approximate search --------------------------------------
@query(
    "sim_bucketed_ann",
    oracle=f"""
    WITH e AS (SELECT vec_id, label, embedding::DOUBLE[] AS v FROM embeddings),
    q AS (SELECT * FROM e WHERE vec_id < {N_QUERIES}),
    scored AS (
      SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
             {_COS_SQL} AS cos_sim
      FROM q JOIN e c ON q.label = c.label AND q.vec_id <> c.vec_id
    )
    SELECT query_id, neighbor_id, cos_sim, CAST(rnk AS INT) AS rank
    FROM (
      SELECT *, row_number() OVER (
        PARTITION BY query_id ORDER BY cos_sim DESC, neighbor_id) AS rnk
      FROM scored
    )
    WHERE rnk <= 3
    """,
)
def sim_bucketed_ann(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-style ANN: candidates are restricted to the query's coarse
    bucket (label = assigned centroid cell), turning O(N) scans into
    O(N / n_cells) bucket joins.  Same scoring algebra as brute force —
    only the candidate generation changes."""
    e = tbl(spark, sf_dir, "embeddings").select(
        "vec_id", "label", as_double("embedding").alias("v")
    )
    q = e.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"),
        F.col("label").alias("qlabel"),
        F.col("v").alias("qv"),
    )
    scored = (
        e.join(
            F.broadcast(q),
            (F.col("qlabel") == F.col("label"))
            & (F.col("query_id") != F.col("vec_id")),
        )
        .select(
            "query_id",
            F.col("vec_id").alias("neighbor_id"),
            cosine(F.col("qv"), F.col("v")).alias("cos_sim"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos_sim").desc(), F.col("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("int"))
        .filter(F.col("rank") <= 3)
        .select("query_id", "neighbor_id", "cos_sim", "rank")
    )


# --- threshold similarity join -------------------------------------------------------
@query(
    "sim_threshold_join",
    oracle="""
    WITH e AS (SELECT vec_id, label, embedding::DOUBLE[] AS v FROM embeddings),
    p AS (
      SELECT a.vec_id AS vec_a, b.vec_id AS vec_b, a.label AS label,
             list_dot_product(a.v, b.v)
               / (sqrt(list_dot_product(a.v, a.v)) * sqrt(list_dot_product(b.v, b.v)))
               AS cos_sim
      FROM e a JOIN e b ON a.label = b.label AND a.vec_id < b.vec_id
    )
    SELECT vec_a, vec_b, label, cos_sim FROM p WHERE cos_sim >= 0.2
    """,
)
def sim_threshold_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """All same-bucket pairs above a cosine threshold — the similarity-
    join building block for clustering/near-dup sweeps."""
    from ..functions.vectors import cosine_prenormed, with_norm

    e = with_norm(
        tbl(spark, sf_dir, "embeddings").select(
            "vec_id", "label", as_double("embedding").alias("v")
        )
    )
    a = e.alias("a")
    b = e.alias("b")
    cos = cosine_prenormed(
        F.col("a.v"), F.col("b.v"), F.col("a.nrm"), F.col("b.nrm")
    )
    return (
        a.join(
            b,
            (F.col("a.label") == F.col("b.label"))
            & (F.col("a.vec_id") < F.col("b.vec_id")),
        )
        .select(
            F.col("a.vec_id").alias("vec_a"),
            F.col("b.vec_id").alias("vec_b"),
            F.col("a.label").alias("label"),
            cos.alias("cos_sim"),
        )
        .filter(F.col("cos_sim") >= 0.2)
    )
