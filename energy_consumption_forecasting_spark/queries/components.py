"""Transitive dedup clustering: connected components over near-dup pairs.

Pairwise near-dup detection (``dedup_minhash_lsh``, ``dedup_exact``) is
only half of a dedup pipeline: if A~B and B~C, all three must land in
ONE cluster even when the (A, C) pair was never emitted.  That is a
connected-components problem on the candidate-pair graph.

Spark-first design (no GraphFrames dependency): iterative **min-label
propagation with pointer jumping** over plain DataFrames —

* ``labels(v) ← min(labels(v), min over neighbors labels(u))`` each
  round (one shuffle join + one groupBy-min), then
* pointer jumping ``labels(v) ← labels(labels(v))`` (one more equi-join),
  which doubles the propagation distance per round, so convergence is
  O(log diameter) rounds, not O(diameter) — the same round-shrinking
  idea as the large-star/small-star algorithm (Kiveris et al.,
  "Connected Components in MapReduce and Beyond", SoCC'14).
* ``localCheckpoint`` after every round truncates the lineage so the
  plan does not grow exponentially with iterations.

Every step is an equi-join / groupBy on bounded-width id columns — no
cartesian products, no driver-side adjacency structures; at 100 TB the
per-round cost is two shuffles of (id, id) pairs.  Near-dup components
are shallow (dup clusters are near-cliques), so rounds stay in single
digits.

The DuckDB oracle computes the same fixpoint declaratively with a
recursive CTE (full reachability → min reachable id per node).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from . import query
from ._util import tbl
from .dedup import (
    _MINHASH_SQL,
    _SHINGLES_SQL,
    _band_rows,
    _minhash_sigs,
    _pairs_from_members,
)

MAX_CC_ROUNDS = 12


def _exact_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-duplicate edges (md5(text) groups), via bounded member
    lists — identical-text docs with < 3 tokens have no shingles, so
    LSH alone would miss them."""
    members = (
        tbl(spark, sf_dir, "documents")
        .groupBy(F.md5("text").alias("h"))
        .agg(F.array_sort(F.collect_list("doc_id")).alias("docs"))
        .filter(F.size("docs") >= 2)
    )
    return _pairs_from_members(members)


def _lsh_candidate_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash-LSH candidate edges — same banding as dedup_minhash_lsh."""
    members = (
        _band_rows(_minhash_sigs(spark, sf_dir))
        .groupBy("band", "bucket")
        .agg(F.array_sort(F.collect_list("doc_id")).alias("docs"))
        .filter(F.size("docs") >= 2)
    )
    return _pairs_from_members(members).distinct()


def connected_components(nodes: DataFrame, edges: DataFrame) -> DataFrame:
    """Min-label connected components over (v) nodes and (doc_a, doc_b)
    edges; returns (v, comp) with comp = min node id in the component.

    Deterministic: the fixpoint is independent of iteration order."""
    sym = (
        edges.select(F.col("doc_a").alias("s"), F.col("doc_b").alias("t"))
        .union(edges.select(F.col("doc_b").alias("s"), F.col("doc_a").alias("t")))
        .persist()
    )
    labels = nodes.select(
        F.col("v"), F.col("v").alias("comp")
    ).localCheckpoint(eager=True)
    try:
        for _ in range(MAX_CC_ROUNDS):
            msgs = sym.join(
                labels.select(F.col("v").alias("s"), "comp"), "s"
            ).select(F.col("t").alias("v"), "comp")
            new = (
                labels.union(msgs)
                .groupBy("v")
                .agg(F.min("comp").alias("comp"))
            )
            # Pointer jumping: follow one extra hop through the label
            # table itself — comp(v) ← comp(comp(v)).
            parent = new.select(
                F.col("v").alias("pv"), F.col("comp").alias("pcomp")
            )
            new = (
                new.join(parent, F.col("comp") == F.col("pv"), "left")
                .select("v", F.coalesce("pcomp", "comp").alias("comp"))
                .localCheckpoint(eager=True)
            )
            changed = (
                new.join(labels.withColumnRenamed("comp", "old"), "v")
                .filter(F.col("comp") != F.col("old"))
                .count()
            )
            labels = new
            if changed == 0:
                return labels
        raise RuntimeError(
            f"connected_components did not converge in {MAX_CC_ROUNDS} rounds"
        )
    finally:
        sym.unpersist()


@query(
    "dedup_connected_components",
    oracle=f"""
    WITH RECURSIVE {_SHINGLES_SQL},
    {_MINHASH_SQL},
    cand AS (
      SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
      FROM bands a JOIN bands b
        ON a.band = b.band AND a.bucket = b.bucket AND a.doc_id < b.doc_id
    ),
    exact_pairs AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
      FROM documents a JOIN documents b
        ON md5(a.text) = md5(b.text) AND a.doc_id < b.doc_id
    ),
    edges AS (
      SELECT doc_a, doc_b FROM cand
      UNION
      SELECT doc_a, doc_b FROM exact_pairs
    ),
    sym AS (
      SELECT doc_a AS s, doc_b AS t FROM edges
      UNION
      SELECT doc_b, doc_a FROM edges
    ),
    reach(v, r) AS (
      SELECT doc_id, doc_id FROM documents
      UNION
      SELECT sym.t, reach.r FROM sym JOIN reach ON sym.s = reach.v
    ),
    comp AS (
      SELECT v AS doc_id, CAST(MIN(r) AS BIGINT) AS component
      FROM reach GROUP BY v
    )
    SELECT doc_id, component,
           CAST(COUNT(*) OVER (PARTITION BY component) AS BIGINT) AS csize
    FROM comp
    """,
)
def dedup_connected_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cluster id per document: transitive closure of the MinHash-LSH
    candidate pairs ∪ exact-hash duplicate pairs.  Every doc gets a
    component (singletons label themselves) plus the component size —
    the table a keep-one-per-cluster policy consumes."""
    nodes = tbl(spark, sf_dir, "documents").select(F.col("doc_id").alias("v"))
    edges = _lsh_candidate_pairs(spark, sf_dir).union(
        _exact_pairs(spark, sf_dir)
    )
    labels = connected_components(nodes, edges)
    w = Window.partitionBy("component")
    return labels.select(
        F.col("v").alias("doc_id"), F.col("comp").alias("component")
    ).withColumn("csize", F.count("*").over(w))


@query("graph_pagerank")
def graph_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PageRank over the bipartite part↔supplier supply graph derived
    from lineitem (edges both directions, so rank flows between the
    node classes).  Rows-only: double power iteration is aggregation-
    order-dependent in the last bits; the operator itself is verified
    against a driver-side reference implementation in
    tests/test_pagerank.py."""
    from ..operators.pagerank import pagerank

    li = tbl(spark, sf_dir, "lineitem").select(
        F.concat(F.lit("p"), F.col("l_partkey").cast("string")).alias("src"),
        F.concat(F.lit("s"), F.col("l_suppkey").cast("string")).alias("dst"),
    ).distinct()
    edges = li.union(li.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
    # fixed iteration count, no convergence probes: each probe is a
    # join+agg job, and 10 damped rounds are plenty for a stable top-50
    ranks = pagerank(edges, max_iter=10, tol=None)
    return ranks.select(
        "v", F.round("rank", 9).alias("rank_r9")
    ).orderBy(F.desc("rank_r9"), "v").limit(50)
