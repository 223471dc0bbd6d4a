"""PageRank over plain DataFrames — iterative graph analytics.

Together with connected components (queries/components.py) this covers
the two standard iterative-graph shapes: label fixpoints and weighted
power iteration.  No GraphFrames dependency: each iteration is

    contribs = edges ⋈ ranks  →  groupBy(dst).sum  →  damping update

i.e. one hash join + one aggregation, both shuffling on bounded-width
id columns.  ``localCheckpoint`` truncates lineage each round
(iterative plans otherwise grow exponentially); dangling-node mass is
redistributed uniformly (the standard correction) via one scalar agg.

Scale: the rank and out-degree tables are (id, double) — tiny relative
to edges; the per-iteration cost is the edge-table shuffle.  At 100 TB
of edges you pre-partition ``edges`` by src so the join with ranks is
co-partitioned across iterations and only the contribution aggregation
re-shuffles.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pagerank(
    edges: DataFrame,
    damping: float = 0.85,
    max_iter: int = 20,
    tol: float | None = 1e-6,
    check_every: int = 4,
) -> DataFrame:
    """(src, dst) directed edges → (v, rank); ranks sum to 1.

    Driver-side scalar jobs are the iteration tax, so they are kept off
    the hot path: whether the graph HAS dangling nodes is detected once
    up front (a dangling-free graph — e.g. any symmetrized one — skips
    the per-iteration mass collect entirely), and the L1-delta
    convergence probe runs every ``check_every`` rounds (``tol=None``
    disables it for fixed-iteration runs)."""
    nodes = (
        edges.select(F.col("src").alias("v"))
        .union(edges.select(F.col("dst").alias("v")))
        .distinct()
        .persist()
    )
    n = nodes.count()
    out_deg = edges.groupBy("src").agg(F.count("*").alias("deg")).persist()
    has_dangling = nodes.join(
        out_deg, nodes.v == out_deg.src, "left_anti"
    ).limit(1).count() > 0
    ranks = nodes.select("v", F.lit(1.0 / n).alias("rank")).localCheckpoint(
        eager=True
    )
    e = edges.persist()
    try:
        for it in range(max_iter):
            with_deg = ranks.join(
                out_deg, ranks.v == out_deg.src, "left"
            ).select("v", "rank", "deg")
            # mass sitting on dangling nodes (no out-edges) — spread it
            dangling = (
                with_deg.filter(F.col("deg").isNull())
                .agg(F.coalesce(F.sum("rank"), F.lit(0.0)))
                .collect()[0][0]
                if has_dangling
                else 0.0
            )
            contribs = (
                e.join(
                    with_deg.filter(F.col("deg").isNotNull()).select(
                        F.col("v").alias("src"),
                        (F.col("rank") / F.col("deg")).alias("share"),
                    ),
                    "src",
                )
                .groupBy("dst")
                .agg(F.sum("share").alias("inflow"))
            )
            base = (1.0 - damping) / n + damping * dangling / n
            new = (
                nodes.join(contribs, nodes.v == contribs.dst, "left")
                .select(
                    "v",
                    (
                        F.lit(base)
                        + F.lit(damping) * F.coalesce("inflow", F.lit(0.0))
                    ).alias("rank"),
                )
                .localCheckpoint(eager=True)
            )
            if tol is not None and (it + 1) % check_every == 0:
                delta = (
                    new.join(ranks.withColumnRenamed("rank", "old"), "v")
                    .agg(F.sum(F.abs(F.col("rank") - F.col("old"))))
                    .collect()[0][0]
                )
                if delta < tol:
                    return new
            ranks = new
        return ranks
    finally:
        nodes.unpersist()
        out_deg.unpersist()
        e.unpersist()
