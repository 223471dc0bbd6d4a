"""PageRank operator vs a driver-side reference power iteration."""

from __future__ import annotations

import pytest


def _reference_pagerank(edges, damping=0.85, iters=50):
    nodes = sorted({v for e in edges for v in e})
    idx = {v: i for i, v in enumerate(nodes)}
    n = len(nodes)
    out = {v: 0 for v in nodes}
    for s, _ in edges:
        out[s] += 1
    rank = [1.0 / n] * n
    for _ in range(iters):
        new = [0.0] * n
        dangling = sum(rank[idx[v]] for v in nodes if out[v] == 0)
        for s, d in edges:
            new[idx[d]] += rank[idx[s]] / out[s]
        base = (1 - damping) / n + damping * dangling / n
        rank = [base + damping * x for x in new]
    return {v: rank[idx[v]] for v in nodes}


def test_pagerank_matches_reference(spark):
    from energy_consumption_forecasting_spark.operators.pagerank import pagerank

    # hub-and-spoke + chain + dangling node
    edges = [
        (1, 2), (1, 3), (1, 4),
        (2, 1), (3, 1), (4, 1),
        (4, 5), (5, 6),  # 6 dangles
    ]
    e = spark.createDataFrame(edges, "src long, dst long")
    got = {r.v: r.rank for r in pagerank(e, max_iter=50, tol=1e-12).collect()}
    want = _reference_pagerank(edges)
    assert set(got) == set(want)
    for v in want:
        assert got[v] == pytest.approx(want[v], rel=1e-6)
    assert sum(got.values()) == pytest.approx(1.0, abs=1e-9)
    # the hub out-ranks every spoke
    assert got[1] == max(got.values())


def test_pagerank_early_stop(spark):
    from energy_consumption_forecasting_spark.operators.pagerank import pagerank

    # symmetric 2-cycle converges immediately to uniform
    e = spark.createDataFrame([(1, 2), (2, 1)], "src long, dst long")
    got = {r.v: r.rank for r in pagerank(e, max_iter=50, tol=1e-9).collect()}
    assert got[1] == pytest.approx(0.5) and got[2] == pytest.approx(0.5)


def test_power_iterate_shuffled_hash_tier_matches_broadcast(spark):
    """r11: past the broadcast budget the per-round join switches to a
    shuffled-hash build of the rank side (the SMJ fallback re-sorted
    the whole edge table every round — the sf10 decade's super-linear
    term).  Exact int64 pagerank must be bit-identical across the two
    strategies and layouts."""
    import copy

    from pyspark.sql import functions as F

    from energy_consumption_forecasting_spark.operators.pagerank import (
        PreparedRankGraph,
        _power_iterate,
        prepare_rank_graph,
    )
    from energy_consumption_forecasting_spark.session import (
        loop_shuffle_width,
    )

    edges = spark.range(0, 500).select(
        F.col("id").alias("src"), ((F.col("id") + 7) % 500).alias("dst")
    )
    edges = edges.union(
        edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    )

    # reference: the broadcast tier over the dst-partitioned layout
    g_b = prepare_rank_graph(edges)
    assert g_b.broadcastable
    want = {
        r.v: r.rank_scaled
        for r in _power_iterate(g_b, 10, 10**15, 17, 20, None, 0).collect()
    }

    # the past-budget layout: we persisted hash(src), broadcastable off
    e = edges.persist()
    deg = (
        e.groupBy(F.col("src").alias("v"))
        .agg(F.count("*").alias("deg"))
        .persist()
    )
    stats = deg.agg(
        F.count("*").alias("n"), F.sum("deg").alias("ne")
    ).collect()[0]
    with loop_shuffle_width(spark, int(stats["ne"]), 100_000) as iter_n:
        we = (
            e.join(deg.withColumnRenamed("v", "src"), "src")
            .select("src", "dst", "deg")
            .repartition(iter_n, "src")
            .persist()
        )
        we.count()
    g_s = PreparedRankGraph(we, deg, stats["n"], int(stats["ne"]), False)
    got = {
        r.v: r.rank_scaled
        for r in _power_iterate(g_s, 10, 10**15, 17, 20, None, 0).collect()
    }
    g_b.unpersist()
    g_s.unpersist()
    e.unpersist()
    assert got == want
