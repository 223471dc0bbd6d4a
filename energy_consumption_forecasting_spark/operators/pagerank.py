"""PageRank over plain DataFrames — iterative graph analytics.

Together with connected components (queries/components.py) this covers
the two standard iterative-graph shapes: label fixpoints and weighted
power iteration.  No GraphFrames dependency.

Per-iteration plan (the round-3 rework — r2 spent 3 joins a round):

    contribs = weighted_edges ⋈ ranks  →  groupBy(dst).sum  →  update

exactly ONE join + ONE aggregation per round.  The out-degree weight
``w = 1/deg`` is folded into the static edge table once up front, so
the rank state is a bare (v, rank) pair and never re-joins the degree
table.  Nodes without inflow (and the dangling-mass scalar) are
detected ONCE before the loop; graphs where every node has an in-edge
(any symmetrized graph) skip the per-round nodes rejoin entirely.

``localCheckpoint`` truncates lineage each round (iterative plans
otherwise grow exponentially) and preserves partitioning: the edge
table is persisted hash-partitioned on ``src`` and ranks exit each
round partitioned on the aggregation key, so consecutive iterations
reuse both sides' partitioning instead of re-shuffling the edges.

Scale: the rank table is (id, double) — tiny relative to edges; the
per-iteration cost is the contribution aggregation's shuffle of
(dst, share) pairs, never the edge payload.  At 100 TB of edges the
src-partitioned persist is the co-location strategy; dangling-node
mass redistribution (the standard correction) costs one scalar agg per
round only on graphs that actually have dangling nodes.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..session import aqe_disabled, loop_shuffle_width

# Lineage-truncation cadence for the fixed-iteration loops: one eager
# localCheckpoint per _CKPT_EVERY rounds.  Rank lineage is linear (one
# self-reference per round), so short lazy chains are safe; a barrier
# per round was measured as pure scheduling floor at gate SF.
_CKPT_EVERY = 5


@dataclass
class PreparedRankGraph:
    """The static half of a power-iteration run, built once and shared.

    ``we`` is the deg-folded edge table, persisted hash-partitioned on
    the iteration's aggregation key; ``deg`` the persisted (v, deg)
    node table the setup derived it from.  The whole graph family
    (global + personalized PageRank over the same edge set) rebuilds
    this identical structure, so callers cache one PreparedRankGraph
    per (session, edge source) and pass it in — the per-query cost is
    then just the iteration loop (round-7 item 1: the bench session
    rebuilt the same supply-graph edges for every family member)."""

    we: DataFrame
    deg: DataFrame
    n: int
    n_edges: int
    broadcastable: bool

    def unpersist(self) -> None:
        self.we.unpersist()
        self.deg.unpersist()


def prepare_rank_graph(
    edges: DataFrame,
    rows_per_task: int = 100_000,
    check_symmetry: bool = False,
) -> PreparedRankGraph:
    """One pass of setup for the exact PageRank tiers: degree table,
    node/edge counts, and the deg-folded edge table persisted on the
    loop's aggregation key (``dst`` while ranks broadcast, ``src``
    past the broadcast budget — the sort-merge join then reuses the
    layout and only the agg shuffles).

    PRECONDITION: symmetric-style graph — every node has out- and
    in-degree >= 1 (true for any symmetrized edge set), the same
    contract as ``pagerank_exact(symmetrized=True)``.  Checked only
    under ``check_symmetry=True`` (one extra distinct over dst, folded
    into the SAME stats collect — never a second degree pass); with
    the flag off, wrong use shows up as rank mass leaking, which the
    sanity tests pin."""
    spark = edges.sparkSession
    e = edges.persist()
    try:
        deg = (
            e.groupBy(F.col("src").alias("v"))
            .agg(F.count("*").alias("deg"))
            .persist()
        )
        if check_symmetry:
            in_tbl = (
                e.select(F.col("dst").alias("v"))
                .distinct()
                .withColumn("has_in", F.lit(True))
            )
            meta = deg.join(in_tbl, "v", "full")
            stats = meta.agg(
                F.count(F.col("deg")).alias("n"),
                F.count(F.when(F.col("deg").isNull(), 1)).alias("n_sink"),
                F.count(F.when(F.col("has_in").isNull(), 1)).alias("n_src"),
                F.sum("deg").alias("n_edges"),
            ).collect()[0]
            if stats["n_sink"] > 0 or stats["n_src"] > 0:
                raise ValueError(
                    "pagerank requires every node to have out- and "
                    f"in-edges (symmetrized graph); {stats['n_sink']} "
                    f"sink-only / {stats['n_src']} source-only nodes"
                )
        else:
            stats = deg.agg(
                F.count("*").alias("n"), F.sum("deg").alias("n_edges")
            ).collect()[0]
        n = stats["n"]
        if n == 0:
            raise ValueError("prepare_rank_graph: empty graph")
        n_edges = int(stats["n_edges"] or 0)
        broadcastable = n * 48 < 64 << 20
        with loop_shuffle_width(spark, n_edges, rows_per_task) as iter_n:
            part_key = "dst" if broadcastable else "src"
            we = (
                e.join(deg.withColumnRenamed("v", "src"), "src")
                .select("src", "dst", "deg")
                .repartition(iter_n, part_key)
                .persist()
            )
            # materialize NOW, while e's blocks are still cached (the
            # stats job filled them) — a lazy we would recompute from
            # the raw source after the unpersist below
            we.count()
        return PreparedRankGraph(we, deg, n, n_edges, broadcastable)
    finally:
        # deg/we are materialized self-contained block sets; the edge
        # persist was only setup-local
        e.unpersist()


def pagerank(
    edges: DataFrame,
    damping: float = 0.85,
    max_iter: int = 20,
    tol: float | None = 1e-6,
    check_every: int = 4,
) -> DataFrame:
    """(src, dst) directed edges → (v, rank); ranks sum to 1.

    Driver-side scalar jobs are the iteration tax, so they are kept off
    the hot path: dangling detection and the no-inflow node set are
    computed once up front, and the L1-delta convergence probe runs
    every ``check_every`` rounds (``tol=None`` disables it for
    fixed-iteration runs)."""
    spark = edges.sparkSession

    # ONE pass over the (persisted) edge table builds every piece of
    # node metadata the algorithm needs — r2 ran a separate driver job
    # per structure probe, each re-deriving the edge table, and the
    # setup cost dwarfed the iterations on mid-sized graphs.
    e = edges.persist()
    deg_tbl = e.groupBy(F.col("src").alias("v")).agg(
        F.count("*").alias("deg")
    )
    in_tbl = (
        e.select(F.col("dst").alias("v"))
        .distinct()
        .withColumn("has_in", F.lit(True))
    )
    meta = deg_tbl.join(in_tbl, "v", "full").persist()
    stats = meta.agg(
        F.count("*").alias("n"),
        F.count(F.when(F.col("deg").isNull(), 1)).alias("n_dangling"),
        F.count(F.when(F.col("has_in").isNull(), 1)).alias("n_no_inflow"),
        F.sum("deg").alias("n_edges"),
    ).collect()[0]
    n = stats["n"]
    has_dangling = stats["n_dangling"] > 0
    all_have_inflow = stats["n_no_inflow"] == 0
    n_edges = stats["n_edges"] or 0

    nodes = meta.select("v")
    dangling_nodes = (
        meta.filter(F.col("deg").isNull()).select("v")
        if has_dangling
        else None
    )
    we = None
    try:
        # pin loop shuffles (the contribs agg) to the graph-sized width;
        # AQE off for the loop — every round's plan is pinned (explicit
        # broadcast hint, persisted static side), every round executes
        # inside the context (eager per-round checkpoint), and the
        # adaptive re-planning per round is pure driver latency here
        with (
            loop_shuffle_width(spark, int(n_edges), 20_000) as iter_n,
            aqe_disabled(spark),
        ):
            # fold 1/deg into the edge table once; persist partitioned
            # on src so every iteration's join reuses this layout
            # without an exchange
            we = (
                e.join(
                    meta.filter(F.col("deg").isNotNull()).select(
                        F.col("v").alias("src"), "deg"
                    ),
                    "src",
                )
                .select("src", "dst", (F.lit(1.0) / F.col("deg")).alias("w"))
                .repartition(iter_n, "src")
                .persist()
            )
            # no eager count: the first iteration materializes the
            # persist — same work, one fewer driver-side job barrier

            # initial ranks stay lazy — lineage is one hop off the
            # persisted meta table; the round-1 checkpoint truncates it
            ranks = nodes.select("v", F.lit(1.0 / n).alias("rank"))
            for it in range(max_iter):
                dangling = (
                    ranks.join(dangling_nodes, "v")
                    .agg(F.coalesce(F.sum("rank"), F.lit(0.0)))
                    .collect()[0][0]
                    if has_dangling
                    else 0.0
                )
                base = (1.0 - damping) / n + damping * dangling / n
                # a checkpointed rank table has no Catalyst size stats, so
                # hint the broadcast ourselves while the node set is small:
                # the edge table then never shuffles (map-side hash join +
                # partial agg); past the threshold it degrades gracefully
                # to the co-partitioned sort-merge join
                rank_side = ranks.withColumnRenamed("v", "src")
                if n * 48 < 64 << 20:  # ~48B/row vs 64MB broadcast budget
                    rank_side = F.broadcast(rank_side)
                else:
                    # same §3.1 gate as _power_iterate: shuffled-hash
                    # with the node-sized rank side as build, so the
                    # src-partitioned edge persist streams unsorted
                    # (SMJ re-sorted it every round — the sf10 decade's
                    # super-linear term)
                    rank_side = rank_side.hint("shuffle_hash")
                contribs = (
                    we.join(rank_side, "src")
                    .groupBy("dst")
                    .agg(F.sum(F.col("rank") * F.col("w")).alias("inflow"))
                )
                updated = contribs.select(
                    F.col("dst").alias("v"),
                    (
                        F.lit(base) + F.lit(damping) * F.col("inflow")
                    ).alias("rank"),
                )
                if not all_have_inflow:
                    # nodes with no in-edges restart at the base mass
                    updated = nodes.join(updated, "v", "left").select(
                        "v", F.coalesce("rank", F.lit(base)).alias("rank")
                    )
                new = updated.localCheckpoint(eager=True)
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
        e.unpersist()
        meta.unpersist()
        if we is not None:
            we.unpersist()


def pagerank_exact(
    edges: DataFrame | None = None,
    iters: int = 10,
    scale: int = 10**15,
    damp_num: int = 17,
    damp_den: int = 20,
    symmetrized: bool = False,
    graph: PreparedRankGraph | None = None,
) -> DataFrame:
    """Fixed-point PageRank in EXACT scaled-integer arithmetic — the
    hash-checkable tier of the operator.

    Double power iteration is aggregation-order-dependent in the last
    bits, so the float ``pagerank`` above can only be rows-verified
    cross-engine.  This variant keeps every rank as an int64 scaled by
    ``scale`` and replaces each float op with integer ops that are
    associative and order-independent:

    * contribution  ``r_u div deg_u``          (int64 floor division)
    * inflow        ``SUM(..)``                (exact int64 sum)
    * update        ``base + (17*inflow) div 20`` with
      ``base = (3*scale) div (20*n)``          (damping 0.85 = 17/20)

    Any engine computing this recurrence — Spark partial aggregation in
    any order, DuckDB single-threaded — produces IDENTICAL integers,
    which is what makes a cross-engine value-hash oracle possible
    (see queries/components.py::graph_pagerank's unrolled-CTE oracle).
    The truncation error vs real PageRank is < n·iters ulps of
    1/scale — invisible at scale=1e15.

    PRECONDITION (asserted): the graph is symmetric-style — every node
    has out-degree >= 1 and in-degree >= 1 (true for any symmetrized
    edge set), so there is no dangling mass and no inflow-less node.
    Overflow headroom: inflow <= scale, so damp_num*inflow <= 1.7e16
    << 2^63.

    Scale shape (r4 rework — one shuffle layout reused by ALL rounds):
    the deg-folded edge table persists hash-partitioned on the
    iteration's AGGREGATION key — ``dst`` while the rank table is
    broadcast-sized (the per-round plan is then broadcast-join →
    partial agg → final agg with NO exchange at all), ``src`` once
    ranks outgrow the broadcast budget (the sort-merge join then reuses
    the persisted layout and only the agg shuffles).  Node metadata
    (n, dangling, no-inflow, edge count) comes from ONE pass over the
    edge table; ``localCheckpoint`` truncates the growing lineage each
    round.

    ``graph=`` (a :class:`PreparedRankGraph`, implies the symmetrized
    contract) skips the whole setup: the caller owns the persisted
    frames and their lifetime — the shared-edge-frame path the graph
    family's queries use.  The loop itself runs under ``aqe_disabled``
    (every round's plan is pinned already; adaptive re-planning was
    measured as ~2x the loop's wall-clock at gate SF) and ends with an
    eager checkpoint so ALL rounds execute inside the pinned confs."""
    if graph is not None:
        return _power_iterate(
            graph, iters, scale, damp_num, damp_den, seed_pred=None, n_seeds=0
        )
    if edges is None:
        raise ValueError("pagerank_exact: pass edges= or graph=")
    # callers of the symmetrized form GUARANTEE every edge has its
    # reverse (e.g. built by unioning pairs with their swap): the
    # in-set equals the out-set, so the symmetry probe — a full
    # distinct over the edge table, folded into prepare_rank_graph's
    # single stats collect — is provably redundant there and skipped
    # (wrong use shows up as rank mass leaking, which the sanity
    # tests pin).
    e = edges.persist()
    try:
        g = prepare_rank_graph(e, check_symmetry=not symmetrized)
    finally:
        e.unpersist()
    try:
        return _power_iterate(
            g, iters, scale, damp_num, damp_den, seed_pred=None, n_seeds=0
        )
    finally:
        g.unpersist()


def _power_iterate(
    graph: PreparedRankGraph,
    iters: int,
    scale: int,
    damp_num: int,
    damp_den: int,
    seed_pred,
    n_seeds: int,
) -> DataFrame:
    """The shared fixed-iteration loop of both exact tiers — global
    (``seed_pred is None``: uniform init + uniform teleport) and
    personalized (seed-restricted init + teleport).

    Per round: broadcast(ranks) ⋈ we → groupBy(dst).sum — with ``we``
    persisted partitioned on ``dst`` the whole round is exchange-free
    while ranks fit the broadcast budget; past it the sort-merge join
    reuses the src layout and only the agg shuffles.  Runs under
    ``aqe_disabled`` + the graph-sized loop width (the round plans are
    pinned; AQE re-planning per round was measured as ~2x the loop at
    gate SF) and ends with an EAGER checkpoint so every round executes
    inside those confs — without it the tail of the lazy chain would
    run under the session's AQE at the caller's action time.
    Checkpoint cadence _CKPT_EVERY (round-6 item 2): rank lineage is
    linear, short lazy chains are safe, 10 chained barriers were pure
    scheduling overhead."""
    spark = graph.we.sparkSession
    n = graph.n
    if seed_pred is None:
        base_expr = F.lit((damp_den - damp_num) * scale // (damp_den * n))
        init = F.lit(scale // n)
    else:
        base_seed = (damp_den - damp_num) * scale // (damp_den * n_seeds)
        base_expr = F.when(
            seed_pred(F.col("dst")), F.lit(base_seed)
        ).otherwise(F.lit(0))
        init = F.when(seed_pred(F.col("v")), F.lit(scale // n_seeds)).otherwise(
            F.lit(0)
        )
    with (
        loop_shuffle_width(spark, graph.n_edges, 100_000),
        aqe_disabled(spark),
    ):
        ranks = graph.deg.select("v", init.cast("long").alias("r"))
        for it in range(iters):
            rank_side = ranks.withColumnRenamed("v", "src")
            if graph.broadcastable:
                rank_side = F.broadcast(rank_side)
            else:
                # Past the broadcast budget the planner defaults to a
                # sort-merge join that RE-SORTS the persisted edge table
                # every round — the dominant super-linear term of the
                # sf10 decade probe (guide §3.1: pick the strategy
                # deliberately).  A shuffled-hash join with the rank
                # side as build keeps the src-partitioned edge layout
                # streaming (no exchange, no sort — ``we`` is persisted
                # hash(src, iter_n) and the loop width pins the shuffle
                # partitions to iter_n) and builds only the node-sized
                # rank table per partition.
                rank_side = rank_side.hint("shuffle_hash")
            ranks = (
                graph.we.join(rank_side, "src")
                .groupBy("dst")
                .agg(F.sum(F.expr("r div deg")).alias("inflow"))
                .select(
                    F.col("dst").alias("v"),
                    (
                        base_expr
                        + F.expr(f"({damp_num} * inflow) div {damp_den}")
                    ).cast("long").alias("r"),
                )
            )
            if (it + 1) % _CKPT_EVERY == 0 or it + 1 == iters:
                ranks = ranks.localCheckpoint(eager=True)
    return ranks.select("v", F.col("r").alias("rank_scaled"))


def pagerank_personalized_exact(
    edges: DataFrame | None = None,
    seed_pred=None,
    n_seeds: int = 0,
    iters: int = 10,
    scale: int = 10**15,
    damp_num: int = 17,
    damp_den: int = 20,
    graph: PreparedRankGraph | None = None,
) -> DataFrame:
    """Personalized PageRank in the same exact scaled-int64 algebra as
    :func:`pagerank_exact`: the teleport mass lands ONLY on the seed
    set instead of uniformly —

      r0_v    = (scale div |S|)·[v ∈ S]
      r_{t+1} = [v ∈ S]·(3·scale) div (20·|S|) + (17·inflow) div 20

    — so ranks measure proximity to the seeds (the
    'recommendation from these nodes' form of PageRank).  Every op is
    order-independent integer arithmetic → cross-engine hash-checkable
    like the global variant.  ``seed_pred`` is a Column predicate over
    the node id column ``v``; ``n_seeds`` must be |S ∩ nodes| (the
    caller counts it — it is also the oracle's ns).  Same loop shape
    as pagerank_exact: edges persisted once partitioned on the
    aggregation key, broadcast rank side, localCheckpoint per round.
    Requires a symmetrized edge set (no dangling mass).  ``graph=``
    shares a caller-owned :class:`PreparedRankGraph` exactly as in
    :func:`pagerank_exact`."""
    if n_seeds <= 0:
        raise ValueError("personalized pagerank needs a non-empty seed set")
    if graph is not None:
        return _power_iterate(
            graph, iters, scale, damp_num, damp_den, seed_pred, n_seeds
        )
    if edges is None:
        raise ValueError("pagerank_personalized_exact: pass edges= or graph=")
    e = edges.persist()
    try:
        g = prepare_rank_graph(e)
    finally:
        e.unpersist()
    try:
        return _power_iterate(
            g, iters, scale, damp_num, damp_den, seed_pred, n_seeds
        )
    finally:
        g.unpersist()
