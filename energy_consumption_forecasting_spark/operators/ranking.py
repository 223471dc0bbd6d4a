"""Distributed global ordering — two-pass rank without the
single-partition ``Window.orderBy`` scale-killer.

``Window.orderBy(...)`` with no ``partitionBy`` moves the WHOLE table to
one partition ("WindowExec: No Partition Defined") — a single-task sort
at 100 TB.  The classic distributed alternative (this module):

1. ``repartitionByRange`` on the order key — a range shuffle; every
   partition holds a contiguous, non-overlapping key range and sorts
   locally in parallel.
2. per-partition ``row_number`` keyed by ``spark_partition_id()``.
3. global offset for partition *i* = total rows in partitions < i — a
   per-partition count (one tiny job, ≤ #partitions rows collected)
   broadcast-joined back.

The global rank is exact (``offset + local rank``) for any total order;
ties never straddle a range boundary when the order key is made unique
with a tiebreaker column, which every caller here does.

Reference parity: the pandas ``sort_values``/``reset_index`` idiom
(ETL.py:90,219,311) assumes one in-memory frame; this is its
cluster-shaped equivalent.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

_PID = "__rank_pid"
_OFF = "__rank_off"

# Materialization rule: the range-shuffled intermediate is
# ``localCheckpoint(eager=True)``, NOT ``persist()``.  The offsets are
# collected from one physical partitioning; if a persisted intermediate
# is ever evicted and recomputed (or AQE re-plans the exchange), the
# recomputed partition ids can disagree with the collected offsets and
# the "exact" rank silently shifts at partition boundaries — observed
# as fold-boundary flips under a vanilla 200-partition session.  A
# checkpoint freezes the partitioning for the DataFrame's lifetime, and
# its blocks are freed by the ContextCleaner when the plan is GC'd, so
# repeated rank calls don't accumulate storage the way r2's persist
# leak did.


_BKT = "__rank_bkt"


def global_row_number(
    df: DataFrame,
    order_cols: list[str | Column],
    rn_col: str = "rn",
    num_partitions: int | None = None,
    bucket: Column | None = None,
) -> tuple[DataFrame, int]:
    """Attach an exact global 1-based ``rn_col`` ordered by ``order_cols``
    (ascending); returns ``(ranked_df, total_rows)``.

    Triggers one counting job (the two-pass trade: a #partitions-sized
    collect instead of a whole-table single-task sort).  The ranked
    intermediate is persisted so the count pass and the ranked output
    share the range shuffle.

    ``bucket`` (optional, the r4 fast path): a NON-NULL expression that
    is MONOTONE NON-DECREASING in the order key (e.g. year*100+month of
    a leading date column) with modest cardinality.  A NULL bucket is
    rejected loudly (the offsets join would silently drop those rows);
    wrap nullable keys in ``coalesce`` or use the generic path.  When
    given, the
    partition-offset bookkeeping keys on DATA VALUES instead of
    physical partition ids: per-bucket counts → exclusive offsets →
    ``row_number`` within each bucket.  That removes BOTH costs of the
    generic path — the ``repartitionByRange`` sampling pass over the
    input and the checkpoint that freezes partition ids (bucket values
    cannot drift under AQE re-planning or block eviction, so no
    checkpoint is needed).  Two passes over the input, one hash
    shuffle, zero sampling jobs."""
    spark = df.sparkSession
    if bucket is not None:
        tagged = df.withColumn(_BKT, bucket)
        cols = [F.col(c) if isinstance(c, str) else c for c in order_cols]
        raw = tagged.groupBy(_BKT).agg(F.count("*").alias("cnt")).collect()
        if any(r[_BKT] is None for r in raw):
            raise ValueError(
                "global_row_number: bucket expression produced NULL — the "
                "offsets join would drop those rows; coalesce the bucket "
                "or use the generic range-shuffle path"
            )
        counts = sorted((r[_BKT], r["cnt"]) for r in raw)
        offsets, acc = [], 0
        for b, cnt in counts:
            offsets.append((b, acc))
            acc += cnt
        total = acc
        off_df = F.broadcast(
            spark.createDataFrame(offsets or [(0, 0)], [_BKT, _OFF])
        )
        w = Window.partitionBy(_BKT).orderBy(*cols)
        ranked = (
            tagged.join(off_df, _BKT)
            .withColumn(rn_col, (F.row_number().over(w) + F.col(_OFF)).cast("long"))
            .drop(_BKT, _OFF)
        )
        return ranked, total
    parts = num_partitions or spark.sparkContext.defaultParallelism
    cols = [F.col(c) if isinstance(c, str) else c for c in order_cols]
    ranged = (
        df.repartitionByRange(parts, *cols)
        .withColumn(_PID, F.spark_partition_id())
        # lazy: the counts collect below materializes the checkpoint —
        # one pass instead of eager's two, same frozen partitioning
        .localCheckpoint(eager=False)
    )
    counts = sorted(
        (r[_PID], r["cnt"])
        for r in ranged.groupBy(_PID).agg(F.count("*").alias("cnt")).collect()
    )
    offsets, acc = [], 0
    for pid, cnt in counts:
        offsets.append((pid, acc))
        acc += cnt
    total = acc
    off_df = F.broadcast(
        spark.createDataFrame(offsets or [(0, 0)], f"{_PID} int, {_OFF} long")
    )
    w = Window.partitionBy(_PID).orderBy(*cols)
    ranked = (
        ranged.join(off_df, _PID)
        .withColumn(rn_col, (F.row_number().over(w) + F.col(_OFF)).cast("long"))
        .drop(_PID, _OFF)
    )
    return ranked, total


def lag_by_rank(
    ranked: DataFrame,
    rn_col: str,
    value_col: str,
    lags: list[int],
    prefix: str = "lag_",
) -> DataFrame:
    """Positional lag features from a global rank column: one broadcast-
    friendly equi-join per lag on ``rn - k`` (no global-order window).
    Rows missing any lag (the first ``max(lags)``) are dropped, matching
    ``F.lag`` + ``na.drop`` semantics on a unique total order."""
    out = ranked
    for k in lags:
        shifted = ranked.select(
            (F.col(rn_col) + k).alias(rn_col),
            F.col(value_col).alias(f"{prefix}{k}"),
        )
        out = out.join(shifted, rn_col, "inner")
    return out


def global_prefix_sum(
    df: DataFrame,
    order_cols: list[str | Column],
    value_col: str,
    cum_col: str = "cum",
    num_partitions: int | None = None,
    bucket: Column | None = None,
) -> tuple[DataFrame, int]:
    """Exact global running sum of ``value_col`` (inclusive) over the
    total order ``order_cols`` — the prefix-sum twin of
    ``global_row_number``, same two-pass shape:

    1. range-shuffle on the order key (contiguous key ranges),
    2. per-partition PARTIAL sums (one tiny job, ≤ #partitions rows),
    3. exclusive offsets broadcast back; within-partition running sum
       + offset = exact global prefix.

    Works for any associative integer sum; callers keep ``value_col``
    integral (cents / token counts) so the prefix is exact.  Returns
    ``(df_with_cum, grand_total)``.

    ``bucket``: same monotone-bucket fast path as ``global_row_number``
    — data-keyed offsets, no sampling pass, no checkpoint."""
    spark = df.sparkSession
    if bucket is not None:
        tagged = df.withColumn(_BKT, bucket)
        cols = [F.col(c) if isinstance(c, str) else c for c in order_cols]
        raw = (
            tagged.groupBy(_BKT)
            .agg(F.sum(value_col).cast("long").alias("s"))
            .collect()
        )
        if any(r[_BKT] is None for r in raw):
            raise ValueError(
                "global_prefix_sum: bucket expression produced NULL — the "
                "offsets join would drop those rows; coalesce the bucket "
                "or use the generic range-shuffle path"
            )
        partials = sorted((r[_BKT], r["s"]) for r in raw)
        offsets, acc = [], 0
        for b, s in partials:
            offsets.append((b, acc))
            acc += int(s or 0)
        total = acc
        off_df = F.broadcast(
            spark.createDataFrame(offsets or [(0, 0)], [_BKT, _OFF])
        )
        w = (
            Window.partitionBy(_BKT)
            .orderBy(*cols)
            .rowsBetween(Window.unboundedPreceding, 0)
        )
        out = (
            tagged.join(off_df, _BKT)
            .withColumn(
                cum_col,
                (F.sum(F.col(value_col)).over(w) + F.col(_OFF)).cast("long"),
            )
            .drop(_BKT, _OFF)
        )
        return out, total
    parts = num_partitions or spark.sparkContext.defaultParallelism
    cols = [F.col(c) if isinstance(c, str) else c for c in order_cols]
    ranged = (
        df.repartitionByRange(parts, *cols)
        .withColumn(_PID, F.spark_partition_id())
        .localCheckpoint(eager=False)
    )
    partials = sorted(
        (r[_PID], r["s"])
        for r in ranged.groupBy(_PID)
        .agg(F.sum(value_col).cast("long").alias("s"))
        .collect()
    )
    offsets, acc = [], 0
    for pid, s in partials:
        offsets.append((pid, acc))
        acc += int(s or 0)
    total = acc
    off_df = F.broadcast(
        spark.createDataFrame(offsets or [(0, 0)], f"{_PID} int, {_OFF} long")
    )
    w = (
        Window.partitionBy(_PID)
        .orderBy(*cols)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    out = (
        ranged.join(off_df, _PID)
        .withColumn(
            cum_col,
            (F.sum(F.col(value_col)).over(w) + F.col(_OFF)).cast("long"),
        )
        .drop(_PID, _OFF)
    )
    return out, total


def global_row_number_lazy(
    df: DataFrame,
    order_cols: list[str | Column],
    bucket: Column,
    rn_col: str = "rn",
    total_col: str | None = None,
    broadcast_offsets: bool = True,
) -> DataFrame:
    """The bucket fast path with ZERO driver actions.

    Per-bucket counts, exclusive offsets, and (optionally, as
    ``total_col``) the grand total are computed as a
    bucket-cardinality-sized aggregate SUBTREE broadcast back into the
    main pass — the whole rank is one lazy plan, so callers that need
    ``n`` only inside column expressions (fold boundaries, split
    thresholds) skip ``global_row_number``'s counting job entirely.

    The offsets window is a deliberate single-partition window over
    the per-bucket COUNTS (months / hash prefixes — bounded), the
    repo's "tiny calendar series" exception, never over the data.

    NULL-bucket contract: matched lazily — a NULL bucket misses the
    left-joined offsets row and trips ``raise_error`` at runtime
    instead of silently dropping or mis-ranking the row.

    ``broadcast_offsets=False`` drops the explicit broadcast hint on
    the offsets join (it becomes a plain shuffle join on the bucket
    key).  Callers that LAZY-CHECKPOINT a subtree containing this rank
    need that: preparing a plan that holds an explicit-hint
    BroadcastHashJoin submits the broadcast future — and with it the
    whole input subtree — at ``.rdd`` construction, which is exactly
    the construction-time job the lazy form exists to avoid.  The cost
    is one extra shuffle of the RANKED table (bucket-keyed, e.g.
    vocabulary-sized), never of the corpus the rank feeds."""
    cols = [F.col(c) if isinstance(c, str) else c for c in order_cols]
    tagged = df.withColumn(_BKT, bucket)
    counts = tagged.groupBy(_BKT).agg(F.count("*").alias("__cnt"))
    w_prior = Window.orderBy(_BKT).rowsBetween(
        Window.unboundedPreceding, -1
    )
    w_total = Window.orderBy(_BKT).rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    off_cols = [
        F.col(_BKT),
        F.coalesce(F.sum("__cnt").over(w_prior), F.lit(0)).alias(_OFF),
    ]
    if total_col is not None:
        off_cols.append(F.sum("__cnt").over(w_total).alias(total_col))
    offs = counts.select(*off_cols)
    wl = Window.partitionBy(_BKT).orderBy(*cols)
    guarded_off = F.coalesce(
        F.col(_OFF),
        F.raise_error(
            F.lit(
                "global_row_number_lazy: bucket expression produced NULL"
            )
        ).cast("long"),
    )
    offs_side = F.broadcast(offs) if broadcast_offsets else offs
    return (
        tagged.join(offs_side, _BKT, "left")
        .withColumn(rn_col, F.row_number().over(wl) + guarded_off)
        .drop(_BKT, _OFF)
    )


def global_prefix_sums_lazy(
    df: DataFrame,
    order_cols: list[str | Column],
    value_cols: list[str],
    bucket: Column,
    cum_cols: list[str],
    broadcast_offsets: bool = True,
) -> DataFrame:
    """Multi-value :func:`global_prefix_sum_lazy`: N exact running sums
    over ONE order in ONE pass — one per-bucket partials aggregate, one
    offsets window, one data window (r10, guide §2.4: two chained
    single-value prefix sums re-derive their shared input per pass;
    fusing them halves the aggregate/window work and the offsets
    subtree).  Same bucket/NULL/broadcast contracts as the single-value
    form."""
    if len(value_cols) != len(cum_cols):
        raise ValueError("value_cols and cum_cols must pair up")
    cols = [F.col(c) if isinstance(c, str) else c for c in order_cols]
    tagged = df.withColumn(_BKT, bucket)
    partials = tagged.groupBy(_BKT).agg(
        *[
            F.sum(F.col(v)).cast("long").alias(f"__s_{i}")
            for i, v in enumerate(value_cols)
        ]
    )
    w_prior = Window.orderBy(_BKT).rowsBetween(Window.unboundedPreceding, -1)
    off_names = [f"{_OFF}_{i}" for i in range(len(value_cols))]
    offs = partials.select(
        F.col(_BKT),
        *[
            F.coalesce(F.sum(f"__s_{i}").over(w_prior), F.lit(0)).alias(o)
            for i, o in enumerate(off_names)
        ],
    )
    guarded_off0 = F.coalesce(
        F.col(off_names[0]),
        F.raise_error(
            F.lit("global_prefix_sums_lazy: bucket expression produced NULL")
        ).cast("long"),
    )
    w_local = (
        Window.partitionBy(_BKT)
        .orderBy(*cols)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    offs_side = F.broadcast(offs) if broadcast_offsets else offs
    out = tagged.join(offs_side, _BKT, "left")
    for i, (v, c) in enumerate(zip(value_cols, cum_cols)):
        off = guarded_off0 if i == 0 else F.col(off_names[i])
        out = out.withColumn(
            c, (F.sum(F.col(v)).over(w_local) + off).cast("long")
        )
    return out.drop(_BKT, *off_names)


def ntile_expr(rn_name: str, n_name: str, k: int):
    """Exact ``ntile(k)`` as a column expression of a global rank and
    total-count column (both attachable action-free by
    ``global_row_number_lazy``): the first ``n % k`` tiles hold
    ``ceil(n/k)`` rows — all integer algebra (``ceil(a/b) = (a+b-1)
    div b``), bit-identical to both engines' ntile."""
    big = F.col(n_name) % k
    cut = big * (F.expr(f"{n_name} div {k}") + 1)
    return F.when(
        F.col(rn_name) <= cut,
        F.expr(f"({rn_name} + {n_name} div {k}) div ({n_name} div {k} + 1)"),
    ).otherwise(
        big
        + F.expr(
            f"({rn_name} - ({n_name} % {k}) * ({n_name} div {k} + 1)"
            f" + {n_name} div {k} - 1) div ({n_name} div {k})"
        )
    )


def global_prefix_sum_lazy(
    df: DataFrame,
    order_cols: list[str | Column],
    value_col: str,
    bucket: Column,
    cum_col: str = "cum",
    total_col: str | None = None,
    broadcast_offsets: bool = True,
) -> DataFrame:
    """The prefix-sum twin of :func:`global_row_number_lazy` — ZERO
    driver actions: per-bucket partial sums, exclusive offsets, and
    (optionally) the grand total are a bucket-cardinality aggregate
    SUBTREE broadcast back into the main pass, so the whole running
    sum is one lazy plan.

    ``bucket`` must be a MONOTONE coarse function of ``order_cols``
    with bounded cardinality AND roughly even load.  Calendar keys over
    a date order qualify, and so do FIXED-WIDTH bands over a bounded,
    size-invariant value RANGE (the ``_rev_cum_lazy`` 2^24 revenue
    bands: band count is range/width regardless of N, and no band
    dominates — assert that with a scaling probe when adopting one).
    What does NOT qualify is log2/coarse banding over a CONCENTRATED
    value distribution, where most rows land in one band and its window
    degenerates to a single task — there, use the eager two-pass
    ``global_prefix_sum``, whose repartitionByRange samples balanced
    quantiles.  The offsets window is the sanctioned single-partition
    window over the per-bucket SUMS, never the data.  NULL buckets
    trip ``raise_error`` lazily like the row-number twin."""
    cols = [F.col(c) if isinstance(c, str) else c for c in order_cols]
    tagged = df.withColumn(_BKT, bucket)
    partials = tagged.groupBy(_BKT).agg(
        F.sum(F.col(value_col)).cast("long").alias("__s")
    )
    w_prior = Window.orderBy(_BKT).rowsBetween(Window.unboundedPreceding, -1)
    w_total = Window.orderBy(_BKT).rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    off_cols = [
        F.col(_BKT),
        F.coalesce(F.sum("__s").over(w_prior), F.lit(0)).alias(_OFF),
    ]
    if total_col is not None:
        off_cols.append(F.sum("__s").over(w_total).alias(total_col))
    offs = partials.select(*off_cols)
    guarded_off = F.coalesce(
        F.col(_OFF),
        F.raise_error(
            F.lit("global_prefix_sum_lazy: bucket expression produced NULL")
        ).cast("long"),
    )
    w_local = (
        Window.partitionBy(_BKT)
        .orderBy(*cols)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    # broadcast_offsets=False: same escape hatch as the row-number
    # twin — preparing a lazy-checkpointed plan holding the explicit
    # hint submits the broadcast future at .rdd construction.
    offs_side = F.broadcast(offs) if broadcast_offsets else offs
    return (
        tagged.join(offs_side, _BKT, "left")
        .withColumn(
            cum_col,
            (F.sum(F.col(value_col)).over(w_local) + guarded_off).cast(
                "long"
            ),
        )
        .drop(_BKT, _OFF)
    )
