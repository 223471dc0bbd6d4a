"""Physical-plan contracts, pinned as tests (PLANS.md is the generated
artifact; these assertions guard the load-bearing plan properties
against optimizer/implementation regressions)."""

from __future__ import annotations

import contextlib
import io
import re

import pytest

from tests.conftest import SF_SMALL


def _plan(spark, name: str) -> str:
    from energy_consumption_forecasting_spark.queries import load_all

    qs, _ = load_all()
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        qs[name](spark, SF_SMALL).explain("formatted")
    return buf.getvalue()


# Queries whose plans must never contain a cartesian/BNL shape: the
# pair-join family (the named 100-TB scale-killer) plus the join-heavy
# relational spine.  Stat-broadcast crossJoins (1-row frames) are NOT
# in this list by design — those are deliberate scalar broadcasts.
NO_BNL = [
    "dedup_minhash_lsh",
    "dedup_ngram_jaccard",
    "dedup_containment",
    "dedup_prefix_filter_join",
    "dedup_semantic",
    "sim_bucketed_ann",
    "sim_knn_graph",
    "tpch_q3_shipping_priority",
    "tpch_q5_local_volume",
    "tpch_q8_market_share",
    "pipeline_contamination",
    "j9_lateral_topn",
]


@pytest.mark.parametrize("name", NO_BNL)
def test_no_cartesian_or_bnl(spark, name):
    plan = _plan(spark, name)
    assert "CartesianProduct" not in plan, f"{name}: cartesian product"
    assert "BroadcastNestedLoopJoin" not in plan, f"{name}: BNL join"


def test_q6_filters_reach_the_scan(spark):
    plan = _plan(spark, "tpch_q6_revenue_change")
    pushed = re.findall(r"PushedFilters: \[([^\]]+)\]", plan)
    assert any(p.strip() for p in pushed), "no pushed filters on q6 scan"


def test_q1_reads_only_needed_columns(spark):
    plan = _plan(spark, "tpch_q1_pricing_summary")
    schemas = re.findall(r"ReadSchema: struct<([^>]*)>", plan)
    assert schemas, "no ReadSchema in plan — the regex guard went blind"
    # parse field NAMES only (robust to parameterized types like
    # decimal(12,2) whose commas a naive split would break on)
    cols = {m for s in schemas for m in re.findall(r"(?:^|,)(\w+):", s)}
    # the pricing summary needs 7 lineitem columns; reading more means
    # projection pruning broke
    assert 0 < len(cols) <= 7, f"q1 reads {sorted(cols)}"


def test_broadcast_dim_join_stays_broadcast(spark):
    plan = _plan(spark, "tpch_q3_shipping_priority")
    assert "BroadcastHashJoin" in plan


def test_basket_pairs_single_shuffle_no_selfjoin(spark):
    """a_basket_pairs must stay the array-explode shape: the only join
    is the broadcast a-priori prune — any SortMergeJoin means the
    basket self-join crept back (two shuffles of the line table)."""
    plan = _plan(spark, "a_basket_pairs")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "SortMergeJoin" not in plan, "basket self-join regressed"
    assert "BroadcastHashJoin" in plan  # the a-priori prune
    assert "Generate" in plan  # the row-local pair explode


def test_markov_window_partitions_by_user(spark):
    """The lag window must partition by user_id — a global (empty
    partition-by) window here would serialize the whole event table
    through one task."""
    plan = _plan(spark, "w_markov_transitions")
    assert re.search(r"partitionBy=\[user_id", plan) or re.search(
        r"\[user_id[^\]]*\], \[ts", plan
    ), "lag window lost its user_id partitioning"


def test_unpartitioned_window_guard(spark):
    """The plan-audit invariant: an unpartitioned Window is flagged on a
    raw table, tolerated above an Aggregate or a literal frame."""
    import sys

    sys.path.insert(0, "/root/repo/tools")
    from plan_audit import audit_unpartitioned_windows

    from pyspark.sql import Window
    from pyspark.sql import functions as F

    raw = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
    bad = raw.select(
        "l_orderkey", F.row_number().over(Window.orderBy("l_shipdate")).alias("rn")
    )
    assert audit_unpartitioned_windows(bad), "raw-table global window not flagged"

    agg = raw.groupBy("l_returnflag").agg(F.sum("l_quantity").alias("s"))
    good = agg.select(
        "l_returnflag", F.row_number().over(Window.orderBy("s")).alias("rn")
    )
    assert audit_unpartitioned_windows(good) == []

    lit = spark.createDataFrame([(1,), (2,)], "x int")
    good2 = lit.select("x", F.row_number().over(Window.orderBy("x")).alias("rn"))
    assert audit_unpartitioned_windows(good2) == []

    partitioned = raw.select(
        "l_orderkey",
        F.row_number()
        .over(Window.partitionBy("l_returnflag").orderBy("l_shipdate"))
        .alias("rn"),
    )
    assert audit_unpartitioned_windows(partitioned) == []


def test_unpartitioned_window_guard_rdd_leaf_attribution(spark):
    """r8 advice: inside a cached plan, an RDDScanExec leaf is bounded
    only when attributable to DRIVER-LITERAL data (ParallelCollectionRDD
    root).  A localCheckpoint of a corpus-sized frame also compiles to
    RDDScanExec — the audit must NOT silently pass an unpartitioned
    window over it."""
    import sys

    sys.path.insert(0, "/root/repo/tools")
    from plan_audit import audit_unpartitioned_windows

    from pyspark.sql import Window
    from pyspark.sql import functions as F

    w = Window.orderBy("x")

    lit = spark.createDataFrame([(i,) for i in range(5)], "x int").persist()
    try:
        lit.count()  # materialize the cache so the audit sees its plan
        assert (
            audit_unpartitioned_windows(
                lit.withColumn("rn", F.row_number().over(w))
            )
            == []
        )
    finally:
        lit.unpersist()

    corpus = (
        spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
        .select(F.col("l_orderkey").alias("x"))
        .localCheckpoint()
        .persist()
    )
    try:
        corpus.count()
        flagged = audit_unpartitioned_windows(
            corpus.withColumn("rn", F.row_number().over(w))
        )
        assert flagged, "checkpointed-corpus global window not flagged"
    finally:
        corpus.unpersist()


def test_calendar_bounded_window_contract_all_queries(spark):
    """r9 VERDICT item 5: the unpartitioned-window queries
    (w8_sequence_windows, j3_asof_ffill_join, w2_unbounded_fill and
    kin) are safe ONLY because their window input is a calendar-bounded
    aggregate (<= #days rows).  Nothing but this test enforces that a
    future edit doesn't hand them a corpus-sized frame: it runs the
    plan-audit invariant (unpartitioned Window must sit above an
    Aggregate / literal / attributably-bounded cache) over EVERY
    registered query whose construction is pure — the same audit
    tools/plan_audit.py applies to the AUDITED subset at PLANS.md
    regeneration time, promoted to CI for the full registry.  Repoint
    any of these windows at a raw fact table and this fails."""
    import sys

    sys.path.insert(0, "/root/repo/tools")
    from plan_audit import audit_unpartitioned_windows

    from energy_consumption_forecasting_spark.queries import load_all
    from tests.test_construction_purity import EXEMPT

    qs, _ = load_all()
    # the verdict-named queries must be in scope (pure construction)
    for must in ("w8_sequence_windows", "j3_asof_ffill_join",
                 "w2_unbounded_fill", "w9_lag_features",
                 "w11_rolling_mean"):
        assert must in qs and must not in EXEMPT, must
    offenders: dict[str, list[str]] = {}
    for name in sorted(qs):
        if name in EXEMPT:
            continue  # construction launches jobs (drains/fits) by contract
        v = audit_unpartitioned_windows(qs[name](spark, SF_SMALL))
        if v:
            offenders[name] = v
    assert not offenders, (
        "unpartitioned Window over an unbounded frame (calendar-bounded "
        f"window contract broken): {offenders}"
    )


# --- fanout splittability gate (r11 verdict item 3) ---------------------------
#
# The scan-site fanout exists ONLY because the testdata parquet is a
# single unsplittable row group: at 100 TB the source is splittable and
# the repartition would be a full extra exchange of the fact table.
# These tests pin both sides of the gate: the single-split testdata
# keeps the spread, a multi-file (splittable) source skips it — and the
# pure-python split estimator that drives the gate matches Spark's real
# partition count so the decision is made from true scan parallelism.


def test_fanout_gate_skips_on_splittable_source(spark, tmp_path):
    import os

    from pyspark.sql import functions as F

    from energy_consumption_forecasting_spark.tables import est_scan_partitions
    from energy_consumption_forecasting_spark.queries._util import fanout

    target = spark.sparkContext.defaultParallelism
    # enough part files that the packed split count clears the session
    # parallelism; scan confs pinned small so the fixture stays tiny
    # (default 4 MB openCost packs ~3 small files per split, capping
    # the partition count below 32 for any uniform small-file layout)
    path = os.path.join(str(tmp_path), "wide.parquet")
    spark.range(0, 200_000).withColumn(
        "doc_id", F.col("id")
    ).repartition(2 * target + 8).write.mode("overwrite").parquet(path)

    old_max = spark.conf.get("spark.sql.files.maxPartitionBytes")
    old_open = spark.conf.get("spark.sql.files.openCostInBytes")
    try:
        spark.conf.set("spark.sql.files.maxPartitionBytes", "131072")
        spark.conf.set("spark.sql.files.openCostInBytes", "1024")
        est = est_scan_partitions(spark, path)
        wide = spark.read.parquet(path)
        actual = wide.rdd.getNumPartitions()
        assert est == actual, f"estimator {est} != actual {actual}"
        assert actual >= target

        wide._sg_scan_parts = est
        assert fanout(wide, "doc_id") is wide, "gate failed to skip"
        # ungated callers (mid-plan pre-explode spreads) still spread
        assert fanout(wide, "doc_id", gate=False) is not wide
    finally:
        spark.conf.set("spark.sql.files.maxPartitionBytes", old_max)
        spark.conf.set("spark.sql.files.openCostInBytes", old_open)


def test_fanout_gate_keeps_spread_on_unsplittable_source(spark):
    from energy_consumption_forecasting_spark.queries._util import fanout, tbl
    from energy_consumption_forecasting_spark.tables import est_scan_partitions

    docs = tbl(spark, SF_SMALL, "documents")
    assert docs._sg_scan_parts == est_scan_partitions(
        spark, f"{SF_SMALL}/documents.parquet"
    )
    assert docs._sg_scan_parts < spark.sparkContext.defaultParallelism
    spread = fanout(docs)
    assert spread is not docs
    assert spread.rdd.getNumPartitions() == spark.sparkContext.defaultParallelism


def test_scan_partition_estimator_matches_spark(spark):
    """Calibration: the driver-side re-run of Spark's file-split
    algorithm must equal df.rdd.getNumPartitions() on every testdata
    table (single file) — the layouts the gate actually sees."""
    from energy_consumption_forecasting_spark.tables import (
        TABLE_NAMES,
        est_scan_partitions,
        load_table,
    )

    for name in TABLE_NAMES:
        df = load_table(spark, SF_SMALL, name)
        est = est_scan_partitions(spark, f"{SF_SMALL}/{name}.parquet")
        actual = df.rdd.getNumPartitions()
        assert est == actual, f"{name}: est {est} != actual {actual}"


def test_q1_filter_pushes_below_fanout_exchange(spark):
    """tpch_q1's shipdate filter sits AFTER the gated fanout in source
    order (the fanout must wrap the scan frame to see the gate tag);
    Catalyst must still push it into the scan."""
    plan = _plan(spark, "tpch_q1_pricing_summary")
    pushed = re.findall(r"PushedFilters: \[([^\]]+)\]", plan)
    assert any("l_shipdate" in p for p in pushed), (
        "shipdate filter no longer reaches the scan:\n" + plan
    )
