"""Query construction launches zero Spark jobs (round-6 VERDICT item 3).

Building a registered query's DataFrame must be pure plan construction:
no probe scans, no schema-inference jobs, no driver collects.  At 100 TB
an eager construction means a corpus pass before the query even runs.

Round-6 changes enforced here:

* ``tables.load_table`` supplies the parquet schema from a DRIVER-SIDE
  pyarrow footer read (``_footer_spark_schema``) — ``spark.read.parquet``
  otherwise launches one schema-inference job per call, which made every
  single query "eager" before this round.
* ``dedup_prefix_filter_join``'s bitmap-tier probe (``freq.count()``),
  ``stream_cusum_chart``'s calibration collect, and
  ``pipeline_forecast_e2e``'s ``max(d)`` collect were rebuilt as lazy
  in-plan constructs (distributed-rank total column, stream-static join,
  broadcast scalar join).

The EXEMPT registry below lists every query whose construction is
*allowed* to run jobs, each tagged with why.  A new query is non-exempt
by default — if its construction launches a job, this test fails and
the author either fixes the eagerness or consciously exempts it with a
category.
"""

from __future__ import annotations

import pytest

from energy_consumption_forecasting_spark.queries import load_all

SF = "/root/testdata/sf0.001"

# Why a construction may legitimately run jobs:
#
# DRAIN    — streaming gate: run_*_available_now drains the stream at
#            construction by contract (the result IS the drained state).
# ROUNDTRIP— source/sink gate: writes files / runs a stream / registers
#            a datasource and reads it back; execution is the point.
# FIT      — model training or a hash-pinned evaluation gate: the fit
#            loop (GBT rounds, EM steps, k-means iterations, BO trials,
#            index builds) must execute to produce the result frame.
# ITER     — iterative convergence on data (pagerank, label propagation,
#            k-core, connected components): per-round localCheckpoint
#            lineage truncation executes rounds at construction.
# RANK     — two-pass distributed rank / prefix sum: the documented
#            trade of one counting job for never single-partitioning an
#            unbounded window (operators/ranking.py module docstring).
# SHARED   — localCheckpoint(eager=False) plan sharing where some OTHER
#            eager construct remains: since round 7, _util.shared_plan
#            wraps the lazy checkpoint in aqe_disabled, which makes the
#            .rdd construction itself pure (under AQE it materialized
#            every upstream stage) — that alone un-exempted 14 queries;
#            the entries still here run additional legitimate jobs at
#            construction (pivot value probes, bounded collects).
# BOUNDED  — a documented bounded collect (calendar masks, event-type
#            transition matrices, KB-sized model state) folded into the
#            returned plan.
EXEMPT: dict[str, str] = {
    # --- streaming drains -------------------------------------------------
    "stream_abandoned_views": "DRAIN",
    "stream_anomaly_zscore": "DRAIN",
    "stream_cdc_upsert": "DRAIN",
    "stream_cms_heavyhitters": "DRAIN",
    "stream_cusum_chart": "DRAIN",
    "stream_daily_rollup": "DRAIN",
    "stream_dedup_exact": "DRAIN",
    "stream_heavy_hitters": "DRAIN",
    "stream_incremental_rollup": "DRAIN",
    "stream_interval_attribution": "DRAIN",
    "stream_markov_transitions": "DRAIN",
    "stream_minhash_dedup": "DRAIN",
    "stream_ohlc_bars": "DRAIN",
    "stream_session_window": "DRAIN",
    "stream_source_cap": "DRAIN",
    "stream_static_enrich": "DRAIN",
    "stream_w18_disaggregation": "DRAIN",
    # --- source/sink roundtrip gates -------------------------------------
    "s7_partitioned_sink_roundtrip": "ROUNDTRIP",
    "s9_pickle_roundtrip": "ROUNDTRIP",
    "s10_snapshot_time_travel": "ROUNDTRIP",
    "s11_schema_evolution": "ROUNDTRIP",
    "s13_manifest_skipping": "ROUNDTRIP",
    "s13_orc_roundtrip": "ROUNDTRIP",
    "s14_jsonl_ingest": "ROUNDTRIP",
    "s15_snapshot_diff": "ROUNDTRIP",
    "s16_tick_stream_source": "ROUNDTRIP",
    "s17_xml_roundtrip": "ROUNDTRIP",
    "s18_python_sink_roundtrip": "ROUNDTRIP",
    "s19_stream_sink_roundtrip": "ROUNDTRIP",
    "s21_deletion_vectors": "ROUNDTRIP",
    "s22_upsert_merge": "ROUNDTRIP",
    # --- model fits & evaluation gates ------------------------------------
    # m3_pca_projection / m3_pca_eval: un-exempted r9 — the fit is
    # _pca_fit_frame's lazy in-plan eigh (Gram partials → 1-partition
    # mapInPandas fold), loadings attach by 1-row broadcast; zero
    # construction jobs.
    # m4_factor_analysis / m4_factor_eval: un-exempted r9 — the 1-row
    # exact-moment aggregate feeds a mapInPandas that rebuilds R and
    # runs the identical PAF + varimax core; zero construction jobs.
    "m5_kmeans_clusters": "FIT",
    "m5_tskmeans_dba": "FIT",
    # m5_kshape / m5_dtw_kmedoids: un-exempted r9 — the bounded
    # (≤105-series) fits fold through a 1-partition mapInPandas over
    # the aggregated series / distance frames (identical cores, same
    # seeds); the DBA variant stays FIT: its barycenter update is
    # genuinely iterative ON DATA (per-round Spark jobs).
    "m5_cluster_eval": "FIT",
    # m6_silhouette: un-exempted r9 — exact Rousseeuw silhouette via
    # per-cluster sufficient statistics + broadcast + HOF fold; the
    # eager MLlib ClusteringEvaluator.evaluate is gone.
    # m8_wavelet_eval: un-exempted r9 — per-series DWT checks run
    # DISTRIBUTED in one mapInPandas + a final AND/count aggregate.
    "m10_gbt_forecast": "FIT",
    "m10_gbt_eval": "FIT",
    # m11_lstm_forecast: un-exempted r9 — min/max scalars attach
    # in-plan (1-row broadcast) and the calendar-bounded training set
    # folds through a 1-partition mapInPandas running the identical
    # NumpyLSTM trainer; zero construction jobs.
    "m13_bayesopt_gbt": "FIT",
    "m13_bayesopt_ar_order": "FIT",
    "m13_bayesopt_eval": "FIT",
    "m15_shap_gbt": "FIT",
    "m15_kernel_shap": "FIT",
    "m15_permutation_importance": "FIT",
    "m16_ablation": "FIT",
    "m17_sensitivity": "FIT",
    "m21_som_map": "FIT",
    "pipeline_quality_classifier": "FIT",
    "pipeline_bpe_merges": "FIT",
    "pipeline_bpe_encode": "FIT",
    "pipeline_bpe_roundtrip": "FIT",
    "pipeline_unigram_encode": "FIT",
    # emb_whitening_eval: un-exempted r9 — fit row (mu, W, raw cond)
    # from a lazy 1-partition eigh fold, whiten+moments fused in one
    # broadcast-fed mapInPandas, verdicts folded in-plan.
    # a_approx_percentile_eval: un-exempted r9 — the sketch quantiles
    # are scalar-attached in-plan (1-row broadcast) and the verdicts
    # come from a literal posexplode; zero construction jobs.
    # m11_lstm_eval: un-exempted r9 — same 1-partition trainer fold
    # as m11_lstm_forecast; verdicts emitted from the fold.
    "m15_shap_eval": "FIT",
    "m16_ablation_eval": "FIT",
    "m17_sensitivity_eval": "FIT",
    "m21_som_eval": "FIT",
    "pipeline_unigram_eval": "FIT",
    "pipeline_classifier_eval": "FIT",
    # m9_arima_eval: un-exempted r9 — the per-returnflag CSS fits run
    # distributed in one grouped applyInPandas; no driver collect.
    # dq_referential_integrity: un-exempted r9 — the four FK audits
    # (8 driver actions + createDataFrame) became one lazy union of
    # left-join aggregates; construction is pure.
    # sim_ivf/pq/opq/sq8/ivfpq/sq8_ivf _topk: un-exempted r10 — every
    # quantizer fit is a LAZY 1-row frame (sorted-sample numpy fold for
    # IVF/PQ/OPQ, in-plan min/max aggregate for SQ8) attached by 1-row
    # broadcast; encode/assign/probe are Catalyst HOFs and the ADC
    # kernel reads fits from its query-block row.  Zero construction
    # jobs end-to-end (operators/ann.py "LAZY fit frames" section).
    # sim_ann_recall: un-exempted r10 — the two counts + driver
    # division + createDataFrame became one lazy left-join aggregate.
    "sim_tier_eval": "FIT",
    # sim_mmr_rerank: un-exempted r8 — candidate pool + pair sims are
    # shared_persist'd session frames (registration is job-free; the
    # explicit-hint broadcast fires at first action, not at .rdd).
    # --- iterative convergence on data ------------------------------------
    "graph_pagerank": "ITER",
    "graph_personalized_pagerank": "ITER",
    "graph_modularity": "ITER",
    "dedup_connected_components": "ITER",
    # dedup_lsh_quality(_hi): un-exempted r9 — the three TP/FN/FP
    # counts became one full-outer membership join + aggregate
    # (_lsh_quality_frame); zero construction jobs, one job not three.
    # --- two-pass distributed rank / prefix sum ---------------------------
    # a_pareto_abc / a_abc_xyz: un-exempted r8 — the value-ordered
    # running total moved to global_prefix_sum_lazy with fixed-width
    # revenue bands (the revenue RANGE is catalog-size-invariant, so
    # band count is bounded and no band dominates — the balance the
    # rejected log2-band variant lacked); zero construction jobs.
    "f10_null_col_drop": "RANK",
    # --- localCheckpoint(eager=False) plan sharing (AQE runs stages) ------
    # dedup_prefix_filter_join: un-exempted r8 — the lazy rank inside
    # its checkpointed subtree now passes broadcast_offsets=False, so
    # no explicit-hint broadcast fires at .rdd and the checkpoint
    # construction is job-free.
    "pipeline_balance_e2e": "SHARED",
    # Spark-4 native DataFrame.transpose collects its (aggregate-
    # sized, 5x2) input at construction BY ENGINE DESIGN
    "w5_transpose_native": "BOUNDED",
    "f_sql_scripting_trim": "ROUNDTRIP",  # EXECUTE IMMEDIATE runs the script
    # --- documented bounded collects --------------------------------------
    # w_markov_attribution: un-exempted r9 — the ≤31-cell matrix folds
    # into a 1-row wide aggregate and the 60 absorption iterations run
    # in-plan via F.aggregate(sequence(...)); hash parity preserved.
    # ts_changepoint: un-exempted r9 — the exact big-int argmax moved
    # into a mapInPandas over the 1-row sorted-array aggregate (same
    # calendar-bounded argument, executor-side instead of driver).
}


def test_non_exempt_constructions_launch_zero_jobs(spark):
    qs, _ = load_all()
    unknown = set(EXEMPT) - set(qs)
    assert not unknown, f"EXEMPT names not in registry: {sorted(unknown)}"
    # The rollup gate queries serve from the mtime-idempotent daily
    # store (operators/rollup.materialize_daily): in steady state their
    # construction is pure, but the store must EXIST — materialize it
    # once here (the production "materialize once, serve many" split:
    # the maintenance job below, the pure queries measured after).
    from energy_consumption_forecasting_spark.operators.rollup import (
        materialize_daily,
    )

    materialize_daily(spark, SF)
    dag = spark.sparkContext._jsc.sc().dagScheduler()
    offenders: dict[str, int] = {}
    for name in sorted(qs):
        if name in EXEMPT:
            continue
        before = dag.numTotalJobs()
        qs[name](spark, SF)
        ran = dag.numTotalJobs() - before
        if ran:
            offenders[name] = ran
    assert not offenders, (
        "query construction launched Spark jobs (add an in-plan lazy "
        f"construct, or exempt with a category): {offenders}"
    )


def test_table_scan_construction_is_pure(spark):
    """The root cause of round-5's universal eagerness: spark.read
    .parquet's schema-inference job.  load_table must supply the
    footer-derived schema instead — and that schema must equal what
    inference would produce (so supplying it changes nothing but the
    job count)."""
    from energy_consumption_forecasting_spark.tables import (
        TABLE_NAMES,
        load_table,
    )

    dag = spark.sparkContext._jsc.sc().dagScheduler()
    for name in TABLE_NAMES:
        before = dag.numTotalJobs()
        df = load_table(spark, SF, name)
        assert dag.numTotalJobs() == before, f"{name}: scan construction ran a job"
        inferred = spark.read.parquet(f"{SF}/{name}.parquet").schema
        if name != "events":  # events post-processes ts by contract
            assert df.schema == inferred, f"{name}: footer schema drifted"


def test_footer_schema_fallback_on_unconvertible(tmp_path, spark):
    """_footer_spark_schema returns None (never raises) when the footer
    can't be converted; load paths then fall back to inference."""
    from energy_consumption_forecasting_spark.tables import (
        _footer_spark_schema,
    )

    bad = tmp_path / "not_parquet.parquet"
    bad.write_bytes(b"this is not a parquet file")
    assert _footer_spark_schema(str(bad)) is None
