"""Crash-window failure injection for the exactly-once sinks (round-6
VERDICT item 7).

The txn-log design docs a specific commit ORDER per sink; these tests
inject crashes INSIDE the documented at-least-once windows and assert
the replay lands exactly-once:

* incremental rollup — crash BETWEEN the atomic snapshot commit and the
  txn-log append: the replayed batch must be skipped via the manifest
  NOTE (the commit-order argument in incremental_rollup.py: the note
  lands with the snapshot, so a crash in between leaves the note as the
  evidence), never folded twice.
* ANN ingest — crash BETWEEN executor staging and the driver promote:
  the restart must sweep the orphaned stage dir and half-promoted
  prefix files, then re-stage and promote exactly once.
* jsonl stream sink — crash DURING a batch's promote: the restart
  replays the batch, whose commit clears its own batch-prefixed files
  before promoting (the deterministic-name replace semantics), so the
  final directory holds each row exactly once.
"""

from __future__ import annotations

import os
import shutil

import pytest
from pyspark.sql import functions as F

SF_SMALL = "/root/testdata/sf0.001"


def _events_truth(spark):
    ev = spark.read.parquet(f"{SF_SMALL}/events.parquet")
    return {
        (str(r["d"]), r["event_type"]): (r["n"], r["c"])
        for r in ev.groupBy(
            F.to_date("ts").alias("d"), "event_type"
        )
        .agg(
            F.count("*").alias("n"),
            F.sum((F.col("value").cast("decimal(18,2)") * 100).cast("long"))
            .cast("long")
            .alias("c"),
        )
        .collect()
    }


def test_rollup_crash_between_snapshot_commit_and_txn_record(
    spark, tmp_path, monkeypatch
):
    from energy_consumption_forecasting_spark import streaming as S
    from energy_consumption_forecasting_spark.sources.versioned import (
        read_snapshot,
        versions,
    )
    from energy_consumption_forecasting_spark.streaming.incremental_rollup import (
        run_incremental_rollup,
    )

    src = str(tmp_path / "events_dir")
    ckpt = str(tmp_path / "ckpt")
    table = str(tmp_path / "tbl")
    os.makedirs(src)
    shutil.copy(f"{SF_SMALL}/events.parquet", f"{src}/a.parquet")

    real_record = S.txn_record

    def bomb(state_dir, key):
        raise RuntimeError("injected: crash between snapshot-commit and txn-record")

    monkeypatch.setattr(S, "txn_record", bomb)
    with pytest.raises(Exception, match="injected|Terminated|foreach"):
        run_incremental_rollup(
            spark, src, table, glob="*.parquet", checkpoint_dir=ckpt
        )
    # the crash window left the snapshot COMMITTED (with its txn note)
    # but the txn log unwritten — exactly the documented hazard
    assert versions(table) == [1]
    assert not os.path.exists(os.path.join(table, "_txn.json"))

    monkeypatch.setattr(S, "txn_record", real_record)
    # restart with the SAME checkpoint: the offsets log has the batch,
    # the commit log doesn't, so Spark replays it — the manifest note
    # must make the replay a no-op
    run_incremental_rollup(
        spark, src, table, glob="*.parquet", checkpoint_dir=ckpt
    )
    assert versions(table) == [1], "replayed batch was folded twice"
    got = {
        (str(r["d"]), r["event_type"]): (r["n"], r["sum_cents"])
        for r in read_snapshot(spark, table).collect()
    }
    assert got == _events_truth(spark)


def test_ann_ingest_crash_between_staging_and_promote(
    spark, tmp_path, monkeypatch
):
    from energy_consumption_forecasting_spark.sources.ann_index import (
        build_ann_index,
    )
    from energy_consumption_forecasting_spark.streaming.ann_ingest import (
        ingest_vectors_available_now,
    )

    e = (
        spark.read.parquet(f"{SF_SMALL}/embeddings.parquet")
        .select("vec_id", F.col("embedding").cast("array<double>").alias("v"))
    )
    base = e.filter(F.col("vec_id") < 80)
    newer = e.filter((F.col("vec_id") >= 80) & (F.col("vec_id") < 120))

    idx = str(tmp_path / "idx")
    build_ann_index(base, idx, n_cells=4)
    truth_idx = str(tmp_path / "truth")
    build_ann_index(base, truth_idx, n_cells=4)

    vec_dir = str(tmp_path / "arrivals")
    newer.select(
        "vec_id", F.col("v").cast("array<float>").alias("embedding")
    ).coalesce(1).write.parquet(vec_dir)
    ckpt = str(tmp_path / "ingest_ckpt")

    real_replace = os.replace

    def bomb(src_path, dst_path):
        # only the ANN promote path (stage dir -> codes dir); everything
        # else (parquet commits, manifest swaps) proceeds normally
        if "_stage_" in str(src_path):
            raise RuntimeError("injected: crash between staging and promote")
        return real_replace(src_path, dst_path)

    monkeypatch.setattr(os, "replace", bomb)
    with pytest.raises(Exception, match="injected|Terminated|foreach"):
        ingest_vectors_available_now(
            spark, idx, vec_dir, checkpoint_dir=ckpt
        )
    # the crash left an orphaned stage dir and no recorded txn
    assert any(
        fn.startswith("_stage_") for fn in os.listdir(idx)
    ), "expected an orphaned stage dir in the crash window"

    monkeypatch.setattr(os, "replace", real_replace)
    ingest_vectors_available_now(spark, idx, vec_dir, checkpoint_dir=ckpt)
    # replay swept the orphan and promoted exactly once
    assert not any(fn.startswith("_stage_") for fn in os.listdir(idx))
    # clean reference: same ingest into the pristine twin index
    ingest_vectors_available_now(
        spark, truth_idx, vec_dir, checkpoint_dir=str(tmp_path / "ck2")
    )
    got = {
        r["vec_id"]: (list(r["code"]), r["cell"])
        for r in spark.read.parquet(f"{idx}/codes").collect()
    }
    want = {
        r["vec_id"]: (list(r["code"]), r["cell"])
        for r in spark.read.parquet(f"{truth_idx}/codes").collect()
    }
    assert got == want
    assert len(got) == 120


def test_jsonl_stream_sink_crash_during_promote(spark, tmp_path, monkeypatch):
    from energy_consumption_forecasting_spark.sources.jsonl_sink_datasource import (
        JsonlSinkDataSource,
    )
    from energy_consumption_forecasting_spark.streaming import (
        pinned_stream_partitions,
    )
    from energy_consumption_forecasting_spark.streaming.source import (
        events_stream,
    )

    spark.dataSource.register(JsonlSinkDataSource)
    out = str(tmp_path / "jsonl_out")
    ckpt = str(tmp_path / "jsonl_ckpt")
    src = events_stream(spark, SF_SMALL, "events.parquet").select(
        "event_id", "event_type"
    )

    # the DataSource commit runs in a worker process — injection goes
    # through the sink's documented failpoint option (one armed crash,
    # marker file records the firing)
    marker = str(tmp_path / "crash_marker")

    def run():
        with pinned_stream_partitions(spark):
            q = (
                src.writeStream.format("ecf_jsonl")
                .option("path", out)
                .option("crashoncepath", marker)
                .option("checkpointLocation", ckpt)
                .trigger(availableNow=True)
                .start()
            )
            q.awaitTermination()

    with pytest.raises(Exception, match="injected|Terminated|stream"):
        run()
    assert os.path.exists(marker), "failpoint never fired"
    # restart: the batch replays; its commit clears its own
    # batch-prefixed files before promoting, so rows land exactly once
    run()

    n_src = spark.read.parquet(f"{SF_SMALL}/events.parquet").count()
    got = spark.read.json(f"{out}/*.jsonl")
    assert got.count() == n_src
    assert got.select("event_id").distinct().count() == n_src
    # no torn staging files survive the recovery
    assert not any(fn.startswith(".staged-") for fn in os.listdir(out))
