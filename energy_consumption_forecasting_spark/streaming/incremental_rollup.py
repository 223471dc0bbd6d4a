"""Streaming incremental materialized rollup — foreachBatch + snapshots.

The end-to-end incremental pipeline the batch pieces compose into:
events stream in, each micro-batch folds its delta into a re-aggregable
daily state (counts + exact integer cents — the hypertable contract
from operators/rollup.py), and every merge is committed as a NEW
version of a snapshot-versioned table (sources/versioned.py).  So the
rollup is

* **incremental** — each batch touches batch-sized data plus the
  (tiny) prior state, never the full fact history;
* **exact** — additive integer/decimal state composes associatively,
  so after any number of batches the state equals the one-shot batch
  aggregate (the gate oracle's check);
* **time-travelable** — every micro-batch boundary is a queryable
  snapshot (AS-OF reads show the rollup as of batch N).

At 100 TB the same shape runs continuously: state size is calendar ×
type bounded, the merge is a groupBy on that bounded key, and the
snapshot commit writes only the new state version.
"""

from __future__ import annotations

import shutil
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.versioned import commit_snapshot, read_snapshot, snapshots, versions
from .source import events_stream

_STATE_COLS = ("d", "event_type", "n", "sum_cents")


def _batch_state(batch: DataFrame) -> DataFrame:
    """Per-day per-type additive state for one micro-batch.

    ``batch`` already carries a normalized TimestampType ``ts``
    (streaming/source.py probes the on-disk type)."""
    return (
        batch.groupBy(F.to_date("ts").alias("d"), "event_type")
        .agg(
            F.count("*").alias("n"),
            F.sum(
                (F.col("value").cast("decimal(18,2)") * 100).cast("long")
            ).alias("sum_cents"),
        )
    )


def _merge(old: DataFrame | None, delta: DataFrame) -> DataFrame:
    if old is None:
        return delta
    return (
        old.select(*_STATE_COLS)
        .unionByName(delta.select(*_STATE_COLS))
        .groupBy("d", "event_type")
        .agg(F.sum("n").alias("n"), F.sum("sum_cents").alias("sum_cents"))
    )


def run_incremental_rollup(
    spark: SparkSession,
    events_dir: str,
    table_dir: str,
    glob: str = "events.parquet",
    max_files_per_trigger: int | None = None,
    checkpoint_dir: str | None = None,
) -> DataFrame:
    """Drain the directory through foreachBatch, committing one snapshot
    per micro-batch; returns the final rollup state (latest snapshot).

    Pass a PERSISTENT ``checkpoint_dir`` to get incremental semantics
    across calls (new files fold as new batches; a crash-replayed
    batch is skipped by the txn guard).  The default ephemeral
    checkpoint is the gate/one-shot form."""
    from . import (
        pinned_stream_partitions,
        run_id_for_checkpoint,
        txn_record,
        txn_seen,
    )

    own_ckpt = checkpoint_dir is None
    ckpt = checkpoint_dir or tempfile.mkdtemp(prefix="ecf_incr_ckpt_")
    run_id = run_id_for_checkpoint(ckpt)
    stream = events_stream(
        spark, events_dir, glob, maxFilesPerTrigger=max_files_per_trigger
    )

    def upsert(batch: DataFrame, batch_id: int) -> None:
        # foreachBatch side effects are AT-LEAST-ONCE: a crash between
        # the sink commit and the offset commit replays this batch id
        # on restart.  The txn log (separate from the vacuumable
        # snapshot manifest) skips the replayed fold; the key is
        # scoped by the CHECKPOINT lineage — batch ids restart at 0
        # under a fresh checkpoint, so a bare id would dedupe away
        # genuinely new data.
        key = f"{run_id}/{batch_id}"
        # seen = txn log OR a manifest note carrying the key: the
        # snapshot commit is atomic and lands BEFORE the log append,
        # so a crash in between leaves the note as the evidence — the
        # log exists only because vacuum() rewrites the manifest and
        # must not erase txn history.
        if txn_seen(table_dir, key) or any(
            e["note"] == f"txn {key}" for e in snapshots(table_dir)
        ):
            return
        delta = _batch_state(batch)
        prior = (
            read_snapshot(batch.sparkSession, table_dir)
            if versions(table_dir)
            else None
        )
        merged = _merge(prior, delta)
        commit_snapshot(merged, table_dir, note=f"txn {key}")
        txn_record(table_dir, key)

    try:
        with pinned_stream_partitions(spark):
            q = (
                stream.writeStream.foreachBatch(upsert)
                .option("checkpointLocation", ckpt)
                .trigger(availableNow=True)
                .start()
            )
            q.awaitTermination()
    finally:
        # the returned snapshot reads table_dir, never the checkpoint;
        # a caller-supplied checkpoint is the caller's (resume contract)
        if own_ckpt:
            shutil.rmtree(ckpt, ignore_errors=True)
    return read_snapshot(spark, table_dir)
