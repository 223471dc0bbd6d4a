"""Streaming CDC apply: per-key latest state upserted into the
versioned store via merge-on-read UPSERT — the capstone composition of
the exactly-once foreachBatch recipe (lineage-scoped txn keys) and
sources/versioned.py::merge_upsert.

Each micro-batch reduces to its latest row per key (deterministic
(ts, event_id) struct max — order-independent within the batch), then
one atomic upsert version lands: matched keys replaced through a
position-delete file, new keys appended.  Replayed batches are skipped
by the txn log, so the table is exactly-once under crash/restart.
Across batches, file-source arrival is modification-time order; staged
tests pin arrival order == event-time order so later batches
legitimately overwrite earlier state (the CDC contract).

State held: none in the stream (stateless per-batch reduce); the
TABLE is the state — bounded by key cardinality, not stream length.
"""

from __future__ import annotations

import shutil
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.versioned import (
    commit_snapshot,
    merge_upsert,
    read_snapshot,
    snapshots,
    versions,
)
from .source import events_stream


def _batch_latest(batch: DataFrame) -> DataFrame:
    """Latest (ts, event_id)-ordered row per user in one micro-batch —
    a struct max, so the reduce is order-independent."""
    top = F.max(
        F.struct(
            "ts",
            "event_id",
            F.col("value").cast("decimal(18,2)").alias("value"),
        )
    ).alias("m")
    return (
        batch.groupBy("user_id")
        .agg(top)
        .select(
            "user_id",
            F.to_date("m.ts").alias("last_d"),
            (F.col("m.value") * 100).cast("long").alias("last_value_c"),
        )
    )


def run_cdc_upsert_available_now(
    spark: SparkSession,
    events_dir: str,
    table_dir: str,
    glob: str = "events.parquet",
    max_files_per_trigger: int | None = None,
    checkpoint_dir: str | None = None,
) -> DataFrame:
    """Drain the (static) directory applying one upsert per micro-batch;
    returns the final table state."""
    from . import (
        pinned_stream_partitions,
        run_id_for_checkpoint,
        txn_record,
        txn_seen,
    )

    own_ckpt = checkpoint_dir is None
    ckpt = checkpoint_dir or tempfile.mkdtemp(prefix="ecf_cdc_ckpt_")
    run_id = run_id_for_checkpoint(ckpt)
    stream = events_stream(
        spark, events_dir, glob, maxFilesPerTrigger=max_files_per_trigger
    )

    def apply(batch: DataFrame, batch_id: int) -> None:
        key = f"{run_id}/{batch_id}"
        if txn_seen(table_dir, key) or any(
            e["note"] == f"txn {key}" for e in snapshots(table_dir)
        ):
            return
        latest = _batch_latest(batch)
        if versions(table_dir):
            merge_upsert(
                spark, table_dir, latest, ["user_id"], note=f"txn {key}"
            )
        else:
            commit_snapshot(latest, table_dir, note=f"txn {key}")
        txn_record(table_dir, key)

    try:
        with pinned_stream_partitions(spark):
            q = (
                stream.writeStream.foreachBatch(apply)
                .option("checkpointLocation", ckpt)
                .trigger(availableNow=True)
                .start()
            )
            q.awaitTermination()
    finally:
        # The returned snapshot reads only table_dir, never the
        # checkpoint — reclaim a self-created tempdir so repeated
        # invocations don't leak one per call.  Caller-supplied
        # checkpoint dirs are the caller's (resume contract).
        if own_ckpt:
            shutil.rmtree(ckpt, ignore_errors=True)
    return read_snapshot(spark, table_dir)
