"""Snapshot-versioned parquet sink with time-travel reads.

A minimal lakehouse-table pattern (the idea behind Delta/Iceberg
snapshots, built from parquet + a JSON manifest — no table-format
dependency): every commit writes a NEW data directory plus a manifest
entry; readers resolve a version (or "latest") through the manifest and
scan only that snapshot's files.  Writers never mutate old data, so

* readers are never torn (a half-written commit is invisible until its
  manifest entry lands — the manifest file is replaced atomically);
* any historical version stays queryable ("AS OF" reads);
* storage is append-only, the safe posture for 100 TB pipelines where
  an overwrite bug is unrecoverable.

Concurrency note: one writer at a time (manifest replace is last-wins).
That is the same single-writer contract as a Delta table without a
locking service.
"""

from __future__ import annotations

import json
import os
import time

from pyspark.sql import DataFrame, SparkSession

_MANIFEST = "_manifest.json"


def _manifest_path(table_dir: str) -> str:
    return os.path.join(table_dir, _MANIFEST)


def _read_manifest(table_dir: str) -> list[dict]:
    p = _manifest_path(table_dir)
    if not os.path.exists(p):
        return []
    with open(p) as f:
        return json.load(f)


def commit_snapshot(df: DataFrame, table_dir: str, note: str = "") -> int:
    """Write ``df`` as the next version of the table; returns the new
    version number.  Data lands under ``v=<n>/`` first; the manifest is
    swapped in atomically afterwards, so concurrent readers either see
    the old table or the complete new one."""
    os.makedirs(table_dir, exist_ok=True)
    manifest = _read_manifest(table_dir)
    version = (manifest[-1]["version"] + 1) if manifest else 1
    data_dir = os.path.join(table_dir, f"v={version}")
    df.write.mode("overwrite").parquet(data_dir)
    entry = {
        "version": version,
        "dir": f"v={version}",
        "committed_at": time.time(),
        "note": note,
    }
    tmp = _manifest_path(table_dir) + f".tmp.{os.getpid()}"
    with open(tmp, "w") as f:
        json.dump(manifest + [entry], f, indent=1)
    os.replace(tmp, _manifest_path(table_dir))
    return version


def read_snapshot(
    spark: SparkSession, table_dir: str, version: int | None = None
) -> DataFrame:
    """Time-travel read: ``version=None`` → latest committed snapshot."""
    manifest = _read_manifest(table_dir)
    if not manifest:
        raise FileNotFoundError(f"no committed snapshots under {table_dir}")
    if version is None:
        entry = manifest[-1]
    else:
        matches = [e for e in manifest if e["version"] == version]
        if not matches:
            known = [e["version"] for e in manifest]
            raise ValueError(f"version {version} not in {known}")
        entry = matches[0]
    return spark.read.parquet(os.path.join(table_dir, entry["dir"]))


def versions(table_dir: str) -> list[int]:
    return [e["version"] for e in _read_manifest(table_dir)]


def vacuum(table_dir: str, keep_last: int = 2) -> list[int]:
    """Retention: drop all but the newest ``keep_last`` snapshots.

    Order of operations makes this safe under concurrent readers of
    RETAINED versions: the manifest is rewritten (atomic replace) to
    the surviving entries FIRST, then the orphaned data directories are
    deleted — a reader holding the old manifest can at worst get a
    missing-file error for an already-vacuumed version, never a torn
    snapshot.  Returns the dropped version numbers."""
    import shutil

    manifest = _read_manifest(table_dir)
    if keep_last < 1:
        raise ValueError("keep_last must be >= 1")
    if len(manifest) <= keep_last:
        return []
    dropped, kept = manifest[:-keep_last], manifest[-keep_last:]
    tmp = _manifest_path(table_dir) + f".tmp.{os.getpid()}"
    with open(tmp, "w") as f:
        json.dump(kept, f, indent=1)
    os.replace(tmp, _manifest_path(table_dir))
    for e in dropped:
        shutil.rmtree(os.path.join(table_dir, e["dir"]), ignore_errors=True)
    return [e["version"] for e in dropped]
