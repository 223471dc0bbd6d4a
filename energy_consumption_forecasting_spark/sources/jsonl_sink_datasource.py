"""Custom batch + streaming SINK via Spark 4's Python DataSource
writer API — the write-side twin of the ``dly``/``tick`` custom
readers, completing the DataSource surface (reader / streamReader /
writer / streamWriter).

The interesting part is the commit protocol, implemented the way a
real distributed sink must be:

* ``write()`` runs PER PARTITION on executors and stages its output
  under a task-unique temp name (never the final name — a zombie task
  attempt must not be able to corrupt the result);
* each task returns a :class:`WriterCommitMessage` carrying its staged
  path + row count;
* ``commit()`` runs ONCE on the driver only after every task
  succeeded, promotes the staged files to their final names, and drops
  a ``_SUCCESS`` marker — readers that respect the marker never see a
  torn write;
* ``abort()`` deletes the staged files, so a failed job leaves the
  previous contents untouched.

That is exactly Hadoop's FileOutputCommitter v1 contract, in ~60 lines
of Python, against any filesystem ``os`` can rename on.

DEPLOYMENT REQUIREMENT: executors stage via local ``os`` paths and the
driver promotes them with ``os.replace`` — so driver and executors
MUST share one POSIX filesystem (local mode, or a cluster whose
``path`` sits on NFS/Lustre/FUSE-mounted object storage).  On a
multi-node cluster with node-local disks this protocol silently breaks
(the driver cannot see executor-staged files); a production port
routes the stage/promote/list/delete calls through a filesystem
abstraction (fsspec or Hadoop FS) instead of ``os`` — the commit
SEQUENCE is unchanged, only the I/O primitives swap (round-4 ADVICE).

Rows serialize as JSON-lines in SCHEMA FIELD ORDER (dict order is
deterministic), so the files are byte-stable for a given partition
content.  Both writers share one staging helper — the serialization
contract lives in exactly one place.

Naming: batch commits use a per-JOB unique token in the final names
(``part-<job>-<i>.jsonl``) so append mode ADDS files instead of
clobbering a previous save's ``part-00000``; overwrite mode clears all
committed files first.  Streaming commits use batch-scoped names
(``batch-<id>-<i>.jsonl``) and clear their OWN batch before promoting,
which is what makes micro-batch replay exactly-once.
"""

from __future__ import annotations

import json
import os
import uuid

from pyspark.sql.datasource import (
    DataSource,
    DataSourceStreamWriter,
    DataSourceWriter,
    WriterCommitMessage,
)


class JsonlCommit(WriterCommitMessage):
    def __init__(self, staged: str, rows: int):
        self.staged = staged
        self.rows = rows


def _stage_rows(path: str, fields: list[str], iterator) -> JsonlCommit:
    """Executor-side staging shared by both writers: serialize the
    partition's rows in schema field order to a task-unique temp file."""
    os.makedirs(path, exist_ok=True)
    staged = os.path.join(path, f".staged-{uuid.uuid4().hex}")
    n = 0
    with open(staged, "w") as f:
        for row in iterator:
            d = row.asDict()
            f.write(json.dumps({k: d[k] for k in fields}, default=str))
            f.write("\n")
            n += 1
    return JsonlCommit(staged, n)


class JsonlWriter(DataSourceWriter):
    def __init__(self, options, schema, overwrite: bool):
        self.path = options.get("path")
        if not self.path:
            raise ValueError("ecf_jsonl sink requires a path option")
        self.fields = [f.name for f in schema.fields]
        self.overwrite = overwrite
        self.job = uuid.uuid4().hex[:12]  # append-safe name component

    # executor side — one call per partition
    def write(self, iterator) -> JsonlCommit:
        return _stage_rows(self.path, self.fields, iterator)

    # driver side — only after ALL tasks succeeded
    def commit(self, messages) -> None:
        os.makedirs(self.path, exist_ok=True)
        if self.overwrite:
            for fn in os.listdir(self.path):
                if fn.endswith(".jsonl") or fn == "_SUCCESS":
                    os.remove(os.path.join(self.path, fn))
        total = 0
        for i, m in enumerate(messages):
            final = os.path.join(
                self.path, f"part-{self.job}-{i:05d}.jsonl"
            )
            os.replace(m.staged, final)
            total += m.rows
        with open(os.path.join(self.path, "_SUCCESS"), "w") as f:
            f.write(str(total))

    def abort(self, messages) -> None:
        for m in messages:
            if m is not None and os.path.exists(m.staged):
                os.remove(m.staged)


class JsonlStreamWriter(DataSourceStreamWriter):
    """Streaming twin of the batch writer — exactly-once by
    construction: final file names are deterministic in (batchId,
    partition), and ``commit`` clears any files of its batchId before
    promoting, so a replayed micro-batch (crash between sink commit
    and offset-log write — the classic at-least-once window) REPLACES
    its own output instead of duplicating it."""

    def __init__(self, options, schema):
        self.path = options.get("path")
        if not self.path:
            raise ValueError("ecf_jsonl stream sink requires a path option")
        self.fields = [f.name for f in schema.fields]
        # Failpoint for the crash-window tests (the DataSource commit
        # runs in a worker process, out of monkeypatch's reach): when
        # set, the FIRST commit crashes after staging but before any
        # promote — the marker file arms exactly one crash, so the
        # replayed batch proceeds normally.  Never set in production.
        self.crash_once = options.get("crashoncepath")

    def write(self, iterator) -> JsonlCommit:
        return _stage_rows(self.path, self.fields, iterator)

    def commit(self, messages, batchId: int) -> None:
        if self.crash_once and not os.path.exists(self.crash_once):
            with open(self.crash_once, "w") as f:
                f.write(f"fired at batch {batchId}")
            raise RuntimeError(
                "injected: crash between staging and promote (failpoint)"
            )
        os.makedirs(self.path, exist_ok=True)  # empty batch: no write() ran
        prefix = f"batch-{batchId:09d}-"
        for fn in os.listdir(self.path):  # replay: drop our own batch
            if fn.startswith(prefix) and fn.endswith(".jsonl"):
                os.remove(os.path.join(self.path, fn))
        for i, m in enumerate(messages):
            os.replace(
                m.staged, os.path.join(self.path, f"{prefix}{i:05d}.jsonl")
            )

    def abort(self, messages, batchId: int) -> None:
        for m in messages:
            if m is not None and os.path.exists(m.staged):
                os.remove(m.staged)


class JsonlSinkDataSource(DataSource):
    """``df.write.format("ecf_jsonl").option("path", dir).save()`` and
    ``df.writeStream.format("ecf_jsonl")...`` — one format, both write
    surfaces."""

    @classmethod
    def name(cls) -> str:
        return "ecf_jsonl"

    def writer(self, schema, overwrite: bool) -> JsonlWriter:
        return JsonlWriter(self.options, schema, overwrite)

    def streamWriter(self, schema, overwrite: bool) -> JsonlStreamWriter:
        return JsonlStreamWriter(self.options, schema)
