"""Custom batch SINK via Spark 4's Python DataSource writer API —
the write-side twin of the ``dly``/``tick`` custom readers, completing
the DataSource surface (reader / streamReader / writer).

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

Rows serialize as JSON-lines in SCHEMA FIELD ORDER (dict order is
deterministic), so the files are byte-stable for a given partition
content.
"""

from __future__ import annotations

import json
import os
import uuid

from pyspark.sql.datasource import (
    DataSource,
    DataSourceWriter,
    WriterCommitMessage,
)


class JsonlCommit(WriterCommitMessage):
    def __init__(self, staged: str, rows: int):
        self.staged = staged
        self.rows = rows


class JsonlWriter(DataSourceWriter):
    def __init__(self, options, schema, overwrite: bool):
        self.path = options.get("path")
        if not self.path:
            raise ValueError("ecf_jsonl sink requires a path option")
        self.fields = [f.name for f in schema.fields]
        self.overwrite = overwrite

    # executor side — one call per partition
    def write(self, iterator) -> JsonlCommit:
        os.makedirs(self.path, exist_ok=True)
        staged = os.path.join(self.path, f".staged-{uuid.uuid4().hex}")
        n = 0
        with open(staged, "w") as f:
            for row in iterator:
                d = row.asDict()
                f.write(
                    json.dumps({k: d[k] for k in self.fields}, default=str)
                )
                f.write("\n")
                n += 1
        return JsonlCommit(staged, n)

    # driver side — only after ALL tasks succeeded
    def commit(self, messages) -> None:
        if self.overwrite:
            for fn in os.listdir(self.path):
                if fn.endswith(".jsonl") or fn == "_SUCCESS":
                    os.remove(os.path.join(self.path, fn))
        total = 0
        for i, m in enumerate(messages):
            final = os.path.join(self.path, f"part-{i:05d}.jsonl")
            os.replace(m.staged, final)
            total += m.rows
        with open(os.path.join(self.path, "_SUCCESS"), "w") as f:
            f.write(str(total))

    def abort(self, messages) -> None:
        for m in messages:
            if m is not None and os.path.exists(m.staged):
                os.remove(m.staged)


class JsonlSinkDataSource(DataSource):
    """``df.write.format("ecf_jsonl").option("path", dir).save()``."""

    @classmethod
    def name(cls) -> str:
        return "ecf_jsonl"

    def writer(self, schema, overwrite: bool) -> JsonlWriter:
        return JsonlWriter(self.options, schema, overwrite)
