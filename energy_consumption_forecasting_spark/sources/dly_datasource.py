"""GHCN .dly as a first-class Spark format — Python DataSource API.

``sources/fixed_width.read_dly`` parses .dly via substring projections
over ``spark.read.text`` (wide 128-column form).  This module goes one
step further using Spark 4's Python DataSource API: ``.dly`` becomes a
registered format —

    spark.dataSource.register(DlyDataSource)
    spark.read.format("dly").load("/path/*.dly")

— that emits the NORMALIZED long form directly (one row per
station/month/element/DAY with the -9999 sentinel already nulled), i.e.
the source performs the melt the reference does as a separate ETL pass
(ETL.py:101-131).

Scale: ``partitions()`` returns one InputPartition per file, so a
directory of thousands of station files reads embarrassingly parallel —
the same unit of parallelism the reference's file loop implies, but
cluster-wide.  Each task streams its file line by line (no whole-file
buffering).
"""

from __future__ import annotations

import glob as _glob

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition

DLY_LONG_SCHEMA = (
    "id string, year int, month int, element string, day int, "
    "value double, mflag string, qflag string, sflag string"
)

_MISSING = -9999.0


class _FilePartition(InputPartition):
    def __init__(self, path: str):
        self.path = path


class DlyReader(DataSourceReader):
    def __init__(self, options):
        self.path = options.get("path")
        if not self.path:
            raise ValueError("dly source requires a path (glob allowed)")

    def partitions(self):
        files = sorted(_glob.glob(self.path))
        if not files:
            raise FileNotFoundError(f"no files match {self.path}")
        return [_FilePartition(p) for p in files]

    def read(self, partition):
        def field(line: str, start: int, length: int) -> str:
            # spec positions are 1-based
            return line[start - 1 : start - 1 + length]

        with open(partition.path, errors="replace") as f:
            for line in f:
                line = line.rstrip("\n")
                if len(line) < 21:
                    continue
                sid = field(line, 1, 11)
                year = int(field(line, 12, 4))
                month = int(field(line, 16, 2))
                element = field(line, 18, 4).strip()
                pos = 22
                for day in range(1, 32):
                    raw = field(line, pos, 5).strip()
                    value = float(raw) if raw else None
                    if value == _MISSING:
                        value = None
                    yield (
                        sid,
                        year,
                        month,
                        element,
                        day,
                        value,
                        field(line, pos + 5, 1).strip() or None,
                        field(line, pos + 6, 1).strip() or None,
                        field(line, pos + 7, 1).strip() or None,
                    )
                    pos += 8


class DlyDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "dly"

    def schema(self) -> str:
        return DLY_LONG_SCHEMA

    def reader(self, schema) -> DlyReader:
        return DlyReader(self.options)


def register(spark) -> None:
    """Idempotent format registration."""
    spark.dataSource.register(DlyDataSource)
