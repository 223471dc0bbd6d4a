"""Deterministic synthetic tick stream — Spark 4 Python STREAMING
DataSource (the streaming sibling of sources/dly_datasource.py).

Demonstrates the full custom-source contract a connector author needs:
``initialOffset`` / ``latestOffset`` / ``read(start, end)`` /
``commit`` on ``SimpleDataSourceStreamReader``.  Unlike the built-in
``rate`` source, every emitted row is a PURE FUNCTION of its global
index, so a drain is exactly reproducible and oracle-checkable with a
closed-form ``generate_series`` query:

    tick_id  = i
    ts_us    = 2024-01-01T00:00:00Z + i seconds    (epoch micros)
    series   = i mod 8
    value    = ((i * 2654435761) mod 1000) / 100.0   (Knuth hash, 2dp)

Offsets are row counts: the reader hands out at most
``rowsPerBatch`` new rows per micro-batch until ``maxRows`` is
reached, then reports no new data — so an ``availableNow`` drain
terminates with exactly ``maxRows`` rows across ``ceil(max/batch)``
batches.  State lives in the offset JSON the engine checkpoints; the
source itself is stateless — the recovery contract (replay
``read(start, end)`` for any committed range) is what the determinism
guarantees.
"""

from __future__ import annotations

from pyspark.sql.datasource import DataSource, SimpleDataSourceStreamReader

TICK_SCHEMA = "tick_id long, ts_us long, series int, value double"

_EPOCH_2024_US = 1_704_067_200_000_000  # 2024-01-01T00:00:00Z
_KNUTH = 2654435761


def _row(i: int):
    return (
        i,
        _EPOCH_2024_US + i * 1_000_000,
        i % 8,
        ((i * _KNUTH) % 1000) / 100.0,
    )


class TickStreamReader(SimpleDataSourceStreamReader):
    def __init__(self, options):
        self.rows_per_batch = int(options.get("rowsPerBatch", 100))
        self.max_rows = int(options.get("maxRows", 1000))

    def initialOffset(self):
        return {"row": 0}

    def read(self, start):
        i0 = int(start["row"])
        i1 = min(i0 + self.rows_per_batch, self.max_rows)
        # iter(list): the engine both pickles the prefetched iterator
        # into its offset cache (generators can't pickle) and calls
        # next() on it (a bare list won't do) — a list_iterator is the
        # one object that satisfies both
        return iter([_row(i) for i in range(i0, i1)]), {"row": i1}

    def readBetweenOffsets(self, start, end):
        # replay for recovery: identical rows for any committed range
        return iter(
            [_row(i) for i in range(int(start["row"]), int(end["row"]))]
        )

    def commit(self, end):
        pass  # nothing external to clean up — rows are synthesized


class TickDataSource(DataSource):
    @classmethod
    def name(cls):
        return "ticks"

    def schema(self):
        return TICK_SCHEMA

    def simpleStreamReader(self, schema):
        return TickStreamReader(self.options)


def drain_ticks(
    spark,
    rows_per_batch: int = 137,
    max_rows: int = 1000,
    timeout_s: float = 120.0,
):
    """Run the tick stream until all ``max_rows`` rows have landed in a
    memory sink; returns the drained DataFrame.

    availableNow only consumes the batch prefetched at trigger time for
    a Simple stream reader, so a bounded drain runs a fast
    processing-time trigger and stops once the source reports no new
    rows — batch boundaries don't matter because every row is a pure
    function of its index."""
    import tempfile
    import time
    import uuid

    import shutil

    spark.dataSource.register(TickDataSource)
    sink = f"ticks_{uuid.uuid4().hex[:8]}"
    ckpt = tempfile.mkdtemp(prefix="ecf_ticks_")
    try:
        q = (
            spark.readStream.format("ticks")
            .option("rowsPerBatch", str(rows_per_batch))
            .option("maxRows", str(max_rows))
            .load()
            .writeStream.format("memory")
            .queryName(sink)
            .outputMode("append")
            .option("checkpointLocation", ckpt)
            .trigger(processingTime="0 seconds")
            .start()
        )
        deadline = time.time() + timeout_s
        try:
            while time.time() < deadline:
                if spark.table(sink).count() >= max_rows:
                    break
                time.sleep(0.2)
        finally:
            q.stop()
            q.awaitTermination()
        drained = spark.table(sink).count()
        if drained < max_rows:
            # Fail loudly with the real cause: a partially-drained table
            # would otherwise surface downstream as a confusing row-count
            # mismatch in the s16 gate.
            raise TimeoutError(
                f"tick stream drained only {drained}/{max_rows} rows "
                f"within {timeout_s}s (sink table '{sink}')"
            )
        # materialize so the checkpoint + sink view can be reclaimed
        return spark.table(sink).localCheckpoint(eager=True)
    finally:
        shutil.rmtree(ckpt, ignore_errors=True)
        spark.catalog.dropTempView(sink)
