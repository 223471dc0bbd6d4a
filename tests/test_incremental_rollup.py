"""Streaming incremental rollup: multi-batch merges compose exactly and
every micro-batch boundary is a queryable snapshot."""

from __future__ import annotations

import glob as g
import os
import shutil

import pytest

from pyspark.sql import functions as F

from energy_consumption_forecasting_spark.streaming.incremental_rollup import (
    run_incremental_rollup,
)
from energy_consumption_forecasting_spark.sources.versioned import (
    read_snapshot,
    versions,
)

SF_SMALL = "/root/testdata/sf0.001"
SPLIT_DIR = "/root/repo/.stage/incr_split"
TABLE = "/root/repo/.stage/incr_table_test"


@pytest.fixture(scope="module")
def split_events(spark):
    shutil.rmtree(SPLIT_DIR, ignore_errors=True)
    ev = spark.read.parquet(f"{SF_SMALL}/events.parquet")
    os.makedirs(f"{SPLIT_DIR}/files", exist_ok=True)
    for part, parity in (("a", 0), ("b", 1)):
        ev.filter(F.col("event_id") % 2 == parity).coalesce(1).write.parquet(
            f"{SPLIT_DIR}/tmp_{part}"
        )
        src = g.glob(f"{SPLIT_DIR}/tmp_{part}/part-*.parquet")[0]
        shutil.copy(src, f"{SPLIT_DIR}/files/{part}.parquet")
    return f"{SPLIT_DIR}/files"


def _batch_truth(spark):
    from energy_consumption_forecasting_spark.tables import load_table

    return {
        (r.d, r.event_type): (r.n, r.sum_cents)
        for r in load_table(spark, SF_SMALL, "events")
        .groupBy(F.to_date("ts").alias("d"), "event_type")
        .agg(
            F.count("*").alias("n"),
            F.sum(
                (F.col("value").cast("decimal(18,2)") * 100).cast("long")
            ).alias("sum_cents"),
        )
        .collect()
    }


def test_two_batch_merge_equals_batch_aggregate(spark, split_events):
    shutil.rmtree(TABLE, ignore_errors=True)
    final = run_incremental_rollup(
        spark, split_events, TABLE, glob="*.parquet", max_files_per_trigger=1
    )
    got = {
        (r.d, r.event_type): (r.n, r.sum_cents) for r in final.collect()
    }
    assert got == _batch_truth(spark)
    # one snapshot per micro-batch, both queryable
    assert versions(TABLE) == [1, 2]
    v1 = read_snapshot(spark, TABLE, version=1)
    # the first snapshot holds exactly the first file's contribution:
    # strictly fewer events than the final state, same state schema
    n1 = v1.agg(F.sum("n")).collect()[0][0]
    n2 = final.agg(F.sum("n")).collect()[0][0]
    assert 0 < n1 < n2


def test_incremental_state_equals_complete_mode_drain(spark):
    """The two streaming rollup paths — gate-only complete-mode memory
    sink (daily_rollup.py) and the production foreachBatch merge
    (incremental_rollup.py) — agree on the final state."""
    import tempfile

    from energy_consumption_forecasting_spark.streaming.daily_rollup import (
        run_available_now,
    )

    table = tempfile.mkdtemp(prefix="ecf_incr_equiv_")
    incr = run_incremental_rollup(spark, SF_SMALL, table)
    complete = run_available_now(spark, SF_SMALL)
    got_incr = {
        (r.d, r.event_type): (r.n, round(r.sum_cents / 100.0 / r.n, 9))
        for r in incr.collect()
    }
    got_complete = {
        (r.d, r.event_type): (r.n, round(r.avg_value, 9))
        for r in complete.collect()
    }
    assert got_incr == got_complete
    assert len(got_incr) > 0


def test_replayed_batch_folds_exactly_once(spark, tmp_path):
    """foreachBatch replays a failed batch with the same batch_id; the
    manifest-note transaction check must make the second fold a no-op
    so the state never double-counts."""
    from energy_consumption_forecasting_spark.sources.versioned import (
        read_snapshot,
        snapshots,
    )
    from energy_consumption_forecasting_spark.streaming.incremental_rollup import (
        run_incremental_rollup,
    )

    table = str(tmp_path / "rollup_tbl")
    final = run_incremental_rollup(
        spark, "/root/testdata/sf0.001", table, glob="events.parquet"
    )
    state1 = {tuple(r) for r in final.collect()}
    n_snaps = len(snapshots(table))

    # simulate an engine replay: re-run the same drain against the
    # same table dir with a FRESH checkpoint (same batch ids 0..n)
    run_incremental_rollup(
        spark, "/root/testdata/sf0.001", table, glob="events.parquet"
    )
    state2 = {tuple(r) for r in read_snapshot(spark, table).collect()}
    assert state2 == state1, "replay double-folded the delta"
    assert len(snapshots(table)) == n_snaps
