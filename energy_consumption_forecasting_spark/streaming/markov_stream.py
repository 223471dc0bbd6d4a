"""Streaming first-order Markov transitions — event-time-ORDERED
stateful processing, the one streaming shape the rest of the suite
deliberately avoids.

Every other stream here is order-independent (additive sketches,
engine-managed session windows, range joins); transition extraction is
not — it needs each user's events in event-time order.  The standard
event-time answer (Flink's timer pattern) is implemented with
``applyInPandasWithState``:

* per-user state buffers events that the watermark has not yet sealed;
* once the watermark passes an event's timestamp, no earlier event can
  ever arrive (later ones are dropped as late), so the prefix of the
  buffer strictly below the watermark is SEALED: its transitions are
  counted into the per-user cumulative matrix and only the last sealed
  event is retained as the stitch point;
* each invocation emits the user's CURRENT cumulative counts (update
  semantics — consumers keep the latest row per (user, prev, next), so
  batch replays are idempotent: last-wins, never double-count).

State per user = cumulative matrix (≤ |types|² entries) + the unsealed
buffer (bounded by event rate × watermark delay) — independent of
total history.

The tail: when an availableNow drain ends, events inside the final
watermark horizon are still buffered — their transitions were never
emitted.  Rather than injecting sentinel rows, the runner reads the
final state THROUGH SPARK'S STATESTORE READER
(``spark.read.format("statestore")``) — the Spark 4 state-introspection
surface — explodes the buffers, and computes the tail transitions with
a plain lag window.  Buffered events all sit at-or-above the watermark
and the stitch point below it, so cumulative + tail is EXACTLY the
batch answer, which the shared oracle asserts hash-for-hash.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from .source import events_stream

WATERMARK_DELAY = "10 minutes"

STATE_SCHEMA = (
    "buf_ts ARRAY<LONG>, buf_ids ARRAY<LONG>, buf_tp ARRAY<STRING>, "
    "last_ts LONG, last_id LONG, last_tp STRING, "
    "cnt_prev ARRAY<STRING>, cnt_next ARRAY<STRING>, cnt_n ARRAY<LONG>"
)

OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("prev_type", T.StringType()),
        T.StructField("next_type", T.StringType()),
        T.StructField("n", T.LongType()),
    ]
)


def _update(
    key: tuple[Any, ...],
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    (user_id,) = key
    if state.hasTimedOut:  # pragma: no cover — drain harness uses NoTimeout
        state.remove()
        return
    if state.exists:
        (buf_ts, buf_ids, buf_tp, last_ts, last_id, last_tp,
         cnt_prev, cnt_next, cnt_n) = state.get
        buf = list(zip(buf_ts, buf_ids, buf_tp))
        counts = {
            (p, nx): int(c) for p, nx, c in zip(cnt_prev, cnt_next, cnt_n)
        }
        last = (last_ts, last_id, last_tp) if last_tp is not None else None
    else:
        buf, counts, last = [], {}, None

    for pdf in pdfs:
        buf.extend(
            zip(
                pdf["ts_us"].astype("int64"),
                pdf["event_id"].astype("int64"),
                pdf["event_type"],
            )
        )
    buf.sort(key=lambda e: (e[0], e[1]))

    # Seal strictly below the watermark: any future arrival has
    # ts >= wm (older rows are dropped as late), so nothing can ever
    # sort before a sealed event.
    wm_us = state.getCurrentWatermarkMs() * 1000
    sealed = [e for e in buf if e[0] < wm_us]
    buf = [e for e in buf if e[0] >= wm_us]
    for e in sealed:
        if last is not None:
            k = (last[2], e[2])
            counts[k] = counts.get(k, 0) + 1
        last = e

    state.update(
        (
            [int(e[0]) for e in buf],
            [int(e[1]) for e in buf],
            [e[2] for e in buf],
            int(last[0]) if last else None,
            int(last[1]) if last else None,
            last[2] if last else None,
            [p for p, _ in counts],
            [nx for _, nx in counts],
            [counts[k] for k in counts],
        )
    )
    if counts:
        yield pd.DataFrame(
            {
                "user_id": user_id,
                "prev_type": [p for p, _ in counts],
                "next_type": [nx for _, nx in counts],
                "n": [counts[k] for k in counts],
            }
        )


def markov_stream(
    spark: SparkSession,
    events_dir: str,
    glob: str = "events.parquet",
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    src = events_stream(
        spark, events_dir, glob, maxFilesPerTrigger=max_files_per_trigger
    )
    stream = src.withWatermark("ts", WATERMARK_DELAY).select(
        "ts",  # kept so the watermark column reaches the stateful op
        "user_id",
        F.unix_micros("ts").alias("ts_us"),
        "event_id",
        "event_type",
    )
    return stream.groupBy("user_id").applyInPandasWithState(
        _update,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def _tail_transitions(spark: SparkSession, ckpt: str) -> DataFrame:
    """Unemitted transitions from the FINAL state snapshot: stitch-point
    seed + exploded buffer per user, one lag window.  The statestore
    reader is the introspection path — no sentinel rows, no rerun."""
    from pyspark.sql import Window

    ss = spark.read.format("statestore").load(ckpt)
    g = ss.select(
        F.col("key.user_id").alias("user_id"),
        F.col("value.groupState.*"),
    )
    buffered = g.select(
        "user_id",
        F.explode(F.arrays_zip("buf_ts", "buf_ids", "buf_tp")).alias("e"),
    ).select(
        "user_id",
        F.col("e.buf_ts").alias("ts_us"),
        F.col("e.buf_ids").alias("event_id"),
        F.col("e.buf_tp").alias("event_type"),
    )
    seeds = g.filter(F.col("last_tp").isNotNull()).select(
        "user_id",
        F.col("last_ts").alias("ts_us"),
        F.col("last_id").alias("event_id"),
        F.col("last_tp").alias("event_type"),
    )
    w = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
    return (
        seeds.unionAll(buffered)
        .select(
            F.lag("event_type").over(w).alias("prev_type"),
            F.col("event_type").alias("next_type"),
        )
        .filter(F.col("prev_type").isNotNull())
        .groupBy("prev_type", "next_type")
        .agg(F.count("*").alias("n"))
    )


def run_markov_available_now(
    spark: SparkSession,
    events_dir: str,
    glob: str = "events.parquet",
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """Drain the static directory; return the EXACT global transition
    matrix: last-wins cumulative emissions + statestore buffer tail."""
    from . import drain_available_now

    def finish(table, ckpt):
        # Cumulative per-key counts are MONOTONE, so "latest emission"
        # == per-key MAX — order-independent, no reliance on the memory
        # sink preserving batch-append order.
        sealed = (
            table.groupBy("user_id", "prev_type", "next_type")
            .agg(F.max("n").alias("n"))
            .groupBy("prev_type", "next_type")
            .agg(F.sum("n").alias("n"))
        )
        return (
            sealed.unionByName(_tail_transitions(spark, ckpt))
            .groupBy("prev_type", "next_type")
            .agg(F.sum("n").cast("long").alias("n"))
        )

    return drain_available_now(
        markov_stream(spark, events_dir, glob, max_files_per_trigger),
        "markov",
        "update",
        finish=finish,
    )
