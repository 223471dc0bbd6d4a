"""Custom stateful streaming operator — applyInPandasWithState.

Per-user running statistics (event count, exact-cents value sum, last
seen timestamp) maintained as explicit keyed state with a processing-
time timeout: the streaming-native form of the reference's per-station
incremental bookkeeping, and the pattern for any custom stateful
operator Spark's built-in windows can't express (SURVEY §7 phase 5).

Scale: state is one tiny tuple per user key, partitioned by the
grouping key across the state store; the timeout evicts idle keys so
the store tracks active users, not all-time users.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

STATE_SCHEMA = "n LONG, sum_cents LONG, last_us LONG"
OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("total_value", T.DoubleType()),
        T.StructField("last_seen_us", T.LongType()),
    ]
)


def _make_update(evict_idle_ms: int | None):
    def _update(
        key: tuple[Any, ...],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        if state.hasTimedOut:
            state.remove()
            return
        n, sum_cents, last_us = state.get if state.exists else (0, 0, 0)
        for pdf in pdfs:
            n += len(pdf)
            # exact integer cents — the streaming analog of the engine's
            # decimal-sum determinism rule
            sum_cents += int(round(float(pdf["value"].sum()) * 100))
            last_us = max(last_us, int(pdf["ts_us"].max()))
        state.update((n, sum_cents, last_us))
        if evict_idle_ms is not None:
            state.setTimeoutDuration(evict_idle_ms)
        yield pd.DataFrame(
            [
                {
                    "user_id": user_id,
                    "n_events": n,
                    "total_value": sum_cents / 100.0,
                    "last_seen_us": last_us,
                }
            ]
        )

    return _update


def user_running_stats(
    events_stream: DataFrame, evict_idle_ms: int | None = None
) -> DataFrame:
    """events stream (with ts timestamp, user_id, value) → running
    per-user stats via keyed state.

    ``evict_idle_ms`` enables ProcessingTimeTimeout eviction of idle
    keys — the continuous-stream posture.  Leave it None for bounded
    drains (availableNow): a pending timeout keeps the query scheduling
    timer batches, so the drain would never terminate."""
    prepared = events_stream.select(
        "user_id", F.unix_micros("ts").alias("ts_us"), "value"
    )
    return prepared.groupBy("user_id").applyInPandasWithState(
        _make_update(evict_idle_ms),
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=(
            GroupStateTimeout.ProcessingTimeTimeout
            if evict_idle_ms is not None
            else GroupStateTimeout.NoTimeout
        ),
    )
