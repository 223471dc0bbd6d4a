"""transformWithStateInPandas — the Spark 4 arbitrary-state API.

``applyInPandasWithState`` (streaming/stateful.py, anomaly_stream.py)
is the legacy arbitrary-state operator: one opaque state tuple per key,
no timers, no state introspection.  Spark 4's ``transformWithState``
replaces it with a ``StatefulProcessor`` owning typed state primitives
(ValueState / ListState / MapState) and event/processing-time timers —
the API new stateful operators should target.

This module re-implements the per-user running-stats operator on the
new API, with the SAME exact-integer discipline as the legacy twin
(value cents summed as Python ints inside the handler, one float cast
at emit): ``tests/test_stateful_v2.py`` pins new-API == legacy-API ==
batch groupBy on a static drain, so the migration path is
evidence-backed, not aspirational.

Scale: state is one (count, cents) pair per user in the state store
(RocksDB-capable via streaming/__init__.rocksdb_state_store); the
shuffle is the groupBy key only.

ENVIRONMENT GATE: transformWithState's Python worker protocol speaks
protobuf; ``google.protobuf`` is absent from this container, so the
operator constructs but cannot RUN here — the equivalence test
(tests/test_stateful_v2.py) skips with that reason and executes fully
on any environment with protobuf installed.  Same gate class as
torch/statsmodels/pywt.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from . import cents_half_up
from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.stateful_processor import (
    StatefulProcessor,
    StatefulProcessorHandle,
)

OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("total_value", T.DoubleType()),
    ]
)

_STATE_SCHEMA = T.StructType(
    [
        T.StructField("n", T.LongType()),
        T.StructField("cents", T.LongType()),
    ]
)


class UserStatsProcessor(StatefulProcessor):
    """Running (count, exact-cents sum) per user."""

    def init(self, handle: StatefulProcessorHandle) -> None:
        self._state = handle.getValueState("stats", _STATE_SCHEMA)

    def handleInputRows(
        self, key, rows: Iterator[pd.DataFrame], timerValues
    ) -> Iterator[pd.DataFrame]:
        n, cents = (
            self._state.get() if self._state.exists() else (0, 0)
        )
        for pdf in rows:
            n += len(pdf)
            # exact integer cents — same rule as the legacy handler
            cents += int(cents_half_up(pdf["value"]).sum())
        self._state.update((n, cents))
        yield pd.DataFrame(
            {
                "user_id": [int(key[0])],
                "n_events": [n],
                "total_value": [cents / 100.0],
            }
        )

    def close(self) -> None:
        pass


def user_running_stats_v2(events: DataFrame) -> DataFrame:
    """events (needs user_id, value) → per-user running stats, update
    semantics (latest row per user wins)."""
    return events.select("user_id", "value").groupBy(
        "user_id"
    ).transformWithStateInPandas(
        statefulProcessor=UserStatsProcessor(),
        outputStructType=OUTPUT_SCHEMA,
        outputMode="Update",
        timeMode="None",
    )
