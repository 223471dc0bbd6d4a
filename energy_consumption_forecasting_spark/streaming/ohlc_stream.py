"""Streaming daily OHLC bars — ordered-seal instance #3.

Unlike the Markov/CUSUM seals, the per-day bar state here is a full
SEMILATTICE: open/close are the values at the min/max (ts, event_id)
key and high/low/count/sum are plain min/max/sums — every component
merges associatively and commutatively, so out-of-order arrival WITHIN
a day costs nothing and a replayed batch folds idempotently per day
(emission is once-per-sealed-day, keyed append).

* State per event_type: the pending (unsealed) days, each carrying
  (open_key, open, close_key, close, high, low, n, sum) — bounded by
  the watermark horizon, independent of stream length.
* A day seals once the watermark passes its END; its bar is emitted
  exactly once and the day leaves the state.
* The unsealed tail is recovered from the checkpoint via Spark 4's
  statestore reader, same as markov/cusum.

The drained result shares the batch oracle of ``ts_ohlc_bars``
verbatim (queries/behavior.py::_OHLC_ORACLE).
"""

from __future__ import annotations

from collections.abc import Iterator
from datetime import date, timedelta
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from . import cents_half_up
from .source import events_stream

WATERMARK_DELAY = "1 day"

STATE_SCHEMA = (
    "days ARRAY<LONG>, o_ts ARRAY<LONG>, o_id ARRAY<LONG>, o_c ARRAY<LONG>,"
    " c_ts ARRAY<LONG>, c_id ARRAY<LONG>, c_c ARRAY<LONG>,"
    " hi_c ARRAY<LONG>, lo_c ARRAY<LONG>, n ARRAY<LONG>, sum_c ARRAY<LONG>"
)
OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("d", T.DateType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("open", T.DoubleType()),
        T.StructField("high", T.DoubleType()),
        T.StructField("low", T.DoubleType()),
        T.StructField("close", T.DoubleType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("volume_c", T.LongType()),
    ]
)

_EPOCH = date(1970, 1, 1)
_US_PER_DAY = 86_400_000_000

# per-day bar state tuple indices
# [o_ts, o_id, o_c, c_ts, c_id, c_c, hi, lo, n, sum]


def _merge_day(cur: list | None, new: list) -> list:
    if cur is None:
        return list(new)
    if (new[0], new[1]) < (cur[0], cur[1]):
        cur[0], cur[1], cur[2] = new[0], new[1], new[2]
    if (new[3], new[4]) > (cur[3], cur[4]):
        cur[3], cur[4], cur[5] = new[3], new[4], new[5]
    cur[6] = max(cur[6], new[6])
    cur[7] = min(cur[7], new[7])
    cur[8] += new[8]
    cur[9] += new[9]
    return cur


def _fold_batch(bars: dict[int, list], pdf: pd.DataFrame) -> None:
    pdf = pdf.sort_values(["ts_us", "event_id"], kind="mergesort")
    day = (pdf["ts_us"] // _US_PER_DAY).astype("int64")
    cents = cents_half_up(pdf["value"])
    for d, idx in pdf.groupby(day).groups.items():
        sub_ts = pdf.loc[idx, "ts_us"]
        sub_id = pdf.loc[idx, "event_id"]
        sub_c = cents.loc[idx]
        delta = [
            int(sub_ts.iloc[0]),
            int(sub_id.iloc[0]),
            int(sub_c.iloc[0]),
            int(sub_ts.iloc[-1]),
            int(sub_id.iloc[-1]),
            int(sub_c.iloc[-1]),
            int(sub_c.max()),
            int(sub_c.min()),
            int(len(sub_c)),
            int(sub_c.sum()),
        ]
        bars[int(d)] = _merge_day(bars.get(int(d)), delta)


def _bar_row(event_type: str, d: int, b: list) -> tuple:
    return (
        _EPOCH + timedelta(days=d),
        event_type,
        b[2] / 100.0,
        b[6] / 100.0,
        b[7] / 100.0,
        b[5] / 100.0,
        b[8],
        b[9],
    )


_COLS = ["d", "event_type", "open", "high", "low", "close", "n_events", "volume_c"]


def _update(
    key: tuple[Any, ...],
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    (event_type,) = key
    if state.hasTimedOut:  # pragma: no cover
        state.remove()
        return
    bars: dict[int, list] = {}
    if state.exists:
        s = state.get
        for i, d in enumerate(s[0]):
            bars[int(d)] = [int(col[i]) for col in s[1:]]
    for pdf in pdfs:
        _fold_batch(bars, pdf)
    wm_us = state.getCurrentWatermarkMs() * 1000
    sealed = sorted(d for d in bars if (d + 1) * _US_PER_DAY <= wm_us)
    rows = [_bar_row(event_type, d, bars[d]) for d in sealed]
    for d in sealed:
        del bars[d]
    days = sorted(bars)
    state.update(
        (days, *[[bars[d][i] for d in days] for i in range(10)])
    )
    if rows:
        yield pd.DataFrame(rows, columns=_COLS)


def ohlc_stream(
    spark: SparkSession,
    events_dir: str,
    glob: str = "events.parquet",
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    src = events_stream(
        spark, events_dir, glob, maxFilesPerTrigger=max_files_per_trigger
    )
    stream = src.withWatermark("ts", WATERMARK_DELAY).select(
        "ts",
        "event_type",
        F.unix_micros("ts").alias("ts_us"),
        F.col("event_id").cast("long").alias("event_id"),
        "value",
    )
    return stream.groupBy("event_type").applyInPandasWithState(
        _update,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def _tail_bars(spark: SparkSession, ckpt: str) -> DataFrame:
    """Emit the unsealed buffered days from the final state snapshot."""
    ss = spark.read.format("statestore").load(ckpt)
    g = ss.select(
        F.col("key.event_type").alias("event_type"),
        F.col("value.groupState.*"),
    )

    def finish(pdf: pd.DataFrame) -> pd.DataFrame:
        out = []
        for _, r in pdf.iterrows():
            cols = [
                r["o_ts"], r["o_id"], r["o_c"], r["c_ts"], r["c_id"],
                r["c_c"], r["hi_c"], r["lo_c"], r["n"], r["sum_c"],
            ]
            for i, d in enumerate(r["days"]):
                out.append(
                    _bar_row(
                        r["event_type"], int(d), [int(c[i]) for c in cols]
                    )
                )
        return pd.DataFrame(out, columns=_COLS)

    return g.groupBy("event_type").applyInPandas(finish, OUTPUT_SCHEMA)


def run_ohlc_available_now(
    spark: SparkSession,
    events_dir: str,
    glob: str = "events.parquet",
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    from . import drain_available_now

    return drain_available_now(
        ohlc_stream(spark, events_dir, glob, max_files_per_trigger),
        "ohlc",
        "update",
        finish=lambda table, ckpt: table.dropDuplicates(
            ["event_type", "d"]
        ).unionByName(_tail_bars(spark, ckpt)),
    )
