"""Streaming CUSUM control chart — the second instance of the
ordered-seal pattern introduced by ``markov_stream``.

Real-world monitoring shape: the control parameters (target mu, slack
k, threshold h) are CALIBRATED OFFLINE from reference data and reach
the stream through a stream-static join on the calibration table —
exactly how production control charts run (and zero driver-side
collects: building the chart launches no jobs).  Here the calibration
frame is the same exact-decimal batch statistic the batch query
(``ts_cusum_chart``) derives, so the streamed chart equals the batch
chart bit-for-bit and SHARES its oracle.

Ordered-seal mechanics (see markov_stream for the general argument):

* per event_type, the state buffers PARTIAL DAY SUMS (exact integer
  cents — additive, so out-of-order arrival within a day is free);
* a day seals once the watermark passes its end: no event for it can
  arrive anymore, its total is final, and the CUSUM recursion
  advances over sealed days in calendar order, emitting one final row
  per day (append semantics — a day is emitted exactly once, so
  replays dedup by key);
* the unsealed tail (buffered days at-or-after the watermark horizon)
  is recovered from the checkpoint through the statestore reader and
  the recursion is CONTINUED from the persisted (cplus, cminus) state
  — per-series, in one grouped pass.

State per key = |pending days| × two longs + two doubles — bounded by
the watermark horizon, independent of stream length.
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
    "days ARRAY<LONG>, cents ARRAY<LONG>, cplus DOUBLE, cminus DOUBLE"
)
OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("event_type", T.StringType()),
        T.StructField("d", T.DateType()),
        T.StructField("cplus", T.DoubleType()),
        T.StructField("cminus", T.DoubleType()),
        T.StructField("alert", T.BooleanType()),
    ]
)

_EPOCH = date(1970, 1, 1)
_US_PER_DAY = 86_400_000_000


def _cusum_steps(
    days: list[int], cents: dict[int, int], cp: float, cm: float, mu: float
) -> tuple[list[tuple[int, float, float, bool]], float, float]:
    """Advance the recursion over ``days`` (ascending) — the IDENTICAL
    expression tree as queries/smoothing.cusum_chart."""
    k = mu / 8.0
    h = mu / 2.0
    out = []
    for d in days:
        x = cents[d] / 100.0
        cp = max(0.0, cp + ((x - mu) - k))
        cm = max(0.0, cm + ((mu - x) - k))
        out.append((d, cp, cm, cp > h or cm > h))
    return out, cp, cm


def _update(
    key: tuple[Any, ...],
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    (event_type,) = key
    if state.hasTimedOut:  # pragma: no cover
        state.remove()
        return
    if state.exists:
        days, cents_l, cp, cm = state.get
        cents = dict(zip(days, cents_l))
    else:
        cents, cp, cm = {}, 0.0, 0.0
    # mu rides every row via the stream-static calibration join (no
    # driver-side dict: query construction launches zero jobs); a key
    # is only invoked with rows under NoTimeout, so the first row of
    # the first batch always carries it.  NULL mu = uncalibrated type
    # that the left join kept visible — fail as loudly as the old
    # KeyError contract did.
    mu: float | None = None
    for pdf in pdfs:
        if mu is None and len(pdf):
            m = pdf["mu"].iloc[0]
            mu = None if pd.isna(m) else float(m)
        day = (pdf["ts_us"] // _US_PER_DAY).astype("int64")
        c = cents_half_up(pdf["value"])
        for d, s in c.groupby(day).sum().items():
            cents[int(d)] = cents.get(int(d), 0) + int(s)
    if mu is None:
        raise KeyError(
            f"no CUSUM calibration (mu) for event_type {event_type!r}"
        )
    # a day D is sealed once the watermark passed its END:
    # wm >= (D+1)*day ⟺ no event with ts inside D can still arrive
    wm_us = state.getCurrentWatermarkMs() * 1000
    sealed = sorted(d for d in cents if (d + 1) * _US_PER_DAY <= wm_us)
    rows, cp, cm = _cusum_steps(sealed, cents, cp, cm, mu)
    for d in sealed:
        del cents[d]
    state.update(
        (list(cents), [cents[d] for d in cents], float(cp), float(cm))
    )
    if rows:
        yield pd.DataFrame(
            {
                "event_type": event_type,
                "d": [_EPOCH + timedelta(days=d) for d, _, _, _ in rows],
                "cplus": [v for _, v, _, _ in rows],
                "cminus": [v for _, _, v, _ in rows],
                "alert": [a for _, _, _, a in rows],
            }
        )


def _mu_frame(
    spark: SparkSession, mu_by_type: dict[str, float] | DataFrame
) -> DataFrame:
    """Calibration as a DataFrame (event_type, mu).  A dict becomes a
    local relation — either way, nothing is collected: the calibration
    reaches executors through a stream-static join, the production
    control-chart topology."""
    if isinstance(mu_by_type, DataFrame):
        # Spark re-evaluates the static side of a stream-static join on
        # EVERY micro-batch; a lazy localCheckpoint materializes the
        # (event-type-sized) calibration once at the first trigger and
        # replays blocks thereafter — without running a job at
        # construction (review catch: the raw aggregate re-scanned the
        # whole source per trigger).
        #
        # Calibration contract: ONE row per event_type.  A duplicate key
        # would silently fan out every stream row through the left join
        # (double-counting cents) — the same 'multiple source matches'
        # hazard merge_upsert rejects — so the group-by below enforces
        # uniqueness and raise_error fails the first trigger loudly.
        return (
            mu_by_type.groupBy("event_type")
            .agg(
                F.min(F.col("mu").cast("double")).alias("mu"),
                F.count(F.lit(1)).alias("_n"),
            )
            .select(
                "event_type",
                F.when(F.col("_n") == 1, F.col("mu"))
                .otherwise(
                    F.raise_error(
                        F.concat(
                            F.lit(
                                "cusum calibration has duplicate rows "
                                "for event_type "
                            ),
                            F.col("event_type"),
                        )
                    ).cast("double")
                )
                .alias("mu"),
            )
            .localCheckpoint(eager=False)
        )
    return spark.createDataFrame(
        [(k, float(v)) for k, v in mu_by_type.items()],
        "event_type string, mu double",
    )


def cusum_stream(
    spark: SparkSession,
    events_dir: str,
    mu_by_type: dict[str, float] | DataFrame,
    glob: str = "events.parquet",
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    src = events_stream(
        spark, events_dir, glob, maxFilesPerTrigger=max_files_per_trigger
    )
    stream = src.withWatermark("ts", WATERMARK_DELAY).select(
        "ts", "event_type", F.unix_micros("ts").alias("ts_us"), "value"
    )
    # LEFT stream-static join: an uncalibrated type stays visible (NULL
    # mu) and fails loudly inside the state update, preserving the old
    # KeyError contract an inner join would silently swallow.
    stream = stream.join(_mu_frame(spark, mu_by_type), "event_type", "left")
    return stream.groupBy("event_type").applyInPandasWithState(
        _update,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def _tail_rows(
    spark: SparkSession, ckpt: str, mu_by_type: dict[str, float] | DataFrame
) -> DataFrame:
    """Continue each series' recursion over its unsealed buffered days,
    read from the final state snapshot via the statestore reader."""
    ss = spark.read.format("statestore").load(ckpt)
    g = ss.select(
        F.col("key.event_type").alias("event_type"),
        F.col("value.groupState.*"),
    ).join(_mu_frame(spark, mu_by_type), "event_type", "left")

    def finish(pdf: pd.DataFrame) -> pd.DataFrame:
        out = []
        for _, r in pdf.iterrows():
            if pd.isna(r["mu"]):
                raise KeyError(
                    "no CUSUM calibration (mu) for event_type "
                    f"{r['event_type']!r}"
                )
            cents = {int(d): int(c) for d, c in zip(r["days"], r["cents"])}
            rows, _, _ = _cusum_steps(
                sorted(cents),
                cents,
                float(r["cplus"]),
                float(r["cminus"]),
                float(r["mu"]),
            )
            out.extend(
                (
                    r["event_type"],
                    _EPOCH + timedelta(days=d),
                    cp,
                    cm,
                    al,
                )
                for d, cp, cm, al in rows
            )
        return pd.DataFrame(
            out, columns=["event_type", "d", "cplus", "cminus", "alert"]
        )

    return g.groupBy("event_type").applyInPandas(finish, OUTPUT_SCHEMA)


def run_cusum_available_now(
    spark: SparkSession,
    events_dir: str,
    mu_by_type: dict[str, float] | DataFrame,
    glob: str = "events.parquet",
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    from . import drain_available_now

    return drain_available_now(
        cusum_stream(spark, events_dir, mu_by_type, glob, max_files_per_trigger),
        "cusum",
        "update",
        finish=lambda table, ckpt: table.dropDuplicates(
            ["event_type", "d"]
        ).unionByName(_tail_rows(spark, ckpt, mu_by_type)),
    )
