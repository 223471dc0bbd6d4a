"""transformWithStateInPandas == legacy applyInPandasWithState == batch
on a static drain (the migration-equivalence contract).

The new-API half is import-gated: transformWithState's worker protocol
speaks protobuf and ``google.protobuf`` is not in this container (same
class of gate as torch / statsmodels / pywt) — on an environment that
has it, the full three-way equivalence runs."""

from __future__ import annotations

import importlib.util
import tempfile
import uuid

import pytest
from pyspark.sql import functions as F

from tests.conftest import SF_SMALL

try:
    _HAS_PROTOBUF = importlib.util.find_spec("google.protobuf") is not None
except ModuleNotFoundError:  # no 'google' namespace package at all
    _HAS_PROTOBUF = False


def _drain(df, mode="update"):
    sink = f"tws_{uuid.uuid4().hex[:8]}"
    q = (
        df.writeStream.format("memory")
        .queryName(sink)
        .outputMode(mode)
        .option("checkpointLocation", tempfile.mkdtemp(prefix="ecf_tws_"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return df.sparkSession.table(sink)


@pytest.mark.skipif(
    not _HAS_PROTOBUF,
    reason="transformWithState worker protocol needs google.protobuf "
    "(absent in this container); legacy-vs-batch runs below either way",
)
def test_transform_with_state_matches_legacy_and_batch(spark):
    from energy_consumption_forecasting_spark.session import ensure_utc
    from energy_consumption_forecasting_spark.streaming.source import (
        events_stream,
    )
    from energy_consumption_forecasting_spark.streaming.stateful import (
        user_running_stats,
    )
    from energy_consumption_forecasting_spark.streaming.stateful_v2 import (
        user_running_stats_v2,
    )
    from energy_consumption_forecasting_spark.tables import load_table

    ensure_utc(spark)

    new_api = {
        r["user_id"]: (r["n_events"], r["total_value"])
        for r in _drain(
            user_running_stats_v2(events_stream(spark, SF_SMALL))
        ).collect()
    }
    legacy = {
        r["user_id"]: (r["n_events"], r["total_value"])
        for r in _drain(
            user_running_stats(events_stream(spark, SF_SMALL))
        ).collect()
    }
    batch = {
        r["user_id"]: (r["n"], r["tot"])
        for r in load_table(spark, SF_SMALL, "events")
        .groupBy("user_id")
        .agg(
            F.count("*").alias("n"),
            F.sum(F.col("value").cast("decimal(18,2)"))
            .cast("double")
            .alias("tot"),
        )
        .collect()
    }
    assert new_api == batch
    assert legacy == batch
    assert len(new_api) > 0


def test_legacy_stateful_matches_batch(spark):
    """The half that runs everywhere: legacy applyInPandasWithState ==
    batch groupBy (kept green so the v2 migration has a fixed target)."""
    from energy_consumption_forecasting_spark.session import ensure_utc
    from energy_consumption_forecasting_spark.streaming.source import (
        events_stream,
    )
    from energy_consumption_forecasting_spark.streaming.stateful import (
        user_running_stats,
    )
    from energy_consumption_forecasting_spark.tables import load_table

    ensure_utc(spark)
    legacy = {
        r["user_id"]: (r["n_events"], r["total_value"])
        for r in _drain(
            user_running_stats(events_stream(spark, SF_SMALL))
        ).collect()
    }
    batch = {
        r["user_id"]: (r["n"], r["tot"])
        for r in load_table(spark, SF_SMALL, "events")
        .groupBy("user_id")
        .agg(
            F.count("*").alias("n"),
            F.sum(F.col("value").cast("decimal(18,2)"))
            .cast("double")
            .alias("tot"),
        )
        .collect()
    }
    assert legacy == batch and len(legacy) > 0
