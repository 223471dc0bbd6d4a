"""Probe-derived streaming sources (the round-2 testdata-drift fix).

``readStream`` needs a declared schema, and round 2 proved that
hardcoding one is how a round dies: the driver regenerated the testdata
and every streaming reader's ``ts: LongType  # nanos`` silently re-read
micros as nanos, collapsing all event time to 1970-01-01.  Worse than a
crash — the queries ran and were wrong.

This module derives the stream schema from what the files actually
contain: one pyarrow footer read of the source directory (driver-side,
no scan), mapped to Spark types, with the same timestamp normalization
matrix as ``tables.load_events``:

* parquet TIMESTAMP(NANOS) → declare LongType, enable ``nanosAsLong``,
  rebuild micros timestamps with integer arithmetic;
* timestamp without tz → declare TimestampType directly (session tz is
  UTC, so the wall clock is identical to the batch NTZ→TIMESTAMP cast);
* timestamp with tz → TimestampType, pass through;
* raw int64 named ``ts`` → historical epoch-nanos contract, rebuild.

Every reader in this package goes through ``events_stream`` /
``docs_stream``; none declares a schema of its own.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..tables import _ts_kind, probe_arrow_schema


def _spark_type(at) -> T.DataType:
    """Arrow type → Spark type for stream-schema declaration."""
    import pyarrow as pa

    if pa.types.is_int64(at):
        return T.LongType()
    if pa.types.is_int32(at) or pa.types.is_int16(at) or pa.types.is_int8(at):
        return T.IntegerType()
    if pa.types.is_float64(at):
        return T.DoubleType()
    if pa.types.is_float32(at):
        return T.FloatType()
    if pa.types.is_string(at) or pa.types.is_large_string(at):
        return T.StringType()
    if pa.types.is_boolean(at):
        return T.BooleanType()
    if pa.types.is_binary(at) or pa.types.is_large_binary(at):
        return T.BinaryType()
    if pa.types.is_date(at):
        return T.DateType()
    if pa.types.is_timestamp(at):
        return T.TimestampType()  # ns handled by the caller
    if pa.types.is_list(at) or pa.types.is_large_list(at):
        return T.ArrayType(_spark_type(at.value_type))
    if pa.types.is_struct(at):
        return T.StructType(
            [T.StructField(f.name, _spark_type(f.type)) for f in at]
        )
    raise TypeError(f"no Spark mapping for arrow type {at}")


def probed_stream_schema(path: str):
    """(StructType, {col: ts_kind}) for a parquet source file/directory.

    ``ts_kind`` (see ``tables._ts_kind``) is recorded for every
    timestamp-bearing column so the reader can normalize after read.
    """
    arrow = probe_arrow_schema(path)
    fields, kinds = [], {}
    for f in arrow:
        kind = _ts_kind(f.type)
        if kind == "nanos" or (kind == "long" and f.name == "ts"):
            kinds[f.name] = kind
            fields.append(T.StructField(f.name, T.LongType()))
            continue
        if kind in ("ntz", "tz"):
            kinds[f.name] = kind
        fields.append(T.StructField(f.name, _spark_type(f.type)))
    return T.StructType(fields), kinds


def _normalize(df: DataFrame, kinds: dict) -> DataFrame:
    for col, kind in kinds.items():
        if kind in ("nanos", "long"):
            df = df.withColumn(
                col, F.timestamp_micros(F.expr(f"{col} div 1000"))
            )
        # ntz/tz: declared TimestampType at read — already normalized.
    return df


def _probe_path(source_dir: str, glob: str) -> str:
    cand = os.path.join(source_dir, glob)
    if os.path.exists(cand):
        return cand
    return source_dir  # glob with wildcards: probe the directory itself


def stream_source(
    spark: SparkSession, source_dir: str, glob: str, **options: str
) -> DataFrame:
    """Schema-probed parquet file stream with normalized timestamps.

    Extra reader options (e.g. ``maxFilesPerTrigger``) pass through."""
    schema, kinds = probed_stream_schema(_probe_path(source_dir, glob))
    if any(k == "nanos" for k in kinds.values()):
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    reader = spark.readStream.schema(schema).option("pathGlobFilter", glob)
    for k, v in options.items():
        if v is not None:
            reader = reader.option(k, str(v))
    return _normalize(reader.parquet(source_dir), kinds)


def events_stream(
    spark: SparkSession,
    events_dir: str,
    glob: str = "events.parquet",
    **options: str,
) -> DataFrame:
    """Streaming events with ``ts: TimestampType`` whatever the files hold."""
    return stream_source(spark, events_dir, glob, **options)


def docs_stream(
    spark: SparkSession,
    docs_dir: str,
    glob: str = "documents.parquet",
    **options: str,
) -> DataFrame:
    """Streaming documents; synthesizes ``ts`` if the table has none.

    The current testdata's documents table carries no event-time column;
    stateful operators (watermarked dedup) still need one.  For the
    static-drain gate a deterministic monotone surrogate — doc_id
    seconds after 2020-01-01 — is sufficient and reproducible; a real
    ingest pipeline would use its arrival time here instead.  (Offset
    from epoch 0 matters: a row AT the initial watermark value of
    1970-01-01T00:00:00 is dropped as late.)
    """
    df = stream_source(spark, docs_dir, glob, **options)
    if "ts" not in df.columns:
        base_us = 1_577_836_800_000_000  # 2020-01-01T00:00:00Z
        df = df.withColumn(
            "ts",
            F.timestamp_micros(
                F.col("doc_id") * F.lit(1_000_000) + F.lit(base_us)
            ),
        )
    return df
