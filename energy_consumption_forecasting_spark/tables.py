"""Testdata table access.

``load_table(spark, sf_dir, name)`` is the single scan entry point for the
star-schema testdata; reading Parquet directly keeps Catalyst's column
pruning and predicate pushdown intact (check ``PushedFilters`` in
``df.explain``).

Timestamp contract (the round-2 lesson): the driver regenerates the
testdata between rounds and the physical type of ``events.ts`` has
changed once already (parquet TIMESTAMP(NANOS) in round 1, plain
``timestamp[us]`` since round 2).  Nothing downstream may assume a
physical type — ``load_events`` probes the parquet footer with pyarrow
(one driver-side footer read, no scan) and adapts:

* ``timestamp[ns]`` (no tz) — Spark's vectorized reader rejects
  TIMESTAMP(NANOS); enable ``nanosAsLong``, read the raw int64, rebuild
  a micros timestamp with exact integer arithmetic (no double
  round-trip — 1e18 ns overflows a 53-bit mantissa).
* ``timestamp[us|ms|s]`` without tz — Spark infers TIMESTAMP_NTZ; cast
  to TIMESTAMP (sessions run with ``spark.sql.session.timeZone=UTC``,
  so the wall clock is preserved and downstream date arithmetic is
  unchanged).
* ``timestamp`` with tz — already TIMESTAMP; pass through.
* plain ``int64`` — the historical contract was epoch nanos; rebuild.

Engine-facing invariant (pinned by tests/test_testdata_contract.py):
``load_table(...).schema["ts"]`` is always TimestampType regardless of
what the files hold.
"""

from __future__ import annotations

import glob as _glob
import os

from pyspark.sql import DataFrame, SparkSession

TABLE_NAMES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def probe_arrow_schema(path: str):
    """Arrow schema of a parquet file or directory-of-part-files.

    Footer-only read on the driver — O(KB), no data scan.  For a
    directory, the first part file is taken as representative (Spark's
    own schema inference does the same unless mergeSchema is set).
    """
    import pyarrow.parquet as pq

    if os.path.isdir(path):
        parts = sorted(_glob.glob(os.path.join(path, "*.parquet"))) or sorted(
            _glob.glob(os.path.join(path, "part-*"))
        )
        if not parts:
            raise FileNotFoundError(f"no parquet part files under {path}")
        return pq.read_schema(parts[0])
    return pq.read_schema(path)


def _ts_kind(arrow_type) -> str:
    """Classify an arrow type for timestamp normalization.

    Returns one of ``nanos`` (TIMESTAMP(NANOS), needs the long-read
    workaround), ``ntz`` (micro/milli/second timestamp without tz),
    ``tz`` (instant-semantics timestamp), ``long`` (raw int64 —
    historical epoch-nanos contract), ``other``.
    """
    import pyarrow as pa

    if pa.types.is_timestamp(arrow_type):
        if arrow_type.unit == "ns" and arrow_type.tz is None:
            return "nanos"
        return "tz" if arrow_type.tz is not None else "ntz"
    if pa.types.is_int64(arrow_type):
        return "long"
    return "other"


def _footer_spark_schema(path: str, ts_as_long: bool = False):
    """Spark read schema derived DRIVER-SIDE from the parquet footer —
    supplying it to ``spark.read.schema(...)`` removes the
    schema-inference Spark job that ``spark.read.parquet`` otherwise
    launches per call (round-6 rule: constructing a query runs zero
    jobs).  ``prefer_timestamp_ntz=True`` mirrors Spark 4's parquet
    inference (``spark.sql.parquet.inferTimestampNTZ``), pinned equal
    to the engine's own inference for every testdata table by
    tests/test_testdata_contract.py.  Returns None when the footer
    types don't convert (future physical-type drift) — callers then
    fall back to plain inference, trading one job for resilience."""
    from pyspark.sql import types as T
    from pyspark.sql.pandas.types import from_arrow_schema

    try:
        schema = from_arrow_schema(
            probe_arrow_schema(path), prefer_timestamp_ntz=True
        )
    except Exception:
        return None
    if ts_as_long:
        schema = T.StructType(
            [
                T.StructField("ts", T.LongType(), f.nullable)
                if f.name == "ts"
                else f
                for f in schema.fields
            ]
        )
    return schema


def _read_parquet(spark: SparkSession, path: str, schema=None) -> DataFrame:
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    return reader.parquet(path)


def load_events(spark: SparkSession, path: str) -> DataFrame:
    """Type-adaptive events scan — see module docstring for the contract."""
    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    kind = _ts_kind(probe_arrow_schema(path).field("ts").type)
    if kind == "nanos":
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = _read_parquet(spark, path, _footer_spark_schema(path, ts_as_long=True))
        return df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    df = _read_parquet(spark, path, _footer_spark_schema(path))
    dt = df.schema["ts"].dataType
    if isinstance(dt, T.TimestampNTZType):
        return df.withColumn("ts", F.col("ts").cast("timestamp"))
    if isinstance(dt, T.LongType):
        return df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return df


def _size_bytes(conf_val: str) -> int:
    """Parse a Spark size conf ('128m', '4194304b', '134217728')."""
    s = str(conf_val).strip().lower()
    units = {"b": 1, "k": 1 << 10, "m": 1 << 20, "g": 1 << 30}
    if s and s[-1] in units:
        return int(float(s[:-1]) * units[s[-1]])
    return int(s)


_SCAN_PARTS_CACHE: dict = {}


def est_scan_partitions(spark: SparkSession, path: str) -> int | None:
    """Driver-side estimate of the scan parallelism a parquet path
    yields — Spark's own split algorithm (FilePartition.getFilePartitions
    / FilePartition.maxSplitBytes, public source) re-run over os.stat
    sizes, so the gate in ``queries._util.fanout`` costs ZERO py4j
    round-trips per call (a ``df.rdd.getNumPartitions()`` probe measured
    ~105 ms/call — 35 gated sites × 3 bench reps would be ~10 s of pure
    probe tax).  Calibrated against the real RDD partition count on the
    testdata tables and multi-file fixtures (tests/test_plan_contracts).
    Returns None for non-local paths (caller then skips the gate and
    repartitions, the historical behavior)."""
    p = path[7:] if path.startswith("file://") else path
    try:
        if os.path.isdir(p):
            names = set(_glob.glob(os.path.join(p, "*.parquet"))) | set(
                _glob.glob(os.path.join(p, "part-*"))
            )
            files = [os.path.getsize(f) for f in names]
        else:
            files = [os.path.getsize(p)]
    except OSError:
        return None
    if not files:
        return None
    max_part = _size_bytes(
        spark.conf.get("spark.sql.files.maxPartitionBytes", "128m")
    )
    open_cost = _size_bytes(
        spark.conf.get("spark.sql.files.openCostInBytes", "4m")
    )
    min_parts = spark.sparkContext.defaultParallelism
    key = (
        spark.sparkContext.applicationId,
        p,
        tuple(sorted(files)),
        max_part,
        open_cost,
        min_parts,
    )
    hit = _SCAN_PARTS_CACHE.get(key)
    if hit is not None:
        return hit
    total = sum(files) + open_cost * len(files)
    bytes_per_core = total // max(min_parts, 1)
    max_split = min(max_part, max(open_cost, bytes_per_core))
    # per-file byte-range splits, then the greedy descending pack
    splits: list[int] = []
    for size in files:
        off = 0
        while off < size:
            splits.append(min(max_split, size - off))
            off += max_split
    splits.sort(reverse=True)
    n, cur = 0, 0
    for s in splits:
        if cur and cur + s > max_split:
            n, cur = n + 1, 0
        cur += s + open_cost
    if cur:
        n += 1
    if len(_SCAN_PARTS_CACHE) > 256:
        _SCAN_PARTS_CACHE.clear()
    _SCAN_PARTS_CACHE[key] = n
    return n


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name not in TABLE_NAMES:
        raise KeyError(f"unknown table {name!r}; expected one of {TABLE_NAMES}")
    path = f"{sf_dir.rstrip('/')}/{name}.parquet"
    if name == "events":
        df = load_events(spark, path)
    else:
        df = _read_parquet(spark, path, _footer_spark_schema(path))
    # scan-parallelism tag for queries._util.fanout's splittability gate
    # (narrow ops drop python attributes, so fanout must wrap THIS frame)
    df._sg_scan_parts = est_scan_partitions(spark, path)
    return df


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every testdata table as a temp view (for spark.sql use)."""
    for name in TABLE_NAMES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
