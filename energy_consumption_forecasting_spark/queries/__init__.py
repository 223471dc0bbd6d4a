"""Central query registry.

Every operator from SURVEY.md §2 registers here as a named query
(callable ``(spark, sf_dir) -> DataFrame``) plus, when SQL-expressible,
a DuckDB oracle SQL string computing the identical result on the same
parquet tables.  ``__spark_entry__.py`` exposes the registry to the
driver's correctness gate.

Conventions that keep the order-insensitive value-hash comparison stable
across engines:

* Alias every computed column identically in Spark and SQL.
* Round every floating aggregate (``round(x, N)`` both sides) — partial
  sums of doubles are order-dependent at the last ulp.
* Never emit raw TIMESTAMP columns (tz-awareness differs); cast to DATE
  or format to string.
* Cast integer sums explicitly (DuckDB ``sum(INTEGER)`` is HUGEINT,
  Spark is LONG).
* NEVER cast an integer that can exceed 2^53 to DOUBLE for comparison —
  DuckDB's HUGEINT→DOUBLE and Java's BigDecimal→double round such
  values differently at the 17th digit (measured on the HHI numerator).
  Emit exact integer fixed-point instead: ``(scale * num) div den``
  (basis points, ppm) — integer division TRUNCATING TOWARD ZERO on
  both engines.  Caution: Python's ``//`` FLOORS (differs on negative
  operands) — a pandas-side mirror of a signed fixed-point metric must
  use ``int(num / den)``-style truncation, not ``//``.
* NEVER cast a FLOAT column straight to DECIMAL: Spark routes
  float→decimal through the float's SHORTEST string representation
  (≈9 sig digits) while DuckDB converts the exact binary value, so
  the two can round to different grid cells (measured ±1 ulp at q6 on
  emb_dim_stats).  Widen to DOUBLE first on BOTH sides — the double's
  17-digit round-trip repr cannot straddle a decimal grid a float sits
  near, so double→decimal is engine-identical (and tie-free: no binary
  float lands exactly on a half-grid with a 5^k denominator).
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Optional

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, QueryFn] = {}
ORACLES: dict[str, str] = {}

_LOADED = False


def query(name: str, oracle: Optional[str] = None) -> Callable[[QueryFn], QueryFn]:
    """Register a named query, optionally with its DuckDB oracle SQL."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in QUERIES:
            raise ValueError(f"duplicate query name {name!r}")
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco


def load_all() -> tuple[dict[str, QueryFn], dict[str, str]]:
    """Import every query module (side effect: registry population)."""
    global _LOADED
    if not _LOADED:
        from . import (  # noqa: F401
            aggregates,
            basket,
            behavior,
            components,
            dedup,
            eval_gates,
            extensions,
            geo,
            joins,
            layout,
            lm,
            ml_queries,
            more_relational,
            ols,
            pipeline_ops,
            pipelines_gate,
            quality,
            relational,
            reshape,
            rollup_gate,
            scale_ops,
            similarity,
            sinks_gate,
            smoothing,
            sources_gate,
            text,
            timeseries,
            tpcds_shapes,
            tpch_more,
            windows,
        )

        _LOADED = True
    return QUERIES, ORACLES
