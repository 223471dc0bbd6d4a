"""Gate queries for the continuous-aggregate rollup
(operators/rollup.py): coarse grains answered from the materialized
daily state must equal direct aggregation of the facts — the exactness
property that makes the pattern usable, proven against an oracle that
scans the facts directly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from . import query
from ..operators.rollup import materialize_daily, reaggregate


@query(
    "rollup_monthly_from_daily",
    oracle="""
    SELECT CAST(date_trunc('month', l_shipdate) AS DATE) AS period,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS total_qty,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
             AS total_price,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
             / COUNT(*) AS avg_price
    FROM lineitem
    GROUP BY 1
    """,
)
def rollup_monthly_from_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Monthly grain served from the materialized daily rollup — the
    oracle aggregates the raw facts directly, so a pass proves
    sum-of-sums exactness through the parquet materialization."""
    daily = materialize_daily(spark, sf_dir)
    return reaggregate(daily, "month")


@query(
    "rollup_yearly_pruned",
    oracle="""
    SELECT CAST(year(l_shipdate) AS INT) AS period,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS total_qty,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
             AS total_price,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
             / COUNT(*) AS avg_price
    FROM lineitem
    WHERE year(l_shipdate) IN (1997, 1998)
    GROUP BY 1
    """,
)
def rollup_yearly_pruned(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Yearly grain for two years, answered from the year-partitioned
    daily store: the ``y IN (1997,1998)`` predicate is partition
    pruning — only those year directories are listed, the rest of the
    store is never opened (tests/test_pipeline_ops.py asserts the
    pruned scan at the operator level)."""
    daily = materialize_daily(spark, sf_dir).filter(F.col("y").isin(1997, 1998))
    return reaggregate(daily, "year")
