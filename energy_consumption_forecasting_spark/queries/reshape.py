"""Reshaping — SURVEY.md §2.5 W4 (melt/unpivot), W5 (transpose).

Melt is Spark's native ``unpivot``; transpose is not relational, so it is
expressed as melt + deterministic pivot (SURVEY §4.2.4) — correct on an
unordered engine and shuffle-bounded by the (small, fixed) column set.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from . import query
from ._util import tbl


# --- W4: melt / unpivot (ETL.py:209) -----------------------------------------
@query(
    "w4_melt",
    oracle="""
    SELECT p_partkey, k AS measure, v AS val
    FROM (
      SELECT p_partkey,
             CAST(p_size AS DOUBLE) AS size,
             p_retailprice AS retailprice
      FROM part
    )
    UNPIVOT (v FOR k IN (size, retailprice))
    """,
)
def w4_melt(spark: SparkSession, sf_dir: str) -> DataFrame:
    """31-day-columns→long in the reference (ETL.py:209); here the same
    unpivot shape over part measures.  ``unpivot`` is a zero-shuffle
    row-local expansion."""
    wide = tbl(spark, sf_dir, "part").select(
        "p_partkey",
        F.col("p_size").cast("double").alias("size"),
        F.col("p_retailprice").alias("retailprice"),
    )
    return wide.unpivot(
        ["p_partkey"], ["size", "retailprice"], "measure", "val"
    )


# --- W5: transpose as melt + deterministic pivot (N:129-131) -------------------
@query(
    "w5_transpose",
    oracle="""
    WITH agg AS (
      SELECT c_mktsegment,
             CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_bal,
             CAST(COUNT(*) AS DOUBLE) AS n_cust
      FROM customer GROUP BY 1
    ),
    long AS (
      SELECT c_mktsegment, k AS metric, v
      FROM agg UNPIVOT (v FOR k IN (avg_bal, n_cust))
    )
    SELECT metric,
           MIN(CASE WHEN c_mktsegment = 'AUTOMOBILE' THEN v END) AS AUTOMOBILE,
           MIN(CASE WHEN c_mktsegment = 'BUILDING'   THEN v END) AS BUILDING,
           MIN(CASE WHEN c_mktsegment = 'FURNITURE'  THEN v END) AS FURNITURE,
           MIN(CASE WHEN c_mktsegment = 'HOUSEHOLD'  THEN v END) AS HOUSEHOLD,
           MIN(CASE WHEN c_mktsegment = 'MACHINERY'  THEN v END) AS MACHINERY
    FROM long
    GROUP BY metric
    """,
)
def w5_transpose(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rows↔columns flip of a small summary table (the reference
    transposes the fuel-consumption frame, N:129-131): melt to long,
    pivot back with an explicit value list."""
    segments = ["AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD", "MACHINERY"]
    agg = (
        tbl(spark, sf_dir, "customer")
        .groupBy("c_mktsegment")
        .agg(
            (
                F.sum(F.col("c_acctbal").cast("decimal(18,2)")).cast("double")
                / F.count("*")
            ).alias("avg_bal"),
            F.count("*").cast("double").alias("n_cust"),
        )
    )
    long = agg.unpivot(["c_mktsegment"], ["avg_bal", "n_cust"], "metric", "v")
    return (
        long.groupBy("metric")
        .pivot("c_mktsegment", segments)
        .agg(F.min("v"))
    )


# --- W5 (native): Spark 4 df.transpose ----------------------------------------------
@query(
    "w5_transpose_native",
    oracle="""
    WITH agg AS (
      SELECT c_mktsegment,
             CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_bal,
             CAST(COUNT(*) AS DOUBLE) AS n_cust
      FROM customer GROUP BY 1
    ),
    long AS (
      SELECT c_mktsegment, k AS key, v
      FROM agg UNPIVOT (v FOR k IN (avg_bal, n_cust))
    )
    SELECT key,
           MIN(CASE WHEN c_mktsegment = 'AUTOMOBILE' THEN v END) AS AUTOMOBILE,
           MIN(CASE WHEN c_mktsegment = 'BUILDING'   THEN v END) AS BUILDING,
           MIN(CASE WHEN c_mktsegment = 'FURNITURE'  THEN v END) AS FURNITURE,
           MIN(CASE WHEN c_mktsegment = 'HOUSEHOLD'  THEN v END) AS HOUSEHOLD,
           MIN(CASE WHEN c_mktsegment = 'MACHINERY'  THEN v END) AS MACHINERY
    FROM long
    GROUP BY key
    """,
)
def w5_transpose_native(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W5 through Spark 4's NATIVE ``DataFrame.transpose`` — the engine
    collapses the frame to the driver (transpose is inherently
    driver-sized: it's only legal on aggregate-sized frames, exactly
    like this 5×2 stat table), flips it, and emits column-per-index
    rows.  The melt+pivot form (w5_transpose) remains the distributed
    path for anything bigger than a stat table."""
    agg = (
        tbl(spark, sf_dir, "customer")
        .groupBy("c_mktsegment")
        .agg(
            (
                F.sum(F.col("c_acctbal").cast("decimal(18,2)")).cast("double")
                / F.count("*")
            ).alias("avg_bal"),
            F.count("*").cast("double").alias("n_cust"),
        )
    )
    return agg.transpose(F.col("c_mktsegment"))
