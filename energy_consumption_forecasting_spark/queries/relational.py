"""Projections, filters, predicates — SURVEY.md §2.2 (F1-F11).

All plain Catalyst expressions: filters and projections reach the
parquet scan (PushedFilters / ReadSchema), so at 100 TB only the
referenced columns and matching row groups are read.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from . import query
from ._util import tbl


# --- F1: column projection / reorder (ETL.py:72,293,301,306-308) -----------
@query(
    "f1_projection",
    oracle="""
    SELECT l_orderkey, l_linenumber, l_quantity, l_returnflag
    FROM lineitem
    """,
)
def f1_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    return tbl(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_linenumber", "l_quantity", "l_returnflag"
    )


# --- F2: name-based column pruning (ETL.py:71,186-195) ---------------------
@query(
    "f2_name_prune",
    oracle="""
    SELECT l_orderkey, l_partkey, l_suppkey, l_linenumber
    FROM lineitem
    """,
)
def f2_name_prune(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keep key-like columns, drop measure/flag columns by name rule.

    Mirrors the reference's keep-"Adjusted"/drop-"FLAG" driver-side name
    logic (ETL.py:71,186-195): the decision runs on ``df.columns`` (cheap,
    driver-side), the data path stays a pure projection.
    """
    df = tbl(spark, sf_dir, "lineitem")
    keep = [c for c in df.columns if ("key" in c or "number" in c) and "flag" not in c]
    return df.select(*keep)


# --- F3: conjunctive equality filter (ETL.py:73) ----------------------------
@query(
    "f3_conjunctive_filter",
    oracle="""
    SELECT o_orderkey, o_custkey, o_totalprice
    FROM orders
    WHERE o_orderstatus = 'O' AND o_orderpriority = '1-URGENT'
    """,
)
def f3_conjunctive_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        tbl(spark, sf_dir, "orders")
        .filter((F.col("o_orderstatus") == "O") & (F.col("o_orderpriority") == "1-URGENT"))
        .select("o_orderkey", "o_custkey", "o_totalprice")
    )


# --- F4: IN-list filter (ETL.py:174,250-269,300) ----------------------------
@query(
    "f4_in_list",
    oracle="""
    SELECT l_orderkey, l_linenumber, l_returnflag
    FROM lineitem
    WHERE l_returnflag IN ('A', 'R')
    """,
)
def f4_in_list(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        tbl(spark, sf_dir, "lineitem")
        .filter(F.col("l_returnflag").isin("A", "R"))
        .select("l_orderkey", "l_linenumber", "l_returnflag")
    )


# --- F5: range predicate (ETL.py:197-201; bounding box P:1105-1110) ---------
@query(
    "f5_range_filter",
    oracle="""
    SELECT p_partkey, p_name, p_size, p_retailprice
    FROM part
    WHERE p_size BETWEEN 10 AND 30
      AND p_retailprice BETWEEN 500.0 AND 1500.0
    """,
)
def f5_range_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        tbl(spark, sf_dir, "part")
        .filter(
            F.col("p_size").between(10, 30)
            & F.col("p_retailprice").between(500.0, 1500.0)
        )
        .select("p_partkey", "p_name", "p_size", "p_retailprice")
    )


# --- F6: string-contains filter (ETL.py:158) --------------------------------
@query(
    "f6_contains_filter",
    oracle="""
    SELECT p_partkey, p_name
    FROM part
    WHERE contains(p_name, 'red')
    """,
)
def f6_contains_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        tbl(spark, sf_dir, "part")
        .filter(F.col("p_name").contains("red"))
        .select("p_partkey", "p_name")
    )


# --- F7: date threshold filter (normalization.ipynb:138,199) -----------------
@query(
    "f7_date_threshold",
    oracle="""
    SELECT o_orderkey, CAST(o_orderdate AS DATE) AS order_date, o_totalprice
    FROM orders
    WHERE o_orderdate >= TIMESTAMP '1998-01-01 00:00:00'
    """,
)
def f7_date_threshold(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        tbl(spark, sf_dir, "orders")
        .filter(F.col("o_orderdate") >= F.lit("1998-01-01 00:00:00").cast("timestamp"))
        .select(
            "o_orderkey",
            F.to_date("o_orderdate").alias("order_date"),
            "o_totalprice",
        )
    )


# --- F9: quantile filter (evaluation.ipynb:17389-17390) ----------------------
@query(
    "f9_quantile_filter",
    oracle="""
    SELECT c_custkey, c_acctbal
    FROM customer
    WHERE c_acctbal <= (SELECT quantile_cont(c_acctbal, 0.3) FROM customer)
    """,
)
def f9_quantile_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keep rows at or below the exact 0.3 quantile.

    Exact interpolated percentile (matches DuckDB ``quantile_cont``); the
    threshold is a one-row aggregate broadcast into the filter — no
    driver collect, scale-safe.  At 100 TB swap ``percentile`` for
    ``percentile_approx`` and accept the epsilon.
    """
    cust = tbl(spark, sf_dir, "customer")
    thr = cust.agg(F.expr("percentile(c_acctbal, 0.3)").alias("thr"))
    return (
        cust.crossJoin(F.broadcast(thr))
        .filter(F.col("c_acctbal") <= F.col("thr"))
        .select("c_custkey", "c_acctbal")
    )


# --- F10: null-threshold column drop (ETL.py:80,91; xgb.ipynb:512-513) -------
# The events table has no nulls, so the query injects them first (value
# masked on 'error' rows; a synthetic always-null column) and then drops
# columns whose non-null fraction is below 50 %.  The keep/drop decision
# is computed from data statistics driver-side — exactly the reference's
# dropna(axis=1, thresh=...) semantics.
@query(
    "f10_null_col_drop",
    oracle="""
    SELECT event_id,
           CASE WHEN event_type = 'error' THEN NULL ELSE value END AS masked_value
    FROM events
    """,
)
def f10_null_col_drop(spark: SparkSession, sf_dir: str) -> DataFrame:
    df = tbl(spark, sf_dir, "events").select(
        "event_id",
        F.when(F.col("event_type") == "error", None)
        .otherwise(F.col("value"))
        .alias("masked_value"),
        F.lit(None).cast("double").alias("all_null"),
    )
    total = df.count()
    counts = df.agg(
        *[F.count(c).alias(c) for c in df.columns if c != "event_id"]
    ).first()
    keep = ["event_id"] + [
        c for c in df.columns if c != "event_id" and counts[c] / total >= 0.5
    ]
    return df.select(*keep)


# --- F11: null-threshold row drop (ETL.py:92,223-224) ------------------------
@query(
    "f11_null_row_drop",
    oracle="""
    WITH masked AS (
      SELECT event_id,
             CASE WHEN event_type = 'error' THEN NULL ELSE value END AS v1,
             CASE WHEN user_id % 3 = 0 THEN NULL ELSE value * 2 END AS v2,
             CASE WHEN user_id % 5 = 0 THEN NULL ELSE value + 1 END AS v3
      FROM events
    )
    SELECT * FROM masked
    WHERE (CASE WHEN v1 IS NULL THEN 0 ELSE 1 END
         + CASE WHEN v2 IS NULL THEN 0 ELSE 1 END
         + CASE WHEN v3 IS NULL THEN 0 ELSE 1 END) >= 2
    """,
)
def f11_null_row_drop(spark: SparkSession, sf_dir: str) -> DataFrame:
    df = tbl(spark, sf_dir, "events").select(
        "event_id",
        F.when(F.col("event_type") == "error", None).otherwise(F.col("value")).alias("v1"),
        F.when(F.col("user_id") % 3 == 0, None).otherwise(F.col("value") * 2).alias("v2"),
        F.when(F.col("user_id") % 5 == 0, None).otherwise(F.col("value") + 1).alias("v3"),
    )
    return df.na.drop(thresh=2, subset=["v1", "v2", "v3"])
