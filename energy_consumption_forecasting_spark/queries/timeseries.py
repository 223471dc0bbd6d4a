"""Time-series dataflow queries — SURVEY.md §2.5 W12/W18, §2.3 J3/J4,
§2.7 M7 (window-native seasonal decomposition).

These are the EP2 flagship shapes: monthly↔daily disaggregation with two
calendar windows, and the as-of forward-fill join.  All keys are calendar
values (months/days), so group cardinality is bounded and the same plan
holds at 100 TB: the monthly side is always broadcast-small.

Numeric determinism: the daily/monthly series are DECIMAL (exact sums);
every float value exposed downstream is a single deterministic op on
those exact sums, so Spark and the DuckDB oracle emit identical doubles.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from . import query
from ._util import tbl

_DAILY_SQL = """
      SELECT CAST(o_orderdate AS DATE) AS d,
             CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DECIMAL(18,2)) AS demand
      FROM orders GROUP BY 1
"""

_MONTHLY_TARGET_SQL = """
      SELECT CAST(date_trunc('month', l_shipdate) AS DATE) AS month,
             CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DECIMAL(18,2)) AS month_qty
      FROM lineitem GROUP BY 1
"""


def _daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        tbl(spark, sf_dir, "orders")
        .groupBy(F.to_date("o_orderdate").alias("d"))
        .agg(
            F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
            .cast("decimal(18,2)")
            .alias("demand")
        )
    )


def _monthly_target(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        tbl(spark, sf_dir, "lineitem")
        .groupBy(F.trunc(F.to_date("l_shipdate"), "MM").alias("month"))
        .agg(
            F.sum(F.col("l_quantity").cast("decimal(18,2)"))
            .cast("decimal(18,2)")
            .alias("month_qty")
        )
    )


# --- W18: monthly→daily proportional disaggregation (N:450-452,631-635) --------
@query(
    "w18_disaggregation",
    oracle=f"""
    WITH daily AS ({_DAILY_SQL}),
    shares AS (
      SELECT d, demand,
             CAST(date_trunc('month', d) AS DATE) AS month,
             SUM(demand) OVER (PARTITION BY date_trunc('month', d)) AS month_demand
      FROM daily
    ),
    monthly AS ({_MONTHLY_TARGET_SQL})
    SELECT s.d AS d,
           CAST(s.demand AS DOUBLE) / CAST(s.month_demand AS DOUBLE) AS day_share,
           CAST(m.month_qty AS DOUBLE)
             * (CAST(s.demand AS DOUBLE) / CAST(s.month_demand AS DOUBLE))
             AS daily_consumption
    FROM shares s JOIN monthly m USING (month)
    """,
)
def w18_disaggregation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flagship query #2 (EP2): each day's share of its month's demand,
    multiplied onto the month-level consumption target — the reference's
    right-join + ffill + ratio dance (N:450-452,631-635) collapses to one
    month window plus one equi join on the month key.

    Scale: the window partitions by calendar month (bounded cardinality);
    the monthly target is tiny and broadcast."""
    daily = _daily(spark, sf_dir)
    shares = daily.select(
        "d",
        "demand",
        F.trunc("d", "MM").alias("month"),
        F.sum("demand").over(Window.partitionBy(F.trunc("d", "MM"))).alias("month_demand"),
    )
    monthly = _monthly_target(spark, sf_dir)
    ratio = F.col("demand").cast("double") / F.col("month_demand").cast("double")
    return shares.join(F.broadcast(monthly), "month").select(
        "d",
        ratio.alias("day_share"),
        (F.col("month_qty").cast("double") * ratio).alias("daily_consumption"),
    )


# --- J3/J4: month-start right join + forward fill (N:450-451,631-633) -----------
@query(
    "j3_asof_ffill_join",
    oracle=f"""
    WITH daily AS ({_DAILY_SQL}),
    monthly AS ({_MONTHLY_TARGET_SQL}),
    joined AS (
      SELECT daily.d AS d, daily.demand,
             monthly.month_qty AS month_qty_at_start
      FROM daily LEFT JOIN monthly ON daily.d = monthly.month
    )
    SELECT d, CAST(demand AS DOUBLE) AS demand,
           CAST(last_value(month_qty_at_start IGNORE NULLS) OVER (
             ORDER BY d ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           ) AS DOUBLE) AS month_qty_ffill
    FROM joined
    """,
)
def j3_asof_ffill_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's literal form: monthly totals land on the
    month-start row of the daily frame, then forward-fill downward
    (N:450-451).  Window = ``last(ignorenulls)`` over date order."""
    daily = _daily(spark, sf_dir)
    monthly = _monthly_target(spark, sf_dir)
    joined = daily.join(
        F.broadcast(monthly), daily.d == monthly.month, "left"
    ).select("d", "demand", F.col("month_qty").alias("month_qty_at_start"))
    w = Window.orderBy("d").rowsBetween(Window.unboundedPreceding, 0)
    return joined.select(
        "d",
        F.col("demand").cast("double").alias("demand"),
        F.last("month_qty_at_start", ignorenulls=True)
        .over(w)
        .cast("double")
        .alias("month_qty_ffill"),
    )


# --- W12: per-month sub-series extraction (ts_kmeans_base.ipynb:1067-1079) --------
@query(
    "w12_month_series",
    oracle=f"""
    WITH daily AS ({_DAILY_SQL})
    SELECT CAST(date_trunc('month', d) AS DATE) AS month,
           array_to_string(list(CAST(demand AS VARCHAR) ORDER BY d), ',') AS series,
           CAST(COUNT(*) AS BIGINT) AS n_days
    FROM daily
    GROUP BY 1
    """,
)
def w12_month_series(spark: SparkSession, sf_dir: str) -> DataFrame:
    """105-months-×-series dict (K:1067-1079) → one array row per month.
    ``array_sort(collect_list(struct(d, v)))`` gives a deterministic
    in-array order without a global sort; values are DECIMAL-rendered so
    both engines print identical strings."""
    daily = _daily(spark, sf_dir)
    return (
        daily.groupBy(F.trunc("d", "MM").alias("month"))
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("d", "demand"))),
                    lambda s: s["demand"].cast("string"),
                ),
                ",",
            ).alias("series"),
            F.count("*").alias("n_days"),
        )
    )


# --- M7 (window-native): additive seasonal decomposition ---------------------------
@query(
    "m7_seasonal_decompose",
    oracle=f"""
    WITH daily AS ({_DAILY_SQL}),
    trended AS (
      SELECT d, CAST(demand AS DOUBLE) AS v, demand,
             CASE WHEN COUNT(*) OVER w31 = 31
                  THEN SUM(demand) OVER w31 END AS trend_sum
      FROM daily
      WINDOW w31 AS (ORDER BY d ROWS BETWEEN 15 PRECEDING AND 15 FOLLOWING)
    ),
    grouped AS (
      SELECT *,
             SUM(CASE WHEN trend_sum IS NOT NULL THEN demand END) OVER wd AS g_demand_sum,
             SUM(trend_sum) OVER wd AS g_trend_sum,
             COUNT(trend_sum) OVER wd AS g_n
      FROM trended
      WINDOW wd AS (PARTITION BY dayofweek(d))
    )
    SELECT d,
           CAST(trend_sum AS DOUBLE) / 31 AS trend,
           (CAST(g_demand_sum AS DOUBLE) - CAST(g_trend_sum AS DOUBLE) / 31) / g_n AS seasonal,
           v - CAST(trend_sum AS DOUBLE) / 31
             - (CAST(g_demand_sum AS DOUBLE) - CAST(g_trend_sum AS DOUBLE) / 31) / g_n
             AS resid
    FROM grouped
    """,
)
def m7_seasonal_decompose(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Additive decomposition in pure window algebra (SURVEY §2.7 M7
    variant (a)): trend = centered 31-row moving average (full windows
    only, mirroring statsmodels' NaN edges), seasonal = mean of detrended
    by weekday, residual = remainder.

    Every mean is (exact decimal sum) / count, so the result is
    bit-identical across engines and partitionings.  The statsmodels-
    parity variant lives in ml/decomposition.py via applyInPandas.
    """
    daily = _daily(spark, sf_dir)
    w31 = Window.orderBy("d").rowsBetween(-15, 15)
    trended = daily.select(
        "d",
        F.col("demand").cast("double").alias("v"),
        "demand",
        F.when(F.count("*").over(w31) == 31, F.sum("demand").over(w31)).alias(
            "trend_sum"
        ),
    )
    # Spark dayofweek: 1=Sunday..7; DuckDB dayofweek: 0=Sunday..6.  Only
    # partition identity matters — both split by calendar weekday.
    wd = Window.partitionBy(F.dayofweek("d"))
    grouped = trended.select(
        "*",
        F.sum(F.when(F.col("trend_sum").isNotNull(), F.col("demand"))).over(wd).alias(
            "g_demand_sum"
        ),
        F.sum("trend_sum").over(wd).alias("g_trend_sum"),
        F.count("trend_sum").over(wd).alias("g_n"),
    )
    trend = F.col("trend_sum").cast("double") / 31
    seasonal = (
        F.col("g_demand_sum").cast("double") - F.col("g_trend_sum").cast("double") / 31
    ) / F.col("g_n")
    return grouped.select(
        "d",
        trend.alias("trend"),
        seasonal.alias("seasonal"),
        (F.col("v") - trend - seasonal).alias("resid"),
    )
