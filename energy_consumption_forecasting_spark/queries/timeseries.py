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
from ._util import shared_plan, tbl

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
_W18_ORACLE = f"""
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
    """


def disagg_from_daily(daily: DataFrame, monthly: DataFrame) -> DataFrame:
    """Shared W18 arithmetic: month window over the per-day demand frame,
    ratio, broadcast join onto the monthly target.  Used verbatim by the
    batch query AND the streaming twin, so the two cannot drift."""
    shares = daily.select(
        "d",
        "demand",
        F.trunc("d", "MM").alias("month"),
        F.sum("demand")
        .over(Window.partitionBy(F.trunc("d", "MM")))
        .alias("month_demand"),
    )
    ratio = F.col("demand").cast("double") / F.col("month_demand").cast("double")
    return shares.join(F.broadcast(monthly), "month").select(
        "d",
        ratio.alias("day_share"),
        (F.col("month_qty").cast("double") * ratio).alias("daily_consumption"),
    )


@query("w18_disaggregation", oracle=_W18_ORACLE)
def w18_disaggregation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flagship query #2 (EP2): each day's share of its month's demand,
    multiplied onto the month-level consumption target — the reference's
    right-join + ffill + ratio dance (N:450-452,631-635) collapses to one
    month window plus one equi join on the month key.

    Scale: the window partitions by calendar month (bounded cardinality);
    the monthly target is tiny and broadcast."""
    daily = _daily(spark, sf_dir)
    return disagg_from_daily(daily, _monthly_target(spark, sf_dir))


@query("stream_w18_disaggregation", oracle=_W18_ORACLE)
def stream_w18_disaggregation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming twin of the flagship: the per-day demand state is
    maintained by a complete-mode streaming aggregation over the orders
    stream (streaming/disagg_stream.py — exact DECIMAL sums, additive,
    so any batch split yields the identical state), then the SAME
    ``disagg_from_daily`` arithmetic as the batch query runs on the
    drained state.  Shares the batch oracle verbatim; the multi-batch
    case is pytest-pinned (tests/test_disagg_stream.py)."""
    from ..session import ensure_utc
    from ..streaming.disagg_stream import run_disagg_daily_available_now

    ensure_utc(spark)
    daily = run_disagg_daily_available_now(spark, sf_dir.rstrip("/"))
    return disagg_from_daily(daily, _monthly_target(spark, sf_dir))


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


# --- M7 robust tier: iteratively-reweighted decomposition (STL robust=True) --------
#
# The reference decomposes contaminated series with STL(robust=True)
# (ts_kmeans_base.ipynb:1197).  STL's robustness = bisquare weights from
# the residuals, re-fitting trend/seasonal as WEIGHTED means.  This tier
# applies exactly that reweighting to the window-native decomposition:
# classical fit -> bisquare weights -> weighted refit, twice.
#
# Cross-engine bit-exactness discipline: weighted double sums are
# order-dependent, so every weighted mean here is (exact integer sum) //
# (exact integer sum) in fixed point —
#   * weights quantized to w = floor(bisquare * 1024)  (dyadic, exact),
#   * values in q4 fixed point (currency * 10^4),
#   * trend/seasonal = truncating integer division (both engines
#     truncate toward zero), only THEN cast to double.
# Integer range budget (documented, not checked): |w*y_q4| <= 2^10*1e13
# and weekday sums stay < 2^63 through sf100; a 100 TB deployment widens
# the two big accumulators to DECIMAL(38,0).
_RW_SCALE = 1024  # 2^10 weight quantization
_RW_ROUNDS = 2


def _rw_sql() -> str:
    """DuckDB oracle for m7_stl_robust, generated round-by-round so the
    Spark and SQL expressions stay structurally identical."""
    sql = f"""
    WITH daily AS ({_DAILY_SQL}),
    cls_t AS (
      SELECT d, CAST(demand AS DOUBLE) AS v, demand,
             CAST(demand * 100 AS BIGINT) AS y_c,
             CASE WHEN COUNT(*) OVER w31 = 31
                  THEN SUM(demand) OVER w31 END AS trend_sum
      FROM daily
      WINDOW w31 AS (ORDER BY d ROWS BETWEEN 15 PRECEDING AND 15 FOLLOWING)
    ),
    cls_g AS (
      SELECT *,
             SUM(CASE WHEN trend_sum IS NOT NULL THEN demand END) OVER wd AS g_demand_sum,
             SUM(trend_sum) OVER wd AS g_trend_sum,
             COUNT(trend_sum) OVER wd AS g_n
      FROM cls_t WINDOW wd AS (PARTITION BY dayofweek(d))
    ),
    r0 AS (
      SELECT d, v, demand, y_c,
             v - CAST(trend_sum AS DOUBLE) / 31
               - (CAST(g_demand_sum AS DOUBLE) - CAST(g_trend_sum AS DOUBLE) / 31) / g_n
               AS resid
      FROM cls_g
    )"""
    prev = "r0"
    for k in range(1, _RW_ROUNDS + 1):
        sql += f""",
    med{k} AS (
      SELECT median(CAST(floor(abs(resid) * 100) AS BIGINT)) AS med FROM {prev}
    ),
    u{k} AS (
      -- explicit column list: carrying r{{k-1}}'s w/trend/seasonal through
      -- would shadow round-{k}'s recomputed columns downstream
      SELECT p.d, p.v, p.demand, p.y_c, p.resid, m.med,
             abs(p.resid) / (6.0 * m.med / 100.0) AS u
      FROM {prev} p, med{k} m
    ),
    w{k} AS (
      SELECT d, v, demand, y_c,
             CASE WHEN resid IS NULL OR med IS NULL OR med <= 0 THEN {_RW_SCALE}
                  WHEN u >= 1.0 THEN 0
                  ELSE CAST(floor((1.0 - u * u) * (1.0 - u * u) * {_RW_SCALE}.0)
                            AS BIGINT)
             END AS w
      FROM u{k}
    ),
    f{k}a AS (
      SELECT *,
             CASE WHEN COUNT(*) OVER w31 = 31
                  THEN SUM(w * y_c) OVER w31 END AS wy,
             SUM(w) OVER w31 AS sw
      FROM w{k}
      WINDOW w31 AS (ORDER BY d ROWS BETWEEN 15 PRECEDING AND 15 FOLLOWING)
    ),
    f{k}b AS (
      SELECT *, CASE WHEN wy IS NOT NULL AND sw > 0 THEN (wy * 100) // sw END
                  AS trend_q4
      FROM f{k}a
    ),
    f{k}c AS (
      SELECT *, y_c * 100 - trend_q4 AS detr_q4 FROM f{k}b
    ),
    f{k}d AS (
      SELECT *,
             SUM(CASE WHEN detr_q4 IS NOT NULL THEN w * detr_q4 END) OVER wd AS s_num,
             SUM(CASE WHEN detr_q4 IS NOT NULL THEN w END) OVER wd AS s_den
      FROM f{k}c WINDOW wd AS (PARTITION BY dayofweek(d))
    ),
    r{k} AS (
      SELECT d, v, demand, y_c, w, trend_q4,
             CASE WHEN s_den > 0 THEN s_num // s_den END AS seasonal_q4,
             v - CAST(trend_q4 AS DOUBLE) / 10000.0
               - CAST(CASE WHEN s_den > 0 THEN s_num // s_den END AS DOUBLE) / 10000.0
               AS resid
      FROM f{k}d
    )"""
        prev = f"r{k}"
    sql += f"""
    SELECT d,
           CAST(trend_q4 AS DOUBLE) / 10000.0 AS trend,
           CAST(seasonal_q4 AS DOUBLE) / 10000.0 AS seasonal,
           resid,
           w AS weight_fp
    FROM {prev}
    """
    return sql


@query("m7_stl_robust", oracle=_rw_sql())
def m7_stl_robust(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M7 robust tier: 2-round iteratively-reweighted window
    decomposition = the bisquare-weight loop of STL(robust=True)
    (reference ts_kmeans_base.ipynb:1197) applied to the window-native
    classical fit of ``m7_seasonal_decompose``.

    Per round: h = 6 * median|resid| (residual cents, exact median),
    w = floor(bisquare(|resid|/h) * 1024) (0 outside |r|<h, 1024 where
    resid undefined), then trend = weighted 31-row moving mean and
    seasonal = weighted weekday mean — both as truncating integer
    divisions of exact fixed-point sums, so the whole 2-round recursion
    is bit-identical to the DuckDB oracle.  The median is a scalar over
    the bounded daily series (one row per calendar day) — broadcast
    back, never a data-path collect."""
    daily = _daily(spark, sf_dir)
    w31 = Window.orderBy("d").rowsBetween(-15, 15)
    wd = Window.partitionBy(F.dayofweek("d"))
    cls_t = daily.select(
        "d",
        F.col("demand").cast("double").alias("v"),
        "demand",
        (F.col("demand") * 100).cast("long").alias("y_c"),
        F.when(F.count("*").over(w31) == 31, F.sum("demand").over(w31)).alias(
            "trend_sum"
        ),
    )
    cls_g = cls_t.select(
        "*",
        F.sum(F.when(F.col("trend_sum").isNotNull(), F.col("demand")))
        .over(wd)
        .alias("g_demand_sum"),
        F.sum("trend_sum").over(wd).alias("g_trend_sum"),
        F.count("trend_sum").over(wd).alias("g_n"),
    )
    cur = cls_g.select(
        "d",
        "v",
        "demand",
        "y_c",
        (
            F.col("v")
            - F.col("trend_sum").cast("double") / 31
            - (
                F.col("g_demand_sum").cast("double")
                - F.col("g_trend_sum").cast("double") / 31
            )
            / F.col("g_n")
        ).alias("resid"),
    )
    last = None
    for _ in range(_RW_ROUNDS):
        med = cur.agg(
            F.expr(
                "percentile(CAST(floor(abs(resid) * 100) AS BIGINT), 0.5)"
            ).alias("med")
        )
        u = cur.crossJoin(F.broadcast(med)).withColumn(
            "u", F.abs(F.col("resid")) / (F.lit(6.0) * F.col("med") / F.lit(100.0))
        )
        wdf = u.withColumn(
            "w",
            F.when(
                F.col("resid").isNull() | F.col("med").isNull() | (F.col("med") <= 0),
                F.lit(_RW_SCALE).cast("long"),
            )
            .when(F.col("u") >= 1.0, F.lit(0).cast("long"))
            .otherwise(
                F.floor(
                    (F.lit(1.0) - F.col("u") * F.col("u"))
                    * (F.lit(1.0) - F.col("u") * F.col("u"))
                    * F.lit(float(_RW_SCALE))
                )
            ),
        ).select("d", "v", "demand", "y_c", "w")
        fa = wdf.select(
            "*",
            F.when(
                F.count("*").over(w31) == 31,
                F.sum(F.col("w") * F.col("y_c")).over(w31),
            ).alias("wy"),
            F.sum("w").over(w31).alias("sw"),
        )
        fb = fa.withColumn(
            "trend_q4",
            F.when(
                F.col("wy").isNotNull() & (F.col("sw") > 0),
                F.expr("(wy * 100) div sw"),
            ),
        )
        fc = fb.withColumn("detr_q4", F.col("y_c") * 100 - F.col("trend_q4"))
        fd = fc.select(
            "*",
            F.sum(F.when(F.col("detr_q4").isNotNull(), F.col("w") * F.col("detr_q4")))
            .over(wd)
            .alias("s_num"),
            F.sum(F.when(F.col("detr_q4").isNotNull(), F.col("w")))
            .over(wd)
            .alias("s_den"),
        )
        seasonal_q4 = F.when(F.col("s_den") > 0, F.expr("s_num div s_den"))
        last = fd.select(
            "d",
            "v",
            "demand",
            "y_c",
            "w",
            "trend_q4",
            seasonal_q4.alias("seasonal_q4"),
            (
                F.col("v")
                - F.col("trend_q4").cast("double") / F.lit(10000.0)
                - seasonal_q4.cast("double") / F.lit(10000.0)
            ).alias("resid"),
        )
        cur = last
    return last.select(
        "d",
        (F.col("trend_q4").cast("double") / F.lit(10000.0)).alias("trend"),
        (F.col("seasonal_q4").cast("double") / F.lit(10000.0)).alias("seasonal"),
        "resid",
        F.col("w").alias("weight_fp"),
    )


# --- M7 multi-seasonal tier: MSTL-shaped decomposition ------------------------------
#
# The reference imports MSTL alongside STL (ts_kmeans_base.ipynb:22-24):
# multiple seasonal components extracted one period at a time, each
# refined after the others are removed.  This tier is the window-native
# analog for the daily demand series with two seasonalities:
#   weekly  (phase = calendar weekday) and
#   yearly  (phase = calendar (month, day)),
# trend = centered 365-row moving average (full windows only, the same
# NaN-edge convention as m7_seasonal_decompose), then
#   s_week  = phase-mean of the detrended series,
#   s_year  = phase-mean of (detrended - s_week),
#   s_week' = phase-mean of (detrended - s_year)   <- one MSTL-style
#              back-refinement round, re-estimating the faster seasonal
#              after the slower one is removed,
#   resid   = v - trend - s_week' - s_year.
#
# Cross-engine bit-exactness: the same fixed-point discipline as
# m7_stl_robust — values ride q4 fixed point (dollars * 1e4, exact since
# demand is DECIMAL(18,2)), every phase mean is a truncating integer
# division of exact BIGINT sums.  Range budget: |detr_q4| <= ~1e12 at
# sf1 and phase partitions hold <= ~366 rows, so sums stay < 2^63
# through sf100; beyond that the accumulators widen to DECIMAL(38,0).
# Phase partitions are bounded-cardinality calendar keys (7 and 366), so
# the plan is two bounded hash shuffles + one row-window at any scale.
_MSTL_CTES = f"""daily AS ({_DAILY_SQL}),
    base AS (
      SELECT d, CAST(demand AS DOUBLE) AS v,
             CAST(demand * 100 AS BIGINT) AS y_c,
             CASE WHEN COUNT(*) OVER w365 = 365
                  THEN SUM(CAST(demand * 100 AS BIGINT)) OVER w365 END AS trend_sum
      FROM daily
      WINDOW w365 AS (ORDER BY d ROWS BETWEEN 182 PRECEDING AND 182 FOLLOWING)
    ),
    dt AS (
      SELECT *, (trend_sum * 100) // 365 AS trend_q4,
             y_c * 100 - (trend_sum * 100) // 365 AS detr_q4
      FROM base
    ),
    s7 AS (
      SELECT *,
             CASE WHEN COUNT(detr_q4) OVER wd > 0
                  THEN (SUM(detr_q4) OVER wd) // (COUNT(detr_q4) OVER wd)
             END AS s7_q4
      FROM dt WINDOW wd AS (PARTITION BY dayofweek(d))
    ),
    s365 AS (
      SELECT *,
             CASE WHEN COUNT(detr_q4 - s7_q4) OVER wp > 0
                  THEN (SUM(detr_q4 - s7_q4) OVER wp)
                       // (COUNT(detr_q4 - s7_q4) OVER wp)
             END AS s365_q4
      FROM s7 WINDOW wp AS (PARTITION BY month(d), day(d))
    ),
    s7b AS (
      SELECT *,
             CASE WHEN COUNT(detr_q4 - s365_q4) OVER wd > 0
                  THEN (SUM(detr_q4 - s365_q4) OVER wd)
                       // (COUNT(detr_q4 - s365_q4) OVER wd)
             END AS s7b_q4
      FROM s365 WINDOW wd AS (PARTITION BY dayofweek(d))
    )"""


def _mstl_q4(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shared MSTL pipeline in q4 fixed point — the frame behind
    m7_mstl AND ts_seasonality_strength (columns y_c, trend_q4,
    s7b_q4, s365_q4, ...)."""
    daily = _daily(spark, sf_dir)
    w365 = Window.orderBy("d").rowsBetween(-182, 182)
    # Spark dayofweek is 1=Sunday..7 vs DuckDB 0..6 — partition identity
    # is all that matters (same rule as m7_seasonal_decompose).
    wd = Window.partitionBy(F.dayofweek("d"))
    wp = Window.partitionBy(F.month("d"), F.dayofmonth("d"))
    base = daily.select(
        "d",
        F.col("demand").cast("double").alias("v"),
        (F.col("demand") * 100).cast("long").alias("y_c"),
        F.when(
            F.count("*").over(w365) == 365,
            F.sum((F.col("demand") * 100).cast("long")).over(w365),
        ).alias("trend_sum"),
    )
    dt = base.select(
        "*",
        F.expr("(trend_sum * 100) div 365").alias("trend_q4"),
        (F.col("y_c") * 100 - F.expr("(trend_sum * 100) div 365")).alias(
            "detr_q4"
        ),
    )
    s7 = dt.select(
        "*",
        F.when(
            F.count("detr_q4").over(wd) > 0,
            F.sum("detr_q4").over(wd),
        ).alias("__s7_num"),
        F.count("detr_q4").over(wd).alias("__s7_den"),
    ).withColumn(
        "s7_q4", F.expr("__s7_num div __s7_den")
    )
    d2 = (F.col("detr_q4") - F.col("s7_q4")).alias("__d2")
    s365 = s7.select("*", d2).select(
        "*",
        F.when(F.count("__d2").over(wp) > 0, F.sum("__d2").over(wp)).alias(
            "__s365_num"
        ),
        F.count("__d2").over(wp).alias("__s365_den"),
    ).withColumn("s365_q4", F.expr("__s365_num div __s365_den"))
    d3 = (F.col("detr_q4") - F.col("s365_q4")).alias("__d3")
    s7b = s365.select("*", d3).select(
        "*",
        F.when(F.count("__d3").over(wd) > 0, F.sum("__d3").over(wd)).alias(
            "__s7b_num"
        ),
        F.count("__d3").over(wd).alias("__s7b_den"),
    ).withColumn("s7b_q4", F.expr("__s7b_num div __s7b_den"))
    return s7b


@query(
    "m7_mstl",
    oracle=f"""
    WITH {_MSTL_CTES}
    SELECT d,
           CAST(trend_q4 AS DOUBLE) / 10000.0 AS trend,
           CAST(s7b_q4 AS DOUBLE) / 10000.0 AS seasonal_weekly,
           CAST(s365_q4 AS DOUBLE) / 10000.0 AS seasonal_yearly,
           v - (CAST(trend_q4 AS DOUBLE) + CAST(s7b_q4 AS DOUBLE)
                + CAST(s365_q4 AS DOUBLE)) / 10000.0 AS resid
    FROM s7b
    """,
)
def m7_mstl(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M7 multi-seasonal tier (MSTL, ts_kmeans_base.ipynb:22-24): weekly
    + yearly seasonal components extracted sequentially with one
    back-refinement round, in exact q4 fixed point (see the block
    comment above for the algebra and the scale/range budget)."""
    s7b = _mstl_q4(spark, sf_dir)
    return s7b.select(
        "d",
        (F.col("trend_q4").cast("double") / 10000.0).alias("trend"),
        (F.col("s7b_q4").cast("double") / 10000.0).alias("seasonal_weekly"),
        (F.col("s365_q4").cast("double") / 10000.0).alias("seasonal_yearly"),
        (
            F.col("v")
            - (
                F.col("trend_q4").cast("double")
                + F.col("s7b_q4").cast("double")
                + F.col("s365_q4").cast("double")
            )
            / 10000.0
        ).alias("resid"),
    )


# --- seasonality / trend strength (Hyndman & Athanasopoulos, FPP3 §4.4) -------------
@query(
    "ts_seasonality_strength",
    oracle=f"""
    WITH {_MSTL_CTES},
    r AS (
      SELECT CAST(y_c AS HUGEINT) * 100 - trend_q4 - s7b_q4 - s365_q4
               AS r_q4,
             CAST(y_c AS HUGEINT) * 100 - trend_q4 AS sr_q4,
             CAST(y_c AS HUGEINT) * 100 - s7b_q4 - s365_q4 AS tr_q4
      FROM s7b
      WHERE trend_q4 IS NOT NULL AND s7b_q4 IS NOT NULL
        AND s365_q4 IS NOT NULL
    ),
    m AS (
      SELECT CAST(COUNT(*) AS HUGEINT) AS n,
             CAST(SUM(r_q4) AS HUGEINT) AS s_r,
             CAST(SUM(r_q4 * r_q4) AS HUGEINT) AS ss_r,
             CAST(SUM(sr_q4) AS HUGEINT) AS s_sr,
             CAST(SUM(sr_q4 * sr_q4) AS HUGEINT) AS ss_sr,
             CAST(SUM(tr_q4) AS HUGEINT) AS s_tr,
             CAST(SUM(tr_q4 * tr_q4) AS HUGEINT) AS ss_tr
      FROM r
    )
    SELECT CAST(n AS BIGINT) AS n_days,
           CAST(GREATEST(0, 1000000 - (1000000 * (n * ss_r - s_r * s_r))
                // NULLIF(n * ss_sr - s_sr * s_sr, 0)) AS BIGINT)
             AS seasonal_strength_ppm,
           CAST(GREATEST(0, 1000000 - (1000000 * (n * ss_r - s_r * s_r))
                // NULLIF(n * ss_tr - s_tr * s_tr, 0)) AS BIGINT)
             AS trend_strength_ppm
    FROM m
    """,
)
def ts_seasonality_strength(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seasonality and trend STRENGTH of the daily demand series
    (Hyndman & Athanasopoulos, FPP3 §4.4): F_s = max(0, 1 −
    Var(R)/Var(S+R)) on the detrended series and F_t likewise on the
    deseasonalized one — the two features every forecasting pipeline
    computes to route series between models.  Components come from the
    shared MSTL q4 pipeline (_mstl_q4 ≡ _MSTL_CTES), so residuals are
    EXACT integers and each strength is one truncating division of
    DECIMAL(38)/HUGEINT moment algebra in ppm — no float variance ever
    forms.  Range budget: r_q4² ~ 1e22 and n·Σ ~ 1e29 sit inside
    DECIMAL(38)."""
    s7b = _mstl_q4(spark, sf_dir)
    d38 = "decimal(38,0)"
    r = s7b.filter(
        F.col("trend_q4").isNotNull()
        & F.col("s7b_q4").isNotNull()
        & F.col("s365_q4").isNotNull()
    ).select(
        (
            F.col("y_c").cast(d38) * 100
            - F.col("trend_q4")
            - F.col("s7b_q4")
            - F.col("s365_q4")
        ).alias("r_q4"),
        (F.col("y_c").cast(d38) * 100 - F.col("trend_q4")).alias("sr_q4"),
        (
            F.col("y_c").cast(d38) * 100 - F.col("s7b_q4") - F.col("s365_q4")
        ).alias("tr_q4"),
    )
    m = r.agg(
        F.count("*").cast(d38).alias("n"),
        F.sum("r_q4").cast(d38).alias("s_r"),
        F.sum(F.col("r_q4") * F.col("r_q4")).cast(d38).alias("ss_r"),
        F.sum("sr_q4").cast(d38).alias("s_sr"),
        F.sum(F.col("sr_q4") * F.col("sr_q4")).cast(d38).alias("ss_sr"),
        F.sum("tr_q4").cast(d38).alias("s_tr"),
        F.sum(F.col("tr_q4") * F.col("tr_q4")).cast(d38).alias("ss_tr"),
    )
    return m.select(
        F.col("n").cast("long").alias("n_days"),
        F.expr(
            "CAST(GREATEST(0, 1000000 - (1000000 * (n * ss_r - s_r * s_r))"
            " div NULLIF(n * ss_sr - s_sr * s_sr, 0)) AS BIGINT)"
        ).alias("seasonal_strength_ppm"),
        F.expr(
            "CAST(GREATEST(0, 1000000 - (1000000 * (n * ss_r - s_r * s_r))"
            " div NULLIF(n * ss_tr - s_tr * s_tr, 0)) AS BIGINT)"
        ).alias("trend_strength_ppm"),
    )


# --- local peak detection over the daily series -------------------------------------
PEAK_HALF_WINDOW = 3  # peak = strict max of its +/-3-day neighborhood


@query(
    "ts_peak_detection",
    oracle=f"""
    WITH daily AS ({_DAILY_SQL}),
    c AS (
      SELECT d, CAST(demand * 100 AS BIGINT) AS y_c FROM daily
    ),
    n AS (
      SELECT d, y_c,
             MAX(y_c) OVER (ORDER BY d ROWS BETWEEN {PEAK_HALF_WINDOW}
               PRECEDING AND 1 PRECEDING) AS max_before,
             MAX(y_c) OVER (ORDER BY d ROWS BETWEEN 1 FOLLOWING
               AND {PEAK_HALF_WINDOW} FOLLOWING) AS max_after,
             COUNT(*) OVER (ORDER BY d ROWS BETWEEN {PEAK_HALF_WINDOW}
               PRECEDING AND {PEAK_HALF_WINDOW} FOLLOWING) AS n_window
      FROM c
    )
    SELECT d, y_c,
           CAST(y_c - GREATEST(max_before, max_after) AS BIGINT)
             AS prominence_c
    FROM n
    WHERE n_window = {2 * PEAK_HALF_WINDOW + 1}
      AND y_c > max_before AND y_c > max_after
    """,
)
def ts_peak_detection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Local demand peaks: days that strictly dominate their +/-3-day (PEAK_HALF_WINDOW)
    neighborhood (full windows only), with the margin over the runner-up
    as an exact integer prominence — the alarm/peak-shaving primitive
    (scipy find_peaks' core rule, window-native).  Exact cents
    comparisons; the window rides the bounded daily series."""
    daily = _daily(spark, sf_dir)
    c = daily.select("d", (F.col("demand") * 100).cast("long").alias("y_c"))
    wb = Window.orderBy("d").rowsBetween(-PEAK_HALF_WINDOW, -1)
    wa = Window.orderBy("d").rowsBetween(1, PEAK_HALF_WINDOW)
    wf = Window.orderBy("d").rowsBetween(-PEAK_HALF_WINDOW, PEAK_HALF_WINDOW)
    n = c.select(
        "d",
        "y_c",
        F.max("y_c").over(wb).alias("max_before"),
        F.max("y_c").over(wa).alias("max_after"),
        F.count("*").over(wf).alias("n_window"),
    )
    return n.filter(
        (F.col("n_window") == 2 * PEAK_HALF_WINDOW + 1)
        & (F.col("y_c") > F.col("max_before"))
        & (F.col("y_c") > F.col("max_after"))
    ).select(
        "d",
        "y_c",
        (F.col("y_c") - F.greatest("max_before", "max_after")).alias(
            "prominence_c"
        ),
    )


# --- energy analytics: load-duration curve / peak-to-average / ramp rates --------------
# The reference's domain is grid-load forecasting (BASELINE.md): these
# three are the standard capacity-planning reads of a daily load series
# — how demand distributes (duration curve), how peaky each month is
# (PAR), and how fast it moves day-over-day (ramps).
@query(
    "ts_load_duration_curve",
    oracle="""
    WITH v AS (
      SELECT CAST(ts AS DATE) AS d,
             CAST(SUM(CAST(value AS DECIMAL(18,2)) * 100) AS BIGINT) AS vc
      FROM events GROUP BY 1
    ),
    n AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM v)
    SELECT CAST(ROW_NUMBER() OVER (ORDER BY vc DESC, d) AS BIGINT) AS rnk,
           vc AS load_c,
           CAST((1000000 * ROW_NUMBER() OVER (ORDER BY vc DESC, d))
                // n.n AS BIGINT) AS exceedance_ppm
    FROM v, n
    """,
)
def ts_load_duration_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Load-duration curve: daily loads sorted descending with their
    exceedance fraction — the capacity-planning chart behind "how many
    days/year exceed X MW" (peaker sizing, demand-response budgeting).
    Exact cents, deterministic (value, date) ordering, ppm exceedance;
    the global rank window rides the calendar-bounded daily aggregate
    (m23/m24 discipline)."""
    v = (
        tbl(spark, sf_dir, "events")
        .groupBy(F.to_date("ts").alias("d"))
        .agg(
            F.sum(F.col("value").cast("decimal(18,2)") * 100)
            .cast("long")
            .alias("vc")
        )
    )
    n = v.agg(F.count("*").alias("n"))
    w = Window.orderBy(F.desc("vc"), "d")
    return (
        v.crossJoin(F.broadcast(n))
        .select(
            F.row_number().over(w).cast("long").alias("rnk"),
            F.col("vc").alias("load_c"),
            "n",
        )
        .selectExpr(
            "rnk",
            "load_c",
            "CAST((1000000 * rnk) div n AS BIGINT) AS exceedance_ppm",
        )
    )


@query(
    "ts_peak_to_average",
    oracle="""
    WITH v AS (
      SELECT CAST(EXTRACT(year FROM ts) AS INT) AS yr,
             CAST(EXTRACT(month FROM ts) AS INT) AS mo,
             CAST(ts AS DATE) AS d,
             CAST(SUM(CAST(value AS DECIMAL(18,2)) * 100) AS BIGINT) AS vc
      FROM events GROUP BY 1, 2, 3
    )
    SELECT yr, mo,
           CAST(MAX(vc) AS BIGINT) AS peak_c,
           CAST(SUM(CAST(vc AS HUGEINT)) AS BIGINT) AS total_c,
           CAST(COUNT(*) AS BIGINT) AS n_days,
           CAST((1000000 * CAST(MAX(vc) AS HUGEINT) * COUNT(*))
                // NULLIF(SUM(CAST(vc AS HUGEINT)), 0) AS BIGINT)
             AS par_ppm
    FROM v GROUP BY yr, mo
    """,
)
def ts_peak_to_average(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Monthly peak-to-average ratio of the daily load — the peakiness
    metric that prices capacity (a PAR near 1 is baseload-shaped; high
    PAR months need reserves).  PAR = max/mean emitted as the exact
    cross-multiplied truncating ppm (1e6·max·n) div total — no float
    mean ever formed."""
    v = (
        tbl(spark, sf_dir, "events")
        .groupBy(
            F.year("ts").alias("yr"),
            F.month("ts").alias("mo"),
            F.to_date("ts").alias("d"),
        )
        .agg(
            F.sum(F.col("value").cast("decimal(18,2)") * 100)
            .cast("long")
            .alias("vc")
        )
    )
    d38 = "decimal(38,0)"
    return v.groupBy("yr", "mo").agg(
        F.max("vc").alias("peak_c"),
        F.sum(F.col("vc").cast(d38)).cast("long").alias("total_c"),
        F.count("*").alias("n_days"),
        F.expr(
            "CAST((1000000 * CAST(MAX(vc) AS DECIMAL(38,0)) * COUNT(*))"
            " div NULLIF(SUM(CAST(vc AS DECIMAL(38,0))), 0) AS BIGINT)"
        ).alias("par_ppm"),
    )


@query(
    "ts_ramp_rates",
    oracle="""
    WITH v AS (
      SELECT CAST(ts AS DATE) AS d,
             CAST(SUM(CAST(value AS DECIMAL(18,2)) * 100) AS BIGINT) AS vc
      FROM events GROUP BY 1
    ),
    ramps AS (
      SELECT CAST(EXTRACT(year FROM d) AS INT) AS yr,
             CAST(EXTRACT(month FROM d) AS INT) AS mo,
             vc - LAG(vc) OVER (ORDER BY d) AS ramp_c
      FROM v
    )
    SELECT yr, mo,
           CAST(COUNT(ramp_c) AS BIGINT) AS n_ramps,
           CAST(MAX(ramp_c) AS BIGINT) AS max_up_ramp_c,
           CAST(MIN(ramp_c) AS BIGINT) AS max_down_ramp_c,
           CAST(SUM(ABS(CAST(ramp_c AS HUGEINT))) AS BIGINT)
             AS total_abs_ramp_c
    FROM ramps WHERE ramp_c IS NOT NULL GROUP BY yr, mo
    """,
)
def ts_ramp_rates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Monthly ramp-rate profile: the largest day-over-day up/down
    moves and total absolute movement of the daily load — the
    flexibility requirement a grid operator reads before committing
    dispatchable capacity (fast ramps need fast units).  Exact integer
    cents; the single lag window rides the calendar-bounded daily
    aggregate; ramps attribute to the month of their LATER day."""
    v = (
        tbl(spark, sf_dir, "events")
        .groupBy(F.to_date("ts").alias("d"))
        .agg(
            F.sum(F.col("value").cast("decimal(18,2)") * 100)
            .cast("long")
            .alias("vc")
        )
    )
    w = Window.orderBy("d")
    ramps = v.select(
        F.year("d").alias("yr"),
        F.month("d").alias("mo"),
        (F.col("vc") - F.lag("vc").over(w)).alias("ramp_c"),
    ).filter(F.col("ramp_c").isNotNull())
    d38 = "decimal(38,0)"
    return ramps.groupBy("yr", "mo").agg(
        F.count("ramp_c").alias("n_ramps"),
        F.max("ramp_c").alias("max_up_ramp_c"),
        F.min("ramp_c").alias("max_down_ramp_c"),
        F.sum(F.abs(F.col("ramp_c").cast(d38))).cast("long").alias(
            "total_abs_ramp_c"
        ),
    )


# --- demand intermittency profile (Syntetos–Boylan quadrants) ---------------------------
@query(
    "ts_intermittency_profile",
    oracle="""
    WITH md AS (
      SELECT l.l_partkey AS part,
             CAST(EXTRACT(year FROM o.o_orderdate) AS INT) * 12
               + CAST(EXTRACT(month FROM o.o_orderdate) AS INT) AS mo,
             CAST(SUM(CAST(l.l_quantity AS BIGINT)) AS BIGINT) AS q
      FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey
      GROUP BY 1, 2
    ),
    horizon AS (
      SELECT CAST(MAX(mo) - MIN(mo) + 1 AS HUGEINT) AS n_periods FROM md
    ),
    per AS (
      SELECT part,
             CAST(COUNT(*) AS HUGEINT) AS n_ev,
             CAST(SUM(CAST(q AS HUGEINT)) AS HUGEINT) AS s,
             CAST(SUM(CAST(q AS HUGEINT) * q) AS HUGEINT) AS ssq
      FROM md GROUP BY part
    ),
    scored AS (
      SELECT part,
             CAST((1000000 * horizon.n_periods) // n_ev AS BIGINT) AS adi_ppm,
             CAST((1000000 * (n_ev * ssq - s * s)) // (s * s) AS BIGINT)
               AS cv2_ppm,
             CAST(n_ev AS BIGINT) AS n_demand_months
      FROM per, horizon
    )
    SELECT part, n_demand_months, adi_ppm, cv2_ppm,
           CASE WHEN adi_ppm < 1320000 AND cv2_ppm < 490000 THEN 'smooth'
                WHEN adi_ppm < 1320000 THEN 'erratic'
                WHEN cv2_ppm < 490000 THEN 'intermittent'
                ELSE 'lumpy' END AS demand_class
    FROM scored
    """,
)
def ts_intermittency_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Syntetos–Boylan demand classification per part — THE method-
    selection screen in front of the forecasting ladder: ADI (average
    inter-demand interval) × CV² (squared variation of nonzero demand
    sizes) cut at (1.32, 0.49) into smooth / erratic / intermittent /
    lumpy, which decides Croston/SBA (m27) vs exponential smoothing
    (m20/m26) per series.

    Both axes are exact truncating ppm of integer moments (CV² =
    (nΣq²−S²)/S² over the nonzero months; ADI = horizon/n_events), so
    the classification thresholds compare exact integers against the
    ppm constants 1320000/490000 — no float thresholds.  Plan: one
    part×month agg, one part agg, one broadcast scalar horizon."""
    li = tbl(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey", "l_quantity"
    )
    o = tbl(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    md = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .groupBy(
            F.col("l_partkey").alias("part"),
            (F.year("o_orderdate") * 12 + F.month("o_orderdate")).alias("mo"),
        )
        .agg(F.sum(F.col("l_quantity").cast("long")).cast("long").alias("q"))
        .transform(shared_plan)  # feeds horizon AND per
    )
    horizon = md.agg(
        (F.max("mo") - F.min("mo") + 1).cast("decimal(38,0)").alias("n_periods")
    )
    d38 = "decimal(38,0)"
    per = md.groupBy("part").agg(
        F.count("*").cast(d38).alias("n_ev"),
        F.sum(F.col("q").cast(d38)).cast(d38).alias("s"),
        F.sum(F.col("q").cast(d38) * F.col("q").cast(d38))
        .cast(d38)
        .alias("ssq"),
    )
    return sb_score_and_classify(per.crossJoin(F.broadcast(horizon)))


def sb_score_and_classify(per: DataFrame) -> DataFrame:
    """Syntetos–Boylan–Croston categorization (Syntetos, Boylan &
    Croston 2005, JORS 56:495-503) over a frame carrying per-series
    exact integer moments (part, n_ev, s, ssq, n_periods): truncating
    ppm of ADI = n_periods/n_ev and CV² = (nΣq²−S²)/S², cut at the
    PUBLISHED (1.32, 0.49) — i.e. the exact integers 1320000/490000 —
    into smooth / erratic / intermittent / lumpy.  Factored out of
    ts_intermittency_profile so the external-golden test can drive the
    identical expressions on hand-derived anchors."""
    scored = per.select(
        "part",
        F.col("n_ev").cast("long").alias("n_demand_months"),
        F.expr(
            "CAST((1000000 * n_periods) div n_ev AS BIGINT)"
        ).alias("adi_ppm"),
        F.expr(
            "CAST((1000000 * (n_ev * ssq - s * s)) div (s * s) AS BIGINT)"
        ).alias("cv2_ppm"),
    )
    return scored.select(
        "part",
        "n_demand_months",
        "adi_ppm",
        "cv2_ppm",
        F.when(
            (F.col("adi_ppm") < 1320000) & (F.col("cv2_ppm") < 490000),
            F.lit("smooth"),
        )
        .when(F.col("adi_ppm") < 1320000, F.lit("erratic"))
        .when(F.col("cv2_ppm") < 490000, F.lit("intermittent"))
        .otherwise(F.lit("lumpy"))
        .alias("demand_class"),
    )


# --- changepoint detection: exact binary segmentation ---------------------------------
CP_SCALE = 10**6


@query(
    "ts_changepoint",
    oracle=f"""
    WITH daily AS ({{_DAILY_SQL}}),
    c AS (
      SELECT d, CAST(demand * 100 AS BIGINT) AS y_c,
             ROW_NUMBER() OVER (ORDER BY d) AS t,
             COUNT(*) OVER () AS n,
             SUM(CAST(demand * 100 AS BIGINT)) OVER (
               ORDER BY d ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
             ) AS cum_s,
             SUM(CAST(demand * 100 AS BIGINT)) OVER () AS s_tot
      FROM daily
    ),
    gains AS (
      SELECT d, t AS n_left, n - t AS n_right,
             (({CP_SCALE} * (
               CAST(cum_s AS HUGEINT) * cum_s * (n - t) * n
               + CAST(s_tot - cum_s AS HUGEINT) * (s_tot - cum_s) * t * n
               - CAST(s_tot AS HUGEINT) * s_tot * t * (n - t)
             )) // (CAST(t AS HUGEINT) * (n - t) * n)) AS gain_scaled
      FROM c WHERE t < n
    )
    SELECT CAST(d AS DATE) AS split_d,
           CAST(n_left AS BIGINT) AS n_left,
           CAST(n_right AS BIGINT) AS n_right,
           gain_scaled
    FROM gains ORDER BY gain_scaled DESC, split_d LIMIT 1
    """.format(_DAILY_SQL=_DAILY_SQL),
)
def ts_changepoint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Single-changepoint detection by EXACT binary segmentation
    (Scott & Knott 1974; the split step of PELT/BinSeg): the break
    after day t maximizes the SSE reduction

        gain(t) = S_l²/n_l + S_r²/n_r − S²/n

    over the daily cents series — every candidate scored as one exact
    rational (variance terms cancel out of the difference, leaving
    only segment sums), emitted as a truncating scaled division, so
    both engines rank splits identically with zero float ops.

    Plan: ONE distributed calendar-bounded aggregation packs the daily
    series into a single sorted array row, then the exact-rational
    argmax runs in Python big ints INSIDE a ``mapInPandas`` over that
    1-row frame (the gain numerators are ~1e35-scale integers, beyond
    Spark's 64-bit IntegralDivide and the 38-digit decimal division's
    rounding; only the ≤1e33 quotient must fit the emitted
    decimal(38,0)).  The DuckDB oracle computes the IDENTICAL exact
    integers in HUGEINT — both sides exact, so the argmax and the
    truncating division agree bit-for-bit.  Zero construction jobs
    (r9): the old driver-side BOUNDED collect became an executor-side
    fold; the array row stays calendar-bounded by the same argument."""
    from decimal import Decimal

    daily = _daily(spark, sf_dir)
    packed = daily.select(
        F.struct(
            F.col("d"),
            (F.col("demand").cast("decimal(18,2)") * 100)
            .cast("long")
            .alias("y_c"),
        ).alias("r")
    ).agg(F.sort_array(F.collect_list("r")).alias("rs"))

    out_schema = (
        "split_d date, n_left long, n_right long, gain_scaled decimal(38,0)"
    )

    def argmax_gain(batches):
        import pandas as pd

        for pdf in batches:
            for rs in pdf["rs"]:
                rows = list(rs)
                n = len(rows)
                if n < 2:
                    # degenerate series: no interior split exists,
                    # mirroring the oracle's LIMIT 1 over zero rows.
                    continue
                s_tot = sum(int(r["y_c"]) for r in rows)
                best = None
                cum = 0
                for t, r in enumerate(rows[:-1], start=1):
                    cum += int(r["y_c"])
                    sl, sr, nl, nr = cum, s_tot - cum, t, n - t
                    g_num = CP_SCALE * (
                        sl * sl * nr * n
                        + sr * sr * nl * n
                        - s_tot * s_tot * nl * nr
                    )
                    gain = g_num // (nl * nr * n)
                    key = (gain, -t)
                    if best is None or key > best[0]:
                        best = (key, (r["d"], nl, nr, gain))
                d, nl, nr, gain = best[1]
                yield pd.DataFrame(
                    {
                        "split_d": [d],
                        "n_left": [nl],
                        "n_right": [nr],
                        "gain_scaled": [Decimal(gain)],
                    }
                )

    return packed.mapInPandas(argmax_gain, out_schema)
