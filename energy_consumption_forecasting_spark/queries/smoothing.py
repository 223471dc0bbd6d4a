"""Holt linear-trend exponential smoothing, per series.

The reference's forecasting tier (SURVEY §2.7: AR/ARIMA M9, GBT M10,
LSTM M11) lacks the classical smoothing baseline every energy-demand
stack ships; this adds Holt's double exponential smoothing as a grouped
operator: one independent recursion per series, fitted one-step-ahead
values alongside level/trend state.

Spark-first shape: ``applyInPandas`` over the series key — each group is
a bounded calendar-length array (here ~80 months; at 100 TB you have
millions of *series*, not longer ones, so groups stay cache-sized and
the stage is embarrassingly parallel with zero cross-group shuffle
beyond the one groupBy).

Cross-engine determinism: the recursion is evaluated as the *same IEEE
double op sequence* on both engines — Python loop here, recursive CTE in
DuckDB — starting from identical doubles (CAST of exact DECIMAL month
sums).  Smoothing constants are dyadic rationals (α=0.5, β=0.25) so the
literals are bit-exact in both parsers; every step is mul/add in the
same order, so the driver's strict value hash matches with no rounding.

Reference anchor: the naive/persistence baseline in
``src/scripts/evaluation.py`` (metrics vs lag-1) is the M14 spine; Holt
is the standard next rung on that baseline ladder.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from . import query
from ._util import tbl

ALPHA = 0.5  # level smoothing — dyadic, bit-exact literal in SQL + Python
BETA = 0.25  # trend smoothing

_MONTHLY_PRIO_SQL = """
      SELECT o_orderpriority AS priority,
             CAST(date_trunc('month', o_orderdate) AS DATE) AS month,
             CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DECIMAL(18,2)) AS demand
      FROM orders GROUP BY 1, 2
"""

_OUT_SCHEMA = (
    "priority string, month date, level double, trend double, fitted double"
)


def holt_smooth(pdf: pd.DataFrame) -> pd.DataFrame:
    """One series: Holt recursion over month order.

    l_1 = y_1, b_1 = y_2 - y_1 (0 for singleton series); for t >= 2:
      fitted_t = l_{t-1} + b_{t-1}
      l_t = α·y_t + (1-α)·(l_{t-1} + b_{t-1})
      b_t = β·(l_t - l_{t-1}) + (1-β)·b_{t-1}
    """
    pdf = pdf.sort_values("month").reset_index(drop=True)
    # Arrow hands DECIMAL as objects; float() is correctly-rounded, the
    # same value as SQL CAST(demand AS DOUBLE).
    ys = [float(v) for v in pdf["demand"]]
    n = len(ys)
    levels = [0.0] * n
    trends = [0.0] * n
    fitted: list[float | None] = [None] * n
    l = ys[0]
    b = ys[1] - ys[0] if n > 1 else 0.0
    levels[0], trends[0] = l, b
    for t in range(1, n):
        f = l + b
        fitted[t] = f
        newl = ALPHA * ys[t] + (1.0 - ALPHA) * (l + b)
        newb = BETA * (newl - l) + (1.0 - BETA) * b
        l, b = newl, newb
        levels[t], trends[t] = l, b
    return pd.DataFrame(
        {
            "priority": pdf["priority"],
            "month": pdf["month"],
            "level": levels,
            "trend": trends,
            "fitted": pd.array(fitted, dtype="float64"),
        }
    )


@query(
    "m20_holt_smoothing",
    oracle=f"""
    WITH RECURSIVE monthly AS ({_MONTHLY_PRIO_SQL}),
    idx AS (
      SELECT priority, month, demand,
             row_number() OVER (PARTITION BY priority ORDER BY month) AS t
      FROM monthly
    ),
    hw(priority, t, l, b, fitted) AS (
      SELECT i1.priority, 1,
             CAST(i1.demand AS DOUBLE),
             COALESCE(CAST(i2.demand AS DOUBLE) - CAST(i1.demand AS DOUBLE), 0.0),
             CAST(NULL AS DOUBLE)
      FROM idx i1 LEFT JOIN idx i2 ON i1.priority = i2.priority AND i2.t = 2
      WHERE i1.t = 1
      UNION ALL
      SELECT hw.priority, hw.t + 1,
             {ALPHA} * CAST(i.demand AS DOUBLE) + {1.0 - ALPHA} * (hw.l + hw.b),
             {BETA} * (({ALPHA} * CAST(i.demand AS DOUBLE)
                        + {1.0 - ALPHA} * (hw.l + hw.b)) - hw.l)
               + {1.0 - BETA} * hw.b,
             hw.l + hw.b
      FROM hw JOIN idx i ON i.priority = hw.priority AND i.t = hw.t + 1
    )
    SELECT hw.priority AS priority, idx.month AS month,
           hw.l AS level, hw.b AS trend, hw.fitted AS fitted
    FROM hw JOIN idx ON idx.priority = hw.priority AND idx.t = hw.t
    """,
)
def m20_holt_smoothing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-priority monthly demand smoothed with Holt's linear trend.

    The oracle evaluates the identical recursion as a recursive CTE (one
    iteration advances every series by one step), so the comparison is a
    strict bit-level check of the smoothing recursion itself."""
    monthly = (
        tbl(spark, sf_dir, "orders")
        .groupBy(
            F.col("o_orderpriority").alias("priority"),
            F.trunc(F.to_date("o_orderdate"), "MM").alias("month"),
        )
        .agg(
            F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
            .cast("decimal(18,2)")
            .alias("demand")
        )
    )
    return monthly.groupBy("priority").applyInPandas(holt_smooth, _OUT_SCHEMA)


def _holt_sae(pdf: pd.DataFrame) -> pd.DataFrame:
    """Per series: sequentially-accumulated sum of |y - fitted| over the
    Holt recursion (same op order as the oracle's recursive CTE)."""
    if len(pdf) < 2:
        # Singleton series: no one-step-ahead fit exists.  The oracle's
        # recursive CTE drops these via WHERE hw.t > 1; emitting a
        # (sae=0, n_fit=0) row here would surface as a NULL-mae 0/0 row
        # the oracle doesn't have (round-4 ADVICE).
        return pd.DataFrame({"priority": [], "sae": [], "n_fit": []}).astype(
            {"priority": "object", "sae": "float64", "n_fit": "int64"}
        )
    out = holt_smooth(pdf).sort_values("month").reset_index(drop=True)
    ys = [float(v) for v in pdf.sort_values("month")["demand"]]
    sae = 0.0
    n_fit = 0
    for t in range(1, len(ys)):
        sae = sae + abs(ys[t] - float(out["fitted"][t]))
        n_fit += 1
    return pd.DataFrame(
        {"priority": [pdf["priority"].iloc[0]], "sae": [sae], "n_fit": [n_fit]}
    )


@query(
    "m22_backtest_leaderboard",
    oracle=f"""
    WITH RECURSIVE monthly AS ({_MONTHLY_PRIO_SQL}),
    idx AS (
      SELECT priority, month, demand,
             row_number() OVER (PARTITION BY priority ORDER BY month) AS t
      FROM monthly
    ),
    naive AS (
      SELECT priority, 'naive' AS model,
             CAST(COUNT(p) AS BIGINT) AS n,
             CAST(SUM(ABS(demand - p)) AS DOUBLE) / COUNT(p) AS mae
      FROM (SELECT priority, demand,
                   lag(demand) OVER (PARTITION BY priority ORDER BY month) AS p
            FROM idx)
      GROUP BY 1
      HAVING COUNT(p) > 0
    ),
    snaive AS (
      SELECT priority, 'seasonal_naive' AS model,
             CAST(COUNT(p) AS BIGINT) AS n,
             CAST(SUM(ABS(demand - p)) AS DOUBLE) / COUNT(p) AS mae
      FROM (SELECT priority, demand,
                   lag(demand, 12) OVER (PARTITION BY priority ORDER BY month) AS p
            FROM idx)
      GROUP BY 1
      HAVING COUNT(p) > 0
    ),
    hw(priority, t, l, b, sae) AS (
      SELECT i1.priority, 1,
             CAST(i1.demand AS DOUBLE),
             COALESCE(CAST(i2.demand AS DOUBLE) - CAST(i1.demand AS DOUBLE), 0.0),
             CAST(0.0 AS DOUBLE)
      FROM idx i1 LEFT JOIN idx i2 ON i1.priority = i2.priority AND i2.t = 2
      WHERE i1.t = 1
      UNION ALL
      SELECT hw.priority, hw.t + 1,
             {ALPHA} * CAST(i.demand AS DOUBLE) + {1.0 - ALPHA} * (hw.l + hw.b),
             {BETA} * (({ALPHA} * CAST(i.demand AS DOUBLE)
                        + {1.0 - ALPHA} * (hw.l + hw.b)) - hw.l)
               + {1.0 - BETA} * hw.b,
             hw.sae + abs(CAST(i.demand AS DOUBLE) - (hw.l + hw.b))
      FROM hw JOIN idx i ON i.priority = hw.priority AND i.t = hw.t + 1
    ),
    holt AS (
      SELECT hw.priority, 'holt' AS model,
             CAST(hw.t - 1 AS BIGINT) AS n,
             hw.sae / (hw.t - 1) AS mae
      FROM hw
      JOIN (SELECT priority, MAX(t) AS tmax FROM hw GROUP BY 1) last
        ON hw.priority = last.priority AND hw.t = last.tmax
      WHERE hw.t > 1
    )
    SELECT * FROM naive
    UNION ALL SELECT * FROM snaive
    UNION ALL SELECT * FROM holt
    """,
)
def m22_backtest_leaderboard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-step-ahead backtest MAE per (priority, model) for the three
    classical baselines: naive (lag-1), seasonal naive (lag-12), Holt
    linear trend.  Error sums are exact decimals for the lag models and
    a sequentially-accumulated double INSIDE the Holt recursion (same
    IEEE order as the oracle's recursive CTE), so the whole leaderboard
    is strict-hash comparable — the M14 metric spine generalized to a
    model-comparison table."""
    monthly = (
        tbl(spark, sf_dir, "orders")
        .groupBy(
            F.col("o_orderpriority").alias("priority"),
            F.trunc(F.to_date("o_orderdate"), "MM").alias("month"),
        )
        .agg(
            F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
            .cast("decimal(18,2)")
            .alias("demand")
        )
    )

    def lag_model(name: str, k: int) -> DataFrame:
        w = Window.partitionBy("priority").orderBy("month")
        scored = monthly.select(
            "priority", "demand", F.lag("demand", k).over(w).alias("p")
        ).filter(F.col("p").isNotNull())
        return scored.groupBy("priority").agg(
            F.lit(name).alias("model"),
            F.count("*").alias("n"),
            (
                F.sum(F.abs(F.col("demand") - F.col("p"))).cast("double")
                / F.count("*")
            ).alias("mae"),
        ).select("priority", "model", "n", "mae")

    holt = (
        monthly.groupBy("priority")
        .applyInPandas(_holt_sae, "priority string, sae double, n_fit long")
        .select(
            "priority",
            F.lit("holt").alias("model"),
            F.col("n_fit").alias("n"),
            (F.col("sae") / F.col("n_fit")).alias("mae"),
        )
    )
    return lag_model("naive", 1).unionByName(
        lag_model("seasonal_naive", 12)
    ).unionByName(holt)


@query(
    "pipeline_forecast_e2e",
    oracle="""
    WITH daily AS (
      SELECT CAST(o_orderdate AS DATE) AS d,
             CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT))
                  AS BIGINT) AS yc
      FROM orders GROUP BY 1
    ),
    bounds AS (SELECT MAX(d) AS hi FROM daily),
    scored AS (
      SELECT d, yc, lag(yc) OVER (ORDER BY d) AS pc
      FROM daily
    ),
    test AS (
      SELECT s.d, s.yc, s.pc
      FROM scored s, bounds b
      WHERE s.pc IS NOT NULL AND s.d > b.hi - 30
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_test,
           CAST(SUM(ABS(CAST(yc AS HUGEINT) - pc)) AS DOUBLE) / 100.0 / COUNT(*)
             AS mae,
           CAST(SUM(ABS(CAST(yc AS HUGEINT) - pc)) AS DOUBLE)
             / CAST(SUM(CAST(yc AS HUGEINT)) AS DOUBLE) AS wmape
    FROM test
    """,
)
def pipeline_forecast_e2e(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's evaluation workflow end to end in ONE declarative
    plan: aggregate the facts to the daily series, hold out the final
    30 days, score the walk-forward naive forecast, and report
    MAE/WMAPE on the holdout — integer-cents algebra throughout (the
    m14 contract), so the whole composition hash-matches strictly.
    Swap the naive scorer for m9/m10/m11 to reproduce the reference's
    model comparisons; the split boundary comes from one tiny MAX
    aggregate, never a global sort of the facts."""
    daily = (
        tbl(spark, sf_dir, "orders")
        .groupBy(F.to_date("o_orderdate").alias("d"))
        .agg(
            F.sum((F.col("o_totalprice").cast("decimal(18,2)") * 100).cast("long"))
            .cast("long")
            .alias("yc")
        )
    )
    # the split boundary is a broadcast 1-row aggregate joined into the
    # plan (never a driver collect: query construction launches zero
    # Spark jobs — round-6 rule)
    hi = daily.agg(F.max("d").alias("hi"))
    w = Window.orderBy("d")
    scored = (
        daily.select("d", "yc", F.lag("yc").over(w).alias("pc"))
        .crossJoin(F.broadcast(hi))
        .filter(
            F.col("pc").isNotNull() & (F.col("d") > F.date_sub(F.col("hi"), 30))
        )
    )
    ae = F.abs(F.col("yc").cast("decimal(19,0)") - F.col("pc"))
    return scored.agg(
        F.count("*").alias("n_test"),
        (F.sum(ae).cast("double") / F.lit(100.0) / F.count("*")).alias("mae"),
        (
            F.sum(ae).cast("double")
            / F.sum(F.col("yc").cast("decimal(19,0)")).cast("double")
        ).alias("wmape"),
    )


# --- Holt-Winters additive (triple exponential, seasonal state list) -----------------
GAMMA = 0.25  # seasonal smoothing — dyadic
PERIOD = 12   # monthly series, yearly seasonality

_HW_SCHEMA = (
    "priority string, month date, level double, trend double, "
    "seasonal double, fitted double"
)


def holt_winters_smooth(pdf: pd.DataFrame) -> pd.DataFrame:
    """One series: additive Holt-Winters for t > PERIOD.

    Init (simplified, documented): l₀ = exact-decimal mean of the first
    cycle (one division), b₀ = 0, sᵢ = yᵢ − l₀.  For t > m, with s1 the
    seasonal from t−m:
      fitted_t = (l + b) + s1
      l_t = α·(y_t − s1) + (1−α)·(l + b)
      b_t = β·(l_t − l) + (1−β)·b
      s_t = γ·(y_t − l_t) + (1−γ)·s1
    Every step is the same IEEE expression tree the recursive-CTE
    oracle evaluates, from identical decimal-cast starts."""
    from decimal import Decimal

    pdf = pdf.sort_values("month").reset_index(drop=True)
    ys = [float(v) for v in pdf["demand"]]
    n = len(ys)
    if n <= PERIOD:
        return pd.DataFrame(
            {c: [] for c in
             ("priority", "month", "level", "trend", "seasonal", "fitted")}
        )
    l0 = float(sum(Decimal(str(v)) for v in pdf["demand"][:PERIOD])) / PERIOD
    seas = [ys[i] - l0 for i in range(PERIOD)]
    l, b = l0, 0.0
    rows = []
    for t in range(PERIOD, n):
        s1 = seas[t - PERIOD]
        f = (l + b) + s1
        newl = ALPHA * (ys[t] - s1) + (1.0 - ALPHA) * (l + b)
        newb = BETA * (newl - l) + (1.0 - BETA) * b
        news = GAMMA * (ys[t] - newl) + (1.0 - GAMMA) * s1
        seas.append(news)
        l, b = newl, newb
        rows.append(
            (pdf["priority"][t], pdf["month"][t], l, b, news, f)
        )
    return pd.DataFrame(
        rows,
        columns=["priority", "month", "level", "trend", "seasonal", "fitted"],
    )


@query(
    "m26_holt_winters",
    oracle=f"""
    WITH RECURSIVE monthly AS ({_MONTHLY_PRIO_SQL}),
    idx AS (
      SELECT priority, month, demand,
             row_number() OVER (PARTITION BY priority ORDER BY month) AS t
      FROM monthly
    ),
    init AS (
      SELECT priority,
             CAST(SUM(demand) AS DOUBLE) / {PERIOD} AS l0,
             list(CAST(demand AS DOUBLE) ORDER BY t) AS y0
      FROM idx WHERE t <= {PERIOD}
      GROUP BY priority
      HAVING COUNT(*) = {PERIOD}
    ),
    hw(priority, t, l, b, seas, seasonal, fitted) AS (
      SELECT priority, {PERIOD}, l0, CAST(0.0 AS DOUBLE),
             list_transform(y0, y -> y - l0),
             CAST(NULL AS DOUBLE), CAST(NULL AS DOUBLE)
      FROM init
      UNION ALL
      SELECT hw.priority, hw.t + 1,
             {ALPHA} * (CAST(i.demand AS DOUBLE) - hw.seas[1])
               + {1.0 - ALPHA} * (hw.l + hw.b),
             {BETA} * (({ALPHA} * (CAST(i.demand AS DOUBLE) - hw.seas[1])
                        + {1.0 - ALPHA} * (hw.l + hw.b)) - hw.l)
               + {1.0 - BETA} * hw.b,
             list_concat(
               hw.seas[2:],
               [{GAMMA} * (CAST(i.demand AS DOUBLE)
                           - ({ALPHA} * (CAST(i.demand AS DOUBLE) - hw.seas[1])
                              + {1.0 - ALPHA} * (hw.l + hw.b)))
                + {1.0 - GAMMA} * hw.seas[1]]),
             {GAMMA} * (CAST(i.demand AS DOUBLE)
                        - ({ALPHA} * (CAST(i.demand AS DOUBLE) - hw.seas[1])
                           + {1.0 - ALPHA} * (hw.l + hw.b)))
               + {1.0 - GAMMA} * hw.seas[1],
             (hw.l + hw.b) + hw.seas[1]
      FROM hw JOIN idx i ON i.priority = hw.priority AND i.t = hw.t + 1
    )
    SELECT hw.priority AS priority, idx.month AS month,
           hw.l AS level, hw.b AS trend, hw.seasonal AS seasonal,
           hw.fitted AS fitted
    FROM hw JOIN idx ON idx.priority = hw.priority AND idx.t = hw.t
    WHERE hw.t > {PERIOD}
    """,
)
def m26_holt_winters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-priority monthly demand under ADDITIVE Holt-Winters (triple
    exponential — level, trend, yearly seasonal) — the classical
    seasonal-demand baseline one rung above Holt (m20).  Same grouped
    recursion shape (bounded series per group, millions of series at
    scale); the oracle carries the 12-slot seasonal STATE as a list in
    the recursive CTE, popped/pushed each step, so both engines run
    the identical IEEE sequence and the strict hash matches with no
    tolerance."""
    monthly = (
        tbl(spark, sf_dir, "orders")
        .groupBy(
            F.col("o_orderpriority").alias("priority"),
            F.trunc(F.to_date("o_orderdate"), "MM").alias("month"),
        )
        .agg(
            F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
            .cast("decimal(18,2)")
            .alias("demand")
        )
    )
    return monthly.groupBy("priority").applyInPandas(
        holt_winters_smooth, _HW_SCHEMA
    )


# --- CUSUM control chart (two-sided, exact-stat reference) ---------------------------
_DAILY_TYPE_SQL = """
      SELECT event_type,
             CAST(ts AS DATE) AS d,
             CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DECIMAL(18,2)) AS x
      FROM events GROUP BY 1, 2
"""

_CUSUM_SCHEMA = (
    "event_type string, d date, cplus double, cminus double, alert boolean"
)


def cusum_chart(pdf: pd.DataFrame) -> pd.DataFrame:
    """One series: two-sided CUSUM against the series' own exact mean.

    mu = exact-decimal sum / n (one division); slack k = mu/8 and
    alert threshold h = mu/2 are dyadic fractions of mu — data-derived
    yet single-op deterministic.  Recursion (same expression tree as
    the oracle):
      C⁺_t = max(0, C⁺_{t-1} + ((x_t − mu) − k))
      C⁻_t = max(0, C⁻_{t-1} + ((mu − x_t) − k))
      alert_t = C⁺_t > h OR C⁻_t > h
    """
    from decimal import Decimal

    pdf = pdf.sort_values("d").reset_index(drop=True)
    xs = [float(v) for v in pdf["x"]]
    n = len(xs)
    mu = float(sum(Decimal(str(v)) for v in pdf["x"])) / n
    k = mu / 8.0
    h = mu / 2.0
    cp, cm = 0.0, 0.0
    rows = []
    for t in range(n):
        cp = max(0.0, cp + ((xs[t] - mu) - k))
        cm = max(0.0, cm + ((mu - xs[t]) - k))
        rows.append(
            (pdf["event_type"][t], pdf["d"][t], cp, cm, cp > h or cm > h)
        )
    return pd.DataFrame(
        rows, columns=["event_type", "d", "cplus", "cminus", "alert"]
    )


@query(
    "ts_cusum_chart",
    oracle=f"""
    WITH RECURSIVE daily AS ({_DAILY_TYPE_SQL}),
    idx AS (
      SELECT event_type, d, x,
             row_number() OVER (PARTITION BY event_type ORDER BY d) AS t
      FROM daily
    ),
    stats AS (
      SELECT event_type, CAST(SUM(x) AS DOUBLE) / COUNT(*) AS mu
      FROM idx GROUP BY event_type
    ),
    cu(event_type, t, cplus, cminus) AS (
      SELECT i.event_type, 1,
             GREATEST(CAST(0.0 AS DOUBLE),
                      CAST(0.0 AS DOUBLE)
                      + ((CAST(i.x AS DOUBLE) - s.mu) - s.mu / 8.0)),
             GREATEST(CAST(0.0 AS DOUBLE),
                      CAST(0.0 AS DOUBLE)
                      + ((s.mu - CAST(i.x AS DOUBLE)) - s.mu / 8.0))
      FROM idx i JOIN stats s USING (event_type) WHERE i.t = 1
      UNION ALL
      SELECT cu.event_type, cu.t + 1,
             GREATEST(CAST(0.0 AS DOUBLE),
                      cu.cplus + ((CAST(i.x AS DOUBLE) - s.mu) - s.mu / 8.0)),
             GREATEST(CAST(0.0 AS DOUBLE),
                      cu.cminus + ((s.mu - CAST(i.x AS DOUBLE)) - s.mu / 8.0))
      FROM cu
      JOIN idx i ON i.event_type = cu.event_type AND i.t = cu.t + 1
      JOIN stats s ON s.event_type = cu.event_type
    )
    SELECT cu.event_type AS event_type, idx.d AS d,
           cu.cplus AS cplus, cu.cminus AS cminus,
           (cu.cplus > s.mu / 2.0 OR cu.cminus > s.mu / 2.0) AS alert
    FROM cu
    JOIN idx ON idx.event_type = cu.event_type AND idx.t = cu.t
    JOIN stats s ON s.event_type = cu.event_type
    """,
)
def ts_cusum_chart(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-sided CUSUM control chart per event_type over daily value
    totals — the sequential mean-shift detector (Page 1954) that
    catches drifts the pointwise z-score (ts_anomaly_zscore) misses.
    Grouped recursion like Holt/HW: bounded calendar series per key,
    embarrassingly parallel; mu/k/h derive from exact decimal sums by
    single IEEE ops, and the max-recursion is the identical expression
    tree as the recursive-CTE oracle, so the strict hash matches."""
    from ..session import ensure_utc

    ensure_utc(spark)
    daily = (
        tbl(spark, sf_dir, "events")
        .groupBy(
            "event_type", F.to_date("ts").alias("d")
        )
        .agg(
            F.sum(F.col("value").cast("decimal(18,2)"))
            .cast("decimal(18,2)")
            .alias("x")
        )
    )
    return daily.groupBy("event_type").applyInPandas(
        cusum_chart, _CUSUM_SCHEMA
    )


# --- Croston's method (intermittent demand) ------------------------------------------
CR_ALPHA = 0.25  # dyadic

_CROSTON_SCHEMA = (
    "part long, n_sales int, demand_est double, interval_est double, "
    "forecast double, sba_forecast double"
)

# Syntetos–Boylan Approximation (Syntetos & Boylan 2005, IJF 21:
# 303-314): Croston's z/p estimator is positively biased; the SBA
# deflates by (1 − α/2) — with the dyadic α = 1/4 the factor is
# EXACTLY 7/8, so sba = 0.875 * (z/p) is one extra correctly-rounded
# multiply, bit-identical across engines.
SBA_FACTOR = 1.0 - CR_ALPHA / 2.0


def _croston_one(ys: list[float], gaps: list[float]) -> tuple[float, float]:
    """Croston (1972) recursion for one part — smooth nonzero demand
    size and inter-demand interval SEPARATELY.  Init z₁ = y₁,
    p₁ = i₂ (first observed gap); for t ≥ 2:
      z_t = α·y_t + (1−α)·z, p_t = α·i_t + (1−α)·p.
    Same expression tree as the recursive-CTE oracle."""
    z = ys[0]
    p = gaps[0]
    for t in range(1, len(ys)):
        z = CR_ALPHA * ys[t] + (1.0 - CR_ALPHA) * z
        p = CR_ALPHA * gaps[t - 1] + (1.0 - CR_ALPHA) * p
    return z, p


def croston_fit_partition(
    pdfs,  # Iterator[pd.DataFrame] — one partition, sorted by (part, d)
):
    """mapInPandas kernel: fit EVERY part co-located in this partition
    with one Python call — per-GROUP applyInPandas paid ~20k
    interpreter/Arrow round-trips for catalog-sized part counts
    (measured 9.3s at sf0.1; this shape: ~1s).

    MEMORY CONTRACT: the caller sorts within partitions by (part, d),
    so each part's rows are CONTIGUOUS across the Arrow batch stream —
    batches are processed one at a time with only the boundary-
    straddling part carried over, keeping peak memory at
    O(batch + one part's series), never the whole partition."""

    def emit(g: pd.DataFrame, out: list) -> None:
        n = len(g)
        if n < 2:
            return
        ys = [float(v) for v in g["q"]]
        ds = list(g["d"])
        gaps = [float((ds[t] - ds[t - 1]).days) for t in range(1, n)]
        z, p = _croston_one(ys, gaps)
        f = z / p
        out.append((int(g["part"].iloc[0]), n, z, p, f, SBA_FACTOR * f))

    cols = [
        "part",
        "n_sales",
        "demand_est",
        "interval_est",
        "forecast",
        "sba_forecast",
    ]
    carry = None
    for pdf in pdfs:
        if not len(pdf):
            continue
        if carry is not None:
            pdf = pd.concat([carry, pdf], ignore_index=True)
            carry = None
        last_part = pdf["part"].iloc[-1]
        head = pdf[pdf["part"] != last_part]
        carry = pdf[pdf["part"] == last_part]
        out: list = []
        for _, g in head.groupby("part", sort=False):
            emit(g.sort_values("d"), out)
        if out:
            yield pd.DataFrame(out, columns=cols)
    if carry is not None and len(carry):
        out = []
        emit(carry.sort_values("d"), out)
        if out:
            yield pd.DataFrame(out, columns=cols)


@query(
    "m27_croston",
    oracle=f"""
    WITH RECURSIVE sales AS (
      SELECT l_partkey AS part, CAST(l_shipdate AS DATE) AS d,
             CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DECIMAL(18,2)) AS q
      FROM lineitem GROUP BY 1, 2
    ),
    idx AS (
      SELECT part, d, q,
             row_number() OVER (PARTITION BY part ORDER BY d) AS t,
             CAST(date_diff('day',
                            lag(d) OVER (PARTITION BY part ORDER BY d),
                            d) AS DOUBLE) AS gap
      FROM sales
    ),
    nmax AS (SELECT part, MAX(t) AS nt FROM idx GROUP BY part),
    cr(part, t, z, p) AS (
      SELECT i1.part, 1, CAST(i1.q AS DOUBLE), i2.gap
      FROM idx i1 JOIN idx i2 ON i2.part = i1.part AND i2.t = 2
      WHERE i1.t = 1
      UNION ALL
      SELECT cr.part, cr.t + 1,
             {CR_ALPHA} * CAST(i.q AS DOUBLE) + {1.0 - CR_ALPHA} * cr.z,
             {CR_ALPHA} * i.gap + {1.0 - CR_ALPHA} * cr.p
      FROM cr JOIN idx i ON i.part = cr.part AND i.t = cr.t + 1
    )
    SELECT CAST(cr.part AS BIGINT) AS part,
           CAST(nmax.nt AS INT) AS n_sales,
           cr.z AS demand_est,
           cr.p AS interval_est,
           cr.z / cr.p AS forecast,
           {SBA_FACTOR} * (cr.z / cr.p) AS sba_forecast
    FROM cr JOIN nmax ON nmax.part = cr.part AND nmax.nt = cr.t
    """,
)
def m27_croston(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Croston's intermittent-demand forecast per PART — the method of
    record when most periods have zero demand (spare parts, slow
    movers), completing the classical ladder naive → Holt (m20) → HW
    (m26) — plus the Syntetos–Boylan Approximation ``sba_forecast``
    (the (1−α/2)=7/8 bias deflation of z/p; see SBA_FACTOR).  Both
    recursions are pinned to hand-derived external goldens
    (tests/fixtures/croston_external_golden.json, r8).  The recursion advances only on SALE events, so the oracle
    CTE iterates max-sales-per-part times (≈50), not calendar length —
    the same trick that keeps per-part groups tiny at any corpus
    scale (millions of parts, dozens of sales each).  The Spark side
    hash-repartitions on part and fits a whole PARTITION of parts per
    Python call (mapInPandas) — per-group applyInPandas is quadratic
    in scheduling overhead once groups number in the tens of
    thousands."""
    sales = (
        tbl(spark, sf_dir, "lineitem")
        .groupBy(
            F.col("l_partkey").alias("part"),
            F.to_date("l_shipdate").alias("d"),
        )
        .agg(
            F.sum(F.col("l_quantity").cast("decimal(18,2)"))
            .cast("decimal(18,2)")
            .alias("q")
        )
    )
    return (
        sales.repartition("part")
        .sortWithinPartitions("part", "d")
        .mapInPandas(croston_fit_partition, _CROSTON_SCHEMA)
    )


# --- M29: Theta-method forecaster (Assimakopoulos & Nikolopoulos 2000) --------------
#
# The M3/M4-competition benchmark that completes the classical ladder
# between Holt (m20) and Holt-Winters (m26): decompose the series into
# the theta=0 line (the OLS linear trend) and the theta=2 line
# (z_t = 2·y_t − trend_t, curvature doubled), smooth the theta-2 line
# with SES (dyadic α=0.5), and combine — fitted_t = ½(trend_t + s_{t-1}).
#
# Cross-engine bit-exactness:
#  * the OLS (a, b) come from Cramer numerators/denominators over EXACT
#    BIGINT cents sums (the m21_degree_day_ols pattern) — one CAST +
#    one IEEE division each.  int64→double casts are correctly-rounded
#    identically on both engines (the 2^53 ban is for HUGEINT/DECIMAL38
#    casts, so the oracle re-CASTs every DuckDB sum to BIGINT).
#  * trend/z/SES are then the SAME IEEE op sequence both sides (Spark
#    column exprs + a per-series Python recursion ≡ the recursive CTE).
#  * range budget: Cramer numerators ≈ Σy_c·Σt² ≈ 3e16 at sf0.1 and
#    ~3e18 at sf10 — int64-safe through sf10; beyond, widen the sums to
#    DECIMAL(38,0) (documented, same note as the other cents algebras).
THETA_ALPHA = 0.5  # SES smoothing of the theta-2 line; dyadic

_THETA_SCHEMA = (
    "priority string, month date, trend_line double, theta2 double, "
    "ses_level double, fitted double"
)


def _theta_ses(pdf: pd.DataFrame) -> pd.DataFrame:
    """One series: SES over the (Spark-computed) theta-2 line plus the
    theta combination — the exact op order of the oracle's CTE."""
    pdf = pdf.sort_values("t").reset_index(drop=True)
    zs = [float(v) for v in pdf["z_c"]]
    trs = [float(v) for v in pdf["trend_c"]]
    n = len(zs)
    ses = [0.0] * n
    fitted: list[float | None] = [None] * n
    s = zs[0]
    ses[0] = s
    for t in range(1, n):
        fitted[t] = 0.5 * (trs[t] + s)
        s = THETA_ALPHA * zs[t] + (1.0 - THETA_ALPHA) * s
        ses[t] = s
    return pd.DataFrame(
        {
            "priority": pdf["priority"],
            "month": pdf["month"],
            "trend_line": [v / 100.0 for v in trs],
            "theta2": [v / 100.0 for v in zs],
            "ses_level": [v / 100.0 for v in ses],
            "fitted": pd.array(
                [None if f is None else f / 100.0 for f in fitted],
                dtype="float64",
            ),
        }
    )


@query(
    "m29_theta_forecast",
    oracle=f"""
    WITH RECURSIVE monthly AS (
      SELECT o_orderpriority AS priority,
             CAST(date_trunc('month', o_orderdate) AS DATE) AS month,
             CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2)))
                       AS DECIMAL(18,2)) * 100 AS BIGINT) AS y_c
      FROM orders GROUP BY 1, 2
    ),
    idx AS (
      SELECT priority, month, y_c,
             row_number() OVER (PARTITION BY priority ORDER BY month) AS t
      FROM monthly
    ),
    stats AS (
      SELECT priority,
             CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(t) AS BIGINT) AS st,
             CAST(SUM(t * t) AS BIGINT) AS stt,
             CAST(SUM(t * y_c) AS BIGINT) AS sty,
             CAST(SUM(y_c) AS BIGINT) AS sy
      FROM idx GROUP BY 1
    ),
    ab AS (
      SELECT priority,
             CAST(sy * stt - sty * st AS DOUBLE)
               / CAST(n * stt - st * st AS DOUBLE) AS a_c,
             CAST(n * sty - st * sy AS DOUBLE)
               / CAST(n * stt - st * st AS DOUBLE) AS b_c
      FROM stats
    ),
    zline AS (
      SELECT i.priority, i.month, i.t,
             ab.a_c + ab.b_c * CAST(i.t AS DOUBLE) AS trend_c,
             2.0 * CAST(i.y_c AS DOUBLE)
               - (ab.a_c + ab.b_c * CAST(i.t AS DOUBLE)) AS z_c
      FROM idx i JOIN ab USING (priority)
    ),
    ses(priority, t, s, fitted) AS (
      SELECT priority, CAST(1 AS BIGINT), z_c, CAST(NULL AS DOUBLE)
      FROM zline WHERE t = 1
      UNION ALL
      SELECT z.priority, ses.t + 1,
             {THETA_ALPHA} * z.z_c + {1.0 - THETA_ALPHA} * ses.s,
             0.5 * (z.trend_c + ses.s)
      FROM ses JOIN zline z ON z.priority = ses.priority AND z.t = ses.t + 1
    )
    SELECT z.priority AS priority, z.month AS month,
           z.trend_c / 100.0 AS trend_line,
           z.z_c / 100.0 AS theta2,
           ses.s / 100.0 AS ses_level,
           ses.fitted / 100.0 AS fitted
    FROM ses JOIN zline z ON z.priority = ses.priority AND z.t = ses.t
    """,
)
def m29_theta_forecast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theta-method decomposition forecast per priority series (see the
    block comment for the algebra and the bit-exactness contract).  The
    OLS stats are one exact-integer aggregate; the trend/theta-2 lines
    are Catalyst column expressions; only the SES recursion rides
    applyInPandas (bounded calendar-length groups)."""
    monthly = (
        tbl(spark, sf_dir, "orders")
        .groupBy(
            F.col("o_orderpriority").alias("priority"),
            F.trunc(F.to_date("o_orderdate"), "MM").alias("month"),
        )
        .agg(
            (
                F.sum(F.col("o_totalprice").cast("decimal(18,2)")).cast(
                    "decimal(18,2)"
                )
                * 100
            )
            .cast("long")
            .alias("y_c")
        )
    )
    idx = monthly.withColumn(
        "t",
        F.row_number().over(Window.partitionBy("priority").orderBy("month")),
    ).withColumn("t", F.col("t").cast("long"))
    stats = idx.groupBy("priority").agg(
        F.count("*").cast("long").alias("n"),
        F.sum("t").alias("st"),
        F.sum(F.col("t") * F.col("t")).alias("stt"),
        F.sum(F.col("t") * F.col("y_c")).alias("sty"),
        F.sum("y_c").alias("sy"),
    )
    den = (F.col("n") * F.col("stt") - F.col("st") * F.col("st")).cast("double")
    ab = stats.select(
        "priority",
        (
            (F.col("sy") * F.col("stt") - F.col("sty") * F.col("st")).cast(
                "double"
            )
            / den
        ).alias("a_c"),
        (
            (F.col("n") * F.col("sty") - F.col("st") * F.col("sy")).cast(
                "double"
            )
            / den
        ).alias("b_c"),
    )
    trend = F.col("a_c") + F.col("b_c") * F.col("t").cast("double")
    zline = idx.join(F.broadcast(ab), "priority").select(
        "priority",
        "month",
        "t",
        trend.alias("trend_c"),
        (F.lit(2.0) * F.col("y_c").cast("double") - trend).alias("z_c"),
    )
    return zline.groupBy("priority").applyInPandas(_theta_ses, _THETA_SCHEMA)
