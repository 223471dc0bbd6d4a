"""Data-quality operators: rolling z-score anomaly flags + table profiling.

``ts_anomaly_zscore`` is the monitoring query an energy-demand stack
runs continuously: each day scored against its own 31-day centered
window.  The z statistic is algebraically rearranged so every
intermediate is an exact integer —

    z = (n·x − S1) / sqrt(n·S2 − S1²)        (≡ (x − μ)/σ, σ = pop. std)

with x in cents, S1 = Σx, S2 = Σx² over the window.  The only float ops
are one cast, one sqrt, one division — identical IEEE sequence on both
engines, so the oracle hash is strict.  (S2 fits 64-bit up to the bench
SF; Spark carries it in DECIMAL(38,0) and DuckDB in HUGEINT so the
exactness headroom is 1e38 either way.)

``profile_documents`` is the one-pass column profiler (null rate,
distinct count, min/max) every ingestion gate runs before accepting a
drop of new data.  Single scan: all 5 columns' aggregates in ONE agg
(Spark plans multi-distinct via expand), then an unpivot to one row per
column.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from . import query
from ._util import shared_plan, tbl

_DAILY_CENTS_SQL = """
      SELECT CAST(o_orderdate AS DATE) AS d,
             CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT))
                  AS BIGINT) AS xc
      FROM orders GROUP BY 1
"""

WINDOW_N = 31
Z_FLAG = 2.0


@query(
    "ts_anomaly_zscore",
    oracle=f"""
    WITH daily AS ({_DAILY_CENTS_SQL}),
    win AS (
      SELECT d, xc,
             COUNT(*) OVER w AS n,
             SUM(CAST(xc AS HUGEINT)) OVER w AS s1,
             SUM(CAST(xc AS HUGEINT) * CAST(xc AS HUGEINT)) OVER w AS s2
      FROM daily
      WINDOW w AS (ORDER BY d ROWS BETWEEN 15 PRECEDING AND 15 FOLLOWING)
    ),
    full_win AS (
      SELECT d, xc, s1, s2,
             CAST({WINDOW_N} * xc - s1 AS DOUBLE) AS num,
             CAST({WINDOW_N} * s2 - s1 * s1 AS DOUBLE) AS den2
      FROM win WHERE n = {WINDOW_N}
    )
    SELECT d, CAST(xc AS DOUBLE) / 100.0 AS demand,
           num / sqrt(den2) AS z,
           CASE WHEN abs(num / sqrt(den2)) > {Z_FLAG} THEN TRUE ELSE FALSE END
             AS is_anomaly
    FROM full_win WHERE den2 > 0
    """,
)
def ts_anomaly_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily demand scored against its 31-day centered window; full
    windows only (statsmodels-style NaN edges dropped).

    The global date-ordered window is bounded by the calendar (one row
    per day after the pre-aggregation), the same justified shape as
    m7/j3 — the heavy table was already reduced by the groupBy."""
    daily = (
        tbl(spark, sf_dir, "orders")
        .groupBy(F.to_date("o_orderdate").alias("d"))
        .agg(
            F.sum((F.col("o_totalprice").cast("decimal(18,2)") * 100).cast("long"))
            .cast("long")
            .alias("xc")
        )
    )
    w = Window.orderBy("d").rowsBetween(-15, 15)
    xd = F.col("xc").cast("decimal(19,0)")
    win = daily.select(
        "d",
        "xc",
        F.count("*").over(w).alias("n"),
        F.sum(xd).over(w).alias("s1"),
        F.sum(xd * xd).over(w).alias("s2"),
    ).filter(F.col("n") == WINDOW_N)
    num = (F.lit(WINDOW_N) * F.col("xc") - F.col("s1")).cast("double")
    den2 = (F.lit(WINDOW_N) * F.col("s2") - F.col("s1") * F.col("s1")).cast(
        "double"
    )
    z = num / F.sqrt(den2)
    return (
        win.filter(den2 > 0)
        .select(
            "d",
            (F.col("xc").cast("double") / F.lit(100.0)).alias("demand"),
            z.alias("z"),
            (F.abs(z) > Z_FLAG).alias("is_anomaly"),
        )
    )


_PROFILE_COLS = ["doc_id", "text", "lang", "source", "n_chars"]


@query(
    "profile_documents",
    oracle="""
    SELECT * FROM (
    """
    + "\nUNION ALL\n".join(
        f"""
      SELECT '{c}' AS col_name,
             CAST(COUNT(*) AS BIGINT) AS n_rows,
             CAST(COUNT(*) - COUNT({c}) AS BIGINT) AS n_null,
             CAST(COUNT(DISTINCT {c}) AS BIGINT) AS n_distinct,
             substr(CAST(MIN({c}) AS VARCHAR), 1, 32) AS min_val,
             substr(CAST(MAX({c}) AS VARCHAR), 1, 32) AS max_val
      FROM documents
    """
        for c in _PROFILE_COLS
    )
    + ")",
)
def profile_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Column profile of the documents table in one scan: the aggregates
    for all columns are computed in a single ``agg`` and unpivoted with
    ``stack`` — at 100 TB this is one pass over the data, not one scan
    per column (the oracle's UNION ALL form is for clarity; DuckDB CSE
    merges the scans anyway)."""
    d = tbl(spark, sf_dir, "documents")
    aggs = []
    for c in _PROFILE_COLS:
        aggs += [
            F.count("*").alias(f"{c}__rows"),
            (F.count("*") - F.count(c)).alias(f"{c}__null"),
            F.countDistinct(c).alias(f"{c}__distinct"),
            F.substring(F.min(c).cast("string"), 1, 32).alias(f"{c}__min"),
            F.substring(F.max(c).cast("string"), 1, 32).alias(f"{c}__max"),
        ]
    one = d.agg(*aggs)
    stack_args = ", ".join(
        f"'{c}', {c}__rows, {c}__null, {c}__distinct, {c}__min, {c}__max"
        for c in _PROFILE_COLS
    )
    return one.select(
        F.expr(
            f"stack({len(_PROFILE_COLS)}, {stack_args}) AS "
            "(col_name, n_rows, n_null, n_distinct, min_val, max_val)"
        )
    )


# --- sweep-line interval concurrency ------------------------------------------------
@query(
    "w_concurrency_sweep",
    oracle="""
    WITH iv AS (
      SELECT CAST(o_orderdate AS DATE) AS s,
             CAST(o_orderdate AS DATE) + 7 AS e
      FROM orders
    ),
    deltas AS (
      SELECT s AS d, CAST(COUNT(*) AS BIGINT) AS delta FROM iv GROUP BY 1
      UNION ALL
      SELECT e AS d, -CAST(COUNT(*) AS BIGINT) AS delta FROM iv GROUP BY 1
    ),
    daily AS (
      SELECT d, CAST(SUM(delta) AS BIGINT) AS delta FROM deltas GROUP BY 1
    )
    SELECT d,
           CAST(SUM(delta) OVER (ORDER BY d
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
             AS n_open
    FROM daily
    """,
)
def w_concurrency_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """How many orders are 'open' each day, treating every order as a
    [orderdate, orderdate+7d) interval — the sweep-line algorithm:
    ±1 deltas at interval endpoints, aggregate per day, prefix-sum over
    the calendar.  The naive form (interval × day-grid join) is
    O(rows × span); this is one hash agg plus a prefix sum over the
    BOUNDED calendar spine — the same shape at any table size, which is
    why sweep-line is the interval-analytics primitive at 100 TB.  The
    calendar-bounded global window follows the m7/j3 justification."""
    iv = tbl(spark, sf_dir, "orders").select(
        F.to_date("o_orderdate").alias("s"),
        F.date_add(F.to_date("o_orderdate"), 7).alias("e"),
    )
    deltas = (
        iv.groupBy(F.col("s").alias("d"))
        .agg(F.count("*").alias("delta"))
        .union(
            iv.groupBy(F.col("e").alias("d")).agg(
                (-F.count("*")).alias("delta")
            )
        )
    )
    daily = deltas.groupBy("d").agg(F.sum("delta").alias("delta"))
    w = Window.orderBy("d").rowsBetween(Window.unboundedPreceding, 0)
    return daily.select(
        "d", F.sum("delta").over(w).cast("long").alias("n_open")
    )


# --- calendar gap detection ---------------------------------------------------------
@query(
    "ts_missing_days",
    oracle="""
    WITH daily AS (
      SELECT o_orderpriority AS priority, CAST(o_orderdate AS DATE) AS d
      FROM orders GROUP BY 1, 2
    ),
    bounds AS (
      SELECT priority, MIN(d) AS lo, MAX(d) AS hi FROM daily GROUP BY 1
    ),
    spine AS (
      SELECT priority, UNNEST(generate_series(lo, hi, INTERVAL 1 DAY))::DATE AS d
      FROM bounds
    )
    SELECT s.priority AS priority, s.d AS d
    FROM spine s LEFT JOIN daily USING (priority, d)
    WHERE daily.d IS NULL
    """,
)
def ts_missing_days(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Days absent from each series between its own first and last
    observation — the backfill worklist every ingestion pipeline needs
    before gap-fill windows run.  Calendar spine via F.sequence over
    per-series bounds (row-local expansion, bounded by the calendar),
    then an anti-join against the observed days."""
    daily = (
        tbl(spark, sf_dir, "orders")
        .select(
            F.col("o_orderpriority").alias("priority"),
            F.to_date("o_orderdate").alias("d"),
        )
        .distinct()
    )
    spine = (
        daily.groupBy("priority")
        .agg(F.min("d").alias("lo"), F.max("d").alias("hi"))
        .select(
            "priority",
            F.explode(
                F.sequence("lo", "hi", F.expr("INTERVAL 1 DAY"))
            ).alias("d"),
        )
    )
    return spine.join(daily, ["priority", "d"], "left_anti")


# --- exact rolling median -----------------------------------------------------------
@query(
    "w_rolling_median7",
    oracle=f"""
    WITH daily AS ({_DAILY_CENTS_SQL}),
    win AS (
      SELECT d, xc,
             COUNT(*) OVER w AS n,
             CAST(median(xc) OVER w AS DOUBLE) AS med_c
      FROM daily
      WINDOW w AS (ORDER BY d ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)
    )
    SELECT d, CAST(xc AS DOUBLE) / 100.0 AS demand,
           med_c / 100.0 AS rolling_median
    FROM win WHERE n = 7
    """,
)
def w_rolling_median7(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing 7-day exact rolling MEDIAN of daily demand — the robust
    smoother a mean-based window can't provide.  Exactness: the window
    values are integer cents collected into a bounded (7-element)
    array, sorted, and the median read positionally — odd window, so it
    is ONE exact integer; both engines then do the identical /100.0.
    The per-row array is bounded by the frame, so this stays row-local
    work over the calendar-bounded daily series."""
    daily = (
        tbl(spark, sf_dir, "orders")
        .groupBy(F.to_date("o_orderdate").alias("d"))
        .agg(
            F.sum((F.col("o_totalprice").cast("decimal(18,2)") * 100).cast("long"))
            .cast("long")
            .alias("xc")
        )
    )
    w = Window.orderBy("d").rowsBetween(-6, 0)
    arr = F.array_sort(F.collect_list("xc").over(w))
    return (
        daily.select(
            "d",
            "xc",
            F.count("*").over(w).alias("n"),
            F.element_at(arr, 4).alias("med_c"),
        )
        .filter(F.col("n") == 7)
        .select(
            "d",
            (F.col("xc").cast("double") / F.lit(100.0)).alias("demand"),
            (F.col("med_c").cast("double") / F.lit(100.0)).alias("rolling_median"),
        )
    )


# --- rolling correlation (exact-integer algebra) ------------------------------------
_DAILY_XY_SQL = """
      SELECT CAST(o_orderdate AS DATE) AS d,
             CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT))
                  AS BIGINT) AS xc,
             CAST(COUNT(*) AS BIGINT) AS yc
      FROM orders GROUP BY 1
"""


@query(
    "w_rolling_corr31",
    oracle=f"""
    WITH daily AS ({_DAILY_XY_SQL}),
    win AS (
      SELECT d,
             COUNT(*) OVER w AS n,
             SUM(CAST(xc AS HUGEINT)) OVER w AS sx,
             SUM(CAST(yc AS HUGEINT)) OVER w AS sy,
             SUM(CAST(xc AS HUGEINT) * CAST(xc AS HUGEINT)) OVER w AS sxx,
             SUM(CAST(yc AS HUGEINT) * CAST(yc AS HUGEINT)) OVER w AS syy,
             SUM(CAST(xc AS HUGEINT) * CAST(yc AS HUGEINT)) OVER w AS sxy
      FROM daily
      WINDOW w AS (ORDER BY d ROWS BETWEEN 30 PRECEDING AND CURRENT ROW)
    )
    SELECT d,
           CAST(31 * sxy - sx * sy AS DOUBLE)
             / (sqrt(CAST(31 * sxx - sx * sx AS DOUBLE))
                * sqrt(CAST(31 * syy - sy * sy AS DOUBLE))) AS corr31
    FROM win
    WHERE n = 31 AND (31 * sxx - sx * sx) > 0 AND (31 * syy - sy * sy) > 0
    """,
)
def w_rolling_corr31(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing 31-day Pearson correlation between daily demand (cents)
    and daily order count — rearranged to exact integer sums with three
    float ops at the end (cast, two sqrts, divide), identical on both
    engines.  The same contract as ts_anomaly_zscore extended to a
    bivariate statistic."""
    daily = (
        tbl(spark, sf_dir, "orders")
        .groupBy(F.to_date("o_orderdate").alias("d"))
        .agg(
            F.sum((F.col("o_totalprice").cast("decimal(18,2)") * 100).cast("long"))
            .cast("long")
            .alias("xc"),
            F.count("*").alias("yc"),
        )
    )
    w = Window.orderBy("d").rowsBetween(-30, 0)
    xd = F.col("xc").cast("decimal(19,0)")
    yd = F.col("yc").cast("decimal(19,0)")
    win = daily.select(
        "d",
        F.count("*").over(w).alias("n"),
        F.sum(xd).over(w).alias("sx"),
        F.sum(yd).over(w).alias("sy"),
        F.sum(xd * xd).over(w).alias("sxx"),
        F.sum(yd * yd).over(w).alias("syy"),
        F.sum(xd * yd).over(w).alias("sxy"),
    ).filter(F.col("n") == 31)
    cxx = F.lit(31) * F.col("sxx") - F.col("sx") * F.col("sx")
    cyy = F.lit(31) * F.col("syy") - F.col("sy") * F.col("sy")
    cxy = F.lit(31) * F.col("sxy") - F.col("sx") * F.col("sy")
    return (
        win.filter((cxx > 0) & (cyy > 0))
        .select(
            "d",
            (
                cxy.cast("double")
                / (F.sqrt(cxx.cast("double")) * F.sqrt(cyy.cast("double")))
            ).alias("corr31"),
        )
    )


# --- data-contract validation (expectations) ----------------------------------------
@query(
    "dq_expectations",
    oracle="""
    SELECT 'orders.o_orderkey.not_null' AS check_name,
           CAST((SELECT COUNT(*) FROM orders WHERE o_orderkey IS NULL) AS BIGINT)
             AS n_violations
    UNION ALL
    SELECT 'orders.o_orderkey.unique',
           CAST((SELECT COUNT(*) FROM (
              SELECT o_orderkey FROM orders GROUP BY 1 HAVING COUNT(*) > 1
           )) AS BIGINT)
    UNION ALL
    SELECT 'orders.o_totalprice.non_negative',
           CAST((SELECT COUNT(*) FROM orders WHERE o_totalprice < 0) AS BIGINT)
    UNION ALL
    SELECT 'lineitem.l_orderkey.ref_orders',
           CAST((SELECT COUNT(*) FROM lineitem l
                 WHERE NOT EXISTS (SELECT 1 FROM orders o
                                   WHERE o.o_orderkey = l.l_orderkey)) AS BIGINT)
    UNION ALL
    SELECT 'lineitem.l_quantity.range_1_50',
           CAST((SELECT COUNT(*) FROM lineitem
                 WHERE l_quantity < 1 OR l_quantity > 50) AS BIGINT)
    """,
)
def dq_expectations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Expectations-style data-contract validation: each check reports
    its violation count (0 = contract holds) — not-null, uniqueness,
    value range, and a referential check (orphan lineitems via a
    LEFT-ANTI join, never a correlated subquery per row).  This is the
    ingestion gate that runs BEFORE data enters the lakehouse; every
    check is one aggregate or one anti-join, all map-side-combinable."""
    orders = tbl(spark, sf_dir, "orders")
    lineitem = tbl(spark, sf_dir, "lineitem")

    def one(name: str, cnt) -> DataFrame:
        return cnt.select(
            F.lit(name).alias("check_name"),
            F.col("n").cast("long").alias("n_violations"),
        )

    checks = [
        one(
            "orders.o_orderkey.not_null",
            orders.filter(F.col("o_orderkey").isNull()).agg(
                F.count("*").alias("n")
            ),
        ),
        one(
            "orders.o_orderkey.unique",
            orders.groupBy("o_orderkey")
            .agg(F.count("*").alias("c"))
            .filter(F.col("c") > 1)
            .agg(F.count("*").alias("n")),
        ),
        one(
            "orders.o_totalprice.non_negative",
            orders.filter(F.col("o_totalprice") < 0).agg(F.count("*").alias("n")),
        ),
        one(
            "lineitem.l_orderkey.ref_orders",
            lineitem.join(
                orders.select("o_orderkey"),
                lineitem.l_orderkey == F.col("o_orderkey"),
                "left_anti",
            ).agg(F.count("*").alias("n")),
        ),
        one(
            "lineitem.l_quantity.range_1_50",
            lineitem.filter(
                (F.col("l_quantity") < 1) | (F.col("l_quantity") > 50)
            ).agg(F.count("*").alias("n")),
        ),
    ]
    out = checks[0]
    for c in checks[1:]:
        out = out.unionByName(c)
    return out


# --- two-sample chi-square drift detection ------------------------------------------
@query(
    "dq_drift_chi2",
    oracle="""
    WITH binned AS (
      SELECT CAST(n_chars // 50 AS BIGINT) AS bin,
             CAST(doc_id % 2 AS BIGINT) AS slice
      FROM documents
    ),
    cells AS (
      SELECT bin,
             CAST(COUNT(*) FILTER (slice = 0) AS BIGINT) AS o0,
             CAST(COUNT(*) FILTER (slice = 1) AS BIGINT) AS o1
      FROM binned GROUP BY bin
    ),
    tot AS (
      SELECT CAST(SUM(o0) AS BIGINT) AS t0, CAST(SUM(o1) AS BIGINT) AS t1
      FROM cells
    )
    SELECT bin, o0, o1,
           -- chi2 contribution of this bin, both slices, as ONE double
           -- expression over exact integers: sum_s (o_s - e_s)^2/e_s
           -- with e_s = rowtot*t_s/grand; multiplied out so numerator
           -- and denominator are BIGINT products.
           CAST((o0 * (t0 + t1) - (o0 + o1) * t0)
                * (o0 * (t0 + t1) - (o0 + o1) * t0) AS DOUBLE)
             / CAST((o0 + o1) * t0 * (t0 + t1) AS DOUBLE)
           + CAST((o1 * (t0 + t1) - (o0 + o1) * t1)
                  * (o1 * (t0 + t1) - (o0 + o1) * t1) AS DOUBLE)
             / CAST((o0 + o1) * t1 * (t0 + t1) AS DOUBLE) AS chi2_bin
    FROM cells CROSS JOIN tot
    """,
)
def dq_drift_chi2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-sample chi-square drift check between two corpus slices
    (here: doc_id parity standing in for "yesterday vs today"), binned
    on document length — the monitoring query a production pipeline
    runs per ingest drop to catch distribution shift before training.

    Exactness: expected counts e = rowtot*coltot/grand are RATIONAL, so
    each bin's (o-e)^2/e is multiplied out to a ratio of BIGINT
    products and evaluated as two double divisions + one add in fixed
    order — no double SUM() whose accumulation order an engine picks.
    Per-bin rows (not a global statistic) keep it that way AND give the
    analyst the which-bin-drifted answer a scalar chi2 hides.  One
    groupBy + a broadcast 1-row totals join; scales as a count."""
    binned = tbl(spark, sf_dir, "documents").select(
        F.floor(F.col("n_chars") / 50).cast("long").alias("bin"),
        (F.col("doc_id") % 2).cast("long").alias("slice"),
    )
    cells = binned.groupBy("bin").agg(
        F.sum(F.when(F.col("slice") == 0, 1).otherwise(0))
        .cast("long")
        .alias("o0"),
        F.sum(F.when(F.col("slice") == 1, 1).otherwise(0))
        .cast("long")
        .alias("o1"),
    )
    tot = cells.agg(
        F.sum("o0").cast("long").alias("t0"), F.sum("o1").cast("long").alias("t1")
    )
    j = cells.crossJoin(F.broadcast(tot))
    grand = F.col("t0") + F.col("t1")
    rowtot = F.col("o0") + F.col("o1")
    d0 = F.col("o0") * grand - rowtot * F.col("t0")
    d1 = F.col("o1") * grand - rowtot * F.col("t1")
    chi2 = (d0 * d0).cast("double") / (rowtot * F.col("t0") * grand).cast(
        "double"
    ) + (d1 * d1).cast("double") / (rowtot * F.col("t1") * grand).cast("double")
    return j.select("bin", "o0", "o1", chi2.alias("chi2_bin"))


# --- lead-lag cross-correlation -----------------------------------------------------
@query(
    "ts_cross_correlation",
    oracle="""
    WITH o AS (
      SELECT CAST(ts AS DATE) AS d,
             CAST(SUM(CAST(value AS DECIMAL(18,2)) * 100) AS BIGINT) AS xc
      FROM events WHERE event_type = 'view' GROUP BY 1
    ),
    e AS (
      SELECT CAST(ts AS DATE) AS d,
             CAST(SUM(CAST(value AS DECIMAL(18,2)) * 100) AS BIGINT) AS yc
      FROM events WHERE event_type = 'purchase' GROUP BY 1
    ),
    lags AS (SELECT unnest(range(-7, 8)) AS lag),
    aligned AS (
      SELECT lag, xc, yc
      FROM lags, o JOIN e ON e.d = o.d + CAST(lag || ' days' AS INTERVAL)
    ),
    stats AS (
      SELECT lag, COUNT(*) AS n,
             CAST(SUM(CAST(xc AS HUGEINT)) AS DOUBLE) AS sx,
             CAST(SUM(CAST(yc AS HUGEINT)) AS DOUBLE) AS sy,
             CAST(SUM(CAST(xc AS HUGEINT) * CAST(yc AS HUGEINT)) AS DOUBLE) AS sxy,
             CAST(SUM(CAST(xc AS HUGEINT) * CAST(xc AS HUGEINT)) AS DOUBLE) AS sxx,
             CAST(SUM(CAST(yc AS HUGEINT) * CAST(yc AS HUGEINT)) AS DOUBLE) AS syy
      FROM aligned GROUP BY lag
    )
    SELECT CAST(lag AS INT) AS lag, CAST(n AS BIGINT) AS n,
           (n * sxy - sx * sy)
             / (sqrt(n * sxx - sx * sx) * sqrt(n * syy - sy * sy)) AS r
    FROM stats WHERE n >= 2
    """,
)
def ts_cross_correlation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lead-lag detection between two daily series (view value vs
    purchase value): Pearson r at every alignment offset in ±7 days —
    the "does demand lead consumption?" question the reference's
    analysis notebooks ask of weather vs load.  Exact-integer cents feed the
    moment sums, so both engines aggregate identical BIGINTs and the r
    formula is one shared IEEE sequence (the cross-engine float rule).

    Plan: two calendar-bounded pre-aggregations, a 15-row lag grid
    cross join against one side, an equi-join on the shifted date, and
    a per-lag moment aggregation — every join key is (date, lag), no
    window over raw data, corpus-size-independent state."""
    ev = tbl(spark, sf_dir, "events")
    o = (
        ev.filter(F.col("event_type") == "view")
        .groupBy(F.to_date("ts").alias("d"))
        .agg(
            F.sum(F.col("value").cast("decimal(18,2)") * 100)
            .cast("long")
            .alias("xc")
        )
    )
    e = (
        ev.filter(F.col("event_type") == "purchase")
        .groupBy(F.to_date("ts").alias("d"))
        .agg(
            F.sum(F.col("value").cast("decimal(18,2)") * 100)
            .cast("long")
            .alias("yc")
        )
    )
    lags = spark.range(-7, 8).select(F.col("id").cast("int").alias("lag"))
    aligned = (
        o.crossJoin(F.broadcast(lags))
        .join(
            e.select(F.col("d").alias("ed"), "yc"),
            F.col("ed") == F.date_add(F.col("d"), F.col("lag")),
        )
    )
    # Moment sums ride DECIMAL(38,0) (DuckDB: HUGEINT) — int64 products
    # of cent totals can overflow LongType, which Spark wraps silently
    # under non-ANSI while DuckDB raises. Same pattern as the rolling
    # correlation above: exact integers in, one double division out.
    xw = F.col("xc").cast("decimal(19,0)")
    yw = F.col("yc").cast("decimal(19,0)")
    stats = aligned.groupBy("lag").agg(
        F.count("*").alias("n"),
        F.sum(xw).cast("double").alias("sx"),
        F.sum(yw).cast("double").alias("sy"),
        F.sum(xw * yw).cast("double").alias("sxy"),
        F.sum(xw * xw).cast("double").alias("sxx"),
        F.sum(yw * yw).cast("double").alias("syy"),
    )
    n = F.col("n")
    r = (n * F.col("sxy") - F.col("sx") * F.col("sy")) / (
        F.sqrt(n * F.col("sxx") - F.col("sx") * F.col("sx"))
        * F.sqrt(n * F.col("syy") - F.col("sy") * F.col("sy"))
    )
    return stats.filter(n >= 2).select("lag", "n", r.alias("r"))


# --- Benford first-digit profile ------------------------------------------------------
@query(
    "dq_benford_digits",
    oracle="""
    WITH digits AS (
      SELECT CAST(substr(CAST(CAST(o_totalprice * 100 AS BIGINT) AS VARCHAR),
                         1, 1) AS INT) AS d
      FROM orders WHERE o_totalprice > 0
    )
    SELECT d AS first_digit,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST((1000000 * COUNT(*))
                // (SELECT COUNT(*) FROM digits) AS BIGINT) AS share_ppm
    FROM digits GROUP BY d
    """,
)
def dq_benford_digits(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benford's-law first-digit profile of order amounts — the
    classic fraud/synthetic-data screen (a manufactured amount column
    shows a flat profile where organic data follows log10(1+1/d)).
    The digit comes from the CENTS integer's decimal rendering (no
    float log10 — libm implementations differ across engines), and the
    share is exact integer ppm.  One scan + a 9-row agg; the expected
    Benford curve is a constant table the consumer compares against,
    deliberately NOT computed here (it needs log10)."""
    o = tbl(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 0)
    digits = o.select(
        F.substring(
            (F.col("o_totalprice").cast("decimal(18,2)") * 100)
            .cast("long")
            .cast("string"),
            1,
            1,
        )
        .cast("int")
        .alias("d")
    )
    # r8: the grand total rides the plan as a broadcast 1-row aggregate
    # (pmod attach, construction launches no job) instead of a driver
    # count baked into the expression
    total = digits.agg(F.count("*").alias("__tot")).withColumn(
        "_k", F.pmod(F.col("__tot"), F.lit(1))
    )
    return (
        digits.groupBy(F.col("d").alias("first_digit"))
        .agg(F.count("*").alias("n"))
        .withColumn("_k", F.pmod(F.col("n"), F.lit(1)))
        .join(F.broadcast(total), "_k")
        .select(
            "first_digit",
            "n",
            # exact integer div — a double division + cast could
            # truncate across a boundary the exact floor sits under
            F.expr("CAST((1000000 * n) div __tot AS BIGINT)").alias(
                "share_ppm"
            ),
        )
    )


# --- join/groupBy key-skew diagnosis --------------------------------------------------
@query(
    "dq_key_skew",
    oracle="""
    WITH per_key AS (
      SELECT o_custkey, CAST(COUNT(*) AS BIGINT) AS n
      FROM orders GROUP BY 1
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_keys,
           CAST(SUM(n) AS BIGINT) AS n_rows,
           CAST(MAX(n) AS BIGINT) AS max_n,
           quantile_cont(n, 0.5) AS p50,
           quantile_cont(n, 0.9) AS p90,
           quantile_cont(n, 0.99) AS p99,
           CAST((1000000 * MAX(n) * COUNT(*)) // SUM(n) AS BIGINT)
             AS max_over_mean_ppm
    FROM per_key
    """,
)
def dq_key_skew(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Key-skew diagnosis for a prospective join/groupBy key — the
    measurement that DECIDES whether the salting/AQE-skew machinery
    (operators/skew.py) is needed: per-key row counts, their
    max/p99/p90/p50, and max-over-mean in exact integer ppm.  A
    max_over_mean_ppm near 1e6 means uniform; orders of magnitude
    higher flags a hot key.  One count agg (map-side combinable) +
    a single-row stats agg over the key-cardinality table."""
    per_key = (
        tbl(spark, sf_dir, "orders")
        .groupBy("o_custkey")
        .agg(F.count("*").alias("n"))
    )
    return per_key.agg(
        F.count("*").alias("n_keys"),
        F.sum("n").cast("long").alias("n_rows"),
        F.max("n").cast("long").alias("max_n"),
        F.expr("percentile(n, 0.5)").alias("p50"),
        F.expr("percentile(n, 0.9)").alias("p90"),
        F.expr("percentile(n, 0.99)").alias("p99"),
        F.expr(
            "CAST((1000000 * MAX(n) * COUNT(*)) div SUM(n) AS BIGINT)"
        ).alias("max_over_mean_ppm"),
    )


# --- robust outlier detection via MAD -----------------------------------------------
@query(
    "dq_outlier_mad",
    oracle="""
    WITH daily AS (
      SELECT CAST(o_orderdate AS DATE) AS d,
             CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2)))
                       AS DECIMAL(18,2)) * 100 AS BIGINT) AS y_c
      FROM orders GROUP BY 1
    ),
    med AS (SELECT CAST(median(2 * y_c) AS BIGINT) AS med2_c FROM daily),
    dev AS (
      SELECT d, y_c, ABS(2 * y_c - med2_c) AS ad2_c
      FROM daily, med
    ),
    mad AS (SELECT CAST(median(2 * ad2_c) AS BIGINT) AS mad4_c FROM dev)
    SELECT d, CAST(y_c AS BIGINT) AS y_c,
           CAST(ad2_c AS BIGINT) AS abs_dev2_c,
           CAST(ad2_c AS DOUBLE) / 2.0
             > 3.0 * 1.4826 * (CAST(mad4_c AS DOUBLE) / 4.0) AS is_outlier
    FROM dev, mad
    """,
)
def dq_outlier_mad(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust outlier screen on the daily demand series: flag days whose
    absolute deviation from the MEDIAN exceeds 3 robust sigmas
    (MAD x 1.4826, the consistency constant for normal data) — the
    median/MAD pair survives the very outliers a mean/stddev z-score
    gets dragged by (the ts_anomaly_zscore failure mode under gross
    contamination).

    Exactness: medians of an EVEN row count interpolate to x.5, and
    casting that back to integer diverges across engines (Spark
    truncates, DuckDB rounds half-to-even — review catch).  So both
    medians are taken over DOUBLED integers: median(2·y) and
    median(2·|2y − med2|) are integral by construction (sum of the two
    middle values), cast back exactly, and the flag compares the
    half-/quarter-scaled doubles in one fixed IEEE expression.  Both
    medians are scalars over the bounded daily series, broadcast back —
    never a data-path collect."""
    daily = (
        tbl(spark, sf_dir, "orders")
        .groupBy(F.to_date("o_orderdate").alias("d"))
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
    med = daily.agg(
        F.expr("CAST(percentile(2 * y_c, 0.5) AS BIGINT)").alias("med2_c")
    )
    dev = daily.crossJoin(F.broadcast(med)).select(
        "d",
        "y_c",
        F.abs(2 * F.col("y_c") - F.col("med2_c")).alias("ad2_c"),
    )
    mad = dev.agg(
        F.expr("CAST(percentile(2 * ad2_c, 0.5) AS BIGINT)").alias("mad4_c")
    )
    return dev.crossJoin(F.broadcast(mad)).select(
        "d",
        "y_c",
        F.col("ad2_c").alias("abs_dev2_c"),
        (
            F.col("ad2_c").cast("double") / F.lit(2.0)
            > F.lit(3.0)
            * F.lit(1.4826)
            * (F.col("mad4_c").cast("double") / F.lit(4.0))
        ).alias("is_outlier"),
    )


# --- referential-integrity audit ----------------------------------------------------
@query(
    "dq_referential_integrity",
    oracle="""
    SELECT 'lineitem.l_orderkey -> orders' AS fk,
           (SELECT CAST(COUNT(*) AS BIGINT) FROM lineitem) AS n_rows,
           (SELECT CAST(COUNT(*) AS BIGINT) FROM lineitem l
            LEFT JOIN orders o ON o.o_orderkey = l.l_orderkey
            WHERE o.o_orderkey IS NULL) AS n_orphans
    UNION ALL
    SELECT 'orders.o_custkey -> customer',
           (SELECT CAST(COUNT(*) AS BIGINT) FROM orders),
           (SELECT CAST(COUNT(*) AS BIGINT) FROM orders o
            LEFT JOIN customer c ON c.c_custkey = o.o_custkey
            WHERE c.c_custkey IS NULL)
    UNION ALL
    SELECT 'lineitem.l_partkey -> part',
           (SELECT CAST(COUNT(*) AS BIGINT) FROM lineitem),
           (SELECT CAST(COUNT(*) AS BIGINT) FROM lineitem l
            LEFT JOIN part p ON p.p_partkey = l.l_partkey
            WHERE p.p_partkey IS NULL)
    UNION ALL
    SELECT 'customer.c_nationkey -> nation',
           (SELECT CAST(COUNT(*) AS BIGINT) FROM customer),
           (SELECT CAST(COUNT(*) AS BIGINT) FROM customer c
            LEFT JOIN nation n ON n.n_nationkey = c.c_nationkey
            WHERE n.n_nationkey IS NULL)
    """,
)
def dq_referential_integrity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Foreign-key orphan audit across the star schema — the
    data-quality check every warehouse load runs (and the one that
    catches a broken incremental ingest before a join silently drops
    rows).  Each FK is one left-join aggregate (n_rows = count,
    n_orphans = unmatched count — parent keys are PKs, so the join
    never fans out) and the four audits union into ONE lazy plan:
    construction is pure (r9, was 8 driver actions + createDataFrame),
    and at action time Spark runs the four audits as one job instead
    of eight."""
    fks = [
        (
            "lineitem.l_orderkey -> orders",
            tbl(spark, sf_dir, "lineitem").select("l_orderkey"),
            tbl(spark, sf_dir, "orders").select(
                F.col("o_orderkey").alias("l_orderkey")
            ),
        ),
        (
            "orders.o_custkey -> customer",
            tbl(spark, sf_dir, "orders").select("o_custkey"),
            tbl(spark, sf_dir, "customer").select(
                F.col("c_custkey").alias("o_custkey")
            ),
        ),
        (
            "lineitem.l_partkey -> part",
            tbl(spark, sf_dir, "lineitem").select("l_partkey"),
            tbl(spark, sf_dir, "part").select(
                F.col("p_partkey").alias("l_partkey")
            ),
        ),
        (
            "customer.c_nationkey -> nation",
            tbl(spark, sf_dir, "customer").select("c_nationkey"),
            tbl(spark, sf_dir, "nation").select(
                F.col("n_nationkey").alias("c_nationkey")
            ),
        ),
    ]
    from functools import reduce

    frames = []
    for name, child, parent in fks:
        key = child.columns[0]
        marked = parent.distinct().withColumn("__hit", F.lit(1))
        frames.append(
            child.join(marked, key, "left")
            .agg(
                F.count(F.lit(1)).alias("n_rows"),
                F.coalesce(
                    F.sum(F.when(F.col("__hit").isNull(), 1)), F.lit(0)
                ).alias("n_orphans"),
            )
            .select(F.lit(name).alias("fk"), "n_rows", "n_orphans")
        )
    return reduce(DataFrame.unionByName, frames)


# --- autocorrelation / partial autocorrelation of the daily series -------------------
# Shared oracle fragment: centered daily series + per-lag ACF moments
# (ts_acf AND ts_pacf build from this, so the two cannot drift).
_ACF_CTES = """v AS (
      SELECT CAST(ts AS DATE) AS d,
             CAST(SUM(CAST(value AS DECIMAL(18,2)) * 100) AS BIGINT) AS vc
      FROM events GROUP BY 1
    ),
    s AS (
      SELECT CAST(COUNT(*) AS HUGEINT) AS n,
             CAST(SUM(CAST(vc AS HUGEINT)) AS HUGEINT) AS tot
      FROM v
    ),
    c AS (
      SELECT d, (s.n * CAST(vc AS HUGEINT) - s.tot) AS c FROM v, s
    ),
    den AS (SELECT SUM(c * c) AS den FROM c),
    lags AS (SELECT unnest(range(1, 8)) AS lag),
    num AS (
      SELECT lag, CAST(COUNT(*) AS BIGINT) AS n_pairs,
             SUM(a.c * b.c) AS num
      FROM lags, c a JOIN c b ON b.d = a.d + CAST(lag || ' days' AS INTERVAL)
      GROUP BY lag
    )"""


def _centered_daily(spark: SparkSession, sf_dir: str):
    """Spark half of ``_ACF_CTES``'s ``c`` CTE: the exact scaled-
    centered daily series (d, c = n*vc - tot as DECIMAL(38,0)).
    Factored out of ``_acf_frames`` (r10) so the spectral periodogram
    reads the IDENTICAL centered frame — shared-fragment rule."""
    d38 = "decimal(38,0)"
    ev = tbl(spark, sf_dir, "events")
    v = ev.groupBy(F.to_date("ts").alias("d")).agg(
        F.sum(F.col("value").cast("decimal(18,2)") * 100)
        .cast("long")
        .alias("vc")
    )
    # checkpoint the BROADCAST-FREE daily aggregate, not the centered
    # frame: a shared_plan over a plan containing a broadcast exchange
    # executes that broadcast (and its whole upstream scan) at .rdd
    # construction — checkpointing v instead keeps construction pure,
    # the events scan happens once at first action, and every c
    # consumer recomputes only the calendar-sized centering arithmetic
    # over v's checkpointed blocks.
    v = v.transform(shared_plan)
    stats = v.agg(
        F.count("*").cast(d38).alias("n"),
        F.sum(F.col("vc").cast(d38)).cast(d38).alias("tot"),
    )
    c = v.crossJoin(F.broadcast(stats)).select(
        "d",
        (F.col("n") * F.col("vc").cast(d38) - F.col("tot"))
        .cast(d38)
        .alias("c"),
    )
    return c


def _acf_frames(spark: SparkSession, sf_dir: str):
    """Spark half of ``_ACF_CTES``: (per-lag num frame, den frame)."""
    d38 = "decimal(38,0)"
    c = _centered_daily(spark, sf_dir)
    den = c.agg(F.sum(F.col("c") * F.col("c")).cast(d38).alias("den"))
    lags = spark.range(1, 8).select(F.col("id").cast("int").alias("lag"))
    b = c.select(F.col("d").alias("bd"), F.col("c").alias("cb"))
    num = (
        c.crossJoin(F.broadcast(lags))
        .join(b, F.col("bd") == F.date_add(F.col("d"), F.col("lag")))
        .groupBy("lag")
        .agg(
            F.count("*").alias("n_pairs"),
            F.sum(F.col("c") * F.col("cb")).cast(d38).alias("num"),
        )
    )
    return num, den


@query(
    "ts_acf",
    oracle=f"""
    WITH {_ACF_CTES}
    SELECT CAST(lag AS INT) AS lag, n_pairs,
           CAST((1000000 * num) // NULLIF(den.den, 0) AS BIGINT) AS acf_ppm
    FROM num, den
    """,
)
def ts_acf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sample autocorrelation of the daily total-value series at lags
    1..7 — the Box-Jenkins identification tool the reference's ARIMA
    workflow starts from (order selection reads the ACF/PACF).

    Exact integer ppm end-to-end: with v_t the daily cents, center by
    the scaled residual c_t = n*v_t - S (no fraction ever formed), then
    r_k = sum(c_t * c_{t+k}) / sum(c_t^2) emitted as ONE truncating
    integer division in parts-per-million.  Moments ride DECIMAL(38,0)
    (DuckDB HUGEINT) per the >2**53 integer->double ban.

    Plan: one calendar-bounded daily aggregation, a scalar stats row
    broadcast back (sanctioned 1-row crossJoin), a 7-row lag grid
    cross join, and a date-shifted self-equi-join — all state is
    calendar-cardinality, independent of event volume."""
    num, den = _acf_frames(spark, sf_dir)
    return num.crossJoin(F.broadcast(den)).select(
        "lag",
        "n_pairs",
        F.expr(
            "CAST((1000000 * num) div NULLIF(den, 0) AS BIGINT)"
        ).alias("acf_ppm"),
    )


# --- interval coalescing (merge overlapping activity intervals) -----------------------
@query(
    "w_interval_merge",
    oracle="""
    WITH iv AS (
      SELECT DISTINCT user_id,
             epoch_us(CAST(ts AS TIMESTAMP)) AS s_us,
             epoch_us(CAST(ts AS TIMESTAMP)) + 1800000000 AS e_us
      FROM events
    ),
    flagged AS (
      SELECT user_id, s_us, e_us,
             CASE WHEN s_us > COALESCE(MAX(e_us) OVER (
                    PARTITION BY user_id ORDER BY s_us, e_us
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), -1)
                  THEN 1 ELSE 0 END AS new_island
      FROM iv
    ),
    islands AS (
      SELECT user_id, s_us, e_us,
             SUM(new_island) OVER (
               PARTITION BY user_id ORDER BY s_us, e_us
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS island
      FROM flagged
    )
    SELECT user_id, CAST(island AS BIGINT) AS island,
           CAST(MIN(s_us) AS BIGINT) AS merged_start_us,
           CAST(MAX(e_us) AS BIGINT) AS merged_end_us,
           CAST(COUNT(*) AS BIGINT) AS n_events
    FROM islands GROUP BY user_id, island
    """,
)
def w_interval_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval coalescing: each event opens a 30-minute activity
    interval; overlapping (or touching) intervals per user merge into
    maximal spans — the union-of-intervals primitive behind session
    stitching, on-call coverage, and machine-uptime rollups, and the
    second classic gaps-and-islands shape next to w_streak_islands.

    The merge is the running-max trick: a row starts a new island iff
    its start exceeds the max end of ALL preceding intervals (ROWS ...
    1 PRECEDING window), then the island id is a running sum of those
    flags — two windows PARTITIONED BY user (user-bounded state, never
    global), one groupBy.  Determinism: the frame orders by the
    (s_us, e_us) pair made unique by the DISTINCT collapse; times stay
    exact BIGINT microseconds end-to-end (no timestamp column ever
    emitted, per the tz rule)."""
    iv = (
        tbl(spark, sf_dir, "events")
        .select(
            "user_id",
            (F.unix_micros(F.col("ts").cast("timestamp"))).alias("s_us"),
        )
        .distinct()
        .withColumn("e_us", F.col("s_us") + F.lit(1800000000).cast("long"))
    )
    wprev = (
        Window.partitionBy("user_id")
        .orderBy("s_us", "e_us")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    wrun = (
        Window.partitionBy("user_id")
        .orderBy("s_us", "e_us")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    flagged = iv.withColumn(
        "new_island",
        F.when(
            F.col("s_us")
            > F.coalesce(F.max("e_us").over(wprev), F.lit(-1).cast("long")),
            F.lit(1),
        ).otherwise(F.lit(0)),
    )
    islands = flagged.withColumn(
        "island", F.sum("new_island").over(wrun).cast("long")
    )
    return islands.groupBy("user_id", "island").agg(
        F.min("s_us").alias("merged_start_us"),
        F.max("e_us").alias("merged_end_us"),
        F.count("*").alias("n_events"),
    )


# --- Wald–Wolfowitz runs test on the daily series -------------------------------------
@query(
    "ts_runs_test",
    oracle="""
    WITH v AS (
      SELECT CAST(ts AS DATE) AS d,
             CAST(SUM(CAST(value AS DECIMAL(18,2)) * 100) AS BIGINT) AS vc
      FROM events GROUP BY 1
    ),
    diffs AS (
      SELECT d, vc - LAG(vc) OVER (ORDER BY d) AS dv FROM v
    ),
    signs AS (
      SELECT d, CASE WHEN dv > 0 THEN 1 ELSE 0 END AS up
      FROM diffs WHERE dv IS NOT NULL AND dv <> 0
    ),
    flips AS (
      SELECT up, CASE WHEN up <> LAG(up) OVER (ORDER BY d) THEN 1 ELSE 0 END AS flip
      FROM signs
    ),
    agg AS (
      SELECT CAST(SUM(up) AS BIGINT) AS n_up,
             CAST(COUNT(*) - SUM(up) AS BIGINT) AS n_down,
             CAST(1 + SUM(flip) AS BIGINT) AS n_runs
      FROM flips
    )
    SELECT n_up, n_down, n_runs,
           (CAST(n_runs AS DOUBLE)
              - (2.0 * n_up * n_down / (n_up + n_down) + 1.0))
             / SQRT(2.0 * n_up * n_down
                    * (2.0 * n_up * n_down - n_up - n_down)
                    / ((n_up + n_down) * (n_up + n_down)
                       * (n_up + n_down - 1.0))) AS z
    FROM agg
    """,
)
def ts_runs_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wald–Wolfowitz runs test for randomness of the daily series'
    up/down moves — the nonparametric "is this trend or noise?" check
    that belongs beside the ACF in the Box-Jenkins identification
    toolbox.  Zero-diff days are excluded (the standard treatment); the
    run count, n_up and n_down are exact integers and the z statistic
    is ONE shared IEEE expression over them (the cross-engine float
    rule).

    The two unpartitioned windows ride the calendar-bounded daily
    aggregate (m7/j3 justification); everything before them is one
    map-side-combinable date aggregation."""
    v = (
        tbl(spark, sf_dir, "events")
        .groupBy(F.to_date("ts").alias("d"))
        .agg(
            F.sum(F.col("value").cast("decimal(18,2)") * 100)
            .cast("long")
            .alias("vc")
        )
    )
    wd = Window.orderBy("d")
    diffs = v.select("d", (F.col("vc") - F.lag("vc").over(wd)).alias("dv"))
    signs = diffs.filter(
        F.col("dv").isNotNull() & (F.col("dv") != 0)
    ).select("d", F.when(F.col("dv") > 0, 1).otherwise(0).alias("up"))
    flips = signs.select(
        "up",
        F.when(F.col("up") != F.lag("up").over(wd), 1)
        .otherwise(0)
        .alias("flip"),
    )
    agg = flips.agg(
        F.sum("up").cast("long").alias("n_up"),
        (F.count("*") - F.sum("up")).cast("long").alias("n_down"),
        (1 + F.sum("flip")).cast("long").alias("n_runs"),
    )
    nu, nd, nr = F.col("n_up"), F.col("n_down"), F.col("n_runs")
    mu = 2.0 * nu * nd / (nu + nd) + 1.0
    var = (
        2.0
        * nu
        * nd
        * (2.0 * nu * nd - nu - nd)
        / ((nu + nd) * (nu + nd) * (nu + nd - 1.0))
    )
    return agg.select(
        "n_up",
        "n_down",
        "n_runs",
        ((nr.cast("double") - mu) / F.sqrt(var)).alias("z"),
    )


# --- two-sample Kolmogorov–Smirnov test ------------------------------------------------
@query(
    "m33_ks_two_sample",
    oracle="""
    WITH lens AS (
      SELECT CAST(len(list_filter(regexp_split_to_array(text, '\\s+'),
                                  x -> x <> '')) AS BIGINT) AS l,
             (lang = 'en') AS is_en
      FROM documents
    ),
    per AS (
      SELECT l,
             CAST(SUM(is_en::INT) AS BIGINT) AS c_en,
             CAST(SUM((NOT is_en)::INT) AS BIGINT) AS c_ot
      FROM lens GROUP BY l
    ),
    tot AS (
      SELECT CAST(SUM(c_en) AS HUGEINT) AS n1,
             CAST(SUM(c_ot) AS HUGEINT) AS n2
      FROM per
    ),
    cum AS (
      SELECT l,
             SUM(CAST(c_en AS HUGEINT)) OVER (ORDER BY l) AS f1,
             SUM(CAST(c_ot AS HUGEINT)) OVER (ORDER BY l) AS f2
      FROM per
    ),
    d AS (
      SELECT l, ABS(f1 * tot.n2 - f2 * tot.n1) AS num FROM cum, tot
    ),
    best AS (
      SELECT MIN(l) AS ks_at_len FROM d WHERE num = (SELECT MAX(num) FROM d)
    )
    SELECT CAST(tot.n1 AS BIGINT) AS n_en,
           CAST(tot.n2 AS BIGINT) AS n_other,
           best.ks_at_len,
           CAST((1000000 * (SELECT MAX(num) FROM d))
                // (tot.n1 * tot.n2) AS BIGINT) AS d_ppm
    FROM tot, best
    """,
)
def m33_ks_two_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-sample Kolmogorov–Smirnov statistic comparing the token-
    length distributions of English vs non-English documents — the
    standard distribution-shift test (next to dq_drift_chi2's binned
    chi-square) a corpus monitor runs between snapshots: D = max over
    thresholds of |ECDF_en − ECDF_other|.

    Exact throughout: the ECDF difference at each distinct length is
    the integer |F1·n2 − F2·n1| (never a float ECDF), the maximum and
    its earliest attaining length are deterministic, and D emits as ONE
    truncating ppm division.  The cumulative window rides the
    distinct-length table (value-cardinality support, m23/m24
    argument) — all corpus-scale work is one groupBy."""
    from .text import _toks

    lens = tbl(spark, sf_dir, "documents").select(
        F.size(_toks()).cast("long").alias("l"),
        (F.col("lang") == "en").alias("is_en"),
    )
    per = lens.groupBy("l").agg(
        F.sum(F.col("is_en").cast("int")).cast("long").alias("c_en"),
        F.sum((~F.col("is_en")).cast("int")).cast("long").alias("c_ot"),
    ).transform(shared_plan)  # feeds tot AND cum — share the scan+agg
    d38 = "decimal(38,0)"
    tot = per.agg(
        F.sum("c_en").cast(d38).alias("n1"),
        F.sum("c_ot").cast(d38).alias("n2"),
    )
    wcum = Window.orderBy("l").rowsBetween(Window.unboundedPreceding, 0)
    cum = per.select(
        "l",
        F.sum(F.col("c_en").cast(d38)).over(wcum).cast(d38).alias("f1"),
        F.sum(F.col("c_ot").cast(d38)).over(wcum).cast(d38).alias("f2"),
    )
    d = cum.crossJoin(F.broadcast(tot)).select(
        "l",
        "n1",
        "n2",
        F.abs(F.col("f1") * F.col("n2") - F.col("f2") * F.col("n1"))
        .cast(d38)
        .alias("num"),
    )
    best = d.agg(
        F.min(
            F.struct((-F.col("num")).alias("nn"), F.col("l").alias("l"))
        ).alias("m"),
        F.first("n1").alias("n1"),
        F.first("n2").alias("n2"),
    )
    return best.select(
        F.col("n1").cast("long").alias("n_en"),
        F.col("n2").cast("long").alias("n_other"),
        F.col("m.l").alias("ks_at_len"),
        F.expr(
            "CAST((1000000 * CAST(-m.nn AS DECIMAL(38,0))) div (n1 * n2)"
            " AS BIGINT)"
        ).alias("d_ppm"),
    )


# --- k-anonymity audit ----------------------------------------------------------------
@query(
    "dq_k_anonymity",
    oracle="""
    WITH qi AS (
      SELECT lang, source, CAST(n_chars // 100 AS BIGINT) AS len_bucket
      FROM documents
    ),
    grp AS (
      SELECT lang, source, len_bucket, CAST(COUNT(*) AS BIGINT) AS g
      FROM qi GROUP BY 1, 2, 3
    )
    SELECT CAST(5 AS INT) AS k,
           CAST(COUNT(*) AS BIGINT) AS n_groups,
           CAST(SUM(g) AS BIGINT) AS n_rows,
           CAST(SUM((g < 5)::INT) AS BIGINT) AS groups_lt_k,
           CAST(SUM(CASE WHEN g < 5 THEN g ELSE 0 END) AS BIGINT)
             AS rows_lt_k,
           CAST(MIN(g) AS BIGINT) AS min_group,
           CAST((1000000 * SUM(CASE WHEN g < 5 THEN g ELSE 0 END))
                // SUM(g) AS BIGINT) AS risk_ppm
    FROM grp
    """,
)
def dq_k_anonymity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-anonymity audit over the quasi-identifier tuple (lang, source,
    length bucket) — the re-identification risk gate (Sweeney 2002) a
    governance layer runs before releasing or training on a corpus:
    any row whose QI combination is shared by fewer than k documents
    is linkable.  Reports group/row counts below k=5, the worst group
    size, and the at-risk row fraction in exact truncating ppm.

    Plan: one integer bucketing projection + ONE map-side-combinable
    groupBy + a scalar rollup — two shuffles total, the second over
    group-cardinality state.  The same shape audits any QI set at any
    scale; the length bucket shows the standard generalization step
    (coarsen a continuous QI until groups clear k)."""
    qi = tbl(spark, sf_dir, "documents").select(
        "lang",
        "source",
        F.expr("CAST(n_chars div 100 AS BIGINT)").alias("len_bucket"),
    )
    grp = qi.groupBy("lang", "source", "len_bucket").agg(
        F.count("*").alias("g")
    )
    lt = F.when(F.col("g") < 5, F.col("g")).otherwise(F.lit(0))
    return grp.agg(
        F.lit(5).cast("int").alias("k"),
        F.count("*").alias("n_groups"),
        F.sum("g").cast("long").alias("n_rows"),
        F.sum((F.col("g") < 5).cast("int")).cast("long").alias("groups_lt_k"),
        F.sum(lt).cast("long").alias("rows_lt_k"),
        F.min("g").alias("min_group"),
        F.expr(
            "CAST((1000000 * SUM(CASE WHEN g < 5 THEN g ELSE 0 END))"
            " div SUM(g) AS BIGINT)"
        ).alias("risk_ppm"),
    )


# --- Welch's unequal-variance t-test ---------------------------------------------------
@query(
    "m35_welch_ttest",
    oracle="""
    WITH lens AS (
      SELECT CAST(len(list_filter(regexp_split_to_array(text, '\\s+'),
                                  x -> x <> '')) AS BIGINT) AS l,
             (lang = 'en') AS is_en
      FROM documents
    ),
    g AS (
      SELECT is_en, CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(l) AS HUGEINT) AS s,
             CAST(SUM(l * l) AS HUGEINT) AS ssq
      FROM lens GROUP BY is_en
    ),
    w AS (
      SELECT MAX(CASE WHEN is_en THEN n END) AS n1,
             CAST(MAX(CASE WHEN is_en THEN s END) AS HUGEINT) AS s1,
             CAST(MAX(CASE WHEN is_en THEN ssq END) AS HUGEINT) AS q1,
             MAX(CASE WHEN NOT is_en THEN n END) AS n2,
             CAST(MAX(CASE WHEN NOT is_en THEN s END) AS HUGEINT) AS s2,
             CAST(MAX(CASE WHEN NOT is_en THEN ssq END) AS HUGEINT) AS q2
      FROM g
    )
    SELECT CAST(n1 AS BIGINT) AS n_en, CAST(n2 AS BIGINT) AS n_other,
           (CAST(s1 AS DOUBLE) / n1 - CAST(s2 AS DOUBLE) / n2)
             / SQRT(
                 (CAST(n1 * q1 - s1 * s1 AS DOUBLE) / (n1 * n1 * (n1 - 1.0)))
               + (CAST(n2 * q2 - s2 * s2 AS DOUBLE) / (n2 * n2 * (n2 - 1.0)))
             ) AS t_welch
    FROM w
    """,
)
def m35_welch_ttest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Welch's unequal-variance t statistic for the en vs non-en mean
    token-length difference — the mean-shift companion to the KS
    (shape) and chi-square (binned) drift tests, closing the classical
    two-sample toolbox.

    Both groups' moments are exact integer sums (HUGEINT/DECIMAL(38));
    t is ONE shared IEEE expression over them, per the cross-engine
    float rule — the integer moments stay well under 2^53 after the
    double conversion guard (n·ssq ≤ ~1e13 at sf1).  Plan: one
    map-side-combinable two-group aggregation, one pivot row — no
    window, no join, corpus-size-independent state."""
    from .text import _toks

    lens = tbl(spark, sf_dir, "documents").select(
        F.size(_toks()).cast("long").alias("l"),
        (F.col("lang") == "en").alias("is_en"),
    )
    d38 = "decimal(38,0)"
    g = lens.groupBy("is_en").agg(
        F.count("*").alias("n"),
        F.sum("l").cast(d38).alias("s"),
        F.sum(F.col("l") * F.col("l")).cast(d38).alias("ssq"),
    )
    w = g.agg(
        F.max(F.when(F.col("is_en"), F.col("n"))).alias("n1"),
        F.max(F.when(F.col("is_en"), F.col("s"))).alias("s1"),
        F.max(F.when(F.col("is_en"), F.col("ssq"))).alias("q1"),
        F.max(F.when(~F.col("is_en"), F.col("n"))).alias("n2"),
        F.max(F.when(~F.col("is_en"), F.col("s"))).alias("s2"),
        F.max(F.when(~F.col("is_en"), F.col("ssq"))).alias("q2"),
    )
    n1, n2 = F.col("n1"), F.col("n2")
    mean_diff = F.col("s1").cast("double") / n1 - F.col("s2").cast(
        "double"
    ) / n2
    v1 = (n1 * F.col("q1") - F.col("s1") * F.col("s1")).cast("double") / (
        n1 * n1 * (n1 - F.lit(1.0))
    )
    v2 = (n2 * F.col("q2") - F.col("s2") * F.col("s2")).cast("double") / (
        n2 * n2 * (n2 - F.lit(1.0))
    )
    return w.select(
        n1.cast("long").alias("n_en"),
        n2.cast("long").alias("n_other"),
        (mean_diff / F.sqrt(v1 + v2)).alias("t_welch"),
    )


@query(
    "ts_pacf",
    oracle=f"""
    WITH {_ACF_CTES},
    r AS (
      SELECT MAX(CASE WHEN lag = 1 THEN q END) AS r1,
             MAX(CASE WHEN lag = 2 THEN q END) AS r2,
             MAX(CASE WHEN lag = 3 THEN q END) AS r3
      FROM (SELECT lag,
                   (1000000000 * num) // NULLIF(den.den, 0) AS q
            FROM num, den)
    ),
    dets AS (
      SELECT r1, r2, r3,
             CAST(1000000000 AS HUGEINT) AS s,
             (CAST(1000000000 AS HUGEINT) * 1000000000 - r1 * r1)
               AS d2,
             (CAST(1000000000 AS HUGEINT) * r2 - r1 * r1) AS d2s
      FROM r
    ),
    d3 AS (
      SELECT r1, r2, r3, d2, d2s,
             s * (s * s - r1 * r1) - r1 * (r1 * s - r1 * r2)
               + r2 * (r1 * r1 - s * r2) AS det3,
             s * (s * r3 - r2 * r1) - r1 * (r1 * r3 - r2 * r2)
               + r1 * (r1 * r1 - s * r2) AS det3s
      FROM dets
    )
    SELECT u.lag, u.pacf_ppm FROM d3, LATERAL (
      VALUES (CAST(1 AS INT), CAST(r1 // 1000 AS BIGINT)),
             (2, CAST((1000000 * d2s) // NULLIF(d2, 0) AS BIGINT)),
             (3, CAST((1000000 * det3s) // NULLIF(det3, 0) AS BIGINT))
    ) AS u(lag, pacf_ppm)
    """,
)
def ts_pacf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Partial autocorrelation of the daily series at lags 1..3 — the
    other half of Box-Jenkins order identification (the AR order reads
    off where the PACF cuts).  Computed by the Yule-Walker determinant
    form, phi_kk = det(P*_k)/det(P_k) over the Toeplitz correlation
    matrix — Durbin-Levinson unrolled, no recursion on either engine.

    Exactness: the ACFs quantize to q9 integers FIRST (one truncating
    division each, shared with ts_acf's moment fragment so the two
    cannot drift), then every determinant is exact integer algebra —
    ppm-scaled degree-3 products of q9 values stay under DECIMAL(38)/HUGEINT —
    and each PACF emits as one truncating ppm division.  All work
    after the shared daily aggregation is constant-size."""
    num, den = _acf_frames(spark, sf_dir)
    r = (
        num.crossJoin(F.broadcast(den))
        .select(
            "lag",
            F.expr(
                "CAST((1000000000 * num) div NULLIF(den, 0)"
                " AS DECIMAL(38,0))"
            ).alias("q"),
        )
        .agg(
            F.max(F.when(F.col("lag") == 1, F.col("q"))).alias("r1"),
            F.max(F.when(F.col("lag") == 2, F.col("q"))).alias("r2"),
            F.max(F.when(F.col("lag") == 3, F.col("q"))).alias("r3"),
        )
    )
    d3 = r.selectExpr(
        "r1",
        "r2",
        "r3",
        "CAST(1000000000 AS DECIMAL(38,0)) AS s",
    ).selectExpr(
        "r1",
        "CAST(s * s - r1 * r1 AS DECIMAL(38,0)) AS d2",
        "CAST(s * r2 - r1 * r1 AS DECIMAL(38,0)) AS d2s",
        "CAST(s * (s * s - r1 * r1) - r1 * (r1 * s - r1 * r2)"
        " + r2 * (r1 * r1 - s * r2) AS DECIMAL(38,0)) AS det3",
        "CAST(s * (s * r3 - r2 * r1) - r1 * (r1 * r3 - r2 * r2)"
        " + r1 * (r1 * r1 - s * r2) AS DECIMAL(38,0)) AS det3s",
    )
    return d3.selectExpr(
        """stack(3,
             CAST(1 AS INT), CAST(r1 div 1000 AS BIGINT),
             2, CAST((1000000 * d2s) div NULLIF(d2, 0) AS BIGINT),
             3, CAST((1000000 * det3s) div NULLIF(det3, 0) AS BIGINT))
           AS (lag, pacf_ppm)"""
    )


# --- new vs returning daily actives ----------------------------------------------------
@query(
    "a_new_vs_returning",
    oracle="""
    WITH fs AS (
      SELECT user_id, MIN(CAST(ts AS DATE)) AS d0 FROM events GROUP BY 1
    ),
    act AS (
      SELECT DISTINCT user_id, CAST(ts AS DATE) AS d FROM events
    )
    SELECT a.d,
           CAST(SUM((a.d = fs.d0)::INT) AS BIGINT) AS n_new,
           CAST(SUM((a.d > fs.d0)::INT) AS BIGINT) AS n_returning
    FROM act a JOIN fs USING (user_id)
    GROUP BY a.d
    """,
)
def a_new_vs_returning(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily active users split new vs returning — the growth-
    accounting headline every product dashboard leads with (paired
    with w_cohort_retention and w_rolling_mau).

    Plan: first-seen is ONE user-keyed min aggregation, actives ONE
    distinct — both shuffle on the natural user key — then an equi-join
    and a date-keyed count.  Exact integer counts throughout; at
    100 TB the first-seen frame is user-cardinality and the join is
    user-partitioned, never a window over raw events."""
    ev = tbl(spark, sf_dir, "events")
    fs = ev.groupBy("user_id").agg(F.min(F.to_date("ts")).alias("d0"))
    act = ev.select("user_id", F.to_date("ts").alias("d")).distinct()
    return (
        act.join(fs, "user_id")
        .groupBy("d")
        .agg(
            F.sum((F.col("d") == F.col("d0")).cast("int"))
            .cast("long")
            .alias("n_new"),
            F.sum((F.col("d") > F.col("d0")).cast("int"))
            .cast("long")
            .alias("n_returning"),
        )
    )


# --- Theil–Sen robust trend ------------------------------------------------------------
@query(
    "ts_theil_sen",
    oracle="""
    WITH v AS (
      SELECT CAST(ts AS DATE) AS d,
             CAST(SUM(CAST(value AS DECIMAL(18,2)) * 100) AS BIGINT) AS vc
      FROM events GROUP BY 1
    ),
    base AS (SELECT MIN(d) AS d0 FROM v),
    idx AS (
      SELECT CAST(d - base.d0 AS BIGINT) AS t, vc FROM v, base
    ),
    slopes AS (
      SELECT (10000 * (b.vc - a.vc)) // (b.t - a.t) AS s_q4
      FROM idx a JOIN idx b ON b.t > a.t
    ),
    m AS (
      SELECT s_q4 AS slope_q4,
             CAST((SELECT COUNT(*) FROM slopes) AS BIGINT) AS n_pairs
      FROM (SELECT s_q4, ROW_NUMBER() OVER (ORDER BY s_q4) AS rn
            FROM slopes)
      WHERE rn = ((SELECT COUNT(*) + 1 FROM slopes) // 2)
    ),
    res AS (
      SELECT (10000 * idx.vc - m.slope_q4 * idx.t) AS r_q4, m.slope_q4,
             m.n_pairs
      FROM idx, m
    )
    SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM idx) AS n_days,
           n_pairs, slope_q4,
           CAST(r_q4 AS BIGINT) AS intercept_q4
    FROM (SELECT r_q4, slope_q4, n_pairs,
                 ROW_NUMBER() OVER (ORDER BY r_q4) AS rn,
                 COUNT(*) OVER () AS cnt
          FROM res)
    WHERE rn = (cnt + 1) // 2
    """,
)
def ts_theil_sen(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theil–Sen robust trend of the daily series: slope = median of
    all pairwise slopes, intercept = median residual at that slope —
    the 29%-breakdown-point trend estimator that shrugs off the
    outliers which bend OLS (the robust sibling of m21's exact OLS,
    completing the robust toolbox with dq_outlier_mad and
    m7_stl_robust).

    Exactness: each pairwise slope is ONE truncating q4 division of
    integer cents over integer day gaps; medians are exact order
    statistics (integer rank (n+1)//2 — the m31 lesson: never compute
    an order-statistic index in floating point) over those integers,
    so both engines agree bit-for-bit.  The O(days²) pair join runs on
    the CALENDAR-bounded daily aggregate (≤366 rows/year — constant
    work at any corpus size); the unpartitioned rank windows ride that
    bounded frame per the m23/m24 discipline."""
    v = (
        tbl(spark, sf_dir, "events")
        .groupBy(F.to_date("ts").alias("d"))
        .agg(
            F.sum(F.col("value").cast("decimal(18,2)") * 100)
            .cast("long")
            .alias("vc")
        )
    )
    # checkpoint the broadcast-free daily aggregate (the _acf_frames
    # rule): wrapping idx — whose plan contains broadcast(base) — would
    # execute the broadcast and the whole events scan at construction
    v = v.transform(shared_plan)
    base = v.agg(F.min("d").alias("d0"))
    idx = v.crossJoin(F.broadcast(base)).select(
        F.datediff(F.col("d"), F.col("d0")).cast("long").alias("t"), "vc"
    )
    a = idx.select(F.col("t").alias("ta"), F.col("vc").alias("va"))
    slopes = (
        idx.join(a, F.col("t") > F.col("ta"))
        .select(
            F.expr("(10000 * (vc - va)) div (t - ta)").alias("s_q4")
        )
    )
    w = Window.orderBy("s_q4")
    ranked = slopes.select(
        "s_q4",
        F.row_number().over(w).alias("rn"),
        F.count("*").over(Window.partitionBy()).alias("cnt"),
    )
    m = ranked.filter(
        F.col("rn") == F.expr("(cnt + 1) div 2")
    ).select(F.col("s_q4").alias("slope_q4"), F.col("cnt").alias("n_pairs"))
    res = idx.crossJoin(F.broadcast(m)).select(
        (10000 * F.col("vc") - F.col("slope_q4") * F.col("t")).alias("r_q4"),
        "slope_q4",
        "n_pairs",
    )
    wr = Window.orderBy("r_q4")
    picked = (
        res.select(
            "r_q4",
            "slope_q4",
            "n_pairs",
            F.row_number().over(wr).alias("rn"),
            F.count("*").over(Window.partitionBy()).alias("cnt"),
        )
        .filter(F.col("rn") == F.expr("(cnt + 1) div 2"))
    )
    n_days = idx.agg(F.count("*").alias("n_days"))
    return picked.crossJoin(F.broadcast(n_days)).select(
        "n_days",
        "n_pairs",
        "slope_q4",
        F.col("r_q4").cast("long").alias("intercept_q4"),
    )


# --- Kruskal–Wallis k-sample rank test ---------------------------------------------------
@query(
    "m36_kruskal_wallis",
    oracle="""
    WITH vals AS (
      SELECT CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS vc,
             event_type AS g
      FROM events
    ),
    per AS (
      SELECT vc, g, CAST(COUNT(*) AS BIGINT) AS c FROM vals GROUP BY vc, g
    ),
    perv AS (
      SELECT vc, CAST(SUM(c) AS BIGINT) AS t FROM per GROUP BY vc
    ),
    ranked AS (
      SELECT vc, t,
             CAST(COALESCE(SUM(t) OVER (ORDER BY vc
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               AS BIGINT) AS cum_before
      FROM perv
    ),
    contrib AS (
      SELECT p.g, CAST(SUM(CAST(p.c AS HUGEINT)
                           * (2 * r.cum_before + r.t + 1)) AS HUGEINT) AS r2,
             CAST(SUM(p.c) AS HUGEINT) AS n_g
      FROM per p JOIN ranked r USING (vc)
      GROUP BY p.g
    ),
    ties AS (
      SELECT CAST(SUM(CAST(t AS HUGEINT) * t * t - t) AS HUGEINT) AS tie_q
      FROM perv
    ),
    tot AS (
      SELECT CAST(SUM(n_g) AS HUGEINT) AS n,
             CAST(SUM((1000000 * r2 * r2) // (4 * n_g)) AS HUGEINT) AS s_q
      FROM contrib
    )
    SELECT CAST(tot.n AS BIGINT) AS n_total,
           (SELECT CAST(COUNT(*) AS INT) FROM contrib) AS n_groups,
           CAST((12 * tot.s_q) // (tot.n * (tot.n + 1))
                - 3000000 * (tot.n + 1) AS BIGINT) AS h_ppm,
           CAST((((12 * tot.s_q) // (tot.n * (tot.n + 1))
                  - 3000000 * (tot.n + 1)) * (tot.n * tot.n * tot.n - tot.n))
                // NULLIF(tot.n * tot.n * tot.n - tot.n - ties.tie_q, 0)
             AS BIGINT) AS h_tie_corrected_ppm
    FROM tot, ties
    """,
)
def m36_kruskal_wallis(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kruskal–Wallis H across the event types' value distributions —
    the k-sample nonparametric location test completing the family
    (m23's Mann–Whitney is its 2-sample special case): do the event
    types draw values from the same distribution?

    Entirely exact fixed point — a first for a rank test: tied ranks
    are kept as DOUBLED integers (2·cum_before + t + 1, always odd/even
    -exact), group rank sums are integer dot products, Σ R_j²/n_j is
    per-group truncating q6 divisions, H = 12·S/(N(N+1)) − 3(N+1) in
    ppm, and the standard tie correction 1 − Σ(t³−t)/(N³−N) is one
    more exact rational multiply — no float forms anywhere, so the
    statistic strict-hashes (HUGEINT/DECIMAL(38) headroom to sf1 and
    beyond).

    Plan: one (value, group) agg, one value agg, a cumulative window
    over the DISTINCT-value table (bounded rational support — the
    m23/m24 argument), one group agg, one scalar row."""
    vals = tbl(spark, sf_dir, "events").select(
        (F.col("value").cast("decimal(18,2)") * 100)
        .cast("long")
        .alias("vc"),
        F.col("event_type").alias("g"),
    )
    per = vals.groupBy("vc", "g").agg(F.count("*").alias("c"))
    per = per.transform(shared_plan)  # feeds perv AND contrib
    perv = per.groupBy("vc").agg(F.sum("c").cast("long").alias("t"))
    wcum = Window.orderBy("vc").rowsBetween(Window.unboundedPreceding, -1)
    ranked = perv.select(
        "vc",
        "t",
        F.coalesce(F.sum("t").over(wcum), F.lit(0))
        .cast("long")
        .alias("cum_before"),
    )
    d38 = "decimal(38,0)"
    contrib = (
        per.join(ranked, "vc")
        .groupBy("g")
        .agg(
            F.sum(
                F.col("c").cast(d38)
                * (2 * F.col("cum_before") + F.col("t") + 1).cast(d38)
            )
            .cast(d38)
            .alias("r2"),
            F.sum("c").cast(d38).alias("n_g"),
        )
    )
    ties = perv.agg(
        F.sum(
            F.col("t").cast(d38) * F.col("t").cast(d38) * F.col("t").cast(d38)
            - F.col("t").cast(d38)
        )
        .cast(d38)
        .alias("tie_q")
    )
    tot = contrib.agg(
        F.sum("n_g").cast(d38).alias("n"),
        F.sum(
            F.expr("CAST((1000000 * r2 * r2) div (4 * n_g) AS DECIMAL(38,0))")
        )
        .cast(d38)
        .alias("s_q"),
        F.count("*").cast("int").alias("n_groups"),
    )
    return tot.crossJoin(F.broadcast(ties)).selectExpr(
        "CAST(n AS BIGINT) AS n_total",
        "n_groups",
        """CAST((12 * s_q) div (n * (n + 1))
                - 3000000 * (n + 1) AS BIGINT) AS h_ppm""",
        """CAST((((12 * s_q) div (n * (n + 1)) - 3000000 * (n + 1))
                 * (n * n * n - n))
                div NULLIF(n * n * n - n - tie_q, 0)
             AS BIGINT) AS h_tie_corrected_ppm""",
    )


# --- Spearman rank correlation ----------------------------------------------------------
@query(
    "m37_spearman",
    oracle="""
    WITH v AS (
      SELECT CAST(ts AS DATE) AS d,
             CAST(SUM(CAST(value AS DECIMAL(18,2)) * 100) AS BIGINT) AS x,
             CAST(COUNT(*) AS BIGINT) AS y
      FROM events GROUP BY 1
    ),
    rx AS (
      SELECT d, CAST(2 * (RANK() OVER (ORDER BY x) - 1)
               + COUNT(*) OVER (PARTITION BY x) + 1 AS BIGINT) AS xr2
      FROM v
    ),
    ry AS (
      SELECT d, CAST(2 * (RANK() OVER (ORDER BY y) - 1)
               + COUNT(*) OVER (PARTITION BY y) + 1 AS BIGINT) AS yr2
      FROM v
    ),
    m AS (
      SELECT CAST(COUNT(*) AS HUGEINT) AS n,
             CAST(SUM(CAST(xr2 AS HUGEINT)) AS HUGEINT) AS sx,
             CAST(SUM(CAST(yr2 AS HUGEINT)) AS HUGEINT) AS sy,
             CAST(SUM(CAST(xr2 AS HUGEINT) * yr2) AS HUGEINT) AS sxy,
             CAST(SUM(CAST(xr2 AS HUGEINT) * xr2) AS HUGEINT) AS sxx,
             CAST(SUM(CAST(yr2 AS HUGEINT) * yr2) AS HUGEINT) AS syy
      FROM rx JOIN ry USING (d)
    )
    SELECT CAST(n AS BIGINT) AS n_days,
           CAST(n * sxy - sx * sy AS DOUBLE)
             / SQRT(CAST(n * sxx - sx * sx AS DOUBLE)
                    * CAST(n * syy - sy * sy AS DOUBLE)) AS spearman_r
    FROM m
    """,
)
def m37_spearman(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spearman rank correlation between the daily total value and the
    daily event count — the monotone-association companion to the
    Pearson family (w_rolling_corr31, ts_cross_correlation), robust to
    the outliers that bend Pearson.

    Ranks use the SAME doubled-average-rank trick as Kruskal–Wallis —
    2·(RANK−1) + tie_count + 1, exact integers (a ROWS-frame count
    would order tied rows arbitrarily; RANK counts strictly-smaller
    rows, tie-stable on both engines) — over the calendar-bounded
    daily table, the moment sums are exact
    HUGEINT/DECIMAL(38) integers, and r is ONE shared IEEE expression
    — the per-day doubled ranks are <= 2·366, so every moment sits far
    under 2^53 at any corpus size (the series is calendar-bounded)."""
    v = (
        tbl(spark, sf_dir, "events")
        .groupBy(F.to_date("ts").alias("d"))
        .agg(
            F.sum(F.col("value").cast("decimal(18,2)") * 100)
            .cast("long")
            .alias("x"),
            F.count("*").alias("y"),
        )
        .transform(shared_plan)
    )

    def ranks(col, out):
        # RANK()-1 = #rows strictly smaller (tie-stable, unlike a ROWS
        # frame which counts tied rows in arbitrary order)
        return v.select(
            "d",
            (
                2 * (F.rank().over(Window.orderBy(col)) - 1)
                + F.count("*").over(Window.partitionBy(col))
                + 1
            )
            .cast("long")
            .alias(out),
        )

    d38 = "decimal(38,0)"
    joined = ranks("x", "xr2").join(ranks("y", "yr2"), "d")
    m = joined.agg(
        F.count("*").cast(d38).alias("n"),
        F.sum(F.col("xr2").cast(d38)).cast(d38).alias("sx"),
        F.sum(F.col("yr2").cast(d38)).cast(d38).alias("sy"),
        F.sum(F.col("xr2").cast(d38) * F.col("yr2").cast(d38))
        .cast(d38)
        .alias("sxy"),
        F.sum(F.col("xr2").cast(d38) * F.col("xr2").cast(d38))
        .cast(d38)
        .alias("sxx"),
        F.sum(F.col("yr2").cast(d38) * F.col("yr2").cast(d38))
        .cast(d38)
        .alias("syy"),
    )
    return m.select(
        F.col("n").cast("long").alias("n_days"),
        (
            (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")).cast(
                "double"
            )
            / F.sqrt(
                (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")).cast(
                    "double"
                )
                * (F.col("n") * F.col("syy") - F.col("sy") * F.col("sy")).cast(
                    "double"
                )
            )
        ).alias("spearman_r"),
    )


# --- Kendall tau-b -----------------------------------------------------------------------
@query(
    "m38_kendall_tau",
    oracle="""
    WITH v AS (
      SELECT CAST(ts AS DATE) AS d,
             CAST(SUM(CAST(value AS DECIMAL(18,2)) * 100) AS BIGINT) AS x,
             CAST(COUNT(*) AS BIGINT) AS y
      FROM events GROUP BY 1
    ),
    pairs AS (
      SELECT CASE WHEN (a.x - b.x) * (a.y - b.y) > 0 THEN 1 ELSE 0 END AS conc,
             CASE WHEN (a.x - b.x) * (a.y - b.y) < 0 THEN 1 ELSE 0 END AS disc,
             CASE WHEN a.x = b.x AND a.y <> b.y THEN 1 ELSE 0 END AS tx,
             CASE WHEN a.y = b.y AND a.x <> b.x THEN 1 ELSE 0 END AS ty
      FROM v a JOIN v b ON a.d < b.d
    ),
    agg AS (
      SELECT CAST(SUM(conc) AS BIGINT) AS c, CAST(SUM(disc) AS BIGINT) AS dd,
             CAST(SUM(tx) AS BIGINT) AS tx, CAST(SUM(ty) AS BIGINT) AS ty
      FROM pairs
    )
    SELECT c AS concordant, dd AS discordant, tx AS ties_x, ty AS ties_y,
           CAST(c - dd AS DOUBLE)
             / SQRT(CAST((c + dd + tx) AS DOUBLE) * (c + dd + ty)) AS tau_b
    FROM agg
    """,
)
def m38_kendall_tau(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kendall tau-b between the daily total value and event count —
    the pairwise-concordance association measure (more robust small-n
    inference than Spearman, and the one with the clean U-statistic
    interpretation).  Concordant/discordant/tie counts are exact
    integers off an O(days²) self-join on the CALENDAR-bounded daily
    table (<= 366 rows/year — constant work at any corpus size, the
    Theil–Sen argument); tau-b is ONE shared IEEE expression."""
    v = (
        tbl(spark, sf_dir, "events")
        .groupBy(F.to_date("ts").alias("d"))
        .agg(
            F.sum(F.col("value").cast("decimal(18,2)") * 100)
            .cast("long")
            .alias("x"),
            F.count("*").alias("y"),
        )
        .transform(shared_plan)
    )
    b = v.select(
        F.col("d").alias("bd"), F.col("x").alias("bx"), F.col("y").alias("by")
    )
    dx = F.col("x") - F.col("bx")
    dy = F.col("y") - F.col("by")
    pairs = v.join(b, F.col("d") < F.col("bd")).select(
        F.when(dx * dy > 0, 1).otherwise(0).alias("conc"),
        F.when(dx * dy < 0, 1).otherwise(0).alias("disc"),
        F.when((dx == 0) & (dy != 0), 1).otherwise(0).alias("tx"),
        F.when((dy == 0) & (dx != 0), 1).otherwise(0).alias("ty"),
    )
    agg = pairs.agg(
        F.sum("conc").cast("long").alias("c"),
        F.sum("disc").cast("long").alias("dd"),
        F.sum("tx").cast("long").alias("tx"),
        F.sum("ty").cast("long").alias("ty"),
    )
    return agg.select(
        F.col("c").alias("concordant"),
        F.col("dd").alias("discordant"),
        F.col("tx").alias("ties_x"),
        F.col("ty").alias("ties_y"),
        (
            (F.col("c") - F.col("dd")).cast("double")
            / F.sqrt(
                (F.col("c") + F.col("dd") + F.col("tx")).cast("double")
                * (F.col("c") + F.col("dd") + F.col("ty")).cast("double")
            )
        ).alias("tau_b"),
    )


# --- round-number bias ------------------------------------------------------------------
@query(
    "dq_round_number_bias",
    oracle="""
    WITH c AS (
      SELECT CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS vc
      FROM orders
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM((vc % 100 = 0)::INT) AS BIGINT) AS whole_dollar,
           CAST(SUM((vc % 1000 = 0)::INT) AS BIGINT) AS ten_dollar,
           CAST(SUM((vc % 100 = 99)::INT) AS BIGINT) AS charm_99,
           CAST((1000000 * SUM((vc % 100 = 0)::INT)) // COUNT(*) AS BIGINT)
             AS whole_dollar_ppm,
           CAST(SUM((vc % 100 = 0)::INT) * 100 > 3 * COUNT(*) AS BOOLEAN)
             AS biased_3pct
    FROM c
    """,
)
def dq_round_number_bias(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Round-number clustering screen — the forensic-accounting sibling
    of dq_benford_digits: under organic pricing, exact whole-dollar
    amounts (cents % 100 = 0) occur ~1% of the time; fabricated or
    hand-keyed figures cluster on round numbers (and psychologically
    priced ones on .99).  Exact integer modular counts, truncating ppm
    rate, and an integer cross-product verdict at the 3% threshold —
    one map-side-combinable scalar aggregation."""
    c = tbl(spark, sf_dir, "orders").select(
        (F.col("o_totalprice").cast("decimal(18,2)") * 100)
        .cast("long")
        .alias("vc")
    )
    return c.agg(
        F.count("*").alias("n"),
        F.sum((F.col("vc") % 100 == 0).cast("int"))
        .cast("long")
        .alias("whole_dollar"),
        F.sum((F.col("vc") % 1000 == 0).cast("int"))
        .cast("long")
        .alias("ten_dollar"),
        F.sum((F.col("vc") % 100 == 99).cast("int"))
        .cast("long")
        .alias("charm_99"),
        F.expr(
            "CAST((1000000 * SUM(CAST(vc % 100 = 0 AS INT)))"
            " div COUNT(*) AS BIGINT)"
        ).alias("whole_dollar_ppm"),
        F.expr(
            "CAST(SUM(CAST(vc % 100 = 0 AS INT)) * 100 > 3 * COUNT(*)"
            " AS BOOLEAN)"
        ).alias("biased_3pct"),
    )


# --- session bounce rate ------------------------------------------------------------------
@query(
    "w_bounce_rate",
    oracle="""
    WITH iv AS (
      SELECT DISTINCT user_id,
             epoch_us(CAST(ts AS TIMESTAMP)) AS s_us,
             epoch_us(CAST(ts AS TIMESTAMP)) + 1800000000 AS e_us
      FROM events
    ),
    flagged AS (
      SELECT user_id, s_us, e_us,
             CASE WHEN s_us > COALESCE(MAX(e_us) OVER (
                    PARTITION BY user_id ORDER BY s_us, e_us
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), -1)
                  THEN 1 ELSE 0 END AS new_island
      FROM iv
    ),
    sessions AS (
      SELECT user_id,
             CAST(MIN(s_us) AS BIGINT) AS start_us,
             CAST(COUNT(*) AS BIGINT) AS n_events
      FROM (
        SELECT user_id, s_us,
               SUM(new_island) OVER (
                 PARTITION BY user_id ORDER BY s_us, e_us
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS island
        FROM flagged
      ) GROUP BY user_id, island
    )
    SELECT CAST(to_timestamp(start_us // 1000000) AS DATE) AS d,
           CAST(COUNT(*) AS BIGINT) AS n_sessions,
           CAST(SUM((n_events = 1)::INT) AS BIGINT) AS n_bounce,
           CAST((1000000 * SUM((n_events = 1)::INT)) // COUNT(*) AS BIGINT)
             AS bounce_ppm
    FROM sessions GROUP BY 1
    """,
)
def w_bounce_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily session bounce rate: sessions (the SAME 30-minute-overlap
    islands as w_interval_merge — identical window recipe, so the two
    session definitions cannot diverge) containing exactly ONE event,
    as a share of sessions starting that day — the engagement-quality
    headline next to funnel depth and lifecycle states.

    Exact integer counts and one truncating ppm; session timestamps
    stay BIGINT microseconds until the final date bucketing (UTC
    micros -> date is identical arithmetic on both engines)."""
    iv = (
        tbl(spark, sf_dir, "events")
        .select(
            "user_id",
            (F.unix_micros(F.col("ts").cast("timestamp"))).alias("s_us"),
        )
        .distinct()
        .withColumn("e_us", F.col("s_us") + F.lit(1800000000).cast("long"))
    )
    wprev = (
        Window.partitionBy("user_id")
        .orderBy("s_us", "e_us")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    wrun = (
        Window.partitionBy("user_id")
        .orderBy("s_us", "e_us")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    flagged = iv.withColumn(
        "new_island",
        F.when(
            F.col("s_us")
            > F.coalesce(F.max("e_us").over(wprev), F.lit(-1).cast("long")),
            F.lit(1),
        ).otherwise(F.lit(0)),
    )
    sessions = (
        flagged.withColumn("island", F.sum("new_island").over(wrun))
        .groupBy("user_id", "island")
        .agg(
            F.min("s_us").alias("start_us"),
            F.count("*").alias("n_events"),
        )
    )
    return (
        sessions.groupBy(
            F.to_date(F.timestamp_seconds(F.expr("start_us div 1000000")))
            .alias("d")
        )
        .agg(
            F.count("*").alias("n_sessions"),
            F.sum((F.col("n_events") == 1).cast("int"))
            .cast("long")
            .alias("n_bounce"),
            F.expr(
                "CAST((1000000 * SUM(CAST(n_events = 1 AS INT)))"
                " div COUNT(*) AS BIGINT)"
            ).alias("bounce_ppm"),
        )
    )


# --- spectral periodogram at candidate seasonal periods (r10) -------------------------
@query(
    "ts_periodogram",
    oracle=f"""
    WITH {_ACF_CTES},
    md AS (SELECT MIN(d) AS d0, CAST(COUNT(*) AS BIGINT) AS nd FROM c),
    pts AS (
      SELECT CAST(c.c AS DOUBLE) AS x,
             CAST(date_diff('day', md.d0, c.d) AS DOUBLE) AS t
      FROM c, md
    ),
    periods AS (SELECT unnest([7, 30, 91, 365]) AS period),
    sums AS (
      SELECT period,
             SUM(x * cos(6.283185307179586 * t / CAST(period AS DOUBLE)))
               AS sc,
             SUM(x * sin(6.283185307179586 * t / CAST(period AS DOUBLE)))
               AS ss
      FROM pts, periods GROUP BY 1
    )
    SELECT CAST(period AS INTEGER) AS period, md.nd AS n_days,
           ROUND((sc * sc + ss * ss)
                 / (CAST(md.nd AS DOUBLE) * CAST(den.den AS DOUBLE)), 9)
             AS power_frac
    FROM sums, md, den
    """,
)
def ts_periodogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Discrete-Fourier power of the daily total-value series at the
    candidate seasonal periods (7/30/91/365 days) — the frequency-
    domain sibling of ts_acf/ts_seasonality_strength: a sharp weekly
    cycle shows as power_frac concentration at period 7.  power_frac
    = (Sc^2 + Ss^2) / (n * sum c^2) with Sc = sum c_t cos(2*pi*t/T),
    Ss likewise — the normalized periodogram ordinate in [0, ~1].

    Shares the exact scaled-centered daily frame with ts_acf
    (``_centered_daily`` / the ``c`` CTE of ``_ACF_CTES``) so the
    spectral and autocorrelation views can never disagree about the
    series.  Plan: calendar-bounded daily aggregate, 1-row min/count
    broadcast, a 4-row period grid cross join, one hash aggregation.
    Floats: the trig sums are order-dependent and JVM/libm cos can
    differ in the last ulp, so power_frac rounds to 9 digits (the
    accumulated error is ~1e-13 relative; values are O(1))."""
    d38 = "decimal(38,0)"
    c = _centered_daily(spark, sf_dir)
    den = c.agg(F.sum(F.col("c") * F.col("c")).cast(d38).alias("den"))
    md = c.agg(
        F.min("d").alias("d0"), F.count("*").cast("long").alias("nd")
    )
    pts = c.crossJoin(F.broadcast(md)).select(
        F.col("c").cast("double").alias("x"),
        F.datediff(F.col("d"), F.col("d0")).cast("double").alias("t"),
        "nd",
    )
    periods = F.array(*[F.lit(p) for p in (7, 30, 91, 365)])
    tau = 6.283185307179586
    ang = tau * F.col("t") / F.col("period").cast("double")
    sums = (
        pts.select("x", "t", "nd", F.explode(periods).alias("period"))
        .groupBy("period")
        .agg(
            F.sum(F.col("x") * F.cos(ang)).alias("sc"),
            F.sum(F.col("x") * F.sin(ang)).alias("ss"),
            F.max("nd").alias("nd"),
        )
    )
    return sums.crossJoin(F.broadcast(den)).select(
        F.col("period").cast("int").alias("period"),
        F.col("nd").alias("n_days"),
        F.round(
            (F.col("sc") * F.col("sc") + F.col("ss") * F.col("ss"))
            / (F.col("nd").cast("double") * F.col("den").cast("double")),
            9,
        ).alias("power_frac"),
    )
