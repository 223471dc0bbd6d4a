"""Representative TPC-DS query SHAPES over the TPC-H-ish testdata —
the decision-support patterns TPC-H lacks: correlated above-average
filters (DS Q1), ROLLUP + windowed top-n per category (DS Q67), and
count-band cohort selection (DS Q34).

Exactness discipline: every comparison is integer cross-multiplied
(never a float threshold), sums are exact cents, ranks are
deterministically tie-broken — all three gates hash strictly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from . import query
from ._util import shared_plan, tbl


@query(
    "ds_q1_above_avg_returns",
    oracle="""
    WITH cret AS (
      SELECT c.c_custkey AS custkey, c.c_nationkey AS nation,
             CAST(SUM(CAST(CAST(l.l_extendedprice AS DECIMAL(18,2)) * 100
                           AS BIGINT)) AS BIGINT) AS ret_c
      FROM lineitem l
      JOIN orders o ON o.o_orderkey = l.l_orderkey
      JOIN customer c ON c.c_custkey = o.o_custkey
      WHERE l.l_returnflag = 'R'
      GROUP BY 1, 2
    ),
    nat AS (
      SELECT nation, CAST(SUM(ret_c) AS BIGINT) AS tot,
             CAST(COUNT(*) AS BIGINT) AS n
      FROM cret GROUP BY nation
    )
    SELECT c.custkey, CAST(c.nation AS INT) AS nation, c.ret_c
    FROM cret c JOIN nat ON nat.nation = c.nation
    WHERE 5 * c.ret_c * nat.n > 6 * nat.tot
    """,
)
def ds_q1_above_avg_returns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DS Q1 shape: customers whose returned revenue exceeds 1.2x their
    nation's per-customer average — the correlated-subquery pattern,
    decorrelated to one agg + one broadcast join, with the 1.2x
    threshold as the integer cross-product 5·rev·n > 6·total (no
    float ever formed)."""
    li = tbl(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    o = tbl(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    c = tbl(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("custkey"),
        F.col("c_nationkey").alias("nation"),
    )
    cret = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), F.col("o_custkey") == F.col("custkey"))
        .groupBy("custkey", "nation")
        .agg(
            F.sum(
                (F.col("l_extendedprice").cast("decimal(18,2)") * 100).cast(
                    "long"
                )
            )
            .cast("long")
            .alias("ret_c")
        )
    )
    nat = cret.groupBy("nation").agg(
        F.sum("ret_c").cast("long").alias("tot"),
        F.count("*").alias("n"),
    )
    return (
        cret.join(F.broadcast(nat), "nation")
        .filter(5 * F.col("ret_c") * F.col("n") > 6 * F.col("tot"))
        .select("custkey", F.col("nation").cast("int"), "ret_c")
    )


@query(
    "ds_q67_topn_per_category",
    oracle="""
    WITH sales AS (
      SELECT p.p_type AS ptype, p.p_brand AS brand,
             CAST(SUM(CAST(CAST(l.l_extendedprice AS DECIMAL(18,2)) * 100
                           AS BIGINT)) AS BIGINT) AS sales_c
      FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
      GROUP BY ROLLUP (p.p_type, p.p_brand)
    ),
    named AS (
      -- COALESCE BEFORE the window: ranking over the raw nullable
      -- brand would tie-break subtotal rows as NULL (NULLS LAST)
      -- while the Spark side ranks the '(all)' string (sorts FIRST) —
      -- divergent rnk on any sales tie (e.g. a single-brand type)
      SELECT COALESCE(ptype, '(all)') AS ptype,
             COALESCE(brand, '(all)') AS brand,
             sales_c
      FROM sales
    ),
    ranked AS (
      SELECT ptype, brand, sales_c,
             row_number() OVER (
               PARTITION BY ptype ORDER BY sales_c DESC, brand
             ) AS rnk
      FROM named
    )
    SELECT ptype, brand, sales_c, CAST(rnk AS INT) AS rnk
    FROM ranked WHERE rnk <= 3
    """,
)
def ds_q67_topn_per_category(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DS Q67 shape: ROLLUP(type, brand) sales subtotals, then the top
    3 rows per type partition by exact-cents sales (rank tie-broken by
    brand).  ROLLUP's map-side expand + one hash agg + a
    partition-bounded window — the grouping-sets + windowed top-n
    combination TPC-H never exercises."""
    li = tbl(spark, sf_dir, "lineitem")
    p = tbl(spark, sf_dir, "part").select(
        F.col("p_partkey").alias("l_partkey"),
        F.col("p_type").alias("ptype"),
        F.col("p_brand").alias("brand"),
    )
    sales = (
        li.join(F.broadcast(p), "l_partkey")
        .rollup("ptype", "brand")
        .agg(
            F.sum(
                (F.col("l_extendedprice").cast("decimal(18,2)") * 100).cast(
                    "long"
                )
            )
            .cast("long")
            .alias("sales_c")
        )
    )
    w = Window.partitionBy("ptype").orderBy(
        F.desc("sales_c"), F.asc("brand")
    )
    return (
        sales.select(
            F.coalesce("ptype", F.lit("(all)")).alias("ptype"),
            F.coalesce("brand", F.lit("(all)")).alias("brand"),
            "sales_c",
        )
        .withColumn("rnk", F.row_number().over(w).cast("int"))
        .filter(F.col("rnk") <= 3)
    )


@query(
    "ds_q34_count_band_cohort",
    oracle="""
    WITH per_cust AS (
      SELECT o_custkey AS custkey, CAST(COUNT(*) AS BIGINT) AS n_orders,
             CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100
                           AS BIGINT)) AS BIGINT) AS spend_c
      FROM orders
      WHERE o_orderpriority IN ('1-URGENT', '2-HIGH')
      GROUP BY 1
    )
    SELECT p.custkey, c.c_mktsegment AS segment, p.n_orders, p.spend_c
    FROM per_cust p JOIN customer c ON c.c_custkey = p.custkey
    WHERE p.n_orders BETWEEN 8 AND 12
    """,
)
def ds_q34_count_band_cohort(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DS Q34 shape: the count-BAND cohort (customers with 8-12
    urgent/high orders) joined back to the dimension for attributes —
    HAVING-band selection plus enrichment, all integer outputs."""
    o = tbl(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    )
    per_cust = o.groupBy(F.col("o_custkey").alias("custkey")).agg(
        F.count("*").alias("n_orders"),
        F.sum(
            (F.col("o_totalprice").cast("decimal(18,2)") * 100).cast("long")
        )
        .cast("long")
        .alias("spend_c"),
    ).filter(F.col("n_orders").between(8, 12))
    c = tbl(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("custkey"),
        F.col("c_mktsegment").alias("segment"),
    )
    return per_cust.join(F.broadcast(c), "custkey").select(
        "custkey", "segment", "n_orders", "spend_c"
    )


@query(
    "ds_q88_time_bands",
    oracle="""
    SELECT event_type,
           CAST(COUNT(*) FILTER (WHERE hour(ts) < 3) AS BIGINT) AS h00_02,
           CAST(COUNT(*) FILTER (WHERE hour(ts) >= 3 AND hour(ts) < 6) AS BIGINT) AS h03_05,
           CAST(COUNT(*) FILTER (WHERE hour(ts) >= 6 AND hour(ts) < 9) AS BIGINT) AS h06_08,
           CAST(COUNT(*) FILTER (WHERE hour(ts) >= 9 AND hour(ts) < 12) AS BIGINT) AS h09_11,
           CAST(COUNT(*) FILTER (WHERE hour(ts) >= 12 AND hour(ts) < 15) AS BIGINT) AS h12_14,
           CAST(COUNT(*) FILTER (WHERE hour(ts) >= 15 AND hour(ts) < 18) AS BIGINT) AS h15_17,
           CAST(COUNT(*) FILTER (WHERE hour(ts) >= 18 AND hour(ts) < 21) AS BIGINT) AS h18_20,
           CAST(COUNT(*) FILTER (WHERE hour(ts) >= 21) AS BIGINT) AS h21_23
    FROM events GROUP BY event_type
    """,
)
def ds_q88_time_bands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DS Q88 shape: event counts across eight 3-hour day-part bands in
    ONE scan — the multi-band conditional-aggregation pattern that a
    naive translation writes as 8 self-joined subqueries.  Expressed as
    8 filtered counts inside a single hash aggregate, so the fact table
    is read once at any scale."""
    ev = tbl(spark, sf_dir, "events")
    h = F.hour("ts")

    def band(lo: int | None, hi: int | None, name: str):
        cond = F.lit(True)
        if lo is not None:
            cond = cond & (h >= lo)
        if hi is not None:
            cond = cond & (h < hi)
        return F.count(F.when(cond, 1)).alias(name)

    return ev.groupBy("event_type").agg(
        band(None, 3, "h00_02"),
        band(3, 6, "h03_05"),
        band(6, 9, "h06_08"),
        band(9, 12, "h09_11"),
        band(12, 15, "h12_14"),
        band(15, 18, "h15_17"),
        band(18, 21, "h18_20"),
        band(21, None, "h21_23"),
    )


@query(
    "ds_q35_exists_profile",
    oracle="""
    SELECT c.c_mktsegment,
           CAST(COUNT(*) AS BIGINT) AS n_customers,
           CAST(SUM(CASE WHEN r.c_custkey IS NOT NULL THEN 1 ELSE 0 END)
                AS BIGINT) AS n_with_returns,
           CAST(SUM(CASE WHEN u.c_custkey IS NOT NULL THEN 1 ELSE 0 END)
                AS BIGINT) AS n_with_urgent
    FROM customer c
    JOIN (SELECT DISTINCT o_custkey FROM orders) a
      ON a.o_custkey = c.c_custkey
    LEFT JOIN (
      SELECT DISTINCT o.o_custkey AS c_custkey
      FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
      WHERE l.l_returnflag = 'R'
    ) r ON r.c_custkey = c.c_custkey
    LEFT JOIN (
      SELECT DISTINCT o_custkey AS c_custkey FROM orders
      WHERE o_orderpriority = '1-URGENT'
    ) u ON u.c_custkey = c.c_custkey
    GROUP BY c.c_mktsegment
    """,
)
def ds_q35_exists_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DS Q35 shape: per-segment customer profile gated on EXISTS
    (customer placed any order) with two further EXISTS flags (any
    returned line, any urgent order).  Each EXISTS decorrelates to a
    distinct-key semi/left join — never a per-row subquery — so the
    shape is three key-distinct builds + joins on the customer key at
    any scale."""
    c = tbl(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    o = tbl(spark, sf_dir, "orders")
    li = tbl(spark, sf_dir, "lineitem").select("l_orderkey", "l_returnflag")
    active = o.select(F.col("o_custkey").alias("c_custkey")).distinct()
    returns = (
        o.join(
            li.filter(F.col("l_returnflag") == "R"),
            o.o_orderkey == li.l_orderkey,
        )
        .select(F.col("o_custkey").alias("c_custkey"))
        .distinct()
        .withColumn("has_ret", F.lit(1))
    )
    urgent = (
        o.filter(F.col("o_orderpriority") == "1-URGENT")
        .select(F.col("o_custkey").alias("c_custkey"))
        .distinct()
        .withColumn("has_urg", F.lit(1))
    )
    return (
        c.join(active, "c_custkey")
        .join(returns, "c_custkey", "left")
        .join(urgent, "c_custkey", "left")
        .groupBy("c_mktsegment")
        .agg(
            F.count("*").alias("n_customers"),
            F.sum(F.when(F.col("has_ret").isNotNull(), 1).otherwise(0)).alias(
                "n_with_returns"
            ),
            F.sum(F.when(F.col("has_urg").isNotNull(), 1).otherwise(0)).alias(
                "n_with_urgent"
            ),
        )
    )


@query(
    "ds_q51_cumulative_channels",
    oracle="""
    WITH ord AS (
      SELECT CAST(o_orderdate AS DATE) AS d,
             CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100
                           AS BIGINT)) AS BIGINT) AS rev_c
      FROM orders GROUP BY 1
    ),
    shp AS (
      SELECT CAST(l_shipdate AS DATE) AS d,
             CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100
                           AS BIGINT)) AS BIGINT) AS rev_c
      FROM lineitem GROUP BY 1
    ),
    days AS (
      SELECT d FROM ord UNION SELECT d FROM shp
    ),
    cum AS (
      SELECT days.d,
             SUM(COALESCE(ord.rev_c, 0)) OVER w AS cum_order_c,
             SUM(COALESCE(shp.rev_c, 0)) OVER w AS cum_ship_c
      FROM days
      LEFT JOIN ord ON ord.d = days.d
      LEFT JOIN shp ON shp.d = days.d
      WINDOW w AS (ORDER BY days.d
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    )
    SELECT d, CAST(cum_order_c AS BIGINT) AS cum_order_c,
           CAST(cum_ship_c AS BIGINT) AS cum_ship_c,
           cum_order_c > cum_ship_c AS orders_ahead
    FROM cum
    """,
)
def ds_q51_cumulative_channels(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DS Q51 shape: two channels' cumulative revenue compared day by
    day (orders booked vs lineitems shipped) — the full-outer-union +
    running-total pattern.  Both channel tables pre-aggregate to
    calendar-day cardinality BEFORE the union and window, so the
    running sums ride a bounded frame (the sanctioned unpartitioned-
    window shape) and stay exact integer cents at any scale."""
    ord_d = (
        tbl(spark, sf_dir, "orders")
        .groupBy(F.to_date("o_orderdate").alias("d"))
        .agg(
            F.sum(
                (F.col("o_totalprice").cast("decimal(18,2)") * 100).cast(
                    "long"
                )
            )
            .cast("long")
            .alias("o_rev_c")
        )
    )
    shp_d = (
        tbl(spark, sf_dir, "lineitem")
        .groupBy(F.to_date("l_shipdate").alias("d"))
        .agg(
            F.sum(
                (F.col("l_extendedprice").cast("decimal(18,2)") * 100).cast(
                    "long"
                )
            )
            .cast("long")
            .alias("s_rev_c")
        )
    )
    days = ord_d.select("d").union(shp_d.select("d")).distinct()
    w = Window.orderBy("d").rowsBetween(Window.unboundedPreceding, 0)
    cum = (
        days.join(ord_d, "d", "left")
        .join(shp_d, "d", "left")
        .select(
            "d",
            F.sum(F.coalesce("o_rev_c", F.lit(0))).over(w).alias("cum_order_c"),
            F.sum(F.coalesce("s_rev_c", F.lit(0))).over(w).alias("cum_ship_c"),
        )
    )
    return cum.select(
        "d",
        "cum_order_c",
        "cum_ship_c",
        (F.col("cum_order_c") > F.col("cum_ship_c")).alias("orders_ahead"),
    )


@query(
    "ds_q47_sales_deviation",
    oracle="""
    WITH ms AS (
      SELECT p.p_brand AS brand,
             CAST(EXTRACT(year FROM o.o_orderdate) AS INT) AS yr,
             CAST(EXTRACT(month FROM o.o_orderdate) AS INT) AS mo,
             CAST(SUM(CAST(CAST(l.l_extendedprice AS DECIMAL(18,2)) * 100
                           AS BIGINT)) AS BIGINT) AS sales_c
      FROM lineitem l
      JOIN orders o ON o.o_orderkey = l.l_orderkey
      JOIN part p ON p.p_partkey = l.l_partkey
      GROUP BY 1, 2, 3
    ),
    ya AS (
      SELECT brand, yr, CAST(SUM(CAST(sales_c AS HUGEINT)) AS HUGEINT) AS y,
             CAST(COUNT(*) AS HUGEINT) AS n
      FROM ms GROUP BY 1, 2
    ),
    wd AS (
      SELECT ms.brand, ms.yr, ms.mo, ms.sales_c, ya.y, ya.n,
             LAG(ms.sales_c) OVER (
               PARTITION BY ms.brand ORDER BY ms.yr, ms.mo) AS prev_c,
             LEAD(ms.sales_c) OVER (
               PARTITION BY ms.brand ORDER BY ms.yr, ms.mo) AS next_c
      FROM ms JOIN ya ON ya.brand = ms.brand AND ya.yr = ms.yr
    )
    SELECT brand, yr, mo, sales_c, prev_c, next_c,
           CAST((1000000 * (n * CAST(sales_c AS HUGEINT) - y))
                // NULLIF(y * n, 0) AS BIGINT) AS dev_ppm
    FROM wd
    WHERE 10 * ABS(n * CAST(sales_c AS HUGEINT) - y) > y * n
    """,
)
def ds_q47_sales_deviation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DS Q47 shape: brand-months whose sales deviate >10% from that
    brand's yearly monthly average, with the chronological lag/lead
    neighbor months attached — the time-series-deviation
    decision-support pattern (monthly agg -> per-year stats join ->
    LAG/LEAD window -> threshold).

    The 10% threshold is the integer cross-product 10*|n*m - y| >
    y*n (no float formed); the deviation itself is one truncating
    ppm division over DECIMAL(38,0)/HUGEINT moments.  The lag/lead
    window is PARTITIONED BY brand (brand-cardinality state, never
    global), computed BEFORE the filter per Q47 semantics so the
    neighbors of a flagged month are its true calendar neighbors."""
    li = tbl(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey", "l_extendedprice"
    )
    o = tbl(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    p = tbl(spark, sf_dir, "part").select(
        F.col("p_partkey"), F.col("p_brand").alias("brand")
    )
    # The shared checkpoint sits BELOW the dim join (r8): the expensive
    # fact-side work — lineitem x orders join + part-month agg — is
    # checkpointed once, and the broadcast-hinted part join + the cheap
    # brand re-agg run above it.  An explicit broadcast hint INSIDE a
    # lazy checkpoint fires its exchange at plan-RDD creation, which
    # was this query's construction job (the old SHARED exemption);
    # above the checkpoint it fires at first action, where it belongs.
    pm = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .groupBy(
            "l_partkey",
            F.year("o_orderdate").alias("yr"),
            F.month("o_orderdate").alias("mo"),
        )
        .agg(
            F.sum(
                (F.col("l_extendedprice").cast("decimal(18,2)") * 100)
                .cast("long")
            )
            .cast("long")
            .alias("sales_c")
        )
        .transform(shared_plan)
    )
    ms = (
        pm.join(F.broadcast(p), pm.l_partkey == p.p_partkey)
        .groupBy("brand", "yr", "mo")
        .agg(F.sum("sales_c").cast("long").alias("sales_c"))
    )
    d38 = "decimal(38,0)"
    ya = ms.groupBy("brand", "yr").agg(
        F.sum(F.col("sales_c").cast(d38)).cast(d38).alias("y"),
        F.count("*").cast(d38).alias("n"),
    )
    w = Window.partitionBy("brand").orderBy("yr", "mo")
    wd = ms.join(ya, ["brand", "yr"]).select(
        "brand",
        "yr",
        "mo",
        "sales_c",
        "y",
        "n",
        F.lag("sales_c").over(w).alias("prev_c"),
        F.lead("sales_c").over(w).alias("next_c"),
    )
    dev = F.col("n") * F.col("sales_c").cast(d38) - F.col("y")
    return wd.filter(
        10 * F.abs(dev) > F.col("y") * F.col("n")
    ).select(
        "brand",
        "yr",
        "mo",
        "sales_c",
        "prev_c",
        "next_c",
        F.expr(
            "CAST((1000000 * (n * CAST(sales_c AS DECIMAL(38,0)) - y))"
            " div NULLIF(y * n, 0) AS BIGINT)"
        ).alias("dev_ppm"),
    )


@query(
    "ds_q74_yoy_growth",
    oracle="""
    WITH ys AS (
      SELECT o_custkey AS custkey,
             CAST(SUM(CASE WHEN EXTRACT(year FROM o_orderdate) = 1998
                      THEN CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100
                                AS BIGINT) ELSE 0 END) AS BIGINT) AS s1,
             CAST(SUM(CASE WHEN EXTRACT(year FROM o_orderdate) = 1999
                      THEN CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100
                                AS BIGINT) ELSE 0 END) AS BIGINT) AS s2
      FROM orders GROUP BY 1
    )
    SELECT custkey, s1, s2,
           CAST((1000000 * CAST(s2 AS HUGEINT)) // s1 AS BIGINT)
               AS growth_ppm
    FROM ys WHERE s1 > 0
    ORDER BY growth_ppm DESC, custkey ASC LIMIT 100
    """,
)
def ds_q74_yoy_growth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DS Q74/Q11 shape: top-100 customers by year-over-year spend
    growth (1998 -> 1999) — the self-comparison-across-periods pattern,
    decorrelated to ONE conditional aggregation (no self-join: both
    years are CASE branches of the same groupBy, halving the shuffle).

    Growth ranks by the exact truncating ppm ratio (the ratio-ordering
    rule: never order by a float division), deterministically
    tie-broken by custkey; orderBy+limit compiles to
    TakeOrderedAndProject — per-partition top-k then a 100-row driver
    merge, no global sort at any scale."""
    o = tbl(spark, sf_dir, "orders")
    yr = F.year("o_orderdate")
    cents = (F.col("o_totalprice").cast("decimal(18,2)") * 100).cast("long")
    ys = o.groupBy(F.col("o_custkey").alias("custkey")).agg(
        F.sum(F.when(yr == 1998, cents).otherwise(F.lit(0)))
        .cast("long")
        .alias("s1"),
        F.sum(F.when(yr == 1999, cents).otherwise(F.lit(0)))
        .cast("long")
        .alias("s2"),
    )
    return (
        ys.filter(F.col("s1") > 0)
        .select(
            "custkey",
            "s1",
            "s2",
            F.expr(
                "CAST((1000000 * CAST(s2 AS DECIMAL(38,0))) div s1 AS BIGINT)"
            ).alias("growth_ppm"),
        )
        .orderBy(F.desc("growth_ppm"), F.asc("custkey"))
        .limit(100)
    )


@query(
    "ds_q36_margin_rank",
    oracle="""
    WITH base AS (
      SELECT CASE WHEN GROUPING(p.p_type) = 1 THEN '(all)' ELSE p.p_type END
               AS type_l,
             CASE WHEN GROUPING(p.p_brand) = 1 THEN '(all)' ELSE p.p_brand END
               AS brand_l,
             CAST(GROUPING(p.p_type) + GROUPING(p.p_brand) AS INT)
               AS lochierarchy,
             CAST(SUM(CAST(CAST(l.l_extendedprice AS DECIMAL(18,2)) * 100
                           AS BIGINT)) AS BIGINT) AS gross_c,
             CAST(SUM(CAST(CAST(l.l_extendedprice AS DECIMAL(18,2))
                           * CAST(l.l_discount AS DECIMAL(4,2)) * 10000
                           AS BIGINT)) AS BIGINT) AS disc_q4
      FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
      GROUP BY ROLLUP(p.p_type, p.p_brand)
    ),
    ranked AS (
      SELECT type_l, brand_l, lochierarchy, gross_c, disc_q4,
             CAST((1000000 * CAST(disc_q4 AS HUGEINT))
                  // NULLIF(100 * CAST(gross_c AS HUGEINT), 0) AS BIGINT)
               AS disc_ppm
      FROM base
    )
    SELECT type_l, brand_l, lochierarchy, gross_c, disc_q4, disc_ppm,
           CAST(RANK() OVER (
             PARTITION BY lochierarchy,
                          CASE WHEN lochierarchy = 0 THEN type_l
                               ELSE '(all)' END
             ORDER BY disc_ppm DESC, type_l, brand_l) AS INT) AS rank_in_parent
    FROM ranked
    """,
)
def ds_q36_margin_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DS Q36 shape: discount-intensity ranking at every level of the
    type→brand hierarchy in ONE pass — ROLLUP with lochierarchy =
    sum of GROUPING bits, then RANK *within the parent group* (leaf
    rows rank among siblings under their type; subtotal rows rank
    across types).  The reporting pattern behind every drill-down
    margin dashboard.

    Exactness: grouping-set labels are resolved from GROUPING() BEFORE
    the window (the ds_q67 lesson — engines order NULL vs label
    differently); the ranking key is the truncating ppm ratio of two
    exact integer sums (never a float division), deterministically
    tie-broken by the labeled keys.  Scale: Expand multiplies rows by
    3 grouping sets BEFORE the shuffle, partial-agg absorbs it
    map-side; the rank window partitions on (lochierarchy, parent) —
    hierarchy-cardinality state, never a global sort."""
    li = tbl(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_extendedprice", "l_discount"
    )
    p = tbl(spark, sf_dir, "part").select("p_partkey", "p_type", "p_brand")
    gross = F.sum(
        (F.col("l_extendedprice").cast("decimal(18,2)") * 100).cast("long")
    ).cast("long")
    disc = F.sum(
        (
            F.col("l_extendedprice").cast("decimal(18,2)")
            * F.col("l_discount").cast("decimal(4,2)")
            * 10000
        ).cast("long")
    ).cast("long")
    base = (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .rollup("p_type", "p_brand")
        .agg(
            F.grouping("p_type").alias("g_t"),
            F.grouping("p_brand").alias("g_b"),
            gross.alias("gross_c"),
            disc.alias("disc_q4"),
        )
        .select(
            F.when(F.col("g_t") == 1, F.lit("(all)"))
            .otherwise(F.col("p_type"))
            .alias("type_l"),
            F.when(F.col("g_b") == 1, F.lit("(all)"))
            .otherwise(F.col("p_brand"))
            .alias("brand_l"),
            (F.col("g_t") + F.col("g_b")).cast("int").alias("lochierarchy"),
            "gross_c",
            "disc_q4",
        )
    )
    ranked = base.withColumn(
        "disc_ppm",
        F.expr(
            "CAST((1000000 * CAST(disc_q4 AS DECIMAL(38,0)))"
            " div NULLIF(100 * CAST(gross_c AS DECIMAL(38,0)), 0) AS BIGINT)"
        ),
    )
    w = Window.partitionBy(
        "lochierarchy",
        F.when(F.col("lochierarchy") == 0, F.col("type_l")).otherwise(
            F.lit("(all)")
        ),
    ).orderBy(F.desc("disc_ppm"), "type_l", "brand_l")
    return ranked.select(
        "type_l",
        "brand_l",
        "lochierarchy",
        "gross_c",
        "disc_q4",
        "disc_ppm",
        F.rank().over(w).cast("int").alias("rank_in_parent"),
    )
