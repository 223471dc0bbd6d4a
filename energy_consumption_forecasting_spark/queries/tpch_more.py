"""More TPC-H-shaped analytic coverage: Q7, Q8, Q12, Q13, Q15, Q16,
Q22 shapes adapted to the testdata schema (which has no partsupp,
l_commitdate/l_receiptdate, l_shipmode, o_comment, or c_phone — each
query keeps the reference query's *plan shape* and swaps the missing
column for the closest present analog, noted per query).

All follow the exact-decimal conventions from ``queries/__init__``:
money math on DECIMAL(18,2), one double cast at the very end, every
computed column aliased identically on both engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from . import query
from ._util import tbl

_TS = lambda s: F.lit(s + " 00:00:00").cast("timestamp")  # noqa: E731


def _volume():
    """l_extendedprice * (1 - l_discount) as exact DECIMAL."""
    return F.col("l_extendedprice").cast("decimal(18,2)") * (
        F.lit(1).cast("decimal(4,2)") - F.col("l_discount").cast("decimal(4,2)")
    )


_VOLUME_SQL = (
    "CAST(l_extendedprice AS DECIMAL(18,2))"
    " * (CAST(1 AS DECIMAL(4,2)) - CAST(l_discount AS DECIMAL(4,2)))"
)


# --- TPC-H Q7: volume shipping between two nations ----------------------------
@query(
    "tpch_q7_volume_shipping",
    oracle=f"""
    SELECT n1.n_name AS supp_nation,
           n2.n_name AS cust_nation,
           CAST(year(l_shipdate) AS INT) AS l_year,
           CAST(SUM({_VOLUME_SQL}) AS DOUBLE) AS revenue
    FROM lineitem
    JOIN orders   ON l_orderkey = o_orderkey
    JOIN supplier ON l_suppkey = s_suppkey
    JOIN customer ON o_custkey = c_custkey
    JOIN nation n1 ON s_nationkey = n1.n_nationkey
    JOIN nation n2 ON c_nationkey = n2.n_nationkey
    WHERE ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
        OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
      AND l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
    GROUP BY supp_nation, cust_nation, l_year
    """,
)
def tpch_q7_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q7 (TPC-H 2.18 §B.7): bilateral trade volume by year.  The fact
    chain lineitem⋈orders shuffles once on orderkey; supplier,
    customer and both nation legs are broadcast dims, and the nation
    pair disjunction is applied after the two tiny joins — Catalyst
    folds the 25-row nation filters into the broadcast side."""
    li = tbl(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= _TS("1996-01-01"))
        & (F.col("l_shipdate") < _TS("1998-01-01"))
    )
    orders = tbl(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    supp = tbl(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    cust = tbl(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    n1 = (
        tbl(spark, sf_dir, "nation")
        .select(
            F.col("n_nationkey").alias("n1_key"),
            F.col("n_name").alias("supp_nation"),
        )
    )
    n2 = (
        tbl(spark, sf_dir, "nation")
        .select(
            F.col("n_nationkey").alias("n2_key"),
            F.col("n_name").alias("cust_nation"),
        )
    )
    pair = (
        (F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2")
    ) | ((F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1"))
    return (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(cust), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("n1_key"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("n2_key"))
        .filter(pair)
        .groupBy(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").cast("int").alias("l_year"),
        )
        .agg(F.sum(_volume()).cast("double").alias("revenue"))
    )


# --- TPC-H Q8: national market share ------------------------------------------
@query(
    "tpch_q8_market_share",
    oracle=f"""
    WITH all_nations AS (
      SELECT CAST(year(o_orderdate) AS INT) AS o_year,
             {_VOLUME_SQL} AS volume,
             n1.n_name AS nation
      FROM lineitem
      JOIN part     ON l_partkey = p_partkey
      JOIN supplier ON l_suppkey = s_suppkey
      JOIN orders   ON l_orderkey = o_orderkey
      JOIN customer ON o_custkey = c_custkey
      JOIN nation n1 ON s_nationkey = n1.n_nationkey
      JOIN nation n2 ON c_nationkey = n2.n_nationkey
      JOIN region   ON n2.n_regionkey = r_regionkey
      WHERE r_name = 'AMERICA'
        AND p_type = 'PROMO'
        AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
        AND o_orderdate <  TIMESTAMP '1998-01-01 00:00:00'
    )
    SELECT o_year,
           CAST(SUM(CASE WHEN nation = 'NATION_3' THEN volume
                         ELSE CAST(0 AS DECIMAL(18,4)) END) AS DOUBLE)
             / CAST(SUM(volume) AS DOUBLE) AS mkt_share
    FROM all_nations
    GROUP BY o_year
    """,
)
def tpch_q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q8: NATION_3's share of PROMO-part volume sold into AMERICA,
    by order year.  Same ratio discipline as Q14/m14: both the
    numerator and denominator are exact decimal sums, and the single
    double division is the identical IEEE op on both engines.  All
    dims broadcast; the only shuffle is lineitem⋈orders."""
    li = tbl(spark, sf_dir, "lineitem")
    part = (
        tbl(spark, sf_dir, "part")
        .filter(F.col("p_type") == "PROMO")
        .select("p_partkey")
    )
    supp = tbl(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    orders = tbl(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= _TS("1996-01-01"))
        & (F.col("o_orderdate") < _TS("1998-01-01"))
    )
    cust = tbl(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    n1 = tbl(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("nation")
    )
    n2 = tbl(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_regionkey").alias("n2_rk")
    )
    region = (
        tbl(spark, sf_dir, "region")
        .filter(F.col("r_name") == "AMERICA")
        .select("r_regionkey")
    )
    all_nations = (
        li.join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(cust), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("n1_key"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("n2_key"))
        .join(F.broadcast(region), F.col("n2_rk") == F.col("r_regionkey"))
        .select(
            F.year("o_orderdate").cast("int").alias("o_year"),
            _volume().alias("volume"),
            "nation",
        )
    )
    agg = all_nations.groupBy("o_year").agg(
        F.sum(
            F.when(F.col("nation") == "NATION_3", F.col("volume")).otherwise(
                F.lit(0).cast("decimal(18,4)")
            )
        )
        .cast("double")
        .alias("num"),
        F.sum("volume").cast("double").alias("den"),
    )
    return agg.select("o_year", (F.col("num") / F.col("den")).alias("mkt_share"))


# --- TPC-H Q12: late lines by priority class ----------------------------------
@query(
    "tpch_q12_priority_lines",
    oracle="""
    SELECT l_returnflag,
           CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    WHERE l_shipdate >= o_orderdate + INTERVAL 90 DAY
      AND l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
    GROUP BY l_returnflag
    """,
)
def tpch_q12_priority_lines(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q12's shape with l_returnflag standing in for the absent
    l_shipmode, and ship-lag > 90 days for the absent
    commit/receipt-date predicate: join + conditional priority
    counts.  The year filter reaches the lineitem scan; the lag
    predicate rides the join."""
    li = tbl(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= _TS("1996-01-01"))
        & (F.col("l_shipdate") < _TS("1997-01-01"))
    )
    orders = tbl(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderdate", "o_orderpriority"
    )
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .filter(F.col("l_shipdate") >= F.col("o_orderdate") + F.expr("INTERVAL 90 DAYS"))
        .groupBy("l_returnflag")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(high, 0).otherwise(1)).alias("low_line_count"),
        )
    )


# --- TPC-H Q13: customer order-count distribution ------------------------------
@query(
    "tpch_q13_order_distribution",
    oracle="""
    WITH c_orders AS (
      SELECT c_custkey, COUNT(o_orderkey) AS c_count
      FROM customer LEFT JOIN orders
        ON c_custkey = o_custkey AND o_orderpriority <> '5-LOW'
      GROUP BY c_custkey
    )
    SELECT CAST(c_count AS BIGINT) AS c_count,
           CAST(COUNT(*) AS BIGINT) AS custdist
    FROM c_orders
    GROUP BY c_count
    """,
)
def tpch_q13_order_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q13: how many customers placed N (non-'5-LOW', standing in for
    the absent o_comment exclusion) orders — zero included.  The
    exclusion predicate must live in the LEFT JOIN condition, not a
    WHERE (which would drop the zero-order customers); the double
    aggregation shrinks 15k orders → 1.5k customers → ~20 buckets."""
    cust = tbl(spark, sf_dir, "customer").select("c_custkey")
    orders = (
        tbl(spark, sf_dir, "orders")
        .filter(F.col("o_orderpriority") != "5-LOW")
        .select("o_custkey", "o_orderkey")
    )
    per_cust = (
        cust.join(orders, F.col("c_custkey") == F.col("o_custkey"), "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(F.count("*").alias("custdist"))


# --- TPC-H Q15: top supplier by revenue ---------------------------------------
@query(
    "tpch_q15_top_supplier",
    oracle=f"""
    WITH revenue AS (
      SELECT l_suppkey AS supplier_no,
             SUM({_VOLUME_SQL}) AS total_rev
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        AND l_shipdate <  TIMESTAMP '1996-04-01 00:00:00'
      GROUP BY l_suppkey
    )
    SELECT s_suppkey, s_name, CAST(total_rev AS DOUBLE) AS total_revenue
    FROM supplier JOIN revenue ON s_suppkey = supplier_no
    WHERE total_rev = (SELECT MAX(total_rev) FROM revenue)
    """,
)
def tpch_q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q15: supplier(s) with the maximum quarterly revenue.  The max
    is a one-row aggregate of the (already tiny, post-groupBy)
    revenue table, broadcast back as a scalar — the tie-safe
    equality compares exact decimals, never doubles.  No window, no
    driver collect."""
    li = tbl(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= _TS("1996-01-01"))
        & (F.col("l_shipdate") < _TS("1996-04-01"))
    )
    revenue = li.groupBy(F.col("l_suppkey").alias("supplier_no")).agg(
        F.sum(_volume()).alias("total_rev")
    )
    top = revenue.agg(F.max("total_rev").alias("max_rev"))
    supp = tbl(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (
        revenue.join(F.broadcast(top), F.col("total_rev") == F.col("max_rev"))
        .join(F.broadcast(supp), F.col("supplier_no") == F.col("s_suppkey"))
        .select(
            "s_suppkey",
            "s_name",
            F.col("total_rev").cast("double").alias("total_revenue"),
        )
    )


# --- TPC-H Q16: supplier count by part attribute ------------------------------
@query(
    "tpch_q16_part_suppliers",
    oracle="""
    SELECT p_brand, p_type, CAST(p_size AS INT) AS p_size,
           CAST(COUNT(DISTINCT l_suppkey) AS BIGINT) AS supplier_cnt
    FROM part JOIN lineitem ON p_partkey = l_partkey
    WHERE p_brand <> 'Brand#1'
      AND p_type <> 'PROMO'
      AND p_size IN (1, 4, 9, 14, 19, 23, 36, 45)
    GROUP BY p_brand, p_type, p_size
    """,
)
def tpch_q16_part_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q16's shape with the supplier-part relation derived from
    lineitem (no partsupp table in this schema): anti-predicates on
    the broadcast part dim, COUNT(DISTINCT suppkey) per attribute
    triple.  Spark plans distinct-count as a two-phase partial
    aggregate — no row explosion crosses the shuffle."""
    part = tbl(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#1")
        & (F.col("p_type") != "PROMO")
        & F.col("p_size").isin(1, 4, 9, 14, 19, 23, 36, 45)
    )
    li = tbl(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey")
    return (
        li.join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
    )


# --- TPC-H Q22: dormant high-balance customers --------------------------------
@query(
    "tpch_q22_dormant_customers",
    oracle="""
    WITH thr AS (
      SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE)
               / COUNT(*) AS avg_bal
      FROM customer
      WHERE c_acctbal > 0 AND c_nationkey IN (1, 2, 3, 10, 11, 12, 13)
    )
    SELECT CAST(c_nationkey AS INT) AS nationkey,
           CAST(COUNT(*) AS BIGINT) AS numcust,
           CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS totacctbal
    FROM customer, thr
    WHERE c_nationkey IN (1, 2, 3, 10, 11, 12, 13)
      AND c_acctbal > thr.avg_bal
      AND NOT EXISTS (SELECT 1 FROM orders
                      WHERE o_custkey = c_custkey
                        AND o_orderdate >= TIMESTAMP '1999-01-01 00:00:00')
    GROUP BY c_nationkey
    """,
)
def tpch_q22_dormant_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q22 with c_nationkey standing in for the absent phone country
    code: above-average-balance customers dormant since 1999 (every
    customer here has SOME order, so Q22's "never ordered" is recast
    as "no recent order" to keep the gate non-trivial).  The
    scalar threshold is an exact decimal sum divided once (both
    engines bit-identical), broadcast back; the NOT EXISTS is a
    LEFT ANTI join on custkey.  Note the anti join's build side is
    orders projected to the single key column."""
    nations = [1, 2, 3, 10, 11, 12, 13]
    cust = tbl(spark, sf_dir, "customer").filter(F.col("c_nationkey").isin(nations))
    thr = (
        cust.filter(F.col("c_acctbal") > 0)
        .agg(
            (
                F.sum(F.col("c_acctbal").cast("decimal(18,2)")).cast("double")
                / F.count("*")
            ).alias("avg_bal")
        )
    )
    orders = (
        tbl(spark, sf_dir, "orders")
        .filter(F.col("o_orderdate") >= _TS("1999-01-01"))
        .select("o_custkey")
    )
    return (
        cust.crossJoin(F.broadcast(thr))
        .filter(F.col("c_acctbal") > F.col("avg_bal"))
        .join(orders, F.col("c_custkey") == F.col("o_custkey"), "left_anti")
        .groupBy(F.col("c_nationkey").cast("int").alias("nationkey"))
        .agg(
            F.count("*").alias("numcust"),
            F.sum(F.col("c_acctbal").cast("decimal(18,2)"))
            .cast("double")
            .alias("totacctbal"),
        )
    )


# --- TPC-H Q17: small-quantity-order revenue ----------------------------------
@query(
    "tpch_q17_small_quantity",
    oracle="""
    WITH avg_qty AS (
      SELECT l_partkey AS ap, CAST(SUM(CAST(l_quantity AS DECIMAL(18,2)))
                                   AS DOUBLE) / COUNT(*) AS aq
      FROM lineitem GROUP BY l_partkey
    )
    SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / 7.0
             AS avg_yearly
    FROM lineitem
    JOIN part ON p_partkey = l_partkey
    JOIN avg_qty ON ap = l_partkey
    WHERE p_brand = 'Brand#2' AND p_type = 'SMALL'
      AND l_quantity < 0.5 * aq
    """,
)
def tpch_q17_small_quantity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q17: revenue locked in small-quantity orders of one part class.
    The correlated scalar subquery (per-part average quantity) becomes
    a per-part aggregate joined back on partkey; the threshold uses an
    exact-decimal sum divided once, so both engines compare the same
    double.  The part filter is applied BEFORE the avg join on the
    probe side — but the average itself is over ALL lineitems of the
    part, per the reference semantics."""
    li = tbl(spark, sf_dir, "lineitem")
    part = (
        tbl(spark, sf_dir, "part")
        .filter((F.col("p_brand") == "Brand#2") & (F.col("p_type") == "SMALL"))
        .select("p_partkey")
    )
    avg_qty = li.groupBy(F.col("l_partkey").alias("ap")).agg(
        (
            F.sum(F.col("l_quantity").cast("decimal(18,2)")).cast("double")
            / F.count("*")
        ).alias("aq")
    )
    return (
        li.join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .join(avg_qty, F.col("ap") == F.col("l_partkey"))
        .filter(F.col("l_quantity") < 0.5 * F.col("aq"))
        .agg(
            (
                F.sum(F.col("l_extendedprice").cast("decimal(18,2)")).cast("double")
                / 7.0
            ).alias("avg_yearly")
        )
    )


# --- TPC-H Q21: sole-late-supplier detection ----------------------------------
@query(
    "tpch_q21_sole_late_supplier",
    oracle="""
    WITH late AS (
      SELECT l_orderkey, l_suppkey
      FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      WHERE l_shipdate > o_orderdate + INTERVAL 90 DAY
    ),
    multi AS (
      SELECT l_orderkey FROM lineitem
      GROUP BY l_orderkey HAVING COUNT(DISTINCT l_suppkey) > 1
    )
    SELECT s_name,
           CAST(COUNT(*) AS BIGINT) AS numwait
    FROM late
    JOIN multi USING (l_orderkey)
    JOIN supplier ON s_suppkey = l_suppkey
    WHERE NOT EXISTS (
      SELECT 1 FROM late l2
      WHERE l2.l_orderkey = late.l_orderkey
        AND l2.l_suppkey <> late.l_suppkey
    )
    GROUP BY s_name
    """,
)
def tpch_q21_sole_late_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q21's shape on this schema ('late' = shipped >90 days after
    ordering, standing in for the absent commit/receipt dates):
    suppliers who were the ONLY late supplier on a multi-supplier
    order.  The EXISTS pair becomes (a) a semi join against orders
    with >1 distinct supplier and (b) an anti join against OTHER late
    lines of the same order — expressed as a per-order distinct-late-
    supplier count == 1, which collapses both correlated subqueries
    into one aggregation over the (already small) late set."""
    li = tbl(spark, sf_dir, "lineitem")
    orders = tbl(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    supp = tbl(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    late = (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .filter(
            F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 90 DAYS")
        )
        .select("l_orderkey", "l_suppkey")
    )
    multi = (
        li.groupBy("l_orderkey")
        .agg(F.countDistinct("l_suppkey").alias("ns"))
        .filter(F.col("ns") > 1)
        .select("l_orderkey")
    )
    sole_late = (
        late.groupBy("l_orderkey")
        .agg(
            F.countDistinct("l_suppkey").alias("n_late_supps"),
            F.first("l_suppkey").alias("supp"),
        )
        .filter(F.col("n_late_supps") == 1)
    )
    # re-join to late to count every late LINE of the sole supplier
    return (
        late.join(
            sole_late.select("l_orderkey"), "l_orderkey", "left_semi"
        )
        .join(multi, "l_orderkey", "left_semi")
        .join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy("s_name")
        .agg(F.count("*").alias("numwait"))
    )


# --- derived partsupp analog (enables Q2/Q9/Q11 shapes) -------------------------
# The schema has no partsupp table; the (part, supplier) relation with a
# cost measure is derived from lineitem: ps_supplycost := the MINIMUM
# line price (exact 2-decimal money) ever charged for that (part,
# supplier).  MIN is selection over exact decimals — bit-identical on
# both engines.  (A unit-price quotient was rejected: casting the
# double quotient to decimal hits midpoint values like x/8 where
# Spark's toString+HALF_UP and DuckDB's rounding disagree.)
_PARTSUPP_SQL = """
      SELECT l_partkey AS ps_partkey, l_suppkey AS ps_suppkey,
             MIN(CAST(l_extendedprice AS DECIMAL(18,2))) AS ps_supplycost
      FROM lineitem GROUP BY 1, 2
"""


def _partsupp(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = tbl(spark, sf_dir, "lineitem")
    return li.groupBy(
        F.col("l_partkey").alias("ps_partkey"),
        F.col("l_suppkey").alias("ps_suppkey"),
    ).agg(
        F.min(F.col("l_extendedprice").cast("decimal(18,2)")).alias(
            "ps_supplycost"
        )
    )


# --- TPC-H Q2: minimum-cost supplier per part ----------------------------------
@query(
    "tpch_q2_min_cost_supplier",
    oracle=f"""
    WITH partsupp AS ({_PARTSUPP_SQL}),
    eu_supp AS (
      SELECT s_suppkey, s_name, s_acctbal, n_name
      FROM supplier
      JOIN nation ON s_nationkey = n_nationkey
      JOIN region ON n_regionkey = r_regionkey
      WHERE r_name = 'EUROPE'
    ),
    costs AS (
      SELECT ps_partkey, ps_suppkey, ps_supplycost
      FROM partsupp JOIN eu_supp ON ps_suppkey = s_suppkey
    ),
    best AS (
      SELECT ps_partkey AS bp, MIN(ps_supplycost) AS bc
      FROM costs GROUP BY 1
    )
    SELECT p_partkey, p_name, s_name, n_name, ps_supplycost AS cost
    FROM costs
    JOIN best ON bp = ps_partkey AND ps_supplycost = bc
    JOIN part ON p_partkey = ps_partkey
    JOIN eu_supp ON s_suppkey = ps_suppkey
    WHERE p_size IN (5, 15, 25, 35, 45) AND p_type = 'LARGE'
    """,
)
def tpch_q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q2 on the derived partsupp: cheapest EUROPE supplier per
    LARGE part in five size classes.  The correlated MIN becomes a per-part
    aggregate joined back on (part, exact-double cost equality —
    safe because the min is selected, never recomputed); region/
    nation/supplier legs broadcast."""
    ps = _partsupp(spark, sf_dir)
    supp = tbl(spark, sf_dir, "supplier").select(
        "s_suppkey", "s_name", "s_nationkey"
    )
    nation = tbl(spark, sf_dir, "nation").select(
        "n_nationkey", "n_name", "n_regionkey"
    )
    region = tbl(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    eu_supp = (
        supp.join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(region), F.col("n_regionkey") == F.col("r_regionkey"))
        .select("s_suppkey", "s_name", "n_name")
    )
    costs = ps.join(
        F.broadcast(eu_supp), F.col("ps_suppkey") == F.col("s_suppkey")
    )
    best = costs.groupBy(F.col("ps_partkey").alias("bp")).agg(
        F.min("ps_supplycost").alias("bc")
    )
    part = tbl(spark, sf_dir, "part").filter(
        F.col("p_size").isin(5, 15, 25, 35, 45) & (F.col("p_type") == "LARGE")
    )
    return (
        costs.join(
            best,
            (F.col("bp") == F.col("ps_partkey"))
            & (F.col("ps_supplycost") == F.col("bc")),
        )
        .join(F.broadcast(part), F.col("p_partkey") == F.col("ps_partkey"))
        .select(
            "p_partkey",
            "p_name",
            "s_name",
            "n_name",
            F.col("ps_supplycost").alias("cost"),
        )
    )


# --- TPC-H Q9: product-line profit by nation and year ---------------------------
@query(
    "tpch_q9_product_profit",
    oracle=f"""
    WITH partsupp AS ({_PARTSUPP_SQL})
    SELECT n_name AS nation,
           CAST(year(o_orderdate) AS INT) AS o_year,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                      * (CAST(1 AS DECIMAL(4,2))
                         - CAST(l_discount AS DECIMAL(4,2)))
                    - ps_supplycost
                      * CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE)
             AS sum_profit
    FROM lineitem
    JOIN part     ON p_partkey = l_partkey
    JOIN supplier ON s_suppkey = l_suppkey
    JOIN partsupp ON ps_partkey = l_partkey AND ps_suppkey = l_suppkey
    JOIN orders   ON o_orderkey = l_orderkey
    JOIN nation   ON s_nationkey = n_nationkey
    WHERE p_type = 'STANDARD'
    GROUP BY 1, 2
    """,
)
def tpch_q9_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q9 on the derived partsupp: national profit on STANDARD parts by
    year.  The cost measure is an exact decimal selection, so the
    whole profit sum stays exact decimal end to end.  partsupp is
    itself an aggregate of lineitem: Spark plans
    fact⋈fact as two shuffles on the same (partkey, suppkey)-derived
    keys; everything else broadcasts."""
    li = tbl(spark, sf_dir, "lineitem")
    ps = _partsupp(spark, sf_dir)
    part = (
        tbl(spark, sf_dir, "part")
        .filter(F.col("p_type") == "STANDARD")
        .select("p_partkey")
    )
    supp = tbl(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    orders = tbl(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    nation = tbl(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    profit = F.col("l_extendedprice").cast("decimal(18,2)") * (
        F.lit(1).cast("decimal(4,2)") - F.col("l_discount").cast("decimal(4,2)")
    ) - F.col("ps_supplycost") * F.col("l_quantity").cast("decimal(18,2)")
    return (
        li.join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(
            ps,
            (F.col("ps_partkey") == F.col("l_partkey"))
            & (F.col("ps_suppkey") == F.col("l_suppkey")),
        )
        .join(orders, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").cast("int").alias("o_year"),
        )
        .agg(F.sum(profit).cast("double").alias("sum_profit"))
    )


# --- TPC-H Q11: important stock concentration -----------------------------------
@query(
    "tpch_q11_important_stock",
    oracle=f"""
    WITH partsupp AS ({_PARTSUPP_SQL}),
    nat_ps AS (
      SELECT ps_partkey,
             ps_supplycost * CAST(2 AS DECIMAL(4,0)) AS value_dec
      FROM partsupp
      JOIN supplier ON ps_suppkey = s_suppkey
      JOIN nation   ON s_nationkey = n_nationkey
      WHERE n_name IN ('NATION_5', 'NATION_6')
    ),
    tot AS (SELECT SUM(value_dec) AS total FROM nat_ps)
    SELECT ps_partkey,
           CAST(SUM(value_dec) AS DOUBLE) AS part_value
    FROM nat_ps, tot
    GROUP BY ps_partkey, tot.total
    HAVING CAST(SUM(value_dec) AS DOUBLE)
           > 0.001 * CAST(tot.total AS DOUBLE)
    """,
)
def tpch_q11_important_stock(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q11 on the derived partsupp (availqty has no analog — a
    constant 2 stands in, keeping the shape: value = cost × qty):
    parts whose two-nation stock value exceeds 0.1% of the national
    total.  The total is a one-row aggregate broadcast back; the
    HAVING compares doubles derived from exact decimal sums via the
    identical division/multiply sequence on both engines."""
    ps = _partsupp(spark, sf_dir)
    supp = tbl(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    nation = tbl(spark, sf_dir, "nation").filter(
        F.col("n_name").isin("NATION_5", "NATION_6")
    )
    nat_ps = (
        ps.join(F.broadcast(supp), F.col("ps_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .select(
            "ps_partkey",
            (F.col("ps_supplycost") * F.lit(2).cast("decimal(4,0)")).alias(
                "value_dec"
            ),
        )
    )
    tot = nat_ps.agg(F.sum("value_dec").alias("total"))
    return (
        nat_ps.crossJoin(F.broadcast(tot))
        .groupBy("ps_partkey", "total")
        .agg(F.sum("value_dec").cast("double").alias("part_value"))
        .filter(
            F.col("part_value") > 0.001 * F.col("total").cast("double")
        )
        .select("ps_partkey", "part_value")
    )


# --- TPC-H Q20: dominant suppliers of a part class ------------------------------
@query(
    "tpch_q20_dominant_supplier",
    oracle="""
    WITH shipped AS (
      SELECT l_partkey, l_suppkey,
             SUM(CAST(l_quantity AS DECIMAL(18,2))) AS q
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
        AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
      GROUP BY 1, 2
    ),
    part_tot AS (
      SELECT l_partkey AS tp, SUM(q) AS tq FROM shipped GROUP BY 1
    ),
    dominant AS (
      SELECT DISTINCT l_suppkey
      FROM shipped
      JOIN part_tot ON tp = l_partkey
      JOIN part ON p_partkey = l_partkey
      WHERE p_type = 'PROMO'
        AND CAST(q AS DOUBLE) > 0.5 * CAST(tq AS DOUBLE)
    )
    SELECT s_name, n_name
    FROM supplier
    JOIN nation ON s_nationkey = n_nationkey
    JOIN dominant ON l_suppkey = s_suppkey
    """,
)
def tpch_q20_dominant_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q20's semi-join-chain shape with shipped share standing in for
    the absent availqty: suppliers who shipped >50% of some PROMO
    part's 1997 volume.  Two aggregations over the same filtered scan
    share the (partkey, suppkey) shuffle; the dominance test compares
    doubles derived from exact decimal sums via the identical op
    sequence; the supplier leg is a broadcast semi join."""
    li = tbl(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= _TS("1997-01-01"))
        & (F.col("l_shipdate") < _TS("1998-01-01"))
    )
    shipped = li.groupBy("l_partkey", "l_suppkey").agg(
        F.sum(F.col("l_quantity").cast("decimal(18,2)")).alias("q")
    )
    part_tot = shipped.groupBy(F.col("l_partkey").alias("tp")).agg(
        F.sum("q").alias("tq")
    )
    promo = (
        tbl(spark, sf_dir, "part")
        .filter(F.col("p_type") == "PROMO")
        .select("p_partkey")
    )
    dominant = (
        shipped.join(part_tot, F.col("tp") == F.col("l_partkey"))
        .join(F.broadcast(promo), F.col("p_partkey") == F.col("l_partkey"))
        .filter(F.col("q").cast("double") > 0.5 * F.col("tq").cast("double"))
        .select("l_suppkey")
        .distinct()
    )
    supp = tbl(spark, sf_dir, "supplier").select(
        "s_suppkey", "s_name", "s_nationkey"
    )
    nation = tbl(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    return (
        supp.join(dominant, F.col("l_suppkey") == F.col("s_suppkey"), "left_semi")
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .select("s_name", "n_name")
    )
