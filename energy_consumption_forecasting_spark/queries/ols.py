"""Exact distributed OLS — the degree-day demand regression.

Energy stacks model demand as a + b·HDD + c·CDD (heating/cooling
degree days).  OLS over a 100-TB fact table is normally "collect a
sample and call a library"; here the WHOLE fit is distributed and
EXACT: the normal-equation matrix is nine integer sums (one map-side-
combinable aggregation over the facts), and the coefficients come out
of Cramer's rule evaluated on exact integers — determinants stay in
128-bit range, so the only float ops are the three final divisions.
Both engines run the identical algebra → strict oracle hash.

Temperature is synthesized deterministically from the calendar (an
integer triangular wave in tenths of a degree) since the testdata has
no weather table; on real data the same query runs off the J6-joined
station series.  Reference anchor: exog temperature features feeding
the ARX/GBT models (SURVEY §2.7 M9/M10).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from . import query
from ._util import tbl

# integer triangular wave, tenths of °C: peaks mid-year at 40.0°C,
# troughs at -10.0°C — DIV/// rendered per dialect.
_T10_DUCK = "(400 - abs(((dayofyear(d) * 1000) // 366) - 500))"
_T10_SPARK = "(400 - abs(((dayofyear(d) * 1000) DIV 366) - 500))"

_BASE10 = 180  # 18.0°C balance temperature


def _sums_sql(t10: str) -> str:
    return f"""
      SELECT CAST(COUNT(*) AS HUGEINT) AS n,
             SUM(CAST(h AS HUGEINT)) AS sh,
             SUM(CAST(c AS HUGEINT)) AS sc,
             SUM(CAST(h AS HUGEINT) * CAST(h AS HUGEINT)) AS shh,
             SUM(CAST(c AS HUGEINT) * CAST(c AS HUGEINT)) AS scc,
             SUM(CAST(h AS HUGEINT) * CAST(c AS HUGEINT)) AS shc,
             SUM(CAST(y AS HUGEINT)) AS sy,
             SUM(CAST(h AS HUGEINT) * CAST(y AS HUGEINT)) AS shy,
             SUM(CAST(c AS HUGEINT) * CAST(y AS HUGEINT)) AS scy
      FROM (
        SELECT GREATEST(0, {_BASE10} - {t10}) AS h,
               GREATEST(0, {t10} - {_BASE10}) AS c,
               y
        FROM (
          SELECT CAST(o_orderdate AS DATE) AS d,
                 CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100
                               AS BIGINT)) AS BIGINT) AS y
          FROM orders GROUP BY 1
        )
      )
"""


_CRAMER_SQL = """
    SELECT CAST(n AS BIGINT) AS n_days,
           CAST(det_a AS DOUBLE) / CAST(det AS DOUBLE) AS intercept_c,
           CAST(det_b AS DOUBLE) / CAST(det AS DOUBLE) AS beta_hdd_c,
           CAST(det_c AS DOUBLE) / CAST(det AS DOUBLE) AS beta_cdd_c
    FROM (
      SELECT n,
             n * (shh * scc - shc * shc)
               - sh * (sh * scc - shc * sc)
               + sc * (sh * shc - shh * sc) AS det,
             sy * (shh * scc - shc * shc)
               - sh * (shy * scc - shc * scy)
               + sc * (shy * shc - shh * scy) AS det_a,
             n * (shy * scc - scy * shc)
               - sy * (sh * scc - shc * sc)
               + sc * (sh * scy - shy * sc) AS det_b,
             n * (shh * scy - shc * shy)
               - sh * (sh * scy - shy * sc)
               + sy * (sh * shc - shh * sc) AS det_c
      FROM sums
    )
"""


@query(
    "m21_degree_day_ols",
    oracle=f"""
    WITH sums AS ({_sums_sql(_T10_DUCK)})
    {_CRAMER_SQL}
    """,
)
def m21_degree_day_ols(spark: SparkSession, sf_dir: str) -> DataFrame:
    """demand_cents = intercept + b·HDD10 + c·CDD10, fit exactly on the
    cluster: one aggregation for the nine normal-equation sums, Cramer
    determinants on exact 128-bit integers, three float divisions.
    Coefficients are in cents per tenth-degree-day."""
    daily = (
        tbl(spark, sf_dir, "orders")
        .groupBy(F.to_date("o_orderdate").alias("d"))
        .agg(
            F.sum((F.col("o_totalprice").cast("decimal(18,2)") * 100).cast("long"))
            .cast("long")
            .alias("y")
        )
    )
    feats = daily.selectExpr(
        f"GREATEST(0, {_BASE10} - {_T10_SPARK}) AS h",
        f"GREATEST(0, {_T10_SPARK} - {_BASE10}) AS c",
        "y",
    )
    dec = lambda col: F.col(col).cast("decimal(38,0)")
    sums = feats.agg(
        F.count("*").cast("decimal(38,0)").alias("n"),
        F.sum(dec("h")).cast("decimal(38,0)").alias("sh"),
        F.sum(dec("c")).cast("decimal(38,0)").alias("sc"),
        F.sum(dec("h") * dec("h")).cast("decimal(38,0)").alias("shh"),
        F.sum(dec("c") * dec("c")).cast("decimal(38,0)").alias("scc"),
        F.sum(dec("h") * dec("c")).cast("decimal(38,0)").alias("shc"),
        F.sum(dec("y")).cast("decimal(38,0)").alias("sy"),
        F.sum(dec("h") * dec("y")).cast("decimal(38,0)").alias("shy"),
        F.sum(dec("c") * dec("y")).cast("decimal(38,0)").alias("scy"),
    )
    sums.createOrReplaceTempView("sums")
    return spark.sql(_CRAMER_SQL)


@query(
    "a_price_elasticity",
    oracle="""
    WITH pairs AS (
      SELECT p.p_brand AS brand,
             CAST(CAST(l.l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT)
               // CAST(l.l_quantity AS BIGINT) AS unit_c,
             CAST(l.l_quantity AS BIGINT) AS qty
      FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
      WHERE CAST(l.l_quantity AS BIGINT) > 0
    ),
    s AS (
      SELECT brand,
             CAST(COUNT(*) AS HUGEINT) AS n,
             CAST(SUM(unit_c) AS HUGEINT) AS sx,
             CAST(SUM(unit_c * unit_c) AS HUGEINT) AS sxx,
             CAST(SUM(qty) AS HUGEINT) AS sy,
             CAST(SUM(unit_c * qty) AS HUGEINT) AS sxy
      FROM pairs GROUP BY brand
    )
    SELECT brand, CAST(n AS BIGINT) AS n_lines,
           CAST((1000000000 * (n * sxy - sx * sy))
                // NULLIF(n * sxx - sx * sx, 0) AS BIGINT)
             AS slope_qty_per_cent_e9,
           CAST(sy AS BIGINT) AS total_qty
    FROM s
    """,
)
def a_price_elasticity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-brand price-response slope: OLS of line quantity on unit
    price (cents), the demand-elasticity screen category managers run —
    in the m21_degree_day_ols exact-Cramer style: all moments are
    DECIMAL(38)/HUGEINT integer sums and the slope is ONE truncating
    division emitted at 1e-9 resolution, so no float forms anywhere.
    Unit price itself is a truncating integer division (both engines
    truncate toward zero).  Plan: one broadcast dim join + one hash
    aggregate per brand."""
    li = tbl(spark, sf_dir, "lineitem").filter(
        F.col("l_quantity").cast("long") > 0
    )
    p = tbl(spark, sf_dir, "part").select(
        F.col("p_partkey").alias("l_partkey"),
        F.col("p_brand").alias("brand"),
    )
    d38 = "decimal(38,0)"
    pairs = li.join(F.broadcast(p), "l_partkey").select(
        "brand",
        F.expr(
            "CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT)"
            " div CAST(l_quantity AS BIGINT)"
        ).alias("unit_c"),
        F.col("l_quantity").cast("long").alias("qty"),
    )
    s = pairs.groupBy("brand").agg(
        F.count("*").cast(d38).alias("n"),
        F.sum("unit_c").cast(d38).alias("sx"),
        F.sum(F.col("unit_c").cast(d38) * F.col("unit_c").cast(d38))
        .cast(d38)
        .alias("sxx"),
        F.sum("qty").cast(d38).alias("sy"),
        F.sum(F.col("unit_c").cast(d38) * F.col("qty").cast(d38))
        .cast(d38)
        .alias("sxy"),
    )
    return s.select(
        "brand",
        F.col("n").cast("long").alias("n_lines"),
        F.expr(
            "CAST((1000000000 * (n * sxy - sx * sy))"
            " div NULLIF(n * sxx - sx * sx, 0) AS BIGINT)"
        ).alias("slope_qty_per_cent_e9"),
        F.col("sy").cast("long").alias("total_qty"),
    )
