"""Geohash encoding + bucketed spatial join.

Complements the ray-casting point-in-polygon tier (operators/spatial.py,
SURVEY §2.2 F8/J6) with the other classic spatial-at-scale primitive:
encode points into geohash cells (bit-interleaved lat/lon rendered in
base32, so cell identity is a string PREFIX relation), then join two
point sets on the cell id — the bucket-then-refine spatial join that
replaces an O(N·M) distance cross-join with an equi-join plus an exact
distance check inside each bucket.

Coordinates are derived deterministically from the entity keys
(quantized 1/100-degree integers), so the whole pipeline — quantize,
scale to 15 bits, MSB-first interleave, base32 render, join, exact
integer squared distance — is integer/string arithmetic that both
engines evaluate bit-identically: the oracle hash is strict.  The same
expression template renders to both dialects (DuckDB ``// >> <<``
operators, Spark ``DIV`` / ``shiftright`` / ``shiftleft`` functions) so
the two sides cannot drift.

Scale: encoding is a row-local projection; the join shuffles on the
cell string (broadcast here — the supplier side is dimension-sized;
hash-partition both sides when both are large).  Cell size (prefix
length) is the knob trading bucket fan-out vs candidate recall, exactly
like LSH band width in dedup.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from . import query
from ._util import tbl

_B32 = "0123456789bcdefghjkmnpqrstuvwxyz"
PREFIX = 2  # join cell = first 2 geohash chars (10 bits)

# Deterministic synthetic coordinates, quantized to 1/100 degree:
# lat in [0, 18000) ≙ [-90, 90), lon in [0, 36000) ≙ [-180, 180).
_LAT_SQL = "({k} * 7919) % 18000"
_LON_SQL = "({k} * 104729) % 36000"

# Engine dialects for the integer ops the encoding needs.
_DUCK = {
    "idiv": lambda a, b: f"(({a}) // ({b}))",
    "shr": lambda a, n: f"(({a}) >> {n})",
    "shl": lambda a, n: f"(({a}) << {n})",
}
_SPARK = {
    "idiv": lambda a, b: f"(({a}) DIV ({b}))",
    "shr": lambda a, n: f"shiftright({a}, {n})",
    "shl": lambda a, n: f"shiftleft({a}, {n})",
}


def geohash_sql(lat_sql: str, lon_sql: str, dialect: dict) -> str:
    """6-char geohash: 15 bits/dimension, lon on even bit positions
    (MSB first), standard base32 alphabet — one expression string."""
    d = dialect
    lat15 = d["idiv"](f"({lat_sql}) * 32768", "18000")
    lon15 = d["idiv"](f"({lon_sql}) * 32768", "36000")
    bits = []
    for i in range(15):
        bits.append(d["shl"](f"{d['shr'](lon15, 14 - i)} & 1", 29 - 2 * i))
        bits.append(d["shl"](f"{d['shr'](lat15, 14 - i)} & 1", 28 - 2 * i))
    code = "(" + " + ".join(f"({b})" for b in bits) + ")"
    chars = [
        f"substr('{_B32}', CAST(({d['shr'](code, 25 - 5 * k)} & 31) AS INT) + 1, 1)"
        for k in range(6)
    ]
    return "(" + " || ".join(chars) + ")"


_CUST_SQL = f"""
      SELECT c_custkey AS k, {_LAT_SQL.format(k='c_custkey')} AS latq,
             {_LON_SQL.format(k='c_custkey')} AS lonq
      FROM customer
"""

_SUPP_SQL = f"""
      SELECT s_suppkey AS k, {_LAT_SQL.format(k='s_suppkey')} AS latq,
             {_LON_SQL.format(k='s_suppkey')} AS lonq
      FROM supplier
"""


@query(
    "geo_geohash_join",
    oracle=f"""
    WITH cust AS ({_CUST_SQL}),
    supp AS ({_SUPP_SQL}),
    cg AS (
      SELECT k, latq, lonq,
             substr({geohash_sql('latq', 'lonq', _DUCK)}, 1, {PREFIX}) AS cell
      FROM cust
    ),
    sg AS (
      SELECT k, latq, lonq,
             substr({geohash_sql('latq', 'lonq', _DUCK)}, 1, {PREFIX}) AS cell
      FROM supp
    )
    SELECT cg.k AS custkey, sg.k AS suppkey, cg.cell AS cell,
           CAST((cg.latq - sg.latq) * (cg.latq - sg.latq)
                + (cg.lonq - sg.lonq) * (cg.lonq - sg.lonq) AS BIGINT)
             AS d2_q
    FROM cg JOIN sg USING (cell)
    """,
)
def geo_geohash_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customer×supplier candidate pairs sharing a geohash-prefix cell,
    with the exact quantized squared distance for the refine step."""

    def points(table: str, key: str) -> DataFrame:
        gh = geohash_sql(
            _LAT_SQL.format(k=key), _LON_SQL.format(k=key), _SPARK
        )
        return tbl(spark, sf_dir, table).selectExpr(
            f"{key} AS k",
            f"{_LAT_SQL.format(k=key)} AS latq",
            f"{_LON_SQL.format(k=key)} AS lonq",
            f"substr({gh}, 1, {PREFIX}) AS cell",
        )

    cg = points("customer", "c_custkey").alias("cg")
    sg = points("supplier", "s_suppkey").alias("sg")
    dlat = F.col("cg.latq") - F.col("sg.latq")
    dlon = F.col("cg.lonq") - F.col("sg.lonq")
    return cg.join(F.broadcast(sg), "cell").select(
        F.col("cg.k").alias("custkey"),
        F.col("sg.k").alias("suppkey"),
        F.col("cell"),
        (dlat * dlat + dlon * dlon).cast("long").alias("d2_q"),
    )


@query(
    "geo_nearest_supplier",
    oracle=f"""
    WITH cust AS ({_CUST_SQL}),
    supp AS ({_SUPP_SQL}),
    pairs AS (
      SELECT c.k AS custkey, s.k AS suppkey,
             CAST((c.latq - s.latq) * (c.latq - s.latq)
                  + (c.lonq - s.lonq) * (c.lonq - s.lonq) AS BIGINT) AS d2_q
      FROM cust c, supp s
    )
    SELECT custkey, suppkey, d2_q FROM (
      SELECT custkey, suppkey, d2_q,
             ROW_NUMBER() OVER (PARTITION BY custkey
                                ORDER BY d2_q, suppkey) AS rn
      FROM pairs
    ) WHERE rn = 1
    """,
)
def geo_nearest_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nearest-facility join: for every customer point, the single
    nearest supplier by exact quantized squared distance (ties by
    suppkey) — the spatial argmin join behind "closest warehouse /
    station" assignment, here in its small-dimension regime: the
    supplier side broadcasts, the distance-argmin collapses to ONE
    ``min(struct(d2, key))`` aggregation per customer — a map-side
    combinable groupBy, no window over the pair fan-out.

    When BOTH sides are large this exact plan is wrong — use the
    geohash-cell candidates (geo_geohash_join) with ring expansion for
    the refine; this query is the broadcast tier of that same family,
    the one a 100 TB fact side actually wants against a dimension-sized
    facility list.  Flat (unwrapped) quantized coordinates, same
    deterministic point derivation as the cell join."""
    c = tbl(spark, sf_dir, "customer").selectExpr(
        "c_custkey AS custkey",
        f"{_LAT_SQL.format(k='c_custkey')} AS clat",
        f"{_LON_SQL.format(k='c_custkey')} AS clon",
    )
    s = tbl(spark, sf_dir, "supplier").selectExpr(
        "s_suppkey AS suppkey",
        f"{_LAT_SQL.format(k='s_suppkey')} AS slat",
        f"{_LON_SQL.format(k='s_suppkey')} AS slon",
    )
    d2 = (
        (F.col("clat") - F.col("slat")) * (F.col("clat") - F.col("slat"))
        + (F.col("clon") - F.col("slon")) * (F.col("clon") - F.col("slon"))
    ).cast("long")
    best = (
        c.crossJoin(F.broadcast(s))
        .select("custkey", "suppkey", d2.alias("d2_q"))
        .groupBy("custkey")
        .agg(
            F.min(
                F.struct(
                    F.col("d2_q").alias("d2_q"), F.col("suppkey").alias("suppkey")
                )
            ).alias("m")
        )
    )
    return best.select(
        "custkey", F.col("m.suppkey").alias("suppkey"), F.col("m.d2_q").alias("d2_q")
    )
