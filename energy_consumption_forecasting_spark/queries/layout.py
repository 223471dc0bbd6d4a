"""Z-order (Morton) data-layout clustering — multi-dimensional skipping.

Single-column sort gives min/max file skipping on one predicate column
only.  Interleaving the bits of two keys (Morton / Z-order curve) and
range-partitioning on the interleaved code co-locates rows that are
close in BOTH dimensions, so parquet min/max stats prune scans for
predicates on either key — the technique behind Delta/Iceberg OPTIMIZE
ZORDER, implemented here as a plain column expression.

The gate query computes the 20-bit Morton code over
(customer-key mod 1024, epoch-day mod 1024) for every order, buckets by
the code's top 12 bits (4096 layout cells ≙ target files), and emits the
per-bucket bounding box in both dimensions.  Bounded per-bucket spans
ARE the data-skipping property: a predicate on either dimension touches
only buckets whose box intersects it.  All arithmetic is integer
bit-twiddling — bit-identical on any engine, so the oracle hash is
strict.

Scale: the code is a row-local projection (no shuffle); the layout
itself would be one ``repartitionByRange(zcode)`` + sorted write.  The
summary is a hash agg on the bucket id — map-side combinable, 4096
groups regardless of table size.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from . import query
from ._util import tbl

BITS = 10  # bits per dimension -> 20-bit code
BUCKET_SHIFT = 8  # keep top 12 bits -> 4096 buckets


def morton_code(x: Column, y: Column, bits: int = BITS) -> Column:
    """Interleave the low ``bits`` of x (even positions) and y (odd)."""
    out = F.lit(0).cast("long")
    for i in range(bits):
        out = out + F.shiftleft(F.shiftright(x, i).bitwiseAND(1), 2 * i)
        out = out + F.shiftleft(F.shiftright(y, i).bitwiseAND(1), 2 * i + 1)
    return out


def _morton_sql(x: str, y: str, bits: int = BITS) -> str:
    terms = []
    for i in range(bits):
        terms.append(f"((({x} >> {i}) & 1) << {2 * i})")
        terms.append(f"((({y} >> {i}) & 1) << {2 * i + 1})")
    return " + ".join(terms)


@query(
    "scale_zorder_layout",
    oracle=f"""
    WITH keyed AS (
      SELECT o_custkey % 1024 AS xk,
             (CAST(o_orderdate AS DATE) - DATE '1970-01-01') % 1024 AS yk
      FROM orders
    ),
    coded AS (
      SELECT xk, yk, {_morton_sql('xk', 'yk')} AS zcode
      FROM keyed
    )
    SELECT CAST(zcode >> {BUCKET_SHIFT} AS BIGINT) AS bucket,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(MIN(xk) AS BIGINT) AS x_min, CAST(MAX(xk) AS BIGINT) AS x_max,
           CAST(MIN(yk) AS BIGINT) AS y_min, CAST(MAX(yk) AS BIGINT) AS y_max,
           CAST((MAX(xk) - MIN(xk) + 1) * (MAX(yk) - MIN(yk) + 1) AS BIGINT)
             AS bbox_area
    FROM coded GROUP BY 1
    """,
)
def scale_zorder_layout(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-bucket bounding boxes of the Z-order layout over
    (custkey mod 1024, epoch-day mod 1024).  ``bbox_area`` ≤ 2^BUCKET_SHIFT
    cells for every bucket — the locality guarantee min/max skipping
    relies on (a linear layout on either single key would leave the
    OTHER dimension's span unbounded)."""
    keyed = tbl(spark, sf_dir, "orders").select(
        (F.col("o_custkey") % 1024).alias("xk"),
        (
            F.datediff(F.to_date("o_orderdate"), F.lit("1970-01-01")) % 1024
        ).alias("yk"),
    )
    coded = keyed.select(
        "xk", "yk", morton_code(F.col("xk"), F.col("yk")).alias("zcode")
    )
    return coded.groupBy(
        F.shiftright("zcode", BUCKET_SHIFT).cast("long").alias("bucket")
    ).agg(
        F.count("*").alias("n_rows"),
        F.min("xk").cast("long").alias("x_min"),
        F.max("xk").cast("long").alias("x_max"),
        F.min("yk").cast("long").alias("y_min"),
        F.max("yk").cast("long").alias("y_max"),
        ((F.max("xk") - F.min("xk") + 1) * (F.max("yk") - F.min("yk") + 1))
        .cast("long")
        .alias("bbox_area"),
    )
