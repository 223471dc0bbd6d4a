"""Vector math over ArrayType columns — pure Catalyst expressions.

Dot products and norms are sequential left-folds (``F.aggregate``) over
the array index order: deterministic accumulation, bit-identical to a
scalar loop on any engine, and fully JVM-side (no Python UDF in the
similarity hot path).  On float inputs, widen to double BEFORE
multiplying so the products don't round at float precision.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def as_double(v: Column | str) -> Column:
    c = F.col(v) if isinstance(v, str) else v
    return F.transform(c, lambda x: x.cast("double"))


def dot(a: Column, b: Column) -> Column:
    """Sequential-fold dot product: sum_i a[i]*b[i] in index order."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
    )


def norm2(a: Column) -> Column:
    """Squared L2 norm (sequential fold)."""
    return F.aggregate(
        F.transform(a, lambda x: x * x), F.lit(0.0), lambda acc, x: acc + x
    )


def cosine(a: Column, b: Column) -> Column:
    """Cosine similarity; inputs must already be double arrays.

    For pairwise queries prefer ``with_norm`` + ``cosine_prenormed`` —
    recomputing both norms per PAIR folds each vector O(n) times."""
    return dot(a, b) / (F.sqrt(norm2(a)) * F.sqrt(norm2(b)))


def with_norm(df, vec_col: str = "v", norm_col: str = "nrm"):
    """Attach the L2 norm as a column (computed once per vector)."""
    return df.withColumn(norm_col, F.sqrt(norm2(F.col(vec_col))))


def cosine_prenormed(a: Column, b: Column, na: Column, nb: Column) -> Column:
    """dot(a,b) / (‖a‖·‖b‖) with precomputed norms — bit-identical to
    ``cosine`` (the norm value is the same double either way)."""
    return dot(a, b) / (na * nb)
