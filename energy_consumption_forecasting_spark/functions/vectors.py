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
    """Cosine similarity; inputs must already be double arrays."""
    return dot(a, b) / (F.sqrt(norm2(a)) * F.sqrt(norm2(b)))
