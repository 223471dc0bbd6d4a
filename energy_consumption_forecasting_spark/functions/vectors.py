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


def score_pairs_arrow(pairs, out_cols, va="va", vb="vb", na="na", nb="nb",
                      out="cos_sim"):
    """Vectorized pair-cosine scorer, BIT-IDENTICAL to
    ``cosine_prenormed`` (r10, guide §4.2).

    The HOF fold (``aggregate(zip_with(...))``) is evaluated by
    interpreted lambda closures per element — measured ~620 s of
    executor CPU scoring ~10M 64-dim candidate pairs in sim_knn_graph
    at sf1, 85% of the query.  This helper moves the fold into one
    Arrow batch pass: the accumulation loops over DIMENSIONS with
    NumPy doing the row-wise ``acc = acc + a_i * b_i`` elementwise, so
    the per-row operation sequence (mul, then add, in index order) is
    exactly the scalar left-fold's — IEEE doubles come out bit-equal,
    which the strict oracles require.  No reassociation happens:
    NumPy vectorizes ACROSS rows, never across the fold axis, and
    neither engine fuses mul+add (no FMA in either path).

    ``pairs`` must carry ``va``/``vb`` (equal-length double arrays) and
    ``na``/``nb`` (precomputed norms); only ``out_cols`` + ``out`` come
    back from the worker — project before calling so nothing else
    crosses the boundary (guide §4.1)."""
    import pyarrow as pa

    sch_in = pairs.schema
    fields = [sch_in[c] for c in out_cols]
    out_schema = pa.schema(
        [pa.field(f.name, _to_arrow(f.dataType)) for f in fields]
        + [pa.field(out, pa.float64())]
    )
    ddl = ", ".join(
        f"{f.name} {f.dataType.simpleString()}" for f in fields
    ) + f", {out} double"

    def _score(batches):
        import numpy as np

        for b in batches:
            n = b.num_rows
            if n == 0:
                continue
            ix = {name: j for j, name in enumerate(b.schema.names)}
            a = b.column(ix[va]).flatten().to_numpy(zero_copy_only=False)
            c = b.column(ix[vb]).flatten().to_numpy(zero_copy_only=False)
            d = a.size // n
            a = a.reshape(n, d)
            c = c.reshape(n, d)
            acc = np.zeros(n, dtype=np.float64)
            for i in range(d):
                acc = acc + a[:, i] * c[:, i]
            denom = b.column(ix[na]).to_numpy(
                zero_copy_only=False
            ) * b.column(ix[nb]).to_numpy(zero_copy_only=False)
            cos = acc / denom
            yield pa.RecordBatch.from_arrays(
                [b.column(ix[f.name]).cast(out_schema.field(f.name).type)
                 for f in fields] + [pa.array(cos, type=pa.float64())],
                schema=out_schema,
            )

    return pairs.select(*out_cols, va, vb, na, nb).mapInArrow(_score, ddl)


def _to_arrow(dt):
    """Minimal Spark→Arrow type map for the scorer's pass-through
    columns (ids and small scalars)."""
    import pyarrow as pa
    from pyspark.sql.types import (
        DoubleType,
        FloatType,
        IntegerType,
        LongType,
        StringType,
    )

    if isinstance(dt, LongType):
        return pa.int64()
    if isinstance(dt, IntegerType):
        return pa.int32()
    if isinstance(dt, DoubleType):
        return pa.float64()
    if isinstance(dt, FloatType):
        return pa.float32()
    if isinstance(dt, StringType):
        return pa.string()
    raise TypeError(f"score_pairs_arrow: unsupported key type {dt}")
