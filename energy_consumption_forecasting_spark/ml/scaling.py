"""Feature scaling — SURVEY §2.7 M1 (min-max), M2 (standard).

Reference: MinMaxScaler before clustering
(ts_kmeans_base.ipynb:817-818,1940-1941); StandardScaler import
(xgb.ipynb:35).

Two forms:
* ``minmax_scale_expr`` / ``standard_scale_expr`` — pure column algebra
  (exact decimal stats → deterministic doubles), used by the verified
  queries and preferred in pipelines (stays in codegen).
* ``fit_minmax_pipeline`` — MLlib VectorAssembler+MinMaxScaler, for
  interop with MLlib estimators that want a Vector column.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def minmax_scale(df: DataFrame, cols: list[str], out_suffix: str = "_mm") -> DataFrame:
    """(x - min) / (max - min) per column; single pass for all stats."""
    stats = df.agg(
        *[F.min(c).alias(f"__min_{c}") for c in cols],
        *[F.max(c).alias(f"__max_{c}") for c in cols],
    )
    scaled = df.crossJoin(F.broadcast(stats))
    for c in cols:
        rng = F.col(f"__max_{c}") - F.col(f"__min_{c}")
        scaled = scaled.withColumn(
            c + out_suffix,
            F.when(rng == 0, 0.0).otherwise((F.col(c) - F.col(f"__min_{c}")) / rng),
        )
    return scaled.drop(*[f"__min_{c}" for c in cols], *[f"__max_{c}" for c in cols])


def standard_scale(
    df: DataFrame, cols: list[str], out_suffix: str = "_z", ddof: int = 1
) -> DataFrame:
    """(x - mean) / std with mean/std from exact decimal sums."""
    aggs = []
    for c in cols:
        d = F.col(c).cast("decimal(28,6)")
        aggs += [
            F.sum(d).cast("double").alias(f"__s_{c}"),
            F.sum(d * d).cast("double").alias(f"__q_{c}"),
        ]
    aggs.append(F.count("*").alias("__n"))
    stats = df.agg(*aggs)
    scaled = df.crossJoin(F.broadcast(stats))
    for c in cols:
        n = F.col("__n")
        mean = F.col(f"__s_{c}") / n
        var = (F.col(f"__q_{c}") - F.col(f"__s_{c}") * F.col(f"__s_{c}") / n) / (
            n - ddof
        )
        scaled = scaled.withColumn(c + out_suffix, (F.col(c) - mean) / F.sqrt(var))
    return scaled.drop(*[f"__s_{c}" for c in cols], *[f"__q_{c}" for c in cols], "__n")


def fit_minmax_pipeline(df: DataFrame, cols: list[str], output_col: str = "features_mm"):
    """MLlib variant: assemble → MinMaxScaler; returns (model, transformed)."""
    from pyspark.ml import Pipeline
    from pyspark.ml.feature import MinMaxScaler, VectorAssembler

    pipe = Pipeline(
        stages=[
            VectorAssembler(inputCols=cols, outputCol="__vec"),
            MinMaxScaler(inputCol="__vec", outputCol=output_col),
        ]
    )
    model = pipe.fit(df)
    return model, model.transform(df).drop("__vec")
