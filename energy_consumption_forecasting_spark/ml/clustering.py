"""Clustering — SURVEY §2.7 M3 (PCA), M5 (time-series k-means with DTW),
M6 (silhouette).

Reference: PCA(k=3) (ts_kmeans_base.ipynb:940-951), TimeSeriesKMeans
(n_clusters, metric="dtw") (K:1942-1944,2023-2025), silhouette
(K:1945-1946,2026-2027).

MLlib covers PCA / euclidean KMeans / silhouette JVM-side.  DTW has no
MLlib form: the distance matrix is computed distributed (one pandas-UDF
task per series-pair block), and only the k-medoids assignment loop —
O(n_series²) on a ≤105-month matrix — runs on the driver, per SURVEY
§4.2.6."""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def assemble(df: DataFrame, cols: list[str], output_col: str = "features") -> DataFrame:
    from pyspark.ml.feature import VectorAssembler

    return VectorAssembler(inputCols=cols, outputCol=output_col).transform(df)


def fit_pca(df: DataFrame, cols: list[str], k: int = 3):
    """MLlib PCA over assembled features; returns (model, projected df)."""
    from pyspark.ml.feature import PCA

    assembled = assemble(df, cols)
    model = PCA(k=k, inputCol="features", outputCol="pca").fit(assembled)
    return model, model.transform(assembled)


def fit_kmeans(df: DataFrame, cols: list[str], k: int = 12, seed: int = 42):
    """MLlib KMeans (euclidean baseline for M5) + silhouette score."""
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.evaluation import ClusteringEvaluator

    assembled = assemble(df, cols)
    model = KMeans(k=k, seed=seed, featuresCol="features").fit(assembled)
    clustered = model.transform(assembled)
    silhouette = ClusteringEvaluator(
        featuresCol="features", predictionCol="prediction", metricName="silhouette"
    ).evaluate(clustered)
    return model, clustered, float(silhouette)


def _dtw(a: np.ndarray, b: np.ndarray) -> float:
    """Classic O(len²) dynamic-programming DTW distance."""
    n, m = len(a), len(b)
    D = np.full((n + 1, m + 1), np.inf)
    D[0, 0] = 0.0
    for i in range(1, n + 1):
        cost = np.abs(a[i - 1] - b)
        for j in range(1, m + 1):
            D[i, j] = cost[j - 1] + min(D[i - 1, j], D[i, j - 1], D[i - 1, j - 1])
    return float(D[n, m])


def dtw_distance_matrix(series_df: DataFrame) -> DataFrame:
    """Pairwise DTW distances, computed distributed.

    ``series_df``: (series_id: any, series: array<double>).  The pair
    table is a self-join on id< id (each pair one row), and the DP
    runs in an Arrow-batched grouped map keyed on a block id so work
    spreads across executors in blocks, not one task per pair."""
    pairs = (
        series_df.alias("a")
        .join(series_df.alias("b"), F.col("a.series_id") < F.col("b.series_id"))
        .select(
            F.col("a.series_id").alias("id_a"),
            F.col("b.series_id").alias("id_b"),
            F.col("a.series").alias("s_a"),
            F.col("b.series").alias("s_b"),
        )
        .withColumn("block", F.crc32(F.concat_ws(",", "id_a", "id_b")) % 64)
    )
    schema = T.StructType(
        [
            T.StructField("id_a", pairs.schema["id_a"].dataType),
            T.StructField("id_b", pairs.schema["id_b"].dataType),
            T.StructField("dtw", T.DoubleType()),
        ]
    )

    def block_dtw(pdf: pd.DataFrame) -> pd.DataFrame:
        out = []
        for _, r in pdf.iterrows():
            out.append(
                {
                    "id_a": r["id_a"],
                    "id_b": r["id_b"],
                    "dtw": _dtw(
                        np.asarray(r["s_a"], dtype=np.float64),
                        np.asarray(r["s_b"], dtype=np.float64),
                    ),
                }
            )
        return pd.DataFrame(out, columns=["id_a", "id_b", "dtw"])

    return pairs.groupBy("block").applyInPandas(block_dtw, schema=schema)


def kmedoids_from_distances(
    dist_df: DataFrame, k: int = 12, max_iter: int = 20, seed: int = 42
) -> dict:
    """Driver-side k-medoids over a collected (tiny) distance matrix.

    The reference clusters ≤105 monthly series (K:1076-1077) — the
    matrix is ≤105², far below driver limits; the expensive pairwise
    DTW stage stayed distributed."""
    rows = dist_df.collect()
    ids = sorted({r["id_a"] for r in rows} | {r["id_b"] for r in rows})
    idx = {v: i for i, v in enumerate(ids)}
    n = len(ids)
    D = np.zeros((n, n))
    for r in rows:
        i, j = idx[r["id_a"]], idx[r["id_b"]]
        D[i, j] = D[j, i] = r["dtw"]
    rng = np.random.RandomState(seed)
    medoids = rng.choice(n, size=min(k, n), replace=False)
    for _ in range(max_iter):
        labels = np.argmin(D[:, medoids], axis=1)
        new_medoids = medoids.copy()
        for c in range(len(medoids)):
            members = np.where(labels == c)[0]
            if len(members):
                costs = D[np.ix_(members, members)].sum(axis=1)
                new_medoids[c] = members[int(np.argmin(costs))]
        if (new_medoids == medoids).all():
            break
        medoids = new_medoids
    labels = np.argmin(D[:, medoids], axis=1)
    return {ids[i]: int(labels[i]) for i in range(n)}
