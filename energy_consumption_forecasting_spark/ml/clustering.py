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
    DTW stage stayed distributed.  (The registered query runs the
    identical core WITHOUT the collect — kmedoids_rows inside a
    1-partition mapInPandas, r9.)"""
    return kmedoids_rows(dist_df.collect(), k=k, max_iter=max_iter, seed=seed)


def kmedoids_rows(
    rows, k: int = 12, max_iter: int = 20, seed: int = 42
) -> dict:
    """k-medoids over (id_a, id_b, dtw) mapping rows — pure Python/
    numpy, callable on the driver OR inside an executor fold."""
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


# --- TimeSeriesKMeans with DBA centroids (closes the r2 M5 substitution gap) -----
def _dtw_path(a: np.ndarray, b: np.ndarray) -> list[tuple[int, int]]:
    """DTW alignment path (i, j) pairs for the optimal warping of a→b."""
    n, m = len(a), len(b)
    D = np.full((n + 1, m + 1), np.inf)
    D[0, 0] = 0.0
    for i in range(1, n + 1):
        cost = np.abs(a[i - 1] - b)
        for j in range(1, m + 1):
            D[i, j] = cost[j - 1] + min(
                D[i - 1, j], D[i, j - 1], D[i - 1, j - 1]
            )
    path = []
    i, j = n, m
    while i > 0 and j > 0:
        path.append((i - 1, j - 1))
        step = int(
            np.argmin([D[i - 1, j - 1], D[i - 1, j], D[i, j - 1]])
        )
        if step == 0:
            i, j = i - 1, j - 1
        elif step == 1:
            i -= 1
        else:
            j -= 1
    return path[::-1]


def _dba(series: list[np.ndarray], init: np.ndarray, iters: int = 5) -> np.ndarray:
    """DTW Barycenter Averaging (Petitjean, Ketterlin & Gançarski,
    Pattern Recognition 44(3), 2011): repeat {align every series to the
    current barycenter, average the values warped onto each barycenter
    position}.  The tslearn centroid update the reference uses
    (TimeSeriesKMeans(metric="dtw"))."""
    center = init.astype(np.float64).copy()
    for _ in range(iters):
        sums = np.zeros(len(center))
        counts = np.zeros(len(center))
        for s in series:
            for j, i in _dtw_path(s, center):
                sums[i] += s[j]
                counts[i] += 1
        mask = counts > 0
        center[mask] = sums[mask] / counts[mask]
    return center


def tskmeans_dba(
    series_df: DataFrame,
    k: int = 6,
    n_iter: int = 5,
    dba_iters: int = 3,
    seed: int = 42,
) -> tuple[dict, np.ndarray]:
    """TimeSeriesKMeans(metric="dtw") with true DBA centroid updates,
    Spark-shaped: per-iteration the ASSIGNMENT step is an Arrow-batched
    map with the k×L centroid matrix on a broadcast (each series scores
    k DTWs row-locally), and the CENTROID step is one applyInPandas per
    cluster (series of a cluster never leave the executors; only the k
    new centroids — KB — return to the driver).  Initialization:
    k seeded series (deterministic).

    Requires equal-length series (the reference's monthly windows are).
    Returns ({series_id: cluster}, centroids array)."""
    spark = series_df.sparkSession
    first = series_df.select(
        "series_id", "series"
    ).orderBy("series_id").limit(k).collect()
    centroids = np.asarray(
        [list(r["series"]) for r in first], dtype=np.float64
    )

    assign_schema = T.StructType(
        [
            T.StructField("series_id", series_df.schema["series_id"].dataType),
            T.StructField("series", T.ArrayType(T.DoubleType())),
            T.StructField("cluster", T.IntegerType()),
        ]
    )
    cent_schema = T.StructType(
        [
            T.StructField("cluster", T.IntegerType()),
            T.StructField("centroid", T.ArrayType(T.DoubleType())),
        ]
    )

    def _assigned_for(bc):
        def assign(batches):
            cents = bc.value
            for pdf in batches:
                out_c = []
                for s in pdf["series"]:
                    sa = np.asarray(s, dtype=np.float64)
                    out_c.append(
                        int(np.argmin([_dtw(sa, c) for c in cents]))
                    )
                yield pd.DataFrame(
                    {
                        "series_id": pdf["series_id"],
                        "series": pdf["series"],
                        "cluster": out_c,
                    }
                )

        return series_df.select("series_id", "series").mapInPandas(
            assign, schema=assign_schema
        )

    for _ in range(n_iter):
        bc = spark.sparkContext.broadcast(centroids)
        # One k-DTW assignment pass per iteration: persist so the
        # centroid-update action doesn't recompute it (the pre-fix
        # version ran the full assignment twice per iteration).
        assigned = _assigned_for(bc).persist()

        def update(pdf: pd.DataFrame) -> pd.DataFrame:
            c = int(pdf["cluster"].iloc[0])
            series = [
                np.asarray(s, dtype=np.float64) for s in pdf["series"]
            ]
            center = _dba(series, bc.value[c], iters=dba_iters)
            return pd.DataFrame(
                {"cluster": [c], "centroid": [center.tolist()]}
            )

        new_cents = (
            assigned.groupBy("cluster")
            .applyInPandas(update, schema=cent_schema)
            .collect()
        )
        assigned.unpersist()
        for r in new_cents:
            centroids[r["cluster"]] = np.asarray(r["centroid"])

    # Final assignment against the UPDATED centroids (tslearn-consistent:
    # labels always reflect the returned cluster centers).
    bc = spark.sparkContext.broadcast(centroids)
    assignment = {
        r["series_id"]: int(r["cluster"])
        for r in _assigned_for(bc).select("series_id", "cluster").collect()
    }
    return assignment, centroids


# --- k-Shape clustering (Paparrizos & Gravano, SIGMOD 2015) ----------------------
def _znorm(x: np.ndarray) -> np.ndarray:
    s = x.std()
    return (x - x.mean()) / s if s > 0 else x - x.mean()


def _ncc_max(a: np.ndarray, b: np.ndarray) -> tuple[float, int]:
    """Max coefficient-normalized cross-correlation over all shifts and
    the argmax shift (b rolled by +shift aligns to a).  Inputs need not
    be z-normalized; the coefficient normalization handles scale."""
    denom = np.linalg.norm(a) * np.linalg.norm(b)
    if denom == 0:
        return 0.0, 0
    cc = np.correlate(a, b, mode="full") / denom
    w = int(np.argmax(cc))
    return float(cc[w]), w - (len(b) - 1)


def _sbd(a: np.ndarray, b: np.ndarray) -> float:
    """Shape-based distance: 1 − max_w NCC_c(a, b) ∈ [0, 2]; 0 for any
    shift of a scaled copy."""
    return 1.0 - _ncc_max(a, b)[0]


def sbd_distance_matrix(series_df: DataFrame) -> DataFrame:
    """Pairwise SBD, distributed with the same block-keyed grouped map
    as dtw_distance_matrix (one row per pair, blocks spread work)."""
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
            T.StructField("sbd", T.DoubleType()),
        ]
    )

    def block_sbd(pdf: pd.DataFrame) -> pd.DataFrame:
        out = []
        for _, r in pdf.iterrows():
            out.append(
                {
                    "id_a": r["id_a"],
                    "id_b": r["id_b"],
                    "sbd": _sbd(
                        np.asarray(r["s_a"], dtype=np.float64),
                        np.asarray(r["s_b"], dtype=np.float64),
                    ),
                }
            )
        return pd.DataFrame(out, columns=["id_a", "id_b", "sbd"])

    return pairs.groupBy("block").applyInPandas(block_sbd, schema=schema)


def _align_to(ref: np.ndarray, x: np.ndarray) -> np.ndarray:
    """Roll x by the NCC-optimal shift against ref (zero fill)."""
    _, shift = _ncc_max(ref, x)
    out = np.zeros_like(x)
    if shift >= 0:
        out[shift:] = x[: len(x) - shift]
    else:
        out[:shift] = x[-shift:]
    return out


def _shape_extraction(X: np.ndarray, ref: np.ndarray) -> np.ndarray:
    """k-Shape centroid: members aligned to the current centroid, then
    the dominant eigenvector of the centered Gram matrix (the paper's
    Rayleigh-quotient maximizer of summed squared NCC)."""
    A = np.vstack([_align_to(ref, x) for x in X])
    m = A.shape[1]
    Q = np.eye(m) - np.ones((m, m)) / m
    M = Q @ (A.T @ A) @ Q
    vals, vecs = np.linalg.eigh(M)
    c = vecs[:, -1]
    # eigenvector sign is arbitrary — orient toward the member mass
    if np.linalg.norm(A[0] - c) > np.linalg.norm(A[0] + c):
        c = -c
    return _znorm(c)


def kshape(
    series: dict, k: int = 4, max_iter: int = 20, seed: int = 42
) -> dict:
    """Driver-side k-Shape over bounded series (reference scale: ≤105
    monthly sub-series).  ``series``: {id: np.ndarray}, equal lengths
    (zero-pad shorter months).  Returns {"labels": {id: c},
    "centroids": [np.ndarray]}.  Deterministic under the seed; empty
    clusters re-seed from the farthest series (standard k-Shape
    repair)."""
    ids = sorted(series)
    X = [_znorm(np.asarray(series[i], dtype=np.float64)) for i in ids]
    n = len(X)
    rng = np.random.RandomState(seed)
    labels = rng.randint(0, k, size=n)
    centroids = [np.zeros_like(X[0]) for _ in range(k)]
    for _ in range(max_iter):
        for c in range(k):
            members = [X[i] for i in range(n) if labels[i] == c]
            if members:
                ref = centroids[c] if np.any(centroids[c]) else members[0]
                centroids[c] = _shape_extraction(members, ref)
        new = np.array(
            [
                int(np.argmin([_sbd(centroids[c], x) for c in range(k)]))
                for x in X
            ]
        )
        # re-seed empty clusters with the worst-fit series
        for c in range(k):
            if not (new == c).any():
                dists = np.array(
                    [_sbd(centroids[new[i]], X[i]) for i in range(n)]
                )
                far = int(np.argmax(dists))
                new[far] = c
        if (new == labels).all():
            break
        labels = new
    return {
        "labels": {ids[i]: int(labels[i]) for i in range(n)},
        "centroids": centroids,
    }
