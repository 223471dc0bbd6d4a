"""Factor Analysis with varimax rotation — SURVEY §2.7 M4.

Reference: 3-factor decomposition alternative to PCA
(ts_kmeans_base.ipynb:943-945), sklearn FactorAnalysis + varimax.

Implementation is principal-axis factoring on the correlation matrix
(eigendecomposition of the reduced correlation matrix with iterated
communalities) plus the published varimax rotation — both plain numpy
on a features×features matrix.  Per SURVEY §2.7, the factorization
itself is driver-sized by construction; Spark's job is the upstream
aggregation + correlation matrix, which ARE distributed (exact decimal
sums).  r1 carried an sklearn-gated branch that collected the RAW rows
via toPandas — removed: any library backend must consume the same
driver-sized correlation matrix, never the table."""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def moment_aggs(cols: list[str]) -> list:
    """The exact-moment aggregate list behind `correlation_matrix`:
    row count, per-column decimal sums, upper-triangle cross sums.
    Factored (r9) so the lazy in-plan fit frames and the driver path
    build the identical expressions."""
    aggs = [F.count("*").alias("__n")]
    for c in cols:
        d = F.col(c).cast("decimal(28,6)")
        aggs += [F.sum(d).cast("double").alias(f"s_{c}")]
    for i, a in enumerate(cols):
        for b in cols[i:]:
            da = F.col(a).cast("decimal(28,6)")
            db = F.col(b).cast("decimal(28,6)")
            aggs.append(F.sum(da * db).cast("double").alias(f"q_{a}__{b}"))
    return aggs


def corr_from_moment_row(row, cols: list[str]) -> np.ndarray:
    """Rebuild the Pearson matrix from a `moment_aggs` row — pure
    numpy, callable on the driver or inside an executor fold."""
    n = int(row["__n"])
    k = len(cols)
    C = np.zeros((k, k))
    means = {c: row[f"s_{c}"] / n for c in cols}
    for i, a in enumerate(cols):
        for j in range(i, k):
            b = cols[j]
            cov = row[f"q_{a}__{b}"] / n - means[a] * means[b]
            C[i, j] = C[j, i] = cov
    d = np.sqrt(np.diag(C))
    return C / np.outer(d, d)


def correlation_matrix(df: DataFrame, cols: list[str]) -> np.ndarray:
    """Pearson correlations from one distributed pass of exact moments."""
    return corr_from_moment_row(df.agg(*moment_aggs(cols)).first(), cols)


def principal_axis_factoring(
    R: np.ndarray, n_factors: int, n_iter: int = 50
) -> np.ndarray:
    """Iterated PAF: communalities on the diagonal, eigendecompose,
    update until stable.  Returns (k, n_factors) loadings."""
    k = R.shape[0]
    h2 = 1.0 - 1.0 / np.diag(np.linalg.pinv(R))  # SMC start
    for _ in range(n_iter):
        Rr = R.copy()
        np.fill_diagonal(Rr, h2)
        vals, vecs = np.linalg.eigh(Rr)
        order = np.argsort(vals)[::-1][:n_factors]
        L = vecs[:, order] * np.sqrt(np.clip(vals[order], 0, None))
        # Clamp the communality update to 1: unbounded PAF iteration
        # drifts into Heywood cases (h² > 1 ⇒ |loading| > 1 for a
        # standardized variable — measured on the daily order features),
        # and the standard remedy is exactly this bound (same rule as
        # factor_analyzer / SPSS).  Loadings are rescaled with the
        # clamped h² so the returned L stays consistent with it.
        h2_new = (L**2).sum(axis=1)
        over = h2_new > 1.0
        if over.any():
            L[over] *= np.sqrt(1.0 / h2_new[over])[:, None]
            h2_new = np.minimum(h2_new, 1.0)
        if np.max(np.abs(h2_new - h2)) < 1e-6:
            h2 = h2_new
            break
        h2 = h2_new
    return L


def varimax(L: np.ndarray, n_iter: int = 100, tol: float = 1e-8) -> np.ndarray:
    """Kaiser's varimax rotation (published algorithm)."""
    k, m = L.shape
    R = np.eye(m)
    var_old = 0.0
    for _ in range(n_iter):
        Lr = L @ R
        u, s, vt = np.linalg.svd(
            L.T @ (Lr**3 - (Lr * (Lr**2).sum(axis=0) / k))
        )
        R = u @ vt
        var_new = s.sum()
        if var_new - var_old < tol:
            break
        var_old = var_new
    return L @ R


def factor_analysis(
    df: DataFrame, cols: list[str], n_factors: int = 3, rotate: bool = True
) -> list[tuple[str, list[float]]]:
    """End-to-end M4: distributed correlation pass → driver-side
    factoring (+ varimax) → (column, loadings) list."""
    R = correlation_matrix(df, cols)
    L = principal_axis_factoring(R, n_factors)
    if rotate:
        L = varimax(L)
    return [(c, [float(x) for x in L[i]]) for i, c in enumerate(cols)]
