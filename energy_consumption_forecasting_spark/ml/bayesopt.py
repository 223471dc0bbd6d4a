"""Bayesian hyperparameter optimization — SURVEY §2.7 M13.

Reference: GP surrogate (GaussianProcessRegressor(alpha=1e-3,
n_restarts=10, normalize_y=True)), LCB acquisition mu − 2.753·std,
100-point random candidate pool, outlier-rejection >3.5×max
(optimization.py:35-151).

sklearn is optional; the numpy GP below implements the published RBF-GP
regression equations (Cholesky solve) and the same LCB rule.  The
surrogate is driver-side by design — it models a handful of scalar
(hyperparam, objective) points; every objective evaluation is a
Spark-evaluated cross-validated metric, which is where the data-scale
work happens."""

from __future__ import annotations

from collections.abc import Callable

import numpy as np

try:
    from sklearn.gaussian_process import GaussianProcessRegressor  # type: ignore

    _HAS_SKLEARN = True
except ImportError:
    _HAS_SKLEARN = False

KAPPA = 2.753  # reference's LCB multiplier (optimization.py:84-91)


class _NumpyGP:
    """Minimal RBF-kernel GP regressor (normalize_y, jitter alpha)."""

    def __init__(self, alpha: float = 1e-3, length_scale: float = 1.0):
        self.alpha = alpha
        self.length_scale = length_scale

    def _k(self, A: np.ndarray, B: np.ndarray) -> np.ndarray:
        d2 = ((A[:, None, :] - B[None, :, :]) ** 2).sum(-1)
        return np.exp(-0.5 * d2 / self.length_scale**2)

    def fit(self, X: np.ndarray, y: np.ndarray) -> "_NumpyGP":
        self.X = np.atleast_2d(X).astype(float)
        self.y_mean = float(np.mean(y))
        self.y_std = float(np.std(y)) or 1.0
        yn = (np.asarray(y, float) - self.y_mean) / self.y_std
        K = self._k(self.X, self.X) + self.alpha * np.eye(len(self.X))
        self.L = np.linalg.cholesky(K)
        self.alpha_vec = np.linalg.solve(
            self.L.T, np.linalg.solve(self.L, yn)
        )
        return self

    def predict(self, Xs: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
        Xs = np.atleast_2d(Xs).astype(float)
        Ks = self._k(Xs, self.X)
        mu = Ks @ self.alpha_vec * self.y_std + self.y_mean
        v = np.linalg.solve(self.L, Ks.T)
        var = np.clip(1.0 - (v**2).sum(0), 1e-12, None) * self.y_std**2
        return mu, np.sqrt(var)


def bayes_opt(
    objective: Callable[[np.ndarray], float],
    bounds: list[tuple[float, float]],
    n_init: int = 5,
    n_iter: int = 20,
    n_candidates: int = 100,
    seed: int = 42,
    outlier_factor: float = 3.5,
) -> dict:
    """Minimize ``objective`` over box ``bounds`` with GP + LCB.

    Mirrors the reference loop: random init, fit surrogate, score a
    random candidate pool with mu − κ·σ, evaluate the argmin, reject
    evaluations worse than ``outlier_factor`` × the running max
    (optimization.py:112-151)."""
    rng = np.random.RandomState(seed)
    dim = len(bounds)
    lo = np.array([b[0] for b in bounds])
    hi = np.array([b[1] for b in bounds])

    X = lo + rng.rand(n_init, dim) * (hi - lo)
    y = [float(objective(x)) for x in X]
    X = list(map(np.asarray, X))

    for _ in range(n_iter):
        ymax = max(y)
        keep = [i for i, v in enumerate(y) if v <= outlier_factor * ymax]
        Xf = np.array([X[i] for i in keep])
        yf = np.array([y[i] for i in keep])
        if _HAS_SKLEARN:
            gp = GaussianProcessRegressor(alpha=1e-3, normalize_y=True)
            gp.fit(Xf, yf)
            cand = lo + rng.rand(n_candidates, dim) * (hi - lo)
            mu, std = gp.predict(cand, return_std=True)
        else:
            gp = _NumpyGP(alpha=1e-3).fit(Xf, yf)
            cand = lo + rng.rand(n_candidates, dim) * (hi - lo)
            mu, std = gp.predict(cand)
        x_next = cand[int(np.argmin(mu - KAPPA * std))]
        X.append(x_next)
        y.append(float(objective(x_next)))

    best = int(np.argmin(y))
    return {
        "best_x": np.asarray(X[best]),
        "best_y": y[best],
        "history": list(zip([list(map(float, x)) for x in X], y)),
    }
