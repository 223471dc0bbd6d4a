"""Seasonal decomposition + wavelets — SURVEY §2.7 M7, M8.

Reference: seasonal_decompose(model='additive', period=365) / STL
(ts_kmeans_base.ipynb:1169,1197,1225), pywt.dwt(series,'db4')
(K:1334-1337).

The window-native decomposition (verified against DuckDB) lives in
queries/timeseries.py::m7_seasonal_decompose.  Here:

* ``decompose_grouped`` — per-series grouped map mirroring the
  statsmodels algorithm (centered moving average trend, by-period mean
  seasonal, residual); runs statsmodels itself when available.
* ``haar_dwt_grouped`` — single-level Haar DWT (pywt 'db4' when the
  library exists; Haar is the numpy fallback — same output shape,
  published algorithm)."""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T

try:
    from statsmodels.tsa.seasonal import seasonal_decompose  # type: ignore

    _HAS_STATSMODELS = True
except ImportError:
    _HAS_STATSMODELS = False

try:
    import pywt  # type: ignore

    _HAS_PYWT = True
except ImportError:
    _HAS_PYWT = False


def _np_decompose(y: np.ndarray, period: int):
    """Additive decomposition, statsmodels-equivalent (centered MA with
    even-period half-weights; seasonal = de-meaned by-phase averages)."""
    n = len(y)
    half = period // 2
    trend = np.full(n, np.nan)
    if n >= period + 1:
        if period % 2 == 0:
            w = np.ones(period + 1)
            w[0] = w[-1] = 0.5
            w /= period
            conv = np.convolve(y, w, mode="valid")
            trend[half : half + len(conv)] = conv
        else:
            conv = np.convolve(y, np.ones(period) / period, mode="valid")
            trend[half : half + len(conv)] = conv
    detrended = y - trend
    seasonal_means = np.array(
        [np.nanmean(detrended[p::period]) for p in range(period)]
    )
    seasonal_means -= np.nanmean(seasonal_means)
    seasonal = np.array([seasonal_means[i % period] for i in range(n)])
    resid = y - trend - seasonal
    return trend, seasonal, resid


def decompose_grouped(
    df: DataFrame,
    key_cols: list[str],
    time_col: str,
    value_col: str,
    period: int = 7,
) -> DataFrame:
    """Per-series additive decomposition via applyInPandas (exact
    statsmodels when installed; numpy-equivalent otherwise)."""
    schema = T.StructType(
        [df.schema[k] for k in key_cols]
        + [
            df.schema[time_col],
            T.StructField("trend", T.DoubleType()),
            T.StructField("seasonal", T.DoubleType()),
            T.StructField("resid", T.DoubleType()),
        ]
    )

    def decomp(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(time_col)
        y = pdf[value_col].to_numpy(dtype=np.float64)
        if _HAS_STATSMODELS and len(y) >= 2 * period:
            res = seasonal_decompose(y, model="additive", period=period)
            trend, seasonal, resid = res.trend, res.seasonal, res.resid
        else:
            trend, seasonal, resid = _np_decompose(y, period)
        out = pdf[key_cols + [time_col]].copy()
        out["trend"] = trend
        out["seasonal"] = seasonal
        out["resid"] = resid
        return out

    return df.groupBy(*key_cols).applyInPandas(decomp, schema=schema)


def haar_dwt_grouped(
    df: DataFrame, key_cols: list[str], time_col: str, value_col: str
) -> DataFrame:
    """Single-level DWT per series: pywt db4 (periodization) when
    available, else the Haar transform (averages/differences over pairs
    scaled by √2) — SURVEY M8's coefficient-extraction capability."""
    schema = T.StructType(
        [df.schema[k] for k in key_cols]
        + [
            T.StructField("approx", T.ArrayType(T.DoubleType())),
            T.StructField("detail", T.ArrayType(T.DoubleType())),
        ]
    )

    def dwt(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(time_col)
        y = pdf[value_col].to_numpy(dtype=np.float64)
        if _HAS_PYWT:
            ca, cd = pywt.dwt(y, "db4", mode="periodization")
        else:
            if len(y) % 2:
                y = np.append(y, y[-1])
            ca = (y[0::2] + y[1::2]) / np.sqrt(2.0)
            cd = (y[0::2] - y[1::2]) / np.sqrt(2.0)
        head = {k: pdf[k].iloc[0] for k in key_cols}
        return pd.DataFrame([{**head, "approx": ca.tolist(), "detail": cd.tolist()}])

    return df.groupBy(*key_cols).applyInPandas(dwt, schema=schema)
