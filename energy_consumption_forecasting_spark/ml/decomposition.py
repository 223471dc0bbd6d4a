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


# --- db4 filter bank (published Daubechies-4 constants; 8 taps) ------------
# rec_lo = the standard db4 scaling coefficients; the analysis pair is
# dec_lo = reverse(rec_lo), dec_hi = reverse(qmf(rec_lo)) — the pywt
# filter-bank relations, so the in-container transform matches
# ``pywt.dwt(y, 'db4', mode='periodization')`` (K:1334-1337) without the
# library.  Verified in tests by the algebra the filters must satisfy:
# perfect reconstruction, orthonormal energy preservation, Σlo = √2,
# and 4 vanishing moments (cubics annihilate away from the wrap).
_DB4_REC_LO = np.array(
    [
        0.23037781330885523,
        0.7148465705525415,
        0.6308807679295904,
        -0.02798376941698385,
        -0.18703481171888114,
        0.030841381835986965,
        0.032883011666982945,
        -0.010597401784997278,
    ]
)
_DB4_DEC_LO = _DB4_REC_LO[::-1].copy()
# qmf(g)[k] = (-1)^k · g[L-1-k]; dec_hi = reverse(rec_hi)
_DB4_REC_HI = np.array(
    [(-1.0) ** k * _DB4_REC_LO[len(_DB4_REC_LO) - 1 - k] for k in range(8)]
)
_DB4_DEC_HI = _DB4_REC_HI[::-1].copy()


def db4_dwt(y: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Single-level db4 DWT, periodization mode: circular correlation
    ``c[i] = Σ_k f[k] · y[(2i+1-k) mod n]``, downsampled by 2.  Odd
    lengths repeat the last sample first (pywt 'per' behavior).
    Output length ⌈n/2⌉ per band."""
    y = np.asarray(y, dtype=np.float64)
    if len(y) % 2:
        y = np.append(y, y[-1])
    n = len(y)
    L = len(_DB4_DEC_LO)
    idx = (2 * np.arange(n // 2)[:, None] + 1 - np.arange(L)[None, :]) % n
    windows = y[idx]  # (n/2, 8) gather — vectorized, no Python loop
    return windows @ _DB4_DEC_LO, windows @ _DB4_DEC_HI


def db4_idwt(ca: np.ndarray, cd: np.ndarray) -> np.ndarray:
    """Inverse of ``db4_dwt`` (adjoint of the orthonormal analysis
    operator): scatter each coefficient back through its filter taps."""
    m = len(ca)
    n = 2 * m
    L = len(_DB4_DEC_LO)
    out = np.zeros(n)
    idx = (2 * np.arange(m)[:, None] + 1 - np.arange(L)[None, :]) % n
    np.add.at(out, idx, ca[:, None] * _DB4_DEC_LO[None, :])
    np.add.at(out, idx, cd[:, None] * _DB4_DEC_HI[None, :])
    return out


def haar_dwt_grouped(
    df: DataFrame, key_cols: list[str], time_col: str, value_col: str
) -> DataFrame:
    """Single-level DWT per series: pywt db4 (periodization) when
    available for exact library parity, else the numpy db4 filter bank
    above (r1 shipped a Haar stand-in; the reference uses db4) —
    SURVEY M8's coefficient-extraction capability."""
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
            ca, cd = db4_dwt(y)
        head = {k: pdf[k].iloc[0] for k in key_cols}
        return pd.DataFrame([{**head, "approx": ca.tolist(), "detail": cd.tolist()}])

    return df.groupBy(*key_cols).applyInPandas(dwt, schema=schema)
