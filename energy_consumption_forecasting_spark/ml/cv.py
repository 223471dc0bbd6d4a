"""Blocked time-series cross-validation — SURVEY §2.7 M12 / §2.5 W7.

Reference: BlockingTimeSeriesSplit (utils.py:8-23) — 5 contiguous equal
blocks over time order, last 20 % of each block is validation.

The fold assignment is a single ``ntile`` window; per-fold train/val
DataFrames are filters over the labeled frame — no data duplication, so
a 5-fold CV reads the base data once per evaluation, not five times.
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def label_folds(
    df: DataFrame,
    order_cols: list[str],
    n_folds: int = 5,
    val_frac: float = 0.2,
) -> DataFrame:
    """Add ``fold`` (1..n) and ``role`` ('train'|'val') columns."""
    w = Window.orderBy(*order_cols)
    ranked = df.withColumn("fold", F.ntile(n_folds).over(w))
    wf = Window.partitionBy("fold").orderBy(*order_cols)
    return ranked.withColumn(
        "role",
        F.when(
            F.row_number().over(wf)
            > (1.0 - val_frac) * F.count("*").over(Window.partitionBy("fold")),
            "val",
        ).otherwise("train"),
    )


def folds(
    df: DataFrame,
    order_cols: list[str],
    n_folds: int = 5,
    val_frac: float = 0.2,
) -> Iterator[tuple[DataFrame, DataFrame]]:
    """Yield (train, val) per fold — train is the block head, val the tail."""
    labeled = label_folds(df, order_cols, n_folds, val_frac)
    for k in range(1, n_folds + 1):
        fold_df = labeled.filter(F.col("fold") == k)
        yield (
            fold_df.filter(F.col("role") == "train").drop("fold", "role"),
            fold_df.filter(F.col("role") == "val").drop("fold", "role"),
        )


def train_test_split(
    df: DataFrame, order_cols: list[str], train_frac: float = 0.85
) -> tuple[DataFrame, DataFrame]:
    """Positional split (reference iloc[:85%] — xgb.ipynb:532-533)."""
    w = Window.orderBy(*order_cols)
    labeled = df.withColumn(
        "__is_train",
        F.row_number().over(w)
        <= F.ceil(train_frac * F.count("*").over(Window.partitionBy())),
    )
    return (
        labeled.filter(F.col("__is_train")).drop("__is_train"),
        labeled.filter(~F.col("__is_train")).drop("__is_train"),
    )
