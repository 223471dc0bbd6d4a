"""Model-analysis harnesses — SURVEY §2.7 M15-M18.

Reference: SHAP KernelExplainer importance (evaluation.ipynb:13964-13991),
feature-group ablation (V:14040-14072), order sensitivity sweep
(V:14136-14238), learning curve (V:19103-19118).

All four share one shape: a driver loop over *configurations*, where
each configuration's score is a Spark-evaluated metric.  The loops are
over tens of configs (never data); each evaluation is distributed.

SHAP itself needs the shap package; ``permutation_importance`` is the
library-free analog (published algorithm: metric degradation under
per-feature value shuffling)."""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .cv import folds
from .metrics import mae


Scorer = Callable[[DataFrame], float]
"""A Scorer maps a (train∪val-ready) DataFrame to a scalar metric."""


def naive_ar_cv_mae(
    df: DataFrame, time_col: str, value_col: str, p: int = 7, n_folds: int = 5
) -> float:
    """Shared cheap objective: blocked-CV MAE of a trailing-mean AR(p)
    baseline — every fold evaluation is a window aggregate."""
    scores = []
    for train, val in folds(df, [time_col], n_folds=n_folds):
        fold = train.withColumn("__role", F.lit("t")).unionByName(
            val.withColumn("__role", F.lit("v"))
        )
        w = Window.orderBy(time_col).rowsBetween(-p, -1)
        scored = fold.withColumn("__pred", F.avg(value_col).over(w)).filter(
            (F.col("__role") == "v") & F.col("__pred").isNotNull()
        )
        m = scored.agg(mae(F.col("__pred"), F.col(value_col)).alias("m")).first()["m"]
        if m is not None:
            scores.append(float(m))
    return sum(scores) / len(scores)


def ablation(
    df: DataFrame,
    feature_groups: dict[str, list[str]],
    scorer: Scorer,
) -> dict[str, float]:
    """M16: re-score with each feature group dropped (plus 'none')."""
    out = {"none": scorer(df)}
    for name, cols in feature_groups.items():
        out[f"drop_{name}"] = scorer(df.drop(*cols))
    return out


def sensitivity_sweep(
    df: DataFrame,
    param_grid: list[dict],
    scorer_for: Callable[[dict], Scorer],
) -> list[tuple[dict, float]]:
    """M17: score every configuration in the grid (the reference sweeps
    (P,D,Q) ± 5 around the optimum)."""
    return [(params, scorer_for(params)(df)) for params in param_grid]


def learning_curve(
    df: DataFrame,
    time_col: str,
    fractions: list[float],
    scorer: Scorer,
) -> list[tuple[float, float]]:
    """M18: metric vs growing time-ordered data prefix."""
    w = Window.orderBy(time_col)
    ranked = df.withColumn("__rn", F.row_number().over(w)).withColumn(
        "__n", F.count("*").over(Window.partitionBy())
    )
    out = []
    for frac in fractions:
        prefix = ranked.filter(F.col("__rn") <= frac * F.col("__n")).drop(
            "__rn", "__n"
        )
        out.append((frac, scorer(prefix)))
    return out


def permutation_importance(
    df: DataFrame,
    feature_cols: list[str],
    scorer: Scorer,
    seed: int = 42,
) -> dict[str, float]:
    """M15 analog: importance(c) = score with column c shuffled − base
    score.  The shuffle is a rank-based value permutation — distributed,
    deterministic under the seed (content-hash ordering)."""
    base = scorer(df)
    out: dict[str, float] = {}
    keyed = df.withColumn(
        "__rid", F.row_number().over(Window.orderBy(F.monotonically_increasing_id()))
    )
    n = keyed.count()
    for c in feature_cols:
        # permute by joining values back on a hashed rank
        perm = (
            keyed.select(
                F.col(c).alias("__v"),
                F.row_number()
                .over(Window.orderBy(F.md5(F.concat_ws("|", F.lit(seed), F.lit(c), "__rid"))))
                .alias("__prid"),
            )
        )
        shuffled = (
            keyed.drop(c)
            .join(perm, F.col("__rid") == F.col("__prid"))
            .withColumnRenamed("__v", c)
            .drop("__prid")
        )
        out[c] = scorer(shuffled.drop("__rid")) - base
    return out
