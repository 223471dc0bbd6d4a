"""ML / analytics operators (SURVEY.md §2.7).

MLlib-first: scalers, PCA, KMeans, silhouette, GBT run JVM-side.
Per-series model fitting (AR forecasting, seasonal decomposition, DTW,
wavelets) runs as Arrow-batched ``applyInPandas`` grouped maps — the
one place Python is allowed, because the per-group math has no
relational form.  Groups are small series (bounded by the calendar), so
group skew is bounded by construction.

statsmodels / sklearn / torch / pywt are optional: every consumer
degrades to a numpy implementation of the published algorithm when the
library is absent (import-gated, never a hard dependency).
"""
