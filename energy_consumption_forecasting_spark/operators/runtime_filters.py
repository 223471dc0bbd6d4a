"""Runtime bloom-filter join reduction — big-fact ⋈ filtered-dim.

When a selective predicate sits on the dimension side of a shuffle
join, Catalyst can build a bloom filter over the surviving dim keys and
inject ``might_contain(...)`` into the FACT side *before* its shuffle —
at 100 TB this is the difference between shuffling the whole fact table
and shuffling the ~matching fraction.  Broadcast joins don't need it
(the dim rows ship anyway); it pays off exactly when both sides are too
big to broadcast.

This module pins the confs that make the injection deterministic for
tests/plan audits.  In production the defaults
(``runtime.bloomFilter.enabled=true`` since Spark 3.5, 10 MB/10 GB size
thresholds) trigger it on genuinely large plans without any of this.
"""

from __future__ import annotations

from contextlib import contextmanager

from pyspark.sql import SparkSession

_CONFS = {
    "spark.sql.optimizer.runtime.bloomFilter.enabled": "true",
    # creation side must be SMALLER than this threshold; raise it so a
    # small test dim qualifies.
    "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold": "100MB",
    # application side must be LARGER than this scan size; zero it so a
    # small test fact qualifies.
    "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold": "0",
    # force a shuffle join — broadcast joins ship the dim anyway.
    "spark.sql.autoBroadcastJoinThreshold": "-1",
}


@contextmanager
def forced_runtime_bloom(spark: SparkSession):
    """Temporarily force bloom-filter injection on small (test) data."""
    old = {}
    for k, v in _CONFS.items():
        try:
            old[k] = spark.conf.get(k)
        except Exception:
            old[k] = None
        spark.conf.set(k, v)
    try:
        yield
    finally:
        for k, v in old.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)
