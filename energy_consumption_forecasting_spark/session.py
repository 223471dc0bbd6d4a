"""SparkSession factory with scale-aware defaults.

Local test runs use ``local[$SPARK_GRAFT_CPUS]``; on a real cluster the
same configs apply (AQE, Arrow, sensible shuffle partitioning) — only
``master`` and memory sizing change.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "ecf-spark",
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) a SparkSession tuned for this engine.

    * AQE on: runtime partition coalescing + skew-join splitting, which is
      what makes a static ``spark.sql.shuffle.partitions`` safe at any SF.
    * Arrow on: pandas UDF / toPandas interop is batched, not per-row.
    * UTC session timezone: timestamp→date semantics must not depend on
      the host machine's zone.
    """
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    if shuffle_partitions is None:
        shuffle_partitions = max(cpus, 32)
    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
    )
    if extra_conf:
        for k, v in extra_conf.items():
            builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark


def ensure_utc(spark: SparkSession) -> SparkSession:
    """Force UTC timestamp semantics on an externally supplied session.

    The driver hands our ``queries()`` callables an arbitrary session;
    date-truncation results must not depend on its host timezone.
    """
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    return spark
