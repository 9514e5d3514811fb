"""SparkSession factory tuned for this engine.

Local testing runs ``local[N]`` in a single JVM; production target is a
multi-executor cluster at ~100 TB. Every config below is also correct at
cluster scale (AQE, adaptive coalesce/skew-join, Arrow for the Pandas-UDF
kernels, UTC timezone for oracle comparability).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_SHUFFLE_PARTITIONS = os.environ.get("SPARK_GRAFT_CPUS", "32")


def get_spark(app_name: str = "variantcalling_spark", master: str | None = None) -> SparkSession:
    """Build (or fetch) the tuned SparkSession.

    The settings matter at both test scale and 100 TB scale:

    - AQE on: runtime shuffle-partition coalescing, skew-join splitting,
      and dynamic join-strategy switching replace hand-tuned plans.
    - ``shuffle.partitions`` seeds the pre-AQE plan; AQE coalesces down.
    - Arrow enabled: the ``applyInPandas`` kernels (gVCF merge, overlap
      buffer) and any Pandas UDF move data in columnar batches.
    - UTC session timezone: timestamps compare bit-identical against the
      DuckDB oracle (DuckDB timestamps are UTC-naive).
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    builder = (
        SparkSession.builder.appName(app_name)
        .master(master or f"local[{cpus}]")
        .config("spark.sql.shuffle.partitions", DEFAULT_SHUFFLE_PARTITIONS)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        # let AQE re-plan (coalesce/broadcast) below persisted frames —
        # otherwise a .persist() pins its subtree to the static plan
        .config("spark.sql.optimizer.canChangeCachedPlanOutputPartitioning", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.parquet.filterPushdown", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
    )
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
