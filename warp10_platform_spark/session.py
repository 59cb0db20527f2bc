"""SparkSession factory tuned for this engine.

Local testing uses local[N]; the same configs are what we would ship on
a real cluster (AQE on, skew-join handling on, UTC, Arrow enabled).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(app_name: str = "warp10-platform-spark", shuffle_partitions: int | None = None) -> SparkSession:
    """Build (or reuse) a SparkSession with engine defaults.

    - AQE + skew-join: runtime re-planning, the scale path for skewed
      label/class distributions (SURVEY §4).
    - UTC session timezone: required for oracle comparisons and sane
      time-series semantics.
    - Arrow: every pandas-UDF operator (FILL spline, STL, DTW...) rides
      Arrow batches.
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    if shuffle_partitions is None:
        shuffle_partitions = int(cpus) if cpus.isdigit() else 32
    builder = (
        SparkSession.builder.appName(app_name)
        .master(f"local[{cpus}]")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # TIMESTAMP(NANOS) parquet columns (the events table) surface as
        # LONG nanoseconds instead of erroring — we keep a LONG time axis
        # anyway (reference's configurable time unit, Constants.java:520).
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "8g"))
        .config("spark.ui.enabled", "false")
    )
    return builder.getOrCreate()
