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
    cpus_i = int(cpus) if cpus.isdigit() else 32
    builder = (
        SparkSession.builder.appName(app_name)
        .master(f"local[{cpus}]")
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
    if shuffle_partitions is not None:
        # explicit caller choice (tests pin 8) — pre-r9 behavior
        builder = builder.config("spark.sql.shuffle.partitions", str(shuffle_partitions))
    else:
        # r9 (r8 verdict #6): size post-shuffle partitions by BYTES, not
        # box width. BENCH_CORES_r8 proved partitions=cores over-splits —
        # 32 cores ran sf1 SLOWER than 16 (uniform per-task overhead,
        # ~190k rows/partition below the data-per-core floor). Start wide
        # (4x cores — the pre-coalesce map-side fan-out; AQE merges, never
        # splits) and let AQE coalesce CONTIGUOUS partitions to the
        # advisory byte target instead of stopping at one-per-core
        # (parallelismFirst=false). On a 1000-executor cluster the same
        # three knobs hold: partition count tracks shuffled bytes, so a
        # 100 TB shuffle still fans out to ~tens of thousands of tasks
        # while a small broadcast-side agg collapses to a handful.
        builder = (
            builder.config("spark.sql.shuffle.partitions", str(max(4 * cpus_i, 64)))
            .config("spark.sql.adaptive.coalescePartitions.parallelismFirst", "false")
            .config(
                "spark.sql.adaptive.advisoryPartitionSizeInBytes",
                os.environ.get("SPARK_GRAFT_ADVISORY_PARTITION_BYTES", "16m"),
            )
            .config("spark.sql.adaptive.coalescePartitions.minPartitionSize", "1m")
        )
    return builder.getOrCreate()
