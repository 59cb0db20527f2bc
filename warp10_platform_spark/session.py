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
        # r9 (measured, guide §2.5): AQE's coalesce floor defaults to 1 MB
        # per partition, which collapses byte-tiny but CPU-dense stages —
        # the dedup guards' cached member frames and the in-cell HOF-cosine
        # join shuffle ~1 MB of arrays that cost seconds of interpreted
        # HOF work — down to 1-2 tasks, serializing them on one core
        # (emb_semantic_dedup median 19.5 s → 3.4 s at sf0.1 when the
        # floor drops to 64k; the 1 MB control reproduced the slow regime,
        # so it is causal, not box drift). Scale-safe: with parallelismFirst
        # the coalesce target is max(stage_bytes/parallelism, this floor),
        # so the floor only binds when a stage's bytes are tiny — at real
        # scale bytes/parallelism dominates and behavior is unchanged.
        .config(
            "spark.sql.adaptive.coalescePartitions.minPartitionSize",
            os.environ.get("SPARK_GRAFT_MIN_PARTITION_SIZE", "64k"),
        )
        # r9 (measured, guide §1.2 order-of-operations step 3): Spark's
        # whole-stage-codegen class cache holds 100 entries by default;
        # this engine's query surface compiles far more distinct codegen
        # units (the 30-query bench alone cycles the cache every pass),
        # so steady-state runs paid continuous janino recompilation on
        # the driver. 2000 entries: full-tier steady pass 31 s → 18.5 s
        # (alternated A/B, two pairs each way; periodic-GC alone was
        # noise). Not a core-count tune: any long-running deployment
        # serving this operator surface cycles >100 generated classes.
        # Cost is metaspace for the cached classes — bounded by the knob.
        .config(
            "spark.sql.codegen.cache.maxEntries",
            os.environ.get("SPARK_GRAFT_CODEGEN_CACHE", "2000"),
        )
        # r9: PySpark's DataFrame-debugging call-site capture (default on)
        # adds ~3 py4j round trips + a Python stack walk to EVERY
        # DataFrame API call, purely to enrich error messages; off, plan
        # construction (the bench's "build" phase) drops ~15-20 %
        # (doc_minhash_lsh build 1.33 s → 1.05 s measured). Error
        # behavior is unchanged apart from the call-site annotation.
        .config("spark.python.sql.dataFrameDebugging.enabled", "false")
    )
    # Post-shuffle partition sizing (r8 verdict #6 asked for byte-derived
    # partitions; the r9 measurement REJECTED it as the default): byte-
    # targeted AQE coalescing (parallelismFirst=false, 16m advisory) cost
    # +60% exec at sf0.1 because this engine's hottest shuffles are
    # CPU-dense but BYTE-tiny — minhash/simhash signature windows and the
    # HOF-cosine cell join collapsed to 1-2 serial tasks, and an explicit
    # repartition pin for the latter disabled AQE skew-splitting of the
    # degenerate one-cell join (2.6s → 17.8s). Parallelism-first with
    # partitions = cores is the right default for mixed compute density;
    # SPARK_GRAFT_PARTITION_MODE exists for controlled experiments:
    # "cores" (default), an integer (pin that count), or "bytes" (the
    # rejected advisory configuration, kept for A/B probes).
    mode = os.environ.get("SPARK_GRAFT_PARTITION_MODE", "cores")
    if shuffle_partitions is not None:
        # explicit caller choice (tests pin 8)
        builder = builder.config("spark.sql.shuffle.partitions", str(shuffle_partitions))
    elif mode == "bytes":
        builder = (
            builder.config("spark.sql.shuffle.partitions", str(max(4 * cpus_i, 64)))
            .config("spark.sql.adaptive.coalescePartitions.parallelismFirst", "false")
            .config(
                "spark.sql.adaptive.advisoryPartitionSizeInBytes",
                os.environ.get("SPARK_GRAFT_ADVISORY_PARTITION_BYTES", "16m"),
            )
            .config("spark.sql.adaptive.coalescePartitions.minPartitionSize", "1m")
        )
    elif mode.isdigit():
        builder = builder.config("spark.sql.shuffle.partitions", mode)
    else:
        builder = builder.config("spark.sql.shuffle.partitions", str(cpus_i))
    return builder.getOrCreate()
