"""Structured Streaming ingest + continuous views — SURVEY §2.11.

The reference's ingestion path (standalone/StandaloneIngressHandler.java:
HTTP POST of GTS text lines → parse → commit to storage; Plasma/SUBSCRIBE
for push subscriptions) maps onto Structured Streaming:

    file/socket/kafka text stream ──readStream──▶ parse_gts_lines
        ├─ writeStream.format("parquet") append   ≙ Ingress→store
        ├─ windowed aggregation + watermark       ≙ runner/rollup jobs
        └─ memory/console/foreachBatch sinks      ≙ Plasma subscriptions

parse_gts_lines is pure Column expressions, so the exact same projection
that batch-ingests also streams — one parser, two execution modes.

At scale: ingest parallelism = source partitioning (Kafka partitions /
file splits); the stateful window aggregations shuffle on (gts_id,
window) with state kept in the state store, bounded by the watermark.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from warp10_platform_spark.sources.gts_text import parse_gts_lines


def read_gts_text_stream(spark: SparkSession, path: str, max_files_per_trigger: int | None = None) -> DataFrame:
    """Streaming ingest of GTS text files dropped into `path` — the
    engine's StandaloneIngressHandler analog. Returns the canonical
    (unbounded) points DataFrame."""
    reader = spark.readStream.format("text")
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    return parse_gts_lines(reader.load(path))


def streaming_bucketize(
    points: DataFrame,
    span_us: int,
    watermark_delay: str = "1 minute",
    value_col: str = "v_double",
) -> DataFrame:
    """Continuous BUCKETIZE: tumbling event-time windows of `span_us` per
    series with a watermark for late data — the streaming twin of
    operators/bucketize.py (grid anchored at the epoch rather than
    lastbucket, since an unbounded stream has no last tick).

    Emits (class, labels_key, bucket_end_us, count/sum/min/max/mean).
    """
    with_event_time = points.withColumn("event_time", F.timestamp_micros(F.col("ts")))
    win = F.window("event_time", f"{span_us} microseconds")
    agg = (
        with_event_time.withWatermark("event_time", watermark_delay)
        .groupBy(F.col("class"), F.col("labels_key"), win.alias("w"))
        .agg(
            F.count(value_col).alias("v_count"),
            F.sum(value_col).alias("v_sum"),
            F.min(value_col).alias("v_min"),
            F.max(value_col).alias("v_max"),
            F.avg(value_col).alias("v_mean"),
        )
    )
    return agg.select(
        "class",
        "labels_key",
        F.unix_micros(F.col("w.end")).alias("bucket_end"),
        "v_count",
        "v_sum",
        "v_min",
        "v_max",
        "v_mean",
    )


def streaming_last(points: DataFrame, watermark_delay: str = "1 minute", value_col: str = "v_double") -> DataFrame:
    """Continuous last-value view per series (the reference's
    'last tick' directory/plasma use case): max_by over event time in
    update mode."""
    with_event_time = points.withColumn("event_time", F.timestamp_micros(F.col("ts")))
    return (
        with_event_time.withWatermark("event_time", watermark_delay)
        .groupBy("class", "labels_key")
        .agg(F.max_by(value_col, "ts").alias("v_last"), F.max("ts").alias("last_ts"))
    )
