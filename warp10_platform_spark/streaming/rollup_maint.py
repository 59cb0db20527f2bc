"""Continuously-maintained rollups: the streaming twin of
sources/rollup.py.

Each micro-batch contributes its own partial aggregates (count /
DECIMAL sum / min / max / first / last per series-hour) which are
written to the rollup location under a deterministic ``batch=<id>``
partition with dynamic-partition OVERWRITE — never merged in place, so
the write path has no read-modify-write race AND is idempotent under
micro-batch replay: foreachBatch gives at-least-once semantics, and a
replayed batch id overwrites exactly its own partition instead of
appending a duplicate set of partials. Readers regroup on read
(`read_maintained_rollup`), which is exact because partials merge
associatively; `compact_rollup` rewrites the accumulated partials as
one row per key when the partition pile grows.

This is the plain-parquet rendition of what a Delta/Iceberg MERGE would
do, chosen deliberately: idempotent per-batch partitions + regroup-on-
read need no table-format dependency and the compaction cost is bounded
by the ROLLUP size (one row per series-span per batch), not the raw
history. At 100 TB the maintenance cost per batch is O(batch), and
dashboard reads stay O(series-hours in range).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from warp10_platform_spark.sources.rollup import HOUR_US, rollup_merge, rollup_partials

# Reserved batch id for compaction output; real foreachBatch ids are >= 0.
_COMPACTED = -1


def _write_batch(df: DataFrame, path: str, batch_id: int) -> None:
    """Idempotent per-batch write: the batch's rows land in
    ``path/batch=<id>`` via dynamic-partition overwrite, so a replay of
    the same micro-batch (at-least-once foreachBatch) replaces its own
    partition rather than double-counting."""
    (
        df.withColumn("batch", F.lit(int(batch_id)))
        .write.partitionBy("batch")
        .option("partitionOverwriteMode", "dynamic")
        .mode("overwrite")
        .parquet(path)
    )


def maintain_rollup(
    points_stream: DataFrame,
    path: str,
    checkpoint: str,
    span_us: int = HOUR_US,
    trigger_available_now: bool = True,
):
    """Start the maintenance query: per micro-batch, compute the batch's
    rollup partials and write them idempotently to `path`. Returns the
    streaming query handle (caller stops it / processAllAvailable)."""

    def _batch(batch_df: DataFrame, batch_id: int) -> None:
        _write_batch(rollup_partials(batch_df, span_us), path, batch_id)

    writer = points_stream.writeStream.foreachBatch(_batch).option(
        "checkpointLocation", checkpoint
    )
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def read_maintained_rollup(spark: SparkSession, path: str) -> DataFrame:
    """The queryable rollup: per-batch partial partitions regrouped into
    one row per (series, rb) — exact by associativity, feedable straight
    into sources.rollup.rebucket."""
    return rollup_merge(spark.read.parquet(path).drop("batch"))


def compact_rollup(spark: SparkSession, path: str) -> None:
    """Rewrite the per-batch partitions as fully-merged partials (one
    row per key, under the reserved ``batch=-1`` partition). Readers
    before/after see identical results; this just caps the
    regroup-on-read input size. Run only while the maintenance query is
    stopped — the streaming checkpoint keeps post-compaction batch ids
    fresh, so compaction can never collide with a replayed id."""
    merged = read_maintained_rollup(spark, path).localCheckpoint()
    (
        merged.withColumn("batch", F.lit(_COMPACTED))
        .write.partitionBy("batch")
        .mode("overwrite")
        .parquet(path)
    )


# ---- histogram tier: identical maintenance shape -------------------------


def maintain_histogram(
    points_stream: DataFrame,
    path: str,
    checkpoint: str,
    span_us: int = HOUR_US,
    lo: float = 0.0,
    hi: float = 512.0,
    n_bins: int = 64,
):
    """Continuously-maintained histogram partials (the approximate-
    percentile tier): per micro-batch, bin the batch's points and write
    the sparse (series, rb, bin, cnt) rows idempotently under
    ``batch=<id>``. Same partition/regroup-on-read algebra as the
    numeric partials — histogram counts merge by groupBy-sum, so readers
    are exact regardless of how ingestion was batched or replayed."""
    from warp10_platform_spark.sources.rollup import histogram_partials

    def _batch(batch_df: DataFrame, batch_id: int) -> None:
        _write_batch(histogram_partials(batch_df, span_us, lo, hi, n_bins), path, batch_id)

    writer = points_stream.writeStream.foreachBatch(_batch).option(
        "checkpointLocation", checkpoint
    )
    return writer.trigger(availableNow=True).start()


def read_maintained_histogram(spark: SparkSession, path: str) -> DataFrame:
    """Per-batch histogram partitions regrouped to one row per
    (series, rb, bin) — feedable straight into histogram_rebucket /
    histogram_percentile."""
    from warp10_platform_spark.operators.bucketize import SERIES_KEYS

    return spark.read.parquet(path).groupBy(*SERIES_KEYS, "rb", "bin").agg(
        F.sum("cnt").alias("cnt")
    )


# ---- directory tier: same algebra, series metadata ------------------------


def maintain_directory(points_stream: DataFrame, path: str, checkpoint: str):
    """Continuously-maintained directory (sources/directory.py promises
    this at 100 TB): per micro-batch, write one row per touched series
    with its batch-local extent partials (min ts / max ts / count) under
    ``batch=<id>``. Extents and counts merge associatively, so
    regroup-on-read yields exactly the directory a full points rebuild
    would — while FIND / selector resolution keep reading ~1e6 series
    rows, never the points."""
    from warp10_platform_spark.sources.directory import build_directory

    def _batch(batch_df: DataFrame, batch_id: int) -> None:
        _write_batch(build_directory(batch_df).drop("labels"), path, batch_id)

    writer = points_stream.writeStream.foreachBatch(_batch).option(
        "checkpointLocation", checkpoint
    )
    return writer.trigger(availableNow=True).start()


def read_maintained_directory(spark: SparkSession, path: str) -> DataFrame:
    """Per-batch directory partitions regrouped to one row per series —
    same schema and consumers as sources/directory.build_directory."""
    from warp10_platform_spark.core.schema import labels_from_key

    return (
        spark.read.parquet(path)
        .groupBy("gts_id", "class", "labels_key")
        .agg(
            F.min("first_ts").alias("first_ts"),
            F.max("last_ts").alias("last_ts"),
            F.sum("n_points").alias("n_points"),
        )
        .withColumn("labels", labels_from_key())
        .select("gts_id", "class", "labels_key", "labels", "first_ts", "last_ts", "n_points")
    )
