"""Small-file compaction (sources/maintenance.py): data-preserving,
file-count-reducing, locality-sorting, atomic."""

import os

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from warp10_platform_spark.sources.maintenance import (
    compact_partitioned,
    parquet_file_count,
)
from warp10_platform_spark.sources.tables import events_points


@pytest.fixture()
def messy_store(spark, sf_dir, tmp_path):
    """A deliberately fragmented store: the points table written in 24
    hash slices per class partition — the shape a streaming ingest
    leaves behind after a day of micro-batches."""
    path = str(tmp_path / "points_messy")
    (
        events_points(spark, sf_dir)
        .repartition(24)
        .write.partitionBy("class")
        .parquet(path)
    )
    return path


def _fingerprint(spark, path):
    df = spark.read.parquet(path)
    return df.agg(
        F.count("*").alias("n"),
        F.sum(F.xxhash64("class", "labels_key", "ts").cast("decimal(38,0)")).alias("h"),
        F.sum(F.col("v_double").cast("decimal(28,10)")).alias("s"),
    ).collect()[0]


def test_compaction_preserves_data_and_reduces_files(spark, messy_store):
    before_files = parquet_file_count(messy_store)
    before = _fingerprint(spark, messy_store)

    live = compact_partitioned(
        spark, messy_store, partition_cols=["class"], sort_cols=["gts_id", "ts"]
    )
    assert live == messy_store  # swapped in place
    assert not os.path.exists(messy_store + ".pre-compact")

    after_files = parquet_file_count(messy_store)
    after = _fingerprint(spark, messy_store)
    assert after == before
    # tiny partitions → exactly one file per class dir
    n_classes = spark.read.parquet(messy_store).select("class").distinct().count()
    assert after_files == n_classes
    assert after_files < before_files


def test_compaction_sorts_within_files(spark, messy_store):
    compact_partitioned(
        spark, messy_store, partition_cols=["class"], sort_cols=["gts_id", "ts"]
    )
    # within every output file, (gts_id, ts) is nondecreasing — the
    # locality contract that makes parquet min/max stats tight
    df = spark.read.parquet(messy_store).withColumn("_file", F.input_file_name())
    w_ok = (
        df.select(
            "_file",
            "gts_id",
            "ts",
            F.lag(F.struct("gts_id", "ts"))
            .over(Window.partitionBy("_file").orderBy(F.monotonically_increasing_id()))
            .alias("prev"),
        )
    )
    bad = w_ok.where(
        F.col("prev").isNotNull()
        & (
            (F.col("prev.gts_id") > F.col("gts_id"))
            | ((F.col("prev.gts_id") == F.col("gts_id")) & (F.col("prev.ts") > F.col("ts")))
        )
    ).count()
    assert bad == 0


def test_compaction_splits_oversized_partitions(spark, messy_store):
    # force a micro target so every class dir must split into >1 file
    compact_partitioned(
        spark,
        messy_store,
        partition_cols=["class"],
        sort_cols=["gts_id", "ts"],
        target_file_bytes=2 << 10,
    )
    n_classes = spark.read.parquet(messy_store).select("class").distinct().count()
    assert parquet_file_count(messy_store) > n_classes


def test_compaction_dry_run_leaves_source(spark, messy_store):
    before = parquet_file_count(messy_store)
    out = compact_partitioned(
        spark, messy_store, partition_cols=["class"], swap=False
    )
    assert out != messy_store and os.path.exists(out)
    assert parquet_file_count(messy_store) == before
