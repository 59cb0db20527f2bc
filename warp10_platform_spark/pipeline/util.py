"""Shared pipeline plumbing."""

from __future__ import annotations

from pyspark.sql import DataFrame


def spread(df: DataFrame) -> DataFrame:
    """Fan per-row heavy work (shingling, hashing, dot products) across
    the cluster when the scan arrived as too few splits — a small corpus
    lands in ONE parquet split and serializes the whole map side onto
    one core (measured: the entire minhash/simhash pipeline on 1 of 32
    cores at sf0.1). The repartition shuffles only the raw rows (cheap
    at small scale); at 100 TB the scan already yields thousands of
    splits and this is a no-op."""
    sc = df.sparkSession.sparkContext
    target = sc.defaultParallelism
    if df.rdd.getNumPartitions() < max(2, target // 2):
        return df.repartition(target)
    return df
