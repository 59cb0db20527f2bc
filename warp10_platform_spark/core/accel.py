"""Accelerated-store hints — ACCEL.* as Spark persistence levels.

The reference's accelerator is a dual-write RAM+persistent store with
query-time cache/persist hints (standalone/StandaloneAcceleratedStoreClient.java,
AcceleratorConfig.java, functions/ACCELCACHE.java / ACCELNOCACHE /
ACCELPERSIST / ACCELNOPERSIST). In Spark the same contract is a
persistence-level decision on the points DataFrame: the "cache" tier is
executor memory, the "persistent" tier is the parquet/Delta lake itself,
and the hints choose whether a query's scan goes through the cached tier.

At 100 TB you never cache the whole lake — you cache the FETCH-selected
slice (post-pushdown), which is exactly what these helpers wrap.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.storagelevel import StorageLevel


def accel_cache(df: DataFrame) -> DataFrame:
    """ACCELCACHE (functions/ACCELCACHE.java): route subsequent reads of
    this (already filtered) frame through the in-memory tier."""
    return df.persist(StorageLevel.MEMORY_AND_DISK_DESER)


def accel_nocache(df: DataFrame) -> DataFrame:
    """ACCELNOCACHE: drop the in-memory tier for this frame; reads fall
    back to the persistent store (parquet)."""
    return df.unpersist()


def accel_persist(df: DataFrame) -> DataFrame:
    """ACCELPERSIST: serialized memory+disk tier — survives memory
    pressure, the closest analog of the reference's dual-write mode."""
    return df.persist(StorageLevel.MEMORY_AND_DISK)


def accel_nopersist(df: DataFrame) -> DataFrame:
    """ACCELNOPERSIST: forget all accelerator tiers for this frame."""
    return df.unpersist(blocking=False)
