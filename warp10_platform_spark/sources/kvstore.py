"""KVSTORE / KVLOAD — the key-value side store (script/functions/
KVSTORE.java): small mutable lookup state scripts consult mid-query.

Spark shape: a tiny DataFrame (or plain dict) persisted as its own
parquet; reads broadcast it, so lookups are map-side with zero shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def kvstore(spark: SparkSession, path: str, kv: dict[str, str]) -> None:
    """KVSTORE: persist key/value pairs (overwrite = the reference's
    last-write-wins store semantics at whole-store granularity)."""
    spark.createDataFrame(list(kv.items()), "key string, value string").coalesce(1).write.mode(
        "overwrite"
    ).parquet(path)


def kvload(spark: SparkSession, path: str) -> DataFrame:
    """KVLOAD: the store as a broadcastable DataFrame."""
    return spark.read.parquet(path)


def kv_lookup(df: DataFrame, kv: DataFrame, on: str, key_col: str = "key", value_col: str = "value",
              out_col: str = "kv_value") -> DataFrame:
    """Enrich a frame with KV values: broadcast hash join — map-side,
    no shuffle of the big side."""
    small = F.broadcast(kv.select(F.col(key_col).alias(on), F.col(value_col).alias(out_col)))
    return df.join(small, on=on, how="left")
