"""Column-pruned, group-batched grouped-map apply.

Two Spark facts shape every per-series applyInPandas in the engine:

- Catalyst does not prune columns through FlatMapGroupsInPandas: a
  grouped-map pandas UDF receives EVERY column of its input frame, so
  without an explicit projection the labels/attribute maps and unused
  value columns are shuffled and Arrow-encoded for nothing (measured
  2-3x of the Arrow bytes on canonical_points).

- applyInPandas pays a fixed per-group cost (Arrow record batch,
  pandas assembly, python dispatch) of single-digit milliseconds. With
  one group per SERIES that overhead dominates whenever series are
  small and numerous — the common shape of a metrics lake (measured:
  STL+ESD over 15k daily series spent 87 s at sf1, almost all of it
  per-group overhead). So the shuffle key is a HASH CHUNK of the
  series key, the worker splits the chunk back into series, and the
  caller's per-series fn runs unchanged on each. Group memory is
  sum-of-series-in-chunk instead of one series; the chunk count scales
  with the session's shuffle parallelism so the per-group payload
  shrinks as the cluster grows.
"""

from __future__ import annotations

from typing import Iterable

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# Chunks = shuffle.partitions * _CHUNKS_PER_PARTITION (min _MIN_CHUNKS):
# enough groups to keep every core busy through stragglers, few enough
# that tiny-series overhead is amortized.
_CHUNKS_PER_PARTITION = 8
_MIN_CHUNKS = 128


def per_series_apply(
    df: DataFrame,
    run,
    schema,
    cols: Iterable[str],
    key: str = "gts_id",
) -> DataFrame:
    """groupBy(hash-chunk of key).applyInPandas over ONLY `cols`,
    calling run() once per distinct key value (the per-series
    contract), with results concatenated per chunk.

    cols = the columns run() actually reads; the key is always
    included. Columns absent from df are skipped (lat/lon/elev are
    optional on several frames). Output must not depend on the order
    run() is invoked across series — true for every per-series
    operator (each emits rows tagged by its own series).
    """
    import pandas as pd

    need: list[str] = []
    for c in (key, *cols):
        if c not in need and c in df.columns:
            need.append(c)

    try:
        parts = int(df.sparkSession.conf.get("spark.sql.shuffle.partitions"))
    except Exception:  # noqa: BLE001 - conf value may be "auto" under AQE
        parts = 16
    n_chunks = max(_MIN_CHUNKS, parts * _CHUNKS_PER_PARTITION)

    def batched(pdf: "pd.DataFrame") -> "pd.DataFrame":
        outs = [run(g) for _, g in pdf.groupby(key, sort=False)]
        return pd.concat(outs, ignore_index=True) if len(outs) > 1 else outs[0]

    chunked = df.select(*need).withColumn("_schunk", F.pmod(F.xxhash64(key), F.lit(n_chunks)))
    return chunked.groupBy("_schunk").applyInPandas(batched, schema=schema)
