"""MACROMAPPER / MACROREDUCER / MACROBUCKETIZER — the custom-UDF surface.

The reference lets users register a WarpScript macro as a mapper, reducer
or bucketizer (script/functions/MACROMAPPER.java:39-41): the macro is
called per window/bucket/tick with the aggregator argument array
`[tick, names, labels, ticks[], locations[], elevations[], values[]]`
(aggregator/Sum.java:40-47) and returns `[timestamp, location,
elevation, value]`.

The Spark-native equivalent is a *Python* callable with the same frame
contract, executed through `applyInPandas` (Arrow batches, one shuffle on
the series key — the same shuffle the built-in operators pay). This is
the slow path by design: anything expressible as a Column expression
should use operators/mapper.py; this surface exists for the aggregations
the engine didn't hand-code, which is the reference's whole
extensibility story.

Scale notes: grouping key is gts_id (mapper), (gts_id, bucket) when
`split_buckets` (bucketizer), or (eq-labels, tick) (reducer) — each group
must fit one task, the same in-RAM-series assumption the reference makes.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from warp10_platform_spark.operators.bucketize import BucketSpec, bucket_end_col, derive_spec


@dataclass
class Frame:
    """The aggregator argument array, pythonized (Sum.java:40-47).

    tick       — the tick the window is applied at (bucket end for
                 bucketizers, the common tick for reducers).
    ticks      — np.ndarray[int64] of the frame's timestamps.
    values     — np.ndarray of the frame's values (float64 here).
    locations  — (lat, lon) float64 arrays (NaN = no location).
    elevations — int64/float64 array (NaN = no elevation).
    """

    tick: int
    ticks: np.ndarray
    values: np.ndarray
    locations: tuple[np.ndarray, np.ndarray] | None = None
    elevations: np.ndarray | None = None


MacroFn = Callable[[Frame], float]

# Buckets (resp. distinct ticks) batched into one Arrow group — amortizes
# the per-group Arrow/pandas overhead while keeping group size bounded.
_CHUNK_BUCKETS = 256
_MIN_TICK_CHUNKS = 64


def _tick_chunks(df: DataFrame) -> int:
    """Tick-chunk count for macro_reducer, derived from the session's
    shuffle parallelism (like core/apply.per_series_apply) so total
    Arrow groups scale with the cluster instead of capping at a fixed
    64 — per-group memory stays ~class_size/chunks as data grows."""
    try:
        parts = int(df.sparkSession.conf.get("spark.sql.shuffle.partitions"))
    except Exception:
        parts = 32
    return max(_MIN_TICK_CHUNKS, parts * 4)

_OUT_SCHEMA = StructType(
    [
        StructField("class", StringType()),
        StructField("labels_key", StringType()),
        StructField("ts", LongType()),
        StructField("v_mapped", DoubleType()),
    ]
)


def macro_mapper(
    df: DataFrame,
    fn: MacroFn,
    pre: int = 0,
    post: int = 0,
    value_col: str = "v_double",
    min_points: int | None = None,
) -> DataFrame:
    """MAP with a custom Python mapper over each sliding frame.

    pre/post ≥ 0 count ticks, < 0 count time-µs (both must share sign,
    like operators/mapper.frame_window). Runs applyInPandas per series:
    sort by ts, slide the frame, call fn(Frame) per tick.

    min_points implements STRICTMAPPER (mapper/STRICTMAPPER.java): frames
    with fewer points (range edges) emit NaN instead of calling fn.
    """
    if (pre < 0) != (post < 0) and (pre != 0 and post != 0):
        raise ValueError(f"mixed tick/time frame not supported: pre={pre}, post={post}")
    time_mode = pre < 0 or post < 0

    cols = ["class", "labels_key", "ts", value_col]
    cols += [c for c in ("lat", "lon", "elev") if c in df.columns]

    def run(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("ts").reset_index(drop=True)
        ts = pdf["ts"].to_numpy(np.int64)
        vals = pdf[value_col].to_numpy(np.float64)
        lat = pdf["lat"].to_numpy(np.float64) if "lat" in pdf else None
        lon = pdf["lon"].to_numpy(np.float64) if "lon" in pdf else None
        elev = pdf["elev"].to_numpy(np.float64) if "elev" in pdf else None
        n = len(pdf)
        out = np.empty(n, dtype=np.float64)
        for i in range(n):
            if time_mode:
                lo = int(np.searchsorted(ts, ts[i] + pre, side="left"))
                hi = int(np.searchsorted(ts, ts[i] - post, side="right"))
            else:
                lo, hi = max(0, i - pre), min(n, i + post + 1)
            if min_points is not None and hi - lo < min_points:
                out[i] = np.nan
                continue
            fr = Frame(
                tick=int(ts[i]),
                ticks=ts[lo:hi],
                values=vals[lo:hi],
                locations=(lat[lo:hi], lon[lo:hi]) if lat is not None else None,
                elevations=elev[lo:hi] if elev is not None else None,
            )
            out[i] = fn(fr)
        return pd.DataFrame(
            {
                "class": pdf["class"],
                "labels_key": pdf["labels_key"],
                "ts": ts,
                "v_mapped": out,
            }
        )

    from warp10_platform_spark.core.apply import per_series_apply

    return per_series_apply(df, run, _OUT_SCHEMA, cols)


def macro_bucketizer(
    df: DataFrame,
    fn: MacroFn,
    span: int,
    lastbucket: int | None = None,
    bucketcount: int | None = None,
    value_col: str = "v_double",
) -> tuple[DataFrame, BucketSpec]:
    """BUCKETIZE with a custom Python bucketizer.

    The bucket grid is computed JVM-side (same integer-DIV math as the
    built-in bucketize), then each (series, bucket) group is handed to
    fn(Frame) with tick = bucket end. Shuffle key carries the bucket so
    group size is one bucket's points, not one series' history — the
    scale-safe variant of the per-series mapper."""
    spec = derive_spec(df, span, lastbucket, bucketcount)
    in_grid = df.where(
        (F.col("ts") <= F.lit(spec.lastbucket))
        & (F.col("ts") > F.lit(spec.lastbucket - spec.bucketspan * spec.bucketcount))
    )
    bucketed = in_grid.select(
        "gts_id", "class", "labels_key", "ts", value_col
    ).withColumn("bucket_end", bucket_end_col(spec.lastbucket, spec.bucketspan))
    # Shuffle key carries a CHUNK of consecutive buckets, not a single
    # bucket: one Arrow group per (series, _CHUNK_BUCKETS buckets) keeps
    # the per-group python/Arrow overhead amortized ~256x while still
    # bounding group size to a constant number of buckets of ONE series
    # (the scale-safe property the per-bucket key had; a (series, bucket)
    # key at sf0.01 already meant tens of thousands of 1-30 row groups
    # and dominated wall-clock).
    bucketed = bucketed.withColumn(
        "_chunk",
        F.floor((F.lit(spec.lastbucket) - F.col("bucket_end")) / F.lit(spec.bucketspan * _CHUNK_BUCKETS)),
    )

    def run(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(["bucket_end", "ts"], kind="mergesort")
        be = pdf["bucket_end"].to_numpy(np.int64)
        ts = pdf["ts"].to_numpy(np.int64)
        vals = pdf[value_col].to_numpy(np.float64)
        starts = np.flatnonzero(np.r_[True, be[1:] != be[:-1]])
        ends = np.r_[starts[1:], len(be)]
        out = np.empty(len(starts), dtype=np.float64)
        for j in range(len(starts)):
            lo, hi = int(starts[j]), int(ends[j])
            out[j] = fn(Frame(tick=int(be[lo]), ticks=ts[lo:hi], values=vals[lo:hi]))
        return pd.DataFrame(
            {
                "class": np.repeat(pdf["class"].iloc[0], len(starts)),
                "labels_key": np.repeat(pdf["labels_key"].iloc[0], len(starts)),
                "ts": be[starts],
                "v_mapped": out,
            }
        )

    return bucketed.groupBy("gts_id", "_chunk").applyInPandas(run, schema=_OUT_SCHEMA), spec


def macro_reducer(
    df: DataFrame,
    fn: MacroFn,
    by_labels: list[str],
    value_col: str = "v_double",
) -> DataFrame:
    """REDUCE with a custom Python reducer: partition series into label
    equivalence classes (GTSHelper.partition:6770), group by (class, tick)
    and call fn with all series' values at that tick."""
    keys = [F.element_at(F.col("labels"), k).alias(f"label_{k}") for k in by_labels]
    key_names = [f"label_{k}" for k in by_labels]
    # Chunk ticks by hash so one Arrow group carries ~1/n_chunks of an
    # equivalence class's ticks instead of a single tick: all rows of a
    # given tick land in the same group (correctness), per-group overhead
    # is amortized, and the chunk count scales with shuffle parallelism
    # so per-group memory shrinks as partitions are added.
    n_chunks = _tick_chunks(df)
    sel = df.select(
        *keys,
        F.col("ts"),
        F.col(value_col).alias("_v"),
        F.pmod(F.xxhash64("ts"), F.lit(n_chunks)).alias("_chunk"),
    )
    schema = StructType(
        [StructField(k, StringType()) for k in key_names]
        + [StructField("ts", LongType()), StructField("v_reduced", DoubleType())]
    )

    def run(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("ts", kind="mergesort")
        ts = pdf["ts"].to_numpy(np.int64)
        vals = pdf["_v"].to_numpy(np.float64)
        starts = np.flatnonzero(np.r_[True, ts[1:] != ts[:-1]])
        ends = np.r_[starts[1:], len(ts)]
        out = np.empty(len(starts), dtype=np.float64)
        for j in range(len(starts)):
            lo, hi = int(starts[j]), int(ends[j])
            out[j] = fn(Frame(tick=int(ts[lo]), ticks=ts[lo:hi], values=vals[lo:hi]))
        row = {k: np.repeat(pdf[k].iloc[0], len(starts)) for k in key_names}
        row["ts"] = ts[starts]
        row["v_reduced"] = out
        return pd.DataFrame(row)

    return sel.groupBy(*key_names, "_chunk").applyInPandas(run, schema=schema)
