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

    return df.groupBy("gts_id").applyInPandas(run, schema=_OUT_SCHEMA)


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
    bucketed = in_grid.withColumn("bucket_end", bucket_end_col(spec.lastbucket, spec.bucketspan))

    def run(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("ts")
        be = int(pdf["bucket_end"].iloc[0])
        fr = Frame(
            tick=be,
            ticks=pdf["ts"].to_numpy(np.int64),
            values=pdf[value_col].to_numpy(np.float64),
        )
        return pd.DataFrame(
            {
                "class": [pdf["class"].iloc[0]],
                "labels_key": [pdf["labels_key"].iloc[0]],
                "ts": [be],
                "v_mapped": [fn(fr)],
            }
        )

    return bucketed.groupBy("gts_id", "bucket_end").applyInPandas(run, schema=_OUT_SCHEMA), spec


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
    sel = df.select(*keys, F.col("ts"), F.col(value_col).alias("_v"))
    schema = StructType(
        [StructField(k, StringType()) for k in key_names]
        + [StructField("ts", LongType()), StructField("v_reduced", DoubleType())]
    )

    def run(pdf: pd.DataFrame) -> pd.DataFrame:
        tick = int(pdf["ts"].iloc[0])
        fr = Frame(
            tick=tick,
            ticks=pdf["ts"].to_numpy(np.int64),
            values=pdf["_v"].to_numpy(np.float64),
        )
        row = {k: [pdf[k].iloc[0]] for k in key_names}
        row["ts"] = [tick]
        row["v_reduced"] = [fn(fr)]
        return pd.DataFrame(row)

    return sel.groupBy(*key_names, "ts").applyInPandas(run, schema=schema)
