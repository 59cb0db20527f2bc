"""FILL — missing-bucket materialization + filler models.

Reference (FILL.java:34 + filler/*.java): on a bucketized GTS, create the
missing grid buckets and fill their values with a model:
previous / next / value / interpolate(linear) / trend / spline / akima...

Spark mapping (SURVEY §2.8): the grid scaffold is sequence(first_bucket,
lastbucket, span) exploded per series, LEFT-joined with the data, then:
  - previous  → last(v, ignoreNulls)  over (-inf, 0]
  - next      → first(v, ignoreNulls) over [0, +inf)
  - value     → coalesce(v, lit)
  - linear    → prev + (next-prev) * (ts-prev_ts)/(next_ts-prev_ts)
All window/expr — no Python in the path. The scaffold explode generates
bucketcount rows per series; at 100 TB the per-series grid is bounded by
the `maxbuckets` guard (GTSHelper.bucketize:2261) which we keep as a
config cap.

Spline/akima/lowess fillers need scipy-style fitting → grouped pandas UDF
(see operators/analytics.py); gated since scipy isn't in this image.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from warp10_platform_spark.operators.bucketize import BucketSpec

SERIES_KEYS = ["gts_id", "class", "labels_key"]


def scaffold(df: DataFrame, spec: BucketSpec) -> DataFrame:
    """One row per (series, grid bucket): series dims × sequence of bucket
    ends, left-joined to the bucketized data. Missing buckets have null
    value columns."""
    first_bucket = spec.lastbucket - (spec.bucketcount - 1) * spec.bucketspan
    # dropDuplicates on the key subset (distinct() would be a set-op on the
    # MAP labels column, which Spark forbids)
    series = df.select(*SERIES_KEYS, "labels").dropDuplicates(SERIES_KEYS)
    grid = series.withColumn(
        "ts",
        F.explode(F.sequence(F.lit(first_bucket), F.lit(spec.lastbucket), F.lit(spec.bucketspan))),
    )
    value_cols = [c for c in df.columns if c not in SERIES_KEYS + ["labels", "ts"]]
    return grid.join(df.select(*SERIES_KEYS, "ts", *value_cols), on=SERIES_KEYS + ["ts"], how="left")


def fill_previous(df: DataFrame, value_col: str = "v_agg") -> DataFrame:
    """FILLPREVIOUS / filler.previous (FillerPrevious.java:26)."""
    w = Window.partitionBy("gts_id").orderBy("ts").rowsBetween(Window.unboundedPreceding, 0)
    return df.withColumn(value_col, F.last(value_col, ignorenulls=True).over(w))


def fill_next(df: DataFrame, value_col: str = "v_agg") -> DataFrame:
    """FILLNEXT / filler.next (FillerNext.java:26)."""
    w = Window.partitionBy("gts_id").orderBy("ts").rowsBetween(0, Window.unboundedFollowing)
    return df.withColumn(value_col, F.first(value_col, ignorenulls=True).over(w))


def fill_value(df: DataFrame, value, value_col: str = "v_agg") -> DataFrame:
    """FILLVALUE / filler.value (FillerValue.java:33)."""
    return df.withColumn(value_col, F.coalesce(F.col(value_col), F.lit(value)))


def fill_linear(df: DataFrame, value_col: str = "v_agg") -> DataFrame:
    """filler.interpolate — linear interpolation between the surrounding
    non-null points (FillerInterpolate.java:32). Boundary buckets with no
    point on one side stay null (reference behavior)."""
    wb = Window.partitionBy("gts_id").orderBy("ts").rowsBetween(Window.unboundedPreceding, -1)
    wf = Window.partitionBy("gts_id").orderBy("ts").rowsBetween(1, Window.unboundedFollowing)
    v = F.col(value_col)
    prev_v = F.last(value_col, ignorenulls=True).over(wb)
    next_v = F.first(value_col, ignorenulls=True).over(wf)
    prev_t = F.last(F.when(v.isNotNull(), F.col("ts")), ignorenulls=True).over(wb)
    next_t = F.first(F.when(v.isNotNull(), F.col("ts")), ignorenulls=True).over(wf)
    interp = prev_v + (next_v - prev_v) * (F.col("ts") - prev_t) / (next_t - prev_t)
    return df.withColumn(value_col, F.coalesce(v, interp))


def interpolate(df: DataFrame, value_col: str = "v_agg") -> DataFrame:
    """INTERPOLATE (continuum/gts/INTERPOLATE.java) — alias of linear fill
    on an already-scaffolded frame."""
    return fill_linear(df, value_col)
