"""BUCKETIZE — regular time-grid aggregation per series.

Reference semantics (BUCKETIZE.java:34; GTSHelper.bucketize:2257-2360):
the grid is ANCHORED AT `lastbucket` (not at epoch), buckets are
(bucket_end - span, bucket_end] half-open intervals ending at
lastbucket - k*span; bucketcount auto-derived from the data span when 0.
A bucketizer aggregates the points of each bucket to one point whose tick
is the bucket end. Bucketized-ness (lastbucket, span, count) becomes part
of the series (GeoTimeSerie.java:80-96) and propagates.

Spark mapping: bucket_end is a pure integer-arithmetic column (NOT the
built-in `window()` — that anchors at epoch and cannot express the
lastbucket anchor), then ONE hash aggregation per (gts_id, bucket_end).
Catalyst gives partial (map-side) aggregation for all the built-in
bucketizers, so the shuffle carries one row per (series, bucket), not per
point — this is what keeps a 100 TB bucketize tractable: shuffle volume
is output-sized, not input-sized.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from warp10_platform_spark.core import timeunits as tu
from warp10_platform_spark.core.schema import labels_from_key

# One canonical aggregation expression per bucketizer name, over a numeric
# value column `v` ordered by tick `ts`. Mirrors script/aggregator/* —
# Sum.java:31, Mean.java:34, Min/Max.java:29, Count.java:30,
# First/Last.java:29, Median.java:36, Percentile.java:38,
# StandardDeviation.java:29, Variance.java:29, Delta.java:31, Rate.java:33,
# RMS.java:32, Join.java:37, And/Or.java:31, Argminmax.java:46.
def bucketizer_expr(name: str, v: Column, ts: Column, *, p: float | None = None, sep: str = ",") -> Column:
    n = name.replace("bucketizer.", "").replace("reducer.", "").replace("mapper.", "")
    if n in ("sum", "sum.nonnull"):
        return F.sum(v)
    if n in ("mean", "mean.exclude-nulls"):
        return F.avg(v)
    if n == "mean.circular":
        import math
        rad = v * math.pi / 180.0
        return F.atan2(F.avg(F.sin(rad)), F.avg(F.cos(rad))) * 180.0 / math.pi
    if n == "min":
        return F.min(v)
    if n == "max":
        return F.max(v)
    if n in ("count", "count.exclude-nulls", "count.nonnull"):
        return F.count(v)
    if n == "first":
        return F.min_by(v, ts)
    if n == "last":
        return F.max_by(v, ts)
    if n == "median":
        return F.median(v)
    if n == "percentile":
        assert p is not None
        return F.percentile(v, F.lit(p / 100.0))
    if n == "sd":
        return F.stddev_samp(v)
    if n == "sd.pop":
        return F.stddev_pop(v)
    if n == "var":
        return F.var_samp(v)
    if n == "var.pop":
        return F.var_pop(v)
    if n == "delta":
        return F.max_by(v, ts) - F.min_by(v, ts)
    if n == "rate":  # delta per second; ts is LONG platform ticks; null for 1-point buckets
        return F.try_divide(F.max_by(v, ts) - F.min_by(v, ts), (F.max(ts) - F.min(ts)) / F.lit(float(tu.UNITS_PER_S)))
    if n == "rms":
        return F.sqrt(F.avg(v * v))
    if n == "product":
        # MapperProduct.java:30 — exact ordered fold (value-sorted so the
        # double product is deterministic and engine-independent).
        return F.aggregate(
            F.array_sort(F.collect_list(v)), F.lit(1.0), lambda acc, x: acc * x
        )
    if n == "join":
        return F.concat_ws(sep, F.sort_array(F.collect_list(v.cast("string"))))
    if n == "join.urlencoded":
        # reducer.join.urlencoded (Join.java urlencode=true): percent-
        # encode each stringified value before joining.
        return F.concat_ws(sep, F.sort_array(F.collect_list(F.url_encode(v.cast("string")))))
    if n == "and":
        return F.min(v.cast("boolean"))
    if n == "or":
        return F.max(v.cast("boolean"))
    # argmin/argmax tie-break: the reference scans ticks ascending with a
    # strict comparison (Argminmax.java:158), so the EARLIEST tick among
    # tied extreme values wins; plain max_by/min_by pick an arbitrary
    # tied row. Lexicographic struct min/max pins the reference order.
    if n == "argmax":
        return (-F.max(F.when(v.isNotNull(), F.struct(v.alias("a"), (-ts).alias("b"))))["b"]).cast("long")
    if n == "argmin":
        return F.min(F.when(v.isNotNull(), F.struct(v.alias("a"), ts.alias("b"))))["b"].cast("long")
    if n == "musigma":
        return F.struct(F.avg(v).alias("mu"), F.stddev_samp(v).alias("sigma"))
    if n == "mad":
        # Median absolute deviation (GTSOutliersHelper.mad): nested medians
        # via one collect_list + array exprs — group-local memory only.
        s = F.array_sort(F.collect_list(v))
        med = _sorted_array_median(s)
        devs = F.array_sort(F.transform(s, lambda x: F.abs(x - med)))
        return _sorted_array_median(devs)
    if n == "skewness":
        return F.skewness(v)
    if n == "kurtosis":
        return F.kurtosis(v)
    if n in ("shannonentropy", "shannonentropy.0"):
        # -(Σ p ln p) over the value distribution (ShannonEntropy.java:33).
        # One sort + ONE linear fold over the sorted values counting equal
        # runs — term order is ascending-by-value, engine-reproducible.
        # (The previous map-accumulator was O(n²) with a map rebuild per
        # element: a 1600-point bucket on the r5 skew fixture took the
        # whole query to 1000+ s. Runs-fold: 2.7 s.)
        arr = F.array_sort(F.collect_list(v.cast("double")))
        n_tot = F.size(arr).cast("double")
        term = lambda run: (run.cast("double") / n_tot) * F.log(run.cast("double") / n_tot)  # noqa: E731
        st = F.aggregate(
            arr,
            F.named_struct(
                F.lit("prev"), F.lit(None).cast("double"),
                F.lit("run"), F.lit(0).cast("long"),
                F.lit("acc"), F.lit(0.0),
            ),
            lambda acc, x: F.when(
                acc["prev"].isNull() | (acc["prev"] == x),
                F.named_struct(F.lit("prev"), x, F.lit("run"), acc["run"] + 1, F.lit("acc"), acc["acc"]),
            ).otherwise(
                F.named_struct(
                    F.lit("prev"), x, F.lit("run"), F.lit(1).cast("long"),
                    F.lit("acc"), acc["acc"] + term(acc["run"]),
                )
            ),
        )
        return -F.when(F.size(arr) > 0, st["acc"] + term(st["run"])).otherwise(F.lit(None))
    if n == "highest":
        assert p is not None, "bucketizer.highest needs the k parameter (as p)"
        return F.slice(F.reverse(F.array_sort(F.collect_list(v))), 1, int(p))
    if n == "lowest":
        assert p is not None, "bucketizer.lowest needs the k parameter (as p)"
        return F.slice(F.array_sort(F.collect_list(v)), 1, int(p))
    if n == "mode":
        # most frequent value; ties → smallest value (deterministic, unlike
        # engine-native mode()). Sorted-runs fold, same shape as
        # shannonentropy (the map accumulator was O(n²) — r5 skew fix).
        arr = F.array_sort(F.collect_list(v.cast("double")))
        st = F.aggregate(
            arr,
            F.named_struct(
                F.lit("prev"), F.lit(None).cast("double"),
                F.lit("run"), F.lit(0).cast("long"),
                F.lit("bk"), F.lit(None).cast("double"),
                F.lit("bn"), F.lit(0).cast("long"),
            ),
            lambda acc, x: F.when(
                acc["prev"].isNull() | (acc["prev"] == x),
                F.named_struct(
                    F.lit("prev"), x, F.lit("run"), acc["run"] + 1,
                    F.lit("bk"), acc["bk"], F.lit("bn"), acc["bn"],
                ),
            ).otherwise(
                F.named_struct(
                    F.lit("prev"), x, F.lit("run"), F.lit(1).cast("long"),
                    F.lit("bk"), F.when(acc["run"] > acc["bn"], acc["prev"]).otherwise(acc["bk"]),
                    F.lit("bn"), F.when(acc["run"] > acc["bn"], acc["run"]).otherwise(acc["bn"]),
                )
            ),
        )
        return F.when(st["run"] > st["bn"], st["prev"]).otherwise(st["bk"])
    raise ValueError(f"unknown bucketizer: {name}")


def _sorted_array_median(s: Column) -> Column:
    """Exact median of a sorted numeric array column."""
    n = F.size(s)
    lo = F.element_at(s, ((n + 1) / 2).cast("int"))
    hi = F.element_at(s, (n / 2 + 1).cast("int"))
    return F.when(n % 2 == 1, lo).otherwise((lo + hi) / 2.0)


@dataclass(frozen=True)
class BucketSpec:
    """Bucket-grid metadata carried on a GTSFrame (GeoTimeSerie.java:80-96)."""

    lastbucket: int
    bucketspan: int
    bucketcount: int


def merge_bucketspecs(*specs: "BucketSpec | None") -> "BucketSpec | None":
    """REDUCE/APPLY bucketization-congruence rule (GTSHelper.java:
    8196-8247): the result is bucketized iff EVERY input is bucketized
    with the same bucketspan and congruent lastbucket values
    (lastbucket % span equal across inputs). The merged spec covers the
    union of the input grids: lastbucket = max(lastbucket_i),
    startbucket = min(lastbucket_i - bucketcount_i * span), bucketcount
    = (lastbucket - startbucket) / span. Any violation → None
    (unbucketized result), exactly the reference's fallback."""
    if not specs or any(s is None for s in specs):
        return None
    span = specs[0].bucketspan
    if any(s.bucketspan != span for s in specs):
        return None
    phase = specs[0].lastbucket % span
    if any(s.lastbucket % span != phase for s in specs):
        return None
    lastbucket = max(s.lastbucket for s in specs)
    startbucket = min(s.lastbucket - s.bucketcount * s.bucketspan for s in specs)
    return BucketSpec(lastbucket, span, (lastbucket - startbucket) // span)


def bucket_end_col(lastbucket: int, span: int) -> Column:
    """bucket_end = lastbucket - ((lastbucket - ts) DIV span)*span, grid
    anchored at lastbucket; points with ts > lastbucket are excluded by the
    caller. Integer DIV (not double floor) so µs-scale ticks never hit
    float-mantissa rounding at bucket boundaries."""
    return F.expr(f"{lastbucket}L - (({lastbucket}L - ts) DIV {span}L) * {span}L").alias("bucket_end")


def derive_spec(df: DataFrame, span: int, lastbucket: int | None, bucketcount: int | None) -> BucketSpec:
    """Auto-compute missing grid parameters from the data extent
    (GTSHelper.java:2322-2360): lastbucket defaults to max(ts) and
    bucketcount to ceil(extent/span). One tiny agg job (driver-side
    scalars only — no data collected)."""
    if lastbucket is None or bucketcount is None:
        row = df.agg(F.min("ts").alias("mn"), F.max("ts").alias("mx")).first()
        mn, mx = row["mn"], row["mx"]
        if mn is None or mx is None:
            # Empty input: the reference returns an empty bucketized GTS.
            return BucketSpec(lastbucket=int(lastbucket or 0), bucketspan=int(span), bucketcount=int(bucketcount or 0))
        if lastbucket is None:
            lastbucket = int(mx)
        if bucketcount is None:
            bucketcount = int((lastbucket - mn) // span) + 1
    return BucketSpec(lastbucket=int(lastbucket), bucketspan=int(span), bucketcount=int(bucketcount))


SERIES_KEYS = ["gts_id", "class", "labels_key"]


def bucketize(
    df: DataFrame,
    bucketizer: str,
    span: int,
    lastbucket: int | None = None,
    bucketcount: int | None = None,
    value_col: str = "v_double",
    p: float | None = None,
) -> tuple[DataFrame, BucketSpec]:
    """groupBy (series, bucket_end) + one aggregate. Returns the bucketized
    points frame (ts = bucket end) and the grid spec."""
    spec = derive_spec(df, span, lastbucket, bucketcount)
    in_grid = df.where(
        (F.col("ts") <= F.lit(spec.lastbucket))
        & (F.col("ts") > F.lit(spec.lastbucket - spec.bucketspan * spec.bucketcount))
    )
    bucketed = in_grid.withColumn("bucket_end", bucket_end_col(spec.lastbucket, spec.bucketspan))
    agg = bucketizer_expr(bucketizer, F.col(value_col), F.col("ts"), p=p).alias("v_agg")
    out = (
        bucketed.groupBy(*SERIES_KEYS, "bucket_end")
        .agg(agg)
        .withColumn("labels", labels_from_key())
        .withColumnRenamed("bucket_end", "ts")
    )
    return out, spec


def bucketize_calendar(
    df: DataFrame,
    bucketizer: str,
    unit: str = "day",
    tz: str = "UTC",
    value_col: str = "v_double",
    p: float | None = None,
) -> DataFrame:
    """BUCKETIZECALENDAR (functions/BUCKETIZECALENDAR.java): buckets
    aligned to calendar boundaries (day/week/month/quarter/year) in a
    timezone — DST-aware, so buckets are not a fixed span.

    Output tick = epoch-µs of the bucket START (the calendar boundary);
    the reference indexes buckets from the Unix epoch in the given tz —
    same partition of the time axis, different tick labeling (documented
    deviation). Pure column math: trunc in wall-clock tz, one hash
    aggregation, partial aggregation applies."""
    from warp10_platform_spark.functions.timeutil import tz_wall_ntz, wall_ntz_to_us

    # NTZ wall-clock math (session-timezone-independent; see tz_wall_ntz)
    wall = tz_wall_ntz(F.col("ts"), tz)
    bucket_start = wall_ntz_to_us(F.date_trunc(unit, wall), tz)
    agg = bucketizer_expr(bucketizer, F.col(value_col), F.col("ts"), p=p).alias("v_agg")
    return (
        df.withColumn("bucket_start", bucket_start)
        .groupBy(*SERIES_KEYS, "bucket_start")
        .agg(agg)
        .withColumn("labels", labels_from_key())
        .withColumnRenamed("bucket_start", "ts")
    )
