"""Coverage sweep 4: APPLY comparison/boolean ops, COMMONTICKS, CHUNK,
time-extract mappers, argmin/argmax, join/delta/rate bucketizers,
circular mean, LTTB downsampling.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from warp10_platform_spark.core.frame import GTSFrame
from warp10_platform_spark.core.schema import labels_from_key
from warp10_platform_spark.operators import reduce_apply as _ra
from warp10_platform_spark.queries import register
from warp10_platform_spark.core import timeunits as tu
from warp10_platform_spark.queries.gts import DAILY, DAY, LASTBUCKET, NDAYS, PTS, _bucketized
from warp10_platform_spark.sources.tables import canonical_points, events_points

_DAILY_COUNTS = (
    'c AS (SELECT class, "user", ts, count(*) AS n FROM daily GROUP BY class, "user", ts)'
)


@register("apply_compare_or", (
    f"WITH {PTS}, {DAILY}, {_DAILY_COUNTS}, "
    "a AS (SELECT \"user\", ts, n FROM c WHERE class = 'events.purchase'), "
    "b AS (SELECT \"user\", ts, n FROM c WHERE class = 'events.click') "
    'SELECT a."user" AS label_user, a.ts, (a.n > b.n) AS gt, '
    "       ((a.n >= 3) OR (b.n >= 3)) AS either_active "
    'FROM a JOIN b ON a."user" = b."user" AND a.ts = b.ts'
))
def apply_compare_or(spark, sf_dir):
    """APPLY op.gt + op.or (op/OpGT.java:31, OpBoolean.java:27):
    tick-aligned comparison and boolean combination of two daily series."""
    counts = _bucketized(spark, sf_dir, "bucketizer.count")
    a = counts.df.where(F.col("class") == "events.purchase")
    b = counts.df.where(F.col("class") == "events.click")
    gt = _ra.apply_op(a, b, "op.gt", by_labels=["user"], value_col="v_agg").select(
        "label_user", "ts", F.col("v_op").alias("gt")
    )
    a3 = a.withColumn("v_agg", F.col("v_agg") >= 3)
    b3 = b.withColumn("v_agg", F.col("v_agg") >= 3)
    either = _ra.apply_op(a3, b3, "op.or", by_labels=["user"], value_col="v_agg").select(
        "label_user", "ts", F.col("v_op").alias("either_active")
    )
    return gt.join(either, on=["label_user", "ts"])


@register("commonticks_daily", (
    f"WITH {PTS}, {DAILY}, "
    'c AS (SELECT class, ts, count(*) AS n FROM daily GROUP BY class, ts), '
    "nall AS (SELECT count(DISTINCT class) AS total FROM c), "
    "common AS (SELECT ts FROM c GROUP BY ts HAVING count(DISTINCT class) = (SELECT total FROM nall)) "
    "SELECT c.class, c.ts, c.n FROM c JOIN common ON c.ts = common.ts"
))
def commonticks_daily(spark, sf_dir):
    """COMMONTICKS (COMMONTICKS.java) over class-level daily series
    (REDUCE by class first): ticks present in EVERY class — the total is
    a lazy 1-row aggregate cross-join, no driver action."""
    from warp10_platform_spark.operators.bucketize import bucket_end_col

    df = canonical_points(spark, sf_dir).where(
        (F.col("ts") <= LASTBUCKET) & (F.col("ts") > LASTBUCKET - DAY * NDAYS)
    )
    per_class = (
        df.withColumn("ts", bucket_end_col(LASTBUCKET, DAY))
        .groupBy("class", "ts")
        .agg(F.count("*").alias("n"))
        .withColumn("gts_id", F.xxhash64("class"))
    )
    out = _ra.commonticks(per_class)
    return out.select("class", "ts", "n")


@register("chunk_label", (
    f"WITH {PTS} SELECT class, \"user\", ts, "
    f"CAST(({LASTBUCKET} - ts) // {7 * DAY} AS VARCHAR) AS chunkid "
    f"FROM pts WHERE ts <= {LASTBUCKET}"
))
def chunk_label(spark, sf_dir):
    """CHUNK (CHUNK.java:37): weekly chunks anchored at lastchunk; the
    chunk id becomes a new label (sub-series identity)."""
    gf = GTSFrame.fetch(canonical_points(spark, sf_dir), end=LASTBUCKET).chunk(7 * DAY, LASTBUCKET)
    return gf.df.select(
        "class",
        F.element_at("labels", F.lit("user")).alias("user"),
        "ts",
        F.element_at("labels", F.lit("chunkid")).alias("chunkid"),
    )


@register("time_extract", (
    f"WITH {PTS} SELECT class, \"user\", ts, "
    f"year(make_timestamp({tu.duck_units_to_us('ts')})) AS y, month(make_timestamp({tu.duck_units_to_us('ts')})) AS m, "
    f"dayofmonth(make_timestamp({tu.duck_units_to_us('ts')})) AS d, hour(make_timestamp({tu.duck_units_to_us('ts')})) AS h "
    "FROM pts"
))
def time_extract(spark, sf_dir):
    """Time-extract mappers (MapperYear/Month/DayOfMonth/HourOfDay.java:29):
    calendar fields of the tick itself (UTC)."""
    from warp10_platform_spark.operators.mapper import map_scalar

    pts = canonical_points(spark, sf_dir)
    out = map_scalar(pts, "mapper.year", out_col="y")
    out = map_scalar(out, "mapper.month", out_col="m")
    out = map_scalar(out, "mapper.day", out_col="d")
    out = map_scalar(out, "mapper.hour", out_col="h")
    return out.select(
        "class", F.element_at("labels", F.lit("user")).alias("user"), "ts", "y", "m", "d", "h"
    )


@register("bucketize_argminmax", (
    f"WITH {PTS}, {DAILY} "
    'SELECT class, "user", ts, '
    "-(max(struct_pack(a := v, b := -raw_ts)).b) AS t_max, "
    "min(struct_pack(a := v, b := raw_ts)).b AS t_min "
    'FROM daily GROUP BY class, "user", ts'
))
def bucketize_argminmax(spark, sf_dir):
    """bucketizer.argmax/argmin (aggregator/Argminmax.java:46): the tick
    of each bucket's extremum. Ties on the extreme VALUE break to the
    EARLIEST tick — the reference scans ticks ascending with a strict
    comparison (Argminmax.java:158), so first occurrence wins; plain
    max_by/arg_min pick an arbitrary tied row and diverge between
    engines once buckets are dense enough to contain duplicate values
    (seen at sf0.1). Lexicographic struct min/max encodes the tie-break
    in both engines."""
    from warp10_platform_spark.operators.bucketize import SERIES_KEYS, bucket_end_col

    df = canonical_points(spark, sf_dir).where(
        (F.col("ts") <= LASTBUCKET) & (F.col("ts") > LASTBUCKET - DAY * NDAYS)
    )
    out = (
        df.withColumn("bucket_end", bucket_end_col(LASTBUCKET, DAY))
        .groupBy(*SERIES_KEYS, "bucket_end")
        .agg(
            (-F.max(F.struct(F.col("v_double").alias("a"), (-F.col("ts")).alias("b")))["b"]).alias("t_max"),
            F.min(F.struct(F.col("v_double").alias("a"), F.col("ts").alias("b")))["b"].alias("t_min"),
        )
        .withColumn("labels", labels_from_key())
    )
    return out.select(
        "class",
        F.element_at("labels", F.lit("user")).alias("user"),
        F.col("bucket_end").alias("ts"),
        "t_max",
        "t_min",
    )


@register("bucketize_join_delta_rate", (
    f"WITH {PTS}, {DAILY} "
    'SELECT class, "user", ts, '
    "array_to_string(list(CAST(v AS VARCHAR) ORDER BY CAST(v AS VARCHAR)), ',') AS joined, "
    "arg_max(v, raw_ts) - arg_min(v, raw_ts) AS delta, "
    f"round((arg_max(v, raw_ts) - arg_min(v, raw_ts)) / ((max(raw_ts) - min(raw_ts)) / {float(tu.UNITS_PER_S)}), 6) AS rate "
    'FROM daily GROUP BY class, "user", ts HAVING max(raw_ts) > min(raw_ts)'
))
def bucketize_join_delta_rate(spark, sf_dir):
    """bucketizer.join (sorted, Join.java:37) + delta (last-first,
    Delta.java:31) + rate per second (Rate.java:33) in one bucket pass."""
    from warp10_platform_spark.operators.bucketize import SERIES_KEYS, bucket_end_col, bucketizer_expr

    df = canonical_points(spark, sf_dir).where(
        (F.col("ts") <= LASTBUCKET) & (F.col("ts") > LASTBUCKET - DAY * NDAYS)
    )
    v, ts = F.col("v_double"), F.col("ts")
    out = (
        df.withColumn("bucket_end", bucket_end_col(LASTBUCKET, DAY))
        .groupBy(*SERIES_KEYS, "bucket_end")
        .agg(
            bucketizer_expr("join", v.cast("string"), ts).alias("joined"),
            bucketizer_expr("delta", v, ts).alias("delta"),
            F.round(bucketizer_expr("rate", v, ts), 6).alias("rate"),
            (F.max("ts") > F.min("ts")).alias("_multi"),
        )
        .withColumn("labels", labels_from_key())
        .where(F.col("_multi"))
    )
    return out.select(
        "class",
        F.element_at("labels", F.lit("user")).alias("user"),
        F.col("bucket_end").alias("ts"),
        "joined",
        "delta",
        "rate",
    )


@register("circular_mean_daily", (
    f"WITH {PTS}, {DAILY}, "
    # values (0-ish..500) → degrees: v*0.72 maps into [0,360); quantize
    # sin/cos to 1e-12 so the accumulation is order-independent
    "t AS (SELECT class, \"user\", ts, "
    "      CAST(round(sin(radians(v * 0.72)) * 1e12) AS BIGINT) AS sq, "
    "      CAST(round(cos(radians(v * 0.72)) * 1e12) AS BIGINT) AS cq "
    "      FROM daily) "
    'SELECT class, "user", ts, '
    "round(degrees(atan2(CAST(sum(sq) AS DOUBLE) / count(*) / 1e12, CAST(sum(cq) AS DOUBLE) / count(*) / 1e12)), 6) AS v_agg "
    'FROM t GROUP BY class, "user", ts'
))
def circular_mean_daily(spark, sf_dir):
    """bucketizer.mean.circular (aggregator/CircularMean.java:37) over
    values mapped to degrees: atan2(avg sin, avg cos), with sin/cos
    quantized to 1e-12 before summation (order-independent — the same
    exactness device as INTEGRATE)."""
    from warp10_platform_spark.operators.bucketize import SERIES_KEYS, bucket_end_col

    df = canonical_points(spark, sf_dir).where(
        (F.col("ts") <= LASTBUCKET) & (F.col("ts") > LASTBUCKET - DAY * NDAYS)
    )
    rad = F.radians(F.col("v_double") * 0.72)
    sq = F.round(F.sin(rad) * 1e12).cast("long")
    cq = F.round(F.cos(rad) * 1e12).cast("long")
    out = (
        df.withColumn("bucket_end", bucket_end_col(LASTBUCKET, DAY))
        .withColumn("_sq", sq)
        .withColumn("_cq", cq)
        .groupBy(*SERIES_KEYS, "bucket_end")
        .agg(
            F.round(
                F.degrees(
                    F.atan2(
                        F.sum("_sq").cast("double") / F.count("*") / 1e12,
                        F.sum("_cq").cast("double") / F.count("*") / 1e12,
                    )
                ),
                6,
            ).alias("v_agg"),
        )
        .withColumn("labels", labels_from_key())
    )
    return out.select(
        "class",
        F.element_at("labels", F.lit("user")).alias("user"),
        F.col("bucket_end").alias("ts"),
        "v_agg",
    )


LTTB_ORACLE = """
WITH RECURSIVE pts AS (
  SELECT 'events.' || event_type AS class, epoch_us(ts) AS ts, value AS v FROM events
),
s AS (
  SELECT class,
         list(ts ORDER BY ts) AS tl,
         list(ts::DOUBLE ORDER BY ts) AS x,
         list(v::DOUBLE ORDER BY ts) AS y,
         CAST(count(*) AS INT) AS n
  FROM pts GROUP BY class
),
walk AS (
  SELECT class, 0 AS j, 0 AS a, [0] AS keep FROM s WHERE n > 24
  UNION ALL
  SELECT class, j + 1,
         list_reduce(
           list_transform(range(lo, hi), k ->
             {'ar': abs((x[a + 1] - avgx) * (y[k + 1] - y[a + 1]) - (x[a + 1] - x[k + 1]) * (avgy - y[a + 1])),
              'i': k}),
           (p, q) -> CASE WHEN q.ar > p.ar THEN q ELSE p END).i,
         list_append(keep, list_reduce(
           list_transform(range(lo, hi), k ->
             {'ar': abs((x[a + 1] - avgx) * (y[k + 1] - y[a + 1]) - (x[a + 1] - x[k + 1]) * (avgy - y[a + 1])),
              'i': k}),
           (p, q) -> CASE WHEN q.ar > p.ar THEN q ELSE p END).i)
  FROM (
    SELECT w.class, w.j, w.a, w.keep, s.n, s.x, s.y,
           CAST(floor(w.j * ((s.n - 2) / 22.0)) AS INT) + 1 AS lo,
           LEAST(CAST(floor((w.j + 1) * ((s.n - 2) / 22.0)) AS INT) + 1, s.n - 1) AS hi,
           CAST(floor((w.j + 1) * ((s.n - 2) / 22.0)) AS INT) + 1 AS nlo,
           LEAST(CAST(floor((w.j + 2) * ((s.n - 2) / 22.0)) AS INT) + 1, s.n) AS nhi
    FROM walk w JOIN s ON s.class = w.class
    WHERE w.j < 22
  ) q1_,
  LATERAL (
    SELECT CASE WHEN nhi > nlo THEN list_reduce(list_slice(x, nlo + 1, nhi), (p, q) -> p + q) / (nhi - nlo) ELSE x[n] END AS avgx,
           CASE WHEN nhi > nlo THEN list_reduce(list_slice(y, nlo + 1, nhi), (p, q) -> p + q) / (nhi - nlo) ELSE y[n] END AS avgy
  ) q2_
),
chosen AS (
  SELECT w.class, unnest(list_append(w.keep, s.n - 1)) AS idx
  FROM walk w JOIN s ON s.class = w.class WHERE w.j = 22
)
SELECT c.class, s.tl[c.idx + 1] AS ts, s.y[c.idx + 1] AS v_double
FROM chosen c JOIN s ON s.class = c.class
UNION ALL
SELECT p.class, p.ts, p.v AS v_double
FROM pts p JOIN s ON s.class = p.class WHERE s.n <= 24
"""
# epoch extractor flips with the session time unit (core/timeunits)
LTTB_ORACLE = LTTB_ORACLE.replace("epoch_us(ts)", tu.duck_epoch("ts"))



@register("lttb_downsample", LTTB_ORACLE)
def lttb_downsample(spark, sf_dir):
    """LTTB (LTTB.java:32): largest-triangle-three-buckets downsample of
    each per-class series (users merged → thousands of points, so the
    triangle walk actually runs at gate scale) to 24 points. The oracle
    replays the identical greedy selection with a recursive CTE — the
    bucket means are sequential left-folds in BOTH engines (not
    np.mean's pairwise summation), which is what makes the argmax
    bit-reproducible."""
    from warp10_platform_spark.core.schema import with_gts_id

    pts = canonical_points(spark, sf_dir).select(
        "class",
        F.create_map().cast("map<string,string>").alias("labels"),
        "ts",
        "v_double",
    )
    gf = GTSFrame(with_gts_id(pts)).lttb(24)
    return gf.df.select("class", "ts", "v_double")
