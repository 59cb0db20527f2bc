"""Rollup-tier queries: BUCKETIZE grids answered from the materialized
continuous-aggregate table (sources/rollup.py) instead of raw points.

Both oracles aggregate the RAW events table in DuckDB, so a PASS proves
the rollup path — partials, merge, rebucket — is bit-identical to the
raw scan, not merely approximate.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from warp10_platform_spark.queries import register
from warp10_platform_spark.queries.gts import DAILY, DAY, LASTBUCKET, NDAYS, PTS, _out
from warp10_platform_spark.sources.rollup import (
    HOUR_US,
    rebucket,
    rollup_merge,
    rollup_partials,
    rollup_points,
)
from warp10_platform_spark.sources.tables import canonical_points

_PROFILE_ORACLE = f"""
WITH {PTS}, {DAILY}
SELECT class, "user", ts,
       round(CAST(sum(v::DECIMAL(28,10)) AS DOUBLE) / count(v), 6) AS v_mean,
       CAST(round(sum(v::DECIMAL(28,10)), 6) AS DOUBLE) AS v_sum,
       min(v) AS v_min,
       max(v) AS v_max,
       count(v) AS v_cnt
FROM daily GROUP BY class, "user", ts
"""


@register("rollup_daily_profile", _PROFILE_ORACLE)
def rollup_daily_profile(spark, sf_dir):
    """Daily mean/sum/min/max/count per series served from HOURLY rollup
    partials — the 100 TB dashboard path: the scan touches one row per
    series-hour instead of every raw point (~3600× fewer at 1 Hz data),
    yet the oracle aggregating raw events matches bit-for-bit because
    decimal-sum/count/min/max partials merge exactly."""
    ro = rollup_points(spark, sf_dir, HOUR_US)
    df = rebucket(ro, DAY, LASTBUCKET, NDAYS, HOUR_US)
    return df.select(
        "class",
        F.element_at(F.col("labels"), "user").alias("user"),
        "ts",
        F.round(F.col("sum_d").cast("double") / F.col("cnt"), 6).alias("v_mean"),
        F.round(F.col("sum_d"), 6).cast("double").alias("v_sum"),
        F.col("min_v").alias("v_min"),
        F.col("max_v").alias("v_max"),
        F.col("cnt").alias("v_cnt"),
    )


_SD_ORACLE = f"""
WITH {PTS}, {DAILY},
q AS (SELECT class, "user", ts, CAST(round(v * 1000000) AS BIGINT) AS vq FROM daily),
m AS (SELECT class, "user", ts,
             count(*) AS n,
             sum(CAST(vq AS HUGEINT)) AS s1,
             sum(CAST(vq AS HUGEINT) * vq) AS s2
      FROM q GROUP BY class, "user", ts)
SELECT class, "user", ts,
       round(CASE WHEN n > 1
             THEN sqrt(greatest(CAST(s2 * n - s1 * s1 AS DOUBLE)
                                / (CAST(n AS DOUBLE) * (n - 1)), 0.0) / 1e12)
             END, 6) AS v_sd
FROM m
"""


@register("rollup_daily_sd", _SD_ORACLE)
def rollup_daily_sd(spark, sf_dir):
    """Daily per-series SD served from HOURLY moment partials (n, Σxq,
    Σxq² with xq = round(v·1e6)) — variance joins the rollup-servable set
    because the three moments merge by plain sums. The oracle replays the
    IDENTICAL quantized computation over raw events: all-integer until
    the final double expression, so hour→day merge exactness is proven
    bit-for-bit (the numerator n·Σxq²−(Σxq)² is exact DECIMAL on the
    Spark side and exact HUGEINT in the oracle — identical integers,
    one double rounding each); the sd itself differs from raw-double sd
    by the 1e-6 quantization, the reason serve_bucketize only takes
    this route on approx_moments=True (sources/rollup.MOMENT_SERVABLE)."""
    from warp10_platform_spark.sources.rollup import _var_expr

    ro = rollup_points(spark, sf_dir, HOUR_US)
    df = rebucket(ro, DAY, LASTBUCKET, NDAYS, HOUR_US)
    return df.select(
        "class",
        F.element_at(F.col("labels"), "user").alias("user"),
        "ts",
        F.round(F.sqrt(_var_expr(pop=False)), 6).alias("v_sd"),
    )


_INCR_ORACLE = (
    f"WITH {PTS}, {DAILY} "
    'SELECT class, "user", ts, '
    "round(CAST(sum(v::DECIMAL(28,10)) AS DOUBLE) / count(v), 6) AS v_agg "
    'FROM daily GROUP BY class, "user", ts'
)


@register("rollup_incremental_daily_mean", _INCR_ORACLE)
def rollup_incremental_daily_mean(spark, sf_dir):
    """The incremental-maintenance path end-to-end: points arrive in two
    ingest batches (split by event_id parity), each contributes hourly
    partials, rollup_merge unions+regroups them, and the merged table
    answers the daily-mean grid. The oracle aggregates the raw events in
    one pass — a PASS proves delta-merge maintenance loses nothing, so
    at 100 TB rollup upkeep costs O(delta), never a history re-scan."""
    pts = canonical_points(spark, sf_dir)
    batch_a = rollup_partials(pts.where(F.col("event_id") % 2 == 0), HOUR_US)
    batch_b = rollup_partials(pts.where(F.col("event_id") % 2 == 1), HOUR_US)
    merged = rollup_merge(batch_a, batch_b)
    df = rebucket(merged, DAY, LASTBUCKET, NDAYS, HOUR_US)
    out = df.withColumn("v_agg", F.round(F.col("sum_d").cast("double") / F.col("cnt"), 6))
    return _out(out, "v_agg", "v_agg")


_ACTIVE_ORACLE = (
    f"WITH {PTS}, {DAILY} "
    'SELECT class, ts, count(DISTINCT "user") AS n_series, count(*) AS n_points '
    "FROM daily GROUP BY class, ts"
)


@register("rollup_daily_active_series", _ACTIVE_ORACLE)
def rollup_daily_active_series(spark, sf_dir):
    """Cross-series dashboard off the SAME per-series rollup: daily
    active-series count and point volume per class. Exact — the rollup
    keys carry gts_id, so count(distinct) runs over series-hour rows
    (~3600× fewer than raw points at 1 Hz); no sketch needed. The oracle
    recomputes both from raw events."""
    ro = rollup_points(spark, sf_dir, HOUR_US)
    lo = LASTBUCKET - DAY * NDAYS
    day_end = F.expr(f"{LASTBUCKET}L - (({LASTBUCKET}L - rb) DIV {DAY}L) * {DAY}L")
    return (
        ro.where((F.col("rb") <= LASTBUCKET) & (F.col("rb") > lo))
        .groupBy("class", day_end.alias("ts"))
        .agg(
            F.countDistinct("gts_id").alias("n_series"),
            F.sum("cnt").alias("n_points"),
        )
    )


_HLL_ORACLE = f"""
WITH {PTS}, {DAILY},
h AS (SELECT class, ts, ('0x' || substr(md5('hll:' || CAST(round(v*1000000) AS BIGINT)), 1, 15))::BIGINT AS hv FROM daily),
r AS (SELECT class, ts, hv >> 52 AS reg, hv & ((1::BIGINT << 52) - 1) AS w FROM h),
m AS (SELECT class, ts, reg, max(CASE WHEN w = 0 THEN 53 ELSE 53 - length(bin(w)) END) AS mj FROM r GROUP BY class, ts, reg),
s AS (SELECT class, ts, (sum(1::BIGINT << (53 - mj)))::BIGINT AS sum_int, count(*) AS nreg FROM m GROUP BY class, ts),
e AS (SELECT class, ts,
        (0.7213 / (1.0 + 1.079 / 256.0)) * 65536.0 * 9007199254740992.0
          / CAST(sum_int + (256 - nreg) * (1::BIGINT << 53) AS DOUBLE) AS e_raw,
        256 - nreg AS v0
      FROM s)
SELECT class, ts,
       CAST(floor(CASE WHEN e_raw <= 640.0 AND v0 > 0 THEN 256.0 * ln(256.0 / v0) ELSE e_raw END) AS BIGINT) AS n_values_est
FROM e
"""


@register("rollup_daily_distinct_values_hll", _HLL_ORACLE)
def rollup_daily_distinct_values_hll(spark, sf_dir):
    """Distinct VALUES per class-day — a key NOT in the rollup grain, so
    exact distinct would need the raw scan. Instead: hourly HLL register
    partials (class × hour × register max-rho, the mergeable-sketch
    analog of a sum partial) merged to days and estimated. Values render
    as micro-unit integers so the hashed bytes — and therefore every
    register, and therefore the estimate — are identical cross-engine;
    the oracle replays the whole sketch in SQL and matches bit-for-bit."""
    from warp10_platform_spark.sources.rollup import hll_estimate, hll_register_partials

    pts = canonical_points(spark, sf_dir).where(
        (F.col("ts") <= LASTBUCKET) & (F.col("ts") > LASTBUCKET - DAY * NDAYS)
    )
    regs = hll_register_partials(pts, "CAST(round(v_double*1000000) AS BIGINT)", HOUR_US, ("class",))
    day = regs.withColumn(
        "ts", F.expr(f"{LASTBUCKET}L - (({LASTBUCKET}L - rb) DIV {DAY}L) * {DAY}L")
    )
    return hll_estimate(day, ["class", "ts"]).withColumnRenamed("n_est", "n_values_est")


# Approximate-percentile-from-histogram-partials: the oracle replays the
# SAME histogram definition over RAW events (bin width 8.0 is binary-
# representable, so floor((v-0)/8) is IEEE-identical across engines and
# the whole read — cumulative counts, ceil(q*total), first-bin pick — is
# exact integer math). A PASS proves the hourly-partial -> day-merge ->
# percentile path equals the direct single-pass histogram, i.e. the
# merge algebra is exact; the PERCENTILE itself is approximate with a
# one-bin-width (8.0) bound, stated in the operator docstring.
_P95_ORACLE = f"""
WITH {PTS}, {DAILY},
b AS (
  SELECT class, "user", ts,
         CASE WHEN v < 0.0 THEN -1 WHEN v >= 512.0 THEN 64
              ELSE CAST(floor(v / 8.0) AS INT) END AS bin,
         count(*) AS cnt
  FROM daily GROUP BY 1, 2, 3, 4
),
c AS (
  SELECT class, "user", ts, bin,
         sum(cnt) OVER (PARTITION BY class, "user", ts ORDER BY bin) AS cum,
         sum(cnt) OVER (PARTITION BY class, "user", ts) AS tot
  FROM b
)
SELECT class, "user", ts,
       CASE WHEN min(bin) < 0 OR min(bin) >= 64 THEN NULL
            ELSE 0.0 + min(bin) * 8.0 END AS v_p95
FROM c WHERE cum >= ceil(0.95 * CAST(tot AS DOUBLE))
GROUP BY class, "user", ts
"""


@register("rollup_daily_p95_hist", _P95_ORACLE)
def rollup_daily_p95_hist(spark, sf_dir):
    """Daily p95 per series served from HOURLY histogram partials
    (sources/rollup.histogram_*): the mergeable approximate-percentile
    tier. Day histograms are exact merges of hour histograms, so the
    rollup-served percentile is IDENTICAL to a single-pass histogram
    over raw points (the oracle) — approximation lives only in the
    binning (<= one 8.0-wide bin), never in the merge."""
    from warp10_platform_spark.sources.rollup import histogram_percentile, histogram_points, histogram_rebucket

    h = histogram_points(spark, sf_dir, HOUR_US)
    day = histogram_rebucket(h, DAY, LASTBUCKET, NDAYS, HOUR_US)
    p = histogram_percentile(day, 0.95)
    return p.select(
        "class",
        F.get_json_object(F.col("labels_key"), "$[0].value").alias("user"),
        "ts",
        F.col("v_pct").alias("v_p95"),
    )
