"""Queries covering previously-untested operator rows: the FILTER
framework, kernel smoothers, set ops, VALUEDEDUP, TIMESCALE/MONOTONIC.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from warp10_platform_spark.core.frame import GTSFrame
from warp10_platform_spark.operators import reshape as _reshape
from warp10_platform_spark.operators import setops as _setops
from warp10_platform_spark.queries import register
from warp10_platform_spark.queries.gts import HOUR, PTS
from warp10_platform_spark.sources.tables import canonical_points, events_points


@register("filters_compose", (
    f"WITH {PTS}, "
    'sized AS (SELECT class, "user" FROM pts WHERE class ~ \'^events\\.(p|c).*$\' '
    '          GROUP BY class, "user" HAVING count(*) >= 10), '
    'lastv AS (SELECT class, "user", arg_max(v, ts) AS lv FROM pts GROUP BY class, "user") '
    'SELECT p.class, p."user", p.ts, p.v AS v_double '
    "FROM pts p JOIN sized s ON p.class = s.class AND p.\"user\" = s.\"user\" "
    "JOIN lastv l ON p.class = l.class AND p.\"user\" = l.\"user\" "
    "WHERE l.lv > 20.0"
))
def filters_compose(spark, sf_dir):
    """FILTER framework composition (FILTER.java:39): byclass regex →
    bysize ≥ 10 → filter.last.gt 20 — each a series-level aggregate +
    broadcast semi-join."""
    gf = (
        GTSFrame.fetch(canonical_points(spark, sf_dir))
        .filter_byclass(r"^events\.(p|c).*$")
        .filter_bysize(10)
        .filter_last("gt", 20.0)
    )
    return gf.df.select(
        "class", F.element_at("labels", F.lit("user")).alias("user"), "ts", "v_double"
    )


@register("kernel_gaussian_smooth", (
    f"WITH {PTS}, "
    "fr AS (SELECT class, \"user\", ts, "
    "       list(struct_pack(t := ts, v := v)) OVER "
    f"       (PARTITION BY class, \"user\" ORDER BY ts RANGE BETWEEN {HOUR} PRECEDING AND {HOUR} FOLLOWING) AS pairs "
    "       FROM pts) "
    "SELECT class, \"user\", ts, round("
    f" list_reduce(list_transform(pairs, p -> exp(-0.5 * ((p.t - ts) / {float(HOUR)}) ^ 2) / sqrt(2 * pi()) * p.v), (a, b) -> a + b)"
    f" / list_reduce(list_transform(pairs, p -> exp(-0.5 * ((p.t - ts) / {float(HOUR)}) ^ 2) / sqrt(2 * pi())), (a, b) -> a + b)"
    ", 6) AS v_mapped FROM fr"
))
def kernel_gaussian_smooth(spark, sf_dir):
    """mapper.kernel.gaussian (MapperKernelGaussian.java:24): 1h-bandwidth
    kernel-weighted moving average — collect_list window + HOF fold in
    tick order on both engines."""
    from warp10_platform_spark.operators.mapper import kernel_smoother

    out = kernel_smoother(canonical_points(spark, sf_dir), "gaussian", HOUR)
    return out.select(
        "class",
        F.element_at("labels", F.lit("user")).alias("user"),
        "ts",
        F.round("v_mapped", 6).alias("v_mapped"),
    )


@register("setops_merge_diff", (
    f"WITH {PTS}, "
    "a AS (SELECT class, \"user\", ts, v FROM pts WHERE class = 'events.purchase'), "
    "b AS (SELECT class, \"user\", ts, v FROM pts WHERE ts % 2 = 0) "
    "SELECT class, \"user\", ts, v AS v_double FROM ("
    "  SELECT * FROM a UNION SELECT * FROM b "
    "  EXCEPT SELECT * FROM a INTERSECT SELECT * FROM b"
    ")"
))
def setops_merge_diff(spark, sf_dir):
    """Set algebra (UNION/INTERSECTION/DIFFERENCE, WarpScriptLib:2015-17):
    symmetric difference of two point sets via the engine's set ops."""
    pts = canonical_points(spark, sf_dir).select(
        "class", F.element_at("labels", F.lit("user")).alias("user"), "ts", "v_double"
    )
    a = pts.where(F.col("class") == "events.purchase")
    b = pts.where(F.col("ts") % 2 == 0)
    keys = ["class", "user", "ts", "v_double"]
    union = _setops.union_points(a, b)
    inter = _setops.intersection_points(a, b, on=keys)
    return _setops.difference_points(union, inter, on=keys)


@register("valuededup_first", (
    f"WITH {PTS} SELECT class, \"user\", ts, v AS v_double FROM ("
    '  SELECT *, row_number() OVER (PARTITION BY class, "user", v ORDER BY ts) AS rn FROM pts'
    ") WHERE rn = 1"
))
def valuededup_first(spark, sf_dir):
    """VALUEDEDUP (VALUEDEDUP.java): keep the first occurrence of each
    distinct value per series."""
    gf = GTSFrame.fetch(canonical_points(spark, sf_dir)).valuededup()
    return gf.df.select(
        "class", F.element_at("labels", F.lit("user")).alias("user"), "ts", "v_double"
    )


@register("timescale_monotonic", (
    # trunc(): Spark's double→long cast truncates while DuckDB's rounds
    f"WITH {PTS}, s AS (SELECT class, \"user\", CAST(trunc(ts * 0.001) AS BIGINT) AS ts, v FROM pts) "
    'SELECT class, "user", ts, max(v) OVER (PARTITION BY class, "user" ORDER BY ts, v '
    "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS v_mono FROM s"
))
def timescale_monotonic(spark, sf_dir):
    """TIMESCALE (×0.001, µs→ms axis) then MONOTONIC running max."""
    gf = GTSFrame.fetch(canonical_points(spark, sf_dir)).timescale(0.001)
    out = _reshape.monotonic(gf.df.withColumn("_o", F.col("v_double")))
    # deterministic tie-break on equal scaled ticks: order by (ts, v)
    from pyspark.sql import Window

    w = Window.partitionBy("gts_id").orderBy("ts", "v_double").rowsBetween(Window.unboundedPreceding, 0)
    out = gf.df.withColumn("v_mono", F.max("v_double").over(w))
    return out.select(
        "class", F.element_at("labels", F.lit("user")).alias("user"), "ts", "v_mono"
    )
