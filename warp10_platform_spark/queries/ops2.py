"""Second operator sweep: entropy/top-k/mode aggregators, true course,
dot-product and strict mappers, literal series construction/editing.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from warp10_platform_spark.core.construct import addvalue, makegts, removetick
from warp10_platform_spark.core.frame import GTSFrame
from warp10_platform_spark.functions.custom import macro_mapper
from warp10_platform_spark.operators import geo as _geo
from warp10_platform_spark.operators.mapper import dotproduct_mapper
from warp10_platform_spark.queries import register
from warp10_platform_spark.core import timeunits as tu
from warp10_platform_spark.queries.custom import _wmean
from warp10_platform_spark.queries.gts import DAILY, DAY, LASTBUCKET, NDAYS, PTS, _bucketized
from warp10_platform_spark.queries.geo import _LAT_SQL, _LON_SQL, _with_coords
from warp10_platform_spark.sources.tables import canonical_points, events_points


@register("entropy_daily", (
    f"WITH {PTS}, {DAILY}, "
    'c AS (SELECT class, "user", ts, v, count(*) AS c FROM daily GROUP BY class, "user", ts, v), '
    'n AS (SELECT class, "user", ts, sum(c) AS n FROM c GROUP BY class, "user", ts), '
    'e AS (SELECT c.class, c."user", c.ts, '
    "      list((c.c::DOUBLE / n.n) * ln(c.c::DOUBLE / n.n) ORDER BY c.v) AS terms "
    '      FROM c JOIN n ON c.class = n.class AND c."user" = n."user" AND c.ts = n.ts '
    '      GROUP BY c.class, c."user", c.ts) '
    'SELECT class, "user", ts, round(-list_reduce(terms, (a, b) -> a + b), 6) + 0.0 AS v_agg FROM e'
))
def entropy_daily(spark, sf_dir):
    """bucketizer.shannonentropy (aggregator/ShannonEntropy.java:33):
    -(Σ p ln p) over each day's value distribution, folded in sorted-value
    order on both engines."""
    gf = _bucketized(spark, sf_dir, "bucketizer.shannonentropy")
    return gf.df.select(
        "class",
        F.get_json_object("labels_key", "$[0].value").alias("user"),
        "ts",
        # + 0.0 folds IEEE -0.0 (single-value buckets) to +0.0 on both engines.
        (F.round("v_agg", 6) + F.lit(0.0)).alias("v_agg"),
    )


@register("bucketize_highest3", (
    f"WITH {PTS}, {DAILY}, "
    't AS (SELECT class, "user", ts, list(v ORDER BY v DESC)[1:3] AS top3 FROM daily GROUP BY class, "user", ts) '
    "SELECT class, \"user\", ts, array_to_string(top3, ',') AS top3 FROM t"
))
def bucketize_highest3(spark, sf_dir):
    """bucketizer.highest k=3 (aggregator/Highest.java:29): top-k values
    per bucket, joined to a string for cross-engine array compare."""
    gf = _bucketized(spark, sf_dir, "bucketizer.highest", p=3)
    return gf.df.select(
        "class",
        F.get_json_object("labels_key", "$[0].value").alias("user"),
        "ts",
        F.array_join(F.col("v_agg").cast("array<string>"), ",").alias("top3"),
    )


@register("mode_daily", (
    f"WITH {PTS}, {DAILY}, "
    'c AS (SELECT class, "user", ts, v, count(*) AS c FROM daily GROUP BY class, "user", ts, v), '
    "r AS (SELECT *, row_number() OVER (PARTITION BY class, \"user\", ts ORDER BY c DESC, v ASC) AS rk FROM c) "
    'SELECT class, "user", ts, v AS v_agg FROM r WHERE rk = 1'
))
def mode_daily(spark, sf_dir):
    """MODE (functions/MODE.java) as a reusable bucketizer — most frequent
    value per bucket, smallest-value tie-break (deterministic)."""
    gf = _bucketized(spark, sf_dir, "bucketizer.mode")
    return gf.df.select(
        "class",
        F.get_json_object("labels_key", "$[0].value").alias("user"),
        "ts",
        F.col("v_agg"),
    )


_TC_SQL = (
    "degrees(atan2(sin(radians(lon - plon)) * cos(radians(lat)), "
    "cos(radians(plat)) * sin(radians(lat)) - sin(radians(plat)) * cos(radians(lat)) * cos(radians(lon - plon))))"
)


@register("geo_truecourse", (
    f"WITH {PTS}, "
    f'c AS (SELECT class, "user", ts, {_LAT_SQL} AS lat, {_LON_SQL} AS lon FROM pts), '
    'l AS (SELECT class, "user", ts, lat, lon, lag(lat) OVER w AS plat, lag(lon) OVER w AS plon '
    '      FROM c WINDOW w AS (PARTITION BY class, "user" ORDER BY ts)) '
    f"SELECT class, \"user\", ts, round(({_TC_SQL} + 360.0) % 360.0, 3) AS course_deg "
    "FROM l WHERE plat IS NOT NULL"
))
def geo_truecourse(spark, sf_dir):
    """TRUECOURSE (aggregator/TrueCourse.java:38): per-segment initial
    bearing along the synthetic track."""
    out = _geo.truecourse(_with_coords(spark, sf_dir))
    return out.where(F.col("course_deg").isNotNull()).select(
        "class",
        F.element_at("labels", F.lit("user")).alias("user"),
        "ts",
        F.round("course_deg", 3).alias("course_deg"),
    )


@register("dotproduct_smooth", (
    f"WITH {PTS}, "
    'l AS (SELECT class, "user", ts, lag(v) OVER w AS l1, v, lead(v) OVER w AS n1 '
    '      FROM pts WINDOW w AS (PARTITION BY class, "user" ORDER BY ts)) '
    'SELECT class, "user", ts, round(0.0 + l1 * 0.25 + v * 0.5 + n1 * 0.25, 6) AS v_mapped '
    "FROM l WHERE l1 IS NOT NULL AND n1 IS NOT NULL"
))
def dotproduct_smooth(spark, sf_dir):
    """mapper.dotproduct (MapperDotProduct.java:34): [0.25, 0.5, 0.25]
    binomial smoothing over a [1 pre, 1 post] frame; null at edges where
    the frame is shorter than the weight vector."""
    out = dotproduct_mapper(canonical_points(spark, sf_dir), [0.25, 0.5, 0.25], pre=1, post=1)
    return out.where(F.col("v_mapped").isNotNull()).select(
        "class",
        F.element_at("labels", F.lit("user")).alias("user"),
        "ts",
        F.round("v_mapped", 6).alias("v_mapped"),
    )


@register("strict_wmean", (
    # the macro_wmean oracle restricted to full 5-point frames
    f"WITH {PTS}, "
    "w AS (SELECT class, \"user\", ts, "
    "      lag(ts, 2) OVER win AS m2_ts, lag(v, 2) OVER win AS m2_v, "
    "      lag(ts, 1) OVER win AS m1_ts, lag(v, 1) OVER win AS m1_v, "
    "      ts AS c0_ts, v AS c0_v, "
    "      lead(ts, 1) OVER win AS p1_ts, lead(v, 1) OVER win AS p1_v, "
    "      lead(ts, 2) OVER win AS p2_ts, lead(v, 2) OVER win AS p2_v "
    "      FROM pts WINDOW win AS (PARTITION BY class, \"user\" ORDER BY ts)) "
    "SELECT class, \"user\", ts, round(("
    + " + ".join(
        f"(1.0 / (1.0 + abs(CAST({o}_ts - ts AS DOUBLE)) / {float(tu.UNITS_PER_S)})) * {o}_v"
        for o in ("m2", "m1", "c0", "p1", "p2")
    )
    + ") / ("
    + " + ".join(
        f"1.0 / (1.0 + abs(CAST({o}_ts - ts AS DOUBLE)) / {float(tu.UNITS_PER_S)})" for o in ("m2", "m1", "c0", "p1", "p2")
    )
    + "), 6) AS v_mapped FROM w WHERE m2_ts IS NOT NULL AND p2_ts IS NOT NULL"
))
def strict_wmean(spark, sf_dir):
    """STRICTMAPPER (mapper/STRICTMAPPER.java): the macro weighted mean
    with min_points=5 — edge frames yield no output point."""
    out = macro_mapper(canonical_points(spark, sf_dir), _wmean, pre=2, post=2, min_points=5)
    # pandas NaN arrives as SQL NULL through Arrow — strict frames emit no point
    return out.where(F.col("v_mapped").isNotNull()).select(
        "class",
        F.get_json_object("labels_key", "$[0].value").alias("user"),
        "ts",
        F.round("v_mapped", 6).alias("v_mapped"),
    )


@register("makegts_edit", (
    "SELECT * FROM (VALUES "
    "('sensor.temp', '1', 1000000, 20.5), "
    "('sensor.temp', '1', 2000000, 21.0), "
    "('sensor.temp', '1', 3000000, -5.0)"
    ") AS t(class, site, ts, v_double)"
))
def makegts_edit(spark, sf_dir):
    """MAKEGTS + ADDVALUE(SETVALUE) + REMOVETICK (MAKEGTS.java:33 et al.):
    literal construction and point editing."""
    pts = makegts(spark, "sensor.temp", {"site": "1"}, [1_000_000, 2_000_000, 4_000_000], [20.5, 99.0, 7.0])
    pts = addvalue(pts, spark, "sensor.temp", {"site": "1"}, 2_000_000, 21.0)  # overwrite
    pts = addvalue(pts, spark, "sensor.temp", {"site": "1"}, 3_000_000, -5.0)  # new tick
    pts = removetick(pts, "sensor.temp", '[{"key":"site","value":"1"}]', 4_000_000)
    return pts.select(
        "class", F.element_at("labels", F.lit("site")).alias("site"), "ts", "v_double"
    )


@register("map_csum_chunked", (
    f"WITH {PTS} SELECT class, \"user\", ts, CAST(round(sum(v::DECIMAL(28,10)) OVER ("
    '  PARTITION BY class, "user" ORDER BY ts ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW'
    "), 6) AS DOUBLE) AS v_mapped FROM pts"
))
def map_csum_chunked(spark, sf_dir):
    """Chunked mapper.csum — the 100 TB-safe running sum: weekly chunks
    bound window state; exact DECIMAL addition makes it equal the plain
    single-window csum bit-for-bit (same oracle as map_csum)."""
    from warp10_platform_spark.operators.mapper import map_csum_chunked as _csum

    WEEK = tu.us(7 * 86_400_000_000)
    pts = canonical_points(spark, sf_dir).withColumn("v_double", F.col("v_double").cast("decimal(28,10)"))
    out = _csum(pts, WEEK)
    return out.select(
        "class",
        F.element_at("labels", F.lit("user")).alias("user"),
        "ts",
        F.round("v_mapped", 6).cast("double").alias("v_mapped"),
    )


@register("map_imposed_ticks", (
    f"WITH {PTS}, "
    "series AS (SELECT DISTINCT class, \"user\" FROM pts), "
    f"ticks AS (SELECT unnest([{tu.us(1704844800000000)}, {tu.us(1705449600000000)}, {tu.us(1706054400000000)}]) AS t), "
    "g AS (SELECT s.class, s.\"user\", k.t FROM series s, ticks k) "
    "SELECT g.class, g.\"user\", g.t AS ts, "
    f"  CAST(round(coalesce(sum(p.v::DECIMAL(28,10)) FILTER (WHERE p.ts >= g.t - {tu.us(86400000000)} AND p.ts <= g.t), 0), 6) AS DOUBLE) AS v_mapped "
    "FROM g LEFT JOIN pts p ON p.class = g.class AND p.\"user\" = g.\"user\" "
    "GROUP BY g.class, g.\"user\", g.t"
))
def map_imposed_ticks(spark, sf_dir):
    """MAP with imposed output ticks (GTSHelper.map:6295): 1-day trailing
    sum evaluated at three explicit ticks per series."""
    from warp10_platform_spark.operators.mapper import map_at_ticks

    DAY_US = tu.us(86_400_000_000)
    pts = canonical_points(spark, sf_dir).withColumn("v_double", F.col("v_double").cast("decimal(28,10)"))
    out = map_at_ticks(
        pts, "sum", [tu.us(1704844800000000), tu.us(1705449600000000), tu.us(1706054400000000)], pre_us=DAY_US, post_us=0
    )
    return out.select(
        "class",
        F.element_at("labels", F.lit("user")).alias("user"),
        "ts",
        F.round(F.coalesce(F.col("v_mapped"), F.lit(0)), 6).cast("double").alias("v_mapped"),
    )
