"""Coverage sweep 6 — analytics II: sliding cross-correlation (CORRELATE),
SAX pattern detection (PATTERNDETECTION), one Haar wavelet level (FDWT),
streaming retention caps as batch ops (MAXTICK/MAXTIMESLIDINGWINDOW),
and deterministic SHUFFLE + UNIQUE.

Reference: continuum/gts/CORRELATE.java, functions/PATTERNDETECTION.java:32
(+ script/SAXUtils.java), script/fwt/ (forward wavelet transform),
functions/MaxTickSlidingWindow.java:24 / MaxTimeSlidingWindow.java:24,
functions/SHUFFLE.java, functions/UNIQUE.java:32.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from warp10_platform_spark.analytics import fit as _fit
from warp10_platform_spark.operators import reshape as _reshape
from warp10_platform_spark.queries import register
from warp10_platform_spark.core import timeunits as tu
from warp10_platform_spark.queries.gts import DAILY, DAY, LASTBUCKET, NDAYS, PTS, _bucketized, _bucketized_decimal_mean
from warp10_platform_spark.sources.tables import canonical_points, events_points

def _USER():
    return F.get_json_object("labels_key", "$[0].value").alias("user")

# Daily event counts per class (all users folded together) — a small
# per-class series pair for lag analysis.
_CLASS_DAILY = (
    'cd AS (SELECT class, ts, CAST(count(*) AS DOUBLE) AS v FROM daily GROUP BY class, ts)'
)


@register("correlate_sliding", (
    f"WITH {PTS}, {DAILY}, {_CLASS_DAILY}, "
    # counts are integral: scale-0 decimals keep the moment sums exact
    # while their squares stay inside DuckDB's INT64 unscaled arithmetic
    # (scale-6 squares overflow at sf1 magnitudes)
    "a AS (SELECT ts, v::DECIMAL(18,0) AS va FROM cd WHERE class = 'events.purchase'), "
    "b AS (SELECT ts, v::DECIMAL(18,0) AS vb FROM cd WHERE class = 'events.click'), "
    "lags AS (SELECT unnest([-2, -1, 0, 1, 2]) AS lag), "
    f"j AS (SELECT lag, va, vb FROM a JOIN (SELECT lag, ts + lag * {DAY} AS ts, vb FROM b, lags) s USING (ts)), "
    "m AS (SELECT lag, count(*) AS n, "
    "             CAST(sum(va) AS DOUBLE) AS sa, CAST(sum(vb) AS DOUBLE) AS sb, "
    "             CAST(sum(va * va) AS DOUBLE) AS saa, CAST(sum(vb * vb) AS DOUBLE) AS sbb, "
    "             CAST(sum(va * vb) AS DOUBLE) AS sab FROM j GROUP BY lag) "
    "SELECT lag, n, round((sab - sa * sb / n) / sqrt((saa - sa * sa / n) * (sbb - sb * sb / n)), 6) AS corr "
    "FROM m WHERE n >= 2 AND (saa - sa * sa / n) > 0 AND (sbb - sb * sb / n) > 0"
))
def correlate_sliding(spark, sf_dir):
    """CORRELATE (continuum/gts/CORRELATE.java): sliding cross-correlation
    of the daily purchase-count series against the click-count series at
    lags −2..+2 days — one exploded join, exact DECIMAL moment sums."""
    counts = _bucketized(spark, sf_dir, "bucketizer.count")
    base = counts.df.groupBy("class", "ts").agg(
        F.sum("v_agg").cast("double").alias("v"), F.lit("{}").alias("labels_key")
    )
    a = base.where(F.col("class") == "events.purchase")
    b = base.where(F.col("class") == "events.click")
    out = _fit.correlate_lagged(a, b, lags=[-2, -1, 0, 1, 2], step_us=DAY,
                                value_col="v", decimal_type="decimal(18,0)")
    return out.select("lag", "n", F.round("corr", 6).alias("corr"))


_BRK = (-0.6745, 0.0, 0.6745)  # alphabet-4 gaussian breakpoints (SAXUtils)


def _sax_letter_sql(z: str) -> str:
    return (
        f"CASE WHEN {z} < {_BRK[0]} THEN 'a' WHEN {z} < {_BRK[1]} THEN 'b' "
        f"WHEN {z} < {_BRK[2]} THEN 'c' ELSE 'd' END"
    )


_PAT_WIN = (
    "w AS (SELECT class, \"user\", ts, v, "
    "             lead(v, 1) OVER win AS v1, lead(v, 2) OVER win AS v2, lead(v, 3) OVER win AS v3 "
    "      FROM dm WINDOW win AS (PARTITION BY class, \"user\" ORDER BY ts)), "
    "z AS (SELECT class, \"user\", ts, (v + v1 + v2 + v3) / 4.0 AS m, "
    "             sqrt(((v - (v + v1 + v2 + v3) / 4.0) * (v - (v + v1 + v2 + v3) / 4.0) "
    "                 + (v1 - (v + v1 + v2 + v3) / 4.0) * (v1 - (v + v1 + v2 + v3) / 4.0) "
    "                 + (v2 - (v + v1 + v2 + v3) / 4.0) * (v2 - (v + v1 + v2 + v3) / 4.0) "
    "                 + (v3 - (v + v1 + v2 + v3) / 4.0) * (v3 - (v + v1 + v2 + v3) / 4.0)) / 4.0) AS sd, "
    "             v, v1, v2, v3 "
    "      FROM w WHERE v3 IS NOT NULL)"
)


@register("patterns_match", (
    f"WITH {PTS}, {DAILY}, "
    'dm AS (SELECT class, "user", ts, round(CAST(sum(v::DECIMAL(28,10)) AS DOUBLE) / count(v), 6) AS v '
    '       FROM daily GROUP BY class, "user", ts), '
    f"{_PAT_WIN}, "
    "words AS (SELECT class, \"user\", ts, "
    f"   {_sax_letter_sql('CASE WHEN sd = 0 THEN 0.0 ELSE (v - m) / sd END')} || "
    f"   {_sax_letter_sql('CASE WHEN sd = 0 THEN 0.0 ELSE (v1 - m) / sd END')} || "
    f"   {_sax_letter_sql('CASE WHEN sd = 0 THEN 0.0 ELSE (v2 - m) / sd END')} || "
    f"   {_sax_letter_sql('CASE WHEN sd = 0 THEN 0.0 ELSE (v3 - m) / sd END')} AS word "
    "   FROM z) "
    "SELECT class, \"user\" AS user, ts, word FROM words WHERE word LIKE 'a%d'"
))
def patterns_match(spark, sf_dir):
    """PATTERNDETECTION (functions/PATTERNDETECTION.java:32, SAXUtils):
    slide a 4-bucket window over each daily-mean series, z-normalize per
    window, SAX-discretize (alphabet 4), emit ticks whose word matches
    the rising pattern 'a..d' — all JVM exprs, letter thresholds shared
    bit-for-bit with the oracle."""
    dm = _bucketized_decimal_mean(spark, sf_dir)
    w = Window.partitionBy("class", "labels_key").orderBy("ts")
    d = dm.select("class", "labels_key", "ts", F.col("v_agg").alias("v"))
    d = (
        d.withColumn("v1", F.lead("v", 1).over(w))
        .withColumn("v2", F.lead("v", 2).over(w))
        .withColumn("v3", F.lead("v", 3).over(w))
        .where(F.col("v3").isNotNull())
    )
    m = (F.col("v") + F.col("v1") + F.col("v2") + F.col("v3")) / 4.0
    var = (
        (F.col("v") - m) * (F.col("v") - m)
        + (F.col("v1") - m) * (F.col("v1") - m)
        + (F.col("v2") - m) * (F.col("v2") - m)
        + (F.col("v3") - m) * (F.col("v3") - m)
    ) / 4.0
    sd = F.sqrt(var)

    def letter(vc):
        z = F.when(sd == 0, F.lit(0.0)).otherwise((vc - m) / sd)
        return (
            F.when(z < _BRK[0], "a").when(z < _BRK[1], "b").when(z < _BRK[2], "c").otherwise("d")
        )

    word = F.concat(letter(F.col("v")), letter(F.col("v1")), letter(F.col("v2")), letter(F.col("v3")))
    return (
        d.select("class", _USER(), "ts", word.alias("word"))
        .where(F.col("word").like("a%d"))
    )


@register("dwt_haar", (
    f"WITH {PTS}, {DAILY}, "
    'dm AS (SELECT class, "user", ts, round(CAST(sum(v::DECIMAL(28,10)) AS DOUBLE) / count(v), 6) AS v '
    '       FROM daily GROUP BY class, "user", ts), '
    'idx AS (SELECT class, "user", v, row_number() OVER (PARTITION BY class, "user" ORDER BY ts) - 1 AS i FROM dm), '
    'pairs AS (SELECT class, "user", i // 2 AS k, '
    "                 max(CASE WHEN i % 2 = 0 THEN v END) AS v0, "
    "                 max(CASE WHEN i % 2 = 1 THEN v END) AS v1 "
    '          FROM idx GROUP BY class, "user", i // 2) '
    'SELECT class, "user" AS user, k, '
    "       round((v0 + v1) / 1.4142135623730951, 6) AS approx, "
    "       round((v0 - v1) / 1.4142135623730951, 6) AS detail "
    "FROM pairs WHERE v1 IS NOT NULL"
))
def dwt_haar(spark, sf_dir):
    """FDWT, one Haar level (script/fwt/): pairwise (sum, diff)/√2 over
    each daily-mean series — identical arithmetic on both sides, so the
    compare is bit-exact after round(6)."""
    dm = _bucketized_decimal_mean(spark, sf_dir)
    out = _fit.haar_dwt_level1(dm, value_col="v_agg")
    return out.select(
        "class", _USER(), "k", F.round("approx", 6).alias("approx"), F.round("detail", 6).alias("detail")
    )


@register("sliding_retention_caps", (
    f"WITH {PTS}, "
    "last5 AS (SELECT class, \"user\", ts, "
    "                 row_number() OVER (PARTITION BY class, \"user\" ORDER BY ts DESC, event_id DESC) AS rn "
    "          FROM (SELECT class, \"user\", ts, event_id FROM (SELECT 'events.' || event_type AS class, "
    f"                CAST(user_id AS VARCHAR) AS \"user\", {tu.duck_epoch('ts')} AS ts, event_id FROM events) q)), "
    "t3 AS (SELECT class, \"user\", ts, max(ts) OVER (PARTITION BY class, \"user\") AS mx FROM pts) "
    "SELECT a.class, a.\"user\" AS user, a.n_last5, b.n_3d FROM "
    "(SELECT class, \"user\", count(*) AS n_last5 FROM last5 WHERE rn <= 5 GROUP BY class, \"user\") a "
    "JOIN "
    f"(SELECT class, \"user\", count(*) AS n_3d FROM t3 WHERE ts > mx - {3 * DAY} GROUP BY class, \"user\") b "
    "ON a.class = b.class AND a.\"user\" = b.\"user\""
))
def sliding_retention_caps(spark, sf_dir):
    """MAXTICKSLIDINGWINDOW + MAXTIMESLIDINGWINDOW
    (functions/MaxTickSlidingWindow.java:24, MaxTimeSlidingWindow.java:24):
    per-series retention caps — last 5 points and last 3 days — as batch
    operators; output is the kept-count per series for both policies."""
    pts = canonical_points(spark, sf_dir)
    user = F.element_at("labels", "user").alias("user")
    by_n = _reshape.max_tick_sliding_window(pts, 5).groupBy("class", user).agg(
        F.count("*").alias("n_last5")
    )
    by_t = _reshape.max_time_sliding_window(pts, 3 * DAY).groupBy("class", user).agg(
        F.count("*").alias("n_3d")
    )
    return by_n.join(by_t, on=["class", "user"])


@register("shuffle_unique", (
    "WITH h AS (SELECT event_type, event_id, "
    "                  md5('mix:' || CAST(event_id AS VARCHAR)) AS hk FROM events), "
    "r AS (SELECT event_type, event_id, row_number() OVER (PARTITION BY event_type ORDER BY hk) AS rn FROM h), "
    "u AS (SELECT event_type, count(DISTINCT CAST(trunc(value * 10) AS BIGINT)) AS n_unique "
    "      FROM (SELECT event_type, value FROM events) e GROUP BY event_type) "
    "SELECT r.event_type, r.event_id AS pick, r.rn, u.n_unique "
    "FROM r JOIN u USING (event_type) WHERE r.rn <= 3"
))
def shuffle_unique(spark, sf_dir):
    """SHUFFLE + UNIQUE (functions/SHUFFLE.java, UNIQUE.java:32):
    deterministic shuffle — order by a keyed md5 so every engine and
    partitioning draws the same permutation — take 3 per class, plus the
    distinct count of decimated values (UNIQUE)."""
    from warp10_platform_spark.sources.tables import load_table

    ev = load_table(spark, sf_dir, "events")
    hk = F.md5(F.concat(F.lit("mix:"), F.col("event_id").cast("string")))
    w = Window.partitionBy("event_type").orderBy(hk)
    r = (
        ev.select("event_type", "event_id", hk.alias("hk"))
        .withColumn("rn", F.row_number().over(Window.partitionBy("event_type").orderBy("hk")))
        .where(F.col("rn") <= 3)
    )
    u = ev.groupBy("event_type").agg(
        F.countDistinct((F.col("value") * 10).cast("bigint")).alias("n_unique")
    )
    return r.join(u, on="event_type").select(
        "event_type", F.col("event_id").alias("pick"), "rn", "n_unique"
    )
