"""§2.10 analytics queries: regression, correlation, smoothing, outlier
tests, decomposition, spectra, SAX.

JVM-exact ops carry full DuckDB oracles; the sequential numpy ops
(STL/LOWESS/FFT/DTW/ESD/Grubbs — iterative per-series algorithms DuckDB
cannot replicate deterministically) register rows-only.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from warp10_platform_spark.analytics import fit as _fit
from warp10_platform_spark.analytics import sax as _sax
from warp10_platform_spark.analytics import stats as _stats
from warp10_platform_spark.queries import register
from warp10_platform_spark.queries.gts import DAILY, DAY, LASTBUCKET, NDAYS, PTS, _bucketized
from warp10_platform_spark.sources.tables import events_points

_USER = 'get_json_object(labels_key, "$[0].value")'


def _user():
    return F.get_json_object("labels_key", "$[0].value").alias("user")


LR_ORACLE = f"""
WITH {PTS},
b AS (SELECT class, "user", ts - min(ts) OVER (PARTITION BY class, "user") AS x,
             CAST(v AS DECIMAL(12,6)) AS y FROM pts),
mom AS (
  SELECT class, "user", count(*) AS n, sum(x) AS sx,
         CAST(sum(CAST(x AS DECIMAL(38,0)) * x) AS DOUBLE) AS sxx,
         CAST(sum(y) AS DOUBLE) AS sy,
         CAST(sum(CAST(x AS DECIMAL(20,0)) * y) AS DOUBLE) AS sxy
  FROM b GROUP BY class, "user"
)
SELECT class, "user",
       round((n * sxy - sx * sy) / (n * sxx - CAST(sx AS DOUBLE) * sx) * 1000000.0, 6) + 0.0 AS slope,
       round((sy - (n * sxy - sx * sy) / (n * sxx - CAST(sx AS DOUBLE) * sx) * sx) / n, 6) + 0.0 AS intercept
FROM mom WHERE n >= 2
"""


@register("lr_slope", LR_ORACLE)
def lr_slope(spark, sf_dir):
    """LR (functions/LR.java): per-series least-squares value~time line,
    exact integer/decimal accumulators → engine-independent double."""
    out = _fit.lr_fit(events_points(spark, sf_dir))
    return out.select(
        "class",
        _user(),
        # + 0.0 normalizes IEEE -0.0 to +0.0 (matches the oracle's `+ 0.0`;
        # the driver's value hash is sign-bit-sensitive).
        (F.round("slope", 6) + F.lit(0.0)).alias("slope"),
        (F.round("intercept", 6) + F.lit(0.0)).alias("intercept"),
    )


CORR_ORACLE = f"""
WITH {PTS}, {DAILY},
c AS (SELECT class, "user", ts, CAST(count(*) AS DECIMAL(12,6)) AS n FROM daily GROUP BY class, "user", ts),
a AS (SELECT "user", ts, n FROM c WHERE class = 'events.click'),
b AS (SELECT "user", ts, n FROM c WHERE class = 'events.view'),
j AS (SELECT a."user", a.n AS va, b.n AS vb FROM a JOIN b ON a."user" = b."user" AND a.ts = b.ts),
mom AS (
  SELECT "user", count(*) AS n,
         CAST(sum(va) AS DOUBLE) AS sa, CAST(sum(vb) AS DOUBLE) AS sb,
         CAST(sum(va * va) AS DOUBLE) AS saa, CAST(sum(vb * vb) AS DOUBLE) AS sbb,
         CAST(sum(va * vb) AS DOUBLE) AS sab
  FROM j GROUP BY "user"
)
SELECT "user", n,
       round((sab - sa * sb / n) / sqrt((saa - sa * sa / n) * (sbb - sb * sb / n)), 6) AS corr
FROM mom WHERE n >= 2 AND (saa - sa * sa / n) > 0 AND (sbb - sb * sb / n) > 0
"""


@register("correlate_pearson", CORR_ORACLE)
def correlate_pearson(spark, sf_dir):
    """CORRELATE: Pearson corr between each user's daily click and view
    counts on common days — exact decimal moments."""
    a = _bucketized(spark, sf_dir, "bucketizer.count")
    ad = a.df.where(F.col("class") == "events.click").withColumn("v_agg", F.col("v_agg").cast("decimal(12,6)"))
    bd = a.df.where(F.col("class") == "events.view").withColumn("v_agg", F.col("v_agg").cast("decimal(12,6)"))
    out = _fit.correlate_daily(ad, bd)
    return out.select(_user(), "n", F.round("corr", 6).alias("corr"))


EXP_ORACLE = f"""
WITH {PTS},
per AS (
  SELECT class, "user", list(v ORDER BY ts, v) AS vs FROM pts GROUP BY class, "user"
)
SELECT class, "user",
       round(list_reduce(vs, (acc, x) -> acc * 0.7::DOUBLE + x * 0.3::DOUBLE), 6) AS s_last
FROM per
"""


@register("exp_smooth_last", EXP_ORACLE)
def exp_smooth_last(spark, sf_dir):
    """Single exponential smoothing final state (α=0.3) — sequential IEEE
    recurrence, identical fold order in both engines."""
    out = _fit.exp_smooth_last(events_points(spark, sf_dir), alpha=0.3)
    return out.select("class", _user(), F.round("s_last", 6).alias("s_last"))


SAX_ORACLE = f"""
WITH {PTS},
b AS (SELECT class, "user", CAST(v AS DECIMAL(12,6)) AS y,
             row_number() OVER (PARTITION BY class, "user" ORDER BY ts, v) - 1 AS r,
             count(*) OVER (PARTITION BY class, "user") AS n
      FROM pts),
segs AS (SELECT class, "user", n, (r * 8) // n AS seg, sum(y) AS ssum, count(*) AS scnt
         FROM b GROUP BY class, "user", n, seg),
stats AS (SELECT class, "user", CAST(sum(ssum) AS DOUBLE) AS s1 FROM segs GROUP BY class, "user"),
sq AS (SELECT class, "user", CAST(sum(CAST(v AS DECIMAL(12,6)) * CAST(v AS DECIMAL(12,6))) AS DOUBLE) AS s2,
              count(*) AS cnt
       FROM pts GROUP BY class, "user"),
z AS (
  SELECT g.class, g."user", g.seg,
         (CAST(g.ssum AS DOUBLE) / g.scnt - st.s1 / sq.cnt)
         / sqrt((sq.s2 - st.s1 * st.s1 / sq.cnt) / (sq.cnt - 1)) AS zz
  FROM segs g JOIN stats st ON g.class = st.class AND g."user" = st."user"
              JOIN sq ON g.class = sq.class AND g."user" = sq."user"
)
SELECT class, "user",
       string_agg(CASE WHEN zz <= -0.6745 THEN 'a' WHEN zz <= 0.0 THEN 'b'
                       WHEN zz <= 0.6745 THEN 'c' ELSE 'd' END, '' ORDER BY seg) AS sax_word
FROM z GROUP BY class, "user"
"""


@register("sax_words", SAX_ORACLE)
def sax_words(spark, sf_dir):
    """PATTERNS/SAX (PATTERNS.java:32): one 8-letter SAX word per series,
    alphabet 4 — z-scores from exact sums so binning is reproducible."""
    out = _sax.sax_words(events_points(spark, sf_dir), w=8, alphabet=4)
    return out.select("class", _user(), "sax_word")


@register("grubbs_outliers")  # iterative t-quantile algorithm → rows-only
def grubbs_outliers(spark, sf_dir):
    """GRUBBSTEST (GTSOutliersHelper.grubbsTest:260) at α=0.05 per series."""
    out = _stats.grubbs_test(events_points(spark, sf_dir), alpha=0.05)
    return out.select("class", _user(), "ts", "v_outlier")


@register("esd_outliers")  # iterative t-quantile algorithm → rows-only
def esd_outliers(spark, sf_dir):
    """ESDTEST (GTSOutliersHelper.ESDTest:329): generalized ESD, k=5."""
    out = _stats.esd_test(events_points(spark, sf_dir), k=5, alpha=0.05)
    return out.select("class", _user(), "ts", "v_outlier")


@register("stl_decompose")  # iterative loess → rows-only
def stl_decompose(spark, sf_dir):
    """STL (STL.java:36): trend/seasonal/resid of daily-mean series,
    weekly period (7 buckets)."""
    b = _bucketized(spark, sf_dir, "bucketizer.mean")
    out = _fit.stl_decompose(b.df, period=7, value_col="v_agg")
    return out.select("class", _user(), "ts", "trend", "seasonal", "resid")


@register("lowess_smooth")  # local regression (numpy) → rows-only
def lowess_smooth(spark, sf_dir):
    """LOWESS (LOWESS.java:36): tricube local linear smoothing, frac 0.3."""
    out = _fit.lowess_smooth(events_points(spark, sf_dir), frac=0.3)
    return out.select("class", _user(), "ts", "v_smooth")


@register("fft_top_bins")  # numpy rfft → rows-only
def fft_top_bins(spark, sf_dir):
    """FFT (continuum/gts/FFT.java): top-3 magnitude bins of the daily
    count series per user."""
    b = _bucketized(spark, sf_dir, "bucketizer.count")
    out = _fit.fft_top(b.df, k=3, value_col="v_agg")
    return out.select("class", _user(), "freq_bin", "magnitude")


@register("dtw_daily")  # DP recurrence (numpy) → rows-only
def dtw_daily(spark, sf_dir):
    """DTW (DTW.java:35): pairwise warped distance between users' daily
    purchase-count profiles."""
    b = _bucketized(spark, sf_dir, "bucketizer.count")
    purchases = b.df.where(F.col("class") == "events.purchase")
    return _fit.dtw_pairs(purchases, value_col="v_agg", window=3)
