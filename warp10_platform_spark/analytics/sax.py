"""SAX — symbolic aggregate approximation (functions/PATTERNS.java:32,
PATTERNDETECTION.java; Lin et al.'s public SAX construction).

z-normalize per series → PAA (piecewise aggregate approximation, w equal
row-count segments) → map segment means to alphabet letters at the
standard-normal breakpoints. Everything from exact DECIMAL/BIGINT sums +
deterministic double assembly: pure Column expressions, whole-stage
codegen, and bit-for-bit reproducible in a SQL oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

SERIES_KEYS = ["gts_id", "class", "labels_key"]

# Standard normal breakpoints for alphabet sizes 3..6 (public SAX tables).
BREAKPOINTS = {
    3: [-0.43, 0.43],
    4: [-0.6745, 0.0, 0.6745],
    5: [-0.84, -0.25, 0.25, 0.84],
    6: [-0.97, -0.43, 0.0, 0.43, 0.97],
}
_ALPHA = "abcdef"


def sax_words(df: DataFrame, w: int = 8, alphabet: int = 4, value_col: str = "v_double") -> DataFrame:
    """One SAX word per series: w letters over the tick-ordered values.

    Segment of row i (0-based rank r of n): floor(r*w/n) — equal-count
    PAA. Letter thresholds compare (paa_mean - μ)/σ with μ,σ assembled
    from exact decimal sums, so the binning is engine-reproducible."""
    bps = BREAKPOINTS[alphabet]
    d = F.col(value_col).cast("decimal(12,6)")
    wS = Window.partitionBy("gts_id")
    wO = Window.partitionBy("gts_id").orderBy("ts", value_col)
    base = df.select(
        *SERIES_KEYS,
        d.alias("y"),
        (F.row_number().over(wO) - 1).alias("r"),
        F.count("*").over(wS).alias("n"),
    )
    seg = F.floor(F.col("r") * w / F.col("n")).alias("seg")
    segs = base.select(*SERIES_KEYS, "n", seg, F.col("y")).groupBy(*SERIES_KEYS, "n", "seg").agg(
        F.sum("y").alias("ssum"), F.count("*").alias("scnt")
    )
    # series-level μ/σ from the same exact segment sums (re-aggregated).
    stats = segs.groupBy(*SERIES_KEYS).agg(F.sum("ssum").cast("double").alias("s1"))
    sq = df.groupBy("gts_id").agg(
        F.sum(d * d).cast("double").alias("s2"), F.count("*").alias("cnt")
    )
    joined = segs.join(stats, on=SERIES_KEYS).join(sq, on="gts_id")
    n = F.col("cnt").cast("double")
    mu = F.col("s1") / n
    # Degenerate series (one point, or zero variance) have no z-scale:
    # pin z = 0 → the middle letter, deterministically on both engines
    # (unguarded, ANSI Spark raises DIVIDE_BY_ZERO — found by the r5
    # skew mirror, where the fat-series remap left one-point series).
    ss = F.col("s2") - F.col("s1") * F.col("s1") / n
    z = F.when(
        (F.col("cnt") > 1) & (ss > 0),
        (F.col("ssum").cast("double") / F.col("scnt") - mu) / F.sqrt(ss / (n - 1)),
    ).otherwise(F.lit(0.0))
    letter = F.lit(_ALPHA[len(bps)])
    for i in reversed(range(len(bps))):
        letter = F.when(z <= F.lit(bps[i]), F.lit(_ALPHA[i])).otherwise(letter)
    lettered = joined.select(*SERIES_KEYS, "seg", letter.alias("letter"))
    word = F.array_join(F.transform(F.array_sort(F.collect_list(F.struct("seg", "letter"))), lambda s: s["letter"]), "")
    return lettered.groupBy(*SERIES_KEYS).agg(word.alias("sax_word"))
