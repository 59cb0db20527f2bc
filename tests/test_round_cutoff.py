"""round6_ge_cutoff: `x >= cutoff` must equal `F.round(x, 6) >= t` for
EVERY double — the r9 optimization that removes the per-pair BigDecimal
round from similarity predicates (pipeline/similarity.py) is only sound
if the two predicates agree ulp-by-ulp around every decision boundary.

The sweep drives SPARK's own Round expression (the authoritative
semantics: shortest-repr decimal, HALF_UP), not a Python re-derivation,
over a dense neighborhood of each threshold's 1e-6 grid boundaries plus
adversarial specials (NaN, ±0.0, ties, negatives, huge magnitudes)."""

import math

from pyspark.sql import functions as F

from warp10_platform_spark.pipeline.similarity import round6_ge_cutoff

THRESHOLDS = [0.3, 0.5, 0.85, 0.9, 0.95, 0.999999, 1.0]


def _boundary_neighborhood(t: float) -> list[float]:
    xs: list[float] = []
    # the two decimal boundaries that matter: the HALF_UP tie m0/1e6 - 5e-7
    # and the rounded target m0/1e6 itself, plus the adjacent grid lines
    from decimal import ROUND_FLOOR, Decimal

    m0 = int((Decimal(t) * 10**6).to_integral_value(rounding=ROUND_FLOOR))
    while float(Decimal(m0) / 10**6) < t:
        m0 += 1
    for m in (m0 - 1, m0, m0 + 1):
        for base_dec in (Decimal(m) / 10**6 - Decimal("0.0000005"), Decimal(m) / 10**6):
            x = float(base_dec)
            for _ in range(60):
                x = math.nextafter(x, -math.inf)
            for _ in range(121):
                xs.append(x)
                x = math.nextafter(x, math.inf)
    xs += [t, math.nextafter(t, 0.0), math.nextafter(t, 2.0)]
    xs += [float("nan"), 0.0, -0.0, -t, 1.0, -1.0, 1e300, -1e300, 5e-7, -5e-7]
    return xs


def test_cutoff_matches_spark_round_ulp_sweep(spark):
    for t in THRESHOLDS:
        cutoff = round6_ge_cutoff(t)
        xs = _boundary_neighborhood(t)
        df = spark.createDataFrame([(x,) for x in xs], "x double")
        rows = df.select(
            "x",
            (F.round("x", 6) >= F.lit(t)).alias("via_round"),
            (F.col("x") >= F.lit(cutoff)).alias("via_cutoff"),
        ).collect()
        for r in rows:
            assert bool(r.via_round) == bool(r.via_cutoff), (t, cutoff, r.x.hex() if isinstance(r.x, float) and not math.isnan(r.x) else r.x, r.via_round, r.via_cutoff)


def test_cutoff_rejects_non_positive_thresholds():
    """For t <= 0 the HALF_UP tie flips sides (round() includes the exact
    negative tie, the cutoff would exclude it — verified one-double
    divergence per boundary in the r9 review), so the derivation refuses
    rather than silently diverging."""
    import pytest

    for t in (0.0, -0.5, -0.85):
        with pytest.raises(ValueError, match="threshold > 0"):
            round6_ge_cutoff(t)


def test_cutoff_null_matches(spark):
    df = spark.createDataFrame([(None,)], "x double")
    r = df.select(
        (F.round("x", 6) >= F.lit(0.85)).alias("via_round"),
        (F.col("x") >= F.lit(round6_ge_cutoff(0.85))).alias("via_cutoff"),
    ).first()
    assert r.via_round is None and r.via_cutoff is None
