"""RLOWESS robustness iterations + piecewise HYBRIDTEST semantics —
the two r4-verdict semantic-parity fixes (GTSHelper.rlowess:10795,
GTSOutliersHelper.hybridTest:524 / entropyHybridTest:643)."""

import math

import pytest
from pyspark.sql import functions as F


def _series(spark, pairs, cls="t.s"):
    rows = [(cls, '[{"key":"user","value":"u1"}]', int(t), float(v)) for t, v in pairs]
    df = spark.createDataFrame(rows, "class string, labels_key string, ts long, v_double double")
    return df.withColumn("gts_id", F.xxhash64("class", "labels_key"))


def _smooth_map(df_out):
    return {r["ts"]: r["v_smooth"] for r in df_out.collect()}


def test_rlowess_downweights_outlier(spark):
    """On a line with one wild point, robust (r=2) lowess must sit far
    closer to the line at the outlier tick than non-robust (r=0)."""
    from warp10_platform_spark.analytics.fit import rlowess_smooth

    # noisy line (h = 6*median|resid| needs a real noise floor; a perfect
    # line degenerates to h≈0 where bisquare zeroes every residual alike)
    pairs = [(t * 1_000_000, 2.0 * t + 0.8 * math.sin(1.7 * t)) for t in range(20)]
    pairs[10] = (10_000_000, 500.0)  # outlier; true line value is ~20
    df = _series(spark, pairs)
    plain = _smooth_map(rlowess_smooth(df, q=7, r=0))
    robust = _smooth_map(rlowess_smooth(df, q=7, r=2))
    t_out = 10_000_000
    assert abs(robust[t_out] - 20.0) < abs(plain[t_out] - 20.0) / 5
    assert abs(robust[t_out] - 20.0) < 5.0


def test_rlowess_matches_plain_on_clean_series(spark):
    """No outliers → rho stays ~1 and r iterations converge to the same
    smooth (the reference's fixpoint property)."""
    from warp10_platform_spark.analytics.fit import rlowess_smooth

    pairs = [(t * 1_000_000, math.sin(t / 3.0) * 10 + t) for t in range(25)]
    df = _series(spark, pairs)
    r0 = _smooth_map(rlowess_smooth(df, q=9, r=0))
    r2 = _smooth_map(rlowess_smooth(df, q=9, r=2))
    for ts in r0:
        assert abs(r0[ts] - r2[ts]) < 0.5


def test_rlowess_exact_on_line():
    """Local LINEAR fit reproduces a line exactly (centroid normal
    equations, pointwise_lowess:10694)."""
    from warp10_platform_spark.analytics.fit import _rlowess_series

    xs = [float(i) * 1e6 for i in range(15)]
    ys = [3.0 * i + 7.0 for i in range(15)]
    sm = _rlowess_series(xs, ys, q=5, r=1)
    for i in range(15):
        assert abs(sm[i] - ys[i]) < 1e-6


def test_rlowess_delta_skip_interpolates():
    """d > 0: ticks within d of the last anchor are linearly interpolated
    between anchors (rlowess:10895 skip/resolve walk) — on a line the
    result is still exact; on a parabola the skipped ticks are the
    interpolated chord, not the local fit."""
    from warp10_platform_spark.analytics.fit import _rlowess_series

    xs = [float(i) for i in range(21)]
    ys = [2.0 * i + 1.0 for i in range(21)]
    sm = _rlowess_series(xs, ys, q=5, r=0, d=3)
    for i in range(21):
        assert abs(sm[i] - ys[i]) < 1e-9

    ys2 = [float(i * i) for i in range(21)]
    full = _rlowess_series(xs, ys2, q=5, r=0, d=0)
    skip = _rlowess_series(xs, ys2, q=5, r=0, d=3)
    assert skip != full  # skipped ticks got chord values
    # anchors agree with the full fit at the first tick
    assert abs(skip[0] - full[0]) < 1e-9


def test_rlowess_negative_delta_is_zero():
    """RLOWESS.java:99 `(long) Math.pow(10,d) * (last-first)` casts the
    fractional power to long BEFORE multiplying → negative d is 0."""
    from warp10_platform_spark.analytics.fit import _rlowess_series

    xs = [float(i) for i in range(10)]
    ys = [float(i % 3) for i in range(10)]
    assert _rlowess_series(xs, ys, 4, 1, d=-2) == _rlowess_series(xs, ys, 4, 1, d=0)


def test_rlowess_degree2_exact_on_parabola():
    """p=2 weighted polynomial fit reproduces a parabola exactly."""
    from warp10_platform_spark.analytics.fit import _rlowess_series

    xs = [float(i) for i in range(15)]
    ys = [0.5 * i * i - 3 * i + 2 for i in range(15)]
    sm = _rlowess_series(xs, ys, q=6, r=0, p=2)
    for i in range(15):
        assert abs(sm[i] - ys[i]) < 1e-6


_DIGITS = [3, 1, 4, 1, 5, 9, 2, 6, 5, 3, 5, 8, 9, 7, 9, 3, 2, 3, 8, 4, 6, 2, 6, 4, 3, 3, 8, 3, 2, 7]


def _hybrid_series(spark, shift=50.0, spike=30.0):
    """Two 15-bucket pieces; seasonal period 5; irregular count-like base
    values; the second piece is level-shifted by `shift`; one injected
    spike per piece at in-piece index 3 (global ticks 3 and 18)."""
    pairs = []
    for i in range(30):
        v = float(_DIGITS[i]) + (shift if i >= 15 else 0.0) + (spike if i % 15 == 3 else 0.0)
        pairs.append((i * 1_000_000, v))
    return _series(spark, pairs)


def test_hybrid_piecewise_finds_injected_spike(spark):
    from warp10_platform_spark.analytics.fit import hybrid_test_exact

    df = _hybrid_series(spark)
    out = hybrid_test_exact(df, buckets_per_period=5, periods_per_piece=3, k=2, alpha=0.05)
    ticks = {r["ts"] for r in out.collect()}
    assert 18_000_000 in ticks  # the piece-1 spike


def test_hybrid_piece_argument_is_honored(spark):
    """The level shift between pieces inflates the WHOLE-series MAD so a
    single-piece run flags nothing, while the piecewise run (piece median
    absorbs the shift) flags the spikes — the result demonstrably depends
    on the piece argument (r4 verdict requirement)."""
    from warp10_platform_spark.analytics.fit import hybrid_test_exact

    df = _hybrid_series(spark)
    piecewise = hybrid_test_exact(df, 5, 3, k=2, alpha=0.05)  # 2 pieces of 15
    whole = hybrid_test_exact(df, 5, 6, k=2, alpha=0.05)  # 1 piece of 30
    p_ticks = {r["ts"] for r in piecewise.collect()}
    w_ticks = {r["ts"] for r in whole.collect()}
    assert p_ticks != w_ticks
    assert 18_000_000 in p_ticks
    # the shift boundary itself is absorbed by the piece medians
    assert 14_000_000 not in p_ticks and 15_000_000 not in p_ticks


def test_hybrid_too_short_series_emits_nothing(spark):
    from warp10_platform_spark.analytics.fit import hybrid_test_exact

    df = _series(spark, [(i * 1_000_000, float(i)) for i in range(8)])
    out = hybrid_test_exact(df, 5, 3, k=2)
    assert out.count() == 0


def test_hybrid2_entropy_seasonal_flags_both_spikes(spark):
    """The entropy seasonal (HYBRIDTEST2) does not absorb point spikes,
    so both injected spikes are flagged."""
    from warp10_platform_spark.analytics.fit import hybrid_test_exact

    df = _hybrid_series(spark)
    out = hybrid_test_exact(df, 5, 3, k=2, alpha=0.05, entropy=True)
    ticks = {r["ts"] for r in out.collect()}
    assert 3_000_000 in ticks and 18_000_000 in ticks


def test_ws_hybrid_and_rlowess_bindings(spark, sf_dir):
    """Stack arity: gts bpp ppp k HYBRIDTEST and gts q r d p RLOWESS."""
    from warp10_platform_spark.core.frame import GTSFrame
    from warp10_platform_spark.warpscript.stack import WarpScriptStack

    df = _hybrid_series(spark)
    st = WarpScriptStack(spark, sf_dir)
    st.push(GTSFrame(df, None, "v_double"))
    st.exec("5 3 2 HYBRIDTEST")
    res = st.pop()
    out = res.df if hasattr(res, "df") else res
    ticks = {r["ts"] for r in out.collect()}
    assert 18_000_000 in ticks

    st.push(GTSFrame(df, None, "v_double"))
    st.exec("7 2 0 1 RLOWESS")
    gf = st.pop()
    assert "v_smooth" in gf.df.columns
    assert gf.df.count() == 30
