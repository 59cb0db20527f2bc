"""Known-answer tests for the numpy-tier analytics (the rows-only driver
queries): crafted series with unambiguous expected outputs."""

import math

import numpy as np
import pytest
from pyspark.sql import functions as F

from warp10_platform_spark.analytics.fit import dtw_distance, fft_top, stl_decompose
from warp10_platform_spark.analytics.stats import esd_test, grubbs_test, t_cdf, t_ppf
from warp10_platform_spark.core.schema import with_gts_id


def _series(spark, values, cls="t.s", user="1"):
    rows = [(cls, {"user": user}, i * 1_000_000, float(v)) for i, v in enumerate(values)]
    df = spark.createDataFrame(rows, "class string, labels map<string,string>, ts long, v_double double")
    return with_gts_id(df)


def test_t_distribution_known_quantiles():
    # NIST/commons-math reference values
    assert abs(t_ppf(0.975, 10) - 2.2281) < 1e-3
    assert abs(t_ppf(0.95, 5) - 2.0150) < 1e-3
    assert abs(t_cdf(2.0, 60) - 0.9748) < 1e-3


def test_grubbs_flags_planted_outlier(spark):
    vals = [10.0, 10.1, 9.9, 10.2, 9.8, 10.0, 10.1, 50.0, 9.9, 10.0]
    out = grubbs_test(_series(spark, vals)).collect()
    assert len(out) == 1
    assert out[0]["v_outlier"] == 50.0


def test_grubbs_clean_series_no_flag(spark):
    vals = [float(v) for v in np.linspace(10, 11, 20)]
    assert grubbs_test(_series(spark, vals)).count() == 0


def test_esd_finds_multiple_outliers(spark):
    vals = [10.0 + 0.1 * math.sin(i) for i in range(40)]
    vals[5], vals[20] = 60.0, -40.0
    out = esd_test(_series(spark, vals), k=5).collect()
    flagged = sorted(r["v_outlier"] for r in out)
    assert flagged == [-40.0, 60.0]


def test_stl_recovers_trend_and_period(spark):
    n, period = 84, 7
    i = np.arange(n)
    season = 5.0 * np.sin(2 * np.pi * i / period)
    y = 0.5 * i + season
    out = (
        stl_decompose(_series(spark, list(y)), period=period)
        .orderBy("ts")
        .toPandas()
    )
    mid = slice(period, n - period)  # edges are loess-extrapolated
    # trend is close to the 0.5*i line
    assert np.abs(out["trend"].to_numpy()[mid] - 0.5 * i[mid]).mean() < 1.0
    # residual is small relative to the seasonal amplitude
    assert np.abs(out["resid"].to_numpy()[mid]).mean() < 1.0


def test_fft_finds_planted_frequency(spark):
    n = 64
    y = np.sin(2 * np.pi * 8 * np.arange(n) / n)  # bin 8 exactly
    out = fft_top(_series(spark, list(y)), k=1).collect()
    assert out[0]["freq_bin"] == 8


def test_dtw_identity_and_shift():
    a = np.array([0.0, 1.0, 2.0, 1.0, 0.0])
    assert dtw_distance(a, a) == 0.0
    # a time-shifted copy is closer under DTW than under Euclidean
    b = np.array([0.0, 0.0, 1.0, 2.0, 1.0])
    assert dtw_distance(a, b) < np.abs(a - b).sum()


def test_sax_word_shape(spark):
    vals = [float(v) for v in np.concatenate([np.full(8, 0.0), np.full(8, 10.0)])]
    from warp10_platform_spark.analytics.sax import sax_words

    out = sax_words(_series(spark, vals), w=8, alphabet=4).collect()
    assert len(out) == 1
    word = out[0]["sax_word"]
    assert len(word) == 8
    # low half maps to low letters, high half to high letters
    assert set(word[:4]) == {"a"} and set(word[4:]) == {"d"}


def test_stl_esd_flags_seasonal_anomaly(spark):
    import numpy as np
    from warp10_platform_spark.analytics.fit import stl_esd_test

    n, period = 84, 7
    i = np.arange(n)
    y = 10.0 + 5.0 * np.sin(2 * np.pi * i / period)
    y[40] += 30.0  # planted anomaly invisible to plain thresholds near peak
    out = stl_esd_test(_series(spark, list(y)), period=period, k=3).collect()
    assert any(r["ts"] == 40 * 1_000_000 for r in out)


def test_haar_roundtrip_and_multilevel(spark):
    """FDWT level-1 → IDWT rebuilds the series; cascade emits one detail
    set per level with halving length."""
    import numpy as np
    from pyspark.sql import Row

    from warp10_platform_spark.analytics.fit import haar_dwt, haar_dwt_level1, haar_idwt_level1

    vals = [3.0, 1.0, 4.0, 1.0, 5.0, 9.0, 2.0, 6.0]
    rows = [Row(**{"class": "c", "labels_key": "{}", "ts": i, "v_agg": v}) for i, v in enumerate(vals)]
    df = spark.createDataFrame(rows)

    c1 = haar_dwt_level1(df, value_col="v_agg")
    back = haar_idwt_level1(c1).orderBy("i").select("v").rdd.map(lambda r: r[0]).collect()
    assert np.allclose(back, vals)

    multi = haar_dwt(df, levels=3, value_col="v_agg").collect()
    per_level = {}
    for r in multi:
        per_level.setdefault(r["level"], []).append(r)
    assert {len(per_level[1]), len(per_level[2]), len(per_level[3])} == {4, 2, 1}
    # level-3 approximation of an 8-length Haar cascade is sum/ sqrt(2)^3
    a3 = per_level[3][0]["approx"]
    assert abs(a3 - sum(vals) / (2.0 ** 1.5)) < 1e-9


def test_bicubic2d_reproduces_bilinear_and_handles_edges():
    import numpy as np

    from warp10_platform_spark.analytics.interpolate import Bicubic2D

    xs = np.arange(8.0)
    ys = np.arange(8.0)
    interp = Bicubic2D(xs, ys, np.outer(xs, ys))
    # interior cells: exact reproduction of f = x*y (dyadic arithmetic)
    qx = np.array([1.25, 2.5, 3.75, 5.5])
    qy = np.array([1.5, 4.25, 2.75, 5.25])
    got = interp(qx, qy)
    assert np.array_equal(got, qx * qy)
    # grid nodes evaluate to the grid values everywhere (incl. borders)
    nodes_x = np.array([0.0, 3.0, 7.0])
    nodes_y = np.array([0.0, 5.0, 7.0])
    assert np.array_equal(interp(nodes_x, nodes_y), nodes_x * nodes_y)
    # out of domain -> NaN
    assert np.isnan(interp(np.array([-1.0]), np.array([2.0]))[0])


def test_bicubic2d_smooth_surface_accuracy():
    import numpy as np

    from warp10_platform_spark.analytics.interpolate import Bicubic2D

    xs = np.linspace(0, 3, 13)
    ys = np.linspace(0, 3, 13)
    f = np.sin(xs)[:, None] * np.cos(ys)[None, :]
    interp = Bicubic2D(xs, ys, f)
    qx = np.random.default_rng(7).uniform(0.5, 2.5, 200)
    qy = np.random.default_rng(8).uniform(0.5, 2.5, 200)
    got = interp(qx, qy)
    want = np.sin(qx) * np.cos(qy)
    assert np.max(np.abs(got - want)) < 5e-4


def test_wkt_parse_shapes_and_point_in_polygon():
    from warp10_platform_spark.operators.wkt import (
        _point_in_rings, geo_intersects, parse_geojson, parse_wkt, to_wkt,
    )

    p = parse_wkt("POINT (2.5 48.8)")
    assert p.kind == "POINT" and p.coords == [(2.5, 48.8)]
    ls = parse_wkt("LINESTRING (0 0, 1 1, 2 0)")
    assert ls.kind == "LINESTRING" and len(ls.coords) == 3
    poly = parse_wkt("POLYGON ((0 0, 10 0, 10 10, 0 10, 0 0), (4 4, 6 4, 6 6, 4 6, 4 4))")
    assert len(poly.coords) == 2  # outer + hole
    # inside outer, outside hole
    assert _point_in_rings(poly.coords, 2.0, 2.0)
    # inside the hole -> not contained (even-odd parity)
    assert not _point_in_rings(poly.coords, 5.0, 5.0)
    assert not _point_in_rings(poly.coords, 20.0, 5.0)
    mp = parse_wkt("MULTIPOLYGON (((0 0, 1 0, 1 1, 0 1, 0 0)), ((5 5, 6 5, 6 6, 5 6, 5 5)))")
    assert mp.kind == "MULTIPOLYGON" and len(mp.coords) == 2
    gj = parse_geojson('{"type": "Polygon", "coordinates": [[[0,0],[10,0],[10,10],[0,10],[0,0]]]}')
    assert gj.kind == "POLYGON"
    # round-trip parses back to the same coordinates
    assert parse_wkt(to_wkt(poly)).coords == poly.coords
    # edge-crossing intersection without vertex containment
    a = parse_wkt("POLYGON ((0 0, 10 0, 10 1, 0 1, 0 0))")
    b = parse_wkt("POLYGON ((5 -5, 6 -5, 6 5, 5 5, 5 -5))")
    assert geo_intersects(a, b)


def test_tricubic3d_reproduces_trilinear_and_bounds():
    import numpy as np

    from warp10_platform_spark.analytics.interpolate import Tricubic3D

    xs = np.arange(6.0)
    interp = Tricubic3D(xs, xs, xs, np.einsum("i,j,k->ijk", xs, xs, xs))
    qx = np.array([1.25, 2.5, 3.75])
    qy = np.array([2.25, 1.5, 3.25])
    qz = np.array([3.5, 2.75, 1.25])
    assert np.array_equal(interp(qx, qy, qz), qx * qy * qz)
    assert np.isnan(interp(np.array([9.0]), np.array([1.0]), np.array([1.0]))[0])
    # smooth-surface accuracy
    ax = np.linspace(0, 2, 9)
    f = np.einsum("i,j,k->ijk", np.sin(ax), np.cos(ax), np.exp(-ax))
    it = Tricubic3D(ax, ax, ax, f)
    rng = np.random.default_rng(5)
    q = rng.uniform(0.5, 1.5, (3, 100))
    got = it(q[0], q[1], q[2])
    want = np.sin(q[0]) * np.cos(q[1]) * np.exp(-q[2])
    assert np.max(np.abs(got - want)) < 2e-3


def test_microsphere_nd_interpolation():
    import numpy as np

    from warp10_platform_spark.analytics.interpolate import MicrosphereND

    rng = np.random.default_rng(1)
    x = rng.uniform(0, 1, (400, 2))
    y = 3.0 * x[:, 0] + 2.0 * x[:, 1]
    it = MicrosphereND(x, y)
    # exact sample hit returns the sample value (no.interpolation.tolerance)
    assert it(x[:1])[0] == y[0]
    # interior accuracy on a linear surface (microsphere is a smoother,
    # not an exact reproducer — commons-math behaves the same)
    q = rng.uniform(0.2, 0.8, (50, 2))
    err = np.abs(it(q) - (3.0 * q[:, 0] + 2.0 * q[:, 1]))
    assert np.max(err) < 0.15
    # far outside the cloud every facet is dark -> background NaN
    far = MicrosphereND(x, y, dark_threshold=1e6)
    assert np.isnan(far(np.array([[100.0, 100.0]]))[0])


def test_gtscodec_golden_bytes_and_roundtrip():
    """Hand-derived golden bytes per the GTSEncoder format rules, plus a
    full wrapper round-trip over every value type / flag path."""
    import struct

    from warp10_platform_spark.core import gtscodec as G

    # single point ts=1000, v=5L, base=0: delta-base zigzag ts + zigzag long
    # flags = TS_ZIGZAG_DELTA_BASE(0x40) | TYPE_LONG(0x08) | LONG_ZIGZAG(0x04)
    blob = G.encode_gts([(1000, 5)])
    assert blob == bytes([0x4C, 0xD0, 0x0F, 0x0A])
    assert G.decode_gts(blob) == [(1000, 5, None)]

    # ts beyond 2^48 from base -> raw absolute 8-byte BE
    big = 1 << 50
    blob2 = G.encode_gts([(big, True)])
    assert blob2[0] == G.TS_RAW_ABSOLUTE | G.TYPE_BOOLEAN | G.BOOLEAN_TRUE
    assert blob2[1:9] == struct.pack(">q", big)

    # all-types wrapper round-trip incl. identical-value flags + elevation
    pts = [
        (10, 1.25, None), (20, 1.25, 7), (30, -3, 9), (40, -2, 9),
        (50, False, None), (60, "s", None), (70, "s", None),
        (80, b"\xff\x00", None), (90, None, None),
    ]
    s = G.wrap_series("m.x", {"a": "1"}, [(t, v) if e is None else (t, v, e) for t, v, e in pts],
                      attributes={"o": "2"})
    u = G.unwrap_series(s)
    assert u["name"] == "m.x" and u["labels"] == {"a": "1"} and u["attributes"] == {"o": "2"}
    assert u["points"] == pts and u["count"] == len(pts)

    # BigDecimal compact double form decodes (scale byte + zigzag unscaled)
    buf = bytearray([G.TS_RAW_ABSOLUTE | G.TYPE_DOUBLE])
    buf += struct.pack(">q", 5) + struct.pack(">b", 1)
    G.write_svarint(buf, -25)
    assert G.decode_gts(bytes(buf)) == [(5, -2.5, None)]

    # OPB64 alphabet ordering is preserved (byte order == text order)
    assert G.opb64_encode(b"\x00") < G.opb64_encode(b"\x01") < G.opb64_encode(b"\xff")


def test_gtscodec_advice_r3_fixes():
    """Regression tests for the round-3 ADVICE codec findings."""
    import struct

    from warp10_platform_spark.core import gtscodec as G

    # (1) BigDecimal compact double: correctly-rounded decode, not
    # float(unscaled) * 10**-scale double-rounding. 999999999999999e-15
    # must parse to the nearest double of 0.999999999999999 exactly.
    buf = bytearray([G.TS_RAW_ABSOLUTE | G.TYPE_DOUBLE])
    buf += struct.pack(">q", 1) + struct.pack(">b", 15)
    G.write_svarint(buf, 999999999999999)
    ((_, v, _),) = G.decode_gts(bytes(buf))
    assert v == float("0.999999999999999")
    assert v != float(999999999999999) * (10.0 ** -15)  # the old wrong value

    # (2) LONG delta-previous wraps to 64 bits like Java long arithmetic
    blob = G.encode_gts([(0, (1 << 63) - 1)])
    tail = bytearray([G.TS_ZIGZAG_DELTA_BASE | G.TYPE_LONG | G.LONG_ZIGZAG | G.LONG_DELTA_PREVIOUS])
    G.write_svarint(tail, 1)  # ts delta
    G.write_svarint(tail, 1)  # value delta: MAX_LONG + 1 wraps to MIN_LONG
    pts = G.decode_gts(blob + bytes(tail))
    assert pts[1][1] == -(1 << 63)

    # (3) compressionPasses honored on read: a doubly-gzipped wrapper decodes
    raw = G.encode_gts([(i * 1000, 42) for i in range(50)])
    w = G.write_wrapper("m", {}, raw, 50, compress=True)
    parsed = G.read_wrapper(w)
    assert G.decode_gts(parsed["encoded"]) == [(i * 1000, 42, None) for i in range(50)]
    # hand-build a 2-pass wrapper and check the loop-gunzip path
    twice = G._gzip_det(G._gzip_det(raw))
    out = bytearray()
    prev = 0
    prev = G._w_field(out, prev, 1, G._CT_STRUCT)
    out += G.write_metadata("m", {}, None)
    prev = G._w_field(out, prev, 7, G._CT_BINARY)
    G._w_binary(out, twice)
    prev = G._w_field(out, prev, 8, G._CT_I64)
    G.write_svarint(out, 50)
    prev = G._w_field(out, prev, 9, G._CT_TRUE)
    prev = G._w_field(out, prev, 10, G._CT_I32)
    G.write_svarint(out, 2)
    out.append(G._CT_STOP)
    parsed2 = G.read_wrapper(bytes(out))
    assert parsed2["compressionPasses"] == 2
    assert G.decode_gts(parsed2["encoded"])[0] == (0, 42, None)

    # (4) WRAP output is deterministic and compressed by default when it helps
    s1 = G.wrap_series("m", {}, [(i * 1000, 42) for i in range(200)])
    s2 = G.wrap_series("m", {}, [(i * 1000, 42) for i in range(200)])
    assert s1 == s2
    assert G.read_wrapper(G.opb64_decode(s1))["compressed"] in (True, False)
    u = G.unwrap_series(s1)
    assert u["points"] == [(i * 1000, 42, None) for i in range(200)]
    # gzip header: mtime zeroed and OS byte forced to 0x00 (Java parity)
    gz = G._gzip_det(b"x" * 100)
    assert gz[4:8] == b"\x00\x00\x00\x00" and gz[9] == 0x00
