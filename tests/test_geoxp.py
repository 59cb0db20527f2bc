"""GeoXP (HHCode) mapping tests: known vectors, scalar↔column parity,
codec location wire round-trips, and the script-surface geo names.

Reference: com.geoxp GeoXPLib/HHCodeHelper (public geoxplib algorithm),
GTSEncoder.java:452-612 (location stream), TOHHCODE/HHCODETO/TOGEOHASH/
GEOHASHTO/HHCODEFUNC.java (script surface).
"""

import random

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from warp10_platform_spark.core import geoxp as G
from warp10_platform_spark.core import gtscodec as C


def test_known_geohash_vector():
    # canonical geohash example: 57.64911,10.40744 -> u4pruydqqvj
    hh = G.to_geoxp(57.64911, 10.40744)
    assert G.hh_to_geohash(hh)[:11] == "u4pruydqqvj"


def test_sw_corner_and_cell_size():
    lat, lon = 48.5, 3.5
    hh = G.to_geoxp(lat, lon)
    la, lo = G.from_geoxp(hh)
    assert la <= lat < la + G.DEGREES_PER_LAT_UNIT + 1e-12
    assert lo <= lon < lo + G.DEGREES_PER_LON_UNIT + 1e-12


def test_poles_clamp():
    assert G.lat_units(90.0) == (1 << 32) - 1
    assert G.lon_units(180.0) == (1 << 32) - 1
    assert G.lat_units(-90.0) == 0
    # bit 63 set for northern hemisphere -> negative Java long
    assert G.to_geoxp(89.0, 0.0) < 0


@given(st.floats(-90, 90, allow_nan=False), st.floats(-180, 180, allow_nan=False))
@settings(max_examples=300, deadline=None)
def test_roundtrip_property(lat, lon):
    hh = G.to_geoxp(lat, lon)
    la, lo = G.from_geoxp(hh)
    assert abs(la - lat) <= G.DEGREES_PER_LAT_UNIT
    assert abs(lo - lon) <= G.DEGREES_PER_LON_UNIT
    # geohash round-trips to the same cell prefix
    hh2 = G.geohash_to_hh(G.hh_to_geohash(hh))
    la2, lo2 = G.from_geoxp(hh2)
    assert abs(la2 - lat) < 2e-4 and abs(lo2 - lon) < 4e-4


def test_neighbor_center_bbox():
    hh = G.to_geoxp(10.0, 20.0)
    n = G.neighbor(hh, 16, 1, 0)
    assert G.from_geoxp(n)[0] - G.from_geoxp(hh)[0] == pytest.approx(180.0 / (1 << 16))
    cla, clo = G.center(hh, 16)
    swla, swlo, nela, nelo = G.bbox(hh, 16)
    assert swla < cla < nela and swlo < clo < nelo
    assert nela - swla == pytest.approx(180.0 / (1 << 16))


def test_column_scalar_parity(spark):
    from pyspark.sql import functions as F

    random.seed(3)
    rows = [(random.uniform(-90, 90), random.uniform(-180, 180)) for _ in range(200)]
    rows += [(90.0, 180.0), (-90.0, -180.0), (0.0, 0.0)]
    df = spark.createDataFrame(rows, "lat double, lon double")
    hhc = G.to_geoxp_col(F.col("lat"), F.col("lon"))
    out = df.select(
        "lat", "lon", hhc.alias("hh"), G.geohash_col(hhc).alias("gh"),
        G.lat_from_geoxp_col(hhc).alias("la"), G.lon_from_geoxp_col(hhc).alias("lo"),
    ).collect()
    for r in out:
        hh = G.to_geoxp(r.lat, r.lon)
        assert hh == r.hh
        assert G.hh_to_geohash(hh) == r.gh
        la, lo = G.from_geoxp(hh)
        assert la == r.la and lo == r.lo


def test_codec_location_golden_bytes():
    """First location raw 8B big-endian after ts; repeat → IDENTICAL
    (no payload); small move → zigzag delta (GTSEncoder.java:452-612)."""
    hh = G.to_geoxp(48.5, 3.5)
    pts = [(0, 1.0, None, hh), (1, 1.0, None, hh)]
    blob = C.encode_gts(pts)
    # point 1: flags|cont, locflags LOC, ts=equals-base(0 w/ base=0), raw loc, value
    assert blob[0] & C.FLAGS_CONTINUATION
    assert blob[1] & C.LOC_LOCATION and not blob[1] & C.LOC_IDENTICAL
    import struct

    assert struct.unpack(">q", blob[2:10])[0] == hh
    # decode parity
    dec = C.decode_gts(blob, with_location=True)
    assert [p[3] for p in dec] == [hh, hh]
    # second point used IDENTICAL (shorter than re-encoding raw)
    assert len(blob) < 2 * (2 + 8 + 8)


def test_codec_location_delta_and_reset():
    a = G.to_geoxp(48.5, 3.5)
    b = G.to_geoxp(48.5001, 3.5001)  # nearby -> zigzag delta branch
    pts = [(0, 1.0, None, a), (10, 2.0, None, b), (20, 3.0, None, None), (30, 4.0, None, a)]
    dec = C.decode_gts(C.encode_gts(pts), with_location=True)
    assert [p[3] for p in dec] == [a, b, None, a]


def test_wrap_location_roundtrip():
    hh1, hh2 = G.to_geoxp(-33.9, 151.2), G.to_geoxp(-33.90001, 151.20001)
    pts = [(1000, 5.0, 12, hh1), (2000, 6.0, 13, hh2)]
    s = C.wrap_series("geo.track", {"v": "1"}, pts)
    u = C.unwrap_series(s, with_location=True)
    assert u["points"] == pts


def test_script_geo_names(spark):
    from warp10_platform_spark.warpscript.stack import WarpScriptStack

    stk = WarpScriptStack(spark, "/root/testdata/sf0.001")
    stk.exec("48.5 3.5 ->HHCODELONG")
    hh = stk.pop()
    assert hh == G.to_geoxp(48.5, 3.5)
    stk.exec("48.5 3.5 ->HHCODE")
    assert stk.pop() == f"{hh & ((1 << 64) - 1):016x}"
    stk.exec(f"{hh} HHCODE->")
    lon = stk.pop(); lat = stk.pop()
    assert (lat, lon) == G.from_geoxp(hh)
    stk.exec("57.64911 10.40744 ->GEOHASH")
    assert stk.pop()[:11] == "u4pruydqqvj"
    stk.exec("'u4pruyd' GEOHASH->")
    lon = stk.pop(); lat = stk.pop()
    assert abs(lat - 57.649) < 0.01 and abs(lon - 10.407) < 0.01
    stk.exec(f"{hh} 16 HHCODE.NORTH")
    assert stk.pop() == G.neighbor(hh, 16, 1, 0)
    stk.exec(f"{hh} 16 HHCODE.CENTER")
    lon = stk.pop(); lat = stk.pop()
    assert (lat, lon) == G.center(hh, 16)
    stk.exec(f"{hh} 16 HHCODE.BBOX")
    nelo = stk.pop(); nela = stk.pop(); swlo = stk.pop(); swla = stk.pop()
    assert (swla, swlo, nela, nelo) == G.bbox(hh, 16)
