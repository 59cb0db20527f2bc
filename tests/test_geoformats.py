"""WKB / KML / GML codecs (TOWKB/TOKML/TOGML.java, GeoWKB/KML/GML.java)
and their script bindings ->WKB/->KML/->GML + GEO.WKB/KML/GML."""

import struct

import pytest

from warp10_platform_spark.operators.geoformats import (
    parse_gml,
    parse_kml,
    parse_wkb,
    to_gml,
    to_kml,
    to_wkb,
)
from warp10_platform_spark.operators.wkt import parse_wkt, to_wkt

PENTAGON = (
    "POLYGON ((-120 -60, 120 -60, 140 20, 0 75, -140 20, -120 -60), "
    "(-40 -20, 40 -20, 40 30, -40 30, -40 -20))"
)
MULTI = "MULTIPOLYGON (((0 0, 4 0, 4 4, 0 4, 0 0)), ((10 10, 12 10, 12 12, 10 12, 10 10)))"


# ------------------------------------------------------------------ WKB

def test_wkb_point_golden_bytes():
    # OGC example: POINT (30 10), big-endian
    wkb = to_wkb(parse_wkt("POINT (30 10)"))
    assert wkb.hex() == "0000000001403e0000000000004024000000000000"


def test_wkb_roundtrip_all_kinds():
    for wkt in ["POINT (2.5 -3)", "LINESTRING (0 0, 1 1, 2 0.5)", PENTAGON, MULTI]:
        shape = parse_wkt(wkt)
        back = parse_wkb(to_wkb(shape))
        assert back.kind == shape.kind
        assert back.coords == shape.coords
        assert to_wkt(back) == to_wkt(shape)


def test_wkb_reads_little_endian():
    # same point hand-packed little-endian (byte order flag 01)
    le = b"\x01" + struct.pack("<I", 1) + struct.pack("<dd", 30.0, 10.0)
    s = parse_wkb(le)
    assert s.kind == "POINT" and s.coords == [(30.0, 10.0)]


def test_wkb_polygon_ring_structure():
    wkb = to_wkb(parse_wkt(PENTAGON))
    # big-endian: type 3, 2 rings, outer ring has 6 points (closed)
    assert wkb[0] == 0
    assert struct.unpack(">I", wkb[1:5])[0] == 3
    assert struct.unpack(">I", wkb[5:9])[0] == 2
    assert struct.unpack(">I", wkb[9:13])[0] == 6


def test_wkb_rejects_zm():
    bad = b"\x00" + struct.pack(">I", 1001) + struct.pack(">ddd", 1, 2, 3)
    with pytest.raises(ValueError):
        parse_wkb(bad)


# ------------------------------------------------------------ KML / GML

def test_kml_polygon_roundtrip_and_grammar():
    kml = to_kml(parse_wkt(PENTAGON))
    assert kml.startswith("<Polygon><outerBoundaryIs><LinearRing><coordinates>")
    assert "<innerBoundaryIs>" in kml
    assert "gml:" not in kml
    back = parse_kml(kml)
    assert to_wkt(back) == to_wkt(parse_wkt(PENTAGON))


def test_kml_multipolygon_uses_multigeometry():
    kml = to_kml(parse_wkt(MULTI))
    assert kml.startswith("<MultiGeometry><Polygon>")
    assert to_wkt(parse_kml(kml)) == to_wkt(parse_wkt(MULTI))


def test_kml_unwraps_placemark():
    kml = (
        "<Placemark><name>x</name><Polygon><outerBoundaryIs><LinearRing>"
        "<coordinates>0,0 4,0 4,4 0,4 0,0</coordinates>"
        "</LinearRing></outerBoundaryIs></Polygon></Placemark>"
    )
    assert to_wkt(parse_kml(kml)) == "POLYGON ((0 0, 4 0, 4 4, 0 4, 0 0))"


def test_gml_prefix_and_roundtrip():
    gml = to_gml(parse_wkt(MULTI))
    assert gml.startswith("<gml:MultiPolygon><gml:polygonMember>")
    assert to_wkt(parse_gml(gml)) == to_wkt(parse_wkt(MULTI))


def test_gml_point_and_linestring():
    for wkt in ["POINT (30 10)", "LINESTRING (0 0, 1 1, 2 0.5)"]:
        assert to_wkt(parse_gml(to_gml(parse_wkt(wkt)))) == to_wkt(parse_wkt(wkt))


def test_gml_exterior_interior_accepted():
    gml = (
        '<gml:Polygon><gml:exterior><gml:LinearRing>'
        "<gml:posList>0 0 4 0 4 4 0 4 0 0</gml:posList>"
        "</gml:LinearRing></gml:exterior></gml:Polygon>"
    )
    # posList order here is x y pairs
    assert to_wkt(parse_gml(gml)) == "POLYGON ((0 0, 4 0, 4 4, 0 4, 0 0))"


def test_cross_format_pivot():
    # WKT → KML → shape → WKB → shape → GML → shape → WKT identity
    s0 = parse_wkt(PENTAGON)
    s1 = parse_kml(to_kml(s0))
    s2 = parse_wkb(to_wkb(s1))
    s3 = parse_gml(to_gml(s2))
    assert to_wkt(s3) == to_wkt(s0)


# --------------------------------------------------------- script tier

@pytest.fixture()
def stack(spark, sf_dir):
    from warp10_platform_spark.warpscript.stack import WarpScriptStack

    return WarpScriptStack(spark, sf_dir)


def test_script_serializers(stack):
    st = stack
    st.exec("'POINT (30 10)' ->WKB")
    assert st.pop().hex() == "0000000001403e0000000000004024000000000000"
    st.exec("'POINT (30 10)' ->KML")
    assert st.pop() == "<Point><coordinates>30,10</coordinates></Point>"
    st.exec("'POINT (30 10)' ->GML")
    assert st.pop() == "<gml:Point><gml:coordinates>30,10</gml:coordinates></gml:Point>"


def test_script_geo_parse_coverage_equivalence(stack):
    # the SAME square via WKT, KML, GML and WKB must cover identically
    st = stack
    sq_wkt = "POLYGON ((10 10, 20 10, 20 20, 10 20, 10 10))"
    st.exec(f"'{sq_wkt}' 8 true GEO.WKT")
    cov_wkt = st.pop()
    kml = to_kml(parse_wkt(sq_wkt)).replace("'", "\\'")
    st.exec(f"'{kml}' 8 true GEO.KML")
    assert st.pop() == cov_wkt
    gml = to_gml(parse_wkt(sq_wkt))
    st.exec(f"'{gml}' 8 true GEO.GML")
    assert st.pop() == cov_wkt
    st.push(to_wkb(parse_wkt(sq_wkt)))
    st.exec("8 true GEO.WKB")
    assert st.pop() == cov_wkt


def test_script_serializer_accepts_coverage(stack):
    st = stack
    st.exec("'POLYGON ((10 10, 20 10, 20 20, 10 20, 10 10))' 6 true GEO.WKT ->KML")
    kml = st.pop()
    assert kml.startswith("<MultiGeometry><Polygon>") or kml.startswith("<Polygon>")
    # and the KML parses back into a shape covering the same area class
    assert parse_kml(kml).kind in ("POLYGON", "MULTIPOLYGON")


# --------------------------------------------------- final r4 tranche

def test_shape_tensor(stack):
    st = stack
    st.exec("[ [ 1 2 3 ] [ 4 5 6 ] ] SHAPE")
    assert st.pop() == [2, 3]
    st.exec("[ [ 1 2 ] [ 3 ] ] true SHAPE")  # fast skips validation
    assert st.pop() == [2, 2]
    with pytest.raises(Exception):
        st.exec("[ [ 1 2 ] [ 3 ] ] SHAPE")


def test_attr_toggles_and_header(stack):
    st = stack
    st.exec("true ATTRDELTA NULL ATTRDELTA")
    assert st.pop() is True
    st.exec("NULL ATTRSKIP")
    assert st.pop() is False
    st.exec("'X-Warp10-Custom' 'v1' HEADER")
    assert st.attributes["headers"]["X-Warp10-Custom"] == "v1"
    st.exec("'X-Warp10-Custom' NULL HEADER")
    assert "X-Warp10-Custom" not in st.attributes["headers"]
    with pytest.raises(Exception):
        st.exec("'Bad-Name' 'v' HEADER")


def test_notbefore_notafter(stack):
    st = stack
    st.exec("0 NOTBEFORE")  # epoch is long past: ok
    st.exec("4102444800000000 NOTAFTER")  # year 2100: ok
    with pytest.raises(Exception):
        st.exec("4102444800000000 NOTBEFORE")
    with pytest.raises(Exception):
        st.exec("0 NOTAFTER")


def test_import_alias(stack):
    st = stack
    # alias 'm' for the root namespace name MAX via a dotted rewrite
    st.exec("<% MAX %> 'ns.max' DEF")
    st.exec("'ns' 'm' IMPORT")
    st.exec("3 7 m.max")
    assert st.pop() == 7
    st.exec("NULL 'm' IMPORT")
    with pytest.raises(Exception):
        st.exec("1 2 m.max")


def test_ceval_sync(stack):
    st = stack
    # 4 macros: each computes idx*10, one uses SYNC for the touch
    st.exec("[ <% 10 * %> <% 10 * %> <% 10 * %> <% <% 10 * %> SYNC %> ] 2 CEVAL")
    out = st.pop()
    assert sorted(r[0] for r in out) == [10, 20, 30, 40]
    with pytest.raises(Exception):
        st.exec("[ <% FAIL %> ] 1 CEVAL")


def test_mutex_shm(stack):
    st = stack
    st.exec("<% 42 'answer' SHMSTORE %> 'm1' MUTEX")
    st.exec("'answer' SHMDEFINED 'answer' SHMLOAD")
    v = st.pop(); d = st.pop()
    assert d is True and v == 42
    # store outside a mutex section fails
    with pytest.raises(Exception):
        st.exec("7 'x' SHMSTORE")
    # symbol owned by m1 cannot be written under m2
    with pytest.raises(Exception):
        st.exec("<% 1 'answer' SHMSTORE %> 'm2' MUTEX")
    # clear under the owner
    st.exec("<% NULL 'answer' SHMSTORE %> 'm1' MUTEX 'answer' SHMDEFINED")
    assert st.pop() is False


def test_stackps(stack, spark, sf_dir):
    from warp10_platform_spark.warpscript.stack import WarpScriptStack

    st = stack
    st.exec("'ps-test' WSNAME 'sess-9' WSSESSION WSPS")
    ps = st.pop()
    mine = [p for p in ps if p.get("name") == "ps-test"]
    assert len(mine) == 1 and mine[0]["session"] == "sess-9"
    victim = WarpScriptStack(spark, sf_dir)
    victim.exec("'victim' WSNAME")
    st.push(victim.uuid)
    st.exec("WSINFO")
    assert st.pop()["name"] == "victim"
    st.push(victim.uuid)
    st.exec("WSKILL")
    assert st.pop() is True
    with pytest.raises(RuntimeError):
        victim.exec("1 2 +")
