"""Round-4 late tranche — geometry interchange formats.

Reference registrations WarpScriptLib.java:1011-1026:
  GEO.WKB / GEO.WKB.UNIFORM   (GeoWKB.java)  — WKB bytes → coverage
  GEO.KML / GEO.KML.UNIFORM   (GeoKML.java)  — KML text  → coverage
  GEO.GML / GEO.GML.UNIFORM   (GeoGML.java)  — GML text  → coverage
  ->WKB  (TOWKB.java)  ->KML (TOKML.java)  ->GML (TOGML.java)
  — serialize any geometry input (GEOSHAPE coverage, Shape, or a
  WKT/GeoJSON/GML/KML string or WKB bytes; the TOGEOJSON.java:106-133
  toGeometry dispatch) into the target format.

Codecs live in operators/geoformats.py; this module only does stack
plumbing and the any-input dispatch.
"""

from __future__ import annotations

from warp10_platform_spark.warpscript.functions import REGISTRY, register


def _gf():
    from warp10_platform_spark.operators import geoformats as gf

    return gf


def _any_to_shape(v):
    """TOGEOJSON.toGeometry dispatch (TOGEOJSON.java:106-133): bytes are
    WKB; strings sniff '{'→GeoJSON, '<gml'→GML, '<'→KML, else WKT; a
    coverage becomes the MULTIPOLYGON of its cell bboxes (the allCells
    form of TOGEOJSON, which TOWKB/TOKML/TOGML pivot through)."""
    from warp10_platform_spark.operators import geocells as GC
    from warp10_platform_spark.operators.wkt import Shape, parse_geojson, parse_wkt

    gf = _gf()
    if isinstance(v, Shape):
        return v
    if isinstance(v, GC.GeoCells):
        polys = []
        for c in sorted(v.cells, key=lambda x: x & ((1 << 64) - 1)):
            swla, swlo, nela, nelo = GC.cell_bbox(c)
            polys.append([[(swlo, swla), (nelo, swla), (nelo, nela), (swlo, nela)]])
        return Shape("MULTIPOLYGON", polys)
    if isinstance(v, (bytes, bytearray)):
        return gf.parse_wkb(bytes(v))
    if isinstance(v, str):
        t = v.strip()
        if t.startswith("{"):
            return parse_geojson(t)
        if t.startswith("<gml"):
            return gf.parse_gml(t)
        if t.startswith("<"):
            return gf.parse_kml(t)
        return parse_wkt(t)
    raise TypeError(f"not a geometry value: {type(v).__name__}")


@register("->WKB")
def _to_wkb(st):
    """geom ->WKB (TOWKB.java): WKB bytes, big-endian like the JTS
    WKBWriter the reference delegates to."""
    st.push(_gf().to_wkb(_any_to_shape(st.pop())))


@register("->KML")
def _to_kml(st):
    """geom ->KML (TOKML.java): unprefixed GML2 grammar, multi-geometries
    wrapped in <MultiGeometry>."""
    st.push(_gf().to_kml(_any_to_shape(st.pop())))


@register("->GML")
def _to_gml(st):
    """geom ->GML (TOGML.java): GML2 with the gml: prefix."""
    st.push(_gf().to_gml(_any_to_shape(st.pop())))


def _geo_parse_factory(parse_name):
    def run(st):
        # same contract as GEO.WKT: 'geom' pcterror|res inside → coverage
        inside = st.pop()
        pct = st.pop()
        raw = st.pop()
        gf = _gf()
        parse = getattr(gf, parse_name)
        shape = parse(bytes(raw) if parse_name == "parse_wkb" else str(raw))
        # reuse GEO.WKT's shape→coverage path (registered in functions_ext)
        from warp10_platform_spark.warpscript.functions_ext import _to_coverage

        st.push(_to_coverage(shape, pct, inside))

    return run


REGISTRY["GEO.WKB"] = REGISTRY["GEO.WKB.UNIFORM"] = _geo_parse_factory("parse_wkb")
REGISTRY["GEO.KML"] = REGISTRY["GEO.KML.UNIFORM"] = _geo_parse_factory("parse_kml")
REGISTRY["GEO.GML"] = REGISTRY["GEO.GML.UNIFORM"] = _geo_parse_factory("parse_gml")


def _widen_serializer(name):
    """->WKT / ->GEOJSON also accept the full toGeometry input set in the
    reference (TOWKT.java, TOGEOJSON.java) — pre-parse str/bytes inputs
    into a Shape, then defer to the original Shape/coverage serializer."""
    orig = REGISTRY[name]

    def run(st):
        v = st.pop()
        if isinstance(v, (str, bytes, bytearray)):
            v = _any_to_shape(v)
        st.push(v)
        orig(st)

    REGISTRY[name] = run


_widen_serializer("->WKT")
_widen_serializer("->GEOJSON")
