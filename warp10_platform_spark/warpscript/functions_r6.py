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

from warp10_platform_spark.core import timeunits as _tuc
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


# ---------------------------------------------------------------------
# Final script-surface names outside the geo/canvas tiers. The remaining
# unbound reference names after this tranche are crypto (AES/RSA/EC/PGP/
# exotic digests) and the platform/token manager (CALL/EVALSECURE/
# SECURE/CAP*/MSIG*/WF.*/TOKENINFO/GETHOOK/LOGINIT/PIGSCHEMA) — both out
# of scope per SURVEY §2.9/§2.12.
# ---------------------------------------------------------------------

@register("SHAPE")
def _shape(st):
    """[fast] nested-list SHAPE (functions/shape/SHAPE.java): the tensor
    shape as a list of longs; validates rectangularity unless fast."""
    top = st.pop()
    fast = False
    if isinstance(top, bool):
        fast = top
        top = st.pop()
    if not isinstance(top, list):
        raise TypeError("SHAPE expects a LIST")
    shape = []
    first = top
    while isinstance(first, list):
        shape.append(len(first))
        first = first[0] if first else None

    def valid(x, dims):
        if not dims:
            return not isinstance(x, list)
        return (
            isinstance(x, list) and len(x) == dims[0]
            and all(valid(e, dims[1:]) for e in x)
        )

    if not fast and not valid(top, shape):
        raise ValueError("SHAPE expects coherent nested list sizes (a tensor)")
    st.push(shape)


def _attr_toggle(attr_name):
    """ATTRDELTA / ATTRSKIP (functions/ATTRDELTA.java): BOOLEAN sets the
    stack attribute, NULL pushes its current value."""

    def run(st):
        top = st.pop()
        attrs = st.__dict__.setdefault("attributes", {})
        if isinstance(top, bool):
            attrs[attr_name] = top
        elif top is None:
            st.push(bool(attrs.get(attr_name, False)))
        else:
            raise TypeError("expected a BOOLEAN or NULL")

    return run


REGISTRY["ATTRDELTA"] = _attr_toggle("attributes.delta")
REGISTRY["ATTRSKIP"] = _attr_toggle("attributes.skip")


def _instant_of(st, top) -> int:
    if isinstance(top, str):
        # reuse the registered ISO8601 parser (TOTIMESTAMP surface)
        st.push(top)
        REGISTRY["TOTIMESTAMP"](st)
        return int(st.pop())
    if isinstance(top, int) and not isinstance(top, bool):
        return top
    raise TypeError("expects a timestamp or ISO8601 datetime string")


@register("NOTBEFORE")
def _notbefore(st):
    """instant NOTBEFORE (functions/NOTBEFORE.java): fail the script when
    current time (µs) is before the instant."""
    import time

    top = st.pop()
    instant = _instant_of(st, top)
    if int(time.time() * _tuc.UNITS_PER_S) < instant:
        raise RuntimeError(f"Current time is before '{top}'")


@register("NOTAFTER")
def _notafter(st):
    """instant NOTAFTER (functions/NOTAFTER.java): fail when current
    time is after the instant."""
    import time

    top = st.pop()
    instant = _instant_of(st, top)
    if int(time.time() * _tuc.UNITS_PER_S) > instant:
        raise RuntimeError(f"NOTAFTER failed because the current time is after '{top}'")


@register("HEADER")
def _header(st):
    """name value HEADER (functions/HEADER.java): set (or, with NULL,
    clear) an X-* response header in the stack's headers attribute —
    surfaced to the transport layer exactly like the reference's
    ATTRIBUTE_HEADERS."""
    value = st.pop()
    name = st.pop()
    if not isinstance(name, str):
        raise TypeError("HEADER expects a header name (a string) below the value")
    headers = st.__dict__.setdefault("attributes", {}).setdefault("headers", {})
    if value is None:
        headers.pop(name, None)
    else:
        if not name.upper().startswith("X-"):
            raise ValueError("HEADER: only headers beginning with 'X-' can be set")
        headers[name] = str(value)


@register("IMPORT")
def _import(st):
    """namespace alias IMPORT (functions/IMPORT.java): register an alias
    rewrite rule (longest-alias-first), applied at name-resolution time
    by the stack dispatcher; NULL namespace removes the alias."""
    alias = st.pop()
    imported = st.pop()
    if not isinstance(alias, str):
        raise TypeError("IMPORT expects an alias string on top of the stack")
    if imported is not None and not isinstance(imported, str):
        raise TypeError("IMPORT expects a namespace string or NULL below the alias")
    rules = st.__dict__.setdefault("attributes", {}).setdefault("import.rules", {})
    if imported is None:
        rules.pop(alias, None)
    else:
        rules[alias] = imported
