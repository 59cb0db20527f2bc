"""GEO.WKT / GEO.JSON shapes + GEOWITHIN / GEOINTERSECTS — no geo library.

The reference (functions/GeoWKT.java, GeoJSON.java, GEOWITHIN.java,
GEOINTERSECTS.java, WarpScriptLib.java:1011-1031) converts WKT/GeoJSON to a
GeoXP cell coverage and tests cell overlap. Here shapes stay EXACT
geometry: a parsed ring list compiled into pure Column predicates
(even-odd ray cast — holes come free from parity), which is both more
precise than a cell cover and fully JVM-side: the per-point test is a
chain of comparisons/arithmetic on the lat/lon columns, no UDF, no
shuffle, pushdown-compatible.

Shape-vs-shape predicates (GEOINTERSECTS between two literal shapes) are
driver-side pure Python — shapes are script literals, never data.

WKT axis order is OGC (x=lon, y=lat); rings close implicitly.
"""

from __future__ import annotations

import json
import re
from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_NUM = re.compile(r"[-+]?\d+(?:\.\d+)?(?:[eE][-+]?\d+)?")


@dataclass
class Shape:
    kind: str  # POINT | LINESTRING | POLYGON | MULTIPOLYGON
    # POINT: [(lon, lat)]; LINESTRING: [(lon, lat), ...]
    # POLYGON: list of rings (first outer, rest holes), each [(lon, lat), ...]
    # MULTIPOLYGON: list of POLYGON coordinate lists
    coords: list


def _ring(text: str) -> list[tuple[float, float]]:
    nums = [float(m) for m in _NUM.findall(text)]
    if len(nums) % 2:
        raise ValueError(f"odd coordinate count in ring: {text[:60]}")
    pts = list(zip(nums[0::2], nums[1::2]))
    if len(pts) >= 2 and pts[0] == pts[-1]:
        pts = pts[:-1]  # drop the explicit closure; rings close implicitly
    return pts


def _split_rings(body: str) -> list[str]:
    """Split '((...),(...))' into the inner '(...)' groups at depth 1."""
    groups, depth, start = [], 0, None
    for i, ch in enumerate(body):
        if ch == "(":
            depth += 1
            if depth == 1:
                start = i + 1
        elif ch == ")":
            if depth == 1:
                groups.append(body[start:i])
            depth -= 1
    return groups


def parse_wkt(text: str) -> Shape:
    """Minimal WKT reader: POINT, LINESTRING, POLYGON (with holes),
    MULTIPOLYGON (functions/GeoWKT.java surface)."""
    t = text.strip()
    head = t.split("(", 1)[0].strip().upper()
    body = t[t.index("(") :] if "(" in t else ""
    if head == "POINT":
        return Shape("POINT", _ring(body))
    if head == "LINESTRING":
        return Shape("LINESTRING", _ring(body))
    if head == "POLYGON":
        return Shape("POLYGON", [_ring(g) for g in _split_rings(body[1:-1])])
    if head == "MULTIPOLYGON":
        inner = body[1:-1]
        polys = []
        # polygons are the depth-1 groups; their rings the depth-2 groups
        for g in _split_rings(inner):
            polys.append([_ring(r) for r in _split_rings(g)])
        return Shape("MULTIPOLYGON", polys)
    raise ValueError(f"unsupported WKT type: {head}")


def parse_geojson(obj) -> Shape:
    """GEO.JSON (functions/GeoJSON.java): GeoJSON geometry → Shape."""
    if isinstance(obj, str):
        obj = json.loads(obj)
    typ = obj["type"].upper()
    c = obj["coordinates"]
    if typ == "POINT":
        return Shape("POINT", [tuple(c)])
    if typ == "LINESTRING":
        return Shape("LINESTRING", [tuple(p) for p in c])
    if typ == "POLYGON":
        return Shape("POLYGON", [[tuple(p) for p in ring] for ring in c])
    if typ == "MULTIPOLYGON":
        return Shape("MULTIPOLYGON", [[[tuple(p) for p in ring] for ring in poly] for poly in c])
    raise ValueError(f"unsupported GeoJSON type: {typ}")


def _num(x: float) -> str:
    """Full-precision WKT number: integral values render as integers,
    everything else via repr (shortest round-trip form)."""
    fx = float(x)
    return str(int(fx)) if fx.is_integer() else repr(fx)


def to_wkt(shape: Shape) -> str:
    """TOWKT round-trip."""
    def ring(r):
        pts = list(r) + [r[0]]
        return "(" + ", ".join(f"{_num(x)} {_num(y)}" for x, y in pts) + ")"

    if shape.kind == "POINT":
        x, y = shape.coords[0]
        return f"POINT ({_num(x)} {_num(y)})"
    if shape.kind == "LINESTRING":
        return "LINESTRING " + "(" + ", ".join(f"{_num(x)} {_num(y)}" for x, y in shape.coords) + ")"
    if shape.kind == "POLYGON":
        return "POLYGON (" + ", ".join(ring(r) for r in shape.coords) + ")"
    if shape.kind == "MULTIPOLYGON":
        return "MULTIPOLYGON (" + ", ".join(
            "(" + ", ".join(ring(r) for r in poly) + ")" for poly in shape.coords
        ) + ")"
    raise ValueError(shape.kind)


def _edges(rings: list[list[tuple[float, float]]]):
    for r in rings:
        n = len(r)
        for i in range(n):
            x1, y1 = r[i]
            x2, y2 = r[(i + 1) % n]
            if y1 != y2:  # horizontal edges never cross the horizontal ray
                yield x1, y1, x2, y2


def rings_contains_expr(rings: list[list[tuple[float, float]]], lat: Column, lon: Column) -> Column:
    """Even-odd ray-cast over every ring edge as one Column expression —
    holes handled by parity, literals folded into the plan."""
    inside = F.lit(False)
    for x1, y1, x2, y2 in _edges(rings):
        crosses = ((F.lit(y1) > lat) != (F.lit(y2) > lat)) & (
            lon < F.lit(x2 - x1) * (lat - F.lit(y1)) / F.lit(y2 - y1) + F.lit(x1)
        )
        inside = inside != crosses
    return inside


def rings_contains_sql(rings: list[list[tuple[float, float]]], lat: str = "lat", lon: str = "lon") -> str:
    """The SAME ray cast as ANSI SQL (crossing-count parity) — term-for-term
    twin of rings_contains_expr so a DuckDB oracle decides identically."""
    terms = [
        f"CASE WHEN (({y1!r} > {lat}) != ({y2!r} > {lat})) AND "
        f"({lon} < {x2 - x1!r} * ({lat} - {y1!r}) / {y2 - y1!r} + {x1!r}) THEN 1 ELSE 0 END"
        for x1, y1, x2, y2 in _edges(rings)
    ]
    return "((" + " + ".join(terms) + ") % 2 = 1)"


def shape_contains_expr(shape: Shape, lat: Column, lon: Column) -> Column:
    if shape.kind == "POLYGON":
        return rings_contains_expr(shape.coords, lat, lon)
    if shape.kind == "MULTIPOLYGON":
        out = F.lit(False)
        for poly in shape.coords:
            out = out | rings_contains_expr(poly, lat, lon)
        return out
    raise ValueError(f"containment needs an areal shape, got {shape.kind}")


def geo_within_wkt(df: DataFrame, wkt: str) -> DataFrame:
    """GEOWITHIN with a WKT fence (GEOWITHIN.java + GeoWKT.java): keep the
    located points inside the shape."""
    shape = parse_wkt(wkt)
    return df.where(F.col("lat").isNotNull() & shape_contains_expr(shape, F.col("lat"), F.col("lon")))


# ---- driver-side shape-vs-shape predicates (literal shapes) ----

def _point_in_rings(rings, x: float, y: float) -> bool:
    inside = False
    for x1, y1, x2, y2 in _edges(rings):
        if ((y1 > y) != (y2 > y)) and x < (x2 - x1) * (y - y1) / (y2 - y1) + x1:
            inside = not inside
    return inside


def _seg_intersect(p, q, r, s) -> bool:
    def orient(a, b, c):
        v = (b[0] - a[0]) * (c[1] - a[1]) - (b[1] - a[1]) * (c[0] - a[0])
        return 0 if v == 0 else (1 if v > 0 else -1)

    def on_seg(a, b, c):
        return min(a[0], b[0]) <= c[0] <= max(a[0], b[0]) and min(a[1], b[1]) <= c[1] <= max(a[1], b[1])

    o1, o2 = orient(p, q, r), orient(p, q, s)
    o3, o4 = orient(r, s, p), orient(r, s, q)
    if o1 != o2 and o3 != o4:
        return True
    return (o1 == 0 and on_seg(p, q, r)) or (o2 == 0 and on_seg(p, q, s)) or \
           (o3 == 0 and on_seg(r, s, p)) or (o4 == 0 and on_seg(r, s, q))


def _poly_edges_pts(rings):
    for r in rings:
        n = len(r)
        for i in range(n):
            yield r[i], r[(i + 1) % n]


def geo_intersects(a: Shape, b: Shape) -> bool:
    """GEOINTERSECTS for two areal literals: vertex containment either way
    or any crossing edge pair (exact geometry, not cell approximation)."""
    pa = a.coords if a.kind == "POLYGON" else [r for poly in a.coords for r in poly]
    pb = b.coords if b.kind == "POLYGON" else [r for poly in b.coords for r in poly]
    if any(_point_in_rings(pb, x, y) for ring in pa for x, y in ring):
        return True
    if any(_point_in_rings(pa, x, y) for ring in pb for x, y in ring):
        return True
    return any(
        _seg_intersect(p1, p2, q1, q2)
        for p1, p2 in _poly_edges_pts(pa)
        for q1, q2 in _poly_edges_pts(pb)
    )
