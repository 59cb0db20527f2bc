"""WKB / KML / GML geometry codecs over the exact Shape type.

Reference surface (WarpScriptLib.java:1011-1026 registrations):
  GEO.WKB / GEO.KML / GEO.GML (+ .UNIFORM) parse the respective format
  into a GeoXP coverage (GeoWKB.java, GeoKML.java, GeoGML.java — all via
  JTS readers), and ->WKB / ->KML / ->GML (TOWKB.java, TOKML.java,
  TOGML.java) serialize "any geometry input" (GEOSHAPE, WKT, GeoJSON,
  GML, KML string or WKB bytes — TOGEOJSON.java:106-133 toGeometry
  dispatch) into the target format.

Here the pivot type is operators.wkt.Shape (exact geometry, no geo
library):

* WKB: OGC well-known binary, big-endian like the JTS WKBWriter default
  (JTS ByteOrderValues.BIG_ENDIAN); reader accepts both byte orders.
  Point=1, LineString=2, Polygon=3, MultiPolygon=6; MultiPoint /
  MultiLineString / GeometryCollection raise (Shape has no such kinds —
  documented deviation).
* GML: GML2 geometry elements with the gml: prefix, the element grammar
  of the JTS GMLWriter (coordinates as "lon,lat" pairs separated by
  spaces, polygons as outerBoundaryIs/innerBoundaryIs LinearRings,
  MultiPolygon as polygonMember children).
* KML: the reference's KMLWriter is literally the JTS GMLWriter with the
  prefix stripped and multi-geometries wrapped in <MultiGeometry>
  (TOKML.java:44-62) — so KML here is the same grammar, unprefixed.

Parsers are namespace-agnostic (match on local names), so prefixed GML,
unprefixed KML, and anything in between all parse.
"""

from __future__ import annotations

import re
import struct
import xml.etree.ElementTree as ET

from warp10_platform_spark.operators.wkt import Shape

# ---------------------------------------------------------------- WKB

_WKB_POINT, _WKB_LINESTRING, _WKB_POLYGON = 1, 2, 3
_WKB_MULTIPOINT, _WKB_MULTILINESTRING, _WKB_MULTIPOLYGON = 4, 5, 6
_WKB_COLLECTION = 7


def to_wkb(shape: Shape) -> bytes:
    """Shape → WKB bytes (big-endian, like the JTS WKBWriter the
    reference TOWKB.java uses)."""
    out = bytearray()

    def header(geom_type: int) -> None:
        out.append(0)  # 00 = big-endian
        out.extend(struct.pack(">I", geom_type))

    def pts(ring, close: bool) -> None:
        seq = list(ring)
        if close and seq and seq[0] != seq[-1]:
            seq.append(seq[0])
        out.extend(struct.pack(">I", len(seq)))
        for x, y in seq:
            out.extend(struct.pack(">dd", float(x), float(y)))

    def polygon(rings) -> None:
        header(_WKB_POLYGON)
        out.extend(struct.pack(">I", len(rings)))
        for r in rings:
            pts(r, close=True)

    if shape.kind == "POINT":
        header(_WKB_POINT)
        x, y = shape.coords[0]
        out.extend(struct.pack(">dd", float(x), float(y)))
    elif shape.kind == "LINESTRING":
        header(_WKB_LINESTRING)
        pts(shape.coords, close=False)
    elif shape.kind == "POLYGON":
        polygon(shape.coords)
    elif shape.kind == "MULTIPOLYGON":
        header(_WKB_MULTIPOLYGON)
        out.extend(struct.pack(">I", len(shape.coords)))
        for poly in shape.coords:
            polygon(poly)
    else:
        raise ValueError(f"unsupported shape kind for WKB: {shape.kind}")
    return bytes(out)


class _WKBReader:
    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0

    def _take(self, n: int) -> bytes:
        if self.pos + n > len(self.data):
            raise ValueError("truncated WKB")
        b = self.data[self.pos : self.pos + n]
        self.pos += n
        return b

    def _header(self) -> int:
        order = self._take(1)[0]
        self.endian = "<" if order == 1 else ">"
        (gt,) = struct.unpack(self.endian + "I", self._take(4))
        # mask off EWKB SRID/Z/M flag bits; reject actual Z/M payloads
        base = gt & 0xFF
        if gt & 0x20000000:  # EWKB SRID present
            self._take(4)
        if base > 7 and base % 1000 in (1, 2, 3, 4, 5, 6, 7):
            raise ValueError("Z/M WKB dimensions are not supported")
        return base

    def _pt(self) -> tuple[float, float]:
        x, y = struct.unpack(self.endian + "dd", self._take(16))
        return (x, y)

    def _seq(self) -> list[tuple[float, float]]:
        (n,) = struct.unpack(self.endian + "I", self._take(4))
        return [self._pt() for _ in range(n)]

    def _ring(self) -> list[tuple[float, float]]:
        pts = self._seq()
        if len(pts) >= 2 and pts[0] == pts[-1]:
            pts = pts[:-1]  # Shape rings close implicitly
        return pts

    def read(self) -> Shape:
        gt = self._header()
        if gt == _WKB_POINT:
            return Shape("POINT", [self._pt()])
        if gt == _WKB_LINESTRING:
            return Shape("LINESTRING", self._seq())
        if gt == _WKB_POLYGON:
            (nr,) = struct.unpack(self.endian + "I", self._take(4))
            return Shape("POLYGON", [self._ring() for _ in range(nr)])
        if gt == _WKB_MULTIPOLYGON:
            (np_,) = struct.unpack(self.endian + "I", self._take(4))
            polys = []
            for _ in range(np_):
                inner = self._header()
                if inner != _WKB_POLYGON:
                    raise ValueError("MultiPolygon member is not a Polygon")
                (nr,) = struct.unpack(self.endian + "I", self._take(4))
                polys.append([self._ring() for _ in range(nr)])
            return Shape("MULTIPOLYGON", polys)
        raise ValueError(f"unsupported WKB geometry type: {gt}")


def parse_wkb(data: bytes) -> Shape:
    """WKB bytes → Shape (GeoWKB.java wkbToGeometry surface; either byte
    order, EWKB SRID flag tolerated)."""
    return _WKBReader(bytes(data)).read()


# ------------------------------------------------------------ GML / KML

def _fmt(x: float) -> str:
    fx = float(x)
    return str(int(fx)) if fx.is_integer() else repr(fx)


def _coords_text(pts, close: bool) -> str:
    seq = list(pts)
    if close and seq and seq[0] != seq[-1]:
        seq.append(seq[0])
    return " ".join(f"{_fmt(x)},{_fmt(y)}" for x, y in seq)


def _xml(shape: Shape, p: str) -> str:
    """Serialize with tag prefix p ('gml:' or '')."""

    def polygon(rings) -> str:
        parts = [f"<{p}Polygon>"]
        if rings:
            parts.append(
                f"<{p}outerBoundaryIs><{p}LinearRing><{p}coordinates>"
                f"{_coords_text(rings[0], True)}"
                f"</{p}coordinates></{p}LinearRing></{p}outerBoundaryIs>"
            )
        for hole in rings[1:]:
            parts.append(
                f"<{p}innerBoundaryIs><{p}LinearRing><{p}coordinates>"
                f"{_coords_text(hole, True)}"
                f"</{p}coordinates></{p}LinearRing></{p}innerBoundaryIs>"
            )
        parts.append(f"</{p}Polygon>")
        return "".join(parts)

    if shape.kind == "POINT":
        return (
            f"<{p}Point><{p}coordinates>{_coords_text(shape.coords, False)}"
            f"</{p}coordinates></{p}Point>"
        )
    if shape.kind == "LINESTRING":
        return (
            f"<{p}LineString><{p}coordinates>{_coords_text(shape.coords, False)}"
            f"</{p}coordinates></{p}LineString>"
        )
    if shape.kind == "POLYGON":
        return polygon(shape.coords)
    if shape.kind == "MULTIPOLYGON":
        if p:  # GML: MultiPolygon/polygonMember (JTS GMLWriter grammar)
            members = "".join(
                f"<{p}polygonMember>{polygon(poly)}</{p}polygonMember>"
                for poly in shape.coords
            )
            return f"<{p}MultiPolygon>{members}</{p}MultiPolygon>"
        # KML: no multi types — MultiGeometry wrapper (TOKML.java:49-57)
        return "<MultiGeometry>" + "".join(polygon(poly) for poly in shape.coords) + "</MultiGeometry>"


def to_gml(shape: Shape) -> str:
    """Shape → GML2 text with the gml: prefix (TOGML.java via the JTS
    GMLWriter grammar). Namespace declaration intentionally omitted, as
    in the reference's unformatted writer output."""
    return _xml(shape, "gml:")


def to_kml(shape: Shape) -> str:
    """Shape → KML geometry text (TOKML.java: the GML grammar unprefixed,
    multi-geometries as <MultiGeometry>)."""
    return _xml(shape, "")


def _local(tag: str) -> str:
    t = tag.rsplit("}", 1)[-1]  # {ns}Name
    return t.rsplit(":", 1)[-1]  # prefix:Name with undeclared prefix


_GML_PREFIX_RE = re.compile(r"<(/?)(\w+):")


def _parse_xml(text: str) -> ET.Element:
    t = text.strip()
    # undeclared prefixes (the reference writes no xmlns) break ET —
    # strip prefixes up front; parsing is on local names anyway.
    return ET.fromstring(_GML_PREFIX_RE.sub(r"<\1", t))


def _coords_of(el: ET.Element) -> list[tuple[float, float]]:
    for child in el.iter():
        if _local(child.tag) in ("coordinates", "posList"):
            txt = (child.text or "").strip()
            if _local(child.tag) == "posList":
                nums = [float(v) for v in txt.split()]
                return list(zip(nums[0::2], nums[1::2]))
            pts = []
            for tok in txt.replace("\n", " ").split():
                xy = tok.split(",")
                pts.append((float(xy[0]), float(xy[1])))
            return pts
    raise ValueError("no coordinates element found")


def _ring_of(el: ET.Element) -> list[tuple[float, float]]:
    pts = _coords_of(el)
    if len(pts) >= 2 and pts[0] == pts[-1]:
        pts = pts[:-1]
    return pts


def _shape_of(el: ET.Element) -> Shape:
    name = _local(el.tag)
    if name in ("Placemark", "kml", "Document", "Folder"):  # KML wrappers
        for child in el:
            cn = _local(child.tag)
            if cn in ("Point", "LineString", "Polygon", "MultiGeometry",
                      "MultiPolygon", "Placemark", "Document", "Folder"):
                return _shape_of(child)
        raise ValueError(f"no geometry inside <{name}>")
    if name == "Point":
        return Shape("POINT", _coords_of(el))
    if name == "LineString":
        return Shape("LINESTRING", _coords_of(el))
    if name == "Polygon":
        return Shape("POLYGON", _polygon_rings(el))
    if name in ("MultiPolygon", "MultiGeometry"):
        polys = []
        for sub in el.iter():
            if _local(sub.tag) == "Polygon":
                polys.append(_polygon_rings(sub))
        if not polys:
            raise ValueError(f"<{name}> holds no polygons")
        return Shape("MULTIPOLYGON", polys)
    raise ValueError(f"unsupported geometry element: {name}")


def _polygon_rings(poly: ET.Element) -> list[list[tuple[float, float]]]:
    outer, inner = [], []
    for child in poly:
        cn = _local(child.tag)
        if cn in ("outerBoundaryIs", "exterior"):
            outer.append(_ring_of(child))
        elif cn in ("innerBoundaryIs", "interior"):
            inner.append(_ring_of(child))
        elif cn == "LinearRing":  # bare ring, no boundary wrapper
            outer.append(_ring_of(child))
    if not outer:
        raise ValueError("polygon without outer boundary")
    return outer + inner


def parse_gml(text: str) -> Shape:
    """GML2 text → Shape (GeoGML.java GMLToGeometry surface; prefixed or
    not, outerBoundaryIs/exterior both accepted)."""
    return _shape_of(_parse_xml(text))


def parse_kml(text: str) -> Shape:
    """KML geometry text → Shape (GeoKML.java KMLToGeometry surface;
    Placemark/Document wrappers unwrapped)."""
    return _shape_of(_parse_xml(text))
