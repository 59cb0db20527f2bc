"""GeoXPShape coverage algebra — GEO.UNION / GEO.INTERSECTION /
GEO.DIFFERENCE / GEO.BUFFER / GEOCOVER / GEOSPLIT / GEOPACK/GEOUNPACK.

The reference's constructive geometry works on CELL COVERAGES, not exact
polygons: GeoWKT/GeoJSON convert a geometry to a GeoXPShape (array of
geocells) and GeoUnion/GeoIntersection/GeoSubtraction
(script/functions/GeoUnion.java:58, GeoIntersection.java:59,
GeoSubtraction.java) do set algebra on those cells via GeoXPLib. This
module mirrors that model on core/geoxp.py's HHCode mapping.

Geocell format (public geoxplib convention): top 4 bits = r/2 where r is
the per-axis resolution (even, 2..30); lower 60 bits carry the top 2r
bits of the HHCode, left-aligned at bit 59, rest zero.

Coverage membership of a point is a prefix test per resolution — as a
Spark Column it compiles to (hh >>> shift) IN (literal set) per
resolution: pure JVM codegen, broadcastable, pushdown-friendly — the
100 TB geofence shape.

GEOPACK here is varint-delta + zlib + base64 (deterministic). The
reference packs through its own Thrift/serialized form — interchange of
PACKED shapes is not byte-compatible (documented); WKT/cells are.
"""

from __future__ import annotations

import base64
import zlib

from pyspark.sql import Column
from pyspark.sql import functions as F

from warp10_platform_spark.core import geoxp as gx

_MASK64 = (1 << 64) - 1


def cell_of(hh: int, res: int) -> int:
    """Geocell containing the GeoXPPoint hh at even resolution res."""
    if res % 2 or not 2 <= res <= 30:
        raise ValueError("geocell resolution must be even, 2..30")
    prefix = ((hh & _MASK64) >> (64 - 2 * res)) << (60 - 2 * res)
    return ((res // 2) << 60) | prefix


def cell_res(cell: int) -> int:
    return ((cell & _MASK64) >> 60) * 2


def cell_prefix(cell: int) -> int:
    """The 2r prefix bits, right-aligned."""
    r = cell_res(cell)
    return ((cell & _MASK64) & ((1 << 60) - 1)) >> (60 - 2 * r)


def cell_contains(parent: int, child: int) -> bool:
    rp, rc = cell_res(parent), cell_res(child)
    if rp > rc:
        return False
    return cell_prefix(child) >> (2 * (rc - rp)) == cell_prefix(parent)


def cell_children(cell: int) -> list[int]:
    """The 16 children two resolution steps finer (res+2 keeps the even
    nibble format — how GeoXP splits)."""
    r = cell_res(cell)
    if r >= 30:
        raise ValueError("cannot split a resolution-30 cell")
    base_prefix = cell_prefix(cell) << 4
    rr = r + 2
    return [(((rr // 2) << 60) | ((base_prefix | i) << (60 - 2 * rr))) for i in range(16)]


def cell_bbox(cell: int) -> tuple[float, float, float, float]:
    r = cell_res(cell)
    hh = gx._to_signed64(cell_prefix(cell) << (64 - 2 * r))
    return gx.bbox(hh, r)


class GeoCells:
    """GeoXPShape: normalized set of geocells (children merged away)."""

    __slots__ = ("cells",)

    def __init__(self, cells=()):
        self.cells = frozenset(cells)

    def _prefix_index(self):
        """res → {prefix} for O(1) ancestor/descendant tests (replaces
        the O(|a|·|b|) cell_contains scans — 60s → ms on real covers)."""
        idx: dict[int, set[int]] = {}
        for c in self.cells:
            idx.setdefault(cell_res(c), set()).add(cell_prefix(c))
        return idx

    @staticmethod
    def _covered(idx, r: int, p: int) -> bool:
        """True when cell (r, p) lies inside some cell of idx at res ≤ r."""
        for rb, prefixes in idx.items():
            if rb <= r and (p >> (2 * (r - rb))) in prefixes:
                return True
        return False

    def normalized(self) -> "GeoCells":
        """Drop cells contained in a coarser cell of the set."""
        idx = self._prefix_index()
        keep = set()
        for c in self.cells:
            r, p = cell_res(c), cell_prefix(c)
            if not any(
                rb < r and (p >> (2 * (r - rb))) in prefixes
                for rb, prefixes in idx.items()
            ):
                keep.add(c)
        return GeoCells(keep)

    # --- set algebra (GeoUnion/GeoIntersection/GeoSubtraction) ---

    def union(self, other: "GeoCells") -> "GeoCells":
        return GeoCells(self.cells | other.cells).normalized()

    def intersection(self, other: "GeoCells") -> "GeoCells":
        a_idx = self._prefix_index()
        b_idx = other._prefix_index()
        out = set()
        for c in self.cells:
            if self._covered(b_idx, cell_res(c), cell_prefix(c)):
                out.add(c)
        for c in other.cells:
            if self._covered(a_idx, cell_res(c), cell_prefix(c)):
                out.add(c)
        return GeoCells(out).normalized()

    def subtraction(self, other: "GeoCells") -> "GeoCells":
        """self minus other: coarse cells partially covered by finer
        other-cells split into 16 children and recurse (GeoXP model)."""
        b_idx = other._prefix_index()
        # per finer res, the ancestor prefixes at each coarser res — so
        # "does this cell contain any other-cell?" is a set lookup
        anc: dict[int, dict[int, set[int]]] = {}
        for rb, prefixes in b_idx.items():
            anc[rb] = {
                r: {p >> (2 * (rb - r)) for p in prefixes}
                for r in range(2, rb, 2)
            }
        out = set()

        def sub(cell: int):
            r, p = cell_res(cell), cell_prefix(cell)
            if self._covered(b_idx, r, p):
                return  # fully removed
            splits = any(
                rb > r and p in anc[rb].get(r, ())
                for rb in b_idx
            )
            if not splits:
                out.add(cell)
                return
            for ch in cell_children(cell):
                sub(ch)

        for a in self.normalized().cells:
            sub(a)
        return GeoCells(out).normalized()

    def buffer(self, rings: int = 1) -> "GeoCells":
        """GEO.BUFFER in cover space: expand by `rings` neighbor cells at
        each cell's own resolution. (The reference buffers the JTS
        geometry by a metric distance before covering — same intent,
        cover-space formulation; callers convert meters → rings at their
        cover resolution.)"""
        out = set(self.cells)
        for c in self.cells:
            r = cell_res(c)
            hh = gx._to_signed64(cell_prefix(c) << (64 - 2 * r))
            for dlat in range(-rings, rings + 1):
                for dlon in range(-rings, rings + 1):
                    out.add(cell_of(gx.neighbor(hh, r, dlat, dlon), r))
        return GeoCells(out).normalized()

    # --- point membership ---

    def contains_point(self, lat: float, lon: float) -> bool:
        hh = gx.to_geoxp(lat, lon)
        return any(cell_contains(c, cell_of(hh, cell_res(c))) for c in self.cells)

    def contains_hh_expr(self, hh: Column) -> Column:
        """Prefix predicate over a PRECOMPUTED GeoXPPoint column — project
        `to_geoxp_col(lat, lon)` once and test that: repeating the Morton
        spread inside every resolution branch blows the 64KB codegen
        method limit and falls back to interpreted mode."""
        by_res: dict[int, list[int]] = {}
        for c in self.cells:
            by_res.setdefault(cell_res(c), []).append(cell_prefix(c))
        pred = F.lit(False)
        for r, prefixes in sorted(by_res.items()):
            pred = pred | F.shiftrightunsigned(hh, 64 - 2 * r).isin(prefixes)
        return pred

    def contains_expr(self, lat: Column, lon: Column) -> Column:
        """Column predicate from lat/lon. Prefer projecting the hh column
        once (contains_hh_expr) in multi-resolution covers."""
        return self.contains_hh_expr(gx.to_geoxp_col(lat, lon))

    def contains_sql(self, lat_sql: str, lon_sql: str, latq: str | None = None) -> str:
        """DuckDB replay of contains_expr (oracle use): same unit
        scaling + interleave, prefix IN lists."""
        latq_s = f"least(CAST(floor(({lat_sql} + 90.0) * 23860929.422222222) AS BIGINT), 4294967295)"
        lonq_s = f"least(CAST(floor(({lon_sql} + 180.0) * 11930464.711111111) AS BIGINT), 4294967295)"
        clauses = []
        by_res: dict[int, list[int]] = {}
        for c in self.cells:
            by_res.setdefault(cell_res(c), []).append(cell_prefix(c))
        for r, prefixes in sorted(by_res.items()):
            inter = " + ".join(
                f"((((({latq_s}) >> {32 - r + i}) & 1) << {2 * i + 1}) + "
                f"(((({lonq_s}) >> {32 - r + i}) & 1) << {2 * i}))"
                for i in range(r)
            )
            plist = ", ".join(str(p) for p in sorted(prefixes))
            clauses.append(f"(({inter}) IN ({plist}))")
        return "(" + " OR ".join(clauses) + ")" if clauses else "FALSE"

    def __len__(self):
        return len(self.cells)

    def __eq__(self, other):
        return isinstance(other, GeoCells) and self.cells == other.cells

    def __hash__(self):
        return hash(self.cells)

    def __repr__(self):
        return f"GeoCells({len(self.cells)} cells)"


def cover_shape(shape, res: int) -> GeoCells:
    """GEOCOVER (GEOCOVER.java / GeoImporter coverage): rasterize a
    parsed WKT/GeoJSON Shape (operators/wkt.py) to cells at even
    resolution res. A cell is included when its center or any corner
    falls inside the shape, or a shape vertex falls inside the cell —
    the 'uniform speed' cover; finer res tightens the fence like the
    reference's pcterror knob."""
    from warp10_platform_spark.operators.wkt import Shape, _point_in_rings

    if res % 2 or not 2 <= res <= 30:
        raise ValueError("cover resolution must be even, 2..30")

    def polygons(sh) -> list[list]:
        if sh.kind == "POLYGON":
            return [sh.coords]
        if sh.kind == "MULTIPOLYGON":
            return list(sh.coords)
        raise TypeError(f"GEOCOVER needs a polygonal shape, got {sh.kind}")

    cells: set[int] = set()
    step = 1 << (32 - res)
    for rings in polygons(shape):
        outer = rings[0]
        lons = [p[0] for p in outer]
        lats = [p[1] for p in outer]
        lo_u = gx.lon_units(min(lons)) & ~(step - 1)
        hi_u = gx.lon_units(max(lons))
        la_u = gx.lat_units(min(lats)) & ~(step - 1)
        ha_u = gx.lat_units(max(lats))
        lu = la_u
        while lu <= ha_u:
            vu = lo_u
            while vu <= hi_u:
                # cell center + corners
                pts = [
                    (lu + step // 2, vu + step // 2),
                    (lu, vu), (lu + step - 1, vu), (lu, vu + step - 1),
                    (lu + step - 1, vu + step - 1),
                ]
                hit = False
                for uu, vv in pts:
                    plat = uu * gx.DEGREES_PER_LAT_UNIT - 90.0
                    plon = vv * gx.DEGREES_PER_LON_UNIT - 180.0
                    if _point_in_rings(rings, plon, plat):
                        hit = True
                        break
                if not hit:
                    # vertex inside the cell
                    for plon, plat in outer:
                        pu, pv = gx.lat_units(plat), gx.lon_units(plon)
                        if lu <= pu < lu + step and vu <= pv < vu + step:
                            hit = True
                            break
                if hit:
                    hh = gx.build_from_units(lu, vu)
                    cells.add(cell_of(hh, res))
                vu += step
            lu += step
    return GeoCells(cells)


def geosplit(cov: GeoCells) -> list[int]:
    """GEOSPLIT (GEOSPLIT.java): the shape's cells, sorted."""
    return sorted(cov.cells, key=lambda c: c & _MASK64)


def geopack(cov: GeoCells) -> str:
    """GEOPACK: deterministic text form — sorted cells, varint deltas,
    zlib, base64 (format OURS, documented non-interchange)."""
    cells = geosplit(cov)
    out = bytearray()
    prev = 0
    for c in cells:
        d = (c & _MASK64) - prev
        prev = c & _MASK64
        while True:
            b = d & 0x7F
            d >>= 7
            if d:
                out.append(b | 0x80)
            else:
                out.append(b)
                break
    return base64.b64encode(zlib.compress(bytes(out), 9)).decode("ascii")


def geounpack(text: str) -> GeoCells:
    raw = zlib.decompress(base64.b64decode(text))
    cells = []
    acc = 0
    shift = 0
    prev = 0
    for byte in raw:
        acc |= (byte & 0x7F) << shift
        shift += 7
        if not byte & 0x80:
            prev += acc
            cells.append(prev)  # cells are kept unsigned internally
            acc = 0
            shift = 0
    return GeoCells(cells)
