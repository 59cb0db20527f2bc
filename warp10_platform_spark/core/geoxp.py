"""GeoXP (HHCode) cell mapping — the location encoding the reference uses
for every GTS location (GeoTimeSerie.java:106 `long[] locations` are
GeoXPPoints; com.geoxp.GeoXPLib via io.senx:geoxplib, an Apache-licensed
public library).

A GeoXPPoint is a 64-bit HHCode built from the public algorithm
(geoxplib HHCodeHelper):

- lat scaled to a 32-bit unit grid: lat_units = trunc((lat + 90) * 2^32/180)
  clamped to [0, 2^32-1]; lon likewise with 360.
- Morton/Z-order bit interleave MSB-first with LATITUDE in the odd bit
  positions (buildHHCode: for i = 31..0 emit lat_i then lon_i), so bit 63
  is lat bit 31 — the Java long is negative for the northern half.
- fromGeoXPPoint returns the SW corner of the unit cell:
  lat = lat_units * 180/2^32 - 90.

GeoHash interop (GeoHashHelper): a geohash is the SAME construction with
LONGITUDE first — swapping adjacent bit pairs of an HHCode yields the
geohash bit stream; 12 base-32 characters carry the top 60 bits.

Both a driver-side scalar form (wire codec, script stack values) and a
Spark Column form (whole-stage-codegen magic-number Morton spread — no
UDF, safe for 100 TB geo bucketing) are provided. Self-consistency is
property-tested (tests/test_geoxp.py); byte parity with the reference
rests on the published algorithm above since the geoxp jar is not
available here to diff against.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

_U32 = 1 << 32
_LAT_UNITS_PER_DEG = _U32 / 180.0
_LON_UNITS_PER_DEG = _U32 / 360.0
DEGREES_PER_LAT_UNIT = 180.0 / _U32
DEGREES_PER_LON_UNIT = 360.0 / _U32

NO_LOCATION = 0x0145014501450145  # GeoTimeSerie.java:78

_GH_ALPHABET = "0123456789bcdefghjkmnpqrstuvwxyz"
_GH_REV = {c: i for i, c in enumerate(_GH_ALPHABET)}

# Morton magic numbers (public bit-twiddling identities)
_M = (
    (16, 0x0000FFFF0000FFFF),
    (8, 0x00FF00FF00FF00FF),
    (4, 0x0F0F0F0F0F0F0F0F),
    (2, 0x3333333333333333),
    (1, 0x5555555555555555),
)

_MASK64 = (1 << 64) - 1


def _to_signed64(v: int) -> int:
    v &= _MASK64
    return v - (1 << 64) if v >= (1 << 63) else v


def _spread32(x: int) -> int:
    """Spread the 32 bits of x onto the even bit positions of a 64-bit int."""
    for s, m in _M:
        x = (x | (x << s)) & m
    return x


def _compact32(x: int) -> int:
    """Inverse of _spread32: gather even bit positions into 32 bits."""
    x &= 0x5555555555555555
    x = (x | (x >> 1)) & 0x3333333333333333
    x = (x | (x >> 2)) & 0x0F0F0F0F0F0F0F0F
    x = (x | (x >> 4)) & 0x00FF00FF00FF00FF
    x = (x | (x >> 8)) & 0x0000FFFF0000FFFF
    x = (x | (x >> 16)) & 0x00000000FFFFFFFF
    return x


def lat_units(lat: float) -> int:
    u = int((lat + 90.0) * _LAT_UNITS_PER_DEG)  # trunc like Java (long) cast
    return max(0, min(_U32 - 1, u))


def lon_units(lon: float) -> int:
    u = int((lon + 180.0) * _LON_UNITS_PER_DEG)
    return max(0, min(_U32 - 1, u))


def to_geoxp(lat: float, lon: float) -> int:
    """GeoXPLib.toGeoXPPoint: lat/lon degrees → signed-64 GeoXPPoint."""
    return _to_signed64((_spread32(lat_units(lat)) << 1) | _spread32(lon_units(lon)))


def from_geoxp(hh: int) -> tuple[float, float]:
    """GeoXPLib.fromGeoXPPoint: SW corner of the unit cell, degrees."""
    u = hh & _MASK64
    latu = _compact32(u >> 1)
    lonu = _compact32(u)
    return (latu * DEGREES_PER_LAT_UNIT - 90.0, lonu * DEGREES_PER_LON_UNIT - 180.0)


def hh_to_geohash(hh: int, nchars: int = 12) -> str:
    """GeoHashHelper.fromHHCode: swap lat/lon bit pairs (geohash is
    lon-first) and emit the top 5·nchars bits as base-32 text."""
    u = hh & _MASK64
    gh = (((u & 0xAAAAAAAAAAAAAAAA) >> 1) | ((u & 0x5555555555555555) << 1)) & _MASK64
    out = []
    for i in range(nchars):
        shift = 64 - 5 * (i + 1)
        out.append(_GH_ALPHABET[(gh >> shift) & 31])
    return "".join(out)


def geohash_to_hh(gh: str) -> int:
    """GeoHashHelper.toHHCode: base-32 text → HHCode of the cell's SW
    corner (missing low bits zero-padded)."""
    bits = 0
    for c in gh.lower():
        bits = (bits << 5) | _GH_REV[c]
    bits <<= 64 - 5 * len(gh)
    bits &= _MASK64
    hh = ((bits & 0xAAAAAAAAAAAAAAAA) >> 1) | ((bits & 0x5555555555555555) << 1)
    return _to_signed64(hh)


# --------------------------------------------------------------------
# Column forms — JVM-side codegen, no Python in the plan. Spread/compact
# use 256-entry byte lookup tables instead of the 5-step magic-number
# chain: Column trees substitute subexpressions by COPY, so the chained
# form duplicates the input expr 32× and a two-resolution coverage
# filter blows the 64KB JVM codegen method limit (observed). The table
# form references the input 4×/8× with tiny per-byte arithmetic.
# --------------------------------------------------------------------

_SPREAD_B = [_spread32(i) for i in range(256)]  # byte → 16 even-spread bits
_COMPACT_B = [_compact32(i) for i in range(256)]  # byte → 4 gathered bits


def _byte_lut(table: list[int], byte: Column) -> Column:
    # explicit long literals: the values fit in 32 bits, so a bare array
    # literal resolves to array<int> and downstream shiftleft wraps at 32
    arr = F.array(*[F.lit(v).cast("long") for v in table])
    return F.element_at(arr, (byte + 1).cast("int"))


def _spread32_col(x: Column) -> Column:
    out = _byte_lut(_SPREAD_B, x.bitwiseAND(F.lit(255)))
    for i in (1, 2, 3):
        b = F.shiftrightunsigned(x, 8 * i).bitwiseAND(F.lit(255))
        out = out.bitwiseOR(F.shiftleft(_byte_lut(_SPREAD_B, b), 16 * i))
    return out


def _compact32_col(x: Column) -> Column:
    out = _byte_lut(_COMPACT_B, x.bitwiseAND(F.lit(255)))
    for i in range(1, 8):
        b = F.shiftrightunsigned(x, 8 * i).bitwiseAND(F.lit(255))
        out = out.bitwiseOR(F.shiftleft(_byte_lut(_COMPACT_B, b), 4 * i))
    return out


def lat_units_col(lat: Column) -> Column:
    u = F.floor((lat + F.lit(90.0)) * F.lit(_LAT_UNITS_PER_DEG)).cast("long")
    return F.greatest(F.lit(0), F.least(u, F.lit(_U32 - 1)))


def lon_units_col(lon: Column) -> Column:
    u = F.floor((lon + F.lit(180.0)) * F.lit(_LON_UNITS_PER_DEG)).cast("long")
    return F.greatest(F.lit(0), F.least(u, F.lit(_U32 - 1)))


def to_geoxp_col(lat: Column, lon: Column) -> Column:
    """Column GeoXPPoint — the distributed twin of to_geoxp (shift/mask
    exprs wrap exactly like Java long arithmetic)."""
    return F.shiftleft(_spread32_col(lat_units_col(lat)), 1).bitwiseOR(
        _spread32_col(lon_units_col(lon))
    )


def lat_from_geoxp_col(hh: Column) -> Column:
    return _compact32_col(F.shiftrightunsigned(hh, 1)).cast("double") * F.lit(
        DEGREES_PER_LAT_UNIT
    ) - F.lit(90.0)


def lon_from_geoxp_col(hh: Column) -> Column:
    return _compact32_col(hh).cast("double") * F.lit(DEGREES_PER_LON_UNIT) - F.lit(180.0)


def geohash_col(hh: Column, nchars: int = 12) -> Column:
    """hh → geohash text, pure exprs: pair-swap then 5-bit base-32 slices."""
    gh = F.shiftrightunsigned(hh.bitwiseAND(F.lit(-0x5555555555555556)), 1).bitwiseOR(
        F.shiftleft(hh.bitwiseAND(F.lit(0x5555555555555555)), 1)
    )
    alphabet = F.lit(_GH_ALPHABET)
    parts = [
        F.substring(
            alphabet,
            (F.shiftrightunsigned(gh, 64 - 5 * (i + 1)).bitwiseAND(F.lit(31)) + 1).cast("int"),
            1,
        )
        for i in range(nchars)
    ]
    return F.concat(*parts)


# --------------------------------------------------------------------
# Cell navigation (HHCodeHelper north/south/east/west/center/bbox):
# a step at resolution r moves one cell of 2^(32-r) units on one axis,
# wrapping within the 32-bit unit grid.
# --------------------------------------------------------------------

def split_units(hh: int) -> tuple[int, int]:
    u = hh & _MASK64
    return _compact32(u >> 1), _compact32(u)


def build_from_units(latu: int, lonu: int) -> int:
    return _to_signed64((_spread32(latu & (_U32 - 1)) << 1) | _spread32(lonu & (_U32 - 1)))


def neighbor(hh: int, res: int, dlat: int, dlon: int) -> int:
    """Neighbor cell at resolution res (2..32): HHCodeHelper.*HHCode."""
    step = 1 << (32 - res)
    latu, lonu = split_units(hh)
    return build_from_units(latu + dlat * step, lonu + dlon * step)


def center(hh: int, res: int) -> tuple[float, float]:
    """HHCodeHelper.getCenterLatLon: SW corner + half a cell."""
    half = 1 << (31 - res) if res < 32 else 0
    latu, lonu = split_units(hh)
    mask = ~((1 << (32 - res)) - 1) & (_U32 - 1)
    latu, lonu = (latu & mask) + half, (lonu & mask) + half
    return (latu * DEGREES_PER_LAT_UNIT - 90.0, lonu * DEGREES_PER_LON_UNIT - 180.0)


def bbox(hh: int, res: int) -> tuple[float, float, float, float]:
    """HHCodeHelper.getHHCodeBBox: [sw_lat, sw_lon, ne_lat, ne_lon]."""
    cell = 1 << (32 - res)
    latu, lonu = split_units(hh)
    mask = ~(cell - 1) & (_U32 - 1)
    latu, lonu = latu & mask, lonu & mask
    return (
        latu * DEGREES_PER_LAT_UNIT - 90.0,
        lonu * DEGREES_PER_LON_UNIT - 180.0,
        (latu + cell) * DEGREES_PER_LAT_UNIT - 90.0,
        (lonu + cell) * DEGREES_PER_LON_UNIT - 180.0,
    )
