"""Multivalue GTS tier — WRAPMV / MVEXTRACT / MVSPLIT / ->MVSTRING.

A multivalue element is a point whose VALUE is itself a wrapped
(metadata-less) GTSWrapper blob; the inner encoder's ticks act as
sub-indices. Reference: functions/MVEXTRACT.java, MVSPLIT.java,
TOMVSTRING.java, WRAP.java:92-96 (mv=true unsets metadata/count),
registrations WarpScriptLib.java:2605-2615.

These are driver-side stack functions over the Encoder value (the
reference operates on in-memory GTS/GTSEncoder the same way); the
distributed twin for bulk data is ASENCODERS + the wrap column ops.
"""

from __future__ import annotations

import math
import urllib.parse

from warp10_platform_spark.core.encoders import Encoder
from warp10_platform_spark.core.geoxp import from_geoxp, to_geoxp
from warp10_platform_spark.core.gtscodec import (
    decode_gts,
    opb64_decode,
    opb64_encode,
    read_wrapper,
    wrap_series,
)


def mv_wrap(enc: Encoder, compress: bool = True) -> str:
    """WRAPMV / WRAPMV! on an encoder: OPB64 of a metadata-less wrapper."""
    return wrap_series(enc.name, enc.labels, enc.points, base=enc.base,
                       attributes=enc.attributes, compress=compress, mv=True)


def try_parse_mv(value):
    """If `value` is a wrapped blob (OPB64 string or raw bytes), return
    its decoded point list [(ts, val, elev|None, loc|None)]; else None.
    Mirrors MVEXTRACT's deserialize-attempt (:114-155)."""
    if isinstance(value, str):
        for decode in (lambda s: opb64_decode(s), lambda s: s.encode("latin-1")):
            try:
                buf = decode(value)
            except Exception:
                continue
            pts = _parse_wrapper_bytes(buf)
            if pts is not None:
                return pts
        return None
    if isinstance(value, (bytes, bytearray)):
        return _parse_wrapper_bytes(bytes(value))
    return None


def _parse_wrapper_bytes(buf: bytes):
    try:
        w = read_wrapper(buf)
        if not w["encoded"]:
            return None
        return decode_gts(w["encoded"], base=w["base"], with_location=True)
    except Exception:
        return None


def _elt(element: str, ts, value, elev, loc):
    """MVEXTRACT.elt (:160-195): one component of one point."""
    if element == "VALUE":
        return value
    if element == "TICK":
        return ts
    if element == "ELEVATION":
        return elev
    if element == "LOCATION":
        return loc
    if element == "LATLON":
        if loc is None:
            return [math.nan, math.nan]
        lat, lon = from_geoxp(loc)
        return [lat, lon]
    raise ValueError(element)


def mvextract(enc: Encoder, element: str) -> list:
    """MVEXTRACT (MVVALUES/MVTICKS/MVLOCATIONS/MVELEVATIONS/MVHHCODES):
    per outer point — plain values yield their component; wrapped values
    yield the inner component list (VALUE) or [outer, [inner...]]
    (other components), exactly like MVEXTRACT.mvextract (:95-158)."""
    out = []
    for ts, value, elev, loc in _norm_points(enc):
        inner = try_parse_mv(value) if isinstance(value, (str, bytes, bytearray)) else None
        if inner is None:
            out.append(_elt(element, ts, value, elev, loc))
        elif element == "VALUE":
            out.append([_elt(element, *_pad(p)) for p in inner])
        else:
            out.append([
                _elt(element, ts, value, elev, loc),
                [_elt(element, *_pad(p)) for p in inner],
            ])
    return out


def _pad(p):
    ts, value = p[0], p[1]
    elev = p[2] if len(p) > 2 else None
    loc = p[3] if len(p) > 3 else None
    return ts, value, elev, loc


def _norm_points(enc: Encoder):
    for p in enc.points:
        yield _pad(p)


def mvsplit(enc: Encoder, bytick: bool, selection=None, renaming=None) -> list[Encoder]:
    """MVSPLIT (MVTICKSPLIT bytick=True / MVINDEXSPLIT bytick=False):
    explode multivalue points into per-index encoders. `selection` is the
    optional list of LONG indices / [lo hi] ranges to keep (:70-100);
    `renaming` the index→name map — unmatched indices get name:index
    (:287-300). Inner location/elevation override the outer ones
    (:255-258)."""
    renaming = renaming or {}
    ticks = set()
    ranges = []
    include_zero = selection is None
    if selection is not None:
        for s in selection:
            if isinstance(s, (list, tuple)):
                lo, hi = sorted((int(s[0]), int(s[1])))
                ranges.append((lo, hi))
            else:
                ticks.add(int(s))
                if int(s) == 0:
                    include_zero = True
    check = selection is not None

    encoders: dict[int, Encoder] = {}

    def bucket(index: int) -> Encoder:
        e = encoders.get(index)
        if e is None:
            e = Encoder(enc.name, enc.labels, enc.attributes)
            encoders[index] = e
        return e

    for ts, value, elev, loc in _norm_points(enc):
        inner = try_parse_mv(value) if isinstance(value, (str, bytes, bytearray)) else None
        if inner is not None:
            index = 0
            for p in inner:
                dts, dval, delev, dloc = _pad(p)
                idx = dts if bytick else index
                keep = True
                if check:
                    keep = idx in ticks or any(lo <= idx <= hi for lo, hi in ranges)
                if keep:
                    bucket(idx).add_value(
                        ts, dval,
                        delev if delev is not None else elev,
                        dloc if dloc is not None else loc,
                    )
                index += 1
        elif include_zero:
            bucket(0).add_value(ts, value, elev, loc)

    out = []
    for index, e in encoders.items():
        name = renaming.get(index, renaming.get(str(index)))
        e.name = str(name) if name is not None else f"{e.name}:{index}"
        out.append(e)
    return out


def to_mvstring(x) -> str:
    """->MVSTRING (TOMVSTRING.java:60-140): readable text form of a
    wrapped blob / encoder — '[ ' compressed or '[! ' raw, then
    ts/lat:lon/elev/value per point ('/'-separated, components elided
    when absent)."""
    if isinstance(x, Encoder):
        return _points_to_mvstring(list(_norm_points(x)), compressed=False)
    if isinstance(x, (str, bytes, bytearray)):
        buf = opb64_decode(x) if isinstance(x, str) else bytes(x)
        w = read_wrapper(buf, inflate=False)
        compressed = bool(w.get("compressed"))
        if compressed:
            w = read_wrapper(buf)
        pts = decode_gts(w["encoded"], base=w["base"], with_location=True)
        return _points_to_mvstring([_pad(p) for p in pts], compressed=compressed)
    raise TypeError("->MVSTRING operates on an ENCODER, STRING or byte array")


def _points_to_mvstring(points, compressed: bool) -> str:
    parts = ["[ " if compressed else "[! "]
    for ts, value, elev, loc in points:
        if ts != 0 or loc is not None or elev is not None:
            parts.append(f"{ts}/")
        if loc is not None:
            lat, lon = from_geoxp(loc)
            parts.append(f"{lat}:{lon}/")
        elif elev is not None:
            parts.append("/")
        if elev is not None:
            parts.append(f"{elev}/")
        if isinstance(value, (bytes, bytearray)):
            inner = _parse_wrapper_bytes(bytes(value))
            if inner is not None:
                parts.append(_points_to_mvstring([_pad(p) for p in inner], compressed=False))
            else:
                import base64

                parts.append("b64:" + base64.urlsafe_b64encode(bytes(value)).decode().rstrip("="))
        elif isinstance(value, str):
            inner = try_parse_mv(value)
            if inner is not None:
                parts.append(_points_to_mvstring([_pad(p) for p in inner], compressed=False))
            else:
                parts.append("'" + urllib.parse.quote(value, safe="") + "'")
        elif isinstance(value, bool):
            parts.append("T" if value else "F")
        else:
            parts.append(repr(value) if isinstance(value, float) else str(value))
        parts.append(" ")
    parts.append("]")
    return "".join(parts)
