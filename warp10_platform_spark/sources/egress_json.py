"""Reference-faithful /fetch JSON egress (EgressFetchHandler.jsonDump,
continuum/egress/EgressFetchHandler.java:1611-1845).

Byte-level format:

    [{"c":<class>,"l":{<labels>},"a":{<attrs>},"i":"<id>","la":<lastActivity>,
      "v":[[ts(,lat,lon)(,elev),value],...]},...]

- `.producer` / `.owner` labels are hidden unless the request is signed
  or exposure is enabled (EgressFetchHandler.java:1686-1694).
- Doubles print as Java `Double.toString` (decimal in [1e-3, 1e7),
  scientific `d.dddEk` otherwise, always ≥1 fractional digit).
- Series with no values are skipped entirely (decoder.next() gate).

Conformance: tests/test_conformance_goldens.py feeds the reference's own
unit fixture through this writer and byte-compares against the
reference-authored golden files EgressFetchHandlerTest_1.json and
EgressFetchHandlerExposeTest.json.
"""

from __future__ import annotations

import json
import math
from dataclasses import dataclass, field

PRODUCER_LABEL = ".producer"
OWNER_LABEL = ".owner"


def java_double_str(d: float) -> str:
    """Java Double.toString(double): shortest roundtrip digits, decimal
    notation for 1e-3 <= |d| < 1e7, otherwise `d.ddd...Ek`; always at
    least one fractional digit; NaN/Infinity spelled Java-style."""
    if math.isnan(d):
        return "NaN"
    if math.isinf(d):
        return "Infinity" if d > 0 else "-Infinity"
    if d == 0.0:
        return "-0.0" if math.copysign(1.0, d) < 0 else "0.0"
    sign = "-" if d < 0 else ""
    a = abs(d)
    # shortest roundtrip digits + decimal exponent from repr()
    s = repr(a)
    if "e" in s:
        mant, _, exp_s = s.partition("e")
        exp10 = int(exp_s)
    else:
        mant, exp10 = s, 0
    if "." in mant:
        int_part, _, frac_part = mant.partition(".")
    else:
        int_part, frac_part = mant, ""
    digits = (int_part + frac_part).lstrip("0")
    # position of the decimal point relative to `digits`:
    # value = 0.<digits> * 10**point
    point = len(int_part.lstrip("0")) + exp10 if int_part.lstrip("0") else exp10 - (
        len(frac_part) - len(frac_part.lstrip("0"))
    )
    digits = digits.rstrip("0") or "0"
    if 1e-3 <= a < 1e7:
        # plain decimal form
        if point <= 0:
            return sign + "0." + "0" * (-point) + digits
        if point >= len(digits):
            return sign + digits + "0" * (point - len(digits)) + ".0"
        return sign + digits[:point] + "." + digits[point:]
    # scientific: one digit before the point, exponent = point - 1
    head = digits[0]
    tail = digits[1:] or "0"
    return f"{sign}{head}.{tail}E{point - 1}"


def _jnum(v) -> str:
    if isinstance(v, bool):
        return "true" if v else "false"
    if isinstance(v, int):
        return str(v)
    if isinstance(v, float):
        return java_double_str(v)
    return json.dumps(str(v), ensure_ascii=False)


@dataclass
class EgressSeries:
    """One GTS for the egress writer. `points` rows are
    (ts, lat|None, lon|None, elev|None, value)."""

    name: str
    labels: dict = field(default_factory=dict)
    attributes: dict = field(default_factory=dict)
    labels_id: int = 0
    last_activity: int = 0
    points: list = field(default_factory=list)


def _row_value(r):
    for c, conv in (("v_string", str), ("v_bool", bool), ("v_long", int), ("v_double", float)):
        try:
            v = r[c]
        except (KeyError, ValueError):
            continue
        if v is not None:
            return conv(v)
    return None


def json_dump_rows(rows, expose: bool = False, signed: bool = False, mask: int = ~0):
    """Streaming variant of json_dump over canonical point Rows ordered by
    (class, labels_key, ts): yields string chunks, holding ONE point row
    at a time — the /fetch json egress path stays bounded-memory like
    text/tsv (the reference's jsonDump writes through a PrintWriter the
    same way). Series boundaries are detected on (class, labels_key)."""
    yield "["
    cur_key = None
    firstgts = True
    for r in rows:
        key = (r["class"], r["labels_key"])
        if key != cur_key:
            head = []
            if not firstgts:
                head.append("]},")
            firstgts = False
            cur_key = key
            labels = dict(r["labels"] or {})
            if not signed and not expose:
                labels.pop(PRODUCER_LABEL, None)
                labels.pop(OWNER_LABEL, None)
            try:
                attrs = dict(r["attributes"] or {})
            except (KeyError, ValueError):
                attrs = {}
            head.append('{"c":' + json.dumps(r["class"], ensure_ascii=False))
            head.append(',"l":' + json.dumps(labels, ensure_ascii=False, separators=(",", ":")))
            head.append(',"a":' + json.dumps(attrs, ensure_ascii=False, separators=(",", ":")))
            try:
                gid = int(r["gts_id"]) & mask
            except (KeyError, ValueError, TypeError):
                gid = 0
            head.append(f',"i":"{gid}","la":0,"v":[')
            yield "".join(head)
            first_pt = True
        chunk = [] if first_pt else [","]
        first_pt = False
        chunk.append("[" + str(r["ts"]))
        lat, lon = r["lat"], r["lon"]
        if lat is not None and lon is not None:
            chunk.append("," + java_double_str(float(lat)) + "," + java_double_str(float(lon)))
        if r["elev"] is not None:
            chunk.append("," + str(r["elev"]))
        chunk.append("," + _jnum(_row_value(r)) + "]")
        yield "".join(chunk)
    if not firstgts:
        yield "]}"
    yield "]"


def json_dump(series, expose: bool = False, signed: bool = False, mask: int = ~0) -> str:
    """Serialize an iterable of EgressSeries exactly as
    EgressFetchHandler.jsonDump does (field order c,l,a,i,la,v; hidden
    producer/owner; per-point arrays omitting absent location/elevation).
    `mask` is ANDed onto labels_id (the reference masks with a random
    long per request; pass a fixed mask for deterministic output)."""
    out = ["["]
    firstgts = True
    for s in series:
        if not s.points:
            continue
        if not firstgts:
            out.append("]},")
        firstgts = False
        sb = ['{"c":', json.dumps(s.name, ensure_ascii=False), ',"l":{']
        first = True
        for k, v in s.labels.items():
            if not signed and not expose and k in (PRODUCER_LABEL, OWNER_LABEL):
                continue
            if not first:
                sb.append(",")
            sb.append(json.dumps(k, ensure_ascii=False))
            sb.append(":")
            sb.append(json.dumps(v, ensure_ascii=False))
            first = False
        sb.append('},"a":{')
        first = True
        for k, v in s.attributes.items():
            if not first:
                sb.append(",")
            sb.append(json.dumps(k, ensure_ascii=False))
            sb.append(":")
            sb.append(json.dumps(v, ensure_ascii=False))
            first = False
        sb.append('},"i":"')
        sb.append(str(s.labels_id & mask))
        sb.append('","la":')
        sb.append(str(s.last_activity))
        sb.append(',"v":[')
        out.append("".join(sb))
        for i, (ts, lat, lon, elev, value) in enumerate(s.points):
            if i:
                out.append(",")
            row = ["[", str(ts)]
            if lat is not None and lon is not None:
                row.append(",")
                row.append(java_double_str(float(lat)))
                row.append(",")
                row.append(java_double_str(float(lon)))
            if elev is not None:
                row.append(",")
                row.append(str(elev))
            row.append(",")
            row.append(_jnum(value))
            row.append("]")
            out.append("".join(row))
    if not firstgts:
        out.append("]}")
    out.append("]")
    return "".join(out)
