"""Driver-side GTS text line codec — GTSHelper.parse / GTSDecoder.dump.

The distributed ingest path (sources/gts_text.py) parses the same format
as Column expressions, but two features of the wire format are inherently
sequential and driver-side in the reference too:

- ``=``-continuation lines (GTSHelper.parse:2694-2704): a line starting
  with '=' inherits class/labels from the previous line of the SAME
  stream — meaningful only where line order exists (an UPDATE body, a
  dump file), not in a split-parallel scan.
- binary values ``b64:...`` / ``hex:...`` (GTSHelper.parseValue:3507-3541)
  decode to byte[] — carried here as Python bytes feeding
  core/gtscodec.encode_gts, which has a first-class binary type.

``dump_points`` is the exact inverse: GTSDecoder.dump's text form
(GTSDecoder.java:595-640), '='-continuations included, as exercised by
GTSDecoderTest.testDecoder_dump and GTSEncoderTest.testParse.
"""

from __future__ import annotations

import base64
import binascii
import re
from decimal import Decimal

from warp10_platform_spark.core.geoxp import from_geoxp, to_geoxp
from warp10_platform_spark.core.gtscodec import parse_numeric_value

# TS/LAT:LON/ELEV class{labels} value (GTSHelper.java MEASUREMENT_RE)
_LINE_RE = re.compile(
    r"^([0-9-]+)?/(?:([0-9.eE+-]+):([0-9.eE+-]+))?/([0-9-]+)?"
    r"\s+([^\s{]+)\{([^}]*)\}\s+(.+)$"
)
_CONT_RE = re.compile(r"^=([0-9-]+)?/(?:([0-9.eE+-]+):([0-9.eE+-]+))?/([0-9-]+)?\s+(.+)$")
_BOOL_RE = re.compile(r"^(T|F|true|false)$", re.IGNORECASE)


def parse_value(valuestr: str):
    """GTSHelper.parseValue: quoted STRING, T/F BOOLEAN, b64:/hex: byte[],
    then the numeric tail (long / <=15-char BigDecimal / double)."""
    if len(valuestr) >= 2 and valuestr[0] in "'\"" and valuestr[-1] == valuestr[0]:
        return valuestr[1:-1]
    if _BOOL_RE.match(valuestr):
        return valuestr[0] in "Tt"
    if valuestr.startswith("b64:"):
        pad = "=" * (-len(valuestr[4:]) % 4)
        return base64.urlsafe_b64decode(valuestr[4:] + pad)
    if valuestr.startswith("hex:"):
        return binascii.unhexlify(valuestr[4:])
    return parse_numeric_value(valuestr)


def parse_lines(lines, default_ts: int | None = None):
    """Parse a sequence of GTS input lines (CRLF-tolerant) into point
    dicts {class, labels, ts, value, elevation, location}. '='-prefixed
    continuation lines inherit class/labels from the previous point."""
    out = []
    prev = None
    for raw in lines:
        line = raw.strip()
        if not line or line.startswith("#"):
            continue
        if line.startswith("="):
            if prev is None:
                raise ValueError("continuation line with no previous point")
            m = _CONT_RE.match(line)
            if not m:
                raise ValueError(f"unparseable continuation: {line!r}")
            tss, lat, lon, elev, vs = m.groups()
            cls, labels = prev["class"], prev["labels"]
        else:
            m = _LINE_RE.match(line)
            if not m:
                raise ValueError(f"unparseable line: {line!r}")
            tss, lat, lon, elev, cls, labelstr, vs = m.groups()
            labels = dict(
                kv.split("=", 1) for kv in labelstr.split(",") if "=" in kv
            ) if labelstr else {}
        point = {
            "class": cls,
            "labels": labels,
            "ts": int(tss) if tss else default_ts,
            "value": parse_value(vs),
            "elevation": int(elev) if elev else None,
            "location": to_geoxp(float(lat), float(lon)) if lat and lon else None,
        }
        out.append(point)
        prev = point
    return out


def _format_value(value) -> str:
    if isinstance(value, bool):
        return "T" if value else "F"
    if isinstance(value, bytes):
        return "b64:" + base64.urlsafe_b64encode(value).decode("ascii").rstrip("=")
    if isinstance(value, str):
        return f"'{value}'"
    if isinstance(value, (int, float, Decimal)):
        return str(float(value)) if isinstance(value, (float, Decimal)) and not isinstance(value, int) else str(value)
    raise TypeError(f"unsupported value type {type(value).__name__}")


def dump_points(name: str, labels: dict, points) -> str:
    """GTSDecoder.dump: first line carries class{labels}, subsequent
    lines are '='-continuations; each point renders as
    TS/LAT:LON/ELEV VALUE with geo/elevation blank when absent.
    points: iterables of (ts, value, elevation|None, location|None)."""
    lines = []
    labelstr = ",".join(f"{k}={v}" for k, v in sorted(labels.items()))
    for i, p in enumerate(points):
        ts, value = p[0], p[1]
        elev = p[2] if len(p) > 2 else None
        loc = p[3] if len(p) > 3 else None
        if loc is not None:
            lat, lon = from_geoxp(loc)
            geo = f"{lat}:{lon}"
        else:
            geo = ""
        head = f"{ts}/{geo}/{elev if elev is not None else ''}"
        if i == 0:
            lines.append(f"{head} {name}{{{labelstr}}} {_format_value(value)}")
        else:
            lines.append(f"={head} {_format_value(value)}")
    return "\r\n".join(lines) + ("\r\n" if lines else "")
