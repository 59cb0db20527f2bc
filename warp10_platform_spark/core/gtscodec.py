"""Byte-compatible GTSWrapper / GTSEncoder wire codec (stdlib only).

Implements, from the published format rules, the reference's series blob
interchange so WRAP'd blobs round-trip with a real Warp 10:

- the per-point stream of GTSEncoder.java:300-700 — flags byte
  (+continuation byte when location/elevation present), timestamp as
  raw 8-byte big-endian / zigzag-varint delta-to-base /
  delta-to-previous / equals-base, elevation raw-or-zigzag(-delta),
  values as LONG (zigzag / delta-previous / raw), DOUBLE (IEEE754 8B or
  the BigDecimal scale+unscaled compact form — both decoded, IEEE754
  emitted), BOOLEAN-in-flags, STRING (varint len + UTF-8, identical
  flag), delete markers;
- Varint.java: LEB128 unsigned + zigzag signed;
- a minimal Thrift TCompactProtocol reader/writer for the GTSWrapper and
  Metadata structs (io_warp10_continuum_store_thrift_data.thrift:23-67,
  260-300) — the protocol is a published Apache Thrift format;
- OrderPreservingBase64 (crypto/OrderPreservingBase64.java alphabet) —
  the textual form WRAP returns.

Location (GeoXPPoint) columns are carried only when a precomputed GeoXP
long is supplied: the lat/lon→GeoXP mapping lives in the external GeoXP
library, not the reference tree, so synthesizing it here could not be
byte-verified. Elevation, all four value types, and every timestamp
mode are fully supported.
"""

from __future__ import annotations

import gzip
import struct
from decimal import Decimal

NO_ELEVATION = -(1 << 63)

# --- flag constants (GTSEncoder.java:49-133) ---
FLAGS_CONTINUATION = 0x80
MASK_TIMESTAMP = 0x60
TS_ZIGZAG_DELTA_PREVIOUS = 0x00
TS_EQUALS_BASE = 0x20
TS_ZIGZAG_DELTA_BASE = 0x40
TS_RAW_ABSOLUTE = 0x60
MASK_TYPE = 0x18
TYPE_BOOLEAN = 0x00
TYPE_LONG = 0x08
TYPE_DOUBLE = 0x10
TYPE_STRING = 0x18
STRING_BINARY = 0x02
BOOLEAN_TRUE = 0x04
BOOLEAN_FALSE = 0x02
DELETE_MARKER = 0x07
LONG_ZIGZAG = 0x04
LONG_DELTA_PREVIOUS = 0x02
DOUBLE_IEEE754 = 0x04
VALUE_IDENTICAL = 0x01
LOC_LOCATION = 0x40
LOC_ZIGZAG_DELTA = 0x20
LOC_IDENTICAL = 0x10
ELEV_PRESENT = 0x08
ELEV_ZIGZAG = 0x04
ELEV_DELTA_PREVIOUS = 0x02
ELEV_IDENTICAL = 0x01

_LIM48 = 1 << 48


# --- Varint (LEB128 + zigzag), Varint.java ---

def write_uvarint(out: bytearray, v: int) -> None:
    v &= (1 << 64) - 1
    while v & ~0x7F:
        out.append((v & 0x7F) | 0x80)
        v >>= 7
    out.append(v & 0x7F)


def write_svarint(out: bytearray, v: int) -> None:
    write_uvarint(out, ((v << 1) ^ (v >> 63)) & ((1 << 64) - 1))


def read_uvarint(buf: bytes, pos: int) -> tuple[int, int]:
    shift = v = 0
    while True:
        b = buf[pos]
        pos += 1
        v |= (b & 0x7F) << shift
        if not b & 0x80:
            return v & ((1 << 64) - 1), pos
        shift += 7


def read_svarint(buf: bytes, pos: int) -> tuple[int, int]:
    u, pos = read_uvarint(buf, pos)
    v = (u >> 1) ^ -(u & 1)
    return v, pos


def _to_signed64(v: int) -> int:
    v &= (1 << 64) - 1
    return v - (1 << 64) if v >= (1 << 63) else v


def _bd_strip(value: Decimal) -> Decimal:
    """BigDecimal.stripTrailingZeros: drop trailing zeros from the
    unscaled value, adjusting the exponent (Decimal.normalize does the
    same numeric-preserving rewrite; 600 -> 6E+2, 1.10 -> 1.1)."""
    return value.normalize()


def _bd_parts(value: Decimal) -> tuple[int, int]:
    """(scale, unscaledValue) a la BigDecimal: scale = -exponent."""
    sign, digits, exp = value.as_tuple()
    unscaled = int("".join(map(str, digits)) or "0")
    return -exp, -unscaled if sign else unscaled


def _java_bitlength(n: int) -> int:
    """BigInteger.bitLength: minimal two's-complement width sans sign."""
    return n.bit_length() if n >= 0 else (-n - 1).bit_length()


def parse_numeric_value(valuestr: str):
    """GTSHelper.parseValue's numeric tail (GTSHelper.java:3544-3568 +
    UnsafeString.isLong/mayBeDecimalDouble): plain integers parse as
    long; a decimal of <= 15 chars containing only [0-9.+-] parses as a
    BigDecimal (Decimal here) so the encoder can use the compact form;
    anything else (scientific notation, NaN, long decimals) is a double.
    This is the rule behind GTSEncoderTest.testWARP50's type alternation."""
    s = valuestr.strip()
    body = s[1:] if s[:1] in "+-" else s
    if body.isdigit():
        return int(s)
    if len(valuestr) <= 15 and all(c.isdigit() or c in ".+-" for c in valuestr):
        return Decimal(valuestr)
    return float(valuestr)


# --- per-point stream codec (GTSEncoder.addValue / GTSDecoder.next) ---

def encode_gts(points, base: int = 0, first_ts_raw: bool = False) -> bytes:
    """points: iterable of (ts, value), (ts, value, elevation) or
    (ts, value, elevation, location); value in {int, float, Decimal,
    bool, str, bytes, None(delete)}; location a signed-64 GeoXPPoint
    (core/geoxp.py). Decimal values use the reference's BigDecimal
    compact form (scale byte + zigzag unscaled) when the stripped scale
    fits a byte and the unscaled mantissa <= 46 bits, IEEE754 otherwise
    (GTSEncoder.java:413-438). ``first_ts_raw`` mirrors the
    noDeltaMetaTimestamp safe-delta mode of an encoder reloaded from
    bytes (GTSEncoder.java:313-326): the first timestamp is written raw.
    Returns the encoded stream (GTSWrapper field 7)."""
    out = bytearray()
    last_ts = 0
    last_long = 0
    valid_last_long = False
    last_double = None
    last_bd = None
    last_string = None
    last_elev = None
    last_loc = None
    no_delta_ts = first_ts_raw
    for p in points:
        ts, value = p[0], p[1]
        elev = p[2] if len(p) > 2 and p[2] is not None else None
        loc = p[3] if len(p) > 3 and p[3] is not None else None
        flags = 0
        # timestamp mode (encoder preference order)
        ts_payload = None  # (kind, number)
        if no_delta_ts:
            flags |= TS_RAW_ABSOLUTE
            ts_payload = ("r", ts)
            no_delta_ts = False
        elif base == ts:
            flags |= TS_EQUALS_BASE
        else:
            d_base, d_last = abs(ts - base), abs(ts - last_ts)
            if last_ts != 0 and d_last <= d_base:
                if d_last < _LIM48:
                    flags |= TS_ZIGZAG_DELTA_PREVIOUS
                    ts_payload = ("z", ts - last_ts)
                else:
                    flags |= TS_RAW_ABSOLUTE
                    ts_payload = ("r", ts)
            else:
                if d_base < _LIM48:
                    flags |= TS_ZIGZAG_DELTA_BASE
                    ts_payload = ("z", ts - base)
                else:
                    flags |= TS_RAW_ABSOLUTE
                    ts_payload = ("r", ts)
        # value typing
        val_payload = None
        if value is None:
            flags |= TYPE_BOOLEAN | DELETE_MARKER
        elif isinstance(value, bool):
            flags |= TYPE_BOOLEAN | (BOOLEAN_TRUE if value else BOOLEAN_FALSE)
        elif isinstance(value, int):
            flags |= TYPE_LONG
            if valid_last_long and value == last_long:
                flags |= VALUE_IDENTICAL
            else:
                off = value - last_long
                if valid_last_long and abs(off) < abs(value) and abs(off) < _LIM48:
                    flags |= LONG_DELTA_PREVIOUS | LONG_ZIGZAG
                    val_payload = ("z", off)
                elif abs(value) < _LIM48:
                    flags |= LONG_ZIGZAG
                    val_payload = ("z", value)
                else:
                    val_payload = ("r", value)
                last_long = value
                valid_last_long = True
        elif isinstance(value, float):
            flags |= TYPE_DOUBLE
            # lastDoubleValue is only comparable when the previous
            # floating value was NOT a BigDecimal (GTSEncoder.java:405)
            same_nan = last_double is not None and last_double != last_double and value != value
            if last_double is not None and (value == last_double or same_nan):
                flags |= VALUE_IDENTICAL
            else:
                flags |= DOUBLE_IEEE754
                val_payload = ("d", value)
                last_double = value
                last_bd = None
        elif isinstance(value, Decimal):
            flags |= TYPE_DOUBLE
            bd = _bd_strip(value)
            if last_bd is not None and bd == last_bd:
                flags |= VALUE_IDENTICAL
            else:
                scale, unscaled = _bd_parts(bd)
                if not (-128 <= scale <= 127) or _java_bitlength(unscaled) > 46:
                    # scale or mantissa too wide: fall back to IEEE754
                    flags |= DOUBLE_IEEE754
                    val_payload = ("d", float(value))
                    last_double = float(value)
                    last_bd = None
                else:
                    val_payload = ("D", (scale, unscaled))
                    last_bd = bd
                    last_double = None
        elif isinstance(value, (str, bytes)):
            flags |= TYPE_STRING
            raw = value.encode("utf-8") if isinstance(value, str) else bytes(value)
            if isinstance(value, bytes):
                flags |= STRING_BINARY
            # identity compares latin-1 content, so a byte[] and a String
            # with the same ISO-8859-1 text dedup to the IDENTICAL flag
            # while keeping their type bit (GTSEncoder.java:395-402)
            key = value if isinstance(value, str) else value.decode("latin-1")
            if last_string is not None and key == last_string:
                flags |= VALUE_IDENTICAL
            else:
                val_payload = ("s", raw)
            last_string = key
        else:
            raise TypeError(f"unsupported value type {type(value).__name__}")
        # location (GTSEncoder.java:452-481): raw GeoXPPoint, zigzag
        # wrapped delta-to-previous, or identical
        elev_flags = 0
        loc_payload = None
        if loc is not None and value is not None:
            flags |= FLAGS_CONTINUATION
            elev_flags |= LOC_LOCATION
            if last_loc is not None:
                if loc == last_loc:
                    elev_flags |= LOC_IDENTICAL
                else:
                    d = _to_signed64(loc - last_loc)
                    if abs(d) < _LIM48:
                        elev_flags |= LOC_ZIGZAG_DELTA
                        loc_payload = ("z", d)
                    else:
                        loc_payload = ("r", loc)
            else:
                loc_payload = ("r", loc)
            last_loc = loc
        else:
            last_loc = None
        # elevation
        if elev is not None and value is not None:
            flags |= FLAGS_CONTINUATION
            elev_flags |= ELEV_PRESENT
            elev_payload = None
            if last_elev is not None:
                if elev == last_elev:
                    elev_flags |= ELEV_IDENTICAL
                else:
                    d = elev - last_elev
                    if abs(d) < _LIM48:
                        elev_flags |= ELEV_DELTA_PREVIOUS | ELEV_ZIGZAG
                        elev_payload = ("z", d)
                    elif abs(elev) < _LIM48:
                        elev_flags |= ELEV_ZIGZAG
                        elev_payload = ("z", elev)
                    else:
                        elev_payload = ("r", elev)
            else:
                if abs(elev) < _LIM48:
                    elev_flags |= ELEV_ZIGZAG
                    elev_payload = ("z", elev)
                else:
                    elev_payload = ("r", elev)
            last_elev = elev
        else:
            last_elev = None

        out.append(flags)
        if flags & FLAGS_CONTINUATION:
            out.append(elev_flags)
        if ts_payload is not None:
            kind, num = ts_payload
            if kind == "r":
                out += struct.pack(">q", num)
            else:
                write_svarint(out, num)
        last_ts = ts
        # location payload precedes elevation (GTSEncoder.java:583-612)
        if loc_payload is not None:
            kind, num = loc_payload
            if kind == "z":
                write_svarint(out, num)
            else:
                out += struct.pack(">q", num)
        if elev is not None and value is not None and not (elev_flags & ELEV_IDENTICAL):
            kind, num = elev_payload
            if kind == "z":
                write_svarint(out, num)
            else:
                out += struct.pack(">q", num)
        if val_payload is not None:
            kind, num = val_payload
            if kind == "z":
                write_svarint(out, num)
            elif kind == "r":
                out += struct.pack(">q", num)
            elif kind == "d":
                out += struct.pack(">d", num)
            elif kind == "D":
                out += struct.pack(">b", num[0])
                write_svarint(out, num[1])
            else:
                write_uvarint(out, len(num))
                out += num
    return bytes(out)


def encrypt_gts(stream: bytes, key: bytes) -> bytes:
    """GTSEncoder.getBytes with a wrapping key (GTSEncoder.java:785-824):
    PKCS7-pad the plain stream to the next multiple of 8 (always 1..8
    bytes), RFC 3394 AES-keywrap, then emit the 0x00 encrypted-section
    flag + uvarint length + ciphertext.  A plaintext flag byte can never
    be exactly 0x00 (booleans always carry TRUE/FALSE/DELETE bits), which
    is what makes the marker unambiguous."""
    from warp10_platform_spark.functions.aes import wrap as _aes_wrap

    enc = _aes_wrap(key, stream)
    out = bytearray([0x00])
    write_uvarint(out, len(enc))
    out += enc
    return bytes(out)


def decode_gts(blob: bytes, base: int = 0, with_location: bool = False,
               key: bytes | None = None, decimal_values: bool = False):
    """Decode a GTSEncoder stream → list of (ts, value, elevation|None),
    or (ts, value, elevation|None, location|None) when with_location.
    Handles every flag combination, including the BigDecimal compact
    double form (returned as float, or as decimal.Decimal when
    ``decimal_values`` — the reference surfaces BigDecimal vs Double
    distinctly, GTSEncoderTest.testWARP50); encrypted sections (flag
    byte 0x00) are decrypted and spliced in when ``key`` is given,
    silently skipped otherwise — the GTSDecoder.next contract
    (GTSDecoder.java:214-262)."""
    pos = 0
    n = len(blob)
    last_ts = 0
    last_long = 0
    last_double = None
    last_string = None
    last_elev = None
    last_loc = None
    out = []
    while pos < n:
        flags = blob[pos]
        pos += 1
        if flags == 0x00:  # encrypted section
            enc_len, pos = read_uvarint(blob, pos)
            section = blob[pos : pos + enc_len]
            pos += enc_len
            if key is None:
                continue  # no key: skip the section like the reference
            from warp10_platform_spark.functions.aes import unwrap as _aes_unwrap

            # splice decrypted bytes ahead of the remaining stream;
            # decoder state (last_*) carries across like the reference
            blob = _aes_unwrap(key, section) + blob[pos:]
            pos, n = 0, len(blob)
            continue
        elev_flags = 0
        if flags & FLAGS_CONTINUATION:
            elev_flags = blob[pos]
            pos += 1
        tmode = flags & MASK_TIMESTAMP
        if tmode == TS_RAW_ABSOLUTE:
            ts = struct.unpack(">q", blob[pos : pos + 8])[0]
            pos += 8
        elif tmode == TS_EQUALS_BASE:
            ts = base
        elif tmode == TS_ZIGZAG_DELTA_BASE:
            d, pos = read_svarint(blob, pos)
            ts = _to_signed64(base + d)
        else:
            d, pos = read_svarint(blob, pos)
            ts = _to_signed64(last_ts + d)
        last_ts = ts
        # location (GeoXPPoint long — lat/lon via core/geoxp.from_geoxp)
        loc = None
        if elev_flags & LOC_LOCATION:
            if elev_flags & LOC_IDENTICAL:
                loc = last_loc
            elif elev_flags & LOC_ZIGZAG_DELTA:
                d, pos = read_svarint(blob, pos)
                loc = _to_signed64((last_loc or 0) + d)
            else:
                loc = struct.unpack(">q", blob[pos : pos + 8])[0]
                pos += 8
            last_loc = loc
        else:
            last_loc = None
        elev = None
        if elev_flags & ELEV_PRESENT:
            if elev_flags & ELEV_IDENTICAL:
                elev = last_elev
            else:
                if elev_flags & ELEV_ZIGZAG:
                    e, pos = read_svarint(blob, pos)
                else:
                    e = struct.unpack(">q", blob[pos : pos + 8])[0]
                    pos += 8
                elev = _to_signed64(e + last_elev) if (elev_flags & ELEV_DELTA_PREVIOUS) else e
            last_elev = elev
        vtype = flags & MASK_TYPE
        if vtype == TYPE_BOOLEAN:
            tf = flags & 0x07
            if tf == DELETE_MARKER:
                value = None
            elif tf == BOOLEAN_TRUE:
                value = True
            elif tf == BOOLEAN_FALSE:
                value = False
            else:
                raise ValueError(f"bad boolean flags {flags:#x}")
        elif vtype == TYPE_LONG:
            if flags & VALUE_IDENTICAL:
                value = last_long
            else:
                if flags & LONG_ZIGZAG:
                    v, pos = read_svarint(blob, pos)
                else:
                    v = struct.unpack(">q", blob[pos : pos + 8])[0]
                    pos += 8
                value = _to_signed64(v + last_long) if flags & LONG_DELTA_PREVIOUS else v
                last_long = value
        elif vtype == TYPE_DOUBLE:
            if flags & VALUE_IDENTICAL:
                value = last_double
            elif flags & DOUBLE_IEEE754:
                value = struct.unpack(">d", blob[pos : pos + 8])[0]
                pos += 8
                last_double = value
            else:
                # BigDecimal compact form: signed scale byte + zigzag unscaled
                scale = struct.unpack(">b", blob[pos : pos + 1])[0]
                pos += 1
                unscaled, pos = read_svarint(blob, pos)
                if decimal_values:
                    value = Decimal(unscaled).scaleb(-scale)
                else:
                    # correctly-rounded: parse the exact decimal string,
                    # matching BigDecimal.valueOf(unscaled, scale).doubleValue()
                    value = float(f"{unscaled}e{-scale}")
                last_double = value
        else:  # STRING
            if flags & VALUE_IDENTICAL:
                # re-type from the flags bit: the encoder dedups a byte[]
                # and a String with equal latin-1 content, so IDENTICAL
                # may switch representation (GTSDecoder.java:455,522)
                value = (
                    last_string.encode("latin-1", errors="replace")
                    if flags & STRING_BINARY
                    else last_string
                )
            else:
                ln, pos = read_uvarint(blob, pos)
                raw = blob[pos : pos + ln]
                pos += ln
                value = bytes(raw) if flags & STRING_BINARY else raw.decode("utf-8")
                last_string = raw.decode("latin-1") if flags & STRING_BINARY else value
        out.append((ts, value, elev, loc) if with_location else (ts, value, elev))
    return out


# --- minimal Thrift TCompactProtocol (published Apache format) ---

_CT_STOP, _CT_TRUE, _CT_FALSE, _CT_BYTE, _CT_I16, _CT_I32, _CT_I64 = 0, 1, 2, 3, 4, 5, 6
_CT_DOUBLE, _CT_BINARY, _CT_LIST, _CT_SET, _CT_MAP, _CT_STRUCT = 7, 8, 9, 10, 11, 12


def _w_field(out: bytearray, prev_id: int, fid: int, ctype: int) -> int:
    delta = fid - prev_id
    if 0 < delta <= 15:
        out.append((delta << 4) | ctype)
    else:
        out.append(ctype)
        write_svarint(out, fid)
    return fid


def _w_binary(out: bytearray, data: bytes) -> None:
    write_uvarint(out, len(data))
    out += data


def _w_strmap(out: bytearray, m: dict) -> None:
    if not m:
        out.append(0)
        return
    write_uvarint(out, len(m))
    out.append((_CT_BINARY << 4) | _CT_BINARY)
    for k, v in m.items():
        _w_binary(out, k.encode("utf-8"))
        _w_binary(out, str(v).encode("utf-8"))


def write_metadata(name: str, labels: dict, attributes: dict | None = None) -> bytes:
    out = bytearray()
    prev = 0
    prev = _w_field(out, prev, 1, _CT_BINARY)
    _w_binary(out, name.encode("utf-8"))
    prev = _w_field(out, prev, 2, _CT_MAP)
    _w_strmap(out, labels or {})
    if attributes:
        prev = _w_field(out, prev, 5, _CT_MAP)
        _w_strmap(out, attributes)
    out.append(_CT_STOP)
    return bytes(out)


def _gzip_det(data: bytes) -> bytes:
    """Deterministic gzip matching java.util.zip.GZIPOutputStream output:
    mtime=0 and OS header byte (offset 9) forced to 0x00."""
    buf = bytearray(gzip.compress(data, mtime=0))
    buf[9] = 0x00
    return bytes(buf)


def write_wrapper(
    name: str,
    labels: dict,
    encoded: bytes,
    count: int,
    base: int = 0,
    attributes: dict | None = None,
    compress: bool = False,
    compratio: float = 1.0,
    mv: bool = False,
) -> bytes:
    """GTSWrapper (thrift:260-300) in TCompactProtocol.

    Compression follows GTSWrapperHelper.fromGTSEncoderToGTSWrapper: gzip
    repeatedly while each pass's size ratio exceeds ``compratio``; if no
    pass shrinks the payload, emit uncompressed. compressionPasses (field
    10, i32) is written whenever compressed is set, like the reference.

    mv=True is the WRAPMV form (WRAP.java:92-96): metadata and count are
    unset so the blob can serve as a multivalue element."""
    payload, passes = encoded, 0
    if compress:
        while True:
            candidate = _gzip_det(payload)
            if len(payload) / len(candidate) <= compratio:
                break
            payload, passes = candidate, passes + 1
        if passes == 0:
            payload = encoded
    out = bytearray()
    prev = 0
    if not mv:
        prev = _w_field(out, prev, 1, _CT_STRUCT)
        out += write_metadata(name, labels, attributes)
    if base:
        prev = _w_field(out, prev, 6, _CT_I64)
        write_svarint(out, base)
    prev = _w_field(out, prev, 7, _CT_BINARY)
    _w_binary(out, payload)
    if not mv:
        prev = _w_field(out, prev, 8, _CT_I64)
        write_svarint(out, count)
    if passes > 0:
        prev = _w_field(out, prev, 9, _CT_TRUE)
        prev = _w_field(out, prev, 10, _CT_I32)
        write_svarint(out, passes)
    out.append(_CT_STOP)
    return bytes(out)


def _r_binary(buf: bytes, pos: int) -> tuple[bytes, int]:
    ln, pos = read_uvarint(buf, pos)
    return buf[pos : pos + ln], pos + ln


def _skip(buf: bytes, pos: int, ctype: int) -> int:
    if ctype in (_CT_TRUE, _CT_FALSE):
        return pos
    if ctype == _CT_BYTE:
        return pos + 1
    if ctype in (_CT_I16, _CT_I32, _CT_I64):
        return read_svarint(buf, pos)[1]
    if ctype == _CT_DOUBLE:
        return pos + 8
    if ctype == _CT_BINARY:
        return _r_binary(buf, pos)[1]
    if ctype == _CT_STRUCT:
        return _r_struct_skip(buf, pos)
    if ctype == _CT_MAP:
        size, pos = read_uvarint(buf, pos)
        if size == 0:
            return pos
        kv = buf[pos]
        pos += 1
        for _ in range(size):
            pos = _skip(buf, pos, kv >> 4)
            pos = _skip(buf, pos, kv & 0x0F)
        return pos
    if ctype in (_CT_LIST, _CT_SET):
        head = buf[pos]
        pos += 1
        size = head >> 4
        if size == 15:
            size, pos = read_uvarint(buf, pos)
        for _ in range(size):
            pos = _skip(buf, pos, head & 0x0F)
        return pos
    raise ValueError(f"cannot skip thrift compact type {ctype}")


def _r_struct_skip(buf: bytes, pos: int) -> int:
    prev = 0
    while True:
        head = buf[pos]
        pos += 1
        if head == _CT_STOP:
            return pos
        ctype = head & 0x0F
        if head >> 4:
            prev += head >> 4
        else:
            fid, pos = read_svarint(buf, pos)
            prev = fid
        pos = _skip(buf, pos, ctype)


def _r_strmap(buf: bytes, pos: int) -> tuple[dict, int]:
    size, pos = read_uvarint(buf, pos)
    m = {}
    if size == 0:
        return m, pos
    pos += 1  # kv types byte
    for _ in range(size):
        k, pos = _r_binary(buf, pos)
        v, pos = _r_binary(buf, pos)
        m[k.decode("utf-8")] = v.decode("utf-8")
    return m, pos


def read_metadata(buf: bytes, pos: int) -> tuple[dict, int]:
    md = {"name": "", "labels": {}, "attributes": {}}
    prev = 0
    while True:
        head = buf[pos]
        pos += 1
        if head == _CT_STOP:
            return md, pos
        ctype = head & 0x0F
        if head >> 4:
            prev += head >> 4
        else:
            prev, pos = read_svarint(buf, pos)
        if prev == 1 and ctype == _CT_BINARY:
            raw, pos = _r_binary(buf, pos)
            md["name"] = raw.decode("utf-8")
        elif prev == 2 and ctype == _CT_MAP:
            md["labels"], pos = _r_strmap(buf, pos)
        elif prev == 5 and ctype == _CT_MAP:
            md["attributes"], pos = _r_strmap(buf, pos)
        else:
            pos = _skip(buf, pos, ctype)


def write_metaset(
    expiry_ms: int,
    token: str,
    metadatas: list[bytes],
    maxduration: int | None = None,
    notbefore: int | None = None,
    notafter: int | None = None,
) -> bytes:
    """MetaSet struct (thrift:334-373) in TCompactProtocol: {1: i64
    expiry ms, 2: string token, 3: list<Metadata>, 4-6: optional i64
    maxduration/notbefore/notafter}. `metadatas` are pre-encoded
    write_metadata() blobs (each already STOP-terminated)."""
    out = bytearray()
    prev = 0
    prev = _w_field(out, prev, 1, _CT_I64)
    write_svarint(out, expiry_ms)
    prev = _w_field(out, prev, 2, _CT_BINARY)
    _w_binary(out, (token or "").encode("utf-8"))
    prev = _w_field(out, prev, 3, _CT_LIST)
    n = len(metadatas)
    if n < 15:
        out.append((n << 4) | _CT_STRUCT)
    else:
        out.append(0xF0 | _CT_STRUCT)
        write_uvarint(out, n)
    for md in metadatas:
        out += md
    for fid, val in ((4, maxduration), (5, notbefore), (6, notafter)):
        if val is not None:
            prev = _w_field(out, prev, fid, _CT_I64)
            write_svarint(out, int(val))
    out.append(_CT_STOP)
    return bytes(out)


def read_metaset(buf: bytes) -> dict:
    """Parse a MetaSet struct (inverse of write_metaset)."""
    ms = {"expiry": 0, "token": "", "metadatas": [],
          "maxduration": None, "notbefore": None, "notafter": None}
    pos = 0
    prev = 0
    while pos < len(buf):
        head = buf[pos]
        pos += 1
        if head == _CT_STOP:
            break
        ctype = head & 0x0F
        if head >> 4:
            prev += head >> 4
        else:
            prev, pos = read_svarint(buf, pos)
        if prev == 1 and ctype == _CT_I64:
            ms["expiry"], pos = read_svarint(buf, pos)
        elif prev == 2 and ctype == _CT_BINARY:
            raw, pos = _r_binary(buf, pos)
            ms["token"] = raw.decode("utf-8")
        elif prev == 3 and ctype == _CT_LIST:
            head = buf[pos]
            pos += 1
            n = head >> 4
            if n == 15:
                n, pos = read_uvarint(buf, pos)
            for _ in range(n):
                md, pos = read_metadata(buf, pos)
                ms["metadatas"].append(md)
        elif prev == 4 and ctype == _CT_I64:
            ms["maxduration"], pos = read_svarint(buf, pos)
        elif prev == 5 and ctype == _CT_I64:
            ms["notbefore"], pos = read_svarint(buf, pos)
        elif prev == 6 and ctype == _CT_I64:
            ms["notafter"], pos = read_svarint(buf, pos)
        else:
            pos = _skip(buf, pos, ctype)
    return ms


def read_wrapper(buf: bytes, inflate: bool = True) -> dict:
    """Parse a GTSWrapper struct. inflate=False skips the gzip pass —
    cheap metadata-only reads (UNWRAPSIZE pulls just the count)."""
    w = {"metadata": None, "base": 0, "encoded": b"", "count": 0, "compressed": False,
         "compressionPasses": 1}
    pos = 0
    prev = 0
    while pos < len(buf):
        head = buf[pos]
        pos += 1
        if head == _CT_STOP:
            break
        ctype = head & 0x0F
        if head >> 4:
            prev += head >> 4
        else:
            prev, pos = read_svarint(buf, pos)
        if prev == 1 and ctype == _CT_STRUCT:
            w["metadata"], pos = read_metadata(buf, pos)
        elif prev == 6 and ctype == _CT_I64:
            w["base"], pos = read_svarint(buf, pos)
        elif prev == 7 and ctype == _CT_BINARY:
            w["encoded"], pos = _r_binary(buf, pos)
        elif prev == 8 and ctype == _CT_I64:
            w["count"], pos = read_svarint(buf, pos)
        elif prev == 9:
            w["compressed"] = ctype == _CT_TRUE
        elif prev == 10 and ctype in (_CT_I16, _CT_I32, _CT_I64):
            w["compressionPasses"], pos = read_svarint(buf, pos)
        else:
            pos = _skip(buf, pos, ctype)
    if w["compressed"] and inflate:
        # GTSWrapperHelper can gzip multiple times (compressionPasses > 1)
        for _ in range(max(1, w["compressionPasses"])):
            w["encoded"] = gzip.decompress(w["encoded"])
    return w


# --- OrderPreservingBase64 (crypto/OrderPreservingBase64.java) ---

_OPB64 = ".0123456789ABCDEFGHIJKLMNOPQRSTUVWXYZ_abcdefghijklmnopqrstuvwxyz"
_OPB64_REV = {c: i for i, c in enumerate(_OPB64)}


def opb64_encode(data: bytes) -> str:
    out = []
    acc = nbits = 0
    for b in data:
        acc = (acc << 8) | b
        nbits += 8
        while nbits >= 6:
            nbits -= 6
            out.append(_OPB64[(acc >> nbits) & 0x3F])
    if nbits:
        out.append(_OPB64[(acc << (6 - nbits)) & 0x3F])
    return "".join(out)


def opb64_decode(text: str) -> bytes:
    acc = nbits = 0
    out = bytearray()
    for c in text:
        acc = (acc << 6) | _OPB64_REV[c]
        nbits += 6
        if nbits >= 8:
            nbits -= 8
            out.append((acc >> nbits) & 0xFF)
    return bytes(out)


# --- high level: WRAP / UNWRAP strings ---

def wrap_series(name: str, labels: dict, points, base: int = 0, attributes: dict | None = None,
                compress: bool = True, mv: bool = False) -> str:
    """WRAP defaults compress=true like the reference WRAP function; the
    deterministic gzip (_gzip_det) keeps output byte-stable across runs.
    mv=True is WRAPMV (no metadata/count in the wrapper)."""
    pts = list(points)
    blob = encode_gts(pts, base=base)
    return opb64_encode(write_wrapper(name, labels, blob, len(pts), base=base,
                                      attributes=attributes, compress=compress, mv=mv))


def unwrap_series(text: str, with_location: bool = False) -> dict:
    w = read_wrapper(opb64_decode(text))
    return {
        "name": w["metadata"]["name"] if w["metadata"] else "",
        "labels": w["metadata"]["labels"] if w["metadata"] else {},
        "attributes": w["metadata"]["attributes"] if w["metadata"] else {},
        "points": decode_gts(w["encoded"], base=w["base"], with_location=with_location),
        "count": w["count"],
    }
