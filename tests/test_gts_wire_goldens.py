"""Reference-authored GTS wire-format conformance goldens.

Adopts the assertions of the reference's own encoder/decoder tests
verbatim (values, expected hex bytes, expected sizes):

- GTSEncoderTest.java:309-393  testEncoding — 10 exact hex byte vectors
- GTSEncoderTest.java:263-277  testDelete
- GTSEncoderTest.java:280-306  testAddValue_IntermittentLocation
- GTSEncoderTest.java:396-418  testEncodingConsistency (100k points x 2 bases)
- GTSEncoderTest.java:421-492  testSafeDelta — exact size progression
- GTSEncoderTest.java:534-559  testWARP50 — BigDecimal/Double parse alternation
- GTSEncoderTest.java:624-672  testBINARY — byte[]/String dedup sizes
- GTSEncoderTest.java:49-94    testAddValue_encrypted — 26-byte AES-wrapped blob
- GTSEncoderTest.java:96-209   testGetDecoder / testMerge — BigDecimal roundtrip
- GTSDecoderTest.java:44-82    testDecoder_encrypted — skip without key
- GTSDecoderTest.java:388-410  testDecoder_getEncoder3 — exact sizes 13/19
- GTSDecoderTest.java:85-289   testDecoder_random_* — typed roundtrips (seeded)

Our encoder is a one-shot stream writer, so the reference's stateful
addValue sequences map to point lists; the reallocated-encoder safe-delta
state maps to encode_gts(first_ts_raw=True) on the tail points.
"""

import random
import struct
from decimal import Decimal

from warp10_platform_spark.core.gtscodec import (
    decode_gts,
    encode_gts,
    encrypt_gts,
    parse_numeric_value,
)


def _hex(points, base=0, **kw):
    return encode_gts(points, base=base, **kw).hex()


# --- GTSEncoderTest.testEncoding: the 10 golden hex vectors ---

def test_encoding_hex_goldens():
    # single long at the base timestamp
    assert _hex([(0, 1)]) == "2c02"
    # timestamp raw encoded (>= 2^48 from base and no previous)
    assert _hex([(0x0123456789ABCDEF, 1)]) == "6c0123456789abcdef02"
    # timestamp zigzag delta from base (just under 2^48)
    assert _hex([((1 << 48) - 1, 1)]) == "4cfeffffffffff7f02"
    # two values: ts delta-previous, long delta-previous
    assert _hex([(0, 1), (1, 2)]) == "2c024e0202"
    # two values: identical long
    assert _hex([(0, 1), (1, 1)]) == "2c024902"
    # double, IEEE754 (NaN canonical bits)
    assert _hex([(0, float("nan"))]) == "347ff8000000000000"
    # BigDecimal compact form: scale byte 0 + zigzag unscaled 1
    assert _hex([(0, Decimal("1.0"))]) == "300002"
    # location raw then zigzag delta (the Java literals are negative
    # two's-complement longs: 0xb000000000000001L etc.)
    loc1 = struct.unpack(">q", bytes.fromhex("b000000000000001"))[0]
    loc2 = struct.unpack(">q", bytes.fromhex("b000000000000002"))[0]
    assert _hex([(0, 0, None, loc1), (1, 1, None, loc2)]) == "ac40b00000000000000100cc60020202"
    # elevation raw then zigzag delta-previous
    assert (
        _hex([(0, 0, 0x7000000000000001, None), (1, 1, 0x7000000000000002, None)])
        == "ac08700000000000000100cc0e020202"
    )
    # location + elevation together
    assert (
        _hex([(0, 0, 0x7000000000000001, loc1), (1, 1, 0x7000000000000002, loc2)])
        == "ac48b000000000000001700000000000000100cc6e02020202"
    )


# --- GTSEncoderTest.testDelete ---

def test_delete_marker_roundtrip():
    blob = encode_gts([(1, None, 3, 2)])  # location/elevation dropped on deletes
    pts = decode_gts(blob, with_location=True)
    assert pts == [(1, None, None, None)]


# --- GTSEncoderTest.testAddValue_IntermittentLocation ---

def test_intermittent_location():
    pts_in = [
        (1, 1, 10, 1),
        (2, 2, 20, 2),
        (3, 3, 30, None),
        (4, 4, None, None),
        (5, 5, 50, 5),
    ]
    blob = encode_gts([(t, v, e, l) for t, v, e, l in pts_in])
    out = decode_gts(blob, with_location=True)
    assert [(p[3], p[2]) for p in out] == [(1, 10), (2, 20), (None, 30), (None, None), (5, 50)]


# --- GTSEncoderTest.testEncodingConsistency: 100k points, both bases ---

def test_encoding_consistency_100k():
    for base in (0, 1):
        pts = [(i, i * 1000, i * 100, i * 10) for i in range(100000)]
        blob = encode_gts(pts, base=base)
        out = decode_gts(blob, base=base, with_location=True)
        assert len(out) == 100000
        for i, (ts, v, e, l) in enumerate(out):
            assert (ts, v, e, l) == (i, i * 1000, i * 100, i * 10)


# --- GTSEncoderTest.testSafeDelta: exact size progression 13..57 ---

def test_safe_delta_sizes():
    # addValue(ts, location, elevation, value) -> (ts, value, elev, loc)
    first = encode_gts([(1, 4, 3, 2)])
    assert len(first) == 13
    # encoder reallocated from bytes: safe-delta state (no valid last
    # values, first timestamp raw) for everything added afterwards
    tail_pts = [
        (2, 4, None, None),
        (3, 4, None, 4),
        (4, 4, 4, None),
        (5, 9, 4, 6),
        (6, 9, 4, 4),
        (7, 9, 4, 4),
    ]
    expected_cumulative = [23, 34, 38, 50, 54, 57]
    for k, want in enumerate(expected_cumulative, start=1):
        tail = encode_gts(tail_pts[:k], first_ts_raw=True)
        assert len(first) + len(tail) == want, f"after point {k + 1}"
    # and the whole stream round-trips
    out = decode_gts(first + encode_gts(tail_pts, first_ts_raw=True), with_location=True)
    assert [p[0] for p in out] == [1, 2, 3, 4, 5, 6, 7]
    assert [p[1] for p in out] == [4, 4, 4, 4, 9, 9, 9]
    assert [p[2] for p in out] == [3, None, None, 4, 4, 4, 4]
    assert [p[3] for p in out] == [2, None, 4, None, 6, 4, 4]


# --- GTSEncoderTest.testWARP50: parse heuristic + type alternation ---

def test_warp50_parse_alternation():
    v1 = parse_numeric_value("10000000.000000")   # 15 chars -> BigDecimal
    v2 = parse_numeric_value("-20000000.000000")  # 16 chars -> Double
    assert isinstance(v1, Decimal) and isinstance(v2, float)
    blob = encode_gts([(0, v1), (0, v2), (0, v1), (0, v2)])
    out = decode_gts(blob, decimal_values=True)
    assert isinstance(out[0][1], Decimal) and float(out[0][1]) == 10000000.0
    assert isinstance(out[1][1], float) and out[1][1] == -20000000.0
    assert isinstance(out[2][1], Decimal) and float(out[2][1]) == 10000000.0
    assert isinstance(out[3][1], float) and out[3][1] == -20000000.0


def test_parse_numeric_value_rules():
    assert parse_numeric_value("42") == 42 and isinstance(parse_numeric_value("42"), int)
    assert parse_numeric_value("-7") == -7
    assert isinstance(parse_numeric_value("1.5"), Decimal)
    # scientific notation / NaN never take the decimal path
    assert isinstance(parse_numeric_value("1.5e3"), float)
    assert parse_numeric_value("NaN") != parse_numeric_value("NaN")
    # > 15 chars falls back to double
    assert isinstance(parse_numeric_value("123456789.1234567"), float)


# --- GTSEncoderTest.testBINARY: byte[]/String latin-1 dedup sizes ---

def test_binary_string_dedup_sizes():
    e_acute = "é".encode("latin-1")  # single byte 0xE9
    assert len(encode_gts([(0, e_acute), (0, e_acute)])) == 4
    assert len(encode_gts([(0, e_acute)])) == 3
    # byte[] '@' / String '@' / byte[] '@': identical latin-1 content
    # dedups to the IDENTICAL flag but keeps each type bit
    blob = encode_gts([(0, b"@"), (0, "@"), (0, b"@")])
    assert len(blob) == 5
    vals = [p[1] for p in decode_gts(blob)]
    assert vals == [b"@", "@", b"@"]  # GTSDecoderTest.testDecoder_duplicateBinary
    assert [type(v) for v in vals] == [bytes, str, bytes]


def test_binary_roundtrip_e_acute():
    blob = encode_gts([(0, "é".encode("latin-1")), (1, "è".encode("latin-1"))])
    out = decode_gts(blob)
    assert out[0][1] == b"\xe9" and out[1][1] == b"\xe8"


# --- GTSEncoderTest.testAddValue_encrypted / GTSDecoderTest.testDecoder_encrypted ---

def test_encrypted_encoder_26_bytes():
    now = 1700000000000000
    key = bytes(32)
    stream = encode_gts([(now, 1), (now + 1000000, 2)], base=now - 1000000)
    encrypted = encrypt_gts(stream, key)
    assert len(encrypted) == 26
    assert encrypted[0] == 0x00  # FLAGS_ENCRYPTED marker
    # decodes with the key...
    out = decode_gts(encrypted, base=now - 1000000, key=key, with_location=True)
    assert out == [(now, 1, None, None), (now + 1000000, 2, None, None)]
    # ...and yields nothing without it
    assert decode_gts(encrypted, base=now - 1000000) == []


# --- GTSEncoderTest.testGetDecoder / testMerge: BigDecimal + geo roundtrip ---

def test_bigdecimal_geo_roundtrip():
    now = 1700000000000000
    pts = [(now, Decimal("1.11"), 11, 111), (now + 1000000, Decimal("2.22"), 22, 222)]
    out = decode_gts(encode_gts(pts, base=now - 1000000), base=now - 1000000,
                     with_location=True, decimal_values=True)
    assert out == [(now, Decimal("1.11"), 11, 111), (now + 1000000, Decimal("2.22"), 22, 222)]


def test_merge_streams():
    # merge = decode+replay of encoder2 into encoder1 (same output order)
    now = 1700000000000000
    pts1 = [(now, Decimal("1.11"), 11, 111), (now + 1000000, Decimal("2.22"), 22, 222)]
    pts2 = [(now, Decimal("3.33"), None, None), (now + 500000, Decimal("4.44"), None, None)]
    blob = encode_gts(pts1 + pts2, base=now - 1000000)
    out = decode_gts(blob, base=now - 1000000, with_location=True, decimal_values=True)
    assert [p[1] for p in out] == [Decimal("1.11"), Decimal("2.22"), Decimal("3.33"), Decimal("4.44")]
    assert [p[2] for p in out] == [11, 22, None, None]


def test_merge_fastpath_delta_reference():
    # GTSEncoderTest.testMerge_FastPath: values after a merge must delta
    # against the merged tail, not the pre-merge tail
    pts = [(1, 100, 1, 1), (2, 101, 2, 2), (3, 102, 3, 3), (4, 103, 4, 4)]
    out = decode_gts(encode_gts(pts), with_location=True)
    assert out == pts


# --- GTSDecoderTest.testDecoder_getEncoder3: exact sizes 13 and 19 ---

def test_two_point_sizes():
    p1 = [(1, 1, 1, 1)]
    p2 = [(1, 1, 1, 1), (2, 2, 2, 2)]
    assert len(encode_gts(p1)) == 13
    assert len(encode_gts(p2)) == 19  # second point is 6 bytes


# --- GTSDecoderTest.testDecoder_random_{boolean,long,double,string} ---

def _random_points(rng, n, gen_value):
    last_loc = rng.randrange(1 << 62)
    pts = []
    ts0 = 1700000000000000
    for i in range(n):
        last_loc = (last_loc + rng.randrange(1 << 62)) % (1 << 63)
        pts.append((ts0 + i, gen_value(i), rng.randrange(1000000), last_loc))
    return pts


def test_random_typed_roundtrips():
    rng = random.Random(20260815)
    cases = [
        (20000, lambda i: rng.random() > 0.5),
        (20000, lambda i: rng.randrange(-(1 << 63), 1 << 63)),
        (20000, lambda i: rng.uniform(-1e308, 1e308)),
        (1000, lambda i: str(rng.uniform(0, 1e308))),
    ]
    for n, gen in cases:
        pts = _random_points(rng, n, gen)
        out = decode_gts(encode_gts(pts), with_location=True)
        assert out == pts
