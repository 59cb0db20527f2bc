"""Reference-authored GTS text-format goldens over the driver-side line
codec (core/gts_line.py):

- GTSEncoderTest.java:698-740  testParse — '='-continuations, b64:/hex:
  binary values, BigDecimal typing, through the wire encoder and back
- GTSDecoderTest.java:437-454  testDecoder_dump — the exact dump string
- GTSEncoderTest.java:534-559  testWARP50 input lines end-to-end
"""

from decimal import Decimal

from warp10_platform_spark.core.gts_line import dump_points, parse_lines, parse_value
from warp10_platform_spark.core.gtscodec import decode_gts, encode_gts

PARSE_GOLDEN = (
    "0/-90.0:-180.0/0 gts{} F\r\n"
    "=1/-90.0:-180.0/0 1\r\n"
    "=2/-90.0:-180.0/0 2.0\r\n"
    "=3/-90.0:-180.0/0 '3'\r\n"
    "=4/-90.0:-180.0/0 b64:6Q\r\n"
    "=5// hex:404142\r\n"
)


def test_parse_golden_values():
    pts = parse_lines(PARSE_GOLDEN.splitlines())
    assert [p["ts"] for p in pts] == [0, 1, 2, 3, 4, 5]
    assert all(p["class"] == "gts" and p["labels"] == {} for p in pts)
    vals = [p["value"] for p in pts]
    assert vals[0] is False
    assert vals[1] == 1 and isinstance(vals[1], int)
    assert vals[2] == Decimal("2.0") and isinstance(vals[2], Decimal)
    assert vals[3] == "3"
    assert vals[4] == "é".encode("latin-1")
    assert vals[5] == b"@AB"
    # geo carried on the first five lines, absent on the sixth
    assert pts[0]["location"] == 0 and pts[5]["location"] is None
    assert pts[0]["elevation"] == 0 and pts[5]["elevation"] is None


def test_parse_roundtrips_through_wire_encoder():
    pts = parse_lines(PARSE_GOLDEN.splitlines())
    blob = encode_gts([(p["ts"], p["value"], p["elevation"], p["location"]) for p in pts])
    out = decode_gts(blob, with_location=True, decimal_values=True)
    assert [p[1] for p in out] == [False, 1, Decimal("2.0"), "3", b"\xe9", b"@AB"]
    assert [p[0] for p in out] == [0, 1, 2, 3, 4, 5]


DUMP_GOLDEN = (
    "0/-90.0:-180.0/0 {} F\r\n"
    "=1/-90.0:-180.0/0 1\r\n"
    "=2/-90.0:-180.0/0 2.0\r\n"
    "=3/-90.0:-180.0/0 '3'\r\n"
    "=4/-90.0:-180.0/0 b64:6Q\r\n"
)


def test_dump_golden():
    # GTSDecoderTest.testDecoder_dump: addValue(ts, 0L, 0L, v) x 5
    pts = [
        (0, False, 0, 0),
        (1, 1, 0, 0),
        (2, 2.0, 0, 0),
        (3, "3", 0, 0),
        (4, "é".encode("latin-1"), 0, 0),
    ]
    assert dump_points("", {}, pts) == DUMP_GOLDEN


def test_dump_parse_roundtrip():
    pts = [
        (0, False, 0, 0),
        (1, 1, None, None),
        (2, 2.5, 7, None),
        (3, "x y", None, 0),
        (4, b"\x00\xff", 0, 0),
    ]
    dumped = dump_points("klass", {"a": "1", "b": "2"}, pts)
    back = parse_lines(dumped.splitlines())
    assert all(p["class"] == "klass" and p["labels"] == {"a": "1", "b": "2"} for p in back)
    assert [p["ts"] for p in back] == [0, 1, 2, 3, 4]
    vals = [p["value"] for p in back]
    assert vals[0] is False and vals[1] == 1
    assert isinstance(vals[2], Decimal) and float(vals[2]) == 2.5
    assert vals[3] == "x y" and vals[4] == b"\x00\xff"
    assert [p["elevation"] for p in back] == [0, None, 7, None, 0]
    assert [p["location"] for p in back] == [0, None, None, 0, 0]


def test_warp50_lines():
    lines = ["0// gts{} 10000000.000000"] + ["=0// -20000000.000000",
             "=0// 10000000.000000", "=0// -20000000.000000"]
    pts = parse_lines(lines)
    vals = [p["value"] for p in pts]
    assert isinstance(vals[0], Decimal) and isinstance(vals[1], float)
    out = decode_gts(encode_gts([(p["ts"], p["value"]) for p in pts]), decimal_values=True)
    assert isinstance(out[0][1], Decimal) and float(out[0][1]) == 10000000.0
    assert isinstance(out[1][1], float) and out[1][1] == -20000000.0
    assert isinstance(out[2][1], Decimal)
    assert isinstance(out[3][1], float)


def test_parse_value_edge_cases():
    assert parse_value("'quoted'") == "quoted"
    assert parse_value('"double"') == "double"
    assert parse_value("true") is True and parse_value("F") is False
    assert parse_value("hex:00ff") == b"\x00\xff"
    assert parse_value("b64:QUJD") == b"ABC"
