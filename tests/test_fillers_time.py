"""Model fillers, FILLTICKS, ISO8601 durations, TSELEMENTS."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from warp10_platform_spark.core.schema import with_gts_id
from warp10_platform_spark.functions.timeutil import (
    DAY,
    HOUR,
    MINUTE,
    S,
    WEEK,
    from_tselements,
    parse_duration,
    tselements,
)
from warp10_platform_spark.operators.fill import (
    fill_akima,
    fill_spline,
    fill_trend,
    fillticks,
)


def _sparse_series(spark, pairs):
    rows = [("t.s", {"u": "1"}, int(t), v) for t, v in pairs]
    df = spark.createDataFrame(rows, "class string, labels map<string,string>, ts long, v_agg double")
    return with_gts_id(df)


def _grid_with_holes(spark, f):
    """ts 0..10 s grid; holes at 3, 7; values f(t)."""
    pairs = [(t * 1_000_000, (None if t in (3, 7) else float(f(t)))) for t in range(11)]
    return _sparse_series(spark, pairs)


def _filled(df, t):
    row = [r for r in df.collect() if r["ts"] == t * 1_000_000]
    return row[0]["v_agg"]


def test_fill_trend_recovers_line(spark):
    df = _grid_with_holes(spark, lambda t: 2.0 * t + 1.0)
    out = fill_trend(df)
    assert abs(_filled(out, 3) - 7.0) < 1e-9
    assert abs(_filled(out, 7) - 15.0) < 1e-9


def test_fill_spline_exact_on_line_close_on_quadratic(spark):
    line = fill_spline(_grid_with_holes(spark, lambda t: 3.0 * t))
    assert abs(_filled(line, 3) - 9.0) < 1e-9
    quad = fill_spline(_grid_with_holes(spark, lambda t: t * t))
    assert abs(_filled(quad, 3) - 9.0) < 0.2  # natural spline ≈ quadratic interior


def test_fill_akima_on_line(spark):
    out = fill_akima(_grid_with_holes(spark, lambda t: 5.0 - t))
    assert abs(_filled(out, 7) - (-2.0)) < 1e-9


def test_fillticks_adds_missing_ticks(spark):
    df = _sparse_series(spark, [(0, 1.0), (2_000_000, 3.0)])
    out = fillticks(df, [0, 1_000_000, 2_000_000, 5_000_000])
    rows = {r["ts"]: r["v_agg"] for r in out.collect()}
    assert set(rows) == {0, 1_000_000, 2_000_000, 5_000_000}
    assert rows[1_000_000] is None and rows[0] == 1.0


def test_parse_duration():
    assert parse_duration("PT1S") == S
    assert parse_duration("PT1M") == MINUTE
    assert parse_duration("PT1.5H") == HOUR + 30 * MINUTE
    assert parse_duration("P1DT2H") == DAY + 2 * HOUR
    assert parse_duration("P2W") == 2 * WEEK
    with pytest.raises(ValueError):
        parse_duration("P1Y")  # calendar component → rejected


def test_tselements_roundtrip(spark):
    ts = 1705708800123456  # 2024-01-20T00:00:00.123456Z
    df = spark.range(1).select(F.lit(ts).alias("ts"))
    el = df.select(tselements(F.col("ts")).alias("e")).collect()[0]["e"]
    assert el == [2024, 1, 20, 0, 0, 0, 123456]
    back = df.select(
        from_tselements(F.lit(2024), F.lit(1), F.lit(20), F.lit(0), F.lit(0), F.lit(0), F.lit(123456)).alias("t")
    ).collect()[0]["t"]
    assert back == ts


def test_tselements_timezone(spark):
    ts = 1705708800000000  # midnight UTC = 01:00 Paris (winter)
    df = spark.range(1).select(F.lit(ts).alias("ts"))
    el = df.select(tselements(F.col("ts"), "Europe/Paris").alias("e")).collect()[0]["e"]
    assert el[3] == 1  # hour in Paris


def test_fill_rlowess_ignores_outlier(spark):
    from warp10_platform_spark.operators.fill import fill_lowess, fill_rlowess

    # line with one wild present point near the hole
    pairs = []
    for t in range(11):
        v = None if t == 5 else float(2.0 * t)
        if t == 4:
            v = 500.0  # outlier
        pairs.append((t * 1_000_000, v))
    df = _sparse_series(spark, pairs)
    plain = _filled(fill_lowess(df), 5)
    robust = _filled(fill_rlowess(df), 5)
    assert abs(robust - 10.0) < 1.5
    assert abs(robust - 10.0) < abs(plain - 10.0)  # robustness helped


def test_fill_newton_exact_on_cubic(spark):
    from warp10_platform_spark.operators.fill import fill_newton

    df = _grid_with_holes(spark, lambda t: t**3 - 2 * t)
    out = fill_newton(df)
    assert abs(_filled(out, 3) - (27 - 6)) < 1e-6
    assert abs(_filled(out, 7) - (343 - 14)) < 1e-6


def test_geo_polygon_ray_casting(spark):
    from pyspark.sql import functions as F

    from warp10_platform_spark.core.schema import with_gts_id
    from warp10_platform_spark.operators.geo import geo_within_polygon

    rows = [
        ("g.t", {"u": "1"}, 1, 0.5, 0.5, 1.0),   # inside unit square
        ("g.t", {"u": "1"}, 2, 1.5, 0.5, 2.0),   # outside (lat)
        ("g.t", {"u": "1"}, 3, 0.5, -0.5, 3.0),  # outside (lon)
        ("g.t", {"u": "1"}, 4, 0.25, 0.75, 4.0), # inside
    ]
    df = with_gts_id(
        spark.createDataFrame(
            rows, "class string, labels map<string,string>, ts long, lat double, lon double, v_double double"
        )
    )
    square = [(0.0, 0.0), (0.0, 1.0), (1.0, 1.0), (1.0, 0.0)]
    got = sorted(r["ts"] for r in geo_within_polygon(df, square).collect())
    assert got == [1, 4]
