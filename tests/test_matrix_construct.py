"""TOVEC/TOMAT + matrix ops and literal series construction."""

import numpy as np
from pyspark.sql import functions as F

from warp10_platform_spark.core.construct import addvalue, makegts, newgts, removetick
from warp10_platform_spark.functions.matrix import det, inv, tomat, tovec, trace, transpose


def test_tovec_orders_by_tick(spark):
    pts = makegts(spark, "m.s", {"k": "1"}, [3_000_000, 1_000_000, 2_000_000], [30.0, 10.0, 20.0])
    out = tovec(pts).collect()
    assert out[0]["vec"] == [10.0, 20.0, 30.0]


def test_tomat_transpose_trace(spark):
    a = makegts(spark, "a", {}, [1, 2], [1.0, 2.0])
    b = makegts(spark, "b", {}, [1, 2], [3.0, 4.0])
    m = tomat(a.unionByName(b), row_key="class")
    row = m.select(F.col("mat"), transpose(F.col("mat")).alias("t"), trace(F.col("mat")).alias("tr")).collect()[0]
    assert row["mat"] == [[1.0, 2.0], [3.0, 4.0]]
    assert row["t"] == [[1.0, 3.0], [2.0, 4.0]]
    assert row["tr"] == 5.0


def test_det_inv_known_matrix(spark):
    df = spark.createDataFrame([([[4.0, 7.0], [2.0, 6.0]],)], "mat array<array<double>>")
    out = inv(det(df)).collect()[0]
    assert abs(out["det"] - 10.0) < 1e-9
    expect = np.array([[0.6, -0.7], [-0.2, 0.4]])
    assert np.allclose(np.array(out["inv"]), expect)


def test_newgts_empty_and_edits(spark):
    shell = newgts(spark, "s.x", {"k": "1"})
    assert shell.count() == 0
    pts = addvalue(shell, spark, "s.x", {"k": "1"}, 100, 1.5)
    pts = addvalue(pts, spark, "s.x", {"k": "1"}, 100, 2.5)  # overwrite same tick
    rows = pts.collect()
    assert len(rows) == 1 and rows[0]["v_double"] == 2.5
    gone = removetick(pts, "s.x", '[{"key":"k","value":"1"}]', 100)
    assert gone.count() == 0


def test_kvstore_roundtrip_and_lookup(spark, tmp_path):
    from pyspark.sql import functions as F

    from warp10_platform_spark.sources.kvstore import kv_lookup, kvload, kvstore

    path = str(tmp_path / "kv")
    kvstore(spark, path, {"a": "1", "b": "2"})
    kv = kvload(spark, path)
    df = spark.createDataFrame([("a",), ("b",), ("c",)], "k string")
    out = {r["k"]: r["kv_value"] for r in kv_lookup(df, kv, on="k").collect()}
    assert out == {"a": "1", "b": "2", "c": None}


def test_parse_literal_lines(spark):
    from warp10_platform_spark.sources.gts_text import parse

    out = parse(spark, ["123// a.b{x=1} 4.5", "456// a.b{x=1} 6"]).orderBy("ts").collect()
    assert out[0]["v_double"] == 4.5 and out[1]["v_long"] == 6


def test_geo_approximate_snaps_to_cell_center(spark):
    from warp10_platform_spark.core.schema import with_gts_id
    from warp10_platform_spark.operators.geo import geo_approximate

    df = with_gts_id(
        spark.createDataFrame(
            [("g", {"u": "1"}, 1, 45.1, 100.7, 1.0)],
            "class string, labels map<string,string>, ts long, lat double, lon double, v_double double",
        )
    )
    r = geo_approximate(df, bits=2).collect()[0]  # 4x4 cells of 45 x 90 deg
    assert r["lat"] == 67.5 and r["lon"] == 135.0  # center of cell [3,3]


def test_atbucket(spark):
    from warp10_platform_spark.core.construct import makegts
    from warp10_platform_spark.operators.reshape import atbucket

    pts = makegts(spark, "s", {}, [100, 200, 300], [1.0, 2.0, 3.0])
    assert atbucket(pts, 300, 100, 0).collect()[0]["v_double"] == 3.0
    assert atbucket(pts, 300, 100, 2).collect()[0]["v_double"] == 1.0


def test_streaming_subscribe_filters_selector(spark):
    from warp10_platform_spark.sources.gts_text import parse
    from warp10_platform_spark.streaming.ingest import subscribe

    pts = parse(spark, ["1// a.x{s=1} 1", "2// a.y{s=1} 2", "3// a.x{s=2} 3"])
    got = sorted(r["ts"] for r in subscribe(pts, "a.x{}").collect())
    assert got == [1, 3]
