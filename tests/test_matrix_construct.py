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
