"""REDUCE/APPLY bucketization-congruence propagation
(GTSHelper.java:8196-8247): the result of a reduce/apply is bucketized
iff every input is bucketized with the same bucketspan and congruent
lastbucket values; the merged spec covers the union grid extent."""

from __future__ import annotations

from pyspark.sql import functions as F

from warp10_platform_spark.core.frame import GTSFrame
from warp10_platform_spark.operators.bucketize import BucketSpec, merge_bucketspecs


DAY = 86_400_000_000


def test_merge_rule_pure():
    a = BucketSpec(10 * DAY, DAY, 5)
    b = BucketSpec(12 * DAY, DAY, 3)
    m = merge_bucketspecs(a, b)
    # lastbucket = max; startbucket = min(10-5, 12-3) = 5d; count = (12-5)
    assert m == BucketSpec(12 * DAY, DAY, 7)

    # same span, congruent phase, different anchor
    c = BucketSpec(10 * DAY + DAY // 2, DAY, 4)
    assert merge_bucketspecs(a, c) is None  # phase differs → unbucketized

    # differing span → unbucketized (GTSHelper.java:8213-8217)
    d = BucketSpec(10 * DAY, 2 * DAY, 5)
    assert merge_bucketspecs(a, d) is None

    # any unbucketized input → unbucketized (GTSHelper.java:8206-8209)
    assert merge_bucketspecs(a, None) is None
    assert merge_bucketspecs(None) is None

    # single input: spec passes through unchanged
    assert merge_bucketspecs(a) == a


def _mk_frame(spark, rows, spec):
    df = spark.createDataFrame(
        [(r[0], r[1], float(r[2])) for r in rows], "u string, ts long, v_agg double"
    ).select(
        F.lit("t").alias("class"),
        F.create_map(F.lit("user"), F.col("u")).alias("labels"),
        F.col("ts"),
        F.col("v_agg"),
    )
    from warp10_platform_spark.core.schema import with_gts_id

    return GTSFrame(with_gts_id(df), bucketspec=spec, value_col="v_agg")


def test_apply_propagates_merged_spec(spark):
    a = _mk_frame(spark, [("1", 2 * DAY, 1.0), ("1", 3 * DAY, 2.0)], BucketSpec(3 * DAY, DAY, 3))
    b = _mk_frame(spark, [("1", 2 * DAY, 10.0), ("1", 3 * DAY, 20.0)], BucketSpec(4 * DAY, DAY, 2))
    out = a.apply_frame(b, "op.add", by=["user"])
    assert out.bucketspec == BucketSpec(4 * DAY, DAY, 4)  # union of [0,3]d and [2,4]d grids
    got = {r["ts"]: r["v_op"] for r in out.df.collect()}
    assert got == {2 * DAY: 11.0, 3 * DAY: 22.0}
    # canonical series columns present → downstream operators consume it
    assert {"gts_id", "class", "labels_key", "labels", "ts", "v_op"} <= set(out.df.columns)


def test_apply_incongruent_is_unbucketized(spark):
    a = _mk_frame(spark, [("1", 2 * DAY, 1.0)], BucketSpec(3 * DAY, DAY, 3))
    b = _mk_frame(spark, [("1", 2 * DAY, 1.0)], BucketSpec(3 * DAY + 1, DAY, 3))
    assert a.apply_frame(b, "op.add", by=["user"]).bucketspec is None
    c = _mk_frame(spark, [("1", 2 * DAY, 1.0)], None)
    assert a.apply_frame(c, "op.add", by=["user"]).bucketspec is None


def test_reduce_then_fill_consumes_propagated_spec(spark):
    """The propagated spec is LOAD-BEARING: FILL refuses an unbucketized
    frame, so reduce → fillprevious only works because reduce_frame
    carried the congruence-merged spec through."""
    spec = BucketSpec(4 * DAY, DAY, 4)
    a = _mk_frame(
        spark,
        [("1", 2 * DAY, 1.0), ("2", 2 * DAY, 3.0), ("1", 4 * DAY, 5.0)],
        spec,
    )
    red = a.reduce_frame("reducer.sum", by=[])
    assert red.bucketspec == spec
    filled = red.fillprevious()
    got = {r["ts"]: r[red.value_col] for r in filled.df.collect()}
    # grid = {1,2,3,4}d; bucket 1d has no point → stays null (nothing previous);
    # 3d fills from 2d's reduced sum 4.0
    assert got[2 * DAY] == 4.0 and got[3 * DAY] == 4.0 and got[4 * DAY] == 5.0
    assert got[DAY] is None
