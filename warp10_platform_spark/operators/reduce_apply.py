"""REDUCE and APPLY — cross-series tick-aligned combination.

REDUCE (REDUCE.java:37; GTSHelper.reduceUnflattened:8167): partition the
GTS set into label-equivalence classes over a `bylabels` subset
(GTSHelper.partition:6770), take the union of ticks per class, and run a
reducer over all series' values at each tick. In Spark this is exactly
groupBy(*eq_labels, ts).agg(...) — Catalyst's hash aggregate gives
partial (map-side) + final aggregation for free, so the shuffle carries
per-(labels, tick) partials.

APPLY (APPLY.java:40; GTSHelper.apply:7846): same partitioning across TWO
(or N) operand GTS sets, align by tick within each equivalence class, and
apply an op. When one side has exactly one series per class it pairs with
every series of the other side (`oneToMany`, GTSHelper.java:7860-7871) —
in Spark that side is a broadcast join build side; we hint broadcast()
explicitly when the caller declares the dim side small.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from warp10_platform_spark.operators.bucketize import bucketizer_expr


def eq_label_cols(by_labels: list[str]):
    """Equivalence-class key: the selected label values (absent label →
    null, forming its own class, as the reference's partition does)."""
    return [F.element_at(F.col("labels"), k).alias(f"label_{k}") for k in by_labels]


def reduce_gts(
    df: DataFrame,
    reducer: str,
    by_labels: list[str],
    value_col: str = "v_double",
    p: float | None = None,
) -> DataFrame:
    """groupBy(eq_labels, ts) + reducer aggregate. Output: one series per
    equivalence class, tick union of the inputs."""
    keys = eq_label_cols(by_labels)
    agg = bucketizer_expr(reducer, F.col(value_col), F.col("ts"), p=p).alias("v_reduced")
    return df.groupBy(*keys, F.col("ts")).agg(agg)


_OPS = {
    # script/op/OpAdd.java:27, OpSub.java:29, OpMul.java:27, OpDiv.java:29
    "op.add": lambda a, b: a + b,
    "op.sub": lambda a, b: a - b,
    "op.mul": lambda a, b: a * b,
    "op.div": lambda a, b: a / b,
    # op/OpEQ.java:31 ... OpLE.java:31
    "op.eq": lambda a, b: a == b,
    "op.ne": lambda a, b: a != b,
    "op.gt": lambda a, b: a > b,
    "op.ge": lambda a, b: a >= b,
    "op.lt": lambda a, b: a < b,
    "op.le": lambda a, b: a <= b,
    # op/OpBoolean.java:27
    "op.and": lambda a, b: a.cast("boolean") & b.cast("boolean"),
    "op.or": lambda a, b: a.cast("boolean") | b.cast("boolean"),
}


def apply_op(
    left: DataFrame,
    right: DataFrame,
    op: str,
    by_labels: list[str],
    value_col: str = "v_double",
    broadcast_right: bool = False,
    join_type: str = "inner",
) -> DataFrame:
    """Tick-aligned equi-join on (eq_labels, ts) then the op expression.

    The reference aligns on exact ticks (applyNAryFunction:7610) —
    missing ticks on either side produce no output point, i.e. an inner
    join; `op.mask`/negmask keep left shape (left join). The oneToMany
    cardinality-1 case (GTSHelper.java:7860-7871) maps to broadcasting
    the single-series side: pass broadcast_right=True.
    """
    lkeys = [F.element_at(left["labels"], k).alias(f"label_{k}") for k in by_labels]
    rkeys = [F.element_at(right["labels"], k).alias(f"label_{k}") for k in by_labels]
    # frame-qualified refs: both operands may share lineage (self-apply),
    # so bare F.col would be ambiguous.
    l = left.select(*lkeys, left["ts"], left[value_col].alias("v_left"))
    r = right.select(*rkeys, right["ts"], right[value_col].alias("v_right"))
    if broadcast_right:
        r = F.broadcast(r)
    join_cols = [f"label_{k}" for k in by_labels] + ["ts"]
    joined = l.join(r, on=join_cols, how=join_type)
    if op == "op.mask":
        return joined.withColumn("v_op", F.when(F.col("v_right").cast("boolean"), F.col("v_left"))).where(
            F.col("v_op").isNotNull()
        )
    if op == "op.negmask":
        return joined.withColumn("v_op", F.when(~F.col("v_right").cast("boolean"), F.col("v_left"))).where(
            F.col("v_op").isNotNull()
        )
    if op not in _OPS:
        raise ValueError(f"unknown op: {op}")
    return joined.withColumn("v_op", _OPS[op](F.col("v_left"), F.col("v_right")))


def commonticks(df: DataFrame, n_series: int | None = None) -> DataFrame:
    """COMMONTICKS (COMMONTICKS.java): keep only ticks present in every
    series. Spark: count distinct series per tick == total series. The
    total is a 1-row aggregate cross-joined in (broadcast-nested-loop of a
    single row) so the whole op stays lazy — no driver-side action."""
    if n_series is not None:
        total_df = None
        pred = F.col("_n") == F.lit(n_series)
    else:
        total_df = df.agg(F.count_distinct("gts_id").alias("_total"))
        pred = F.col("_n") == F.col("_total")
    ticks = df.groupBy("ts").agg(F.count_distinct("gts_id").alias("_n"))
    if total_df is not None:
        ticks = ticks.join(F.broadcast(total_df))
    ticks = ticks.where(pred).select("ts")
    return df.join(F.broadcast(ticks), on="ts", how="inner")
