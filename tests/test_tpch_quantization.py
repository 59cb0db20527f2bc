"""Precondition guard for the scaled-integer money arithmetic in
queries/tpch.py: every money/rate column must be exactly cent-quantized
(value*100 within float noise of an integer), or the round()-to-cents
recovery the fast path relies on would silently corrupt sums."""

from pyspark.sql import functions as F

from warp10_platform_spark.sources.tables import load_table

MONEY_COLS = ["l_quantity", "l_extendedprice", "l_discount", "l_tax"]


def test_lineitem_money_columns_are_cent_quantized(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    devs = li.select(
        *[
            F.max(F.abs(F.col(c) * 100 - F.round(F.col(c) * 100))).alias(c)
            for c in MONEY_COLS
        ]
    ).first()
    for c in MONEY_COLS:
        # binary-representation noise only — far inside the 0.5 recovery margin
        assert devs[c] < 1e-6, (c, devs[c])
