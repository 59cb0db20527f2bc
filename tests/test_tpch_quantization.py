"""Precondition guard for the scaled-integer money arithmetic in
queries/tpch.py + tpch2.py: every column run through the UNSIGNED
additive cents form `CAST(x*100 + 0.5D AS BIGINT)` must be (a) exactly
cent-quantized (value*100 within float noise of an integer) and (b)
NON-NEGATIVE — the additive form truncates toward zero, so a negative
cent value m would recover as m-1 and silently corrupt sums (r9 advice:
c_acctbal is the one negative-capable money column and q22 handles it
sign-aware; everything else must stay >= 0)."""

from pyspark.sql import functions as F

from warp10_platform_spark.sources.tables import load_table

# every (table, column) the unsigned additive form touches
MONEY_COLS = [
    ("lineitem", "l_quantity"),
    ("lineitem", "l_extendedprice"),
    ("lineitem", "l_discount"),
    ("lineitem", "l_tax"),
    ("part", "p_retailprice"),
]


def test_money_columns_are_cent_quantized_and_non_negative(spark, sf_dir):
    by_table: dict[str, list[str]] = {}
    for t, c in MONEY_COLS:
        by_table.setdefault(t, []).append(c)
    for t, cols in by_table.items():
        df = load_table(spark, sf_dir, t)
        row = df.select(
            *[F.max(F.abs(F.col(c) * 100 - F.round(F.col(c) * 100))).alias(f"dev_{c}") for c in cols],
            *[F.min(F.col(c)).alias(f"min_{c}") for c in cols],
        ).first()
        for c in cols:
            # binary-representation noise only — far inside the 0.5 recovery margin
            assert row[f"dev_{c}"] < 1e-6, (t, c, row[f"dev_{c}"])
            assert row[f"min_{c}"] >= 0, (t, c, row[f"min_{c}"])
