"""Spectral operators: full FFT / IFFT, FFT windowing, and DWTSPLIT.

Reference semantics: continuum/gts/FFT.java (complexForward; FFT pushes
[re, im] per series, FFTAP pushes [amplitude, phase]; output ticks are the
bin index 0..n-1), continuum/gts/IFFT.java (complexInverse scaled — 1/n —
pushes the real part as one series), script/functions/FFTWINDOW.java (12
windowing algorithms applied to values, formulas mirrored EXACTLY including
the reference's own parzen/welch quirks), script/functions/DWTSPLIT.java
(packed wavelet layout split into per-level series, levellabel = level).

Spark shape: FFT/IFFT are per-series batch transforms — applyInPandas with
Arrow batches (numpy rfft is the vectorized path; one shuffle on gts keys,
which the per-series ops already share). FFTWINDOW is pure column math
(row_number + count window, whole-stage codegen, no Python).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from warp10_platform_spark.core.apply import per_series_apply
from pyspark.sql.types import DoubleType, LongType, StringType, StructField, StructType

_FFT_SCHEMA = StructType(
    [
        StructField("class", StringType()),
        StructField("labels_key", StringType()),
        StructField("gts_id", LongType()),
        StructField("ts", LongType()),
        StructField("v_a", DoubleType()),
        StructField("v_b", DoubleType()),
    ]
)


def fft_full(df: DataFrame, value_col: str = "v_double", complex_out: bool = True) -> DataFrame:
    """FFT (FFT.java:90-170): per-series complex forward FFT over the
    tick-sorted values. complex_out=True → (v_a, v_b) = (re, im) like FFT;
    False → (amplitude, phase) like FFTAP. Output tick = bin index."""

    def run(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("ts").reset_index(drop=True)
        y = pdf[value_col].to_numpy(np.float64)
        sp = np.fft.fft(y)  # complexForward: unscaled forward transform
        if complex_out:
            a, b = sp.real, sp.imag
        else:
            a, b = np.abs(sp), np.arctan2(sp.imag, sp.real)
        return pd.DataFrame(
            {
                "class": pdf["class"].iloc[0],
                "labels_key": pdf["labels_key"].iloc[0],
                "gts_id": pdf["gts_id"].iloc[0],
                "ts": np.arange(len(y), dtype=np.int64),
                "v_a": a,
                "v_b": b,
            }
        )

    return per_series_apply(df, run, _FFT_SCHEMA, ("class", "labels_key", "ts", value_col))


_IFFT_SCHEMA = StructType(
    [
        StructField("class", StringType()),
        StructField("labels_key", StringType()),
        StructField("gts_id", LongType()),
        StructField("ts", LongType()),
        StructField("v_double", DoubleType()),
    ]
)


def ifft_real(df: DataFrame, re_col: str = "v_a", im_col: str = "v_b") -> DataFrame:
    """IFFT (IFFT.java:40-96): scaled complex inverse (1/n like
    complexInverse(x, true)); pushes the REAL part, ticks 0..n-1. Input is
    one frame carrying aligned re/im columns (FFT's output shape)."""

    def run(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("ts").reset_index(drop=True)
        sp = pdf[re_col].to_numpy(np.float64) + 1j * pdf[im_col].to_numpy(np.float64)
        y = np.fft.ifft(sp).real
        return pd.DataFrame(
            {
                "class": pdf["class"].iloc[0],
                "labels_key": pdf["labels_key"].iloc[0],
                "gts_id": pdf["gts_id"].iloc[0],
                "ts": np.arange(len(y), dtype=np.int64),
                "v_double": y,
            }
        )

    return per_series_apply(df, run, _IFFT_SCHEMA, ("class", "labels_key", "ts", re_col, im_col))


def fft_window(df: DataFrame, algorithm: str, value_col: str = "v_double") -> DataFrame:
    """FFTWINDOW (FFTWINDOW.java:60-140): multiply each series' values by
    the windowing function w(n, N). Pure column math: n = rank-1 within
    the series, N = series size — one window spec, JVM codegen, no UDF.
    The parzen branch's missing |·| and the welch formula are mirrored
    from the reference verbatim (bug-compatible by design)."""
    alg = algorithm.lower()
    w = Window.partitionBy("gts_id").orderBy("ts")
    wall = Window.partitionBy("gts_id")
    n = (F.row_number().over(w) - 1).cast("double")
    N = F.count(F.lit(1)).over(wall).cast("double")
    two_pi = 2.0 * float(np.pi)
    c1 = F.cos(F.lit(two_pi) * n / (N - 1))
    c2 = F.cos(F.lit(2 * two_pi) * n / (N - 1))
    c3 = F.cos(F.lit(3 * two_pi) * n / (N - 1))
    c4 = F.cos(F.lit(4 * two_pi) * n / (N - 1))
    if alg == "blackman":
        win = F.lit(0.42) - 0.5 * c1 + 0.08 * c2
    elif alg == "blackman-harris":
        win = F.lit(0.35875) - 0.48829 * c1 + 0.14128 * c2 - 0.01168 * c3
    elif alg == "blackman-nuttall":
        win = F.lit(0.3635819) - 0.4891775 * c1 + 0.1365995 * c2 - 0.0106411 * c3
    elif alg == "flattop":
        win = F.lit(1.0) - 1.93 * c1 + 1.29 * c2 - 0.388 * c3 + 0.028 * c4
    elif alg == "hamming":
        win = F.lit(0.54) - 0.46 * c1
    elif alg == "hann":
        s = F.sin(F.lit(float(np.pi)) * n / (N - 1))
        win = s * s
    elif alg == "nuttall":
        win = F.lit(0.355768) - 0.487396 * c1 + 0.144232 * c2 - 0.012604 * c3
    elif alg == "parzen":
        x = n / (N / 2)
        win = F.when(n <= N / 4, F.lit(1.0) - 6.0 * F.pow(x, 2.0) * (F.lit(1.0) - x)).otherwise(
            2.0 * F.pow(F.lit(1.0) - x, 3.0)
        )
    elif alg == "rectangular":
        win = F.lit(1.0)
    elif alg == "sine":
        win = F.sin(F.lit(float(np.pi)) * n / (N - 1))
    elif alg == "triangular":
        win = F.lit(1.0) - F.abs((n - (N - 1) / 2) / (N / 2))
    elif alg == "welch":
        win = (n - (N - 1) / 2) / ((N - 1) / 2)
    else:
        raise ValueError(f"unknown windowing function '{algorithm}'")
    return df.withColumn(value_col, F.col(value_col) * win)


_POLY_SCHEMA = StructType(
    [
        StructField("class", StringType()),
        StructField("labels_key", StringType()),
        StructField("degree", LongType()),
        StructField("coeff", DoubleType()),
    ]
)


def polyfit(df: DataFrame, degree: int, value_col: str = "v_double") -> DataFrame:
    """POLYFIT (POLYFIT.java: commons-math PolynomialCurveFitter):
    least-squares polynomial over (tick, value), one row per coefficient
    (ascending degree). numpy lstsq per series over Arrow batches; ticks
    re-based to the series start so the Vandermonde stays conditioned."""

    def run(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("ts").reset_index(drop=True)
        x = pdf["ts"].to_numpy(np.float64)
        x = x - x[0]
        y = pdf[value_col].to_numpy(np.float64)
        c = np.polynomial.polynomial.polyfit(x, y, degree)
        return pd.DataFrame(
            {
                "class": pdf["class"].iloc[0],
                "labels_key": pdf["labels_key"].iloc[0],
                "degree": np.arange(len(c), dtype=np.int64),
                "coeff": c,
            }
        )

    return per_series_apply(df, run, _POLY_SCHEMA, ("class", "labels_key", "ts", value_col))


def dwtsplit(df: DataFrame, level_label: str = "level", value_col: str = "v_double") -> DataFrame:
    """DWTSPLIT (DWTSPLIT.java:40-110): split a packed wavelet series of
    length 2^L into per-level series — first 1 point → level L, next 2 →
    L-1, … next 2^(L-1) → 1 (the final point stays unassigned, mirroring
    the reference's walk). The level lands in a new label column; pure
    column math: rank within the series + log2 arithmetic, no UDF."""
    w = Window.partitionBy("gts_id").orderBy("ts")
    wall = Window.partitionBy("gts_id")
    d = (
        df.withColumn("_i", F.row_number().over(w) - 1)
        .withColumn("_n", F.count(F.lit(1)).over(wall))
        .withColumn("_levels", F.log2(F.col("_n")).cast("long"))
    )
    # index i in [2^k - 1, 2^(k+1) - 1) → walk group k (k = floor(log2(i+1)));
    # level value = levels - k; the last index (i = n-1) is dropped.
    grp = F.floor(F.log2(F.col("_i") + 1)).cast("long")
    return (
        d.where(F.col("_i") < F.col("_n") - 1)
        .withColumn(level_label, (F.col("_levels") - grp).cast("string"))
        .drop("_i", "_n", "_levels")
    )
