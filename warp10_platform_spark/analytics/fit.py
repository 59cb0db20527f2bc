"""Regression / correlation / decomposition / spectra — SURVEY §2.10.

Two tiers:
- JVM-exact tier (lr_fit, correlate_daily, exp_smooth_last): closed-form
  statistics assembled from exact DECIMAL/BIGINT sums — order-independent,
  so a DuckDB oracle reproduces them bit-for-bit, and the whole operator
  is Column expressions (codegen, partial aggregation, no Python).
- numpy tier (stl, lowess, fft, dtw): inherently sequential/iterative
  algorithms run per series via applyInPandas (Arrow batches), the same
  in-RAM-series contract the reference uses.
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from warp10_platform_spark.core import timeunits as _tuc
from warp10_platform_spark.core.apply import per_series_apply
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

SERIES_KEYS = ["gts_id", "class", "labels_key"]


def lr_fit(df: DataFrame, value_col: str = "v_double") -> DataFrame:
    """LR (functions/LR.java): per-series least-squares line value ~ time.

    x = ticks re-based to the series start (µs, BIGINT — exact sums),
    y cast DECIMAL(12,6). slope/intercept assembled in double from the
    exact sums; slope is per SECOND (x scaled at assembly, not in the
    accumulators, to keep them integral). One pass + one window min."""
    w = Window.partitionBy("gts_id")
    x = (F.col("ts") - F.min("ts").over(w)).alias("x")
    y = F.col(value_col).cast("decimal(12,6)")
    base = df.select(*SERIES_KEYS, x.alias("x"), y.alias("y"))
    mom = base.groupBy(*SERIES_KEYS).agg(
        F.count("*").alias("n"),
        F.sum("x").alias("sx"),  # bigint, exact
        F.sum(F.col("x").cast("decimal(38,0)") * F.col("x")).cast("double").alias("sxx"),
        F.sum("y").cast("double").alias("sy"),
        F.sum(F.col("x").cast("decimal(20,0)") * F.col("y")).cast("double").alias("sxy"),
    )
    n = F.col("n").cast("double")
    sx, sxx, sy, sxy = F.col("sx").cast("double"), F.col("sxx"), F.col("sy"), F.col("sxy")
    denom = n * sxx - sx * sx
    slope_us = (n * sxy - sx * sy) / denom  # per tick
    intercept = (sy - slope_us * sx) / n
    return mom.where(F.col("n") >= 2).select(
        *SERIES_KEYS,
        (slope_us * float(_tuc.UNITS_PER_S)).alias("slope"),
        intercept.alias("intercept"),
    )


def correlate_daily(a: DataFrame, b: DataFrame, value_col: str = "v_agg") -> DataFrame:
    """CORRELATE (functions/CORRELATE.java): Pearson correlation between
    two tick-aligned series sets, per matching labels_key. Exact DECIMAL
    moment sums over the inner-joined ticks → deterministic double."""
    av = a.select(F.col("labels_key"), F.col("ts"), F.col(value_col).cast("decimal(12,6)").alias("va"))
    bv = b.select(F.col("labels_key"), F.col("ts"), F.col(value_col).cast("decimal(12,6)").alias("vb"))
    j = av.join(bv, on=["labels_key", "ts"])
    mom = j.groupBy("labels_key").agg(
        F.count("*").alias("n"),
        F.sum("va").cast("double").alias("sa"),
        F.sum("vb").cast("double").alias("sb"),
        F.sum(F.col("va") * F.col("va")).cast("double").alias("saa"),
        F.sum(F.col("vb") * F.col("vb")).cast("double").alias("sbb"),
        F.sum(F.col("va") * F.col("vb")).cast("double").alias("sab"),
    )
    n = F.col("n").cast("double")
    cov = F.col("sab") - F.col("sa") * F.col("sb") / n
    var_a = F.col("saa") - F.col("sa") * F.col("sa") / n
    var_b = F.col("sbb") - F.col("sb") * F.col("sb") / n
    return mom.where((F.col("n") >= 2) & (var_a > 0) & (var_b > 0)).select(
        "labels_key", "n", (cov / F.sqrt(var_a * var_b)).alias("corr")
    )


def exp_smooth_last(df: DataFrame, alpha: float, value_col: str = "v_double") -> DataFrame:
    """SINGLEEXPONENTIALSMOOTHING (functions/SINGLEEXPONENTIALSMOOTHING.java)
    final state per series: s_0 = v_0; s_t = (1-α)s + αv. Sequential IEEE
    recurrence over the tick-ordered value array — JVM aggregate() HOF, so
    a DuckDB list_reduce with the same order reproduces it exactly."""
    arr = F.array_sort(
        F.collect_list(F.struct(F.col("ts").alias("t"), F.col(value_col).cast("double").alias("v")))
    )
    per = df.groupBy(*SERIES_KEYS).agg(arr.alias("pts"))
    smoothed = F.expr(
        f"aggregate(slice(pts, 2, size(pts) - 1), pts[0].v, (acc, p) -> acc * {1.0 - alpha}D + p.v * {alpha}D)"
    )
    return per.where(F.size("pts") >= 1).select(*SERIES_KEYS, smoothed.alias("s_last"))


_DECOMP_SCHEMA = StructType(
    [
        StructField("class", StringType()),
        StructField("labels_key", StringType()),
        StructField("ts", LongType()),
        StructField("trend", DoubleType()),
        StructField("seasonal", DoubleType()),
        StructField("resid", DoubleType()),
    ]
)


def _loess_1d(x: np.ndarray, y: np.ndarray, frac: float, xeval: np.ndarray | None = None) -> np.ndarray:
    """Local linear regression with tricube weights (LOWESS.java:36 inner
    loop; no robustness iterations)."""
    if xeval is None:
        xeval = x
    n = len(x)
    r = max(2, int(math.ceil(frac * n)))
    out = np.empty(len(xeval))
    for i, x0 in enumerate(xeval):
        d = np.abs(x - x0)
        idx = np.argpartition(d, min(r - 1, n - 1))[:r]
        dmax = d[idx].max()
        if dmax == 0:
            out[i] = y[idx].mean()
            continue
        w = (1 - (d[idx] / dmax) ** 3) ** 3
        xw, yw = x[idx], y[idx]
        sw, swx = w.sum(), (w * xw).sum()
        swy, swxy, swxx = (w * yw).sum(), (w * xw * yw).sum(), (w * xw * xw).sum()
        den = sw * swxx - swx * swx
        if den == 0:
            out[i] = swy / sw
        else:
            b = (sw * swxy - swx * swy) / den
            a = (swy - b * swx) / sw
            out[i] = a + b * x0
    return out


def _ma(v: np.ndarray, k: int) -> np.ndarray:
    """Same-length moving average with reflect padding."""
    if k <= 1:
        return v
    lo = k // 2
    hi = k - 1 - lo
    padded = np.concatenate([v[lo:0:-1], v, v[-2 : -2 - hi : -1]]) if hi > 0 else np.concatenate([v[lo:0:-1], v])
    return np.convolve(padded, np.full(k, 1.0 / k), mode="valid")


def lowess_smooth(df: DataFrame, frac: float = 0.3, value_col: str = "v_double") -> DataFrame:
    """LOWESS (functions/LOWESS.java): per-series local regression."""
    schema = StructType(
        [
            StructField("class", StringType()),
            StructField("labels_key", StringType()),
            StructField("ts", LongType()),
            StructField("v_smooth", DoubleType()),
        ]
    )

    def run(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("ts").reset_index(drop=True)
        x = pdf["ts"].to_numpy(np.float64)
        y = pdf[value_col].to_numpy(np.float64)
        return pd.DataFrame(
            {
                "class": pdf["class"],
                "labels_key": pdf["labels_key"],
                "ts": pdf["ts"],
                "v_smooth": _loess_1d(x, y, frac),
            }
        )

    return per_series_apply(df, run, schema, ("class", "labels_key", "ts", value_col))


def _loess_fold(xs: list, ys: list, frac: float) -> list:
    """Fold-exact tricube local-linear smoother shared by the
    SQL-replayable LOWESS/STL variants: neighbor selection ordered by
    (|x-x0|, x), five weighted moments as sequential left folds, tricube
    as explicit products — every operation has a term-for-term DuckDB
    twin (see queries/analytics.py LOWESS oracle)."""
    n = len(xs)
    r = max(2, int(math.ceil(frac * n)))
    out = []
    for x0 in xs:
        cand = sorted(range(n), key=lambda j: (abs(xs[j] - x0), xs[j]))[: min(r, n)]
        dmax = max(abs(xs[j] - x0) for j in cand)
        if dmax == 0.0:
            s = 0.0
            for j in cand:
                s += ys[j]
            out.append(s / len(cand))
            continue
        sw = swx = swy = swxy = swxx = 0.0
        for j in cand:
            t = abs(xs[j] - x0) / dmax
            u = 1.0 - t * t * t
            w = u * u * u
            sw += w
            swx += w * xs[j]
            swy += w * ys[j]
            swxy += w * xs[j] * ys[j]
            swxx += w * xs[j] * xs[j]
        den = sw * swxx - swx * swx
        if den == 0.0:
            out.append(swy / sw)
        else:
            b = (sw * swxy - swx * swy) / den
            a = (swy - b * swx) / sw
            out.append(a + b * x0)
    return out


def lowess_smooth_exact(df: DataFrame, frac: float = 0.3, value_col: str = "v_double") -> DataFrame:
    """LOWESS with SQL-replayable determinism (short/bucketized series):
    neighbors chosen and folded in (|x-x0|, x) order, weighted moments as
    sequential left folds — bit-identical to a DuckDB list_reduce replay.
    The numpy `lowess_smooth` remains the long-series fast path."""
    schema = StructType(
        [
            StructField("class", StringType()),
            StructField("labels_key", StringType()),
            StructField("ts", LongType()),
            StructField("v_smooth", DoubleType()),
        ]
    )

    def run(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("ts").reset_index(drop=True)
        xs = [float(t) for t in pdf["ts"]]
        ys = [float(v) for v in pdf[value_col]]
        out = _loess_fold(xs, ys, frac)
        return pd.DataFrame(
            {"class": pdf["class"], "labels_key": pdf["labels_key"], "ts": pdf["ts"], "v_smooth": out}
        )

    return per_series_apply(df, run, schema, ("class", "labels_key", "ts", value_col))


def _rloess_fold(
    xs: list, ys: list, q: int, rho: list, eval_idx: list | None = None, p: int = 1
) -> dict:
    """One robust-LOWESS pass (GTSHelper.pointwise_lowess:10573): for each
    evaluation index, select the q nearest neighbours (ties resolved to the
    smaller x, matching the reference's two-pointer `idist < jdist ? i++ :
    j--` which prefers the left point on equal distance), tricube-weight
    them scaled by the robustness weights rho (zero rho floored at 1e-6 —
    pointwise_lowess:10668), and fit a weighted polynomial of degree p.

    p == 1 uses explicit scalar moment folds accumulated in (|x-x0|, x)
    order so a DuckDB list_reduce replay is bit-identical (same shape as
    `_loess_fold`); p >= 2 falls back to a numpy weighted least-squares
    fit (Commons PolynomialCurveFitter minimises sum w_i (y_i - f)^2, so
    sqrt-weights are passed to lstsq). maxdist is scaled by q/n when
    q > n (pointwise_lowess:10637). Returns {idx: smoothed}."""
    n = len(xs)
    qq = min(q, n)
    idxs = range(n) if eval_idx is None else eval_idx
    out: dict = {}
    for i0 in idxs:
        x0 = xs[i0]
        cand = sorted(range(n), key=lambda j: (abs(xs[j] - x0), xs[j]))[:qq]
        dmax = max(abs(xs[j] - x0) for j in cand)
        if q > n:
            dmax = dmax * q / n
        if dmax == 0.0:
            s = 0.0
            for j in cand:
                s += ys[j]
            out[i0] = s / len(cand)
            continue
        if p >= 2:
            w = np.empty(len(cand))
            for widx, j in enumerate(cand):
                u = abs(xs[j] - x0) / dmax
                if u >= 1.0:
                    w[widx] = 0.0
                else:
                    t3 = 1.0 - u * u * u
                    w[widx] = t3 * t3 * t3 * (rho[j] if rho[j] != 0.0 else 0.000001)
            xa = np.array([xs[j] for j in cand])
            ya = np.array([ys[j] for j in cand])
            sw = np.sqrt(w)
            V = np.vander(xa, p + 1, increasing=True)
            beta, *_ = np.linalg.lstsq(V * sw[:, None], ya * sw, rcond=None)
            est = beta[0]
            tmp = 1.0
            for u_ in range(1, p + 1):
                tmp *= x0
                est += tmp * beta[u_]
            out[i0] = float(est)
            continue
        # Centered (centroid) form, exactly the reference's p=1 math
        # (pointwise_lowess:10694-10724): numerically safe on raw-µs
        # ticks where the raw-moment normal equations cancel out.
        ws = []
        sw_ = swx = swy = 0.0
        for j in cand:
            u = abs(xs[j] - x0) / dmax
            if u >= 1.0:
                ws.append(0.0)
                continue
            t3 = 1.0 - u * u * u
            w_ = t3 * t3 * t3 * (rho[j] if rho[j] != 0.0 else 0.000001)
            ws.append(w_)
            sw_ += w_
            swx += w_ * xs[j]
            swy += w_ * ys[j]
        ct = swx / sw_
        cv = swy / sw_
        covar = var = 0.0
        for widx, j in enumerate(cand):
            w_ = ws[widx]
            covar += w_ * (xs[j] - ct) * (ys[j] - cv)
            var += w_ * (xs[j] - ct) * (xs[j] - ct)
        covar /= sw_
        var /= sw_
        b1 = 0.0 if var == 0.0 else covar / var
        b0 = cv - ct * b1
        out[i0] = b0 + b1 * x0
    return out


def _rlowess_series(xs: list, ys: list, q: int, r: int, d: int = 0, p: int = 1) -> list:
    """Robust LOWESS over one series (GTSHelper.rlowess:10795): r
    bisquare robustifying iterations around `_rloess_fold`, with the
    reference's delta-skip optimisation — ticks within d of the last
    anchor are linearly interpolated between anchors instead of refit
    (rlowess:10895 skip/resolve walk). Residual -> rho update uses
    h = 6 * median(|resid|), rho = (1-u^2)^2 clipped at u >= 1
    (rlowess:11036-11068). A negative d collapses to 0: the reference's
    `(long) Math.pow(10,d) * (last-first)` casts the fractional power to
    long BEFORE multiplying, so the product is always 0 (RLOWESS.java:99
    operator precedence) — mirrored here for faithfulness."""
    n = len(xs)
    if d < 0:
        d = 0
    rho = [1.0] * n
    sm = [0.0] * n
    for it in range(r + 1):
        sm = [0.0] * n
        if d == 0:
            vals = _rloess_fold(xs, ys, q, rho, p=p)
            for i in range(n):
                sm[i] = vals[i]
        else:
            last_i: int | None = None
            run_last_skipped: int | None = None
            i = 0
            while i < n:
                t = xs[i]
                if i < n - 1 and last_i is not None and t - xs[last_i] <= d:
                    run_last_skipped = i
                    i += 1
                    continue
                if run_last_skipped is None:
                    sm[i] = _rloess_fold(xs, ys, q, rho, [i], p=p)[i]
                    last_i = i
                    i += 1
                else:
                    if i == n - 1 and last_i is not None and t - xs[last_i] <= d:
                        run_last_skipped = i
                    ls = run_last_skipped
                    sm[ls] = _rloess_fold(xs, ys, q, rho, [ls], p=p)[ls]
                    denom = xs[ls] - xs[last_i]
                    for s_ in range(last_i + 1, ls):
                        alpha = (xs[s_] - xs[last_i]) / denom
                        sm[s_] = alpha * sm[ls] + (1 - alpha) * sm[last_i]
                    consumed = ls == i
                    last_i = ls
                    run_last_skipped = None
                    if consumed:
                        i += 1
        if it < r:
            resid = [abs(ys[i] - sm[i]) for i in range(n)]
            srt = sorted(resid)
            med = srt[n // 2] if n % 2 == 1 else (srt[n // 2 - 1] + srt[n // 2]) / 2
            h = 6 * med
            for kk in range(n):
                if h == 0:
                    rho[kk] = 1.0
                else:
                    u = resid[kk] / h
                    if u >= 1.0:
                        rho[kk] = 0.0
                    else:
                        t_ = 1.0 - u * u
                        rho[kk] = t_ * t_
    return sm


def rlowess_smooth(
    df: DataFrame, q: int, r: int = 2, d: int = 0, p: int = 1, value_col: str = "v_double"
) -> DataFrame:
    """RLOWESS (functions/RLOWESS.java, GTSHelper.rlowess:10795): fast and
    ROBUST lowess — unlike `lowess_smooth`, runs r bisquare reweighting
    iterations so outliers are downweighted out of the local fits. Per
    series via applyInPandas; the p=1/d=0 path folds in (|x-x0|, x)
    order for bit-exact DuckDB replay (queries/robust.py oracle)."""
    schema = StructType(
        [
            StructField("class", StringType()),
            StructField("labels_key", StringType()),
            StructField("ts", LongType()),
            StructField("v_smooth", DoubleType()),
        ]
    )

    def run(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("ts").reset_index(drop=True)
        xs = [float(t) for t in pdf["ts"]]
        ys = [float(v) for v in pdf[value_col]]
        sm = _rlowess_series(xs, ys, q, r, d=d, p=p)
        return pd.DataFrame(
            {"class": pdf["class"], "labels_key": pdf["labels_key"], "ts": pdf["ts"], "v_smooth": sm}
        )

    return per_series_apply(df, run, schema, ("class", "labels_key", "ts", value_col))


def _ma_reflect_fold(v: list, k: int) -> list:
    """Same-length moving average with reflect padding, as an explicit
    ascending fold of v[mirror(i+d)] * (1/k) terms — the order a SQL
    offset-join replay reproduces exactly. mirror() reflects at both
    ends (numpy-style 'reflect': ..., v[2], v[1], v[0], v[1], ...)."""
    if k <= 1:
        return list(v)
    n = len(v)
    lo = k // 2
    inv = 1.0 / k

    def mirror(j: int) -> int:
        if j < 0:
            return -j
        if j >= n:
            return 2 * n - 2 - j
        return j

    out = []
    for i in range(n):
        s = 0.0
        for d in range(-lo, k - lo):
            s += v[mirror(i + d)] * inv
        out.append(s)
    return out


def _stl_fold_core(y: list, period: int, iterations: int = 2) -> tuple[list, list]:
    """Fold-exact STL inner loop shared by `stl_decompose_exact` and
    `hybrid_test_exact`: detrend → per-phase cycle-subseries loess →
    MA(period)×2 + MA(3) reflect low-pass → deseasonalize → trend loess.
    Returns (trend, seasonal); caller must guarantee len(y) >= 2*period."""
    n = len(y)
    x = [float(i) for i in range(n)]
    trend = [0.0] * n
    seasonal = [0.0] * n
    cyc = [0.0] * n
    for _ in range(iterations):
        detr = [y[i] - trend[i] for i in range(n)]
        for ph in range(period):
            idx = list(range(ph, n, period))
            sub = [detr[i] for i in idx]
            sm = _loess_fold([float(j) for j in range(len(sub))], sub, 0.75)
            for j, i in enumerate(idx):
                cyc[i] = sm[j]
        low = _ma_reflect_fold(_ma_reflect_fold(_ma_reflect_fold(cyc, period), period), 3)
        seasonal = [cyc[i] - low[i] for i in range(n)]
        frac_t = max(0.3, 1.5 * period / n)
        trend = _loess_fold(x, [y[i] - seasonal[i] for i in range(n)], frac_t)
    return trend, seasonal


def stl_decompose_exact(df: DataFrame, period: int, value_col: str = "v_double", iterations: int = 2) -> DataFrame:
    """STL with SQL-replayable determinism: the same inner loop as
    `stl_decompose` but every loess is `_loess_fold` (ordered neighbor
    folds) and the low-pass MA chain is `_ma_reflect_fold` (ascending
    offset folds) — pure Python floats end to end, so a DuckDB oracle
    replays it bit-for-bit. Intended for short (bucketized) series."""

    def run(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("ts").reset_index(drop=True)
        y = [float(v) for v in pdf[value_col]]
        n = len(y)
        if n < 2 * period:
            nan = [float("nan")] * n
            return pd.DataFrame(
                {
                    "class": pdf["class"],
                    "labels_key": pdf["labels_key"],
                    "ts": pdf["ts"],
                    "trend": nan,
                    "seasonal": nan,
                    "resid": nan,
                }
            )
        trend, seasonal = _stl_fold_core(y, period, iterations)
        resid = [y[i] - trend[i] - seasonal[i] for i in range(n)]
        return pd.DataFrame(
            {
                "class": pdf["class"],
                "labels_key": pdf["labels_key"],
                "ts": pdf["ts"],
                "trend": trend,
                "seasonal": seasonal,
                "resid": resid,
            }
        )

    return per_series_apply(df, run, _DECOMP_SCHEMA, ("class", "labels_key", "ts", value_col))


def stl_decompose(df: DataFrame, period: int, value_col: str = "v_double", iterations: int = 2) -> DataFrame:
    """STL (functions/STL.java:36): seasonal-trend decomposition by LOESS.
    Inner loop only (no robustness weights): detrend → per-phase cycle
    subseries means smoothed → deseasonalize → trend loess. `period` in
    TICK COUNT (rows) — callers bucketize first so the series is regular,
    exactly the reference's requirement of a bucketized input."""

    def run(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("ts").reset_index(drop=True)
        y = pdf[value_col].to_numpy(np.float64)
        n = len(y)
        if n < 2 * period:
            return pd.DataFrame(
                {
                    "class": pdf["class"],
                    "labels_key": pdf["labels_key"],
                    "ts": pdf["ts"],
                    "trend": np.full(n, np.nan),
                    "seasonal": np.full(n, np.nan),
                    "resid": np.full(n, np.nan),
                }
            )
        x = np.arange(n, dtype=np.float64)
        trend = np.zeros(n)
        seasonal = np.zeros(n)
        cyc = np.empty(n)
        for _ in range(iterations):
            detr = y - trend
            for ph in range(period):
                idx = np.arange(ph, n, period)
                sub = detr[idx]
                cyc[idx] = _loess_1d(np.arange(len(sub), dtype=np.float64), sub, 0.75)
            # low-pass of the cycle-subseries (MA(period) x2 + MA(3)) strips
            # trend leakage — the classic STL step; plain centering would
            # leave low-frequency drift inside `seasonal`.
            low = _ma(_ma(_ma(cyc, period), period), 3)
            seasonal = cyc - low
            trend = _loess_1d(x, y - seasonal, max(0.3, 1.5 * period / n))
        resid = y - trend - seasonal
        return pd.DataFrame(
            {
                "class": pdf["class"],
                "labels_key": pdf["labels_key"],
                "ts": pdf["ts"],
                "trend": trend,
                "seasonal": seasonal,
                "resid": resid,
            }
        )

    return per_series_apply(df, run, _DECOMP_SCHEMA, ("class", "labels_key", "ts", value_col))


def fft_top(df: DataFrame, k: int = 3, value_col: str = "v_double") -> DataFrame:
    """FFT (continuum/gts/FFT.java): per-series real FFT; returns the top-k
    non-DC frequency bins by magnitude (regular/bucketized input assumed)."""
    schema = StructType(
        [
            StructField("class", StringType()),
            StructField("labels_key", StringType()),
            StructField("freq_bin", LongType()),
            StructField("magnitude", DoubleType()),
        ]
    )

    def run(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("ts").reset_index(drop=True)
        y = pdf[value_col].to_numpy(np.float64)
        if len(y) < 4:
            return pd.DataFrame({"class": [], "labels_key": [], "freq_bin": [], "magnitude": []}).astype(
                {"freq_bin": "int64", "magnitude": "float64", "class": "object", "labels_key": "object"}
            )
        mag = np.abs(np.fft.rfft(y - y.mean()))
        bins = np.argsort(-mag[1:])[:k] + 1
        return pd.DataFrame(
            {
                "class": pdf["class"].iloc[0],
                "labels_key": pdf["labels_key"].iloc[0],
                "freq_bin": bins.astype(np.int64),
                "magnitude": mag[bins],
            }
        )

    return per_series_apply(df, run, schema, ("class", "labels_key", "ts", value_col))


def stl_esd_test(df: DataFrame, period: int, k: int = 5, alpha: float = 0.05, value_col: str = "v_double") -> DataFrame:
    """STLESDTEST (functions/STLESDTEST.java): STL decompose, then run the
    generalized ESD test on the residual — seasonal-aware anomaly
    detection (HYBRIDTEST's core). Two applyInPandas passes, shuffle key
    unchanged (gts_id) so the second groupBy reuses the partitioning."""
    from warp10_platform_spark.analytics.stats import esd_test

    dec = stl_decompose(df, period, value_col)
    resid = dec.select(
        "class",
        "labels_key",
        F.xxhash64("class", "labels_key").alias("gts_id"),
        "ts",
        F.col("resid").alias("v_double"),
    ).where(F.col("v_double").isNotNull())
    return esd_test(resid, k=k, alpha=alpha)


def holt_smooth(df: DataFrame, alpha_num: int = 3, beta_num: int = 1, denom: int = 10,
                value_col: str = "v_double") -> DataFrame:
    """DOUBLEEXPONENTIALSMOOTHING (functions/DOUBLEEXPONENTIALSMOOTHING.java):
    Holt's linear method — level/trend recurrence per series, seeded
    l0=v0, b0=v1-v0, folded tick-ordered as a JVM aggregate() HOF
    (whole-stage codegen, no Python).

    Deviation from the reference (documented, same precedent as
    INTEGRATE): the state is kept in int64 micro-units with rational
    α=alpha_num/denom, β=beta_num/denom and floor division, so the fold
    is exact integer arithmetic — bit-identical to a DuckDB list_reduce
    (pure-double folds drift by ULPs between engines: FMA contraction)."""
    an, bn, d = int(alpha_num), int(beta_num), int(denom)
    ca, cb = d - an, d - bn
    arr = F.array_sort(
        F.collect_list(F.struct(F.col("ts").alias("t"), F.col(value_col).cast("double").alias("v")))
    )
    per = (
        df.groupBy(*SERIES_KEYS)
        .agg(arr.alias("pts"))
        .where(F.size("pts") >= 2)
        .withColumn("vs", F.expr("transform(pts, p -> CAST(floor(p.v * 1000000.0D + 0.5D) AS BIGINT))"))
    )
    lvl = f"CAST(floor(({an}L * p + {ca}L * (acc.l + acc.b)) / {d}.0D) AS BIGINT)"
    st = F.expr(
        "aggregate(slice(vs, 2, size(vs) - 1), "
        "named_struct('l', vs[0], 'b', vs[1] - vs[0]), "
        f"(acc, p) -> named_struct('l', {lvl}, 'b', "
        f"CAST(floor(({bn}L * ({lvl} - acc.l) + {cb}L * acc.b) / {d}.0D) AS BIGINT)))"
    )
    return per.select(*SERIES_KEYS, st.alias("st")).select(
        *SERIES_KEYS,
        (F.col("st.l") / F.lit(1000000.0)).alias("level"),
        (F.col("st.b") / F.lit(1000000.0)).alias("trend"),
        ((F.col("st.l") + F.col("st.b")) / F.lit(1000000.0)).alias("forecast"),
    )


def sax_discords(df: DataFrame, word_len: int = 4, alphabet: int = 4, top: int = 3, value_col: str = "v_double") -> DataFrame:
    """DISCORDS (functions/DISCORDS.java): the most unusual subsequences —
    sliding-window SAX words per position, rank by rarity of the word
    within the series, return the top rarest window starts."""
    from warp10_platform_spark.analytics.sax import BREAKPOINTS, _ALPHA

    bps = BREAKPOINTS[alphabet]
    schema = StructType(
        [
            StructField("class", StringType()),
            StructField("labels_key", StringType()),
            StructField("ts", LongType()),
            StructField("word", StringType()),
            StructField("occurrences", LongType()),
        ]
    )

    def run(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("ts").reset_index(drop=True)
        # Quantize to integer µ-units, then sequential (left-fold) mean and
        # variance — every float op is reproducible in plain SQL in the
        # same order, making the letter assignment (and thus the whole
        # discord ranking) bit-exact cross-engine. np.mean/np.std use
        # pairwise summation, which no SQL engine replays.
        yq = np.floor(pdf[value_col].to_numpy(np.float64) * 1e6 + 0.5)
        x = yq / 1e6
        n = len(x)
        if n < word_len + 1:
            return pd.DataFrame({"class": [], "labels_key": [], "ts": [], "word": [], "occurrences": []}).astype(
                {"ts": "int64", "occurrences": "int64", "class": "object", "labels_key": "object", "word": "object"}
            )
        s = 0.0
        for v in x:
            s += v
        mean = s / n
        s2 = 0.0
        for v in x:
            s2 += (v - mean) ** 2
        if s2 == 0.0:
            return pd.DataFrame({"class": [], "labels_key": [], "ts": [], "word": [], "occurrences": []}).astype(
                {"ts": "int64", "occurrences": "int64", "class": "object", "labels_key": "object", "word": "object"}
            )
        std = float(np.sqrt(s2 / (n - 1)))
        z = (x - mean) / std
        letters = np.digitize(z, bps)
        words = ["".join(_ALPHA[v] for v in letters[i : i + word_len]) for i in range(n - word_len + 1)]
        counts: dict[str, int] = {}
        for w in words:
            counts[w] = counts.get(w, 0) + 1
        order = sorted(range(len(words)), key=lambda i: (counts[words[i]], words[i], i))[:top]
        return pd.DataFrame(
            {
                "class": [pdf["class"].iloc[0]] * len(order),
                "labels_key": [pdf["labels_key"].iloc[0]] * len(order),
                "ts": pdf["ts"].to_numpy(np.int64)[order],
                "word": [words[i] for i in order],
                "occurrences": np.array([counts[words[i]] for i in order], np.int64),
            }
        )

    return per_series_apply(df, run, schema, ("class", "labels_key", "ts", value_col))


def dtw_distance(a: np.ndarray, b: np.ndarray, window: int | None = None) -> float:
    """DTW (functions/DTW.java:35): dynamic-time-warping distance between
    two value arrays (|·| point cost), optional Sakoe-Chiba band."""
    n, m = len(a), len(b)
    w = max(window, abs(n - m)) if window is not None else max(n, m)
    dp = np.full((n + 1, m + 1), np.inf)
    dp[0, 0] = 0.0
    for i in range(1, n + 1):
        lo, hi = max(1, i - w), min(m, i + w)
        for j in range(lo, hi + 1):
            cost = abs(a[i - 1] - b[j - 1])
            dp[i, j] = cost + min(dp[i - 1, j], dp[i, j - 1], dp[i - 1, j - 1])
    return float(dp[n, m])


def dtw_pairs(
    df: DataFrame, value_col: str = "v_agg", window: int | None = None, key_col: str = "labels_key"
) -> DataFrame:
    """Pairwise DTW across series of one class: series collected per
    `key_col` (bounded — bucketized input), pair join, numpy DP per pair."""
    if key_col != "labels_key":
        df = df.drop("labels_key").withColumnRenamed(key_col, "labels_key")
    per = df.groupBy("labels_key").agg(
        F.expr(
            "transform(array_sort(collect_list(named_struct('t', ts, 'v', cast(" + value_col + " AS double)))), p -> p.v)"
        ).alias("vs")
    )
    a, b = per.alias("a"), per.alias("b")
    pairs = a.join(b, F.col("a.labels_key") < F.col("b.labels_key")).select(
        F.col("a.labels_key").alias("key_a"),
        F.col("b.labels_key").alias("key_b"),
        F.col("a.vs").alias("vs_a"),
        F.col("b.vs").alias("vs_b"),
    )
    schema = StructType(
        [
            StructField("key_a", StringType()),
            StructField("key_b", StringType()),
            StructField("dtw", DoubleType()),
        ]
    )

    def run(it):
        for pdf in it:
            out = pd.DataFrame(
                {
                    "key_a": pdf["key_a"],
                    "key_b": pdf["key_b"],
                    "dtw": [
                        dtw_distance(np.asarray(x, np.float64), np.asarray(y, np.float64), window)
                        for x, y in zip(pdf["vs_a"], pdf["vs_b"])
                    ],
                }
            )
            yield out

    return pairs.mapInPandas(run, schema=schema)


def correlate_lagged(a: DataFrame, b: DataFrame, lags: list[int], step_us: int,
                     value_col: str = "v_agg", decimal_type: str = "decimal(12,6)") -> DataFrame:
    """CORRELATE (continuum/gts/CORRELATE.java): sliding cross-correlation
    — Pearson r between series a and series b shifted by each lag
    (lag * step_us on the time axis). One exploded join + grouped exact
    DECIMAL moment sums (same determinism discipline as correlate_daily);
    no per-lag rescan of either input. Callers with integral inputs
    (e.g. count series) should pass decimal_type='decimal(18,0)': DuckDB
    multiplies DECIMAL unscaled values in INT64, so scale-6 squares
    overflow once values pass ~3e3 (seen at sf1)."""
    av = a.select("labels_key", "ts", F.col(value_col).cast(decimal_type).alias("va"))
    bv = b.select("labels_key", "ts", F.col(value_col).cast(decimal_type).alias("vb"))
    lag_col = F.explode(F.array(*[F.lit(l) for l in lags])).alias("lag")
    bl = bv.select("labels_key", "ts", "vb", lag_col).withColumn(
        "ts", F.col("ts") + F.col("lag").cast("long") * F.lit(step_us)
    )
    j = av.join(bl, on=["labels_key", "ts"])
    mom = j.groupBy("labels_key", "lag").agg(
        F.count("*").alias("n"),
        F.sum("va").cast("double").alias("sa"),
        F.sum("vb").cast("double").alias("sb"),
        F.sum(F.col("va") * F.col("va")).cast("double").alias("saa"),
        F.sum(F.col("vb") * F.col("vb")).cast("double").alias("sbb"),
        F.sum(F.col("va") * F.col("vb")).cast("double").alias("sab"),
    )
    n = F.col("n").cast("double")
    cov = F.col("sab") - F.col("sa") * F.col("sb") / n
    var_a = F.col("saa") - F.col("sa") * F.col("sa") / n
    var_b = F.col("sbb") - F.col("sb") * F.col("sb") / n
    return mom.where((F.col("n") >= 2) & (var_a > 0) & (var_b > 0)).select(
        "labels_key", "lag", "n", (cov / F.sqrt(var_a * var_b)).alias("corr")
    )


_SQRT2 = 1.4142135623730951


def haar_dwt_level1(df: DataFrame, value_col: str = "v_agg") -> DataFrame:
    """FDWT, one Haar level (script/fwt/ forward wavelet transform):
    consecutive bucket pairs → (approx, detail) = ((v0+v1)/√2, (v0−v1)/√2).
    Dense pair index from row_number so missing buckets don't misalign
    pairs; odd tails are dropped (reference pads to a power of two — we
    keep only complete pairs so the oracle is exact)."""
    w = Window.partitionBy("class", "labels_key").orderBy("ts")
    d = df.withColumn("_i", F.row_number().over(w) - 1)
    pair = d.withColumn("_k", (F.col("_i") / 2).cast("long")).withColumn(
        "_side", F.col("_i") % 2
    )
    g = pair.groupBy("class", "labels_key", "_k").agg(
        F.max(F.when(F.col("_side") == 0, F.col(value_col))).alias("v0"),
        F.max(F.when(F.col("_side") == 1, F.col(value_col))).alias("v1"),
    )
    return g.where(F.col("v1").isNotNull()).select(
        "class",
        "labels_key",
        F.col("_k").alias("k"),
        ((F.col("v0") + F.col("v1")) / F.lit(_SQRT2)).alias("approx"),
        ((F.col("v0") - F.col("v1")) / F.lit(_SQRT2)).alias("detail"),
    )


def haar_idwt_level1(coeffs: DataFrame) -> DataFrame:
    """IDWT, one Haar level (script/fwt/ inverse transform): rebuild the
    pair values from (approx, detail): v0 = (a+d)/√2, v1 = (a−d)/√2.
    Exact inverse of haar_dwt_level1 up to float round-trip."""
    v0 = (F.col("approx") + F.col("detail")) / F.lit(_SQRT2)
    v1 = (F.col("approx") - F.col("detail")) / F.lit(_SQRT2)
    ex = coeffs.select(
        "class",
        "labels_key",
        F.explode(
            F.array(
                F.struct((F.col("k") * 2).alias("_i"), v0.alias("v")),
                F.struct((F.col("k") * 2 + 1).alias("_i"), v1.alias("v")),
            )
        ).alias("p"),
    )
    return ex.select("class", "labels_key", F.col("p._i").alias("i"), F.col("p.v").alias("v"))


def haar_dwt(df: DataFrame, levels: int, value_col: str = "v_agg") -> DataFrame:
    """Multi-level FDWT: re-apply the Haar level to the approximation
    channel; detail coefficients are emitted per level (standard cascade).
    Returns (class, labels_key, level, k, approx, detail) — approx rows
    only carry the final level's approximation, like the packed wavelet
    layout the reference's fwt classes use."""
    out = None
    cur = df.select("class", "labels_key", "ts", F.col(value_col).alias("_v"))
    for lvl in range(1, levels + 1):
        c = haar_dwt_level1(cur, value_col="_v")
        details = c.select(
            "class", "labels_key", F.lit(lvl).alias("level"), "k", "approx", "detail"
        )
        out = details if out is None else out.unionByName(details)
        # next level consumes this level's approximations as the series
        cur = c.select("class", "labels_key", (F.col("k")).alias("ts"), F.col("approx").alias("_v"))
    return out


def stl_esd_test_exact(
    df: DataFrame, period: int, k: int = 5, alpha: float = 0.05, value_col: str = "v_double"
) -> DataFrame:
    """STLESDTEST with SQL-replayable determinism: fold-exact STL
    residuals → fold-exact generalized ESD (see stl_decompose_exact /
    stats.esd_test(exact_moments=True))."""
    from warp10_platform_spark.analytics.stats import esd_test

    dec = stl_decompose_exact(df, period, value_col)
    resid = dec.select(
        "class",
        "labels_key",
        F.xxhash64("class", "labels_key").alias("gts_id"),
        "ts",
        F.col("resid").alias("v_double"),
    ).where(F.col("v_double").isNotNull())
    return esd_test(resid, k=k, alpha=alpha, exact_moments=True)


def _median_sorted(vals: list) -> float:
    """Median as the reference computes it (GTSOutliersHelper.hybridTest /
    rlowess): sort, middle element, or the mean of the two middles."""
    s = sorted(vals)
    n = len(s)
    return s[n // 2] if n % 2 == 1 else (s[n // 2 - 1] + s[n // 2]) / 2


def _entropy_seasonal(y: list, period: int) -> list:
    """Entropy-weighted seasonal approximation
    (GTSOutliersHelper.entropyHybridTest:699-738): per cycle phase,
    softmax-of-sqrt-zscore probabilities → normalized Shannon entropy →
    seasonal = entropy * phase mean. The more alike the phase values,
    the more seasonal is subtracted."""
    n = len(y)
    seasonal = [0.0] * n
    for ph in range(period):
        idx = list(range(ph, n, period))
        vals = [y[i] for i in idx]
        m = len(vals)
        mu = 0.0
        for v in vals:
            mu += v
        mu /= m
        ss = 0.0
        for v in vals:
            d = v - mu
            ss += d * d
        sigma = math.sqrt(ss / (m - 1)) if m > 1 else 0.0
        probs = []
        total = 0.0
        for v in vals:
            z = abs((v - mu) / sigma) if sigma != 0.0 else 1.0
            p = math.exp(math.sqrt(z))
            probs.append(p)
            total += p
        entropy = 0.0
        for p in probs:
            p /= total
            if p != 0.0:
                entropy -= p * math.log(p)
        if entropy != 0.0:
            entropy /= math.log(m)
        else:
            entropy = 1.0
        for i in idx:
            seasonal[i] = entropy * mu
    return seasonal


def hybrid_test_exact(
    df: DataFrame,
    buckets_per_period: int,
    periods_per_piece: int,
    k: int = 2,
    alpha: float = 0.05,
    value_col: str = "v_double",
    entropy: bool = False,
) -> DataFrame:
    """HYBRIDTEST (functions/HYBRIDTEST.java:110,
    GTSOutliersHelper.hybridTest:524): Twitter's Seasonal Hybrid ESD,
    PIECEWISE — the series is split into pieces of
    periods_per_piece*buckets_per_period buckets anchored at the END
    (the reference's `lb - bs*((pieces-u)*bpp-1)` window arithmetic:
    leading remainder rows are excluded), then per piece: STL seasonal
    extraction (period = buckets_per_period), subtract seasonal + the
    PIECE MEDIAN (the piecewise-median trend approximation,
    hybridTest:604-617), and run MEDIAN-mode generalized ESD
    (`ESDTest(subgts, k, true, alpha)` — hybridTest:620; sigma =
    MAD/0.6745 with sample-std fallback when MAD == 0,
    GTSOutliersHelper.madsigma:115-131).

    On series whose level shifts between pieces this differs from the
    whole-series `stl_esd_test` — that is the point of the piecewise
    test. Series shorter than one piece emit no rows (the reference
    raises; a distributed frame drops instead — documented deviation).
    All folds/medians are ordered for bit-exact DuckDB replay
    (queries/robust.py hybrid oracle).

    entropy=True is HYBRIDTEST2 (functions/HYBRIDTEST2.java:109,
    GTSOutliersHelper.entropyHybridTest:643): seasonal approximated by
    entropy-weighted phase means instead of STL."""
    from warp10_platform_spark.analytics.stats import _esd_critical

    piece_len = buckets_per_period * periods_per_piece

    def run(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("ts").reset_index(drop=True)
        n = len(pdf)
        pieces = n // piece_len
        out = {"class": [], "labels_key": [], "ts": [], "v_outlier": []}
        cls = pdf["class"].iloc[0] if n else None
        lk = pdf["labels_key"].iloc[0] if n else None
        if pieces:
            start0 = n - pieces * piece_len
            y_all = [float(v) for v in pdf[value_col]]
            ts_all = [int(t) for t in pdf["ts"]]
            for u in range(pieces):
                lo = start0 + u * piece_len
                y = y_all[lo : lo + piece_len]
                ts = ts_all[lo : lo + piece_len]
                if entropy:
                    seasonal = _entropy_seasonal(y, buckets_per_period)
                else:
                    _, seasonal = _stl_fold_core(y, buckets_per_period)
                m = _median_sorted(y)
                resid = [y[i] - seasonal[i] - m for i in range(piece_len)]
                alive = list(range(piece_len))
                cand: list[tuple[int, float, float]] = []
                for _j in range(k):
                    nn = len(alive)
                    if nn < 3:
                        break
                    vals = [resid[i] for i in alive]
                    med = _median_sorted(vals)
                    mad = _median_sorted([abs(v - med) for v in vals])
                    if mad != 0.0:
                        sig = mad / 0.6745
                    else:
                        mu = 0.0
                        for v in vals:
                            mu += v
                        mu /= nn
                        ss = 0.0
                        for v in vals:
                            dd = v - mu
                            ss += dd * dd
                        sig = math.sqrt(ss / (nn - 1))
                    if sig == 0.0:
                        break
                    best_i, best_z = -1, -1.0
                    for i in alive:
                        z = abs((resid[i] - med) / sig)
                        if z > best_z:
                            best_i, best_z = i, z
                    cand.append((best_i, best_z, _esd_critical(nn, alpha)))
                    alive.remove(best_i)
                last = -1
                for j, (_, stat, lam) in enumerate(cand):
                    if stat > lam:
                        last = j
                for i, _stat, _lam in cand[: last + 1]:
                    out["class"].append(cls)
                    out["labels_key"].append(lk)
                    out["ts"].append(ts[i])
                    out["v_outlier"].append(resid[i])
        return pd.DataFrame(out).astype(
            {"ts": "int64", "v_outlier": "float64", "class": "object", "labels_key": "object"}
        )

    schema = StructType(
        [
            StructField("class", StringType()),
            StructField("labels_key", StringType()),
            StructField("ts", LongType()),
            StructField("v_outlier", DoubleType()),
        ]
    )
    return per_series_apply(df, run, schema, ("class", "labels_key", "ts", value_col))
