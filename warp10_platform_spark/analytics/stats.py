"""Statistical outlier tests — GRUBBSTEST / ESDTEST / ZSCORETEST
(continuum/gts/GTSOutliersHelper.java:260,329).

The tests are per-series sequential algorithms (iterative removal of the
most deviant point), so they run through applyInPandas — one Arrow batch
per series, numpy inside. The Student-t inverse CDF the critical values
need (the reference uses commons-math TDistribution) is implemented here
from the regularized incomplete beta function (standard continued-
fraction expansion; scipy is not available in this environment).
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.types import DoubleType, LongType, StringType, StructField, StructType

from warp10_platform_spark.core.apply import per_series_apply

_MAXIT, _EPS, _FPMIN = 300, 3e-16, 1e-300


def _betacf(a: float, b: float, x: float) -> float:
    qab, qap, qam = a + b, a + 1.0, a - 1.0
    c = 1.0
    d = 1.0 - qab * x / qap
    if abs(d) < _FPMIN:
        d = _FPMIN
    d = 1.0 / d
    h = d
    for m in range(1, _MAXIT + 1):
        m2 = 2 * m
        aa = m * (b - m) * x / ((qam + m2) * (a + m2))
        d = 1.0 + aa * d
        if abs(d) < _FPMIN:
            d = _FPMIN
        c = 1.0 + aa / c
        if abs(c) < _FPMIN:
            c = _FPMIN
        d = 1.0 / d
        h *= d * c
        aa = -(a + m) * (qab + m) * x / ((a + m2) * (qap + m2))
        d = 1.0 + aa * d
        if abs(d) < _FPMIN:
            d = _FPMIN
        c = 1.0 + aa / c
        if abs(c) < _FPMIN:
            c = _FPMIN
        d = 1.0 / d
        delt = d * c
        h *= delt
        if abs(delt - 1.0) < _EPS:
            break
    return h


def _betainc(a: float, b: float, x: float) -> float:
    """Regularized incomplete beta I_x(a, b)."""
    if x <= 0.0:
        return 0.0
    if x >= 1.0:
        return 1.0
    bt = math.exp(
        math.lgamma(a + b) - math.lgamma(a) - math.lgamma(b) + a * math.log(x) + b * math.log(1.0 - x)
    )
    if x < (a + 1.0) / (a + b + 2.0):
        return bt * _betacf(a, b, x) / a
    return 1.0 - bt * _betacf(b, a, 1.0 - x) / b


def t_cdf(t: float, df: float) -> float:
    """Student-t CDF."""
    x = df / (df + t * t)
    p = 0.5 * _betainc(df / 2.0, 0.5, x)
    return p if t < 0 else 1.0 - p


def t_ppf(p: float, df: float) -> float:
    """Student-t inverse CDF by bisection (monotone, [‑1e4, 1e4] brackets
    any practical quantile)."""
    lo, hi = -1e4, 1e4
    for _ in range(200):
        mid = (lo + hi) / 2.0
        if t_cdf(mid, df) < p:
            lo = mid
        else:
            hi = mid
    return (lo + hi) / 2.0


_OUT_SCHEMA = StructType(
    [
        StructField("class", StringType()),
        StructField("labels_key", StringType()),
        StructField("ts", LongType()),
        StructField("v_outlier", DoubleType()),
    ]
)


def _mu_sigma(v: np.ndarray, use_median: bool) -> tuple[float, float]:
    """mean/std or median/mad·1.4826 (GTSOutliersHelper.madsigma)."""
    if use_median:
        med = float(np.median(v))
        mad = float(np.median(np.abs(v - med)))
        return med, 1.4826 * mad
    return float(v.mean()), float(v.std(ddof=1))


def _mu_sigma_fold(v: np.ndarray) -> tuple[float, float]:
    """Left-fold mean/std(ddof=1) in element order — bit-identical to a
    DuckDB `list_reduce` over the same ts-ordered list (numpy's pairwise
    summation is NOT), enabling exact cross-engine oracles. Use for short
    (bucketized) series; numpy `_mu_sigma` is the long-series fast path."""
    n = len(v)
    m = 0.0
    for x in v:
        m += float(x)
    m /= n
    ss = 0.0
    for x in v:
        d = float(x) - m
        ss += d * d
    return m, math.sqrt(ss / (n - 1))


def _argmax_z_fold(v: np.ndarray, m: float, s: float) -> tuple[int, float]:
    """First index of the strictly-largest |z| in element order (matches a
    first-match list scan in SQL), plus the max |z| itself."""
    best_i, best_z = 0, -1.0
    for i, x in enumerate(v):
        z = abs((float(x) - m) / s)
        if z > best_z:
            best_i, best_z = i, z
    return best_i, best_z


def _grubbs_critical(n: int, alpha: float) -> float:
    t = t_ppf(alpha / (2.0 * n), n - 2)
    return (n - 1) * abs(t) / math.sqrt(n * (n - 2 + t * t))


def grubbs_test(
    df: DataFrame,
    alpha: float = 0.05,
    use_median: bool = False,
    value_col: str = "v_double",
    exact_moments: bool = False,
) -> DataFrame:
    """GRUBBSTEST (GTSOutliersHelper.grubbsTest:260): flag the single most
    deviant point per series iff its studentized deviation exceeds the
    Grubbs critical value. Returns the anomalous points.

    exact_moments=True computes the moments by ts-ordered left fold
    (`_mu_sigma_fold`) so the decision is bit-reproducible by a SQL
    oracle; intended for short bucketized series."""

    def run(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("ts").reset_index(drop=True)
        v = pdf[value_col].to_numpy(np.float64)
        n = len(v)
        empty = pd.DataFrame({"class": [], "labels_key": [], "ts": [], "v_outlier": []}).astype(
            {"ts": "int64", "v_outlier": "float64", "class": "object", "labels_key": "object"}
        )
        if n < 3:
            return empty
        if exact_moments and not use_median:
            m, std = _mu_sigma_fold(v)
        else:
            m, std = _mu_sigma(v, use_median)
        if std == 0.0:
            return empty
        if exact_moments:
            i, zmax = _argmax_z_fold(v, m, std)
        else:
            z = np.abs((v - m) / std)
            i = int(z.argmax())
            zmax = float(z[i])
        if zmax > _grubbs_critical(n, alpha):
            return pdf.iloc[[i]][["class", "labels_key", "ts"]].assign(v_outlier=v[i])
        return empty

    return per_series_apply(df, run, _OUT_SCHEMA, ("class", "labels_key", "ts", value_col))


def _esd_critical(n: int, alpha: float) -> float:
    t = t_ppf(1.0 - alpha / (2.0 * n), n - 2)
    return (n - 1) * t / math.sqrt((n - 2 + t * t) * n)


def esd_test(
    df: DataFrame,
    k: int,
    alpha: float = 0.05,
    use_median: bool = False,
    value_col: str = "v_double",
    exact_moments: bool = False,
) -> DataFrame:
    """ESDTEST (GTSOutliersHelper.ESDTest:329): generalized extreme
    Studentized deviate test — up to k outliers per series, iteratively
    removing the most deviant point and recomputing the statistic.

    exact_moments=True → ts-ordered left-fold moments (`_mu_sigma_fold`)
    for SQL-oracle bit-reproducibility on short bucketized series."""

    def run(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("ts").reset_index(drop=True)
        v = pdf[value_col].to_numpy(np.float64)
        ts = pdf["ts"].to_numpy(np.int64)
        alive = np.ones(len(v), dtype=bool)
        out_rows: list[int] = []
        cand: list[tuple[int, float, float]] = []
        for j in range(1, k + 1):
            idx = np.nonzero(alive)[0]
            n = len(idx)
            if n < 3:
                break
            if exact_moments and not use_median:
                m, std = _mu_sigma_fold(v[idx])
            else:
                m, std = _mu_sigma(v[idx], use_median)
            if std == 0.0:
                break
            if exact_moments:
                i_local, zmax = _argmax_z_fold(v[idx], m, std)
            else:
                z = np.abs((v[idx] - m) / std)
                i_local = int(z.argmax())
                zmax = float(z[i_local])
            i = int(idx[i_local])
            lam = _esd_critical(n, alpha)
            cand.append((i, zmax, lam))
            alive[i] = False
        # the number of outliers = the LARGEST j whose statistic exceeds λ_j
        last = -1
        for j, (_, stat, lam) in enumerate(cand):
            if stat > lam:
                last = j
        out_rows = [c[0] for c in cand[: last + 1]]
        if not out_rows:
            return pd.DataFrame({"class": [], "labels_key": [], "ts": [], "v_outlier": []}).astype(
                {"ts": "int64", "v_outlier": "float64", "class": "object", "labels_key": "object"}
            )
        sel = pdf.iloc[out_rows][["class", "labels_key", "ts"]].copy()
        sel["v_outlier"] = v[out_rows]
        return sel

    return per_series_apply(df, run, _OUT_SCHEMA, ("class", "labels_key", "ts", value_col))


def zscore_anomalies(df: DataFrame, threshold: float, use_median: bool = False, value_col: str = "v_double") -> DataFrame:
    """ZSCORETEST (GTSOutliersHelper.zScoreTest:228) — |z| ≥ d flags,
    window-free variant (the JVM-side ZSCORE operator in
    operators/outliers.py covers the columnar path; this one shares the
    madsigma definition with the tests above)."""

    def run(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("ts").reset_index(drop=True)
        v = pdf[value_col].to_numpy(np.float64)
        if len(v) < 2:
            return pdf.iloc[[]][["class", "labels_key", "ts"]].assign(v_outlier=np.array([], np.float64))
        m, std = _mu_sigma(v, use_median)
        if std == 0.0:
            return pdf.iloc[[]][["class", "labels_key", "ts"]].assign(v_outlier=np.array([], np.float64))
        mask = np.abs((v - m) / std) >= threshold
        sel = pdf.loc[mask, ["class", "labels_key", "ts"]].copy()
        sel["v_outlier"] = v[mask]
        return sel

    return per_series_apply(df, run, _OUT_SCHEMA, ("class", "labels_key", "ts", value_col))
