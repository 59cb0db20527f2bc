"""INTERPOLATOR.2D.BICUBIC (script/interpolation/BicubicInterpolator.java,
WarpScriptLib.java:1950) — bicubic grid interpolation without scipy.

The reference builds a BicubicInterpolatingFunction from three script-literal
lists (x grid, y grid, f values) and applies it pointwise. The grid is an
operator PARAMETER (tiny, part of the plan), never a dataset — so holding it
as numpy arrays in the UDF closure is the faithful Spark shape: the only
distributed data is the (x, y) query-point column.

Semantics match the reference variant of commons-math BicubicInterpolator:
partial derivatives by 2-point central differences on interior nodes, zero
on the border rows/columns, Hermite bicubic per cell, the whole domain
valid (the reference does not override isValidPoint)."""

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import DoubleType

# Cubic Hermite basis (integer — exact in float arithmetic).
_M = np.array(
    [
        [1.0, 0.0, 0.0, 0.0],
        [0.0, 0.0, 1.0, 0.0],
        [-3.0, 3.0, -2.0, -1.0],
        [2.0, -2.0, 1.0, 1.0],
    ]
)


class Bicubic2D:
    """Bicubic interpolating function over a rectilinear grid."""

    def __init__(self, xs: np.ndarray, ys: np.ndarray, f: np.ndarray):
        xs = np.asarray(xs, np.float64)
        ys = np.asarray(ys, np.float64)
        f = np.asarray(f, np.float64)
        if f.shape != (len(xs), len(ys)):
            raise ValueError(f"grid shape {f.shape} != ({len(xs)}, {len(ys)})")
        if len(xs) < 2 or len(ys) < 2:
            raise ValueError("bicubic needs at least a 2x2 grid")
        if np.any(np.diff(xs) <= 0) or np.any(np.diff(ys) <= 0):
            raise ValueError("grid axes must be strictly increasing")
        self.xs, self.ys, self.f = xs, ys, f
        nx, ny = len(xs), len(ys)
        # Central-difference derivative grids; borders stay 0 exactly like
        # the reference's loops over [1, len-2].
        fx = np.zeros((nx, ny))
        fy = np.zeros((nx, ny))
        fxy = np.zeros((nx, ny))
        for i in range(1, nx - 1):
            dx = xs[i + 1] - xs[i - 1]
            for j in range(1, ny - 1):
                dy = ys[j + 1] - ys[j - 1]
                fx[i, j] = (f[i + 1, j] - f[i - 1, j]) / dx
                fy[i, j] = (f[i, j + 1] - f[i, j - 1]) / dy
                fxy[i, j] = (f[i + 1, j + 1] - f[i + 1, j - 1] - f[i - 1, j + 1] + f[i - 1, j - 1]) / (dx * dy)
        self.fx, self.fy, self.fxy = fx, fy, fxy

    def __call__(self, x: np.ndarray, y: np.ndarray) -> np.ndarray:
        xs, ys, f = self.xs, self.ys, self.f
        x = np.asarray(x, np.float64)
        y = np.asarray(y, np.float64)
        out = np.full(len(x), np.nan)
        inside = (x >= xs[0]) & (x <= xs[-1]) & (y >= ys[0]) & (y <= ys[-1])
        i = np.clip(np.searchsorted(xs, x, side="right") - 1, 0, len(xs) - 2)
        j = np.clip(np.searchsorted(ys, y, side="right") - 1, 0, len(ys) - 2)
        for k in np.nonzero(inside)[0]:
            ii, jj = int(i[k]), int(j[k])
            dx = xs[ii + 1] - xs[ii]
            dy = ys[jj + 1] - ys[jj]
            u = (x[k] - xs[ii]) / dx
            v = (y[k] - ys[jj]) / dy
            # Hermite data matrix in unit-cell coordinates (chain rule
            # scales the derivatives by the cell extents).
            G = np.array(
                [
                    [f[ii, jj], f[ii, jj + 1], self.fy[ii, jj] * dy, self.fy[ii, jj + 1] * dy],
                    [f[ii + 1, jj], f[ii + 1, jj + 1], self.fy[ii + 1, jj] * dy, self.fy[ii + 1, jj + 1] * dy],
                    [self.fx[ii, jj] * dx, self.fx[ii, jj + 1] * dx, self.fxy[ii, jj] * dx * dy, self.fxy[ii, jj + 1] * dx * dy],
                    [self.fx[ii + 1, jj] * dx, self.fx[ii + 1, jj + 1] * dx, self.fxy[ii + 1, jj] * dx * dy, self.fxy[ii + 1, jj + 1] * dx * dy],
                ]
            )
            A = _M @ G @ _M.T
            ru = np.array([1.0, u, u * u, u * u * u])
            rv = np.array([1.0, v, v * v, v * v * v])
            out[k] = ru @ A @ rv
        return out


def apply_interpolator_2d(
    df: DataFrame,
    xs,
    ys,
    fgrid,
    x_col: str = "x",
    y_col: str = "y",
    out_col: str = "v_interp",
) -> DataFrame:
    """Apply a Bicubic2D built from literal grids to (x, y) columns via an
    Arrow-batched pandas UDF — the grid rides the closure, the query
    points stay distributed."""
    import pandas as pd

    interp = Bicubic2D(xs, ys, fgrid)

    @F.pandas_udf(DoubleType())
    def _interp(x: pd.Series, y: pd.Series) -> pd.Series:
        return pd.Series(interp(x.to_numpy(np.float64), y.to_numpy(np.float64)))

    return df.withColumn(out_col, _interp(F.col(x_col), F.col(y_col)))


class Tricubic3D:
    """Tricubic interpolating function over a rectilinear 3D grid
    (script/interpolation/TricubicInterpolator.java — the reference's
    commons-math variant: central-difference mixed partials on interior
    nodes, zero on borders, whole domain valid)."""

    def __init__(self, xs, ys, zs, f):
        xs = np.asarray(xs, np.float64)
        ys = np.asarray(ys, np.float64)
        zs = np.asarray(zs, np.float64)
        f = np.asarray(f, np.float64)
        if f.shape != (len(xs), len(ys), len(zs)):
            raise ValueError(f"grid shape {f.shape} != ({len(xs)}, {len(ys)}, {len(zs)})")
        for ax in (xs, ys, zs):
            if len(ax) < 2 or np.any(np.diff(ax) <= 0):
                raise ValueError("grid axes must be strictly increasing, length >= 2")
        self.axes = (xs, ys, zs)
        self.f = f
        nx, ny, nz = f.shape
        d = {k: np.zeros_like(f) for k in ("x", "y", "z", "xy", "xz", "yz", "xyz")}
        for i in range(1, nx - 1):
            dx = xs[i + 1] - xs[i - 1]
            for j in range(1, ny - 1):
                dy = ys[j + 1] - ys[j - 1]
                for k in range(1, nz - 1):
                    dz = zs[k + 1] - zs[k - 1]
                    d["x"][i, j, k] = (f[i + 1, j, k] - f[i - 1, j, k]) / dx
                    d["y"][i, j, k] = (f[i, j + 1, k] - f[i, j - 1, k]) / dy
                    d["z"][i, j, k] = (f[i, j, k + 1] - f[i, j, k - 1]) / dz
                    d["xy"][i, j, k] = (
                        f[i + 1, j + 1, k] - f[i + 1, j - 1, k] - f[i - 1, j + 1, k] + f[i - 1, j - 1, k]
                    ) / (dx * dy)
                    d["xz"][i, j, k] = (
                        f[i + 1, j, k + 1] - f[i + 1, j, k - 1] - f[i - 1, j, k + 1] + f[i - 1, j, k - 1]
                    ) / (dx * dz)
                    d["yz"][i, j, k] = (
                        f[i, j + 1, k + 1] - f[i, j + 1, k - 1] - f[i, j - 1, k + 1] + f[i, j - 1, k - 1]
                    ) / (dy * dz)
                    d["xyz"][i, j, k] = (
                        f[i + 1, j + 1, k + 1] - f[i + 1, j + 1, k - 1]
                        - f[i + 1, j - 1, k + 1] + f[i + 1, j - 1, k - 1]
                        - f[i - 1, j + 1, k + 1] + f[i - 1, j + 1, k - 1]
                        + f[i - 1, j - 1, k + 1] - f[i - 1, j - 1, k - 1]
                    ) / (dx * dy * dz)
        self.d = d

    def _hermite_tensor(self, ii, jj, kk):
        """4x4x4 Hermite data tensor for one cell: axis index 0/1 = value
        at near/far corner, 2/3 = (scaled) derivative at near/far."""
        xs, ys, zs = self.axes
        dx = xs[ii + 1] - xs[ii]
        dy = ys[jj + 1] - ys[jj]
        dz = zs[kk + 1] - zs[kk]
        f, d = self.f, self.d

        def entry(a, b, c):
            di = ii + (a % 2)
            dj = jj + (b % 2)
            dk = kk + (c % 2)
            kx, ky, kz = a >= 2, b >= 2, c >= 2
            name = ("x" if kx else "") + ("y" if ky else "") + ("z" if kz else "")
            src = f if not name else d[name]
            scale = (dx if kx else 1.0) * (dy if ky else 1.0) * (dz if kz else 1.0)
            return src[di, dj, dk] * scale

        G = np.empty((4, 4, 4))
        for a in range(4):
            for b in range(4):
                for c in range(4):
                    G[a, b, c] = entry(a, b, c)
        return G

    def __call__(self, x, y, z):
        xs, ys, zs = self.axes
        x = np.asarray(x, np.float64)
        y = np.asarray(y, np.float64)
        z = np.asarray(z, np.float64)
        out = np.full(len(x), np.nan)
        inside = (
            (x >= xs[0]) & (x <= xs[-1]) & (y >= ys[0]) & (y <= ys[-1]) & (z >= zs[0]) & (z <= zs[-1])
        )
        iis = np.clip(np.searchsorted(xs, x, side="right") - 1, 0, len(xs) - 2)
        jjs = np.clip(np.searchsorted(ys, y, side="right") - 1, 0, len(ys) - 2)
        kks = np.clip(np.searchsorted(zs, z, side="right") - 1, 0, len(zs) - 2)
        for n in np.nonzero(inside)[0]:
            ii, jj, kk = int(iis[n]), int(jjs[n]), int(kks[n])
            G = self._hermite_tensor(ii, jj, kk)
            A = np.einsum("ia,jb,kc,abc->ijk", _M, _M, _M, G)
            u = (x[n] - xs[ii]) / (xs[ii + 1] - xs[ii])
            v = (y[n] - ys[jj]) / (ys[jj + 1] - ys[jj])
            w = (z[n] - zs[kk]) / (zs[kk + 1] - zs[kk])
            ru = np.array([1.0, u, u * u, u * u * u])
            rv = np.array([1.0, v, v * v, v * v * v])
            rw = np.array([1.0, w, w * w, w * w * w])
            out[n] = np.einsum("i,j,k,ijk->", ru, rv, rw, A)
        return out


def apply_interpolator_3d(df, xs, ys, zs, fgrid, x_col="x", y_col="y", z_col="z", out_col="v_interp"):
    """Tricubic3D over (x, y, z) columns as an Arrow-batched pandas UDF."""
    interp = Tricubic3D(xs, ys, zs, fgrid)

    @F.pandas_udf(DoubleType())
    def _interp(x: pd.Series, y: pd.Series, z: pd.Series) -> pd.Series:
        return pd.Series(
            interp(x.to_numpy(np.float64), y.to_numpy(np.float64), z.to_numpy(np.float64))
        )

    return df.withColumn(out_col, _interp(F.col(x_col), F.col(y_col), F.col(z_col)))


class MicrosphereND:
    """INTERPOLATOR.ND (script/interpolation/INTERPOLATOR_ND.java →
    commons-math MicrosphereProjectionInterpolator, Dudziak's microsphere
    projection): scattered-sample multivariate interpolation.

    Facets are unit directions drawn from a seeded Gaussian generator
    (deterministic — the analog of the reference's JDKRandomGenerator
    seed); per query point, each sample 'illuminates' the facets whose
    direction it projects onto, brightest sample per facet wins, and the
    value is the illumination-weighted average. Reference defaults:
    exponent=2, max.dark.fraction=0.5, dark.threshold=1e-2,
    background=NaN, no.interpolation.tolerance=ulp(1.0)."""

    def __init__(
        self,
        samples: np.ndarray,
        values: np.ndarray,
        elements: int = 50,
        exponent: float = 2.0,
        max_dark_fraction: float = 0.5,
        dark_threshold: float = 1e-2,
        background: float = float("nan"),
        seed: int = 42,
    ):
        self.x = np.asarray(samples, np.float64)
        self.y = np.asarray(values, np.float64)
        if self.x.ndim != 2 or len(self.x) != len(self.y):
            raise ValueError("samples must be (n, dim) with matching values")
        self.dim = self.x.shape[1]
        rng = np.random.default_rng(seed)
        dirs = rng.standard_normal((elements, self.dim))
        self.dirs = dirs / np.linalg.norm(dirs, axis=1, keepdims=True)
        self.exponent = exponent
        self.max_dark_fraction = max_dark_fraction
        self.dark_threshold = dark_threshold
        self.background = background
        self.tol = np.finfo(np.float64).eps

    def __call__(self, pts: np.ndarray) -> np.ndarray:
        pts = np.asarray(pts, np.float64)
        out = np.empty(len(pts))
        for q, p in enumerate(pts):
            diff = self.x - p  # (n, dim)
            dist = np.linalg.norm(diff, axis=1)
            hit = np.argmin(dist)
            if dist[hit] < self.tol:
                out[q] = self.y[hit]  # no.interpolation.tolerance exact hit
                continue
            illum = (self.dirs @ (diff / dist[:, None]).T) / dist[None, :] ** self.exponent
            best = illum.argmax(axis=1)
            bright = illum[np.arange(len(self.dirs)), best]
            lit = bright > self.dark_threshold
            if (~lit).mean() > self.max_dark_fraction:
                out[q] = self.background
                continue
            w = bright[lit]
            out[q] = float((w * self.y[best[lit]]).sum() / w.sum())
        return out
