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
