"""TOVEC / TOMAT + matrix ops (functions/TOMAT.java:33, TRANSPOSE.java:29,
DET.java:30, INV.java:30, TR.java:29 — commons-math in the reference).

The matrix lives as an array<array<double>> column, one matrix per row —
the Spark-native shape for "many small matrices" (per series, per window,
per entity). Construction (TOMAT from grouped series, TOVEC from a value
column) is JVM exprs; the linear algebra (det/inv) is numpy over Arrow
batches. TRANSPOSE and trace stay JVM-side.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, DoubleType


def tovec(df: DataFrame, value_col: str = "v_double", key: str = "gts_id") -> DataFrame:
    """TOVEC: one tick-ordered value vector per series."""
    arr = F.expr(
        f"transform(array_sort(collect_list(named_struct('t', ts, 'v', cast({value_col} AS double)))), p -> p.v)"
    )
    return df.groupBy(key).agg(arr.alias("vec"))


def tomat(df: DataFrame, row_key: str, col_order: str = "ts", value_col: str = "v_double") -> DataFrame:
    """TOMAT: series set → one matrix (rows = series in row_key order,
    cols = tick order). Row-local collect per series then one final
    assembly — two bounded aggregations."""
    rows = df.groupBy(row_key).agg(
        F.expr(
            f"transform(array_sort(collect_list(named_struct('t', {col_order}, 'v', cast({value_col} AS double)))), p -> p.v)"
        ).alias("row")
    )
    return rows.agg(
        F.expr(f"transform(array_sort(collect_list(named_struct('k', {row_key}, 'r', row))), p -> p.r)").alias("mat")
    )


def transpose(mat: Column) -> Column:
    """TRANSPOSE — pure HOF exprs (no Python)."""
    ncols = F.size(F.element_at(mat, 1))
    return F.transform(
        F.sequence(F.lit(1), ncols), lambda j: F.transform(mat, lambda row: F.element_at(row, j))
    )


def trace(mat: Column) -> Column:
    """TR — sum of the diagonal."""
    n = F.size(mat)
    return F.aggregate(
        F.sequence(F.lit(1), n), F.lit(0.0), lambda acc, i: acc + F.element_at(F.element_at(mat, i), i)
    )


def _np_matrix_op(df: DataFrame, mat_col: str, op: str, out_col: str) -> DataFrame:
    """det / inv over an array<array<double>> column via numpy."""
    if op == "det":
        out_type = DoubleType()

        def run(batch: pd.Series) -> pd.Series:
            return pd.Series([float(np.linalg.det(np.array(list(m), dtype=np.float64))) for m in batch])

    elif op == "inv":
        out_type = ArrayType(ArrayType(DoubleType()))

        def run(batch: pd.Series) -> pd.Series:
            return pd.Series(
                [np.linalg.inv(np.array(list(m), dtype=np.float64)).tolist() for m in batch]
            )

    else:
        raise ValueError(op)

    from pyspark.sql.functions import pandas_udf

    fn = pandas_udf(run, out_type)
    return df.withColumn(out_col, fn(F.col(mat_col)))


def det(df: DataFrame, mat_col: str = "mat", out_col: str = "det") -> DataFrame:
    """DET (DET.java:30)."""
    return _np_matrix_op(df, mat_col, "det", out_col)


def inv(df: DataFrame, mat_col: str = "mat", out_col: str = "inv") -> DataFrame:
    """INV (INV.java:30)."""
    return _np_matrix_op(df, mat_col, "inv", out_col)
