import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def spark():
    os.environ.setdefault("SPARK_GRAFT_CPUS", "8")
    from warp10_platform_spark.session import get_spark

    s = get_spark("warp10-platform-spark-tests", shuffle_partitions=8)
    yield s


@pytest.fixture(scope="session")
def sf_dir():
    return SF_DIR


@pytest.fixture(scope="session")
def duck(sf_dir):
    import duckdb

    con = duckdb.connect()
    for t in "region nation customer supplier part orders lineitem events documents embeddings".split():
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    yield con
    con.close()


def compare_to_oracle(spark_df, duck_con, sql, float_tol=1e-9, rel_tol=1e-9):
    """Mirror of the driver's correctness gate: sort columns by name,
    sort rows, compare values (floats with tolerance)."""
    import math

    sp = spark_df.toPandas()
    du = duck_con.sql(sql).df()
    assert sorted(sp.columns) == sorted(du.columns), f"schema mismatch: {sorted(sp.columns)} vs {sorted(du.columns)}"
    cols = sorted(sp.columns)
    sp = sp[cols].sort_values(cols).reset_index(drop=True)
    du = du[cols].sort_values(cols).reset_index(drop=True)
    assert len(sp) == len(du), f"row count mismatch: spark={len(sp)} duckdb={len(du)}"
    for c in cols:
        a, b = sp[c].tolist(), du[c].tolist()
        for i, (x, y) in enumerate(zip(a, b)):
            if x is None and y is None:
                continue
            if isinstance(x, float) or isinstance(y, float):
                fx = float(x) if x is not None else float("nan")
                fy = float(y) if y is not None else float("nan")
                if math.isnan(fx) and math.isnan(fy):
                    continue
                assert math.isclose(fx, fy, rel_tol=rel_tol, abs_tol=float_tol), f"{c}[{i}]: {x} != {y}"
            else:
                assert x == y, f"{c}[{i}]: {x!r} != {y!r}"


@pytest.fixture(scope="session")
def oracle(duck):
    def _cmp(spark_df, sql, **kw):
        compare_to_oracle(spark_df, duck, sql, **kw)

    return _cmp
