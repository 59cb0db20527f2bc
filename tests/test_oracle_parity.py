"""Mirror of the driver's correctness gate: run every queries() entry and
compare against its oracle_sql() DuckDB twin (row count + schema + values).
Queries without an oracle get a rows-runnable smoke check.
"""

import pytest

import __spark_entry__ as entry_mod
from tests.conftest import compare_to_oracle

QUERIES = entry_mod.queries()
ORACLES = entry_mod.oracle_sql()


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_query_vs_oracle(name, spark, sf_dir, duck):
    df = QUERIES[name](spark, sf_dir)
    if name in ORACLES:
        compare_to_oracle(df, duck, ORACLES[name], float_tol=1e-6, rel_tol=1e-6)
    else:
        n = df.count()
        assert n >= 0
        df.limit(5).collect()


def test_entry_smoke(spark):
    df = entry_mod.entry(spark)
    rows = df.collect()
    assert len(rows) >= 0
    assert df.schema is not None
