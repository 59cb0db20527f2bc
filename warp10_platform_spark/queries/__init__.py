"""Named queries + DuckDB oracles — the correctness surface of the engine.

Each submodule registers queries into QUERIES/ORACLES via `register`.
A query callable takes (spark, sf_dir) and returns a DataFrame; its
oracle is ANSI SQL DuckDB runs on the same parquet tables. Column names
and float rounding are kept identical on both sides (driver hash gate).
"""

from __future__ import annotations

QUERIES: dict = {}
ORACLES: dict = {}


def register(name: str, oracle: str | None = None):
    def deco(fn):
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco


from warp10_platform_spark.queries import tpch  # noqa: E402,F401
from warp10_platform_spark.queries import gts  # noqa: E402,F401
from warp10_platform_spark.queries import docs  # noqa: E402,F401
from warp10_platform_spark.queries import emb  # noqa: E402,F401
from warp10_platform_spark.queries import custom  # noqa: E402,F401
from warp10_platform_spark.queries import ingest  # noqa: E402,F401
from warp10_platform_spark.queries import typed  # noqa: E402,F401
from warp10_platform_spark.queries import coverage  # noqa: E402,F401
from warp10_platform_spark.queries import analytics  # noqa: E402,F401
from warp10_platform_spark.queries import media  # noqa: E402,F401
from warp10_platform_spark.queries import geo  # noqa: E402,F401
from warp10_platform_spark.queries import advanced  # noqa: E402,F401
from warp10_platform_spark.queries import ops2  # noqa: E402,F401
from warp10_platform_spark.queries import ops3  # noqa: E402,F401
from warp10_platform_spark.queries import ops4  # noqa: E402,F401
from warp10_platform_spark.queries import ops5  # noqa: E402,F401
from warp10_platform_spark.queries import ops6  # noqa: E402,F401
from warp10_platform_spark.queries import ops7  # noqa: E402,F401
from warp10_platform_spark.queries import ws  # noqa: E402,F401
from warp10_platform_spark.queries import rollup  # noqa: E402,F401
from warp10_platform_spark.queries import robust  # noqa: E402,F401
from warp10_platform_spark.queries import tpch2  # noqa: E402,F401
from warp10_platform_spark.queries import timeunits_q  # noqa: E402,F401
