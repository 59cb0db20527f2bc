"""Driver contract for the spark-graft builder (PySpark target).

entry(spark)        → flagship GTS pipeline (fetch → bucketize → reduce).
queries()           → name → (spark, sf_dir) → DataFrame, one per operator
                      implemented from SURVEY.md §2.
oracle_sql()        → name → equivalent DuckDB SQL on the same tables.

Column names are aliased identically on both sides; float aggregates are
rounded identically on both sides so the driver's value-hash is stable.
All query implementations live in warp10_platform_spark.queries.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from warp10_platform_spark.queries import ORACLES, QUERIES


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: SURVEY §7 minimum slice — selector fetch → daily-bucket
    mean per series → reducer.max across classes per user."""
    return QUERIES["gts_bucketize_reduce"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    return dict(ORACLES)
