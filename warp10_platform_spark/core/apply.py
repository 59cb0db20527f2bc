"""Column-pruned grouped-map apply.

Catalyst does not prune columns through FlatMapGroupsInPandas: a
grouped-map pandas UDF receives EVERY column of its input frame, so
without an explicit projection the labels/attribute maps and unused
value columns are shuffled and Arrow-encoded for nothing (measured
2-3x of the Arrow bytes on canonical_points). Every per-series
applyInPandas in the engine goes through this helper unless the UDF
genuinely returns the full input schema (fillers, thinning).
"""

from __future__ import annotations

from typing import Iterable

from pyspark.sql import DataFrame


def per_series_apply(
    df: DataFrame,
    run,
    schema,
    cols: Iterable[str],
    key: str = "gts_id",
) -> DataFrame:
    """groupBy(key).applyInPandas(run, schema) over ONLY `cols`.

    cols = the columns run() actually reads; the grouping key is always
    included. Columns absent from df are skipped (lat/lon/elev are
    optional on several frames).
    """
    need: list[str] = []
    for c in (key, *cols):
        if c not in need and c in df.columns:
            need.append(c)
    return df.select(*need).groupBy(key).applyInPandas(run, schema=schema)
