"""Time-unit observability queries.

The session time unit (core/timeunits, Constants.java:51-61) is a
CONSTANT of the whole engine — these queries make it observable so the
oracle gate proves the threading end-to-end: the expected values differ
between us/ms/ns modes, and the oracle SQL is generated from the same
constant, so a mode where any tier (scalar STU/MSTU, the points
projection, duration parsing) disagreed with the rest would hash-fail.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from warp10_platform_spark.core import timeunits as tu
from warp10_platform_spark.functions.timeutil import parse_duration
from warp10_platform_spark.queries import register
from warp10_platform_spark.queries.gts import PTS
from warp10_platform_spark.sources.tables import canonical_points


def _script_const(spark, sf_dir, name: str) -> int:
    """Evaluate a WarpScript constant (STU / MSTU) through the real
    script surface, so the probe exercises the registry binding rather
    than reading the Python constant directly."""
    from warp10_platform_spark.warpscript.stack import exec_script

    return int(exec_script(spark, sf_dir, name))


@register("time_units_probe", (
    f"WITH {PTS} "
    f"SELECT class, "
    f"       CAST({tu.UNITS_PER_S} AS BIGINT) AS stu, "
    f"       CAST({tu.UNITS_PER_MS} AS BIGINT) AS mstu, "
    f"       CAST({parse_duration('PT2H30M')} AS BIGINT) AS dur_ticks, "
    f"       max(ts) - min(ts) AS span_ticks, "
    f"       round((max(ts) - min(ts)) / {float(tu.UNITS_PER_S)}, 6) AS span_s "
    f"FROM pts GROUP BY class"
))
def time_units_probe(spark, sf_dir):
    """Session-unit probe (Constants.java:51-61 / STU.java / MSTU.java /
    DURATION.java): STU and MSTU are evaluated through the WarpScript
    registry, the span through the points projection, the duration
    through the ISO8601 parser — every column except span_s changes
    value when WARP10_TIME_UNITS flips, so this query PASSING under
    us, ms AND ns is the end-to-end proof the unit is threaded
    consistently through all four tiers."""
    stu = _script_const(spark, sf_dir, "STU")
    mstu = _script_const(spark, sf_dir, "MSTU")
    pts = canonical_points(spark, sf_dir)
    return pts.groupBy("class").agg(
        F.lit(stu).cast("long").alias("stu"),
        F.lit(mstu).cast("long").alias("mstu"),
        F.lit(parse_duration("PT2H30M")).cast("long").alias("dur_ticks"),
        (F.max("ts") - F.min("ts")).alias("span_ticks"),
        F.round((F.max("ts") - F.min("ts")) / F.lit(float(tu.UNITS_PER_S)), 6).alias("span_s"),
    )
