"""Series construction/editing — MAKEGTS / NEWGTS / ADDVALUE / SETVALUE /
REMOVETICK (functions/MAKEGTS.java:33, NEWGTS.java:28, ADDVALUE.java,
REMOVETICK.java).

The stack builds series imperatively; the Spark analog builds a points
DataFrame from literals and edits by union / anti-join — all returning
canonical points frames any operator accepts.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from warp10_platform_spark.core.schema import with_gts_id


def newgts(spark: SparkSession, cls: str, labels: dict[str, str] | None = None) -> DataFrame:
    """NEWGTS: an empty series shell (0 points, identity defined)."""
    return makegts(spark, cls, labels or {}, ticks=[], values=[])


def makegts(
    spark: SparkSession,
    cls: str,
    labels: dict[str, str],
    ticks: list[int],
    values: list[float],
) -> DataFrame:
    """MAKEGTS: literal (ticks, values) → points frame."""
    assert len(ticks) == len(values)
    rows = [(cls, labels, int(t), float(v)) for t, v in zip(ticks, values)]
    df = spark.createDataFrame(
        rows, "class string, labels map<string,string>, ts long, v_double double"
    )
    return with_gts_id(df)


def addvalue(points: DataFrame, spark: SparkSession, cls: str, labels: dict[str, str], ts: int, value: float,
             overwrite: bool = True) -> DataFrame:
    """ADDVALUE/SETVALUE: append one point; overwrite=True replaces an
    existing point at the same tick (SETVALUE), False keeps both
    (ADDVALUE on a non-bucketized GTS)."""
    new = makegts(spark, cls, labels, [ts], [value])
    if not overwrite:
        return points.unionByName(new)
    from warp10_platform_spark.sources.write import update

    return update(points, new)


def removetick(points: DataFrame, cls: str, labels_key_json: str, ts: int) -> DataFrame:
    """REMOVETICK: drop the point of one series at one tick."""
    return points.where(
        ~((F.col("class") == cls) & (F.col("labels_key") == labels_key_json) & (F.col("ts") == ts))
    )
