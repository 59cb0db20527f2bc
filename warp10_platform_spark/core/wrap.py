"""WRAP / UNWRAP — self-contained series blobs.

Reference (script/functions/WRAP.java, GTSWrapperHelper): WRAP serializes
each GTS (metadata + points) into an opaque string a user can store
anywhere; UNWRAP parses it back into the identical series. The reference
blob is a protobuf/compressed GTSWrapper — byte-level compat with that
format is compat-only scope (SURVEY §2.1) — but the FUNCTIONAL contract
(pack → store → unpack → identical series) is delivered here with a
JSON+base64 encoding, entirely JVM-side (to_json/from_json, no UDF).

Scale note: one output row per series; the points of one series must fit
one row (the same in-RAM bound the reference's wrapper has). The groupBy
is the only shuffle; unwrap is a pure per-row explode (no shuffle).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from warp10_platform_spark.core.apply import per_series_apply

from warp10_platform_spark.core.schema import with_gts_id

WRAP_SCHEMA = "struct<c:string, l:map<string,string>, p:array<struct<t:bigint,v:double>>>"


def wrap(df: DataFrame, value_col: str = "v_double") -> DataFrame:
    """One row per series: (class, labels_key, wrapped) where `wrapped`
    is base64(json{class, labels, points sorted by tick})."""
    per = df.groupBy("gts_id", "class", "labels_key").agg(
        F.first("labels").alias("labels"),
        F.sort_array(
            F.collect_list(F.struct(F.col("ts").alias("t"), F.col(value_col).alias("v")))
        ).alias("p"),
    )
    blob = F.base64(
        F.encode(
            F.to_json(F.struct(F.col("class").alias("c"), F.col("labels").alias("l"), F.col("p"))),
            "utf-8",
        )
    )
    return per.select("class", "labels_key", blob.alias("wrapped"))


def unwrap(df: DataFrame, wrapped_col: str = "wrapped", value_col: str = "v_double") -> DataFrame:
    """Inverse of wrap(): parse each blob and explode back to canonical
    points rows, recomputing gts_id/labels_key from the parsed metadata
    (UNWRAP.java rebuilds the GTS the same way)."""
    j = F.from_json(F.decode(F.unbase64(F.col(wrapped_col)), "utf-8"), WRAP_SCHEMA)
    ex = (
        df.select(j.alias("w"))
        .select(F.col("w.c").alias("class"), F.col("w.l").alias("labels"), F.explode("w.p").alias("pt"))
        .select("class", "labels", F.col("pt.t").alias("ts"), F.col("pt.v").alias(value_col))
    )
    return with_gts_id(ex)


def wrap_thrift(df: DataFrame, value_col: str = "v_double") -> DataFrame:
    """WRAP with the reference's actual wire format (core/gtscodec.py:
    GTSEncoder stream inside a TCompactProtocol GTSWrapper, OPB64 text) —
    one wrapped string per series, interchangeable with a real Warp 10.
    Arrow-batched applyInPandas: one group per series, like the
    functional wrap()."""
    import json

    import pandas as pd
    from pyspark.sql.types import StringType, StructField, StructType

    from warp10_platform_spark.core.geoxp import to_geoxp_col
    from warp10_platform_spark.core.gtscodec import wrap_series

    schema = StructType(
        [
            StructField("class", StringType()),
            StructField("labels_key", StringType()),
            StructField("wrapped", StringType()),
        ]
    )

    # location/elevation ride along when present: GeoXPPoint computed
    # JVM-side (geoxp column form) so the Python stage only serializes
    has_elev = "elev" in df.columns
    if "lat" in df.columns and "lon" in df.columns:
        df = df.withColumn(
            "_loc",
            F.when(
                F.col("lat").isNotNull() & F.col("lon").isNotNull(),
                to_geoxp_col(F.col("lat"), F.col("lon")),
            ),
        )
    else:
        df = df.withColumn("_loc", F.lit(None).cast("long"))
    if not has_elev:
        df = df.withColumn("elev", F.lit(None).cast("long"))

    def run(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("ts")
        labels = {e["key"]: e["value"] for e in json.loads(pdf["labels_key"].iloc[0] or "[]")}
        pts = [
            (
                int(t),
                float(v),
                int(e) if pd.notna(e) else None,
                int(g) if pd.notna(g) else None,
            )
            for t, v, e, g in zip(pdf["ts"], pdf[value_col], pdf["elev"], pdf["_loc"])
        ]
        return pd.DataFrame(
            {
                "class": [pdf["class"].iloc[0]],
                "labels_key": [pdf["labels_key"].iloc[0]],
                "wrapped": [wrap_series(pdf["class"].iloc[0], labels, pts)],
            }
        )

    return per_series_apply(df, run, schema, ("class", "labels_key", "ts", value_col, "elev", "_loc"))


def unwrap_thrift(df: DataFrame, wrapped_col: str = "wrapped") -> DataFrame:
    """UNWRAP of reference-format blobs → points rows (ts, v_double,
    elev, lat, lon — location decoded from the GeoXPPoint)."""
    import pandas as pd
    from pyspark.sql.types import DoubleType, LongType, StringType, StructField, StructType

    from warp10_platform_spark.core.geoxp import from_geoxp
    from warp10_platform_spark.core.gtscodec import unwrap_series

    schema = StructType(
        [
            StructField("class", StringType()),
            StructField("labels_key", StringType()),
            StructField("ts", LongType()),
            StructField("v_double", DoubleType()),
            StructField("elev", LongType()),
            StructField("lat", DoubleType()),
            StructField("lon", DoubleType()),
        ]
    )

    def run(batches):
        for pdf in batches:
            rows = []
            for _, r in pdf.iterrows():
                u = unwrap_series(r[wrapped_col], with_location=True)
                for ts, v, elev, loc in u["points"]:
                    lat, lon = from_geoxp(loc) if loc is not None else (None, None)
                    rows.append((r["class"], r["labels_key"], int(ts), float(v), elev, lat, lon))
            yield pd.DataFrame(
                rows, columns=["class", "labels_key", "ts", "v_double", "elev", "lat", "lon"]
            )

    return df.select("class", "labels_key", wrapped_col).mapInPandas(run, schema=schema)
