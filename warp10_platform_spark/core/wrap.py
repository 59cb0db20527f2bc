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
