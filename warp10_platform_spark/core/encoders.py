"""GTSEncoder as a first-class script value (GTSEncoder.java:28,
NEWENCODER/TOENCODER/ENCODERTO/ASENCODERS/UNWRAPENCODER/UNWRAPSIZE
registrations, WarpScriptLib.java:2435-2440,2603).

Two shapes, matching Spark's execution model:

- `Encoder` — a driver-side scalar value for in-script construction and
  single-blob manipulation (the reference encoder is an in-memory value;
  scripts build them point by point or unwrap ONE blob). Bounded by
  construction — never holds a fetch result.
- `EncoderFrame` — the distributed form: a DataFrame with one row per
  series carrying the OPB64 wrapped blob (class, labels_key, wrapped).
  ASENCODERS over a fetch result stays a lazy Catalyst plan (the
  encode runs per-series in Arrow batches); TOGTS decodes back without
  ever collecting to the driver.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame

from warp10_platform_spark.core.geoxp import from_geoxp, to_geoxp
from warp10_platform_spark.core.gtscodec import (
    opb64_decode,
    read_wrapper,
    unwrap_series,
    wrap_series,
)


class Encoder:
    """Driver-side GTSEncoder: name/labels/attributes + point list
    [(ts, value, elev|None, loc|None)]."""

    __slots__ = ("name", "labels", "attributes", "base", "points")

    def __init__(self, name: str = "", labels: dict | None = None,
                 attributes: dict | None = None, base: int = 0):
        self.name = name
        self.labels = dict(labels or {})
        self.attributes = dict(attributes or {})
        self.base = base
        self.points: list[tuple] = []

    # GTSEncoder.addValue(timestamp, location, elevation, value)
    def add_value(self, ts: int, value, elev: int | None = None, loc: int | None = None):
        self.points.append((int(ts), value, elev, loc))
        return self

    def add_latlon(self, ts: int, lat: float, lon: float, elev: int | None, value):
        loc = None
        if lat == lat and lon == lon:  # NaN-NaN convention = no location
            loc = to_geoxp(lat, lon)
        return self.add_value(ts, value, elev, loc)

    def merge(self, other: "Encoder"):
        """GTSEncoder.merge: append the other encoder's points."""
        self.points.extend(other.points)
        return self

    @property
    def count(self) -> int:
        return len(self.points)

    def wrap(self) -> str:
        return wrap_series(self.name, self.labels, self.points,
                           base=self.base, attributes=self.attributes)

    def to_rows(self) -> list[list]:
        """ENCODERTO element shape: [ts, lat, lon, elev, value] with NaN
        lat/lon when no location (ENCODERTO.java:88-100)."""
        out = []
        for ts, value, elev, loc in self.points:
            if loc is not None:
                lat, lon = from_geoxp(loc)
            else:
                lat, lon = math.nan, math.nan
            out.append([ts, lat, lon, elev, value])
        return out

    @classmethod
    def from_wrapped(cls, text: str) -> "Encoder":
        u = unwrap_series(text, with_location=True)
        enc = cls(u["name"], u["labels"], u["attributes"])
        enc.points = [tuple(p) for p in u["points"]]
        return enc

    def __len__(self):
        return len(self.points)

    def __repr__(self):
        return f"Encoder({self.name!r}, {self.count} points)"


class EncoderFrame:
    """Distributed encoders: one wrapped blob per series. Wraps the
    DataFrame (class, labels_key, wrapped) so the stack can tell
    encoder sets apart from plain frames."""

    __slots__ = ("df",)

    def __init__(self, df: DataFrame):
        self.df = df


def gts_to_encoder_frame(gf) -> EncoderFrame:
    """ASENCODERS over a fetch result: per-series wire encode, lazy."""
    from warp10_platform_spark.core.wrap import wrap_thrift

    return EncoderFrame(wrap_thrift(gf.df, value_col=gf.value_col))


def encoder_frame_to_gts(ef: EncoderFrame):
    """TOGTS/ENCODER-> on the distributed form: decode blobs back to a
    points frame (gts_id recomputed), no driver materialization."""
    from warp10_platform_spark.core.frame import GTSFrame
    from warp10_platform_spark.core.wrap import unwrap_thrift

    df = unwrap_thrift(ef.df).selectExpr(
        "class",
        "map_from_entries(from_json(labels_key, 'array<struct<key:string,value:string>>')) AS labels",
        "cast(map() as map<string,string>) AS attributes",
        "labels_key", "xxhash64(class, labels_key) AS gts_id",
        "ts", "v_double", "elev", "lat", "lon",
    )
    return GTSFrame(df, None, "v_double")


def unwrap_size(text: str) -> int:
    """UNWRAPSIZE.java: the GTSWrapper count field — no point decode,
    no gzip inflate."""
    return read_wrapper(opb64_decode(text), inflate=False)["count"]


def unwrap_size_col(df: DataFrame, wrapped_col: str = "wrapped") -> DataFrame:
    """Distributed UNWRAPSIZE: count per wrapped row (Arrow batches,
    metadata-only parse)."""
    import pandas as pd
    from pyspark.sql.types import LongType, StringType, StructField, StructType

    schema = StructType(
        [
            StructField("class", StringType()),
            StructField("labels_key", StringType()),
            StructField("count", LongType()),
        ]
    )

    def run(batches):
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "class": pdf["class"],
                    "labels_key": pdf["labels_key"],
                    "count": [unwrap_size(w) for w in pdf[wrapped_col]],
                }
            )

    return df.select("class", "labels_key", wrapped_col).mapInPandas(run, schema=schema)
