"""Encoder stack-value tests (GTSEncoder.java:28; NEWENCODER/->ENCODER/
ENCODER->/ASENCODERS/UNWRAPENCODER/UNWRAPSIZE/TOGTS registrations) —
golden-bytes via the wire codec plus the distributed EncoderFrame path.
"""

import math

from warp10_platform_spark.core import geoxp as G
from warp10_platform_spark.core.encoders import Encoder, unwrap_size


def test_encoder_build_wrap_unwrap():
    enc = Encoder("sensor.temp", {"room": "a"})
    enc.add_value(1000, 21.5).add_value(2000, 21.7, elev=12)
    enc.add_latlon(3000, 48.5, 3.5, None, 22.0)
    s = enc.wrap()
    back = Encoder.from_wrapped(s)
    assert back.name == "sensor.temp" and back.labels == {"room": "a"}
    assert back.points == [
        (1000, 21.5, None, None),
        (2000, 21.7, 12, None),
        (3000, 22.0, None, G.to_geoxp(48.5, 3.5)),
    ]


def test_unwrapsize_no_decode():
    enc = Encoder("x")
    for i in range(37):
        enc.add_value(i * 1000, float(i))
    assert unwrap_size(enc.wrap()) == 37


def test_encoder_to_rows_nan_location():
    enc = Encoder("x")
    enc.add_value(5, 1.0)
    enc.add_latlon(6, 10.0, 20.0, 3, 2.0)
    rows = enc.to_rows()
    assert rows[0][0] == 5 and math.isnan(rows[0][1]) and math.isnan(rows[0][2])
    la, lo = G.from_geoxp(G.to_geoxp(10.0, 20.0))
    assert rows[1] == [6, la, lo, 3, 2.0]


def test_script_encoder_scalar_ops(spark):
    from warp10_platform_spark.warpscript.stack import WarpScriptStack

    st = WarpScriptStack(spark, "/root/testdata/sf0.001")
    st.exec("""
    NEWENCODER
    100 NaN NaN NaN 1.5 ADDVALUE
    200 48.5 3.5 NaN 2.5 ADDVALUE
    DUP SIZE 'n' STORE
    WRAP 'w' STORE
    $w UNWRAPSIZE
    $w UNWRAPENCODER ENCODER->
    $n
    """)
    n = st.pop()
    rows = st.pop()
    usize = st.pop()
    assert n == 2 and usize == 2
    assert rows[0][0] == 100 and rows[0][4] == 1.5 and math.isnan(rows[0][1])
    assert rows[1][0] == 200 and rows[1][4] == 2.5
    la, lo = G.from_geoxp(G.to_geoxp(48.5, 3.5))
    assert rows[1][1] == la and rows[1][2] == lo


def test_script_toencoder_list_form(spark):
    from warp10_platform_spark.warpscript.stack import WarpScriptStack

    st = WarpScriptStack(spark, "/root/testdata/sf0.001")
    st.exec("""
    [ [ 10 NaN NaN NaN 1.0 ] [ 20 1.0 2.0 NaN 3.0 ] ] ->ENCODER
    DUP SIZE SWAP WRAP UNWRAPSIZE
    """)
    assert st.pop() == 2
    assert st.pop() == 2


def test_asencoders_distributed_roundtrip(spark, sf_dir):
    """fetch → ASENCODERS (lazy EncoderFrame) → UNWRAPSIZE per series
    and TOGTS back: point counts survive, no driver collect."""
    from pyspark.sql import functions as F

    from warp10_platform_spark.core.encoders import (
        EncoderFrame,
        encoder_frame_to_gts,
        gts_to_encoder_frame,
        unwrap_size_col,
    )
    from warp10_platform_spark.core.frame import GTSFrame
    from warp10_platform_spark.sources.tables import events_points

    pts = events_points(spark, sf_dir).where(F.col("class") == "events.view")
    gf = GTSFrame.fetch(pts)
    ef = gts_to_encoder_frame(gf)
    assert isinstance(ef, EncoderFrame)
    sizes = {r["labels_key"]: r["count"] for r in unwrap_size_col(ef.df).collect()}
    truth = {r["labels_key"]: r["n"] for r in
             pts.groupBy("labels_key").agg(F.count("*").alias("n")).collect()}
    assert sizes == truth
    back = encoder_frame_to_gts(ef)
    assert back.df.count() == pts.count()
    a = {(r.labels_key, r.ts, r.v_double) for r in back.df.collect()}
    b = {(r.labels_key, r.ts, r.v_double) for r in pts.select("labels_key", "ts", "v_double").collect()}
    assert a == b


def test_goldwrap_canonical_bytes():
    # GOLDWRAP (GOLDWRAP.java): same logical series in any point/label
    # order must produce IDENTICAL wrapper bytes; reversed order differs;
    # wrapped-string input and list recursion behave like the reference's
    # ListRecursiveStackFunction.
    from warp10_platform_spark.core.encoders import Encoder
    from warp10_platform_spark.warpscript.functions import REGISTRY

    class S:
        def __init__(self):
            self.stack = []

        def push(self, v):
            self.stack.append(v)

        def pop(self):
            return self.stack.pop()

        def peek(self):
            return self.stack[-1]

    e1 = Encoder("m", {"b": "2", "a": "1"})
    e1.add_value(30, 3.0)
    e1.add_value(10, 1.0)
    e1.add_value(20, 2.0)
    e2 = Encoder("m", {"a": "1", "b": "2"})
    e2.add_value(10, 1.0)
    e2.add_value(20, 2.0)
    e2.add_value(30, 3.0)

    st = S()
    st.push(e1)
    REGISTRY["GOLDWRAP"](st)
    gold = st.pop()
    assert isinstance(gold, bytes)

    st.push(e2)
    REGISTRY["GOLDWRAP"](st)
    assert st.pop() == gold  # canonical across input orderings

    st.push(e1)
    st.push(True)
    REGISTRY["GOLDWRAP"](st)
    assert st.pop() != gold  # descending sort is a different blob

    st.push(e1.wrap())
    REGISTRY["GOLDWRAP"](st)
    assert st.pop() == gold  # wrapped-string input path

    st.push([e1, e2])
    REGISTRY["GOLDWRAP"](st)
    assert st.pop() == [gold, gold]  # list recursion


def test_snapshot_of_encoder_rebuilds(spark):
    # SNAPSHOT.java:290-308: encoder values snapshot as
    # '<wrapped>' UNWRAPENCODER — eval of the snapshot rebuilds the value
    from warp10_platform_spark.core.encoders import Encoder
    from warp10_platform_spark.warpscript.stack import WarpScriptStack

    st = WarpScriptStack(spark, "/root/testdata/sf0.001")
    e = Encoder("snap.m", {"a": "1"})
    e.add_value(100, 1.5)
    e.add_value(200, 2.5)
    st.push(e)
    st.exec("SNAPSHOT")
    snap = st.pop()
    assert "UNWRAPENCODER" in snap and "snap.m" not in snap  # opaque blob
    st.exec(snap)
    back = st.pop()
    assert isinstance(back, Encoder)
    assert back.name == "snap.m" and back.labels == {"a": "1"}
    assert [(p[0], p[1]) for p in back.points] == [(100, 1.5), (200, 2.5)]
