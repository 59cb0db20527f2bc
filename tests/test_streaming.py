"""Structured Streaming ingest tests: file-source GTS text lines →
parse → windowed aggregation → memory sink, compared to the identical
batch computation (streaming/ingest.py is SURVEY §2.11)."""

import os
import uuid

import pytest
from pyspark.sql import functions as F

from warp10_platform_spark.sources.gts_text import format_gts_lines, parse_gts_lines
from warp10_platform_spark.sources.tables import events_points
from warp10_platform_spark.streaming import read_gts_text_stream, streaming_bucketize

HOUR = 3_600_000_000


def test_streaming_file_ingest_matches_batch(spark, sf_dir, tmp_path):
    # Export a slice of events as GTS text files (the ingress wire format).
    pts = events_points(spark, sf_dir).where(F.col("class") == "events.purchase")
    text_dir = str(tmp_path / "gts_text")
    format_gts_lines(pts).write.mode("overwrite").text(text_dir)

    stream = read_gts_text_stream(spark, text_dir)
    assert stream.isStreaming
    agg = streaming_bucketize(stream, HOUR)

    sink = f"ingest_{uuid.uuid4().hex[:8]}"
    q = (
        agg.writeStream.format("memory")
        .queryName(sink)
        .outputMode("append")  # watermark allows append mode
        .trigger(availableNow=True)
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    got = spark.table(sink)
    # Batch twin over the same files: append mode only emits windows the
    # watermark closed, so compare on the windows present in the sink.
    batch_pts = parse_gts_lines(spark.read.text(text_dir))
    batch = streaming_bucketize(batch_pts, HOUR)  # watermark is a no-op in batch mode
    got_rows = {(r["class"], r["labels_key"], r["bucket_end"]): r["v_count"] for r in got.collect()}
    batch_rows = {(r["class"], r["labels_key"], r["bucket_end"]): r["v_count"] for r in batch.collect()}
    assert got_rows  # stream produced output
    for k, v in got_rows.items():
        assert batch_rows[k] == v


def test_parse_drops_malformed_lines(spark):
    lines = spark.createDataFrame(
        [
            ("1700000000000000// sensor.temp{site=eu-1} 21.5",),
            ("not a gts line",),
            ("1700000000000001/48.8:2.3/120 sensor.temp{site=eu-1,unit=C} 22",),
            ("1700000000000002// sensor.state{} 'running'",),
            ("1700000000000003// sensor.ok{} T",),
        ],
        "value string",
    )
    out = parse_gts_lines(lines).orderBy("ts").collect()
    assert len(out) == 4
    assert out[0]["v_double"] == 21.5 and out[0]["labels"] == {"site": "eu-1"}
    assert out[1]["v_long"] == 22 and out[1]["lat"] == 48.8 and out[1]["elev"] == 120
    assert out[2]["v_string"] == "running"
    assert out[3]["v_bool"] is True


def test_streaming_sessionize(spark, sf_dir, tmp_path):
    from warp10_platform_spark.streaming import streaming_sessionize

    pts = events_points(spark, sf_dir).where(F.col("class") == "events.purchase")
    text_dir = str(tmp_path / "sess_text")
    format_gts_lines(pts).write.mode("overwrite").text(text_dir)

    stream = parse_gts_lines(spark.readStream.text(text_dir))
    agg = streaming_sessionize(stream, gap="1 hour")
    sink = f"sess_{uuid.uuid4().hex[:8]}"
    q = agg.writeStream.format("memory").queryName(sink).outputMode("append").trigger(availableNow=True).start()
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    got = spark.table(sink).collect()
    assert got  # sessions emitted
    # sessions of one series never overlap
    by_series = {}
    for r in got:
        by_series.setdefault((r["class"], r["labels_key"]), []).append((r["session_start"], r["session_end"]))
    for spans in by_series.values():
        spans.sort()
        for (s1, e1), (s2, _) in zip(spans, spans[1:]):
            assert e1 <= s2


def test_streaming_counter_delta_state_across_batches(spark, tmp_path):
    import os

    from warp10_platform_spark.streaming import streaming_counter_delta

    # two files = two micro-batches (maxFilesPerTrigger=1): the delta at the
    # first point of batch 2 needs the state carried from batch 1
    d = tmp_path / "delta_text"
    os.makedirs(d)
    (d / "b1.txt").write_text(
        "1000000// c.cnt{u=1} 10.0\n2000000// c.cnt{u=1} 12.5\n"
    )
    (d / "b2.txt").write_text(
        "3000000// c.cnt{u=1} 20.0\n4000000// c.cnt{u=1} 19.0\n"
    )
    stream = parse_gts_lines(spark.readStream.option("maxFilesPerTrigger", 1).text(str(d)))
    out = streaming_counter_delta(stream)
    sink = f"delta_{uuid.uuid4().hex[:8]}"
    q = out.writeStream.format("memory").queryName(sink).outputMode("append").trigger(availableNow=True).start()
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    rows = {r["ts"]: r["v_delta"] for r in spark.table(sink).collect()}
    # batch boundaries don't matter: all three deltas present and correct
    assert rows == {2000000: 2.5, 3000000: 7.5, 4000000: -1.0}


def test_streaming_exact_dedup_state_across_batches(spark, tmp_path):
    import json
    import os

    from warp10_platform_spark.streaming import streaming_exact_dedup

    d = tmp_path / "docs_stream"
    os.makedirs(d)
    # batch 1: doc 1 and 2 identical; batch 2: doc 3 repeats that content
    # (dup across the batch boundary -> needs surviving state), doc 4 new
    (d / "b1.json").write_text(
        json.dumps({"doc_id": 1, "text": "alpha beta"}) + "\n" + json.dumps({"doc_id": 2, "text": "alpha beta"})
    )
    (d / "b2.json").write_text(
        json.dumps({"doc_id": 3, "text": "alpha beta"}) + "\n" + json.dumps({"doc_id": 4, "text": "gamma"})
    )
    stream = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", 1)
        .json(str(d))
    )
    out = streaming_exact_dedup(stream)
    sink = f"dedup_{uuid.uuid4().hex[:8]}"
    q = out.writeStream.format("memory").queryName(sink).outputMode("append").trigger(availableNow=True).start()
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    rows = {r["doc_id"]: (r["keep_id"], r["is_dup"]) for r in spark.table(sink).collect()}
    assert rows == {1: (1, False), 2: (1, True), 3: (1, True), 4: (4, False)}


def test_streaming_pii_scrub_matches_batch(spark, tmp_path):
    # the stateless pipeline stages (PII scrub, repetition, token count)
    # apply unchanged to a readStream frame — prove scrub output on a
    # stream equals the batch result on the same rows
    import json
    import os

    from warp10_platform_spark.pipeline.text import pii_scrub

    d = tmp_path / "pii_stream"
    os.makedirs(d)
    rows = [
        {"doc_id": 1, "text": "reach me at a.b@example.com or 10.0.0.7 ok"},
        {"doc_id": 2, "text": "no pii here"},
        {"doc_id": 3, "text": "two mails x@y.io z@w.dev one ip 192.168.1.254"},
    ]
    (d / "b1.json").write_text("\n".join(json.dumps(r) for r in rows[:2]))
    (d / "b2.json").write_text(json.dumps(rows[2]))
    schema = "doc_id long, text string"
    stream = (
        spark.readStream.schema(schema).option("maxFilesPerTrigger", 1).json(str(d))
    )
    out = pii_scrub(stream).select("doc_id", "n_emails", "n_ips", "clean_text")
    sink = f"pii_{uuid.uuid4().hex[:8]}"
    q = (
        out.writeStream.format("memory").queryName(sink)
        .outputMode("append").trigger(availableNow=True).start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    got = {r["doc_id"]: (r["n_emails"], r["n_ips"], r["clean_text"])
           for r in spark.table(sink).collect()}
    batch = spark.createDataFrame([tuple(r.values()) for r in rows], schema)
    want = {r["doc_id"]: (r["n_emails"], r["n_ips"], r["clean_text"])
            for r in pii_scrub(batch).collect()}
    assert got == want
    assert got[1] == (1, 1, "reach me at <EMAIL> or <IP> ok")
    assert got[3][0] == 2 and got[3][1] == 1


def test_streaming_rollup_maintenance_matches_batch(spark, sf_dir, tmp_path):
    """foreachBatch rollup maintenance: per-batch appended partials,
    regrouped on read, must equal the single-pass batch rollup exactly —
    counts, decimal sums, min/max and endpoint structs."""
    from warp10_platform_spark.sources.rollup import rollup_partials
    from warp10_platform_spark.streaming.rollup_maint import (
        compact_rollup,
        maintain_rollup,
        read_maintained_rollup,
    )

    pts = events_points(spark, sf_dir).where(F.col("class") == "events.purchase")
    text_dir = str(tmp_path / "gts_text")
    # repartition forces multiple input files => multiple micro-batches
    format_gts_lines(pts).repartition(4).write.mode("overwrite").text(text_dir)

    stream = read_gts_text_stream(spark, text_dir, max_files_per_trigger=1)
    roll_dir = str(tmp_path / "rollup")
    q = maintain_rollup(stream, roll_dir, str(tmp_path / "ckpt"))
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    cols = ("cnt", "sum_d", "min_v", "max_v", "first", "last", "s1q", "s2q")
    batch_pts = parse_gts_lines(spark.read.text(text_dir))
    expect = {
        (r["gts_id"], r["rb"]): tuple(r[c] for c in cols)
        for r in rollup_partials(batch_pts).collect()
    }
    got = {
        (r["gts_id"], r["rb"]): tuple(r[c] for c in cols)
        for r in read_maintained_rollup(spark, roll_dir).collect()
    }
    assert got == expect and got

    # Compaction rewrites the append pile; readers see identical results.
    compact_rollup(spark, roll_dir)
    after = {
        (r["gts_id"], r["rb"]): tuple(r[c] for c in cols)
        for r in read_maintained_rollup(spark, roll_dir).collect()
    }
    assert after == expect


def test_streaming_minhash_dedup_flags_near_dups_across_batches(spark, tmp_path):
    import json
    import os

    from warp10_platform_spark.streaming import streaming_minhash_dedup

    d = tmp_path / "neardup_stream"
    os.makedirs(d)
    base = "the quick brown fox jumps over the lazy dog near the river bank"
    other = "completely different vocabulary about spacecraft telemetry and orbital mechanics data"
    # batch 1: doc 1 original, doc 2 identical (within-batch dup);
    # batch 2: doc 3 identical again (dup across the batch boundary ->
    # needs surviving bucket state), doc 4 disjoint vocabulary (clean)
    (d / "b1.json").write_text(
        json.dumps({"doc_id": 1, "text": base}) + "\n" + json.dumps({"doc_id": 2, "text": base})
    )
    (d / "b2.json").write_text(
        json.dumps({"doc_id": 3, "text": base}) + "\n" + json.dumps({"doc_id": 4, "text": other})
    )
    stream = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", 1)
        .json(str(d))
    )
    out = streaming_minhash_dedup(stream, sim_threshold=0.5)
    sink = f"neardup_{uuid.uuid4().hex[:8]}"
    q = (
        out.writeStream.format("memory").queryName(sink)
        .outputMode("append").trigger(availableNow=True).start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    rows = spark.table(sink).collect()
    dup_docs = {r["doc_id"] for r in rows if r["is_dup"]}
    assert dup_docs == {2, 3}
    # identical docs agree on the full signature in every band
    assert all(r["est_jaccard"] == 1.0 and r["rep_id"] == 1 for r in rows if r["doc_id"] in (2, 3))
    # the clean doc never matches an earlier rep
    assert all(not r["is_dup"] for r in rows if r["doc_id"] in (1, 4))


def test_streaming_histogram_maintenance_matches_batch(spark, sf_dir, tmp_path):
    """The histogram tier's foreachBatch maintenance: per-batch appended
    sparse histogram rows, regrouped on read, equal the single-pass batch
    histogram — so the approximate-percentile answer is identical no
    matter how ingestion was batched."""
    from warp10_platform_spark.sources.rollup import histogram_partials
    from warp10_platform_spark.streaming.rollup_maint import (
        maintain_histogram,
        read_maintained_histogram,
    )

    pts = events_points(spark, sf_dir).where(F.col("class") == "events.purchase")
    text_dir = str(tmp_path / "gts_text_h")
    format_gts_lines(pts).repartition(4).write.mode("overwrite").text(text_dir)

    stream = read_gts_text_stream(spark, text_dir, max_files_per_trigger=1)
    hist_dir = str(tmp_path / "hist")
    q = maintain_histogram(stream, hist_dir, str(tmp_path / "ckpt_h"))
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    batch_pts = parse_gts_lines(spark.read.text(text_dir))
    expect = {
        (r["gts_id"], r["rb"], r["bin"]): r["cnt"] for r in histogram_partials(batch_pts).collect()
    }
    got = {
        (r["gts_id"], r["rb"], r["bin"]): r["cnt"]
        for r in read_maintained_histogram(spark, hist_dir).collect()
    }
    assert got == expect and got


def test_streaming_directory_maintenance_matches_batch(spark, sf_dir, tmp_path):
    """Directory maintenance at ingest: per-batch extent partials,
    regrouped on read, equal the full points rebuild — FIND over the
    maintained directory gives the same series set."""
    from warp10_platform_spark.sources.directory import build_directory, find
    from warp10_platform_spark.streaming.rollup_maint import (
        maintain_directory,
        read_maintained_directory,
    )

    pts = events_points(spark, sf_dir).where(F.col("class") == "events.purchase")
    text_dir = str(tmp_path / "gts_text_d")
    format_gts_lines(pts).repartition(4).write.mode("overwrite").text(text_dir)

    stream = read_gts_text_stream(spark, text_dir, max_files_per_trigger=1)
    dir_path = str(tmp_path / "directory")
    q = maintain_directory(stream, dir_path, str(tmp_path / "ckpt_d"))
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    batch_pts = parse_gts_lines(spark.read.text(text_dir))
    cols = ["gts_id", "class", "labels_key", "first_ts", "last_ts", "n_points"]
    expect = sorted(tuple(r) for r in build_directory(batch_pts).select(*cols).collect())
    maint = read_maintained_directory(spark, dir_path)
    got = sorted(tuple(r) for r in maint.select(*cols).collect())
    assert got == expect and got
    n_sel = find(maint, "events.purchase{}").count()
    assert n_sel == len(got)


def test_maintenance_write_is_idempotent_under_batch_replay(spark, sf_dir, tmp_path):
    """foreachBatch is at-least-once: after a failure mid-write the
    restarted query REPLAYS the last batch. The per-batch dynamic
    partition overwrite must make that replay a no-op — writing the same
    (df, batch_id) twice, and then a replay with slightly different rows
    for the same id, yields exactly one copy with the LAST write
    winning, never a double-counted regroup."""
    from warp10_platform_spark.sources.rollup import rollup_partials
    from warp10_platform_spark.streaming.rollup_maint import (
        _write_batch,
        read_maintained_rollup,
    )

    pts = events_points(spark, sf_dir).where(F.col("class") == "events.purchase")
    partials = rollup_partials(pts).localCheckpoint()
    roll_dir = str(tmp_path / "rollup_replay")

    _write_batch(partials, roll_dir, 0)
    once = {
        (r["gts_id"], r["rb"]): (r["cnt"], r["sum_d"])
        for r in read_maintained_rollup(spark, roll_dir).collect()
    }
    assert once

    # Exact replay of batch 0: regrouped read unchanged (no double count).
    _write_batch(partials, roll_dir, 0)
    replay = {
        (r["gts_id"], r["rb"]): (r["cnt"], r["sum_d"])
        for r in read_maintained_rollup(spark, roll_dir).collect()
    }
    assert replay == once

    # A distinct batch id still accumulates (this is maintenance, not a
    # global overwrite): batch 1 with the same partials doubles counts.
    _write_batch(partials, roll_dir, 1)
    two = {
        (r["gts_id"], r["rb"]): r["cnt"]
        for r in read_maintained_rollup(spark, roll_dir).collect()
    }
    assert all(two[k] == 2 * once[k][0] for k in once)


def test_pluggable_socket_source_same_pipeline(spark, sf_dir, tmp_path):
    """read_points_stream(source='socket'): the SAME parse pipeline green
    under a second transport (the reference's Ingress consumes identical
    GTS lines whatever delivered them). A local TCP server pushes lines;
    the socket stream parses them into canonical points that match the
    batch parser bit-for-bit."""
    import socket
    import threading

    from warp10_platform_spark.streaming import read_points_stream

    pts = events_points(spark, sf_dir).where(F.col("class") == "events.purchase").limit(50)
    lines = [r["value"] for r in format_gts_lines(pts).collect()]
    payload = ("\n".join(lines) + "\n").encode()

    srv = socket.socket(socket.AF_INET, socket.SOCK_STREAM)
    srv.setsockopt(socket.SOL_SOCKET, socket.SO_REUSEADDR, 1)
    srv.bind(("127.0.0.1", 0))
    srv.listen(1)
    port = srv.getsockname()[1]

    def feed():
        conn, _ = srv.accept()
        conn.sendall(payload)
        # keep the connection open long enough for a micro-batch to drain
        import time as _t

        _t.sleep(3)
        conn.close()

    t = threading.Thread(target=feed, daemon=True)
    t.start()

    stream = read_points_stream(spark, source="socket", host="127.0.0.1", port=port)
    sink = f"sock_pts_{uuid.uuid4().hex[:8]}"
    q = (
        stream.writeStream.format("memory")
        .queryName(sink)
        .option("checkpointLocation", str(tmp_path / "ckpt_sock"))
        .start()
    )
    try:
        deadline = 30
        import time as _t

        while deadline > 0 and spark.table(sink).count() < len(lines):
            q.processAllAvailable()
            _t.sleep(0.5)
            deadline -= 1
    finally:
        q.stop()
        srv.close()

    got = {
        (r["gts_id"], r["ts"], r["v_double"])
        for r in spark.table(sink).select("gts_id", "ts", "v_double").collect()
    }
    want = {
        (r["gts_id"], r["ts"], r["v_double"])
        for r in parse_gts_lines(
            spark.createDataFrame([(ln,) for ln in lines], "value string")
        ).select("gts_id", "ts", "v_double").collect()
    }
    assert got == want and got


def test_pluggable_rate_source_parses_through_gts_path(spark, tmp_path):
    """read_points_stream(source='rate'): synthetic rows are rendered as
    GTS text and flow through the shared parser — schema and class/label
    projection identical to every other transport."""
    from warp10_platform_spark.streaming import read_points_stream

    stream = read_points_stream(spark, source="rate", rowsPerSecond=50)
    sink = f"rate_pts_{uuid.uuid4().hex[:8]}"
    q = (
        stream.writeStream.format("memory")
        .queryName(sink)
        .option("checkpointLocation", str(tmp_path / "ckpt_rate"))
        .start()
    )
    try:
        import time as _t

        deadline = 20
        while deadline > 0 and spark.table(sink).count() == 0:
            _t.sleep(0.5)
            deadline -= 1
    finally:
        q.stop()
    rows = spark.table(sink).select("class", "labels_key", "ts", "v_long", "v_double").collect()
    assert rows
    assert all(r["class"] == "rate.synthetic" for r in rows)
    assert all(r["ts"] and (r["v_long"] is not None or r["v_double"] is not None) for r in rows)


def test_pluggable_kafka_shaped_source_same_pipeline(spark, sf_dir, tmp_path):
    """Protocol-level Kafka double (continuum/ingress/Ingress.java
    topology): GTS text lines re-encoded into the EXACT Kafka source
    schema (key/value binary, topic/partition/offset/timestamp/
    timestampType) stream through the SAME value-decode + parse +
    watermark + append pipeline the broker path uses; the hourly
    bucketize output must match the batch twin bit-for-bit. The
    broker-only delta (offset/rebalance management) is owned by Spark's
    kafka source."""
    import uuid as _uuid

    from warp10_platform_spark.streaming.ingest import (
        KAFKA_SOURCE_SCHEMA,
        read_points_stream,
    )

    pts = events_points(spark, sf_dir).where(F.col("class") == "events.purchase")
    text_dir = str(tmp_path / "kafka_text")
    format_gts_lines(pts).write.mode("overwrite").text(text_dir)

    stream = read_points_stream(spark, source="kafka-shaped", path=text_dir, topic="gts-in")
    assert stream.isStreaming
    agg = streaming_bucketize(stream, HOUR)

    sink = f"kafka_shaped_{_uuid.uuid4().hex[:8]}"
    q = (
        agg.writeStream.format("memory")
        .queryName(sink)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    got = spark.table(sink)
    batch = streaming_bucketize(parse_gts_lines(spark.read.text(text_dir)), HOUR)
    got_rows = {(r["class"], r["labels_key"], r["bucket_end"]): (r["v_count"], r["v_sum"]) for r in got.collect()}
    batch_rows = {(r["class"], r["labels_key"], r["bucket_end"]): (r["v_count"], r["v_sum"]) for r in batch.collect()}
    assert got_rows
    for k, v in got_rows.items():
        assert batch_rows[k] == v

    # The double emits the documented Kafka source schema verbatim —
    # a drift here would mean the test no longer covers the broker path.
    from pyspark.sql.types import _parse_datatype_string

    shaped = (
        spark.read.text(text_dir)
        .select(
            F.lit(None).cast("binary").alias("key"),
            F.encode(F.col("value"), "UTF-8").alias("value"),
            F.lit("gts-in").alias("topic"),
            F.spark_partition_id().alias("partition"),
            F.abs(F.xxhash64(F.col("value"))).alias("offset"),
            F.current_timestamp().alias("timestamp"),
            F.lit(0).alias("timestampType"),
        )
    )
    want = _parse_datatype_string(KAFKA_SOURCE_SCHEMA)
    assert [(f.name, f.dataType) for f in shaped.schema] == [
        (f.name, f.dataType) for f in want
    ]  # nullability differs on literals; names+types are the contract


def test_plasma_frontend_kafka_topology(spark, tmp_path):
    """Distributed Plasma front-end (PlasmaFrontEnd.java:460 topology):
    a kafka-shaped plasma topic stream consumed by plasma_frontend
    pushes GTS text to the hub's subscribers — only selector-matched
    lines reach each session, exactly like the standalone in-process
    wiring, so the cluster deployment differs only in the source."""
    import threading

    from warp10_platform_spark.core.selector import parse_selector
    from warp10_platform_spark.server import PlasmaHub
    from warp10_platform_spark.streaming.ingest import plasma_frontend

    text_dir = tmp_path / "plasma_topic"
    text_dir.mkdir()
    (text_dir / "b1.txt").write_text(
        "1704844800000000// pf.cpu{dc=eu} 0.25\n"
        "1704844800000001// pf.cpu{dc=us} 0.50\n"
        "1704844800000002// pf.mem{dc=eu} 0.75\n"
    )

    hub = PlasmaHub()

    class FakeConn:
        def __init__(self):
            self.lines = []
            self.open = True
            self._lk = threading.Lock()

        def send_text(self, text):
            with self._lk:
                self.lines.extend(ln for ln in text.splitlines() if ln.strip())

        def close(self, *a):
            self.open = False

        abort = close

    sub = FakeConn()
    hub.register(sub)
    hub.subscribe(sub, "pf.cpu{dc=eu}", parse_selector("pf.cpu{dc=eu}"))

    q = plasma_frontend(
        spark, hub, source="kafka-shaped", path=str(text_dir),
        topic="plasma-out", checkpoint=str(tmp_path / "ckpt"),
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    import time as _time

    deadline = _time.time() + 15
    while _time.time() < deadline and len(sub.lines) < 1:
        _time.sleep(0.1)
    assert sub.lines == ["1704844800000000// pf.cpu{dc=eu} 0.25"]
    hub.deregister(sub)


def test_streaming_semantic_dedup_matches_batch(spark, tmp_path):
    """r8 verdict #5: the streaming semantic-dedup tier's cross-batch
    drop decisions equal batch semantic_dedup on the same data. The
    fixture exercises the hard cases: a TRANSITIVE chain (a~b, b~c,
    a!~c — c must be dropped by the DROPPED rep b, so state must hold
    all reps, not survivors), depth-2 transitivity across batch
    boundaries, an exact duplicate across batches, a zero vector
    (NULL-cosine semantics: always kept), and a second IVF cell."""
    import json
    import math
    import os

    from warp10_platform_spark.pipeline.similarity import semantic_dedup
    from warp10_platform_spark.streaming import streaming_semantic_dedup

    cents = [[1.0, 0.0], [-1.0, 0.0]]
    t = 0.85

    def ang(deg):
        return [math.cos(math.radians(deg)), math.sin(math.radians(deg))]

    rows = [
        # batch 1
        (1, ang(0)),     # cell0 rep — kept
        (2, ang(30)),    # cos(1,2)=.866>=t — dropped by 1
        # batch 2
        (3, ang(60)),    # cos(1,3)=.5<t BUT cos(2,3)=.866 — dropped by DROPPED 2
        (4, ang(0)),     # exact duplicate of 1 across the batch boundary — dropped
        (5, [0.0, 0.0]),  # zero vector — NULL cosine, kept
        # batch 3
        (6, ang(170)),   # cell1 rep — kept
        (7, ang(150)),   # cos(6,7)=cos20=.94 — dropped by 6
        (8, ang(80)),    # cell0; only dominator is DROPPED 3 (cos20=.94) — dropped
    ]
    batches = [rows[:2], rows[2:5], rows[5:]]
    d = tmp_path / "semdedup_stream"
    os.makedirs(d)
    for i, b in enumerate(batches):
        p = d / f"b{i}.json"
        p.write_text(
            "\n".join(json.dumps({"vec_id": vid, "embedding": emb}) for vid, emb in b)
        )
        # FileStreamSource orders by mtime; sub-ms write ties would make
        # the batch order (and thus which rep arrives first) arbitrary
        os.utime(p, (1_700_000_000 + i, 1_700_000_000 + i))

    stream = (
        spark.readStream.schema("vec_id long, embedding array<double>")
        .option("maxFilesPerTrigger", 1)
        .json(str(d))
    )
    out = streaming_semantic_dedup(stream, cents, threshold=t)
    sink = f"semdedup_{uuid.uuid4().hex[:8]}"
    q = (
        out.writeStream.format("memory").queryName(sink)
        .outputMode("append").trigger(availableNow=True).start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    streamed = {r["vec_id"]: (r["ivf_cell"], r["kept"]) for r in spark.table(sink).collect()}

    # batch twin on the union of all batches (non-ANSI: the zero vector's
    # 0/0 cosine must be NULL, not a DIVIDE_BY_ZERO error — same branch
    # the batch guard property tests take)
    ansi = spark.conf.get("spark.sql.ansi.enabled", "false")
    spark.conf.set("spark.sql.ansi.enabled", "false")
    try:
        bdf = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
        batch = {
            r["vec_id"]: (r["ivf_cell"], r["kept"])
            for r in semantic_dedup(bdf, cents, threshold=t).collect()
        }
    finally:
        spark.conf.set("spark.sql.ansi.enabled", ansi)

    assert streamed == batch
    kept = sorted(v for v, (_, k) in streamed.items() if k)
    assert kept == [1, 5, 6]  # transitive drops (3, 8) + dup (4) + chain (2, 7)


def test_streaming_semantic_dedup_rejects_out_of_order_ids(spark, tmp_path):
    """The equality-with-batch contract requires ids to ASCEND across
    micro-batches (append-only ingest); an out-of-order arrival must
    fail the query loudly instead of silently inverting keep/drop
    decisions relative to batch semantic_dedup (r9 review find: id 5
    arriving after id 9 would be judged against a dominator the batch
    operator says it precedes)."""
    import json
    import os

    from pyspark.errors.exceptions.captured import StreamingQueryException

    from warp10_platform_spark.streaming import streaming_semantic_dedup

    cents = [[1.0, 0.0]]
    d = tmp_path / "semdedup_ooo"
    os.makedirs(d)
    for i, batch in enumerate([[(9, [1.0, 0.0])], [(5, [0.9, 0.1])]]):
        p = d / f"b{i}.json"
        p.write_text("\n".join(json.dumps({"vec_id": v, "embedding": e}) for v, e in batch))
        os.utime(p, (1_700_000_000 + i, 1_700_000_000 + i))
    stream = (
        spark.readStream.schema("vec_id long, embedding array<double>")
        .option("maxFilesPerTrigger", 1)
        .json(str(d))
    )
    out = streaming_semantic_dedup(stream, cents, threshold=0.85)
    sink = f"semdedup_ooo_{uuid.uuid4().hex[:8]}"
    q = (
        out.writeStream.format("memory").queryName(sink)
        .outputMode("append").trigger(availableNow=True).start()
    )
    try:
        with pytest.raises(StreamingQueryException, match="ascending across"):
            q.processAllAvailable()
            if q.exception() is not None:
                raise q.exception()
    finally:
        q.stop()


def test_plasma_frontend_batch_bound(spark, tmp_path):
    """r8 verdict #1: the front-end's micro-batch materialization is
    bounded. (a) a pre-loaded backlog exceeding max_batch_rows fails the
    query loudly instead of collecting it all; (b) max_batch_rows=None
    without any source-side per-trigger knob is refused at start; (c)
    max_batch_rows=None WITH maxFilesPerTrigger is accepted and drains
    the same backlog in bounded batches."""
    from warp10_platform_spark.server import PlasmaHub
    from warp10_platform_spark.streaming.ingest import plasma_frontend

    text_dir = tmp_path / "backlog_topic"
    text_dir.mkdir()
    # a "restarted front-end" scenario: the topic already holds a backlog
    for f in range(3):
        (text_dir / f"b{f}.txt").write_text(
            "".join(f"17048448000000{f}{i}// pf.cpu{{dc=eu}} 0.{i}\n" for i in range(5))
        )

    hub = PlasmaHub()

    # (b) unbounded on BOTH sides → refused before any stream starts
    with pytest.raises(ValueError, match="per-trigger bound"):
        plasma_frontend(
            spark, hub, source="kafka-shaped", path=str(text_dir),
            checkpoint=str(tmp_path / "ckpt_none"), max_batch_rows=None,
        )

    # (b') a knob the chosen source does NOT honor is not a bound: a
    # kafka admission option left behind while swapping to the
    # file-backed source must be refused, not silently ignored (r9
    # review find — the old name-only check passed this)
    with pytest.raises(ValueError, match="SOURCE HONORS"):
        plasma_frontend(
            spark, hub, source="kafka-shaped", path=str(text_dir),
            checkpoint=str(tmp_path / "ckpt_mismatch"), max_batch_rows=None,
            maxOffsetsPerTrigger="10000",
        )

    # (a) backlog (15 lines, one batch with no trigger knob) > cap=4 →
    # the foreachBatch guard fails the query, loudly
    q = plasma_frontend(
        spark, hub, source="kafka-shaped", path=str(text_dir),
        checkpoint=str(tmp_path / "ckpt_cap"), max_batch_rows=4,
    )
    try:
        with pytest.raises(Exception, match="max_batch_rows"):
            q.processAllAvailable()
    finally:
        q.stop()

    # (c) source-side bound accepted in place of the row cap; every
    # batch is ≤ 1 file (5 lines) and the full backlog drains
    import threading

    class FakeConn:
        def __init__(self):
            self.lines = []
            self.open = True
            self._lk = threading.Lock()

        def send_text(self, text):
            with self._lk:
                self.lines.extend(ln for ln in text.splitlines() if ln.strip())

        def close(self, *a):
            self.open = False

        abort = close

    sub = FakeConn()
    hub.register(sub)
    from warp10_platform_spark.core.selector import parse_selector

    hub.subscribe(sub, "pf.cpu{dc=eu}", parse_selector("pf.cpu{dc=eu}"))
    q2 = plasma_frontend(
        spark, hub, source="kafka-shaped", path=str(text_dir),
        checkpoint=str(tmp_path / "ckpt_mfpt"), max_batch_rows=None,
        maxFilesPerTrigger="1",
    )
    try:
        q2.processAllAvailable()
    finally:
        q2.stop()
    assert len(sub.lines) == 15
    hub.deregister(sub)
