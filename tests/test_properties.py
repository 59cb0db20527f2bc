"""Property-based tests (hypothesis): selector roundtrip, duration
algebra, bucket-grid invariants, GTS text-format roundtrip.

Spark-touching properties generate a BATCH of rows per example and make
one Spark call, so hypothesis iterations don't multiply job count.
"""

import math
import string

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from warp10_platform_spark.core.selector import parse_selector, selector_predicate, to_selector
from warp10_platform_spark.functions.timeutil import DAY, HOUR, MINUTE, S, parse_duration
from warp10_platform_spark.operators.bucketize import bucket_end_col

_name = st.text(alphabet=string.ascii_lowercase + string.digits + "._-", min_size=1, max_size=12)
_val = st.text(alphabet=string.ascii_letters + string.digits + "-_/ ", min_size=0, max_size=10)


@given(cls=_name, labels=st.dictionaries(_name, _val, max_size=4))
@settings(max_examples=200, deadline=None)
def test_selector_roundtrip(cls, labels):
    sel = to_selector(cls, labels)
    parsed = parse_selector(sel)
    assert parsed.class_exact == cls
    assert {k: v for k, _, v in parsed.labels} == labels
    assert all(op == "=" for _, op, _ in parsed.labels)


@given(d=st.integers(0, 30), h=st.integers(0, 23), m=st.integers(0, 59), s=st.integers(0, 59))
@settings(max_examples=100, deadline=None)
def test_duration_composition(d, h, m, s):
    iso = f"P{d}DT{h}H{m}M{s}S"
    assert parse_duration(iso) == d * DAY + h * HOUR + m * MINUTE + s * S


@given(
    ticks=st.lists(st.integers(0, 10**15), min_size=1, max_size=50),
    span=st.integers(1, 10**9),
    anchor_off=st.integers(0, 10**9),
)
@settings(max_examples=200, deadline=None)
def test_bucket_grid_invariants_python(ticks, span, anchor_off):
    """bucket_end = lastbucket - ((lastbucket - ts) DIV span)*span must
    (a) lie on the lastbucket-anchored grid and (b) cover ts within
    (bucket_end - span, bucket_end]."""
    lastbucket = max(ticks) + anchor_off
    for ts in ticks:
        be = lastbucket - ((lastbucket - ts) // span) * span
        assert (lastbucket - be) % span == 0
        assert be - span < ts <= be


def test_bucket_end_col_matches_python(spark):
    import random

    rnd = random.Random(7)
    rows = [(rnd.randrange(0, 10**15),) for _ in range(500)]
    span = 86_400_000_000
    lastbucket = max(t for t, in rows) + 12345
    df = spark.createDataFrame(rows, "ts long").withColumn("be", bucket_end_col(lastbucket, span))
    for r in df.collect():
        expect = lastbucket - ((lastbucket - r["ts"]) // span) * span
        assert r["be"] == expect


def test_gts_text_roundtrip_property(spark):
    """format(parse) identity over randomized typed points — one batched
    Spark roundtrip over hypothesis-style generated rows."""
    import random

    from warp10_platform_spark.core.schema import with_gts_id
    from warp10_platform_spark.sources.gts_text import format_gts_lines, parse_gts_lines

    rnd = random.Random(99)
    rows = []
    for i in range(300):
        kind = rnd.choice(["d", "l", "b", "s"])
        v_long = rnd.randrange(-10**12, 10**12) if kind == "l" else None
        v_double = (
            rnd.choice([0.0, -1.5, 1e-7, 12345.678, 9.87e20, float(rnd.randrange(10**6)) + 0.25])
            if kind == "d"
            else None
        )
        v_bool = rnd.random() < 0.5 if kind == "b" else None
        v_string = "".join(rnd.choices(string.ascii_letters + string.digits + " _-", k=rnd.randrange(0, 12))) if kind == "s" else None
        rows.append(
            (
                "c." + rnd.choice(["a", "b", "cc"]),
                {"k": str(rnd.randrange(100))},
                rnd.randrange(0, 10**15),
                rnd.uniform(-90, 90) if rnd.random() < 0.5 else None,
                rnd.uniform(-180, 180) if rnd.random() < 0.5 else None,
                rnd.randrange(-10**6, 10**6) if rnd.random() < 0.5 else None,
                v_long,
                v_double,
                v_bool,
                v_string,
            )
        )
    schema = (
        "class string, labels map<string,string>, ts long, lat double, lon double, elev long, "
        "v_long long, v_double double, v_bool boolean, v_string string"
    )
    df = with_gts_id(
        spark.createDataFrame(rows, schema).withColumn(
            "lon", F.when(F.col("lat").isNotNull(), F.coalesce("lon", F.lit(0.0)))
        ).withColumn("lat", F.when(F.col("lon").isNotNull(), F.col("lat")))
        .withColumn("attributes", F.create_map().cast("map<string,string>"))
    )
    back = parse_gts_lines(format_gts_lines(df)).orderBy("ts", "class").collect()
    orig = df.orderBy("ts", "class").collect()
    assert len(back) == len(orig)
    for b, o in zip(back, orig):
        assert b["class"] == o["class"] and b["ts"] == o["ts"] and b["labels"] == o["labels"]
        assert b["v_long"] == o["v_long"] and b["v_bool"] == o["v_bool"]
        if o["v_string"] is not None:
            assert b["v_string"] == o["v_string"]
        if o["v_double"] is not None:
            assert b["v_double"] == o["v_double"] or (math.isnan(b["v_double"]) and math.isnan(o["v_double"]))


def test_thin_matches_reference_state_machine(spark):
    """GTSFrame.thin against a direct replay of the reference scan loop
    (MultiScanGTSDecoderIterator.java:380-420) on randomized series."""
    import random

    from warp10_platform_spark.core.frame import GTSFrame
    from warp10_platform_spark.core.schema import with_gts_id
    from pyspark.sql import functions as F

    rnd = random.Random(7)
    rows = []
    for s in range(5):
        ticks = sorted(rnd.sample(range(0, 5000), rnd.randint(1, 60)))
        for t in ticks:
            rows.append((f"c{s}", t, float(rnd.randint(0, 100))))
    df = spark.createDataFrame(rows, ["class", "ts", "v_double"]).withColumn(
        "labels", F.create_map().cast("map<string,string>")
    )
    df = with_gts_id(df)

    for step, timestep in ((1, 100), (3, 1), (2, 250)):
        got = {
            (r["class"], r["ts"])
            for r in GTSFrame(df).thin(step=step, timestep=timestep).df.collect()
        }
        want = set()
        by_series = {}
        for cls, t, v in rows:
            by_series.setdefault(cls, []).append(t)
        for cls, ticks in by_series.items():
            nxt, steps = None, 0
            for t in sorted(ticks, reverse=True):
                if nxt is not None and t > nxt:
                    continue
                nxt = t - timestep
                if steps > 0:
                    steps -= 1
                    continue
                steps = step - 1
                want.add((cls, t))
        assert got == want, (step, timestep)


def test_minhash_lsh_all_dup_corpus_guarded(spark):
    """Band-skew guard: a corpus of byte-identical docs must band-join
    over ONE representative (not quadratic×bands) and still emit every
    pair, each verified at jaccard 1.0."""
    from pyspark.sql import functions as F

    from warp10_platform_spark.pipeline.dedup import minhash_lsh_pairs

    n = 120
    dup = spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.lit("alpha beta gamma delta epsilon zeta eta theta").alias("text"),
    )
    out = minhash_lsh_pairs(dup).collect()
    assert len(out) == n * (n - 1) // 2
    assert all(r["jaccard"] == 1.0 for r in out)
    assert all(r["id_a"] < r["id_b"] for r in out)


def test_minhash_lsh_guard_preserves_candidates(spark):
    """Rep-level banding + expansion must yield the same verified pairs as
    plain doc-level banding (mixed corpus with exact dups and near-dups)."""
    from pyspark.sql import functions as F

    from warp10_platform_spark.pipeline.dedup import minhash_lsh_pairs, ngram_jaccard_pairs

    base = "the quick brown fox jumps over the lazy dog again and again today"
    texts = [base, base, base + " extra", "completely different words entirely here now", base]
    docs = spark.createDataFrame(list(enumerate(texts)), ["doc_id", "text"])
    lsh = {(r["id_a"], r["id_b"]) for r in minhash_lsh_pairs(docs, threshold=0.5).collect()}
    exact = {(r["id_a"], r["id_b"]) for r in ngram_jaccard_pairs(docs, threshold=0.5).collect()}
    # LSH candidates are a subset of exact pairs and must include every
    # identical-text pair (same signature -> same bands by construction)
    assert lsh <= exact
    assert {(0, 1), (0, 4), (1, 4)} <= lsh


def test_simhash_guard_preserves_pairs(spark):
    """The identical-fingerprint guard (rep-level segment blocking +
    expansion, r7) must emit exactly the unguarded pair set: a mixed
    corpus with exact dups (hamming 0 intra-group), near-dups (small
    hamming cross-group) and unrelated docs."""
    from pyspark.sql import functions as F

    from warp10_platform_spark.pipeline.dedup import simhash, simhash_pairs

    base = "the quick brown fox jumps over the lazy dog again and again today"
    texts = [base, base, base + " extra", "completely different words entirely here now", base,
             base + " more", "other unrelated text goes here instead"]
    docs = spark.createDataFrame(list(enumerate(texts)), ["doc_id", "text"])
    got = {(r["id_a"], r["id_b"], r["hamming"]) for r in simhash_pairs(docs, radius=3).collect()}
    # unguarded reference: plain a<b self-join over fingerprints
    fp = simhash(docs)
    a, b = fp.alias("a"), fp.alias("b")
    ham = F.bit_count(F.col("a.simhash").bitwiseXOR(F.col("b.simhash")))
    want = {
        (r["id_a"], r["id_b"], r["hamming"])
        for r in a.join(b, F.col("a.doc_id") < F.col("b.doc_id"))
        .select(F.col("a.doc_id").alias("id_a"), F.col("b.doc_id").alias("id_b"), ham.alias("hamming"))
        .where(F.col("hamming") <= 3).collect()
    }
    assert got == want and {(0, 1, 0), (0, 4, 0), (1, 4, 0)} <= got


def test_simhash_all_dup_corpus_guarded(spark):
    """A corpus of byte-identical docs must segment-join over ONE
    representative and still emit every pair at hamming 0."""
    from pyspark.sql import functions as F

    from warp10_platform_spark.pipeline.dedup import simhash_pairs

    n = 120
    dup = spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.lit("alpha beta gamma delta epsilon zeta eta theta").alias("text"),
    )
    out = simhash_pairs(dup).collect()
    assert len(out) == n * (n - 1) // 2
    assert all(r["hamming"] == 0 and r["id_a"] < r["id_b"] for r in out)


from hypothesis import given, settings
from hypothesis import strategies as st_


@settings(max_examples=25, deadline=None)
@given(
    w=st_.integers(1, 24),
    h=st_.integers(1, 24),
    seed=st_.integers(0, 2**31 - 1),
)
def test_png_roundtrip_property(w, h, seed):
    import numpy as np

    from warp10_platform_spark.multimodal.media import decode_png, encode_png_gray

    img = np.random.default_rng(seed).integers(0, 256, (h, w), dtype=np.uint8)
    assert np.array_equal(decode_png(encode_png_gray(img)), img)


@settings(max_examples=25, deadline=None)
@given(
    n=st_.integers(5, 10),
    seed=st_.integers(0, 2**31 - 1),
)
def test_wkt_roundtrip_and_raycast_consistency(n, seed):
    """Random simple (star-shaped) polygons: WKT round-trips exactly, and
    the driver-side ray cast agrees with point-in-shape for the centroid
    (inside) and a far point (outside)."""
    import math
    import random

    from warp10_platform_spark.operators.wkt import _point_in_rings, parse_wkt, to_wkt

    rnd = random.Random(seed)
    # star-shaped polygon around the origin: one vertex per angular
    # stratum (gaps < pi for n >= 5), positive radii -> simple polygon
    # that contains the origin
    angles = [2 * math.pi * (i + rnd.uniform(0.0, 0.9)) / n for i in range(n)]
    pts = [(round(r * math.cos(a), 6), round(r * math.sin(a), 6))
           for a, r in ((a, rnd.uniform(1.0, 10.0)) for a in angles)]
    shape = parse_wkt("POLYGON ((" + ", ".join(f"{x} {y}" for x, y in pts + [pts[0]]) + "))")
    assert parse_wkt(to_wkt(shape)).coords == shape.coords
    assert _point_in_rings(shape.coords, 0.0, 0.0)
    assert not _point_in_rings(shape.coords, 1000.0, 1000.0)


def _semantic_dedup_unguarded(spark, emb, centroids, threshold):
    """The pre-r8 direct in-cell self-join — kept as the property-test
    reference for the rep-collapse guard (pipeline/similarity.py)."""
    from pyspark.sql import functions as F

    from warp10_platform_spark.pipeline.similarity import _DOT, ivf_assign
    from warp10_platform_spark.pipeline.util import spread

    d = ivf_assign(spread(emb), centroids)
    n = d.withColumn("norm", F.sqrt(F.expr(_DOT.format(a="v", b="v")))).select(
        F.col("vec_id").alias("id"), "ivf_cell", "v", "norm"
    )
    a = n.select(F.col("id").alias("id_a"), "ivf_cell", F.col("v").alias("va"), F.col("norm").alias("na"))
    b = n.select(F.col("id").alias("id_b"), "ivf_cell", F.col("v").alias("vb"), F.col("norm").alias("nb"))
    dot = F.expr(_DOT.format(a="va", b="vb"))
    dominated = (
        a.join(b, ["ivf_cell"])
        .where(F.col("id_a") < F.col("id_b"))
        .where(F.round(dot / (F.col("na") * F.col("nb")), 6) >= threshold)
        .select(F.col("id_b").alias("id"))
        .distinct()
    )
    return (
        n.join(dominated.withColumn("dropped", F.lit(True)), "id", "left")
        .select(
            F.col("id").alias("vec_id"),
            F.col("ivf_cell").cast("long").alias("ivf_cell"),
            F.coalesce(~F.col("dropped"), F.lit(True)).alias("kept"),
        )
    )


def test_semantic_dedup_guard_preserves_verdicts(spark):
    """The identical-embedding rep-collapse guard (r8) must emit exactly
    the unguarded per-vector verdicts on a corpus mixing exact duplicate
    groups, in-cell near-dups, and cross-cell vectors — at a threshold
    below and above 1.0. Degenerate zero vectors are checked separately
    in non-ANSI mode (0/0 -> NULL cosine, which never satisfies >= t, so
    they neither dominate nor get dominated; under ANSI both paths raise
    DIVIDE_BY_ZERO identically)."""
    from pyspark.sql import functions as F

    from warp10_platform_spark.pipeline.similarity import semantic_dedup

    cents = [[1.0, 0.0, 0.0], [0.0, 1.0, 0.0], [0.0, 0.0, 1.0]]
    vecs = [
        (0, [1.0, 0.05, 0.0]),   # cell 0
        (1, [1.0, 0.05, 0.0]),   # exact dup of 0
        (2, [1.0, 0.30, 0.0]),   # near-dup of 0 (cos ~0.96)
        (3, [0.0, 1.0, 0.02]),   # cell 1
        (6, [0.0, 1.0, 0.02]),   # exact dup of 3
        (7, [-1.0, 0.0, 0.1]),   # cell 0 region, anti-aligned (cos < 0)
        (8, [1.0, 0.05, 0.0]),   # third copy of 0
        (9, [0.0, 0.95, -0.3]),  # cell 1, moderate cos
    ]
    emb = spark.createDataFrame(vecs, ["vec_id", "embedding"])
    for thr in (0.9, 1.5):
        got = sorted(tuple(r) for r in semantic_dedup(emb, cents, threshold=thr).collect())
        want = sorted(tuple(r) for r in _semantic_dedup_unguarded(spark, emb, cents, thr).collect())
        assert got == want, (thr, got, want)
    # verdicts are sane at 0.9: reps of dup groups kept, copies dropped
    res = {r["vec_id"]: r["kept"] for r in semantic_dedup(emb, cents, threshold=0.9).collect()}
    assert res[0] and not res[1] and not res[8]  # dup group keeps min id
    # zero vectors: guarded == unguarded in non-ANSI NaN semantics
    zvecs = vecs + [(4, [0.0, 0.0, 0.0]), (5, [0.0, 0.0, 0.0]), (10, [0.0, 0.0, 0.0])]
    zemb = spark.createDataFrame(zvecs, ["vec_id", "embedding"])
    prev = spark.conf.get("spark.sql.ansi.enabled")
    spark.conf.set("spark.sql.ansi.enabled", "false")
    try:
        got = sorted(tuple(r) for r in semantic_dedup(zemb, cents, threshold=0.9).collect())
        want = sorted(tuple(r) for r in _semantic_dedup_unguarded(spark, zemb, cents, 0.9).collect())
        assert got == want, (got, want)
        zres = {t[0]: t[2] for t in got}
        # Spark non-ANSI divide-by-zero yields NULL (not IEEE NaN), and
        # NULL >= t filters out — zero vectors neither dominate nor get
        # dominated, so every one is kept, including the duplicates
        assert zres[4] and zres[5] and zres[10]
    finally:
        spark.conf.set("spark.sql.ansi.enabled", prev)


def test_semantic_dedup_all_dup_corpus_guarded(spark):
    """A corpus of N identical vectors must pair-join over ONE
    representative: verdicts are min-id-keep, and the rep-level join the
    plan runs is 1x1 per cell (duplication-independent by construction)."""
    from pyspark.sql import functions as F

    from warp10_platform_spark.pipeline.similarity import semantic_dedup

    n = 200
    emb = spark.range(n).select(F.col("id").alias("vec_id"), F.array(F.lit(1.0), F.lit(2.0)).alias("embedding"))
    out = semantic_dedup(emb, [[1.0, 2.0], [-1.0, -2.0]], threshold=0.9).collect()
    assert len(out) == n
    kept = {r["vec_id"] for r in out if r["kept"]}
    assert kept == {0}


def test_semantic_dedup_cell_cap_fails_loudly(spark):
    """More DISTINCT embeddings in one cell than cell_cap must fail the
    job with the retrain-centroids message (plan-side assert_true), not
    silently run the quadratic; the same corpus passes with the cap off."""
    import pytest
    from pyspark.sql import functions as F

    from warp10_platform_spark.pipeline.similarity import semantic_dedup

    # 50 DISTINCT vectors, all landing in cell 0
    emb = spark.range(50).select(
        F.col("id").alias("vec_id"),
        F.array(F.lit(1.0), (F.col("id") * 0.001).cast("double")).alias("embedding"),
    )
    cents = [[1.0, 0.0], [-1.0, 0.0]]
    with pytest.raises(Exception, match="retrain centroids"):
        semantic_dedup(emb, cents, threshold=0.99, cell_cap=10).collect()
    assert semantic_dedup(emb, cents, threshold=0.99, cell_cap=None).count() == 50
    assert semantic_dedup(emb, cents, threshold=0.99, cell_cap=50).count() == 50
