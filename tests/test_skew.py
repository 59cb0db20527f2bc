"""Skew stress (r4 verdict item 5): the two adversarial distortions a
100 TB deployment hits — one series holding ~50% of all points, and one
LSH band bucket holding ~50% of the corpus — must stay correct (vs the
DuckDB oracle on the same skewed parquet) and keep their scale-shaped
plans. Fixtures are built deterministically by
scripts/make_scale_fixtures.make_skew into .cache/skew."""

import os
import sys

import pytest
from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SKEW_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".cache", "skew")


@pytest.fixture(scope="session")
def skew_dir():
    if not os.path.exists(os.path.join(SKEW_DIR, "events.parquet")):
        from scripts.make_scale_fixtures import make_skew

        make_skew()
    return SKEW_DIR


@pytest.fixture(scope="session")
def skew_duck(skew_dir):
    import duckdb

    con = duckdb.connect()
    for t in "region nation customer supplier part orders lineitem events documents embeddings".split():
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{skew_dir}/{t}.parquet')")
    yield con
    con.close()


def test_fixture_is_actually_skewed(spark, skew_dir):
    ev = spark.read.parquet(os.path.join(skew_dir, "events.parquet"))
    total = ev.count()
    fat = ev.where(F.col("user_id") == 777).count()
    assert fat >= total * 0.45  # one user holds ~half of all points

    docs = spark.read.parquet(os.path.join(skew_dir, "documents.parquet"))
    top = docs.groupBy("text").count().agg(F.max("count")).collect()[0][0]
    assert top >= docs.count() * 0.45  # one text holds ~half the corpus


def test_session_has_skew_machinery(spark):
    assert spark.conf.get("spark.sql.adaptive.enabled") == "true"
    assert spark.conf.get("spark.sql.adaptive.skewJoin.enabled") == "true"


@pytest.mark.parametrize(
    "qname",
    ["sessionize", "fill_previous", "topk_per_series", "map_moving_mean", "zscoretest"],
)
def test_fat_series_queries_match_oracle(spark, skew_dir, skew_duck, qname):
    """Per-series operators on a series 7500x fatter than its siblings:
    same oracle gate as the driver, on the skewed parquet."""
    from tests.conftest import compare_to_oracle

    import __spark_entry__ as E

    out = E.queries()[qname](spark, skew_dir)
    compare_to_oracle(out, skew_duck, E.oracle_sql()[qname])


def test_lsh_band_bucket_explosion_stays_correct(spark, skew_dir, skew_duck):
    """2500 byte-identical docs = one signature group; the rep-banding
    guard keeps the band self-join linear and the candidate set exact."""
    from tests.conftest import compare_to_oracle

    import __spark_entry__ as E

    out = E.queries()["doc_exact_dedup"](spark, skew_dir)
    compare_to_oracle(out, skew_duck, E.oracle_sql()["doc_exact_dedup"])


def test_lsh_guard_band_join_is_linear_under_skew(spark, skew_dir):
    """Under 50% duplication the band self-join input is one row per
    DISTINCT signature — the banded frame must be ~half the corpus, not
    the corpus, and the rep-level candidate count stays tiny."""
    from warp10_platform_spark.pipeline.dedup import minhash_signatures

    docs = spark.read.parquet(os.path.join(skew_dir, "documents.parquet"))
    sig = minhash_signatures(docs, n=3, num_hashes=32)
    n_docs = docs.count()
    n_sigs = sig.select(F.md5(F.array_join(F.col("sig").cast("array<string>"), ","))).distinct().count()
    assert n_sigs <= n_docs * 0.55  # the giant dup group collapsed to 1 signature


def test_ngram_guard_preserves_pairs(spark):
    """The identical-set guard must yield EXACTLY the naive all-pairs
    result (ids and jaccard) on a mixed corpus of exact dups, near-dups
    and unrelated docs — the r5 skew-fix equivalence property."""
    from warp10_platform_spark.pipeline.dedup import _shingles, ngram_jaccard_pairs

    base = "the quick brown fox jumps over the lazy dog again and again today"
    texts = [base, base, base + " extra words", "something else entirely different here now", base,
             base + " extra words"]
    docs = spark.createDataFrame(list(enumerate(texts)), ["doc_id", "text"])
    got = {(r["id_a"], r["id_b"], r["jaccard"]) for r in ngram_jaccard_pairs(docs, threshold=0.3).collect()}

    # naive reference: python-side all-pairs over the same shingle sets
    sh = {r["doc_id"]: set(r["sh"]) for r in _shingles(docs, 3, "doc_id").collect()}
    want = set()
    for a in sh:
        for b in sh:
            if a < b:
                i = len(sh[a] & sh[b])
                j = i / (len(sh[a]) + len(sh[b]) - i)
                if j >= 0.3:
                    want.add((a, b, round(j, 6)))
    assert got == want


def test_cluster_edges_same_components(spark):
    """cluster_edges=True feeds k-1 edges per duplicate group but the
    connected components are identical to the full pair set."""
    from warp10_platform_spark.pipeline.cluster import dup_clusters
    from warp10_platform_spark.pipeline.dedup import ngram_jaccard_pairs

    base = "the quick brown fox jumps over the lazy dog again and again today"
    texts = [base, base, base + " extra words", "different corpus content over here right now", base,
             "different corpus content over here right away"]
    docs = spark.createDataFrame(list(enumerate(texts)), ["doc_id", "text"])
    full = ngram_jaccard_pairs(docs, threshold=0.3)
    star = ngram_jaccard_pairs(docs, threshold=0.3, cluster_edges=True)
    cf = {(r["doc_id"], r["cluster_rep"]) for r in dup_clusters(full).collect()}
    cs = {(r["doc_id"], r["cluster_rep"]) for r in dup_clusters(star).collect()}
    assert cf == cs
    assert star.count() < full.count() or full.count() <= 1
