"""Guard-cache lifecycle (r8 verdict #2/#4): the dedup guards' persisted
member frames are tracked by pipeline.cache — bounded across repeated
pipeline calls in one session, deterministically releasable, and
scope-releasable — so a long-lived session never accumulates cached
frames and never relies on LRU eviction racing fragmentation."""

import os

import pytest

from warp10_platform_spark.pipeline import cache
from warp10_platform_spark.pipeline import dedup as D
from warp10_platform_spark.pipeline import similarity as S

from conftest import SF_DIR


def _n_cached(spark) -> int:
    return spark.sparkContext._jsc.getPersistentRDDs().size()


@pytest.fixture()
def docs(spark):
    return spark.read.parquet(os.path.join(SF_DIR, "documents.parquet"))


def test_repeated_pipeline_calls_do_not_leak_caches(spark, docs):
    """MAX_LIVE+4 back-to-back dedup calls leave at most MAX_LIVE cached
    RDDs live (the registry evicts the oldest), and release_guard_caches
    returns the session to its starting cache footprint."""
    cache.release_guard_caches()
    base = _n_cached(spark)
    for _ in range(cache.MAX_LIVE + 4):
        D.minhash_lsh_pairs(docs, n=3, num_hashes=8, bands=4, threshold=0.3).count()
    assert _n_cached(spark) - base <= cache.MAX_LIVE
    released = cache.release_guard_caches()
    assert released <= cache.MAX_LIVE
    assert _n_cached(spark) == base


def test_guard_cache_scope_releases_on_exit(spark, docs):
    cache.release_guard_caches()
    base = _n_cached(spark)
    with cache.guard_cache_scope():
        D.simhash_pairs(docs, radius=3).count()
        assert _n_cached(spark) > base  # the guard cache is live inside
    assert _n_cached(spark) == base


def test_scope_does_not_release_outer_caches(spark, docs):
    """A scope releases only what was registered inside it — an outer
    guard cache created before the scope survives."""
    cache.release_guard_caches()
    base = _n_cached(spark)
    pairs = D.minhash_lsh_pairs(docs, n=3, num_hashes=8, bands=4, threshold=0.3)
    pairs.count()
    outer = _n_cached(spark)
    assert outer > base
    with cache.guard_cache_scope():
        D.simhash_pairs(docs, radius=3).count()
    assert _n_cached(spark) == outer
    cache.release_guard_caches()
    assert _n_cached(spark) == base


def test_semantic_dedup_guard_is_tracked(spark):
    emb = spark.read.parquet(os.path.join(SF_DIR, "embeddings.parquet"))
    cache.release_guard_caches()
    base = _n_cached(spark)
    cents = S.ivf_centroids_trained()
    S.semantic_dedup(emb, cents, threshold=0.4).count()
    assert _n_cached(spark) > base
    cache.release_guard_caches()
    assert _n_cached(spark) == base


def test_released_guard_output_still_correct(spark, docs):
    """Unpersist drops the storage hint only: the same pairs frame
    materialized again AFTER release recomputes identical results."""
    pairs = D.minhash_lsh_pairs(docs, n=3, num_hashes=8, bands=4, threshold=0.3)
    before = sorted(tuple(r) for r in pairs.collect())
    cache.release_guard_caches()
    after = sorted(tuple(r) for r in pairs.collect())
    assert before == after and len(before) > 0


def test_eviction_fires_on_distinct_plans(spark):
    """MAX_LIVE+3 registrations with DISTINCT logical plans exercise the
    oldest-first eviction loop (the repeated-pipeline test above
    registers one identical plan over and over, which the same-plan
    reuse branch collapses to a single entry — found in the r9 review:
    the eviction path had zero coverage)."""
    cache.release_guard_caches()
    base = _n_cached(spark)
    frames = []
    for i in range(cache.MAX_LIVE + 3):
        df = cache.register(spark.range(100 + i).selectExpr("id", f"id * {i + 1} AS v"))
        df.count()
        frames.append(df)
    assert len(cache._live) == cache.MAX_LIVE  # oldest 3 evicted
    assert _n_cached(spark) - base <= cache.MAX_LIVE
    cache.release_guard_caches()
    assert _n_cached(spark) == base


def test_same_plan_reregistration_returns_original_object(spark):
    """Re-registering an identical plan must hand back the ORIGINAL
    tracked DataFrame (LRU refreshed), not track a second object: Spark's
    cache manager keys entries by plan, so a second tracked object would
    let guard_cache_scope unpersist on exit a cache an outer caller
    registered before the scope (r9 review find)."""
    cache.release_guard_caches()
    outer = cache.register(spark.range(500).selectExpr("id", "id * 7 AS v"))
    outer.count()
    with cache.guard_cache_scope():
        inner = cache.register(spark.range(500).selectExpr("id", "id * 7 AS v"))
        assert inner is outer  # shared plan -> shared tracked object
    # scope exit must NOT have unpersisted the outer frame's cache
    assert outer.storageLevel.useMemory or outer.storageLevel.useDisk
    cache.release_guard_caches()
