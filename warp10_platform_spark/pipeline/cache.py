"""Lifecycle for the dedup guards' persisted member frames.

Each rep-collapse guard (minhash/simhash/ngram's ``_group_members``,
``semantic_dedup``'s member frame) persists ONE frame that its reps /
membership / intra-pair branches all read — the r8 shape that replaced
collect_list. persist() alone leaks across a long-lived session: a
notebook running many dedup calls accumulates cached frames and relies
on LRU eviction racing memory fragmentation (r8 verdict #2/#4). This
module scopes them:

- ``register(df)`` — persist + track. The registry is BOUNDED: pushing
  past ``MAX_LIVE`` unpersists the oldest entry, so a long-lived session
  holds at most MAX_LIVE guard caches no matter how many pipeline calls
  it makes. One pipeline call registers at most two frames (the
  _group_members / semantic member build, plus r9: minhash's banded
  signature frame), well under MAX_LIVE, so evicting the oldest can
  never touch a frame a currently-building plan still shares.
- ``release_guard_caches()`` — deterministic release of everything
  still tracked (call after the consuming action when you control it).
- ``guard_cache_scope()`` — context manager releasing every cache
  registered inside the block on exit; for sinks/tests that materialize
  the output frame within the block.

Unpersist is non-blocking and merely drops the storage hint — a frame
whose cache was released recomputes (correctness unaffected; the
windowed guard is deterministic).
"""

from __future__ import annotations

from contextlib import contextmanager

from pyspark.sql import DataFrame

# One guard cache per pipeline call (see module docstring); 8 leaves
# generous headroom for future compositions while keeping a long-lived
# session's cached-frame count O(1) instead of O(#calls).
MAX_LIVE = 8

# (semantic_hash, frame): Spark's cache manager keys entries by LOGICAL
# PLAN, not by DataFrame object — two frames with the same plan share
# ONE cache entry, so evicting a stale same-plan twin would silently
# unpersist the LIVE frame's data (measured: emb_semantic_dedup 2.5s →
# 13.3s inside bench.py's repeated passes, where each pass rebuilds an
# identical plan). register() therefore drops any tracked same-plan
# entry WITHOUT unpersisting — the new registration owns the shared
# cache entry — and only genuinely-different plans are evicted. Plan
# identity is df.semanticHash() (one driver call; a 32-bit collision
# merely leaves one stale tracked-by-nothing entry until release).
_live: list[tuple[int, DataFrame]] = []


def _semantic_hash(df: DataFrame) -> int:
    try:
        return df.semanticHash()
    except Exception:
        return id(df)


def register(df: DataFrame) -> DataFrame:
    """Persist `df` (MEMORY_AND_DISK default) and track it for release.

    Re-registering a frame with the SAME logical plan returns the
    originally tracked DataFrame object (LRU position refreshed, persist
    re-asserted in case an external clearCache dropped it) rather than
    tracking a second object for the shared plan-keyed cache entry: a
    second object would let guard_cache_scope() — which tracks by object
    identity — unpersist on exit a cache an OUTER caller registered
    before the scope (review find, r9). The cheap semanticHash match is
    confirmed with one sameSemantics() round-trip so a 32-bit collision
    cannot silently splice a different plan's frame into a caller."""
    h = _semantic_hash(df)
    for i, (oh, old) in enumerate(_live):
        if oh == h:
            try:
                same = old.sameSemantics(df)
            except Exception:
                same = True
            if same:
                _live.pop(i)
                _live.append((oh, old))
                old.persist()
                return old
            break
    cached = df.persist()
    _live.append((h, cached))
    while len(_live) > MAX_LIVE:
        _live.pop(0)[1].unpersist(blocking=False)
    return cached


def release_guard_caches() -> int:
    """Unpersist every tracked guard cache; returns how many were live."""
    n = len(_live)
    while _live:
        _live.pop()[1].unpersist(blocking=False)
    return n


@contextmanager
def guard_cache_scope():
    """Release the guard caches registered inside the block on exit."""
    before = {id(df) for _h, df in _live}
    try:
        yield
    finally:
        for entry in [e for e in _live if id(e[1]) not in before]:
            _live.remove(entry)
            entry[1].unpersist(blocking=False)
