"""Equivalence tests for the r10 Arrow/numpy kernels (pipeline/kernels.py):
every kernel must be BIT-IDENTICAL to the SQL-expression form it replaces,
on adversarial corpora — the kernels are optimizations, never semantics."""

import pytest
from pyspark.sql import functions as F

from warp10_platform_spark.pipeline import similarity as sim


def _collect_set(df):
    return sorted(tuple(r) for r in df.collect())


CENTS = [[1.0, 0.0, 0.0], [0.0, 1.0, 0.0], [0.0, 0.0, 1.0]]


def _mixed_corpus(spark, n=300, seed=7):
    """Vectors spanning all cells with exact duplicates, near-ties at the
    0.9 decision boundary, anti-aligned and tiny-magnitude rows."""
    import random

    rnd = random.Random(seed)
    rows = []
    for i in range(n):
        kind = i % 6
        if kind == 0:
            v = [1.0, rnd.uniform(-0.1, 0.4), rnd.uniform(-0.1, 0.1)]
        elif kind == 1:
            v = [1.0, 0.05, 0.0]  # exact duplicate group
        elif kind == 2:
            v = [rnd.uniform(-0.2, 0.2), 1.0, rnd.uniform(-0.5, 0.5)]
        elif kind == 3:
            v = [-1.0, rnd.uniform(-0.2, 0.2), 0.1]
        elif kind == 4:
            v = [1e-154, rnd.uniform(0.5, 1.5) * 1e-154, 0.0]  # tiny magnitude
        else:
            v = [0.0, 0.0, 1.0 + i * 1e-9]  # near-tie ladder in cell 2
        rows.append((i, v))
    return spark.createDataFrame(rows, ["vec_id", "embedding"])


def test_semantic_kernel_matches_join_path(spark):
    """kernel_cell_max routing must not change a single verdict: all-kernel
    (big gate), all-join (None), and mixed (gate splits the cells) agree."""
    emb = _mixed_corpus(spark)
    for thr in (0.4, 0.9, 1.5):
        want = _collect_set(sim.semantic_dedup(emb, CENTS, threshold=thr, kernel_cell_max=None))
        allk = _collect_set(sim.semantic_dedup(emb, CENTS, threshold=thr, kernel_cell_max=4096))
        assert allk == want, f"all-kernel != join at t={thr}"
        # gate between the cell sizes: some cells kernel, some join
        sizes = sorted(
            r["n"]
            for r in sim.semantic_dedup(emb, CENTS, threshold=thr)
            .groupBy("ivf_cell").agg(F.count("*").alias("n")).collect()
        )
        mid = sizes[len(sizes) // 2]
        mixed = _collect_set(sim.semantic_dedup(emb, CENTS, threshold=thr, kernel_cell_max=mid))
        assert mixed == want, f"mixed routing != join at t={thr}"


def test_semantic_kernel_zero_vectors_non_ansi(spark):
    """Non-ANSI: x/0 is NULL on the join path, so zero vectors neither
    dominate nor get dominated — the kernel's denominator mask must
    reproduce that exactly."""
    rows = [(0, [1.0, 0.0, 0.0]), (1, [1.0, 0.0, 0.0]), (2, [0.0, 0.0, 0.0]),
            (3, [0.0, 0.0, 0.0]), (4, [0.0, 1.0, 0.0])]
    emb = spark.createDataFrame(rows, ["vec_id", "embedding"])
    prev = spark.conf.get("spark.sql.ansi.enabled")
    spark.conf.set("spark.sql.ansi.enabled", "false")
    try:
        want = _collect_set(sim.semantic_dedup(emb, CENTS, threshold=0.9, kernel_cell_max=None))
        got = _collect_set(sim.semantic_dedup(emb, CENTS, threshold=0.9, kernel_cell_max=4096))
        assert got == want
        kept = {t[0]: t[2] for t in got}
        assert kept[2] and kept[3]  # zero vectors all kept on both paths
    finally:
        spark.conf.set("spark.sql.ansi.enabled", prev)


def test_semantic_kernel_zero_vectors_ansi_raise(spark):
    """ANSI: the join path raises DIVIDE_BY_ZERO on a zero-norm pair; the
    kernel must fail the job loudly too, not silently mask."""
    rows = [(0, [1.0, 0.0, 0.0]), (1, [0.0, 0.0, 0.0])]
    emb = spark.createDataFrame(rows, ["vec_id", "embedding"])
    prev = spark.conf.get("spark.sql.ansi.enabled")
    spark.conf.set("spark.sql.ansi.enabled", "true")
    try:
        with pytest.raises(Exception, match="zero-norm|DIVIDE_BY_ZERO"):
            sim.semantic_dedup(emb, CENTS, threshold=0.9, kernel_cell_max=4096).collect()
    finally:
        spark.conf.set("spark.sql.ansi.enabled", prev)


def test_semantic_kernel_boundary_cutoff_ties(spark):
    """Cosines manufactured ONTO the round(.,6) decision boundary at
    t=0.9: kernel and join must agree pair by pair (the cutoff constant
    is shared, but the kernel's division/compare runs in numpy)."""
    import math

    rows = [(0, [1.0, 0.0, 0.0])]
    # vectors at angle acos(c) from e0 for cosines bracketing the cutoff
    for i, c in enumerate([0.8999994, 0.8999995, 0.8999996, 0.9000004, 0.9000005, 0.9000006]):
        s = math.sqrt(1.0 - c * c)
        rows.append((i + 1, [c, s, 0.0]))
    emb = spark.createDataFrame(rows, ["vec_id", "embedding"])
    want = _collect_set(sim.semantic_dedup(emb, CENTS, threshold=0.9, kernel_cell_max=None))
    got = _collect_set(sim.semantic_dedup(emb, CENTS, threshold=0.9, kernel_cell_max=4096))
    assert got == want
