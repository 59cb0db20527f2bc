"""Similarity search over embedding columns (array<float>).

Brute-force cosine top-k is the correctness baseline: broadcast the query
set, JVM-side dot products (zip_with + aggregate — no Python in the
loop). The LSH variant buckets by random-hyperplane signs so candidate
generation is O(N) — the 100 TB path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from warp10_platform_spark.pipeline.util import spread as _spread

_DOT = "aggregate(zip_with({a}, {b}, (x, y) -> x * y), 0D, (acc, v) -> acc + v)"


def round6_ge_cutoff(threshold: float) -> float:
    """The double c such that `F.round(x, 6) >= threshold` ⟺ `x >= c` for
    every double x — letting similarity predicates drop the PER-PAIR
    round() (Spark's Round on doubles goes BigDecimal.valueOf →
    Double.toString per evaluation; measured r9: it cost ~3× the 64-dim
    HOF dot product itself in the semantic-dedup cell join).

    Derivation (exact, not approximate): Spark evaluates
    double(shortest_decimal(x) rounded HALF_UP to 6 dp) >= threshold.
    Both engines' double→decimal shortest round-trip repr is the unique
    nearest shortest decimal, and double conversion is monotone, so with
    m0 = the smallest integer with float(m0/1e6) >= threshold, the
    predicate holds iff shortest_decimal(x) >= m0/1e6 − 5e-7 (the exact
    HALF_UP tie included on both sides), which — because a 7-fractional-
    digit decimal is ≥ 5e-7 away from every other candidate while a
    double's round-trip zone is ≤ half an ulp (~1e-16 here) — holds iff
    x >= float(m0/1e6 − 5e-7). NULL→NULL→false and NaN>=c→false match
    round()'s behavior on both paths. Property-tested ulp-by-ulp around
    the boundaries in tests/test_round_cutoff.py.

    Thresholds must be POSITIVE (r9 advice): HALF_UP rounds away from
    zero, so for t <= 0 the exact negative tie (e.g. x = -0.5000005 at
    t = -0.5) is included by round() but excluded by this cutoff — the
    equivalence breaks by one double per boundary. No call site uses a
    non-positive threshold; fail loudly rather than silently diverge."""
    if not threshold > 0:
        raise ValueError(
            f"round6_ge_cutoff requires threshold > 0 (got {threshold}): the "
            "HALF_UP tie is inclusive on the other side for t <= 0"
        )
    from decimal import ROUND_FLOOR, Decimal

    # Smallest m0 with float(m0/1e6) >= threshold. Start from the FLOOR of
    # the exact binary expansion: when threshold's expansion sits just
    # above the decimal grid point (e.g. 0.9 → 0.90000000000000002…),
    # float(floor/1e6) re-rounds to the threshold double itself and
    # already satisfies >= — ceiling would overshoot by one grid step.
    m0 = int((Decimal(threshold) * 10**6).to_integral_value(rounding=ROUND_FLOOR))
    while float(Decimal(m0) / 10**6) < threshold:
        m0 += 1
    return float(Decimal(m0) / 10**6 - Decimal("0.0000005"))


def _as_double(df: DataFrame, col: str = "embedding") -> DataFrame:
    return df.withColumn("v", F.expr(f"transform({col}, x -> cast(x AS double))"))


def with_norm(df: DataFrame, col: str = "embedding") -> DataFrame:
    d = _as_double(df, col)
    return d.withColumn("norm", F.sqrt(F.expr(_DOT.format(a="v", b="v"))))


def cosine_topk(queries: DataFrame, candidates: DataFrame, k: int = 3) -> DataFrame:
    """Top-k cosine neighbors for each query vector (excluding self).

    Broadcast-join the (small) query set against all candidates; rank on
    round(sim, 6) with id tie-break so cross-engine float ulps cannot
    reorder."""
    q = with_norm(queries).select(F.col("vec_id").alias("qid"), F.col("v").alias("qv"), F.col("norm").alias("qn"))
    c = with_norm(_spread(candidates)).select(F.col("vec_id").alias("nid"), F.col("v").alias("cv"), F.col("norm").alias("cn"))
    dot = F.expr(_DOT.format(a="qv", b="cv"))
    sims = (
        c.join(F.broadcast(q), F.col("nid") != F.col("qid"))
        .withColumn("sim", F.round(dot / (F.col("qn") * F.col("cn")), 6))
    )
    w = Window.partitionBy("qid").orderBy(F.col("sim").desc(), F.col("nid").asc())
    return sims.withColumn("rk", F.row_number().over(w)).where(F.col("rk") <= k).select("qid", "nid", "sim")


def lsh_planes(dim: int, num_planes: int, seed: int = 42):
    import random

    rnd = random.Random(seed)
    return [[rnd.gauss(0, 1) for _ in range(dim)] for _ in range(num_planes)]


def _bucket_expr(planes) -> F.Column:
    """Sign-bit bucket id from random hyperplanes — pure SQL exprs over
    the array column (planes inlined as literals)."""
    bits = []
    for i, plane in enumerate(planes):
        arr = "array(" + ",".join(f"{x}D" for x in plane) + ")"
        bits.append(f"(CASE WHEN {_DOT.format(a='v', b=arr)} > 0 THEN {1 << i} ELSE 0 END)")
    return F.expr(" + ".join(bits)).alias("bucket")


def ivf_assign(df: DataFrame, centroids: list[list[float]], col: str = "embedding") -> DataFrame:
    """IVF coarse quantization: assign each vector to its nearest centroid
    (the inverted-file cell). Centroids are plan literals (trained
    offline / sampled deterministically); assignment is a JVM-side argmin
    over per-centroid dot-product distances — no UDF, no shuffle.

    r9: the v·v term is hoisted into one `_n2` column instead of being
    re-evaluated inside every centroid's struct — HOF exprs are
    interpreted, so the k inline copies cost k full dim-length passes per
    vector (k=8, dim=64: 16 dot products per vector where 9 suffice).
    Bitwise-identical: the hoisted aggregate produces the exact same
    double, every distance struct sees the same value as before."""
    d = _as_double(df, col).withColumn("_n2", F.expr(_DOT.format(a="v", b="v")))
    dists = []
    for i, c in enumerate(centroids):
        arr = "array(" + ",".join(f"{x}D" for x in c) + ")"
        # squared L2 via dot products: |v-c|^2 = v·v - 2 v·c + c·c
        cc = sum(x * x for x in c)
        dists.append(
            f"named_struct('d', _n2 - 2.0D * {_DOT.format(a='v', b=arr)} + {cc}D, 'i', {i})"
        )
    best = f"array_min(array({', '.join(dists)}))"  # struct compare: d first, i tie-break
    return d.withColumn("ivf_cell", F.expr(best + ".i")).drop("_n2")


def ivf_probe(df: DataFrame, centroids: list[list[float]], nprobe: int,
              col: str = "embedding") -> DataFrame:
    """Multi-probe assignment: one row per (vector, probed cell) for the
    vector's `nprobe` nearest centroids — the standard IVF recall lever.
    Same literal-centroid arithmetic as ivf_assign (incl. the r9 v·v
    hoist — bitwise-identical, see ivf_assign); the sorted-struct
    slice runs JVM-side, and the explode multiplies only the QUERY side
    (tiny) by nprobe."""
    d = _as_double(df, col).withColumn("_n2", F.expr(_DOT.format(a="v", b="v")))
    dists = []
    for i, c in enumerate(centroids):
        arr = "array(" + ",".join(f"{x}D" for x in c) + ")"
        cc = sum(x * x for x in c)
        dists.append(
            f"named_struct('d', _n2 - 2.0D * {_DOT.format(a='v', b=arr)} + {cc}D, 'i', {i})"
        )
    probed = (
        f"transform(slice(array_sort(array({', '.join(dists)})), 1, {nprobe}), s -> s.i)"
    )
    return d.withColumn("ivf_cell", F.explode(F.expr(probed))).drop("_n2")


def ivf_topk(
    queries: DataFrame,
    candidates: DataFrame,
    centroids: list[list[float]],
    k: int = 3,
    id_col: str = "vec_id",
    nprobe: int = 1,
) -> DataFrame:
    """IVF ANN top-k: search the query's `nprobe` nearest cells — the
    cell equi-join replaces the whole-corpus broadcast product; recall
    rises with nprobe (cost: query-side rows × nprobe, still tiny).
    Candidates keep exactly one cell, so probing introduces no duplicate
    (qid, nid) pairs."""
    qsrc = (
        ivf_probe(queries, centroids, nprobe)
        if nprobe > 1
        else ivf_assign(queries, centroids)
    )
    q = with_norm(qsrc).select(
        F.col(id_col).alias("qid"), F.col("v").alias("qv"), F.col("norm").alias("qn"), "ivf_cell"
    )
    c = with_norm(ivf_assign(_spread(candidates), centroids)).select(
        F.col(id_col).alias("nid"), F.col("v").alias("cv"), F.col("norm").alias("cn"), "ivf_cell"
    )
    dot = F.expr(_DOT.format(a="qv", b="cv"))
    sims = (
        c.join(F.broadcast(q), "ivf_cell")
        .where(F.col("nid") != F.col("qid"))
        .withColumn("sim", F.round(dot / (F.col("qn") * F.col("cn")), 6))
    )
    w = Window.partitionBy("qid").orderBy(F.col("sim").desc(), F.col("nid").asc())
    return sims.withColumn("rk", F.row_number().over(w)).where(F.col("rk") <= k).select("qid", "nid", "sim")


def sq8_codes(df: DataFrame, col: str = "embedding") -> DataFrame:
    """Scalar (int8) quantization: per-vector symmetric scale = max|x|,
    codes = floor(x/scale*127 + 0.5) ∈ [-127, 127].

    The 100 TB memory-bandwidth lever: a 4× smaller corpus representation
    whose dot products are exact small-integer arithmetic (|code| ≤ 127,
    so every product ≤ 16129 and any realistic sum stays exactly
    representable in double — the approximation is ONLY the quantization
    itself, never the arithmetic). The per-vector scale cancels out of
    cosine, so similarity is computed on codes alone; floor(+0.5) is used
    instead of round() because floor is IEEE-identical across engines
    while decimal-string rounding is not. All JVM HOF exprs, no UDF.

    r9: the scale is hoisted into one `_sc` column — inlined inside the
    transform lambda it was re-evaluated per ELEMENT (interpreted HOF:
    an O(dim²) abs/array_max sweep per vector). Bitwise-identical: the
    hoisted expression yields the exact same double for every element."""
    d = _as_double(df, col).withColumn(
        "_sc", F.expr("greatest(array_max(transform(v, x -> abs(x))), 1e-30D)")
    )
    return d.withColumn(
        "code", F.expr("transform(v, x -> floor(x / _sc * 127.0D + 0.5D))")
    ).withColumn("code_n2", F.expr(_DOT.format(a="code", b="code"))).drop("_sc")


def sq8_topk(queries: DataFrame, candidates: DataFrame, k: int = 3) -> DataFrame:
    """Top-k cosine over int8-quantized codes (same join/rank contract as
    cosine_topk: broadcast query codes, rank on round(sim, 6) with id
    tie-break). Zero-vector guard: code_n2 = 0 rows can't score."""
    q = sq8_codes(queries).where(F.col("code_n2") > 0).select(
        F.col("vec_id").alias("qid"), F.col("code").alias("qc"), F.col("code_n2").alias("qn2")
    )
    c = sq8_codes(_spread(candidates)).where(F.col("code_n2") > 0).select(
        F.col("vec_id").alias("nid"), F.col("code").alias("cc"), F.col("code_n2").alias("cn2")
    )
    dot = F.expr(_DOT.format(a="qc", b="cc"))
    sims = (
        c.join(F.broadcast(q), F.col("nid") != F.col("qid"))
        .withColumn("sim", F.round(dot / (F.sqrt("qn2") * F.sqrt("cn2")), 6))
    )
    w = Window.partitionBy("qid").orderBy(F.col("sim").desc(), F.col("nid").asc())
    return sims.withColumn("rk", F.row_number().over(w)).where(F.col("rk") <= k).select("qid", "nid", "sim")


def pq_codebook(dim: int, m: int = 8, k: int = 16, seed: int = 1234):
    """Deterministic PQ codebook: `m` subspaces of dim/m, `k` centroids
    each, sampled from a seeded Gaussian scaled to the unit-ish range of
    normalized embeddings. In production the codebook is k-means-trained
    offline and shipped as plan literals exactly the same way (the IVF
    centroids follow the identical contract)."""
    import random

    sub = dim // m
    rnd = random.Random(seed)
    return [[[rnd.gauss(0, 0.35) for _ in range(sub)] for _ in range(k)] for _ in range(m)]


def _pq_sub(m_idx: int, sub: int) -> str:
    return f"slice(v, {m_idx * sub + 1}, {sub})"


def pq_codebook_trained():
    """The offline-trained codebook (scripts/train_pq_codebook.py:
    seeded kmeans++ + 25 Lloyd iterations per subspace on the corpus) —
    the production PQ contract. Raises ~1.7× the recall of the random
    codebook on the synthetic corpus."""
    import json
    import os

    path = os.path.join(os.path.dirname(os.path.abspath(__file__)), "pq_codebook_v1.json")
    with open(path) as f:
        return json.load(f)["codebook"]


def ivf_centroids_trained():
    """The offline-trained IVF centroids (scripts/train_ivf_centroids.py:
    seeded kmeans++ + 25 Lloyd iterations on the corpus) — the
    semantic-dedup production contract: trained centroids keep cells
    ~N/k so the in-cell pair join stays bounded. Training cell sizes on
    the synthetic corpus: 56-66 for N/k = 62."""
    import json
    import os

    path = os.path.join(os.path.dirname(os.path.abspath(__file__)), "ivf_centroids_v1.json")
    with open(path) as f:
        return json.load(f)["centroids"]


def pq_codes(df: DataFrame, codebook, col: str = "embedding") -> DataFrame:
    """PQ encode: per subspace, the index of the nearest centroid
    (argmin of exact squared L2, ties broken by centroid index via struct
    compare — same contract as ivf_assign). Output `pq` is an array of m
    small ints: the 100 TB corpus representation is m bytes/vector. All
    literal-centroid JVM exprs, no UDF, no shuffle.

    r9: each subspace's self dot product s·s is hoisted into one `_sn2`
    array column instead of being re-evaluated inside every centroid's
    struct (k=16 inline copies per subspace in interpreted HOF exprs).
    Bitwise-identical — the hoisted aggregates produce the exact same
    doubles the inline copies did."""
    d = _as_double(df, col)
    m, k, sub = len(codebook), len(codebook[0]), len(codebook[0][0])
    sn2 = "array(" + ", ".join(
        _DOT.format(a=_pq_sub(mi, sub), b=_pq_sub(mi, sub)) for mi in range(m)
    ) + ")"
    d = d.withColumn("_sn2", F.expr(sn2))
    per_sub = []
    for mi in range(m):
        s = _pq_sub(mi, sub)
        dists = []
        for ci, c in enumerate(codebook[mi]):
            arr = "array(" + ",".join(f"{x}D" for x in c) + ")"
            cc = sum(x * x for x in c)
            dists.append(
                f"named_struct('d', _sn2[{mi}] - 2.0D * {_DOT.format(a=s, b=arr)} + {cc}D, 'i', {ci})"
            )
        per_sub.append(f"array_min(array({', '.join(dists)})).i")
    return d.withColumn("pq", F.expr("array(" + ", ".join(per_sub) + ")")).drop("_sn2")


def pq_topk(queries: DataFrame, candidates: DataFrame, codebook, topk: int = 3) -> DataFrame:
    """PQ/ADC top-k (asymmetric distance computation): the corpus is
    searched through its m-byte PQ codes only; each query precomputes a
    (m × k) dot-product table against the codebook and scores a candidate
    by summing m table lookups — O(m) per pair instead of O(dim), on a
    corpus 4·dim/m× smaller than float32.

    Approximate-but-deterministic like lsh/ivf/sq8: centroids and table
    are plan literals + IEEE arithmetic, so the oracle replays it
    bit-for-bit; rank on round(sim, 6) with id tie-break. Candidate
    norm uses the reconstruction norm sqrt(Σ_m |cb[m][code_m]|²)
    (centroid reconstruction), the standard ADC cosine denominator."""
    m, k, sub = len(codebook), len(codebook[0]), len(codebook[0][0])
    # corpus: codes + reconstruction norm² via literal lookup tables
    n2_tables = []
    for mi in range(m):
        n2s = [sum(x * x for x in c) for c in codebook[mi]]
        n2_tables.append("array(" + ",".join(f"{x}D" for x in n2s) + ")")
    recon_n2 = " + ".join(
        f"element_at({n2_tables[mi]}, cast(pq[{mi}] AS int) + 1)" for mi in range(m)
    )
    c = (
        pq_codes(_spread(candidates), codebook)
        .withColumn("cn2", F.expr(recon_n2))
        .where(F.col("cn2") > 0)
        .select(F.col("vec_id").alias("nid"), F.col("pq"), F.col("cn2"))
    )
    # query: full-precision dot table dt[m][c] = <q_m, cb[m][c]>
    rows = []
    for mi in range(m):
        s = _pq_sub(mi, sub)
        cells = []
        for c_ in codebook[mi]:
            arr = "array(" + ",".join(f"{x}D" for x in c_) + ")"
            cells.append(_DOT.format(a=s, b=arr))
        rows.append("array(" + ", ".join(cells) + ")")
    dt = "array(" + ", ".join(rows) + ")"
    q = (
        with_norm(queries)
        .withColumn("dt", F.expr(dt))
        .where(F.col("norm") > 0)
        .select(F.col("vec_id").alias("qid"), F.col("dt"), F.col("norm").alias("qn"))
    )
    adc = "aggregate(zip_with(pq, dt, (cd, row) -> element_at(row, cast(cd AS int) + 1)), 0D, (acc, x) -> acc + x)"
    sims = (
        c.join(F.broadcast(q), F.col("nid") != F.col("qid"))
        .withColumn("sim", F.round(F.expr(adc) / (F.col("qn") * F.sqrt("cn2")), 6))
    )
    w = Window.partitionBy("qid").orderBy(F.col("sim").desc(), F.col("nid").asc())
    return (
        sims.withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") <= topk)
        .select("qid", "nid", "sim")
    )


def pq_rerank_topk(queries: DataFrame, candidates: DataFrame, codebook,
                   topk: int = 3, shortlist: int = 10) -> DataFrame:
    """PQ shortlist + EXACT rerank (the FAISS 'refine' pattern): ADC
    scores the whole corpus through m-byte codes, keeps `shortlist`
    candidates per query, then rescores ONLY those with the exact
    full-precision cosine. Recall recovers toward exact while the
    full-vector read is |Q|·shortlist rows instead of the corpus — at
    100 TB the corpus is scanned once as codes (m bytes/vector) and the
    float vectors are fetched by id for the shortlist only (semi-join
    pushdown). Deterministic end-to-end: the ADC shortlist ranks on
    round(sim, 6) with id tie-break, so the oracle replays both stages."""
    short = pq_topk(queries, candidates, codebook, topk=shortlist).select("qid", "nid")
    cn = with_norm(candidates).where(F.col("norm") > 0).select(
        F.col("vec_id").alias("nid"), F.col("v").alias("cv"), F.col("norm").alias("cn"))
    qn = with_norm(queries).where(F.col("norm") > 0).select(
        F.col("vec_id").alias("qid"), F.col("v").alias("qv"), F.col("norm").alias("qn"))
    dot = F.expr(_DOT.format(a="qv", b="cv"))
    exact = (
        short.join(cn, "nid")
        .join(F.broadcast(qn), "qid")
        .withColumn("sim", F.round(dot / (F.col("qn") * F.col("cn")), 6))
    )
    w = Window.partitionBy("qid").orderBy(F.col("sim").desc(), F.col("nid").asc())
    return (
        exact.withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") <= topk)
        .select("qid", "nid", "sim")
    )


def cosine_dup_pairs(df: DataFrame, threshold: float = 0.95, id_col: str = "vec_id") -> DataFrame:
    """Embedding-cosine near-duplicate pairs (the embedding tier of the
    dedup ladder): exact all-pairs baseline — id_a < id_b, cos ≥ t.
    Quadratic by design (correctness baseline); the scale path blocks by
    LSH/IVF cell first and verifies only in-cell pairs."""
    n = with_norm(_spread(df)).select(F.col(id_col).alias("id"), F.col("v"), F.col("norm"))
    a = n.select(F.col("id").alias("id_a"), F.col("v").alias("va"), F.col("norm").alias("na"))
    b = n.select(F.col("id").alias("id_b"), F.col("v").alias("vb"), F.col("norm").alias("nb"))
    dot = F.expr(_DOT.format(a="va", b="vb"))
    # r9: filter on the raw cosine via the exact round-equivalence cutoff
    # (round6_ge_cutoff — same rows, provably), so the BigDecimal round
    # runs only for the surviving pairs' output column.
    return (
        a.join(b, F.col("id_a") < F.col("id_b"))
        .withColumn("_raw", dot / (F.col("na") * F.col("nb")))
        .where(F.col("_raw") >= F.lit(round6_ge_cutoff(threshold)))
        .select("id_a", "id_b", F.round("_raw", 6).alias("cos"))
    )


def semantic_dedup(df: DataFrame, centroids: list[list[float]], threshold: float = 0.85,
                   id_col: str = "vec_id", col: str = "embedding",
                   cell_cap: int | None = 50_000,
                   kernel_cell_max: int | None = 4096) -> DataFrame:
    """SemDeDup-style semantic dedup (Abbas et al. 2023,
    arXiv:2303.09540 — cluster, then deduplicate WITHIN clusters): coarse-
    quantize the corpus to IVF cells (literal centroids, JVM argmin, no
    shuffle), then inside each cell drop every vector that has a
    smaller-id neighbor at cosine ≥ threshold (greedy min-id keep —
    deterministic, single pass, no iteration). Returns one row per input
    vector: (vec_id, ivf_cell, kept).

    Identical-embedding guard (the minhash/simhash guards' triplet — r7
    verdict #1): vectors group by exact content first (one shuffle on a
    128-bit content key), the in-cell pair join runs over ONE min-id
    representative per distinct embedding, and verdicts expand back
    exactly. Correct because cosine is content-determined: for any
    member x of group g, x is dropped iff some group h (possibly g
    itself) has cos(h, g) ≥ threshold and min_id(h) < id_x — so the
    per-group MIN dominating rep id decides every member in one
    broadcast-join pass. Self-pairs (h = g) carry the group's own
    self-cosine, which also reproduces the engine semantics for
    degenerate zero vectors (0/0 → NULL in non-ANSI Spark, and NULL ≥ t
    never holds — zero vectors neither dominate nor get dominated; ANSI
    raises identically on both paths). Output set is property-tested
    identical to the unguarded
    join; the join cost becomes duplication-independent — a corpus of
    100 copies per vector costs the same as one copy each.

    Scale shape: the rep-level pair join is an equi-join on ivf_cell, so
    the remaining quadratic is bounded per cell by the DISTINCT
    embedding count — the clustering step exists precisely so dedup
    never sees the global O(N²). At 100 TB: k-means-trained centroids
    (scripts/train_ivf_centroids.py, same contract as the PQ codebook)
    size cells to ~N/k. `cell_cap` is the backstop for corpora the
    centroids don't fit (degenerate embeddings concentrating one cell):
    a cell with more DISTINCT embeddings than the cap fails the job
    loudly at execution (plan-side assert_true — no driver probe, no
    silent quadratic) instead of letting one straggler task do
    cap²·cos work; the fix is retraining centroids, not a bigger cap.

    r10: cells with at most `kernel_cell_max` distinct embeddings run
    their in-cell pair scan as ONE Arrow numpy task per cell
    (kernels.cell_min_dom — bit-exact with the join predicate, see its
    docstring); larger cells keep the AQE-skew-split join. None
    disables the kernel (pure join path, used by the equivalence
    tests)."""
    d = ivf_assign(_spread(df), centroids, col)
    n = d.withColumn("norm", F.sqrt(F.expr(_DOT.format(a="v", b="v")))).select(
        F.col(id_col).alias("id"), "ivf_cell", "v", "norm"
    )
    # content key: md5 of the shortest-round-trip double rendering —
    # injective per distinct double (Java Double.toString), 128 bits so
    # collisions stay negligible at corpus scale
    gk = F.md5(F.expr("array_join(transform(v, x -> cast(x AS string)), ',')"))
    # No collect_list of member ids and no second corpus scan: ONE
    # window over the content key annotates every row with its group's
    # min-id rep (a giant duplicate group occupies one window task that
    # STREAMS the min with spill — never one ~GB array row in an
    # aggregation buffer, the exact skew this guard exists for), and the
    # persisted result serves the rep-level join sides, the cap counts
    # and the verdict expansion. persist() (memory-and-disk,
    # LRU-evictable) is the same pattern as the minhash guard, tracked
    # by pipeline.cache's bounded registry + release API (r9) so a
    # long-lived session never accumulates guard caches.
    from warp10_platform_spark.pipeline import cache as _cache

    member = _cache.register(
        n.select(
            "id", "ivf_cell", "v", "norm",
            F.min("id").over(Window.partitionBy(gk)).alias("rep"),
        )
    )
    reps = member.where(F.col("id") == F.col("rep")).select("rep", "ivf_cell", "v", "norm")
    # Per-cell rep counts serve BOTH the cell_cap backstop and the r10
    # kernel routing below; one broadcast join per rep row either way.
    counts = reps.groupBy("ivf_cell").agg(F.count("*").alias("cell_reps"))
    reps = reps.join(F.broadcast(counts), "ivf_cell")
    if cell_cap is not None:
        reps = reps.where(
            F.expr(
                f"assert_true(cell_reps <= {int(cell_cap)}, 'semantic_dedup: IVF cell ' || "
                f"cast(ivf_cell AS string) || ' holds ' || cast(cell_reps AS string) || "
                f"' distinct embeddings (cell_cap={int(cell_cap)}) — retrain centroids "
                f"(scripts/train_ivf_centroids.py) or raise cell_cap') IS NULL"
            )
        )
    # r10 (guide §4.2, r9-verdict ask #2): cells whose DISTINCT-embedding
    # count is bounded (<= kernel_cell_max) compute their min-dominator
    # in ONE Arrow task per cell — a numpy pairwise kernel whose
    # dimension-by-dimension accumulation reproduces the HOF left-fold
    # dot bit-for-bit (kernels.cell_min_dom; property-tested against the
    # join path). The pair join evaluated the interpreted 64-dim HOF dot
    # per candidate pair; the kernel runs the same arithmetic as k
    # whole-matrix numpy ops per cell. Cells ABOVE the gate keep the
    # join path: there AQE skew-splitting parallelizes the fat cell,
    # which one grouped-map task could not (the r9 deferral reason —
    # the gate is what reconciles the two).
    if kernel_cell_max is not None:
        from warp10_platform_spark.pipeline import kernels as _kern

        ansi = str(df.sparkSession.conf.get("spark.sql.ansi.enabled", "true")).lower() == "true"
        kreps = reps.where(F.col("cell_reps") <= int(kernel_cell_max)).drop("cell_reps")
        jreps = reps.where(F.col("cell_reps") > int(kernel_cell_max)).drop("cell_reps")
        kernel_dom = _kern.cell_min_dom(kreps, round6_ge_cutoff(threshold), strict_zero=ansi)
    else:
        jreps = reps.drop("cell_reps")
        kernel_dom = None
    # NOTE (r9, measured): do NOT pin this join's partitioning with an
    # explicit repartition-by-num. A pin disables AQE skew-join
    # splitting for the exchange, and the degenerate one-cell corpus
    # (random centroids) went 2.6s → 17.8s at sf0.1 when pinned — the
    # skew splitter is what parallelizes a single fat cell.
    a = jreps.select(F.col("rep").alias("rep_a"), "ivf_cell", F.col("v").alias("va"), F.col("norm").alias("na"))
    b = jreps.select(F.col("rep").alias("rep_b"), "ivf_cell", F.col("v").alias("vb"), F.col("norm").alias("nb"))
    dot = F.expr(_DOT.format(a="va", b="vb"))
    # min dominating rep per TARGET group — self-pairs included (a
    # group's own rep dominates its later members iff self-cos ≥ t).
    # rep_a <= rep_b prunes half the pairs WITHOUT changing min_dom: a
    # qualifying dominator with rep_a > rep_b could only matter if it
    # lowered the min, but whenever ANY pair qualifies at t ≤ 1 the
    # self-pair does too (raw self-cos is 1 ± a few ulp for norm > 0,
    # above every t ≤ 1 cutoff ≤ 0.9999995; zero
    # vectors qualify nowhere — NULL cosine), so min_dom ≤ rep_b already
    # and larger reps can never lower it; at t > 1 nothing qualifies at
    # all. The cheap comparison is FIRST in the conjunction so the
    # interpreted higher-order dot product short-circuits away for the
    # pruned half (HOF exprs don't codegen — measured: this predicate is
    # the whole cost of a degenerate one-cell corpus).
    # r9: the threshold test runs on the RAW cosine against the exact
    # round-equivalence cutoff (round6_ge_cutoff) instead of rounding
    # per pair — same boolean for every double (incl. NULL/NaN), and the
    # BigDecimal round path measured ~3× the HOF dot itself here.
    min_dom = (
        a.join(b, ["ivf_cell"])
        .where(
            (F.col("rep_a") <= F.col("rep_b"))
            & (dot / (F.col("na") * F.col("nb")) >= F.lit(round6_ge_cutoff(threshold)))
        )
        .groupBy("rep_b")
        .agg(F.min("rep_a").alias("min_dom"))
    )
    if kernel_dom is not None:
        # a cell routes to exactly one side, so rep_b sets are disjoint
        min_dom = kernel_dom.unionByName(min_dom)
    return (
        member.join(min_dom, member["rep"] == min_dom["rep_b"], "left")
        .select(
            F.col("id").alias(id_col),
            F.col("ivf_cell").cast("long").alias("ivf_cell"),
            F.coalesce(F.col("min_dom") >= F.col("id"), F.lit(True)).alias("kept"),
        )
    )


def lsh_topk(
    queries: DataFrame,
    candidates: DataFrame,
    *,
    dim: int,
    k: int = 3,
    num_planes: int = 8,
    num_tables: int = 1,
) -> DataFrame:
    """ANN top-k: equi-join on the hyperplane-sign bucket, rank within
    bucket. Recall < 1 by construction (approximate); candidates shuffle
    on (table, bucket) — O(N·L), no broadcast of the corpus.

    `num_tables` is the standard multi-table LSH recall lever: L
    independent plane sets (seeds 42..42+L-1), candidates are the UNION
    of same-bucket pairs across tables, deduplicated before scoring.
    Cost scales linearly in L; recall rises steeply — measured 0.0→0.43
    going from (planes=8, L=1) to (planes=4, L=4) on the near-uniform
    synthetic corpus: few planes + many tables beats many planes + one
    table when neighbor angles are wide.

    `dim` is a REQUIRED keyword parameter: the hyperplanes are plan
    literals derived from it. (A default-argument `.first()` sniff used
    to trigger a silent driver job here — removed.)"""
    if not isinstance(dim, int) or dim < 1:
        raise ValueError("lsh_topk requires the embedding dimension `dim` explicitly")
    qn = with_norm(queries)
    cn = with_norm(_spread(candidates))
    qparts, cparts = [], []
    for t in range(num_tables):
        planes = lsh_planes(dim, num_planes, seed=42 + t)
        tbl = F.lit(t).alias("tbl")
        qparts.append(
            qn.select(F.col("vec_id").alias("qid"), F.col("v").alias("qv"), F.col("norm").alias("qn"), tbl, _bucket_expr(planes))
        )
        cparts.append(
            cn.select(F.col("vec_id").alias("nid"), F.col("v").alias("cv"), F.col("norm").alias("cn"), tbl, _bucket_expr(planes))
        )
    q, c = qparts[0], cparts[0]
    for part in qparts[1:]:
        q = q.unionAll(part)
    for part in cparts[1:]:
        c = c.unionAll(part)
    pairs = (
        c.join(F.broadcast(q), ["tbl", "bucket"])
        .where(F.col("nid") != F.col("qid"))
        .dropDuplicates(["qid", "nid"])
    )
    dot = F.expr(_DOT.format(a="qv", b="cv"))
    sims = pairs.withColumn("sim", F.round(dot / (F.col("qn") * F.col("cn")), 6))
    w = Window.partitionBy("qid").orderBy(F.col("sim").desc(), F.col("nid").asc())
    return sims.withColumn("rk", F.row_number().over(w)).where(F.col("rk") <= k).select("qid", "nid", "sim")
