"""Text/LLM-data-pipeline queries over the documents table.

Beyond the reference's surface (BASELINE.json north star): dedup,
text quality, language-ID, fingerprinting. Engine implementations live
in warp10_platform_spark/pipeline/; each oracled query recomputes the
identical formula in DuckDB.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from warp10_platform_spark.pipeline import dedup as _dedup
from warp10_platform_spark.pipeline import text as _text
from warp10_platform_spark.queries import register
from warp10_platform_spark.sources.tables import load_table


@register("doc_exact_dedup", (
    "SELECT h, count(*) AS n, min(doc_id) AS keep_id FROM ("
    "  SELECT doc_id, md5(text) AS h FROM documents"
    ") GROUP BY h HAVING count(*) >= 2"
))
def doc_exact_dedup(spark, sf_dir):
    """Exact dedup: hash-groupBy on content (md5 — identical across
    engines). Scale path: hash is computed scan-side, shuffle carries
    (hash, id) only."""
    docs = load_table(spark, sf_dir, "documents")
    return _dedup.exact_dup_groups(docs)


@register("doc_token_count", (
    "SELECT doc_id, len(string_split(trim(text), ' ')) AS n_tokens, "
    "length(text) AS n_chars FROM documents"
))
def doc_token_count(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    return _text.token_count(docs).select("doc_id", "n_tokens", "n_chars")


@register("doc_quality", (
    "WITH t AS (SELECT doc_id, string_split(trim(text), ' ') AS toks, text FROM documents) "
    "SELECT doc_id, len(toks) AS n_tokens, "
    "round(len(list_distinct(toks)) / len(toks), 6) AS lexical_diversity, "
    "round(length(text) / len(toks), 6) AS avg_token_len "
    "FROM t"
))
def doc_quality(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    return _text.quality(docs).select("doc_id", "n_tokens", "lexical_diversity", "avg_token_len")


@register("doc_langid", (
    "WITH t AS (SELECT doc_id, string_split(trim(text), ' ') AS toks FROM documents), "
    "s AS (SELECT doc_id, "
    "  len(list_filter(toks, x -> x IN ('the','and','of'))) AS s_en, "
    "  len(list_filter(toks, x -> x IN ('der','und','die'))) AS s_de, "
    "  len(list_filter(toks, x -> x IN ('le','et','la'))) AS s_fr, "
    "  len(list_filter(toks, x -> x IN ('el','y','los'))) AS s_es "
    "FROM t) "
    "SELECT doc_id, CASE "
    "  WHEN s_en >= s_de AND s_en >= s_fr AND s_en >= s_es THEN 'en' "
    "  WHEN s_de >= s_fr AND s_de >= s_es THEN 'de' "
    "  WHEN s_fr >= s_es THEN 'fr' ELSE 'es' END AS pred_lang "
    "FROM s"
))
def doc_langid(spark, sf_dir):
    """Language-ID n-gram/stopword heuristic (deterministic marker-word
    scoring with fixed tie-break order en>de>fr>es)."""
    docs = load_table(spark, sf_dir, "documents")
    return _text.langid(docs).select("doc_id", "pred_lang")


@register("doc_fingerprint", (
    "SELECT doc_id, md5(array_to_string(list_sort(list_distinct(string_split(trim(text), ' '))), ' ')) "
    "AS fingerprint FROM documents"
))
def doc_fingerprint(spark, sf_dir):
    """Canonical-form fingerprint (sorted distinct token bag → md5) — the
    near-dup canonicalization step of a training-data pipeline."""
    docs = load_table(spark, sf_dir, "documents")
    return _text.fingerprint(docs).select("doc_id", "fingerprint")


# Rep-collapsed like the engine (identical shingle sets share one
# representative): the naive per-shingle all-pairs blows up as S·k² on a
# duplicate-heavy corpus IN DUCKDB TOO (the r5 skew fixture hung the
# unguarded oracle for 10+ minutes). Identical sets ⇒ identical
# intersections, so the collapsed replay produces the identical pair set
# — and tests/test_skew.py proves guard == naive on a mixed corpus.
_NGRAM_REP_CTES = """t AS (
  SELECT doc_id, list_distinct([
    toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]
    for i in range(1, len(toks) - 1)
  ]) AS sh
  FROM (SELECT doc_id, string_split(trim(text), ' ') AS toks FROM documents)
  WHERE len(toks) >= 3
),
g AS (SELECT doc_id, sh, md5(array_to_string(list_sort(sh), chr(1))) AS gk FROM t),
grps AS (SELECT gk, min(doc_id) AS rep, arg_min(sh, doc_id) AS sh, count(*) AS cnt FROM g GROUP BY gk),
member AS (SELECT g.doc_id, r.rep, r.cnt FROM g JOIN grps r USING (gk)),
e AS (SELECT rep AS doc_id, unnest(sh) AS s FROM grps),
n AS (SELECT rep AS doc_id, len(sh) AS n FROM grps),
inter AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS i
  FROM e a JOIN e b ON a.s = b.s AND a.doc_id < b.doc_id
  GROUP BY a.doc_id, b.doc_id
),
rep_pairs AS (
  SELECT id_a AS rep_a, id_b AS rep_b, round(i * 1.0 / (na.n + nb.n - i), 6) AS jaccard
  FROM inter JOIN n na ON na.doc_id = id_a JOIN n nb ON nb.doc_id = id_b
  WHERE i * 1.0 / (na.n + nb.n - i) >= 0.3
)"""

NGRAM_JACCARD_ORACLE = (
    "WITH " + _NGRAM_REP_CTES + """
SELECT least(ma.doc_id, mb.doc_id) AS id_a, greatest(ma.doc_id, mb.doc_id) AS id_b, p.jaccard
FROM rep_pairs p JOIN member ma ON ma.rep = p.rep_a JOIN member mb ON mb.rep = p.rep_b
UNION ALL
SELECT a.doc_id, b.doc_id, 1.0 AS jaccard
FROM member a JOIN member b ON a.rep = b.rep AND a.doc_id < b.doc_id
"""
)


@register("doc_ngram_jaccard", NGRAM_JACCARD_ORACLE)
def doc_ngram_jaccard(spark, sf_dir):
    """Near-dup pairs by exact word-3-gram Jaccard ≥ 0.3 — the exact
    baseline that MinHash/LSH approximates. Shuffle = (shingle, id)
    exploded pairs; at 100 TB the LSH variant below replaces the full
    self-join."""
    docs = load_table(spark, sf_dir, "documents")
    return _dedup.ngram_jaccard_pairs(docs, n=3, threshold=0.3)


def _minhash_lsh_oracle(num_hashes: int = 32, bands: int = 8, threshold: float = 0.3) -> str:
    """DuckDB replica of minhash_lsh_pairs(portable=True): same md5-derived
    base hash, the same (a_i, b_i) coefficients from random.Random(42), the
    same band keys — bit-for-bit identical candidates and jaccard values."""
    import random

    rnd = random.Random(42)
    coeffs = [(rnd.randrange(1, _dedup._P), rnd.randrange(0, _dedup._P)) for _ in range(num_hashes)]
    rows = num_hashes // bands
    sig_terms = ", ".join(
        f"list_min(list_transform(hs, h -> (h * {a} + {b}) % {_dedup._P}))" for a, b in coeffs
    )
    return f"""
WITH base AS (SELECT doc_id, string_split(trim(text), ' ') AS toks FROM documents),
shing AS (
  SELECT doc_id, list_distinct([toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]
                                for i in range(1, len(toks) - 1)]) AS sh
  FROM base WHERE len(toks) >= 3
),
-- identical-shingle-set collapse, mirroring the engine's r5 skew guard:
-- banding + exact verify run over one representative per distinct set
-- (identical sets => identical signatures, band keys, and jaccard)
g AS (SELECT doc_id, sh, md5(array_to_string(list_sort(sh), chr(1))) AS gk FROM shing),
grps AS (SELECT gk, min(doc_id) AS rep, arg_min(sh, doc_id) AS sh FROM g GROUP BY gk),
member AS (SELECT g.doc_id, r.rep FROM g JOIN grps r USING (gk)),
hs AS (SELECT rep AS doc_id, sh,
       list_transform(sh, s -> ('0x' || substr(md5(s), 1, 15))::BIGINT & {_dedup._P}) AS hs FROM grps),
sig AS (SELECT doc_id, sh, [{sig_terms}] AS sig FROM hs),
banded AS (
  SELECT doc_id, b.b AS band, array_to_string(list_slice(sig, b.b * {rows} + 1, b.b * {rows} + {rows}), ',') AS bh
  FROM sig, (SELECT unnest(range(0, {bands})) AS b) b
),
cands AS (
  SELECT DISTINCT a.doc_id AS rep_a, b.doc_id AS rep_b
  FROM banded a JOIN banded b ON a.band = b.band AND a.bh = b.bh AND a.doc_id < b.doc_id
),
verified AS (
  SELECT rep_a, rep_b, len(list_intersect(sa.sh, sb.sh)) AS i, len(sa.sh) AS na, len(sb.sh) AS nb
  FROM cands JOIN hs sa ON sa.doc_id = rep_a JOIN hs sb ON sb.doc_id = rep_b
),
rep_pairs AS (
  SELECT rep_a, rep_b, round(i * 1.0 / (na + nb - i), 6) AS jaccard
  FROM verified WHERE i * 1.0 / (na + nb - i) >= {threshold}
)
SELECT least(ma.doc_id, mb.doc_id) AS id_a, greatest(ma.doc_id, mb.doc_id) AS id_b, p.jaccard
FROM rep_pairs p JOIN member ma ON ma.rep = p.rep_a JOIN member mb ON mb.rep = p.rep_b
UNION ALL
SELECT a.doc_id, b.doc_id, 1.0 AS jaccard
FROM member a JOIN member b ON a.rep = b.rep AND a.doc_id < b.doc_id
"""


@register("doc_minhash_lsh", _minhash_lsh_oracle())
def doc_minhash_lsh(spark, sf_dir):
    """MinHash + banded LSH near-dup: shingle→minhash sig→band buckets→
    candidate pairs→exact-jaccard verify ≥ 0.3. Same output contract as
    doc_ngram_jaccard but only LSH candidates are verified — the 100 TB
    scale path (no full self-join). portable hash → exact DuckDB oracle."""
    docs = load_table(spark, sf_dir, "documents")
    return _dedup.minhash_lsh_pairs(docs, n=3, num_hashes=32, bands=8, threshold=0.3, portable=True)


def _simhash_oracle(radius: int = 3) -> str:
    """DuckDB replica of simhash_pairs(portable=True). The md5-derived base
    hash is 60-bit, so only bits 0-59 can be set; pair generation uses a
    plain a<b self-join (the engine's segment blocking is an optimization
    that cannot change the result set)."""
    bit_terms = " + ".join(
        f"(CASE WHEN list_sum(list_transform(hs, h -> CASE WHEN ((h >> {b}) & 1) = 1 THEN 1 ELSE -1 END)) > 0"
        f" THEN (1::BIGINT << {b}) ELSE 0::BIGINT END)"
        for b in range(60)
    )
    return f"""
WITH t AS (SELECT doc_id,
           list_transform(string_split(trim(text), ' '), s -> ('0x' || substr(md5(s), 1, 15))::BIGINT) AS hs
           FROM documents),
fp AS (SELECT doc_id, ({bit_terms}) AS simhash FROM t)
SELECT a.doc_id AS id_a, b.doc_id AS id_b,
       bit_count(xor(a.simhash, b.simhash))::BIGINT AS hamming
FROM fp a JOIN fp b ON a.doc_id < b.doc_id
WHERE bit_count(xor(a.simhash, b.simhash)) <= {radius}
"""


@register("doc_simhash", _simhash_oracle())
def doc_simhash(spark, sf_dir):
    """SimHash 64-bit fingerprint per doc + near pairs within hamming
    radius 3 via 4-segment blocking. portable hash → exact DuckDB oracle."""
    docs = load_table(spark, sf_dir, "documents")
    pairs = _dedup.simhash_pairs(docs, radius=3, portable=True)
    return pairs.select("id_a", "id_b", F.col("hamming").cast("long").alias("hamming"))


@register("doc_dup_clusters", (
    # Transitive closure over the REP graph only (tiny), then group
    # expansion: closure over the full pair set is k² reach rows per
    # k-duplicate clique — the skew fixture's 2500-clique made the naive
    # recursive CTE generate billions of join rows. Component minima are
    # unchanged: rep = min(doc_id) of its group, so min over component
    # reps IS min over all component members. A doc participates iff its
    # group has >1 member (intra pairs) or its rep has a cross-group pair
    # — exactly the docs the full pair set would label.
    "WITH RECURSIVE " + _NGRAM_REP_CTES + ", "
    "redges AS (SELECT rep_a AS a, rep_b AS b FROM rep_pairs "
    "           UNION SELECT rep_b, rep_a FROM rep_pairs), "
    "reach(id, r) AS ("
    "  SELECT a, a FROM redges GROUP BY a "
    "  UNION "
    "  SELECT e.a, reach.r FROM redges e JOIN reach ON reach.id = e.b), "
    "comp AS (SELECT id, min(r) AS crep FROM reach GROUP BY id) "
    "SELECT m.doc_id, coalesce(c.crep, m.rep) AS cluster_rep "
    "FROM member m LEFT JOIN comp c ON c.id = m.rep "
    "WHERE m.cnt > 1 OR c.id IS NOT NULL"
))
def doc_dup_clusters(spark, sf_dir):
    """Near-dup pairs → connected components → canonical keeper per
    cluster (pipeline/cluster.py min-label propagation). Edges are the
    exact-Jaccard pairs so the component set is deterministic; the oracle
    computes the same closure with a recursive CTE. At 100 TB the same
    operator runs over the LSH pair stream instead."""
    from warp10_platform_spark.pipeline.cluster import dup_clusters

    docs = load_table(spark, sf_dir, "documents")
    # cluster_edges: connectivity-equivalent rep+star subset — a
    # k-duplicate group feeds k-1 edges into the components loop instead
    # of k(k-1)/2 (identical components, r5 skew fix)
    pairs = _dedup.ngram_jaccard_pairs(docs, n=3, threshold=0.3, cluster_edges=True)
    return dup_clusters(pairs)


# ---------------------------------------------------------------------------
# round 4 late tranche: PII scrubbing, intra-doc repetition, benchmark
# decontamination — the remaining standard pretraining-pipeline stages.
# ---------------------------------------------------------------------------

# The synthetic corpus carries no natural PII, so the query injects a
# deterministic email + IPv4 per document ON BOTH SIDES before scrubbing
# — the regexes are genuinely exercised and the oracle stays bit-exact.
_PII_INJECT_SQL = (
    "SELECT doc_id, text || ' contact user' || doc_id || '@example.com from 10.0.' "
    "|| (doc_id % 256) || '.7' AS text FROM documents"
)


@register("doc_pii_scrub", (
    "WITH t AS (" + _PII_INJECT_SQL + ") "
    "SELECT doc_id, "
    "len(regexp_extract_all(text, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}')) AS n_emails, "
    "len(regexp_extract_all(text, '\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b')) AS n_ips, "
    "md5(regexp_replace(regexp_replace(text, "
    "'[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}', '<EMAIL>', 'g'), "
    "'\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b', '<IP>', 'g')) AS clean_hash "
    "FROM t"
))
def doc_pii_scrub(spark, sf_dir):
    """PII detection + redaction (emails, IPv4) — codegen regexes, zero
    shuffle; the redacted text is fingerprinted for the compare."""
    docs = load_table(spark, sf_dir, "documents").withColumn(
        "text",
        F.concat(
            F.col("text"), F.lit(" contact user"), F.col("doc_id").cast("string"),
            F.lit("@example.com from 10.0."), (F.col("doc_id") % 256).cast("string"),
            F.lit(".7"),
        ),
    )
    return _text.pii_scrub(docs).select(
        "doc_id",
        F.col("n_emails").cast("long").alias("n_emails"),
        F.col("n_ips").cast("long").alias("n_ips"),
        F.md5("clean_text").alias("clean_hash"),
    )


@register("doc_intra_repetition", (
    "WITH t AS (SELECT doc_id, string_split(trim(text), ' ') AS toks FROM documents), "
    "b AS (SELECT doc_id, [toks[i] || ' ' || toks[i+1] for i in range(1, len(toks))] AS bi FROM t) "
    "SELECT doc_id, len(bi) AS n_bigrams, "
    "round(1.0 - len(list_distinct(bi)) / len(bi), 6) AS repetition_ratio FROM b"
))
def doc_intra_repetition(spark, sf_dir):
    """Within-document repetition ratio over token bigrams — the
    boilerplate/spam signal of a pretraining quality filter."""
    docs = load_table(spark, sf_dir, "documents")
    return _text.intra_repetition(docs).select(
        "doc_id",
        F.col("n_bigrams").cast("long").alias("n_bigrams"),
        "repetition_ratio",
    )


@register("doc_contamination", (
    "WITH toks AS (SELECT doc_id, string_split(trim(text), ' ') AS toks FROM documents), "
    "g AS (SELECT doc_id, list_distinct([toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2] "
    "  for i in range(1, len(toks) - 1)]) AS gs FROM toks WHERE len(toks) >= 3), "
    "tr AS (SELECT doc_id, unnest(gs) AS g FROM g WHERE doc_id % 97 <> 0), "
    "ev AS (SELECT DISTINCT unnest(gs) AS g FROM g WHERE doc_id % 97 = 0) "
    "SELECT tr.doc_id, count(*) AS n_shared_ngrams "
    "FROM tr JOIN ev ON tr.g = ev.g GROUP BY tr.doc_id"
))
def doc_contamination(spark, sf_dir):
    """Benchmark decontamination: trigram overlap of every train doc
    against the (broadcast) eval split doc_id % 97 == 0. The eval
    n-gram set is KB-scale at any corpus size, so the plan is scan →
    broadcast-hash-join → partial agg: no corpus shuffle at 100 TB."""
    docs = load_table(spark, sf_dir, "documents")
    train = docs.where(F.col("doc_id") % 97 != 0)
    ev = docs.where(F.col("doc_id") % 97 == 0)
    return _text.contamination(train, ev, n=3)


# ---------------------------------------------------------------------------
# dataset assembly: LM quality scoring, mixture sampling, sequence packing
# ---------------------------------------------------------------------------

@register("doc_lm_score", (
    "WITH t AS (SELECT doc_id, string_split(trim(text), ' ') AS toks FROM documents), "
    "d AS (SELECT doc_id, toks FROM t WHERE len(toks) >= 2), "
    "bi AS (SELECT doc_id, unnest([toks[i] || ' ' || toks[i+1] for i in range(1, len(toks))]) AS bg FROM d), "
    "bi2 AS (SELECT doc_id, bg, string_split(bg, ' ')[1] AS w1 FROM bi), "
    "c1 AS (SELECT w, count(*) AS c1 FROM (SELECT unnest(toks) AS w FROM d) GROUP BY w), "
    "c2 AS (SELECT bg, count(*) AS c2 FROM bi GROUP BY bg), "
    "v AS (SELECT count(*)::DOUBLE AS v FROM c1) "
    "SELECT doc_id, count(*) AS n_bigrams, "
    "round(avg(ln((c2 + 1) / (c1 + v))), 6) AS avg_logprob "
    "FROM bi2 JOIN c2 USING (bg) JOIN c1 ON bi2.w1 = c1.w CROSS JOIN v "
    "GROUP BY doc_id"
))
def doc_lm_score(spark, sf_dir):
    """Corpus-trained bigram LM log-likelihood per doc (add-one
    smoothing) — the perplexity quality filter, fully relational."""
    docs = load_table(spark, sf_dir, "documents")
    from warp10_platform_spark.pipeline.assemble import lm_score

    return lm_score(docs)


@register("doc_stratified_sample", (
    "SELECT doc_id, source FROM documents "
    "WHERE ('0x' || substr(md5(doc_id::VARCHAR), 1, 15))::BIGINT % 1000 "
    "< 50 * (1 + (substr(source, 4)::INT % 10))"
))
def doc_stratified_sample(spark, sf_dir):
    """Deterministic data mixing: per-source mixture weights (per-mille
    rates derived from the source id) applied via the portable content
    hash — identical row selection on any engine, pure scan-side."""
    docs = load_table(spark, sf_dir, "documents")
    from warp10_platform_spark.pipeline.assemble import stratified_sample

    rate = 50 * (1 + (F.substring("source", 4, 10).cast("int") % 10))
    return stratified_sample(docs, rate).select("doc_id", "source")


_PACK_SQL = (
    "WITH t AS (SELECT doc_id, {part} len(string_split(trim(text), ' ')) AS nt FROM documents) "
    "SELECT doc_id, {part} nt::BIGINT AS n_tokens, "
    "(sum(nt) OVER w - nt)::BIGINT AS stream_offset, "
    "CAST(floor((sum(nt) OVER w - nt) / 2048) AS BIGINT) AS bin_id "
    "FROM t WINDOW w AS ({partby}ORDER BY doc_id)"
)


@register("doc_seq_packing", _PACK_SQL.format(part="", partby=""))
def doc_seq_packing(spark, sf_dir):
    """Sequence packing, global doc_id order: deterministic greedy
    concat-and-chunk into 2048-token bins. The global window is the
    oracle-able form; doc_seq_packing_sharded is the scale path."""
    docs = load_table(spark, sf_dir, "documents")
    from warp10_platform_spark.pipeline.assemble import seq_packing

    return seq_packing(docs, bin_tokens=2048)


@register("doc_seq_packing_sharded", _PACK_SQL.format(
    part="source, ", partby="PARTITION BY source "
))
def doc_seq_packing_sharded(spark, sf_dir):
    """Sequence packing keyed by source shard — every shard packs
    independently in parallel (one shuffle on the shard key), the form
    that holds at 100 TB."""
    docs = load_table(spark, sf_dir, "documents")
    from warp10_platform_spark.pipeline.assemble import seq_packing

    return seq_packing(docs, bin_tokens=2048, partition_col="source")


@register("doc_chunk_dedup", (
    "WITH t AS (SELECT doc_id, string_split(trim(text), ' ') AS toks FROM documents), "
    "c AS (SELECT doc_id, [array_to_string(toks[i*10+1 : i*10+10], ' ') for i in range(0, len(toks)//10)] AS chunks "
    "      FROM t WHERE len(toks) >= 10), "
    "e AS (SELECT doc_id, unnest(chunks) AS chunk FROM c), "
    "g AS (SELECT chunk, count(*) AS n FROM e GROUP BY chunk), "
    "d AS (SELECT e.doc_id, count(*) AS n_chunks, sum(CASE WHEN g.n > 1 THEN 1 ELSE 0 END) AS n_dup "
    "      FROM e JOIN g USING(chunk) GROUP BY e.doc_id) "
    "SELECT doc_id, CAST(n_chunks AS BIGINT) AS n_chunks, CAST(n_dup AS BIGINT) AS n_dup, "
    "round(n_dup * 1.0 / n_chunks, 6) AS dup_chunk_ratio FROM d"
))
def doc_chunk_dedup(spark, sf_dir):
    """Chunk-level (pseudo-line/paragraph) dedup ratio per doc — the
    line-dedup stage of a CCNet/RefinedWeb pipeline: disjoint 10-token
    windows, corpus-wide occurrence counts, per-doc duplicated-chunk
    fraction. Shuffles carry (chunk, count), never text."""
    docs = load_table(spark, sf_dir, "documents")
    return _text.chunk_dedup_ratio(docs)


@register("doc_curate_e2e", (
    "WITH keep AS (SELECT min(doc_id) AS doc_id FROM documents GROUP BY md5(text)), "
    "t AS (SELECT d.doc_id, d.source, "
    "  len(string_split(trim(d.text), ' ')) AS nt, "
    "  len(list_distinct(string_split(trim(d.text), ' '))) AS nd "
    "  FROM documents d JOIN keep ON d.doc_id = keep.doc_id), "
    "f AS (SELECT * FROM t WHERE nt >= 8 AND nd * 1000 >= nt * 300), "
    "s AS (SELECT * FROM f WHERE ('0x' || substr(md5(doc_id::VARCHAR), 1, 15))::BIGINT % 1000 "
    "  < 50 * (1 + (substr(source, 4)::INT % 10))) "
    "SELECT source, count(*) AS n_docs, sum(nt)::BIGINT AS n_tokens FROM s GROUP BY source"
))
def doc_curate_e2e(spark, sf_dir):
    """The curation stages COMPOSED in one DAG: exact-dedup keepers →
    integer-arithmetic quality gate (≥8 tokens, ≥30% lexical diversity)
    → per-source mixture sampling → per-source doc/token accounting.
    Proves the pipeline tier chains without materialization boundaries;
    the oracle replays the whole chain in SQL."""
    from warp10_platform_spark.pipeline.assemble import curate

    docs = load_table(spark, sf_dir, "documents")
    rate = 50 * (1 + (F.substring("source", 4, 10).cast("int") % 10))
    return curate(docs, 8, 300, rate)
