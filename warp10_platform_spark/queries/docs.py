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


NGRAM_JACCARD_ORACLE = """
WITH t AS (
  SELECT doc_id, list_distinct([
    toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]
    for i in range(1, len(toks) - 1)
  ]) AS sh
  FROM (SELECT doc_id, string_split(trim(text), ' ') AS toks FROM documents)
  WHERE len(toks) >= 3
),
e AS (SELECT doc_id, unnest(sh) AS s FROM t),
n AS (SELECT doc_id, len(sh) AS n FROM t),
inter AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS i
  FROM e a JOIN e b ON a.s = b.s AND a.doc_id < b.doc_id
  GROUP BY a.doc_id, b.doc_id
)
SELECT id_a, id_b, round(i * 1.0 / (na.n + nb.n - i), 6) AS jaccard
FROM inter JOIN n na ON na.doc_id = id_a JOIN n nb ON nb.doc_id = id_b
WHERE i * 1.0 / (na.n + nb.n - i) >= 0.3
"""


@register("doc_ngram_jaccard", NGRAM_JACCARD_ORACLE)
def doc_ngram_jaccard(spark, sf_dir):
    """Near-dup pairs by exact word-3-gram Jaccard ≥ 0.3 — the exact
    baseline that MinHash/LSH approximates. Shuffle = (shingle, id)
    exploded pairs; at 100 TB the LSH variant below replaces the full
    self-join."""
    docs = load_table(spark, sf_dir, "documents")
    return _dedup.ngram_jaccard_pairs(docs, n=3, threshold=0.3)


@register("doc_minhash_lsh")  # probabilistic candidate recall → rows-only check
def doc_minhash_lsh(spark, sf_dir):
    """MinHash + banded LSH near-dup: shingle→minhash sig→band buckets→
    candidate pairs→exact-jaccard verify ≥ 0.3. Same output contract as
    doc_ngram_jaccard but only LSH candidates are verified — the 100 TB
    scale path (no full self-join)."""
    docs = load_table(spark, sf_dir, "documents")
    return _dedup.minhash_lsh_pairs(docs, n=3, num_hashes=32, bands=8, threshold=0.3)


@register("doc_simhash")  # hash-based → rows-only check
def doc_simhash(spark, sf_dir):
    """SimHash 64-bit fingerprint per doc + near pairs within hamming
    radius 3 via 4-segment blocking."""
    docs = load_table(spark, sf_dir, "documents")
    return _dedup.simhash_pairs(docs, radius=3)
