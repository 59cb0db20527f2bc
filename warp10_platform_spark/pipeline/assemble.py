"""Dataset assembly for pretraining pipelines: statistical quality
scoring, mixture sampling, and sequence packing.

These are the stages that turn a cleaned corpus into a training dataset:
score documents with a corpus-trained n-gram language model (the
perplexity-filter step), sample each source stratum at its mixture
weight (data mixing), and pack documents into fixed-token-budget
sequences (batch assembly).  All JVM column expressions + joins — no
Python UDFs anywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from warp10_platform_spark.pipeline.text import TOKS


def lm_score(docs: DataFrame) -> DataFrame:
    """Bigram language-model log-likelihood per document, add-one
    smoothed, trained on the corpus itself:

        score(d) = avg over bigrams (w1,w2) of
                   ln( (c2(w1,w2) + 1) / (c1(w1) + V) )

    Low scores flag out-of-distribution / garbled documents — the
    classic KenLM-style perplexity filter, expressed relationally.

    Scale shape: unigram counts and the vocab size are tiny aggregates
    (broadcast); the bigram-count join keys on the bigram string, so the
    plan is two hash aggregations + one shuffle join on bigrams + one
    broadcast join — all partial-aggregated map-side first.  No stage
    ever materializes more than the distinct-bigram set."""
    d = docs.withColumn("_toks", TOKS()).where(F.size("_toks") >= 2)
    bi = d.select(
        "doc_id",
        F.explode(
            F.expr(
                "transform(slice(_toks, 1, size(_toks) - 1),"
                " (x, i) -> concat(x, ' ', _toks[i + 1]))"
            )
        ).alias("bg"),
    ).withColumn("w1", F.substring_index("bg", " ", 1))
    uni = (
        d.select(F.explode("_toks").alias("w"))
        .groupBy("w")
        .agg(F.count("*").alias("c1"))
    )
    big = bi.groupBy("bg").agg(F.count("*").alias("c2"))
    vocab = uni.agg(F.count("*").cast("double").alias("v"))
    scored = (
        bi.join(big, "bg")
        .join(F.broadcast(uni.withColumnRenamed("w", "w1")), "w1")
        .crossJoin(F.broadcast(vocab))
        .withColumn("lp", F.log((F.col("c2") + 1) / (F.col("c1") + F.col("v"))))
    )
    return scored.groupBy("doc_id").agg(
        F.count("*").cast("long").alias("n_bigrams"),
        F.round(F.avg("lp"), 6).alias("avg_logprob"),
    )


def stratified_sample(docs: DataFrame, rate_col, hash_col="doc_id") -> DataFrame:
    """Deterministic mixture sampling: keep a row when its portable
    60-bit content hash falls under the stratum's per-mille rate.

    `rate_col` is a Column of integer per-mille keep rates (0..1000),
    typically derived from the source/stratum column — the "mixture
    weights" of a data-mixing recipe.  The hash is the cross-engine
    md5-prefix trick, so the SAME rows are selected on any engine and
    any cluster size: sampling is a pure scan-side filter, no shuffle,
    no RNG state."""
    h = F.conv(F.substring(F.md5(F.col(hash_col).cast("string")), 1, 15), 16, 10).cast(
        "bigint"
    )
    return docs.withColumn("_keep_hash", h % 1000).where(
        F.col("_keep_hash") < rate_col
    ).drop("_keep_hash")


def seq_packing(docs: DataFrame, bin_tokens: int = 2048,
                partition_col: str | None = None) -> DataFrame:
    """Sequence packing: lay documents head-to-tail in doc_id order and
    assign each to the fixed-size token bin its first token lands in —
    the deterministic greedy concat-and-chunk of training-batch
    assembly.

    With `partition_col` (the 100 TB path) packing is independent per
    partition value (e.g. per source shard): the window is keyed, so
    Spark packs every shard in parallel with one shuffle.  Without it
    the order is global — a single-reducer window that exists for
    oracle determinism and small corpora only."""
    keys = [partition_col] if partition_col else []
    w = (
        Window.partitionBy(*keys).orderBy("doc_id")
        if keys
        else Window.orderBy("doc_id")
    )
    d = docs.withColumn("n_tokens", F.size(TOKS()))
    d = d.withColumn(
        "stream_offset",
        (F.sum("n_tokens").over(w) - F.col("n_tokens")).cast("long"),
    )
    cols = ["doc_id", "n_tokens", "stream_offset"]
    if partition_col:
        cols.insert(1, partition_col)
    return d.withColumn(
        "bin_id", F.floor(F.col("stream_offset") / bin_tokens).cast("long")
    ).select(*cols, "bin_id")


def curate(docs: DataFrame, min_tokens: int, diversity_permille: int, rate_col) -> DataFrame:
    """The composed curation pipeline as ONE Catalyst DAG: exact-dedup
    keeper selection → quality gate → deterministic mixture sampling →
    per-source accounting (docs kept, token budget).

    Stage plumbing, not new operators: the value is that the stages fuse
    — dedup's keeper join is the only wide exchange (hash groupBy +
    join-back on doc_id), the quality gate and sampling filters run
    scan-side ON the join output, and the final per-source agg is
    partial-aggregated map-side. The quality gate uses INTEGER
    arithmetic (nd·1000 ≥ nt·permille) so the cut is bit-identical on
    any engine — no float-rounding boundary to disagree on."""
    keep = docs.groupBy(F.md5("text").alias("h")).agg(F.min("doc_id").alias("doc_id"))
    kept = docs.join(keep.select("doc_id"), "doc_id")
    t = (
        kept.withColumn("_toks", TOKS())
        .withColumn("nt", F.size("_toks"))
        .withColumn("nd", F.size(F.array_distinct(F.col("_toks"))))
        .drop("_toks")
    )
    f = t.where(
        (F.col("nt") >= min_tokens)
        & (F.col("nd") * 1000 >= F.col("nt") * diversity_permille)
    )
    s = stratified_sample(f, rate_col)
    return s.groupBy("source").agg(
        F.count("*").alias("n_docs"),
        F.sum("nt").alias("n_tokens"),
    )
