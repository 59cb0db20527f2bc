"""Similarity-search queries over the embeddings table."""

from __future__ import annotations

from pyspark.sql import functions as F

from warp10_platform_spark.pipeline import similarity as _sim
from warp10_platform_spark.queries import register
from warp10_platform_spark.sources.tables import load_table

COSINE_TOPK_ORACLE = """
WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
q AS (SELECT vec_id AS qid, v AS qv FROM e WHERE vec_id < 10),
s AS (
  SELECT q.qid, e.vec_id AS nid,
         list_dot_product(q.qv, e.v) /
         (sqrt(list_dot_product(q.qv, q.qv)) * sqrt(list_dot_product(e.v, e.v))) AS sim
  FROM q JOIN e ON e.vec_id != q.qid
)
SELECT qid, nid, round(sim, 6) AS sim FROM (
  SELECT *, row_number() OVER (PARTITION BY qid ORDER BY round(sim, 6) DESC, nid ASC) AS rk FROM s
) WHERE rk <= 3
"""


@register("emb_cosine_topk", COSINE_TOPK_ORACLE)
def emb_cosine_topk(spark, sf_dir):
    """Brute-force cosine top-k: broadcast the query set against all
    candidates; dot products via zip_with/aggregate (JVM-side, no UDF).
    Rank on the rounded sim so float last-ulp differences between engines
    cannot flip the ordering."""
    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.where(F.col("vec_id") < 10)
    return _sim.cosine_topk(queries, emb, k=3)


@register("emb_norms", (
    "SELECT vec_id, round(sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[])), 6) AS norm, "
    "len(embedding) AS dim FROM embeddings"
))
def emb_norms(spark, sf_dir):
    """Vector norms — the VECTOR/matrix math surface (TOVEC, §2.8) on the
    embedding column."""
    emb = load_table(spark, sf_dir, "embeddings")
    return _sim.with_norm(emb).select("vec_id", F.round("norm", 6).alias("norm"), F.size("embedding").alias("dim"))


@register("emb_lsh_topk")  # probabilistic recall → rows-only check
def emb_lsh_topk(spark, sf_dir):
    """Scale path: random-hyperplane LSH bucketing, then top-k only within
    buckets — replaces the O(N·Q) broadcast product at 100 TB."""
    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.where(F.col("vec_id") < 10)
    return _sim.lsh_topk(queries, emb, k=3, num_planes=8)
