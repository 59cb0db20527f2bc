"""Training-data dedup pipeline example: the full ladder on one corpus.

Shows how the dedup tiers compose on the documents table — exact hash
dedup, MinHash-LSH near-dup pairs, simhash hamming pairs, and the r7
SemDeDup-style embedding tier that turns pair evidence into per-vector
KEEP/DROP verdicts (the decision a pretraining pipeline actually acts
on). Run:
    python examples/semantic_dedup_pipeline.py [sf_dir]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"

    from warp10_platform_spark.pipeline import dedup, similarity
    from warp10_platform_spark.queries.emb import _ivf_centroids
    from warp10_platform_spark.session import get_spark

    spark = get_spark("semantic-dedup-example")
    spark.sparkContext.setLogLevel("ERROR")
    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    emb = spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet"))

    print("exact dup groups:",
          dedup.exact_duplicates(docs).count() if hasattr(dedup, "exact_duplicates")
          else docs.groupBy(F.md5("text")).count().where("count > 1").count())
    print("minhash-LSH near-dup pairs:", dedup.minhash_lsh_pairs(docs, threshold=0.5).count())
    print("simhash pairs (hamming<=3):", dedup.simhash_pairs(docs, radius=3).count())

    verdicts = similarity.semantic_dedup(emb, _ivf_centroids(), threshold=0.4)
    kept = verdicts.where("kept").count()
    total = verdicts.count()
    print(f"semantic dedup verdicts: keep {kept}/{total} "
          f"({total - kept} dropped as in-cell near-duplicates)")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
