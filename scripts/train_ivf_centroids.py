"""Offline IVF centroid training — the semantic-dedup scale contract
made concrete (r7 verdict ask #3).

semantic_dedup's 100 TB shape rests on "k-means-trained centroids size
cells to ~N/k" (pipeline/similarity.py docstring); this script IS that
offline step for the synthetic corpus, the full-dimension sibling of
scripts/train_pq_codebook.py: seeded kmeans++ init + 25 Lloyd
iterations (deterministic — same data, same centroids), then writes
warp10_platform_spark/pipeline/ivf_centroids_v1.json consumed by
ivf_centroids_trained() / emb_semantic_dedup_trained. Re-run after a
corpus regeneration.

At real scale this runs on a corpus SAMPLE (k-means needs ~100-1000
points per centroid, not the corpus): sample to the driver, train, ship
the centroids as plan literals exactly as done here.

Usage: python scripts/train_ivf_centroids.py [sf_dir] [K]
"""

from __future__ import annotations

import json
import os
import sys

import duckdb
import numpy as np

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
K = int(sys.argv[2]) if len(sys.argv) > 2 else 8
ITERS = 25
SEED = 7


def main() -> None:
    con = duckdb.connect()
    a = con.sql(
        f"SELECT embedding FROM read_parquet('{SF}/embeddings.parquet') ORDER BY vec_id"
    ).fetchnumpy()["embedding"]
    x = np.stack([np.array(v) for v in a]).astype(np.float64)
    dim = x.shape[1]
    rnd = np.random.RandomState(SEED)
    # kmeans++ init: first pick uniform, then D²-weighted
    idx = [rnd.randint(len(x))]
    for _ in range(K - 1):
        d = ((x[:, None, :] - x[idx][None, :, :]) ** 2).sum(-1).min(1)
        idx.append(rnd.choice(len(x), p=d / d.sum()))
    c = x[idx].copy()
    for _ in range(ITERS):
        d = ((x[:, None, :] - c[None, :, :]) ** 2).sum(-1)
        asg = d.argmin(1)
        for k in range(K):
            pts = x[asg == k]
            if len(pts):
                c[k] = pts.mean(0)
    sizes = np.bincount(asg, minlength=K)
    out = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "warp10_platform_spark",
        "pipeline",
        "ivf_centroids_v1.json",
    )
    with open(out, "w") as f:
        json.dump(
            {
                "k": K,
                "dim": dim,
                "seed": SEED,
                "iters": ITERS,
                "train_cell_sizes": [int(s) for s in sizes],
                "centroids": [[float(v) for v in row] for row in c],
            },
            f,
        )
    print(f"wrote {out}: K={K} dim={dim} train cell sizes={sizes.tolist()} (N/k={len(x) / K:.0f})")


if __name__ == "__main__":
    main()
