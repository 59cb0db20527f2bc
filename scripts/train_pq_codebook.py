"""Offline PQ codebook training — the production contract made concrete.

Product quantization codebooks are k-means-trained on a corpus sample
offline and shipped to the query as constants; this script IS that
offline step for the synthetic corpus: seeded kmeans++ init + 25 Lloyd
iterations per subspace (deterministic — same data, same codebook), then
writes warp10_platform_spark/pipeline/pq_codebook_v1.json consumed by
emb_pq_trained_topk. Re-run after a corpus regeneration.

Usage: python scripts/train_pq_codebook.py [sf_dir] [M] [K]
"""

from __future__ import annotations

import json
import os
import sys

import duckdb
import numpy as np

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
M = int(sys.argv[2]) if len(sys.argv) > 2 else 8
K = int(sys.argv[3]) if len(sys.argv) > 3 else 16
ITERS = 25
SEED = 7


def main() -> None:
    con = duckdb.connect()
    a = con.sql(
        f"SELECT embedding FROM read_parquet('{SF}/embeddings.parquet') ORDER BY vec_id"
    ).fetchnumpy()["embedding"]
    m = np.stack([np.array(x) for x in a]).astype(np.float64)
    dim = m.shape[1]
    sub = dim // M
    rnd = np.random.RandomState(SEED)
    cb = []
    for mi in range(M):
        x = m[:, mi * sub:(mi + 1) * sub]
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
        cb.append([[float(v) for v in row] for row in c])
    out = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "warp10_platform_spark",
        "pipeline",
        "pq_codebook_v1.json",
    )
    with open(out, "w") as f:
        json.dump({"m": M, "k": K, "dim": dim, "seed": SEED, "iters": ITERS, "codebook": cb}, f)
    print(f"wrote {out}: M={M} K={K} dim={dim}")


if __name__ == "__main__":
    main()
