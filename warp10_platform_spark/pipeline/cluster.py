"""Near-duplicate clustering — the step after pair generation in a
training-data dedup pipeline: pairs → connected components → one
canonical keeper per component (everything else is dropped or
downweighted).

Algorithm: iterative min-label propagation. Every node starts labeled
with itself; each round a node adopts the minimum label among itself and
its neighbors; at fixpoint every component carries its minimum doc id as
the representative. Deterministic — the fixpoint is unique whatever the
iteration count ≥ the component diameter, so the result is oracle-able.

Scale: each round is one shuffle (join on node id + groupBy). Dup
components in practice are near-cliques (diameter ≤ 3-4), so the loop
converges in a handful of rounds; the early-stop check is one count()
per round — a driver-side scalar in an iterative algorithm, same class
as STL's loop. Lineage is truncated with localCheckpoint so the plan
doesn't grow superlinearly with rounds (the classic iterative-join trap).
For graphs with long chains, the large-star/small-star variant
(Kiveris et al., "Connected Components in MapReduce") halves the round
count; not needed for dedup-shaped graphs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    edges: DataFrame,
    src: str = "id_a",
    dst: str = "id_b",
    max_iter: int = 12,
) -> DataFrame:
    """(src, dst) pairs → (id, rep) with rep = min node id reachable.
    Only nodes appearing in `edges` are labeled (isolated docs are their
    own trivial cluster and never enter the pair stream)."""
    e = edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
    und = e.unionByName(e.select(F.col("b").alias("a"), F.col("a").alias("b")))
    # r10 (guide §5, measured): materialize the edge list ONCE before the
    # loop. `und` is consumed by every round's neighbor join AND the
    # initial label seed — uncheckpointed, each of those re-executed the
    # FULL upstream pair-generation pipeline (for doc_dup_clusters, the
    # quadratic ngram-jaccard self-join: ~(rounds+1) full recomputes;
    # interleaved A/B at sf0.1, both orders: 18.5/17.4 s → 9.5/4.8 s
    # medians, outputs identical). Same
    # localCheckpoint tradeoff as `labels` below: lineage truncation also
    # keeps the per-round plan (and its analysis cost) flat. Edge rows
    # are (long, long) pairs — tiny next to the corpus at any scale.
    und = und.localCheckpoint(eager=True)
    labels = (
        und.select(F.col("a").alias("id")).distinct().withColumn("rep", F.col("id"))
    )
    labels = labels.localCheckpoint(eager=True)
    for _ in range(max_iter):
        nbr = (
            und.join(labels, und["b"] == labels["id"])
            .groupBy("a")
            .agg(F.min("rep").alias("nrep"))
        )
        # least() skips nulls (Spark semantics), so nodes with no improving
        # neighbor keep their label.
        new = (
            labels.join(nbr, labels["id"] == nbr["a"], "left")
            .select(labels["id"], F.least("rep", "nrep").alias("rep"))
        )
        new = new.localCheckpoint(eager=True)
        changed = (
            new.alias("n")
            .join(labels.alias("o"), "id")
            .where(F.col("n.rep") != F.col("o.rep"))
            .count()
        )
        labels = new
        if changed == 0:
            break
    return labels


def dup_clusters(pairs: DataFrame, max_iter: int = 12) -> DataFrame:
    """(id_a, id_b, …) near-dup pairs → (doc_id, cluster_rep). The keeper
    policy is min-id (the reference point for 'keep one copy per
    cluster'); swap the agg for a quality-score argmax to keep the best
    copy instead."""
    cc = connected_components(pairs, max_iter=max_iter)
    return cc.select(F.col("id").alias("doc_id"), F.col("rep").alias("cluster_rep"))
