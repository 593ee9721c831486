"""Connected components over near-duplicate pair lists.

Pair generation (jaccard/minhash/embedding) yields EDGES; dedup
pipelines need CLUSTERS — every document labeled with its component's
representative (min id) so one keeper per cluster survives. This is
min-label propagation:

    label(v) <- min(label(v), min over neighbors(label(u)))

iterated to fixpoint. Convergence takes O(component diameter) rounds;
near-dup components are small and dense (dupes of one source), so a
handful of rounds suffices — ``max_iters`` bounds the worst case, and
the loop exits early the first round nothing changes (one cheap
count per round). At extreme scale the same loop upgrades to the
large-star/small-star contraction (Kiveris et al.), which bounds
rounds by O(log n) — the per-round joins below are unchanged.

Each round is one join (labels x edges) + one groupBy(min) — shuffle
keyed on vertex id. Edges are materialized once, undirected.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(pairs: DataFrame,
                         src: str = "id_a", dst: str = "id_b",
                         max_iters: int = 20) -> DataFrame:
    """(id, cluster): cluster = min id reachable from ``id``.

    Only vertices that appear in ``pairs`` are returned (isolated
    docs are their own cluster by definition — no need to carry
    them through the propagation).
    """
    edges = (pairs.select(F.col(src).alias("u"), F.col(dst).alias("v"))
             .unionAll(pairs.select(F.col(dst).alias("u"),
                                    F.col(src).alias("v")))
             .distinct()
             .persist())
    labels = (edges.select(F.col("u").alias("id"))
              .distinct()
              .withColumn("cluster", F.col("id")))

    for _ in range(max_iters):
        neighbor_min = (
            edges.join(labels, edges["v"] == labels["id"])
            .groupBy("u").agg(F.min("cluster").alias("nmin")))
        updated = (
            labels.join(neighbor_min, labels["id"] == neighbor_min["u"],
                        "left")
            .select(labels["id"],
                    F.least("cluster", "nmin").alias("cluster"),
                    (F.col("nmin") < F.col("cluster")).alias("changed"))
            .persist())
        changed = updated.where("changed").count()
        labels = updated.select("id", "cluster")
        if changed == 0:
            break
    edges.unpersist()
    return labels
