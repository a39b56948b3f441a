"""Graph primitives needed by corpus curation — connected components.

Duplicate-pair detection (jaccard/minhash/simhash/cosine) yields EDGES;
actual dedup needs the transitive closure: every connected component
collapses to one canonical document.  ``connected_components`` is the
reusable kernel; ``dedup.dedup_connected_components`` is the registered
query built on it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

CC_MAX_ITERS = 20  # min-label propagation bound (≥ graph diameter)


def connected_components(
    pairs: DataFrame, a: str, b: str, max_iters: int = CC_MAX_ITERS
) -> DataFrame:
    """Label every node of an undirected pair graph with the minimum node
    id reachable from it (its component id).  Returns (node, label).

    Iterative min-label propagation: each round every node takes the min
    label among itself and its neighbors; converges in ≤ diameter rounds,
    detected via the monotone-decreasing label sum (an exact integer —
    no fixpoint tolerance needed).

    Scale: each round is one equi-join + one groupBy-min shuffle over the
    EDGE set (∝ duplicate pairs ≪ corpus); ``localCheckpoint`` truncates
    the iterative lineage so plans don't grow with rounds.  Web-scale
    graphs (long chains, billions of edges) swap this loop for the
    large-star/small-star algorithm (Kiveris et al., "Connected
    Components in MapReduce and Beyond") — same DataFrame primitives in
    O(log n) rounds; for small-diameter dup graphs plain propagation has
    the better constant factor."""
    pairs = pairs.select(F.col(a).alias("src"), F.col(b).alias("dst"))
    edges = (
        pairs.unionByName(pairs.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
        .localCheckpoint(eager=True)
    )
    labels = (
        edges.select(F.col("src").alias("node"))
        .distinct()
        .withColumn("lbl", F.col("node"))
        .localCheckpoint(eager=True)
    )
    prev_sum = labels.agg(F.sum("lbl")).first()[0]
    for _ in range(max_iters):
        neighbor = edges.join(labels, edges.src == labels.node).select(
            F.col("dst").alias("node"), "lbl"
        )
        labels = (
            labels.unionByName(neighbor)
            .groupBy("node")
            .agg(F.min("lbl").alias("lbl"))
            .localCheckpoint(eager=True)
        )
        cur_sum = labels.agg(F.sum("lbl")).first()[0]
        if cur_sum == prev_sum:
            return labels
        prev_sum = cur_sum
    raise RuntimeError(f"label propagation did not converge in {max_iters} rounds")
