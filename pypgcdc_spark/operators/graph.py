"""Graph primitives needed by corpus curation — connected components.

Duplicate-pair detection (jaccard/minhash/simhash/cosine) yields EDGES;
actual dedup needs the transitive closure: every connected component
collapses to one canonical document.  ``connected_components`` is the
reusable kernel; ``dedup.dedup_connected_components`` is the registered
query built on it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Observation
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
    # The convergence metric (exact integer label sum) rides the round's
    # own materializing action via observe() instead of a second
    # aggregate job per round — half the driver actions per iteration
    # (measured r12: 1.43 -> 1.06 s on the gate graph, labels identical).
    obs0 = Observation()
    labels = (
        edges.select(F.col("src").alias("node"))
        .distinct()
        .withColumn("lbl", F.col("node"))
        .observe(obs0, F.sum("lbl").alias("s"))
        .localCheckpoint(eager=True)
    )
    prev_sum = obs0.get["s"]
    for _ in range(max_iters):
        neighbor = edges.join(labels, edges.src == labels.node).select(
            F.col("dst").alias("node"), "lbl"
        )
        obs = Observation()
        labels = (
            labels.unionByName(neighbor)
            .groupBy("node")
            .agg(F.min("lbl").alias("lbl"))
            .observe(obs, F.sum("lbl").alias("s"))
            .localCheckpoint(eager=True)
        )
        cur_sum = obs.get["s"]
        if cur_sum == prev_sum:
            return labels
        prev_sum = cur_sum
    raise RuntimeError(f"label propagation did not converge in {max_iters} rounds")


def connected_components_star(
    pairs: DataFrame, a: str, b: str, max_iters: int = CC_MAX_ITERS
) -> DataFrame:
    """Connected components via alternating large-star / small-star rounds
    (Kiveris et al., "Connected Components in MapReduce and Beyond",
    SOCC'14).  Returns (node, lbl) with lbl = min node id of the component
    — identical output contract to ``connected_components``.

    Each round rewires the edge set toward each neighborhood's minimum:

    * **large-star**: for every node u, connect every *strictly larger*
      neighbor v > u to m = min(N(u) ∪ {u});
    * **small-star**: connect every neighbor v ≤ u (and u itself) to m.

    Both are one groupBy(u) shuffle producing a new edge list; the graph
    converges to a star around each component minimum in O(log² n) rounds
    (O(log n) in practice), versus O(diameter) for plain label
    propagation.  That is the 100 TB story: a chain-shaped dup graph of
    length 10⁶ needs 10⁶ propagation rounds but ~20 star rounds, and each
    round's shuffle stays ∝ |E|.  Small-diameter graphs (typical near-dup
    clusters) favor plain propagation's lower constant factor — both
    kernels share the same contract so callers can pick per workload.

    Convergence detection: the edge multiset is canonicalized each round
    (large endpoint → small endpoint, distinct); when the integer
    sum-of-endpoints fingerprint stops changing the star graph is stable.
    """
    edges = (
        pairs.select(F.col(a).alias("u"), F.col(b).alias("v"))
        .filter(F.col("u") != F.col("v"))
        .select(
            F.greatest("u", "v").alias("u"), F.least("u", "v").alias("v")
        )
        .distinct()
        .localCheckpoint(eager=True)
    )
    prev_fp, prev_edges = None, None
    for _ in range(max_iters):
        # Large-star: group by u over BOTH edge directions so N(u) is the
        # full neighborhood; emit (v, m) for strictly-larger neighbors.
        both = edges.unionByName(
            edges.select(F.col("v").alias("u"), F.col("u").alias("v"))
        )
        nbr_min = both.groupBy("u").agg(F.least(F.min("v"), F.min("u")).alias("m"))
        large = (
            both.join(nbr_min, "u")
            .filter(F.col("v") > F.col("u"))
            .select(F.col("v").alias("u"), F.col("m").alias("v"))
        )
        # Small-star: orient edges large→small (u ≥ v), connect small
        # neighbors and u itself to the neighborhood minimum.
        small_min = edges.groupBy("u").agg(F.least(F.min("v"), F.min("u")).alias("m"))
        small = (
            edges.join(small_min, "u")
            .select(F.col("v").alias("u"), F.col("m").alias("v"))
            .unionByName(small_min.select(F.col("u"), F.col("m").alias("v")))
        )
        obs = Observation()
        edges = (
            large.unionByName(small)
            .filter(F.col("u") != F.col("v"))
            .select(F.greatest("u", "v").alias("u"), F.least("u", "v").alias("v"))
            .distinct()
            # Fingerprint rides the checkpoint's materializing job
            # (observe) instead of a second aggregate action per round.
            .observe(obs, (F.sum("u") + F.sum("v")).alias("s"), F.count(F.lit(1)).alias("n"))
            .localCheckpoint(eager=True)
        )
        got = obs.get
        fp = (got["s"], got["n"])
        # Cheap integer fingerprint first; on a hit, confirm with an exact
        # distinct-set comparison (equal counts + empty one-sided diff)
        # so a fingerprint collision can never end the loop early.
        if fp == prev_fp and edges.exceptAll(prev_edges).isEmpty():
            break
        prev_fp, prev_edges = fp, edges
    else:
        raise RuntimeError(f"star contraction did not converge in {max_iters} rounds")
    # Stable state: every edge is (member, component-min). Components of
    # size 1 can't occur here (pair graphs always have both endpoints).
    members = edges.select(F.col("u").alias("node"), F.col("v").alias("lbl"))
    roots = edges.select(F.col("v").alias("node")).distinct().withColumn(
        "lbl", F.col("node")
    )
    return members.unionByName(roots)
