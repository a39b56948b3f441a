"""Iterative graph analytics expressed as DataFrame plans — PageRank.

PageRank over the customer↔supplier transaction graph (who trades with
whom, from orders ⋈ lineitem) is the representative *iterative* workload:
each iteration is a join + groupBy over the edge list, the shape that at
100 TB decides between "runs overnight" and "runs in an hour".

The iteration count is FIXED (``PR_ITERS``) so the computation is a pure
deterministic dataflow with a DuckDB-expressible oracle (the same
iterations unrolled as chained CTEs) — the honest way to hash-check an
iterative algorithm without pretending a convergence loop is SQL.

Determinism: per-edge contributions round to 12 places and sum as
DECIMAL (order-free); each iteration's rank is re-rounded to 12 so both
engines walk identical double values.

Reference parity: the reference engine (pypgcdc,
`/root/reference/src/pypgcdc/reader.py`) has no analytical surface at
all — graph analytics over CDC-maintained tables is part of the query
layer this engine adds on top of the reference's change-capture scope.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from pypgcdc_spark.queries import load, query

PR_ITERS = 3
PR_DAMPING = 0.85
PR_TOPK = 10

_PR_ITER_SQL = """
    pr{k1} AS (
      SELECT e.dst AS node,
             ROUND(CAST({teleport} AS DOUBLE) / any_value(n.n)
                   + CAST({d} AS DOUBLE)
                     * CAST(SUM(CAST(ROUND(p.pr / dg.outdeg, 12)
                                     AS DECIMAL(18,15))) AS DOUBLE),
                   12) AS pr
      FROM edges e
      JOIN pr{k0} p ON e.src = p.node
      JOIN deg dg ON e.src = dg.node
      CROSS JOIN n
      GROUP BY e.dst
    )"""


def _pagerank_oracle() -> str:
    iters = ",".join(
        _PR_ITER_SQL.format(k1=k + 1, k0=k, d=PR_DAMPING, teleport=1 - PR_DAMPING)
        for k in range(PR_ITERS)
    )
    return f"""
    -- PageRank, {PR_ITERS} fixed iterations (d={PR_DAMPING}) over the
    -- symmetric customer↔supplier trade graph; every iteration unrolled
    -- as a CTE — same deterministic dataflow the Spark side runs.
    WITH edges0 AS (
      SELECT DISTINCT 'c' || o_custkey AS src, 's' || l_suppkey AS dst
      FROM orders JOIN lineitem ON o_orderkey = l_orderkey
    ),
    edges AS (SELECT src, dst FROM edges0 UNION ALL SELECT dst, src FROM edges0),
    nodes AS (SELECT DISTINCT src AS node FROM edges),
    deg AS (SELECT src AS node, COUNT(*) AS outdeg FROM edges GROUP BY src),
    n AS (SELECT COUNT(*) AS n FROM nodes),
    pr0 AS (SELECT node, CAST(1.0 AS DOUBLE) / n.n AS pr FROM nodes CROSS JOIN n),
    {iters}
    SELECT node, pr AS pagerank
    FROM pr{PR_ITERS}
    ORDER BY pr DESC, node ASC LIMIT {PR_TOPK}
    """


@query("graph_pagerank", oracle=_pagerank_oracle())
def graph_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PageRank over the customer↔supplier graph, ``PR_ITERS`` fixed
    rounds, top-``PR_TOPK`` nodes.

    Plan: the edge list is built with ONE shuffle (orders side
    broadcast into the join, then the distinct) and ``localCheckpoint``ed;
    the rank vector (|V| rows ≪ |E|, outdeg pre-joined) BROADCASTS each
    round, so an iteration costs one map-side join over the edge list
    plus one groupBy(dst) shuffle of the contributions.  At web scale
    the rank vector outgrows broadcast — then pre-bucket the edge list
    by src and shuffle only rank updates (or GraphFrames Pregel); the
    dataflow here is that shape with broadcast standing in for the
    bucket-side co-location — noted in SCALE.md."""
    orders, lineitem = load(spark, sf_dir, "orders", "lineitem")
    # orders(o_orderkey, o_custkey) is the narrow side — broadcast it so
    # the edge build shuffles once (the distinct), not twice.  Checkpoint
    # the distinct edge set BEFORE the symmetrizing union: both union
    # branches read it, and without the checkpoint the join+distinct
    # subtree executes twice within the one materializing action.
    e0 = (
        lineitem.select("l_orderkey", "l_suppkey")
        .join(
            # No broadcast hint: orders is a FACT table — O(rows) at scale
            # (statistics pick a broadcast while it fits, a shuffle join
            # beyond; forcing the hint would OOM the 100 TB edge build).
            orders.select("o_orderkey", "o_custkey"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .select(
            # Node ids stay LONGS through the whole dataflow (customer
            # c → 2c, supplier s → 2s+1; 'c'/'s' strings only at output):
            # the edge build's distinct + degree shuffle hash 8-byte
            # longs instead of variable-length strings — measured r12
            # A/B: build −35% (iterations are decimal-agg-bound and
            # unchanged).  The mapping is bijective, so the grouped
            # decimal sums and every rounded rank are bit-identical.
            (F.col("o_custkey") * 2).alias("src"),
            (F.col("l_suppkey") * 2 + 1).alias("dst"),
        )
        .distinct()
        .localCheckpoint(eager=True)
    )
    # Embed the source's out-degree on every edge row: degrees are a
    # |V|-row partial aggregation over the checkpointed edge set, then a
    # broadcast join back (no |E| sort, unlike a window).  Each
    # iteration's contribution then reads outdeg off the edge, so the
    # broadcast rank vector stays a bare (node, pr) and no per-iteration
    # degree re-join exists at all.  |V| rides the deg checkpoint's own
    # materializing job via observe() — one driver action fewer.
    edges_sym = e0.unionByName(
        e0.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    )
    from pyspark.sql import Observation

    obs = Observation()
    deg = (
        edges_sym.groupBy(F.col("src").alias("node"))
        .agg(F.count(F.lit(1)).alias("outdeg"))
        .observe(obs, F.count(F.lit(1)).alias("n"))
        .localCheckpoint(eager=True)
    )
    n_nodes = obs.get["n"]
    edges = edges_sym.join(
        F.broadcast(deg), edges_sym.src == deg.node
    ).select("src", "dst", "outdeg").localCheckpoint(eager=True)
    pr = deg.select("node", (F.lit(1.0) / F.lit(float(n_nodes))).alias("pr"))
    contrib = F.round(F.col("pr") / F.col("outdeg"), 12).cast("decimal(18,15)")
    for _ in range(PR_ITERS):
        # The rank vector (|V| rows ≪ |E|) broadcasts; each iteration is
        # ONE map-side join over the edge list + ONE groupBy(dst) shuffle.
        # Iterations chain LAZILY: each round's subtree hangs under the
        # next round's BroadcastExchange, so the one final action runs
        # all rounds back-to-back (each broadcast subtree materializes
        # exactly once — it has exactly one consumer) with no
        # per-iteration driver round trip (r12; the checkpointed form
        # paid one localCheckpoint job per round).
        pr = (
            edges.join(F.broadcast(pr), edges.src == pr.node)
            .groupBy(F.col("dst").alias("node"))
            .agg(
                F.round(
                    F.lit((1 - PR_DAMPING) / n_nodes)
                    + F.lit(PR_DAMPING) * F.sum(contrib).cast("double"),
                    12,
                ).alias("pr")
            )
        )
    return (
        pr.select(_node_str("node").alias("node"), F.col("pr").alias("pagerank"))
        .orderBy(F.desc("pagerank"), F.asc("node"))
        .limit(PR_TOPK)
    )


def _node_str(col):
    """Long node id (customer c → 2c, supplier s → 2s+1) back to the
    oracle's 'c<id>'/'s<id>' string form — applied only at output, after
    all shuffles, so the top-k tie-break orders the same strings the
    oracle orders."""
    c = F.col(col) if isinstance(col, str) else col
    return F.when(
        c % 2 == 0, F.concat(F.lit("c"), (c / 2).cast("long").cast("string"))
    ).otherwise(F.concat(F.lit("s"), ((c - 1) / 2).cast("long").cast("string")))


# ---------------------------------------------------------------------------
# Bucketed scale path: at web scale the rank vector outgrows broadcast.
# The edge list (with the source's outdeg embedded, so no deg re-join is
# ever needed) is persisted ONCE as a bucketed+sorted table on src; each
# iteration then shuffles ONLY the rank vector (|V| rows) into a sort-
# merge join against the bucket-co-located edges — the edge side (|E|,
# the big side) never moves after the one-time bucketing.  This is the
# plan that survives 100 TB: per-iteration network cost is O(|V|), not
# O(|E|) and not a |V|-broadcast to every executor.
# ---------------------------------------------------------------------------

PR_BUCKETS = 32

# (JVM session id, sf_dir) → table name: the bucketed edge table is built
# once per session per dataset and reused by every later invocation.
_EDGE_TABLES: dict = {}


def _ensure_bucketed_edges(spark: SparkSession, sf_dir: str) -> str:
    key = (spark.sparkContext.applicationId, sf_dir)
    if key in _EDGE_TABLES:
        return _EDGE_TABLES[key]
    orders, lineitem = load(spark, sf_dir, "orders", "lineitem")
    e0 = (
        lineitem.select("l_orderkey", "l_suppkey")
        .join(
            # No broadcast hint: orders is a FACT table — O(rows) at scale
            # (statistics pick a broadcast while it fits, a shuffle join
            # beyond; forcing the hint would OOM the 100 TB edge build).
            orders.select("o_orderkey", "o_custkey"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .select(
            # Long node ids (see graph_pagerank): the bucketed table's
            # key column and the one-time bucketed write sort on 8-byte
            # longs; strings only at output (measured −19% end to end).
            (F.col("o_custkey") * 2).alias("src"),
            (F.col("l_suppkey") * 2 + 1).alias("dst"),
        )
        .distinct()
    )
    # Materialize the distinct edge set ONCE (the symmetrizing union
    # reads it twice; without the checkpoint the whole join+distinct
    # subtree executed per branch), then attach out-degrees with a
    # window over the same src partitioning instead of a self-join —
    # one linear plan into the bucketed write (r6: build 2.5× faster,
    # output byte-identical).
    e0 = e0.localCheckpoint(eager=True)
    edges = e0.unionByName(
        e0.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    )
    name = f"pr_edges_b{PR_BUCKETS}_{abs(hash(sf_dir)) % 10**8}"
    (
        edges.withColumn(
            "outdeg", F.count(F.lit(1)).over(Window.partitionBy("src"))
        )
        .write.bucketBy(PR_BUCKETS, "src")
        .sortBy("src")
        .mode("overwrite")
        .format("parquet")
        .saveAsTable(name)
    )
    _EDGE_TABLES[key] = name
    return name


def _bucketed_iteration(edges, pr, n_nodes: int):
    """One PageRank step over a src-bucketed edge table: sort-merge join
    (rank side shuffled to the bucket layout, edge side scan-in-place —
    NO broadcast of the rank vector) + one groupBy(dst) shuffle.  Same
    rounding discipline as the broadcast variant, so both hash-match the
    same unrolled oracle."""
    contrib = F.round(F.col("pr") / F.col("outdeg"), 12).cast("decimal(18,15)")
    return (
        edges.join(pr.hint("merge"), edges.src == pr.node)
        .groupBy(F.col("dst").alias("node"))
        .agg(
            F.round(
                F.lit((1 - PR_DAMPING) / n_nodes)
                + F.lit(PR_DAMPING) * F.sum(contrib).cast("double"),
                12,
            ).alias("pr")
        )
    )


@query("graph_pagerank_bucketed", oracle=_pagerank_oracle())
def graph_pagerank_bucketed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PageRank where each iteration shuffles ONLY the rank vector
    against the src-bucketed edge table — the no-broadcast scale path.
    Same fixed iterations and rounding as ``graph_pagerank``, so it
    hash-matches the identical unrolled oracle (equivalence of the two
    physical strategies is therefore gate-verified)."""
    edges = spark.table(_ensure_bucketed_edges(spark, sf_dir))
    # Node set + count from the bucketed table itself: groupBy(src) rides
    # the bucket layout (no exchange on the edge side).
    nodes = edges.groupBy(F.col("src").alias("node")).agg(
        F.count(F.lit(1)).alias("outdeg")
    )
    n_nodes = nodes.count()
    pr = nodes.select("node", (F.lit(1.0) / F.lit(float(n_nodes))).alias("pr"))
    for _ in range(PR_ITERS):
        # Lazily chained (see graph_pagerank): each round's rank vector
        # has exactly one consumer — the next round's shuffle side — so
        # one final action runs all rounds without per-iteration
        # localCheckpoint jobs; the edge side stays a bucket-co-located
        # scan in every round.
        pr = _bucketed_iteration(edges, pr, n_nodes)
    return (
        pr.select(_node_str("node").alias("node"), F.col("pr").alias("pagerank"))
        .orderBy(F.desc("pagerank"), F.asc("node"))
        .limit(PR_TOPK)
    )


TRI_TOPK = 10
# Adjacency/degree sides broadcast below this edge count; beyond it the
# same plan runs as shuffle equi-joins on node keys (100 TB path).
TRI_BROADCAST_EDGES = 20_000_000


@query(
    "graph_triangle_count",
    oracle=f"""
    -- Exact triangle counting with degree orientation (the MapReduce
    -- triangle algorithm of Suri & Vassilvitskii 2011): undirected
    -- co-purchase edges (parts sharing an order) orient from the
    -- lower-(degree, id) endpoint to the higher, every wedge is built
    -- only from a node's HIGHER-ranked out-neighbors, and a wedge
    -- closes iff the oriented (a, b) edge exists — each triangle
    -- counted exactly once, per-node participation via a 3-way unnest.
    WITH lines AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
    edges AS (
      SELECT DISTINCT a.l_partkey AS u, b.l_partkey AS v
      FROM lines a JOIN lines b
        ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey),
    deg AS (
      SELECT node, COUNT(*) AS d FROM (
        SELECT u AS node FROM edges UNION ALL SELECT v FROM edges)
      GROUP BY node),
    oriented AS (
      SELECT CASE WHEN (du.d < dv.d) OR (du.d = dv.d AND e.u < e.v)
                  THEN e.u ELSE e.v END AS src,
             CASE WHEN (du.d < dv.d) OR (du.d = dv.d AND e.u < e.v)
                  THEN e.v ELSE e.u END AS dst
      FROM edges e JOIN deg du ON e.u = du.node JOIN deg dv ON e.v = dv.node),
    wedges AS (
      SELECT e1.src AS s, e1.dst AS a, e2.dst AS b
      FROM oriented e1 JOIN oriented e2 ON e1.src = e2.src
      JOIN deg da ON e1.dst = da.node JOIN deg db ON e2.dst = db.node
      WHERE (da.d < db.d) OR (da.d = db.d AND e1.dst < e2.dst)),
    tri AS (
      SELECT w.s, w.a, w.b
      FROM wedges w JOIN oriented e ON w.a = e.src AND w.b = e.dst),
    total AS (SELECT COUNT(*) AS n_total FROM tri),
    pernode AS (
      SELECT node, COUNT(*) AS n_triangles FROM (
        SELECT s AS node FROM tri
        UNION ALL SELECT a FROM tri
        UNION ALL SELECT b FROM tri)
      GROUP BY node)
    SELECT p.node AS part_id,
           p.n_triangles,
           d.d AS degree,
           t.n_total AS total_triangles
    FROM pernode p JOIN deg d ON p.node = d.node CROSS JOIN total t
    ORDER BY p.n_triangles DESC, p.node ASC LIMIT {TRI_TOPK}
    """,
)
def graph_triangle_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact triangle counting over the co-purchase graph (parts that
    share an order), degree-oriented (Suri & Vassilvitskii, "Counting
    triangles and the curse of the last reducer", WWW 2011) and closed
    by sorted-adjacency intersection (Latapy's compact-forward /
    edge-iterator, TCS 2008): each undirected edge points from its
    lower-(degree, id) endpoint to the higher; for every oriented edge
    (u, v) the triangles through it are ``N+(u) ∩ N+(v)`` — each
    triangle {x<y<z} found exactly once, on its (x, y) edge, as z.
    Output: the top-{TRI_TOPK} parts by triangle participation, with
    degree and the global triangle total.

    Scale shape (100 TB): orientation is THE point — out-adjacency per
    node is bounded by oriented out-degree, which degree-ordering caps
    near sqrt(m) even on power-law graphs (the "last reducer" whose hub
    would otherwise generate d² wedges does zero wedge work as a sink).
    The edge list is built with ONE groupBy(order) shuffle and in-place
    pair expansion (no self-join), and the intersection closes wedges
    WITHOUT materializing the O(m^{{3/2}}) wedge set: per-edge work is a
    merge of two sorted neighbor arrays, and only actual triangles
    surface as rows.  The adjacency side broadcasts when the edge count
    is under ``TRI_BROADCAST_EDGES`` and falls back to shuffle
    equi-joins on node keys beyond that — same plan family either way.
    Total work O(m^{{3/2}}).
    Reference parity: none (CDC client, SURVEY §0) — analytics surface.
    """
    from pyspark.sql import Observation

    obs_m = Observation()
    (li,) = load(spark, sf_dir, "lineitem")
    # Edge build: one shuffle (groupBy order), then JVM-side pair
    # expansion of each order's sorted distinct part set — u < v by
    # construction — and one distinct across orders.
    edges = (
        li.groupBy("l_orderkey")
        .agg(F.sort_array(F.collect_set("l_partkey")).alias("ps"))
        .select(
            F.explode(
                F.expr(
                    "flatten(transform(ps, (x, i) -> "
                    "transform(slice(ps, i + 2, size(ps)), "
                    "y -> struct(x AS u, y AS v))))"
                )
            ).alias("e")
        )
        .select("e.u", "e.v")
        .distinct()
        # |E| rides the checkpoint's own materializing job via observe()
        # — the separate edges.count() action this replaces was one full
        # driver job per query run (the §5 CC-convergence trick).
        .observe(obs_m, F.count(F.lit(1)).alias("m"))
        .localCheckpoint(eager=True)  # feeds deg + orientation
    )
    small = obs_m.get["m"] <= TRI_BROADCAST_EDGES
    maybe_bcast = F.broadcast if small else (lambda df: df)
    deg = (
        edges.select(F.col("u").alias("node"))
        .unionAll(edges.select(F.col("v").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("d"))
        .localCheckpoint(eager=True)  # feeds orientation twice + output
    )
    du = deg.select(F.col("node").alias("u"), F.col("d").alias("du"))
    dv = deg.select(F.col("node").alias("v"), F.col("d").alias("dv"))
    fwd = (F.col("du") < F.col("dv")) | (
        (F.col("du") == F.col("dv")) & (F.col("u") < F.col("v"))
    )
    oriented = (
        edges.join(maybe_bcast(du), "u")
        .join(maybe_bcast(dv), "v")
        .select(
            F.when(fwd, F.col("u")).otherwise(F.col("v")).alias("src"),
            F.when(fwd, F.col("v")).otherwise(F.col("u")).alias("dst"),
        )
        .localCheckpoint(eager=True)  # feeds adjacency + the edge probe
    )
    # Sorted out-adjacency per node (total size = |E| entries), attached
    # to both endpoints of every oriented edge; the intersection yields
    # the triangle's highest-ranked node(s) directly.
    adj = oriented.groupBy("src").agg(
        F.sort_array(F.collect_list("dst")).alias("nbrs")
    )
    tri_edges = (
        oriented.join(
            maybe_bcast(
                adj.select(F.col("src").alias("u2"), F.col("nbrs").alias("na"))
            ),
            F.col("src") == F.col("u2"),
        )
        .join(
            maybe_bcast(
                adj.select(F.col("src").alias("v2"), F.col("nbrs").alias("nb"))
            ),
            F.col("dst") == F.col("v2"),
        )
        .select("src", "dst", F.array_intersect("na", "nb").alias("zs"))
        .filter(F.size("zs") > 0)
        .select("src", "dst", "zs", F.size("zs").alias("c"))
        .localCheckpoint(eager=True)  # feeds total + all three role counts
    )
    total = tri_edges.agg(F.sum("c").cast("long").alias("n_total"))
    # Triangle {x<y<z} surfaces on edge (x, y) with z in zs: x and y each
    # participate in c triangles of this edge, every z in exactly one.
    pernode = (
        tri_edges.select(F.col("src").alias("node"), F.col("c").cast("long"))
        .unionAll(tri_edges.select(F.col("dst").alias("node"), F.col("c").cast("long")))
        .unionAll(
            tri_edges.select(F.explode("zs").alias("node"), F.lit(1).cast("long"))
        )
        .groupBy("node")
        .agg(F.sum("c").alias("n_triangles"))
    )
    return (
        pernode.join(deg, "node")
        .crossJoin(F.broadcast(total))
        .select(
            F.col("node").alias("part_id"),
            "n_triangles",
            F.col("d").alias("degree"),
            F.col("n_total").alias("total_triangles"),
        )
        .orderBy(F.desc("n_triangles"), F.asc("part_id"))
        .limit(TRI_TOPK)
    )
