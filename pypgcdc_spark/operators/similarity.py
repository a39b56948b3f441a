"""Similarity search over an embedding column (``array<float>``).

Brute-force cosine top-k is the correctness baseline; random-hyperplane
LSH bucketing is the 100 TB path (candidates from an equi-join on the
signature, never an all-pairs product).  Both are oracle-checked — the
hyperplane family is derived from md5 so DuckDB computes the *same*
planes.

The dot-product kernel is a JVM higher-order function (zip_with +
aggregate over doubles): vectorizable, codegen-able, no Python in the
per-pair hot path.  A Pandas-UDF variant (numpy matmul per Arrow batch) is
provided for wide-k workloads where BLAS wins: ``ann_topk_pandas``
(same result set, exercised in tests; the oracle entry uses the JVM path).
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from pypgcdc_spark.functions.vector import cosine as _cosine_kernel
from pypgcdc_spark.queries import load, query

N_QUERIES = 10  # vec_id < 10 are the query vectors
TOP_K = 5
N_PLANES = 8  # LSH signature bits
_DIM = 64

# Deterministic pseudo-random hyperplanes shared with the oracle:
# component(plane p, dim i) = hex16(md5(p || ':' || i)) / 32768 - 1  ∈ [-1, 1)
_PLANES_SQL = f"""
    planes AS (SELECT p.p, d.i,
                      (('0x' || substr(md5(p.p || ':' || d.i), 1, 4))::INTEGER / 32768.0 - 1) AS c
               FROM (SELECT unnest(range({N_PLANES})) AS p) p,
                    (SELECT unnest(range(1, {_DIM + 1})) AS i) d)
"""


_cosine = _cosine_kernel


@query(
    "ann_topk_bruteforce",
    oracle=f"""
    WITH q AS (SELECT vec_id AS query_id, embedding AS eq FROM embeddings WHERE vec_id < {N_QUERIES}),
    c AS (SELECT vec_id AS cand_id, embedding AS ec FROM embeddings),
    ex AS (SELECT query_id, cand_id, eq[i]::DOUBLE AS x, ec[i]::DOUBLE AS y
           FROM q, c, unnest(generate_series(1, {_DIM})) t(i)
           WHERE query_id <> cand_id),
    cos AS (SELECT query_id, cand_id,
                   ROUND(SUM(x*y) / (sqrt(SUM(x*x)) * sqrt(SUM(y*y))), 4) AS cosine
            FROM ex GROUP BY 1, 2),
    ranked AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                                            ORDER BY cosine DESC, cand_id ASC) AS rank
               FROM cos)
    SELECT query_id, cand_id, cosine, rank FROM ranked WHERE rank <= {TOP_K}
    """,
)
def ann_topk_bruteforce(spark, sf_dir):
    """Exact k-NN: broadcast the query set against the corpus, cosine in
    JVM, per-query top-k via window.  Ranking uses the *rounded* cosine
    (+ id tiebreak) so rank order is engine-independent.

    At scale: queries broadcast (they're small), corpus scan is
    embarrassingly parallel, per-partition top-k via the window — no
    corpus shuffle at all."""
    from pyspark.sql import Window

    (emb,) = load(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("eq")
    )
    c = emb.select(F.col("vec_id").alias("cand_id"), F.col("embedding").alias("ec"))
    scored = (
        c.crossJoin(F.broadcast(q))
        .filter(F.col("query_id") != F.col("cand_id"))
        .select(
            "query_id",
            "cand_id",
            F.round(_cosine(F.col("eq"), F.col("ec")), 4).alias("cosine"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("cand_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= TOP_K)
    )


@query(
    "ann_lsh_bucketed",
    oracle=f"""
    WITH {_PLANES_SQL},
    comp AS (SELECT e.vec_id, p.p, SUM(e.embedding[p.i]::DOUBLE * p.c) AS proj
             FROM embeddings e, planes p
             GROUP BY e.vec_id, p.p),
    sig AS (SELECT vec_id,
                   SUM(CASE WHEN proj > 0 THEN (1::BIGINT << p) ELSE 0 END) AS bucket
            FROM comp GROUP BY vec_id),
    q AS (SELECT s.vec_id AS query_id, s.bucket, e.embedding AS eq
          FROM sig s JOIN embeddings e USING (vec_id) WHERE s.vec_id < {N_QUERIES}),
    c AS (SELECT s.vec_id AS cand_id, s.bucket, e.embedding AS ec
          FROM sig s JOIN embeddings e USING (vec_id)),
    cand AS (SELECT query_id, cand_id, eq, ec FROM q JOIN c USING (bucket)
             WHERE query_id <> cand_id),
    ex AS (SELECT query_id, cand_id, eq[i]::DOUBLE AS x, ec[i]::DOUBLE AS y
           FROM cand, unnest(generate_series(1, {_DIM})) t(i)),
    cos AS (SELECT query_id, cand_id,
                   ROUND(SUM(x*y) / (sqrt(SUM(x*x)) * sqrt(SUM(y*y))), 4) AS cosine
            FROM ex GROUP BY 1, 2),
    ranked AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                                            ORDER BY cosine DESC, cand_id ASC) AS rank
               FROM cos)
    SELECT query_id, cand_id, cosine, rank FROM ranked WHERE rank <= {TOP_K}
    """,
)
def ann_lsh_bucketed(spark, sf_dir):
    """Approximate k-NN via random-hyperplane LSH: {P}-bit sign signature →
    candidates share the exact bucket → exact cosine re-rank inside the
    bucket.  The bucket join is an equi-join: at 100 TB candidates shuffle
    by bucket id, cost ∝ bucket occupancy, never |corpus|².

    Projections are computed by posexplode + broadcast-join against the
    plane table — one shuffle-free pass over the corpus."""
    from pyspark.sql import Window

    (emb,) = load(spark, sf_dir, "embeddings")
    planes = spark.range(N_PLANES).select(F.col("id").cast("int").alias("p")).crossJoin(
        spark.range(1, _DIM + 1).select(F.col("id").cast("int").alias("i"))
    ).select(
        "p",
        "i",
        (
            F.conv(
                F.substring(F.md5(F.concat_ws(":", F.col("p").cast("string"), F.col("i").cast("string"))), 1, 4),
                16,
                10,
            ).cast("int")
            / 32768.0
            - 1
        ).alias("c"),
    )
    comp = (
        emb.select("vec_id", F.posexplode("embedding").alias("pos", "val"))
        .withColumn("i", F.col("pos") + 1)
        .join(F.broadcast(planes), "i")
        .groupBy("vec_id", "p")
        .agg(F.sum(F.col("val").cast("double") * F.col("c")).alias("proj"))
    )
    sig = comp.groupBy("vec_id").agg(
        F.sum(
            F.when(F.col("proj") > 0, F.expr("shiftleft(1L, p)")).otherwise(
                F.lit(0).cast("long")
            )
        ).alias("bucket")
    )
    embs = emb.select("vec_id", "embedding")
    q = (
        sig.filter(F.col("vec_id") < N_QUERIES)
        .join(embs, "vec_id")
        .select(F.col("vec_id").alias("query_id"), "bucket", F.col("embedding").alias("eq"))
    )
    c = sig.join(embs, "vec_id").select(
        F.col("vec_id").alias("cand_id"), "bucket", F.col("embedding").alias("ec")
    )
    cand = q.join(c, "bucket").filter(F.col("query_id") != F.col("cand_id"))
    scored = cand.select(
        "query_id", "cand_id", F.round(_cosine(F.col("eq"), F.col("ec")), 4).alias("cosine")
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("cand_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= TOP_K)
    )


N_CENTROIDS = 16  # IVF nlist
N_PROBE = 4  # IVF nprobe (lists searched per query)


@query(
    "ann_ivf_flat",
    oracle=f"""
    -- IVF-flat: centroids = the {N_CENTROIDS} vectors with smallest
    -- md5(vec_id) (deterministic seed pick, shared with Spark); every
    -- vector joins the inverted list of its nearest centroid; queries
    -- probe the {N_PROBE} nearest lists and re-rank exactly.
    WITH cent AS (
      SELECT vec_id AS cent_id, embedding AS ce FROM embeddings
      ORDER BY md5(vec_id::VARCHAR), vec_id LIMIT {N_CENTROIDS}
    ),
    cos_vc AS (
      SELECT e.vec_id, c.cent_id,
             SUM(e.embedding[i]::DOUBLE * c.ce[i]::DOUBLE)
               / (sqrt(SUM(e.embedding[i]::DOUBLE * e.embedding[i]::DOUBLE))
                  * sqrt(SUM(c.ce[i]::DOUBLE * c.ce[i]::DOUBLE))) AS cos
      FROM embeddings e, cent c, unnest(generate_series(1, {_DIM})) t(i)
      GROUP BY e.vec_id, c.cent_id
    ),
    assign AS (
      SELECT vec_id, cent_id FROM (
        SELECT vec_id, cent_id,
               ROW_NUMBER() OVER (PARTITION BY vec_id
                                  ORDER BY cos DESC, cent_id ASC) AS rn
        FROM cos_vc) WHERE rn = 1
    ),
    probes AS (
      SELECT vec_id AS query_id, cent_id FROM (
        SELECT vec_id, cent_id,
               ROW_NUMBER() OVER (PARTITION BY vec_id
                                  ORDER BY cos DESC, cent_id ASC) AS rn
        FROM cos_vc WHERE vec_id < {N_QUERIES}) WHERE rn <= {N_PROBE}
    ),
    cand AS (
      SELECT p.query_id, a.vec_id AS cand_id
      FROM probes p JOIN assign a USING (cent_id)
      WHERE p.query_id <> a.vec_id
    ),
    ex AS (
      SELECT query_id, cand_id, q.embedding[i]::DOUBLE AS x, c.embedding[i]::DOUBLE AS y
      FROM cand JOIN embeddings q ON cand.query_id = q.vec_id
                JOIN embeddings c ON cand.cand_id = c.vec_id,
           unnest(generate_series(1, {_DIM})) t(i)
    ),
    cos AS (SELECT query_id, cand_id,
                   ROUND(SUM(x*y) / (sqrt(SUM(x*x)) * sqrt(SUM(y*y))), 4) AS cosine
            FROM ex GROUP BY 1, 2),
    ranked AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                                            ORDER BY cosine DESC, cand_id ASC) AS rank
               FROM cos)
    SELECT query_id, cand_id, cosine, rank FROM ranked WHERE rank <= {TOP_K}
    """,
)
def ann_ivf_flat(spark, sf_dir):
    """IVF-flat ANN: the corpus is partitioned into {N_CENTROIDS} inverted
    lists by nearest centroid; a query searches only its {N_PROBE} nearest
    lists (exact cosine re-rank inside).  The complementary scale path to
    LSH bucketing: probe cost ∝ nprobe/nlist of the corpus, and the
    centroid assignment is one broadcast pass (centroids are tiny).

    Centroids here are a deterministic seed pick (smallest md5(vec_id)) so
    the DuckDB oracle derives the identical index; a production deployment
    trains them with MLlib KMeans — the query shape (assign → probe →
    re-rank equi-join) is unchanged."""
    from pyspark.sql import Window

    (emb,) = load(spark, sf_dir, "embeddings")
    cent = (
        emb.orderBy(F.md5(F.col("vec_id").cast("string")), F.col("vec_id"))
        .limit(N_CENTROIDS)
        .select(F.col("vec_id").alias("cent_id"), F.col("embedding").alias("ce"))
    )
    def centroid_scores(df):
        return df.crossJoin(F.broadcast(cent)).select(
            "vec_id",
            "cent_id",
            _cosine(F.col("embedding"), F.col("ce")).alias("cos"),
        )

    # Assignment: argmax via max_by with the (cos DESC, cent_id ASC)
    # tiebreak encoded as a struct ordering.  groupBy gets a map-side
    # partial aggregate, so the shuffle carries ~|corpus| rows — the
    # window formulation this replaces shuffled |corpus|×nlist rows, and
    # was computed a second time just to derive the probe lists (the r04
    # ann_ivf_flat regression).
    assign = (
        centroid_scores(emb)
        .groupBy("vec_id")
        .agg(F.max_by("cent_id", F.struct(F.col("cos"), -F.col("cent_id"))).alias("cent_id"))
    )
    # Probe lists need only the query vectors: nqueries×nlist rows.
    w_assign = Window.partitionBy("vec_id").orderBy(F.desc("cos"), F.asc("cent_id"))
    probes = (
        centroid_scores(emb.filter(F.col("vec_id") < N_QUERIES))
        .withColumn("rn", F.row_number().over(w_assign))
        .filter(F.col("rn") <= N_PROBE)
        .select(F.col("vec_id").alias("query_id"), "cent_id")
    )
    embs = emb.select("vec_id", "embedding")
    cand = (
        F.broadcast(probes)
        .join(assign, "cent_id")
        .filter(F.col("query_id") != F.col("vec_id"))
        .select("query_id", F.col("vec_id").alias("cand_id"))
    )
    # Query vectors ONLY (bounded by construction): cand.query_id comes
    # from the probe set (vec_id < the query count), so pre-filtering the
    # broadcast side changes nothing — broadcasting the unfiltered
    # projection shipped the WHOLE embeddings table (O(corpus) at scale).
    q_emb = embs.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("eq")
    )
    scored = (
        cand.join(embs.withColumnRenamed("vec_id", "cand_id"), "cand_id")
        .join(F.broadcast(q_emb), "query_id")
        .select(
            "query_id",
            "cand_id",
            F.round(_cosine(F.col("eq"), F.col("embedding")), 4).alias("cosine"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("cand_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= TOP_K)
    )


def ann_topk_pandas(spark, sf_dir: str, k: int = TOP_K, n_queries: int = N_QUERIES) -> DataFrame:
    """BLAS-path exact k-NN: numpy matmul per Arrow batch via mapInPandas.

    Same results as ``ann_topk_bruteforce`` (asserted in tests); wins when
    k and the query set are large enough that matrix-matrix beats
    codegen'd per-pair loops.  Queries ride along as a broadcast variable —
    classic design for 1000-executor fan-out."""
    import numpy as np

    (emb,) = load(spark, sf_dir, "embeddings")
    qrows = emb.filter(F.col("vec_id") < n_queries).collect()  # tiny: the query set
    q_ids = np.array([r.vec_id for r in qrows])
    q_mat = np.array([r.embedding for r in qrows], dtype=np.float64)
    q_mat /= np.linalg.norm(q_mat, axis=1, keepdims=True)
    bc = spark.sparkContext.broadcast((q_ids, q_mat))

    def score(batches):
        ids, qm = bc.value
        for pdf in batches:
            c_ids = pdf["vec_id"].to_numpy()
            cm = np.array(list(pdf["embedding"]), dtype=np.float64)
            cm /= np.linalg.norm(cm, axis=1, keepdims=True)
            sims = qm @ cm.T  # (n_queries, batch)
            n_q, n_c = sims.shape
            yield pd.DataFrame(
                {
                    "query_id": np.repeat(ids, n_c),
                    "cand_id": np.tile(c_ids, n_q),
                    "cosine": np.round(sims.ravel(), 4),
                }
            )

    from pyspark.sql import Window

    scored = emb.mapInPandas(
        score, "query_id long, cand_id long, cosine double"
    ).filter(F.col("query_id") != F.col("cand_id"))
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("cand_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
    )


IVF_ITERS = 2  # Lloyd iterations for the trained-IVF index (oracle-unrolled)


def _ivf_trained_centroids(spark, emb):
    """Train the IVF coarse quantizer: fixed-point Lloyd's k-means
    (k=N_CENTROIDS, IVF_ITERS iterations, seeds = the k lowest vec_ids) —
    the exact kernel of ``operators/clustering.py`` so the DuckDB oracle
    can replay the training bit-for-bit.  Returns the scaled-vector frame
    and the trained centroid literals (bounded k×DIM metadata)."""
    from pypgcdc_spark.operators.clustering import _scaled, _train_update

    vectors = emb.select(
        "vec_id", _scaled(F.col("embedding")).alias("v"), "label"
    ).localCheckpoint(eager=True)
    seeds = vectors.orderBy("vec_id").limit(N_CENTROIDS).select("vec_id", "v").collect()
    cents = [
        (cid, list(r.v)) for cid, r in enumerate(sorted(seeds, key=lambda r: r.vec_id))
    ]
    for _ in range(IVF_ITERS):
        # ONE map-only job per iteration (assignment + partial sums in
        # the same Arrow kernel; exact arithmetic — see _train_update).
        cents = _train_update(vectors, cents)
    return vectors, cents


def _ivf_kmeans_ctes():
    """Unrolled-SQL twin of ``_ivf_trained_centroids`` + final assignment
    (``ka2``) — the clustering.py oracle discipline at k=N_CENTROIDS."""
    from pypgcdc_spark.operators.clustering import SCALE, _sql_assign, _sql_update

    return f"""
    -- Trained IVF index: {IVF_ITERS} unrolled fixed-point Lloyd
    -- iterations (k={N_CENTROIDS} lists, 1e-4 quantized, exact integer
    -- distances, ties -> smallest cid), seeds = the {N_CENTROIDS} lowest
    -- vec_ids.
    WITH vecs AS (
      SELECT vec_id, label,
             list_transform(embedding, x -> CAST(round(CAST(x AS DOUBLE) * {SCALE}) AS BIGINT)) AS v
      FROM embeddings),
    cent0 AS (
      SELECT ROW_NUMBER() OVER (ORDER BY vec_id) - 1 AS cid, v AS cvec
      FROM vecs ORDER BY vec_id LIMIT {N_CENTROIDS}),
    {_sql_assign('vecs', 'cent0', 'ka0')},
    {_sql_update('ka0', 'cent1')},
    {_sql_assign('vecs', 'cent1', 'ka1')},
    {_sql_update('ka1', 'cent2')},
    {_sql_assign('vecs', 'cent2', 'ka2')}"""


def _ivf_kmeans_oracle():
    from pypgcdc_spark.operators.clustering import _SQL_DIST

    return f"""
    {_ivf_kmeans_ctes()},
    -- Queries probe their {N_PROBE} nearest trained lists (exact integer
    -- centroid distance, ties -> smallest cid), candidates re-rank on
    -- exact full-precision cosine; in_exact_topk marks overlap with the
    -- brute-force top-{TOP_K} so IVF recall rides in the hashed output.
    probes AS (
      SELECT vec_id AS query_id, cid FROM (
        SELECT t.vec_id, c.cid,
               ROW_NUMBER() OVER (PARTITION BY t.vec_id
                                  ORDER BY {_SQL_DIST}, c.cid) AS rn
        FROM vecs t CROSS JOIN cent2 c WHERE t.vec_id < {N_QUERIES})
      WHERE rn <= {N_PROBE}),
    cand AS (
      SELECT p.query_id, a.vec_id AS cand_id
      FROM probes p JOIN ka2 a USING (cid)
      WHERE p.query_id <> a.vec_id),
    ex AS (
      SELECT query_id, cand_id, q.embedding[i]::DOUBLE AS x, c.embedding[i]::DOUBLE AS y
      FROM cand JOIN embeddings q ON cand.query_id = q.vec_id
                JOIN embeddings c ON cand.cand_id = c.vec_id,
           unnest(generate_series(1, {_DIM})) t(i)),
    cos AS (SELECT query_id, cand_id,
                   ROUND(SUM(x*y) / (sqrt(SUM(x*x)) * sqrt(SUM(y*y))), 4) AS cosine
            FROM ex GROUP BY 1, 2),
    ranked AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                                            ORDER BY cosine DESC, cand_id ASC) AS rank
               FROM cos),
    exq AS (SELECT vec_id AS query_id, embedding AS eq FROM embeddings
            WHERE vec_id < {N_QUERIES}),
    exc AS (SELECT vec_id AS cand_id, embedding AS ec FROM embeddings),
    expand AS (SELECT query_id, cand_id, eq[i]::DOUBLE AS x, ec[i]::DOUBLE AS y
               FROM exq, exc, unnest(generate_series(1, {_DIM})) t(i)
               WHERE query_id <> cand_id),
    ecos AS (SELECT query_id, cand_id,
                    ROUND(SUM(x*y) / (sqrt(SUM(x*x)) * sqrt(SUM(y*y))), 4) AS cosine
             FROM expand GROUP BY 1, 2),
    etop AS (SELECT query_id, cand_id
             FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                                                ORDER BY cosine DESC, cand_id ASC)
                              AS rank
                   FROM ecos)
             WHERE rank <= {TOP_K})
    SELECT r.query_id, r.cand_id, r.cosine, r.rank,
           (e.cand_id IS NOT NULL) AS in_exact_topk
    FROM ranked r LEFT JOIN etop e USING (query_id, cand_id)
    WHERE r.rank <= {TOP_K}
    """


@query("ann_ivf_kmeans", oracle=_ivf_kmeans_oracle())
def ann_ivf_kmeans(spark, sf_dir):
    """The production IVF shape: a *trained* coarse quantizer (Lloyd's
    k-means, the exact fixed-point kernel of ``operators/clustering.py``)
    instead of ``ann_ivf_flat``'s seed-picked centroids — trained lists
    are tighter, so recall at equal nprobe improves (`ANN_TUNING_r8.json`
    curves the nlist×nprobe trade-off at 100k vectors; SCALE.md's
    production defaults — nlist≈√N, nprobe from the curve — describe this
    operator).  ``in_exact_topk`` joins the full-precision brute-force
    top-k back in so IVF recall is part of the hashed gate output (the
    ``ann_scalar_quantized`` pattern).

    Determinism: training is scaled-integer exact (1e-4 fixed point,
    integer distance sums, argmin ties → smallest cid, fixed 2
    iterations), so the DuckDB oracle replays the identical index — a
    trained-ANN index inside the correctness gate.

    Scale shape: centroids are k×DIM ints of driver metadata; assignment
    is the map-side Arrow argmin kernel (no vector shuffles); per
    iteration only k×DIM partial sums shuffle; the probe is a broadcast
    equi-join on list id, cost ∝ nprobe/nlist of the corpus."""
    from pyspark.sql import Window

    (emb,) = load(spark, sf_dir, "embeddings")
    from pypgcdc_spark.operators.clustering import _assign

    vectors, cents = _ivf_trained_centroids(spark, emb)
    assign = _assign(vectors, cents).select("vec_id", "cid")
    cent_df = spark.createDataFrame(
        [(cid, vec) for cid, vec in cents], "cid INT, cvec ARRAY<BIGINT>"
    )
    # Probe ranking: exact integer d2 to every trained centroid — only
    # the N_QUERIES query vectors fan out ×nlist.
    d2 = F.aggregate(
        F.zip_with("v", "cvec", lambda a, b: (a - b) * (a - b)),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )
    w_probe = Window.partitionBy("vec_id").orderBy(F.asc("d2"), F.asc("cid"))
    probes = (
        vectors.filter(F.col("vec_id") < N_QUERIES)
        .crossJoin(F.broadcast(cent_df))
        .withColumn("d2", d2)
        .withColumn("rn", F.row_number().over(w_probe))
        .filter(F.col("rn") <= N_PROBE)
        .select(F.col("vec_id").alias("query_id"), "cid")
    )
    embs = emb.select("vec_id", "embedding")
    cand = (
        F.broadcast(probes)
        .join(assign, "cid")
        .filter(F.col("query_id") != F.col("vec_id"))
        .select("query_id", F.col("vec_id").alias("cand_id"))
    )
    # Query vectors ONLY (bounded by construction): cand.query_id comes
    # from the probe set (vec_id < the query count), so pre-filtering the
    # broadcast side changes nothing — broadcasting the unfiltered
    # projection shipped the WHOLE embeddings table (O(corpus) at scale).
    q_emb = embs.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("eq")
    )
    scored = (
        cand.join(embs.withColumnRenamed("vec_id", "cand_id"), "cand_id")
        .join(F.broadcast(q_emb), "query_id")
        .select(
            "query_id",
            "cand_id",
            F.round(_cosine(F.col("eq"), F.col("embedding")), 4).alias("cosine"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("cand_id"))
    qtop = (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= TOP_K)
    )
    etop = ann_topk_bruteforce(spark, sf_dir).select(
        "query_id", "cand_id", F.lit(True).alias("_hit")
    )
    return qtop.join(etop, ["query_id", "cand_id"], "left").select(
        "query_id",
        "cand_id",
        "cosine",
        "rank",
        F.coalesce(F.col("_hit"), F.lit(False)).alias("in_exact_topk"),
    )


def ann_ivf_kmeans_mllib(spark, sf_dir: str, k: int = TOP_K, n_queries: int = N_QUERIES) -> DataFrame:
    """IVF-flat with MLlib-KMeans-trained centroids — the same index/query
    shape as the gated ``ann_ivf_kmeans`` with MLlib's float Lloyd's in
    place of the fixed-point kernel (float centroids are JVM-iteration
    artifacts, so this variant is recall-pinned in tests rather than
    oracle-registered; ``tools/ann_tuning.py`` tunes this dataflow)."""
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector, vector_to_array
    from pyspark.sql import Window

    (emb,) = load(spark, sf_dir, "embeddings")
    feats = emb.select(
        "vec_id",
        "embedding",
        array_to_vector(F.col("embedding").cast("array<double>")).alias("features"),
    )
    model = KMeans(k=N_CENTROIDS, seed=42, featuresCol="features").fit(feats)
    cent = spark.createDataFrame(
        [(i, list(map(float, c))) for i, c in enumerate(model.clusterCenters())],
        "cent_id INT, ce ARRAY<DOUBLE>",
    )
    scored_vc = feats.crossJoin(F.broadcast(cent)).select(
        "vec_id", "embedding", "cent_id", _cosine(F.col("embedding"), F.col("ce")).alias("cos")
    )
    w_assign = Window.partitionBy("vec_id").orderBy(F.desc("cos"), F.asc("cent_id"))
    ranked_vc = scored_vc.withColumn("rn", F.row_number().over(w_assign))
    assign = ranked_vc.filter(F.col("rn") == 1).select("vec_id", "cent_id")
    probes = ranked_vc.filter((F.col("vec_id") < n_queries) & (F.col("rn") <= N_PROBE)).select(
        F.col("vec_id").alias("query_id"), "cent_id"
    )
    embs = emb.select("vec_id", "embedding")
    cand = (
        F.broadcast(probes)
        .join(assign, "cent_id")
        .filter(F.col("query_id") != F.col("vec_id"))
        .select("query_id", F.col("vec_id").alias("cand_id"))
    )
    # Query vectors ONLY (bounded by construction): cand.query_id comes
    # from the probe set (vec_id < the query count), so pre-filtering the
    # broadcast side changes nothing — broadcasting the unfiltered
    # projection shipped the WHOLE embeddings table (O(corpus) at scale).
    q_emb = embs.filter(F.col("vec_id") < n_queries).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("eq")
    )
    scored = (
        cand.join(embs.withColumnRenamed("vec_id", "cand_id"), "cand_id")
        .join(F.broadcast(q_emb), "query_id")
        .select(
            "query_id",
            "cand_id",
            F.round(_cosine(F.col("eq"), F.col("embedding")), 4).alias("cosine"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("cand_id"))
    return scored.withColumn("rank", F.row_number().over(w).cast("long")).filter(
        F.col("rank") <= k
    )


# ---------------------------------------------------------------------------
# Scalar quantization (int8-style): the memory/bandwidth scale path.
# ---------------------------------------------------------------------------

# (applicationId, sf_dir) -> ({dim: min}, {dim: max}).  The SQ8 codebook is
# a pure function of the corpus: compute it ONCE per session per dataset
# instead of rescanning the corpus inside every query run (r4 VERDICT:
# "the codebook should be computed once and persisted").  In production
# this is an index-build artifact written next to the codes; here the
# session cache is the same compute-once contract without a cross-session
# staleness story.
_SQ8_CODEBOOKS: dict = {}


def _sq8_codebook(spark, sf_dir, emb):
    key = (spark.sparkContext.applicationId, sf_dir)
    if key not in _SQ8_CODEBOOKS:
        stats = (
            emb.select(F.posexplode("embedding").alias("i", "x"))
            .groupBy("i")
            .agg(
                F.min(F.col("x").cast("double")).alias("mn"),
                F.max(F.col("x").cast("double")).alias("mx"),
            )
            .collect()
        )  # _DIM rows of bounded metadata (the quantizer "codebook")
        _SQ8_CODEBOOKS[key] = (
            {r.i: r.mn for r in stats},
            {r.i: r.mx for r in stats},
        )
    return _SQ8_CODEBOOKS[key]


@query(
    "ann_scalar_quantized",
    oracle=f"""
    -- Scalar-quantized k-NN: per-dimension [min, max] over the corpus,
    -- 8-bit uniform codes, scoring on the DEQUANTIZED (bin-center)
    -- vectors; in_exact_topk marks overlap with the full-precision
    -- top-{TOP_K} so recall is visible in the hashed output.
    WITH stats AS (
      SELECT i, MIN(embedding[i]::DOUBLE) AS mn, MAX(embedding[i]::DOUBLE) AS mx
      FROM embeddings, unnest(generate_series(1, {_DIM})) t(i)
      GROUP BY i
    ),
    deq AS (
      SELECT e.vec_id, s.i,
             s.mn + (CASE WHEN s.mx > s.mn
                          THEN LEAST(255, FLOOR((e.embedding[s.i]::DOUBLE - s.mn)
                                                / (s.mx - s.mn) * 256))
                          ELSE 0 END + 0.5) * (s.mx - s.mn) / 256.0 AS v
      FROM embeddings e, stats s
    ),
    qd AS (SELECT vec_id AS query_id, i, v FROM deq WHERE vec_id < {N_QUERIES}),
    cd AS (SELECT vec_id AS cand_id, i, v FROM deq),
    qcos AS (SELECT query_id, cand_id,
                    ROUND(SUM(qd.v * cd.v)
                          / (sqrt(SUM(qd.v * qd.v)) * sqrt(SUM(cd.v * cd.v))), 4)
                      AS qcosine
             FROM qd JOIN cd USING (i) WHERE query_id <> cand_id
             GROUP BY 1, 2),
    qranked AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                                             ORDER BY qcosine DESC, cand_id ASC)
                           AS rank
                FROM qcos),
    exq AS (SELECT vec_id AS query_id, embedding AS eq FROM embeddings
            WHERE vec_id < {N_QUERIES}),
    exc AS (SELECT vec_id AS cand_id, embedding AS ec FROM embeddings),
    expand AS (SELECT query_id, cand_id, eq[i]::DOUBLE AS x, ec[i]::DOUBLE AS y
               FROM exq, exc, unnest(generate_series(1, {_DIM})) t(i)
               WHERE query_id <> cand_id),
    ecos AS (SELECT query_id, cand_id,
                    ROUND(SUM(x*y) / (sqrt(SUM(x*x)) * sqrt(SUM(y*y))), 4) AS cosine
             FROM expand GROUP BY 1, 2),
    etop AS (SELECT query_id, cand_id
             FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                                                ORDER BY cosine DESC, cand_id ASC)
                              AS rank
                   FROM ecos)
             WHERE rank <= {TOP_K})
    SELECT r.query_id, r.cand_id, r.qcosine, r.rank,
           (e.cand_id IS NOT NULL) AS in_exact_topk
    FROM qranked r LEFT JOIN etop e USING (query_id, cand_id)
    WHERE r.rank <= {TOP_K}
    """,
)
def ann_scalar_quantized(spark, sf_dir):
    """k-NN over 8-bit scalar-quantized vectors: per-dimension [min,max]
    over the corpus (ONE bounded agg — one stats row per dimension),
    uniform 256-bin codes, cosine on the dequantized bin centers,
    per-query top-k; ``in_exact_topk`` joins the full-precision top-k
    back in so the quantization recall rides in the hashed output.

    At 100 TB: codes are 4× smaller than float32 (store
    ``array<tinyint>`` + the per-dimension stats vector), so a
    memory-bound corpus scan gets 4× the effective bandwidth — this
    operator gate-verifies the quantize→score math end to end; the
    stats collect is bounded metadata, never corpus-sized."""
    from pyspark.sql import Window

    (emb,) = load(spark, sf_dir, "embeddings")
    mn, mx = _sq8_codebook(spark, sf_dir, emb)
    mn_arr = F.array(*[F.lit(mn[i]) for i in range(_DIM)])
    mx_arr = F.array(*[F.lit(mx[i]) for i in range(_DIM)])

    def dequantized(col):
        def f(x, i):
            lo = F.element_at(mn_arr, i + F.lit(1))
            hi = F.element_at(mx_arr, i + F.lit(1))
            xd = x.cast("double")
            q = F.when(
                hi > lo,
                F.least(
                    F.lit(255.0),
                    F.floor((xd - lo) / (hi - lo) * F.lit(256.0)).cast("double"),
                ),
            ).otherwise(F.lit(0.0))
            return lo + (q + F.lit(0.5)) * (hi - lo) / F.lit(256.0)

        return F.transform(col, f)

    deq = emb.select("vec_id", dequantized(F.col("embedding")).alias("dv"), "embedding")
    q = deq.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"), F.col("dv").alias("qv")
    )
    scored = (
        deq.select(F.col("vec_id").alias("cand_id"), F.col("dv").alias("cv"))
        .crossJoin(F.broadcast(q))
        .filter(F.col("query_id") != F.col("cand_id"))
        .select(
            "query_id",
            "cand_id",
            F.round(_cosine(F.col("qv"), F.col("cv")), 4).alias("qcosine"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("qcosine"), F.asc("cand_id"))
    qtop = scored.withColumn("rank", F.row_number().over(w).cast("long")).filter(
        F.col("rank") <= TOP_K
    )

    # Full-precision top-k (the existing brute-force operator) for the
    # recall boolean.
    etop = ann_topk_bruteforce(spark, sf_dir).select(
        "query_id", "cand_id", F.lit(True).alias("_hit")
    )
    return (
        qtop.join(etop, ["query_id", "cand_id"], "left")
        .select(
            "query_id",
            "cand_id",
            "qcosine",
            "rank",
            F.coalesce(F.col("_hit"), F.lit(False)).alias("in_exact_topk"),
        )
    )


MAXSIM_QUERY_ID = 5  # fixed query document (vec_id == doc_id linkage)
MAXSIM_TOKENS = 8  # sub-vectors per embedding
MAXSIM_SUBDIM = 8  # dims per sub-vector
MAXSIM_TOPK = 10


@query(
    "retrieval_maxsim",
    oracle=f"""
    -- ColBERT-style late interaction (Khattab & Zaharia, SIGIR'20):
    -- embeddings decompose into {MAXSIM_TOKENS} sub-vectors of {MAXSIM_SUBDIM} dims
    -- ("token" vectors); score(q,d) = Σ_i max_j cos(q_i, d_j).  Per-pair
    -- cosines round to 4 before the max, and the {MAXSIM_TOKENS} maxes sum
    -- through exact decimal — rank order is engine-independent.
    WITH toks AS (
      SELECT vec_id, t.i,
             embedding[{MAXSIM_SUBDIM} * t.i + 1 : {MAXSIM_SUBDIM} * (t.i + 1)] AS tv
      FROM embeddings, (SELECT unnest(range({MAXSIM_TOKENS})) AS i) t),
    q AS (SELECT i AS qi, tv AS qv FROM toks WHERE vec_id = {MAXSIM_QUERY_ID}),
    ex AS (
      SELECT d.vec_id, q.qi, d.i AS dj,
             qv[k]::DOUBLE AS x, tv[k]::DOUBLE AS y
      FROM toks d, q, (SELECT unnest(range(1, {MAXSIM_SUBDIM + 1})) AS k) kk
      WHERE d.vec_id <> {MAXSIM_QUERY_ID}),
    cos AS (
      SELECT vec_id, qi, dj,
             ROUND(SUM(x*y) / (sqrt(SUM(x*x)) * sqrt(SUM(y*y))), 4) AS c
      FROM ex GROUP BY 1, 2, 3),
    best AS (
      SELECT vec_id, qi, MAX(c) AS m FROM cos GROUP BY 1, 2),
    scored AS (
      SELECT vec_id AS doc_id,
             ROUND(CAST(SUM(CAST(m AS DECIMAL(18,4))) AS DOUBLE), 4) AS maxsim
      FROM best GROUP BY 1)
    SELECT doc_id, maxsim FROM scored
    ORDER BY maxsim DESC, doc_id ASC LIMIT {MAXSIM_TOPK}
    """,
)
def retrieval_maxsim(spark, sf_dir):
    """Late-interaction retrieval: each embedding is treated as 8 token
    sub-vectors; a document scores Σ over query tokens of its best-
    matching doc token (maxsim).  This is the multi-vector ranking model
    (ColBERT) that beats single-vector cosine when different parts of a
    document match different parts of the query — the retrieval-quality
    upgrade of ann_topk_bruteforce, sharing its fixture linkage.

    Scale shape: query tokens broadcast (k·subdim floats); the corpus
    scan is embarrassingly parallel with all 8×8 pair cosines computed
    in-row per document (no doc ever shuffles); per-query cost is
    O(corpus · tokens²·subdim) map work + one TakeOrderedAndProject.
    At 100 TB the IVF/LSH bucketing of the single-vector paths
    prefilters candidates and maxsim re-ranks the shortlist."""
    from pyspark.sql import Window

    (emb,) = load(spark, sf_dir, "embeddings")
    tok = emb.select(
        "vec_id",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("i"),
                        F.slice("embedding", MAXSIM_SUBDIM * i + 1, MAXSIM_SUBDIM).alias(
                            "tv"
                        ),
                    )
                    for i in range(MAXSIM_TOKENS)
                ]
            )
        ).alias("t"),
    ).select("vec_id", "t.i", "t.tv")
    q = (
        tok.filter(F.col("vec_id") == MAXSIM_QUERY_ID)
        .select(F.col("i").alias("qi"), F.col("tv").alias("qv"))
    )
    pairs = (
        tok.filter(F.col("vec_id") != MAXSIM_QUERY_ID)
        .crossJoin(F.broadcast(q))
        .select(
            "vec_id",
            "qi",
            F.round(_cosine(F.col("qv"), F.col("tv")), 4).alias("c"),
        )
    )
    best = pairs.groupBy("vec_id", "qi").agg(F.max("c").alias("m"))
    scored = best.groupBy(F.col("vec_id").alias("doc_id")).agg(
        F.round(F.sum(F.col("m").cast("decimal(18,4)")).cast("double"), 4).alias(
            "maxsim"
        )
    )
    return scored.orderBy(F.desc("maxsim"), F.asc("doc_id")).limit(MAXSIM_TOPK)


PQ_M = 8  # subspaces
PQ_SUBDIM = _DIM // PQ_M  # dims per subspace
PQ_C = 16  # codewords per subspace (seeded from the 16 lowest vec_ids)
PQ_SCALE = 10000  # 1e-4 fixed point -> exact integer distances

_PQ_D2 = (
    "CAST(list_sum(list_transform(list_zip(sv, cv), "
    "z -> (z[1] - z[2]) * (z[1] - z[2]))) AS BIGINT)"
)


@query(
    "ann_product_quantized",
    oracle=f"""
    -- Product-quantized k-NN (Jegou et al. 2011): the 64-dim corpus
    -- splits into {PQ_M} subspaces of {PQ_SUBDIM} dims; each subspace
    -- has a {PQ_C}-codeword book (subvectors of the {PQ_C} lowest
    -- vec_ids — deterministic seeds, same discipline as the Lloyd
    -- kernel); every vector stores only its {PQ_M} codes.  Queries score
    -- candidates via the classic ADC lookup table: per (query, m, c)
    -- squared distance, summed over the candidate's codes.  All
    -- arithmetic is 1e-4 fixed-point integer, so both engines agree
    -- bit-for-bit.
    WITH vecs AS (
      SELECT vec_id,
             list_transform(embedding, x -> CAST(round(CAST(x AS DOUBLE) * {PQ_SCALE}) AS BIGINT)) AS v
      FROM embeddings),
    sub AS (
      SELECT vec_id, m, list_slice(v, m * {PQ_SUBDIM} + 1, (m + 1) * {PQ_SUBDIM}) AS sv
      FROM vecs, (SELECT unnest(range({PQ_M})) AS m)),
    cw AS (
      SELECT ROW_NUMBER() OVER (ORDER BY vec_id) - 1 AS c, vec_id
      FROM vecs ORDER BY vec_id LIMIT {PQ_C}),
    cb AS (
      SELECT s.m, cw.c, s.sv AS cv FROM sub s JOIN cw ON s.vec_id = cw.vec_id),
    codes AS (
      SELECT vec_id, m, c FROM (
        SELECT s.vec_id, s.m, b.c,
               ROW_NUMBER() OVER (PARTITION BY s.vec_id, s.m
                                  ORDER BY {_PQ_D2}, b.c) AS rn
        FROM sub s JOIN cb b ON s.m = b.m) WHERE rn = 1),
    lut AS (
      SELECT q.vec_id AS query_id, b.m, b.c, {_PQ_D2} AS d2q
      FROM sub q JOIN cb b ON q.m = b.m
      WHERE q.vec_id < {N_QUERIES}),
    adc AS (
      SELECT l.query_id, co.vec_id AS cand_id, CAST(SUM(l.d2q) AS BIGINT) AS ad2
      FROM codes co JOIN lut l ON co.m = l.m AND co.c = l.c
      WHERE co.vec_id <> l.query_id
      GROUP BY 1, 2),
    ranked AS (
      SELECT query_id, cand_id, ad2,
             ROW_NUMBER() OVER (PARTITION BY query_id
                                ORDER BY ad2 ASC, cand_id ASC) AS rank
      FROM adc)
    SELECT query_id, cand_id,
           ROUND(ad2::DOUBLE / {PQ_SCALE * PQ_SCALE}, 4) AS approx_d2,
           rank
    FROM ranked WHERE rank <= {TOP_K}
    """,
)
def ann_product_quantized(spark, sf_dir):
    """Product-quantization k-NN (Jegou, Douze, Schmid, "Product
    quantization for nearest neighbor search", TPAMI 2011): vectors are
    stored as PQ_M codebook indices (here 8 codes ≈ 8 bytes vs 256 bytes
    float32 — a 32× compression); search computes, per query, a
    (PQ_M × PQ_C) table of subspace distances once, then scores every
    candidate with PQ_M table lookups + adds — no float math per
    candidate.

    Spark shape: the codebook (PQ_M*PQ_C rows) and the per-query LUT
    (N_QUERIES*PQ_M*PQ_C rows) are broadcast; candidates join the LUT on
    their stored (m, code) — a map-side broadcast join + partial-agg sum,
    zero shuffles of vector data.  At 100 TB the code table IS the index:
    8 bytes/vector means a 3 TB corpus of codes for 400B vectors, scanned
    at memory bandwidth; the exact-rerank stage (not needed at fixture
    scale) would fetch full vectors for only the top candidates.
    Distances are 1e-4 fixed-point integers (exact across engines)."""
    from pyspark.sql import Window

    (emb,) = load(spark, sf_dir, "embeddings")
    vecs = emb.select(
        "vec_id",
        F.transform(
            "embedding", lambda x: F.round(x.cast("double") * PQ_SCALE).cast("long")
        ).alias("v"),
    )
    ms = F.explode(F.array(*[F.lit(m) for m in range(PQ_M)])).alias("m")
    sub = vecs.select("vec_id", ms, F.col("v")).select(
        "vec_id",
        "m",
        F.slice("v", F.col("m") * PQ_SUBDIM + 1, PQ_SUBDIM).alias("sv"),
    )
    cw = (
        vecs.orderBy("vec_id")
        .limit(PQ_C)
        .withColumn("c", F.row_number().over(Window.orderBy("vec_id")) - 1)
        .select("c", "vec_id")
    )
    cb = sub.join(cw, "vec_id").select("m", "c", F.col("sv").alias("cv"))

    d2 = F.aggregate(
        F.zip_with("sv", "cv", lambda a, b: (a - b) * (a - b)),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )
    codes = (
        sub.join(F.broadcast(cb), "m")
        .withColumn("d2", d2)
        .groupBy("vec_id", "m")
        .agg(F.min(F.struct("d2", "c")).alias("mc"))
        .select("vec_id", "m", F.col("mc.c").alias("c"))
    )
    lut = (
        sub.filter(F.col("vec_id") < N_QUERIES)
        .withColumnRenamed("vec_id", "query_id")
        .join(F.broadcast(cb), "m")
        .withColumn("d2q", d2)
        .select("query_id", "m", "c", "d2q")
    )
    adc = (
        codes.join(F.broadcast(lut), ["m", "c"])
        .filter(F.col("vec_id") != F.col("query_id"))
        .groupBy("query_id", F.col("vec_id").alias("cand_id"))
        .agg(F.sum("d2q").cast("long").alias("ad2"))
    )
    w = Window.partitionBy("query_id").orderBy(F.asc("ad2"), F.asc("cand_id"))
    return (
        adc.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= TOP_K)
        .select(
            "query_id",
            "cand_id",
            F.round(F.col("ad2").cast("double") / (PQ_SCALE * PQ_SCALE), 4).alias(
                "approx_d2"
            ),
            "rank",
        )
    )
