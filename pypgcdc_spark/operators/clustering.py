"""Embedding clustering: fixed-point Lloyd's k-means for domain/topic
discovery over an embedding column — the unsupervised half of corpus
curation (cluster → inspect → reweight/drop), next to the supervised
quality scores in ``text.py``.

Determinism design: floating-point k-means is not reproducible across
engines (summation order changes argmin ties), so every quantity here is
**scaled-integer exact**: embeddings quantize to 1e-4 fixed point
(BIGINT), distances are exact integer sums of squares, centroid updates
round through double division of exactly-representable integer sums, and
argmin ties break on cluster id.  The DuckDB oracle replays the same two
unrolled Lloyd iterations bit-for-bit — an *iterative ML kernel inside
the correctness gate*, same discipline as graph_pagerank.

Scale shape (100 TB): k centroids are k×dim ints of driver-side
metadata (the codebook convention of ann_scalar_quantized), closed over
by an Arrow-batched numpy argmin kernel; assignment is pure map-side
(no vector ever shuffles, joins, or multiplies by k); the update is one
groupBy(cid) whose map-side partial aggregation shuffles only k×DIM
partial sums regardless of corpus size — the k-means analogue of the
rank-vector-only PageRank shuffle.  This is MLlib KMeans's own loop
shape (cache input, broadcast centroids, collect k new centroids per
iteration), with exact fixed-point arithmetic instead of floats.

Reference parity: no counterpart — the reference (pypgcdc) is a CDC
client; clustering is part of the training-data surface this engine adds
(SURVEY §0).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from pypgcdc_spark.queries import load, query

K = 8  # clusters
ITERS = 2  # Lloyd iterations (fixed → oracle-unrollable)
DIM = 64
SCALE = 10000  # 1e-4 fixed point


def _scaled(col):
    """embedding FLOAT[] → exact BIGINT fixed-point array."""
    return F.transform(col, lambda x: F.round(x.cast("double") * SCALE).cast("long"))


def _assign(vectors, cents):
    """(vec_id, v, label) × driver-side centroids → min-distance cluster
    (ties → smallest cid: numpy ``argmin`` returns the first minimum and
    the centroid matrix is built in cid order).

    ``cents`` is the k×DIM centroid table as plain Python ints (bounded
    metadata, the codebook convention of ann_scalar_quantized), closed
    over by an Arrow-batched pandas_udf that computes the full n×k
    squared-distance matrix in one int64 numpy broadcast — exact (scaled
    ints ≤2e4, so d2 ≤ DIM·(4e4)² ≪ 2⁶³) and an order of magnitude
    faster than the equivalent zip_with/aggregate expression, which the
    JVM evaluates as 512 interpreted lambda calls per row.  Map-side
    only: no vector row is ever multiplied by k, shuffled, or joined."""
    import numpy as np
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    cmat = np.array([cvec for _, cvec in sorted(cents)], dtype=np.int64)

    def np_argmin(v):
        if not len(v):
            return pd.DataFrame({"cid": pd.array([], dtype="int32"),
                                 "d2": pd.array([], dtype="int64")})
        mat = np.array(v.tolist(), dtype=np.int64)  # (n, DIM)
        d = ((mat[:, None, :] - cmat[None, :, :]) ** 2).sum(axis=2)  # (n, k)
        cid = d.argmin(axis=1)
        return pd.DataFrame(
            {"cid": cid.astype("int32"), "d2": d[np.arange(len(mat)), cid]}
        )

    # ``from __future__ import annotations`` stringifies hints, which
    # pandas_udf's signature inference rejects — attach real objects.
    np_argmin.__annotations__ = {"v": pd.Series, "return": pd.DataFrame}
    np_argmin = pandas_udf(np_argmin, "struct<cid:int,d2:bigint>")

    m = np_argmin("v")
    return vectors.select(
        "vec_id", "v", "label",
        m["cid"].alias("cid"), m["d2"].alias("d2"),
    )


def _update(assigned):
    """New centroids: per-dimension rounded mean of the scaled members.
    ONE groupBy(cid) with DIM column sums (map-side partial agg) — only
    k×DIM partial sums shuffle, never the vectors.

    Kept as the JVM-arithmetic reference implementation: the training
    loops call :func:`_train_update` (same integers, one map-only job);
    ``tests/test_clustering_kernel.py`` pins the two equal."""
    sums = assigned.groupBy("cid").agg(
        F.count(F.lit(1)).alias("n"),
        *[F.sum(F.element_at(F.col("v"), i + 1)).alias(f"s{i}") for i in range(DIM)],
    )
    rows = sums.select(
        "cid",
        F.array(
            *[
                F.round(F.col(f"s{i}").cast("double") / F.col("n")).cast("long")
                for i in range(DIM)
            ]
        ).alias("cvec"),
    ).collect()
    return sorted((r.cid, list(r.cvec)) for r in rows)


def _round_half_up(x: float, scale: int = 0):
    """Exact replica of ``F.round(double[, scale])``: Spark rounds
    DoubleType via ``BigDecimal.valueOf(x).setScale(scale, HALF_UP)``,
    i.e. half away from zero decided on the shortest round-trip DECIMAL
    rendering of the double.  Python's ``repr`` produces the same
    shortest round-trip string as Java's ``Double.toString``, so
    quantizing that Decimal with ROUND_HALF_UP reproduces the JVM result
    bit-for-bit (and the DuckDB oracle's ``round()``, with which the JVM
    form already hash-matches).  Returns int at scale 0 (the centroid
    use), float otherwise (``F.round(c, 3)``'s double)."""
    from decimal import ROUND_HALF_UP, Decimal

    q = Decimal(1).scaleb(-scale)
    v = Decimal(repr(x)).quantize(q, rounding=ROUND_HALF_UP)
    return float(v) if scale else int(v)


def _train_update(vectors, cents):
    """One Lloyd iteration as ONE map-only Spark job (no shuffle, no
    per-iteration JVM aggregate): the same Arrow kernel that computes the
    argmin assignment also folds the per-cluster partial sums inside the
    batch loop, so only (partitions × k) rows of ``(cid, n, Σv)`` come
    back — bounded metadata, the codebook convention.  The exact
    fixed-point arithmetic is unchanged: int64 sums (numpy partials,
    Python-int merge — both exact where the JVM long sum is), the same
    long→double division, and HALF_UP rounding replicated bit-for-bit
    (:func:`_round_half_up`).

    Motivation (r12, guide §1.2/§2.4): ``_update(_assign(...))`` planned
    a fresh 65-column HashAggregate every iteration — ~2 s of Catalyst +
    codegen compile per call at ANY data size, dominating training walls
    locally and pure driver latency at scale.  This shape plans one tiny
    ``MapInPandas`` instead; returns exactly ``_update(_assign(...))``."""
    import numpy as np
    import pandas as pd

    cmat = np.array([cvec for _, cvec in sorted(cents)], dtype=np.int64)

    def partials(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            mat = np.array(pdf["v"].tolist(), dtype=np.int64)  # (n, DIM)
            d = ((mat[:, None, :] - cmat[None, :, :]) ** 2).sum(axis=2)
            a = d.argmin(axis=1)  # ties -> first minimum == smallest cid
            present = np.unique(a)
            yield pd.DataFrame(
                {
                    "cid": present.astype("int32"),
                    "n": [int((a == j).sum()) for j in present],
                    "s": [
                        mat[a == j].sum(axis=0, dtype=np.int64).tolist()
                        for j in present
                    ],
                }
            )

    rows = (
        vectors.select("v")  # guide §4.1: ship only the column the kernel reads
        .mapInPandas(partials, "cid INT, n LONG, s ARRAY<BIGINT>")
        .collect()
    )
    acc: dict = {}
    for r in rows:
        n, s = acc.setdefault(r.cid, (0, [0] * len(r.s)))
        acc[r.cid] = (n + r.n, [a + b for a, b in zip(s, r.s)])
    # float(x) first: the JVM divides cast(sum AS double) by n, so the
    # long→double conversion must happen BEFORE the division here too.
    return [
        (cid, [_round_half_up(float(x) / float(n)) for x in s])
        for cid, (n, s) in sorted(acc.items())
    ]


# DuckDB fragments shared by the unrolled oracle iterations.
_SQL_DIST = (
    "CAST(list_sum(list_transform(list_zip(v, cvec), "
    "z -> (z[1] - z[2]) * (z[1] - z[2]))) AS BIGINT)"
)


def _sql_assign(vec_cte: str, cent_cte: str, out: str) -> str:
    return f"""
    {out} AS (
      SELECT vec_id, v, label, cid, d2 FROM (
        SELECT t.vec_id, t.v, t.label, c.cid, {_SQL_DIST} AS d2,
               ROW_NUMBER() OVER (PARTITION BY t.vec_id
                                  ORDER BY {_SQL_DIST}, c.cid) AS rn
        FROM {vec_cte} t CROSS JOIN {cent_cte} c
      ) WHERE rn = 1)"""


def _sql_update(assign_cte: str, out: str) -> str:
    return f"""
    {out} AS (
      SELECT cid, list(cval ORDER BY pos) AS cvec FROM (
        SELECT cid, pos,
               CAST(round(CAST(SUM(val) AS DOUBLE) / COUNT(*)) AS BIGINT) AS cval
        FROM (SELECT cid, unnest(v) AS val,
                     unnest(range(1, {DIM + 1})) AS pos
              FROM {assign_cte})
        GROUP BY cid, pos)
      GROUP BY cid)"""


# The full unrolled two-iteration Lloyd pipeline as a WITH-clause prefix —
# shared verbatim by the kmeans-domains oracle and the SemDeDup oracle so
# both replay the identical clustering.
_SQL_KMEANS_CTES = f"""
    -- Two unrolled fixed-point Lloyd iterations (k={K}, 1e-4 quantized,
    -- exact integer distances, ties → smallest cid).
    WITH vecs AS (
      SELECT vec_id, label,
             list_transform(embedding, x -> CAST(round(CAST(x AS DOUBLE) * {SCALE}) AS BIGINT)) AS v
      FROM embeddings),
    cent0 AS (
      SELECT ROW_NUMBER() OVER (ORDER BY vec_id) - 1 AS cid, v AS cvec
      FROM vecs ORDER BY vec_id LIMIT {K}),
    {_sql_assign('vecs', 'cent0', 'a0')},
    {_sql_update('a0', 'cent1')},
    {_sql_assign('vecs', 'cent1', 'a1')},
    {_sql_update('a1', 'cent2')},
    {_sql_assign('vecs', 'cent2', 'a2')}"""


def _final_assignment(vectors):
    """Seeds (K lowest vec_ids) → two Lloyd iterations → final assignment
    ``(vec_id, v, label, cid, d2)``.  Shared by embed_kmeans_domains and
    dedup_semantic_semdedup so both cluster identically."""
    # Materialize the scaled vectors once (MLlib's iterative-ML input
    # cache): each Lloyd iteration is an eager job, and without this every
    # one re-reads parquet and re-quantizes.  Memory-and-disk backed, so
    # at scale it degrades to a columnar spill, not an OOM.
    vectors = vectors.localCheckpoint(eager=True)
    # Seeds: the K lowest vec_ids, cids in vec_id order — K rows of
    # bounded metadata collected to the driver (codebook convention).
    seeds = vectors.orderBy("vec_id").limit(K).select("vec_id", "v").collect()
    cents = [
        (cid, list(r.v))
        for cid, r in enumerate(sorted(seeds, key=lambda r: r.vec_id))
    ]
    for _ in range(ITERS):
        # ONE map-only job per iteration: the Arrow kernel assigns AND
        # folds the k×DIM partial sums in the same pass (bounded collect,
        # exact arithmetic — see _train_update).
        cents = _train_update(vectors, cents)
    return _assign(vectors, cents)


@query(
    "embed_kmeans_domains",
    oracle=f"""
    -- Per-cluster size, mean squared distance, and label purity vs
    -- ground truth over the shared unrolled-Lloyd assignment.
    {_SQL_KMEANS_CTES},
    lab AS (
      SELECT cid, label, COUNT(*) AS n_lab FROM a2 GROUP BY cid, label),
    top_lab AS (
      SELECT cid, label AS top_label, n_lab FROM (
        SELECT cid, label, n_lab,
               ROW_NUMBER() OVER (PARTITION BY cid
                                  ORDER BY n_lab DESC, label ASC) AS rn
        FROM lab) WHERE rn = 1)
    SELECT a.cid AS cluster_id,
           COUNT(*) AS n_members,
           ROUND(CAST(SUM(a.d2) AS DOUBLE) / COUNT(*) / {SCALE * SCALE}, 4)
               AS avg_dist2,
           ANY_VALUE(t.top_label) AS top_label,
           ROUND(CAST(ANY_VALUE(t.n_lab) AS DOUBLE) / COUNT(*), 4) AS label_purity
    FROM a2 a JOIN top_lab t ON a.cid = t.cid
    GROUP BY a.cid
    """,
)
def embed_kmeans_domains(spark, sf_dir):
    """Domain discovery: k-means over the embedding corpus (k=8, two
    Lloyd iterations from the 8 lowest-vec_id seeds), reported as
    per-cluster size, mean squared distance (unscaled), and purity
    against the fixture's ground-truth labels."""
    (emb,) = load(spark, sf_dir, "embeddings")
    vectors = emb.select("vec_id", "label", _scaled(F.col("embedding")).alias("v"))
    final = _final_assignment(vectors)

    lab = final.groupBy("cid", "label").agg(F.count(F.lit(1)).alias("n_lab"))
    top = lab.groupBy("cid").agg(
        F.max(F.struct("n_lab", (-F.col("label")).alias("neg_label"))).alias("m")
    ).select(
        "cid", (-F.col("m.neg_label")).alias("top_label"), F.col("m.n_lab").alias("n_lab")
    )
    return (
        final.groupBy("cid")
        .agg(
            F.count(F.lit(1)).alias("n_members"),
            F.sum("d2").alias("sum_d2"),
        )
        .join(F.broadcast(top), "cid")
        .select(
            F.col("cid").alias("cluster_id"),
            "n_members",
            F.round(
                F.col("sum_d2").cast("double") / F.col("n_members") / (SCALE * SCALE), 4
            ).alias("avg_dist2"),
            "top_label",
            F.round(F.col("n_lab").cast("double") / F.col("n_members"), 4).alias(
                "label_purity"
            ),
        )
    )


SEM_TAU = 0.25  # SemDeDup cosine threshold (fixture planted near-dups ≈ 0.3-0.4)


@query(
    "dedup_semantic_semdedup",
    oracle=f"""
    -- SemDeDup (Abbas et al. 2023): cluster the embedding corpus, then
    -- prune semantic duplicates WITHIN each cluster — a vector is removed
    -- when another member of its cluster has cosine >= {SEM_TAU} and is
    -- "better kept" (closer to the centroid; ties -> lower vec_id).
    -- Clustering replays the shared unrolled-Lloyd CTEs bit-for-bit;
    -- cosines are computed over the same 1e-4 fixed-point integers on
    -- both engines, so the double arithmetic is bit-identical.
    {_SQL_KMEANS_CTES},
    norms AS (
      SELECT vec_id, cid, d2,
             CAST(list_sum(list_transform(v, x -> x * x)) AS BIGINT) AS n2, v
      FROM a2),
    prs AS (
      SELECT a.cid,
             CASE WHEN (a.d2 < b.d2) OR (a.d2 = b.d2 AND a.vec_id < b.vec_id)
                  THEN b.vec_id ELSE a.vec_id END AS removed
      FROM norms a JOIN norms b
        ON a.cid = b.cid AND a.vec_id < b.vec_id
      WHERE CAST(list_sum(list_transform(list_zip(a.v, b.v),
                                         z -> z[1] * z[2])) AS BIGINT)::DOUBLE
            / (sqrt(a.n2::DOUBLE) * sqrt(b.n2::DOUBLE)) >= {SEM_TAU}),
    rem AS (SELECT DISTINCT cid, removed FROM prs),
    per AS (SELECT cid, COUNT(*) AS n_removed,
                   CAST(SUM(removed) AS BIGINT) AS removed_id_sum
            FROM rem GROUP BY cid),
    mem AS (SELECT cid, COUNT(*) AS n_members FROM a2 GROUP BY cid)
    SELECT m.cid AS cluster_id,
           m.n_members,
           CAST(m.n_members - COALESCE(p.n_removed, 0) AS BIGINT) AS n_kept,
           CAST(COALESCE(p.n_removed, 0) AS BIGINT) AS n_removed,
           CAST(COALESCE(p.removed_id_sum, 0) AS BIGINT) AS removed_id_sum,
           ROUND(COALESCE(p.n_removed, 0)::DOUBLE / m.n_members, 4) AS removal_rate
    FROM mem m LEFT JOIN per p ON m.cid = p.cid
    """,
)
def dedup_semantic_semdedup(spark, sf_dir):
    """SemDeDup semantic pruning (Abbas et al., "SemDeDup: Data-efficient
    learning at web-scale through semantic deduplication", 2023): k-means
    the embedding corpus (shared fixed-point Lloyd kernel), then drop any
    vector that has an intra-cluster cosine neighbor >= SEM_TAU which is
    closer to the centroid (ties -> lower vec_id keeps).  Reported
    per-cluster: members, kept, removed, removed-id checksum, removal
    rate.

    Scale shape (100 TB): the pair join is an equi-join on cluster id —
    the clustering step is precisely what bounds the quadratic term (the
    paper scales k with corpus size so cluster width stays ~constant; at
    1000 executors each cluster's pair block is one shuffle partition).
    The centroid distance d2 needed for the keep rule falls out of the
    assignment for free.  No counterpart in the reference (CDC client,
    SURVEY §0) — this is training-data surface.
    """
    import numpy as np
    import pandas as pd

    (emb,) = load(spark, sf_dir, "embeddings")
    vectors = emb.select("vec_id", "label", _scaled(F.col("embedding")).alias("v"))
    # Assignment feeds both the pair pass and the membership counts:
    # checkpoint so the Lloyd pipeline runs once.
    final = _final_assignment(vectors).localCheckpoint(eager=True)

    def per_cluster(pdf):
        # One cluster = one pandas block (the paper scales k with corpus
        # size so cluster width stays ~constant — this IS the documented
        # shuffle partition).  Exact int64 Gram matrix: dots and norms
        # stay integers, cosine is the same IEEE-double sqrt/divide the
        # SQL oracle computes, so the >= TAU cut is bit-identical.
        ids = pdf["vec_id"].to_numpy(dtype=np.int64)
        d2 = pdf["d2"].to_numpy(dtype=np.int64)
        mat = np.array(pdf["v"].tolist(), dtype=np.int64)
        gram = mat @ mat.T
        n2 = np.sqrt(np.diag(gram).astype(np.float64))
        with np.errstate(divide="ignore", invalid="ignore"):
            cos = gram.astype(np.float64) / np.outer(n2, n2)
        iu, ju = np.triu_indices(len(ids), k=1)
        # a = lower vec_id of the pair, matching the SQL's a.vec_id <
        # b.vec_id join: rows arrive in arbitrary order, so order each
        # index pair by vec_id first.
        swap = ids[iu] > ids[ju]
        ai = np.where(swap, ju, iu)
        bi = np.where(swap, iu, ju)
        hit = np.nan_to_num(cos[ai, bi], nan=-1.0) >= SEM_TAU
        ai, bi = ai[hit], bi[hit]
        a_better = (d2[ai] < d2[bi]) | ((d2[ai] == d2[bi]) & (ids[ai] < ids[bi]))
        removed = np.unique(np.where(a_better, ids[bi], ids[ai]))
        return pd.DataFrame(
            {
                "cid": pdf["cid"].iloc[:1],
                "n_members": [len(ids)],
                "n_removed": [len(removed)],
                "removed_id_sum": [int(removed.sum()) if len(removed) else 0],
            }
        )

    per = final.groupBy("cid").applyInPandas(
        per_cluster,
        "cid int, n_members long, n_removed long, removed_id_sum long",
    )
    return (
        per.select(
            F.col("cid").alias("cluster_id"),
            "n_members",
            (F.col("n_members") - F.col("n_removed")).alias("n_kept"),
            "n_removed",
            "removed_id_sum",
            F.round(
                F.col("n_removed").cast("double") / F.col("n_members"), 4
            ).alias("removal_rate"),
        )
    )
