"""Spark ML LSH interop (BucketedRandomProjectionLSH / MinHashLSH).

The built-in MLlib LSH estimators, wired to the fixture embedding/document
columns — the off-the-shelf alternative to the hand-rolled LSH operators in
dedup.py / similarity.py.  The hash families are JVM-seeded and
implementation-defined, but ``approxSimilarityJoin`` re-computes the EXACT
distance on every candidate pair and filters by it, so with table counts
sized for ~certain recall at the fixture geometry the emitted pair set
equals the exact ground-truth pair set — which makes both queries fully
SQL-oracle-checkable (round 2: upgraded from rows-only; the oracle is the
brute-force exact pair join, verified equal at sf0.001 and sf0.01).
Result quality is additionally cross-validated in tests against the exact
brute-force operators (recall assertions).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from pypgcdc_spark.queries import load, query

# Fixture embeddings are unit-normalized (measured: background pair
# distance ≈ 1.42 = √2, planted near-dups ≥ 1.11), so the neighbor radius
# is the euclidean image of the cosine threshold: d = √(2 − 2·cos θ).
from pypgcdc_spark.operators.dedup import COSINE_NEARDUP

EUCLIDEAN_RADIUS = (2.0 - 2.0 * COSINE_NEARDUP) ** 0.5  # ≈ 1.183
WORD_JACCARD_SIM = 0.97  # planted dup pairs; background word-jaccard p50≈0.62

# Exact euclidean pair join — the ground truth BRP-LSH must reproduce.
_BRP_ORACLE = f"""
WITH v AS (
  SELECT vec_id, list_transform(embedding, x -> x::DOUBLE) AS vec
  FROM embeddings
), pairs AS (
  SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
         sqrt(list_sum(list_transform(list_zip(a.vec, b.vec),
              p -> (p[1] - p[2]) * (p[1] - p[2])))) AS dist
  FROM v a JOIN v b ON a.vec_id < b.vec_id
)
SELECT vec_a, vec_b, ROUND(dist, 2) AS dist FROM pairs
WHERE dist <= {EUCLIDEAN_RADIUS!r}
"""

# MLlib MinHashLSH is OR-amplified ONLY (one hash per table, no banding):
# with the fixture's high background jaccard (p50 ≈ 0.62) nearly every
# pair collides in some table, so its candidate set degenerates to
# all-pairs — measured >9 min at sf0.1 vs 2 s for the banded AND-OR
# dedup_minhash_lsh.  The interop query therefore runs on a deterministic
# corpus slice (no output change at the gate SFs, where all doc_ids are
# below the cap); the production near-dup path remains dedup_minhash_lsh.
MINHASH_DOC_CAP = 1000

# Exact word-jaccard pair join — the ground truth MinHashLSH must reproduce.
_MINHASH_ORACLE = f"""
WITH toks AS (
  SELECT doc_id, list_distinct(string_split(lower(text), ' ')) AS tokens
  FROM documents WHERE doc_id < {MINHASH_DOC_CAP}
), pairs AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
         len(list_intersect(a.tokens, b.tokens))::DOUBLE
           / len(list_distinct(list_concat(a.tokens, b.tokens))) AS sim
  FROM toks a JOIN toks b ON a.doc_id < b.doc_id
)
SELECT doc_a, doc_b, ROUND(sim, 3) AS jaccard_sim FROM pairs
WHERE sim >= {WORD_JACCARD_SIM} - 1e-9
"""


def _vector_df(spark, sf_dir: str) -> DataFrame:
    from pyspark.ml.functions import array_to_vector

    (emb,) = load(spark, sf_dir, "embeddings")
    return emb.select(
        "vec_id",
        array_to_vector(F.col("embedding").cast("array<double>")).alias("features"),
    )


@query("ml_brp_lsh_neighbor_pairs", oracle=_BRP_ORACLE)
def ml_brp_lsh_neighbor_pairs(spark, sf_dir):
    """BucketedRandomProjectionLSH approxSimilarityJoin: euclidean
    near-neighbor PAIRS below the radius — one row per pair with the exact
    distance MLlib computes on candidates.  Parameters are sized for
    ~certain recall at the fixture geometry (unit vectors: target pairs at
    d ≤ 1.18, per-table projection of the difference ≈ d/√dim ≈ 0.15 ≪
    bucketLength → 16 tables miss ~nothing), so the emitted set equals the
    exact pair join and the query is fully oracle-checked; recall vs the
    exact kernel is additionally pinned in tests."""
    from pyspark.ml.feature import BucketedRandomProjectionLSH

    df = _vector_df(spark, sf_dir)
    model = BucketedRandomProjectionLSH(
        inputCol="features", outputCol="hashes", bucketLength=0.5, numHashTables=16, seed=42
    ).fit(df)
    pairs = model.approxSimilarityJoin(df, df, EUCLIDEAN_RADIUS, distCol="dist").filter(
        F.col("datasetA.vec_id") < F.col("datasetB.vec_id")
    )
    return pairs.select(
        F.col("datasetA.vec_id").alias("vec_a"),
        F.col("datasetB.vec_id").alias("vec_b"),
        F.round("dist", 2).alias("dist"),
    )


@query("ml_minhash_lsh_jaccard_pairs", oracle=_MINHASH_ORACLE)
def ml_minhash_lsh_jaccard_pairs(spark, sf_dir):
    """MinHashLSH over binarized token sets (documents → token indices via
    HashingTF) — MLlib's native near-dup path, emitting one row per pair at
    word-jaccard similarity ≥ {WORD_JACCARD_SIM} — the planted-duplicate
    band; the fixture's background word-jaccard is huge (p50 ≈ 0.62, docs
    share a small vocabulary), so only a high threshold means "near-dup".
    The distance filter is exact (MLlib computes true jaccard on
    candidates); 32 single-hash tables make candidate recall at s ≥ 0.97
    certain, and the fixture vocabulary is far below HashingTF's 2^14
    buckets (no collisions), so the row set equals the exact word-jaccard
    pair join — the oracle — verified equal at sf0.001/sf0.01 and pinned
    in tests.  Runs on the doc_id < {MINHASH_DOC_CAP} slice: MLlib's LSH
    cannot AND-amplify (see MINHASH_DOC_CAP note), so unbounded input
    degenerates to all-pairs on this corpus — use dedup_minhash_lsh
    (banded) for the scale path."""
    from pyspark.ml.feature import HashingTF, MinHashLSH

    (docs,) = load(spark, sf_dir, "documents")
    toks = docs.filter(F.col("doc_id") < MINHASH_DOC_CAP).select(
        "doc_id", F.array_distinct(F.split(F.lower("text"), " ")).alias("tokens")
    )
    tf = HashingTF(inputCol="tokens", outputCol="features", numFeatures=1 << 14, binary=True)
    feats = tf.transform(toks)
    model = MinHashLSH(inputCol="features", outputCol="hashes", numHashTables=32, seed=42).fit(
        feats
    )
    pairs = model.approxSimilarityJoin(
        feats, feats, 1.0 - WORD_JACCARD_SIM + 1e-9, distCol="jaccard_dist"
    ).filter(F.col("datasetA.doc_id") < F.col("datasetB.doc_id"))
    return pairs.select(
        F.col("datasetA.doc_id").alias("doc_a"),
        F.col("datasetB.doc_id").alias("doc_b"),
        F.round(F.lit(1.0) - F.col("jaccard_dist"), 3).alias("jaccard_sim"),
    )
