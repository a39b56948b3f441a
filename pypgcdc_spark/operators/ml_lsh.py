"""Spark ML LSH interop (BucketedRandomProjectionLSH / MinHashLSH).

The built-in MLlib LSH estimators, wired to the fixture embedding/document
columns — the off-the-shelf alternative to the hand-rolled LSH operators in
dedup.py / similarity.py.  Their hash families are JVM-seeded and
implementation-defined, so these are **rows-only** checks (no SQL oracle);
result *quality* is cross-validated in tests against the exact brute-force
operators (recall assertions), which IS the meaningful correctness notion
for approximate indexes.
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


def _vector_df(spark, sf_dir: str) -> DataFrame:
    from pyspark.ml.functions import array_to_vector

    (emb,) = load(spark, sf_dir, "embeddings")
    return emb.select(
        "vec_id",
        array_to_vector(F.col("embedding").cast("array<double>")).alias("features"),
    )


@query("ml_brp_lsh_neighbor_pairs", oracle=None)
def ml_brp_lsh_neighbor_pairs(spark, sf_dir):
    """BucketedRandomProjectionLSH approxSimilarityJoin: euclidean
    near-neighbor PAIRS below the radius — one row per pair with the exact
    distance MLlib computes on candidates, so the rows-only check records a
    meaningful pair count (round-2: was a 1-row summary).  Parameters are
    sized for ~certain recall at the fixture geometry (unit vectors:
    target pairs at d ≤ 1.18, per-table projection of the difference
    ≈ d/√dim ≈ 0.15 ≪ bucketLength → 16 tables miss ~nothing); recall vs
    the exact kernel is pinned in tests."""
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


@query("ml_minhash_lsh_jaccard_pairs", oracle=None)
def ml_minhash_lsh_jaccard_pairs(spark, sf_dir):
    """MinHashLSH over binarized token sets (documents → token indices via
    HashingTF) — MLlib's native near-dup path, emitting one row per pair at
    word-jaccard similarity ≥ {WORD_JACCARD_SIM} — the planted-duplicate
    band; the fixture's background word-jaccard is huge (p50 ≈ 0.62, docs
    share a small vocabulary), so only a high threshold means "near-dup"
    (round-2: was a 1-row summary).  The distance filter is exact (MLlib
    computes true jaccard on candidates); 32 single-hash tables make
    candidate recall at s ≥ 0.97 certain, so the row set matches the exact
    ground-truth pair set — pinned in tests."""
    from pyspark.ml.feature import HashingTF, MinHashLSH

    (docs,) = load(spark, sf_dir, "documents")
    toks = docs.select(
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
