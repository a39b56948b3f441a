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

EUCLIDEAN_RADIUS = 9.0  # fixture vectors are ~N(0,1)^64: |a-b| ≈ sqrt(128)≈11.3


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
    near-neighbor pairs below a radius, summarized (pair count + distance
    stats).  Rows-only: the hash family is JVM-internal."""
    from pyspark.ml.feature import BucketedRandomProjectionLSH

    df = _vector_df(spark, sf_dir)
    model = BucketedRandomProjectionLSH(
        inputCol="features", outputCol="hashes", bucketLength=2.0, numHashTables=3, seed=42
    ).fit(df)
    pairs = model.approxSimilarityJoin(df, df, EUCLIDEAN_RADIUS, distCol="dist").filter(
        F.col("datasetA.vec_id") < F.col("datasetB.vec_id")
    )
    return pairs.agg(
        F.count(F.lit(1)).alias("n_pairs"),
        F.round(F.min("dist"), 3).alias("min_dist"),
        F.round(F.max("dist"), 3).alias("max_dist"),
    )


@query("ml_minhash_lsh_jaccard_pairs", oracle=None)
def ml_minhash_lsh_jaccard_pairs(spark, sf_dir):
    """MinHashLSH over binarized token sets (documents → token indices via
    HashingTF) — MLlib's native near-dup path; summarized pair stats."""
    from pyspark.ml.feature import HashingTF, MinHashLSH

    (docs,) = load(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id", F.array_distinct(F.split(F.lower("text"), " ")).alias("tokens")
    )
    tf = HashingTF(inputCol="tokens", outputCol="features", numFeatures=1 << 14, binary=True)
    feats = tf.transform(toks)
    model = MinHashLSH(inputCol="features", outputCol="hashes", numHashTables=4, seed=42).fit(
        feats
    )
    pairs = model.approxSimilarityJoin(feats, feats, 0.8, distCol="jaccard_dist").filter(
        F.col("datasetA.doc_id") < F.col("datasetB.doc_id")
    )
    return pairs.filter(F.col("jaccard_dist") <= 0.8).agg(
        F.count(F.lit(1)).alias("n_pairs"),
        F.round(F.min("jaccard_dist"), 3).alias("min_dist"),
    )
