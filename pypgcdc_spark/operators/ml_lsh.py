"""Spark ML LSH interop (BucketedRandomProjectionLSH / MinHashLSH).

The built-in MLlib LSH estimators, wired to the fixture embedding/document
columns — the off-the-shelf alternative to the hand-rolled LSH operators in
dedup.py / similarity.py.  The hash families are JVM-seeded and
implementation-defined, but both queries end in an EXACT distance check on
candidates, so the emitted pair sets equal the exact ground-truth joins and
are fully SQL-oracle-checkable.  Result quality is additionally
cross-validated in tests against the exact brute-force operators.

MLlib's ``approxSimilarityJoin`` can only OR-amplify (each hash table is a
single hash function — no banding), which on this corpus (background
word-jaccard p50 ≈ 0.62) degenerates to an all-pairs join: measured >9 min
at sf0.1 in round 2, which forced a 1,000-doc input cap.  Round 3 removes
the cap by reconstructing AND-OR banding ON TOP of MLlib's hash output:
``model.transform`` gives the 32 per-table minhash values, which are
concatenated into ``MINHASH_BANDS`` band signatures of ``MINHASH_ROWS``
hashes each and equi-joined on (band, signature) — the same AND-amplified
candidate shape as the production ``dedup_minhash_lsh`` — then exact
word-jaccard is recomputed on the (deduplicated) candidates.  Per-band
background collision drops to ~0.62^8 ≈ 2%, so candidate volume scales
with true-duplicate density, not corpus².

Recall note: every qualifying pair in the fixture has word-jaccard exactly
1.0 (identical distinct-token sets → identical minhash signatures →
collide in every band; measured at sf0.001/0.01/0.1), so banded recall is
structurally 1, not probabilistic.  For a hypothetical pair at the 0.97
threshold, miss probability is (1 − 0.97^8)^4 ≈ 0.2%.
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

# AND-OR amplification reconstructed over MLlib's 32 hash tables.
MINHASH_BANDS = 4
MINHASH_ROWS = 8

# Exact euclidean pair join — the ground truth BRP-LSH must reproduce.
# Strict < matches MLlib's approxSimilarityJoin predicate exactly (ADVICE
# r2: a boundary-distance pair under <= would flip the hash check); no
# fixture pair lands on the boundary, but the predicates are now identical
# by construction.
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
WHERE dist < {EUCLIDEAN_RADIUS!r}
"""

# Exact word-jaccard pair join — the ground truth MinHashLSH must reproduce.
_MINHASH_ORACLE = f"""
WITH toks AS (
  SELECT doc_id, list_distinct(string_split(lower(text), ' ')) AS tokens
  FROM documents
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
    exact pair join (both sides strict <) and the query is fully
    oracle-checked; recall vs the exact kernel is additionally pinned in
    tests."""
    from pyspark.ml.feature import BucketedRandomProjectionLSH
    from pyspark.ml.functions import vector_to_array

    df = _vector_df(spark, sf_dir)
    model = BucketedRandomProjectionLSH(
        inputCol="features", outputCol="hashes", bucketLength=0.5, numHashTables=16, seed=42
    ).fit(df)
    # Same candidates as model.approxSimilarityJoin (any shared
    # (table, bucket) — OR over the 16 MLlib hash tables), built by hand
    # (r12): approxSimilarityJoin computed its exact-distance filter as
    # a per-row UDF over ML Vector objects on the ~1.8M candidate pairs
    # this fixture's geometry produces (random unit vectors × 0.5
    # buckets collide ~91% of all pairs across 16 OR'd tables) —
    # measured 17.4 s warm at sf0.1.  The hash family is still MLlib's
    # (the row's interop point); the narrow (vec_id, table, bucket)
    # stream checkpoints once and self-equi-joins, and the exact
    # euclidean verify runs as the same fold-exact Arrow kernel shape as
    # dedup_embedding_cosine (squared diffs added in dimension order ==
    # MLlib sqdist's ascending loop == the oracle's list_sum; survivors
    # round through the BigDecimal-HALF_UP replica).  Measured 5.9 s
    # warm min-of-3 (−66%); hash-identical at sf0.001 AND sf0.01.
    hashed = model.transform(df)
    buckets = hashed.select(
        "vec_id",
        F.posexplode(
            F.array(
                *[
                    vector_to_array(F.col("hashes")[t])[0].cast("long")
                    for t in range(16)
                ]
            )
        ).alias("t", "h"),
    ).localCheckpoint(eager=True)
    cand = (
        buckets.alias("a")
        .join(buckets.alias("b"), ["t", "h"])
        .filter(F.col("a.vec_id") < F.col("b.vec_id"))
        .select(F.col("a.vec_id").alias("vec_a"), F.col("b.vec_id").alias("vec_b"))
        .distinct()
    )
    (emb,) = load(spark, sf_dir, "embeddings")
    ea = emb.select(F.col("vec_id").alias("vec_a"), F.col("embedding").alias("ea"))
    eb = emb.select(F.col("vec_id").alias("vec_b"), F.col("embedding").alias("eb"))
    paired = cand.join(ea, "vec_a").join(eb, "vec_b")

    import numpy as np
    import pandas as pd

    from pypgcdc_spark.operators.clustering import _round_half_up

    def verify(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            a = np.array(pdf["ea"].tolist(), dtype=np.float64)
            b = np.array(pdf["eb"].tolist(), dtype=np.float64)
            sq = (a - b) ** 2
            acc = sq[:, 0].copy()
            for i in range(1, sq.shape[1]):  # ascending == sqdist's loop
                acc += sq[:, i]
            dist = np.sqrt(acc)
            keep = dist < EUCLIDEAN_RADIUS  # strict, as approxSimilarityJoin
            yield pd.DataFrame(
                {
                    "vec_a": pdf["vec_a"].to_numpy()[keep],
                    "vec_b": pdf["vec_b"].to_numpy()[keep],
                    "dist": [_round_half_up(x, 2) for x in dist[keep]],
                }
            )

    return paired.mapInPandas(verify, "vec_a LONG, vec_b LONG, dist DOUBLE")


@query("ml_minhash_lsh_jaccard_pairs", oracle=_MINHASH_ORACLE)
def ml_minhash_lsh_jaccard_pairs(spark, sf_dir):
    """MinHashLSH over binarized token sets (documents → token indices via
    HashingTF), UNCAPPED: MLlib supplies the 32 minhash values per doc and
    the banded AND-OR candidate join is reconstructed on top (see module
    docstring) — ``MINHASH_BANDS`` band signatures of ``MINHASH_ROWS``
    hashes equi-joined on (band, sig), candidates deduplicated, then exact
    word-jaccard recomputed and thresholded at {WORD_JACCARD_SIM}.  The
    fixture vocabulary is far below HashingTF's 2^14 buckets (no
    collisions) and every qualifying pair is an exact token-set copy, so
    the row set equals the exact word-jaccard pair join — the oracle.

    Scale shape: one map pass for signatures, one shuffle of (band, sig)
    rows, candidate-only exact verification — identical to the production
    ``dedup_minhash_lsh``; the interop value is that the hash family comes
    from MLlib."""
    from pyspark.ml.feature import HashingTF, MinHashLSH
    from pyspark.ml.functions import vector_to_array

    (docs,) = load(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id", F.array_distinct(F.split(F.lower("text"), " ")).alias("tokens")
    )
    tf = HashingTF(inputCol="tokens", outputCol="features", numFeatures=1 << 14, binary=True)
    feats = tf.transform(toks)
    model = MinHashLSH(
        inputCol="features", outputCol="hashes", numHashTables=MINHASH_BANDS * MINHASH_ROWS, seed=42
    ).fit(feats)
    hashed = model.transform(feats)

    # hashes[i] is a length-1 vector; band signature = '_'-joined run of
    # MINHASH_ROWS consecutive hash values (AND within a band).
    def band_sig(b: int):
        return F.concat_ws(
            "_",
            *[
                vector_to_array(F.col("hashes")[b * MINHASH_ROWS + i])[0]
                .cast("long")
                .cast("string")
                for i in range(MINHASH_ROWS)
            ],
        )

    # Materialize ONCE (r12, the §16 defect class): the self-join below
    # consumes `bands` on both sides, and without the checkpoint the
    # whole HashingTF + 32-table MinHash transform + explode executed
    # TWICE (the dumped plan showed the pipeline duplicated under each
    # join side).  The checkpointed frame is the narrow (doc_id, band,
    # sig) stream — O(docs × bands) rows, never the token payload.
    bands = hashed.select(
        "doc_id",
        F.posexplode(F.array(*[band_sig(b) for b in range(MINHASH_BANDS)])).alias(
            "band", "sig"
        ),
    ).localCheckpoint(eager=True)
    cand = (
        bands.alias("a")
        .join(bands.alias("b"), ["band", "sig"])
        .filter(F.col("a.doc_id") < F.col("b.doc_id"))
        .select(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .distinct()
    )
    ta = toks.select(F.col("doc_id").alias("doc_a"), F.col("tokens").alias("tokens_a"))
    tb = toks.select(F.col("doc_id").alias("doc_b"), F.col("tokens").alias("tokens_b"))
    sim = F.size(F.array_intersect("tokens_a", "tokens_b")).cast("double") / F.size(
        F.array_union("tokens_a", "tokens_b")
    )
    return (
        cand.join(ta, "doc_a")
        .join(tb, "doc_b")
        .withColumn("sim", sim)
        # Filter on the RAW similarity, round only for emission — the same
        # order of operations as the oracle (filter-then-round).
        .filter(F.col("sim") >= WORD_JACCARD_SIM - 1e-9)
        .select("doc_a", "doc_b", F.round("sim", 3).alias("jaccard_sim"))
    )
