"""Composed training-data curation pipeline — the end-to-end user story.

One DataFrame plan chaining the corpus-hygiene operators: quality gate →
near-duplicate removal (keep the lowest doc_id of every jaccard-connected
pair) → per-language yield report.  Demonstrates that the extension
operators compose as plain DataFrames (Catalyst fuses the whole thing into
one job; at 100 TB each stage is the linear-cost formulation documented in
SCALE.md).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from pypgcdc_spark.operators.dedup import JACCARD_THRESHOLD, _SHINGLES_SQL, dedup_ngram_jaccard
from pypgcdc_spark.operators.text import EN_STOPWORDS, _sql_count_tokens
from pypgcdc_spark.queries import load, query


@query(
    "pipeline_corpus_curation",
    oracle=f"""
    WITH {_SHINGLES_SQL},
    sizes AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id),
    inter AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS n_inter
              FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
              GROUP BY 1, 2),
    dup_losers AS (
      SELECT DISTINCT doc_b AS doc_id
      FROM inter JOIN sizes sa ON doc_a = sa.doc_id
                 JOIN sizes sb ON doc_b = sb.doc_id
      WHERE n_inter::DOUBLE / (sa.n + sb.n - n_inter) >= {JACCARD_THRESHOLD}
    ),
    scored AS (
      SELECT doc_id, lang, n_chars,
             string_split(lower(text), ' ') AS w
      FROM documents
    ),
    quality AS (
      SELECT doc_id, lang, n_chars,
             CASE WHEN n_chars BETWEEN 100 AND 5000 THEN 1 ELSE 0 END
           + CASE WHEN len(w) >= 20 THEN 1 ELSE 0 END
           + CASE WHEN {_sql_count_tokens('w', EN_STOPWORDS)} * 100 >= len(w) * 5 THEN 1 ELSE 0 END
           + CASE WHEN len(list_filter(w, x -> length(x) > 15)) = 0 THEN 1 ELSE 0 END AS q
      FROM scored
    )
    SELECT lang,
           COUNT(*) AS n_input,
           CAST(SUM(CASE WHEN q >= 2 THEN 1 ELSE 0 END) AS BIGINT) AS n_quality,
           CAST(SUM(CASE WHEN q >= 2 AND doc_id NOT IN (SELECT doc_id FROM dup_losers)
                    THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
           CAST(SUM(CASE WHEN q >= 2 AND doc_id NOT IN (SELECT doc_id FROM dup_losers)
                    THEN n_chars ELSE 0 END) AS BIGINT) AS kept_chars
    FROM quality GROUP BY lang
    """,
)
def pipeline_corpus_curation(spark, sf_dir):
    """Curation yield report per language: input docs → quality-gated →
    near-dup-pruned (the higher doc_id of every near-dup pair loses) →
    surviving corpus size."""
    (docs,) = load(spark, sf_dir, "documents")
    # near-dup losers: doc_b side of every pair above threshold
    losers = (
        dedup_ngram_jaccard(spark, sf_dir)
        .select(F.col("doc_b").alias("doc_id"))
        .distinct()
    )
    w = F.split(F.lower("text"), " ")
    stop_arr = F.array(*[F.lit(s) for s in EN_STOPWORDS])
    q = (
        F.when(F.col("n_chars").between(100, 5000), 1).otherwise(0)
        + F.when(F.size(w) >= 20, 1).otherwise(0)
        + F.when(
            F.size(F.filter(w, lambda x: F.array_contains(stop_arr, x))) * 100
            >= F.size(w) * 5,
            1,
        ).otherwise(0)
        + F.when(F.size(F.filter(w, lambda x: F.length(x) > 15)) == 0, 1).otherwise(0)
    )
    scored = docs.select("doc_id", "lang", "n_chars", q.alias("q")).join(
        F.broadcast(losers.withColumn("_dup", F.lit(True))), "doc_id", "left"
    )
    kept = (F.col("q") >= 2) & F.col("_dup").isNull()
    return scored.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_input"),
        F.sum(F.when(F.col("q") >= 2, 1).otherwise(0)).alias("n_quality"),
        F.sum(F.when(kept, 1).otherwise(0)).alias("n_kept"),
        F.sum(F.when(kept, F.col("n_chars")).otherwise(0)).alias("kept_chars"),
    )


SAMPLE_PCT = 10  # deterministic 10% sample


@query(
    "pipeline_deterministic_sample",
    oracle=f"""
    -- Reproducible hash-bucket sampling (the scale-safe way to sample a
    -- corpus: no RNG state, any engine/worker re-derives membership from
    -- the key alone). Bucket = first 16 bits of md5(doc_id) mod 100.
    WITH s AS (
      SELECT doc_id, source,
             ('0x' || substr(md5(doc_id::VARCHAR), 1, 4))::INTEGER % 100 AS bucket
      FROM documents
    )
    SELECT source,
           COUNT(*) AS n_total,
           CAST(SUM(CASE WHEN bucket < {SAMPLE_PCT} THEN 1 ELSE 0 END) AS BIGINT) AS n_sampled,
           CAST(SUM(CASE WHEN bucket < {SAMPLE_PCT} THEN doc_id ELSE 0 END) AS BIGINT) AS sampled_id_sum,
           MIN(CASE WHEN bucket < {SAMPLE_PCT} THEN doc_id END) AS first_sampled
    FROM s GROUP BY source
    """,
)
def pipeline_deterministic_sample(spark, sf_dir):
    """Deterministic hash-bucket sampling: md5(key) % 100 < pct.  Unlike
    ``df.sample()`` (RNG + partition-order dependent), membership is a pure
    function of the key — re-runnable, engine-independent, and exactly what
    a 100 TB pipeline needs for stable held-out splits.  The id-sum
    checksum pins that BOTH engines picked the same rows, not just the
    same number of rows."""
    (docs,) = load(spark, sf_dir, "documents")
    bucket = (
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 4), 16, 10)
        .cast("int") % 100
    )
    s = docs.select("doc_id", "source", bucket.alias("bucket"))
    in_sample = F.col("bucket") < SAMPLE_PCT
    return s.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_total"),
        F.sum(F.when(in_sample, 1).otherwise(0)).alias("n_sampled"),
        F.sum(F.when(in_sample, F.col("doc_id")).otherwise(0)).alias("sampled_id_sum"),
        F.min(F.when(in_sample, F.col("doc_id"))).alias("first_sampled"),
    )
