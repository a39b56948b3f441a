"""Text analysis operators: language-ID, quality scoring, token counting,
document fingerprinting — the pre-training corpus hygiene pass, over the
``documents`` table.

Everything is built-in-function Spark (regexp / split / aggregate):
string kernels stay in Tungsten codegen, nothing row-at-a-time in Python.
All scoring formulas are integer/exact arithmetic (or rounded at fixed
points) so the DuckDB oracle reproduces them bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from pypgcdc_spark.functions.text_kernels import content_fingerprint
from pypgcdc_spark.queries import load, query

# Tiny deterministic stopword profiles (language-ID heuristic).
LANG_PROFILES = {
    "en": ["the", "and", "of", "to", "a"],
    "de": ["der", "die", "und", "das", "ist"],
    "es": ["el", "la", "de", "que", "los"],
    "fr": ["le", "la", "les", "des", "est"],
}
EN_STOPWORDS = ["the", "a", "and", "or", "of", "to", "in", "is"]


def _sql_count_tokens(words_expr: str, vocab: list) -> str:
    """DuckDB: count of tokens ∈ vocab via list_filter + list_contains."""
    vocab_sql = "[" + ", ".join(f"'{w}'" for w in vocab) + "]"
    return f"len(list_filter({words_expr}, x -> list_contains({vocab_sql}, x)))"


@query(
    "text_token_stats",
    oracle="""
    WITH t AS (SELECT lang, string_split(lower(text), ' ') AS w, length(text) AS n_chars
               FROM documents)
    SELECT lang,
           COUNT(*) AS n_docs,
           CAST(SUM(len(w)) AS BIGINT) AS total_tokens,
           CAST(SUM(n_chars) AS BIGINT) AS total_chars,
           ROUND(SUM(len(w))::DOUBLE / COUNT(*), 2) AS avg_tokens_per_doc
    FROM t GROUP BY lang
    """,
)
def text_token_stats(spark, sf_dir):
    """Whitespace token counting + corpus size stats per language tag."""
    (docs,) = load(spark, sf_dir, "documents")
    w = F.split(F.lower("text"), " ")
    return (
        docs.select("lang", F.size(w).alias("n_tok"), F.length("text").alias("n_chars"))
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tok").cast("long").alias("total_tokens"),
            F.sum("n_chars").cast("long").alias("total_chars"),
            F.round(F.sum("n_tok").cast("double") / F.count(F.lit(1)), 2).alias(
                "avg_tokens_per_doc"
            ),
        )
    )


@query(
    "text_bpe_ish_tokens",
    oracle=r"""
    -- BPE-ish subword proxy: word chunks + digit runs + punctuation marks,
    -- via the same regex in both engines.
    SELECT source,
           CAST(SUM(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]'))) AS BIGINT) AS n_bpe_tokens,
           COUNT(*) AS n_docs
    FROM documents GROUP BY source
    """,
)
def text_bpe_ish_tokens(spark, sf_dir):
    """Regex token counting (BPE-proxy token budget estimation)."""
    (docs,) = load(spark, sf_dir, "documents")
    toks = F.regexp_extract_all("text", F.lit(r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"), 0)
    return (
        docs.select("source", F.size(toks).alias("n"))
        .groupBy("source")
        .agg(F.sum("n").cast("long").alias("n_bpe_tokens"), F.count(F.lit(1)).alias("n_docs"))
    )


@query(
    "text_quality_score",
    oracle=f"""
    WITH t AS (
      SELECT doc_id, source, length(text) AS n_chars,
             string_split(lower(text), ' ') AS w
      FROM documents
    ), scored AS (
      SELECT doc_id, source,
             CASE WHEN n_chars BETWEEN 100 AND 5000 THEN 1 ELSE 0 END
           + CASE WHEN len(w) >= 20 THEN 1 ELSE 0 END
           + CASE WHEN {_sql_count_tokens('w', EN_STOPWORDS)} * 100 >= len(w) * 5 THEN 1 ELSE 0 END
           + CASE WHEN len(list_filter(w, x -> length(x) > 15)) = 0 THEN 1 ELSE 0 END
             AS quality
      FROM t
    )
    SELECT source, quality, COUNT(*) AS n_docs FROM scored GROUP BY 1, 2
    """,
)
def text_quality_score(spark, sf_dir):
    """Heuristic quality score 0-4 (length band, token count, stopword
    density ≥5%, no over-long garbage tokens) — integer point system, no
    float thresholds, so it is exactly reproducible."""
    (docs,) = load(spark, sf_dir, "documents")
    w = F.split(F.lower("text"), " ")
    n_chars = F.length("text")
    n_tok = F.size(w)
    stop_arr = F.array(*[F.lit(s) for s in EN_STOPWORDS])
    n_stop = F.size(F.filter(w, lambda x: F.array_contains(stop_arr, x)))
    n_long = F.size(F.filter(w, lambda x: F.length(x) > 15))
    quality = (
        F.when(n_chars.between(100, 5000), 1).otherwise(0)
        + F.when(n_tok >= 20, 1).otherwise(0)
        + F.when(n_stop * 100 >= n_tok * 5, 1).otherwise(0)
        + F.when(n_long == 0, 1).otherwise(0)
    )
    return (
        docs.select("source", quality.alias("quality"))
        .groupBy("source", "quality")
        .agg(F.count(F.lit(1)).alias("n_docs"))
    )


def _langid_sql() -> str:
    scores = []
    for lang, words in LANG_PROFILES.items():
        scores.append(f"{_sql_count_tokens('w', words)} AS score_{lang}")
    return f"""
    WITH t AS (SELECT doc_id, lang, string_split(lower(text), ' ') AS w FROM documents),
    s AS (SELECT doc_id, lang AS labeled_lang, {', '.join(scores)} FROM t),
    best AS (
      SELECT doc_id, labeled_lang,
             CASE GREATEST(score_en, score_de, score_es, score_fr)
                  WHEN 0 THEN 'unknown'
                  WHEN score_en THEN 'en'
                  WHEN score_de THEN 'de'
                  WHEN score_es THEN 'es'
                  ELSE 'fr' END AS predicted_lang
      FROM s
    )
    SELECT labeled_lang, predicted_lang, COUNT(*) AS n FROM best GROUP BY 1, 2
    """


@query("text_langid_confusion", oracle=_langid_sql())
def text_langid(spark, sf_dir):
    """n-gram-free language ID: stopword-profile hit counts with a fixed
    priority tiebreak (en > de > es > fr), confusion-matrix output against
    the labeled ``lang`` column."""
    (docs,) = load(spark, sf_dir, "documents")
    w = F.split(F.lower("text"), " ")
    d = docs.select("doc_id", F.col("lang").alias("labeled_lang"), w.alias("w"))
    def _contains_counter(arr):
        return lambda x: F.array_contains(arr, x)

    for lang, words in LANG_PROFILES.items():
        arr = F.array(*[F.lit(x) for x in words])
        d = d.withColumn(
            f"score_{lang}", F.size(F.filter("w", _contains_counter(arr)))
        )
    best = F.greatest(*[F.col(f"score_{lang}") for lang in LANG_PROFILES])
    predicted = (
        F.when(best == 0, "unknown")
        .when(F.col("score_en") == best, "en")
        .when(F.col("score_de") == best, "de")
        .when(F.col("score_es") == best, "es")
        .otherwise("fr")
    )
    return (
        d.select("labeled_lang", predicted.alias("predicted_lang"))
        .groupBy("labeled_lang", "predicted_lang")
        .agg(F.count(F.lit(1)).alias("n"))
    )


@query(
    "text_fingerprint",
    oracle="""
    -- Canonical content fingerprint: md5 over the sorted distinct token
    -- set (order/whitespace/duplication insensitive).
    WITH fp AS (
      SELECT doc_id, source,
             md5(array_to_string(list_sort(list_distinct(string_split(lower(text), ' '))), ' ')) AS fingerprint
      FROM documents
    )
    SELECT source, COUNT(*) AS n_docs, COUNT(DISTINCT fingerprint) AS n_distinct_fp
    FROM fp GROUP BY source
    """,
)
def text_fingerprint(spark, sf_dir):
    """Document fingerprinting: md5 over the sorted distinct token set —
    catches shuffled/re-whitespaced copies that exact dedup misses."""
    (docs,) = load(spark, sf_dir, "documents")
    fp = content_fingerprint(F.col("text"))
    return (
        docs.select("source", fp.alias("fingerprint"))
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.countDistinct("fingerprint").alias("n_distinct_fp"),
        )
    )


WINNOW_K = 8  # char k-gram length
WINNOW_W = 4  # winnowing window (pick min hash among W consecutive grams)


@query(
    "text_winnow_fingerprint",
    oracle=f"""
    -- Winnowing (rolling-hash) fingerprints: hash every {WINNOW_K}-char
    -- gram, keep the minimum in each window of {WINNOW_W} consecutive
    -- grams (classic local document fingerprinting); compare corpora by
    -- their distinct fingerprint counts + cross-doc collisions.
    WITH grams AS (
      SELECT doc_id,
             ('0x' || substr(md5(substr(lower(text), i + 1, {WINNOW_K})), 1, 8))::BIGINT AS h,
             i AS pos
      FROM documents, unnest(range(length(text) - {WINNOW_K})) t(i)
      WHERE length(text) > {WINNOW_K} AND doc_id < 200
    ),
    winnowed AS (
      SELECT DISTINCT doc_id,
             MIN(h) OVER (PARTITION BY doc_id ORDER BY pos
                          ROWS BETWEEN CURRENT ROW AND {WINNOW_W - 1} FOLLOWING) AS fp
      FROM grams
    )
    SELECT COUNT(*) AS n_fingerprints,
           COUNT(DISTINCT fp) AS n_distinct,
           COUNT(*) - COUNT(DISTINCT fp) AS n_cross_doc_hits
    FROM winnowed
    """,
)
def text_winnow_fingerprint(spark, sf_dir):
    """Rolling-hash (winnowing) fingerprints: per-position char-gram hash,
    window-min selection — the classic local fingerprinting scheme whose
    collisions localize *where* two documents overlap (vs whole-doc
    hashing).  Bounded to 200 docs: char-gram explosion is O(text bytes);
    the full-corpus variant would pre-filter with MinHash candidates."""
    (docs,) = load(spark, sf_dir, "documents")
    from pyspark.sql import Window

    from pypgcdc_spark.functions.text_kernels import hash32

    docs = docs.filter((F.length("text") > WINNOW_K) & (F.col("doc_id") < 200))
    grams = docs.select(
        "doc_id",
        F.posexplode(
            F.expr(
                f"transform(sequence(0, length(text) - {WINNOW_K + 1}), "
                f"i -> substr(lower(text), i + 1, {WINNOW_K}))"
            )
        ).alias("pos", "gram"),
    ).select("doc_id", "pos", hash32(F.col("gram")).alias("h"))
    w = (
        Window.partitionBy("doc_id")
        .orderBy("pos")
        .rowsBetween(Window.currentRow, WINNOW_W - 1)
    )
    winnowed = grams.select("doc_id", F.min("h").over(w).alias("fp")).distinct()
    return winnowed.agg(
        F.count(F.lit(1)).alias("n_fingerprints"),
        F.countDistinct("fp").alias("n_distinct"),
        (F.count(F.lit(1)) - F.countDistinct("fp")).alias("n_cross_doc_hits"),
    )


STOP_SHINGLE_MIN_DF = 2  # appears in ≥2 docs = shared/boilerplate content
STOP_SHINGLE_TOPK = 20


@query(
    "text_stop_shingles",
    oracle=f"""
    -- Corpus-level boilerplate mining: the most-shared 3-gram shingles by
    -- document frequency — the stop-shingle report that bounds the
    -- quadratic tail of shingle-join dedup at scale (the knob SCALE.md
    -- names for minhash/jaccard bucket occupancy: drop shingles above a
    -- df cap before the pair join).
    WITH words AS (SELECT doc_id, string_split(lower(text), ' ') AS w FROM documents),
    sh AS (SELECT DISTINCT doc_id, w[i+1] || ' ' || w[i+2] || ' ' || w[i+3] AS shingle
           FROM words, unnest(range(len(w) - 2)) AS t(i) WHERE len(w) >= 3),
    df AS (SELECT shingle, COUNT(*) AS df FROM sh GROUP BY shingle)
    SELECT shingle, CAST(df AS BIGINT) AS df
    FROM df
    WHERE df >= {STOP_SHINGLE_MIN_DF}
    ORDER BY df DESC, shingle ASC
    LIMIT {STOP_SHINGLE_TOPK}
    """,
)
def text_stop_shingles(spark, sf_dir):
    """Stop-shingle (boilerplate) mining: rank distinct 3-gram shingles by
    document frequency, keep the most-shared ones.  One shuffle on the
    shingle, TakeOrderedAndProject caps the result."""
    from pypgcdc_spark.operators.dedup import _shingles

    sh = _shingles(spark, sf_dir)
    return (
        sh.groupBy("shingle")
        .agg(F.count(F.lit(1)).alias("df"))
        .filter(F.col("df") >= STOP_SHINGLE_MIN_DF)
        .orderBy(F.desc("df"), F.asc("shingle"))
        .limit(STOP_SHINGLE_TOPK)
    )


VOCAB_TOPK = 25


@query(
    "text_vocab_topk",
    oracle=f"""
    -- Vocabulary statistics (tokenizer/vocab-building primitive): corpus
    -- term frequency + document frequency, deterministic top-k.
    WITH words AS (SELECT doc_id, unnest(string_split(lower(text), ' ')) AS word
                   FROM documents)
    SELECT word,
           CAST(COUNT(*) AS BIGINT) AS tf,
           CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS df
    FROM words
    GROUP BY word
    ORDER BY tf DESC, word ASC
    LIMIT {VOCAB_TOPK}
    """,
)
def text_vocab_topk(spark, sf_dir):
    """Corpus vocabulary top-k by term frequency (+ document frequency) —
    one shuffle on the token; TakeOrderedAndProject caps the result."""
    (docs,) = load(spark, sf_dir, "documents")
    words = docs.select(
        "doc_id", F.explode(F.split(F.lower("text"), " ")).alias("word")
    )
    return (
        words.groupBy("word")
        .agg(
            F.count(F.lit(1)).alias("tf"),
            F.countDistinct("doc_id").alias("df"),
        )
        .orderBy(F.desc("tf"), F.asc("word"))
        .limit(VOCAB_TOPK)
    )
