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
    return (
        docs.select("source", doc_quality_expr().alias("quality"))
        .groupBy("source", "quality")
        .agg(F.count(F.lit(1)).alias("n_docs"))
    )


def doc_quality_expr():
    """Per-doc integer quality score 0-4 as a Column (shared by the
    per-source rollup below and dedup's quality-aware canonical pick)."""
    w = F.split(F.lower("text"), " ")
    n_chars = F.length("text")
    n_tok = F.size(w)
    stop_arr = F.array(*[F.lit(s) for s in EN_STOPWORDS])
    n_stop = F.size(F.filter(w, lambda x: F.array_contains(stop_arr, x)))
    n_long = F.size(F.filter(w, lambda x: F.length(x) > 15))
    return (
        F.when(n_chars.between(100, 5000), 1).otherwise(0)
        + F.when(n_tok >= 20, 1).otherwise(0)
        + F.when(n_stop * 100 >= n_tok * 5, 1).otherwise(0)
        + F.when(n_long == 0, 1).otherwise(0)
    )


# SQL twin of doc_quality_expr, parameterized on the source CTE exposing
# (doc_id, n_chars, w).
QUALITY_CASE_SQL = f"""
             CASE WHEN n_chars BETWEEN 100 AND 5000 THEN 1 ELSE 0 END
           + CASE WHEN len(w) >= 20 THEN 1 ELSE 0 END
           + CASE WHEN {_sql_count_tokens('w', EN_STOPWORDS)} * 100 >= len(w) * 5 THEN 1 ELSE 0 END
           + CASE WHEN len(list_filter(w, x -> length(x) > 15)) = 0 THEN 1 ELSE 0 END
"""


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


# PII scrubbing: the fixture corpus contains no PII, so the query injects
# deterministic doc_id-derived PII (same expression in BOTH engines) and
# then proves the scrubber removes it — the redaction kernels are what's
# under test.  Patterns restricted to the regex subset Java and RE2 share
# (no lookaround, no backrefs).
PII_EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PII_PHONE_RE = r"\+?[0-9]{1,3}-[0-9]{3}-[0-9]{4}"
PII_IP_RE = r"\b([0-9]{1,3}\.){3}[0-9]{1,3}\b"


@query(
    "text_pii_scrub",
    oracle=f"""
    -- PII redaction audit: inject deterministic PII derived from doc_id
    -- (identical expression in the Spark query), scrub emails → phones →
    -- IPs, and report per-source counts + the residual-PII count (must be
    -- 0 — the scrubber's guarantee).
    WITH aug AS (
      SELECT source,
             text || ' contact user' || doc_id || '@example.com or +1-555-'
                  || lpad((doc_id % 10000)::VARCHAR, 4, '0') || ' from 10.'
                  || (doc_id % 256) || '.0.' || ((doc_id * 7) % 256) AS t
      FROM documents
    ), counted AS (
      SELECT source, t,
             len(regexp_extract_all(t, '{PII_EMAIL_RE}')) AS n_emails,
             len(regexp_extract_all(t, '{PII_PHONE_RE}')) AS n_phones,
             regexp_replace(
               regexp_replace(
                 regexp_replace(t, '{PII_EMAIL_RE}', '<EMAIL>', 'g'),
                 '{PII_PHONE_RE}', '<PHONE>', 'g'),
               '{PII_IP_RE}', '<IP>', 'g') AS scrubbed
      FROM aug
    )
    SELECT source,
           COUNT(*) AS n_docs,
           CAST(SUM(n_emails) AS BIGINT) AS n_emails,
           CAST(SUM(n_phones) AS BIGINT) AS n_phones,
           CAST(SUM(length(t) - length(scrubbed)) AS BIGINT) AS chars_redacted,
           CAST(SUM(CASE WHEN regexp_matches(scrubbed, '{PII_EMAIL_RE}')
                           OR regexp_matches(scrubbed, '{PII_PHONE_RE}')
                           OR regexp_matches(scrubbed, '{PII_IP_RE}')
                    THEN 1 ELSE 0 END) AS BIGINT) AS n_residual_pii
    FROM counted GROUP BY source
    """,
)
def text_pii_scrub(spark, sf_dir):
    """PII scrubbing (email/phone/IPv4 redaction) — regexp_replace chains
    entirely in Tungsten codegen; at 100 TB this is a pure map stage (no
    shuffle before the tiny per-source report).  The corpus has no PII, so
    deterministic doc_id-derived PII is injected first and the query
    certifies removal (n_residual_pii = 0)."""
    (docs,) = load(spark, sf_dir, "documents")
    aug = F.concat(
        F.col("text"),
        F.lit(" contact user"),
        F.col("doc_id").cast("string"),
        F.lit("@example.com or +1-555-"),
        F.lpad((F.col("doc_id") % 10000).cast("string"), 4, "0"),
        F.lit(" from 10."),
        (F.col("doc_id") % 256).cast("string"),
        F.lit(".0."),
        ((F.col("doc_id") * 7) % 256).cast("string"),
    )
    d = docs.select("source", aug.alias("t"))
    scrubbed = F.regexp_replace(
        F.regexp_replace(
            F.regexp_replace(F.col("t"), PII_EMAIL_RE, "<EMAIL>"),
            PII_PHONE_RE,
            "<PHONE>",
        ),
        PII_IP_RE,
        "<IP>",
    )
    residual = (
        F.col("scrubbed").rlike(PII_EMAIL_RE)
        | F.col("scrubbed").rlike(PII_PHONE_RE)
        | F.col("scrubbed").rlike(PII_IP_RE)
    )
    return (
        d.select(
            "source",
            "t",
            F.size(F.regexp_extract_all("t", F.lit(PII_EMAIL_RE), 0)).alias("e"),
            F.size(F.regexp_extract_all("t", F.lit(PII_PHONE_RE), 0)).alias("p"),
            scrubbed.alias("scrubbed"),
        )
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("e").cast("long").alias("n_emails"),
            F.sum("p").cast("long").alias("n_phones"),
            F.sum(F.length("t") - F.length("scrubbed")).cast("long").alias("chars_redacted"),
            F.sum(F.when(residual, 1).otherwise(0)).cast("long").alias("n_residual_pii"),
        )
    )


@query(
    "text_repetition_signals",
    oracle="""
    -- Gopher-style repetition signals: distinct-token ratio, duplicate
    -- bigram ratio, adjacent same-word runs, and an integer-exact
    -- "repetitive" flag (dup-bigram or top-word fraction > 20%).
    WITH t AS (
      SELECT lang, string_split(lower(text), ' ') AS w FROM documents
    ), m AS (
      SELECT lang,
             len(w) AS n_tok,
             len(list_distinct(w)) AS n_distinct,
             CASE WHEN len(w) >= 2
                  THEN len(w) - 1 ELSE 0 END AS n_big,
             CASE WHEN len(w) >= 2
                  THEN len(list_distinct(list_transform(range(1, len(w)),
                       i -> w[i] || ' ' || w[i + 1]))) ELSE 0 END AS n_big_distinct,
             CASE WHEN len(w) >= 2
                  THEN len(list_filter(range(1, len(w)), i -> w[i] = w[i + 1]))
                  ELSE 0 END AS n_adjacent,
             list_max(list_transform(list_distinct(w),
                  x -> len(list_filter(w, y -> y = x)))) AS top_tf
      FROM t
    )
    SELECT lang,
           COUNT(*) AS n_docs,
           CAST(SUM(n_tok) AS BIGINT) AS total_tokens,
           ROUND(SUM(n_distinct)::DOUBLE / SUM(n_tok), 4) AS distinct_token_ratio,
           ROUND(SUM(n_big - n_big_distinct)::DOUBLE / SUM(n_big), 4) AS dup_bigram_ratio,
           CAST(SUM(n_adjacent) AS BIGINT) AS adjacent_repeats,
           CAST(SUM(CASE WHEN (n_big - n_big_distinct) * 5 > n_big
                           OR top_tf * 5 > n_tok THEN 1 ELSE 0 END) AS BIGINT)
               AS n_repetitive
    FROM m GROUP BY lang
    """,
)
def text_repetition_signals(spark, sf_dir):
    """Repetition quality signals (Gopher-style): distinct-token ratio,
    duplicate-bigram ratio, adjacent same-word repeats, and an
    integer-exact repetitive flag (no float thresholds — ×5 integer
    comparisons reproduce exactly in the oracle).  All array kernels are
    built-in higher-order functions: a pure map stage + one tiny per-lang
    agg at any scale."""
    (docs,) = load(spark, sf_dir, "documents")
    d = docs.select("lang", F.split(F.lower("text"), " ").alias("w"))
    n_tok = F.size("w")
    has2 = n_tok >= 2
    # Spark SQL arrays are 0-indexed (DuckDB lists are 1-indexed — the
    # oracle's range bounds differ accordingly but cover the same pairs).
    bigrams = F.expr("transform(sequence(0, size(w) - 2), i -> w[i] || ' ' || w[i + 1])")
    adjacent = F.expr("size(filter(sequence(0, size(w) - 2), i -> w[i] = w[i + 1]))")
    # Top term frequency = longest equal-run in the SORTED token array:
    # O(n log n) + one linear fold, replacing the r4-era
    # distinct × filter double loop (O(distinct · n) — quadratic on
    # high-entropy documents; same value by definition).
    top_tf = F.expr(
        "aggregate(array_sort(w), "
        "named_struct('prev', cast(null as string), 'run', 0, 'best', 0), "
        "(a, x) -> named_struct("
        "  'prev', x, "
        "  'run', IF(a.prev <=> x, a.run + 1, 1), "
        "  'best', GREATEST(a.best, IF(a.prev <=> x, a.run + 1, 1))), "
        "a -> a.best)"
    )
    m = d.select(
        "lang",
        n_tok.alias("n_tok"),
        F.size(F.array_distinct("w")).alias("n_distinct"),
        F.when(has2, n_tok - 1).otherwise(0).alias("n_big"),
        F.when(has2, F.size(F.array_distinct(bigrams))).otherwise(0).alias("n_big_distinct"),
        F.when(has2, adjacent).otherwise(0).alias("n_adjacent"),
        top_tf.alias("top_tf"),
    )
    dup_big = F.col("n_big") - F.col("n_big_distinct")
    repetitive = (dup_big * 5 > F.col("n_big")) | (F.col("top_tf") * 5 > F.col("n_tok"))
    return m.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tok").cast("long").alias("total_tokens"),
        F.round(F.sum("n_distinct").cast("double") / F.sum("n_tok"), 4).alias(
            "distinct_token_ratio"
        ),
        F.round(F.sum(dup_big).cast("double") / F.sum("n_big"), 4).alias("dup_bigram_ratio"),
        F.sum("n_adjacent").cast("long").alias("adjacent_repeats"),
        F.sum(F.when(repetitive, 1).otherwise(0)).cast("long").alias("n_repetitive"),
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


SPAN_NGRAM = 8  # span granularity for exact-substring duplicate detection
SPAN_FLAG_PCT = 50  # flag docs with >= 50% duplicated spans


@query(
    "text_duplicate_spans",
    oracle=f"""
    -- Exact-substring dedup metric (RefinedWeb-style) at {SPAN_NGRAM}-gram
    -- granularity: a positional span is duplicated if its text occurs in
    -- >= 2 distinct documents; docs with >= {SPAN_FLAG_PCT}% duplicated
    -- spans are trim candidates.
    WITH words AS (SELECT doc_id, source, string_split(lower(text), ' ') AS w
                   FROM documents),
    spans AS (SELECT doc_id, source,
                     array_to_string(list_slice(w, i + 1, i + {SPAN_NGRAM}), ' ') AS s
              FROM words, unnest(range(len(w) - {SPAN_NGRAM - 1})) AS t(i)
              WHERE len(w) >= {SPAN_NGRAM}),
    df AS (SELECT s, COUNT(DISTINCT doc_id) AS n_docs_with FROM spans GROUP BY s),
    per_doc AS (
      SELECT p.doc_id, p.source,
             COUNT(*) AS n_spans,
             SUM(CASE WHEN d.n_docs_with >= 2 THEN 1 ELSE 0 END) AS n_dup
      FROM spans p JOIN df d ON p.s = d.s
      GROUP BY p.doc_id, p.source
    )
    SELECT source,
           COUNT(*) AS n_docs,
           CAST(SUM(n_spans) AS BIGINT) AS total_spans,
           CAST(SUM(n_dup) AS BIGINT) AS dup_spans,
           CAST(SUM(CASE WHEN n_dup * 100 >= n_spans * {SPAN_FLAG_PCT}
                    THEN 1 ELSE 0 END) AS BIGINT) AS n_flagged,
           CAST(SUM(CASE WHEN n_dup * 100 >= n_spans * {SPAN_FLAG_PCT}
                    THEN doc_id ELSE 0 END) AS BIGINT) AS flagged_id_sum
    FROM per_doc GROUP BY source
    """,
)
def text_duplicate_spans(spark, sf_dir, max_span_df=None):
    """Exact-substring duplicate-span metric ({SPAN_NGRAM}-gram
    granularity): per doc, the count of positional spans whose text
    appears in ≥ 2 distinct documents — the span-trimming criterion of
    exact-substring dedup (suffix-array ES-dedup approximated on n-gram
    boundaries; integer-exact {SPAN_FLAG_PCT}% flag).

    Scale: LINEAR plan — no self-join and no materialized span stream
    (r12; the previous shape checkpointed the exploded spans and joined
    them back against a corpus-sized df table).  One map-side-combining
    groupBy(s, doc_id) compresses within-doc repeats, then document
    frequency is a window ``count(*) over (partition by s)`` on the
    compressed pairs — each span's pairs land in one reducer exactly as
    the old df aggregation's final stage did, so skew exposure is
    unchanged while the join (and its whole-stream shuffle) disappears.
    ``max_span_df`` bounds the metric's skew tail: spans in more than
    this many documents (boilerplate headers/footers) are excluded
    entirely — numerator AND denominator — so a single viral span cannot
    concentrate a reducer.  Default ``None`` = exact output (the
    registered/oracle-checked configuration)."""
    from pyspark.sql import Window

    (docs,) = load(spark, sf_dir, "documents")
    d = docs.select(
        "doc_id", "source", F.split(F.lower("text"), " ").alias("w")
    ).filter(F.size("w") >= SPAN_NGRAM)
    spans = d.select(
        "doc_id",
        "source",
        F.explode(
            F.expr(
                f"transform(sequence(0, size(w) - {SPAN_NGRAM}), "
                f"i -> array_join(slice(w, i + 1, {SPAN_NGRAM}), ' '))"
            )
        ).alias("s"),
    )
    pairs = spans.groupBy("s", "doc_id").agg(
        F.any_value("source").alias("source"), F.count(F.lit(1)).alias("cnt")
    )
    # One row per (span, doc) ⇒ count over the span partition IS the
    # distinct-document frequency.
    pairs = pairs.withColumn(
        "n_docs_with", F.count(F.lit(1)).over(Window.partitionBy("s"))
    )
    if max_span_df is not None:
        pairs = pairs.filter(F.col("n_docs_with") <= max_span_df)
    per_doc = pairs.groupBy("doc_id", "source").agg(
        F.sum("cnt").alias("n_spans"),
        F.sum(F.when(F.col("n_docs_with") >= 2, F.col("cnt")).otherwise(0)).alias(
            "n_dup"
        ),
    )
    flagged = F.col("n_dup") * 100 >= F.col("n_spans") * SPAN_FLAG_PCT
    return per_doc.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_spans").cast("long").alias("total_spans"),
        F.sum("n_dup").cast("long").alias("dup_spans"),
        F.sum(F.when(flagged, 1).otherwise(0)).cast("long").alias("n_flagged"),
        F.sum(F.when(flagged, F.col("doc_id")).otherwise(0)).cast("long").alias(
            "flagged_id_sum"
        ),
    )


@query(
    "text_char_entropy",
    oracle="""
    -- Character-level Shannon entropy per document (low entropy = junk:
    -- repeated boilerplate, padding, single-char floods), aggregated per
    -- language.  H = log2(n) - (Σ n_c·log2(n_c))/n computed over exact
    -- integer char counts; the only float summation runs through
    -- ROUND→DECIMAL so both engines agree bit-for-bit.
    WITH chars AS (
      SELECT doc_id, lang, substr(text, t.i + 1, 1) AS ch
      FROM documents, UNNEST(range(length(text))) AS t(i)
    ),
    freq AS (
      SELECT doc_id, any_value(lang) AS lang, ch, COUNT(*) AS n_c
      FROM chars GROUP BY doc_id, ch
    ),
    per_doc AS (
      SELECT doc_id, any_value(lang) AS lang, SUM(n_c) AS n,
             CAST(SUM(CAST(ROUND(n_c * log2(n_c), 6) AS DECIMAL(18,6)))
                  AS DOUBLE) AS sum_nlogn
      FROM freq GROUP BY doc_id
    ),
    scored AS (
      SELECT lang, ROUND(log2(n) - sum_nlogn / n, 6) AS h FROM per_doc
    )
    SELECT lang,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           ROUND(CAST(SUM(CAST(ROUND(h, 6) AS DECIMAL(18,6))) AS DOUBLE)
                 / COUNT(*), 3) AS avg_entropy,
           ROUND(MIN(h), 3) AS min_entropy,
           ROUND(MAX(h), 3) AS max_entropy
    FROM scored GROUP BY lang
    """,
)
def text_char_entropy(spark, sf_dir):
    """Character-entropy quality signal (Shannon H over the per-doc char
    histogram) — the low-H tail is padding/boilerplate/single-char junk
    that length- and stopword-based filters miss.

    Plan: one explode over character positions, one groupBy(doc, char)
    for exact integer counts, one groupBy(doc) — all map-side-combining
    aggs sharing the doc_id partitioning; the entropy arithmetic itself
    is scalar.  At 100 TB swap the position-explode for a Pandas-UDF
    Counter per doc if the char blow-up dominates (same downstream
    shape); the oracle-shared formulation here stays all-JVM."""
    (docs,) = load(spark, sf_dir, "documents")
    n_parts = docs.sparkSession.sparkContext.defaultParallelism
    chars = (
        # Empty docs are excluded (as the oracle's range(length) does
        # implicitly): Spark's sequence(1, 0) infers step -1 and yields
        # [1, 0], which would emit two phantom empty-char rows.
        docs.filter(F.length("text") > 0)
        .repartition(n_parts, "doc_id")
        .select(
            "doc_id",
            "lang",
            F.explode(F.sequence(F.lit(1), F.length("text"))).alias("i"),
            F.col("text"),
        )
        .select("doc_id", "lang", F.expr("substr(text, i, 1)").alias("ch"))
    )
    freq = chars.groupBy("doc_id", "ch").agg(
        F.any_value("lang").alias("lang"), F.count(F.lit(1)).alias("n_c")
    )
    nlogn = F.round(F.col("n_c") * F.log2("n_c"), 6).cast("decimal(18,6)")
    per_doc = freq.groupBy("doc_id").agg(
        F.any_value("lang").alias("lang"),
        F.sum("n_c").alias("n"),
        F.sum(nlogn).cast("double").alias("sum_nlogn"),
    )
    scored = per_doc.select(
        "lang", F.round(F.log2("n") - F.col("sum_nlogn") / F.col("n"), 6).alias("h")
    )
    return scored.groupBy("lang").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.round(
            F.sum(F.round("h", 6).cast("decimal(18,6)")).cast("double")
            / F.count(F.lit(1)),
            3,
        ).alias("avg_entropy"),
        F.round(F.min("h"), 3).alias("min_entropy"),
        F.round(F.max("h"), 3).alias("max_entropy"),
    )


@query(
    "text_dup_span_removal",
    oracle=f"""
    -- The REMOVAL half of exact-substring dedup (Lee et al. 2022): the
    -- duplicated positional spans of text_duplicate_spans merge into
    -- maximal removal islands per document (gaps-and-islands: sort by
    -- span start, running max of prior ends, new island when the start
    -- clears prev_end+1), and the per-source accounting — affected
    -- docs, islands, removed words, removal ppm — is exact-integer.
    WITH words AS (SELECT doc_id, source, string_split(lower(text), ' ') AS w
                   FROM documents),
    spans AS (SELECT doc_id, source, i AS st, i + {SPAN_NGRAM - 1} AS en,
                     array_to_string(list_slice(w, i + 1, i + {SPAN_NGRAM}), ' ') AS s
              FROM words, unnest(range(len(w) - {SPAN_NGRAM - 1})) AS t(i)
              WHERE len(w) >= {SPAN_NGRAM}),
    df AS (SELECT s FROM (SELECT s, COUNT(DISTINCT doc_id) AS n FROM spans GROUP BY s)
           WHERE n >= 2),
    dup AS (SELECT p.doc_id, p.source, p.st, p.en
            FROM spans p JOIN df USING (s)),
    marked AS (
      SELECT doc_id, source, st, en,
             CASE WHEN MAX(en) OVER (PARTITION BY doc_id ORDER BY st
                                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                       IS NULL
                  OR st > MAX(en) OVER (PARTITION BY doc_id ORDER BY st
                                        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                          + 1
                  THEN 1 ELSE 0 END AS new_island
      FROM dup),
    islands AS (
      SELECT doc_id, source, island,
             MAX(en) - MIN(st) + 1 AS island_words
      FROM (SELECT *, SUM(new_island) OVER (PARTITION BY doc_id ORDER BY st
                                            ROWS UNBOUNDED PRECEDING) AS island
            FROM marked)
      GROUP BY doc_id, source, island),
    per_doc AS (
      SELECT doc_id, source,
             COUNT(*) AS n_islands,
             SUM(island_words) AS removed_words
      FROM islands GROUP BY doc_id, source),
    lens AS (SELECT doc_id, len(w) AS doc_words FROM words)
    SELECT p.source,
           CAST(COUNT(*) AS BIGINT) AS n_docs_affected,
           CAST(SUM(p.n_islands) AS BIGINT) AS n_islands,
           CAST(SUM(p.removed_words) AS BIGINT) AS removed_words,
           CAST(SUM(l.doc_words) AS BIGINT) AS affected_doc_words,
           CAST(FLOOR(1000000.0 * SUM(p.removed_words) / SUM(l.doc_words)) AS BIGINT)
               AS removal_ppm
    FROM per_doc p JOIN lens l ON p.doc_id = l.doc_id
    GROUP BY p.source
    """,
)
def text_dup_span_removal(spark, sf_dir):
    """Exact-substring removal accounting (the second half of Lee et
    al., "Deduplicating Training Data Makes Language Models Better",
    2022 — detection lives in text_duplicate_spans): duplicated
    positional spans merge into maximal removal islands per document via
    the gaps-and-islands window pattern (running max of prior span ends;
    a span starting past prev_end+1 opens a new island), then per-source
    totals — affected docs, islands, removed words, exact removal ppm.

    Scale shape: LINEAR plan — no self-join and no materialized span
    stream (r12; the previous shape checkpointed the exploded positional
    spans and semi-joined them against a duplicated-span set).  A span is
    duplicated iff it occurs in ≥ 2 distinct documents ⇔
    ``min(doc_id) ≠ max(doc_id)`` over its occurrences — two aggregates
    of ONE window spec, so the whole duplicate test is a single
    exchange-plus-sort on the span text (each span's occurrences land in
    one reducer exactly as the old df aggregation's final stage did:
    skew exposure unchanged, the join and its whole-stream shuffle
    gone).  The island merge then adds ONE window over each doc's dup
    spans — partitioned by doc_id, never global.  The output is the
    byte-budget answer a curation run needs: how much text does
    span-trimming actually delete, per source."""
    from pyspark.sql import Window

    (docs,) = load(spark, sf_dir, "documents")
    d = docs.select(
        "doc_id", "source", F.split(F.lower("text"), " ").alias("w")
    ).filter(F.size("w") >= SPAN_NGRAM)
    spans = d.select(
        "doc_id",
        "source",
        F.posexplode(
            F.expr(
                f"transform(sequence(0, size(w) - {SPAN_NGRAM}), "
                f"i -> array_join(slice(w, i + 1, {SPAN_NGRAM}), ' '))"
            )
        ).alias("st", "s"),
    ).withColumn("en", F.col("st") + (SPAN_NGRAM - 1))
    w_s = Window.partitionBy("s")
    dup = (
        spans.withColumn("mn", F.min("doc_id").over(w_s))
        .withColumn("mx", F.max("doc_id").over(w_s))
        .filter(F.col("mn") != F.col("mx"))
        .select("doc_id", "source", "st", "en")
    )
    prev = (
        Window.partitionBy("doc_id")
        .orderBy("st")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    run = Window.partitionBy("doc_id").orderBy("st").rowsBetween(
        Window.unboundedPreceding, 0
    )
    marked = dup.withColumn("prev_en", F.max("en").over(prev)).withColumn(
        "new_island",
        F.when(
            F.col("prev_en").isNull() | (F.col("st") > F.col("prev_en") + 1), 1
        ).otherwise(0),
    )
    islands = (
        marked.withColumn("island", F.sum("new_island").over(run))
        .groupBy("doc_id", "source", "island")
        .agg((F.max("en") - F.min("st") + 1).alias("island_words"))
    )
    per_doc = islands.groupBy("doc_id", "source").agg(
        F.count(F.lit(1)).alias("n_islands"),
        F.sum("island_words").alias("removed_words"),
    )
    # Per-doc word count WITHOUT a second tokenize of the corpus:
    # size(split(text, ' ')) = spaces + 1 exactly (split keeps empty
    # tokens, lower() preserves length), so byte-level length arithmetic
    # replaces the split+lower re-run.  The >= SPAN_NGRAM filter is
    # subsumed by the inner join (every per_doc entry has a span).
    lens = docs.select(
        "doc_id",
        (
            F.length("text") - F.length(F.translate("text", " ", "")) + 1
        ).alias("doc_words"),
    )
    return (
        per_doc.join(lens, "doc_id")
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs_affected"),
            F.sum("n_islands").cast("long").alias("n_islands"),
            F.sum("removed_words").cast("long").alias("removed_words"),
            F.sum("doc_words").cast("long").alias("affected_doc_words"),
            F.floor(
                F.lit(1000000.0) * F.sum("removed_words") / F.sum("doc_words")
            )
            .cast("long")
            .alias("removal_ppm"),
        )
    )


@query(
    "text_hashed_linear_classifier",
    oracle="""
    -- fastText/CCNet-style model-based quality filter, hashed-feature
    -- linear flavor: every word hashes into one of 1024 feature buckets;
    -- each bucket carries a fixed signed integer weight derived from the
    -- shared md5 convention; a document's score is the sum of its words'
    -- bucket weights and keep = score > 0.  Integer weights end-to-end,
    -- so both engines agree bit-for-bit (no sigmoid/float in the gate).
    WITH words AS (
      SELECT doc_id, source, unnest(string_split(lower(text), ' ')) AS w
      FROM documents
    ),
    feats AS (
      SELECT doc_id, source,
             (('0x' || substr(md5(w), 1, 8))::BIGINT % 1024) AS b
      FROM words
    ),
    scored AS (
      SELECT doc_id, source,
             SUM((('0x' || substr(md5('wt:' || b::VARCHAR), 1, 8))::BIGINT % 2001)
                 - 1000) AS score
      FROM feats GROUP BY doc_id, source
    )
    SELECT source,
           COUNT(*) AS n_docs,
           CAST(SUM(CASE WHEN score > 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_keep,
           CAST(SUM(score) AS BIGINT) AS total_score
    FROM scored GROUP BY source
    """,
)
def text_hashed_linear_classifier(spark, sf_dir):
    """Model-based quality filtering, the missing member of the filter
    family (Gopher rules / LM perplexity already covered): a hashed-
    feature LINEAR classifier — the fastText/CCNet production shape —
    scoring every document as Σ weight[hash(word) % 1024] with fixed
    signed integer weights, keep = score > 0.  In production the weight
    vector comes from training; here it derives from the engine's shared
    md5 convention so the DuckDB oracle scores identically — the plan
    shape (explode → in-row hash → two-level aggregate) is exactly the
    production one, with the 1024-float weight array a broadcast lookup.

    Scale note: one corpus scan, per-word work is in-row md5 + modulo
    (whole-stage codegen), the first aggregate collapses to one row per
    doc with map-side partials — the same cost class as token counting;
    no shuffle beyond the two aggregates."""
    (docs,) = load(spark, sf_dir, "documents")
    w = F.explode(F.split(F.lower("text"), " ")).alias("w")
    md5int = lambda c: F.conv(F.substring(F.md5(c), 1, 8), 16, 10).cast("long")
    feats = docs.select("doc_id", "source", w).select(
        "doc_id", "source", (md5int(F.col("w")) % 1024).alias("b")
    )
    weight = (md5int(F.concat(F.lit("wt:"), F.col("b").cast("string"))) % 2001) - 1000
    scored = feats.groupBy("doc_id", "source").agg(F.sum(weight).alias("score"))
    return scored.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum(F.when(F.col("score") > 0, 1).otherwise(0)).cast("long").alias("n_keep"),
        F.sum("score").cast("long").alias("total_score"),
    )
