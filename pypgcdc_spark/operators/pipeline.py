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


CTX_TOKENS = 512  # packing context budget (tokens per training sequence)
PACK_BUCKETS = 8  # parallel packing units (≫ at real scale: ~100k buckets)


@query(
    "pipeline_sequence_packing",
    oracle=f"""
    -- Training-sequence packing: documents are concatenated in a
    -- deterministic order and chopped into {CTX_TOKENS}-token context
    -- windows; a doc's bin is where its first token lands.  Packing is
    -- parallelized over md5 hash buckets — each bucket packs
    -- independently, so at 100 TB the window never sees more than one
    -- bucket's docs.  The checksum pins that both engines assigned every
    -- doc to the same bin.
    WITH t AS (
      SELECT doc_id,
             ('0x' || substr(md5(doc_id::VARCHAR), 1, 4))::INTEGER % {PACK_BUCKETS} AS bucket,
             len(string_split(lower(text), ' ')) AS n_tok
      FROM documents
    ), packed AS (
      SELECT bucket, doc_id, n_tok,
             COALESCE(SUM(n_tok) OVER (PARTITION BY bucket ORDER BY doc_id
                      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                 // {CTX_TOKENS} AS bin
      FROM t
    )
    SELECT bucket,
           COUNT(*) AS n_docs,
           CAST(SUM(n_tok) AS BIGINT) AS total_tokens,
           CAST(COUNT(DISTINCT bin) AS BIGINT) AS n_bins,
           CAST(SUM(bin * doc_id) AS BIGINT) AS packing_checksum
    FROM packed GROUP BY bucket
    """,
)
def pipeline_sequence_packing(spark, sf_dir):
    """Sequence packing for training: deterministic contiguous fill —
    within each md5(doc_id) hash bucket, docs are laid out in doc_id order
    and a doc starts in bin floor(tokens_before / {CTX_TOKENS}).  The
    running-sum window partitions by bucket, so packing is embarrassingly
    parallel (at scale: bucket count ≈ cluster cores × k keeps every
    window partition in memory; no global sort, no single-reducer
    bottleneck).  packing_checksum = Σ bin·doc_id pins identical
    assignments across engines."""
    from pyspark.sql import Window

    (docs,) = load(spark, sf_dir, "documents")
    bucket = (
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 4), 16, 10)
        .cast("int") % PACK_BUCKETS
    )
    t = docs.select(
        "doc_id",
        bucket.alias("bucket"),
        F.size(F.split(F.lower("text"), " ")).alias("n_tok"),
    )
    w = (
        Window.partitionBy("bucket")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    packed = t.withColumn(
        "bin", F.coalesce(F.sum("n_tok").over(w), F.lit(0)).cast("long") / F.lit(CTX_TOKENS)
    ).withColumn("bin", F.floor("bin"))
    return packed.groupBy("bucket").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tok").cast("long").alias("total_tokens"),
        F.countDistinct("bin").cast("long").alias("n_bins"),
        F.sum(F.col("bin") * F.col("doc_id")).cast("long").alias("packing_checksum"),
    )


DECON_NGRAM = 8  # word n-gram length for contamination matching
EVAL_MOD = 10  # held-out eval split: doc_id % 10 == EVAL_REM (deterministic;
EVAL_REM = 8  # this residue class hits planted exact-substring copies)


@query(
    "pipeline_decontamination",
    oracle=f"""
    -- Benchmark decontamination: flag training docs sharing any
    -- {DECON_NGRAM}-gram with the held-out eval split (doc_id % {EVAL_MOD} = {EVAL_REM})
    -- — the standard n-gram-overlap decontamination pass (e.g. GPT-3
    -- appendix C) as a shingle equi-join.
    WITH words AS (SELECT doc_id, string_split(lower(text), ' ') AS w FROM documents),
    sh AS (SELECT DISTINCT doc_id,
                  array_to_string(list_slice(w, i + 1, i + {DECON_NGRAM}), ' ') AS shingle
           FROM words, unnest(range(len(w) - {DECON_NGRAM - 1})) AS t(i)
           WHERE len(w) >= {DECON_NGRAM}),
    eval_sh AS (SELECT DISTINCT shingle FROM sh WHERE doc_id % {EVAL_MOD} = {EVAL_REM}),
    hits AS (
      SELECT s.doc_id, COUNT(*) AS n_hits
      FROM sh s JOIN eval_sh e ON s.shingle = e.shingle
      WHERE s.doc_id % {EVAL_MOD} <> {EVAL_REM}
      GROUP BY s.doc_id
    )
    SELECT d.source,
           COUNT(*) AS n_train,
           CAST(SUM(CASE WHEN h.n_hits IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
               AS n_contaminated,
           CAST(COALESCE(SUM(h.n_hits), 0) AS BIGINT) AS total_overlap_shingles,
           CAST(SUM(CASE WHEN h.n_hits IS NOT NULL THEN d.doc_id ELSE 0 END) AS BIGINT)
               AS contaminated_id_sum
    FROM documents d LEFT JOIN hits h ON d.doc_id = h.doc_id
    WHERE d.doc_id % {EVAL_MOD} <> {EVAL_REM}
    GROUP BY d.source
    """,
)
def pipeline_decontamination(spark, sf_dir):
    """Eval-set decontamination: training docs sharing any {DECON_NGRAM}-gram
    shingle with the (deterministic) eval split are flagged, with overlap
    counts and an id-sum checksum.  The eval shingle set is tiny →
    broadcast; the corpus side is one distinct-shingle pass — no
    all-pairs, shuffle ∝ corpus shingles, the same shape GPT-3/PaLM-style
    decontamination runs at full scale."""
    (docs,) = load(spark, sf_dir, "documents")
    w = F.split(F.lower("text"), " ")
    d = docs.select("doc_id", "source", w.alias("w")).filter(F.size("w") >= DECON_NGRAM)
    # NOT checkpointed: the two consumers below re-derive this subtree,
    # but materializing the corpus-shingle set (the operator's biggest
    # intermediate) measured ~35% SLOWER than recomputing it (r12 A/B
    # 1.41 → 1.87 s min) — recompute is two cheap scans; the checkpoint
    # is a full write+read of O(corpus · n-grams) strings.
    sh = d.select(
        "doc_id",
        F.explode(
            F.expr(
                f"transform(sequence(0, size(w) - {DECON_NGRAM}), "
                f"i -> array_join(slice(w, i + 1, {DECON_NGRAM}), ' '))"
            )
        ).alias("shingle"),
    ).distinct()
    is_eval = F.col("doc_id") % EVAL_MOD == EVAL_REM
    # eval_sh is bounded by the held-out eval suite — ≪ corpus by
    # construction (the decontamination premise) — so the hint stands.
    eval_sh = sh.filter(is_eval).select("shingle").distinct()
    hits = (
        sh.filter(~is_eval)
        .join(F.broadcast(eval_sh), "shingle")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_hits"))
    )
    train = docs.filter(F.col("doc_id") % EVAL_MOD != EVAL_REM)
    # No broadcast hint on hits: it is keyed by train doc_id — O(corpus)
    # in the worst case (statistics pick a broadcast while it is small).
    joined = train.join(hits, "doc_id", "left")
    return joined.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_train"),
        F.sum(F.when(F.col("n_hits").isNotNull(), 1).otherwise(0))
        .cast("long")
        .alias("n_contaminated"),
        F.coalesce(F.sum("n_hits"), F.lit(0)).cast("long").alias("total_overlap_shingles"),
        F.sum(F.when(F.col("n_hits").isNotNull(), F.col("doc_id")).otherwise(0))
        .cast("long")
        .alias("contaminated_id_sum"),
    )


LANG_QUOTA = 60  # per-language cap (domain-mix rebalancing)


@query(
    "pipeline_domain_mix",
    oracle=f"""
    -- Domain/language mix rebalancing: cap each language at {LANG_QUOTA}
    -- docs, selected in deterministic md5(doc_id) order (a reproducible
    -- uniform draw — no RNG, any engine re-derives the same subset).
    WITH ranked AS (
      SELECT lang, doc_id,
             ROW_NUMBER() OVER (PARTITION BY lang
                                ORDER BY md5(doc_id::VARCHAR), doc_id) AS rk
      FROM documents
    )
    SELECT lang,
           COUNT(*) AS n_total,
           CAST(SUM(CASE WHEN rk <= {LANG_QUOTA} THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
           CAST(SUM(CASE WHEN rk <= {LANG_QUOTA} THEN doc_id ELSE 0 END) AS BIGINT)
               AS kept_id_sum
    FROM ranked GROUP BY lang
    """,
)
def pipeline_domain_mix(spark, sf_dir):
    """Domain-mix rebalancing (quota sampling): keep ≤ {LANG_QUOTA} docs per
    language, chosen by rank in md5(doc_id) order — a reproducible uniform
    draw per group.  One shuffle on lang; at real scale the window is
    replaced per SCALE.md by a two-pass count + per-group hash-threshold
    select (no global per-group sort), but semantics — and this oracle —
    stay identical.  kept_id_sum pins identical row selection."""
    from pyspark.sql import Window

    (docs,) = load(spark, sf_dir, "documents")
    rk = F.row_number().over(
        Window.partitionBy("lang").orderBy(
            F.md5(F.col("doc_id").cast("string")), F.col("doc_id")
        )
    )
    ranked = docs.select("lang", "doc_id", rk.alias("rk"))
    kept = F.col("rk") <= LANG_QUOTA
    return ranked.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_total"),
        F.sum(F.when(kept, 1).otherwise(0)).cast("long").alias("n_kept"),
        F.sum(F.when(kept, F.col("doc_id")).otherwise(0)).cast("long").alias("kept_id_sum"),
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


@query(
    "pipeline_doc_chunking",
    oracle="""
    -- Training-window chunking: 256-char windows at stride 192 (64-char
    -- overlap), entirely in-row — chunk boundaries, per-chunk md5s, and
    -- an order-sensitive chunk-chain fingerprint per document.
    SELECT doc_id,
           len(chunks) AS n_chunks,
           length(substr(text, 1 + (len(chunks) - 1) * 192, 256))
               AS last_chunk_len,
           md5(array_to_string(chunks, '|')) AS chunk_fingerprint
    FROM (
      SELECT doc_id, text,
             list_transform(range(1, length(text) + 1, 192),
                            p -> md5(substr(text, p, 256))) AS chunks
      FROM documents WHERE length(text) > 0)
    """,
)
def pipeline_doc_chunking(spark, sf_dir):
    """Sliding-window document chunking — the step that turns variable-
    length documents into fixed-size training windows (256 chars, stride
    192) before packing.  Emits per-doc chunk counts, the ragged last
    window's length, and an order-sensitive fingerprint of the chunk
    chain (md5 of the per-chunk md5s in position order).

    Scale shape: ZERO shuffles — chunk positions, windows, and the chain
    fingerprint are all higher-order array expressions evaluated in-row
    inside codegen (sequence → transform → concat), so chunking 100 TB
    is a pure map over the corpus; downstream packing reuses the
    existing single-window shuffle.  Map-only plan pinned in
    tests/test_plans.py."""
    (docs,) = load(spark, sf_dir, "documents")
    chunks = F.expr(
        "transform(sequence(1, length(text), 192), p -> md5(substring(text, p, 256)))"
    )
    return (
        docs.filter(F.length("text") > 0)
        .withColumn("chunks", chunks)
        .select(
            "doc_id",
            F.size("chunks").cast("long").alias("n_chunks"),
            F.length(
                F.expr("substring(text, 1 + (size(chunks) - 1) * 192, 256)")
            ).cast("long").alias("last_chunk_len"),
            F.md5(F.concat_ws("|", "chunks")).alias("chunk_fingerprint"),
        )
    )


MIX_ALPHA = 0.7  # temperature exponent (multilingual sampling standard)
MIX_BUDGET = 200  # total sampled docs


@query(
    "pipeline_temperature_sampling",
    oracle=f"""
    -- Temperature-based mixture sampling: per-source targets follow
    -- n^{MIX_ALPHA} (upsampling the tail, damping the head — the standard
    -- multilingual/multi-domain LLM recipe), selection is md5-ranked so
    -- any engine re-derives the same document subset.
    WITH counts AS (SELECT source, COUNT(*) AS n_total FROM documents GROUP BY source),
    wts AS (SELECT source, n_total,
                   ROUND(POWER(n_total, {MIX_ALPHA})
                         / SUM(POWER(n_total, {MIX_ALPHA})) OVER (), 6) AS weight
            FROM counts),
    tgt AS (SELECT source, n_total, weight,
                   CAST(ROUND({MIX_BUDGET} * weight) AS BIGINT) AS n_target
            FROM wts),
    ranked AS (
      SELECT source, doc_id,
             ROW_NUMBER() OVER (PARTITION BY source
                                ORDER BY md5(doc_id::VARCHAR), doc_id) AS rk
      FROM documents)
    SELECT t.source, t.n_total, t.weight, t.n_target,
           CAST(SUM(CASE WHEN r.rk <= t.n_target THEN 1 ELSE 0 END) AS BIGINT)
               AS n_sampled,
           CAST(SUM(CASE WHEN r.rk <= t.n_target THEN r.doc_id ELSE 0 END) AS BIGINT)
               AS sampled_id_sum
    FROM ranked r JOIN tgt t ON r.source = t.source
    GROUP BY t.source, t.n_total, t.weight, t.n_target
    """,
)
def pipeline_temperature_sampling(spark, sf_dir):
    """Temperature sampling: per-source draw targets proportional to
    n^0.7 — the mixture-rebalancing recipe that keeps low-resource
    sources visible without letting head domains dominate.  Selection is
    a deterministic md5-ranked draw (id-sum checksum pins exactly WHICH
    documents were taken, not just how many), the same reproducibility
    discipline as pipeline_domain_mix's fixed quotas.

    Scale shape: weights come from one map-side-combined count per
    source (a handful of rows broadcast back), the draw is one window
    over the source partitioning — a single shuffle of (source, doc_id)
    pairs, never of document payloads."""
    from pyspark.sql import Window

    (docs,) = load(spark, sf_dir, "documents")
    counts = docs.groupBy("source").agg(F.count(F.lit(1)).alias("n_total"))
    wts = counts.select(
        "source",
        "n_total",
        F.round(
            F.pow("n_total", F.lit(MIX_ALPHA))
            / F.sum(F.pow("n_total", F.lit(MIX_ALPHA))).over(
                Window.partitionBy()
            ),
            6,
        ).alias("weight"),
    )
    tgt = wts.withColumn(
        "n_target", F.round(F.lit(MIX_BUDGET) * F.col("weight")).cast("long")
    )
    w = Window.partitionBy("source").orderBy(
        F.md5(F.col("doc_id").cast("string")), "doc_id"
    )
    ranked = docs.select(
        "source", "doc_id", F.row_number().over(w).alias("rk")
    )
    keep = F.col("rk") <= F.col("n_target")
    return (
        ranked.join(F.broadcast(tgt), "source")
        .groupBy("source", "n_total", "weight", "n_target")
        .agg(
            F.sum(F.when(keep, 1).otherwise(0)).cast("long").alias("n_sampled"),
            F.sum(F.when(keep, F.col("doc_id")).otherwise(0))
            .cast("long")
            .alias("sampled_id_sum"),
        )
    )


DSIR_BUCKETS = 256  # hashed n-gram feature space (Xie et al. 2023 use 10k)
DSIR_KEEP = 0.2  # per-source selection quota


@query(
    "pipeline_dsir_importance",
    oracle=f"""
    -- DSIR (Xie et al. 2023, "Data Selection for Language Models via
    -- Importance Resampling"): hashed-unigram bucket counts give a
    -- target (lang='en') and a raw distribution; each document scores
    -- the sum of its bucket counts times the smoothed log likelihood
    -- ratio, and the top {DSIR_KEEP:.0%} per source is selected.
    -- Determinism: the log-ratio is rounded to 6 decimals and carried
    -- as DECIMAL(18,6), so per-doc weights are exact decimal sums
    -- regardless of partitioning.
    WITH wsplit AS (
      SELECT doc_id, source, lang, unnest(string_split(lower(text), ' ')) AS w
      FROM documents),
    tok AS (
      SELECT doc_id, source,
             ('0x' || substr(md5(w), 1, 4))::INTEGER % {DSIR_BUCKETS} AS bucket,
             CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS is_t
      FROM wsplit WHERE w <> ''),
    bc AS (SELECT bucket, SUM(is_t) AS c_t, COUNT(*) AS c_r FROM tok GROUP BY bucket),
    tot AS (SELECT SUM(is_t) AS n_t, COUNT(*) AS n_r FROM tok),
    lr AS (
      SELECT bucket,
             CAST(round(ln((c_t + 1)::DOUBLE / (n_t + {DSIR_BUCKETS}))
                      - ln((c_r + 1)::DOUBLE / (n_r + {DSIR_BUCKETS})), 6)
                  AS DECIMAL(18,6)) AS lr
      FROM bc, tot),
    db AS (SELECT doc_id, bucket, COUNT(*) AS n FROM tok GROUP BY 1, 2),
    wt AS (
      SELECT d.doc_id, d.source,
             COALESCE(SUM(db.n * lr.lr), 0) AS wt
      FROM documents d
      LEFT JOIN db ON d.doc_id = db.doc_id
      LEFT JOIN lr ON db.bucket = lr.bucket
      GROUP BY d.doc_id, d.source),
    rk AS (
      SELECT doc_id, source, wt,
             ROW_NUMBER() OVER (PARTITION BY source
                                ORDER BY wt DESC, doc_id) AS rn,
             COUNT(*) OVER (PARTITION BY source) AS n_src
      FROM wt),
    sel AS (
      SELECT doc_id, source, wt,
             CASE WHEN rn <= greatest(1, CAST(floor(n_src * {DSIR_KEEP}) AS BIGINT))
                  THEN 1 ELSE 0 END AS s
      FROM rk)
    SELECT source,
           COUNT(*) AS n_docs,
           CAST(SUM(s) AS BIGINT) AS n_selected,
           ROUND(SUM(CASE WHEN s = 1 THEN wt ELSE 0 END)::DOUBLE, 4)
               AS sel_weight_sum,
           CAST(SUM(CASE WHEN s = 1 THEN doc_id ELSE 0 END) AS BIGINT) AS sel_id_sum
    FROM sel GROUP BY source
    """,
)
def pipeline_dsir_importance(spark, sf_dir):
    """DSIR-style importance-weighted data selection (Xie et al. 2023):
    words hash into DSIR_BUCKETS md5 buckets; the target distribution is
    the lang='en' slice, the raw distribution is the whole corpus; each
    doc's weight is sum(count_b * round(log(p_t(b)/p_r(b)), 6)) with
    add-1 smoothing, carried as exact DECIMAL so partial sums commute;
    the top 20% per source by weight (ties -> lower doc_id) is selected.

    Scale shape (100 TB): ONE linear token scan into a (doc, bucket)
    aggregate that is pre-combined map-side and materialized once; the
    bucket counts (DSIR_BUCKETS rows — a broadcast) and the global
    totals derive from it, and a per-source quota window — the same
    bounded-partition window discipline as pipeline_domain_mix.  No
    global sort; no vector or model state.  Reference has no counterpart
    (CDC client, SURVEY §0)."""
    from pyspark.sql import Window

    (docs,) = load(spark, sf_dir, "documents")
    words = docs.select(
        "doc_id",
        "source",
        "lang",
        F.explode(F.split(F.lower("text"), " ")).alias("w"),
    ).filter(F.col("w") != "")
    tok = words.select(
        "doc_id",
        "source",
        (
            F.conv(F.substring(F.md5("w"), 1, 4), 16, 10).cast("int") % DSIR_BUCKETS
        ).alias("bucket"),
        F.when(F.col("lang") == "en", 1).otherwise(0).alias("is_t"),
    )
    # ONE corpus tokenize pass: is_t is constant per doc, so the
    # (doc, bucket) count table can carry it, and the bucket counts
    # (c_t = Σ n·is_t, c_r = Σ n — identical integers to the token-level
    # sums) and the global totals both derive from the checkpointed
    # aggregate instead of re-running the explode subtree three times
    # (r12 plan sweep).  db2 is O(docs × buckets-per-doc) ≤ docs×256 —
    # far below the token stream it replaces.
    db2 = (
        tok.groupBy("doc_id", "bucket")
        .agg(F.count(F.lit(1)).alias("n"), F.max("is_t").alias("is_t"))
        .localCheckpoint(eager=True)
    )
    bc = db2.groupBy("bucket").agg(
        F.sum(F.col("n") * F.col("is_t")).alias("c_t"), F.sum("n").alias("c_r")
    )
    tot = db2.agg(
        F.sum(F.col("n") * F.col("is_t")).alias("n_t"), F.sum("n").alias("n_r")
    )
    lr = bc.crossJoin(F.broadcast(tot)).select(
        "bucket",
        F.round(
            F.log((F.col("c_t") + 1).cast("double") / (F.col("n_t") + DSIR_BUCKETS))
            - F.log((F.col("c_r") + 1).cast("double") / (F.col("n_r") + DSIR_BUCKETS)),
            6,
        )
        .cast("decimal(18,6)")
        .alias("lr"),
    )
    db = db2.select("doc_id", "bucket", "n")
    wt = (
        docs.select("doc_id", "source")
        .join(db, "doc_id", "left")
        .join(F.broadcast(lr), "bucket", "left")
        .groupBy("doc_id", "source")
        .agg(
            F.coalesce(
                F.sum(F.col("n") * F.col("lr")), F.lit(0).cast("decimal(18,6)")
            ).alias("wt")
        )
    )
    wsrc = Window.partitionBy("source")
    rk = wt.select(
        "doc_id",
        "source",
        "wt",
        F.row_number().over(wsrc.orderBy(F.col("wt").desc(), "doc_id")).alias("rn"),
        F.count(F.lit(1)).over(wsrc).alias("n_src"),
    )
    sel = rk.withColumn(
        "s",
        F.when(
            F.col("rn")
            <= F.greatest(F.lit(1).cast("long"), F.floor(F.col("n_src") * DSIR_KEEP)),
            1,
        ).otherwise(0),
    )
    return sel.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("s").cast("long").alias("n_selected"),
        F.round(
            F.sum(F.when(F.col("s") == 1, F.col("wt")).otherwise(F.lit(0))).cast(
                "double"
            ),
            4,
        ).alias("sel_weight_sum"),
        F.sum(F.when(F.col("s") == 1, F.col("doc_id")).otherwise(F.lit(0)))
        .cast("long")
        .alias("sel_id_sum"),
    )


SPLIT_TRAIN, SPLIT_VAL = 80, 90  # percent boundaries of the md5 bucket


@query(
    "pipeline_train_val_test_split",
    oracle=f"""
    -- Deterministic stratified train/val/test split: every doc lands in
    -- exactly one split by md5(doc_id) bucket mod 100 (< {SPLIT_TRAIN}
    -- train, < {SPLIT_VAL} val, else test) — reproducible on any
    -- engine, stable under corpus growth (an existing doc never changes
    -- split when new docs arrive, unlike rank-based quotas).  Reported
    -- per (lang, split) with id checksums so the assignment itself is
    -- hash-gated.
    WITH assigned AS (
      SELECT doc_id, lang, n_chars,
             CASE WHEN ('0x' || substr(md5(doc_id::VARCHAR), 1, 4))::INTEGER % 100
                       < {SPLIT_TRAIN} THEN 'train'
                  WHEN ('0x' || substr(md5(doc_id::VARCHAR), 1, 4))::INTEGER % 100
                       < {SPLIT_VAL} THEN 'val'
                  ELSE 'test' END AS split
      FROM documents)
    SELECT lang, split,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_chars) AS BIGINT) AS n_chars,
           CAST(SUM(doc_id) AS BIGINT) AS id_sum
    FROM assigned GROUP BY lang, split
    """,
)
def pipeline_train_val_test_split(spark, sf_dir):
    """Hash-deterministic train/val/test assignment (md5 bucket mod 100),
    reported per (lang, split) with id checksums.  The property that
    matters operationally: membership is a pure function of doc_id, so
    re-running the split after the corpus grows never migrates an
    existing document across splits — no train/test leakage from
    re-splits, the failure mode rank- or quota-based splits have.

    Scale: map-only (one md5 per row) + one grouped count.  Splitting
    100 TB costs one pass, and any engine (or a downstream consumer in a
    different stack) reproduces the same membership from the rule."""
    (docs,) = load(spark, sf_dir, "documents")
    bucket = (
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 4), 16, 10)
        .cast("int") % 100
    )
    assigned = docs.select(
        "doc_id",
        "lang",
        "n_chars",
        F.when(bucket < SPLIT_TRAIN, "train")
        .when(bucket < SPLIT_VAL, "val")
        .otherwise("test")
        .alias("split"),
    )
    return assigned.groupBy("lang", "split").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("n_chars").cast("long").alias("n_chars"),
        F.sum("doc_id").cast("long").alias("id_sum"),
    )


WS_K = 25  # weighted sample size


@query(
    "pipeline_weighted_sampling",
    oracle=f"""
    -- Weighted sampling without replacement (Efraimidis & Spirakis
    -- 2006): each doc draws key = u^(1/w) with u a deterministic
    -- md5-uniform and w = n_chars; the top-{WS_K} keys ARE a weighted
    -- sample without replacement.  Keys are rounded to 9 places with a
    -- doc_id tiebreak so the boundary is engine-stable.
    WITH keyed AS (
      SELECT doc_id, lang, source, n_chars,
             ROUND(POW((('0x' || substr(md5('ws:' || doc_id::VARCHAR), 1, 8))::BIGINT + 1)
                       / 4294967297.0,
                       1.0 / n_chars), 9) AS k
      FROM documents WHERE n_chars > 0)
    SELECT doc_id, lang, source, n_chars, k AS sample_key
    FROM keyed
    ORDER BY k DESC, doc_id ASC LIMIT {WS_K}
    """,
)
def pipeline_weighted_sampling(spark, sf_dir):
    """Distributed weighted sampling without replacement (Efraimidis &
    Spirakis, "Weighted random sampling with a reservoir", IPL 2006):
    key = u^(1/weight) with u uniform; the k largest keys are exactly a
    weighted sample without replacement.  u derives from md5 so both
    engines draw the same "randomness"; weight = n_chars (longer docs
    proportionally likelier — the byte-budget sampling a corpus
    curator actually wants).

    Scale: this is THE cluster-friendly weighted sampler — no sequential
    reservoir, no global state; each partition computes keys map-side
    and a top-k (TakeOrderedAndProject) replaces any sort.  Composes
    with per-group sampling by windowing the same key per group."""
    (docs,) = load(spark, sf_dir, "documents")
    u = (
        F.conv(F.substring(F.md5(F.concat(F.lit("ws:"), F.col("doc_id").cast("string"))), 1, 8), 16, 10)
        .cast("long") + 1
    ) / F.lit(4294967297.0)
    key = F.round(F.pow(u, F.lit(1.0) / F.col("n_chars")), 9)
    return (
        docs.filter(F.col("n_chars") > 0)
        .select("doc_id", "lang", "source", "n_chars", key.alias("sample_key"))
        .orderBy(F.desc("sample_key"), F.asc("doc_id"))
        .limit(WS_K)
    )
