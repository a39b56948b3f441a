"""Ranked retrieval + statistical-LM quality scoring over the corpus.

Two operators a training-data pipeline runs constantly:

* ``text_unigram_logprob`` — CCNet-style quality signal: score every
  document by the mean log-probability of its tokens under a unigram LM
  trained on the corpus itself.  Low-probability documents are the
  boilerplate/garbage tail that perplexity filtering removes.
* ``bm25_search`` — BM25 ranked retrieval for a fixed query over the
  whole corpus (Robertson/Sparck-Jones idf as used by Lucene).  The
  "find documents about X" primitive for corpus inspection and
  decontamination audits.

Cross-engine determinism: every floating sum is forced through
``ROUND(x, 6)`` → ``DECIMAL`` so partial-aggregation order can never
change the result (the repo-wide hash-stability convention —
queries.py module docstring).

Reference parity note: the reference engine (pypgcdc) has no text
surface at all; these derive from public IR formulas (Robertson et al.,
TREC-3; Wenzek et al., CCNet, LREC 2020).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from pypgcdc_spark.queries import load, query

BM25_K1 = 1.2
BM25_B = 0.75
BM25_QUERY = ("spark", "join", "fast")  # fixed corpus-inspection query
BM25_TOPK = 10

# Shared DuckDB fragments: whitespace tokens, one row per token instance.
_TOK_SQL = """
    words AS (SELECT doc_id, lang, string_split(lower(text), ' ') AS w
              FROM documents),
    tok AS (SELECT doc_id, lang, unnest(w) AS t FROM words)
"""


def _tokens(spark, sf_dir):
    """(doc_id, lang, t): one row per token instance, JVM-side split+explode."""
    (docs,) = load(spark, sf_dir, "documents")
    n_parts = docs.sparkSession.sparkContext.defaultParallelism
    return (
        docs.repartition(n_parts, "doc_id")
        .select(
            "doc_id",
            "lang",
            F.explode(F.split(F.lower("text"), " ")).alias("t"),
        )
    )


@query(
    "text_unigram_logprob",
    oracle=f"""
    -- Unigram-LM quality scoring (CCNet-style): P(token) from corpus
    -- counts, document score = mean ln P over its tokens.  Per-token
    -- logprobs are rounded to 6 places and summed as DECIMAL so the
    -- result is independent of summation order in both engines.
    WITH {_TOK_SQL},
    vocab AS (SELECT t, COUNT(*) AS c FROM tok GROUP BY t),
    tot AS (SELECT SUM(c) AS n FROM vocab),
    doc AS (
      SELECT doc_id, any_value(lang) AS lang,
             CAST(SUM(CAST(ROUND(ln(CAST(c AS DOUBLE) / CAST(n AS DOUBLE)), 6)
                           AS DECIMAL(18,6))) AS DOUBLE) / COUNT(*) AS lp
      FROM tok JOIN vocab USING (t) CROSS JOIN tot
      GROUP BY doc_id
    )
    SELECT lang,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           ROUND(CAST(SUM(CAST(ROUND(lp, 6) AS DECIMAL(18,6))) AS DOUBLE)
                 / COUNT(*), 2) AS avg_logprob,
           ROUND(MIN(lp), 2) AS worst_logprob,
           ROUND(MAX(lp), 2) AS best_logprob
    FROM doc GROUP BY lang
    """,
)
def text_unigram_logprob(spark, sf_dir):
    """Mean unigram log-probability per document, aggregated per language —
    the perplexity-style quality filter signal (train the LM on the corpus,
    flag documents whose tokens are collectively improbable).

    Plan: one explode→groupBy(token) pass trains the LM (map-side partial
    aggregation), the token→count join is a broadcast at any realistic
    vocab size (vocab ≪ corpus; Zipf), and doc scoring is one
    groupBy(doc_id).  Total: two shuffles over the token stream + one
    broadcast — no Python, no driver loop.  At 100 TB the vocab table is
    the only state that must fit an executor (cap it with a min-df filter
    if tokenization is pathological).  The vocab materializes once
    (eager localCheckpoint — vocab-sized, tiny): without it the
    `n_total` scalar re-ran the whole tokenize+count subtree as a third
    full corpus pass (r12 plan sweep: 3 Generate nodes → 2)."""
    tok = _tokens(spark, sf_dir)
    vocab = tok.groupBy("t").agg(F.count(F.lit(1)).alias("c")).localCheckpoint(
        eager=True
    )
    n_total = vocab.agg(F.sum("c").alias("n"))
    lp_term = F.round(
        F.log(F.col("c").cast("double") / F.col("n").cast("double")), 6
    ).cast("decimal(18,6)")
    doc = (
        tok.join(F.broadcast(vocab), "t")
        .join(F.broadcast(n_total))
        .groupBy("doc_id")
        .agg(
            F.any_value("lang").alias("lang"),
            (F.sum(lp_term).cast("double") / F.count(F.lit(1))).alias("lp"),
        )
    )
    return doc.groupBy("lang").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.round(
            F.sum(F.round("lp", 6).cast("decimal(18,6)")).cast("double")
            / F.count(F.lit(1)),
            2,
        ).alias("avg_logprob"),
        F.round(F.min("lp"), 2).alias("worst_logprob"),
        F.round(F.max("lp"), 2).alias("best_logprob"),
    )


@query(
    "bm25_search",
    oracle=f"""
    -- BM25 top-{BM25_TOPK} for the fixed query {BM25_QUERY} (k1={BM25_K1},
    -- b={BM25_B}); Lucene's always-positive idf ln(1 + (N-df+0.5)/(df+0.5)).
    -- Per-term scores round through DECIMAL before the per-doc sum.
    WITH {_TOK_SQL},
    doclen AS (SELECT doc_id, COUNT(*) AS dl FROM tok GROUP BY doc_id),
    stats AS (SELECT COUNT(*) AS n_docs,
                     CAST(SUM(dl) AS DOUBLE) / COUNT(*) AS avgdl
              FROM doclen),
    tf AS (SELECT doc_id, t, COUNT(*) AS f FROM tok
           WHERE t IN {tuple(BM25_QUERY)} GROUP BY doc_id, t),
    df AS (SELECT t, COUNT(*) AS df FROM tf GROUP BY t),
    scored AS (
      SELECT tf.doc_id,
             SUM(CAST(ROUND(
               ln(1 + (n_docs - df + 0.5) / (df + 0.5))
               * f / (f + {BM25_K1} * (1 - {BM25_B} + {BM25_B} * dl / avgdl)),
             6) AS DECIMAL(18,6))) AS score
      FROM tf JOIN df USING (t)
              JOIN doclen USING (doc_id)
              CROSS JOIN stats
      GROUP BY tf.doc_id
    )
    SELECT doc_id, ROUND(CAST(score AS DOUBLE), 4) AS bm25
    FROM scored
    ORDER BY bm25 DESC, doc_id ASC LIMIT {BM25_TOPK}
    """,
)
def bm25_search(spark, sf_dir):
    """BM25 ranked retrieval over the corpus for a fixed query-term set.

    Plan: ONE corpus tokenize pass.  A single conditional aggregation
    per doc_id produces the document length AND the per-query-term
    frequencies together (the query set is a compile-time constant, so
    f(term) is a `sum(when(t = term, 1))` column each); the doc-level
    result — O(n_docs) narrow rows, ≪ corpus — materializes once
    (eager localCheckpoint).  The old shape re-ran the tokenize+explode
    subtree FOUR times (doclen, stats, tf, df each re-derived it —
    caught by the r12 plan sweep).  The model state is FIVE scalars
    (n_docs, avgdl, df per query term): one bounded metadata collect —
    the same class as k-means centroids or LSH seeds — inlines them as
    literals, so scoring is a join-free in-row expression over the
    checkpointed doc table and the final plan is scan → filter →
    project → TakeOrderedAndProject (no global sort, no broadcast, no
    shuffle; the old per-term unpivot + df/stats broadcast joins cost
    two broadcast builds and a re-aggregation per run)."""
    tok = _tokens(spark, sf_dir)
    nq = len(BM25_QUERY)
    perdoc = tok.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("dl"),
        *[
            F.sum(F.when(F.col("t") == q, 1).otherwise(0)).cast("long").alias(f"f{i}")
            for i, q in enumerate(BM25_QUERY)
        ],
    ).localCheckpoint(eager=True)
    _df = [F.sum(F.when(F.col(f"f{i}") > 0, 1).otherwise(0)) for i in range(nq)]
    g = perdoc.agg(
        (F.sum("dl").cast("double") / F.count(F.lit(1))).alias("avgdl"),
        # Lucene's always-positive idf, computed INSIDE the aggregate so
        # the log/divide arithmetic is Spark's own (a driver-side
        # math.log could differ from the JVM's by an ulp and flip a
        # 6-decimal rounding) — the scalars collected here are
        # bit-identical to what the broadcast-joined column carried.
        *[
            F.log(
                F.lit(1.0)
                + (F.count(F.lit(1)) - _df[i] + F.lit(0.5)) / (_df[i] + F.lit(0.5))
            ).alias(f"idf{i}")
            for i in range(nq)
        ],
    ).first()
    avgdl = g["avgdl"]
    idf = [g[f"idf{i}"] for i in range(nq)]
    norm = F.lit(BM25_K1) * (
        F.lit(1.0) - F.lit(BM25_B) + F.lit(BM25_B) * F.col("dl") / F.lit(avgdl)
    )

    def term_score(i):
        f = F.col(f"f{i}")
        # Absent terms contribute exactly nothing (the old unpivot
        # dropped their rows before the aggregate SUM); present terms
        # round per term then sum as DECIMAL — addition is exact, so
        # the expression-level sum equals the aggregate sum.
        return F.coalesce(
            F.when(f > 0, F.round(F.lit(idf[i]) * f / (f + norm), 6).cast("decimal(18,6)")),
            F.lit(0).cast("decimal(18,6)"),
        )

    score = term_score(0)
    for i in range(1, nq):
        score = score + term_score(i)
    hit = F.col("f0") > 0
    for i in range(1, nq):
        hit = hit | (F.col(f"f{i}") > 0)
    scored = perdoc.filter(hit).select("doc_id", score.alias("score"))
    return (
        scored.select("doc_id", F.round(F.col("score").cast("double"), 4).alias("bm25"))
        .orderBy(F.desc("bm25"), F.asc("doc_id"))
        .limit(BM25_TOPK)
    )


RRF_K = 60  # reciprocal-rank-fusion damping (Cormack et al., SIGIR'09)
RRF_DENSE_QUERY = 3  # fixed query vector: embedding of vec_id 3 (== doc_id)
RRF_TOPK = 10


@query(
    "retrieval_hybrid_rrf",
    oracle=f"""
    -- Hybrid retrieval: BM25 (sparse) and cosine (dense, query = the
    -- embedding of doc {RRF_DENSE_QUERY}) rank lists fused with
    -- reciprocal-rank fusion: rrf = Σ 1/({RRF_K} + rank).  Ranks use
    -- rounded scores + id tiebreaks, so fusion is engine-independent.
    WITH {_TOK_SQL},
    doclen AS (SELECT doc_id, COUNT(*) AS dl FROM tok GROUP BY doc_id),
    stats AS (SELECT COUNT(*) AS n_docs,
                     CAST(SUM(dl) AS DOUBLE) / COUNT(*) AS avgdl
              FROM doclen),
    tf AS (SELECT doc_id, t, COUNT(*) AS f FROM tok
           WHERE t IN {tuple(BM25_QUERY)} GROUP BY doc_id, t),
    df AS (SELECT t, COUNT(*) AS df FROM tf GROUP BY t),
    bm25s AS (
      SELECT tf.doc_id,
             SUM(CAST(ROUND(
               ln(1 + (n_docs - df + 0.5) / (df + 0.5))
               * f / (f + {BM25_K1} * (1 - {BM25_B} + {BM25_B} * dl / avgdl)),
             6) AS DECIMAL(18,6))) AS score
      FROM tf JOIN df USING (t)
              JOIN doclen USING (doc_id)
              CROSS JOIN stats
      GROUP BY tf.doc_id),
    sparse AS (
      SELECT doc_id, ROW_NUMBER() OVER (
               ORDER BY ROUND(CAST(score AS DOUBLE), 4) DESC, doc_id ASC)
             AS sparse_rank
      FROM bm25s QUALIFY sparse_rank <= {RRF_TOPK}),
    q AS (SELECT embedding AS eq FROM embeddings WHERE vec_id = {RRF_DENSE_QUERY}),
    ex AS (SELECT c.vec_id AS doc_id, eq[i]::DOUBLE AS x, c.embedding[i]::DOUBLE AS y
           FROM embeddings c, q, unnest(generate_series(1, 64)) t(i)
           WHERE c.vec_id <> {RRF_DENSE_QUERY}),
    cos AS (SELECT doc_id,
                   ROUND(SUM(x*y) / (sqrt(SUM(x*x)) * sqrt(SUM(y*y))), 4) AS cosine
            FROM ex GROUP BY 1),
    dense AS (
      SELECT doc_id, ROW_NUMBER() OVER (ORDER BY cosine DESC, doc_id ASC)
             AS dense_rank
      FROM cos QUALIFY dense_rank <= {RRF_TOPK}),
    fused AS (
      SELECT COALESCE(s.doc_id, d.doc_id) AS doc_id,
             COALESCE(s.sparse_rank, 0) AS sparse_rank,
             COALESCE(d.dense_rank, 0) AS dense_rank,
             ROUND(COALESCE(1.0 / ({RRF_K} + s.sparse_rank), 0)
                   + COALESCE(1.0 / ({RRF_K} + d.dense_rank), 0), 6) AS rrf
      FROM sparse s FULL OUTER JOIN dense d ON s.doc_id = d.doc_id)
    SELECT doc_id, sparse_rank, dense_rank, rrf
    FROM fused ORDER BY rrf DESC, doc_id ASC LIMIT {RRF_TOPK}
    """,
)
def retrieval_hybrid_rrf(spark, sf_dir):
    """Hybrid sparse+dense retrieval with reciprocal-rank fusion — the
    standard production search stack (lexical BM25 catches exact terms,
    embedding cosine catches paraphrase; RRF fuses without score
    calibration).  Sparse ranks reuse the registered BM25 top-k; dense
    ranks are cosine against one fixed document embedding (vec_id ==
    doc_id linkage of the fixture).

    Scale shape: both rank lists are top-k (TakeOrderedAndProject —
    never a global sort), the fusion is a full-outer join of two ≤k-row
    lists, and each side inherits its own operator's scale path (term-
    filtered postings; broadcast-query corpus scan)."""
    from pyspark.sql import Window

    from pypgcdc_spark.operators.similarity import _cosine

    sparse = (
        bm25_search(spark, sf_dir)
        .withColumn(
            "sparse_rank",
            F.row_number().over(Window.orderBy(F.desc("bm25"), F.asc("doc_id"))),
        )
        .filter(F.col("sparse_rank") <= RRF_TOPK)
        .select("doc_id", "sparse_rank")
    )
    (emb,) = load(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") == RRF_DENSE_QUERY).select(
        F.col("embedding").alias("eq")
    )
    # Top-k FIRST (TakeOrderedAndProject — never a global sort), THEN
    # rank the bounded k rows: the previous shape ran the row_number
    # window over the ENTIRE scored corpus, which moves every row to a
    # single partition (the exact global-sort the docstring promises
    # this operator avoids).  Ranks over the deterministic total order
    # are identical either way.
    dense = (
        emb.filter(F.col("vec_id") != RRF_DENSE_QUERY)
        .crossJoin(F.broadcast(q))
        .select(
            F.col("vec_id").alias("doc_id"),
            F.round(_cosine(F.col("eq"), F.col("embedding")), 4).alias("cosine"),
        )
        .orderBy(F.desc("cosine"), F.asc("doc_id"))
        .limit(RRF_TOPK)
        .withColumn(
            "dense_rank",
            F.row_number().over(Window.orderBy(F.desc("cosine"), F.asc("doc_id"))),
        )
        .select("doc_id", "dense_rank")
    )
    s = sparse.withColumnRenamed("doc_id", "s_doc")
    d = dense.withColumnRenamed("doc_id", "d_doc")
    fused = s.join(d, s.s_doc == d.d_doc, "full_outer").select(
        F.coalesce("s_doc", "d_doc").alias("doc_id"),
        F.coalesce("sparse_rank", F.lit(0)).cast("long").alias("sparse_rank"),
        F.coalesce("dense_rank", F.lit(0)).cast("long").alias("dense_rank"),
        F.round(
            F.coalesce(F.lit(1.0) / (F.lit(RRF_K) + F.col("sparse_rank")), F.lit(0.0))
            + F.coalesce(F.lit(1.0) / (F.lit(RRF_K) + F.col("dense_rank")), F.lit(0.0)),
            6,
        ).alias("rrf"),
    )
    return fused.orderBy(F.desc("rrf"), F.asc("doc_id")).limit(RRF_TOPK)


@query(
    "text_bigram_logprob",
    oracle="""
    -- Bigram-LM quality scoring (the sequence-aware refinement of the
    -- unigram signal): P(w2 | w1) from corpus bigram counts over
    -- first-word context totals; document score = mean ln P over its
    -- bigrams.  Repetitive/boilerplate text scores HIGH (its bigrams
    -- dominate their contexts), disfluent noise scores LOW — the two
    -- tails perplexity filtering separates.  Per-bigram logprobs round
    -- to 6 places and sum as DECIMAL (order-free partial aggregation).
    WITH words AS (SELECT doc_id, lang, string_split(lower(text), ' ') AS w
                   FROM documents),
    bg AS (SELECT doc_id, lang, w[i] AS w1, w[i+1] AS w2
           FROM words, unnest(range(1, len(w))) t(i)),
    bc AS (SELECT w1, w2, COUNT(*) AS c FROM bg GROUP BY w1, w2),
    ctx AS (SELECT w1, SUM(c) AS n FROM bc GROUP BY w1),
    doc AS (
      SELECT doc_id, any_value(lang) AS lang,
             CAST(SUM(CAST(ROUND(ln(CAST(c AS DOUBLE) / CAST(n AS DOUBLE)), 6)
                           AS DECIMAL(18,6))) AS DOUBLE) / COUNT(*) AS lp
      FROM bg JOIN bc USING (w1, w2) JOIN ctx USING (w1)
      GROUP BY doc_id)
    SELECT lang,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           ROUND(CAST(SUM(CAST(ROUND(lp, 6) AS DECIMAL(18,6))) AS DOUBLE)
                 / COUNT(*), 2) AS avg_logprob,
           ROUND(MIN(lp), 2) AS worst_logprob,
           ROUND(MAX(lp), 2) AS best_logprob
    FROM doc GROUP BY lang
    """,
)
def text_bigram_logprob(spark, sf_dir):
    """Bigram conditional-probability scoring: the corpus trains its own
    bigram LM (counts over first-word contexts), every document scores
    the mean ln P(w2|w1) of its word pairs, rolled up per language.
    The sequence-aware sibling of ``text_unigram_logprob`` — a document
    of common words in impossible ORDER now scores low.

    Scale shape: bigram extraction is an in-row zip of two array slices
    (map-only); the model is two hash aggregations (bigram, context);
    scoring is two equi-joins on token keys, partial-agg combined.  No
    state beyond the bigram vocabulary — the same cardinality class a
    shuffle already handles.  Docs with fewer than two words have no
    bigrams and drop out identically in both engines."""
    (docs,) = load(spark, sf_dir, "documents")
    n_parts = docs.sparkSession.sparkContext.defaultParallelism
    words = docs.repartition(n_parts, "doc_id").select(
        "doc_id", "lang", F.split(F.lower("text"), " ").alias("w")
    )
    bg = words.select(
        "doc_id",
        "lang",
        F.explode(
            F.zip_with(
                F.expr("slice(w, 1, size(w) - 1)"),
                F.expr("slice(w, 2, size(w) - 1)"),
                lambda a, b: F.struct(a.alias("w1"), b.alias("w2")),
            )
        ).alias("p"),
    ).select("doc_id", "lang", F.col("p.w1").alias("w1"), F.col("p.w2").alias("w2"))
    # The bigram-count table materializes once (eager localCheckpoint —
    # O(bigram vocab), ≪ the stream): it feeds BOTH the context rollup
    # and the count side of the scoring join, and without the checkpoint
    # each consumer re-ran the zip+explode+groupBy subtree as its own
    # full corpus pass (r12 plan sweep: 3 Generate nodes → 2, the
    # scoring stream + one model-build pass — the structural floor for
    # train-then-score).
    bc = bg.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("c")).localCheckpoint(
        eager=True
    )
    ctx = bc.groupBy("w1").agg(F.sum("c").alias("n"))
    # Attach the context total to the SMALL bigram-count table first, so
    # the O(tokens) bigram stream is joined (and shuffled) exactly once —
    # the previous shape shuffled it twice, by (w1,w2) for the count and
    # again by w1 for the context (guide §2.3: decide on small rows).
    # No broadcast hint: bigram vocab ≪ token stream but still O(vocab) —
    # statistics pick broadcast locally and a shuffle join at scale.
    bcn = bc.join(ctx, "w1")
    lp_term = F.round(
        F.log(F.col("c").cast("double") / F.col("n").cast("double")), 6
    ).cast("decimal(18,6)")
    doc = (
        bg.join(bcn, ["w1", "w2"])
        .groupBy("doc_id")
        .agg(
            F.any_value("lang").alias("lang"),
            (F.sum(lp_term).cast("double") / F.count(F.lit(1))).alias("lp"),
        )
    )
    return doc.groupBy("lang").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.round(
            F.sum(F.round(F.col("lp"), 6).cast("decimal(18,6)")).cast("double")
            / F.count(F.lit(1)),
            2,
        ).alias("avg_logprob"),
        F.round(F.min("lp"), 2).alias("worst_logprob"),
        F.round(F.max("lp"), 2).alias("best_logprob"),
    )
