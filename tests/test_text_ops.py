"""Absolute (non-oracle) semantic checks for the round-2 text/pipeline
operators.  The DuckDB oracle proves Spark ≡ DuckDB; these pin properties
that would survive a bug present in BOTH expressions."""

from pyspark.sql import functions as F

from pypgcdc_spark.queries import REGISTRY, ensure_registered

ensure_registered()


def test_pii_scrub_leaves_zero_residual(spark, sf_dir):
    """Every injected email/phone/IP must be gone after scrubbing — an
    absolute guarantee, not just cross-engine agreement."""
    rows = REGISTRY["text_pii_scrub"].fn(spark, sf_dir).collect()
    assert rows, "empty report"
    assert all(r.n_residual_pii == 0 for r in rows)
    # every doc contributed exactly one injected email and phone
    assert all(r.n_emails == r.n_docs and r.n_phones == r.n_docs for r in rows)
    assert all(r.chars_redacted > 0 for r in rows)


def test_decontamination_flags_known_copies(spark, sf_dir):
    """The eval residue class was chosen to hit planted exact-substring
    copies — the operator must actually flag some training docs."""
    rows = REGISTRY["pipeline_decontamination"].fn(spark, sf_dir).collect()
    assert sum(r.n_contaminated for r in rows) > 0
    assert sum(r.total_overlap_shingles for r in rows) > 0


def test_sequence_packing_bins_respect_budget(spark, sf_dir):
    """Re-derive the packing per bucket and check bin occupancy: every bin
    except a bucket's last must have been filled past the budget boundary
    by construction (contiguous fill leaves no mid-stream empty bins)."""
    from pypgcdc_spark.operators.pipeline import CTX_TOKENS

    rows = REGISTRY["pipeline_sequence_packing"].fn(spark, sf_dir).collect()
    for r in rows:
        # contiguous fill: bins used = 1 + tokens_before_last_doc // CTX ≤
        # 1 + total // CTX; and at least ceil(total/CTX) worth of content
        # can never occupy fewer than total // CTX bins.
        assert r.n_bins >= r.total_tokens // CTX_TOKENS or r.n_docs == 0
        assert r.n_bins <= r.total_tokens // CTX_TOKENS + 1


def test_domain_mix_quota_enforced(spark, sf_dir):
    from pypgcdc_spark.operators.pipeline import LANG_QUOTA

    rows = REGISTRY["pipeline_domain_mix"].fn(spark, sf_dir).collect()
    for r in rows:
        assert r.n_kept == min(r.n_total, LANG_QUOTA)


def test_ivf_flat_high_recall_vs_bruteforce(spark, sf_dir):
    """nprobe=4 of nlist=16 must recover most of the exact top-k on the
    fixture geometry (planted near-dups share centroid neighborhoods)."""
    exact = {
        (r.query_id, r.cand_id)
        for r in REGISTRY["ann_topk_bruteforce"].fn(spark, sf_dir).collect()
    }
    ivf = {
        (r.query_id, r.cand_id)
        for r in REGISTRY["ann_ivf_flat"].fn(spark, sf_dir).collect()
    }
    assert len(ivf & exact) / len(exact) >= 0.5


def test_time_rollup_grains_are_consistent(spark, sf_dir):
    """The grain pyramid must be internally consistent: hour rows sum to
    their day row, day rows sum to the total row."""
    rows = REGISTRY["stream_time_rollup"].fn(spark, sf_dir).collect()
    total = [r for r in rows if r.grain == "total"]
    days = [r for r in rows if r.grain == "day"]
    hours = [r for r in rows if r.grain == "hour"]
    assert len(total) == 1
    assert sum(r.n_events for r in days) == total[0].n_events
    assert sum(r.n_events for r in hours) == total[0].n_events
    by_day = {}
    for h in hours:
        by_day[h.day] = by_day.get(h.day, 0) + h.n_events
    assert by_day == {d.day: d.n_events for d in days}


def test_ivf_kmeans_recall_vs_bruteforce(spark, sf_dir):
    """Both trained-IVF variants (gated fixed-point Lloyd + MLlib float)
    must clear a recall floor against exact brute force, and the gated
    one's in_exact_topk column must agree with the recomputed overlap."""
    from pypgcdc_spark.operators.similarity import ann_ivf_kmeans_mllib

    exact = {
        (r.query_id, r.cand_id)
        for r in REGISTRY["ann_topk_bruteforce"].fn(spark, sf_dir).collect()
    }
    gated = REGISTRY["ann_ivf_kmeans"].fn(spark, sf_dir).collect()
    km = {(r.query_id, r.cand_id) for r in gated}
    assert len(km & exact) / len(exact) >= 0.5
    for r in gated:
        assert r.in_exact_topk == ((r.query_id, r.cand_id) in exact)
    ml = {
        (r.query_id, r.cand_id)
        for r in ann_ivf_kmeans_mllib(spark, sf_dir).collect()
    }
    assert len(ml & exact) / len(exact) >= 0.5


def _write_docs(spark, tmp_path, texts):
    rows = [(i, "web", t) for i, t in enumerate(texts)]
    df = spark.createDataFrame(rows, "doc_id LONG, source STRING, text STRING")
    df.coalesce(1).write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))
    return str(tmp_path)


def test_ngram_jaccard_df_cap_prunes_boilerplate_pairs(spark, tmp_path):
    """The stop-shingle knob (SCALE.md): a boilerplate footer shared by
    most of the corpus creates spurious near-dup pairs; capping shingle
    document-frequency removes them while true duplicate pairs (rare
    shingles) survive."""
    from pypgcdc_spark.operators.dedup import dedup_ngram_jaccard

    boiler = "this footer text is shared by every single document here"
    unique = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    texts = (
        [boiler, boiler]  # docs 0,1: pure boilerplate → spurious pair
        + [unique, unique]  # docs 2,3: planted true duplicates
        + [f"{boiler} junk{i} filler{i} pad{i} word{i} end{i} tok{i}" for i in range(6)]
    )
    sf = _write_docs(spark, tmp_path, texts)

    uncapped = {(r.doc_a, r.doc_b) for r in dedup_ngram_jaccard(spark, sf).collect()}
    assert (0, 1) in uncapped and (2, 3) in uncapped
    assert len(uncapped) > 2, "boilerplate must create spurious pairs uncapped"

    capped = {
        (r.doc_a, r.doc_b)
        for r in dedup_ngram_jaccard(spark, sf, max_shingle_df=4).collect()
    }
    assert capped == {(2, 3)}, capped


def test_duplicate_spans_df_cap_excludes_viral_spans(spark, tmp_path):
    """max_span_df: spans above the document-frequency cap (boilerplate)
    leave the metric entirely, so only genuinely copied documents stay
    flagged."""
    from pypgcdc_spark.operators.text import text_duplicate_spans

    boiler = "this footer text is shared by every single document here"  # 10 words
    copy = "one two three four five six seven eight nine ten eleven twelve"
    texts = [f"{boiler} extra{i} tail{i}" for i in range(6)] + [copy, copy]
    sf = _write_docs(spark, tmp_path, texts)

    (row,) = text_duplicate_spans(spark, sf).collect()
    assert row.n_docs == 8
    assert row.n_flagged == 8  # boilerplate flags everything uncapped

    (row,) = text_duplicate_spans(spark, sf, max_span_df=4).collect()
    assert row.n_flagged == 2
    assert row.flagged_id_sum == 6 + 7


def test_inrow_simhash_equals_groupby_votes(spark, sf_dir):
    """functions.text_kernels.simhash16 (map-only transform+aggregate) must
    produce bit-identical signatures to dedup_simhash's groupBy-votes
    formulation — two plans, one algorithm."""
    from pyspark.sql import functions as F

    from pypgcdc_spark.functions.text_kernels import simhash16
    from pypgcdc_spark.operators.dedup import SIMHASH_BITS
    from pypgcdc_spark.queries import load

    (docs,) = load(spark, sf_dir, "documents")
    inrow = {
        r.doc_id: r.s
        for r in docs.select("doc_id", simhash16(F.col("text")).alias("s")).collect()
    }

    tok = docs.select(
        "doc_id",
        F.explode(F.array_distinct(F.split(F.lower("text"), " "))).alias("tk"),
    )
    tok16 = tok.select(
        "doc_id", F.conv(F.substring(F.md5("tk"), 1, 4), 16, 10).cast("int").alias("h16")
    )
    votes = tok16.groupBy("doc_id").agg(
        *[
            F.sum(F.when(F.expr(f"(h16 >> {b}) & 1") == 1, 1).otherwise(-1)).alias(f"v{b}")
            for b in range(SIMHASH_BITS)
        ]
    )
    sig_expr = None
    for b in range(SIMHASH_BITS):
        term = F.when(F.col(f"v{b}") > 0, F.lit(1 << b).cast("long")).otherwise(
            F.lit(0).cast("long")
        )
        sig_expr = term if sig_expr is None else sig_expr + term
    grouped = {r.doc_id: r.s for r in votes.select("doc_id", sig_expr.alias("s")).collect()}
    assert inrow == grouped
