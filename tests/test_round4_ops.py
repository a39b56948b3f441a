"""Targeted tests for the round-4 session operators — properties the
DuckDB oracle comparison can't see (recall vs brute force, boundary
cases, sketch guarantees)."""

import pyspark.sql.functions as F
import pytest

from pypgcdc_spark.queries import REGISTRY, ensure_registered

ensure_registered()


def test_edit_distance_prefilter_has_full_recall(spark, sf_dir):
    """The rare-4-gram candidate generation must not LOSE any pair within
    the edit threshold on the fixture: compare against the brute-force
    all-pairs ground truth (feasible at test SF)."""
    got = {
        (r.doc_id_a, r.doc_id_b)
        for r in REGISTRY["dedup_edit_distance"].fn(spark, sf_dir).collect()
    }
    import duckdb

    con = duckdb.connect()
    truth = con.execute(
        f"""
        WITH p AS (SELECT doc_id, substr(text, 1, 80) AS pre
                   FROM '{sf_dir}/documents.parquet' WHERE length(text) >= 8)
        SELECT a.doc_id, b.doc_id FROM p a JOIN p b ON a.doc_id < b.doc_id
        WHERE levenshtein(a.pre, b.pre) <= 4
        """
    ).fetchall()
    assert got == {(a, b) for a, b in truth}


def test_doc_chunking_boundaries(spark, tmp_path):
    """Chunk counts at the window/stride boundaries: len 1 → 1 chunk,
    len 256 → exactly ⌈(256-1)/192⌉+1? No — positions 1 and 193 both
    start ≤ len, so 2 chunks (second is the 64-char ragged tail);
    len 192 → 1 chunk; len 193 → 2 chunks; empty doc → excluded."""
    rows = [
        (1, "a" * 1),
        (2, "b" * 192),
        (3, "c" * 193),
        (4, "d" * 256),
        (5, ""),
    ]
    df = spark.createDataFrame(rows, "doc_id LONG, text STRING").withColumn(
        "lang", F.lit("en")
    ).withColumn("source", F.lit("t")).withColumn("n_chars", F.length("text"))
    d = str(tmp_path / "docs")
    df.write.parquet(f"{d}/documents.parquet")
    out = {
        r.doc_id: (r.n_chunks, r.last_chunk_len)
        for r in REGISTRY["pipeline_doc_chunking"].fn(spark, d).collect()
    }
    assert out == {1: (1, 1), 2: (1, 192), 3: (2, 1), 4: (2, 64)}


def test_count_min_never_undercounts(spark, sf_dir):
    """CMS point estimates are one-sided: est ≥ exact for every probed
    term (the defining sketch guarantee)."""
    rows = REGISTRY["sketch_count_min"].fn(spark, sf_dir).collect()
    assert rows and all(r.overcount >= 0 for r in rows)


def test_kmv_covers_all_groups_and_small_groups_are_exact(spark, sf_dir):
    """Every language gets an estimate; groups with < k distinct hashes
    degenerate to the exact count (rel_err only from hash collisions)."""
    rows = REGISTRY["sketch_kmv_distinct"].fn(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r.kmv_est > 0
        if r.n_exact < 64:
            # estimate equals the distinct-hash count: |err| ≤ collisions
            assert abs(r.kmv_est - r.n_exact) <= 2


def test_kmeans_partitions_the_corpus(spark, sf_dir):
    """Cluster sizes sum to the corpus and every cluster id is in [0, k)."""
    rows = REGISTRY["embed_kmeans_domains"].fn(spark, sf_dir).collect()
    total = spark.read.parquet(f"{sf_dir}/embeddings.parquet").count()
    assert sum(r.n_members for r in rows) == total
    assert all(0 <= r.cluster_id < 8 for r in rows)
    assert all(0 < r.label_purity <= 1.0 for r in rows)


def test_bloom_prefilter_is_lossless(spark, sf_dir):
    """Bloom prefiltering has no false negatives: the verified match
    count equals the plain-join count computed independently."""
    row = REGISTRY["join_bloom_prefilter"].fn(spark, sf_dir).collect()[0]
    from pypgcdc_spark.queries import load

    customer, orders = load(spark, sf_dir, "customer", "orders")
    plain = (
        orders.join(
            customer.filter(
                (F.col("c_mktsegment") == "BUILDING") & (F.col("c_acctbal") > 5000)
            ),
            orders.o_custkey == customer.c_custkey,
        ).count()
    )
    assert row.n_true_matches == plain
    assert row.n_candidates >= row.n_true_matches


def test_time_travel_pivot_is_interior_and_subset(spark, sf_dir):
    """The as-of state must describe a strictly earlier LSN frontier:
    every key present as-of exists in the log at/below the pivot, and at
    least one key changed after it (the fixture's log keeps moving)."""
    rows = REGISTRY["cdc_time_travel"].fn(spark, sf_dir).collect()
    assert rows
    assert any(r.changed_since for r in rows)


def test_gap_fill_is_dense_and_rolling_aligns(spark, sf_dir):
    """The spine is exactly SPINE_DAYS consecutive days; rolling stats
    cover the same spine 1:1."""
    from datetime import date, timedelta

    gaps = REGISTRY["timeseries_gap_fill"].fn(spark, sf_dir).collect()
    days = sorted(r.day for r in gaps)
    assert len(days) == 60
    d0 = date.fromisoformat(days[0])
    assert days == [(d0 + timedelta(days=i)).isoformat() for i in range(60)]
    roll = REGISTRY["timeseries_rolling_stats"].fn(spark, sf_dir).collect()
    assert sorted(r.day for r in roll) == days


def test_hybrid_rrf_rank_fusion_properties(spark, sf_dir):
    """RRF bounds and monotonicity: every score ≤ 1/61 + 1/61; a doc
    present in BOTH lists outranks one present in a single list at equal
    or worse ranks; ranks are within [0, 10]."""
    rows = REGISTRY["retrieval_hybrid_rrf"].fn(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert 0 <= r.sparse_rank <= 10 and 0 <= r.dense_rank <= 10
        assert r.rrf <= round(2 / 61, 6) + 1e-9
        both = r.sparse_rank > 0 and r.dense_rank > 0
        if both:
            assert r.rrf > 1.0 / 61  # beats any single-list-only score


def test_partitioned_layout_is_session_cached(spark, sf_dir):
    """The date-partitioned events fixture builds once per (session,
    dataset): a second call must return the SAME directory without a
    rewrite — the layout is an amortized ingest-time decision, not a
    per-query cost."""
    from pypgcdc_spark.operators.layout import partitioned_events_dir

    d1 = partitioned_events_dir(spark, sf_dir)
    d2 = partitioned_events_dir(spark, sf_dir)
    assert d1 == d2
    import os

    parts = [p for p in os.listdir(d1) if p.startswith("event_date=")]
    assert len(parts) > 1  # genuinely partitioned by date
