"""Engine API surface tests: CLI, SQL catalog, schema evolution e2e."""

import subprocess
import sys

from pyspark.sql import functions as F


def test_cli_materializes_all_tables(tmp_path):
    from pypgcdc_spark.testing import write_reference_workload

    log = tmp_path / "cli.log"
    write_reference_workload(str(log))
    out = tmp_path / "state"
    r = subprocess.run(
        [sys.executable, "-m", "pypgcdc_spark", "--log", str(log), "--out", str(out), "--cpus", "2"],
        capture_output=True,
        text=True,
        cwd="/root/repo",
        timeout=300,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    assert "integration" in r.stdout and "control" in r.stdout
    # integration: I then U then D → 0 current rows; control: 1 marker row.
    assert "public.integration: 0 current rows" in r.stdout
    assert "public.control: 1 current rows" in r.stdout


def test_cli_registry_scan_handles_v2_in_segment_relation(tmp_path):
    """The CLI's registry pre-scan must decode a Relation frame that
    arrives INSIDE a v2 stream segment (xid-prefixed layout) — a naive
    decode_relation(payload) would read the xid as the relation OID."""
    from datetime import datetime, timezone

    from pypgcdc_spark.cdc import pgoutput as pg
    from pypgcdc_spark.sources.replay import ReplayLogWriter

    ts = datetime(2024, 1, 1, tzinfo=timezone.utc)
    log = tmp_path / "v2cli.log"
    w = ReplayLogWriter(str(log))
    cols = [(True, "id", 23, -1), (False, "v", 25, -1)]
    xid = 900
    w.append(100, pg.encode_stream_start(xid, first_segment=True))
    w.append(110, pg.encode_relation(31007, "public", "seg_rel", cols, xid=xid))
    w.append(120, pg.encode_insert(31007, ["1", "a"], xid=xid))
    w.append(130, pg.encode_stream_stop())
    w.append(140, pg.encode_stream_commit(xid, 140, 140, ts))
    w.close()
    out = tmp_path / "state"
    r = subprocess.run(
        [sys.executable, "-m", "pypgcdc_spark", "--log", str(log), "--out", str(out), "--cpus", "2"],
        capture_output=True,
        text=True,
        cwd="/root/repo",
        timeout=300,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    assert "public.seg_rel: 1 current rows" in r.stdout


def test_sql_catalog_over_fixtures(spark, sf_dir):
    from pypgcdc_spark.api import PgCdcEngine

    engine = PgCdcEngine(spark)
    engine.register_tables(sf_dir)
    row = spark.sql(
        """
        SELECT r.r_name, COUNT(*) AS n
        FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey
                        JOIN region r ON n.n_regionkey = r.r_regionkey
        GROUP BY r.r_name ORDER BY n DESC, r_name LIMIT 1
        """
    ).first()
    assert row.n > 0


def test_sql_views_over_cdc_log(spark, tmp_path):
    from pypgcdc_spark.api import PgCdcEngine
    from pypgcdc_spark.testing import write_upsert_workload

    log = tmp_path / "views.log"
    expected = write_upsert_workload(str(log), n_keys=15, n_updates=40)
    engine = PgCdcEngine(spark)
    views = engine.register_cdc_views(str(log))
    assert "cdc_envelope" in views and "integration_current" in views
    n_env = spark.sql("SELECT COUNT(*) c FROM cdc_envelope").first().c
    assert n_env == 55  # 15 seed inserts + 40 change events
    got = sorted(
        (str(r.id), r.text_data)
        for r in spark.sql("SELECT id, text_data FROM integration_current").collect()
    )
    assert got == expected


def test_schema_evolution_add_column_e2e(spark, tmp_path):
    """ALTER TABLE ADD COLUMN mid-stream: the versioned registry (Q4 fix)
    lets rows before and after the change decode with their own schema;
    the typed view uses the latest."""
    from pypgcdc_spark.api import PgCdcEngine
    from pypgcdc_spark.cdc import pgoutput as pg
    from pypgcdc_spark.cdc.apply import typed_state
    from pypgcdc_spark.cdc.registry import SchemaRegistry
    from pypgcdc_spark.sources.replay import scan_frames
    from pypgcdc_spark.testing import WorkloadWriter

    log = tmp_path / "evo.log"
    relid = 777
    v1_cols = [(True, "id", 23, -1), (False, "name", 25, -1)]
    v2_cols = v1_cols + [(False, "email", 25, -1)]
    w = WorkloadWriter(str(log))
    w.relation(relid, "people", v1_cols)
    w.tx([pg.encode_insert(relid, ["1", "ada"])])
    w.relation(relid, "people", v2_cols)  # ALTER TABLE ADD COLUMN email
    w.tx([pg.encode_insert(relid, ["2", "grace", "g@x.io"])])
    w.tx([pg.encode_update(relid, ["1", "ada", "a@x.io"])])
    w.close()

    engine = PgCdcEngine(spark)
    env = engine.snapshot(str(log))
    reg = SchemaRegistry()
    for fr in scan_frames(str(log)):
        if fr.payload[:1] == b"R":
            reg.register_relation(pg.decode_relation(fr.payload), lsn=fr.lsn)
    assert len(reg._versions[("replay", relid)]) == 2

    state = typed_state(env, reg.get(relid))
    rows = {r.id: (r.name, r.email) for r in state.collect()}
    assert rows == {1: ("ada", "a@x.io"), 2: ("grace", "g@x.io")}

    # Historical typed view: version in force before the ALTER has 2 cols.
    v1 = reg.get_at_lsn(relid, lsn=1015)
    assert [c.name for c in v1.column_definitions] == ["id", "name"]


def test_vector_kernels(spark):
    from pypgcdc_spark.functions.vector import add, cosine, dot, l2_distance, scale

    df = spark.createDataFrame(
        [([1.0, 0.0, 0.0], [0.0, 1.0, 0.0]), ([1.0, 2.0, 2.0], [1.0, 2.0, 2.0])],
        "a array<float>, b array<float>",
    )
    r = df.select(
        F.round(dot("a", "b"), 6).alias("dot"),
        F.round(cosine("a", "b"), 6).alias("cos"),
        F.round(l2_distance("a", "b"), 6).alias("l2"),
        scale("a", F.lit(2.0)).alias("scaled"),
        add("a", "b").alias("added"),
    ).collect()
    assert r[0].dot == 0.0 and r[0].cos == 0.0
    assert abs(r[0].l2 - 2**0.5) < 1e-6
    assert r[1].cos == 1.0 and r[1].l2 == 0.0
    assert r[1].scaled == [2.0, 4.0, 4.0]


def test_ml_minhash_recall_vs_exact(spark, sf_dir):
    """MLlib MinHashLSH must recover the exact near-dup pairs the
    brute-force jaccard operator finds (recall ≥ 0.9 at matched
    thresholds) — the meaningful correctness notion for approx indexes."""
    from pyspark.ml.feature import HashingTF, MinHashLSH
    from pypgcdc_spark.operators.dedup import dedup_ngram_jaccard
    from pyspark.sql import functions as F

    exact = {
        (r.doc_a, r.doc_b) for r in dedup_ngram_jaccard(spark, sf_dir).collect()
    }
    if not exact:
        return  # nothing planted at this SF

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    toks = docs.select(
        "doc_id", F.array_distinct(F.split(F.lower("text"), " ")).alias("tokens")
    )
    feats = HashingTF(
        inputCol="tokens", outputCol="features", numFeatures=1 << 14, binary=True
    ).transform(toks)
    model = MinHashLSH(
        inputCol="features", outputCol="hashes", numHashTables=4, seed=42
    ).fit(feats)
    approx = {
        (r["datasetA"].doc_id, r["datasetB"].doc_id)
        for r in model.approxSimilarityJoin(feats, feats, 0.9, distCol="d")
        .filter(F.col("datasetA.doc_id") < F.col("datasetB.doc_id"))
        .collect()
    }
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.9, f"recall {recall}: exact={len(exact)}, hit={len(exact & approx)}"


def test_ml_brp_recall_vs_exact(spark, sf_dir):
    """MLlib BRP-LSH pair rows must recover the exact euclidean
    near-neighbor pairs (recall ≥ 0.95 with 16 tables at the fixture
    geometry) and never emit a pair outside the radius."""
    from pypgcdc_spark.functions.vector import l2_distance
    from pypgcdc_spark.operators.ml_lsh import (
        EUCLIDEAN_RADIUS,
        ml_brp_lsh_neighbor_pairs,
    )

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    a = emb.select(F.col("vec_id").alias("vec_a"), F.col("embedding").alias("ea"))
    b = emb.select(F.col("vec_id").alias("vec_b"), F.col("embedding").alias("eb"))
    exact = {
        (r.vec_a, r.vec_b)
        for r in a.join(b, F.col("vec_a") < F.col("vec_b"))
        .filter(l2_distance(F.col("ea"), F.col("eb")) <= EUCLIDEAN_RADIUS)
        .collect()
    }
    got = {(r.vec_a, r.vec_b) for r in ml_brp_lsh_neighbor_pairs(spark, sf_dir).collect()}
    assert got <= exact, "exact distance filter must hold on emitted pairs"
    if exact:
        assert len(got) / len(exact) >= 0.95


def test_ml_minhash_pairs_equal_exact_ground_truth(spark, sf_dir):
    """With 32 single-hash tables, candidate recall at sim ≥ 0.97 is
    certain, and the emitted pair set must EQUAL the exact word-jaccard
    thresholded pairs (sf0.001 corpus is small enough for the exact
    cross-check)."""
    from pypgcdc_spark.operators.ml_lsh import (
        WORD_JACCARD_SIM,
        ml_minhash_lsh_jaccard_pairs,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    toks = docs.select(
        "doc_id", F.array_distinct(F.split(F.lower("text"), " ")).alias("w")
    )
    a = toks.select(F.col("doc_id").alias("doc_a"), F.col("w").alias("wa"))
    b = toks.select(F.col("doc_id").alias("doc_b"), F.col("w").alias("wb"))
    inter = F.size(F.array_intersect("wa", "wb")).cast("double")
    union = F.size("wa") + F.size("wb") - F.size(F.array_intersect("wa", "wb"))
    exact = {
        (r.doc_a, r.doc_b)
        for r in a.join(b, F.col("doc_a") < F.col("doc_b"))
        .filter(inter / union >= WORD_JACCARD_SIM)
        .collect()
    }
    got = {
        (r.doc_a, r.doc_b) for r in ml_minhash_lsh_jaccard_pairs(spark, sf_dir).collect()
    }
    assert got == exact
