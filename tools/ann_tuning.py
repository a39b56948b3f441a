"""ANN recall/cost tuning curves (round-7 task 7).

The IVF paths ship hash-gated at fixed ``nlist``/``nprobe``; a 100 TB
deployment needs the tuning story: how recall@k trades against probe
cost as the two knobs move, measured at a stress scale.

Method:

* corpus = sf0.1 embeddings (2 000 × 64) replicated ``--repl`` times
  with deterministic per-(vector, replica, dim) perturbation — distinct,
  reproducible vectors (identical replicas would collapse the metric:
  every copy ties with its original);
* ground truth = exact cosine top-k per query (numpy, the same math the
  ``ann_topk_pandas`` kernel runs executor-side);
* for each nlist: train MLlib KMeans centroids once (index build,
  reported separately — it amortizes over every query);
* for each nprobe ≤ nlist: the exact Spark dataflow `ann_ivf_kmeans`
  ships (assign → probe nearest lists → exact re-rank) parameterized,
  measuring query wall, recall@k vs truth, and scanned-candidate
  fraction (the probe cost that rules at 100 TB — wall clock at toy
  scale is dominated by fixed job overhead);
* PQ sweep: subquantizer count m ∈ {8, 16, 32} (compression 64→m bytes)
  with ADC scoring, recall@k of the top-k after exact re-rank of the
  PQ top-4k shortlist.

Output: ``ANN_TUNING_r8.json`` with the full grid and BOTH operating
points (cheapest-at-0.95-recall and the recall~1.0 recommended default
SCALE.md documents).

Usage: python tools/ann_tuning.py [--repl 50] [--queries 50] [--k 10]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

BASE = "/root/testdata/sf0.1"


def build_corpus(spark, repl: int, spread: bool = False):
    """Replicated + perturbed corpus as a cached DataFrame.

    One crossJoin with a replica range (NOT an N-way union — a 500-arm
    union plan chokes the analyzer at the 1M-vector scale this round
    curves).  Default jitter is bit-identical to the r8 union form:
    ±2% deterministic per (original vec_id, replica, dim) via the same
    xxhash64 triple.

    ``spread=True`` (the 1M mode): ±2% replicas of 2 000 bases are SO
    tightly clustered that every query's true top-k is its own replica
    cloud — one probed list captures it all and recall pins at 1.0 at
    any nprobe (measured: the r9 first pass showed no knee at 500×).
    Spread mode mixes each replica toward deterministic uniform noise
    of the base components' scale (x' = 0.6x + U[-0.215, 0.215], base
    component σ≈0.125), giving intra-cluster cosine ≈ 0.6 — 1M vectors
    with non-degenerate neighbor structure."""
    from pyspark.sql import functions as F

    emb = spark.read.parquet(f"{BASE}/embeddings.parquet")
    n = emb.count()
    reps = spark.range(repl).select(F.col("id").cast("int").alias("rep"))
    u01 = lambda j: (  # deterministic U[0,1) per (vec_id, rep, dim)  # noqa: E731
        F.pmod(F.xxhash64(F.col("vec_id"), F.col("rep"), j), F.lit(4001)) / 4001.0
    )
    if spread == "uniform":
        jittered = F.transform(
            F.col("embedding"),
            lambda x, j: (x * 0.6 + (u01(j) - 0.5) * 0.43).cast("float"),
        )
    elif spread == "ladder":
        # Per-replica mix ladder a_r = 0.05 + 0.75·r/repl: each base keeps
        # a dense near-dup core (low r) and a long tail toward noise —
        # the two-regime middle ground with non-degenerate neighbor
        # structure (prototyped in numpy; the Spark corpus reproduces it
        # deterministically via the xxhash64 triple).
        a = F.lit(0.05) + F.lit(0.75) * F.col("rep").cast("double") / F.lit(repl)
        jittered = F.transform(
            F.col("embedding"),
            lambda x, j: (x * (F.lit(1.0) - a) + (u01(j) - 0.5) * 0.43 * a).cast(
                "float"
            ),
        )
    else:
        jittered = F.transform(
            F.col("embedding"),
            lambda x, j: x
            + (
                F.pmod(F.xxhash64(F.col("vec_id"), F.col("rep"), j), F.lit(4001))
                / 100000.0
                - 0.02
            ).cast("float"),
        )
    out = emb.crossJoin(reps).select(
        (F.col("vec_id") + F.col("rep").cast("long") * n).alias("new_id"),
        F.when(F.col("rep") == 0, F.col("embedding")).otherwise(jittered).alias(
            "embedding"
        ),
    ).withColumnRenamed("new_id", "vec_id")
    return out.repartition(32, "vec_id").localCheckpoint(eager=True)


def build_assign(spark, corpus, centers_np):
    """Corpus→list assignment for one trained index, computed ONCE per
    nlist (it is index-build cost, amortized over every query) as a
    map-side Arrow argmax kernel — the same design the shipped
    ``ann_ivf_kmeans`` uses (numpy matmul per batch; per-element JVM
    lambdas are ~10× slower and made the 1M-vector sweep infeasible)."""
    import pandas as pd

    bc = spark.sparkContext.broadcast(centers_np)

    def assign_fn(batches):
        C = bc.value
        Cn = C / np.linalg.norm(C, axis=1, keepdims=True)
        for pdf in batches:
            X = np.array(list(pdf["embedding"]), dtype=np.float64)
            Xn = X / np.linalg.norm(X, axis=1, keepdims=True)
            # argmax of cosine; numpy first-max tie-break = lowest cid —
            # identical to the max_by(struct(cos, -cent_id)) it replaces.
            cid = np.argmax(Xn @ Cn.T, axis=1)
            yield pd.DataFrame(
                {"vec_id": pdf["vec_id"], "cent_id": cid.astype("int32")}
            )

    return corpus.mapInPandas(
        assign_fn, "vec_id long, cent_id int"
    ).localCheckpoint(eager=True)


def exact_truth_heldout(corpus_np, ids, q_mat, q_ids, k):
    """Exact cosine top-k for held-out query vectors (no self-exclusion
    needed — the queries are not corpus members)."""
    unit = corpus_np / np.linalg.norm(corpus_np, axis=1)[:, None]
    qn = q_mat / np.linalg.norm(q_mat, axis=1)[:, None]
    truth = {}
    for qi, q in enumerate(q_ids):
        sims = unit @ qn[qi]
        top = np.argpartition(-sims, k)[:k]
        top = top[np.argsort(-sims[top], kind="stable")]
        truth[q] = [int(ids[t]) for t in top]
    return truth


def exact_truth(corpus_np, ids, q_ids, k):
    """Exact cosine top-k (excluding self) for each query id."""
    norms = np.linalg.norm(corpus_np, axis=1)
    unit = corpus_np / norms[:, None]
    idx_of = {v: i for i, v in enumerate(ids)}
    truth = {}
    for q in q_ids:
        qi = idx_of[q]
        sims = unit @ unit[qi]
        sims[qi] = -np.inf
        top = np.argpartition(-sims, k)[:k]
        top = top[np.argsort(-sims[top], kind="stable")]
        truth[q] = [int(ids[t]) for t in top]
    return truth


def ivf_query(spark, corpus, assign, centers_np, q_ids, q_mat, k, n_probe):
    """The shipped IVF query dataflow, parameterized: probe nearest
    lists (driver numpy — queries × centroids is bounded metadata) →
    broadcast equi-join on list id → exact cosine re-rank (Arrow numpy
    per batch).  Returns {query_id: [cand ids]} and the candidate count."""
    import pandas as pd
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    Cn = centers_np / np.linalg.norm(centers_np, axis=1, keepdims=True)
    qn = q_mat / np.linalg.norm(q_mat, axis=1, keepdims=True)
    sims = qn @ Cn.T  # (queries, nlist)
    probe_rows = []
    for qi, q in enumerate(q_ids):
        order = np.lexsort((np.arange(sims.shape[1]), -sims[qi]))
        for cid in order[:n_probe]:
            probe_rows.append((int(q), int(cid)))
    probes = spark.createDataFrame(probe_rows, "query_id LONG, cent_id INT")

    cand = (
        F.broadcast(probes)
        .join(assign, "cent_id")
        .filter(F.col("query_id") != F.col("vec_id"))
        .select("query_id", F.col("vec_id").alias("cand_id"))
    )
    n_cand = cand.count()
    bc_q = spark.sparkContext.broadcast(
        ({int(q): i for i, q in enumerate(q_ids)}, qn)
    )

    def score(batches):
        idx, qm = bc_q.value
        for pdf in batches:
            qs = pdf["query_id"].to_numpy()
            cm = np.array(list(pdf["embedding"]), dtype=np.float64)
            cm /= np.linalg.norm(cm, axis=1, keepdims=True)
            qrows = qm[[idx[int(x)] for x in qs]]
            yield pd.DataFrame(
                {
                    "query_id": qs,
                    "cand_id": pdf["cand_id"],
                    "cosine": (qrows * cm).sum(1),
                }
            )

    scored = cand.join(
        corpus.select(F.col("vec_id").alias("cand_id"), "embedding"), "cand_id"
    ).mapInPandas(score, "query_id long, cand_id long, cosine double")
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("cand_id"))
    rows = (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .collect()
    )
    got = {}
    for r in rows:
        got.setdefault(r["query_id"], []).append(r["cand_id"])
    return got, n_cand


def pq_recall(corpus_np, ids, q_ids, k, m, shortlist_mult=4):
    """PQ-ADC recall: split dims into m subspaces, 256-way k-means-lite
    codebooks (seeded sample medoids), ADC scores, exact re-rank of the
    top shortlist."""
    n, dim = corpus_np.shape
    sub = dim // m
    rng = np.random.RandomState(7)
    codebooks = []
    codes = np.empty((n, m), dtype=np.uint8)
    def _assign(block, cb):
        # squared distances via |x|^2 - 2 x.c + |c|^2 (matmul form: no
        # n x 256 x sub tensor at 100k-vector scale)
        d = (
            (block**2).sum(1)[:, None]
            - 2.0 * block @ cb.T
            + (cb**2).sum(1)[None, :]
        )
        return d.argmin(1)

    for s in range(m):
        block = corpus_np[:, s * sub : (s + 1) * sub]
        seed_idx = rng.choice(n, size=256, replace=False)
        cb = block[seed_idx].copy()
        # two Lloyd refinements keep it cheap and deterministic
        for _ in range(2):
            a = _assign(block, cb)
            for c in range(256):
                mask = a == c
                if mask.any():
                    cb[c] = block[mask].mean(0)
        codes[:, s] = _assign(block, cb)
        codebooks.append(cb)
    norms = np.linalg.norm(corpus_np, axis=1)
    unit = corpus_np / norms[:, None]
    idx_of = {v: i for i, v in enumerate(ids)}
    truth = exact_truth(corpus_np, ids, q_ids, k)
    hit = total = 0
    for q in q_ids:
        qi = idx_of[q]
        qv = corpus_np[qi]
        # ADC: per-subspace dot-product lookup tables
        score = np.zeros(n)
        for s in range(m):
            lut = codebooks[s] @ qv[s * sub : (s + 1) * sub]
            score += lut[codes[:, s]]
        score /= norms  # cosine up to the query's own norm (constant)
        score[qi] = -np.inf
        short = np.argpartition(-score, k * shortlist_mult)[: k * shortlist_mult]
        sims = unit[short] @ unit[qi]
        top = short[np.argsort(-sims, kind="stable")][:k]
        got = [int(ids[t]) for t in top]
        hit += len(set(got) & set(truth[q]))
        total += k
    return hit / total


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--repl", type=int, default=50)
    ap.add_argument("--queries", type=int, default=50)
    ap.add_argument("--k", type=int, default=10)
    ap.add_argument("--out", default="ANN_TUNING_r8.json")
    ap.add_argument("--cpus", type=int, default=16)
    # Smoke mode for the pytest suite: one nlist, two nprobes, one PQ m —
    # the same code path end to end in ~a minute, so the harness itself
    # cannot rot between rounds (r7 verdict "what's wrong" #3).
    ap.add_argument("--tiny", action="store_true")
    ap.add_argument(
        "--nlists",
        default="",
        help="comma list overriding the nlist grid (e.g. 64,256,1024 for the 1M sweep)",
    )
    ap.add_argument("--max-iter", type=int, default=20, help="KMeans iterations")
    ap.add_argument(
        "--regime",
        choices=["neardup", "uniform", "ladder"],
        default="neardup",
        help=(
            "corpus geometry: neardup = ±2%% replicas (IVF-trivial), "
            "uniform = 0.6-mix to noise (IVF worst case), ladder = "
            "per-replica mix ladder + HELD-OUT two-cloud queries (the "
            "realistic knee regime)"
        ),
    )
    args = ap.parse_args()

    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector
    from pyspark.sql import functions as F

    from pypgcdc_spark.session import get_spark

    spark = get_spark("ann_tuning", cpus=args.cpus)
    spark.sparkContext.setLogLevel("ERROR")

    spread = {"neardup": False, "uniform": "uniform", "ladder": "ladder"}[
        args.regime
    ]
    corpus = build_corpus(spark, args.repl, spread=spread)
    n_total = corpus.count()
    pdf = corpus.toPandas()
    ids = pdf["vec_id"].to_numpy()
    corpus_np = np.stack(pdf["embedding"].to_numpy()).astype(np.float64)
    if args.regime == "ladder":
        # HELD-OUT queries (not corpus members): 50/50 mixes of two bases
        # + small seeded noise — true neighbors sit at MODERATE cosine
        # with dense near-tie competition, the regime where the
        # recall-vs-scan knee actually exists (corpus-member queries ride
        # their own near-dup core and pin recall at 1.0 from nprobe=1).
        order = np.argsort(ids)
        base_rows = corpus_np[order[: 2000]]
        nb = len(base_rows)
        rng = np.random.RandomState(7)
        q_mat = np.stack(
            [
                0.5 * base_rows[i]
                + 0.5 * base_rows[(i + 997) % nb]
                + rng.uniform(-0.5, 0.5, base_rows.shape[1]) * 0.03
                for i in range(args.queries)
            ]
        )
        q_ids = [int(10**15 + i) for i in range(args.queries)]  # never collide
        truth = exact_truth_heldout(corpus_np, ids, q_mat, q_ids, args.k)
    else:
        q_ids = [int(v) for v in ids[: args.queries]]
        q_mat = corpus_np[: args.queries].copy()
        truth = exact_truth(corpus_np, ids, q_ids, args.k)

    feats = corpus.select(
        "vec_id",
        "embedding",
        array_to_vector(F.col("embedding").cast("array<double>")).alias("features"),
    ).localCheckpoint(eager=True)

    grid = []
    nlists = (16,) if args.tiny else (16, 32, 64, 128, 256)
    if args.nlists:
        nlists = tuple(int(x) for x in args.nlists.split(","))
    nprobes = (1, 4, 16) if args.tiny else (1, 2, 4, 8, 16, 32)
    ms = (8,) if args.tiny else (8, 16, 32)
    for nlist in nlists:
        t0 = time.perf_counter()
        model = KMeans(
            k=nlist, seed=42, maxIter=args.max_iter, featuresCol="features"
        ).fit(feats)
        centers_np = np.stack(
            [np.asarray(c, dtype=np.float64) for c in model.clusterCenters()]
        )
        # Corpus→list assignment happens ONCE per index (it IS the index)
        # and amortizes over every query — counted as build cost.
        assign = build_assign(spark, corpus, centers_np)
        assign.count()
        build_sec = round(time.perf_counter() - t0, 2)
        for nprobe in nprobes:
            if nprobe > nlist:
                continue
            t1 = time.perf_counter()
            got, n_cand = ivf_query(
                spark, corpus, assign, centers_np, q_ids, q_mat, args.k, nprobe
            )
            wall = round(time.perf_counter() - t1, 2)
            hit = sum(
                len(set(got.get(q, [])) & set(truth[q])) for q in q_ids
            )
            grid.append(
                {
                    "nlist": nlist,
                    "nprobe": nprobe,
                    "recall_at_k": round(hit / (len(q_ids) * args.k), 4),
                    "scanned_fraction": round(n_cand / (len(q_ids) * n_total), 4),
                    "query_wall_sec": wall,
                    "index_build_sec": build_sec,
                }
            )
            print(json.dumps(grid[-1]))

    pq = []
    # PQ is measured with corpus-member queries in every regime (it
    # computes its own exact truth; held-out ids don't index the codes).
    pq_q = [int(v) for v in ids[: args.queries]]
    for m in ms:
        t0 = time.perf_counter()
        r = pq_recall(corpus_np, ids, pq_q, args.k, m)
        pq.append(
            {
                "m_subquantizers": m,
                "bytes_per_vector": m,
                "compression_x": round(64 * 4 / m, 1),
                "recall_at_k_after_rerank": round(r, 4),
                "wall_sec": round(time.perf_counter() - t0, 2),
            }
        )
        print(json.dumps(pq[-1]))

    # TWO named operating points (r7 verdict: the artifact's single
    # "default_pick" disagreed with SCALE.md's recommended default):
    # * cheapest_at_recall_095 -- minimum scanned fraction subject to
    #   recall@k >= 0.95 (the latency-first pick);
    # * recommended -- minimum scanned fraction subject to recall@k
    #   >= 0.999 (the recall~1.0 default SCALE.md documents, matching
    #   its nlist~sqrt(N), nprobe-from-curve guidance).
    def _cheapest(floor):
        ok = [g for g in grid if g["recall_at_k"] >= floor]
        return (
            min(ok, key=lambda g: (g["scanned_fraction"], -g["recall_at_k"]))
            if ok
            else None
        )

    cheapest_095 = _cheapest(0.95)
    recommended = _cheapest(0.999) or cheapest_095
    report = {
        "corpus_vectors": int(n_total),
        "replication": args.repl,
        "corpus_mode": args.regime,
        "queries": len(q_ids),
        "k": args.k,
        "ivf_grid": grid,
        "pq_grid": pq,
        "operating_points": {
            "cheapest_at_recall_095": cheapest_095,
            "recommended": recommended,
        },
        # kept for round-over-round diffability; ALIGNED with SCALE.md's
        # documented default (= recommended), per the r7 verdict.
        "default_pick": recommended,
    }
    with open(args.out, "w") as f:
        json.dump(report, f, indent=1)
    print("cheapest@0.95:", json.dumps(cheapest_095))
    print("recommended:", json.dumps(recommended))
    spark.stop()


if __name__ == "__main__":
    main()
