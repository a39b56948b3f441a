"""A/B experiment: exact-jaccard verify of ml_minhash_lsh_jaccard_pairs.

Variants (interleaved, min-of-N, noop sink, guide §1.4):
  A  current   — JVM array_intersect + array_union per candidate pair
  B  intersect-only — one array_intersect; union size = n_a + n_b - inter
                 (token arrays are distinct by construction, so exact)
  C  numpy kernel — mapInPandas: per-pair set intersection in Python over
                 the Arrow-shipped token arrays (guide §4.2), sizes from
                 precomputed n_a/n_b; HALF_UP rounding replica for emission
                 and identical raw-sim filter.

Usage: python tools/exp_jaccard_kernel.py [passes]
Prints per-pass walls and row-count + content cross-checks.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from pypgcdc_spark.operators.ml_lsh import (
    MINHASH_BANDS,
    MINHASH_ROWS,
    WORD_JACCARD_SIM,
)
from pypgcdc_spark.queries import load
from pypgcdc_spark.session import get_spark


def build_cand(spark, sf_dir):
    """Shared prefix: MLlib minhash banding → deduped candidate pairs."""
    from pyspark.ml.feature import HashingTF, MinHashLSH
    from pyspark.ml.functions import vector_to_array

    (docs,) = load(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id", F.array_distinct(F.split(F.lower("text"), " ")).alias("tokens")
    )
    tf = HashingTF(inputCol="tokens", outputCol="features", numFeatures=1 << 14, binary=True)
    feats = tf.transform(toks)
    model = MinHashLSH(
        inputCol="features", outputCol="hashes",
        numHashTables=MINHASH_BANDS * MINHASH_ROWS, seed=42,
    ).fit(feats)
    hashed = model.transform(feats)

    def band_sig(b):
        return F.concat_ws(
            "_",
            *[
                vector_to_array(F.col("hashes")[b * MINHASH_ROWS + i])[0]
                .cast("long").cast("string")
                for i in range(MINHASH_ROWS)
            ],
        )

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
    return toks, cand


def variant_a(toks, cand):
    ta = toks.select(F.col("doc_id").alias("doc_a"), F.col("tokens").alias("tokens_a"))
    tb = toks.select(F.col("doc_id").alias("doc_b"), F.col("tokens").alias("tokens_b"))
    sim = F.size(F.array_intersect("tokens_a", "tokens_b")).cast("double") / F.size(
        F.array_union("tokens_a", "tokens_b")
    )
    return (
        cand.join(ta, "doc_a").join(tb, "doc_b")
        .withColumn("sim", sim)
        .filter(F.col("sim") >= WORD_JACCARD_SIM - 1e-9)
        .select("doc_a", "doc_b", F.round("sim", 3).alias("jaccard_sim"))
    )


def variant_b(toks, cand):
    ta = toks.select(
        F.col("doc_id").alias("doc_a"), F.col("tokens").alias("tokens_a"),
        F.size("tokens").alias("n_a"),
    )
    tb = toks.select(
        F.col("doc_id").alias("doc_b"), F.col("tokens").alias("tokens_b"),
        F.size("tokens").alias("n_b"),
    )
    inter = F.size(F.array_intersect("tokens_a", "tokens_b"))
    sim = inter.cast("double") / (F.col("n_a") + F.col("n_b") - inter)
    return (
        cand.join(ta, "doc_a").join(tb, "doc_b")
        .withColumn("sim", sim)
        .filter(F.col("sim") >= WORD_JACCARD_SIM - 1e-9)
        .select("doc_a", "doc_b", F.round("sim", 3).alias("jaccard_sim"))
    )


def variant_c(toks, cand):
    import pandas as pd

    from pypgcdc_spark.operators.clustering import _round_half_up

    ta = toks.select(F.col("doc_id").alias("doc_a"), F.col("tokens").alias("tokens_a"))
    tb = toks.select(F.col("doc_id").alias("doc_b"), F.col("tokens").alias("tokens_b"))
    paired = cand.join(ta, "doc_a").join(tb, "doc_b")

    def verify(batches):
        thr = WORD_JACCARD_SIM - 1e-9
        for pdf in batches:
            if not len(pdf):
                continue
            out_a, out_b, out_s = [], [], []
            da = pdf["doc_a"].to_numpy()
            db = pdf["doc_b"].to_numpy()
            la = pdf["tokens_a"].tolist()
            lb = pdf["tokens_b"].tolist()
            for i in range(len(pdf)):
                sa = frozenset(la[i])
                sb = frozenset(lb[i])
                inter = len(sa & sb)
                sim = inter / (len(sa) + len(sb) - inter)
                if sim >= thr:
                    out_a.append(da[i])
                    out_b.append(db[i])
                    out_s.append(_round_half_up(sim, 3))
            yield pd.DataFrame({"doc_a": out_a, "doc_b": out_b, "jaccard_sim": out_s})

    return paired.mapInPandas(verify, "doc_a LONG, doc_b LONG, jaccard_sim DOUBLE")


def main():
    passes = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("exp-jaccard", cpus=int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
    variants = {"A_current": variant_a, "B_intersect_only": variant_b, "C_numpy": variant_c}

    # Content cross-check at sf0.01 first (order-insensitive sorted rows).
    toks, cand = build_cand(spark, "/root/testdata/sf0.01")
    cand = cand.localCheckpoint(eager=True)
    ref = None
    for name, fn in variants.items():
        rows = sorted(map(tuple, fn(toks, cand).collect()))
        if ref is None:
            ref = rows
            print(f"{name}: {len(rows)} rows (reference)")
        else:
            print(f"{name}: {len(rows)} rows, identical={rows == ref}")

    # Timed A/B at the bench SF: shared candidate prefix checkpointed so
    # only the verify stage differs; interleaved passes, min-of-N.
    toks, cand = build_cand(spark, sf_dir)
    cand = cand.localCheckpoint(eager=True)
    n_cand = cand.count()
    print(f"candidates at {sf_dir}: {n_cand}")
    best = {k: None for k in variants}
    for p in range(passes):
        for name, fn in variants.items():
            spark.sparkContext.setJobDescription(f"verify:{name}:pass{p}")
            t0 = time.perf_counter()
            fn(toks, cand).write.format("noop").mode("overwrite").save()
            dt = time.perf_counter() - t0
            best[name] = dt if best[name] is None else min(best[name], dt)
            print(f"pass{p} {name}: {dt:.3f}s", flush=True)
    print("RESULT " + " ".join(f"{k}={v:.3f}" for k, v in best.items()))

    # Also time the FULL query end-to-end shape (banding + verify) for A vs
    # the best challenger, fresh lineage each pass.
    spark.stop()


if __name__ == "__main__":
    main()
