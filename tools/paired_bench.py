"""Drift-proof paired benchmark: old-vs-new interleaved per query.

The VM host drifts 15-20% within a session, so round-over-round wall
clocks (BENCH_rN.json vs BENCH_rN+1.json) confound code changes with
host state.  This tool removes the confound the same way the decode
microbench does — by interleaving the two contenders in time:

* a git worktree of the OLD round's commit and the CURRENT tree each get
  a long-lived runner subprocess with a warm Spark session;
* for every query the two runners execute back-to-back, repeated
  ``--reps`` times (old, new, old, new, ...), so both sides see the same
  host conditions within seconds of each other;
* per query we record min-of-reps for both sides and the new/old ratio
  (<1 = current code faster).

Usage:
    python tools/paired_bench.py --old <commit> [--out BENCH_r6_paired.json]
        [--sf /root/testdata/sf0.1] [--reps 2] [--queries q1,q2,...]

Writes one JSON file with per-query {old, new, ratio} and suite ratios.
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import tempfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# Default paired set: the 21-query headline suite plus the round-4/5/6
# perf watch items (IVM family, ANN, streaming joins).
WATCH = [
    "cdc_incremental_view",
    "cdc_targeted_erasure",
    "cdc_join_view_ivm",
    "ann_ivf_flat",
    "stream_stream_join",
    "dedup_connected_components",
    "graph_pagerank_bucketed",
    # r6 session-2 optimizations: map-side Lloyd assignment, per-cluster
    # Gram-matrix SemDeDup, degree-embedded broadcast PageRank.
    "embed_kmeans_domains",
    "dedup_semantic_semdedup",
    "graph_pagerank",
]

RUNNER = r"""
import json, os, sys, time
sys.path.insert(0, sys.argv[1])
os.chdir(sys.argv[1])
from pypgcdc_spark.queries import REGISTRY, ensure_registered
from pypgcdc_spark.session import get_spark
ensure_registered()
cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "0") or 0) or (os.cpu_count() or 8)
spark = get_spark("paired-bench-" + sys.argv[2], cpus=cpus)
spark.conf.set("spark.sql.shuffle.partitions", str(cpus))
spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
warm = "/root/testdata/sf0.001"
print("READY", flush=True)
for line in sys.stdin:
    parts = line.split()
    if not parts:
        continue
    if parts[0] == "WARM":
        name = parts[1]
        try:
            REGISTRY[name].fn(spark, warm).write.format("noop").mode("overwrite").save()
        except Exception:
            pass
        print("WARMED", name, flush=True)
    elif parts[0] == "RUN":
        name, sf_dir = parts[1], parts[2]
        try:
            t0 = time.perf_counter()
            REGISTRY[name].fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            dt = time.perf_counter() - t0
            print("TIME", name, round(dt, 3), flush=True)
        except Exception as e:
            print("FAIL", name, str(e)[:120].replace("\n", " "), flush=True)
        try:
            spark._jvm.System.gc()
        except Exception:
            pass
    elif parts[0] == "QUIT":
        break
print("BYE", flush=True)
"""


class Runner:
    def __init__(self, tree: str, tag: str):
        script = os.path.join(tempfile.mkdtemp(prefix="pairedbench_"), "runner.py")
        with open(script, "w") as f:
            f.write(RUNNER)
        self.tag = tag
        self.proc = subprocess.Popen(
            [sys.executable, script, tree, tag],
            stdin=subprocess.PIPE,
            stdout=subprocess.PIPE,
            stderr=subprocess.DEVNULL,
            text=True,
        )
        self._expect("READY")

    def _expect(self, word: str) -> list:
        while True:
            line = self.proc.stdout.readline()
            if not line:
                raise RuntimeError(f"runner {self.tag} died")
            parts = line.split()
            if parts and parts[0] == word:
                return parts
            if parts and parts[0] == "FAIL":
                return parts

    def warm(self, name: str) -> None:
        self.proc.stdin.write(f"WARM {name}\n")
        self.proc.stdin.flush()
        self._expect("WARMED")

    def run(self, name: str, sf_dir: str):
        self.proc.stdin.write(f"RUN {name} {sf_dir}\n")
        self.proc.stdin.flush()
        parts = self._expect("TIME")
        if parts[0] == "FAIL":
            return None
        return float(parts[2])

    def quit(self) -> None:
        try:
            self.proc.stdin.write("QUIT\n")
            self.proc.stdin.flush()
            self.proc.wait(30)
        except Exception:
            self.proc.kill()


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--old", required=True, help="git commit/tag of the OLD side")
    ap.add_argument("--out", default="BENCH_r6_paired.json")
    ap.add_argument("--sf", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--reps", type=int, default=2)
    ap.add_argument("--queries", default="")
    args = ap.parse_args()

    sys.path.insert(0, REPO)
    import bench

    names = (
        [q for q in args.queries.split(",") if q]
        if args.queries
        else bench.HEADLINE + WATCH
    )

    old_tree = tempfile.mkdtemp(prefix="paired_old_")
    subprocess.run(
        ["git", "worktree", "add", "--detach", old_tree, args.old],
        cwd=REPO,
        check=True,
        capture_output=True,
    )
    try:
        old = Runner(old_tree, "old")
        new = Runner(REPO, "new")
        for r in (old, new):
            for q in names:
                r.warm(q)

        per_query = {}
        for q in names:
            olds, news = [], []
            for _ in range(args.reps):
                t_o = old.run(q, args.sf)
                t_n = new.run(q, args.sf)
                if t_o is not None:
                    olds.append(t_o)
                if t_n is not None:
                    news.append(t_n)
            if olds and news:
                o, n = min(olds), min(news)
                per_query[q] = {
                    "old": o,
                    "new": n,
                    "ratio": round(n / o, 3),
                    "old_reps": olds,
                    "new_reps": news,
                }
                print(f"{q}: old {o:.2f}s new {n:.2f}s ratio {n/o:.2f}", flush=True)
            else:
                per_query[q] = {"old": olds or None, "new": news or None, "ratio": None}
                print(f"{q}: FAILED old={olds} new={news}", flush=True)
        old.quit()
        new.quit()
    finally:
        subprocess.run(
            ["git", "worktree", "remove", "--force", old_tree],
            cwd=REPO,
            capture_output=True,
        )

    ok = {q: v for q, v in per_query.items() if v.get("ratio") is not None}
    headline_ok = [q for q in bench.HEADLINE if q in ok]
    suite_old = round(sum(ok[q]["old"] for q in headline_ok), 3)
    suite_new = round(sum(ok[q]["new"] for q in headline_ok), 3)
    out = {
        "metric": "paired_interleaved_wall_seconds",
        "old_commit": args.old,
        "sf_dir": args.sf,
        "reps": args.reps,
        "headline_old_sec": suite_old,
        "headline_new_sec": suite_new,
        "headline_ratio": round(suite_new / suite_old, 3) if suite_old else None,
        "queries": per_query,
        "note": (
            "old and new executed interleaved (old,new,old,new) per query in "
            "one host window; min-of-reps per side; ratio<1 = current faster"
        ),
    }
    with open(os.path.join(REPO, args.out), "w") as f:
        json.dump(out, f, indent=1, sort_keys=True)
    print(json.dumps({k: v for k, v in out.items() if k != "queries"}))


if __name__ == "__main__":
    main()
