"""Smoke tests for the artifact harnesses (r7 verdict "what's wrong" #3:
``tools/soak.py`` and ``tools/ann_tuning.py`` produced their artifacts
once and were not CI-wired — a harness that rots silently is worse than
none).  Each smoke run exercises the full code path end to end in a few
minutes: the soak boots a real throwaway PostgreSQL cluster, seeds state
through replication, injects socket kills, and verifies the three-way
hash; the tuning run trains an index, sweeps a reduced grid, and emits
both operating points.
"""

import json
import os
import shutil
import subprocess
import sys

import pytest

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(HERE)


@pytest.mark.slow
@pytest.mark.skipif(
    shutil.which("initdb") is None or shutil.which("pg_ctl") is None,
    reason="PostgreSQL server binaries not installed",
)
def test_soak_smoke(tmp_path):
    out = str(tmp_path / "soak_smoke.json")
    proc = subprocess.run(
        [
            sys.executable,
            os.path.join(REPO, "tools", "soak.py"),
            "--minutes", "0.8",
            "--state-rows", "15000",
            "--buckets", "8",
            "--cpus", "4",
            "--out", out,
        ],
        capture_output=True,
        text=True,
        timeout=540,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    r = json.load(open(out))
    assert r["match_materialized_vs_server"] and r["match_replay_vs_server"]
    assert r["state_rows"] >= 14000  # seeding flowed through replication
    assert r["merger_buckets"] == 8
    assert r["faults"]["socket_kill"] >= 1  # chaos actually fired


@pytest.mark.slow
def test_ann_tuning_smoke(tmp_path):
    out = str(tmp_path / "ann_smoke.json")
    proc = subprocess.run(
        [
            sys.executable,
            os.path.join(REPO, "tools", "ann_tuning.py"),
            "--tiny",
            "--repl", "2",
            "--queries", "8",
            "--k", "5",
            "--cpus", "4",
            "--out", out,
        ],
        capture_output=True,
        text=True,
        timeout=540,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    r = json.load(open(out))
    assert r["ivf_grid"] and r["pq_grid"]
    ops = r["operating_points"]
    assert set(ops) == {"cheapest_at_recall_095", "recommended"}
    assert r["default_pick"] == ops["recommended"]  # aligned with SCALE.md
    rec = ops["recommended"]
    assert rec is not None and rec["recall_at_k"] >= 0.9
    if ops["cheapest_at_recall_095"] is not None:
        assert ops["cheapest_at_recall_095"]["recall_at_k"] >= 0.95


def test_parallel_cpu_canary_smoke():
    """bench.py's all-cores canary (r9): must produce a sane efficiency
    figure quickly — it runs inside every bench, so a hang or an error
    here would sink the artifact.  Small n_rows keeps this a few
    seconds; efficiency bounds are deliberately loose (the whole point
    of the canary is that this number MOVES with host contention)."""
    sys.path.insert(0, REPO)
    import bench

    r = bench.parallel_cpu_canary(n_rows=300)
    assert "error" not in r, r
    assert r["nproc"] >= 1
    assert r["single_msg_per_sec"] > 0
    if r["nproc"] >= 2:
        assert r["aggregate_msg_per_sec"] > r["single_msg_per_sec"]
    else:
        # One core: the pooled run measures the same work once; normal
        # variance can land at or below the single-thread number.
        assert r["aggregate_msg_per_sec"] >= 0.5 * r["single_msg_per_sec"]
    assert 0.05 <= r["scaling_efficiency"] <= 2.0
