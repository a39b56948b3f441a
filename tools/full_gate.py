"""Multi-SF full-inventory gate (round-3 verdict task 2).

Runs tools/check_correctness.py over the COMPLETE registry (primary +
extended) at BOTH sf0.001 and sf0.01 — the round-3 percentile bug shipped
because the full run only executed at one SF — and merges the two records
into one artifact::

    python tools/full_gate.py CORRECTNESS_FULL_r04.json

Exit status is non-zero unless every query hash-matches at every SF.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import tempfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SFS = ["/root/testdata/sf0.001", "/root/testdata/sf0.01"]


def main():
    out_path = sys.argv[1] if len(sys.argv) > 1 else "CORRECTNESS_FULL.json"
    merged = {"sfs": {}, "all_green": True}
    for sf_dir in SFS:
        sf = os.path.basename(sf_dir)
        with tempfile.NamedTemporaryFile(suffix=".json", delete=False) as tf:
            tmp = tf.name
        env = dict(os.environ, SF_DIR=sf_dir)
        proc = subprocess.run(
            [sys.executable, os.path.join(REPO, "tools", "check_correctness.py"),
             f"--json={tmp}"],
            env=env,
            cwd=REPO,
        )
        with open(tmp) as f:
            rec = json.load(f)
        os.unlink(tmp)
        merged["sfs"][sf] = rec
        green = proc.returncode == 0 and rec["failed"] == 0
        merged["all_green"] = merged["all_green"] and green
        print(f"[full_gate] {sf}: {rec['passed']} passed, {rec['failed']} failed, "
              f"{rec['rows_only']} rows-only of {rec['total']}")
    # Headline block mirrors the single-SF artifact shape so round-over-
    # round tooling keeps working; counts are the per-SF minima.
    first = merged["sfs"][os.path.basename(SFS[-1])]
    merged.update(
        {
            "total": first["total"],
            "passed": min(r["passed"] for r in merged["sfs"].values()),
            "failed": max(r["failed"] for r in merged["sfs"].values()),
            "rows_only": max(r["rows_only"] for r in merged["sfs"].values()),
            "sf_dirs": SFS,
        }
    )
    with open(os.path.join(REPO, out_path), "w") as f:
        json.dump(merged, f, indent=1, sort_keys=True)
    print(f"[full_gate] wrote {out_path}; all_green={merged['all_green']}")
    sys.exit(0 if merged["all_green"] else 1)


if __name__ == "__main__":
    main()
