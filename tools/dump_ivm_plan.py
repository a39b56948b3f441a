"""Capture the per-batch delta plan of an IVM maintainer query.

The IVM gate rows (cdc_incremental_view / cdc_join_view_ivm /
cdc_targeted_erasure) run their real computation inside foreachBatch, so
`tools/dump_plans.py` (which explains the RETURNED frame) only shows the
metadata-sized aggregate.  This harness runs the query for real and
intercepts every `DataFrame.localCheckpoint` — the single materialization
point of each batch's delta aggregation W — dumping `.explain("formatted")`
of the frame exactly as the maintainer built it.

Usage::

    python tools/dump_ivm_plan.py cdc_join_view_ivm out.txt
    # before-plans: run from a git worktree of the old commit.
"""

from __future__ import annotations

import contextlib
import io
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    name, out_path = sys.argv[1], sys.argv[2]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    # Spark 4: the classic DataFrame overrides the abstract base's
    # localCheckpoint, so patch the implementation class.
    import pyspark.sql.classic.dataframe as D

    captured: list = []
    orig = D.DataFrame.localCheckpoint

    def hooked(self, eager=True):
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            self.explain("formatted")
        captured.append(buf.getvalue())
        return orig(self, eager=eager)

    D.DataFrame.localCheckpoint = hooked
    try:
        import __spark_entry__ as entrymod
        from pypgcdc_spark.session import get_spark

        spark = get_spark(
            "dump-ivm-plan", cpus=int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
        )
        fn = entrymod.extended_queries()[name]
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
    finally:
        D.DataFrame.localCheckpoint = orig

    with open(out_path, "w") as f:
        f.write(f"# {name} — per-batch delta plans (every localCheckpoint) at {sf_dir}\n")
        f.write(f"# {len(captured)} checkpointed frames captured; plans below in batch order\n\n")
        for i, plan in enumerate(captured):
            f.write(f"## checkpoint {i}\n{plan}\n")
    print(f"wrote {len(captured)} plans to {out_path}")


if __name__ == "__main__":
    main()
