"""Spark-side fault injection for the parquet-state maintainers.

Round-7 soak killed sockets and the consumer process; these tests kill
*tasks*: partial task re-runs inside a micro-batch (failing-once UDF
under ``local[4,3]`` retries, via ``chaos_harness.py`` in a subprocess —
the shared test session's default maxFailures would abort the job), plus
the at-least-once hazards Structured Streaming itself creates —
foreachBatch replaying a whole batch after a failure, and out-of-order /
duplicate deliveries.  The dynamic-partition-overwrite + tombstone +
LSN-guard discipline must make all of it idempotent, on all three
maintainers (MinHash signature index, bucketed IVM, join IVM).

The negative control (``test_out_of_order_guard_has_teeth``) blinds the
out-of-order guard and shows the same assertion then FAILS — i.e. these
tests detect a maintainer that lost its guard.
"""

import json
import subprocess
import sys

import pytest

from pypgcdc_spark.operators.cdc_dedup import SignatureIndexMaintainer
from pypgcdc_spark.operators.ivm import BucketedViewMaintainer
from pypgcdc_spark.operators.join_ivm import A_SCHEMA, JoinViewMaintainer


def _sig_batch(spark, rows):
    return spark.createDataFrame(rows, "lsn LONG, op STRING, doc_id LONG, text STRING")


def _sig_state(maint):
    return sorted(
        (tuple(r) for r in maint.spark.read.parquet(maint.path).collect()), key=repr
    )


@pytest.mark.slow
def test_maintainers_converge_under_task_retries():
    """All three maintainers produce bit-identical state when every task
    fails its first attempt and re-runs (speculative-duplicate /
    task-retry chaos).  Runs chaos_harness.py in a subprocess so task
    retries can be enabled without touching the shared session."""
    import os

    here = os.path.dirname(os.path.abspath(__file__))
    proc = subprocess.run(
        [sys.executable, os.path.join(here, "chaos_harness.py")],
        capture_output=True,
        text=True,
        timeout=600,
    )
    verdict_lines = [
        ln for ln in proc.stdout.splitlines() if ln.startswith("CHAOS_VERDICT ")
    ]
    assert verdict_lines, f"no verdict; stderr tail: {proc.stderr[-2000:]}"
    verdict = json.loads(verdict_lines[-1].split(" ", 1)[1])
    assert verdict["ok"], verdict
    # The chaos actually fired: injected failures appear in the log.
    assert proc.stderr.count("chaos: injected failure") >= 3


def test_batch_replay_is_idempotent(spark, tmp_path):
    """foreachBatch is at-least-once: after a sink-side failure Spark
    re-runs the SAME batch.  Re-applying a batch must leave every
    maintainer's state and aggregate unchanged."""
    # Signature index.
    m = SignatureIndexMaintainer(spark, str(tmp_path / "sig"), n_buckets=2)
    b0 = _sig_batch(spark, [(10, "I", 1, "alpha beta gamma delta"), (20, "D", 2, None)])
    b1 = _sig_batch(spark, [(30, "U", 1, "epsilon zeta eta theta")])
    m.apply_batch(b0, 0)
    m.apply_batch(b1, 1)
    snap = _sig_state(m)
    m.apply_batch(b1, 1)  # replay
    assert _sig_state(m) == snap

    # Bucketed IVM.
    ivm_schema = "event_id LONG, user_id LONG, event_type STRING, value DOUBLE"
    iv = BucketedViewMaintainer(spark, str(tmp_path / "ivm"), n_buckets=2)
    ib0 = spark.createDataFrame([(1, 1, "purchase", 2.0), (2, 2, "view", 1.0)], ivm_schema)
    ib1 = spark.createDataFrame([(3, 1, "refund", 4.0)], ivm_schema)
    iv.apply_batch(ib0, 0)
    iv.apply_batch(ib1, 1)
    agg = sorted((r.event_type, r.n_keys, r.total_cents) for r in iv.aggregate().collect())
    keys = sorted((tuple(r) for r in spark.read.parquet(iv.key_path).collect()), key=repr)
    iv.apply_batch(ib1, 1)  # replay
    assert sorted(
        (r.event_type, r.n_keys, r.total_cents) for r in iv.aggregate().collect()
    ) == agg
    assert sorted(
        (tuple(r) for r in spark.read.parquet(iv.key_path).collect()), key=repr
    ) == keys

    # Join IVM.
    jm = JoinViewMaintainer(spark, str(tmp_path / "join"))
    jb0 = spark.createDataFrame(
        [(10, "A", 1, 0, 7, "HIGH", 0), (11, "B", 1, 1, 0, None, 500)], A_SCHEMA
    )
    jb1 = spark.createDataFrame([(20, "B", 1, 2, 0, None, 700)], A_SCHEMA)
    jm.apply_batch(jb0, 0)
    jm.apply_batch(jb1, 1)
    jagg = sorted((r.priority, r.n_lines, r.total_cents) for r in jm.aggregate().collect())
    jstate = sorted(
        (tuple(r) for r in jm.state.read(jm.STATE_SCHEMA).collect()), key=repr
    )
    jm.apply_batch(jb1, 1)  # replay
    assert sorted(
        (r.priority, r.n_lines, r.total_cents) for r in jm.aggregate().collect()
    ) == jagg
    assert sorted(
        (tuple(r) for r in jm.state.read(jm.STATE_SCHEMA).collect()), key=repr
    ) == jstate
    assert jagg == [("HIGH", 2, 1200)]  # both B lines joined, counted once each


def test_join_ivm_crash_between_state_and_marker(spark, tmp_path):
    """The r8 residual window: a crash AFTER the state write but BEFORE
    the batch marker re-applied one batch on restart, double-counting the
    join IVM's accumulating B-side.  The manifest protocol removes the
    window: data staging and marker are ONE atomic rename, so a crash at
    ANY point inside apply_batch leaves the committed state untouched and
    the redelivered batch applies against it exactly once.

    The crash is injected at the worst spot — after the staged data files
    are fully on disk, a millisecond before the manifest swap."""
    jb0 = spark.createDataFrame(
        [(10, "A", 1, 0, 7, "HIGH", 0), (11, "B", 1, 1, 0, None, 500)], A_SCHEMA
    )
    jb1 = spark.createDataFrame([(20, "B", 1, 2, 0, None, 700)], A_SCHEMA)

    # Control: the no-crash run.
    ctl = JoinViewMaintainer(spark, str(tmp_path / "ctl"))
    ctl.apply_batch(jb0, 0)
    ctl.apply_batch(jb1, 1)
    want_agg = sorted(
        (r.priority, r.n_lines, r.total_cents) for r in ctl.aggregate().collect()
    )
    want_state = sorted(
        (tuple(r) for r in ctl.state.read(ctl.STATE_SCHEMA).collect()), key=repr
    )
    assert want_agg == [("HIGH", 2, 1200)]

    # Crash run: batch 1 dies between staging and the manifest swap.
    jm = JoinViewMaintainer(spark, str(tmp_path / "crash"))
    jm.apply_batch(jb0, 0)
    real_finalize = jm.state.finalize

    def boom(*a, **k):
        raise RuntimeError("injected crash before manifest swap")

    jm.state.finalize = boom
    with pytest.raises(RuntimeError, match="injected crash"):
        jm.apply_batch(jb1, 1)
    jm.state.finalize = real_finalize

    # "Restart": a FRESH maintainer over the same dir (driver state gone —
    # the aggregate must restore from the manifest, not memory) sees
    # batch 1 as NOT applied and the redelivery lands exactly once.
    jm2 = JoinViewMaintainer(spark, str(tmp_path / "crash"))
    assert not jm2.state.already_applied(1)
    jm2.apply_batch(jb1, 1)  # redelivery
    assert sorted(
        (r.priority, r.n_lines, r.total_cents) for r in jm2.aggregate().collect()
    ) == want_agg
    assert sorted(
        (tuple(r) for r in jm2.state.read(jm2.STATE_SCHEMA).collect()), key=repr
    ) == want_state
    # And a replay of the now-committed batch is still a no-op.
    jm2.apply_batch(jb1, 1)
    assert sorted(
        (r.priority, r.n_lines, r.total_cents) for r in jm2.aggregate().collect()
    ) == want_agg


def test_out_of_order_batches_converge(spark, tmp_path):
    """Duplicate/reordered delivery: applying an OLDER batch after a
    newer one must not move state backwards — including across a
    tombstone (the resurrect hazard)."""
    m = SignatureIndexMaintainer(spark, str(tmp_path / "sig"), n_buckets=2)
    newer = _sig_batch(spark, [(50, "D", 1, None)])  # delete at lsn 50
    older = _sig_batch(spark, [(40, "U", 1, "stale resurrection text here")])
    m.apply_batch(_sig_batch(spark, [(10, "I", 1, "alpha beta gamma delta")]), 0)
    m.apply_batch(newer, 1)
    snap = _sig_state(m)
    m.apply_batch(older, 2)  # late, stale
    assert _sig_state(m) == snap
    assert m.signatures().count() == 0  # doc stays deleted

    iv = BucketedViewMaintainer(spark, str(tmp_path / "ivm"), n_buckets=2)
    schema = "event_id LONG, user_id LONG, event_type STRING, value DOUBLE"
    iv.apply_batch(spark.createDataFrame([(5, 1, "purchase", 9.0)], schema), 0)
    snap = sorted((r.event_type, r.n_keys, r.total_cents) for r in iv.aggregate().collect())
    iv.apply_batch(spark.createDataFrame([(3, 1, "view", 1.0)], schema), 1)  # stale
    assert sorted(
        (r.event_type, r.n_keys, r.total_cents) for r in iv.aggregate().collect()
    ) == snap


def test_out_of_order_guard_has_teeth(spark, tmp_path, monkeypatch):
    """Blind the signature maintainer's out-of-order guard (state-blind
    _read_state) and the stale-delete scenario CORRUPTS state — proving
    the assertions above fail on a maintainer without the guard."""
    m = SignatureIndexMaintainer(spark, str(tmp_path / "sig"), n_buckets=2)
    m.apply_batch(_sig_batch(spark, [(10, "I", 1, "alpha beta gamma delta")]), 0)
    m.apply_batch(_sig_batch(spark, [(50, "D", 1, None)]), 1)
    assert m.signatures().count() == 0

    from pypgcdc_spark.operators.dedup import N_MINHASH

    mh_cols = ", ".join(f"mh{s} LONG" for s in range(N_MINHASH))
    schema = f"doc_id LONG, lsn LONG, deleted BOOLEAN, {mh_cols}"
    monkeypatch.setattr(
        SignatureIndexMaintainer,
        "_read_state",
        lambda self, bucket_ids: self.spark.createDataFrame([], schema),
    )
    m.apply_batch(
        _sig_batch(spark, [(40, "U", 1, "stale resurrection text here")]), 2
    )
    assert m.signatures().count() > 0, (
        "guard-less maintainer must resurrect the deleted doc — if this "
        "count is 0 the test lost its teeth"
    )
