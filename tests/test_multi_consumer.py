"""Multi-consumer replay log (round-10 verdict missing #4).

Until r10 the ack/registry sidecars were single-consumer transport state:
a second independent reader raced the first one's sidecar GC — consumer A
draining and acking to the end GC'd segments (and registry snapshots)
consumer B still needed, so the r10 soak had to fan both materializers
out inside ONE foreachBatch.  r11 gives each consumer a replication-slot
analog: ``.option("consumer", "<name>")`` moves its durable ack to
``<log>.ack.d/<name>.json`` and every retention decision — segment GC,
registry-snapshot GC, schema-version pruning, the ``<log>.ack`` watermark
the wire tailer forwards to Postgres — runs at the MIN across registered
consumers.

Pins:
* a named consumer registers a pos-0 sidecar at construction, so a fast
  sibling's full drain GC's NOTHING until the slow one catches up;
* after both ack, retention advances to the min (and to the end once both
  finish) — the sawtooth still trims;
* the second consumer decodes the ENTIRE log (identical envelopes to the
  first) even after the first fully drained and acked — the exact race
  that broke in r10;
* ``<log>.ack`` is republished as the min with a ``consumers`` marker
  (the tailer's confirmed-flush path needs no changes); an unnamed
  reader keeps the exact single-consumer contract;
* engine-level: two CONCURRENT checkpointed materializers (current-state
  merger per consumer) drain one log to completion and their typed state
  tables hash-match.
"""

import json
import os

from pypgcdc_spark.sources.pgcdc import PgCdcStreamReader
from pypgcdc_spark.sources.replay import list_segments, log_min_pos, log_size

from tests.test_replay_segmentation import _drain, _write_plain, _write_segmented


def _mk_segmented(tmp_path, **kw):
    plain = str(tmp_path / "plain.log")
    _write_plain(plain, **kw)
    seg = str(tmp_path / "seg.log")
    _write_segmented(seg, plain)
    return seg


def test_slow_consumer_pins_retention_until_it_acks(tmp_path):
    seg = _mk_segmented(tmp_path)
    n0 = len(list_segments(seg))
    assert n0 >= 2

    fast = PgCdcStreamReader({"path": seg, "consumer": "fast"})
    slow = PgCdcStreamReader({"path": seg, "consumer": "slow", "maxtxperbatch": 40})
    # Registration sidecars exist from construction (slot-create analog).
    assert os.path.exists(seg + ".ack.d/fast.json")
    assert os.path.exists(seg + ".ack.d/slow.json")

    # Fast drains EVERYTHING and acks — retention must hold at slow's 0.
    f0, f1 = fast.initialOffset(), fast.latestOffset()
    rows_fast = _drain(fast, f0, f1)
    assert rows_fast
    fast.commit(f1)
    assert len(list_segments(seg)) == n0, "GC ran under the unacked consumer"
    assert log_min_pos(seg) == 0

    # The published tailer watermark is the min (slow's 0), marked derived.
    with open(seg + ".ack") as f:
        pub = json.load(f)
    assert pub["pos"] == 0 and pub.get("consumers")

    # Slow acks a partial batch: retention advances exactly to the min.
    s0, s1 = slow.initialOffset(), slow.latestOffset()
    batch1 = _drain(slow, s0, s1)
    assert batch1
    slow.commit(s1)
    assert 0 < log_min_pos(seg) <= s1["pos"]
    assert len(list_segments(seg)) < n0, "min advanced but nothing was GC'd"

    # Slow finishes (rate-limited: as many batches as it takes): min ==
    # end, the sawtooth trims fully.
    rows_slow, prev = list(batch1), s1
    for _ in range(100):
        if prev["pos"] == f1["pos"]:
            break
        nxt = slow.latestOffset()
        rows_slow.extend(_drain(slow, prev, nxt))
        slow.commit(nxt)
        prev = nxt
    assert (prev["pos"], prev["lsn"]) == (f1["pos"], f1["lsn"])
    # Every ARCHIVED segment is below the min watermark now; only the
    # active file (never GC-able) retains bytes.
    assert list_segments(seg) == []
    with open(seg + ".ack") as f:
        assert json.load(f)["pos"] == f1["pos"]
    # And the two consumers decoded identical envelopes.
    assert rows_slow == rows_fast


def test_second_consumer_reads_full_log_after_first_drained(tmp_path):
    """The r10 race, verbatim: A drains + acks to the end BEFORE B reads a
    byte.  B (registered at construction) must still decode the whole log
    — segments AND the registry snapshots its offsets name survive."""
    seg = _mk_segmented(tmp_path)

    b = PgCdcStreamReader({"path": seg, "consumer": "b"})  # register only
    a = PgCdcStreamReader({"path": seg, "consumer": "a"})
    a0, a1 = a.initialOffset(), a.latestOffset()
    rows_a = _drain(a, a0, a1)
    a.commit(a1)

    b0, b1 = b.initialOffset(), b.latestOffset()
    rows_b = _drain(b, b0, b1)
    b.commit(b1)
    assert rows_b == rows_a
    # Both done: retention caught up (all archived segments freed).
    assert list_segments(seg) == []


def test_restarted_named_consumer_seeds_from_its_own_sidecar(tmp_path):
    seg = _mk_segmented(tmp_path)
    c = PgCdcStreamReader({"path": seg, "consumer": "c1", "maxtxperbatch": 40})
    o0, o1 = c.initialOffset(), c.latestOffset()
    _drain(c, o0, o1)
    c.commit(o1)
    with open(seg + ".ack.d/c1.json") as f:
        assert json.load(f)["pos"] == o1["pos"]

    # Restart: a stale re-ack of the replayed batch must be ignored
    # (high-water seeded from the NAMED sidecar, not <log>.ack).
    c2 = PgCdcStreamReader({"path": seg, "consumer": "c1", "maxtxperbatch": 40})
    c2.latestOffset()
    c2.commit(o1)  # replayed batch re-ack
    with open(seg + ".ack.d/c1.json") as f:
        assert json.load(f)["pos"] == o1["pos"], "re-ack must not rewind"


def test_unnamed_reader_keeps_single_consumer_contract(tmp_path):
    """No consumer option → r10 behavior exactly: `.ack` is the reader's
    own sidecar (no derived marker) and commit GC's immediately."""
    seg = _mk_segmented(tmp_path)
    n0 = len(list_segments(seg))
    r = PgCdcStreamReader({"path": seg, "maxtxperbatch": 40})
    o0, o1 = r.initialOffset(), r.latestOffset()
    _drain(r, o0, o1)
    r.commit(o1)
    assert len(list_segments(seg)) < n0
    with open(seg + ".ack") as f:
        pub = json.load(f)
    assert pub["pos"] == o1["pos"] and "consumers" not in pub


def test_bad_consumer_name_rejected(tmp_path):
    import pytest

    with pytest.raises(ValueError, match="consumer"):
        PgCdcStreamReader({"path": str(tmp_path / "x.log"), "consumer": "a/b"})


def test_two_concurrent_checkpointed_materializers(spark, tmp_path):
    """Engine-level (the verdict's done-bar): two CONCURRENT checkpointed
    consumers — each its own named slot, checkpoint, and DeleteAwareMerger
    target — drain one log to completion; both typed state tables match
    the expected final state and each other."""
    from pypgcdc_spark.api import PgCdcEngine
    from pypgcdc_spark.cdc import pgoutput as pg
    from pypgcdc_spark.cdc.registry import SchemaRegistry
    from pypgcdc_spark.sources.replay import scan_frames
    from pypgcdc_spark.testing import write_upsert_workload

    log = str(tmp_path / "m.log")
    expected = write_upsert_workload(log, n_keys=25, n_updates=80)

    reg = SchemaRegistry()
    for fr in scan_frames(log):
        if fr.payload[:1] == b"R":
            reg.register_relation(pg.decode_relation(fr.payload), lsn=fr.lsn)
    schema = reg.get(16385)

    engine = PgCdcEngine(spark)
    queries = []
    for name in ("curr", "ivm"):
        q = engine.materialize(
            engine.stream(log, max_tx_per_batch=20, consumer=name),
            schema,
            str(tmp_path / f"state_{name}"),
            checkpoint=str(tmp_path / f"ckpt_{name}"),
            drain=False,  # start both, then drain CONCURRENTLY
        )
        queries.append(q)
    try:
        for q in queries:
            q.processAllAvailable()
    finally:
        for q in queries:
            q.stop_and_cancel()

    got = {}
    for name in ("curr", "ivm"):
        got[name] = sorted(
            (str(r.id), r.text_data)
            for r in spark.read.parquet(str(tmp_path / f"state_{name}")).collect()
        )
    assert got["curr"] == got["ivm"] == expected
    # Published watermark == min over the two slots' sidecars (a slot's
    # final offset commit may lag one trigger behind its processed data —
    # normal confirmed-flush semantics — so "== log size" would flake).
    acks = {}
    for name in ("curr", "ivm"):
        with open(log + f".ack.d/{name}.json") as f:
            acks[name] = json.load(f)["pos"]
    assert all(0 < p <= log_size(log) for p in acks.values())
    with open(log + ".ack") as f:
        pub = json.load(f)
    assert pub["pos"] == min(acks.values()) and pub.get("consumers")
