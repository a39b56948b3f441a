"""Regression tests for the round-1 ADVICE findings.

Each test reproduces one reported defect scenario and pins the fixed
behavior:

1. an open (uncommitted) transaction spanning two ``latestOffset`` ticks
   must not lose its early frames (sources/pgcdc.py ``_scan_forward``);
2. an UPDATE that sets a column to NULL must materialize NULL, not carry
   the previous value forward through the TOAST window (cdc/apply.py);
3. Delete / Update-with-before-image events must key on the pkey
   projection so ``current_state`` dedups them against Inserts
   (cdc/transform.py);
4. after a checkpoint restart the stream offsets must never move
   backwards and stale re-acks must not rewind the ``.ack`` sidecar;
5. ``begin_lsn`` is the Begin frame's own LSN and ``commit_lsn`` the tx
   end LSN (previously both were Begin.final_lsn).
"""

from datetime import datetime, timezone

import pytest

from pypgcdc_spark.cdc import pgoutput as pg
from pypgcdc_spark.cdc.apply import current_state, typed_state
from pypgcdc_spark.cdc.registry import SchemaRegistry
from pypgcdc_spark.cdc.transform import MessageTransformer
from pypgcdc_spark.sources.pgcdc import PgCdcStreamReader
from pypgcdc_spark.sources.replay import ReplayLogWriter, scan_frames
from pypgcdc_spark.testing import (
    INTEGRATION_COLS,
    INTEGRATION_RELID,
    WorkloadWriter,
    write_reference_workload,
)

_TS = datetime(2024, 1, 1, tzinfo=timezone.utc)


def _row(k, v, text="t"):
    return [str(k), f'{{"data": {v}}}', f"{v}.00", "2024-01-01 00:00:00+00", text]


def _drain(reader, start, end):
    rows = []
    for p in reader.partitions(start, end):
        rows.extend(reader.read(p))
    return rows  # flat envelope tuples: (op, lsn, tx_id, begin_lsn, commit_lsn, ...)


# -- 1. open-transaction tail across latestOffset ticks -------------------


def test_open_tx_across_ticks_not_lost(tmp_path):
    log = str(tmp_path / "open.log")
    w = ReplayLogWriter(log)
    w.append(10, pg.encode_relation(INTEGRATION_RELID, "public", "integration", INTEGRATION_COLS))
    # tx1: complete
    w.append(20, pg.encode_begin(40, _TS, 101))
    w.append(30, pg.encode_insert(INTEGRATION_RELID, _row(1, 1)))
    w.append(40, pg.encode_commit(40, 40, _TS))
    # tx2: OPEN — Begin + Insert appended, Commit still in flight
    w.append(50, pg.encode_begin(70, _TS, 102))
    w.append(60, pg.encode_insert(INTEGRATION_RELID, _row(2, 2)))
    w.close()

    r = PgCdcStreamReader({"path": log})
    o0 = r.initialOffset()
    o1 = r.latestOffset()
    batch1 = _drain(r, o0, o1)
    assert [t[0] for t in batch1] == ["I"]  # only tx1 offered

    # The open tx commits, and another full tx lands, before the next tick.
    w2 = ReplayLogWriter(log)
    w2.append(70, pg.encode_commit(70, 70, _TS))
    w2.append(80, pg.encode_begin(100, _TS, 103))
    w2.append(90, pg.encode_insert(INTEGRATION_RELID, _row(3, 3)))
    w2.append(100, pg.encode_commit(100, 100, _TS))
    w2.close()

    o2 = r.latestOffset()
    batch2 = _drain(r, o1, o2)
    # Defect: tx2's Begin/Insert frames were skipped (scan pos had advanced
    # past them), losing the insert and its tx context.
    assert [t[0] for t in batch2] == ["I", "I"]
    assert all(t[2] is not None for t in batch2), "tx context must be attached"
    assert {t[2] for t in batch2} == {102, 103}


# -- 2. UPDATE to NULL must not TOAST-carry the old value ------------------


def test_update_to_null_materializes_null(spark, tmp_path):
    log = str(tmp_path / "null.log")
    w = WorkloadWriter(log)
    w.relation(INTEGRATION_RELID, "integration", INTEGRATION_COLS)
    w.tx([pg.encode_insert(INTEGRATION_RELID, _row(1, 1, text="hello"))])
    # Explicit NULL for text_data (wire category 'n'), NOT a TOAST 'u'.
    w.tx([pg.encode_update(INTEGRATION_RELID, ["1", '{"data": 2}', "2.00", "2024-01-01 00:00:00+00", None])])
    w.close()

    from pypgcdc_spark.api import PgCdcEngine

    env = PgCdcEngine(spark).snapshot(log)
    reg = SchemaRegistry()
    for fr in scan_frames(log):
        if fr.payload[:1] == b"R":
            reg.register_relation(pg.decode_relation(fr.payload), lsn=fr.lsn)
    state = typed_state(env, reg.get(INTEGRATION_RELID)).collect()
    assert len(state) == 1
    assert state[0].text_data is None, "UPDATE-to-NULL must not keep the old value"
    assert state[0].json_data == '{"data": 2}'


# -- 3. D/U key projection under replica identity FULL ---------------------


def test_delete_full_identity_removes_row(spark, tmp_path):
    log = str(tmp_path / "rifull.log")
    w = WorkloadWriter(log)
    w.relation(INTEGRATION_RELID, "integration", INTEGRATION_COLS)
    w.tx([pg.encode_insert(INTEGRATION_RELID, _row(7, 7))])
    w.tx([pg.encode_insert(INTEGRATION_RELID, _row(8, 8))])
    # REPLICA IDENTITY FULL: before-images carry every column.
    w.tx([pg.encode_update(INTEGRATION_RELID, _row(8, 88), old_values=_row(8, 8), old_category="O")])
    w.tx([pg.encode_delete(INTEGRATION_RELID, _row(7, 7), old_category="O")])
    w.close()

    from pypgcdc_spark.api import PgCdcEngine

    env = PgCdcEngine(spark).snapshot(log)
    rows = current_state(env).collect()
    # Defect: full-image keys never collided with pkey-projected Insert
    # keys, so the deleted row stayed live and the update duplicated.
    assert sorted(r.key["id"] for r in rows) == ["8"]
    assert rows[0].after["json_data"] == '{"data": 88}'


# -- 4. restart offset floor ----------------------------------------------


def test_restart_offsets_never_go_backwards(tmp_path):
    log = str(tmp_path / "restart.log")
    w = WorkloadWriter(log)
    w.relation(INTEGRATION_RELID, "integration", INTEGRATION_COLS)
    for i in range(6):
        w.tx([pg.encode_insert(INTEGRATION_RELID, _row(i, i))])
    w.close()

    r1 = PgCdcStreamReader({"path": log, "maxtxperbatch": 2})
    o1 = r1.latestOffset()  # tx1-2
    o2 = r1.latestOffset()  # tx3-4
    r1.commit(o2)  # Spark durably processed through tx4
    import json

    assert json.load(open(log + ".ack"))["pos"] == o2["pos"]

    # Restart: fresh reader rebuilds its scan state from byte 0.
    r2 = PgCdcStreamReader({"path": log, "maxtxperbatch": 2})
    oa = r2.latestOffset()
    # Spark plans (o2, oa); planning must teach the reader the checkpoint
    # floor even when oa fell behind it.
    assert r2.partitions(o2, oa) == [] or oa["pos"] >= o2["pos"]
    r2.commit(oa)  # stale re-ack must not rewind the sidecar
    assert json.load(open(log + ".ack"))["pos"] >= o2["pos"]

    ob = r2.latestOffset()
    assert ob["pos"] > o2["pos"], "offsets must resume above the checkpoint"
    batch = _drain(r2, o2, ob)
    # Exactly the two unprocessed transactions, no replays of tx1-4.
    assert [t[0] for t in batch] == ["I", "I"]
    assert sorted(t[2] for t in batch) == [105, 106]


# -- 5. begin_lsn / commit_lsn labeling ------------------------------------


def test_begin_and_commit_lsn_are_distinct_and_ordered(tmp_path):
    log = tmp_path / "lsn.log"
    write_reference_workload(str(log))
    xform = MessageTransformer(registry=SchemaRegistry())
    events = []
    commit_frame_lsns = set()
    for fr in scan_frames(str(log)):
        if fr.payload[:1] == b"C":
            commit_frame_lsns.add(fr.lsn)
        events.extend(xform.feed(fr.lsn, fr.payload))
    assert events
    for ev in events:
        assert ev.begin_lsn < ev.lsn, "begin_lsn must be the Begin frame LSN"
        assert ev.lsn < ev.commit_lsn, "commit_lsn must be the tx END lsn"
        assert ev.commit_lsn in commit_frame_lsns


# -- 6. (round 2) pkey-changing UPDATE → D(old) + I(new) --------------------


def test_pkey_changing_update_splits_into_delete_insert(spark, tmp_path):
    """UPDATE integration SET id = 9 WHERE id = 7: a single U keyed by the
    old pkey would strand the new key — current_state would never hold a
    row under id=9 (round-2 ADVICE). The transform must emit the
    D(old-key) + I(new-key) pair; same-key updates stay single-U."""
    log = str(tmp_path / "pkeychange.log")
    w = WorkloadWriter(log)
    w.relation(INTEGRATION_RELID, "integration", INTEGRATION_COLS)
    w.tx([pg.encode_insert(INTEGRATION_RELID, _row(7, 7))])
    # Pkey change 7→9: Postgres sends the old image exactly in this case.
    w.tx(
        [
            pg.encode_update(
                INTEGRATION_RELID,
                _row(9, 99),
                old_values=["7", None, None, None, None],
                old_category="K",
            )
        ]
    )
    # Control: same-key update with a full old image stays one U event.
    w.tx([pg.encode_update(INTEGRATION_RELID, _row(9, 100), old_values=_row(9, 99), old_category="O")])
    w.close()

    xform = MessageTransformer(registry=SchemaRegistry())
    events = []
    for fr in scan_frames(log):
        events.extend(xform.feed(fr.lsn, fr.payload))
    assert [e.op for e in events] == ["I", "D", "I", "U"]
    d, ins = events[1], events[2]
    assert d.key == {"id": "7"}
    assert ins.key == {"id": "9"}
    assert ins.after["json_data"] == '{"data": 99}'
    assert d.lsn == ins.lsn and d.tx_id == ins.tx_id

    # End-to-end: materialized current state holds ONLY the new key.
    from pypgcdc_spark.api import PgCdcEngine

    env = PgCdcEngine(spark).snapshot(log)
    rows = current_state(env).collect()
    assert sorted(r.key["id"] for r in rows) == ["9"]
    assert rows[0].after["json_data"] == '{"data": 100}'


# ---------------------------------------------------------------------------
# Round-5 ADVICE regressions
# ---------------------------------------------------------------------------


def test_registry_renumbers_versions_after_out_of_order_registration():
    """A replayed R frame introducing a genuinely DIFFERENT schema at an
    OLDER LSN must leave version numbers aligned with chain position
    (sorted by first_lsn), so history-view suffixes track LSN-span order."""
    reg = SchemaRegistry()
    v2_rel = pg.decode_relation(
        pg.encode_relation(901, "public", "t", [(True, "id", 23, -1), (False, "a", 25, -1)])
    )
    v1_rel = pg.decode_relation(
        pg.encode_relation(901, "public", "t", [(True, "id", 23, -1)])
    )
    reg.register_relation(v2_rel, lsn=500)  # newer span registers first
    reg.register_relation(v1_rel, lsn=100)  # replayed older span arrives late
    chain = reg._versions[(reg.database, 901)]
    assert [(v.version, v.first_lsn) for v in chain] == [(1, 100), (2, 500)]
    assert len(reg.get_at_lsn(901, 150).column_definitions) == 1
    assert len(reg.get_at_lsn(901, 600).column_definitions) == 2


def test_truncated_logical_message_raises():
    """An 'M' frame whose declared content length exceeds the remaining
    buffer must raise (fail-fast contract), never return shortened content."""
    whole = pg.encode_logical_message("px", b"hello world", msg_lsn=42)
    assert pg.decode_message(whole).content == b"hello world"
    with pytest.raises(ValueError, match="truncated logical message"):
        pg.decode_message(whole[:-4])


# -- round-7 ADVICE regressions (pgbin float/numeric parity, SCRAM gs2,
#    registry-snapshot GC robustness) -----------------------------------


def test_pgbin_float4_single_precision_shortest():
    """FLOAT4 binary must render the shortest SINGLE-precision string
    (0.1::real → '0.1', not the double-widened 0.10000000149011612) and
    mirror PG Ryu's notation switch (scientific at decimal exponent < -4
    or >= 6).  Every pinned value verified against live PG 15 text mode."""
    import struct

    from pypgcdc_spark.cdc import pgbin

    f4 = lambda v: pgbin.to_text(pgbin.FLOAT4, struct.pack(">f", v))
    assert f4(0.1) == "0.1"
    assert f4(16777216.0) == "1.6777216e+07"
    assert f4(1000000.0) == "1e+06"  # exp 6 → scientific
    assert f4(999999.0) == "999999"  # exp 5 → fixed
    assert f4(0.0001) == "0.0001"  # exp -4 → fixed
    assert f4(1e-5) == "1e-05"  # exp -5 → scientific
    assert f4(-0.0) == "-0"
    assert f4(2.0) == "2"  # no trailing '.0'
    assert f4(-2.5e-10) == "-2.5e-10"
    assert f4(3.4028235e38) == "3.4028235e+38"  # FLT_MAX
    assert f4(1e-45) == "1e-45"  # min subnormal
    # Boundary-tie: the 7-digit form round-trips under half-even but PG's
    # Ryu excludes interval bounds and emits 8 digits.
    assert pgbin.to_text(pgbin.FLOAT4, bytes.fromhex("ce05cb84")) == "-5.6117683e+08"


def test_pgbin_float8_ryu_notation():
    """FLOAT8 keeps shortest-round-trip digits but must switch notation
    where PG does (scientific at decimal exponent < -4 or >= 15), which
    differs from Python repr (switches at 16)."""
    import struct

    from pypgcdc_spark.cdc import pgbin

    f8 = lambda v: pgbin.to_text(pgbin.FLOAT8, struct.pack(">d", v))
    assert f8(1e15) == "1e+15"  # Python repr: '1000000000000000.0'
    assert f8(999999999999999.0) == "999999999999999"
    assert f8(1e16) == "1e+16"
    assert f8(0.00001) == "1e-05"
    assert f8(0.0001) == "0.0001"
    assert f8(-0.0) == "-0"
    assert f8(0.1) == "0.1"
    assert f8(123456789012345.6) == "123456789012345.6"
    assert f8(1.5e-7) == "1.5e-07"
    assert f8(1e100) == "1e+100"
    assert f8(0.30000000000000004) == "0.30000000000000004"


def test_pgbin_numeric_infinity_and_unknown_sign():
    """PG14+ numeric ±Infinity (sign 0xD000/0xF000) must render PG's
    spellings, and an unrecognized sign word must raise (fail-loud),
    never silently decode as '0'."""
    import struct

    import pytest as _pytest

    from pypgcdc_spark.cdc import pgbin

    hdr = lambda sign: struct.pack(">hhHH", 0, 0, sign, 0)
    assert pgbin.to_text(pgbin.NUMERIC, hdr(0xD000)) == "Infinity"
    assert pgbin.to_text(pgbin.NUMERIC, hdr(0xF000)) == "-Infinity"
    assert pgbin.to_text(pgbin.NUMERIC, hdr(0xC000)) == "NaN"
    with _pytest.raises(ValueError, match="sign word"):
        pgbin.to_text(pgbin.NUMERIC, hdr(0xA000))


def test_pgbin_array_quotes_vertical_tab_and_formfeed():
    """PG's array_isspace includes \\v and \\f: elements containing them
    must be quoted or a re-parse of the literal would trim them."""
    import struct

    from pypgcdc_spark.cdc import pgbin

    def text_array(*elems):
        body = struct.pack(">iii", 1, 0, pgbin.TEXT) + struct.pack(">ii", len(elems), 1)
        for e in elems:
            raw = e.encode()
            body += struct.pack(">i", len(raw)) + raw
        return body

    out = pgbin.to_text(1009, text_array("a\x0bb", "c\x0cd", "plain"))
    assert out == '{"a\x0bb","c\x0cd",plain}'


def test_scram_gs2_flag_y_when_tls_without_plus():
    """Over TLS without a server -PLUS offer the gs2 flag must be 'y,,'
    (RFC 5802 downgrade detection): a -PLUS-capable server then rejects
    a MITM-stripped mechanism list.  Plaintext stays 'n,,'; an actual
    binding stays 'p='."""
    from pypgcdc_spark.sources.pgwire import ScramClient

    plain = ScramClient("u", "pw", tls_active=False)
    assert plain.gs2 == "n,,"
    tls_no_plus = ScramClient("u", "pw", tls_active=True)
    assert tls_no_plus.gs2 == "y,,"
    assert tls_no_plus.client_first.startswith("y,,n=,r=")
    bound = ScramClient("u", "pw", cbind_data=b"\x01\x02", tls_active=True)
    assert bound.gs2 == "p=tls-server-end-point,,"


def test_registry_snapshot_gc_tolerates_stray_files(tmp_path):
    """A stray reg-*.json with a non-numeric middle must not crash the
    best-effort snapshot GC in commit()."""
    import json
    import os

    from pypgcdc_spark.sources.pgcdc import PgCdcStreamReader

    log = str(tmp_path / "log.replay")
    write_reference_workload(log)
    reader = PgCdcStreamReader({"path": log, "database": "replay"})
    start = reader.initialOffset()
    end = reader.latestOffset()
    d = reader._registry_dir()
    os.makedirs(d, exist_ok=True)
    for fn in ("reg-abc.json", "reg-.json", "reg-00000001.json.tmp"):
        with open(os.path.join(d, fn), "w") as f:
            json.dump({}, f)
    reader.commit(end)  # must not raise on the stray names
    assert os.path.exists(os.path.join(d, "reg-abc.json"))


def test_tail_truncate_rewrite_does_not_wedge_reader(tmp_path):
    """The live tailer TRUNCATES AND REWRITES the open log tail (resend
    dedup after a reconnect; torn-tail discipline at session start).
    The reader's incremental scan has already advanced through those
    open-tail frames — it must detect the rewrite, rewind to the last
    closed boundary, and keep producing offsets.  Before the round-7 fix
    the source stalled forever mid-frame (found by the fault-injection
    soak: micro-batches stopped while the log kept growing)."""
    import os

    log = str(tmp_path / "churn.log")
    w = ReplayLogWriter(log)
    w.append(10, pg.encode_relation(INTEGRATION_RELID, "public", "integration", INTEGRATION_COLS))
    w.append(20, pg.encode_begin(40, _TS, 101))
    w.append(30, pg.encode_insert(INTEGRATION_RELID, _row(1, 1)))
    w.append(40, pg.encode_commit(40, 40, _TS))
    tail_start = w.pos  # last closed boundary — the tailer's truncate point
    # open tx 102: Begin + 2 inserts, no commit (a resend in flight)
    w.append(50, pg.encode_begin(80, _TS, 102))
    w.append(60, pg.encode_insert(INTEGRATION_RELID, _row(2, 2)))
    w.append(70, pg.encode_insert(INTEGRATION_RELID, _row(3, 3)))
    w.close()

    r = PgCdcStreamReader({"path": log})
    o0 = r.initialOffset()
    o1 = r.latestOffset()  # scans INTO the open tail
    assert [t[0] for t in _drain(r, o0, o1)] == ["I"]

    # Tailer behavior: duplicate detected → truncate back to the unit
    # start, then the real traffic lands (same tx shorter, plus another).
    with open(log, "r+b") as f:
        f.truncate(tail_start)
    w2 = ReplayLogWriter(log)
    w2.append(50, pg.encode_begin(65, _TS, 102))
    w2.append(60, pg.encode_insert(INTEGRATION_RELID, _row(2, 2)))
    w2.append(65, pg.encode_commit(65, 65, _TS))
    w2.append(80, pg.encode_begin(100, _TS, 103))
    w2.append(90, pg.encode_insert(INTEGRATION_RELID, _row(4, 4)))
    w2.append(100, pg.encode_commit(100, 100, _TS))
    w2.close()

    o2 = r.latestOffset()
    assert int(o2["pos"]) == os.path.getsize(log), "cut must cover the rewrite"
    batch2 = _drain(r, o1, o2)
    assert [t[0] for t in batch2] == ["I", "I"]
    assert {t[2] for t in batch2} == {102, 103}

    # Torn-tail sequence: a crash leaves a MID-FRAME tear the reader
    # polls across; the next tailer session truncates back to the unit
    # start and the server resends the whole transaction.
    unit_start = os.path.getsize(log)
    w3 = ReplayLogWriter(log)
    w3.append(110, pg.encode_begin(130, _TS, 104))
    w3.append(120, pg.encode_insert(INTEGRATION_RELID, _row(5, 5)))
    w3.close()
    o3 = r.latestOffset()  # scans the new open tail
    with open(log, "r+b") as f:
        f.truncate(os.path.getsize(log) - 7)  # crash mid-write: torn frame
    o4 = r.latestOffset()  # poll across the tear: must not wedge or crash
    assert int(o4["pos"]) == int(o3["pos"])  # nothing new closed
    with open(log, "r+b") as f:
        f.truncate(unit_start)  # session seed-scan: drop the torn unit
    w4 = ReplayLogWriter(log)
    w4.append(110, pg.encode_begin(130, _TS, 104))
    w4.append(120, pg.encode_insert(INTEGRATION_RELID, _row(5, 5)))
    w4.append(130, pg.encode_commit(130, 130, _TS))
    w4.close()
    o5 = r.latestOffset()
    batch3 = _drain(r, o4, o5)
    assert [t[0] for t in batch3] == ["I"]
    assert {t[2] for t in batch3} == {104}


def test_streaming_query_writes_ack_sidecar(spark, tmp_path):
    """The REAL streaming engine must land acks in `<log>.ack`: Spark
    calls commit() on the runner's reader one batch behind the offer
    cursor, so guarding commit against the offer floor (as the original
    code did) silently drops EVERY live ack — confirmed_flush never
    advances and WAL retention grows without bound.  Unit tests that
    invoke commit() by hand never catch this; this test drives the
    actual query engine."""
    import json
    import os

    log = str(tmp_path / "ackflow.log")
    w = WorkloadWriter(log)
    w.relation(INTEGRATION_RELID, "integration", INTEGRATION_COLS)
    for i in range(4):
        w.tx([pg.encode_insert(INTEGRATION_RELID, _row(i, i))])
    w.close()

    from pypgcdc_spark.api import PgCdcEngine

    engine = PgCdcEngine(spark)
    q = (
        engine.stream(log, max_tx_per_batch=1)
        .writeStream.format("noop")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .start()
    )
    try:
        q.processAllAvailable()
        # commit(N) fires when batch N+1 runs; append more so the tail
        # batches get acked too.
        w2 = WorkloadWriter(log)
        for i in range(4, 7):
            w2.tx([pg.encode_insert(INTEGRATION_RELID, _row(i, i))])
        w2.close()
        q.processAllAvailable()
    finally:
        q.stop()
        q.awaitTermination(30)
    ack_path = log + ".ack"
    assert os.path.exists(ack_path), "streaming engine never acked a batch"
    ack = json.load(open(ack_path))
    assert ack["pos"] > 0 and ack["lsn"] > 0


def test_partition_payload_o1_under_schema_churn(tmp_path):
    """Partition payloads must reference the persisted registry snapshot
    (``file:`` pointer), not embed its JSON: under heavy DDL the full
    registry grows with schema history, and serializing it into every
    partition of every micro-batch made batch latency climb over a
    1-hour soak (ALTER storm).  Decode through the reference must still
    type rows by the version in force."""
    log = str(tmp_path / "churny.log")
    w = ReplayLogWriter(log)
    # 40 schema versions of one relation (widening), one insert per rev.
    for k in range(40):
        cols = [(True, "id", 20, -1)] + [
            (False, f"c{j}", 23, -1) for j in range(k + 1)
        ]
        w.append(10 + k * 10, pg.encode_relation(900, "public", "churny", cols))
        w.append(
            12 + k * 10,
            pg.encode_begin(15 + k * 10, _TS, 500 + k),
        )
        w.append(
            13 + k * 10,
            pg.encode_insert(900, [str(k)] + [str(j) for j in range(k + 1)]),
        )
        w.append(15 + k * 10, pg.encode_commit(15 + k * 10, 15 + k * 10, _TS))
    w.close()

    r = PgCdcStreamReader({"path": log})
    o0 = r.initialOffset()
    o1 = r.latestOffset()
    parts = r.partitions(o0, o1)
    assert parts, "expected partitions"
    for p in parts:
        assert p.registry_json.startswith("file:"), p.registry_json[:60]
        assert len(p.registry_json) < 512  # O(1) reference, not the JSON
    rows = []
    for p in parts:
        rows.extend(r.read(p))
    assert len(rows) == 40  # every insert decodes through the snapshot


# -- r8: tail-rewrite fingerprint from the scan pass (ADVICE r7) -----------


def test_same_length_tail_rewrite_detected(tmp_path):
    """A truncate-rewrite of the open tail that preserves BOTH total log
    length AND the trailing 32 bytes must still be detected.  The r7
    fingerprint (post-scan re-read of the last 32 bytes) missed it — and
    had a TOCTOU window where a rewrite landing between the frame scan
    and the fingerprint capture was recorded as the new bytes and never
    caught.  The fingerprint now derives from the last frame the scan
    pass itself consumed (header identity + payload prefix)."""
    import os

    log = str(tmp_path / "samelen.log")
    w = ReplayLogWriter(log)
    w.append(10, pg.encode_relation(INTEGRATION_RELID, "public", "integration", INTEGRATION_COLS))
    w.append(20, pg.encode_begin(40, _TS, 101))
    w.append(30, pg.encode_insert(INTEGRATION_RELID, _row(1, 1)))
    w.append(40, pg.encode_commit(40, 40, _TS))
    tail_start = w.pos
    # Open unit: insert whose differing byte (the key) sits EARLY in the
    # payload; the long text tail makes the trailing 32 bytes collide.
    w.append(50, pg.encode_begin(80, _TS, 102))
    w.append(60, pg.encode_insert(INTEGRATION_RELID, _row(2, 2, text="x" * 64)))
    w.close()

    r = PgCdcStreamReader({"path": log})
    o0 = r.initialOffset()
    o1 = r.latestOffset()  # scan advances through the open tail
    assert [t[0] for t in _drain(r, o0, o1)] == ["I"]
    size_before = os.path.getsize(log)

    # Rewrite: same frame lengths, same trailing bytes, different LSNs
    # and key — the resend-dedup path replacing the open unit.
    with open(log, "r+b") as f:
        f.truncate(tail_start)
    w2 = ReplayLogWriter(log)
    w2.append(51, pg.encode_begin(81, _TS, 103), send_time=_TS)
    w2.append(61, pg.encode_insert(INTEGRATION_RELID, _row(3, 2, text="x" * 64)), send_time=_TS)
    w2.close()
    assert os.path.getsize(log) == size_before, "fixture must preserve length"
    assert r._tail_rewritten(size_before), "header-identity fingerprint must fire"

    # Behavioral: the rewritten unit (new xid, new key) is what decodes.
    w3 = ReplayLogWriter(log)
    w3.append(81, pg.encode_commit(81, 81, _TS), send_time=_TS)
    w3.close()
    o2 = r.latestOffset()
    batch = _drain(r, o1, o2)
    assert [t[0] for t in batch] == ["I"]
    assert {t[2] for t in batch} == {103}


# -- r8: stale .ack sidecar from a previous log generation (ADVICE r7) -----


def test_stale_ack_sidecar_ignored_when_log_recreated_smaller(tmp_path):
    """A leftover `.ack` whose pos exceeds the current log size (log
    recreated, sidecar not deleted) must not seed the ack high-water:
    before the fix every ack of the new generation was silently dropped
    until the log regrew past the stale pos — unbounded WAL retention,
    the exact failure the r7 high-water fix addressed."""
    import json
    import os

    log = str(tmp_path / "gen.log")
    w = WorkloadWriter(log)
    w.relation(INTEGRATION_RELID, "integration", INTEGRATION_COLS)
    for i in range(8):
        w.tx([pg.encode_insert(INTEGRATION_RELID, _row(i, i))])
    w.close()
    r1 = PgCdcStreamReader({"path": log})
    o1 = r1.latestOffset()
    r1.commit(o1)
    stale_pos = json.load(open(log + ".ack"))["pos"]
    assert stale_pos == o1["pos"] > 0

    # Generation 2: log recreated SMALLER; the sidecar survives.
    os.remove(log)
    w2 = WorkloadWriter(log)
    w2.relation(INTEGRATION_RELID, "integration", INTEGRATION_COLS)
    w2.tx([pg.encode_insert(INTEGRATION_RELID, _row(100, 100))])
    w2.close()
    assert os.path.getsize(log) < stale_pos

    r2 = PgCdcStreamReader({"path": log})
    o2 = r2.latestOffset()
    r2.commit(o2)
    assert json.load(open(log + ".ack"))["pos"] == o2["pos"], (
        "gen-2 ack must land; a stale sidecar must not suppress it"
    )


def test_stale_ack_sidecar_ignored_when_log_regrows_past_it(tmp_path):
    """Even when the recreated log has already REGROWN past the stale
    sidecar pos (so the size check alone cannot tell), the log-identity
    stamp (first-frame header) distinguishes generations."""
    import json
    import os

    log = str(tmp_path / "regrow.log")
    w = WorkloadWriter(log)
    w.relation(INTEGRATION_RELID, "integration", INTEGRATION_COLS)
    for i in range(3):
        w.tx([pg.encode_insert(INTEGRATION_RELID, _row(i, i))])
    w.close()
    r1 = PgCdcStreamReader({"path": log})
    o1 = r1.latestOffset()
    r1.commit(o1)
    stale_pos = json.load(open(log + ".ack"))["pos"]

    # Generation 2: different start LSN (new first-frame identity), and
    # LARGER than the stale ack pos before the reader's first commit.
    os.remove(log)
    w2 = WorkloadWriter(log, start_lsn=50_000)
    w2.relation(INTEGRATION_RELID, "integration", INTEGRATION_COLS)
    for i in range(12):
        w2.tx([pg.encode_insert(INTEGRATION_RELID, _row(200 + i, i))])
    w2.close()
    assert os.path.getsize(log) > stale_pos

    r2 = PgCdcStreamReader({"path": log, "maxtxperbatch": 1})
    o2 = r2.latestOffset()  # first tx only — pos < stale_pos
    assert o2["pos"] < stale_pos
    r2.commit(o2)
    assert json.load(open(log + ".ack"))["pos"] == o2["pos"], (
        "log-identity stamp must reject the previous generation's sidecar"
    )


def test_small_registry_inlined_in_partition_payload(tmp_path):
    """Few-tables registries embed inline in partition payloads (no
    shared-FS / snapshot-GC dependency for checkpoint replay); only
    registries beyond the inline budget ship as file: references."""
    log = str(tmp_path / "inline.log")
    w = WorkloadWriter(log)
    w.relation(INTEGRATION_RELID, "integration", INTEGRATION_COLS)
    w.tx([pg.encode_insert(INTEGRATION_RELID, _row(1, 1))])
    w.close()
    r = PgCdcStreamReader({"path": log})
    o0, o1 = r.initialOffset(), r.latestOffset()
    parts = r.partitions(o0, o1)
    assert parts
    for p in parts:
        assert not p.registry_json.startswith("file:")
        assert '"integration"' in p.registry_json
    rows = [t for p in parts for t in r.read(p)]
    assert [t[0] for t in rows] == ["I"]


# -- r8 soak finding: registry snapshot growth under DDL churn -------------


def test_registry_version_pruning_bounds_snapshot_growth(tmp_path):
    """Versions wholly superseded below the acked LSN are pruned at
    commit(), so persisted snapshots stop growing O(total versions ever
    seen) — the r8 soak's 1,599-ALTER storm reached a 147 MB snapshot
    without this.  The revision watermark stays monotone and lookups at
    or above the floor are unchanged."""
    # Unit level first.
    reg = SchemaRegistry()
    for k, lsn in enumerate((10, 50, 90)):
        cols = [(True, "id", 20, -1)] + [(False, f"c{j}", 23, -1) for j in range(k + 1)]
        reg.register_relation(pg.decode_relation(
            pg.encode_relation(900, "public", "churny", cols)), lsn=lsn)
    assert reg.revision == 3
    s_v70 = reg.get_at_lsn(900, 70)
    dropped = reg.prune_below(60)  # v1 (span 10..50) is dead; v2 in force
    assert dropped == 1
    assert reg.revision == 3  # monotone watermark unchanged
    assert reg.get_at_lsn(900, 70) == s_v70
    assert len(reg.get(900).column_definitions) == 4  # latest intact
    reg2 = SchemaRegistry.loads(reg.dumps())  # roundtrip keeps the counter
    assert reg2.revision == 3

    # Reader level: snapshots persisted AFTER a commit shrink.
    import os

    log = str(tmp_path / "ddl.log")
    w = ReplayLogWriter(log)
    n_alter = 20
    for k in range(n_alter):
        cols = [(True, "id", 20, -1)] + [(False, f"c{j}", 23, -1) for j in range(k + 1)]
        w.append(10 + k * 10, pg.encode_relation(901, "public", "churny", cols))
        w.append(12 + k * 10, pg.encode_begin(15 + k * 10, _TS, 600 + k))
        w.append(13 + k * 10, pg.encode_insert(901, [str(k)] + [str(j) for j in range(k + 1)]))
        w.append(15 + k * 10, pg.encode_commit(15 + k * 10, 15 + k * 10, _TS))
    w.close()

    r = PgCdcStreamReader({"path": log})
    o0 = r.initialOffset()
    o1 = r.latestOffset()
    assert len(_drain(r, o0, o1)) == n_alter
    pre = len(r._registry.dumps())
    r.commit(o1)  # ack everything -> all but the latest version are dead
    assert len(r._registry.dumps()) < pre / 3
    assert r._registry.revision == n_alter  # watermark untouched

    # New DDL after the prune: the next snapshot persists the SMALL
    # registry and new batches decode through it.
    w2 = ReplayLogWriter(log)
    cols = [(True, "id", 20, -1)] + [(False, f"c{j}", 23, -1) for j in range(n_alter + 1)]
    w2.append(500, pg.encode_relation(901, "public", "churny", cols))
    w2.append(510, pg.encode_begin(530, _TS, 700))
    w2.append(520, pg.encode_insert(901, ["99"] + [str(j) for j in range(n_alter + 1)]))
    w2.append(530, pg.encode_commit(530, 530, _TS))
    w2.close()
    o2 = r.latestOffset()
    assert r._registry.revision == n_alter + 1
    snap = os.path.join(log + ".registry.d", f"reg-{n_alter + 1:08d}.json")
    assert os.path.exists(snap)
    import json as _json

    persisted = _json.load(open(snap))
    n_versions = sum(len(e["versions"]) for e in persisted["entries"])
    assert n_versions == 2  # the in-force version at the floor + the new one
    rows = _drain(r, o1, o2)
    assert [t[0] for t in rows] == ["I"]
