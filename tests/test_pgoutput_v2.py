"""pgoutput protocol v2: streamed in-progress transactions.

The reference pins ``proto_version '1'`` (``reader.py:136-141``) so there
is no reference behavior to match — these tests pin the PostgreSQL
"Logical Streaming Replication Message Formats" documentation instead:
Stream Start ('S') / Stop ('E') / Commit ('c') / Abort ('A'), the xid
prefix on in-segment transactional messages, interleaved reassembly, and
subtransaction aborts.
"""

from datetime import datetime, timezone

import pytest

from pypgcdc_spark.cdc import pgoutput as pg
from pypgcdc_spark.cdc.transform import MessageTransformer
from pypgcdc_spark.sources import replay
from pypgcdc_spark.testing import write_streamed_cdc_pair

TS = datetime(2024, 3, 1, 12, 0, 0, tzinfo=timezone.utc)
RELID = 10
R_MSG = pg.encode_relation(
    RELID, "public", "t", [(True, "id", 20, -1), (False, "v", 25, -1)]
)


# ---------------------------------------------------------------------------
# Codec: golden bytes + roundtrips
# ---------------------------------------------------------------------------


def test_stream_control_golden_bytes():
    # Byte-level pins straight from the message-format spec.
    assert pg.encode_stream_start(1, True) == b"S\x00\x00\x00\x01\x01"
    assert pg.encode_stream_start(258, False) == b"S\x00\x00\x01\x02\x00"
    assert pg.encode_stream_stop() == b"E"
    assert pg.encode_stream_abort(2, 3) == b"A\x00\x00\x00\x02\x00\x00\x00\x03"
    sc = pg.encode_stream_commit(7, 0x10, 0x20, TS, flags=0)
    # 'c' | int32 xid | int8 flags | int64 commit_lsn | int64 end_lsn | int64 ts
    assert sc[:6] == b"c\x00\x00\x00\x07\x00"
    assert len(sc) == 1 + 4 + 1 + 8 + 8 + 8


def test_stream_control_roundtrip():
    assert pg.decode_message(pg.encode_stream_start(42, True)) == pg.StreamStart(42, True)
    assert pg.decode_message(pg.encode_stream_start(42, False)) == pg.StreamStart(42, False)
    assert pg.decode_message(pg.encode_stream_stop()) == pg.StreamStop()
    assert pg.decode_message(pg.encode_stream_commit(42, 999, 1000, TS)) == pg.StreamCommit(
        42, 0, 999, 1000, TS
    )
    assert pg.decode_message(pg.encode_stream_abort(42, 43)) == pg.StreamAbort(42, 43)
    # subxid defaults to the top-level xid (whole-stream abort)
    assert pg.decode_message(pg.encode_stream_abort(42)) == pg.StreamAbort(42, 42)


def test_in_segment_xid_prefix_roundtrip():
    ins = pg.decode_message(pg.encode_insert(RELID, ["1", "a"], xid=42), streamed=True)
    assert ins.xid == 42 and ins.new_tuple.columns[1].value == "a"
    upd = pg.decode_message(
        pg.encode_update(RELID, ["1", "b"], old_values=["1", "a"], xid=7), streamed=True
    )
    assert upd.xid == 7 and upd.old_tuple is not None
    dele = pg.decode_message(pg.encode_delete(RELID, ["1", None], xid=9), streamed=True)
    assert dele.xid == 9
    tr = pg.decode_message(pg.encode_truncate([RELID], xid=11), streamed=True)
    assert tr.xid == 11 and tr.relation_ids == (RELID,)
    rel = pg.decode_message(pg.encode_relation(RELID, "public", "t", [], xid=13), streamed=True)
    assert rel.xid == 13 and rel.relation_name == "t"
    # The SAME bytes decoded without streamed=True would misparse — the
    # xid prefix is positional, exactly like the real wire format.
    plain = pg.decode_message(pg.encode_insert(RELID, ["1", "a"]))
    assert plain.xid is None


def test_logical_message_roundtrip():
    m = pg.decode_message(pg.encode_logical_message("pfx", b"hello", 5, True, xid=9), streamed=True)
    assert m == pg.LogicalMessage(True, 5, "pfx", b"hello", xid=9)
    m2 = pg.decode_message(pg.encode_logical_message("pfx", b"", 0, False))
    assert m2.transactional is False and m2.xid is None and m2.content == b""


# ---------------------------------------------------------------------------
# Transformer: interleaved reassembly
# ---------------------------------------------------------------------------


def _feed_all(x, frames):
    out = []
    for lsn, payload in frames:
        out.extend(x.feed(lsn, payload))
    return out


def test_interleaved_streams_emit_on_commit_in_change_order():
    x = MessageTransformer()
    evs = _feed_all(
        x,
        [
            (1, R_MSG),
            # segment A1
            (10, pg.encode_stream_start(100, True)),
            (11, pg.encode_insert(RELID, ["1", "a"], xid=100)),
            (12, pg.encode_stream_stop()),
            # segment B1 interleaves
            (20, pg.encode_stream_start(101, True)),
            (21, pg.encode_insert(RELID, ["2", "b"], xid=101)),
            (22, pg.encode_stream_stop()),
            # a whole plain tx between segments emits immediately
            (30, pg.encode_begin(33, TS, 55)),
            (31, pg.encode_insert(RELID, ["3", "c"])),
            (33, pg.encode_commit(33, 33, TS)),
            # segment A2
            (40, pg.encode_stream_start(100, False)),
            (41, pg.encode_update(RELID, ["1", "a2"], xid=100)),
            (42, pg.encode_stream_stop()),
            # commits: A first, then B
            (51, pg.encode_stream_commit(100, 51, 51, TS)),
            (61, pg.encode_stream_commit(101, 61, 61, TS)),
        ],
    )
    got = [(e.op, e.lsn, e.tx_id, (e.after or e.before)["id"]) for e in evs]
    assert got == [
        ("I", 31, 55, "3"),  # plain tx, immediate
        ("I", 11, 100, "1"),  # stream 100 drained at its commit
        ("U", 41, 100, "1"),
        ("I", 21, 101, "2"),  # stream 101 after
    ]
    a = evs[1]
    assert a.begin_lsn == 10  # first StreamStart frame of xid 100
    assert a.commit_lsn == 51 and a.commit_ts == TS
    assert x.stats.streamed_txs == 2 and x.stats.events == 4


def test_subtransaction_abort_drops_only_subtx_changes():
    x = MessageTransformer()
    evs = _feed_all(
        x,
        [
            (1, R_MSG),
            (10, pg.encode_stream_start(100, True)),
            (11, pg.encode_insert(RELID, ["1", "keep"], xid=100)),
            (12, pg.encode_insert(RELID, ["9", "poison"], xid=150)),  # subtx
            (13, pg.encode_insert(RELID, ["2", "keep2"], xid=100)),
            (14, pg.encode_stream_stop()),
            (20, pg.encode_stream_abort(100, 150)),
            (21, pg.encode_stream_commit(100, 21, 21, TS)),
        ],
    )
    assert [(e.after["id"], e.after["v"]) for e in evs] == [("1", "keep"), ("2", "keep2")]
    assert x.stats.aborted_subtxs == 1


def test_whole_stream_abort_drops_everything():
    x = MessageTransformer()
    evs = _feed_all(
        x,
        [
            (1, R_MSG),
            (10, pg.encode_stream_start(100, True)),
            (11, pg.encode_insert(RELID, ["1", "a"], xid=100)),
            (12, pg.encode_stream_stop()),
            (20, pg.encode_stream_abort(100, 100)),
        ],
    )
    assert evs == []
    assert x.stats.aborted_streams == 1
    # a later commit for the aborted xid emits nothing
    assert list(x.feed(30, pg.encode_stream_commit(100, 30, 30, TS))) == []


def test_mid_stream_relation_resend_uses_at_lsn_schema():
    """ALTER TABLE inside a streamed tx: buffered tuples decoded before the
    new Relation must zip against the OLD column list, later ones against
    the NEW — get_at_lsn versioning, not latest-wins (reference Q4)."""
    r_v2 = pg.encode_relation(
        RELID,
        "public",
        "t",
        [(True, "id", 20, -1), (False, "v", 25, -1), (False, "extra", 25, -1)],
        xid=100,
    )
    x = MessageTransformer()
    evs = _feed_all(
        x,
        [
            (1, R_MSG),
            (10, pg.encode_stream_start(100, True)),
            (11, pg.encode_insert(RELID, ["1", "old-shape"], xid=100)),
            (12, r_v2),  # ALTER TABLE ADD COLUMN mid-stream
            (13, pg.encode_insert(RELID, ["2", "new-shape", "x"], xid=100)),
            (14, pg.encode_stream_stop()),
            (20, pg.encode_stream_commit(100, 20, 20, TS)),
        ],
    )
    assert evs[0].after == {"id": "1", "v": "old-shape"}
    assert evs[1].after == {"id": "2", "v": "new-shape", "extra": "x"}


def test_toast_unchanged_inside_stream():
    from pypgcdc_spark.cdc.models import TOAST_UNCHANGED

    x = MessageTransformer()
    evs = _feed_all(
        x,
        [
            (1, R_MSG),
            (10, pg.encode_stream_start(100, True)),
            (11, pg.encode_update(RELID, ["1", "ignored"], toast_unchanged={1}, xid=100)),
            (12, pg.encode_stream_stop()),
            (20, pg.encode_stream_commit(100, 20, 20, TS)),
        ],
    )
    assert evs[0].after["v"] == TOAST_UNCHANGED


def test_nested_stream_start_rejected():
    x = MessageTransformer()
    list(x.feed(10, pg.encode_stream_start(100, True)))
    with pytest.raises(ValueError, match="StreamStart inside"):
        list(x.feed(11, pg.encode_stream_start(101, True)))


# ---------------------------------------------------------------------------
# Boundary scanner: partition cuts never bisect an open stream span
# ---------------------------------------------------------------------------


def _write_frames(path, frames):
    with replay.ReplayLogWriter(path) as w:
        for lsn, payload in frames:
            w.append(lsn, payload)


def test_boundaries_hold_while_stream_open(tmp_path):
    p = str(tmp_path / "v2.log")
    _write_frames(
        p,
        [
            (1, R_MSG),
            (10, pg.encode_stream_start(100, True)),
            (11, pg.encode_insert(RELID, ["1", "a"], xid=100)),
            (12, pg.encode_stream_stop()),
            # plain tx while stream 100 still open: may NOT close a unit
            (20, pg.encode_begin(23, TS, 55)),
            (21, pg.encode_insert(RELID, ["3", "c"])),
            (23, pg.encode_commit(23, 23, TS)),
            (30, pg.encode_stream_start(100, False)),
            (31, pg.encode_insert(RELID, ["2", "b"], xid=100)),
            (32, pg.encode_stream_stop()),
            (40, pg.encode_stream_commit(100, 40, 40, TS)),
            # after the span closes, a plain tx closes its own unit again
            (50, pg.encode_begin(53, TS, 56)),
            (51, pg.encode_insert(RELID, ["4", "d"])),
            (53, pg.encode_commit(53, 53, TS)),
        ],
    )
    ranges = replay.tx_boundaries(p)
    assert len(ranges) == 2  # [R..stream-commit] and [plain tx]
    # contiguous, full coverage
    import os

    assert ranges[0][0] == 0 and ranges[-1][1] == os.path.getsize(p)
    assert ranges[0][1] == ranges[1][0]


def test_boundaries_top_level_abort_closes_unit(tmp_path):
    p = str(tmp_path / "abort.log")
    _write_frames(
        p,
        [
            (10, pg.encode_stream_start(100, True)),
            (11, pg.encode_insert(RELID, ["1", "a"], xid=100)),
            (12, pg.encode_stream_stop()),
            (20, pg.encode_stream_abort(100, 100)),
            (30, pg.encode_begin(33, TS, 55)),
            (31, pg.encode_insert(RELID, ["3", "c"])),
            (33, pg.encode_commit(33, 33, TS)),
        ],
    )
    ranges = replay.tx_boundaries(p)
    assert len(ranges) == 2
    # subtx abort does NOT close
    p2 = str(tmp_path / "subabort.log")
    _write_frames(
        p2,
        [
            (10, pg.encode_stream_start(100, True)),
            (11, pg.encode_insert(RELID, ["1", "a"], xid=150)),
            (12, pg.encode_stream_stop()),
            (20, pg.encode_stream_abort(100, 150)),
            (30, pg.encode_stream_commit(100, 30, 30, TS)),
        ],
    )
    assert len(replay.tx_boundaries(p2)) == 1


# ---------------------------------------------------------------------------
# Twin-log state equality (driver-side; the Spark-source twin lives in
# test_round5_source.py and the cdc_streamed_tx_replay registry entry)
# ---------------------------------------------------------------------------


def _final_state(path):
    x = MessageTransformer()
    evs = []
    for fr in replay.scan_frames(path):
        evs.extend(x.feed(fr.lsn, fr.payload))
    evs.sort(key=lambda e: e.lsn)
    st = {}
    for ev in evs:
        k = ev.key["user_id"]
        if ev.op == "D":
            st.pop(k, None)
        else:
            st[k] = (ev.after["last_event"], ev.after["value"])
    return st, x.stats


def test_streamed_pair_states_match(tmp_path):
    rows = []
    for i in range(300):
        uid = (i * 7) % 37
        et = "error" if i % 11 == 3 else f"ev{i % 5}"
        rows.append((uid, et, float(i) * 1.25))
    plain, streamed = str(tmp_path / "p.log"), str(tmp_path / "s.log")
    write_streamed_cdc_pair(plain, streamed, rows, chunk=40)
    sp, _ = _final_state(plain)
    ss, stats = _final_state(streamed)
    assert sp == ss and len(sp) > 0
    assert stats.streamed_txs == 2
    assert stats.aborted_streams == 1 and stats.aborted_subtxs == 1
    # no poison leaked
    assert all("poison" not in v[0] for v in ss.values())


def test_stream_abort_v4_layout_roundtrip():
    """PG16 protocol v4 appends abort LSN + timestamp to Stream Abort;
    the decoder infers the layout from the frame length, so v2 and v4
    logs both parse (and the transformer's abort handling is layout-
    agnostic — it only reads the xids)."""
    v2 = pg.encode_stream_abort(5, 6)
    a2 = pg.decode_message(v2)
    assert (a2.tx_xid, a2.subtx_xid, a2.abort_lsn, a2.abort_ts) == (5, 6, None, None)
    v4 = pg.encode_stream_abort(5, 6, abort_lsn=0xABC, abort_ts=TS)
    assert len(v4) == len(v2) + 16
    a4 = pg.decode_message(v4)
    assert (a4.tx_xid, a4.subtx_xid, a4.abort_lsn, a4.abort_ts) == (5, 6, 0xABC, TS)
    # v4 abort still drives the transformer identically
    x = MessageTransformer()
    list(x.feed(1, R_MSG))
    list(x.feed(10, pg.encode_stream_start(5, True)))
    list(x.feed(11, pg.encode_insert(RELID, ["1", "a"], xid=5)))
    list(x.feed(12, pg.encode_stream_stop()))
    list(x.feed(20, pg.encode_stream_abort(5, 5, abort_lsn=20, abort_ts=TS)))
    assert x.stats.aborted_streams == 1


# ---------------------------------------------------------------------------
# Two-phase commit ('two_phase' option, PG15+)
# ---------------------------------------------------------------------------


def test_two_phase_codec_roundtrip():
    assert pg.decode_message(pg.encode_begin_prepare(10, 20, TS, 77, "g")) == pg.BeginPrepare(
        10, 20, TS, 77, "g"
    )
    assert pg.decode_message(pg.encode_prepare(10, 20, TS, 77, "g")) == pg.Prepare(
        0, 10, 20, TS, 77, "g"
    )
    assert pg.decode_message(pg.encode_commit_prepared(30, 40, TS, 77, "g")) == pg.CommitPrepared(
        0, 30, 40, TS, 77, "g"
    )
    assert pg.decode_message(
        pg.encode_rollback_prepared(10, 50, TS, TS, 77, "g")
    ) == pg.RollbackPrepared(0, 10, 50, TS, TS, 77, "g")
    assert pg.decode_message(pg.encode_stream_prepare(10, 20, TS, 77, "g")) == pg.StreamPrepare(
        0, 10, 20, TS, 77, "g"
    )
    # Golden layout pin: 'b' has NO flags byte; the others do.
    assert pg.encode_begin_prepare(1, 2, TS, 3, "g")[1:9] == b"\x00\x00\x00\x00\x00\x00\x00\x01"
    assert pg.encode_prepare(1, 2, TS, 3, "g")[1:2] == b"\x00"


def test_prepared_tx_buffers_until_commit_prepared():
    x = MessageTransformer()
    evs = _feed_all(
        x,
        [
            (1, R_MSG),
            (10, pg.encode_begin_prepare(10, 14, TS, 77, "g1")),
            (11, pg.encode_insert(RELID, ["1", "a"])),
            (14, pg.encode_prepare(10, 14, TS, 77, "g1")),
            # another tx commits while g1 is pending
            (20, pg.encode_begin(23, TS, 55)),
            (21, pg.encode_insert(RELID, ["2", "b"])),
            (23, pg.encode_commit(23, 23, TS)),
            (30, pg.encode_commit_prepared(30, 31, TS, 77, "g1")),
        ],
    )
    assert [(e.op, e.lsn, e.tx_id) for e in evs] == [("I", 21, 55), ("I", 11, 77)]
    assert evs[1].begin_lsn == 10 and evs[1].commit_lsn == 30
    assert x.stats.prepared_txs == 1 and x.stats.committed_prepared == 1


def test_rollback_prepared_discards():
    x = MessageTransformer()
    evs = _feed_all(
        x,
        [
            (1, R_MSG),
            (10, pg.encode_begin_prepare(10, 14, TS, 78, "g2")),
            (11, pg.encode_insert(RELID, ["9", "poison"])),
            (14, pg.encode_prepare(10, 14, TS, 78, "g2")),
            (20, pg.encode_rollback_prepared(14, 20, TS, TS, 78, "g2")),
        ],
    )
    assert evs == [] and x.stats.rolled_back_prepared == 1


def test_stream_prepare_then_commit_prepared():
    x = MessageTransformer()
    evs = _feed_all(
        x,
        [
            (1, R_MSG),
            (10, pg.encode_stream_start(79, True)),
            (11, pg.encode_insert(RELID, ["3", "c"], xid=79)),
            (12, pg.encode_stream_stop()),
            (13, pg.encode_stream_prepare(10, 13, TS, 79, "g3")),
            (20, pg.encode_commit_prepared(20, 21, TS, 79, "g3")),
        ],
    )
    assert len(evs) == 1 and evs[0].after["id"] == "3"
    assert evs[0].begin_lsn == 10 and evs[0].commit_lsn == 20


def test_boundaries_prepared_tx_holds_unit_open(tmp_path):
    p = str(tmp_path / "2pc.log")
    _write_frames(
        p,
        [
            (1, R_MSG),
            (10, pg.encode_begin_prepare(10, 14, TS, 77, "g1")),
            (11, pg.encode_insert(RELID, ["1", "a"])),
            (14, pg.encode_prepare(10, 14, TS, 77, "g1")),
            # plain tx while g1 pending: may NOT close a unit
            (20, pg.encode_begin(23, TS, 55)),
            (21, pg.encode_insert(RELID, ["2", "b"])),
            (23, pg.encode_commit(23, 23, TS)),
            (30, pg.encode_commit_prepared(30, 31, TS, 77, "g1")),
            # after resolution, plain txs close their own units again
            (40, pg.encode_begin(43, TS, 56)),
            (41, pg.encode_insert(RELID, ["4", "d"])),
            (43, pg.encode_commit(43, 43, TS)),
        ],
    )
    ranges = replay.tx_boundaries(p)
    assert len(ranges) == 2
    # rollback also closes
    p2 = str(tmp_path / "2pc_rb.log")
    _write_frames(
        p2,
        [
            (10, pg.encode_begin_prepare(10, 14, TS, 78, "g2")),
            (11, pg.encode_insert(RELID, ["9", "x"])),
            (14, pg.encode_prepare(10, 14, TS, 78, "g2")),
            (20, pg.encode_rollback_prepared(14, 20, TS, TS, 78, "g2")),
        ],
    )
    assert len(replay.tx_boundaries(p2)) == 1


def test_two_phase_pair_states_match(tmp_path):
    from pypgcdc_spark.testing import write_two_phase_cdc_pair

    rows = []
    for i in range(300):
        uid = (i * 7) % 37
        et = "error" if i % 11 == 3 else f"ev{i % 5}"
        rows.append((uid, et, float(i) * 1.25))
    plain, twophase = str(tmp_path / "p.log"), str(tmp_path / "t.log")
    write_two_phase_cdc_pair(plain, twophase, rows, chunk=40)
    sp, _ = _final_state(plain)
    st, stats = _final_state(twophase)
    assert sp == st and len(sp) > 0
    assert stats.rolled_back_prepared == 1 and stats.committed_prepared >= 2
    assert all("poison" not in v[0] for v in st.values())
