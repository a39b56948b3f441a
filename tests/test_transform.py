"""Transform-layer unit tests (no Spark): message stream -> ChangeEvents.

Asserts the same contract the reference's MagicMock-sink integration tests
assert (handler/op counts per committed transaction — FIXTURES.md §7:
begin=4, change=4, commit=4 for the canonical workload)."""

import pytest

from pypgcdc_spark.cdc import pgoutput as pg
from pypgcdc_spark.cdc.models import TOAST_UNCHANGED
from pypgcdc_spark.cdc.registry import SchemaRegistry
from pypgcdc_spark.cdc.transform import MessageTransformer
from pypgcdc_spark.sources.replay import scan_frames
from pypgcdc_spark.testing import (
    INTEGRATION_COLS,
    INTEGRATION_RELID,
    write_reference_workload,
)


def _run_workload(path):
    xform = MessageTransformer(registry=SchemaRegistry())
    events = []
    for fr in scan_frames(str(path)):
        events.extend(xform.feed(fr.lsn, fr.payload))
    return xform, events


def test_reference_workload_event_counts(tmp_path):
    log = tmp_path / "ref.log"
    write_reference_workload(str(log))
    xform, events = _run_workload(log)

    # 4 transactions → 4 data events; B/C/R never become rows.
    assert [e.op for e in events] == ["I", "U", "D", "I"]
    assert xform.stats.relations == 2
    assert xform.stats.events == 4

    ins, upd, dele, marker = events
    assert ins.table == "integration" and ins.after["json_data"] == '{"data": 10}'
    assert ins.before is None and ins.key == {"id": "10"}
    assert upd.after["json_data"] == '{"data": 20}'
    assert dele.op == "D" and dele.after is None and dele.key["id"] == "10"
    assert marker.table == "control" and marker.after == {"id": "1", "command": "exit"}

    # Transaction metadata rides on every event (tx struct, FIXTURES §7).
    assert all(e.tx_id is not None and e.commit_ts is not None for e in events)
    # LSNs strictly increase in stream order.
    lsns = [e.lsn for e in events]
    assert lsns == sorted(lsns) and len(set(lsns)) == len(lsns)


def test_toast_unchanged_sentinel_not_null(tmp_path):
    xform = MessageTransformer(registry=SchemaRegistry())
    rel = pg.encode_relation(INTEGRATION_RELID, "public", "integration", INTEGRATION_COLS)
    list(xform.feed(1, rel))
    upd = pg.encode_update(
        INTEGRATION_RELID,
        ["1", None, "2.00", "2024-01-01 00:00:00+00", "ignored"],
        toast_unchanged={4},
    )
    (ev,) = list(xform.feed(2, upd))
    assert ev.after["text_data"] == TOAST_UNCHANGED  # distinct from NULL (Q6)
    assert ev.after["json_data"] is None


def test_update_with_full_before_image_key(tmp_path):
    xform = MessageTransformer(registry=SchemaRegistry())
    list(xform.feed(1, pg.encode_relation(INTEGRATION_RELID, "public", "t", INTEGRATION_COLS)))
    upd = pg.encode_update(
        INTEGRATION_RELID,
        ["1", "new", "1.00", "2024-01-01 00:00:00+00", "n"],
        old_values=["1", "old", "1.00", "2024-01-01 00:00:00+00", "o"],
        old_category="O",
    )
    (ev,) = list(xform.feed(2, upd))
    assert ev.before["json_data"] == "old"
    # Key is ALWAYS the pkey projection (values from the before-image when
    # present) so D/U events land in the same dedup partition as Inserts —
    # a full-image key would never collide with Insert keys (ADVICE r1).
    assert ev.key == {"id": "1"}


def test_truncate_emits_rows(tmp_path):
    # The reference's truncate path is dead code (Q3); ours emits op='T'.
    xform = MessageTransformer(registry=SchemaRegistry())
    list(xform.feed(1, pg.encode_relation(INTEGRATION_RELID, "public", "t", INTEGRATION_COLS)))
    evs = list(xform.feed(2, pg.encode_truncate([INTEGRATION_RELID])))
    assert len(evs) == 1 and evs[0].op == "T" and evs[0].table == "t"


def test_origin_and_type_ignored_not_crash():
    xform = MessageTransformer(registry=SchemaRegistry())
    assert list(xform.feed(1, pg.encode_origin(5, "n1"))) == []
    assert list(xform.feed(2, pg.encode_type(600, "public", "mood"))) == []
    assert xform.stats.ignored_origin == 1 and xform.stats.ignored_type == 1


def test_event_before_relation_raises():
    xform = MessageTransformer(registry=SchemaRegistry())
    with pytest.raises(LookupError):
        list(xform.feed(1, pg.encode_insert(999, ["1"])))


def test_registry_schema_evolution_versioned():
    # Q4 fix: a changed Relation message creates a new schema version.
    reg = SchemaRegistry()
    r1 = pg.decode_relation(pg.encode_relation(5, "public", "t", [(True, "id", 23, -1)]))
    r2 = pg.decode_relation(
        pg.encode_relation(5, "public", "t", [(True, "id", 23, -1), (False, "v", 25, -1)])
    )
    reg.register_relation(r1, lsn=10)
    reg.register_relation(r1, lsn=20)  # identical → no new version
    reg.register_relation(r2, lsn=30)
    assert len(reg._versions[("replay", 5)]) == 2
    assert len(reg.get_at_lsn(5, 15).column_definitions) == 1
    assert len(reg.get_at_lsn(5, 35).column_definitions) == 2
    # Round-trips through JSON (checkpoint persistence).
    reg2 = SchemaRegistry.loads(reg.dumps())
    assert len(reg2.get(5).column_definitions) == 2


def test_decimal_typing_from_atttypmod():
    # Q5 fix: numeric(10,2) → DecimalType(10,2), not float.
    from pypgcdc_spark.cdc.models import pg_type_to_spark

    t = pg_type_to_spark("numeric", ((10 << 16) | 2) + 4)
    assert str(t) == "DecimalType(10,2)"
    assert str(pg_type_to_spark("numeric(12,3)")) == "DecimalType(12,3)"


from datetime import datetime, timezone

RELID = 77001
COLS = [(True, "id", 23, -1), (False, "v", 25, -1)]
TS = datetime(2024, 1, 1, tzinfo=timezone.utc)


def test_emit_messages_outbox_surface():
    """pg_logical_emit_message -> op='M' envelope rows (the transactional
    outbox surface): a transactional message rides its transaction's
    context; a non-transactional one emits immediately with none; the
    default (emit_messages=False) keeps the count-and-skip behavior."""
    from pypgcdc_spark.cdc.registry import SchemaRegistry
    from pypgcdc_spark.cdc.transform import MessageTransformer

    x = MessageTransformer(registry=SchemaRegistry(), emit_messages=True)
    evs = []
    evs += x.feed(100, pg.encode_relation(RELID, "public", "t", COLS))
    evs += x.feed(110, pg.encode_begin(140, TS, 700))
    evs += x.feed(120, pg.encode_logical_message("outbox", b'{"k":1}', msg_lsn=120))
    evs += x.feed(130, pg.encode_insert(RELID, ["1", "a"]))
    evs += x.feed(140, pg.encode_commit(140, 140, TS))
    evs += x.feed(150, pg.encode_logical_message("audit", b"nt", msg_lsn=150, transactional=False))
    ops = [(e.op, e.lsn, e.tx_id) for e in evs]
    assert ops == [("M", 120, 700), ("I", 130, 700), ("M", 150, None)]
    m = evs[0]
    assert m.key == {"prefix": "outbox"}
    assert m.after["content_hex"] == b'{"k":1}'.hex()
    assert m.after["transactional"] == "true"
    assert x.stats.messages_emitted == 2
    assert x.stats.ignored_logical_message == 0

    # Default keeps ignoring.
    y = MessageTransformer(registry=SchemaRegistry())
    assert list(y.feed(150, pg.encode_logical_message("a", b"x"))) == []
    assert y.stats.ignored_logical_message == 1


def test_emit_messages_streamed_buffer_and_abort():
    """Transactional messages inside v2 stream segments buffer with the
    DML and drain at Stream Commit under the commit's context; a
    top-level Stream Abort discards buffered messages with the rest."""
    from pypgcdc_spark.cdc.registry import SchemaRegistry
    from pypgcdc_spark.cdc.transform import MessageTransformer

    x = MessageTransformer(registry=SchemaRegistry(), emit_messages=True)
    evs = []
    evs += x.feed(100, pg.encode_relation(RELID, "public", "t", COLS))
    evs += x.feed(110, pg.encode_stream_start(900, first_segment=True))
    evs += x.feed(120, pg.encode_logical_message("outbox", b"in-span", msg_lsn=120, xid=900))
    evs += x.feed(130, pg.encode_insert(RELID, ["1", "a"], xid=900))
    evs += x.feed(140, pg.encode_stream_stop())
    assert evs == []  # nothing before the commit
    evs += x.feed(150, pg.encode_stream_commit(900, 150, 150, TS))
    assert [(e.op, e.lsn, e.tx_id) for e in evs] == [("M", 120, 900), ("I", 130, 900)]
    assert all(e.commit_lsn == 150 for e in evs)

    # Aborted stream: its buffered message must never surface.
    evs2 = []
    evs2 += x.feed(210, pg.encode_stream_start(901, first_segment=True))
    evs2 += x.feed(220, pg.encode_logical_message("outbox", b"poison", msg_lsn=220, xid=901))
    evs2 += x.feed(230, pg.encode_stream_stop())
    evs2 += x.feed(240, pg.encode_stream_abort(901))
    assert evs2 == []
    assert x.stats.messages_emitted == 1
