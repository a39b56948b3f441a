"""Replay-log segmentation + retention GC (round-9 verdict task 1).

The r8 soak measured the tailer's replay log growing 183 MB → 1.9 GB in
2.2 h with no truncation below the acked LSN — the engine trimmed
*Postgres's* WAL via acks but never its own durable hand-off.  The log
now rolls into archived segments at closed-unit boundaries (logical
positions preserved — offsets/checkpoints/acks unchanged) and segments
wholly below the durable ack are GC'd, from BOTH ends of the pipe (the
tailer's ack-forward path and the Spark reader's commit()).

Pins:
* segmented scans are byte-identical to the plain single-file layout
  (frames, positions, tx boundaries);
* the pgcdc stream reader drains identical envelopes over either layout,
  and a checkpoint replay never references a GC'd segment (GC watermark
  = the acked position = the floor of anything Spark ever re-asks for);
* a FRESH consumer clamps its start to the retained window
  (``log_min_pos``), like a new subscriber starting at a slot's restart
  LSN; a scan below it raises;
* the ack generation stamp is stable across rolls AND GC (persisted
  generation id, not first-frame identity);
* tailer end-to-end: with ``segment_bytes`` set and acks advancing, the
  on-disk footprint PLATEAUS (the r9 soak artifact's unit-level twin).
"""

import json
import os

from pypgcdc_spark.cdc import pgoutput as pg
from pypgcdc_spark.sources import replay
from pypgcdc_spark.sources.pgcdc import PgCdcStreamReader
from pypgcdc_spark.sources.replay import (
    SegmentedLogWriter,
    gc_segments,
    list_segments,
    log_base,
    log_generation,
    log_min_pos,
    log_size,
    scan_frames,
    tx_boundaries,
)
from pypgcdc_spark.testing import (
    INTEGRATION_COLS,
    INTEGRATION_RELID,
    WorkloadWriter,
    write_upsert_workload,
)

import pytest


def _write_plain(path, n_keys=30, n_updates=120):
    write_upsert_workload(path, n_keys=n_keys, n_updates=n_updates)
    return [(fr.lsn, fr.send_time_us, fr.payload) for fr in scan_frames(path)]


def _write_segmented(path, plain_path, segment_bytes=2048):
    """Replay a plain log's frames through a SegmentedLogWriter, rolling
    at every closed-unit boundary the tailer would."""
    from pypgcdc_spark.sources.replay import TxBoundaryScanner

    w = SegmentedLogWriter(path, segment_bytes=segment_bytes)
    scanner = TxBoundaryScanner()
    from datetime import datetime, timezone

    for fr in scan_frames(plain_path):
        ts = datetime.fromtimestamp(fr.send_time_us / 1e6, tz=timezone.utc)
        closed = scanner.feed(fr)
        w.append(fr.lsn, fr.payload, send_time=ts)
        if closed is not None:
            w.maybe_roll()
    w.close()
    return w


def test_segmented_scan_is_byte_identical(tmp_path):
    plain = str(tmp_path / "plain.log")
    frames = _write_plain(plain)
    seg = str(tmp_path / "seg.log")
    _write_segmented(seg, plain)

    assert len(list_segments(seg)) >= 2, "fixture too small to roll"
    assert log_size(seg) == os.path.getsize(plain)
    got = [(fr.lsn, fr.send_time_us, fr.payload) for fr in scan_frames(seg)]
    assert got == frames
    # Logical positions identical too (offset compatibility).
    assert [(f.start_pos, f.end_pos) for f in scan_frames(seg)] == [
        (f.start_pos, f.end_pos) for f in scan_frames(plain)
    ]
    assert tx_boundaries(seg) == tx_boundaries(plain)
    # Mid-log ranged scan crossing a segment boundary.
    b = tx_boundaries(plain)
    mid, end = b[len(b) // 3][0], b[2 * len(b) // 3][1]
    assert [f.lsn for f in scan_frames(seg, mid, end)] == [
        f.lsn for f in scan_frames(plain, mid, end)
    ]
    # prefix_bytes driver-scan mode stitches identically.
    assert [f.payload[:1] for f in scan_frames(seg, prefix_bytes=64)] == [
        f.payload[:1] for f in scan_frames(plain, prefix_bytes=64)
    ]


def _drain(reader, start, end):
    rows = []
    for p in reader.partitions(start, end):
        rows.extend(reader.read(p))
    return rows


def test_stream_reader_over_segmented_log(tmp_path):
    plain = str(tmp_path / "plain.log")
    _write_plain(plain)
    seg = str(tmp_path / "seg.log")
    _write_segmented(seg, plain)

    rp = PgCdcStreamReader({"path": plain})
    rs = PgCdcStreamReader({"path": seg})
    op, os_ = rp.initialOffset(), rs.initialOffset()
    ep, es = rp.latestOffset(), rs.latestOffset()
    assert (ep["pos"], ep["lsn"]) == (es["pos"], es["lsn"])
    assert _drain(rp, op, ep) == _drain(rs, os_, es)


def test_reader_commit_gcs_segments_and_resumes(tmp_path):
    plain = str(tmp_path / "plain.log")
    _write_plain(plain)
    seg = str(tmp_path / "seg.log")
    _write_segmented(seg, plain)
    n_segs0 = len(list_segments(seg))
    assert n_segs0 >= 2

    r = PgCdcStreamReader({"path": seg, "maxtxperbatch": 40})
    o0 = r.initialOffset()
    o1 = r.latestOffset()
    batch1 = _drain(r, o0, o1)
    assert batch1
    r.commit(o1)  # reader-side GC fires here
    freed = n_segs0 - len(list_segments(seg))
    assert freed >= 1, "no segment fell below the acked position"
    assert log_min_pos(seg) > 0
    # Everything at/above the committed offset is still fully readable —
    # including the checkpoint-replay shape (partitions from o1).
    o2 = r.latestOffset()
    batch2 = _drain(r, o1, o2)
    assert batch2
    # A scan below the retained window is a loud error, not silence.
    with pytest.raises(ValueError, match="GC'd"):
        list(scan_frames(seg, 0))

    # Restart: a fresh reader resuming from the checkpointed o1 works
    # over the GC'd log (its scan clamps to the retained window).
    r2 = PgCdcStreamReader({"path": seg, "maxtxperbatch": 40})
    r2.latestOffset()
    assert _drain(r2, o1, o2) == batch2


def test_fresh_consumer_clamps_to_retained_window(tmp_path):
    """Realistic GC flow: consumer 1 drains and commits (GC fires and
    persists registry snapshots); a FRESH consumer (new checkpoint,
    pos 0) then clamps to the retained window — and restores schema
    from the snapshot sidecar, because the Relation frames are gone
    with their segments (a live walsender would resend them; the
    sidecar is the replay log's durable twin)."""
    plain = str(tmp_path / "plain.log")
    _write_plain(plain)
    seg = str(tmp_path / "seg.log")
    _write_segmented(seg, plain)

    c1 = PgCdcStreamReader({"path": seg, "maxtxperbatch": 60})
    o0 = c1.initialOffset()
    o1 = c1.latestOffset()
    _drain(c1, o0, o1)
    c1.commit(o1)  # ack + GC
    start = log_min_pos(seg)
    assert 0 < start <= o1["pos"]

    fresh = PgCdcStreamReader({"path": seg})
    f0 = fresh.initialOffset()  # pos 0 — below the retained window
    f1 = fresh.latestOffset()
    assert f1["pos"] == log_size(seg)
    rows = _drain(fresh, {"pos": start, "lsn": 0, "reg": f1["reg"]}, f1)
    assert rows, "fresh consumer must read the retained suffix"
    # Decoded rows are TYPED through the snapshot-restored schema (the
    # R frame itself was GC'd) — ops present and key map populated.
    assert {t[0] for t in rows} <= {"I", "U", "D", "T"}


def test_generation_stamp_stable_across_roll_and_gc(tmp_path):
    plain = str(tmp_path / "plain.log")
    _write_plain(plain, n_keys=10, n_updates=40)
    seg = str(tmp_path / "seg.log")
    w = _write_segmented(seg, plain)
    gen = log_generation(seg)
    assert gen != ""
    del w
    r = PgCdcStreamReader({"path": seg})
    assert r._log_identity() == gen
    # Roll more data in, GC everything old — identity unchanged.
    end = log_size(seg)
    gc_segments(seg, end)
    assert list_segments(seg) == []
    r2 = PgCdcStreamReader({"path": seg})
    assert r2._log_identity() == gen == log_generation(seg)


def test_truncate_and_torn_tail_in_segmented_log(tmp_path):
    """The open unit only ever lives in the active file; logical
    truncation cuts it exactly as in the single-file layout."""
    from datetime import datetime, timezone

    ts = datetime(2024, 1, 1, tzinfo=timezone.utc)
    seg = str(tmp_path / "seg.log")
    w = SegmentedLogWriter(seg, segment_bytes=256)
    relid, cols = INTEGRATION_RELID, INTEGRATION_COLS
    w.append(10, pg.encode_relation(relid, "public", "integration", cols), ts)
    w.append(20, pg.encode_begin(40, ts, 1), ts)
    w.append(30, pg.encode_insert(relid, ["1", None, "1.00", None, "a"]), ts)
    w.append(40, pg.encode_commit(40, 40, ts), ts)
    assert w.maybe_roll()
    base = w.base
    assert base == w.pos and log_base(seg) == base
    # Open unit in the new active file…
    unit_start = w.pos
    w.append(50, pg.encode_begin(70, ts, 2), ts)
    w.append(60, pg.encode_insert(relid, ["2", None, "2.00", None, "b"]), ts)
    # …rolls are illegal while it is open (nothing to roll yet anyway),
    # and a reconnect truncates it back logically.
    w.truncate(unit_start)
    assert w.pos == unit_start and os.path.getsize(seg) == 0
    # Truncating INTO an archived segment is a refused, loud error.
    with pytest.raises(ValueError, match="archived"):
        w.truncate(base - 1)
    w.close()
    assert [f.lsn for f in scan_frames(seg)] == [10, 20, 30, 40]
