"""Replay log: a durable file of raw pgoutput messages.

The testable stand-in for a live Postgres ``walsender`` socket (this
environment has no Postgres; SURVEY §5's plan replaces the reference's
live-integration tests with recorded-stream replay).  The file layout is a
trivially seekable frame stream so the driver can scan for transaction
boundaries without decoding payloads:

    frame := lsn int64be | send_time_us int64be | len int32be | payload bytes

Mirrors the fields of the reference's ``ReplicationMessage``
(``models.py:8-15``): lsn == data_start, send_time, payload.

Segmented retention (round 9 — the last unbounded resource): a plain
replay log only ever GROWS, while the engine trims *Postgres's* WAL via
acks (the r8 soak measured 183 MB → 1.9 GB in 2.2 h).  The reference has
the same retention model server-side — WAL below the flushed LSN is gone
(``/root/reference/src/pypgcdc/reader.py:161-163``) — so the log applies
it to itself:

* positions stay LOGICAL (monotone since log birth) — offsets,
  checkpoints and ack sidecars are unchanged;
* the writer ROLLS the active file at closed-unit boundaries once it
  exceeds ``segment_bytes``: one atomic ``os.rename`` into
  ``<path>.segments.d/seg-<start>-<end>.log`` (hex logical range), then
  a fresh active file.  A crash between rename and reopen just leaves
  the active file missing — readers treat that as empty, the next open
  recreates it; there is no state in which bytes appear twice;
* readers stitch segments + active transparently (``scan_frames`` maps
  logical ranges onto files); an open unit is only ever in the ACTIVE
  file (rolls happen at unit boundaries), so tail truncation semantics
  are untouched;
* ``gc_segments(path, below_pos)`` deletes segments wholly below the
  durably-acked position — same watermark discipline as the registry
  snapshot GC.  Batches at/below the ack are never replayed
  (confirmed-flush semantics), so a checkpoint replay can never
  reference a GC'd segment; a fresh consumer with no checkpoint clamps
  its start to ``log_min_pos`` exactly like a new PG subscriber starts
  at the slot's restart point;
* ``<path>.segments.d/meta.json`` persists the active file's base
  offset (rolls re-derive it, GC never removes it) and a GENERATION id
  so the ack sidecar's log-identity stamp stays stable across rolls and
  GC.
"""

from __future__ import annotations

import json
import os
import struct
import uuid
from dataclasses import dataclass
from datetime import datetime, timezone
from typing import Iterator, List, Optional, Tuple

_HDR = struct.Struct(">qqi")


# -- segmented-log layout helpers -------------------------------------------


def segments_dir(path: str) -> str:
    return path + ".segments.d"


def list_segments(path: str) -> List[Tuple[int, int, str]]:
    """Archived segments as sorted (logical_start, logical_end, file)."""
    d = segments_dir(path)
    out: List[Tuple[int, int, str]] = []
    try:
        names = os.listdir(d)
    except OSError:
        return out
    for fn in names:
        if fn.startswith("seg-") and fn.endswith(".log"):
            try:
                a, b = fn[4:-4].split("-")
                out.append((int(a, 16), int(b, 16), os.path.join(d, fn)))
            except ValueError:
                continue
    out.sort()
    return out


def _load_meta(path: str) -> dict:
    try:
        with open(os.path.join(segments_dir(path), "meta.json")) as f:
            return json.load(f)
    except (OSError, ValueError):
        return {}


def _save_meta(path: str, meta: dict) -> None:
    d = segments_dir(path)
    os.makedirs(d, exist_ok=True)
    tmp = os.path.join(d, "meta.json.tmp")
    with open(tmp, "w") as f:
        json.dump(meta, f)
    os.replace(tmp, os.path.join(d, "meta.json"))


def log_base(path: str) -> int:
    """Logical offset of the active file's byte 0.  Max of the persisted
    meta and the newest segment's end — robust to a crash between the
    roll rename and the meta update."""
    segs = list_segments(path)
    seg_end = segs[-1][1] if segs else 0
    return max(int(_load_meta(path).get("base", 0)), seg_end)


def log_size(path: str) -> int:
    """Total LOGICAL length (base + active bytes; missing active = 0)."""
    try:
        active = os.path.getsize(path)
    except OSError:
        active = 0
    return log_base(path) + active


def log_min_pos(path: str) -> int:
    """Lowest logical position still on disk (GC may have removed
    earlier segments — like WAL below the flushed LSN, it's gone)."""
    segs = list_segments(path)
    return segs[0][0] if segs else log_base(path)


def log_generation(path: str) -> str:
    """Stable generation id for a segmented log ('' for plain files —
    callers fall back to the first-frame identity)."""
    return str(_load_meta(path).get("generation", ""))


def read_at(path: str, logical_pos: int, n: int) -> bytes:
    """Read up to ``n`` bytes at a logical position, wherever the bytes
    live (segment or active file).  Returns b'' if the position is not
    on disk (GC'd, or beyond the end)."""
    base = log_base(path)
    if logical_pos >= base:
        try:
            with open(path, "rb") as f:
                f.seek(logical_pos - base)
                return f.read(n)
        except OSError:
            return b""
    for s, e, fp in list_segments(path):
        if s <= logical_pos < e:
            with open(fp, "rb") as f:
                f.seek(logical_pos - s)
                return f.read(n)
    return b""


def truncate_log(path: str, logical_pos: int) -> None:
    """Truncate the log's tail back to a logical position.  Only the
    open unit is ever truncated and rolls happen at closed-unit
    boundaries, so the cut is always within the active file."""
    base = log_base(path)
    if logical_pos < base:
        raise ValueError(
            f"truncate into archived segment: pos {logical_pos} < base {base}"
        )
    with open(path, "r+b") as f:
        f.truncate(logical_pos - base)


def gc_segments(path: str, below_pos: int) -> int:
    """Delete archived segments wholly below ``below_pos`` (the durably
    acked byte position).  Returns bytes freed.  Best-effort and
    idempotent — a concurrent GC from the other end of the pipe (tailer
    vs Spark reader) just finds the file already gone."""
    freed = 0
    for s, e, fp in list_segments(path):
        if e <= below_pos:
            try:
                freed += os.path.getsize(fp)
                os.remove(fp)
            except OSError:
                pass
    return freed


@dataclass(frozen=True)
class Frame:
    lsn: int
    send_time_us: int
    payload: bytes
    start_pos: int  # byte offset of the frame in the file
    end_pos: int  # byte offset just past the frame


class ReplayLogWriter:
    """Append pgoutput messages to a replay log.

    ``pos`` tracks the byte length of the log including buffered
    appends; :meth:`truncate` cuts the file back to an earlier
    position — the wire tailer writes frames through as they arrive
    (O(1) memory regardless of transaction size) and drops a
    duplicate/aborted unit, which always occupies the log TAIL
    contiguously, by truncating to the unit's start."""

    def __init__(self, path: str):
        self.path = path
        self._f = open(path, "ab")
        self.pos = os.path.getsize(path)

    def append(self, lsn: int, payload: bytes, send_time: Optional[datetime] = None) -> None:
        ts = send_time or datetime.now(timezone.utc)
        us = int(ts.timestamp() * 1_000_000)
        self._f.write(_HDR.pack(lsn, us, len(payload)) + payload)
        self.pos += _HDR.size + len(payload)

    def flush(self) -> None:
        """Make appended frames visible to a concurrent log tailer."""
        self._f.flush()

    def sync(self) -> None:
        """flush + fsync: frames survive a machine crash.  The tailer
        calls this BEFORE forwarding a flush LSN to Postgres — once the
        server sees the ack it recycles WAL, so an OS-buffered log tail
        lost in a crash would be unrecoverable."""
        self._f.flush()
        os.fsync(self._f.fileno())

    def truncate(self, pos: int) -> None:
        """Cut the log back to ``pos`` (O_APPEND writes continue at the
        new end).  Concurrent readers never see the removed span as
        data: it can only be an OPEN unit's frames, which the boundary
        scanner never offers to a partition."""
        self._f.flush()
        self._f.truncate(pos)
        self.pos = pos

    def close(self) -> None:
        self._f.flush()
        self._f.close()

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()


class SegmentedLogWriter(ReplayLogWriter):
    """ReplayLogWriter with rolling segments + retention GC.

    ``pos`` is LOGICAL (monotone since log birth); the active file holds
    [base, pos).  The owner (the wire tailer) calls :meth:`maybe_roll`
    only at closed-unit boundaries — the invariant that keeps the open
    unit (the only thing ever truncated) entirely in the active file —
    and :meth:`gc` with the durably-acked byte position.

    Roll crash-safety: the rename is the only mutation; if the process
    dies before the new active file is created, the path is simply
    missing (readers treat it as empty at ``base``) and the next open
    recreates it.  No state duplicates bytes.
    """

    def __init__(self, path: str, segment_bytes: int = 256 << 20):
        self.segment_bytes = segment_bytes
        self.base = log_base(path)
        meta = _load_meta(path)
        if "generation" not in meta:
            # Stable identity for ack sidecars across rolls AND retention
            # GC (a first-frame identity would change when its segment
            # is collected).
            meta["generation"] = uuid.uuid4().hex
            meta.setdefault("base", self.base)
            _save_meta(path, meta)
        super().__init__(path)
        self.pos += self.base  # logical

    def append(self, lsn: int, payload: bytes, send_time=None) -> None:
        super().append(lsn, payload, send_time)  # pos advances logically

    def truncate(self, pos: int) -> None:
        """Cut the tail back to logical ``pos`` (always in the active
        file: only open-unit bytes are truncated, rolls happen at
        closed-unit boundaries)."""
        if pos < self.base:
            raise ValueError(
                f"truncate into archived segment: {pos} < base {self.base}"
            )
        self._f.flush()
        self._f.truncate(pos - self.base)
        self.pos = pos

    def maybe_roll(self) -> bool:
        """Roll the active file into an archived segment if it exceeds
        ``segment_bytes``.  MUST be called only when the log tail is at
        a closed-unit boundary (writer.pos == the open unit's start)."""
        active = self.pos - self.base
        if active < self.segment_bytes or active == 0:
            return False
        self._f.flush()
        os.fsync(self._f.fileno())  # archived bytes survive a crash
        self._f.close()
        d = segments_dir(self.path)
        os.makedirs(d, exist_ok=True)
        seg = os.path.join(d, f"seg-{self.base:016x}-{self.pos:016x}.log")
        os.rename(self.path, seg)  # atomic; crash here = missing active (fine)
        self.base = self.pos
        meta = _load_meta(self.path)
        meta["base"] = self.base
        _save_meta(self.path, meta)
        self._f = open(self.path, "ab")
        return True

    def gc(self, acked_pos: int) -> int:
        """Drop segments wholly below the durably-acked position; returns
        bytes freed.  The replay-log twin of Postgres recycling WAL below
        the confirmed flush LSN."""
        return gc_segments(self.path, acked_pos)


def scan_frames(
    path: str,
    start_pos: int = 0,
    end_pos: Optional[int] = None,
    prefix_bytes: Optional[int] = None,
    full_kinds: tuple = (b"R",),
) -> Iterator[Frame]:
    """Iterate frames in [start_pos, end_pos) of the LOGICAL log.
    Tolerates a torn tail write (stops at the last complete frame, like
    WAL readers do).

    Transparent over segmentation: archived segments and the active file
    stitch into one logical byte space (segments always cut at frame —
    indeed transaction-unit — boundaries, so no frame straddles files).
    A start below ``log_min_pos`` raises — those bytes are gone, exactly
    like WAL below the flushed LSN; callers with no checkpoint clamp
    their start to ``log_min_pos`` first.

    ``prefix_bytes`` is the driver-scan mode: yield only the first N
    payload bytes and SEEK past the rest — boundary detection needs at
    most 38 bytes of any frame, so the driver's per-frame cost stops
    scaling with row width (a wide-row feed would otherwise pull every
    byte through Python just to find commit positions).  Frames whose
    kind is in ``full_kinds`` are always read whole ('R' by default:
    schema inference decodes the full Relation message; schema changes
    are rare).  Frame positions stay exact either way."""
    segs = list_segments(path)
    if not segs and not _load_meta(path):
        # Plain single-file log: the original zero-overhead path.
        yield from _scan_file(path, 0, start_pos, end_pos, prefix_bytes, full_kinds)
        return
    total = log_size(path)
    end = min(end_pos, total) if end_pos is not None else total
    if start_pos < end and start_pos < log_min_pos(path):
        raise ValueError(
            f"scan start {start_pos} below retained window "
            f"(log_min_pos={log_min_pos(path)}): segments were GC'd"
        )
    for s, e, fp in segs:
        if e <= start_pos or s >= end:
            continue
        yield from _scan_file(
            fp, s, max(start_pos, s), min(end, e), prefix_bytes, full_kinds
        )
    base = log_base(path)
    if end > base and os.path.exists(path):
        yield from _scan_file(
            path, base, max(start_pos, base), end, prefix_bytes, full_kinds
        )


def _scan_file(
    file_path: str,
    file_base: int,
    start_pos: int,
    end_pos: Optional[int],
    prefix_bytes: Optional[int],
    full_kinds: tuple,
) -> Iterator[Frame]:
    """Scan one physical file whose byte 0 sits at logical ``file_base``;
    yielded positions are logical."""
    size = file_base + os.path.getsize(file_path)
    end = min(end_pos, size) if end_pos is not None else size
    with open(file_path, "rb") as f:
        f.seek(start_pos - file_base)
        pos = start_pos
        while pos + _HDR.size <= end:
            hdr = f.read(_HDR.size)
            if len(hdr) < _HDR.size:
                break
            lsn, us, n = _HDR.unpack(hdr)
            if pos + _HDR.size + n > end:
                break
            if prefix_bytes is None or n <= prefix_bytes:
                payload = f.read(n)
                if len(payload) < n:
                    break
            else:
                payload = f.read(prefix_bytes)
                if len(payload) < prefix_bytes:
                    break
                if payload[:1] in full_kinds:
                    rest = f.read(n - prefix_bytes)
                    if len(rest) < n - prefix_bytes:
                        break
                    payload += rest
                else:
                    f.seek(n - prefix_bytes, 1)
            new_pos = pos + _HDR.size + n
            yield Frame(lsn, us, payload, pos, new_pos)
            pos = new_pos


class TxBoundaryScanner:
    """Incremental transaction-unit boundary detection (protocol v1 + v2).

    Feeds frames in file order and reports where a *complete* unit ends —
    a byte position at which a partition (or micro-batch offset) may be
    cut without bisecting any transaction:

    * v1: just past each Commit ('C') frame;
    * v2: streamed transactions open at their first Stream Start ('S') and
      close at Stream Commit ('c') or a top-level Stream Abort ('A').
      While ANY stream is open, nothing closes — segments interleave with
      other transactions, so the whole interleaved span collapses into one
      unit (the partition reader's buffer-per-xid reassembly needs to see
      every segment of a span; walsender serializes segments, it never
      nests them);
    * two-phase ('two_phase' option): a prepared transaction opens at
      Begin Prepare ('b') — or stays open past Stream Prepare ('p') for
      the streamed flavor — and closes only at Commit Prepared ('K') or
      Rollback Prepared ('r'): the pending buffer and its resolution must
      land in one partition.

    Also tracks whether the *next* transactional frame uses the in-segment
    wire layout (leading xid) via :attr:`in_segment` — callers decoding
    R frames driver-side must pass ``streamed=self.in_segment``.
    """

    __slots__ = ("open_streams", "in_segment", "range_start")

    def __init__(self):
        self.open_streams: set = set()
        self.in_segment = False
        self.range_start: Optional[int] = None  # first frame of the open unit

    def feed(self, fr: Frame) -> Optional[Tuple[int, int]]:
        """Returns the closed (start_pos, end_pos) unit range, if ``fr``
        completes one, else None."""
        if self.range_start is None:
            self.range_start = fr.start_pos
        kind = fr.payload[:1]
        if kind == b"S":
            # StreamStart: int32 xid after the type byte.
            xid = struct.unpack_from(">i", fr.payload, 1)[0]
            self.open_streams.add(xid)
            self.in_segment = True
            return None
        if kind == b"E":
            self.in_segment = False
            return None
        if kind == b"c":
            xid = struct.unpack_from(">i", fr.payload, 1)[0]
            self.open_streams.discard(xid)
            return self._maybe_close(fr)
        if kind == b"A":
            xid, subxid = struct.unpack_from(">ii", fr.payload, 1)
            if subxid == xid:
                self.open_streams.discard(xid)
                return self._maybe_close(fr)
            return None
        if kind == b"b":
            # BeginPrepare: int64 prepare_lsn | int64 end_lsn | int64 ts |
            # int32 xid — the prepared tx stays open until 'K'/'r'.
            xid = struct.unpack_from(">i", fr.payload, 25)[0]
            self.open_streams.add(xid)
            return None
        if kind == b"K":
            # CommitPrepared: int8 flags | 3×int64 | int32 xid.
            xid = struct.unpack_from(">i", fr.payload, 26)[0]
            self.open_streams.discard(xid)
            return self._maybe_close(fr)
        if kind == b"r":
            # RollbackPrepared: int8 flags | 4×int64 | int32 xid.
            xid = struct.unpack_from(">i", fr.payload, 34)[0]
            self.open_streams.discard(xid)
            return self._maybe_close(fr)
        # 'P' (Prepare) and 'p' (StreamPrepare) leave the tx open.
        if kind == b"C" and not self.in_segment:
            # A plain commit closes the unit only when no streamed tx is
            # still open (its remaining segments are yet to come).
            return self._maybe_close(fr)
        return None

    def _maybe_close(self, fr: Frame) -> Optional[Tuple[int, int]]:
        if self.open_streams:
            return None
        start = self.range_start
        self.range_start = None
        return (start, fr.end_pos)


def tx_boundaries(path: str, start_pos: int = 0) -> List[Tuple[int, int]]:
    """Byte ranges of whole transaction units (plus standalone R/O/Y
    prologue folded into the following unit's range).

    A range ends just past a Commit / Stream Commit / top-level Stream
    Abort frame, never while a v2 streamed transaction is open.  Used by
    the driver to cut micro-batch offsets — and intra-batch partition
    splits — that never bisect a transaction, so each partition reader
    sees complete spans (tx context and stream reassembly buffers never
    cross partitions).
    """
    ranges: List[Tuple[int, int]] = []
    scanner = TxBoundaryScanner()
    for fr in scan_frames(path, start_pos, prefix_bytes=64):
        closed = scanner.feed(fr)
        if closed is not None:
            ranges.append(closed)
    return ranges
