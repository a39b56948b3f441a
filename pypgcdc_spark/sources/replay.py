"""Replay log: a durable file of raw pgoutput messages.

The testable stand-in for a live Postgres ``walsender`` socket (this
environment has no Postgres; SURVEY §5's plan replaces the reference's
live-integration tests with recorded-stream replay).  The file layout is a
trivially seekable frame stream so the driver can scan for transaction
boundaries without decoding payloads:

    frame := lsn int64be | send_time_us int64be | len int32be | payload bytes

Mirrors the fields of the reference's ``ReplicationMessage``
(``models.py:8-15``): lsn == data_start, send_time, payload.
"""

from __future__ import annotations

import os
import struct
from dataclasses import dataclass
from datetime import datetime, timezone
from typing import Iterator, List, Optional, Tuple

_HDR = struct.Struct(">qqi")


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


def scan_frames(
    path: str,
    start_pos: int = 0,
    end_pos: Optional[int] = None,
    prefix_bytes: Optional[int] = None,
    full_kinds: tuple = (b"R",),
) -> Iterator[Frame]:
    """Iterate frames in [start_pos, end_pos). Tolerates a torn tail write
    (stops at the last complete frame, like WAL readers do).

    ``prefix_bytes`` is the driver-scan mode: yield only the first N
    payload bytes and SEEK past the rest — boundary detection needs at
    most 38 bytes of any frame, so the driver's per-frame cost stops
    scaling with row width (a wide-row feed would otherwise pull every
    byte through Python just to find commit positions).  Frames whose
    kind is in ``full_kinds`` are always read whole ('R' by default:
    schema inference decodes the full Relation message; schema changes
    are rare).  Frame positions stay exact either way."""
    size = os.path.getsize(path)
    end = min(end_pos, size) if end_pos is not None else size
    with open(path, "rb") as f:
        f.seek(start_pos)
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
