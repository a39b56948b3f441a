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
    """Append pgoutput messages to a replay log (test-stream synthesis)."""

    def __init__(self, path: str):
        self.path = path
        self._f = open(path, "ab")

    def append(self, lsn: int, payload: bytes, send_time: Optional[datetime] = None) -> None:
        ts = send_time or datetime.now(timezone.utc)
        us = int(ts.timestamp() * 1_000_000)
        self._f.write(_HDR.pack(lsn, us, len(payload)) + payload)

    def flush(self) -> None:
        """Make appended frames visible to a concurrent log tailer."""
        self._f.flush()

    def close(self) -> None:
        self._f.flush()
        self._f.close()

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()


def scan_frames(path: str, start_pos: int = 0, end_pos: Optional[int] = None) -> Iterator[Frame]:
    """Iterate frames in [start_pos, end_pos). Tolerates a torn tail write
    (stops at the last complete frame, like WAL readers do)."""
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
            payload = f.read(n)
            if len(payload) < n:
                break
            new_pos = pos + _HDR.size + n
            yield Frame(lsn, us, payload, pos, new_pos)
            pos = new_pos


def tx_boundaries(path: str, start_pos: int = 0) -> List[Tuple[int, int]]:
    """Byte ranges of whole transactions (plus standalone R/O/Y prologue
    folded into the following transaction's range).

    A range ends just past a Commit frame.  Used by the driver to cut
    micro-batch offsets — and intra-batch partition splits — that never
    bisect a transaction, so each partition reader sees complete
    Begin..Commit spans (tx context never crosses partitions).
    """
    ranges: List[Tuple[int, int]] = []
    range_start: Optional[int] = None
    for fr in scan_frames(path, start_pos):
        if range_start is None:
            range_start = fr.start_pos
        if fr.payload[:1] == b"C":
            ranges.append((range_start, fr.end_pos))
            range_start = None
    return ranges
