"""pgoutput logical-replication binary codec (decode **and** encode).

Capability twin of the reference decoder module
(``/root/reference/src/pypgcdc/decoders.py:86-455``), written fresh from
the public PostgreSQL "Logical Replication Message Formats" documentation
(protocol version 1).  Differences from the reference are deliberate
(SURVEY §7.4):

* ``Begin.tx_xid`` is read as int32 per spec (reference reads int64, Q1).
* ``Origin``/``Type`` messages decode cleanly and are ignorable (the
  reference crashes on both, Q2).
* TupleData's ``'u'`` (unchanged TOAST) is a distinct marker, not None (Q6).
* An **encoder** exists so tests can synthesize protocol-true byte streams
  (the reference has no encoder; its golden bytes were hand-captured).

This module is pure Python with zero Spark imports: it runs inside the
Python DataSource partition reader on executors (SURVEY §4.2).
"""

from __future__ import annotations

import struct
from dataclasses import dataclass, field
from datetime import datetime, timedelta, timezone
from typing import List, Optional, Tuple

# Postgres timestamps are microseconds since 2000-01-01 00:00:00 UTC.
_PG_EPOCH = datetime(2000, 1, 1, tzinfo=timezone.utc)

# TupleData column categories (protocol byte values).
COL_NULL = "n"
COL_UNCHANGED_TOAST = "u"
COL_TEXT = "t"


def pg_ts_to_datetime(micros: int) -> datetime:
    return _PG_EPOCH + timedelta(microseconds=micros)


def datetime_to_pg_ts(dt: datetime) -> int:
    if dt.tzinfo is None:
        dt = dt.replace(tzinfo=timezone.utc)
    return int((dt - _PG_EPOCH) / timedelta(microseconds=1))


class _Reader:
    """Cursor over a message buffer with the protocol's primitive reads."""

    __slots__ = ("buf", "pos")

    def __init__(self, buf: bytes):
        self.buf = buf
        self.pos = 0

    def _unpack(self, fmt: str, size: int):
        val = struct.unpack_from(fmt, self.buf, self.pos)[0]
        self.pos += size
        return val

    def int8(self) -> int:
        return self._unpack(">b", 1)

    def int16(self) -> int:
        return self._unpack(">h", 2)

    def int32(self) -> int:
        return self._unpack(">i", 4)

    def int64(self) -> int:
        return self._unpack(">q", 8)

    def byte(self) -> str:
        b = self.buf[self.pos : self.pos + 1].decode("ascii")
        self.pos += 1
        return b

    def cstring(self) -> str:
        end = self.buf.index(b"\x00", self.pos)
        s = self.buf[self.pos : end].decode("utf-8")
        self.pos = end + 1
        return s

    def utf8(self, n: int) -> str:
        s = self.buf[self.pos : self.pos + n].decode("utf-8")
        self.pos += n
        return s


# ---------------------------------------------------------------------------
# Decoded message dataclasses
# ---------------------------------------------------------------------------


@dataclass(frozen=True)
class ColumnData:
    category: str  # 'n' | 'u' | 't'
    value: Optional[str] = None  # text payload when category == 't'


@dataclass(frozen=True)
class TupleData:
    columns: Tuple[ColumnData, ...]

    @property
    def n_columns(self) -> int:
        return len(self.columns)


@dataclass(frozen=True)
class Begin:
    final_lsn: int
    commit_ts: datetime
    tx_xid: int


@dataclass(frozen=True)
class Commit:
    flags: int
    commit_lsn: int
    end_lsn: int
    commit_ts: datetime


@dataclass(frozen=True)
class Origin:
    origin_commit_lsn: int
    origin_name: str


@dataclass(frozen=True)
class RelationColumn:
    part_of_pkey: bool
    name: str
    type_id: int
    atttypmod: int


@dataclass(frozen=True)
class Relation:
    relation_id: int
    namespace: str
    relation_name: str
    replica_identity: str  # 'd' default | 'n' nothing | 'f' full | 'i' index
    columns: Tuple[RelationColumn, ...]


@dataclass(frozen=True)
class PgType:
    type_id: int
    namespace: str
    name: str


@dataclass(frozen=True)
class Insert:
    relation_id: int
    new_tuple: TupleData


@dataclass(frozen=True)
class Update:
    relation_id: int
    old_tuple_category: Optional[str]  # 'K' key | 'O' old row | None
    old_tuple: Optional[TupleData]
    new_tuple: TupleData


@dataclass(frozen=True)
class Delete:
    relation_id: int
    old_tuple_category: str  # 'K' | 'O'
    old_tuple: TupleData


@dataclass(frozen=True)
class Truncate:
    option_bits: int  # 1 = CASCADE, 2 = RESTART IDENTITY
    relation_ids: Tuple[int, ...]


PgoutputMessage = object  # union of the dataclasses above


# ---------------------------------------------------------------------------
# Decode
# ---------------------------------------------------------------------------


def _read_tuple_data(r: _Reader) -> TupleData:
    n = r.int16()
    cols: List[ColumnData] = []
    for _ in range(n):
        cat = r.byte()
        if cat == COL_TEXT:
            length = r.int32()
            cols.append(ColumnData(COL_TEXT, r.utf8(length)))
        elif cat in (COL_NULL, COL_UNCHANGED_TOAST):
            cols.append(ColumnData(cat))
        else:
            raise ValueError(f"unknown TupleData column category {cat!r}")
    return TupleData(tuple(cols))


def _expect(r: _Reader, expected: str) -> None:
    got = r.byte()
    if got != expected:
        raise ValueError(f"expected message type {expected!r}, got {got!r}")


def decode_begin(buf: bytes) -> Begin:
    r = _Reader(buf)
    _expect(r, "B")
    final_lsn = r.int64()
    ts = pg_ts_to_datetime(r.int64())
    xid = r.int32()  # int32 per spec (reference bug Q1 reads int64)
    return Begin(final_lsn, ts, xid)


def decode_commit(buf: bytes) -> Commit:
    r = _Reader(buf)
    _expect(r, "C")
    flags = r.int8()
    commit_lsn = r.int64()
    end_lsn = r.int64()
    ts = pg_ts_to_datetime(r.int64())
    return Commit(flags, commit_lsn, end_lsn, ts)


def decode_origin(buf: bytes) -> Origin:
    r = _Reader(buf)
    _expect(r, "O")
    return Origin(r.int64(), r.cstring())


def decode_relation(buf: bytes) -> Relation:
    r = _Reader(buf)
    _expect(r, "R")
    relation_id = r.int32()
    namespace = r.cstring()
    name = r.cstring()
    replica_identity = r.byte()
    n_cols = r.int16()
    cols = []
    for _ in range(n_cols):
        flags = r.int8()
        cols.append(
            RelationColumn(
                part_of_pkey=bool(flags & 1),
                name=r.cstring(),
                type_id=r.int32(),
                atttypmod=r.int32(),
            )
        )
    return Relation(relation_id, namespace, name, replica_identity, tuple(cols))


def decode_type(buf: bytes) -> PgType:
    r = _Reader(buf)
    _expect(r, "Y")
    return PgType(r.int32(), r.cstring(), r.cstring())


def decode_insert(buf: bytes) -> Insert:
    r = _Reader(buf)
    _expect(r, "I")
    relation_id = r.int32()
    marker = r.byte()
    if marker != "N":
        raise ValueError(f"Insert: expected 'N' new-tuple marker, got {marker!r}")
    return Insert(relation_id, _read_tuple_data(r))


def decode_update(buf: bytes) -> Update:
    r = _Reader(buf)
    _expect(r, "U")
    relation_id = r.int32()
    marker = r.byte()
    old_cat: Optional[str] = None
    old_tuple: Optional[TupleData] = None
    if marker in ("K", "O"):
        old_cat = marker
        old_tuple = _read_tuple_data(r)
        marker = r.byte()
    if marker != "N":
        raise ValueError(f"Update: expected 'N' new-tuple marker, got {marker!r}")
    return Update(relation_id, old_cat, old_tuple, _read_tuple_data(r))


def decode_delete(buf: bytes) -> Delete:
    r = _Reader(buf)
    _expect(r, "D")
    relation_id = r.int32()
    marker = r.byte()
    if marker not in ("K", "O"):
        raise ValueError(f"Delete: expected 'K' or 'O' marker, got {marker!r}")
    return Delete(relation_id, marker, _read_tuple_data(r))


def decode_truncate(buf: bytes) -> Truncate:
    r = _Reader(buf)
    _expect(r, "T")
    n = r.int32()
    options = r.int8()
    rel_ids = tuple(r.int32() for _ in range(n))
    return Truncate(options, rel_ids)


_DECODERS = {
    "B": decode_begin,
    "C": decode_commit,
    "O": decode_origin,
    "R": decode_relation,
    "Y": decode_type,
    "I": decode_insert,
    "U": decode_update,
    "D": decode_delete,
    "T": decode_truncate,
}


def decode_message(buf: bytes):
    """Decode any pgoutput message by its leading type byte.

    Unknown types raise ValueError with the offending byte — never an
    AttributeError mid-pipeline (reference defect Q2).
    """
    if not buf:
        raise ValueError("empty pgoutput message")
    kind = chr(buf[0])
    dec = _DECODERS.get(kind)
    if dec is None:
        raise ValueError(f"unknown pgoutput message type {kind!r}")
    return dec(buf)


# ---------------------------------------------------------------------------
# Encode (test-stream synthesis; no equivalent exists in the reference)
# ---------------------------------------------------------------------------


def _enc_tuple(values: List[Optional[str]], toast_unchanged: Optional[set] = None) -> bytes:
    """Encode a TupleData. ``None`` -> 'n'; index in ``toast_unchanged`` -> 'u'."""
    toast_unchanged = toast_unchanged or set()
    out = [struct.pack(">h", len(values))]
    for i, v in enumerate(values):
        if i in toast_unchanged:
            out.append(b"u")
        elif v is None:
            out.append(b"n")
        else:
            enc = v.encode("utf-8")
            out.append(b"t" + struct.pack(">i", len(enc)) + enc)
    return b"".join(out)


def encode_begin(final_lsn: int, commit_ts: datetime, tx_xid: int) -> bytes:
    return b"B" + struct.pack(">qqi", final_lsn, datetime_to_pg_ts(commit_ts), tx_xid)


def encode_commit(commit_lsn: int, end_lsn: int, commit_ts: datetime, flags: int = 0) -> bytes:
    return b"C" + struct.pack(">bqqq", flags, commit_lsn, end_lsn, datetime_to_pg_ts(commit_ts))


def encode_origin(origin_commit_lsn: int, name: str) -> bytes:
    return b"O" + struct.pack(">q", origin_commit_lsn) + name.encode() + b"\x00"


def encode_relation(
    relation_id: int,
    namespace: str,
    name: str,
    columns: List[Tuple[bool, str, int, int]],  # (pkey, name, type_oid, atttypmod)
    replica_identity: str = "d",
) -> bytes:
    out = [
        b"R",
        struct.pack(">i", relation_id),
        namespace.encode() + b"\x00",
        name.encode() + b"\x00",
        replica_identity.encode("ascii"),
        struct.pack(">h", len(columns)),
    ]
    for pkey, cname, oid, atttypmod in columns:
        out.append(struct.pack(">b", 1 if pkey else 0))
        out.append(cname.encode() + b"\x00")
        out.append(struct.pack(">ii", oid, atttypmod))
    return b"".join(out)


def encode_type(type_id: int, namespace: str, name: str) -> bytes:
    return b"Y" + struct.pack(">i", type_id) + namespace.encode() + b"\x00" + name.encode() + b"\x00"


def encode_insert(relation_id: int, values: List[Optional[str]]) -> bytes:
    return b"I" + struct.pack(">i", relation_id) + b"N" + _enc_tuple(values)


def encode_update(
    relation_id: int,
    new_values: List[Optional[str]],
    old_values: Optional[List[Optional[str]]] = None,
    old_category: str = "O",
    toast_unchanged: Optional[set] = None,
) -> bytes:
    out = [b"U", struct.pack(">i", relation_id)]
    if old_values is not None:
        out.append(old_category.encode("ascii"))
        out.append(_enc_tuple(old_values))
    out.append(b"N")
    out.append(_enc_tuple(new_values, toast_unchanged))
    return b"".join(out)


def encode_delete(
    relation_id: int, old_values: List[Optional[str]], old_category: str = "K"
) -> bytes:
    return b"D" + struct.pack(">i", relation_id) + old_category.encode("ascii") + _enc_tuple(old_values)


def encode_truncate(relation_ids: List[int], option_bits: int = 0) -> bytes:
    return (
        b"T"
        + struct.pack(">ib", len(relation_ids), option_bits)
        + b"".join(struct.pack(">i", rid) for rid in relation_ids)
    )
