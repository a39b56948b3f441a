"""Binary-format pgoutput column values → canonical text.

With ``binary 'true'`` requested on START_REPLICATION (PG14+), the
walsender sends TupleData columns in each type's binary *send* format
('b' category) instead of text.  This module renders those bytes to the
SAME canonical string the text mode would have delivered, so the whole
downstream pipeline (envelope maps, Catalyst typed casts, oracles) is
byte-identical regardless of the negotiated format — binary is purely a
wire-efficiency choice.

Formats per PostgreSQL's per-type ``*send`` functions (public docs and
the protocol's binary-format notes):

* bool — 1 byte;  int2/int4/int8 — big-endian two's complement;
* float4/float8 — IEEE-754 big-endian (text twin: shortest round-trip,
  which PG emits under its default ``extra_float_digits=1``);
* numeric — int16 ndigits | int16 weight | uint16 sign | uint16 dscale |
  ndigits × int16 base-10000 digits (sign 0xC000 = NaN);
* date — int32 days since 2000-01-01;
* timestamp/timestamptz — int64 µs since 2000-01-01 (rendered UTC with
  a ``+00`` suffix for timestamptz, matching a UTC-timezone server);
* uuid — 16 raw bytes;  bytea — rendered ``\\x`` hex like text mode;
* text/varchar/bpchar/name/char/json/xml — UTF-8 passthrough;
* jsonb — version byte (1) then UTF-8 JSON text.

Unknown OIDs fail loudly (the module's fail-fast contract): silently
hex-mangling a value would corrupt the replicated row.  A deployment
hitting an exotic type simply leaves ``binary`` off — text format is
always available.

Reference parity: none — the reference (reader.py:136-141) pins text
format and proto 1.
"""

from __future__ import annotations

import struct
from datetime import date, timedelta

_PG_EPOCH_DATE = date(2000, 1, 1)

# Type OIDs (pg_type.h, stable since antiquity).
BOOL, BYTEA, NAME, INT8, INT2, INT4 = 16, 17, 19, 20, 21, 23
TEXT, OID, JSON, XML = 25, 26, 114, 142
FLOAT4, FLOAT8 = 700, 701
BPCHAR, VARCHAR, DATE, TIME, TIMESTAMP, TIMESTAMPTZ = 1042, 1043, 1082, 1083, 1114, 1184
INTERVAL, NUMERIC, UUID, JSONB = 1186, 1700, 2950, 3802

# Array OIDs → element OIDs (the common set; pg_type's typarray pairs).
ARRAY_ELEM = {
    1000: 16,  # bool[]
    1001: 17,  # bytea[]
    1005: 21,  # int2[]
    1007: 23,  # int4[]
    1016: 20,  # int8[]
    1009: 25,  # text[]
    1015: 1043,  # varchar[]
    1021: 700,  # float4[]
    1022: 701,  # float8[]
    1182: 1082,  # date[]
    1115: 1114,  # timestamp[]
    1185: 1184,  # timestamptz[]
    1187: 1186,  # interval[]
    1231: 1700,  # numeric[]
    2951: 2950,  # uuid[]
    199: 114,  # json[]
    3807: 3802,  # jsonb[]
}

_PASSTHROUGH = {TEXT, NAME, BPCHAR, VARCHAR, JSON, XML, 18}  # 18 = "char"


def _float_text(v: float) -> str:
    # PG text mode (extra_float_digits >= 1) emits the shortest string
    # that round-trips; Python's repr is exactly that.  Specials match
    # PG's spellings.
    if v != v:
        return "NaN"
    if v == float("inf"):
        return "Infinity"
    if v == float("-inf"):
        return "-Infinity"
    if v == int(v) and abs(v) < 1e16:
        return str(int(v))
    return repr(v)


def _numeric_text(b: bytes) -> str:
    ndigits, weight, sign, dscale = struct.unpack_from(">hhHH", b, 0)
    if sign == 0xC000:
        return "NaN"
    digits = struct.unpack_from(f">{ndigits}h", b, 8) if ndigits else ()
    # Integral part: base-10000 digits at weights weight..0.
    int_digits = []
    for w in range(weight, -1, -1):
        idx = weight - w
        d = digits[idx] if 0 <= idx < ndigits else 0
        int_digits.append(f"{d:04d}" if int_digits else str(d))
    int_part = "".join(int_digits) if weight >= 0 else "0"
    out = ("-" if sign == 0x4000 else "") + int_part
    if dscale:
        frac = []
        for i in range(dscale):
            pos = i // 4
            idx = weight + 1 + pos
            d = digits[idx] if 0 <= idx < ndigits else 0
            frac.append(f"{d:04d}"[i % 4])
        out += "." + "".join(frac)
    return out


def _ts_text(micros: int, tz_suffix: str = "") -> str:
    # µs since 2000-01-01 00:00:00 (UTC for timestamptz).
    days, rem = divmod(micros, 86_400_000_000)
    d = _PG_EPOCH_DATE + timedelta(days=days)
    secs, us = divmod(rem, 1_000_000)
    h, rem_s = divmod(secs, 3600)
    m, s = divmod(rem_s, 60)
    base = f"{d.isoformat()} {h:02d}:{m:02d}:{s:02d}"
    if us:
        base += f".{us:06d}".rstrip("0")
    return base + tz_suffix


def _interval_text(micros: int, days: int, months: int) -> str:
    # Default IntervalStyle=postgres: "[N year[s]] [N mon[s]] [N day[s]]
    # [-]HH:MM:SS[.ffffff]", components omitted when zero, time shown
    # whenever nonzero — or alone when everything is zero.
    years, mons = divmod(abs(months), 12)
    if months < 0:
        years, mons = -years, -mons
    parts = []
    # PG pluralizes on the SIGNED value: "1 day" but "-1 days".
    if years:
        parts.append(f"{years} year" + ("s" if years != 1 else ""))
    if mons:
        parts.append(f"{mons} mon" + ("s" if mons != 1 else ""))
    if days:
        parts.append(f"{days} day" + ("s" if days != 1 else ""))
    if micros or not parts:
        sign = "-" if micros < 0 else ""
        us_abs = abs(micros)
        secs, us = divmod(us_abs, 1_000_000)
        h, rem = divmod(secs, 3600)
        m, s_ = divmod(rem, 60)
        t = f"{sign}{h:02d}:{m:02d}:{s_:02d}"
        if us:
            t += f".{us:06d}".rstrip("0")
        parts.append(t)
    return " ".join(parts)


_ARRAY_QUOTE_TRIGGERS = set('{},"\\ \t\n\r')


def _array_elem_text(elem_oid: int, raw: bytes) -> str:
    """One array element in text-array syntax: the element's own text
    rendering, quoted/escaped when it contains structural characters,
    whitespace, is empty, or spells NULL (array-literal quoting rules)."""
    v = to_text(elem_oid, raw)
    if (
        not v
        or v.upper() == "NULL"
        or any(c in _ARRAY_QUOTE_TRIGGERS for c in v)
    ):
        return '"' + v.replace("\\", "\\\\").replace('"', '\\"') + '"'
    return v


def _array_text(elem_oid: int, b: bytes) -> str:
    """array_send wire format → the text-array literal text mode emits:
    int32 ndim | int32 hasnull | int32 elem_oid | ndim × (int32 dim,
    int32 lbound) | per element int32 len (-1 = NULL) + bytes.
    Multidimensional arrays nest; non-default lower bounds render the
    ``[l:u]=`` prefix exactly like text mode."""
    ndim, _hasnull, wire_elem = struct.unpack_from(">iii", b, 0)
    if ndim == 0:
        return "{}"
    dims, lbounds = [], []
    pos = 12
    for _ in range(ndim):
        d, lb = struct.unpack_from(">ii", b, pos)
        dims.append(d)
        lbounds.append(lb)
        pos += 8

    def read_elem():
        nonlocal pos
        (ln,) = struct.unpack_from(">i", b, pos)
        pos += 4
        if ln == -1:
            return "NULL"
        raw = b[pos : pos + ln]
        pos += ln
        return _array_elem_text(wire_elem or elem_oid, raw)

    def level(d: int) -> str:
        if d == ndim - 1:
            return "{" + ",".join(read_elem() for _ in range(dims[d])) + "}"
        return "{" + ",".join(level(d + 1) for _ in range(dims[d])) + "}"

    out = level(0)
    if any(lb != 1 for lb in lbounds):
        spec = "".join(f"[{lb}:{lb + d - 1}]" for lb, d in zip(lbounds, dims))
        out = spec + "=" + out
    return out


def to_text(type_oid: int, b: bytes) -> str:
    """Binary send-format bytes → the canonical text rendering."""
    elem = ARRAY_ELEM.get(type_oid)
    if elem is not None:
        return _array_text(elem, b)
    if type_oid in _PASSTHROUGH:
        return b.decode("utf-8")
    if type_oid == BOOL:
        return "t" if b[0] else "f"
    if type_oid == INT2:
        return str(struct.unpack(">h", b)[0])
    if type_oid in (INT4, OID):
        return str(struct.unpack(">i", b)[0])
    if type_oid == INT8:
        return str(struct.unpack(">q", b)[0])
    if type_oid == FLOAT4:
        return _float_text(struct.unpack(">f", b)[0])
    if type_oid == FLOAT8:
        return _float_text(struct.unpack(">d", b)[0])
    if type_oid == NUMERIC:
        return _numeric_text(b)
    if type_oid == DATE:
        return (_PG_EPOCH_DATE + timedelta(days=struct.unpack(">i", b)[0])).isoformat()
    if type_oid == TIME:
        us_total = struct.unpack(">q", b)[0]
        secs, us = divmod(us_total, 1_000_000)
        h, rem = divmod(secs, 3600)
        m, s_ = divmod(rem, 60)
        out = f"{h:02d}:{m:02d}:{s_:02d}"
        return out + (f".{us:06d}".rstrip("0") if us else "")
    if type_oid == TIMESTAMP:
        return _ts_text(struct.unpack(">q", b)[0])
    if type_oid == TIMESTAMPTZ:
        # Rendered in UTC with the +00 suffix a UTC-timezone server's
        # text mode emits; binary carries UTC µs unconditionally.
        return _ts_text(struct.unpack(">q", b)[0], "+00")
    if type_oid == INTERVAL:
        return _interval_text(*struct.unpack(">qii", b))
    if type_oid == UUID:
        h = b.hex()
        return f"{h[0:8]}-{h[8:12]}-{h[12:16]}-{h[16:20]}-{h[20:32]}"
    if type_oid == JSONB:
        if not b or b[0] != 1:
            raise ValueError(f"unsupported jsonb binary version {b[:1]!r}")
        return b[1:].decode("utf-8")
    if type_oid == BYTEA:
        return "\\x" + b.hex()
    raise ValueError(
        f"no binary decoder for type OID {type_oid}; "
        "run the slot without binary 'true' for this table"
    )
