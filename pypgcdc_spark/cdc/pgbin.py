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
from fractions import Fraction

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


def _parse_sig(s: str) -> tuple:
    """'1.5e-07' / '123.456' / '100.0' → (digits, exp): the shortest
    significand digits (no leading/trailing zeros) and the decimal
    exponent of the first digit (printf %e convention)."""
    if "e" in s:
        m, e = s.split("e")
        exp = int(e)
    else:
        m, exp = s, 0
    ip, _, fp = m.partition(".")
    full = ip + fp
    stripped = full.lstrip("0")
    if not stripped:
        return "0", 0
    sig_start = len(full) - len(stripped)
    exp += len(ip) - 1 - sig_start
    return stripped.rstrip("0") or "0", exp


def _fmt_ryu(neg: bool, digits: str, exp: int, sci_at: int) -> str:
    """Render shortest digits like PG's Ryu to_chars (d2s.c/f2s.c):
    fixed notation for -4 <= exp < sci_at, else d[.ddd]e±XX with a
    two-digit-minimum signed exponent.  Fixed integers get no '.0'."""
    sign = "-" if neg else ""
    if -4 <= exp < sci_at:
        if exp >= len(digits) - 1:
            return sign + digits + "0" * (exp - len(digits) + 1)
        if exp >= 0:
            return sign + digits[: exp + 1] + "." + digits[exp + 1 :]
        return sign + "0." + "0" * (-exp - 1) + digits
    mant = digits if len(digits) == 1 else digits[0] + "." + digits[1:]
    return f"{sign}{mant}e{'+' if exp >= 0 else '-'}{abs(exp):02d}"


def _interval(a: float, single: bool):
    """Exact rounding interval of a positive finite float: the open
    interval between the midpoints to its neighbors.  PG's Ryu port
    emits the shortest decimal STRICTLY inside it (bounds excluded),
    so a decimal landing exactly on a midpoint needs one more digit
    even when round-half-even would recover the value."""
    if single:
        bits = struct.unpack(">I", struct.pack(">f", a))[0]
        prv = struct.unpack(">f", struct.pack(">I", bits - 1))[0]
        nxt = struct.unpack(">f", struct.pack(">I", bits + 1))[0]
    else:
        bits = struct.unpack(">Q", struct.pack(">d", a))[0]
        prv = struct.unpack(">d", struct.pack(">Q", bits - 1))[0]
        nxt = struct.unpack(">d", struct.pack(">Q", bits + 1))[0]
    fa = Fraction(a)
    lo = (Fraction(prv) + fa) / 2
    if nxt == float("inf"):
        hi = fa + (fa - Fraction(prv)) / 2
    else:
        hi = (fa + Fraction(nxt)) / 2
    return lo, hi


def _dec_fraction(cand: str) -> Fraction:
    m, _, e = cand.partition("e")
    return Fraction(m) * Fraction(10) ** int(e)


def _shortest_sci(a: float, single: bool, start_prec: int, max_prec: int) -> str:
    """Shortest correctly-rounded ``%.<p>e`` string of positive finite
    ``a`` whose exact decimal value lies strictly inside a's rounding
    interval — byte-identical digits to PG's Ryu output (verified
    against live PG 15 on randomized bit patterns, including
    boundary-tie cases like 0xce05cb84 → '-5.6117683e+08' where the
    7-digit form round-trips under half-even but PG emits 8)."""
    prec = start_prec
    cand = f"{a:.{prec}e}"
    lo, hi = _interval(a, single)
    while not (lo < _dec_fraction(cand) < hi) and prec < max_prec:
        prec += 1
        cand = f"{a:.{prec}e}"
    return cand


def _float8_text(v: float) -> str:
    # PG renders float8 via Ryu shortest digits (d2s.c), switching to
    # scientific notation when the decimal exponent is < -4 or >= 15
    # (verified against live PG 15: 1e15 → '1e+15',
    # 999999999999999 → fixed, 0.00001 → '1e-05').  Python's repr
    # gives the shortest half-even digits as the starting precision.
    if v != v:
        return "NaN"
    if v == float("inf"):
        return "Infinity"
    if v == float("-inf"):
        return "-Infinity"
    neg = struct.pack(">d", v)[0] & 0x80 != 0
    if v == 0.0:
        return "-0" if neg else "0"
    a = abs(v)
    digits, _ = _parse_sig(repr(a))
    s = _shortest_sci(a, single=False, start_prec=len(digits) - 1, max_prec=16)
    digits, exp = _parse_sig(s)
    return _fmt_ryu(neg, digits, exp, 15)


def _float4_text(b: bytes) -> str:
    # FLOAT4 must round-trip at SINGLE precision: the shortest decimal
    # that re-packs to the same 4 bytes (0.1::real → '0.1', not the
    # double-widened '0.10000000149011612').  Notation switch per
    # f2s.c: scientific when the decimal exponent is < -4 or >= 6
    # (verified live: 1000000::real → '1e+06', 999999::real → fixed,
    # 16777217::real → '1.6777216e+07').
    v = struct.unpack(">f", b)[0]
    if v != v:
        return "NaN"
    if v == float("inf"):
        return "Infinity"
    if v == float("-inf"):
        return "-Infinity"
    neg = b[0] & 0x80 != 0
    if v == 0.0:
        return "-0" if neg else "0"
    a = abs(v)
    start = 8
    for prec in range(9):
        try:
            # Rounding up near FLT_MAX can exceed the format's range.
            if struct.unpack(">f", struct.pack(">f", float(f"{a:.{prec}e}")))[0] == a:
                start = prec
                break
        except OverflowError:
            continue
    s = _shortest_sci(a, single=True, start_prec=start, max_prec=8)
    digits, exp = _parse_sig(s)
    return _fmt_ryu(neg, digits, exp, 6)


def _numeric_text(b: bytes) -> str:
    ndigits, weight, sign, dscale = struct.unpack_from(">hhHH", b, 0)
    if sign == 0xC000:
        return "NaN"
    if sign == 0xD000:  # PG14+ numeric +Infinity
        return "Infinity"
    if sign == 0xF000:  # PG14+ numeric -Infinity
        return "-Infinity"
    if sign not in (0x0000, 0x4000):
        raise ValueError(f"unrecognized numeric sign word 0x{sign:04X}")
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


# \v and \f included: PG's array_isspace treats them as whitespace, so
# an element containing them must be quoted or its re-parse would trim.
_ARRAY_QUOTE_TRIGGERS = set('{},"\\ \t\n\r\x0b\x0c')


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
        return _float4_text(b)
    if type_oid == FLOAT8:
        return _float8_text(struct.unpack(">d", b)[0])
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
