"""Golden-byte decoder tests + encode/decode round-trips.

The byte strings are protocol ground truth captured from a real Postgres
pgoutput stream (documented in the reference's test suite,
``/root/reference/tests/test_decoders.py`` — reused as *fixtures only*;
the codec itself is written from the public protocol spec).
"""

from datetime import datetime, timezone

import pytest

from pypgcdc_spark.cdc import pgoutput as pg

GOLDEN_RELATION = (
    b"R\x00\x00@\x01public\x00test_table\x00d\x00\x02\x01id\x00\x00\x00\x00\x17"
    b"\xff\xff\xff\xff\x00created\x00\x00\x00\x04\xa0\xff\xff\xff\xff"
)
GOLDEN_BEGIN = b"B\x00\x00\x00\x00\x01f4\x98\x00\x02ck\xd8i\x8a1\x00\x00\x01\xeb"
GOLDEN_INSERT = b"I\x00\x00@\x01N\x00\x02t\x00\x00\x00\x015t\x00\x00\x00\x162012-01-01 12:00:00+00"
GOLDEN_UPDATE = b"U\x00\x00@\x01N\x00\x02t\x00\x00\x00\x015t\x00\x00\x00\x162013-01-01 12:00:00+00"
GOLDEN_DELETE = b"D\x00\x00@\x01K\x00\x02t\x00\x00\x00\x014n"
GOLDEN_COMMIT = (
    b"C\x00\x00\x00\x00\x00\x01f4\x98\x00\x00\x00\x00\x01f4\xc8\x00\x02cl\x83\x8f\xd2\xa1"
)
GOLDEN_TRUNCATE = b"T\x00\x00\x00\x01\x00\x00\x00@\x01"


def test_relation_golden():
    r = pg.decode_relation(GOLDEN_RELATION)
    assert r.relation_id == 16385
    assert r.namespace == "public"
    assert r.relation_name == "test_table"
    assert r.replica_identity == "d"
    assert len(r.columns) == 2
    assert r.columns[0] == pg.RelationColumn(True, "id", 23, -1)
    assert r.columns[1] == pg.RelationColumn(False, "created", 1184, -1)


def test_begin_golden():
    b = pg.decode_begin(GOLDEN_BEGIN)
    assert b.final_lsn == 23475352
    assert b.tx_xid == 491  # int32 per spec (reference bug Q1 reads int64)
    assert b.commit_ts == datetime(2021, 4, 20, 20, 13, 16, 867121, tzinfo=timezone.utc)


def test_insert_golden():
    i = pg.decode_insert(GOLDEN_INSERT)
    assert i.relation_id == 16385
    assert [c.value for c in i.new_tuple.columns] == ["5", "2012-01-01 12:00:00+00"]
    assert all(c.category == "t" for c in i.new_tuple.columns)


def test_update_golden():
    u = pg.decode_update(GOLDEN_UPDATE)
    assert u.relation_id == 16385
    assert u.old_tuple is None and u.old_tuple_category is None
    assert [c.value for c in u.new_tuple.columns] == ["5", "2013-01-01 12:00:00+00"]


def test_delete_golden():
    d = pg.decode_delete(GOLDEN_DELETE)
    assert d.relation_id == 16385
    assert d.old_tuple_category == "K"
    assert [c.category for c in d.old_tuple.columns] == ["t", "n"]
    assert d.old_tuple.columns[0].value == "4"


def test_commit_golden():
    c = pg.decode_commit(GOLDEN_COMMIT)
    assert c.commit_lsn == 23475352
    assert c.end_lsn == 23475400
    assert c.commit_ts == datetime(2021, 4, 20, 21, 1, 8, 279969, tzinfo=timezone.utc)


def test_truncate_golden():
    t = pg.decode_truncate(GOLDEN_TRUNCATE)
    assert t.relation_ids == (16385,)
    assert t.option_bits == 0


@pytest.mark.parametrize(
    "decoder,buf",
    [
        (pg.decode_relation, GOLDEN_BEGIN),
        (pg.decode_begin, GOLDEN_RELATION),
        (pg.decode_insert, GOLDEN_DELETE),
        (pg.decode_update, GOLDEN_INSERT.replace(b"I", b"X", 1)),
        (pg.decode_delete, GOLDEN_INSERT),
        (pg.decode_commit, GOLDEN_BEGIN),
        (pg.decode_truncate, GOLDEN_COMMIT),
    ],
)
def test_wrong_leading_byte_raises(decoder, buf):
    with pytest.raises(ValueError):
        decoder(buf)


def test_decode_message_dispatch_and_unknown():
    assert isinstance(pg.decode_message(GOLDEN_BEGIN), pg.Begin)
    assert isinstance(pg.decode_message(GOLDEN_TRUNCATE), pg.Truncate)
    with pytest.raises(ValueError):
        pg.decode_message(b"Zjunk")
    with pytest.raises(ValueError):
        pg.decode_message(b"")


def test_origin_and_type_decode():
    # The reference crashes on these (Q2); we decode them cleanly.
    o = pg.decode_origin(pg.encode_origin(12345, "node_a"))
    assert o.origin_commit_lsn == 12345 and o.origin_name == "node_a"
    y = pg.decode_type(pg.encode_type(99999, "public", "mood"))
    assert y == pg.PgType(99999, "public", "mood")


def test_encode_decode_roundtrip_all_types():
    ts = datetime(2024, 6, 1, 12, 30, 45, 123456, tzinfo=timezone.utc)

    b = pg.decode_begin(pg.encode_begin(1000, ts, 42))
    assert (b.final_lsn, b.tx_xid, b.commit_ts) == (1000, 42, ts)

    c = pg.decode_commit(pg.encode_commit(1000, 1100, ts))
    assert (c.commit_lsn, c.end_lsn, c.commit_ts) == (1000, 1100, ts)

    rel = pg.decode_relation(
        pg.encode_relation(77, "public", "t", [(True, "id", 23, -1), (False, "v", 25, -1)])
    )
    assert rel.relation_id == 77 and rel.columns[1].name == "v"

    i = pg.decode_insert(pg.encode_insert(77, ["1", None, "x"]))
    assert [c.category for c in i.new_tuple.columns] == ["t", "n", "t"]

    u = pg.decode_update(pg.encode_update(77, ["2", "y", None], old_values=["1", "x", None]))
    assert u.old_tuple_category == "O"
    assert [c.value for c in u.old_tuple.columns] == ["1", "x", None]

    # TOAST-unchanged marker survives the round trip distinct from NULL (Q6).
    u2 = pg.decode_update(pg.encode_update(77, ["2", "ignored", None], toast_unchanged={1}))
    assert [c.category for c in u2.new_tuple.columns] == ["t", "u", "n"]

    d = pg.decode_delete(pg.encode_delete(77, ["9", None], old_category="K"))
    assert d.old_tuple_category == "K"

    t = pg.decode_truncate(pg.encode_truncate([77, 78], option_bits=3))
    assert t.relation_ids == (77, 78) and t.option_bits == 3


def test_begin_commit_roundtrip_matches_golden_bytes():
    # Encoder emits byte-identical frames for the golden decodes.
    b = pg.decode_begin(GOLDEN_BEGIN)
    assert pg.encode_begin(b.final_lsn, b.commit_ts, b.tx_xid) == GOLDEN_BEGIN
    c = pg.decode_commit(GOLDEN_COMMIT)
    assert pg.encode_commit(c.commit_lsn, c.end_lsn, c.commit_ts) == GOLDEN_COMMIT
    i = pg.decode_insert(GOLDEN_INSERT)
    assert pg.encode_insert(16385, [c.value for c in i.new_tuple.columns]) == GOLDEN_INSERT


def test_truncated_tuple_column_raises():
    """A 't' column whose declared length exceeds the remaining buffer
    must fail loudly (fail-fast contract shared by every decoder) — a
    silently shortened value would corrupt the replicated row."""
    buf = pg.encode_insert(7, ["hello world"])
    for cut in (1, 3, 10):
        with pytest.raises(ValueError, match="truncated TupleData"):
            pg.decode_insert(buf[:-cut])


def test_truncated_logical_message_raises():
    """Same contract for 'M' frames (ADVICE r5): declared content length
    past the buffer end raises instead of silently shortening."""
    m = pg.encode_logical_message("pfx", b"payload-bytes", msg_lsn=500)
    with pytest.raises(ValueError, match="truncated logical message"):
        pg.decode_logical_message(m[:-5])


def test_binary_tuple_column_decodes():
    """'b' TupleData columns (binary 'true') carry raw send-format bytes
    with the same bounds-checked framing as text columns."""
    import struct

    td = (
        struct.pack(">h", 3)
        + b"b" + struct.pack(">i", 8) + struct.pack(">q", 42)
        + b"t" + struct.pack(">i", 2) + b"hi"
        + b"n"
    )
    buf = b"I" + struct.pack(">i", 7) + b"N" + td
    m = pg.decode_insert(buf)
    cols = m.new_tuple.columns
    assert cols[0].category == "b" and cols[0].binary == struct.pack(">q", 42)
    assert cols[1].category == "t" and cols[1].value == "hi"
    assert cols[2].category == "n"
    with pytest.raises(ValueError, match="truncated TupleData"):
        pg.decode_insert(buf[:-4])


def test_pgbin_to_text_golden():
    """Binary send formats -> the exact text-mode renderings."""
    import struct
    import uuid as _uuid

    from pypgcdc_spark.cdc import pgbin

    assert pgbin.to_text(pgbin.BOOL, b"\x01") == "t"
    assert pgbin.to_text(pgbin.BOOL, b"\x00") == "f"
    assert pgbin.to_text(pgbin.INT2, struct.pack(">h", -7)) == "-7"
    assert pgbin.to_text(pgbin.INT4, struct.pack(">i", 123456)) == "123456"
    assert pgbin.to_text(pgbin.INT8, struct.pack(">q", -9_007_199_254_740_993)) == "-9007199254740993"
    assert pgbin.to_text(pgbin.FLOAT8, struct.pack(">d", 1.5)) == "1.5"
    assert pgbin.to_text(pgbin.FLOAT8, struct.pack(">d", 3.0)) == "3"
    assert pgbin.to_text(pgbin.FLOAT4, struct.pack(">f", float("nan"))) == "NaN"
    # numeric 150.00 = digits [150] weight 0 dscale 2 -> "150.00"
    num = struct.pack(">hhHH", 1, 0, 0, 2) + struct.pack(">h", 150)
    assert pgbin.to_text(pgbin.NUMERIC, num) == "150.00"
    # numeric -12345.6789: base-10000 digits [1, 2345, 6789] weight 1
    num2 = struct.pack(">hhHH", 3, 1, 0x4000, 4) + struct.pack(">3h", 1, 2345, 6789)
    assert pgbin.to_text(pgbin.NUMERIC, num2) == "-12345.6789"
    # numeric 0.05: digits [500] weight -1 dscale 2
    num3 = struct.pack(">hhHH", 1, -1, 0, 2) + struct.pack(">h", 500)
    assert pgbin.to_text(pgbin.NUMERIC, num3) == "0.05"
    assert pgbin.to_text(pgbin.DATE, struct.pack(">i", 0)) == "2000-01-01"
    assert pgbin.to_text(pgbin.DATE, struct.pack(">i", 8766)) == "2024-01-01"
    us = 8766 * 86_400_000_000 + 3_600_000_000 + 1_500_000  # 01:00:01.5
    assert pgbin.to_text(pgbin.TIMESTAMPTZ, struct.pack(">q", us)) == "2024-01-01 01:00:01.5+00"
    assert pgbin.to_text(pgbin.TIMESTAMP, struct.pack(">q", 0)) == "2000-01-01 00:00:00"
    u = _uuid.UUID("12345678-1234-5678-1234-567812345678")
    assert pgbin.to_text(pgbin.UUID, u.bytes) == str(u)
    assert pgbin.to_text(pgbin.JSONB, b"\x01" + b'{"a": 1}') == '{"a": 1}'
    assert pgbin.to_text(pgbin.BYTEA, b"\xde\xad") == "\\xdead"
    assert pgbin.to_text(pgbin.TEXT, "héllo".encode()) == "héllo"
    with pytest.raises(ValueError, match="no binary decoder"):
        pgbin.to_text(600, b"")  # polygon — run without binary instead


def test_binary_tuple_through_transform():
    """A binary-format Insert renders the same envelope a text-format one
    does (wire format is invisible downstream)."""
    import struct

    from pypgcdc_spark.cdc import pgbin
    from pypgcdc_spark.cdc.registry import SchemaRegistry
    from pypgcdc_spark.cdc.transform import MessageTransformer

    reg = SchemaRegistry()
    reg.register_relation(
        pg.decode_relation(
            pg.encode_relation(
                88001, "public", "accts",
                [(True, "id", pgbin.INT8, -1), (False, "balance", pgbin.NUMERIC, -1),
                 (False, "name", pgbin.TEXT, -1)],
            )
        ),
        lsn=1,
    )
    td = (
        struct.pack(">h", 3)
        + b"b" + struct.pack(">i", 8) + struct.pack(">q", 5)
        + b"b" + struct.pack(">i", 10)
        + struct.pack(">hhHH", 1, 0, 0, 2) + struct.pack(">h", 150)
        + b"t" + struct.pack(">i", 5) + b"alice"
    )
    x = MessageTransformer(registry=reg)
    from datetime import datetime, timezone
    ts = datetime(2024, 1, 1, tzinfo=timezone.utc)
    list(x.feed(10, pg.encode_begin(30, ts, 9)))
    (ev,) = x.feed(20, b"I" + struct.pack(">i", 88001) + b"N" + td)
    assert ev.after == {"id": "5", "balance": "150.00", "name": "alice"}
    assert ev.key == {"id": "5"}


def test_pgbin_time_golden():
    import struct

    from pypgcdc_spark.cdc import pgbin

    us = (13 * 3600 + 5 * 60 + 7) * 1_000_000 + 250_000
    assert pgbin.to_text(pgbin.TIME, struct.pack(">q", us)) == "13:05:07.25"
    assert pgbin.to_text(pgbin.TIME, struct.pack(">q", 0)) == "00:00:00"


def test_pgbin_interval_golden():
    import struct

    from pypgcdc_spark.cdc import pgbin

    def iv(us, d, m):
        return pgbin.to_text(pgbin.INTERVAL, struct.pack(">qii", us, d, m))

    assert iv(4 * 3600_000_000 + 5 * 60_000_000 + 6_789_000, 3, 14) == \
        "1 year 2 mons 3 days 04:05:06.789"
    assert iv(0, 0, 0) == "00:00:00"
    assert iv(-3_600_000_000, 0, 0) == "-01:00:00"
    assert iv(0, -1, -2) == "-2 mons -1 days"  # PG pluralizes signed -1
    assert iv(0, 1, 1) == "1 mon 1 day"


def test_pgbin_array_golden():
    """array_send binary -> text-array literal: quoting triggers, NULLs,
    multidim nesting, empty arrays, non-default lower bounds."""
    import struct

    from pypgcdc_spark.cdc import pgbin

    def arr(elem_oid, dims, lbounds, elems):
        out = struct.pack(">iii", len(dims), 1, elem_oid)
        for d, lb in zip(dims, lbounds):
            out += struct.pack(">ii", d, lb)
        for e in elems:
            if e is None:
                out += struct.pack(">i", -1)
            else:
                out += struct.pack(">i", len(e)) + e
        return out

    i8 = lambda v: struct.pack(">q", v)  # noqa: E731
    assert pgbin.to_text(1016, arr(20, [3], [1], [i8(1), i8(-2), None])) == "{1,-2,NULL}"
    assert pgbin.to_text(
        1009, arr(25, [4], [1], [b"plain", b"has space", b'qu"ote', b""])
    ) == '{plain,"has space","qu\\"ote",""}'
    assert pgbin.to_text(
        1009, arr(25, [2, 2], [1, 1], [b"a", b"b", b"c", b"d"])
    ) == "{{a,b},{c,d}}"
    assert pgbin.to_text(1007, struct.pack(">iii", 0, 0, 23)) == "{}"
    assert pgbin.to_text(1016, arr(20, [2], [0], [i8(7), i8(8)])) == "[0:1]={7,8}"
