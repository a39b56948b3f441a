"""Property-based codec tests (hypothesis): encode∘decode = id for
arbitrary protocol-valid messages — coverage the reference's hand-picked
golden bytes can't give (SURVEY §5 notes it has no property tests)."""

from datetime import datetime, timezone

from hypothesis import given, settings
from hypothesis import strategies as st

from pypgcdc_spark.cdc import pgoutput as pg

# Text values: any unicode without the NUL the wire can't carry in cstrings.
values = st.one_of(
    st.none(),
    st.text(
        alphabet=st.characters(blacklist_categories=("Cs",), blacklist_characters="\x00"),
        max_size=64,
    ),
)
names = st.text(
    alphabet=st.characters(
        whitelist_categories=("Ll", "Lu", "Nd"), whitelist_characters="_"
    ),
    min_size=1,
    max_size=24,
)
lsns = st.integers(min_value=0, max_value=2**62)
oids = st.integers(min_value=1, max_value=2**31 - 1)
timestamps = st.datetimes(
    min_value=datetime(1990, 1, 1),
    max_value=datetime(2200, 1, 1),
).map(lambda d: d.replace(tzinfo=timezone.utc))


@settings(max_examples=200, deadline=None)
@given(lsn=lsns, ts=timestamps, xid=st.integers(min_value=0, max_value=2**31 - 1))
def test_begin_roundtrip(lsn, ts, xid):
    b = pg.decode_begin(pg.encode_begin(lsn, ts, xid))
    assert (b.final_lsn, b.commit_ts, b.tx_xid) == (lsn, ts, xid)


@settings(max_examples=200, deadline=None)
@given(c=lsns, e=lsns, ts=timestamps, flags=st.integers(min_value=0, max_value=1))
def test_commit_roundtrip(c, e, ts, flags):
    m = pg.decode_commit(pg.encode_commit(c, e, ts, flags))
    assert (m.commit_lsn, m.end_lsn, m.commit_ts, m.flags) == (c, e, ts, flags)


@settings(max_examples=100, deadline=None)
@given(
    relid=oids,
    ns=names,
    name=names,
    cols=st.lists(
        st.tuples(st.booleans(), names, oids, st.integers(-1, 2**20)),
        min_size=1,
        max_size=12,
    ),
)
def test_relation_roundtrip(relid, ns, name, cols):
    r = pg.decode_relation(pg.encode_relation(relid, ns, name, cols))
    assert r.relation_id == relid and r.namespace == ns and r.relation_name == name
    assert [(c.part_of_pkey, c.name, c.type_id, c.atttypmod) for c in r.columns] == cols


@settings(max_examples=200, deadline=None)
@given(relid=oids, vals=st.lists(values, min_size=1, max_size=16))
def test_insert_roundtrip(relid, vals):
    i = pg.decode_insert(pg.encode_insert(relid, vals))
    assert i.relation_id == relid
    got = [c.value if c.category == "t" else None for c in i.new_tuple.columns]
    assert got == vals


@settings(max_examples=100, deadline=None)
@given(
    relid=oids,
    new=st.lists(values, min_size=1, max_size=10),
    old=st.one_of(st.none(), st.lists(values, min_size=1, max_size=10)),
    cat=st.sampled_from(["K", "O"]),
)
def test_update_roundtrip(relid, new, old, cat):
    u = pg.decode_update(pg.encode_update(relid, new, old_values=old, old_category=cat))
    assert u.relation_id == relid
    assert [c.value for c in u.new_tuple.columns] == [v for v in new]
    if old is None:
        assert u.old_tuple is None
    else:
        assert u.old_tuple_category == cat
        assert [c.value for c in u.old_tuple.columns] == old


@settings(max_examples=100, deadline=None)
@given(
    relid=oids,
    old=st.lists(values, min_size=1, max_size=10),
    cat=st.sampled_from(["K", "O"]),
)
def test_delete_roundtrip(relid, old, cat):
    d = pg.decode_delete(pg.encode_delete(relid, old, old_category=cat))
    assert d.relation_id == relid and d.old_tuple_category == cat
    assert [c.value for c in d.old_tuple.columns] == old


@settings(max_examples=100, deadline=None)
@given(
    rids=st.lists(oids, min_size=1, max_size=20),
    bits=st.integers(min_value=0, max_value=3),
)
def test_truncate_roundtrip(rids, bits):
    t = pg.decode_truncate(pg.encode_truncate(rids, option_bits=bits))
    assert list(t.relation_ids) == rids and t.option_bits == bits


@settings(max_examples=100, deadline=None)
@given(
    relid=oids,
    vals=st.lists(st.text(max_size=32).filter(lambda s: "\x00" not in s), min_size=2, max_size=8),
    toast_idx=st.integers(min_value=0, max_value=7),
)
def test_toast_marker_roundtrip(relid, vals, toast_idx):
    toast = {toast_idx % len(vals)}
    u = pg.decode_update(pg.encode_update(relid, vals, toast_unchanged=toast))
    cats = [c.category for c in u.new_tuple.columns]
    for i, c in enumerate(cats):
        assert c == ("u" if i in toast else "t")
