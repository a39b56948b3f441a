"""Round 6: distributed COPY initial sync (VERDICT r5 #1).

The bootstrap path must not hold a table in driver memory: COPY bytes
spool to chunk files over the wire, and ``PgCdcEngine.bootstrap`` loads
them as a distributed text read with executor-side COPY parsing/typing —
hash-matching the legacy driver-list path, and merging the subsequent
change stream on top identically (exported-snapshot seed + stream =
final state, reference S2/S3).
"""

import pytest
from pyspark.sql import functions as F

from pypgcdc_spark.api import PgCdcEngine
from pypgcdc_spark.cdc import pgoutput as pg
from pypgcdc_spark.cdc.registry import SchemaRegistry
from pypgcdc_spark.testing import INTEGRATION_COLS, INTEGRATION_RELID, WorkloadWriter

from test_pgwire import DB, USER, FakeWalsender, WireReplicationTailer

N_ROWS = 20_000
COLS = ["id", "json_data", "amount", "updated_at", "text_data"]


def _table_rows():
    """Synthetic big table in COPY text VALUES (None = SQL NULL), with
    every escape family (tab, newline, backslash) sprinkled in."""
    for i in range(N_ROWS):
        yield (
            str(i),
            None if i % 7 == 0 else f'{{"v": {i}}}',
            f"{(i * 13) % 9999}.{i % 100:02d}",
            None if i % 3 == 0 else "2024-01-01 00:00:00+00",
            f"t{i}\tx\\y\nz" if i % 5 == 0 else f"plain {i}",
        )


def _schema():
    reg = SchemaRegistry()
    reg.register_relation(
        pg.decode_relation(
            pg.encode_relation(INTEGRATION_RELID, "public", "integration", INTEGRATION_COLS)
        ),
        lsn=1,
    )
    return reg.get(INTEGRATION_RELID)


@pytest.fixture(scope="module")
def spool(tmp_path_factory):
    d = tmp_path_factory.mktemp("sync6")
    srv = FakeWalsender(auth="trust", slot_exists=False, max_conns=2)
    srv.copy_tables["integration"] = _table_rows
    srv.start()
    tailer = WireReplicationTailer(
        "127.0.0.1", srv.port, USER, DB, "pub1", "slot1", str(d / "sync.log")
    )
    tailer.start()
    sp = tailer.initial_sync_to_spool(
        "integration", COLS, str(d / "spool"), chunk_bytes=128 * 1024
    )
    tailer.stop()
    assert srv.error is None
    return sp


def test_bootstrap_from_spool_matches_driver_list_path(spark, spool, tmp_path):
    """Spooled (distributed) bootstrap == legacy driver-list bootstrap,
    value for value through the typed StructType, and genuinely
    parallel (more than one input partition)."""
    assert len(spool.paths) > 3
    engine = PgCdcEngine(spark)
    schema = _schema()

    spooled = engine.bootstrap(spool, schema, str(tmp_path / "t_spool"))
    legacy = engine.bootstrap(list(_table_rows()), schema, str(tmp_path / "t_list"))

    assert spooled.schema == legacy.schema
    assert spooled.count() == N_ROWS
    # The distributed read parallelizes over chunk files.
    raw = spark.read.text(spool.spool_dir)
    assert raw.rdd.getNumPartitions() > 1

    a = sorted(spooled.collect(), key=lambda r: r.id)
    b = sorted(legacy.collect(), key=lambda r: r.id)
    assert a == b


def test_spooled_seed_plus_stream_merge(spark, spool, tmp_path):
    """Seed from the spool, then materialize a change stream on top —
    the update/delete/insert merge lands on the distributed seed
    exactly as it would on the legacy one."""
    engine = PgCdcEngine(spark)
    schema = _schema()
    target = str(tmp_path / "state")
    engine.bootstrap(spool, schema, target)

    log = str(tmp_path / "changes.log")
    w = WorkloadWriter(log)
    w.relation(INTEGRATION_RELID, "integration", INTEGRATION_COLS)
    w.tx(
        [
            pg.encode_update(
                INTEGRATION_RELID,
                ["5", '{"v": -5}', "999.99", "2024-02-02 00:00:00+00", "updated"],
            ),
            pg.encode_delete(INTEGRATION_RELID, ["6", None, None, None, None]),
            pg.encode_insert(
                INTEGRATION_RELID,
                [str(N_ROWS + 1), None, "1.00", None, "brand new"],
            ),
        ]
    )
    w.close()

    engine.materialize(
        engine.stream(log),
        schema,
        target,
        checkpoint=str(tmp_path / "ckpt"),
    )
    final = spark.read.parquet(target)
    assert final.count() == N_ROWS  # +1 insert, -1 delete
    assert final.filter(F.col("id") == 6).count() == 0
    row5 = final.filter(F.col("id") == 5).collect()[0]
    assert row5.text_data == "updated" and str(row5.amount) == "999.99"
    assert final.filter(F.col("id") == N_ROWS + 1).count() == 1


# ---------------------------------------------------------------------------
# Registry-snapshot sidecar: O(1) offsets (VERDICT r5 #6)
# ---------------------------------------------------------------------------


def _evolving_log(path, n_rel=100, n_ver=10):
    """n_rel relations, each re-registered n_ver times with a growing
    column set (ALTER TABLE storm), one insert per version."""
    w = WorkloadWriter(path)
    for v in range(n_ver):
        for rid in range(20_001, 20_001 + n_rel):
            cols = [(True, "id", 23, -1)] + [
                (False, f"c{k}", 25, -1) for k in range(v + 1)
            ]
            w.relation(rid, f"t{rid}", cols)
            w.tx([pg.encode_insert(rid, [str(v)] + ["x"] * (v + 1))])
    w.close()


def test_offset_size_constant_under_schema_history(tmp_path):
    """100 relations x 10 versions: the offset must stay O(1) bytes (a
    position + a revision watermark), never growing with schema history;
    snapshots land in the sidecar instead, one per mutation."""
    import json as _json
    import os

    from pypgcdc_spark.sources.pgcdc import PgCdcStreamReader

    log = str(tmp_path / "evolve.log")
    _evolving_log(log)
    r = PgCdcStreamReader({"path": log})
    o0 = r.initialOffset()
    o1 = r.latestOffset()
    assert len(_json.dumps(o1)) < 120  # O(1): pos + lsn + reg watermark
    assert o1["reg"] == 100 * 10
    # One snapshot file per registry mutation, none torn.
    d = log + ".registry.d"
    snaps = sorted(os.listdir(d))
    assert len(snaps) >= 1 and snaps[-1] == f"reg-{100*10:08d}.json"
    # Partitions resolve the snapshot and decode every version span.
    parts = r.partitions(o0, o1)
    assert parts
    rows = [t for p in parts for t in r.read(p)]
    assert len(rows) == 100 * 10


def test_restart_replay_uses_snapshot_not_current_registry(tmp_path):
    """A fresh reader (restart) planning a checkpointed batch must load
    the snapshot the offset names from the sidecar — including when its
    own scan has already advanced past it — and old embedded-registry
    offsets (pre-r6 checkpoints) must still resolve."""
    import json as _json

    from pypgcdc_spark.cdc.registry import SchemaRegistry
    from pypgcdc_spark.sources.pgcdc import PgCdcStreamReader

    log = str(tmp_path / "evolve2.log")
    _evolving_log(log, n_rel=3, n_ver=2)
    r1 = PgCdcStreamReader({"path": log, "maxtxperbatch": 3})
    o0 = r1.initialOffset()
    o1 = r1.latestOffset()  # first 3 txs (version-1 schemas)
    o2 = r1.latestOffset()

    # Restart: fresh reader, scan state rebuilt; replay the first batch.
    r2 = PgCdcStreamReader({"path": log, "maxtxperbatch": 3})
    r2.latestOffset()  # advances r2's own registry to the latest revision
    parts = r2.partitions(o0, o1)
    rows = [t for p in parts for t in r2.read(p)]
    assert len(rows) == 3
    # Typed through the revision the offset names: version-1 rows carry
    # exactly the version-1 column set (id + c0), no later columns.
    after = rows[0][11]  # envelope tuple: ..., key, before, after
    assert set(after) == {"id", "c0"}

    # Back-compat: a pre-r6 offset embedding registry JSON still plans
    # and decodes (the embedded JSON is honored verbatim as the seed;
    # R frames inside the range register on top as always).
    legacy = {"pos": o1["pos"], "lsn": o1["lsn"], "registry": SchemaRegistry().dumps()}
    legacy_start = {"pos": 0, "lsn": 0, "registry": SchemaRegistry().dumps()}
    legacy_rows = [t for part in r2.partitions(legacy_start, legacy) for t in r2.read(part)]
    assert len(legacy_rows) == 3


def test_registry_snapshot_gc_on_commit(tmp_path):
    """Committing an offset garbage-collects snapshots older than the one
    the offset names; the named snapshot survives (it seeds the next
    batch after a restart) and replay of the live window still works."""
    import os

    from pypgcdc_spark.sources.pgcdc import PgCdcStreamReader

    log = str(tmp_path / "gc.log")
    # Two appends with a scan between them -> two registry snapshots
    # (one latestOffset scan folds every mutation it sees into ONE
    # snapshot, like the pre-r6 embedded registry did).
    _evolving_log(log, n_rel=2, n_ver=2)
    r = PgCdcStreamReader({"path": log, "maxtxperbatch": 4})
    o0 = r.initialOffset()
    o1 = r.latestOffset()
    w = WorkloadWriter(log, start_lsn=50_000)
    cols = [(True, "id", 23, -1)] + [(False, f"c{k}", 25, -1) for k in range(3)]
    for rid in (20_001, 20_002):
        w.relation(rid, f"t{rid}", cols)
        w.tx([pg.encode_insert(rid, ["9", "x", "x", "x"])])
    w.close()
    o2 = r.latestOffset()
    d = log + ".registry.d"
    assert len(os.listdir(d)) >= 2
    r.commit(o1)
    left = sorted(os.listdir(d))
    assert left[0] == f"reg-{o1['reg']:08d}.json"  # older ones pruned
    # The surviving snapshots still replay the next batch on a restart.
    r2 = PgCdcStreamReader({"path": log, "maxtxperbatch": 10})
    r2.latestOffset()
    rows = [t for p in r2.partitions(o1, o2) for t in r2.read(p)]
    assert len(rows) == 2


# -- CopySpool invariants (property-based) ---------------------------------

from hypothesis import given, settings
from hypothesis import strategies as st


@settings(max_examples=60, deadline=None)
@given(
    lines=st.lists(
        st.text(
            alphabet=st.characters(
                codec="utf-8", exclude_characters="\n"
            ),
            max_size=80,
        ),
        min_size=1,
        max_size=60,
    ),
    chunk_bytes=st.integers(min_value=16, max_value=256),
    cuts=st.data(),
)
def test_copyspool_row_alignment_under_arbitrary_fragmentation(
    tmp_path_factory, lines, chunk_bytes, cuts
):
    """The walsender fragments COPY data into CopyData messages at
    ARBITRARY byte positions (mid-row, mid-UTF8-sequence); the spool
    must still (a) reproduce the byte stream exactly, (b) cut chunk
    files only at row boundaries — every chunk is a standalone set of
    complete COPY lines, i.e. a valid Spark input split — and (c) keep
    the driver buffer bounded by max(chunk_bytes, one row) + one
    message (a row longer than chunk_bytes has no newline to cut at
    until it completes — the docstring's chunk_bytes+one-message bound
    assumes rows smaller than the chunk size)."""
    from pypgcdc_spark.sources.pgwire import CopySpool

    payload = b"".join(t.encode("utf-8") + b"\n" for t in lines)
    d = tmp_path_factory.mktemp("spoolprop")
    spool = CopySpool(str(d), chunk_bytes=chunk_bytes)
    pos, max_msg = 0, 0
    while pos < len(payload):
        step = cuts.draw(st.integers(min_value=1, max_value=48))
        spool(payload[pos : pos + step])
        max_msg = max(max_msg, step)
        pos += step
    paths = spool.close()

    blobs = [open(p, "rb").read() for p in paths]
    assert b"".join(blobs) == payload  # (a) lossless
    for b in blobs[:-1]:
        assert b.endswith(b"\n")  # (b) whole rows per chunk
    longest_row = max(len(t.encode("utf-8")) for t in lines) + 1
    assert spool.max_buffered <= max(chunk_bytes, longest_row) + max_msg


def test_prefix_scan_boundaries_match_full_scan(tmp_path):
    """The driver's prefix scan (≤64 payload bytes per frame, full read
    only for 'R') must find exactly the unit boundaries and Relation
    payloads the full scan finds — over wide rows, v2 streamed spans and
    two-phase units."""
    from pypgcdc_spark.sources.replay import (
        TxBoundaryScanner,
        scan_frames,
        tx_boundaries,
    )
    from pypgcdc_spark.testing import write_two_phase_cdc_pair

    plain = str(tmp_path / "p.log")
    log = str(tmp_path / "s.log")
    rows = [(i % 11, "error" if i % 9 == 4 else "ev" + "x" * (i % 300), i * 1.5)
            for i in range(200)]
    write_two_phase_cdc_pair(plain, log, rows, chunk=25)

    full = []
    sc = TxBoundaryScanner()
    for fr in scan_frames(log):
        c = sc.feed(fr)
        if c is not None:
            full.append(c)
    assert tx_boundaries(log) == full  # tx_boundaries runs prefix mode

    pre = []
    sc2 = TxBoundaryScanner()
    r_payloads = []
    for fr in scan_frames(log, prefix_bytes=64):
        if fr.payload[:1] == b"R":
            r_payloads.append(fr.payload)
        c = sc2.feed(fr)
        if c is not None:
            pre.append(c)
    assert pre == full
    # 'R' frames came through whole (decodable), wide DML frames truncated.
    from pypgcdc_spark.cdc import pgoutput as pg

    assert r_payloads and all(pg.decode_relation(p) for p in r_payloads)
    assert any(
        len(fr.payload) == 64 for fr in scan_frames(log, prefix_bytes=64)
    )
