"""Property-based tests for v2 stream / two-phase reassembly.

A random set of transactions — each a list of keyed upserts/deletes with
globally unique LSNs — is rendered as a random protocol mix (plain
Begin..Commit, v2 streamed with 1-3 segments, two-phase prepared, or a
streamed+StreamPrepare flavor; some streamed txs aborted, some prepared
txs rolled back, subtransaction poison optionally injected and aborted),
with segments/pending-windows randomly interleaved.  The transformer's
output must ALWAYS equal a direct simulation that applies only the
surviving transactions' changes in LSN order — and the boundary scanner
must tile the log into contiguous units with no stream/pending span
bisected.
"""

from datetime import datetime, timezone

from hypothesis import given, settings
from hypothesis import strategies as st

from pypgcdc_spark.cdc import pgoutput as pg
from pypgcdc_spark.cdc.transform import MessageTransformer
from pypgcdc_spark.sources import replay

TS = datetime(2024, 6, 1, tzinfo=timezone.utc)
RELID = 10
R_MSG = pg.encode_relation(
    RELID, "public", "t", [(True, "k", 20, -1), (False, "v", 25, -1)]
)

# One transaction: kind, list of (key, value|None=delete), fate.
tx_strategy = st.fixed_dictionaries(
    {
        "kind": st.sampled_from(["plain", "stream", "prepared", "stream_prepared"]),
        "changes": st.lists(
            st.tuples(st.integers(0, 6), st.one_of(st.none(), st.integers(0, 99))),
            min_size=1,
            max_size=5,
        ),
        "abort": st.booleans(),  # stream-abort / rollback-prepared
        "poison_subtx": st.booleans(),  # only meaningful for streamed kinds
    }
)


def _render(txs, rng_choices):
    """Render the tx set into frames with random interleaving.

    Returns (frames, expected_state).  LSNs: tx i's change j gets
    10_000 + 100*i + j (globally unique, commit/control frames use the
    90+ tail of each tx's range).
    """
    frames = [(100, R_MSG)]
    expected = {}
    # Apply surviving changes in LSN order for the expectation.
    surviving = []
    for i, tx in enumerate(txs):
        if not tx["abort"]:
            for j, (k, v) in enumerate(tx["changes"]):
                surviving.append((10_000 + 100 * i + j, k, v))
    for _lsn, k, v in sorted(surviving):
        if v is None:
            expected.pop(k, None)
        else:
            expected[k] = str(v)

    def enc(k, v, xid=None):
        if v is None:
            return pg.encode_delete(RELID, [str(k), None], xid=xid)
        return pg.encode_update(RELID, [str(k), str(v)], xid=xid)

    # Build per-tx event queues, then interleave: plain/prepared spans are
    # atomic blocks; streamed txs contribute 1-3 segment blocks plus a
    # resolution frame.  Blocks are shuffled deterministically by
    # rng_choices (a hypothesis-driven permutation seed list).
    blocks = []  # (sort_key, [frames...]) — resolution frames sort last
    resolutions = []
    for i, tx in enumerate(txs):
        base = 10_000 + 100 * i
        xid = 500 + i
        ch = tx["changes"]
        kind = tx["kind"]
        if kind == "plain" and not tx["abort"]:
            blk = [(base - 5, pg.encode_begin(base + 90, TS, xid))]
            blk += [(base + j, enc(k, v)) for j, (k, v) in enumerate(ch)]
            blk += [(base + 90, pg.encode_commit(base + 90, base + 90, TS))]
            blocks.append(blk)
        elif kind == "plain" and tx["abort"]:
            # An aborted plain tx never reaches the wire at all.
            continue
        elif kind in ("stream", "stream_prepared"):
            n_seg = 1 + (len(ch) > 2) + (len(ch) > 4)
            seg_size = (len(ch) + n_seg - 1) // n_seg
            first = True
            off = 0
            for s in range(n_seg):
                part = ch[off : off + seg_size]
                if not part:
                    continue
                blk = [(base + 70 + s * 3, pg.encode_stream_start(xid, first))]
                blk += [
                    (base + off + j, enc(k, v, xid=xid)) for j, (k, v) in enumerate(part)
                ]
                if tx["poison_subtx"] and s == 0:
                    # Poison rows tagged with a subtx xid, aborted below:
                    # they must NEVER surface (keys overwritten at +80).
                    blk += [
                        (base + 80 + p, enc(p, 999, xid=xid + 50)) for p in range(3)
                    ]
                blk += [(base + 71 + s * 3, pg.encode_stream_stop())]
                blocks.append(blk)
                first = False
                off += seg_size
            res = []
            if tx["poison_subtx"]:
                res.append((base + 92, pg.encode_stream_abort(xid, xid + 50)))
            if tx["abort"]:
                res.append((base + 93, pg.encode_stream_abort(xid, xid)))
            elif kind == "stream":
                res.append((base + 94, pg.encode_stream_commit(xid, base + 94, base + 94, TS)))
            else:  # stream_prepared
                res.append((base + 94, pg.encode_stream_prepare(base + 70, base + 94, TS, xid, f"g{i}")))
                res.append(
                    (
                        base + 95,
                        pg.encode_commit_prepared(base + 95, base + 95, TS, xid, f"g{i}"),
                    )
                )
            resolutions.append((i, res))
        elif kind == "prepared":
            blk = [(base - 5, pg.encode_begin_prepare(base - 5, base + 90, TS, xid, f"g{i}"))]
            blk += [(base + j, enc(k, v)) for j, (k, v) in enumerate(ch)]
            blk += [(base + 90, pg.encode_prepare(base - 5, base + 90, TS, xid, f"g{i}"))]
            blocks.append(blk)
            if tx["abort"]:
                resolutions.append(
                    (
                        i,
                        [
                            (
                                base + 94,
                                pg.encode_rollback_prepared(
                                    base + 90, base + 94, TS, TS, xid, f"g{i}"
                                ),
                            )
                        ],
                    )
                )
            else:
                resolutions.append(
                    (
                        i,
                        [
                            (
                                base + 94,
                                pg.encode_commit_prepared(base + 94, base + 94, TS, xid, f"g{i}"),
                            )
                        ],
                    )
                )
        # But a poison_subtx on a whole-aborted stream is covered too.

    # Deterministic "random" interleave of blocks using rng_choices.
    order = list(range(len(blocks)))
    if order:
        for c in rng_choices:
            a, b = c % len(order), (c // 7) % len(order)
            order[a], order[b] = order[b], order[a]
    for idx in order:
        frames.extend(blocks[idx])
    # Resolutions go last (after every segment/span block), in tx order —
    # a resolution can never precede its own segments.
    for _i, res in resolutions:
        frames.extend(res)
    return frames, expected


@settings(max_examples=60, deadline=None)
@given(
    txs=st.lists(tx_strategy, min_size=1, max_size=6),
    rng_choices=st.lists(st.integers(0, 10_000), max_size=12),
)
def test_random_protocol_mix_reassembles_to_simulation(txs, rng_choices):
    frames, expected = _render(txs, rng_choices)
    x = MessageTransformer()
    evs = []
    for lsn, payload in frames:
        evs.extend(x.feed(lsn, payload))
    evs.sort(key=lambda e: e.lsn)
    got = {}
    for ev in evs:
        k = int(ev.key["k"])
        if ev.op == "D":
            got.pop(k, None)
        else:
            got[k] = ev.after["v"]
    assert got == expected
    # no poison value ever surfaces
    assert all(v != "999" for v in got.values())


@settings(max_examples=30, deadline=None)
@given(
    txs=st.lists(tx_strategy, min_size=1, max_size=6),
    rng_choices=st.lists(st.integers(0, 10_000), max_size=12),
)
def test_boundary_units_tile_the_log(txs, rng_choices, tmp_path_factory):
    import os

    frames, _ = _render(txs, rng_choices)
    d = tmp_path_factory.mktemp("v2prop")
    p = str(d / "log")
    with replay.ReplayLogWriter(p) as w:
        for lsn, payload in frames:
            w.append(lsn, payload)
    ranges = replay.tx_boundaries(p)
    if len(frames) == 1:
        # Only the R prologue (every generated tx was an aborted plain tx
        # that never reached the wire): no unit ever closes — correct.
        assert ranges == []
        return
    # contiguous tiling from 0 to EOF (the trailing resolutions always
    # close the last unit)
    assert ranges, "at least one unit"
    assert ranges[0][0] == 0
    for (a1, e1), (a2, e2) in zip(ranges, ranges[1:]):
        assert e1 == a2
    assert ranges[-1][1] == os.path.getsize(p)
    # a partition reader per unit sees complete spans: replaying each
    # unit with a FRESH transformer (seeded with the driver-scanned
    # registry, exactly as the source's partitions carry it in the
    # offset) raises nothing and leaves no pending buffer
    from pypgcdc_spark.cdc.registry import SchemaRegistry

    reg = SchemaRegistry()
    scanner = replay.TxBoundaryScanner()
    for fr in replay.scan_frames(p):
        if fr.payload[:1] == b"R":
            reg.register_relation(
                pg.decode_relation(fr.payload, streamed=scanner.in_segment), lsn=fr.lsn
            )
        scanner.feed(fr)
    reg_json = reg.dumps()
    for a, e in ranges:
        x = MessageTransformer(registry=SchemaRegistry.loads(reg_json))
        for fr in replay.scan_frames(p, a, e):
            list(x.feed(fr.lsn, fr.payload))
        assert not x._stream_bufs, "pending buffer crossed a unit boundary"
