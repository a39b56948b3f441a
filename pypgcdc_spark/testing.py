"""Test-stream synthesis helpers.

Builds protocol-true pgoutput replay logs for tests and demos — the same
canonical workload the reference's live-Postgres integration tests run
(FIXTURES.md §1: insert / update / delete on ``public.integration`` across
four transactions, terminated by a ``control`` marker row —
``/root/reference/tests/test_reader.py:35-51`` behavior, synthesized here
because this environment has no Postgres).
"""

from __future__ import annotations

from datetime import datetime, timedelta, timezone
from typing import List, Optional, Sequence, Tuple

from pypgcdc_spark.cdc import pgoutput as pg
from pypgcdc_spark.sources.replay import ReplayLogWriter

INTEGRATION_RELID = 16385
CONTROL_RELID = 16386

INTEGRATION_COLS = [
    # (pkey, name, type oid, atttypmod)  — integer, jsonb, numeric(10,2),
    # timestamptz, text: every type family the reference exercises.
    (True, "id", 23, -1),
    (False, "json_data", 3802, -1),
    (False, "amount", 1700, ((10 << 16) | 2) + 4),
    (False, "updated_at", 1184, -1),
    (False, "text_data", 25, -1),
]
CONTROL_COLS = [(True, "id", 23, -1), (False, "command", 25, -1)]

_T0 = datetime(2024, 1, 1, tzinfo=timezone.utc)


class WorkloadWriter:
    """Appends whole transactions of pgoutput messages with monotone LSNs."""

    def __init__(self, path: str, start_lsn: int = 1000):
        self.writer = ReplayLogWriter(path)
        self.lsn = start_lsn
        self.xid = 100

    def _next(self, n: int = 10) -> int:
        self.lsn += n
        return self.lsn

    def relation(self, relid: int, name: str, cols, namespace: str = "public"):
        self.writer.append(self._next(), pg.encode_relation(relid, namespace, name, cols))

    def tx(self, messages: Sequence[bytes], ts: Optional[datetime] = None):
        """One Begin..Commit transaction containing ``messages``."""
        ts = ts or (_T0 + timedelta(seconds=self.xid))
        self.xid += 1
        # Begin.final_lsn is the transaction's END lsn per the pgoutput
        # spec — i.e. the LSN the Commit frame lands on.
        commit_lsn = self.lsn + 10 * (len(messages) + 2)
        self.writer.append(self._next(), pg.encode_begin(commit_lsn, ts, self.xid))
        for m in messages:
            self.writer.append(self._next(), m)
        end = self._next()
        self.writer.append(end, pg.encode_commit(commit_lsn, end, ts))

    def close(self):
        self.writer.close()

    # -- protocol v2 streamed transactions (PG14+ ``streaming 'on'``) ----
    def stream_segment(self, xid: int, messages: Sequence[bytes], first: bool = False):
        """One Stream Start..Stop segment of in-progress tx ``xid``.
        ``messages`` must already carry the in-segment xid prefix
        (pass ``xid=`` to the encoders)."""
        self.writer.append(self._next(), pg.encode_stream_start(xid, first))
        for m in messages:
            self.writer.append(self._next(), m)
        self.writer.append(self._next(), pg.encode_stream_stop())

    def stream_commit(self, xid: int, ts: Optional[datetime] = None):
        ts = ts or (_T0 + timedelta(seconds=xid))
        end = self._next()
        self.writer.append(end, pg.encode_stream_commit(xid, end, end, ts))

    def stream_abort(self, xid: int, subxid: Optional[int] = None):
        self.writer.append(self._next(), pg.encode_stream_abort(xid, subxid))


def write_reference_workload(path: str) -> None:
    """The reference integration-test workload, four transactions."""
    w = WorkloadWriter(path)
    w.relation(INTEGRATION_RELID, "integration", INTEGRATION_COLS)
    w.relation(CONTROL_RELID, "control", CONTROL_COLS)
    row = ["10", '{"data": 10}', "10.20", "2020-01-01 00:00:00+00", "dummy_value"]
    w.tx([pg.encode_insert(INTEGRATION_RELID, row)])
    updated = ["10", '{"data": 20}', "10.20", "2020-01-01 00:00:00+00", "dummy_value"]
    w.tx([pg.encode_update(INTEGRATION_RELID, updated)])
    w.tx([pg.encode_delete(INTEGRATION_RELID, ["10", None, None, None, None], old_category="K")])
    w.tx([pg.encode_insert(CONTROL_RELID, ["1", "exit"])])
    w.close()


def write_upsert_workload(
    path: str,
    n_keys: int = 50,
    n_updates: int = 200,
    with_toast: bool = True,
    with_truncate: bool = False,
    seed: int = 7,
) -> List[Tuple[str, str]]:
    """A keyed upsert/delete workload; returns the expected final
    ``(id, text_data)`` state for assertions (computed independently of the
    engine, by direct simulation)."""
    import random

    rng = random.Random(seed)
    w = WorkloadWriter(path)
    w.relation(INTEGRATION_RELID, "integration", INTEGRATION_COLS)
    state = {}

    def full_row(k: int, v: int):
        return [str(k), f'{{"data": {v}}}', f"{v}.50", "2024-01-01 00:00:00+00", f"txt_{v}"]

    batch = []
    for i in range(n_keys):
        batch.append(pg.encode_insert(INTEGRATION_RELID, full_row(i, i)))
        state[str(i)] = f"txt_{i}"
    w.tx(batch)

    for step in range(n_updates):
        k = rng.randrange(n_keys)
        action = rng.random()
        if action < 0.15 and str(k) in state:
            w.tx([pg.encode_delete(INTEGRATION_RELID, [str(k), None, None, None, None])])
            del state[str(k)]
        elif action < 0.35 and with_toast and str(k) in state:
            # Update that leaves text_data TOAST-unchanged ('u'): the value
            # must carry forward from the previous version (Q6).
            row = full_row(k, 10_000 + step)
            w.tx([pg.encode_update(INTEGRATION_RELID, row, toast_unchanged={4})])
        else:
            row = full_row(k, 10_000 + step)
            # Update on a deleted key resurrects it under last-writer-wins
            # apply semantics, matching what the materializer produces.
            w.tx([pg.encode_update(INTEGRATION_RELID, row)])
            state[str(k)] = f"txt_{10_000 + step}"

    if with_truncate:
        w.tx([pg.encode_truncate([INTEGRATION_RELID])])
        state.clear()
        w.tx([pg.encode_insert(INTEGRATION_RELID, full_row(999, 999))])
        state["999"] = "txt_999"
    w.close()
    return sorted(state.items())


# ---------------------------------------------------------------------------
# Protocol v2: plain-vs-streamed twin logs
# ---------------------------------------------------------------------------

STREAMED_RELID = 17001
STREAMED_COLS = [
    (True, "user_id", 20, -1),
    (False, "last_event", 25, -1),
    (False, "value", 701, -1),
]


def write_streamed_cdc_pair(
    plain_path: str,
    streamed_path: str,
    rows: Sequence[Tuple[int, str, float]],
    chunk: int = 50,
) -> None:
    """Render one change workload twice: protocol v1 (plain Begin..Commit
    transactions) and protocol v2 (streamed in-progress transactions).

    ``rows`` is the change order: ``(user_id, event_type, value)``;
    ``event_type == 'error'`` means DELETE, anything else a full-row
    upsert.  Every change frame carries the SAME LSN in both logs
    (``10_000 + 10*i``), and every transaction the SAME commit LSN —
    the v1 rendering delivers each streamed transaction as one whole
    Begin..Commit at its COMMIT position (exactly what a real walsender
    decoding the same WAL under ``proto_version '1'`` emits: changes
    early in WAL, the transaction delivered where it commits), so keyed
    last-writer-wins state ordered by ``(commit_lsn, lsn)`` must be
    identical.  The streamed rendering adds:

    * two streamed txs (xids 900/901) whose segments interleave,
    * plain transactions between segments (every third chunk),
    * a poison subtransaction (xid 950) inside stream 900, aborted via
      Stream Abort(900, 950) before the commit,
    * a whole poison stream (xid 902), aborted via Stream Abort(902, 902).

    The poison changes overwrite every key at LSNs above all real changes
    — if an abort path leaks, last-writer-wins makes the corruption
    visible in the final state (and in the driver's oracle hash).
    """

    def enc(row, xid=None):
        uid, etype, val = row
        if etype == "error":
            return pg.encode_delete(STREAMED_RELID, [str(uid), None, None], xid=xid)
        return pg.encode_update(STREAMED_RELID, [str(uid), etype, repr(float(val))], xid=xid)

    def lsn_of(i: int) -> int:
        return 10_000 + 10 * i

    chunks = [list(enumerate(rows))[i : i + chunk] for i in range(0, len(rows), chunk)]
    poison_keys = sorted({r[0] for r in rows})[:10]
    n = len(rows)

    # -- plain v1 rendering -------------------------------------------------
    # Transactions appear at their COMMIT positions, change LSNs
    # preserved: every-third chunks commit immediately (in chunk order);
    # the chunks a real server would have streamed (xids 900/901) are
    # ONE transaction each, delivered last — at the stream-commit LSNs
    # the v2 rendering uses — because that's when they commit.
    w = ReplayLogWriter(plain_path)
    w.append(100, pg.encode_relation(STREAMED_RELID, "public", "events_state", STREAMED_COLS))
    for ci, ch in enumerate(chunks):
        if ci % 3 != 2:
            continue  # streamed on the wire; delivered at commit, below
        first, last = lsn_of(ch[0][0]), lsn_of(ch[-1][0])
        ts = _T0 + timedelta(seconds=ci)
        w.append(first - 5, pg.encode_begin(last + 5, ts, 500 + ci))
        for gi, row in ch:
            w.append(lsn_of(gi), enc(row))
        w.append(last + 5, pg.encode_commit(last + 5, last + 5, ts))
    for xid, commit_at in ((900, lsn_of(n + 43)), (901, lsn_of(n + 44))):
        members = [
            (gi, row)
            for ci, ch in enumerate(chunks)
            if ci % 3 != 2 and ci % 2 == (0 if xid == 900 else 1)
            for gi, row in ch
        ]
        ts = _T0 + timedelta(seconds=xid)
        w.append(commit_at - 2, pg.encode_begin(commit_at, ts, xid))
        for gi, row in members:
            w.append(lsn_of(gi), enc(row))
        w.append(commit_at, pg.encode_commit(commit_at, commit_at, ts))
    w.close()

    # -- streamed v2 rendering ---------------------------------------------
    w = ReplayLogWriter(streamed_path)
    w.append(100, pg.encode_relation(STREAMED_RELID, "public", "events_state", STREAMED_COLS))
    seen_first = set()
    streamed_900 = [ci for ci in range(len(chunks)) if ci % 3 != 2 and ci % 2 == 0]
    last_900 = streamed_900[-1] if streamed_900 else None
    for ci, ch in enumerate(chunks):
        first, last = lsn_of(ch[0][0]), lsn_of(ch[-1][0])
        if ci % 3 == 2:
            # A whole plain transaction between stream segments.
            ts = _T0 + timedelta(seconds=ci)
            w.append(first - 5, pg.encode_begin(last + 5, ts, 500 + ci))
            for gi, row in ch:
                w.append(lsn_of(gi), enc(row))
            w.append(last + 5, pg.encode_commit(last + 5, last + 5, ts))
            continue
        xid = 900 if ci % 2 == 0 else 901
        # -4, not -5: a preceding plain chunk's Commit sits at its
        # last+5 == this first-5; CLOSING frame LSNs must stay unique
        # (the wire tailer dedupes resent units by close-LSN membership;
        # data-frame LSNs may legitimately collide, as on a real wire).
        w.append(first - 4, pg.encode_stream_start(xid, xid not in seen_first))
        seen_first.add(xid)
        for gi, row in ch:
            w.append(lsn_of(gi), enc(row, xid=xid))
        if ci == last_900:
            # Poison subtransaction rides in stream 900's last segment.
            for j, uid in enumerate(poison_keys):
                w.append(lsn_of(n + j), enc((uid, "poison_subtx", 9.99e6), xid=950))
        w.append(last + 3, pg.encode_stream_stop())
    # Whole poison stream: would clobber every key at the highest LSNs.
    w.append(lsn_of(n + 20) - 5, pg.encode_stream_start(902, True))
    for j, uid in enumerate(poison_keys):
        w.append(lsn_of(n + 20 + j), enc((uid, "poison_stream", 8.88e6), xid=902))
    w.append(lsn_of(n + 40), pg.encode_stream_stop())
    w.append(lsn_of(n + 41), pg.encode_stream_abort(902, 902))
    w.append(lsn_of(n + 42), pg.encode_stream_abort(900, 950))
    tail = lsn_of(n + 43)
    w.append(tail, pg.encode_stream_commit(900, tail, tail, _T0 + timedelta(seconds=900)))
    tail = lsn_of(n + 44)
    w.append(tail, pg.encode_stream_commit(901, tail, tail, _T0 + timedelta(seconds=901)))
    w.close()


def write_two_phase_cdc_pair(
    plain_path: str,
    twophase_path: str,
    rows: Sequence[Tuple[int, str, float]],
    chunk: int = 50,
) -> None:
    """Render one change workload twice: plain v1 Begin..Commit
    transactions vs the ``two_phase`` protocol flavor.  Same
    ``(user_id, event_type, value)`` change semantics and identical
    per-change LSNs as :func:`write_streamed_cdc_pair`.  The v1
    rendering delivers each chunk's transaction at its Commit Prepared
    RESOLUTION position (change LSNs preserved) — what a real walsender
    decoding the same WAL without ``two_phase`` emits, since a prepared
    transaction only reaches a v1 subscriber once it commits — so keyed
    last-writer-wins state ordered by ``(commit_lsn, lsn)`` must be
    identical.  The two-phase rendering:

    * every chunk becomes a prepared transaction ('b'..DML..'P') whose
      Commit Prepared ('K') is DEFERRED — resolutions land after later
      chunks have prepared (and one pair resolves out of prepare order),
    * every third chunk is a v2 streamed tx closed by Stream Prepare
      ('p') instead of Stream Commit,
    * a poison prepared transaction (xid 940, highest LSNs, overwriting
      every key) is resolved by Rollback Prepared ('r') — a leak flips
      last-writer-wins state.
    """

    def enc(row, xid=None):
        uid, etype, val = row
        if etype == "error":
            return pg.encode_delete(STREAMED_RELID, [str(uid), None, None], xid=xid)
        return pg.encode_update(STREAMED_RELID, [str(uid), etype, repr(float(val))], xid=xid)

    def lsn_of(i: int) -> int:
        return 10_000 + 10 * i

    chunks = [list(enumerate(rows))[i : i + chunk] for i in range(0, len(rows), chunk)]
    poison_keys = sorted({r[0] for r in rows})[:10]
    n = len(rows)

    # Resolution schedule shared by both renderings: after every second
    # prepare the two oldest pending txs resolve OUT of prepare order
    # (K for the newer first); a leftover chunk resolves at the end.
    # [(xid, ts, chunk, resolution/commit LSN)] in resolution order.
    schedule = []
    pend = []
    for ci, ch in enumerate(chunks):
        pend.append((700 + ci, _T0 + timedelta(seconds=ci), ch))
        if len(pend) >= 2:
            for k, (pxid, pts, pch) in enumerate(reversed(pend[:2])):
                schedule.append((pxid, pts, pch, lsn_of(ch[-1][0]) + 7 + k))
            pend = pend[2:]
    for k, (pxid, pts, pch) in enumerate(pend):
        schedule.append((pxid, pts, pch, lsn_of(n) + 2 + k))

    # -- plain v1 rendering -------------------------------------------------
    # Each chunk's transaction delivered whole at its RESOLUTION
    # position (change LSNs preserved): a v1 subscriber sees a prepared
    # transaction only when it commits.
    w = ReplayLogWriter(plain_path)
    w.append(100, pg.encode_relation(STREAMED_RELID, "public", "events_state", STREAMED_COLS))
    for pxid, pts, pch, res in schedule:
        w.append(res - 5, pg.encode_begin(res, pts, pxid))
        for gi, row in pch:
            w.append(lsn_of(gi), enc(row))
        w.append(res, pg.encode_commit(res, res, pts))
    w.close()

    # -- two-phase rendering ------------------------------------------------
    w = ReplayLogWriter(twophase_path)
    w.append(100, pg.encode_relation(STREAMED_RELID, "public", "events_state", STREAMED_COLS))
    pending = []  # xids prepared but not yet resolved
    for ci, ch in enumerate(chunks):
        first, last = lsn_of(ch[0][0]), lsn_of(ch[-1][0])
        ts = _T0 + timedelta(seconds=ci)
        xid = 700 + ci
        gid = f"gid-{xid}"
        if ci % 3 == 1:
            # Streamed flavor closed by Stream Prepare.
            w.append(first - 4, pg.encode_stream_start(xid, True))
            for gi, row in ch:
                w.append(lsn_of(gi), enc(row, xid=xid))
            w.append(last + 2, pg.encode_stream_stop())
            w.append(last + 3, pg.encode_stream_prepare(first - 4, last + 3, ts, xid, gid))
        else:
            w.append(first - 5, pg.encode_begin_prepare(first - 5, last + 4, ts, xid, gid))
            for gi, row in ch:
                w.append(lsn_of(gi), enc(row))
            w.append(last + 4, pg.encode_prepare(first - 5, last + 4, ts, xid, gid))
        pending.append((xid, gid, ts))
        if len(pending) >= 2:
            # Resolve the two oldest OUT of prepare order: K(newer) first.
            # +7/+8: the next chunk's StreamStart sits at its first-4 ==
            # this last+6; frame LSNs must stay globally unique.
            for k, (pxid, pgid, pts) in enumerate(reversed(pending[:2])):
                res = lsn_of(ch[-1][0]) + 7 + k
                w.append(res, pg.encode_commit_prepared(res, res, pts, pxid, pgid))
            pending = pending[2:]
    for k, (pxid, pgid, pts) in enumerate(pending):
        res = lsn_of(n) + 2 + k
        w.append(res, pg.encode_commit_prepared(res, res, pts, pxid, pgid))
    # Poison prepared tx at the highest LSNs, rolled back.
    ts = _T0 + timedelta(seconds=940)
    first = lsn_of(n + 20)
    w.append(first - 5, pg.encode_begin_prepare(first - 5, first + 200, ts, 940, "gid-poison"))
    for j, uid in enumerate(poison_keys):
        w.append(lsn_of(n + 20 + j), enc((uid, "poison_2pc", 7.77e6)))
    w.append(lsn_of(n + 31), pg.encode_prepare(first - 5, lsn_of(n + 31), ts, 940, "gid-poison"))
    w.append(
        lsn_of(n + 32),
        pg.encode_rollback_prepared(lsn_of(n + 31), lsn_of(n + 32), ts, ts, 940, "gid-poison"),
    )
    w.close()
