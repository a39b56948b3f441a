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
