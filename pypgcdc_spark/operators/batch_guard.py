"""foreachBatch replay guard: durable batch-id high-water per state dir.

Structured Streaming's ``foreachBatch`` is AT-LEAST-ONCE: after a sink
failure the engine re-invokes the function with the SAME ``batch_id``
and (for replayable sources, like the pgcdc offset-tracked log) the
same data.  A maintainer whose fold is not naturally idempotent — the
join IVM's B-side accumulates per-order line sums, so re-adding a
replayed ΔB double-counts — must dedup on the batch id.  This is the
documented Spark recipe for exactly-once ``foreachBatch`` sinks
("use batchId to deduplicate writes").

Batch ids are only monotone WITHIN one checkpoint lineage: restarting a
stream with a FRESH checkpoint resets them to 0, so a bare high-water
comparison against a marker left by the previous lineage would silently
skip every new batch until the new ids pass the old high-water (ADVICE
r8).  The marker therefore also records a ``run_id`` — the caller's
stream identity, conventionally the checkpoint path — and a mismatch
means "different lineage, nothing from THIS stream was applied yet":
``already_applied`` returns False and the next ``mark_applied``
rewrites the marker under the new identity.  Callers that pass no
run_id keep the old contract (state dir and checkpoint live and die
together).

The guard is a JSON marker next to the state, written with atomic
``os.replace`` AFTER the state commit.  A crash between the state
commit and the marker write re-applies one batch; the LSN/tombstone
guards make that harmless for the signature/key maintainers, and the
join IVM closes the residual window with a state+marker manifest
committed in ONE atomic rename (see ``atomic_state.py``) — the
no-lake-dependency analog of a Delta/Iceberg ``MERGE`` with txn ids.
"""

from __future__ import annotations

import json
import os
from typing import Optional


def _marker(work_dir: str) -> str:
    return os.path.join(work_dir, "_applied_batch.json")


def _load(work_dir: str) -> Optional[dict]:
    try:
        with open(_marker(work_dir)) as f:
            return json.load(f)
    except (OSError, ValueError):
        return None


def already_applied(
    work_dir: str, batch_id: int, run_id: Optional[str] = None
) -> bool:
    """True iff ``batch_id`` was already committed for this state dir
    (a foreachBatch replay) — the caller should skip the batch.

    ``run_id`` identifies the stream lineage (checkpoint path / query
    runId).  A marker written under a DIFFERENT lineage never suppresses
    a batch: fresh-checkpoint restarts reset batch ids to 0, and skipping
    until they outgrow the previous lineage's high-water would silently
    drop data.
    """
    if batch_id is None:
        return False
    state = _load(work_dir)
    if state is None:
        return False
    if run_id is not None and state.get("run_id") not in (None, run_id):
        return False  # different checkpoint lineage: its high-water is void
    try:
        return int(batch_id) <= int(state.get("batch_id", -1))
    except (TypeError, ValueError):
        return False


def mark_applied(
    work_dir: str, batch_id: int, run_id: Optional[str] = None
) -> None:
    """Durably record ``batch_id`` as committed (atomic replace — a
    concurrent reader never sees a torn marker).  ``run_id`` stamps the
    stream lineage the id belongs to (see ``already_applied``)."""
    if batch_id is None:
        return
    os.makedirs(work_dir, exist_ok=True)
    tmp = _marker(work_dir) + ".tmp"
    payload = {"batch_id": int(batch_id)}
    if run_id is not None:
        payload["run_id"] = str(run_id)
    with open(tmp, "w") as f:
        json.dump(payload, f)
    os.replace(tmp, _marker(work_dir))
