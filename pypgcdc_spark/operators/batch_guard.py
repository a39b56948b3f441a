"""foreachBatch replay guard: durable batch-id high-water per state dir.

Structured Streaming's ``foreachBatch`` is AT-LEAST-ONCE: after a sink
failure the engine re-invokes the function with the SAME ``batch_id``
and (for replayable sources, like the pgcdc offset-tracked log) the
same data.  A maintainer whose fold is not naturally idempotent — the
join IVM's B-side accumulates per-order line sums, so re-adding a
replayed ΔB double-counts — must dedup on the batch id.  This is the
documented Spark recipe for exactly-once ``foreachBatch`` sinks
("use batchId to deduplicate writes").

The guard is a JSON marker next to the state, written with atomic
``os.replace`` AFTER the state commit.  A crash between the state
commit and the marker write re-applies one batch; the LSN/tombstone
guards make that harmless for the signature/key maintainers, and a
lake-format state (Delta/Iceberg ``MERGE`` with txn ids) closes the
residual window for the join IVM — the module docstrings already name
that as the production upgrade path for the parquet stand-in.
"""

from __future__ import annotations

import json
import os


def _marker(work_dir: str) -> str:
    return os.path.join(work_dir, "_applied_batch.json")


def already_applied(work_dir: str, batch_id: int) -> bool:
    """True iff ``batch_id`` was already committed for this state dir
    (a foreachBatch replay) — the caller should skip the batch."""
    if batch_id is None:
        return False
    try:
        with open(_marker(work_dir)) as f:
            return int(batch_id) <= int(json.load(f).get("batch_id", -1))
    except (OSError, ValueError):
        return False


def mark_applied(work_dir: str, batch_id: int) -> None:
    """Durably record ``batch_id`` as committed (atomic replace — a
    concurrent reader never sees a torn marker)."""
    if batch_id is None:
        return
    os.makedirs(work_dir, exist_ok=True)
    tmp = _marker(work_dir) + ".tmp"
    with open(tmp, "w") as f:
        json.dump({"batch_id": int(batch_id)}, f)
    os.replace(tmp, _marker(work_dir))
