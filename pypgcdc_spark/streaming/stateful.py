"""Custom stateful streaming operators (applyInPandasWithState).

The engine's answer to "operator Spark lacks": arbitrary per-key state
machines over a stream, Arrow-batched.  Two operators:

* ``key_version_tracker`` — per-key CDC bookkeeping (version count, last
  LSN, live/deleted flag) maintained incrementally across micro-batches:
  the streaming materialization of the reference's per-key apply loop,
  without re-reading the target table each batch.
* ``running_value_stats`` — per-user running aggregates with custom logic
  (count / exact integer-cent sum) that outlives any window.

State is per-key and bounded by key cardinality; at 100 TB the state
store shards by the groupBy key across executors (RocksDB-backed on a real
cluster).
"""

from __future__ import annotations

from typing import Any, Iterable, Iterator, Tuple

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

VERSION_SCHEMA = "user_id BIGINT, n_versions BIGINT, last_lsn BIGINT, alive BOOLEAN"
VERSION_STATE_SCHEMA = "n_versions BIGINT, last_lsn BIGINT, alive BOOLEAN"

STATS_SCHEMA = "user_id BIGINT, n_events BIGINT, total_cents BIGINT"
STATS_STATE_SCHEMA = "n_events BIGINT, total_cents BIGINT"


def _version_step(
    key: Tuple[Any, ...],
    batches: Iterable[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    n, last_lsn, alive = state.get if state.exists else (0, -1, True)
    for pdf in batches:
        pdf = pdf.sort_values("lsn")
        n += len(pdf)
        last_lsn = int(pdf["lsn"].max())
        alive = bool(pdf.iloc[-1]["op"] != "D")
    state.update((n, last_lsn, alive))
    yield pd.DataFrame(
        {"user_id": [key[0]], "n_versions": [n], "last_lsn": [last_lsn], "alive": [alive]}
    )


def key_version_tracker(changes: DataFrame) -> DataFrame:
    """changes: streaming DF with (user_id LONG, lsn LONG, op STRING).

    Emits the up-to-date per-key row-version bookkeeping every time the key
    sees traffic."""
    return changes.groupBy("user_id").applyInPandasWithState(
        _version_step,
        outputStructType=VERSION_SCHEMA,
        stateStructType=VERSION_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def _stats_step(
    key: Tuple[Any, ...],
    batches: Iterable[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    n, cents = state.get if state.exists else (0, 0)
    for pdf in batches:
        n += len(pdf)
        cents += int((pdf["value"] * 100).round().astype("int64").sum())
    state.update((n, cents))
    yield pd.DataFrame({"user_id": [key[0]], "n_events": [n], "total_cents": [cents]})


def running_value_stats(events: DataFrame) -> DataFrame:
    """events: streaming DF with (user_id LONG, value DOUBLE)."""
    return events.groupBy("user_id").applyInPandasWithState(
        _stats_step,
        outputStructType=STATS_SCHEMA,
        stateStructType=STATS_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


PATTERN_SCHEMA = (
    "user_id BIGINT, n_matches BIGINT, first_match_lsn BIGINT, matched_cents BIGINT"
)
PATTERN_STATE_SCHEMA = (
    "prev_type STRING, n_matches BIGINT, first_match_lsn BIGINT, matched_cents BIGINT"
)


def _pattern_step(
    key: Tuple[Any, ...],
    batches: Iterable[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    # prev_type carries the automaton ACROSS micro-batches: an adjacency
    # whose click arrives in batch N and purchase in batch N+1 must still
    # fire — that cross-boundary match is what distinguishes stateful CEP
    # from per-batch windowing.
    prev, n, first_lsn, cents = (
        state.get if state.exists else (None, 0, None, 0)
    )
    for pdf in batches:
        pdf = pdf.sort_values("event_id")
        types = pdf["event_type"].tolist()
        shifted = [prev] + types[:-1]
        hit = (pdf["event_type"] == "purchase") & (
            pd.Series(shifted, index=pdf.index) == "click"
        )
        if hit.any():
            n += int(hit.sum())
            batch_first = int(pdf.loc[hit, "event_id"].min())
            first_lsn = batch_first if first_lsn is None else min(first_lsn, batch_first)
            cents += int(
                (pdf.loc[hit, "value"] * 100).round().astype("int64").sum()
            )
        if types:
            prev = types[-1]
    state.update((prev, n, first_lsn, cents))
    yield pd.DataFrame(
        {
            "user_id": [key[0]],
            "n_matches": [n],
            "first_match_lsn": [first_lsn],
            "matched_cents": [cents],
        }
    )


def pattern_matcher(events: DataFrame) -> DataFrame:
    """events: streaming DF with (user_id LONG, event_id LONG,
    event_type STRING, value DOUBLE).  Emits the running click→purchase
    adjacency-match state per user on every batch the user appears in."""
    return events.groupBy("user_id").applyInPandasWithState(
        _pattern_step,
        outputStructType=PATTERN_SCHEMA,
        stateStructType=PATTERN_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
