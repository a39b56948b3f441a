"""Arbitrary-state API v2 operator (transformWithStateInPandas, Spark 4).

``LatestVersionProcessor``: the streaming "deduplicating apply" — per key,
keep the highest-LSN row version ever seen in a ValueState and emit a row
only when the incoming batch actually advances it.  This turns the
at-least-once envelope stream into a change-only downstream feed:
replayed/duplicate/out-of-order events produce no output, so everything
below it is naturally idempotent.

This is the state-store-native evolution of the foreachBatch MERGE in
``cdc/apply.py``: instead of re-reading the target table per batch, the
latest version lives sharded in the state store next to its key.

Environment note: executing ``transformWithStateInPandas`` requires the
``google.protobuf`` runtime (pyspark's generated ``StateMessage_pb2``
imports it for the state-server RPC framing); this container has no
protobuf and installs are disallowed, so the v2 path is import-clean but
cannot EXECUTE here.  ``latest_version_feed_v1`` below is the
semantically identical ``applyInPandasWithState`` twin — it runs (and is
CI-tested) everywhere; ``tests/test_stateful_streaming.py`` executes the
shared scenario on v1 unconditionally and on v2 whenever protobuf exists,
asserting equal output — so the v2 operator is verified automatically the
moment the dependency appears.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming.stateful_processor import (
    StatefulProcessor,
    StatefulProcessorHandle,
)

OUTPUT_SCHEMA = "user_id BIGINT, lsn BIGINT, op STRING, value DOUBLE"
_STATE_SCHEMA = "lsn BIGINT, op STRING, value DOUBLE"


class LatestVersionProcessor(StatefulProcessor):
    def init(self, handle: StatefulProcessorHandle) -> None:
        self._latest = handle.getValueState("latest", _STATE_SCHEMA)

    def handleInputRows(self, key, rows, timerValues) -> Iterator[pd.DataFrame]:
        prev_lsn = self._latest.get()[0] if self._latest.exists() else -1
        best = None
        for pdf in rows:
            pdf = pdf.sort_values("lsn")
            cand = pdf.iloc[-1]
            if best is None or cand["lsn"] > best["lsn"]:
                best = cand
        if best is not None and int(best["lsn"]) > prev_lsn:
            self._latest.update((int(best["lsn"]), str(best["op"]), float(best["value"])))
            yield pd.DataFrame(
                {
                    "user_id": [key[0]],
                    "lsn": [int(best["lsn"])],
                    "op": [str(best["op"])],
                    "value": [float(best["value"])],
                }
            )

    def close(self) -> None:
        pass


def latest_version_feed(changes: DataFrame) -> DataFrame:
    """changes: streaming (user_id LONG, lsn LONG, op STRING, value DOUBLE).

    Emits one row per key per batch *only* when its version advanced."""
    return changes.groupBy("user_id").transformWithStateInPandas(
        statefulProcessor=LatestVersionProcessor(),
        outputStructType=OUTPUT_SCHEMA,
        outputMode="Update",
        timeMode="None",
    )


def latest_version_feed_v1(changes: DataFrame) -> DataFrame:
    """State-API-v1 twin of ``latest_version_feed`` — identical semantics
    on ``applyInPandasWithState`` (runs without protobuf).  Kept
    deliberately parallel to ``LatestVersionProcessor`` so the v1↔v2
    equivalence test compares like with like."""
    from pyspark.sql.streaming.state import GroupStateTimeout

    def fn(key, pdfs, state) -> Iterator[pd.DataFrame]:
        prev_lsn = state.get[0] if state.exists else -1
        best = None
        for pdf in pdfs:
            if not len(pdf):
                continue
            cand = pdf.sort_values("lsn").iloc[-1]
            if best is None or cand["lsn"] > best["lsn"]:
                best = cand
        if best is not None and int(best["lsn"]) > prev_lsn:
            state.update((int(best["lsn"]),))
            yield pd.DataFrame(
                {
                    "user_id": [key[0]],
                    "lsn": [int(best["lsn"])],
                    "op": [str(best["op"])],
                    "value": [float(best["value"])],
                }
            )

    return changes.groupBy("user_id").applyInPandasWithState(
        fn,
        OUTPUT_SCHEMA,
        "lsn BIGINT",
        "update",
        GroupStateTimeout.NoTimeout,
    )
