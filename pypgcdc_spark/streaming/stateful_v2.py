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
