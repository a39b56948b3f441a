"""Structured Streaming pipeline builders.

The streaming-specific machinery the batch-mode oracle can't check:
watermarks + late-data drop, windowed aggregation in append mode, session
windows over a stream, and the CDC envelope stream → windowed op-mix
monitor.  Tests drive these with file sources + ``processAllAvailable``.

Design: each builder takes an input *streaming* DataFrame and returns the
transformed streaming DataFrame — callers own source/sink/trigger so the
same logic runs against a parquet directory locally and Kafka/pgcdc in
production.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def windowed_event_counts(
    events: DataFrame,
    window: str = "1 hour",
    watermark: str = "2 hours",
    slide: str | None = None,
) -> DataFrame:
    """Tumbling/sliding event-time aggregation with a watermark.

    Late rows beyond the watermark are dropped by the state store —
    exactly-once aggregate state under replay (the streaming analog of the
    batch `stream_tumbling_window` oracle query)."""
    win = F.window("ts", window, slide) if slide else F.window("ts", window)
    return (
        events.withWatermark("ts", watermark)
        .groupBy(win, "event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("value").cast("decimal(18,4)")).alias("total_value"),
        )
        .select(
            F.col("window.start").alias("window_start"),
            F.col("window.end").alias("window_end"),
            "event_type",
            "n",
            F.col("total_value").cast("double").alias("total_value"),
        )
    )


def sessionized_activity(
    events: DataFrame, gap: str = "30 minutes", watermark: str = "2 hours"
) -> DataFrame:
    """Session windows over a stream (stateful merge of overlapping
    sessions in the state store)."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy("user_id", F.session_window("ts", gap))
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            "user_id",
            F.col("session_window.start").alias("session_start"),
            F.col("session_window.end").alias("session_end"),
            "n_events",
        )
    )


def cdc_op_mix_monitor(env_stream: DataFrame, window: str = "1 minute") -> DataFrame:
    """Windowed op-mix over a pgcdc envelope stream (I/U/D/T rates by
    table) — the operational dashboard query for a CDC deployment."""
    return (
        env_stream.withWatermark("commit_ts", "5 minutes")
        .groupBy(F.window("commit_ts", window), "table", "op")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            F.col("window.start").alias("window_start"), "table", "op", "n"
        )
    )


def dedup_stream(events: DataFrame, keys: list, watermark: str = "1 hour") -> DataFrame:
    """Streaming exact dedup within the watermark horizon
    (``dropDuplicates`` keeps per-key state until the watermark passes —
    bounded state, the scalable way to dedup an unbounded stream)."""
    return events.withWatermark("ts", watermark).dropDuplicates(keys)
