"""Structured Streaming machinery tests: watermarks, late-data drop,
windowed/session aggregation over real streams, CDC envelope monitoring.

Driven with file/memory sources + processAllAvailable (the synchronous
local harness for streaming queries, per the public Spark testing
pattern)."""

import time
from datetime import datetime, timedelta, timezone

import pytest
from pyspark.sql import functions as F

from pypgcdc_spark.streaming.pipelines import (
    cdc_op_mix_monitor,
    dedup_stream,
    sessionized_activity,
    windowed_event_counts,
)

T0 = datetime(2024, 1, 1, 0, 0, 0)

EVENTS_DDL = "event_id LONG, ts TIMESTAMP, user_id LONG, event_type STRING, value DOUBLE"


def _write_events(spark, path, rows):
    spark.createDataFrame(rows, EVENTS_DDL).coalesce(1).write.mode("append").parquet(path)


def _drain(stream_df, sink_name, ckpt, output_mode="append"):
    q = (
        stream_df.writeStream.format("memory")
        .queryName(sink_name)
        .outputMode(output_mode)
        .option("checkpointLocation", ckpt)
        .start()
    )
    q.processAllAvailable()
    return q


def test_watermark_drops_late_data(spark, tmp_path):
    src = str(tmp_path / "events_src")
    ckpt = str(tmp_path / "ckpt")
    # Batch 1: two events in hour 0, one in hour 3 (advances watermark to 1:00).
    _write_events(
        spark,
        src,
        [
            (1, T0 + timedelta(minutes=5), 1, "click", 1.0),
            (2, T0 + timedelta(minutes=10), 1, "click", 1.0),
            (3, T0 + timedelta(hours=3), 1, "click", 1.0),
        ],
    )
    stream = spark.readStream.schema(EVENTS_DDL).parquet(src)
    q = _drain(windowed_event_counts(stream, "1 hour", "2 hours"), "wm_sink", ckpt)

    # Batch 2: an event 3h older than max seen (hour 0 window is now past
    # the watermark) must be DROPPED; a fresh event must be counted.
    _write_events(
        spark,
        src,
        [
            (4, T0 + timedelta(minutes=20), 1, "click", 1.0),  # late → dropped
            (5, T0 + timedelta(hours=4), 1, "click", 1.0),  # fresh
        ],
    )
    q.processAllAvailable()
    # Batch 3: advance watermark far enough to close & emit all windows.
    _write_events(spark, src, [(6, T0 + timedelta(hours=10), 1, "click", 1.0)])
    q.processAllAvailable()
    q.stop()

    rows = {r.window_start: r.n for r in spark.sql("SELECT * FROM wm_sink").collect()}
    # Hour-0 window: events 1,2 only — the late event 4 was dropped.
    assert rows[T0] == 2
    assert rows[T0 + timedelta(hours=3)] == 1
    assert rows[T0 + timedelta(hours=4)] == 1


def test_session_window_stream(spark, tmp_path):
    src = str(tmp_path / "sess_src")
    ckpt = str(tmp_path / "ckpt")
    _write_events(
        spark,
        src,
        [
            (1, T0, 7, "click", 1.0),
            (2, T0 + timedelta(minutes=10), 7, "click", 1.0),  # same session
            (3, T0 + timedelta(hours=2), 7, "click", 1.0),  # new session
            (4, T0 + timedelta(hours=9), 7, "click", 1.0),  # watermark push
        ],
    )
    stream = spark.readStream.schema(EVENTS_DDL).parquet(src)
    q = _drain(sessionized_activity(stream, "30 minutes", "1 hour"), "sess_sink", ckpt)
    _write_events(spark, src, [(5, T0 + timedelta(hours=20), 7, "click", 1.0)])
    q.processAllAvailable()
    q.stop()
    rows = sorted(
        (r.session_start, r.session_end, r.n_events)
        for r in spark.sql("SELECT * FROM sess_sink WHERE user_id = 7").collect()
    )
    # Session 1: events 1-2, closes 30min after the last one.
    assert rows[0] == (T0, T0 + timedelta(minutes=40), 2)
    assert rows[1] == (T0 + timedelta(hours=2), T0 + timedelta(hours=2, minutes=30), 1)


def test_streaming_dedup_bounded_state(spark, tmp_path):
    src = str(tmp_path / "dd_src")
    ckpt = str(tmp_path / "ckpt")
    _write_events(
        spark,
        src,
        [
            (1, T0, 1, "click", 1.0),
            (1, T0, 1, "click", 1.0),  # dup within batch
            (2, T0 + timedelta(minutes=1), 1, "view", 1.0),
        ],
    )
    stream = spark.readStream.schema(EVENTS_DDL).parquet(src)
    q = _drain(dedup_stream(stream, ["event_id"]), "dd_sink", ckpt)
    _write_events(spark, src, [(1, T0, 1, "click", 1.0)])  # dup across batches
    q.processAllAvailable()
    q.stop()
    assert spark.sql("SELECT COUNT(*) c FROM dd_sink").first().c == 2


def test_cdc_envelope_stream_monitor(spark, tmp_path):
    """pgcdc source → streaming op-mix monitor end-to-end."""
    from pypgcdc_spark.api import PgCdcEngine
    from pypgcdc_spark.testing import write_upsert_workload

    log = tmp_path / "mon.log"
    write_upsert_workload(str(log), n_keys=20, n_updates=60)
    engine = PgCdcEngine(spark)
    env = engine.stream(str(log))
    # update mode: a monitoring dashboard wants partial window results per
    # micro-batch (append would hold windows until the watermark passes).
    q = (
        cdc_op_mix_monitor(env, "1 minute")
        .writeStream.format("memory")
        .queryName("mon_sink")
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    q.processAllAvailable()
    q.stop()
    got = spark.sql("SELECT op, SUM(n) s FROM mon_sink GROUP BY op").collect()
    counts = {r.op: r.s for r in got}
    assert {"I", "U"}.issubset(set(counts)) and set(counts) <= {"I", "U", "D"}
    # 20 seed inserts in one tx + 60 single-event txs.
    assert sum(counts.values()) == 80


def test_ann_pandas_matches_jvm(spark, sf_dir):
    """The BLAS mapInPandas k-NN equals the JVM zip_with/aggregate k-NN."""
    from pypgcdc_spark.operators.similarity import ann_topk_bruteforce, ann_topk_pandas

    jvm = {
        (r.query_id, r.rank): (r.cand_id, r.cosine)
        for r in ann_topk_bruteforce(spark, sf_dir).collect()
    }
    pnd = {
        (r.query_id, r.rank): (r.cand_id, r.cosine)
        for r in ann_topk_pandas(spark, sf_dir).collect()
    }
    assert jvm == pnd


def test_multimodal_stub_and_features(spark, sf_dir):
    from pypgcdc_spark.operators.multimodal import (
        decode_image,
        extract_features,
        media_table,
    )

    # Round 2: PPM/BMP decode is real (see test_multimodal_codec.py);
    # compressed formats without a codec lib are a clean error.
    with pytest.raises(ValueError, match="unsupported image payload"):
        decode_image(b"\xff\xd8\xff")

    media = media_table(spark, sf_dir)
    assert dict((f.name, f.dataType.simpleString()) for f in media.schema.fields)[
        "payload"
    ] == "binary"
    feats = extract_features(media).limit(5).collect()
    assert all(len(r.content_md5) == 32 and r.n_bytes > 0 for r in feats)
