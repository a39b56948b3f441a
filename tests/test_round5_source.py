"""Round 5: protocol v2 streamed transactions through the Spark source.

The pgcdc DataSource must produce identical envelope state from a v2
streamed log and its plain v1 twin — batch AND incremental streaming
(micro-batch offsets must never bisect an open stream span).
"""

import pytest
from pyspark.sql import functions as F

from pypgcdc_spark.sources.pgcdc import PgCdcDataSource
from pypgcdc_spark.testing import write_streamed_cdc_pair


def _rows(n=240, keys=29):
    out = []
    for i in range(n):
        uid = (i * 11) % keys
        et = "error" if i % 13 == 5 else f"ev{i % 4}"
        out.append((uid, et, float(i) * 0.75))
    return out


def _state(df):
    from pyspark.sql import Window

    w = Window.partitionBy(F.col("key")["user_id"]).orderBy(F.col("lsn").desc())
    return (
        df.withColumn("rn", F.row_number().over(w))
        .filter((F.col("rn") == 1) & (F.col("op") != "D"))
        .select(
            F.col("key")["user_id"].alias("user_id"),
            F.col("after")["last_event"].alias("last_event"),
            F.col("after")["value"].alias("value"),
        )
    )


@pytest.fixture(scope="module")
def pair(tmp_path_factory):
    d = tmp_path_factory.mktemp("pgv2")
    plain, streamed = str(d / "plain.log"), str(d / "streamed.log")
    write_streamed_cdc_pair(plain, streamed, _rows(), chunk=30)
    return plain, streamed


def test_batch_read_streamed_equals_plain(spark, pair):
    plain, streamed = pair
    spark.dataSource.register(PgCdcDataSource)
    read = lambda p: spark.read.format("pgcdc").option("path", p).load()
    sp = {tuple(r) for r in _state(read(plain)).collect()}
    ss = {tuple(r) for r in _state(read(streamed)).collect()}
    assert sp == ss and len(sp) > 0
    # the streamed log's poison rows never surface as envelope rows
    leaked = read(streamed).filter(
        F.col("after")["last_event"].startswith("poison")
    ).count()
    assert leaked == 0


def test_stream_read_streamed_log_incremental(spark, pair, tmp_path):
    """Micro-batched streaming over the v2 log (processAllAvailable — the
    Python DataSource path does not drain multi-batch under
    Trigger.AvailableNow): offsets land only on closed tx units, so the
    interleaved span arrives atomically in one batch."""
    plain, streamed = pair
    spark.dataSource.register(PgCdcDataSource)
    out_dir = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    q = (
        spark.readStream.format("pgcdc")
        .option("path", streamed)
        .option("maxTxPerBatch", 2)
        .load()
        .writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", ckpt)
        .start()
    )
    q.processAllAvailable()
    q.stop()
    got = spark.read.parquet(out_dir)
    want = spark.read.format("pgcdc").option("path", plain).load()
    ss = {tuple(r) for r in _state(got).collect()}
    sp = {tuple(r) for r in _state(want).collect()}
    assert ss == sp
    # every emitted row belongs to a committed tx (tx context always set)
    assert got.filter(F.col("tx_id").isNull()).count() == 0


def test_stream_read_two_phase_log_incremental(spark, tmp_path):
    """Micro-batched streaming over a two-phase log (maxTxPerBatch=2, so
    the five pending-window units genuinely span multiple micro-batches):
    offsets only land where no prepared transaction is pending, so each
    pending window arrives atomically and the final state equals the
    plain rendering's."""
    from pypgcdc_spark.testing import write_two_phase_cdc_pair

    plain, twophase = str(tmp_path / "p.log"), str(tmp_path / "t.log")
    write_two_phase_cdc_pair(plain, twophase, _rows(), chunk=30)
    spark.dataSource.register(PgCdcDataSource)
    out_dir, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")
    q = (
        spark.readStream.format("pgcdc")
        .option("path", twophase)
        .option("maxTxPerBatch", 2)
        .load()
        .writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", ckpt)
        .start()
    )
    q.processAllAvailable()
    q.stop()
    got = spark.read.parquet(out_dir)
    want = spark.read.format("pgcdc").option("path", plain).load()
    assert {tuple(r) for r in _state(got).collect()} == {
        tuple(r) for r in _state(want).collect()
    }
    assert got.filter(F.col("tx_id").isNull()).count() == 0
    # nothing from the rolled-back poison tx surfaced
    assert got.filter(F.col("after")["last_event"].startswith("poison")).count() == 0


def test_materialize_from_streamed_log_matches_plain(spark, pair, tmp_path):
    """The full engine path (stream -> DeleteAwareMerger current-state
    table) over a v2 streamed log equals the same path over the plain
    rendering — protocol flavor is invisible above the source."""
    from pypgcdc_spark.api import PgCdcEngine
    from pypgcdc_spark.cdc import pgoutput as pg
    from pypgcdc_spark.cdc.registry import SchemaRegistry
    from pypgcdc_spark.sources.replay import TxBoundaryScanner, scan_frames

    plain, streamed = pair
    engine = PgCdcEngine(spark)
    reg = SchemaRegistry()
    scanner = TxBoundaryScanner()
    for fr in scan_frames(streamed):
        if fr.payload[:1] == b"R":
            reg.register_relation(
                pg.decode_relation(fr.payload, streamed=scanner.in_segment), lsn=fr.lsn
            )
        scanner.feed(fr)
    schema = reg.get(17001)
    outs = {}
    for tag, log in (("plain", plain), ("streamed", streamed)):
        target = str(tmp_path / f"state_{tag}")
        engine.materialize(
            engine.stream(log, max_tx_per_batch=2),
            schema,
            target,
            checkpoint=str(tmp_path / f"ck_{tag}"),
        )
        outs[tag] = {
            (r.user_id, r.last_event, r.value)
            for r in spark.read.parquet(target).collect()
        }
    assert outs["plain"] == outs["streamed"] and len(outs["plain"]) > 0


def test_latest_offset_never_bisects_open_span(tmp_path):
    """Driver-side unit: with a stream span open at the tail, the offset
    cut stays at the span's first frame across ticks (no bisected span),
    the scan stays incremental (no rewind), and once the Stream Commit
    lands the whole span is offered."""
    from datetime import datetime, timezone

    from pypgcdc_spark.cdc import pgoutput as pg
    from pypgcdc_spark.sources.pgcdc import PgCdcStreamReader
    from pypgcdc_spark.sources.replay import ReplayLogWriter, scan_frames

    ts = datetime(2024, 1, 1, tzinfo=timezone.utc)
    R = pg.encode_relation(10, "public", "t", [(True, "k", 20, -1), (False, "v", 25, -1)])
    p = str(tmp_path / "open.log")
    w = ReplayLogWriter(p)
    w.append(1, R)
    # a closed plain tx, then an OPEN stream segment
    w.append(10, pg.encode_begin(13, ts, 41))
    w.append(11, pg.encode_insert(10, ["1", "a"]))
    w.append(13, pg.encode_commit(13, 13, ts))
    w.append(20, pg.encode_stream_start(100, True))
    w.append(21, pg.encode_insert(10, ["2", "b"], xid=100))
    w.append(22, pg.encode_stream_stop())
    w.flush()

    r = PgCdcStreamReader({"path": p})
    o1 = r.latestOffset()
    frames = list(scan_frames(p))
    span_start = next(f.start_pos for f in frames if f.payload[:1] == b"S")
    assert o1["pos"] == span_start  # the closed tx is offered, span held
    scanned_after_first = r._scanned_pos
    # second tick with nothing new: no rewind (incremental scan state)
    o2 = r.latestOffset()
    assert o2["pos"] == o1["pos"] and r._scanned_pos == scanned_after_first
    # commit lands -> the whole span is offered in one cut
    w.append(30, pg.encode_stream_commit(100, 30, 30, ts))
    w.close()
    o3 = r.latestOffset()
    import os

    assert o3["pos"] == os.path.getsize(p)
