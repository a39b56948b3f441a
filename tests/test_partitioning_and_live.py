"""Skew/bucketing utilities + live-Postgres tailer structural tests."""

import json
import sys
import types

from pyspark.sql import functions as F


def test_salted_join_matches_plain_join(spark, sf_dir):
    from pypgcdc_spark.plans.partitioning import salted_join

    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").select(
        "l_orderkey", "l_partkey", "l_quantity"
    )
    part = spark.read.parquet(f"{sf_dir}/part.parquet").select(
        F.col("p_partkey").alias("l_partkey"), "p_brand"
    )
    plain = (
        li.join(part, "l_partkey")
        .groupBy("p_brand")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    salted = (
        salted_join(li, part, "l_partkey", n_salts=4)
        .groupBy("p_brand")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    assert sorted(map(tuple, plain.collect())) == sorted(map(tuple, salted.collect()))


def test_bucketed_table_join_no_shuffle(spark, sf_dir, tmp_path):
    from pypgcdc_spark.plans.inspect import shuffle_count
    from pypgcdc_spark.plans.partitioning import write_bucketed

    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    write_bucketed(orders.select("o_orderkey", "o_orderstatus"), "orders_b", "o_orderkey", 8)
    write_bucketed(li.select("l_orderkey", "l_quantity"), "lineitem_b", "l_orderkey", 8)
    j = spark.table("lineitem_b").join(
        spark.table("orders_b"),
        F.col("l_orderkey") == F.col("o_orderkey"),
    )
    # Both sides bucketed on the join key → sort-merge join with ZERO
    # exchanges (the co-located join the reference could never do).
    assert shuffle_count(j) == 0, f"bucketed join shuffled: {shuffle_count(j)}"
    assert j.count() > 0
    spark.sql("DROP TABLE IF EXISTS orders_b")
    spark.sql("DROP TABLE IF EXISTS lineitem_b")


class _FakeCursor:
    """Just enough psycopg2 replication cursor for the tailer protocol."""

    def __init__(self, messages, fail_first_start=True):
        self._messages = list(messages)
        self.fail_first_start = fail_first_start
        self.started = 0
        self.created_slot = None
        self.feedback = []

    def start_replication(self, slot_name, options, start_lsn, decode):
        import psycopg2

        self.started += 1
        if self.fail_first_start and self.started == 1:
            raise psycopg2.ProgrammingError("replication slot does not exist")

    def create_replication_slot(self, name, output_plugin):
        self.created_slot = (name, output_plugin)

    def fetchone(self):
        return ("slot", "0/1000", "snap_123", "pgoutput")

    def read_message(self):
        if self._messages:
            return self._messages.pop(0)
        raise StopIteration  # drain marker for the test

    def send_feedback(self, flush_lsn):
        self.feedback.append(flush_lsn)

    def close(self):
        pass


def test_live_tailer_slot_bootstrap_and_ack(tmp_path, monkeypatch):
    """Drive the live tailer against a faked psycopg2: missing slot →
    create (snapshot captured) → retry → messages appended to the replay
    log → ack sidecar forwarded as send_feedback (reference S1/S2/K2)."""
    fake_pg = types.ModuleType("psycopg2")

    class ProgrammingError(Exception):
        pass

    fake_pg.ProgrammingError = ProgrammingError

    class _Msg:
        def __init__(self, lsn, payload):
            self.data_start = lsn
            self.payload = payload
            from datetime import datetime, timezone

            self.send_time = datetime.now(timezone.utc)

    msgs = [_Msg(100, b"Bfake"), _Msg(110, b"Ifake"), _Msg(120, b"Cfake")]
    cursor = _FakeCursor(msgs)

    class _Conn:
        def cursor(self):
            return cursor

        def rollback(self):
            pass

        def close(self):
            pass

    fake_pg.connect = lambda dsn, connection_factory=None: _Conn()
    fake_extras = types.ModuleType("psycopg2.extras")
    fake_extras.LogicalReplicationConnection = object
    fake_pg.extras = fake_extras
    monkeypatch.setitem(sys.modules, "psycopg2", fake_pg)
    monkeypatch.setitem(sys.modules, "psycopg2.extras", fake_extras)

    # The psycopg2 backend ships as an EXAMPLE (examples/psycopg2_tailer.py)
    # — psycopg2 is absent here, so no untested code lives in the package;
    # this structural test drives the example against a faked driver.
    import importlib.util
    import os as _os

    example = _os.path.join(
        _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))),
        "examples",
        "psycopg2_tailer.py",
    )
    spec = importlib.util.spec_from_file_location("psycopg2_tailer", example)
    live = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(live)
    assert live.HAVE_PSYCOPG2

    log = str(tmp_path / "live.log")
    # Pre-write an ack sidecar: the tailer must forward it to Postgres.
    with open(log + ".ack", "w") as f:
        json.dump({"pos": 0, "lsn": 99}, f)

    tailer = live.PostgresReplicationTailer("dsn", "pub", "slot1", log)
    tailer.start()
    assert cursor.created_slot == ("slot1", "pgoutput")  # bootstrap path
    assert tailer.snapshot_name == "snap_123"  # exported snapshot captured
    assert cursor.started == 2  # failed once, retried after create

    try:
        tailer.run(max_messages=3)
    except StopIteration:
        pass
    tailer.stop()

    from pypgcdc_spark.sources.replay import scan_frames

    frames = list(scan_frames(log))
    assert [(f.lsn, f.payload) for f in frames] == [
        (100, b"Bfake"),
        (110, b"Ifake"),
        (120, b"Cfake"),
    ]
    assert 99 in cursor.feedback  # ack forwarded as send_feedback

    # Restore the real (absent) psycopg2 state for other tests.
    monkeypatch.delitem(sys.modules, "psycopg2", raising=False)
    monkeypatch.delitem(sys.modules, "psycopg2.extras", raising=False)
