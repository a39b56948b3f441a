"""Data-layout operators: partition pruning as a first-class, gate-verified
capability.

At 100 TB the single biggest lever is not touching data at all: a fact
table partitioned on its natural time key turns "scan everything, then
filter" into "list a handful of directories".  These queries materialize
the ``events`` fixture date-partitioned once per session (a pure function
of the dataset, like the chunked CDC log), then prove the two pruning
modes Spark offers:

* **static pruning** — a literal predicate on the partition column reaches
  the scan as ``PartitionFilters`` (plan-pinned), so only the matching
  directories are listed and read;
* **dynamic partition pruning (DPP)** — when the partition keys come from
  a *filtered dimension join* rather than a literal, Catalyst injects a
  ``dynamicpruningexpression`` subquery that broadcasts the dim's keys to
  the fact scan before it starts (plan-pinned).

Reference parity: the reference (pypgcdc, a CDC client) has no storage
layout layer at all; this is part of the query/storage surface the engine
adds (SURVEY §0).
"""

from __future__ import annotations

import tempfile

from pyspark.sql import functions as F

from pypgcdc_spark.queries import load, query

# (application id, sf_dir) → date-partitioned events directory.
_PARTITIONED: dict = {}


def partitioned_events_dir(spark, sf_dir) -> str:
    """events written as parquet partitioned by ``event_date`` (derived
    ``to_date(ts)``), built once per session per dataset.

    Scale note: this is the layout decision itself — one full shuffle-free
    rewrite at ingest time (dynamic partition insert), amortized over
    every later scan that prunes on the key."""
    key = (spark.sparkContext.applicationId, sf_dir)
    if key in _PARTITIONED:
        return _PARTITIONED[key]
    (events,) = load(spark, sf_dir, "events")
    base = tempfile.mkdtemp(prefix="layout_events_")
    (
        events.withColumn("event_date", F.to_date("ts"))
        .write.mode("overwrite")
        .partitionBy("event_date")
        .parquet(base)
    )
    _PARTITIONED[key] = base
    return base


def _min_event_date(spark, base) -> str:
    """First partition date, from partition metadata only (the scan lists
    directories; no row data is read for a partition-column-only min)."""
    row = spark.read.parquet(base).select(F.min("event_date").alias("d")).first()
    return row["d"].isoformat()


@query(
    "layout_partition_pruned_scan",
    oracle="""
    -- First calendar week of the event log, via the date-partitioned
    -- layout: the BETWEEN below prunes to ≤7 directories before any
    -- row is read (PartitionFilters, pinned in tests/test_plans.py).
    WITH b AS (SELECT MIN(CAST(ts AS DATE)) AS d0 FROM events)
    SELECT strftime(CAST(ts AS DATE), '%Y-%m-%d') AS event_date,
           event_type,
           COUNT(*) AS n_events,
           CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT) AS total_cents
    FROM events, b
    WHERE CAST(ts AS DATE) BETWEEN b.d0 AND b.d0 + 6
    GROUP BY 1, 2
    """,
)
def layout_partition_pruned_scan(spark, sf_dir):
    """Static partition pruning: aggregate the log's first week from the
    date-partitioned layout.  The week's bounds come from partition
    metadata (a directory listing, not a data scan) and are applied as
    literals, so the scan's ``PartitionFilters`` prunes every other
    partition — at 100 TB this reads 7 days, not the decade.

    The oracle computes the same week from the raw table, so the gate
    verifies the partitioned layout is lossless AND the pruned scan
    returns exactly the full-scan answer."""
    base = partitioned_events_dir(spark, sf_dir)
    d0 = _min_event_date(spark, base)
    df = spark.read.parquet(base)
    return (
        df.filter(
            F.col("event_date").between(F.lit(d0), F.date_add(F.lit(d0).cast("date"), 6))
        )
        .groupBy(
            F.date_format("event_date", "yyyy-MM-dd").alias("event_date"), "event_type"
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.round(F.col("value") * 100).cast("long")).cast("long").alias(
                "total_cents"
            ),
        )
    )


@query(
    "layout_dynamic_partition_pruning",
    oracle="""
    -- Every-5th-date dimension join: the fact side cannot be pruned with
    -- a literal (the dates come from a ranked dim filter), so Catalyst's
    -- DPP broadcasts the filtered dim's keys into the fact scan
    -- (dynamicpruningexpression, pinned in tests/test_plans.py).
    WITH d AS (SELECT DISTINCT CAST(ts AS DATE) AS ed FROM events),
         ranked AS (SELECT ed, ROW_NUMBER() OVER (ORDER BY ed) AS rn FROM d)
    SELECT e.event_type,
           COUNT(*) AS n_events,
           COUNT(DISTINCT CAST(e.ts AS DATE)) AS n_dates,
           CAST(SUM(CAST(ROUND(e.value * 100) AS BIGINT)) AS BIGINT) AS total_cents
    FROM events e JOIN ranked r ON CAST(e.ts AS DATE) = r.ed
    WHERE (r.rn - 1) % 5 = 0
    GROUP BY 1
    """,
)
def layout_dynamic_partition_pruning(spark, sf_dir):
    """Dynamic partition pruning: join the date-partitioned fact to a
    filtered date dimension (every 5th distinct date).  The partition
    values are only known at runtime, so Catalyst injects a DPP subquery
    that evaluates the dim first and ships its keys to the fact scan —
    the 100 TB pattern for "this quarter's fact rows for these fiscal
    periods" star joins.

    Oracle recomputes from the raw table; hash-match proves DPP is
    correctness-neutral."""
    base = partitioned_events_dir(spark, sf_dir)
    (events,) = load(spark, sf_dir, "events")
    from pyspark.sql import Window

    dim = (
        events.select(F.to_date("ts").alias("ed"))
        .distinct()
        .withColumn("rn", F.row_number().over(Window.orderBy("ed")))
        .filter((F.col("rn") - 1) % 5 == 0)
        .select("ed")
    )
    fact = spark.read.parquet(base)
    return (
        fact.join(dim.hint("broadcast"), fact.event_date == dim.ed)
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.countDistinct("event_date").alias("n_dates"),
            F.sum(F.round(F.col("value") * 100).cast("long")).cast("long").alias(
                "total_cents"
            ),
        )
    )


@query(
    "layout_zorder_skipping",
    oracle="""
    -- Z-order (Morton) vs linear layout, as exact bucket math: 16×16
    -- (orderkey, suppkey) grid, 16 "files" per layout — linear packs by
    -- orderkey bucket, z-order packs by interleaved bits.  For each
    -- layout × predicate: how many files must a reader touch?  Linear
    -- is perfect on its sort key (1) and worthless on the other (16);
    -- z-order pays √-ish on both (4/4) — the multi-dimensional
    -- data-skipping tradeoff, engine-exact.
    WITH b AS (SELECT MAX(l_orderkey) + 1 AS mo, MAX(l_suppkey) + 1 AS ms
               FROM lineitem),
    cells AS (
      SELECT CAST(l_orderkey * 16 // mo AS BIGINT) AS ob,
             CAST(l_suppkey * 16 // ms AS BIGINT) AS sb
      FROM lineitem, b),
    coded AS (
      SELECT ob, sb,
             ob AS linear_file,
             (  (ob & 1)       | ((ob & 2) << 1) | ((ob & 4) << 2) | ((ob & 8) << 3)
              | ((sb & 1) << 1) | ((sb & 2) << 2) | ((sb & 4) << 3) | ((sb & 8) << 4)
             ) // 16 AS z_file
      FROM cells)
    SELECT layout, predicate,
           CAST(files_touched AS BIGINT) AS files_touched,
           CAST(rows_matched AS BIGINT) AS rows_matched
    FROM (
      SELECT 'linear' AS layout, 'orderkey_band' AS predicate,
             COUNT(DISTINCT linear_file) AS files_touched, COUNT(*) AS rows_matched
      FROM coded WHERE ob = 3
      UNION ALL
      SELECT 'zorder', 'orderkey_band', COUNT(DISTINCT z_file), COUNT(*)
      FROM coded WHERE ob = 3
      UNION ALL
      SELECT 'linear', 'suppkey_band', COUNT(DISTINCT linear_file), COUNT(*)
      FROM coded WHERE sb = 5
      UNION ALL
      SELECT 'zorder', 'suppkey_band', COUNT(DISTINCT z_file), COUNT(*)
      FROM coded WHERE sb = 5)
    """,
)
def layout_zorder_skipping(spark, sf_dir):
    """Multi-dimensional data skipping as verifiable layout math: bucket
    lineitem into a 16×16 (orderkey, suppkey) grid, pack cells into 16
    files two ways — linear (by orderkey bucket) and Morton-interleaved
    (z-order) — and count the files a banded predicate on EITHER
    dimension must touch.  The numbers are the argument for z-ordering
    a 100 TB fact table queried on two keys: linear is 1-vs-16 files
    (perfect on one dim, full scan on the other), z-order is 4-vs-4.

    The layout is simulated in exact integer arithmetic (bucket math +
    bit interleave), so the DuckDB oracle reproduces the file counts
    bit-for-bit — the skipping claim itself is hash-gated, unlike real
    writer file boundaries which no second engine could replay."""
    (li,) = load(spark, sf_dir, "lineitem")
    b = li.agg(
        (F.max("l_orderkey") + 1).alias("mo"), (F.max("l_suppkey") + 1).alias("ms")
    )
    cells = li.join(F.broadcast(b)).select(
        F.expr("CAST(l_orderkey * 16 div mo AS BIGINT)").alias("ob"),
        F.expr("CAST(l_suppkey * 16 div ms AS BIGINT)").alias("sb"),
    )

    coded = cells.select(
        "ob",
        "sb",
        F.col("ob").alias("linear_file"),
        F.expr(
            "CAST(("
            "  (ob & 1) | shiftleft(ob & 2, 1) | shiftleft(ob & 4, 2) | shiftleft(ob & 8, 3)"
            "| shiftleft(sb & 1, 1) | shiftleft(sb & 2, 2) | shiftleft(sb & 4, 3) | shiftleft(sb & 8, 4)"
            ") div 16 AS BIGINT)"
        ).alias("z_file"),
    )

    def probe(layout, pred_name, cond, file_col):
        return (
            coded.filter(cond)
            .agg(
                F.countDistinct(file_col).cast("long").alias("files_touched"),
                F.count(F.lit(1)).cast("long").alias("rows_matched"),
            )
            .select(
                F.lit(layout).alias("layout"),
                F.lit(pred_name).alias("predicate"),
                "files_touched",
                "rows_matched",
            )
        )

    ok_band = F.col("ob") == 3
    sk_band = F.col("sb") == 5
    return (
        probe("linear", "orderkey_band", ok_band, "linear_file")
        .unionByName(probe("zorder", "orderkey_band", ok_band, "z_file"))
        .unionByName(probe("linear", "suppkey_band", sk_band, "linear_file"))
        .unionByName(probe("zorder", "suppkey_band", sk_band, "z_file"))
    )


RANGE_PARTS = 8  # target range-partition count


@query(
    "layout_range_partition_stats",
    oracle=f"""
    -- Range-partitioner boundary design for a balanced global sort:
    -- exact rank-based boundaries over the sort key (o_totalprice in
    -- integer cents, o_orderkey tiebreak) split orders into
    -- {RANGE_PARTS} ranges; per-range row counts and the max-range skew
    -- (ppm of ideal) quantify balance.  Spark's own RangePartitioner
    -- samples non-deterministically, so the gate uses the exact-rank
    -- formulation — same boundaries on any engine.
    WITH keyed AS (
      SELECT CAST(ROUND(o_totalprice * 100) AS BIGINT) AS cents, o_orderkey,
             ROW_NUMBER() OVER (ORDER BY CAST(ROUND(o_totalprice * 100) AS BIGINT),
                                         o_orderkey) AS rk,
             COUNT(*) OVER () AS n
      FROM orders),
    assigned AS (
      SELECT cents, ((rk - 1) * {RANGE_PARTS}) // n AS part, n FROM keyed)
    SELECT CAST(part AS BIGINT) AS part,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           MIN(cents) AS min_cents,
           MAX(cents) AS max_cents,
           CAST(FLOOR(1000000.0 * COUNT(*) * {RANGE_PARTS} / ANY_VALUE(n)) AS BIGINT)
               AS fill_ppm
    FROM assigned GROUP BY part
    """,
)
def layout_range_partition_stats(spark, sf_dir):
    """Range-partition boundary design — the pre-pass that makes a
    100 TB global sort balanced.  Exact rank over (sort key, tiebreak)
    assigns each row a target range; the output is per-range counts,
    key bounds, and fill ppm (1e6 = perfectly balanced).

    Scale shape: the design pass touches ONLY the 8-byte key column
    (column pruning keeps the scan narrow), so its sort shuffles ~1% of
    the row width; the subsequent full-row range exchange then lands
    near-uniform partitions.  In production Spark's RangePartitioner
    reservoir-samples for the same boundaries (non-deterministic, hence
    the exact-rank formulation inside the gate); the balance arithmetic
    this query hash-checks is identical.  Completes the layout family:
    pruning (static + DPP), z-order skipping, bucketing, and now range
    boundaries for sort."""
    from pyspark.sql import Window

    (orders,) = load(spark, sf_dir, "orders")
    cents = F.round(F.col("o_totalprice") * 100).cast("long")
    keyed = orders.select(cents.alias("cents"), "o_orderkey").select(
        "cents",
        F.row_number().over(Window.orderBy("cents", "o_orderkey")).alias("rk"),
        F.count(F.lit(1)).over(Window.partitionBy()).alias("n"),
    )
    assigned = keyed.select(
        "cents", F.expr(f"((rk - 1) * {RANGE_PARTS}) div n").alias("part"), "n"
    )
    return assigned.groupBy("part").agg(
        F.count(F.lit(1)).cast("long").alias("n_rows"),
        F.min("cents").alias("min_cents"),
        F.max("cents").alias("max_cents"),
        F.floor(
            F.lit(1000000.0) * F.count(F.lit(1)) * RANGE_PARTS / F.any_value("n")
        )
        .cast("long")
        .alias("fill_ppm"),
    )
