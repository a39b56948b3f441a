"""Data-quality audit: the validation pass a 100 TB ingest runs before
committing a snapshot downstream — referential integrity, key
uniqueness, and null/malformed-value rates, all as one scan-shaped
query per check (anti-joins for orphans, agg-only for rates; no check
is ever quadratic).

Reference parity: the reference engine (pypgcdc, a CDC client) ships
changes without validating them; audit surfaces are part of the query
layer this engine adds (SURVEY §0).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pypgcdc_spark.queries import load, query


@query(
    "audit_data_quality",
    oracle="""
    -- One row per integrity check: orphaned/childless foreign keys,
    -- primary-key duplication, and null/invalid value rates.  Every
    -- check is a single scan or anti-join — the audit must not cost
    -- more than the pipeline it protects.
    WITH checks AS (
      SELECT 'lineitem_orphan_orderkey' AS check_name,
             (SELECT COUNT(*) FROM lineitem l
              WHERE NOT EXISTS (SELECT 1 FROM orders o
                                WHERE o.o_orderkey = l.l_orderkey)) AS n_violations,
             (SELECT COUNT(*) FROM lineitem) AS n_total
      UNION ALL
      SELECT 'orders_childless',
             (SELECT COUNT(*) FROM orders o
              WHERE NOT EXISTS (SELECT 1 FROM lineitem l
                                WHERE l.l_orderkey = o.o_orderkey)),
             (SELECT COUNT(*) FROM orders)
      UNION ALL
      SELECT 'orders_orphan_custkey',
             (SELECT COUNT(*) FROM orders o
              WHERE NOT EXISTS (SELECT 1 FROM customer c
                                WHERE c.c_custkey = o.o_custkey)),
             (SELECT COUNT(*) FROM orders)
      UNION ALL
      SELECT 'orders_pkey_duplicates',
             (SELECT COUNT(*) - COUNT(DISTINCT o_orderkey) FROM orders),
             (SELECT COUNT(*) FROM orders)
      UNION ALL
      SELECT 'documents_empty_text',
             (SELECT COUNT(*) FROM documents
              WHERE text IS NULL OR length(text) = 0),
             (SELECT COUNT(*) FROM documents)
      UNION ALL
      SELECT 'events_nonpositive_value',
             (SELECT COUNT(*) FROM events WHERE value IS NULL OR value <= 0),
             (SELECT COUNT(*) FROM events)
    )
    SELECT check_name,
           CAST(n_violations AS BIGINT) AS n_violations,
           CAST(n_total AS BIGINT) AS n_total,
           ROUND(n_violations / n_total, 6) AS violation_rate
    FROM checks
    """,
)
def audit_data_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Integrity dashboard: orphaned foreign keys (left-anti joins —
    broadcastable key sides at any scale since only the KEY column
    ships), primary-key duplication (count vs distinct in one agg), and
    null/invalid value rates (map-only filters).

    Scale: each check is one pass over one table; the anti-joins shuffle
    only join keys.  Run it as the gate between ingest and publish."""
    lineitem, orders, customer, documents, events = load(
        spark, sf_dir, "lineitem", "orders", "customer", "documents", "events"
    )

    li_orphan = lineitem.select("l_orderkey").join(
        orders.select("o_orderkey"),
        lineitem.l_orderkey == orders.o_orderkey,
        "left_anti",
    )
    o_childless = orders.select("o_orderkey").join(
        lineitem.select("l_orderkey"),
        orders.o_orderkey == lineitem.l_orderkey,
        "left_anti",
    )
    o_orphan_cust = orders.select("o_custkey").join(
        customer.select("c_custkey"),
        orders.o_custkey == customer.c_custkey,
        "left_anti",
    )

    # The ten counts are independent single-pass jobs; running them
    # sequentially leaves the cluster idle through each job's tail
    # (guide §2.6 — overlap independent jobs from a small thread pool so
    # the next job's tasks back-fill freed executors).  Each count is
    # still exactly the same job; only the driver-side sequencing
    # changed.  Measured r12 (ab_one, min-of-4): 2.19 -> 1.26 s.
    from concurrent.futures import ThreadPoolExecutor

    counts = {
        "n_li": lineitem.count,
        "n_o": orders.count,
        "n_d": documents.count,
        "n_e": events.count,
        "li_orphan": li_orphan.count,
        "o_childless": o_childless.count,
        "o_orphan_cust": o_orphan_cust.count,
        "o_distinct": orders.select("o_orderkey").distinct().count,
        "d_empty": documents.filter(
            F.col("text").isNull() | (F.length("text") == 0)
        ).count,
        "e_nonpos": events.filter(
            F.col("value").isNull() | (F.col("value") <= 0)
        ).count,
    }
    with ThreadPoolExecutor(max_workers=4) as pool:
        futs = {k: pool.submit(fn) for k, fn in counts.items()}
        c = {k: f.result() for k, f in futs.items()}

    rows = [
        ("lineitem_orphan_orderkey", c["li_orphan"], c["n_li"]),
        ("orders_childless", c["o_childless"], c["n_o"]),
        ("orders_orphan_custkey", c["o_orphan_cust"], c["n_o"]),
        ("orders_pkey_duplicates", c["n_o"] - c["o_distinct"], c["n_o"]),
        ("documents_empty_text", c["d_empty"], c["n_d"]),
        ("events_nonpositive_value", c["e_nonpos"], c["n_e"]),
    ]
    out = spark.createDataFrame(
        [(n, int(v), int(t)) for n, v, t in rows],
        "check_name STRING, n_violations LONG, n_total LONG",
    )
    return out.select(
        "check_name",
        "n_violations",
        "n_total",
        F.round(F.col("n_violations") / F.col("n_total"), 6).alias("violation_rate"),
    )


_PROFILE_COLS = [
    "o_orderkey",
    "o_custkey",
    "o_orderstatus",
    "o_totalprice",
    "o_orderpriority",
]


def _profile_sql_branch(col: str) -> str:
    return f"""
    SELECT '{col}' AS column_name,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(SUM(CASE WHEN {col} IS NULL THEN 1 ELSE 0 END) AS BIGINT)
               AS n_nulls,
           CAST(COUNT(DISTINCT {col}) AS BIGINT) AS n_distinct,
           CAST(MIN({col}) AS VARCHAR) AS min_value,
           CAST(MAX({col}) AS VARCHAR) AS max_value
    FROM orders"""


@query(
    "audit_column_profile",
    oracle="\n    UNION ALL".join(_profile_sql_branch(c) for c in _PROFILE_COLS),
)
def audit_column_profile(spark, sf_dir):
    """Generic column profiler — the first pass a data platform runs on
    any new table: per column, row count, null count, distinct count,
    and min/max (stringified so one schema fits every type).  The
    profile itself sits inside the correctness gate.

    Spark shape: ONE storage scan — the narrow projection materializes
    once (localCheckpoint, columnar blocks; MLlib's iterative-input
    discipline), then each column profiles independently off those
    blocks as a two-level aggregation: groupBy(value) with map-side
    partial counts (the shuffle carries only (distinct value, count)
    pairs per column), folded into one row.  Min/max stay TYPED through
    the aggregation (numeric columns order numerically — the r4 ADVICE
    finding that rules out a stringified unpivot) and stringify only at
    output.  This replaced the r4-r11 single multi-distinct aggregate:
    Catalyst plans that via Expand — every row duplicated k+1 times
    before the partial agg — which measured 2.9 s vs 0.8 s here and
    ships (k+1)x the rows into the first exchange at any scale; the
    per-column plan reads storage once either way and its k passes run
    over checkpointed local blocks as independent stages of one job."""
    (orders,) = load(spark, sf_dir, "orders")
    narrow = orders.select(*_PROFILE_COLS).localCheckpoint(eager=True)
    parts = []
    for c in _PROFILE_COLS:
        per_value = narrow.groupBy(F.col(c).alias("val")).agg(
            F.count(F.lit(1)).alias("n")
        )
        parts.append(
            per_value.agg(
                F.lit(c).alias("column_name"),
                F.sum("n").cast("long").alias("n_rows"),
                F.sum(F.when(F.col("val").isNull(), F.col("n")).otherwise(0))
                .cast("long")
                .alias("n_nulls"),
                # count(val) over one-row-per-distinct-value skips NULL —
                # exactly COUNT(DISTINCT col)'s null semantics.
                F.count(F.col("val")).cast("long").alias("n_distinct"),
                F.min("val").cast("string").alias("min_value"),
                F.max("val").cast("string").alias("max_value"),
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out
