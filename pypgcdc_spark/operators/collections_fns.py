"""Array / map / higher-order function families (SURVEY §2.2 scalar row).

Collection outputs are normalized to sorted joined strings before emission
so the value-hash comparison is representation-independent across engines.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from pypgcdc_spark.queries import load, query


@query(
    "scalar_array_functions",
    oracle="""
    WITH t AS (
      SELECT o_custkey,
             list_sort(list_distinct(list(o_orderstatus))) AS statuses,
             list_sort(list(o_orderkey)) AS keys
      FROM orders GROUP BY o_custkey
    )
    SELECT array_to_string(statuses, ',') AS status_set,
           len(keys) AS n_orders,
           COUNT(*) AS n_customers,
           CAST(SUM(CASE WHEN list_contains(statuses, 'P') THEN 1 ELSE 0 END) AS BIGINT) AS with_pending
    FROM t GROUP BY 1, 2
    """,
)
def scalar_array_functions(spark, sf_dir):
    """Array family: collect_list → array_distinct/sort/contains/size —
    grouped array construction plus element predicates."""
    (orders,) = load(spark, sf_dir, "orders")
    t = orders.groupBy("o_custkey").agg(
        F.array_sort(F.array_distinct(F.collect_list("o_orderstatus"))).alias("statuses"),
        F.array_sort(F.collect_list("o_orderkey")).alias("keys"),
    )
    return (
        t.select(
            F.array_join("statuses", ",").alias("status_set"),
            F.size("keys").cast("long").alias("n_orders"),
            F.array_contains("statuses", "P").alias("_p"),
        )
        .groupBy("status_set", "n_orders")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            F.sum(F.when(F.col("_p"), 1).otherwise(0)).alias("with_pending"),
        )
    )


@query(
    "scalar_map_functions",
    oracle="""
    -- Map construction + extraction: per-customer map of status->count,
    -- then lookups.  Emitted as a canonical sorted string (map column
    -- representations differ across engines; the *content* must match).
    WITH per AS (
      SELECT o_custkey, o_orderstatus, COUNT(*) AS n
      FROM orders GROUP BY o_custkey, o_orderstatus
    ), m AS (
      SELECT o_custkey,
             string_agg(o_orderstatus || ':' || n, ',' ORDER BY o_orderstatus) AS status_counts,
             MAX(CASE WHEN o_orderstatus = 'O' THEN n ELSE 0 END) AS open_orders
      FROM per GROUP BY o_custkey
    )
    SELECT status_counts, open_orders, COUNT(*) AS n_customers
    FROM m GROUP BY 1, 2
    """,
)
def scalar_map_functions(spark, sf_dir):
    """Map family: map_from_entries over grouped structs, element_at
    lookup, canonical serialization via sorted entries."""
    (orders,) = load(spark, sf_dir, "orders")
    per = orders.groupBy("o_custkey", "o_orderstatus").agg(
        F.count(F.lit(1)).alias("n")
    )
    m = per.groupBy("o_custkey").agg(
        F.map_from_entries(
            F.array_sort(F.collect_list(F.struct("o_orderstatus", "n")))
        ).alias("status_map")
    )
    entries = F.transform(
        F.map_entries("status_map"),
        lambda e: F.concat_ws(":", e["key"], e["value"].cast("string")),
    )
    return (
        m.select(
            F.array_join(entries, ",").alias("status_counts"),
            F.coalesce(F.element_at("status_map", F.lit("O")), F.lit(0)).alias(
                "open_orders"
            ),
        )
        .groupBy("status_counts", "open_orders")
        .agg(F.count(F.lit(1)).alias("n_customers"))
    )


@query(
    "higher_order_functions",
    oracle="""
    -- transform/filter/aggregate over a per-group value array: events per
    -- user, cents-transformed, error-filtered sum and max.
    WITH arr AS (
      SELECT user_id,
             list(CAST(round(value * 100) AS BIGINT) ORDER BY event_id) AS cents,
             list(event_type ORDER BY event_id) AS types
      FROM events GROUP BY user_id
    )
    SELECT user_id,
           len(cents) AS n_events,
           CAST(list_sum(list_filter(cents, (x, i) -> types[i] <> 'error')) AS BIGINT) AS non_error_cents,
           list_max(cents) AS max_cents
    FROM arr
    """,
)
def higher_order_functions(spark, sf_dir):
    """Higher-order family: transform (value→cents), lambda filter with a
    positional companion array, aggregate fold, array max."""
    (events,) = load(spark, sf_dir, "events")
    arr = events.groupBy("user_id").agg(
        F.transform(
            F.array_sort(
                F.collect_list(F.struct("event_id", "value", "event_type"))
            ),
            lambda s: F.round(s["value"] * 100).cast("long"),
        ).alias("cents"),
        F.transform(
            F.array_sort(
                F.collect_list(F.struct("event_id", "value", "event_type"))
            ),
            lambda s: s["event_type"],
        ).alias("types"),
    )
    non_error = F.aggregate(
        F.zip_with(
            "cents", "types", lambda c, t: F.when(t != "error", c).otherwise(F.lit(0))
        ),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )
    return arr.select(
        "user_id",
        F.size("cents").cast("long").alias("n_events"),
        non_error.alias("non_error_cents"),
        F.array_max("cents").alias("max_cents"),
    )


@query(
    "scalar_variant_shredding",
    oracle="""
    -- Semi-structured shredding parity: each order serializes to a JSON
    -- document (built with concat on BOTH engines so the input text is
    -- byte-identical), Spark parses it into the VARIANT type and
    -- extracts typed fields (variant_get) while DuckDB extracts with
    -- json_extract — per-status aggregates over the extracted values
    -- must hash-match.  try-variant of a missing path must be NULL.
    WITH j AS (
      SELECT '{"id":' || o_orderkey || ',"status":"' || o_orderstatus
             || '","prio":"' || o_orderpriority || '","cents":'
             || CAST(ROUND(o_totalprice * 100) AS BIGINT)
             || ',"arr":[' || o_orderkey || ',' || o_orderkey + 1 || ']}'
             AS doc
      FROM orders),
    x AS (
      SELECT CAST(json_extract_string(doc, '$.status') AS VARCHAR) AS status,
             CAST(json_extract_string(doc, '$.prio') AS VARCHAR) AS prio,
             CAST(json_extract(doc, '$.cents') AS BIGINT) AS cents,
             CAST(json_extract(doc, '$.arr[1]') AS BIGINT) AS second_arr,
             json_extract(doc, '$.missing') AS missing
      FROM j)
    SELECT status,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(SUM(cents) AS BIGINT) AS total_cents,
           CAST(COUNT(DISTINCT prio) AS BIGINT) AS n_priorities,
           CAST(SUM(second_arr) AS BIGINT) AS arr_checksum,
           CAST(SUM(CASE WHEN missing IS NULL THEN 1 ELSE 0 END) AS BIGINT)
               AS n_missing_null
    FROM x GROUP BY status
    """,
)
def scalar_variant_shredding(spark, sf_dir):
    """Spark 4 VARIANT shredding: rows serialize to JSON text (concat —
    byte-identical to the oracle's), ``parse_json`` turns them into
    VARIANT, and ``variant_get`` extracts typed scalars and array
    elements; per-status aggregates over the extracted values sit in
    the gate hash, with ``try_variant_get`` of a missing path pinned
    NULL.

    Why it matters at 100 TB: metadata/sidecar columns in training
    corpora are exactly this semi-structured shape; VARIANT keeps them
    one binary column with typed, pushdown-friendly extraction instead
    of per-query string parsing (get_json_object) — the modern
    replacement for the scalar_json_extraction path."""
    (orders,) = load(spark, sf_dir, "orders")
    doc = F.concat(
        F.lit('{"id":'), F.col("o_orderkey"),
        F.lit(',"status":"'), F.col("o_orderstatus"),
        F.lit('","prio":"'), F.col("o_orderpriority"),
        F.lit('","cents":'), F.round(F.col("o_totalprice") * 100).cast("long"),
        F.lit(',"arr":['), F.col("o_orderkey"), F.lit(","),
        (F.col("o_orderkey") + 1), F.lit("]}"),
    )
    v = orders.select(F.parse_json(doc).alias("v"))
    x = v.select(
        F.expr("variant_get(v, '$.status', 'string')").alias("status"),
        F.expr("variant_get(v, '$.prio', 'string')").alias("prio"),
        F.expr("variant_get(v, '$.cents', 'long')").alias("cents"),
        F.expr("variant_get(v, '$.arr[1]', 'long')").alias("second_arr"),
        F.expr("try_variant_get(v, '$.missing', 'long')").alias("missing"),
    )
    return x.groupBy("status").agg(
        F.count(F.lit(1)).cast("long").alias("n_orders"),
        F.sum("cents").cast("long").alias("total_cents"),
        F.countDistinct("prio").cast("long").alias("n_priorities"),
        F.sum("second_arr").cast("long").alias("arr_checksum"),
        F.sum(F.when(F.col("missing").isNull(), 1).otherwise(0))
        .cast("long")
        .alias("n_missing_null"),
    )
