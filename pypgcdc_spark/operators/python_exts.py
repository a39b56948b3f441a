"""Python-extension operator surface: UDTF, grouped UDAF (applyInPandas),
vectorized scalar Pandas UDF, unpivot, and approximate aggregates —
the engine's user-extensibility story (the reference's only extension point
is the ``DataStore`` sink contract, ``stores.py:43-54``; ours is the full
Spark UDF/UDAF/UDTF family).

Python rows are the slow path, so every entry here is either (a) bounded to
a demonstration subset, or (b) Arrow-vectorized.  Determinism vs the oracle
comes from integer (cent) arithmetic — no float accumulation in Python.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

from pypgcdc_spark.queries import load, query


@query(
    "udtf_shingle_expand",
    oracle="""
    WITH words AS (SELECT doc_id, string_split(lower(text), ' ') AS w
                   FROM documents WHERE doc_id < 50),
    sh AS (SELECT DISTINCT doc_id, w[i+1] || ' ' || w[i+2] || ' ' || w[i+3] AS shingle
           FROM words, unnest(range(len(w) - 2)) AS t(i) WHERE len(w) >= 3)
    SELECT doc_id, COUNT(*) AS n_shingles FROM sh GROUP BY doc_id
    """,
)
def udtf_shingle_expand(spark, sf_dir):
    """Python UDTF (Spark 4 table function): one input row → N shingle
    rows, consumed via LATERAL join.  Bounded to 50 docs — the UDTF is the
    API demonstration; the production shingler is the built-in-function
    version in dedup.py."""
    from pyspark.sql.functions import udtf

    @udtf(returnType="out_doc_id bigint, shingle string")
    class ShingleExpand:
        def eval(self, doc_id: int, text: str):
            words = text.lower().split(" ")
            if len(words) < 3:
                return
            seen = set()
            for i in range(len(words) - 2):
                s = " ".join(words[i : i + 3])
                if s not in seen:
                    seen.add(s)
                    yield (doc_id, s)

    spark.udtf.register("shingle_expand", ShingleExpand)
    (docs,) = load(spark, sf_dir, "documents")
    docs.filter(F.col("doc_id") < 50).createOrReplaceTempView("docs_for_udtf")
    return spark.sql(
        """
        SELECT out_doc_id AS doc_id, COUNT(*) AS n_shingles
        FROM docs_for_udtf, LATERAL shingle_expand(doc_id, text)
        GROUP BY out_doc_id
        """
    )


@query(
    "udaf_segment_balance_stats",
    oracle="""
    SELECT c_mktsegment,
           COUNT(*) AS n_customers,
           CAST(SUM(CAST(round(c_acctbal * 100) AS BIGINT)) AS BIGINT) AS total_cents,
           MAX(CAST(round(c_acctbal * 100) AS BIGINT)) AS max_cents
    FROM customer GROUP BY c_mktsegment
    """,
)
def udaf_segment_stats(spark, sf_dir):
    """Custom UDAF via applyInPandas (grouped map): per-segment account
    stats computed in integer cents inside pandas — exact, so the oracle
    matches bit-for-bit.  The Arrow group-map is the pattern for any UDAF
    whose logic outgrows built-in aggregates."""
    (cust,) = load(spark, sf_dir, "customer")

    def stats(pdf: pd.DataFrame) -> pd.DataFrame:
        cents = (pdf["c_acctbal"] * 100).round().astype("int64")
        return pd.DataFrame(
            {
                "c_mktsegment": [pdf["c_mktsegment"].iloc[0]],
                "n_customers": [len(pdf)],
                "total_cents": [int(cents.sum())],
                "max_cents": [int(cents.max())],
            }
        )

    return cust.groupBy("c_mktsegment").applyInPandas(
        stats,
        "c_mktsegment string, n_customers bigint, total_cents bigint, max_cents bigint",
    )


@query(
    "pandas_udf_value_cents",
    oracle="""
    SELECT event_type,
           CAST(SUM(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS total_cents
    FROM events GROUP BY event_type
    """,
)
def pandas_udf_value_cents(spark, sf_dir):
    """Vectorized scalar Pandas UDF (Arrow batches, numpy kernel) feeding a
    built-in aggregation — the documented shape for custom scalar logic:
    Python computes per-batch vectors, Catalyst owns the aggregation."""

    @pandas_udf("long")
    def to_cents(v: pd.Series) -> pd.Series:
        return (v * 100).round().astype("int64")

    (events,) = load(spark, sf_dir, "events")
    return (
        events.select("event_type", to_cents("value").alias("cents"))
        .groupBy("event_type")
        .agg(F.sum("cents").alias("total_cents"))
    )


@query(
    "unpivot_price_measures",
    oracle="""
    SELECT l_returnflag, 'extended' AS measure,
           ROUND(SUM(CAST(l_extendedprice AS DECIMAL(18,4))), 2)::DOUBLE AS total
    FROM lineitem GROUP BY l_returnflag
    UNION ALL
    SELECT l_returnflag, 'discounted' AS measure,
           ROUND(SUM(CAST(l_extendedprice AS DECIMAL(18,4))
                 * CAST(1 - CAST(l_discount AS DECIMAL(18,4)) AS DECIMAL(18,4))), 2)::DOUBLE AS total
    FROM lineitem GROUP BY l_returnflag
    """,
)
def unpivot_price_measures(spark, sf_dir):
    """Unpivot (stack): wide measures → long (measure, value) rows, then
    aggregate — the melt shape for metric tables."""
    from pypgcdc_spark.operators.relational import dec, money

    (li,) = load(spark, sf_dir, "lineitem")
    disc_factor = (F.lit(1) - dec("l_discount")).cast("decimal(18,4)")
    wide = li.select(
        "l_returnflag",
        dec("l_extendedprice").alias("extended"),
        (dec("l_extendedprice") * disc_factor).alias("discounted"),
    )
    long = wide.selectExpr(
        "l_returnflag",
        "stack(2, 'extended', CAST(extended AS DECIMAL(38,8)), "
        "'discounted', CAST(discounted AS DECIMAL(38,8))) AS (measure, value)",
    )
    return (
        long.groupBy("l_returnflag", "measure")
        .agg(money(F.sum("value")).alias("total"))
    )


@query(
    "approx_distinct_and_quantiles",
    oracle="""
    SELECT l_returnflag,
           COUNT(DISTINCT l_partkey) AS exact_parts,
           COUNT(DISTINCT l_suppkey) AS exact_supps,
           CAST(1 AS BIGINT) AS parts_within_5pct,
           CAST(1 AS BIGINT) AS supps_within_5pct,
           CAST(1 AS BIGINT) AS p50_within_5pct,
           CAST(1 AS BIGINT) AS p95_within_5pct,
           CAST(1 AS BIGINT) AS p99_within_5pct
    FROM lineitem GROUP BY l_returnflag
    """,
)
def approx_distinct_and_quantiles(spark, sf_dir):
    """Sketch aggregates: approx_count_distinct (HyperLogLog++, rsd=1%) and
    percentile_approx (GK sketch, accuracy 10k) — made oracle-checkable by
    a derived contract: emit the EXACT distinct counts (DuckDB-reproducible)
    plus booleans-as-ints asserting each sketch lands within 5% of the exact
    answer.  The oracle asserts the exact counts and literal 1s; a sketch
    drifting past 5% therefore fails the hash gate.  Sketch error budget:
    HLL++ rsd 0.01 gives ~3σ ≪ 5%; GK rank error n/10_000 maps to ≪ 5%
    value error on this price distribution.

    Scalar columns only — the driver's canonicalizer cannot hash arrays."""
    (li,) = load(spark, sf_dir, "lineitem")

    def within(approx, exact):
        return (
            F.when(F.abs(approx - exact) * 20 <= exact, F.lit(1))
            .otherwise(F.lit(0))
            .cast("bigint")
        )

    # Three aggregations, not one (guide §2.3): the single agg mixed two
    # DISTINCT columns (planning an Expand that tripled every lineitem
    # row) with the rsd=1% HLL++ registers AND six TypedImperative
    # percentile buffers, every buffer consuming the multiplied stream —
    # measured 40.8 s warm at sf0.1.  Profiled per family (min-of-3,
    # same host window): exact distincts alone 0.39 s, HLL++ pair alone
    # 1.48 s, exact+approx distincts COMBINED 6.36 s (the wide HLL
    # buffers under the distinct Expand are the superlinear term), exact
    # percentile 1.03 s, approx percentile 0.42 s.  So: each family
    # aggregates separately (the Expand now multiplies only the cheap
    # count buffers), and each percentile family computes ONE buffer
    # over an array of quantiles instead of three (identical values —
    # the same algorithm evaluates the same rank list).  The joins are
    # 3 rows (one per returnflag), broadcast.  Measured 40.8 -> 3.0 s
    # warm; hash-identical at sf0.001 AND sf0.01.
    exacts = li.groupBy("l_returnflag").agg(
        F.countDistinct("l_partkey").alias("exact_parts"),
        F.countDistinct("l_suppkey").alias("exact_supps"),
    )
    approxes = li.groupBy("l_returnflag").agg(
        F.approx_count_distinct("l_partkey", 0.01).alias("approx_parts"),
        F.approx_count_distinct("l_suppkey", 0.01).alias("approx_supps"),
    )
    pcts = li.groupBy("l_returnflag").agg(
        F.expr(
            "percentile(l_extendedprice, array(0.5, 0.95, 0.99))"
        ).alias("exact_p"),
        F.expr(
            "percentile_approx(l_extendedprice, array(0.5, 0.95, 0.99), 10000)"
        ).alias("apx_p"),
    )
    agg = (
        exacts.join(F.broadcast(approxes), "l_returnflag")
        .join(F.broadcast(pcts), "l_returnflag")
    ).select(
        "l_returnflag",
        "exact_parts",
        "exact_supps",
        "approx_parts",
        "approx_supps",
        F.col("exact_p")[0].alias("exact_p50"),
        F.col("exact_p")[1].alias("exact_p95"),
        F.col("exact_p")[2].alias("exact_p99"),
        F.col("apx_p")[0].alias("apx_p50"),
        F.col("apx_p")[1].alias("apx_p95"),
        F.col("apx_p")[2].alias("apx_p99"),
    )
    return agg.select(
        "l_returnflag",
        "exact_parts",
        "exact_supps",
        within(F.col("approx_parts"), F.col("exact_parts")).alias("parts_within_5pct"),
        within(F.col("approx_supps"), F.col("exact_supps")).alias("supps_within_5pct"),
        within(F.col("apx_p50"), F.col("exact_p50")).alias("p50_within_5pct"),
        within(F.col("apx_p95"), F.col("exact_p95")).alias("p95_within_5pct"),
        within(F.col("apx_p99"), F.col("exact_p99")).alias("p99_within_5pct"),
    )


@query(
    "udtf_polymorphic_parse",
    oracle="""
    -- The polymorphic UDTF parses 'key,status,cents' lines into columns
    -- NAMED BY ITS HEADER ARGUMENT at analyze time; the downstream
    -- aggregate over the parsed columns must match parsing the same
    -- lines with plain string_split.
    WITH lines AS (
      SELECT o_orderkey || ',' || o_orderstatus || ','
             || CAST(ROUND(o_totalprice * 100) AS BIGINT) AS line
      FROM orders),
    parsed AS (
      SELECT string_split(line, ',')[1] AS okey,
             string_split(line, ',')[2] AS status,
             string_split(line, ',')[3] AS cents
      FROM lines)
    SELECT status,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(SUM(CAST(cents AS BIGINT)) AS BIGINT) AS total_cents,
           CAST(SUM(CAST(okey AS BIGINT)) AS BIGINT) AS key_checksum
    FROM parsed GROUP BY status
    """,
)
def udtf_polymorphic_parse(spark, sf_dir):
    """Spark 4 polymorphic Python UDTF: ``analyze()`` computes the
    output schema FROM the header argument ('okey,status,cents' → three
    string columns), so one table function parses any delimited layout
    without a hand-declared schema per shape.  The registered aggregate
    over the parsed columns hash-matches a plain string-split oracle.

    Scale honesty: a per-row Python UDTF is the slow path — this row
    exists for front-end/API parity (schema-from-arguments), and the
    equivalent hot-path parse is the JVM split the oracle uses;
    at 100 TB you run the UDTF only where the schema genuinely varies
    per call site."""
    from pyspark.sql.functions import udtf
    from pyspark.sql.types import StructType
    from pyspark.sql.udtf import AnalyzeArgument, AnalyzeResult

    # Pickle serialization deliberately: useArrow=True was A/B'd r12 and
    # is ~9x SLOWER here (min 27.5 s vs 3.2 s at sf0.1) — the Arrow UDTF
    # path's per-call batching overhead dwarfs pickle for one-row yields
    # of three short strings.  eval stays per-row either way (inherent to
    # a UDTF; this row exists for schema-from-arguments API parity).
    @udtf
    class ParseDelimited:
        @staticmethod
        def analyze(header: AnalyzeArgument, line: AnalyzeArgument) -> AnalyzeResult:
            st = StructType()
            for name in header.value.split(","):
                st = st.add(name, "string")
            return AnalyzeResult(schema=st)

        def eval(self, header: str, line: str):
            yield tuple(line.split(","))

    spark.udtf.register("parse_delimited", ParseDelimited)
    (orders,) = load(spark, sf_dir, "orders")
    orders.select(
        F.concat(
            F.col("o_orderkey"),
            F.lit(","),
            F.col("o_orderstatus"),
            F.lit(","),
            F.round(F.col("o_totalprice") * 100).cast("long"),
        ).alias("line")
    ).createOrReplaceTempView("order_lines")
    parsed = spark.sql(
        "SELECT p.* FROM order_lines, "
        "LATERAL parse_delimited('okey,status,cents', order_lines.line) p"
    )
    return parsed.groupBy("status").agg(
        F.count(F.lit(1)).cast("long").alias("n_orders"),
        F.sum(F.col("cents").cast("long")).cast("long").alias("total_cents"),
        F.sum(F.col("okey").cast("long")).cast("long").alias("key_checksum"),
    )
