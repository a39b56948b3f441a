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


@query("approx_distinct_and_quantiles", oracle=None)
def approx_distinct_and_quantiles(spark, sf_dir):
    """Sketch aggregates: approx_count_distinct (HyperLogLog++) and
    percentile_approx (KLL-ish).  No oracle — sketch outputs are
    implementation-defined, so the driver records the rows-only check; the
    companion exact-aggregate queries (agg_distinct_suppliers, win_ntile)
    pin correctness of the exact paths."""
    (li,) = load(spark, sf_dir, "lineitem")
    # Quantiles emitted as three scalar columns (not one array column):
    # the driver's rows-only canonicalizer sorts result columns in pandas,
    # which crashes on unhashable list cells.
    return li.groupBy("l_returnflag").agg(
        F.approx_count_distinct("l_partkey").alias("approx_parts"),
        F.approx_count_distinct("l_suppkey").alias("approx_supps"),
        F.percentile_approx("l_extendedprice", 0.5, 10_000).alias("price_p50"),
        F.percentile_approx("l_extendedprice", 0.95, 10_000).alias("price_p95"),
        F.percentile_approx("l_extendedprice", 0.99, 10_000).alias("price_p99"),
    )
