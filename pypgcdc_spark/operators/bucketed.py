"""Bucketed co-located joins: the zero-shuffle fact⋈fact strategy.

At 100 TB the dominant join cost is moving both fact tables across the
network.  Persisting them bucketed+sorted on the join key turns every
subsequent equi-join into a sort-merge join where NEITHER side shuffles
or sorts — the scan itself satisfies the join's distribution and
ordering requirements.  The one-time bucketing cost amortizes over every
downstream join on that key (the same layout decision a warehouse makes
once per fact table).

`graph_pagerank_bucketed` (operators/graph_queries.py) applies the same
idea to iterative workloads; this module is the plain-relational
counterpart with a gate-verified oracle and a zero-exchange plan pin.

Reference parity: the reference engine (pypgcdc, a CDC client) has no
join surface at all — physical-layout strategies are part of the query
layer this engine adds (SURVEY §0).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pypgcdc_spark.operators.relational import dec, money
from pypgcdc_spark.queries import load, query

N_BUCKETS = 32

# (application id, sf_dir, table) → bucketed table name; built once per
# session per dataset, reused by every co-located join.
_BUCKETED: dict = {}


def bucketed_table(
    spark: SparkSession, sf_dir: str, table: str, key: str, cols: list
) -> str:
    """Materialize ``table`` bucketed+sorted by ``key`` (once per session
    per dataset) and return the catalog name."""
    ck = (spark.sparkContext.applicationId, sf_dir, table)
    if ck in _BUCKETED:
        return _BUCKETED[ck]
    (df,) = load(spark, sf_dir, table)
    name = f"bkt_{table}_{N_BUCKETS}_{abs(hash(sf_dir)) % 10**8}"
    (
        df.select(*cols)
        .write.bucketBy(N_BUCKETS, key)
        .sortBy(key)
        .mode("overwrite")
        .format("parquet")
        .saveAsTable(name)
    )
    _BUCKETED[ck] = name
    return name


def colocated_order_lineitem(spark: SparkSession, sf_dir: str):
    """orders ⋈ lineitem with BOTH sides bucketed on the join key —
    returns the joined DataFrame (pre-aggregation) for plan inspection."""
    lt = bucketed_table(
        spark, sf_dir, "lineitem",
        "l_orderkey", ["l_orderkey", "l_extendedprice", "l_discount"],
    )
    ot = bucketed_table(
        spark, sf_dir, "orders", "o_orderkey", ["o_orderkey", "o_orderpriority"]
    )
    li, orders = spark.table(lt), spark.table(ot)
    # merge hint: the point is the SMJ that neither shuffles nor sorts —
    # without it Spark may pick a broadcast join at test SFs and hide the
    # co-location property this operator exists to demonstrate.
    return li.join(
        orders.hint("merge"), li.l_orderkey == orders.o_orderkey
    )


@query(
    "join_bucketed_colocated",
    oracle="""
    -- The bucketed co-located join must produce EXACTLY the plain
    -- join's aggregate: physical layout is correctness-neutral, and
    -- this row keeps the zero-shuffle strategy gate-verified (the
    -- bucketing twin of join_salted_skew_equivalence).
    SELECT o_orderpriority,
           CAST(COUNT(*) AS BIGINT) AS n_lineitems,
           ROUND(SUM(CAST(l_extendedprice AS DECIMAL(18,4))
                     * (1 - CAST(l_discount AS DECIMAL(18,4)))), 2)::DOUBLE
             AS revenue
    FROM orders JOIN lineitem ON o_orderkey = l_orderkey
    GROUP BY o_orderpriority
    """,
)
def join_bucketed_colocated(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue per order priority over the bucketed orders⋈lineitem
    join.  Both sides scan bucket-aligned (no exchange, no sort — pinned
    in tests/test_plans.py); the only shuffle in the whole query is the
    final small groupBy.  At 100 TB this is the difference between
    re-shuffling two fact tables per query and reading them in place."""
    joined = colocated_order_lineitem(spark, sf_dir)
    return joined.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("n_lineitems"),
        money(F.sum(dec("l_extendedprice") * (1 - dec("l_discount")))).alias(
            "revenue"
        ),
    )
