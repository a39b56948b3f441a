"""Partitioning strategies for hostile data distributions.

AQE's skew-join splitting (on in session.py) handles most skew at runtime;
these helpers cover the cases AQE can't re-plan:

* ``salted_join`` — explicit key salting for a shuffle join whose hot keys
  would overwhelm single partitions (e.g., a CDC stream where one table
  dominates, or a fact⋈fact join on a power-law key);
* ``write_bucketed`` — persist a table bucketed by its join key so later
  joins co-locate without any shuffle (the ingest-side half of
  shuffle-free pipelines).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(
    big: DataFrame,
    skewed_small: DataFrame,
    key: str,
    n_salts: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Join ``big`` to ``skewed_small`` on ``key`` with salt fan-out.

    The big side gets a random-ish but *deterministic* salt (hash of the
    whole row modulo n_salts — no rand(), so retried tasks produce the
    same rows); the small side is replicated n_salts times.  Each hot key
    now spreads over n_salts partitions.

    Use when the SMALL side fits in memory × n_salts but is too big or
    too skew-correlated to broadcast outright.
    """
    salt_col = (F.abs(F.hash(*big.columns)) % n_salts).alias("_salt")
    big_salted = big.select("*", salt_col)
    salts = skewed_small.sparkSession.range(n_salts).select(
        F.col("id").cast("int").alias("_salt")
    )
    small_replicated = skewed_small.crossJoin(salts)
    joined = big_salted.join(small_replicated, [key, "_salt"], how)
    return joined.drop("_salt")


def write_bucketed(
    df: DataFrame, table_name: str, key: str, n_buckets: int = 32
) -> None:
    """Persist as a bucketed managed table: later equi-joins/aggregations
    on ``key`` between tables bucketed the same way run shuffle-free."""
    (
        df.write.mode("overwrite")
        .bucketBy(n_buckets, key)
        .sortBy(key)
        .format("parquet")
        .saveAsTable(table_name)
    )
