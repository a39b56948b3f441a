"""Query registry: the declared operator inventory (SURVEY §2.2 checklist).

Every implemented operator registers here with a Spark callable and —
whenever SQL-expressible — a DuckDB oracle string over the same parquet
tables.  ``__spark_entry__.py`` exposes this registry to the driver's
correctness gate (row-count + schema + order-insensitive value-hash at
sf0.01).

Hash-stability conventions (both sides MUST follow them):

* every computed column is aliased identically in Spark and SQL;
* double aggregations go through exact ``DECIMAL(18,4)`` sums and are
  emitted as ``ROUND(x, 2)`` cast to DOUBLE — bit-identical across engines
  regardless of partitioning/summation order;
* timestamps are emitted as strings (``yyyy-MM-dd HH:mm:ss``) or extracted
  integer fields; the Spark session runs in UTC (session.py) so parquet
  timestamp semantics agree with DuckDB's naive timestamps;
* every LIMIT/top-k carries a total tiebreak order.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable, Dict, Optional

from pyspark.sql import DataFrame, SparkSession


@dataclass(frozen=True)
class QueryDef:
    name: str
    fn: Callable[[SparkSession, str], DataFrame]
    oracle: Optional[str]  # DuckDB SQL; None → driver runs rows-only check
    doc: str = ""


REGISTRY: Dict[str, QueryDef] = {}


def query(name: str, oracle: Optional[str] = None, doc: str = ""):
    """Register an operator's query callable (and its oracle)."""

    def deco(fn):
        REGISTRY[name] = QueryDef(name, fn, oracle, doc or (fn.__doc__ or "").strip())
        return fn

    return deco


TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def load(spark: SparkSession, sf_dir: str, *tables: str) -> list:
    """Load parquet fixture tables; pins the session to UTC so timestamp
    results agree with the DuckDB oracle (parquet int96/int64 instants).

    ``events.ts`` is physically TIMESTAMP(NANOS), which Spark's vectorized
    parquet reader rejects; it is read as nanos-long and truncated to
    microsecond timestamps — the same truncation DuckDB applies."""
    from pyspark.sql import functions as F

    spark.conf.set("spark.sql.session.timeZone", "UTC")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    out = []
    for t in tables:
        df = spark.read.parquet(f"{sf_dir}/{t}.parquet")
        if t == "events":
            # Integer division: ns values (~1.7e18) overflow double precision.
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
        out.append(df)
    return out


def ensure_registered() -> None:
    """Import every operator module for its registration side effects."""
    from pypgcdc_spark.operators import (  # noqa: F401
        analytic,
        cdc_queries,
        collections_fns,
        dedup,
        ml_lsh,
        multimodal,
        pipeline,
        python_exts,
        relational,
        relational2,
        similarity,
        streaming_windows,
        text,
    )
