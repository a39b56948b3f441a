"""Physical-plan inspection utilities.

Perf-by-construction guardrails: tests assert that headline queries keep
the physical properties that matter at 100 TB — filters reach the parquet
scan, column pruning holds, dimensions broadcast, whole-stage codegen
covers the hot path.  A plan regression fails CI long before it burns a
cluster.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame


def plan_text(df: DataFrame, mode: str = "formatted") -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(  # noqa: SLF001
        df._jdf.queryExecution(), mode
    )


def pushed_filters(df: DataFrame) -> list:
    """PushedFilters entries of every parquet scan in the plan."""
    txt = plan_text(df)
    return re.findall(r"PushedFilters: \[([^\]]*)\]", txt)


def read_schemas(df: DataFrame) -> list:
    """ReadSchema of every scan (column-pruning evidence)."""
    return re.findall(r"ReadSchema: struct<([^>]*)>", plan_text(df))


def count_op(df: DataFrame, op: str) -> int:
    """Count operator instances. Formatted mode prints each operator twice
    (tree + detail section); count the '(n) Op' detail headers, falling
    back to raw word count for plans without detail sections."""
    txt = plan_text(df)
    headers = re.findall(rf"\(\d+\) {re.escape(op)}\b", txt)
    if headers:
        return len(headers)
    return len(re.findall(rf"\b{re.escape(op)}\b", txt))


def has_broadcast_join(df: DataFrame) -> bool:
    return count_op(df, "BroadcastHashJoin") > 0 or count_op(df, "BroadcastNestedLoopJoin") > 0


def shuffle_count(df: DataFrame) -> int:
    """Number of exchanges in the plan (each is a full shuffle at scale)."""
    return count_op(df, "Exchange")


def codegen_stage_count(df: DataFrame) -> int:
    """Number of whole-stage-codegen subtrees (AQE hides them in the
    formatted plan pre-execution, so ask the codegen explain mode)."""
    m = re.search(r"Found (\d+) WholeStageCodegen subtrees", plan_text(df, "codegen"))
    if m:
        return int(m.group(1))
    return len(set(re.findall(r"WholeStageCodegen \((\d+)\)", plan_text(df))))


def assert_scan_pruned(df: DataFrame, must_not_read: list) -> None:
    """Fail if any scan reads a column the query doesn't need."""
    for schema in read_schemas(df):
        for col in must_not_read:
            assert f"{col}:" not in schema, (
                f"column {col} not pruned from scan: struct<{schema}>"
            )
