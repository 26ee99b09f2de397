"""Inspect executed/optimized physical plans as text.

Works on the pre-execution plan (``explain``); AQE may re-plan at
runtime (broadcast↔SMJ switches), so assertions here are about the
*static* plan contract — the properties Catalyst guarantees from the
query shape alone.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame


def explain_str(df: DataFrame, mode: str = "formatted") -> str:
    return df._jdf.queryExecution().explainString(
        df.sparkSession._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(mode)
    )


def pushed_filters(df: DataFrame) -> list[str]:
    """All PushedFilters entries across scans (formatted mode)."""
    text = explain_str(df)
    out: list[str] = []
    for m in re.finditer(r"PushedFilters: \[([^\]]*)\]", text):
        out.extend(s.strip() for s in m.group(1).split(",") if s.strip())
    return out


def read_schemas(df: DataFrame) -> list[list[str]]:
    """Column lists of each scan's ReadSchema (pruning check)."""
    text = explain_str(df)
    out = []
    for m in re.finditer(r"ReadSchema: struct<([^>]*)>", text):
        cols = [c.split(":")[0].strip() for c in m.group(1).split(",") if c.strip()]
        out.append(cols)
    return out


def join_strategies(df: DataFrame) -> list[str]:
    text = explain_str(df, "simple")
    return re.findall(
        r"(BroadcastHashJoin|SortMergeJoin|ShuffledHashJoin|"
        r"BroadcastNestedLoopJoin|CartesianProduct)",
        text,
    )


def wholestage_codegen_count(df: DataFrame) -> int:
    """Number of distinct whole-stage-codegen spans (the ``*(n)``
    markers in simple mode / ``WholeStageCodegen (n)`` in formatted)."""
    text = explain_str(df, "simple")
    ids = set(re.findall(r"\*\((\d+)\)", text))
    ids |= set(re.findall(r"WholeStageCodegen \((\d+)\)", explain_str(df)))
    return len(ids)


def assert_no_cartesian_product(df: DataFrame) -> None:
    strategies = join_strategies(df)
    if "CartesianProduct" in strategies:
        raise AssertionError(f"plan degenerated to CartesianProduct: {strategies}")
