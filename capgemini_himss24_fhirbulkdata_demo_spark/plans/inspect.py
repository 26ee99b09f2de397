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


def _split_top_level(s: str, sep: str = ",") -> list[str]:
    """Split on ``sep`` only at nesting depth 0 (parens/angle brackets),
    so ``LessThanOrEqual(a,b)`` and ``struct<a:int,b:int>`` stay whole."""
    out, depth, cur = [], 0, []
    for ch in s:
        if ch in "(<[":
            depth += 1
        elif ch in ")>]":
            depth -= 1
        if ch == sep and depth == 0:
            out.append("".join(cur))
            cur = []
        else:
            cur.append(ch)
    if cur:
        out.append("".join(cur))
    return [p.strip() for p in out if p.strip()]


def pushed_filters(df: DataFrame) -> list[str]:
    """All PushedFilters entries across scans (formatted mode) —
    whole entries, comma-bearing filter arguments kept intact."""
    text = explain_str(df)
    out: list[str] = []
    for m in re.finditer(r"PushedFilters: \[([^\]]*)\]", text):
        out.extend(_split_top_level(m.group(1)))
    return out


def read_schemas(df: DataFrame) -> list[list[str]]:
    """Top-level column names of each scan's ReadSchema (pruning
    check); nested/parameterized types (decimal(p,s), struct<...>)
    don't fragment."""
    text = explain_str(df)
    out = []
    marker = "ReadSchema: struct<"
    pos = 0
    while True:
        start = text.find(marker, pos)
        if start < 0:
            break
        i = start + len(marker)
        depth = 1
        while i < len(text) and depth > 0:
            if text[i] == "<":
                depth += 1
            elif text[i] == ">":
                depth -= 1
            i += 1
        body = text[start + len(marker) : i - 1]
        cols = [c.split(":")[0].strip() for c in _split_top_level(body)]
        out.append([c for c in cols if c])
        pos = i
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
