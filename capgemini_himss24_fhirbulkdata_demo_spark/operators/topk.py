"""Per-group top-k (SURVEY §2B Sort/limit/top-k row)."""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def top_k_per_group(
    df: DataFrame,
    partition_by: list[str],
    order_by: list[Column | str],
    k: int,
    rank_col: str | None = None,
) -> DataFrame:
    """row_number ≤ k per partition. Catalyst rewrites this shape to
    WindowGroupLimit (per-partition partial limit before the final
    sort), so it scales without a global sort. Callers must make
    ``order_by`` a total order (tiebreakers) for determinism.
    """
    w = Window.partitionBy(*partition_by).orderBy(*order_by)
    ranked = df.withColumn("__rn", F.row_number().over(w)).filter(F.col("__rn") <= k)
    if rank_col:
        return ranked.withColumnRenamed("__rn", rank_col)
    return ranked.drop("__rn")
