"""Shared helpers for the query surface."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..catalog import load_table
from .registry import register


def register_sql(name: str, sql: str, tables: tuple[str, ...]) -> None:
    """Register a query whose Spark plan IS the oracle SQL text.

    For surface rows that are natively SQL (set ops, scalar-function
    batteries) the same ANSI string runs on Spark (via temp views) and
    DuckDB — eliminating any translation gap. The string must stay in
    the ANSI intersection of the two dialects.
    """

    def fn(spark: SparkSession, sf_dir: str) -> DataFrame:
        for t in tables:
            load_table(spark, sf_dir, t).createOrReplaceTempView(t)
        return spark.sql(sql)

    fn.__name__ = name
    fn.__doc__ = f"Dual-dialect SQL query (same text on Spark and DuckDB):\n{sql}"
    register(name, oracle=sql)(fn)
