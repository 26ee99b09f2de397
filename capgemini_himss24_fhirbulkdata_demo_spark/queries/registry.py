"""Query registry: name -> (spark, sf_dir) -> DataFrame, plus oracle SQL.

Contract (driver, __spark_entry__.py):
- each registered query is deterministic (stable values; row order is
  hashed order-insensitively, but LIMIT/top-k queries still carry a
  total ORDER BY with key tiebreakers so the *selected set* is stable);
- every computed column is aliased identically in the Spark plan and
  the oracle SQL (the driver sorts columns by name before hashing);
- floating outputs are produced by exact decimal/integer arithmetic
  with at most one final double division + round, so Spark and DuckDB
  agree bit-for-bit (fp summation order is never observable).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, QueryFn] = {}
ORACLE_SQL: dict[str, str] = {}


def register(name: str, oracle: str | None = None) -> Callable[[QueryFn], QueryFn]:
    """Register a query; ``oracle`` is the DuckDB-ANSI-SQL twin.

    ``oracle=None`` marks a genuinely non-SQL-expressible op — the
    driver then records a weaker rows-only check.
    """

    def deco(fn: QueryFn) -> QueryFn:
        if name in QUERIES:
            raise ValueError(f"duplicate query name: {name}")
        QUERIES[name] = fn
        if oracle is not None:
            ORACLE_SQL[name] = oracle
        return fn

    return deco
