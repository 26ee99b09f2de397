"""Fixture-table catalog.

Loads the driver-generated TPC-H-ish parquet tables (TESTDATA.md) and
registers them as temp views, mirroring the reference's
resource-type-as-table convention (type parsed from the blob name,
``FetchBulkData/__init__.py:218``) — here the "type" is the parquet
file stem.

Scale note: ``spark.read.parquet`` gives vectorized columnar scans with
predicate pushdown + column pruning for free; at 100 TB the same call
reads a partitioned directory tree and Catalyst prunes partitions.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

# Small dimension tables that should always be broadcast when joined
# against the scaling fact tables (lineitem/orders/events scale with sf;
# these don't — SURVEY FIXTURES.md §A row counts).
BROADCAST_DIMS = frozenset({"region", "nation", "supplier", "part", "customer"})


def table_path(sf_dir: str, name: str) -> str:
    return os.path.join(sf_dir, f"{name}.parquet")


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    df = spark.read.parquet(table_path(sf_dir, name))
    return _restore_nanos_timestamps(df)


def _restore_nanos_timestamps(df: DataFrame) -> DataFrame:
    """Re-type TIMESTAMP(NANOS) columns read as epoch-nanos longs.

    The session sets ``spark.sql.legacy.parquet.nanosAsLong`` because
    Spark has no nanosecond timestamp type; here the nanos are
    truncated to microseconds (identical to DuckDB's ns→us read) and
    surfaced as TIMESTAMP_NTZ like every other fixture timestamp.
    Only the ``events.ts`` fixture column is affected.
    """
    from pyspark.sql import functions as F

    if "ts" in df.columns and dict(df.dtypes).get("ts") == "bigint":
        df = df.withColumn(
            "ts", F.timestamp_micros(F.expr("ts div 1000")).cast("timestamp_ntz")
        )
    return df


def load_all(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    """Load every fixture table and register ``<name>`` temp views."""
    out: dict[str, DataFrame] = {}
    for name in TABLES:
        p = table_path(sf_dir, name)
        if not os.path.exists(p):
            continue
        df = load_table(spark, sf_dir, name)  # incl. nanos re-typing
        df.createOrReplaceTempView(name)
        out[name] = df
    return out
