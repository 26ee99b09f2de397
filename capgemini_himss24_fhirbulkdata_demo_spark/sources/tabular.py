"""Tabular sources/sinks: CSV, text, Parquet with partitioning and
bucketing (SURVEY §2B Scans/Sinks rows).

Bucketing is the engine's co-located-join story (SURVEY brief
"bucketing for co-located joins"): writing both sides of a hot join
bucketed by the join key lets the planner drop BOTH shuffle exchanges
— at 100 TB that turns the nightly fact↔fact join into a local zip.
Verified by plan assertion in tests/test_tabular.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType


def read_csv(
    spark: SparkSession,
    path: str,
    schema: StructType | str | None = None,
    header: bool = True,
    sep: str = ",",
) -> DataFrame:
    """CSV scan; schema'd reads skip inference (never infer in prod —
    an extra full pass at 100 TB)."""
    reader = spark.read.option("header", header).option("sep", sep)
    if schema is not None:
        reader = reader.schema(schema)
    else:
        reader = reader.option("inferSchema", True)
    return reader.csv(path)


def write_csv(df: DataFrame, path: str, header: bool = True, mode: str = "overwrite") -> None:
    df.write.option("header", header).mode(mode).csv(path)


def read_text(spark: SparkSession, path: str) -> DataFrame:
    """Raw line scan (``value STRING``) — the escape hatch under
    spark.read.json (SURVEY §2A T1 explicit form)."""
    return spark.read.text(path)


def write_parquet(
    df: DataFrame,
    path: str,
    mode: str = "overwrite",
    partition_by: list[str] | None = None,
) -> None:
    """Parquet sink; ``partition_by`` produces the directory layout
    partition pruning reads back (verified in tests)."""
    w = df.write.mode(mode)
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.parquet(path)


def read_orc(spark: SparkSession, path: str) -> DataFrame:
    """ORC scan (built into Spark; same pushdown/pruning contract as
    parquet — both are columnar with predicate-capable readers)."""
    return spark.read.orc(path)


def write_orc(
    df: DataFrame,
    path: str,
    mode: str = "overwrite",
    partition_by: list[str] | None = None,
) -> None:
    w = df.write.mode(mode)
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.orc(path)


def delta_available() -> bool:
    """True when the delta-spark package is importable (the container
    this engine develops in does not ship it; any real deployment
    would — BASELINE's Spark approach names Parquet/Delta)."""
    try:
        import delta  # noqa: F401

        return True
    except ImportError:
        return False


def _require_delta() -> None:
    if not delta_available():
        raise ImportError(
            "Delta Lake support requires the delta-spark package "
            "(pip install delta-spark) and a session built with "
            "delta.configure_spark_with_delta_pip"
        )


def read_delta(spark: SparkSession, path: str, version: int | None = None) -> DataFrame:
    """Delta scan (optionally time-traveled to ``version``). Same
    predicate-pushdown/column-pruning behavior as the parquet scan —
    Delta is parquet + a transaction log."""
    _require_delta()
    reader = spark.read.format("delta")
    if version is not None:
        reader = reader.option("versionAsOf", version)
    return reader.load(path)


def write_delta(
    df: DataFrame,
    path: str,
    mode: str = "overwrite",
    partition_by: list[str] | None = None,
) -> None:
    """Delta sink; ACID append/overwrite with the same partition
    layout contract as ``write_parquet``."""
    _require_delta()
    w = df.write.format("delta").mode(mode)
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.save(path)


def write_bucketed_table(
    df: DataFrame,
    table: str,
    bucket_col: str,
    n_buckets: int = 8,
    sort_col: str | None = None,
    mode: str = "overwrite",
) -> None:
    """Persist as a bucketed (+optionally sorted) managed table.

    Joins between two tables bucketed identically on the join key are
    planned with zero Exchange on either side (SortMergeJoin over
    pre-bucketed scans).
    """
    w = df.write.mode(mode).bucketBy(n_buckets, bucket_col)
    if sort_col:
        w = w.sortBy(sort_col)
    w.saveAsTable(table)


def read_xml(
    spark: SparkSession,
    path: str,
    row_tag: str = "row",
    schema: StructType | str | None = None,
) -> DataFrame:
    """XML scan (built into Spark 4 — the former spark-xml package).
    ``row_tag`` names the repeated element that becomes one row.
    Schema'd reads skip inference, same contract as ``read_csv``.
    """
    reader = spark.read.format("xml").option("rowTag", row_tag)
    if schema is not None:
        reader = reader.schema(schema)
    return reader.load(path)


def write_xml(
    df: DataFrame,
    path: str,
    row_tag: str = "row",
    root_tag: str = "rows",
    mode: str = "overwrite",
) -> None:
    """XML sink (one ``row_tag`` element per row under ``root_tag``)."""
    (
        df.write.format("xml")
        .option("rowTag", row_tag)
        .option("rootTag", root_tag)
        .mode(mode)
        .save(path)
    )


def avro_available(spark: SparkSession) -> bool:
    """True when the spark-avro jar is on the session's classpath.
    Avro is an *external* Spark module (`org.apache.spark:spark-avro`,
    added via ``--packages``); this container does not ship it."""
    try:
        spark._jvm.org.apache.spark.sql.execution.datasources.DataSource.lookupDataSource(
            "avro", spark._jsparkSession.sessionState().conf()
        )
        return True
    except Exception:
        return False


def _require_avro(spark: SparkSession) -> None:
    if not avro_available(spark):
        raise ImportError(
            "Avro support requires the spark-avro package on the "
            "classpath (spark-submit --packages "
            "org.apache.spark:spark-avro_2.13:<spark-version>)"
        )


def read_avro(spark: SparkSession, path: str) -> DataFrame:
    """Avro scan (row-oriented; the interchange format of choice for
    Kafka/ingest edges — land to parquet before analytics)."""
    _require_avro(spark)
    return spark.read.format("avro").load(path)


def write_avro(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    _require_avro(df.sparkSession)
    df.write.format("avro").mode(mode).save(path)
