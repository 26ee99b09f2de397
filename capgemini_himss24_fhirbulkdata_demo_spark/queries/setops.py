"""Set-operation surface: UNION [ALL], INTERSECT [ALL], EXCEPT [ALL],
unionByName (SURVEY §2B Set ops)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from .registry import register


@register(
    "q40_union_all",
    oracle="""
    SELECT k, kind FROM (
      SELECT c_nationkey AS k, 'customer' AS kind FROM customer
      UNION ALL
      SELECT s_nationkey AS k, 'supplier' AS kind FROM supplier
    )
    ORDER BY kind, k
    """,
)
def q40_union_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION ALL of two conformed projections (no dedup shuffle)."""
    c = load_table(spark, sf_dir, "customer").select(
        F.col("c_nationkey").alias("k"), F.lit("customer").alias("kind")
    )
    s = load_table(spark, sf_dir, "supplier").select(
        F.col("s_nationkey").alias("k"), F.lit("supplier").alias("kind")
    )
    return c.unionAll(s).orderBy("kind", "k")


@register(
    "q41_union_distinct",
    oracle="""
    SELECT c_nationkey AS k FROM customer
    UNION
    SELECT s_nationkey AS k FROM supplier
    ORDER BY k
    """,
)
def q41_union_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION (distinct) — union + dedup aggregate."""
    c = load_table(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("k"))
    s = load_table(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("k"))
    return c.union(s).distinct().orderBy("k")


@register(
    "q42_intersect",
    oracle="""
    SELECT c_nationkey AS k FROM customer
    INTERSECT
    SELECT s_nationkey AS k FROM supplier
    ORDER BY k
    """,
)
def q42_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT (distinct semantics)."""
    c = load_table(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("k"))
    s = load_table(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("k"))
    return c.intersect(s).orderBy("k")


@register(
    "q43_except",
    oracle="""
    SELECT c_nationkey AS k FROM customer
    EXCEPT
    SELECT s_nationkey AS k FROM supplier
    ORDER BY k
    """,
)
def q43_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT (distinct semantics)."""
    c = load_table(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("k"))
    s = load_table(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("k"))
    return c.subtract(s).orderBy("k")


@register(
    "q44_except_all",
    oracle="""
    SELECT n_regionkey AS k FROM nation
    EXCEPT ALL
    SELECT r_regionkey AS k FROM region
    ORDER BY k
    """,
)
def q44_except_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT ALL (bag semantics — multiplicity-aware)."""
    n = load_table(spark, sf_dir, "nation").select(F.col("n_regionkey").alias("k"))
    r = load_table(spark, sf_dir, "region").select(F.col("r_regionkey").alias("k"))
    return n.exceptAll(r).orderBy("k")


@register(
    "q45_intersect_all",
    oracle="""
    SELECT o_custkey AS k FROM orders WHERE o_orderkey <= 200
    INTERSECT ALL
    SELECT o_custkey AS k FROM orders WHERE o_orderkey > 100 AND o_orderkey <= 300
    ORDER BY k
    """,
)
def q45_intersect_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT ALL (bag semantics)."""
    orders = load_table(spark, sf_dir, "orders")
    a = orders.filter(F.col("o_orderkey") <= 200).select(F.col("o_custkey").alias("k"))
    b = orders.filter((F.col("o_orderkey") > 100) & (F.col("o_orderkey") <= 300)).select(
        F.col("o_custkey").alias("k")
    )
    return a.intersectAll(b).orderBy("k")


@register(
    "q46_union_by_name",
    oracle="""
    SELECT k, v FROM (
      SELECT r_regionkey AS k, r_name AS v FROM region
      UNION ALL
      SELECT n_nationkey AS k, n_name AS v FROM nation
    )
    ORDER BY k, v
    """,
)
def q46_union_by_name(spark: SparkSession, sf_dir: str) -> DataFrame:
    """unionByName — positional-independence union (engine API surface;
    oracle expresses the same conformed union)."""
    r = load_table(spark, sf_dir, "region").select(
        F.col("r_name").alias("v"), F.col("r_regionkey").alias("k")
    )
    n = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("k"), F.col("n_name").alias("v")
    )
    # Column orders differ on purpose; unionByName aligns them.
    return r.unionByName(n.select("v", "k")).select("k", "v").orderBy("k", "v")
