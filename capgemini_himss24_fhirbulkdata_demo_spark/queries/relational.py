"""Core relational surface: scan → filter → project → aggregate.

SURVEY §2B rows: Scans, Projection, Filter, Aggregation (incl.
rollup/cube/grouping sets, having, global agg), Dedup/distinct.
Reference anchors: count audit ``FetchBulkData/__init__.py:532``
(T16), filters T8–T10 (``__init__.py:464-482``).

Determinism policy (see registry docstring): money arithmetic runs in
DECIMAL (exact, order-insensitive), surfaces as DOUBLE via a single
correctly-rounded cast; averages are one double division of exact
parts. At scale this costs nothing: decimal sum is still a map-side
partial aggregate and AQE coalesces the tiny final shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from .registry import register

# Exact per-row money terms (decimal in, decimal out — no fp order effects).
_DEC = "decimal(18,2)"
_DISC = "decimal(6,4)"


def _dec(c: str):
    return F.col(c).cast(_DEC)


def _disc_price():
    return _dec("l_extendedprice") * (F.lit(1).cast(_DISC) - F.col("l_discount").cast(_DISC))


def _charge():
    return _disc_price() * (F.lit(1).cast(_DISC) + F.col("l_tax").cast(_DISC))


_SQL_DISC_PRICE = (
    "CAST(l_extendedprice AS DECIMAL(18,2))"
    " * (CAST(1 AS DECIMAL(6,4)) - CAST(l_discount AS DECIMAL(6,4)))"
)
_SQL_CHARGE = f"{_SQL_DISC_PRICE} * (CAST(1 AS DECIMAL(6,4)) + CAST(l_tax AS DECIMAL(6,4)))"


@register(
    "q01_pricing_summary",
    oracle=f"""
    SELECT l_returnflag, l_linestatus,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
           CAST(ROUND(SUM({_SQL_DISC_PRICE}), 4) AS DOUBLE) AS sum_disc_price,
           CAST(ROUND(SUM({_SQL_CHARGE}), 4) AS DOUBLE) AS sum_charge,
           ROUND(CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*), 4) AS avg_qty,
           COUNT(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '2000-01-01 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    ORDER BY l_returnflag, l_linestatus
    """,
)
def q01_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 shape: scan + filter + hash-aggregate with partial agg.

    Plan check: parquet scan shows PushedFilters on l_shipdate and a
    2-column-pruned ReadSchema; HashAggregate runs partial (map-side)
    then final — one shuffle on the 6-value grouping key.
    """
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.filter(F.col("l_shipdate") <= F.lit("2000-01-01").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(_dec("l_quantity")).cast("double").alias("sum_qty"),
            F.sum(_dec("l_extendedprice")).cast("double").alias("sum_base_price"),
            F.round(F.sum(_disc_price()), 4).cast("double").alias("sum_disc_price"),
            F.round(F.sum(_charge()), 4).cast("double").alias("sum_charge"),
            F.round(F.sum(_dec("l_quantity")).cast("double") / F.count("*"), 4).alias("avg_qty"),
            F.count("*").alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


@register(
    "q02_filter_project",
    oracle="""
    SELECT p_partkey,
           UPPER(p_name) AS p_name_upper,
           p_brand,
           p_size,
           CAST(CAST(p_retailprice AS DECIMAL(18,2)) * 2 AS DOUBLE) AS double_price
    FROM part
    WHERE p_size BETWEEN 10 AND 30 AND p_type LIKE '%BRASS%'
    ORDER BY p_partkey
    """,
)
def q02_filter_project(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Projection + predicate pushdown: BETWEEN, LIKE, computed column.

    Plan check: both predicates appear in PushedFilters (the LIKE as
    StringContains); ReadSchema carries only the 5 referenced columns.
    """
    part = load_table(spark, sf_dir, "part")
    return (
        part.filter(F.col("p_size").between(10, 30) & F.col("p_type").contains("BRASS"))
        .select(
            "p_partkey",
            F.upper("p_name").alias("p_name_upper"),
            "p_brand",
            "p_size",
            (F.col("p_retailprice").cast(_DEC) * 2).cast("double").alias("double_price"),
        )
        .orderBy("p_partkey")
    )


@register(
    "q03_top_revenue_orders",
    oracle=f"""
    SELECT l_orderkey,
           CAST(SUM({_SQL_DISC_PRICE}) AS DOUBLE) AS revenue,
           STRFTIME(o_orderdate, '%Y-%m-%d') AS orderdate,
           o_orderpriority
    FROM customer JOIN orders ON c_custkey = o_custkey
                  JOIN lineitem ON l_orderkey = o_orderkey
    WHERE c_mktsegment = 'BUILDING'
    GROUP BY l_orderkey, o_orderdate, o_orderpriority
    ORDER BY revenue DESC, l_orderkey
    LIMIT 10
    """,
)
def q03_top_revenue_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shape: selective dim filter → fact join → agg → top-k.

    customer is a non-scaling dim (FIXTURES.md) so it is explicitly
    broadcast: at 100 TB this keeps the orders→lineitem join the only
    shuffle. Total ORDER BY with l_orderkey tiebreaker makes LIMIT
    deterministic (TakeOrderedAndProject — no global sort).
    """
    cust = load_table(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(F.sum(_disc_price()).cast("double").alias("revenue"))
        .select(
            "l_orderkey",
            "revenue",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("orderdate"),
            "o_orderpriority",
        )
        .orderBy(F.desc("revenue"), "l_orderkey")
        .limit(10)
    )


@register(
    "q06_revenue_delta",
    oracle="""
    SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                    * CAST(l_discount AS DECIMAL(6,4))) AS DOUBLE) AS revenue
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
      AND l_discount BETWEEN 0.03 AND 0.07
      AND l_quantity < 24
    """,
)
def q06_revenue_delta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 shape: pure scan-filter-global-agg, fully pushed down.

    Plan check: all three range predicates in PushedFilters; single
    partial/final agg, no wide shuffle (AQE coalesces to 1 partition).
    """
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
            & F.col("l_discount").between(0.03, 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            F.sum(_dec("l_extendedprice") * F.col("l_discount").cast(_DISC))
            .cast("double")
            .alias("revenue")
        )
    )


@register(
    "q07_rollup",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           GROUPING(l_returnflag) AS g_rf,
           GROUPING(l_linestatus) AS g_ls,
           COUNT(*) AS n,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
    FROM lineitem
    GROUP BY ROLLUP(l_returnflag, l_linestatus)
    ORDER BY g_rf, g_ls, l_returnflag NULLS FIRST, l_linestatus NULLS FIRST
    """,
)
def q07_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP hierarchy totals with GROUPING() markers (SURVEY §2B agg)."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.rollup("l_returnflag", "l_linestatus")
        .agg(
            F.grouping("l_returnflag").cast("int").alias("g_rf"),
            F.grouping("l_linestatus").cast("int").alias("g_ls"),
            F.count("*").alias("n"),
            F.sum(_dec("l_quantity")).cast("double").alias("sum_qty"),
        )
        .select("l_returnflag", "l_linestatus", "g_rf", "g_ls", "n", "sum_qty")
        .orderBy(
            "g_rf",
            "g_ls",
            F.col("l_returnflag").asc_nulls_first(),
            F.col("l_linestatus").asc_nulls_first(),
        )
    )


@register(
    "q08_cube",
    oracle="""
    SELECT o_orderstatus, o_orderpriority,
           GROUPING(o_orderstatus) AS g_st, GROUPING(o_orderpriority) AS g_pr,
           COUNT(*) AS n,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
    FROM orders
    GROUP BY CUBE(o_orderstatus, o_orderpriority)
    ORDER BY g_st, g_pr, o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST
    """,
)
def q08_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE over orders with exact decimal totals."""
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.cube("o_orderstatus", "o_orderpriority")
        .agg(
            F.grouping("o_orderstatus").cast("int").alias("g_st"),
            F.grouping("o_orderpriority").cast("int").alias("g_pr"),
            F.count("*").alias("n"),
            F.sum(F.col("o_totalprice").cast(_DEC)).cast("double").alias("sum_price"),
        )
        .select("o_orderstatus", "o_orderpriority", "g_st", "g_pr", "n", "sum_price")
        .orderBy(
            "g_st",
            "g_pr",
            F.col("o_orderstatus").asc_nulls_first(),
            F.col("o_orderpriority").asc_nulls_first(),
        )
    )


@register(
    "q09_grouping_sets",
    oracle="""
    SELECT c_mktsegment, n_name,
           COUNT(*) AS n,
           CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS sum_bal
    FROM customer JOIN nation ON c_nationkey = n_nationkey
    GROUP BY GROUPING SETS ((c_mktsegment), (n_name), (c_mktsegment, n_name))
    ORDER BY c_mktsegment NULLS FIRST, n_name NULLS FIRST
    """,
)
def q09_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS (SQL surface — Catalyst expands to Expand)."""
    load_table(spark, sf_dir, "customer").createOrReplaceTempView("customer")
    load_table(spark, sf_dir, "nation").createOrReplaceTempView("nation")
    return spark.sql(
        """
        SELECT c_mktsegment, n_name,
               COUNT(*) AS n,
               CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS sum_bal
        FROM customer JOIN nation ON c_nationkey = n_nationkey
        GROUP BY GROUPING SETS ((c_mktsegment), (n_name), (c_mktsegment, n_name))
        ORDER BY c_mktsegment NULLS FIRST, n_name NULLS FIRST
        """
    )


@register(
    "q10_having",
    oracle="""
    SELECT n_name, COUNT(*) AS n_customers,
           ROUND(CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*), 4) AS avg_bal
    FROM customer JOIN nation ON c_nationkey = n_nationkey
    GROUP BY n_name
    HAVING COUNT(*) >= 3
    ORDER BY n_name
    """,
)
def q10_having(spark: SparkSession, sf_dir: str) -> DataFrame:
    """groupBy + HAVING (post-aggregation filter), broadcast dim join."""
    cust = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    return (
        cust.join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .groupBy("n_name")
        .agg(
            F.count("*").alias("n_customers"),
            F.round(
                F.sum(_dec("c_acctbal")).cast("double") / F.count("*"), 4
            ).alias("avg_bal"),
        )
        .filter(F.col("n_customers") >= 3)
        .orderBy("n_name")
    )


@register(
    "q11_distinct",
    oracle="""
    SELECT DISTINCT o_orderstatus, o_orderpriority
    FROM orders
    ORDER BY o_orderstatus, o_orderpriority
    """,
)
def q11_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DISTINCT — planned as a keys-only hash aggregate."""
    orders = load_table(spark, sf_dir, "orders")
    return orders.select("o_orderstatus", "o_orderpriority").distinct().orderBy(
        "o_orderstatus", "o_orderpriority"
    )


@register(
    "q12_global_agg",
    oracle="""
    SELECT COUNT(*) AS n_rows,
           COUNT(DISTINCT l_orderkey) AS n_orders,
           STRFTIME(MIN(l_shipdate), '%Y-%m-%d') AS min_ship,
           STRFTIME(MAX(l_shipdate), '%Y-%m-%d') AS max_ship,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
           CAST(MIN(l_extendedprice) AS DOUBLE) AS min_price,
           CAST(MAX(l_extendedprice) AS DOUBLE) AS max_price
    FROM lineitem
    """,
)
def q12_global_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global (no-group) aggregate incl. exact COUNT(DISTINCT).

    r11 (guide §2.3; mechanism corrected r12): mixing ONE distinct
    with plain aggregates plans a 4-stage aggregate keyed on the
    distinct column — every plain aggregate's buffer is carried PER
    DISTINCT l_orderkey through the exchange instead of collapsing
    to a single partial row (Spark only plans an Expand for >= 2
    distinct groups; the committed before-dump shows none).
    Splitting the count-distinct into its own branch lets the plain
    aggregates partial-aggregate to one row before their exchange
    while the distinct branch exchanges bare keys; the two 1-row
    results broadcast-join. Values are identical."""
    li = load_table(spark, sf_dir, "lineitem")
    plain = li.agg(
        F.count("*").alias("n_rows"),
        F.date_format(F.min("l_shipdate"), "yyyy-MM-dd").alias("min_ship"),
        F.date_format(F.max("l_shipdate"), "yyyy-MM-dd").alias("max_ship"),
        F.sum(_dec("l_quantity")).cast("double").alias("sum_qty"),
        F.min("l_extendedprice").alias("min_price"),
        F.max("l_extendedprice").alias("max_price"),
    )
    n_orders = (
        li.select("l_orderkey")
        .distinct()
        .agg(F.count("*").alias("n_orders"))
    )
    return plain.crossJoin(F.broadcast(n_orders)).select(
        "n_rows",
        "n_orders",
        "min_ship",
        "max_ship",
        "sum_qty",
        "min_price",
        "max_price",
    )


@register(
    "q13_stats_agg",
    oracle="""
    SELECT l_returnflag,
           COUNT(*) AS n,
           ROUND(STDDEV_SAMP(l_quantity), 4) AS sd_qty,
           ROUND(VAR_SAMP(l_quantity), 4) AS var_qty,
           ROUND(STDDEV_POP(l_quantity), 4) AS sdp_qty,
           ROUND(VAR_POP(l_quantity), 4) AS varp_qty,
           ROUND(CAST(SUM(CAST(l_discount AS DECIMAL(8,4))) AS DOUBLE) / COUNT(*), 6) AS avg_disc
    FROM lineitem
    GROUP BY l_returnflag
    ORDER BY l_returnflag
    """,
)
def q13_stats_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Statistical aggregates (stddev/variance) + exact-decimal mean.

    stddev/var run on l_quantity (small integral doubles 1..50) so the
    fp accumulation is exact far beyond the ROUND(4) surface.
    """
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.count("*").alias("n"),
            F.round(F.stddev_samp("l_quantity"), 4).alias("sd_qty"),
            F.round(F.var_samp("l_quantity"), 4).alias("var_qty"),
            F.round(F.stddev_pop("l_quantity"), 4).alias("sdp_qty"),
            F.round(F.var_pop("l_quantity"), 4).alias("varp_qty"),
            F.round(
                F.sum(F.col("l_discount").cast("decimal(8,4)")).cast("double") / F.count("*"),
                6,
            ).alias("avg_disc"),
        )
        .orderBy("l_returnflag")
    )


@register(
    "q14_collect_agg",
    oracle="""
    SELECT n_regionkey,
           ARRAY_TO_STRING(LIST(n_name ORDER BY n_name), ',') AS nations,
           COUNT(*) AS n
    FROM nation
    GROUP BY n_regionkey
    ORDER BY n_regionkey
    """,
)
def q14_collect_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """collect_list made deterministic with sort_array (SURVEY §2B agg;
    reference anchor: manifest build collect ``__init__.py:216-238``).

    The collected array surfaces as a ','-joined string: the driver
    harness hashes cells via pandas and cannot hash list cells, so
    every registered query serializes non-scalar outputs (collect
    semantics are unchanged — sort_array still canonicalizes order).
    """
    nation = load_table(spark, sf_dir, "nation")
    return (
        nation.groupBy("n_regionkey")
        .agg(
            F.array_join(F.sort_array(F.collect_list("n_name")), ",").alias(
                "nations"
            ),
            F.count("*").alias("n"),
        )
        .orderBy("n_regionkey")
    )
