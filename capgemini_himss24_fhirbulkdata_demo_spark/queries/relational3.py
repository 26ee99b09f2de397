"""TPC-H hard shapes, part 3 (SURVEY §2B aggregation/join breadth):
market share (Q8), global-scalar HAVING (Q11), conditional two-way
counts (Q12), scalar-subquery MAX over a derived view (Q15), NOT IN +
count-distinct (Q16), nested IN subqueries with a correlated HAVING
(Q20) — all adapted to the fixture schema (no partsupp/shipmode).

Cross-engine determinism (see registry docstring): exact decimal sums
surfaced as doubles; ratios are one double division followed by
FLOOR-truncation (``FLOOR(x*1e6)/1e6`` — bit-stable on identical
doubles, immune to HALF_UP disagreement); comparisons against
global-scalar thresholds happen on doubles derived from exact
decimals, so both engines compare identical IEEE values.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from .registry import register
from .relational import _SQL_DISC_PRICE, _dec, _disc_price


def _views(spark: SparkSession, sf_dir: str, *tables: str) -> None:
    for t in tables:
        load_table(spark, sf_dir, t).createOrReplaceTempView(t)


_FOCUS_NATION = "NATION_3"


@register(
    "q83_market_share",
    oracle=f"""
    SELECT EXTRACT(YEAR FROM o_orderdate) AS yr,
           FLOOR(CAST(SUM(CASE WHEN n_name = '{_FOCUS_NATION}'
                               THEN {_SQL_DISC_PRICE}
                               ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE)
                 / CAST(SUM({_SQL_DISC_PRICE}) AS DOUBLE) * 1e6) / 1e6
             AS mkt_share,
           COUNT(*) AS n_lines
    FROM lineitem
      JOIN orders   ON l_orderkey = o_orderkey
      JOIN supplier ON l_suppkey = s_suppkey
      JOIN nation   ON s_nationkey = n_nationkey
    GROUP BY yr
    ORDER BY yr
    """,
)
def q83_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 shape: per-year revenue share of one supplier nation —
    conditional decimal sum over total decimal sum, one double
    division, floor-truncated to 6 digits.

    Scale: one shuffle on the join key chain (lineitem is the only
    fact; supplier/nation broadcast), then a tiny per-year aggregate.
    """
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    zero = F.lit(0).cast("decimal(18,2)")
    # r11 (guide §2.3): the dim joins are broadcast (narrow), so the
    # per-ORDER partial aggregate can run BEFORE the fact-fact
    # shuffle — the lineitem side of the orderkey exchange shrinks
    # from one row per line to one skinny row per order (~4×), and
    # decimal sums regroup exactly (associative), so the per-year
    # totals are bit-identical.
    per_order = (
        li.join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy("l_orderkey")
        .agg(
            F.sum(
                F.when(
                    F.col("n_name") == _FOCUS_NATION, _disc_price()
                ).otherwise(zero)
            ).alias("__focus"),
            F.sum(_disc_price()).alias("__tot"),
            F.count("*").alias("__n"),
        )
    )
    return (
        per_order.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy(F.year("o_orderdate").cast("bigint").alias("yr"))
        .agg(
            (
                F.floor(
                    F.sum("__focus").cast("double")
                    / F.sum("__tot").cast("double")
                    * F.lit(1e6)
                )
                / F.lit(1e6)
            ).alias("mkt_share"),
            F.sum("__n").alias("n_lines"),
        )
        .orderBy("yr")
    )


@register(
    "q84_top_customers_scalar_having",
    oracle="""
    SELECT o_custkey,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
    FROM orders
    GROUP BY o_custkey
    HAVING CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) >
           (SELECT CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
                   / COUNT(DISTINCT o_custkey)
            FROM orders) * 1.5
    ORDER BY revenue DESC, o_custkey
    """,
)
def q84_top_customers_scalar_having(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 shape: per-group sum filtered by a global-scalar
    subquery in HAVING (Catalyst decorrelates into a broadcast of the
    one-row global aggregate). Threshold comparison on doubles derived
    from exact decimal sums — identical IEEE values in both engines.

    Scale: two aggregates over the same scan (group + global); the
    global side is one row, broadcast. No second fact shuffle.
    """
    _views(spark, sf_dir, "orders")
    return spark.sql(
        """
        SELECT o_custkey,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
        FROM orders
        GROUP BY o_custkey
        HAVING CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) >
               (SELECT CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
                       / COUNT(DISTINCT o_custkey)
                FROM orders) * 1.5
        ORDER BY revenue DESC, o_custkey
        """
    )


@register(
    "q85_priority_line_counts",
    oracle="""
    SELECT l_returnflag,
           CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM orders JOIN lineitem ON o_orderkey = l_orderkey
    WHERE l_shipdate >= TIMESTAMP '1997-01-01'
      AND l_shipdate <  TIMESTAMP '1998-01-01'
    GROUP BY l_returnflag
    ORDER BY l_returnflag
    """,
)
def q85_priority_line_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 shape: two-way conditional counts (CASE inside SUM)
    after a fact↔fact join, date-window filter pushed to the lineitem
    scan. No shipmode column in the fixture — grouped by returnflag.
    """
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    one, zero = F.lit(1), F.lit(0)
    return (
        orders.join(li, F.col("o_orderkey") == F.col("l_orderkey"))
        .groupBy("l_returnflag")
        .agg(
            F.sum(F.when(high, one).otherwise(zero)).alias("high_line_count"),
            F.sum(F.when(~high, one).otherwise(zero)).alias("low_line_count"),
        )
        .orderBy("l_returnflag")
    )


@register(
    "q86_top_supplier",
    oracle=f"""
    WITH rev AS (
      SELECT l_suppkey,
             SUM({_SQL_DISC_PRICE}) AS total
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1997-01-01'
        AND l_shipdate <  TIMESTAMP '1998-01-01'
      GROUP BY l_suppkey)
    SELECT s_suppkey, s_name, CAST(total AS DOUBLE) AS total_rev
    FROM supplier JOIN rev ON s_suppkey = l_suppkey
    WHERE total = (SELECT MAX(total) FROM rev)
    ORDER BY s_suppkey
    """,
)
def q86_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 shape: revenue-per-supplier derived view, selected
    where revenue equals the view's MAX (scalar subquery over the same
    CTE — Catalyst evaluates the 1-row aggregate and broadcasts it).
    Equality on exact decimals, so engines agree even on ties.
    """
    _views(spark, sf_dir, "lineitem", "supplier")
    return spark.sql(
        f"""
        WITH rev AS (
          SELECT l_suppkey,
                 SUM({_SQL_DISC_PRICE}) AS total
          FROM lineitem
          WHERE l_shipdate >= TIMESTAMP '1997-01-01'
            AND l_shipdate <  TIMESTAMP '1998-01-01'
          GROUP BY l_suppkey)
        SELECT s_suppkey, s_name, CAST(total AS DOUBLE) AS total_rev
        FROM supplier JOIN rev ON s_suppkey = l_suppkey
        WHERE total = (SELECT MAX(total) FROM rev)
        ORDER BY s_suppkey
        """
    )


@register(
    "q87_supplier_cnt_by_part",
    oracle="""
    SELECT p_brand, p_type, COUNT(DISTINCT l_suppkey) AS supplier_cnt
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE p_size IN (1, 7, 14, 23, 36, 45)
      AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier
                            WHERE s_acctbal < 2500)
    GROUP BY p_brand, p_type
    ORDER BY supplier_cnt DESC, p_brand, p_type
    """,
)
def q87_supplier_cnt_by_part(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 shape: distinct-supplier counts per (brand, type)
    with a NOT IN exclusion subquery (null-aware anti join; the
    exclusion list is tiny and broadcast). Uses the lineitem
    supplier↔part link in lieu of partsupp.
    """
    _views(spark, sf_dir, "lineitem", "part", "supplier")
    return spark.sql(
        """
        SELECT p_brand, p_type, COUNT(DISTINCT l_suppkey) AS supplier_cnt
        FROM lineitem JOIN part ON l_partkey = p_partkey
        WHERE p_size IN (1, 7, 14, 23, 36, 45)
          AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier
                                WHERE s_acctbal < 2500)
        GROUP BY p_brand, p_type
        ORDER BY supplier_cnt DESC, p_brand, p_type
        """
    )


@register(
    "q88_heavy_shippers",
    oracle="""
    SELECT s_suppkey, s_name, CAST(s_acctbal AS DOUBLE) AS bal
    FROM supplier
    WHERE s_suppkey IN (
      SELECT l_suppkey FROM lineitem
      WHERE l_partkey IN (SELECT p_partkey FROM part
                          WHERE p_name LIKE '%widget%')
        AND l_shipdate >= TIMESTAMP '1997-01-01'
        AND l_shipdate <  TIMESTAMP '1998-01-01'
      GROUP BY l_suppkey, l_partkey
      HAVING SUM(CAST(l_quantity AS DECIMAL(18,2))) > CAST(60 AS DECIMAL(18,2)))
    ORDER BY s_suppkey
    """,
)
def q88_heavy_shippers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 shape: nested IN subqueries — suppliers that shipped
    more than a quantity threshold of any LIKE-matched part inside a
    date window. Inner IN over part becomes a broadcast semi join;
    the grouped HAVING runs on the filtered fact; the outer IN is a
    semi join against the small supplier dim. Quantity sum is exact
    decimal so the threshold comparison is engine-stable.
    """
    _views(spark, sf_dir, "supplier", "lineitem", "part")
    return spark.sql(
        """
        SELECT s_suppkey, s_name, CAST(s_acctbal AS DOUBLE) AS bal
        FROM supplier
        WHERE s_suppkey IN (
          SELECT l_suppkey FROM lineitem
          WHERE l_partkey IN (SELECT p_partkey FROM part
                              WHERE p_name LIKE '%widget%')
            AND l_shipdate >= TIMESTAMP '1997-01-01'
            AND l_shipdate <  TIMESTAMP '1998-01-01'
          GROUP BY l_suppkey, l_partkey
          HAVING SUM(CAST(l_quantity AS DECIMAL(18,2))) > CAST(60 AS DECIMAL(18,2)))
        ORDER BY s_suppkey
        """
    )


@register(
    "q89_revenue_share",
    oracle=f"""
    WITH nat AS (
      SELECT n.n_regionkey AS regionkey, n.n_name AS nation,
             SUM({_SQL_DISC_PRICE}) AS rev_dec
      FROM lineitem
        JOIN supplier ON l_suppkey = s_suppkey
        JOIN nation n ON s_nationkey = n.n_nationkey
      GROUP BY regionkey, nation)
    SELECT r_name AS region, nation,
           CAST(rev_dec AS DOUBLE) AS revenue,
           FLOOR(CAST(rev_dec AS DOUBLE)
                 / CAST(SUM(rev_dec) OVER (PARTITION BY regionkey) AS DOUBLE)
                 * 1e6) / 1e6 AS region_share
    FROM nat JOIN region ON regionkey = r_regionkey
    ORDER BY region, nation
    """,
)
def q89_revenue_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Percent-of-total: a window SUM over an aggregate's output (the
    BI share-of-region shape). The window input is the exact decimal
    per-nation sum, so the partition total is exact too; one double
    division, floor-truncated.

    Scale: the expensive part is the base aggregate (one lineitem
    shuffle); the window then runs over nation-cardinality rows —
    cheap regardless of fact size.
    """
    from pyspark.sql import Window

    li = load_table(spark, sf_dir, "lineitem")
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")
    nat = (
        li.join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy(
            F.col("n_regionkey").alias("regionkey"),
            F.col("n_name").alias("nation"),
        )
        .agg(F.sum(_disc_price()).alias("rev_dec"))
    )
    w = Window.partitionBy("regionkey")
    return (
        nat.join(F.broadcast(region), F.col("regionkey") == F.col("r_regionkey"))
        .select(
            F.col("r_name").alias("region"),
            "nation",
            F.col("rev_dec").cast("double").alias("revenue"),
            (
                F.floor(
                    F.col("rev_dec").cast("double")
                    / F.sum("rev_dec").over(w).cast("double")
                    * F.lit(1e6)
                )
                / F.lit(1e6)
            ).alias("region_share"),
        )
        .orderBy("region", "nation")
    )
