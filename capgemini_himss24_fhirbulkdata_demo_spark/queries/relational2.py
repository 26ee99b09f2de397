"""Advanced relational coverage: correlated subqueries, nation-pair
joins, distribution aggregates, percentiles, ordered string agg,
pivot/unpivot shapes (SURVEY §2B breadth).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from .registry import register
from .relational import _SQL_DISC_PRICE, _dec, _disc_price


@register(
    "q15_min_bal_supplier",
    oracle="""
    SELECT s.s_suppkey, s.s_name, n.n_name,
           CAST(s.s_acctbal AS DOUBLE) AS bal
    FROM supplier s JOIN nation n ON s.s_nationkey = n.n_nationkey
    WHERE s.s_acctbal = (SELECT MIN(s2.s_acctbal) FROM supplier s2
                         WHERE s2.s_nationkey = s.s_nationkey)
    ORDER BY s.s_suppkey
    """,
)
def q15_min_bal_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 shape: correlated MIN subquery (decorrelated by
    Catalyst into an aggregate + join)."""
    load_table(spark, sf_dir, "supplier").createOrReplaceTempView("supplier")
    load_table(spark, sf_dir, "nation").createOrReplaceTempView("nation")
    return spark.sql(
        """
        SELECT s.s_suppkey, s.s_name, n.n_name,
               CAST(s.s_acctbal AS DOUBLE) AS bal
        FROM supplier s JOIN nation n ON s.s_nationkey = n.n_nationkey
        WHERE s.s_acctbal = (SELECT MIN(s2.s_acctbal) FROM supplier s2
                             WHERE s2.s_nationkey = s.s_nationkey)
        ORDER BY s.s_suppkey
        """
    )


@register(
    "q16_nation_trade_pairs",
    oracle=f"""
    SELECT cn.n_name AS cust_nation, sn.n_name AS supp_nation,
           EXTRACT(YEAR FROM l_shipdate) AS yr,
           CAST(SUM({_SQL_DISC_PRICE}) AS DOUBLE) AS revenue,
           COUNT(*) AS n_lines
    FROM lineitem
      JOIN orders   ON l_orderkey = o_orderkey
      JOIN customer ON o_custkey = c_custkey
      JOIN supplier ON l_suppkey = s_suppkey
      JOIN nation cn ON c_nationkey = cn.n_nationkey
      JOIN nation sn ON s_nationkey = sn.n_nationkey
    WHERE cn.n_name < sn.n_name
      AND l_shipdate >= TIMESTAMP '1997-01-01' AND l_shipdate < TIMESTAMP '1999-01-01'
    GROUP BY cust_nation, supp_nation, yr
    ORDER BY cust_nation, supp_nation, yr
    """,
)
def q16_nation_trade_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 shape: two roles of the same dim (nation aliased
    twice), asymmetric pair filter, per-year revenue."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1999-01-01").cast("timestamp"))
    )
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    cn = nation.select(
        F.col("n_nationkey").alias("cnk"), F.col("n_name").alias("cust_nation")
    )
    sn = nation.select(
        F.col("n_nationkey").alias("snk"), F.col("n_name").alias("supp_nation")
    )
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(cn), cust.c_nationkey == cn.cnk)
        .join(F.broadcast(sn), supp.s_nationkey == sn.snk)
        .filter(F.col("cust_nation") < F.col("supp_nation"))
        .groupBy("cust_nation", "supp_nation", F.year("l_shipdate").cast("bigint").alias("yr"))
        .agg(
            F.sum(_disc_price()).cast("double").alias("revenue"),
            F.count("*").alias("n_lines"),
        )
        .orderBy("cust_nation", "supp_nation", "yr")
    )


@register(
    "q18_big_orders",
    oracle="""
    SELECT c_name, c_custkey, o_orderkey,
           STRFTIME(o_orderdate, '%Y-%m-%d') AS orderdate,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS total_qty
    FROM orders JOIN customer ON o_custkey = c_custkey
                JOIN lineitem ON o_orderkey = l_orderkey
    GROUP BY c_name, c_custkey, o_orderkey, o_orderdate
    HAVING SUM(CAST(l_quantity AS DECIMAL(18,2))) > 150
    ORDER BY total_qty DESC, o_orderkey
    LIMIT 20
    """,
)
def q18_big_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 shape: large-volume orders via HAVING on an exact
    decimal sum, deterministic top-20.

    r11 (guide §2.3/§3.2): the HAVING predicate depends on lineitem
    alone, so the per-order quantity sum aggregates and filters
    BEFORE any join — the orderkey join then carries only the few
    qualifying orders (AQE broadcasts that side) instead of shuffling
    every lineitem row against orders. Decimal sums regroup exactly;
    (c_name, c_custkey, o_orderdate) are functionally dependent on
    o_orderkey, so the per-orderkey grouping is value-identical."""
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    li = load_table(spark, sf_dir, "lineitem")
    tq = (
        li.groupBy("l_orderkey")
        .agg(F.sum(_dec("l_quantity")).alias("_tq"))
        .filter(F.col("_tq") > 150)
    )
    return (
        tq.join(orders, tq.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .select(
            "c_name",
            "c_custkey",
            "o_orderkey",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("orderdate"),
            F.col("_tq").cast("double").alias("total_qty"),
        )
        .orderBy(F.desc("total_qty"), "o_orderkey")
        .limit(20)
    )


@register(
    "q19_order_count_distribution",
    oracle="""
    WITH per_cust AS (
      SELECT c_custkey, COUNT(o_orderkey) AS c_count
      FROM customer LEFT JOIN orders
        ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
      GROUP BY c_custkey)
    SELECT c_count, COUNT(*) AS custdist
    FROM per_cust
    GROUP BY c_count
    ORDER BY custdist DESC, c_count DESC
    """,
)
def q19_order_count_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 shape: outer join with join-side filter, then a
    distribution (two-level aggregate)."""
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") != "1-URGENT"
    )
    per_cust = (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return (
        per_cust.groupBy("c_count")
        .agg(F.count("*").alias("custdist"))
        .orderBy(F.desc("custdist"), F.desc("c_count"))
    )


@register(
    "q29_percentiles",
    oracle="""
    SELECT l_returnflag,
           ROUND(MEDIAN(l_quantity), 4) AS median_qty,
           ROUND(QUANTILE_CONT(l_quantity, 0.25), 4) AS p25_qty,
           ROUND(QUANTILE_CONT(l_quantity, 0.75), 4) AS p75_qty,
           ROUND(QUANTILE_CONT(l_extendedprice, 0.9), 4) AS p90_price
    FROM lineitem
    GROUP BY l_returnflag
    ORDER BY l_returnflag
    """,
)
def q29_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Continuous percentiles (median/p25/p75/p90) per group — Spark
    ``percentile`` and DuckDB ``quantile_cont`` both implement the
    linear-interpolation definition."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.round(F.expr("percentile(l_quantity, 0.5)"), 4).alias("median_qty"),
            F.round(F.expr("percentile(l_quantity, 0.25)"), 4).alias("p25_qty"),
            F.round(F.expr("percentile(l_quantity, 0.75)"), 4).alias("p75_qty"),
            F.round(F.expr("percentile(l_extendedprice, 0.9)"), 4).alias("p90_price"),
        )
        .orderBy("l_returnflag")
    )


@register(
    "q38_string_agg",
    oracle="""
    SELECT r_name,
           STRING_AGG(n_name, ',' ORDER BY n_name) AS nations_csv
    FROM region JOIN nation ON r_regionkey = n_regionkey
    GROUP BY r_name
    ORDER BY r_name
    """,
)
def q38_string_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered string aggregation (listagg semantics) — expressed as
    sort_array(collect_list) + array_join for deterministic order."""
    region = load_table(spark, sf_dir, "region")
    nation = load_table(spark, sf_dir, "nation")
    return (
        region.join(nation, region.r_regionkey == nation.n_regionkey)
        .groupBy("r_name")
        .agg(
            F.array_join(F.sort_array(F.collect_list("n_name")), ",").alias(
                "nations_csv"
            )
        )
        .orderBy("r_name")
    )


@register(
    "q47_pivot",
    oracle="""
    SELECT o_orderpriority,
           COUNT(*) FILTER (WHERE o_orderstatus = 'F') AS n_f,
           COUNT(*) FILTER (WHERE o_orderstatus = 'O') AS n_o,
           COUNT(*) FILTER (WHERE o_orderstatus = 'P') AS n_p,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2)))
                FILTER (WHERE o_orderstatus = 'F') AS DOUBLE) AS price_f
    FROM orders
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
    """,
)
def q47_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot shape via conditional aggregation (the portable form of
    PIVOT; Spark's pivot() plans the same conditional aggs)."""
    orders = load_table(spark, sf_dir, "orders")

    def n_status(s):
        return F.count(F.when(F.col("o_orderstatus") == s, 1)).alias(f"n_{s.lower()}")

    return (
        orders.groupBy("o_orderpriority")
        .agg(
            n_status("F"),
            n_status("O"),
            n_status("P"),
            F.sum(
                F.when(F.col("o_orderstatus") == "F", _dec("o_totalprice"))
            ).cast("double").alias("price_f"),
        )
        .orderBy("o_orderpriority")
    )


@register(
    "q48_unpivot",
    oracle="""
    SELECT c_custkey, metric, val FROM (
      SELECT c_custkey, 'acctbal' AS metric, CAST(c_acctbal AS DOUBLE) AS val
      FROM customer WHERE c_custkey <= 30
      UNION ALL
      SELECT c_custkey, 'nationkey' AS metric, CAST(c_nationkey AS DOUBLE) AS val
      FROM customer WHERE c_custkey <= 30
    )
    ORDER BY c_custkey, metric
    """,
)
def q48_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unpivot (wide→long) via stack()."""
    cust = load_table(spark, sf_dir, "customer").filter(F.col("c_custkey") <= 30)
    return (
        cust.select(
            "c_custkey",
            F.expr(
                "stack(2, 'acctbal', CAST(c_acctbal AS DOUBLE), "
                "'nationkey', CAST(c_nationkey AS DOUBLE)) AS (metric, val)"
            ),
        )
        .orderBy("c_custkey", "metric")
    )


@register(
    "q56_approx_distinct",
    oracle="""
    SELECT COUNT(DISTINCT l_orderkey) AS exact_orders,
           COUNT(DISTINCT l_partkey) AS exact_parts,
           TRUE AS orders_ok,
           TRUE AS parts_ok
    FROM lineitem
    """,
)
def q56_approx_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """approx_count_distinct (HyperLogLog++) in invariant form: the
    query computes BOTH the exact distinct counts and the HLL++
    estimates, and emits the exact counts plus within-tolerance
    booleans — so the driver has a real DuckDB twin (exact counts +
    literal TRUE) instead of a rows-only check, while the sketch is
    still exercised end-to-end (SURVEY §2B Aggregation row; r6
    verdict's invariant-form conversion).

    Tolerance is ±10% relative, checked in exact integer arithmetic
    (|approx − exact| · 10 ≤ exact), with the estimator pinned at
    rsd=0.02 (NOT the 0.05 default). Why: the r9 sketch-margin probe
    on synthetic 4×/8× corpora caught the default-rsd error CROSSING
    the gate at 1.2 M distinct orderkeys (measured 10.45% > 10% —
    HLL++ error is not monotone in cardinality; see
    SKETCH_MARGINS.md), which would have surfaced as a driver-red
    hash mismatch at any scale factor with that cardinality profile.
    At rsd=0.02 the measured error peaks at 3.13% across all five
    probe corpora (sf0.001 → 8×), a ≥3.2× margin everywhere while
    still refuting a broken sketch (which returns 0 or garbage, not
    a few-%-close value). Scale: HLL++ partials are fixed size
    (2^12 registers at rsd=0.02) and mergeable, so the estimate path
    stays one map-side combine + one 1-row reduce at any corpus
    size; the exact twin is the part that would get expensive at
    100 TB — which is the point of carrying both here."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.agg(
            F.countDistinct("l_orderkey").alias("exact_orders"),
            F.countDistinct("l_partkey").alias("exact_parts"),
            F.approx_count_distinct("l_orderkey", 0.02).alias("ax_o"),
            F.approx_count_distinct("l_partkey", 0.02).alias("ax_p"),
        )
        .select(
            "exact_orders",
            "exact_parts",
            (
                F.abs(F.col("ax_o") - F.col("exact_orders")) * F.lit(10)
                <= F.col("exact_orders")
            ).alias("orders_ok"),
            (
                F.abs(F.col("ax_p") - F.col("exact_parts")) * F.lit(10)
                <= F.col("exact_parts")
            ).alias("parts_ok"),
        )
    )


@register(
    "q72_percentiles_approx",
    oracle="""
    SELECT l_returnflag, COUNT(*) AS n,
           TRUE AS p25_ok, TRUE AS median_ok, TRUE AS p75_ok,
           TRUE AS p90_price_ok
    FROM lineitem
    GROUP BY l_returnflag
    ORDER BY l_returnflag
    """,
)
def q72_percentiles_approx(spark: SparkSession, sf_dir: str) -> DataFrame:
    """approx_percentile (Greenwald-Khanna) in invariant form: the
    query computes the GK estimates AND the exact ``percentile`` in
    the same aggregate, and emits the group counts plus
    within-tolerance booleans — a real DuckDB twin (exact counts +
    literal TRUE) instead of the former rows-only check (r6 verdict's
    invariant-form conversion). Float values never cross engines, so
    no interpolation-ulp risk.

    q29's exact ``percentile`` sorts the whole group on one reducer —
    right only when the oracle demands exactness. The GK sketch is
    the 100 TB path: fixed memory per group, mergeable partials, one
    ordinary shuffle. Accuracy 10000 bounds rank error at N/10000
    (≤2 ranks per group at sf0.01): quantities are integers 1..50 so
    ±1.0 absolute covers any ≤2-rank slip plus interpolation;
    extendedprice uses 1% relative for the same reason. Measured
    sf0.001/0.01/0.1 errors are 0 on quantities and ≤0.11% on price
    (sf0.001's small groups are the worst case)."""
    li = load_table(spark, sf_dir, "lineitem")
    qty = F.col("l_quantity").cast("double")
    price = F.col("l_extendedprice").cast("double")
    agg = li.groupBy("l_returnflag").agg(
        F.count("*").cast("bigint").alias("n"),
        F.expr(
            "approx_percentile(CAST(l_quantity AS DOUBLE), "
            "array(0.25, 0.5, 0.75), 10000)"
        ).alias("gk"),
        F.percentile(qty, F.lit([0.25, 0.5, 0.75])).alias("ex"),
        F.expr(
            "approx_percentile(CAST(l_extendedprice AS DOUBLE), 0.9, 10000)"
        ).alias("gk_price"),
        F.percentile(price, F.lit(0.9)).alias("ex_price"),
    )

    def close(i: int):
        return (
            F.abs(F.element_at("gk", i) - F.element_at("ex", i)) <= F.lit(1.0)
        )

    return agg.select(
        "l_returnflag",
        "n",
        close(1).alias("p25_ok"),
        close(2).alias("median_ok"),
        close(3).alias("p75_ok"),
        (
            F.abs(F.col("gk_price") - F.col("ex_price"))
            <= F.col("ex_price") * F.lit(0.01)
        ).alias("p90_price_ok"),
    ).orderBy("l_returnflag")


@register(
    "q57_promo_revenue",
    oracle=f"""
    SELECT EXTRACT(YEAR FROM l_shipdate) AS yr,
           ROUND(100.0 * CAST(SUM(CASE WHEN p_type = 'PROMO'
                     THEN {_SQL_DISC_PRICE}
                     ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE)
                 / CAST(SUM({_SQL_DISC_PRICE}) AS DOUBLE), 4) AS promo_pct
    FROM lineitem JOIN part ON l_partkey = p_partkey
    GROUP BY yr
    ORDER BY yr
    """,
)
def q57_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 shape: conditional revenue share with a broadcast
    part join; both sums exact-decimal, one final double division."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    promo = F.sum(
        F.when(F.col("p_type") == "PROMO", _disc_price()).otherwise(
            F.lit(0).cast("decimal(18,2)")
        )
    )
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .groupBy(F.year("l_shipdate").cast("bigint").alias("yr"))
        .agg(
            F.round(
                F.lit(100.0) * promo.cast("double")
                / F.sum(_disc_price()).cast("double"),
                4,
            ).alias("promo_pct")
        )
        .orderBy("yr")
    )


@register(
    "q58_small_quantity_revenue",
    oracle="""
    WITH avg_qty AS (
      SELECT l_partkey AS pk,
             ROUND(CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE)
                   / COUNT(*), 4) AS aq
      FROM lineitem GROUP BY l_partkey)
    SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS small_revenue,
           COUNT(*) AS n_lines
    FROM lineitem JOIN part ON l_partkey = p_partkey
                  JOIN avg_qty ON pk = l_partkey
    WHERE p_brand = 'Brand#11' AND l_quantity < 0.5 * aq
    """,
)
def q58_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 shape: fact-derived per-key average re-joined against
    the fact (self-join aggregate), brand-filtered."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").filter(F.col("p_brand") == "Brand#11")
    avg_qty = li.groupBy(F.col("l_partkey").alias("pk")).agg(
        F.round(
            F.sum(_dec("l_quantity")).cast("double") / F.count("*"), 4
        ).alias("aq")
    )
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(avg_qty, F.col("pk") == li.l_partkey)
        .filter(F.col("l_quantity") < 0.5 * F.col("aq"))
        .agg(
            F.sum(_dec("l_extendedprice")).cast("double").alias("small_revenue"),
            F.count("*").alias("n_lines"),
        )
    )


@register(
    "q59_disjunctive_filter",
    oracle=f"""
    SELECT CAST(SUM({_SQL_DISC_PRICE}) AS DOUBLE) AS revenue, COUNT(*) AS n
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 15
           AND l_quantity BETWEEN 1 AND 11)
       OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 25
           AND l_quantity BETWEEN 10 AND 20)
       OR (p_brand = 'Brand#34' AND p_size BETWEEN 1 AND 35
           AND l_quantity BETWEEN 20 AND 30)
    """,
)
def q59_disjunctive_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 shape: OR-of-ANDs across both join sides — Catalyst
    pushes the per-side disjunction residue below the join."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    joined = li.join(F.broadcast(part), part.p_partkey == li.l_partkey)
    cond = (
        (
            (F.col("p_brand") == "Brand#12")
            & F.col("p_size").between(1, 15)
            & F.col("l_quantity").between(1, 11)
        )
        | (
            (F.col("p_brand") == "Brand#23")
            & F.col("p_size").between(1, 25)
            & F.col("l_quantity").between(10, 20)
        )
        | (
            (F.col("p_brand") == "Brand#34")
            & F.col("p_size").between(1, 35)
            & F.col("l_quantity").between(20, 30)
        )
    )
    return joined.filter(cond).agg(
        F.sum(_disc_price()).cast("double").alias("revenue"),
        F.count("*").alias("n"),
    )


@register(
    "q71_returned_item_revenue",
    oracle=f"""
    SELECT c_custkey, c_name,
           CAST(SUM({_SQL_DISC_PRICE}) AS DOUBLE) AS revenue,
           n_name,
           CAST(c_acctbal AS DOUBLE) AS acctbal
    FROM customer
      JOIN orders   ON c_custkey = o_custkey
      JOIN lineitem ON l_orderkey = o_orderkey
      JOIN nation   ON c_nationkey = n_nationkey
    WHERE l_returnflag = 'R'
      AND o_orderdate >= TIMESTAMP '1997-01-01' AND o_orderdate < TIMESTAMP '1998-01-01'
    GROUP BY c_custkey, c_name, n_name, c_acctbal
    ORDER BY revenue DESC, c_custkey
    LIMIT 20
    """,
)
def q71_returned_item_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 shape: returned-item revenue per customer, top 20 —
    fact↔fact join with pushed returnflag/date filters, broadcast dims."""
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    nation = load_table(spark, sf_dir, "nation")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .groupBy("c_custkey", "c_name", "n_name", "c_acctbal")
        .agg(F.sum(_disc_price()).cast("double").alias("revenue"))
        .select(
            "c_custkey", "c_name", "revenue", "n_name",
            F.col("c_acctbal").cast("double").alias("acctbal"),
        )
        .orderBy(F.desc("revenue"), "c_custkey")
        .limit(20)
    )


@register(
    "q73_correlation",
    oracle="""
    WITH s AS (
      SELECT l_returnflag,
             COUNT(*) AS n,
             SUM(CAST(l_quantity AS DECIMAL(18,2))) AS sx,
             SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS sy,
             SUM(CAST(l_quantity AS DECIMAL(18,2)) * CAST(l_quantity AS DECIMAL(18,2))) AS sxx,
             SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(l_extendedprice AS DECIMAL(18,2))) AS syy,
             SUM(CAST(l_quantity AS DECIMAL(18,2)) * CAST(l_extendedprice AS DECIMAL(18,2))) AS sxy
      FROM lineitem GROUP BY l_returnflag)
    SELECT l_returnflag,
           n,
           ROUND((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
                  - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
                 / (SQRT(CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                         - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
                    * SQRT(CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
                           - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))), 6) AS corr_qty_price,
           ROUND((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
                  - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
                 / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE)), 6) AS covar_pop
    FROM s ORDER BY l_returnflag
    """,
)
def q73_correlation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pearson correlation + population covariance per group.

    Built-in ``corr``/``covar_pop`` use engine-specific co-moment
    update orders (never bit-identical across engines), so the exact
    sufficient statistics are aggregated as decimals (order-free) and
    the closed form is evaluated in a double expression tree mirrored
    token-for-token in the oracle. decimal(18,2)² sums cap at
    decimal(38,4) — fine to ~1e15 rows/group; beyond that widen scale.

    Scale: one shuffle on the group key with map-side partials, same
    cost as the built-in — exactness is free here.
    """
    li = load_table(spark, sf_dir, "lineitem")
    dx = F.col("l_quantity").cast("decimal(18,2)")
    dy = F.col("l_extendedprice").cast("decimal(18,2)")
    s = li.groupBy("l_returnflag").agg(
        F.count("*").alias("n"),
        F.sum(dx).alias("sx"),
        F.sum(dy).alias("sy"),
        F.sum(dx * dx).alias("sxx"),
        F.sum(dy * dy).alias("syy"),
        F.sum(dx * dy).alias("sxy"),
    )
    n_d = F.col("n").cast("double")
    sx_d, sy_d = F.col("sx").cast("double"), F.col("sy").cast("double")
    sxx_d, syy_d = F.col("sxx").cast("double"), F.col("syy").cast("double")
    sxy_d = F.col("sxy").cast("double")
    num = n_d * sxy_d - sx_d * sy_d
    return s.select(
        "l_returnflag",
        "n",
        F.round(
            num / (F.sqrt(n_d * sxx_d - sx_d * sx_d) * F.sqrt(n_d * syy_d - sy_d * sy_d)),
            6,
        ).alias("corr_qty_price"),
        F.round(num / (n_d * n_d), 6).alias("covar_pop"),
    ).orderBy("l_returnflag")


@register(
    "q74_modern_aggs",
    oracle="""
    SELECT o_orderpriority,
           CAST(COUNT_IF(o_totalprice > 150000) AS BIGINT) AS n_big,
           BOOL_AND(o_totalprice > 0) AS all_positive,
           BOOL_OR(o_orderstatus = 'P') AS any_pending,
           MAX_BY(o_orderkey,
                  CAST(ROUND(o_totalprice * 100) AS BIGINT) * 100000000 + o_orderkey)
             AS top_order,
    FROM orders
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
    """,
)
def q74_modern_aggs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """count_if / bool_and / bool_or / max_by battery.

    ``max_by`` is nondeterministic on ordering ties in both engines;
    the ordering key is the price scaled to exact cents (2-dp doubles)
    composed with the unique order key — deterministic argmax without
    a window. Key fits BIGINT to ~1e8 orders per 1e8-cent price;
    beyond that use the struct-max form.
    """
    o = load_table(spark, sf_dir, "orders")
    tiekey = (
        F.round(F.col("o_totalprice") * 100).cast("bigint") * F.lit(100000000)
        + F.col("o_orderkey")
    )
    return (
        o.groupBy("o_orderpriority")
        .agg(
            F.expr("count_if(o_totalprice > 150000)").alias("n_big"),
            F.expr("bool_and(o_totalprice > 0)").alias("all_positive"),
            F.expr("bool_or(o_orderstatus = 'P')").alias("any_pending"),
            F.max_by("o_orderkey", tiekey).alias("top_order"),
        )
        .orderBy("o_orderpriority")
    )


@register(
    "q75_lateral_join",
    oracle="""
    SELECT r.r_name, t.n_name, t.n_nationkey
    FROM region r JOIN LATERAL (
      SELECT n_name, n_nationkey FROM nation
      WHERE n_regionkey = r.r_regionkey
      ORDER BY n_nationkey LIMIT 2) t ON TRUE
    ORDER BY r_name, n_nationkey
    """,
)
def q75_lateral_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated LATERAL subquery (top-2 nations per region by key).

    Declared-surface row for lateral joins; Catalyst rewrites
    DomainJoin→window-or-join, so the plan degenerates to the same
    shape as q31's WindowGroupLimit — the point is the SQL surface
    parses and optimizes, not a new physical operator.
    """
    load_table(spark, sf_dir, "region").createOrReplaceTempView("q75_region")
    load_table(spark, sf_dir, "nation").createOrReplaceTempView("q75_nation")
    return spark.sql(
        """
        SELECT r.r_name, t.n_name, t.n_nationkey
        FROM q75_region r JOIN LATERAL (
          SELECT n_name, n_nationkey FROM q75_nation
          WHERE n_regionkey = r.r_regionkey
          ORDER BY n_nationkey LIMIT 2) t
        ORDER BY r_name, n_nationkey
        """
    )


@register(
    "x60_skew_salted_join",
    oracle="""
    SELECT c.c_nationkey AS nationkey,
           COUNT(*) AS n_events,
           CAST(SUM(CAST(e.value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value
    FROM events e JOIN customer c ON e.user_id = c.c_custkey
    GROUP BY c.c_nationkey
    ORDER BY nationkey
    """,
)
def x60_skew_salted_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew-mitigated join (operators/skew.py): the fact side carries a
    row-derived salt, the dim side replicates once per salt, and the
    join key becomes (key, salt) so a hot key spreads over n_salts
    partitions. The oracle is the PLAIN join — the whole point is
    that salting changes the partitioning, never the result, and the
    driver's value-hash gate proves it.

    Scale: this is the plan-level fallback when AQE skew-join can't
    help (broadcast-ineligible dim, hash join already chosen);
    replication cost is n_salts x |dim|, amortized across the hot
    key's partitions.
    """
    from ..operators.skew import salted_join

    ev = load_table(spark, sf_dir, "events")
    cust = load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    joined = salted_join(ev, cust, on=[("user_id", "c_custkey")], n_salts=8)
    return (
        joined.groupBy(F.col("c_nationkey").alias("nationkey"))
        .agg(
            F.count("*").alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,6)")).cast("double").alias("sum_value"),
        )
        .orderBy("nationkey")
    )


@register(
    "q76_exists_subqueries",
    oracle="""
    SELECT c_custkey, c_name
    FROM customer c
    WHERE EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey
                    AND o.o_orderpriority = '1-URGENT')
      AND NOT EXISTS (SELECT 1 FROM orders o
                      WHERE o.o_custkey = c.c_custkey
                        AND o.o_orderstatus = 'P')
    ORDER BY c_custkey
    """,
)
def q76_exists_subqueries(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated EXISTS + NOT EXISTS (Catalyst decorrelates into a
    left-semi and a left-anti join on o_custkey — same physical shape
    as q04/q20, declared here as the SQL surface)."""
    load_table(spark, sf_dir, "customer").createOrReplaceTempView("q76_customer")
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("q76_orders")
    return spark.sql(
        """
        SELECT c_custkey, c_name
        FROM q76_customer c
        WHERE EXISTS (SELECT 1 FROM q76_orders o
                      WHERE o.o_custkey = c.c_custkey
                        AND o.o_orderpriority = '1-URGENT')
          AND NOT EXISTS (SELECT 1 FROM q76_orders o
                          WHERE o.o_custkey = c.c_custkey
                            AND o.o_orderstatus = 'P')
        ORDER BY c_custkey
        """
    )


@register(
    "q77_recursive_cte",
    oracle="""
    WITH RECURSIVE buckets(b_idx, lo, hi) AS (
      SELECT 0, CAST(0 AS DOUBLE), CAST(1024 AS DOUBLE)
      UNION ALL
      SELECT b_idx + 1, hi, hi * 2 FROM buckets WHERE b_idx < 9)
    SELECT b.b_idx, CAST(b.lo AS BIGINT) AS lo, CAST(b.hi AS BIGINT) AS hi,
           COUNT(o.o_orderkey) AS n_orders
    FROM buckets b LEFT JOIN orders o
      ON o.o_totalprice >= b.lo AND o.o_totalprice < b.hi
    GROUP BY b.b_idx, b.lo, b.hi
    ORDER BY b.b_idx
    """,
)
def q77_recursive_cte(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recursive CTE (Spark 4 WITH RECURSIVE): a doubling price ladder
    built iteratively, then an exponential histogram of orders by
    range join against it. The recursion is driver-bounded (10 steps)
    — the iterative plan is the declared surface; the data-touching
    part stays one bounded range join.
    """
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("q77_orders")
    return spark.sql(
        """
        WITH RECURSIVE buckets(b_idx, lo, hi) AS (
          SELECT 0, CAST(0 AS DOUBLE), CAST(1024 AS DOUBLE)
          UNION ALL
          SELECT b_idx + 1, hi, hi * 2 FROM buckets WHERE b_idx < 9)
        SELECT b.b_idx, CAST(b.lo AS BIGINT) AS lo, CAST(b.hi AS BIGINT) AS hi,
               COUNT(o.o_orderkey) AS n_orders
        FROM buckets b LEFT JOIN q77_orders o
          ON o.o_totalprice >= b.lo AND o.o_totalprice < b.hi
        GROUP BY b.b_idx, b.lo, b.hi
        ORDER BY b.b_idx
        """
    )


@register(
    "q80_product_profit",
    oracle=f"""
    SELECT n.n_name AS nation, EXTRACT(YEAR FROM o.o_orderdate) AS yr,
           CAST(ROUND(SUM({_SQL_DISC_PRICE}
                 - CAST(FLOOR(p.p_retailprice * 10) / 100.0 AS DECIMAL(18,2))
                   * CAST(l_quantity AS DECIMAL(18,2))), 4) AS DOUBLE) AS profit
    FROM lineitem
      JOIN orders o ON l_orderkey = o.o_orderkey
      JOIN part p ON l_partkey = p.p_partkey
      JOIN supplier s ON l_suppkey = s.s_suppkey
      JOIN nation n ON s.s_nationkey = n.n_nationkey
    GROUP BY nation, yr
    ORDER BY nation, yr DESC
    """,
)
def q80_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 shape (profit per supplier-nation per year). The
    fixtures carry no partsupp, so supply cost is proxied as 10% of
    p_retailprice — truncated to exact cents via FLOOR (tie-free:
    ROUND on a double differs between engines exactly at half-cent
    ties; FLOOR has no tie) BEFORE the decimal multiply, keeping the
    whole aggregate in order-free decimal arithmetic (a three-way
    decimal product would hit precision-clamp differences between
    engines). n/100.0 for integer n is exactly representable as a
    2-dp decimal, so the double→decimal cast agrees bit-for-bit.

    Scale: one fact shuffle (orders join); part/supplier/nation
    broadcast; the aggregate is partial+final on (nation, yr).
    """
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    part = load_table(spark, sf_dir, "part")
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    cost_unit = (F.floor(F.col("p_retailprice") * 10) / 100.0).cast("decimal(18,2)")
    amount = _disc_price() - cost_unit * _dec("l_quantity")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").cast("bigint").alias("yr"),
        )
        .agg(F.round(F.sum(amount), 4).cast("double").alias("profit"))
        .orderBy("nation", F.desc("yr"))
    )


@register(
    "q81_waiting_supplier",
    oracle="""
    SELECT s.s_name, COUNT(*) AS numwait
    FROM lineitem l1
      JOIN orders o ON l1.l_orderkey = o.o_orderkey
      JOIN supplier s ON l1.l_suppkey = s.s_suppkey
    WHERE o.o_orderstatus = 'F'
      AND l1.l_shipdate > o.o_orderdate + INTERVAL 60 DAY
      AND EXISTS (SELECT 1 FROM lineitem l2
                  WHERE l2.l_orderkey = l1.l_orderkey
                    AND l2.l_suppkey <> l1.l_suppkey)
      AND NOT EXISTS (SELECT 1 FROM lineitem l3
                      WHERE l3.l_orderkey = l1.l_orderkey
                        AND l3.l_suppkey <> l1.l_suppkey
                        AND l3.l_shipdate > o.o_orderdate + INTERVAL 60 DAY)
    GROUP BY s.s_name
    ORDER BY numwait DESC, s.s_name
    """,
)
def q81_waiting_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 shape: the sole late supplier on multi-supplier
    finalized orders. The fixtures carry no receipt/commit dates, so
    'late' is ship > order date + 60 days; the semantics exercised —
    EXISTS + correlated NOT EXISTS on the same fact table, both
    decorrelated by Catalyst into semi/anti joins — are Q21's.
    """
    load_table(spark, sf_dir, "lineitem").createOrReplaceTempView("q81_lineitem")
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("q81_orders")
    load_table(spark, sf_dir, "supplier").createOrReplaceTempView("q81_supplier")
    return spark.sql(
        """
        SELECT s.s_name, COUNT(*) AS numwait
        FROM q81_lineitem l1
          JOIN q81_orders o ON l1.l_orderkey = o.o_orderkey
          JOIN q81_supplier s ON l1.l_suppkey = s.s_suppkey
        WHERE o.o_orderstatus = 'F'
          AND l1.l_shipdate > o.o_orderdate + INTERVAL 60 DAY
          AND EXISTS (SELECT 1 FROM q81_lineitem l2
                      WHERE l2.l_orderkey = l1.l_orderkey
                        AND l2.l_suppkey <> l1.l_suppkey)
          AND NOT EXISTS (SELECT 1 FROM q81_lineitem l3
                          WHERE l3.l_orderkey = l1.l_orderkey
                            AND l3.l_suppkey <> l1.l_suppkey
                            AND l3.l_shipdate > o.o_orderdate + INTERVAL 60 DAY)
        GROUP BY s.s_name
        ORDER BY numwait DESC, s.s_name
        """
    )


@register(
    "q82_dormant_customers",
    oracle="""
    WITH avg_bal AS (
      SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE)
             / COUNT(*) AS ab
      FROM customer WHERE c_acctbal > 0.0)
    SELECT c.c_nationkey AS nationkey,
           COUNT(*) AS numcust,
           CAST(SUM(CAST(c.c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS totacctbal
    FROM customer c, avg_bal
    WHERE c.c_acctbal > avg_bal.ab
      AND NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
    GROUP BY c.c_nationkey
    ORDER BY nationkey
    """,
)
def q82_dormant_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape: customers with above-average positive balance
    and no orders at all (the fixtures have no phone column, so the
    country-code filter is dropped; the Q22 machinery — scalar
    subquery average + anti-join + aggregate — is intact). The average
    is an exact decimal sum divided once in double, mirrored
    token-for-token.
    """
    load_table(spark, sf_dir, "customer").createOrReplaceTempView("q82_customer")
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("q82_orders")
    return spark.sql(
        """
        WITH avg_bal AS (
          SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE)
                 / COUNT(*) AS ab
          FROM q82_customer WHERE c_acctbal > 0.0)
        SELECT c.c_nationkey AS nationkey,
               COUNT(*) AS numcust,
               CAST(SUM(CAST(c.c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS totacctbal
        FROM q82_customer c, avg_bal
        WHERE c.c_acctbal > avg_bal.ab
          AND NOT EXISTS (SELECT 1 FROM q82_orders o
                          WHERE o.o_custkey = c.c_custkey)
        GROUP BY c.c_nationkey
        ORDER BY nationkey
        """
    )
