"""TPC-H hard shapes, part 4 (SURVEY §2B aggregation/join breadth):
min-cost supplier with a correlated-MIN equality (Q2), nation-pair
volume shipping (Q7), returned-item customer ranking (Q10), promo
revenue share (Q14), small-quantity correlated-AVG filter (Q17), and
a disjunctive OR-of-ANDs predicate sum (Q19) — adapted to the fixture
schema (lineitem is the part↔supplier link; no partsupp/shipmode).

Cross-engine determinism (see registry docstring): money math stays in
exact decimals end-to-end; equality/threshold comparisons happen on
exact decimals or on doubles derived from them in one operation;
ratios are a single double division floor-truncated to 6 digits.
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


@register(
    "q91_min_cost_supplier",
    oracle="""
    WITH cost AS (
      SELECT l_partkey AS partkey, l_suppkey AS suppkey,
             SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS supply_cost
      FROM lineitem JOIN part ON l_partkey = p_partkey
      WHERE p_size = 7 AND p_type = 'SMALL'
      GROUP BY partkey, suppkey)
    SELECT p_partkey, p_name, s_suppkey, s_name, n_name,
           CAST(supply_cost AS DOUBLE) AS supply_cost
    FROM cost
      JOIN part ON partkey = p_partkey
      JOIN supplier ON suppkey = s_suppkey
      JOIN nation ON s_nationkey = n_nationkey
    WHERE supply_cost = (SELECT MIN(c2.supply_cost) FROM cost c2
                         WHERE c2.partkey = cost.partkey)
    ORDER BY p_partkey, s_suppkey
    """,
)
def q91_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 shape: per part, keep the supplier(s) achieving the
    minimum supply cost — a correlated scalar-MIN equality, expressed
    as the decorrelated plan Catalyst would produce anyway: per-part
    MIN aggregate joined back on (partkey, cost). Equality is on exact
    decimal sums, so ties resolve identically in both engines.

    Scale: the filtered part dim is broadcast into the fact scan; one
    shuffle builds the (part, supplier) cost table; the per-part MIN is
    a second agg over that already-small table, then a co-partitioned
    join (same key) — AQE keeps it shuffle-local.
    """
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    small = part.filter((F.col("p_size") == 7) & (F.col("p_type") == "SMALL"))
    cost = (
        li.join(F.broadcast(small), F.col("l_partkey") == F.col("p_partkey"))
        .groupBy(
            F.col("l_partkey").alias("partkey"),
            F.col("l_suppkey").alias("suppkey"),
        )
        .agg(F.sum(_dec("l_extendedprice")).alias("supply_cost"))
    )
    min_cost = cost.groupBy("partkey").agg(
        F.min("supply_cost").alias("min_cost")
    )
    return (
        cost.join(
            min_cost,
            (cost.partkey == min_cost.partkey)
            & (cost.supply_cost == min_cost.min_cost),
        )
        .drop(min_cost.partkey)
        .join(F.broadcast(small), F.col("partkey") == F.col("p_partkey"))
        .join(F.broadcast(supp), F.col("suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .select(
            "p_partkey",
            "p_name",
            "s_suppkey",
            "s_name",
            "n_name",
            F.col("supply_cost").cast("double").alias("supply_cost"),
        )
        .orderBy("p_partkey", "s_suppkey")
    )


@register(
    "q92_nation_pair_volume",
    oracle=f"""
    SELECT sn.n_name AS supp_nation, cn.n_name AS cust_nation,
           EXTRACT(YEAR FROM l_shipdate) AS yr,
           CAST(SUM({_SQL_DISC_PRICE}) AS DOUBLE) AS volume,
           COUNT(*) AS n_lines
    FROM lineitem
      JOIN orders ON l_orderkey = o_orderkey
      JOIN customer ON o_custkey = c_custkey
      JOIN supplier ON l_suppkey = s_suppkey
      JOIN nation sn ON s_nationkey = sn.n_nationkey
      JOIN nation cn ON c_nationkey = cn.n_nationkey
    WHERE ((sn.n_name = 'NATION_1' AND cn.n_name = 'NATION_2')
        OR (sn.n_name = 'NATION_2' AND cn.n_name = 'NATION_1'))
      AND l_shipdate >= TIMESTAMP '1997-01-01'
      AND l_shipdate <  TIMESTAMP '1999-01-01'
    GROUP BY supp_nation, cust_nation, yr
    ORDER BY supp_nation, cust_nation, yr
    """,
)
def q92_nation_pair_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 shape: shipping volume between a nation pair, per
    direction and ship year — a two-sided dimension chain (supplier
    nation and customer nation joined independently) with a symmetric
    pair predicate.

    Scale: the fact joins orders on its own key (one shuffle pair);
    customer/supplier/nation are broadcast, and the nation-pair filter
    prunes to two nations *before* the aggregate, so the grouped state
    is tiny. The date window pushes down to the lineitem scan.
    r11 (guide §3.2): each side of the symmetric pair predicate
    implies a NECESSARY single-side condition — the supplier nation
    must be one of the two, and so must the customer nation — so
    lineitem pre-filters through its broadcast supplier chain and
    orders through its broadcast customer chain BEFORE the orderkey
    join: both sides of the only data-sized exchange shrink to the
    two nations' rows (~2/N of each fact) and the exact pair filter
    then runs on the joined survivors, unchanged.
    """
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1999-01-01").cast("timestamp"))
    )
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    sn = nation.select(
        F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("supp_nation")
    )
    cn = nation.select(
        F.col("n_nationkey").alias("cn_key"), F.col("n_name").alias("cust_nation")
    )
    pair = (
        (F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2")
    ) | ((F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1"))
    li_side = (
        li.join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(sn), F.col("s_nationkey") == F.col("sn_key"))
        .filter(F.col("supp_nation").isin("NATION_1", "NATION_2"))
    )
    ord_side = (
        orders.join(F.broadcast(cust), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(cn), F.col("c_nationkey") == F.col("cn_key"))
        .filter(F.col("cust_nation").isin("NATION_1", "NATION_2"))
    )
    return (
        li_side.join(ord_side, F.col("l_orderkey") == F.col("o_orderkey"))
        .filter(pair)
        .groupBy(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").cast("bigint").alias("yr"),
        )
        .agg(
            F.sum(_disc_price()).cast("double").alias("volume"),
            F.count("*").alias("n_lines"),
        )
        .orderBy("supp_nation", "cust_nation", "yr")
    )


@register(
    "q93_returned_items",
    oracle=f"""
    SELECT c_custkey, c_name, n_name,
           CAST(SUM({_SQL_DISC_PRICE}) AS DOUBLE) AS revenue,
           CAST(c_acctbal AS DOUBLE) AS acctbal
    FROM customer
      JOIN orders ON c_custkey = o_custkey
      JOIN lineitem ON l_orderkey = o_orderkey
      JOIN nation ON c_nationkey = n_nationkey
    WHERE l_returnflag = 'R'
      AND o_orderdate >= TIMESTAMP '1997-01-01'
      AND o_orderdate <  TIMESTAMP '1997-07-01'
    GROUP BY c_custkey, c_name, n_name, acctbal
    ORDER BY revenue DESC, c_custkey
    LIMIT 20
    """,
)
def q93_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 shape: top-20 customers by revenue from returned
    items in a two-quarter window. Revenue is the exact decimal sum
    (tie-stable ordering) with c_custkey as the total tiebreaker, so
    the LIMIT selects an identical set in both engines.

    Scale: order-date window prunes orders before the fact join;
    returnflag pushes into the lineitem scan; customer/nation
    broadcast. TakeOrderedAndProject caps driver results at 20 rows.
    """
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-07-01").cast("timestamp"))
    )
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    nation = load_table(spark, sf_dir, "nation")
    return (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(cust), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy(
            "c_custkey",
            "c_name",
            "n_name",
            _dec("c_acctbal").cast("double").alias("acctbal"),
        )
        .agg(F.sum(_disc_price()).cast("double").alias("revenue"))
        .select("c_custkey", "c_name", "n_name", "revenue", "acctbal")
        .orderBy(F.col("revenue").desc(), "c_custkey")
        .limit(20)
    )


@register(
    "q94_promo_revenue",
    oracle=f"""
    SELECT EXTRACT(YEAR FROM l_shipdate) AS yr,
           FLOOR(CAST(SUM(CASE WHEN p_type = 'PROMO'
                               THEN {_SQL_DISC_PRICE}
                               ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE)
                 / CAST(SUM({_SQL_DISC_PRICE}) AS DOUBLE) * 1e8) / 1e6
             AS promo_pct,
           COUNT(*) AS n_lines
    FROM lineitem JOIN part ON l_partkey = p_partkey
    GROUP BY yr
    ORDER BY yr
    """,
)
def q94_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 shape: percentage of revenue from PROMO-type parts,
    per ship year. Conditional decimal sum over total decimal sum, one
    double division scaled to percent, floor-truncated to 6 digits.

    Scale: part is the only dim — broadcast into the fact scan; the
    aggregate groups on ~7 year keys, so partial aggregation collapses
    nearly all rows map-side.
    """
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    zero = F.lit(0).cast("decimal(18,2)")
    promo = F.sum(
        F.when(F.col("p_type") == "PROMO", _disc_price()).otherwise(zero)
    )
    return (
        li.join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .groupBy(F.year("l_shipdate").cast("bigint").alias("yr"))
        .agg(
            (
                F.floor(
                    promo.cast("double")
                    / F.sum(_disc_price()).cast("double")
                    * F.lit(1e8)
                )
                / F.lit(1e6)
            ).alias("promo_pct"),
            F.count("*").alias("n_lines"),
        )
        .orderBy("yr")
    )


@register(
    "q95_small_qty_orders",
    oracle="""
    WITH avg_qty AS (
      SELECT l_partkey AS partkey,
             CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE)
               / COUNT(*) AS avg_q
      FROM lineitem
      GROUP BY partkey)
    SELECT p_brand,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
             AS small_qty_revenue,
           COUNT(*) AS n_lines
    FROM lineitem
      JOIN part ON l_partkey = p_partkey
      JOIN avg_qty ON l_partkey = partkey
    WHERE CAST(l_quantity AS DOUBLE) < 0.5 * avg_q
    GROUP BY p_brand
    ORDER BY p_brand
    """,
)
def q95_small_qty_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 shape: lines whose quantity is below half the
    per-part average — the correlated-AVG filter, decorrelated into a
    per-part aggregate joined back to the fact (the plan Catalyst
    produces for the correlated form). The average is one double
    division of an exact decimal sum by an exact count; the 0.5×
    threshold is a single double multiply — bit-identical across
    engines.

    Scale: two shuffles on the same key (l_partkey) — AQE reuses the
    exchange; part is broadcast. Grouped output is brand-cardinality.
    """
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    avg_qty = li.groupBy(F.col("l_partkey").alias("partkey")).agg(
        (
            F.sum(_dec("l_quantity")).cast("double") / F.count("*")
        ).alias("avg_q")
    )
    return (
        li.join(avg_qty, F.col("l_partkey") == F.col("partkey"))
        .filter(F.col("l_quantity").cast("double") < F.lit(0.5) * F.col("avg_q"))
        .join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("p_brand")
        .agg(
            F.sum(_dec("l_extendedprice")).cast("double").alias("small_qty_revenue"),
            F.count("*").alias("n_lines"),
        )
        .orderBy("p_brand")
    )


@register(
    "q96_disjunctive_predicate",
    oracle=f"""
    SELECT CAST(SUM({_SQL_DISC_PRICE}) AS DOUBLE) AS revenue,
           COUNT(*) AS n_lines
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 15
           AND CAST(l_quantity AS DOUBLE) BETWEEN 1 AND 21)
       OR (p_brand = 'Brand#2' AND p_size BETWEEN 1 AND 25
           AND CAST(l_quantity AS DOUBLE) BETWEEN 10 AND 30)
       OR (p_brand = 'Brand#3' AND p_size BETWEEN 1 AND 35
           AND CAST(l_quantity AS DOUBLE) BETWEEN 20 AND 40)
    """,
)
def q96_disjunctive_predicate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 shape: revenue under an OR of three ANDed
    brand/size/quantity envelopes — the disjunctive-predicate join
    (each disjunct touches both sides, so it can't split into a plain
    pre-filter; Catalyst still pushes the brand/size union down to the
    part scan via constraint propagation).

    Scale: part broadcast; one pass over the fact, global agg (1 row).
    """
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    qty = F.col("l_quantity").cast("double")

    def envelope(brand: str, size_hi: int, q_lo: int, q_hi: int):
        return (
            (F.col("p_brand") == brand)
            & F.col("p_size").between(1, size_hi)
            & qty.between(q_lo, q_hi)
        )

    cond = (
        envelope("Brand#1", 15, 1, 21)
        | envelope("Brand#2", 25, 10, 30)
        | envelope("Brand#3", 35, 20, 40)
    )
    return (
        li.join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .filter(cond)
        .agg(
            F.sum(_disc_price()).cast("double").alias("revenue"),
            F.count("*").alias("n_lines"),
        )
    )


@register(
    "q99_pipe_syntax",
    oracle=f"""
    SELECT o_orderpriority,
           CAST(SUM({_SQL_DISC_PRICE}) AS DOUBLE) AS revenue,
           COUNT(*) AS n_lines
    FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    WHERE l_shipdate >= TIMESTAMP '1997-01-01'
      AND l_shipdate <  TIMESTAMP '1998-01-01'
    GROUP BY o_orderpriority
    HAVING COUNT(*) > 100
    ORDER BY o_orderpriority
    """,
)
def q99_pipe_syntax(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark 4 SQL pipe syntax (`|>`): the same scan → filter → join →
    aggregate → post-agg filter → order chain as its ANSI twin, but
    written as sequential pipe stages — Catalyst parses both to the
    identical logical plan, so this verifies the modern SQL surface
    end-to-end rather than adding a new operator.
    """
    _views(spark, sf_dir, "lineitem", "orders")
    return spark.sql(
        """
        FROM lineitem
        |> WHERE l_shipdate >= TIMESTAMP '1997-01-01'
           AND l_shipdate < TIMESTAMP '1998-01-01'
        |> JOIN orders ON l_orderkey = o_orderkey
        |> AGGREGATE
             CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                  * (CAST(1 AS DECIMAL(6,4)) - CAST(l_discount AS DECIMAL(6,4))))
                  AS DOUBLE) AS revenue,
             COUNT(*) AS n_lines
           GROUP BY o_orderpriority
        |> WHERE n_lines > 100
        |> ORDER BY o_orderpriority
        |> SELECT o_orderpriority, revenue, n_lines
        """
    )


@register(
    "q100_histogram",
    oracle="""
    WITH bucketed AS (
      SELECT CAST(FLOOR(CAST(o_totalprice AS DOUBLE) / 25000.0) AS BIGINT)
               AS bucket
      FROM orders)
    SELECT bucket,
           bucket * 25000.0 AS lo,
           (bucket + 1) * 25000.0 AS hi,
           COUNT(*) AS n_orders,
           FLOOR(COUNT(*) * 1e6 / SUM(COUNT(*)) OVER ()) / 1e4 AS pct
    FROM bucketed
    GROUP BY bucket
    ORDER BY bucket
    """,
)
def q100_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-width histogram of order value (the BI distribution
    shape): one double division + floor per row for the bucket, counts
    per bucket, percent-of-total via a window over the aggregate
    output (integer-exact until the one floored division).

    Scale: map-side combine collapses the fact to bucket cardinality
    before the shuffle; the percent window runs over ~40 rows.
    """
    orders = load_table(spark, sf_dir, "orders")
    bucket = F.floor(F.col("o_totalprice").cast("double") / F.lit(25000.0)).cast(
        "bigint"
    )
    from pyspark.sql import Window as W

    return (
        orders.select(bucket.alias("bucket"))
        .groupBy("bucket")
        .agg(F.count("*").alias("n_orders"))
        .select(
            "bucket",
            (F.col("bucket") * 25000.0).alias("lo"),
            ((F.col("bucket") + 1) * 25000.0).alias("hi"),
            "n_orders",
            (
                F.floor(
                    F.col("n_orders") * F.lit(1e6) / F.sum("n_orders").over(W.partitionBy())
                )
                / F.lit(1e4)
            ).alias("pct"),
        )
        .orderBy("bucket")
    )


@register(
    "q103_robust_stats",
    oracle="""
    SELECT l_returnflag,
           ROUND(MEDIAN(CAST(l_extendedprice AS DOUBLE)), 6) AS med_price,
           ROUND(MAD(CAST(l_extendedprice AS DOUBLE)), 6) AS mad_price,
           COUNT(*) AS n_lines
    FROM lineitem
    GROUP BY l_returnflag
    ORDER BY l_returnflag
    """,
)
def q103_robust_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust statistics: per-group exact median and median absolute
    deviation. Spark has no MAD aggregate, so the engine runs the
    two-pass form — group medians, broadcast back, median of absolute
    deviations — which is also the scale shape (each pass is one
    sort-based exact percentile per group; swap in approx_percentile
    at 100 TB as with q29/q72). Both engines interpolate even-count
    medians identically ((a+b)/2 on the same IEEE doubles).
    """
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_returnflag", F.col("l_extendedprice").cast("double").alias("p")
    )
    med = li.groupBy("l_returnflag").agg(F.median("p").alias("med"))
    return (
        li.join(F.broadcast(med), "l_returnflag")
        .groupBy("l_returnflag")
        .agg(
            F.round(F.first("med"), 6).alias("med_price"),
            F.round(F.median(F.abs(F.col("p") - F.col("med"))), 6).alias("mad_price"),
            F.count("*").alias("n_lines"),
        )
        .orderBy("l_returnflag")
    )


@register(
    "q104_filter_clause",
    oracle="""
    SELECT l_returnflag,
           COUNT(*) AS n_all,
           COUNT(*) FILTER (WHERE l_quantity > 25) AS n_big,
           CAST(SUM(CAST(l_quantity AS BIGINT))
                FILTER (WHERE l_discount = 0) AS BIGINT) AS qty_no_disc,
           COUNT(DISTINCT l_suppkey) FILTER (WHERE l_returnflag = 'R')
             AS supp_returned,
           ROUND(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)))
                      FILTER (WHERE l_linestatus = 'F') AS DOUBLE),
                 2) AS price_f_status
    FROM lineitem
    GROUP BY l_returnflag
    ORDER BY l_returnflag
    """,
)
def q104_filter_clause(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANSI aggregate FILTER clause — per-aggregate predicates in one
    grouped pass (the conditional-aggregation surface both engines
    parse natively; one hash-agg, no self-joins or CASE pyramids).
    """
    _views(spark, sf_dir, "lineitem")
    return spark.sql(
        """
        SELECT l_returnflag,
               COUNT(*) AS n_all,
               COUNT(*) FILTER (WHERE l_quantity > 25) AS n_big,
               SUM(CAST(l_quantity AS BIGINT))
                 FILTER (WHERE l_discount = 0) AS qty_no_disc,
               COUNT(DISTINCT l_suppkey) FILTER (WHERE l_returnflag = 'R')
                 AS supp_returned,
               ROUND(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)))
                          FILTER (WHERE l_linestatus = 'F')
                          AS DOUBLE), 2) AS price_f_status
        FROM lineitem
        GROUP BY l_returnflag
        ORDER BY l_returnflag
        """
    )


@register(
    "q105_listagg",
    oracle="""
    SELECT n_regionkey,
           STRING_AGG(n_name, '|' ORDER BY n_name) AS nations,
           STRING_AGG(DISTINCT SUBSTRING(n_name, 1, 1), ''
                      ORDER BY SUBSTRING(n_name, 1, 1)) AS initials
    FROM nation
    GROUP BY n_regionkey
    ORDER BY n_regionkey
    """,
)
def q105_listagg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Native LISTAGG ... WITHIN GROUP (Spark 4.0 SQL:2023 surface) —
    ordered and DISTINCT-ordered string aggregation (q38 carries the
    portable sort_array(collect_list) form; this locks the standard
    function itself).
    """
    _views(spark, sf_dir, "nation")
    return spark.sql(
        """
        SELECT n_regionkey,
               LISTAGG(n_name, '|') WITHIN GROUP (ORDER BY n_name) AS nations,
               LISTAGG(DISTINCT SUBSTRING(n_name, 1, 1), '')
                 WITHIN GROUP (ORDER BY SUBSTRING(n_name, 1, 1)) AS initials
        FROM nation
        GROUP BY n_regionkey
        ORDER BY n_regionkey
        """
    )


@register(
    "q106_group_order_all",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty,
           COUNT(*) AS n_lines
    FROM lineitem
    GROUP BY ALL
    ORDER BY ALL
    """,
)
def q106_group_order_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUP BY ALL / ORDER BY ALL (the DuckDB-popularized shorthand,
    in Spark 4 SQL): grouping keys inferred from the non-aggregate
    select list, total order over the full output row — same plan as
    the explicit form.
    """
    _views(spark, sf_dir, "lineitem")
    return spark.sql(
        """
        SELECT l_returnflag, l_linestatus,
               SUM(CAST(l_quantity AS BIGINT)) AS sum_qty,
               COUNT(*) AS n_lines
        FROM lineitem
        GROUP BY ALL
        ORDER BY ALL
        """
    )


@register(
    "q108_central_tendency",
    oracle="""
    WITH mode_m AS (
      SELECT l_returnflag, mo AS mode_month FROM (
        SELECT l_returnflag, CAST(MONTH(l_shipdate) AS INT) AS mo,
               ROW_NUMBER() OVER (PARTITION BY l_returnflag
                                  ORDER BY COUNT(*) DESC, mo ASC) AS rn
        FROM lineitem GROUP BY l_returnflag, mo) WHERE rn = 1),
    stats AS (
      SELECT l_returnflag,
             ROUND(MEDIAN(l_quantity), 2) AS med_qty,
             ROUND(QUANTILE_DISC(l_extendedprice, 0.25), 2) AS p25_price
      FROM lineitem GROUP BY l_returnflag)
    SELECT s.l_returnflag, s.med_qty, s.p25_price, m.mode_month
    FROM stats s JOIN mode_m m USING (l_returnflag)
    ORDER BY l_returnflag
    """,
)
def q108_central_tendency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact central-tendency aggregate battery: MEDIAN (interpolating
    exact median), PERCENTILE_DISC ... WITHIN GROUP (discrete quantile
    — always an actual data value, so no float interpolation hazard),
    and deterministic MODE (Spark's ``mode(col, true)`` resolves ties
    to the lowest value; the DuckDB twin spells the same argmax out
    with an explicit window, since its ``mode()`` tie-break is
    unspecified).

    Scale: all three are single-pass sort-based aggregates per group
    over one uniform-key shuffle; MEDIAN/PERCENTILE_DISC buffer per
    group — bounded here by group count (3 return flags), the shape to
    watch at 100 TB is per-group cardinality, for which the approx
    variants (q72) are the escape hatch.
    """
    _views(spark, sf_dir, "lineitem")
    return spark.sql(
        """
        SELECT l_returnflag,
               ROUND(MEDIAN(l_quantity), 2) AS med_qty,
               ROUND(PERCENTILE_DISC(0.25)
                     WITHIN GROUP (ORDER BY l_extendedprice), 2) AS p25_price,
               MODE(CAST(MONTH(l_shipdate) AS INT), true) AS mode_month
        FROM lineitem
        GROUP BY l_returnflag
        ORDER BY l_returnflag
        """
    )


@register(
    "q109_sql_udf",
    oracle=f"""
    SELECT l_returnflag,
           CAST(ROUND(SUM({_SQL_DISC_PRICE}
                * (CAST(1 AS DECIMAL(6,4)) + CAST(l_tax AS DECIMAL(6,4)))), 4)
                AS DOUBLE) AS sum_charge,
           COUNT(*) AS n_lines
    FROM lineitem
    WHERE l_discount > 0.05
    GROUP BY l_returnflag
    ORDER BY l_returnflag
    """,
)
def q109_sql_udf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQL scalar UDF (Spark 4 ``CREATE TEMPORARY FUNCTION ... RETURN
    expr``): the TPC-H charge formula packaged as a catalog function
    and used inside an aggregate. SQL UDFs inline into the plan at
    analysis time — the optimized plan is identical to writing the
    expression inline (no Python boundary, full codegen), which is
    exactly why they're the preferred reuse mechanism over Python UDFs.
    The oracle inlines the same expression; money math stays decimal
    end-to-end so the SUM is order-insensitive.
    """
    _views(spark, sf_dir, "lineitem")
    spark.sql(
        """
        CREATE OR REPLACE TEMPORARY FUNCTION eng_charge(
            price DOUBLE, disc DOUBLE, tax DOUBLE)
        RETURNS DECIMAL(28,10)
        RETURN CAST(price AS DECIMAL(18,2))
               * (CAST(1 AS DECIMAL(6,4)) - CAST(disc AS DECIMAL(6,4)))
               * (CAST(1 AS DECIMAL(6,4)) + CAST(tax AS DECIMAL(6,4)))
        """
    )
    return spark.sql(
        """
        SELECT l_returnflag,
               CAST(ROUND(SUM(eng_charge(l_extendedprice, l_discount, l_tax)), 4)
                    AS DOUBLE) AS sum_charge,
               COUNT(*) AS n_lines
        FROM lineitem
        WHERE l_discount > 0.05
        GROUP BY l_returnflag
        ORDER BY l_returnflag
        """
    )


@register(
    "q110_grouping_id",
    oracle="""
    SELECT COALESCE(l_returnflag, 'ALL') AS rf,
           COALESCE(l_linestatus, 'ALL') AS ls,
           CAST(GROUPING(l_returnflag) AS INT) AS g_rf,
           CAST(GROUPING_ID(l_returnflag, l_linestatus) AS BIGINT) AS gid,
           CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty
    FROM lineitem
    GROUP BY ROLLUP(l_returnflag, l_linestatus)
    ORDER BY gid, rf, ls
    """,
)
def q110_grouping_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUPING()/GROUPING_ID() over ROLLUP: the functions that let a
    consumer tell a real NULL key from a subtotal row — both engines
    agree on the bit order (first argument = most significant), which
    this query pins down cross-engine.
    """
    _views(spark, sf_dir, "lineitem")
    return spark.sql(
        """
        SELECT COALESCE(l_returnflag, 'ALL') AS rf,
               COALESCE(l_linestatus, 'ALL') AS ls,
               CAST(GROUPING(l_returnflag) AS INT) AS g_rf,
               CAST(GROUPING_ID(l_returnflag, l_linestatus) AS BIGINT) AS gid,
               SUM(CAST(l_quantity AS BIGINT)) AS sum_qty
        FROM lineitem
        GROUP BY ROLLUP(l_returnflag, l_linestatus)
        ORDER BY gid, rf, ls
        """
    )


@register(
    "q111_named_window",
    oracle="""
    SELECT o_custkey, o_orderkey,
           RANK() OVER w AS rnk,
           CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(18,2))) OVER w, 2)
                AS DOUBLE) AS run_spend
    FROM orders
    WHERE o_custkey < 50
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
    ORDER BY o_custkey, o_orderkey
    """,
)
def q111_named_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Named WINDOW clause (SQL:2003 `WINDOW w AS (...)`): one spec
    shared by several window functions — the analyzer expands it, so
    the plan is identical to repeating the inline spec, and a single
    Window physical operator computes both functions in one pass over
    one (o_custkey)-keyed shuffle. Running sum in exact decimals;
    (o_orderdate, o_orderkey) is a total order so ties can't flake.
    """
    _views(spark, sf_dir, "orders")
    return spark.sql(
        """
        SELECT o_custkey, o_orderkey,
               RANK() OVER w AS rnk,
               CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(18,2))) OVER w, 2)
                    AS DOUBLE) AS run_spend
        FROM orders
        WHERE o_custkey < 50
        WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
        ORDER BY o_custkey, o_orderkey
        """
    )


@register(
    "q112_cluster_by",
    oracle="""
    SELECT o_orderpriority, COUNT(*) AS n_orders,
           CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(18,2))), 2) AS DOUBLE)
               AS total_spend
    FROM orders
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
    """,
)
def q112_cluster_by(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark's physical-layout SQL surface: the inner `CLUSTER BY`
    (= DISTRIBUTE BY + SORT BY) hash-partitions and sorts by the key,
    and the outer aggregate reuses that distribution (no second hash
    exchange — verified: 2 exchanges total, the cluster-by hash + the
    final ORDER BY range). The trade-off to know at 100 TB: the
    forced distribution shuffles FULL rows before aggregating, where
    a plain groupBy shuffles map-side partials — so this layout only
    pays when several same-key operations share the one exchange.
    Results are layout-invariant (oracle = plain aggregate);
    determinism comes from the final ORDER BY, never physical order.
    """
    _views(spark, sf_dir, "orders")
    return spark.sql(
        """
        SELECT o_orderpriority, COUNT(*) AS n_orders,
               CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(18,2))), 2) AS DOUBLE)
                   AS total_spend
        FROM (SELECT * FROM orders CLUSTER BY o_orderpriority)
        GROUP BY o_orderpriority
        ORDER BY o_orderpriority
        """
    )


@register(
    "q113_offset_pagination",
    oracle="""
    SELECT o_orderkey, o_custkey,
           CAST(o_totalprice AS DOUBLE) AS o_totalprice
    FROM orders
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 20 OFFSET 40
    """,
)
def q113_offset_pagination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LIMIT ... OFFSET pagination (page 3 of a spend-ranked list)
    over a total order (price DESC, key tiebreak — OFFSET over a
    non-total order would be nondeterministic and uncheckable).

    Scale: Spark folds this into TakeOrderedAndProject with the
    offset applied after the per-partition top-(limit+offset) merge —
    each task keeps 60 rows, no global sort materializes. Deep pages
    degrade as offset grows (every task must carry limit+offset
    rows); keyset pagination (WHERE key > last_seen) is the 100 TB
    pattern, which is plain filtered top-k (q03's shape).
    """
    _views(spark, sf_dir, "orders")
    return spark.sql(
        """
        SELECT o_orderkey, o_custkey,
               CAST(o_totalprice AS DOUBLE) AS o_totalprice
        FROM orders
        ORDER BY o_totalprice DESC, o_orderkey
        LIMIT 20 OFFSET 40
        """
    )


@register(
    "x74_hll_rollup",
    oracle="""
    SELECT r_name, COUNT(DISTINCT n_name) AS n_nations,
           COUNT(DISTINCT o_custkey) AS exact_customers,
           TRUE AS hll_ok
    FROM orders
      JOIN customer ON o_custkey = c_custkey
      JOIN nation ON c_nationkey = n_nationkey
      JOIN region ON n_regionkey = r_regionkey
    GROUP BY r_name
    ORDER BY r_name
    """,
)
def x74_hll_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable-sketch rollup (Spark 3.5+ DataSketches HLL): build
    one HLL sketch of distinct customers per nation, then UNION the
    nation sketches up to the region grain and estimate — the pattern
    that makes 100 TB distinct-count rollups cheap: partials are
    built once at the fine grain and re-aggregated at every coarser
    grain without rescanning the facts (a COUNT(DISTINCT) per grain
    would rescan + reshuffle raw keys each time). HLL register-merge
    is max-per-register, so estimates are order- and
    partitioning-insensitive.

    Invariant form (r6 verdict): the sketch bytes aren't reproducible
    in DuckDB, so the query ALSO computes the exact per-region
    distinct count and emits exact values + a ±5% closeness boolean
    checked in exact integer arithmetic (|est − exact| · 20 ≤ exact).
    lgConfigK is pinned at 14 (r9 recalibration, NOT the 12 default):
    the synthetic 8× margin probe measured 3.87% at lgK=12 on 1.2 M
    distinct — headroom only 1.29× against the gate, the same
    non-monotone-error class that actually CROSSED q56's gate (see
    SKETCH_MARGINS.md). At lgK=14 (16 KB registers per group, still
    trivially mergeable) measured error peaks at 1.40% across all
    five probe corpora — ≥3.5× headroom. The DuckDB twin states the
    exact counts + literal TRUE. Closeness to exact is additionally
    asserted in tests/test_operators.py."""
    _views(spark, sf_dir, "customer", "nation", "region", "orders")
    cust = spark.sql(
        """
        SELECT r_name, n_name, o_custkey
        FROM orders
          JOIN customer ON o_custkey = c_custkey
          JOIN nation ON c_nationkey = n_nationkey
          JOIN region ON n_regionkey = r_regionkey
        """
    )
    nation_sketch = cust.groupBy("r_name", "n_name").agg(
        F.hll_sketch_agg("o_custkey", 14).alias("sk")
    )
    rollup = nation_sketch.groupBy("r_name").agg(
        F.count("*").cast("bigint").alias("n_nations"),
        F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("est"),
    )
    # Exact twin: an ordinary two-stage distinct aggregate (partial
    # dedup map-side, one shuffle on the key) — NOT a collect_set
    # rollup, which would materialize every distinct key as an
    # in-memory array per group. Region-grain join (5 rows) to attach.
    exact = cust.groupBy("r_name").agg(
        F.countDistinct("o_custkey").cast("bigint").alias("exact_customers")
    )
    return (
        rollup.join(exact, "r_name")
        .select(
            "r_name",
            "n_nations",
            "exact_customers",
            (
                F.abs(F.col("est") - F.col("exact_customers")) * F.lit(20)
                <= F.col("exact_customers")
            ).alias("hll_ok"),
        )
        .orderBy("r_name")
    )


@register(
    "q115_multicol_in",
    oracle="""
    -- DuckDB's binder rejects row-value IN subqueries, so the twin
    -- spells out the identical semantics as a correlated EXISTS over
    -- the same grouped subquery (both plan as a compound-key semi join)
    SELECT l.l_orderkey, l.l_partkey, l.l_suppkey,
           CAST(l.l_quantity AS BIGINT) AS qty
    FROM lineitem l
    WHERE EXISTS (
      SELECT 1 FROM lineitem g
      WHERE g.l_partkey = l.l_partkey AND g.l_suppkey = l.l_suppkey
      GROUP BY g.l_partkey, g.l_suppkey
      HAVING COUNT(*) >= 4)
    ORDER BY l.l_orderkey, l.l_partkey, l.l_suppkey, qty
    """,
)
def q115_multicol_in(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-column IN subquery — `(a, b) IN (SELECT a, b ...)`: all
    lineitems whose (part, supplier) pairing recurs ≥4 times. Both
    engines plan the row-value IN as a left-semi join on the compound
    key; Catalyst rewrites it without a manual struct() workaround.

    Scale: the subquery is a partial-agg over the same (partkey,
    suppkey) key the semi-join then uses, so AQE lines both up on one
    uniform compound key — no row-value comparison ever materializes.
    """
    _views(spark, sf_dir, "lineitem")
    return spark.sql(
        """
        SELECT l_orderkey, l_partkey, l_suppkey,
               CAST(l_quantity AS BIGINT) AS qty
        FROM lineitem
        WHERE (l_partkey, l_suppkey) IN (
          SELECT l_partkey, l_suppkey FROM lineitem
          GROUP BY l_partkey, l_suppkey
          HAVING COUNT(*) >= 4)
        ORDER BY l_orderkey, l_partkey, l_suppkey, qty
        """
    )


@register(
    "q116_parameterized_sql",
    oracle="""
    SELECT o_orderpriority, COUNT(*) AS n_orders
    FROM orders
    WHERE o_totalprice > 100000.0 AND o_orderstatus = 'O'
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
    """,
)
def q116_parameterized_sql(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Parameterized SQL (`spark.sql(query, args=...)`, Spark 3.4+):
    named `:param` markers bound server-side as typed literals — the
    injection-safe form of templated queries (string-formatted SQL is
    the anti-pattern this API retires). The binder folds the
    parameters into the plan exactly as literals, so pushdown and
    constant folding see them (the price predicate reaches the scan
    as a pushed filter, same as q01's literal).
    """
    _views(spark, sf_dir, "orders")
    return spark.sql(
        """
        SELECT o_orderpriority, COUNT(*) AS n_orders
        FROM orders
        WHERE o_totalprice > :min_price AND o_orderstatus = :status
        GROUP BY o_orderpriority
        ORDER BY o_orderpriority
        """,
        args={"min_price": 100000.0, "status": "O"},
    )


@register(
    "q117_collation",
    oracle="""
    SELECT n_name, COUNT(*) AS n_customers
    FROM customer JOIN nation ON c_nationkey = n_nationkey
    WHERE c_mktsegment COLLATE NOCASE = 'building'
    GROUP BY n_name
    ORDER BY n_name
    """,
)
def q117_collation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Collated comparison (Spark 4 collations): a case-insensitive
    segment filter via `COLLATE UTF8_LCASE` (DuckDB twin: NOCASE) —
    the declarative alternative to LOWER()-wrapping both sides, which
    keeps the predicate sargable for collation-aware sources. Output
    groups by the uncollated nation key, so no representative-value
    nondeterminism leaks into the result.
    """
    _views(spark, sf_dir, "customer", "nation")
    return spark.sql(
        """
        SELECT n_name, COUNT(*) AS n_customers
        FROM customer JOIN nation ON c_nationkey = n_nationkey
        WHERE c_mktsegment COLLATE UTF8_LCASE = 'building'
        GROUP BY n_name
        ORDER BY n_name
        """
    )


# ---- x122: order-total financial consistency audit ----


@register(
    "x122_order_total_audit",
    oracle="""
    WITH calc AS (
      SELECT l_orderkey,
             SUM(CAST(l_extendedprice * (1 - l_discount) * (1 + l_tax)
                      AS DECIMAL(18,4))) AS calc_total
      FROM lineitem GROUP BY l_orderkey),
    diffs AS (
      SELECT o.o_orderstatus,
             ABS(CAST(o.o_totalprice AS DECIMAL(18,4)) - c.calc_total)
               AS ad
      FROM orders o JOIN calc c ON o.o_orderkey = c.l_orderkey)
    SELECT o_orderstatus,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(SUM(CASE WHEN ad <= 0.01 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_consistent,
           CAST(MAX(ad) AS DOUBLE) AS max_abs_diff,
           ROUND(CAST(SUM(ad) AS DOUBLE) / COUNT(*), 4) AS avg_abs_diff
    FROM diffs
    GROUP BY o_orderstatus
    ORDER BY o_orderstatus
    """,
)
def x122_order_total_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Financial-consistency audit: every order's stored total
    against the recomputed ``Σ extprice·(1−disc)·(1+tax)`` over its
    line items — per status, how many orders reconcile within a cent
    and how far the rest drift. The cross-table invariant check a
    warehouse runs after every load (x114 checks key integrity; this
    checks VALUE integrity). On the synthetic fixtures the stored
    totals are deliberately unreconciled — the audit's job is to
    report that, and both engines must agree on exactly how
    unreconciled.

    Determinism: the per-row product is one fixed double sequence,
    immediately cast to DECIMAL(18,4); per-order sums and diffs then
    stay exact decimal, so thresholds and maxima are bit-exact; one
    final avg division.

    Scale: one fact-fact join on the uniform orderkey (co-located
    when both tables bucket by it) + a status rollup. The per-order
    sum partial-aggregates map-side.
    """
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    calc = li.groupBy("l_orderkey").agg(
        F.sum(
            (
                F.col("l_extendedprice")
                * (1 - F.col("l_discount"))
                * (1 + F.col("l_tax"))
            ).cast("decimal(18,4)")
        ).alias("calc_total")
    )
    diffs = orders.join(
        calc, orders["o_orderkey"] == calc["l_orderkey"]
    ).select(
        "o_orderstatus",
        F.abs(
            F.col("o_totalprice").cast("decimal(18,4)")
            - F.col("calc_total")
        ).alias("ad"),
    )
    return (
        diffs.groupBy("o_orderstatus")
        .agg(
            F.count("*").cast("bigint").alias("n_orders"),
            F.sum(F.when(F.col("ad") <= 0.01, 1).otherwise(0))
            .cast("bigint")
            .alias("n_consistent"),
            F.max("ad").cast("double").alias("max_abs_diff"),
            F.round(
                F.sum("ad").cast("double") / F.count("*"), 4
            ).alias("avg_abs_diff"),
        )
        .orderBy("o_orderstatus")
    )


# ---- x125: top-k per group WITH TIES ----


@register(
    "x125_topk_with_ties",
    oracle="""
    WITH ranked AS (
      SELECT o_custkey, o_orderkey,
             CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT) AS cents,
             RANK() OVER (PARTITION BY o_custkey % 10
                          ORDER BY CAST(FLOOR(o_totalprice * 100 + 0.5)
                                        AS BIGINT) DESC)
               AS rnk,
             o_custkey % 10 AS grp
      FROM orders)
    SELECT grp, rnk, CAST(o_orderkey AS BIGINT) AS o_orderkey,
           cents AS total_cents
    FROM ranked WHERE rnk <= 3
    ORDER BY grp, rnk, o_orderkey
    """,
)
def x125_topk_with_ties(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-k per group WITH TIES (ANSI ``FETCH FIRST k ROWS WITH
    TIES`` semantics): RANK instead of ROW_NUMBER, so every row tying
    the k-th value survives — the form reports need when truncating a
    tie would misstate a leaderboard (q31 is the arbitrary-tiebreak
    sibling).

    Tie detection ranks on exact integer cents computed by an
    identical IEEE fold on both engines (``FLOOR(x*100 + 0.5)``):
    the r5 driver caught the previous double→DECIMAL(18,2) rank key
    rounding an .xx5 tie differently across DuckDB builds — the cast
    is engine-version-sensitive, the integer fold is not (SURVEY §2G
    determinism rules).

    Scale: same WindowGroupLimit-eligible shape as q31 — rank
    filters push into the shuffle so each partition keeps only its
    top rows (plus ties) before the exchange.
    """
    from pyspark.sql.window import Window

    orders = load_table(spark, sf_dir, "orders")
    grp = (F.col("o_custkey") % 10).alias("grp")
    cents = F.floor(F.col("o_totalprice") * 100 + 0.5).cast("bigint")
    w = Window.partitionBy(F.col("o_custkey") % 10).orderBy(cents.desc())
    return (
        orders.select(
            grp,
            "o_orderkey",
            cents.alias("cents"),
            F.rank().over(w).alias("rnk"),
        )
        .filter(F.col("rnk") <= 3)
        .select(
            "grp",
            "rnk",
            F.col("o_orderkey").cast("bigint").alias("o_orderkey"),
            F.col("cents").alias("total_cents"),
        )
        .orderBy("grp", "rnk", "o_orderkey")
    )


# ---- x126: Gini revenue concentration per market segment ----


@register(
    "x126_gini_concentration",
    oracle="""
    WITH rev AS (
      SELECT c.c_mktsegment AS segment, c.c_custkey,
             SUM(CAST(o.o_totalprice AS DECIMAL(18,2))) AS r
      FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
      GROUP BY c.c_mktsegment, c.c_custkey),
    ranked AS (
      SELECT segment, r,
             ROW_NUMBER() OVER (PARTITION BY segment
                                ORDER BY r, c_custkey) AS i,
             COUNT(*) OVER (PARTITION BY segment) AS n
      FROM rev)
    SELECT segment,
           CAST(MAX(n) AS BIGINT) AS n_customers,
           ROUND(CAST(SUM(r) AS DOUBLE), 2) AS total_revenue,
           ROUND(CAST(2 * SUM(i * r) - (MAX(n) + 1) * SUM(r) AS DOUBLE)
                 / (MAX(n) * CAST(SUM(r) AS DOUBLE)), 6) AS gini
    FROM ranked
    GROUP BY segment
    ORDER BY segment
    """,
)
def x126_gini_concentration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue-concentration audit: the Gini coefficient of per-
    customer revenue within each market segment, from the exact rank
    formula G = (2·Σ i·xᵢ − (n+1)·Σ xᵢ) / (n·Σ xᵢ) over revenues
    sorted ascending (custkey tiebreak). Σ i·xᵢ and Σ xᵢ stay exact
    DECIMAL (rank × decimal is decimal), so the whole statistic is
    one final division — the whale-dependence number next to x121's
    segment matrix. The same shape measures corpus-contribution
    inequality across sources in the prep pipeline.

    Scale: one per-customer agg (broadcast dim join), a per-segment
    rank window over the CUSTOMER table, and an S-row rollup.
    """
    from pyspark.sql.window import Window

    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    rev = (
        orders.join(
            F.broadcast(cust), orders["o_custkey"] == cust["c_custkey"]
        )
        .groupBy(F.col("c_mktsegment").alias("segment"), "c_custkey")
        .agg(
            F.sum(F.col("o_totalprice").cast("decimal(18,2)")).alias("r")
        )
    )
    w = Window.partitionBy("segment").orderBy("r", "c_custkey")
    ranked = rev.select(
        "segment",
        "r",
        F.row_number().over(w).alias("i"),
        F.count("*").over(Window.partitionBy("segment")).alias("n"),
    )
    return (
        ranked.groupBy("segment")
        .agg(
            F.max("n").cast("bigint").alias("n_customers"),
            F.round(F.sum("r").cast("double"), 2).alias("total_revenue"),
            F.round(
                (
                    2 * F.sum(F.col("i") * F.col("r"))
                    - (F.max("n") + 1) * F.sum("r")
                ).cast("double")
                / (F.max("n") * F.sum("r").cast("double")),
                6,
            ).alias("gini"),
        )
        .orderBy("segment")
    )


# ---- x129: ABC / Pareto revenue classification ----


@register(
    "x129_abc_classification",
    oracle="""
    WITH rev AS (
      SELECT l_partkey,
             SUM(CAST(l_extendedprice * (1 - l_discount)
                      AS DECIMAL(18,4))) AS r
      FROM lineitem GROUP BY l_partkey),
    tot AS (SELECT SUM(r) AS total FROM rev),
    ranked AS (
      SELECT l_partkey, r,
             SUM(r) OVER (ORDER BY r DESC, l_partkey) AS cum
      FROM rev),
    classed AS (
      SELECT l_partkey, r,
             CASE WHEN cum * 100 <= (SELECT total FROM tot) * 80 THEN 'A'
                  WHEN cum * 100 <= (SELECT total FROM tot) * 95 THEN 'B'
                  ELSE 'C' END AS abc
      FROM ranked)
    SELECT abc,
           CAST(COUNT(*) AS BIGINT) AS n_parts,
           ROUND(CAST(SUM(r) AS DOUBLE), 2) AS class_revenue,
           ROUND(CAST(SUM(r) AS DOUBLE)
                 / CAST((SELECT total FROM tot) AS DOUBLE), 6)
             AS revenue_share
    FROM classed
    GROUP BY abc
    ORDER BY abc
    """,
)
def x129_abc_classification(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ABC / Pareto classification of parts by revenue: parts sorted
    by exact decimal revenue (partkey tiebreak), class boundaries at
    80 % / 95 % cumulative share — the comparisons are DECIMAL
    cross-multiplications (cum·100 ≤ total·80), so class membership
    never touches a float; only the reported shares divide at the
    end. The inventory-policy classic ("A-parts get the attention"),
    and the same shape classifies sources by corpus contribution.

    Scale: one per-part agg, a global cumulative window over the
    PART table (the honest cost of a global Pareto order — a
    per-category ABC partitions it), and a 3-row rollup.
    """
    from pyspark.sql.window import Window

    li = load_table(spark, sf_dir, "lineitem")
    rev = li.groupBy("l_partkey").agg(
        F.sum(
            (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(
                "decimal(18,4)"
            )
        ).alias("r")
    )
    tot = rev.agg(F.sum("r").alias("total"))
    w = Window.orderBy(F.desc("r"), "l_partkey").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    classed = (
        rev.withColumn("cum", F.sum("r").over(w))
        .crossJoin(F.broadcast(tot))
        .select(
            "r",
            F.when(
                F.col("cum") * 100 <= F.col("total") * 80, "A"
            )
            .when(F.col("cum") * 100 <= F.col("total") * 95, "B")
            .otherwise("C")
            .alias("abc"),
            "total",
        )
    )
    return (
        classed.groupBy("abc")
        .agg(
            F.count("*").cast("bigint").alias("n_parts"),
            F.round(F.sum("r").cast("double"), 2).alias("class_revenue"),
            F.round(
                F.sum("r").cast("double") / F.max("total").cast("double"), 6
            ).alias("revenue_share"),
        )
        .orderBy("abc")
    )


# ---- x131: grouped OLS discount elasticity per brand ----


@register(
    "x131_discount_elasticity",
    oracle="""
    WITH pts AS (
      SELECT p.p_brand,
             CAST(ROUND(l.l_discount * 100) AS BIGINT) AS x,
             CAST(ROUND(l.l_quantity) AS BIGINT) AS y
      FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey),
    sums AS (
      SELECT p_brand,
             CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(x) AS BIGINT) AS sx,
             CAST(SUM(y) AS BIGINT) AS sy,
             CAST(SUM(x * y) AS BIGINT) AS sxy,
             CAST(SUM(x * x) AS BIGINT) AS sxx
      FROM pts GROUP BY p_brand)
    SELECT p_brand, n,
           ROUND(CAST(n * sxy - sx * sy AS DOUBLE)
                 / (n * sxx - sx * sx), 6) AS slope_qty_per_pct,
           ROUND((CAST(sy AS DOUBLE) - CAST(n * sxy - sx * sy AS DOUBLE)
                    / (n * sxx - sx * sx) * sx) / n, 6) AS intercept_qty
    FROM sums
    ORDER BY p_brand
    """,
)
def x131_discount_elasticity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped least-squares: per brand, the OLS slope of quantity on
    discount percent (does discounting move volume?) from EXPLICIT
    integer sums — discount×100 and quantity round to exact integers,
    so n/Σx/Σy/Σxy/Σx² are exact and the slope is one integer-ratio
    division (x89's regression trick on the relational side; q73's
    corr is the normalized cousin). Intercept derives from the same
    sums with a fixed float sequence.

    Scale: one broadcast dim join (part → brand) + one brand-keyed
    partial agg of five integer sums — a regression per group costs
    exactly one aggregation pass regardless of group count.
    """
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    pts = li.join(
        F.broadcast(part), li["l_partkey"] == part["p_partkey"]
    ).select(
        "p_brand",
        F.round(F.col("l_discount") * 100).cast("bigint").alias("x"),
        F.round(F.col("l_quantity")).cast("bigint").alias("y"),
    )
    sums = pts.groupBy("p_brand").agg(
        F.count("*").cast("bigint").alias("n"),
        F.sum("x").cast("bigint").alias("sx"),
        F.sum("y").cast("bigint").alias("sy"),
        F.sum(F.col("x") * F.col("y")).cast("bigint").alias("sxy"),
        F.sum(F.col("x") * F.col("x")).cast("bigint").alias("sxx"),
    )
    slope = (
        (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")).cast("double")
        / (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx"))
    )
    return sums.select(
        "p_brand",
        "n",
        F.round(slope, 6).alias("slope_qty_per_pct"),
        F.round(
            (F.col("sy").cast("double") - slope * F.col("sx")) / F.col("n"),
            6,
        ).alias("intercept_qty"),
    ).orderBy("p_brand")


# ---- x134: partition-skew audit ----

_X134_W = 32  # hypothetical shuffle width


@register(
    "x134_skew_audit",
    oracle=f"""
    WITH ok AS (
      SELECT CAST(('0x' || SUBSTR(MD5(CAST(o_custkey AS VARCHAR)), 1, 15))
                  AS BIGINT) % {_X134_W} AS b
      FROM orders),
    ek AS (
      SELECT CAST(('0x' || SUBSTR(MD5(event_type), 1, 15))
                  AS BIGINT) % {_X134_W} AS b
      FROM events),
    stats AS (
      SELECT 'orders.o_custkey' AS keyspace, b, COUNT(*) AS n FROM ok
      GROUP BY b
      UNION ALL
      SELECT 'events.event_type', b, COUNT(*) AS n FROM ek
      GROUP BY b)
    SELECT keyspace,
           CAST(COUNT(*) AS BIGINT) AS buckets_hit,
           CAST(SUM(n) AS BIGINT) AS total_rows,
           CAST(MAX(n) AS BIGINT) AS max_bucket,
           ROUND(CAST(MAX(n) * {_X134_W} AS DOUBLE) / SUM(n), 4)
             AS skew_factor
    FROM stats
    GROUP BY keyspace
    ORDER BY keyspace
    """,
)
def x134_skew_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Partition-skew audit: the row distribution a {w}-way shuffle
    WOULD see for a candidate join/agg key, via the portable md5
    bridge (engine hash functions differ; the md5 bucket is the
    cross-checkable stand-in with the same uniformity law). Reports
    buckets hit, the heaviest bucket, and the skew factor
    (max·{w}/total — 1.0 = perfectly uniform; ≈{w} = one hot key
    owning everything). Run BEFORE committing to a partitioning:
    here the uniform o_custkey sits near 1 while event_type (5
    values) pins ≥1 empty-bucket-heavy distribution — exactly the
    key `operators/skew.py` salting exists for.

    Scale: one constant-width agg per audited keyspace — the audit
    costs a scan, never a shuffle of the data itself.
    """
    orders = load_table(spark, sf_dir, "orders")
    events = load_table(spark, sf_dir, "events")

    def bucket(col):
        return (
            F.conv(
                F.substring(F.md5(col.cast("string").cast("binary")), 1, 15),
                16,
                10,
            ).cast("bigint")
            % _X134_W
        )

    ok = orders.select(
        F.lit("orders.o_custkey").alias("keyspace"),
        bucket(F.col("o_custkey")).alias("b"),
    )
    ek = events.select(
        F.lit("events.event_type").alias("keyspace"),
        bucket(F.col("event_type")).alias("b"),
    )
    stats = (
        ok.unionByName(ek)
        .groupBy("keyspace", "b")
        .agg(F.count("*").alias("n"))
    )
    return (
        stats.groupBy("keyspace")
        .agg(
            F.count("*").cast("bigint").alias("buckets_hit"),
            F.sum("n").cast("bigint").alias("total_rows"),
            F.max("n").cast("bigint").alias("max_bucket"),
            F.round(
                (F.max("n") * _X134_W).cast("double") / F.sum("n"), 4
            ).alias("skew_factor"),
        )
        .orderBy("keyspace")
    )


# ---- x138: order backlog curve (sweep-line interval counting) ----


@register(
    "x138_order_backlog",
    oracle="""
    WITH opened AS (
      SELECT o_orderdate AS d, 1 AS delta FROM orders),
    closed AS (
      SELECT MAX(l_shipdate) AS d, -1 AS delta
      FROM lineitem GROUP BY l_orderkey),
    deltas AS (
      SELECT d, SUM(delta) AS dd FROM (
        SELECT * FROM opened UNION ALL SELECT * FROM closed) u
      GROUP BY d),
    curve AS (
      SELECT d, SUM(dd) OVER (ORDER BY d) AS backlog
      FROM deltas),
    monthly AS (
      SELECT STRFTIME(DATE_TRUNC('month', d), '%Y-%m') AS month,
             MAX(backlog) AS peak_backlog,
             MAX(CASE WHEN rn = 1 THEN backlog END) AS eom_backlog
      FROM (SELECT d, backlog,
                   ROW_NUMBER() OVER (
                     PARTITION BY DATE_TRUNC('month', d)
                     ORDER BY d DESC) AS rn
            FROM curve)
      GROUP BY month)
    SELECT month,
           CAST(peak_backlog AS BIGINT) AS peak_backlog,
           CAST(eom_backlog AS BIGINT) AS eom_backlog
    FROM monthly
    ORDER BY month
    """,
)
def x138_order_backlog(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Open-order backlog over time by SWEEP-LINE interval counting:
    +1 at each order date, −1 at the order's last line-item ship date
    (the fixture's fulfillment proxy — no receiptdate column), one cumulative sum over the day grid — the
    event-sourcing delta trick that turns "how many intervals cover
    each instant" from a range-join into a single ordered prefix sum.
    Reported as per-month peak and end-of-month backlog (all-integer
    arithmetic end to end).

    Scale: the per-order close date is one orderkey agg; deltas
    collapse to the DAY grid before the global cumulative window, so
    the sweep runs over O(days) rows regardless of order volume —
    the same trick prices concurrent-session peaks at any scale.
    """
    from pyspark.sql.window import Window

    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    opened = orders.select(
        F.col("o_orderdate").alias("d"), F.lit(1).alias("delta")
    )
    closed = li.groupBy("l_orderkey").agg(
        F.max("l_shipdate").alias("d")
    ).select("d", F.lit(-1).alias("delta"))
    deltas = (
        opened.unionByName(closed)
        .groupBy("d")
        .agg(F.sum("delta").alias("dd"))
    )
    curve = deltas.withColumn(
        "backlog",
        F.sum("dd").over(
            Window.orderBy("d").rowsBetween(
                Window.unboundedPreceding, Window.currentRow
            )
        ),
    )
    month = F.date_format(F.date_trunc("month", "d"), "yyyy-MM")
    ranked = curve.select(
        month.alias("month"),
        "d",
        "backlog",
        F.row_number()
        .over(
            Window.partitionBy(F.date_trunc("month", "d")).orderBy(
                F.desc("d")
            )
        )
        .alias("rn"),
    )
    return (
        ranked.groupBy("month")
        .agg(
            F.max("backlog").cast("bigint").alias("peak_backlog"),
            F.max(F.when(F.col("rn") == 1, F.col("backlog")))
            .cast("bigint")
            .alias("eom_backlog"),
        )
        .orderBy("month")
    )


# ---- x139: co-purchase part-pair association (orders as baskets) ----

_X139_VOCAB = 50
_X139_TOP = 20


@register(
    "x139_copurchase_pairs",
    oracle=f"""
    WITH it AS (
      SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
    pf AS (
      SELECT l_partkey, COUNT(*) AS n FROM it GROUP BY l_partkey),
    vocab AS (
      SELECT l_partkey, n FROM (
        SELECT l_partkey, n,
               ROW_NUMBER() OVER (ORDER BY n DESC, l_partkey) AS rn
        FROM pf)
      WHERE rn <= {_X139_VOCAB}),
    bt AS (
      SELECT it.l_orderkey, it.l_partkey
      FROM it JOIN vocab ON it.l_partkey = vocab.l_partkey),
    pairs AS (
      SELECT a.l_partkey AS part_a, b.l_partkey AS part_b,
             COUNT(*) AS n_ab
      FROM bt a JOIN bt b ON a.l_orderkey = b.l_orderkey
                         AND a.l_partkey < b.l_partkey
      GROUP BY part_a, part_b),
    nn AS (SELECT COUNT(DISTINCT l_orderkey) AS n_orders FROM it),
    ranked AS (
      SELECT p.part_a, p.part_b, p.n_ab, va.n AS n_a, vb.n AS n_b,
             ROW_NUMBER() OVER (ORDER BY p.n_ab DESC, p.part_a, p.part_b)
               AS rnk
      FROM pairs p
      JOIN vocab va ON p.part_a = va.l_partkey
      JOIN vocab vb ON p.part_b = vb.l_partkey)
    SELECT rnk, CAST(part_a AS BIGINT) AS part_a,
           CAST(part_b AS BIGINT) AS part_b,
           CAST(n_ab AS BIGINT) AS n_ab,
           CAST(n_a AS BIGINT) AS n_a, CAST(n_b AS BIGINT) AS n_b,
           ROUND(CAST(n_ab * (SELECT n_orders FROM nn) AS DOUBLE)
                 / (n_a * n_b), 6) AS lift
    FROM ranked WHERE rnk <= {_X139_TOP}
    ORDER BY rnk
    """,
)
def x139_copurchase_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Market-basket association on its canonical domain: parts
    co-purchased within an order, with the Apriori prune (candidates
    restricted to the top-{v} order-frequency parts — lossless above
    the implied support floor) and lift over the independence null.
    x111 runs the identical algorithm on documents-as-baskets; this
    is the retail form, proving the operator is domain-generic.

    Scale: distinct (order, part) is one uniform agg; the vocab
    broadcast bounds per-basket pair fan-out at {v}²/2 regardless of
    basket size; the pair agg is a skinny key. r11 (guide
    §1.2/§2.3/§5, the x111 fix applied to its retail twin): the
    driver-side count() action becomes a 1-row broadcast, and pairs
    emit intra-array from each order's sorted vocab-part set instead
    of an orderkey self-join — one exchange, no join, no collect.
    """
    from pyspark.sql.window import Window

    li = load_table(spark, sf_dir, "lineitem")
    it = li.select("l_orderkey", "l_partkey").distinct()
    pf = it.groupBy("l_partkey").agg(F.count("*").alias("n"))
    vocab = (
        pf.withColumn(
            "rn",
            F.row_number().over(Window.orderBy(F.desc("n"), "l_partkey")),
        )
        .filter(F.col("rn") <= _X139_VOCAB)
        .select("l_partkey", "n")
    )
    bt = it.join(F.broadcast(vocab.select("l_partkey")), "l_partkey")
    sets = bt.groupBy("l_orderkey").agg(
        F.array_sort(F.collect_set("l_partkey")).alias("ps")
    )
    pairs = (
        sets.select("ps", F.posexplode("ps").alias("i", "part_a"))
        .select(
            "part_a",
            F.explode(
                F.slice("ps", F.col("i") + 2, F.size("ps"))
            ).alias("part_b"),
        )
        .groupBy("part_a", "part_b")
        .agg(F.count("*").alias("n_ab"))
    )
    nd = it.agg(F.countDistinct("l_orderkey").alias("__nd"))
    va = vocab.select(
        F.col("l_partkey").alias("part_a"), F.col("n").alias("n_a")
    )
    vb = vocab.select(
        F.col("l_partkey").alias("part_b"), F.col("n").alias("n_b")
    )
    ranked = (
        pairs.join(F.broadcast(va), "part_a")
        .join(F.broadcast(vb), "part_b")
        .crossJoin(F.broadcast(nd))
        .withColumn(
            "rnk",
            F.row_number().over(
                Window.orderBy(F.desc("n_ab"), "part_a", "part_b")
            ),
        )
        .filter(F.col("rnk") <= _X139_TOP)
    )
    return ranked.select(
        "rnk",
        F.col("part_a").cast("bigint").alias("part_a"),
        F.col("part_b").cast("bigint").alias("part_b"),
        F.col("n_ab").cast("bigint").alias("n_ab"),
        F.col("n_a").cast("bigint").alias("n_a"),
        F.col("n_b").cast("bigint").alias("n_b"),
        F.round(
            (F.col("n_ab") * F.col("__nd")).cast("double")
            / (F.col("n_a") * F.col("n_b")),
            6,
        ).alias("lift"),
    ).orderBy("rnk")


# ---- x140: open-order aging buckets ----


@register(
    "x140_order_aging",
    oracle="""
    WITH h AS (SELECT MAX(o_orderdate) AS horizon FROM orders),
    open_orders AS (
      SELECT DATEDIFF('day', o_orderdate, (SELECT horizon FROM h)) AS age,
             CAST(o_totalprice AS DECIMAL(18,2)) AS v
      FROM orders WHERE o_orderstatus = 'O'),
    bucketed AS (
      SELECT CASE WHEN age <= 30 THEN '0-30'
                  WHEN age <= 60 THEN '31-60'
                  WHEN age <= 90 THEN '61-90'
                  ELSE '90+' END AS age_bucket,
             v
      FROM open_orders)
    SELECT age_bucket,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           ROUND(CAST(SUM(v) AS DOUBLE), 2) AS open_value,
           ROUND(CAST(SUM(v) AS DOUBLE)
                 / (SELECT CAST(SUM(v) AS DOUBLE) FROM bucketed), 6)
             AS value_share
    FROM bucketed
    GROUP BY age_bucket
    ORDER BY age_bucket
    """,
)
def x140_order_aging(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Aging-bucket report over open orders (the receivables-aging
    classic): every still-open order bucketed by integer days since
    placement at the corpus horizon (0-30/31-60/61-90/90+), with
    exact decimal open value per bucket and its share — the
    working-capital report finance closes every month on. Bucket
    membership is pure integer comparison; shares divide once.

    Scale: one filtered scan (status predicate pushed to parquet) +
    a 1-row horizon broadcast + a 4-bucket rollup.
    """
    orders = load_table(spark, sf_dir, "orders")
    h = orders.agg(F.max("o_orderdate").alias("horizon"))
    open_orders = (
        orders.filter(F.col("o_orderstatus") == "O")
        .crossJoin(F.broadcast(h))
        .select(
            F.datediff("horizon", "o_orderdate").alias("age"),
            F.col("o_totalprice").cast("decimal(18,2)").alias("v"),
        )
    )
    bucketed = open_orders.select(
        F.when(F.col("age") <= 30, "0-30")
        .when(F.col("age") <= 60, "31-60")
        .when(F.col("age") <= 90, "61-90")
        .otherwise("90+")
        .alias("age_bucket"),
        "v",
    )
    tot = bucketed.agg(F.sum("v").alias("tv"))
    return (
        bucketed.groupBy("age_bucket")
        .agg(
            F.count("*").cast("bigint").alias("n_orders"),
            F.sum("v").alias("sv"),
        )
        .crossJoin(F.broadcast(tot))
        .select(
            "age_bucket",
            "n_orders",
            F.round(F.col("sv").cast("double"), 2).alias("open_value"),
            F.round(
                F.col("sv").cast("double") / F.col("tv").cast("double"), 6
            ).alias("value_share"),
        )
        .orderBy("age_bucket")
    )


# ---- x141: MoM / YoY revenue growth ----


@register(
    "x141_revenue_growth",
    oracle="""
    WITH monthly AS (
      SELECT STRFTIME(DATE_TRUNC('month', o_orderdate), '%Y-%m') AS month,
             SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS rev
      FROM orders GROUP BY month),
    g AS (
      SELECT month, rev,
             LAG(rev) OVER (ORDER BY month) AS prev_m,
             LAG(rev, 12) OVER (ORDER BY month) AS prev_y
      FROM monthly)
    SELECT month,
           ROUND(CAST(rev AS DOUBLE), 2) AS revenue,
           ROUND(CAST(rev - prev_m AS DOUBLE) / CAST(prev_m AS DOUBLE), 6)
             AS mom_growth,
           ROUND(CAST(rev - prev_y AS DOUBLE) / CAST(prev_y AS DOUBLE), 6)
             AS yoy_growth
    FROM g
    ORDER BY month
    """,
)
def x141_revenue_growth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Month-over-month and year-over-year revenue growth — the
    executive-dashboard staple: exact decimal monthly sums, growth
    as one division per cell (NULL where no prior period exists —
    both engines agree because the LAG offsets are identical row
    counts on the same total month order). q06 is TPC-H's Q6 scan
    shape; this is the reporting time-series on top of the same
    table.

    Scale: one month-keyed agg (constant-bounded grid), then two
    lags over that grid — the window never touches fact rows.
    """
    from pyspark.sql.window import Window

    orders = load_table(spark, sf_dir, "orders")
    monthly = orders.groupBy(
        F.date_format(F.date_trunc("month", "o_orderdate"), "yyyy-MM").alias(
            "month"
        )
    ).agg(F.sum(F.col("o_totalprice").cast("decimal(18,2)")).alias("rev"))
    w = Window.orderBy("month")
    g = monthly.select(
        "month",
        "rev",
        F.lag("rev").over(w).alias("prev_m"),
        F.lag("rev", 12).over(w).alias("prev_y"),
    )
    return g.select(
        "month",
        F.round(F.col("rev").cast("double"), 2).alias("revenue"),
        F.round(
            (F.col("rev") - F.col("prev_m")).cast("double")
            / F.col("prev_m").cast("double"),
            6,
        ).alias("mom_growth"),
        F.round(
            (F.col("rev") - F.col("prev_y")).cast("double")
            / F.col("prev_y").cast("double"),
            6,
        ).alias("yoy_growth"),
    ).orderBy("month")


# ---- x147: percent-of-parent hierarchical shares ----


@register(
    "x147_percent_of_parent",
    oracle="""
    WITH rev AS (
      SELECT r.r_name AS region, n.n_name AS nation,
             SUM(CAST(o.o_totalprice AS DECIMAL(18,2))) AS v
      FROM orders o
      JOIN customer c ON o.o_custkey = c.c_custkey
      JOIN nation n ON c.c_nationkey = n.n_nationkey
      JOIN region r ON n.n_regionkey = r.r_regionkey
      GROUP BY region, nation)
    SELECT region, nation,
           ROUND(CAST(v AS DOUBLE), 2) AS revenue,
           ROUND(CAST(v AS DOUBLE)
                 / CAST(SUM(v) OVER (PARTITION BY region) AS DOUBLE), 6)
             AS share_of_region,
           ROUND(CAST(SUM(v) OVER (PARTITION BY region) AS DOUBLE)
                 / CAST(SUM(v) OVER () AS DOUBLE), 6)
             AS region_share_of_total
    FROM rev
    ORDER BY region, nation
    """,
)
def x147_percent_of_parent(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Percent-of-parent at two hierarchy levels (the BI drill-down
    staple): each nation's share of its region's revenue AND the
    region's share of the total, from one nation-level decimal
    aggregate — both denominators are exact-decimal window sums over
    the small rollup, each share one division. q100's percent-of-
    total is the flat case; this is the nested-ratio form pivot
    tables render.

    Scale: one fact agg with broadcast dims; both windows run over
    the nation-level table (≤ dims), not facts.
    """
    from pyspark.sql.window import Window

    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")
    rev = (
        orders.join(
            F.broadcast(cust), orders["o_custkey"] == cust["c_custkey"]
        )
        .join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(region), F.col("n_regionkey") == F.col("r_regionkey"))
        .groupBy(
            F.col("r_name").alias("region"), F.col("n_name").alias("nation")
        )
        .agg(F.sum(F.col("o_totalprice").cast("decimal(18,2)")).alias("v"))
    )
    w_region = Window.partitionBy("region")
    w_all = Window.partitionBy()
    return rev.select(
        "region",
        "nation",
        F.round(F.col("v").cast("double"), 2).alias("revenue"),
        F.round(
            F.col("v").cast("double")
            / F.sum("v").over(w_region).cast("double"),
            6,
        ).alias("share_of_region"),
        F.round(
            F.sum("v").over(w_region).cast("double")
            / F.sum("v").over(w_all).cast("double"),
            6,
        ).alias("region_share_of_total"),
    ).orderBy("region", "nation")
