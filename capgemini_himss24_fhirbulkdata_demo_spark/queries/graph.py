"""Graph analytics over derived relational graphs (SURVEY §2B
iterative-algorithm surface; x07 connected components is the dedup
sibling in :mod:`.dedup`).

x100 runs PageRank on the nation-level trade graph distilled from
``lineitem ⋈ orders`` (supplier nation → customer nation edges).
Determinism strategy for an ITERATIVE float algorithm: there are no
floats — PageRank mass is fixed-point integer (scaled 1e12), spread
with integer division and damped with integer arithmetic, so every
iteration is bit-exact on both engines and the oracle is the same
recurrence unrolled as CTEs. x101 is the cohort-retention matrix
(week-granular) over ``events`` — all-integer week arithmetic
anchored to the corpus epoch, one final ratio division.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from .registry import register

# ---- x100: PageRank on the nation trade graph ----

_PR_SCALE = 10**12  # fixed-point scale for rank mass
_PR_ITERS = 5
_PR_D_NUM, _PR_D_DEN = 85, 100  # damping 0.85 as a rational


_X100_EDGES_SQL = """
    edges AS (
      SELECT DISTINCT sn.n_nationkey AS src, cn.n_nationkey AS dst
      FROM lineitem l
      JOIN orders o ON l.l_orderkey = o.o_orderkey
      JOIN supplier s ON l.l_suppkey = s.s_suppkey
      JOIN customer c ON o.o_custkey = c.c_custkey
      JOIN nation sn ON s.s_nationkey = sn.n_nationkey
      JOIN nation cn ON c.c_nationkey = cn.n_nationkey),
    deg AS (
      SELECT src, COUNT(*) AS outdeg FROM edges GROUP BY src),
    nodes AS (
      SELECT n_nationkey AS node FROM nation),
    nn AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM nodes)"""


def _x100_iter_sql(i: int) -> str:
    prev = f"it{i - 1}"
    return f"""
    {prev}_c AS (
      SELECT e.dst AS node,
             SUM(p.pr // d.outdeg) AS contrib
      FROM edges e
      JOIN {prev} p ON e.src = p.node
      JOIN deg d ON e.src = d.src
      GROUP BY e.dst),
    it{i} AS (
      SELECT n.node,
             ({_PR_SCALE} // (SELECT n FROM nn) * {_PR_D_DEN - _PR_D_NUM}
              + {_PR_D_NUM} * COALESCE(c.contrib, 0)) // {_PR_D_DEN} AS pr
      FROM nodes n LEFT JOIN {prev}_c c ON n.node = c.node)"""


_X100_SQL = f"""
    WITH {_X100_EDGES_SQL},
    it0 AS (
      SELECT node, {_PR_SCALE} // (SELECT n FROM nn) AS pr FROM nodes),
    {",".join(_x100_iter_sql(i) for i in range(1, _PR_ITERS + 1))}
    SELECT nat.n_name AS nation, CAST(r.pr AS BIGINT) AS pr_fixed,
           CAST(ROW_NUMBER() OVER (ORDER BY r.pr DESC, nat.n_name)
                AS BIGINT) AS rnk
    FROM it{_PR_ITERS} r JOIN nation nat ON r.node = nat.n_nationkey
    ORDER BY rnk
    """


@register("x100_pagerank_nations", oracle=_X100_SQL)
def x100_pagerank_nations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PageRank (fixed damping 0.85, {it} iterations) over the nation
    trade graph: a DISTINCT supplier-nation → customer-nation edge
    per trading relationship in ``lineitem ⋈ orders``. Rank mass is
    FIXED-POINT INTEGER (scale 1e12) spread by integer division
    (``DIV``/``//`` truncate identically on non-negative operands)
    and damped rationally, so the iterative recurrence is bit-exact
    cross-engine — the declarative twin unrolls the same {it} steps
    as CTEs. Dangling mass is dropped (the simple variant); ranks
    still order correctly since every node receives the same
    teleport term.

    Scale: edge DISTILLATION is the heavy stage — two fact-fact
    shuffles on uniform keys (orderkey, then the dim joins broadcast)
    and one distinct on the skinny (src, dst) pair; the ITERATION
    then runs on the aggregated graph, which for an N-nation world is
    broadcast-sized. For graphs that stay fact-sized (doc-doc link
    graphs), each step is one shuffle join keyed on src — x07's
    localCheckpoint pattern bounds the plan depth; {it} fixed
    iterations keeps the lineage linear either way.
    """
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    supp = load_table(spark, sf_dir, "supplier")
    cust = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")

    edges = (
        li.join(orders, li["l_orderkey"] == orders["o_orderkey"])
        .join(F.broadcast(supp), li["l_suppkey"] == supp["s_suppkey"])
        .join(F.broadcast(cust), orders["o_custkey"] == cust["c_custkey"])
        .select(
            supp["s_nationkey"].alias("src"),
            cust["c_nationkey"].alias("dst"),
        )
        .distinct()
        # the unrolled iteration references edges once per step: cut
        # the lineage so the fact-fact distillation runs ONCE, not
        # _PR_ITERS+1 times. localCheckpoint beats persist() here —
        # a cached plan freezes its 32-partition layout and blocks
        # AQE's small-stage coalescing (measured best-of-4 at sf0.1:
        # no-reuse 2.2 s, persist 3.5 s, coalesce(1)+localCheckpoint
        # 1.6 s). coalesce(1) is sound because the AGGREGATED graph
        # is dim-sized (≤N² nation pairs); a fact-sized graph would
        # keep its partitioning and still checkpoint.
        .coalesce(1)
        .localCheckpoint(eager=True)
    )
    # r11 (guide §3.3): outdeg is loop-invariant — fold it onto the
    # checkpointed edge rows ONCE so each of the _PR_ITERS steps runs
    # one join fewer (the old shape joined deg inside every
    # iteration, costing an extra broadcast + join per step on the
    # unrolled lazy plan). Still dim-sized, still one partition.
    deg = edges.groupBy("src").agg(F.count("*").alias("outdeg"))
    edges = (
        edges.join(deg, "src")
        .select("src", "dst", "outdeg")
        .coalesce(1)
        .localCheckpoint(eager=True)
    )
    nodes = nation.select(F.col("n_nationkey").alias("node"))
    n_nodes = nodes.count()  # dim-sized; a literal both engines share

    base = _PR_SCALE // n_nodes
    pr = nodes.withColumn("pr", F.lit(base).cast("bigint"))
    for _ in range(_PR_ITERS):
        contrib = (
            edges.join(pr.withColumnRenamed("node", "src"), "src")
            .select("dst", F.expr("pr DIV outdeg").alias("c"))
            .groupBy("dst")
            .agg(F.sum("c").alias("contrib"))
        )
        pr = (
            nodes.join(contrib.withColumnRenamed("dst", "node"), "node", "left")
            .select(
                "node",
                F.expr(
                    f"(CAST({base} AS BIGINT) * {_PR_D_DEN - _PR_D_NUM} "
                    f"+ {_PR_D_NUM} * COALESCE(contrib, CAST(0 AS BIGINT))) "
                    f"DIV {_PR_D_DEN}"
                ).alias("pr"),
            )
        )
    from pyspark.sql import Window

    w = Window.orderBy(F.desc("pr_fixed"), F.asc("nation"))
    out = (
        pr.join(F.broadcast(nation), pr["node"] == nation["n_nationkey"])
        .select(F.col("n_name").alias("nation"), F.col("pr").alias("pr_fixed"))
        .withColumn("rnk", F.row_number().over(w).cast("bigint"))
        .orderBy("rnk")
    )
    return out


x100_pagerank_nations.__doc__ = x100_pagerank_nations.__doc__.format(
    it=_PR_ITERS
)


# ---- x101: cohort retention matrix over events ----

_X101_EPOCH = "2024-01-01"  # corpus epoch; week = days-since DIV 7


_X101_SQL = f"""
    WITH ev AS (
      SELECT user_id,
             CAST(DATEDIFF('day', DATE '{_X101_EPOCH}', CAST(ts AS DATE))
                  AS BIGINT) // 7 AS week
      FROM events),
    cohort AS (
      SELECT user_id, MIN(week) AS cohort_week FROM ev GROUP BY user_id),
    active AS (
      SELECT DISTINCT e.user_id, c.cohort_week,
             e.week - c.cohort_week AS week_offset
      FROM ev e JOIN cohort c ON e.user_id = c.user_id),
    size AS (
      SELECT cohort_week, COUNT(*) AS cohort_size
      FROM cohort GROUP BY cohort_week)
    SELECT a.cohort_week, a.week_offset,
           CAST(COUNT(*) AS BIGINT) AS n_active,
           CAST(s.cohort_size AS BIGINT) AS cohort_size,
           ROUND(CAST(COUNT(*) AS DOUBLE) / s.cohort_size, 6) AS retention
    FROM active a JOIN size s ON a.cohort_week = s.cohort_week
    GROUP BY a.cohort_week, a.week_offset, s.cohort_size
    ORDER BY a.cohort_week, a.week_offset
    """


@register("x101_cohort_retention", oracle=_X101_SQL)
def x101_cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention matrix (the product-analytics classic): users
    cohorted by first-activity week, then for every (cohort_week,
    week_offset) cell the count of distinct users active that week
    and the retention ratio against the cohort size. Weeks are
    integer ``days-since-epoch DIV 7`` — no engine-specific week
    truncation semantics to disagree on; the ratio is the single
    final float op.

    Scale: two uniform user_id-keyed aggs (first-week, then the
    distinct (user, week) activity set — map-side combine collapses
    repeat events per partition first) and one skinny join against
    the per-user cohort table; the output matrix is
    O(weeks²) — tiny. The cohort join is user_id-to-user_id, so at
    100 TB both sides co-partition on the same key and AQE picks a
    shuffle-free plan once events are bucketed by user_id.
    """
    ev = load_table(spark, sf_dir, "events").select(
        "user_id",
        F.expr(
            f"CAST(DATEDIFF(CAST(ts AS DATE), DATE '{_X101_EPOCH}') "
            f"AS BIGINT) DIV 7"
        ).alias("week"),
    )
    cohort = ev.groupBy("user_id").agg(F.min("week").alias("cohort_week"))
    active = (
        ev.join(cohort, "user_id")
        .select(
            "user_id",
            "cohort_week",
            (F.col("week") - F.col("cohort_week")).alias("week_offset"),
        )
        .distinct()
    )
    size = cohort.groupBy("cohort_week").agg(
        F.count("*").alias("cohort_size")
    )
    return (
        active.groupBy("cohort_week", "week_offset")
        .agg(F.count("*").alias("n_active"))
        .join(size, "cohort_week")
        .select(
            "cohort_week",
            "week_offset",
            F.col("n_active").cast("bigint").alias("n_active"),
            F.col("cohort_size").cast("bigint").alias("cohort_size"),
            F.round(
                F.col("n_active").cast("double") / F.col("cohort_size"), 6
            ).alias("retention"),
        )
        .orderBy("cohort_week", "week_offset")
    )


# ---- x130: cohort LTV accumulation curve ----


_X130_SQL = f"""
    WITH ev AS (
      SELECT user_id,
             CAST(DATEDIFF('day', DATE '{_X101_EPOCH}', CAST(ts AS DATE))
                  AS BIGINT) // 7 AS week,
             CAST(value AS DECIMAL(18,6)) AS v
      FROM events),
    cohort AS (
      SELECT user_id, MIN(week) AS cohort_week FROM ev GROUP BY user_id),
    size AS (
      SELECT cohort_week, COUNT(*) AS cohort_size
      FROM cohort GROUP BY cohort_week),
    cell AS (
      SELECT c.cohort_week, e.week - c.cohort_week AS week_offset,
             SUM(e.v) AS rev
      FROM ev e JOIN cohort c ON e.user_id = c.user_id
      GROUP BY c.cohort_week, e.week - c.cohort_week),
    cum AS (
      SELECT cohort_week, week_offset,
             SUM(rev) OVER (PARTITION BY cohort_week
                            ORDER BY week_offset) AS cum_rev
      FROM cell)
    SELECT m.cohort_week, m.week_offset,
           CAST(s.cohort_size AS BIGINT) AS cohort_size,
           ROUND(CAST(m.cum_rev AS DOUBLE), 2) AS cum_revenue,
           ROUND(CAST(m.cum_rev AS DOUBLE) / s.cohort_size, 4)
             AS ltv_per_user
    FROM cum m JOIN size s ON m.cohort_week = s.cohort_week
    ORDER BY m.cohort_week, m.week_offset
    """


@register("x130_cohort_ltv", oracle=_X130_SQL)
def x130_cohort_ltv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort LTV accumulation: cumulative revenue per user by weeks
    since first activity, per signup cohort — x101 answers "do they
    come back", this answers "what are they worth by week N", the
    curve payback-period decisions read. Revenue accumulates as
    EXACT DECIMAL through the cohort-ordered cumulative window (so
    the running sums are order-free), with the per-user division as
    the final float op per cell; weeks are x101's integer
    days-DIV-7.

    Scale: one user-keyed cohort agg, one (cohort, offset) cell agg,
    a per-cohort cumulative window over the CELL table (weeks²
    rows, not events), and an S-row size broadcast.
    """
    from pyspark.sql.window import Window

    ev = load_table(spark, sf_dir, "events").select(
        "user_id",
        F.expr(
            f"CAST(DATEDIFF(CAST(ts AS DATE), DATE '{_X101_EPOCH}') "
            f"AS BIGINT) DIV 7"
        ).alias("week"),
        F.col("value").cast("decimal(18,6)").alias("v"),
    )
    cohort = ev.groupBy("user_id").agg(F.min("week").alias("cohort_week"))
    size = cohort.groupBy("cohort_week").agg(
        F.count("*").alias("cohort_size")
    )
    cell = (
        ev.join(cohort, "user_id")
        .groupBy(
            "cohort_week",
            (F.col("week") - F.col("cohort_week")).alias("week_offset"),
        )
        .agg(F.sum("v").alias("rev"))
    )
    w = Window.partitionBy("cohort_week").orderBy("week_offset")
    cum = cell.withColumn("cum_rev", F.sum("rev").over(w))
    return (
        cum.join(F.broadcast(size), "cohort_week")
        .select(
            "cohort_week",
            "week_offset",
            F.col("cohort_size").cast("bigint").alias("cohort_size"),
            F.round(F.col("cum_rev").cast("double"), 2).alias("cum_revenue"),
            F.round(
                F.col("cum_rev").cast("double") / F.col("cohort_size"), 4
            ).alias("ltv_per_user"),
        )
        .orderBy("cohort_week", "week_offset")
    )


# ---- x133: inter-region trade balance ----


_X133_SQL = """
    WITH flows AS (
      SELECT rs.r_name AS exporter, rc.r_name AS importer,
             SUM(CAST(l.l_extendedprice * (1 - l.l_discount)
                      AS DECIMAL(18,4))) AS v
      FROM lineitem l
      JOIN orders o ON l.l_orderkey = o.o_orderkey
      JOIN supplier s ON l.l_suppkey = s.s_suppkey
      JOIN customer c ON o.o_custkey = c.c_custkey
      JOIN nation ns ON s.s_nationkey = ns.n_nationkey
      JOIN nation nc ON c.c_nationkey = nc.n_nationkey
      JOIN region rs ON ns.n_regionkey = rs.r_regionkey
      JOIN region rc ON nc.n_regionkey = rc.r_regionkey
      GROUP BY exporter, importer),
    net AS (
      SELECT r, SUM(x) AS net_balance FROM (
        SELECT exporter AS r, v AS x FROM flows
        UNION ALL
        SELECT importer AS r, -v AS x FROM flows) u
      GROUP BY r)
    SELECT f.exporter, f.importer,
           ROUND(CAST(f.v AS DOUBLE), 2) AS flow_value,
           ROUND(CAST(n.net_balance AS DOUBLE), 2) AS exporter_net
    FROM flows f JOIN net n ON f.exporter = n.r
    ORDER BY f.exporter, f.importer
    """


@register("x133_trade_balance", oracle=_X133_SQL)
def x133_trade_balance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inter-region trade matrix with net balances: revenue flows
    from supplier region to customer region (x100's edge
    distillation, revenue-weighted and rolled to regions), plus each
    exporter's NET position — the dual-role aggregation (every flow
    credits one region and debits another) done as a union of signed
    decimal contributions, so balances are exact and globally sum to
    zero. The macro cut of q92's nation-pair volume.

    Scale: the same fact-fact orderkey join as x100 with all dims
    broadcast; flows collapse to an R²-row matrix, and the net pass
    runs entirely on that constant-sized matrix.
    """
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    supp = load_table(spark, sf_dir, "supplier")
    cust = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")

    ns = nation.select(
        F.col("n_nationkey").alias("s_nk"), F.col("n_regionkey").alias("s_rk")
    )
    nc = nation.select(
        F.col("n_nationkey").alias("c_nk"), F.col("n_regionkey").alias("c_rk")
    )
    rs = region.select(
        F.col("r_regionkey").alias("s_rk"), F.col("r_name").alias("exporter")
    )
    rc = region.select(
        F.col("r_regionkey").alias("c_rk"), F.col("r_name").alias("importer")
    )
    flows = (
        li.join(orders, li["l_orderkey"] == orders["o_orderkey"])
        .join(F.broadcast(supp), li["l_suppkey"] == supp["s_suppkey"])
        .join(F.broadcast(cust), orders["o_custkey"] == cust["c_custkey"])
        .join(F.broadcast(ns), F.col("s_nationkey") == F.col("s_nk"))
        .join(F.broadcast(nc), F.col("c_nationkey") == F.col("c_nk"))
        .join(F.broadcast(rs), "s_rk")
        .join(F.broadcast(rc), "c_rk")
        .groupBy("exporter", "importer")
        .agg(
            F.sum(
                (
                    F.col("l_extendedprice") * (1 - F.col("l_discount"))
                ).cast("decimal(18,4)")
            ).alias("v")
        )
    )
    net = (
        flows.select(F.col("exporter").alias("r"), F.col("v").alias("x"))
        .unionByName(
            flows.select(
                F.col("importer").alias("r"), (-F.col("v")).alias("x")
            )
        )
        .groupBy("r")
        .agg(F.sum("x").alias("net_balance"))
    )
    return (
        flows.join(
            F.broadcast(net), flows["exporter"] == net["r"]
        )
        .select(
            "exporter",
            "importer",
            F.round(F.col("v").cast("double"), 2).alias("flow_value"),
            F.round(F.col("net_balance").cast("double"), 2).alias(
                "exporter_net"
            ),
        )
        .orderBy("exporter", "importer")
    )


# ---- x346: triangle count + clustering coefficient ----

_X346_SQL = """
WITH und AS (
  SELECT DISTINCT LEAST(s.s_nationkey, c.c_nationkey) AS a,
                  GREATEST(s.s_nationkey, c.c_nationkey) AS b
  FROM lineitem l
  JOIN orders o ON l.l_orderkey = o.o_orderkey
  JOIN supplier s ON l.l_suppkey = s.s_suppkey
  JOIN customer c ON o.o_custkey = c.c_custkey
  WHERE s.s_nationkey <> c.c_nationkey),
deg AS (
  SELECT n, CAST(COUNT(*) AS BIGINT) AS degree
  FROM (SELECT a AS n FROM und UNION ALL SELECT b AS n FROM und)
  GROUP BY n),
tri AS (
  SELECT e1.a AS i, e1.b AS j, e2.b AS k
  FROM und e1
  JOIN und e2 ON e2.a = e1.b
  JOIN und e3 ON e3.a = e1.a AND e3.b = e2.b),
pern AS (
  SELECT n, CAST(COUNT(*) AS BIGINT) AS n_triangles
  FROM (SELECT i AS n FROM tri UNION ALL SELECT j AS n FROM tri
        UNION ALL SELECT k AS n FROM tri)
  GROUP BY n)
SELECT na.n_name AS nation, d.degree,
       COALESCE(p.n_triangles, CAST(0 AS BIGINT)) AS n_triangles,
       CASE WHEN d.degree >= 2
            THEN ROUND(CAST(2 * COALESCE(p.n_triangles, 0) AS DOUBLE)
                       / (d.degree * (d.degree - 1)), 6)
            ELSE 0.0 END AS clustering
FROM deg d
JOIN nation na ON na.n_nationkey = d.n
LEFT JOIN pern p ON p.n = d.n
ORDER BY nation
"""


@register("x346_triangle_count", oracle=_X346_SQL)
def x346_triangle_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Triangle counting + local clustering coefficient over the
    undirected nation trade graph — the graph-density statistic next
    to x100's centrality: per nation, its degree, the number of
    triangles it participates in, and 2T/(d(d-1)). Triangles
    enumerate once per (i<j<k) ordering via the normalized-edge
    3-way join, so no triangle is double-counted.

    Exact integer counts; one final rounded division per row.

    Scale: same two-stage shape as x100 — the heavy stage is edge
    DISTILLATION (fact-fact orderkey shuffle + broadcast dims +
    distinct on the skinny pair), and the triangle 3-way join runs
    on the AGGREGATED graph (≤N² nation pairs, broadcast-sized).
    For fact-sized graphs the same query is the standard
    node-ordering triangle join: shuffle on the shared endpoint,
    with degree-ordered orientation bounding the join fan-out.
    """
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    supp = load_table(spark, sf_dir, "supplier")
    cust = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")

    und = (
        li.join(orders, li["l_orderkey"] == orders["o_orderkey"])
        .join(F.broadcast(supp), li["l_suppkey"] == supp["s_suppkey"])
        .join(F.broadcast(cust), orders["o_custkey"] == cust["c_custkey"])
        .where(supp["s_nationkey"] != cust["c_nationkey"])
        .select(
            F.least(supp["s_nationkey"], cust["c_nationkey"]).alias("a"),
            F.greatest(supp["s_nationkey"], cust["c_nationkey"]).alias("b"),
        )
        .distinct()
        .coalesce(1)
        .localCheckpoint(eager=True)  # same rationale as x100: the
        # aggregated graph is dim-sized and referenced three times
    )
    deg = (
        und.select(F.col("a").alias("n"))
        .unionAll(und.select(F.col("b").alias("n")))
        .groupBy("n")
        .agg(F.count("*").cast("bigint").alias("degree"))
    )
    e1, e2, e3 = und.alias("e1"), und.alias("e2"), und.alias("e3")
    tri = (
        e1.join(e2, F.col("e2.a") == F.col("e1.b"))
        .join(
            e3,
            (F.col("e3.a") == F.col("e1.a"))
            & (F.col("e3.b") == F.col("e2.b")),
        )
        .select(
            F.col("e1.a").alias("i"),
            F.col("e1.b").alias("j"),
            F.col("e2.b").alias("k"),
        )
    )
    pern = (
        tri.select(F.col("i").alias("n"))
        .unionAll(tri.select(F.col("j").alias("n")))
        .unionAll(tri.select(F.col("k").alias("n")))
        .groupBy("n")
        .agg(F.count("*").cast("bigint").alias("n_triangles"))
    )
    return (
        deg.join(F.broadcast(nation), deg["n"] == nation["n_nationkey"])
        .join(pern.withColumnRenamed("n", "pn"), F.col("pn") == deg["n"], "left")
        .select(
            F.col("n_name").alias("nation"),
            "degree",
            F.coalesce(F.col("n_triangles"), F.lit(0).cast("bigint")).alias(
                "n_triangles"
            ),
            F.when(
                F.col("degree") >= 2,
                F.round(
                    (2 * F.coalesce(F.col("n_triangles"), F.lit(0))).cast(
                        "double"
                    )
                    / (F.col("degree") * (F.col("degree") - 1)),
                    6,
                ),
            ).otherwise(0.0).alias("clustering"),
        )
        .orderBy("nation")
    )


# ---- x348: bounded-hop cheapest trade route (Bellman-Ford) ----

_X348_ITERS = 4
_X348_SRC = 0  # n_nationkey of the route origin
_X348_CAP = 10**9  # friction numerator: cost = CAP // n_trades


def _x348_iter_sql(i: int) -> str:
    prev = f"bf{i - 1}"
    return f"""
    bf{i} AS (
      SELECT node, MIN(cost) AS cost FROM (
        SELECT node, cost FROM {prev}
        UNION ALL
        SELECT e.dst AS node, p.cost + e.w AS cost
        FROM {prev} p JOIN edges e ON e.src = p.node
      ) t GROUP BY node)"""


_X348_SQL = f"""
    WITH raw AS (
      SELECT s.s_nationkey AS src, c.c_nationkey AS dst,
             CAST(COUNT(*) AS BIGINT) AS n_trades
      FROM lineitem l
      JOIN orders o ON l.l_orderkey = o.o_orderkey
      JOIN supplier s ON l.l_suppkey = s.s_suppkey
      JOIN customer c ON o.o_custkey = c.c_custkey
      WHERE s.s_nationkey <> c.c_nationkey
      GROUP BY s.s_nationkey, c.c_nationkey),
    edges AS (
      SELECT src, dst, {_X348_CAP} // n_trades AS w FROM raw),
    bf0 AS (SELECT {_X348_SRC} AS node, CAST(0 AS BIGINT) AS cost),
    {",".join(_x348_iter_sql(i) for i in range(1, _X348_ITERS + 1))}
    SELECT na.n_name AS nation,
           CAST(COALESCE(r.cost, -1) AS BIGINT) AS min_cost
    FROM nation na
    LEFT JOIN bf{_X348_ITERS} r ON r.node = na.n_nationkey
    ORDER BY min_cost, nation
    """


@register("x348_cheapest_route", oracle=_X348_SQL)
def x348_cheapest_route(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bounded-hop cheapest-route search (Bellman-Ford, {it}
    relaxation rounds) over the weighted nation trade graph: edge
    friction is the integer {cap}//n_trades (heavier trade = cheaper
    passage), and each round relaxes every edge once, so the result
    is EXACTLY the cheapest cost reachable from nation {src} in <=
    {it} hops — a well-defined quantity whether or not the search
    has converged, which is how a fixed-iteration distributed SSSP
    is actually run. Unreached nations report -1.

    Determinism: integer weights, integer sums, exact MIN — the
    iterative recurrence is bit-exact on both engines (the oracle
    unrolls the same {it} rounds as CTEs, x100's technique).

    Scale: edge distillation is the heavy stage (one fact-fact
    orderkey shuffle, dims broadcast, skinny (src,dst) agg); each
    relaxation is then a join+min on the AGGREGATED graph. For
    fact-sized graphs each round is one shuffle keyed on src — the
    frontier stays sparse early, and localCheckpoint bounds lineage
    exactly as in x100/x07.
    """
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    supp = load_table(spark, sf_dir, "supplier")
    cust = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")

    edges = (
        li.join(orders, li["l_orderkey"] == orders["o_orderkey"])
        .join(F.broadcast(supp), li["l_suppkey"] == supp["s_suppkey"])
        .join(F.broadcast(cust), orders["o_custkey"] == cust["c_custkey"])
        .where(supp["s_nationkey"] != cust["c_nationkey"])
        .groupBy(
            supp["s_nationkey"].alias("src"),
            cust["c_nationkey"].alias("dst"),
        )
        .agg(F.count("*").cast("bigint").alias("n_trades"))
        .select(
            "src", "dst",
            F.expr(f"div({_X348_CAP}, n_trades)").alias("w"),
        )
        .coalesce(1)
        .localCheckpoint(eager=True)  # aggregated graph is dim-sized
        # and referenced once per relaxation round (x100 rationale)
    )
    frontier = spark.createDataFrame(
        [(_X348_SRC, 0)], "node INT, cost BIGINT"
    ).select(F.col("node").cast("int"), F.col("cost").cast("bigint"))
    for _ in range(_X348_ITERS):
        relaxed = (
            frontier.join(edges, frontier["node"] == edges["src"])
            .select(
                F.col("dst").alias("node"),
                (F.col("cost") + F.col("w")).alias("cost"),
            )
        )
        frontier = (
            frontier.unionByName(relaxed)
            .groupBy("node")
            .agg(F.min("cost").alias("cost"))
            .coalesce(1)
            .localCheckpoint(eager=True)
        )
    return (
        nation.join(frontier, nation["n_nationkey"] == frontier["node"], "left")
        .select(
            F.col("n_name").alias("nation"),
            F.coalesce(F.col("cost"), F.lit(-1)).cast("bigint").alias(
                "min_cost"
            ),
        )
        .orderBy("min_cost", "nation")
    )


x348_cheapest_route.__doc__ = x348_cheapest_route.__doc__.format(
    it=_X348_ITERS, cap=_X348_CAP, src=_X348_SRC
)
