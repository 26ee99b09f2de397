"""Statistical / business-audit analytics, second half (x251+).

Mechanical continuation of :mod:`.analytics` (x151-x250) -- the
module was split at the x250/x251 boundary purely for
maintainability (the single file had grown past 16 kLoC); the
registry surface, query bodies, and oracle SQL are byte-identical
to the pre-split module. Same determinism contract: integer /
exact-decimal accumulation, doubles only through IEEE-exact ops
written with identical structure in Spark and the oracle SQL, one
final ROUND per emitted float column.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from .registry import register

# ---- x251: adaptive stopword discovery ----

_X251_SQL = """
WITH tok AS (
  SELECT doc_id, UNNEST(STRING_SPLIT(LOWER(text), ' ')) AS t
  FROM documents),
nd AS (SELECT CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_docs
       FROM documents),
tf AS (
  SELECT t,
         CAST(COUNT(*) AS BIGINT) AS n_occ,
         CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS df
  FROM tok GROUP BY t),
tot AS (SELECT CAST(SUM(n_occ) AS BIGINT) AS n_tokens FROM tf)
SELECT tf.t AS term, tf.n_occ, tf.df,
       ROUND(CAST(tf.df AS DOUBLE) / nd.n_docs, 6) AS doc_frac,
       ROUND(CAST(tf.n_occ AS DOUBLE) / tot.n_tokens, 6) AS token_mass
FROM tf CROSS JOIN nd CROSS JOIN tot
WHERE 2 * tf.df >= nd.n_docs
ORDER BY tf.df DESC, tf.t
"""


@register("x251_adaptive_stopwords", oracle=_X251_SQL)
def x251_adaptive_stopwords(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Adaptive stopword discovery: terms appearing in at least
    half of all documents (integer cross-multiplied gate
    2·df ≥ n_docs), with their document fraction and token mass —
    the corpus-specific stopword list that catches domain chrome
    ("spark", "table" in an engineering crawl) a fixed English
    list never will; feeds x20's quality ratios and x25's TF-IDF
    floor. Reports token_mass so the cost of stopping each word
    is visible before anyone strips it.

    Scale: one (term, doc) distinct + term rollup (Zipf head
    collapses map-side); the gate prunes output to the tiny
    high-df head.
    """
    docs = load_table(spark, sf_dir, "documents")
    tok = docs.select(
        "doc_id", F.explode(F.split(F.lower("text"), " ")).alias("t")
    )
    nd = docs.agg(
        F.countDistinct("doc_id").cast("bigint").alias("n_docs")
    )
    tf = tok.groupBy("t").agg(
        F.count("*").cast("bigint").alias("n_occ"),
        F.countDistinct("doc_id").cast("bigint").alias("df"),
    )
    tot = tf.agg(F.sum("n_occ").cast("bigint").alias("n_tokens"))
    return (
        tf.crossJoin(F.broadcast(nd))
        .crossJoin(F.broadcast(tot))
        .where(2 * F.col("df") >= F.col("n_docs"))
        .select(
            F.col("t").alias("term"),
            "n_occ",
            "df",
            F.round(
                F.col("df").cast("double") / F.col("n_docs"), 6
            ).alias("doc_frac"),
            F.round(
                F.col("n_occ").cast("double") / F.col("n_tokens"), 6
            ).alias("token_mass"),
        )
        .orderBy(F.desc("df"), "term")
    )


# ---- x252: keyword-stuffing detector ----

_X252_MIN_OCC = 20  # support floor, literal

_X252_SQL = f"""
WITH tok AS (
  SELECT doc_id, UNNEST(STRING_SPLIT(LOWER(text), ' ')) AS t
  FROM documents),
per_doc AS (
  SELECT t, doc_id, CAST(COUNT(*) AS BIGINT) AS tf
  FROM tok GROUP BY t, doc_id),
agg AS (
  SELECT t,
         CAST(SUM(tf) AS BIGINT) AS n_occ,
         CAST(COUNT(*) AS BIGINT) AS df,
         CAST(MAX(tf) AS BIGINT) AS max_tf
  FROM per_doc GROUP BY t),
top_doc AS (
  SELECT t, MIN(doc_id) AS dominant_doc
  FROM per_doc p
  WHERE tf = (SELECT MAX(tf) FROM per_doc q WHERE q.t = p.t)
  GROUP BY t)
SELECT a.t AS term, a.n_occ, a.df, a.max_tf, td.dominant_doc,
       ROUND(CAST(a.max_tf AS DOUBLE) / a.n_occ, 6)
         AS dominant_share,
       2 * a.max_tf >= a.n_occ AS stuffed
FROM agg a JOIN top_doc td ON a.t = td.t
WHERE a.n_occ >= {_X252_MIN_OCC}
ORDER BY CAST(a.max_tf AS DOUBLE) / a.n_occ DESC, a.t
LIMIT 20
"""


@register("x252_keyword_stuffing", oracle=_X252_SQL)
def x252_keyword_stuffing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keyword-stuffing detector: terms where a SINGLE document
    carries an outsized share of all corpus occurrences — the
    SEO-spam / degenerate-generation signature that inflates a
    term's stats from one pathological page; top-20 leaderboard
    by dominant-doc share (support-floored) with the `stuffed`
    flag at the 50% bar as an integer cross-multiplication (a
    flag, not a filter, so a healthy corpus still shows its most
    concentrated terms). The dominant doc is named for
    quarantine; complements x119's burstiness (distributional)
    with an attributable single-culprit test.

    Scale: (term, doc) partial agg then term rollup; the
    dominant-doc pick is a window-free min over tied maxima on
    the already-aggregated table.
    """
    from pyspark.sql import Window

    docs = load_table(spark, sf_dir, "documents")
    tok = docs.select(
        "doc_id", F.explode(F.split(F.lower("text"), " ")).alias("t")
    )
    per_doc = tok.groupBy("t", "doc_id").agg(
        F.count("*").cast("bigint").alias("tf")
    )
    agg = per_doc.groupBy("t").agg(
        F.sum("tf").cast("bigint").alias("n_occ"),
        F.count("*").cast("bigint").alias("df"),
        F.max("tf").cast("bigint").alias("max_tf"),
    )
    top_doc = (
        per_doc.withColumn(
            "mx", F.max("tf").over(Window.partitionBy("t"))
        )
        .where(F.col("tf") == F.col("mx"))
        .groupBy("t")
        .agg(F.min("doc_id").alias("dominant_doc"))
    )
    share = F.col("max_tf").cast("double") / F.col("n_occ")
    return (
        agg.join(top_doc, "t")
        .where(F.col("n_occ") >= _X252_MIN_OCC)
        .select(
            F.col("t").alias("term"),
            "n_occ",
            "df",
            "max_tf",
            "dominant_doc",
            F.round(share, 6).alias("dominant_share"),
            (2 * F.col("max_tf") >= F.col("n_occ")).alias("stuffed"),
            share.alias("_s"),
        )
        .orderBy(F.desc("_s"), "term")
        .limit(20)
        .drop("_s")
    )


# ---- x253: brand price positioning ----

_X253_SQL = """
WITH pts AS (
  SELECT p_brand, p_retailprice AS v, p_partkey,
         ROW_NUMBER() OVER (PARTITION BY p_brand
                            ORDER BY p_retailprice, p_partkey) AS rn,
         COUNT(*) OVER (PARTITION BY p_brand) AS n
  FROM part),
bmed AS (
  SELECT p_brand,
         CAST(COUNT(*) AS BIGINT) AS n_parts,
         MAX(CASE WHEN rn = CAST(CEIL(0.50 * n) AS BIGINT)
                  THEN v END) AS brand_median
  FROM pts GROUP BY p_brand),
mkt AS (
  SELECT p_retailprice AS v,
         ROW_NUMBER() OVER (ORDER BY p_retailprice, p_partkey) AS rn,
         COUNT(*) OVER () AS n
  FROM part),
mmed AS (
  SELECT MAX(CASE WHEN rn = CAST(CEIL(0.50 * n) AS BIGINT)
                  THEN v END) AS market_median
  FROM mkt)
SELECT b.p_brand, b.n_parts,
       ROUND(b.brand_median, 2) AS brand_median,
       ROUND(m.market_median, 2) AS market_median,
       ROUND(b.brand_median / m.market_median, 6) AS position_index
FROM bmed b CROSS JOIN mmed m
ORDER BY b.p_brand
"""


@register("x253_price_positioning", oracle=_X253_SQL)
def x253_price_positioning(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brand price positioning: each brand's median retail price
    over the market median (rank-exact medians, x157 idiom) —
    the one-number premium/value-positioning map (1.15 = priced
    15% over market). Pairs with x236's ladder gaps: positioning
    says WHERE a brand sits, gaps say what it left uncovered.

    The index divides two exact data values once.

    Scale: dim-only — two rank sorts over part (per-brand and
    global), brand-sized output. Zero fact I/O.
    """
    from pyspark.sql import Window

    part = load_table(spark, sf_dir, "part")
    wb = Window.partitionBy("p_brand").orderBy(
        "p_retailprice", "p_partkey"
    )
    pts = part.select(
        "p_brand",
        F.col("p_retailprice").alias("v"),
        F.row_number().over(wb).alias("rn"),
        F.count("*").over(Window.partitionBy("p_brand")).alias("n"),
    )
    bmed = pts.groupBy("p_brand").agg(
        F.count("*").cast("bigint").alias("n_parts"),
        F.max(
            F.when(
                F.col("rn")
                == F.ceil(0.50 * F.col("n")).cast("bigint"),
                F.col("v"),
            )
        ).alias("brand_median"),
    )
    wm = Window.orderBy("v", "p_partkey")
    mkt = part.select(
        F.col("p_retailprice").alias("v"),
        "p_partkey",
    ).select(
        "v",
        F.row_number().over(wm).alias("rn"),
        F.count("*").over(Window.partitionBy()).alias("n"),
    )
    mmed = mkt.agg(
        F.max(
            F.when(
                F.col("rn")
                == F.ceil(0.50 * F.col("n")).cast("bigint"),
                F.col("v"),
            )
        ).alias("market_median")
    )
    return (
        bmed.crossJoin(F.broadcast(mmed))
        .select(
            "p_brand",
            "n_parts",
            F.round("brand_median", 2).alias("brand_median"),
            F.round("market_median", 2).alias("market_median"),
            F.round(
                F.col("brand_median") / F.col("market_median"), 6
            ).alias("position_index"),
        )
        .orderBy("p_brand")
    )


# ---- x254: event-mix drift (integer ppm slope signs) ----

_X254_SQL = """
WITH m AS (
  SELECT STRFTIME(DATE_TRUNC('month', CAST(ts AS DATE)), '%Y-%m')
           AS month,
         event_type, CAST(COUNT(*) AS BIGINT) AS c
  FROM events GROUP BY month, event_type),
tot AS (
  SELECT month, CAST(SUM(c) AS BIGINT) AS t FROM m GROUP BY month),
ppm AS (
  SELECT m.event_type,
         CAST(ROW_NUMBER() OVER (PARTITION BY m.event_type
                                 ORDER BY m.month) AS BIGINT) AS i,
         (m.c * 1000000) // tot.t AS share_ppm
  FROM m JOIN tot ON m.month = tot.month),
s AS (
  SELECT event_type,
         CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(i) AS BIGINT) AS sx,
         CAST(SUM(share_ppm) AS BIGINT) AS sy,
         CAST(SUM(i * share_ppm) AS BIGINT) AS sxy
  FROM ppm GROUP BY event_type)
SELECT event_type, n AS n_months,
       ROUND(CAST(sy AS DOUBLE) / n / 10000, 4) AS mean_share_pct,
       CASE WHEN n * sxy > sx * sy THEN 'growing'
            WHEN n * sxy < sx * sy THEN 'shrinking'
            ELSE 'flat' END AS share_trend
FROM s
ORDER BY event_type
"""


@register("x254_event_mix_drift", oracle=_X254_SQL)
def x254_event_mix_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Event-mix drift: is each event type's share of monthly
    traffic growing or shrinking — the instrumentation-mix
    monitor that catches "errors are quietly becoming a larger
    fraction of events" even while absolute volume grows. Monthly
    shares quantize to integer parts-per-million (floor division
    — no float shares), then x202's integer slope-sign rule
    classifies each type's trend with zero floating point in the
    decision.

    Scale: (month, type) agg, month totals join, per-type moment
    rollup — all calendar- and type-bounded.
    """
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events")
    m = ev.groupBy(
        F.date_format(
            F.date_trunc("month", F.col("ts").cast("date")), "yyyy-MM"
        ).alias("month"),
        "event_type",
    ).agg(F.count("*").cast("bigint").alias("c"))
    tot = m.groupBy("month").agg(
        F.sum("c").cast("bigint").alias("t")
    )
    ppm = m.join(F.broadcast(tot), "month").select(
        "event_type",
        F.row_number()
        .over(
            Window.partitionBy("event_type").orderBy("month")
        )
        .cast("bigint")
        .alias("i"),
        F.expr("(c * 1000000) div t").alias("share_ppm"),
    )
    s = ppm.groupBy("event_type").agg(
        F.count("*").cast("bigint").alias("n"),
        F.sum("i").cast("bigint").alias("sx"),
        F.sum("share_ppm").cast("bigint").alias("sy"),
        F.sum(F.col("i") * F.col("share_ppm"))
        .cast("bigint")
        .alias("sxy"),
    )
    lhs = F.col("n") * F.col("sxy")
    rhs = F.col("sx") * F.col("sy")
    return s.select(
        "event_type",
        F.col("n").alias("n_months"),
        F.round(
            F.col("sy").cast("double") / F.col("n") / 10000, 4
        ).alias("mean_share_pct"),
        F.when(lhs > rhs, "growing")
        .when(lhs < rhs, "shrinking")
        .otherwise("flat")
        .alias("share_trend"),
    ).orderBy("event_type")


# ---- x255: user-base saturation curve ----

_X255_SQL = """
WITH first_seen AS (
  SELECT user_id,
         MIN(STRFTIME(DATE_TRUNC('month', CAST(ts AS DATE)), '%Y-%m'))
           AS m
  FROM events GROUP BY user_id),
per_m AS (
  SELECT m, CAST(COUNT(*) AS BIGINT) AS n_new FROM first_seen
  GROUP BY m),
cum AS (
  SELECT m, n_new,
         CAST(SUM(n_new) OVER (ORDER BY m ROWS UNBOUNDED PRECEDING)
              AS BIGINT) AS cum_users
  FROM per_m),
tot AS (SELECT CAST(SUM(n_new) AS BIGINT) AS n_total FROM per_m)
SELECT c.m AS month, c.n_new, c.cum_users,
       ROUND(CAST(c.cum_users AS DOUBLE) / t.n_total, 6)
         AS saturation,
       ROUND(CAST(c.n_new AS DOUBLE)
             / (c.cum_users - c.n_new + 1), 6) AS growth_vs_base
FROM cum c CROSS JOIN tot t
ORDER BY month
"""


@register("x255_user_saturation", oracle=_X255_SQL)
def x255_user_saturation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """User-base saturation curve: cumulative distinct users by
    first-seen month, as a share of the final base, plus each
    month's new users over the prior base (+1 guards the first
    month) — the acquisition S-curve that says whether growth is
    compounding or the addressable pool is drying up (x101 tracks
    whether acquired users STAY; this tracks whether new ones
    keep ARRIVING). Running distinct-count becomes an exact
    integer cumsum over first-seen months — never a per-month
    COUNT(DISTINCT) rescan.

    Scale: per-user min (one user_id shuffle), month rollup,
    calendar-bounded window.
    """
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events")
    first_seen = ev.groupBy("user_id").agg(
        F.min(
            F.date_format(
                F.date_trunc("month", F.col("ts").cast("date")),
                "yyyy-MM",
            )
        ).alias("m")
    )
    per_m = first_seen.groupBy("m").agg(
        F.count("*").cast("bigint").alias("n_new")
    )
    cum = per_m.select(
        "m",
        "n_new",
        F.sum("n_new")
        .over(
            Window.orderBy("m").rowsBetween(
                Window.unboundedPreceding, 0
            )
        )
        .cast("bigint")
        .alias("cum_users"),
    )
    tot = per_m.agg(F.sum("n_new").cast("bigint").alias("n_total"))
    return (
        cum.crossJoin(F.broadcast(tot))
        .select(
            F.col("m").alias("month"),
            "n_new",
            "cum_users",
            F.round(
                F.col("cum_users").cast("double") / F.col("n_total"), 6
            ).alias("saturation"),
            F.round(
                F.col("n_new").cast("double")
                / (F.col("cum_users") - F.col("n_new") + 1),
                6,
            ).alias("growth_vs_base"),
        )
        .orderBy("month")
    )


# ---- x256: catalog utilization curve ----

_X256_SQL = """
WITH first_sold AS (
  SELECT l_partkey,
         CAST(MIN(YEAR(CAST(l_shipdate AS DATE))) AS BIGINT) AS yr
  FROM lineitem GROUP BY l_partkey),
per_y AS (
  SELECT yr, CAST(COUNT(*) AS BIGINT) AS n_first FROM first_sold
  GROUP BY yr),
cum AS (
  SELECT yr, n_first,
         CAST(SUM(n_first) OVER (ORDER BY yr ROWS UNBOUNDED PRECEDING)
              AS BIGINT) AS cum_parts
  FROM per_y),
cat AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_catalog FROM part)
SELECT c.yr AS year, c.n_first AS parts_first_sold, c.cum_parts,
       ca.n_catalog,
       ROUND(CAST(c.cum_parts AS DOUBLE) / ca.n_catalog, 6)
         AS catalog_coverage
FROM cum c CROSS JOIN cat ca
ORDER BY year
"""


@register("x256_catalog_utilization", oracle=_X256_SQL)
def x256_catalog_utilization(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Catalog utilization curve: cumulative share of the part
    catalog that has EVER sold, by year of first sale — how fast
    the assortment earns its keep, and how much dead catalog
    remains (the complement of the final coverage number is
    never-sold inventory x212 localizes by nation). Same
    first-seen cumsum shape as x255, denominated against the full
    part dim.

    Scale: partkey-grain min-year agg, years-sized window, 1-row
    catalog-count broadcast.
    """
    from pyspark.sql import Window

    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    first_sold = li.groupBy("l_partkey").agg(
        F.min(F.year(F.col("l_shipdate").cast("date")))
        .cast("bigint")
        .alias("yr")
    )
    per_y = first_sold.groupBy("yr").agg(
        F.count("*").cast("bigint").alias("n_first")
    )
    cum = per_y.select(
        "yr",
        "n_first",
        F.sum("n_first")
        .over(
            Window.orderBy("yr").rowsBetween(
                Window.unboundedPreceding, 0
            )
        )
        .cast("bigint")
        .alias("cum_parts"),
    )
    cat = part.agg(F.count("*").cast("bigint").alias("n_catalog"))
    return (
        cum.crossJoin(F.broadcast(cat))
        .select(
            F.col("yr").alias("year"),
            F.col("n_first").alias("parts_first_sold"),
            "cum_parts",
            "n_catalog",
            F.round(
                F.col("cum_parts").cast("double") / F.col("n_catalog"),
                6,
            ).alias("catalog_coverage"),
        )
        .orderBy("year")
    )


# ---- x257: basket brand-breadth histogram ----

_X257_SQL = """
WITH ob AS (
  SELECT l.l_orderkey,
         CAST(COUNT(DISTINCT p.p_brand) AS BIGINT) AS n_brands
  FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
  GROUP BY l.l_orderkey),
t AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_orders FROM ob)
SELECT n_brands,
       CAST(COUNT(*) AS BIGINT) AS n_orders,
       ROUND(CAST(COUNT(*) AS DOUBLE) / (SELECT n_orders FROM t), 6)
         AS order_share
FROM ob
GROUP BY n_brands
ORDER BY n_brands
"""


@register("x257_basket_breadth", oracle=_X257_SQL)
def x257_basket_breadth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Basket brand-breadth histogram: distinct brands per order —
    single-brand baskets mean customers shop brands, not the
    store (merchandising implication: cross-brand bundles are
    fighting behavior); broad baskets mean category shopping
    (x139's co-purchase pairs say WHICH brands travel together;
    this says how often ANY do).

    Integer distinct counts; one share division.

    Scale: orderkey-grain distinct agg (unique unskewed key,
    partial-distinct combinable), small histogram + broadcast
    total.
    """
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    ob = (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .groupBy("l_orderkey")
        .agg(
            F.countDistinct("p_brand").cast("bigint").alias("n_brands")
        )
    )
    t = ob.agg(F.count("*").cast("bigint").alias("nt"))
    return (
        ob.groupBy("n_brands")
        .agg(F.count("*").cast("bigint").alias("n_orders"))
        .crossJoin(F.broadcast(t))
        .select(
            "n_brands",
            "n_orders",
            F.round(
                F.col("n_orders").cast("double") / F.col("nt"), 6
            ).alias("order_share"),
        )
        .orderBy("n_brands")
    )


# ---- x258: weekly active users trend ----

_X258_SQL = """
WITH wau AS (
  SELECT DATE_TRUNC('week', CAST(ts AS DATE)) AS week,
         CAST(COUNT(DISTINCT user_id) AS BIGINT) AS wau
  FROM events GROUP BY week),
tr AS (
  SELECT week, wau,
         LAG(wau) OVER (ORDER BY week) AS wau_prev,
         CAST(SUM(wau) OVER (ORDER BY week
                             ROWS BETWEEN 3 PRECEDING AND CURRENT ROW)
              AS BIGINT) AS sum4,
         CAST(COUNT(*) OVER (ORDER BY week
                             ROWS BETWEEN 3 PRECEDING AND CURRENT ROW)
              AS BIGINT) AS n4
  FROM wau)
SELECT week, wau,
       CAST(wau - wau_prev AS BIGINT) AS wow_delta,
       ROUND(CAST(sum4 AS DOUBLE) / n4, 4) AS wau_4wk_avg
FROM tr
ORDER BY week
"""


@register("x258_wau_trend", oracle=_X258_SQL)
def x258_wau_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly active users with week-over-week delta and the
    4-week trailing average — the line at the top of every
    product dashboard, smoothed enough to see through holiday
    dips (x149's DAU/MAU measures intensity; this measures the
    base itself). The trailing window divides an exact integer
    sum by its own observed row count, so partial head windows
    average over what exists instead of zero-padding.

    Scale: (week, user) distinct agg, then calendar-bounded
    windows over the weekly table.
    """
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events")
    wau = ev.groupBy(
        F.date_trunc("week", F.col("ts").cast("date"))
        .cast("date")
        .alias("week")
    ).agg(F.countDistinct("user_id").cast("bigint").alias("wau"))
    w = Window.orderBy("week")
    w4 = w.rowsBetween(-3, 0)
    tr = wau.select(
        "week",
        "wau",
        F.lag("wau").over(w).alias("wau_prev"),
        F.sum("wau").over(w4).cast("bigint").alias("sum4"),
        F.count("*").over(w4).cast("bigint").alias("n4"),
    )
    return tr.select(
        "week",
        "wau",
        (F.col("wau") - F.col("wau_prev"))
        .cast("bigint")
        .alias("wow_delta"),
        F.round(
            F.col("sum4").cast("double") / F.col("n4"), 4
        ).alias("wau_4wk_avg"),
    ).orderBy("week")


# ---- x260: one-row executive summary ----

_X260_SQL = """
WITH rev AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_orders,
         CAST(COUNT(DISTINCT o_custkey) AS BIGINT) AS n_customers,
         SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS total
  FROM orders),
top_nation AS (
  SELECT n.n_name
  FROM lineitem l
  JOIN supplier s ON l.l_suppkey = s.s_suppkey
  JOIN nation n ON s.s_nationkey = n.n_nationkey
  GROUP BY n.n_name
  ORDER BY SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))
               * (CAST(1 AS DECIMAL(6,4))
                  - CAST(l.l_discount AS DECIMAL(6,4)))) DESC, n.n_name
  LIMIT 1),
top_brand AS (
  SELECT p.p_brand
  FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
  GROUP BY p.p_brand
  ORDER BY SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))
               * (CAST(1 AS DECIMAL(6,4))
                  - CAST(l.l_discount AS DECIMAL(6,4)))) DESC, p.p_brand
  LIMIT 1)
SELECT r.n_orders, r.n_customers,
       ROUND(CAST(r.total AS DOUBLE), 2) AS total_revenue,
       ROUND(CAST(r.total AS DOUBLE) / r.n_orders, 2) AS aov,
       ROUND(CAST(r.total AS DOUBLE) / r.n_customers, 2)
         AS revenue_per_customer,
       tn.n_name AS top_supplier_nation,
       tb.p_brand AS top_brand
FROM rev r CROSS JOIN top_nation tn CROSS JOIN top_brand tb
"""


@register("x260_exec_summary", oracle=_X260_SQL)
def x260_exec_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-row executive summary: order/customer counts, total
    revenue, AOV, revenue per customer, and the top supplier
    nation and brand by net revenue — the single-row table a
    reporting layer caches as "the numbers", composed from three
    independent aggregates joined as 1-row broadcasts. Every
    drill-down it provokes already exists in the x-series
    (x248 ARPU trend, x229 movers, x153 concentration, ...).

    Exact decimal totals; argmaxes are ordered LIMIT 1 with name
    tiebreaks.

    Scale: three independent scans (parallel legs), each ending
    in a tiny ordered take or 1-row agg; the final join is
    broadcast-trivial.
    """
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    sup = load_table(spark, sf_dir, "supplier")
    nat = load_table(spark, sf_dir, "nation")
    part = load_table(spark, sf_dir, "part")
    disc = (
        F.col("l_extendedprice").cast("decimal(18,2)")
        * (F.lit(1).cast("decimal(6,4)") - F.col("l_discount").cast("decimal(6,4)"))
    )
    rev = orders.agg(
        F.count("*").cast("bigint").alias("n_orders"),
        F.countDistinct("o_custkey").cast("bigint").alias("n_customers"),
        F.sum(F.col("o_totalprice").cast("decimal(18,2)")).alias("total"),
    )
    # r11 (guide §1.2): the two revenue argmaxes shared a lineitem
    # scan each; both dims broadcast, so ONE pass with GROUPING SETS
    # computes the per-nation and per-brand sums in a single
    # data-sized aggregate (exact decimal sums regroup identically;
    # every l_suppkey/l_partkey resolves in its dim — fixture
    # referential integrity the differential re-proves per round).
    # The two argmax branches read the same aggregate subtree, which
    # canonicalizes identically → ReuseExchange fires (deterministic
    # sums, unlike the collect_set case x92 hit).
    gs = (
        li.join(F.broadcast(sup), li.l_suppkey == sup.s_suppkey)
        .join(F.broadcast(nat), sup.s_nationkey == nat.n_nationkey)
        .join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .select("n_name", "p_brand", disc.alias("__d"))
        .groupingSets([["n_name"], ["p_brand"]], "n_name", "p_brand")
        .agg(
            F.sum("__d").alias("r"),
            F.grouping("n_name").alias("__gn"),
        )
    )
    top_nation = (
        gs.filter(F.col("__gn") == 0)
        .orderBy(F.desc("r"), "n_name")
        .limit(1)
        .select("n_name")
    )
    top_brand = (
        gs.filter(F.col("__gn") == 1)
        .orderBy(F.desc("r"), "p_brand")
        .limit(1)
        .select("p_brand")
    )
    return (
        rev.crossJoin(F.broadcast(top_nation))
        .crossJoin(F.broadcast(top_brand))
        .select(
            "n_orders",
            "n_customers",
            F.round(F.col("total").cast("double"), 2).alias(
                "total_revenue"
            ),
            F.round(
                F.col("total").cast("double") / F.col("n_orders"), 2
            ).alias("aov"),
            F.round(
                F.col("total").cast("double") / F.col("n_customers"), 2
            ).alias("revenue_per_customer"),
            F.col("n_name").alias("top_supplier_nation"),
            F.col("p_brand").alias("top_brand"),
        )
    )


# ---- x261: nation revenue volatility (CV league table) ----

_X261_SQL = """
WITH q AS (
  SELECT n.n_name AS nation,
         CAST(YEAR(CAST(o.o_orderdate AS DATE)) AS BIGINT) * 10
           + CAST(QUARTER(CAST(o.o_orderdate AS DATE)) AS BIGINT)
           AS yq,
         CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))
                  * (CAST(1 AS DECIMAL(6,4))
                     - CAST(l.l_discount AS DECIMAL(6,4)))) * 1000000
              AS DECIMAL(19,0)) AS c
  FROM lineitem l
  JOIN orders o ON l.l_orderkey = o.o_orderkey
  JOIN supplier s ON l.l_suppkey = s.s_suppkey
  JOIN nation n ON s.s_nationkey = n.n_nationkey
  GROUP BY nation, yq),
m AS (
  SELECT nation,
         CAST(COUNT(*) AS BIGINT) AS n,
         SUM(c) AS s, SUM(c * c) AS ss
  FROM q GROUP BY nation)
SELECT nation, n AS n_quarters,
       CAST((2 * CAST(s AS BIGINT) + n) // (2 * n) AS DOUBLE)
         / 1000000 AS mean_quarterly_rev,
       ROUND(SQRT((CAST(ss AS DOUBLE) - CAST(s AS DOUBLE)
                   * CAST(s AS DOUBLE) / CAST(n AS DOUBLE))
                  / (CAST(n AS DOUBLE) - 1))
             / (CAST(s AS DOUBLE) / n), 6) AS cv
FROM m
ORDER BY cv DESC, nation
"""


@register("x261_revenue_volatility", oracle=_X261_SQL)
def x261_revenue_volatility(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nation revenue volatility league: coefficient of variation
    of quarterly supplier revenue per nation — high-CV nations
    need buffers and hedges, low-CV ones can run lean (x211 asks
    whether ranks moved; this asks how bumpy the ride is
    regardless of rank). Exact decimal cent moments; the CV is
    one fixed sqrt-over-division expression, and the displayed
    mean rounds half-up in INTEGER micro-units (cents would drop
    the sum's 4 residual fractional digits, which Spark's decimal
    downcast ROUNDS and DuckDB's TRUNCATES — measured a 1-cent
    systematic split; micro-units keep the sum exact).

    Scale: (nation, quarter) fact agg, 25-row moment rollup.
    """
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    sup = load_table(spark, sf_dir, "supplier")
    nat = load_table(spark, sf_dir, "nation")
    disc = (
        F.col("l_extendedprice").cast("decimal(18,2)")
        * (F.lit(1).cast("decimal(6,4)") - F.col("l_discount").cast("decimal(6,4)"))
    )
    q = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(sup), li.l_suppkey == sup.s_suppkey)
        .join(F.broadcast(nat), sup.s_nationkey == nat.n_nationkey)
        .groupBy(
            F.col("n_name").alias("nation"),
            (
                F.year(F.col("o_orderdate").cast("date")).cast("bigint")
                * 10
                + F.quarter(F.col("o_orderdate").cast("date")).cast(
                    "bigint"
                )
            ).alias("yq"),
        )
        .agg(
            (F.sum(disc) * 1000000).cast("decimal(19,0)").alias("c")
        )
    )
    m = q.groupBy("nation").agg(
        F.count("*").cast("bigint").alias("n"),
        F.sum("c").alias("s"),
        F.sum(F.col("c") * F.col("c")).alias("ss"),
    )
    d = lambda c: F.col(c).cast("double")  # noqa: E731
    cv = F.sqrt(
        (d("ss") - d("s") * d("s") / d("n")) / (d("n") - 1)
    ) / (d("s") / F.col("n"))
    return m.select(
        "nation",
        F.col("n").alias("n_quarters"),
        (
            F.expr("(2 * CAST(s AS BIGINT) + n) div (2 * n)").cast(
                "double"
            )
            / 1000000
        ).alias("mean_quarterly_rev"),
        F.round(cv, 6).alias("cv"),
    ).orderBy(F.desc("cv"), "nation")


# ---- x262: part-type revenue mix ----

_X262_SQL = """
WITH rev AS (
  SELECT p.p_type,
         CAST(COUNT(*) AS BIGINT) AS n_lines,
         CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))
                  * (CAST(1 AS DECIMAL(6,4))
                     - CAST(l.l_discount AS DECIMAL(6,4)))) * 1000000
              AS DECIMAL(19,0)) AS rev_u
  FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
  GROUP BY p.p_type),
tot AS (SELECT SUM(rev_u) AS t FROM rev)
SELECT r.p_type, r.n_lines,
       ((CAST(r.rev_u AS BIGINT) + 5000) // 10000) / 100.0 AS revenue,
       ROUND(CAST(r.rev_u AS DOUBLE) / CAST(t.t AS DOUBLE), 6)
         AS revenue_share
FROM rev r CROSS JOIN tot t
ORDER BY r.rev_u DESC, r.p_type
LIMIT 20
"""


@register("x262_type_revenue_mix", oracle=_X262_SQL)
def x262_type_revenue_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Part-type revenue mix: top-20 product types by net revenue
    with line counts and shares — the category dimension (p_type)
    the brand-centric views (x186, x229) never slice; a type
    whose share dwarfs its line share is a premium category worth
    its own planning lane. Exact micro-unit decimals; top-20
    orders by the exact decimal with type tiebreak.

    Scale: dim-broadcast fact join, type-sized agg, broadcast
    total, TakeOrdered.
    """
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    disc = (
        F.col("l_extendedprice").cast("decimal(18,2)")
        * (F.lit(1).cast("decimal(6,4)") - F.col("l_discount").cast("decimal(6,4)"))
    )
    rev = (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .groupBy("p_type")
        .agg(
            F.count("*").cast("bigint").alias("n_lines"),
            (F.sum(disc) * 1000000)
            .cast("decimal(19,0)")
            .alias("rev_u"),
        )
    )
    tot = rev.agg(F.sum("rev_u").alias("t"))
    return (
        rev.crossJoin(F.broadcast(tot))
        .select(
            "p_type",
            "n_lines",
            (F.expr("(cast(rev_u as bigint) + 5000) div 10000") / F.lit(100.0)).alias(
                "revenue"
            ),
            F.round(
                F.col("rev_u").cast("double") / F.col("t").cast("double"),
                6,
            ).alias("revenue_share"),
            F.col("rev_u").alias("_o"),
        )
        .orderBy(F.desc("_o"), "p_type")
        .limit(20)
        .drop("_o")
    )


# ---- x263: pay-cycle (day-of-month) revenue profile ----

_X263_SQL = """
WITH d AS (
  SELECT CASE WHEN DAYOFMONTH(CAST(o_orderdate AS DATE)) <= 10
              THEN 'a_early_1_10'
              WHEN DAYOFMONTH(CAST(o_orderdate AS DATE)) <= 20
              THEN 'b_mid_11_20'
              ELSE 'c_late_21_31' END AS month_part,
         CAST(o_totalprice AS DECIMAL(18,2)) AS price
  FROM orders),
t AS (SELECT CAST(COUNT(*) AS BIGINT) AS n, SUM(price) AS s FROM d)
SELECT d.month_part,
       CAST(COUNT(*) AS BIGINT) AS n_orders,
       ROUND(CAST(SUM(d.price) AS DOUBLE), 2) AS revenue,
       ROUND(CAST(COUNT(*) AS DOUBLE) / t.n, 6) AS order_share,
       ROUND(CAST(SUM(d.price) AS DOUBLE) / CAST(t.s AS DOUBLE), 6)
         AS revenue_share
FROM d CROSS JOIN t
GROUP BY d.month_part, t.n, t.s
ORDER BY d.month_part
"""


@register("x263_paycycle_profile", oracle=_X263_SQL)
def x263_paycycle_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pay-cycle revenue profile: orders and revenue by month
    third (1-10 / 11-20 / 21-31) — consumer businesses see an
    early-month payday bump and a pre-payday trough; a flat
    profile here means pricing/promo timing can ignore the
    calendar (and a skewed one prices month-end promotions). The
    within-month rhythm x201's month-level index can't see.

    Exact decimal sums; shares divide against 1-row totals.

    Scale: narrow bucket map + 3-key agg with broadcast totals.
    """
    orders = load_table(spark, sf_dir, "orders")
    d = orders.select(
        F.when(
            F.dayofmonth(F.col("o_orderdate").cast("date")) <= 10,
            "a_early_1_10",
        )
        .when(
            F.dayofmonth(F.col("o_orderdate").cast("date")) <= 20,
            "b_mid_11_20",
        )
        .otherwise("c_late_21_31")
        .alias("month_part"),
        F.col("o_totalprice").cast("decimal(18,2)").alias("price"),
    )
    t = d.agg(
        F.count("*").cast("bigint").alias("nt"),
        F.sum("price").alias("st"),
    )
    return (
        d.groupBy("month_part")
        .agg(
            F.count("*").cast("bigint").alias("n_orders"),
            F.sum("price").alias("s"),
        )
        .crossJoin(F.broadcast(t))
        .select(
            "month_part",
            "n_orders",
            F.round(F.col("s").cast("double"), 2).alias("revenue"),
            F.round(
                F.col("n_orders").cast("double") / F.col("nt"), 6
            ).alias("order_share"),
            F.round(
                F.col("s").cast("double") / F.col("st").cast("double"),
                6,
            ).alias("revenue_share"),
        )
        .orderBy("month_part")
    )


# ---- x264: fulfillment speed trend ----

_X264_SQL = """
WITH delays AS (
  SELECT CAST(YEAR(CAST(o.o_orderdate AS DATE)) AS BIGINT) AS yr,
         CAST(DATEDIFF('day', CAST(o.o_orderdate AS DATE),
                       CAST(l.l_shipdate AS DATE)) AS BIGINT) AS d
  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey),
per_y AS (
  SELECT yr, CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(d) AS BIGINT) AS s
  FROM delays GROUP BY yr),
idx AS (
  SELECT yr, n, s,
         CAST(ROW_NUMBER() OVER (ORDER BY yr) AS BIGINT) AS i,
         (s * 1000000) // n AS mean_ppm
  FROM per_y),
slope AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS ny,
         CAST(SUM(i) AS BIGINT) AS sx,
         CAST(SUM(mean_ppm) AS BIGINT) AS sy,
         CAST(SUM(i * mean_ppm) AS BIGINT) AS sxy
  FROM idx)
SELECT i.yr AS year, i.n AS n_lines,
       ((i.mean_ppm + 50) // 100) / 10000.0 AS mean_delay_d,
       CASE WHEN sl.ny * sl.sxy < sl.sx * sl.sy THEN 'improving'
            WHEN sl.ny * sl.sxy > sl.sx * sl.sy THEN 'worsening'
            ELSE 'flat' END AS overall_trend
FROM idx i CROSS JOIN slope sl
ORDER BY year
"""


@register("x264_fulfillment_speed_trend", oracle=_X264_SQL)
def x264_fulfillment_speed_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fulfillment speed trend: mean order-to-ship delay per year,
    with an overall improving/worsening verdict from the integer
    slope-sign rule on ppm-quantized yearly means (x254's
    quantize-then-sign trick) — the ops headline over x169's SLA
    percentiles: is the whole curve moving the right way?

    Integer day sums; mean quantizes to parts-per-million by
    floor division (deterministic), displayed via one exact
    double divide.

    Scale: fact join + years-sized rollup; slope over ≤ a few
    dozen year rows.
    """
    from pyspark.sql import Window

    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    delays = li.join(orders, li.l_orderkey == orders.o_orderkey).select(
        F.year(F.col("o_orderdate").cast("date"))
        .cast("bigint")
        .alias("yr"),
        F.datediff(
            F.col("l_shipdate").cast("date"),
            F.col("o_orderdate").cast("date"),
        )
        .cast("bigint")
        .alias("d"),
    )
    per_y = delays.groupBy("yr").agg(
        F.count("*").cast("bigint").alias("n"),
        F.sum("d").cast("bigint").alias("s"),
    )
    idx = per_y.select(
        "yr",
        "n",
        F.row_number()
        .over(Window.orderBy("yr"))
        .cast("bigint")
        .alias("i"),
        F.expr("(s * 1000000) div n").alias("mean_ppm"),
    )
    slope = idx.agg(
        F.count("*").cast("bigint").alias("ny"),
        F.sum("i").cast("bigint").alias("sx"),
        F.sum("mean_ppm").cast("bigint").alias("sy"),
        F.sum(F.col("i") * F.col("mean_ppm"))
        .cast("bigint")
        .alias("sxy"),
    )
    lhs = F.col("ny") * F.col("sxy")
    rhs = F.col("sx") * F.col("sy")
    return (
        idx.crossJoin(F.broadcast(slope))
        .select(
            F.col("yr").alias("year"),
            F.col("n").alias("n_lines"),
            # q34-class value-driven boundary (r10 inventory):
            # round(mean_ppm/1e6, 4) hits a cross-engine half-way
            # point whenever mean_ppm ≡ 50 (mod 100) — ~1% of value
            # draws. Exact integer half-up + ONE double divide
            # instead (nonneg: shipdate ≥ orderdate).
            (F.expr("(mean_ppm + 50) div 100") / F.lit(10000.0)).alias(
                "mean_delay_d"
            ),
            F.when(lhs < rhs, "improving")
            .when(lhs > rhs, "worsening")
            .otherwise("flat")
            .alias("overall_trend"),
        )
        .orderBy("year")
    )


# ---- x265: source x language independence cells ----

_X265_SQL = """
WITH obs AS (
  SELECT source, lang, CAST(COUNT(*) AS BIGINT) AS o
  FROM documents GROUP BY source, lang),
rt AS (SELECT source, CAST(SUM(o) AS BIGINT) AS r FROM obs
       GROUP BY source),
ct AS (SELECT lang, CAST(SUM(o) AS BIGINT) AS c FROM obs
       GROUP BY lang),
tt AS (SELECT CAST(SUM(o) AS BIGINT) AS n FROM obs)
SELECT obs.source, obs.lang, obs.o AS n_docs,
       ROUND(CAST(rt.r AS DOUBLE) * ct.c / tt.n, 4) AS n_expected,
       ROUND((obs.o - CAST(rt.r AS DOUBLE) * ct.c / tt.n)
             * (obs.o - CAST(rt.r AS DOUBLE) * ct.c / tt.n)
             / (CAST(rt.r AS DOUBLE) * ct.c / tt.n), 6) AS chi2_term
FROM obs
JOIN rt ON obs.source = rt.source
JOIN ct ON obs.lang = ct.lang
CROSS JOIN tt
ORDER BY obs.source, obs.lang
"""


@register("x265_source_lang_independence", oracle=_X265_SQL)
def x265_source_lang_independence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Source x language contingency cells with chi-square
    contributions: is language composition uniform across sources
    (then per-source language filters are redundant) or do some
    sources specialize (then x43's mix recipe must stratify by
    BOTH)? x161's independence machinery moved to the corpus
    dimensions, with the same exact-marginal construction.

    Scale: (source, lang) agg; marginals re-aggregate the small
    cell table; all joins broadcast.
    """
    docs = load_table(spark, sf_dir, "documents")
    obs = docs.groupBy("source", "lang").agg(
        F.count("*").cast("bigint").alias("o")
    )
    rt = obs.groupBy("source").agg(
        F.sum("o").cast("bigint").alias("r")
    )
    ct = obs.groupBy("lang").agg(F.sum("o").cast("bigint").alias("c"))
    tt = obs.agg(F.sum("o").cast("bigint").alias("n"))
    exp = F.col("r").cast("double") * F.col("c") / F.col("n")
    dev = F.col("o") - exp
    return (
        obs.join(F.broadcast(rt), "source")
        .join(F.broadcast(ct), "lang")
        .crossJoin(F.broadcast(tt))
        .select(
            "source",
            "lang",
            F.col("o").alias("n_docs"),
            F.round(exp, 4).alias("n_expected"),
            F.round(dev * dev / exp, 6).alias("chi2_term"),
        )
        .orderBy("source", "lang")
    )


# ---- x266: nation top-brand dependence ----

_X266_SQL = """
WITH rev AS (
  SELECT n.n_name AS nation, p.p_brand,
         CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))
                  * (CAST(1 AS DECIMAL(6,4))
                     - CAST(l.l_discount AS DECIMAL(6,4)))) * 1000000
              AS DECIMAL(19,0)) AS rev_u
  FROM lineitem l
  JOIN orders o ON l.l_orderkey = o.o_orderkey
  JOIN customer c ON o.o_custkey = c.c_custkey
  JOIN nation n ON c.c_nationkey = n.n_nationkey
  JOIN part p ON l.l_partkey = p.p_partkey
  GROUP BY nation, p.p_brand),
rk AS (
  SELECT nation, p_brand, rev_u,
         ROW_NUMBER() OVER (PARTITION BY nation
                            ORDER BY rev_u DESC, p_brand) AS rn,
         SUM(rev_u) OVER (PARTITION BY nation) AS tot_u
  FROM rev)
SELECT nation,
       p_brand AS top_brand,
       ((CAST(rev_u AS BIGINT) + 5000) // 10000) / 100.0 AS top_brand_revenue,
       ROUND(CAST(rev_u AS DOUBLE) / CAST(tot_u AS DOUBLE), 6)
         AS dependence_share
FROM rk
WHERE rn = 1
ORDER BY nation
"""


@register("x266_brand_dependence", oracle=_X266_SQL)
def x266_brand_dependence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nation top-brand dependence: each customer nation's
    highest-revenue brand and its share of that nation's spend —
    markets leaning hard on one brand are exposed to its supply
    and pricing (the demand-side mirror of x153's supplier HHI,
    localized to the single biggest exposure). Rank pick with
    brand tiebreak; exact micro-unit decimals; one share
    division.

    Scale: (nation, brand) fact agg, nation-partitioned rank and
    windowed total in one pass, 25-row output.
    """
    from pyspark.sql import Window

    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    nat = load_table(spark, sf_dir, "nation")
    part = load_table(spark, sf_dir, "part")
    disc = (
        F.col("l_extendedprice").cast("decimal(18,2)")
        * (F.lit(1).cast("decimal(6,4)") - F.col("l_discount").cast("decimal(6,4)"))
    )
    rev = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nat), cust.c_nationkey == nat.n_nationkey)
        .join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .groupBy(F.col("n_name").alias("nation"), "p_brand")
        .agg(
            (F.sum(disc) * 1000000)
            .cast("decimal(19,0)")
            .alias("rev_u")
        )
    )
    rk = rev.select(
        "nation",
        "p_brand",
        "rev_u",
        F.row_number()
        .over(
            Window.partitionBy("nation").orderBy(
                F.desc("rev_u"), "p_brand"
            )
        )
        .alias("rn"),
        F.sum("rev_u")
        .over(Window.partitionBy("nation"))
        .alias("tot_u"),
    )
    return (
        rk.where(F.col("rn") == 1)
        .select(
            "nation",
            F.col("p_brand").alias("top_brand"),
            (F.expr("(cast(rev_u as bigint) + 5000) div 10000") / F.lit(100.0)).alias(
                "top_brand_revenue"
            ),
            F.round(
                F.col("rev_u").cast("double")
                / F.col("tot_u").cast("double"),
                6,
            ).alias("dependence_share"),
        )
        .orderBy("nation")
    )


# ---- x267: customer receivables risk ----

_X267_SQL = """
WITH r AS (
  SELECT c_mktsegment AS segment,
         CAST(c_acctbal AS DECIMAL(18,2)) AS bal,
         c_custkey,
         ROW_NUMBER() OVER (PARTITION BY c_mktsegment
                            ORDER BY c_acctbal, c_custkey) AS rn,
         COUNT(*) OVER (PARTITION BY c_mktsegment) AS n
  FROM customer)
SELECT segment,
       CAST(MAX(n) AS BIGINT) AS n_customers,
       CAST(SUM(CASE WHEN bal < 0 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_negative,
       ROUND(CAST(SUM(CASE WHEN bal < 0 THEN 1 ELSE 0 END) AS DOUBLE)
             / MAX(n), 6) AS negative_share,
       ROUND(CAST(SUM(bal) AS DOUBLE) / MAX(n), 2) AS avg_balance,
       ROUND(MAX(CASE WHEN rn = CAST(CEIL(0.10 * n) AS BIGINT)
                      THEN CAST(bal AS DOUBLE) END), 2) AS p10_balance
FROM r
GROUP BY segment
ORDER BY segment
"""


@register("x267_receivables_risk", oracle=_X267_SQL)
def x267_receivables_risk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customer receivables risk per segment: negative-balance
    share, average balance, and the rank-exact 10th-percentile
    balance — the credit-exposure snapshot finance reads next to
    x191's at-risk matrix (dormant AND in the red is the
    write-off candidate list). First use of c_acctbal in the
    analytics surface.

    Exact decimal balances; the p10 is a data value (x157 rank
    idiom), not an interpolated quantile.

    Scale: one segment-partitioned window over the customer dim,
    5-row output. Dim-only — zero fact I/O.
    """
    from pyspark.sql import Window

    cust = load_table(spark, sf_dir, "customer")
    r = cust.select(
        F.col("c_mktsegment").alias("segment"),
        F.col("c_acctbal").cast("decimal(18,2)").alias("bal"),
        F.row_number()
        .over(
            Window.partitionBy("c_mktsegment").orderBy(
                "c_acctbal", "c_custkey"
            )
        )
        .alias("rn"),
        F.count("*")
        .over(Window.partitionBy("c_mktsegment"))
        .alias("n"),
    )
    neg = F.sum(F.when(F.col("bal") < 0, 1).otherwise(0))
    return (
        r.groupBy("segment")
        .agg(
            F.max("n").cast("bigint").alias("n_customers"),
            neg.cast("bigint").alias("n_negative"),
            F.round(neg.cast("double") / F.max("n"), 6).alias(
                "negative_share"
            ),
            F.round(
                F.sum("bal").cast("double") / F.max("n"), 2
            ).alias("avg_balance"),
            F.round(
                F.max(
                    F.when(
                        F.col("rn")
                        == F.ceil(0.10 * F.col("n")).cast("bigint"),
                        F.col("bal").cast("double"),
                    )
                ),
                2,
            ).alias("p10_balance"),
        )
        .orderBy("segment")
    )


# ---- x268: supplier balance health by nation ----

_X268_SQL = """
SELECT n.n_name AS nation,
       CAST(COUNT(*) AS BIGINT) AS n_suppliers,
       CAST(SUM(CASE WHEN s.s_acctbal < 0 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_negative,
       ROUND(CAST(SUM(CASE WHEN s.s_acctbal < 0 THEN 1 ELSE 0 END)
                  AS DOUBLE) / COUNT(*), 6) AS negative_share,
       ROUND(CAST(SUM(CAST(s.s_acctbal AS DECIMAL(18,2))) AS DOUBLE)
             / COUNT(*), 2) AS avg_balance,
       ROUND(CAST(MIN(s.s_acctbal) AS DOUBLE), 2) AS worst_balance
FROM supplier s JOIN nation n ON s.s_nationkey = n.n_nationkey
GROUP BY nation
ORDER BY nation
"""


@register("x268_supplier_balance_health", oracle=_X268_SQL)
def x268_supplier_balance_health(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Supplier balance health by nation: negative-balance count
    and share, average and worst balances — a financially shaky
    supplier base is a delivery risk x189's single-source view
    compounds (single-sourced FROM a negative-balance vendor is
    the red cell). First use of s_acctbal in the analytics
    surface.

    Exact decimal sums; one division per ratio.

    Scale: dim-only aggregate with broadcast nation join.
    """
    sup = load_table(spark, sf_dir, "supplier")
    nat = load_table(spark, sf_dir, "nation")
    neg = F.sum(F.when(F.col("s_acctbal") < 0, 1).otherwise(0))
    return (
        sup.join(F.broadcast(nat), sup.s_nationkey == nat.n_nationkey)
        .groupBy(F.col("n_name").alias("nation"))
        .agg(
            F.count("*").cast("bigint").alias("n_suppliers"),
            neg.cast("bigint").alias("n_negative"),
            F.round(neg.cast("double") / F.count("*"), 6).alias(
                "negative_share"
            ),
            F.round(
                F.sum(F.col("s_acctbal").cast("decimal(18,2)")).cast(
                    "double"
                )
                / F.count("*"),
                2,
            ).alias("avg_balance"),
            F.round(F.min("s_acctbal").cast("double"), 2).alias(
                "worst_balance"
            ),
        )
        .orderBy("nation")
    )


# ---- x269: account balance vs realized spend ----

_X269_SQL = """
WITH spend AS (
  SELECT o_custkey,
         CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) * 100
              AS DECIMAL(19,0)) AS spend_c
  FROM orders GROUP BY o_custkey),
j AS (
  SELECT CAST(ROUND(c.c_acctbal * 100) AS BIGINT) AS bal_c,
         COALESCE(s.spend_c, CAST(0 AS DECIMAL(19,0))) AS spend_c
  FROM customer c LEFT JOIN spend s ON c.c_custkey = s.o_custkey),
m AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n,
         SUM(CAST(bal_c AS DECIMAL(19,0))) AS sx,
         SUM(spend_c) AS sy,
         SUM(CAST(bal_c AS DECIMAL(19,0)) * spend_c) AS sxy,
         SUM(CAST(bal_c AS DECIMAL(19,0))
             * CAST(bal_c AS DECIMAL(19,0))) AS sxx,
         SUM(spend_c * spend_c) AS syy
  FROM j)
SELECT n AS n_customers,
       ROUND(
         (CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE)
                                / CAST(n AS DOUBLE))
         / (SQRT(CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE)
                 * CAST(sx AS DOUBLE) / CAST(n AS DOUBLE))
            * SQRT(CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE)
                   * CAST(sy AS DOUBLE) / CAST(n AS DOUBLE))),
         6) AS balance_spend_corr
FROM m
"""


@register("x269_balance_spend_corr", oracle=_X269_SQL)
def x269_balance_spend_corr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Does account balance predict spend? Exact integer-moment
    Pearson between customer balance and lifetime order value
    (customers with no orders count as zero spend — dropping them
    would fake the correlation) — if near zero, balance is
    useless as a targeting feature and x191's matrix should not
    add it. Balances scale to integer cents; spend to exact
    decimal cents; products widen to DECIMAL(38,0).

    Scale: per-customer spend agg, a custkey-keyed dim left
    join, 1-row moment reduce.
    """
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    spend = orders.groupBy("o_custkey").agg(
        (F.sum(F.col("o_totalprice").cast("decimal(18,2)")) * 100)
        .cast("decimal(19,0)")
        .alias("spend_c")
    )
    j = cust.join(
        spend, cust.c_custkey == spend.o_custkey, "left"
    ).select(
        F.round(F.col("c_acctbal") * 100)
        .cast("bigint")
        .cast("decimal(19,0)")
        .alias("bal_c"),
        F.coalesce(
            "spend_c", F.lit(0).cast("decimal(19,0)")
        ).alias("spend_c"),
    )
    m = j.agg(
        F.count("*").cast("bigint").alias("n"),
        F.sum("bal_c").alias("sx"),
        F.sum("spend_c").alias("sy"),
        F.sum(F.col("bal_c") * F.col("spend_c")).alias("sxy"),
        F.sum(F.col("bal_c") * F.col("bal_c")).alias("sxx"),
        F.sum(F.col("spend_c") * F.col("spend_c")).alias("syy"),
    )
    d = lambda c: F.col(c).cast("double")  # noqa: E731
    r = (d("sxy") - d("sx") * d("sy") / d("n")) / (
        F.sqrt(d("sxx") - d("sx") * d("sx") / d("n"))
        * F.sqrt(d("syy") - d("sy") * d("sy") / d("n"))
    )
    return m.select(
        F.col("n").alias("n_customers"),
        F.round(r, 6).alias("balance_spend_corr"),
    )


# ---- x270: customer vintage quality (first-90-day spend) ----

_X270_SQL = """
WITH first_o AS (
  SELECT o_custkey, MIN(CAST(o_orderdate AS DATE)) AS d0
  FROM orders GROUP BY o_custkey),
early_spend AS (
  SELECT f.o_custkey,
         STRFTIME(DATE_TRUNC('quarter', f.d0), '%Y-%m') AS cohort_q,
         SUM(CASE WHEN CAST(o.o_orderdate AS DATE) < f.d0
                         + INTERVAL 90 DAY
                  THEN CAST(o.o_totalprice AS DECIMAL(18,2))
                  ELSE CAST(0 AS DECIMAL(18,2)) END) AS s90
  FROM orders o JOIN first_o f ON o.o_custkey = f.o_custkey
  GROUP BY f.o_custkey, cohort_q)
SELECT cohort_q AS cohort_quarter,
       CAST(COUNT(*) AS BIGINT) AS n_customers,
       ROUND(CAST(SUM(s90) AS DOUBLE) / COUNT(*), 2)
         AS avg_first90d_spend
FROM early_spend
GROUP BY cohort_q
ORDER BY cohort_quarter
"""


@register("x270_vintage_quality", oracle=_X270_SQL)
def x270_vintage_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customer vintage quality: average spend in each customer's
    FIRST 90 days, grouped by acquisition-quarter cohort — the
    like-for-like acquisition-quality trend (x130's LTV curves
    need maturity to compare cohorts; the 90-day window compares
    them at the same age, so even the newest closed cohort
    reads). Declining vintages with steady volume = paying more
    for worse customers.

    Exact decimal sums with decimal-zero ELSE; integer day
    window anchored per customer.

    Scale: custkey-grain first-order agg, a custkey-co-keyed
    join back, quarter rollup (x240's shape on the customer
    axis).
    """
    orders = load_table(spark, sf_dir, "orders")
    first_o = orders.groupBy("o_custkey").agg(
        F.min(F.col("o_orderdate").cast("date")).alias("d0")
    )
    zero = F.lit(0).cast("decimal(18,2)")
    early = (
        orders.join(first_o, "o_custkey")
        .groupBy(
            "o_custkey",
            F.date_format(
                F.date_trunc("quarter", F.col("d0")), "yyyy-MM"
            ).alias("cohort_q"),
        )
        .agg(
            F.sum(
                F.when(
                    F.col("o_orderdate").cast("date")
                    < F.date_add(F.col("d0"), 90),
                    F.col("o_totalprice").cast("decimal(18,2)"),
                ).otherwise(zero)
            ).alias("s90")
        )
    )
    return (
        early.groupBy(F.col("cohort_q").alias("cohort_quarter"))
        .agg(
            F.count("*").cast("bigint").alias("n_customers"),
            F.round(
                F.sum("s90").cast("double") / F.count("*"), 2
            ).alias("avg_first90d_spend"),
        )
        .orderBy("cohort_quarter")
    )


# ---- x271: error sessions' revenue cost ----

_X271_SQL = """
WITH e AS (
  SELECT user_id, ts, event_id, event_type, value,
         CASE WHEN LAG(ts) OVER w IS NULL
                OR CAST(FLOOR(EPOCH(ts)) AS BIGINT)
                   - CAST(FLOOR(EPOCH(LAG(ts) OVER w)) AS BIGINT) > 1800
              THEN 1 ELSE 0 END AS is_start
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
s AS (
  SELECT user_id, event_type, value,
         SUM(is_start) OVER (PARTITION BY user_id ORDER BY ts, event_id
                             ROWS UNBOUNDED PRECEDING) AS session_no
  FROM e),
sess AS (
  SELECT user_id, session_no,
         MAX(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END)
           AS has_error,
         SUM(CASE WHEN event_type = 'purchase'
                  THEN CAST(value AS DECIMAL(18,6))
                  ELSE CAST(0 AS DECIMAL(18,6)) END) AS pvalue,
         MAX(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
           AS has_purchase
  FROM s GROUP BY user_id, session_no)
SELECT CASE WHEN has_error = 1 THEN 'with_error'
            ELSE 'clean' END AS session_class,
       CAST(COUNT(*) AS BIGINT) AS n_sessions,
       ROUND(CAST(SUM(has_purchase) AS DOUBLE) / COUNT(*), 6)
         AS purchase_rate,
       ROUND(CAST(SUM(pvalue) AS DOUBLE) / COUNT(*), 4)
         AS value_per_session
FROM sess
GROUP BY session_class
ORDER BY session_class
"""


@register("x271_error_session_cost", oracle=_X271_SQL)
def x271_error_session_cost(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Error sessions' revenue cost: purchase rate and value per
    session, split by whether the session contained an error —
    the bridge from reliability to revenue that turns an SRE
    backlog into a business case (x232 ties errors to churn;
    this prices them per session). The difference times error-
    session volume is the quarterly cost of not fixing it.

    Exact decimal purchase values; integer flags; two divisions
    per class.

    Scale: the x162 sessionization shuffle + per-session agg,
    2-row output.
    """
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    e = ev.withColumn(
        "is_start",
        F.when(
            F.lag("ts").over(w).isNull()
            | (
                F.unix_timestamp("ts")
                - F.unix_timestamp(F.lag("ts").over(w))
                > 1800
            ),
            1,
        ).otherwise(0),
    )
    s = e.withColumn(
        "session_no",
        F.sum("is_start").over(
            w.rowsBetween(Window.unboundedPreceding, 0)
        ),
    )
    zero = F.lit(0).cast("decimal(18,6)")
    sess = s.groupBy("user_id", "session_no").agg(
        F.max(
            F.when(F.col("event_type") == "error", 1).otherwise(0)
        ).alias("has_error"),
        F.sum(
            F.when(
                F.col("event_type") == "purchase",
                F.col("value").cast("decimal(18,6)"),
            ).otherwise(zero)
        ).alias("pvalue"),
        F.max(
            F.when(F.col("event_type") == "purchase", 1).otherwise(0)
        ).alias("has_purchase"),
    )
    return (
        sess.groupBy(
            F.when(F.col("has_error") == 1, "with_error")
            .otherwise("clean")
            .alias("session_class")
        )
        .agg(
            F.count("*").cast("bigint").alias("n_sessions"),
            F.round(
                F.sum("has_purchase").cast("double") / F.count("*"), 6
            ).alias("purchase_rate"),
            F.round(
                F.sum("pvalue").cast("double") / F.count("*"), 4
            ).alias("value_per_session"),
        )
        .orderBy("session_class")
    )


# ---- x272: ship-day load balance ----

_X272_SQL = """
WITH d AS (
  SELECT CAST(DAYOFWEEK(CAST(l_shipdate AS DATE)) + 1 AS BIGINT)
           AS dow,
         CAST(COUNT(*) AS BIGINT) AS n_lines,
         CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS qty
  FROM lineitem GROUP BY dow),
t AS (SELECT CAST(SUM(n_lines) AS BIGINT) AS nt,
             CAST(MAX(qty) AS BIGINT) AS qmax,
             CAST(MIN(qty) AS BIGINT) AS qmin
      FROM d)
SELECT d.dow AS ship_dow, d.n_lines, d.qty,
       ROUND(CAST(d.n_lines AS DOUBLE) / t.nt, 6) AS line_share,
       ((2 * t.qmax * 10000 + t.qmin) // (2 * t.qmin)) / 10000.0
         AS peak_trough_ratio
FROM d CROSS JOIN t
ORDER BY ship_dow
"""


@register("x272_ship_day_balance", oracle=_X272_SQL)
def x272_ship_day_balance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Warehouse load balance by ship weekday: line and unit
    volume per day-of-week with the peak-to-trough ratio — the
    staffing curve for the dock (a 1.0 ratio means level-loaded
    shipping; 2.0 means overtime Thursdays). Demand-side
    seasonality (x123/x196) measures when customers ORDER; this
    measures when operations SHIP.

    Integer counts; DuckDB's 0-based DAYOFWEEK is offset to
    Spark's 1-based convention (the x161 rule). The @4 ratio uses
    the exact integer half-up form (r11 --solvable-at screen: a
    scale-4 round of an integer ratio CAN hit a cross-engine
    half-way point at the shipped fixture cardinalities — q34
    class); qmax/qmin > 0, headroom to 2·k·10⁴ < 2⁶³.

    Scale: one narrow 7-key aggregate + 1-row extremes broadcast.
    """
    li = load_table(spark, sf_dir, "lineitem")
    d = li.groupBy(
        F.dayofweek(F.col("l_shipdate").cast("date"))
        .cast("bigint")
        .alias("dow")
    ).agg(
        F.count("*").cast("bigint").alias("n_lines"),
        F.sum(F.col("l_quantity").cast("bigint"))
        .cast("bigint")
        .alias("qty"),
    )
    t = d.agg(
        F.sum("n_lines").cast("bigint").alias("nt"),
        F.max("qty").cast("bigint").alias("qmax"),
        F.min("qty").cast("bigint").alias("qmin"),
    )
    return (
        d.crossJoin(F.broadcast(t))
        .select(
            F.col("dow").alias("ship_dow"),
            "n_lines",
            "qty",
            F.round(
                F.col("n_lines").cast("double") / F.col("nt"), 6
            ).alias("line_share"),
            (
                F.expr("(2 * qmax * 10000 + qmin) div (2 * qmin)").cast(
                    "double"
                )
                / 10000
            ).alias("peak_trough_ratio"),
        )
        .orderBy("ship_dow")
    )


# ---- x273: catalog price by launch vintage ----

_X273_SQL = """
WITH first_year AS (
  SELECT l_partkey,
         CAST(MIN(YEAR(CAST(l_shipdate AS DATE))) AS BIGINT)
           AS launch_yr
  FROM lineitem GROUP BY l_partkey)
SELECT f.launch_yr AS launch_year,
       CAST(COUNT(*) AS BIGINT) AS n_parts,
       ROUND(CAST(SUM(CAST(p.p_retailprice AS DECIMAL(18,2)))
                  AS DOUBLE) / COUNT(*), 2) AS avg_retail_price,
       ROUND(CAST(MIN(p.p_retailprice) AS DOUBLE), 2) AS min_price,
       ROUND(CAST(MAX(p.p_retailprice) AS DOUBLE), 2) AS max_price
FROM first_year f JOIN part p ON f.l_partkey = p.p_partkey
GROUP BY f.launch_yr
ORDER BY launch_year
"""


@register("x273_price_vintage", oracle=_X273_SQL)
def x273_price_vintage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Catalog price by launch vintage: average (and range of)
    retail price for parts grouped by first-sale year — is the
    catalog premiumizing (newer introductions priced higher) or
    racing to the bottom? The pricing companion to x240's
    first-year revenue vitality, on the same launch-cohort axis.

    Exact decimal price sums; one mean division per cohort.

    Scale: partkey first-year agg + part-dim join, years-sized
    output.
    """
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    first_year = li.groupBy("l_partkey").agg(
        F.min(F.year(F.col("l_shipdate").cast("date")))
        .cast("bigint")
        .alias("launch_yr")
    )
    return (
        first_year.join(
            F.broadcast(part), first_year.l_partkey == part.p_partkey
        )
        .groupBy(F.col("launch_yr").alias("launch_year"))
        .agg(
            F.count("*").cast("bigint").alias("n_parts"),
            F.round(
                F.sum(F.col("p_retailprice").cast("decimal(18,2)")).cast(
                    "double"
                )
                / F.count("*"),
                2,
            ).alias("avg_retail_price"),
            F.round(F.min("p_retailprice").cast("double"), 2).alias(
                "min_price"
            ),
            F.round(F.max("p_retailprice").cast("double"), 2).alias(
                "max_price"
            ),
        )
        .orderBy("launch_year")
    )


# ---- x274: whale-set stability ----

_X274_K = 100  # top-k customers per period, literal
_X274_CUT = "1998-01-01"  # shared boundary literal

_X274_SQL = f"""
WITH spend AS (
  SELECT o_custkey,
         CASE WHEN o_orderdate < TIMESTAMP '{_X274_CUT}'
              THEN 'early' ELSE 'late' END AS period,
         SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS s
  FROM orders GROUP BY o_custkey, period),
rk AS (
  SELECT o_custkey, period,
         ROW_NUMBER() OVER (PARTITION BY period
                            ORDER BY s DESC, o_custkey) AS rn
  FROM spend),
tops AS (
  SELECT o_custkey, period FROM rk WHERE rn <= {_X274_K}),
m AS (
  SELECT
    CAST(SUM(CASE WHEN period = 'early' THEN 1 ELSE 0 END) AS BIGINT)
      AS n_early,
    CAST(SUM(CASE WHEN period = 'late' THEN 1 ELSE 0 END) AS BIGINT)
      AS n_late,
    CAST(COUNT(*) - COUNT(DISTINCT o_custkey) AS BIGINT) AS n_both
  FROM tops)
SELECT n_early, n_late, n_both,
       ROUND(CAST(n_both AS DOUBLE)
             / (n_early + n_late - n_both), 6) AS jaccard,
       ROUND(CAST(n_both AS DOUBLE) / n_early, 6) AS retention_rate
FROM m
"""


@register("x274_whale_stability", oracle=_X274_SQL)
def x274_whale_stability(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Whale-set stability: Jaccard overlap between the top-{k}
    customers by spend in the early vs late half — high overlap
    means the revenue base is a stable club (protect it); low
    means whales churn and are replaced (a treadmill, price
    acquisition accordingly). Set overlap via the count-distinct
    trick (|A∩B| = |A|+|B|−|A∪B|), all integers until two final
    ratios.

    Scale: customer-grain spend agg, two period-partitioned
    top-k ranks, a set-arithmetic reduce on 2·k rows.
    """
    from pyspark.sql import Window

    orders = load_table(spark, sf_dir, "orders")
    spend = orders.groupBy(
        "o_custkey",
        F.when(
            F.col("o_orderdate") < F.lit(_X274_CUT).cast("timestamp"),
            "early",
        )
        .otherwise("late")
        .alias("period"),
    ).agg(F.sum(F.col("o_totalprice").cast("decimal(18,2)")).alias("s"))
    rk = spend.withColumn(
        "rn",
        F.row_number().over(
            Window.partitionBy("period").orderBy(
                F.desc("s"), "o_custkey"
            )
        ),
    )
    tops = rk.where(F.col("rn") <= _X274_K).select(
        "o_custkey", "period"
    )
    m = tops.agg(
        F.sum(F.when(F.col("period") == "early", 1).otherwise(0))
        .cast("bigint")
        .alias("n_early"),
        F.sum(F.when(F.col("period") == "late", 1).otherwise(0))
        .cast("bigint")
        .alias("n_late"),
        (F.count("*") - F.countDistinct("o_custkey"))
        .cast("bigint")
        .alias("n_both"),
    )
    return m.select(
        "n_early",
        "n_late",
        "n_both",
        F.round(
            F.col("n_both").cast("double")
            / (F.col("n_early") + F.col("n_late") - F.col("n_both")),
            6,
        ).alias("jaccard"),
        F.round(
            F.col("n_both").cast("double") / F.col("n_early"), 6
        ).alias("retention_rate"),
    )


x274_whale_stability.__doc__ = x274_whale_stability.__doc__.format(
    k=_X274_K
)


# ---- x275: discount incidence by segment ----

_X275_SQL = """
WITH li AS (
  SELECT c.c_mktsegment AS segment,
         CASE WHEN l.l_discount = 0 THEN 0 ELSE 1 END AS discounted,
         CAST(l.l_extendedprice AS DECIMAL(18,2))
           * (CAST(1 AS DECIMAL(6,4))
              - CAST(l.l_discount AS DECIMAL(6,4))) AS net
  FROM lineitem l
  JOIN orders o ON l.l_orderkey = o.o_orderkey
  JOIN customer c ON o.o_custkey = c.c_custkey)
SELECT segment,
       CAST(COUNT(*) AS BIGINT) AS n_lines,
       ROUND(CAST(SUM(discounted) AS DOUBLE) / COUNT(*), 6)
         AS discounted_line_share,
       ROUND(CAST(SUM(CASE WHEN discounted = 1 THEN net
                           ELSE CAST(0 AS DECIMAL(25,6)) END) AS DOUBLE)
             / CAST(SUM(net) AS DOUBLE), 6) AS discounted_rev_share
FROM li
GROUP BY segment
ORDER BY segment
"""


@register("x275_discount_incidence", oracle=_X275_SQL)
def x275_discount_incidence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Discount incidence by customer segment: what share of lines
    (and of revenue) moves at ANY discount vs list price — the
    discipline metric behind x227's depth number (depth says how
    deep the cuts are; incidence says how often the knife comes
    out, per segment). A segment buying 90% on discount has been
    trained to wait.

    Integer incidence flags; exact decimal revenue with
    decimal-zero ELSE; two divisions per segment.

    Scale: fact joins (dims broadcast), 5-key rollup.
    """
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    net = (
        F.col("l_extendedprice").cast("decimal(18,2)")
        * (F.lit(1).cast("decimal(6,4)") - F.col("l_discount").cast("decimal(6,4)"))
    )
    rows = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .select(
            F.col("c_mktsegment").alias("segment"),
            F.when(F.col("l_discount") == 0, 0).otherwise(1).alias(
                "discounted"
            ),
            net.alias("net"),
        )
    )
    zero = F.lit(0).cast("decimal(25,6)")
    disc_rev = F.sum(
        F.when(F.col("discounted") == 1, F.col("net")).otherwise(zero)
    )
    return (
        rows.groupBy("segment")
        .agg(
            F.count("*").cast("bigint").alias("n_lines"),
            F.round(
                F.sum("discounted").cast("double") / F.count("*"), 6
            ).alias("discounted_line_share"),
            F.round(
                disc_rev.cast("double") / F.sum("net").cast("double"),
                6,
            ).alias("discounted_rev_share"),
        )
        .orderBy("segment")
    )


# ---- x276: order-interval regularity ----

_X276_SQL = """
WITH seq AS (
  SELECT o_custkey,
         CAST(DATEDIFF('day', LAG(CAST(o_orderdate AS DATE))
                 OVER (PARTITION BY o_custkey
                       ORDER BY o_orderdate, o_orderkey),
               CAST(o_orderdate AS DATE)) AS BIGINT) AS gap_d
  FROM orders),
g AS (SELECT o_custkey, gap_d FROM seq WHERE gap_d IS NOT NULL),
m AS (
  SELECT o_custkey,
         CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(gap_d) AS BIGINT) AS s,
         CAST(SUM(gap_d * gap_d) AS BIGINT) AS ss
  FROM g GROUP BY o_custkey
  HAVING COUNT(*) >= 4),
cls AS (
  -- CV² < 0.25 (CV < 0.5): cross-multiplied on integers:
  -- var < mean²/4  ⇔  4·n·(n·ss − s²) < s²·(n−1)·n ... simplified
  -- with sample variance var = (n·ss − s²)/(n·(n−1)):
  SELECT CASE WHEN 4 * (n * ss - s * s) < s * s * (n - 1)
              THEN 'clockwork'
              WHEN (n * ss - s * s) > 4 * s * s * (n - 1)
              THEN 'erratic'
              ELSE 'typical' END AS cadence_class
  FROM m),
t AS (SELECT CAST(COUNT(*) AS BIGINT) AS nt FROM cls)
SELECT cadence_class,
       CAST(COUNT(*) AS BIGINT) AS n_customers,
       ROUND(CAST(COUNT(*) AS DOUBLE) / (SELECT nt FROM t), 6)
         AS customer_share
FROM cls
GROUP BY cadence_class
ORDER BY cadence_class
"""


@register("x276_interval_regularity", oracle=_X276_SQL)
def x276_interval_regularity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order-interval regularity: customers (≥5 orders) classified
    by the coefficient of variation of their inter-order gaps —
    'clockwork' (CV < 0.5: subscription-like behavior, sell them
    an actual subscription), 'erratic' (CV > 2), or typical. The
    class thresholds are INTEGER cross-multiplications of the
    variance inequality (4·(n·ss−s²) < s²·(n−1) for CV < ½) — no
    division, no sqrt, no float in the decision; x205 asks which
    direction gaps trend, this asks how repeatable they are.

    Scale: one custkey window for gaps, per-customer integer
    moments, 3-row histogram.
    """
    from pyspark.sql import Window

    orders = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        "o_orderdate", "o_orderkey"
    )
    seq = orders.select(
        "o_custkey",
        F.datediff(
            F.col("o_orderdate").cast("date"),
            F.lag(F.col("o_orderdate").cast("date")).over(w),
        )
        .cast("bigint")
        .alias("gap_d"),
    )
    g = seq.where(F.col("gap_d").isNotNull())
    m = (
        g.groupBy("o_custkey")
        .agg(
            F.count("*").cast("bigint").alias("n"),
            F.sum("gap_d").cast("bigint").alias("s"),
            F.sum(F.col("gap_d") * F.col("gap_d"))
            .cast("bigint")
            .alias("ss"),
        )
        .where(F.col("n") >= 4)
    )
    nvar = F.col("n") * F.col("ss") - F.col("s") * F.col("s")
    s2n1 = F.col("s") * F.col("s") * (F.col("n") - 1)
    cls = m.select(
        F.when(4 * nvar < s2n1, "clockwork")
        .when(nvar > 4 * s2n1, "erratic")
        .otherwise("typical")
        .alias("cadence_class")
    )
    t = cls.agg(F.count("*").cast("bigint").alias("nt"))
    return (
        cls.groupBy("cadence_class")
        .agg(F.count("*").cast("bigint").alias("n_customers"))
        .crossJoin(F.broadcast(t))
        .select(
            "cadence_class",
            "n_customers",
            F.round(
                F.col("n_customers").cast("double") / F.col("nt"), 6
            ).alias("customer_share"),
        )
        .orderBy("cadence_class")
    )


# ---- x277: repeat rate by acquisition cohort ----

_X277_SQL = """
WITH per_cust AS (
  SELECT o_custkey,
         CAST(YEAR(MIN(CAST(o_orderdate AS DATE))) AS BIGINT)
           AS cohort_yr,
         CAST(COUNT(*) AS BIGINT) AS n_orders
  FROM orders GROUP BY o_custkey)
SELECT cohort_yr AS cohort_year,
       CAST(COUNT(*) AS BIGINT) AS n_customers,
       CAST(SUM(CASE WHEN n_orders >= 2 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_repeaters,
       ROUND(CAST(SUM(CASE WHEN n_orders >= 2 THEN 1 ELSE 0 END)
                  AS DOUBLE) / COUNT(*), 6) AS repeat_rate,
       ROUND(CAST(SUM(n_orders) AS DOUBLE) / COUNT(*), 4)
         AS avg_orders
FROM per_cust
GROUP BY cohort_yr
ORDER BY cohort_year
"""


@register("x277_cohort_repeat_rate", oracle=_X277_SQL)
def x277_cohort_repeat_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Repeat rate by acquisition-year cohort: the share of each
    vintage that ever ordered twice — x198's ladder first rung,
    tracked across vintages (falling repeat rates on newer
    cohorts while x270's 90-day spend holds = customers buy once,
    bigger, and leave: a different fix than 'spend is down').
    Later cohorts are right-censored; compare adjacent years, not
    endpoints.

    Integer counts; two divisions per cohort.

    Scale: one customer-grain agg, years-sized rollup.
    """
    orders = load_table(spark, sf_dir, "orders")
    per_cust = orders.groupBy("o_custkey").agg(
        F.year(F.min(F.col("o_orderdate").cast("date")))
        .cast("bigint")
        .alias("cohort_yr"),
        F.count("*").cast("bigint").alias("n_orders"),
    )
    rep = F.sum(F.when(F.col("n_orders") >= 2, 1).otherwise(0))
    return (
        per_cust.groupBy(F.col("cohort_yr").alias("cohort_year"))
        .agg(
            F.count("*").cast("bigint").alias("n_customers"),
            rep.cast("bigint").alias("n_repeaters"),
            F.round(rep.cast("double") / F.count("*"), 6).alias(
                "repeat_rate"
            ),
            F.round(
                F.sum("n_orders").cast("double") / F.count("*"), 4
            ).alias("avg_orders"),
        )
        .orderBy("cohort_year")
    )


# ---- x278: within-source token-mass Gini ----

_X278_SQL = """
WITH d AS (
  SELECT source, doc_id,
         CAST(LEN(STRING_SPLIT(text, ' ')) AS BIGINT) AS n_tok
  FROM documents),
r AS (
  SELECT source, n_tok,
         CAST(ROW_NUMBER() OVER (PARTITION BY source
                                 ORDER BY n_tok, doc_id) AS BIGINT)
           AS i,
         CAST(COUNT(*) OVER (PARTITION BY source) AS BIGINT) AS n,
         CAST(SUM(n_tok) OVER (PARTITION BY source) AS BIGINT) AS s
  FROM d)
SELECT source,
       CAST(MAX(n) AS BIGINT) AS n_docs,
       CAST(MAX(s) AS BIGINT) AS total_tokens,
       ROUND(CAST(2 * SUM(i * n_tok) - (MAX(n) + 1) * MAX(s)
                  AS DOUBLE)
             / (MAX(n) * MAX(s)), 6) AS token_gini
FROM r
GROUP BY source
ORDER BY source
"""


@register("x278_source_token_gini", oracle=_X278_SQL)
def x278_source_token_gini(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Within-source token-mass Gini: is a source's token budget
    spread across its documents or concentrated in a few giants
    (0 = uniform doc sizes, →1 = a handful of monsters)? High-
    Gini sources need doc-level length caps before packing
    (x45), or one mega-doc dominates every shard it lands in.
    The Gini uses the sorted-rank identity
    (2·Σi·x_i − (n+1)·Σx) / (n·Σx) — all INTEGER sums over the
    (length, doc_id)-sorted ranks, one final division (x126's
    revenue machinery on corpus mass).

    Scale: one source-partitioned sort window; per-source group
    sizes are doc counts.
    """
    from pyspark.sql import Window

    docs = load_table(spark, sf_dir, "documents")
    d = docs.select(
        "source",
        "doc_id",
        F.size(F.split(F.col("text"), " "))
        .cast("bigint")
        .alias("n_tok"),
    )
    wp = Window.partitionBy("source")
    r = d.select(
        "source",
        "n_tok",
        F.row_number()
        .over(wp.orderBy("n_tok", "doc_id"))
        .cast("bigint")
        .alias("i"),
        F.count("*").over(wp).cast("bigint").alias("n"),
        F.sum("n_tok").over(wp).cast("bigint").alias("s"),
    )
    return (
        r.groupBy("source")
        .agg(
            F.max("n").cast("bigint").alias("n_docs"),
            F.max("s").cast("bigint").alias("total_tokens"),
            F.round(
                (
                    2 * F.sum(F.col("i") * F.col("n_tok"))
                    - (F.max("n") + 1) * F.max("s")
                ).cast("double")
                / (F.max("n") * F.max("s")),
                6,
            ).alias("token_gini"),
        )
        .orderBy("source")
    )


# ---- x279: dual-axis ABC mismatch matrix ----

_X279_SQL = """
WITH m AS (
  SELECT l_partkey,
         CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS qty,
         CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                  * (CAST(1 AS DECIMAL(6,4))
                     - CAST(l_discount AS DECIMAL(6,4)))) * 1000000
              AS DECIMAL(19,0)) AS rev_u
  FROM lineitem GROUP BY l_partkey),
rk AS (
  SELECT l_partkey, qty, rev_u,
         SUM(qty) OVER (ORDER BY qty DESC, l_partkey
                        ROWS UNBOUNDED PRECEDING) AS cq,
         SUM(qty) OVER () AS tq,
         SUM(rev_u) OVER (ORDER BY rev_u DESC, l_partkey
                          ROWS UNBOUNDED PRECEDING) AS cr,
         SUM(rev_u) OVER () AS tr
  FROM m),
cls AS (
  SELECT CASE WHEN cq * 100 <= tq * 80 THEN 'A'
              WHEN cq * 100 <= tq * 95 THEN 'B'
              ELSE 'C' END AS vol_class,
         CASE WHEN cr * 100 <= tr * 80 THEN 'A'
              WHEN cr * 100 <= tr * 95 THEN 'B'
              ELSE 'C' END AS rev_class
  FROM rk)
SELECT vol_class, rev_class,
       CAST(COUNT(*) AS BIGINT) AS n_parts
FROM cls
GROUP BY vol_class, rev_class
ORDER BY vol_class, rev_class
"""


@register("x279_dual_abc_matrix", oracle=_X279_SQL)
def x279_dual_abc_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dual-axis ABC matrix: parts classified A/B/C independently
    by unit VOLUME and by REVENUE (80/95% cumulative cuts), cross-
    tabbed — the off-diagonal cells are the policy exceptions
    x129's single-axis classes hide: volume-A/revenue-C parts eat
    warehouse slots for pennies; volume-C/revenue-A are the
    fragile money-makers deserving safety stock. Class cuts
    cross-multiply exact cumulative sums against totals (the x164
    rule — no float thresholds).

    Scale: partkey-grain agg, two range-partitioned running
    sums, a 9-cell rollup.
    """
    from pyspark.sql import Window

    li = load_table(spark, sf_dir, "lineitem")
    disc = (
        F.col("l_extendedprice").cast("decimal(18,2)")
        * (F.lit(1).cast("decimal(6,4)") - F.col("l_discount").cast("decimal(6,4)"))
    )
    m = li.groupBy("l_partkey").agg(
        F.sum(F.col("l_quantity").cast("bigint"))
        .cast("bigint")
        .alias("qty"),
        (F.sum(disc) * 1000000).cast("decimal(19,0)").alias("rev_u"),
    )
    wq = Window.orderBy(F.desc("qty"), "l_partkey").rowsBetween(
        Window.unboundedPreceding, 0
    )
    wr = Window.orderBy(F.desc("rev_u"), "l_partkey").rowsBetween(
        Window.unboundedPreceding, 0
    )
    rk = m.select(
        F.sum("qty").over(wq).alias("cq"),
        F.sum("qty").over(Window.partitionBy()).alias("tq"),
        F.sum("rev_u").over(wr).alias("cr"),
        F.sum("rev_u").over(Window.partitionBy()).alias("tr"),
    )

    def cls(c, t):
        return (
            F.when(F.col(c) * 100 <= F.col(t) * 80, "A")
            .when(F.col(c) * 100 <= F.col(t) * 95, "B")
            .otherwise("C")
        )

    out = rk.select(
        cls("cq", "tq").alias("vol_class"),
        cls("cr", "tr").alias("rev_class"),
    )
    return (
        out.groupBy("vol_class", "rev_class")
        .agg(F.count("*").cast("bigint").alias("n_parts"))
        .orderBy("vol_class", "rev_class")
    )


# ---- x280: data-contract gate rollup ----

_X280_SQL = """
WITH checks AS (
  SELECT 'fk_lineitem_orders' AS check_name,
         CAST(COUNT(*) AS BIGINT) AS n_violations
  FROM lineitem l
  WHERE NOT EXISTS (SELECT 1 FROM orders o
                    WHERE o.o_orderkey = l.l_orderkey)
  UNION ALL
  SELECT 'doc_id_dense',
         CAST(MAX(doc_id) - MIN(doc_id) + 1 - COUNT(DISTINCT doc_id)
              AS BIGINT)
  FROM documents
  UNION ALL
  SELECT 'orderkey_unique',
         CAST(COUNT(*) - COUNT(DISTINCT o_orderkey) AS BIGINT)
  FROM orders
  UNION ALL
  SELECT 'no_negative_prices',
         CAST(SUM(CASE WHEN o_totalprice < 0 THEN 1 ELSE 0 END)
              AS BIGINT)
  FROM orders
  UNION ALL
  SELECT 'quantity_integral',
         CAST(SUM(CASE WHEN l_quantity = FLOOR(l_quantity)
                       THEN 0 ELSE 1 END) AS BIGINT)
  FROM lineitem)
SELECT check_name, n_violations,
       n_violations = 0 AS passed
FROM checks
ORDER BY check_name
"""


@register("x280_data_contract_gate", oracle=_X280_SQL)
def x280_data_contract_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-contract gate: the five invariants a CI pipeline
    asserts before promoting a drop — FK integrity on the biggest
    edge, dense document ids, unique order keys, non-negative
    prices, integral quantities — as one (check, violations,
    passed) table; a single false row blocks the promote. The
    one-query distillation of x172/x243/x228's audit family,
    shaped for a scheduler's pass/fail consumption.

    Scale: independent parallel legs — one anti-join (broadcast
    or shuffle by stats) and four narrow single-pass aggregates.
    """
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    docs = load_table(spark, sf_dir, "documents")

    def leg(name, df_agg):
        return df_agg.select(
            F.lit(name).alias("check_name"),
            F.col("v").cast("bigint").alias("n_violations"),
        )

    fk = li.join(
        orders.select("o_orderkey"),
        li.l_orderkey == orders.o_orderkey,
        "left_anti",
    ).agg(F.count("*").alias("v"))
    dense = docs.agg(
        (
            F.max("doc_id")
            - F.min("doc_id")
            + 1
            - F.countDistinct("doc_id")
        ).alias("v")
    )
    uniq = orders.agg(
        (F.count("*") - F.countDistinct("o_orderkey")).alias("v")
    )
    nonneg = orders.agg(
        F.sum(
            F.when(F.col("o_totalprice") < 0, 1).otherwise(0)
        ).alias("v")
    )
    integral = li.agg(
        F.sum(
            F.when(
                F.col("l_quantity") == F.floor("l_quantity"), 0
            ).otherwise(1)
        ).alias("v")
    )
    out = (
        leg("fk_lineitem_orders", fk)
        .unionByName(leg("doc_id_dense", dense))
        .unionByName(leg("orderkey_unique", uniq))
        .unionByName(leg("no_negative_prices", nonneg))
        .unionByName(leg("quantity_integral", integral))
    )
    return out.select(
        "check_name",
        "n_violations",
        (F.col("n_violations") == 0).alias("passed"),
    ).orderBy("check_name")


# ---- x281: month-end hockey stick ----

_X281_SQL = """
WITH d AS (
  SELECT STRFTIME(DATE_TRUNC('month', CAST(o_orderdate AS DATE)),
                  '%Y-%m') AS month,
         CAST(o_orderdate AS DATE) AS od,
         CAST(LAST_DAY(CAST(o_orderdate AS DATE)) AS DATE) AS eom,
         CAST(o_totalprice AS DECIMAL(18,2)) AS price
  FROM orders),
m AS (
  SELECT month,
         SUM(price) AS tot,
         SUM(CASE WHEN od >= eom - INTERVAL 2 DAY THEN price
                  ELSE CAST(0 AS DECIMAL(18,2)) END) AS last3
  FROM d GROUP BY month)
SELECT month,
       ROUND(CAST(tot AS DOUBLE), 2) AS revenue,
       ROUND(CAST(last3 AS DOUBLE) / CAST(tot AS DOUBLE), 6)
         AS last3day_share
FROM m
ORDER BY month
"""


@register("x281_month_end_loading", oracle=_X281_SQL)
def x281_month_end_loading(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Month-end loading (the hockey stick): each month's revenue
    share booked in its final 3 calendar days — organic demand
    runs ~10% (3/30 days); persistent 25%+ means quota-driven
    pull-ins and discount leaks at period close (x241 then shows
    the borrowed-demand dip). Uses last_day() so 28/30/31-day
    months all measure their own tail.

    Exact decimal sums with decimal-zero ELSE; one share per
    month.

    Scale: narrow map + month rollup.
    """
    orders = load_table(spark, sf_dir, "orders")
    od = F.col("o_orderdate").cast("date")
    zero = F.lit(0).cast("decimal(18,2)")
    d = orders.select(
        F.date_format(F.date_trunc("month", od), "yyyy-MM").alias(
            "month"
        ),
        od.alias("od"),
        F.last_day(od).alias("eom"),
        F.col("o_totalprice").cast("decimal(18,2)").alias("price"),
    )
    m = d.groupBy("month").agg(
        F.sum("price").alias("tot"),
        F.sum(
            F.when(
                F.col("od") >= F.date_sub(F.col("eom"), 2),
                F.col("price"),
            ).otherwise(zero)
        ).alias("last3"),
    )
    return m.select(
        "month",
        F.round(F.col("tot").cast("double"), 2).alias("revenue"),
        F.round(
            F.col("last3").cast("double") / F.col("tot").cast("double"),
            6,
        ).alias("last3day_share"),
    ).orderBy("month")


# ---- x282: round-number amount forensics ----

_X282_SQL = """
WITH c AS (
  SELECT CAST(ROUND(o_totalprice * 100) AS BIGINT) AS cents
  FROM orders),
f AS (
  SELECT CASE WHEN cents % 10000 = 0 THEN 'a_even_hundred'
              WHEN cents % 100 = 0 THEN 'b_whole_dollar'
              WHEN cents % 100 IN (99, 95) THEN 'c_psych_pricing'
              ELSE 'd_other' END AS amount_class
  FROM c),
t AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM f)
SELECT amount_class,
       CAST(COUNT(*) AS BIGINT) AS n_orders,
       ROUND(CAST(COUNT(*) AS DOUBLE) / (SELECT n FROM t), 6)
         AS order_share
FROM f
GROUP BY amount_class
ORDER BY amount_class
"""


@register("x282_amount_roundness", oracle=_X282_SQL)
def x282_amount_roundness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Round-number amount forensics: order totals classified as
    even hundreds, whole dollars, psychological endings (.99/.95),
    or organic — computed totals should be overwhelmingly
    'd_other'; an excess of round numbers signals manual entry,
    test orders, or fabrication (the complement to x151's
    first-digit Benford: Benford checks the head of the number,
    roundness checks the tail). Cents derive once via ROUND on
    the double (values are exact cents upstream, x228-verified);
    classes are integer modular arithmetic.

    Scale: narrow map + 4-key rollup.
    """
    orders = load_table(spark, sf_dir, "orders")
    cents = F.round(F.col("o_totalprice") * 100).cast("bigint")
    f = orders.select(
        F.when(cents % 10000 == 0, "a_even_hundred")
        .when(cents % 100 == 0, "b_whole_dollar")
        .when((cents % 100).isin(99, 95), "c_psych_pricing")
        .otherwise("d_other")
        .alias("amount_class")
    )
    t = f.agg(F.count("*").cast("bigint").alias("nt"))
    return (
        f.groupBy("amount_class")
        .agg(F.count("*").cast("bigint").alias("n_orders"))
        .crossJoin(F.broadcast(t))
        .select(
            "amount_class",
            "n_orders",
            F.round(
                F.col("n_orders").cast("double") / F.col("nt"), 6
            ).alias("order_share"),
        )
        .orderBy("amount_class")
    )


# ---- x283: growth-accounting revenue bridge ----

_X283_CUT = "1998-01-01"  # shared boundary literal

_X283_SQL = f"""
WITH per_cust AS (
  SELECT o_custkey,
         SUM(CASE WHEN o_orderdate < TIMESTAMP '{_X283_CUT}'
                  THEN CAST(o_totalprice AS DECIMAL(18,2))
                  ELSE CAST(0 AS DECIMAL(18,2)) END) AS e,
         SUM(CASE WHEN o_orderdate >= TIMESTAMP '{_X283_CUT}'
                  THEN CAST(o_totalprice AS DECIMAL(18,2))
                  ELSE CAST(0 AS DECIMAL(18,2)) END) AS l
  FROM orders GROUP BY o_custkey),
cls AS (
  SELECT CASE WHEN e = 0 AND l > 0 THEN 'a_new'
              WHEN e > 0 AND l = 0 THEN 'd_churned'
              WHEN l > e THEN 'b_expansion'
              WHEN l < e THEN 'c_contraction'
              ELSE 'e_flat' END AS component,
         e, l
  FROM per_cust),
tot AS (
  SELECT CAST(SUM(e) AS DOUBLE) AS base_rev,
         CAST(SUM(CASE WHEN e > 0 THEN l
                       ELSE CAST(0 AS DECIMAL(28,2)) END) AS DOUBLE)
           AS retained_plus
  FROM per_cust)
SELECT c.component,
       CAST(COUNT(*) AS BIGINT) AS n_customers,
       ROUND(CAST(SUM(c.l) - SUM(c.e) AS DOUBLE), 2) AS revenue_delta,
       ROUND(t.retained_plus / t.base_rev, 6) AS nrr
FROM cls c CROSS JOIN tot t
GROUP BY c.component, t.retained_plus, t.base_rev
ORDER BY c.component
"""


@register("x283_growth_accounting", oracle=_X283_SQL)
def x283_growth_accounting(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Growth-accounting revenue bridge: the early→late revenue
    delta decomposed by customer class — new, expansion,
    contraction, churned, flat — with net revenue retention (late
    revenue of the early base over early revenue) carried on
    every row; the component deltas SUM exactly to total change
    because each customer lands in exactly one class and the
    arithmetic is one exact-decimal pass (x183 bridges months by
    first-order flag; this is the full NRR bridge a board deck
    shows).

    Scale: one customer-grain conditional aggregate, class
    rollup, 1-row totals broadcast.
    """
    orders = load_table(spark, sf_dir, "orders")
    zero = F.lit(0).cast("decimal(18,2)")
    cut = F.lit(_X283_CUT).cast("timestamp")
    per_cust = orders.groupBy("o_custkey").agg(
        F.sum(
            F.when(
                F.col("o_orderdate") < cut,
                F.col("o_totalprice").cast("decimal(18,2)"),
            ).otherwise(zero)
        ).alias("e"),
        F.sum(
            F.when(
                F.col("o_orderdate") >= cut,
                F.col("o_totalprice").cast("decimal(18,2)"),
            ).otherwise(zero)
        ).alias("l"),
    )
    cls = per_cust.select(
        F.when((F.col("e") == 0) & (F.col("l") > 0), "a_new")
        .when((F.col("e") > 0) & (F.col("l") == 0), "d_churned")
        .when(F.col("l") > F.col("e"), "b_expansion")
        .when(F.col("l") < F.col("e"), "c_contraction")
        .otherwise("e_flat")
        .alias("component"),
        "e",
        "l",
    )
    zero28 = F.lit(0).cast("decimal(28,2)")
    tot = per_cust.agg(
        F.sum("e").cast("double").alias("base_rev"),
        F.sum(
            F.when(
                F.col("e") > 0, F.col("l").cast("decimal(28,2)")
            ).otherwise(zero28)
        )
        .cast("double")
        .alias("retained_plus"),
    )
    return (
        cls.groupBy("component")
        .agg(
            F.count("*").cast("bigint").alias("n_customers"),
            F.round(
                (F.sum("l") - F.sum("e")).cast("double"), 2
            ).alias("revenue_delta"),
        )
        .crossJoin(F.broadcast(tot))
        .select(
            "component",
            "n_customers",
            "revenue_delta",
            F.round(
                F.col("retained_plus") / F.col("base_rev"), 6
            ).alias("nrr"),
        )
        .orderBy("component")
    )


# ---- x284: per-minute load peaks ----

_X284_SQL = """
WITH pm AS (
  SELECT DATE_TRUNC('minute', ts) AS minute,
         CAST(COUNT(*) AS BIGINT) AS n
  FROM events GROUP BY minute),
r AS (
  SELECT n,
         ROW_NUMBER() OVER (ORDER BY n, minute) AS rn,
         COUNT(*) OVER () AS nm
  FROM pm)
SELECT CAST(MAX(nm) AS BIGINT) AS n_active_minutes,
       CAST(MAX(CASE WHEN rn = CAST(CEIL(0.50 * nm) AS BIGINT)
                     THEN n END) AS BIGINT) AS median_per_min,
       CAST(MAX(CASE WHEN rn = CAST(CEIL(0.99 * nm) AS BIGINT)
                     THEN n END) AS BIGINT) AS p99_per_min,
       CAST(MAX(n) AS BIGINT) AS peak_per_min
FROM r
"""


@register("x284_load_peaks", oracle=_X284_SQL)
def x284_load_peaks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-minute ingest load profile: median, p99, and peak
    events per active minute — the capacity numbers an ingestion
    autoscaler is provisioned against (provision for p99, alert
    at peak; x113's hourly z-scores find WHEN anomalies happen,
    this sizes HOW BIG the pipes must be). Rank-exact
    percentiles over the minute-grain counts with a minute
    tiebreak.

    Scale: minute-grain agg (calendar-bounded), one
    range-partitioned rank over the minute table, 1-row output.
    """
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events")
    pm = ev.groupBy(
        F.date_trunc("minute", "ts").alias("minute")
    ).agg(F.count("*").cast("bigint").alias("n"))
    r = pm.select(
        "n",
        F.row_number()
        .over(Window.orderBy("n", "minute"))
        .alias("rn"),
        F.count("*").over(Window.partitionBy()).alias("nm"),
    )

    def pick(p: float, name: str):
        return (
            F.max(
                F.when(
                    F.col("rn")
                    == F.ceil(F.lit(p) * F.col("nm")).cast("bigint"),
                    F.col("n"),
                )
            )
            .cast("bigint")
            .alias(name)
        )

    return r.agg(
        F.max("nm").cast("bigint").alias("n_active_minutes"),
        pick(0.50, "median_per_min"),
        pick(0.99, "p99_per_min"),
        F.max("n").cast("bigint").alias("peak_per_min"),
    )


# ---- x285: partition-layout advisor ----

_X285_SQL = """
WITH cands AS (
  SELECT 'orders.month(o_orderdate)' AS candidate,
         CAST(COUNT(DISTINCT DATE_TRUNC('month',
                    CAST(o_orderdate AS DATE))) AS BIGINT) AS card,
         CAST(COUNT(*) AS BIGINT) AS n_rows
  FROM orders
  UNION ALL
  SELECT 'lineitem.month(l_shipdate)',
         CAST(COUNT(DISTINCT DATE_TRUNC('month',
                    CAST(l_shipdate AS DATE))) AS BIGINT),
         CAST(COUNT(*) AS BIGINT)
  FROM lineitem
  UNION ALL
  SELECT 'customer.c_mktsegment',
         CAST(COUNT(DISTINCT c_mktsegment) AS BIGINT),
         CAST(COUNT(*) AS BIGINT)
  FROM customer
  UNION ALL
  SELECT 'documents.source',
         CAST(COUNT(DISTINCT source) AS BIGINT),
         CAST(COUNT(*) AS BIGINT)
  FROM documents
  UNION ALL
  SELECT 'events.day(ts)',
         CAST(COUNT(DISTINCT CAST(ts AS DATE)) AS BIGINT),
         CAST(COUNT(*) AS BIGINT)
  FROM events)
SELECT candidate, card AS n_partitions, n_rows,
       CAST(n_rows // card AS BIGINT) AS avg_rows_per_partition,
       CASE WHEN card > 10000 THEN 'c_too_many_partitions'
            WHEN n_rows < card * 100 THEN 'b_partitions_too_small'
            ELSE 'a_partition_ok' END AS verdict
FROM cands
ORDER BY candidate
"""


@register("x285_layout_advisor", oracle=_X285_SQL)
def x285_layout_advisor(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Partition-layout advisor: for each candidate partitionBy
    key, its cardinality and average rows per partition with an
    integer-rule verdict (>10k partitions = metadata blowup and
    tiny files; <100 rows per partition = the small-files
    problem; otherwise viable) — the pre-write check behind every
    `partitionBy` decision, and the planning complement to x86's
    after-the-fact storage audit. Thresholds are deliberately
    SF-relative rules, not byte counts, so the verdicts teach the
    same lesson at any scale.

    Scale: five independent distinct-count scans (parallel
    legs), 5-row output.
    """
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    cust = load_table(spark, sf_dir, "customer")
    docs = load_table(spark, sf_dir, "documents")
    ev = load_table(spark, sf_dir, "events")

    def leg(name, df, key):
        return df.agg(
            F.lit(name).alias("candidate"),
            F.countDistinct(key).cast("bigint").alias("card"),
            F.count("*").cast("bigint").alias("n_rows"),
        )

    out = (
        leg(
            "orders.month(o_orderdate)",
            orders,
            F.date_trunc("month", F.col("o_orderdate").cast("date")),
        )
        .unionByName(
            leg(
                "lineitem.month(l_shipdate)",
                li,
                F.date_trunc("month", F.col("l_shipdate").cast("date")),
            )
        )
        .unionByName(
            leg("customer.c_mktsegment", cust, F.col("c_mktsegment"))
        )
        .unionByName(leg("documents.source", docs, F.col("source")))
        .unionByName(
            leg("events.day(ts)", ev, F.col("ts").cast("date"))
        )
    )
    return out.select(
        "candidate",
        F.col("card").alias("n_partitions"),
        "n_rows",
        F.expr("n_rows div card")
        .cast("bigint")
        .alias("avg_rows_per_partition"),
        F.when(F.col("card") > 10000, "c_too_many_partitions")
        .when(
            F.col("n_rows") < F.col("card") * 100,
            "b_partitions_too_small",
        )
        .otherwise("a_partition_ok")
        .alias("verdict"),
    ).orderBy("candidate")


# ---- x286: acquisition-hour cohort contrast ----

_X286_SQL = """
WITH first_e AS (
  SELECT user_id, MIN(ts) AS t0,
         CAST(COUNT(*) AS BIGINT) AS total_events,
         CAST(COUNT(DISTINCT CAST(ts AS DATE)) AS BIGINT)
           AS active_days
  FROM events GROUP BY user_id),
cls AS (
  SELECT CASE WHEN HOUR(t0) BETWEEN 9 AND 17
              THEN 'business_hours_acquired'
              ELSE 'off_hours_acquired' END AS cohort,
         total_events, active_days
  FROM first_e)
SELECT cohort,
       CAST(COUNT(*) AS BIGINT) AS n_users,
       ROUND(CAST(SUM(total_events) AS DOUBLE) / COUNT(*), 4)
         AS avg_events,
       ROUND(CAST(SUM(active_days) AS DOUBLE) / COUNT(*), 4)
         AS avg_active_days
FROM cls
GROUP BY cohort
ORDER BY cohort
"""


@register("x286_acquisition_hour_contrast", oracle=_X286_SQL)
def x286_acquisition_hour_contrast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Acquisition-hour cohort contrast: users first seen during
    business hours (9-17) vs off-hours, compared on lifetime
    events and active days — the cheap causal-flavored check on
    whether acquisition TIMING marks a different user quality
    (at-work intent vs couch browsing), which decides when the
    acquisition budget runs. (Weekday split was the first draft —
    this fixture acquires every user Mon-Thu, so the hour axis is
    the one that actually varies.)

    Integer sums; two mean divisions per cohort.

    Scale: per-user first-event agg, 2-row rollup.
    """
    ev = load_table(spark, sf_dir, "events")
    first_e = ev.groupBy("user_id").agg(
        F.min("ts").alias("t0"),
        F.count("*").cast("bigint").alias("total_events"),
        F.countDistinct(F.col("ts").cast("date"))
        .cast("bigint")
        .alias("active_days"),
    )
    cls = first_e.select(
        F.when(
            F.hour("t0").between(9, 17), "business_hours_acquired"
        )
        .otherwise("off_hours_acquired")
        .alias("cohort"),
        "total_events",
        "active_days",
    )
    return (
        cls.groupBy("cohort")
        .agg(
            F.count("*").cast("bigint").alias("n_users"),
            F.round(
                F.sum("total_events").cast("double") / F.count("*"), 4
            ).alias("avg_events"),
            F.round(
                F.sum("active_days").cast("double") / F.count("*"), 4
            ).alias("avg_active_days"),
        )
        .orderBy("cohort")
    )


# ---- x287: purchase propensity by engagement depth ----

_X287_SQL = """
WITH seq AS (
  SELECT event_type,
         ROW_NUMBER() OVER (PARTITION BY user_id
                            ORDER BY ts, event_id) - 1 AS n_prior
  FROM events),
b AS (
  SELECT CASE WHEN n_prior = 0 THEN 'a_first_event'
              WHEN n_prior < 5 THEN 'b_1_to_4'
              WHEN n_prior < 20 THEN 'c_5_to_19'
              WHEN n_prior < 50 THEN 'd_20_to_49'
              ELSE 'e_50_plus' END AS depth_bucket,
         CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END
           AS is_purchase
  FROM seq)
SELECT depth_bucket,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       CAST(SUM(is_purchase) AS BIGINT) AS n_purchases,
       ROUND(CAST(SUM(is_purchase) AS DOUBLE) / COUNT(*), 6)
         AS purchase_propensity
FROM b
GROUP BY depth_bucket
ORDER BY depth_bucket
"""


@register("x287_propensity_by_depth", oracle=_X287_SQL)
def x287_propensity_by_depth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Purchase propensity by engagement depth: the probability
    that an event is a purchase, bucketed by how many events the
    user had ALREADY logged — a rising curve justifies nurture
    flows (engagement compounds into intent); a flat one says
    purchases arrive independent of familiarity and the CRM
    drip is theater. Depth is a per-user running index (one
    window), buckets are integer cases.

    Integer counts; one propensity division per bucket.

    Scale: single user_id window shuffle + 5-bucket rollup.
    """
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events")
    seq = ev.select(
        "event_type",
        (
            F.row_number().over(
                Window.partitionBy("user_id").orderBy(
                    "ts", "event_id"
                )
            )
            - 1
        ).alias("n_prior"),
    )
    b = seq.select(
        F.when(F.col("n_prior") == 0, "a_first_event")
        .when(F.col("n_prior") < 5, "b_1_to_4")
        .when(F.col("n_prior") < 20, "c_5_to_19")
        .when(F.col("n_prior") < 50, "d_20_to_49")
        .otherwise("e_50_plus")
        .alias("depth_bucket"),
        F.when(F.col("event_type") == "purchase", 1)
        .otherwise(0)
        .alias("is_purchase"),
    )
    return (
        b.groupBy("depth_bucket")
        .agg(
            F.count("*").cast("bigint").alias("n_events"),
            F.sum("is_purchase").cast("bigint").alias("n_purchases"),
            F.round(
                F.sum("is_purchase").cast("double") / F.count("*"), 6
            ).alias("purchase_propensity"),
        )
        .orderBy("depth_bucket")
    )


# ---- x288: return rate vs ship delay ----

_X288_SQL = """
WITH d AS (
  SELECT CASE WHEN DATEDIFF('day', CAST(o.o_orderdate AS DATE),
                            CAST(l.l_shipdate AS DATE)) <= 30
              THEN 'a_fast_0_30'
              WHEN DATEDIFF('day', CAST(o.o_orderdate AS DATE),
                            CAST(l.l_shipdate AS DATE)) <= 75
              THEN 'b_normal_31_75'
              ELSE 'c_slow_76plus' END AS delay_bucket,
         CASE WHEN l.l_returnflag = 'R' THEN 1 ELSE 0 END AS returned
  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey)
SELECT delay_bucket,
       CAST(COUNT(*) AS BIGINT) AS n_lines,
       CAST(SUM(returned) AS BIGINT) AS n_returned,
       ROUND(CAST(SUM(returned) AS DOUBLE) / COUNT(*), 6)
         AS return_rate
FROM d
GROUP BY delay_bucket
ORDER BY delay_bucket
"""


@register("x288_returns_vs_delay", oracle=_X288_SQL)
def x288_returns_vs_delay(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Return rate vs ship delay: are slow shipments returned
    more? The operations-to-quality causal screen — if the slow
    bucket's rate is materially higher, every week shaved off
    x169's p90 also buys back return-processing cost, which
    changes the expedite ROI math entirely.

    Integer flags and counts; one rate division per bucket.

    Scale: the orderkey fact join, a 3-bucket rollup —
    bucket-then-aggregate, never a per-delay-value key.
    """
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    delay = F.datediff(
        F.col("l_shipdate").cast("date"),
        F.col("o_orderdate").cast("date"),
    )
    d = li.join(orders, li.l_orderkey == orders.o_orderkey).select(
        F.when(delay <= 30, "a_fast_0_30")
        .when(delay <= 75, "b_normal_31_75")
        .otherwise("c_slow_76plus")
        .alias("delay_bucket"),
        F.when(F.col("l_returnflag") == "R", 1)
        .otherwise(0)
        .alias("returned"),
    )
    return (
        d.groupBy("delay_bucket")
        .agg(
            F.count("*").cast("bigint").alias("n_lines"),
            F.sum("returned").cast("bigint").alias("n_returned"),
            F.round(
                F.sum("returned").cast("double") / F.count("*"), 6
            ).alias("return_rate"),
        )
        .orderBy("delay_bucket")
    )


# ---- x289: part size vs order quantity ----

_X289_SQL = """
WITH j AS (
  SELECT CAST(p.p_size AS BIGINT) AS x,
         CAST(l.l_quantity AS BIGINT) AS y
  FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey),
s AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(y) AS BIGINT) AS sy,
         CAST(SUM(x * y) AS BIGINT) AS sxy,
         CAST(SUM(x * x) AS BIGINT) AS sxx,
         CAST(SUM(y * y) AS BIGINT) AS syy
  FROM j)
SELECT n AS n_lines,
       ((2 * sx * 10000 + n) // (2 * n)) / 10000.0 AS mean_size,
       ((2 * sy * 10000 + n) // (2 * n)) / 10000.0 AS mean_qty,
       ROUND(
         (CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE)
                                / CAST(n AS DOUBLE))
         / (SQRT(CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE)
                 * CAST(sx AS DOUBLE) / CAST(n AS DOUBLE))
            * SQRT(CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE)
                   * CAST(sy AS DOUBLE) / CAST(n AS DOUBLE))),
         6) AS size_qty_corr
FROM s
"""


@register("x289_size_quantity_corr", oracle=_X289_SQL)
def x289_size_quantity_corr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Part size vs order quantity: do physically bigger parts
    move in smaller quantities (the warehouse's intuition,
    quantified)? A strongly negative correlation lets slotting
    planners trade bin size against pick frequency from the
    catalog alone. x167's exact integer-moment Pearson on the
    catalog's p_size attribute — its first analytical use.

    The @4 means use the exact integer half-up form (r11
    --solvable-at screen: n here IS the lineitem fixture
    cardinality — 60 000 at sf0.01 — where k ≡ 3 (mod 6) hits a
    half-way point; q34 class). sx/sy ≥ 0.

    Scale: dim-broadcast fact join, 1-row moment reduce.
    """
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    j = li.join(F.broadcast(part), li.l_partkey == part.p_partkey).select(
        F.col("p_size").cast("bigint").alias("x"),
        F.col("l_quantity").cast("bigint").alias("y"),
    )
    s = j.agg(
        F.count("*").cast("bigint").alias("n"),
        F.sum("x").cast("bigint").alias("sx"),
        F.sum("y").cast("bigint").alias("sy"),
        F.sum(F.col("x") * F.col("y")).cast("bigint").alias("sxy"),
        F.sum(F.col("x") * F.col("x")).cast("bigint").alias("sxx"),
        F.sum(F.col("y") * F.col("y")).cast("bigint").alias("syy"),
    )
    d = lambda c: F.col(c).cast("double")  # noqa: E731
    r = (d("sxy") - d("sx") * d("sy") / d("n")) / (
        F.sqrt(d("sxx") - d("sx") * d("sx") / d("n"))
        * F.sqrt(d("syy") - d("sy") * d("sy") / d("n"))
    )
    half_up4 = lambda k, n: (  # noqa: E731
        F.expr(f"(2 * {k} * 10000 + {n}) div (2 * {n})").cast("double")
        / 10000
    )
    return s.select(
        F.col("n").alias("n_lines"),
        half_up4("sx", "n").alias("mean_size"),
        half_up4("sy", "n").alias("mean_qty"),
        F.round(r, 6).alias("size_qty_corr"),
    )


# ---- x290: size-normalized price premium per brand ----

_X290_SQL = """
WITH ppu AS (
  SELECT p_brand,
         CAST(ROUND(p_retailprice * 100) AS BIGINT) AS price_c,
         CAST(p_size AS BIGINT) AS size,
         p_partkey
  FROM part WHERE p_size > 0),
r AS (
  SELECT p_brand, price_c, size,
         ROW_NUMBER() OVER (PARTITION BY p_brand
                            ORDER BY price_c * 1000 // size,
                                     p_partkey) AS rn,
         COUNT(*) OVER (PARTITION BY p_brand) AS n
  FROM ppu)
SELECT p_brand,
       CAST(MAX(n) AS BIGINT) AS n_parts,
       ((MAX(CASE WHEN rn = CAST(CEIL(0.50 * n) AS BIGINT)
                  THEN price_c * 1000 // size END) + 5) // 10)
         / 10000.0 AS median_price_per_size
FROM r
GROUP BY p_brand
ORDER BY median_price_per_size DESC, p_brand
"""


@register("x290_price_per_size", oracle=_X290_SQL)
def x290_price_per_size(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Size-normalized price premium: each brand's median retail
    price PER SIZE UNIT — the like-for-like premium ranking that
    x253's raw positioning can't give when brands sell different
    size mixes (a brand of big cheap parts and one of small
    expensive parts can share a median price; per-unit-of-size
    they do not). The per-unit price quantizes to integer
    milli-cents-per-unit by floor division before the rank-exact
    median, so no float enters the ordering.

    Scale: dim-only window per brand, brand-sized output.
    """
    from pyspark.sql import Window

    part = load_table(spark, sf_dir, "part")
    ppu = part.where(F.col("p_size") > 0).select(
        "p_brand",
        F.round(F.col("p_retailprice") * 100)
        .cast("bigint")
        .alias("price_c"),
        F.col("p_size").cast("bigint").alias("size"),
        "p_partkey",
    )
    unit = F.expr("(price_c * 1000) div size")
    r = ppu.select(
        "p_brand",
        unit.alias("unit_mc"),
        F.row_number()
        .over(
            Window.partitionBy("p_brand").orderBy(
                unit, "p_partkey"
            )
        )
        .alias("rn"),
        F.count("*").over(Window.partitionBy("p_brand")).alias("n"),
    )
    # q34-class value-driven boundary (r10 inventory):
    # round(med_mc/1e5, 4) hits a cross-engine half-way point
    # whenever med_mc ≡ 5 (mod 10) — ~10% of value draws, the
    # hottest site in the registry. Exact integer half-up + ONE
    # double divide instead (nonneg: prices and sizes > 0).
    return (
        r.groupBy("p_brand")
        .agg(
            F.max("n").cast("bigint").alias("n_parts"),
            F.max(
                F.when(
                    F.col("rn")
                    == F.ceil(0.50 * F.col("n")).cast("bigint"),
                    F.col("unit_mc"),
                )
            ).alias("med_mc"),
        )
        .select(
            "p_brand",
            "n_parts",
            (F.expr("(med_mc + 5) div 10") / F.lit(10000.0)).alias(
                "median_price_per_size"
            ),
        )
        .orderBy(F.desc("median_price_per_size"), "p_brand")
    )


# ---- x291: session-intensity trend ----

_X291_SQL = """
WITH e AS (
  SELECT user_id, ts, event_id,
         CASE WHEN LAG(ts) OVER w IS NULL
                OR CAST(FLOOR(EPOCH(ts)) AS BIGINT)
                   - CAST(FLOOR(EPOCH(LAG(ts) OVER w)) AS BIGINT) > 1800
              THEN 1 ELSE 0 END AS is_start
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
m AS (
  SELECT STRFTIME(DATE_TRUNC('month', CAST(ts AS DATE)), '%Y-%m')
           AS month,
         CAST(SUM(is_start) AS BIGINT) AS n_sessions,
         CAST(COUNT(DISTINCT user_id) AS BIGINT) AS mau
  FROM e GROUP BY month)
SELECT month, n_sessions, mau,
       ((2 * n_sessions * 10000 + mau) // (2 * mau)) / 10000.0
         AS sessions_per_user
FROM m
ORDER BY month
"""


@register("x291_session_intensity", oracle=_X291_SQL)
def x291_session_intensity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session-intensity trend: sessions started per active user
    per month — the habit-frequency line that x149's DAU/MAU
    compresses into one ratio, tracked over time (MAU can hold
    steady while visits-per-user quietly decays; this catches
    that). Session starts come from the x162 gap rule, attributed
    to the month they start in.

    Integer counts; the @4 ratio uses the exact integer half-up
    form (r11 --solvable-at screen, q34 class: a scale-4 integer
    ratio can hit a cross-engine half-way point at shipped
    cardinalities). n_sessions ≥ 0, mau ≥ 1.

    Scale: the x162 user window plus a (month)-keyed rollup with
    partial distinct on user.
    """
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    e = ev.withColumn(
        "is_start",
        F.when(
            F.lag("ts").over(w).isNull()
            | (
                F.unix_timestamp("ts")
                - F.unix_timestamp(F.lag("ts").over(w))
                > 1800
            ),
            1,
        ).otherwise(0),
    )
    m = e.groupBy(
        F.date_format(
            F.date_trunc("month", F.col("ts").cast("date")), "yyyy-MM"
        ).alias("month")
    ).agg(
        F.sum("is_start").cast("bigint").alias("n_sessions"),
        F.countDistinct("user_id").cast("bigint").alias("mau"),
    )
    return m.select(
        "month",
        "n_sessions",
        "mau",
        (
            F.expr("(2 * n_sessions * 10000 + mau) div (2 * mau)").cast(
                "double"
            )
            / 10000
        ).alias("sessions_per_user"),
    ).orderBy("month")


# ---- x292: dead-stock scan ----

_X292_SQL = """
WITH anchor AS (
  SELECT MAX(CAST(l_shipdate AS DATE)) AS dmax FROM lineitem),
recent AS (
  SELECT DISTINCT l.l_partkey
  FROM lineitem l CROSS JOIN anchor a
  WHERE CAST(l.l_shipdate AS DATE) > a.dmax - INTERVAL 365 DAY),
status AS (
  SELECT p.p_brand,
         CASE WHEN r.l_partkey IS NULL THEN 1 ELSE 0 END AS stale
  FROM part p LEFT JOIN recent r ON p.p_partkey = r.l_partkey)
SELECT p_brand,
       CAST(COUNT(*) AS BIGINT) AS n_parts,
       CAST(SUM(stale) AS BIGINT) AS n_stale,
       ROUND(CAST(SUM(stale) AS DOUBLE) / COUNT(*), 6) AS stale_share
FROM status
GROUP BY p_brand
ORDER BY p_brand
"""


@register("x292_dead_stock", oracle=_X292_SQL)
def x292_dead_stock(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dead-stock scan: per brand, catalog parts with NO shipment
    in the trailing year (anchored to the data's own max ship
    date) — the discontinue-or-discount list; x256 shows how fast
    the catalog ever activates, this shows what has gone cold
    since. Recency membership is a distinct partkey set
    left-joined against the catalog (NULL = stale).

    Integer flags; one share division per brand.

    Scale: the recent-part set is partkey-distinct (dim-bounded)
    and the join is against the part dim — the fact table is
    touched once, pre-filtered by the pushed date predicate.
    """
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    anchor = li.agg(
        F.max(F.col("l_shipdate").cast("date")).alias("dmax")
    )
    recent = (
        li.crossJoin(F.broadcast(anchor))
        .where(
            F.col("l_shipdate").cast("date")
            > F.date_sub(F.col("dmax"), 365)
        )
        .select("l_partkey")
        .distinct()
        .withColumn("seen", F.lit(1))
    )
    status = part.join(
        recent, part.p_partkey == recent.l_partkey, "left"
    ).select(
        "p_brand",
        F.when(F.col("seen").isNull(), 1).otherwise(0).alias("stale"),
    )
    return (
        status.groupBy("p_brand")
        .agg(
            F.count("*").cast("bigint").alias("n_parts"),
            F.sum("stale").cast("bigint").alias("n_stale"),
            F.round(
                F.sum("stale").cast("double") / F.count("*"), 6
            ).alias("stale_share"),
        )
        .orderBy("p_brand")
    )


# ---- x293: order value by basket breadth ----

_X293_SQL = """
WITH ob AS (
  SELECT l.l_orderkey,
         CAST(COUNT(DISTINCT p.p_brand) AS BIGINT) AS n_brands
  FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
  GROUP BY l.l_orderkey),
j AS (
  SELECT CASE WHEN ob.n_brands = 1 THEN 'a_single_brand'
              WHEN ob.n_brands <= 3 THEN 'b_2_to_3'
              ELSE 'c_4_plus' END AS breadth_bucket,
         CAST(o.o_totalprice AS DECIMAL(18,2)) AS price
  FROM ob JOIN orders o ON ob.l_orderkey = o.o_orderkey)
SELECT breadth_bucket,
       CAST(COUNT(*) AS BIGINT) AS n_orders,
       ROUND(CAST(SUM(price) AS DOUBLE) / COUNT(*), 2) AS aov
FROM j
GROUP BY breadth_bucket
ORDER BY breadth_bucket
"""


@register("x293_breadth_vs_value", oracle=_X293_SQL)
def x293_breadth_vs_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order value by basket brand breadth: AOV for single-brand
    vs multi-brand baskets — if breadth buys AOV, cross-brand
    merchandising (bundles, 'customers also bought') has a
    quantified prize; if not, x257's breadth histogram is
    trivia. Distinct-brand counts are integers; exact decimal
    totals; one mean per bucket.

    Scale: orderkey-grain distinct agg co-keyed with the orders
    join, 3-bucket rollup.
    """
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    orders = load_table(spark, sf_dir, "orders")
    ob = (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .groupBy("l_orderkey")
        .agg(
            F.countDistinct("p_brand").cast("bigint").alias("n_brands")
        )
    )
    j = ob.join(orders, ob.l_orderkey == orders.o_orderkey).select(
        F.when(F.col("n_brands") == 1, "a_single_brand")
        .when(F.col("n_brands") <= 3, "b_2_to_3")
        .otherwise("c_4_plus")
        .alias("breadth_bucket"),
        F.col("o_totalprice").cast("decimal(18,2)").alias("price"),
    )
    return (
        j.groupBy("breadth_bucket")
        .agg(
            F.count("*").cast("bigint").alias("n_orders"),
            F.round(
                F.sum("price").cast("double") / F.count("*"), 2
            ).alias("aov"),
        )
        .orderBy("breadth_bucket")
    )


# ---- x294: order complexity vs fulfillment time ----

_X294_SQL = """
WITH per_o AS (
  SELECT l_orderkey,
         CAST(COUNT(*) AS BIGINT) AS x,
         CAST(DATEDIFF('day', MIN(CAST(l_shipdate AS DATE)),
                       MAX(CAST(l_shipdate AS DATE))) AS BIGINT) AS y
  FROM lineitem GROUP BY l_orderkey),
s AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(y) AS BIGINT) AS sy,
         CAST(SUM(x * y) AS BIGINT) AS sxy,
         CAST(SUM(x * x) AS BIGINT) AS sxx,
         CAST(SUM(y * y) AS BIGINT) AS syy
  FROM per_o)
SELECT n AS n_orders,
       ((2 * sx * 10000 + n) // (2 * n)) / 10000.0 AS mean_lines,
       ((2 * sy * 10000 + n) // (2 * n)) / 10000.0 AS mean_spread_d,
       ROUND(
         (CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE)
                                / CAST(n AS DOUBLE))
         / (SQRT(CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE)
                 * CAST(sx AS DOUBLE) / CAST(n AS DOUBLE))
            * SQRT(CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE)
                   * CAST(sy AS DOUBLE) / CAST(n AS DOUBLE))),
         6) AS lines_spread_corr
FROM s
"""


@register("x294_complexity_vs_spread", oracle=_X294_SQL)
def x294_complexity_vs_spread(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order complexity vs fulfillment fragmentation: correlation
    between an order's line count and its shipment spread (x190's
    first-to-last-ship days) — a strong positive says
    fragmentation is structural (more lines = more boxes), so
    consolidation efforts should target line-count reduction
    (kitting), not carrier SLAs. Exact integer moments, one pass
    per order. The @4 means use the exact integer half-up form
    (r11 --solvable-at screen, q34 class); sx/sy ≥ 0.

    Scale: orderkey-grain agg (unique key), 1-row moment reduce.
    """
    li = load_table(spark, sf_dir, "lineitem")
    per_o = li.groupBy("l_orderkey").agg(
        F.count("*").cast("bigint").alias("x"),
        F.datediff(
            F.max(F.col("l_shipdate").cast("date")),
            F.min(F.col("l_shipdate").cast("date")),
        )
        .cast("bigint")
        .alias("y"),
    )
    s = per_o.agg(
        F.count("*").cast("bigint").alias("n"),
        F.sum("x").cast("bigint").alias("sx"),
        F.sum("y").cast("bigint").alias("sy"),
        F.sum(F.col("x") * F.col("y")).cast("bigint").alias("sxy"),
        F.sum(F.col("x") * F.col("x")).cast("bigint").alias("sxx"),
        F.sum(F.col("y") * F.col("y")).cast("bigint").alias("syy"),
    )
    d = lambda c: F.col(c).cast("double")  # noqa: E731
    r = (d("sxy") - d("sx") * d("sy") / d("n")) / (
        F.sqrt(d("sxx") - d("sx") * d("sx") / d("n"))
        * F.sqrt(d("syy") - d("sy") * d("sy") / d("n"))
    )
    half_up4 = lambda k, n: (  # noqa: E731
        F.expr(f"(2 * {k} * 10000 + {n}) div (2 * {n})").cast("double")
        / 10000
    )
    return s.select(
        F.col("n").alias("n_orders"),
        half_up4("sx", "n").alias("mean_lines"),
        half_up4("sy", "n").alias("mean_spread_d"),
        F.round(r, 6).alias("lines_spread_corr"),
    )


# ---- x295: brand-mix concentration trend (quarterly HHI) ----

_X295_SQL = """
WITH rev AS (
  SELECT CAST(YEAR(CAST(o.o_orderdate AS DATE)) AS BIGINT) * 10
           + CAST(QUARTER(CAST(o.o_orderdate AS DATE)) AS BIGINT)
           AS yq,
         p.p_brand,
         CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))
                  * (CAST(1 AS DECIMAL(6,4))
                     - CAST(l.l_discount AS DECIMAL(6,4)))) * 1000000
              AS DECIMAL(19,0)) AS rev_u
  FROM lineitem l
  JOIN orders o ON l.l_orderkey = o.o_orderkey
  JOIN part p ON l.l_partkey = p.p_partkey
  GROUP BY yq, p.p_brand),
agg AS (
  SELECT yq,
         CAST(COUNT(*) AS BIGINT) AS n_brands,
         SUM(rev_u) AS tot_u,
         SUM(rev_u * rev_u) AS sumsq_u
  FROM rev GROUP BY yq)
SELECT yq AS year_quarter, n_brands,
       ROUND(CAST(sumsq_u AS DOUBLE)
             / (CAST(tot_u AS DOUBLE) * CAST(tot_u AS DOUBLE)), 6)
         AS brand_hhi
FROM agg
ORDER BY year_quarter
"""


@register("x295_hhi_trend", oracle=_X295_SQL)
def x295_hhi_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brand-mix concentration trend: quarterly HHI of revenue
    across brands — a rising line means the business is
    concentrating into fewer brands (dependency risk compounding
    quarter over quarter; x153 snapshots concentration by nation,
    this watches it move). Same exact micro-unit machinery:
    decimal sums of squares over a squared total, one double
    division per quarter.

    Scale: (quarter, brand) fact agg, quarter-keyed rollup of
    decimal partials.
    """
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    part = load_table(spark, sf_dir, "part")
    disc = (
        F.col("l_extendedprice").cast("decimal(18,2)")
        * (F.lit(1).cast("decimal(6,4)") - F.col("l_discount").cast("decimal(6,4)"))
    )
    rev = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .groupBy(
            (
                F.year(F.col("o_orderdate").cast("date")).cast("bigint")
                * 10
                + F.quarter(F.col("o_orderdate").cast("date")).cast(
                    "bigint"
                )
            ).alias("yq"),
            "p_brand",
        )
        .agg(
            (F.sum(disc) * 1000000)
            .cast("decimal(19,0)")
            .alias("rev_u")
        )
    )
    agg = rev.groupBy("yq").agg(
        F.count("*").cast("bigint").alias("n_brands"),
        F.sum("rev_u").alias("tot_u"),
        F.sum(F.col("rev_u") * F.col("rev_u")).alias("sumsq_u"),
    )
    return agg.select(
        F.col("yq").alias("year_quarter"),
        "n_brands",
        F.round(
            F.col("sumsq_u").cast("double")
            / (
                F.col("tot_u").cast("double")
                * F.col("tot_u").cast("double")
            ),
            6,
        ).alias("brand_hhi"),
    ).orderBy("year_quarter")


# ---- x296: reorder hazard curve ----

_X296_SQL = """
WITH gaps AS (
  SELECT CAST(DATEDIFF('day', LAG(CAST(o_orderdate AS DATE))
                OVER (PARTITION BY o_custkey
                      ORDER BY o_orderdate, o_orderkey),
              CAST(o_orderdate AS DATE)) AS BIGINT) AS g
  FROM orders),
g AS (SELECT g FROM gaps WHERE g IS NOT NULL),
w AS (SELECT UNNEST(ARRAY[0, 30, 60, 90, 120, 180]) AS w0)
SELECT CAST(w.w0 AS BIGINT) AS waited_days,
       CAST(SUM(CASE WHEN g.g >= w.w0 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_at_risk,
       CAST(SUM(CASE WHEN g.g >= w.w0 AND g.g < w.w0 + 30
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_reorder_30d,
       ROUND(CAST(SUM(CASE WHEN g.g >= w.w0 AND g.g < w.w0 + 30
                           THEN 1 ELSE 0 END) AS DOUBLE)
             / SUM(CASE WHEN g.g >= w.w0 THEN 1 ELSE 0 END), 6)
         AS hazard_30d
FROM g CROSS JOIN w
GROUP BY w.w0
ORDER BY waited_days
"""


@register("x296_reorder_hazard", oracle=_X296_SQL)
def x296_reorder_hazard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reorder hazard curve: among inter-order gaps that reached
    w days, the share that converted within the next 30 — the
    empirical answer to "when should the win-back email fire?"
    (send it where the hazard drops: past that point customers
    were not coming back on their own). The discrete-hazard
    companion to x127's survival curve, on gaps instead of
    lifetimes.

    Integer gap comparisons against literal horizons; one
    division per rung.

    Scale: one custkey window for gaps; the horizon fan-out is a
    6-row broadcast cross join over the gap list, aggregated
    map-side.
    """
    from pyspark.sql import Window

    orders = load_table(spark, sf_dir, "orders")
    gaps = orders.select(
        F.datediff(
            F.col("o_orderdate").cast("date"),
            F.lag(F.col("o_orderdate").cast("date")).over(
                Window.partitionBy("o_custkey").orderBy(
                    "o_orderdate", "o_orderkey"
                )
            ),
        )
        .cast("bigint")
        .alias("g")
    ).where(F.col("g").isNotNull())
    w = spark.range(1).select(
        F.explode(
            F.array(*[F.lit(v) for v in (0, 30, 60, 90, 120, 180)])
        ).alias("w0")
    )
    at_risk = F.sum(
        F.when(F.col("g") >= F.col("w0"), 1).otherwise(0)
    )
    conv = F.sum(
        F.when(
            (F.col("g") >= F.col("w0"))
            & (F.col("g") < F.col("w0") + 30),
            1,
        ).otherwise(0)
    )
    return (
        gaps.crossJoin(F.broadcast(w))
        .groupBy(F.col("w0").cast("bigint").alias("waited_days"))
        .agg(
            at_risk.cast("bigint").alias("n_at_risk"),
            conv.cast("bigint").alias("n_reorder_30d"),
            F.round(conv.cast("double") / at_risk, 6).alias(
                "hazard_30d"
            ),
        )
        .orderBy("waited_days")
    )


# ---- x297: entry-event retention quality ----

_X297_SQL = """
WITH seq AS (
  SELECT user_id, event_type,
         ROW_NUMBER() OVER (PARTITION BY user_id
                            ORDER BY ts, event_id) AS rn
  FROM events),
first_e AS (
  SELECT user_id, event_type AS entry_type FROM seq WHERE rn = 1),
life AS (
  SELECT user_id,
         CAST(COUNT(*) AS BIGINT) AS total_events,
         CAST(COUNT(DISTINCT CAST(ts AS DATE)) AS BIGINT)
           AS active_days
  FROM events GROUP BY user_id)
SELECT f.entry_type,
       CAST(COUNT(*) AS BIGINT) AS n_users,
       ROUND(CAST(SUM(l.total_events) AS DOUBLE) / COUNT(*), 4)
         AS avg_events,
       ROUND(CAST(SUM(l.active_days) AS DOUBLE) / COUNT(*), 4)
         AS avg_active_days
FROM first_e f JOIN life l ON f.user_id = l.user_id
GROUP BY f.entry_type
ORDER BY f.entry_type
"""


@register("x297_entry_event_quality", oracle=_X297_SQL)
def x297_entry_event_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Entry-event retention quality: users grouped by their very
    FIRST event type, compared on lifetime activity — which front
    door (landed on content vs started signup vs hit an error)
    produces users who stay? An error-first cohort with healthy
    retention says the error page converts; with terrible
    retention it is the funnel's first leak (x232 looks at the
    exit; this looks at the entrance).

    Integer counts; two means per entry type.

    Scale: one user window for the first event + a per-user
    lifetime agg sharing the user_id shuffle; type-sized output.
    """
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events")
    seq = ev.select(
        "user_id",
        "event_type",
        F.row_number()
        .over(
            Window.partitionBy("user_id").orderBy("ts", "event_id")
        )
        .alias("rn"),
    )
    first_e = seq.where(F.col("rn") == 1).select(
        "user_id", F.col("event_type").alias("entry_type")
    )
    life = ev.groupBy("user_id").agg(
        F.count("*").cast("bigint").alias("total_events"),
        F.countDistinct(F.col("ts").cast("date"))
        .cast("bigint")
        .alias("active_days"),
    )
    return (
        first_e.join(life, "user_id")
        .groupBy("entry_type")
        .agg(
            F.count("*").cast("bigint").alias("n_users"),
            F.round(
                F.sum("total_events").cast("double") / F.count("*"), 4
            ).alias("avg_events"),
            F.round(
                F.sum("active_days").cast("double") / F.count("*"), 4
            ).alias("avg_active_days"),
        )
        .orderBy("entry_type")
    )


# ---- x298: activation velocity (time to 10th event) ----

_X298_K = 10  # activation milestone, literal

_X298_SQL = f"""
WITH seq AS (
  SELECT user_id, ts,
         ROW_NUMBER() OVER (PARTITION BY user_id
                            ORDER BY ts, event_id) AS rn
  FROM events),
span AS (
  SELECT a.user_id,
         CAST(FLOOR(EPOCH(b.ts)) AS BIGINT)
           - CAST(FLOOR(EPOCH(a.ts)) AS BIGINT) AS ttk_s
  FROM (SELECT user_id, ts FROM seq WHERE rn = 1) a
  JOIN (SELECT user_id, ts FROM seq WHERE rn = {_X298_K}) b
    ON a.user_id = b.user_id),
r AS (
  SELECT ttk_s,
         ROW_NUMBER() OVER (ORDER BY ttk_s, user_id) AS rk,
         COUNT(*) OVER () AS n
  FROM span)
SELECT CAST(MAX(n) AS BIGINT) AS n_activated,
       CAST(MAX(CASE WHEN rk = CAST(CEIL(0.25 * n) AS BIGINT)
                     THEN ttk_s END) AS BIGINT) AS q1_s,
       CAST(MAX(CASE WHEN rk = CAST(CEIL(0.50 * n) AS BIGINT)
                     THEN ttk_s END) AS BIGINT) AS median_s,
       CAST(MAX(CASE WHEN rk = CAST(CEIL(0.75 * n) AS BIGINT)
                     THEN ttk_s END) AS BIGINT) AS q3_s
FROM r
"""


@register("x298_activation_velocity", oracle=_X298_SQL)
def x298_activation_velocity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Activation velocity: rank-exact quartiles of the time from
    a user's first event to their {k}th — the time-to-value
    metric onboarding teams move (x163 times the first PURCHASE;
    this times reaching engaged usage regardless of what the
    events were). Only users who reached the milestone count —
    pair with x150's curve for how many never do.

    Integer epoch differences (floored per side, the x162 rule);
    rank-selected quartiles with user tiebreak.

    Scale: one user window for ranks; the quartile sort runs on
    the activated-user span list only.
    """
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events")
    seq = ev.select(
        "user_id",
        "ts",
        F.row_number()
        .over(
            Window.partitionBy("user_id").orderBy("ts", "event_id")
        )
        .alias("rn"),
    )
    a = seq.where(F.col("rn") == 1).select(
        "user_id", F.col("ts").alias("t1")
    )
    b = seq.where(F.col("rn") == _X298_K).select(
        "user_id", F.col("ts").alias("tk")
    )
    span = a.join(b, "user_id").select(
        "user_id",
        (
            F.unix_timestamp("tk") - F.unix_timestamp("t1")
        ).alias("ttk_s"),
    )
    r = span.select(
        "ttk_s",
        F.row_number()
        .over(Window.orderBy("ttk_s", "user_id"))
        .alias("rk"),
        F.count("*").over(Window.partitionBy()).alias("n"),
    )

    def pick(p: float, name: str):
        return (
            F.max(
                F.when(
                    F.col("rk")
                    == F.ceil(F.lit(p) * F.col("n")).cast("bigint"),
                    F.col("ttk_s"),
                )
            )
            .cast("bigint")
            .alias(name)
        )

    return r.agg(
        F.max("n").cast("bigint").alias("n_activated"),
        pick(0.25, "q1_s"),
        pick(0.50, "median_s"),
        pick(0.75, "q3_s"),
    )


x298_activation_velocity.__doc__ = x298_activation_velocity.__doc__.format(
    k=_X298_K
)


# ---- x299: order-priority value premium ----

_X299_SQL = """
WITH t AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n, SUM(CAST(o_totalprice
         AS DECIMAL(18,2))) AS s
  FROM orders)
SELECT o.o_orderpriority AS priority,
       CAST(COUNT(*) AS BIGINT) AS n_orders,
       ROUND(CAST(SUM(CAST(o.o_totalprice AS DECIMAL(18,2)))
                  AS DOUBLE) / COUNT(*), 2) AS aov,
       ROUND((CAST(SUM(CAST(o.o_totalprice AS DECIMAL(18,2)))
                   AS DOUBLE) / COUNT(*))
             / (CAST(t.s AS DOUBLE) / t.n), 6) AS aov_index
FROM orders o CROSS JOIN t
GROUP BY o.o_orderpriority, t.s, t.n
ORDER BY priority
"""


@register("x299_priority_value_premium", oracle=_X299_SQL)
def x299_priority_value_premium(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order-priority value premium: AOV per priority class
    indexed against the overall AOV — do customers flag their
    EXPENSIVE orders urgent (index > 1 on high priorities means
    expedite capacity is protecting the revenue that matters), or
    is priority uncorrelated with value (then x208's eta² verdict
    and this one together say the field is pure noise)?

    Exact decimal sums; the index is a ratio of two one-division
    means.

    Scale: single 5-key agg + 1-row total broadcast.
    """
    orders = load_table(spark, sf_dir, "orders")
    t = orders.agg(
        F.count("*").cast("bigint").alias("nt"),
        F.sum(F.col("o_totalprice").cast("decimal(18,2)")).alias("st"),
    )
    aov = F.sum(
        F.col("o_totalprice").cast("decimal(18,2)")
    ).cast("double") / F.count("*")
    return (
        orders.crossJoin(F.broadcast(t))
        .groupBy(F.col("o_orderpriority").alias("priority"))
        .agg(
            F.count("*").cast("bigint").alias("n_orders"),
            F.round(aov, 2).alias("aov"),
            F.round(
                aov
                / (
                    F.max(F.col("st")).cast("double")
                    / F.max(F.col("nt"))
                ),
                6,
            ).alias("aov_index"),
        )
        .orderBy("priority")
    )


# ---- x300: annual-report panel ----

_X300_SQL = """
WITH rev AS (
  SELECT CAST(YEAR(CAST(o_orderdate AS DATE)) AS BIGINT) AS yr,
         CAST(COUNT(*) AS BIGINT) AS n_orders,
         CAST(COUNT(DISTINCT o_custkey) AS BIGINT) AS n_customers,
         SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS total
  FROM orders GROUP BY yr),
firsts AS (
  SELECT CAST(YEAR(MIN(CAST(o_orderdate AS DATE))) AS BIGINT) AS yr,
         o_custkey
  FROM orders GROUP BY o_custkey),
new_c AS (
  SELECT yr, CAST(COUNT(*) AS BIGINT) AS n_new FROM firsts
  GROUP BY yr),
ship AS (
  SELECT CAST(YEAR(CAST(o.o_orderdate AS DATE)) AS BIGINT) AS yr,
         CAST(COUNT(*) AS BIGINT) AS n_lines,
         CAST(SUM(DATEDIFF('day', CAST(o.o_orderdate AS DATE),
                           CAST(l.l_shipdate AS DATE))) AS BIGINT)
           AS delay_sum,
         CAST(SUM(CASE WHEN l.l_returnflag = 'R' THEN 1 ELSE 0 END)
              AS BIGINT) AS n_returned
  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
  GROUP BY yr)
SELECT r.yr AS year,
       r.n_orders, r.n_customers, nc.n_new AS new_customers,
       ROUND(CAST(r.total AS DOUBLE), 2) AS revenue,
       ROUND(CAST(r.total AS DOUBLE) / r.n_orders, 2) AS aov,
       ROUND(CAST(nc.n_new AS DOUBLE) / r.n_customers, 6)
         AS new_customer_share,
       ((2 * s.delay_sum * 10000 + s.n_lines) // (2 * s.n_lines))
         / 10000.0 AS mean_ship_delay_d,
       ROUND(CAST(s.n_returned AS DOUBLE) / s.n_lines, 6)
         AS return_line_share
FROM rev r
JOIN new_c nc ON r.yr = nc.yr
JOIN ship s ON r.yr = s.yr
ORDER BY year
"""


@register("x300_annual_report", oracle=_X300_SQL)
def x300_annual_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Annual-report panel: per year — orders, active and NEW
    customers, revenue, AOV, new-customer share, mean ship delay,
    and returned-line share — the one table that anchors a yearly
    business review, composed from three independently-aggregated
    fact passes joined on year (x220 is the daily pulse, x248 the
    quarterly drumbeat; this is the annual close). Every column
    traces to a dedicated x-series deep dive.

    Exact decimal revenue; integer counts; one division per
    ratio. The @4 delay mean uses the exact integer half-up form
    (r11 --solvable-at screen, q34 class: per-year n_lines can
    equal a congruence-solving cardinality); delay_sum ≥ 0 by
    TPC-H's ship-after-order invariant.

    Scale: three year-grain aggregates (parallel legs) joined on
    the tiny year key.
    """
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    yr = F.year(F.col("o_orderdate").cast("date")).cast("bigint")
    rev = orders.groupBy(yr.alias("yr")).agg(
        F.count("*").cast("bigint").alias("n_orders"),
        F.countDistinct("o_custkey").cast("bigint").alias("n_customers"),
        F.sum(F.col("o_totalprice").cast("decimal(18,2)")).alias("total"),
    )
    firsts = orders.groupBy("o_custkey").agg(
        F.year(F.min(F.col("o_orderdate").cast("date")))
        .cast("bigint")
        .alias("yr")
    )
    new_c = firsts.groupBy("yr").agg(
        F.count("*").cast("bigint").alias("n_new")
    )
    ship = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy(yr.alias("yr"))
        .agg(
            F.count("*").cast("bigint").alias("n_lines"),
            F.sum(
                F.datediff(
                    F.col("l_shipdate").cast("date"),
                    F.col("o_orderdate").cast("date"),
                )
            )
            .cast("bigint")
            .alias("delay_sum"),
            F.sum(
                F.when(F.col("l_returnflag") == "R", 1).otherwise(0)
            )
            .cast("bigint")
            .alias("n_returned"),
        )
    )
    return (
        rev.join(F.broadcast(new_c), "yr")
        .join(F.broadcast(ship), "yr")
        .select(
            F.col("yr").alias("year"),
            "n_orders",
            "n_customers",
            F.col("n_new").alias("new_customers"),
            F.round(F.col("total").cast("double"), 2).alias("revenue"),
            F.round(
                F.col("total").cast("double") / F.col("n_orders"), 2
            ).alias("aov"),
            F.round(
                F.col("n_new").cast("double") / F.col("n_customers"), 6
            ).alias("new_customer_share"),
            (
                F.expr(
                    "(2 * delay_sum * 10000 + n_lines) div (2 * n_lines)"
                ).cast("double")
                / 10000
            ).alias("mean_ship_delay_d"),
            F.round(
                F.col("n_returned").cast("double") / F.col("n_lines"),
                6,
            ).alias("return_line_share"),
        )
        .orderBy("year")
    )


# ---- x301: source acquisition share shift ----

_X301_SQL = """
WITH mid AS (
  SELECT CAST(FLOOR(MAX(doc_id) / 2) AS BIGINT) AS m FROM documents),
h AS (
  SELECT d.source,
         CASE WHEN d.doc_id <= mid.m THEN 'early' ELSE 'late' END
           AS half
  FROM documents d CROSS JOIN mid),
c AS (
  SELECT source,
         CAST(SUM(CASE WHEN half = 'early' THEN 1 ELSE 0 END)
              AS BIGINT) AS n_early,
         CAST(SUM(CASE WHEN half = 'late' THEN 1 ELSE 0 END)
              AS BIGINT) AS n_late
  FROM h GROUP BY source),
t AS (
  SELECT CAST(SUM(n_early) AS BIGINT) AS te,
         CAST(SUM(n_late) AS BIGINT) AS tl
  FROM c)
SELECT c.source, c.n_early, c.n_late,
       ROUND(CAST(c.n_early AS DOUBLE) / t.te, 6) AS early_share,
       ROUND(CAST(c.n_late AS DOUBLE) / t.tl, 6) AS late_share,
       ROUND(CAST(c.n_late AS DOUBLE) / t.tl
             - CAST(c.n_early AS DOUBLE) / t.te, 6) AS share_delta
FROM c CROSS JOIN t
ORDER BY c.source
"""


@register("x301_source_share_shift", oracle=_X301_SQL)
def x301_source_share_shift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Source acquisition share shift: each source's share of
    ingested documents in the early vs late corpus half (doc_id
    as ingestion order) — a source whose share collapses mid-
    corpus signals a crawler auth break or robots.txt change, the
    ingestion-side story behind x175/x242's vocabulary drift.

    Integer counts; three share arithmetic columns from the same
    exact inputs.

    Scale: narrow half-tag map, source rollup, 1-row totals.
    """
    docs = load_table(spark, sf_dir, "documents")
    mid = docs.agg(
        F.floor(F.max("doc_id") / 2).cast("bigint").alias("m")
    )
    h = docs.crossJoin(F.broadcast(mid)).select(
        "source",
        F.when(F.col("doc_id") <= F.col("m"), "early")
        .otherwise("late")
        .alias("half"),
    )
    c = h.groupBy("source").agg(
        F.sum(F.when(F.col("half") == "early", 1).otherwise(0))
        .cast("bigint")
        .alias("n_early"),
        F.sum(F.when(F.col("half") == "late", 1).otherwise(0))
        .cast("bigint")
        .alias("n_late"),
    )
    t = c.agg(
        F.sum("n_early").cast("bigint").alias("te"),
        F.sum("n_late").cast("bigint").alias("tl"),
    )
    es = F.col("n_early").cast("double") / F.col("te")
    ls = F.col("n_late").cast("double") / F.col("tl")
    return (
        c.crossJoin(F.broadcast(t))
        .select(
            "source",
            "n_early",
            "n_late",
            F.round(es, 6).alias("early_share"),
            F.round(ls, 6).alias("late_share"),
            F.round(ls - es, 6).alias("share_delta"),
        )
        .orderBy("source")
    )


# ---- x302: order-priority mix drift ----

_X302_SQL = """
WITH m AS (
  SELECT CAST(YEAR(CAST(o_orderdate AS DATE)) AS BIGINT) AS yr,
         o_orderpriority AS priority,
         CAST(COUNT(*) AS BIGINT) AS c
  FROM orders GROUP BY yr, priority),
tot AS (
  SELECT yr, CAST(SUM(c) AS BIGINT) AS t FROM m GROUP BY yr),
ppm AS (
  SELECT m.priority,
         CAST(ROW_NUMBER() OVER (PARTITION BY m.priority
                                 ORDER BY m.yr) AS BIGINT) AS i,
         (m.c * 1000000) // tot.t AS share_ppm
  FROM m JOIN tot ON m.yr = tot.yr),
s AS (
  SELECT priority,
         CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(i) AS BIGINT) AS sx,
         CAST(SUM(share_ppm) AS BIGINT) AS sy,
         CAST(SUM(i * share_ppm) AS BIGINT) AS sxy
  FROM ppm GROUP BY priority)
SELECT priority, n AS n_years,
       ROUND(CAST(sy AS DOUBLE) / n / 10000, 4) AS mean_share_pct,
       CASE WHEN n * sxy > sx * sy THEN 'growing'
            WHEN n * sxy < sx * sy THEN 'shrinking'
            ELSE 'flat' END AS share_trend
FROM s
ORDER BY priority
"""


@register("x302_priority_mix_drift", oracle=_X302_SQL)
def x302_priority_mix_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order-priority mix drift: each priority class's share of
    yearly orders with the integer ppm slope-sign verdict (x254's
    machinery on the commerce side) — a growing URGENT share
    either means customers expect faster fulfillment (capacity
    signal) or sales discovered the flag forces queue-jumping
    (process signal); either way x169's SLA table is about to
    feel it.

    Scale: (year, priority) agg, yearly totals join, per-class
    moment rollup — calendar- and class-bounded throughout.
    """
    from pyspark.sql import Window

    orders = load_table(spark, sf_dir, "orders")
    m = orders.groupBy(
        F.year(F.col("o_orderdate").cast("date"))
        .cast("bigint")
        .alias("yr"),
        F.col("o_orderpriority").alias("priority"),
    ).agg(F.count("*").cast("bigint").alias("c"))
    tot = m.groupBy("yr").agg(F.sum("c").cast("bigint").alias("t"))
    ppm = m.join(F.broadcast(tot), "yr").select(
        "priority",
        F.row_number()
        .over(Window.partitionBy("priority").orderBy("yr"))
        .cast("bigint")
        .alias("i"),
        F.expr("(c * 1000000) div t").alias("share_ppm"),
    )
    s = ppm.groupBy("priority").agg(
        F.count("*").cast("bigint").alias("n"),
        F.sum("i").cast("bigint").alias("sx"),
        F.sum("share_ppm").cast("bigint").alias("sy"),
        F.sum(F.col("i") * F.col("share_ppm"))
        .cast("bigint")
        .alias("sxy"),
    )
    lhs = F.col("n") * F.col("sxy")
    rhs = F.col("sx") * F.col("sy")
    return s.select(
        "priority",
        F.col("n").alias("n_years"),
        F.round(
            F.col("sy").cast("double") / F.col("n") / 10000, 4
        ).alias("mean_share_pct"),
        F.when(lhs > rhs, "growing")
        .when(lhs < rhs, "shrinking")
        .otherwise("flat")
        .alias("share_trend"),
    ).orderBy("priority")


# ---- x303: customer lifetime-value inequality ----

_X303_SQL = """
WITH spend AS (
  SELECT o_custkey,
         CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) * 100
              AS DECIMAL(19,0)) AS c
  FROM orders GROUP BY o_custkey),
r AS (
  SELECT c,
         CAST(ROW_NUMBER() OVER (ORDER BY c, o_custkey) AS BIGINT)
           AS i,
         CAST(COUNT(*) OVER () AS BIGINT) AS n,
         SUM(c) OVER () AS s
  FROM spend)
SELECT CAST(MAX(n) AS BIGINT) AS n_customers,
       ROUND(CAST(MAX(s) AS DOUBLE) / 100, 2) AS total_spend,
       ROUND(CAST(2 * SUM(i * c) - (MAX(n) + 1) * MAX(s) AS DOUBLE)
             / (MAX(n) * CAST(MAX(s) AS DOUBLE)), 6) AS spend_gini
FROM r
"""


@register("x303_customer_value_gini", oracle=_X303_SQL)
def x303_customer_value_gini(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customer lifetime-value inequality: the Gini coefficient of
    total spend across all ordering customers — the single number
    behind x164's Pareto points and x274's whale club (Gini ~0.3
    is a broad base; ~0.7 means the business IS its whales, and
    every retention metric should be value-weighted). Sorted-rank
    Gini identity over exact cent decimals; the rank product sum
    widens to DECIMAL(38,0).

    Scale: customer-grain agg, one range-partitioned rank sort,
    1-row output.
    """
    from pyspark.sql import Window

    orders = load_table(spark, sf_dir, "orders")
    spend = orders.groupBy("o_custkey").agg(
        (F.sum(F.col("o_totalprice").cast("decimal(18,2)")) * 100)
        .cast("decimal(19,0)")
        .alias("c")
    )
    r = spend.select(
        "c",
        F.row_number()
        .over(Window.orderBy("c", "o_custkey"))
        .cast("bigint")
        .alias("i"),
        F.count("*").over(Window.partitionBy()).cast("bigint").alias("n"),
        F.sum("c").over(Window.partitionBy()).alias("s"),
    )
    return r.agg(
        F.max("n").cast("bigint").alias("n_customers"),
        F.round(F.max("s").cast("double") / 100, 2).alias(
            "total_spend"
        ),
        F.round(
            (
                2 * F.sum(F.col("i") * F.col("c"))
                - (F.max("n") + 1) * F.max("s")
            ).cast("double")
            / (F.max("n") * F.max("s").cast("double")),
            6,
        ).alias("spend_gini"),
    )


# ---- x304: ingestion cadence burstiness per source ----

_X304_SQL = """
WITH seq AS (
  SELECT source,
         doc_id - LAG(doc_id) OVER (PARTITION BY source
                                    ORDER BY doc_id) AS gap
  FROM documents),
g AS (SELECT source, CAST(gap AS BIGINT) AS gap FROM seq
      WHERE gap IS NOT NULL),
m AS (
  SELECT source,
         CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(gap) AS BIGINT) AS s,
         CAST(SUM(gap * gap) AS BIGINT) AS ss
  FROM g GROUP BY source)
SELECT source, n AS n_gaps,
       ((2 * s * 10000 + n) // (2 * n)) / 10000.0 AS mean_gap,
       ROUND(((CAST(ss AS DOUBLE) - CAST(s AS DOUBLE)
               * CAST(s AS DOUBLE) / CAST(n AS DOUBLE))
              / (CAST(n AS DOUBLE) - 1))
             / (CAST(s AS DOUBLE) / n), 4) AS fano_factor
FROM m
ORDER BY source
"""


@register("x304_ingest_burstiness", oracle=_X304_SQL)
def x304_ingest_burstiness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ingestion cadence burstiness: the Fano factor (variance-
    to-mean) of each source's doc_id arrival gaps — ~1 is
    Poisson-steady trickle, large values are batchy feast-famine
    ingestion (which x247 detects only when the batches carry
    duplicates; this sees the cadence itself). The variance
    comes from exact integer moments (the x180 machinery on
    positions instead of counts). The @4 mean uses the exact
    integer half-up form (r11 --solvable-at screen, q34 class);
    gaps > 0 so s > 0. The @4 Fano stays a composite rational
    (no single k/n — same residual class as x213's rho).

    Scale: one source-partitioned lag window over the doc table,
    source-sized moment rollup.
    """
    from pyspark.sql import Window

    docs = load_table(spark, sf_dir, "documents")
    seq = docs.select(
        "source",
        (
            F.col("doc_id")
            - F.lag("doc_id").over(
                Window.partitionBy("source").orderBy("doc_id")
            )
        )
        .cast("bigint")
        .alias("gap"),
    ).where(F.col("gap").isNotNull())
    m = seq.groupBy("source").agg(
        F.count("*").cast("bigint").alias("n"),
        F.sum("gap").cast("bigint").alias("s"),
        F.sum(F.col("gap") * F.col("gap")).cast("bigint").alias("ss"),
    )
    d = lambda c: F.col(c).cast("double")  # noqa: E731
    var = (d("ss") - d("s") * d("s") / d("n")) / (d("n") - 1)
    return m.select(
        "source",
        F.col("n").alias("n_gaps"),
        (
            F.expr("(2 * s * 10000 + n) div (2 * n)").cast("double")
            / 10000
        ).alias("mean_gap"),
        F.round(var / (d("s") / F.col("n")), 4).alias("fano_factor"),
    ).orderBy("source")


# ---- x305: material-level revenue rollup ----

_X305_SQL = """
WITH rev AS (
  SELECT l_partkey,
         CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                  * (CAST(1 AS DECIMAL(6,4))
                     - CAST(l_discount AS DECIMAL(6,4)))) * 1000000
              AS DECIMAL(19,0)) AS rev_u
  FROM lineitem GROUP BY l_partkey),
mat AS (
  SELECT p.p_partkey,
         STRING_SPLIT(p.p_type, ' ')[LEN(STRING_SPLIT(p.p_type, ' '))]
           AS material
  FROM part p),
agg AS (
  SELECT m.material,
         CAST(COUNT(*) AS BIGINT) AS n_parts,
         SUM(r.rev_u) AS rev_u
  FROM mat m JOIN rev r ON m.p_partkey = r.l_partkey
  GROUP BY m.material),
tot AS (SELECT SUM(rev_u) AS t FROM agg)
SELECT a.material, a.n_parts,
       ((CAST(a.rev_u AS BIGINT) + 5000) // 10000) / 100.0 AS revenue,
       ROUND(CAST(a.rev_u AS DOUBLE) / CAST(t.t AS DOUBLE), 6)
         AS revenue_share
FROM agg a CROSS JOIN tot t
ORDER BY a.rev_u DESC, a.material
"""


@register("x305_material_rollup", oracle=_X305_SQL)
def x305_material_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Material-level revenue rollup: p_type's last token is the
    material in TPC-H's '<finish> <coating> <material>' template
    — a hierarchy level the raw type dimension (x262, 150 values)
    hides; commodity-price exposure lives at the MATERIAL level
    (what happens to revenue if copper doubles?). Text-derived
    dimensional rollup: split the dim attribute, aggregate the
    exact micro-unit fact partials.

    Scale: fact agg at partkey grain first; the split runs on
    the part dim only; material-sized output.
    """
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    disc = (
        F.col("l_extendedprice").cast("decimal(18,2)")
        * (F.lit(1).cast("decimal(6,4)") - F.col("l_discount").cast("decimal(6,4)"))
    )
    rev = li.groupBy("l_partkey").agg(
        (F.sum(disc) * 1000000).cast("decimal(19,0)").alias("rev_u")
    )
    mat = part.select(
        "p_partkey",
        F.element_at(F.split("p_type", " "), -1).alias("material"),
    )
    agg = (
        F.broadcast(mat)
        .join(rev, mat.p_partkey == rev.l_partkey)
        .groupBy("material")
        .agg(
            F.count("*").cast("bigint").alias("n_parts"),
            F.sum("rev_u").alias("rev_u"),
        )
    )
    tot = agg.agg(F.sum("rev_u").alias("t"))
    return (
        agg.crossJoin(F.broadcast(tot))
        .select(
            "material",
            "n_parts",
            (F.expr("(cast(rev_u as bigint) + 5000) div 10000") / F.lit(100.0)).alias(
                "revenue"
            ),
            F.round(
                F.col("rev_u").cast("double") / F.col("t").cast("double"),
                6,
            ).alias("revenue_share"),
            F.col("rev_u").alias("_o"),
        )
        .orderBy(F.desc("_o"), "material")
        .drop("_o")
    )


# ---- x306: brand loyalist share ----

_X306_SQL = """
WITH cb AS (
  SELECT o.o_custkey, p.p_brand,
         CAST(COUNT(*) AS BIGINT) AS n
  FROM lineitem l
  JOIN orders o ON l.l_orderkey = o.o_orderkey
  JOIN part p ON l.l_partkey = p.p_partkey
  GROUP BY o.o_custkey, p.p_brand),
per_c AS (
  SELECT o_custkey,
         CAST(SUM(n) AS BIGINT) AS total,
         CAST(MAX(n) AS BIGINT) AS top_n
  FROM cb GROUP BY o_custkey
  HAVING SUM(n) >= 10),
fav AS (
  SELECT cb.o_custkey, MIN(cb.p_brand) AS fav_brand
  FROM cb JOIN per_c p ON cb.o_custkey = p.o_custkey
  WHERE cb.n = p.top_n
  GROUP BY cb.o_custkey),
cls AS (
  SELECT f.fav_brand,
         CASE WHEN 2 * p.top_n >= p.total THEN 1 ELSE 0 END AS loyal
  FROM per_c p JOIN fav f ON p.o_custkey = f.o_custkey)
SELECT fav_brand,
       CAST(COUNT(*) AS BIGINT) AS n_fans,
       CAST(SUM(loyal) AS BIGINT) AS n_loyalists,
       ROUND(CAST(SUM(loyal) AS DOUBLE) / COUNT(*), 6)
         AS loyalist_share
FROM cls
GROUP BY fav_brand
ORDER BY fav_brand
"""


@register("x306_brand_loyalists", oracle=_X306_SQL)
def x306_brand_loyalists(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brand loyalist census: customers (≥10 lines) whose top
    brand carries at least half their purchase lines, counted
    under that favorite brand — which brands own their customers
    vs merely renting them (the demand-side complement of x266's
    market dependence; a brand with fans prices differently).
    The loyalty gate is an integer cross-multiplication
    (2·top ≥ total); the favorite breaks count-ties lexically.

    Scale: (customer, brand) agg → customer rollup → brand
    census, each strictly smaller; all joins custkey-co-keyed.
    """
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    part = load_table(spark, sf_dir, "part")
    cb = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .groupBy("o_custkey", "p_brand")
        .agg(F.count("*").cast("bigint").alias("n"))
    )
    per_c = (
        cb.groupBy("o_custkey")
        .agg(
            F.sum("n").cast("bigint").alias("total"),
            F.max("n").cast("bigint").alias("top_n"),
        )
        .where(F.col("total") >= 10)
    )
    fav = (
        cb.join(per_c, "o_custkey")
        .where(F.col("n") == F.col("top_n"))
        .groupBy("o_custkey")
        .agg(F.min("p_brand").alias("fav_brand"))
    )
    cls = per_c.join(fav, "o_custkey").select(
        "fav_brand",
        F.when(
            2 * F.col("top_n") >= F.col("total"), 1
        )
        .otherwise(0)
        .alias("loyal"),
    )
    return (
        cls.groupBy("fav_brand")
        .agg(
            F.count("*").cast("bigint").alias("n_fans"),
            F.sum("loyal").cast("bigint").alias("n_loyalists"),
            F.round(
                F.sum("loyal").cast("double") / F.count("*"), 6
            ).alias("loyalist_share"),
        )
        .orderBy("fav_brand")
    )


# ---- x307: finish x coating revenue matrix ----

_X307_SQL = """
WITH rev AS (
  SELECT l_partkey,
         CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                  * (CAST(1 AS DECIMAL(6,4))
                     - CAST(l_discount AS DECIMAL(6,4)))) * 1000000
              AS DECIMAL(19,0)) AS rev_u
  FROM lineitem GROUP BY l_partkey),
dims AS (
  SELECT p_partkey,
         STRING_SPLIT(p_type, ' ')[1] AS finish,
         STRING_SPLIT(p_type, ' ')[2] AS coating
  FROM part),
agg AS (
  SELECT d.finish, d.coating,
         CAST(COUNT(*) AS BIGINT) AS n_parts,
         SUM(r.rev_u) AS rev_u
  FROM dims d JOIN rev r ON d.p_partkey = r.l_partkey
  GROUP BY d.finish, d.coating),
tot AS (SELECT SUM(rev_u) AS t FROM agg)
SELECT a.finish, a.coating, a.n_parts,
       ((CAST(a.rev_u AS BIGINT) + 5000) // 10000) / 100.0 AS revenue,
       ROUND(CAST(a.rev_u AS DOUBLE) / CAST(t.t AS DOUBLE), 6)
         AS revenue_share
FROM agg a CROSS JOIN tot t
ORDER BY a.finish, a.coating
"""


@register("x307_finish_coating_matrix", oracle=_X307_SQL)
def x307_finish_coating_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Finish x coating revenue matrix: the other two levels of
    the p_type template ('<finish> <coating> <material>') crossed
    — with x305's material axis this completes the derived
    3-level product hierarchy the flat 150-value type code
    obscures, and the matrix shape exposes process-combination
    winners (is ANODIZED only valuable when BRUSHED?).

    Scale: fact partials at partkey grain; the split and
    cross-tab run on the part dim; matrix-sized output.
    """
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    disc = (
        F.col("l_extendedprice").cast("decimal(18,2)")
        * (F.lit(1).cast("decimal(6,4)") - F.col("l_discount").cast("decimal(6,4)"))
    )
    rev = li.groupBy("l_partkey").agg(
        (F.sum(disc) * 1000000).cast("decimal(19,0)").alias("rev_u")
    )
    dims = part.select(
        "p_partkey",
        F.element_at(F.split("p_type", " "), 1).alias("finish"),
        F.element_at(F.split("p_type", " "), 2).alias("coating"),
    )
    agg = (
        F.broadcast(dims)
        .join(rev, dims.p_partkey == rev.l_partkey)
        .groupBy("finish", "coating")
        .agg(
            F.count("*").cast("bigint").alias("n_parts"),
            F.sum("rev_u").alias("rev_u"),
        )
    )
    tot = agg.agg(F.sum("rev_u").alias("t"))
    return (
        agg.crossJoin(F.broadcast(tot))
        .select(
            "finish",
            "coating",
            "n_parts",
            (F.expr("(cast(rev_u as bigint) + 5000) div 10000") / F.lit(100.0)).alias(
                "revenue"
            ),
            F.round(
                F.col("rev_u").cast("double") / F.col("t").cast("double"),
                6,
            ).alias("revenue_share"),
        )
        .orderBy("finish", "coating")
    )


# ---- x308: regional material preferences ----

_X308_SQL = """
WITH rev AS (
  SELECT n.n_name AS nation,
         STRING_SPLIT(p.p_type, ' ')[LEN(STRING_SPLIT(p.p_type, ' '))]
           AS material,
         CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))
                  * (CAST(1 AS DECIMAL(6,4))
                     - CAST(l.l_discount AS DECIMAL(6,4)))) * 1000000
              AS DECIMAL(19,0)) AS rev_u
  FROM lineitem l
  JOIN orders o ON l.l_orderkey = o.o_orderkey
  JOIN customer c ON o.o_custkey = c.c_custkey
  JOIN nation n ON c.c_nationkey = n.n_nationkey
  JOIN part p ON l.l_partkey = p.p_partkey
  GROUP BY nation, material),
rk AS (
  SELECT nation, material, rev_u,
         ROW_NUMBER() OVER (PARTITION BY nation
                            ORDER BY rev_u DESC, material) AS rn,
         SUM(rev_u) OVER (PARTITION BY nation) AS tot_u
  FROM rev)
SELECT nation, material AS top_material,
       ROUND(CAST(rev_u AS DOUBLE) / CAST(tot_u AS DOUBLE), 6)
         AS material_share
FROM rk
WHERE rn = 1
ORDER BY nation
"""


@register("x308_regional_materials", oracle=_X308_SQL)
def x308_regional_materials(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Regional material preferences: each customer nation's top
    material by revenue with its share — regional taste (or
    regulation) mapped onto x305's derived hierarchy; uniform
    top materials everywhere mean central assortment planning
    works, divergent ones justify regional buyers.

    Rank pick with material tiebreak over exact micro-units.

    Scale: fact agg at (nation, material) grain, per-nation rank
    window, 25-row output.
    """
    from pyspark.sql import Window

    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    nat = load_table(spark, sf_dir, "nation")
    part = load_table(spark, sf_dir, "part")
    disc = (
        F.col("l_extendedprice").cast("decimal(18,2)")
        * (F.lit(1).cast("decimal(6,4)") - F.col("l_discount").cast("decimal(6,4)"))
    )
    rev = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nat), cust.c_nationkey == nat.n_nationkey)
        .join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .groupBy(
            F.col("n_name").alias("nation"),
            F.element_at(F.split("p_type", " "), -1).alias("material"),
        )
        .agg(
            (F.sum(disc) * 1000000)
            .cast("decimal(19,0)")
            .alias("rev_u")
        )
    )
    rk = rev.select(
        "nation",
        "material",
        "rev_u",
        F.row_number()
        .over(
            Window.partitionBy("nation").orderBy(
                F.desc("rev_u"), "material"
            )
        )
        .alias("rn"),
        F.sum("rev_u")
        .over(Window.partitionBy("nation"))
        .alias("tot_u"),
    )
    return (
        rk.where(F.col("rn") == 1)
        .select(
            "nation",
            F.col("material").alias("top_material"),
            F.round(
                F.col("rev_u").cast("double")
                / F.col("tot_u").cast("double"),
                6,
            ).alias("material_share"),
        )
        .orderBy("nation")
    )


# ---- x309: weekday ordering habit strength ----

_X309_SQL = """
WITH cd AS (
  SELECT o_custkey,
         CAST(DAYOFWEEK(CAST(o_orderdate AS DATE)) + 1 AS BIGINT)
           AS dow,
         CAST(COUNT(*) AS BIGINT) AS n
  FROM orders GROUP BY o_custkey, dow),
per_c AS (
  SELECT o_custkey,
         CAST(SUM(n) AS BIGINT) AS total,
         CAST(MAX(n) AS BIGINT) AS top_n
  FROM cd GROUP BY o_custkey
  HAVING SUM(n) >= 8),
cls AS (
  SELECT CASE WHEN 2 * top_n >= total THEN 'habitual'
              ELSE 'spread' END AS habit_class
  FROM per_c),
t AS (SELECT CAST(COUNT(*) AS BIGINT) AS nt FROM cls)
SELECT habit_class,
       CAST(COUNT(*) AS BIGINT) AS n_customers,
       ROUND(CAST(COUNT(*) AS DOUBLE) / (SELECT nt FROM t), 6)
         AS customer_share
FROM cls
GROUP BY habit_class
ORDER BY habit_class
"""


@register("x309_weekday_habit", oracle=_X309_SQL)
def x309_weekday_habit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekday ordering habit: customers (≥8 orders) whose modal
    weekday carries at least half their orders ('habitual') vs
    spread-out orderers — habitual customers are schedulable
    (replenishment reminders on THEIR day); the x306 loyalty
    construction on the time axis instead of the brand axis.
    Integer cross-multiplied gate; DuckDB DAYOFWEEK offset per
    the x161 rule.

    Scale: (customer, dow) agg → customer rollup → 2-row census.
    """
    orders = load_table(spark, sf_dir, "orders")
    cd = orders.groupBy(
        "o_custkey",
        F.dayofweek(F.col("o_orderdate").cast("date"))
        .cast("bigint")
        .alias("dow"),
    ).agg(F.count("*").cast("bigint").alias("n"))
    per_c = (
        cd.groupBy("o_custkey")
        .agg(
            F.sum("n").cast("bigint").alias("total"),
            F.max("n").cast("bigint").alias("top_n"),
        )
        .where(F.col("total") >= 8)
    )
    cls = per_c.select(
        F.when(2 * F.col("top_n") >= F.col("total"), "habitual")
        .otherwise("spread")
        .alias("habit_class")
    )
    t = cls.agg(F.count("*").cast("bigint").alias("nt"))
    return (
        cls.groupBy("habit_class")
        .agg(F.count("*").cast("bigint").alias("n_customers"))
        .crossJoin(F.broadcast(t))
        .select(
            "habit_class",
            "n_customers",
            F.round(
                F.col("n_customers").cast("double") / F.col("nt"), 6
            ).alias("customer_share"),
        )
        .orderBy("habit_class")
    )


# ---- x310: corpus-readiness gate ----

_X310_SQL = """
WITH fp AS (
  SELECT source, lang,
         MD5(LOWER(REGEXP_REPLACE(text, '\\s+', ' ', 'g'))) AS f
  FROM documents),
dup AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
         CAST(COUNT(*) - COUNT(DISTINCT f) AS BIGINT) AS n_dup
  FROM fp),
langmin AS (
  SELECT CAST(MIN(cnt) AS BIGINT) AS min_lang_docs
  FROM (SELECT COUNT(*) AS cnt FROM fp GROUP BY lang) l),
srcmin AS (
  SELECT CAST(MIN(cnt) AS BIGINT) AS min_source_docs
  FROM (SELECT COUNT(*) AS cnt FROM fp GROUP BY source) s),
checks AS (
  SELECT 'dup_rate_under_5pct' AS check_name,
         CAST(d.n_dup AS BIGINT) AS observed,
         20 * d.n_dup <= d.n_docs AS passed
  FROM dup d
  UNION ALL
  SELECT 'every_lang_ge_50_docs', l.min_lang_docs,
         l.min_lang_docs >= 50
  FROM langmin l
  UNION ALL
  SELECT 'every_source_ge_10_docs', s.min_source_docs,
         s.min_source_docs >= 10
  FROM srcmin s)
SELECT check_name, observed, passed
FROM checks
ORDER BY check_name
"""


@register("x310_corpus_readiness_gate", oracle=_X310_SQL)
def x310_corpus_readiness_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-readiness gate: the x280 data-contract pattern on
    the training-corpus side — exact-dup rate under 5% (integer
    cross-multiplied: 20·dups ≤ docs), every language and every
    source above minimum viable document counts. A false row
    blocks the corpus from entering x40's prepare pipeline, with
    the observed number telling the operator how far off it is.

    Scale: one fingerprint aggregate + two group-count minima —
    three parallel legs, 3-row output.
    """
    docs = load_table(spark, sf_dir, "documents")
    norm = F.lower(F.regexp_replace("text", r"\s+", " "))
    fp = docs.select(
        "source", "lang", F.md5(norm.cast("binary")).alias("f")
    )
    dup = fp.agg(
        F.count("*").cast("bigint").alias("n_docs"),
        (F.count("*") - F.countDistinct("f"))
        .cast("bigint")
        .alias("n_dup"),
    ).select(
        F.lit("dup_rate_under_5pct").alias("check_name"),
        F.col("n_dup").alias("observed"),
        (20 * F.col("n_dup") <= F.col("n_docs")).alias("passed"),
    )
    langmin = (
        fp.groupBy("lang")
        .count()
        .agg(F.min("count").cast("bigint").alias("m"))
        .select(
            F.lit("every_lang_ge_50_docs").alias("check_name"),
            F.col("m").alias("observed"),
            (F.col("m") >= 50).alias("passed"),
        )
    )
    srcmin = (
        fp.groupBy("source")
        .count()
        .agg(F.min("count").cast("bigint").alias("m"))
        .select(
            F.lit("every_source_ge_10_docs").alias("check_name"),
            F.col("m").alias("observed"),
            (F.col("m") >= 10).alias("passed"),
        )
    )
    return (
        dup.unionByName(langmin).unionByName(srcmin).orderBy("check_name")
    )


# ---- x311: value-per-event drift by type ----

_X311_SQL = """
WITH m AS (
  SELECT event_type,
         STRFTIME(DATE_TRUNC('month', CAST(ts AS DATE)), '%Y-%m')
           AS month,
         CAST(SUM(CAST(value AS DECIMAL(18,6)) * 1000000
                  ) AS DECIMAL(38,0)) AS v_u,
         CAST(COUNT(*) AS BIGINT) AS n
  FROM events GROUP BY event_type, month),
ppm AS (
  SELECT event_type,
         CAST(ROW_NUMBER() OVER (PARTITION BY event_type
                                 ORDER BY month) AS BIGINT) AS i,
         CAST(v_u AS BIGINT) // n AS mean_u
  FROM m),
s AS (
  SELECT event_type,
         CAST(COUNT(*) AS BIGINT) AS nm,
         CAST(SUM(i) AS BIGINT) AS sx,
         CAST(SUM(mean_u) AS BIGINT) AS sy,
         CAST(SUM(i * mean_u) AS BIGINT) AS sxy
  FROM ppm GROUP BY event_type)
SELECT event_type, nm AS n_months,
       ROUND(CAST(sy AS DOUBLE) / nm / 1000000, 4) AS mean_value,
       CASE WHEN nm * sxy > sx * sy THEN 'rising'
            WHEN nm * sxy < sx * sy THEN 'falling'
            ELSE 'flat' END AS value_trend
FROM s
ORDER BY event_type
"""


@register("x311_value_drift", oracle=_X311_SQL)
def x311_value_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Value-per-event drift: each event type's monthly mean value
    quantized to integer micro-units (floor division of the exact
    decimal sum) and classified rising/falling/flat by the
    integer slope-sign rule — monetization drift per
    instrumentation channel, the dollars companion to x254's
    volume-mix drift. No float enters the trend decision.

    Scale: (type, month) agg, per-type moment rollup.
    """
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events")
    m = ev.groupBy(
        "event_type",
        F.date_format(
            F.date_trunc("month", F.col("ts").cast("date")), "yyyy-MM"
        ).alias("month"),
    ).agg(
        (F.sum(F.col("value").cast("decimal(18,6)")) * 1000000)
        .cast("decimal(38,0)")
        .alias("v_u"),
        F.count("*").cast("bigint").alias("n"),
    )
    ppm = m.select(
        "event_type",
        F.row_number()
        .over(Window.partitionBy("event_type").orderBy("month"))
        .cast("bigint")
        .alias("i"),
        F.expr("CAST(v_u AS BIGINT) div n").alias("mean_u"),
    )
    s = ppm.groupBy("event_type").agg(
        F.count("*").cast("bigint").alias("nm"),
        F.sum("i").cast("bigint").alias("sx"),
        F.sum("mean_u").cast("bigint").alias("sy"),
        F.sum(F.col("i") * F.col("mean_u"))
        .cast("bigint")
        .alias("sxy"),
    )
    lhs = F.col("nm") * F.col("sxy")
    rhs = F.col("sx") * F.col("sy")
    return s.select(
        "event_type",
        F.col("nm").alias("n_months"),
        F.round(
            F.col("sy").cast("double") / F.col("nm") / 1000000, 4
        ).alias("mean_value"),
        F.when(lhs > rhs, "rising")
        .when(lhs < rhs, "falling")
        .otherwise("flat")
        .alias("value_trend"),
    ).orderBy("event_type")


# ---- x312: brand price dispersion ----

_X312_SQL = """
WITH c AS (
  SELECT p_brand,
         CAST(ROUND(p_retailprice * 100) AS BIGINT) AS price_c
  FROM part),
m AS (
  SELECT p_brand,
         CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(price_c) AS BIGINT) AS s,
         CAST(SUM(price_c * price_c) AS BIGINT) AS ss
  FROM c GROUP BY p_brand)
SELECT p_brand, n AS n_parts,
       CAST((2 * s + n) // (2 * n) AS DOUBLE) / 100 AS mean_price,
       ROUND(SQRT((CAST(ss AS DOUBLE) - CAST(s AS DOUBLE)
                   * CAST(s AS DOUBLE) / CAST(n AS DOUBLE))
                  / (CAST(n AS DOUBLE) - 1))
             / (CAST(s AS DOUBLE) / n), 6) AS price_cv
FROM m
ORDER BY price_cv DESC, p_brand
"""


@register("x312_brand_price_dispersion", oracle=_X312_SQL)
def x312_brand_price_dispersion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brand price dispersion: coefficient of variation of each
    brand's retail prices — a tight CV is a focused price
    position (x253 tells WHERE it sits), a wide one is a brand
    stretched across tiers that probably needs sub-branding;
    read with x236's ladder gaps to see whether the spread is
    continuous or has holes. Integer cent moments; the displayed
    mean uses the x201 integer half-up division (half-cent ROUND
    ties diverge across engines); one sqrt-over-division CV.

    Scale: dim-only moment aggregate, brand-sized output.
    """
    part = load_table(spark, sf_dir, "part")
    c = part.select(
        "p_brand",
        F.round(F.col("p_retailprice") * 100)
        .cast("bigint")
        .alias("price_c"),
    )
    m = c.groupBy("p_brand").agg(
        F.count("*").cast("bigint").alias("n"),
        F.sum("price_c").cast("bigint").alias("s"),
        F.sum(F.col("price_c") * F.col("price_c"))
        .cast("bigint")
        .alias("ss"),
    )
    d = lambda col: F.col(col).cast("double")  # noqa: E731
    cv = F.sqrt(
        (d("ss") - d("s") * d("s") / d("n")) / (d("n") - 1)
    ) / (d("s") / F.col("n"))
    return m.select(
        "p_brand",
        F.col("n").alias("n_parts"),
        (
            F.expr("(2 * s + n) div (2 * n)").cast("double") / 100
        ).alias("mean_price"),
        F.round(cv, 6).alias("price_cv"),
    ).orderBy(F.desc("price_cv"), "p_brand")


# ---- x313: supplier-nation span per order ----

_X313_SQL = """
WITH span AS (
  SELECT l.l_orderkey,
         CAST(COUNT(DISTINCT s.s_nationkey) AS BIGINT) AS n_nations
  FROM lineitem l JOIN supplier s ON l.l_suppkey = s.s_suppkey
  GROUP BY l.l_orderkey),
j AS (
  SELECT c.c_mktsegment AS segment, sp.n_nations
  FROM span sp
  JOIN orders o ON sp.l_orderkey = o.o_orderkey
  JOIN customer c ON o.o_custkey = c.c_custkey)
SELECT segment,
       CAST(COUNT(*) AS BIGINT) AS n_orders,
       ROUND(CAST(SUM(n_nations) AS DOUBLE) / COUNT(*), 4)
         AS avg_supplier_nations,
       CAST(SUM(CASE WHEN n_nations = 1 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_single_nation,
       ROUND(CAST(SUM(CASE WHEN n_nations = 1 THEN 1 ELSE 0 END)
                  AS DOUBLE) / COUNT(*), 6) AS single_nation_share
FROM j
GROUP BY segment
ORDER BY segment
"""


@register("x313_supply_span", oracle=_X313_SQL)
def x313_supply_span(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Supplier-nation span per order: how many supplier countries
    an average order's lines pull from, by customer segment — each
    extra nation is a customs lane and a consolidation point, so
    this is the fulfillment-complexity (and trade-exposure) read
    on the demand mix; the order-level drill-down of x133's
    nation-pair trade matrix.

    Integer distinct counts; two ratios per segment.

    Scale: orderkey-grain distinct agg, co-keyed orders join, dim
    broadcasts, 5-row rollup.
    """
    li = load_table(spark, sf_dir, "lineitem")
    sup = load_table(spark, sf_dir, "supplier")
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    span = (
        li.join(F.broadcast(sup), li.l_suppkey == sup.s_suppkey)
        .groupBy("l_orderkey")
        .agg(
            F.countDistinct("s_nationkey")
            .cast("bigint")
            .alias("n_nations")
        )
    )
    j = (
        span.join(orders, span.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .select(F.col("c_mktsegment").alias("segment"), "n_nations")
    )
    single = F.sum(
        F.when(F.col("n_nations") == 1, 1).otherwise(0)
    )
    return (
        j.groupBy("segment")
        .agg(
            F.count("*").cast("bigint").alias("n_orders"),
            F.round(
                F.sum("n_nations").cast("double") / F.count("*"), 4
            ).alias("avg_supplier_nations"),
            single.cast("bigint").alias("n_single_nation"),
            F.round(
                single.cast("double") / F.count("*"), 6
            ).alias("single_nation_share"),
        )
        .orderBy("segment")
    )


# ---- x314: per-type daily burst factor ----

_X314_SQL = """
WITH d AS (
  SELECT event_type, CAST(ts AS DATE) AS day,
         CAST(COUNT(*) AS BIGINT) AS n
  FROM events GROUP BY event_type, day),
m AS (
  SELECT event_type,
         CAST(COUNT(*) AS BIGINT) AS n_days,
         CAST(SUM(n) AS BIGINT) AS total,
         CAST(MAX(n) AS BIGINT) AS peak
  FROM d GROUP BY event_type)
SELECT event_type, n_days, total AS n_events, peak AS peak_day_events,
       ROUND(CAST(peak AS DOUBLE) * n_days / total, 4)
         AS burst_factor
FROM m
ORDER BY event_type
"""


@register("x314_daily_burst_factor", oracle=_X314_SQL)
def x314_daily_burst_factor(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-type daily burst factor: peak-day volume over the mean
    day (peak·days/total — one division, no intermediate float
    mean) — which instrumentation channels spike (errors during
    an incident, signups during a campaign) and therefore need
    headroom rather than average-sized pipes; the per-type,
    day-grain refinement of x284's global per-minute peaks.

    Scale: (type, day) agg + type rollup.
    """
    ev = load_table(spark, sf_dir, "events")
    d = ev.groupBy(
        "event_type", F.col("ts").cast("date").alias("day")
    ).agg(F.count("*").cast("bigint").alias("n"))
    m = d.groupBy("event_type").agg(
        F.count("*").cast("bigint").alias("n_days"),
        F.sum("n").cast("bigint").alias("total"),
        F.max("n").cast("bigint").alias("peak"),
    )
    return m.select(
        "event_type",
        "n_days",
        F.col("total").alias("n_events"),
        F.col("peak").alias("peak_day_events"),
        F.round(
            F.col("peak").cast("double") * F.col("n_days")
            / F.col("total"),
            4,
        ).alias("burst_factor"),
    ).orderBy("event_type")


# ---- x315: brand-discovery curve ----

_X315_SQL = """
WITH lines AS (
  SELECT o.o_custkey, p.p_brand, o.o_orderdate, o.o_orderkey,
         l.l_linenumber
  FROM lineitem l
  JOIN orders o ON l.l_orderkey = o.o_orderkey
  JOIN part p ON l.l_partkey = p.p_partkey),
flags AS (
  SELECT o_custkey, o_orderkey, o_orderdate,
         CASE WHEN ROW_NUMBER() OVER (
                PARTITION BY o_custkey, p_brand
                ORDER BY o_orderdate, o_orderkey, l_linenumber) = 1
              THEN 1 ELSE 0 END AS is_discovery
  FROM lines),
seq AS (
  SELECT is_discovery,
         DENSE_RANK() OVER (PARTITION BY o_custkey
                            ORDER BY o_orderdate, o_orderkey)
           AS order_no
  FROM flags),
b AS (
  SELECT CASE WHEN order_no = 1 THEN 'a_order_1'
              WHEN order_no <= 3 THEN 'b_orders_2_3'
              WHEN order_no <= 6 THEN 'c_orders_4_6'
              ELSE 'd_orders_7plus' END AS order_bucket,
         is_discovery
  FROM seq)
SELECT order_bucket,
       CAST(COUNT(*) AS BIGINT) AS n_lines,
       CAST(SUM(is_discovery) AS BIGINT) AS n_discoveries,
       ROUND(CAST(SUM(is_discovery) AS DOUBLE) / COUNT(*), 6)
         AS discovery_rate
FROM b
GROUP BY order_bucket
ORDER BY order_bucket
"""


@register("x315_brand_discovery", oracle=_X315_SQL)
def x315_brand_discovery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brand-discovery curve: the share of order lines that are a
    customer's FIRST purchase of that brand, bucketed by order
    sequence number — the explore→exploit curve (fast decay means
    early orders fix the repertoire and cross-sell must happen in
    orders 1-3 or never; a flat curve means discovery never
    stops). First-time flags via a (customer, brand) window rank;
    order numbers via dense_rank over order dates.

    Integer flags; one rate per bucket.

    Scale: two windows sharing the custkey partitioning, 4-bucket
    rollup.
    """
    from pyspark.sql import Window

    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    part = load_table(spark, sf_dir, "part")
    lines = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .select(
            "o_custkey",
            "p_brand",
            "o_orderdate",
            "o_orderkey",
            "l_linenumber",
        )
    )
    flags = lines.select(
        "o_custkey",
        "o_orderkey",
        "o_orderdate",
        F.when(
            F.row_number().over(
                Window.partitionBy("o_custkey", "p_brand").orderBy(
                    "o_orderdate", "o_orderkey", "l_linenumber"
                )
            )
            == 1,
            1,
        )
        .otherwise(0)
        .alias("is_discovery"),
    )
    seq = flags.select(
        "is_discovery",
        F.dense_rank()
        .over(
            Window.partitionBy("o_custkey").orderBy(
                "o_orderdate", "o_orderkey"
            )
        )
        .alias("order_no"),
    )
    b = seq.select(
        F.when(F.col("order_no") == 1, "a_order_1")
        .when(F.col("order_no") <= 3, "b_orders_2_3")
        .when(F.col("order_no") <= 6, "c_orders_4_6")
        .otherwise("d_orders_7plus")
        .alias("order_bucket"),
        "is_discovery",
    )
    return (
        b.groupBy("order_bucket")
        .agg(
            F.count("*").cast("bigint").alias("n_lines"),
            F.sum("is_discovery").cast("bigint").alias("n_discoveries"),
            F.round(
                F.sum("is_discovery").cast("double") / F.count("*"), 6
            ).alias("discovery_rate"),
        )
        .orderBy("order_bucket")
    )


# ---- x316: error-volume coupling ----

_X316_SQL = """
WITH d AS (
  SELECT CAST(ts AS DATE) AS day,
         CAST(COUNT(*) AS BIGINT) AS x,
         CAST(SUM(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END)
              AS BIGINT) AS y
  FROM events GROUP BY day),
s AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(y) AS BIGINT) AS sy,
         CAST(SUM(x * y) AS BIGINT) AS sxy,
         CAST(SUM(x * x) AS BIGINT) AS sxx,
         CAST(SUM(y * y) AS BIGINT) AS syy
  FROM d)
SELECT n AS n_days,
       ROUND(CAST(sy AS DOUBLE) / CAST(sx AS DOUBLE), 6)
         AS overall_error_rate,
       ROUND(
         (CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE)
                                / CAST(n AS DOUBLE))
         / (SQRT(CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE)
                 * CAST(sx AS DOUBLE) / CAST(n AS DOUBLE))
            * SQRT(CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE)
                   * CAST(sy AS DOUBLE) / CAST(n AS DOUBLE))),
         6) AS volume_error_corr
FROM s
"""


@register("x316_error_volume_coupling", oracle=_X316_SQL)
def x316_error_volume_coupling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Error-volume coupling: correlation between daily event
    volume and daily error count — near 1 means errors are a
    constant tax that scales with load (capacity problem); near 0
    means they spike independently (deploys and incidents, x113's
    alerts are the tool); exactly the triage split an on-call
    lead wants. Exact integer day moments.

    Scale: day-grain agg, 1-row moment reduce.
    """
    ev = load_table(spark, sf_dir, "events")
    d = ev.groupBy(F.col("ts").cast("date").alias("day")).agg(
        F.count("*").cast("bigint").alias("x"),
        F.sum(
            F.when(F.col("event_type") == "error", 1).otherwise(0)
        )
        .cast("bigint")
        .alias("y"),
    )
    s = d.agg(
        F.count("*").cast("bigint").alias("n"),
        F.sum("x").cast("bigint").alias("sx"),
        F.sum("y").cast("bigint").alias("sy"),
        F.sum(F.col("x") * F.col("y")).cast("bigint").alias("sxy"),
        F.sum(F.col("x") * F.col("x")).cast("bigint").alias("sxx"),
        F.sum(F.col("y") * F.col("y")).cast("bigint").alias("syy"),
    )
    dd = lambda c: F.col(c).cast("double")  # noqa: E731
    r = (dd("sxy") - dd("sx") * dd("sy") / dd("n")) / (
        F.sqrt(dd("sxx") - dd("sx") * dd("sx") / dd("n"))
        * F.sqrt(dd("syy") - dd("sy") * dd("sy") / dd("n"))
    )
    return s.select(
        F.col("n").alias("n_days"),
        F.round(dd("sy") / dd("sx"), 6).alias("overall_error_rate"),
        F.round(r, 6).alias("volume_error_corr"),
    )


# ---- x317: discount depth by basket size ----

_X317_SQL = """
WITH ob AS (
  SELECT l_orderkey,
         CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS units,
         CAST(SUM(CAST(ROUND(l_discount * 10000) AS BIGINT)) AS BIGINT)
           AS bps_sum,
         CAST(COUNT(*) AS BIGINT) AS n_lines
  FROM lineitem GROUP BY l_orderkey),
b AS (
  SELECT CASE WHEN units <= 50 THEN 'a_small_le50'
              WHEN units <= 150 THEN 'b_mid_51_150'
              ELSE 'c_large_151plus' END AS size_bucket,
         bps_sum, n_lines
  FROM ob)
SELECT size_bucket,
       CAST(COUNT(*) AS BIGINT) AS n_orders,
       ROUND(CAST(SUM(bps_sum) AS DOUBLE) / SUM(n_lines) / 100, 4)
         AS avg_discount_pct
FROM b
GROUP BY size_bucket
ORDER BY size_bucket
"""


@register("x317_discount_by_size", oracle=_X317_SQL)
def x317_discount_by_size(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Discount depth by basket size: average line discount for
    small, mid, and large orders (by total units) — rising depth
    with size is volume pricing working as designed; flat depth
    says big buyers aren't negotiating (margin opportunity or
    churn risk, depending which side of the table you sit).
    Discounts accumulate as integer basis points; the average is
    one division chain on exact sums.

    Scale: orderkey-grain agg, 3-bucket rollup.
    """
    li = load_table(spark, sf_dir, "lineitem")
    ob = li.groupBy("l_orderkey").agg(
        F.sum(F.col("l_quantity").cast("bigint"))
        .cast("bigint")
        .alias("units"),
        F.sum(F.round(F.col("l_discount") * 10000).cast("bigint"))
        .cast("bigint")
        .alias("bps_sum"),
        F.count("*").cast("bigint").alias("n_lines"),
    )
    b = ob.select(
        F.when(F.col("units") <= 50, "a_small_le50")
        .when(F.col("units") <= 150, "b_mid_51_150")
        .otherwise("c_large_151plus")
        .alias("size_bucket"),
        "bps_sum",
        "n_lines",
    )
    return (
        b.groupBy("size_bucket")
        .agg(
            F.count("*").cast("bigint").alias("n_orders"),
            F.round(
                F.sum("bps_sum").cast("double")
                / F.sum("n_lines")
                / 100,
                4,
            ).alias("avg_discount_pct"),
        )
        .orderBy("size_bucket")
    )


# ---- x318: peak traffic cell per event type ----

_X318_SQL = """
WITH cell AS (
  SELECT event_type,
         CAST(DAYOFWEEK(CAST(ts AS DATE)) + 1 AS BIGINT) AS dow,
         CAST(HOUR(ts) AS BIGINT) AS hr,
         CAST(COUNT(*) AS BIGINT) AS n
  FROM events GROUP BY event_type, dow, hr),
rk AS (
  SELECT event_type, dow, hr, n,
         ROW_NUMBER() OVER (PARTITION BY event_type
                            ORDER BY n DESC, dow, hr) AS rn,
         SUM(n) OVER (PARTITION BY event_type) AS tot,
         COUNT(*) OVER (PARTITION BY event_type) AS n_cells
  FROM cell)
SELECT event_type, dow AS peak_dow, hr AS peak_hour,
       n AS peak_events,
       ROUND(CAST(n AS DOUBLE) * n_cells / tot, 4)
         AS peak_over_mean
FROM rk
WHERE rn = 1
ORDER BY event_type
"""


@register("x318_peak_cell", oracle=_X318_SQL)
def x318_peak_cell(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Peak traffic cell per event type: the (weekday, hour) cell
    with the most events, and how far above the mean cell it
    runs — the argmax summary of x123's full heatmap (the
    heatmap goes on the wall; this row goes in the on-call
    runbook: "errors peak Tuesday 14:00 at 3.1x mean"). Rank
    pick with (dow, hour) tiebreak; peak-over-mean multiplies
    before dividing (no intermediate mean float).

    Scale: (type, dow, hour) agg — ≤ 840 cells — then a per-type
    rank.
    """
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events")
    cell = ev.groupBy(
        "event_type",
        F.dayofweek(F.col("ts").cast("date"))
        .cast("bigint")
        .alias("dow"),
        F.hour("ts").cast("bigint").alias("hr"),
    ).agg(F.count("*").cast("bigint").alias("n"))
    w = Window.partitionBy("event_type")
    rk = cell.select(
        "event_type",
        "dow",
        "hr",
        "n",
        F.row_number()
        .over(w.orderBy(F.desc("n"), "dow", "hr"))
        .alias("rn"),
        F.sum("n").over(w).alias("tot"),
        F.count("*").over(w).alias("n_cells"),
    )
    return (
        rk.where(F.col("rn") == 1)
        .select(
            "event_type",
            F.col("dow").alias("peak_dow"),
            F.col("hr").alias("peak_hour"),
            F.col("n").alias("peak_events"),
            F.round(
                F.col("n").cast("double") * F.col("n_cells")
                / F.col("tot"),
                4,
            ).alias("peak_over_mean"),
        )
        .orderBy("event_type")
    )


# ---- x319: top-10-day revenue dependence per year ----

_X319_SQL = """
WITH d AS (
  SELECT CAST(YEAR(CAST(o_orderdate AS DATE)) AS BIGINT) AS yr,
         CAST(o_orderdate AS DATE) AS day,
         CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) * 100
              AS DECIMAL(19,0)) AS c
  FROM orders GROUP BY yr, day),
rk AS (
  SELECT yr, c,
         ROW_NUMBER() OVER (PARTITION BY yr
                            ORDER BY c DESC, day) AS rn,
         SUM(c) OVER (PARTITION BY yr) AS tot,
         COUNT(*) OVER (PARTITION BY yr) AS n_days
  FROM d)
SELECT yr AS year,
       CAST(MAX(n_days) AS BIGINT) AS n_days,
       ROUND(CAST(SUM(CASE WHEN rn <= 10 THEN c
                           ELSE CAST(0 AS DECIMAL(19,0)) END)
                  AS DOUBLE)
             / CAST(MAX(tot) AS DOUBLE), 6) AS top10day_share
FROM rk
GROUP BY yr
ORDER BY year
"""


@register("x319_peak_day_dependence", oracle=_X319_SQL)
def x319_peak_day_dependence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-10-day revenue dependence: the share of each year's
    revenue earned on its 10 biggest days — an event-driven
    business (Black-Friday-shaped) runs high and must nail those
    days operationally; a steady-state one runs near 10/365.
    Rank pick per year with a day tiebreak over exact decimal
    cents; conditional sum in the same pass.

    Scale: day-grain agg, per-year rank window, years-sized
    output.
    """
    from pyspark.sql import Window

    orders = load_table(spark, sf_dir, "orders")
    d = orders.groupBy(
        F.year(F.col("o_orderdate").cast("date"))
        .cast("bigint")
        .alias("yr"),
        F.col("o_orderdate").cast("date").alias("day"),
    ).agg(
        (F.sum(F.col("o_totalprice").cast("decimal(18,2)")) * 100)
        .cast("decimal(19,0)")
        .alias("c")
    )
    w = Window.partitionBy("yr")
    rk = d.select(
        "yr",
        "c",
        F.row_number()
        .over(w.orderBy(F.desc("c"), "day"))
        .alias("rn"),
        F.sum("c").over(w).alias("tot"),
        F.count("*").over(w).alias("n_days"),
    )
    zero = F.lit(0).cast("decimal(19,0)")
    return (
        rk.groupBy(F.col("yr").alias("year"))
        .agg(
            F.max("n_days").cast("bigint").alias("n_days"),
            F.round(
                F.sum(
                    F.when(F.col("rn") <= 10, F.col("c")).otherwise(
                        zero
                    )
                ).cast("double")
                / F.max("tot").cast("double"),
                6,
            ).alias("top10day_share"),
        )
        .orderBy("year")
    )


# ---- x320: business-continuity gate ----

_X320_SQL = """
WITH q AS (
  SELECT CAST(YEAR(CAST(o_orderdate AS DATE)) AS BIGINT) * 10
           + CAST(QUARTER(CAST(o_orderdate AS DATE)) AS BIGINT)
           AS yq,
         CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) * 100
              AS DECIMAL(19,0)) AS c,
         CAST(COUNT(DISTINCT o_custkey) AS BIGINT) AS n_cust
  FROM orders GROUP BY yq),
med AS (
  SELECT c AS med_c FROM (
    SELECT c, ROW_NUMBER() OVER (ORDER BY c, yq) AS rn,
           COUNT(*) OVER () AS n
    FROM q) r
  WHERE rn = CAST(CEIL(0.50 * n) AS BIGINT)),
checks AS (
  SELECT 'every_quarter_has_revenue' AS check_name,
         CAST(SUM(CASE WHEN c <= 0 THEN 1 ELSE 0 END) AS BIGINT)
           AS n_violations
  FROM q
  UNION ALL
  SELECT 'every_quarter_ge_100_customers',
         CAST(SUM(CASE WHEN n_cust < 100 THEN 1 ELSE 0 END) AS BIGINT)
  FROM q
  UNION ALL
  SELECT 'no_quarter_below_half_median',
         CAST(SUM(CASE WHEN 2 * q.c < m.med_c THEN 1 ELSE 0 END)
              AS BIGINT)
  FROM q CROSS JOIN med m)
SELECT check_name, n_violations, n_violations = 0 AS passed
FROM checks
ORDER BY check_name
"""


@register("x320_continuity_gate", oracle=_X320_SQL)
def x320_continuity_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Business-continuity gate: quarterly invariants a reporting
    pipeline asserts before publishing — every quarter has
    revenue, a floor of active customers, and no quarter below
    HALF the median quarter (the outage/missing-partition test:
    a dropped ingestion month shows up here before anyone reads
    a chart wrong). The x280/x310 gate pattern on the reporting
    axis; the median is rank-exact, the half test integer
    cross-multiplied.

    Scale: quarter-grain agg (~28 rows), rank median, 3-row
    gate output.
    """
    from pyspark.sql import Window

    orders = load_table(spark, sf_dir, "orders")
    q = orders.groupBy(
        (
            F.year(F.col("o_orderdate").cast("date")).cast("bigint")
            * 10
            + F.quarter(F.col("o_orderdate").cast("date")).cast(
                "bigint"
            )
        ).alias("yq")
    ).agg(
        (F.sum(F.col("o_totalprice").cast("decimal(18,2)")) * 100)
        .cast("decimal(19,0)")
        .alias("c"),
        F.countDistinct("o_custkey").cast("bigint").alias("n_cust"),
    )
    r = q.select(
        "c",
        F.row_number().over(Window.orderBy("c", "yq")).alias("rn"),
        F.count("*").over(Window.partitionBy()).alias("n"),
    )
    med = r.where(
        F.col("rn") == F.ceil(0.50 * F.col("n")).cast("bigint")
    ).select(F.col("c").alias("med_c"))

    def leg(name, agg_df):
        return agg_df.select(
            F.lit(name).alias("check_name"),
            F.col("v").cast("bigint").alias("n_violations"),
        )

    c1 = q.agg(
        F.sum(F.when(F.col("c") <= 0, 1).otherwise(0)).alias("v")
    )
    c2 = q.agg(
        F.sum(F.when(F.col("n_cust") < 100, 1).otherwise(0)).alias("v")
    )
    c3 = q.crossJoin(F.broadcast(med)).agg(
        F.sum(
            F.when(2 * F.col("c") < F.col("med_c"), 1).otherwise(0)
        ).alias("v")
    )
    out = (
        leg("every_quarter_has_revenue", c1)
        .unionByName(leg("every_quarter_ge_100_customers", c2))
        .unionByName(leg("no_quarter_below_half_median", c3))
    )
    return out.select(
        "check_name",
        "n_violations",
        (F.col("n_violations") == 0).alias("passed"),
    ).orderBy("check_name")


# ---- x321: brand seasonality concentration ----

_X321_SQL = """
WITH m AS (
  SELECT p.p_brand,
         CAST(MONTH(CAST(o.o_orderdate AS DATE)) AS BIGINT) AS moy,
         CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))
                  * (CAST(1 AS DECIMAL(6,4))
                     - CAST(l.l_discount AS DECIMAL(6,4)))) * 1000000
              AS DECIMAL(19,0)) AS rev_u
  FROM lineitem l
  JOIN orders o ON l.l_orderkey = o.o_orderkey
  JOIN part p ON l.l_partkey = p.p_partkey
  GROUP BY p.p_brand, moy),
agg AS (
  SELECT p_brand,
         CAST(COUNT(*) AS BIGINT) AS n_months,
         SUM(rev_u) AS tot_u,
         SUM(rev_u * rev_u) AS sumsq_u
  FROM m GROUP BY p_brand)
SELECT p_brand, n_months,
       ROUND(CAST(sumsq_u AS DOUBLE)
             / (CAST(tot_u AS DOUBLE) * CAST(tot_u AS DOUBLE)), 6)
         AS month_concentration
FROM agg
ORDER BY month_concentration DESC, p_brand
"""


@register("x321_brand_seasonality", oracle=_X321_SQL)
def x321_brand_seasonality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brand seasonality concentration: the Simpson/HHI of each
    brand's revenue across calendar months (1/12 ≈ 0.083 =
    perfectly steady; higher = the brand LIVES in its season) —
    the per-brand refinement of x201's corpus-wide seasonal
    index, and the inventory-risk flag (seasonal brands strand
    stock when the season misses). Exact micro-unit decimal
    sums of squares; one division per brand.

    Scale: (brand, month) fact agg, brand rollup of decimal
    partials.
    """
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    part = load_table(spark, sf_dir, "part")
    disc = (
        F.col("l_extendedprice").cast("decimal(18,2)")
        * (F.lit(1).cast("decimal(6,4)") - F.col("l_discount").cast("decimal(6,4)"))
    )
    m = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .groupBy(
            "p_brand",
            F.month(F.col("o_orderdate").cast("date"))
            .cast("bigint")
            .alias("moy"),
        )
        .agg(
            (F.sum(disc) * 1000000)
            .cast("decimal(19,0)")
            .alias("rev_u")
        )
    )
    agg = m.groupBy("p_brand").agg(
        F.count("*").cast("bigint").alias("n_months"),
        F.sum("rev_u").alias("tot_u"),
        F.sum(F.col("rev_u") * F.col("rev_u")).alias("sumsq_u"),
    )
    return agg.select(
        "p_brand",
        "n_months",
        F.round(
            F.col("sumsq_u").cast("double")
            / (
                F.col("tot_u").cast("double")
                * F.col("tot_u").cast("double")
            ),
            6,
        ).alias("month_concentration"),
    ).orderBy(F.desc("month_concentration"), "p_brand")


# ---- x322: repeat rate by customer nation ----

_X322_SQL = """
WITH per_cust AS (
  SELECT c.c_nationkey,
         CAST(COUNT(*) AS BIGINT) AS n_orders
  FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
  GROUP BY c.c_nationkey, o.o_custkey)
SELECT n.n_name AS nation,
       CAST(COUNT(*) AS BIGINT) AS n_customers,
       ROUND(CAST(SUM(CASE WHEN pc.n_orders >= 2 THEN 1 ELSE 0 END)
                  AS DOUBLE) / COUNT(*), 6) AS repeat_rate,
       ROUND(CAST(SUM(pc.n_orders) AS DOUBLE) / COUNT(*), 4)
         AS avg_orders
FROM per_cust pc JOIN nation n ON pc.c_nationkey = n.n_nationkey
GROUP BY nation
ORDER BY nation
"""


@register("x322_nation_repeat_rate", oracle=_X322_SQL)
def x322_nation_repeat_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Repeat rate by customer nation: the geographic retention
    map (x277 slices repeat behavior by acquisition TIME; this
    slices it by PLACE) — a nation with high acquisition but low
    repeat has a localization, logistics, or payment problem
    that blended rates hide.

    Integer counts; two ratios per nation.

    Scale: (nation, customer) grain agg, nation rollup with a
    broadcast dim join.
    """
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    nat = load_table(spark, sf_dir, "nation")
    per_cust = (
        orders.join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .groupBy("c_nationkey", "o_custkey")
        .agg(F.count("*").cast("bigint").alias("n_orders"))
    )
    rep = F.sum(F.when(F.col("n_orders") >= 2, 1).otherwise(0))
    return (
        per_cust.join(
            F.broadcast(nat), per_cust.c_nationkey == nat.n_nationkey
        )
        .groupBy(F.col("n_name").alias("nation"))
        .agg(
            F.count("*").cast("bigint").alias("n_customers"),
            F.round(rep.cast("double") / F.count("*"), 6).alias(
                "repeat_rate"
            ),
            F.round(
                F.sum("n_orders").cast("double") / F.count("*"), 4
            ).alias("avg_orders"),
        )
        .orderBy("nation")
    )


# ---- x323: procurement load balance per nation ----

_X323_SQL = """
WITH per_s AS (
  SELECT s.s_nationkey, l.l_suppkey,
         CAST(COUNT(*) AS BIGINT) AS n
  FROM lineitem l JOIN supplier s ON l.l_suppkey = s.s_suppkey
  GROUP BY s.s_nationkey, l.l_suppkey),
m AS (
  SELECT s_nationkey,
         CAST(COUNT(*) AS BIGINT) AS n_sup,
         CAST(SUM(n) AS BIGINT) AS s,
         CAST(SUM(n * n) AS BIGINT) AS ss
  FROM per_s GROUP BY s_nationkey)
SELECT nn.n_name AS nation, m.n_sup AS n_suppliers,
       ((2 * m.s * 10000 + m.n_sup) // (2 * m.n_sup)) / 10000.0
         AS mean_lines,
       ROUND(SQRT((CAST(m.ss AS DOUBLE) - CAST(m.s AS DOUBLE)
                   * CAST(m.s AS DOUBLE) / CAST(m.n_sup AS DOUBLE))
                  / (CAST(m.n_sup AS DOUBLE) - 1))
             / (CAST(m.s AS DOUBLE) / m.n_sup), 6) AS load_cv
FROM m JOIN nation nn ON m.s_nationkey = nn.n_nationkey
ORDER BY load_cv DESC, nation
"""


@register("x323_supplier_load_balance", oracle=_X323_SQL)
def x323_supplier_load_balance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Procurement load balance: coefficient of variation of
    order-line volume across each nation's suppliers — high CV
    means the nation's volume rides a few workhorse vendors
    (capacity risk the single-SOURCE view x189 can't see, because
    here every part may have backups yet the VOLUME still
    concentrates). Integer line-count moments per supplier; the
    @4 mean uses the exact integer half-up form (r11
    --solvable-at screen, q34 class); s > 0.

    Scale: (nation, supplier) agg, 25-row moment rollup,
    broadcast dim join.
    """
    li = load_table(spark, sf_dir, "lineitem")
    sup = load_table(spark, sf_dir, "supplier")
    nat = load_table(spark, sf_dir, "nation")
    per_s = (
        li.join(F.broadcast(sup), li.l_suppkey == sup.s_suppkey)
        .groupBy("s_nationkey", "l_suppkey")
        .agg(F.count("*").cast("bigint").alias("n"))
    )
    m = per_s.groupBy("s_nationkey").agg(
        F.count("*").cast("bigint").alias("n_sup"),
        F.sum("n").cast("bigint").alias("s"),
        F.sum(F.col("n") * F.col("n")).cast("bigint").alias("ss"),
    )
    d = lambda c: F.col(c).cast("double")  # noqa: E731
    cv = F.sqrt(
        (d("ss") - d("s") * d("s") / d("n_sup")) / (d("n_sup") - 1)
    ) / (d("s") / F.col("n_sup"))
    return (
        m.join(F.broadcast(nat), m.s_nationkey == nat.n_nationkey)
        .select(
            F.col("n_name").alias("nation"),
            F.col("n_sup").alias("n_suppliers"),
            (
                F.expr("(2 * s * 10000 + n_sup) div (2 * n_sup)").cast(
                    "double"
                )
                / 10000
            ).alias("mean_lines"),
            F.round(cv, 6).alias("load_cv"),
        )
        .orderBy(F.desc("load_cv"), "nation")
    )


# ---- x324: language token-budget planner ----

_X324_BUDGET = 100_000  # tokens per language target, literal

_X324_SQL = f"""
WITH t AS (
  SELECT lang,
         CAST(SUM(LEN(STRING_SPLIT(text, ' '))) AS BIGINT) AS n_tokens,
         CAST(COUNT(*) AS BIGINT) AS n_docs
  FROM documents GROUP BY lang)
SELECT lang, n_docs, n_tokens,
       ROUND(CAST({_X324_BUDGET} AS DOUBLE) / n_tokens, 4)
         AS epochs_needed,
       20 * n_tokens >= {_X324_BUDGET} AS single_epoch_within_20x
FROM t
ORDER BY lang
"""


@register("x324_token_budget_planner", oracle=_X324_SQL)
def x324_token_budget_planner(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Language token-budget planner: per language, the epochs of
    its corpus needed to fill a {b:,}-token training allocation —
    epochs ≫ 1 flag languages that will be memorized (repeat-
    epoch risk the data-mixing literature caps around 4); the
    boolean gate (integer cross-multiplied, within 20x) marks
    languages viable at all. x83's temperature mixing decides
    WANTS; this checks HAVES.

    Scale: one token-count aggregate per language.
    """
    docs = load_table(spark, sf_dir, "documents")
    t = docs.groupBy("lang").agg(
        F.sum(F.size(F.split(F.col("text"), " ")))
        .cast("bigint")
        .alias("n_tokens"),
        F.count("*").cast("bigint").alias("n_docs"),
    )
    return t.select(
        "lang",
        "n_docs",
        "n_tokens",
        F.round(
            F.lit(float(_X324_BUDGET)) / F.col("n_tokens"), 4
        ).alias("epochs_needed"),
        (20 * F.col("n_tokens") >= _X324_BUDGET).alias(
            "single_epoch_within_20x"
        ),
    ).orderBy("lang")


x324_token_budget_planner.__doc__ = (
    x324_token_budget_planner.__doc__.format(b=_X324_BUDGET)
)


# ---- x325: week-over-week retention curve ----

_X325_SQL = """
WITH wu AS (
  SELECT DISTINCT CAST(DATE_TRUNC('week', CAST(ts AS DATE)) AS DATE)
           AS week, user_id
  FROM events),
pair AS (
  SELECT a.week,
         CAST(COUNT(*) AS BIGINT) AS wau,
         CAST(SUM(CASE WHEN b.user_id IS NOT NULL THEN 1 ELSE 0 END)
              AS BIGINT) AS retained_next
  FROM wu a
  LEFT JOIN wu b ON b.user_id = a.user_id
                AND b.week = a.week + INTERVAL 7 DAY
  GROUP BY a.week),
mx AS (SELECT MAX(week) AS last_week FROM wu)
SELECT p.week, p.wau, p.retained_next,
       ROUND(CAST(p.retained_next AS DOUBLE) / p.wau, 6)
         AS wow_retention
FROM pair p CROSS JOIN mx
WHERE p.week < mx.last_week
ORDER BY p.week
"""


@register("x325_wow_retention", oracle=_X325_SQL)
def x325_wow_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Week-over-week retention curve: the share of each week's
    active users who return the NEXT week — the tightest-loop
    retention number (x101's monthly cohorts smooth over exactly
    the week-to-week wobble a bad release causes). The final
    (right-censored) week is excluded rather than reported as
    fake churn. Self-join on (user, week+7d) over the distinct
    weekly-active set.

    Integer set counts; one ratio per week.

    Scale: distinct (week, user) table, a user-keyed shifted
    self-join (both sides week-bounded), weeks-sized output.
    """
    ev = load_table(spark, sf_dir, "events")
    wu = ev.select(
        F.date_trunc("week", F.col("ts").cast("date"))
        .cast("date")
        .alias("week"),
        "user_id",
    ).distinct()
    b = wu.select(
        F.col("week").alias("week_b"),
        F.col("user_id").alias("user_b"),
    )
    pair = (
        wu.join(
            b,
            (F.col("user_b") == F.col("user_id"))
            & (F.col("week_b") == F.date_add(F.col("week"), 7)),
            "left",
        )
        .groupBy("week")
        .agg(
            F.count("*").cast("bigint").alias("wau"),
            F.sum(
                F.when(F.col("user_b").isNotNull(), 1).otherwise(0)
            )
            .cast("bigint")
            .alias("retained_next"),
        )
    )
    mx = wu.agg(F.max("week").alias("last_week"))
    return (
        pair.crossJoin(F.broadcast(mx))
        .where(F.col("week") < F.col("last_week"))
        .select(
            "week",
            "wau",
            "retained_next",
            F.round(
                F.col("retained_next").cast("double") / F.col("wau"), 6
            ).alias("wow_retention"),
        )
        .orderBy("week")
    )


# ---- x326: hourly error-rate profile ----

_X326_SQL = """
WITH h AS (
  SELECT CAST(HOUR(ts) AS BIGINT) AS hr,
         CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END)
              AS BIGINT) AS e
  FROM events GROUP BY hr),
t AS (SELECT CAST(SUM(n) AS BIGINT) AS tn, CAST(SUM(e) AS BIGINT) AS te
      FROM h)
SELECT h.hr AS hour_of_day, h.n AS n_events, h.e AS n_errors,
       ROUND(CAST(h.e AS DOUBLE) / h.n, 6) AS error_rate,
       ROUND((CAST(h.e AS DOUBLE) / h.n)
             / (CAST(t.te AS DOUBLE) / t.tn), 4) AS rate_index
FROM h CROSS JOIN t
ORDER BY hour_of_day
"""


@register("x326_hourly_error_profile", oracle=_X326_SQL)
def x326_hourly_error_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hourly error-rate profile: error share by hour of day,
    indexed against the overall rate — an index spiking in one
    hour band points at cron jobs, deploy windows, or a
    dependency's nightly maintenance (x318 finds where VOLUME
    peaks; this finds where QUALITY dips, which is rarely the
    same cell).

    Integer counts; rate and index are fixed double expressions.

    Scale: 24-key agg + 1-row total broadcast.
    """
    ev = load_table(spark, sf_dir, "events")
    h = ev.groupBy(F.hour("ts").cast("bigint").alias("hr")).agg(
        F.count("*").cast("bigint").alias("n"),
        F.sum(
            F.when(F.col("event_type") == "error", 1).otherwise(0)
        )
        .cast("bigint")
        .alias("e"),
    )
    t = h.agg(
        F.sum("n").cast("bigint").alias("tn"),
        F.sum("e").cast("bigint").alias("te"),
    )
    rate = F.col("e").cast("double") / F.col("n")
    overall = F.col("te").cast("double") / F.col("tn")
    return (
        h.crossJoin(F.broadcast(t))
        .select(
            F.col("hr").alias("hour_of_day"),
            F.col("n").alias("n_events"),
            F.col("e").alias("n_errors"),
            F.round(rate, 6).alias("error_rate"),
            F.round(rate / overall, 4).alias("rate_index"),
        )
        .orderBy("hour_of_day")
    )


# ---- x327: catalog velocity (monthly active-SKU share) ----

_X327_SQL = """
WITH m AS (
  SELECT STRFTIME(DATE_TRUNC('month', CAST(l_shipdate AS DATE)),
                  '%Y-%m') AS month,
         CAST(COUNT(DISTINCT l_partkey) AS BIGINT) AS active_parts
  FROM lineitem GROUP BY month),
cat AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_catalog FROM part)
SELECT m.month, m.active_parts, c.n_catalog,
       ROUND(CAST(m.active_parts AS DOUBLE) / c.n_catalog, 6)
         AS active_share
FROM m CROSS JOIN cat c
ORDER BY m.month
"""


@register("x327_catalog_velocity", oracle=_X327_SQL)
def x327_catalog_velocity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Catalog velocity: the share of the part catalog that ships
    at least once each month — the assortment's monthly pulse
    between x256's all-time activation and x292's trailing-year
    dead-stock scan; a declining line with a stable catalog means
    the long tail is going colder.

    Integer distinct counts; one share per month.

    Scale: (month, part) distinct agg with partial distinct,
    1-row catalog broadcast.
    """
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    m = li.groupBy(
        F.date_format(
            F.date_trunc("month", F.col("l_shipdate").cast("date")),
            "yyyy-MM",
        ).alias("month")
    ).agg(
        F.countDistinct("l_partkey").cast("bigint").alias("active_parts")
    )
    cat = part.agg(F.count("*").cast("bigint").alias("n_catalog"))
    return (
        m.crossJoin(F.broadcast(cat))
        .select(
            "month",
            "active_parts",
            "n_catalog",
            F.round(
                F.col("active_parts").cast("double")
                / F.col("n_catalog"),
                6,
            ).alias("active_share"),
        )
        .orderBy("month")
    )


# ---- x328: user-decile value concentration ----

_X328_SQL = """
WITH uv AS (
  SELECT user_id,
         CAST(SUM(CAST(value AS DECIMAL(18,6)) * 1000000)
              AS DECIMAL(38,0)) AS v_u
  FROM events GROUP BY user_id),
d AS (
  SELECT v_u,
         NTILE(10) OVER (ORDER BY v_u, user_id) AS decile
  FROM uv),
t AS (SELECT SUM(v_u) AS tot FROM uv)
SELECT CAST(d.decile AS BIGINT) AS value_decile,
       CAST(COUNT(*) AS BIGINT) AS n_users,
       ROUND(CAST(SUM(d.v_u) AS DOUBLE) / CAST(t.tot AS DOUBLE), 6)
         AS value_share
FROM d CROSS JOIN t
GROUP BY d.decile, t.tot
ORDER BY value_decile
"""


@register("x328_user_value_deciles", oracle=_X328_SQL)
def x328_user_value_deciles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """User-decile value concentration: total event value by user
    decile (users NTILE-ranked by their own value) — the decile
    table behind x303's single Gini number, and the
    activity-side sibling of x170's part-price deciles; the top
    decile's share is the number monetization plans are built
    around. Exact micro-unit decimal sums; decile assignment
    tiebreaks on user_id.

    Scale: per-user value agg, one NTILE sort over users, 10-row
    rollup.
    """
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events")
    uv = ev.groupBy("user_id").agg(
        (F.sum(F.col("value").cast("decimal(18,6)")) * 1000000)
        .cast("decimal(38,0)")
        .alias("v_u")
    )
    d = uv.select(
        "v_u",
        F.ntile(10)
        .over(Window.orderBy("v_u", "user_id"))
        .alias("decile"),
    )
    t = uv.agg(F.sum("v_u").alias("tot"))
    return (
        d.crossJoin(F.broadcast(t))
        .groupBy(F.col("decile").cast("bigint").alias("value_decile"))
        .agg(
            F.count("*").cast("bigint").alias("n_users"),
            F.round(
                F.sum("v_u").cast("double")
                / F.max("tot").cast("double"),
                6,
            ).alias("value_share"),
        )
        .orderBy("value_decile")
    )


# ---- x329: weekend order-value gap ----

_X329_SQL = """
WITH d AS (
  SELECT CASE WHEN DAYOFWEEK(CAST(o_orderdate AS DATE)) IN (0, 6)
              THEN 'weekend' ELSE 'weekday' END AS daypart,
         CAST(o_totalprice AS DECIMAL(18,2)) AS price
  FROM orders)
SELECT daypart,
       CAST(COUNT(*) AS BIGINT) AS n_orders,
       ROUND(CAST(SUM(price) AS DOUBLE) / COUNT(*), 2) AS aov
FROM d
GROUP BY daypart
ORDER BY daypart
"""


@register("x329_weekend_aov_gap", oracle=_X329_SQL)
def x329_weekend_aov_gap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekend order-value gap: AOV on weekends vs weekdays —
    x219 tests whether weekend DAILY REVENUE differs (volume x
    value); this isolates the value side (couch browsing buys
    smaller? procurement desks close?), so the two together
    attribute any weekend effect to traffic or basket size.

    Exact decimal sums; one mean per daypart.

    Scale: narrow map + 2-key rollup.
    """
    orders = load_table(spark, sf_dir, "orders")
    d = orders.select(
        F.when(
            F.dayofweek(F.col("o_orderdate").cast("date")).isin(1, 7),
            "weekend",
        )
        .otherwise("weekday")
        .alias("daypart"),
        F.col("o_totalprice").cast("decimal(18,2)").alias("price"),
    )
    return (
        d.groupBy("daypart")
        .agg(
            F.count("*").cast("bigint").alias("n_orders"),
            F.round(
                F.sum("price").cast("double") / F.count("*"), 2
            ).alias("aov"),
        )
        .orderBy("daypart")
    )


# ---- x330: ROLLUP self-consistency audit ----

_X330_SQL = """
WITH r AS (
  SELECT CASE WHEN GROUPING(n.n_name) = 1 THEN 'zz_grand_total'
              ELSE n.n_name END AS nation,
         CAST(GROUPING(n.n_name) AS BIGINT) AS is_total,
         SUM(CAST(o.o_totalprice AS DECIMAL(18,2))) AS rev,
         CAST(COUNT(*) AS BIGINT) AS n_orders
  FROM orders o
  JOIN customer c ON o.o_custkey = c.c_custkey
  JOIN nation n ON c.c_nationkey = n.n_nationkey
  GROUP BY ROLLUP(n.n_name)),
detail AS (
  SELECT SUM(rev) AS s, CAST(SUM(n_orders) AS BIGINT) AS c
  FROM r WHERE is_total = 0),
total AS (
  SELECT rev AS s, n_orders AS c FROM r WHERE is_total = 1)
SELECT CAST((SELECT COUNT(*) FROM r WHERE is_total = 0) AS BIGINT)
         AS n_detail_rows,
       ROUND(CAST(t.s AS DOUBLE), 2) AS grand_total_revenue,
       t.c AS grand_total_orders,
       t.s = d.s AND t.c = d.c AS rollup_consistent
FROM total t CROSS JOIN detail d
"""


@register("x330_rollup_consistency", oracle=_X330_SQL)
def x330_rollup_consistency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP self-consistency audit: the engine computes a
    nation-level ROLLUP, then VERIFIES that the grand-total row
    equals the sum of its own detail rows — exactly the invariant
    a metrics layer must hold for drill-downs to reconcile with
    headlines, and it holds EXACTLY here because revenue is
    summed in exact decimals on both paths (float rollups fail
    this test by ulps, which is how dashboard footnotes are
    born). Uses GROUPING() to separate levels.

    Scale: one ROLLUP aggregate; the consistency check runs on
    the 26-row result.
    """
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    nat = load_table(spark, sf_dir, "nation")
    base = (
        orders.join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nat), cust.c_nationkey == nat.n_nationkey)
    )
    r = base.rollup("n_name").agg(
        F.sum(F.col("o_totalprice").cast("decimal(18,2)")).alias("rev"),
        F.count("*").cast("bigint").alias("n_orders"),
        F.grouping("n_name").cast("bigint").alias("is_total"),
    )
    detail = r.where(F.col("is_total") == 0).agg(
        F.sum("rev").alias("ds"),
        F.sum("n_orders").cast("bigint").alias("dc"),
        F.count("*").cast("bigint").alias("n_detail_rows"),
    )
    total = r.where(F.col("is_total") == 1).select(
        F.col("rev").alias("ts"), F.col("n_orders").alias("tc")
    )
    return total.crossJoin(F.broadcast(detail)).select(
        "n_detail_rows",
        F.round(F.col("ts").cast("double"), 2).alias(
            "grand_total_revenue"
        ),
        F.col("tc").alias("grand_total_orders"),
        (
            (F.col("ts") == F.col("ds")) & (F.col("tc") == F.col("dc"))
        ).alias("rollup_consistent"),
    )


# ---- x331: customer 2x2 growth map (frequency x value momentum) ----

_X331_SQL = """
WITH seq AS (
  SELECT o_custkey,
         ROW_NUMBER() OVER (PARTITION BY o_custkey
                            ORDER BY o_orderdate, o_orderkey) AS i,
         CAST(COUNT(*) OVER (PARTITION BY o_custkey) AS BIGINT) AS n,
         CAST(ROUND(o_totalprice * 100) AS BIGINT) AS v,
         CAST(DATEDIFF('day', LAG(CAST(o_orderdate AS DATE))
                 OVER (PARTITION BY o_custkey
                       ORDER BY o_orderdate, o_orderkey),
               CAST(o_orderdate AS DATE)) AS BIGINT) AS gap_d
  FROM orders),
mv AS (
  SELECT o_custkey,
         CAST(MAX(n) AS BIGINT) AS n,
         CAST(SUM(i) AS BIGINT) AS si,
         CAST(SUM(v) AS BIGINT) AS sv,
         CAST(SUM(i * v) AS BIGINT) AS siv,
         CAST(SUM(CASE WHEN gap_d IS NOT NULL AND 2 * (i - 1) <= n - 1
                       THEN gap_d ELSE 0 END) AS BIGINT) AS g1,
         CAST(SUM(CASE WHEN gap_d IS NOT NULL AND 2 * (i - 1) <= n - 1
                       THEN 1 ELSE 0 END) AS BIGINT) AS c1,
         CAST(SUM(CASE WHEN gap_d IS NOT NULL AND 2 * (i - 1) > n - 1
                       THEN gap_d ELSE 0 END) AS BIGINT) AS g2,
         CAST(SUM(CASE WHEN gap_d IS NOT NULL AND 2 * (i - 1) > n - 1
                       THEN 1 ELSE 0 END) AS BIGINT) AS c2
  FROM seq GROUP BY o_custkey
  HAVING MAX(n) >= 5),
cls AS (
  SELECT CASE WHEN n * siv > si * sv THEN 'value_up'
              ELSE 'value_down_flat' END AS value_axis,
         CASE WHEN c1 > 0 AND c2 > 0 AND g2 * c1 < g1 * c2
              THEN 'freq_up' ELSE 'freq_down_flat' END AS freq_axis
  FROM mv),
t AS (SELECT CAST(COUNT(*) AS BIGINT) AS nt FROM cls)
SELECT value_axis, freq_axis,
       CAST(COUNT(*) AS BIGINT) AS n_customers,
       ROUND(CAST(COUNT(*) AS DOUBLE) / (SELECT nt FROM t), 6)
         AS customer_share
FROM cls
GROUP BY value_axis, freq_axis
ORDER BY value_axis, freq_axis
"""


@register("x331_growth_map_2x2", oracle=_X331_SQL)
def x331_growth_map_2x2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customer growth 2x2: value momentum (x202's slope sign)
    crossed with frequency momentum (x205's gap-half compare) for
    customers with ≥5 orders — the four-quadrant map account
    teams actually work from (value_up+freq_up = expand;
    value_down+freq_down = rescue; the off-diagonals are pricing
    vs engagement plays). Both axes are pure integer
    cross-multiplications; no float touches the classification.

    Scale: one custkey window (rank + lag share the sort),
    per-customer integer moments, 4-cell census.
    """
    from pyspark.sql import Window

    orders = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        "o_orderdate", "o_orderkey"
    )
    seq = orders.select(
        "o_custkey",
        F.row_number().over(w).alias("i"),
        F.count("*")
        .over(Window.partitionBy("o_custkey"))
        .cast("bigint")
        .alias("n"),
        F.round(F.col("o_totalprice") * 100).cast("bigint").alias("v"),
        F.datediff(
            F.col("o_orderdate").cast("date"),
            F.lag(F.col("o_orderdate").cast("date")).over(w),
        )
        .cast("bigint")
        .alias("gap_d"),
    )
    first_half = (F.col("gap_d").isNotNull()) & (
        2 * (F.col("i") - 1) <= F.col("n") - 1
    )
    second_half = (F.col("gap_d").isNotNull()) & (
        2 * (F.col("i") - 1) > F.col("n") - 1
    )
    mv = (
        seq.groupBy("o_custkey")
        .agg(
            F.max("n").cast("bigint").alias("n"),
            F.sum("i").cast("bigint").alias("si"),
            F.sum("v").cast("bigint").alias("sv"),
            F.sum(F.col("i") * F.col("v")).cast("bigint").alias("siv"),
            F.sum(F.when(first_half, F.col("gap_d")).otherwise(0))
            .cast("bigint")
            .alias("g1"),
            F.sum(F.when(first_half, 1).otherwise(0))
            .cast("bigint")
            .alias("c1"),
            F.sum(F.when(second_half, F.col("gap_d")).otherwise(0))
            .cast("bigint")
            .alias("g2"),
            F.sum(F.when(second_half, 1).otherwise(0))
            .cast("bigint")
            .alias("c2"),
        )
        .where(F.col("n") >= 5)
    )
    cls = mv.select(
        F.when(
            F.col("n") * F.col("siv") > F.col("si") * F.col("sv"),
            "value_up",
        )
        .otherwise("value_down_flat")
        .alias("value_axis"),
        F.when(
            (F.col("c1") > 0)
            & (F.col("c2") > 0)
            & (F.col("g2") * F.col("c1") < F.col("g1") * F.col("c2")),
            "freq_up",
        )
        .otherwise("freq_down_flat")
        .alias("freq_axis"),
    )
    t = cls.agg(F.count("*").cast("bigint").alias("nt"))
    return (
        cls.groupBy("value_axis", "freq_axis")
        .agg(F.count("*").cast("bigint").alias("n_customers"))
        .crossJoin(F.broadcast(t))
        .select(
            "value_axis",
            "freq_axis",
            "n_customers",
            F.round(
                F.col("n_customers").cast("double") / F.col("nt"), 6
            ).alias("customer_share"),
        )
        .orderBy("value_axis", "freq_axis")
    )


# ---- x332: part cannibalization within brand ----

_X332_SQL = """
WITH yearly AS (
  SELECT p.p_brand, l.l_partkey,
         CAST(MIN(YEAR(CAST(l.l_shipdate AS DATE)))
              OVER (PARTITION BY l.l_partkey) AS BIGINT) AS launch_yr,
         CAST(YEAR(CAST(l.l_shipdate AS DATE)) AS BIGINT) AS yr,
         CAST(l.l_quantity AS BIGINT) AS q
  FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey),
brand_y AS (
  SELECT p_brand, yr,
         CAST(SUM(q) AS BIGINT) AS total_q,
         CAST(SUM(CASE WHEN launch_yr = yr THEN q ELSE 0 END)
              AS BIGINT) AS newpart_q
  FROM yearly GROUP BY p_brand, yr),
agg AS (
  SELECT p_brand,
         CAST(SUM(newpart_q) AS BIGINT) AS new_q,
         CAST(SUM(total_q) AS BIGINT) AS tot_q
  FROM brand_y WHERE yr > (SELECT MIN(yr) FROM brand_y)
  GROUP BY p_brand)
SELECT p_brand, new_q AS newpart_units, tot_q AS total_units,
       ROUND(CAST(new_q AS DOUBLE) / tot_q, 6) AS newpart_unit_share
FROM agg
ORDER BY p_brand
"""


@register("x332_newpart_dependence", oracle=_X332_SQL)
def x332_newpart_dependence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """New-part dependence: the share of each brand's unit volume
    (after the first observed year, which is all 'new' by
    construction) that comes from parts IN their launch year —
    high shares mean the brand lives on novelty (fashion
    dynamics: miss one launch season and volume collapses); low
    shares mean an evergreen catalog. Launch years via a window
    MIN per part riding the same scan.

    Integer unit sums; one share per brand.

    Scale: one fact scan with a partkey window, (brand, year)
    rollup, brand-sized output.
    """
    from pyspark.sql import Window

    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    yearly = (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .select(
            "p_brand",
            "l_partkey",
            F.year(F.col("l_shipdate").cast("date"))
            .cast("bigint")
            .alias("yr"),
            F.col("l_quantity").cast("bigint").alias("q"),
        )
        .withColumn(
            "launch_yr",
            F.min("yr").over(Window.partitionBy("l_partkey")),
        )
    )
    brand_y = yearly.groupBy("p_brand", "yr").agg(
        F.sum("q").cast("bigint").alias("total_q"),
        F.sum(
            F.when(F.col("launch_yr") == F.col("yr"), F.col("q"))
            .otherwise(0)
        )
        .cast("bigint")
        .alias("newpart_q"),
    )
    min_yr = brand_y.agg(F.min("yr").alias("m"))
    agg = (
        brand_y.crossJoin(F.broadcast(min_yr))
        .where(F.col("yr") > F.col("m"))
        .groupBy("p_brand")
        .agg(
            F.sum("newpart_q").cast("bigint").alias("new_q"),
            F.sum("total_q").cast("bigint").alias("tot_q"),
        )
    )
    return agg.select(
        "p_brand",
        F.col("new_q").alias("newpart_units"),
        F.col("tot_q").alias("total_units"),
        F.round(
            F.col("new_q").cast("double") / F.col("tot_q"), 6
        ).alias("newpart_unit_share"),
    ).orderBy("p_brand")


# ---- x333: weekday-effect strength by region ----

_X333_SQL = """
WITH daily AS (
  SELECT r.r_name AS region,
         CAST(o.o_orderdate AS DATE) AS d,
         CAST(DAYOFWEEK(CAST(o.o_orderdate AS DATE)) + 1 AS BIGINT)
           AS dow,
         CAST(SUM(CAST(o.o_totalprice AS DECIMAL(18,2))) * 100
              AS DECIMAL(19,0)) AS c
  FROM orders o
  JOIN customer cu ON o.o_custkey = cu.c_custkey
  JOIN nation n ON cu.c_nationkey = n.n_nationkey
  JOIN region r ON n.n_regionkey = r.r_regionkey
  GROUP BY region, d, dow),
per_g AS (
  SELECT region, dow, CAST(COUNT(*) AS BIGINT) AS n_w,
         SUM(c) AS s_w, SUM(c * c) AS ss_w
  FROM daily GROUP BY region, dow),
tot AS (
  SELECT region,
         CAST(SUM(n_w) AS BIGINT) AS n,
         SUM(s_w) AS s, SUM(ss_w) AS ss,
         LIST_REDUCE(
           LIST((CAST(s_w AS DOUBLE) / n_w) * CAST(s_w AS DOUBLE)
                ORDER BY dow),
           (x, y) -> x + y) AS explained_raw
  FROM per_g GROUP BY region)
SELECT region, n AS n_region_days,
       ROUND((explained_raw
              - CAST(s AS DOUBLE) * CAST(s AS DOUBLE)
                / CAST(n AS DOUBLE))
             / (CAST(ss AS DOUBLE)
                - CAST(s AS DOUBLE) * CAST(s AS DOUBLE)
                  / CAST(n AS DOUBLE)), 6) AS eta_squared
FROM tot
ORDER BY region
"""


@register("x333_regional_weekday_effect", oracle=_X333_SQL)
def x333_regional_weekday_effect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekday-effect strength by region: x196's ANOVA eta-squared
    computed per customer region — different regions weekending
    differently (work-week conventions, B2B vs B2C mixes) show up
    as divergent eta², and a global weekday playbook (x123) is
    wrong wherever this table disagrees with the corpus row.
    Per-region (region, d, dow) exact-cent moments; the 7
    per-weekday mean products fold in explicit dow order WITHIN
    each region group (the x196 rule, now keyed).

    Scale: day-grain agg per region, 7-row-per-region rollup,
    regions-sized output.
    """
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    nat = load_table(spark, sf_dir, "nation")
    reg = load_table(spark, sf_dir, "region")
    daily = (
        orders.join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nat), cust.c_nationkey == nat.n_nationkey)
        .join(F.broadcast(reg), nat.n_regionkey == reg.r_regionkey)
        .groupBy(
            F.col("r_name").alias("region"),
            F.col("o_orderdate").cast("date").alias("d"),
            F.dayofweek(F.col("o_orderdate").cast("date"))
            .cast("bigint")
            .alias("dow"),
        )
        .agg(
            (F.sum(F.col("o_totalprice").cast("decimal(18,2)")) * 100)
            .cast("decimal(19,0)")
            .alias("c")
        )
    )
    per_g = daily.groupBy("region", "dow").agg(
        F.count("*").cast("bigint").alias("n_w"),
        F.sum("c").alias("s_w"),
        F.sum(F.col("c") * F.col("c")).alias("ss_w"),
    )
    tot = per_g.groupBy("region").agg(
        F.sum("n_w").cast("bigint").alias("n"),
        F.sum("s_w").alias("s"),
        F.sum("ss_w").alias("ss"),
        F.aggregate(
            F.transform(
                F.array_sort(
                    F.collect_list(
                        F.struct(
                            "dow",
                            (
                                (
                                    F.col("s_w").cast("double")
                                    / F.col("n_w")
                                )
                                * F.col("s_w").cast("double")
                            ).alias("v"),
                        )
                    )
                ),
                lambda st: st["v"],
            ),
            F.lit(0.0),
            lambda acc, x: acc + x,
        ).alias("explained_raw"),
    )
    d = lambda c: F.col(c).cast("double")  # noqa: E731
    grand = d("s") * d("s") / d("n")
    return tot.select(
        "region",
        F.col("n").alias("n_region_days"),
        F.round(
            (F.col("explained_raw") - grand) / (d("ss") - grand), 6
        ).alias("eta_squared"),
    ).orderBy("region")


# ---- x334: pent-up demand test ----

_X334_SQL = """
WITH seq AS (
  SELECT CAST(DATEDIFF('day', LAG(CAST(o_orderdate AS DATE))
                OVER (PARTITION BY o_custkey
                      ORDER BY o_orderdate, o_orderkey),
              CAST(o_orderdate AS DATE)) AS BIGINT) AS x,
         CAST(ROUND(o_totalprice * 100) AS BIGINT) AS y
  FROM orders),
p AS (SELECT x, y FROM seq WHERE x IS NOT NULL),
s AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(x) AS BIGINT) AS sx,
         SUM(CAST(y AS DECIMAL(19,0))) AS sy,
         SUM(CAST(x AS DECIMAL(19,0)) * y) AS sxy,
         CAST(SUM(x * x) AS BIGINT) AS sxx,
         SUM(CAST(y AS DECIMAL(19,0)) * y) AS syy
  FROM p)
SELECT n AS n_gaps,
       ((2 * sx * 10000 + n) // (2 * n)) / 10000.0 AS mean_gap_d,
       ROUND(
         (CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE)
                                / CAST(n AS DOUBLE))
         / (SQRT(CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE)
                 * CAST(sx AS DOUBLE) / CAST(n AS DOUBLE))
            * SQRT(CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE)
                   * CAST(sy AS DOUBLE) / CAST(n AS DOUBLE))),
         6) AS gap_value_corr
FROM s
"""


@register("x334_pentup_demand", oracle=_X334_SQL)
def x334_pentup_demand(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pent-up demand test: correlation between the gap since a
    customer's previous order and the VALUE of the order that
    ended the gap — positive means long absences come back as
    stock-up baskets (win-back emails should sell bundles);
    zero means absence is just absence and x296's hazard timing
    is all that matters. Integer day gaps x integer cents, with
    the cross-products in DECIMAL(19,0)-widened sums. The @4 mean
    uses the exact integer half-up form (r11 --solvable-at
    screen, q34 class); gaps ≥ 0 so sx ≥ 0.

    Scale: one custkey lag window, 1-row moment reduce.
    """
    from pyspark.sql import Window

    orders = load_table(spark, sf_dir, "orders")
    seq = orders.select(
        F.datediff(
            F.col("o_orderdate").cast("date"),
            F.lag(F.col("o_orderdate").cast("date")).over(
                Window.partitionBy("o_custkey").orderBy(
                    "o_orderdate", "o_orderkey"
                )
            ),
        )
        .cast("bigint")
        .alias("x"),
        F.round(F.col("o_totalprice") * 100).cast("bigint").alias("y"),
    ).where(F.col("x").isNotNull())
    s = seq.agg(
        F.count("*").cast("bigint").alias("n"),
        F.sum("x").cast("bigint").alias("sx"),
        F.sum(F.col("y").cast("decimal(19,0)")).alias("sy"),
        F.sum(F.col("x").cast("decimal(19,0)") * F.col("y")).alias(
            "sxy"
        ),
        F.sum(F.col("x") * F.col("x")).cast("bigint").alias("sxx"),
        F.sum(F.col("y").cast("decimal(19,0)") * F.col("y")).alias(
            "syy"
        ),
    )
    d = lambda c: F.col(c).cast("double")  # noqa: E731
    r = (d("sxy") - d("sx") * d("sy") / d("n")) / (
        F.sqrt(d("sxx") - d("sx") * d("sx") / d("n"))
        * F.sqrt(d("syy") - d("sy") * d("sy") / d("n"))
    )
    return s.select(
        F.col("n").alias("n_gaps"),
        (
            F.expr("(2 * sx * 10000 + n) div (2 * n)").cast("double")
            / 10000
        ).alias("mean_gap_d"),
        F.round(r, 6).alias("gap_value_corr"),
    )


# ---- x335: source language diversity ----

_X335_SQL = """
WITH c AS (
  SELECT source, lang, CAST(COUNT(*) AS BIGINT) AS k
  FROM documents GROUP BY source, lang),
s AS (
  SELECT source,
         CAST(COUNT(*) AS BIGINT) AS n_langs,
         CAST(SUM(k) AS BIGINT) AS t,
         CAST(SUM(k * k) AS BIGINT) AS skk
  FROM c GROUP BY source)
SELECT source, n_langs,
       ROUND(1 - CAST(skk AS DOUBLE)
                 / (CAST(t AS DOUBLE) * CAST(t AS DOUBLE)), 6)
         AS lang_diversity
FROM s
ORDER BY source
"""


@register("x335_source_lang_diversity", oracle=_X335_SQL)
def x335_source_lang_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Source language diversity: Gini-Simpson index of each
    source's language mix (0 = monolingual, rising with balanced
    multilingualism) — the one-number summary of x265's cell
    table that routes sources to per-language processing
    (monolingual sources skip lang-ID entirely; x210's
    no-logarithm diversity machinery on corpus dims).

    Integer doc counts; one expression per source.

    Scale: (source, lang) agg, source rollup.
    """
    docs = load_table(spark, sf_dir, "documents")
    c = docs.groupBy("source", "lang").agg(
        F.count("*").cast("bigint").alias("k")
    )
    s = c.groupBy("source").agg(
        F.count("*").cast("bigint").alias("n_langs"),
        F.sum("k").cast("bigint").alias("t"),
        F.sum(F.col("k") * F.col("k")).cast("bigint").alias("skk"),
    )
    return s.select(
        "source",
        "n_langs",
        F.round(
            1
            - F.col("skk").cast("double")
            / (F.col("t").cast("double") * F.col("t").cast("double")),
            6,
        ).alias("lang_diversity"),
    ).orderBy("source")


# ---- x336: event-calendar coverage audit ----

_X336_SQL = """
WITH span AS (
  SELECT MIN(CAST(ts AS DATE)) AS d0, MAX(CAST(ts AS DATE)) AS d1,
         CAST(COUNT(DISTINCT CAST(ts AS DATE)) AS BIGINT)
           AS n_active_days
  FROM events)
SELECT d0 AS first_day, d1 AS last_day,
       CAST(DATEDIFF('day', d0, d1) + 1 AS BIGINT) AS n_calendar_days,
       n_active_days,
       CAST(DATEDIFF('day', d0, d1) + 1 - n_active_days AS BIGINT)
         AS n_silent_days,
       CAST(DATEDIFF('day', d0, d1) + 1 = n_active_days AS BOOLEAN)
         AS fully_covered
FROM span
"""


@register("x336_calendar_coverage", oracle=_X336_SQL)
def x336_calendar_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Event-calendar coverage audit: calendar days between the
    first and last event vs days that actually have events — any
    silent day inside the span is a collection outage (real
    traffic has no zero days at this volume), the time-axis
    sibling of x243's id-gap audit and the first check to run
    when x113 flags anomalies (is the anomaly missing DATA or
    missing USERS?).

    Pure integer date arithmetic; boolean gate.

    Scale: one min/max/distinct aggregate, 1-row output.
    """
    ev = load_table(spark, sf_dir, "events")
    span = ev.agg(
        F.min(F.col("ts").cast("date")).alias("d0"),
        F.max(F.col("ts").cast("date")).alias("d1"),
        F.countDistinct(F.col("ts").cast("date"))
        .cast("bigint")
        .alias("n_active_days"),
    )
    cal = F.datediff("d1", "d0") + 1
    return span.select(
        F.col("d0").alias("first_day"),
        F.col("d1").alias("last_day"),
        cal.cast("bigint").alias("n_calendar_days"),
        "n_active_days",
        (cal - F.col("n_active_days"))
        .cast("bigint")
        .alias("n_silent_days"),
        (cal == F.col("n_active_days")).alias("fully_covered"),
    )


# ---- x337: first-order size vs loyalty ----

_X337_SQL = """
WITH seq AS (
  SELECT o_custkey, o_totalprice, o_orderkey,
         ROW_NUMBER() OVER (PARTITION BY o_custkey
                            ORDER BY o_orderdate, o_orderkey) AS rn,
         CAST(COUNT(*) OVER (PARTITION BY o_custkey) AS BIGINT)
           AS n_orders
  FROM orders),
first_o AS (
  SELECT o_custkey, o_totalprice AS first_value, o_orderkey,
         n_orders
  FROM seq WHERE rn = 1),
q AS (
  SELECT n_orders,
         NTILE(4) OVER (ORDER BY first_value, o_orderkey)
           AS first_value_q
  FROM first_o)
SELECT CAST(first_value_q AS BIGINT) AS first_value_quartile,
       CAST(COUNT(*) AS BIGINT) AS n_customers,
       ROUND(CAST(SUM(CASE WHEN n_orders >= 2 THEN 1 ELSE 0 END)
                  AS DOUBLE) / COUNT(*), 6) AS repeat_rate,
       ROUND(CAST(SUM(n_orders) AS DOUBLE) / COUNT(*), 4)
         AS avg_orders
FROM q
GROUP BY first_value_q
ORDER BY first_value_quartile
"""


@register("x337_first_order_loyalty", oracle=_X337_SQL)
def x337_first_order_loyalty(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order size vs loyalty: customers quartiled by their
    FIRST order's value, compared on repeat rate and lifetime
    orders — if big first baskets predict staying, onboarding
    should upsell the first cart hard; if the curve is flat,
    first-order size is vanity and x270's 90-day window is the
    real signal. NTILE with orderkey tiebreak; integer counts.

    Scale: one custkey window (rank + count share the sort), a
    first-order NTILE sort, 4-row rollup.
    """
    from pyspark.sql import Window

    orders = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        "o_orderdate", "o_orderkey"
    )
    seq = orders.select(
        "o_custkey",
        "o_totalprice",
        "o_orderkey",
        F.row_number().over(w).alias("rn"),
        F.count("*")
        .over(Window.partitionBy("o_custkey"))
        .cast("bigint")
        .alias("n_orders"),
    )
    first_o = seq.where(F.col("rn") == 1)
    q = first_o.select(
        "n_orders",
        F.ntile(4)
        .over(Window.orderBy("o_totalprice", "o_orderkey"))
        .alias("first_value_q"),
    )
    rep = F.sum(F.when(F.col("n_orders") >= 2, 1).otherwise(0))
    return (
        q.groupBy(
            F.col("first_value_q")
            .cast("bigint")
            .alias("first_value_quartile")
        )
        .agg(
            F.count("*").cast("bigint").alias("n_customers"),
            F.round(rep.cast("double") / F.count("*"), 6).alias(
                "repeat_rate"
            ),
            F.round(
                F.sum("n_orders").cast("double") / F.count("*"), 4
            ).alias("avg_orders"),
        )
        .orderBy("first_value_quartile")
    )


# ---- x338: per-source doc-length percentiles ----

_X338_SQL = """
WITH r AS (
  SELECT source,
         CAST(LEN(STRING_SPLIT(text, ' ')) AS BIGINT) AS n_tok,
         doc_id,
         ROW_NUMBER() OVER (PARTITION BY source
                            ORDER BY LEN(STRING_SPLIT(text, ' ')),
                                     doc_id) AS rn,
         COUNT(*) OVER (PARTITION BY source) AS n
  FROM documents)
SELECT source,
       CAST(MAX(n) AS BIGINT) AS n_docs,
       CAST(MAX(CASE WHEN rn = CAST(CEIL(0.50 * n) AS BIGINT)
                     THEN n_tok END) AS BIGINT) AS p50_tokens,
       CAST(MAX(CASE WHEN rn = CAST(CEIL(0.90 * n) AS BIGINT)
                     THEN n_tok END) AS BIGINT) AS p90_tokens,
       CAST(MAX(n_tok) AS BIGINT) AS max_tokens
FROM r
GROUP BY source
ORDER BY source
"""


@register("x338_source_length_percentiles", oracle=_X338_SQL)
def x338_source_length_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source document-length percentiles (p50/p90/max in
    tokens, rank-exact) — the numbers that set packing (x45) and
    chunking (x81) parameters PER SOURCE instead of globally: a
    source whose p90 exceeds the context window needs splitting;
    one whose max is 100x its p50 needs x278's Gini told about
    it.

    Scale: one source-partitioned rank window over the length
    map, source-sized output.
    """
    from pyspark.sql import Window

    docs = load_table(spark, sf_dir, "documents")
    r = docs.select(
        "source",
        F.size(F.split(F.col("text"), " "))
        .cast("bigint")
        .alias("n_tok"),
        "doc_id",
    ).select(
        "source",
        "n_tok",
        F.row_number()
        .over(
            Window.partitionBy("source").orderBy("n_tok", "doc_id")
        )
        .alias("rn"),
        F.count("*").over(Window.partitionBy("source")).alias("n"),
    )

    def pick(p: float, name: str):
        return (
            F.max(
                F.when(
                    F.col("rn")
                    == F.ceil(F.lit(p) * F.col("n")).cast("bigint"),
                    F.col("n_tok"),
                )
            )
            .cast("bigint")
            .alias(name)
        )

    return (
        r.groupBy("source")
        .agg(
            F.max("n").cast("bigint").alias("n_docs"),
            pick(0.50, "p50_tokens"),
            pick(0.90, "p90_tokens"),
            F.max("n_tok").cast("bigint").alias("max_tokens"),
        )
        .orderBy("source")
    )


# ---- x339: segment x nation deviation cells ----

_X339_SQL = """
WITH obs AS (
  SELECT c_mktsegment AS segment, c_nationkey,
         CAST(COUNT(*) AS BIGINT) AS o
  FROM customer GROUP BY segment, c_nationkey),
rt AS (SELECT segment, CAST(SUM(o) AS BIGINT) AS r FROM obs
       GROUP BY segment),
ct AS (SELECT c_nationkey, CAST(SUM(o) AS BIGINT) AS c FROM obs
       GROUP BY c_nationkey),
tt AS (SELECT CAST(SUM(o) AS BIGINT) AS n FROM obs),
cells AS (
  SELECT obs.segment, nn.n_name AS nation, obs.o,
         CAST(rt.r AS DOUBLE) * ct.c / tt.n AS e
  FROM obs
  JOIN rt ON obs.segment = rt.segment
  JOIN ct ON obs.c_nationkey = ct.c_nationkey
  JOIN nation nn ON obs.c_nationkey = nn.n_nationkey
  CROSS JOIN tt)
SELECT segment, nation, o AS n_customers,
       ROUND(e, 4) AS n_expected,
       ROUND((o - e) * (o - e) / e, 6) AS chi2_term
FROM cells
ORDER BY (o - e) * (o - e) / e DESC, segment, nation
LIMIT 15
"""


@register("x339_segment_nation_cells", oracle=_X339_SQL)
def x339_segment_nation_cells(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Segment x nation deviation leaderboard: the 15 customer-
    base cells furthest from independence (x161's chi-square
    machinery on the customer dims) — 'MACHINERY customers
    over-concentrate in NATION_7' is a sales-territory fact the
    marginal views can't show; ordered by the unrounded deviation
    with (segment, nation) tiebreaks.

    Scale: dim-only contingency build; marginals re-aggregate
    the cell table; TakeOrdered output.
    """
    cust = load_table(spark, sf_dir, "customer")
    nat = load_table(spark, sf_dir, "nation")
    obs = cust.groupBy(
        F.col("c_mktsegment").alias("segment"), "c_nationkey"
    ).agg(F.count("*").cast("bigint").alias("o"))
    rt = obs.groupBy("segment").agg(
        F.sum("o").cast("bigint").alias("r")
    )
    ct = obs.groupBy("c_nationkey").agg(
        F.sum("o").cast("bigint").alias("c")
    )
    tt = obs.agg(F.sum("o").cast("bigint").alias("n"))
    e = F.col("r").cast("double") * F.col("c") / F.col("n")
    dev = (F.col("o") - e) * (F.col("o") - e) / e
    return (
        obs.join(F.broadcast(rt), "segment")
        .join(F.broadcast(ct), "c_nationkey")
        .join(F.broadcast(nat), obs.c_nationkey == nat.n_nationkey)
        .crossJoin(F.broadcast(tt))
        .select(
            "segment",
            F.col("n_name").alias("nation"),
            F.col("o").alias("n_customers"),
            F.round(e, 4).alias("n_expected"),
            F.round(dev, 6).alias("chi2_term"),
            dev.alias("_d"),
        )
        .orderBy(F.desc("_d"), "segment", "nation")
        .limit(15)
        .drop("_d")
    )


# ---- x340: fixture-presence gate ----

_X340_SQL = """
WITH counts AS (
  SELECT 'customer' AS tbl, CAST(COUNT(*) AS BIGINT) AS n FROM customer
  UNION ALL SELECT 'documents', CAST(COUNT(*) AS BIGINT) FROM documents
  UNION ALL SELECT 'embeddings', CAST(COUNT(*) AS BIGINT)
    FROM embeddings
  UNION ALL SELECT 'events', CAST(COUNT(*) AS BIGINT) FROM events
  UNION ALL SELECT 'lineitem', CAST(COUNT(*) AS BIGINT) FROM lineitem
  UNION ALL SELECT 'nation', CAST(COUNT(*) AS BIGINT) FROM nation
  UNION ALL SELECT 'orders', CAST(COUNT(*) AS BIGINT) FROM orders
  UNION ALL SELECT 'part', CAST(COUNT(*) AS BIGINT) FROM part
  UNION ALL SELECT 'region', CAST(COUNT(*) AS BIGINT) FROM region
  UNION ALL SELECT 'supplier', CAST(COUNT(*) AS BIGINT) FROM supplier)
SELECT tbl AS table_name, n AS n_rows, n > 0 AS present
FROM counts
ORDER BY table_name
"""


@register("x340_fixture_presence", oracle=_X340_SQL)
def x340_fixture_presence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixture-presence gate: row counts and non-empty booleans
    for every registered table — the first gate a scheduled
    pipeline runs (an empty upstream table fails HERE with a
    named row, instead of 40 queries later as a mysterious
    zero); closes the audit-gate family (x280 contracts, x310
    corpus, x320 continuity) at the most basic layer.

    Scale: ten count-star legs, all parallel, metadata-cheap on
    columnar sources.
    """
    out = None
    for t in (
        "customer",
        "documents",
        "embeddings",
        "events",
        "lineitem",
        "nation",
        "orders",
        "part",
        "region",
        "supplier",
    ):
        df = load_table(spark, sf_dir, t)
        leg = df.agg(
            F.lit(t).alias("table_name"),
            F.count("*").cast("bigint").alias("n_rows"),
        )
        out = leg if out is None else out.unionByName(leg)
    return out.select(
        "table_name", "n_rows", (F.col("n_rows") > 0).alias("present")
    ).orderBy("table_name")


# ---- x341: basket value by weekday-of-first-line-ship ----

_X341_SQL = """
WITH d AS (
  SELECT l_orderkey,
         CAST(DAYOFWEEK(MIN(CAST(l_shipdate AS DATE))) + 1 AS BIGINT)
           AS first_ship_dow
  FROM lineitem GROUP BY l_orderkey),
j AS (
  SELECT d.first_ship_dow,
         CAST(o.o_totalprice AS DECIMAL(18,2)) AS price
  FROM d JOIN orders o ON d.l_orderkey = o.o_orderkey)
SELECT first_ship_dow,
       CAST(COUNT(*) AS BIGINT) AS n_orders,
       ROUND(CAST(SUM(price) AS DOUBLE) / COUNT(*), 2) AS aov
FROM j
GROUP BY first_ship_dow
ORDER BY first_ship_dow
"""


@register("x341_shipday_value_profile", oracle=_X341_SQL)
def x341_shipday_value_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order value by the weekday its FIRST line ships — big
    orders starting their fulfillment on Fridays sit in
    warehouses over the weekend (working capital and damage
    exposure); if the high-AOV mass ships late-week, dock
    scheduling (x272) should rebalance toward Monday starts.

    Exact decimal sums; one mean per weekday.

    Scale: orderkey-grain min agg, co-keyed orders join, 7-row
    rollup.
    """
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    d = li.groupBy("l_orderkey").agg(
        F.dayofweek(F.min(F.col("l_shipdate").cast("date")))
        .cast("bigint")
        .alias("first_ship_dow")
    )
    j = d.join(orders, d.l_orderkey == orders.o_orderkey).select(
        "first_ship_dow",
        F.col("o_totalprice").cast("decimal(18,2)").alias("price"),
    )
    return (
        j.groupBy("first_ship_dow")
        .agg(
            F.count("*").cast("bigint").alias("n_orders"),
            F.round(
                F.sum("price").cast("double") / F.count("*"), 2
            ).alias("aov"),
        )
        .orderBy("first_ship_dow")
    )


# ---- x342: token-length distribution ----

_X342_SQL = """
WITH tok AS (
  SELECT LENGTH(UNNEST(STRING_SPLIT(LOWER(text), ' '))) AS len
  FROM documents),
t AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM tok)
SELECT CAST(len AS BIGINT) AS token_length,
       CAST(COUNT(*) AS BIGINT) AS n_tokens,
       ROUND(CAST(COUNT(*) AS DOUBLE) / (SELECT n FROM t), 6)
         AS token_share
FROM tok
GROUP BY len
ORDER BY token_length
"""


@register("x342_token_length_distribution", oracle=_X342_SQL)
def x342_token_length_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus token-length distribution: the character-length
    histogram of all tokens — the curve a subword tokenizer's
    merge budget is tuned against (mass at 3-8 chars is normal
    prose; a spike at 1-2 is over-split text or CJK without
    segmentation; a heavy 15+ tail is x182's anomaly classes in
    histogram form; x61 histograms DOCUMENT lengths, this is the
    TOKEN level).

    Integer lengths and counts; one share division.

    Scale: explode + length-keyed agg (bounded key domain).
    """
    docs = load_table(spark, sf_dir, "documents")
    tok = docs.select(
        F.explode(F.split(F.lower("text"), " ")).alias("tok")
    ).select(F.length("tok").alias("len"))
    t = tok.agg(F.count("*").cast("bigint").alias("nt"))
    return (
        tok.groupBy(F.col("len").cast("bigint").alias("token_length"))
        .agg(F.count("*").cast("bigint").alias("n_tokens"))
        .crossJoin(F.broadcast(t))
        .select(
            "token_length",
            "n_tokens",
            F.round(
                F.col("n_tokens").cast("double") / F.col("nt"), 6
            ).alias("token_share"),
        )
        .orderBy("token_length")
    )


# ---- x345: SCD Type-2 dimension history build ----

_X345_SQL = """
WITH e AS (
  SELECT user_id,
         EPOCH_US(ts) AS ts_us,
         event_id,
         CAST(JSON_EXTRACT(props, '$.k') AS BIGINT) % 4 AS attr
  FROM events),
marked AS (
  SELECT user_id, ts_us, attr,
         CASE WHEN LAG(attr) OVER w IS NULL
                   OR LAG(attr) OVER w <> attr
              THEN 1 ELSE 0 END AS is_change
  FROM e
  WINDOW w AS (PARTITION BY user_id ORDER BY ts_us, event_id)),
versioned AS (
  SELECT user_id, ts_us, attr,
         SUM(is_change) OVER (PARTITION BY user_id
                              ORDER BY ts_us
                              ROWS UNBOUNDED PRECEDING) AS version_seq
  FROM marked),
v AS (
  SELECT user_id,
         CAST(version_seq AS BIGINT) AS version_seq,
         attr,
         MIN(ts_us) AS valid_from_us,
         CAST(COUNT(*) AS BIGINT) AS n_events
  FROM versioned
  GROUP BY user_id, version_seq, attr)
SELECT user_id, version_seq, attr, valid_from_us,
       LEAD(valid_from_us) OVER (PARTITION BY user_id
                                 ORDER BY version_seq) AS valid_to_us,
       n_events,
       CASE WHEN LEAD(valid_from_us) OVER (PARTITION BY user_id
                                           ORDER BY version_seq) IS NULL
            THEN 1 ELSE 0 END AS is_current
FROM v
ORDER BY user_id, version_seq
"""


@register("x345_scd2_history", oracle=_X345_SQL)
def x345_scd2_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD Type-2 dimension build — the warehouse-maintenance staple:
    each user's event-props attribute (k mod 4, a stand-in for plan/
    device/segment) collapses into validity-interval versions. A new
    version opens at every attribute CHANGE point (ordered by exact
    integer microseconds, event_id tie-break); `valid_to` is the next
    version's `valid_from` (NULL = current row), giving the
    as-of-joinable history a feature store needs to prevent
    training-time leakage.

    Exact integers throughout (micros, counts, mod-4 attr).

    Scale: one (user) shuffle shared by the change-mark window, the
    version rollup, and the interval window — AQE reuses the
    exchange; no self-join (the LAG/LEAD pattern replaces the
    classic correlated subquery form).
    """
    from pyspark.sql.window import Window

    ev = load_table(spark, sf_dir, "events")
    e = ev.select(
        "user_id",
        F.expr(
            "timestampdiff(MICROSECOND, "
            "TIMESTAMP_NTZ '1970-01-01 00:00:00', ts)"
        ).alias("ts_us"),
        "event_id",
        (F.get_json_object("props", "$.k").cast("bigint") % 4).alias("attr"),
    )
    w = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
    marked = e.select(
        "user_id", "ts_us", "attr",
        F.when(
            F.lag("attr").over(w).isNull()
            | (F.lag("attr").over(w) != F.col("attr")),
            1,
        ).otherwise(0).alias("is_change"),
    )
    wv = (
        Window.partitionBy("user_id")
        .orderBy("ts_us")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    versioned = marked.select(
        "user_id", "ts_us", "attr",
        F.sum("is_change").over(wv).alias("version_seq"),
    )
    v = versioned.groupBy(
        "user_id",
        F.col("version_seq").cast("bigint").alias("version_seq"),
        "attr",
    ).agg(
        F.min("ts_us").alias("valid_from_us"),
        F.count("*").cast("bigint").alias("n_events"),
    )
    wn = Window.partitionBy("user_id").orderBy("version_seq")
    lead = F.lead("valid_from_us").over(wn)
    return (
        v.select(
            "user_id", "version_seq", "attr", "valid_from_us",
            lead.alias("valid_to_us"),
            "n_events",
            F.when(lead.isNull(), 1).otherwise(0).alias("is_current"),
        )
        .orderBy("user_id", "version_seq")
    )


# ---- x347: zone-map (data-skipping) effectiveness audit ----

_X347_BLOCK = 4096

_X347_SQL = f"""
WITH src AS (
  SELECT l_orderkey, l_linenumber, CAST(l_shipdate AS DATE) AS d
  FROM lineitem),
n AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_rows FROM src),
cuts AS (
  SELECT q, d AS cutoff FROM (
    SELECT d,
           ROW_NUMBER() OVER (ORDER BY d, l_orderkey, l_linenumber) AS rn
    FROM src) t
  JOIN (SELECT UNNEST([25, 50, 75]) AS q) g
    ON t.rn = CAST(CEIL((SELECT n_rows FROM n) * q / 100.0) AS BIGINT)),
layouts AS (
  SELECT 'natural' AS layout,
         (ROW_NUMBER() OVER (ORDER BY l_orderkey, l_linenumber) - 1)
           // {_X347_BLOCK} AS block_id,
         d
  FROM src
  UNION ALL
  SELECT 'shipdate_sorted' AS layout,
         (ROW_NUMBER() OVER (ORDER BY d, l_orderkey, l_linenumber) - 1)
           // {_X347_BLOCK} AS block_id,
         d
  FROM src),
blocks AS (
  SELECT layout, block_id, MIN(d) AS bmin
  FROM layouts GROUP BY layout, block_id)
SELECT c.q AS pred_quartile, b.layout,
       CAST(COUNT(*) AS BIGINT) AS n_blocks,
       CAST(SUM(CASE WHEN b.bmin >= c.cutoff THEN 1 ELSE 0 END)
            AS BIGINT) AS n_skippable,
       ROUND(CAST(SUM(CASE WHEN b.bmin >= c.cutoff THEN 1 ELSE 0 END)
                  AS DOUBLE) / COUNT(*), 6) AS skip_ratio
FROM blocks b CROSS JOIN cuts c
GROUP BY c.q, b.layout
ORDER BY pred_quartile, layout
"""


@register("x347_zonemap_effectiveness", oracle=_X347_SQL)
def x347_zonemap_effectiveness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zone-map / data-skipping effectiveness audit — the sort-key
    selection study behind every lakehouse OPTIMIZE ... ZORDER
    decision: lineitem is laid out two ways (natural orderkey order
    vs shipdate-sorted), chunked into fixed {blk}-row blocks, and for
    each quartile predicate `l_shipdate < cutoff` the audit counts
    blocks a min/max zone map would skip (block min >= cutoff). The
    shipdate-sorted layout should approach skip_ratio ≈ 1−q/100
    while the natural layout skips ~nothing — the measured gap IS
    the case for re-clustering.

    Exact: quartile cutoffs by rank selection (total tie-broken
    order), integer block ids, one final ratio division.

    Scale: the audit itself runs on per-block min/max — in
    production these come FROM parquet footers (x86's machinery,
    O(files) reads); the full-sort simulation here is the planning
    twin you run on a sample before rewriting 100 TB. The global
    row_number is the deliberate single-total-order stage of that
    simulation (per-file zone maps need no such order).
    """
    from pyspark.sql.window import Window

    li = load_table(spark, sf_dir, "lineitem")
    src = li.select(
        "l_orderkey", "l_linenumber",
        F.col("l_shipdate").cast("date").alias("d"),
    )
    n_rows = src.count()
    rn = src.select(
        "d",
        F.row_number()
        .over(Window.orderBy("d", "l_orderkey", "l_linenumber"))
        .alias("rn"),
    )
    import math

    cut_rows = {q: math.ceil(n_rows * q / 100) for q in (25, 50, 75)}
    cuts = (
        rn.where(F.col("rn").isin(list(cut_rows.values())))
        .crossJoin(
            F.broadcast(
                spark.createDataFrame(
                    [(q, r) for q, r in cut_rows.items()], "q INT, r BIGINT"
                )
            )
        )
        .where(F.col("rn") == F.col("r"))
        .select("q", F.col("d").alias("cutoff"))
    )
    layouts = (
        src.select(
            F.lit("natural").alias("layout"),
            (
                (
                    F.row_number().over(
                        Window.orderBy("l_orderkey", "l_linenumber")
                    )
                    - 1
                )
                / _X347_BLOCK
            ).cast("bigint").alias("block_id"),
            "d",
        )
    ).unionAll(
        src.select(
            F.lit("shipdate_sorted").alias("layout"),
            (
                (
                    F.row_number().over(
                        Window.orderBy("d", "l_orderkey", "l_linenumber")
                    )
                    - 1
                )
                / _X347_BLOCK
            ).cast("bigint").alias("block_id"),
            "d",
        )
    )
    blocks = layouts.groupBy("layout", "block_id").agg(
        F.min("d").alias("bmin")
    )
    skippable = F.sum(
        F.when(F.col("bmin") >= F.col("cutoff"), 1).otherwise(0)
    )
    return (
        blocks.crossJoin(F.broadcast(cuts))
        .groupBy(F.col("q").alias("pred_quartile"), "layout")
        .agg(
            F.count("*").cast("bigint").alias("n_blocks"),
            skippable.cast("bigint").alias("n_skippable"),
            F.round(
                skippable.cast("double") / F.count("*"), 6
            ).alias("skip_ratio"),
        )
        .orderBy("pred_quartile", "layout")
    )


x347_zonemap_effectiveness.__doc__ = x347_zonemap_effectiveness.__doc__.format(
    blk=_X347_BLOCK
)


# ---- x350: point-in-time feature lookup against SCD-2 history ----

_X350_SQL = """
WITH e AS (
  SELECT user_id, event_id, event_type,
         EPOCH_US(CAST(ts AS TIMESTAMP)) AS ts_us,
         CAST(('0x' || SUBSTR(MD5('k' || json_extract_string(props, '$.k')),
               1, 15)) AS BIGINT) % 4 AS attr
  FROM events),
dim_src AS (SELECT * FROM e WHERE event_type <> 'purchase'),
marked AS (
  SELECT user_id, ts_us, attr,
         CASE WHEN LAG(attr) OVER w IS NULL
                   OR LAG(attr) OVER w <> attr THEN 1 ELSE 0 END AS is_change
  FROM dim_src
  WINDOW w AS (PARTITION BY user_id ORDER BY ts_us, event_id)),
versioned AS (
  SELECT user_id, ts_us, attr,
         SUM(is_change) OVER (PARTITION BY user_id ORDER BY ts_us, attr
                              ROWS UNBOUNDED PRECEDING) AS version_seq
  FROM marked),
dim AS (
  SELECT user_id, version_seq, attr,
         MIN(ts_us) AS valid_from_us,
         LEAD(MIN(ts_us)) OVER (PARTITION BY user_id
                                ORDER BY version_seq) AS valid_to_us
  FROM versioned GROUP BY user_id, version_seq, attr),
fact AS (SELECT user_id, ts_us FROM e WHERE event_type = 'purchase'),
pit AS (
  SELECT f.user_id, d.attr
  FROM fact f
  LEFT JOIN dim d
    ON d.user_id = f.user_id
   AND f.ts_us >= d.valid_from_us
   AND (d.valid_to_us IS NULL OR f.ts_us < d.valid_to_us))
SELECT CAST(COALESCE(attr, -1) AS BIGINT) AS attr_at_purchase,
       CAST(COUNT(*) AS BIGINT) AS n_purchases,
       CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users
FROM pit
GROUP BY attr_at_purchase
ORDER BY attr_at_purchase
"""


@register("x350_pit_feature_join", oracle=_X350_SQL)
def x350_pit_feature_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-time feature lookup — the feature-store correctness
    primitive that prevents temporal leakage in training sets: a
    user-attribute SCD-2 history (x345's build, here from NON-
    purchase events so dim and fact are disjoint; attr = stable
    md5-of-props bucket) is joined to each purchase at THE VERSION
    VALID AT PURCHASE TIME (valid_from <= t < valid_to), never the
    current one. Purchases before a user's first version report
    attr -1 — the cold-start rows a naive latest-value join would
    silently mislabel. Output: purchase and user counts per
    attribute-as-of-purchase.

    Exact integer micros and counts end to end.

    Scale: the interval join carries the user_id EQUI key — the
    range predicate is a per-user residual over that user's few
    versions, so this is one uniform-key shuffle, not a range join.
    Dim build shares the same (user) exchange (window + rollup +
    LEAD). At extreme per-user version counts the union-and-window
    as-of form (q25/x33) replaces the residual scan; semantics
    identical.
    """
    from pyspark.sql.window import Window

    ev = load_table(spark, sf_dir, "events")
    e = ev.select(
        "user_id", "event_id", "event_type",
        F.expr(
            "timestampdiff(MICROSECOND, "
            "TIMESTAMP_NTZ '1970-01-01 00:00:00', ts)"
        ).alias("ts_us"),
        (
            F.conv(
                F.substring(
                    F.md5(
                        F.concat(
                            F.lit("k"),
                            F.get_json_object("props", "$.k"),
                        ).cast("binary")
                    ),
                    1, 15,
                ),
                16, 10,
            ).cast("bigint")
            % 4
        ).alias("attr"),
    )
    dim_src = e.where(F.col("event_type") != "purchase")
    w = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
    marked = dim_src.select(
        "user_id", "ts_us", "attr",
        F.when(
            F.lag("attr").over(w).isNull()
            | (F.lag("attr").over(w) != F.col("attr")),
            1,
        ).otherwise(0).alias("is_change"),
    )
    wv = (
        Window.partitionBy("user_id")
        .orderBy("ts_us", "attr")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    versioned = marked.select(
        "user_id", "ts_us", "attr",
        F.sum("is_change").over(wv).alias("version_seq"),
    )
    wn = Window.partitionBy("user_id").orderBy("version_seq")
    dim = (
        versioned.groupBy("user_id", "version_seq", "attr")
        .agg(F.min("ts_us").alias("valid_from_us"))
        .select(
            F.col("user_id").alias("d_user"),
            "attr",
            "valid_from_us",
            F.lead("valid_from_us").over(
                Window.partitionBy("user_id").orderBy("version_seq")
            ).alias("valid_to_us"),
        )
    )
    fact = e.where(F.col("event_type") == "purchase").select(
        "user_id", "ts_us"
    )
    pit = fact.join(
        dim,
        (fact["user_id"] == dim["d_user"])
        & (fact["ts_us"] >= dim["valid_from_us"])
        & (dim["valid_to_us"].isNull() | (fact["ts_us"] < dim["valid_to_us"])),
        "left",
    )
    return (
        pit.groupBy(
            F.coalesce(F.col("attr"), F.lit(-1))
            .cast("bigint")
            .alias("attr_at_purchase")
        )
        .agg(
            F.count("*").cast("bigint").alias("n_purchases"),
            F.countDistinct("user_id").cast("bigint").alias("n_users"),
        )
        .orderBy("attr_at_purchase")
    )


# ---- x354: t-closeness privacy audit (integer EMD) ----

_X354_SQL = """
WITH dec AS (
  SELECT c_nationkey, c_mktsegment,
         NTILE(10) OVER (ORDER BY c_acctbal, c_custkey) - 1 AS sens
  FROM customer),
g AS (
  SELECT c_nationkey, c_mktsegment, sens,
         CAST(COUNT(*) AS BIGINT) AS n_gs
  FROM dec GROUP BY c_nationkey, c_mktsegment, sens),
gt AS (
  SELECT c_nationkey, c_mktsegment, CAST(SUM(n_gs) AS BIGINT) AS n_g
  FROM g GROUP BY c_nationkey, c_mktsegment),
gdist AS (
  SELECT sens, CAST(COUNT(*) AS BIGINT) AS n_s FROM dec GROUP BY sens),
n AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_tot FROM dec),
grid AS (
  SELECT t.c_nationkey, t.c_mktsegment, t.n_g, s.sens, s.n_s,
         COALESCE(g.n_gs, 0) AS n_gs
  FROM gt t CROSS JOIN gdist s
  LEFT JOIN g ON g.c_nationkey = t.c_nationkey
             AND g.c_mktsegment = t.c_mktsegment AND g.sens = s.sens),
cum AS (
  SELECT c_nationkey, c_mktsegment, n_g, sens,
         SUM(n_gs * (SELECT n_tot FROM n) - n_s * n_g)
           OVER (PARTITION BY c_nationkey, c_mktsegment
                 ORDER BY sens ROWS UNBOUNDED PRECEDING) AS cumdiff
  FROM grid)
SELECT c_nationkey AS nationkey, c_mktsegment AS segment,
       CAST(n_g AS BIGINT) AS n_members,
       ROUND(CAST(SUM(ABS(cumdiff)) AS DOUBLE)
             / (n_g * (SELECT n_tot FROM n) * 9), 6) AS t_closeness
FROM cum
WHERE sens < 9
GROUP BY c_nationkey, c_mktsegment, n_g
ORDER BY nationkey, segment
"""


@register("x354_t_closeness", oracle=_X354_SQL)
def x354_t_closeness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """t-closeness privacy audit (Li et al., ICDE'07) — the
    distribution-level guarantee beyond x75's k-anonymity and
    l-diversity: for each quasi-identifier group (nation, market
    segment), the earth-mover's distance between the group's
    distribution over the ORDERED sensitive attribute (account-
    balance decile) and the global distribution. EMD over an ordered
    m-bin attribute is sum(|cum P - cum Q|)/(m-1); kept EXACT by
    scaling both CDFs to the integer lattice n_g*N — cumdiff_i =
    sum_{j<=i}(n_gj*N - N_j*n_g) — so the statistic is one final
    division of an integer sum. Groups with small EMD can release
    the attribute; large-EMD groups leak their members' balances.

    Scale: one (group) agg + a 10-row broadcast global histogram;
    the grid is |groups|x10, the cumsum window runs inside each
    group. The decile NTILE is the only total-order stage and is a
    property of the SENSITIVE DOMAIN (10 fixed bins) — production
    swaps in fixed value breakpoints, removing it.
    """
    from pyspark.sql.window import Window

    cust = load_table(spark, sf_dir, "customer")
    dec = cust.select(
        "c_nationkey", "c_mktsegment",
        (
            F.ntile(10).over(Window.orderBy("c_acctbal", "c_custkey")) - 1
        ).alias("sens"),
    )
    g = dec.groupBy("c_nationkey", "c_mktsegment", "sens").agg(
        F.count("*").cast("bigint").alias("n_gs")
    )
    gt = g.groupBy("c_nationkey", "c_mktsegment").agg(
        F.sum("n_gs").cast("bigint").alias("n_g")
    )
    glob = dec.groupBy("sens").agg(
        F.count("*").cast("bigint").alias("n_s")
    )
    n_tot = dec.agg(F.count("*").cast("bigint").alias("n_tot"))
    grid = (
        gt.crossJoin(F.broadcast(glob))
        .join(
            g.withColumnRenamed("c_nationkey", "g_nk")
            .withColumnRenamed("c_mktsegment", "g_seg")
            .withColumnRenamed("sens", "g_sens"),
            (F.col("g_nk") == F.col("c_nationkey"))
            & (F.col("g_seg") == F.col("c_mktsegment"))
            & (F.col("g_sens") == F.col("sens")),
            "left",
        )
        .crossJoin(F.broadcast(n_tot))
        .select(
            "c_nationkey", "c_mktsegment", "n_g", "sens", "n_s", "n_tot",
            F.coalesce(F.col("n_gs"), F.lit(0)).alias("n_gs"),
        )
    )
    wc = (
        Window.partitionBy("c_nationkey", "c_mktsegment")
        .orderBy("sens")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    cum = grid.select(
        "c_nationkey", "c_mktsegment", "n_g", "sens", "n_tot",
        F.sum(
            F.col("n_gs") * F.col("n_tot") - F.col("n_s") * F.col("n_g")
        ).over(wc).alias("cumdiff"),
    )
    return (
        cum.where(F.col("sens") < 9)
        .groupBy(
            F.col("c_nationkey").alias("nationkey"),
            F.col("c_mktsegment").alias("segment"),
            F.col("n_g").alias("n_members"),
            "n_tot",
        )
        .agg(F.sum(F.abs(F.col("cumdiff"))).alias("emd_num"))
        .select(
            "nationkey", "segment", "n_members",
            F.round(
                F.col("emd_num").cast("double")
                / (F.col("n_members") * F.col("n_tot") * 9),
                6,
            ).alias("t_closeness"),
        )
        .orderBy("nationkey", "segment")
    )
