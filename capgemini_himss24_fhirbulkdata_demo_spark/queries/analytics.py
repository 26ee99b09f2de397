"""Statistical / business-audit analytics (x151+).

Continues the north-star analytics surface (SURVEY §2B extensions)
with audit- and statistics-flavoured operators over the TPC-H-ish
fixtures: forensic digit tests, uncertainty-aware rate rankings,
concentration indices. The reference outsources every analytical
read to Power BI over its curated NDJSON (report.html); these are
the engine-side equivalents, each with a DuckDB oracle twin.

Determinism contract (registry docstring): integer/exact-decimal
accumulation, doubles only through IEEE-exact ops (+ - * / sqrt)
written with identical structure in Spark and the oracle SQL, one
final ROUND per emitted float column.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from .registry import register

# ---- x151: Benford first-digit audit ----

# log10((d+1)/d), d=1..9 — literal constants so neither engine
# evaluates a transcendental (libm log is not cross-engine
# bit-stable; these are). In oracle SQL they are interpolated with an
# ``e0`` suffix so DuckDB parses them as DOUBLE directly — a bare
# ``0.3010299957`` binds as DECIMAL(11,10), and scale-10
# decimal->double conversion is the known off-by-an-ulp class
# (SURVEY §2G); strtod parsing is correctly rounded on both engines.
_BENFORD_P = (
    0.3010299957,
    0.1760912591,
    0.1249387366,
    0.0969100130,
    0.0791812460,
    0.0669467896,
    0.0579919470,
    0.0511525224,
    0.0457574906,
)

_X151_SQL = f"""
WITH d AS (
  SELECT CAST(SUBSTR(CAST(CAST(FLOOR(o_totalprice) AS BIGINT) AS VARCHAR), 1, 1)
              AS BIGINT) AS digit
  FROM orders
  WHERE o_totalprice >= 1
),
c AS (
  SELECT digit, CAST(COUNT(*) AS BIGINT) AS n_obs FROM d GROUP BY digit
),
t AS (SELECT CAST(SUM(n_obs) AS BIGINT) AS n FROM c)
SELECT c.digit,
       c.n_obs,
       ROUND(CAST(c.n_obs AS DOUBLE) / t.n, 6) AS obs_share,
       (ARRAY[{", ".join(f"{p!r}e0" for p in _BENFORD_P)}])[c.digit]
         AS benford_p,
       ROUND(
         (CAST(c.n_obs AS DOUBLE)
          - t.n * (ARRAY[{", ".join(f"{p!r}e0" for p in _BENFORD_P)}])[c.digit])
         * (CAST(c.n_obs AS DOUBLE)
          - t.n * (ARRAY[{", ".join(f"{p!r}e0" for p in _BENFORD_P)}])[c.digit])
         / (t.n * (ARRAY[{", ".join(f"{p!r}e0" for p in _BENFORD_P)}])[c.digit]),
         6) AS chi2_term
FROM c CROSS JOIN t
ORDER BY c.digit
"""


@register("x151_benford_audit", oracle=_X151_SQL)
def x151_benford_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benford's-law first-digit audit of order totals — the
    classic financial-forensics screen (fabricated amounts have
    uniform-ish first digits; organic ones follow log10(1+1/d)).
    Emits per-digit observed share, the Benford expectation, and
    the chi-square contribution so the auditor sees WHICH digits
    deviate, not just a headline statistic.

    First digit is taken from the bigint string of
    floor(o_totalprice) — float→string formatting is engine-
    specific, bigint→string is not. Benford probabilities are
    hardcoded literals (no libm log in either engine).

    Scale: one narrow map + a 9-key aggregate; the 1-row total is
    a broadcast. Digit is a bounded, perfectly balanced key — no
    skew at any corpus size.
    """
    orders = load_table(spark, sf_dir, "orders")
    probs = F.array(*[F.lit(p) for p in _BENFORD_P])
    d = (
        orders.where(F.col("o_totalprice") >= 1)
        .select(
            F.substring(
                F.floor("o_totalprice").cast("bigint").cast("string"), 1, 1
            )
            .cast("bigint")
            .alias("digit")
        )
    )
    c = d.groupBy("digit").agg(F.count("*").cast("bigint").alias("n_obs"))
    t = c.agg(F.sum("n_obs").cast("bigint").alias("n"))
    p = F.element_at(probs, F.col("digit").cast("int"))
    dev = F.col("n_obs").cast("double") - F.col("n") * p
    return (
        c.crossJoin(F.broadcast(t))
        .select(
            "digit",
            "n_obs",
            F.round(F.col("n_obs").cast("double") / F.col("n"), 6).alias(
                "obs_share"
            ),
            p.alias("benford_p"),
            F.round(dev * dev / (F.col("n") * p), 6).alias("chi2_term"),
        )
        .orderBy("digit")
    )


# ---- x152: Wilson-lower-bound return-rate ranking ----

_X152_Z = 1.96  # 95% two-sided normal quantile, literal

_X152_SQL = f"""
WITH r AS (
  SELECT p.p_brand,
         CAST(SUM(CASE WHEN l.l_returnflag = 'R' THEN 1 ELSE 0 END)
              AS BIGINT) AS n_returned,
         CAST(COUNT(*) AS BIGINT) AS n_lines
  FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
  GROUP BY p.p_brand
),
w AS (
  SELECT p_brand, n_returned, n_lines,
         CAST(n_returned AS DOUBLE) / n_lines AS phat
  FROM r
)
SELECT p_brand, n_returned, n_lines,
       ROUND(phat, 6) AS return_rate,
       ROUND(
         (phat + {_X152_Z!r} * {_X152_Z!r} / (2 * n_lines)
          - {_X152_Z!r} * SQRT(
              (phat * (1 - phat)
               + {_X152_Z!r} * {_X152_Z!r} / (4 * n_lines)) / n_lines))
         / (1 + {_X152_Z!r} * {_X152_Z!r} / n_lines),
         6) AS wilson_lb
FROM w
ORDER BY wilson_lb DESC, p_brand
"""


@register("x152_wilson_ranking", oracle=_X152_SQL)
def x152_wilson_ranking(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Return-rate ranking by Wilson lower confidence bound — the
    standard fix for "sort by rate" rewarding tiny denominators
    (a 1/1 brand outranks 490/1000 on raw rate; Wilson's lower
    bound penalizes small n). Same construction Reddit/Evan Miller
    popularized for review ranking, applied to per-brand return
    rates.

    Every input to the bound is an exact integer ratio; the bound
    itself is + - * / sqrt only (all IEEE-exact, identical
    expression shape in both engines — no libm transcendentals).

    Scale: lineitem→part is a broadcast-size dim join at any SF
    (part is ~1/5 the fact rows but bounded per brand output);
    one partial-agg shuffle on p_brand (25 keys), then pure
    per-row math.
    """
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    z = F.lit(_X152_Z)
    r = (
        li.join(part, li.l_partkey == part.p_partkey)
        .groupBy("p_brand")
        .agg(
            F.sum(
                F.when(F.col("l_returnflag") == "R", 1).otherwise(0)
            )
            .cast("bigint")
            .alias("n_returned"),
            F.count("*").cast("bigint").alias("n_lines"),
        )
    )
    phat = F.col("n_returned").cast("double") / F.col("n_lines")
    w = r.withColumn("phat", phat)
    n = F.col("n_lines")
    wilson = (
        F.col("phat")
        + z * z / (2 * n)
        - z
        * F.sqrt(
            (F.col("phat") * (1 - F.col("phat")) + z * z / (4 * n)) / n
        )
    ) / (1 + z * z / n)
    return (
        w.select(
            "p_brand",
            "n_returned",
            "n_lines",
            F.round("phat", 6).alias("return_rate"),
            F.round(wilson, 6).alias("wilson_lb"),
        )
        .orderBy(F.desc("wilson_lb"), "p_brand")
    )


# ---- x153: supplier revenue concentration (HHI) per nation ----

_X153_SQL = """
WITH rev AS (
  SELECT s.s_nationkey,
         l.l_suppkey,
         CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                  * (CAST(1 AS DECIMAL(6,4))
                     - CAST(l_discount AS DECIMAL(6,4)))) * 1000000
              AS DECIMAL(19,0)) AS rev_u
  FROM lineitem l JOIN supplier s ON l.l_suppkey = s.s_suppkey
  GROUP BY s.s_nationkey, l.l_suppkey
),
agg AS (
  SELECT n.n_name AS nation,
         CAST(COUNT(*) AS BIGINT) AS n_suppliers,
         SUM(rev_u) AS tot_u,
         SUM(rev_u * rev_u) AS sumsq_u
  FROM rev JOIN nation n ON rev.s_nationkey = n.n_nationkey
  GROUP BY n.n_name
)
SELECT nation, n_suppliers,
       ((CAST(tot_u AS BIGINT) + 5000) // 10000) / 100.0 AS revenue,
       ROUND(CAST(sumsq_u AS DOUBLE)
             / (CAST(tot_u AS DOUBLE) * CAST(tot_u AS DOUBLE)), 6) AS hhi
FROM agg
ORDER BY hhi DESC, nation
"""


@register("x153_hhi_concentration", oracle=_X153_SQL)
def x153_hhi_concentration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Herfindahl-Hirschman concentration of supplier revenue within
    each nation — the antitrust-style screen for how monopolized a
    market is (HHI = sum of squared revenue shares; 1/n for a
    perfectly even split, 1.0 for a monopoly).

    Exactness: revenue accumulates as DECIMAL(18,2)x(6,4) per the
    q01 convention, is scaled to integral micro-units DECIMAL(19,0)
    (6 fractional digits, so exact), and HHI = sum(rev^2)/tot^2 —
    both sums are exact decimals; the single double division at the
    end is IEEE-exact. No order-dependent float summation anywhere.

    Scale: one (nation, supplier) partial agg + a 25-key nation
    rollup; supplier is a broadcast dim. At 100 TB the (19,0)
    squares sum within DECIMAL(38,0) headroom for any real revenue
    magnitude (1e27 << 1e38).
    """
    li = load_table(spark, sf_dir, "lineitem")
    sup = load_table(spark, sf_dir, "supplier")
    nat = load_table(spark, sf_dir, "nation")
    disc = (
        F.col("l_extendedprice").cast("decimal(18,2)")
        * (F.lit(1).cast("decimal(6,4)") - F.col("l_discount").cast("decimal(6,4)"))
    )
    rev = (
        li.join(F.broadcast(sup), li.l_suppkey == sup.s_suppkey)
        .groupBy("s_nationkey", "l_suppkey")
        .agg(
            (F.sum(disc) * 1000000)
            .cast("decimal(19,0)")
            .alias("rev_u")
        )
    )
    agg = (
        rev.join(F.broadcast(nat), rev.s_nationkey == nat.n_nationkey)
        .groupBy(F.col("n_name").alias("nation"))
        .agg(
            F.count("*").cast("bigint").alias("n_suppliers"),
            F.sum("rev_u").alias("tot_u"),
            F.sum(F.col("rev_u") * F.col("rev_u")).alias("sumsq_u"),
        )
    )
    return agg.select(
        "nation",
        "n_suppliers",
        (F.expr("(cast(tot_u as bigint) + 5000) div 10000") / F.lit(100.0)).alias("revenue"),
        F.round(
            F.col("sumsq_u").cast("double")
            / (F.col("tot_u").cast("double") * F.col("tot_u").cast("double")),
            6,
        ).alias("hhi"),
    ).orderBy(F.desc("hhi"), "nation")


# ---- x154: distinct-n diversity per source ----

_X154_SQL = """
WITH toks AS (
  SELECT doc_id, source, STRING_SPLIT(text, ' ') AS t FROM documents),
grams AS (
  SELECT source,
         UNNEST(LIST_TRANSFORM(RANGE(1, LEN(t) - 1),
                i -> t[i] || ' ' || t[i + 1] || ' ' || t[i + 2])) AS g
  FROM toks)
SELECT source,
       CAST(COUNT(*) AS BIGINT) AS n_trigrams,
       CAST(COUNT(DISTINCT g) AS BIGINT) AS n_distinct,
       ROUND(CAST(COUNT(DISTINCT g) AS DOUBLE) / COUNT(*), 6)
         AS distinct_3
FROM grams
GROUP BY source
ORDER BY source
"""


@register("x154_distinct_ngrams", oracle=_X154_SQL)
def x154_distinct_ngrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct-n corpus diversity (the distinct-3 metric from NLG
    evaluation, applied per source): unique trigrams over total
    trigrams. Low distinct-n flags template farms and boilerplate
    sources a training mix should down-weight — the corpus-level
    complement of x29's within-doc repetition score.

    Trigrams come from an index-sequence transform over the
    whitespace token array (x27's no-self-join idiom, window of 3);
    counts are integers, one final share division.

    Scale: explode is linear in corpus tokens; the distinct is a
    two-stage aggregate — (source, gram) partial counts collapse
    the Zipf head map-side, then the per-source rollup counts the
    group rows (measured ~25% over countDistinct's expand, which
    doubles the exploded input). No joins at all.
    """
    from ..functions.hof import bound

    docs = load_table(spark, sf_dir, "documents")
    # token array lambda-bound: a captured split re-tokenizes per
    # trigram position in the interpreted HOF (measured 3.69 -> 0.66 s
    # at sf0.1 — the functions.hof.bound docstring's headline number)
    grams = docs.select(
        "source",
        F.explode(
            bound(
                F.split(F.col("text"), " "),
                lambda t: F.transform(
                    F.sequence(
                        F.lit(0),
                        F.greatest(F.size(t) - 3, F.lit(-1)),
                    ),
                    lambda i: F.concat_ws(
                        " ",
                        F.element_at(t, i + 1),
                        F.element_at(t, i + 2),
                        F.element_at(t, i + 3),
                    ),
                ),
            )
        ).alias("g"),
    )
    per_gram = grams.groupBy("source", "g").agg(
        F.count("*").alias("n")
    )
    return (
        per_gram.groupBy("source")
        .agg(
            F.sum("n").cast("bigint").alias("n_trigrams"),
            F.count("*").cast("bigint").alias("n_distinct"),
        )
        .select(
            "source",
            "n_trigrams",
            "n_distinct",
            F.round(
                F.col("n_distinct").cast("double") / F.col("n_trigrams"), 6
            ).alias("distinct_3"),
        )
        .orderBy("source")
    )


# ---- x155: Holt double-exponential trend smoothing ----

_X155_SQL = """
WITH RECURSIVE daily AS MATERIALIZED (
  SELECT CAST(o_orderdate AS DATE) AS d,
         CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS y
  FROM orders GROUP BY d),
idx AS MATERIALIZED (
  SELECT d, y, ROW_NUMBER() OVER (ORDER BY d) AS i FROM daily),
holt AS (
  SELECT i, d, y, y AS lvl, CAST(0 AS DOUBLE) AS trend
  FROM idx WHERE i = 1
  UNION ALL
  SELECT n.i, n.d, n.y,
         0.3 * n.y + 0.7 * (h.lvl + h.trend) AS lvl,
         0.1 * ((0.3 * n.y + 0.7 * (h.lvl + h.trend)) - h.lvl)
           + 0.9 * h.trend AS trend
  FROM holt h JOIN idx n ON n.i = h.i + 1)
SELECT d, ROUND(y, 2) AS revenue,
       ROUND(lvl, 4) AS level_smooth,
       ROUND(trend, 4) AS trend_smooth
FROM holt ORDER BY d
"""


@register("x155_holt_trend", oracle=_X155_SQL)
def x155_holt_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Holt double-exponential smoothing of daily revenue (level +
    trend, alpha=0.3 / beta=0.1) — the forecasting primitive one
    step past x36's single EWMA, and the canonical example of a
    RECURRENCE an engine must express: state at day t depends on
    state at day t-1.

    Spark expresses the recurrence as a sequential ``F.aggregate``
    fold over the date-sorted daily array (HOF scan, one pass);
    the oracle is the same recurrence as a recursive CTE — two
    genuinely different formulations agreeing bit-for-bit because
    the update uses only IEEE-exact * and + on identical literal
    coefficients.

    Scale: the distributed work is the daily revenue aggregate
    (exact decimal partial-agg, one shuffle on date); the fold
    itself runs on one executor over a calendar-bounded series
    (~2.4k days for 7 years — O(days), not O(orders)). An
    inherently sequential recurrence cannot be parallelized across
    time without changing semantics.
    """
    orders = load_table(spark, sf_dir, "orders")
    daily = (
        orders.groupBy(F.col("o_orderdate").cast("date").alias("d"))
        .agg(
            F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
            .cast("double")
            .alias("y")
        )
    )
    arr = daily.agg(
        F.array_sort(F.collect_list(F.struct("d", "y"))).alias("s")
    )
    out_t = (
        "array<struct<d:date,y:double,lvl:double,trend:double>>"
    )
    init = F.struct(
        F.lit(0.0).alias("l"),
        F.lit(0.0).alias("b"),
        F.array().cast(out_t).alias("out"),
    )

    def step(acc, x):
        first = F.size(acc["out"]) == 0
        l_upd = F.lit(0.3) * x["y"] + F.lit(0.7) * (acc["l"] + acc["b"])
        l_new = F.when(first, x["y"]).otherwise(l_upd)
        b_new = F.when(first, F.lit(0.0)).otherwise(
            F.lit(0.1) * (l_upd - acc["l"]) + F.lit(0.9) * acc["b"]
        )
        return F.struct(
            l_new.alias("l"),
            b_new.alias("b"),
            F.concat(
                acc["out"],
                F.array(
                    F.struct(
                        x["d"].alias("d"),
                        x["y"].alias("y"),
                        l_new.alias("lvl"),
                        b_new.alias("trend"),
                    )
                ),
            ).alias("out"),
        )

    folded = arr.select(
        F.explode(F.aggregate("s", init, step)["out"]).alias("r")
    )
    return folded.select(
        F.col("r.d").alias("d"),
        F.round("r.y", 2).alias("revenue"),
        F.round("r.lvl", 4).alias("level_smooth"),
        F.round("r.trend", 4).alias("trend_smooth"),
    ).orderBy("d")


# ---- x156: last-touch conversion attribution ----

_X156_SQL = """
WITH a AS (
  SELECT event_type, value,
         LAST_VALUE(CASE WHEN event_type <> 'purchase'
                         THEN event_type END IGNORE NULLS)
           OVER (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
           AS ch
  FROM events)
SELECT COALESCE(ch, 'direct') AS channel,
       CAST(COUNT(*) AS BIGINT) AS n_conversions,
       CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE)
         AS attributed_value
FROM a
WHERE event_type = 'purchase'
GROUP BY channel
ORDER BY channel
"""


@register("x156_attribution_last_touch", oracle=_X156_SQL)
def x156_attribution_last_touch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Last-touch conversion attribution: each purchase is credited
    to the user's most recent preceding non-purchase event type
    ('direct' if the purchase is the user's first event) — the
    baseline attribution model every marketing stack starts from,
    and a window-function shape (conditional IGNORE NULLS last
    over an open frame) distinct from every lag/lead query so far.

    Ordering ties on ts are broken by event_id so the attributed
    channel is deterministic; value sums accumulate as
    DECIMAL(18,6) (the events idiom) with one final double cast.

    Scale: one shuffle on user_id for the window (running last is
    a streaming frame — no per-row rescan), then a tiny channel
    rollup. User partitions are naturally bounded; no joins.
    """
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    a = ev.withColumn(
        "ch",
        F.last(
            F.when(F.col("event_type") != "purchase", F.col("event_type")),
            ignorenulls=True,
        ).over(w),
    )
    return (
        a.where(F.col("event_type") == "purchase")
        .groupBy(F.coalesce("ch", F.lit("direct")).alias("channel"))
        .agg(
            F.count("*").cast("bigint").alias("n_conversions"),
            F.sum(F.col("value").cast("decimal(18,6)"))
            .cast("double")
            .alias("attributed_value"),
        )
        .orderBy("channel")
    )


# ---- x157: Bowley quartile skewness per market segment ----

_X157_SQL = """
WITH seg AS (
  SELECT c.c_mktsegment AS segment, o.o_totalprice AS v,
         ROW_NUMBER() OVER (PARTITION BY c.c_mktsegment
                            ORDER BY o.o_totalprice, o.o_orderkey) AS r,
         COUNT(*) OVER (PARTITION BY c.c_mktsegment) AS n
  FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey),
q AS (
  SELECT segment,
         MAX(CASE WHEN r = CAST(CEIL(0.25 * n) AS BIGINT) THEN v END) AS q1,
         MAX(CASE WHEN r = CAST(CEIL(0.50 * n) AS BIGINT) THEN v END) AS q2,
         MAX(CASE WHEN r = CAST(CEIL(0.75 * n) AS BIGINT) THEN v END) AS q3,
         CAST(MAX(n) AS BIGINT) AS n_orders
  FROM seg GROUP BY segment)
SELECT segment, n_orders,
       ROUND(q1, 2) AS q1, ROUND(q2, 2) AS q2, ROUND(q3, 2) AS q3,
       ROUND((q3 + q1 - 2 * q2) / (q3 - q1), 6) AS bowley_skew
FROM q
ORDER BY segment
"""


@register("x157_bowley_skewness", oracle=_X157_SQL)
def x157_bowley_skewness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bowley (quartile) skewness of order totals per market
    segment — the robust skewness measure that needs no moments
    beyond rank statistics, so it is exact and outlier-immune
    where a third-moment skew is neither.

    Quartiles are rank-selected (value at row ceil(p*n) of the
    (value, orderkey)-sorted segment), NOT an engine quantile
    builtin: percentile_disc/quantile_disc boundary conventions
    differ across engines, rank selection does not. The skew ratio
    is 4 IEEE-exact ops on two selected data values.

    Scale: one window shuffle on segment (5 keys — for a skewed
    real key set the rank selection would ride on a pre-bucketed
    sort); the quartile pick is a same-pass conditional aggregate,
    no second scan.
    """
    from pyspark.sql import Window

    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    w = Window.partitionBy("segment").orderBy("v", "o_orderkey")
    seg = (
        orders.join(cust, orders.o_custkey == cust.c_custkey)
        .select(
            F.col("c_mktsegment").alias("segment"),
            F.col("o_totalprice").alias("v"),
            "o_orderkey",
        )
        .withColumn("r", F.row_number().over(w))
        .withColumn(
            "n", F.count("*").over(Window.partitionBy("segment"))
        )
    )

    def pick(p: float):
        return F.max(
            F.when(
                F.col("r")
                == F.ceil(F.lit(p) * F.col("n")).cast("bigint"),
                F.col("v"),
            )
        )

    q = seg.groupBy("segment").agg(
        pick(0.25).alias("q1"),
        pick(0.50).alias("q2"),
        pick(0.75).alias("q3"),
        F.max("n").cast("bigint").alias("n_orders"),
    )
    return q.select(
        "segment",
        "n_orders",
        F.round("q1", 2).alias("q1"),
        F.round("q2", 2).alias("q2"),
        F.round("q3", 2).alias("q3"),
        F.round(
            (F.col("q3") + F.col("q1") - 2 * F.col("q2"))
            / (F.col("q3") - F.col("q1")),
            6,
        ).alias("bowley_skew"),
    ).orderBy("segment")


# ---- x158: empirical-Bayes shrunk return rates per part ----

_X158_M = 20  # prior pseudo-count (shrinkage strength), literal

_X158_SQL = f"""
WITH per_part AS (
  SELECT l_partkey,
         CAST(SUM(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END)
              AS BIGINT) AS x,
         CAST(COUNT(*) AS BIGINT) AS n
  FROM lineitem GROUP BY l_partkey),
gstats AS (
  SELECT CAST(SUM(x) AS BIGINT) AS gx, CAST(SUM(n) AS BIGINT) AS gn
  FROM per_part)
SELECT p.l_partkey AS partkey, p.x AS n_returned, p.n AS n_lines,
       ROUND(CAST(p.x AS DOUBLE) / p.n, 6) AS raw_rate,
       ROUND((p.x + {_X158_M} * (CAST(g.gx AS DOUBLE) / g.gn))
             / (p.n + {_X158_M}), 6) AS shrunk_rate
FROM per_part p CROSS JOIN gstats g
ORDER BY (p.x + {_X158_M} * (CAST(g.gx AS DOUBLE) / g.gn))
           / (p.n + {_X158_M}) DESC,
         p.l_partkey
LIMIT 30
"""


@register("x158_eb_shrinkage", oracle=_X158_SQL)
def x158_eb_shrinkage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Empirical-Bayes shrinkage of per-part return rates toward
    the corpus rate (pseudo-count prior m=20): the standard cure
    for small-denominator leaderboards — a 3/3 part no longer
    outranks a 180/400 one. Complements x152's Wilson bound
    (frequentist) with the Bayesian posterior-mean view.

    shrunk = (x + m*p0) / (n + m), p0 the global rate — exact
    integer counts, the only doubles are two divisions and one
    multiply, structurally identical in both engines. Top-30 by
    the UNROUNDED shrunk rate with partkey tiebreak so the
    selected set is stable.

    Scale: one partial agg on partkey; the global rate is a 1-row
    broadcast; top-30 is a TakeOrderedAndProject (no full sort).
    """
    li = load_table(spark, sf_dir, "lineitem")
    per_part = li.groupBy("l_partkey").agg(
        F.sum(F.when(F.col("l_returnflag") == "R", 1).otherwise(0))
        .cast("bigint")
        .alias("x"),
        F.count("*").cast("bigint").alias("n"),
    )
    glob = per_part.agg(
        F.sum("x").cast("bigint").alias("gx"),
        F.sum("n").cast("bigint").alias("gn"),
    )
    m = F.lit(_X158_M)
    shrunk = (
        F.col("x") + m * (F.col("gx").cast("double") / F.col("gn"))
    ) / (F.col("n") + m)
    return (
        per_part.crossJoin(F.broadcast(glob))
        .select(
            F.col("l_partkey").alias("partkey"),
            F.col("x").alias("n_returned"),
            F.col("n").alias("n_lines"),
            F.round(F.col("x").cast("double") / F.col("n"), 6).alias(
                "raw_rate"
            ),
            F.round(shrunk, 6).alias("shrunk_rate"),
            shrunk.alias("_ord"),
        )
        .orderBy(F.desc("_ord"), "partkey")
        .limit(30)
        .drop("_ord")
    )


# ---- x159: character-class composition audit per language ----

_X159_SQL = """
WITH per_doc AS (
  SELECT lang,
         LENGTH(text) AS n_chars,
         LENGTH(REGEXP_REPLACE(text, '[^A-Za-z]', '', 'g')) AS n_alpha,
         LENGTH(REGEXP_REPLACE(text, '[^0-9]', '', 'g')) AS n_digit,
         LENGTH(REGEXP_REPLACE(text, '[^ ]', '', 'g')) AS n_space,
         LENGTH(REGEXP_REPLACE(text, '[\\x20-\\x7e]', '', 'g'))
           AS n_nonascii
  FROM documents)
SELECT lang,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(n_chars) AS BIGINT) AS total_chars,
       ROUND(CAST(SUM(n_alpha) AS DOUBLE) / SUM(n_chars), 6)
         AS alpha_ratio,
       ROUND(CAST(SUM(n_digit) AS DOUBLE) / SUM(n_chars), 6)
         AS digit_ratio,
       ROUND(CAST(SUM(n_space) AS DOUBLE) / SUM(n_chars), 6)
         AS space_ratio,
       ROUND(CAST(SUM(n_nonascii) AS DOUBLE) / SUM(n_chars), 6)
         AS nonascii_ratio
FROM per_doc
GROUP BY lang
ORDER BY lang
"""


@register("x159_charclass_audit", oracle=_X159_SQL)
def x159_charclass_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Character-class composition per language: alpha / digit /
    space / non-ASCII ratios over the corpus — the cheap encoding-
    health screen that catches mojibake, base64 blobs, and wrongly
    language-tagged shards before tokenization does (a claimed-'en'
    shard with 30% non-ASCII is a red flag).

    Counts are char-class removals (length minus length after
    deleting the class) with explicit byte-range/ASCII classes so
    Java regex and RE2 agree; ratios are integer totals with one
    division each.

    Scale: pure narrow maps + a languages-sized aggregate; regex
    runs once per class per doc inside codegen, no Python.
    """
    docs = load_table(spark, sf_dir, "documents")

    def n_keep(pat: str):
        return F.length(F.regexp_replace("text", pat, ""))

    per_doc = docs.select(
        "lang",
        F.length("text").alias("n_chars"),
        n_keep("[^A-Za-z]").alias("n_alpha"),
        n_keep("[^0-9]").alias("n_digit"),
        n_keep("[^ ]").alias("n_space"),
        n_keep("[\\x20-\\x7e]").alias("n_nonascii"),
    )

    def ratio(c: str):
        return F.round(
            F.sum(c).cast("double") / F.sum("n_chars"), 6
        ).alias(c.replace("n_", "") + "_ratio")

    return (
        per_doc.groupBy("lang")
        .agg(
            F.count("*").cast("bigint").alias("n_docs"),
            F.sum("n_chars").cast("bigint").alias("total_chars"),
            ratio("n_alpha"),
            ratio("n_digit"),
            ratio("n_space"),
            ratio("n_nonascii"),
        )
        .orderBy("lang")
    )


# ---- x160: customer spend-quartile migration matrix ----

_X160_CUT = "1998-01-01"  # literal period boundary (orders span 1995..2001)

_X160_SQL = f"""
WITH spend AS (
  SELECT o_custkey,
         CASE WHEN o_orderdate < TIMESTAMP '{_X160_CUT}'
              THEN 'early' ELSE 'late' END AS period,
         SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS s
  FROM orders GROUP BY o_custkey, period),
q AS (
  SELECT o_custkey, period,
         NTILE(4) OVER (PARTITION BY period ORDER BY s, o_custkey)
           AS quartile
  FROM spend),
m AS (
  SELECT COALESCE(e.o_custkey, l.o_custkey) AS ck,
         e.quartile AS q_early, l.quartile AS q_late
  FROM (SELECT * FROM q WHERE period = 'early') e
  FULL JOIN (SELECT * FROM q WHERE period = 'late') l
    ON e.o_custkey = l.o_custkey)
SELECT COALESCE(CAST(q_early AS VARCHAR), 'absent') AS q_early,
       COALESCE(CAST(q_late AS VARCHAR), 'absent') AS q_late,
       CAST(COUNT(*) AS BIGINT) AS n_customers
FROM m
GROUP BY q_early, q_late
ORDER BY q_early, q_late
"""


@register("x160_quartile_migration", oracle=_X160_SQL)
def x160_quartile_migration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customer spend-quartile migration matrix between the early
    and late halves of the order history — the churn/upsell
    transition view (Q4→Q1 = collapsing whales, absent→Q1 = big
    new logos). NTILE(4) per period over exact decimal spend with
    custkey tiebreak keeps bucket assignment deterministic; a full
    outer join surfaces entries/exits as 'absent'.

    Scale: spend agg shuffles once on (custkey, period); the NTILE
    needs a per-period global sort — at 100 TB that becomes a
    range-partitioned sort (Spark's default for window-over-
    period), not a single-task bottleneck, because period has 2
    values but rows within are range-partitioned by the ORDER BY
    prefix under AQE. The matrix itself is a 25-cell aggregate.
    """
    from pyspark.sql import Window

    orders = load_table(spark, sf_dir, "orders")
    spend = (
        orders.groupBy(
            "o_custkey",
            F.when(
                F.col("o_orderdate") < F.lit(_X160_CUT).cast("timestamp"),
                "early",
            )
            .otherwise("late")
            .alias("period"),
        )
        .agg(F.sum(F.col("o_totalprice").cast("decimal(18,2)")).alias("s"))
    )
    q = spend.withColumn(
        "quartile",
        F.ntile(4).over(
            Window.partitionBy("period").orderBy("s", "o_custkey")
        ),
    )
    e = q.where(F.col("period") == "early").select(
        F.col("o_custkey").alias("ck_e"), F.col("quartile").alias("qe")
    )
    late = q.where(F.col("period") == "late").select(
        F.col("o_custkey").alias("ck_l"), F.col("quartile").alias("ql")
    )
    m = e.join(late, e.ck_e == late.ck_l, "full_outer")
    return (
        m.groupBy(
            F.coalesce(F.col("qe").cast("string"), F.lit("absent")).alias(
                "q_early"
            ),
            F.coalesce(F.col("ql").cast("string"), F.lit("absent")).alias(
                "q_late"
            ),
        )
        .agg(F.count("*").cast("bigint").alias("n_customers"))
        .orderBy("q_early", "q_late")
    )


# ---- x161: chi-square independence, event type x weekday ----

_X161_SQL = """
WITH obs AS (
  SELECT event_type, CAST(DAYOFWEEK(CAST(ts AS DATE)) + 1 AS BIGINT) AS dow,
         CAST(COUNT(*) AS BIGINT) AS o
  FROM events GROUP BY event_type, dow),
rt AS (SELECT event_type, CAST(SUM(o) AS BIGINT) AS r FROM obs GROUP BY event_type),
ct AS (SELECT dow, CAST(SUM(o) AS BIGINT) AS c FROM obs GROUP BY dow),
tt AS (SELECT CAST(SUM(o) AS BIGINT) AS n FROM obs)
SELECT obs.event_type, obs.dow, obs.o AS n_obs,
       ROUND(CAST(rt.r AS DOUBLE) * ct.c / tt.n, 4) AS n_exp,
       ROUND((obs.o - CAST(rt.r AS DOUBLE) * ct.c / tt.n)
             * (obs.o - CAST(rt.r AS DOUBLE) * ct.c / tt.n)
             / (CAST(rt.r AS DOUBLE) * ct.c / tt.n), 6) AS chi2_term
FROM obs
JOIN rt ON obs.event_type = rt.event_type
JOIN ct ON obs.dow = ct.dow
CROSS JOIN tt
ORDER BY obs.event_type, obs.dow
"""


@register("x161_chi2_independence", oracle=_X161_SQL)
def x161_chi2_independence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chi-square independence screen for event type x weekday —
    the contingency-table test behind "does behavior differ by
    day" dashboards; per-cell expected counts and chi-square
    contributions localize WHERE the dependence is instead of one
    omnibus number (sum chi2_term downstream for the statistic).

    Expected = row_total * col_total / n — integer marginals, the
    double product/divide written with identical association in
    both engines; DuckDB's DAYOFWEEK is 0-based (Sunday=0) where
    Spark's is 1-based, so the oracle adds 1.

    Scale: one (type, dow) partial agg (35 cells); marginals are
    re-aggregations of the 35-row cell table, all broadcastable.
    """
    ev = load_table(spark, sf_dir, "events")
    obs = ev.groupBy(
        "event_type",
        F.dayofweek(F.col("ts").cast("date")).cast("bigint").alias("dow"),
    ).agg(F.count("*").cast("bigint").alias("o"))
    rt = obs.groupBy("event_type").agg(
        F.sum("o").cast("bigint").alias("r")
    )
    ct = obs.groupBy("dow").agg(F.sum("o").cast("bigint").alias("c"))
    tt = obs.agg(F.sum("o").cast("bigint").alias("n"))
    exp = F.col("r").cast("double") * F.col("c") / F.col("n")
    dev = F.col("o") - exp
    return (
        obs.join(F.broadcast(rt), "event_type")
        .join(F.broadcast(ct), "dow")
        .crossJoin(F.broadcast(tt))
        .select(
            "event_type",
            "dow",
            F.col("o").alias("n_obs"),
            F.round(exp, 4).alias("n_exp"),
            F.round(dev * dev / exp, 6).alias("chi2_term"),
        )
        .orderBy("event_type", "dow")
    )


# ---- x162: session-depth histogram (gap sessionization) ----

_X162_GAP_S = 1800  # 30-minute inactivity gap, literal

_X162_SQL = f"""
WITH e AS (
  SELECT user_id, ts, event_id,
         CASE WHEN LAG(ts) OVER w IS NULL
                OR CAST(FLOOR(EPOCH(ts)) AS BIGINT)
                   - CAST(FLOOR(EPOCH(LAG(ts) OVER w)) AS BIGINT)
                   > {_X162_GAP_S}
              THEN 1 ELSE 0 END AS is_start
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
s AS (
  SELECT user_id,
         SUM(is_start) OVER (PARTITION BY user_id ORDER BY ts, event_id
                             ROWS UNBOUNDED PRECEDING) AS session_no
  FROM e),
depth AS (
  SELECT user_id, session_no, CAST(COUNT(*) AS BIGINT) AS depth
  FROM s GROUP BY user_id, session_no),
tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_sessions FROM depth)
SELECT depth,
       CAST(COUNT(*) AS BIGINT) AS n_sessions,
       ROUND(CAST(COUNT(*) AS DOUBLE) / (SELECT n_sessions FROM tot), 6)
         AS session_share
FROM depth
GROUP BY depth
ORDER BY depth
"""


@register("x162_session_depth", oracle=_X162_SQL)
def x162_session_depth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session-depth histogram: sessionize by 30-minute inactivity
    gap (lag + running sum of session starts — the batch twin of
    x32's native session_window, but exposing per-session depth),
    then the distribution of events-per-session. The depth curve
    separates scanners (depth 1-2) from engaged flows, and its
    drift is a canary for instrumentation breaks.

    Timestamps floor to whole epoch seconds BEFORE differencing
    (Spark's unix_timestamp floors each side; DuckDB's EPOCH keeps
    fractions — floor-each matches exactly); all outputs
    are integer counts plus one share division.

    Scale: two streaming-frame windows over one user_id shuffle
    (lag and running sum share the same sort), a (user, session)
    agg that stays within the same partitioning, and a small
    depth histogram. No joins.
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
                > _X162_GAP_S
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
    depth = s.groupBy("user_id", "session_no").agg(
        F.count("*").cast("bigint").alias("depth")
    )
    tot = depth.agg(F.count("*").cast("bigint").alias("nt"))
    return (
        depth.groupBy("depth")
        .agg(F.count("*").cast("bigint").alias("n_sessions"))
        .crossJoin(F.broadcast(tot))
        .select(
            "depth",
            "n_sessions",
            F.round(
                F.col("n_sessions").cast("double") / F.col("nt"), 6
            ).alias("session_share"),
        )
        .orderBy("depth")
    )


# ---- x163: signup-to-purchase conversion-lag quartiles ----

_X163_SQL = """
WITH su AS (
  SELECT user_id, MIN(ts) AS signup_ts FROM events
  WHERE event_type = 'signup' GROUP BY user_id),
pu AS (
  SELECT e.user_id, MIN(e.ts) AS first_purchase_ts
  FROM events e JOIN su ON e.user_id = su.user_id
  WHERE e.event_type = 'purchase' AND e.ts >= su.signup_ts
  GROUP BY e.user_id),
lag_s AS (
  SELECT su.user_id,
         CAST(FLOOR(EPOCH(pu.first_purchase_ts)) AS BIGINT)
           - CAST(FLOOR(EPOCH(su.signup_ts)) AS BIGINT) AS delay_s
  FROM su JOIN pu ON su.user_id = pu.user_id),
r AS (
  SELECT delay_s,
         ROW_NUMBER() OVER (ORDER BY delay_s, user_id) AS rn,
         COUNT(*) OVER () AS n
  FROM lag_s)
SELECT CAST(MAX(n) AS BIGINT) AS n_converted,
       CAST(MAX(CASE WHEN rn = CAST(CEIL(0.25 * n) AS BIGINT)
                     THEN delay_s END) AS BIGINT) AS q1_s,
       CAST(MAX(CASE WHEN rn = CAST(CEIL(0.50 * n) AS BIGINT)
                     THEN delay_s END) AS BIGINT) AS median_s,
       CAST(MAX(CASE WHEN rn = CAST(CEIL(0.75 * n) AS BIGINT)
                     THEN delay_s END) AS BIGINT) AS q3_s
FROM r
"""


@register("x163_conversion_lag", oracle=_X163_SQL)
def x163_conversion_lag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Signup→first-purchase conversion lag, rank-exact quartiles
    in seconds — the activation-speed metric growth teams track
    (how long from account creation to first revenue). Only
    purchases at/after the user's first signup count, so replayed
    or out-of-order histories can't produce negative lags.

    Quartiles use the x157 rank-selection idiom (engine quantile
    builtins disagree at boundaries; row_number doesn't); the lag
    is an integer epoch difference end to end — no floats at all.

    Scale: two per-user min-aggregations share the user_id
    shuffle; the final quartile pick sorts only the converted-user
    lags (a per-user-bounded set, range-partitionable).
    """
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events")
    su = (
        ev.where(F.col("event_type") == "signup")
        .groupBy("user_id")
        .agg(F.min("ts").alias("signup_ts"))
    )
    pu = (
        ev.where(F.col("event_type") == "purchase")
        .join(su, "user_id")
        .where(F.col("ts") >= F.col("signup_ts"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("first_purchase_ts"))
    )
    lag_s = su.join(pu, "user_id").select(
        "user_id",
        (
            F.unix_timestamp("first_purchase_ts")
            - F.unix_timestamp("signup_ts")
        ).alias("delay_s"),
    )
    r = lag_s.select(
        "delay_s",
        F.row_number()
        .over(Window.orderBy("delay_s", "user_id"))
        .alias("rn"),
        F.count("*")
        .over(Window.partitionBy())
        .alias("n"),
    )

    def pick(p: float, name: str):
        return (
            F.max(
                F.when(
                    F.col("rn")
                    == F.ceil(F.lit(p) * F.col("n")).cast("bigint"),
                    F.col("delay_s"),
                )
            )
            .cast("bigint")
            .alias(name)
        )

    return r.agg(
        F.max("n").cast("bigint").alias("n_converted"),
        pick(0.25, "q1_s"),
        pick(0.50, "median_s"),
        pick(0.75, "q3_s"),
    )


# ---- x164: Pareto revenue-coverage points ----

_X164_SQL = """
WITH spend AS (
  SELECT o_custkey, SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS s
  FROM orders GROUP BY o_custkey),
ranked AS (
  SELECT s,
         ROW_NUMBER() OVER (ORDER BY s DESC, o_custkey) AS rn,
         SUM(s) OVER (ORDER BY s DESC, o_custkey
                      ROWS UNBOUNDED PRECEDING) AS cum_s,
         SUM(s) OVER () AS tot_s,
         COUNT(*) OVER () AS n_cust
  FROM spend),
pts AS (SELECT UNNEST(ARRAY[50, 80, 90]) AS pct)
SELECT p.pct AS threshold_pct,
       CAST(MIN(r.rn) AS BIGINT) AS n_customers,
       ROUND(CAST(MIN(r.rn) AS DOUBLE) / MAX(r.n_cust), 6)
         AS customer_share
FROM pts p JOIN ranked r ON r.cum_s * 100 >= r.tot_s * p.pct
GROUP BY p.pct
ORDER BY p.pct
"""


@register("x164_pareto_coverage", oracle=_X164_SQL)
def x164_pareto_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pareto revenue-coverage points: the minimum number (and
    share) of top customers covering 50/80/90% of revenue — the
    "is it really 80/20 here?" summary that x129's per-customer
    ABC classes roll up to, reduced to three auditable numbers.

    The coverage test compares exact decimals cross-multiplied
    (cum*100 >= tot*pct) — no float threshold, so the selected
    rank is unambiguous; the only double is the final share.

    Scale: per-customer spend agg, then one descending
    range-partitioned sort for the running sum; the three
    thresholds join against the ranked curve as a broadcast and
    reduce to MIN(rank) — the full curve is never collected.
    """
    from pyspark.sql import Window

    orders = load_table(spark, sf_dir, "orders")
    spend = orders.groupBy("o_custkey").agg(
        F.sum(F.col("o_totalprice").cast("decimal(18,2)")).alias("s")
    )
    wo = Window.orderBy(F.desc("s"), "o_custkey")
    ranked = spend.select(
        "s",
        F.row_number().over(wo).alias("rn"),
        F.sum("s")
        .over(wo.rowsBetween(Window.unboundedPreceding, 0))
        .alias("cum_s"),
        F.sum("s").over(Window.partitionBy()).alias("tot_s"),
        F.count("*").over(Window.partitionBy()).alias("n_cust"),
    )
    pts = spark.range(1).select(
        F.explode(F.array(F.lit(50), F.lit(80), F.lit(90))).alias("pct")
    )
    return (
        F.broadcast(pts)
        .join(ranked, ranked.cum_s * 100 >= ranked.tot_s * F.col("pct"))
        .groupBy(F.col("pct").alias("threshold_pct"))
        .agg(
            F.min("rn").cast("bigint").alias("n_customers"),
            F.round(
                F.min("rn").cast("double") / F.max("n_cust"), 6
            ).alias("customer_share"),
        )
        .orderBy("threshold_pct")
    )


# ---- x165: cross-language duplicate leakage ----

_X165_SQL = """
WITH fp AS (
  SELECT doc_id, lang,
         MD5(LOWER(REGEXP_REPLACE(text, '\\s+', ' ', 'g'))) AS f
  FROM documents),
grp AS (
  SELECT f,
         CAST(COUNT(*) AS BIGINT) AS n_docs,
         CAST(COUNT(DISTINCT lang) AS BIGINT) AS n_langs,
         MIN(lang) AS lang_a, MAX(lang) AS lang_b,
         MIN(doc_id) AS example_doc
  FROM fp GROUP BY f
  HAVING COUNT(*) >= 2)
SELECT f AS fingerprint, n_docs, n_langs,
       CASE WHEN n_langs >= 2 THEN TRUE ELSE FALSE END AS cross_lang,
       lang_a, lang_b, example_doc
FROM grp
ORDER BY n_langs DESC, n_docs DESC, fingerprint
"""


@register("x165_crosslang_dups", oracle=_X165_SQL)
def x165_crosslang_dups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-language duplicate leakage: identical canonical texts
    carrying DIFFERENT language tags — mislabeled shards or
    copy-paste leaks that silently poison per-language training
    mixes and language-ID evaluation sets. Same canonical md5 as
    x23's fingerprint; every duplicate group is emitted with a
    cross_lang flag (cross-language groups sort first) so the op
    is informative even when no leakage exists.

    Scale: narrow fingerprint map + one uniform-hash-key shuffle
    (md5 keys can't skew); the HAVING prunes to the (rare)
    leakage groups before anything is emitted.
    """
    docs = load_table(spark, sf_dir, "documents")
    norm = F.lower(F.regexp_replace("text", r"\s+", " "))
    fp = docs.select(
        "doc_id", "lang", F.md5(norm.cast("binary")).alias("f")
    )
    return (
        fp.groupBy("f")
        .agg(
            F.count("*").cast("bigint").alias("n_docs"),
            F.countDistinct("lang").cast("bigint").alias("n_langs"),
            F.min("lang").alias("lang_a"),
            F.max("lang").alias("lang_b"),
            F.min("doc_id").alias("example_doc"),
        )
        .where(F.col("n_docs") >= 2)
        .select(
            F.col("f").alias("fingerprint"),
            "n_docs",
            "n_langs",
            (F.col("n_langs") >= 2).alias("cross_lang"),
            "lang_a",
            "lang_b",
            "example_doc",
        )
        .orderBy(F.desc("n_langs"), F.desc("n_docs"), "fingerprint")
    )


# ---- x166: template / boilerplate prefix detection ----

_X166_K = 8  # prefix length in tokens, literal
_X166_MIN = 3  # minimum docs sharing a prefix to call it a template

_X166_SQL = f"""
WITH pref AS (
  SELECT doc_id, source,
         ARRAY_TO_STRING(STRING_SPLIT(text, ' ')[1:{_X166_K}], ' ')
           AS prefix
  FROM documents),
grp AS (
  SELECT prefix,
         CAST(COUNT(*) AS BIGINT) AS n_docs,
         CAST(COUNT(DISTINCT source) AS BIGINT) AS n_sources,
         MIN(doc_id) AS example_doc
  FROM pref GROUP BY prefix
  HAVING COUNT(*) >= {_X166_MIN})
SELECT prefix, n_docs, n_sources, example_doc
FROM grp
ORDER BY n_docs DESC, prefix
"""


@register("x166_template_prefixes", oracle=_X166_SQL)
def x166_template_prefixes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Template/boilerplate detection by shared token prefix: docs
    opening with the same first-{k} tokens (license headers, SEO
    boilerplate, scraper artifacts). Corpus prep downweights or
    strips these; the n_sources column separates a site template
    (1 source) from an ecosystem-wide phrase.

    Scale: the prefix is a narrow map (first {k} tokens only — no
    full-text shuffle; the GROUP BY key is a short string), one
    aggregate, HAVING-pruned output.
    """
    docs = load_table(spark, sf_dir, "documents")
    prefix = F.concat_ws(
        " ", F.slice(F.split(F.col("text"), " "), 1, _X166_K)
    )
    return (
        docs.select("doc_id", "source", prefix.alias("prefix"))
        .groupBy("prefix")
        .agg(
            F.count("*").cast("bigint").alias("n_docs"),
            F.countDistinct("source").cast("bigint").alias("n_sources"),
            F.min("doc_id").alias("example_doc"),
        )
        .where(F.col("n_docs") >= _X166_MIN)
        .orderBy(F.desc("n_docs"), "prefix")
    )


x166_template_prefixes.__doc__ = x166_template_prefixes.__doc__.format(
    k=_X166_K
)


# ---- x167: exact Pearson correlation (quantity vs discount) ----

_X167_SQL = """
WITH b AS (
  SELECT p.p_brand,
         CAST(l.l_quantity AS BIGINT) AS x,
         CAST(ROUND(l.l_discount * 100) AS BIGINT) AS y
  FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey),
s AS (
  SELECT p_brand,
         CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(y) AS BIGINT) AS sy,
         CAST(SUM(x * x) AS BIGINT) AS sxx,
         CAST(SUM(y * y) AS BIGINT) AS syy,
         CAST(SUM(x * y) AS BIGINT) AS sxy
  FROM b GROUP BY p_brand)
SELECT p_brand, n,
       ROUND(
         (CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE)
                                / CAST(n AS DOUBLE))
         / (SQRT(CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE)
                 * CAST(sx AS DOUBLE) / CAST(n AS DOUBLE))
            * SQRT(CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE)
                   * CAST(sy AS DOUBLE) / CAST(n AS DOUBLE))),
         6) AS pearson_r
FROM s
ORDER BY p_brand
"""


@register("x167_exact_correlation", oracle=_X167_SQL)
def x167_exact_correlation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact Pearson correlation of quantity vs discount per brand
    — "do discounts move volume?" — computed from INTEGER moment
    sums, not the engines' float-accumulating corr() builtins
    (whose summation order is partition-dependent and thus not
    cross-engine-stable). Discount scales to integer basis points;
    all five moments are exact bigint sums; the r formula is one
    fixed IEEE expression over their double casts.

    Scale: single partial-agg shuffle on brand; moment sums are
    map-side-combinable. At 100 TB the bigint moment sums would
    widen to DECIMAL(38,0) (x168 does) — the formula is unchanged.
    """
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    b = li.join(F.broadcast(part), li.l_partkey == part.p_partkey).select(
        "p_brand",
        F.col("l_quantity").cast("bigint").alias("x"),
        F.round(F.col("l_discount") * 100)
        .cast("bigint")
        .alias("y"),
    )
    s = b.groupBy("p_brand").agg(
        F.count("*").cast("bigint").alias("n"),
        F.sum("x").cast("bigint").alias("sx"),
        F.sum("y").cast("bigint").alias("sy"),
        F.sum(F.col("x") * F.col("x")).cast("bigint").alias("sxx"),
        F.sum(F.col("y") * F.col("y")).cast("bigint").alias("syy"),
        F.sum(F.col("x") * F.col("y")).cast("bigint").alias("sxy"),
    )
    d = lambda c: F.col(c).cast("double")  # noqa: E731
    r = (d("sxy") - d("sx") * d("sy") / d("n")) / (
        F.sqrt(d("sxx") - d("sx") * d("sx") / d("n"))
        * F.sqrt(d("syy") - d("sy") * d("sy") / d("n"))
    )
    return s.select(
        "p_brand", "n", F.round(r, 6).alias("pearson_r")
    ).orderBy("p_brand")


# ---- x168: daily-revenue autocorrelation (lags 1 and 7) ----

_X168_SQL = """
WITH daily AS (
  SELECT CAST(o_orderdate AS DATE) AS d,
         CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) * 100
              AS DECIMAL(19,0)) AS c
  FROM orders GROUP BY d),
lagged AS (
  SELECT c,
         LAG(c, 1) OVER (ORDER BY d) AS c1,
         LAG(c, 7) OVER (ORDER BY d) AS c7
  FROM daily),
pairs AS (
  SELECT 1 AS lag_days, c AS x, c1 AS y FROM lagged WHERE c1 IS NOT NULL
  UNION ALL
  SELECT 7 AS lag_days, c AS x, c7 AS y FROM lagged WHERE c7 IS NOT NULL),
s AS (
  SELECT lag_days,
         CAST(COUNT(*) AS BIGINT) AS n,
         SUM(x) AS sx, SUM(y) AS sy,
         SUM(x * y) AS sxy, SUM(x * x) AS sxx, SUM(y * y) AS syy
  FROM pairs GROUP BY lag_days)
SELECT CAST(lag_days AS BIGINT) AS lag_days, n,
       ROUND(
         (CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE)
                                / CAST(n AS DOUBLE))
         / (SQRT(CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE)
                 * CAST(sx AS DOUBLE) / CAST(n AS DOUBLE))
            * SQRT(CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE)
                   * CAST(sy AS DOUBLE) / CAST(n AS DOUBLE))),
         6) AS autocorr
FROM s
ORDER BY lag_days
"""


@register("x168_revenue_autocorr", oracle=_X168_SQL)
def x168_revenue_autocorr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Autocorrelation of daily revenue at lags 1 and 7 — the
    two-number seasonality screen (high lag-7, low lag-1 = weekly
    cycle; both high = trending). Pairs come from window LAG over
    the date-ordered series, never a self-join.

    Revenue days accumulate as exact decimal cents DECIMAL(19,0);
    cross-products widen to DECIMAL(38,0) where bigint would
    overflow at scale (cents² ~ 1e18+ per day-pair); the moment
    sums stay exact and the r formula is the same fixed IEEE
    expression as x167.

    Scale: the distributed agg is per-day revenue; the lag window
    runs over the calendar-bounded daily series (~2.4k rows), and
    the moments reduce to 2 rows.
    """
    from pyspark.sql import Window

    orders = load_table(spark, sf_dir, "orders")
    daily = (
        orders.groupBy(F.col("o_orderdate").cast("date").alias("d"))
        .agg(
            (F.sum(F.col("o_totalprice").cast("decimal(18,2)")) * 100)
            .cast("decimal(19,0)")
            .alias("c")
        )
    )
    w = Window.orderBy("d")
    lagged = daily.select(
        "c",
        F.lag("c", 1).over(w).alias("c1"),
        F.lag("c", 7).over(w).alias("c7"),
    )
    p1 = lagged.where(F.col("c1").isNotNull()).select(
        F.lit(1).alias("lag_days"),
        F.col("c").alias("x"),
        F.col("c1").alias("y"),
    )
    p7 = lagged.where(F.col("c7").isNotNull()).select(
        F.lit(7).alias("lag_days"),
        F.col("c").alias("x"),
        F.col("c7").alias("y"),
    )
    s = (
        p1.unionByName(p7)
        .groupBy("lag_days")
        .agg(
            F.count("*").cast("bigint").alias("n"),
            F.sum("x").alias("sx"),
            F.sum("y").alias("sy"),
            F.sum(F.col("x") * F.col("y")).alias("sxy"),
            F.sum(F.col("x") * F.col("x")).alias("sxx"),
            F.sum(F.col("y") * F.col("y")).alias("syy"),
        )
    )
    d = lambda c: F.col(c).cast("double")  # noqa: E731
    r = (d("sxy") - d("sx") * d("sy") / d("n")) / (
        F.sqrt(d("sxx") - d("sx") * d("sx") / d("n"))
        * F.sqrt(d("syy") - d("sy") * d("sy") / d("n"))
    )
    return s.select(
        F.col("lag_days").cast("bigint").alias("lag_days"),
        "n",
        F.round(r, 6).alias("autocorr"),
    ).orderBy("lag_days")


# ---- x169: order-to-ship delay percentiles per priority ----

_X169_SQL = """
WITH delays AS (
  SELECT o.o_orderpriority AS priority,
         CAST(DATEDIFF('day', CAST(o.o_orderdate AS DATE),
                       CAST(l.l_shipdate AS DATE)) AS BIGINT) AS delay_d,
         l.l_orderkey, l.l_linenumber
  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey),
r AS (
  SELECT priority, delay_d,
         ROW_NUMBER() OVER (PARTITION BY priority
                            ORDER BY delay_d, l_orderkey, l_linenumber)
           AS rn,
         COUNT(*) OVER (PARTITION BY priority) AS n
  FROM delays)
SELECT priority,
       CAST(MAX(n) AS BIGINT) AS n_lines,
       CAST(MAX(CASE WHEN rn = CAST(CEIL(0.50 * n) AS BIGINT)
                     THEN delay_d END) AS BIGINT) AS median_d,
       CAST(MAX(CASE WHEN rn = CAST(CEIL(0.90 * n) AS BIGINT)
                     THEN delay_d END) AS BIGINT) AS p90_d,
       CAST(MAX(CASE WHEN rn = CAST(CEIL(0.99 * n) AS BIGINT)
                     THEN delay_d END) AS BIGINT) AS p99_d
FROM r
GROUP BY priority
ORDER BY priority
"""


@register("x169_ship_delay_percentiles", oracle=_X169_SQL)
def x169_ship_delay_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order-to-ship delay tail percentiles (p50/p90/p99, days) per
    order priority — the fulfillment-SLA view; if URGENT's p99
    matches LOW's, the priority flag is decorative. Rank-exact
    selection (x157 idiom) with (orderkey, linenumber) tiebreaks;
    delays are integer day differences.

    Scale: the fact-fact join is on l_orderkey (co-partitioned
    shuffle, no skew — order keys are unique); one window shuffle
    on the 5-value priority key. For a truly-skewed partition key
    the rank pick would ride a range-partitioned sort instead;
    q72's approx-percentile twin is the sketch path at 100 TB.
    """
    from pyspark.sql import Window

    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    delays = li.join(orders, li.l_orderkey == orders.o_orderkey).select(
        F.col("o_orderpriority").alias("priority"),
        F.datediff(
            F.col("l_shipdate").cast("date"),
            F.col("o_orderdate").cast("date"),
        )
        .cast("bigint")
        .alias("delay_d"),
        "l_orderkey",
        "l_linenumber",
    )
    w = Window.partitionBy("priority").orderBy(
        "delay_d", "l_orderkey", "l_linenumber"
    )
    r = delays.withColumn("rn", F.row_number().over(w)).withColumn(
        "n", F.count("*").over(Window.partitionBy("priority"))
    )

    def pick(p: float, name: str):
        return (
            F.max(
                F.when(
                    F.col("rn")
                    == F.ceil(F.lit(p) * F.col("n")).cast("bigint"),
                    F.col("delay_d"),
                )
            )
            .cast("bigint")
            .alias(name)
        )

    return (
        r.groupBy("priority")
        .agg(
            F.max("n").cast("bigint").alias("n_lines"),
            pick(0.50, "median_d"),
            pick(0.90, "p90_d"),
            pick(0.99, "p99_d"),
        )
        .orderBy("priority")
    )


# ---- x170: price-decile revenue mix ----

_X170_SQL = """
WITH pd AS (
  SELECT p_partkey,
         NTILE(10) OVER (ORDER BY p_retailprice, p_partkey) AS price_decile
  FROM part),
rev AS (
  SELECT pd.price_decile,
         CAST(COUNT(*) AS BIGINT) AS n_lines,
         SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))
             * (CAST(1 AS DECIMAL(6,4))
                - CAST(l.l_discount AS DECIMAL(6,4)))) AS rev
  FROM lineitem l JOIN pd ON l.l_partkey = pd.p_partkey
  GROUP BY pd.price_decile),
tot AS (SELECT SUM(rev) AS tot_rev FROM rev)
SELECT CAST(r.price_decile AS BIGINT) AS price_decile,
       r.n_lines,
       ROUND(CAST(r.rev AS DOUBLE) / 1, 2) AS revenue,
       ROUND(CAST(r.rev AS DOUBLE) / CAST(t.tot_rev AS DOUBLE), 6)
         AS revenue_share
FROM rev r CROSS JOIN tot t
ORDER BY price_decile
"""


@register("x170_price_decile_mix", oracle=_X170_SQL)
def x170_price_decile_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue mix across catalog price deciles — does revenue come
    from the cheap tail or the premium head? (Assortment strategy's
    first chart.) Parts are NTILE(10)-bucketed by retail price with
    partkey tiebreak; revenue accumulates with the exact q01
    decimal convention and shares divide the decimal totals' double
    casts once.

    Scale: the decile assignment sorts only the part dim (tiny vs
    the fact table) and broadcasts it into the fact join; one
    10-key aggregate + a 1-row total broadcast.
    """
    from pyspark.sql import Window

    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    pd_ = part.select(
        "p_partkey",
        F.ntile(10)
        .over(Window.orderBy("p_retailprice", "p_partkey"))
        .alias("price_decile"),
    )
    disc = (
        F.col("l_extendedprice").cast("decimal(18,2)")
        * (F.lit(1).cast("decimal(6,4)") - F.col("l_discount").cast("decimal(6,4)"))
    )
    rev = (
        li.join(F.broadcast(pd_), li.l_partkey == pd_.p_partkey)
        .groupBy("price_decile")
        .agg(
            F.count("*").cast("bigint").alias("n_lines"),
            F.sum(disc).alias("rev"),
        )
    )
    tot = rev.agg(F.sum("rev").alias("tot_rev"))
    return (
        rev.crossJoin(F.broadcast(tot))
        .select(
            F.col("price_decile").cast("bigint").alias("price_decile"),
            "n_lines",
            F.round(F.col("rev").cast("double") / 1, 2).alias("revenue"),
            F.round(
                F.col("rev").cast("double") / F.col("tot_rev").cast("double"),
                6,
            ).alias("revenue_share"),
        )
        .orderBy("price_decile")
    )


# ---- x171: column-profile audit (completeness / cardinality) ----

_X171_COLS = (
    "o_orderkey",
    "o_custkey",
    "o_orderstatus",
    "o_totalprice",
    "o_orderdate",
    "o_orderpriority",
)

_X171_SQL = "UNION ALL".join(
    f"""
SELECT '{c}' AS column_name,
       CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(COUNT(*) - COUNT({c}) AS BIGINT) AS n_nulls,
       CAST(COUNT(DISTINCT {c}) AS BIGINT) AS n_distinct,
       ROUND(CAST(COUNT(*) - COUNT({c}) AS DOUBLE) / COUNT(*), 6)
         AS null_rate,
       ROUND(CAST(COUNT(DISTINCT {c}) AS DOUBLE) / COUNT(*), 6)
         AS distinct_rate
FROM orders
"""
    for c in _X171_COLS
) + "ORDER BY column_name"


@register("x171_column_profile", oracle=_X171_SQL)
def x171_column_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Column-profile audit over orders (the Deequ/dbt-test shape):
    per-column row count, null count, distinct cardinality, and
    the derived completeness/uniqueness rates — the profiling
    pass every ingest pipeline runs before trusting a new drop.
    o_orderkey's distinct_rate of 1.0 doubles as the PK-uniqueness
    check.

    Scale (r11, guide §2.3): the old single multi-distinct aggregate
    planned an Expand that multiplied every scanned row by
    N_COLUMNS+1 before the partial agg. Each column now profiles in
    its own branch — group by the column's values (map-side partial
    collapses to the column's cardinality), then count groups /
    non-null groups / total rows from the tiny group table — and the
    six 6-field rows union. Each branch's scan reads ONE column
    (columnar pruning), so total I/O equals the old single scan
    without the 7× row multiplication; integer counts, two divisions
    per row.
    """
    orders = load_table(spark, sf_dir, "orders")
    branches = []
    for c in _X171_COLS:
        grp = orders.groupBy(F.col(c).alias("__v")).agg(
            F.count("*").alias("__cnt")
        )
        branches.append(
            grp.agg(
                F.lit(c).alias("column_name"),
                F.sum("__cnt").cast("bigint").alias("n_rows"),
                F.coalesce(
                    F.sum(F.when(F.col("__v").isNull(), F.col("__cnt"))),
                    F.lit(0),
                )
                .cast("bigint")
                .alias("n_nulls"),
                F.count(F.col("__v")).cast("bigint").alias("n_distinct"),
            )
        )
    long = branches[0]
    for b in branches[1:]:
        long = long.unionByName(b)
    return long.select(
        "column_name",
        "n_rows",
        "n_nulls",
        "n_distinct",
        F.round(F.col("n_nulls").cast("double") / F.col("n_rows"), 6).alias(
            "null_rate"
        ),
        F.round(
            F.col("n_distinct").cast("double") / F.col("n_rows"), 6
        ).alias("distinct_rate"),
    ).orderBy("column_name")


# ---- x172: referential-integrity audit over the star schema ----

_X172_EDGES = (
    ("lineitem", "l_orderkey", "orders", "o_orderkey"),
    ("lineitem", "l_partkey", "part", "p_partkey"),
    ("lineitem", "l_suppkey", "supplier", "s_suppkey"),
    ("orders", "o_custkey", "customer", "c_custkey"),
    ("customer", "c_nationkey", "nation", "n_nationkey"),
    ("supplier", "s_nationkey", "nation", "n_nationkey"),
    ("nation", "n_regionkey", "region", "r_regionkey"),
)

_X172_SQL = "UNION ALL".join(
    f"""
SELECT '{ct}.{ck}->{pt}' AS fk_edge,
       CAST(COUNT(*) AS BIGINT) AS n_child_rows,
       CAST(SUM(CASE WHEN {ck} IS NOT NULL AND NOT EXISTS
                  (SELECT 1 FROM {pt} p WHERE p.{pk} = c.{ck})
                THEN 1 ELSE 0 END) AS BIGINT) AS n_orphans
FROM {ct} c
"""
    for ct, ck, pt, pk in _X172_EDGES
) + "ORDER BY fk_edge"


@register("x172_fk_integrity", oracle=_X172_SQL)
def x172_fk_integrity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Referential-integrity audit across every FK edge of the
    star schema: orphan counts per edge (child keys with no parent
    row; NULL keys are not violations). The one-table answer to
    "can I trust my joins?" — run before any fact-dim query, and
    the reference's T16 count-audit generalized to relationships.

    Scale: each edge is a LEFT ANTI join counting survivors —
    dim-parent edges broadcast the parent key set; the
    lineitem→orders edge shuffles on the (unique, unskewed) order
    key. Edges are independent — Spark runs the union's legs in
    parallel.
    """
    out = None
    for ct, ck, pt, pk in _X172_EDGES:
        child = load_table(spark, sf_dir, ct)
        parent = load_table(spark, sf_dir, pt).select(pk).distinct()
        n_child = child.agg(
            F.count("*").cast("bigint").alias("n_child_rows")
        )
        orphans = (
            child.where(F.col(ck).isNotNull())
            .join(parent, child[ck] == parent[pk], "left_anti")
            .agg(F.count("*").cast("bigint").alias("n_orphans"))
        )
        leg = (
            n_child.crossJoin(orphans)
            .select(
                F.lit(f"{ct}.{ck}->{pt}").alias("fk_edge"),
                "n_child_rows",
                "n_orphans",
            )
        )
        out = leg if out is None else out.unionByName(leg)
    return out.orderBy("fk_edge")


# ---- x173: within-session event-type co-occurrence lift ----

_X173_SQL = """
WITH e AS (
  SELECT user_id, ts, event_id, event_type,
         CASE WHEN LAG(ts) OVER w IS NULL
                OR CAST(FLOOR(EPOCH(ts)) AS BIGINT)
                   - CAST(FLOOR(EPOCH(LAG(ts) OVER w)) AS BIGINT) > 1800
              THEN 1 ELSE 0 END AS is_start
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
s AS (
  SELECT user_id, event_type,
         SUM(is_start) OVER (PARTITION BY user_id ORDER BY ts, event_id
                             ROWS UNBOUNDED PRECEDING) AS session_no
  FROM e),
st AS (
  SELECT DISTINCT user_id, session_no, event_type FROM s),
ns AS (SELECT CAST(COUNT(DISTINCT (user_id, session_no)) AS BIGINT)
         AS n_sessions FROM st),
tcount AS (
  SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n FROM st
  GROUP BY event_type),
pairs AS (
  SELECT a.event_type AS type_a, b.event_type AS type_b,
         CAST(COUNT(*) AS BIGINT) AS n_both
  FROM st a JOIN st b
    ON a.user_id = b.user_id AND a.session_no = b.session_no
   AND a.event_type < b.event_type
  GROUP BY type_a, type_b)
SELECT p.type_a, p.type_b, p.n_both,
       ta.n AS n_a, tb.n AS n_b,
       ROUND(CAST(p.n_both AS DOUBLE) * ns.n_sessions
             / (CAST(ta.n AS DOUBLE) * tb.n), 6) AS lift
FROM pairs p
JOIN tcount ta ON p.type_a = ta.event_type
JOIN tcount tb ON p.type_b = tb.event_type
CROSS JOIN ns
ORDER BY type_a, type_b
"""


@register("x173_session_cooccurrence", oracle=_X173_SQL)
def x173_session_cooccurrence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Within-session event-type co-occurrence lift: which event
    types appear in the SAME session more (or less) than chance —
    x139's market-basket association transplanted from order
    baskets to behavioral sessions (x162's gap sessionization).
    lift < 1 on (error, purchase) is the kind of signal this
    surfaces.

    Counts are session-distinct integers; lift is one double
    expression over them, identically associated in both engines.

    Scale: sessionization shares x162's single user_id window
    shuffle; the pair join is per-(user, session) — sessions are
    inactivity-bounded, so each side is a handful of distinct
    types (≤5 here), never a corpus-wide self-join.
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
    # r11 (guide §1.2/§2.4): the old shape re-derived the
    # sessionization + distinct for every consumer (session count,
    # type counts, and BOTH self-join sides — four lineages) and
    # shuffled the (user, session, type) stream three more times.
    # Fold each session's distinct types into ONE sorted array —
    # the groupBy(user_id, session_no) is satisfied by the window's
    # existing user_id partitioning, so no new exchange — persist
    # the session-grain rows, and every consumer becomes a narrow
    # derivation: session count = count, type counts = explode,
    # co-occurrence = intra-array pair emission (sessions hold ≤5
    # distinct types). The corpus crosses one exchange, once.
    sess = (
        s.groupBy("user_id", "session_no")
        .agg(F.array_sort(F.collect_set("event_type")).alias("types"))
        .persist()
    )
    ns = sess.agg(F.count("*").cast("bigint").alias("n_sessions"))
    tcount = (
        sess.select(F.explode("types").alias("event_type"))
        .groupBy("event_type")
        .agg(F.count("*").cast("bigint").alias("n"))
    )
    pairs = (
        sess.select("types", F.posexplode("types").alias("i", "ta"))
        .select(
            F.col("ta").alias("type_a"),
            F.explode(
                F.slice("types", F.col("i") + 2, F.size("types"))
            ).alias("type_b"),
        )
        .groupBy("type_a", "type_b")
        .agg(F.count("*").cast("bigint").alias("n_both"))
    )
    ta = tcount.select(
        F.col("event_type").alias("type_a"), F.col("n").alias("n_a")
    )
    tb = tcount.select(
        F.col("event_type").alias("type_b"), F.col("n").alias("n_b")
    )
    out = (
        pairs.join(F.broadcast(ta), "type_a")
        .join(F.broadcast(tb), "type_b")
        .crossJoin(F.broadcast(ns))
        .select(
            "type_a",
            "type_b",
            "n_both",
            "n_a",
            "n_b",
            F.round(
                F.col("n_both").cast("double") * F.col("n_sessions")
                / (F.col("n_a").cast("double") * F.col("n_b")),
                6,
            ).alias("lift"),
        )
        .orderBy("type_a", "type_b")
    )
    out._cached_deps = [sess]
    return out


# ---- x174: user lifespan histogram ----

_X174_SQL = """
WITH span AS (
  SELECT user_id,
         CAST(DATEDIFF('day', MIN(CAST(ts AS DATE)),
                       MAX(CAST(ts AS DATE))) AS BIGINT) AS lifespan_d
  FROM events GROUP BY user_id),
b AS (
  SELECT CASE WHEN lifespan_d = 0 THEN 'a_single_day'
              WHEN lifespan_d <= 7 THEN 'b_week'
              WHEN lifespan_d <= 30 THEN 'c_month'
              WHEN lifespan_d <= 90 THEN 'd_quarter'
              ELSE 'e_longer' END AS lifespan_bucket,
         lifespan_d
  FROM span),
t AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_users FROM b)
SELECT lifespan_bucket,
       CAST(COUNT(*) AS BIGINT) AS n_users,
       CAST(MIN(lifespan_d) AS BIGINT) AS min_d,
       CAST(MAX(lifespan_d) AS BIGINT) AS max_d,
       ROUND(CAST(COUNT(*) AS DOUBLE) / (SELECT n_users FROM t), 6)
         AS user_share
FROM b
GROUP BY lifespan_bucket
ORDER BY lifespan_bucket
"""


@register("x174_user_lifespan", oracle=_X174_SQL)
def x174_user_lifespan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """User lifespan histogram: days between a user's first and
    last observed event, bucketed (single-day / week / month /
    quarter / longer) — the cheap proxy for cohort longevity that
    pairs with x127's Kaplan-Meier curve (this is the realized
    spans; KM handles the censoring).

    Integer day differences and counts; one share division.
    Bucket labels carry a sort prefix so ordering is stable
    lexically in both engines.

    Scale: one per-user min/max agg (map-side combinable), then a
    5-bucket rollup with a 1-row total broadcast.
    """
    ev = load_table(spark, sf_dir, "events")
    span = ev.groupBy("user_id").agg(
        F.datediff(
            F.max(F.col("ts").cast("date")),
            F.min(F.col("ts").cast("date")),
        )
        .cast("bigint")
        .alias("lifespan_d")
    )
    b = span.select(
        F.when(F.col("lifespan_d") == 0, "a_single_day")
        .when(F.col("lifespan_d") <= 7, "b_week")
        .when(F.col("lifespan_d") <= 30, "c_month")
        .when(F.col("lifespan_d") <= 90, "d_quarter")
        .otherwise("e_longer")
        .alias("lifespan_bucket"),
        "lifespan_d",
    )
    t = b.agg(F.count("*").cast("bigint").alias("nt"))
    return (
        b.groupBy("lifespan_bucket")
        .agg(
            F.count("*").cast("bigint").alias("n_users"),
            F.min("lifespan_d").cast("bigint").alias("min_d"),
            F.max("lifespan_d").cast("bigint").alias("max_d"),
        )
        .crossJoin(F.broadcast(t))
        .select(
            "lifespan_bucket",
            "n_users",
            "min_d",
            "max_d",
            F.round(
                F.col("n_users").cast("double") / F.col("nt"), 6
            ).alias("user_share"),
        )
        .orderBy("lifespan_bucket")
    )


# ---- x175: emerging terms between corpus halves ----

_X175_SQL = """
WITH mid AS (
  SELECT CAST(FLOOR(MAX(doc_id) / 2) AS BIGINT) AS m FROM documents),
tok AS (
  SELECT CASE WHEN d.doc_id <= mid.m THEN 'early' ELSE 'late' END
           AS half,
         UNNEST(STRING_SPLIT(LOWER(d.text), ' ')) AS token
  FROM documents d CROSS JOIN mid),
cnt AS (
  SELECT half, token, CAST(COUNT(*) AS BIGINT) AS n
  FROM tok GROUP BY half, token),
tot AS (
  SELECT half, CAST(SUM(n) AS BIGINT) AS t FROM cnt GROUP BY half),
m AS (
  SELECT COALESCE(e.token, l.token) AS token,
         COALESCE(e.n, 0) AS n_early, COALESCE(l.n, 0) AS n_late
  FROM (SELECT token, n FROM cnt WHERE half = 'early') e
  FULL JOIN (SELECT token, n FROM cnt WHERE half = 'late') l
    ON e.token = l.token),
j AS (
  SELECT m.token, m.n_early, m.n_late,
         te.t AS tot_early, tl.t AS tot_late
  FROM m
  CROSS JOIN (SELECT t FROM tot WHERE half = 'early') te
  CROSS JOIN (SELECT t FROM tot WHERE half = 'late') tl)
SELECT token, n_early, n_late,
       ROUND((CAST(n_late AS DOUBLE) / tot_late)
             / ((n_early + 1.0) / tot_early), 4) AS growth,
       n_late * tot_early >= 2 * (n_early + 1) * tot_late AS emerging
FROM j
WHERE n_late >= 10
ORDER BY (CAST(n_late AS DOUBLE) / tot_late)
           / ((n_early + 1.0) / tot_early) DESC,
         token
LIMIT 30
"""


@register("x175_emerging_terms", oracle=_X175_SQL)
def x175_emerging_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Emerging-term detection: tokens whose frequency share in the
    late half of the corpus (doc_id order as ingestion order)
    outgrows their early-half share — the trending-vocabulary
    monitor that catches topic drift and spam campaigns between
    crawl snapshots. Emits the top-30 growth leaderboard with an
    `emerging` flag at the 2x bar (a flag, not a filter, so the
    leaderboard is informative even on a stationary corpus).
    Add-one smoothing on the early count admits genuinely new
    terms without dividing by zero.

    The 2x flag cross-multiplies INTEGER counts (no float
    threshold); the growth ratio is one fixed double expression,
    and top-30 orders by the unrounded ratio with token tiebreak.

    Scale (r11, guide §1.2/§2.4): one explode + ONE token-keyed
    partial agg with conditional early/late sums — the old
    (half, token) aggregate re-derived for the totals and BOTH
    full-outer join sides (four corpus lineages, two token re-keys)
    collapses into a single pass whose conditional sums make the
    full-outer join and its COALESCEs fall out arithmetically
    (a token absent from a half sums 0 there). Totals are a second
    vocab-sized aggregate broadcast as one row; top-30 is
    TakeOrdered.
    """
    docs = load_table(spark, sf_dir, "documents")
    mid = docs.agg(
        F.floor(F.max("doc_id") / 2).cast("bigint").alias("m")
    )
    tok = (
        docs.crossJoin(F.broadcast(mid))
        .select(
            (F.col("doc_id") <= F.col("m")).alias("is_early"),
            F.explode(F.split(F.lower("text"), " ")).alias("token"),
        )
    )
    m = tok.groupBy("token").agg(
        F.sum(F.when(F.col("is_early"), 1).otherwise(0))
        .cast("bigint")
        .alias("n_early"),
        F.sum(F.when(~F.col("is_early"), 1).otherwise(0))
        .cast("bigint")
        .alias("n_late"),
    )
    tots = m.agg(
        F.sum("n_early").cast("bigint").alias("tot_early"),
        F.sum("n_late").cast("bigint").alias("tot_late"),
    )
    j = m.crossJoin(F.broadcast(tots))
    growth = (F.col("n_late").cast("double") / F.col("tot_late")) / (
        (F.col("n_early") + F.lit(1.0)) / F.col("tot_early")
    )
    return (
        j.where(F.col("n_late") >= 10)
        .select(
            "token",
            "n_early",
            "n_late",
            F.round(growth, 4).alias("growth"),
            (
                F.col("n_late") * F.col("tot_early")
                >= 2 * (F.col("n_early") + 1) * F.col("tot_late")
            ).alias("emerging"),
            growth.alias("_g"),
        )
        .orderBy(F.desc("_g"), "token")
        .limit(30)
        .drop("_g")
    )


# ---- x176: dedup token-inflation estimate per source ----

_X176_SQL = """
WITH fp AS (
  SELECT doc_id, source,
         LEN(STRING_SPLIT(text, ' ')) AS n_tokens,
         MD5(LOWER(REGEXP_REPLACE(text, '\\s+', ' ', 'g'))) AS f
  FROM documents),
flagged AS (
  SELECT source, n_tokens,
         CASE WHEN doc_id > MIN(doc_id) OVER (PARTITION BY f)
              THEN 1 ELSE 0 END AS is_dup_copy
  FROM fp)
SELECT source,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(is_dup_copy) AS BIGINT) AS n_dup_copies,
       CAST(SUM(n_tokens) AS BIGINT) AS tokens_total,
       CAST(SUM(CASE WHEN is_dup_copy = 1 THEN n_tokens ELSE 0 END)
            AS BIGINT) AS tokens_dup,
       ROUND(CAST(SUM(CASE WHEN is_dup_copy = 1 THEN n_tokens ELSE 0 END)
                  AS DOUBLE) / SUM(n_tokens), 6) AS dup_token_share
FROM flagged
GROUP BY source
ORDER BY source
"""


@register("x176_dedup_inflation", oracle=_X176_SQL)
def x176_dedup_inflation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dedup token-inflation estimate: per source, how many TOKENS
    (not docs) exact dedup would remove — the number that matters
    for training budgets, since a source can be 2% duplicate docs
    but 30% duplicate tokens if its dups are long. Keeper = lowest
    doc_id per canonical fingerprint (x01's rule); everything else
    is a dup copy whose tokens count as removable.

    Integer token sums; one share division per source.

    Scale: narrow fingerprint map, one window over the
    uniform-hash fingerprint key (no skew possible), then a
    per-source rollup. Token counts ride along — no second pass
    over text.
    """
    from pyspark.sql import Window

    docs = load_table(spark, sf_dir, "documents")
    norm = F.lower(F.regexp_replace("text", r"\s+", " "))
    fp = docs.select(
        "doc_id",
        "source",
        F.size(F.split(F.col("text"), " ")).alias("n_tokens"),
        F.md5(norm.cast("binary")).alias("f"),
    )
    flagged = fp.select(
        "source",
        "n_tokens",
        F.when(
            F.col("doc_id")
            > F.min("doc_id").over(Window.partitionBy("f")),
            1,
        )
        .otherwise(0)
        .alias("is_dup_copy"),
    )
    dup_tokens = F.sum(
        F.when(F.col("is_dup_copy") == 1, F.col("n_tokens")).otherwise(0)
    )
    return (
        flagged.groupBy("source")
        .agg(
            F.count("*").cast("bigint").alias("n_docs"),
            F.sum("is_dup_copy").cast("bigint").alias("n_dup_copies"),
            F.sum("n_tokens").cast("bigint").alias("tokens_total"),
            dup_tokens.cast("bigint").alias("tokens_dup"),
            F.round(
                dup_tokens.cast("double") / F.sum("n_tokens"), 6
            ).alias("dup_token_share"),
        )
        .orderBy("source")
    )


# ---- x177: quantity-weighted median discount per brand ----

_X177_SQL = """
WITH w AS (
  SELECT p.p_brand,
         CAST(ROUND(l.l_discount * 100) AS BIGINT) AS disc_pct,
         CAST(l.l_quantity AS BIGINT) AS wt,
         l.l_orderkey, l.l_linenumber
  FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey),
r AS (
  SELECT p_brand, disc_pct, wt,
         SUM(wt) OVER (PARTITION BY p_brand
                       ORDER BY disc_pct, l_orderkey, l_linenumber
                       ROWS UNBOUNDED PRECEDING) AS cum_wt,
         SUM(wt) OVER (PARTITION BY p_brand) AS tot_wt
  FROM w)
SELECT p_brand,
       CAST(MAX(tot_wt) AS BIGINT) AS total_qty,
       CAST(MIN(CASE WHEN 2 * cum_wt >= tot_wt THEN disc_pct END)
            AS BIGINT) AS wmedian_disc_pct
FROM r
GROUP BY p_brand
ORDER BY p_brand
"""


@register("x177_weighted_median", oracle=_X177_SQL)
def x177_weighted_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantity-weighted median discount per brand — "what discount
    does the median UNIT ship at?" — which differs from the plain
    line-level median whenever big orders get deeper discounts.
    The weighted-quantile shape (running weight sum, first value
    where 2*cum >= total) generalizes the x157 rank-exact idiom to
    weighted data; the threshold cross-multiplies integers, so no
    float appears anywhere in the query.

    Scale: one window shuffle on brand with a streaming running
    sum (same sort serves both window sums); the pick is a
    conditional MIN in the same pass. Weights and values are
    integer-scaled (quantity units, discount percent).
    """
    from pyspark.sql import Window

    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    w = li.join(F.broadcast(part), li.l_partkey == part.p_partkey).select(
        "p_brand",
        F.round(F.col("l_discount") * 100).cast("bigint").alias("disc_pct"),
        F.col("l_quantity").cast("bigint").alias("wt"),
        "l_orderkey",
        "l_linenumber",
    )
    wo = Window.partitionBy("p_brand").orderBy(
        "disc_pct", "l_orderkey", "l_linenumber"
    )
    r = w.select(
        "p_brand",
        "disc_pct",
        F.sum("wt")
        .over(wo.rowsBetween(Window.unboundedPreceding, 0))
        .alias("cum_wt"),
        F.sum("wt").over(Window.partitionBy("p_brand")).alias("tot_wt"),
    )
    return (
        r.groupBy("p_brand")
        .agg(
            F.max("tot_wt").cast("bigint").alias("total_qty"),
            F.min(
                F.when(
                    2 * F.col("cum_wt") >= F.col("tot_wt"),
                    F.col("disc_pct"),
                )
            )
            .cast("bigint")
            .alias("wmedian_disc_pct"),
        )
        .orderBy("p_brand")
    )


# ---- x178: price-volume decomposition of revenue growth ----

_X178_CUT = "1998-01-01"  # same literal period boundary as x160

_X178_SQL = f"""
WITH li AS (
  SELECT p.p_brand,
         CASE WHEN o.o_orderdate < TIMESTAMP '{_X178_CUT}'
              THEN 'early' ELSE 'late' END AS period,
         CAST(l.l_quantity AS BIGINT) AS qty,
         CAST(l.l_extendedprice AS DECIMAL(18,2)) AS ext
  FROM lineitem l
  JOIN orders o ON l.l_orderkey = o.o_orderkey
  JOIN part p ON l.l_partkey = p.p_partkey),
agg AS (
  SELECT p_brand, period,
         CAST(SUM(qty) AS BIGINT) AS q, SUM(ext) AS rev
  FROM li GROUP BY p_brand, period),
wide AS (
  SELECT p_brand,
         MAX(CASE WHEN period = 'early' THEN q END) AS q0,
         MAX(CASE WHEN period = 'late' THEN q END) AS q1,
         MAX(CASE WHEN period = 'early' THEN rev END) AS r0,
         MAX(CASE WHEN period = 'late' THEN rev END) AS r1
  FROM agg GROUP BY p_brand
  HAVING MAX(CASE WHEN period = 'early' THEN q END) IS NOT NULL
     AND MAX(CASE WHEN period = 'late' THEN q END) IS NOT NULL)
SELECT p_brand,
       ROUND(CAST(r1 - r0 AS DOUBLE), 2) AS delta_rev,
       ROUND((CAST(q1 AS DOUBLE) - CAST(q0 AS DOUBLE))
             * (CAST(r0 AS DOUBLE) / CAST(q0 AS DOUBLE)), 2)
         AS volume_effect,
       ROUND(CAST(q1 AS DOUBLE)
             * (CAST(r1 AS DOUBLE) / CAST(q1 AS DOUBLE)
                - CAST(r0 AS DOUBLE) / CAST(q0 AS DOUBLE)), 2)
         AS price_effect
FROM wide
ORDER BY p_brand
"""


@register("x178_price_volume_decomp", oracle=_X178_SQL)
def x178_price_volume_decomp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Price-volume decomposition of revenue change per brand
    between the early/late halves: Δrev = volume effect (unit
    growth at old realized price) + price effect (new units times
    realized-price change) — the classic Laspeyres-style growth
    bridge that tells finance WHERE the delta came from (the two
    effects sum exactly to delta_rev by construction).

    Quantities are integer sums and revenue exact decimal; the
    effects are fixed double expressions over their casts,
    identically associated in both engines.

    Scale: one 3-table join (part/orders broadcastable or
    key-co-partitioned), a (brand, period) partial agg, then a
    25-row pivot — nothing post-agg exceeds brand cardinality.
    """
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    part = load_table(spark, sf_dir, "part")
    rows = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .select(
            "p_brand",
            F.when(
                F.col("o_orderdate") < F.lit(_X178_CUT).cast("timestamp"),
                "early",
            )
            .otherwise("late")
            .alias("period"),
            F.col("l_quantity").cast("bigint").alias("qty"),
            F.col("l_extendedprice").cast("decimal(18,2)").alias("ext"),
        )
    )
    agg = rows.groupBy("p_brand", "period").agg(
        F.sum("qty").cast("bigint").alias("q"),
        F.sum("ext").alias("rev"),
    )
    wide = (
        agg.groupBy("p_brand")
        .agg(
            F.max(F.when(F.col("period") == "early", F.col("q"))).alias("q0"),
            F.max(F.when(F.col("period") == "late", F.col("q"))).alias("q1"),
            F.max(F.when(F.col("period") == "early", F.col("rev"))).alias("r0"),
            F.max(F.when(F.col("period") == "late", F.col("rev"))).alias("r1"),
        )
        .where(F.col("q0").isNotNull() & F.col("q1").isNotNull())
    )
    d = lambda c: F.col(c).cast("double")  # noqa: E731
    return wide.select(
        "p_brand",
        F.round((F.col("r1") - F.col("r0")).cast("double"), 2).alias(
            "delta_rev"
        ),
        F.round(
            (d("q1") - d("q0")) * (d("r0") / d("q0")), 2
        ).alias("volume_effect"),
        F.round(
            d("q1") * (d("r1") / d("q1") - d("r0") / d("q0")), 2
        ).alias("price_effect"),
    ).orderBy("p_brand")


# ---- x179: cart abandonment by session depth ----

_X179_SQL = """
WITH e AS (
  SELECT user_id, ts, event_id, event_type,
         CASE WHEN LAG(ts) OVER w IS NULL
                OR CAST(FLOOR(EPOCH(ts)) AS BIGINT)
                   - CAST(FLOOR(EPOCH(LAG(ts) OVER w)) AS BIGINT) > 1800
              THEN 1 ELSE 0 END AS is_start
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
s AS (
  SELECT user_id, event_type,
         SUM(is_start) OVER (PARTITION BY user_id ORDER BY ts, event_id
                             ROWS UNBOUNDED PRECEDING) AS session_no
  FROM e),
sess AS (
  SELECT user_id, session_no,
         CAST(COUNT(*) AS BIGINT) AS depth,
         MAX(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS has_click,
         MAX(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
           AS has_purchase
  FROM s GROUP BY user_id, session_no),
b AS (
  SELECT CASE WHEN depth <= 2 THEN 'a_shallow_1_2'
              WHEN depth <= 5 THEN 'b_mid_3_5'
              ELSE 'c_deep_6plus' END AS depth_bucket,
         has_click, has_purchase
  FROM sess WHERE has_click = 1)
SELECT depth_bucket,
       CAST(COUNT(*) AS BIGINT) AS n_click_sessions,
       CAST(SUM(1 - has_purchase) AS BIGINT) AS n_abandoned,
       ROUND(CAST(SUM(1 - has_purchase) AS DOUBLE) / COUNT(*), 6)
         AS abandonment_rate
FROM b
GROUP BY depth_bucket
ORDER BY depth_bucket
"""


@register("x179_cart_abandonment", oracle=_X179_SQL)
def x179_cart_abandonment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cart abandonment by session depth: of sessions containing a
    click, how many end without a purchase — split by session
    depth (shallow sessions abandoning is browsing; deep sessions
    abandoning is a checkout problem). Third member of the x162
    gap-sessionization family; flags are conditional MAXes in the
    per-session aggregate, the rate one integer division.

    Scale: identical shuffle profile to x162 (one user_id window,
    per-session agg in the same partitioning, 3-bucket rollup).
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
    sess = s.groupBy("user_id", "session_no").agg(
        F.count("*").cast("bigint").alias("depth"),
        F.max(
            F.when(F.col("event_type") == "click", 1).otherwise(0)
        ).alias("has_click"),
        F.max(
            F.when(F.col("event_type") == "purchase", 1).otherwise(0)
        ).alias("has_purchase"),
    )
    b = sess.where(F.col("has_click") == 1).select(
        F.when(F.col("depth") <= 2, "a_shallow_1_2")
        .when(F.col("depth") <= 5, "b_mid_3_5")
        .otherwise("c_deep_6plus")
        .alias("depth_bucket"),
        "has_purchase",
    )
    return (
        b.groupBy("depth_bucket")
        .agg(
            F.count("*").cast("bigint").alias("n_click_sessions"),
            F.sum(1 - F.col("has_purchase"))
            .cast("bigint")
            .alias("n_abandoned"),
        )
        .select(
            "depth_bucket",
            "n_click_sessions",
            "n_abandoned",
            F.round(
                F.col("n_abandoned").cast("double")
                / F.col("n_click_sessions"),
                6,
            ).alias("abandonment_rate"),
        )
        .orderBy("depth_bucket")
    )


# ---- x180: order-frequency dispersion (over/under-dispersion) ----

_X180_SQL = """
WITH c AS (
  SELECT o_custkey, CAST(COUNT(*) AS BIGINT) AS k
  FROM orders GROUP BY o_custkey),
s AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(k) AS BIGINT) AS sk,
         CAST(SUM(k * k) AS BIGINT) AS skk,
         CAST(MIN(k) AS BIGINT) AS min_orders,
         CAST(MAX(k) AS BIGINT) AS max_orders
  FROM c)
SELECT n AS n_customers, sk AS n_orders, min_orders, max_orders,
       ROUND(CAST(sk AS DOUBLE) / n, 6) AS mean_orders,
       ROUND((CAST(skk AS DOUBLE) - CAST(sk AS DOUBLE)
              * CAST(sk AS DOUBLE) / CAST(n AS DOUBLE))
             / (CAST(n AS DOUBLE) - 1), 6) AS var_orders,
       ROUND(((CAST(skk AS DOUBLE) - CAST(sk AS DOUBLE)
               * CAST(sk AS DOUBLE) / CAST(n AS DOUBLE))
              / (CAST(n AS DOUBLE) - 1))
             / (CAST(sk AS DOUBLE) / n), 6) AS dispersion_index
FROM s
"""


@register("x180_order_dispersion", oracle=_X180_SQL)
def x180_order_dispersion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order-frequency dispersion index (variance-to-mean ratio of
    orders per customer): ~1 = Poisson purchasing, >1 =
    heavy-repeat clumping (negative-binomial world, loyalty
    programs matter), <1 = suspiciously regular (bot or quota
    behavior). The per-entity cousin of x119's term burstiness,
    on transactions instead of tokens.

    Sample variance comes from exact integer moment sums (x167
    machinery) in one fixed double expression.

    Scale: per-customer count then a single 1-row moment reduce —
    two map-side-combinable aggregations, no shuffle wider than
    customer count.
    """
    orders = load_table(spark, sf_dir, "orders")
    c = orders.groupBy("o_custkey").agg(
        F.count("*").cast("bigint").alias("k")
    )
    s = c.agg(
        F.count("*").cast("bigint").alias("n"),
        F.sum("k").cast("bigint").alias("sk"),
        F.sum(F.col("k") * F.col("k")).cast("bigint").alias("skk"),
        F.min("k").cast("bigint").alias("min_orders"),
        F.max("k").cast("bigint").alias("max_orders"),
    )
    d = lambda col: F.col(col).cast("double")  # noqa: E731
    var = (d("skk") - d("sk") * d("sk") / d("n")) / (d("n") - 1)
    return s.select(
        F.col("n").alias("n_customers"),
        F.col("sk").alias("n_orders"),
        "min_orders",
        "max_orders",
        F.round(d("sk") / F.col("n"), 6).alias("mean_orders"),
        F.round(var, 6).alias("var_orders"),
        F.round(var / (d("sk") / F.col("n")), 6).alias(
            "dispersion_index"
        ),
    )


# ---- x181: vocabulary coverage curve ----

_X181_KS = (100, 1000, 10000)

_X181_SQL = f"""
WITH tok AS (
  SELECT UNNEST(STRING_SPLIT(LOWER(text), ' ')) AS t FROM documents),
cnt AS (
  SELECT t, CAST(COUNT(*) AS BIGINT) AS n FROM tok GROUP BY t),
ranked AS (
  SELECT n,
         ROW_NUMBER() OVER (ORDER BY n DESC, t) AS rnk,
         SUM(n) OVER (ORDER BY n DESC, t ROWS UNBOUNDED PRECEDING)
           AS cum_n,
         SUM(n) OVER () AS tot_n,
         COUNT(*) OVER () AS vocab_size
  FROM cnt),
ks AS (SELECT UNNEST(ARRAY{list(_X181_KS)}) AS k)
SELECT CAST(ks.k AS BIGINT) AS vocab_k,
       CAST(MAX(r.vocab_size) AS BIGINT) AS full_vocab,
       CAST(MAX(CASE WHEN r.rnk = LEAST(ks.k, r.vocab_size)
                     THEN r.cum_n END) AS BIGINT) AS covered_tokens,
       CAST(MAX(r.tot_n) AS BIGINT) AS total_tokens,
       ROUND(CAST(MAX(CASE WHEN r.rnk = LEAST(ks.k, r.vocab_size)
                           THEN r.cum_n END) AS DOUBLE)
             / MAX(r.tot_n), 6) AS coverage
FROM ks CROSS JOIN ranked r
GROUP BY ks.k
ORDER BY vocab_k
"""


@register("x181_vocab_coverage", oracle=_X181_SQL)
def x181_vocab_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vocabulary coverage curve: what share of all token
    occurrences the top-k most frequent types cover, for k in
    {ks} — the tokenizer-budget planning number (how big a vocab
    before OOV rate is acceptable; pairs with x82's OOV rate for
    a FIXED vocab and x91's Heaps growth). Frequency ties break
    lexically so the top-k set is deterministic.

    Scale: one token count (Zipf head collapses map-side), one
    descending range-partitioned running sum over the type table
    (types ≪ tokens), and a 3-point probe joined as a broadcast.
    """
    from pyspark.sql import Window

    docs = load_table(spark, sf_dir, "documents")
    cnt = (
        docs.select(F.explode(F.split(F.lower("text"), " ")).alias("t"))
        .groupBy("t")
        .agg(F.count("*").cast("bigint").alias("n"))
    )
    wo = Window.orderBy(F.desc("n"), "t")
    ranked = cnt.select(
        "n",
        F.row_number().over(wo).alias("rnk"),
        F.sum("n")
        .over(wo.rowsBetween(Window.unboundedPreceding, 0))
        .alias("cum_n"),
        F.sum("n").over(Window.partitionBy()).alias("tot_n"),
        F.count("*").over(Window.partitionBy()).alias("vocab_size"),
    )
    ks = spark.range(1).select(
        F.explode(
            F.array(*[F.lit(k) for k in _X181_KS])
        ).alias("k")
    )
    hit = F.when(
        F.col("rnk") == F.least(F.col("k"), F.col("vocab_size")),
        F.col("cum_n"),
    )
    return (
        F.broadcast(ks)
        .crossJoin(ranked)
        .groupBy(F.col("k").cast("bigint").alias("vocab_k"))
        .agg(
            F.max("vocab_size").cast("bigint").alias("full_vocab"),
            F.max(hit).cast("bigint").alias("covered_tokens"),
            F.max("tot_n").cast("bigint").alias("total_tokens"),
            F.round(
                F.max(hit).cast("double") / F.max("tot_n"), 6
            ).alias("coverage"),
        )
        .orderBy("vocab_k")
    )


x181_vocab_coverage.__doc__ = x181_vocab_coverage.__doc__.format(
    ks=_X181_KS
)


# ---- x182: token-anomaly rates (OCR/boilerplate garbage screen) ----

_X182_SQL = """
WITH tok AS (
  SELECT source, UNNEST(STRING_SPLIT(text, ' ')) AS t FROM documents),
f AS (
  SELECT source,
         CASE WHEN LENGTH(t) > 20 THEN 1 ELSE 0 END AS is_long,
         CASE WHEN REGEXP_MATCHES(t, '[A-Za-z]')
               AND REGEXP_MATCHES(t, '[0-9]') THEN 1 ELSE 0 END
           AS is_mixed,
         CASE WHEN NOT REGEXP_MATCHES(t, '[A-Za-z0-9]') AND t <> ''
              THEN 1 ELSE 0 END AS is_nonword
  FROM tok)
SELECT source,
       CAST(COUNT(*) AS BIGINT) AS n_tokens,
       CAST(SUM(is_long) AS BIGINT) AS n_long,
       CAST(SUM(is_mixed) AS BIGINT) AS n_mixed_alnum,
       CAST(SUM(is_nonword) AS BIGINT) AS n_nonword,
       ROUND(CAST(SUM(is_long + is_mixed + is_nonword) AS DOUBLE)
             / COUNT(*), 6) AS anomaly_rate
FROM f
GROUP BY source
ORDER BY source
"""


@register("x182_token_anomalies", oracle=_X182_SQL)
def x182_token_anomalies(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-anomaly screen per source: overlong tokens (>20
    chars — URLs, concatenation bugs), mixed letter-digit tokens
    (OCR noise, serials), and no-alphanumeric tokens (markup
    shrapnel). High rates mark sources needing a cleaning pass
    before tokenizer training; the complement of x159's char-level
    audit at token granularity.

    Flags are regex class tests (identical in Java regex / RE2);
    integer sums, one division.

    Scale: explode + per-source partial agg, nothing wider than
    source cardinality; flags evaluate inside codegen.
    """
    docs = load_table(spark, sf_dir, "documents")
    t = F.col("t")
    f = docs.select(
        "source", F.explode(F.split(F.col("text"), " ")).alias("t")
    ).select(
        "source",
        F.when(F.length(t) > 20, 1).otherwise(0).alias("is_long"),
        F.when(
            t.rlike("[A-Za-z]") & t.rlike("[0-9]"), 1
        )
        .otherwise(0)
        .alias("is_mixed"),
        F.when(
            (~t.rlike("[A-Za-z0-9]")) & (t != ""), 1
        )
        .otherwise(0)
        .alias("is_nonword"),
    )
    return (
        f.groupBy("source")
        .agg(
            F.count("*").cast("bigint").alias("n_tokens"),
            F.sum("is_long").cast("bigint").alias("n_long"),
            F.sum("is_mixed").cast("bigint").alias("n_mixed_alnum"),
            F.sum("is_nonword").cast("bigint").alias("n_nonword"),
            F.round(
                F.sum(
                    F.col("is_long")
                    + F.col("is_mixed")
                    + F.col("is_nonword")
                ).cast("double")
                / F.count("*"),
                6,
            ).alias("anomaly_rate"),
        )
        .orderBy("source")
    )


# ---- x183: monthly new-vs-returning revenue bridge ----

_X183_SQL = """
WITH o AS (
  SELECT o_custkey,
         STRFTIME(DATE_TRUNC('month', CAST(o_orderdate AS DATE)),
                  '%Y-%m') AS month,
         CAST(o_totalprice AS DECIMAL(18,2)) AS price,
         MIN(STRFTIME(DATE_TRUNC('month', CAST(o_orderdate AS DATE)),
                      '%Y-%m'))
           OVER (PARTITION BY o_custkey) AS first_month
  FROM orders)
SELECT month,
       CAST(COUNT(DISTINCT CASE WHEN month = first_month
                                THEN o_custkey END) AS BIGINT)
         AS n_new_customers,
       CAST(SUM(CASE WHEN month = first_month THEN price
                     ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE)
         AS new_revenue,
       CAST(SUM(CASE WHEN month <> first_month THEN price
                     ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE)
         AS returning_revenue,
       ROUND(CAST(SUM(CASE WHEN month = first_month THEN price
                           ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE)
             / CAST(SUM(price) AS DOUBLE), 6) AS new_share
FROM o
GROUP BY month
ORDER BY month
"""


@register("x183_revenue_bridge", oracle=_X183_SQL)
def x183_revenue_bridge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Monthly revenue bridge: new-customer revenue (orders in the
    customer's first-ever month) vs returning revenue — the
    growth-accounting decomposition ("are we growing by
    acquisition or retention?") that x101's cohort retention
    matrix summarizes one level up. A customer's cohort month
    comes from a window MIN, so no self-join against a first-order
    subquery.

    Revenue stays exact decimal through the conditional sums (the
    ELSE arm is a decimal zero to keep the accumulator type
    exact); shares divide the double casts once.

    Scale: one window over o_custkey (partial agg impossible for
    window-min, but the same shuffle also serves the month
    rollup's input); month cardinality output. At 100 TB the
    first-month map is a one-time dimension one would materialize.
    """
    from pyspark.sql import Window

    orders = load_table(spark, sf_dir, "orders")
    month = F.date_format(
        F.date_trunc("month", F.col("o_orderdate").cast("date")),
        "yyyy-MM",
    )
    o = orders.select(
        "o_custkey",
        month.alias("month"),
        F.col("o_totalprice").cast("decimal(18,2)").alias("price"),
    ).withColumn(
        "first_month",
        F.min("month").over(Window.partitionBy("o_custkey")),
    )
    is_new = F.col("month") == F.col("first_month")
    zero = F.lit(0).cast("decimal(18,2)")
    new_rev = F.sum(F.when(is_new, F.col("price")).otherwise(zero))
    ret_rev = F.sum(F.when(~is_new, F.col("price")).otherwise(zero))
    return (
        o.groupBy("month")
        .agg(
            F.countDistinct(
                F.when(is_new, F.col("o_custkey"))
            )
            .cast("bigint")
            .alias("n_new_customers"),
            new_rev.cast("double").alias("new_revenue"),
            ret_rev.cast("double").alias("returning_revenue"),
            F.round(
                new_rev.cast("double")
                / F.sum("price").cast("double"),
                6,
            ).alias("new_share"),
        )
        .orderBy("month")
    )


# ---- x184: CLV-lite per market segment ----

_X184_SQL = """
WITH per_cust AS (
  SELECT c.c_mktsegment AS segment, o.o_custkey,
         CAST(COUNT(*) AS BIGINT) AS n_orders,
         SUM(CAST(o.o_totalprice AS DECIMAL(18,2))) AS spend,
         CAST(DATEDIFF('day', MIN(CAST(o.o_orderdate AS DATE)),
                       MAX(CAST(o.o_orderdate AS DATE))) AS BIGINT)
           AS active_days
  FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
  GROUP BY segment, o.o_custkey)
SELECT segment,
       CAST(COUNT(*) AS BIGINT) AS n_customers,
       CAST(SUM(n_orders) AS BIGINT) AS n_orders,
       ROUND(CAST(SUM(spend) AS DOUBLE) / SUM(n_orders), 2)
         AS avg_order_value,
       ROUND(CAST(SUM(n_orders) AS DOUBLE) / COUNT(*), 4)
         AS orders_per_customer,
       ROUND(CAST(SUM(active_days) AS DOUBLE) / COUNT(*), 2)
         AS avg_active_days,
       ROUND(CAST(SUM(spend) AS DOUBLE) / COUNT(*), 2)
         AS clv_realized
FROM per_cust
GROUP BY segment
ORDER BY segment
"""


@register("x184_clv_segments", oracle=_X184_SQL)
def x184_clv_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CLV-lite per market segment: realized customer lifetime
    value decomposed into its drivers (average order value x
    orders per customer), plus average active span — the
    back-of-envelope LTV model that x130's cohort LTV curve
    refines over time. All inputs are exact decimal/integer sums
    aggregated once per customer then once per segment; each
    emitted ratio is a single double division.

    Scale: customer-grain agg (one shuffle on custkey, dim join
    broadcast), then a 5-row segment rollup of already-exact
    partials — the two-level pattern that keeps the big shuffle on
    the high-cardinality key where partial aggregation bites.
    """
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    per_cust = (
        orders.join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .groupBy(F.col("c_mktsegment").alias("segment"), "o_custkey")
        .agg(
            F.count("*").cast("bigint").alias("n_orders"),
            F.sum(F.col("o_totalprice").cast("decimal(18,2)")).alias(
                "spend"
            ),
            F.datediff(
                F.max(F.col("o_orderdate").cast("date")),
                F.min(F.col("o_orderdate").cast("date")),
            )
            .cast("bigint")
            .alias("active_days"),
        )
    )
    return (
        per_cust.groupBy("segment")
        .agg(
            F.count("*").cast("bigint").alias("n_customers"),
            F.sum("n_orders").cast("bigint").alias("n_orders"),
            F.round(
                F.sum("spend").cast("double") / F.sum("n_orders"), 2
            ).alias("avg_order_value"),
            F.round(
                F.sum("n_orders").cast("double") / F.count("*"), 4
            ).alias("orders_per_customer"),
            F.round(
                F.sum("active_days").cast("double") / F.count("*"), 2
            ).alias("avg_active_days"),
            F.round(
                F.sum("spend").cast("double") / F.count("*"), 2
            ).alias("clv_realized"),
        )
        .orderBy("segment")
    )


# ---- x185: winsorized mean order value ----

_X185_SQL = """
WITH r AS (
  SELECT o_totalprice AS v,
         ROW_NUMBER() OVER (ORDER BY o_totalprice, o_orderkey) AS rn,
         COUNT(*) OVER () AS n
  FROM orders),
caps AS (
  SELECT MAX(CASE WHEN rn = CAST(CEIL(0.01 * n) AS BIGINT)
                  THEN v END) AS lo,
         MAX(CASE WHEN rn = CAST(CEIL(0.99 * n) AS BIGINT)
                  THEN v END) AS hi,
         CAST(MAX(n) AS BIGINT) AS n
  FROM r),
w AS (
  SELECT CAST(LEAST(GREATEST(o.o_totalprice, c.lo), c.hi)
              AS DECIMAL(18,2)) AS wv,
         CAST(o.o_totalprice AS DECIMAL(18,2)) AS v,
         c.n, c.lo, c.hi
  FROM orders o CROSS JOIN caps c)
SELECT MAX(n) AS n_orders,
       ROUND(MAX(lo), 2) AS p01_cap, ROUND(MAX(hi), 2) AS p99_cap,
       ROUND(CAST(SUM(v) AS DOUBLE) / MAX(n), 2) AS raw_mean,
       ROUND(CAST(SUM(wv) AS DOUBLE) / MAX(n), 2) AS winsorized_mean
FROM w
"""


@register("x185_winsorized_mean", oracle=_X185_SQL)
def x185_winsorized_mean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winsorized mean order value (1%/99% caps): the robust
    average that reports what typical orders look like with the
    whale and penny tails clamped — the difference against the
    raw mean IS the outlier influence, in dollars. Caps are
    rank-exact data values (x157 idiom), clamping happens
    pre-cast, and both means accumulate as exact decimals.

    Scale: one global sort for the two cap ranks (at 100 TB: a
    range-partitioned sort or q72's approx-percentile twin), then
    a broadcast of the 1-row caps into a second scan — two passes,
    both shuffle-light.
    """
    from pyspark.sql import Window

    orders = load_table(spark, sf_dir, "orders")
    r = orders.select(
        F.col("o_totalprice").alias("v"),
        F.row_number()
        .over(Window.orderBy("o_totalprice", "o_orderkey"))
        .alias("rn"),
        F.count("*").over(Window.partitionBy()).alias("n"),
    )

    def cap(p: float, name: str):
        return F.max(
            F.when(
                F.col("rn")
                == F.ceil(F.lit(p) * F.col("n")).cast("bigint"),
                F.col("v"),
            )
        ).alias(name)

    caps = r.agg(
        cap(0.01, "lo"), cap(0.99, "hi"), F.max("n").cast("bigint").alias("n")
    )
    w = orders.crossJoin(F.broadcast(caps)).select(
        F.least(
            F.greatest(F.col("o_totalprice"), F.col("lo")), F.col("hi")
        )
        .cast("decimal(18,2)")
        .alias("wv"),
        F.col("o_totalprice").cast("decimal(18,2)").alias("v"),
        "n",
        "lo",
        "hi",
    )
    return w.agg(
        F.max("n").alias("n_orders"),
        F.round(F.max("lo"), 2).alias("p01_cap"),
        F.round(F.max("hi"), 2).alias("p99_cap"),
        F.round(F.sum("v").cast("double") / F.max("n"), 2).alias(
            "raw_mean"
        ),
        F.round(F.sum("wv").cast("double") / F.max("n"), 2).alias(
            "winsorized_mean"
        ),
    )


# ---- x186: CR-3 concentration ratio per brand ----

_X186_SQL = """
WITH rev AS (
  SELECT p.p_brand, l.l_partkey,
         CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))
                  * (CAST(1 AS DECIMAL(6,4))
                     - CAST(l.l_discount AS DECIMAL(6,4)))) * 1000000
              AS DECIMAL(19,0)) AS rev_u
  FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
  GROUP BY p.p_brand, l.l_partkey),
rk AS (
  SELECT p_brand, rev_u,
         ROW_NUMBER() OVER (PARTITION BY p_brand
                            ORDER BY rev_u DESC, l_partkey) AS rn
  FROM rev)
SELECT p_brand,
       CAST(COUNT(*) AS BIGINT) AS n_parts,
       ROUND(CAST(SUM(CASE WHEN rn <= 3 THEN rev_u
                           ELSE CAST(0 AS DECIMAL(19,0)) END) AS DOUBLE)
             / CAST(SUM(rev_u) AS DOUBLE), 6) AS cr3
FROM rk
GROUP BY p_brand
ORDER BY p_brand
"""


@register("x186_cr3_concentration", oracle=_X186_SQL)
def x186_cr3_concentration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CR-3 concentration per brand: revenue share of each brand's
    top-3 parts — the discrete cousin of x153's HHI (CR-k answers
    "how hit-driven is this brand?"; HHI weighs the whole
    distribution). Revenue uses the exact micro-unit decimals;
    the top-3 rank breaks ties by partkey; one double division
    per brand at the end.

    Scale: (brand, part) partial agg, one brand-keyed window
    (bounded per-brand part lists), same-pass conditional sum —
    no join back to the fact table.
    """
    from pyspark.sql import Window

    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    disc = (
        F.col("l_extendedprice").cast("decimal(18,2)")
        * (F.lit(1).cast("decimal(6,4)") - F.col("l_discount").cast("decimal(6,4)"))
    )
    rev = (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .groupBy("p_brand", "l_partkey")
        .agg(
            (F.sum(disc) * 1000000)
            .cast("decimal(19,0)")
            .alias("rev_u")
        )
    )
    rk = rev.withColumn(
        "rn",
        F.row_number().over(
            Window.partitionBy("p_brand").orderBy(
                F.desc("rev_u"), "l_partkey"
            )
        ),
    )
    zero = F.lit(0).cast("decimal(19,0)")
    return (
        rk.groupBy("p_brand")
        .agg(
            F.count("*").cast("bigint").alias("n_parts"),
            F.round(
                F.sum(
                    F.when(F.col("rn") <= 3, F.col("rev_u")).otherwise(
                        zero
                    )
                ).cast("double")
                / F.sum("rev_u").cast("double"),
                6,
            ).alias("cr3"),
        )
        .orderBy("p_brand")
    )


# ---- x189: single-source supply risk per brand ----

_X189_SQL = """
WITH ps AS (
  SELECT l_partkey,
         CAST(COUNT(DISTINCT l_suppkey) AS BIGINT) AS n_suppliers
  FROM lineitem GROUP BY l_partkey),
j AS (
  SELECT p.p_brand, ps.n_suppliers
  FROM ps JOIN part p ON ps.l_partkey = p.p_partkey)
SELECT p_brand,
       CAST(COUNT(*) AS BIGINT) AS n_parts_traded,
       CAST(SUM(CASE WHEN n_suppliers = 1 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_single_source,
       ROUND(CAST(SUM(CASE WHEN n_suppliers = 1 THEN 1 ELSE 0 END)
                  AS DOUBLE) / COUNT(*), 6) AS single_source_share,
       ROUND(CAST(SUM(n_suppliers) AS DOUBLE) / COUNT(*), 4)
         AS avg_suppliers_per_part
FROM j
GROUP BY p_brand
ORDER BY p_brand
"""


@register("x189_single_source_risk", oracle=_X189_SQL)
def x189_single_source_risk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Single-source supply risk per brand: the share of traded
    parts with exactly one observed supplier — procurement's
    resilience metric (a single-source part is a production stop
    waiting for one bankruptcy). Distinct-supplier counts are
    integers; shares one division each.

    Scale: a (partkey, suppkey)-keyed distinct then partkey
    rollup (both ride the same shuffle under partial-distinct
    aggregation); part dim joins broadcast; brand-sized output.
    """
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    ps = li.groupBy("l_partkey").agg(
        F.countDistinct("l_suppkey").cast("bigint").alias("n_suppliers")
    )
    j = ps.join(F.broadcast(part), ps.l_partkey == part.p_partkey)
    single = F.sum(
        F.when(F.col("n_suppliers") == 1, 1).otherwise(0)
    )
    return (
        j.groupBy("p_brand")
        .agg(
            F.count("*").cast("bigint").alias("n_parts_traded"),
            single.cast("bigint").alias("n_single_source"),
            F.round(
                single.cast("double") / F.count("*"), 6
            ).alias("single_source_share"),
            F.round(
                F.sum("n_suppliers").cast("double") / F.count("*"), 4
            ).alias("avg_suppliers_per_part"),
        )
        .orderBy("p_brand")
    )


# ---- x190: order fulfillment-spread histogram ----

_X190_SQL = """
WITH spread AS (
  SELECT l_orderkey,
         CAST(COUNT(*) AS BIGINT) AS n_lines,
         CAST(DATEDIFF('day', MIN(CAST(l_shipdate AS DATE)),
                       MAX(CAST(l_shipdate AS DATE))) AS BIGINT)
           AS spread_d
  FROM lineitem GROUP BY l_orderkey),
b AS (
  SELECT CASE WHEN n_lines = 1 THEN 'a_single_line'
              WHEN spread_d = 0 THEN 'b_same_day'
              WHEN spread_d <= 7 THEN 'c_within_week'
              WHEN spread_d <= 30 THEN 'd_within_month'
              ELSE 'e_fragmented' END AS spread_bucket,
         spread_d
  FROM spread),
t AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM b)
SELECT spread_bucket,
       CAST(COUNT(*) AS BIGINT) AS n_orders,
       CAST(MAX(spread_d) AS BIGINT) AS max_spread_d,
       ROUND(CAST(COUNT(*) AS DOUBLE) / (SELECT n FROM t), 6)
         AS order_share
FROM b
GROUP BY spread_bucket
ORDER BY spread_bucket
"""


@register("x190_fulfillment_spread", oracle=_X190_SQL)
def x190_fulfillment_spread(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order fulfillment-spread histogram: days between an order's
    first and last line shipment, bucketed — the shipment-
    fragmentation view ops teams use to weigh consolidation
    against speed (every 'e_fragmented' order is multiple boxes,
    multiple carrier fees). Integer day spans; single-line orders
    get their own bucket rather than polluting same-day.

    Scale: one orderkey-grain min/max agg (unique key, perfectly
    combinable map-side) and a 5-bucket rollup with a broadcast
    total.
    """
    li = load_table(spark, sf_dir, "lineitem")
    spread = li.groupBy("l_orderkey").agg(
        F.count("*").cast("bigint").alias("n_lines"),
        F.datediff(
            F.max(F.col("l_shipdate").cast("date")),
            F.min(F.col("l_shipdate").cast("date")),
        )
        .cast("bigint")
        .alias("spread_d"),
    )
    b = spread.select(
        F.when(F.col("n_lines") == 1, "a_single_line")
        .when(F.col("spread_d") == 0, "b_same_day")
        .when(F.col("spread_d") <= 7, "c_within_week")
        .when(F.col("spread_d") <= 30, "d_within_month")
        .otherwise("e_fragmented")
        .alias("spread_bucket"),
        "spread_d",
    )
    t = b.agg(F.count("*").cast("bigint").alias("nt"))
    return (
        b.groupBy("spread_bucket")
        .agg(
            F.count("*").cast("bigint").alias("n_orders"),
            F.max("spread_d").cast("bigint").alias("max_spread_d"),
        )
        .crossJoin(F.broadcast(t))
        .select(
            "spread_bucket",
            "n_orders",
            "max_spread_d",
            F.round(
                F.col("n_orders").cast("double") / F.col("nt"), 6
            ).alias("order_share"),
        )
        .orderBy("spread_bucket")
    )


# ---- x191: at-risk accounts (recency x value matrix) ----

_X191_SQL = """
WITH per_cust AS (
  SELECT o_custkey,
         SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS spend,
         MAX(CAST(o_orderdate AS DATE)) AS last_order
  FROM orders GROUP BY o_custkey),
anchor AS (SELECT MAX(last_order) AS corpus_end FROM per_cust),
scored AS (
  SELECT p.o_custkey, p.spend,
         CAST(DATEDIFF('day', p.last_order, a.corpus_end) AS BIGINT)
           AS recency_d,
         NTILE(4) OVER (ORDER BY p.spend, p.o_custkey) AS value_q
  FROM per_cust p CROSS JOIN anchor a),
b AS (
  SELECT value_q,
         CASE WHEN recency_d <= 90 THEN 'a_active_90d'
              WHEN recency_d <= 365 THEN 'b_cooling_1y'
              ELSE 'c_dormant' END AS recency_bucket,
         spend
  FROM scored)
SELECT CAST(value_q AS BIGINT) AS value_q, recency_bucket,
       CAST(COUNT(*) AS BIGINT) AS n_customers,
       CAST(SUM(spend) AS DOUBLE) AS spend_at_stake
FROM b
GROUP BY value_q, recency_bucket
ORDER BY value_q, recency_bucket
"""


@register("x191_at_risk_matrix", oracle=_X191_SQL)
def x191_at_risk_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """At-risk account matrix: customers cross-tabbed by lifetime-
    value quartile and recency bucket (days since last order,
    anchored to the corpus end so the query is reproducible) —
    the retention team's target list; the (value_q=4, dormant)
    cell is churned whales and its spend_at_stake is the number
    that gets the meeting scheduled. RFM (x121) scores individual
    customers; this is the portfolio roll-up with dollars
    attached.

    Exact decimal spend; integer recency; NTILE with custkey
    tiebreak.

    Scale: customer-grain agg, a 1-row anchor broadcast, one
    NTILE sort over customers, 12-cell output.
    """
    from pyspark.sql import Window

    orders = load_table(spark, sf_dir, "orders")
    per_cust = orders.groupBy("o_custkey").agg(
        F.sum(F.col("o_totalprice").cast("decimal(18,2)")).alias("spend"),
        F.max(F.col("o_orderdate").cast("date")).alias("last_order"),
    )
    anchor = per_cust.agg(F.max("last_order").alias("corpus_end"))
    scored = per_cust.crossJoin(F.broadcast(anchor)).select(
        "o_custkey",
        "spend",
        F.datediff("corpus_end", "last_order")
        .cast("bigint")
        .alias("recency_d"),
        F.ntile(4)
        .over(Window.orderBy("spend", "o_custkey"))
        .alias("value_q"),
    )
    b = scored.select(
        "value_q",
        F.when(F.col("recency_d") <= 90, "a_active_90d")
        .when(F.col("recency_d") <= 365, "b_cooling_1y")
        .otherwise("c_dormant")
        .alias("recency_bucket"),
        "spend",
    )
    return (
        b.groupBy(
            F.col("value_q").cast("bigint").alias("value_q"),
            "recency_bucket",
        )
        .agg(
            F.count("*").cast("bigint").alias("n_customers"),
            F.sum("spend").cast("double").alias("spend_at_stake"),
        )
        .orderBy("value_q", "recency_bucket")
    )


# ---- x192: brand cannibalization (negative weekly correlation) ----

_X192_SQL = """
WITH wk AS (
  SELECT p.p_brand,
         DATE_TRUNC('week', CAST(o.o_orderdate AS DATE)) AS week,
         CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))
                  * (CAST(1 AS DECIMAL(6,4))
                     - CAST(l.l_discount AS DECIMAL(6,4)))) * 1000000
              AS DECIMAL(19,0)) AS rev_u
  FROM lineitem l
  JOIN orders o ON l.l_orderkey = o.o_orderkey
  JOIN part p ON l.l_partkey = p.p_partkey
  GROUP BY p.p_brand, week),
pairs AS (
  SELECT a.p_brand AS brand_a, b.p_brand AS brand_b,
         CAST(COUNT(*) AS BIGINT) AS n_weeks,
         SUM(a.rev_u) AS sx, SUM(b.rev_u) AS sy,
         SUM(a.rev_u * b.rev_u) AS sxy,
         SUM(a.rev_u * a.rev_u) AS sxx,
         SUM(b.rev_u * b.rev_u) AS syy
  FROM wk a JOIN wk b
    ON a.week = b.week AND a.p_brand < b.p_brand
  GROUP BY brand_a, brand_b)
SELECT brand_a, brand_b, n_weeks,
       ROUND(
         (CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE)
                                / CAST(n_weeks AS DOUBLE))
         / (SQRT(CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE)
                 * CAST(sx AS DOUBLE) / CAST(n_weeks AS DOUBLE))
            * SQRT(CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE)
                   * CAST(sy AS DOUBLE) / CAST(n_weeks AS DOUBLE))),
         6) AS weekly_corr
FROM pairs
ORDER BY
  (CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE)
                         / CAST(n_weeks AS DOUBLE))
  / (SQRT(CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE)
          * CAST(sx AS DOUBLE) / CAST(n_weeks AS DOUBLE))
     * SQRT(CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE)
            * CAST(sy AS DOUBLE) / CAST(n_weeks AS DOUBLE))) ASC,
  brand_a, brand_b
LIMIT 10
"""


@register("x192_brand_cannibalization", oracle=_X192_SQL)
def x192_brand_cannibalization(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brand cannibalization screen: the 10 brand pairs whose
    weekly revenue series are most NEGATIVELY correlated (one
    brand's good weeks are the other's bad weeks — substitution,
    promo collisions, or shelf-space competition). x167's exact
    integer-moment Pearson applied to week-joined series pairs;
    revenue weeks are exact decimal micro-units, products widen
    to DECIMAL(38,0).

    Scale: the fact-table work is one (brand, week) aggregate;
    the pair join is over brand-count x weeks rows (bounded by
    catalog breadth, not corpus size), and top-10 is TakeOrdered
    on the unrounded statistic with brand tiebreaks.
    """
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    part = load_table(spark, sf_dir, "part")
    disc = (
        F.col("l_extendedprice").cast("decimal(18,2)")
        * (F.lit(1).cast("decimal(6,4)") - F.col("l_discount").cast("decimal(6,4)"))
    )
    wk = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .groupBy(
            "p_brand",
            F.date_trunc("week", F.col("o_orderdate").cast("date")).alias(
                "week"
            ),
        )
        .agg(
            (F.sum(disc) * 1000000)
            .cast("decimal(19,0)")
            .alias("rev_u")
        )
    )
    a = wk.select(
        F.col("p_brand").alias("brand_a"),
        F.col("week").alias("week_a"),
        F.col("rev_u").alias("xa"),
    )
    b = wk.select(
        F.col("p_brand").alias("brand_b"),
        F.col("week").alias("week_b"),
        F.col("rev_u").alias("xb"),
    )
    pairs = (
        a.join(
            b,
            (F.col("week_a") == F.col("week_b"))
            & (F.col("brand_a") < F.col("brand_b")),
        )
        .groupBy("brand_a", "brand_b")
        .agg(
            F.count("*").cast("bigint").alias("n_weeks"),
            F.sum("xa").alias("sx"),
            F.sum("xb").alias("sy"),
            F.sum(F.col("xa") * F.col("xb")).alias("sxy"),
            F.sum(F.col("xa") * F.col("xa")).alias("sxx"),
            F.sum(F.col("xb") * F.col("xb")).alias("syy"),
        )
    )
    d = lambda c: F.col(c).cast("double")  # noqa: E731
    r = (d("sxy") - d("sx") * d("sy") / d("n_weeks")) / (
        F.sqrt(d("sxx") - d("sx") * d("sx") / d("n_weeks"))
        * F.sqrt(d("syy") - d("sy") * d("sy") / d("n_weeks"))
    )
    return (
        pairs.select(
            "brand_a",
            "brand_b",
            "n_weeks",
            F.round(r, 6).alias("weekly_corr"),
            r.alias("_r"),
        )
        .orderBy("_r", "brand_a", "brand_b")
        .limit(10)
        .drop("_r")
    )


# ---- x193: JSON props profile per event type ----

_X193_SQL = """
WITH p AS (
  SELECT event_type,
         CAST(JSON_EXTRACT(props, '$.k') AS BIGINT) AS k
  FROM events)
SELECT event_type,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       CAST(COUNT(k) AS BIGINT) AS n_with_k,
       CAST(MIN(k) AS BIGINT) AS min_k,
       CAST(MAX(k) AS BIGINT) AS max_k,
       ROUND(CAST(SUM(k) AS DOUBLE) / COUNT(k), 4) AS mean_k
FROM p
GROUP BY event_type
ORDER BY event_type
"""


@register("x193_props_profile", oracle=_X193_SQL)
def x193_props_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured payload profiling: extract the numeric `k`
    field from the events' JSON props column and profile it per
    event type (presence count, range, mean) — the instrumentation
    health check for loosely-typed event payloads, run before any
    pipeline starts trusting props fields. JSON path extraction on
    the hot path stays JVM-side (get_json_object), no UDF.

    Integer extraction and sums; one mean division.

    Scale: narrow per-row JSON parse + a per-type aggregate; at
    100 TB the parse cost dominates and is embarrassingly
    parallel (schema-on-read, no shuffle added).
    """
    ev = load_table(spark, sf_dir, "events")
    p = ev.select(
        "event_type",
        F.get_json_object("props", "$.k").cast("bigint").alias("k"),
    )
    return (
        p.groupBy("event_type")
        .agg(
            F.count("*").cast("bigint").alias("n_events"),
            F.count("k").cast("bigint").alias("n_with_k"),
            F.min("k").cast("bigint").alias("min_k"),
            F.max("k").cast("bigint").alias("max_k"),
            F.round(
                F.sum("k").cast("double") / F.count("k"), 4
            ).alias("mean_k"),
        )
        .orderBy("event_type")
    )


# ---- x194: early-activity predictiveness ----

_X194_SQL = """
WITH u AS (
  SELECT user_id, MIN(ts) AS first_ts, CAST(COUNT(*) AS BIGINT)
           AS total_events
  FROM events GROUP BY user_id),
early AS (
  SELECT e.user_id,
         CAST(COUNT(*) AS BIGINT) AS week1_events
  FROM events e JOIN u ON e.user_id = u.user_id
  WHERE CAST(FLOOR(EPOCH(e.ts)) AS BIGINT)
        - CAST(FLOOR(EPOCH(u.first_ts)) AS BIGINT) < 7 * 86400
  GROUP BY e.user_id),
j AS (
  SELECT u.user_id, early.week1_events AS x,
         u.total_events - early.week1_events AS y
  FROM u JOIN early ON u.user_id = early.user_id),
s AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(y) AS BIGINT) AS sy,
         CAST(SUM(x * y) AS BIGINT) AS sxy,
         CAST(SUM(x * x) AS BIGINT) AS sxx,
         CAST(SUM(y * y) AS BIGINT) AS syy
  FROM j)
SELECT n AS n_users,
       ROUND(CAST(sx AS DOUBLE) / n, 4) AS mean_week1,
       ROUND(CAST(sy AS DOUBLE) / n, 4) AS mean_later,
       ROUND(
         (CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE)
                                / CAST(n AS DOUBLE))
         / (SQRT(CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE)
                 * CAST(sx AS DOUBLE) / CAST(n AS DOUBLE))
            * SQRT(CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE)
                   * CAST(sy AS DOUBLE) / CAST(n AS DOUBLE))),
         6) AS predictive_r
FROM s
"""


@register("x194_early_predictiveness", oracle=_X194_SQL)
def x194_early_predictiveness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Early-activity predictiveness: Pearson correlation between a
    user's FIRST-WEEK event count and their SUBSEQUENT (post-week)
    activity — the classic growth question "does week-1 engagement
    predict retention?", answered with the x167 exact
    integer-moment machinery so the statistic is bit-reproducible.
    Subsequent = total minus week-1, so the two halves never
    overlap (overlap would inflate r mechanically).

    Scale: per-user totals and the first-week window share the
    user_id shuffle; the join is keyed on the same; the moment
    reduce is 1 row.
    """
    ev = load_table(spark, sf_dir, "events")
    u = ev.groupBy("user_id").agg(
        F.min("ts").alias("first_ts"),
        F.count("*").cast("bigint").alias("total_events"),
    )
    early = (
        ev.join(u, "user_id")
        .where(
            F.unix_timestamp("ts") - F.unix_timestamp("first_ts")
            < 7 * 86400
        )
        .groupBy("user_id")
        .agg(F.count("*").cast("bigint").alias("week1_events"))
    )
    j = u.join(early, "user_id").select(
        F.col("week1_events").alias("x"),
        (F.col("total_events") - F.col("week1_events")).alias("y"),
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
    return s.select(
        F.col("n").alias("n_users"),
        F.round(d("sx") / F.col("n"), 4).alias("mean_week1"),
        F.round(d("sy") / F.col("n"), 4).alias("mean_later"),
        F.round(r, 6).alias("predictive_r"),
    )


# ---- x195: are duplicates lower quality? ----

_X195_SQL = """
WITH fp AS (
  SELECT doc_id, source, text,
         MD5(LOWER(REGEXP_REPLACE(text, '\\s+', ' ', 'g'))) AS f
  FROM documents),
flagged AS (
  SELECT source, text,
         CASE WHEN COUNT(*) OVER (PARTITION BY f) > 1
              THEN 'duplicated' ELSE 'unique' END AS dup_class
  FROM fp),
m AS (
  SELECT source, dup_class,
         LEN(STRING_SPLIT(text, ' ')) AS n_tokens,
         LENGTH(text) AS n_chars
  FROM flagged)
SELECT source, dup_class,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       ROUND(CAST(SUM(n_tokens) AS DOUBLE) / COUNT(*), 4)
         AS avg_tokens,
       ROUND(CAST(SUM(n_chars) AS DOUBLE) / SUM(n_tokens), 4)
         AS chars_per_token
FROM m
GROUP BY source, dup_class
ORDER BY source, dup_class
"""


@register("x195_dup_quality_compare", oracle=_X195_SQL)
def x195_dup_quality_compare(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Duplicate-vs-unique quality comparison per source: doc count,
    mean length, and chars-per-token for docs that belong to an
    exact-duplicate group vs singletons — answering "is the
    duplicated material boilerplate junk or legitimate popular
    content?", which decides whether dedup keeps one copy or
    drops the cluster entirely (x176 tells you how MUCH dedup
    removes; this tells you WHAT).

    Integer token/char sums; two divisions per row.

    Scale: fingerprint window on the uniform md5 key (x176's
    shape) with the metrics riding the same rows; output is
    2 x sources.
    """
    from pyspark.sql import Window

    docs = load_table(spark, sf_dir, "documents")
    norm = F.lower(F.regexp_replace("text", r"\s+", " "))
    fp = docs.select(
        "source", "text", F.md5(norm.cast("binary")).alias("f")
    )
    flagged = fp.select(
        "source",
        F.when(
            F.count("*").over(Window.partitionBy("f")) > 1, "duplicated"
        )
        .otherwise("unique")
        .alias("dup_class"),
        F.size(F.split(F.col("text"), " ")).alias("n_tokens"),
        F.length("text").alias("n_chars"),
    )
    return (
        flagged.groupBy("source", "dup_class")
        .agg(
            F.count("*").cast("bigint").alias("n_docs"),
            F.round(
                F.sum("n_tokens").cast("double") / F.count("*"), 4
            ).alias("avg_tokens"),
            F.round(
                F.sum("n_chars").cast("double") / F.sum("n_tokens"), 4
            ).alias("chars_per_token"),
        )
        .orderBy("source", "dup_class")
    )


# ---- x196: weekday seasonality strength (ANOVA eta-squared) ----

_X196_SQL = """
WITH daily AS (
  SELECT CAST(o_orderdate AS DATE) AS d,
         CAST(DAYOFWEEK(CAST(o_orderdate AS DATE)) + 1 AS BIGINT)
           AS dow,
         CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) * 100
              AS DECIMAL(19,0)) AS c
  FROM orders GROUP BY d, dow),
per_dow AS (
  SELECT dow, CAST(COUNT(*) AS BIGINT) AS n_w,
         SUM(c) AS s_w, SUM(c * c) AS ss_w
  FROM daily GROUP BY dow),
tot AS (
  SELECT CAST(SUM(n_w) AS BIGINT) AS n,
         SUM(s_w) AS s, SUM(ss_w) AS ss,
         LIST_REDUCE(
           LIST((CAST(s_w AS DOUBLE) / n_w) * CAST(s_w AS DOUBLE)
                ORDER BY dow),
           (x, y) -> x + y) AS explained_raw
  FROM per_dow)
SELECT n AS n_days,
       ROUND((explained_raw
              - CAST(s AS DOUBLE) * CAST(s AS DOUBLE)
                / CAST(n AS DOUBLE))
             / (CAST(ss AS DOUBLE)
                - CAST(s AS DOUBLE) * CAST(s AS DOUBLE)
                  / CAST(n AS DOUBLE)), 6) AS eta_squared
FROM tot
"""


@register("x196_seasonality_strength", oracle=_X196_SQL)
def x196_seasonality_strength(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekday seasonality strength: one-way ANOVA eta-squared —
    the share of daily-revenue variance explained by day-of-week
    (between-group SS over total SS). ~0 means x123's weekday
    profile is cosmetic; near 1 means staffing/capacity should
    follow the weekly cycle. The single-number companion to
    x168's lag-7 autocorrelation.

    Daily revenue is exact decimal cents; SS terms are exact
    decimal sums except the 7 per-weekday mean products, which are
    folded in explicit dow order on BOTH engines (array_sort +
    F.aggregate ↔ LIST(... ORDER BY dow) + LIST_REDUCE) — a plain
    SUM over doubles would be partition-order-dependent.

    Scale: day-grain agg, 7-row weekday rollup, 1-row output.
    """
    orders = load_table(spark, sf_dir, "orders")
    daily = (
        orders.groupBy(
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
    per_dow = daily.groupBy("dow").agg(
        F.count("*").cast("bigint").alias("n_w"),
        F.sum("c").alias("s_w"),
        F.sum(F.col("c") * F.col("c")).alias("ss_w"),
    )
    tot = per_dow.agg(
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
        F.col("n").alias("n_days"),
        F.round(
            (F.col("explained_raw") - grand) / (d("ss") - grand), 6
        ).alias("eta_squared"),
    )


# ---- x197: A/B-test minimum-detectable-effect planner ----

_X197_ZA = 1.96  # alpha=0.05 two-sided, literal
_X197_ZB = 0.84  # power=0.80, literal

_X197_SQL = f"""
WITH t AS (
  SELECT CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users
  FROM events),
conv AS (
  SELECT event_type,
         CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_converted
  FROM events GROUP BY event_type),
p AS (
  SELECT c.event_type, c.n_converted, t.n_users,
         CAST(c.n_converted AS DOUBLE) / t.n_users AS base_rate,
         CAST(t.n_users AS DOUBLE) / 2 AS n_arm
  FROM conv c CROSS JOIN t)
SELECT event_type, n_converted, n_users,
       ROUND(base_rate, 6) AS base_rate,
       ROUND(({_X197_ZA!r} + {_X197_ZB!r})
             * SQRT(2 * base_rate * (1 - base_rate) / n_arm), 6)
         AS mde_abs,
       ROUND((({_X197_ZA!r} + {_X197_ZB!r})
              * SQRT(2 * base_rate * (1 - base_rate) / n_arm))
             / base_rate, 6) AS mde_rel
FROM p
ORDER BY event_type
"""


@register("x197_ab_mde_planner", oracle=_X197_SQL)
def x197_ab_mde_planner(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A/B-test MDE planner: for each event type's user-level base
    rate, the minimum detectable absolute and relative effect at
    alpha=.05 / power=.80 if the current audience were split into
    two arms — the pre-experiment feasibility check that kills
    underpowered tests before they run ("you cannot detect less
    than a 12% relative lift on purchases; don't bother testing a
    button color"). Pairs with x136, which judges a FINISHED
    experiment; this one gates the next.

    z quantiles are literals; the MDE is + * / sqrt only over
    exact integer counts — cross-engine bit-stable.

    Scale: two distinct-user aggregates (shared user_id shuffle
    under partial distinct), a 1-row total broadcast, 5-row
    output.
    """
    ev = load_table(spark, sf_dir, "events")
    t = ev.agg(
        F.countDistinct("user_id").cast("bigint").alias("n_users")
    )
    conv = ev.groupBy("event_type").agg(
        F.countDistinct("user_id").cast("bigint").alias("n_converted")
    )
    base = F.col("n_converted").cast("double") / F.col("n_users")
    n_arm = F.col("n_users").cast("double") / 2
    za_zb = F.lit(_X197_ZA) + F.lit(_X197_ZB)
    mde = za_zb * F.sqrt(2 * base * (1 - base) / n_arm)
    return (
        conv.crossJoin(F.broadcast(t))
        .select(
            "event_type",
            "n_converted",
            "n_users",
            F.round(base, 6).alias("base_rate"),
            F.round(mde, 6).alias("mde_abs"),
            F.round(mde / base, 6).alias("mde_rel"),
        )
        .orderBy("event_type")
    )


# ---- x198: repeat-purchase ladder ----

_X198_SQL = """
WITH c AS (
  SELECT o_custkey, CAST(COUNT(*) AS BIGINT) AS k
  FROM orders GROUP BY o_custkey),
h AS (
  SELECT k, CAST(COUNT(*) AS BIGINT) AS n_at_k FROM c GROUP BY k),
ladder AS (
  SELECT k, n_at_k,
         SUM(n_at_k) OVER (ORDER BY k DESC
                           ROWS UNBOUNDED PRECEDING) AS n_reaching_k
  FROM h)
SELECT a.k AS order_number,
       CAST(a.n_reaching_k AS BIGINT) AS n_customers_reaching,
       ROUND(CAST(COALESCE(b.n_reaching_k, 0) AS DOUBLE)
             / a.n_reaching_k, 6) AS next_order_rate
FROM ladder a LEFT JOIN ladder b ON b.k = a.k + 1
WHERE a.k <= 15
ORDER BY order_number
"""


@register("x198_repeat_ladder", oracle=_X198_SQL)
def x198_repeat_ladder(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Repeat-purchase ladder: of customers who reached their k-th
    order, what share came back for a (k+1)-th — the retention
    curve at transaction granularity (its first step is trial→
    repeat conversion; where it plateaus is the habitual-customer
    rate). Computed from the order-count histogram by a reverse
    cumulative sum, so no per-customer sequence scan.

    Integer counts; one ratio per rung.

    Scale: customer-grain count, then everything operates on the
    tiny count-histogram (max-orders rows); the self-join is
    histogram-sized.
    """
    from pyspark.sql import Window

    orders = load_table(spark, sf_dir, "orders")
    c = orders.groupBy("o_custkey").agg(
        F.count("*").cast("bigint").alias("k")
    )
    h = c.groupBy("k").agg(F.count("*").cast("bigint").alias("n_at_k"))
    ladder = h.select(
        "k",
        F.sum("n_at_k")
        .over(
            Window.orderBy(F.desc("k")).rowsBetween(
                Window.unboundedPreceding, 0
            )
        )
        .alias("n_reaching_k"),
    )
    a = ladder.select(
        F.col("k").alias("order_number"),
        F.col("n_reaching_k").alias("n_customers_reaching"),
    )
    b = ladder.select(
        (F.col("k") - 1).alias("order_number"),
        F.col("n_reaching_k").alias("n_next"),
    )
    return (
        a.join(F.broadcast(b), "order_number", "left")
        .where(F.col("order_number") <= 15)
        .select(
            "order_number",
            F.col("n_customers_reaching").cast("bigint"),
            F.round(
                F.coalesce(F.col("n_next"), F.lit(0)).cast("double")
                / F.col("n_customers_reaching"),
                6,
            ).alias("next_order_rate"),
        )
        .orderBy("order_number")
    )


# ---- x199: positional token bias (template openers/closers) ----

_X199_MIN_N = 200  # support floor, literal

_X199_SQL = f"""
WITH tok AS (
  SELECT t.i AS pos, LEN(s.toks) AS doclen, s.toks[t.i] AS token
  FROM (SELECT STRING_SPLIT(LOWER(text), ' ') AS toks
        FROM documents) s,
       (SELECT UNNEST(RANGE(1, 10000)) AS i) t
  WHERE t.i <= LEN(s.toks)),
f AS (
  SELECT token,
         CAST(COUNT(*) AS BIGINT) AS n_occ,
         CAST(SUM(CASE WHEN 4 * pos <= doclen THEN 1 ELSE 0 END)
              AS BIGINT) AS n_q1,
         CAST(SUM(CASE WHEN 4 * pos > 3 * doclen THEN 1 ELSE 0 END)
              AS BIGINT) AS n_q4
  FROM tok GROUP BY token
  HAVING COUNT(*) >= {_X199_MIN_N})
SELECT token, n_occ,
       ROUND(CAST(n_q1 AS DOUBLE) / n_occ, 6) AS head_share,
       ROUND(CAST(n_q4 AS DOUBLE) / n_occ, 6) AS tail_share,
       ROUND(ABS(CAST(n_q1 AS DOUBLE) / n_occ - 0.25)
             + ABS(CAST(n_q4 AS DOUBLE) / n_occ - 0.25), 6) AS bias
FROM f
ORDER BY ABS(CAST(n_q1 AS DOUBLE) / n_occ - 0.25)
           + ABS(CAST(n_q4 AS DOUBLE) / n_occ - 0.25) DESC,
         token
LIMIT 20
"""


@register("x199_positional_bias", oracle=_X199_SQL)
def x199_positional_bias(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Positional token bias: tokens whose occurrences concentrate
    in the first or last quarter of documents (head/tail share vs
    the uniform 0.25) — the signature of templated openers,
    footers, and sign-offs that x166 catches only when they are
    verbatim prefixes; this catches them at any edit distance
    because it looks at position statistics, not exact strings.

    Quarter membership is an integer cross-multiplication
    (4*pos vs doclen — no float positions); shares divide exact
    counts; top-20 orders by the unrounded bias with token
    tiebreak above a support floor.

    Scale: posexplode is linear in corpus tokens; one (token)
    partial agg; TakeOrdered output. The oracle unnests via a
    bounded index range — same rows, DuckDB-idiomatic.
    """
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        F.split(F.lower("text"), " ").alias("toks")
    ).select(
        F.size("toks").alias("doclen"),
        F.posexplode("toks").alias("pos0", "token"),
    )
    tok = toks.select(
        (F.col("pos0") + 1).alias("pos"), "doclen", "token"
    )
    f = (
        tok.groupBy("token")
        .agg(
            F.count("*").cast("bigint").alias("n_occ"),
            F.sum(
                F.when(4 * F.col("pos") <= F.col("doclen"), 1).otherwise(0)
            )
            .cast("bigint")
            .alias("n_q1"),
            F.sum(
                F.when(
                    4 * F.col("pos") > 3 * F.col("doclen"), 1
                ).otherwise(0)
            )
            .cast("bigint")
            .alias("n_q4"),
        )
        .where(F.col("n_occ") >= _X199_MIN_N)
    )
    head = F.col("n_q1").cast("double") / F.col("n_occ")
    tail = F.col("n_q4").cast("double") / F.col("n_occ")
    bias = F.abs(head - 0.25) + F.abs(tail - 0.25)
    return (
        f.select(
            "token",
            "n_occ",
            F.round(head, 6).alias("head_share"),
            F.round(tail, 6).alias("tail_share"),
            F.round(bias, 6).alias("bias"),
            bias.alias("_b"),
        )
        .orderBy(F.desc("_b"), "token")
        .limit(20)
        .drop("_b")
    )


# ---- x200: corpus health scorecard ----

_X200_SQL = """
WITH fp AS (
  SELECT doc_id, source,
         STRING_SPLIT(text, ' ') AS toks,
         MD5(LOWER(REGEXP_REPLACE(text, '\\s+', ' ', 'g'))) AS f
  FROM documents),
base AS (
  SELECT source,
         LEN(toks) AS n_tokens,
         CASE WHEN doc_id > MIN(doc_id) OVER (PARTITION BY f)
              THEN 1 ELSE 0 END AS is_dup,
         LEN(LIST_FILTER(toks, t -> LENGTH(t) > 20
                          OR (REGEXP_MATCHES(t, '[A-Za-z]')
                              AND REGEXP_MATCHES(t, '[0-9]'))))
           AS n_anom
  FROM fp)
SELECT source,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(n_tokens) AS BIGINT) AS n_tokens,
       ROUND(CAST(SUM(is_dup) AS DOUBLE) / COUNT(*), 6) AS dup_rate,
       ROUND(CAST(SUM(n_anom) AS DOUBLE) / SUM(n_tokens), 6)
         AS anomaly_rate,
       ROUND(CAST(SUM(n_tokens) AS DOUBLE) / COUNT(*), 2)
         AS mean_tokens,
       CAST(SUM(is_dup) = 0 AND COUNT(*) >= 10 AS BOOLEAN)
         AS clean_and_sized
FROM base
GROUP BY source
ORDER BY source
"""


@register("x200_corpus_scorecard", oracle=_X200_SQL)
def x200_corpus_scorecard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus health scorecard: one row per source with the
    decision-grade metrics a data-mixing owner reads before
    weighting a source into a training run — duplicate-doc rate
    (x176's flag), token-anomaly rate (x182's classes), scale
    (docs/tokens), and a composite clean_and_sized gate. The
    single-pane summary the individual x-series diagnostics feed.

    One scan computes everything: the dup flag rides the
    fingerprint window, the anomaly count is an array filter on
    the already-split tokens (no second explode), ratios divide
    exact integers.

    Scale: one narrow map + one fingerprint window (uniform md5
    key) + a source rollup — strictly cheaper than running its
    four parent diagnostics separately.
    """
    from pyspark.sql import Window

    docs = load_table(spark, sf_dir, "documents")
    norm = F.lower(F.regexp_replace("text", r"\s+", " "))
    fp = docs.select(
        "doc_id",
        "source",
        F.split(F.col("text"), " ").alias("toks"),
        F.md5(norm.cast("binary")).alias("f"),
    )
    anom = F.size(
        F.filter(
            F.col("toks"),
            lambda t: (F.length(t) > 20)
            | (t.rlike("[A-Za-z]") & t.rlike("[0-9]")),
        )
    )
    base = fp.select(
        "source",
        F.size("toks").alias("n_tokens"),
        F.when(
            F.col("doc_id")
            > F.min("doc_id").over(Window.partitionBy("f")),
            1,
        )
        .otherwise(0)
        .alias("is_dup"),
        anom.alias("n_anom"),
    )
    return (
        base.groupBy("source")
        .agg(
            F.count("*").cast("bigint").alias("n_docs"),
            F.sum("n_tokens").cast("bigint").alias("n_tokens"),
            F.round(
                F.sum("is_dup").cast("double") / F.count("*"), 6
            ).alias("dup_rate"),
            F.round(
                F.sum("n_anom").cast("double") / F.sum("n_tokens"), 6
            ).alias("anomaly_rate"),
            F.round(
                F.sum("n_tokens").cast("double") / F.count("*"), 2
            ).alias("mean_tokens"),
            ((F.sum("is_dup") == 0) & (F.count("*") >= 10)).alias(
                "clean_and_sized"
            ),
        )
        .orderBy("source")
    )


# ---- x201: month-of-year seasonal index ----

_X201_SQL = """
WITH daily AS (
  SELECT CAST(o_orderdate AS DATE) AS d,
         CAST(MONTH(CAST(o_orderdate AS DATE)) AS BIGINT) AS moy,
         CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) * 100
              AS DECIMAL(19,0)) AS c
  FROM orders GROUP BY d, moy),
per_m AS (
  SELECT moy, CAST(COUNT(*) AS BIGINT) AS n_days, SUM(c) AS s
  FROM daily GROUP BY moy),
tot AS (
  SELECT CAST(SUM(n_days) AS BIGINT) AS n, SUM(s) AS st FROM per_m)
SELECT p.moy AS month_of_year, p.n_days,
       CAST((2 * CAST(p.s AS BIGINT) + p.n_days) // (2 * p.n_days)
            AS DOUBLE) / 100 AS avg_daily_revenue,
       ROUND((CAST(p.s AS DOUBLE) / p.n_days)
             / (CAST(t.st AS DOUBLE) / t.n), 6) AS seasonal_index
FROM per_m p CROSS JOIN tot t
ORDER BY month_of_year
"""


@register("x201_seasonal_index", oracle=_X201_SQL)
def x201_seasonal_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Month-of-year seasonal index: each calendar month's average
    daily revenue over the all-time average (index > 1 = high
    season) — the annual-cycle companion to x123 (weekday x hour)
    and x196 (weekday strength); the number inventory planning
    multiplies its baseline by.

    Exact decimal cent sums; the displayed daily average rounds
    half-up in INTEGER cents ((2s+n)//2n — engine ROUND-on-double
    tie behavior diverges at 2-decimal boundaries, integer
    division cannot); the index is one fixed double expression.

    Scale: day-grain agg, 12-row rollup, 1-row total broadcast.
    """
    orders = load_table(spark, sf_dir, "orders")
    daily = (
        orders.groupBy(
            F.col("o_orderdate").cast("date").alias("d"),
            F.month(F.col("o_orderdate").cast("date"))
            .cast("bigint")
            .alias("moy"),
        )
        .agg(
            (F.sum(F.col("o_totalprice").cast("decimal(18,2)")) * 100)
            .cast("decimal(19,0)")
            .alias("c")
        )
    )
    per_m = daily.groupBy("moy").agg(
        F.count("*").cast("bigint").alias("n_days"),
        F.sum("c").alias("s"),
    )
    tot = per_m.agg(
        F.sum("n_days").cast("bigint").alias("n"),
        F.sum("s").alias("st"),
    )
    return (
        per_m.crossJoin(F.broadcast(tot))
        .select(
            F.col("moy").alias("month_of_year"),
            "n_days",
            (
                F.expr(
                    "(2 * CAST(s AS BIGINT) + n_days) div (2 * n_days)"
                ).cast("double")
                / 100
            ).alias("avg_daily_revenue"),
            F.round(
                (F.col("s").cast("double") / F.col("n_days"))
                / (F.col("st").cast("double") / F.col("n")),
                6,
            ).alias("seasonal_index"),
        )
        .orderBy("month_of_year")
    )


# ---- x202: customer momentum (integer-exact OLS slope signs) ----

_X202_SQL = """
WITH seq AS (
  SELECT o_custkey,
         ROW_NUMBER() OVER (PARTITION BY o_custkey
                            ORDER BY o_orderdate, o_orderkey) AS i,
         CAST(ROUND(o_totalprice * 100) AS BIGINT) AS v
  FROM orders),
m AS (
  SELECT o_custkey,
         CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(i) AS BIGINT) AS si,
         CAST(SUM(v) AS BIGINT) AS sv,
         CAST(SUM(i * v) AS BIGINT) AS siv
  FROM seq GROUP BY o_custkey
  HAVING COUNT(*) >= 3),
cls AS (
  SELECT CASE WHEN n * siv > si * sv THEN 'up'
              WHEN n * siv < si * sv THEN 'down'
              ELSE 'flat' END AS trend
  FROM m),
t AS (SELECT CAST(COUNT(*) AS BIGINT) AS nt FROM cls)
SELECT trend,
       CAST(COUNT(*) AS BIGINT) AS n_customers,
       ROUND(CAST(COUNT(*) AS DOUBLE) / (SELECT nt FROM t), 6)
         AS customer_share
FROM cls
GROUP BY trend
ORDER BY trend
"""


@register("x202_customer_momentum", oracle=_X202_SQL)
def x202_customer_momentum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customer momentum: per customer (≥3 orders), the SIGN of the
    OLS slope of order value over order sequence — are individual
    baskets trending up, down, or flat? The portfolio histogram is
    the expansion-vs-contraction pulse a CS org watches. The sign
    needs no division or float AT ALL: sign(slope) =
    sign(n·Σiv − Σi·Σv), compared as exact integers (cents x
    small sequence indices stay far inside bigint).

    Scale: one custkey window for sequence numbers (same shuffle
    feeds the moment agg), then a 3-row histogram. The only
    float is the final share.
    """
    from pyspark.sql import Window

    orders = load_table(spark, sf_dir, "orders")
    seq = orders.select(
        "o_custkey",
        F.row_number()
        .over(
            Window.partitionBy("o_custkey").orderBy(
                "o_orderdate", "o_orderkey"
            )
        )
        .alias("i"),
        F.round(F.col("o_totalprice") * 100).cast("bigint").alias("v"),
    )
    m = (
        seq.groupBy("o_custkey")
        .agg(
            F.count("*").cast("bigint").alias("n"),
            F.sum("i").cast("bigint").alias("si"),
            F.sum("v").cast("bigint").alias("sv"),
            F.sum(F.col("i") * F.col("v")).cast("bigint").alias("siv"),
        )
        .where(F.col("n") >= 3)
    )
    lhs = F.col("n") * F.col("siv")
    rhs = F.col("si") * F.col("sv")
    cls = m.select(
        F.when(lhs > rhs, "up")
        .when(lhs < rhs, "down")
        .otherwise("flat")
        .alias("trend")
    )
    t = cls.agg(F.count("*").cast("bigint").alias("nt"))
    return (
        cls.groupBy("trend")
        .agg(F.count("*").cast("bigint").alias("n_customers"))
        .crossJoin(F.broadcast(t))
        .select(
            "trend",
            "n_customers",
            F.round(
                F.col("n_customers").cast("double") / F.col("nt"), 6
            ).alias("customer_share"),
        )
        .orderBy("trend")
    )


# ---- x203: revenue attribution by part-name token ----

_X203_SQL = """
WITH rev AS (
  SELECT l_partkey,
         CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                  * (CAST(1 AS DECIMAL(6,4))
                     - CAST(l_discount AS DECIMAL(6,4)))) * 1000000
              AS DECIMAL(19,0)) AS rev_u
  FROM lineitem GROUP BY l_partkey),
tok AS (
  SELECT UNNEST(STRING_SPLIT(p.p_name, ' ')) AS name_token,
         r.rev_u
  FROM part p JOIN rev r ON p.p_partkey = r.l_partkey),
agg AS (
  SELECT name_token,
         CAST(COUNT(*) AS BIGINT) AS n_parts,
         SUM(rev_u) AS rev_u
  FROM tok GROUP BY name_token),
tot AS (SELECT SUM(rev_u) AS t FROM rev)
SELECT a.name_token, a.n_parts,
       ((CAST(a.rev_u AS BIGINT) + 5000) // 10000) / 100.0 AS revenue,
       ROUND(CAST(a.rev_u AS DOUBLE) / CAST(t.t AS DOUBLE), 6)
         AS revenue_share
FROM agg a CROSS JOIN tot t
ORDER BY a.rev_u DESC, a.name_token
LIMIT 25
"""


@register("x203_name_token_revenue", oracle=_X203_SQL)
def x203_name_token_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue attribution by part-name token: which words in the
    catalog's product names carry the money (the merchandising
    view — 'forest'-colored parts outselling 'lemon' ones is an
    assortment signal). A text-meets-facts join: per-part exact
    revenue rolls up through the exploded name vocabulary;
    shares divide exact micro-unit decimals; top-25 orders by
    the exact decimal with token tiebreak.

    Scale: the fact-side agg happens FIRST (partkey grain), so
    the explode multiplies only the part dim (5 name tokens per
    part), never lineitem; one token rollup + broadcast total.
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
    tok = (
        F.broadcast(part)
        .join(rev, part.p_partkey == rev.l_partkey)
        .select(
            F.explode(F.split("p_name", " ")).alias("name_token"),
            "rev_u",
        )
    )
    agg = tok.groupBy("name_token").agg(
        F.count("*").cast("bigint").alias("n_parts"),
        F.sum("rev_u").alias("rev_u"),
    )
    tot = rev.agg(F.sum("rev_u").alias("t"))
    return (
        agg.crossJoin(F.broadcast(tot))
        .select(
            "name_token",
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
        .orderBy(F.desc("_o"), "name_token")
        .limit(25)
        .drop("_o")
    )


# ---- x204: top-1% value tail share per event type ----

_X204_SQL = """
WITH r AS (
  SELECT event_type,
         CAST(value AS DECIMAL(18,6)) AS v,
         ROW_NUMBER() OVER (PARTITION BY event_type
                            ORDER BY value DESC, event_id) AS rn,
         COUNT(*) OVER (PARTITION BY event_type) AS n
  FROM events)
SELECT event_type,
       CAST(MAX(n) AS BIGINT) AS n_events,
       CAST(CEIL(0.01 * MAX(n)) AS BIGINT) AS n_top1pct,
       ROUND(CAST(SUM(CASE WHEN rn <= CAST(CEIL(0.01 * n) AS BIGINT)
                           THEN v ELSE CAST(0 AS DECIMAL(18,6)) END)
                  AS DOUBLE)
             / CAST(SUM(v) AS DOUBLE), 6) AS top1pct_value_share
FROM r
GROUP BY event_type
ORDER BY event_type
"""


@register("x204_value_tail_share", oracle=_X204_SQL)
def x204_value_tail_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-1% value concentration per event type: the share of
    total value carried by the largest 1% of events — the
    heavy-tail check that decides whether mean-based dashboards
    are lying (a 40% top-1% share means the median event is
    noise and the tail IS the business). Gini (x126) weighs the
    whole curve; this isolates the actionable tip.

    Rank selection with event_id tiebreak; value accumulates as
    exact decimal in both the tail and the total (decimal zero
    ELSE arm); one final division.

    Scale: one window shuffle on event_type with a streaming
    rank; the conditional sum shares the pass. For a skewed type
    key the rank would ride a range-partitioned sort.
    """
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events")
    r = ev.select(
        "event_type",
        F.col("value").cast("decimal(18,6)").alias("v"),
        F.row_number()
        .over(
            Window.partitionBy("event_type").orderBy(
                F.desc("value"), "event_id"
            )
        )
        .alias("rn"),
        F.count("*")
        .over(Window.partitionBy("event_type"))
        .alias("n"),
    )
    zero = F.lit(0).cast("decimal(18,6)")
    in_tail = F.col("rn") <= F.ceil(0.01 * F.col("n")).cast("bigint")
    return (
        r.groupBy("event_type")
        .agg(
            F.max("n").cast("bigint").alias("n_events"),
            F.ceil(0.01 * F.max("n")).cast("bigint").alias("n_top1pct"),
            F.round(
                F.sum(F.when(in_tail, F.col("v")).otherwise(zero)).cast(
                    "double"
                )
                / F.sum("v").cast("double"),
                6,
            ).alias("top1pct_value_share"),
        )
        .orderBy("event_type")
    )


# ---- x205: purchase-gap acceleration ----

_X205_SQL = """
WITH seq AS (
  SELECT o_custkey,
         CAST(DATEDIFF('day', LAG(CAST(o_orderdate AS DATE))
                 OVER (PARTITION BY o_custkey
                       ORDER BY o_orderdate, o_orderkey),
               CAST(o_orderdate AS DATE)) AS BIGINT) AS gap_d,
         ROW_NUMBER() OVER (PARTITION BY o_custkey
                            ORDER BY o_orderdate, o_orderkey) AS i,
         COUNT(*) OVER (PARTITION BY o_custkey) AS n
  FROM orders),
g AS (SELECT o_custkey, gap_d, i - 1 AS gi, n - 1 AS ng
      FROM seq WHERE gap_d IS NOT NULL AND n >= 5),
halves AS (
  SELECT o_custkey,
         CAST(SUM(CASE WHEN 2 * gi <= ng THEN gap_d ELSE 0 END)
              AS BIGINT) AS s1,
         CAST(SUM(CASE WHEN 2 * gi <= ng THEN 1 ELSE 0 END)
              AS BIGINT) AS n1,
         CAST(SUM(CASE WHEN 2 * gi > ng THEN gap_d ELSE 0 END)
              AS BIGINT) AS s2,
         CAST(SUM(CASE WHEN 2 * gi > ng THEN 1 ELSE 0 END)
              AS BIGINT) AS n2
  FROM g GROUP BY o_custkey),
cls AS (
  SELECT CASE WHEN s2 * n1 < s1 * n2 THEN 'accelerating'
              WHEN s2 * n1 > s1 * n2 THEN 'decelerating'
              ELSE 'steady' END AS cadence
  FROM halves WHERE n1 > 0 AND n2 > 0),
t AS (SELECT CAST(COUNT(*) AS BIGINT) AS nt FROM cls)
SELECT cadence,
       CAST(COUNT(*) AS BIGINT) AS n_customers,
       ROUND(CAST(COUNT(*) AS DOUBLE) / (SELECT nt FROM t), 6)
         AS customer_share
FROM cls
GROUP BY cadence
ORDER BY cadence
"""


@register("x205_gap_acceleration", oracle=_X205_SQL)
def x205_gap_acceleration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Purchase-cadence acceleration: for customers with ≥5
    orders, compare the mean inter-order gap of their first half
    of gaps vs their second half — shrinking gaps = accelerating
    relationship, growing = drifting away; the leading indicator
    x202's value-momentum confirms in dollars. The mean compare
    is cross-multiplied integers (s2·n1 vs s1·n2) — no division,
    no float, no tie ambiguity.

    Scale: lag + rank share one custkey window sort; per-customer
    conditional sums ride the same partitioning; 3-row histogram
    out.
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
        F.row_number().over(w).alias("i"),
        F.count("*").over(Window.partitionBy("o_custkey")).alias("n"),
    )
    g = seq.where(
        F.col("gap_d").isNotNull() & (F.col("n") >= 5)
    ).select(
        "o_custkey",
        "gap_d",
        (F.col("i") - 1).alias("gi"),
        (F.col("n") - 1).alias("ng"),
    )
    first = 2 * F.col("gi") <= F.col("ng")
    halves = g.groupBy("o_custkey").agg(
        F.sum(F.when(first, F.col("gap_d")).otherwise(0))
        .cast("bigint")
        .alias("s1"),
        F.sum(F.when(first, 1).otherwise(0)).cast("bigint").alias("n1"),
        F.sum(F.when(~first, F.col("gap_d")).otherwise(0))
        .cast("bigint")
        .alias("s2"),
        F.sum(F.when(~first, 1).otherwise(0)).cast("bigint").alias("n2"),
    )
    lhs = F.col("s2") * F.col("n1")
    rhs = F.col("s1") * F.col("n2")
    cls = halves.where((F.col("n1") > 0) & (F.col("n2") > 0)).select(
        F.when(lhs < rhs, "accelerating")
        .when(lhs > rhs, "decelerating")
        .otherwise("steady")
        .alias("cadence")
    )
    t = cls.agg(F.count("*").cast("bigint").alias("nt"))
    return (
        cls.groupBy("cadence")
        .agg(F.count("*").cast("bigint").alias("n_customers"))
        .crossJoin(F.broadcast(t))
        .select(
            "cadence",
            "n_customers",
            F.round(
                F.col("n_customers").cast("double") / F.col("nt"), 6
            ).alias("customer_share"),
        )
        .orderBy("cadence")
    )


# ---- x206: order-value band mix by year ----

_X206_SQL = """
WITH r AS (
  SELECT o_totalprice AS v, o_orderkey,
         CAST(YEAR(CAST(o_orderdate AS DATE)) AS BIGINT) AS yr,
         ROW_NUMBER() OVER (ORDER BY o_totalprice, o_orderkey) AS rn,
         COUNT(*) OVER () AS n
  FROM orders),
caps AS (
  SELECT MAX(CASE WHEN rn = CAST(CEIL(0.25 * n) AS BIGINT)
                  THEN v END) AS q1,
         MAX(CASE WHEN rn = CAST(CEIL(0.75 * n) AS BIGINT)
                  THEN v END) AS q3
  FROM r),
b AS (
  SELECT r.yr,
         CASE WHEN r.v <= c.q1 THEN 'a_low'
              WHEN r.v <= c.q3 THEN 'b_mid'
              ELSE 'c_high' END AS band
  FROM r CROSS JOIN caps c),
y AS (SELECT yr, CAST(COUNT(*) AS BIGINT) AS n_year FROM b GROUP BY yr)
SELECT b.yr AS year, b.band,
       CAST(COUNT(*) AS BIGINT) AS n_orders,
       ROUND(CAST(COUNT(*) AS DOUBLE) / MAX(y.n_year), 6)
         AS band_share
FROM b JOIN y ON b.yr = y.yr
GROUP BY b.yr, b.band
ORDER BY year, band
"""


@register("x206_value_band_mix", oracle=_X206_SQL)
def x206_value_band_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order-value band mix by year: orders banded against the
    ALL-TIME value quartiles (rank-exact, so bands are fixed
    goalposts), then each year's low/mid/high share — the
    structural-shift view that distinguishes "we grew because
    orders got bigger" from "we grew because there were more of
    them" (x141 tracks the total; this tracks the shape).

    Band cutoffs are exact data values; shares divide integer
    counts per year.

    Scale: one global rank sort for the two cutoffs, broadcast
    caps into a second scan, (year, band) rollup — same
    cap-then-rescan shape as x185.
    """
    from pyspark.sql import Window

    orders = load_table(spark, sf_dir, "orders")
    r = orders.select(
        F.col("o_totalprice").alias("v"),
        F.year(F.col("o_orderdate").cast("date"))
        .cast("bigint")
        .alias("yr"),
        F.row_number()
        .over(Window.orderBy("o_totalprice", "o_orderkey"))
        .alias("rn"),
        F.count("*").over(Window.partitionBy()).alias("n"),
    )

    def cap(p: float, name: str):
        return F.max(
            F.when(
                F.col("rn")
                == F.ceil(F.lit(p) * F.col("n")).cast("bigint"),
                F.col("v"),
            )
        ).alias(name)

    caps = r.agg(cap(0.25, "q1"), cap(0.75, "q3"))
    b = r.crossJoin(F.broadcast(caps)).select(
        "yr",
        F.when(F.col("v") <= F.col("q1"), "a_low")
        .when(F.col("v") <= F.col("q3"), "b_mid")
        .otherwise("c_high")
        .alias("band"),
    )
    y = b.groupBy("yr").agg(
        F.count("*").cast("bigint").alias("n_year")
    )
    return (
        b.groupBy("yr", "band")
        .agg(F.count("*").cast("bigint").alias("n_orders"))
        .join(F.broadcast(y), "yr")
        .select(
            F.col("yr").alias("year"),
            "band",
            "n_orders",
            F.round(
                F.col("n_orders").cast("double") / F.col("n_year"), 6
            ).alias("band_share"),
        )
        .orderBy("year", "band")
    )


# ---- x207: linear multi-touch attribution ----

_X207_SQL = """
WITH e AS (
  SELECT user_id, ts, event_id, event_type, value,
         SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
           OVER (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS purchase_no
  FROM events),
pre AS (
  SELECT user_id,
         CASE WHEN event_type = 'purchase' THEN purchase_no
              ELSE purchase_no + 1 END AS cycle,
         event_type, value
  FROM e),
cyc AS (
  SELECT user_id, cycle,
         MAX(CASE WHEN event_type = 'purchase'
                  THEN CAST(value AS DECIMAL(18,6)) END) AS purchase_value,
         CAST(SUM(CASE WHEN event_type <> 'purchase' THEN 1 ELSE 0 END)
              AS BIGINT) AS n_touches
  FROM pre GROUP BY user_id, cycle),
credit AS (
  SELECT t.event_type,
         CAST(c.purchase_value * 1000000 AS BIGINT) // c.n_touches
           AS credit_u
  FROM cyc c
  JOIN (SELECT user_id,
               CASE WHEN event_type = 'purchase' THEN purchase_no
                    ELSE purchase_no + 1 END AS cycle,
               event_type
        FROM e WHERE event_type <> 'purchase') t
    ON t.user_id = c.user_id AND t.cycle = c.cycle
  WHERE c.purchase_value IS NOT NULL AND c.n_touches > 0)
SELECT event_type AS channel,
       CAST(COUNT(*) AS BIGINT) AS n_touches_credited,
       CAST(SUM(credit_u) AS DOUBLE) / 1000000 AS attributed_value
FROM credit
GROUP BY channel
ORDER BY channel
"""


@register("x207_linear_attribution", oracle=_X207_SQL)
def x207_linear_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Linear multi-touch attribution: each purchase's value splits
    EQUALLY across the non-purchase events since the user's
    previous purchase (the conversion cycle) — the fairness
    counterpoint to x156's winner-take-all last-touch; comparing
    the two tables shows how much credit last-touch steals from
    upper-funnel views. Cycles come from a running purchase
    counter (no self-join to find boundaries).

    Determinism: the per-touch credit is an exact integer floor
    division in micro-units (double→decimal casts round ties
    differently across engines — measured at the 15th digit over
    18k rows — so no float enters the accumulator at all; the
    sub-micro remainder per purchase is deliberately dropped,
    documented behavior).

    Scale: one user_id window; the cycle join is keyed on
    (user, cycle) — co-partitioned with the window's shuffle;
    channel-sized output.
    """
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    e = ev.withColumn(
        "purchase_no",
        F.sum(
            F.when(F.col("event_type") == "purchase", 1).otherwise(0)
        ).over(w),
    ).withColumn(
        "cycle",
        F.when(
            F.col("event_type") == "purchase", F.col("purchase_no")
        ).otherwise(F.col("purchase_no") + 1),
    )
    cyc = e.groupBy("user_id", "cycle").agg(
        F.max(
            F.when(
                F.col("event_type") == "purchase",
                F.col("value").cast("decimal(18,6)"),
            )
        ).alias("purchase_value"),
        F.sum(
            F.when(F.col("event_type") != "purchase", 1).otherwise(0)
        )
        .cast("bigint")
        .alias("n_touches"),
    )
    touches = e.where(F.col("event_type") != "purchase").select(
        "user_id", "cycle", "event_type"
    )
    credit = (
        touches.join(cyc, ["user_id", "cycle"])
        .where(
            F.col("purchase_value").isNotNull()
            & (F.col("n_touches") > 0)
        )
        .select(
            "event_type",
            F.expr(
                "CAST(purchase_value * 1000000 AS BIGINT)"
                " div n_touches"
            ).alias("credit_u"),
        )
    )
    return (
        credit.groupBy(F.col("event_type").alias("channel"))
        .agg(
            F.count("*").cast("bigint").alias("n_touches_credited"),
            (F.sum("credit_u").cast("double") / 1000000).alias(
                "attributed_value"
            ),
        )
        .orderBy("channel")
    )


# ---- x208: priority -> ship-delay ANOVA ----

_X208_SQL = """
WITH delays AS (
  SELECT o.o_orderpriority AS priority,
         CAST(DATEDIFF('day', CAST(o.o_orderdate AS DATE),
                       CAST(l.l_shipdate AS DATE)) AS BIGINT) AS d
  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey),
per_g AS (
  SELECT priority, CAST(COUNT(*) AS BIGINT) AS n_g,
         CAST(SUM(d) AS BIGINT) AS s_g,
         CAST(SUM(d * d) AS BIGINT) AS ss_g
  FROM delays GROUP BY priority),
tot AS (
  SELECT CAST(SUM(n_g) AS BIGINT) AS n,
         CAST(SUM(s_g) AS BIGINT) AS s,
         CAST(SUM(ss_g) AS BIGINT) AS ss,
         LIST_REDUCE(
           LIST((CAST(s_g AS DOUBLE) / n_g) * CAST(s_g AS DOUBLE)
                ORDER BY priority),
           (x, y) -> x + y) AS explained_raw
  FROM per_g)
SELECT n AS n_lines,
       ROUND(CAST(s AS DOUBLE) / n, 4) AS mean_delay_d,
       ROUND((explained_raw
              - CAST(s AS DOUBLE) * CAST(s AS DOUBLE)
                / CAST(n AS DOUBLE))
             / (CAST(ss AS DOUBLE)
                - CAST(s AS DOUBLE) * CAST(s AS DOUBLE)
                  / CAST(n AS DOUBLE)), 6) AS eta_squared
FROM tot
"""


@register("x208_priority_delay_anova", oracle=_X208_SQL)
def x208_priority_delay_anova(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Does order priority actually move ship delay? One-way ANOVA
    eta-squared of delay days across the 5 priority classes — the
    single number behind x169's percentile table (eta² ≈ 0 means
    the priority field is decorative, and the SLA conversation
    changes). x196's machinery on a categorical business lever.

    Integer delay moments; the 5 per-group mean products fold in
    explicit priority order on both engines (the x196
    determinism rule for cross-row double sums).

    Scale: the orderkey-keyed fact join, a 5-key moment agg,
    1-row output.
    """
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    delays = li.join(orders, li.l_orderkey == orders.o_orderkey).select(
        F.col("o_orderpriority").alias("priority"),
        F.datediff(
            F.col("l_shipdate").cast("date"),
            F.col("o_orderdate").cast("date"),
        )
        .cast("bigint")
        .alias("d"),
    )
    per_g = delays.groupBy("priority").agg(
        F.count("*").cast("bigint").alias("n_g"),
        F.sum("d").cast("bigint").alias("s_g"),
        F.sum(F.col("d") * F.col("d")).cast("bigint").alias("ss_g"),
    )
    tot = per_g.agg(
        F.sum("n_g").cast("bigint").alias("n"),
        F.sum("s_g").cast("bigint").alias("s"),
        F.sum("ss_g").cast("bigint").alias("ss"),
        F.aggregate(
            F.transform(
                F.array_sort(
                    F.collect_list(
                        F.struct(
                            "priority",
                            (
                                (
                                    F.col("s_g").cast("double")
                                    / F.col("n_g")
                                )
                                * F.col("s_g").cast("double")
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
        F.col("n").alias("n_lines"),
        F.round(d("s") / F.col("n"), 4).alias("mean_delay_d"),
        F.round(
            (F.col("explained_raw") - grand) / (d("ss") - grand), 6
        ).alias("eta_squared"),
    )


# ---- x210: user event-diversity histogram (Gini-Simpson) ----

_X210_SQL = """
WITH c AS (
  SELECT user_id, event_type, CAST(COUNT(*) AS BIGINT) AS k
  FROM events GROUP BY user_id, event_type),
u AS (
  SELECT user_id,
         CAST(SUM(k) AS BIGINT) AS t,
         CAST(SUM(k * k) AS BIGINT) AS skk
  FROM c GROUP BY user_id),
b AS (
  SELECT user_id,
         (10 * (t * t - skk)) // (t * t) AS band
  FROM u),
tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS nt FROM b)
SELECT CAST(band AS BIGINT) AS diversity_band,
       CAST(COUNT(*) AS BIGINT) AS n_users,
       ROUND(CAST(COUNT(*) AS DOUBLE) / (SELECT nt FROM tot), 6)
         AS user_share
FROM b
GROUP BY band
ORDER BY diversity_band
"""


@register("x210_event_diversity", oracle=_X210_SQL)
def x210_event_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """User behavioral-diversity histogram via the Gini-Simpson
    index (1 - sum p_i² over a user's event-type mix): band 0 =
    one-trick users (all events the same type), band 8-9 =
    uniformly mixed behavior — the no-logarithm diversity measure
    (Shannon entropy needs libm log, which is not cross-engine
    bit-stable; Simpson needs only integer squares). Banding is
    EXACT integer arithmetic: floor(10·(t²−Σk²)/t²) via integral
    division — no float ever touches the bucketing.

    Scale: (user, type) partial agg → per-user integer moments →
    10-band histogram; one share division at the end.
    """
    ev = load_table(spark, sf_dir, "events")
    c = ev.groupBy("user_id", "event_type").agg(
        F.count("*").cast("bigint").alias("k")
    )
    u = c.groupBy("user_id").agg(
        F.sum("k").cast("bigint").alias("t"),
        F.sum(F.col("k") * F.col("k")).cast("bigint").alias("skk"),
    )
    b = u.select(
        F.expr("(10 * (t * t - skk)) div (t * t)").alias("band")
    )
    tot = b.agg(F.count("*").cast("bigint").alias("nt"))
    return (
        b.groupBy(F.col("band").cast("bigint").alias("diversity_band"))
        .agg(F.count("*").cast("bigint").alias("n_users"))
        .crossJoin(F.broadcast(tot))
        .select(
            "diversity_band",
            "n_users",
            F.round(
                F.col("n_users").cast("double") / F.col("nt"), 6
            ).alias("user_share"),
        )
        .orderBy("diversity_band")
    )


# ---- x211: nation revenue rank stability (Kendall tau) ----

_X211_CUT = "1998-01-01"  # same literal boundary as x160/x178

_X211_SQL = f"""
WITH rev AS (
  SELECT n.n_name AS nation,
         CASE WHEN o.o_orderdate < TIMESTAMP '{_X211_CUT}'
              THEN 'early' ELSE 'late' END AS period,
         CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))
                  * (CAST(1 AS DECIMAL(6,4))
                     - CAST(l.l_discount AS DECIMAL(6,4)))) * 1000000
              AS DECIMAL(19,0)) AS rev_u
  FROM lineitem l
  JOIN orders o ON l.l_orderkey = o.o_orderkey
  JOIN supplier s ON l.l_suppkey = s.s_suppkey
  JOIN nation n ON s.s_nationkey = n.n_nationkey
  GROUP BY nation, period),
rk AS (
  SELECT nation, period,
         ROW_NUMBER() OVER (PARTITION BY period
                            ORDER BY rev_u DESC, nation) AS r
  FROM rev),
wide AS (
  SELECT e.nation, e.r AS r_early, l.r AS r_late
  FROM (SELECT nation, r FROM rk WHERE period = 'early') e
  JOIN (SELECT nation, r FROM rk WHERE period = 'late') l
    ON e.nation = l.nation),
pairs AS (
  SELECT CAST(SUM(CASE WHEN CAST(a.r_early - b.r_early AS BIGINT)
                          * CAST(a.r_late - b.r_late AS BIGINT) > 0
                       THEN 1 ELSE 0 END) AS BIGINT) AS c,
         CAST(SUM(CASE WHEN CAST(a.r_early - b.r_early AS BIGINT)
                          * CAST(a.r_late - b.r_late AS BIGINT) < 0
                       THEN 1 ELSE 0 END) AS BIGINT) AS d,
         CAST(COUNT(*) AS BIGINT) AS n_pairs
  FROM wide a JOIN wide b ON a.nation < b.nation)
SELECT n_pairs, c AS concordant, d AS discordant,
       ROUND(CAST(c - d AS DOUBLE) / n_pairs, 6) AS kendall_tau
FROM pairs
"""


@register("x211_rank_stability", oracle=_X211_SQL)
def x211_rank_stability(spark: SparkSession, sf_dir: str) -> DataFrame:
    """League-table stability: Kendall's tau between nation revenue
    RANKS in the early vs late half — tau near 1 means the
    competitive order is frozen, near 0 means the market reshuffled
    (x160 tracks individual movement; this scores the whole
    ranking's churn in one nonparametric number). Concordant/
    discordant pair counts are pure integer sign tests — no
    variance, no float until the final ratio.

    Scale: the fact work is one (nation, period) aggregate; ranks
    and the pair test run on the 25-row league table (dim-bounded
    self-join, 300 pairs).
    """
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    sup = load_table(spark, sf_dir, "supplier")
    nat = load_table(spark, sf_dir, "nation")
    from pyspark.sql import Window

    disc = (
        F.col("l_extendedprice").cast("decimal(18,2)")
        * (F.lit(1).cast("decimal(6,4)") - F.col("l_discount").cast("decimal(6,4)"))
    )
    rev = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(sup), li.l_suppkey == sup.s_suppkey)
        .join(F.broadcast(nat), sup.s_nationkey == nat.n_nationkey)
        .groupBy(
            F.col("n_name").alias("nation"),
            F.when(
                F.col("o_orderdate") < F.lit(_X211_CUT).cast("timestamp"),
                "early",
            )
            .otherwise("late")
            .alias("period"),
        )
        .agg(
            (F.sum(disc) * 1000000)
            .cast("decimal(19,0)")
            .alias("rev_u")
        )
    )
    rk = rev.withColumn(
        "r",
        F.row_number().over(
            Window.partitionBy("period").orderBy(
                F.desc("rev_u"), "nation"
            )
        ),
    )
    e = rk.where(F.col("period") == "early").select(
        "nation", F.col("r").alias("r_early")
    )
    l = rk.where(F.col("period") == "late").select(
        F.col("nation").alias("nation_l"), F.col("r").alias("r_late")
    )
    wide = e.join(l, e.nation == l.nation_l).select(
        "nation", "r_early", "r_late"
    )
    a = wide.select(
        F.col("nation").alias("na"),
        F.col("r_early").alias("ea"),
        F.col("r_late").alias("la"),
    )
    b = wide.select(
        F.col("nation").alias("nb"),
        F.col("r_early").alias("eb"),
        F.col("r_late").alias("lb"),
    )
    # x213-class widen (caught by tools/accwidth_lint.py, r10): the
    # sign product of two row_number differences wraps int32 past
    # ~46k ranked entities. Harmless at the 25-nation grain, but the
    # operator pattern ranks arbitrary entity tables — widen first.
    sign = (F.col("ea") - F.col("eb")).cast("bigint") * (
        F.col("la") - F.col("lb")
    ).cast("bigint")
    pairs = (
        a.join(b, F.col("na") < F.col("nb"))
        .agg(
            F.sum(F.when(sign > 0, 1).otherwise(0))
            .cast("bigint")
            .alias("concordant"),
            F.sum(F.when(sign < 0, 1).otherwise(0))
            .cast("bigint")
            .alias("discordant"),
            F.count("*").cast("bigint").alias("n_pairs"),
        )
    )
    return pairs.select(
        "n_pairs",
        "concordant",
        "discordant",
        F.round(
            (F.col("concordant") - F.col("discordant")).cast("double")
            / F.col("n_pairs"),
            6,
        ).alias("kendall_tau"),
    )


# ---- x212: assortment whitespace (nation x brand gaps) ----

_X212_SQL = """
WITH sold AS (
  SELECT DISTINCT c.c_nationkey AS nationkey, p.p_brand
  FROM lineitem l
  JOIN orders o ON l.l_orderkey = o.o_orderkey
  JOIN customer c ON o.o_custkey = c.c_custkey
  JOIN part p ON l.l_partkey = p.p_partkey),
universe AS (
  SELECT n.n_nationkey AS nationkey, n.n_name AS nation, b.p_brand
  FROM nation n CROSS JOIN (SELECT DISTINCT p_brand FROM part) b),
cov AS (
  SELECT u.nation, u.p_brand,
         CASE WHEN s.p_brand IS NULL THEN 0 ELSE 1 END AS sold
  FROM universe u LEFT JOIN sold s
    ON u.nationkey = s.nationkey AND u.p_brand = s.p_brand)
SELECT nation,
       CAST(COUNT(*) AS BIGINT) AS n_brands,
       CAST(SUM(sold) AS BIGINT) AS n_brands_sold,
       CAST(COUNT(*) - SUM(sold) AS BIGINT) AS n_missing_brands,
       MIN(CASE WHEN sold = 0 THEN p_brand END) AS first_missing_brand,
       ROUND(CAST(SUM(sold) AS DOUBLE) / COUNT(*), 6) AS coverage
FROM cov
GROUP BY nation
ORDER BY coverage, nation
"""


@register("x212_assortment_whitespace", oracle=_X212_SQL)
def x212_assortment_whitespace(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Assortment whitespace scan: (customer nation, brand)
    combinations with ZERO sales — the expansion target list
    ("brand X has never sold to nation Y"). The universe is the
    nation x distinct-brand cross product (dim-bounded, 25 x 25),
    left-joined against observed sales pairs; every nation reports
    its coverage share so the table is informative even when the
    market is fully penetrated (as the larger fixtures are), and
    the first missing brand names the first expansion target when
    it is not.

    Scale: the fact table reduces to DISTINCT (nation, brand)
    pairs FIRST (bounded by the dim product, tiny), so the
    expensive side collapses before any join; the cross-product
    universe is dims-only. Nothing fact-sized survives past the
    distinct.
    """
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    part = load_table(spark, sf_dir, "part")
    nat = load_table(spark, sf_dir, "nation")
    sold = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .select(F.col("c_nationkey").alias("nationkey"), "p_brand")
        .distinct()
    )
    brands = part.select("p_brand").distinct()
    universe = nat.select(
        F.col("n_nationkey").alias("nationkey"),
        F.col("n_name").alias("nation"),
    ).crossJoin(brands)
    cov = universe.join(
        sold.withColumn("sold", F.lit(1)),
        ["nationkey", "p_brand"],
        "left",
    ).select(
        "nation", "p_brand", F.coalesce("sold", F.lit(0)).alias("sold")
    )
    return (
        cov.groupBy("nation")
        .agg(
            F.count("*").cast("bigint").alias("n_brands"),
            F.sum("sold").cast("bigint").alias("n_brands_sold"),
            (F.count("*") - F.sum("sold"))
            .cast("bigint")
            .alias("n_missing_brands"),
            F.min(
                F.when(F.col("sold") == 0, F.col("p_brand"))
            ).alias("first_missing_brand"),
            F.round(
                F.sum("sold").cast("double") / F.count("*"), 6
            ).alias("coverage"),
        )
        .orderBy("coverage", "nation")
    )


# ---- x213: Spearman rank correlation, price vs revenue ----

_X213_SQL = """
WITH rev AS (
  SELECT l_partkey,
         CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                  * (CAST(1 AS DECIMAL(6,4))
                     - CAST(l_discount AS DECIMAL(6,4)))) * 1000000
              AS DECIMAL(19,0)) AS rev_u
  FROM lineitem GROUP BY l_partkey),
j AS (
  SELECT p.p_partkey, p.p_retailprice, r.rev_u
  FROM part p JOIN rev r ON p.p_partkey = r.l_partkey),
rk AS (
  SELECT ROW_NUMBER() OVER (ORDER BY p_retailprice, p_partkey)
           AS price_rank,
         ROW_NUMBER() OVER (ORDER BY rev_u, p_partkey) AS rev_rank
  FROM j),
s AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM((price_rank - rev_rank) * (price_rank - rev_rank))
              AS BIGINT) AS sd2
  FROM rk)
SELECT n AS n_parts, sd2 AS sum_sq_rank_diff,
       ROUND(1 - 6 * CAST(sd2 AS DOUBLE)
               / (CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) * CAST(n AS DOUBLE) - 1)),
             6) AS spearman_rho
FROM s
"""


@register("x213_spearman_price_revenue", oracle=_X213_SQL)
def x213_spearman_price_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spearman rank correlation between catalog price and realized
    revenue across parts — "do expensive parts earn more?"
    answered monotonically (Spearman sees any monotone relation
    where x167's Pearson sees only linear ones; disagreement
    between the two flags nonlinearity). rho = 1 − 6·Σd²/(n(n²−1))
    from INTEGER rank differences — exact until the single final
    division. Both rankings tiebreak on partkey, so d² is
    well-defined.

    Scale: fact agg at partkey grain, two part-dim-sized rank
    sorts, a 1-row moment reduce.
    """
    from pyspark.sql import Window

    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    disc = (
        F.col("l_extendedprice").cast("decimal(18,2)")
        * (F.lit(1).cast("decimal(6,4)") - F.col("l_discount").cast("decimal(6,4)"))
    )
    rev = li.groupBy("l_partkey").agg(
        (F.sum(disc) * 1000000).cast("decimal(19,0)").alias("rev_u")
    )
    j = F.broadcast(part).join(rev, part.p_partkey == rev.l_partkey)
    rk = j.select(
        F.row_number()
        .over(Window.orderBy("p_retailprice", "p_partkey"))
        .alias("price_rank"),
        F.row_number()
        .over(Window.orderBy("rev_u", "p_partkey"))
        .alias("rev_rank"),
    )
    # row_number is IntegerType: the rank difference must widen to
    # bigint BEFORE squaring — at n parts, d² reaches n², which
    # silently wraps int32 past ~46k rows under the engine's
    # permissive (non-ANSI) policy. Caught by the 4x-corpus
    # differential (SCALE.md §"Corpus-differential ladder (r9)").
    dd = (F.col("price_rank") - F.col("rev_rank")).cast("bigint")
    s = rk.agg(
        F.count("*").cast("bigint").alias("n"),
        F.sum(dd * dd).alias("sd2"),
    )
    # rho's cubic products run in DOUBLE (r9 ADVICE): in bigint,
    # n·(n²−1) wraps int64 past ~2.1M ranked parts and 6·sd2 past
    # sd2 ≈ 1.5e18 — the same x213 class one tier up. Double is exact
    # to 2^53 and its ~1e-16 relative error is invisible at the final
    # 6-decimal round; both engines evaluate the identical IEEE ops,
    # so the PRE-round doubles are bit-identical. Residual risk (r10
    # ADVICE): the final ROUND(double, 6) still applies each engine's
    # divergent half-way semantics (Spark: HALF_UP on the shortest
    # decimal repr; DuckDB: round of the binary value) — identical
    # inputs do NOT guarantee identical rounded output if the exact
    # rational 1−6·sd2/(n(n²−1)) lands on a 5e-7 boundary (the q34
    # mechanism). This composite site IS in the --rounded-ratios
    # inventory (kind=composite since r11's rational-of-integers
    # generalization), so a future 1-ulp rung flake finds it by
    # lookup; it has no single (k, n) for the --solvable-at screen,
    # and its shipped-fixture safety evidence is the live oracle
    # equality at all 3 SFs + the 16x rung. Remaining documented cap:
    # the bigint Σd² ACCUMULATOR itself, exact to n(n²−1)/3 ≤ 2^63−1,
    # i.e. ~3.0e6 ranked parts — at 100 TB part counts, widen the
    # sum to decimal(38,0).
    n_d = F.col("n").cast("double")
    return s.select(
        F.col("n").alias("n_parts"),
        F.col("sd2").alias("sum_sq_rank_diff"),
        F.round(
            1 - 6 * F.col("sd2").cast("double") / (n_d * (n_d * n_d - 1)),
            6,
        ).alias("spearman_rho"),
    )


# ---- x214: longest daily-activity streaks (gaps and islands) ----

_X214_SQL = """
WITH days AS (
  SELECT DISTINCT user_id, CAST(ts AS DATE) AS d FROM events),
isl AS (
  SELECT user_id,
         CAST(d AS DATE) - CAST(ROW_NUMBER() OVER
           (PARTITION BY user_id ORDER BY d) AS INTEGER) AS grp
  FROM days),
streaks AS (
  SELECT user_id, grp, CAST(COUNT(*) AS BIGINT) AS len
  FROM isl GROUP BY user_id, grp),
longest AS (
  SELECT user_id, CAST(MAX(len) AS BIGINT) AS max_streak
  FROM streaks GROUP BY user_id),
t AS (SELECT CAST(COUNT(*) AS BIGINT) AS nt FROM longest)
SELECT max_streak AS streak_days,
       CAST(COUNT(*) AS BIGINT) AS n_users,
       ROUND(CAST(COUNT(*) AS DOUBLE) / (SELECT nt FROM t), 6)
         AS user_share
FROM longest
GROUP BY max_streak
ORDER BY streak_days
"""


@register("x214_longest_streaks", oracle=_X214_SQL)
def x214_longest_streaks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Longest consecutive-day activity streak per user, as a
    histogram — THE gaps-and-islands query (consecutive dates
    collapse to a constant when you subtract the row number), and
    the habit metric behind every streak badge. Longer max
    streaks than x150's raw active-day counts indicate clumped
    engagement vs scattered.

    Purely integer date arithmetic throughout.

    Scale: distinct (user, day) then ONE user window — the
    island trick needs no self-join or recursive walk; histogram
    output. Calendar bounds the per-user row count.
    """
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events")
    days = ev.select(
        "user_id", F.col("ts").cast("date").alias("d")
    ).distinct()
    isl = days.select(
        "user_id",
        F.date_sub(
            "d",
            F.row_number().over(
                Window.partitionBy("user_id").orderBy("d")
            ),
        ).alias("grp"),
    )
    streaks = isl.groupBy("user_id", "grp").agg(
        F.count("*").cast("bigint").alias("len")
    )
    longest = streaks.groupBy("user_id").agg(
        F.max("len").cast("bigint").alias("max_streak")
    )
    t = longest.agg(F.count("*").cast("bigint").alias("nt"))
    return (
        longest.groupBy(F.col("max_streak").alias("streak_days"))
        .agg(F.count("*").cast("bigint").alias("n_users"))
        .crossJoin(F.broadcast(t))
        .select(
            "streak_days",
            "n_users",
            F.round(
                F.col("n_users").cast("double") / F.col("nt"), 6
            ).alias("user_share"),
        )
        .orderBy("streak_days")
    )


# ---- x215: language purity via majority-language vocabulary ----

_X215_SQL = """
WITH tok AS (
  SELECT doc_id, lang, UNNEST(STRING_SPLIT(LOWER(text), ' ')) AS t
  FROM documents),
vocab AS (
  SELECT t, lang, CAST(COUNT(*) AS BIGINT) AS n,
         ROW_NUMBER() OVER (PARTITION BY t
                            ORDER BY COUNT(*) DESC, lang) AS rn
  FROM tok GROUP BY t, lang),
majority AS (
  SELECT t, lang AS major_lang FROM vocab WHERE rn = 1),
scored AS (
  SELECT tok.doc_id, tok.lang,
         CAST(COUNT(*) AS BIGINT) AS n_tokens,
         CAST(SUM(CASE WHEN m.major_lang = tok.lang THEN 1 ELSE 0 END)
              AS BIGINT) AS n_pure
  FROM tok JOIN majority m ON tok.t = m.t
  GROUP BY tok.doc_id, tok.lang)
SELECT lang,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       ROUND(CAST(SUM(n_pure) AS DOUBLE) / SUM(n_tokens), 6)
         AS mean_purity,
       CAST(SUM(CASE WHEN 2 * n_pure < n_tokens THEN 1 ELSE 0 END)
            AS BIGINT) AS n_suspect_docs
FROM scored
GROUP BY lang
ORDER BY lang
"""


@register("x215_language_purity", oracle=_X215_SQL)
def x215_language_purity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Language-purity audit without external dictionaries: build
    each token's majority language from the corpus itself (the
    lang that uses it most, ties broken lexically), then score
    every doc by the share of its tokens whose majority language
    matches the doc's tag. Docs under 50% purity are suspects —
    mislabeled or code-switched — and the per-lang suspect count
    is the re-annotation queue (complements x108's confusion
    matrix, which needs a trained classifier; this needs only the
    corpus). The 50% gate is an integer cross-multiplication.

    Scale: two passes over the exploded tokens sharing one
    (token)-keyed shuffle family: vocabulary majority (Zipf head
    collapses map-side) and the doc scoring join on the same key;
    per-lang rollup output.
    """
    from pyspark.sql import Window

    docs = load_table(spark, sf_dir, "documents")
    tok = docs.select(
        "doc_id",
        "lang",
        F.explode(F.split(F.lower("text"), " ")).alias("t"),
    )
    vocab = tok.groupBy("t", "lang").agg(
        F.count("*").cast("bigint").alias("n")
    )
    majority = (
        vocab.withColumn(
            "rn",
            F.row_number().over(
                Window.partitionBy("t").orderBy(F.desc("n"), "lang")
            ),
        )
        .where(F.col("rn") == 1)
        .select("t", F.col("lang").alias("major_lang"))
    )
    scored = (
        tok.join(majority, "t")
        .groupBy("doc_id", "lang")
        .agg(
            F.count("*").cast("bigint").alias("n_tokens"),
            F.sum(
                F.when(
                    F.col("major_lang") == F.col("lang"), 1
                ).otherwise(0)
            )
            .cast("bigint")
            .alias("n_pure"),
        )
    )
    return (
        scored.groupBy("lang")
        .agg(
            F.count("*").cast("bigint").alias("n_docs"),
            F.round(
                F.sum("n_pure").cast("double") / F.sum("n_tokens"), 6
            ).alias("mean_purity"),
            F.sum(
                F.when(
                    2 * F.col("n_pure") < F.col("n_tokens"), 1
                ).otherwise(0)
            )
            .cast("bigint")
            .alias("n_suspect_docs"),
        )
        .orderBy("lang")
    )


# ---- x216: supplier churn and entrants by nation ----

_X216_CUT = "1998-01-01"  # same literal boundary as x160/x178/x211

_X216_SQL = f"""
WITH active AS (
  SELECT DISTINCT s.s_nationkey, l.l_suppkey,
         CASE WHEN o.o_orderdate < TIMESTAMP '{_X216_CUT}'
              THEN 'early' ELSE 'late' END AS period
  FROM lineitem l
  JOIN orders o ON l.l_orderkey = o.o_orderkey
  JOIN supplier s ON l.l_suppkey = s.s_suppkey),
wide AS (
  SELECT COALESCE(e.s_nationkey, l.s_nationkey) AS nationkey,
         COALESCE(e.l_suppkey, l.l_suppkey) AS suppkey,
         CASE WHEN e.l_suppkey IS NOT NULL THEN 1 ELSE 0 END AS in_early,
         CASE WHEN l.l_suppkey IS NOT NULL THEN 1 ELSE 0 END AS in_late
  FROM (SELECT * FROM active WHERE period = 'early') e
  FULL JOIN (SELECT * FROM active WHERE period = 'late') l
    ON e.l_suppkey = l.l_suppkey AND e.s_nationkey = l.s_nationkey)
SELECT n.n_name AS nation,
       CAST(SUM(in_early) AS BIGINT) AS n_early,
       CAST(SUM(in_late) AS BIGINT) AS n_late,
       CAST(SUM(CASE WHEN in_early = 1 AND in_late = 0
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_churned,
       CAST(SUM(CASE WHEN in_early = 0 AND in_late = 1
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_entrants
FROM wide JOIN nation n ON wide.nationkey = n.n_nationkey
GROUP BY nation
ORDER BY nation
"""


@register("x216_supplier_churn", oracle=_X216_SQL)
def x216_supplier_churn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Supplier base churn by nation: vendors active in the early
    period but silent in the late one (churned) vs new entrants —
    the supply-base stability view procurement pairs with x189's
    single-source risk (churn among single-source vendors is the
    compound risk). Set membership via DISTINCT + full outer
    join; all counts integer.

    Scale: the fact table collapses to DISTINCT (nation,
    supplier, period) first — supplier-dim-bounded — so the
    full-outer join and rollup touch only dim-sized rows.
    """
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    sup = load_table(spark, sf_dir, "supplier")
    nat = load_table(spark, sf_dir, "nation")
    active = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(sup), li.l_suppkey == sup.s_suppkey)
        .select(
            "s_nationkey",
            "l_suppkey",
            F.when(
                F.col("o_orderdate") < F.lit(_X216_CUT).cast("timestamp"),
                "early",
            )
            .otherwise("late")
            .alias("period"),
        )
        .distinct()
    )
    e = active.where(F.col("period") == "early").select(
        F.col("s_nationkey").alias("nk_e"),
        F.col("l_suppkey").alias("sk_e"),
    )
    l = active.where(F.col("period") == "late").select(
        F.col("s_nationkey").alias("nk_l"),
        F.col("l_suppkey").alias("sk_l"),
    )
    wide = e.join(
        l,
        (e.sk_e == l.sk_l) & (e.nk_e == l.nk_l),
        "full_outer",
    ).select(
        F.coalesce("nk_e", "nk_l").alias("nationkey"),
        F.when(F.col("sk_e").isNotNull(), 1).otherwise(0).alias("in_early"),
        F.when(F.col("sk_l").isNotNull(), 1).otherwise(0).alias("in_late"),
    )
    return (
        wide.join(F.broadcast(nat), wide.nationkey == nat.n_nationkey)
        .groupBy(F.col("n_name").alias("nation"))
        .agg(
            F.sum("in_early").cast("bigint").alias("n_early"),
            F.sum("in_late").cast("bigint").alias("n_late"),
            F.sum(
                F.when(
                    (F.col("in_early") == 1) & (F.col("in_late") == 0), 1
                ).otherwise(0)
            )
            .cast("bigint")
            .alias("n_churned"),
            F.sum(
                F.when(
                    (F.col("in_early") == 0) & (F.col("in_late") == 1), 1
                ).otherwise(0)
            )
            .cast("bigint")
            .alias("n_entrants"),
        )
        .orderBy("nation")
    )


# ---- x217: naive-seasonal forecast backtest ----

_X217_SQL = """
WITH monthly AS (
  SELECT STRFTIME(DATE_TRUNC('month', CAST(o_orderdate AS DATE)),
                  '%Y-%m') AS month,
         CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) * 100
              AS DECIMAL(19,0)) AS c
  FROM orders GROUP BY month),
lagged AS (
  SELECT month, c,
         LAG(c, 12) OVER (ORDER BY month) AS c_ly
  FROM monthly),
scored AS (
  SELECT month, c, c_ly,
         CAST(ABS(CAST(c AS BIGINT) - CAST(c_ly AS BIGINT))
              AS DECIMAL(28,12))
           / CAST(c AS DECIMAL(28,12)) AS ape
  FROM lagged WHERE c_ly IS NOT NULL)
SELECT CAST(COUNT(*) AS BIGINT) AS n_months,
       ROUND(CAST(SUM(CASE WHEN c_ly > c THEN 1 ELSE 0 END)
                  AS DOUBLE) / COUNT(*), 6) AS over_forecast_share,
       ROUND(CAST(SUM(ape) AS DOUBLE) / COUNT(*), 6) AS mape
FROM scored
"""


@register("x217_seasonal_naive_backtest", oracle=_X217_SQL)
def x217_seasonal_naive_backtest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seasonal-naive forecast backtest: predict each month's
    revenue as the same month last year and score the MAPE — the
    BASELINE every fancier forecaster must beat before it earns a
    deploy (if your model's MAPE isn't under the naive lag-12's,
    ship the lag). over_forecast_share shows bias direction.

    The absolute percentage error is a DECIMAL(28,12)/DECIMAL
    division per month — decimal division at fixed scale, then
    an exact decimal sum (no double accumulates across rows).

    Scale: month-grain agg; the lag and scoring run on the
    calendar-bounded monthly table.
    """
    from pyspark.sql import Window

    orders = load_table(spark, sf_dir, "orders")
    monthly = (
        orders.groupBy(
            F.date_format(
                F.date_trunc("month", F.col("o_orderdate").cast("date")),
                "yyyy-MM",
            ).alias("month")
        )
        .agg(
            (F.sum(F.col("o_totalprice").cast("decimal(18,2)")) * 100)
            .cast("decimal(19,0)")
            .alias("c")
        )
    )
    lagged = monthly.select(
        "month",
        "c",
        F.lag("c", 12).over(Window.orderBy("month")).alias("c_ly"),
    )
    scored = lagged.where(F.col("c_ly").isNotNull()).select(
        "c",
        "c_ly",
        (
            F.abs(
                F.col("c").cast("bigint") - F.col("c_ly").cast("bigint")
            ).cast("decimal(28,12)")
            / F.col("c").cast("decimal(28,12)")
        ).alias("ape"),
    )
    return scored.agg(
        F.count("*").cast("bigint").alias("n_months"),
        F.round(
            F.sum(
                F.when(F.col("c_ly") > F.col("c"), 1).otherwise(0)
            ).cast("double")
            / F.count("*"),
            6,
        ).alias("over_forecast_share"),
        F.round(
            F.sum("ape").cast("double") / F.count("*"), 6
        ).alias("mape"),
    )


# ---- x218: source vocabulary exclusivity ----

_X218_SQL = """
WITH tok AS (
  SELECT source, UNNEST(STRING_SPLIT(LOWER(text), ' ')) AS t
  FROM documents),
cnt AS (
  SELECT source, t, CAST(COUNT(*) AS BIGINT) AS n
  FROM tok GROUP BY source, t),
spread AS (
  SELECT t, CAST(COUNT(*) AS BIGINT) AS n_sources
  FROM cnt GROUP BY t)
SELECT c.source,
       CAST(COUNT(*) AS BIGINT) AS n_types,
       CAST(SUM(CASE WHEN s.n_sources = 1 THEN 1 ELSE 0 END)
            AS BIGINT) AS n_exclusive_types,
       ROUND(CAST(SUM(CASE WHEN s.n_sources = 1 THEN 1 ELSE 0 END)
                  AS DOUBLE) / COUNT(*), 6) AS type_exclusivity,
       ROUND(CAST(SUM(CASE WHEN s.n_sources = 1 THEN c.n ELSE 0 END)
                  AS DOUBLE) / SUM(c.n), 6) AS token_exclusivity
FROM cnt c JOIN spread s ON c.t = s.t
GROUP BY c.source
ORDER BY c.source
"""


@register("x218_vocab_exclusivity", oracle=_X218_SQL)
def x218_vocab_exclusivity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Source vocabulary exclusivity: the share of a source's
    vocabulary (and of its token mass) that appears in NO other
    source — high exclusivity marks domain-specialist sources
    worth oversampling for coverage; near-zero marks me-too crawls
    dedup should collapse. Inverts x92's pairwise overlap into a
    per-source uniqueness number in one pass.

    Integer type/token counts; two divisions per source.

    Scale: (source, type) partial agg, a type-keyed spread count
    (vocabulary-sized), and a join back on the same type key —
    the Zipf head collapses map-side in both aggregates.
    """
    docs = load_table(spark, sf_dir, "documents")
    tok = docs.select(
        "source", F.explode(F.split(F.lower("text"), " ")).alias("t")
    )
    cnt = tok.groupBy("source", "t").agg(
        F.count("*").cast("bigint").alias("n")
    )
    spread = cnt.groupBy("t").agg(
        F.count("*").cast("bigint").alias("n_sources")
    )
    excl = F.when(F.col("n_sources") == 1, 1).otherwise(0)
    return (
        cnt.join(spread, "t")
        .groupBy("source")
        .agg(
            F.count("*").cast("bigint").alias("n_types"),
            F.sum(excl).cast("bigint").alias("n_exclusive_types"),
            F.round(
                F.sum(excl).cast("double") / F.count("*"), 6
            ).alias("type_exclusivity"),
            F.round(
                F.sum(
                    F.when(F.col("n_sources") == 1, F.col("n")).otherwise(
                        0
                    )
                ).cast("double")
                / F.sum("n"),
                6,
            ).alias("token_exclusivity"),
        )
        .orderBy("source")
    )


# ---- x219: weekend revenue lift (Welch t-statistic) ----

_X219_SQL = """
WITH daily AS (
  SELECT CAST(o_orderdate AS DATE) AS d,
         CASE WHEN DAYOFWEEK(CAST(o_orderdate AS DATE)) IN (0, 6)
              THEN 'weekend' ELSE 'weekday' END AS daypart,
         CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) * 100
              AS DECIMAL(19,0)) AS c
  FROM orders GROUP BY d, daypart),
g AS (
  SELECT daypart,
         CAST(COUNT(*) AS BIGINT) AS n,
         SUM(c) AS s, SUM(c * c) AS ss
  FROM daily GROUP BY daypart),
wide AS (
  SELECT
    MAX(CASE WHEN daypart = 'weekend' THEN n END) AS n1,
    MAX(CASE WHEN daypart = 'weekend' THEN s END) AS s1,
    MAX(CASE WHEN daypart = 'weekend' THEN ss END) AS ss1,
    MAX(CASE WHEN daypart = 'weekday' THEN n END) AS n2,
    MAX(CASE WHEN daypart = 'weekday' THEN s END) AS s2,
    MAX(CASE WHEN daypart = 'weekday' THEN ss END) AS ss2
  FROM g)
SELECT CAST(n1 AS BIGINT) AS n_weekend_days,
       CAST(n2 AS BIGINT) AS n_weekday_days,
       ROUND((CAST(s1 AS DOUBLE) / n1) / 100, 2) AS mean_weekend,
       ROUND((CAST(s2 AS DOUBLE) / n2) / 100, 2) AS mean_weekday,
       ROUND((CAST(s1 AS DOUBLE) / n1 - CAST(s2 AS DOUBLE) / n2)
             / SQRT(
                 ((CAST(ss1 AS DOUBLE)
                   - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE)
                     / CAST(n1 AS DOUBLE))
                  / (CAST(n1 AS DOUBLE) - 1)) / n1
                 + ((CAST(ss2 AS DOUBLE)
                     - CAST(s2 AS DOUBLE) * CAST(s2 AS DOUBLE)
                       / CAST(n2 AS DOUBLE))
                    / (CAST(n2 AS DOUBLE) - 1)) / n2),
             6) AS welch_t
FROM wide
"""


@register("x219_weekend_lift_ttest", oracle=_X219_SQL)
def x219_weekend_lift_ttest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekend revenue lift, Welch t-statistic: do weekend days
    earn detectably different revenue than weekdays once both
    groups' own variances are respected (Welch, not pooled — the
    honest version when group sizes/variances differ ~2:5)? |t|
    above ~2 is the usual "real at 95%" bar; the continuous-scale
    sibling of x136's proportion z-test.

    Exact decimal cent moments; the t formula is one fixed
    + - * / sqrt expression over their double casts.

    Scale: day-grain agg, 2-group moments, 1-row output.
    """
    orders = load_table(spark, sf_dir, "orders")
    daily = (
        orders.groupBy(
            F.col("o_orderdate").cast("date").alias("d"),
            F.when(
                F.dayofweek(F.col("o_orderdate").cast("date")).isin(1, 7),
                "weekend",
            )
            .otherwise("weekday")
            .alias("daypart"),
        )
        .agg(
            (F.sum(F.col("o_totalprice").cast("decimal(18,2)")) * 100)
            .cast("decimal(19,0)")
            .alias("c")
        )
    )
    g = daily.groupBy("daypart").agg(
        F.count("*").cast("bigint").alias("n"),
        F.sum("c").alias("s"),
        F.sum(F.col("c") * F.col("c")).alias("ss"),
    )

    def pick(part: str, col: str, name: str):
        return F.max(
            F.when(F.col("daypart") == part, F.col(col))
        ).alias(name)

    wide = g.agg(
        pick("weekend", "n", "n1"),
        pick("weekend", "s", "s1"),
        pick("weekend", "ss", "ss1"),
        pick("weekday", "n", "n2"),
        pick("weekday", "s", "s2"),
        pick("weekday", "ss", "ss2"),
    )
    d = lambda c: F.col(c).cast("double")  # noqa: E731
    var1 = (d("ss1") - d("s1") * d("s1") / d("n1")) / (d("n1") - 1)
    var2 = (d("ss2") - d("s2") * d("s2") / d("n2")) / (d("n2") - 1)
    t = (d("s1") / F.col("n1") - d("s2") / F.col("n2")) / F.sqrt(
        var1 / F.col("n1") + var2 / F.col("n2")
    )
    return wide.select(
        F.col("n1").cast("bigint").alias("n_weekend_days"),
        F.col("n2").cast("bigint").alias("n_weekday_days"),
        F.round((d("s1") / F.col("n1")) / 100, 2).alias("mean_weekend"),
        F.round((d("s2") / F.col("n2")) / 100, 2).alias("mean_weekday"),
        F.round(t, 6).alias("welch_t"),
    )


# ---- x220: daily KPI snapshot (cross-table dashboard feed) ----

_X220_SQL = """
WITH rev AS (
  SELECT CAST(o_orderdate AS DATE) AS d,
         CAST(COUNT(*) AS BIGINT) AS n_orders,
         CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
           AS revenue
  FROM orders GROUP BY d),
act AS (
  SELECT CAST(ts AS DATE) AS d,
         CAST(COUNT(DISTINCT user_id) AS BIGINT) AS active_users,
         CAST(COUNT(*) AS BIGINT) AS n_events,
         CAST(COUNT(DISTINCT CASE WHEN event_type = 'purchase'
                                  THEN user_id END) AS BIGINT)
           AS purchasers,
         CAST(SUM(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END)
              AS BIGINT) AS n_errors
  FROM events GROUP BY d),
span AS (
  SELECT MAX(d) AS dmax FROM act)
SELECT a.d, a.active_users, a.n_events,
       ROUND(CAST(a.purchasers AS DOUBLE) / a.active_users, 6)
         AS purchase_conversion,
       ROUND(CAST(a.n_errors AS DOUBLE) / a.n_events, 6) AS error_rate,
       COALESCE(r.n_orders, 0) AS n_orders,
       ROUND(COALESCE(r.revenue, 0), 2) AS revenue
FROM act a
LEFT JOIN rev r ON a.d = r.d
CROSS JOIN span s
WHERE a.d > s.dmax - INTERVAL 14 DAY
ORDER BY a.d
"""


@register("x220_daily_kpi_snapshot", oracle=_X220_SQL)
def x220_daily_kpi_snapshot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily KPI snapshot for the trailing 14 days: active users,
    event volume, purchase conversion, error rate (events table)
    date-aligned with order count and revenue (orders table) —
    the one materialized view behind an exec dashboard, and the
    repo's demonstration of a cross-fact-table date-spine join.
    Anchored to the data's own max date so the query reproduces.

    Integer counts and exact decimal revenue; two ratios per day.

    Scale: each fact aggregates to day grain independently
    (map-side combinable), then a day-keyed join of two tiny
    tables; the 14-day filter prunes before the join via the
    broadcast anchor.
    """
    orders = load_table(spark, sf_dir, "orders")
    ev = load_table(spark, sf_dir, "events")
    rev = (
        orders.groupBy(F.col("o_orderdate").cast("date").alias("d"))
        .agg(
            F.count("*").cast("bigint").alias("n_orders"),
            F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
            .cast("double")
            .alias("revenue"),
        )
    )
    act = (
        ev.groupBy(F.col("ts").cast("date").alias("d"))
        .agg(
            F.countDistinct("user_id").cast("bigint").alias("active_users"),
            F.count("*").cast("bigint").alias("n_events"),
            F.countDistinct(
                F.when(
                    F.col("event_type") == "purchase", F.col("user_id")
                )
            )
            .cast("bigint")
            .alias("purchasers"),
            F.sum(
                F.when(F.col("event_type") == "error", 1).otherwise(0)
            )
            .cast("bigint")
            .alias("n_errors"),
        )
    )
    span = act.agg(F.max("d").alias("dmax"))
    return (
        act.crossJoin(F.broadcast(span))
        .where(F.col("d") > F.date_sub(F.col("dmax"), 14))
        .join(rev, "d", "left")
        .select(
            "d",
            "active_users",
            "n_events",
            F.round(
                F.col("purchasers").cast("double")
                / F.col("active_users"),
                6,
            ).alias("purchase_conversion"),
            F.round(
                F.col("n_errors").cast("double") / F.col("n_events"), 6
            ).alias("error_rate"),
            F.coalesce("n_orders", F.lit(0)).alias("n_orders"),
            F.round(F.coalesce("revenue", F.lit(0.0)), 2).alias(
                "revenue"
            ),
        )
        .orderBy("d")
    )


# ---- x221: tokenization byte-efficiency per language ----

_X221_SQL = """
WITH m AS (
  SELECT lang,
         STRLEN(text) AS n_bytes,
         LENGTH(text) AS n_chars,
         LEN(STRING_SPLIT(text, ' ')) AS n_tokens
  FROM documents)
SELECT lang,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(n_bytes) AS BIGINT) AS total_bytes,
       ROUND(CAST(SUM(n_bytes) AS DOUBLE) / SUM(n_chars), 6)
         AS bytes_per_char,
       ROUND(CAST(SUM(n_bytes) AS DOUBLE) / SUM(n_tokens), 4)
         AS bytes_per_token,
       ROUND(CAST(SUM(n_chars) AS DOUBLE) / SUM(n_tokens), 4)
         AS chars_per_token
FROM m
GROUP BY lang
ORDER BY lang
"""


@register("x221_bytes_per_token", oracle=_X221_SQL)
def x221_bytes_per_token(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenization byte-efficiency per language: bytes/char
    (multibyte density — 1.0 is pure ASCII, CJK runs ~3),
    bytes/token, and chars/token — the capacity-planning numbers
    for storage budgets and for spotting languages a byte-level
    BPE will systematically over-fragment (x146's fertility
    measures a FIXED tokenizer; this measures the text itself).

    Byte counts via Spark octet_length ↔ DuckDB STRLEN (both
    UTF-8 bytes; DuckDB's OCTET_LENGTH is BLOB-only);
    integer sums, one division per ratio.

    Scale: pure narrow map + languages-sized aggregate.
    """
    docs = load_table(spark, sf_dir, "documents")
    m = docs.select(
        "lang",
        F.octet_length("text").alias("n_bytes"),
        F.length("text").alias("n_chars"),
        F.size(F.split(F.col("text"), " ")).alias("n_tokens"),
    )
    return (
        m.groupBy("lang")
        .agg(
            F.count("*").cast("bigint").alias("n_docs"),
            F.sum("n_bytes").cast("bigint").alias("total_bytes"),
            F.round(
                F.sum("n_bytes").cast("double") / F.sum("n_chars"), 6
            ).alias("bytes_per_char"),
            F.round(
                F.sum("n_bytes").cast("double") / F.sum("n_tokens"), 4
            ).alias("bytes_per_token"),
            F.round(
                F.sum("n_chars").cast("double") / F.sum("n_tokens"), 4
            ).alias("chars_per_token"),
        )
        .orderBy("lang")
    )


# ---- x222: first vs repeat order value per segment ----

_X222_SQL = """
WITH seq AS (
  SELECT c.c_mktsegment AS segment,
         CAST(o.o_totalprice AS DECIMAL(18,2)) AS price,
         ROW_NUMBER() OVER (PARTITION BY o.o_custkey
                            ORDER BY o.o_orderdate, o.o_orderkey) AS i
  FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey)
SELECT segment,
       CAST(SUM(CASE WHEN i = 1 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_first,
       CAST(SUM(CASE WHEN i > 1 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_repeat,
       ROUND(CAST(SUM(CASE WHEN i = 1 THEN price
                           ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE)
             / SUM(CASE WHEN i = 1 THEN 1 ELSE 0 END), 2)
         AS first_aov,
       ROUND(CAST(SUM(CASE WHEN i > 1 THEN price
                           ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE)
             / SUM(CASE WHEN i > 1 THEN 1 ELSE 0 END), 2)
         AS repeat_aov,
       ROUND(
         (CAST(SUM(CASE WHEN i > 1 THEN price
                        ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE)
          / SUM(CASE WHEN i > 1 THEN 1 ELSE 0 END))
         / (CAST(SUM(CASE WHEN i = 1 THEN price
                          ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE)
            / SUM(CASE WHEN i = 1 THEN 1 ELSE 0 END)),
         6) AS repeat_to_first_ratio
FROM seq
GROUP BY segment
ORDER BY segment
"""


@register("x222_first_vs_repeat_aov", oracle=_X222_SQL)
def x222_first_vs_repeat_aov(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First vs repeat average order value per segment: do
    customers start small and grow (ratio > 1 — invest in
    acquisition, value comes later) or land big and shrink
    (ratio < 1 — the first sale IS the relationship)? The
    unit-economics split x184's blended AOV hides.

    Order sequence via one custkey window; exact decimal sums
    with decimal-zero ELSE arms; ratios as fixed double
    expressions.

    Scale: one custkey window (dim join broadcast), conditional
    sums in a 5-key segment rollup — no second pass.
    """
    from pyspark.sql import Window

    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    seq = orders.join(
        F.broadcast(cust), orders.o_custkey == cust.c_custkey
    ).select(
        F.col("c_mktsegment").alias("segment"),
        F.col("o_totalprice").cast("decimal(18,2)").alias("price"),
        F.row_number()
        .over(
            Window.partitionBy("o_custkey").orderBy(
                "o_orderdate", "o_orderkey"
            )
        )
        .alias("i"),
    )
    zero = F.lit(0).cast("decimal(18,2)")
    first_n = F.sum(F.when(F.col("i") == 1, 1).otherwise(0))
    rep_n = F.sum(F.when(F.col("i") > 1, 1).otherwise(0))
    first_s = F.sum(F.when(F.col("i") == 1, F.col("price")).otherwise(zero))
    rep_s = F.sum(F.when(F.col("i") > 1, F.col("price")).otherwise(zero))
    first_aov = first_s.cast("double") / first_n
    rep_aov = rep_s.cast("double") / rep_n
    return (
        seq.groupBy("segment")
        .agg(
            first_n.cast("bigint").alias("n_first"),
            rep_n.cast("bigint").alias("n_repeat"),
            F.round(first_aov, 2).alias("first_aov"),
            F.round(rep_aov, 2).alias("repeat_aov"),
            F.round(rep_aov / first_aov, 6).alias(
                "repeat_to_first_ratio"
            ),
        )
        .orderBy("segment")
    )


# ---- x223: run-length token redundancy per source ----

_X223_SQL = """
WITH t AS (
  SELECT source, STRING_SPLIT(text, ' ') AS toks FROM documents),
m AS (
  SELECT source,
         LEN(toks) AS n_tokens,
         LEN(LIST_FILTER(RANGE(1, LEN(toks) + 1),
             i -> i = 1 OR toks[i] <> toks[i - 1])) AS n_collapsed
  FROM t)
SELECT source,
       CAST(SUM(n_tokens) AS BIGINT) AS n_tokens,
       CAST(SUM(n_tokens - n_collapsed) AS BIGINT) AS n_run_dups,
       ROUND(CAST(SUM(n_tokens - n_collapsed) AS DOUBLE)
             / SUM(n_tokens), 6) AS run_redundancy
FROM m
GROUP BY source
ORDER BY source
"""


@register("x223_run_redundancy", oracle=_X223_SQL)
def x223_run_redundancy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Run-length token redundancy: the share of tokens that merely
    repeat their immediate predecessor ("very very very") — the
    stutter artifact of scraped chat logs and OCR, invisible to
    x29's bag-of-words repetition scores because runs don't change
    type frequencies much. The collapsed length counts positions
    where a token differs from its neighbor — an index-range
    filter over the existing token array, no explode, no shuffle
    beyond the source rollup.

    Scale: narrow per-row array filter (codegen HOF) + a
    source-sized aggregate.
    """
    docs = load_table(spark, sf_dir, "documents")
    t = docs.select(
        "source", F.split(F.col("text"), " ").alias("toks")
    )
    n_tokens = F.size("toks")
    n_collapsed = F.size(
        F.filter(
            F.sequence(F.lit(1), F.size("toks")),
            lambda i: (i == 1)
            | (
                F.element_at(F.col("toks"), i)
                != F.element_at(F.col("toks"), i - 1)
            ),
        )
    )
    m = t.select(
        "source",
        n_tokens.alias("n_tokens"),
        n_collapsed.alias("n_collapsed"),
    )
    dups = F.sum(F.col("n_tokens") - F.col("n_collapsed"))
    return (
        m.groupBy("source")
        .agg(
            F.sum("n_tokens").cast("bigint").alias("n_tokens"),
            dups.cast("bigint").alias("n_run_dups"),
            F.round(
                dups.cast("double") / F.sum("n_tokens"), 6
            ).alias("run_redundancy"),
        )
        .orderBy("source")
    )


# ---- x224: peak-month stability across years ----

_X224_SQL = """
WITH monthly AS (
  SELECT CAST(YEAR(CAST(o_orderdate AS DATE)) AS BIGINT) AS yr,
         CAST(MONTH(CAST(o_orderdate AS DATE)) AS BIGINT) AS moy,
         SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS rev
  FROM orders GROUP BY yr, moy),
peak AS (
  SELECT yr, moy, rev,
         ROW_NUMBER() OVER (PARTITION BY yr
                            ORDER BY rev DESC, moy) AS rn,
         CAST(COUNT(*) OVER (PARTITION BY yr) AS BIGINT) AS n_months
  FROM monthly)
SELECT yr AS year, moy AS peak_month, n_months,
       CAST(ROUND(CAST(rev AS DOUBLE), 0) AS BIGINT) AS peak_revenue
FROM peak
WHERE rn = 1 AND n_months = 12
ORDER BY year
"""


@register("x224_peak_month_stability", oracle=_X224_SQL)
def x224_peak_month_stability(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Peak revenue month per (complete) year: does the business
    peak in the same calendar month every year (plan around it)
    or does the peak wander (promo-driven, not seasonal)?
    Partial years are excluded — their "peak" is an artifact of
    coverage, not seasonality. The argmax is a rank pick with a
    month tiebreak; revenue rounds to whole dollars through an
    exact decimal.

    Scale: month-grain agg (~84 rows), year-partitioned rank,
    years-sized output.
    """
    from pyspark.sql import Window

    orders = load_table(spark, sf_dir, "orders")
    monthly = (
        orders.groupBy(
            F.year(F.col("o_orderdate").cast("date"))
            .cast("bigint")
            .alias("yr"),
            F.month(F.col("o_orderdate").cast("date"))
            .cast("bigint")
            .alias("moy"),
        )
        .agg(
            F.sum(F.col("o_totalprice").cast("decimal(18,2)")).alias(
                "rev"
            )
        )
    )
    peak = monthly.select(
        "yr",
        "moy",
        "rev",
        F.row_number()
        .over(
            Window.partitionBy("yr").orderBy(F.desc("rev"), "moy")
        )
        .alias("rn"),
        F.count("*")
        .over(Window.partitionBy("yr"))
        .cast("bigint")
        .alias("n_months"),
    )
    return (
        peak.where((F.col("rn") == 1) & (F.col("n_months") == 12))
        .select(
            F.col("yr").alias("year"),
            F.col("moy").alias("peak_month"),
            "n_months",
            F.round(F.col("rev").cast("double"), 0)
            .cast("bigint")
            .alias("peak_revenue"),
        )
        .orderBy("year")
    )


# ---- x225: price-revenue skyline (Pareto front) ----

_X225_SQL = """
WITH rev AS (
  SELECT l_partkey,
         CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                  * (CAST(1 AS DECIMAL(6,4))
                     - CAST(l_discount AS DECIMAL(6,4)))) * 1000000
              AS DECIMAL(19,0)) AS rev_u
  FROM lineitem GROUP BY l_partkey),
j AS (
  SELECT p.p_partkey, p.p_name, p.p_retailprice, r.rev_u
  FROM part p JOIN rev r ON p.p_partkey = r.l_partkey),
sky AS (
  SELECT p_partkey, p_name, p_retailprice, rev_u,
         MAX(rev_u) OVER (ORDER BY p_retailprice, p_partkey
                          ROWS BETWEEN UNBOUNDED PRECEDING
                          AND 1 PRECEDING) AS best_cheaper
  FROM j)
SELECT p_partkey AS partkey, p_name,
       ROUND(p_retailprice, 2) AS retail_price,
       ((CAST(rev_u AS BIGINT) + 5000) // 10000) / 100.0 AS revenue
FROM sky
WHERE best_cheaper IS NULL OR rev_u > best_cheaper
ORDER BY retail_price, partkey
"""


@register("x225_price_revenue_skyline", oracle=_X225_SQL)
def x225_price_revenue_skyline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Price-revenue skyline: the Pareto front of parts that are
    undominated on (cheaper, earns-more) — no other part is both
    at-most-as-expensive AND strictly higher-revenue. The classic
    SKYLINE operator, reduced for 2 dimensions to a sort plus ONE
    running-max window (a part survives iff its revenue strictly
    beats the best among all strictly-cheaper-or-tied-earlier
    parts) — no pairwise dominance join, which is the naive
    skyline's O(n²) trap.

    Exact micro-unit revenue; dominance compares exact decimals.

    Scale: fact agg at partkey grain, one part-dim-sized
    range-partitioned sort. 2D skylines are small in practice —
    output is the front only.
    """
    from pyspark.sql import Window

    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    disc = (
        F.col("l_extendedprice").cast("decimal(18,2)")
        * (F.lit(1).cast("decimal(6,4)") - F.col("l_discount").cast("decimal(6,4)"))
    )
    rev = li.groupBy("l_partkey").agg(
        (F.sum(disc) * 1000000).cast("decimal(19,0)").alias("rev_u")
    )
    j = F.broadcast(part).join(rev, part.p_partkey == rev.l_partkey)
    w = Window.orderBy("p_retailprice", "p_partkey").rowsBetween(
        Window.unboundedPreceding, -1
    )
    sky = j.select(
        "p_partkey",
        "p_name",
        "p_retailprice",
        "rev_u",
        F.max("rev_u").over(w).alias("best_cheaper"),
    )
    return (
        sky.where(
            F.col("best_cheaper").isNull()
            | (F.col("rev_u") > F.col("best_cheaper"))
        )
        .select(
            F.col("p_partkey").alias("partkey"),
            "p_name",
            F.round("p_retailprice", 2).alias("retail_price"),
            (F.expr("(cast(rev_u as bigint) + 5000) div 10000") / F.lit(100.0)).alias(
                "revenue"
            ),
        )
        .orderBy("retail_price", "partkey")
    )


# ---- x226: parts trending against their brand ----

_X226_SQL = """
WITH seq AS (
  SELECT p.p_brand, l.l_partkey,
         CAST(YEAR(CAST(o.o_orderdate AS DATE)) AS BIGINT) AS yr,
         CAST(SUM(CAST(l.l_quantity AS BIGINT)) AS BIGINT) AS q
  FROM lineitem l
  JOIN orders o ON l.l_orderkey = o.o_orderkey
  JOIN part p ON l.l_partkey = p.p_partkey
  GROUP BY p.p_brand, l.l_partkey, yr),
pm AS (
  SELECT p_brand, l_partkey,
         CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(yr) AS BIGINT) AS sx,
         CAST(SUM(q) AS BIGINT) AS sy,
         CAST(SUM(yr * q) AS BIGINT) AS sxy
  FROM seq GROUP BY p_brand, l_partkey
  HAVING COUNT(*) >= 3),
bs AS (
  SELECT p_brand,
         CASE WHEN SUM(n * sxy - sx * sy) > 0 THEN 1
              WHEN SUM(n * sxy - sx * sy) < 0 THEN -1
              ELSE 0 END AS brand_sign
  FROM pm GROUP BY p_brand),
ps AS (
  SELECT pm.p_brand, pm.l_partkey,
         CASE WHEN pm.n * pm.sxy - pm.sx * pm.sy > 0 THEN 1
              WHEN pm.n * pm.sxy - pm.sx * pm.sy < 0 THEN -1
              ELSE 0 END AS part_sign,
         bs.brand_sign
  FROM pm JOIN bs ON pm.p_brand = bs.p_brand)
SELECT p_brand,
       CAST(COUNT(*) AS BIGINT) AS n_parts,
       CAST(MAX(brand_sign) AS BIGINT) AS brand_sign,
       CAST(SUM(CASE WHEN part_sign <> 0 AND brand_sign <> 0
                      AND part_sign <> brand_sign
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_contrarian,
       ROUND(CAST(SUM(CASE WHEN part_sign <> 0 AND brand_sign <> 0
                            AND part_sign <> brand_sign
                           THEN 1 ELSE 0 END) AS DOUBLE) / COUNT(*), 6)
         AS contrarian_share
FROM ps
GROUP BY p_brand
ORDER BY p_brand
"""


@register("x226_contrarian_parts", oracle=_X226_SQL)
def x226_contrarian_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Contrarian parts: within each brand, the share of parts
    whose yearly-quantity trend SIGN opposes the brand's aggregate
    trend — the SKU-level divergence a brand-level dashboard
    hides (a growing brand with 30% shrinking parts has a
    portfolio problem, not a demand problem). All trend signs
    use x202's integer rule sign(n·Σxy − Σx·Σy); the brand sign
    aggregates the same integer quantity over its parts — no
    float anywhere but the final share.

    Scale: (brand, part, year) agg, part-grain moments, brand
    rollup — each step strictly smaller than the last.
    """
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    part = load_table(spark, sf_dir, "part")
    seq = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .groupBy(
            "p_brand",
            "l_partkey",
            F.year(F.col("o_orderdate").cast("date"))
            .cast("bigint")
            .alias("yr"),
        )
        .agg(F.sum(F.col("l_quantity").cast("bigint")).alias("q"))
    )
    pm = (
        seq.groupBy("p_brand", "l_partkey")
        .agg(
            F.count("*").cast("bigint").alias("n"),
            F.sum("yr").cast("bigint").alias("sx"),
            F.sum("q").cast("bigint").alias("sy"),
            F.sum(F.col("yr") * F.col("q")).cast("bigint").alias("sxy"),
        )
        .where(F.col("n") >= 3)
    )
    stat = F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")
    bs = pm.groupBy("p_brand").agg(
        F.when(F.sum(stat) > 0, 1)
        .when(F.sum(stat) < 0, -1)
        .otherwise(0)
        .alias("brand_sign")
    )
    ps = pm.join(F.broadcast(bs), "p_brand").select(
        "p_brand",
        F.when(stat > 0, 1)
        .when(stat < 0, -1)
        .otherwise(0)
        .alias("part_sign"),
        "brand_sign",
    )
    contra = F.sum(
        F.when(
            (F.col("part_sign") != 0)
            & (F.col("brand_sign") != 0)
            & (F.col("part_sign") != F.col("brand_sign")),
            1,
        ).otherwise(0)
    )
    return (
        ps.groupBy("p_brand")
        .agg(
            F.count("*").cast("bigint").alias("n_parts"),
            F.max("brand_sign").cast("bigint").alias("brand_sign"),
            contra.cast("bigint").alias("n_contrarian"),
            F.round(
                contra.cast("double") / F.count("*"), 6
            ).alias("contrarian_share"),
        )
        .orderBy("p_brand")
    )


# ---- x227: gross-to-net revenue waterfall per year ----

_X227_SQL = """
WITH li AS (
  SELECT CAST(YEAR(CAST(o.o_orderdate AS DATE)) AS BIGINT) AS yr,
         CAST(l.l_extendedprice AS DECIMAL(18,2)) AS gross,
         CAST(l.l_extendedprice AS DECIMAL(18,2))
           * CAST(l.l_discount AS DECIMAL(6,4)) AS disc_amt,
         CAST(l.l_extendedprice AS DECIMAL(18,2))
           * (CAST(1 AS DECIMAL(6,4)) - CAST(l.l_discount AS DECIMAL(6,4)))
           * CAST(l.l_tax AS DECIMAL(6,4)) AS tax_amt
  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey)
SELECT yr AS year,
       ROUND(CAST(SUM(gross) AS DOUBLE), 2) AS gross_revenue,
       ROUND(CAST(SUM(disc_amt) AS DOUBLE), 2) AS discount_given,
       ROUND(CAST(SUM(tax_amt) AS DOUBLE), 2) AS tax_collected,
       ROUND(CAST(SUM(gross) - SUM(disc_amt) AS DOUBLE), 2)
         AS net_revenue,
       ROUND(CAST(SUM(disc_amt) AS DOUBLE) / CAST(SUM(gross) AS DOUBLE),
             6) AS discount_rate
FROM li
GROUP BY yr
ORDER BY year
"""


@register("x227_margin_waterfall", oracle=_X227_SQL)
def x227_margin_waterfall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gross-to-net revenue waterfall per year: list-price gross,
    discount given back, tax collected, and net — the finance
    bridge whose components must reconcile EXACTLY (gross −
    discount = net holds to the cent because every term is the
    same exact-decimal arithmetic, not three separately-rounded
    floats; outputs round to cents — DuckDB's wide-decimal→double
    conversion is off-by-an-ulp vs the JVM's at scale 10, so raw
    doubles would flake). Discount rate trend is the
    pricing-discipline monitor.

    Scale: the orderkey join for the year, then a years-sized
    aggregate of decimal partials.
    """
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    ext = F.col("l_extendedprice").cast("decimal(18,2)")
    dsc = F.col("l_discount").cast("decimal(6,4)")
    tax = F.col("l_tax").cast("decimal(6,4)")
    rows = li.join(orders, li.l_orderkey == orders.o_orderkey).select(
        F.year(F.col("o_orderdate").cast("date"))
        .cast("bigint")
        .alias("yr"),
        ext.alias("gross"),
        (ext * dsc).alias("disc_amt"),
        (ext * (F.lit(1).cast("decimal(6,4)") - dsc) * tax).alias(
            "tax_amt"
        ),
    )
    return (
        rows.groupBy(F.col("yr").alias("year"))
        .agg(
            F.round(F.sum("gross").cast("double"), 2).alias(
                "gross_revenue"
            ),
            F.round(F.sum("disc_amt").cast("double"), 2).alias(
                "discount_given"
            ),
            F.round(F.sum("tax_amt").cast("double"), 2).alias(
                "tax_collected"
            ),
            F.round(
                (F.sum("gross") - F.sum("disc_amt")).cast("double"), 2
            ).alias("net_revenue"),
            F.round(
                F.sum("disc_amt").cast("double")
                / F.sum("gross").cast("double"),
                6,
            ).alias("discount_rate"),
        )
        .orderBy("year")
    )


# ---- x228: numeric integrality audit ----

_X228_SQL = """
SELECT 'l_quantity' AS measure,
       CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(SUM(CASE WHEN l_quantity = FLOOR(l_quantity)
                     THEN 0 ELSE 1 END) AS BIGINT) AS n_fractional,
       CAST(SUM(CASE WHEN l_quantity < 0 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_negative
FROM lineitem
UNION ALL
SELECT 'o_totalprice_cents' AS measure,
       CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(SUM(CASE WHEN o_totalprice * 100
                          = FLOOR(o_totalprice * 100)
                     THEN 0 ELSE 1 END) AS BIGINT) AS n_fractional,
       CAST(SUM(CASE WHEN o_totalprice < 0 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_negative
FROM orders
UNION ALL
SELECT 'l_discount_pct' AS measure,
       CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(SUM(CASE WHEN l_discount * 100
                          = FLOOR(l_discount * 100)
                     THEN 0 ELSE 1 END) AS BIGINT) AS n_fractional,
       CAST(SUM(CASE WHEN l_discount < 0 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_negative
FROM lineitem
ORDER BY measure
"""


@register("x228_integrality_audit", oracle=_X228_SQL)
def x228_integrality_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Numeric integrality audit: measures that SHOULD be whole
    units at some scale (quantities in units, prices in cents,
    discounts in whole percent) checked for fractional residue
    and negative values — the upstream-feed sanity screen that
    catches unit drift (a feed switching dollars→cents, a
    quantity column picking up averages) before it silently
    corrupts every exact-decimal pipeline built on the x151+
    conventions.

    The check compares each double against its own floor —
    IEEE-exact in both engines; counts are integers.

    Scale: three narrow scans (Spark runs the union's legs in
    parallel), 3-row output.
    """
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")

    def leg(df, expr_frac, expr_neg, name):
        return df.agg(
            F.lit(name).alias("measure"),
            F.count("*").cast("bigint").alias("n_rows"),
            F.sum(F.when(expr_frac, 0).otherwise(1))
            .cast("bigint")
            .alias("n_fractional"),
            F.sum(F.when(expr_neg, 1).otherwise(0))
            .cast("bigint")
            .alias("n_negative"),
        ).select("measure", "n_rows", "n_fractional", "n_negative")

    q = F.col("l_quantity")
    tp = F.col("o_totalprice")
    dc = F.col("l_discount")
    out = (
        leg(li, q == F.floor(q), q < 0, "l_quantity")
        .unionByName(
            leg(
                orders,
                tp * 100 == F.floor(tp * 100),
                tp < 0,
                "o_totalprice_cents",
            )
        )
        .unionByName(
            leg(
                li,
                dc * 100 == F.floor(dc * 100),
                dc < 0,
                "l_discount_pct",
            )
        )
    )
    return out.orderBy("measure")


# ---- x229: top revenue-rank movers between periods ----

_X229_SQL = f"""
WITH rev AS (
  SELECT p.p_brand,
         CASE WHEN o.o_orderdate < TIMESTAMP '{_X211_CUT}'
              THEN 'early' ELSE 'late' END AS period,
         CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))
                  * (CAST(1 AS DECIMAL(6,4))
                     - CAST(l.l_discount AS DECIMAL(6,4)))) * 1000000
              AS DECIMAL(19,0)) AS rev_u
  FROM lineitem l
  JOIN orders o ON l.l_orderkey = o.o_orderkey
  JOIN part p ON l.l_partkey = p.p_partkey
  GROUP BY p.p_brand, period),
rk AS (
  SELECT p_brand, period,
         ROW_NUMBER() OVER (PARTITION BY period
                            ORDER BY rev_u DESC, p_brand) AS r
  FROM rev),
wide AS (
  SELECT e.p_brand, e.r AS r_early, l.r AS r_late,
         e.r - l.r AS rank_gain
  FROM (SELECT p_brand, r FROM rk WHERE period = 'early') e
  JOIN (SELECT p_brand, r FROM rk WHERE period = 'late') l
    ON e.p_brand = l.p_brand)
SELECT p_brand, r_early, r_late,
       CAST(rank_gain AS BIGINT) AS rank_gain
FROM wide
WHERE rank_gain <> 0
ORDER BY ABS(rank_gain) DESC, p_brand
LIMIT 10
"""


@register("x229_rank_movers", oracle=_X229_SQL)
def x229_rank_movers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top brand-league movers: the 10 brands whose revenue RANK
    moved most between the early and late halves (positive gain =
    climbed) — the narrative slide behind x211's single tau
    number ("the order reshuffled — WHO moved?"). Integer ranks
    and gains; ordering by |gain| with brand tiebreak.

    Scale: one (brand, period) fact aggregate; ranks and the
    mover pick run on the brand-sized league table.
    """
    from pyspark.sql import Window

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
            "p_brand",
            F.when(
                F.col("o_orderdate") < F.lit(_X211_CUT).cast("timestamp"),
                "early",
            )
            .otherwise("late")
            .alias("period"),
        )
        .agg(
            (F.sum(disc) * 1000000)
            .cast("decimal(19,0)")
            .alias("rev_u")
        )
    )
    rk = rev.withColumn(
        "r",
        F.row_number().over(
            Window.partitionBy("period").orderBy(
                F.desc("rev_u"), "p_brand"
            )
        ),
    )
    e = rk.where(F.col("period") == "early").select(
        "p_brand", F.col("r").alias("r_early")
    )
    l = rk.where(F.col("period") == "late").select(
        F.col("p_brand").alias("pb_l"), F.col("r").alias("r_late")
    )
    wide = e.join(l, e.p_brand == l.pb_l).select(
        "p_brand",
        "r_early",
        "r_late",
        (F.col("r_early") - F.col("r_late"))
        .cast("bigint")
        .alias("rank_gain"),
    )
    return (
        wide.where(F.col("rank_gain") != 0)
        .orderBy(F.abs("rank_gain").desc(), "p_brand")
        .limit(10)
    )


# ---- x230: supplier price-competitiveness wins ----

_X230_SQL = """
WITH avgp AS (
  SELECT l_partkey, l_suppkey,
         CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * 100
                  ) AS DECIMAL(19,0)) AS ext_c,
         CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS qty
  FROM lineitem GROUP BY l_partkey, l_suppkey),
best AS (
  SELECT l_partkey, l_suppkey,
         ROW_NUMBER() OVER (PARTITION BY l_partkey
                            ORDER BY CAST(ext_c AS DOUBLE) / qty,
                                     l_suppkey) AS rn,
         CAST(COUNT(*) OVER (PARTITION BY l_partkey) AS BIGINT)
           AS n_suppliers
  FROM avgp),
wins AS (
  SELECT l_suppkey FROM best WHERE rn = 1 AND n_suppliers >= 2),
per_s AS (
  SELECT s.s_nationkey, w.l_suppkey,
         CAST(COUNT(*) AS BIGINT) AS n_wins
  FROM wins w JOIN supplier s ON w.l_suppkey = s.s_suppkey
  GROUP BY s.s_nationkey, w.l_suppkey)
SELECT n.n_name AS nation,
       CAST(COUNT(*) AS BIGINT) AS n_winning_suppliers,
       CAST(SUM(n_wins) AS BIGINT) AS n_part_wins,
       CAST(MAX(n_wins) AS BIGINT) AS max_wins_one_supplier
FROM per_s JOIN nation n ON per_s.s_nationkey = n.n_nationkey
GROUP BY nation
ORDER BY n_part_wins DESC, nation
"""


@register("x230_price_competitiveness", oracle=_X230_SQL)
def x230_price_competitiveness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Supplier price-competitiveness: for every contested part
    (≥2 observed suppliers), who sells it at the lowest average
    unit price — rolled up to wins per nation (the TPC-H Q2
    min-cost-supplier question answered from observed order
    history instead of a quote catalog). Unit price ranks via
    exact cent/quantity ratios with suppkey tiebreak; all counts
    integer.

    Scale: (part, supplier) partial agg, one part-keyed window
    over supplier-bounded groups, dim-sized rollups after.
    """
    from pyspark.sql import Window

    li = load_table(spark, sf_dir, "lineitem")
    sup = load_table(spark, sf_dir, "supplier")
    nat = load_table(spark, sf_dir, "nation")
    avgp = li.groupBy("l_partkey", "l_suppkey").agg(
        (F.sum(F.col("l_extendedprice").cast("decimal(18,2)")) * 100)
        .cast("decimal(19,0)")
        .alias("ext_c"),
        F.sum(F.col("l_quantity").cast("bigint")).alias("qty"),
    )
    best = avgp.select(
        "l_partkey",
        "l_suppkey",
        F.row_number()
        .over(
            Window.partitionBy("l_partkey").orderBy(
                F.col("ext_c").cast("double") / F.col("qty"),
                "l_suppkey",
            )
        )
        .alias("rn"),
        F.count("*")
        .over(Window.partitionBy("l_partkey"))
        .cast("bigint")
        .alias("n_suppliers"),
    )
    wins = best.where(
        (F.col("rn") == 1) & (F.col("n_suppliers") >= 2)
    ).select("l_suppkey")
    per_s = (
        wins.join(F.broadcast(sup), wins.l_suppkey == sup.s_suppkey)
        .groupBy("s_nationkey", "l_suppkey")
        .agg(F.count("*").cast("bigint").alias("n_wins"))
    )
    return (
        per_s.join(F.broadcast(nat), per_s.s_nationkey == nat.n_nationkey)
        .groupBy(F.col("n_name").alias("nation"))
        .agg(
            F.count("*").cast("bigint").alias("n_winning_suppliers"),
            F.sum("n_wins").cast("bigint").alias("n_part_wins"),
            F.max("n_wins").cast("bigint").alias("max_wins_one_supplier"),
        )
        .orderBy(F.desc("n_part_wins"), "nation")
    )


# ---- x231: source unigram drift (total variation distance) ----

_X231_SQL = """
WITH tok AS (
  SELECT source, UNNEST(STRING_SPLIT(LOWER(text), ' ')) AS t
  FROM documents),
sc AS (
  SELECT source, t, CAST(COUNT(*) AS BIGINT) AS n
  FROM tok GROUP BY source, t),
cc AS (
  SELECT t, CAST(SUM(n) AS BIGINT) AS big_n FROM sc GROUP BY t),
st AS (
  SELECT source, CAST(SUM(n) AS BIGINT) AS small_t FROM sc
  GROUP BY source),
ct AS (SELECT CAST(SUM(n) AS BIGINT) AS big_t FROM sc),
terms AS (
  SELECT sc.source,
         ABS(CAST(sc.n AS DECIMAL(38,0)) * ct.big_t
             - CAST(cc.big_n AS DECIMAL(38,0)) * st.small_t)
           AS num_u
  FROM sc
  JOIN cc ON sc.t = cc.t
  JOIN st ON sc.source = st.source
  CROSS JOIN ct),
missing AS (
  -- mass of corpus terms ABSENT from the source: |0*T - N_i*t|
  SELECT st.source,
         CAST(SUM(CAST(cc.big_n AS DECIMAL(38,0)) * st.small_t)
              AS DECIMAL(38,0)) AS num_u
  FROM st CROSS JOIN cc
  WHERE NOT EXISTS (SELECT 1 FROM sc
                    WHERE sc.source = st.source AND sc.t = cc.t)
  GROUP BY st.source)
SELECT s.source,
       ROUND(CAST(tot.num AS DOUBLE)
             / (2 * CAST(s.small_t AS DOUBLE)
                * (SELECT big_t FROM ct)), 6) AS tv_distance
FROM st s
JOIN (
  SELECT source, SUM(num_u) AS num FROM (
    SELECT source, num_u FROM terms
    UNION ALL
    SELECT source, num_u FROM missing) u
  GROUP BY source) tot
  ON s.source = tot.source
ORDER BY s.source
"""


@register("x231_tv_drift", oracle=_X231_SQL)
def x231_tv_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Source unigram drift as TOTAL VARIATION distance from the
    corpus distribution: TV = ½·Σ|p_i − q_i| — the categorical
    drift measure that needs no logarithm (KL does — libm is not
    cross-engine-stable) and no binning (x112's KS needs an
    ordered axis). TV = 0 means the source reads like the corpus;
    1 means disjoint vocabulary. Cross-multiplied to integers:
    Σ|n_i·T − N_i·t| / (2·t·T) in DECIMAL(38,0) sums — including
    the often-forgotten mass of corpus terms the source never
    uses (via anti-join) — with ONE final double division.

    Scale (r11, guide §1.2/§2.4): the missing-mass S×V crossJoin +
    anti-join fall out ANALYTICALLY: Σ_{t∉source} N_t·t_s =
    t_s·(T − Σ_{t∈source} N_t), so the present-terms join also
    carries each term's corpus count and one per-source aggregate
    closes the total — exact integer arithmetic, identical value;
    two whole (source,term) lineages and their term-keyed anti-join
    disappear. (Persisting `sc` was tried and measured WORSE —
    frozen cached partitioning, the x87 lesson — recompute wins.)
    The 38-digit headroom holds to ~1e19 tokens.
    """
    docs = load_table(spark, sf_dir, "documents")
    tok = docs.select(
        "source", F.explode(F.split(F.lower("text"), " ")).alias("t")
    )
    sc = tok.groupBy("source", "t").agg(
        F.count("*").cast("bigint").alias("n")
    )
    cc = sc.groupBy("t").agg(F.sum("n").cast("bigint").alias("big_n"))
    st = sc.groupBy("source").agg(
        F.sum("n").cast("bigint").alias("small_t")
    )
    ct = sc.agg(F.sum("n").cast("bigint").alias("big_t"))
    per_src = (
        sc.join(cc, "t")
        .join(F.broadcast(st), "source")
        .crossJoin(F.broadcast(ct))
        .groupBy("source")
        .agg(
            F.sum(
                F.abs(
                    F.col("n").cast("decimal(38,0)") * F.col("big_t")
                    - F.col("big_n").cast("decimal(38,0)")
                    * F.col("small_t")
                )
            ).alias("present_num"),
            F.sum(F.col("big_n").cast("decimal(38,0)")).alias(
                "present_mass"
            ),
            F.first("small_t").alias("small_t"),
            F.first("big_t").alias("big_t"),
        )
    )
    num = F.col("present_num") + F.col("small_t").cast("decimal(38,0)") * (
        F.col("big_t").cast("decimal(38,0)") - F.col("present_mass")
    )
    out = per_src.select(
        "source",
        F.round(
            num.cast("double")
            / (
                2
                * F.col("small_t").cast("double")
                * F.col("big_t")
            ),
            6,
        ).alias("tv_distance"),
    ).orderBy("source")
    return out


# ---- x232: pre-churn error signal ----

_X232_SQL = """
WITH anchor AS (SELECT MAX(CAST(ts AS DATE)) AS dmax FROM events),
u AS (
  SELECT e.user_id,
         CASE WHEN MAX(CAST(e.ts AS DATE))
                   <= a.dmax - INTERVAL 30 DAY
              THEN 'churned' ELSE 'active' END AS status
  FROM events e CROSS JOIN anchor a
  GROUP BY e.user_id, a.dmax),
lastk AS (
  SELECT e.user_id, e.event_type,
         ROW_NUMBER() OVER (PARTITION BY e.user_id
                            ORDER BY e.ts DESC, e.event_id DESC) AS rn
  FROM events e),
tail AS (
  SELECT l.user_id, l.event_type, u.status
  FROM lastk l JOIN u ON l.user_id = u.user_id
  WHERE l.rn <= 5)
SELECT status,
       CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users,
       CAST(COUNT(*) AS BIGINT) AS n_tail_events,
       CAST(SUM(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END)
            AS BIGINT) AS n_tail_errors,
       ROUND(CAST(SUM(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END)
                  AS DOUBLE) / COUNT(*), 6) AS tail_error_rate
FROM tail
GROUP BY status
ORDER BY status
"""


@register("x232_prechurn_errors", oracle=_X232_SQL)
def x232_prechurn_errors(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pre-churn error signal: the error rate in each user's LAST
    5 events, split churned (silent for the corpus' final 30
    days) vs active — if departing users' tails are error-heavier,
    errors aren't just annoying, they're why people leave (the
    empirical footing under x173's (error, purchase) lift).
    Anchored to the data's own max date.

    Integer counts; one rate division per status.

    Scale: per-user last-k via one user_id window (descending
    rank, rows pruned at k), status from the same grouped pass,
    2-row output.
    """
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events")
    anchor = ev.agg(F.max(F.col("ts").cast("date")).alias("dmax"))
    u = (
        ev.crossJoin(F.broadcast(anchor))
        .groupBy("user_id")
        .agg(
            F.when(
                F.max(F.col("ts").cast("date"))
                <= F.date_sub(F.max("dmax"), 30),
                "churned",
            )
            .otherwise("active")
            .alias("status")
        )
    )
    lastk = ev.select(
        "user_id",
        "event_type",
        F.row_number()
        .over(
            Window.partitionBy("user_id").orderBy(
                F.desc("ts"), F.desc("event_id")
            )
        )
        .alias("rn"),
    )
    tail = lastk.where(F.col("rn") <= 5).join(u, "user_id")
    err = F.sum(
        F.when(F.col("event_type") == "error", 1).otherwise(0)
    )
    return (
        tail.groupBy("status")
        .agg(
            F.countDistinct("user_id").cast("bigint").alias("n_users"),
            F.count("*").cast("bigint").alias("n_tail_events"),
            err.cast("bigint").alias("n_tail_errors"),
            F.round(err.cast("double") / F.count("*"), 6).alias(
                "tail_error_rate"
            ),
        )
        .orderBy("status")
    )


# ---- x233: returned-revenue trend per year ----

_X233_SQL = """
WITH li AS (
  SELECT CAST(YEAR(CAST(o.o_orderdate AS DATE)) AS BIGINT) AS yr,
         l.l_returnflag,
         CAST(l.l_extendedprice AS DECIMAL(18,2))
           * (CAST(1 AS DECIMAL(6,4))
              - CAST(l.l_discount AS DECIMAL(6,4))) AS net
  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey)
SELECT yr AS year,
       ROUND(CAST(SUM(net) AS DOUBLE), 2) AS net_revenue,
       ROUND(CAST(SUM(CASE WHEN l_returnflag = 'R' THEN net
                           ELSE CAST(0 AS DECIMAL(25,6)) END)
                  AS DOUBLE), 2) AS returned_revenue,
       ROUND(CAST(SUM(CASE WHEN l_returnflag = 'R' THEN net
                           ELSE CAST(0 AS DECIMAL(25,6)) END) AS DOUBLE)
             / CAST(SUM(net) AS DOUBLE), 6) AS return_share
FROM li
GROUP BY yr
ORDER BY year
"""


@register("x233_returns_trend", oracle=_X233_SQL)
def x233_returns_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Returned-revenue trend: the yearly share of net revenue that
    came back as returns — the P&L leak x152/x158 localize to
    brands and parts, tracked here as a company-level trend line
    (a rising share is a product-quality or fit problem
    compounding). Exact decimal sums with a decimal-zero ELSE
    arm; money outputs round to cents (the x227 rule).

    Scale: orderkey join for the year, years-sized rollup.
    """
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    net = (
        F.col("l_extendedprice").cast("decimal(18,2)")
        * (F.lit(1).cast("decimal(6,4)") - F.col("l_discount").cast("decimal(6,4)"))
    )
    rows = li.join(orders, li.l_orderkey == orders.o_orderkey).select(
        F.year(F.col("o_orderdate").cast("date"))
        .cast("bigint")
        .alias("yr"),
        "l_returnflag",
        net.alias("net"),
    )
    zero = F.lit(0).cast("decimal(25,6)")
    ret = F.sum(
        F.when(F.col("l_returnflag") == "R", F.col("net")).otherwise(zero)
    )
    return (
        rows.groupBy(F.col("yr").alias("year"))
        .agg(
            F.round(F.sum("net").cast("double"), 2).alias("net_revenue"),
            F.round(ret.cast("double"), 2).alias("returned_revenue"),
            F.round(
                ret.cast("double") / F.sum("net").cast("double"), 6
            ).alias("return_share"),
        )
        .orderBy("year")
    )


# ---- x234: retention-policy projection ----

_X234_SQL = """
WITH anchor AS (SELECT MAX(CAST(ts AS DATE)) AS dmax FROM events),
horizons AS (SELECT UNNEST(ARRAY[30, 90, 365]) AS keep_days),
m AS (
  SELECT h.keep_days,
         CAST(COUNT(*) AS BIGINT) AS n_total,
         CAST(SUM(CASE WHEN CAST(e.ts AS DATE)
                            > a.dmax - CAST(h.keep_days AS INTEGER)
                       THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
         CAST(SUM(CAST(e.value AS DECIMAL(18,6))) AS DOUBLE) AS v_total,
         CAST(SUM(CASE WHEN CAST(e.ts AS DATE)
                            > a.dmax - CAST(h.keep_days AS INTEGER)
                       THEN CAST(e.value AS DECIMAL(18,6))
                       ELSE CAST(0 AS DECIMAL(18,6)) END) AS DOUBLE)
           AS v_kept
  FROM events e CROSS JOIN anchor a CROSS JOIN horizons h
  GROUP BY h.keep_days)
SELECT CAST(keep_days AS BIGINT) AS keep_days,
       n_kept, n_total,
       ROUND(CAST(n_kept AS DOUBLE) / n_total, 6) AS row_share_kept,
       ROUND(v_kept / v_total, 6) AS value_share_kept
FROM m
ORDER BY keep_days
"""


@register("x234_retention_projection", oracle=_X234_SQL)
def x234_retention_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Retention-policy projection: if we kept only the last
    30/90/365 days of events, what share of rows and of event
    VALUE survives — the storage-vs-signal tradeoff table a data
    platform reads before setting TTLs (row share prices the
    storage; value share prices what analytics would lose).
    Anchored to the data's own max date.

    Integer row counts and exact decimal value sums per horizon;
    the value ratio divides two already-exact doubles.

    Scale: the horizons fan out via a 3-row broadcast cross join
    (one scan, not three); per-horizon conditional aggregation is
    map-side combinable.
    """
    ev = load_table(spark, sf_dir, "events")
    anchor = ev.agg(F.max(F.col("ts").cast("date")).alias("dmax"))
    horizons = spark.range(1).select(
        F.explode(
            F.array(F.lit(30), F.lit(90), F.lit(365))
        ).alias("keep_days")
    )
    kept = F.col("ts").cast("date") > F.expr(
        "date_sub(dmax, keep_days)"
    )
    zero = F.lit(0).cast("decimal(18,6)")
    m = (
        ev.crossJoin(F.broadcast(anchor))
        .crossJoin(F.broadcast(horizons))
        .groupBy("keep_days")
        .agg(
            F.count("*").cast("bigint").alias("n_total"),
            F.sum(F.when(kept, 1).otherwise(0))
            .cast("bigint")
            .alias("n_kept"),
            F.sum(F.col("value").cast("decimal(18,6)"))
            .cast("double")
            .alias("v_total"),
            F.sum(
                F.when(
                    kept, F.col("value").cast("decimal(18,6)")
                ).otherwise(zero)
            )
            .cast("double")
            .alias("v_kept"),
        )
    )
    return m.select(
        F.col("keep_days").cast("bigint").alias("keep_days"),
        "n_kept",
        "n_total",
        F.round(
            F.col("n_kept").cast("double") / F.col("n_total"), 6
        ).alias("row_share_kept"),
        F.round(F.col("v_kept") / F.col("v_total"), 6).alias(
            "value_share_kept"
        ),
    ).orderBy("keep_days")


# ---- x235: growth-streak parts (consecutive growth years) ----

_X235_SQL = """
WITH yearly AS (
  SELECT l.l_partkey,
         CAST(YEAR(CAST(o.o_orderdate AS DATE)) AS BIGINT) AS yr,
         CAST(SUM(CAST(l.l_quantity AS BIGINT)) AS BIGINT) AS q
  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
  GROUP BY l.l_partkey, yr),
g AS (
  SELECT l_partkey, yr, q,
         LAG(q) OVER (PARTITION BY l_partkey ORDER BY yr) AS q_prev,
         LAG(yr) OVER (PARTITION BY l_partkey ORDER BY yr) AS yr_prev
  FROM yearly),
growth AS (
  SELECT l_partkey, yr,
         yr - ROW_NUMBER() OVER (PARTITION BY l_partkey ORDER BY yr)
           AS grp
  FROM g
  WHERE q_prev IS NOT NULL AND yr = yr_prev + 1 AND q > q_prev),
streaks AS (
  SELECT l_partkey, grp, CAST(COUNT(*) AS BIGINT) AS streak_len
  FROM growth GROUP BY l_partkey, grp),
best AS (
  SELECT l_partkey, CAST(MAX(streak_len) AS BIGINT) AS max_streak
  FROM streaks GROUP BY l_partkey)
SELECT max_streak AS growth_years,
       CAST(COUNT(*) AS BIGINT) AS n_parts
FROM best
GROUP BY max_streak
ORDER BY growth_years
"""


@register("x235_growth_streaks", oracle=_X235_SQL)
def x235_growth_streaks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Growth-streak distribution: for each part, its longest run
    of CONSECUTIVE year-over-year quantity growth, histogrammed —
    momentum merchandising ("2 products have grown 4 straight
    years — protect their supply") via x214's gaps-and-islands
    trick applied to growth years instead of activity days. A
    growth year qualifies only against an adjacent prior year
    (gap years break the streak, as they should).

    Integer quantities and years throughout.

    Scale: (part, year) agg, two part-keyed windows over
    calendar-bounded groups, histogram output.
    """
    from pyspark.sql import Window

    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    yearly = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy(
            "l_partkey",
            F.year(F.col("o_orderdate").cast("date"))
            .cast("bigint")
            .alias("yr"),
        )
        .agg(F.sum(F.col("l_quantity").cast("bigint")).alias("q"))
    )
    w = Window.partitionBy("l_partkey").orderBy("yr")
    g = yearly.select(
        "l_partkey",
        "yr",
        "q",
        F.lag("q").over(w).alias("q_prev"),
        F.lag("yr").over(w).alias("yr_prev"),
    )
    growth = g.where(
        F.col("q_prev").isNotNull()
        & (F.col("yr") == F.col("yr_prev") + 1)
        & (F.col("q") > F.col("q_prev"))
    ).select(
        "l_partkey",
        (
            F.col("yr")
            - F.row_number().over(
                Window.partitionBy("l_partkey").orderBy("yr")
            )
        ).alias("grp"),
    )
    streaks = growth.groupBy("l_partkey", "grp").agg(
        F.count("*").cast("bigint").alias("streak_len")
    )
    best = streaks.groupBy("l_partkey").agg(
        F.max("streak_len").cast("bigint").alias("max_streak")
    )
    return (
        best.groupBy(F.col("max_streak").alias("growth_years"))
        .agg(F.count("*").cast("bigint").alias("n_parts"))
        .orderBy("growth_years")
    )


# ---- x236: price-ladder gaps per brand ----

_X236_SQL = """
WITH pts AS (
  SELECT DISTINCT p_brand,
         CAST(ROUND(p_retailprice * 100) AS BIGINT) AS price_c
  FROM part),
lad AS (
  SELECT p_brand, price_c,
         LAG(price_c) OVER (PARTITION BY p_brand
                            ORDER BY price_c) AS prev_c
  FROM pts),
gaps AS (
  SELECT p_brand, price_c, prev_c,
         ROW_NUMBER() OVER (PARTITION BY p_brand
                            ORDER BY (price_c - prev_c) DESC,
                                     price_c) AS rn,
         CAST(COUNT(*) OVER (PARTITION BY p_brand) AS BIGINT) + 1
           AS n_points
  FROM lad WHERE prev_c IS NOT NULL)
SELECT p_brand, n_points,
       ROUND(CAST(prev_c AS DOUBLE) / 100, 2) AS gap_low,
       ROUND(CAST(price_c AS DOUBLE) / 100, 2) AS gap_high,
       ROUND(CAST(price_c - prev_c AS DOUBLE) / 100, 2) AS gap_width
FROM gaps
WHERE rn = 1
ORDER BY p_brand
"""


@register("x236_price_ladder_gaps", oracle=_X236_SQL)
def x236_price_ladder_gaps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Price-ladder gap analysis: each brand's widest hole between
    adjacent distinct price points — the assortment-pricing view
    ("brand X jumps $312→$891 with nothing between; a mid-tier
    SKU fills it or a competitor does"). Prices ladder as integer
    cents; the widest gap is a rank pick with a price tiebreak.

    Scale: dim-only — distinct price points per brand, one
    brand-keyed window, brand-sized output. Zero fact-table I/O.
    """
    from pyspark.sql import Window

    part = load_table(spark, sf_dir, "part")
    pts = part.select(
        "p_brand",
        F.round(F.col("p_retailprice") * 100)
        .cast("bigint")
        .alias("price_c"),
    ).distinct()
    lad = pts.select(
        "p_brand",
        "price_c",
        F.lag("price_c")
        .over(Window.partitionBy("p_brand").orderBy("price_c"))
        .alias("prev_c"),
    )
    gaps = lad.where(F.col("prev_c").isNotNull()).select(
        "p_brand",
        "price_c",
        "prev_c",
        F.row_number()
        .over(
            Window.partitionBy("p_brand").orderBy(
                (F.col("price_c") - F.col("prev_c")).desc(), "price_c"
            )
        )
        .alias("rn"),
        (F.count("*").over(Window.partitionBy("p_brand")) + 1)
        .cast("bigint")
        .alias("n_points"),
    )
    return (
        gaps.where(F.col("rn") == 1)
        .select(
            "p_brand",
            "n_points",
            F.round(F.col("prev_c").cast("double") / 100, 2).alias(
                "gap_low"
            ),
            F.round(F.col("price_c").cast("double") / 100, 2).alias(
                "gap_high"
            ),
            F.round(
                (F.col("price_c") - F.col("prev_c")).cast("double")
                / 100,
                2,
            ).alias("gap_width"),
        )
        .orderBy("p_brand")
    )


# ---- x237: abandonment recovery in the next session ----

_X237_SQL = """
WITH e AS (
  SELECT user_id, ts, event_id, event_type,
         CASE WHEN LAG(ts) OVER w IS NULL
                OR CAST(FLOOR(EPOCH(ts)) AS BIGINT)
                   - CAST(FLOOR(EPOCH(LAG(ts) OVER w)) AS BIGINT) > 1800
              THEN 1 ELSE 0 END AS is_start
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
s AS (
  SELECT user_id, event_type,
         SUM(is_start) OVER (PARTITION BY user_id ORDER BY ts, event_id
                             ROWS UNBOUNDED PRECEDING) AS session_no
  FROM e),
sess AS (
  SELECT user_id, session_no,
         MAX(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)
           AS has_click,
         MAX(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
           AS has_purchase
  FROM s GROUP BY user_id, session_no),
flagged AS (
  SELECT user_id, session_no, has_click, has_purchase,
         LEAD(has_purchase) OVER (PARTITION BY user_id
                                  ORDER BY session_no)
           AS next_has_purchase
  FROM sess),
abandoned AS (
  SELECT user_id, next_has_purchase
  FROM flagged WHERE has_click = 1 AND has_purchase = 0)
SELECT CAST(COUNT(*) AS BIGINT) AS n_abandoned_sessions,
       CAST(SUM(CASE WHEN next_has_purchase = 1 THEN 1 ELSE 0 END)
            AS BIGINT) AS n_recovered_next,
       CAST(SUM(CASE WHEN next_has_purchase IS NULL THEN 1 ELSE 0 END)
            AS BIGINT) AS n_no_next_session,
       ROUND(CAST(SUM(CASE WHEN next_has_purchase = 1 THEN 1 ELSE 0 END)
                  AS DOUBLE) / COUNT(*), 6) AS recovery_rate
FROM abandoned
"""


@register("x237_abandonment_recovery", oracle=_X237_SQL)
def x237_abandonment_recovery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Abandonment recovery: of sessions with a click but no
    purchase (x179's abandoned carts), how many users converted
    in their NEXT session — the number that prices a remarketing
    nudge (high natural recovery = the email is claiming credit
    for conversions that were coming anyway). Session summaries
    get a LEAD over session order; counts are integers.

    Scale: x162's sessionization shuffle, a session-grain LEAD on
    the per-session summary (same user partitioning), 1-row out.
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
    sess = s.groupBy("user_id", "session_no").agg(
        F.max(
            F.when(F.col("event_type") == "click", 1).otherwise(0)
        ).alias("has_click"),
        F.max(
            F.when(F.col("event_type") == "purchase", 1).otherwise(0)
        ).alias("has_purchase"),
    )
    flagged = sess.withColumn(
        "next_has_purchase",
        F.lead("has_purchase").over(
            Window.partitionBy("user_id").orderBy("session_no")
        ),
    )
    abandoned = flagged.where(
        (F.col("has_click") == 1) & (F.col("has_purchase") == 0)
    )
    rec = F.sum(
        F.when(F.col("next_has_purchase") == 1, 1).otherwise(0)
    )
    return abandoned.agg(
        F.count("*").cast("bigint").alias("n_abandoned_sessions"),
        rec.cast("bigint").alias("n_recovered_next"),
        F.sum(
            F.when(F.col("next_has_purchase").isNull(), 1).otherwise(0)
        )
        .cast("bigint")
        .alias("n_no_next_session"),
        F.round(rec.cast("double") / F.count("*"), 6).alias(
            "recovery_rate"
        ),
    )


# ---- x238: document head-tail self-similarity ----

_X238_SQL = """
WITH t AS (
  SELECT source, STRING_SPLIT(text, ' ') AS toks FROM documents),
q AS (
  SELECT source, toks,
         GREATEST(LEN(toks) // 4, 1) AS k
  FROM t WHERE LEN(toks) >= 8),
ht AS (
  SELECT source,
         LIST_DISTINCT(toks[1:k]) AS head_set,
         LIST_DISTINCT(toks[LEN(toks) - k + 1:LEN(toks)]) AS tail_set
  FROM q),
j AS (
  SELECT source,
         LEN(LIST_FILTER(head_set, x -> LIST_CONTAINS(tail_set, x)))
           AS n_inter,
         LEN(head_set) + LEN(tail_set)
           - LEN(LIST_FILTER(head_set,
                             x -> LIST_CONTAINS(tail_set, x)))
           AS n_union
  FROM ht)
SELECT source,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       ROUND(CAST(SUM(CAST(CAST(n_inter AS DOUBLE) / n_union
                           AS DECIMAL(28,12))) AS DOUBLE)
             / COUNT(*), 6) AS mean_head_tail_jaccard
FROM j
GROUP BY source
ORDER BY source
"""


@register("x238_head_tail_similarity", oracle=_X238_SQL)
def x238_head_tail_similarity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Head-tail self-similarity: Jaccard between each document's
    first-quarter and last-quarter token SETS, averaged per source
    — high values mean docs open and close with the same material
    (wrapper templates, nav chrome around thin content), the
    per-document complement of x199's corpus-level positional
    bias. Docs under 8 tokens are skipped (quarters degenerate).

    The per-doc ratio is one double division immediately cast to
    DECIMAL(28,12) so the per-source mean is partition-order-free
    (the x188 rule); set sizes are integers from array ops.

    Scale: pure narrow array work per row (slice/distinct/
    filter inside codegen) + a source rollup. No explode.
    """
    docs = load_table(spark, sf_dir, "documents")
    t = docs.select(
        "source", F.split(F.col("text"), " ").alias("toks")
    ).where(F.size("toks") >= 8)
    k = F.greatest(
        F.floor(F.size("toks") / 4).cast("int"), F.lit(1)
    )
    q = t.select(
        "source",
        F.array_distinct(F.slice("toks", F.lit(1), k)).alias("head_set"),
        F.array_distinct(
            F.slice("toks", F.size("toks") - k + 1, k)
        ).alias("tail_set"),
    )
    n_inter = F.size(F.array_intersect("head_set", "tail_set"))
    n_union = F.size("head_set") + F.size("tail_set") - F.size(
        F.array_intersect("head_set", "tail_set")
    )
    j = q.select(
        "source",
        (n_inter.cast("double") / n_union)
        .cast("decimal(28,12)")
        .alias("jac"),
    )
    return (
        j.groupBy("source")
        .agg(
            F.count("*").cast("bigint").alias("n_docs"),
            F.round(
                F.sum("jac").cast("double") / F.count("*"), 6
            ).alias("mean_head_tail_jaccard"),
        )
        .orderBy("source")
    )


# ---- x239: token casing profile per source ----

_X239_SQL = """
WITH tok AS (
  SELECT source, UNNEST(STRING_SPLIT(text, ' ')) AS t FROM documents),
alpha AS (
  SELECT source, t FROM tok WHERE REGEXP_MATCHES(t, '^[A-Za-z]+$')),
f AS (
  SELECT source,
         CASE WHEN REGEXP_MATCHES(t, '^[a-z]+$') THEN 'lower'
              WHEN REGEXP_MATCHES(t, '^[A-Z]+$') AND LENGTH(t) > 1
                THEN 'allcaps'
              WHEN REGEXP_MATCHES(t, '^[A-Z][a-z]*$') THEN 'title'
              ELSE 'mixed' END AS casing
  FROM alpha)
SELECT source,
       CAST(COUNT(*) AS BIGINT) AS n_alpha_tokens,
       ROUND(CAST(SUM(CASE WHEN casing = 'lower' THEN 1 ELSE 0 END)
                  AS DOUBLE) / COUNT(*), 6) AS lower_share,
       ROUND(CAST(SUM(CASE WHEN casing = 'title' THEN 1 ELSE 0 END)
                  AS DOUBLE) / COUNT(*), 6) AS title_share,
       ROUND(CAST(SUM(CASE WHEN casing = 'allcaps' THEN 1 ELSE 0 END)
                  AS DOUBLE) / COUNT(*), 6) AS allcaps_share,
       ROUND(CAST(SUM(CASE WHEN casing = 'mixed' THEN 1 ELSE 0 END)
                  AS DOUBLE) / COUNT(*), 6) AS mixed_share
FROM f
GROUP BY source
ORDER BY source
"""


@register("x239_casing_profile", oracle=_X239_SQL)
def x239_casing_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token casing profile per source: lower / TitleCase /
    ALLCAPS / mixed shares over alphabetic tokens — ALLCAPS-heavy
    sources are shouting spam or legal boilerplate, Title-heavy
    ones are headlines and listicles; a casing shift also breaks
    cased-tokenizer vocab hit rates (x82) before anything else
    notices. Anchored regex classes, identical in Java regex and
    RE2; integer counts, one division per share.

    Scale: explode + per-source aggregate, regex in codegen.
    """
    docs = load_table(spark, sf_dir, "documents")
    t = F.col("t")
    alpha = docs.select(
        "source", F.explode(F.split(F.col("text"), " ")).alias("t")
    ).where(t.rlike("^[A-Za-z]+$"))
    f = alpha.select(
        "source",
        F.when(t.rlike("^[a-z]+$"), "lower")
        .when(t.rlike("^[A-Z]+$") & (F.length(t) > 1), "allcaps")
        .when(t.rlike("^[A-Z][a-z]*$"), "title")
        .otherwise("mixed")
        .alias("casing"),
    )

    def share(name: str):
        return F.round(
            F.sum(
                F.when(F.col("casing") == name, 1).otherwise(0)
            ).cast("double")
            / F.count("*"),
            6,
        ).alias(f"{name}_share")

    return (
        f.groupBy("source")
        .agg(
            F.count("*").cast("bigint").alias("n_alpha_tokens"),
            share("lower"),
            share("title"),
            share("allcaps"),
            share("mixed"),
        )
        .orderBy("source")
    )


# ---- x240: part launch-cohort vitality ----

_X240_SQL = """
WITH first_year AS (
  SELECT l_partkey,
         CAST(MIN(YEAR(CAST(l_shipdate AS DATE))) AS BIGINT)
           AS launch_yr
  FROM lineitem GROUP BY l_partkey),
fy_rev AS (
  SELECT f.launch_yr, l.l_partkey,
         CAST(SUM(CASE WHEN YEAR(CAST(l.l_shipdate AS DATE))
                            = f.launch_yr
                       THEN CAST(l.l_extendedprice AS DECIMAL(18,2))
                            * (CAST(1 AS DECIMAL(6,4))
                               - CAST(l.l_discount AS DECIMAL(6,4)))
                       ELSE CAST(0 AS DECIMAL(25,6)) END) * 1000000
              AS DECIMAL(19,0)) AS fy_rev_u
  FROM lineitem l JOIN first_year f ON l.l_partkey = f.l_partkey
  GROUP BY f.launch_yr, l.l_partkey)
SELECT launch_yr AS launch_year,
       CAST(COUNT(*) AS BIGINT) AS n_parts_launched,
       ((CAST(SUM(fy_rev_u) AS BIGINT) + 5000) // 10000) / 100.0
         AS first_year_revenue,
       ROUND(CAST(SUM(fy_rev_u) AS DOUBLE) / 1000000 / COUNT(*), 2)
         AS avg_first_year_rev_per_part
FROM fy_rev
GROUP BY launch_yr
ORDER BY launch_year
"""


@register("x240_launch_cohort_vitality", oracle=_X240_SQL)
def x240_launch_cohort_vitality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Part launch-cohort vitality: parts grouped by their first-
    shipment year, scored by average FIRST-YEAR revenue — are
    newer product introductions landing stronger or weaker than
    older cohorts did in their own debut years? The NPI-health
    trend (x130 does this for customer cohorts; this is the
    catalog's version). First-year revenue only, so cohorts are
    compared like-for-like regardless of age.

    Exact decimal micro-units with decimal-zero ELSE arms.

    Scale (r11, guide §2.4): the old shape scanned lineitem twice
    (min-year aggregate + the fact side) and joined them back on
    partkey; the launch year is now ``min(yr) OVER (PARTITION BY
    l_partkey)`` — ONE partkey exchange — and the per-(launch, part)
    rollup rides the same partitioning with no further shuffle.
    Launch-year rollup after that is dim-sized. Edge cohorts
    (first/last fixture years) are partially observed — interpret
    trend on interior years.
    """
    from pyspark.sql import Window

    li = load_table(spark, sf_dir, "lineitem")
    net = (
        F.col("l_extendedprice").cast("decimal(18,2)")
        * (F.lit(1).cast("decimal(6,4)") - F.col("l_discount").cast("decimal(6,4)"))
    )
    zero = F.lit(0).cast("decimal(25,6)")
    yr = F.year(F.col("l_shipdate").cast("date"))
    li2 = li.select("l_partkey", yr.alias("yr"), net.alias("net")).withColumn(
        "launch_yr",
        F.min("yr").over(Window.partitionBy("l_partkey")).cast("bigint"),
    )
    fy_rev = (
        li2.groupBy("launch_yr", "l_partkey")
        .agg(
            (
                F.sum(
                    F.when(F.col("yr") == F.col("launch_yr"), F.col("net"))
                    .otherwise(zero)
                )
                * 1000000
            )
            .cast("decimal(19,0)")
            .alias("fy_rev_u")
        )
    )
    return (
        fy_rev.groupBy(F.col("launch_yr").alias("launch_year"))
        .agg(
            F.count("*").cast("bigint").alias("n_parts_launched"),
            (
                F.expr("(cast(sum(fy_rev_u) as bigint) + 5000) div 10000")
                / F.lit(100.0)
            ).alias("first_year_revenue"),
            F.round(
                F.sum("fy_rev_u").cast("double") / 1000000 / F.count("*"),
                2,
            ).alias("avg_first_year_rev_per_part"),
        )
        .orderBy("launch_year")
    )


# ---- x241: promo pull-forward detection ----

_X241_SQL = """
WITH wk AS (
  SELECT DATE_TRUNC('week', CAST(o.o_orderdate AS DATE)) AS week,
         CAST(SUM(CAST(ROUND(l.l_discount * 10000) AS BIGINT)) AS BIGINT)
           AS disc_bps_sum,
         CAST(SUM(CAST(l.l_quantity AS BIGINT)) AS BIGINT) AS qty
  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
  GROUP BY week),
lagged AS (
  SELECT week, disc_bps_sum, qty,
         LEAD(qty) OVER (ORDER BY week) AS qty_next
  FROM wk),
pairs AS (
  SELECT CAST(disc_bps_sum AS DECIMAL(19,0)) AS x_u,
         CAST(qty_next AS DECIMAL(19,0)) AS y
  FROM lagged WHERE qty_next IS NOT NULL),
s AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n,
         SUM(x_u) AS sx, SUM(y) AS sy,
         SUM(x_u * y) AS sxy, SUM(x_u * x_u) AS sxx,
         SUM(y * y) AS syy
  FROM pairs)
SELECT n AS n_weeks,
       ROUND(
         (CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE)
                                / CAST(n AS DOUBLE))
         / (SQRT(CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE)
                 * CAST(sx AS DOUBLE) / CAST(n AS DOUBLE))
            * SQRT(CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE)
                   * CAST(sy AS DOUBLE) / CAST(n AS DOUBLE))),
         6) AS discount_nextqty_corr
FROM s
"""


@register("x241_pull_forward", oracle=_X241_SQL)
def x241_pull_forward(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Promo pull-forward screen: correlation between a week's
    total discount mass (basis-point sum — depth x breadth in one
    integer) and the NEXT week's quantity — significantly negative
    means discounts borrow demand from the following week rather
    than creating it, the classic promo-ROI illusion. Lag-paired
    via LEAD (x168's shape), exact integer moments (x167's
    machinery) widened to DECIMAL(38,0) products.

    Scale: week-grain agg, calendar-bounded LEAD, 1-row moments.
    """
    from pyspark.sql import Window

    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    wk = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy(
            F.date_trunc(
                "week", F.col("o_orderdate").cast("date")
            ).alias("week")
        )
        .agg(
            F.sum(
                F.round(F.col("l_discount") * 10000).cast("bigint")
            )
            .cast("bigint")
            .alias("disc_bps_sum"),
            F.sum(F.col("l_quantity").cast("bigint"))
            .cast("bigint")
            .alias("qty"),
        )
    )
    lagged = wk.select(
        "disc_bps_sum",
        F.lead("qty").over(Window.orderBy("week")).alias("qty_next"),
    ).where(F.col("qty_next").isNotNull())
    pairs = lagged.select(
        F.col("disc_bps_sum").cast("decimal(19,0)").alias("x_u"),
        F.col("qty_next").cast("decimal(19,0)").alias("y"),
    )
    s = pairs.agg(
        F.count("*").cast("bigint").alias("n"),
        F.sum("x_u").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x_u") * F.col("y")).alias("sxy"),
        F.sum(F.col("x_u") * F.col("x_u")).alias("sxx"),
        F.sum(F.col("y") * F.col("y")).alias("syy"),
    )
    d = lambda c: F.col(c).cast("double")  # noqa: E731
    r = (d("sxy") - d("sx") * d("sy") / d("n")) / (
        F.sqrt(d("sxx") - d("sx") * d("sx") / d("n"))
        * F.sqrt(d("syy") - d("sy") * d("sy") / d("n"))
    )
    return s.select(
        F.col("n").alias("n_weeks"),
        F.round(r, 6).alias("discount_nextqty_corr"),
    )


# ---- x242: vocabulary turnover (births and deaths) ----

_X242_SQL = """
WITH mid AS (
  SELECT CAST(FLOOR(MAX(doc_id) / 2) AS BIGINT) AS m FROM documents),
tok AS (
  SELECT CASE WHEN d.doc_id <= mid.m THEN 'early' ELSE 'late' END
           AS half,
         UNNEST(STRING_SPLIT(LOWER(d.text), ' ')) AS t
  FROM documents d CROSS JOIN mid),
pres AS (
  SELECT t,
         MAX(CASE WHEN half = 'early' THEN 1 ELSE 0 END) AS in_early,
         MAX(CASE WHEN half = 'late' THEN 1 ELSE 0 END) AS in_late
  FROM tok GROUP BY t)
SELECT CAST(SUM(in_early) AS BIGINT) AS early_vocab,
       CAST(SUM(in_late) AS BIGINT) AS late_vocab,
       CAST(SUM(CASE WHEN in_early = 0 AND in_late = 1
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_born,
       CAST(SUM(CASE WHEN in_early = 1 AND in_late = 0
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_died,
       ROUND(CAST(SUM(CASE WHEN in_early = 0 AND in_late = 1
                           THEN 1 ELSE 0 END) AS DOUBLE)
             / SUM(in_late), 6) AS birth_rate,
       ROUND(CAST(SUM(CASE WHEN in_early = 1 AND in_late = 0
                           THEN 1 ELSE 0 END) AS DOUBLE)
             / SUM(in_early), 6) AS death_rate
FROM pres
"""


@register("x242_vocab_turnover", oracle=_X242_SQL)
def x242_vocab_turnover(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vocabulary turnover between corpus halves: type births
    (late-only) and deaths (early-only) with their rates — the
    churn summary x175's per-term leaderboard rolls up to. High
    birth+death with stable totals is topical drift; births
    without deaths is domain expansion. A tokenizer trained on
    the early half starts life with birth_rate of its test vocab
    unseen.

    Presence flags are MAXes per (type, half); all counts
    integer, two rate divisions.

    Scale: one token explode + type-keyed presence agg (Zipf head
    collapses map-side), 1-row output.
    """
    docs = load_table(spark, sf_dir, "documents")
    mid = docs.agg(
        F.floor(F.max("doc_id") / 2).cast("bigint").alias("m")
    )
    tok = docs.crossJoin(F.broadcast(mid)).select(
        F.when(F.col("doc_id") <= F.col("m"), "early")
        .otherwise("late")
        .alias("half"),
        F.explode(F.split(F.lower("text"), " ")).alias("t"),
    )
    pres = tok.groupBy("t").agg(
        F.max(
            F.when(F.col("half") == "early", 1).otherwise(0)
        ).alias("in_early"),
        F.max(
            F.when(F.col("half") == "late", 1).otherwise(0)
        ).alias("in_late"),
    )
    born = F.sum(
        F.when((F.col("in_early") == 0) & (F.col("in_late") == 1), 1)
        .otherwise(0)
    )
    died = F.sum(
        F.when((F.col("in_early") == 1) & (F.col("in_late") == 0), 1)
        .otherwise(0)
    )
    return pres.agg(
        F.sum("in_early").cast("bigint").alias("early_vocab"),
        F.sum("in_late").cast("bigint").alias("late_vocab"),
        born.cast("bigint").alias("n_born"),
        died.cast("bigint").alias("n_died"),
        F.round(born.cast("double") / F.sum("in_late"), 6).alias(
            "birth_rate"
        ),
        F.round(died.cast("double") / F.sum("in_early"), 6).alias(
            "death_rate"
        ),
    )


# ---- x243: ID-continuity ingestion audit ----

_X243_SQL = """
SELECT 'documents.doc_id' AS id_column,
       CAST(MIN(doc_id) AS BIGINT) AS min_id,
       CAST(MAX(doc_id) AS BIGINT) AS max_id,
       CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_distinct,
       CAST(MAX(doc_id) - MIN(doc_id) + 1 - COUNT(DISTINCT doc_id)
            AS BIGINT) AS n_gaps
FROM documents
UNION ALL
SELECT 'embeddings.vec_id',
       CAST(MIN(vec_id) AS BIGINT), CAST(MAX(vec_id) AS BIGINT),
       CAST(COUNT(*) AS BIGINT), CAST(COUNT(DISTINCT vec_id) AS BIGINT),
       CAST(MAX(vec_id) - MIN(vec_id) + 1 - COUNT(DISTINCT vec_id)
            AS BIGINT)
FROM embeddings
UNION ALL
SELECT 'orders.o_orderkey',
       CAST(MIN(o_orderkey) AS BIGINT), CAST(MAX(o_orderkey) AS BIGINT),
       CAST(COUNT(*) AS BIGINT),
       CAST(COUNT(DISTINCT o_orderkey) AS BIGINT),
       CAST(MAX(o_orderkey) - MIN(o_orderkey) + 1
            - COUNT(DISTINCT o_orderkey) AS BIGINT)
FROM orders
ORDER BY id_column
"""


@register("x243_id_continuity", oracle=_X243_SQL)
def x243_id_continuity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ID-continuity audit: min/max/distinct/gap counts for the
    sequential-looking key columns — dense keys (documents,
    embeddings) should show zero gaps, and a nonzero gap count
    there means dropped ingestion batches; orders is sparse BY
    DESIGN (TPC-H's keyspace), and the audit documents exactly
    how sparse, so downstream code never assumes contiguity.
    Duplicate detection rides along (n_rows vs n_distinct).

    All integer min/max/count arithmetic.

    Scale: three independent single-pass aggregates (legs run in
    parallel), 3-row output.
    """
    out = None
    for table, col in (
        ("documents", "doc_id"),
        ("embeddings", "vec_id"),
        ("orders", "o_orderkey"),
    ):
        df = load_table(spark, sf_dir, table)
        leg = df.agg(
            F.lit(f"{table}.{col}").alias("id_column"),
            F.min(col).cast("bigint").alias("min_id"),
            F.max(col).cast("bigint").alias("max_id"),
            F.count("*").cast("bigint").alias("n_rows"),
            F.countDistinct(col).cast("bigint").alias("n_distinct"),
            (
                F.max(col) - F.min(col) + 1 - F.countDistinct(col)
            )
            .cast("bigint")
            .alias("n_gaps"),
        )
        out = leg if out is None else out.unionByName(leg)
    return out.orderBy("id_column")


# ---- x244: AOV change decomposition (within vs mix shift) ----

_X244_CUT = "1998-01-01"  # shared literal boundary

_X244_SQL = f"""
WITH o AS (
  SELECT c.c_mktsegment AS segment,
         CASE WHEN o.o_orderdate < TIMESTAMP '{_X244_CUT}'
              THEN 'early' ELSE 'late' END AS period,
         CAST(o.o_totalprice AS DECIMAL(18,2)) AS price
  FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey),
seg AS (
  SELECT segment, period,
         CAST(COUNT(*) AS BIGINT) AS n, SUM(price) AS s
  FROM o GROUP BY segment, period),
tot AS (
  SELECT period, CAST(SUM(n) AS BIGINT) AS nt FROM seg
  GROUP BY period),
wide AS (
  SELECT seg.segment,
         MAX(CASE WHEN seg.period = 'early' THEN CAST(seg.n AS DOUBLE)
                  / t.nt END) AS share_e,
         MAX(CASE WHEN seg.period = 'late' THEN CAST(seg.n AS DOUBLE)
                  / t.nt END) AS share_l,
         MAX(CASE WHEN seg.period = 'early' THEN CAST(seg.s AS DOUBLE)
                  / seg.n END) AS aov_e,
         MAX(CASE WHEN seg.period = 'late' THEN CAST(seg.s AS DOUBLE)
                  / seg.n END) AS aov_l
  FROM seg JOIN tot t ON seg.period = t.period
  GROUP BY seg.segment)
SELECT segment,
       ROUND(share_e, 6) AS share_early,
       ROUND(share_l, 6) AS share_late,
       ROUND(aov_e, 2) AS aov_early,
       ROUND(aov_l, 2) AS aov_late,
       ROUND(share_e * (aov_l - aov_e), 4) AS within_effect,
       ROUND((share_l - share_e) * aov_l, 4) AS mix_effect
FROM wide
ORDER BY segment
"""


@register("x244_aov_decomposition", oracle=_X244_SQL)
def x244_aov_decomposition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """AOV change decomposition per segment (Oaxaca/mix-shift):
    the overall average-order-value move between halves splits
    exactly into within-segment AOV change (at old mix) plus mix
    shift (at new AOVs) — summing the two effect columns over
    segments reconstructs the total AOV delta, so "our AOV
    dropped" gets an attribution: cheaper baskets, or more of the
    cheap segment? (x178 bridges brand revenue; this bridges a
    RATIO, which needs the share-weighting trick.)

    Shares and AOVs are single divisions of exact sums; effects
    are per-row double products, reported per segment (the
    reader's sum, not the engine's, so no cross-row float
    accumulation is needed).

    Scale: (segment, period) agg, per-period totals broadcast,
    5-row pivot.
    """
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    o = orders.join(
        F.broadcast(cust), orders.o_custkey == cust.c_custkey
    ).select(
        F.col("c_mktsegment").alias("segment"),
        F.when(
            F.col("o_orderdate") < F.lit(_X244_CUT).cast("timestamp"),
            "early",
        )
        .otherwise("late")
        .alias("period"),
        F.col("o_totalprice").cast("decimal(18,2)").alias("price"),
    )
    seg = o.groupBy("segment", "period").agg(
        F.count("*").cast("bigint").alias("n"),
        F.sum("price").alias("s"),
    )
    tot = seg.groupBy("period").agg(
        F.sum("n").cast("bigint").alias("nt")
    )
    j = seg.join(F.broadcast(tot), "period")

    def pick(period: str, expr, name: str):
        return F.max(
            F.when(F.col("period") == period, expr)
        ).alias(name)

    share = F.col("n").cast("double") / F.col("nt")
    aov = F.col("s").cast("double") / F.col("n")
    wide = j.groupBy("segment").agg(
        pick("early", share, "share_e"),
        pick("late", share, "share_l"),
        pick("early", aov, "aov_e"),
        pick("late", aov, "aov_l"),
    )
    return wide.select(
        "segment",
        F.round("share_e", 6).alias("share_early"),
        F.round("share_l", 6).alias("share_late"),
        F.round("aov_e", 2).alias("aov_early"),
        F.round("aov_l", 2).alias("aov_late"),
        F.round(
            F.col("share_e") * (F.col("aov_l") - F.col("aov_e")), 4
        ).alias("within_effect"),
        F.round(
            (F.col("share_l") - F.col("share_e")) * F.col("aov_l"), 4
        ).alias("mix_effect"),
    ).orderBy("segment")


# ---- x245: duplicate rate by document-length decile ----

_X245_SQL = """
WITH fp AS (
  SELECT doc_id, n_chars,
         MD5(LOWER(REGEXP_REPLACE(text, '\\s+', ' ', 'g'))) AS f
  FROM documents),
flagged AS (
  SELECT n_chars,
         CASE WHEN COUNT(*) OVER (PARTITION BY f) > 1
              THEN 1 ELSE 0 END AS is_dup,
         NTILE(10) OVER (ORDER BY n_chars, doc_id) AS len_decile
  FROM fp)
SELECT CAST(len_decile AS BIGINT) AS len_decile,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(MIN(n_chars) AS BIGINT) AS min_chars,
       CAST(MAX(n_chars) AS BIGINT) AS max_chars,
       CAST(SUM(is_dup) AS BIGINT) AS n_in_dup_groups,
       ROUND(CAST(SUM(is_dup) AS DOUBLE) / COUNT(*), 6) AS dup_rate
FROM flagged
GROUP BY len_decile
ORDER BY len_decile
"""


@register("x245_dup_rate_by_length", oracle=_X245_SQL)
def x245_dup_rate_by_length(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Duplicate rate by document-length decile: are the corpus'
    duplicates concentrated among short docs (stub pages, error
    boilerplate — cheap to drop) or long ones (mirrored articles
    — the expensive dedup case)? Decides whether a length floor
    alone would fix most of the duplication x176 prices. NTILE
    deciles with doc_id tiebreak; dup membership from the
    canonical-md5 group-size window.

    Scale: fingerprint window on the uniform md5 key + one
    global NTILE sort over (n_chars, doc_id) — at 100 TB the
    decile assignment becomes a range-partitioned sort; the
    rollup is 10 rows.
    """
    from pyspark.sql import Window

    docs = load_table(spark, sf_dir, "documents")
    norm = F.lower(F.regexp_replace("text", r"\s+", " "))
    fp = docs.select(
        "doc_id", "n_chars", F.md5(norm.cast("binary")).alias("f")
    )
    flagged = fp.select(
        "n_chars",
        F.when(
            F.count("*").over(Window.partitionBy("f")) > 1, 1
        )
        .otherwise(0)
        .alias("is_dup"),
        F.ntile(10)
        .over(Window.orderBy("n_chars", "doc_id"))
        .alias("len_decile"),
    )
    return (
        flagged.groupBy(
            F.col("len_decile").cast("bigint").alias("len_decile")
        )
        .agg(
            F.count("*").cast("bigint").alias("n_docs"),
            F.min("n_chars").cast("bigint").alias("min_chars"),
            F.max("n_chars").cast("bigint").alias("max_chars"),
            F.sum("is_dup").cast("bigint").alias("n_in_dup_groups"),
            F.round(
                F.sum("is_dup").cast("double") / F.count("*"), 6
            ).alias("dup_rate"),
        )
        .orderBy("len_decile")
    )


# ---- x246: Benford audit of payload numbers ----

_X246_SQL = f"""
WITH num AS (
  SELECT CAST(CAST(JSON_EXTRACT(props, '$.k') AS BIGINT) AS VARCHAR)
           AS numtok
  FROM events
  WHERE CAST(JSON_EXTRACT(props, '$.k') AS BIGINT) >= 1),
d AS (
  SELECT CAST(SUBSTR(numtok, 1, 1) AS BIGINT) AS digit FROM num),
c AS (
  SELECT digit, CAST(COUNT(*) AS BIGINT) AS n_obs FROM d GROUP BY digit),
t AS (SELECT CAST(SUM(n_obs) AS BIGINT) AS n FROM c)
SELECT c.digit, c.n_obs,
       ROUND(CAST(c.n_obs AS DOUBLE) / t.n, 6) AS obs_share,
       (ARRAY[{", ".join(f"{p!r}e0" for p in _BENFORD_P)}])[c.digit]
         AS benford_p,
       ROUND(CAST(c.n_obs AS DOUBLE) / t.n
             - (ARRAY[{", ".join(f"{p!r}e0" for p in _BENFORD_P)}])[c.digit],
             6) AS deviation
FROM c CROSS JOIN t
ORDER BY c.digit
"""


@register("x246_payload_benford", oracle=_X246_SQL)
def x246_payload_benford(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benford audit of instrumented payload numbers: first
    significant digits of the events' JSON `k` values against the
    Benford curve — organically arising magnitudes track it;
    uniform RNG ranges (this fixture's k, and many a synthetic or
    fabricated feed) sit far off, with the per-digit deviation
    column showing exactly how. The provenance screen x151 runs
    on money, pointed at semi-structured telemetry (the document
    corpus itself contains no digit literals — measured — so the
    payload stream is the honest target here).

    Digit extraction is bigint→string prefix (no float parsing);
    shares divide integer counts; the same literal Benford
    constants as x151.

    Scale: narrow JSON parse + 9-key agg; no shuffle wider than
    the digit histogram.
    """
    probs = F.array(*[F.lit(p) for p in _BENFORD_P])
    ev = load_table(spark, sf_dir, "events")
    num = ev.select(
        F.get_json_object("props", "$.k")
        .cast("bigint")
        .alias("k")
    ).where(F.col("k") >= 1)
    d = num.select(
        F.substring(F.col("k").cast("string"), 1, 1)
        .cast("bigint")
        .alias("digit")
    )
    c = d.groupBy("digit").agg(
        F.count("*").cast("bigint").alias("n_obs")
    )
    t = c.agg(F.sum("n_obs").cast("bigint").alias("n"))
    p = F.element_at(probs, F.col("digit").cast("int"))
    share = F.col("n_obs").cast("double") / F.col("n")
    return (
        c.crossJoin(F.broadcast(t))
        .select(
            "digit",
            "n_obs",
            F.round(share, 6).alias("obs_share"),
            p.alias("benford_p"),
            F.round(share - p, 6).alias("deviation"),
        )
        .orderBy("digit")
    )


# ---- x247: duplicate-burst locality ----

_X247_SQL = """
WITH fp AS (
  SELECT doc_id,
         MD5(LOWER(REGEXP_REPLACE(text, '\\s+', ' ', 'g'))) AS f
  FROM documents),
grp AS (
  SELECT f,
         CAST(COUNT(*) AS BIGINT) AS sz,
         CAST(MAX(doc_id) - MIN(doc_id) AS BIGINT) AS id_span
  FROM fp GROUP BY f
  HAVING COUNT(*) >= 2)
SELECT CAST(COUNT(*) AS BIGINT) AS n_dup_groups,
       CAST(SUM(CASE WHEN id_span < 10 * sz THEN 1 ELSE 0 END)
            AS BIGINT) AS n_bursty,
       CAST(SUM(CASE WHEN id_span >= 10 * sz THEN 1 ELSE 0 END)
            AS BIGINT) AS n_spread,
       ROUND(CAST(SUM(CASE WHEN id_span < 10 * sz THEN 1 ELSE 0 END)
                  AS DOUBLE) / COUNT(*), 6) AS bursty_share
FROM grp
"""


@register("x247_dup_burst_locality", oracle=_X247_SQL)
def x247_dup_burst_locality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Duplicate-burst locality forensics: for each exact-dup
    group, is its doc_id span tight (copies ingested together — a
    crawler revisit or a replayed batch; fix the PIPELINE) or
    spread across the corpus (genuinely mirrored content; fix the
    DATA)? The burst test id_span < 10·size is pure integer
    cross-multiplication. Empty-corpus-safe: zero groups yields a
    single all-zero row, not an empty result.

    Scale: one md5-keyed aggregate (uniform key), 1-row output.
    """
    docs = load_table(spark, sf_dir, "documents")
    norm = F.lower(F.regexp_replace("text", r"\s+", " "))
    fp = docs.select(
        "doc_id", F.md5(norm.cast("binary")).alias("f")
    )
    grp = (
        fp.groupBy("f")
        .agg(
            F.count("*").cast("bigint").alias("sz"),
            (F.max("doc_id") - F.min("doc_id"))
            .cast("bigint")
            .alias("id_span"),
        )
        .where(F.col("sz") >= 2)
    )
    bursty = F.sum(
        F.when(F.col("id_span") < 10 * F.col("sz"), 1).otherwise(0)
    )
    spread = F.sum(
        F.when(F.col("id_span") >= 10 * F.col("sz"), 1).otherwise(0)
    )
    return grp.agg(
        F.count("*").cast("bigint").alias("n_dup_groups"),
        bursty.cast("bigint").alias("n_bursty"),
        spread.cast("bigint").alias("n_spread"),
        F.round(bursty.cast("double") / F.count("*"), 6).alias(
            "bursty_share"
        ),
    )


# ---- x248: quarterly ARPU trend ----

_X248_SQL = """
WITH q AS (
  SELECT CAST(YEAR(CAST(o_orderdate AS DATE)) AS BIGINT) AS yr,
         CAST(QUARTER(CAST(o_orderdate AS DATE)) AS BIGINT) AS qtr,
         o_custkey,
         CAST(o_totalprice AS DECIMAL(18,2)) AS price
  FROM orders)
SELECT yr AS year, qtr AS quarter,
       CAST(COUNT(DISTINCT o_custkey) AS BIGINT) AS active_customers,
       CAST(COUNT(*) AS BIGINT) AS n_orders,
       ROUND(CAST(SUM(price) AS DOUBLE), 2) AS revenue,
       ROUND(CAST(SUM(price) AS DOUBLE) / COUNT(DISTINCT o_custkey), 2)
         AS arpu,
       ROUND(CAST(COUNT(*) AS DOUBLE) / COUNT(DISTINCT o_custkey), 4)
         AS orders_per_customer
FROM q
GROUP BY yr, qtr
ORDER BY year, quarter
"""


@register("x248_arpu_trend", oracle=_X248_SQL)
def x248_arpu_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quarterly ARPU trend: revenue per active (ordering)
    customer with its two drivers (order frequency and, jointly
    with x222, order size) — the SaaS-board staple that
    distinguishes "more customers" growth from "deeper customers"
    growth quarter over quarter.

    Exact decimal revenue; distinct-customer counts integer; two
    divisions per quarter.

    Scale: single pass, (year, quarter)-keyed agg with partial
    distinct on custkey; calendar-bounded output.
    """
    orders = load_table(spark, sf_dir, "orders")
    q = orders.select(
        F.year(F.col("o_orderdate").cast("date"))
        .cast("bigint")
        .alias("yr"),
        F.quarter(F.col("o_orderdate").cast("date"))
        .cast("bigint")
        .alias("qtr"),
        "o_custkey",
        F.col("o_totalprice").cast("decimal(18,2)").alias("price"),
    )
    return (
        q.groupBy(
            F.col("yr").alias("year"), F.col("qtr").alias("quarter")
        )
        .agg(
            F.countDistinct("o_custkey")
            .cast("bigint")
            .alias("active_customers"),
            F.count("*").cast("bigint").alias("n_orders"),
            F.round(F.sum("price").cast("double"), 2).alias("revenue"),
            F.round(
                F.sum("price").cast("double")
                / F.countDistinct("o_custkey"),
                2,
            ).alias("arpu"),
            F.round(
                F.count("*").cast("double")
                / F.countDistinct("o_custkey"),
                4,
            ).alias("orders_per_customer"),
        )
        .orderBy("year", "quarter")
    )


# ---- x249: cross-source duplicate flow ----

_X249_SQL = """
WITH fp AS (
  SELECT doc_id, source,
         MD5(LOWER(REGEXP_REPLACE(text, '\\s+', ' ', 'g'))) AS f
  FROM documents),
keeper AS (
  SELECT f, source AS src_origin, doc_id,
         ROW_NUMBER() OVER (PARTITION BY f ORDER BY doc_id) AS rn
  FROM fp),
flow AS (
  SELECT k.src_origin, d.source AS src_copy
  FROM (SELECT f, src_origin FROM keeper WHERE rn = 1) k
  JOIN fp d ON k.f = d.f
  JOIN keeper kk ON kk.f = d.f AND kk.doc_id = d.doc_id
  WHERE kk.rn > 1)
SELECT src_origin, src_copy,
       CAST(COUNT(*) AS BIGINT) AS n_copies,
       CAST(SUM(CASE WHEN src_origin = src_copy THEN 1 ELSE 0 END)
            AS BIGINT) AS n_within_source
FROM flow
GROUP BY src_origin, src_copy
ORDER BY src_origin, src_copy
"""


@register("x249_dup_flow_matrix", oracle=_X249_SQL)
def x249_dup_flow_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-source duplicate flow: for every duplicate copy, the
    (origin source → copying source) edge, where origin = the
    lowest-doc_id member of the canonical-fingerprint group
    (x01's keeper rule doubling as a provenance heuristic under
    ingestion order). A heavy off-diagonal row means source B
    substantially re-hosts source A — dedup should keep A and
    downweight B wholesale, not arbitrate per document.

    Scale: one fingerprint window family (rank + join back on
    the uniform md5 key); flow matrix bounded by source².
    """
    from pyspark.sql import Window

    docs = load_table(spark, sf_dir, "documents")
    norm = F.lower(F.regexp_replace("text", r"\s+", " "))
    fp = docs.select(
        "doc_id", "source", F.md5(norm.cast("binary")).alias("f")
    )
    ranked = fp.withColumn(
        "rn",
        F.row_number().over(Window.partitionBy("f").orderBy("doc_id")),
    )
    keeper = ranked.where(F.col("rn") == 1).select(
        "f", F.col("source").alias("src_origin")
    )
    copies = ranked.where(F.col("rn") > 1).select(
        "f", F.col("source").alias("src_copy")
    )
    return (
        copies.join(keeper, "f")
        .groupBy("src_origin", "src_copy")
        .agg(
            F.count("*").cast("bigint").alias("n_copies"),
            F.sum(
                F.when(
                    F.col("src_origin") == F.col("src_copy"), 1
                ).otherwise(0)
            )
            .cast("bigint")
            .alias("n_within_source"),
        )
        .orderBy("src_origin", "src_copy")
    )


# ---- x250: full-funnel session economics ----

_X250_SQL = """
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
         MAX(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS hv,
         MAX(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS hc,
         MAX(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS hp,
         SUM(CASE WHEN event_type = 'purchase'
                  THEN CAST(value AS DECIMAL(18,6))
                  ELSE CAST(0 AS DECIMAL(18,6)) END) AS purchase_value
  FROM s GROUP BY user_id, session_no),
t AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_sessions,
         CAST(SUM(hv) AS BIGINT) AS n_view,
         CAST(SUM(CASE WHEN hv = 1 AND hc = 1 THEN 1 ELSE 0 END)
              AS BIGINT) AS n_view_click,
         CAST(SUM(CASE WHEN hv = 1 AND hc = 1 AND hp = 1
                       THEN 1 ELSE 0 END) AS BIGINT)
           AS n_view_click_buy,
         CAST(SUM(purchase_value) AS DOUBLE) AS total_value
  FROM sess)
SELECT n_sessions, n_view, n_view_click, n_view_click_buy,
       ROUND(CAST(n_view_click AS DOUBLE) / n_view, 6)
         AS click_through,
       ROUND(CAST(n_view_click_buy AS DOUBLE) / n_view_click, 6)
         AS close_rate,
       ROUND(total_value / n_sessions, 4) AS value_per_session
FROM t
"""


@register("x250_funnel_economics", oracle=_X250_SQL)
def x250_funnel_economics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full-funnel session economics: sessions → view sessions →
    view+click → view+click+buy, with stage conversion rates and
    revenue per session — the x162/x179/x237 sessionization
    family rolled into the one table a growth review opens with
    (x35's event-level funnel counts users; this one counts
    SESSIONS and attaches dollars).

    Stage flags are conditional MAXes; purchase value accumulates
    as exact decimal with a decimal-zero ELSE; three divisions.

    Scale: the single x162 sessionization shuffle, a per-session
    aggregate in the same partitioning, 1-row output.
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

    def flag(t: str, name: str):
        return F.max(
            F.when(F.col("event_type") == t, 1).otherwise(0)
        ).alias(name)

    sess = s.groupBy("user_id", "session_no").agg(
        flag("view", "hv"),
        flag("click", "hc"),
        flag("purchase", "hp"),
        F.sum(
            F.when(
                F.col("event_type") == "purchase",
                F.col("value").cast("decimal(18,6)"),
            ).otherwise(zero)
        ).alias("purchase_value"),
    )
    t = sess.agg(
        F.count("*").cast("bigint").alias("n_sessions"),
        F.sum("hv").cast("bigint").alias("n_view"),
        F.sum(
            F.when((F.col("hv") == 1) & (F.col("hc") == 1), 1).otherwise(
                0
            )
        )
        .cast("bigint")
        .alias("n_view_click"),
        F.sum(
            F.when(
                (F.col("hv") == 1)
                & (F.col("hc") == 1)
                & (F.col("hp") == 1),
                1,
            ).otherwise(0)
        )
        .cast("bigint")
        .alias("n_view_click_buy"),
        F.sum("purchase_value").cast("double").alias("total_value"),
    )
    return t.select(
        "n_sessions",
        "n_view",
        "n_view_click",
        "n_view_click_buy",
        F.round(
            F.col("n_view_click").cast("double") / F.col("n_view"), 6
        ).alias("click_through"),
        F.round(
            F.col("n_view_click_buy").cast("double")
            / F.col("n_view_click"),
            6,
        ).alias("close_rate"),
        F.round(
            F.col("total_value") / F.col("n_sessions"), 4
        ).alias("value_per_session"),
    )
