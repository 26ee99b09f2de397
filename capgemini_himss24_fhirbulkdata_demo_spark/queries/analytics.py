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
       ROUND(CAST(tot_u AS DOUBLE) / 1000000, 2) AS revenue,
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
        F.round(F.col("tot_u").cast("double") / 1000000, 2).alias("revenue"),
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

    Scale: ONE scan computes every column's counts (the per-column
    SELECTs the oracle unions are fused by Spark into a single
    multi-distinct aggregate); integer counts, two divisions per
    row.
    """
    orders = load_table(spark, sf_dir, "orders")
    aggs = []
    for c in _X171_COLS:
        aggs += [
            F.count("*").cast("bigint").alias(f"{c}__rows"),
            (F.count("*") - F.count(c)).cast("bigint").alias(f"{c}__nulls"),
            F.countDistinct(c).cast("bigint").alias(f"{c}__distinct"),
        ]
    wide = orders.agg(*aggs)
    stack_expr = ", ".join(
        f"'{c}', {c}__rows, {c}__nulls, {c}__distinct" for c in _X171_COLS
    )
    long = wide.selectExpr(
        f"stack({len(_X171_COLS)}, {stack_expr}) AS "
        "(column_name, n_rows, n_nulls, n_distinct)"
    )
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
    st = s.select("user_id", "session_no", "event_type").distinct()
    ns = st.select("user_id", "session_no").distinct().agg(
        F.count("*").cast("bigint").alias("n_sessions")
    )
    tcount = st.groupBy("event_type").agg(
        F.count("*").cast("bigint").alias("n")
    )
    a = st.alias("a")
    b = st.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.user_id") == F.col("b.user_id"))
            & (F.col("a.session_no") == F.col("b.session_no"))
            & (F.col("a.event_type") < F.col("b.event_type")),
        )
        .groupBy(
            F.col("a.event_type").alias("type_a"),
            F.col("b.event_type").alias("type_b"),
        )
        .agg(F.count("*").cast("bigint").alias("n_both"))
    )
    ta = tcount.select(
        F.col("event_type").alias("type_a"), F.col("n").alias("n_a")
    )
    tb = tcount.select(
        F.col("event_type").alias("type_b"), F.col("n").alias("n_b")
    )
    return (
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

    Scale: one explode + (half, token) partial agg; the full-outer
    token join shuffles on token (Zipf head collapses map-side);
    totals are 2-row broadcasts; top-30 is TakeOrdered.
    """
    docs = load_table(spark, sf_dir, "documents")
    mid = docs.agg(
        F.floor(F.max("doc_id") / 2).cast("bigint").alias("m")
    )
    tok = (
        docs.crossJoin(F.broadcast(mid))
        .select(
            F.when(F.col("doc_id") <= F.col("m"), "early")
            .otherwise("late")
            .alias("half"),
            F.explode(F.split(F.lower("text"), " ")).alias("token"),
        )
    )
    cnt = tok.groupBy("half", "token").agg(
        F.count("*").cast("bigint").alias("n")
    )
    tot = cnt.groupBy("half").agg(F.sum("n").cast("bigint").alias("t"))
    e = cnt.where(F.col("half") == "early").select(
        "token", F.col("n").alias("ne")
    )
    l = cnt.where(F.col("half") == "late").select(
        F.col("token").alias("token_l"), F.col("n").alias("nl")
    )
    m = e.join(l, e.token == l.token_l, "full_outer").select(
        F.coalesce("token", "token_l").alias("token"),
        F.coalesce("ne", F.lit(0)).alias("n_early"),
        F.coalesce("nl", F.lit(0)).alias("n_late"),
    )
    te = tot.where(F.col("half") == "early").select(
        F.col("t").alias("tot_early")
    )
    tl = tot.where(F.col("half") == "late").select(
        F.col("t").alias("tot_late")
    )
    j = m.crossJoin(F.broadcast(te)).crossJoin(F.broadcast(tl))
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
       ROUND(CAST(a.rev_u AS DOUBLE) / 1000000, 2) AS revenue,
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
            F.round(F.col("rev_u").cast("double") / 1000000, 2).alias(
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
  SELECT CAST(SUM(CASE WHEN (a.r_early - b.r_early)
                          * (a.r_late - b.r_late) > 0
                       THEN 1 ELSE 0 END) AS BIGINT) AS c,
         CAST(SUM(CASE WHEN (a.r_early - b.r_early)
                          * (a.r_late - b.r_late) < 0
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
    sign = (F.col("ea") - F.col("eb")) * (F.col("la") - F.col("lb"))
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
       ROUND(1 - CAST(6 * sd2 AS DOUBLE) / (n * (n * n - 1)), 6)
         AS spearman_rho
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
    dd = F.col("price_rank") - F.col("rev_rank")
    s = rk.agg(
        F.count("*").cast("bigint").alias("n"),
        F.sum(dd * dd).cast("bigint").alias("sd2"),
    )
    return s.select(
        F.col("n").alias("n_parts"),
        F.col("sd2").alias("sum_sq_rank_diff"),
        F.round(
            1
            - (6 * F.col("sd2")).cast("double")
            / (F.col("n") * (F.col("n") * F.col("n") - 1)),
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
       ROUND(CAST(rev_u AS DOUBLE) / 1000000, 2) AS revenue
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
            F.round(F.col("rev_u").cast("double") / 1000000, 2).alias(
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

    Scale: (source, term) and term aggregates share the token
    shuffle family; the missing-mass anti-join is term-keyed.
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
    terms = (
        sc.join(cc, "t")
        .join(F.broadcast(st), "source")
        .crossJoin(F.broadcast(ct))
        .select(
            "source",
            F.abs(
                F.col("n").cast("decimal(38,0)") * F.col("big_t")
                - F.col("big_n").cast("decimal(38,0)")
                * F.col("small_t")
            ).alias("num_u"),
        )
    )
    missing = (
        st.crossJoin(cc)
        .join(sc, ["source", "t"], "left_anti")
        .select(
            "source",
            (
                F.col("big_n").cast("decimal(38,0)")
                * F.col("small_t")
            ).alias("num_u"),
        )
    )
    tot = (
        terms.unionByName(missing)
        .groupBy("source")
        .agg(F.sum("num_u").alias("num"))
    )
    return (
        st.join(tot, "source")
        .crossJoin(F.broadcast(ct))
        .select(
            "source",
            F.round(
                F.col("num").cast("double")
                / (
                    2
                    * F.col("small_t").cast("double")
                    * F.col("big_t")
                ),
                6,
            ).alias("tv_distance"),
        )
        .orderBy("source")
    )


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
       ROUND(CAST(SUM(fy_rev_u) AS DOUBLE) / 1000000, 2)
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

    Scale: partkey min-year agg, a partkey-co-keyed join back,
    launch-year rollup. Edge cohorts (first/last fixture years)
    are partially observed — interpret trend on interior years.
    """
    li = load_table(spark, sf_dir, "lineitem")
    first_year = li.groupBy("l_partkey").agg(
        F.min(F.year(F.col("l_shipdate").cast("date")))
        .cast("bigint")
        .alias("launch_yr")
    )
    net = (
        F.col("l_extendedprice").cast("decimal(18,2)")
        * (F.lit(1).cast("decimal(6,4)") - F.col("l_discount").cast("decimal(6,4)"))
    )
    zero = F.lit(0).cast("decimal(25,6)")
    fy_rev = (
        li.join(first_year, "l_partkey")
        .groupBy("launch_yr", "l_partkey")
        .agg(
            (
                F.sum(
                    F.when(
                        F.year(F.col("l_shipdate").cast("date"))
                        == F.col("launch_yr"),
                        net,
                    ).otherwise(zero)
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
            F.round(
                F.sum("fy_rev_u").cast("double") / 1000000, 2
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
    top_nation = (
        li.join(F.broadcast(sup), li.l_suppkey == sup.s_suppkey)
        .join(F.broadcast(nat), sup.s_nationkey == nat.n_nationkey)
        .groupBy("n_name")
        .agg(F.sum(disc).alias("r"))
        .orderBy(F.desc("r"), "n_name")
        .limit(1)
        .select("n_name")
    )
    top_brand = (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .groupBy("p_brand")
        .agg(F.sum(disc).alias("r"))
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
       ROUND(CAST(r.rev_u AS DOUBLE) / 1000000, 2) AS revenue,
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
            F.round(F.col("rev_u").cast("double") / 1000000, 2).alias(
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
       ROUND(CAST(i.mean_ppm AS DOUBLE) / 1000000, 4) AS mean_delay_d,
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
            F.round(
                F.col("mean_ppm").cast("double") / 1000000, 4
            ).alias("mean_delay_d"),
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
       ROUND(CAST(rev_u AS DOUBLE) / 1000000, 2) AS top_brand_revenue,
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
            F.round(F.col("rev_u").cast("double") / 1000000, 2).alias(
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
       ROUND(CAST(t.qmax AS DOUBLE) / t.qmin, 4) AS peak_trough_ratio
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
    Spark's 1-based convention (the x161 rule).

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
            F.round(
                F.col("qmax").cast("double") / F.col("qmin"), 4
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
       ROUND(CAST(sx AS DOUBLE) / n, 4) AS mean_size,
       ROUND(CAST(sy AS DOUBLE) / n, 4) AS mean_qty,
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
    return s.select(
        F.col("n").alias("n_lines"),
        F.round(d("sx") / F.col("n"), 4).alias("mean_size"),
        F.round(d("sy") / F.col("n"), 4).alias("mean_qty"),
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
       ROUND(CAST(MAX(CASE WHEN rn = CAST(CEIL(0.50 * n) AS BIGINT)
                           THEN price_c * 1000 // size END) AS DOUBLE)
             / 100000, 4) AS median_price_per_size
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
    return (
        r.groupBy("p_brand")
        .agg(
            F.max("n").cast("bigint").alias("n_parts"),
            F.round(
                F.max(
                    F.when(
                        F.col("rn")
                        == F.ceil(0.50 * F.col("n")).cast("bigint"),
                        F.col("unit_mc"),
                    )
                ).cast("double")
                / 100000,
                4,
            ).alias("median_price_per_size"),
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
       ROUND(CAST(n_sessions AS DOUBLE) / mau, 4)
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

    Integer counts; one division per month.

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
        F.round(
            F.col("n_sessions").cast("double") / F.col("mau"), 4
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
       ROUND(CAST(sx AS DOUBLE) / n, 4) AS mean_lines,
       ROUND(CAST(sy AS DOUBLE) / n, 4) AS mean_spread_d,
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
    per order.

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
    return s.select(
        F.col("n").alias("n_orders"),
        F.round(d("sx") / F.col("n"), 4).alias("mean_lines"),
        F.round(d("sy") / F.col("n"), 4).alias("mean_spread_d"),
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
       ROUND(CAST(s.delay_sum AS DOUBLE) / s.n_lines, 4)
         AS mean_ship_delay_d,
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
    ratio.

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
            F.round(
                F.col("delay_sum").cast("double") / F.col("n_lines"), 4
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
       ROUND(CAST(s AS DOUBLE) / n, 4) AS mean_gap,
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
    positions instead of counts).

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
        F.round(d("s") / F.col("n"), 4).alias("mean_gap"),
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
       ROUND(CAST(a.rev_u AS DOUBLE) / 1000000, 2) AS revenue,
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
            F.round(F.col("rev_u").cast("double") / 1000000, 2).alias(
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
       ROUND(CAST(a.rev_u AS DOUBLE) / 1000000, 2) AS revenue,
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
            F.round(F.col("rev_u").cast("double") / 1000000, 2).alias(
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
       ROUND(CAST(m.s AS DOUBLE) / m.n_sup, 4) AS mean_lines,
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
    concentrates). Integer line-count moments per supplier.

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
            F.round(d("s") / F.col("n_sup"), 4).alias("mean_lines"),
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
       ROUND(CAST(sx AS DOUBLE) / n, 4) AS mean_gap_d,
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
    the cross-products in DECIMAL(19,0)-widened sums.

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
        F.round(d("sx") / F.col("n"), 4).alias("mean_gap_d"),
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
