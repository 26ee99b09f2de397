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
# bit-stable; these are).
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
       (ARRAY[{", ".join(repr(p) for p in _BENFORD_P)}])[c.digit]
         AS benford_p,
       ROUND(
         (CAST(c.n_obs AS DOUBLE)
          - t.n * (ARRAY[{", ".join(repr(p) for p in _BENFORD_P)}])[c.digit])
         * (CAST(c.n_obs AS DOUBLE)
          - t.n * (ARRAY[{", ".join(repr(p) for p in _BENFORD_P)}])[c.digit])
         / (t.n * (ARRAY[{", ".join(repr(p) for p in _BENFORD_P)}])[c.digit]),
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
