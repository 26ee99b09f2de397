"""Accumulator-width lint (tools/accwidth_lint.py) — the x213 class rule.

SCALE.md §"Corpus-differential ladder (r9)" records the rule: any
product of two corpus-scaled integer expressions (rank/row_number/
count outputs) must widen to bigint BEFORE the multiply, because the
engine's permissive session policy makes int32 wraparound silent and
no shipped fixture reaches the ~46k-row crossing. These tests make
the rule mechanical (r9 verdict ask #3): the exact pre-fix x213 shape
is the negative fixture, and the full registry is swept so a new
registration reintroducing the class fails CI-equivalent pytest.
"""

from __future__ import annotations

import os
import sys

from pyspark.sql import Window
from pyspark.sql import functions as F

from .conftest import REPO_ROOT, SF_DIR

sys.path.insert(0, os.path.join(REPO_ROOT, "tools"))

from accwidth_lint import (  # noqa: E402
    ALLOWLIST,
    finding_expression,
    halfway_solvable,
    int_product_findings,
    scan_registry,
)


def _ranked(spark):
    df = spark.range(100).select(
        F.col("id").cast("int").alias("a"),
        ((F.col("id") * 7) % 100).cast("int").alias("b"),
    )
    return df.select(
        F.row_number().over(Window.orderBy("a")).alias("r1"),
        F.row_number().over(Window.orderBy("b")).alias("r2"),
    )


def test_flags_pre_fix_x213_shape(spark):
    """The exact defect the r9 ladder caught: int rank difference
    squared before widening, summed — wraps int32 past ~46k rows."""
    rk = _ranked(spark)
    d = F.col("r1") - F.col("r2")
    bad = rk.select((d * d).alias("dd")).agg(F.sum("dd").alias("sd2"))
    findings = int_product_findings(bad)
    assert len(findings) == 1
    assert "int-typed product" in findings[0]
    assert "(r1 - r2)" in findings[0]


def test_clean_on_widened_shape(spark):
    """The shipped fix: cast to bigint BEFORE the multiply."""
    rk = _ranked(spark)
    d = (F.col("r1") - F.col("r2")).cast("bigint")
    good = rk.select((d * d).alias("dd")).agg(F.sum("dd").alias("sd2"))
    assert int_product_findings(good) == []


def test_literal_scaling_not_flagged(spark):
    """literal x column grows linearly — its headroom is a static
    fact of the literal, audited in-code per-site, not lint scope."""
    rk = _ranked(spark)
    df = rk.select((F.col("r1") * 1000).alias("scaled"))
    assert int_product_findings(df) == []


def test_flag_survives_subquery_nesting(spark):
    """The walk must descend into scalar-subquery plans."""
    rk = _ranked(spark)
    d = F.col("r1") - F.col("r2")
    rk.select((d * d).alias("dd")).createOrReplaceTempView("accw_sub")
    df = spark.sql(
        "SELECT (SELECT sum(dd) FROM accw_sub) AS s FROM range(1)"
    )
    try:
        assert len(int_product_findings(df)) == 1
    finally:
        spark.catalog.dropTempView("accw_sub")


def test_allowlist_pins_exact_expressions(spark):
    """Each ALLOWLIST entry must match the query's raw findings
    EXACTLY: a new int product added to an allowlisted query, or an
    allowlisted expression that no longer exists, both fail here —
    the exemption can never silently widen or go stale. r10 ADVICE:
    the scan selects allowlisted names by EXACT membership (a query
    merely sharing an allowlisted prefix is out of scope here) and
    the expression comparison is ==, not endswith."""
    raw = scan_registry(
        spark, SF_DIR, names=sorted(ALLOWLIST), apply_allowlist=False
    )
    assert set(raw) <= set(ALLOWLIST)
    for name, (pinned, _proof) in ALLOWLIST.items():
        found = raw.get(name, [])
        assert found, f"{name}: allowlist entry is stale (no findings)"
        assert all(finding_expression(f) == pinned for f in found), (
            f"{name}: raw findings include a NON-allowlisted int "
            f"product: {found}"
        )


def test_allowlist_exemption_is_exact_not_suffix():
    """The exemption separator contract: finding_expression returns
    the exact rendered SQL after the separator, so an expression that
    merely ENDS WITH a pinned string (e.g. wrapped in an outer
    product) no longer rides the exemption (r10 ADVICE)."""
    pinned = "(a * b)"
    exempt = f"int-typed product (widen ...) :: {pinned}"
    # a DIFFERENT expression whose rendering happens to end with the
    # pinned string — e.g. a multiply under a function call
    other = "int-typed product (widen ...) :: foo(a * b)"
    assert finding_expression(exempt) == pinned
    assert finding_expression(other) != pinned
    assert other.endswith(pinned)  # the old rule would have exempted it


def test_full_registry_clean(spark):
    """Every registered query's analyzed plan is free of the class
    (modulo the pinned, proof-carrying ALLOWLIST — see
    test_allowlist_pins_exact_expressions).

    Builds all plans at the test fixture scale (eager queries run
    whatever they run — same cost class as the oracle harness).
    First run of this sweep (r10) caught x211's Kendall-tau sign
    product — the x213 class in a second query — before any driver
    or ladder red.
    """
    findings = scan_registry(spark, SF_DIR)
    assert findings == {}, (
        f"{len(findings)} registered quer(ies) contain int-typed "
        f"products of non-foldable operands: {findings}"
    )


def test_rounded_ratio_inventory_detects_the_q34_class(spark):
    """Report-only inventory (SCALE.md q34 class): round over a
    double division of two integer-valued operands, including
    scale-0 decimals; plain double ratios are out of scope."""
    from accwidth_lint import rounded_ratio_details, rounded_ratio_sites

    df = spark.range(10).select(
        F.col("id").cast("bigint").alias("k"),
        (F.col("id") + 1).cast("bigint").alias("n"),
        F.col("id").cast("decimal(19,0)").alias("kd"),
        (F.col("id").cast("double") + 0.5).alias("x"),
    )
    int_ratio = df.select(
        F.round(F.col("k").cast("double") / F.col("n"), 6).alias("r")
    )
    dec_ratio = df.select(
        F.round(F.col("kd").cast("double") / F.col("n"), 2).alias("r")
    )
    dbl_ratio = df.select(
        F.round(F.col("x") / F.col("n").cast("double"), 6).alias("r")
    )
    (site,) = rounded_ratio_details(int_ratio)
    assert site["kind"] == "simple" and site["scale"] == 6
    (site2,) = rounded_ratio_details(dec_ratio)
    assert site2["kind"] == "simple" and site2["scale"] == 2
    assert rounded_ratio_sites(dbl_ratio) == []


def test_rounded_ratio_inventory_covers_composite_rationals(spark):
    """r10 ADVICE: the x213 shape — round over a COMPOSITE rational of
    integers (1 − 6·sd2/(n·(n²−1))) — must appear in the inventory
    (kind=composite), not just the bare Round(Divide) form; a rational
    with a non-integral (double) leaf stays out of scope."""
    from accwidth_lint import rounded_ratio_details

    df = spark.range(10).select(
        (F.col("id") + 1).cast("bigint").alias("n"),
        (F.col("id") * 3).cast("bigint").alias("sd2"),
        (F.col("id").cast("double") + 0.5).alias("x"),
    )
    n_d = F.col("n").cast("double")
    composite = df.select(
        F.round(
            1 - 6 * F.col("sd2").cast("double") / (n_d * (n_d * n_d - 1)), 6
        ).alias("rho")
    )
    (site,) = rounded_ratio_details(composite)
    assert site["kind"] == "composite" and site["scale"] == 6
    # double leaf anywhere -> not a rational of integers -> no site
    with_dbl_leaf = df.select(
        F.round(
            (F.col("x") + F.col("sd2").cast("double")) / n_d, 6
        ).alias("r")
    )
    assert rounded_ratio_details(with_dbl_leaf) == []


def test_halfway_solvable_matches_brute_force():
    """The --solvable-at congruence (2·k·10^s ≡ n mod 2n) against an
    exhaustive k-sweep for every n ≤ 400 and s ≤ 3, plus the exact
    q34 coordinates: solvable at the 16×-corpus customer count but at
    NO shipped fixture customer cardinality (SCALE.md's account)."""
    for s in range(4):
        a = 2 * 10**s
        for n in range(1, 401):
            brute = any((a * k) % (2 * n) == n for k in range(1, 2 * n + 1))
            ok, k0 = halfway_solvable(n, s)
            assert ok == brute, (n, s)
            if ok:
                assert (a * k0) % (2 * n) == n, (n, s, k0)
    # q34: n = 240 000 (16x customer), s = 6 -> solvable; the shipped
    # fixture customer counts (sf0.001/0.01/0.1) are all unsolvable
    ok, k0 = halfway_solvable(240_000, 6)
    assert ok and (2 * 10**6 * k0) % 480_000 == 240_000
    for shipped_n in (1_500, 15_000, 150_000):
        assert halfway_solvable(shipped_n, 6) == (False, None)


def test_no_reachable_halfway_points_in_pending_driver_windows(spark):
    """r10 verdict ask #2: the driver-pending names (the union of the
    remaining r11–r13 windows) must carry ZERO simple round(k/n, s)
    sites whose half-way congruence is solvable at the driver's exact
    sf0.01 fixture cardinalities or the sf0.1 ones the local
    re-sweeps use — a 1-ulp q34-style flake there would be the
    protocol's first driver red. Any hit gets the q34
    integer-millionths rewrite BEFORE its window arrives. Composite
    sites have no single (k, n) to screen; their safety evidence at
    these fixtures is the oracle-harness equality the suite already
    runs on the same dirs."""
    from accwidth_lint import pending_driver_names, solvable_screen

    names = pending_driver_names()
    if not names:  # post-drain regime: nothing pending, nothing to screen
        return
    card_dirs = [
        d for d in ("/root/testdata/sf0.01", "/root/testdata/sf0.1")
        if os.path.isdir(d)
    ]
    report = solvable_screen(spark, SF_DIR, card_dirs, names)
    assert report["hits"] == {}, (
        "pending-window queries with driver-fixture-solvable round "
        f"half-way points (q34 rewrite needed): {report['hits']}"
    )
