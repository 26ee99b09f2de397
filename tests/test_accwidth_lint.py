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
    the exemption can never silently widen or go stale."""
    raw = scan_registry(
        spark, SF_DIR, prefixes=sorted(ALLOWLIST), apply_allowlist=False
    )
    for name, (pinned, _proof) in ALLOWLIST.items():
        found = raw.get(name, [])
        assert found, f"{name}: allowlist entry is stale (no findings)"
        assert all(f.endswith(pinned) for f in found), (
            f"{name}: raw findings include a NON-allowlisted int "
            f"product: {found}"
        )


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
    from accwidth_lint import rounded_ratio_sites

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
    assert len(rounded_ratio_sites(int_ratio)) == 1
    assert len(rounded_ratio_sites(dec_ratio)) == 1
    assert rounded_ratio_sites(dbl_ratio) == []
