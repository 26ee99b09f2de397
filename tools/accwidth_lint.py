"""Accumulator-width lint: no int-typed products of corpus-scaled values.

The x213 class (SCALE.md §"Corpus-differential ladder (r9)", rule
box): ``row_number()``/``rank``/``count`` outputs are IntegerType or
grow with the corpus, so a product of two such values crosses int32
at ~46k rows even though every shipped fixture stays far below that —
and the engine's permissive (non-ANSI) session policy makes the wrap
SILENT. The r9 ladder caught exactly one live instance (x213's
Σd² = Σ(price_rank − rev_rank)²); this lint makes the class rule
mechanical so no new registration can reintroduce it (r9 verdict
ask #3).

Detector: walk every registered query's ANALYZED logical plan (plans
only — no job runs except what a query builds eagerly) and flag any
``Multiply`` whose result type is int/smallint/tinyint and whose
operands are BOTH non-foldable. Two non-foldable integer operands are
each potentially corpus-scaled, so their product's headroom is
unknowable statically — the fix is always an explicit
``cast("bigint")`` (or decimal) BEFORE the multiply, which also makes
the intent visible in the plan. Excluded by design:

- literal × column (foldable side): grows linearly in one factor, so
  the headroom is a static fact of the literal — auditable in-code,
  and flagging it would drown the signal (unit scalings like
  ``* 1000000`` are common and documented per-site);
- ``pow``/division/``avg``: return double — no silent integer wrap;
- ``sum``/window ``sum`` over int: Spark auto-widens the accumulator
  to bigint; the hazard is only the pre-sum expression;
- pinned ``ALLOWLIST`` sites whose product is bounded by ROW CONTENT
  (e.g. a single string's length) rather than corpus cardinality —
  each entry carries its boundedness proof and exempts only the
  exact rendered expression, and the test suite pins the raw
  findings to that set.

First full-registry run (r10) caught one live instance beyond x213:
x211's Kendall-tau sign product of two row_number differences
(fixed: bigint widen in both the Spark plan and the oracle SQL).

Usage: python tools/accwidth_lint.py [SF_DIR] [--prefix P]...
Exit 0 iff zero findings. One JSON summary line on stdout; per-query
progress on stderr. The pytest twin (tests/test_accwidth_lint.py)
runs the identical walk over the full registry with the x213 pre-fix
shape as its negative fixture.

``--rounded-ratios`` runs a REPORT-ONLY inventory of the q34 class
instead (SCALE.md §"Corpus-differential ladder", r10 finding):
``round(int_ratio, s)`` sites — Round over a double Divide whose
operands are both integer-valued under their implicit casts. These
are NOT defects: the rational k/n rounds identically in both engines
unless k·10ˢ/n can land exactly on a half-way point at some corpus
cardinality, which no static check can decide. The inventory exists
so that when a ladder rung at a NEW cardinality flakes by 1 ulp in
the s-th decimal, the affected site is found by lookup instead of
forensics (q34 took the forensics route). Always exits 0.
"""

from __future__ import annotations

import json
import os
import sys

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO_ROOT not in sys.path:
    sys.path.insert(0, REPO_ROOT)

_NARROW_INT_TYPES = ("int", "smallint", "tinyint")

# Bounded-by-construction exemptions: {query: (exact expression SQL,
# boundedness proof)}. An entry exempts ONLY findings whose rendered
# expression matches the pinned string — any OTHER int product added
# to the same query still fails, and tests/test_accwidth_lint.py
# asserts the raw (pre-allowlist) findings equal exactly this set so
# silent drift is impossible.
ALLOWLIST: dict[str, tuple[str, str]] = {
    "x85_typo_pairs": (
        "(i * CAST(FLOOR((CAST(pl AS DOUBLE) / CAST(3 AS DOUBLE))) AS INT))",
        "segment-offset product: i <= d=2 (literal segment indices) and "
        "floor(pl/3) <= 2^31/3 via the JVM string-length cap, so the "
        "product is < 2^31 by construction — bounded by one TOKEN's "
        "length (row content), not corpus cardinality; casting would "
        "fight substr()'s IntegerType position signature",
    ),
}


def int_product_findings(df) -> list[str]:
    """Flag int-typed Multiply nodes with two non-foldable operands
    anywhere in ``df``'s analyzed logical plan (subqueries included).
    Returns human-readable finding strings (empty == clean).
    """
    findings: list[str] = []
    stack = [df._jdf.queryExecution().analyzed()]
    while stack:
        p = stack.pop()
        ch = p.children()
        for i in range(ch.size()):
            stack.append(ch.apply(i))
        # scalar/IN/EXISTS subqueries carry their own plans
        sub = p.subqueries()
        for i in range(sub.size()):
            stack.append(sub.apply(i))
        exprs = p.expressions()
        estack = [exprs.apply(i) for i in range(exprs.size())]
        while estack:
            e = estack.pop()
            ech = e.children()
            for i in range(ech.size()):
                estack.append(ech.apply(i))
            if e.getClass().getSimpleName() != "Multiply":
                continue
            dt = e.dataType().simpleString()
            if dt not in _NARROW_INT_TYPES:
                continue
            if e.left().foldable() or e.right().foldable():
                continue
            findings.append(
                f"{dt}-typed product of two non-foldable operands "
                f"(widen with .cast('bigint') BEFORE the multiply): "
                f"{e.sql()}"
            )
    return findings


def rounded_ratio_sites(df) -> list[str]:
    """Report-only q34-class inventory: ``Round(Divide(a, b), s)`` in
    double where a and b are both integer-valued beneath their
    implicit casts — a rounded rational that COULD hit a cross-engine
    half-way point at some corpus cardinality. Scale-0 decimals
    (e.g. the micro-unit revenue accumulators) are integer-valued
    too and count."""
    _INTEGRAL = ("int", "bigint", "smallint", "tinyint")

    def _is_integral(e) -> bool:
        s = e.dataType().simpleString()
        return s in _INTEGRAL or (s.startswith("decimal(") and s.endswith(",0)"))

    def _strip_casts(e):
        while e.getClass().getSimpleName() in ("Cast", "AnsiCast"):
            e = e.children().apply(0)
        return e

    sites: list[str] = []
    stack = [df._jdf.queryExecution().analyzed()]
    while stack:
        p = stack.pop()
        ch = p.children()
        for i in range(ch.size()):
            stack.append(ch.apply(i))
        sub = p.subqueries()
        for i in range(sub.size()):
            stack.append(sub.apply(i))
        exprs = p.expressions()
        estack = [exprs.apply(i) for i in range(exprs.size())]
        while estack:
            e = estack.pop()
            ech = e.children()
            for i in range(ech.size()):
                estack.append(ech.apply(i))
            if e.getClass().getSimpleName() != "Round":
                continue
            target = e.children().apply(0)
            if target.getClass().getSimpleName() != "Divide":
                continue
            if target.dataType().simpleString() != "double":
                continue  # decimal division rounds engine-exactly
            num = _strip_casts(target.left())
            den = _strip_casts(target.right())
            if _is_integral(num) and _is_integral(den):
                sites.append(f"round(int/int) site: {e.sql()}")
    return sites


def scan_registry(spark, sf_dir: str, prefixes: list[str] | None = None,
                  progress=None, apply_allowlist: bool = True,
                  finder=None) -> dict[str, list[str]]:
    """Run a plan-walk finder over every registered query.

    Builds each DataFrame at ``sf_dir`` (plan analysis only; eager
    queries run whatever they run at that sf). Returns
    {name: findings} for names with findings or build errors.
    ``apply_allowlist=False`` returns the raw findings (used by the
    test that pins the allowlist to its exact expressions). ``finder``
    defaults to ``int_product_findings``; the allowlist applies only
    to that finder.
    """
    from capgemini_himss24_fhirbulkdata_demo_spark.queries import QUERIES

    finder = finder or int_product_findings
    names = sorted(
        n for n in QUERIES
        if not prefixes or any(n.startswith(p) for p in prefixes)
    )
    out: dict[str, list[str]] = {}
    for i, name in enumerate(names, 1):
        try:
            df = QUERIES[name](spark, sf_dir)
            found = finder(df)
            for dep in getattr(df, "_cached_deps", []):
                dep.unpersist()
        except Exception as exc:  # a build error is a finding too
            found = [f"plan build failed: {type(exc).__name__}: {exc}"]
        if (
            apply_allowlist
            and finder is int_product_findings
            and name in ALLOWLIST
        ):
            pinned = ALLOWLIST[name][0]
            found = [f for f in found if not f.endswith(pinned)]
        if found:
            out[name] = found
        if progress:
            progress(i, len(names), name, found)
    return out


def main() -> None:
    from capgemini_himss24_fhirbulkdata_demo_spark.session import get_spark

    args = sys.argv[1:]
    ratios = "--rounded-ratios" in args
    args = [a for a in args if a != "--rounded-ratios"]
    prefixes: list[str] = []
    while "--prefix" in args:
        i = args.index("--prefix")
        prefixes.append(args[i + 1])
        del args[i : i + 2]
    sf_dir = args[0] if args else "/root/testdata/sf0.001"

    spark = get_spark(
        master=f"local[{os.cpu_count()}]",
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    spark.sparkContext.setLogLevel("ERROR")

    def progress(i, n, name, found):
        status = f"FLAG x{len(found)}" if found else "ok"
        print(f"[{i:3d}/{n}] {name}: {status}", file=sys.stderr)

    if ratios:
        sites = scan_registry(
            spark, sf_dir, prefixes, progress, finder=rounded_ratio_sites
        )
        print(json.dumps({
            "mode": "rounded-ratios (report-only inventory, q34 class)",
            "sf_dir": sf_dir,
            "scanned_prefixes": prefixes or ["<all>"],
            "sites": sites,
            "n_queries_with_sites": len(sites),
            "n_sites": sum(len(v) for v in sites.values()),
        }))
        sys.exit(0)

    findings = scan_registry(spark, sf_dir, prefixes, progress)
    print(json.dumps({
        "sf_dir": sf_dir,
        "scanned_prefixes": prefixes or ["<all>"],
        "flagged": findings,
        "n_flagged": len(findings),
        "allowlist": {k: v[0] for k, v in ALLOWLIST.items()},
    }))
    sys.exit(1 if findings else 0)


if __name__ == "__main__":
    main()
