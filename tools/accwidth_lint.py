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
``round(rational_of_integers, s)`` sites — Round over a double
expression built from +,−,×,÷ whose LEAVES are all integer-valued
(r10 ADVICE: not just a bare ``Divide`` — x213's
``1 − 6·sd2/(n·(n²−1))`` is the same class behind a composite
numerator and must appear in the lookup inventory). These are NOT
defects: the rational rounds identically in both engines unless it
can land exactly on a half-way point at some corpus cardinality,
which no static check can decide. The inventory exists so that when
a ladder rung at a NEW cardinality flakes by 1 ulp in the s-th
decimal, the affected site is found by lookup instead of forensics
(q34 took the forensics route). Always exits 0.

``--solvable-at DIR`` (repeatable; r10 verdict ask #2) runs the
ANALYTIC half-way-point screen over the DRIVER-PENDING queries (no
driver-green CORRECTNESS row yet — the names that will face fresh
driver windows): for every simple ``round(k/n, s)`` site, test
whether ``2·k·10^s ≡ n (mod 2n)`` — the exact condition for k/n to
land on a round-half-way point — has an integer solution when n is
one of DIR's exact per-table fixture cardinalities (read from
parquet footers; no query runs). q34's hit was precisely this shape
(n = the 16×-corpus customer count). A solvable site gets the q34
integer-millionths rewrite BEFORE its window arrives. Composite
rational sites (multi-term numerators) have no single (k, n) to
screen; they are listed as such — their driver-fixture safety
evidence is the live oracle harness equality at the same fixture
dirs, which these deterministic rationals make decisive. Exits 1 iff
any simple pending site is solvable at any screened cardinality.
"""

from __future__ import annotations

import json
import os
import sys

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO_ROOT not in sys.path:
    sys.path.insert(0, REPO_ROOT)

_NARROW_INT_TYPES = ("int", "smallint", "tinyint")

# Separator between a finding's human-readable message and the exact
# rendered expression SQL. The ALLOWLIST filter splits on this and
# compares the expression part with == (r10 ADVICE: an endswith match
# was looser than the "exact expression" contract — a NEW expression
# whose SQL merely ended with the pinned string would ride the
# exemption).
_FINDING_SEP = " :: "

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
                f"(widen with .cast('bigint') BEFORE the multiply)"
                f"{_FINDING_SEP}{e.sql()}"
            )
    return findings


def finding_expression(finding: str) -> str:
    """The exact rendered expression SQL of a finding string (the part
    after ``_FINDING_SEP``); the whole string if no separator (build
    errors)."""
    return finding.split(_FINDING_SEP, 1)[-1]


_INTEGRAL_TYPES = ("int", "bigint", "smallint", "tinyint")
# Internal nodes under which a double expression stays a RATIONAL
# function of its integer leaves (Alias never appears below Round in
# an analyzed plan's expression tree; Abs/UnaryMinus preserve
# rationality).
_RATIONAL_NODES = (
    "Add", "Subtract", "Multiply", "Divide",
    "UnaryMinus", "Abs", "Cast", "AnsiCast",
)


def _is_integral(e) -> bool:
    s = e.dataType().simpleString()
    return s in _INTEGRAL_TYPES or (
        s.startswith("decimal(") and s.endswith(",0)")
    )


def _strip_casts(e):
    while e.getClass().getSimpleName() in ("Cast", "AnsiCast"):
        e = e.children().apply(0)
    return e


def _rational_of_integers(e) -> bool:
    """True iff ``e`` is built only of +,−,×,÷,abs,casts over leaves
    that are all integer-valued (incl. scale-0 decimals) — i.e. its
    exact value is a rational number of integers, the shape whose
    ROUND can land on a cross-engine half-way point (q34 class)."""
    ch = e.children()
    n = ch.size()
    if n == 0:
        return _is_integral(e)
    if e.getClass().getSimpleName() not in _RATIONAL_NODES:
        return False
    return all(_rational_of_integers(ch.apply(i)) for i in range(n))


def _contains_divide(e) -> bool:
    if e.getClass().getSimpleName() == "Divide":
        return True
    ch = e.children()
    return any(_contains_divide(ch.apply(i)) for i in range(ch.size()))


def rounded_ratio_details(df) -> list[dict]:
    """Structured q34-class inventory of ``df``'s analyzed plan.

    A site is ``Round(expr, s)`` where ``expr`` is double-typed, a
    rational function of integer leaves (``_rational_of_integers``),
    and contains at least one division (a divisionless integer
    expression in double is exact to 2^53 — no rounding hazard).
    r10 ADVICE: the composite form (e.g. x213's
    ``1 − 6·sd2/(n·(n²−1))``) must be inventoried too, not only the
    bare ``Round(Divide(k, n), s)``.

    Returns [{"kind": "simple"|"composite", "scale": int|None,
    "sql": str}]: ``simple`` = a bare k/n divide of integral operands
    (the shape the ``--solvable-at`` congruence screen can decide);
    ``composite`` = any other rational-of-integers shape (no single
    (k, n) to screen — driver-fixture safety evidence is the live
    oracle-harness equality at those fixtures). ``scale`` is the
    round's literal digit count when statically known.
    """
    sites: list[dict] = []
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
            if target.dataType().simpleString() != "double":
                continue  # decimal division rounds engine-exactly
            if not (_rational_of_integers(target) and _contains_divide(target)):
                continue
            scale_expr = e.children().apply(1)
            scale = None
            if scale_expr.foldable():
                try:
                    scale = int(str(scale_expr.eval(None)))
                except Exception:
                    scale = None
            stripped = _strip_casts(target)
            simple = (
                stripped.getClass().getSimpleName() == "Divide"
                and _is_integral(_strip_casts(stripped.left()))
                and _is_integral(_strip_casts(stripped.right()))
            )
            sites.append({
                "kind": "simple" if simple else "composite",
                "scale": scale,
                "sql": e.sql(),
            })
    return sites


def rounded_ratio_sites(df) -> list[str]:
    """String form of ``rounded_ratio_details`` (the report-only
    ``--rounded-ratios`` inventory)."""
    return [
        f"round({d['kind']} rational-of-integers) site @scale="
        f"{d['scale']}: {d['sql']}"
        for d in rounded_ratio_details(df)
    ]


def halfway_solvable(n: int, s: int) -> tuple[bool, int | None]:
    """Can ``round(k/n, s)`` land EXACTLY on a rounding half-way point
    for some integer k? That happens iff k·10^s/n has fractional part
    exactly 1/2, i.e. ``2·k·10^s ≡ n (mod 2n)`` — a linear congruence
    in k, solvable iff gcd(2·10^s, 2n) divides n (q34's hit:
    n = 240 000, s = 6 → solvable with k ≡ 3 (mod 6)·stride; no
    shipped fixture cardinality solves it, which is why only the 16×
    rung could see the flake). Returns (solvable, minimal k ≥ 1 or
    None). Pure integer arithmetic; no floating point.
    """
    import math

    if n <= 0 or s < 0:
        return (False, None)
    a = 2 * 10**s
    m = 2 * n
    g = math.gcd(a, m)
    if n % g:
        return (False, None)
    k0 = (n // g) * pow(a // g, -1, m // g) % (m // g)
    return (True, k0 if k0 else m // g)


def scan_registry(spark, sf_dir: str, prefixes: list[str] | None = None,
                  progress=None, apply_allowlist: bool = True,
                  finder=None, names: list[str] | None = None,
                  ) -> dict[str, list[str]]:
    """Run a plan-walk finder over every registered query.

    Builds each DataFrame at ``sf_dir`` (plan analysis only; eager
    queries run whatever they run at that sf). Returns
    {name: findings} for names with findings or build errors.
    ``apply_allowlist=False`` returns the raw findings (used by the
    test that pins the allowlist to its exact expressions). ``finder``
    defaults to ``int_product_findings``; the allowlist applies only
    to that finder. ``names`` restricts the scan to an EXACT name set
    (r10 ADVICE: the allowlist pin test must not sweep in other
    queries that merely share an allowlisted name's prefix);
    ``prefixes`` remains the prefix filter for CLI use.
    """
    from capgemini_himss24_fhirbulkdata_demo_spark.queries import QUERIES

    finder = finder or int_product_findings
    if names is not None:
        selected = sorted(n for n in names if n in QUERIES)
    else:
        selected = sorted(
            n for n in QUERIES
            if not prefixes or any(n.startswith(p) for p in prefixes)
        )
    out: dict[str, list[str]] = {}
    for i, name in enumerate(selected, 1):
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
            # exact-expression comparison, not endswith (r10 ADVICE)
            found = [f for f in found if finding_expression(f) != pinned]
        if found:
            out[name] = found
        if progress:
            progress(i, len(selected), name, found)
    return out


def fixture_cardinalities(sf_dir: str) -> dict[str, int]:
    """Exact per-table row counts of a fixture dir, read from parquet
    footers (pyarrow metadata — no query engine, no scans)."""
    import glob

    import pyarrow.parquet as pq

    out: dict[str, int] = {}
    for path in sorted(glob.glob(os.path.join(sf_dir, "*.parquet"))):
        table = os.path.splitext(os.path.basename(path))[0]
        if os.path.isdir(path):
            out[table] = sum(
                pq.ParquetFile(p).metadata.num_rows
                for p in glob.glob(os.path.join(path, "*.parquet"))
            )
        else:
            out[table] = pq.ParquetFile(path).metadata.num_rows
    return out


def pending_driver_names() -> list[str]:
    """Registered names with an oracle twin but NO driver-green
    CORRECTNESS row yet — exactly the union of the remaining driver
    windows (r11–r13 on the r10 tree). Uses the live entry surface's
    own green-set scan so the set shrinks as rounds drain."""
    import __spark_entry__ as entry

    from capgemini_himss24_fhirbulkdata_demo_spark.queries import (
        ORACLE_SQL,
        QUERIES,
    )

    green = entry._green_names()
    return sorted(n for n in QUERIES if n not in green and n in ORACLE_SQL)


def solvable_screen(spark, plan_sf_dir: str, card_dirs: list[str],
                    names: list[str], progress=None) -> dict:
    """The --solvable-at analytic screen (r10 verdict ask #2).

    For every simple ``round(k/n, s)`` site in ``names``' plans, test
    ``halfway_solvable(n, s)`` against each candidate cardinality n =
    an exact per-table row count of each ``card_dirs`` fixture (the
    denominators of the q34-class sites that motivated the screen are
    whole-table counts — q34's was the customer count). Composite
    sites are reported but not screened (no single (k, n)); their
    safety evidence at the driver fixtures is the live oracle-harness
    equality there. Returns the full report dict; ``hits`` non-empty
    means a pending site needs the q34 integer rewrite before its
    window arrives.
    """
    cards = {d: fixture_cardinalities(d) for d in card_dirs}
    per_query = scan_registry(
        spark, plan_sf_dir, names=names, progress=progress,
        finder=rounded_ratio_details,
    )
    hits: dict[str, list[dict]] = {}
    composite: dict[str, list[str]] = {}
    n_simple = 0
    for name, sites in per_query.items():
        if sites and isinstance(sites[0], str):  # plan build failed
            hits[name] = [{"error": sites[0]}]
            continue
        for site in sites:
            if site["kind"] != "simple":
                composite.setdefault(name, []).append(site["sql"])
                continue
            n_simple += 1
            if site["scale"] is None:
                hits.setdefault(name, []).append(
                    {**site, "why": "non-literal round scale — screen "
                     "cannot bound it; rewrite or pin the scale"}
                )
                continue
            for d, tables in cards.items():
                for table, n in tables.items():
                    ok, k0 = halfway_solvable(n, site["scale"])
                    if ok:
                        hits.setdefault(name, []).append({
                            **site, "fixture": d, "table": table,
                            "n": n, "min_k": k0,
                        })
    return {
        "mode": "solvable-at (q34-class analytic half-way screen)",
        "plan_sf_dir": plan_sf_dir,
        "cardinalities": cards,
        "n_names_screened": len(names),
        "n_simple_sites": n_simple,
        "composite_sites": composite,
        "hits": hits,
    }


def main() -> None:
    from capgemini_himss24_fhirbulkdata_demo_spark.session import get_spark

    args = sys.argv[1:]
    ratios = "--rounded-ratios" in args
    args = [a for a in args if a != "--rounded-ratios"]
    all_names = "--all-names" in args
    args = [a for a in args if a != "--all-names"]
    prefixes: list[str] = []
    while "--prefix" in args:
        i = args.index("--prefix")
        prefixes.append(args[i + 1])
        del args[i : i + 2]
    card_dirs: list[str] = []
    while "--solvable-at" in args:
        i = args.index("--solvable-at")
        card_dirs.append(args[i + 1])
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

    if card_dirs:
        if all_names:
            from capgemini_himss24_fhirbulkdata_demo_spark.queries import (
                ORACLE_SQL,
            )

            names = sorted(ORACLE_SQL)
        else:
            names = pending_driver_names()
        if prefixes:
            names = [n for n in names if any(n.startswith(p) for p in prefixes)]
        report = solvable_screen(spark, sf_dir, card_dirs, names, progress)
        print(json.dumps(report))
        sys.exit(1 if report["hits"] else 0)

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
