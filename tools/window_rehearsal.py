"""Rehearse the driver's CORRECTNESS window before the driver runs it.

Simulates the external correctness driver exactly: take the first
``_WINDOW`` names of ``__spark_entry__.queries()`` in dict insertion
order (the proven driver model), run each query at the given sf_dir,
run its ``oracle_sql()`` twin in DuckDB over the same parquet tables,
and compare rows/schema/values with the identical normalization the
oracle test harness uses. A clean rehearsal at sf0.01 on the final
tree is the strongest pre-verification the round can produce — it is
the driver's gate, executed through the driver's own surface, at the
driver's scale factor.

``--next N`` rehearses the window the rotation will queue N rounds
FROM NOW (simulated by feeding each intermediate round's alias batch
back into the green set, exactly what a 50/50-green driver round
does). ``--next 1`` therefore pre-verifies next round's window on
this tree — failures surface a round early, while there is still a
round to fix them in. The simulation patches the green-set reader
only; batch selection, aliasing, insertion order, and canary fill
all run through the real entry-surface code.

Usage: python tools/window_rehearsal.py [sf_dir] [--next N]
Exit code 0 iff every window name with an oracle compares clean.
"""

from __future__ import annotations

import json
import os
import sys

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO_ROOT)
sys.path.insert(0, os.path.join(REPO_ROOT, "tests"))


def main() -> None:
    from pyspark.sql import SparkSession

    import __spark_entry__ as entry
    from oracle import compare, run_duck, run_spark

    args = sys.argv[1:]
    n_ahead = 0
    if "--next" in args:
        i = args.index("--next")
        n_ahead = int(args[i + 1])
        del args[i : i + 2]
    sf_dir = args[0] if args else "/root/testdata/sf0.01"

    if n_ahead:
        real_green = entry._green_names()
        simulated = set(real_green)
        for _ in range(n_ahead):
            entry._green_names = lambda g=frozenset(simulated): set(g)
            simulated.update(n.removeprefix("a_") for n in entry._rotation_aliases())
        # final patch: the window below must see every simulated round
        # (including the last one) as driver-green
        entry._green_names = lambda g=frozenset(simulated): set(g)
        print(
            f"[rehearsal] simulating {n_ahead} round(s) ahead: "
            f"green {len(real_green)} -> {len(simulated)} assumed",
            file=sys.stderr,
        )
    spark = (
        SparkSession.builder.master(f"local[{os.cpu_count()}]")
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    qs = entry.queries()
    osql = entry.oracle_sql()
    window = list(qs)[: entry._WINDOW]

    # rows-only residue report (r9 verdict ask #7): name the window, if
    # any, that carries a registered no-oracle query, so the driver's
    # weaker rows-only handling is rehearsed rather than asserted. The
    # x86 residue can never enter a window on the current tree — no
    # oracle excludes it from the rotation queue (r6 verdict
    # What's-wrong #1) and no driver-green row excludes it from the
    # canary pool — and this line proves that from the live entry
    # surface instead of restating the design.
    for n in sorted(set(qs) - set(osql)):
        where = (
            f"IN this window (position {window.index(n) + 1}; the driver "
            "will record its weaker rows-only check)"
            if n in window
            else "not in this window (no oracle -> never queued; no "
            "driver-green row -> never a canary)"
        )
        print(f"[rehearsal] rows-only residue {n}: {where}", file=sys.stderr)

    failures: dict[str, list[str]] = {}
    n_no_oracle = 0
    for i, name in enumerate(window, 1):
        if name not in osql:
            n_no_oracle += 1
            print(f"[{i:2d}/50] {name}: rows-only (no oracle)", file=sys.stderr)
            continue
        try:
            errs = compare(
                name,
                run_spark(qs[name], spark, sf_dir),
                run_duck(osql[name], sf_dir),
            )
        except Exception as e:  # surface, keep rehearsing the rest
            errs = [f"exception: {e}"]
        if errs:
            failures[name] = errs
        print(
            f"[{i:2d}/50] {name}: {'FAIL ' + '; '.join(errs) if errs else 'ok'}",
            file=sys.stderr,
        )
    print(
        json.dumps(
            {
                "sf_dir": sf_dir,
                "window": len(window),
                "green": len(window) - len(failures) - n_no_oracle,
                "rows_only": n_no_oracle,
                "failures": failures,
            }
        )
    )
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
