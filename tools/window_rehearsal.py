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

Usage: python tools/window_rehearsal.py [sf_dir=/root/testdata/sf0.01]
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

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
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
