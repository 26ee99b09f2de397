"""Full-registry Spark-vs-DuckDB differential at an arbitrary fixture dir.

The driver's correctness gate and the in-repo oracle suite both run at
the shipped scale factors (sf0.001/0.01/0.1). This tool runs EVERY
registered query that has an ``oracle_sql()`` twin against ANY fixture
directory — in particular the synthetic key-offset corpora written by
``tools/make_scaled_fixture.py --all-tables`` — with the exact
normalization/compare the driver mirror uses (tests/oracle.py).

Why this exists (r9): the scaled corpora are the only way to observe
query behavior PAST the largest shipped fixture, and replication is a
deliberately harsh determinism stress (N-way exact-duplicate doc
clusters, N-way ANN distance ties, N-way order ties under every
rank/LIMIT). The 4x ad-hoc run of this differential is what exposed
x05's 16-bit pair-space boundary (SCALE.md §"SimHash width boundary");
this committed form makes the ladder reproducible and extensible.

Usage:
    python tools/full_differential.py SF_DIR [--skip NAME]...
           [--prefix P]... [--out JSON_PATH] [--ansi]
           [--resume PRIOR_STDERR_LOG]

--skip marks a name as a documented exclusion (recorded in the JSON,
not counted as failure); --prefix restricts the run to names starting
with any given prefix. Exit 0 iff zero failures/errors among run
names. Stdout ends with one JSON summary line; per-query status goes
to stderr.

--resume PRIOR_LOG skips names already green in a prior run's stderr
log. The match is anchored to the exact ok-line format (a FAIL line
whose error text happens to contain ": ok (" can never resume-pass),
and the log must carry this tool's sf_dir header for the SAME fixture
dir — resuming across fixtures is refused (r9 ADVICE).

--ansi runs the Spark side with spark.sql.ansi.enabled=true. The
engine policy is permissive (non-ANSI, session.py), so this is NOT a
correctness gate — it is an overflow DETECTOR: integer wraparound
that non-ANSI silently swallows (the x213 rank-difference square)
becomes a loud ARITHMETIC_OVERFLOW at the exact expression. Triage
each hit into (a) a genuine width bug — fix with an explicit
cast-before-multiply — or (b) a benign permissive-semantics
dependency (try_*, null-on-miss element_at, lenient casts) that ANSI
flags by design.
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO_ROOT)
sys.path.insert(0, os.path.join(REPO_ROOT, "tests"))


def parse_resume_log(path: str) -> tuple[str | None, str | None, set[str]]:
    """Extract (header sf_dir, header ansi, green names) from a prior
    stderr log.

    Anchored to the exact ok-line format (r9 ADVICE: a bare ': ok ('
    substring match could resume-pass a FAIL line whose truncated
    error text contains it). Resumed names' own lines re-match, so
    chained resumes work.

    Two r10-ADVICE hardenings: (1) the header's ``ansi=`` flag is
    captured so a resume can refuse a mode mismatch — the ANSI run is
    the overflow DETECTOR, so green-skipping queries that only ran
    non-ANSI would silently weaken exactly the evidence the mode
    exists to produce; (2) the green set RESETS at every header line,
    so a log holding two concatenated runs (appended with ``>>``)
    resumes only the names green under the LAST header — the one
    whose (sf_dir, ansi) the caller validates — instead of unioning
    names that were only green against a different fixture or mode.
    """
    import re

    log_sf = None
    log_ansi = None
    green: set[str] = set()
    with open(path) as f:
        for line in f:
            mh = re.match(r"\[differential\] sf_dir=(\S+) ansi=(\S+)", line)
            if mh:
                log_sf = mh.group(1)
                log_ansi = mh.group(2)
                green = set()  # a new run starts: prior greens are
                # that run's evidence, not this one's
            m = re.match(r"^\[ *\d+/\d+\] (\S+): ok \(", line)
            if m:
                green.add(m.group(1))
    return log_sf, log_ansi, green


def main() -> None:
    import __spark_entry__ as entry
    from oracle import compare, run_duck, run_spark

    from capgemini_himss24_fhirbulkdata_demo_spark.session import get_spark

    args = sys.argv[1:]
    skips: set[str] = set()
    resumed: set[str] = set()
    prefixes: list[str] = []
    out_path = None
    resume_path = None
    ansi = "--ansi" in args
    args = [a for a in args if a != "--ansi"]
    pos: list[str] = []
    i = 0
    while i < len(args):
        if args[i] == "--skip":
            skips.add(args[i + 1])
            i += 2
        elif args[i] == "--prefix":
            prefixes.append(args[i + 1])
            i += 2
        elif args[i] == "--out":
            out_path = args[i + 1]
            i += 2
        elif args[i] == "--resume":
            resume_path = args[i + 1]
            i += 2
        else:
            pos.append(args[i])
            i += 1
    if not pos:
        print(
            "usage: full_differential.py SF_DIR [--skip N]... [--prefix P]..."
            " [--out J] [--ansi] [--resume PRIOR_LOG]",
            file=sys.stderr,
        )
        sys.exit(2)
    sf_dir = pos[0]

    if resume_path:
        # don't re-run names already green in a prior run's stderr
        # log; the log's sf_dir header must match this run's fixture —
        # cross-fixture resume is refused (r9 ADVICE) — and its ansi=
        # flag must match this run's mode (r10 ADVICE: resuming a
        # non-ANSI log into an --ansi run would report "zero overflow
        # trips" for queries that never executed under the detector).
        log_sf, log_ansi, resumed = parse_resume_log(resume_path)
        if log_sf is None or log_ansi is None:
            print(
                f"--resume: {resume_path} has no '[differential] "
                "sf_dir=... ansi=...' header (pre-r11 log format) — "
                f"cannot verify it ran against {sf_dir} in "
                f"ansi={ansi} mode; refusing to resume",
                file=sys.stderr,
            )
            sys.exit(2)
        if os.path.normpath(log_sf) != os.path.normpath(sf_dir):
            print(
                f"--resume: log {resume_path} ran against {log_sf}, "
                f"this run targets {sf_dir} — refusing cross-fixture resume",
                file=sys.stderr,
            )
            sys.exit(2)
        if log_ansi != str(ansi):
            print(
                f"--resume: log {resume_path} ran with ansi={log_ansi}, "
                f"this run is ansi={ansi} — refusing cross-mode resume "
                "(the ANSI run is the overflow detector; its greens "
                "must come from ANSI executions)",
                file=sys.stderr,
            )
            sys.exit(2)

    # engine session policy (UTC tz, permissive casts, nanosAsLong —
    # r9 ADVICE: a bare builder session lacks the UTC timezone
    # session.py documents as required for stable timestamp collection
    # against the DuckDB oracle, making ladder runs host-TZ-dependent)
    spark = get_spark(
        master=f"local[{os.cpu_count()}]",
        extra_conf={
            "spark.sql.ansi.enabled": "true" if ansi else "false",
            "spark.driver.memory": "12g",
            "spark.ui.showConsoleProgress": "false",
        },
    )
    spark.sparkContext.setLogLevel("ERROR")
    print(f"[differential] sf_dir={sf_dir} ansi={ansi}", file=sys.stderr)

    qs = entry.queries()
    osql = entry.oracle_sql()
    names = [
        n
        for n in qs
        if (not prefixes or any(n.startswith(p) for p in prefixes))
    ]
    failures: dict[str, list[str]] = {}
    timings: dict[str, float] = {}
    n_ok = n_skipped = n_no_oracle = n_resumed = 0
    for i, name in enumerate(sorted(names), 1):
        tag = f"[{i:3d}/{len(names)}] {name}"
        if name in skips:
            n_skipped += 1
            print(f"{tag}: SKIP (documented exclusion)", file=sys.stderr)
            continue
        if name in resumed:
            n_resumed += 1
            print(f"{tag}: ok (resumed from prior log)", file=sys.stderr)
            continue
        if name not in osql:
            n_no_oracle += 1
            print(f"{tag}: rows-only (no oracle)", file=sys.stderr)
            continue
        t0 = time.monotonic()
        try:
            errs = compare(
                name,
                run_spark(qs[name], spark, sf_dir),
                run_duck(osql[name], sf_dir),
            )
        except Exception as e:  # surface, keep running the rest
            errs = [f"exception: {type(e).__name__}: {e}"]
        dt = time.monotonic() - t0
        timings[name] = round(dt, 2)
        if errs:
            failures[name] = errs
            print(f"{tag}: FAIL ({dt:.1f}s) {'; '.join(errs)[:400]}", file=sys.stderr)
        else:
            n_ok += 1
            print(f"{tag}: ok ({dt:.1f}s)", file=sys.stderr)
    summary = {
        "sf_dir": sf_dir,
        "ansi": ansi,
        "total": len(names),
        "ok": n_ok,
        "resumed_ok": n_resumed,
        "failures": failures,
        "skipped": sorted(skips & set(names)),
        "rows_only": n_no_oracle,
        "slowest": dict(
            sorted(timings.items(), key=lambda kv: -kv[1])[:15]
        ),
        "total_sec": round(sum(timings.values()), 1),
    }
    if out_path:
        with open(out_path, "w") as f:
            json.dump(summary, f, indent=1)
    print(json.dumps(summary))
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
