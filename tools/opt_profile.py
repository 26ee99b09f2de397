#!/usr/bin/env python3
"""Round-11 optimization profiler: per-query wall time + job/stage/task
counts + formatted plans, under the bench session policy.

Methodology mirrors bench.py (same session confs, sf0.001 per-plan
warmup, timed reps at the target SF with ``collect()``), adding the
instrumentation bench.py deliberately omits:

- per-query Spark JOB / STAGE / TASK counts via the status tracker
  (each timed run executes under a unique job group) — the local-mode
  proxy for "how many scheduling round-trips does this plan cost";
- optional noop-sink timing (``--noop``; guide §1.4) so a query's
  compute can be isolated from its collect;
- ``explain("formatted")`` written to ``plans/r11/<name>_<suffix>.txt``
  for the before/after plan evidence the round must commit.

Usage:
  python tools/opt_profile.py --names x56_dup_cluster_profile,x16_semdedup
  python tools/opt_profile.py --top 20          # slowest 20 from BENCH_LOCAL_r11
  python tools/opt_profile.py --names headline --reps 3 --suffix before
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO_ROOT not in sys.path:
    sys.path.insert(0, REPO_ROOT)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")


def build_session(conf_overrides: dict[str, str] | None = None):
    from capgemini_himss24_fhirbulkdata_demo_spark.session import get_spark

    n_shuffle = int(CPUS) if CPUS.isdigit() else (os.cpu_count() or 8)
    extra = {
        "spark.sql.files.openCostInBytes": "262144",
        "spark.sql.files.maxPartitionBytes": "2097152",
        "spark.ui.showConsoleProgress": "false",
    }
    extra.update(conf_overrides or {})
    spark = get_spark(
        master=f"local[{CPUS}]",
        shuffle_partitions=n_shuffle,
        extra_conf=extra,
    )
    spark.sparkContext.setLogLevel("ERROR")
    return spark


def run_once(spark, QUERIES, name, sf_dir, noop=False):
    df = QUERIES[name](spark, sf_dir)
    if noop:
        df.write.format("noop").mode("overwrite").save()
    else:
        df.collect()
    for dep in getattr(df, "_cached_deps", []):
        dep.unpersist()


def counted_run(spark, QUERIES, name, sf_dir, group, noop=False):
    sc = spark.sparkContext
    sc.setJobGroup(group, name)
    t0 = time.perf_counter()
    run_once(spark, QUERIES, name, sf_dir, noop=noop)
    elapsed = time.perf_counter() - t0
    sc.setJobGroup(None, None)
    tracker = sc.statusTracker()
    job_ids = tracker.getJobIdsForGroup(group) or []
    n_stages = n_tasks = 0
    for jid in job_ids:
        info = tracker.getJobInfo(jid)
        if info is None:
            continue
        for sid in info.stageIds:
            sinfo = tracker.getStageInfo(sid)
            if sinfo is not None:
                n_stages += 1
                n_tasks += sinfo.numTasks
    return elapsed, len(job_ids), n_stages, n_tasks


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--names", default=None, help="comma list | headline")
    ap.add_argument("--top", type=int, default=None,
                    help="slowest N from BENCH_LOCAL_r11.json")
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--sf-dir", default=SF_DIR)
    ap.add_argument("--noop", action="store_true",
                    help="time with the noop sink instead of collect()")
    ap.add_argument("--plans-dir", default=os.path.join(REPO_ROOT, "plans", "r11"))
    ap.add_argument("--suffix", default=None,
                    help="write explain('formatted') to plans/r11/<name>_<suffix>.txt")
    ap.add_argument("--out", default=None, help="JSON output path")
    ap.add_argument(
        "--conf", action="append", default=[],
        help="extra session conf k=v (repeatable) — for conf experiments",
    )
    args = ap.parse_args()

    from capgemini_himss24_fhirbulkdata_demo_spark.queries import QUERIES

    if args.top:
        with open(os.path.join(REPO_ROOT, "BENCH_LOCAL_r11.json")) as f:
            prev = json.load(f)["queries"]
        names = [n for n, _ in sorted(prev.items(), key=lambda kv: -kv[1])][: args.top]
    elif args.names == "headline" or args.names is None:
        import bench

        names = [n for n in bench.HEADLINE if n in QUERIES]
    else:
        names = [n.strip() for n in args.names.split(",") if n.strip()]
        missing = [n for n in names if n not in QUERIES]
        if missing:
            ap.error(f"unknown queries: {missing}")

    overrides = dict(c.split("=", 1) for c in args.conf)
    spark = build_session(overrides)
    warm_dir = os.path.join(os.path.dirname(args.sf_dir.rstrip("/")), "sf0.001")
    if not os.path.isdir(warm_dir):
        warm_dir = args.sf_dir

    results: dict[str, dict] = {}
    for name in names:
        run_once(spark, QUERIES, name, warm_dir)          # codegen warmup
        run_once(spark, QUERIES, name, args.sf_dir)       # target-scale warmup
        times, jobs, stages, tasks = [], 0, 0, 0
        for rep in range(args.reps):
            elapsed, j, s, t = counted_run(
                spark, QUERIES, name, args.sf_dir, f"{name}#r{rep}", noop=args.noop
            )
            times.append(elapsed)
            jobs, stages, tasks = j, s, t  # counts are per-run; keep last
        row = {
            "min_sec": round(min(times), 3),
            "reps": [round(t, 3) for t in times],
            "jobs": jobs,
            "stages": stages,
            "tasks": tasks,
        }
        results[name] = row
        print(
            f"[prof] {name}: min {row['min_sec']:.3f}s  "
            f"jobs={jobs} stages={stages} tasks={tasks}",
            file=sys.stderr,
        )
        if args.suffix:
            os.makedirs(args.plans_dir, exist_ok=True)
            from capgemini_himss24_fhirbulkdata_demo_spark.plans.inspect import (
                explain_str,
            )

            df = QUERIES[name](spark, args.sf_dir)
            with open(
                os.path.join(args.plans_dir, f"{name}_{args.suffix}.txt"), "w"
            ) as f:
                f.write(explain_str(df))
            for dep in getattr(df, "_cached_deps", []):
                dep.unpersist()

    total = round(sum(r["min_sec"] for r in results.values()), 3)
    payload = {"total_min_sec": total, "sf_dir": args.sf_dir,
               "noop": args.noop, "queries": results}
    print(json.dumps(payload))
    if args.out:
        with open(args.out, "w") as f:
            json.dump(payload, f, indent=1, sort_keys=True)


if __name__ == "__main__":
    main()
