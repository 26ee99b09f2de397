#!/usr/bin/env python3
"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints
ONE JSON line: {"metric": ..., "value": N, "unit": "sec", "queries":
{...}, "sf": ...}.

Each query is fully executed (count + light collect via ``write to
noop``-style consumption: we use ``df.collect()`` since headline
results are small aggregates). Timing includes plan + execution, not
session startup; a warmup query primes the JVM/codegen.
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO_ROOT = os.path.dirname(os.path.abspath(__file__))
if REPO_ROOT not in sys.path:
    sys.path.insert(0, REPO_ROOT)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")

# Headline set: the scan/join/agg/window workhorses (fact-table-heavy),
# plus the extension pipelines once registered.
HEADLINE = [
    "q01_pricing_summary",
    "q03_top_revenue_orders",
    "q04_semi_join",
    "q05_regional_revenue",
    "q06_revenue_delta",
    "q07_rollup",
    "q12_global_agg",
    "q16_nation_trade_pairs",
    "q18_big_orders",
    "q19_order_count_distribution",
    "q24_range_join",
    "q25_asof_join",
    "q29_percentiles",
    "q31_topk_per_group",
    "q83_market_share",
    "q37_dedup_first_wins",
    "q64_from_json_map",
]
# Extension headliners (added as they land).
HEADLINE += [
    "x01_dedup_exact",
    "x02_dedup_minhash",
    "x03_simhash",
    "x06_dedup_embedding",
    "x10_knn_bruteforce",
    "x11_knn_lsh",
    "x20_text_quality",
    "x23_fingerprint",
    "x25_tfidf",
    "x26_vocabulary",
    "x42_decontamination",
    "x30_tumbling_window",
    "x32_session_window",
    "x16_semdedup",
    "x46_lm_score",
    "x44_pii_redaction",
    "x34_time_rollup",
    "q92_nation_pair_volume",
    "q96_disjunctive_predicate",
]
# Round-4 additions (sub-document dedup family; media/ingest paths).
HEADLINE += [
    "x19_paragraph_removal",
    "x17_repetition_removal",
    "x64_frame_sample",
    "x66_incremental_dedup",
]
# Round-5 additions (PassJoin similarity join; corpus statistics).
HEADLINE += [
    "x85_typo_pairs",
    "x87_dsir_weights",
    "x88_dup_spans",
    "x92_source_ngram_overlap",
]
# Round-5 closing batch (span removal; PQ serving; sketches; graph).
HEADLINE += [
    "x94_span_removal",
    "x96_pq_adc_search",
    "x97_cms_heavy_hitters",
    "x100_pagerank_nations",
]
# Round-5 statistical-analytics representatives (widest shuffles of
# the x151+ family: corpus trigram distinct; sessionized pair join).
HEADLINE += [
    "x154_distinct_ngrams",
    "x173_session_cooccurrence",
]


def bench_fhir_pipeline(spark, n_records: int = 100_000) -> dict:
    """Reference-workload throughput: the BCDA EOB transform (the
    reference's heaviest branch) over synthetic NDJSON, Spark pipeline
    vs the reference-equivalent single-threaded Python loop on the
    SAME data — the goal's 'matches-or-beats single-node throughput'
    measured directly.
    """
    import tempfile

    from capgemini_himss24_fhirbulkdata_demo_spark.sources import read_ndjson, write_ndjson
    from capgemini_himss24_fhirbulkdata_demo_spark.transforms import get_transform
    from capgemini_himss24_fhirbulkdata_demo_spark.transforms.benchdata import (
        RXNAV_BENCH,
        make_eob,
        write_eob_ndjson,
        write_eob_ndjson_dir,
    )
    from capgemini_himss24_fhirbulkdata_demo_spark.transforms.schemas import (
        RESOURCE_SCHEMAS,
        RXNAV_LOOKUP_SCHEMA,
    )

    tmp = tempfile.mkdtemp(prefix="fhirbench_")
    # Landing-DIR corpus (64 NDJSON files): a real bulk export is many
    # files (the reference iterates a manifest of them), and it's what
    # lets the DEFAULT 128 MB split conf parallelize the scan — the r6
    # single ~100 MB file ran a handful of parse tasks on 32 cores
    # under default confs (r6 verdict What's-wrong #2 structural fix).
    src = write_eob_ndjson_dir(os.path.join(tmp, "eobs_landing"), n_records)
    rx = spark.createDataFrame(
        [(k, v["name"], v["rxnorm"]) for k, v in sorted(RXNAV_BENCH.items())],
        RXNAV_LOOKUP_SCHEMA,
    )
    fn = get_transform("https://bcda.example", "ExplanationOfBenefit")

    # Warmup: the EOB struct schema has its own codegen/JIT footprint
    # the query-sweep warmup never touches — without this the first
    # timed run measures compilation (~7 s), not throughput.
    warm_src = write_eob_ndjson(os.path.join(tmp, "warm.ndjson"), 2_000)
    warm = read_ndjson(spark, warm_src, RESOURCE_SCHEMAS["ExplanationOfBenefit"])
    write_ndjson(fn(warm, rx), os.path.join(tmp, "warm_out"))

    # The sweep harness shrinks maxPartitionBytes/openCost for the
    # small sf0.1 parquet files; this section states DEFAULT scan
    # confs (the honest v4 methodology) — with the 64-file landing
    # dir the defaults parallelize naturally (file boundaries are
    # split boundaries). try/finally so an exception can't leak the
    # overridden confs into the streaming/shards sections (ADVICE r6).
    prev_mpb = spark.conf.get("spark.sql.files.maxPartitionBytes")
    prev_oc = spark.conf.get("spark.sql.files.openCostInBytes")
    spark.conf.set("spark.sql.files.maxPartitionBytes", str(128 * 1024 * 1024))
    spark.conf.set("spark.sql.files.openCostInBytes", str(4 * 1024 * 1024))
    try:
        # best-of-3 like the query sweep's best-of-2: the throughput
        # bench runs after ~70 query executions, so heap pressure from
        # the sweep can tax any single run; ask the JVM to collect
        # first and take the min as the steady-state number
        spark.sparkContext._jvm.System.gc()
        spark_sec = float("inf")
        first_run_sec = None
        for trial in range(3):
            t0 = time.perf_counter()
            df = read_ndjson(spark, src, RESOURCE_SCHEMAS["ExplanationOfBenefit"])
            write_ndjson(fn(df, rx), os.path.join(tmp, f"out{trial}"))
            elapsed = time.perf_counter() - t0
            if first_run_sec is None:
                first_run_sec = elapsed  # old (r2) single-run basis
            spark_sec = min(spark_sec, elapsed)

        # single-threaded reference-equivalent loop
        # (tests/fhir_oracle.py semantics) on a 1/10 sample,
        # extrapolated — running 100k records row-at-a-time takes
        # minutes, which is itself the finding
        sys.path.insert(0, os.path.join(REPO_ROOT, "tests"))
        import fhir_oracle

        sample = max(n_records // 10, 1)
        docs = [make_eob(i) for i in range(sample)]
        t0 = time.perf_counter()
        fhir_oracle.process(
            "https://bcda.example", "ExplanationOfBenefit", docs, RXNAV_BENCH
        )
        python_sec = (time.perf_counter() - t0) * (n_records / sample)
    finally:
        spark.conf.set("spark.sql.files.maxPartitionBytes", prev_mpb)
        spark.conf.set("spark.sql.files.openCostInBytes", prev_oc)

    return {
        "fhir_eob_records": n_records,
        "fhir_eob_spark_sec": round(spark_sec, 3),
        "fhir_eob_spark_rec_per_sec": round(n_records / spark_sec),
        # old-basis (r2: single timed run) number for cross-round
        # comparability — best-of-3 changed the measurement basis
        "fhir_eob_spark_sec_single_run_basis": round(first_run_sec, 3),
        "fhir_eob_rec_per_sec_single_run_basis": round(n_records / first_run_sec),
        "fhir_eob_python_sec_extrapolated": round(python_sec, 3),
        "fhir_eob_speedup_vs_single_thread": round(python_sec / spark_sec, 2),
    }


def bench_streaming(spark) -> dict:
    """Structured Streaming throughput: land the sf events table as
    parquet files, drain a watermarked tumbling-window aggregation
    with trigger(availableNow) through a foreachBatch sink, and report
    events/sec over the drain wall-clock. Measures the streaming
    execution path (file-source listing, micro-batch planning,
    stateful window store), not just the batch operators.
    """
    import tempfile

    from pyspark.sql import functions as F

    from capgemini_himss24_fhirbulkdata_demo_spark.catalog import load_table
    from capgemini_himss24_fhirbulkdata_demo_spark.streaming import (
        read_parquet_stream,
        tumbling_agg,
    )

    tmp = tempfile.mkdtemp(prefix="streambench_")
    landing = os.path.join(tmp, "landing")
    ck = os.path.join(tmp, "ck")
    ev = load_table(spark, SF_DIR, "events").withColumn(
        "ts", F.col("ts").cast("timestamp")
    )
    n_events = ev.count()
    # 8 files -> several list/plan cycles without file-per-row overhead
    ev.repartition(8).write.mode("overwrite").parquet(landing)
    schema = spark.read.parquet(landing).schema

    sink_rows = []

    def commit(batch_df, batch_id):
        sink_rows.append(batch_df.count())

    # State-store partition count is pinned from shuffle.partitions at
    # first checkpoint, and every micro-batch pays a state commit PER
    # PARTITION — at 32 partitions for ~7k windows of state that fixed
    # cost dominated the drain (15.7k ev/s in r2; 3x that at 8). Size
    # state partitions to state volume, not to the batch shuffle
    # default — same rule at cluster scale, just a bigger right-size.
    def drain(checkpoint: str) -> float:
        t0 = time.perf_counter()
        q = (
            tumbling_agg(
                read_parquet_stream(spark, landing, schema, max_files_per_trigger=2)
            )
            .writeStream.foreachBatch(commit)
            .outputMode("update")
            .option("checkpointLocation", checkpoint)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(300)
        return time.perf_counter() - t0

    # Old-basis (r2: session-default 32 state partitions, no-data
    # micro-batch included) drain first, for cross-round comparability
    # — the tuned basis below changed the measurement methodology.
    wall_default = drain(os.path.join(tmp, "ck_default"))
    default_rows = int(sum(sink_rows))
    sink_rows.clear()

    prev_parts = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "8")
    # availableNow appends a trailing no-data batch purely to advance
    # the watermark; in update mode it emits nothing — skip its
    # fixed cost in the drain measurement
    spark.conf.set("spark.sql.streaming.noDataMicroBatches.enabled", "false")
    spark.sparkContext._jvm.System.gc()
    try:
        wall = drain(ck)
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev_parts)
        spark.conf.set("spark.sql.streaming.noDataMicroBatches.enabled", "true")
    return {
        "streaming_events": n_events,
        "streaming_drain_sec": round(wall, 3),
        "streaming_events_per_sec": round(n_events / wall),
        "streaming_events_per_sec_default_basis": round(n_events / wall_default),
        "streaming_output_rows": int(sum(sink_rows)),
        "streaming_output_rows_default_basis": default_rows,
    }


def bench_training_shards(spark) -> dict:
    """Training-handoff export throughput: shard the sf documents
    table with ``write_training_shards`` (range-partitioned, sorted,
    footer-counted manifest) and report docs/sec plus the shard-size
    spread (max/min rows — range partitioning should keep shards
    balanced on the uniform doc_id key)."""
    import shutil
    import tempfile

    from capgemini_himss24_fhirbulkdata_demo_spark.catalog import load_table
    from capgemini_himss24_fhirbulkdata_demo_spark.dataprep import (
        write_training_shards,
    )

    tmp = tempfile.mkdtemp(prefix="shardbench_")
    docs = load_table(spark, SF_DIR, "documents")
    n_docs = docs.count()
    try:
        spark.sparkContext._jvm.System.gc()
        best = float("inf")
        manifest = None
        for trial in range(2):
            out = os.path.join(tmp, f"shards{trial}")
            t0 = time.perf_counter()
            manifest = write_training_shards(docs, out, "doc_id", n_shards=8)
            best = min(best, time.perf_counter() - t0)
        rows = [s["rows"] for s in manifest["shards"]]
        return {
            "shards_docs": n_docs,
            "shards_n": manifest["n_shards"],
            "shards_write_sec": round(best, 3),
            "shards_docs_per_sec": round(n_docs / best),
            "shards_rows_min": min(rows),
            "shards_rows_max": max(rows),
            "shards_spread": round(max(rows) / max(min(rows), 1), 3),
        }
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


# Measurement-basis version, reported in the output JSON so rounds are
# comparable (ADVICE r3): v2 = r3's basis (best-of-2 sweep after
# sf0.001 warmup; FHIR gc + best-of-3; streaming tuned confs).
# v3 adds: System.gc() before the timed sweep (warm-up parity for the
# first timed query), old-basis companions (FHIR single-run,
# streaming default-conf drain run BEFORE the tuned one), and the
# training-shards section.
METHODOLOGY = {
    "version": 5,
    "query_sweep": "sf0.001 warmup per plan, System.gc(), untimed "
                   "target-sf primer of the first query, best-of-2 at target sf",
    "fhir": "warmup + System.gc(), best-of-3; single-run basis also "
            "reported; default scan-split confs (restored via "
            "try/finally); v5: input is a 64-file NDJSON landing dir "
            "(the reference iterates a manifest of files) so the "
            "default 128 MB split conf parallelizes naturally — v4's "
            "single ~100 MB file under-parallelized on 32 cores",
    "streaming": "default-conf drain first (old basis), then gc + "
                 "state-partitions=8, noDataMicroBatches off",
    "shards": "best-of-2 write_training_shards, 8 shards on doc_id",
}


def main() -> None:
    from capgemini_himss24_fhirbulkdata_demo_spark.queries import QUERIES
    from capgemini_himss24_fhirbulkdata_demo_spark.session import get_spark

    # Refresh the driver-coverage ledger (pre-bench hook: the driver
    # runs bench every round, so COVERAGE.md tracks CORRECTNESS_r*)
    try:
        import __spark_entry__

        __spark_entry__.write_coverage_md()
    except Exception as e:  # ledger is advisory; never fail the bench
        print(f"[bench] coverage ledger skipped: {e}", file=sys.stderr)

    # Local-fixture scan tuning: the sf0.1 files are 0.1–11 MB, far
    # below the 128 MB default split, so scans would run 1–3 tasks.
    # Shrinking openCost/maxPartitionBytes spreads them over the 32
    # cores (10–35% per-query win). At cluster scale (multi-GB files)
    # the defaults are correct — this is bench-harness config, not
    # engine policy.
    n_shuffle = int(CPUS) if CPUS.isdigit() else (os.cpu_count() or 8)
    spark = get_spark(
        master=f"local[{CPUS}]",
        shuffle_partitions=n_shuffle,
        extra_conf={
            "spark.sql.files.openCostInBytes": "262144",
            "spark.sql.files.maxPartitionBytes": "2097152",
            "spark.ui.showConsoleProgress": "false",
        },
    )
    spark.sparkContext.setLogLevel("ERROR")

    sf = SF_DIR.rstrip("/").rsplit("sf", 1)[-1]
    names = [n for n in HEADLINE if n in QUERIES]

    # Warmup: run every headline query once at the smallest fixture so
    # whole-stage-codegen JIT is primed per plan shape — the timed
    # sweep then measures steady-state execution, not compilation
    # (cold-vs-warm is ~2x on the heavier plans). Falls back to the
    # target dir when sf0.001 is absent.
    warm_dir = os.path.join(os.path.dirname(SF_DIR.rstrip("/")), "sf0.001")
    if not os.path.isdir(warm_dir):
        warm_dir = SF_DIR

    def run_once(name: str, sf: str) -> None:
        df = QUERIES[name](spark, sf)
        df.collect()
        # queries that persist intermediates attach them for release —
        # a 27-query sweep must not accumulate cached frames
        for dep in getattr(df, "_cached_deps", []):
            dep.unpersist()

    t_warm = time.perf_counter()
    for name in names:
        t0 = time.perf_counter()
        run_once(name, warm_dir)
        print(f"[bench] warmup {name}: {time.perf_counter()-t0:.2f}s", file=sys.stderr)
    print(f"[bench] warmup total: {time.perf_counter()-t_warm:.1f}s", file=sys.stderr)

    # Warm-up parity for the first timed query (r3's q01 +24%
    # regression): the warmup pass leaves the heap full of young
    # garbage whose collection otherwise lands on whichever query runs
    # first — same System.gc() the FHIR/streaming sections already do.
    # Additionally, one untimed TARGET-scale primer of the first
    # query: the sf0.001 warmup runs 1–2 tiny tasks and does not push
    # the vectorized-reader/agg loops over C2's invocation thresholds,
    # so the first target-scale execution still pays JIT ramp
    # (measured: 1.9 → 1.3 s over consecutive q01 runs in a fresh
    # session). The primer absorbs that ramp; best-of-2 then measures
    # steady state.
    spark.sparkContext._jvm.System.gc()
    if names:
        run_once(names[0], SF_DIR)

    # Best-of-2 per query: one timed run can catch a GC pause or an
    # unrelated load spike on a shared box; the min of two back-to-back
    # runs is the steady-state number (plans are already JIT-warmed by
    # the sf0.001 pass above). The reported total is the sum of mins.
    per_query: dict[str, float] = {}
    for name in names:
        best = float("inf")
        for _ in range(2):
            t0 = time.perf_counter()
            run_once(name, SF_DIR)
            best = min(best, time.perf_counter() - t0)
        per_query[name] = round(best, 3)
        print(f"[bench] timed {name}: {best:.2f}s", file=sys.stderr)
    total = round(sum(per_query.values()), 3)

    t0 = time.perf_counter()
    fhir = bench_fhir_pipeline(spark)
    print(f"[bench] fhir pipeline: {time.perf_counter()-t0:.1f}s", file=sys.stderr)
    t0 = time.perf_counter()
    streaming = bench_streaming(spark)
    print(f"[bench] streaming: {time.perf_counter()-t0:.1f}s", file=sys.stderr)
    t0 = time.perf_counter()
    shards = bench_training_shards(spark)
    print(f"[bench] training shards: {time.perf_counter()-t0:.1f}s", file=sys.stderr)

    payload = {
        "metric": "headline_query_sweep_sec",
        "value": total,
        "unit": "sec",
        "queries": per_query,
        "fhir_pipeline": fhir,
        "streaming": streaming,
        "training_shards": shards,
        "methodology": METHODOLOGY,
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
    }
    print(json.dumps(payload))
    # Persist the FULL payload as a repo file: the driver's 2000-char
    # stdout tail truncated the per-query timings two rounds running
    # (BENCH_r04/r05 lost the first ~40 entries), which breaks
    # cross-round per-query regression tracking. Round number =
    # latest driver-recorded BENCH_r*.json + 1 (the driver writes
    # BENCH_rN after this run completes).
    try:
        import glob as _glob
        import re as _re

        rounds = [
            int(m.group(1))
            for p in _glob.glob(os.path.join(REPO_ROOT, "BENCH_r*.json"))
            if (m := _re.search(r"BENCH_r(\d+)\.json$", p))
        ]
        rnd = (max(rounds) if rounds else 0) + 1
        local_path = os.path.join(REPO_ROOT, f"BENCH_LOCAL_r{rnd}.json")
        with open(local_path, "w") as f:
            json.dump(payload, f, indent=1, sort_keys=True)
        print(f"[bench] full payload -> {local_path}", file=sys.stderr)
    except Exception as e:  # persistence is advisory; never fail the bench
        print(f"[bench] local payload skipped: {e}", file=sys.stderr)
    # Tail-capture hardening: the driver records only the last ~2000
    # chars of stdout, which truncated BENCH_r04's big JSON line and
    # lost the sweep total + first 8 query timings. A compact summary
    # printed LAST keeps the headline parseable from the tail alone.
    print(
        "BENCH_SUMMARY "
        + json.dumps(
            {
                "metric": "headline_query_sweep_sec",
                "value": total,
                "unit": "sec",
                "n_queries": len(per_query),
                "fhir_rec_per_sec": fhir.get("fhir_eob_spark_rec_per_sec"),
                "streaming_ev_per_sec": streaming.get(
                    "streaming_events_per_sec"
                ),
                "methodology": METHODOLOGY,
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
            }
        )
    )


if __name__ == "__main__":
    main()
