"""Empirical scaling probe: time representative queries at 1x and 2x
rows under IDENTICAL file layout, and report the slope t(2x)/t(1x).

Why layout-matched: the driver fixtures are single parquet files, so
a naively doubled copy written as N files gains parallelism and the
slope reads as <1. This probe rewrites BOTH scales with the same
partition counts so the slope isolates data volume.

The 2x corpus doubles fact tables with offset keys; the second
documents copy gets a perturbed leading token so fingerprints and
shingles differ (otherwise every doc acquires an exact dup and the
dedup families measure a different problem).

Usage:  python tools/scale_probe.py [sf_dir] [--x4] [--ops] [prefix ...]
Writes probe datasets under /tmp/scale_probe_sf0{1,2} and prints a
table. Ideal linear slope is <=2.0; fixed overhead pulls observed
slopes down; anything >2 flags super-linear candidate growth.

--ops probes OPERATOR-level paths that have no registered query
(currently the 64-bit SimHash pair operator, r9 verdict ask #5).
These build their own corpora: the standard probe's one-token
perturbation keeps copies within Hamming<=3 of each other — a 64-bit
SimHash probe on it would measure cross-copy FOUND-PAIR growth
(quadratic in copies, true output) instead of corpus growth, so the
op probe salts EVERY token per copy (signatures ~32 bits apart, zero
cross-copy pairs) and the slope isolates the banded join's cost.

--x4 probes 1x vs 4x instead (dataset under /tmp/scale_probe_sf04).
Two doublings separate growth classes a single doubling can't:
n^1.5 shows a 2x slope of 2.83 (borderline) but a 4x slope of 8.0
(unmistakable); n log n lands ~4.4 at 4x vs ~2.2 at 2x. Fixed
overhead deflates both, so thresholds are <=4 clean, 4-5 log-class,
>5 super-linear candidate.
"""

from __future__ import annotations

import glob
import os
import shutil
import sys
import time

QUERIES = [
    "q01_pricing_summary",
    "q03_top_revenue_orders",
    "q37_dedup_first_wins",
    "x02_dedup_minhash",
    "x16_semdedup",
    "x42_decontamination",
    "x64_frame_sample",
    "x46_lm_score",
    # r5 additions (VERDICT r4 #7): the ops whose cost model is least
    # obvious — composed dedup, fuzzy decontamination, the rewritten
    # PassJoin typo join, and the footer-only storage audit.
    "x72_dedup_retention",
    "x76_fuzzy_decontamination",
    "x85_typo_pairs",
    "x86_parquet_storage_audit",
    # r5 corpus-stats additions with non-trivial join shapes: the
    # gram-keyed span scan and the cross-source containment matrix.
    "x88_dup_spans",
    "x92_source_ngram_overlap",
    # r5 closing-batch additions: the sliding-span removal (heaviest
    # explode in the repo), the PQ ADC scan, the CMS sketch build,
    # and the iterative fixed-point PageRank (edge distillation is
    # its fact-sized stage).
    "x94_span_removal",
    "x96_pq_adc_search",
    "x97_cms_heavy_hitters",
    "x100_pagerank_nations",
    # second r5 closing sweep: the composed IVF-PQ search, the
    # Apriori pair miner (bounded candidate space), the KS drift
    # grid, and the cascaded re-aggregation.
    "x105_ivfpq_search",
    "x111_token_association",
    "x112_source_drift_ks",
    "x110_reaggregated_rollup",
    # r5 analytics-family additions: the four with the widest
    # shuffles in the statistical/audit batch — corpus-wide trigram
    # distinct, token-keyed full-outer half comparison, global
    # type-table running sum, and sessionized pair join.
    "x154_distinct_ngrams",
    "x175_emerging_terms",
    "x181_vocab_coverage",
    "x173_session_cooccurrence",
    # late-r5: the five-codec round-trip matrix — compute-bound
    # narrow map, slope should track doc count linearly.
    "x343_codec_matrix",
    # sixth wave: the zone-map audit's deliberate total-order stage,
    # the PIT interval join (per-user residual doubles with events),
    # the rank-sum AUC (one sort per source group), and the
    # batch-bounded contrastive self-join.
    "x347_zonemap_effectiveness",
    "x350_pit_feature_join",
    "x349_roc_auc",
    "x351_inbatch_negatives",
    # r6 (VERDICT r5 #7): the widest x151+ shuffles not yet probed —
    # the ordered-edge 3-way triangle join, the k-round Bellman-Ford
    # unroll, and the gap-sessionization double window.
    "x346_triangle_count",
    "x348_cheapest_route",
    "x162_session_depth",
    # r7 (invariant-form conversions): these queries now carry their
    # exact twin in-query — q56 runs two countDistincts (Expand, 2x
    # input) beside the HLL partials; x74 adds a region-grain
    # countDistinct + 5-row join beside the sketch rollup.
    "q56_approx_distinct",
    "q72_percentiles_approx",
    "x74_hll_rollup",
    # r8 (first-time bench headliners): the BM25 inverted-index join,
    # the x02-composed connected-components cluster profile (the
    # round's most expensive sweep query), the IVF recall eval
    # (probed search × brute-force truth), the CCNet-style
    # perplexity-bucket partitioner, and the BPE merge application.
    "x47_bm25_search",
    "x56_dup_cluster_profile",
    "x59_ivf_recall",
    "x78_ccnet_partition",
    "x80_bpe_segment",
    # r9 (first-time bench headliners, r8 verdict ask #4): RAG
    # chunking (per-doc sentence explode), Zipf-slope regression
    # (corpus term agg + rank window over the bounded top-K head),
    # winnowing fingerprints (sliding k-gram window explode), the
    # multimodal resize grid (Arrow-batched decode map), PQ code
    # assignment (broadcast codebook fold), and the Benford
    # first-digit audit (one partial agg).
    "x81_rag_chunks",
    "x89_zipf_slope",
    "x90_winnowing",
    "x93_resize_grid",
    "x95_pq_codes",
    "x151_benford_audit",
    # r11 (first-time bench headliners, r10 verdict ask #3): run-length
    # text redundancy (per-doc token window), the skyline dominance
    # prune (rank-window over the part dim), the launch-cohort vitality
    # panel (two year-grain fact passes; carries an r10 exact-integer
    # ratio rewrite), the payload Benford audit (digit-grid agg), and
    # the exec-summary multi-leg join panel (five independent
    # aggregates joined on literal keys).
    "x223_run_redundancy",
    "x225_price_revenue_skyline",
    "x240_launch_cohort_vitality",
    "x246_payload_benford",
    "x260_exec_summary",
]

_PARTS = {"lineitem": 8, "orders": 4, "documents": 4, "embeddings": 4, "events": 4}
_DIMS = ("region", "nation", "customer", "supplier", "part")


def build(spark, src: str, dst: str, copies: int = 1) -> None:
    from pyspark.sql import functions as F

    os.makedirs(dst, exist_ok=True)
    for t in _DIMS:
        shutil.copy(f"{src}/{t}.parquet", f"{dst}/{t}.parquet")
    keys = {
        "lineitem": "l_orderkey",
        "orders": "o_orderkey",
        "documents": "doc_id",
        "embeddings": "vec_id",
        "events": "event_id",
    }
    for t, n in _PARTS.items():
        base = spark.read.parquet(f"{src}/{t}.parquet")
        df = base
        if copies > 1:
            k = keys[t]
            off = base.agg(F.max(k)).collect()[0][0] + 1
            for i in range(1, copies):
                nxt = base.withColumn(k, F.col(k) + F.lit(i * off))
                if t == "documents":
                    # distinct leading token per copy so no copy pair
                    # shares fingerprints/shingles (dedup families
                    # must measure corpus growth, not found-dup count)
                    nxt = nxt.withColumn(
                        "text",
                        F.concat(F.lit(f"cpy{chr(65 + i)} "), F.col("text")),
                    )
                df = df.unionByName(nxt)
        out = f"{dst}/{t}.parquet"
        if os.path.isdir(out):
            shutil.rmtree(out)
        df.repartition(n).write.mode("overwrite").parquet(out + "_d")
        os.rename(out + "_d", out)


def _probe_simhash64(spark, src: str) -> None:
    """1x-vs-2x slope for operators/dedup.py::simhash_pairs64.

    Per-copy token salting (every token prefixed with the copy tag)
    pushes cross-copy signatures ~32 bits apart — measured r10:
    exactly 0 cross-copy pairs at hamming_max=3, so candidate volume
    scales with the corpus, not copies². Caveat (measured, r10): the
    WITHIN-copy pair count resamples with the salted hash draw — the
    fixture docs average only ~23 distinct tokens, so per-bit votes
    are small sums and the near-threshold (hamming 4–6) population is
    large; copy 2's fresh draw yielded 230k internal pairs vs copy
    1's 98k (popcount distributions healthy, ~26±3.8 both). The
    probe's slope is therefore CONSERVATIVE: r10 measured 1.41 while
    true output grew 3.3x.
    """
    from pyspark.sql import functions as F

    from capgemini_himss24_fhirbulkdata_demo_spark.operators.dedup import (
        simhash_pairs64,
    )

    def build(dst: str, copies: int) -> None:
        docs = spark.read.parquet(f"{src}/documents.parquet")
        off = docs.agg(F.max("doc_id")).collect()[0][0] + 1
        df = docs
        for i in range(1, copies):
            salted = docs.withColumn(
                "doc_id", F.col("doc_id") + F.lit(i * off)
            ).withColumn(
                "text",
                F.array_join(
                    F.transform(
                        F.split(F.col("text"), " "),
                        lambda t: F.concat(F.lit(f"c{i}x"), t),
                    ),
                    " ",
                ),
            )
            df = df.unionByName(salted)
        if os.path.isdir(dst):
            shutil.rmtree(dst)
        df.repartition(4).write.mode("overwrite").parquet(dst)

    def run(d: str) -> tuple[float, int]:
        docs = spark.read.parquet(d)
        t0 = time.time()
        pairs = simhash_pairs64(docs, "doc_id", "text")
        n = pairs.count()
        for dep in getattr(pairs, "_cached_deps", []):
            dep.unpersist()
        return time.time() - t0, n

    d1, d2 = "/tmp/scale_probe_sh64_1", "/tmp/scale_probe_sh64_2"
    if not os.path.isdir(d1):
        build(d1, 1)
    if not os.path.isdir(d2):
        build(d2, 2)
    for d in (d1, d2):
        run(d)  # warm
    best, npairs = {}, {}
    for d in (d1, d2):
        ts = []
        for _ in range(2):
            t, n = run(d)
            ts.append(t)
            npairs[d] = n
        best[d] = min(ts)
    print(
        f"{'op:simhash64_pairs':28s} {best[d1]:6.2f} {best[d2]:6.2f} "
        f"{best[d2] / best[d1]:6.2f}   pairs {npairs[d1]} -> {npairs[d2]}"
    )


def main() -> None:
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from pyspark.sql import SparkSession

    import __spark_entry__ as entry

    argv = [a for a in sys.argv[1:] if a not in ("--x4", "--ops")]
    x4 = "--x4" in sys.argv[1:]
    ops = "--ops" in sys.argv[1:]
    src = argv[0] if argv else "/root/testdata/sf0.1"
    # optional name filters: probe only the listed queries (prefix
    # match), reusing previously built probe datasets if present;
    # --ops alone skips the query sweep entirely
    names = [n for n in QUERIES if not argv[1:] or any(
        n.startswith(p) for p in argv[1:]
    )]
    if ops and not argv[1:]:
        names = []
    spark = (
        SparkSession.builder.master(f"local[{os.cpu_count()}]")
        .config("spark.driver.memory", "12g")
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
        .config("spark.sql.shuffle.partitions", "32")
        .getOrCreate()
    )
    d1 = "/tmp/scale_probe_sf01"
    d2 = "/tmp/scale_probe_sf04" if x4 else "/tmp/scale_probe_sf02"
    if names:
        if not os.path.isdir(d1):
            build(spark, src, d1, copies=1)
        if not os.path.isdir(d2):
            build(spark, src, d2, copies=4 if x4 else 2)
    qs = entry.queries()
    for d in (d1, d2):
        for n in names:
            qs[n](spark, d).collect()  # warm
    hi = "t4x" if x4 else "t2x"
    print(f"{'query':28s} {'t1x':>6s} {hi:>6s} {'slope':>6s}")
    for n in names:
        best = {}
        for d in (d1, d2):
            ts = []
            for _ in range(2):
                t0 = time.time()
                qs[n](spark, d).collect()
                ts.append(time.time() - t0)
            best[d] = min(ts)
        print(
            f"{n:28s} {best[d1]:6.2f} {best[d2]:6.2f} {best[d2] / best[d1]:6.2f}"
        )
    if ops:
        _probe_simhash64(spark, src)
    spark.stop()


if __name__ == "__main__":
    main()
