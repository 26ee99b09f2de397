"""Measured sketch-vs-exact margins for the invariant-form gates.

The invariant-form queries (q56 approx distinct, q72 approx
percentiles, x74 HLL rollup) emit within-tolerance BOOLEANS; their
gates were pinned to error measured at sf0.001/0.01/0.1. Sketch error
is deterministic per corpus, so an unseen scale factor could trip a
gate and surface as a driver-red row indistinguishable from a real
regression (r7 ADVICE #1). This probe measures the ACTUAL error of
each gated quantity per scale factor and writes SKETCH_MARGINS.md —
the diagnosis ledger: if a gate ever trips at a new sf, compare the
new corpus's measured error here against the gate before treating it
as a regression.

Each probe mirrors the exact estimator call and gate arithmetic of
its query (cited per section); headroom = gate / measured error
(inf when measured error is 0).

Usage: python tools/sketch_margin_probe.py [sf_dir ...]
"""

from __future__ import annotations

import json
import os
import sys

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO_ROOT)

DEFAULT_SFS = (
    "/root/testdata/sf0.001",
    "/root/testdata/sf0.01",
    "/root/testdata/sf0.1",
)


def _headroom(gate: float, err: float) -> float | str:
    return round(gate / err, 2) if err > 0 else "inf"


def probe_q56(spark, sf_dir: str) -> list[dict]:
    """HLL++ approx_count_distinct vs exact (queries/relational2.py
    q56_approx_distinct; gate: |approx-exact| <= 10% relative;
    rsd=0.02 mirrors the query — r9 recalibration after the default
    rsd's error crossed the gate at the 8x corpus's 1.2M distinct)."""
    from pyspark.sql import functions as F

    from capgemini_himss24_fhirbulkdata_demo_spark.catalog import load_table

    li = load_table(spark, sf_dir, "lineitem")
    row = li.agg(
        F.countDistinct("l_orderkey").alias("eo"),
        F.countDistinct("l_partkey").alias("ep"),
        F.approx_count_distinct("l_orderkey", 0.02).alias("ao"),
        F.approx_count_distinct("l_partkey", 0.02).alias("ap"),
    ).first()
    out = []
    for quantity, exact, approx in (
        ("distinct l_orderkey", row["eo"], row["ao"]),
        ("distinct l_partkey", row["ep"], row["ap"]),
    ):
        err = abs(approx - exact) / exact
        out.append(
            {
                "query": "q56_approx_distinct",
                "quantity": quantity,
                "measured_rel_error": round(err, 5),
                "gate": "rel 0.10",
                "headroom": _headroom(0.10, err),
            }
        )
    return out


def probe_q72(spark, sf_dir: str) -> list[dict]:
    """GK approx_percentile vs exact percentile per l_returnflag
    (queries/relational2.py q72_percentiles_approx; gates: quantity
    p25/p50/p75 within 1.0 absolute, price p90 within 1% relative).
    Reports the worst group per quantity."""
    from pyspark.sql import functions as F

    from capgemini_himss24_fhirbulkdata_demo_spark.catalog import load_table

    li = load_table(spark, sf_dir, "lineitem")
    qty = F.col("l_quantity").cast("double")
    price = F.col("l_extendedprice").cast("double")
    rows = (
        li.groupBy("l_returnflag")
        .agg(
            F.expr(
                "approx_percentile(CAST(l_quantity AS DOUBLE), "
                "array(0.25, 0.5, 0.75), 10000)"
            ).alias("gk"),
            F.percentile(qty, F.lit([0.25, 0.5, 0.75])).alias("ex"),
            F.expr(
                "approx_percentile(CAST(l_extendedprice AS DOUBLE), 0.9, 10000)"
            ).alias("gkp"),
            F.percentile(price, F.lit(0.9)).alias("exp"),
        )
        .collect()
    )
    abs_err = max(
        abs(r["gk"][i] - r["ex"][i]) for r in rows for i in range(3)
    )
    rel_err = max(abs(r["gkp"] - r["exp"]) / r["exp"] for r in rows)
    return [
        {
            "query": "q72_percentiles_approx",
            "quantity": "quantity p25/p50/p75 (worst group)",
            "measured_abs_error": round(abs_err, 5),
            "gate": "abs 1.0",
            "headroom": _headroom(1.0, abs_err),
        },
        {
            "query": "q72_percentiles_approx",
            "quantity": "extendedprice p90 (worst group)",
            "measured_rel_error": round(rel_err, 5),
            "gate": "rel 0.01",
            "headroom": _headroom(0.01, rel_err),
        },
    ]


def probe_x74(spark, sf_dir: str) -> list[dict]:
    """DataSketches HLL union rollup vs exact per region
    (queries/relational4.py x74_hll_rollup; gate: 5% relative;
    lgConfigK=14 mirrors the query — r9 recalibration after the
    default lgK=12 measured 1.29x headroom at the 8x corpus).
    Reports the worst region."""
    from pyspark.sql import functions as F

    from capgemini_himss24_fhirbulkdata_demo_spark.catalog import load_table

    cust = (
        load_table(spark, sf_dir, "orders")
        .join(
            load_table(spark, sf_dir, "customer"),
            F.col("o_custkey") == F.col("c_custkey"),
        )
        .join(
            load_table(spark, sf_dir, "nation"),
            F.col("c_nationkey") == F.col("n_nationkey"),
        )
        .join(
            load_table(spark, sf_dir, "region"),
            F.col("n_regionkey") == F.col("r_regionkey"),
        )
        .select("r_name", "n_name", "o_custkey")
    )
    est = (
        cust.groupBy("r_name", "n_name")
        .agg(F.hll_sketch_agg("o_custkey", 14).alias("sk"))
        .groupBy("r_name")
        .agg(F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("est"))
    )
    exact = cust.groupBy("r_name").agg(
        F.countDistinct("o_custkey").alias("exact")
    )
    rows = est.join(exact, "r_name").collect()
    rel_err = max(abs(r["est"] - r["exact"]) / r["exact"] for r in rows)
    return [
        {
            "query": "x74_hll_rollup",
            "quantity": "distinct customers per region (worst region)",
            "measured_rel_error": round(rel_err, 5),
            "gate": "rel 0.05",
            "headroom": _headroom(0.05, rel_err),
        }
    ]


def main() -> None:
    from capgemini_himss24_fhirbulkdata_demo_spark.session import get_spark

    sf_dirs = sys.argv[1:] or list(DEFAULT_SFS)
    spark = get_spark(master="local[8]", shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")
    records = []
    for sf_dir in sf_dirs:
        sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
        for probe in (probe_q56, probe_q72, probe_x74):
            for rec in probe(spark, sf_dir):
                rec["sf"] = sf
                records.append(rec)
                print(f"[margin] {json.dumps(rec)}", file=sys.stderr)

    lines = [
        "# Sketch-vs-exact margin ledger",
        "",
        "Generated by `tools/sketch_margin_probe.py`; regenerate after",
        "fixture changes. Sketch error is DETERMINISTIC per corpus, so",
        "these are exact facts, not samples. If an invariant-form gate",
        "(q56/q72/x74 closeness boolean) trips at a NEW scale factor,",
        "run this probe there first: a measured error above the gate",
        "means the tolerance needs a recalibration commit; an error",
        "inside the gate means a real regression.",
        "",
        "Rows with a `_synth` sf come from synthetic 4x/8x/16x",
        "corpora (`tools/make_scaled_fixture.py`: key-offset copies of",
        "sf0.1, join-integral, distinct-key cardinalities scaled",
        "exactly). They caught a REAL latent red: HLL++ error is NOT",
        "monotone in cardinality, and at the DEFAULT rsd (0.05) the",
        "q56 orderkey error crossed its 10% gate at 8x (measured",
        "10.45% at 1.2M distinct — headroom 0.96x). q56 was therefore",
        "recalibrated to rsd=0.02 (r9), which this probe mirrors, and",
        "x74's rollup to lgConfigK=14; the 16x corpus (2.4M distinct",
        "orderkeys) extends the post-recalibration evidence one more",
        "doubling past the corpus that caught the crossing. Probe",
        "before assuming a bigger corpus means more headroom.",
        "",
        "| query | quantity | sf | measured error | gate | headroom |",
        "|---|---|---|---|---|---|",
    ]
    for r in records:
        err = r.get("measured_rel_error", r.get("measured_abs_error"))
        kind = "rel" if "measured_rel_error" in r else "abs"
        lines.append(
            f"| {r['query']} | {r['quantity']} | {r['sf']} | "
            f"{kind} {err} | {r['gate']} | {r['headroom']}x |"
        )
    with open(os.path.join(REPO_ROOT, "SKETCH_MARGINS.md"), "w") as f:
        f.write("\n".join(lines) + "\n")
    print(json.dumps({"n_records": len(records), "out": "SKETCH_MARGINS.md"}))


if __name__ == "__main__":
    main()
