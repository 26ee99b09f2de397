"""Synthesize a larger-SF fixture by key-offset replication of sf0.1.

Purpose (r8 verdict ask #7): SKETCH_MARGINS.md pins measured
sketch-vs-exact error per scale factor, but fixtures cap at sf0.1 —
precisely the regime where the ledger's value is hypothetical. This
tool builds an N-times corpus from sf0.1 by unioning key-offset
copies (each copy's orderkeys/partkeys/custkeys shifted past the
previous copy's max), which preserves join integrity (every offset
o_custkey exists in the offset customer table; nation/region are
dimension tables and stay as-is) and scales the DISTINCT-key
cardinalities the q56/x74 sketch gates are measured on by exactly N.

Only the five tables the margin probes read are written (lineitem,
orders, customer, nation, region) — this is a probe fixture, not a
full testdata SF.

Usage: python tools/make_scaled_fixture.py OUT_DIR [N_COPIES=4] [SRC]
"""

from __future__ import annotations

import os
import sys

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO_ROOT)

SRC_DEFAULT = "/root/testdata/sf0.1"


def main() -> None:
    from pyspark.sql import functions as F

    from capgemini_himss24_fhirbulkdata_demo_spark.catalog import load_table
    from capgemini_himss24_fhirbulkdata_demo_spark.session import get_spark

    out_dir = sys.argv[1]
    n_copies = int(sys.argv[2]) if len(sys.argv) > 2 else 4
    src = sys.argv[3] if len(sys.argv) > 3 else SRC_DEFAULT
    os.makedirs(out_dir, exist_ok=True)

    spark = get_spark(master="local[16]", shuffle_partitions=16)
    spark.sparkContext.setLogLevel("ERROR")

    li = load_table(spark, src, "lineitem")
    orders = load_table(spark, src, "orders")
    cust = load_table(spark, src, "customer")

    # strides = max+1 so copy i's keys sit strictly past copy i-1's
    ok_stride = orders.agg(F.max("o_orderkey")).first()[0] + 1
    pk_stride = li.agg(F.max("l_partkey")).first()[0] + 1
    ck_stride = cust.agg(F.max("c_custkey")).first()[0] + 1

    def replicate(df, key_strides: dict[str, int]):
        copies = []
        for i in range(n_copies):
            c = df
            for col, stride in key_strides.items():
                c = c.withColumn(col, F.col(col) + F.lit(i * stride))
            copies.append(c)
        out = copies[0]
        for c in copies[1:]:
            out = out.unionByName(c)
        return out

    writes = {
        "lineitem": replicate(
            li, {"l_orderkey": ok_stride, "l_partkey": pk_stride}
        ),
        "orders": replicate(
            orders, {"o_orderkey": ok_stride, "o_custkey": ck_stride}
        ),
        "customer": replicate(cust, {"c_custkey": ck_stride}),
        "nation": load_table(spark, src, "nation"),
        "region": load_table(spark, src, "region"),
    }
    for name, df in writes.items():
        path = os.path.join(out_dir, f"{name}.parquet")
        df.write.mode("overwrite").parquet(path)
        print(f"[fixture] {name}: {spark.read.parquet(path).count()} rows")
    print(f"[fixture] wrote {n_copies}x {src} -> {out_dir}")


if __name__ == "__main__":
    main()
