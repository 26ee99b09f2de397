"""Differential tests: every registered query vs its DuckDB oracle
(SURVEY §5.2.2). This mirrors the driver's CORRECTNESS gate."""

from __future__ import annotations

import pytest

from capgemini_himss24_fhirbulkdata_demo_spark import queries as q

from .conftest import SF_DIR
from .oracle import compare, run_duck, run_spark

ALL = sorted(q.QUERIES)


@pytest.mark.parametrize("name", ALL)
def test_query_output_is_scalar_only(name, spark):
    """The driver harness canonicalizes result cells through pandas,
    which cannot hash list/map/struct cells (round-1 q14 failure) —
    every registered query must surface only atomic columns."""
    from pyspark.sql.types import AtomicType

    df = q.QUERIES[name](spark, SF_DIR)
    bad = [
        (f.name, f.dataType.simpleString())
        for f in df.schema.fields
        if not isinstance(f.dataType, AtomicType)
    ]
    assert not bad, f"non-scalar output columns break the driver harness: {bad}"


@pytest.mark.parametrize("name", ALL)
def test_query_matches_oracle(name, spark):
    fn = q.QUERIES[name]
    sql = q.ORACLE_SQL.get(name)
    spark_res = run_spark(fn, spark, SF_DIR)
    if sql is None:
        # rows-only check for non-SQL-expressible ops
        assert spark_res[1] is not None
        return
    duck_res = run_duck(sql, SF_DIR)
    errs = compare(name, spark_res, duck_res)
    assert not errs, "\n".join(errs)


def test_approx_percentiles_track_exact(spark):
    """q72 (GK sketch, the 100 TB path) computes its own exact twin
    in-query since the r7 invariant-form conversion: every closeness
    boolean must be TRUE, and the group counts must equal an
    independently computed exact count per return flag."""
    rows = {
        r.l_returnflag: r
        for r in q.QUERIES["q72_percentiles_approx"](spark, SF_DIR).collect()
    }
    from capgemini_himss24_fhirbulkdata_demo_spark.catalog import load_table
    from pyspark.sql import functions as F

    exact_n = {
        r.l_returnflag: r.n
        for r in load_table(spark, SF_DIR, "lineitem")
        .groupBy("l_returnflag")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    assert set(rows) == set(exact_n) and len(rows) > 0
    for flag, r in rows.items():
        assert r.n == exact_n[flag], (flag, r.n, exact_n[flag])
        for col in ("p25_ok", "median_ok", "p75_ok", "p90_price_ok"):
            assert r[col] is True, (flag, col)


def test_driver_contract_shape(spark):
    """__spark_entry__ is the graded surface: entry() runs and returns
    rows with a stable schema; every oracle key names a registered
    query; bench.py imports clean (syntax/import errors there would
    fail the driver's per-round bench run)."""
    import importlib
    import os
    import sys

    repo_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    sys.path.insert(0, repo_root)
    try:
        entry_mod = importlib.import_module("__spark_entry__")
        bench_mod = importlib.import_module("bench")
    finally:
        sys.path.remove(repo_root)
    qs = entry_mod.queries()
    osql = entry_mod.oracle_sql()
    assert set(osql) <= set(qs)
    assert len(qs) >= 100
    assert all(callable(f) for f in qs.values())
    assert all(isinstance(s, str) and s.strip() for s in osql.values())
    # bench headliners must all be registered
    missing = [n for n in bench_mod.HEADLINE if n not in qs]
    assert not missing, f"bench names not registered: {missing}"
    out = entry_mod.entry(spark)
    assert out.columns and out.count() > 0
