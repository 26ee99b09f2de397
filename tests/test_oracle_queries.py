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
