"""Differential tests: every registered query vs its DuckDB oracle
(SURVEY §5.2.2). This mirrors the driver's CORRECTNESS gate."""

from __future__ import annotations

import pytest

from capgemini_himss24_fhirbulkdata_demo_spark import queries as q

from .conftest import SF_DIR
from .oracle import compare, run_duck, run_spark

ALL = sorted(q.QUERIES)


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
