"""DuckDB differential-oracle harness (SURVEY §5.2.2).

Mirrors the driver's check: run the Spark query and the oracle SQL on
the same parquet fixtures, sort columns by name, compare row count,
schema shape, and order-insensitive values.

Comparison normalizes engine-representation differences that carry no
information (Decimal vs float of equal value, numpy scalars, list vs
tuple, struct dicts by value) but is exact on every value: floats must
be bit-identical — the query surface guarantees that by doing exact
decimal/int arithmetic with at most one final rounded double step.
"""

from __future__ import annotations

import datetime as _dt
import math
import os
from decimal import Decimal

import duckdb

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def duckdb_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.isdir(p):
            # Spark-written layout (tools/make_scaled_fixture.py):
            # a directory of part files, not the driver's single file
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}/*.parquet')"
            )
        elif os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    return con


def _norm(v):
    """Canonicalize a single value for cross-engine comparison."""
    if v is None:
        return None
    if isinstance(v, Decimal):
        # integral decimals (DuckDB HUGEINT sums) must compare exactly
        # against Spark's bigint — float() would lose precision > 2^53
        # and sort differently ('5' vs '5.0')
        if v == v.to_integral_value():
            return int(v)
        return float(v)
    if isinstance(v, bool):
        return v
    if isinstance(v, (int,)):
        return int(v)
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return v
    if isinstance(v, (_dt.datetime, _dt.date)):
        return v.isoformat()
    if isinstance(v, bytes):
        return v
    # pyspark Row is a tuple subclass — struct-normalize before the
    # generic sequence branch
    if hasattr(v, "asDict"):
        return _norm(v.asDict())
    if isinstance(v, (list, tuple)):
        return tuple(_norm(x) for x in v)
    if isinstance(v, dict):
        # struct: compare by field order-insensitive values keyed by name
        return tuple(sorted((str(k), _norm(x)) for k, x in v.items()))
    # numpy scalars / arrays from duckdb fetchall
    if hasattr(v, "tolist"):
        return _norm(v.tolist())
    if hasattr(v, "item"):
        return _norm(v.item())
    return v


def _rows_to_canonical(cols: list[str], rows: list[tuple]) -> list[tuple]:
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(_norm(r[i]) for i in order) for r in rows]
    out.sort(key=lambda t: tuple((x is None, str(x)) for x in t))
    return out


def run_spark(fn, spark, sf_dir):
    df = fn(spark, sf_dir)
    cols = list(df.columns)
    rows = [tuple(r) for r in df.collect()]
    # release intermediates a query persisted and attached (mirrors
    # how a well-behaved driver would consume the contract)
    for dep in getattr(df, "_cached_deps", []):
        dep.unpersist()
    return cols, rows


def run_duck(sql: str, sf_dir: str):
    con = duckdb_connection(sf_dir)
    try:
        res = con.execute(sql)
        cols = [d[0] for d in res.description]
        rows = res.fetchall()
    finally:
        con.close()
    return cols, rows


def compare(name: str, spark_res, duck_res) -> list[str]:
    """Return list of mismatch descriptions (empty == pass)."""
    errs: list[str] = []
    s_cols, s_rows = spark_res
    d_cols, d_rows = duck_res
    if sorted(s_cols) != sorted(d_cols):
        errs.append(f"{name}: column names differ: spark={sorted(s_cols)} duck={sorted(d_cols)}")
        return errs
    if len(s_rows) != len(d_rows):
        errs.append(f"{name}: row count differs: spark={len(s_rows)} duck={len(d_rows)}")
    sc = _rows_to_canonical(s_cols, s_rows)
    dc = _rows_to_canonical(d_cols, d_rows)
    if sc != dc:
        n_bad = 0
        for i, (a, b) in enumerate(zip(sc, dc)):
            if a != b and n_bad < 3:
                errs.append(f"{name}: row {i} differs:\n  spark={a}\n  duck ={b}")
                n_bad += 1
        if not errs:
            errs.append(f"{name}: values differ (row sets)")
    return errs
