"""Arrow-vectorized Pandas UDF alternatives for the hot numeric paths
(SURVEY §2B UDF row: scalar + grouped-agg pandas_udf).

The engine's default similarity path is pure built-ins (codegen'd
folds — operators/similarity.py); these UDFs are the escape hatch for
semantics the built-ins can't express (learned scorers, numpy-only
kernels) and the benchmark twin proving the Arrow path's overhead
profile. Never row-at-a-time Python UDFs (SURVEY §4.3.3).
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf


def cosine_to_query_udf(query_vec: list[float]):
    """Scalar pandas_udf: cosine of each row's embedding against one
    fixed query vector (numpy-batched; the query is closure-captured
    — i.e. broadcast into the Arrow worker once per batch)."""
    q = np.asarray(query_vec, dtype=np.float64)
    qn = float(np.linalg.norm(q))

    @pandas_udf("double")
    def _cos(emb: pd.Series) -> pd.Series:
        m = np.stack(emb.to_numpy())  # (batch, dim) float32
        m = m.astype(np.float64)
        dots = m @ q
        norms = np.linalg.norm(m, axis=1) * qn
        return pd.Series(dots / norms)

    return _cos


@pandas_udf("double")
def vector_norm_udf(emb: pd.Series) -> pd.Series:
    m = np.stack(emb.to_numpy()).astype(np.float64)
    return pd.Series(np.linalg.norm(m, axis=1))


def centroid_per_group(df: DataFrame, group_col: str, vec_col: str) -> DataFrame:
    """Grouped-agg pandas_udf: per-group embedding centroid — the
    IVF-index build step (coarse quantizer training input)."""

    @pandas_udf("array<double>")
    def _centroid(emb: pd.Series) -> list[float]:
        m = np.stack(emb.to_numpy()).astype(np.float64)
        return m.mean(axis=0).tolist()

    return df.groupBy(group_col).agg(_centroid(F.col(vec_col)).alias("centroid"))
