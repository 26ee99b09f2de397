"""Skew mitigation: salted aggregation and salted broadcast-side
replication (SURVEY brief "salting for skew").

AQE's skew-join handling covers sort-merge joins at runtime; salting
is the *plan-level* tool for (a) hot-key aggregations (two-phase:
salted partial → final) and (b) shuffled joins where one key
dominates (replicate the small side per salt). Both are pure
DataFrame rewrites — results are identical to the unsalted plan.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_aggregate(
    df: DataFrame,
    keys: list[str],
    aggs: Callable[[], list[Column]],
    merge: Callable[[], list[Column]],
    n_salts: int = 16,
) -> DataFrame:
    """Two-phase aggregation with a synthetic salt key.

    Phase 1 groups by (keys, salt) — hot keys split across ``n_salts``
    reducers; phase 2 merges the partials by the real keys.

    ``aggs()`` builds the phase-1 aggregate columns; ``merge()`` the
    phase-2 re-aggregation over those columns (e.g. sum of partial
    sums, sum of partial counts). Decomposable aggregates only (sum /
    count / min / max — the partial+final algebra).

    The salt derives from a hash of the full row (via
    ``monotonically_increasing_id``), never from data values, so it is
    uniform regardless of key distribution.
    """
    salted = df.withColumn(
        "__salt", (F.monotonically_increasing_id() % n_salts).cast("int")
    )
    partial = salted.groupBy(*keys, "__salt").agg(*aggs())
    return partial.groupBy(*keys).agg(*merge())


def salted_join(
    skewed: DataFrame,
    small: DataFrame,
    on: list[tuple[str, str]],
    n_salts: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Shuffled join with the skewed side salted and the small side
    replicated ``n_salts`` times.

    The skewed side gets a uniform random-ish salt (row-id derived,
    deterministic within a run); the small side explodes one row per
    salt value; the join key becomes (key, salt) so a hot key spreads
    over ``n_salts`` partitions. Row multiplicity is preserved
    exactly for inner/left/semi/anti joins (each skewed row matches
    exactly its own salt replica). Right/full outer are rejected:
    an unmatched small-side row exists once per replica and would be
    emitted ``n_salts`` times.
    """
    if how not in ("inner", "left", "left_outer", "left_semi", "left_anti"):
        raise ValueError(
            f"salted_join does not preserve multiplicity for how={how!r}; "
            "use inner/left/left_semi/left_anti"
        )
    s = skewed.withColumn(
        "__salt", (F.monotonically_increasing_id() % n_salts).cast("int")
    )
    r = small.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)).cast("array<int>"))
    )
    cond = F.col("__l.__salt") == F.col("__r.__salt")
    for lk, rk in on:
        cond = cond & (F.col(f"__l.{lk}") == F.col(f"__r.{rk}"))
    out = s.alias("__l").join(r.alias("__r"), cond, how)
    return out.drop("__salt")
