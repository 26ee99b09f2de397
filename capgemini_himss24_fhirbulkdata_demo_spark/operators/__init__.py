"""Composed operators the engine adds on top of built-in Spark
(SURVEY §2B Joins/Dedup/North-star rows).

Each operator is a pure ``DataFrame -> DataFrame`` combinator built
from built-in primitives (SURVEY §7.e: nothing here needs a custom
Catalyst rule). The oracle-checked queries in ``queries/`` are thin
wrappers over these.
"""

from .asof import asof_join  # noqa: F401
from .dedup import (  # noqa: F401
    dedup_first_wins,
    lsh_candidate_pairs,
    minhash_signatures,
    near_dup_pairs,
    shingle,
)
from .similarity import cosine_dot, cosine_topk, lsh_bucket  # noqa: F401
from .skew import salted_aggregate, salted_join  # noqa: F401
from .topk import top_k_per_group  # noqa: F401
