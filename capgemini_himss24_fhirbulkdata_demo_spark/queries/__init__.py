"""Declared query surface (SURVEY §2B) — the differential-test contract.

Every module in this package registers queries into
:mod:`.registry`; importing the package loads them all.
"""

from . import (  # noqa: F401
    registry,
    relational,
    relational2,
    relational3,
    relational4,
    joins,
    windows,
    setops,
    scalars,
    semistructured,
    dedup,
    similarity,
    textstats,
    streaming_batch,
    multimodal,
    features,
    corpus_stats,
    graph,
    analytics,
    analytics2,
)

QUERIES = registry.QUERIES
ORACLE_SQL = registry.ORACLE_SQL
