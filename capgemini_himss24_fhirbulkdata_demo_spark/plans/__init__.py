"""Physical-plan inspection utilities.

SURVEY §4's contract is that the declared surface rides Catalyst's
optimizations — these helpers make that checkable: tests assert that
filters reach the parquet scan, small dims broadcast, rank-limits
fold into WindowGroupLimit, and nothing silently degenerates into a
cartesian product.
"""

from .inspect import (  # noqa: F401
    assert_no_cartesian_product,
    explain_str,
    join_strategies,
    pushed_filters,
    read_schemas,
    wholestage_codegen_count,
)
