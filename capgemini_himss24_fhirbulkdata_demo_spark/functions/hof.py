"""Higher-order-function evaluation helpers.

Spark evaluates lambda bodies of array HOFs (``transform`` /
``filter`` / ``aggregate`` / ...) on the interpreted path, once per
array element, with NO loop-invariant subexpression motion: a
captured expression like ``F.split(text, " ")`` inside the lambda
re-evaluates for EVERY element (and every reference), turning an
O(L) n-gram transform into O(L^2) per document. Codegen subexpression
elimination does not apply — HOFs are CodegenFallback.

``bound`` fixes this while staying a pure Column expression (usable
in helpers that cannot introduce a projection): wrap the expensive
expression in a single-element array and pass it through an outer
``transform``, so it binds to a NamedLambdaVariable — evaluated once
per row, and every inner reference is a variable lookup.

Measured on x154 (trigram transform, sf0.1, local[32]): captured
split 3.69 s vs bound 0.66 s — 5.3x. The same hazard class was fixed
across every n-gram/shingle site (x27/x29/x42/x88/x90/x92/x115/x132/
x154, operators.dedup.shingle, queries.dedup._spark_shingles).
"""

from __future__ import annotations

from typing import Callable

from pyspark.sql import Column
from pyspark.sql import functions as F


def bound(col: Column, fn: Callable[[Column], Column]) -> Column:
    """Evaluate ``col`` once per row and pass it to ``fn`` as a bound
    lambda variable.

    Use whenever an expensive expression (``split``, ``sha2``, array
    construction, ...) would otherwise be captured inside a HOF
    lambda. The one-element-array wrap costs a single array
    allocation per row — noise next to per-element re-evaluation.
    """
    return F.element_at(F.transform(F.array(col), fn), 1)
