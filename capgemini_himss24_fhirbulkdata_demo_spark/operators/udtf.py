"""Python UDTF surface (Spark 4): one row in, N typed rows out,
usable in FROM / LATERAL position — the table-function complement to
the pandas UDF surface in :mod:`.pandas_udfs`.

UDTFs run row-at-a-time in Python, i.e. the SLOW path (SURVEY §4.3:
built-ins > pandas UDF > anything row-at-a-time). The engine policy
is: use a UDTF only when the output is *table-shaped per input row*
AND no explode/HOF composition expresses it — e.g. span extraction
with positions, or stateful per-row expansion. Both shapes here have
declarative twins in the query registry (x27 bigrams via
sequence+transform), which is the preferred production form; the
UDTF exists to cover the API surface and the cases where the
generation logic is genuinely imperative.
"""

from __future__ import annotations

from pyspark.sql import SparkSession
from pyspark.sql.functions import udtf


@udtf(returnType="gram string, start_tok int, n_toks int")
class NgramSpans:
    """Whitespace n-grams with token offsets: one output row per
    n-gram of each requested size. ``eval`` receives one input row;
    yielding is the UDTF contract for 1→N expansion."""

    def eval(self, text: str, sizes_csv: str = "2"):  # noqa: D401
        if text is None:
            return
        toks = [t for t in text.split(" ") if t]
        for size_s in sizes_csv.split(","):
            n = int(size_s)
            if n < 1:
                continue
            for i in range(len(toks) - n + 1):
                yield (" ".join(toks[i : i + n]), i, n)


def register_udtfs(spark: SparkSession) -> None:
    """Register the engine's table functions for SQL use
    (``SELECT ... FROM ngram_spans('a b c', '2,3')`` or LATERAL)."""
    spark.udtf.register("ngram_spans", NgramSpans)
