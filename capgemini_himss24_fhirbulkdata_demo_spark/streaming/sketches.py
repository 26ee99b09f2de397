"""Streaming mergeable sketches: Count-Min heavy hitters over a
file-landing stream.

The batch side (``queries/features.py`` x97) proves the sketch's
accuracy contract; this module proves its MERGEABILITY — the property
that makes a fixed-width sketch the right frequency primitive at
100 TB: each micro-batch reduces to its own ≤ D·W counter rows
engine-side, and the accumulated sketch is the counter-wise SUM
(exact, by linearity of the construction — no approximation is added
by splitting the stream, so live == batch BIT-EXACTLY regardless of
how the files are micro-batched).

Per-batch driver work is bounded by the CONSTANT sketch size (≤ D·W
rows collected per batch — the same bounded-collect budget the JSONL
shard manifest spends), never by data volume; the token pass itself
stays fully distributed inside each micro-batch.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from ..queries.features import _CMS_D, _CMS_W, cms_bucket_py, cms_sketch


class StreamingCountMin:
    """Driver-held accumulated sketch: D rows × W integer counters.

    ``merge_rows`` folds one micro-batch's (d, bucket, cnt) rows in;
    ``estimate`` answers point queries with the min-over-rows rule
    (an overestimate, never under — x97's invariant). Two instances
    merge via :meth:`merge_sketch` — the cross-stream union story.
    """

    def __init__(self, d: int = _CMS_D, w: int = _CMS_W) -> None:
        self.d, self.w = d, w
        self.counters = [[0] * w for _ in range(d)]
        self.n_batches = 0

    def merge_rows(self, rows) -> None:
        for r in rows:
            self.counters[r["d"]][r["bucket"]] += r["cnt"]
        self.n_batches += 1

    def merge_sketch(self, other: "StreamingCountMin") -> None:
        for d in range(self.d):
            for b in range(self.w):
                self.counters[d][b] += other.counters[d][b]

    def estimate(self, token: str) -> int:
        return min(
            self.counters[d][cms_bucket_py(d, token)] for d in range(self.d)
        )


def run_streaming_cms(
    stream_df: DataFrame,
    text_col: str,
    checkpoint: str,
) -> StreamingCountMin:
    """Drain ``stream_df`` (availableNow) through a foreachBatch that
    reduces each micro-batch to its sketch engine-side and merges the
    ≤ D·W counter rows into the returned :class:`StreamingCountMin`.
    """
    from pyspark.sql import functions as F

    sk = StreamingCountMin()

    def process(batch_df: DataFrame, batch_id: int) -> None:
        tok = batch_df.select(
            F.explode(F.split(F.col(text_col), " ")).alias("t")
        )
        sk.merge_rows(cms_sketch(tok).collect())

    q = (
        stream_df.writeStream.foreachBatch(process)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    return sk


def run_streaming_hll(
    stream_df: DataFrame,
    key_cols: list[str],
    distinct_col: str,
    checkpoint: str,
    sink_dir: str,
) -> int:
    """Cardinality leg of the streaming sketch family (CMS above is
    frequency). Each micro-batch reduces to one DataSketches HLL
    binary per key engine-side and APPENDS it to a parquet sink —
    unlike the CMS counters, sketch binaries never cross to the
    driver; the partial table is the hand-off format a 100 TB rollup
    pipeline would checkpoint. Merge law is register-wise MAX (an
    idempotent semilattice, vs. the CMS counters' sum), so re-unioning
    partials is insensitive to HOW the stream was micro-batched —
    ``finalize_streaming_hll`` proves it by unioning with
    ``hll_union_agg``. Returns the number of micro-batches drained."""
    from pyspark.sql import functions as F

    n_batches = 0

    def process(batch_df: DataFrame, batch_id: int) -> None:
        nonlocal n_batches
        n_batches += 1
        (
            batch_df.groupBy(*key_cols)
            .agg(F.hll_sketch_agg(distinct_col).alias("sk"))
            .write.mode("append")
            .parquet(sink_dir)
        )

    q = (
        stream_df.writeStream.foreachBatch(process)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    return n_batches


class StreamingBloom:
    """Membership leg of the streaming sketch triad (CMS = frequency,
    HLL = cardinality). The filter is the x103 audit's bit set — ≤ M
    distinct positions, merged by set UNION (bit-OR), an idempotent
    semilattice like the HLL registers, so live == batch exactly and
    independently of micro-batching. Per-batch driver traffic is
    bounded by the constant filter width, never data volume."""

    def __init__(self) -> None:
        self.bits: set[int] = set()
        self.n_batches = 0

    def merge_rows(self, rows) -> None:
        self.bits.update(r["b"] for r in rows)
        self.n_batches += 1

    def merge_filter(self, other: "StreamingBloom") -> None:
        self.bits |= other.bits

    def might_contain(self, fingerprint: str) -> bool:
        import hashlib as _hashlib

        from ..queries.features import _BLOOM_K, _BLOOM_M

        return all(
            int(_hashlib.md5(f"{j}:{fingerprint}".encode()).hexdigest()[:15],
                16) % _BLOOM_M in self.bits
            for j in range(_BLOOM_K)
        )


def run_streaming_bloom(
    stream_df: DataFrame,
    fingerprint_col: str,
    checkpoint: str,
) -> StreamingBloom:
    """Drain ``stream_df`` (availableNow), reducing each micro-batch
    to its distinct bloom-bit rows engine-side and unioning them into
    the returned :class:`StreamingBloom`."""
    from pyspark.sql import functions as F

    from ..queries.features import _BLOOM_K, bloom_bit

    flt = StreamingBloom()

    def process(batch_df: DataFrame, batch_id: int) -> None:
        bits = (
            batch_df.select(
                F.explode(
                    F.array(*[bloom_bit(j, F.col(fingerprint_col))
                              for j in range(_BLOOM_K)])
                ).alias("b")
            )
            .distinct()
        )
        flt.merge_rows(bits.collect())

    q = (
        stream_df.writeStream.foreachBatch(process)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    return flt


class StreamingHistogram:
    """Quantile leg of the streaming summary family: the x104
    fixed-grid histogram. Bucket counts SUM across micro-batches
    (linearity, like the CMS counters), so live == batch exactly;
    ``quantile`` interpolates inside the rank-holding bucket with the
    SAME arithmetic as x104 (ceiling-rational rank, one final float
    division) so streaming estimates equal the batch query's."""

    def __init__(self, width: int | None = None) -> None:
        from ..queries.features import _X104_W

        self.w = width or _X104_W
        self.buckets: dict[int, int] = {}
        self.n = 0
        self.n_batches = 0

    def merge_rows(self, rows) -> None:
        for r in rows:
            self.buckets[r["bucket"]] = (
                self.buckets.get(r["bucket"], 0) + r["cnt"]
            )
            self.n += r["cnt"]
        self.n_batches += 1

    def merge_hist(self, other: "StreamingHistogram") -> None:
        for b, c in other.buckets.items():
            self.buckets[b] = self.buckets.get(b, 0) + c
        self.n += other.n

    def quantile(self, q: int) -> float:
        """x104's estimator: rank r = ceil(q·n/100); value =
        bucket·w + w·(r − cum_before)/cnt, rounded to 6 with Spark's
        rule — HALF_UP on the double's shortest decimal repr
        (BigDecimal.valueOf) — NOT Python round()'s ties-to-even on
        the binary value, which can differ at an exact .xxxxxx5."""
        from decimal import ROUND_HALF_UP, Decimal

        if not 0 <= q <= 100:
            raise ValueError(f"quantile q must be in 0..100, got {q}")
        # q=0 would give rank 0, which no cumulative count ever
        # reaches (the loop condition is cum < r) — clamp to rank 1,
        # i.e. the minimum, matching percentile_cont's q=0 semantics.
        r = max(1, (q * self.n + 99) // 100)
        cum = 0
        for b in sorted(self.buckets):
            cnt = self.buckets[b]
            if cum + cnt >= r and cum < r:
                v = b * self.w + (self.w * (r - cum)) / cnt
                return float(
                    Decimal(repr(v)).quantize(
                        Decimal("1e-6"), rounding=ROUND_HALF_UP)
                )
            cum += cnt
        raise ValueError(f"rank {r} beyond histogram mass {self.n}")


def run_streaming_histogram(
    stream_df: DataFrame,
    value_col: str,
    checkpoint: str,
    width: int | None = None,
) -> StreamingHistogram:
    """Drain ``stream_df`` (availableNow), reducing each micro-batch
    to its constant-size bucket-count rows engine-side and summing
    them into the returned :class:`StreamingHistogram`."""
    from pyspark.sql import functions as F

    hist = StreamingHistogram(width)

    def process(batch_df: DataFrame, batch_id: int) -> None:
        rows = (
            batch_df.select(
                (F.col(value_col) / hist.w).cast("bigint").alias("bucket")
            )
            .groupBy("bucket")
            .agg(F.count("*").alias("cnt"))
        )
        hist.merge_rows(rows.collect())

    q = (
        stream_df.writeStream.foreachBatch(process)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    return hist


def finalize_streaming_hll(spark, sink_dir: str, key_cols: list[str]):
    """Union the per-batch HLL partials back to one estimate per key
    — the re-aggregation never rescans the raw stream, only the
    constant-size sketch rows (the same refresh-cost-∝-summary
    property x110 proves for exact partials)."""
    from pyspark.sql import functions as F

    return (
        spark.read.parquet(sink_dir)
        .groupBy(*key_cols)
        .agg(
            F.hll_sketch_estimate(F.hll_union_agg("sk")).alias(
                "approx_distinct"
            )
        )
    )
