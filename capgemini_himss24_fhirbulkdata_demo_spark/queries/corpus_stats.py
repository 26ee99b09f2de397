"""Corpus-statistics operators over ``documents`` — the round-5
additions to the LLM-pipeline surface (SURVEY brief: training-data
operations a 100 TB pretraining pipeline needs).

- x87: DSIR importance weights (Xie et al., NeurIPS'23 "Data
  Selection for Language Models via Importance Resampling") —
  hashed-unigram bag features, per-document target-vs-raw
  log-likelihood ratio.
- x88: duplicated n-gram SPAN scan (Lee et al., ACL'22
  "Deduplicating Training Data Makes Language Models Better") —
  span-level (not whole-doc, not paragraph) cross-document exact
  duplication, the granularity x01/x18 do not cover.
- x89: Zipf rank-frequency slope per language — the corpus-health
  diagnostic (a healthy natural-language corpus fits ~ -1; scraped
  boilerplate or synthetic spam bends the curve).
- x90: winnowing fingerprints (Schleimer et al., SIGMOD'03 "MOSS")
  — windowed-min k-gram fingerprint selection, the
  position-robust containment sketch (vs x23's whole-doc md5).

Cross-engine determinism: the repo's portable md5-hex→BIGINT bridge
(Spark ``conv(substr(md5, 1, 15), 16, 10)`` ↔ DuckDB ``CAST('0x' ||
SUBSTR(MD5, 1, 15) AS BIGINT)``), exact-integer counts, and the x46
precedent for ln(): each ln input is an exact integer ratio, outputs
are ROUND(6)-ed doubles with value magnitudes orders above the fp
summation-order noise floor.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..catalog import load_table
from .registry import register

# ---- x87: DSIR hashed-ngram importance weights ----

_X87_BUCKETS = 256

_X87_SQL = f"""
    WITH tok AS (
      SELECT doc_id, lang,
             UNNEST(STRING_SPLIT(text, ' ')) AS t
      FROM documents),
    b AS (
      SELECT doc_id, lang,
             CAST(('0x' || SUBSTR(MD5(t), 1, 15)) AS BIGINT)
               % {_X87_BUCKETS} AS bucket
      FROM tok),
    dc AS (
      SELECT doc_id, bucket, CAST(COUNT(*) AS BIGINT) AS cnt
      FROM b GROUP BY doc_id, bucket),
    tgt AS (
      SELECT bucket, CAST(COUNT(*) AS BIGINT) AS ct
      FROM b WHERE lang = 'en' GROUP BY bucket),
    raw AS (
      SELECT bucket, CAST(COUNT(*) AS BIGINT) AS cr
      FROM b GROUP BY bucket),
    tots AS (
      SELECT (SELECT SUM(ct) FROM tgt) AS t_tot,
             (SELECT SUM(cr) FROM raw) AS r_tot),
    lr AS (
      SELECT raw.bucket,
             LN(CAST((COALESCE(ct, 0) + 1) * (r_tot + {_X87_BUCKETS})
                     AS DOUBLE)
                / CAST((cr + 1) * (t_tot + {_X87_BUCKETS}) AS DOUBLE))
               AS logratio
      FROM raw LEFT JOIN tgt ON raw.bucket = tgt.bucket, tots)
    SELECT dc.doc_id,
           CAST(SUM(dc.cnt) AS BIGINT) AS n_tokens,
           ROUND(SUM(dc.cnt * lr.logratio) / SUM(dc.cnt), 6)
             AS dsir_weight
    FROM dc JOIN lr ON dc.bucket = lr.bucket
    GROUP BY dc.doc_id
    ORDER BY dc.doc_id
    """


@register("x87_dsir_weights", oracle=_X87_SQL)
def x87_dsir_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR importance weights (Xie et al., NeurIPS'23): hashed
    unigram bag features over {b} buckets; the target distribution is
    estimated from the ``lang='en'`` slice, the raw distribution from
    the whole corpus, both add-one smoothed; each document scores the
    average per-token log-likelihood ratio ln(p_target/p_raw) — the
    importance weight DSIR resamples by to shift a raw crawl toward a
    target domain without training a classifier.

    Scale: tokens explode narrowly; the only data-sized shuffle is
    one uniform-key partial agg on (doc_id, bucket) — map-side
    combine bounds each doc's contribution at {b} rows. The bucket
    log-ratio table is exactly {b} rows and broadcasts into the
    per-doc rollup; the two global bucket histograms are skinny
    {b}-row aggregates. Nothing is quadratic; importance scoring at
    100 TB is one pass + one broadcast join.

    Determinism: every ln() input is an exact integer ratio; the
    per-doc sum is fp-order-noisy at ~1e-15 relative, five-plus
    orders below the ROUND(6) grain (x46 precedent).
    """
    docs = load_table(spark, sf_dir, "documents")
    bucket = (
        F.conv(F.substring(F.md5(F.col("t").cast("binary")), 1, 15), 16, 10)
        .cast("bigint")
        % _X87_BUCKETS
    )
    tok = docs.select(
        "doc_id", "lang", F.explode(F.split("text", " ")).alias("t")
    ).select("doc_id", "lang", bucket.alias("bucket"))
    # One tokenize+md5 pass (was three): the per-(doc, bucket) counts
    # are the finest grain every downstream number needs — the raw
    # and target bucket histograms roll up from them exactly (sum of
    # per-doc counts == per-bucket counts), with the lang='en' slice
    # as a CONDITIONAL sum instead of a filtered re-scan, so both
    # histograms collapse into one bucket-count-row aggregate and the
    # raw⟕tgt join disappears (a bucket with no 'en' tokens gets
    # ct=0 — the same value the old COALESCE(ct, 0) produced). lang
    # rides along in the grouping key (one value per doc, grain
    # unchanged). The two remaining consumers (per-doc rollup and
    # bucket histogram) share one identical tokenize→partial-agg→
    # exchange subtree, which ReuseExchange materializes once (guide
    # §1.2 / §2.4: remove whole passes first).
    dcl = tok.groupBy("doc_id", "lang", "bucket").agg(
        F.count("*").cast("bigint").alias("cnt")
    )
    dc = dcl.select("doc_id", "bucket", "cnt")
    en_cnt = F.when(F.col("lang") == "en", F.col("cnt")).otherwise(F.lit(0))
    bs = dcl.groupBy("bucket").agg(
        F.sum("cnt").cast("bigint").alias("cr"),
        F.sum(en_cnt).cast("bigint").alias("ct"),
    )
    # The corpus totals are sums over bs's ≤{b} rows — a global
    # window over that dim-sized frame costs one {b}-row single-
    # partition exchange and removes what used to be a third full
    # tokenize branch (tots = bs.agg re-derived the entire lineage
    # from the scan) plus its crossJoin. Integer sums, so window-vs-
    # agg evaluation order cannot change a bit.
    wall = Window.partitionBy()
    lr = bs.select(
        "bucket",
        F.log(
            ((F.col("ct") + 1)
             * (F.sum("cr").over(wall) + _X87_BUCKETS)).cast("double")
            / ((F.col("cr") + 1)
               * (F.sum("ct").over(wall) + _X87_BUCKETS)).cast("double")
        ).alias("logratio"),
    )
    return (
        dc.join(F.broadcast(lr), "bucket")
        .groupBy("doc_id")
        .agg(
            F.sum("cnt").cast("bigint").alias("n_tokens"),
            F.round(
                F.sum(F.col("cnt") * F.col("logratio")) / F.sum("cnt"), 6
            ).alias("dsir_weight"),
        )
        .orderBy("doc_id")
    )


x87_dsir_weights.__doc__ = x87_dsir_weights.__doc__.format(b=_X87_BUCKETS)


# ---- x88: duplicated n-gram SPAN scan (Lee et al. ACL'22) ----

_X88_NGRAM = 8

_X88_SQL = f"""
    WITH toks AS (
      SELECT doc_id, STRING_SPLIT(text, ' ') AS t FROM documents),
    spans AS (
      SELECT doc_id,
             UNNEST(LIST_TRANSFORM(
               RANGE(1, GREATEST(LEN(t) - {_X88_NGRAM - 1}, 0) + 1),
               i -> ARRAY_TO_STRING(t[i:i + {_X88_NGRAM - 1}], ' ')))
               AS gram
      FROM toks),
    dup AS (
      SELECT gram FROM spans
      GROUP BY gram HAVING COUNT(DISTINCT doc_id) > 1),
    tot AS (
      SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_spans
      FROM spans GROUP BY doc_id),
    hit AS (
      SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_dup
      FROM spans WHERE gram IN (SELECT gram FROM dup)
      GROUP BY doc_id)
    SELECT tot.doc_id, n_spans,
           COALESCE(n_dup, CAST(0 AS BIGINT)) AS n_dup,
           FLOOR(COALESCE(n_dup, 0) * 10000.0 / n_spans) / 10000
             AS dup_share,
           CASE WHEN COALESCE(n_dup, 0) > 0 THEN 1 ELSE 0 END
             AS has_dup_span
    FROM tot LEFT JOIN hit ON tot.doc_id = hit.doc_id
    ORDER BY tot.doc_id
    """


@register("x88_dup_spans", oracle=_X88_SQL)
def x88_dup_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Span-level exact-duplication scan (Lee et al., ACL'22): every
    {g}-token span position in every document, flagged when the
    identical span text occurs in at least one OTHER document — the
    granularity their suffix-array ExactSubstr dedup targets, which
    whole-doc (x01) and paragraph (x18) dedup both miss. Per doc:
    span positions, positions covered by a cross-doc duplicate span,
    FLOOR-truncated duplicated share, and the 0/1 flag.

    Scale: span generation is the same narrow index-sequence
    transform as x42 (no self-join). Round 5 perf rewrite (bench #1
    offender at 3.6 s): (a) per-doc span totals are computed NARROWLY
    (``n − g + 1`` from the token count — the explode branch that
    re-scanned the corpus is gone); (b) spans shuffle as 128-bit md5
    FINGERPRINTS, not gram text (~3× fewer shuffle bytes; collision
    odds over a corpus of G distinct grams ≈ G²/2¹²⁹ — at 10¹²
    grams that is <10⁻¹⁴, the same exactness budget x02's
    fingerprints already spend); (c) the duplicate test is ONE
    (fp, doc) partial agg + a same-key count window + the per-doc
    rollup — the re-explode + gram-keyed semi-join of the first cut
    collapsed into the window. Gram keys are Zipf-skewed; AQE splits
    hot buckets, and no stage is quadratic in corpus size — cost ∝
    total span positions, i.e. ∝ corpus tokens.
    """
    from ..functions.hof import bound

    docs = load_table(spark, sf_dir, "documents")
    g = _X88_NGRAM
    t = F.split(F.col("text"), " ")
    n = F.size(t)
    # token array lambda-bound: a captured split re-tokenizes per span
    # position in the interpreted HOF (functions.hof.bound)
    spans = docs.select(
        "doc_id",
        F.explode(
            bound(
                t,
                lambda tk: F.transform(
                    F.when(
                        F.size(tk) >= g,
                        F.sequence(F.lit(1), F.size(tk) - (g - 1)),
                    ).otherwise(F.array().cast("array<int>")),
                    lambda i: F.md5(
                        F.array_join(F.slice(tk, i, g), " ").cast("binary")
                    ),
                ),
            )
        ).alias("fp"),
    )
    # docs with <g tokens explode to zero spans and drop out — the
    # narrow twin must exclude them the same way
    tot = docs.filter(n >= g).select(
        "doc_id", (n - (g - 1)).cast("bigint").alias("n_spans")
    )
    # r11 (guide §2.4): hash-distribute the span stream by fp ONCE —
    # HashPartitioning(fp) satisfies both the (fp, doc_id) aggregate's
    # clustered distribution AND the fp window's, so the old second
    # exchange (agg on (fp, doc_id), re-shuffle on fp for the window)
    # disappears; one data-sized exchange moves the fingerprints.
    # Repeated (fp, doc) spans are rare within a doc, so the lost
    # map-side partial agg costs ~nothing in shuffle bytes.
    gd = (
        spans.repartition("fp")
        .groupBy("fp", "doc_id")
        .agg(F.count("*").alias("cnt"))
    )
    wg = Window.partitionBy("fp")
    hit = (
        gd.withColumn("nd", F.count("*").over(wg))
        .filter(F.col("nd") > 1)
        .groupBy("doc_id")
        .agg(F.sum("cnt").cast("bigint").alias("n_dup"))
    )
    n_dup = F.coalesce("n_dup", F.lit(0).cast("bigint"))
    return (
        tot.join(hit, "doc_id", "left")
        .select(
            "doc_id",
            "n_spans",
            n_dup.alias("n_dup"),
            (F.floor(n_dup * 10000.0 / F.col("n_spans")) / 10000).alias(
                "dup_share"
            ),
            F.when(n_dup > 0, F.lit(1)).otherwise(F.lit(0)).alias(
                "has_dup_span"
            ),
        )
        .orderBy("doc_id")
    )


x88_dup_spans.__doc__ = x88_dup_spans.__doc__.format(g=_X88_NGRAM)


# ---- x89: Zipf rank-frequency slope per language ----

_X89_TOPK = 100

_X89_SQL = f"""
    WITH tok AS (
      SELECT lang, UNNEST(STRING_SPLIT(text, ' ')) AS t FROM documents),
    freq AS (
      SELECT lang, t, CAST(COUNT(*) AS BIGINT) AS c
      FROM tok GROUP BY lang, t),
    ranked AS (
      SELECT lang, c,
             ROW_NUMBER() OVER (PARTITION BY lang
                                ORDER BY c DESC, t) AS rank,
             COUNT(*) OVER (PARTITION BY lang) AS n_types
      FROM freq),
    pts AS (
      SELECT lang, n_types,
             LN(CAST(rank AS DOUBLE)) AS x,
             LN(CAST(c AS DOUBLE)) AS y
      FROM ranked WHERE rank <= {_X89_TOPK})
    SELECT lang,
           CAST(MAX(n_types) AS BIGINT) AS n_types,
           CAST(COUNT(*) AS BIGINT) AS n_points,
           ROUND((COUNT(*) * SUM(x * y) - SUM(x) * SUM(y))
                 / (COUNT(*) * SUM(x * x) - SUM(x) * SUM(x)), 6)
             AS zipf_slope
    FROM pts
    GROUP BY lang
    ORDER BY lang
    """


@register("x89_zipf_slope", oracle=_X89_SQL)
def x89_zipf_slope(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zipf rank-frequency fit per language: least-squares slope of
    ln(freq) on ln(rank) over the top {k} token ranks (ties broken by
    token text) — a natural corpus tracks ~ -1; template boilerplate,
    dedup failures, or synthetic spam flatten or steepen it. The
    one-number corpus-health gauge next to x26's raw vocabulary.

    Scale: one uniform-key (lang, token) partial agg; ranking is a
    per-lang window whose input is the type (not token) space; only
    the top {k} rows per lang feed the regression, so the final agg
    is tiny. Languages are few → the rank window would skew on one
    giant lang at 100 TB, so the rank window must stay PRUNABLE:
    ``n_types`` is computed as its own lang-grain aggregate (lang
    count rows — broadcast) rather than a ``count(*) over lang``
    beside the ``row_number`` — a second non-rank function in the
    same window spec BLOCKS Spark's WindowGroupLimit rewrite
    (verified on the executed plan: the combined form ran the full
    type space through WindowExec; the split form shows
    WindowGroupLimit in Partial mode before the lang exchange and
    Final after, so each map task forwards only its own top {k}
    candidates per lang).

    Determinism: ln() inputs are exact integers; the ≤{k}-term sums
    leave ~1e-14 fp-order noise vs a ROUND(6) output on O(1) values
    (x46 precedent).
    """
    docs = load_table(spark, sf_dir, "documents")
    freq = (
        docs.select("lang", F.explode(F.split("text", " ")).alias("t"))
        .groupBy("lang", "t")
        .agg(F.count("*").cast("bigint").alias("c"))
    )
    n_types = freq.groupBy("lang").agg(
        F.count("*").cast("bigint").alias("n_types")
    )
    w = Window.partitionBy("lang").orderBy(F.desc("c"), F.asc("t"))
    ranked = freq.select(
        "lang", "c", F.row_number().over(w).alias("rank")
    )
    pts = (
        ranked.filter(F.col("rank") <= _X89_TOPK)
        .join(F.broadcast(n_types), "lang")
        .select(
            "lang",
            "n_types",
            F.log(F.col("rank").cast("double")).alias("x"),
            F.log(F.col("c").cast("double")).alias("y"),
        )
    )
    n = F.count("*")
    return (
        pts.groupBy("lang")
        .agg(
            F.max("n_types").cast("bigint").alias("n_types"),
            n.cast("bigint").alias("n_points"),
            F.round(
                (n * F.sum(F.col("x") * F.col("y"))
                 - F.sum("x") * F.sum("y"))
                / (n * F.sum(F.col("x") * F.col("x"))
                   - F.sum("x") * F.sum("x")),
                6,
            ).alias("zipf_slope"),
        )
        .orderBy("lang")
    )


x89_zipf_slope.__doc__ = x89_zipf_slope.__doc__.format(k=_X89_TOPK)


# ---- x90: winnowing fingerprints (MOSS) ----

_X90_K = 5  # tokens per k-gram
_X90_W = 4  # hashes per winnowing window

_X90_HASH = "CAST(('0x' || SUBSTR(MD5(gram), 1, 15)) AS BIGINT)"

_X90_SQL = f"""
    WITH toks AS (
      SELECT doc_id, STRING_SPLIT(text, ' ') AS t FROM documents),
    grams AS (
      SELECT doc_id,
             UNNEST(LIST_TRANSFORM(
               RANGE(1, GREATEST(LEN(t) - {_X90_K - 1}, 0) + 1),
               i -> ARRAY_TO_STRING(t[i:i + {_X90_K - 1}], ' ')))
               AS gram,
             UNNEST(RANGE(1, GREATEST(LEN(t) - {_X90_K - 1}, 0) + 1))
               AS pos
      FROM toks),
    hashed AS (
      SELECT doc_id, pos, {_X90_HASH} AS h,
             COUNT(*) OVER (PARTITION BY doc_id) AS n_grams
      FROM grams),
    wins AS (
      -- window FIRST, filter SECOND: a WHERE before the window would
      -- shrink the tail windows to the surviving rows only
      SELECT doc_id, fp FROM (
        SELECT doc_id, pos, n_grams,
               MIN(h) OVER (PARTITION BY doc_id ORDER BY pos
                            ROWS BETWEEN CURRENT ROW
                            AND {_X90_W - 1} FOLLOWING) AS fp
        FROM hashed)
      WHERE pos <= GREATEST(n_grams - {_X90_W - 1}, 1)),
    fps AS (SELECT DISTINCT doc_id, fp FROM wins),
    shared AS (
      SELECT fp FROM fps GROUP BY fp HAVING COUNT(*) > 1),
    tot AS (
      SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_fp
      FROM fps GROUP BY doc_id),
    hit AS (
      SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_shared
      FROM fps WHERE fp IN (SELECT fp FROM shared)
      GROUP BY doc_id)
    SELECT tot.doc_id, n_fp,
           COALESCE(n_shared, CAST(0 AS BIGINT)) AS n_shared,
           FLOOR(COALESCE(n_shared, 0) * 10000.0 / n_fp) / 10000
             AS shared_share
    FROM tot LEFT JOIN hit ON tot.doc_id = hit.doc_id
    ORDER BY tot.doc_id
    """


@register("x90_winnowing", oracle=_X90_SQL)
def x90_winnowing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winnowing fingerprints (Schleimer et al., SIGMOD'03): hash
    every {k}-token gram, slide a window of {w} consecutive hashes,
    keep each window's minimum — the fingerprint set is guaranteed to
    detect any shared run of {k}+{w}-1 tokens while selecting ~2/(w+1)
    of positions, position-robust unlike x23's whole-doc digest. Per
    doc: distinct fingerprints, fingerprints shared with any other
    doc, FLOOR-truncated shared share — the MOSS-style containment
    signal feeding plagiarism/near-dup triage.

    Scale: gram + hash generation is narrow; the windowed min is a
    per-doc sort (doc_id partitioning, no cross-doc data motion);
    fingerprint distinct + the shared test are uniform-key hash
    partial aggs + a semi-join on the fingerprint key. Fingerprint
    density is ~2/({w}+1) of token positions, so downstream volume is
    a constant fraction of corpus size — the same block-then-verify
    discipline as x02, with winnowing's selection guarantee instead
    of minhash's probabilistic one.
    """
    from ..functions.hof import bound

    # md5 per gram dominates this query's compute and the fixture is
    # one small file, so spread the scan across cores first — the
    # same measured compute≫bytes trade x02's signature pass makes,
    # cheap at any scale for the same reason (r12, guide §2.5/§6.2).
    docs = load_table(spark, sf_dir, "documents").repartition(
        spark.sparkContext.defaultParallelism * 2
    )
    k, wlen = _X90_K, _X90_W
    # token array lambda-bound (functions.hof.bound): a captured split
    # re-tokenizes per gram position in the interpreted HOF.
    # r12 (guide §2.3/§7.2): n_grams and the gram array are computed
    # in ONE bound struct in a projection BELOW the Generate. The r11
    # form wrote `size(split(text)) - (k-1)` in the SAME select as the
    # posexplode, which Catalyst evaluates in the projection ABOVE the
    # Generate — i.e. text re-split once PER GRAM ROW, O(tokens²) per
    # doc (committed before-plan shows `size(split(text..)) AS
    # n_grams` above the Generate). The struct binds split(text) once
    # per doc; the Generate explodes the precomputed array and carries
    # only (doc_id, n_grams) scalars per gram row.
    t = F.split(F.col("text"), " ")
    base = docs.select(
        "doc_id",
        bound(
            t,
            lambda tk: F.struct(
                (F.size(tk) - (k - 1)).alias("ng"),
                F.transform(
                    F.when(
                        F.size(tk) >= k,
                        F.sequence(F.lit(1), F.size(tk) - (k - 1)),
                    ).otherwise(F.array().cast("array<int>")),
                    lambda i: F.array_join(F.slice(tk, i, k), " "),
                ).alias("gs"),
            ),
        ).alias("b"),
    ).select("doc_id", F.col("b.ng").alias("n_grams"), F.col("b.gs").alias("gs"))
    # posexplode_OUTER: the non-outer form makes InferFiltersFromGenerate
    # push a `size(gs) > 0` filter below the exchange, re-evaluating the
    # whole gram-struct once more per doc. Outer emits one null row for
    # gram-less docs instead; its null pos fails the window-tail filter
    # below, so the output set is unchanged (oracle-verified 3 SFs).
    grams = base.select(
        "doc_id",
        "n_grams",
        F.posexplode_outer("gs").alias("pos0", "gram"),
    ).select(
        "doc_id",
        "n_grams",
        (F.col("pos0") + 1).alias("pos"),
        F.conv(F.substring(F.md5(F.col("gram").cast("binary")), 1, 15), 16, 10)
        .cast("bigint")
        .alias("h"),
    )
    wmin = (
        Window.partitionBy("doc_id")
        .orderBy("pos")
        .rowsBetween(Window.currentRow, wlen - 1)
    )
    # window FIRST, filter SECOND: filtering positions before the
    # sliding min would shrink tail windows to the surviving rows
    # (caught by the winnowing-guarantee property test)
    fps = (
        grams.select(
            "doc_id",
            "pos",
            "n_grams",
            F.min("h").over(wmin).alias("fp"),
        )
        .filter(
            F.col("pos") <= F.greatest(F.col("n_grams") - (wlen - 1), F.lit(1))
        )
        .select("doc_id", "fp")
        .distinct()
    )
    # r11 single-pass rollup (guide §1.2/§2.4): the old shape computed
    # fps THREE times (shared = groupBy fp, tot = groupBy doc, hit =
    # semi-join + groupBy doc — three full tokenize+window lineages)
    # and stitched them with two joins. A count-over-fp window gives
    # each fingerprint its doc multiplicity in place, and ONE per-doc
    # aggregate derives both n_fp and n_shared (a doc with zero
    # shared fps sums the conditional to 0, exactly the old
    # COALESCE). Same grain, same values, one pass, zero joins.
    wfp = Window.partitionBy("fp")
    n_shared = F.sum(
        F.when(F.col("nd") > 1, F.lit(1)).otherwise(F.lit(0))
    ).cast("bigint")
    return (
        fps.withColumn("nd", F.count("*").over(wfp))
        .groupBy("doc_id")
        .agg(
            F.count("*").cast("bigint").alias("n_fp"),
            n_shared.alias("n_shared"),
        )
        .select(
            "doc_id",
            "n_fp",
            "n_shared",
            (
                F.floor(F.col("n_shared") * 10000.0 / F.col("n_fp")) / 10000
            ).alias("shared_share"),
        )
        .orderBy("doc_id")
    )


x90_winnowing.__doc__ = x90_winnowing.__doc__.format(k=_X90_K, w=_X90_W)


# ---- x91: Heaps-law vocabulary growth curve ----

_X91_BUCKET = 20  # docs per growth checkpoint

_X91_SQL = f"""
    WITH tok AS (
      SELECT doc_id, UNNEST(STRING_SPLIT(text, ' ')) AS t
      FROM documents),
    first_seen AS (
      SELECT t, MIN(doc_id) AS first_doc,
             CAST(COUNT(*) AS BIGINT) AS c
      FROM tok GROUP BY t),
    per_doc AS (
      SELECT CAST(FLOOR(first_doc / {_X91_BUCKET}) AS BIGINT) AS bucket,
             CAST(COUNT(*) AS BIGINT) AS new_types
      FROM first_seen GROUP BY bucket),
    tokens_per_bucket AS (
      SELECT CAST(FLOOR(doc_id / {_X91_BUCKET}) AS BIGINT) AS bucket,
             CAST(COUNT(*) AS BIGINT) AS n_tokens
      FROM tok GROUP BY bucket)
    SELECT tb.bucket,
           CAST(SUM(tb.n_tokens) OVER w AS BIGINT) AS cum_tokens,
           CAST(SUM(COALESCE(pd.new_types, 0)) OVER w AS BIGINT)
             AS cum_types
    FROM tokens_per_bucket tb
    LEFT JOIN per_doc pd ON tb.bucket = pd.bucket
    WINDOW w AS (ORDER BY tb.bucket ROWS UNBOUNDED PRECEDING)
    ORDER BY tb.bucket
    """


@register("x91_vocab_growth", oracle=_X91_SQL)
def x91_vocab_growth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heaps-law vocabulary growth curve: cumulative distinct types
    vs cumulative tokens at checkpoints of {b} documents (doc_id
    order). A natural corpus grows ~ K·n^β with β≈0.5; a flattening
    curve means the crawl is exhausting its domain (more dedup, less
    new text), a super-linear one flags OCR noise or random-string
    spam inflating the type space — the companion gauge to x89's
    Zipf slope and x26's static vocabulary.

    Scale: "cumulative distinct" is computed without any running
    distinct state: each type contributes exactly once at its FIRST
    document (min(doc_id) per type — one uniform-key partial agg on
    the token), then per-bucket new-type counts cumulate through a
    window over the tiny bucket axis. Token volume per bucket is a
    second uniform-key agg. Nothing holds a growing distinct set;
    both shuffles are corpus-token-proportional with map-side
    combine.
    """
    docs = load_table(spark, sf_dir, "documents")
    tok = docs.select("doc_id", F.explode(F.split("text", " ")).alias("t"))
    bucket = F.floor(F.col("doc_id") / _X91_BUCKET).cast("bigint")
    first_seen = tok.groupBy("t").agg(F.min("doc_id").alias("first_doc"))
    new_types = (
        first_seen.select(
            F.floor(F.col("first_doc") / _X91_BUCKET)
            .cast("bigint")
            .alias("bucket")
        )
        .groupBy("bucket")
        .agg(F.count("*").cast("bigint").alias("new_types"))
    )
    tokens_per_bucket = (
        tok.select(bucket.alias("bucket"))
        .groupBy("bucket")
        .agg(F.count("*").cast("bigint").alias("n_tokens"))
    )
    w = Window.orderBy("bucket").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return (
        tokens_per_bucket.join(new_types, "bucket", "left")
        .select(
            "bucket",
            F.sum("n_tokens").over(w).cast("bigint").alias("cum_tokens"),
            F.sum(F.coalesce("new_types", F.lit(0)))
            .over(w)
            .cast("bigint")
            .alias("cum_types"),
        )
        .orderBy("bucket")
    )


x91_vocab_growth.__doc__ = x91_vocab_growth.__doc__.format(b=_X91_BUCKET)


# ---- x92: cross-source n-gram contamination matrix ----

_X92_NGRAM = 8

_X92_SQL = f"""
    WITH toks AS (
      SELECT source, STRING_SPLIT(text, ' ') AS t FROM documents),
    grams AS (
      SELECT DISTINCT source,
             UNNEST(LIST_TRANSFORM(
               RANGE(1, GREATEST(LEN(t) - {_X92_NGRAM - 1}, 0) + 1),
               i -> ARRAY_TO_STRING(t[i:i + {_X92_NGRAM - 1}], ' ')))
               AS gram
      FROM toks),
    per_src AS (
      SELECT source, CAST(COUNT(*) AS BIGINT) AS n_grams
      FROM grams GROUP BY source),
    pairs AS (
      SELECT a.source AS source_a, b.source AS source_b,
             CAST(COUNT(*) AS BIGINT) AS n_shared
      FROM grams a JOIN grams b
        ON a.gram = b.gram AND a.source < b.source
      GROUP BY source_a, source_b)
    SELECT p.source_a, p.source_b, p.n_shared,
           FLOOR(p.n_shared * 10000.0
                 / LEAST(sa.n_grams, sb.n_grams)) / 10000
             AS containment
    FROM pairs p
    JOIN per_src sa ON p.source_a = sa.source
    JOIN per_src sb ON p.source_b = sb.source
    ORDER BY p.source_a, p.source_b
    """


@register("x92_source_ngram_overlap", oracle=_X92_SQL)
def x92_source_ngram_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-source contamination matrix at n-gram granularity (the
    GPT-2/3 appendix-style {g}-gram overlap scan): for every source
    pair, how many distinct {g}-token grams both carry, normalized by
    the smaller side's gram count (containment) — x70 answers "do
    these sources share whole documents", this answers "do they share
    passages", which catches partial re-crawls and quote farms that
    whole-doc fingerprints miss.

    Scale: distinct (source, gram-fingerprint) is one uniform-key
    partial agg (md5 fingerprints shuffle, not gram text — r5 perf
    pass). The pair count then FOLDS each gram's source set once
    (``collect_set`` ≤ S elements, S = #sources) and explodes the
    ordered pairs narrowly — the gram-keyed self-join it replaces
    shuffled the distinct gram set twice (verified: no
    ReusedExchange), so this shape halves the pair-stage shuffle
    volume at any scale; local sf0.1 timings are within noise of the
    join (2.6 vs 2.4 s best-of-3 — both recorded, the shuffle
    argument decides). Cost ∝ matching gram occurrences, never
    |grams|². Per-source totals are an S-row broadcast.
    """
    from ..functions.hof import bound

    docs = load_table(spark, sf_dir, "documents")
    g = _X92_NGRAM
    # r5 perf: distinct and self-join on 128-bit md5 fingerprints,
    # not gram text (~3× fewer shuffle bytes; same collision budget
    # as x88/x02 — ≈G²/2¹²⁹, negligible at any real corpus size).
    # Token array lambda-bound (functions.hof.bound): a captured
    # split re-tokenizes per gram position in the interpreted HOF.
    grams = docs.select(
        "source",
        F.explode(
            bound(
                F.split(F.col("text"), " "),
                lambda t: F.transform(
                    F.when(
                        F.size(t) >= g,
                        F.sequence(F.lit(1), F.size(t) - (g - 1)),
                    ).otherwise(F.array().cast("array<int>")),
                    lambda i: F.md5(
                        F.array_join(F.slice(t, i, g), " ").cast("binary")
                    ),
                ),
            )
        ).alias("gram"),
    )
    # r11 single-pass fold (guide §1.2, §3.3): the old shape ran the
    # tokenize → (source, gram) DISTINCT pipeline THREE times — once
    # per consumer (per_src feeding both broadcast sides, and the
    # pair fold) — because collect_set's non-deterministic
    # canonicalization defeats ReuseExchange (verified on the
    # executed plan). Every number the query outputs lives at
    # (source_a, source_b) or (source) grain — at most S²+S rows for
    # S sources, i.e. dim-sized — so ONE explode can emit, per gram,
    # both its ordered source pairs AND a (source, NULL) marker per
    # member; one count aggregate over that explode yields n_shared
    # for every pair (b non-null) and each source's distinct-gram
    # total (b null: gram g counts for source s iff s ∈ ss(g) —
    # exactly "distinct (source, gram)"). The dim-sized result is
    # localCheckpoint'ed eagerly (x100 precedent), so the corpus is
    # tokenized ONCE and everything downstream is S²-row local work.
    gs = grams.groupBy("gram").agg(
        F.array_sort(F.collect_set("source")).alias("ss")
    )
    pair_structs = F.flatten(
        F.transform(
            F.col("ss"),
            lambda x, i: F.transform(
                F.slice(F.col("ss"), i + 2, F.size(F.col("ss"))),
                lambda y: F.struct(x.alias("a"), y.alias("b")),
            ),
        )
    )
    single_structs = F.transform(
        F.col("ss"),
        lambda x: F.struct(
            x.alias("a"), F.lit(None).cast("string").alias("b")
        ),
    )
    counts = (
        gs.select(
            F.explode(F.concat(pair_structs, single_structs)).alias("p")
        )
        .groupBy(F.col("p.a").alias("a"), F.col("p.b").alias("b"))
        .agg(F.count("*").cast("bigint").alias("c"))
        .coalesce(1)
        .localCheckpoint(eager=True)
    )
    pairs = counts.filter(F.col("b").isNotNull()).select(
        F.col("a").alias("source_a"),
        F.col("b").alias("source_b"),
        F.col("c").alias("n_shared"),
    )
    per_src = counts.filter(F.col("b").isNull()).select(
        "a", F.col("c").alias("n_grams")
    )
    sa = per_src.select(
        F.col("a").alias("source_a"), F.col("n_grams").alias("ga")
    )
    sb = per_src.select(
        F.col("a").alias("source_b"), F.col("n_grams").alias("gb")
    )
    return (
        pairs.join(F.broadcast(sa), "source_a")
        .join(F.broadcast(sb), "source_b")
        .select(
            "source_a",
            "source_b",
            "n_shared",
            (
                F.floor(
                    F.col("n_shared") * 10000.0 / F.least("ga", "gb")
                )
                / 10000
            ).alias("containment"),
        )
        .orderBy("source_a", "source_b")
    )


x92_source_ngram_overlap.__doc__ = x92_source_ngram_overlap.__doc__.format(
    g=_X92_NGRAM
)


# ---- x94: duplicate-span REMOVAL (x88 audits, this acts) ----

_X94_SQL = f"""
    WITH toks AS (
      SELECT doc_id, STRING_SPLIT(text, ' ') AS t FROM documents),
    tok AS (
      SELECT doc_id, r.i AS pos, t[r.i] AS tok
      FROM toks, UNNEST(RANGE(1, LEN(t) + 1)) AS r(i)),
    spans AS (
      SELECT doc_id, r.i AS strt,
             ARRAY_TO_STRING(t[r.i:r.i + {_X88_NGRAM - 1}], ' ') AS gram
      FROM toks,
           UNNEST(RANGE(1, GREATEST(LEN(t) - {_X88_NGRAM - 1}, 0) + 1))
             AS r(i)),
    freq AS (
      SELECT gram, COUNT(DISTINCT doc_id) AS nd, MIN(doc_id) AS first
      FROM spans GROUP BY gram),
    rm AS (
      SELECT DISTINCT s.doc_id, s.strt + o.o AS pos
      FROM spans s
      JOIN freq f ON s.gram = f.gram,
           (SELECT UNNEST(RANGE(0, {_X88_NGRAM})) AS o) o
      WHERE f.nd >= 2 AND s.doc_id <> f.first),
    keep AS (
      SELECT tok.doc_id, tok.pos, tok.tok
      FROM tok LEFT JOIN rm
        ON tok.doc_id = rm.doc_id AND tok.pos = rm.pos
      WHERE rm.pos IS NULL),
    rebuilt AS (
      SELECT doc_id, STRING_AGG(tok, ' ' ORDER BY pos) AS clean,
             CAST(COUNT(*) AS BIGINT) AS clean_tokens
      FROM keep GROUP BY doc_id)
    SELECT doc_id, clean_tokens, MD5(clean) AS clean_md5
    FROM rebuilt
    ORDER BY doc_id
    """


@register("x94_span_removal", oracle=_X94_SQL)
def x94_span_removal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ExactSubstr duplicate-span REMOVAL (x88 is the audit; this is
    the act): ``dataprep.remove_dup_spans`` drops every token covered
    by a cross-document duplicated {g}-token sliding span except in
    the span's smallest-id document, then reassembles survivors in
    order. The query fingerprints each surviving doc (token count +
    md5 of the rebuilt text) so coverage semantics, keep-first, and
    reassembly order are hash-checked against the declarative DuckDB
    twin.

    Scale: see remove_dup_spans — constant-factor span/coverage
    explode, one gram-keyed agg, (doc, pos) anti-join, per-doc
    regroup.
    """
    from ..dataprep import remove_dup_spans

    docs = load_table(spark, sf_dir, "documents")
    clean = remove_dup_spans(docs, "doc_id", "text", _X88_NGRAM)
    return clean.select(
        "doc_id",
        F.size(F.split("text", " ")).cast("bigint").alias("clean_tokens"),
        F.md5(F.col("text").cast("binary")).alias("clean_md5"),
    ).orderBy("doc_id")


x94_span_removal.__doc__ = x94_span_removal.__doc__.format(g=_X88_NGRAM)


# ---- x102: per-source unigram-distribution similarity ----

_X102_SQL = """
    WITH tok AS (
      SELECT source, UNNEST(STRING_SPLIT(text, ' ')) AS t FROM documents),
    sc AS (
      SELECT source, t, COUNT(*) AS c FROM tok GROUP BY source, t),
    corpus AS (
      SELECT t, CAST(SUM(c) AS BIGINT) AS cc FROM sc GROUP BY t),
    corpus_norm AS (
      SELECT CAST(SUM(cc * cc) AS BIGINT) AS css FROM corpus),
    per_source AS (
      SELECT s.source,
             CAST(SUM(s.c) AS BIGINT) AS n_tokens,
             CAST(COUNT(*) AS BIGINT) AS vocab,
             CAST(SUM(s.c * g.cc) AS BIGINT) AS dot,
             CAST(SUM(s.c * s.c) AS BIGINT) AS ss
      FROM sc s JOIN corpus g ON s.t = g.t
      GROUP BY s.source)
    SELECT source, n_tokens, vocab,
           ROUND(CAST(dot AS DOUBLE)
                 / (SQRT(CAST(ss AS DOUBLE))
                    * SQRT(CAST((SELECT css FROM corpus_norm) AS DOUBLE))),
                 6) AS cosine_to_corpus,
           ROUND(CAST(n_tokens * n_tokens - ss AS DOUBLE)
                 / (n_tokens * n_tokens), 6) AS gini_diversity
    FROM per_source
    ORDER BY source
    """


@register("x102_source_unigram_cosine", oracle=_X102_SQL)
def x102_source_unigram_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributional data-mixing diagnostic: per source, the cosine
    similarity between its unigram COUNT vector and the corpus-wide
    vector (how representative each source is of the mix — the
    log-free companion to x87's DSIR log-ratios), plus the
    Gini–Simpson diversity 1 − Σp² (probability two random tokens
    differ; low = repetitive source). Every accumulation is exact
    integer; the only float ops are the final IEEE sqrt/divide
    sequence, identical on both engines.

    Scale: one (source, token) partial agg (map-side combine soaks
    the Zipf head), one token-keyed rollup to the corpus vector, one
    same-key join back — all uniform-key; the output is one row per
    source. Counts are BIGINT-safe to ~3·10⁹ corpus tokens per
    squared term; beyond that the sums lift to DECIMAL(38,0) exactly
    like the codebook means (same operand order → same totals).
    """
    docs = load_table(spark, sf_dir, "documents")
    sc = (
        docs.select("source", F.explode(F.split("text", " ")).alias("t"))
        .groupBy("source", "t")
        .agg(F.count("*").alias("c"))
    )
    corpus = sc.groupBy("t").agg(F.sum("c").alias("cc"))
    css = corpus.agg(
        F.sum(F.col("cc") * F.col("cc")).cast("bigint").alias("css")
    )
    per_source = (
        sc.join(corpus, "t")
        .groupBy("source")
        .agg(
            F.sum("c").cast("bigint").alias("n_tokens"),
            F.count("*").cast("bigint").alias("vocab"),
            F.sum(F.col("c") * F.col("cc")).cast("bigint").alias("dot"),
            F.sum(F.col("c") * F.col("c")).cast("bigint").alias("ss"),
        )
    )
    return (
        per_source.crossJoin(F.broadcast(css))
        .select(
            "source",
            "n_tokens",
            "vocab",
            F.round(
                F.col("dot").cast("double")
                / (
                    F.sqrt(F.col("ss").cast("double"))
                    * F.sqrt(F.col("css").cast("double"))
                ),
                6,
            ).alias("cosine_to_corpus"),
            F.round(
                (
                    F.col("n_tokens") * F.col("n_tokens") - F.col("ss")
                ).cast("double")
                / (F.col("n_tokens") * F.col("n_tokens")),
                6,
            ).alias("gini_diversity"),
        )
        .orderBy("source")
    )


# ---- x111: frequent token-pair association (Apriori-pruned) ----

_X111_VOCAB = 50  # frequent-item candidates (Apriori prune)
_X111_TOP = 20  # surfaced pairs


_X111_SQL = f"""
    WITH tok AS (
      SELECT DISTINCT doc_id, UNNEST(STRING_SPLIT(text, ' ')) AS t
      FROM documents),
    df AS (
      SELECT t, COUNT(*) AS n FROM tok GROUP BY t),
    vocab AS (
      SELECT t, n FROM (
        SELECT t, n, ROW_NUMBER() OVER (ORDER BY n DESC, t) AS rn FROM df)
      WHERE rn <= {_X111_VOCAB}),
    dt AS (
      SELECT tok.doc_id, tok.t FROM tok JOIN vocab ON tok.t = vocab.t),
    pairs AS (
      SELECT a.t AS tok_a, b.t AS tok_b, COUNT(*) AS n_ab
      FROM dt a JOIN dt b ON a.doc_id = b.doc_id AND a.t < b.t
      GROUP BY a.t, b.t),
    nn AS (SELECT COUNT(DISTINCT doc_id) AS n_docs FROM tok),
    ranked AS (
      SELECT p.tok_a, p.tok_b, p.n_ab, va.n AS n_a, vb.n AS n_b,
             ROW_NUMBER() OVER (ORDER BY p.n_ab DESC, p.tok_a, p.tok_b)
               AS rnk
      FROM pairs p
      JOIN vocab va ON p.tok_a = va.t
      JOIN vocab vb ON p.tok_b = vb.t)
    SELECT rnk, tok_a, tok_b,
           CAST(n_ab AS BIGINT) AS n_ab,
           CAST(n_a AS BIGINT) AS n_a, CAST(n_b AS BIGINT) AS n_b,
           ROUND(CAST(n_ab * (SELECT n_docs FROM nn) AS DOUBLE)
                 / (n_a * n_b), 6) AS lift
    FROM ranked WHERE rnk <= {_X111_TOP}
    ORDER BY rnk
    """


@register("x111_token_association", oracle=_X111_SQL)
def x111_token_association(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frequent-pair association mining (Agrawal et al., the Apriori
    principle): candidate pairs are restricted to the top-{v}
    document-frequency tokens — a frequent PAIR requires frequent
    members, so the prune is lossless above the implied support floor
    — then co-occurrence counts and LIFT (n_ab·N / (n_a·n_b), exact
    integers, one final division) rank the top {k} associations.
    The market-basket op over documents-as-baskets.

    Scale: the distinct (doc, token) pass is one uniform shuffle; the
    vocab is a {v}-row broadcast, so the per-doc candidate explosion
    is bounded by {v}²/2 REGARDLESS of document length — the Apriori
    prune is what keeps the pair space constant while the corpus
    grows. The pair agg is a skinny (tok_a, tok_b) shuffle.
    r11 (guide §1.2/§2.3/§5): the driver-side count() action becomes
    a 1-row broadcast (no collect in the query path, one lineage
    fewer), and the pair stream comes from intra-array emission over
    each doc's sorted vocab-token set (the x02/x173 pattern —
    ≤{v} entries/doc) instead of a doc-keyed self-join, so the
    candidate stream crosses ONE exchange and no join. (Persisting
    the distinct relation was tried and measured 40% WORSE — cache
    write + frozen partitioning, the x87 lesson.)
    """
    docs = load_table(spark, sf_dir, "documents")
    tok = docs.select(
        "doc_id", F.explode(F.split("text", " ")).alias("t")
    ).distinct()
    df = tok.groupBy("t").agg(F.count("*").alias("n"))
    vocab = (
        df.withColumn(
            "rn", F.row_number().over(Window.orderBy(F.desc("n"), "t"))
        )
        .filter(F.col("rn") <= _X111_VOCAB)
        .select("t", "n")
    )
    nd = tok.agg(F.countDistinct("doc_id").alias("__nd"))
    dt = tok.join(F.broadcast(vocab.select("t")), "t")
    sets = dt.groupBy("doc_id").agg(
        F.array_sort(F.collect_set("t")).alias("ts")
    )
    pairs = (
        sets.select("ts", F.posexplode("ts").alias("i", "tok_a"))
        .select(
            "tok_a",
            F.explode(
                F.slice("ts", F.col("i") + 2, F.size("ts"))
            ).alias("tok_b"),
        )
        .groupBy("tok_a", "tok_b")
        .agg(F.count("*").alias("n_ab"))
    )
    va = vocab.select(F.col("t").alias("tok_a"), F.col("n").alias("n_a"))
    vb = vocab.select(F.col("t").alias("tok_b"), F.col("n").alias("n_b"))
    ranked = (
        pairs.join(F.broadcast(va), "tok_a")
        .join(F.broadcast(vb), "tok_b")
        .crossJoin(F.broadcast(nd))
        .withColumn(
            "rnk",
            F.row_number().over(
                Window.orderBy(F.desc("n_ab"), "tok_a", "tok_b")
            ),
        )
        .filter(F.col("rnk") <= _X111_TOP)
    )
    out = ranked.select(
        "rnk",
        "tok_a",
        "tok_b",
        F.col("n_ab").cast("bigint").alias("n_ab"),
        F.col("n_a").cast("bigint").alias("n_a"),
        F.col("n_b").cast("bigint").alias("n_b"),
        F.round(
            (F.col("n_ab") * F.col("__nd")).cast("double")
            / (F.col("n_a") * F.col("n_b")),
            6,
        ).alias("lift"),
    ).orderBy("rnk")
    return out


x111_token_association.__doc__ = x111_token_association.__doc__.format(
    v=_X111_VOCAB, k=_X111_TOP
)


# ---- x112: per-source length-distribution drift (KS statistic) ----


_X112_SQL = """
    WITH vals AS (
      SELECT source, n_chars FROM documents),
    pts AS (
      SELECT DISTINCT n_chars AS x FROM vals),
    totals AS (
      SELECT source, COUNT(*) AS ns FROM vals GROUP BY source),
    n AS (SELECT COUNT(*) AS n_all FROM vals),
    src_cdf AS (
      SELECT t.source, p.x,
             (SELECT COUNT(*) FROM vals v
              WHERE v.source = t.source AND v.n_chars <= p.x) AS cs
      FROM totals t CROSS JOIN pts p),
    all_cdf AS (
      SELECT p.x,
             (SELECT COUNT(*) FROM vals v WHERE v.n_chars <= p.x) AS ca
      FROM pts p),
    gaps AS (
      SELECT s.source,
             ABS(CAST(s.cs AS DOUBLE) / t.ns
                 - CAST(a.ca AS DOUBLE) / (SELECT n_all FROM n)) AS gap,
             s.x
      FROM src_cdf s
      JOIN totals t ON s.source = t.source
      JOIN all_cdf a ON s.x = a.x),
    best AS (
      SELECT source, gap, x,
             ROW_NUMBER() OVER (PARTITION BY source
                                ORDER BY gap DESC, x) AS rn
      FROM gaps)
    SELECT source, ROUND(gap, 6) AS ks_stat,
           CAST(x AS BIGINT) AS at_length
    FROM best WHERE rn = 1
    ORDER BY source
    """


@register("x112_source_drift_ks", oracle=_X112_SQL)
def x112_source_drift_ks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution-drift detector: the two-sample Kolmogorov–Smirnov
    statistic between each source's document-length distribution and
    the corpus — max |CDF_source − CDF_corpus| over observed lengths,
    with the length where the gap peaks. The monitoring gate that
    catches a source whose new crawl suddenly ships truncated or
    concatenated documents. Each gap is two integer-ratio divisions
    and a subtraction (fixed IEEE sequence → bit-identical); the
    argmax ties break on length.

    Scale: CDFs come from one (source, length) partial agg + a
    cumulative-sum window per source over the DISTINCT length grid —
    the grid is bounded by the value domain, not the corpus; the
    corpus CDF joins back on the uniform length key. (The oracle
    spells the CDFs as correlated subqueries for clarity; the engine
    uses the window form — same values.)
    """
    docs = load_table(spark, sf_dir, "documents")
    vals = docs.select("source", "n_chars")
    pts = vals.select(F.col("n_chars").alias("x")).distinct()
    totals = vals.groupBy("source").agg(F.count("*").alias("ns"))
    n_all = vals.count()

    # per-(source, length) counts -> per-source running CDF over the
    # FULL length grid (cross join with pts fills gaps, cumsum window)
    sc = vals.groupBy("source", F.col("n_chars").alias("x")).agg(
        F.count("*").alias("c")
    )
    grid = totals.select("source", "ns").crossJoin(pts)
    w_src = (
        Window.partitionBy("source")
        .orderBy("x")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    src_cdf = (
        grid.join(sc, ["source", "x"], "left")
        .select(
            "source",
            "ns",
            "x",
            F.coalesce("c", F.lit(0)).alias("c"),
        )
        .withColumn("cs", F.sum("c").over(w_src))
    )
    w_all = Window.orderBy("x").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    all_cdf = (
        vals.groupBy(F.col("n_chars").alias("x"))
        .agg(F.count("*").alias("ca_x"))
        .withColumn("ca", F.sum("ca_x").over(w_all))
        .select("x", "ca")
    )
    gaps = src_cdf.join(all_cdf, "x").select(
        "source",
        "x",
        F.abs(
            F.col("cs").cast("double") / F.col("ns")
            - F.col("ca").cast("double") / F.lit(n_all)
        ).alias("gap"),
    )
    wb = Window.partitionBy("source").orderBy(F.desc("gap"), "x")
    return (
        gaps.withColumn("rn", F.row_number().over(wb))
        .filter(F.col("rn") == 1)
        .select(
            "source",
            F.round("gap", 6).alias("ks_stat"),
            F.col("x").cast("bigint").alias("at_length"),
        )
        .orderBy("source")
    )


# ---- x114: cross-table referential-integrity audit ----


_X114_SQL = """
    WITH d AS (SELECT doc_id FROM documents),
    v AS (SELECT vec_id FROM embeddings),
    m AS (SELECT COUNT(*) AS matched
          FROM d JOIN v ON d.doc_id = v.vec_id)
    SELECT CAST((SELECT COUNT(*) FROM d) AS BIGINT) AS n_docs,
           CAST((SELECT COUNT(*) FROM v) AS BIGINT) AS n_vecs,
           CAST((SELECT matched FROM m) AS BIGINT) AS matched,
           CAST((SELECT COUNT(*) FROM d
                 WHERE doc_id NOT IN (SELECT vec_id FROM v)) AS BIGINT)
             AS docs_without_vec,
           CAST((SELECT COUNT(*) FROM v
                 WHERE vec_id NOT IN (SELECT doc_id FROM d)) AS BIGINT)
             AS vecs_without_doc,
           ROUND(CAST((SELECT matched FROM m) AS DOUBLE)
                 / (SELECT COUNT(*) FROM d), 6) AS doc_coverage
    """


@register("x114_embedding_integrity", oracle=_X114_SQL)
def x114_embedding_integrity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Referential-integrity audit between the text corpus and its
    embedding table (the dbt-style relationship test a multimodal /
    RAG pipeline runs before training): match counts and both orphan
    directions (documents never embedded — the backfill queue — and
    embeddings whose document was deleted — the tombstone queue),
    plus doc-side coverage. On the fixtures this is non-trivial: the
    embedding table stays 500 rows while documents scale, exactly the
    lag a real ingestion pipeline shows.

    Scale: ONE full-outer join on the uniform id key feeds every
    counter in a single agg — no per-metric jobs, no driver math; at
    100 TB both sides bucket by id and the audit is co-partitioned.
    Output is a single row of counters.
    """
    d = load_table(spark, sf_dir, "documents").select("doc_id")
    v = load_table(spark, sf_dir, "embeddings").select("vec_id")
    fo = d.join(v, d["doc_id"] == v["vec_id"], "full")
    return fo.agg(
        F.count("doc_id").cast("bigint").alias("n_docs"),
        F.count("vec_id").cast("bigint").alias("n_vecs"),
        F.sum(
            F.when(
                F.col("doc_id").isNotNull() & F.col("vec_id").isNotNull(), 1
            ).otherwise(0)
        )
        .cast("bigint")
        .alias("matched"),
        F.sum(F.when(F.col("vec_id").isNull(), 1).otherwise(0))
        .cast("bigint")
        .alias("docs_without_vec"),
        F.sum(F.when(F.col("doc_id").isNull(), 1).otherwise(0))
        .cast("bigint")
        .alias("vecs_without_doc"),
    ).select(
        "n_docs",
        "n_vecs",
        "matched",
        "docs_without_vec",
        "vecs_without_doc",
        F.round(
            F.col("matched").cast("double") / F.col("n_docs"), 6
        ).alias("doc_coverage"),
    )


# ---- x119: term burstiness (variance-to-mean ratio) ----

_X119_TOP = 20


_X119_SQL = f"""
    WITH tok AS (
      SELECT doc_id, UNNEST(STRING_SPLIT(text, ' ')) AS t FROM documents),
    per_doc AS (
      SELECT t, doc_id, COUNT(*) AS c FROM tok GROUP BY t, doc_id),
    nn AS (SELECT COUNT(DISTINCT doc_id) AS n FROM tok),
    stats AS (
      SELECT t,
             CAST(COUNT(*) AS BIGINT) AS df,
             CAST(SUM(c) AS BIGINT) AS s1,
             CAST(SUM(c * c) AS BIGINT) AS s2
      FROM per_doc GROUP BY t),
    scored AS (
      SELECT t, df, s1, s2,
             ROUND(CAST((SELECT n FROM nn) * s2 - s1 * s1 AS DOUBLE)
                   / ((SELECT n FROM nn) * s1), 6) AS burstiness
      FROM stats),
    ranked AS (
      SELECT t, df, s1 AS cf, burstiness,
             ROW_NUMBER() OVER (ORDER BY burstiness DESC, t) AS rnk
      FROM scored)
    SELECT rnk, t AS term, df, cf, burstiness
    FROM ranked WHERE rnk <= {_X119_TOP}
    ORDER BY rnk
    """


@register("x119_term_burstiness", oracle=_X119_SQL)
def x119_term_burstiness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Term burstiness (Church & Gale's variance-to-mean ratio over
    per-document counts, zeros included): VMR = 1 for a Poisson
    "background" term, ≫1 for topical terms that cluster in few
    documents — the statistic content-vs-function-word weighting
    schemes are built on. With per-doc sums S1/S2 over N docs,
    VMR = (N·S2 − S1²)/(N·S1): EXACT integer arithmetic with one
    final division, ranked by the rational value with term tiebreak.

    Scale: one (term, doc) partial agg and one term rollup — both
    uniform keys; top-{k} via a single-pass rank on the term table
    (vocabulary-sized, not corpus-sized).
    """
    docs = load_table(spark, sf_dir, "documents")
    tok = docs.select("doc_id", F.explode(F.split("text", " ")).alias("t"))
    per_doc = tok.groupBy("t", "doc_id").agg(F.count("*").alias("c"))
    n_docs = docs.select("doc_id").distinct().count()
    stats = per_doc.groupBy("t").agg(
        F.count("*").cast("bigint").alias("df"),
        F.sum("c").cast("bigint").alias("s1"),
        F.sum(F.col("c") * F.col("c")).cast("bigint").alias("s2"),
    )
    scored = stats.select(
        "t",
        "df",
        F.col("s1").alias("cf"),
        F.round(
            (n_docs * F.col("s2") - F.col("s1") * F.col("s1")).cast("double")
            / (n_docs * F.col("s1")),
            6,
        ).alias("burstiness"),
    )
    w = Window.orderBy(F.desc("burstiness"), "t")
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= _X119_TOP)
        .select("rnk", F.col("t").alias("term"), "df", "cf", "burstiness")
        .orderBy("rnk")
    )


x119_term_burstiness.__doc__ = x119_term_burstiness.__doc__.format(
    k=_X119_TOP
)


# ---- x132: content-novelty decay over ingestion order ----

_X132_G = 8  # shingle width (matches x88's span granularity)
_X132_BUCKET = 50  # docs per ingestion bucket


_X132_SQL = f"""
    WITH toks AS (
      SELECT doc_id, doc_id // {_X132_BUCKET} AS bucket,
             STRING_SPLIT(text, ' ') AS t
      FROM documents),
    grams AS (
      SELECT DISTINCT bucket,
             MD5(UNNEST(LIST_TRANSFORM(
               RANGE(1, GREATEST(LEN(t) - {_X132_G - 1}, 0) + 1),
               i -> ARRAY_TO_STRING(t[i:i + {_X132_G - 1}], ' ')))) AS fp
      FROM toks),
    first_seen AS (
      SELECT fp, MIN(bucket) AS first_bucket FROM grams GROUP BY fp),
    flags AS (
      SELECT g.bucket,
             CASE WHEN g.bucket = f.first_bucket THEN 1 ELSE 0 END AS is_new
      FROM grams g JOIN first_seen f ON g.fp = f.fp)
    SELECT CAST(bucket AS BIGINT) AS bucket,
           CAST(COUNT(*) AS BIGINT) AS n_grams,
           CAST(SUM(is_new) AS BIGINT) AS n_new,
           ROUND(CAST(SUM(is_new) AS DOUBLE) / COUNT(*), 6) AS novelty
    FROM flags
    GROUP BY bucket
    ORDER BY bucket
    """


@register("x132_novelty_decay", oracle=_X132_SQL)
def x132_novelty_decay(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Content-novelty decay: per ingestion bucket, the fraction of
    its distinct {g}-token shingles NEVER seen in an earlier bucket
    (x91's first-occurrence trick at x88's span granularity) — the
    crawl-value curve. x118 asks "are whole docs repeating?"; this
    asks "is the crawl still adding new CONTENT?", which decays
    first: near-dup pages drag novelty down long before exact dup
    rates move. Shingles shuffle as md5 fingerprints (x88's budget).

    Scale: distinct (bucket, fp) is one uniform-key agg; first-seen
    is a second agg on fp; the flag join re-keys on fp — every stage
    ∝ corpus shingles, and the cumulative question costs no window
    at all (MIN does it).
    """
    from ..functions.hof import bound

    docs = load_table(spark, sf_dir, "documents")
    g = _X132_G
    # token array lambda-bound (functions.hof.bound): a captured split
    # re-tokenizes per shingle position in the interpreted HOF
    grams = (
        docs.select(
            (F.col("doc_id") / _X132_BUCKET).cast("bigint").alias("bucket"),
            F.explode(
                bound(
                    F.split(F.col("text"), " "),
                    lambda t: F.transform(
                        F.when(
                            F.size(t) >= g,
                            F.sequence(F.lit(1), F.size(t) - (g - 1)),
                        ).otherwise(F.array().cast("array<int>")),
                        lambda i: F.md5(
                            F.array_join(F.slice(t, i, g), " ").cast("binary")
                        ),
                    ),
                )
            ).alias("fp"),
        )
        .distinct()
    )
    first_seen = grams.groupBy("fp").agg(
        F.min("bucket").alias("first_bucket")
    )
    flags = grams.join(first_seen, "fp").select(
        "bucket",
        F.when(F.col("bucket") == F.col("first_bucket"), 1)
        .otherwise(0)
        .alias("is_new"),
    )
    return (
        flags.groupBy("bucket")
        .agg(
            F.count("*").cast("bigint").alias("n_grams"),
            F.sum("is_new").cast("bigint").alias("n_new"),
            F.round(
                F.sum("is_new").cast("double") / F.count("*"), 6
            ).alias("novelty"),
        )
        .orderBy("bucket")
    )


x132_novelty_decay.__doc__ = x132_novelty_decay.__doc__.format(g=_X132_G)


# ---- x136: two-proportion z-test per source ----


_X136_SQL = """
    WITH flags AS (
      SELECT source, CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS pos
      FROM documents),
    per_src AS (
      SELECT source, CAST(COUNT(*) AS BIGINT) AS n1,
             CAST(SUM(pos) AS BIGINT) AS x1
      FROM flags GROUP BY source),
    tot AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n_all,
             CAST(SUM(pos) AS BIGINT) AS x_all
      FROM flags),
    z AS (
      SELECT s.source, s.n1, s.x1,
             (CAST(s.x1 AS DOUBLE) / s.n1
              - CAST(t.x_all - s.x1 AS DOUBLE) / (t.n_all - s.n1))
             / SQRT((CAST(t.x_all AS DOUBLE) / t.n_all)
                    * (1 - CAST(t.x_all AS DOUBLE) / t.n_all)
                    * (1.0 / s.n1 + 1.0 / (t.n_all - s.n1))) AS zval
      FROM per_src s, tot t)
    SELECT source, n1 AS n_docs, x1 AS n_en,
           ROUND(zval, 6) AS z,
           CASE WHEN ABS(zval) > 1.96 THEN 1 ELSE 0 END AS significant
    FROM z
    ORDER BY source
    """


@register("x136_proportion_ztest", oracle=_X136_SQL)
def x136_proportion_ztest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-proportion z-test per source (the A/B-test significance
    primitive): each source's English share tested against the rest
    of the corpus under the pooled-proportion null — z from exact
    integer counts through ONE fixed float sequence (divisions,
    sqrt), with the 5 % two-sided flag. The experimentation-stats leg
    of the monitoring family: x112 asks "did the DISTRIBUTION move",
    this asks "is THIS group's rate credibly different".

    Scale: one source-keyed agg + a 1-row corpus broadcast; the test
    itself is S rows of arithmetic.
    """
    docs = load_table(spark, sf_dir, "documents")
    flags = docs.select(
        "source",
        F.when(F.col("lang") == "en", 1).otherwise(0).alias("pos"),
    )
    per_src = flags.groupBy("source").agg(
        F.count("*").cast("bigint").alias("n1"),
        F.sum("pos").cast("bigint").alias("x1"),
    )
    tot = flags.agg(
        F.count("*").cast("bigint").alias("n_all"),
        F.sum("pos").cast("bigint").alias("x_all"),
    )
    p_pool = F.col("x_all").cast("double") / F.col("n_all")
    zval = (
        F.col("x1").cast("double") / F.col("n1")
        - (F.col("x_all") - F.col("x1")).cast("double")
        / (F.col("n_all") - F.col("n1"))
    ) / F.sqrt(
        p_pool
        * (1 - p_pool)
        * (1.0 / F.col("n1") + 1.0 / (F.col("n_all") - F.col("n1")))
    )
    return (
        per_src.crossJoin(F.broadcast(tot))
        .select(
            "source",
            F.col("n1").alias("n_docs"),
            F.col("x1").alias("n_en"),
            F.round(zval, 6).alias("z"),
            F.when(F.abs(zval) > 1.96, 1).otherwise(0).alias("significant"),
        )
        .orderBy("source")
    )


# ---- x142: MAD robust outlier detection ----


_X142_SQL = """
    WITH v AS (SELECT doc_id, source, n_chars FROM documents),
    med AS (
      SELECT n_chars AS m FROM (
        SELECT n_chars,
               ROW_NUMBER() OVER (ORDER BY n_chars, doc_id) AS rn,
               COUNT(*) OVER () AS n
        FROM v)
      WHERE rn = (n + 1) // 2),
    dev AS (
      SELECT v.doc_id, v.source,
             ABS(v.n_chars - (SELECT m FROM med)) AS ad
      FROM v),
    mad AS (
      SELECT ad AS m FROM (
        SELECT ad,
               ROW_NUMBER() OVER (ORDER BY ad, doc_id) AS rn,
               COUNT(*) OVER () AS n
        FROM dev)
      WHERE rn = (n + 1) // 2)
    SELECT source,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(MAX((SELECT m FROM med)) AS BIGINT) AS median_chars,
           CAST(MAX((SELECT m FROM mad)) AS BIGINT) AS mad_chars,
           CAST(SUM(CASE WHEN ad * 10000 > 44478 * (SELECT m FROM mad)
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers
    FROM dev
    GROUP BY source
    ORDER BY source
    """


@register("x142_mad_outliers", oracle=_X142_SQL)
def x142_mad_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust outlier detection via median absolute deviation: the
    corpus median and MAD of document length are EXACT lower-median
    rank statistics (integer), and a document is an outlier when its
    robust z exceeds 3 — tested as the integer cross-multiplication
    ``|x − med|·10000 > 44478·MAD`` (3/0.6745 = 4.4478…), so no
    float ever enters. Robust statistics are what length-gates
    should use: mean/stddev (x113's tool, right for rates) get
    dragged by the very outliers a heavy-tailed length distribution
    is being screened for.

    Scale: two global rank windows (median, then MAD — the honest
    double-sort of exact medians; x104's histogram is the one-pass
    approximate route) + a per-source count rollup.
    """
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "source", "n_chars"
    )
    from pyspark.sql.window import Window

    def lower_median(df, col, tiebreak):
        w = Window.orderBy(col, tiebreak)
        ranked = df.select(
            F.col(col).alias("__v"),
            F.row_number().over(w).alias("__rn"),
            F.count("*").over(Window.partitionBy()).alias("__n"),
        )
        return ranked.filter(
            F.col("__rn") == F.expr("(__n + 1) DIV 2")
        ).select(F.col("__v").alias("m"))

    med = lower_median(docs, "n_chars", "doc_id")
    dev = docs.crossJoin(F.broadcast(med)).select(
        "doc_id",
        "source",
        F.abs(F.col("n_chars") - F.col("m")).alias("ad"),
        F.col("m").alias("median_chars"),
    )
    mad = lower_median(dev, "ad", "doc_id").withColumnRenamed("m", "mad")
    return (
        dev.crossJoin(F.broadcast(mad))
        .groupBy("source")
        .agg(
            F.count("*").cast("bigint").alias("n_docs"),
            F.max("median_chars").cast("bigint").alias("median_chars"),
            F.max("mad").cast("bigint").alias("mad_chars"),
            F.sum(
                F.when(
                    F.col("ad") * 10000 > 44478 * F.col("mad"), 1
                ).otherwise(0)
            )
            .cast("bigint")
            .alias("n_outliers"),
        )
        .orderBy("source")
    )


# ---- x144: sample-ratio-mismatch check on the hash split ----


_X144_SQL = """
    WITH f AS (
      SELECT source,
             CAST(('0x' || SUBSTR(MD5(CAST(doc_id AS VARCHAR)), 1, 15))
                  AS BIGINT) % 2 AS fold
      FROM documents),
    cells AS (
      SELECT source,
             CAST(SUM(CASE WHEN fold = 0 THEN 1 ELSE 0 END) AS BIGINT)
               AS n0,
             CAST(SUM(CASE WHEN fold = 1 THEN 1 ELSE 0 END) AS BIGINT)
               AS n1
      FROM f GROUP BY source)
    SELECT source, n0, n1,
           ROUND(CAST((n0 - n1) * (n0 - n1) AS DOUBLE) / (n0 + n1), 6)
             AS chi2,
           CASE WHEN (n0 - n1) * (n0 - n1) * 100 > 384 * (n0 + n1)
                THEN 1 ELSE 0 END AS srm_flag
    FROM cells
    ORDER BY source
    """


@register("x144_srm_check", oracle=_X144_SQL)
def x144_srm_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sample-ratio-mismatch check (the experimentation guardrail
    run before ANY A/B readout): the x41-style md5 fold split tested
    against its designed 50/50 ratio per source with the two-cell
    chi-square, which collapses to (n0−n1)²/n — one division; the
    5 % flag is the integer cross-multiplication (n0−n1)²·100 >
    384·n, float-free. A flagged source means the splitter is biased
    for it and every downstream comparison (x136's z-tests) is
    suspect — test the instrument before the readout.

    Scale: one narrow fold computation + a per-source two-cell agg.
    """
    docs = load_table(spark, sf_dir, "documents")
    fold = (
        F.conv(
            F.substring(F.md5(F.col("doc_id").cast("string")), 1, 15), 16, 10
        ).cast("bigint")
        % 2
    )
    cells = (
        docs.select("source", fold.alias("fold"))
        .groupBy("source")
        .agg(
            F.sum(F.when(F.col("fold") == 0, 1).otherwise(0))
            .cast("bigint")
            .alias("n0"),
            F.sum(F.when(F.col("fold") == 1, 1).otherwise(0))
            .cast("bigint")
            .alias("n1"),
        )
    )
    diff2 = (F.col("n0") - F.col("n1")) * (F.col("n0") - F.col("n1"))
    return cells.select(
        "source",
        "n0",
        "n1",
        F.round(
            diff2.cast("double") / (F.col("n0") + F.col("n1")), 6
        ).alias("chi2"),
        F.when(
            diff2 * 100 > 384 * (F.col("n0") + F.col("n1")), 1
        )
        .otherwise(0)
        .alias("srm_flag"),
    ).orderBy("source")
