"""Byte-pair-encoding tokenizer: distributed training statistics,
sequential merge selection, distributed encode.

The classic BPE formulation (Sennrich et al., ACL 2016) trains on the
WORD-FREQUENCY DICTIONARY, not the raw corpus: merge decisions depend
only on (word, count) pairs, and natural-language word frequency is
Zipfian, so a top-K dictionary carries almost all pair mass. That
split is what makes BPE trainable over 100 TB:

- the word count is one distributed ``split → explode → groupBy``
  aggregation (partial-agg shuffle, the same shape as x26's
  vocabulary query);
- only the top-K (count, word) rows cross to the driver — a BOUNDED
  collect, the same constant-budget class as the CMS sketch rows, K
  being the training-dictionary knob every production BPE trainer
  exposes;
- the greedy merge loop itself is INHERENTLY sequential (merge i+1's
  pair counts depend on merge i), so it runs driver-side over the
  ≤K-word dict — O(K·merges) on thousands of words, milliseconds;
- encoding broadcasts the merge ranks and runs ``mapInPandas``
  (Arrow-batched, per-word LRU cache — Zipf again: a few thousand
  distinct words cover almost every token), fully parallel, no
  shuffle.

Determinism: ties between equally-frequent pairs break
lexicographically, so the merge list is a pure function of the
dictionary — equal corpora give byte-equal tokenizers on any cluster
layout.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_END = "</w>"  # end-of-word sentinel, per the original formulation


def word_counts(docs: DataFrame, text_col: str, top_k: int) -> list:
    """Distributed word-frequency dictionary: one explode + groupBy,
    top-K rows by (count desc, word asc — deterministic ties) to the
    driver. Returns [(word, count)]."""
    rows = (
        docs.select(
            F.explode(
                F.filter(F.split(F.col(text_col), r"\s+"), lambda t: t != "")
            ).alias("w")
        )
        .groupBy("w")
        .agg(F.count("*").alias("c"))
        .orderBy(F.desc("c"), F.asc("w"))
        .limit(top_k)
        .collect()
    )
    return [(r["w"], r["c"]) for r in rows]


def train_bpe(docs: DataFrame, text_col: str, n_merges: int,
              top_k: int = 10000,
              scorer: str = "bpe") -> list[tuple[str, str]]:
    """Learn ``n_merges`` merges from the corpus. Returns the ordered
    merge list — rank i is the pair merged at step i, the whole state
    of the tokenizer. ``scorer='bpe'`` picks the most frequent pair
    (Sennrich); ``scorer='wordpiece'`` picks the pair maximizing
    count(ab)/(count(a)·count(b)) — the likelihood criterion BERT's
    tokenizer trains with, which favors pairs that predict each other
    over merely common ones. The wordpiece score is compared as an
    exact rational (stdlib Fraction), never a float, so ties and
    near-ties resolve identically on every host."""
    if scorer not in ("bpe", "wordpiece"):
        raise ValueError(f"unknown scorer {scorer!r}")
    from fractions import Fraction

    dict_rows = word_counts(docs, text_col, top_k)
    # symbol sequences per dict word; merges rewrite these in place
    seqs = {w: tuple(w) + (_END,) for w, _ in dict_rows}
    counts = dict(dict_rows)
    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        pair_counts: dict[tuple[str, str], int] = {}
        sym_counts: dict[str, int] = {}
        for w, seq in seqs.items():
            c = counts[w]
            for i in range(len(seq) - 1):
                p = (seq[i], seq[i + 1])
                pair_counts[p] = pair_counts.get(p, 0) + c
            for s in seq:
                sym_counts[s] = sym_counts.get(s, 0) + c
        if not pair_counts:
            break
        if scorer == "bpe":
            # max count, lexicographic tie-break → deterministic
            key = lambda kv: (-kv[1], kv[0])  # noqa: E731
        else:
            key = lambda kv: (  # noqa: E731
                -Fraction(kv[1], sym_counts[kv[0][0]] * sym_counts[kv[0][1]]),
                kv[0],
            )
        best = min(pair_counts.items(), key=key)[0]
        merges.append(best)
        merged = best[0] + best[1]
        for w, seq in seqs.items():
            if best[0] not in seq:
                continue
            out = []
            i = 0
            while i < len(seq):
                if (i + 1 < len(seq)
                        and seq[i] == best[0] and seq[i + 1] == best[1]):
                    out.append(merged)
                    i += 2
                else:
                    out.append(seq[i])
                    i += 1
            seqs[w] = tuple(out)
    return merges


def _encode_word(word: str, ranks: dict[tuple[str, str], int]) -> list[str]:
    """Apply merges to one word by ascending rank — the standard
    greedy loop: repeatedly merge the lowest-ranked adjacent pair."""
    seq = list(word) + [_END]
    while len(seq) > 1:
        best_rank = None
        best_i = -1
        for i in range(len(seq) - 1):
            r = ranks.get((seq[i], seq[i + 1]))
            if r is not None and (best_rank is None or r < best_rank):
                best_rank = r
                best_i = i
        if best_rank is None:
            break
        seq[best_i : best_i + 2] = [seq[best_i] + seq[best_i + 1]]
    return seq


def encode_bpe(docs: DataFrame, text_col: str,
               merges: list[tuple[str, str]],
               out_col: str = "bpe_tokens") -> DataFrame:
    """Tokenize ``text_col`` with a trained merge list → an
    ``array<string>`` column of BPE tokens (``</w>``-terminated
    subwords). The merge ranks ride the closure to every worker
    (constant size — n_merges entries); per-word results are memoized
    per batch, so Zipfian corpora pay the merge loop only once per
    DISTINCT word, not per occurrence. Narrow map, no shuffle."""
    ranks = {tuple(p): i for i, p in enumerate(merges)}
    cols = docs.columns

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cache: dict[str, list[str]] = {}
        for pdf in batches:
            toks = []
            for text in pdf[text_col]:
                out: list[str] = []
                for w in str(text).split():
                    got = cache.get(w)
                    if got is None:
                        got = _encode_word(w, ranks)
                        cache[w] = got
                    out.extend(got)
                toks.append(out)
            pdf = pdf.copy()
            pdf[out_col] = toks
            yield pdf

    schema = ", ".join(
        f"{f.name} {f.dataType.simpleString()}" for f in docs.schema.fields
    ) + f", {out_col} ARRAY<STRING>"
    return docs.mapInPandas(fn, schema).select(*cols, out_col)
