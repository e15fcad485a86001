"""Byte-pair-encoding tokenizer: distributed training corpus -> merges ->
distributed encoding (Sennrich, Haddow, Birch 2016, "Neural Machine
Translation of Rare Words with Subword Units").

Why it belongs in a training-data engine: token *counts* under the actual
production tokenizer are the unit of accounting for LLM data (mixing
weights, packing, pricing), and the tokenizer itself is fit on the corpus.

Scale design — the corpus is never touched by Python:

1. **Word counts** (`train_bpe`): one explode + groupBy over the corpus
   (exact, partition-invariant).  BPE training only ever needs the
   *distinct-word frequency table* (Heaps' law: ~1e5-1e7 rows for a
   ~1e11-token corpus), which is collected to the driver under a
   ``max_words`` fail-fast guard — the same bounded-collect contract as
   the Bloom probe list.  ``min_count`` prunes the hapax tail first;
   singleton words cannot influence early merges at web scale.
2. **Merge training** runs on the driver over that table with
   incremental pair-count maintenance.  Deterministic: ties break on
   (count DESC, pair ASC), so the merge list is a pure function of the
   word-count table.
3. **Encoding** (`bpe_encode_words` / `bpe_token_counts`): the corpus's
   *distinct* words are encoded once by an Arrow-batched pandas UDF (the
   ranks table is a tiny broadcast closure; per-batch memoisation), then
   joined back — per-document work is pure Catalyst join + sum.  A
   100 TB corpus encodes ~1e7 distinct words in Python and 1e11 running
   words JVM-side.

Symbols are characters plus a terminal ``</w>`` end-of-word marker;
decoding is concatenation with ``</w> -> space``, so
``decode(encode(w)) == w`` exactly — the self-certifying invariant the
gate query emits.
"""

from __future__ import annotations

from collections import Counter, defaultdict

import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql.types import ArrayType, StringType

from .dedup import word_tokens

__all__ = [
    "train_bpe",
    "encode_word",
    "bpe_encode_words",
    "bpe_token_counts",
    "bpe_tokenize_docs",
]

EOW = "</w>"


# ------------------------------------------------------------------ train


def _pairs_of(syms: tuple[str, ...]) -> list[tuple[str, str]]:
    return [(syms[i], syms[i + 1]) for i in range(len(syms) - 1)]


def _merge_syms(
    syms: tuple[str, ...], pair: tuple[str, str]
) -> tuple[str, ...]:
    """Replace non-overlapping occurrences of ``pair`` left-to-right."""
    a, b = pair
    out: list[str] = []
    i = 0
    while i < len(syms):
        if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
            out.append(a + b)
            i += 2
        else:
            out.append(syms[i])
            i += 1
    return tuple(out)


def train_bpe_from_counts(
    word_counts: dict[str, int], num_merges: int
) -> list[tuple[str, str]]:
    """Learn up to ``num_merges`` merges from a word-frequency table.

    Pure-Python core (driver-side), incremental pair-count maintenance:
    each merge only rescans the words that contain the merged pair.
    """
    words: list[tuple[str, ...]] = []
    counts: list[int] = []
    for w, c in word_counts.items():
        if w:
            words.append(tuple(w) + (EOW,))
            counts.append(int(c))

    pair_counts: Counter = Counter()
    where: defaultdict[tuple[str, str], set[int]] = defaultdict(set)
    for idx, (syms, c) in enumerate(zip(words, counts)):
        for p in _pairs_of(syms):
            pair_counts[p] += c
            where[p].add(idx)

    merges: list[tuple[str, str]] = []
    for _ in range(num_merges):
        live = [(p, c) for p, c in pair_counts.items() if c > 0]
        if not live:
            break
        # deterministic: highest count, then lexicographically smallest
        best = min(live, key=lambda pc: (-pc[1], pc[0]))[0]
        merges.append(best)
        for idx in list(where[best]):
            syms, c = words[idx], counts[idx]
            for p in _pairs_of(syms):
                pair_counts[p] -= c
                where[p].discard(idx)
            syms = _merge_syms(syms, best)
            words[idx] = syms
            for p in _pairs_of(syms):
                pair_counts[p] += c
                where[p].add(idx)
    return merges


def train_bpe(
    df: DataFrame,
    text_col: str = "text",
    num_merges: int = 200,
    min_count: int = 1,
    max_words: int = 2_000_000,
) -> list[tuple[str, str]]:
    """Fit BPE merges on a corpus DataFrame (see module docstring).

    Raises if the distinct-word table exceeds ``max_words`` — raise
    ``min_count`` (or pre-filter) rather than silently collecting an
    unbounded table to the driver.
    """
    words = (
        df.select(F.explode(word_tokens(F.col(text_col))).alias("w"))
        .where(F.col("w") != "")
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("c"))
        .where(F.col("c") >= min_count)
    )
    n = words.count()
    if n > max_words:
        raise ValueError(
            f"distinct-word table has {n} rows > max_words={max_words}; "
            "raise min_count to bound the driver collect"
        )
    wc = {r["w"]: r["c"] for r in words.collect()}
    return train_bpe_from_counts(wc, num_merges)


# ----------------------------------------------------------------- encode


def encode_word(word: str, ranks: dict[tuple[str, str], int]) -> list[str]:
    """Greedy lowest-rank-first merging — equivalent to replaying the
    training merges in order (each training step merges the best pair
    everywhere before the next is chosen)."""
    syms = list(word) + [EOW]
    while len(syms) > 1:
        best_rank = None
        best_pair = None
        for i in range(len(syms) - 1):
            r = ranks.get((syms[i], syms[i + 1]))
            if r is not None and (best_rank is None or r < best_rank):
                best_rank, best_pair = r, (syms[i], syms[i + 1])
        if best_pair is None:
            break
        syms = list(_merge_syms(tuple(syms), best_pair))
    return syms


def bpe_encode_words(
    words: DataFrame, word_col: str, merges: list[tuple[str, str]]
) -> DataFrame:
    """Add ``bpe_tokens ARRAY<STRING>`` to a DataFrame of (distinct)
    words.  Arrow-batched; per-batch memoisation so repeated words cost
    one encode."""
    ranks = {p: i for i, p in enumerate(merges)}

    @F.pandas_udf(ArrayType(StringType()))
    def enc(col: pd.Series) -> pd.Series:
        cache: dict[str, list[str]] = {}

        def one(w):
            if w is None:
                return None
            got = cache.get(w)
            if got is None:
                got = cache[w] = encode_word(w, ranks)
            return got

        return col.map(one)

    return words.withColumn("bpe_tokens", enc(F.col(word_col)))


def _doc_words(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    toks = df.select(
        F.col(id_col).alias("id"), word_tokens(F.col(text_col)).alias("t")
    )
    return toks.select(
        "id", F.posexplode(F.filter("t", lambda x: x != "")).alias("pos", "w")
    )


def bpe_token_counts(
    df: DataFrame,
    merges: list[tuple[str, str]],
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Per-document accounting under the tokenizer:
    ``doc_id | n_words | n_chars | n_tokens | roundtrip_ok``.

    Only the DISTINCT words cross into Python; the per-document sums are
    a Catalyst join + groupBy.  ``roundtrip_ok`` certifies
    ``decode(encode(w)) == w`` for every word of the document (the
    end-of-word marker must close exactly one word, concatenation must
    reproduce it).
    """
    dw = _doc_words(df, id_col, text_col)
    distinct = dw.select("w").distinct()
    enc = bpe_encode_words(distinct, "w", merges).select(
        "w",
        F.size("bpe_tokens").alias("_ntok"),
        (
            F.array_join(F.col("bpe_tokens"), "")
            == F.concat(F.col("w"), F.lit(EOW))
        ).alias("_rt"),
    )
    joined = dw.join(enc, "w")
    return (
        joined.groupBy(F.col("id").alias(id_col))
        .agg(
            F.count(F.lit(1)).alias("n_words"),
            F.sum(F.length("w")).alias("n_chars"),
            F.sum("_ntok").alias("n_tokens"),
            F.min(F.col("_rt").cast("int")).cast("boolean").alias("roundtrip_ok"),
        )
    )


def bpe_tokenize_docs(
    df: DataFrame,
    merges: list[tuple[str, str]],
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """``doc_id | bpe_tokens ARRAY<STRING>`` — the full ordered token
    stream per document (order restored via the word position, tokens
    flattened in sequence)."""
    dw = _doc_words(df, id_col, text_col)
    distinct = dw.select("w").distinct()
    enc = bpe_encode_words(distinct, "w", merges)
    joined = dw.join(enc, "w").select("id", "pos", "bpe_tokens")
    return (
        joined.groupBy(F.col("id").alias(id_col))
        .agg(
            F.flatten(
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct("pos", "bpe_tokens"))
                    ),
                    lambda s: s["bpe_tokens"],
                )
            ).alias("bpe_tokens")
        )
    )
