"""BPE tokenizer: incremental trainer vs a from-scratch reference,
greedy encoder vs training-order replay, and the distributed paths."""

from __future__ import annotations

from collections import Counter

import pytest
from pyspark.sql import functions as F

from ddspark.pipeline.bpe import (
    EOW,
    _merge_syms,
    _pairs_of,
    bpe_token_counts,
    bpe_tokenize_docs,
    encode_word,
    train_bpe,
    train_bpe_from_counts,
)

WC = {
    "low": 5,
    "lower": 2,
    "lowest": 6,
    "newer": 6,
    "wider": 3,
    "new": 2,
    "banana": 4,
    "bandana": 2,
    "aaaa": 3,
}


def naive_train(word_counts, num_merges):
    """Reference trainer: recompute every pair count from scratch per
    merge (no incremental bookkeeping to get wrong)."""
    words = {w: tuple(w) + (EOW,) for w in word_counts if w}
    merges = []
    for _ in range(num_merges):
        pc = Counter()
        for w, syms in words.items():
            for p in _pairs_of(syms):
                pc[p] += word_counts[w]
        live = [(p, c) for p, c in pc.items() if c > 0]
        if not live:
            break
        best = min(live, key=lambda x: (-x[1], x[0]))[0]
        merges.append(best)
        words = {w: _merge_syms(s, best) for w, s in words.items()}
    return merges


def replay_encode(word, merges):
    syms = tuple(word) + (EOW,)
    for m in merges:
        syms = _merge_syms(syms, m)
    return list(syms)


def test_trainer_matches_naive_reference():
    for k in (1, 5, 12, 40):
        assert train_bpe_from_counts(WC, k) == naive_train(WC, k), k


def test_trainer_exhausts_and_stops():
    merges = train_bpe_from_counts({"ab": 2}, 100)
    # 'a','b','</w>' can only merge twice
    assert len(merges) == 2
    assert encode_word("ab", {p: i for i, p in enumerate(merges)}) == [
        "ab" + EOW
    ]


def test_greedy_encoder_equals_training_replay():
    merges = train_bpe_from_counts(WC, 30)
    ranks = {p: i for i, p in enumerate(merges)}
    for w in list(WC) + ["unseen", "lowland", "bananarama", "a", "zz"]:
        assert encode_word(w, ranks) == replay_encode(w, merges), w


def test_overlapping_pair_merges_left_to_right():
    assert _merge_syms(("a", "a", "a", "a"), ("a", "a")) == ("aa", "aa")
    assert _merge_syms(("a", "a", "a"), ("a", "a")) == ("aa", "a")


DOCS = [
    ("d1", "the lowest newer banana"),
    ("d2", "low low lower bandana"),
    ("d3", "  wider   new  aaaa "),
    ("d4", "the the the"),
]


def test_spark_token_counts_match_local(spark):
    df = spark.createDataFrame(DOCS, "doc_id string, text string").repartition(3)
    merges = train_bpe(df, "text", num_merges=25)
    # training over the corpus == training over the explicit word counts
    wc = Counter()
    for _, text in DOCS:
        wc.update(t for t in text.strip().lower().split() if t)
    assert merges == train_bpe_from_counts(dict(wc), 25)

    ranks = {p: i for i, p in enumerate(merges)}
    got = {
        r["doc_id"]: r
        for r in bpe_token_counts(df, merges).collect()
    }
    for did, text in DOCS:
        words = [t for t in text.strip().lower().split() if t]
        want_tokens = sum(len(encode_word(w, ranks)) for w in words)
        row = got[did]
        assert row["n_words"] == len(words)
        assert row["n_chars"] == sum(len(w) for w in words)
        assert row["n_tokens"] == want_tokens
        assert row["roundtrip_ok"] is True


def test_spark_tokenize_docs_order(spark):
    df = spark.createDataFrame(DOCS, "doc_id string, text string").repartition(4)
    merges = train_bpe(df, "text", num_merges=25)
    ranks = {p: i for i, p in enumerate(merges)}
    got = {
        r["doc_id"]: r["bpe_tokens"]
        for r in bpe_tokenize_docs(df, merges).collect()
    }
    for did, text in DOCS:
        words = [t for t in text.strip().lower().split() if t]
        want = [tok for w in words for tok in encode_word(w, ranks)]
        assert got[did] == want, did


def test_max_words_guard(spark):
    df = spark.createDataFrame(DOCS, "doc_id string, text string")
    with pytest.raises(ValueError, match="max_words"):
        train_bpe(df, "text", num_merges=5, max_words=3)
