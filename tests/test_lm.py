"""Bigram LM quality scoring vs an independent pure-Python model."""

from __future__ import annotations

import math
import re
from collections import Counter

import pytest
from pyspark.sql import functions as F

from ddspark.pipeline.lm import (
    _BOS,
    _UNK,
    bigram_lm_fit,
    bigram_lm_score,
)

DOCS_A = [
    ("d1", "the cat sat on the mat"),
    ("d2", "the dog sat on the log"),
    ("d3", "the cat and the dog"),
    ("d4", "a cat a dog a mat"),
    ("d5", "zyzzyva once only token"),
    ("d6", ""),
    ("d7", "  The   CAT  sat  "),
    ("d8", "on on on on"),
]

DOCS_B = [
    ("x1", "the cat sat"),
    ("x2", "completely unseen words here"),
    ("x3", "dog on mat"),
]


def _tokens(text: str) -> list[str]:
    return re.sub(r"\s+", " ", text.strip().lower()).split(" ")


def _py_model(docs: list[tuple[str, str]], min_count: int):
    """Independent reimplementation of fit (no Spark code shared)."""
    uni: Counter = Counter()
    for _, text in docs:
        uni.update(_tokens(text))
    vocab = {t for t, c in uni.items() if c >= min_count}

    def mapped(text):
        toks = _tokens(text)
        ms = [t if t in vocab else _UNK for t in toks]
        return [(_BOS, ms[0])] + list(zip(ms, ms[1:])), sum(
            1 for t in toks if t not in vocab
        )

    c2: Counter = Counter()
    c1: Counter = Counter()
    suffixes = set()
    for _, text in docs:
        pairs, _ = mapped(text)
        for w1, w2 in pairs:
            c2[(w1, w2)] += 1
            c1[w1] += 1
            suffixes.add(w2)
    return vocab, c1, c2, len(suffixes), mapped


def _py_score(docs, vocab, c1, c2, V, mapped):
    out = {}
    for did, text in docs:
        pairs, n_oov = mapped(text)
        lp = 0
        for w1, w2 in pairs:
            p = (c2.get((w1, w2), 0) + 1) / (c1.get(w1, 0) + V)
            lp += math.floor(1e6 * math.log(p))
        out[did] = (len(pairs), n_oov, lp)
    return out


@pytest.fixture(scope="module")
def docs_df(spark):
    return spark.createDataFrame(DOCS_A, "doc_id string, text string")


def test_lm_fit_score_matches_python_model(spark, docs_df):
    vocab, c1, c2, V, mapped = _py_model(DOCS_A, min_count=2)
    want = _py_score(DOCS_A, vocab, c1, c2, V, mapped)

    model = bigram_lm_fit(docs_df, "doc_id", "text", min_count=2)
    got = {
        r["doc_id"]: (r["n_bigrams"], r["n_oov"], r["logprob_micro"])
        for r in bigram_lm_score(model, docs_df, "doc_id", "text").collect()
    }
    assert got == want
    # V sanity: <s> is a prefix-only sentinel, never a suffix type
    assert model.vsize.collect()[0]["v"] == V
    assert _BOS not in {r["tok"] for r in model.vocab.collect()} or "<s>" in [
        t for _, text in DOCS_A for t in _tokens(text)
    ]


def test_lm_score_unseen_corpus(spark, docs_df):
    """Fit on A, score B: unseen tokens -> <unk>, unseen bigrams fall back
    to the smoothed floor; still exactly matches the python model."""
    vocab, c1, c2, V, mapped = _py_model(DOCS_A, min_count=2)
    want = _py_score(DOCS_B, vocab, c1, c2, V, mapped)

    model = bigram_lm_fit(docs_df, "doc_id", "text", min_count=2)
    b = spark.createDataFrame(DOCS_B, "doc_id string, text string")
    rows = bigram_lm_score(model, b, "doc_id", "text").collect()
    got = {
        r["doc_id"]: (r["n_bigrams"], r["n_oov"], r["logprob_micro"])
        for r in rows
    }
    assert got == want
    # perplexity column is consistent with the integer score
    for r in rows:
        assert r["perplexity"] == pytest.approx(
            math.exp(-r["logprob_micro"] / 1e6 / r["n_bigrams"]), rel=1e-9
        )


def test_lm_partition_invariance(spark, docs_df):
    model = bigram_lm_fit(docs_df.repartition(7), "doc_id", "text", min_count=2)
    a = bigram_lm_score(model, docs_df.repartition(5), "doc_id", "text")
    model1 = bigram_lm_fit(docs_df.coalesce(1), "doc_id", "text", min_count=2)
    b = bigram_lm_score(model1, docs_df.coalesce(1), "doc_id", "text")
    cols = ["doc_id", "n_bigrams", "n_oov", "logprob_micro"]
    assert sorted(map(tuple, a.select(cols).collect())) == sorted(
        map(tuple, b.select(cols).collect())
    )
