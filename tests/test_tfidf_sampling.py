"""TF-IDF top-terms and weighted sampling vs independent Python models."""

from __future__ import annotations

import math
import re
from collections import Counter

import pytest
from pyspark.sql import functions as F

DOCS = [
    ("d1", "spark shuffle join broadcast join"),
    ("d2", "spark window rank window window"),
    ("d3", "duck db oracle twin oracle"),
    ("d4", "spark spark spark unique"),
    ("d5", "  mixed   Case  TOKENS tokens  "),
    ("d6", ""),
]


def _toks(text: str) -> list[str]:
    return [t for t in re.sub(r"\s+", " ", text.strip().lower()).split(" ") if t]


def _py_tfidf(docs, k):
    n = len(docs)
    tf = {did: Counter(_toks(text)) for did, text in docs}
    dft: Counter = Counter()
    for c in tf.values():
        dft.update(c.keys())
    out = {}
    for did, c in tf.items():
        scored = [
            (t, cnt, cnt * math.floor(1e6 * math.log(n / dft[t])))
            for t, cnt in c.items()
        ]
        scored.sort(key=lambda x: (-x[2], x[0]))
        out[did] = [
            (rank + 1, t, cnt, s) for rank, (t, cnt, s) in enumerate(scored[:k])
        ]
    return out


def test_tfidf_matches_python_model(spark):
    from ddspark.pipeline.textops import tfidf_top_terms

    df = spark.createDataFrame(DOCS, "doc_id string, text string").repartition(3)
    got: dict = {}
    for r in tfidf_top_terms(df, "doc_id", "text", k=3).collect():
        got.setdefault(r["doc_id"], []).append(
            (r["rank"], r["term"], r["tf"], r["score_micro"])
        )
    for did in got:
        got[did].sort()
    want = {k: v for k, v in _py_tfidf(DOCS, 3).items() if v}
    assert got == want
    # the all-common term 'spark' (df=3 of 6) must rank below doc-unique
    # terms of equal tf; d4: 'spark' tf=3 still beats 'unique' tf=1
    d1 = [t for _, t, _, _ in got["d1"]]
    assert d1[0] == "join"


def test_tfidf_partition_invariance(spark):
    from ddspark.pipeline.textops import tfidf_top_terms

    df = spark.createDataFrame(DOCS, "doc_id string, text string")
    a = tfidf_top_terms(df.repartition(7), "doc_id", "text", k=4).collect()
    b = tfidf_top_terms(df.coalesce(1), "doc_id", "text", k=4).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))


# ------------------------------------------------------- weighted sampling


def _py_hash63(s: str) -> int:
    import hashlib

    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def _py_weighted_keys(ids_weights, seed):
    out = []
    for i, w in ids_weights:
        h = _py_hash63(f"{i}|ws{seed}")
        u = (h + 1) / (2**60 + 1)
        out.append((i, -math.log(u) / w))
    return out


def test_weighted_sample_matches_python_model(spark):
    from ddspark.pipeline.curation import weighted_sample

    rows = [(i, f"g{i % 2}", (i % 7) + 1) for i in range(100)]
    df = spark.createDataFrame(rows, "doc_id long, g string, w long").repartition(5)
    got = {
        (r["g"], r["sample_rank"]): r["doc_id"]
        for r in weighted_sample(df, 5, "w", "doc_id", by=["g"], seed=7).collect()
    }
    for gname in ("g0", "g1"):
        iw = [(i, w) for i, g, w in rows if g == gname]
        keys = sorted(_py_weighted_keys(iw, 7), key=lambda t: (t[1], t[0]))
        for rank, (i, _) in enumerate(keys[:5], start=1):
            assert got[(gname, rank)] == i, (gname, rank)


def test_weighted_sample_proportional_odds():
    """Statistical property of the key construction itself (pure python,
    many seeds): P(win) for k=1 approaches w_i / sum(w)."""
    iw = [("a", 1.0), ("b", 3.0), ("c", 6.0)]
    wins = Counter()
    for seed in range(4000):
        keys = _py_weighted_keys(iw, seed)
        wins[min(keys, key=lambda t: t[1])[0]] += 1
    assert wins["c"] / 4000 == pytest.approx(0.6, abs=0.03)
    assert wins["b"] / 4000 == pytest.approx(0.3, abs=0.03)
    assert wins["a"] / 4000 == pytest.approx(0.1, abs=0.02)


def test_weighted_sample_excludes_nonpositive_and_invariant(spark):
    from ddspark.pipeline.curation import weighted_sample

    rows = [(1, 5), (2, 0), (3, -2), (4, None), (5, 9), (6, 1)]
    df = spark.createDataFrame(rows, "doc_id long, w long")
    got = weighted_sample(df, 10, "w", "doc_id").collect()
    assert sorted(r["doc_id"] for r in got) == [1, 5, 6]
    a = weighted_sample(df.repartition(4), 2, "w", "doc_id").collect()
    b = weighted_sample(df.coalesce(1), 2, "w", "doc_id").collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))


# -------------------------------------------------------------- PMI


def test_collocations_pmi_matches_python(spark):
    import math

    from ddspark.pipeline.textops import collocations_pmi

    texts = [
        "new york is a big city",
        "new york has new ideas",
        "york new style",
        "a big city and a big idea",
        "new york new york new york",
    ] * 3  # min_count reachable
    df = spark.createDataFrame([(t,) for t in texts], "text string")
    got = [
        (r.rank, r.w1, r.w2, r.pair_count, r.pmi_micro)
        for r in collocations_pmi(df, "text", k=5, min_count=3)
        .orderBy("rank")
        .collect()
    ]
    # python oracle over bigram slots
    pairs, uni, total = {}, {}, 0
    for t in texts:
        toks = t.split()
        for a, b in zip(toks, toks[1:]):
            pairs[(a, b)] = pairs.get((a, b), 0) + 1
            uni[a] = uni.get(a, 0) + 1
            uni[b] = uni.get(b, 0) + 1
            total += 1
    scored = [
        (
            w1,
            w2,
            c,
            math.floor(1e6 * math.log((2.0 * total * c) / (2.0 * uni[w1] * uni[w2]))),
        )
        for (w1, w2), c in pairs.items()
        if c >= 3
    ]
    scored.sort(key=lambda r: (-r[3], r[0], r[1]))
    want = [(i + 1, w1, w2, c, p) for i, (w1, w2, c, p) in enumerate(scored[:5])]
    assert got == want
