"""Full-text retrieval: inverted index, boolean/phrase search, BM25.

Brute-force Python replays over small corpora are the oracles here (the
gate adds the DuckDB twins at sf0.01/sf0.1); edge cases cover repeated
phrase words, overlapping occurrences, phrase-at-position-0, and the
BM25 tie-break.
"""

from __future__ import annotations

import math

import pytest

from ddspark.pipeline.retrieval import (
    bm25_topk,
    boolean_and_search,
    build_postings,
    phrase_search,
    tokens_with_positions,
)

DOCS = [
    (0, "the cat sat on the mat"),
    (1, "cat cat cat"),
    (2, "the the the the"),
    (3, "on the mat sat the cat"),
    (4, "dog"),
    (5, ""),
    (6, "  the   cat  "),  # messy whitespace normalizes away
]


def _tok(text: str) -> list[str]:
    return [t for t in text.strip().lower().split() if t]


def _df(spark):
    return spark.createDataFrame(DOCS, ["doc_id", "text"])


def test_tokens_with_positions(spark):
    rows = tokens_with_positions(_df(spark)).collect()
    got = {(r.id, r.pos, r.term) for r in rows}
    want = {
        (i, p, t) for i, txt in DOCS for p, t in enumerate(_tok(txt))
    }
    assert got == want


def test_build_postings_tf_and_positions(spark):
    rows = build_postings(_df(spark)).collect()
    by_key = {(r.term, r.id): r for r in rows}
    r = by_key[("the", 2)]
    assert r.tf == 4 and r.positions == [0, 1, 2, 3]
    r = by_key[("cat", 1)]
    assert r.tf == 3 and r.positions == [0, 1, 2]
    assert ("dog", 4) in by_key and ("", 5) not in by_key
    # every positions array is sorted and sized tf
    for r in rows:
        assert list(r.positions) == sorted(r.positions)
        assert len(r.positions) == r.tf


def test_boolean_and(spark):
    got = {
        (r.doc_id, r.total_tf)
        for r in boolean_and_search(_df(spark), ["cat", "the"]).collect()
    }
    assert got == {(0, 3), (3, 3), (6, 2)}
    # single term degenerates to tf > 0
    got1 = {r.doc_id for r in boolean_and_search(_df(spark), ["dog"]).collect()}
    assert got1 == {4}
    with pytest.raises(ValueError):
        boolean_and_search(_df(spark), [])


def _phrase_oracle(phrase: list[str]) -> dict[int, int]:
    out = {}
    m = len(phrase)
    for i, txt in DOCS:
        t = _tok(txt)
        n = sum(
            1
            for s in range(len(t) - m + 1)
            if t[s : s + m] == phrase
        )
        if n:
            out[i] = n
    return out


@pytest.mark.parametrize(
    "phrase",
    [
        ["the", "cat"],
        ["cat", "sat", "on"],
        ["cat", "cat"],  # overlapping repeats: positions 0 and 1 in doc 1
        ["the", "the", "the"],  # overlapping triple in doc 2
        ["on", "the", "mat", "sat"],
        ["missing", "phrase"],
    ],
)
def test_phrase_search_matches_bruteforce(spark, phrase):
    got = {
        (r.doc_id, r.n_occ) for r in phrase_search(_df(spark), phrase).collect()
    }
    assert got == set(_phrase_oracle(phrase).items())


def test_phrase_at_position_zero(spark):
    got = {(r.doc_id, r.n_occ) for r in phrase_search(_df(spark), ["cat", "cat", "cat"]).collect()}
    assert got == {(1, 1)}


def _bm25_oracle(query: list[str], k: int) -> list[tuple[int, int, int]]:
    toks = {i: _tok(t) for i, t in DOCS}
    dl = {i: len(t) for i, t in toks.items()}
    n = len(DOCS)
    l = sum(dl.values())
    uniq = sorted(set(query))
    tf = {
        (i, w): toks[i].count(w)
        for i in toks
        for w in uniq
        if w in toks[i]
    }
    dft = {w: sum(1 for (i, ww) in tf if ww == w) for w in uniq}
    scores: dict[int, int] = {}
    for (i, w), f in tf.items():
        idf = math.floor(1e6 * math.log((2.0 * n + 2.0) / (2.0 * dft[w] + 1.0)))
        s = math.floor(
            float(idf)
            * ((44.0 * f * l) / (20.0 * f * l + 6.0 * l + 18.0 * dl[i] * n))
        )
        scores[i] = scores.get(i, 0) + s
    ranked = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))[:k]
    return [(r + 1, i, s) for r, (i, s) in enumerate(ranked)]


def test_bm25_matches_bruteforce(spark):
    got = [
        (r.rank, r.doc_id, r.score_micro)
        for r in bm25_topk(_df(spark), ["cat", "mat"], k=10)
        .orderBy("rank")
        .collect()
    ]
    assert got == _bm25_oracle(["cat", "mat"], 10)


def test_bm25_tiebreak_and_k(spark):
    # duplicate docs force equal scores -> doc_id ASC breaks the tie
    dup = spark.createDataFrame(
        [(10, "x y"), (11, "x y"), (12, "x y"), (13, "z")],
        ["doc_id", "text"],
    )
    got = [
        (r.rank, r.doc_id)
        for r in bm25_topk(dup, ["x"], k=2).orderBy("rank").collect()
    ]
    assert got == [(1, 10), (2, 11)]


def test_bm25_partition_invariance(spark):
    base = _df(spark)
    a = bm25_topk(base.repartition(1), ["cat", "the"], k=5).collect()
    b = bm25_topk(base.repartition(7), ["cat", "the"], k=5).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))


def test_phrase_plan_has_no_python_and_one_agg_shuffle(spark):
    plan = phrase_search(_df(spark), ["the", "cat"])._jdf.queryExecution().executedPlan().toString()
    assert "Python" not in plan  # pure JVM column expressions
    assert "CartesianProduct" not in plan


def _prox_oracle(a: str, b: str, d: int) -> dict[int, int]:
    out = {}
    for i, txt in DOCS:
        t = _tok(txt)
        pa = [p for p, w in enumerate(t) if w == a]
        pb = [p for p, w in enumerate(t) if w == b]
        n = sum(1 for x in pa if any(abs(x - y) <= d for y in pb))
        if n:
            out[i] = n
    return out


@pytest.mark.parametrize("a,b,d", [("cat", "mat", 3), ("the", "sat", 1), ("dog", "cat", 2)])
def test_proximity_search_matches_bruteforce(spark, a, b, d):
    from ddspark.pipeline.retrieval import proximity_search

    got = {
        (r.doc_id, r.n_anchors)
        for r in proximity_search(_df(spark), a, b, d).collect()
    }
    assert got == set(_prox_oracle(a, b, d).items())


def test_proximity_search_guards(spark):
    from ddspark.pipeline.retrieval import proximity_search

    with pytest.raises(ValueError, match="distinct terms"):
        proximity_search(_df(spark), "cat", "cat")
    with pytest.raises(ValueError, match="max_dist"):
        proximity_search(_df(spark), "cat", "mat", 0)


def test_kwic_snippets_windows(spark):
    from ddspark.pipeline.retrieval import kwic_snippets

    got = {
        (r.doc_id, r.pos, r.snippet)
        for r in kwic_snippets(_df(spark), "the", context=2).collect()
    }
    want = set()
    for i, txt in DOCS:
        t = _tok(txt)
        for p, w in enumerate(t):
            if w == "the":
                want.add((i, p, " ".join(t[max(0, p - 2) : p + 3])))
    assert got == want
    # boundary: term at position 0 and at the end both truncate cleanly
    assert (2, 0, "the the the") in got
    assert (2, 3, "the the the") in got

    with pytest.raises(ValueError, match="non-empty"):
        kwic_snippets(_df(spark), "")
    with pytest.raises(ValueError, match="context"):
        kwic_snippets(_df(spark), "the", -1)


# ------------------------------------------------------ property-based


def _run_phrase_property(spark, corpora, phrase):
    docs = [(i, " ".join(t)) for i, t in enumerate(corpora)]
    df = spark.createDataFrame(docs, ["doc_id", "text"])
    got = {(r.doc_id, r.n_occ) for r in phrase_search(df, phrase).collect()}
    want = set()
    m = len(phrase)
    for i, t in enumerate(corpora):
        n = sum(1 for s in range(len(t) - m + 1) if t[s : s + m] == phrase)
        if n:
            want.add((i, n))
    assert got == want


def test_phrase_search_property_random_corpora(spark):
    """Randomized adversarial cases beyond the curated fixtures: tiny
    alphabet maximizes repeated/overlapping phrase words."""
    import random

    rng = random.Random(1234)
    alphabet = ["a", "b", "c"]
    for trial in range(25):
        corpora = [
            [rng.choice(alphabet) for _ in range(rng.randint(0, 12))]
            for _ in range(6)
        ]
        phrase = [rng.choice(alphabet) for _ in range(rng.randint(1, 3))]
        _run_phrase_property(spark, corpora, phrase)


def test_proximity_search_property_random_corpora(spark):
    import random

    from ddspark.pipeline.retrieval import proximity_search

    rng = random.Random(99)
    alphabet = ["x", "y", "z", "w"]
    for trial in range(25):
        corpora = [
            [rng.choice(alphabet) for _ in range(rng.randint(0, 15))]
            for _ in range(6)
        ]
        a, b = rng.sample(alphabet, 2)
        d = rng.randint(1, 4)
        docs = [(i, " ".join(t)) for i, t in enumerate(corpora)]
        df = spark.createDataFrame(docs, ["doc_id", "text"])
        got = {
            (r.doc_id, r.n_anchors)
            for r in proximity_search(df, a, b, d).collect()
        }
        want = set()
        for i, t in enumerate(corpora):
            pa = [p for p, w in enumerate(t) if w == a]
            pb = [p for p, w in enumerate(t) if w == b]
            n = sum(1 for x in pa if any(abs(x - y) <= d for y in pb))
            if n:
                want.add((i, n))
        assert got == want


def test_phrase_search_postings_equals_raw(spark):
    """Index-reuse path: searching the prebuilt postings table returns
    exactly the raw-text phrase search, for every fixture phrase."""
    from ddspark.pipeline.retrieval import phrase_search_postings

    post = build_postings(_df(spark))
    for phrase in (["the", "cat"], ["cat", "cat"], ["the", "the", "the"], ["nope", "x"]):
        raw = {(r.doc_id, r.n_occ) for r in phrase_search(_df(spark), phrase).collect()}
        idx = {(r.doc_id, r.n_occ) for r in phrase_search_postings(post, phrase).collect()}
        assert idx == raw, phrase
    with pytest.raises(ValueError):
        phrase_search_postings(post, [])


def test_bm25_batch_matches_single_query(spark):
    """Per-query rows of the batch path must equal bm25_topk exactly
    (same micro-nat scoring), including duplicate terms within one
    query's array (set semantics)."""
    from ddspark.pipeline.retrieval import bm25_batch

    qdf = spark.createDataFrame(
        [("qa", ["cat", "mat"]), ("qb", ["the", "the", "dog"])],
        "query_id string, terms array<string>",
    )
    got = bm25_batch(_df(spark), qdf, k=10).collect()
    by_q = {}
    for r in got:
        by_q.setdefault(r.query_id, []).append((r.rank, r.doc_id, r.score_micro))
    for qid, terms in (("qa", ["cat", "mat"]), ("qb", ["the", "dog"])):
        single = [
            (r.rank, r.doc_id, r.score_micro)
            for r in bm25_topk(_df(spark), terms, k=10).orderBy("rank").collect()
        ]
        assert sorted(by_q[qid]) == sorted(single), qid


def test_rrf_fuse_known_values(spark):
    import math

    from ddspark.pipeline.retrieval import rrf_fuse

    a = spark.createDataFrame([(1, 1), (2, 2), (3, 3)], "doc_id long, rank int")
    b = spark.createDataFrame([(3, 1), (2, 2), (9, 3)], "doc_id long, rank int")
    got = {r["doc_id"]: r for r in rrf_fuse([a, b], k=60).collect()}

    def c(rank):
        return math.floor(1e6 / (60 + rank))

    assert got[2]["rrf_micro"] == 2 * c(2) and got[2]["n_lists"] == 2
    assert got[3]["rrf_micro"] == c(3) + c(1)
    assert got[1]["rrf_micro"] == c(1) and got[1]["n_lists"] == 1
    assert got[9]["n_lists"] == 1
    # doc 3 (ranks 3+1) outranks doc 2 (ranks 2+2): c(1)+c(3) > 2*c(2)
    assert got[3]["rank"] < got[2]["rank"]
    # both-list docs outrank single-list docs here
    assert got[2]["rank"] < got[1]["rank"]

    with pytest.raises(ValueError, match="at least one"):
        rrf_fuse([])
    top1 = rrf_fuse([a, b], k=60, topk=1).collect()
    assert len(top1) == 1 and top1[0]["doc_id"] == got[3]["doc_id"] == 3
