"""Sliding-window document chunking (round 5)."""

import duckdb
import pandas as pd
import pytest

from ddspark.pipeline.curation import chunk_documents, chunk_documents_oracle_sql

ROWS = [
    (0, "a b c d e f g h i j"),        # 10 tokens
    (1, "one two three"),              # shorter than a chunk
    (2, ""),                           # no tokens -> no chunks
    (3, None),                         # NULL -> no chunks
    (4, "  x   y  z "),                # messy whitespace
    (5, " ".join(f"w{i}" for i in range(25))),
]


def _py_chunks(text, c, o):
    toks = [t for t in (text or "").lower().split() if t]
    s = c - o
    if not toks:
        return []
    nc = 1 if len(toks) <= c else 1 + -(-(len(toks) - c) // s)
    return [
        (i, " ".join(toks[i * s : i * s + c]), min(c, len(toks) - i * s))
        for i in range(nc)
    ]


def test_matches_python_model(spark):
    df = spark.createDataFrame(ROWS, "doc_id long, text string")
    for c, o in [(4, 1), (4, 0), (10, 3), (3, 2)]:
        got = {
            (r.doc_id, r.chunk_idx): (r.chunk_text, r.chunk_n_tokens)
            for r in chunk_documents(df, chunk_tokens=c, overlap=o).collect()
        }
        want = {
            (i, ci): (t, n)
            for i, text in ROWS
            for ci, t, n in _py_chunks(text, c, o)
        }
        assert got == {k: v for k, v in want.items()}, (c, o)


def test_overlap_is_shared_tokens(spark):
    df = spark.createDataFrame([ROWS[0]], "doc_id long, text string")
    out = sorted(
        chunk_documents(df, chunk_tokens=4, overlap=2).collect(),
        key=lambda r: r.chunk_idx,
    )
    # stride 2 over 10 tokens: starts 0,2,4,6 — the last chunk lands
    # exactly on the end, so no short remainder chunk is emitted
    assert [r.chunk_text for r in out] == [
        "a b c d", "c d e f", "e f g h", "g h i j",
    ]
    assert [r.chunk_n_tokens for r in out] == [4, 4, 4, 4]


def test_bad_params(spark):
    df = spark.createDataFrame(ROWS, "doc_id long, text string")
    with pytest.raises(ValueError):
        chunk_documents(df, chunk_tokens=4, overlap=4)
    with pytest.raises(ValueError):
        chunk_documents(df, chunk_tokens=4, overlap=-1)


def test_duckdb_twin(spark):
    df = spark.createDataFrame(ROWS, "doc_id long, text string")
    got = (
        chunk_documents(df, chunk_tokens=5, overlap=2)
        .orderBy("doc_id", "chunk_idx")
        .toPandas()
    )
    con = duckdb.connect()
    con.register("docs", pd.DataFrame(ROWS, columns=["doc_id", "text"]))
    want = con.execute(
        chunk_documents_oracle_sql("docs", chunk_tokens=5, overlap=2)
        + " ORDER BY doc_id, chunk_idx"
    ).df()
    assert got.values.tolist() == want.values.tolist()


def test_partition_invariance(spark):
    df = spark.createDataFrame(ROWS * 10, "doc_id long, text string")
    a = chunk_documents(df.repartition(1), chunk_tokens=6, overlap=3)
    b = chunk_documents(df.repartition(7), chunk_tokens=6, overlap=3)
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))
