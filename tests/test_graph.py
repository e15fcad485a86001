"""Integer PageRank (ddspark/pipeline/graph.py)."""
import duckdb
import pytest

from ddspark.pipeline.graph import pagerank_integer, pagerank_oracle_sql


def _model(edges, iters, total=10**12, dn=85, dd=100):
    e = sorted(set(edges))
    nodes = sorted({u for u, _ in e} | {v for _, v in e})
    n = len(nodes)
    r0 = total // n
    base = ((dd - dn) * r0) // dd
    deg = {}
    for u, _ in e:
        deg[u] = deg.get(u, 0) + 1
    r = {v: r0 for v in nodes}
    for _ in range(iters):
        s = {v: 0 for v in nodes}
        for u, v in e:
            s[v] += r[u] // deg[u]
        r = {v: base + (dn * s[v]) // dd for v in nodes}
    return r


def test_pagerank_matches_model_and_oracle(spark):
    import random

    rng = random.Random(5)
    edges = [(rng.randrange(30), rng.randrange(30)) for _ in range(150)]
    edges += [(0, 0), (1, 1)]  # self loops
    df = spark.createDataFrame(edges, "src long, dst long")
    got = {r["node"]: r["rank"] for r in pagerank_integer(df, iters=4).collect()}
    want = _model(edges, iters=4)
    assert got == want

    con = duckdb.connect()
    con.execute("CREATE TABLE edges (src BIGINT, dst BIGINT)")
    con.executemany("INSERT INTO edges VALUES (?, ?)", edges)
    sql = pagerank_oracle_sql("SELECT src, dst FROM edges", iters=4)
    oracle = {n: r for n, r in con.execute(sql).fetchall()}
    assert oracle == want


def test_pagerank_sink_hub_ordering(spark):
    # star graph: everyone points at node 0 -> node 0 dominates
    edges = [(i, 0) for i in range(1, 10)]
    df = spark.createDataFrame(edges, "src long, dst long")
    r = {row["node"]: row["rank"] for row in pagerank_integer(df, iters=3).collect()}
    assert r[0] > max(v for k, v in r.items() if k != 0)
    assert len(r) == 10


def test_pagerank_guards(spark):
    df = spark.createDataFrame([(1, 2)], "src long, dst long")
    with pytest.raises(ValueError, match="damping"):
        pagerank_integer(df, damping=(100, 100))
    with pytest.raises(ValueError, match="iters"):
        pagerank_integer(df, iters=0)
    empty = df.where("src > 99")
    assert pagerank_integer(empty, iters=2).count() == 0
