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


def test_triangle_count_known_graphs(spark):
    import itertools
    import random

    from ddspark.pipeline.graph import triangle_count

    def brute(edges):
        es = {tuple(sorted(e)) for e in edges if e[0] != e[1]}
        nodes = sorted({n for e in es for n in e})
        cnt = sum(
            1
            for a, b, c in itertools.combinations(nodes, 3)
            if (a, b) in es and (b, c) in es and (a, c) in es
        )
        return len(nodes), len(es), cnt

    rng = random.Random(7)
    cases = [
        [(1, 2), (2, 3), (1, 3)],                   # one triangle
        [(1, 2), (2, 3), (3, 4), (4, 1)],           # 4-cycle: none
        [(1, 2), (2, 1), (2, 3), (1, 3), (3, 3)],   # dup/reverse/self-loop
        [(rng.randrange(30), rng.randrange(30)) for _ in range(150)],
        # hub fan + path: degree-ordered orientation's worst naive case
        [(0, i) for i in range(1, 20)] + [(i, i + 1) for i in range(1, 19)],
    ]
    for edges in cases:
        df = spark.createDataFrame(edges, "src long, dst long")
        r = triangle_count(df).collect()[0]
        assert (r["n_nodes"], r["n_edges"], r["n_triangles"]) == brute(edges)


def test_triangle_count_partition_invariant(spark):
    import random

    from ddspark.pipeline.graph import triangle_count

    rng = random.Random(3)
    edges = [(rng.randrange(60), rng.randrange(60)) for _ in range(400)]
    df = spark.createDataFrame(edges, "src long, dst long")
    a = triangle_count(df.repartition(1)).collect()[0]
    b = triangle_count(df.repartition(13)).collect()[0]
    assert tuple(a) == tuple(b)


def test_degree_assortativity_known(spark):
    import numpy as np

    from ddspark.pipeline.graph import degree_assortativity

    # star graph: hub degree n-1, leaves degree 1 -> perfectly disassortative
    star = [(0, i) for i in range(1, 8)]
    df = spark.createDataFrame(star, "src long, dst long")
    r = degree_assortativity(df).collect()[0]
    assert r["n"] == 2 * len(star)
    assert r["corr"] == -1.0

    # numpy cross-check on a random graph
    import random

    rng = random.Random(11)
    edges = list({tuple(sorted((rng.randrange(25), rng.randrange(25))))
                  for _ in range(120)})
    edges = [e for e in edges if e[0] != e[1]]
    df = spark.createDataFrame(edges, "src long, dst long")
    r = degree_assortativity(df).collect()[0]
    deg = {}
    for u, v in edges:
        deg[u] = deg.get(u, 0) + 1
        deg[v] = deg.get(v, 0) + 1
    du = [deg[u] for u, v in edges] + [deg[v] for u, v in edges]
    dv = [deg[v] for u, v in edges] + [deg[u] for u, v in edges]
    want = np.corrcoef(du, dv)[0, 1]
    assert r["corr"] == pytest.approx(want, abs=1e-6)
