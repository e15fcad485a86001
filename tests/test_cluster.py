"""Exact k-means (ddspark/pipeline/cluster.py): Spark vs numpy replay vs
the DuckDB ANSI twin, plus determinism and plan-shape checks."""

import duckdb
import numpy as np
import pandas as pd
import pytest

from ddspark.pipeline.cluster import kmeans_assign, kmeans_assign_oracle_sql


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")


def _numpy_kmeans(pdf, k, iters, scale=10**6):
    ids = pdf.vec_id.to_numpy()
    X = np.round(np.stack(pdf.embedding.to_numpy()).astype(np.float64) * scale)
    order = np.argsort(ids)
    ids, X = ids[order], X[order]
    S = X[:k].copy()
    N = np.ones(k)
    live = list(range(k))
    for _ in range(iters + 1):
        d2 = np.stack(
            [((N[c] * X - S[c]) ** 2).sum(1) / N[c] ** 2 for c in live], 1
        )
        a = np.array(live)[np.argmin(d2, 1)]
        live = [c for c in live if (a == c).any()]
        S = np.stack([X[a == c].sum(0) if (a == c).any() else S[c] for c in range(k)])
        N = np.array([(a == c).sum() or 1 for c in range(k)])
    return dict(zip(ids.tolist(), a.tolist()))


def test_kmeans_matches_numpy(emb):
    got = {
        r["vec_id"]: r["cluster"]
        for r in kmeans_assign(emb, k=6, iters=2).collect()
    }
    assert got == _numpy_kmeans(emb.toPandas(), 6, 2)
    # every vector assigned exactly once
    assert len(got) == emb.count()


def test_kmeans_matches_duckdb_twin(emb):
    res = (
        kmeans_assign(emb, k=8, iters=2)
        .toPandas()
        .sort_values("vec_id")
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    con.register("embeddings", emb.toPandas())
    duck = (
        con.execute(kmeans_assign_oracle_sql("embeddings", k=8, iters=2))
        .df()
        .sort_values("vec_id")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(res, duck, check_dtype=False)


def test_kmeans_partition_invariance(emb):
    a = {
        (r["vec_id"], r["cluster"])
        for r in kmeans_assign(emb, k=4, iters=1).collect()
    }
    b = {
        (r["vec_id"], r["cluster"])
        for r in kmeans_assign(emb.repartition(7), k=4, iters=1).collect()
    }
    assert a == b


def test_kmeans_iterations_reduce_inertia(emb):
    def inertia(iters):
        df = kmeans_assign(emb, k=4, iters=iters).toPandas()
        return df.dist2.sum()

    i0, i2 = inertia(0), inertia(2)
    assert i2 <= i0  # Lloyd updates never increase the objective


def test_kmeans_broadcasts_centroids(emb):
    plan = (
        kmeans_assign(emb, k=4, iters=1)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastExchange" in plan


def test_kmeans_validates_params(emb):
    with pytest.raises(ValueError, match="k >= 1"):
        kmeans_assign(emb, k=0)
