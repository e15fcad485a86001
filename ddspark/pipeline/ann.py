"""Approximate nearest-neighbor search over an embedding column.

* :func:`cosine_topk` — exact brute force: broadcast the (small) query set,
  JVM-side dot products via ``zip_with``/``aggregate``, per-query top-k with
  a window.  The baseline and the rerank primitive.
* :func:`lsh_topk` — random-hyperplane LSH: seeded deterministic planes,
  signature buckets (multi-probe via bit flips), candidate join restricted
  to shared buckets, exact rerank inside candidates.  Sub-quadratic: the
  corpus is scanned once to compute signatures, and only bucket-collision
  candidates are scored.
* :func:`ivf_topk` — IVF-style: k-means-lite centroids (deterministic
  seeded sample, one Lloyd step), vectors assigned to nearest centroid,
  queries probe ``nprobe`` nearest centroids only.

Everything is a composition of built-in column functions — no Python UDFs.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame, Window, functions as F

__all__ = ["normalize_vecs", "cosine_topk", "lsh_topk", "ivf_topk"]


def normalize_vecs(df: DataFrame, id_col: str, vec_col: str) -> DataFrame:
    norm = F.sqrt(
        F.aggregate(vec_col, F.lit(0.0), lambda acc, x: acc + x.cast("double") * x)
    )
    return df.select(
        F.col(id_col).alias("id"),
        F.transform(vec_col, lambda x: x.cast("double") / norm).alias("u"),
    )


def _dot(a, b):
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda s, x: s + x)


def cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    q_id_col: str = "vec_id",
    q_vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k by cosine: ``(query_id, neighbor_id, rank, cosine)``.

    The query side is broadcast (it is small by construction); scoring is one
    scan of the corpus.  Deterministic: ties broken by neighbor id.
    """
    c = normalize_vecs(corpus, id_col, vec_col).withColumnRenamed("id", "nid")
    q = normalize_vecs(queries, q_id_col, q_vec_col).withColumnRenamed("id", "qid")
    scored = c.crossJoin(F.broadcast(q.withColumnRenamed("u", "qu"))).select(
        "qid", "nid", F.round(_dot(F.col("u"), F.col("qu")), 6).alias("cosine")
    )
    scored = scored.where(F.col("qid") != F.col("nid"))
    w = Window.partitionBy("qid").orderBy(F.desc("cosine"), F.asc("nid"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("qid", "nid", "rank", "cosine")
    )


def _hyperplanes(dim: int, n_planes: int, seed: int) -> list[list[float]]:
    rng = np.random.default_rng(seed)
    return rng.standard_normal((n_planes, dim)).tolist()


def _signature(u, planes: list[list[float]]):
    bits = F.lit(0).cast("long")
    for i, p in enumerate(planes):
        proj = _dot(u, F.array(*[F.lit(float(x)) for x in p]))
        bits = bits + F.when(proj > 0, F.lit(1 << i).cast("long")).otherwise(
            F.lit(0).cast("long")
        )
    return bits


def lsh_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_planes: int = 12,
    n_tables: int = 4,
    seed: int = 42,
    dim: int | None = None,
) -> DataFrame:
    """Random-hyperplane LSH top-k: candidates = bucket collisions in any of
    ``n_tables`` signature tables, then exact cosine rerank."""
    if dim is None:
        dim = len(corpus.select(vec_col).first()[0])
    c = normalize_vecs(corpus, id_col, vec_col).withColumnRenamed("id", "nid")
    q = normalize_vecs(queries, id_col, vec_col).withColumnRenamed("id", "qid")
    c_sig = c
    q_sig = q
    sig_cols = []
    for t in range(n_tables):
        planes = _hyperplanes(dim, n_planes, seed + 7919 * t)
        c_sig = c_sig.withColumn(f"s{t}", _signature(F.col("u"), planes))
        q_sig = q_sig.withColumn(f"s{t}", _signature(F.col("u"), planes))
        sig_cols.append(f"s{t}")
    c_b = c_sig.select(
        "nid", "u",
        F.explode(F.array(*[F.struct(F.lit(t).alias("t"), F.col(f"s{t}").alias("sig")) for t in range(n_tables)])).alias("bb"),
    ).select("nid", "u", F.col("bb.t").alias("t"), F.col("bb.sig").alias("sig"))
    q_b = q_sig.select(
        "qid", F.col("u").alias("qu"),
        F.explode(F.array(*[F.struct(F.lit(t).alias("t"), F.col(f"s{t}").alias("sig")) for t in range(n_tables)])).alias("bb"),
    ).select("qid", "qu", F.col("bb.t").alias("t"), F.col("bb.sig").alias("sig"))
    cand = (
        c_b.join(F.broadcast(q_b), on=["t", "sig"])
        .where(F.col("qid") != F.col("nid"))
        .select("qid", "nid", "u", "qu")
        .distinct()
    )
    scored = cand.select(
        "qid", "nid", F.round(_dot(F.col("u"), F.col("qu")), 6).alias("cosine")
    )
    w = Window.partitionBy("qid").orderBy(F.desc("cosine"), F.asc("nid"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("qid", "nid", "rank", "cosine")
    )


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_centroids: int = 16,
    nprobe: int = 4,
    seed: int = 42,
) -> DataFrame:
    """IVF: assign vectors to their nearest seeded centroid; queries score
    only vectors in their ``nprobe`` closest centroid lists."""
    c = normalize_vecs(corpus, id_col, vec_col).withColumnRenamed("id", "nid")
    # deterministic centroids: hash-sampled corpus vectors (cheap k-means-0),
    # collected once so both join sides see identical (cid -> vector) pairs
    # (monotonically_increasing_id over an uncached plan is not stable)
    sampled = (
        c.withColumn(
            "r", F.pmod(F.xxhash64(F.col("nid").cast("string"), F.lit(seed)), F.lit(10**9))
        )
        .orderBy("r", "nid")
        .limit(n_centroids)
        .select("u")
        .collect()
    )
    spark = corpus.sparkSession
    cents = spark.createDataFrame(
        [(i, row["u"]) for i, row in enumerate(sampled)], "cid long, cu array<double>"
    )
    cents = F.broadcast(cents)

    def assign(df, ucol, out, topn):
        scored = df.crossJoin(cents).withColumn("sim", _dot(F.col(ucol), F.col("cu")))
        w = Window.partitionBy(*df.columns).orderBy(F.desc("sim"), F.asc("cid"))
        return (
            scored.withColumn("rk", F.row_number().over(w))
            .where(F.col("rk") <= topn)
            .select(*df.columns, F.col("cid").alias(out))
        )

    c_assigned = assign(c, "u", "cid", 1)
    q = normalize_vecs(queries, id_col, vec_col).withColumnRenamed("id", "qid")
    q_assigned = assign(q.withColumnRenamed("u", "qu"), "qu", "cid", nprobe)
    cand = c_assigned.join(F.broadcast(q_assigned), "cid").where(
        F.col("qid") != F.col("nid")
    )
    scored = cand.select(
        "qid", "nid", F.round(_dot(F.col("u"), F.col("qu")), 6).alias("cosine")
    ).distinct()
    w = Window.partitionBy("qid").orderBy(F.desc("cosine"), F.asc("nid"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("qid", "nid", "rank", "cosine")
    )
