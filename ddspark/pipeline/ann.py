"""Approximate nearest-neighbor search over an embedding column.

* :func:`cosine_topk` — exact brute force: broadcast the (small) query set,
  JVM-side dot products via ``zip_with``/``aggregate``, per-query top-k with
  a window.  The baseline and the rerank primitive.
* :func:`lsh_topk` — random-hyperplane LSH: seeded deterministic planes,
  signature buckets, candidate join restricted to shared buckets, exact
  cosine rerank.  Sub-quadratic: the corpus is scanned once to compute
  signatures, and only bucket-collision candidates are scored.  Two plane
  families:

  - ``dense``  — Gaussian hyperplanes (classic SimHash-for-cosine); best
    bucket balance.
  - ``sparse`` — coordinate-difference hyperplanes (normal ``e_i - e_j``):
    each bit is a single float comparison ``vec[i] > vec[j]``, which makes
    the signature *exactly replayable in ANSI SQL* (no dot-product
    float-summation ambiguity) — the family the DuckDB correctness oracle
    uses (:func:`ddspark.pipeline.oracles.ann_lsh_sparse_oracle_sql`).

  Signatures are computed on the raw vectors (cosine LSH is invariant to
  positive scaling, so normalization is needed only for the rerank).
* :func:`ivf_topk` — IVF-style: deterministic hash-sampled centroids,
  vectors assigned to their nearest centroid, queries probe ``nprobe``
  nearest centroids only.

Everything is a composition of built-in column functions — no Python UDFs,
and no driver-side actions during plan construction (``dim`` is an explicit
parameter: an ARRAY column's length is not in the schema, and probing the
data for it would cost an extra job per plan).
"""

from __future__ import annotations

import random

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame, Window, functions as F

from .hashing import portable_hash63

__all__ = [
    "normalize_vecs",
    "cosine_topk",
    "lsh_topk",
    "ivf_topk",
    "ivf_build",
    "ivf_search",
    "save_ivf_index",
    "load_ivf_index",
    "ivf_upsert",
    "ann_recall",
    "semantic_dedup_pairs",
    "quantize_embeddings",
    "dequantize_embeddings",
    "pca_fit",
    "pca_project",
]


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


def _dense_signature(vec, planes: list[list[float]]) -> Column:
    bits = F.lit(0).cast("long")
    for i, p in enumerate(planes):
        proj = _dot(vec, F.array(*[F.lit(float(x)) for x in p]))
        bits = bits + F.when(proj > 0, F.lit(1 << i).cast("long")).otherwise(
            F.lit(0).cast("long")
        )
    return bits


def sparse_planes(dim: int, n_planes: int, seed: int) -> list[tuple[int, int]]:
    """Seeded coordinate pairs (i, j), i != j — hyperplanes with normal
    ``e_i - e_j``.  Shared with the ANSI-SQL oracle generator so both
    engines draw identical planes."""
    if dim < 2:
        raise ValueError(f"sparse planes need dim >= 2, got {dim}")
    rnd = random.Random(seed)
    out: list[tuple[int, int]] = []
    while len(out) < n_planes:
        i = rnd.randrange(dim)
        j = rnd.randrange(dim)
        if i != j:
            out.append((i, j))
    return out


def _sparse_signature(vec, planes: list[tuple[int, int]]) -> Column:
    bits = F.lit(0).cast("long")
    for b, (i, j) in enumerate(planes):
        bits = bits + F.when(
            F.element_at(vec, i + 1) > F.element_at(vec, j + 1),
            F.lit(1 << b).cast("long"),
        ).otherwise(F.lit(0).cast("long"))
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
    dim: int = 64,
    plane_family: str = "dense",
) -> DataFrame:
    """Random-hyperplane LSH top-k: candidates = bucket collisions in any of
    ``n_tables`` signature tables, then exact cosine rerank within
    candidates.  ``dim`` must match the embedding length (explicit — see
    module docstring)."""

    def with_sigs(df: DataFrame, idname: str) -> DataFrame:
        # fail fast on a dim mismatch: with wrong dim every dense projection
        # zip_with-pads to NULL and every signature degenerates to bucket 0,
        # silently turning the candidate join into a full cross product
        vec_ok = F.when(
            F.size(vec_col) == dim, F.col(vec_col)
        ).otherwise(
            F.raise_error(
                F.concat(
                    F.lit(f"lsh_topk: dim={dim} but embedding length is "),
                    F.size(vec_col).cast("string"),
                )
            )
        )
        out = df.select(F.col(id_col).alias(idname), vec_ok.alias("_vec"))
        for t in range(n_tables):
            tseed = seed + 7919 * t
            if plane_family == "sparse":
                sig = _sparse_signature(F.col("_vec"), sparse_planes(dim, n_planes, tseed))
            else:
                sig = _dense_signature(F.col("_vec"), _hyperplanes(dim, n_planes, tseed))
            out = out.withColumn(f"s{t}", sig)
        buckets = F.array(
            *[
                F.struct(F.lit(t).alias("t"), F.col(f"s{t}").alias("sig"))
                for t in range(n_tables)
            ]
        )
        return out.select(idname, F.explode(buckets).alias("bb")).select(
            idname, F.col("bb.t").alias("t"), F.col("bb.sig").alias("sig")
        )

    cand = (
        with_sigs(corpus, "nid")
        .join(F.broadcast(with_sigs(queries, "qid")), on=["t", "sig"])
        .where(F.col("qid") != F.col("nid"))
        .select("qid", "nid")
        .distinct()
    )
    c = normalize_vecs(corpus, id_col, vec_col).withColumnRenamed("id", "nid")
    q = normalize_vecs(queries, id_col, vec_col).select(
        F.col("id").alias("qid"), F.col("u").alias("qu")
    )
    scored = (
        cand.join(c, "nid")
        .join(F.broadcast(q), "qid")
        .select("qid", "nid", F.round(_dot(F.col("u"), F.col("qu")), 6).alias("cosine"))
    )
    w = Window.partitionBy("qid").orderBy(F.desc("cosine"), F.asc("nid"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("qid", "nid", "rank", "cosine")
    )


def _seed_centroids(
    c: DataFrame, n_centroids: int, seed: int, portable: bool
) -> DataFrame:
    """Hash-sampled corpus vectors as centroids (cheap k-means-0): a bounded
    ``n_centroids``-row collect, broadcast back.  ``c`` is the normalized
    ``(nid, u)`` frame.  ``portable`` draws the sample with the md5-derived
    hash so the selection is replayable in ANSI SQL."""
    if portable:
        r_expr = portable_hash63(
            F.concat(F.col("nid").cast("string"), F.lit(f":{seed}"))
        )
    else:
        r_expr = F.pmod(
            F.xxhash64(F.col("nid").cast("string"), F.lit(seed)), F.lit(10**9)
        )
    sampled = (
        c.withColumn("r", r_expr)
        .orderBy("r", "nid")
        .limit(n_centroids)
        .select("u")
        .collect()
    )
    cents = c.sparkSession.createDataFrame(
        [(i, row["u"]) for i, row in enumerate(sampled)], "cid long, cu array<double>"
    )
    return F.broadcast(cents)


def _assign_nearest(
    df: DataFrame, cents: DataFrame, id_name: str, ucol: str, out: str, topn: int
) -> DataFrame:
    """Nearest-centroid assignment (top ``topn``).  The similarity is rounded
    so argmax ties break identically in any engine replaying this (float dot
    products can differ in the last ulp across summation orders); the window
    is keyed on the id, never on the vector column."""
    scored = df.crossJoin(cents).withColumn(
        "sim", F.round(_dot(F.col(ucol), F.col("cu")), 6)
    )
    w = Window.partitionBy(id_name).orderBy(F.desc("sim"), F.asc("cid"))
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") <= topn)
        .select(*df.columns, F.col("cid").alias(out))
    )


def semantic_dedup_pairs(
    corpus: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.9,
    n_centroids: int = 16,
    seed: int = 42,
    portable: bool = False,
) -> DataFrame:
    """SemDeDup-style semantic near-duplicate pairs (Abbas et al. 2023,
    arXiv:2303.09540): cluster embeddings around seeded centroids, then
    compare pairs **within a cluster only**.  Output:
    ``(id_a < id_b, cosine)`` with cosine >= ``threshold``.

    This is the scale path for :func:`ddspark.pipeline.dedup.
    embedding_neardup_pairs` (exact all-pairs, O(N^2)): candidates shrink to
    ~``N^2 / n_centroids`` and the per-cluster join is shuffle-partitioned
    by ``cid``.  Size ``n_centroids`` so clusters hold ~1k-10k vectors
    (n_centroids ~ N / cluster_target); near-dups land in the same cluster
    with high probability because they are near the same centroid, but
    pairs straddling a cluster boundary are missed — the documented recall
    trade-off that makes the quadratic term tractable.
    """
    c = normalize_vecs(corpus, id_col, vec_col).withColumnRenamed("id", "nid")
    cents = _seed_centroids(c, n_centroids, seed, portable)
    assigned = _assign_nearest(c, cents, "nid", "u", "cid", 1)
    a = assigned.select(F.col("cid"), F.col("nid").alias("id_a"), F.col("u").alias("ua"))
    b = assigned.select(F.col("cid"), F.col("nid").alias("id_b"), F.col("u").alias("ub"))
    pairs = a.join(b, "cid").where(F.col("id_a") < F.col("id_b"))
    cos = F.round(_dot(F.col("ua"), F.col("ub")), 6)
    return pairs.select("id_a", "id_b", cos.alias("cosine")).where(
        F.col("cosine") >= threshold
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
    portable: bool = False,
    lloyd_steps: int = 0,
) -> DataFrame:
    """IVF: assign vectors to their nearest seeded centroid; queries score
    only vectors in their ``nprobe`` closest centroid lists.

    Centroids are hash-sampled corpus vectors (cheap k-means-0), collected
    once — a bounded ``n_centroids``-row driver list, not a data-dependent
    action.  ``portable`` draws the sample with the md5-derived hash so the
    selection is replayable in ANSI SQL.  ``lloyd_steps`` runs that many
    spherical k-means refinement passes (assign -> per-dimension mean ->
    renormalize), entirely as distributed aggregates — only the
    ``n_centroids``-row result is ever broadcast; better-balanced lists
    mean fewer candidates per probe at the same recall."""
    cents, c_assigned = ivf_build(
        corpus, id_col, vec_col, n_centroids, seed, portable, lloyd_steps
    )
    return ivf_search(cents, c_assigned, queries, k, id_col, vec_col, nprobe)


def ivf_build(
    corpus: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_centroids: int = 16,
    seed: int = 42,
    portable: bool = False,
    lloyd_steps: int = 0,
) -> tuple[DataFrame, DataFrame]:
    """Build the IVF index once: returns ``(centroids (cid, cu),
    assignments (nid, u, cid))``.  Both are plain DataFrames — persist them
    with :func:`save_ivf_index` and serve many query batches against the
    same build (at 10^9 vectors the build is the expensive scan; searches
    touch only ``nprobe`` inverted lists)."""
    c = normalize_vecs(corpus, id_col, vec_col).withColumnRenamed("id", "nid")
    cents = _seed_centroids(c, n_centroids, seed, portable)

    for _ in range(lloyd_steps):
        assigned = _assign_nearest(c, cents, "nid", "u", "cid", 1)
        dim_means = (
            assigned.select("cid", F.posexplode("u").alias("d", "x"))
            .groupBy("cid", "d")
            .agg(F.avg("x").alias("m"))
        )
        mean_vec = F.transform(
            F.array_sort(F.collect_list(F.struct("d", "m"))), lambda s: s["m"]
        )
        new_cents = dim_means.groupBy("cid").agg(mean_vec.alias("mv"))
        norm = F.sqrt(F.aggregate("mv", F.lit(0.0), lambda acc, x: acc + x * x))
        cents = F.broadcast(
            new_cents.select(
                "cid", F.transform("mv", lambda x: x / norm).alias("cu")
            )
        )

    return cents, _assign_nearest(c, cents, "nid", "u", "cid", 1)


def ivf_search(
    cents: DataFrame,
    assignments: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    nprobe: int = 4,
) -> DataFrame:
    """Serve a query batch against a prebuilt IVF index (from
    :func:`ivf_build` or :func:`load_ivf_index`): queries score only the
    vectors in their ``nprobe`` nearest centroid lists.  Centroids are
    ``n_centroids`` rows and the assigned query batch is small — both
    broadcast; the corpus-side assignments never reshuffle."""
    q = normalize_vecs(queries, id_col, vec_col).select(
        F.col("id").alias("qid"), F.col("u").alias("qu")
    )
    q_assigned = _assign_nearest(q, F.broadcast(cents), "qid", "qu", "cid", nprobe)
    cand = assignments.join(F.broadcast(q_assigned), "cid").where(
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


def save_ivf_index(cents: DataFrame, assignments: DataFrame, path: str) -> None:
    """Persist an IVF index as two parquet tables under ``path``
    (``centroids/`` tiny, ``assignments/`` partitioned by inverted list so
    a search scans only its probed lists)."""
    cents.write.mode("overwrite").parquet(f"{path}/centroids")
    assignments.write.mode("overwrite").partitionBy("cid").parquet(
        f"{path}/assignments"
    )


def load_ivf_index(spark, path: str) -> tuple[DataFrame, DataFrame]:
    """Read back a :func:`save_ivf_index` index; partition pruning on
    ``cid`` keeps each search to its probed inverted lists."""
    return (
        spark.read.parquet(f"{path}/centroids"),
        spark.read.parquet(f"{path}/assignments"),
    )


def quantize_embeddings(
    df: DataFrame, id_col: str = "vec_id", vec_col: str = "embedding"
) -> DataFrame:
    """Symmetric per-vector int8 quantization: ``scale = max|v_i|``,
    ``q_i = round(v_i * 127 / scale)`` (half away from zero, the rounding
    both Spark and ANSI engines use) — a 4x storage/shuffle reduction for
    embedding corpora, reversible to within ``scale/254`` per component.

    Output: ``(id_col, scale DOUBLE, qvec ARRAY<INT> in [-127, 127])``.
    All-zero vectors quantize to zeros with ``scale = 0``.

    Pure column expressions (zero shuffle, no Python).  ``scale`` is
    materialized behind a projection first: Catalyst does not CSE inside
    higher-order-function lambdas, so computing it inline would re-reduce
    the whole array once per element (64x work at dim 64)."""
    absmax = F.array_max(
        F.transform(vec_col, lambda x: F.abs(x.cast("double")))
    )
    staged = df.select(
        F.col(id_col), F.col(vec_col).alias("_v"), absmax.alias("scale")
    )
    q = F.when(F.col("scale") == 0.0, F.transform("_v", lambda x: F.lit(0))).otherwise(
        F.transform(
            "_v",
            lambda x: F.round(x.cast("double") * 127.0 / F.col("scale")).cast("int"),
        )
    )
    return staged.select(id_col, "scale", q.alias("qvec"))


def dequantize_embeddings(
    df: DataFrame, id_col: str = "vec_id", qvec_col: str = "qvec",
    scale_col: str = "scale",
) -> DataFrame:
    """Inverse of :func:`quantize_embeddings`: ``v_i ~= q_i * scale / 127``
    as ``ARRAY<DOUBLE>`` — feed straight back into :func:`cosine_topk` /
    :func:`semantic_dedup_pairs` for quantized-corpus search."""
    return df.select(
        F.col(id_col),
        F.transform(
            qvec_col, lambda x: x.cast("double") * F.col(scale_col) / 127.0
        ).alias("vec"),
    )


def pca_fit(
    df: DataFrame, id_col: str = "vec_id", vec_col: str = "embedding",
    k: int = 8,
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Fit a PCA basis over an embedding corpus in ONE distributed pass.

    Returns ``(mean [d], components [k, d], eigenvalues [k])`` with
    components sorted by descending eigenvalue.  Sign convention: each
    component's largest-|.| coordinate is positive, so results are
    deterministic up to float summation order.

    Scale shape: each Arrow batch reduces to a single partial
    ``(n, sum[d], outer-product sum [d*d])`` row; the partials are then
    combined DISTRIBUTED (posexplode + sum per coordinate), so the driver
    collects exactly ``d*d + d + 1`` numbers no matter the corpus size,
    and runs the d x d eigendecomposition locally (d is the embedding
    dim, e.g. 64 — microseconds).  The corpus is read once; the partial
    frame is persisted for its three tiny follow-up aggregations."""
    from pyspark.sql.types import ArrayType, DoubleType, LongType
    from pyspark.sql.types import StructField as SF, StructType as ST

    schema = ST([
        SF("n", LongType()),
        SF("s", ArrayType(DoubleType())),
        SF("ss", ArrayType(DoubleType())),
    ])

    def partials(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            m = np.array(list(pdf[vec_col]), dtype=np.float64)
            yield pd.DataFrame({
                "n": [m.shape[0]],
                "s": [m.sum(axis=0).tolist()],
                "ss": [(m.T @ m).ravel().tolist()],
            })

    parts = df.select(vec_col).mapInPandas(partials, schema).persist()
    try:
        total = parts.agg(F.sum("n")).collect()[0][0]
        if not total:
            raise ValueError("pca_fit: empty input")
        n = int(total)
        s = np.array(
            [
                r[1]
                for r in parts.select(F.posexplode("s"))
                .groupBy("pos").agg(F.sum("col"))
                .orderBy("pos").collect()
            ]
        )
        d = s.shape[0]
        ss = np.array(
            [
                r[1]
                for r in parts.select(F.posexplode("ss"))
                .groupBy("pos").agg(F.sum("col"))
                .orderBy("pos").collect()
            ]
        ).reshape(d, d)
    finally:
        parts.unpersist()
    mean = s / n
    cov = ss / n - np.outer(mean, mean)
    evals, evecs = np.linalg.eigh(cov)  # ascending
    order = np.argsort(evals)[::-1][:k]
    comps = evecs[:, order].T
    flip = np.sign(comps[np.arange(comps.shape[0]),
                         np.abs(comps).argmax(axis=1)])
    comps = comps * flip[:, None]
    return mean, comps, evals[order]


def pca_project(
    df: DataFrame,
    mean: np.ndarray,
    components: np.ndarray,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    out_col: str = "pvec",
) -> DataFrame:
    """Project embeddings onto a fitted PCA basis: ``(id, pvec [k])``.

    The (tiny) basis ships inside the UDF closure — effectively a
    broadcast; the projection is one vectorized numpy matmul per Arrow
    batch, map-only, no shuffle."""
    from pyspark.sql.types import ArrayType, DoubleType, LongType
    from pyspark.sql.types import StructField as SF, StructType as ST

    mu = np.asarray(mean, dtype=np.float64)
    w = np.asarray(components, dtype=np.float64)
    schema = ST([SF(id_col, LongType()), SF(out_col, ArrayType(DoubleType()))])

    def gen(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            m = np.array(list(pdf[vec_col]), dtype=np.float64)
            p = (m - mu) @ w.T
            yield pd.DataFrame({id_col: pdf[id_col].to_numpy(),
                                out_col: list(p)})

    return df.select(id_col, vec_col).mapInPandas(gen, schema)


def ivf_upsert(
    path: str,
    new_vectors: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> None:
    """Incrementally maintain a saved IVF index (:func:`save_ivf_index`):
    assign ``new_vectors`` to the EXISTING centroids and append them to
    their inverted lists; ids already present are replaced (re-embedded
    documents).  Centroids are intentionally left untouched — the index
    stays consistent with every previous search, and the standard
    operating practice at 10^9 vectors is append-now, re-train centroids
    on a schedule (run :func:`ivf_build` + :func:`save_ivf_index` when
    drift accumulates).

    **Scale**: the new batch scans once against the broadcast centroid
    table (n_centroids rows); the rewrite unions the old assignments with
    the batch and drops replaced ids with one keyed aggregate — no
    all-pairs work, no touch of the centroid table.  Partitioning by
    ``cid`` is preserved, so searches keep pruning to their probed
    lists."""
    spark = new_vectors.sparkSession
    cents, old = load_ivf_index(spark, path)
    c = normalize_vecs(new_vectors, id_col, vec_col).withColumnRenamed(
        "id", "nid"
    )
    fresh = _assign_nearest(c, F.broadcast(cents), "nid", "u", "cid", 1)
    # last-writer-wins on nid: new rows carry priority 1
    merged = (
        old.select("nid", "u", "cid", F.lit(0).alias("_pri"))
        .unionByName(fresh.select("nid", "u", "cid", F.lit(1).alias("_pri")))
        .groupBy("nid")
        .agg(F.max(F.struct("_pri", "cid", "u")).alias("_w"))
        .select("nid", F.col("_w.u").alias("u"), F.col("_w.cid").alias("cid"))
    )
    # write to a fresh dir then swap: readers never see a half-written index
    import os
    import shutil

    tmp = f"{path}/assignments.next"
    merged.write.mode("overwrite").partitionBy("cid").parquet(tmp)
    final = f"{path}/assignments"
    shutil.rmtree(final, ignore_errors=True)
    os.replace(tmp, final)


def ann_recall(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_centroids: int = 16,
    nprobe: int = 4,
    seed: int = 42,
    portable: bool = False,
    ndigits: int = 6,
) -> DataFrame:
    """Recall@k of the IVF index against the exact brute-force baseline:
    ``(qid, n_exact, n_hits, recall)`` — the evaluation loop an ANN
    deployment runs before trusting an index configuration.

    Both sides reuse the production operators (:func:`cosine_topk`,
    :func:`ivf_topk`) on the same query batch, so the measured recall is
    the served recall.  The exact side is one corpus scan per batch (run
    it on a hash-sampled query subset at 10^9 vectors); the join is on
    (qid, nid) pairs — k rows per query, broadcast-sized.  recall =
    n_hits / k is a one-op double on small integers, identical
    cross-engine.
    """
    exact = cosine_topk(corpus, queries, k, id_col, vec_col, id_col, vec_col)
    approx = ivf_topk(
        corpus, queries, k, id_col, vec_col, n_centroids, nprobe, seed, portable
    )
    hit = F.when(F.col("a_nid").isNotNull(), 1).otherwise(0)
    joined = exact.select("qid", "nid").join(
        approx.select(
            F.col("qid").alias("a_qid"), F.col("nid").alias("a_nid")
        ),
        (F.col("qid") == F.col("a_qid")) & (F.col("nid") == F.col("a_nid")),
        "left",
    )
    per_q = joined.groupBy("qid").agg(
        F.count(F.lit(1)).alias("n_exact"),
        F.sum(hit).alias("n_hits"),
    )
    return per_q.select(
        "qid",
        "n_exact",
        "n_hits",
        F.round(F.col("n_hits").cast("double") / k, ndigits).alias("recall"),
    )


# ---------------------------------------------------------------------------
# Product quantization (PQ) — the memory-scale ANN path: each vector is
# split into m subvectors, each subspace gets its own exact k-means
# codebook, and a vector is stored as m small codes.  Search is ADC
# (asymmetric distance computation): per query, an m*k lookup table of
# exact subspace distances, then candidate scores are BIGINT sums of
# floor-quantized table entries — value-hashable cross-engine like
# everything else here.  At 10^9 vectors PQ codes are ~m bytes a vector
# vs 4*dim for floats; the ADC join touches codes, never raw vectors.
# ---------------------------------------------------------------------------


def _pq_subvectors(
    df: DataFrame, id_col: str, vec_col: str, m: int, sub_dim: int, scale: int
) -> DataFrame:
    """``(vid, sub, x)`` — integer-grid subvectors, one row per subspace."""
    xq = F.transform(
        F.col(vec_col), lambda x: F.round(x.cast("double") * scale).cast("long")
    )
    return (
        df.select(F.col(id_col).alias("vid"), xq.alias("_xq"))
        .select("vid", F.explode(F.sequence(F.lit(0), F.lit(m - 1))).alias("sub"), "_xq")
        .select(
            "vid",
            "sub",
            F.slice("_xq", F.col("sub") * sub_dim + 1, sub_dim).alias("x"),
        )
    )


def _pq_assign(v: DataFrame, cents: DataFrame) -> DataFrame:
    """Nearest centroid per (vid, sub): exact rational comparison
    ``A/n^2`` (the :mod:`ddspark.pipeline.cluster` form), ties to the
    smaller cid."""
    j = v.join(F.broadcast(cents), "sub")
    term = F.zip_with("x", "s", lambda x, s: F.col("n") * x - s)
    big = lambda t: t.cast("decimal(19,0)")  # noqa: E731
    a = F.aggregate(
        term,
        F.lit(0).cast("decimal(38,0)"),
        lambda acc, t: acc + big(t) * big(t),
    )
    q = a.cast("double") / (F.col("n") * F.col("n")).cast("double")
    w = Window.partitionBy("vid", "sub").orderBy(F.asc("q"), F.asc("cid"))
    return (
        j.select("vid", "sub", "x", "cid", q.alias("q"))
        .withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") == 1)
        .drop("_rn")
    )


def _pq_update(assigned: DataFrame) -> DataFrame:
    dims = assigned.select("sub", "cid", F.posexplode("x").alias("d", "xd"))
    per_dim = dims.groupBy("sub", "cid", "d").agg(
        F.sum("xd").alias("sd"), F.count(F.lit(1)).alias("n")
    )
    vec = F.transform(
        F.array_sort(F.collect_list(F.struct("d", "sd"))), lambda s: s["sd"]
    )
    return per_dim.groupBy("sub", "cid").agg(
        vec.alias("s"), F.first("n").alias("n")
    )


def pq_build(
    df: DataFrame,
    dim: int,
    m: int = 8,
    k: int = 16,
    iters: int = 1,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    scale: int = 10**6,
) -> tuple[DataFrame, DataFrame]:
    """Train per-subspace codebooks and encode the corpus.  Returns
    ``(codebook, codes)``: the codebook is ``(sub, cid, s, n)`` — exact
    rational centroids, the :func:`ddspark.pipeline.cluster.kmeans_assign`
    state split by subspace — and codes are ``(vid, sub, cid)`` long
    format (m rows per vector, join-ready for ADC).

    Seeding is the k-smallest-id vectors' subvectors per subspace
    (deterministic, SQL-replayable); Lloyd updates run on ALL subspaces
    at once — one broadcast join + one (sub, cid, d) partial agg per
    iteration, never m separate jobs.  Codebook size is m*k rows
    (broadcast everywhere); the corpus-side state after encoding is m
    BIGINT codes per vector.
    """
    if dim % m != 0:
        raise ValueError(f"m={m} must divide dim={dim}")
    if k < 1 or iters < 0 or scale < 1:
        raise ValueError("k >= 1, iters >= 0, scale >= 1 required")
    sub_dim = dim // m
    v = _pq_subvectors(df, id_col, vec_col, m, sub_dim, scale).localCheckpoint(
        eager=False
    )
    seed_ids = v.select("vid").distinct().orderBy("vid").limit(k)
    cents = (
        v.join(F.broadcast(seed_ids), "vid")
        .select(
            "sub",
            (
                F.row_number().over(Window.partitionBy("sub").orderBy("vid")) - 1
            ).alias("cid"),
            F.col("x").alias("s"),
            F.lit(1).cast("long").alias("n"),
        )
    )
    for _ in range(iters):
        cents = _pq_update(_pq_assign(v, cents)).localCheckpoint(eager=True)
    codes = _pq_assign(v, cents).select("vid", "sub", "cid")
    return cents, codes


def pq_search(
    codebook: DataFrame,
    codes: DataFrame,
    queries: DataFrame,
    dim: int,
    m: int = 8,
    top: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    scale: int = 10**6,
    dscale: int = 10**6,
) -> DataFrame:
    """ADC top-k: ``(qid, nid, rank, dist_micro)`` per query.  The
    per-query lookup table (m*k rows: exact subspace distance ``A/n^2``
    floor-quantized by ``dscale``) broadcasts; candidate scores are the
    BIGINT sums of each vector's m table entries — summation-order-free,
    so the ranking (dist asc, nid asc) replays cross-engine.  The scan
    side touches only the m-codes-per-vector table, never raw vectors —
    the point of PQ at 10^9 rows."""
    if dim % m != 0:
        raise ValueError(f"m={m} must divide dim={dim}")
    sub_dim = dim // m
    qv = _pq_subvectors(queries, id_col, vec_col, m, sub_dim, scale).select(
        F.col("vid").alias("qid"), "sub", F.col("x").alias("qx")
    )
    j = qv.join(F.broadcast(codebook), "sub")
    term = F.zip_with("qx", "s", lambda x, s: F.col("n") * x - s)
    big = lambda t: t.cast("decimal(19,0)")  # noqa: E731
    a = F.aggregate(
        term,
        F.lit(0).cast("decimal(38,0)"),
        lambda acc, t: acc + big(t) * big(t),
    )
    d_micro = F.floor(
        F.lit(int(dscale))
        * (
            a.cast("double")
            / (F.col("n") * F.col("n")).cast("double")
            / float(scale) ** 2
        )
    ).cast("long")
    lut = j.select("qid", "sub", "cid", d_micro.alias("dm"))
    scored = (
        codes.join(F.broadcast(lut), ["sub", "cid"])
        .groupBy("qid", "vid")
        .agg(F.sum("dm").alias("dist_micro"), F.count(F.lit(1)).alias("_m"))
        .where(F.col("_m") == m)
    )
    w = Window.partitionBy("qid").orderBy(F.asc("dist_micro"), F.asc("vid"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= top)
        .select("qid", F.col("vid").alias("nid"), "rank", "dist_micro")
    )


def pq_search_oracle_sql(
    table: str = "embeddings",
    queries_pred: str = "vec_id < 5",
    dim: int = 64,
    m: int = 8,
    k: int = 16,
    iters: int = 1,
    top: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    scale: int = 10**6,
    dscale: int = 10**6,
) -> str:
    """ANSI twin of :func:`pq_build` + :func:`pq_search` on the same
    table (queries selected by ``queries_pred``): the per-subspace Lloyd
    chain unrolls like :func:`ddspark.pipeline.cluster.kmeans_assign_oracle_sql`
    with ``sub`` in every key, then the ADC table, BIGINT score sums,
    and the (dist, nid) rank.  CTEs are ``AS MATERIALIZED`` — most are
    referenced more than once (the HITS-oracle lesson)."""
    sd = dim // m
    s2 = float(scale) ** 2
    blocks = [
        f"""q AS MATERIALIZED (
  SELECT {id_col} AS vid,
         list_transform({vec_col}, x -> CAST(ROUND(CAST(x AS DOUBLE) * {scale}) AS BIGINT)) AS xq
  FROM {table}
),
vd AS MATERIALIZED (
  SELECT vid, u.i // {sd} AS sub, u.i % {sd} AS d, xq[u.i + 1] AS x
  FROM q, UNNEST(generate_series(0, {dim - 1})) AS u(i)
),
seeds AS MATERIALIZED (SELECT vid FROM q ORDER BY vid LIMIT {k}),
cents0 AS MATERIALIZED (
  SELECT vd.sub,
         CAST(DENSE_RANK() OVER (PARTITION BY vd.sub ORDER BY vd.vid) AS BIGINT) - 1 AS cid,
         vd.d, vd.x AS s, CAST(1 AS BIGINT) AS n
  FROM vd JOIN seeds USING (vid)
)"""
    ]
    for t in range(iters + 1):
        blocks.append(
            f"""a{t} AS MATERIALIZED (
  SELECT vd.vid, vd.sub, c.cid,
         SUM(CAST(c.n * vd.x - c.s AS HUGEINT) * CAST(c.n * vd.x - c.s AS HUGEINT)) AS A,
         ANY_VALUE(c.n) AS n
  FROM vd JOIN cents{t} c ON c.sub = vd.sub AND c.d = vd.d
  GROUP BY vd.vid, vd.sub, c.cid
),
pick{t} AS MATERIALIZED (
  SELECT vid, sub, cid
  FROM (
    SELECT vid, sub, cid,
           ROW_NUMBER() OVER (
             PARTITION BY vid, sub
             ORDER BY CAST(A AS DOUBLE) / CAST(n * n AS DOUBLE), cid
           ) AS rn
    FROM a{t}
  ) WHERE rn = 1
)"""
        )
        if t < iters:
            blocks.append(
                f"""cents{t + 1} AS MATERIALIZED (
  SELECT p.sub, p.cid, vd.d,
         CAST(SUM(vd.x) AS BIGINT) AS s, COUNT(*) AS n
  FROM pick{t} p
  JOIN vd ON vd.vid = p.vid AND vd.sub = p.sub
  GROUP BY p.sub, p.cid, vd.d
)"""
            )
    blocks.append(
        f"""lut AS MATERIALIZED (
  SELECT qv.vid AS qid, qv.sub, c.cid,
         CAST(FLOOR({int(dscale)} * (
           CAST(SUM(CAST(c.n * qv.x - c.s AS HUGEINT)
                    * CAST(c.n * qv.x - c.s AS HUGEINT)) AS DOUBLE)
           / CAST(ANY_VALUE(c.n) * ANY_VALUE(c.n) AS DOUBLE) / {s2}
         )) AS BIGINT) AS dm
  FROM (SELECT vd.* FROM vd JOIN q USING (vid) WHERE {queries_pred.replace(id_col, "vid")}) qv
  JOIN cents{iters} c ON c.sub = qv.sub AND c.d = qv.d
  GROUP BY qv.vid, qv.sub, c.cid
),
scored AS MATERIALIZED (
  SELECT lut.qid, p.vid,
         CAST(SUM(lut.dm) AS BIGINT) AS dist_micro, COUNT(*) AS mm
  FROM pick{iters} p
  JOIN lut ON lut.sub = p.sub AND lut.cid = p.cid
  GROUP BY lut.qid, p.vid
)
SELECT qid, vid AS nid,
       CAST(ROW_NUMBER() OVER (PARTITION BY qid ORDER BY dist_micro, vid) AS BIGINT) AS rank,
       dist_micro
FROM scored WHERE mm = {m}
QUALIFY rank <= {top}"""
    )
    return "WITH " + ",\n".join(blocks)
