"""Deduplication operators for a web-scale corpus.

Five strategies, ordered by cost:

* **exact**       — hash-groupBy on the normalized-content fingerprint
                    (one shuffle of (hash, id) pairs; Catalyst partial agg).
* **n-gram Jaccard** — exact set similarity via an inverted shingle index:
                    explode shingles → self-join on shingle → pair counts.
                    The join is shuffle-heavy but never materializes the
                    full pair matrix — only pairs sharing ≥1 shingle.
* **MinHash + LSH** — signatures from ``xxhash64`` (JVM) under k seeded
                    affine permutations, banded into buckets; candidate
                    pairs only within buckets (sub-quadratic at scale).
* **SimHash**     — 64-bit bit-majority fingerprint of token hashes;
                    near-dups have small Hamming distance.
* **embedding cosine** — near-dup by vector similarity (see
                    :mod:`ddspark.pipeline.ann` for the scaled variant).

All shuffle keys are hashes/ints, never raw text.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, functions as F

from .hashing import portable_hash63
from .textops import fingerprint

__all__ = [
    "exact_dedup",
    "duplicated_spans",
    "duplicated_spans_oracle_sql",
    "word_gram_array",
    "word_tokens",
    "grams_from_tokens",
    "word_shingles",
    "jaccard_pairs",
    "cosine_pairs",
    "cosine_pairs_oracle_sql",
    "containment_pairs",
    "levenshtein_pairs",
    "minhash_coeffs",
    "minhash_signatures",
    "lsh_candidate_pairs",
    "minhash_dedup_pairs",
    "simhash",
    "simhash_chunk_layout",
    "simhash_pairs",
    "hamming_pairs",
    "embedding_neardup_pairs",
    "connected_components",
    "dedup_keepers",
    "dedup_paragraphs",
    "dedup_paragraphs_oracle_sql",
    "ngram_novelty",
    "ngram_novelty_oracle_sql",
]

# 2^31-1: products of two residues fit in int64 (no overflow under ANSI mode)
_MERSENNE = (1 << 31) - 1


def _hash63(col: Column | str, portable: bool) -> Column:
    """Token/shingle hash: fast JVM ``xxhash64`` by default; the md5-derived
    portable form (exact DuckDB twin, see :mod:`.hashing`) when the pipeline
    must be replayable by the ANSI-SQL oracle."""
    return portable_hash63(col) if portable else F.xxhash64(col)


def exact_dedup(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """One row per distinct normalized content: keeper id + duplicate count."""
    return (
        df.select(F.col(id_col), fingerprint(F.col(text_col)).alias("fp"))
        .groupBy("fp")
        .agg(
            F.min(id_col).alias("keep_id"),
            F.count(F.lit(1)).alias("dup_count"),
        )
    )


def word_tokens(text: Column) -> Column:
    """The single tokenization expression shared by every word-gram
    operator (shingling, decontamination, repetition stats), so the
    normalization rule and its ANSI twins can never diverge."""
    return F.split(F.regexp_replace(F.lower(F.trim(text)), r"\s+", " "), " ")


def grams_from_tokens(toks: Column, n: int) -> Column:
    """Array of word ``n``-grams from a token array (repeats kept).

    ``toks`` should be a MATERIALIZED column (bound via a projection, as
    :func:`word_shingles` does), not the raw tokenization expression:
    Catalyst does not common-subexpression-eliminate inside higher-order
    function lambdas, so an inline expression is re-evaluated once per
    gram — measured 224 s -> 3 s for 2.5 M grams over 50 k docs when the
    r5 fix added the projection boundary.  Each gram is one
    ``slice``+``concat_ws`` (no per-word ``element_at`` fan-out)."""
    # NB: sequence(0, -1) descends in Spark — short docs need an empty array
    idx = F.when(
        F.size(toks) >= n, F.sequence(F.lit(0), F.size(toks) - n)
    ).otherwise(F.array().cast("array<int>"))
    return F.transform(
        idx, lambda i: F.concat_ws(" ", F.slice(toks, i + 1, n))
    )


def word_gram_array(text: Column, n: int) -> Column:
    """Array of word ``n``-grams of the normalized text (repeats kept).

    Single-expression form for contexts that need one Column; inside it
    the token array is still re-evaluated once per gram (see
    :func:`grams_from_tokens`), so DataFrame operators should project
    :func:`word_tokens` first and call :func:`grams_from_tokens` on the
    bound column instead."""
    return grams_from_tokens(word_tokens(text), n)


def word_shingles(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text", n: int = 3
) -> DataFrame:
    """Distinct word n-grams per document: ``(id, shingle)``.

    Tokenizes behind a projection boundary so the token array is computed
    once per document, then builds each gram with one ``slice`` — the
    gram stage is O(words) per row, not O(words * n) re-tokenizations."""
    return (
        df.select(
            F.col(id_col).alias("id"),
            word_tokens(F.col(text_col)).alias("_toks"),
        )
        .select(
            "id",
            F.explode(grams_from_tokens(F.col("_toks"), n)).alias("shingle"),
        )
        .distinct()
    )


def jaccard_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    threshold: float = 0.5,
    df_cap: int | None = None,
) -> DataFrame:
    """Exact n-gram Jaccard similarity for every pair sharing a shingle.

    ``|A∩B|`` comes from the inverted-index self-join; ``|A∪B| = |A|+|B|-∩``.
    Output: ``id_a < id_b, jaccard`` (rounded) above the threshold.

    **Scale**: a shingle shared by ``d`` documents contributes ``d*(d-1)/2``
    join rows, so one boilerplate shingle in a web corpus explodes the
    self-join.  ``df_cap`` drops shingles whose document frequency exceeds
    the cap *before* the join (they carry ~no Jaccard signal), bounding the
    candidate count at ``n_shingles * df_cap^2 / 2``; similarity is then
    exact Jaccard over the capped shingle universe (sizes are computed after
    the filter, so the estimate stays internally consistent).  Set it (e.g.
    64) for any corpus-scale run; the default ``None`` keeps the textbook
    exact semantics for small inputs.
    """
    sh = word_shingles(df, id_col, text_col, n).withColumn(
        "sh", F.xxhash64("shingle")
    ).select("id", "sh")
    if df_cap is not None:
        hot = (
            sh.groupBy("sh")
            .agg(F.count(F.lit(1)).alias("_df"))
            .where(F.col("_df") > df_cap)
            .select("sh")
        )
        sh = sh.join(hot, "sh", "left_anti")
    sizes = sh.groupBy("id").agg(F.count(F.lit(1)).alias("sz"))
    a = sh.alias("a")
    b = sh.alias("b")
    inter = (
        a.join(b, (F.col("a.sh") == F.col("b.sh")) & (F.col("a.id") < F.col("b.id")))
        .groupBy(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    out = (
        # No broadcast hint on `sizes`: it is one row per *document*, so a
        # forced broadcast OOMs executors at 10^8+ docs.  `inter` is already
        # keyed by id — a shuffle hash join is the safe plan, and AQE will
        # still pick broadcast at runtime when the size side actually fits.
        inter.join(sizes.withColumnRenamed("id", "id_a").withColumnRenamed("sz", "sz_a"), "id_a")
        .join(sizes.withColumnRenamed("id", "id_b").withColumnRenamed("sz", "sz_b"), "id_b")
        .withColumn(
            "jaccard",
            F.round(F.col("inter") / (F.col("sz_a") + F.col("sz_b") - F.col("inter")), 6),
        )
        .where(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )
    return out


def containment_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    threshold: float = 0.8,
    df_cap: int | None = None,
) -> DataFrame:
    """Exact n-gram *containment* for every pair sharing a shingle:
    ``C(A→B) = |A∩B| / |A|`` — the directional companion to
    :func:`jaccard_pairs`.

    Jaccard misses subset relationships: a tweet quoted inside a long
    article has tiny Jaccard but containment ≈ 1 in the tweet→article
    direction.  Containment is the signal ExactSubstr/CCNet-style
    pipelines use to drop *quoted/embedded* duplicates that symmetric
    similarity keeps.

    Output: ``(id_a < id_b, c_ab, c_ba)`` rounded to 6 dp, kept when
    ``max(c_ab, c_ba) >= threshold``; ``c_ab`` is the fraction of A's
    shingles found in B (A contained-in B when ≈ 1).

    Same scale posture as :func:`jaccard_pairs`: inverted-index
    self-join on shingle hash, ``df_cap`` drops boilerplate shingles
    before the join (sizes recomputed after the filter so the ratio
    stays internally consistent), candidate count bounded at
    ``n_shingles * df_cap^2 / 2``.
    """
    sh = word_shingles(df, id_col, text_col, n).withColumn(
        "sh", F.xxhash64("shingle")
    ).select("id", "sh")
    if df_cap is not None:
        hot = (
            sh.groupBy("sh")
            .agg(F.count(F.lit(1)).alias("_df"))
            .where(F.col("_df") > df_cap)
            .select("sh")
        )
        sh = sh.join(hot, "sh", "left_anti")
    sizes = sh.groupBy("id").agg(F.count(F.lit(1)).alias("sz"))
    a = sh.alias("a")
    b = sh.alias("b")
    inter = (
        a.join(b, (F.col("a.sh") == F.col("b.sh")) & (F.col("a.id") < F.col("b.id")))
        .groupBy(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    # sizes is one row per document — no broadcast hint (same OOM rationale
    # as jaccard_pairs); AQE picks broadcast when it actually fits
    return (
        inter.join(sizes.withColumnRenamed("id", "id_a").withColumnRenamed("sz", "sz_a"), "id_a")
        .join(sizes.withColumnRenamed("id", "id_b").withColumnRenamed("sz", "sz_b"), "id_b")
        .withColumn("c_ab", F.round(F.col("inter") / F.col("sz_a"), 6))
        .withColumn("c_ba", F.round(F.col("inter") / F.col("sz_b"), 6))
        .where(F.greatest("c_ab", "c_ba") >= threshold)
        .select("id_a", "id_b", "c_ab", "c_ba")
    )


def minhash_signatures(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    num_hashes: int = 64,
    seed: int = 42,
    portable: bool = False,
) -> DataFrame:
    """MinHash signature per document: ``(id, sig ARRAY<BIGINT>[num_hashes])``.

    Shingle → hash (JVM ``xxhash64``, or the md5-derived portable hash when
    ``portable`` — exactly replayable in ANSI SQL) → k affine permutations
    ``(a*h + b) mod p`` over a Mersenne prime, min per permutation — all in
    one hash aggregate; signature length is fixed, independent of doc size.
    """
    coeffs = minhash_coeffs(num_hashes, seed)
    sh = word_shingles(df, id_col, text_col, n).select(
        "id", F.pmod(_hash63("shingle", portable), F.lit(_MERSENNE)).alias("h")
    )
    mins = [
        F.min(F.pmod(F.col("h") * F.lit(a) + F.lit(b), F.lit(_MERSENNE))).alias(f"m{i}")
        for i, (a, b) in enumerate(coeffs)
    ]
    agg = sh.groupBy("id").agg(*mins)
    return agg.select("id", F.array(*[f"m{i}" for i in range(num_hashes)]).alias("sig"))


def minhash_coeffs(num_hashes: int, seed: int) -> list[tuple[int, int]]:
    """The seeded affine-permutation coefficients — shared with the ANSI-SQL
    oracle generator so both engines permute identically."""
    import random

    rnd = random.Random(seed)
    return [
        (rnd.randrange(1, _MERSENNE), rnd.randrange(0, _MERSENNE))
        for _ in range(num_hashes)
    ]


def lsh_candidate_pairs(
    signatures: DataFrame,
    bands: int = 16,
    rows_per_band: int = 4,
    portable: bool = False,
    max_bucket: int | None = None,
) -> DataFrame:
    """Band the signatures; docs sharing any band bucket are candidates.

    **Scale**: a cluster of ``d`` near-identical documents shares every band
    bucket, contributing ``bands * d^2 / 2`` candidate rows — exact-dup
    clusters are the classic LSH blowup.  ``max_bucket`` drops buckets
    holding more than that many docs before the self-join (an explicit
    recall trade-off; pairs inside a dropped mega-cluster are better found
    by running :func:`exact_dedup` first, which is also the cheaper tool for
    them)."""
    sig = signatures
    band_cols = []
    for b in range(bands):
        sl = F.slice("sig", b * rows_per_band + 1, rows_per_band)
        if portable:
            bucket = portable_hash63(
                F.concat_ws(",", F.transform(sl, lambda x: x.cast("string")))
            )
        else:
            bucket = F.xxhash64(sl.cast("string"))
        band_cols.append(F.struct(F.lit(b).alias("band"), bucket.alias("bucket")))
    exploded = sig.select("id", F.explode(F.array(*band_cols)).alias("bb")).select(
        "id", F.col("bb.band").alias("band"), F.col("bb.bucket").alias("bucket")
    )
    if max_bucket is not None:
        oversized = (
            exploded.groupBy("band", "bucket")
            .agg(F.count(F.lit(1)).alias("_n"))
            .where(F.col("_n") > max_bucket)
            .select("band", "bucket")
        )
        exploded = exploded.join(oversized, ["band", "bucket"], "left_anti")
    a = exploded.alias("a")
    b = exploded.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .distinct()
    )


def minhash_dedup_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    num_hashes: int = 64,
    bands: int = 16,
    threshold: float = 0.5,
    seed: int = 42,
    portable: bool = False,
    max_bucket: int | None = None,
) -> DataFrame:
    """LSH candidates + signature-estimated Jaccard filter.

    Output: ``id_a, id_b, est_jaccard`` — near-dup pairs without any
    all-pairs comparison.  With ``portable`` every hash has an exact
    ANSI-SQL twin (:func:`ddspark.pipeline.oracles.minhash_lsh_oracle_sql`),
    making the whole pipeline independently replayable.  ``max_bucket``
    guards against exact-dup mega-clusters (see
    :func:`lsh_candidate_pairs`).
    """
    rows_per_band = num_hashes // bands
    sigs = minhash_signatures(df, id_col, text_col, n, num_hashes, seed, portable)
    cand = lsh_candidate_pairs(sigs, bands, rows_per_band, portable, max_bucket)
    sa = sigs.withColumnRenamed("id", "id_a").withColumnRenamed("sig", "sig_a")
    sb = sigs.withColumnRenamed("id", "id_b").withColumnRenamed("sig", "sig_b")
    est = F.size(F.filter(F.zip_with("sig_a", "sig_b", lambda x, y: x == y), lambda v: v)) / F.lit(
        float(num_hashes)
    )
    return (
        cand.join(sa, "id_a")
        .join(sb, "id_b")
        .withColumn("est_jaccard", F.round(est, 6))
        .where(F.col("est_jaccard") >= threshold)
        .select("id_a", "id_b", "est_jaccard")
    )


def simhash(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_bits: int = 64,
    portable: bool = False,
) -> DataFrame:
    """SimHash per document: sign of the per-bit majority over token hashes —
    computed as ``n_bits`` JVM aggregate expressions (no Python).

    ``portable`` switches the token hash to the md5-derived 60-bit form
    (exact ANSI-SQL twin); it requires ``n_bits <= 60``.
    """
    if portable and n_bits > 60:
        raise ValueError("portable hashing provides 60 bits; n_bits must be <= 60")
    if not 2 <= n_bits <= 64:
        raise ValueError(f"n_bits must be in [2, 64], got {n_bits}")
    toks = df.select(
        F.col(id_col).alias("id"),
        F.explode(
            F.filter(F.split(F.lower(F.trim(F.col(text_col))), r"\s+"), lambda x: x != "")
        ).alias("tok"),
    ).withColumn("h", _hash63("tok", portable))
    bit_sums = [
        F.sum(
            F.when(F.shiftright("h", i).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1)
        ).alias(f"b{i}")
        for i in range(n_bits)
    ]
    agg = toks.groupBy("id").agg(*bit_sums)
    fp = F.lit(0).cast("long")
    for i in range(n_bits):
        # bit 63 (full-width form only) is the sign bit: add its
        # two's-complement value
        bit_val = (1 << i) if i < 63 else -(1 << 63)
        fp = fp + F.when(F.col(f"b{i}") > 0, F.lit(bit_val).cast("long")).otherwise(
            F.lit(0).cast("long")
        )
    return agg.select("id", fp.alias("simhash"))


def simhash_chunk_layout(n_bits: int, max_hamming: int) -> list[tuple[int, int]]:
    """``(offset, width)`` per pigeonhole chunk — shared with the ANSI-SQL
    oracle generator so both engines block on identical bit ranges."""
    if max_hamming > 15:
        raise ValueError(
            "pigeonhole blocking needs max_hamming+1 <= 16 chunks; "
            f"got max_hamming={max_hamming}"
        )
    n_chunks = min(max(max_hamming + 1, 2), 16)
    base_w, extra = divmod(n_bits, n_chunks)
    widths = [base_w + (1 if c < extra else 0) for c in range(n_chunks)]
    offsets = [sum(widths[:c]) for c in range(n_chunks)]
    return list(zip(offsets, widths))


def hamming_pairs(
    fp: DataFrame,
    id_col: str = "id",
    hash_col: str = "fingerprint",
    max_hamming: int = 3,
    n_bits: int = 64,
    max_bucket: int | None = None,
) -> DataFrame:
    """Near-dup pairs by Hamming distance over ANY 64-bit-or-less
    fingerprint column (SimHash, image dHash, audio chromaprint-style
    hashes, ...): pigeonhole chunk blocking + bit_count verify, exactly
    the :func:`simhash_pairs` engine factored out.  Input: one row per
    item ``(id_col, hash_col)``; output ``(id_a, id_b, hamming)`` with
    ``id_a < id_b``.  See :func:`simhash_pairs` for the scale envelope
    and the ``max_bucket`` trade-off."""
    layout = simhash_chunk_layout(n_bits, max_hamming)
    base = fp.select(F.col(id_col).alias("id"), F.col(hash_col).alias("_h"))
    chunk_cols = [
        F.struct(
            F.lit(c).alias("c"),
            F.shiftrightunsigned("_h", off)
            .bitwiseAND(F.lit((1 << width) - 1))
            .alias("v"),
        )
        for c, (off, width) in enumerate(layout)
    ]
    chunks = base.select(
        "id", "_h", F.explode(F.array(*chunk_cols)).alias("ch")
    ).select("id", "_h", F.col("ch.c").alias("c"), F.col("ch.v").alias("v"))
    if max_bucket is not None:
        oversized = (
            chunks.groupBy("c", "v")
            .agg(F.count(F.lit(1)).alias("_n"))
            .where(F.col("_n") > max_bucket)
            .select("c", "v")
        )
        chunks = chunks.join(oversized, ["c", "v"], "left_anti")
    a = chunks.alias("a")
    b = chunks.alias("b")
    ham = F.bit_count(F.col("a._h").bitwiseXOR(F.col("b._h")))
    return (
        a.join(
            b,
            (F.col("a.c") == F.col("b.c"))
            & (F.col("a.v") == F.col("b.v"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            ham.alias("hamming"),
        )
        .distinct()
        .where(F.col("hamming") <= max_hamming)
    )


def simhash_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_hamming: int = 3,
    n_bits: int = 64,
    portable: bool = False,
    max_bucket: int | None = None,
) -> DataFrame:
    """Near-dup pairs by SimHash Hamming distance.

    Candidate generation blocks on ``max_hamming + 1`` bit chunks: by
    pigeonhole, any pair within Hamming ``max_hamming`` has at least one
    identical chunk, so recall is complete for ``max_hamming <= 15``
    (larger budgets raise — they would need more than 16 chunks).

    **Scale envelope** (be honest about it): with ``c = max_hamming + 1``
    chunks of ``n_bits/c`` bits, a random corpus of ``N`` docs yields about
    ``c * N^2 / 2^(n_bits/c)`` candidate pairs — sub-quadratic only while
    ``2^(n_bits/c)`` is large relative to ``N``.  The default
    ``max_hamming=3`` (4 chunks x 16 bits) keeps buckets tiny up to ~10^6
    docs per bucket universe; ``max_hamming=12`` (13 chunks x ~5 bits) is
    near-quadratic and should not be used at corpus scale.  ``max_bucket``
    additionally drops any chunk bucket holding more than that many docs
    (boilerplate/degenerate content) — candidates lost that way may reduce
    recall, so it is an explicit, logged trade-off, not a default.
    """
    fp = simhash(df, id_col, text_col, n_bits, portable)
    return hamming_pairs(fp, "id", "simhash", max_hamming, n_bits, max_bucket)


def embedding_neardup_pairs(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.95,
    max_rows: int | None = 1_000_000,
) -> DataFrame:
    """Near-duplicate pairs by cosine similarity — **exact, all-pairs
    O(n²) self-join**: the small-corpus ground-truth tool, not a scale path.

    ``max_rows`` is a fail-fast guard: if the input exceeds it, raise and
    point at the sub-quadratic alternatives instead of silently launching an
    n² shuffle (at 10^8 docs that join is 5·10^15 candidate rows).  Pass
    ``max_rows=None`` only when you have sized the cluster for the quadratic
    cost deliberately.  Scale paths: :func:`ddspark.pipeline.ann.semantic_dedup_pairs`
    (cluster-bucketed) or :func:`ddspark.pipeline.ann.lsh_topk` (hash-bucketed).
    """
    from .ann import _dot, normalize_vecs

    if max_rows is not None:
        n = df.count()
        if n > max_rows:
            raise ValueError(
                f"embedding_neardup_pairs is an exact all-pairs O(n^2) join; "
                f"input has {n} rows > max_rows={max_rows}. Use "
                "ddspark.pipeline.ann.semantic_dedup_pairs (cluster-bucketed) "
                "or ann.lsh_topk (LSH-bucketed) at corpus scale, or pass "
                "max_rows=None to override deliberately."
            )
    v = normalize_vecs(df, id_col, vec_col)
    a = v.alias("a")
    b = v.alias("b")
    return (
        a.join(b, F.col("a.id") < F.col("b.id"))
        .withColumn("cosine", F.round(_dot(F.col("a.u"), F.col("b.u")), 6))
        .where(F.col("cosine") >= threshold)
        .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"), "cosine")
    )


def connected_components(
    pairs: DataFrame,
    a_col: str = "id_a",
    b_col: str = "id_b",
    max_iters: int = 50,
) -> DataFrame:
    """Connected components over a near-dup pair list: ``(id, component)``
    where ``component`` is the smallest id reachable from ``id`` — the
    step that turns pairwise dedup output into dedup *clusters* (keep one
    document per component, drop the rest).

    Algorithm: min-label propagation with pointer jumping — each round (a)
    takes the min label over neighbors (one hash join + min-agg) and (b)
    replaces every label by its label's label (path halving, one more hash
    join), so label chains collapse exponentially and even a path graph of
    diameter d converges in O(log d) rounds (fixed-point checked;
    ``max_iters`` bounds adversarial graphs).  Labels are
    ``localCheckpoint``-ed every round — the standard guard against the
    exponentially deepening lineage of iterative DataFrame plans.

    Scale: every join keys on integer node ids; per-round state never
    exceeds the input edge list plus one label per node.
    """
    edges = (
        pairs.select(
            F.least(F.col(a_col), F.col(b_col)).alias("u"),
            F.greatest(F.col(a_col), F.col(b_col)).alias("v"),
        )
        .where(F.col("u") != F.col("v"))
        .distinct()
    )
    # label(x) starts as min neighbor (or itself); iterate min-propagation:
    # lbl <- min over neighbors' labels and own label, until fixpoint
    nodes = edges.select(F.col("u").alias("id")).union(
        edges.select(F.col("v").alias("id"))
    ).distinct()
    lbl = nodes.select("id", F.col("id").alias("c")).localCheckpoint()
    both = edges.union(edges.select(F.col("v").alias("u"), F.col("u").alias("v")))
    both = both.persist()
    for _ in range(max_iters):
        # (a) candidate label per node: min of own and neighbors' labels
        nb = (
            both.join(lbl.withColumnRenamed("id", "v"), "v")
            .groupBy("u")
            .agg(F.min("c").alias("nc"))
            .withColumnRenamed("u", "id")
        )
        stepped = (
            lbl.join(nb, "id", "left")
            .select(
                "id",
                F.least("c", F.coalesce("nc", "c")).alias("c"),
                # round-start label rides along so the fixpoint check below
                # is a local scan of the checkpointed rows instead of a
                # whole extra node-set join+shuffle per iteration
                F.col("c").alias("_oc"),
            )
        )
        # (b) pointer jumping: c <- label(c) (labels are node ids, so the
        # parent lookup is a self-join); collapses label chains by half
        par = stepped.select(F.col("id").alias("_p"), F.col("c").alias("pc"))
        new_lbl = (
            stepped.join(par, stepped["c"] == par["_p"], "left")
            .select("id", F.least(F.coalesce("pc", "c"), "c").alias("c"), "_oc")
            # lazy lineage cut: the fixpoint count below materializes it
            # in its own job — one job per round instead of two
            .localCheckpoint(eager=False)
        )
        # full count, not limit(1): this is the job that materializes the
        # lazy checkpoint, so every partition must be computed here (a
        # limit could stop after one partition and leave the truncated
        # lineage unable to rebuild the rest)
        changed = new_lbl.where(F.col("c") != F.col("_oc")).count()
        lbl = new_lbl.select("id", "c")
        if changed == 0:
            break
    both.unpersist()
    return lbl.select("id", F.col("c").alias("component"))


def dedup_keepers(
    df: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
    a_col: str = "id_a",
    b_col: str = "id_b",
) -> DataFrame:
    """Per-document dedup verdict from a near-dup pair list:
    ``(id_col, component, keep BOOLEAN)`` — the component minimum is kept,
    every other member dropped; documents in no pair keep themselves."""
    comp = connected_components(pairs, a_col, b_col)
    out = df.select(F.col(id_col).alias("id")).join(comp, "id", "left")
    return out.select(
        F.col("id").alias(id_col),
        F.coalesce("component", "id").alias("component"),
        (F.coalesce("component", "id") == F.col("id")).alias("keep"),
    )


def apply_keepers(
    corpus: DataFrame, keepers: DataFrame, id_col: str = "doc_id"
) -> DataFrame:
    """Apply a :func:`dedup_keepers` verdict to the corpus: one LEFT SEMI
    join on ``id_col`` against the kept ids, corpus schema preserved.

    This join is where a 100 TB dedup run pays its biggest shuffle — the
    full corpus re-partitioned by ``id_col`` just to drop the losers.  When
    the corpus AND the keeper table are co-bucketed by ``id_col``
    (:func:`ddspark.io.write_bucketed`), both scans report the same
    ``HashPartitioning`` and the semi-join runs partition-local with ZERO
    exchanges (plan pytest in ``tests/test_corpus_checkpoint.py``; PLANS.md
    'Co-bucketed dedup pipeline').  The signature/fingerprint side tables
    bucket the same way, so attach-signature joins are exchange-free too —
    bucket the corpus once, never shuffle it through the dedup loop again.
    """
    kept = keepers.where(F.col("keep")).select(F.col(id_col))
    return corpus.join(kept, id_col, "left_semi")


def dedup_paragraphs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    sep: str = "\n\n",
    min_chars: int = 1,
) -> DataFrame:
    """Corpus-wide exact paragraph dedup (the Dolma/RefinedWeb paragraph
    step): every paragraph keeps only its FIRST occurrence over the whole
    corpus — ordered by ``(id, position)`` — and later repeats are removed
    from their documents; remaining paragraphs rejoin with ``sep`` in
    original order.  Distinct from :func:`ddspark.pipeline.textops.
    drop_boilerplate_lines`, which removes *frequent* lines everywhere —
    here even a twice-repeated paragraph loses its second copy, but the
    first survives.  Paragraphs shorter than ``min_chars`` (structural
    blanks) are never deduplicated.

    Output: ``(id_col, text)``; docs whose every paragraph was a repeat
    keep an empty string.

    **Scale**: paragraphs travel as ``xxhash64`` keys.  First-occurrence
    selection is a ``min(struct(id, pos))`` *aggregation* — map-side
    combine absorbs a mega-duplicated paragraph (no single-partition
    window sort on the hot hash) — and the keep decision is a left-semi
    join on ``(hash, id, pos)``, which is perfectly spread even when one
    paragraph dominates.  Reassembly groups on the unique id.  As with the
    line op, the DuckDB oracle replays on exact strings, so an xxhash64
    collision would surface as a gate mismatch rather than hide.
    """
    import re

    # NULL text coalesces to '' so a NULL-text doc behaves exactly like an
    # empty one on both sides of the gate (split(NULL) would explode to no
    # rows here while the SQL twin's string_split(NULL) drops the doc).
    ex = df.select(
        F.col(id_col).alias("id"),
        F.posexplode(
            F.split(F.coalesce(F.col(text_col), F.lit("")), re.escape(sep))
        ).alias("pos", "para"),
    ).withColumn("ph", F.xxhash64("para"))
    long = ex.where(F.length("para") >= min_chars)
    firsts = long.groupBy("ph").agg(F.min(F.struct("id", "pos")).alias("m")).select(
        "ph",
        F.col("m.id").alias("id"),
        F.col("m.pos").alias("pos"),
        F.lit(True).alias("_first"),
    )
    # one left join carries the keep decision for both cases (first
    # occurrence, or structurally short) — a semi-join + union would
    # re-evaluate the explode a third time for the short branch
    kept = (
        ex.join(firsts, ["ph", "id", "pos"], "left")
        .where((F.length("para") < min_chars) | F.col("_first").isNotNull())
        .drop("_first")
    )
    rebuilt = kept.groupBy("id").agg(
        F.concat_ws(
            sep,
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "para"))),
                lambda s: s["para"],
            ),
        ).alias("text")
    )
    base = df.select(F.col(id_col).alias("id"))
    return base.join(rebuilt, "id", "left").select(
        F.col("id").alias(id_col), F.coalesce("text", F.lit("")).alias("text")
    )


def dedup_paragraphs_oracle_sql(
    table: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    sep: str = "\n\n",
    min_chars: int = 1,
    project: str = "text",
) -> str:
    """ANSI/DuckDB twin of :func:`dedup_paragraphs`, replayed on exact
    paragraph strings (see the collision note there).  ``project`` controls
    the output: ``"text"`` emits the cleaned text, ``"md5"`` emits
    ``md5(text)``."""
    proj = (
        f"cleaned AS {text_col}"
        if project == "text"
        else "md5(cleaned) AS clean_md5"
    )
    sep_sql = "E'" + (
        sep.replace("\\", "\\\\").replace("'", "''")
        .replace("\n", "\\n").replace("\t", "\\t")
    ) + "'"
    return f"""
WITH ex AS (
  SELECT t.{id_col} AS id, u.i AS pos, t.paras[u.i + 1] AS para
  FROM (SELECT {id_col},
               string_split(COALESCE({text_col}, ''), {sep_sql}) AS paras
        FROM {table}) t,
       UNNEST(generate_series(0, len(t.paras) - 1)) AS u(i)
),
k AS (
  SELECT id, pos, para,
         CASE WHEN length(para) < {min_chars} THEN 1
              WHEN ROW_NUMBER() OVER (PARTITION BY para ORDER BY id, pos) = 1
                THEN 1 ELSE 0 END AS keep
  FROM ex
),
reb AS (
  SELECT id,
         COALESCE(string_agg(para, {sep_sql} ORDER BY pos)
                    FILTER (WHERE keep = 1), '') AS cleaned,
         COUNT(*) FILTER (WHERE keep = 1) AS n_kept
  FROM k GROUP BY id
)
SELECT id AS {id_col}, {proj} FROM reb
"""


def duplicated_spans(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 50,
    min_count: int = 2,
    portable: bool = False,
) -> DataFrame:
    """Exact substring-span deduplication (the ExactSubstr pass of Lee et
    al. 2021, "Deduplicating Training Data Makes Language Models Better",
    arXiv:2107.06499, at word granularity): find every ``n``-token window
    whose content occurs at least ``min_count`` times ANYWHERE in the
    corpus, then merge each document's duplicated windows into maximal
    token spans.

    Output: one row per merged span —
    ``(id_col, span_start, span_end, n_windows)`` with token indices
    ``[span_start, span_end)`` and ``n_windows`` the number of duplicated
    windows the span absorbed.  Cutting these spans out removes every
    corpus-duplicated substring of ``>= n`` tokens.

    Plan shape (all linear, nothing all-pairs):

    1. tokenize once behind a projection, ``posexplode`` the gram array —
       O(words) rows total;
    2. count occurrences per gram hash (partial agg before the shuffle)
       and keep hashes seen ``>= min_count`` times;
    3. one hash-keyed join window-positions x duplicated-hashes (both
       sides shrink first: positions project ``(id, pos, h)``, the dup
       side is ``(h)`` only);
    4. per-document gaps-and-islands merge: a window over ``(id, pos)``
       computes the running max window-end; a new island starts where
       ``pos`` jumps past it.  The window key includes the unique doc id,
       so the merge cannot skew.

    With ``portable`` the gram hash is the md5-derived
    :func:`~ddspark.pipeline.hashing.portable_hash63`, making the whole
    operator replayable bit-for-bit in ANSI SQL.

    Note: the corpus is scanned twice (window positions + the global
    count feed from the same source).  When scan+tokenize dominates,
    ``df.persist()`` (or a pre-materialized token table) before calling
    collapses the two reads into one."""
    from pyspark.sql import Window

    grams = df.select(
        F.col(id_col).alias("id"),
        word_tokens(F.col(text_col)).alias("_toks"),
    ).select(
        "id",
        F.posexplode(grams_from_tokens(F.col("_toks"), n)).alias("pos", "g"),
    )
    pos = grams.select("id", "pos", _hash63("g", portable).alias("h"))
    dup = (
        pos.groupBy("h")
        .agg(F.count(F.lit(1)).alias("_c"))
        .where(F.col("_c") >= min_count)
        .select("h")
    )
    cand = pos.join(dup, "h").select("id", "pos")
    w = Window.partitionBy("id").orderBy("pos")
    prev_end = F.max(F.col("pos") + n).over(
        w.rowsBetween(Window.unboundedPreceding, -1)
    )
    islands = cand.select(
        "id",
        "pos",
        F.when(prev_end.isNull() | (F.col("pos") > prev_end), 1)
        .otherwise(0)
        .alias("_new"),
    ).select(
        "id", "pos", F.sum("_new").over(w).alias("_island")
    )
    return (
        islands.groupBy("id", "_island")
        .agg(
            F.min("pos").alias("span_start"),
            (F.max("pos") + n).alias("span_end"),
            F.count(F.lit(1)).alias("n_windows"),
        )
        .select(
            F.col("id").alias(id_col), "span_start", "span_end", "n_windows"
        )
    )


def duplicated_spans_oracle_sql(
    table: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 50,
    min_count: int = 2,
    where: str | None = None,
) -> str:
    """Twin of :func:`duplicated_spans` (``portable=True``)."""
    from .hashing import portable_hash63_sql

    filt = f"WHERE {where}" if where else ""
    gram = " || ' ' || ".join(f"t[i + {j}]" for j in range(n))
    h = portable_hash63_sql(f"({gram})")
    return rf"""
WITH toks AS (
  SELECT {id_col} AS id,
         string_split(regexp_replace(trim(lower({text_col})), '\s+', ' ', 'g'), ' ') AS t
  FROM {table} {filt}
),
pos AS (
  SELECT id, u.i - 1 AS pos, {h} AS h
  FROM toks, UNNEST(generate_series(1, len(t) - {n - 1})) AS u(i)
  WHERE len(t) >= {n}
),
dup AS (
  SELECT h FROM pos GROUP BY h HAVING COUNT(*) >= {min_count}
),
cand AS (
  SELECT id, pos FROM pos JOIN dup USING (h)
),
marked AS (
  SELECT id, pos,
         CASE WHEN MAX(pos + {n}) OVER (
                PARTITION BY id ORDER BY pos
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) IS NULL
               OR pos > MAX(pos + {n}) OVER (
                PARTITION BY id ORDER BY pos
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
              THEN 1 ELSE 0 END AS newi
  FROM cand
),
islands AS (
  SELECT id, pos,
         SUM(newi) OVER (PARTITION BY id ORDER BY pos
                         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS island
  FROM marked
)
SELECT id AS {id_col},
       CAST(MIN(pos) AS INT) AS span_start,
       CAST(MAX(pos) + {n} AS INT) AS span_end,
       COUNT(*) AS n_windows
FROM islands GROUP BY id, island
"""


def levenshtein_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_dist: int = 2,
    df_cap: int | None = None,
) -> DataFrame:
    """Fuzzy entity matching: every pair of SHORT strings within edit
    distance ``max_dist`` — ``(id_a < id_b, dist)``.

    The title/name/URL near-match operator (entity resolution, catalog
    dedup) — a different regime from the document near-dup family:
    Jaccard/MinHash see token sets, edit distance sees transpositions
    and typos in short strings.

    Candidates come from a shared character-3-gram inverted index (the
    q-gram lemma: ed(a,b) <= k strings share >= max_len - 3 + 1 - 3k
    grams, which is positive — so recall is GUARANTEED — whenever the
    longer string has >= 3(k+1) chars; shorter strings may be missed
    and belong in an exact or length-banded pass).  ``df_cap`` drops
    boilerplate grams before the self-join exactly like
    :func:`jaccard_pairs`; the final filter is the JVM built-in
    ``levenshtein(a, b) <= k`` on the candidate pairs only.

    Cross-engine note: Spark's levenshtein counts CHARACTERS while
    DuckDB's counts BYTES — identical on ASCII, divergent on multibyte
    text; the oracle twin is therefore pinned to ASCII inputs.
    """
    if max_dist < 1:
        raise ValueError(f"max_dist must be >= 1, got {max_dist}")
    base = df.select(
        F.col(id_col).alias("id"), F.col(text_col).alias("s")
    ).where(F.col("s").isNotNull() & (F.length("s") >= 3))
    grams = base.select(
        "id",
        F.explode(
            F.array_distinct(
                F.transform(
                    F.sequence(F.lit(1), F.length("s") - 2),
                    lambda i: F.col("s").substr(i, F.lit(3)),
                )
            )
        ).alias("g"),
    )
    if df_cap is not None:
        hot = (
            grams.groupBy("g")
            .agg(F.count(F.lit(1)).alias("_df"))
            .where(F.col("_df") > df_cap)
            .select("g")
        )
        grams = grams.join(hot, "g", "left_anti")
    a = grams.alias("a")
    b = grams.alias("b")
    cand = (
        a.join(b, (F.col("a.g") == F.col("b.g")) & (F.col("a.id") < F.col("b.id")))
        .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .distinct()
    )
    sa = base.select(F.col("id").alias("id_a"), F.col("s").alias("_sa"))
    sb = base.select(F.col("id").alias("id_b"), F.col("s").alias("_sb"))
    return (
        cand.join(sa, "id_a")
        .join(sb, "id_b")
        .withColumn("dist", F.levenshtein("_sa", "_sb"))
        .where(F.col("dist") <= max_dist)
        .select("id_a", "id_b", "dist")
    )


def cosine_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    threshold: float = 0.5,
    max_df: int | None = None,
    max_df_frac: float | None = None,
    idf_scale: int | None = None,
    ndigits: int = 6,
) -> DataFrame:
    """Exact term-frequency cosine similarity for every document pair
    sharing a term: ``(id_a < id_b, n_common_terms, cosine)`` above the
    threshold — the bag-of-words companion to :func:`jaccard_pairs`
    (which sees only shingle *sets*; cosine weighs repeated terms).

    All sufficient statistics are exact integers — dot product
    ``sum(tf_a * tf_b)`` and squared norms ``sum(tf^2)`` — so the single
    double combination ``dot / (sqrt(na) * sqrt(nb))`` is bit-identical
    cross-engine.  Tokenization is the shared :func:`word_tokens` rule.

    ``idf_scale`` switches to TF-IDF cosine: each term's weight is the
    exact BIGINT ``floor(idf_scale * ln((N+1)/(df+1))) + 1`` (N =
    distinct documents in the pre-cut term table, smoothed so weights
    stay >= 1), the quantized-log trick of ``column_entropy`` — weighted
    products and norms then accumulate as exact DECIMALs, so the
    standard similarity mode stays value-hashable.

    **Scale**: identical shape to :func:`jaccard_pairs` — the candidate
    join is keyed by term, and ``max_df`` drops terms whose document
    frequency exceeds the cap *before* the join (stopwords carry ~no
    cosine signal but quadratic join cost); norms are computed after the
    cut so the score stays a true cosine of the filtered vectors.  Set
    it (e.g. 256) for corpus-scale runs.
    """
    if max_df is not None and max_df_frac is not None:
        raise ValueError("pass max_df OR max_df_frac, not both")
    toks = df.select(
        F.col(id_col).alias("id"),
        F.explode(word_tokens(F.col(text_col))).alias("term"),
    ).where(F.col("term") != "")
    tf = toks.groupBy("id", "term").agg(F.count(F.lit(1)).alias("tf"))
    if max_df_frac is not None:
        # corpus-size-proportional stopword cut: cap = ceil(frac * N) —
        # the absolute cap silently empties at 10x the documents
        nd0 = tf.agg(F.countDistinct("id").alias("_nd0"))
        hot = (
            tf.groupBy("term")
            .agg(F.count(F.lit(1)).alias("_df"))
            .crossJoin(F.broadcast(nd0))
            .where(
                F.col("_df")
                > F.ceil(F.lit(float(max_df_frac)) * F.col("_nd0")).cast("long")
            )
            .select("term")
        )
        tf = tf.join(hot, "term", "left_anti")
    elif max_df is not None:
        hot = (
            tf.groupBy("term")
            .agg(F.count(F.lit(1)).alias("_df"))
            .where(F.col("_df") > max_df)
            .select("term")
        )
        tf = tf.join(hot, "term", "left_anti")
    big = lambda c: c.cast("decimal(19,0)")  # noqa: E731
    if idf_scale is not None:
        dfreq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("_df"))
        nd = tf.agg(F.countDistinct("id").alias("_nd"))
        w = (
            F.floor(
                idf_scale
                * F.log(
                    (F.col("_nd") + 1).cast("double")
                    / (F.col("_df") + 1).cast("double")
                )
            )
            + 1
        ).cast("long")
        tf = (
            tf.join(dfreq, "term")
            .crossJoin(F.broadcast(nd))
            .select("id", "term", (F.col("tf") * w).alias("tf"))
        )
        norms = tf.groupBy("id").agg(
            F.sum(big(F.col("tf")) * big(F.col("tf"))).alias("n2")
        )
        dot_sum = F.sum(big(F.col("a.tf")) * big(F.col("b.tf"))).alias("dot")
    else:
        norms = tf.groupBy("id").agg(F.sum(F.col("tf") * F.col("tf")).alias("n2"))
        dot_sum = F.sum(F.col("a.tf") * F.col("b.tf")).alias("dot")
    a = tf.alias("a")
    b = tf.alias("b")
    dots = (
        a.join(
            b,
            (F.col("a.term") == F.col("b.term")) & (F.col("a.id") < F.col("b.id")),
        )
        .groupBy(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .agg(
            F.count(F.lit(1)).alias("n_common_terms"),
            dot_sum,
        )
    )
    out = (
        # like jaccard_pairs: no broadcast hint on norms (one row per doc)
        dots.join(norms.withColumnRenamed("id", "id_a").withColumnRenamed("n2", "n2_a"), "id_a")
        .join(norms.withColumnRenamed("id", "id_b").withColumnRenamed("n2", "n2_b"), "id_b")
        .withColumn(
            "cosine",
            F.round(
                F.col("dot").cast("double")
                / (F.sqrt(F.col("n2_a").cast("double")) * F.sqrt(F.col("n2_b").cast("double"))),
                ndigits,
            ),
        )
        .where(F.col("cosine") >= threshold)
        .select("id_a", "id_b", "n_common_terms", "cosine")
    )
    return out


def cosine_pairs_oracle_sql(
    table: str = "documents",
    id_col: str = "doc_id",
    text_col: str = "text",
    threshold: float = 0.5,
    max_df: int | None = None,
    max_df_frac: float | None = None,
    idf_scale: int | None = None,
    ndigits: int = 6,
) -> str:
    """ANSI twin of :func:`cosine_pairs` — same tokenization, same integer
    sufficient statistics, same double combination."""
    if max_df is not None and max_df_frac is not None:
        raise ValueError("pass max_df OR max_df_frac, not both")
    if max_df_frac is not None:
        cap = f"""
, nd0 AS (
  SELECT COUNT(DISTINCT id) AS n FROM tf
), hot AS (
  SELECT term FROM tf CROSS JOIN nd0
  GROUP BY term, nd0.n
  HAVING COUNT(*) > CAST(CEIL({float(max_df_frac)!r} * nd0.n) AS BIGINT)
), kept0 AS (
  SELECT tf.* FROM tf LEFT JOIN hot USING (term) WHERE hot.term IS NULL
)"""
    elif max_df is not None:
        cap = f"""
, hot AS (
  SELECT term FROM tf GROUP BY term HAVING COUNT(*) > {max_df}
), kept0 AS (
  SELECT tf.* FROM tf LEFT JOIN hot USING (term) WHERE hot.term IS NULL
)"""
    else:
        cap = ", kept0 AS (SELECT * FROM tf)"
    weight = (
        f"""
, dfreq AS (
  SELECT term, COUNT(*) AS df FROM kept0 GROUP BY term
), nd AS (
  SELECT COUNT(DISTINCT id) AS n FROM kept0
), kept AS (
  SELECT k.id, k.term,
         k.tf * (CAST(FLOOR({idf_scale} * LN(CAST(nd.n + 1 AS DOUBLE)
                                            / CAST(dfreq.df + 1 AS DOUBLE))) AS BIGINT) + 1) AS tf
  FROM kept0 k JOIN dfreq USING (term) CROSS JOIN nd
)"""
        if idf_scale is not None
        else ", kept AS (SELECT * FROM kept0)"
    )
    return f"""
WITH toks AS (
  SELECT {id_col} AS id, u.term
  FROM {table},
       UNNEST(string_split(regexp_replace(trim(lower({text_col})), '\\s+', ' ', 'g'), ' ')) AS u(term)
  WHERE u.term != ''
),
tf AS (
  SELECT id, term, COUNT(*) AS tf FROM toks GROUP BY id, term
){cap}{weight},
norms AS (
  SELECT id, SUM(CAST(tf AS HUGEINT) * CAST(tf AS HUGEINT)) AS n2 FROM kept GROUP BY id
),
dots AS (
  SELECT a.id AS id_a, b.id AS id_b,
         COUNT(*) AS n_common_terms,
         SUM(CAST(a.tf AS HUGEINT) * CAST(b.tf AS HUGEINT)) AS dot
  FROM kept a JOIN kept b ON a.term = b.term AND a.id < b.id
  GROUP BY a.id, b.id
)
SELECT id_a, id_b,
       CAST(n_common_terms AS BIGINT) AS n_common_terms,
       ROUND(CAST(dot AS DOUBLE) /
             (SQRT(CAST(na.n2 AS DOUBLE)) * SQRT(CAST(nb.n2 AS DOUBLE))), {ndigits}) AS cosine
FROM dots
JOIN norms na ON na.id = dots.id_a
JOIN norms nb ON nb.id = dots.id_b
WHERE ROUND(CAST(dot AS DOUBLE) /
            (SQRT(CAST(na.n2 AS DOUBLE)) * SQRT(CAST(nb.n2 AS DOUBLE))), {ndigits}) >= {threshold}
""".strip()


def ngram_novelty(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    scale: int = 10**6,
) -> DataFrame:
    """Per-document n-gram novelty — the memorization/recombination
    signal: of a document's DISTINCT word ``n``-grams, what fraction
    appears in NO other document?  Low novelty means the document is
    recombined from corpus-common phrasing (template spam, boilerplate,
    near-dup tails that survived pair-level dedup); training pipelines
    use it both to drop low-novelty documents and to find eval-set
    memorization.  Returns ``(id_col, n_grams, n_novel, novelty_micro,
    novelty)`` with ``novelty_micro = (scale * n_novel) div n_grams``
    (pure integer floor division — replays cross-engine) and documents
    shorter than ``n`` tokens carrying ``n_grams = 0`` and NULL
    novelty.

    **Scale** — the shared :func:`word_shingles` explode (distinct grams
    per doc, so in-document repetition never inflates the gram table),
    one gram-keyed count aggregation for corpus document frequency, one
    join back, one id-keyed aggregation.  The gram shuffle is the same
    shape as :func:`jaccard_pairs`' first stage, and hot grams cannot
    skew the per-doc counts because each doc contributes a gram once.
    """
    if n < 1 or scale < 1:
        raise ValueError("n and scale must be >= 1")
    sh = word_shingles(df, id_col, text_col, n=n)
    gdf = sh.groupBy("shingle").agg(F.count(F.lit(1)).alias("gdf"))
    per_doc = (
        sh.join(gdf, "shingle")
        .groupBy("id")
        .agg(
            F.count(F.lit(1)).alias("n_grams"),
            F.sum(F.when(F.col("gdf") == 1, 1).otherwise(0)).alias("n_novel"),
        )
    )
    base = df.select(F.col(id_col).alias("id"))
    out = base.join(per_doc, "id", "left").select(
        F.col("id").alias(id_col),
        F.coalesce("n_grams", F.lit(0)).cast("long").alias("n_grams"),
        F.coalesce("n_novel", F.lit(0)).cast("long").alias("n_novel"),
    )
    nm = F.when(
        F.col("n_grams") > 0,
        F.expr(f"({int(scale)} * n_novel) div n_grams"),
    ).cast("long")
    return out.withColumns(
        {
            "novelty_micro": nm,
            "novelty": F.round(nm.cast("double") / int(scale), 6),
        }
    )


def ngram_novelty_oracle_sql(
    table: str = "documents",
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    scale: int = 10**6,
) -> str:
    """ANSI twin of :func:`ngram_novelty` (same tokenization, distinct
    grams per doc, integer floor division)."""
    shingle = " || ' ' || ".join(f"t[i + {j}]" for j in range(n))
    return rf"""
WITH toks AS (
  SELECT {id_col} AS id,
         string_split(regexp_replace(trim(lower({text_col})), '\s+', ' ', 'g'), ' ') AS t
  FROM {table}
),
sh AS (
  SELECT DISTINCT id, {shingle} AS shingle
  FROM toks, UNNEST(generate_series(1, len(t) - {n - 1})) AS u(i)
  WHERE len(t) >= {n}
),
gdf AS (SELECT shingle, COUNT(*) AS gdf FROM sh GROUP BY shingle),
per_doc AS (
  SELECT sh.id,
         CAST(COUNT(*) AS BIGINT) AS n_grams,
         CAST(SUM(CASE WHEN gdf.gdf = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_novel
  FROM sh JOIN gdf USING (shingle)
  GROUP BY sh.id
)
SELECT d.{id_col},
       COALESCE(p.n_grams, 0) AS n_grams,
       COALESCE(p.n_novel, 0) AS n_novel,
       CAST(CASE WHEN COALESCE(p.n_grams, 0) > 0
            THEN ({int(scale)} * p.n_novel) // p.n_grams END AS BIGINT)
           AS novelty_micro,
       ROUND(CAST(CASE WHEN COALESCE(p.n_grams, 0) > 0
                  THEN ({int(scale)} * p.n_novel) // p.n_grams END AS DOUBLE)
             / {int(scale)}, 6) AS novelty
FROM {table} d LEFT JOIN per_doc p ON p.id = d.{id_col}
""".strip()
