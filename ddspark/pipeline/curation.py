"""Corpus-curation operators for training-data pipelines.

The reference (DataDog/sketches-py) stops at the sketch algebra; a corpus
engine also needs the bread-and-butter curation steps every large-scale
training pipeline runs before and after sketching.  All operators here are
deterministic and carry exact ANSI-SQL twins (DuckDB) so the driver's
correctness gate can replay them bit-for-bit:

* **hash split**       — train/val/test assignment from an md5-derived
                         bucket of the document id: reproducible across
                         runs, engines, and cluster sizes (no ``rand()``,
                         no partition-order dependence).
* **stratified sample**— per-stratum deterministic Bernoulli sampling via
                         the same hash-bucket trick; fractions can differ
                         per stratum (e.g. downsample the dominant
                         language).
* **decontamination**  — flag corpus documents sharing word n-grams with a
                         benchmark/eval set.  The benchmark gram table is
                         tiny by construction, so the join is a broadcast:
                         the 100 TB corpus side never shuffles.
* **repetition stats** — Gopher-style repetition quality signals
                         (duplicate-word fraction, top n-gram coverage);
                         explode + two hash aggregations keyed by the
                         unique document id — skew-free and linear.
* **PII redaction**    — email/IPv4/phone scrubbing with per-document
                         counts, pure regexp_replace column expressions in
                         the Java-regex/RE2 common subset.
* **sequence packing** — concat-then-chunk layout of documents into
                         fixed-capacity context windows over n_buckets
                         parallel deterministic streams.
* **target mixing**    — downsample strata toward a target distribution
                         (feasible-total rule M = min_s(n_s/t_s)); one
                         tiny count job, then a pure hash filter.

Scale notes: the split/sample operators are pure column expressions (one
md5 per row inside whole-stage codegen, no shuffle at all); decontamination
shuffles only the exploded gram table of the *corpus* once (hash partial
agg on (id, gram-hash)); repetition stats shuffle on the unique id, which
cannot skew.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from .dedup import word_shingles, _hash63
from .hashing import portable_hash63, portable_hash63_sql

__all__ = [
    "split_bucket",
    "hash_split",
    "stratified_sample",
    "decontaminate",
    "repetition_stats",
    "redact_pii",
    "pack_sequences",
    "target_mix",
    "exact_k_sample",
    "stratified_exact_k_sample",
    "hash_split_oracle_sql",
    "stratified_sample_oracle_sql",
    "decontaminate_oracle_sql",
    "repetition_stats_oracle_sql",
    "redact_pii_oracle_sql",
    "pack_sequences_oracle_sql",
    "target_mix_oracle_sql",
    "exact_k_sample_oracle_sql",
    "stratified_exact_k_sample_oracle_sql",
    "weighted_sample",
    "weighted_sample_oracle_sql",
    "chunk_documents",
    "chunk_documents_oracle_sql",
    "gopher_quality",
    "gopher_quality_oracle_sql",
    "dsir_select",
    "dsir_select_oracle_sql",
    "c4_clean",
    "c4_clean_oracle_sql",
    "quality_funnel",
    "quality_funnel_oracle_sql",
    "FUNNEL_STAGES",
    "PII_PATTERNS",
    "GOPHER_STOPWORDS",
    "C4_POLICY_PHRASES",
    "target_encode",
    "target_encode_oracle_sql",
]

# bucket resolution: 1e6 buckets keeps split boundaries exact for any
# fraction with <= 6 decimal digits while the hash stays uniform
_BUCKETS = 1_000_000


def split_bucket(id_col: Column | str, salt: str) -> Column:
    """Deterministic bucket in ``[0, 1e6)`` from the id and a salt string.

    md5-derived (portable across engines); changing the salt re-rolls every
    assignment independently, so a pipeline can draw a split and several
    samples from the same ids without correlation.
    """
    key = F.concat(F.col(id_col).cast("string") if isinstance(id_col, str) else id_col.cast("string"),
                   F.lit(":" + salt))
    return portable_hash63(key) % _BUCKETS


def _lit_sql(v) -> str:
    """SQL literal for a stratum value: quote-escaped strings, bare
    numerics — so oracle SQL survives quotes in data values and integer
    strata compare as integers (matching the Spark side's typed ==)."""
    if isinstance(v, bool):
        return "TRUE" if v else "FALSE"
    if isinstance(v, str):
        return "'" + v.replace("'", "''") + "'"
    if isinstance(v, (int, float)):
        return repr(v)
    raise TypeError(f"unsupported stratum literal type: {type(v).__name__}")


def _bucket_sql(id_expr: str, salt: str) -> str:
    return f"{portable_hash63_sql(f'CAST({id_expr} AS VARCHAR) || ' + repr(':' + salt))} % {_BUCKETS}"


def _split_thresholds(weights: dict[str, float]) -> list[tuple[str, int]]:
    total = sum(weights.values())
    if not 0.999999 <= total <= 1.000001:
        raise ValueError(f"split weights must sum to 1, got {total}")
    cum = 0.0
    out = []
    for name, w in weights.items():  # insertion order is the split order
        if w < 0:
            raise ValueError(f"negative split weight for {name!r}")
        cum += w
        out.append((name, round(cum * _BUCKETS)))
    out[-1] = (out[-1][0], _BUCKETS)  # close the last interval exactly
    return out


def hash_split(
    df: DataFrame,
    id_col: str = "doc_id",
    weights: dict[str, float] | None = None,
    salt: str = "split",
    out_col: str = "split",
) -> DataFrame:
    """Add a deterministic ``split`` column (e.g. train/val/test).

    Pure column expression — no shuffle, no state, identical assignment at
    any parallelism, so a 1000-executor run and a laptop run agree on every
    row.  Default weights: 90/5/5.
    """
    weights = weights or {"train": 0.90, "val": 0.05, "test": 0.05}
    b = split_bucket(id_col, salt)
    thresholds = _split_thresholds(weights)
    expr = None
    for name, hi in thresholds:  # lowest threshold first wins, like SQL CASE
        expr = F.when(b < hi, F.lit(name)) if expr is None else expr.when(b < hi, F.lit(name))
    return df.withColumn(out_col, expr)


def hash_split_oracle_sql(
    table: str,
    id_col: str = "doc_id",
    weights: dict[str, float] | None = None,
    salt: str = "split",
) -> str:
    """CASE-expression twin of :func:`hash_split` (select id + split)."""
    weights = weights or {"train": 0.90, "val": 0.05, "test": 0.05}
    thresholds = _split_thresholds(weights)
    whens = " ".join(
        f"WHEN b < {hi} THEN {_lit_sql(name)}" for name, hi in thresholds
    )
    return (
        f"SELECT *, CASE {whens} END AS split FROM "
        f"(SELECT *, {_bucket_sql(id_col, salt)} AS b FROM {table})"
    )


def stratified_sample(
    df: DataFrame,
    fractions: float | dict[str, float],
    strata_col: str | None = None,
    id_col: str = "doc_id",
    salt: str = "sample",
) -> DataFrame:
    """Deterministic Bernoulli sample, optionally with per-stratum rates.

    ``fractions`` is either a scalar rate or ``{stratum_value: rate}`` over
    ``strata_col`` (strata absent from the dict are dropped — rate 0).
    Unlike ``DataFrame.sample`` this is a pure filter on a hash bucket:
    reproducible across runs/engines/cluster sizes and free of the
    partition-order dependence of seeded RNG sampling.
    """
    b = split_bucket(id_col, salt)
    if isinstance(fractions, dict):
        if strata_col is None:
            raise ValueError("per-stratum fractions need strata_col")
        thr = None
        for value, rate in sorted(fractions.items()):
            cond = F.col(strata_col) == value
            lim = F.lit(round(rate * _BUCKETS))
            thr = F.when(cond, lim) if thr is None else thr.when(cond, lim)
        thr = thr.otherwise(F.lit(0))
    else:
        thr = F.lit(round(float(fractions) * _BUCKETS))
    return df.where(b < thr)


def stratified_sample_oracle_sql(
    table: str,
    fractions: float | dict[str, float],
    strata_col: str | None = None,
    id_col: str = "doc_id",
    salt: str = "sample",
) -> str:
    """Filter twin of :func:`stratified_sample` (SELECT * of kept rows)."""
    b = _bucket_sql(id_col, salt)
    if isinstance(fractions, dict):
        whens = " ".join(
            f"WHEN {strata_col} = {_lit_sql(v)} THEN {round(r * _BUCKETS)}"
            for v, r in sorted(fractions.items())
        )
        thr = f"CASE {whens} ELSE 0 END"
    else:
        thr = str(round(float(fractions) * _BUCKETS))
    return f"SELECT * FROM {table} WHERE {b} < {thr}"


def decontaminate(
    df: DataFrame,
    bench: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    bench_text_col: str | None = None,
    n: int = 5,
    min_hits: int = 1,
    portable: bool = False,
) -> DataFrame:
    """Flag corpus documents that share word ``n``-grams with a benchmark.

    Standard eval-set decontamination (the 13-gram-overlap rule of GPT-3 /
    The Pile, here parameterized): any corpus document sharing at least
    ``min_hits`` distinct word n-grams with any benchmark document is
    flagged.  Output: ``(id, bench_hits, contaminated)`` for every corpus
    row — join it back or filter on it.

    **Scale**: the benchmark side is eval sets (thousands of docs), so its
    distinct gram-hash table is KBs-MBs → ``broadcast`` join; the corpus
    side streams through map-side, the only shuffle being the partial-agg
    on the unique ``id``.  Grams travel as 8-byte hashes, never strings.
    ``portable=True`` switches to the md5-derived hash with an exact DuckDB
    twin (:func:`decontaminate_oracle_sql`).
    """
    grams = word_shingles(df, id_col, text_col, n).select(
        "id", _hash63(F.col("shingle"), portable).alias("gh")
    )
    bgrams = (
        word_shingles(bench, id_col, bench_text_col or text_col, n)
        .select(_hash63(F.col("shingle"), portable).alias("gh"))
        .distinct()
    )
    hits = (
        grams.join(F.broadcast(bgrams), "gh")
        .groupBy("id")
        .agg(F.count_distinct("gh").alias("bench_hits"))
    )
    base = df.select(F.col(id_col).alias("id"))
    return (
        base.join(hits, "id", "left")
        .select(
            F.col("id").alias(id_col),
            F.coalesce("bench_hits", F.lit(0)).alias("bench_hits"),
            (F.coalesce("bench_hits", F.lit(0)) >= min_hits).alias("contaminated"),
        )
    )


def decontaminate_oracle_sql(
    corpus_sql: str,
    bench_sql: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 5,
    min_hits: int = 1,
) -> str:
    """Twin of ``decontaminate(..., portable=True)``.  ``corpus_sql`` and
    ``bench_sql`` are table expressions (name or parenthesized subquery)."""
    shingle = " || ' ' || ".join(f"t[i + {j}]" for j in range(n))

    def gram_cte(src: str, alias: str) -> str:
        return rf"""{alias}_t AS (
  SELECT {id_col} AS id,
         string_split(regexp_replace(trim(lower({text_col})), '\s+', ' ', 'g'), ' ') AS t
  FROM {src}
),
{alias} AS (
  SELECT DISTINCT id, {portable_hash63_sql(shingle)} AS gh
  FROM {alias}_t, UNNEST(generate_series(1, len(t) - {n - 1})) AS u(i)
  WHERE len(t) >= {n}
)"""

    return f"""
WITH {gram_cte(corpus_sql, 'cg')},
{gram_cte(bench_sql, 'bg')},
bset AS (SELECT DISTINCT gh FROM bg),
hits AS (
  SELECT cg.id, COUNT(DISTINCT cg.gh) AS bench_hits
  FROM cg JOIN bset USING (gh)
  GROUP BY cg.id
)
SELECT d.{id_col},
       COALESCE(h.bench_hits, 0) AS bench_hits,
       COALESCE(h.bench_hits, 0) >= {min_hits} AS contaminated
FROM {corpus_sql} d
LEFT JOIN hits h ON h.id = d.{id_col}
"""


# PII patterns restricted to the regex subset where Java regex (Spark) and
# RE2 (DuckDB) agree exactly: character classes, bounded repetition, no
# backreferences, no lookaround.  Order matters: emails are redacted before
# the bare-domain-ish IP pattern could eat their host part.
PII_PATTERNS: list[tuple[str, str, str]] = [
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ipv4", r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "<IP>"),
    ("phone", r"\+\d{1,3}[ -]?\d{2,4}[ -]?\d{3,4}[ -]?\d{3,4}", "<PHONE>"),
]


def redact_pii(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    patterns: list[tuple[str, str, str]] | None = None,
) -> DataFrame:
    """C4/RefinedWeb-style PII scrubbing: replace emails, IPv4 addresses,
    and international-format phone numbers with typed placeholder tokens.

    Output: ``(id_col, text, n_email, n_ipv4, n_phone)`` — the per-document
    redaction counts feed quality dashboards and let a pipeline drop
    PII-dense documents entirely.  Pure column expressions (sequential
    ``regexp_replace`` inside whole-stage codegen, zero Python); patterns
    live in the Java-regex/RE2 common subset so the DuckDB twin
    (:func:`redact_pii_oracle_sql`) replays them character-for-character.
    Counts are computed per pattern *before* that pattern's replacement,
    on the output of the previous ones — same order both engines.
    """
    patterns = patterns if patterns is not None else PII_PATTERNS
    t = F.col(text_col)
    counts = []
    for name, pat, repl in patterns:
        # occurrences = how many placeholders this stage inserts
        replaced = F.regexp_replace(t, pat, repl)
        n = (
            (F.length(replaced) - F.length(F.regexp_replace(t, pat, "")))
            / len(repl)
        ).cast("long")
        counts.append(n.alias(f"n_{name}"))
        t = replaced
    return df.select(F.col(id_col), t.alias("text"), *counts)


def redact_pii_oracle_sql(
    table: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    patterns: list[tuple[str, str, str]] | None = None,
    where: str | None = None,
) -> str:
    """Twin of :func:`redact_pii` (DuckDB ``regexp_replace`` with the 'g'
    flag; Spark's replaces all occurrences by default)."""
    patterns = patterns if patterns is not None else PII_PATTERNS
    filt = f"WHERE {where}" if where else ""
    t = text_col
    count_exprs = []
    for name, pat, repl in patterns:
        # DuckDB '' strings are literal (no backslash processing): only
        # quotes need escaping for the regex to arrive intact at RE2
        pat_sql = pat.replace("'", "''")
        replaced = f"regexp_replace({t}, '{pat_sql}', '{repl}', 'g')"
        gone = f"regexp_replace({t}, '{pat_sql}', '', 'g')"
        count_exprs.append(
            f"CAST((length({replaced}) - length({gone})) / {len(repl)} AS BIGINT)"
            f" AS n_{name}"
        )
        t = replaced
    cols = ",\n       ".join(count_exprs)
    return f"""
SELECT {id_col},
       {t} AS text,
       {cols}
FROM {table} {filt}
"""


def repetition_stats(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    ngram: int = 2,
    round_digits: int = 6,
) -> DataFrame:
    """Gopher-style repetition signals per document (Rae et al. 2021 §A1.1):

    * ``dup_word_frac``   — fraction of tokens that are repeats of an
      earlier token: ``(tokens - distinct_tokens) / tokens``.
    * ``top_ngram_frac``  — fraction of all word ``ngram``-grams taken by
      the single most frequent one (boilerplate detector).

    Output: ``(id_col, token_count, dup_word_frac, top_ngram_frac)``.
    Plan shape: explode → partial-agg on ``(id, gram)`` → agg on ``id``;
    both shuffle keys include the unique document id, so group skew is
    impossible and cost is linear in corpus size.
    """
    toks = F.split(
        F.regexp_replace(F.lower(F.trim(F.col(text_col))), r"\s+", " "), " "
    )
    base = df.select(F.col(id_col).alias("id"), toks.alias("t"))
    words = (
        base.select("id", F.explode("t").alias("w"))
        .groupBy("id")
        .agg(
            F.count(F.lit(1)).alias("token_count"),
            F.count_distinct("w").alias("_d"),
        )
        .select(
            "id",
            "token_count",
            F.round(
                (F.col("token_count") - F.col("_d"))
                / F.col("token_count").cast("double"),
                round_digits,
            ).alias("dup_word_frac"),
        )
    )
    from .dedup import grams_from_tokens, word_tokens

    # tokens materialized behind a projection so the gram build is one
    # slice per gram, not a re-tokenization (see grams_from_tokens)
    grams = df.select(
        F.col(id_col).alias("id"),
        word_tokens(F.col(text_col)).alias("_toks"),
    ).select(
        "id",
        F.explode(grams_from_tokens(F.col("_toks"), ngram)).alias("g"),
    )
    top = (
        grams.groupBy("id", "g")
        .agg(F.count(F.lit(1)).alias("c"))
        .groupBy("id")
        .agg(F.max("c").alias("_mx"), F.sum("c").alias("_tot"))
        .select(
            "id",
            F.round(F.col("_mx") / F.col("_tot").cast("double"), round_digits).alias(
                "top_ngram_frac"
            ),
        )
    )
    return (
        words.join(top, "id", "left")
        .select(
            F.col("id").alias(id_col),
            "token_count",
            "dup_word_frac",
            F.coalesce("top_ngram_frac", F.lit(0.0)).alias("top_ngram_frac"),
        )
    )


def repetition_stats_oracle_sql(
    table: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    where: str | None = None,
    ngram: int = 2,
    round_digits: int = 6,
) -> str:
    """Twin of :func:`repetition_stats`."""
    filt = f"WHERE {where}" if where else ""
    gram = " || ' ' || ".join(f"t[i + {j}]" for j in range(ngram))
    return rf"""
WITH toks AS (
  SELECT {id_col} AS id,
         string_split(regexp_replace(trim(lower({text_col})), '\s+', ' ', 'g'), ' ') AS t
  FROM {table} {filt}
),
w AS (
  SELECT id, COUNT(*) AS token_count, COUNT(DISTINCT u.w) AS d
  FROM toks, UNNEST(t) AS u(w)
  GROUP BY id
),
g AS (
  SELECT id, {gram} AS g, COUNT(*) AS c
  FROM toks, UNNEST(generate_series(1, len(t) - {ngram - 1})) AS u(i)
  WHERE len(t) >= {ngram}
  GROUP BY id, {gram}
),
gm AS (
  SELECT id, ROUND(MAX(c) / CAST(SUM(c) AS DOUBLE), {round_digits}) AS top_ngram_frac
  FROM g GROUP BY id
)
SELECT w.id AS {id_col},
       w.token_count,
       ROUND((w.token_count - w.d) / CAST(w.token_count AS DOUBLE), {round_digits})
         AS dup_word_frac,
       COALESCE(gm.top_ngram_frac, 0.0) AS top_ngram_frac
FROM w LEFT JOIN gm USING (id)
"""


def pack_sequences(
    df: DataFrame,
    size_col: str,
    id_col: str = "doc_id",
    max_tokens: int = 2048,
    n_buckets: int = 64,
    salt: str = "pack",
) -> DataFrame:
    """Concat-then-chunk sequence packing: lay documents end-to-end in a
    deterministic order and cut the stream into fixed-capacity packs of
    ``max_tokens`` — the standard pretraining batching step (documents may
    straddle a pack boundary; ``spans`` counts how many packs a document
    touches).

    Output: ``(id_col, bucket, pack_seq, pack_offset, spans)`` — a document
    starts in pack ``(bucket, pack_seq)`` at ``pack_offset``.

    **Scale**: a single global ordering would be one total sort through one
    task.  Instead documents are salted into ``n_buckets`` independent
    streams (deterministic md5 bucket, so the layout is reproducible at any
    parallelism) and each bucket packs via a running sum — ``n_buckets``
    parallel windows, each a partition-local sort.  Waste is at most one
    partial pack per bucket, negligible for corpus >> n_buckets x
    max_tokens.  Size ``n_buckets`` ~ cluster cores x a small factor.
    """
    from pyspark.sql import Window

    b = split_bucket(id_col, salt) % n_buckets
    base = df.select(
        F.col(id_col),
        b.alias("bucket"),
        F.col(size_col).cast("long").alias("_sz"),
    )
    w = (
        Window.partitionBy("bucket")
        .orderBy(id_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    cum = F.coalesce(F.sum("_sz").over(w), F.lit(0))
    pack_seq = F.floor(cum / max_tokens)
    end_pack = F.floor((cum + F.greatest("_sz", F.lit(1)) - 1) / max_tokens)
    return base.select(
        id_col,
        "bucket",
        pack_seq.alias("pack_seq"),
        (cum % max_tokens).alias("pack_offset"),
        (end_pack - pack_seq + 1).cast("int").alias("spans"),
    )


def pack_sequences_oracle_sql(
    table: str,
    size_col: str,
    id_col: str = "doc_id",
    max_tokens: int = 2048,
    n_buckets: int = 64,
    salt: str = "pack",
    where: str | None = None,
) -> str:
    """Twin of :func:`pack_sequences`."""
    filt = f"WHERE {where}" if where else ""
    bucket = f"({_bucket_sql(id_col, salt)}) % {n_buckets}"
    return f"""
WITH base AS (
  SELECT {id_col}, {bucket} AS bucket, CAST({size_col} AS BIGINT) AS sz
  FROM {table} {filt}
),
c AS (
  SELECT {id_col}, bucket, sz,
         COALESCE(SUM(sz) OVER (
           PARTITION BY bucket ORDER BY {id_col}
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
         ), 0) AS cum
  FROM base
)
SELECT {id_col}, bucket,
       CAST(FLOOR(cum / {max_tokens}) AS BIGINT) AS pack_seq,
       CAST(cum % {max_tokens} AS BIGINT) AS pack_offset,
       CAST(FLOOR((cum + GREATEST(sz, 1) - 1) / {max_tokens})
            - FLOOR(cum / {max_tokens}) + 1 AS INT) AS spans
FROM c
"""


def target_mix(
    df: DataFrame,
    target: dict[str, float],
    strata_col: str = "lang",
    id_col: str = "doc_id",
    salt: str = "mix",
) -> DataFrame:
    """Resample the corpus toward a target stratum distribution (domain /
    language mixing): keep the largest subset whose strata proportions
    match ``target`` (shares summing to 1), downsampling only — the
    feasible total is ``M = min_s(n_s / t_s)`` and stratum ``s`` keeps a
    deterministic hash sample at rate ``t_s * M / n_s``.

    Two Spark jobs: one count aggregation (tiny result, collected like
    broadcast centroids) to derive the rates, then the pure-filter
    deterministic sample — the corpus itself never shuffles.  Strata
    missing from ``target`` are dropped; a target stratum missing from the
    data makes the mix infeasible and raises.
    """
    total = sum(target.values())
    if not 0.999999 <= total <= 1.000001:
        raise ValueError(f"target shares must sum to 1, got {total}")
    counts = {
        r["s"]: r["n"]
        for r in df.groupBy(F.col(strata_col).alias("s"))
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    missing = [s for s in target if s not in counts]
    if missing:
        raise ValueError(f"target strata absent from data: {missing}")
    import math

    m = min(counts[s] / t for s, t in target.items() if t > 0)
    # quantize to whole hash buckets with floor: unambiguous in IEEE float64
    # and identical in any engine (Python round is banker's, SQL's is
    # half-away-from-zero — floor sidesteps the disagreement entirely)
    rates = {
        s: math.floor(min(1.0, t * m / counts[s]) * _BUCKETS) / _BUCKETS
        for s, t in target.items()
    }
    return stratified_sample(df, rates, strata_col, id_col, salt)


def target_mix_oracle_sql(
    table: str,
    target: dict[str, float],
    strata_col: str = "lang",
    id_col: str = "doc_id",
    salt: str = "mix",
) -> str:
    """Full twin of :func:`target_mix`: recomputes the feasible total and
    per-stratum rates from exact counts *in SQL* with the same IEEE float64
    operation order (t*m then /n, FLOOR to bucket units), then applies the
    same hash filter."""
    vals = ", ".join(f"({_lit_sql(s)}, {t!r})" for s, t in sorted(target.items()))
    b = _bucket_sql(id_col, salt)
    return f"""
WITH tt(s, t) AS (VALUES {vals}),
cnt AS (
  SELECT {strata_col} AS s, COUNT(*) AS n FROM {table} GROUP BY {strata_col}
),
m AS (
  SELECT MIN(n / t) AS m FROM cnt JOIN tt USING (s) WHERE t > 0
),
thr AS (
  SELECT s, CAST(FLOOR(LEAST(1.0, t * m.m / n) * {_BUCKETS}) AS BIGINT) AS lim
  FROM cnt JOIN tt USING (s), m
)
SELECT d.* FROM {table} d
JOIN thr ON thr.s = d.{strata_col}
WHERE ({b}) < thr.lim
"""


def exact_k_sample(
    df: DataFrame,
    k: int,
    id_col: str = "doc_id",
    salt: str = "ksample",
) -> DataFrame:
    """Exactly ``k`` rows, uniformly at random, deterministically: the
    bottom-``k`` rows by hash bucket (ties by id).  Unlike a Bernoulli
    rate (row count only approximate) or ``DataFrame.sample`` (partition-
    order dependent), this yields the same exact-size sample on any run,
    any engine, any parallelism — Spark executes it as a distributed
    TakeOrdered (per-partition top-k, then a k-row merge on the driver
    side of the final reduce), never a full sort.
    """
    b = split_bucket(id_col, salt)
    return (
        df.withColumn("_b", b)
        .orderBy("_b", id_col)
        .limit(k)
        .drop("_b")
    )


def exact_k_sample_oracle_sql(
    table: str,
    k: int,
    id_col: str = "doc_id",
    salt: str = "ksample",
) -> str:
    """Twin of :func:`exact_k_sample`."""
    b = _bucket_sql(id_col, salt)
    return f"SELECT * EXCLUDE (_b) FROM (SELECT *, {b} AS _b FROM {table}) ORDER BY _b, {id_col} LIMIT {k}"


def stratified_exact_k_sample(
    df: DataFrame,
    k: int,
    strata_col: str = "lang",
    id_col: str = "doc_id",
    salt: str = "ksample",
) -> DataFrame:
    """Exactly ``min(k, n_s)`` rows per stratum, uniformly at random,
    deterministically — the per-stratum quota twin of
    :func:`exact_k_sample` (which is global) and of
    :func:`stratified_sample` (which is rate-based, so per-stratum counts
    are only approximate).

    Each stratum keeps its bottom-``k`` rows by hash bucket (ties by id):
    one shuffle keyed on the stratum and a per-stratum sort inside the
    ``row_number`` window.  **Scale**: the window sorts each stratum's
    full partition, so a mega-stratum (45% of a web corpus in one
    language) pays a large single-partition sort — for those, either
    pre-filter with a bucket threshold from a first counting pass, or use
    rate-based :func:`stratified_sample` when exact quotas aren't
    required.  Fine up to strata of ~10^8 rows.
    """
    from pyspark.sql import Window

    b = split_bucket(id_col, salt)
    w = Window.partitionBy(strata_col).orderBy("_b", id_col)
    return (
        df.withColumn("_b", b)
        .withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") <= k)
        .drop("_b", "_rn")
    )


def stratified_exact_k_sample_oracle_sql(
    table: str,
    k: int,
    strata_col: str = "lang",
    id_col: str = "doc_id",
    salt: str = "ksample",
) -> str:
    """Twin of :func:`stratified_exact_k_sample`."""
    b = _bucket_sql(id_col, salt)
    return f"""
SELECT * EXCLUDE (_b, _rn) FROM (
  SELECT *, {b} AS _b,
         ROW_NUMBER() OVER (PARTITION BY {strata_col} ORDER BY {b}, {id_col}) AS _rn
  FROM {table}
) WHERE _rn <= {k}
"""


# ---------------------------------------------------------------------------
# Gopher document-level quality rules (Rae et al. 2021, arXiv:2112.11446
# Table A1) and C4 line-level cleaning (Raffel et al. 2020, arXiv:1910.10683
# section 2.2).  Both are pure per-row column expressions — zero shuffle, one
# whole-stage-codegen pass over the corpus — and both carry exact ANSI twins.
# ---------------------------------------------------------------------------

# the Gopher stop-word presence list (the filter asks for >= 2 hits)
GOPHER_STOPWORDS = ["and", "be", "have", "of", "that", "the", "to", "with"]


def gopher_quality(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_words: int = 50,
    max_words: int = 100_000,
    min_mean_len: float = 3.0,
    max_mean_len: float = 10.0,
    max_symbol_ratio: float = 0.1,
    max_bullet_frac: float = 0.9,
    max_ellipsis_frac: float = 0.3,
    min_alpha_frac: float = 0.8,
    min_stopword_hits: int = 2,
    round_digits: int = 6,
) -> DataFrame:
    """Gopher-style document quality filter (Rae et al. 2021 Table A1).

    Emits every signal the paper's quality rules read, plus the combined
    ``keep`` verdict, so downstream pipelines can re-threshold without a
    second corpus pass:

    * ``word_count``         — whitespace tokens; rule ``[min_words, max_words]``
    * ``mean_word_len``      — rule ``[min_mean_len, max_mean_len]``
    * ``symbol_word_ratio``  — ``#`` / ``...`` / ``…`` occurrences per word;
      rule ``<= max_symbol_ratio``
    * ``bullet_line_frac``   — lines starting with a bullet; ``<= max_bullet_frac``
    * ``ellipsis_line_frac`` — lines ending in an ellipsis; ``<= max_ellipsis_frac``
    * ``alpha_word_frac``    — words containing a letter; ``>= min_alpha_frac``
    * ``stopword_hits``      — how many of :data:`GOPHER_STOPWORDS` appear;
      rule ``>= min_stopword_hits``

    Scale shape: the token and line arrays are materialized once behind a
    projection (Catalyst does not CSE inside higher-order-function lambdas),
    then every rule is a single lambda pass over the in-memory array — no
    explode, no shuffle, no Python.  At 100 TB this is a map-only stage.
    """
    from .dedup import word_tokens

    t = F.col(text_col)
    base = df.select(
        F.col(id_col).alias("id"),
        t.alias("_txt"),
        F.filter(word_tokens(t), lambda x: x != "").alias("_toks"),
        F.filter(F.split(t, "\n"), lambda L: F.trim(L) != "").alias("_lines"),
    )
    wc = F.size("_toks")
    nl = F.size("_lines")
    sym = (
        F.length("_txt")
        - F.length(F.replace(F.col("_txt"), F.lit("#")))
        + ((F.length("_txt") - F.length(F.replace(F.col("_txt"), F.lit("...")))) / 3).cast("long")
        + F.length("_txt")
        - F.length(F.replace(F.col("_txt"), F.lit("…")))
    )
    sig = base.select(
        "id",
        wc.cast("long").alias("word_count"),
        F.when(
            wc > 0,
            F.round(
                F.aggregate("_toks", F.lit(0).cast("long"), lambda a, x: a + F.length(x))
                / wc.cast("double"),
                round_digits,
            ),
        ).otherwise(F.lit(0.0)).alias("mean_word_len"),
        F.when(wc > 0, F.round(sym / wc.cast("double"), round_digits))
        .otherwise(F.lit(0.0)).alias("symbol_word_ratio"),
        F.when(
            nl > 0,
            F.round(
                F.size(F.filter("_lines", lambda L: F.ltrim(L).rlike(r"^[-*•‣▪]")))
                / nl.cast("double"),
                round_digits,
            ),
        ).otherwise(F.lit(0.0)).alias("bullet_line_frac"),
        F.when(
            nl > 0,
            F.round(
                F.size(F.filter("_lines", lambda L: F.rtrim(L).rlike(r"(\.\.\.|…)$")))
                / nl.cast("double"),
                round_digits,
            ),
        ).otherwise(F.lit(0.0)).alias("ellipsis_line_frac"),
        F.when(
            wc > 0,
            F.round(
                F.size(F.filter("_toks", lambda x: x.rlike(r"\p{L}"))) / wc.cast("double"),
                round_digits,
            ),
        ).otherwise(F.lit(0.0)).alias("alpha_word_frac"),
        sum(
            (F.array_contains("_toks", w).cast("int") for w in GOPHER_STOPWORDS),
            F.lit(0),
        ).alias("stopword_hits"),
    )
    return sig.select(
        F.col("id").alias(id_col),
        "word_count",
        "mean_word_len",
        "symbol_word_ratio",
        "bullet_line_frac",
        "ellipsis_line_frac",
        "alpha_word_frac",
        "stopword_hits",
        (
            F.col("word_count").between(min_words, max_words)
            & F.col("mean_word_len").between(min_mean_len, max_mean_len)
            & (F.col("symbol_word_ratio") <= max_symbol_ratio)
            & (F.col("bullet_line_frac") <= max_bullet_frac)
            & (F.col("ellipsis_line_frac") <= max_ellipsis_frac)
            & (F.col("alpha_word_frac") >= min_alpha_frac)
            & (F.col("stopword_hits") >= min_stopword_hits)
        ).alias("keep"),
    )


def gopher_quality_oracle_sql(
    table: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_words: int = 50,
    max_words: int = 100_000,
    min_mean_len: float = 3.0,
    max_mean_len: float = 10.0,
    max_symbol_ratio: float = 0.1,
    max_bullet_frac: float = 0.9,
    max_ellipsis_frac: float = 0.3,
    min_alpha_frac: float = 0.8,
    min_stopword_hits: int = 2,
    round_digits: int = 6,
    where: str | None = None,
) -> str:
    """Twin of :func:`gopher_quality` (DuckDB lambdas over the same arrays)."""
    filt = f"WHERE {where}" if where else ""
    stops = " + ".join(
        f"CAST(list_contains(toks, '{w}') AS INT)" for w in GOPHER_STOPWORDS
    )
    r = round_digits
    return rf"""
WITH base AS (
  SELECT {id_col} AS id, {text_col} AS txt,
         list_filter(string_split(trim(regexp_replace(lower({text_col}), '\s+', ' ', 'g')), ' '),
                     x -> x != '') AS toks,
         list_filter(string_split({text_col}, chr(10)), L -> trim(L) != '') AS lines
  FROM {table} {filt}
),
sig AS (
  SELECT id,
         len(toks) AS word_count,
         CASE WHEN len(toks) > 0 THEN ROUND(
           CAST(list_aggregate(list_transform(toks, x -> length(x)), 'sum') AS DOUBLE)
             / len(toks), {r}) ELSE 0.0 END AS mean_word_len,
         CASE WHEN len(toks) > 0 THEN ROUND(CAST(
             length(txt) - length(replace(txt, '#', ''))
             + (length(txt) - length(replace(txt, '...', ''))) // 3
             + length(txt) - length(replace(txt, '…', ''))
           AS DOUBLE) / len(toks), {r}) ELSE 0.0 END AS symbol_word_ratio,
         CASE WHEN len(lines) > 0 THEN ROUND(CAST(
             len(list_filter(lines, L -> regexp_matches(ltrim(L), '^[-*•‣▪]')))
           AS DOUBLE) / len(lines), {r}) ELSE 0.0 END AS bullet_line_frac,
         CASE WHEN len(lines) > 0 THEN ROUND(CAST(
             len(list_filter(lines, L -> regexp_matches(rtrim(L), '(\.\.\.|…)$')))
           AS DOUBLE) / len(lines), {r}) ELSE 0.0 END AS ellipsis_line_frac,
         CASE WHEN len(toks) > 0 THEN ROUND(CAST(
             len(list_filter(toks, x -> regexp_matches(x, '[\p{{L}}]')))
           AS DOUBLE) / len(toks), {r}) ELSE 0.0 END AS alpha_word_frac,
         {stops} AS stopword_hits
  FROM base
)
SELECT id AS {id_col}, word_count, mean_word_len, symbol_word_ratio,
       bullet_line_frac, ellipsis_line_frac, alpha_word_frac, stopword_hits,
       (word_count BETWEEN {min_words} AND {max_words}
        AND mean_word_len BETWEEN {min_mean_len} AND {max_mean_len}
        AND symbol_word_ratio <= {max_symbol_ratio}
        AND bullet_line_frac <= {max_bullet_frac}
        AND ellipsis_line_frac <= {max_ellipsis_frac}
        AND alpha_word_frac >= {min_alpha_frac}
        AND stopword_hits >= {min_stopword_hits}) AS keep
FROM sig
"""


# page-level drop phrases and the line-level drop terms from C4
C4_POLICY_PHRASES = ["terms of use", "privacy policy", "cookie policy", "uses cookies"]


def c4_clean(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_words_per_line: int = 5,
    min_kept_lines: int = 3,
) -> DataFrame:
    """C4-style line-level cleaning (Raffel et al. 2020 section 2.2).

    A line survives iff it ends in terminal punctuation (``.!?"`` or a
    closing curly quote) after right-trim, has at least
    ``min_words_per_line`` whitespace words, does not mention
    ``javascript`` (case-insensitive), and contains none of
    :data:`C4_POLICY_PHRASES`.  The page is dropped outright when it
    contains ``lorem ipsum`` or a ``{`` (code page), or keeps fewer than
    ``min_kept_lines`` lines (the paper's three-sentence rule applied at
    line granularity).

    Output: ``(id_col, n_lines, n_kept, lorem_ipsum, has_brace,
    keep_page, clean_text)`` — ``clean_text`` joins the surviving lines
    with ``\n`` so the kept corpus needs no second pass.

    Scale shape: one projection materializes the line array, one lambda
    filter applies all four line rules in a single pass — map-only, no
    shuffle, no Python, fully whole-stage-codegen.
    """
    t = F.col(text_col)

    def line_keep(L: Column) -> Column:
        low = F.lower(L)
        keep = (
            F.rtrim(L).rlike(r'[.!?"”]$')
            & (F.size(F.filter(F.split(F.trim(L), r"\s+"), lambda x: x != ""))
               >= min_words_per_line)
            & ~low.contains("javascript")
        )
        for p in C4_POLICY_PHRASES:
            keep = keep & ~low.contains(p)
        return keep

    base = df.select(
        F.col(id_col).alias("id"),
        t.alias("_txt"),
        F.filter(F.split(t, "\n"), lambda L: F.trim(L) != "").alias("_lines"),
    ).select(
        "id",
        "_txt",
        F.size("_lines").alias("n_lines"),
        F.filter("_lines", line_keep).alias("_kept"),
    )
    return base.select(
        F.col("id").alias(id_col),
        F.col("n_lines").cast("long").alias("n_lines"),
        F.size("_kept").cast("long").alias("n_kept"),
        F.lower("_txt").contains("lorem ipsum").alias("lorem_ipsum"),
        F.col("_txt").contains("{").alias("has_brace"),
        (
            ~F.lower("_txt").contains("lorem ipsum")
            & ~F.col("_txt").contains("{")
            & (F.size("_kept") >= min_kept_lines)
        ).alias("keep_page"),
        F.array_join("_kept", "\n").alias("clean_text"),
    )


def c4_clean_oracle_sql(
    table: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_words_per_line: int = 5,
    min_kept_lines: int = 3,
    where: str | None = None,
) -> str:
    """Twin of :func:`c4_clean`."""
    filt = f"WHERE {where}" if where else ""
    policy = " AND ".join(
        f"NOT contains(lower(L), '{p}')" for p in C4_POLICY_PHRASES
    )
    return rf"""
WITH base AS (
  SELECT {id_col} AS id, {text_col} AS txt,
         list_filter(string_split({text_col}, chr(10)), L -> trim(L) != '') AS lines
  FROM {table} {filt}
),
k AS (
  SELECT id, txt, len(lines) AS n_lines,
         list_filter(lines, L ->
           regexp_matches(rtrim(L), '[.!?"”]$')
           AND len(list_filter(string_split_regex(trim(L), '\s+'), x -> x != ''))
               >= {min_words_per_line}
           AND NOT contains(lower(L), 'javascript')
           AND {policy}) AS kept
  FROM base
)
SELECT id AS {id_col}, n_lines, len(kept) AS n_kept,
       contains(lower(txt), 'lorem ipsum') AS lorem_ipsum,
       contains(txt, '{{') AS has_brace,
       (NOT contains(lower(txt), 'lorem ipsum') AND NOT contains(txt, '{{')
        AND len(kept) >= {min_kept_lines}) AS keep_page,
       array_to_string(kept, chr(10)) AS clean_text
FROM k
"""


FUNNEL_STAGES = ["exact_dup", "lang_id", "gopher", "repetition"]


def quality_funnel(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_dup_word_frac: float = 0.3,
    **gopher_kwargs,
) -> DataFrame:
    """End-to-end curation funnel: run the standard filter chain
    exact-dedup -> language-id -> Gopher quality -> repetition in ONE
    logical pass and report per-stage attrition — the first table a
    100 TB curation run looks at.

    Stages (a document is charged to the FIRST stage that drops it):

    1. ``exact_dup``   — not the first occurrence of the normalized
       fingerprint (:func:`~ddspark.pipeline.textops.fingerprint`);
    2. ``lang_id``     — :func:`~ddspark.pipeline.textops.language_id`
       returns ``'und'``;
    3. ``gopher``      — :func:`gopher_quality` ``keep`` is false
       (``gopher_kwargs`` forwarded);
    4. ``repetition``  — ``dup_word_frac > max_dup_word_frac``
       (:func:`repetition_stats`).

    Output: ``(stage_no INT, stage STRING, entered BIGINT,
    dropped BIGINT)`` — four rows; ``entered - dropped`` of the last row
    is the surviving corpus size.

    Plan shape: three doc-keyed side computations (first-occurrence via a
    fingerprint groupBy, Gopher flags map-only, repetition's explode+agg)
    joined on the unique id, then a single global aggregate emits every
    stage counter at once — no per-stage corpus rescan."""
    from .textops import fingerprint, language_id

    fp = df.select(
        F.col(id_col).alias("id"), fingerprint(F.col(text_col)).alias("_fp")
    )
    first = fp.groupBy("_fp").agg(F.min("id").alias("_keep_id"))
    f1 = fp.join(first, "_fp").select(
        "id", (F.col("id") == F.col("_keep_id")).alias("f1")
    )
    f2 = df.select(
        F.col(id_col).alias("id"),
        (language_id(F.col(text_col)) != "und").alias("f2"),
    )
    f3 = gopher_quality(df, id_col=id_col, text_col=text_col, **gopher_kwargs).select(
        F.col(id_col).alias("id"), F.col("keep").alias("f3")
    )
    f4 = repetition_stats(df, id_col=id_col, text_col=text_col).select(
        F.col(id_col).alias("id"),
        (F.col("dup_word_frac") <= max_dup_word_frac).alias("f4"),
    )
    flags = f1.join(f2, "id").join(f3, "id").join(f4, "id")
    i = lambda c: c.cast("int")  # noqa: E731
    agg = flags.agg(
        F.count(F.lit(1)).alias("e1"),
        F.sum(i(~F.col("f1"))).alias("d1"),
        F.sum(i(F.col("f1"))).alias("e2"),
        F.sum(i(F.col("f1") & ~F.col("f2"))).alias("d2"),
        F.sum(i(F.col("f1") & F.col("f2"))).alias("e3"),
        F.sum(i(F.col("f1") & F.col("f2") & ~F.col("f3"))).alias("d3"),
        F.sum(i(F.col("f1") & F.col("f2") & F.col("f3"))).alias("e4"),
        F.sum(i(F.col("f1") & F.col("f2") & F.col("f3") & ~F.col("f4"))).alias("d4"),
    )
    rows = F.array(
        *[
            F.struct(
                F.lit(j + 1).alias("stage_no"),
                F.lit(name).alias("stage"),
                F.col(f"e{j + 1}").cast("long").alias("entered"),
                F.col(f"d{j + 1}").cast("long").alias("dropped"),
            )
            for j, name in enumerate(FUNNEL_STAGES)
        ]
    )
    return agg.select(F.explode(rows).alias("r")).select("r.*")


def quality_funnel_oracle_sql(
    table: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_dup_word_frac: float = 0.3,
    gopher_sql_kwargs: dict | None = None,
) -> str:
    """Twin of :func:`quality_funnel` (composes the stage twins)."""
    from .textops import language_id_oracle_sql

    g = gopher_quality_oracle_sql(table, id_col, text_col,
                                  **(gopher_sql_kwargs or {}))
    r = repetition_stats_oracle_sql(table, id_col, text_col)
    lid = language_id_oracle_sql(table, id_col, text_col)
    return rf"""
WITH fp AS (
  SELECT {id_col} AS id,
         md5(regexp_replace(lower(trim({text_col})), '\s+', ' ', 'g')) AS f
  FROM {table}
),
f1s AS (
  SELECT id, (id = MIN(id) OVER (PARTITION BY f)) AS f1 FROM fp
),
f2s AS (
  SELECT {id_col} AS id, (pred_lang != 'und') AS f2 FROM ({lid})
),
f3s AS (
  SELECT {id_col} AS id, keep AS f3 FROM ({g})
),
f4s AS (
  SELECT {id_col} AS id, (dup_word_frac <= {max_dup_word_frac}) AS f4 FROM ({r})
),
flags AS (
  SELECT f1, f2, f3, f4
  FROM f1s JOIN f2s USING (id) JOIN f3s USING (id) JOIN f4s USING (id)
),
a AS (
  SELECT COUNT(*) AS e1,
         SUM(CASE WHEN NOT f1 THEN 1 ELSE 0 END) AS d1,
         SUM(CASE WHEN f1 THEN 1 ELSE 0 END) AS e2,
         SUM(CASE WHEN f1 AND NOT f2 THEN 1 ELSE 0 END) AS d2,
         SUM(CASE WHEN f1 AND f2 THEN 1 ELSE 0 END) AS e3,
         SUM(CASE WHEN f1 AND f2 AND NOT f3 THEN 1 ELSE 0 END) AS d3,
         SUM(CASE WHEN f1 AND f2 AND f3 THEN 1 ELSE 0 END) AS e4,
         SUM(CASE WHEN f1 AND f2 AND f3 AND NOT f4 THEN 1 ELSE 0 END) AS d4
  FROM flags
)
SELECT 1 AS stage_no, 'exact_dup' AS stage, CAST(e1 AS BIGINT) AS entered, CAST(d1 AS BIGINT) AS dropped FROM a
UNION ALL SELECT 2, 'lang_id', CAST(e2 AS BIGINT), CAST(d2 AS BIGINT) FROM a
UNION ALL SELECT 3, 'gopher', CAST(e3 AS BIGINT), CAST(d3 AS BIGINT) FROM a
UNION ALL SELECT 4, 'repetition', CAST(e4 AS BIGINT), CAST(d4 AS BIGINT) FROM a
"""


def weighted_sample(
    df: DataFrame,
    k: int,
    weight_col: str,
    id_col: str = "doc_id",
    by: list[str] | None = None,
    seed: int = 42,
) -> DataFrame:
    """Weighted sampling WITHOUT replacement — ``k`` rows (per group),
    inclusion odds proportional to weight (Efraimidis & Spirakis 2006).

    Each row gets a deterministic uniform ``u = (H(id|seed) + 1) /
    (2^60 + 1)`` from the portable hash and races with the exponential
    key ``-ln(u) / w``; the ``k`` smallest keys win.  Because the
    randomness is a pure function of ``(id, seed)``, the sample is
    parallelism-invariant, resumable, and replayable by the SQL oracle —
    the properties a 100 TB curation run needs from its sampler (same
    contract as ``hash_split`` / ``exact_k_sample``).

    Rows with NULL or non-positive weight are excluded (they have zero
    odds).  One window shuffle on ``by``; no driver collects.
    """
    from pyspark.sql import Window

    from .hashing import portable_hash63

    by = list(by or [])
    w = F.col(weight_col).cast("double")
    h = portable_hash63(
        F.concat(F.col(id_col).cast("string"), F.lit(f"|ws{seed}"))
    )
    u = (h.cast("double") + F.lit(1.0)) / F.lit(2**60 + 1).cast("double")
    key = -F.log(u) / w
    win = Window.partitionBy(*by).orderBy(
        F.col("_wkey").asc(), F.col(id_col).asc()
    )
    return (
        df.where(F.col(weight_col).isNotNull() & (w > 0))
        .withColumn("_wkey", key)
        .withColumn("_rk", F.row_number().over(win))
        .where(F.col("_rk") <= k)
        .drop("_wkey")
        .withColumnRenamed("_rk", "sample_rank")
    )


def weighted_sample_oracle_sql(
    table: str,
    k: int,
    weight_col: str,
    id_col: str = "doc_id",
    by: list[str] | None = None,
    seed: int = 42,
    select_cols: str = "*",
) -> str:
    """Twin of :func:`weighted_sample`."""
    from .hashing import portable_hash63_sql

    by = list(by or [])
    part = f"PARTITION BY {', '.join(by)} " if by else ""
    h = portable_hash63_sql(f"CAST({id_col} AS VARCHAR) || '|ws{seed}'")
    outer = "* EXCLUDE (_rk)" if select_cols == "*" else select_cols
    return f"""
WITH keyed AS (
  SELECT {select_cols},
         ROW_NUMBER() OVER ({part}ORDER BY
           -ln((CAST({h} AS DOUBLE) + 1.0) / CAST(1152921504606846977 AS DOUBLE))
             / CAST({weight_col} AS DOUBLE) ASC,
           {id_col} ASC) AS _rk
  FROM {table}
  WHERE {weight_col} IS NOT NULL AND CAST({weight_col} AS DOUBLE) > 0
)
SELECT {outer}, CAST(_rk AS INT) AS sample_rank
FROM keyed WHERE _rk <= {k}
""".strip()


def chunk_documents(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    chunk_tokens: int = 512,
    overlap: int = 64,
) -> DataFrame:
    """Sliding-window document chunking — the standard context-length
    splitting step before tokenization/packing: cut each document's word
    stream into chunks of ``chunk_tokens`` words, consecutive chunks
    sharing ``overlap`` words (stride = chunk_tokens - overlap), the last
    chunk keeping the remainder.  Documents with no tokens produce no
    chunks.

    Output: ``(id_col, chunk_idx, chunk_text, chunk_n_tokens)``.

    **Scale**: map-only — tokenization is materialized ONCE behind a
    projection boundary (the round-5 higher-order-lambda CSE lesson),
    chunk starts come from one ``sequence``/``explode``, each chunk is a
    single ``slice``+``concat_ws``.  No shuffle, no Python; chunk count
    per doc is closed-form integer arithmetic so the SQL twin replays it
    exactly.
    """
    if not 0 <= overlap < chunk_tokens:
        raise ValueError(
            f"need 0 <= overlap < chunk_tokens, got {overlap}/{chunk_tokens}"
        )
    from .dedup import word_tokens

    stride = chunk_tokens - overlap
    base = df.select(
        F.col(id_col),
        F.filter(word_tokens(F.col(text_col)), lambda x: x != "").alias("_toks"),
    )
    n = F.size("_toks")  # -1 for NULL text, handled by the n <= 0 branch
    nc = (
        F.when(n <= 0, F.lit(0))
        .when(n <= chunk_tokens, F.lit(1))
        .otherwise((F.lit(1) + F.floor((n - chunk_tokens + stride - 1) / stride)))
    ).cast("int")
    counted = base.select(id_col, "_toks", n.alias("_n"), nc.alias("_nc"))
    idx = F.when(
        F.col("_nc") > 0, F.sequence(F.lit(0), F.col("_nc") - 1)
    ).otherwise(F.array().cast("array<int>"))
    ex = counted.select(id_col, "_toks", "_n", F.explode(idx).alias("_i"))
    start = F.col("_i") * stride
    return ex.select(
        id_col,
        F.col("_i").cast("long").alias("chunk_idx"),
        F.concat_ws(" ", F.slice("_toks", start + 1, F.lit(chunk_tokens))).alias(
            "chunk_text"
        ),
        F.least(F.lit(chunk_tokens), F.col("_n") - start).cast("long").alias(
            "chunk_n_tokens"
        ),
    )


def chunk_documents_oracle_sql(
    table: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    chunk_tokens: int = 512,
    overlap: int = 64,
) -> str:
    """Twin of :func:`chunk_documents` (same word_tokens twin expression
    as the shingling oracles; DuckDB list slice is 1-based inclusive, so
    ``[s+1 : s+chunk]`` matches Spark ``slice(toks, s+1, chunk)``)."""
    s = chunk_tokens - overlap
    c = chunk_tokens
    return f"""
WITH t AS (
  SELECT {id_col},
         list_filter(
           string_split(regexp_replace(trim(lower({text_col})), '\\s+', ' ', 'g'), ' '),
           x -> x <> '') AS toks
  FROM {table}
),
counted AS (
  SELECT {id_col}, toks, COALESCE(LEN(toks), 0) AS n,
         CASE WHEN COALESCE(LEN(toks), 0) <= 0 THEN 0
              WHEN LEN(toks) <= {c} THEN 1
              ELSE 1 + (LEN(toks) - {c} + {s} - 1) // {s} END AS nc
  FROM t
)
SELECT {id_col},
       CAST(i AS BIGINT) AS chunk_idx,
       array_to_string(toks[i*{s} + 1 : i*{s} + {c}], ' ') AS chunk_text,
       CAST(LEAST({c}, n - i*{s}) AS BIGINT) AS chunk_n_tokens
FROM counted, UNNEST(generate_series(0, nc - 1)) AS u(i)
""".strip()


def target_encode(
    df: DataFrame,
    cat_col: str,
    target_col: str,
    smoothing: int = 20,
    y_scale: int = 1,
    ndigits: int = 6,
) -> DataFrame:
    """Smoothed target (mean) encoding of a categorical column:
    ``(category, n, encoding)`` with
    ``encoding = (sum_y + m·prior) / (n + m)`` where ``prior`` is the
    global mean and ``m = smoothing`` — the empirical-Bayes shrinkage
    that keeps rare categories from memorizing their few labels (the
    standard leakage-safe categorical feature for tabular models).

    Deterministic cross-engine like the correlation family: targets
    scale to exact integers (``y_scale`` = 10^decimals), per-category
    and global sums accumulate as exact DECIMAL integers, and the final
    encoding is one fixed-order double expression
    ``(sy + m·(SY/N)) / (n + m)`` on exact inputs, rounded.  NULL
    targets drop; NULL categories form their own group (they will be a
    real category at inference time too).  One scan: category sums via
    one aggregation, the global prior via a broadcast one-row crossJoin
    of their re-aggregation — no second pass over rows.
    """
    if smoothing < 0:
        raise ValueError(f"smoothing must be >= 0, got {smoothing}")
    yi = F.round(F.col(target_col) * y_scale).cast("decimal(18,0)")
    per_cat = (
        df.where(F.col(target_col).isNotNull())
        .select(F.col(cat_col).alias("category"), yi.alias("_y"))
        .groupBy("category")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("_y").alias("_sy"))
    )
    tot = per_cat.agg(
        F.sum("n").alias("_n_all"),
        F.sum("_sy").cast("decimal(38,0)").alias("_sy_all"),
    )
    prior = F.col("_sy_all").cast("double") / F.col("_n_all").cast("double")
    enc = (
        F.col("_sy").cast("double") + F.lit(float(smoothing)) * prior
    ) / (F.col("n").cast("double") + F.lit(float(smoothing)))
    return (
        per_cat.crossJoin(F.broadcast(tot))
        .select(
            "category",
            "n",
            F.round(enc / y_scale, ndigits).alias("encoding"),
        )
    )


def target_encode_oracle_sql(
    table: str,
    cat_col: str,
    target_col: str,
    smoothing: int = 20,
    y_scale: int = 1,
    ndigits: int = 6,
) -> str:
    """ANSI twin of :func:`target_encode`."""
    return f"""
WITH per_cat AS (
  SELECT {cat_col} AS category,
         COUNT(*) AS n,
         SUM(CAST(ROUND({target_col} * {y_scale}) AS DECIMAL(18,0))) AS sy
  FROM {table}
  WHERE {target_col} IS NOT NULL
  GROUP BY 1
),
tot AS (
  SELECT SUM(n) AS n_all, CAST(SUM(sy) AS DECIMAL(38,0)) AS sy_all FROM per_cat
)
SELECT category, CAST(n AS BIGINT) AS n,
       ROUND(((CAST(sy AS DOUBLE) +
               {float(smoothing)} * (CAST(sy_all AS DOUBLE) / CAST(n_all AS DOUBLE)))
              / (CAST(n AS DOUBLE) + {float(smoothing)})) / {y_scale},
             {ndigits}) AS encoding
FROM per_cat CROSS JOIN tot
""".strip()


def _dsir_features(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """``id | f`` — one row per hashed-n-gram feature OCCURRENCE
    (unigrams + adjacent word bigrams, multiplicity kept), the DSIR
    paper's feature space.  Tokenization is the shared
    :func:`ddspark.pipeline.dedup.word_tokens` rule."""
    from .dedup import word_tokens

    toks = df.select(
        F.col(id_col).alias("id"), word_tokens(F.col(text_col)).alias("t")
    ).where(F.size("t") > 0)
    n = F.size("t")
    uni = toks.select("id", F.explode("t").alias("f")).where(F.col("f") != "")
    pairs = F.arrays_zip(
        F.slice("t", 1, n - 1).alias("w1"),
        F.slice("t", 2, n - 1).alias("w2"),
    )
    bi = (
        toks.where(n >= 2)
        .select("id", F.explode(pairs).alias("p"))
        .select("id", F.concat_ws(" ", "p.w1", "p.w2").alias("f"))
    )
    return uni.unionAll(bi)


def dsir_select(
    corpus: DataFrame,
    target: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    buckets: int = 4096,
    k: int | None = None,
    scale: int = 10**6,
) -> DataFrame:
    """DSIR data selection (Xie et al. 2023, "Data Selection for
    Language Models via Importance Resampling"): score every corpus
    document by how target-like its hashed-n-gram distribution is, and
    flag the top ``k``.  Returns
    ``(id_col, n_feats, logw_micro, selected)`` where ``logw_micro`` is
    the exact BIGINT importance log-weight

    ``sum over doc features of  floor(scale * ln(p_target(b) / p_raw(b)))``

    with bucket ``b = portable_hash63(gram) % buckets`` over unigram +
    bigram word features and Laplace-smoothed bucket models
    ``p(b) = (c(b)+1) / (total+buckets)`` fitted on the target set and
    on the corpus itself.  ``selected`` is the deterministic
    (weight desc, id asc) top-``k`` flag (all false when ``k`` is None).

    **Exactness** — each bucket's log-ratio quantizes to an integer
    micro-nat BEFORE the per-document sum (the shared micro-nat trick),
    so scores are BIGINT sums that replay cross-engine; the smoothed
    ratio is evaluated as one ``ln`` of a double expression written
    identically in both engines.

    **Scale** — the bucket-weight table has at most ``buckets`` rows
    (default 4096) and is BROADCAST to the per-document feature counts:
    the corpus-side work is one explode + one (id, bucket) partial agg +
    one map-side join + one id-keyed agg.  The target set (a benchmark
    or a quality seed corpus) is small by construction.  The top-k flag
    is a windowless global rank over |corpus| score rows — use
    :func:`exact_k_sample` semantics downstream if k approaches corpus
    size.
    """
    if buckets < 2 or scale < 1 or (k is not None and k < 1):
        raise ValueError("buckets >= 2, scale >= 1, k >= 1 required")
    fb_c = _dsir_features(corpus, id_col, text_col).select(
        "id", (portable_hash63(F.col("f")) % buckets).alias("b")
    )
    fb_t = _dsir_features(target, id_col, text_col).select(
        (portable_hash63(F.col("f")) % buckets).alias("b")
    )
    ct = fb_t.groupBy("b").agg(F.count(F.lit(1)).alias("ct"))
    doc_b = fb_c.groupBy("id", "b").agg(F.count(F.lit(1)).alias("c"))
    cr = doc_b.groupBy("b").agg(F.sum("c").alias("cr"))
    tots = cr.agg(F.sum("cr").alias("tr")).crossJoin(
        F.broadcast(ct.agg(F.coalesce(F.sum("ct"), F.lit(0)).alias("tt")))
    )
    w = (
        cr.join(ct, "b", "left")
        .crossJoin(F.broadcast(tots))
        .select(
            "b",
            F.floor(
                F.lit(scale)
                * F.log(
                    (
                        (F.coalesce(F.col("ct"), F.lit(0)) + F.lit(1)).cast("double")
                        * (F.col("tr") + F.lit(buckets)).cast("double")
                    )
                    / (
                        (F.col("cr") + F.lit(1)).cast("double")
                        * (F.col("tt") + F.lit(buckets)).cast("double")
                    )
                )
            )
            .cast("long")
            .alias("w"),
        )
    )
    scored = (
        doc_b.join(F.broadcast(w), "b")
        .groupBy("id")
        .agg(
            F.sum("c").alias("n_feats"),
            F.sum(F.col("c") * F.col("w")).alias("logw_micro"),
        )
    )
    if k is None:
        out = scored.withColumn("selected", F.lit(False))
    else:
        from pyspark.sql import Window

        rk = F.row_number().over(
            Window.orderBy(F.desc("logw_micro"), F.col("id"))
        )
        out = scored.withColumn("selected", rk <= k)
    return out.select(
        F.col("id").alias(id_col), "n_feats", "logw_micro", "selected"
    )


def dsir_select_oracle_sql(
    corpus_sql: str,
    target_sql: str,
    id_col: str = "doc_id",
    buckets: int = 4096,
    k: int | None = None,
    scale: int = 10**6,
) -> str:
    """ANSI twin of :func:`dsir_select` over corpus/target subqueries
    with columns ``(id, text)`` — same tokenization, same hash-bucket
    features, same micro-nat quantization, same tie-break."""
    h = portable_hash63_sql("f")
    feats = rf"""
  SELECT id, t[i] AS f
  FROM {{src}}_toks, UNNEST(generate_series(1, len(t))) AS u(i)
  WHERE t[i] <> ''
  UNION ALL
  SELECT id, t[i] || ' ' || t[i+1] AS f
  FROM {{src}}_toks, UNNEST(generate_series(1, len(t) - 1)) AS u(i)
  WHERE len(t) >= 2"""
    sel = (
        f"rank <= {k}" if k is not None else "FALSE"
    )
    return rf"""
WITH corpus_toks AS (
  SELECT id, string_split(regexp_replace(trim(lower(text)), '\s+', ' ', 'g'), ' ') AS t
  FROM ({corpus_sql}) WHERE text IS NOT NULL
),
target_toks AS (
  SELECT id, string_split(regexp_replace(trim(lower(text)), '\s+', ' ', 'g'), ' ') AS t
  FROM ({target_sql}) WHERE text IS NOT NULL
),
corpus_f AS ({feats.format(src="corpus")}),
target_f AS ({feats.format(src="target")}),
doc_b AS (
  SELECT id, ({h}) % {buckets} AS b, COUNT(*) AS c
  FROM corpus_f GROUP BY 1, 2
),
cr AS (SELECT b, CAST(SUM(c) AS BIGINT) AS cr FROM doc_b GROUP BY b),
ct AS (
  SELECT ({h}) % {buckets} AS b, COUNT(*) AS ct FROM target_f GROUP BY 1
),
tots AS (
  SELECT (SELECT SUM(cr) FROM cr) AS tr,
         (SELECT COALESCE(SUM(ct), 0) FROM ct) AS tt
),
w AS (
  SELECT cr.b,
         CAST(FLOOR({scale} * LN(
             (CAST(COALESCE(ct.ct, 0) + 1 AS DOUBLE)
              * CAST(tots.tr + {buckets} AS DOUBLE))
             / (CAST(cr.cr + 1 AS DOUBLE)
                * CAST(tots.tt + {buckets} AS DOUBLE))
         )) AS BIGINT) AS w
  FROM cr LEFT JOIN ct ON cr.b = ct.b CROSS JOIN tots
),
scored AS (
  SELECT doc_b.id,
         CAST(SUM(doc_b.c) AS BIGINT) AS n_feats,
         CAST(SUM(doc_b.c * w.w) AS BIGINT) AS logw_micro
  FROM doc_b JOIN w ON doc_b.b = w.b
  GROUP BY 1
),
ranked AS (
  SELECT *, ROW_NUMBER() OVER (ORDER BY logw_micro DESC, id) AS rank
  FROM scored
)
SELECT id AS {id_col}, n_feats, logw_micro, {sel} AS selected
FROM ranked
""".strip()
