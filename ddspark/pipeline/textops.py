"""Text analysis operators — all pure ``pyspark.sql.functions`` column
expressions (JVM-side, whole-stage codegen; no Python in the hot path), so
they run at scan speed over a 100 TB corpus and every one has an exact ANSI
SQL twin for oracle checking.

* token counting       — whitespace tokenization + a BPE-ish subword count
* quality scoring      — length / punctuation / digit / whitespace ratios
* language ID          — stopword-marker heuristic over a fixed marker table
* document fingerprint — md5 of the normalized text (exact-dup key) and a
                         crc32-based rolling bucket
* winnowing            — k-gram window-min fingerprints (MOSS), substring-
                         level near-dup detection with an ANSI-SQL twin
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, functions as F

__all__ = [
    "sentence_stats",
    "sentence_stats_oracle_sql",
    "readability_scores",
    "readability_scores_oracle_sql",
    "vocab_jsd",
    "vocab_jsd_oracle_sql",
    "token_count",
    "subword_count",
    "punct_ratio",
    "digit_ratio",
    "stopword_ratio",
    "rake_keywords",
    "rake_keywords_oracle_sql",
    "quality_score",
    "language_id",
    "language_id_oracle_sql",
    "hashed_bow_score",
    "hashed_bow_score_oracle_sql",
    "tfidf_top_terms",
    "tfidf_top_terms_oracle_sql",
    "collocations_pmi",
    "collocations_pmi_oracle_sql",
    "fingerprint",
    "winnow_fingerprints",
    "winnow_neardup_pairs",
    "drop_boilerplate_lines",
    "drop_boilerplate_lines_oracle_sql",
    "with_text_stats",
    "compression_ratio",
    "LANG_MARKERS",
]


def token_count(text: Column) -> Column:
    """Whitespace tokens; empty/blank text counts 0."""
    t = F.trim(text)
    return F.when(t == "", F.lit(0)).otherwise(F.size(F.split(t, r"\s+")))


def subword_count(text: Column) -> Column:
    """BPE-ish proxy: alphanumeric runs + standalone punctuation marks each
    count as one subword (a cheap, deterministic token estimate)."""
    runs = F.size(F.filter(F.split(text, r"[^0-9A-Za-z]+"), lambda x: x != ""))
    punct = F.length(F.regexp_replace(text, r"[0-9A-Za-z\s]+", ""))
    return runs + punct


def punct_ratio(text: Column) -> Column:
    n = F.length(text)
    p = F.length(F.regexp_replace(text, r"[^.,;:!?'\"()\[\]{}-]+", ""))
    return F.when(n == 0, F.lit(0.0)).otherwise(p.cast("double") / n)


def digit_ratio(text: Column) -> Column:
    n = F.length(text)
    d = F.length(F.regexp_replace(text, r"[^0-9]+", ""))
    return F.when(n == 0, F.lit(0.0)).otherwise(d.cast("double") / n)


# compact per-language stopword markers (matched as whole words)
LANG_MARKERS: dict[str, list[str]] = {
    "en": ["the", "and", "of", "is", "a"],
    "de": ["der", "die", "und", "ist", "das"],
    "fr": ["le", "la", "et", "est", "les"],
    "es": ["el", "la", "y", "es", "los"],
    "zh": ["的", "是", "了", "在", "和"],
}


def _marker_hits(text: Column, words: list[str]) -> Column:
    # double the whitespace so ' w ' occurrences never overlap on a shared
    # space ('the the' must count 2, not 1, under non-overlapping replace)
    padded = F.concat(
        F.lit(" "),
        F.regexp_replace(F.lower(text), r"\s+", "  "),
        F.lit(" "),
    )
    total = F.lit(0)
    for w in words:
        # occurrences of " w " via length difference
        hit = (
            F.length(padded)
            - F.length(F.replace(padded, F.lit(f" {w} "), F.lit("")))
        ) / (len(w) + 2)
        total = total + hit.cast("int")
    return total


def stopword_ratio(text: Column, lang_hint: str = "en") -> Column:
    hits = _marker_hits(text, LANG_MARKERS[lang_hint])
    toks = token_count(text)
    return F.when(toks == 0, F.lit(0.0)).otherwise(hits.cast("double") / toks)


def language_id(text: Column) -> Column:
    """Argmax over marker-hit counts; deterministic tie-break by language
    code order. 'und' (undetermined) when nothing matches."""
    scores = [(lang, _marker_hits(text, ws)) for lang, ws in sorted(LANG_MARKERS.items())]
    best_score = F.greatest(*[s for _, s in scores])
    out = F.lit("und")
    for lang, s in reversed(scores):
        out = F.when((best_score > 0) & (s == best_score), F.lit(lang)).otherwise(out)
    return out


def quality_score(text: Column) -> Column:
    """Deterministic [0,1] quality heuristic: favors mid-length documents with
    normal punctuation/digit balance.  The exact formula is arbitrary but
    fixed — its job is to be reproducible and cheap."""
    n = F.length(text)
    len_score = F.least(n.cast("double") / 500.0, F.lit(1.0))
    punct_pen = F.least(punct_ratio(text) * 4.0, F.lit(1.0))
    digit_pen = F.least(digit_ratio(text) * 4.0, F.lit(1.0))
    blank_pen = F.when(token_count(text) == 0, F.lit(1.0)).otherwise(F.lit(0.0))
    score = len_score * (1.0 - 0.5 * punct_pen) * (1.0 - 0.5 * digit_pen) * (
        1.0 - blank_pen
    )
    return F.round(score, 6)


def fingerprint(text: Column) -> Column:
    """Normalized-content fingerprint: md5 over lowercased,
    whitespace-collapsed text — the exact-dedup key."""
    norm = F.regexp_replace(F.lower(F.trim(text)), r"\s+", " ")
    return F.md5(norm)


def winnow_fingerprints(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 8,
    w: int = 4,
    portable: bool = False,
    segment_chars: int | None = 1 << 14,
) -> DataFrame:
    """Winnowing document fingerprints (Schleimer, Wilkerson, Aiken —
    SIGMOD 2003, the MOSS algorithm): hash every ``k``-char gram of the
    normalized text, keep the minimum hash of each window of ``w``
    consecutive grams.  Guarantee: any substring match of length at least
    ``k + w - 1`` between two documents produces at least one shared
    fingerprint.  Output: distinct ``(id, fp)``.

    The classical serial implementation uses a Rabin *rolling* hash to
    update the gram hash in O(1) per character; in a columnar engine each
    gram is hashed independently (one JVM expression over an exploded gram
    table — same fingerprints, embarrassingly parallel).  ``portable``
    uses the md5-derived hash so the whole operator is replayable in ANSI
    SQL; the window min is a plain ``ROWS BETWEEN`` frame in both engines.

    **Scale**: a naive ``PARTITION BY id`` window puts an entire document in
    one task — a 1 GB document would serialize through one core.
    ``segment_chars`` bounds window partitions *exactly*: grams are routed
    to segment ``(p-1) div B`` and (when a window from the previous segment
    reaches them) also ``(p-w) div B`` — each gram lands in at most two
    segments, every window min is computed over its full w grams, and a
    window start is emitted only by its owning segment, so the result is
    bit-identical to the global window (the driver query proves this by
    replaying against a global-window oracle with ``segment_chars=64``).
    ``None`` disables segmentation.
    """
    from .dedup import _hash63

    norm = F.regexp_replace(F.lower(F.trim(F.col(text_col))), r"\s+", " ")
    base = df.select(F.col(id_col).alias("id"), norm.alias("_t")).where(
        F.length("_t") >= k
    )
    grams = base.select(
        "id",
        (F.length("_t") - F.lit(k - 1)).alias("_ng"),
        F.explode(F.sequence(F.lit(1), F.length("_t") - F.lit(k - 1))).alias("_p"),
        "_t",
    ).select(
        "id", "_ng", "_p",
        _hash63(F.expr(f"substring(_t, _p, {k})"), portable).alias("_h"),
    )
    start_ok = F.col("_p") <= F.col("_ng") - F.lit(w - 1)
    if segment_chars is None:
        win = Window.partitionBy("id").orderBy("_p").rowsBetween(0, w - 1)
        fps = grams.withColumn("fp", F.min("_h").over(win)).where(start_ok)
    else:
        B = max(int(segment_chars), w)  # floor((q-1)/B) - floor((q-w)/B) <= 1
        own = F.floor((F.col("_p") - F.lit(1)) / F.lit(B))
        prev = F.floor((F.col("_p") - F.lit(w)) / F.lit(B))
        segs = F.array_distinct(F.array(own, prev))
        seg_grams = grams.select(
            "id", "_ng", "_p", "_h", F.explode(segs).alias("_seg")
        ).where(F.col("_seg") >= 0)
        win = Window.partitionBy("id", "_seg").orderBy("_p").rowsBetween(0, w - 1)
        fps = (
            seg_grams.withColumn("fp", F.min("_h").over(win))
            .where(start_ok & (own == F.col("_seg")))
        )
    return fps.select("id", "fp").distinct()


def winnow_neardup_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 8,
    w: int = 4,
    min_shared: int = 3,
    portable: bool = False,
    df_cap: int | None = None,
    segment_chars: int | None = 1 << 14,
) -> DataFrame:
    """Document pairs sharing at least ``min_shared`` winnowed fingerprints
    — substring-level near-dup/plagiarism detection.  ``df_cap`` drops
    fingerprints present in more than that many documents before the
    self-join (same hot-key guard as ``dedup.jaccard_pairs``)."""
    fps = winnow_fingerprints(df, id_col, text_col, k, w, portable, segment_chars)
    if df_cap is not None:
        hot = (
            fps.groupBy("fp")
            .agg(F.count(F.lit(1)).alias("_df"))
            .where(F.col("_df") > df_cap)
            .select("fp")
        )
        fps = fps.join(hot, "fp", "left_anti")
    a = fps.alias("a")
    b = fps.alias("b")
    return (
        a.join(b, (F.col("a.fp") == F.col("b.fp")) & (F.col("a.id") < F.col("b.id")))
        .groupBy(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .agg(F.count(F.lit(1)).alias("shared_fps"))
        .where(F.col("shared_fps") >= min_shared)
    )


def drop_boilerplate_lines(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    sep: str = "\n",
    max_doc_freq: int = 10,
    min_chars: int = 1,
) -> DataFrame:
    """Corpus-level boilerplate removal (the CCNet line-dedup step): drop
    every line that occurs in more than ``max_doc_freq`` *distinct*
    documents (navigation chrome, cookie banners, license headers), keep
    the rest in original order.  Output: ``(id_col, text)`` with the
    cleaned text; documents whose lines are all boilerplate keep an empty
    string.  Lines shorter than ``min_chars`` are never dropped (blank
    separators carry no dedup signal).

    **Scale**: lines travel as 64-bit ``xxhash64`` keys.  The line
    document-frequency aggregation is a hash partial-agg (map-side combine
    soaks up within-partition repeats of a hot line); the boilerplate set
    (lines with df > cap) is tiny by definition of "boilerplate", so the
    removal join back to the exploded lines broadcasts it.  Reassembly
    groups on the unique ``id``, which cannot skew.
    """
    import re

    lines = df.select(
        F.col(id_col).alias("id"),
        # literal separator (escaped): Spark split() is regex-based
        F.posexplode(F.split(F.col(text_col), re.escape(sep))).alias("pos", "line"),
    ).withColumn("lh", F.xxhash64("line"))
    hot = (
        lines.where(F.length("line") >= min_chars)
        .groupBy("lh")
        .agg(F.count_distinct("id").alias("_df"))
        .where(F.col("_df") > max_doc_freq)
        .select("lh")
    )
    kept = lines.join(F.broadcast(hot), "lh", "left_anti")
    rebuilt = kept.groupBy("id").agg(
        F.concat_ws(
            sep,
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "line"))),
                lambda s: s["line"],
            ),
        ).alias("text")
    )
    base = df.select(F.col(id_col).alias("id"))
    return base.join(rebuilt, "id", "left").select(
        F.col("id").alias(id_col), F.coalesce("text", F.lit("")).alias("text")
    )


def drop_boilerplate_lines_oracle_sql(
    table: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    sep: str = "\n",
    max_doc_freq: int = 10,
    min_chars: int = 1,
    where: str | None = None,
) -> str:
    """ANSI twin of :func:`drop_boilerplate_lines` (joins on the raw line
    text — equivalent because xxhash64 is collision-free on these corpora
    sizes only in expectation; the *oracle* uses exact strings, so a hash
    collision in the Spark path would surface as a mismatch, which is the
    point of an independent replay)."""
    filt = f"WHERE {where}" if where else ""
    sep_lit = sep.replace("'", "''")
    return f"""
WITH src AS (
  SELECT {id_col} AS id, {text_col} AS txt FROM {table} {filt}
),
t0 AS (
  SELECT id, string_split(txt, '{sep_lit}') AS t FROM src
),
ln AS (
  SELECT id, u.i AS pos, t[u.i] AS line
  FROM t0, UNNEST(generate_series(1, len(t))) AS u(i)
),
hot AS (
  SELECT line FROM ln
  WHERE length(line) >= {min_chars}
  GROUP BY line
  HAVING COUNT(DISTINCT id) > {max_doc_freq}
),
kept AS (
  SELECT id, pos, line FROM ln
  WHERE line NOT IN (SELECT line FROM hot)
),
built AS (
  SELECT id, string_agg(line, '{sep_lit}' ORDER BY pos) AS text
  FROM kept GROUP BY id
)
SELECT s.id AS {id_col}, COALESCE(b.text, '') AS text
FROM src s LEFT JOIN built b ON b.id = s.id
"""


def with_text_stats(df: DataFrame, text_col: str = "text") -> DataFrame:
    t = F.col(text_col)
    return (
        df.withColumn("n_chars_exact", F.length(t))
        .withColumn("token_count", token_count(t))
        .withColumn("subword_count", subword_count(t))
        .withColumn("punct_ratio", F.round(punct_ratio(t), 6))
        .withColumn("digit_ratio", F.round(digit_ratio(t), 6))
        .withColumn("quality", quality_score(t))
        .withColumn("lang_id", language_id(t))
        .withColumn("fingerprint", fingerprint(t))
    )


def compression_ratio(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    level: int = 6,
) -> DataFrame:
    """Deflate compression ratio per document — the classic cheap quality /
    repetition signal (boilerplate and degenerate repetition compress far
    below ~2.5x; high-entropy garbage barely compresses at all; natural
    prose sits in between).  Output: ``(id, raw_bytes, zlib_bytes, ratio)``
    with ``ratio = raw/zlib`` (0.0 for empty docs).

    Runs as an Arrow-batched ``mapInPandas`` stage (zlib is C-speed; only
    ``(id, text)`` crosses the boundary).  This is the one text operator
    with NO ANSI-SQL twin — SQL has no deflate — so it is deliberately kept
    out of the driver's oracle gate and verified by pytest invariants
    (determinism, ordering of repetitive vs random text, exact
    ``len(zlib.compress(utf8, level))`` agreement).
    """
    import zlib

    from pyspark.sql.types import (
        DoubleType,
        LongType,
        StructField,
        StructType,
    )

    schema = StructType(
        [
            StructField(id_col, LongType()),
            StructField("raw_bytes", LongType()),
            StructField("zlib_bytes", LongType()),
            StructField("ratio", DoubleType()),
        ]
    )

    def gen(batches):
        import pandas as pd

        for pdf in batches:
            recs = []
            for rid, t in zip(pdf[id_col], pdf[text_col]):
                raw = (t or "").encode("utf-8")
                z = len(zlib.compress(raw, level)) if raw else 0
                recs.append(
                    (rid, len(raw), z, (len(raw) / z) if z else 0.0)
                )
            yield pd.DataFrame(
                recs, columns=[f.name for f in schema.fields]
            )

    return df.select(id_col, text_col).mapInPandas(gen, schema)


def language_id_oracle_sql(
    table: str, id_col: str = "doc_id", text_col: str = "text"
) -> str:
    """Per-document ANSI twin of :func:`language_id`:
    ``SELECT (id_col, pred_lang)`` — marker-hit argmax with the same
    double-spaced padding trick and deterministic tie-break."""
    hit_exprs = {}
    for lang, words in sorted(LANG_MARKERS.items()):
        parts = [
            f"CAST((length(p) - length(replace(p, ' {w} ', ''))) / {len(w) + 2} AS INT)"
            for w in words
        ]
        hit_exprs[lang] = " + ".join(parts)
    hits_sel = ",\n         ".join(
        f"{e} AS h_{lang}" for lang, e in hit_exprs.items()
    )
    langs = sorted(LANG_MARKERS)
    best = "GREATEST(" + ", ".join(f"h_{lang}" for lang in langs) + ")"
    case = "CASE WHEN " + best + " = 0 THEN 'und' "
    for lang in langs:
        case += f"WHEN h_{lang} = {best} THEN '{lang}' "
    case += "END"
    return rf"""
WITH lid_padded AS (
  SELECT {id_col} AS id,
         ' ' || regexp_replace(lower({text_col}), '\s+', '  ', 'g') || ' ' AS p
  FROM {table}
),
lid_hits AS (
  SELECT id, {hits_sel} FROM lid_padded
)
SELECT id AS {id_col}, {case} AS pred_lang FROM lid_hits
"""


def hashed_bow_score(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    dim: int = 4096,
    salt: str = "bow",
) -> DataFrame:
    """Hashed bag-of-words linear scorer — the Spark-side plumbing of a
    fastText/CCNet-style model-based quality filter: each token hashes
    into one of ``dim`` weight buckets, the per-token weights sum, and a
    logistic squash yields a [0, 1] score.

    The WEIGHT TABLE is a deterministic closed form in INTEGER
    milli-units (``w[b] = (b * 2654435761) % 2000 - 1000``, Knuth
    multiplicative hashing spread over [-1000, 1000)) standing in for
    trained parameters — swap the weight expression for a broadcast
    weight array to deploy a real model; the hashing, aggregation, and
    plan shape are exactly what the trained version runs.  Integer
    weights make the sum EXACT under any summation order, so the ANSI
    twin agrees bit-for-bit (a float weight sum would differ in the last
    ulp between engines, which can flip a rounded 6th decimal).

    Output: ``(id, token_count, raw_milli BIGINT, score_e6 BIGINT)``
    where ``raw_milli`` is the weight sum in milli-units and ``score_e6``
    is ``floor(1e6 * sigmoid(raw_milli / 1000))``.  Map-only: tokens
    materialize behind a projection, one lambda pass aggregates the
    weights — no explode, no shuffle, no Python."""
    from .dedup import word_tokens
    from .hashing import portable_hash63

    base = df.select(
        F.col(id_col).alias("id"),
        F.filter(word_tokens(F.col(text_col)), lambda x: x != "").alias("_toks"),
    )

    def weight(t):
        bucket = F.pmod(
            portable_hash63(F.concat(t, F.lit(":" + salt))), F.lit(dim)
        )
        return F.pmod(bucket * 2654435761, F.lit(2000)) - 1000

    raw = F.aggregate(
        "_toks", F.lit(0).cast("long"), lambda acc, t: acc + weight(t)
    )
    out = base.select(
        F.col("id").alias(id_col),
        F.size("_toks").cast("long").alias("token_count"),
        raw.alias("raw_milli"),
    )
    sig = F.lit(1.0) / (F.lit(1.0) + F.exp(-F.col("raw_milli").cast("double") / 1000.0))
    return out.select(
        id_col,
        "token_count",
        "raw_milli",
        F.floor(sig * 1e6).cast("long").alias("score_e6"),
    )


def hashed_bow_score_oracle_sql(
    table: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    dim: int = 4096,
    salt: str = "bow",
    where: str | None = None,
) -> str:
    """Twin of :func:`hashed_bow_score`."""
    from .hashing import portable_hash63_sql

    filt = f"WHERE {where}" if where else ""
    h = portable_hash63_sql(f"(u.t || ':{salt}')")
    return rf"""
WITH toks AS (
  SELECT {id_col} AS id,
         list_filter(string_split(trim(regexp_replace(lower({text_col}), '\s+', ' ', 'g')), ' '),
                     x -> x != '') AS t
  FROM {table} {filt}
),
tw AS (
  SELECT id, (({h} % {dim}) * 2654435761) % 2000 - 1000 AS w
  FROM toks, UNNEST(t) AS u(t)
),
agg AS (
  SELECT t.id, len(t.t) AS token_count, COALESCE(CAST(SUM(tw.w) AS BIGINT), 0) AS raw
  FROM toks t LEFT JOIN tw ON t.id = tw.id
  GROUP BY t.id, len(t.t)
)
SELECT id AS {id_col}, CAST(token_count AS BIGINT) AS token_count,
       raw AS raw_milli,
       CAST(FLOOR((1.0 / (1.0 + exp(-CAST(raw AS DOUBLE) / 1000.0))) * 1e6) AS BIGINT)
         AS score_e6
FROM agg
"""


def tfidf_top_terms(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 5,
) -> DataFrame:
    """Top-``k`` most distinctive terms per document by TF-IDF:
    ``doc_id | rank | term | tf | score_micro``.

    The classic keyword-extraction / topic-labelling signal.  IDF is
    quantized to integer micro-nats (``idf_micro = floor(1e6 * ln(N /
    df_t))``, integer inputs, one correctly-rounded division) and the
    score is the exact BIGINT ``tf * idf_micro``, so ranking — with the
    deterministic ``(score DESC, term ASC)`` tie-break — is bit-identical
    cross-engine and the gate hashes values, not approximations.

    Plan shape at scale: one explode, a term-keyed aggregation for
    document frequencies (bounded by vocabulary size), a term-keyed join
    to attach IDF, and one window shuffle partitioned by document.  N
    (corpus size) travels as a broadcast one-row crossJoin, not a driver
    collect.
    """
    from pyspark.sql import Window

    from .dedup import word_tokens

    toks = df.select(
        F.col(id_col).alias("id"), word_tokens(F.col(text_col)).alias("t")
    )
    terms = toks.select(
        "id", F.explode(F.filter("t", lambda x: x != "")).alias("term")
    )
    tf = terms.groupBy("id", "term").agg(F.count(F.lit(1)).alias("tf"))
    n_docs = df.agg(F.count(F.lit(1)).alias("_n"))
    dft = tf.groupBy("term").agg(F.count(F.lit(1)).alias("_df"))
    idf = dft.crossJoin(F.broadcast(n_docs)).select(
        "term",
        F.floor(
            F.lit(1e6)
            * F.log(F.col("_n").cast("double") / F.col("_df").cast("double"))
        )
        .cast("long")
        .alias("idf_micro"),
    )
    scored = tf.join(idf, "term").select(
        "id", "term", "tf", (F.col("tf") * F.col("idf_micro")).alias("score_micro")
    )
    w = Window.partitionBy("id").orderBy(
        F.col("score_micro").desc(), F.col("term").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select(
            F.col("id").alias(id_col),
            "rank",
            "term",
            "tf",
            "score_micro",
        )
    )


def tfidf_top_terms_oracle_sql(
    table: str = "documents",
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 5,
) -> str:
    """Twin of :func:`tfidf_top_terms`."""
    return rf"""
WITH toks AS (
  SELECT {id_col} AS id,
         list_filter(string_split(regexp_replace(trim(lower({text_col})), '\s+', ' ', 'g'), ' '),
                     x -> x != '') AS t
  FROM {table}
),
terms AS (SELECT id, u.term FROM toks, UNNEST(t) AS u(term)),
tf AS (SELECT id, term, COUNT(*) AS tf FROM terms GROUP BY 1, 2),
nd AS (SELECT COUNT(*) AS n FROM {table}),
idf AS (
  SELECT term,
         CAST(FLOOR(1e6 * ln(CAST(nd.n AS DOUBLE) / CAST(COUNT(*) AS DOUBLE))) AS BIGINT)
           AS idf_micro
  FROM tf CROSS JOIN nd GROUP BY term, nd.n
),
scored AS (
  SELECT tf.id, tf.term, tf.tf,
         CAST(tf.tf * idf.idf_micro AS BIGINT) AS score_micro,
         ROW_NUMBER() OVER (PARTITION BY tf.id
                            ORDER BY tf.tf * idf.idf_micro DESC, tf.term ASC) AS rank
  FROM tf JOIN idf USING (term)
)
SELECT id AS {id_col}, CAST(rank AS INT) AS rank, term,
       CAST(tf AS BIGINT) AS tf, score_micro
FROM scored WHERE rank <= {k}
""".strip()


def collocations_pmi(
    df: DataFrame,
    text_col: str = "text",
    k: int = 20,
    min_count: int = 5,
) -> DataFrame:
    """Corpus collocations: top-``k`` adjacent word pairs by pointwise
    mutual information — ``(rank, w1, w2, pair_count, pmi_micro)``.

    PMI = ln(T·c(w1 w2) / (c(w1)·c(w2))) over corpus-wide bigram/unigram
    occurrence counts (T = total bigram positions), quantized to integer
    micro-nats (``floor(1e6·ln(...))``, exact-integer argument via one
    correctly-rounded division) so ranking — tie-broken by
    ``(pmi_micro DESC, w1, w2)`` — hashes identically cross-engine.
    ``min_count`` drops hapax pairs whose PMI is spuriously high (the
    standard collocation-extraction guard).

    Plan shape: one tokenize + one bigram explode, a bigram-keyed count,
    a unigram-keyed count joined twice (unigram table is vocabulary-
    bounded), T as a broadcast one-row crossJoin; top-k via distributed
    TakeOrdered, then a rank window over k rows.
    """
    from pyspark.sql import Window

    from .dedup import grams_from_tokens, word_tokens

    toks = df.select(word_tokens(F.col(text_col)).alias("_t")).select(
        F.filter("_t", lambda x: x != "").alias("_t")
    )
    bi = toks.select(
        F.explode(grams_from_tokens(F.col("_t"), 2)).alias("bigram")
    ).select(
        F.split("bigram", " ").getItem(0).alias("w1"),
        F.split("bigram", " ").getItem(1).alias("w2"),
    )
    # One corpus pass only: unigram slot counts and the total derive from
    # the PAIR table (vocabulary^2-bounded), which is localCheckpoint-ed so
    # its three consumers don't each replay the tokenize+explode lineage —
    # measured 20.2 s -> one scan at 800k docs in tools/bench_pipeline.py.
    pair = (
        bi.groupBy("w1", "w2")
        .agg(F.count(F.lit(1)).alias("pair_count"))
        .localCheckpoint(eager=False)
    )
    uni = (
        pair.select(F.col("w1").alias("w"), "pair_count")
        .unionAll(pair.select(F.col("w2").alias("w"), "pair_count"))
        .groupBy("w")
        .agg(F.sum("pair_count").alias("c"))
    )
    total = pair.agg(F.sum("pair_count").alias("_t2"))
    scored = (
        pair.where(F.col("pair_count") >= min_count)
        .join(uni.select(F.col("w").alias("w1"), F.col("c").alias("_c1")), "w1")
        .join(uni.select(F.col("w").alias("w2"), F.col("c").alias("_c2")), "w2")
        .crossJoin(F.broadcast(total))
        .select(
            "w1",
            "w2",
            "pair_count",
            F.floor(
                F.lit(1e6)
                * F.log(
                    (
                        2.0 * F.col("_t2").cast("double")
                        * F.col("pair_count").cast("double")
                    )
                    / (
                        2.0 * F.col("_c1").cast("double")
                        * F.col("_c2").cast("double")
                    )
                )
            )
            .cast("long")
            .alias("pmi_micro"),
        )
    )
    topk = scored.orderBy(
        F.col("pmi_micro").desc(), F.col("w1").asc(), F.col("w2").asc()
    ).limit(k)
    w = Window.orderBy(
        F.col("pmi_micro").desc(), F.col("w1").asc(), F.col("w2").asc()
    )
    return topk.select(
        F.row_number().over(w).alias("rank"), "w1", "w2", "pair_count", "pmi_micro"
    )


def collocations_pmi_oracle_sql(
    table: str = "documents",
    text_col: str = "text",
    k: int = 20,
    min_count: int = 5,
) -> str:
    """ANSI twin of :func:`collocations_pmi` — both sides count unigrams
    over BIGRAM SLOTS (each interior token twice), so the 2x cancels in
    a numerator/denominator pair kept verbatim for order parity."""
    return rf"""
WITH toks AS (
  SELECT list_filter(string_split(regexp_replace(trim(lower({text_col})), '\s+', ' ', 'g'), ' '),
                     x -> x != '') AS t
  FROM {table}
),
bi AS (
  SELECT t[i] AS w1, t[i + 1] AS w2
  FROM toks, UNNEST(generate_series(1, len(t) - 1)) AS u(i)
  WHERE len(t) >= 2
),
pair AS (SELECT w1, w2, COUNT(*) AS pair_count FROM bi GROUP BY 1, 2),
uni AS (
  SELECT w, COUNT(*) AS c FROM (
    SELECT w1 AS w FROM bi UNION ALL SELECT w2 AS w FROM bi
  ) GROUP BY 1
),
total AS (SELECT COUNT(*) AS t2 FROM bi),
scored AS (
  SELECT w1, w2, pair_count,
         CAST(FLOOR(1e6 * ln(
             (2.0 * CAST(total.t2 AS DOUBLE) * CAST(pair_count AS DOUBLE)) /
             (2.0 * CAST(u1.c AS DOUBLE) * CAST(u2.c AS DOUBLE))
         )) AS BIGINT) AS pmi_micro
  FROM pair
  JOIN uni u1 ON u1.w = pair.w1
  JOIN uni u2 ON u2.w = pair.w2
  CROSS JOIN total
  WHERE pair_count >= {min_count}
)
SELECT CAST(ROW_NUMBER() OVER (ORDER BY pmi_micro DESC, w1 ASC, w2 ASC) AS INT) AS rank,
       w1, w2, CAST(pair_count AS BIGINT) AS pair_count, pmi_micro
FROM scored
QUALIFY rank <= {k}
""".strip()


def sentence_stats(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    ndigits: int = 6,
) -> DataFrame:
    """Sentence segmentation stats per document: ``(id, n_sentences,
    n_words, avg_words, max_words)`` — the readability/structure signal a
    quality filter adds on top of the flat token counts (run-on pages and
    list-like boilerplate both show up as extreme avg sentence lengths).

    Segmentation is the deterministic rule ``split on [.!?]+`` with
    whitespace-token word counts per segment; segments with zero words do
    not count as sentences.  All counts are exact integers; ``avg_words``
    is one double division.  Pure column expressions over one scan —
    no UDFs, no shuffle beyond the scan itself.
    """
    sents = F.split(F.col(text_col), r"[.!?]+")
    wc = F.transform(
        sents,
        lambda s_: F.size(F.filter(F.split(F.trim(s_), r"\s+"), lambda t: t != "")),
    )
    nonzero = F.filter(wc, lambda c: c > 0)
    n_sent = F.size(nonzero).cast("long")
    n_words = F.coalesce(
        F.aggregate(nonzero, F.lit(0).cast("long"), lambda a, c: a + c),
        F.lit(0).cast("long"),
    )
    max_words = F.coalesce(F.array_max(nonzero), F.lit(0)).cast("long")
    avg = F.when(
        n_sent > 0,
        F.round(n_words.cast("double") / n_sent.cast("double"), ndigits),
    )
    return df.select(
        F.col(id_col).alias("id"),
        n_sent.alias("n_sentences"),
        n_words.alias("n_words"),
        avg.alias("avg_words"),
        max_words.alias("max_words"),
    )


def sentence_stats_oracle_sql(
    table: str = "documents",
    id_col: str = "doc_id",
    text_col: str = "text",
    ndigits: int = 6,
) -> str:
    """ANSI twin of :func:`sentence_stats`."""
    return f"""
WITH wc AS (
  SELECT {id_col} AS id,
         list_filter(
           list_transform(
             regexp_split_to_array({text_col}, '[.!?]+'),
             s -> len(list_filter(regexp_split_to_array(trim(s), '\\s+'), t -> t != ''))
           ),
           c -> c > 0
         ) AS counts
  FROM {table}
)
SELECT id,
       CAST(len(counts) AS BIGINT) AS n_sentences,
       CAST(COALESCE(list_sum(counts), 0) AS BIGINT) AS n_words,
       CASE WHEN len(counts) > 0
            THEN ROUND(CAST(COALESCE(list_sum(counts), 0) AS DOUBLE)
                       / CAST(len(counts) AS DOUBLE), {ndigits}) END AS avg_words,
       CAST(COALESCE(list_max(counts), 0) AS BIGINT) AS max_words
FROM wc
""".strip()


def readability_scores(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    ndigits: int = 6,
) -> DataFrame:
    """Flesch-style readability per document: ``(id, n_sentences,
    n_words, n_syllables, flesch)`` — the classic reading-ease screen a
    quality pipeline uses to separate prose from tables/code dumps
    (extreme scores either way are a boilerplate signal).

    Deterministic proxies: sentences = ``[.!?]+`` segments with >= 1
    whitespace word (exactly :func:`sentence_stats`'s rule), syllables =
    vowel-group count ``[aeiouyAEIOUY]+`` over the whole text (the
    standard heuristic, applied text-wide so it is one ``regexp_count``).
    Flesch reading ease ``206.835 - 1.015*(words/sentences) -
    84.6*(syllables/words)`` is a fixed double combination of exact
    integers.  Pure column expressions, one scan; NULL flesch when a doc
    has no sentences or words.
    """
    sents = F.split(F.col(text_col), r"[.!?]+")
    wc = F.transform(
        sents,
        lambda s_: F.size(F.filter(F.split(F.trim(s_), r"\s+"), lambda t: t != "")),
    )
    nonzero = F.filter(wc, lambda c: c > 0)
    n_sent = F.size(nonzero).cast("long")
    n_words = F.coalesce(
        F.aggregate(nonzero, F.lit(0).cast("long"), lambda a, c: a + c),
        F.lit(0).cast("long"),
    )
    n_syll = F.coalesce(
        F.size(F.regexp_extract_all(F.col(text_col), F.lit("[aeiouyAEIOUY]+"), 0)),
        F.lit(0),
    ).cast("long")
    flesch = F.when(
        (n_sent > 0) & (n_words > 0),
        F.round(
            F.lit(206.835)
            - F.lit(1.015) * (n_words.cast("double") / n_sent.cast("double"))
            - F.lit(84.6) * (n_syll.cast("double") / n_words.cast("double")),
            ndigits,
        ),
    )
    return df.select(
        F.col(id_col).alias("id"),
        n_sent.alias("n_sentences"),
        n_words.alias("n_words"),
        n_syll.alias("n_syllables"),
        flesch.alias("flesch"),
    )


def readability_scores_oracle_sql(
    table: str = "documents",
    id_col: str = "doc_id",
    text_col: str = "text",
    ndigits: int = 6,
) -> str:
    """ANSI twin of :func:`readability_scores`."""
    return f"""
WITH base AS (
  SELECT {id_col} AS id,
         list_filter(
           list_transform(
             regexp_split_to_array({text_col}, '[.!?]+'),
             s -> len(list_filter(regexp_split_to_array(trim(s), '\\s+'), t -> t != ''))
           ),
           c -> c > 0
         ) AS counts,
         CAST(len(regexp_extract_all({text_col}, '[aeiouyAEIOUY]+')) AS BIGINT) AS n_syllables
  FROM {table}
),
agg AS (
  SELECT id,
         CAST(len(counts) AS BIGINT) AS n_sentences,
         CAST(COALESCE(list_sum(counts), 0) AS BIGINT) AS n_words,
         n_syllables
  FROM base
)
SELECT id, n_sentences, n_words, n_syllables,
       CASE WHEN n_sentences > 0 AND n_words > 0
            THEN ROUND(206.835
                       - 1.015 * (CAST(n_words AS DOUBLE) / CAST(n_sentences AS DOUBLE))
                       - 84.6 * (CAST(n_syllables AS DOUBLE) / CAST(n_words AS DOUBLE)), {ndigits}) END AS flesch
FROM agg
""".strip()


def vocab_jsd(
    df: DataFrame,
    seg_col: str,
    seg_a: str,
    seg_b: str,
    text_col: str = "text",
    ndigits: int = 6,
) -> DataFrame:
    """Jensen-Shannon divergence between the term distributions of two
    corpus segments: one row ``(n_terms_a, n_terms_b, vocab, jsd)`` —
    the vocabulary-drift monitor (new crawl vs old, en vs de, split A vs
    split B).  JSD is symmetric, bounded [0, ln 2], and finite under
    disjoint vocabularies — the properties that make it the standard
    corpus-comparison divergence where KL blows up.

    Unigram counts come from the shared :func:`word_tokens` rule;
    probabilities are Laplace-smoothed over the union vocabulary
    ``(c+1)/(n+V)``; each term's contribution
    ``(p·ln(p/m) + q·ln(q/m)) / 2`` with ``m = (p+q)/2`` floor-quantizes
    to exact BIGINT nanos before summation (the
    :func:`ddspark.profile.column_entropy` trick — no float-summation
    order), so the statistic value-hashes cross-engine.  One token
    explode + one (term, segment) count aggregation + one rollup; the
    shuffle carries term counts, never documents.
    """
    from .dedup import word_tokens

    toks = df.where(F.col(seg_col).isin([seg_a, seg_b])).select(
        F.col(seg_col).alias("_s"),
        F.explode(word_tokens(F.col(text_col))).alias("term"),
    ).where(F.col("term") != "")
    counts = toks.groupBy("term").agg(
        F.sum(F.when(F.col("_s") == seg_a, 1).otherwise(0)).alias("ca"),
        F.sum(F.when(F.col("_s") == seg_b, 1).otherwise(0)).alias("cb"),
    )
    tot = counts.agg(
        F.sum("ca").alias("na"),
        F.sum("cb").alias("nb"),
        F.count(F.lit(1)).alias("v"),
    )
    pa = (F.col("ca") + 1).cast("double") / (F.col("na") + F.col("v")).cast("double")
    pb = (F.col("cb") + 1).cast("double") / (F.col("nb") + F.col("v")).cast("double")
    m = (pa + pb) / 2
    term_nano = F.floor(
        F.lit(1e9) * ((pa * F.log(pa / m) + pb * F.log(pb / m)) / 2)
    ).cast("long")
    agg = counts.crossJoin(F.broadcast(tot)).agg(
        F.first("na").alias("n_terms_a"),
        F.first("nb").alias("n_terms_b"),
        F.first("v").alias("vocab"),
        F.sum(term_nano).alias("_nano"),
    )
    return agg.select(
        "n_terms_a",
        "n_terms_b",
        "vocab",
        F.round(F.col("_nano").cast("double") / 1e9, ndigits).alias("jsd"),
    )


def vocab_jsd_oracle_sql(
    table: str,
    seg_col: str,
    seg_a: str,
    seg_b: str,
    text_col: str = "text",
    ndigits: int = 6,
) -> str:
    """ANSI twin of :func:`vocab_jsd`."""
    return f"""
WITH toks AS (
  SELECT {seg_col} AS s, u.term
  FROM {table},
       UNNEST(string_split(regexp_replace(trim(lower({text_col})), '\\s+', ' ', 'g'), ' ')) AS u(term)
  WHERE {seg_col} IN ('{seg_a}', '{seg_b}') AND u.term != ''
),
counts AS (
  SELECT term,
         SUM(CASE WHEN s = '{seg_a}' THEN 1 ELSE 0 END) AS ca,
         SUM(CASE WHEN s = '{seg_b}' THEN 1 ELSE 0 END) AS cb
  FROM toks GROUP BY term
),
tot AS (
  SELECT SUM(ca) AS na, SUM(cb) AS nb, COUNT(*) AS v FROM counts
),
nano AS (
  SELECT CAST(FLOOR(1e9 * (
           (CAST(ca + 1 AS DOUBLE) / CAST(na + v AS DOUBLE))
             * LN((CAST(ca + 1 AS DOUBLE) / CAST(na + v AS DOUBLE))
                  / (((CAST(ca + 1 AS DOUBLE) / CAST(na + v AS DOUBLE))
                      + (CAST(cb + 1 AS DOUBLE) / CAST(nb + v AS DOUBLE))) / 2))
           + (CAST(cb + 1 AS DOUBLE) / CAST(nb + v AS DOUBLE))
             * LN((CAST(cb + 1 AS DOUBLE) / CAST(nb + v AS DOUBLE))
                  / (((CAST(ca + 1 AS DOUBLE) / CAST(na + v AS DOUBLE))
                      + (CAST(cb + 1 AS DOUBLE) / CAST(nb + v AS DOUBLE))) / 2))
         ) / 2) AS BIGINT) AS t,
         na, nb, v
  FROM counts CROSS JOIN tot
)
SELECT CAST(MIN(na) AS BIGINT) AS n_terms_a,
       CAST(MIN(nb) AS BIGINT) AS n_terms_b,
       CAST(MIN(v) AS BIGINT) AS vocab,
       ROUND(CAST(SUM(t) AS DOUBLE) / 1e9, {ndigits}) AS jsd
FROM nano
""".strip()


# RAKE phrase-boundary stopwords (Rose et al. 2010) — deliberately small
# and frozen: the list is part of the operator's cross-engine contract.
RAKE_STOPWORDS: list[str] = [
    "a", "an", "and", "are", "as", "at", "be", "but", "by", "for", "from",
    "has", "have", "he", "i", "in", "is", "it", "its", "not", "of", "on",
    "or", "our", "she", "that", "the", "their", "these", "they", "this",
    "those", "to", "was", "we", "were", "will", "with", "you", "your",
]


def rake_keywords(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    top: int = 20,
    max_words: int = 4,
    scale: int = 10**6,
) -> DataFrame:
    """RAKE keyword extraction (Rose et al. 2010) over the corpus: the
    ``top`` candidate phrases ranked by the summed member-word scores
    ``deg(w)/freq(w)``.  Candidate phrases are maximal runs of
    non-stopword tokens between stopword/punctuation boundaries;
    ``freq(w)`` counts a word's phrase memberships and ``deg(w)`` sums
    the lengths of the phrases it appears in — so words that co-occur
    inside long multi-word terms outrank equally frequent words that
    only stand alone.  Boundaries are ASCII punctuation/symbols plus the
    frozen stopword list; non-ASCII codepoints stay inside tokens.
    Returns ``(phrase, n_words, n, score_micro, score)`` with ``n`` the
    corpus-wide occurrence count.

    **Exactness** — the word score quantizes as the pure-integer floor
    division ``(scale * deg) div freq`` (no floats anywhere), and the
    phrase score is the BIGINT sum of member-word scores, so the
    ranking replays bit-for-bit cross-engine; ties break on the phrase
    text.

    **Scale** — boundary detection is PURE REGEX (punctuation and
    word-bounded stopwords rewrite to a delimiter, then one split): no
    per-token window, no per-doc sort — the 4 M-doc bench dropped
    132 s -> explode-only cost when the original windowed form was
    replaced.  Word stats aggregate over phrase OCCURRENCES (one
    explode), but the phrase-score join touches only DISTINCT phrase
    texts (a phrase's score depends only on its text), so the
    vocab-keyed join is over the deduplicated phrase table.  Phrases
    longer than ``max_words`` drop (mirrored).
    """
    if top < 1 or max_words < 1 or scale < 1:
        raise ValueError("top, max_words, scale must all be >= 1")
    stop_alt = "|".join(RAKE_STOPWORDS)
    # positive ASCII punct/symbol class — the equivalent negated class
    # [^a-z0-9\s]+ measured 26 s per pass over 4 M docs on this JVM
    # (negated-class scan pathology); the positive ranges run at 2.5 s.
    # Non-ASCII codepoints therefore stay inside tokens (documented).
    norm = F.regexp_replace(F.lower(F.col(text_col)), r"[!-/:-@\[-`{-~]+", " | ")
    norm = F.regexp_replace(norm, rf"\b({stop_alt})\b", "|")
    norm = F.regexp_replace(norm, r"\s+", " ")
    phrases = F.filter(
        F.transform(F.split(norm, r"\|"), lambda p: F.trim(p)),
        lambda p: p != "",
    )
    # projection boundaries are load-bearing (the grams_from_tokens
    # lesson): exploding the raw lambda chain re-evaluates the whole
    # regex+filter pipeline once per emitted phrase (measured 27 s for
    # the explode alone at 4 M docs; 1.5 s with the boundary), and the
    # same for re-splitting the phrase per member row.
    occ = (
        df.where(F.col(text_col).isNotNull())
        .select(phrases.alias("_ps"))
        .select(F.explode("_ps").alias("phrase"))
        .select("phrase", F.split(F.col("phrase"), " ").alias("_toks"))
        .withColumn("n_words", F.size("_toks"))
        .where(F.col("n_words") <= max_words)
    )
    # occurrence-level member rows drive the word statistics
    members = occ.select("n_words", F.explode("_toks").alias("tok"))
    words = members.groupBy("tok").agg(
        F.count(F.lit(1)).alias("freq"), F.sum("n_words").alias("deg")
    )
    wscore = words.select(
        "tok", F.expr(f"({int(scale)} * deg) div freq").alias("ws")
    )
    dist = occ.groupBy("phrase").agg(
        F.max("n_words").alias("n_words"), F.count(F.lit(1)).alias("n")
    )
    dmem = dist.select(
        "phrase", F.split(F.col("phrase"), " ").alias("_t")
    ).select("phrase", F.explode("_t").alias("tok"))
    scores = (
        dmem.join(wscore, "tok")
        .groupBy("phrase")
        .agg(F.sum("ws").alias("score_micro"))
    )
    out = dist.join(scores, "phrase").select(
        "phrase",
        "n_words",
        "n",
        "score_micro",
        F.round(F.col("score_micro").cast("double") / scale, 6).alias("score"),
    )
    return out.orderBy(F.desc("score_micro"), "phrase").limit(top)


def rake_keywords_oracle_sql(
    table: str = "documents",
    id_col: str = "doc_id",
    text_col: str = "text",
    top: int = 20,
    max_words: int = 4,
    scale: int = 10**6,
) -> str:
    """ANSI twin of :func:`rake_keywords` (same regex boundary rewrite,
    integer word scores, and tie-break)."""
    stop_alt = "|".join(RAKE_STOPWORDS)
    return rf"""
WITH occ0 AS (
  SELECT trim(p) AS phrase
  FROM (
    SELECT string_split_regex(
             regexp_replace(
               regexp_replace(
                 regexp_replace(lower({text_col}), '[!-/:-@\[-`{{-~]+', ' | ', 'g'),
                 '\b({stop_alt})\b', '|', 'g'),
               '\s+', ' ', 'g'),
             '\|') AS ps
    FROM {table} WHERE {text_col} IS NOT NULL
  ), UNNEST(ps) AS u(p)
),
occ AS (
  SELECT phrase, len(string_split(phrase, ' ')) AS n_words
  FROM occ0
  WHERE phrase <> '' AND len(string_split(phrase, ' ')) <= {max_words}
),
members AS (
  SELECT n_words, u.tok
  FROM occ, UNNEST(string_split(phrase, ' ')) AS u(tok)
),
words AS (
  SELECT tok, COUNT(*) AS freq, CAST(SUM(n_words) AS BIGINT) AS deg
  FROM members GROUP BY tok
),
wscore AS (
  SELECT tok, ({int(scale)} * deg) // freq AS ws FROM words
),
dist AS (
  SELECT phrase, CAST(MAX(n_words) AS BIGINT) AS n_words,
         CAST(COUNT(*) AS BIGINT) AS n
  FROM occ GROUP BY phrase
),
scores AS (
  SELECT d.phrase, CAST(SUM(w.ws) AS BIGINT) AS score_micro
  FROM (SELECT phrase, u.tok
        FROM dist, UNNEST(string_split(phrase, ' ')) AS u(tok)) d
  JOIN wscore w ON d.tok = w.tok
  GROUP BY d.phrase
)
SELECT dist.phrase, dist.n_words, dist.n, s.score_micro,
       ROUND(CAST(s.score_micro AS DOUBLE) / {int(scale)}, 6) AS score
FROM dist JOIN scores s ON dist.phrase = s.phrase
ORDER BY s.score_micro DESC, dist.phrase
LIMIT {top}
""".strip()
