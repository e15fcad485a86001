"""Full-text retrieval over a document corpus: inverted index (postings
with positions), conjunctive boolean search, exact phrase search, and
BM25 ranked retrieval.

A training-data pipeline needs retrieval for targeted curation (pull all
documents mentioning a benchmark), contamination forensics (where does
this exact phrase occur?), and quality-weighted sampling (BM25 against a
topic query).  The reference (DataDog/sketches-py) has no text surface at
all — this module is engine surface in the same spirit as `textops` /
`dedup`: everything is expressed as JVM-side column expressions +
hash-partitioned aggregations, and every scoring formula is quantized so
a DuckDB ANSI twin reproduces it bit-for-bit (the gate hashes values).

Tokenization is :func:`ddspark.pipeline.dedup.word_tokens` — the single
shared normalization rule — with empty tokens dropped, so retrieval,
shingling and decontamination can never disagree about what a "term" is.

Scale notes (100 TB corpus):

* The postings build is one ``posexplode`` + one ``(term, doc)``
  aggregation — a single hash shuffle keyed by term+doc; no windows, no
  driver state.  Positions arrays are per-(term, doc) and bounded by the
  document length.
* Searches never materialize the full index: the query's term set (a few
  literals) is pushed as an ``isin`` filter *before* the aggregation, so
  the shuffle carries only postings of queried terms.
* BM25's corpus constants (N, total token count) travel as a one-row
  broadcast crossJoin, not a driver collect.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from .dedup import word_tokens

__all__ = [
    "tokens_with_positions",
    "build_postings",
    "boolean_and_search",
    "phrase_search",
    "phrase_search_postings",
    "proximity_search",
    "proximity_search_oracle_sql",
    "bm25_topk",
    "bm25_batch",
    "bm25_batch_oracle_sql",
    "kwic_snippets",
    "kwic_snippets_oracle_sql",
    "rrf_fuse",
    "phrase_search_oracle_sql",
    "bm25_topk_oracle_sql",
]


def _clean_tokens(text: Column) -> Column:
    """Normalized token array with empty tokens removed (the retrieval
    variant of :func:`word_tokens`; blank/whitespace-only text yields an
    empty array instead of ``[""]``)."""
    return F.filter(word_tokens(text), lambda x: x != "")


def tokens_with_positions(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """``(id, pos, term)`` — one row per token occurrence, 0-based
    position.  The projection boundary materializes the token array once
    per document before the explode (same rationale as
    ``dedup.grams_from_tokens``)."""
    return df.select(
        F.col(id_col).alias("id"), _clean_tokens(F.col(text_col)).alias("_t")
    ).select("id", F.posexplode("_t").alias("pos", "term"))


def build_postings(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """The inverted index: ``(term, id, tf, positions ARRAY<INT>)``,
    positions sorted ascending.

    One explode + one ``(term, id)`` hash aggregation; repartitioned by
    ``term`` on output so a ``.write.bucketBy("term")`` (or a downstream
    term-keyed join) needs no further exchange.  A posting row's size is
    bounded by the doc's length — no per-term skew beyond natural term
    frequency (cap hot terms upstream with a stopword filter if needed).
    """
    tp = tokens_with_positions(df, id_col, text_col)
    return (
        tp.groupBy("term", "id")
        .agg(
            F.count(F.lit(1)).alias("tf"),
            F.sort_array(F.collect_list("pos")).alias("positions"),
        )
        .repartition("term")
    )


def boolean_and_search(
    df: DataFrame,
    terms: list[str],
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Documents containing ALL of ``terms``: ``(id, total_tf)``.

    The term filter is applied before the aggregation, so the shuffle
    carries only occurrences of the queried terms; the conjunctive check
    is ``count(distinct term) == len(terms)`` inside one aggregate —
    no self-joins, no index materialization.
    """
    if not terms:
        raise ValueError("boolean_and_search needs at least one term")
    uniq = sorted(set(terms))
    tp = tokens_with_positions(df, id_col, text_col).where(
        F.col("term").isin(uniq)
    )
    return (
        tp.groupBy("id")
        .agg(
            F.count(F.lit(1)).alias("total_tf"),
            F.count_distinct("term").alias("_nt"),
        )
        .where(F.col("_nt") == len(uniq))
        .select(F.col("id").alias(id_col), "total_tf")
    )


def phrase_search(
    df: DataFrame,
    phrase: list[str],
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Exact phrase occurrences: ``(id, n_occ)`` for documents where the
    tokens of ``phrase`` appear consecutively; ``n_occ`` counts distinct
    start positions.

    Algorithm: per document, gather the position set P(w) of each phrase
    word with conditional aggregation (one shuffle, keyed by doc), then
    chain shifted intersections entirely in array expressions:
    ``S_0 = P(w_0)``, ``S_j = S_(j-1) ∩ {p - j : p ∈ P(w_j)}`` — a match
    starts at i iff i survives all m-1 intersections.  Repeated words in
    the phrase are handled naturally (each step re-checks the offset).
    No self-join: cost is one aggregation over occurrences of the m
    query words only.
    """
    if not phrase:
        raise ValueError("phrase_search needs at least one token")
    tp = tokens_with_positions(df, id_col, text_col).where(
        F.col("term").isin(sorted(set(phrase)))
    )
    per_word = [
        F.sort_array(
            F.collect_list(F.when(F.col("term") == w, F.col("pos")))
        ).alias(f"_p{j}")
        for j, w in enumerate(phrase)
    ]
    g = tp.groupBy("id").agg(*per_word)

    def _shift(j: int):
        # single-arg lambda on purpose: PySpark dispatches higher-order
        # lambdas BY ARITY, so a `lambda p, _j=j:` form would be invoked
        # as (element, index) and subtract the array index instead of j
        return lambda p: p - j

    starts = F.col("_p0")
    for j in range(1, len(phrase)):
        starts = F.array_intersect(
            starts, F.transform(F.col(f"_p{j}"), _shift(j))
        )
    return (
        g.select(F.col("id").alias(id_col), F.size(starts).alias("n_occ"))
        .where(F.col("n_occ") > 0)
    )


def proximity_search(
    df: DataFrame,
    term_a: str,
    term_b: str,
    max_dist: int = 5,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """NEAR/k search: documents where ``term_a`` occurs within
    ``max_dist`` tokens of ``term_b`` — ``(id, n_anchors)``, counting
    the ``term_a`` positions that have a ``term_b`` within range.

    The unordered-adjacency relaxation of :func:`phrase_search` (same
    one-aggregation shape): both terms' position sets gather in one
    conditional aggregate, the proximity test is a nested higher-order
    expression ``filter(P_a, a -> exists(P_b, b -> |a-b| <= d))`` — all
    JVM column expressions, no self-join, cost bounded by occurrences
    of the two queried terms.
    """
    if term_a == term_b:
        raise ValueError("proximity_search needs two distinct terms")
    if max_dist < 1:
        raise ValueError(f"max_dist must be >= 1, got {max_dist}")
    tp = tokens_with_positions(df, id_col, text_col).where(
        F.col("term").isin([term_a, term_b])
    )
    g = tp.groupBy("id").agg(
        F.collect_list(
            F.when(F.col("term") == term_a, F.col("pos"))
        ).alias("_pa"),
        F.collect_list(
            F.when(F.col("term") == term_b, F.col("pos"))
        ).alias("_pb"),
    )
    anchors = F.size(
        F.filter(
            "_pa",
            lambda a: F.exists(
                F.col("_pb"), lambda b: F.abs(a - b) <= max_dist
            ),
        )
    )
    return (
        g.select(F.col("id").alias(id_col), anchors.alias("n_anchors"))
        .where(F.col("n_anchors") > 0)
    )


def proximity_search_oracle_sql(
    term_a: str,
    term_b: str,
    max_dist: int = 5,
    table: str = "documents",
    id_col: str = "doc_id",
    text_col: str = "text",
) -> str:
    """ANSI twin of :func:`proximity_search` (nested list lambdas)."""
    ea = term_a.replace("'", "''")
    eb = term_b.replace("'", "''")
    toks = _TOKS_CTE.format(table=table, id_col=id_col, text_col=text_col)
    return f"""
WITH {toks},
pos AS (
  SELECT id,
         [i - 1 FOR i IN range(1, len(t) + 1) IF t[i] = '{ea}'] AS pa,
         [i - 1 FOR i IN range(1, len(t) + 1) IF t[i] = '{eb}'] AS pb
  FROM toks
)
SELECT id AS {id_col},
       CAST(len(list_filter(pa, a -> len(list_filter(pb, b -> abs(a - b) <= {max_dist})) > 0)) AS INT)
         AS n_anchors
FROM pos
WHERE len(list_filter(pa, a -> len(list_filter(pb, b -> abs(a - b) <= {max_dist})) > 0)) > 0
""".strip()


# BM25 constants as exact rationals: k1 = 6/5 (1.2), b = 3/4 (0.75).
# With integer tf, dl, corpus token count L and doc count N:
#   tf_norm = tf*(k1+1) / (tf + k1*(1 - b + b*dl/avgdl))      [avgdl = L/N]
#           = 44*tf*L / (20*tf*L + 6*L + 18*dl*N)             [×20L/20L]
# — numerator and denominator are exact integer expressions, evaluated in
# double (one multiply chain + one correctly-rounded division, identical
# in any IEEE-754 engine).  IDF uses the Robertson "+0.5" form,
#   idf = ln(1 + (N - df + 0.5)/(df + 0.5)) = ln((2N+2)/(2df+1)),
# quantized to integer micro-nats exactly like tfidf_top_terms, so the
# only libm call sits behind a floor(1e6·…) that the gate already
# vouches for cross-engine.


def bm25_topk(
    df: DataFrame,
    query_terms: list[str],
    k: int = 10,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """BM25 ranked retrieval: top-``k`` documents for ``query_terms`` as
    ``(rank, id, score_micro)`` with the deterministic tie-break
    ``(score_micro DESC, id ASC)``.

    ``score_micro = Σ_t floor(idf_micro(t) · 44·tf·L /
    (20·tf·L + 6·L + 18·dl·N))`` — see the rational-form note above; the
    per-term floor makes the sum an exact BIGINT so ranking is
    bit-identical cross-engine.  All int→double conversions and the one
    product/division per term are correctly-rounded IEEE-754 ops (exact
    determinism, though the *mathematical* value is quantized at the
    1e-6 level — the standard trade of this codebase's scoring ops).

    Plan — NO wide shuffles at all: per-doc term frequencies are
    map-side ``size(filter(_t, x -> x = term))`` expressions over the
    token array (m filters per doc, no (term, doc) explode/shuffle, no
    doc-length join); corpus stats — N, L, and every per-term document
    frequency — reduce through ONE tiny aggregate that broadcasts back;
    non-matching docs drop before scoring; the top-k is distributed
    TakeOrdered and the rank window touches ≤ k rows.  (An earlier
    formulation shuffled queried-term tf rows AND joined a doc-sized dl
    table — the map-side form deletes both exchanges.)
    """
    if not query_terms:
        raise ValueError("bm25_topk needs at least one query term")
    uniq = sorted(set(query_terms))

    def tf_expr(w: str) -> Column:
        lit_w = F.lit(w)  # closed over: the HOF lambda must stay 1-arg
        return F.size(F.filter("_t", lambda x: x == lit_w))

    per_doc = df.select(
        F.col(id_col).alias("id"), _clean_tokens(F.col(text_col)).alias("_t")
    ).select(
        "id",
        F.size("_t").alias("dl"),
        *[tf_expr(w).alias(f"_tf{j}") for j, w in enumerate(uniq)],
    )
    # one reduction carries N, L, and every df_t — broadcast back
    stats = per_doc.agg(
        F.count(F.lit(1)).alias("_n"),
        F.sum("dl").alias("_l"),
        *[
            F.sum((F.col(f"_tf{j}") > 0).cast("long")).alias(f"_df{j}")
            for j in range(len(uniq))
        ],
    )
    matched = per_doc.where(
        sum(F.col(f"_tf{j}") for j in range(len(uniq))) > 0
    ).crossJoin(F.broadcast(stats))

    def term_score(j: int) -> Column:
        idf = F.floor(
            F.lit(1e6)
            * F.log(
                (2.0 * F.col("_n") + 2.0) / (2.0 * F.col(f"_df{j}") + 1.0)
            )
        ).cast("long")
        tf = F.col(f"_tf{j}")
        s = F.floor(
            idf.cast("double")
            * (
                (44.0 * tf * F.col("_l"))
                / (
                    20.0 * tf * F.col("_l")
                    + 6.0 * F.col("_l")
                    + 18.0 * F.col("dl") * F.col("_n")
                )
            )
        ).cast("long")
        return F.when(tf > 0, s).otherwise(F.lit(0))

    scored = matched.select(
        "id",
        sum(term_score(j) for j in range(len(uniq))).alias("score_micro"),
    )
    # Distributed top-k (TakeOrdered: per-partition partial top-k, no
    # single-partition window over every matched doc), THEN rank the k
    # survivors — the global window touches ≤ k rows.
    topk = scored.orderBy(
        F.col("score_micro").desc(), F.col("id").asc()
    ).limit(k)
    w = Window.orderBy(F.col("score_micro").desc(), F.col("id").asc())
    return topk.select(
        F.row_number().over(w).alias("rank"),
        F.col("id").alias(id_col),
        "score_micro",
    )


_TOKS_CTE = r"""toks AS (
  SELECT {id_col} AS id,
         list_filter(string_split(regexp_replace(trim(lower({text_col})), '\s+', ' ', 'g'), ' '),
                     x -> x != '') AS t
  FROM {table}
)"""


def phrase_search_oracle_sql(
    phrase: list[str],
    table: str = "documents",
    id_col: str = "doc_id",
    text_col: str = "text",
) -> str:
    """ANSI twin of :func:`phrase_search` (DuckDB lists are 1-based)."""
    m = len(phrase)
    conds = " AND ".join(
        "t[i+{j}] = '{w}'".format(j=j, w=w.replace("'", "''"))
        for j, w in enumerate(phrase)
    )
    toks = _TOKS_CTE.format(table=table, id_col=id_col, text_col=text_col)
    return f"""
WITH {toks}
SELECT id AS {id_col},
       CAST(len(list_filter(range(1, len(t) - {m} + 2), i -> {conds})) AS INT) AS n_occ
FROM toks
WHERE len(t) >= {m}
  AND len(list_filter(range(1, len(t) - {m} + 2), i -> {conds})) > 0
""".strip()


def bm25_topk_oracle_sql(
    query_terms: list[str],
    k: int = 10,
    table: str = "documents",
    id_col: str = "doc_id",
    text_col: str = "text",
) -> str:
    """ANSI twin of :func:`bm25_topk` — same rational form, same
    micro-nat quantization, same double evaluation order."""
    uniq = sorted(set(query_terms))
    in_list = ", ".join("'{}'".format(t.replace("'", "''")) for t in uniq)
    toks = _TOKS_CTE.format(table=table, id_col=id_col, text_col=text_col)
    return f"""
WITH {toks},
dl AS (SELECT id, len(t) AS dl FROM toks),
corpus AS (SELECT COUNT(*) AS n, SUM(dl) AS l FROM dl),
tp AS (
  SELECT id, u.term FROM toks, UNNEST(t) AS u(term)
  WHERE u.term IN ({in_list})
),
tf AS (SELECT id, term, COUNT(*) AS tf FROM tp GROUP BY 1, 2),
idf AS (
  SELECT term,
         CAST(FLOOR(1e6 * ln((2.0 * corpus.n + 2.0) / (2.0 * COUNT(*) + 1.0))) AS BIGINT)
           AS idf_micro
  FROM tf CROSS JOIN corpus GROUP BY term, corpus.n
),
term_scores AS (
  SELECT tf.id,
         CAST(FLOOR(CAST(idf.idf_micro AS DOUBLE) *
              ((44.0 * tf.tf * corpus.l) /
               (20.0 * tf.tf * corpus.l + 6.0 * corpus.l + 18.0 * dl.dl * corpus.n)))
              AS BIGINT) AS s
  FROM tf
  JOIN idf USING (term)
  JOIN dl ON dl.id = tf.id
  CROSS JOIN corpus
),
scored AS (SELECT id, SUM(s) AS score_micro FROM term_scores GROUP BY id)
SELECT CAST(ROW_NUMBER() OVER (ORDER BY score_micro DESC, id ASC) AS INT) AS rank,
       id AS {id_col},
       CAST(score_micro AS BIGINT) AS score_micro
FROM scored
QUALIFY rank <= {k}
""".strip()


def kwic_snippets(
    df: DataFrame,
    term: str,
    context: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Keyword-in-context concordance: one row per occurrence of ``term``
    with its ±``context``-token window — ``(id, pos, snippet)``.

    The contamination-forensics view ("show me every place this
    benchmark string appears, with context").  Map-only + one explode:
    the token array materializes once per document behind a projection
    boundary, occurrences explode from a filtered position sequence, and
    each snippet is one ``slice`` + ``concat_ws`` — no shuffle at all.
    """
    if not term:
        raise ValueError("kwic_snippets needs a non-empty term")
    if context < 0:
        raise ValueError(f"context must be >= 0, got {context}")
    base = df.select(
        F.col(id_col).alias("id"), _clean_tokens(F.col(text_col)).alias("_t")
    ).where(
        # empty docs out BEFORE the position sequence: sequence(0, -1)
        # produces a DESCENDING [0, -1] in Spark, and _t[0] on an empty
        # array raises under ANSI instead of yielding no rows
        F.size("_t") > 0
    )
    hits = base.select(
        "id",
        "_t",
        F.explode(
            F.filter(
                F.sequence(F.lit(0), F.size("_t") - 1),
                lambda i: F.col("_t")[i] == term,
            )
        ).alias("pos"),
    )
    start = F.greatest(F.lit(0), F.col("pos") - context)
    # slice() is 1-based; length trims at the array end automatically
    snippet = F.concat_ws(
        " ",
        F.slice(
            F.col("_t"),
            start + 1,
            F.least(
                F.col("pos") + context, F.size("_t") - 1
            ) - start + 1,
        ),
    )
    return hits.select(
        F.col("id").alias(id_col), "pos", snippet.alias("snippet")
    )


def kwic_snippets_oracle_sql(
    term: str,
    context: int = 3,
    table: str = "documents",
    id_col: str = "doc_id",
    text_col: str = "text",
) -> str:
    """ANSI twin of :func:`kwic_snippets` (DuckDB lists are 1-based)."""
    e = term.replace("'", "''")
    toks = _TOKS_CTE.format(table=table, id_col=id_col, text_col=text_col)
    return f"""
WITH {toks},
hits AS (
  SELECT id, t, u.i - 1 AS pos
  FROM toks, UNNEST(generate_series(1, len(t))) AS u(i)
  WHERE t[u.i] = '{e}'
)
SELECT id AS {id_col}, CAST(pos AS INT) AS pos,
       array_to_string(t[GREATEST(1, pos + 1 - {context}) : LEAST(len(t), pos + 1 + {context})], ' ')
         AS snippet
FROM hits
""".strip()


def phrase_search_postings(
    postings: DataFrame,
    phrase: list[str],
    id_col: str = "doc_id",
) -> DataFrame:
    """:func:`phrase_search` against a prebuilt :func:`build_postings`
    index instead of raw text — ``(id, n_occ)``.

    The index-reuse path: at corpus scale you build postings ONCE (and
    typically ``write_bucketed`` them by term), then every query reads
    only the queried terms' posting rows — no re-tokenization of 100 TB
    per query, and with a term-bucketed table the term filter prunes at
    the scan.  Bit-identical to the raw-text search
    (tests/test_retrieval.py pins equality).
    """
    if not phrase:
        raise ValueError("phrase_search_postings needs at least one token")
    tp = postings.where(F.col("term").isin(sorted(set(phrase)))).select(
        "id", "term", "positions"
    )
    per_word = [
        F.max(F.when(F.col("term") == w, F.col("positions"))).alias(f"_p{j}")
        for j, w in enumerate(phrase)
    ]
    g = tp.groupBy("id").agg(*per_word)
    for j in range(len(phrase)):
        g = g.where(F.col(f"_p{j}").isNotNull())

    def _shift(j: int):
        return lambda p: p - j

    starts = F.col("_p0")
    for j in range(1, len(phrase)):
        starts = F.array_intersect(
            starts, F.transform(F.col(f"_p{j}"), _shift(j))
        )
    return (
        g.select(F.col("id").alias(id_col), F.size(starts).alias("n_occ"))
        .where(F.col("n_occ") > 0)
    )


def bm25_batch(
    df: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "doc_id",
    text_col: str = "text",
    qid_col: str = "query_id",
    terms_col: str = "terms",
) -> DataFrame:
    """BM25 for a TABLE of queries at once: top-``k`` documents per query
    as ``(query_id, rank, id, score_micro)`` — the production retrieval
    shape (thousands of queries against one corpus), where
    :func:`bm25_topk`'s map-side form (terms as literals) stops applying.

    Same exact-rational scoring and micro-nat IDF as :func:`bm25_topk`
    (identical scores for identical queries — pinned by pytest).  Plan:
    postings and doc lengths build once from one corpus scan each and
    serve EVERY query; the query->candidate step is a term-keyed join
    (explode the query terms, join postings on term — bucket the
    postings by term and it is exchange-free on the corpus side); df_t
    and N/L reduce once and broadcast.  The per-query top-k is a window
    PARTITIONED by query_id (bounded by that query's matched docs —
    never a global single-partition sort).  Duplicate terms within one
    query's array score once (set semantics, matching bm25_topk).

    Skew note: a stopword in a query joins every posting of that term —
    cap or drop ultra-high-df terms upstream for adversarial query sets
    (same ``df_cap`` rationale as the dedup family).
    """
    tp = tokens_with_positions(df, id_col, text_col)
    tf = tp.groupBy("term", "id").agg(F.count(F.lit(1)).alias("tf"))
    # dl from the base projection, NOT from the exploded tokens: a groupBy
    # over tp has no rows for EMPTY documents, which would silently shrink
    # N/L and skew every score (bm25_topk counts the whole corpus; a
    # pytest with an empty doc pins the parity)
    dl = df.select(
        F.col(id_col).alias("id"),
        F.size(_clean_tokens(F.col(text_col))).alias("dl"),
    )
    corpus = dl.agg(F.count(F.lit(1)).alias("_n"), F.sum("dl").alias("_l"))
    dft = tf.groupBy("term").agg(F.count(F.lit(1)).alias("_df"))
    idf = dft.crossJoin(F.broadcast(corpus)).select(
        "term",
        F.floor(
            F.lit(1e6)
            * F.log((2.0 * F.col("_n") + 2.0) / (2.0 * F.col("_df") + 1.0))
        )
        .cast("long")
        .alias("idf_micro"),
    )
    qterms = queries.select(
        F.col(qid_col).alias("qid"),
        F.explode(F.array_distinct(F.col(terms_col))).alias("term"),
    )
    term_scores = (
        qterms.join(tf, "term")
        .join(idf, "term")
        .join(dl, "id")
        .crossJoin(F.broadcast(corpus))
        .select(
            "qid",
            "id",
            F.floor(
                F.col("idf_micro").cast("double")
                * (
                    (44.0 * F.col("tf") * F.col("_l"))
                    / (
                        20.0 * F.col("tf") * F.col("_l")
                        + 6.0 * F.col("_l")
                        + 18.0 * F.col("dl") * F.col("_n")
                    )
                )
            )
            .cast("long")
            .alias("s"),
        )
    )
    scored = term_scores.groupBy("qid", "id").agg(
        F.sum("s").alias("score_micro")
    )
    w = Window.partitionBy("qid").orderBy(
        F.col("score_micro").desc(), F.col("id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select(
            F.col("qid").alias(qid_col),
            "rank",
            F.col("id").alias(id_col),
            "score_micro",
        )
    )


def bm25_batch_oracle_sql(
    query_rows: list[tuple[str, list[str]]],
    k: int = 10,
    table: str = "documents",
    id_col: str = "doc_id",
    text_col: str = "text",
    qid_col: str = "query_id",
) -> str:
    """ANSI twin of :func:`bm25_batch` for a literal query set."""
    vals = ", ".join(
        "('{}', {})".format(
            q.replace("'", "''"),
            "[" + ", ".join("'{}'".format(t.replace("'", "''")) for t in ts) + "]",
        )
        for q, ts in query_rows
    )
    toks = _TOKS_CTE.format(table=table, id_col=id_col, text_col=text_col)
    return f"""
WITH {toks},
tp AS (SELECT id, u.term FROM toks, UNNEST(t) AS u(term)),
tf AS (SELECT term, id, COUNT(*) AS tf FROM tp GROUP BY 1, 2),
dl AS (SELECT id, len(t) AS dl FROM toks),
corpus AS (SELECT COUNT(*) AS n, SUM(dl) AS l FROM dl),
idf AS (
  SELECT term,
         CAST(FLOOR(1e6 * ln((2.0 * corpus.n + 2.0) / (2.0 * COUNT(*) + 1.0))) AS BIGINT)
           AS idf_micro
  FROM tf CROSS JOIN corpus GROUP BY term, corpus.n
),
q(qid, terms) AS (VALUES {vals}),
qterms AS (SELECT DISTINCT qid, u.term FROM q, UNNEST(terms) AS u(term)),
term_scores AS (
  SELECT qterms.qid, tf.id,
         CAST(FLOOR(CAST(idf.idf_micro AS DOUBLE) *
              ((44.0 * tf.tf * corpus.l) /
               (20.0 * tf.tf * corpus.l + 6.0 * corpus.l + 18.0 * dl.dl * corpus.n)))
              AS BIGINT) AS s
  FROM qterms
  JOIN tf USING (term)
  JOIN idf USING (term)
  JOIN dl ON dl.id = tf.id
  CROSS JOIN corpus
),
scored AS (SELECT qid, id, SUM(s) AS score_micro FROM term_scores GROUP BY 1, 2)
SELECT qid AS {qid_col},
       CAST(ROW_NUMBER() OVER (PARTITION BY qid ORDER BY score_micro DESC, id ASC) AS INT) AS rank,
       id AS {id_col},
       CAST(score_micro AS BIGINT) AS score_micro
FROM scored
QUALIFY rank <= {k}
""".strip()


def rrf_fuse(
    rankings: list[DataFrame],
    k: int = 60,
    id_col: str = "doc_id",
    rank_col: str = "rank",
    topk: int | None = None,
) -> DataFrame:
    """Reciprocal Rank Fusion (Cormack et al. 2009): combine any number
    of rankings of the same id space into one —
    ``(id, rrf_micro, n_lists, rank)``.

    The standard hybrid-retrieval combiner (BM25 list + embedding-ANN
    list -> one list) — robust because it reads only RANKS, never the
    incomparable scores.  Each list contributes
    ``floor(1e6 / (k + rank))`` — an exact integer (one correctly-
    rounded division behind a floor), so the fused score is an exact
    BIGINT sum under any partitioning and the (rrf DESC, id ASC) order
    is deterministic cross-engine.  Ids absent from a list simply
    contribute nothing (the rank-only semantics).  Plan: one unionAll of
    the (already tiny, top-k-sized) ranking frames + one id-keyed
    aggregation; ``topk`` applies a distributed TakeOrdered.
    """
    if not rankings:
        raise ValueError("rrf_fuse needs at least one ranking")
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    parts = [
        r.select(
            F.col(id_col).alias("id"),
            F.floor(F.lit(1e6) / (F.lit(k) + F.col(rank_col).cast("double")))
            .cast("long")
            .alias("_c"),
        )
        for r in rankings
    ]
    u = parts[0]
    for p in parts[1:]:
        u = u.unionAll(p)
    fused = u.groupBy("id").agg(
        F.sum("_c").alias("rrf_micro"), F.count(F.lit(1)).alias("n_lists")
    )
    if topk is not None:
        fused = fused.orderBy(
            F.col("rrf_micro").desc(), F.col("id").asc()
        ).limit(topk)
    w = Window.orderBy(F.col("rrf_micro").desc(), F.col("id").asc())
    return fused.select(
        F.col("id").alias(id_col),
        "rrf_micro",
        "n_lists",
        F.row_number().over(w).alias("rank"),
    )
