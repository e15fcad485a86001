"""N-gram language-model quality scoring (CCNet-style perplexity filter).

A classic web-corpus curation signal (Wenzek 2020 "CCNet"): fit a small
language model, score every document's per-token log-probability, and
keep/bucket documents by perplexity — gibberish and boilerplate score far
from the corpus's bulk.  CCNet uses a KenLM 5-gram; this engine fits a
word **bigram model with add-one smoothing** entirely as DataFrame
aggregations, which keeps every step a Catalyst join/groupBy (no Python
in the hot path) and — unlike KenLM — makes the whole computation
replayable by an independent SQL engine for the correctness gate.

Model (all counts over the mapped token stream, where tokens occurring
fewer than ``min_count`` times corpus-wide become ``<unk>`` and every
document is prefixed with a ``<s>`` sentinel):

* ``c2(w1, w2)`` — bigram count, ``c1(w1)`` — bigram-prefix count
* ``V`` — number of distinct mapped token types (bigram suffixes)
* ``p(w2 | w1) = (c2 + 1) / (c1 + V)``  (add-one / Laplace)

Scoring emits, per document, exact BIGINTs:

* ``n_bigrams`` — number of scored transitions (= token count)
* ``n_oov``     — tokens mapped to ``<unk>``
* ``logprob_micro`` — ``sum(floor(1e6 * ln(p)))`` in integer micro-nats,
  so the per-document sum is order-exact and cross-engine deterministic
  (the float convenience columns ``avg_logprob``/``perplexity`` are
  derived from it and NOT gate-hashed)

Note the sentinel strings: a document whose text literally contains the
token ``<s>`` or ``<unk>`` collides with the sentinels.  Both engines
apply the identical rule, so the gate is unaffected; real deployments
would pick out-of-alphabet sentinels.

Scale: one token explode (linear), two joins against the vocab (Spark
picks broadcast when the vocab is small, shuffle otherwise), count
aggregations shuffled on token/bigram keys, and one bigram-keyed join to
attach model counts — the same shapes as the shingling operators that
already run at sf1.  Nothing is collected to the driver; the vocabulary
size ``V`` travels as a broadcast one-row crossJoin.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, functions as F

from .dedup import word_tokens

__all__ = ["BigramLM", "bigram_lm_fit", "bigram_lm_score", "bigram_lm_oracle_sql"]

_BOS = "<s>"
_UNK = "<unk>"


def _bigram_rows(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """``id | w1 | w2`` — one row per token transition, ``<s>``-prefixed.

    Every token of every document appears exactly once as ``w2``, so
    unigram statistics are derivable from this one explode.
    """
    toks = df.select(
        F.col(id_col).alias("id"), word_tokens(F.col(text_col)).alias("t")
    )
    n = F.size("t")
    w1s = F.concat(F.array(F.lit(_BOS)), F.slice("t", 1, n - 1))
    pairs = F.arrays_zip(w1s.alias("w1"), F.col("t").alias("w2"))
    return toks.select("id", F.explode(pairs).alias("p")).select(
        "id", F.col("p.w1").alias("w1"), F.col("p.w2").alias("w2")
    )


@dataclass
class BigramLM:
    """Fitted model: count tables kept distributed (no driver collect)."""

    vocab: DataFrame  # tok
    c1: DataFrame  # m1 | c1   (bigram-prefix counts, mapped space)
    c2: DataFrame  # m1 | m2 | c2
    vsize: DataFrame  # one row: v  (distinct mapped suffix types)


def _map_tokens(big: DataFrame, vocab: DataFrame) -> DataFrame:
    """Map raw transitions into model space: rare tokens -> <unk>,
    the BOS sentinel passes through; flags OOV suffix positions."""
    v1 = vocab.withColumnRenamed("tok", "_v1")
    v2 = vocab.withColumnRenamed("tok", "_v2")
    return (
        big.join(v1, big["w1"] == v1["_v1"], "left")
        .join(v2, big["w2"] == v2["_v2"], "left")
        .select(
            "id",
            F.when(F.col("w1") == _BOS, F.lit(_BOS))
            .when(F.col("_v1").isNotNull(), F.col("w1"))
            .otherwise(F.lit(_UNK))
            .alias("m1"),
            F.when(F.col("_v2").isNotNull(), F.col("w2"))
            .otherwise(F.lit(_UNK))
            .alias("m2"),
            F.when(F.col("_v2").isNull(), F.lit(1)).otherwise(F.lit(0)).alias("oov"),
        )
    )


def bigram_lm_fit(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_count: int = 2,
) -> BigramLM:
    """Fit the add-one bigram model on a (training) corpus.

    ``min_count`` is the vocabulary threshold: tokens seen fewer times
    corpus-wide become ``<unk>`` (a count cutoff is deterministic with no
    top-k tie-breaking, unlike a fixed vocab size).
    """
    big = _bigram_rows(df, id_col, text_col)
    uni = big.groupBy(F.col("w2").alias("tok")).agg(F.count(F.lit(1)).alias("c"))
    vocab = uni.where(F.col("c") >= min_count).select("tok")
    m = _map_tokens(big, vocab)
    c2 = m.groupBy("m1", "m2").agg(F.count(F.lit(1)).alias("c2"))
    c1 = m.groupBy("m1").agg(F.count(F.lit(1)).alias("c1"))
    vsize = m.agg(F.countDistinct("m2").alias("v"))
    return BigramLM(vocab=vocab, c1=c1, c2=c2, vsize=vsize)


def bigram_lm_score(
    model: BigramLM,
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Score documents under a fitted model.

    Returns ``doc_id | n_bigrams | n_oov | logprob_micro`` (exact
    BIGINTs) plus derived ``avg_logprob`` (nats/token) and
    ``perplexity`` floats.  Unseen bigrams and prefixes fall back to the
    smoothed floor (``c2 = 0`` / ``c1 = 0``), so scoring a corpus the
    model never saw is well-defined.
    """
    big = _bigram_rows(df, id_col, text_col)
    m = _map_tokens(big, model.vocab)
    scored = (
        m.join(model.c2, on=["m1", "m2"], how="left")
        .join(model.c1, on="m1", how="left")
        .crossJoin(F.broadcast(model.vsize))
        .select(
            "id",
            "oov",
            F.floor(
                F.lit(1e6)
                * F.log(
                    (F.coalesce(F.col("c2"), F.lit(0)) + 1).cast("double")
                    / (F.coalesce(F.col("c1"), F.lit(0)) + F.col("v")).cast("double")
                )
            )
            .cast("long")
            .alias("lp"),
        )
    )
    out = scored.groupBy(F.col("id").alias(id_col)).agg(
        F.count(F.lit(1)).alias("n_bigrams"),
        F.sum("oov").cast("long").alias("n_oov"),
        F.sum("lp").alias("logprob_micro"),
    )
    avg = F.col("logprob_micro").cast("double") / 1e6 / F.col("n_bigrams")
    return out.withColumn("avg_logprob", avg).withColumn(
        "perplexity", F.exp(-F.col("avg_logprob"))
    )


def bigram_lm_oracle_sql(
    table: str = "documents",
    id_col: str = "doc_id",
    text_col: str = "text",
    min_count: int = 2,
) -> str:
    """ANSI twin of fit-then-score on the same corpus (the gate shape).

    Replays tokenization, vocab cutoff, mapping, counts, and the integer
    micro-nat scoring bit-for-bit in DuckDB; only the gate's BIGINT
    columns are emitted.
    """
    return rf"""
WITH toks AS (
  SELECT {id_col} AS id,
         string_split(regexp_replace(trim(lower({text_col})), '\s+', ' ', 'g'), ' ') AS t
  FROM {table}
),
big AS (
  SELECT id,
         CASE WHEN i = 1 THEN '{_BOS}' ELSE t[i - 1] END AS w1,
         t[i] AS w2
  FROM toks, UNNEST(generate_series(1, len(t))) AS g(i)
),
uni AS (SELECT w2 AS tok, COUNT(*) AS c FROM big GROUP BY 1),
vocab AS (SELECT tok FROM uni WHERE c >= {min_count}),
m AS (
  SELECT id,
         CASE WHEN w1 = '{_BOS}' THEN '{_BOS}'
              WHEN v1.tok IS NOT NULL THEN w1
              ELSE '{_UNK}' END AS m1,
         CASE WHEN v2.tok IS NOT NULL THEN w2 ELSE '{_UNK}' END AS m2,
         CASE WHEN v2.tok IS NULL THEN 1 ELSE 0 END AS oov
  FROM big
  LEFT JOIN vocab v1 ON big.w1 = v1.tok
  LEFT JOIN vocab v2 ON big.w2 = v2.tok
),
c2t AS (SELECT m1, m2, COUNT(*) AS c2 FROM m GROUP BY 1, 2),
c1t AS (SELECT m1, COUNT(*) AS c1 FROM m GROUP BY 1),
vs AS (SELECT COUNT(DISTINCT m2) AS v FROM m),
scored AS (
  SELECT m.id, m.oov,
         CAST(FLOOR(1e6 * ln(CAST(c2t.c2 + 1 AS DOUBLE)
                             / CAST(c1t.c1 + vs.v AS DOUBLE))) AS BIGINT) AS lp
  FROM m
  JOIN c2t USING (m1, m2)
  JOIN c1t USING (m1)
  CROSS JOIN vs
)
SELECT id AS {id_col},
       CAST(COUNT(*) AS BIGINT) AS n_bigrams,
       CAST(SUM(oov) AS BIGINT) AS n_oov,
       CAST(SUM(lp) AS BIGINT) AS logprob_micro
FROM scored GROUP BY 1
""".strip()
