"""Driver contract for the spark-graft builder (PySpark target).

``entry`` runs the flagship per-language content-length quantile sketch;
``queries``/``oracle_sql`` expose each implemented operator with a DuckDB
oracle.  Quantile queries are oracle-checked against the *same DDSketch
algorithm expressed in ANSI SQL* (see ``ddspark/sqlpath.py``) — an
independent single-node implementation of the reference semantics
(DataDog/sketches-py ``ddsketch/ddsketch.py:159-184``, ``mapping.py:75-93``)
— so value equality checks the whole distributed pipeline, not just row
counts.  Exact-stat queries (count/sum/min/max/avg, which DDSketch tracks
exactly, ``ddsketch.py:151-157``) are checked against plain SQL aggregates.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

_REPO = os.path.dirname(os.path.abspath(__file__))
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

from pyspark.sql import DataFrame, SparkSession, functions as F

from ddspark.agg import quantile_label, quantile_sketch
from ddspark.sketch import SketchConfig
from ddspark.sqlpath import ansi_sql_quantile_sketch, sql_quantile_sketch
from ddspark.store import COLLAPSE_LOWEST

ALPHA = 0.01
QS = [0.5, 0.95, 0.99]
ROUND = 6


_PYFILES_SHIPPED: set[str] = set()


def _ensure_pyfiles(spark: SparkSession) -> None:
    """Ship ddspark to executor Python workers regardless of driver cwd
    (once per Spark application)."""
    try:
        app_id = spark.sparkContext.applicationId
        if app_id in _PYFILES_SHIPPED:
            return
        from ddspark.session import package_pyfiles

        spark.sparkContext.addPyFile(package_pyfiles())
        _PYFILES_SHIPPED.add(app_id)
    except Exception:
        pass


def _read(spark: SparkSession, sf_dir: str, table: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{table}.parquet")


def _round_quantiles(df: DataFrame, qs=QS) -> DataFrame:
    out = df
    for q in qs:
        c = quantile_label(q)
        out = out.withColumn(c, F.round(F.col(c), ROUND))
    return out


# --------------------------------------------------------------------------
# flagship


def entry(spark: SparkSession) -> DataFrame:
    """Per-language content-length quantiles over the documents corpus."""
    _ensure_pyfiles(spark)
    docs = _read(spark, "/root/testdata/sf0.001", "documents")
    return quantile_sketch(
        docs, "n_chars", by=["lang"], qs=QS, cfg=SketchConfig(ALPHA)
    )


# --------------------------------------------------------------------------
# queries: distributed pandas-UDF sketch pipeline


def _q_price_by_returnflag(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _read(spark, sf_dir, "lineitem").where(F.col("l_extendedprice") > 0)
    res = quantile_sketch(
        li, "l_extendedprice", by=["l_returnflag"], qs=QS, cfg=SketchConfig(ALPHA)
    )
    return _round_quantiles(
        res.select("l_returnflag", "count", *[quantile_label(q) for q in QS])
    )


def _q_price_global(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _read(spark, sf_dir, "lineitem").where(F.col("l_extendedprice") > 0)
    res = quantile_sketch(li, "l_extendedprice", by=None, qs=QS, cfg=SketchConfig(ALPHA))
    return _round_quantiles(res.select("count", *[quantile_label(q) for q in QS]))


def _q_events_by_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _read(spark, sf_dir, "events").where(F.col("value") > 0)
    res = quantile_sketch(
        ev, "value", by=["event_type"], qs=QS, cfg=SketchConfig(0.02)
    )
    return _round_quantiles(
        res.select("event_type", "count", *[quantile_label(q) for q in QS])
    )


def _q_collapsing_price(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _read(spark, sf_dir, "lineitem").where(F.col("l_extendedprice") > 0)
    cfg = SketchConfig(0.05, mode=COLLAPSE_LOWEST, bin_limit=32)
    res = quantile_sketch(li, "l_extendedprice", by=["l_returnflag"], qs=QS, cfg=cfg)
    return _round_quantiles(
        res.select("l_returnflag", "count", *[quantile_label(q) for q in QS])
    )


def _q_exact_stats_by_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _read(spark, sf_dir, "documents")
    res = quantile_sketch(
        docs, "n_chars", by=["lang"], qs=[0.5], cfg=SketchConfig(ALPHA)
    )
    # count/sum/min/max/avg are tracked exactly by the sketch
    return res.select(
        "lang",
        "count",
        F.col("sum").alias("sum_chars"),
        F.col("min").alias("min_chars"),
        F.col("max").alias("max_chars"),
        F.col("avg").alias("avg_chars"),
    )


def _q_quantity_by_status_sqlpath(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _read(spark, sf_dir, "lineitem")
    res = sql_quantile_sketch(
        li, "l_quantity", by=["l_linestatus"], qs=QS, alpha=0.05
    )
    return _round_quantiles(res)


def _q_weighted_quantity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted sketch (integer weights -> exact float parity with the
    oracle): quantity quantiles weighted by line number."""
    li = _read(spark, sf_dir, "lineitem")
    res = sql_quantile_sketch(
        li, "l_quantity", ["l_returnflag"], QS, 0.05, weight_col="l_linenumber"
    )
    return _round_quantiles(res)


def _q_orders_price_by_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Broadcast-join the orders dim pattern: quantiles of order totalprice
    per priority, weighted pipeline exercise on a second fact table."""
    o = _read(spark, sf_dir, "orders").where(F.col("o_totalprice") > 0)
    res = quantile_sketch(
        o, "o_totalprice", by=["o_orderpriority"], qs=QS, cfg=SketchConfig(ALPHA)
    )
    return _round_quantiles(
        res.select("o_orderpriority", "count", *[quantile_label(q) for q in QS])
    )


# --------------------------------------------------------------------------
# training-data pipeline operators (documents / embeddings tables)


def _q_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ddspark.pipeline.dedup import exact_dedup

    docs = _read(spark, sf_dir, "documents")
    return exact_dedup(docs)


def _q_text_stats_by_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ddspark.pipeline.textops import digit_ratio, punct_ratio, token_count

    docs = _read(spark, sf_dir, "documents")
    t = F.col("text")
    per_doc = docs.select(
        "lang",
        token_count(t).alias("tc"),
        punct_ratio(t).alias("pr"),
        digit_ratio(t).alias("dr"),
    )
    return per_doc.groupBy("lang").agg(
        F.count(F.lit(1)).cast("double").alias("n_docs"),
        F.sum("tc").cast("double").alias("total_tokens"),
        F.round(F.avg("tc"), 6).alias("avg_tokens"),
        F.round(F.avg("pr"), 6).alias("avg_punct_ratio"),
        F.round(F.avg("dr"), 6).alias("avg_digit_ratio"),
    )


def _q_quality_hist(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ddspark.pipeline.textops import quality_score

    docs = _read(spark, sf_dir, "documents")
    return (
        docs.select(F.floor(quality_score(F.col("text")) * 10).alias("bucket"))
        .groupBy("bucket")
        .agg(F.count(F.lit(1)).cast("double").alias("n_docs"))
    )


def _q_lang_id_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ddspark.pipeline.textops import language_id

    docs = _read(spark, sf_dir, "documents")
    return (
        docs.select(language_id(F.col("text")).alias("pred_lang"))
        .groupBy("pred_lang")
        .agg(F.count(F.lit(1)).cast("double").alias("n_docs"))
    )


def _q_jaccard_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ddspark.pipeline.dedup import jaccard_pairs

    docs = _read(spark, sf_dir, "documents").where(F.col("doc_id") < 150)
    return jaccard_pairs(docs, threshold=0.05, n=2)


def _q_ann_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ddspark.pipeline.ann import cosine_topk

    emb = _read(spark, sf_dir, "embeddings")
    queries_df = emb.where(F.col("vec_id") < 5)
    return cosine_topk(emb, queries_df, k=5)


def _q_multimodal_bytes(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ddspark.pipeline.multimodal import extract_features, with_blob

    docs = _read(spark, sf_dir, "documents")
    feats = extract_features(with_blob(docs))
    return feats.select("doc_id", "n_bytes")


def _q_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ddspark.pipeline.dedup import minhash_dedup_pairs

    docs = _read(spark, sf_dir, "documents").where(F.col("doc_id") < 200)
    return minhash_dedup_pairs(docs, n=2, threshold=0.2)


def _q_simhash_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ddspark.pipeline.dedup import simhash_pairs

    docs = _read(spark, sf_dir, "documents").where(F.col("doc_id") < 200)
    return simhash_pairs(docs, max_hamming=12)


def _q_ann_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ddspark.pipeline.ann import lsh_topk

    emb = _read(spark, sf_dir, "embeddings")
    queries_df = emb.where(F.col("vec_id") < 5)
    return lsh_topk(emb, queries_df, k=5, n_planes=4, n_tables=16)


# --------------------------------------------------------------------------
# sibling sketches (north-rule set)


def _q_rollup_chars(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ddspark.agg import quantile_sketch_rollup

    docs = _read(spark, sf_dir, "documents").where(F.col("n_chars") > 0)
    res = quantile_sketch_rollup(
        docs.withColumn("v", F.col("n_chars").cast("double")),
        "v", ["lang"], qs=QS, cfg=SketchConfig(ALPHA),
    )
    return _round_quantiles(
        res.select("lang", "count", *[quantile_label(q) for q in QS])
    )


def _q_hll_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ddspark.sketches.hll import hll_agg

    ev = _read(spark, sf_dir, "events")
    return hll_agg(
        ev.withColumn("u", F.col("user_id").cast("string")), "u", ["event_type"], p=12
    ).select("event_type", F.round("hll_estimate", 2).alias("hll_users"))


def _q_exact_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _read(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.countDistinct("user_id").alias("exact_users")
    )


def _q_tdigest_chars(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ddspark.sketches.tdigest import tdigest_agg

    docs = _read(spark, sf_dir, "documents")
    return tdigest_agg(
        docs.withColumn("v", F.col("n_chars").cast("double")), "v", ["lang"],
        qs=[0.5, 0.99],
    )


def _q_kll_chars(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ddspark.sketches.kll import kll_agg

    docs = _read(spark, sf_dir, "documents")
    return kll_agg(
        docs.withColumn("v", F.col("n_chars").cast("double")), "v", ["lang"],
        qs=[0.5, 0.99],
    )


def _q_countmin_heavy(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ddspark.sketches.countmin import cm_cells

    ev = _read(spark, sf_dir, "events")
    cells = cm_cells(
        ev.withColumn("u", F.col("user_id").cast("string")), "u", depth=5, width=1024
    )
    # observable summary of the sketch state (deterministic)
    return cells.groupBy("_i").agg(
        F.count(F.lit(1)).alias("live_cells"),
        F.sum("_cnt").alias("total_weight"),
    ).withColumnRenamed("_i", "row_i")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    def wrap(fn):
        def run(spark: SparkSession, sf_dir: str) -> DataFrame:
            _ensure_pyfiles(spark)
            return fn(spark, sf_dir)

        return run

    return {
        "ddsketch_price_by_returnflag": wrap(_q_price_by_returnflag),
        "ddsketch_price_global": wrap(_q_price_global),
        "ddsketch_events_by_type": wrap(_q_events_by_type),
        "ddsketch_collapsing_price": wrap(_q_collapsing_price),
        "ddsketch_exact_stats_by_lang": wrap(_q_exact_stats_by_lang),
        "ddsketch_quantity_by_status_sqlpath": wrap(_q_quantity_by_status_sqlpath),
        "ddsketch_weighted_quantity": wrap(_q_weighted_quantity),
        "ddsketch_orders_price_by_priority": wrap(_q_orders_price_by_priority),
        "dedup_exact_fingerprint": wrap(_q_dedup_exact),
        "text_stats_by_lang": wrap(_q_text_stats_by_lang),
        "text_quality_hist": wrap(_q_quality_hist),
        "text_lang_id_counts": wrap(_q_lang_id_counts),
        "dedup_jaccard_pairs": wrap(_q_jaccard_pairs),
        "ann_cosine_topk": wrap(_q_ann_topk),
        "multimodal_byte_plumbing": wrap(_q_multimodal_bytes),
        "dedup_minhash_lsh": wrap(_q_minhash_lsh),
        "dedup_simhash_pairs": wrap(_q_simhash_pairs),
        "ann_lsh_topk": wrap(_q_ann_lsh),
        "ddsketch_rollup_chars": wrap(_q_rollup_chars),
        "hll_distinct_users_by_type": wrap(_q_hll_distinct),
        "exact_distinct_users_by_type": wrap(_q_exact_distinct),
        "tdigest_chars_by_lang": wrap(_q_tdigest_chars),
        "kll_chars_by_lang": wrap(_q_kll_chars),
        "countmin_state_by_row": wrap(_q_countmin_heavy),
    }


# --------------------------------------------------------------------------
# oracles (DuckDB ANSI SQL over the same parquet views)


def oracle_sql() -> dict[str, str]:
    return {
        "ddsketch_price_by_returnflag": ansi_sql_quantile_sketch(
            "lineitem", "l_extendedprice", ["l_returnflag"], QS, ALPHA, round_digits=ROUND
        ),
        "ddsketch_price_global": ansi_sql_quantile_sketch(
            "lineitem", "l_extendedprice", None, QS, ALPHA, round_digits=ROUND
        ),
        "ddsketch_events_by_type": ansi_sql_quantile_sketch(
            "events", "value", ["event_type"], QS, 0.02, round_digits=ROUND
        ),
        "ddsketch_collapsing_price": ansi_sql_quantile_sketch(
            "lineitem",
            "l_extendedprice",
            ["l_returnflag"],
            QS,
            0.05,
            mode=COLLAPSE_LOWEST,
            bin_limit=32,
            round_digits=ROUND,
        ),
        "ddsketch_exact_stats_by_lang": """
            SELECT lang,
                   CAST(COUNT(n_chars) AS DOUBLE) AS count,
                   CAST(SUM(n_chars) AS DOUBLE) AS sum_chars,
                   CAST(MIN(n_chars) AS DOUBLE) AS min_chars,
                   CAST(MAX(n_chars) AS DOUBLE) AS max_chars,
                   CAST(SUM(n_chars) AS DOUBLE) / CAST(COUNT(n_chars) AS DOUBLE)
                       AS avg_chars
            FROM documents GROUP BY lang
        """,
        "ddsketch_quantity_by_status_sqlpath": ansi_sql_quantile_sketch(
            "lineitem", "l_quantity", ["l_linestatus"], QS, 0.05, round_digits=ROUND
        ),
        "ddsketch_weighted_quantity": ansi_sql_quantile_sketch(
            "lineitem",
            "l_quantity",
            ["l_returnflag"],
            QS,
            0.05,
            round_digits=ROUND,
            weight_expr="CAST(l_linenumber AS DOUBLE)",
        ),
        "ddsketch_orders_price_by_priority": ansi_sql_quantile_sketch(
            "orders", "o_totalprice", ["o_orderpriority"], QS, ALPHA, round_digits=ROUND
        ),
        "dedup_exact_fingerprint": r"""
            SELECT md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g')) AS fp,
                   MIN(doc_id) AS keep_id,
                   COUNT(*) AS dup_count
            FROM documents GROUP BY 1
        """,
        "text_stats_by_lang": r"""
            WITH per_doc AS (
              SELECT lang,
                     CASE WHEN trim(text) = '' THEN 0
                          ELSE len(string_split_regex(trim(text), '\s+')) END AS tc,
                     CASE WHEN length(text) = 0 THEN 0.0
                          ELSE CAST(length(regexp_replace(text, '[^.,;:!?''"()\[\]{}-]+', '', 'g')) AS DOUBLE) / length(text) END AS pr,
                     CASE WHEN length(text) = 0 THEN 0.0
                          ELSE CAST(length(regexp_replace(text, '[^0-9]+', '', 'g')) AS DOUBLE) / length(text) END AS dr
              FROM documents
            )
            SELECT lang,
                   CAST(COUNT(*) AS DOUBLE) AS n_docs,
                   CAST(SUM(tc) AS DOUBLE) AS total_tokens,
                   ROUND(AVG(tc), 6) AS avg_tokens,
                   ROUND(AVG(pr), 6) AS avg_punct_ratio,
                   ROUND(AVG(dr), 6) AS avg_digit_ratio
            FROM per_doc GROUP BY lang
        """,
        "text_quality_hist": r"""
            WITH q AS (
              SELECT ROUND(
                LEAST(CAST(length(text) AS DOUBLE) / 500.0, 1.0)
                * (1.0 - 0.5 * LEAST(CASE WHEN length(text) = 0 THEN 0.0
                     ELSE CAST(length(regexp_replace(text, '[^.,;:!?''"()\[\]{}-]+', '', 'g')) AS DOUBLE) / length(text) END * 4.0, 1.0))
                * (1.0 - 0.5 * LEAST(CASE WHEN length(text) = 0 THEN 0.0
                     ELSE CAST(length(regexp_replace(text, '[^0-9]+', '', 'g')) AS DOUBLE) / length(text) END * 4.0, 1.0))
                * (1.0 - CASE WHEN (CASE WHEN trim(text) = '' THEN 0
                     ELSE len(string_split_regex(trim(text), '\s+')) END) = 0 THEN 1.0 ELSE 0.0 END),
                6) AS quality
              FROM documents
            )
            SELECT CAST(FLOOR(quality * 10) AS BIGINT) AS bucket,
                   CAST(COUNT(*) AS DOUBLE) AS n_docs
            FROM q GROUP BY 1
        """,
        "text_lang_id_counts": _lang_id_oracle_sql(),
        "dedup_jaccard_pairs": r"""
            WITH toks AS (
              SELECT doc_id AS id,
                     string_split(regexp_replace(trim(lower(text)), '\s+', ' ', 'g'), ' ') AS t
              FROM documents WHERE doc_id < 150
            ),
            sh AS (
              SELECT DISTINCT id, t[i] || ' ' || t[i+1] AS shingle
              FROM toks, UNNEST(generate_series(1, len(t) - 1)) AS u(i)
              WHERE len(t) >= 2
            ),
            sizes AS (SELECT id, COUNT(*) AS sz FROM sh GROUP BY id),
            inter AS (
              SELECT a.id AS id_a, b.id AS id_b, COUNT(*) AS i
              FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.id < b.id
              GROUP BY 1, 2
            )
            SELECT id_a, id_b,
                   ROUND(CAST(i AS DOUBLE) / (sa.sz + sb.sz - i), 6) AS jaccard
            FROM inter
            JOIN sizes sa ON sa.id = id_a
            JOIN sizes sb ON sb.id = id_b
            WHERE ROUND(CAST(i AS DOUBLE) / (sa.sz + sb.sz - i), 6) >= 0.05
        """,
        "ann_cosine_topk": r"""
            WITH v AS (
              SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e
              FROM embeddings
            ),
            u AS (
              SELECT vec_id,
                     list_transform(e, x -> x / sqrt(list_dot_product(e, e))) AS uv
              FROM v
            ),
            p AS (
              SELECT q.vec_id AS qid, c.vec_id AS nid,
                     ROUND(list_dot_product(c.uv, q.uv), 6) AS cosine
              FROM u c, u q
              WHERE q.vec_id < 5 AND c.vec_id != q.vec_id
            ),
            r AS (
              SELECT qid, nid, cosine,
                     CAST(ROW_NUMBER() OVER (PARTITION BY qid ORDER BY cosine DESC, nid ASC) AS INT) AS rank
              FROM p
            )
            SELECT qid, nid, rank, cosine FROM r WHERE rank <= 5
        """,
        "multimodal_byte_plumbing": """
            SELECT doc_id, CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes
            FROM documents
        """,
        "exact_distinct_users_by_type": """
            SELECT event_type, COUNT(DISTINCT user_id) AS exact_users
            FROM events GROUP BY event_type
        """,
        "ddsketch_rollup_chars": (
            "SELECT * FROM ("
            + ansi_sql_quantile_sketch(
                "documents", "n_chars", ["lang"], QS, ALPHA, round_digits=ROUND
            )
            + ") UNION ALL SELECT CAST(NULL AS VARCHAR) AS lang, * FROM ("
            + ansi_sql_quantile_sketch(
                "documents", "n_chars", None, QS, ALPHA, round_digits=ROUND
            )
            + ")"
        ),
    }


def _lang_id_oracle_sql() -> str:
    from ddspark.pipeline.textops import LANG_MARKERS

    hit_exprs = {}
    for lang, words in sorted(LANG_MARKERS.items()):
        parts = [
            f"CAST((length(p) - length(replace(p, ' {w} ', ''))) / {len(w) + 2} AS INT)"
            for w in words
        ]
        hit_exprs[lang] = " + ".join(parts)
    hits_sel = ",\n       ".join(f"{e} AS h_{lang}" for lang, e in hit_exprs.items())
    langs = sorted(LANG_MARKERS)
    best = "GREATEST(" + ", ".join(f"h_{lang}" for lang in langs) + ")"
    case = "CASE WHEN " + best + " = 0 THEN 'und' "
    for lang in langs:
        case += f"WHEN h_{lang} = {best} THEN '{lang}' "
    case += "END"
    return rf"""
WITH padded AS (
  SELECT ' ' || regexp_replace(lower(text), '\s+', '  ', 'g') || ' ' AS p
  FROM documents
),
hits AS (
  SELECT {hits_sel} FROM padded
)
SELECT {case} AS pred_lang, CAST(COUNT(*) AS DOUBLE) AS n_docs
FROM hits GROUP BY 1
""".strip()
