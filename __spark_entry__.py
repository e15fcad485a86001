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


def _ensure_pyfiles(spark: SparkSession) -> None:
    """Ship ddspark to executor Python workers regardless of driver cwd."""
    try:
        from ddspark.session import package_pyfiles

        spark.sparkContext.addPyFile(package_pyfiles())
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
        "ddsketch_orders_price_by_priority": wrap(_q_orders_price_by_priority),
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
        "ddsketch_orders_price_by_priority": ansi_sql_quantile_sketch(
            "orders", "o_totalprice", ["o_orderpriority"], QS, ALPHA, round_digits=ROUND
        ),
    }
