"""High-cardinality grouping: the north star asks for per-repo percentiles —
thousands-to-millions of groups.  The cells engine must stay correct and the
cell count must stay bounded by groups x live-buckets."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from ddspark.agg import build_cells, quantile_label, quantile_sketch
from ddspark.corpus import generate_corpus
from ddspark.datasets import exact_quantile
from ddspark.sketch import SketchConfig

ALPHA = 0.01


def test_per_repo_quantiles_many_groups(spark):
    rng = np.random.default_rng(23)
    n = 60_000
    n_groups = 5_000
    pdf = pd.DataFrame(
        {
            "repo": [f"org{i % 97}/repo{i % n_groups}" for i in rng.integers(0, 10**9, n) % n_groups],
            "v": np.round(rng.lognormal(4, 1.2, n)),
        }
    )
    df = spark.createDataFrame(pdf).repartition(16)
    cfg = SketchConfig(ALPHA)
    res = quantile_sketch(df, "v", ["repo"], [0.5, 0.99], cfg).toPandas()
    assert len(res) == pdf["repo"].nunique()
    # spot-check 50 groups against the exact oracle
    sample = res.sample(50, random_state=1)
    by_repo = pdf.groupby("repo")["v"]
    for rec in sample.to_dict("records"):
        vals = by_repo.get_group(rec["repo"]).to_numpy(np.float64)
        assert rec["count"] == len(vals)
        for q in [0.5, 0.99]:
            exact = exact_quantile(vals, q)
            assert abs(rec[quantile_label(q)] - exact) <= ALPHA * abs(exact) + 1e-15
    # shuffle volume: cells bounded by sum over groups of live buckets
    n_cells = build_cells(df, "v", ["repo"], cfg).count()
    assert n_cells < n  # strictly fewer cells than rows (map-side combine won)


def test_corpus_line_count_quantiles(spark):
    """North-star metric #2: per-lang line_count percentiles over the
    source-code corpus, derived in-engine from content."""
    corpus = generate_corpus(spark, 4000, parts=8)
    df = corpus.withColumn(
        "line_count",
        F.when(F.length("content") == 0, F.lit(0.0)).otherwise(
            (F.size(F.split("content", "\n", -1)) ).cast("double")
        ),
    )
    res = quantile_sketch(
        df, "line_count", ["lang"], [0.5, 0.95], SketchConfig(ALPHA)
    ).toPandas()
    pdf = df.select("lang", "line_count").toPandas()
    assert res["count"].sum() == 4000
    top = res.sort_values("count", ascending=False).head(5)
    for rec in top.to_dict("records"):
        vals = pdf[pdf["lang"] == rec["lang"]]["line_count"].to_numpy(np.float64)
        for q in [0.5, 0.95]:
            exact = exact_quantile(vals, q)
            assert abs(rec[quantile_label(q)] - exact) <= ALPHA * abs(exact) + 1e-15
    # zero-length docs land in zero_count, not in a log bucket
    assert (pdf["line_count"] == 0).sum() >= 0


def test_north_star_multi_metric_single_scan(spark):
    """The full north-star query shape: content_length AND line_count
    percentiles per (lang, repo) from ONE corpus scan, every estimate
    within alpha of the exact rank value."""
    from ddspark.agg import quantile_sketch_multi

    corpus = generate_corpus(spark, 4000, parts=8)
    df = corpus.select(
        "lang",
        "repo",
        F.length("content").cast("double").alias("content_length"),
        F.when(F.length("content") == 0, F.lit(0.0))
        .otherwise(F.size(F.split("content", "\n", -1)).cast("double"))
        .alias("line_count"),
    )
    cfg = SketchConfig(ALPHA)
    res = quantile_sketch_multi(
        df, ["content_length", "line_count"], by=["lang", "repo"],
        qs=[0.5, 0.95], cfg=cfg,
    ).toPandas()
    pdf = df.toPandas()
    assert res["count"].sum() == 2 * 4000  # one tagged row per metric
    # spot-check the 10 biggest (metric, lang, repo) groups vs exact
    top = res.sort_values("count", ascending=False).head(10)
    for rec in top.to_dict("records"):
        sub = pdf[(pdf["lang"] == rec["lang"]) & (pdf["repo"] == rec["repo"])]
        vals = sub[rec["metric"]].to_numpy(np.float64)
        vals = vals[vals > 0]  # zero values land in zero_count
        assert rec["count"] == len(sub)
        for q in [0.5, 0.95]:
            exact = exact_quantile(sub[rec["metric"]].to_numpy(np.float64), q)
            got = rec[quantile_label(q)]
            assert abs(got - exact) <= ALPHA * abs(exact) + 1e-15
