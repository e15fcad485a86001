"""End-to-end composition: the full pretraining-data recipe chained over
one DataFrame lineage — the 'a user of the reference could switch' test.

read corpus -> boilerplate-line cleanup -> exact dedup -> benchmark
decontamination -> quality/repetition filtering -> deterministic split ->
per-split per-lang quantile sketch.  Everything is one lazy plan per stage;
no collect() until the final assertions.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from ddspark.agg import quantile_sketch
from ddspark.pipeline.curation import decontaminate, hash_split, repetition_stats
from ddspark.pipeline.dedup import exact_dedup
from ddspark.pipeline.textops import drop_boilerplate_lines, quality_score
from ddspark.sketch import SketchConfig

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF_DIR}/documents.parquet")


def test_full_recipe(spark, docs):
    n0 = docs.count()

    # 1. corpus-level boilerplate line removal (word granularity here)
    cleaned = drop_boilerplate_lines(docs, sep=" ", max_doc_freq=n0)
    base = docs.select("doc_id", "lang").join(cleaned, "doc_id")
    assert base.count() == n0  # nothing ubiquitous at this cap: lossless

    # 2. exact dedup -> keeper set
    keepers = exact_dedup(base).select(F.col("keep_id").alias("doc_id"))
    deduped = base.join(keepers, "doc_id")
    n_dedup = deduped.count()
    assert 0 < n_dedup <= n0

    # 3. decontamination against a held-out "benchmark" slice
    bench = deduped.where(F.col("doc_id") % 17 == 0)
    corpus = deduped.where(F.col("doc_id") % 17 != 0)
    flags = decontaminate(corpus, bench, n=5)
    clean = corpus.join(
        flags.where(~F.col("contaminated")).select("doc_id"), "doc_id"
    )
    assert clean.count() <= corpus.count()

    # 4. quality + repetition gates
    rep = repetition_stats(clean)
    gated = (
        clean.join(rep.select("doc_id", "dup_word_frac"), "doc_id")
        .where(F.col("dup_word_frac") < 0.99)
        .where(quality_score(F.col("text")) > 0.0)
    )

    # 5. deterministic split
    split = hash_split(gated, "doc_id")
    per_split = dict(
        split.groupBy("split").count().rdd.map(tuple).collect()
    )
    assert set(per_split) <= {"train", "val", "test"}
    assert per_split.get("train", 0) > per_split.get("val", 0)

    # 6. per-(split, lang) length quantiles through the sketch engine
    final = quantile_sketch(
        split.withColumn("n_chars", F.length("text")),
        "n_chars",
        by=["split", "lang"],
        qs=[0.5, 0.95],
        cfg=SketchConfig(0.02),
    )
    rows = final.collect()
    assert len(rows) >= 2
    assert all(r["count"] > 0 for r in rows)
    # exact stats survive the whole chain: totals reconcile
    assert sum(r["count"] for r in rows) == split.count()
    # estimates are ordered and positive
    assert all(0 < r["p50"] <= r["p95"] for r in rows)


def test_recipe_is_deterministic(spark, docs):
    """The same chain at different parallelism yields identical final
    counts (hash split + hash dedup + hash decontam are all
    partition-independent)."""

    def run(df):
        keep = exact_dedup(df).select(F.col("keep_id").alias("doc_id"))
        d = df.join(keep, "doc_id")
        s = hash_split(d, "doc_id")
        return sorted(
            map(tuple, s.groupBy("split", "lang").count().collect())
        )

    assert run(docs) == run(docs.repartition(23))
