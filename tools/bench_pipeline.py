"""Measure pipeline-operator throughput on a synthetic multi-million-row
corpus (codegen source, no I/O in the loop) — the evidence that the
curation/dedup/sketch operators, not just the flagship quantile pipeline,
hold up at scale.  Appends nothing; prints a markdown table to paste into
BENCH.md.

Usage: python tools/bench_pipeline.py [n_docs]
"""

from __future__ import annotations

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import functions as F

from ddspark.session import get_spark

N = int(sys.argv[1]) if len(sys.argv) > 1 else 4_000_000


def main() -> None:
    spark = get_spark(app_name="bench-pipeline", cores=32)
    spark.sparkContext.setLogLevel("ERROR")

    # synthetic documents: ~12 words each, zipf-ish repetition via modulo
    words = "alpha beta gamma delta epsilon zeta eta theta iota kappa".split()
    word_expr = "array({})".format(
        ", ".join(f"'{w}'" for w in words)
    )
    docs = (
        spark.range(N, numPartitions=64)
        .select(
            F.col("id").alias("doc_id"),
            F.expr(
                f"concat_ws(' ', transform(sequence(0, 11), "
                f"i -> element_at({word_expr}, cast(pmod(id * 7 + i * i, 10) + 1 as int))))"
            ).alias("text"),
            F.expr("element_at(array('en','de','fr','es','zh'), cast(pmod(id, 5) + 1 as int))").alias("lang"),
            (F.pmod(F.col("id") * 37, 5000) + 10).alias("n_chars"),
            F.pmod(F.col("id") * F.col("id"), 997).cast("string").alias("item"),
        )
        .persist()
    )
    docs.count()  # materialize

    def timed(name, fn, warm=1, rows=None):
        for _ in range(warm):
            fn()
        t0 = time.monotonic()
        fn()
        dt = time.monotonic() - t0
        print(f"| {name} | {dt:.2f} | {(rows or N) / dt / 1e6:.1f} M |")

    from ddspark.pipeline.curation import (
        hash_split,
        pack_sequences,
        redact_pii,
        repetition_stats,
    )
    from ddspark.pipeline.dedup import exact_dedup, minhash_signatures
    from ddspark.sketches.mgfreq import mg_summary
    from ddspark.sketches.theta import theta_summary

    print(f"rows = {N}; local[32]; warm pass then timed pass")
    print("| operator | sec | rows/s |")
    print("|---|---|---|")
    timed("hash_split (projection only)", lambda: hash_split(docs).agg(F.count(F.lit(1))).collect())
    timed("redact_pii (3 regex passes + counts)", lambda: redact_pii(docs).agg(F.sum("n_email")).collect())
    timed("pack_sequences (64 streams)", lambda: pack_sequences(docs, "n_chars").agg(F.max("pack_seq")).collect())
    timed("exact_dedup (md5 groupBy)", lambda: exact_dedup(docs).agg(F.count(F.lit(1))).collect())
    timed("repetition_stats (2 gram aggs)", lambda: repetition_stats(docs).agg(F.avg("dup_word_frac")).collect())
    timed("minhash_signatures (64 perms)", lambda: minhash_signatures(docs, num_hashes=64).agg(F.count(F.lit(1))).collect())
    timed("theta_summary (k=4096, global)", lambda: theta_summary(docs, "item", k=4096).collect())
    timed("mg_summary (k=256, global)", lambda: mg_summary(docs, "item", k=256).collect())

    from ddspark.pipeline.dedup import dedup_paragraphs
    from ddspark.pipeline.multimodal import (
        audio_stats,
        decode_stats,
        synth_audio,
        synth_images,
    )
    from ddspark.pipeline.textops import compression_ratio

    ids = docs.select("doc_id").persist()
    ids.count()
    timed(
        "dedup_paragraphs (word granularity, r3)",
        lambda: dedup_paragraphs(docs, sep=" ").agg(F.sum(F.length("text"))).collect(),
    )
    timed(
        "compression_ratio (zlib via Arrow, r3)",
        lambda: compression_ratio(docs).agg(F.avg("ratio")).collect(),
    )
    timed(
        "image synth+decode (7x5 BMP codec, r3)",
        lambda: decode_stats(synth_images(ids)).agg(F.sum("sum_r")).collect(),
    )
    timed(
        "audio synth+decode (480-sample WAV, r3)",
        lambda: audio_stats(synth_audio(ids)).agg(F.sum("sum_sq")).collect(),
    )
    from ddspark.pipeline.multimodal import synth_tile_jpegs

    timed(
        "image synth+decode (6x4 PNG codec, r4)",
        lambda: decode_stats(
            synth_images(ids, width=6, height=4, fmt="png")
        ).agg(F.sum("sum_r")).collect(),
    )
    timed(
        "image synth+decode (16x16 baseline JPEG codec, r4)",
        lambda: decode_stats(synth_tile_jpegs(ids)).agg(F.sum("sum_r")).collect(),
    )

    from ddspark.sketches.bloom import bloom_prefilter

    big = spark.range(N, numPartitions=64).select(
        (F.col("id") % 10_000_000).alias("key"), F.col("id").alias("payload")
    )
    keys = spark.range(0, 100_000).select((F.col("id") * 97).alias("key"))
    timed(
        "bloom_prefilter (m=2^22, k=5, 100k-key side, r3)",
        lambda: bloom_prefilter(big, keys, "key", m=1 << 22, k=5)
        .agg(F.count(F.lit(1)))
        .collect(),
    )

    from ddspark.pipeline.curation import c4_clean, gopher_quality, quality_funnel
    from ddspark.pipeline.dedup import duplicated_spans

    timed(
        "gopher_quality (7 rules, map-only, r5)",
        lambda: gopher_quality(docs).agg(F.sum(F.col("keep").cast("int"))).collect(),
    )
    timed(
        "c4_clean (line rules, map-only, r5)",
        lambda: c4_clean(docs).agg(F.sum("n_kept")).collect(),
    )
    timed(
        "duplicated_spans (n=8 windows, r5)",
        lambda: duplicated_spans(docs, n=8).agg(F.count(F.lit(1))).collect(),
    )
    timed(
        "quality_funnel (4-stage chain, r5)",
        lambda: quality_funnel(docs).collect(),
    )

    from ddspark.pipeline.ann import quantize_embeddings
    from ddspark.pipeline.multimodal import audio_features

    vecs = spark.range(N // 4, numPartitions=64).select(
        F.col("id").alias("vec_id"),
        F.expr(
            "transform(sequence(0, 63), i -> cast(sin(id * 0.37 + i) as float))"
        ).alias("embedding"),
    )
    timed(
        "quantize_embeddings (dim 64, map-only, r5)",
        lambda: quantize_embeddings(vecs)
        .select(
            F.aggregate(
                "qvec", F.lit(0).cast("long"), lambda a, x: a + x
            ).alias("s")
        )
        .agg(F.sum("s"))
        .collect(),
        rows=N // 4,
    )
    timed(
        "audio_features (480-sample WAV, r5)",
        lambda: audio_features(synth_audio(ids)).agg(F.sum("zero_crossings")).collect(),
    )

    from ddspark.agg import bucket_by_quantiles
    from ddspark.pipeline.graph import pagerank_integer
    from ddspark.pipeline.joins import asof_join, key_profile, range_join
    from ddspark.io import latest_snapshot, merge_upsert
    from ddspark.timeseries import decayed_sum, downsample_multi

    evs = (
        spark.range(N, numPartitions=64)
        .select(
            (F.col("id") % 100_000).alias("k"),
            (F.col("id") * 7 % 1_000_000_000).cast("double").alias("ts"),
            F.col("id").alias("payload"),
            F.expr(
                "timestampadd(SECOND, cast(id % 31536000 as int), "
                "TIMESTAMP_NTZ'2024-01-01 00:00:00')"
            ).alias("tstamp"),
        )
        .persist()
    )
    evs.count()
    snaps = spark.range(N // 40, numPartitions=64).select(
        (F.col("id") % 100_000).alias("k"),
        (F.col("id") * 283 % 1_000_000_000).cast("double").alias("ts"),
        (F.col("id") * 3).alias("price"),
    )
    timed(
        "asof_join (100k keys, 2.5% right side, r5)",
        lambda: asof_join(evs.drop("tstamp"), snaps, "k")
        .agg(F.sum("price"))
        .collect(),
    )
    iv = spark.range(N // 40, numPartitions=64).select(
        (F.col("id") % 100_000).alias("k"),
        (F.col("id") * 283 % 1_000_000_000).cast("double").alias("lo"),
        ((F.col("id") * 283 % 1_000_000_000) + 5_000.0).alias("hi"),
    )
    timed(
        "range_join (bucket=width, 2.5% interval side, r5)",
        lambda: range_join(
            evs.select("k", "ts"), iv, "ts", "lo", "hi", on="k", bucket=5_000.0
        )
        .agg(F.count(F.lit(1)))
        .collect(),
    )
    timed(
        "downsample_multi (hour+day+week, one scan, r5)",
        lambda: downsample_multi(evs, "tstamp", "payload")
        .agg(F.sum("v_sum"))
        .collect(),
    )
    timed(
        "decayed_sum (depth 8 lag chain, 100k keys, r5)",
        lambda: decayed_sum(evs.drop("tstamp"), "k", ["ts", "payload"], "payload")
        .agg(F.sum("decayed"))
        .collect(),
    )
    timed(
        "latest_snapshot (max-struct compaction, 100k keys, r5)",
        lambda: latest_snapshot(evs.drop("tstamp"), "k", "ts")
        .agg(F.sum("payload"))
        .collect(),
    )
    timed(
        "merge_upsert (base N + 2.5% updates, r5)",
        lambda: merge_upsert(
            latest_snapshot(evs.drop("tstamp"), "k", "ts"),
            snaps.withColumnRenamed("price", "payload").groupBy("k").agg(
                F.max("ts").alias("ts"), F.max("payload").alias("payload")
            ),
            "k",
        )
        .agg(F.sum("payload"))
        .collect(),
    )
    timed(
        "bucket_by_quantiles (deciles + assign, r5)",
        lambda: bucket_by_quantiles(evs.drop("tstamp"), "ts", k=10)[0]
        .groupBy("bucket")
        .agg(F.count(F.lit(1)))
        .collect(),
    )
    timed(
        "key_profile (top 25 of 100k keys, r5)",
        lambda: key_profile(evs.drop("tstamp"), "k", top=25).collect(),
    )
    edges = spark.range(4_000_000, numPartitions=64).select(
        (F.col("id") % 100_000).alias("src"),
        (F.col("id") * 131 % 100_000).alias("dst"),
    )
    timed(
        "pagerank_integer (100k nodes, 4M edges, 3 iters, r5)",
        lambda: pagerank_integer(edges, iters=3).agg(F.sum("rank")).collect(),
        rows=4_000_000 * 3,
    )

    # fifth-stretch operators (retrieval / stats / rolling)
    from ddspark.agg import quantile_sketch_rolling
    from ddspark.pipeline.retrieval import bm25_topk, phrase_search
    from ddspark.pipeline.textops import collocations_pmi
    from ddspark.profile import ks_drift, pearson_corr_exact
    from ddspark.sketch import SketchConfig

    timed(
        "phrase_search (2-token phrase, r5)",
        lambda: phrase_search(docs, ["alpha", "beta"])
        .agg(F.sum("n_occ"))
        .collect(),
    )
    timed(
        "bm25_topk (4-term query, k=20, r5)",
        lambda: bm25_topk(docs, ["alpha", "beta", "gamma", "delta"], k=20)
        .collect(),
    )
    timed(
        "collocations_pmi (top 20, r5)",
        lambda: collocations_pmi(docs, "text", k=20, min_count=5).collect(),
    )
    timed(
        "pearson_corr_exact (decimal sums, 100k keys, r5)",
        lambda: pearson_corr_exact(
            evs.drop("tstamp").withColumn("y", F.col("payload") * 2 + F.col("ts")),
            "payload", "y", by=["k"],
        )
        .agg(F.count(F.lit(1)))
        .collect(),
    )
    timed(
        "ks_drift (2 groups over distinct axis, r5)",
        lambda: ks_drift(
            evs.drop("tstamp").withColumn(
                "g", F.when(F.col("k") % 2 == 0, "a").otherwise("b")
            ).withColumn("vb", F.col("payload") % 10_000),
            "vb", "g", "a", "b",
        ).collect(),
    )
    rolled = spark.range(N // 4, numPartitions=64).select(
        (F.col("id") % 5).cast("string").alias("g"),
        F.timestamp_seconds(
            F.lit(1_700_000_000) + (F.col("id") % (30 * 86400))
        ).alias("ts"),
        ((F.col("id") * 7919) % 100_000 + 1).cast("double").alias("v"),
    )
    timed(
        "quantile_sketch_rolling (7-day windows, 30 days, 5 groups, r5)",
        lambda: quantile_sketch_rolling(
            rolled, "v", "ts", ["g"], 7, cfg=SketchConfig(0.02)
        )
        .agg(F.count(F.lit(1)))
        .collect(),
        rows=N // 4,
    )

    # seventh-stretch operators
    from ddspark.events import survival_km
    from ddspark.pipeline.curation import dsir_select
    from ddspark.pipeline.dedup import ngram_novelty
    from ddspark.pipeline.graph import adamic_adar_topk, hits_scores
    from ddspark.pipeline.joins import interval_overlap_join
    from ddspark.pipeline.textops import rake_keywords
    from ddspark.timeseries import cusum_changepoints

    timed(
        "rake_keywords (top 20 corpus phrases, r5)",
        lambda: rake_keywords(docs, top=20).collect(),
    )
    timed(
        "ngram_novelty (trigram df + ratio, r5)",
        lambda: ngram_novelty(docs, n=3).agg(F.sum("n_novel")).collect(),
    )
    timed(
        "dsir_select (4096 buckets, en target slice, r5)",
        lambda: dsir_select(
            docs, docs.where(F.col("lang") == "en").limit(50_000)
        )
        .agg(F.sum("logw_micro"))
        .collect(),
    )
    timed(
        "cusum_changepoints (daily, 100k keys, r5)",
        lambda: cusum_changepoints(evs, "tstamp", "payload", by=["k"])
        .agg(F.sum("s_pos"))
        .collect(),
    )
    timed(
        "survival_km (daily conversion curve, r5)",
        lambda: survival_km(
            evs.select(
                F.col("k").alias("user_id"),
                F.col("tstamp").alias("ts"),
                F.when(F.col("payload") % 3 == 0, "view")
                .when(F.col("payload") % 3 == 1, "purchase")
                .otherwise("other")
                .alias("event_type"),
            ),
            "view",
            "purchase",
        ).collect(),
    )
    timed(
        "adamic_adar_topk (100k nodes, cap 200, r5)",
        lambda: adamic_adar_topk(edges, top=25, max_degree=200)
        .collect(),
        rows=4_000_000,
    )
    timed(
        "hits_scores (100k nodes, 4M edges, 2 iters, r5)",
        lambda: hits_scores(edges, iters=2).agg(F.sum("hub")).collect(),
        rows=4_000_000 * 2,
    )
    ivl = spark.range(N // 40, numPartitions=64).select(
        (F.col("id") % 100_000).alias("k"),
        (F.col("id") * 283 % 1_000_000_000).cast("double").alias("llo"),
        ((F.col("id") * 283 % 1_000_000_000) + 4_000.0).alias("lhi"),
    )
    timed(
        "interval_overlap_join (2.5% x 2.5%, bucket=width, r5)",
        lambda: interval_overlap_join(
            ivl,
            iv.withColumnRenamed("lo", "rlo").withColumnRenamed("hi", "rhi"),
            "llo", "lhi", "rlo", "rhi", on="k", bucket=5_000.0,
        )
        .agg(F.count(F.lit(1)))
        .collect(),
        rows=N // 40,
    )
    from ddspark.pipeline.ann import pq_build, pq_search

    timed(
        "pq_build+search (1M vecs dim 64, m=8 k=16, r5)",
        lambda: (lambda cb_codes: pq_search(
            cb_codes[0], cb_codes[1], vecs.where(F.col("vec_id") < 5),
            dim=64, m=8, top=5,
        ).collect())(pq_build(vecs, dim=64, m=8, k=16, iters=1)),
        warm=0,
        rows=N // 4,
    )
    timed(
        "image synth+decode (7x5 QOI codec, r5)",
        lambda: decode_stats(
            synth_images(ids, fmt="qoi")
        ).agg(F.sum("sum_r")).collect(),
    )
    spark.stop()


if __name__ == "__main__":
    main()
