"""Deployable cluster entry point for the end-to-end corpus curation
pipeline: quality funnel -> near-dup removal -> kept corpus + metrics.

On a real cluster:

    python -m ddspark.session --package   # or: zip the ddspark/ dir
    spark-submit --master yarn --deploy-mode cluster \
        --py-files /tmp/ddspark_pyfiles.zip \
        --num-executors 500 --executor-cores 4 --executor-memory 16g \
        tools/run_curation.py \
        --input  s3://corpus/raw_docs/ \
        --output s3://corpus/curated/ \
        --minhash-threshold 0.7 --df-cap 64

In this sandbox the same script runs against the local testdata:

    python tools/run_curation.py \
        --input /root/testdata/sf0.01/documents.parquet \
        --output /tmp/curated_out

Stages (each a library operator with its own gate query):

1. quality funnel (curation.quality_funnel): exact-dup fingerprint ->
   language-id -> Gopher rules -> repetition; every dropped doc charged
   to its FIRST failing stage, per-stage attrition printed.
2. near-dup removal on the funnel survivors: MinHash-LSH candidates
   (banded, df_cap-guarded) -> connected components -> keep the min doc
   id per duplicate cluster (dedup.dedup_keepers).
3. kept corpus written as parquet (hive-partitioned by lang when the
   column exists) + one JSON metrics line on stdout.

Everything is deterministic (hash-derived randomness only), so a re-run
over the same input produces byte-identical keep decisions — the property
that makes the pipeline auditable and incrementally re-runnable.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("--input", required=True, help="parquet path of raw docs")
    ap.add_argument("--output", required=True, help="parquet path for the kept corpus")
    ap.add_argument("--id-col", default="doc_id")
    ap.add_argument("--text-col", default="text")
    ap.add_argument("--minhash-threshold", type=float, default=0.7)
    ap.add_argument("--df-cap", type=int, default=64,
                    help="hot-shingle document-frequency cap (scale guard)")
    ap.add_argument("--skip-gopher", action="store_true",
                    help="disable the Gopher natural-language rules "
                         "(code corpora and synthetic benchmarks fail "
                         "stopword/mean-word-length heuristics by design)")
    ap.add_argument("--cores", type=int, default=8)
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from ddspark.pipeline.curation import gopher_quality, quality_funnel, repetition_stats
    from ddspark.pipeline.dedup import dedup_keepers, minhash_dedup_pairs
    from ddspark.pipeline.textops import fingerprint, language_id
    from ddspark.session import get_spark

    t0 = time.perf_counter()
    spark = get_spark(app_name="ddspark-curation", cores=args.cores)
    docs = spark.read.parquet(args.input)
    idc, txt = args.id_col, args.text_col

    # per-document keep decision = the same four stages quality_funnel
    # charges attrition to (it returns the per-stage table; the flags
    # recompose here from the same library operators)
    # --skip-gopher expressed as pass-all thresholds so the SAME funnel
    # code path (and its attrition table) stays truthful
    gk = dict(
        min_words=0, max_words=1 << 60, min_mean_len=0.0, max_mean_len=1e18,
        max_symbol_ratio=1e18, max_bullet_frac=1.0, max_ellipsis_frac=1.0,
        min_alpha_frac=0.0, min_stopword_hits=0,
    ) if args.skip_gopher else {}

    fp = docs.select(F.col(idc).alias("id"), fingerprint(F.col(txt)).alias("_fp"))
    first = fp.groupBy("_fp").agg(F.min("id").alias("_keep_id"))
    f1 = fp.join(first, "_fp").select("id", (F.col("id") == F.col("_keep_id")).alias("f1"))
    f2 = docs.select(F.col(idc).alias("id"), (language_id(F.col(txt)) != "und").alias("f2"))
    f3 = gopher_quality(docs, id_col=idc, text_col=txt, **gk).select(
        F.col(idc).alias("id"), F.col("keep").alias("f3"))
    f4 = repetition_stats(docs, id_col=idc, text_col=txt).select(
        F.col(idc).alias("id"), (F.col("dup_word_frac") <= 0.3).alias("f4"))
    kept_ids = (
        f1.join(f2, "id").join(f3, "id").join(f4, "id")
        .where(F.col("f1") & F.col("f2") & F.col("f3") & F.col("f4"))
        .select(F.col("id").alias(idc))
    )
    stage_counts = quality_funnel(docs, id_col=idc, text_col=txt, **gk)
    survivors = docs.join(kept_ids, idc, "left_semi")

    pairs = minhash_dedup_pairs(
        survivors,
        id_col=idc,
        text_col=txt,
        threshold=args.minhash_threshold,
        max_bucket=args.df_cap,
    )
    keepers = dedup_keepers(
        survivors.select(args.id_col), pairs, id_col=args.id_col
    )
    final = survivors.join(
        keepers.where(F.col("keep")).select(args.id_col),
        args.id_col,
        "left_semi",
    )

    n_final = final.count()
    writer = final.write.mode("overwrite")
    if "lang" in final.columns:
        writer = writer.partitionBy("lang")
    writer.parquet(args.output)

    n_in = docs.count()
    n_survivors = survivors.count()
    stages = {r["stage"]: r["dropped"] for r in stage_counts.collect()}
    print(json.dumps({
        "input_docs": n_in,
        "after_quality_funnel": n_survivors,
        "after_neardup_removal": n_final,
        "stage_drops": stages,
        "neardup_removed": n_survivors - n_final,
        "seconds": round(time.perf_counter() - t0, 1),
        "output": args.output,
    }))
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
