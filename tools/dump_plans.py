"""Dump the formatted physical plans of the flagship pipelines to PLANS.md —
the evidence trail that scans prune, filters push down, and the hot path
stays inside whole-stage codegen.

Usage: python tools/dump_plans.py
"""

from __future__ import annotations

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import functions as F

from ddspark.agg import build_cells, quantile_sketch
from ddspark.session import get_spark
from ddspark.sketch import SketchConfig
from ddspark.sqlpath import sql_quantile_sketch

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def formatted(df) -> str:
    jvm = df.sparkSession._jvm
    return jvm.org.apache.spark.sql.api.python.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


def main() -> None:
    spark = get_spark(app_name="plans", cores=8)
    li = spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
    cfg = SketchConfig(0.01)

    sections = []

    cells = build_cells(
        li.where(F.col("l_extendedprice") > 0), "l_extendedprice", ["l_returnflag"], cfg
    )
    sections.append(
        (
            "Cells stage (scan -> key expr -> hash agg), the 99% of work",
            "Things to check: ReadSchema prunes to the two referenced columns; "
            "PushedFilters carries the price predicate to parquet; every node "
            "up to the exchange sits inside WholeStageCodegen; the exchange "
            "moves only the aggregated cells.",
            formatted(cells),
        )
    )

    full = quantile_sketch(
        li.where(F.col("l_extendedprice") > 0),
        "l_extendedprice",
        ["l_returnflag"],
        [0.5, 0.99],
        cfg,
    )
    sections.append(
        (
            "Full flagship pipeline (cells + JVM finalize)",
            "No Python node anywhere: partial+final HashAggregate builds the "
            "cells, one window (running count over buckets, ordered by "
            "(sgn, sgn*k)) + one final HashAggregate extracts quantiles and "
            "exact stats.  The window input is bucket cells, never rows, so "
            "the sort is O(groups x live-buckets).",
            formatted(full),
        )
    )

    from ddspark.store import COLLAPSE_LOWEST

    coll = quantile_sketch(
        li.where(F.col("l_extendedprice") > 0),
        "l_extendedprice",
        ["l_returnflag"],
        [0.5, 0.99],
        SketchConfig(0.05, mode=COLLAPSE_LOWEST, bin_limit=128),
    )
    sections.append(
        (
            "Collapsing store finalize (round 3: one exchange, not two)",
            "The bucket-limit clamp bounds are per-sign conditional extremes "
            "computed inside the SAME group-partitioned window as the rank "
            "walk, so collapsing adds zero exchanges over the plain plan: "
            "exactly one cells exchange + one window exchange, same as "
            "non-collapsing.  (Until r3 the clamp ran its own (group, sign) "
            "window pass plus a re-aggregation — a third exchange.)",
            formatted(coll),
        )
    )

    sql = sql_quantile_sketch(li, "l_quantity", ["l_linestatus"], [0.5, 0.99], 0.05)
    sections.append(
        (
            "Pure-SQL path (zero Python)",
            "No *Python* nodes anywhere; window runs over bucket counts.",
            formatted(sql),
        )
    )

    lin = quantile_sketch(
        li.where(F.col("l_extendedprice") > 0),
        "l_extendedprice",
        ["l_returnflag"],
        [0.5, 0.99],
        SketchConfig(0.01, mapping="linear"),
    )
    sections.append(
        (
            "Interpolated mapping through the cells engine (round 2)",
            "The corrected-frexp key (FLOOR(LOG2) + one-bucket fix, exact "
            "scaling) keeps even the linear/cubic mappings inside whole-stage "
            "codegen — still no Python node.",
            formatted(lin),
        )
    )

    from ddspark.pipeline.curation import decontaminate, hash_split

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    split = hash_split(docs.select("doc_id", "lang"), "doc_id")
    sections.append(
        (
            "Curation hash split (round 2)",
            "Pure projection: the split assignment is one md5 expression per "
            "row inside WholeStageCodegen — no Exchange anywhere, so the "
            "operator adds zero shuffle to any pipeline it composes with.",
            formatted(split),
        )
    )

    dec = decontaminate(
        docs.where(F.col("doc_id") % 10 != 0),
        docs.where(F.col("doc_id") % 10 == 0),
        n=5,
    )
    sections.append(
        (
            "Decontamination (round 2)",
            "Things to check: the benchmark gram set enters through a "
            "BroadcastExchange/BroadcastHashJoin (the 100 TB corpus side "
            "never shuffles for the membership test); grams travel as "
            "xxhash64 longs, never strings; the only wide exchanges key on "
            "the gram hash (partial agg) and the unique doc id.",
            formatted(dec),
        )
    )

    from ddspark.pipeline.curation import pack_sequences

    pack = pack_sequences(docs, "n_chars", max_tokens=4096, n_buckets=64)
    sections.append(
        (
            "Sequence packing (round 2)",
            "Things to check: exactly ONE Exchange, keyed on the md5 bucket "
            "(64 independent streams — parallelism is n_buckets, not 1); the "
            "running sum is a bounded-frame window over each stream; scan "
            "pruned to (doc_id, n_chars).",
            formatted(pack),
        )
    )

    from ddspark.sketches.bloom import bloom_prefilter

    bp = bloom_prefilter(
        li.select("l_orderkey", "l_extendedprice"),
        docs.select((F.col("doc_id") * 13).alias("l_orderkey")),
        "l_orderkey",
        m=1 << 18,
    )
    sections.append(
        (
            "Bloom semi-join reduction (round 3)",
            "Things to check: the big side carries ZERO hash exchanges and "
            "zero Python stages — the dense Bloom word array enters through "
            "a one-row BroadcastNestedLoopJoin (its source is the driver's "
            "one-row local relation; the applySchemaToPythonRDD line below "
            "is that single row, not a per-row stage) and the k probes are "
            "pure shift/mask expressions inside WholeStageCodegen, so the "
            "prefilter runs at scan speed before any join shuffle.",
            formatted(bp),
        )
    )

    from ddspark.agg import quantile_sketch_multi

    multi = quantile_sketch_multi(
        li.where(F.col("l_extendedprice") > 0),
        ["l_extendedprice", "l_quantity"],
        ["l_returnflag"],
        [0.5, 0.99],
        SketchConfig(0.05),
    )
    sections.append(
        (
            "Multi-metric single-scan sketch (round 3)",
            "Things to check: exactly ONE parquet scan feeds both metrics "
            "(the tagged explode runs inside the scan's WholeStageCodegen); "
            "the rest is the normal fused cells pipeline with the metric "
            "tag as an extra group key — at 100 TB this halves corpus I/O "
            "for every extra metric.",
            formatted(multi),
        )
    )

    from ddspark.pipeline.dedup import dedup_paragraphs

    para = dedup_paragraphs(docs, sep=" ")
    sections.append(
        (
            "Corpus-wide paragraph dedup (round 3)",
            "Things to check: paragraphs shuffle as xxhash64 longs, never "
            "strings, into a partial+final HashAggregate (map-side combine "
            "absorbs a mega-duplicated paragraph — no window over the hot "
            "hash); ONE join carries the keep decision; the only other "
            "exchanges key on the unique doc id for the ordered rebuild.",
            formatted(para),
        )
    )

    import tempfile

    from ddspark.io import read_bucketed, write_bucketed

    with tempfile.TemporaryDirectory() as td:
        write_bucketed(docs.select("doc_id", "lang"), "plans_bkt_a", ["doc_id"],
                       num_buckets=8, sort_cols=["doc_id"], path=f"{td}/a")
        write_bucketed(docs.select("doc_id", "n_chars"), "plans_bkt_b", ["doc_id"],
                       num_buckets=8, sort_cols=["doc_id"], path=f"{td}/b")
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        j = read_bucketed(spark, "plans_bkt_a").join(
            read_bucketed(spark, "plans_bkt_b"), "doc_id"
        )
        sections.append(
            (
                "Co-bucketed join (round 3)",
                "Things to check: ZERO Exchange nodes — both scans report "
                "the bucket spec as HashPartitioning(doc_id, 8), so the "
                "sort-merge join runs partition-local.  At 100 TB this is "
                "the shape for every repeated per-document join: bucket the "
                "corpus and its side tables by doc_id once, never shuffle "
                "them again.",
                formatted(j),
            )
        )
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
        write_bucketed(docs.select("doc_id", "lang", "n_chars"), "plans_bkt_s",
                       ["lang"], num_buckets=8, path=f"{td}/s")
        bq = quantile_sketch(
            read_bucketed(spark, "plans_bkt_s"), "n_chars", ["lang"],
            [0.5, 0.99], SketchConfig(0.01),
        )
        sections.append(
            (
                "Quantile sketch over a bucketed corpus (round 3): ZERO exchanges",
                "Bucket the corpus by the grouping key once and the entire "
                "sketch pipeline is shuffle-free: the scan's "
                "HashPartitioning(lang, 8) clusters (lang, sgn, k) for the "
                "cells aggregation and (lang) for the rank-walk window, so "
                "no Exchange node appears anywhere.  In production bucket "
                "by a high-cardinality key (repo, domain); this demos the "
                "mechanics.",
                formatted(bq),
            )
        )
        from ddspark.pipeline.dedup import (
            apply_keepers,
            dedup_keepers,
            lsh_candidate_pairs,
            minhash_signatures,
        )

        ddocs = docs.select("doc_id", "text")
        sigs = minhash_signatures(ddocs, "doc_id", "text", n=2, num_hashes=16) \
            .withColumnRenamed("id", "doc_id")
        pairs = lsh_candidate_pairs(
            sigs.withColumnRenamed("doc_id", "id"), bands=8, rows_per_band=2
        )
        keepers = dedup_keepers(ddocs, pairs)
        write_bucketed(ddocs, "plans_dd_c", ["doc_id"], num_buckets=8,
                       sort_cols=["doc_id"], path=f"{td}/ddc")
        write_bucketed(keepers, "plans_dd_k", ["doc_id"], num_buckets=8,
                       sort_cols=["doc_id"], path=f"{td}/ddk")
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        kept = apply_keepers(
            read_bucketed(spark, "plans_dd_c"), read_bucketed(spark, "plans_dd_k")
        )
        sections.append(
            (
                "Co-bucketed dedup pipeline (round 4): keeper semi-join, "
                "ZERO exchanges",
                "The keeper semi-join is where a 100 TB dedup run pays its "
                "biggest shuffle — the full corpus repartitioned by doc_id "
                "just to drop the losers.  With the corpus and the "
                "dedup_keepers verdict table co-bucketed by doc_id, both "
                "scans report HashPartitioning(doc_id, 8) and the "
                "sort-merge LeftSemi join runs partition-local: no "
                "Exchange node anywhere.  The minhash-signature side "
                "table buckets the same way, making attach-signature "
                "joins exchange-free too (plan pytest: "
                "test_cobucketed_dedup_pipeline_joins_are_exchange_free).",
                formatted(kept),
            )
        )
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
        spark.sql("DROP TABLE IF EXISTS plans_bkt_a")
        spark.sql("DROP TABLE IF EXISTS plans_bkt_b")
        spark.sql("DROP TABLE IF EXISTS plans_bkt_s")
        spark.sql("DROP TABLE IF EXISTS plans_dd_c")
        spark.sql("DROP TABLE IF EXISTS plans_dd_k")

    from ddspark.pipeline.curation import gopher_quality

    gq = gopher_quality(docs)
    sections.append(
        (
            "Gopher quality rules (round 5): map-only",
            "Things to check: NO Exchange and no Python node anywhere — the "
            "token and line arrays materialize once in a projection, every "
            "rule is one higher-order-function pass over the in-memory "
            "array, and the whole filter runs inside the scan's "
            "WholeStageCodegen stage.  At 100 TB this operator adds zero "
            "shuffle to any pipeline it composes with (same shape as "
            "hash_split); c4_clean compiles to the same map-only form.",
            formatted(gq),
        )
    )

    from ddspark.pipeline.dedup import duplicated_spans

    spans = duplicated_spans(docs, n=8)
    sections.append(
        (
            "Exact substring-span dedup (round 5)",
            "Things to check: windows travel as xxhash64 longs, never gram "
            "strings; the global occurrence count is a partial+final "
            "HashAggregate on the hash (map-side combine absorbs hot "
            "grams); ONE hash-keyed join marks duplicated positions; the "
            "gaps-and-islands merge runs two window functions over the "
            "SAME (doc_id, pos) sort — Spark plans a single Exchange + "
            "Sort for both, and the key includes the unique doc id so it "
            "cannot skew.",
            formatted(spans),
        )
    )

    from ddspark.pipeline.curation import chunk_documents

    chunks = chunk_documents(docs, chunk_tokens=40, overlap=8)
    sections.append(
        (
            "Sliding-window document chunking (round 5): map-only",
            "Things to check: NO Exchange and no Python node — tokenization "
            "materializes once in a projection (the higher-order-lambda CSE "
            "lesson), the chunk count is closed-form arithmetic feeding one "
            "sequence/Generate (explode), and each chunk is a single "
            "slice+concat_ws.  Generate sits inside the same stage as the "
            "scan, so at 100 TB chunking adds zero shuffle before packing.",
            formatted(chunks),
        )
    )

    from ddspark.pipeline.html import html_to_text
    from ddspark.io import zorder_key

    html = docs.select(
        "doc_id",
        html_to_text(
            F.concat(F.lit("<p>"), F.col("text"), F.lit("</p>"))
        ).alias("txt"),
    )
    sections.append(
        (
            "HTML -> text extraction (round 5): regexp chain in codegen",
            "Things to check: the whole rule cascade is ONE Project of "
            "nested regexp_replace/replace calls inside the scan's "
            "WholeStageCodegen — no Exchange, no Python, ReadSchema prunes "
            "to (doc_id, text).  Extraction runs at scan speed on a crawl.",
            formatted(html),
        )
    )

    ev = spark.read.parquet(f"{SF_DIR}/events.parquet")
    zdf = ev.select(
        zorder_key(
            F.col("user_id").bitwiseAND(F.lit(65535)),
            F.col("event_id").bitwiseAND(F.lit(65535)),
        ).alias("z")
    )
    sections.append(
        (
            "Z-order key (round 5): shift/mask interleave in codegen",
            "Things to check: the Morton interleave is a single Project of "
            "shift/and/or arithmetic — pure whole-stage codegen, 2-column "
            "ReadSchema.  write_zordered adds only the one range Exchange "
            "any layout rewrite needs; the payoff is 2-D parquet min/max "
            "file skipping (measured in tests/test_zorder.py).",
            formatted(zdf),
        )
    )

    from ddspark.pipeline.joins import asof_join, range_join

    signup = ev.where(F.col("event_type") == "signup").select(
        "user_id", "ts", "value"
    )
    asof = asof_join(ev, signup, on="user_id", left_ts="ts")
    sections.append(
        (
            "As-of join (round 5): one keyed shuffle, no self-join",
            "Things to check: exactly ONE Exchange (hashpartitioning on "
            "user_id) feeding one Sort + one Window of running "
            "last(ignorenulls) — the sort-merge-join shape without a join "
            "node.  A windowed-self-join formulation would shuffle both "
            "sides twice and re-sort; this unions them into one pass.",
            formatted(asof),
        )
    )

    us = F.expr(
        "timestampdiff(MICROSECOND, TIMESTAMP_NTZ '1970-01-01 00:00:00', ts)"
    )
    rj = range_join(
        ev.select("event_type", "user_id", us.alias("x")),
        signup.select(
            "user_id", us.alias("lo"), (us + F.lit(172_800_000_000)).alias("hi")
        ),
        "x", "lo", "hi", on="user_id", bucket=86_400_000_000.0,
    )
    sections.append(
        (
            "Bucketed range join (round 5): equi-join, not a cartesian",
            "Things to check: the interval side carries one Generate "
            "(explode of the covering buckets) and the join is a plain "
            "hash/sort-merge join on (user_id, bucket) with the BETWEEN "
            "predicate as a join filter — no BroadcastNestedLoopJoin / "
            "CartesianProduct node anywhere.  AQE can still broadcast or "
            "skew-split it like any equi-join.",
            formatted(rj),
        )
    )

    from ddspark.io import latest_snapshot, merge_upsert

    chg = ev.select(
        "user_id", "event_id", "event_type",
        (F.col("event_type") == "error").alias("del"),
    )
    base = latest_snapshot(
        chg.where(F.col("event_id") % 3 != 0), "user_id", "event_id",
        delete_col="del",
    )
    ups = latest_snapshot(
        chg.where(F.col("event_id") % 3 == 0), "user_id", "event_id"
    )
    mrg = merge_upsert(base, ups, "user_id", delete_col="del")
    sections.append(
        (
            "MERGE upsert (round 5): zero joins",
            "Things to check: NO Join node anywhere — base and compacted "
            "updates Union under a priority tag and ONE max-struct "
            "HashAggregate (partial+final) picks the winner per key; the "
            "duplicate-key guards live in the Filter above it.  A "
            "MERGE-shaped full-outer join would shuffle and sort both "
            "sides; this is one exchange of candidate rows.",
            formatted(mrg),
        )
    )

    from ddspark.timeseries import downsample_multi

    ds = downsample_multi(
        ev, "ts", "value", resolutions=("hour", "day", "week")
    )
    sections.append(
        (
            "Multi-resolution downsample (round 5): one scan, one Exchange",
            "Things to check: a single FileScan feeds Expand (x3 for three "
            "resolutions) and the partial HashAggregate runs ABOVE Expand "
            "but BELOW the single Exchange — the shuffle moves only "
            "aggregated cells.  Three separate GROUP BY jobs would cost "
            "three scans.",
            formatted(ds),
        )
    )

    out = ["# PLANS — formatted physical plans of the flagship pipelines\n"]
    out.append("Generated by `python tools/dump_plans.py` against " + SF_DIR + ".\n")
    for title, note, plan in sections:
        out.append(f"\n## {title}\n\n{note}\n\n```\n{plan}\n```\n")
    with open(os.path.join(REPO, "PLANS.md"), "w") as fh:
        fh.write("".join(out))
    print("wrote PLANS.md")
    spark.stop()


if __name__ == "__main__":
    main()
