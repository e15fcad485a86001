"""Benchmark harness.

Four sections, one JSON line on stdout.  EVERY section is bracketed by a
host-contention probe (steal % + unclaimed idle % from ``/proc/stat`` under
a full-core burn) and runs its measurements as 2 interleaved rounds, so a
regressed number in any section carries its own evidence of whether the
host or the code moved — calibration on this box: identical code reads
scaling efficiency 0.965 at 0.2% steal and 0.73 at 12% steal.

1. **Headline queries** at ``$SPARK_GRAFT_SF_DIR`` (default sf0.1) on
   ``local[$SPARK_GRAFT_CPUS]`` — per-query wall seconds (best of 2
   interleaved rounds); ``value`` is their sum; per-round sums are kept.
2. **Throughput + scaling** (the north rule's two-cluster-size criterion):
   the flagship per-lang quantile-sketch pipeline over a deterministic
   Zipf-skewed corpus parquet, run on ``local-cluster[1,4]`` (N) vs
   ``local-cluster[4,4]`` (4N) — real separate executor JVMs, the closest
   sandbox stand-in for N vs 4N executors.  Reports rows/sec at both
   sizes; the headline ``scaling_efficiency`` is the best PER-ROUND PAIRED
   value (same-round N and 4N share host conditions, so the ratio is
   physically meaningful and cannot exceed ~1 except by noise); the
   cross-round best-of throughputs are kept as separate fields.
3. **Stress shapes** — evidence that group *skew* and group *count* are
   handled, not just the friendly 9-group flagship: (a) 90% of rows in one
   hot key (map-side combine must absorb it), (b) 10^6 distinct groups
   (the vectorized finalizer path; also measured via the pure-JVM sqlpath
   for comparison).  Rows/sec, best of 2 interleaved rounds, per-round
   values kept.

4. **Blob codecs** — decode throughput (images/s and MB/s, plus per-core)
   for BMP, PNG, baseline JPEG, progressive JPEG and MJPEG frame
   split+decode over Arrow-batched ``decode_stats``-shaped stages, with
   the JVM ImageIO route (``decode_stats_jvm``) timed on the SAME images
   written as files — pricing the pure-Python fallback against the
   deployment path side by side.

Tunables: DDSPARK_BENCH_ROWS (default 960M), DDSPARK_BENCH_SCALING=0 to
skip part 2, DDSPARK_BENCH_RUNS (best-of, default 2),
DDSPARK_BENCH_STRESS=0 to skip part 3 (skew / wide-group stress),
DDSPARK_BENCH_BLOB=0 to skip part 4, DDSPARK_BENCH_BLOB_IMAGES
(default 4000).
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)
os.environ.setdefault("SPARK_HOME", "/opt/spark")

from pyspark.sql import SparkSession, functions as F

from ddspark.agg import quantile_sketch, quantile_sketch_collect
from ddspark.session import get_spark, package_pyfiles
from ddspark.sketch import SketchConfig
from ddspark.sqlpath import sql_quantile_sketch
from ddspark.store import COLLAPSE_LOWEST

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
BENCH_ROWS = int(os.environ.get("DDSPARK_BENCH_ROWS", str(960_000_000)))
RUN_SCALING = os.environ.get("DDSPARK_BENCH_SCALING", "1") != "0"
RUN_STRESS = os.environ.get("DDSPARK_BENCH_STRESS", "1") != "0"
RUN_BLOB = os.environ.get("DDSPARK_BENCH_BLOB", "1") != "0"
BLOB_IMAGES = int(os.environ.get("DDSPARK_BENCH_BLOB_IMAGES", "6000"))
BEST_OF = int(os.environ.get("DDSPARK_BENCH_RUNS", "2"))
CORPUS_PATH = os.environ.get(
    "DDSPARK_BENCH_CORPUS", f"/tmp/ddspark_bench_corpus_{BENCH_ROWS}.parquet"
)
QS = [0.5, 0.95, 0.99]

LANG_CASES = (
    "CASE WHEN b < 45 THEN 'python' WHEN b < 65 THEN 'javascript' "
    "WHEN b < 77 THEN 'java' WHEN b < 85 THEN 'c' WHEN b < 90 THEN 'cpp' "
    "WHEN b < 94 THEN 'go' WHEN b < 97 THEN 'rust' WHEN b < 99 THEN 'ruby' "
    "ELSE 'php' END"
)


def ensure_corpus(n: int) -> str:
    """Deterministic Zipf-skewed (lang, content_length) corpus parquet —
    same bytes regardless of who generates it (pure hash expressions).
    A sidecar rows marker prevents reusing a corpus generated for a
    different row count under an env-pinned path."""
    marker = CORPUS_PATH.rstrip("/") + ".rows"
    if os.path.exists(os.path.join(CORPUS_PATH, "_SUCCESS")):
        if os.path.exists(marker):
            with open(marker) as fh:
                if int(fh.read().strip()) == n:
                    return CORPUS_PATH
            raise ValueError(
                f"{CORPUS_PATH} was generated for a different row count; "
                "delete it or change DDSPARK_BENCH_CORPUS"
            )
        return CORPUS_PATH  # pre-existing corpus without marker: trust it
    spark = get_spark(app_name="ddspark-bench-gen", cores=CPUS)
    try:
        (
            spark.range(0, n, 1, 256)
            .withColumn("b", F.pmod(F.xxhash64("id"), F.lit(100)))
            .withColumn("lang", F.expr(LANG_CASES))
            .withColumn(
                "content_length",
                F.floor(
                    F.exp(
                        (F.pmod(F.xxhash64("id", F.lit(1)), F.lit(10_000)) / 10_000.0)
                        * 6.0
                        + 3.0
                    )
                ).cast("double"),
            )
            .select("lang", "content_length")
            .write.mode("overwrite")
            .parquet(CORPUS_PATH)
        )
        with open(marker, "w") as fh:
            fh.write(str(n))
    finally:
        spark.stop()
    return CORPUS_PATH


def flagship(df):
    return quantile_sketch(
        df, "content_length", by=["lang"], qs=QS, cfg=SketchConfig(0.01)
    )


def flagship_collect(df):
    """The scaling workload: driver-finalized flagship (one distributed
    stage pair — scan + cell agg; finalize on KBs of cells locally)."""
    return quantile_sketch_collect(
        df, "content_length", by=["lang"], qs=QS, cfg=SketchConfig(0.01)
    )


def cluster_session(workers: int, cores_per_worker: int) -> SparkSession:
    spark = (
        SparkSession.builder.appName(f"ddspark-bench-{workers}x{cores_per_worker}")
        .master(f"local-cluster[{workers},{cores_per_worker},2560]")
        .config("spark.executor.memory", "2g")
        .config(
            "spark.executor.extraJavaOptions",
            f"-XX:ActiveProcessorCount={cores_per_worker}",
        )
        .config("spark.sql.shuffle.partitions", str(workers * cores_per_worker))
        # fine task grain: stragglers from host noise cost a fraction of a
        # wave, not a whole one (measured: 8m beats 32m by ~12% at 4N)
        .config("spark.sql.files.maxPartitionBytes", "8m")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.addPyFile(package_pyfiles())
    return spark


def throughput_run(
    workers: int, cores_per_worker: int, n: int, runs: int | None = None,
    warmups: int = 2,
) -> float:
    spark = cluster_session(workers, cores_per_worker)
    try:
        df = spark.read.parquet(CORPUS_PATH)
        # untimed passes: page cache + executor JIT + python workers
        for _ in range(warmups):
            flagship_collect(df)
        best = float("inf")
        for _ in range(runs or BEST_OF):
            t0 = time.perf_counter()
            flagship_collect(df)
            best = min(best, time.perf_counter() - t0)
        return n / best
    finally:
        spark.stop()


def headline_queries(spark: SparkSession) -> tuple[dict[str, float], list[float]]:
    li = spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    ev = spark.read.parquet(f"{SF_DIR}/events.parquet")

    suite = {
        "price_by_returnflag": lambda: quantile_sketch(
            li.where(F.col("l_extendedprice") > 0), "l_extendedprice",
            by=["l_returnflag"], qs=QS, cfg=SketchConfig(0.01),
        ),
        "price_global": lambda: quantile_sketch(
            li.where(F.col("l_extendedprice") > 0), "l_extendedprice",
            by=None, qs=QS, cfg=SketchConfig(0.01),
        ),
        "docs_by_lang": lambda: quantile_sketch(
            docs, "n_chars", by=["lang"], qs=QS, cfg=SketchConfig(0.01)
        ),
        "events_collapsing": lambda: quantile_sketch(
            ev.where(F.col("value") > 0), "value", by=["event_type"], qs=QS,
            cfg=SketchConfig(0.02, mode=COLLAPSE_LOWEST, bin_limit=512),
        ),
        "kernel_engine_by_flag": lambda: quantile_sketch(
            li.where(F.col("l_extendedprice") > 0), "l_extendedprice",
            by=["l_returnflag"], qs=QS, cfg=SketchConfig(0.01), engine="kernel",
        ),
        "sqlpath_quantity": lambda: sql_quantile_sketch(
            li, "l_quantity", ["l_linestatus"], QS, 0.05
        ),
    }
    # warm EVERY query once before timing (codegen/JIT, Python worker
    # pool, first-plan analysis) so the two timed rounds measure the same
    # thing and their totals are comparable — with only a partial warm the
    # first round used to read ~1.6x the second on pure first-plan cost
    for fn in suite.values():
        fn().collect()
    # 2 interleaved rounds over the whole suite: a host-noise spike hits one
    # round's queries, not a query's only measurement; best-of per query
    rounds: list[dict[str, float]] = []
    for _ in range(2):
        timings: dict[str, float] = {}
        for name, fn in suite.items():
            t0 = time.perf_counter()
            fn().collect()
            timings[name] = round(time.perf_counter() - t0, 4)
        rounds.append(timings)
    best = {name: min(r[name] for r in rounds) for name in rounds[0]}
    return best, [round(sum(r.values()), 4) for r in rounds]


def main() -> None:
    result: dict = {
        "metric": "ddsketch flagship quantile pipeline: headline query wall "
        "time (sf dir) + build/merge throughput at N vs 4N executors",
        "unit": "sec",
        "sf": SF_DIR,
    }
    contention: dict = {}
    result["host_contention"] = contention

    contention["headline"] = {"before": _host_check()}
    spark = get_spark(
        app_name="ddspark-bench", cores=CPUS, shuffle_partitions=max(8, CPUS)
    )
    try:
        timings, round_totals = headline_queries(spark)
    finally:
        spark.stop()
    contention["headline"]["after"] = _host_check()
    result["queries"] = timings
    result["value"] = round(sum(timings.values()), 4)
    result["queries_round_totals"] = round_totals

    if RUN_STRESS:
        contention["stress"] = {"before": _host_check()}
        try:
            result["stress"] = _stress_section()
        except Exception as exc:  # noqa: BLE001 — headline numbers still count
            result["stress_error"] = f"{type(exc).__name__}: {exc}"
        contention["stress"]["after"] = _host_check()

    if RUN_BLOB:
        contention["blob"] = {"before": _host_check()}
        try:
            result["blob"] = _blob_section()
        except Exception as exc:  # noqa: BLE001 — headline numbers still count
            result["blob_error"] = f"{type(exc).__name__}: {exc}"
        contention["blob"]["after"] = _host_check()

    if RUN_SCALING:
        contention["scaling"] = {"before": _host_check()}
        try:
            result["throughput"] = _scaling_section()
        except Exception as exc:  # noqa: BLE001 — headline numbers still count
            result["throughput_error"] = f"{type(exc).__name__}: {exc}"
        contention["scaling"]["after"] = _host_check()

    print(json.dumps(result))


def _stress_section() -> dict:
    """Skew / wide-group aggregation throughput on a synthetic in-memory
    source (pure codegen range -> hash exprs; no I/O in the loop, so this
    isolates the aggregation path)."""
    n = int(os.environ.get("DDSPARK_STRESS_ROWS", str(48_000_000)))
    wide_groups = int(os.environ.get("DDSPARK_STRESS_GROUPS", str(1_000_000)))
    spark = get_spark(
        app_name="ddspark-stress", cores=CPUS, shuffle_partitions=2 * CPUS
    )
    try:
        base = spark.range(0, n, 1, 4 * CPUS).withColumn(
            "v", (F.pmod(F.xxhash64("id"), F.lit(100_000)) + 1).cast("double")
        )
        skew = base.withColumn(
            "g",
            F.when(
                F.pmod(F.xxhash64("id", F.lit(2)), F.lit(10)) < 9, F.lit("hot")
            ).otherwise(
                F.concat(
                    F.lit("cold"),
                    F.pmod(F.xxhash64("id", F.lit(3)), F.lit(100)).cast("string"),
                )
            ),
        )
        wide = base.withColumn(
            "g", F.pmod(F.xxhash64("id", F.lit(4)), F.lit(wide_groups))
        )

        cfg = SketchConfig(0.01)
        workloads = {
            "skew_hot90": lambda: quantile_sketch(skew, "v", ["g"], QS, cfg),
            "wide": lambda: quantile_sketch(wide, "v", ["g"], QS, cfg),
            "wide_nostats": lambda: quantile_sketch(
                wide, "v", ["g"], QS, cfg, exact_stats=False
            ),
            "wide_sqlpath": lambda: sql_quantile_sketch(
                wide, "v", ["g"], QS, 0.01
            ),
        }
        for mk in workloads.values():
            mk().count()  # warm: JIT + python workers
        # 2 interleaved rounds x BEST_OF runs: a host spike lands inside one
        # round, not on a workload's only measurements; per-round throughput
        # is kept so a regression is attributable to a specific window
        per_round: dict[str, list[float]] = {k: [] for k in workloads}
        for _ in range(2):
            for name, mk in workloads.items():
                best = float("inf")
                for _ in range(BEST_OF):
                    t0 = time.perf_counter()
                    mk().count()
                    best = min(best, time.perf_counter() - t0)
                per_round[name].append(round(n / best))
        out: dict = {"rows": n, "wide_groups": wide_groups}
        for name, vals in per_round.items():
            out[f"{name}_rows_per_sec"] = max(vals)
            out[f"{name}_rows_per_sec_per_round"] = vals
        out["method"] = (
            "local[{}], synthetic codegen source, 2 interleaved rounds, "
            "best of {} runs per round".format(CPUS, BEST_OF)
        )
        return out
    finally:
        spark.stop()


def _blob_section() -> dict:
    """Decode throughput for every image/video codec, both routes.

    Deterministic pseudo-random 64x64 RGB images (np.random.RandomState
    seeded by row id — realistic entropy-coder load, unlike flat tiles)
    are encoded ONCE per format into a blob parquet and an image-file
    directory; the timed region is decode only: the pure-Python codecs
    through ``decode_stats`` (Arrow-batched mapInPandas over the blob
    column) and Java ImageIO through ``decode_stats_jvm`` (Spark `image`
    source over the files).  MJPEG times the marker-walk frame split alone
    and split+decode (``video_frame_stats``).  2 interleaved rounds,
    best-of per route; per-core rates divide by the session's cores."""
    import shutil

    import numpy as np
    import pandas as pd
    from pyspark.sql.types import (
        BinaryType, LongType, StructField, StructType,
    )

    from ddspark.pipeline import multimodal
    from ddspark.pipeline.jpeg import encode_jpeg

    n = BLOB_IMAGES
    side = 64
    work = "/tmp/ddspark_bench_blobs"
    shutil.rmtree(work, ignore_errors=True)
    os.makedirs(work, exist_ok=True)
    spark = get_spark(
        app_name="ddspark-bench-blob", cores=CPUS, shuffle_partitions=CPUS
    )
    multimodal.configure_blob_batches(spark)
    schema = StructType(
        [StructField("doc_id", LongType()), StructField("img", BinaryType())]
    )

    def synth(fmt):
        def gen(batches):
            for pdf in batches:
                ids = pdf["id"].to_numpy()
                blobs = []
                for i in ids:
                    rng = np.random.RandomState(int(i) % (2**31))
                    a = rng.randint(0, 256, size=(side, side, 3)).astype(np.uint8)
                    if fmt == "bmp":
                        blobs.append(multimodal.encode_bmp(a))
                    elif fmt == "png":
                        blobs.append(multimodal.encode_png(a))
                    elif fmt == "gif":
                        pal = rng.randint(0, 256, size=(200, 3)).astype(np.uint8)
                        blobs.append(
                            multimodal.encode_gif(
                                pal[rng.randint(0, 200, size=(side, side))]
                            )
                        )
                    elif fmt == "tiff":
                        blobs.append(multimodal.encode_tiff(a))
                    elif fmt == "tiff_pb":
                        blobs.append(
                            multimodal.encode_tiff(a, packbits=True)
                        )
                    elif fmt == "jpeg":
                        blobs.append(
                            encode_jpeg(a, quality=75, subsampling="420")
                        )
                    elif fmt == "jpeg_progressive":
                        blobs.append(
                            encode_jpeg(
                                a, quality=75, subsampling="420",
                                progressive=True,
                            )
                        )
                    else:  # mjpeg: 4 frames at half size
                        frames = []
                        for f in range(4):
                            fa = rng.randint(
                                0, 256, size=(side // 2, side // 2, 3)
                            ).astype(np.uint8)
                            frames.append(
                                encode_jpeg(fa, quality=75, subsampling="420")
                            )
                        blobs.append(b"".join(frames))
                yield pd.DataFrame({"doc_id": ids, "img": blobs})

        return spark.range(0, n, 1, CPUS).mapInPandas(gen, schema)

    exts = {
        "bmp": "bmp", "png": "png", "gif": "gif", "tiff": "tiff",
        "tiff_pb": "tiff", "jpeg": "jpg", "jpeg_progressive": "jpg",
    }
    out: dict = {"n_images": n, "px": f"{side}x{side}", "cores": CPUS}

    def synth_local(fmt: str, kside: int, count: int) -> list[bytes]:
        rng0 = np.random.RandomState(0)
        blobs = []
        for _ in range(count):
            a = rng0.randint(0, 256, size=(kside, kside, 3)).astype(np.uint8)
            if fmt == "bmp":
                blobs.append(multimodal.encode_bmp(a))
            elif fmt == "png":
                blobs.append(multimodal.encode_png(a))
            elif fmt == "gif":
                pal = rng0.randint(0, 256, size=(200, 3)).astype(np.uint8)
                blobs.append(
                    multimodal.encode_gif(
                        pal[rng0.randint(0, 200, size=(kside, kside))]
                    )
                )
            elif fmt == "tiff":
                blobs.append(multimodal.encode_tiff(a))
            elif fmt == "tiff_pb":
                blobs.append(multimodal.encode_tiff(a, packbits=True))
            elif fmt == "jpeg":
                blobs.append(encode_jpeg(a, quality=75, subsampling="420"))
            elif fmt == "jpeg_progressive":
                blobs.append(
                    encode_jpeg(a, quality=75, subsampling="420",
                                progressive=True)
                )
            else:  # mjpeg: one 4-frame clip at half size
                fr = [
                    encode_jpeg(
                        rng0.randint(
                            0, 256, size=(kside // 2, kside // 2, 3)
                        ).astype(np.uint8),
                        quality=75, subsampling="420",
                    )
                    for _ in range(4)
                ]
                blobs.append(b"".join(fr))
        return blobs

    def kernel_rate(fmt: str, blobs: list[bytes], budget=1.0):
        """Single-core, no-Spark decode rate (images/s, MB/s) — the pure
        Python codec price, free of job-scheduling overhead that dominates
        the distributed timings at small n."""
        done, nbytes = 0, 0
        t0 = time.perf_counter()
        while time.perf_counter() - t0 < budget:
            b = blobs[done % len(blobs)]
            if fmt == "mjpeg":
                for f in multimodal.split_mjpeg(b):
                    multimodal.decode_image(f)
            else:
                multimodal.decode_image(b)
            done += 4 if fmt == "mjpeg" else 1
            nbytes += len(b)
        dt = time.perf_counter() - t0
        return done / dt, nbytes / dt / 1e6

    def kernel_rate_jvm(paths: list[str], budget=1.5) -> float:
        """Single-thread Java ImageIO decode rate over the same files via
        the Py4J gateway.  Each call pays ~2-3 ms of py4j overhead, which
        is why the JVM-vs-Python kernel comparison runs at 256x256 where
        decode dominates the call cost — the ratio is still a LOWER bound
        on the true codec speedup."""
        jvm = spark._jvm
        for p in paths:  # warm: class load + JIT
            jvm.javax.imageio.ImageIO.read(jvm.java.io.File(p))
        done = 0
        t0 = time.perf_counter()
        while time.perf_counter() - t0 < budget:
            jvm.javax.imageio.ImageIO.read(
                jvm.java.io.File(paths[done % len(paths)])
            )
            done += 1
        return done / (time.perf_counter() - t0)

    def timed(fn, rounds=2, runs=None):
        fn()  # warm
        best = float("inf")
        per_round = []
        for _ in range(rounds):
            r_best = float("inf")
            for _ in range(runs or BEST_OF):
                t0 = time.perf_counter()
                fn()
                r_best = min(r_best, time.perf_counter() - t0)
            per_round.append(r_best)
            best = min(best, r_best)
        return best, per_round

    for fmt in ("bmp", "png", "gif", "tiff", "tiff_pb", "jpeg", "jpeg_progressive", "mjpeg"):
        pq = f"{work}/{fmt}.parquet"
        synth(fmt).write.mode("overwrite").parquet(pq)
        blobs = spark.read.parquet(pq)
        total_bytes = blobs.agg(F.sum(F.octet_length("img"))).first()[0]
        kips, kmbs = kernel_rate(fmt, synth_local(fmt, side, 100))
        rec: dict = {
            "bytes": int(total_bytes),
            "kernel_1core_python_%s_per_sec"
            % ("frames" if fmt == "mjpeg" else "images"): round(kips, 1),
            "kernel_1core_python_mb_per_sec": round(kmbs, 2),
        }
        if fmt == "mjpeg":
            t, pr = timed(
                lambda: multimodal.video_frame_stats(
                    blobs, "doc_id", "img"
                ).count()
            )
            rec["python_frames_per_sec"] = round(4 * n / t)
            rec["python_mb_per_sec"] = round(total_bytes / t / 1e6, 1)
            rec["python_sec_per_round"] = [round(x, 3) for x in pr]

            def split_only():
                sc = StructType([StructField("n", LongType())])

                def g(batches):
                    for pdf in batches:
                        yield pd.DataFrame(
                            {"n": [
                                len(multimodal.split_mjpeg(bytes(b)))
                                for b in pdf["img"]
                            ]}
                        )

                return blobs.mapInPandas(g, sc).agg(F.sum("n")).first()[0]

            t, pr = timed(split_only)
            rec["split_only_clips_per_sec"] = round(n / t)
            rec["split_only_mb_per_sec"] = round(total_bytes / t / 1e6, 1)
        else:
            t, pr = timed(
                lambda: multimodal.decode_stats(blobs, "doc_id", "img").count()
            )
            rec["python_images_per_sec"] = round(n / t)
            rec["python_images_per_sec_per_core"] = round(n / t / CPUS, 1)
            rec["python_mb_per_sec"] = round(total_bytes / t / 1e6, 1)
            rec["python_sec_per_round"] = [round(x, 3) for x in pr]
            # the JVM route on the SAME images as files
            d = f"{work}/{fmt}_files"
            os.makedirs(d, exist_ok=True)
            for r in blobs.collect():
                with open(f"{d}/{r['doc_id']}.{exts[fmt]}", "wb") as fh:
                    fh.write(bytes(r["img"]))
            t, pr = timed(
                lambda: multimodal.decode_stats_jvm(spark, d).count()
            )
            rec["jvm_images_per_sec"] = round(n / t)
            rec["jvm_mb_per_sec"] = round(total_bytes / t / 1e6, 1)
            rec["jvm_sec_per_round"] = [round(x, 3) for x in pr]
            # decode-to-decode JVM-vs-Python comparison at 256x256, where
            # ImageIO decode dominates the ~2-3 ms py4j call overhead (at
            # 64x64 the overhead IS the measurement); ratio is a lower
            # bound on the true codec speedup
            big = synth_local(fmt, 256, 6)
            kp256, _ = kernel_rate(fmt, big)
            kd = f"{work}/{fmt}_kernel256"
            os.makedirs(kd, exist_ok=True)
            kpaths = []
            for i, b in enumerate(big):
                kp = f"{kd}/{i}.{exts[fmt]}"
                with open(kp, "wb") as fh:
                    fh.write(b)
                kpaths.append(kp)
            kj256 = kernel_rate_jvm(kpaths)
            rec["kernel256_1core_python_images_per_sec"] = round(kp256, 1)
            rec["kernel256_1core_jvm_images_per_sec"] = round(kj256, 1)
            rec["jvm_kernel_speedup_256px"] = round(kj256 / kp256, 1)
        out[fmt] = rec
    out["method"] = (
        f"local[{CPUS}], {n} deterministic 64x64 RGB images per format, "
        "decode-only timed (encode excluded), 2 interleaved rounds, best "
        f"of {BEST_OF} runs per round; python = Arrow-batched "
        "decode_stats, jvm = image-source ImageIO decode_stats_jvm on the "
        "same images as files; kernel_1core = single-thread no-Spark "
        "decode loop (pure codec price — distributed rates at this n "
        "include ~1s/job scheduling overhead); kernel256 = the same "
        "kernels at 256x256 where ImageIO decode dominates the py4j call "
        "overhead, giving a lower-bound decode-to-decode jvm speedup"
    )
    spark.stop()
    shutil.rmtree(work, ignore_errors=True)
    return out


def _burn_worker(seconds: float) -> int:
    t0 = time.perf_counter()
    x = 0
    while time.perf_counter() - t0 < seconds:
        x += 1
    return x


def _host_check(seconds: float = 2.0) -> dict:
    """Measure host contention around the scaling runs: burn every core
    briefly and report the /proc/stat steal/idle shares.  On this shared
    physical host, high steal (or idle that the burner could not claim)
    explains depressed 4N throughput — recording it turns the variance
    story into per-run evidence instead of an anecdote."""
    import multiprocessing as mp

    def _read():
        with open("/proc/stat") as fh:
            return list(map(int, fh.readline().split()[1:9]))

    a = _read()
    n = os.cpu_count() or 8
    with mp.Pool(n) as pool:
        pool.map(_burn_worker, [seconds] * n)
    b = _read()
    d = [y - x for x, y in zip(a, b)]
    total = sum(d) or 1
    return {
        "steal_pct": round(100 * d[7] / total, 2),
        "unclaimed_idle_pct": round(100 * (d[3] + d[4]) / total, 2),
    }


def _scaling_section() -> dict:
    """Two cluster sizes, INTERLEAVED in time.

    On a shared host the N config (4 cores) finds a quiet window far more
    easily than the 4N config (16 cores), so running each config in one
    back-to-back session biases efficiency down whenever the box is busy
    during the single 4N slice (observed: same code measured 0.71-0.86
    across a day).  Alternating N/4N sessions samples both configs across
    the same host conditions; best-of over all rounds then gives each
    config an equal shot at its cleanest window.  Per-round paired
    efficiencies are reported alongside for the variance story.
    """
    ensure_corpus(BENCH_ROWS)
    rounds = []
    round_contention = []
    for r in range(2):
        round_contention.append(_host_check())
        w = 2 if r == 0 else 1  # page cache + executor JIT warm after round 0
        lo_r = throughput_run(1, 4, BENCH_ROWS, runs=BEST_OF, warmups=w)
        hi_r = throughput_run(4, 4, BENCH_ROWS, runs=2 * BEST_OF, warmups=w)
        rounds.append((lo_r, hi_r))
    lo = max(r[0] for r in rounds)
    hi = max(r[1] for r in rounds)
    per_round_eff = [round(h / (4.0 * l), 3) for l, h in rounds]
    # HEADLINE efficiency is the best PAIRED value: N and 4N from the SAME
    # round share host conditions, so the ratio is physically meaningful
    # (cannot exceed ~1 except by noise).  Cross-round best-of pairing can
    # match a contended N with a clean 4N and report >1 — kept only as the
    # separate unpaired throughput fields below.
    return {
        "rows": BENCH_ROWS,
        "corpus": CORPUS_PATH,
        "n_executors_rows_per_sec": round(lo),
        "4n_executors_rows_per_sec": round(hi),
        "scaling_efficiency": max(per_round_eff),
        "scaling_efficiency_unpaired_best_of": round(hi / (4.0 * lo), 3),
        "efficiency_per_round": per_round_eff,
        "host_contention": {
            "per_round_before": round_contention,
            "after": _host_check(),
        },
        "method": "local-cluster[1,4] vs local-cluster[4,4] (separate "
        "executor JVMs), flagship per-lang quantile sketch, 2 interleaved "
        f"rounds, best of {BEST_OF}/{2 * BEST_OF} runs per round; headline "
        "efficiency = best per-round paired value",
    }


if __name__ == "__main__":
    main()
