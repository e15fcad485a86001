"""Deployable cluster entry point for a resumable corpus sketch build.

On a real cluster:

    python -m ddspark.session --package   # or: zip the ddspark/ dir
    spark-submit --master yarn --deploy-mode cluster \
        --py-files /tmp/ddspark_pyfiles.zip \
        --num-executors 250 --executor-cores 4 --executor-memory 16g \
        tools/run_job.py \
        --input  s3://corpus/source_code/ \
        --output s3://results/lang_percentiles/ \
        --value-expr 'length(content)' --by lang repo \
        --alpha 0.01 --qs 0.5 0.95 0.99 \
        --checkpoint s3://ckpt/lang_percentiles/

In this sandbox the same script runs against the local testdata:

    python tools/run_job.py --input /root/testdata/sf0.01/documents.parquet \
        --output /tmp/job_out --value-expr n_chars --by lang \
        --checkpoint /tmp/job_ckpt

The job is resumable: re-running with the same --checkpoint skips every
input file already covered by a successful attempt (file-granular lineage;
see ddspark/checkpoint.py), so a killed multi-hour build loses only its
in-flight attempt.  --max-files budgets work per invocation for incremental
backfills.  Per-attempt metrics (files, rows, seconds) print at the end.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("--input", required=True, help="parquet path of the corpus")
    ap.add_argument("--output", required=True, help="parquet path for results")
    ap.add_argument("--value-expr", required=True,
                    help="SQL expression to sketch, e.g. 'length(content)'")
    ap.add_argument("--by", nargs="*", default=[], help="grouping columns")
    ap.add_argument("--qs", nargs="*", type=float, default=[0.5, 0.95, 0.99])
    ap.add_argument("--alpha", type=float, default=0.01,
                    help="DDSketch relative-error bound")
    ap.add_argument("--checkpoint", required=True,
                    help="checkpoint dir (partial sketches + lineage)")
    ap.add_argument("--weight-col", default=None)
    ap.add_argument("--max-files", type=int, default=None,
                    help="cap input files this run (incremental backfill)")
    args = ap.parse_args()

    from pyspark.sql import SparkSession

    from ddspark.checkpoint import attempts_info, checkpointed_quantile_sketch
    from ddspark.io import write_results
    from ddspark.sketch import SketchConfig

    # under spark-submit the session comes preconfigured from the cluster
    # manager; standalone (sandbox) falls back to ddspark's local session
    if SparkSession.getActiveSession() is not None:
        spark = SparkSession.getActiveSession()
    elif os.environ.get("SPARK_ENV_LOADED"):
        spark = SparkSession.builder.appName("ddspark-job").getOrCreate()
    else:
        from ddspark.session import get_spark

        spark = get_spark(app_name="ddspark-job")

    res = checkpointed_quantile_sketch(
        spark,
        args.input,
        args.value_expr,
        by=args.by,
        qs=args.qs,
        cfg=SketchConfig(args.alpha),
        ckpt_dir=args.checkpoint,
        weight_col=args.weight_col,
        max_files=args.max_files,
    )
    write_results(res, args.output)
    for info in attempts_info(args.checkpoint):
        print(json.dumps(info))
    print(f"wrote {args.output}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
