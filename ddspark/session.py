"""SparkSession factory with scale-oriented defaults.

Local mode stands in for a multi-executor cluster in this sandbox; the same
configs (AQE, Arrow batching, shuffle sizing) are the ones that matter on a
real 1000-executor deployment.
"""

from __future__ import annotations

import os
import zipfile

from pyspark.sql import SparkSession


def package_pyfiles(out_dir: str = "/tmp") -> str:
    """Zip the ddspark package for shipping to executors.

    This is the ``spark-submit --py-files`` artifact on a real cluster; in
    local mode :func:`get_spark` attaches it with ``addPyFile`` so executor
    Python workers can unpickle our UDF closures regardless of the driver's
    working directory.
    """
    pkg_root = os.path.dirname(os.path.abspath(__file__))
    out = os.path.join(out_dir, "ddspark_pyfiles.zip")
    tmp = out + f".{os.getpid()}.tmp"
    with zipfile.ZipFile(tmp, "w", zipfile.ZIP_DEFLATED) as zf:
        for dirpath, _dirnames, filenames in os.walk(pkg_root):
            for fn in sorted(filenames):
                if not fn.endswith(".py"):
                    continue
                full = os.path.join(dirpath, fn)
                rel = os.path.join("ddspark", os.path.relpath(full, pkg_root))
                zf.write(full, rel)
    os.replace(tmp, out)
    return out


def get_spark(
    app_name: str = "ddspark",
    cores: int | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    if cores is None:
        cores = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 8))
    if shuffle_partitions is None:
        shuffle_partitions = max(8, cores)
    builder = (
        SparkSession.builder.appName(app_name)
        .master(f"local[{cores}]")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.default.parallelism", str(cores))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "65536")
        # Spark 4's Arrow batching enforces maxBytesPerBatch (default 64 MB)
        # by calling ArrowWriter.sizeInBytes() — a full vector-tree walk —
        # after EVERY row written to a Python stage.  Profiling shows that
        # walk costing ~1.5 us/row, ~70% of all JVM CPU under mapInPandas
        # (6 M narrow rows: 1.9 s -> 0.55 s without it).  Int.MaxValue is
        # the upstream sentinel that skips the per-row size check entirely
        # (BatchedPythonArrowInput.underBatchSizeLimit); batches stay
        # bounded by maxRecordsPerBatch above.  Blob stages re-enable a
        # byte cap via multimodal.configure_blob_batches, where rows are
        # MBs and the walk is amortized.
        .config(
            "spark.sql.execution.arrow.maxBytesPerBatch",
            os.environ.get("DDSPARK_ARROW_MAX_BYTES", "2147483647"),
        )
        # pandas round-trips of struct columns as dicts (sketch state rows)
        .config("spark.sql.execution.pandas.structHandlingMode", "row")
        .config("spark.driver.memory", os.environ.get("DDSPARK_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.session.timeZone", "UTC")
        # bucketed tables (io.write_bucketed) land here, not in the repo cwd
        .config("spark.sql.warehouse.dir", os.environ.get(
            "DDSPARK_WAREHOUSE", "/tmp/ddspark_warehouse"))
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    try:
        spark.sparkContext.addPyFile(package_pyfiles())
    except Exception:
        pass  # already added in this context, or a non-writable tmp
    return spark
