"""Sources and sinks.

The reference has neither (input is ``add()`` calls, output a Python object
— SURVEY §2 category checklist); this engine's sources are table scans and
its sinks are parquet tables of results / sketch state.

The north-star deployment reads an Iceberg catalog table; this container has
no Iceberg runtime jar, so :func:`read_corpus` prefers Iceberg when the
catalog is available and falls back to parquet paths — the engine code is
identical either way (both are V2 datasources with column pruning and
predicate/partition pushdown).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

__all__ = [
    "read_corpus",
    "read_corpus_jsonl",
    "read_corpus_csv",
    "write_state_table",
    "read_state_table",
    "write_results",
    "write_bucketed",
    "read_bucketed",
    "read_blob_files",
    "write_corpus_jsonl",
    "zorder_key",
    "zorder_key_sql",
    "write_zordered",
    "latest_snapshot",
    "merge_upsert",
    "write_webdataset",
    "read_webdataset",
    "webdataset_samples",
    "corpus_diff",
]


def read_corpus(
    spark: SparkSession,
    source: str,
    fmt: str | None = None,
    columns: list[str] | None = None,
) -> DataFrame:
    """Read the corpus table.

    ``source`` is an Iceberg table name (``catalog.db.table``) or a path;
    ``fmt`` accepts any V2 file source — ``parquet`` (default for paths) and
    ``orc`` both ship with Spark and both get predicate pushdown + column
    pruning (pytest proves the ORC roundtrip keeps the sha256 invariant and
    pushes filters).  Select ``columns`` early so the scan prunes to them
    (at 100 TB the difference between reading ``(lang, content)`` and
    reading every column is the job).
    """
    if fmt is None:
        fmt = "parquet" if "/" in source else "iceberg"
    if fmt == "iceberg":
        try:
            df = spark.read.format("iceberg").load(source)
        except Exception:
            df = spark.table(source)
    else:
        df = spark.read.format(fmt).load(source)
    return df.select(*columns) if columns else df


def read_corpus_jsonl(
    spark: SparkSession,
    path: str,
    schema=None,
    columns: list[str] | None = None,
) -> DataFrame:
    """Read a JSON-Lines corpus (the common web-scrape interchange format:
    one JSON object per line, gzip-splittable per file).

    An explicit ``schema`` (StructType or DDL string) is strongly preferred
    and defaults to the engine's corpus schema: schema *inference* scans the
    data once before the real job (twice the IO at 100 TB) and drifts when
    shards disagree on optional keys.  Malformed lines land in
    ``_corrupt_record`` (PERMISSIVE mode) instead of failing the job —
    filter or count them explicitly; a web crawl always contains garbage.
    (Spark restriction: a query referencing *only* ``_corrupt_record`` over
    the raw scan is disallowed — ``cache()`` or checkpoint the frame first
    when auditing corrupt rows.)
    """
    if schema is None:
        from .corpus import corpus_schema
        from pyspark.sql.types import StringType, StructField

        schema = corpus_schema().add(StructField("_corrupt_record", StringType(), True))
    df = (
        spark.read.format("json")
        .schema(schema)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt_record")
        .load(path)
    )
    return df.select(*columns) if columns else df


def read_corpus_csv(
    spark: SparkSession,
    path: str,
    schema=None,
    columns: list[str] | None = None,
    header: bool = True,
    sep: str = ",",
) -> DataFrame:
    """Read a CSV corpus with the same contract as
    :func:`read_corpus_jsonl`: explicit schema (no inference scan),
    PERMISSIVE mode with malformed lines routed to ``_corrupt_record``
    (same caveat: ``cache()`` before querying only that column), and
    multiline quoted fields enabled — text corpora embed newlines."""
    if schema is None:
        from .corpus import corpus_schema
        from pyspark.sql.types import StringType, StructField

        schema = corpus_schema().add(StructField("_corrupt_record", StringType(), True))
    df = (
        spark.read.format("csv")
        .schema(schema)
        .option("header", str(header).lower())
        .option("sep", sep)
        .option("multiLine", "true")
        .option("escape", '"')
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt_record")
        .load(path)
    )
    return df.select(*columns) if columns else df


def write_state_table(
    df: DataFrame, path: str, partition_by: list[str] | None = None, mode: str = "overwrite"
) -> None:
    """Persist sketch-state rows (the flat ARRAY<DOUBLE> layout) as parquet.

    State rows are KBs per group; a billion-group state table is still only
    ~TBs and remains mergeable later (read back + ``merge_partials``)."""
    w = df.write.mode(mode)
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.parquet(path)


def read_state_table(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.parquet(path)


def write_results(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    """Small result tables (quantiles per group): coalesce to avoid a
    thousand 2-row files."""
    df.coalesce(1).write.mode(mode).parquet(path)


def write_bucketed(
    df: DataFrame,
    name: str,
    bucket_cols: list[str],
    num_buckets: int = 256,
    sort_cols: list[str] | None = None,
    path: str | None = None,
    mode: str = "overwrite",
    fmt: str = "parquet",
) -> str:
    """Write ``df`` as a bucketed (hash-clustered, optionally sorted) table.

    This is the co-located-join primitive at 100 TB: a scan of a bucketed
    table reports ``HashPartitioning(bucket_cols, num_buckets)`` to Catalyst,
    so a join or aggregation keyed on the bucket columns between tables
    bucketed the same way needs **no exchange at all** — the single biggest
    shuffle you can delete from a repeated dedup/join pipeline (e.g. bucket
    the corpus and its embedding/fingerprint side tables by ``doc_id`` once,
    then every per-document join is partition-local; with ``sort_cols`` the
    sort-merge join also skips its sort).  Size ``num_buckets`` so one
    bucket of the *largest* co-bucketed table fits an executor core's task
    comfortably (~128-512 MB compressed).

    Returns ``name`` (read back with :func:`read_bucketed`).  Bucket file
    layout follows Spark's hash (Murmur3 of the bucket columns), so any
    Spark cluster — not just this session — reads it co-located.
    """
    w = df.write.format(fmt).mode(mode).bucketBy(num_buckets, *bucket_cols)
    if sort_cols:
        w = w.sortBy(*sort_cols)
    if path:
        w = w.option("path", path)
    w.saveAsTable(name)
    return name


def read_bucketed(spark: SparkSession, name: str) -> DataFrame:
    """Scan a table written by :func:`write_bucketed`; the scan carries the
    bucket spec, so downstream joins/aggs on the bucket columns are
    exchange-free (verify with ``.explain()`` — no Exchange above the
    scans)."""
    return spark.table(name)


def read_blob_files(
    spark: SparkSession,
    path: str,
    id_col: str = "doc_id",
    blob_col: str = "img",
    glob: str | None = None,
    recursive: bool = True,
    max_bytes: int | None = None,
    with_meta: bool = False,
) -> DataFrame:
    """Read a directory of blob FILES (images, audio, video, ...) into the
    ``(id, blob)`` column shape every blob operator here consumes
    (:func:`~ddspark.pipeline.multimodal.decode_stats`, ``audio_stats``,
    ``video_frame_stats``, ...), via Spark's built-in ``binaryFile`` source.

    This is the files->columns bridge for corpora that arrive as object-store
    files rather than parquet rows.  The id is parsed from the file stem
    (``{id}.{ext}`` — the same naming the JVM image route uses) with a pure
    column expression, so the whole read is JVM-side.

    Scale shape (what makes this hold at 100 TB of files):

    * ``glob`` forwards ``pathGlobFilter`` — file PRUNING at listing time;
      non-matching files are never opened.
    * ``max_bytes`` becomes a filter on the source's ``length`` column,
      which the binaryFile source PUSHES DOWN to the file index — oversized
      blobs are skipped without reading a byte (same for caller-added
      ``modificationTime`` filters, e.g. incremental loads).
    * small files are packed into tasks by ``spark.sql.files.maxPartitionBytes``
      (+ ``openCostInBytes`` per-file padding), so a billion 50 KB thumbnails
      do not become a billion tasks.
    * content is only materialized for files that survive pruning; select
      only metadata and the scan reads no bytes at all (column pruning).

    ``with_meta`` keeps ``(path, length, mtime)`` alongside the blob for
    lineage/debugging.
    """
    from pyspark.sql import functions as F

    reader = (
        spark.read.format("binaryFile")
        .option("recursiveFileLookup", str(recursive).lower())
    )
    if glob is not None:
        reader = reader.option("pathGlobFilter", glob)
    df = reader.load(path)
    if max_bytes is not None:
        df = df.where(F.col("length") <= max_bytes)
    stem = F.regexp_extract(F.element_at(F.split("path", "/"), -1), r"^(\d+)", 1)
    cols = [
        F.nullif(stem, F.lit("")).cast("long").alias(id_col),
        F.col("content").alias(blob_col),
    ]
    if with_meta:
        cols += [
            F.col("path"),
            F.col("length"),
            F.col("modificationTime").alias("mtime"),
        ]
    return df.select(*cols)


def write_corpus_jsonl(
    df: DataFrame,
    path: str,
    compression: str | None = "gzip",
    partitions: int | None = None,
    mode: str = "overwrite",
) -> None:
    """Export a corpus as sharded JSONL — the interchange format most
    training stacks ingest (one JSON object per line, one file per
    shard).  ``compression="gzip"`` writes ``.json.gz`` shards (use
    ``None`` for plain text); ``partitions`` controls the shard count
    (default: the DataFrame's current partitioning — at scale, size
    shards to ~100-500 MB compressed so downstream loaders parallelize
    without tiny-file overhead).  Roundtrips through
    :func:`read_corpus_jsonl`."""
    out = df.repartition(partitions) if partitions else df
    w = out.write.mode(mode)
    if compression:
        w = w.option("compression", compression)
    w.json(path)


# --------------------------------------------------------------------------
# Z-order layout — multi-column data skipping


# doubling masks that spread a 16-bit int across 32 bits (bit i -> bit 2i)
_SPREAD_STEPS = [(8, 0x00FF00FF), (4, 0x0F0F0F0F), (2, 0x33333333), (1, 0x55555555)]


def _spread_bits(c, bits: int):
    """Spread the low ``bits`` (<=16) bits of a long column so bit i lands
    at bit 2i — pure shift/mask Catalyst arithmetic, whole-stage codegen."""
    from pyspark.sql import functions as F

    out = c.bitwiseAND(F.lit((1 << bits) - 1))
    for shift, mask in _SPREAD_STEPS:
        out = out.bitwiseOR(F.shiftleft(out, shift)).bitwiseAND(F.lit(mask))
    return out


def zorder_key(x, y, bits: int = 16):
    """Morton/Z-order interleave of two columns already scaled to
    ``[0, 2**bits)`` (bits <= 16): x takes the even bit positions, y the
    odd.  Nearby (x, y) points get nearby z values, so range-partitioning
    + sorting by z clusters a 2-D box into few files — the layout step
    that makes parquet min/max footer stats prune on TWO dimensions at
    once instead of one."""
    from pyspark.sql import functions as F

    if not 1 <= bits <= 16:
        raise ValueError(f"bits must be in [1, 16], got {bits}")
    return _spread_bits(x, bits).bitwiseOR(
        F.shiftleft(_spread_bits(y, bits), 1)
    )


def zorder_key_sql(x_expr: str, y_expr: str, bits: int = 16) -> str:
    """ANSI twin of :func:`zorder_key` (same shift/mask cascade)."""

    def spread(e: str) -> str:
        out = f"(CAST({e} AS BIGINT) & {(1 << bits) - 1})"
        for shift, mask in _SPREAD_STEPS:
            out = f"(({out} | ({out} << {shift})) & {mask})"
        return out

    return f"({spread(x_expr)} | ({spread(y_expr)} << 1))"


def write_zordered(
    df: DataFrame,
    path: str,
    x_col: str,
    y_col: str,
    bits: int = 16,
    n_files: int = 64,
    mode: str = "overwrite",
) -> None:
    """Write ``df`` as parquet laid out in Z-order over two numeric
    columns: scale each to ``[0, 2**bits)`` by its global min/max (one
    tiny 4-number aggregate), interleave, then ``repartitionByRange`` +
    sort within partitions by the z key.

    **Scale**: at 100 TB a predicate box on (x, y) touches ~sqrt-of-files
    instead of all of them — every engine that reads parquet footers
    (Spark, DuckDB, Trino) skips whole files/row-groups via min/max
    stats, and the range partitioner keeps file sizes balanced regardless
    of skew in either column alone.  The z computation itself is pure
    shift/mask codegen; the only shuffle is the range exchange that any
    layout rewrite needs.
    """
    from pyspark.sql import functions as F

    lo_x, hi_x, lo_y, hi_y = df.select(
        F.min(x_col), F.max(x_col), F.min(y_col), F.max(y_col)
    ).first()
    top = (1 << bits) - 1

    def scaled(col, lo, hi):
        if hi == lo:
            return F.lit(0).cast("long")
        frac = (F.col(col).cast("double") - float(lo)) / (float(hi) - float(lo))
        return F.floor(frac * top).cast("long")

    z = zorder_key(scaled(x_col, lo_x, hi_x), scaled(y_col, lo_y, hi_y), bits)
    (
        df.withColumn("_z", z)
        .repartitionByRange(n_files, "_z")
        .sortWithinPartitions("_z")
        .drop("_z")
        .write.mode(mode)
        .parquet(path)
    )


def latest_snapshot(
    changelog: DataFrame,
    key: list[str] | str,
    version: list[str] | str,
    delete_col: str | None = None,
) -> DataFrame:
    """Compact a CDC-style changelog to its latest snapshot: one row per
    ``key`` — the one with the greatest ``version`` (a column list; ties
    broken by the later columns, so pass e.g. ``["ts", "seq"]`` for a
    total order).  With ``delete_col`` (boolean), keys whose winning row
    is a tombstone disappear from the snapshot.

    **Scale**: a single ``max_by``-shaped aggregate — ``max(struct(
    version..., payload))`` — so Catalyst runs partial aggregation
    map-side and shuffles one candidate row per key per partition, not
    the whole history (a window row_number() would shuffle every row and
    sort each group).  This is the standard "replay the upsert log"
    primitive behind snapshot refresh of a training corpus.
    """
    key = [key] if isinstance(key, str) else list(key)
    version = [version] if isinstance(version, str) else list(version)
    payload = [c for c in changelog.columns if c not in key]
    # version columns lead the struct: struct ordering = lexicographic by
    # field order, so max() picks the greatest version (ties -> greatest
    # payload, which is why callers should make `version` a total order)
    win = F.max(
        F.struct(*[F.col(v) for v in version], *[F.col(c) for c in payload if c not in version])
    ).alias("_w")
    out = changelog.groupBy(*key).agg(win)
    cols = [F.col(k) for k in key] + [
        F.col(f"_w.{c}").alias(c) for c in payload
    ]
    out = out.select(*cols)
    if delete_col is not None:
        out = out.where(~F.coalesce(F.col(delete_col), F.lit(False))).drop(
            delete_col
        )
    return out


def merge_upsert(
    base: DataFrame,
    updates: DataFrame,
    key: list[str] | str,
    delete_col: str | None = None,
) -> DataFrame:
    """SQL MERGE semantics without a table format: rows of ``updates``
    replace same-key rows of ``base``, new keys append, and (with
    ``delete_col``) tombstones remove.  Both sides must be one row per
    key (compact a changelog with :func:`latest_snapshot` first) —
    duplicate keys on either side raise rather than picking arbitrarily.

    **Scale**: no join — ``base`` is unioned with ``updates`` under a
    priority tag and compacted by the same max-struct aggregate as
    :func:`latest_snapshot`, so the plan is one shuffle on the merge key
    with map-side partial aggregation.  Rewrite the result with
    ``write_bucketed`` on the key and the next merge's shuffle disappears
    too.
    """
    key = [key] if isinstance(key, str) else list(key)
    payload = [c for c in base.columns if c not in key]
    extra = [c for c in updates.columns if c not in base.columns and c != delete_col]
    if extra:
        raise ValueError(f"updates carry columns not in base: {extra}")
    if delete_col is None:
        up = updates.withColumn("_del", F.lit(False))
    else:
        up = updates.withColumn(
            "_del", F.coalesce(F.col(delete_col), F.lit(False))
        ).drop(delete_col)
    missing = [c for c in base.columns if c not in up.columns]
    if missing:
        raise ValueError(f"updates are missing base columns: {missing}")

    tagged = base.select(
        *key, F.lit(0).alias("_pri"), F.lit(False).alias("_del"),
        *[F.col(c) for c in payload],
    ).unionByName(
        up.select(
            *key, F.lit(1).alias("_pri"), F.col("_del"),
            *[F.col(c) for c in payload],
        )
    )
    merged = (
        tagged.groupBy(*key)
        .agg(
            F.max(
                F.struct("_pri", "_del", *[F.col(c) for c in payload])
            ).alias("_w"),
            F.sum(F.col("_pri").cast("long")).alias("_nup"),
            F.sum(F.lit(1) - F.col("_pri")).alias("_nbase"),
        )
    )
    # >1 update row for a key (or a non-unique base) means latest-wins
    # would be arbitrary: refuse.  The guard lives in a FILTER predicate
    # (a projected column would be pruned away unevaluated); the CASE
    # branches keep raise_error lazy.
    def _dup_error(side: str, hint: str):
        return F.raise_error(
            F.concat(
                F.lit(f"merge_upsert: duplicate {side} rows for key ("),
                F.concat_ws(",", *[F.col(k).cast("string") for k in key]),
                F.lit(f"); {hint}"),
            )
        ).cast("boolean")

    guard = (
        F.when(
            F.col("_nup") > 1,
            _dup_error("update", "compact updates with latest_snapshot first"),
        )
        .when(
            F.col("_nbase") > 1,
            _dup_error("base", "the base table must be one row per key"),
        )
        .otherwise(F.lit(True))
    )
    return merged.where(guard & ~F.col("_w._del")).select(
        *key,
        *[F.col(f"_w.{c}").alias(c) for c in payload],
    )


def write_webdataset(
    df: DataFrame,
    path: str,
    key_col: str,
    ext_cols: dict[str, str],
    num_shards: int | None = None,
) -> DataFrame:
    """Write a WebDataset-style sharded tar corpus: each output file
    ``shard-NNNNN.tar`` holds the partition's samples as consecutive tar
    members ``{key}.{ext}`` (``ext_cols`` maps tar extension -> source
    column; binary columns verbatim, strings UTF-8) — the standard
    sequential-read layout for large-scale multimodal training loaders.

    **Scale**: one tar per partition, streamed member-by-member from
    Arrow batches (``mapInPandas``) — no per-executor buffering of the
    shard, no driver involvement, and shard count == partition count so
    ``num_shards``/upstream partitioning controls file sizing.  Members
    are sorted by key within a shard and tar metadata is zeroed, so a
    rewrite of the same data is byte-identical (diffable shards).
    Returns a DataFrame of per-shard manifests ``(shard, n_samples,
    n_bytes)`` (the write happens when it is acted on — the caller's
    action is the job).
    """
    import os

    from pyspark import TaskContext
    from pyspark.sql.types import (
        LongType as _Long,
        StringType as _Str,
        StructField as _SF,
        StructType as _ST,
    )

    if not ext_cols:
        raise ValueError("ext_cols must map at least one extension to a column")
    for ext, c in ext_cols.items():
        if "." in ext or "/" in ext:
            raise ValueError(f"bad extension {ext!r}")
        if c not in df.columns:
            raise ValueError(f"ext_cols column {c!r} not in DataFrame")
    os.makedirs(path, exist_ok=True)
    exts = sorted(ext_cols)
    narrow = df.select(
        F.col(key_col).cast("string").alias("_key"),
        *[F.col(ext_cols[e]).alias(f"_c_{e}") for e in exts],
    )
    if num_shards is not None:
        narrow = narrow.repartition(num_shards, "_key")
    narrow = narrow.sortWithinPartitions("_key")
    schema = _ST(
        [_SF("shard", _Str()), _SF("n_samples", _Long()), _SF("n_bytes", _Long())]
    )

    def gen(batches):
        import io as _io
        import tarfile

        pid = TaskContext.get().partitionId()
        shard = f"shard-{pid:05d}.tar"
        final = os.path.join(path, shard)
        tmp = final + f".inprogress.{os.getpid()}"
        n = 0
        with tarfile.open(tmp, "w") as tar:
            for pdf in batches:
                for rec in pdf.itertuples(index=False):
                    key = rec[0]
                    if key is None:
                        continue
                    for i, e in enumerate(exts):
                        payload = rec[i + 1]
                        if payload is None:
                            continue
                        data = (
                            payload.encode("utf-8")
                            if isinstance(payload, str)
                            else bytes(payload)
                        )
                        info = tarfile.TarInfo(name=f"{key}.{e}")
                        info.size = len(data)
                        info.mtime = 0
                        info.uid = info.gid = 0
                        info.uname = info.gname = ""
                        tar.addfile(info, _io.BytesIO(data))
                    n += 1
        os.replace(tmp, final)  # atomic publish per shard
        yield pd.DataFrame(
            [{"shard": shard, "n_samples": n, "n_bytes": os.path.getsize(final)}]
        )

    import pandas as pd  # noqa: F401  (closure import for executors)

    return narrow.mapInPandas(gen, schema)


def read_webdataset(spark: SparkSession, path: str) -> DataFrame:
    """Read a :func:`write_webdataset` corpus back as long-format rows
    ``(shard, key, ext, content binary)`` — one task per shard file
    (``binaryFile`` source), members streamed out of the tar in Arrow
    batches.  Pivot to one-row-per-sample with
    :func:`webdataset_samples`."""
    from pyspark.sql.types import (
        BinaryType as _Bin,
        StringType as _Str,
        StructField as _SF,
        StructType as _ST,
    )

    files = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", "*.tar")
        .load(path)
        .select("path", "content")
    )
    schema = _ST(
        [
            _SF("shard", _Str()),
            _SF("key", _Str()),
            _SF("ext", _Str()),
            _SF("content", _Bin()),
        ]
    )

    def gen(batches):
        import io as _io
        import os as _os
        import tarfile

        import pandas as _pd

        for pdf in batches:
            for p, blob in zip(pdf["path"], pdf["content"]):
                shard = _os.path.basename(p)
                out = []
                with tarfile.open(fileobj=_io.BytesIO(bytes(blob))) as tar:
                    for m in tar:
                        if not m.isfile():
                            continue
                        stem, dot, ext = m.name.rpartition(".")
                        out.append(
                            {
                                "shard": shard,
                                "key": stem if dot else m.name,
                                "ext": ext if dot else "",
                                "content": tar.extractfile(m).read(),
                            }
                        )
                if out:
                    yield _pd.DataFrame(out, columns=["shard", "key", "ext", "content"])

    return files.mapInPandas(gen, schema)


def webdataset_samples(long_df: DataFrame, exts: list[str]) -> DataFrame:
    """Pivot :func:`read_webdataset` long rows to one row per sample:
    ``(key, <ext> binary, ...)`` via one max-struct aggregate per
    extension (partial agg map-side; keys are unique per shard so this
    shuffles one row per sample)."""
    aggs = [
        F.max(F.when(F.col("ext") == e, F.col("content"))).alias(e)
        for e in exts
    ]
    return long_df.groupBy("key").agg(*aggs)


def corpus_diff(
    old: DataFrame,
    new: DataFrame,
    key: list[str] | str,
    compare: list[str] | None = None,
) -> DataFrame:
    """Dataset-version regression diff: classify every key as ``added`` /
    ``removed`` / ``changed`` / ``unchanged`` between two corpus
    snapshots — the pre-flight a training-data refresh runs before
    shipping ("3 docs changed" is a diff; "40% removed" is an incident).
    Returns ``(*key, status)``; aggregate for counts or anti-filter for
    samples.

    ``compare`` (default: all shared non-key columns) diffs via an md5
    fingerprint of the null-sentineled concatenation, so the join
    carries ONE hash per row instead of every payload column, and the
    whole diff is a single full-outer join keyed on ``key`` —
    broadcastable/AQE-splittable like any equi-join.  NULL keys never
    pair under SQL join semantics and are excluded.
    """
    key = [key] if isinstance(key, str) else list(key)
    if compare is None:
        compare = [
            c for c in old.columns if c in new.columns and c not in key
        ]
    missing = [c for c in key + compare if c not in old.columns or c not in new.columns]
    if missing or not compare:
        raise ValueError(
            f"columns missing from a side or nothing to compare: {missing or compare}"
        )

    def fp(df: DataFrame, alias: str) -> DataFrame:
        parts = [
            F.coalesce(F.col(c).cast("string"), F.lit("\x00NULL")) for c in compare
        ]
        keep = F.lit(True)
        for k in key:
            keep = keep & F.col(k).isNotNull()
        return df.where(keep).select(
            *key, F.md5(F.concat_ws("\x01", *parts)).alias(alias)
        )

    o = fp(old, "fp_o")
    # rename the new side's keys: old and new often derive from the SAME
    # scan (a transformed snapshot), and frame-qualified columns are
    # ambiguous in a self-join — distinct names are not
    n = fp(new, "fp_n").select(
        *[F.col(k).alias(f"_nk_{i}") for i, k in enumerate(key)], "fp_n"
    )
    cond = None
    for i, k in enumerate(key):
        c = F.col(k) == F.col(f"_nk_{i}")
        cond = c if cond is None else cond & c
    j = o.join(n, cond, "full")
    status = (
        F.when(F.col(key[0]).isNull(), F.lit("added"))
        .when(F.col("_nk_0").isNull(), F.lit("removed"))
        .when(F.col("fp_o") != F.col("fp_n"), F.lit("changed"))
        .otherwise(F.lit("unchanged"))
    )
    return j.select(
        *[
            F.coalesce(F.col(k), F.col(f"_nk_{i}")).alias(k)
            for i, k in enumerate(key)
        ],
        status.alias("status"),
    )
