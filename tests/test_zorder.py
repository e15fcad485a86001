"""Z-order layout: interleave correctness + actual file-level skipping."""

import glob

import duckdb
import pytest
from pyspark.sql import functions as F

from ddspark.io import write_zordered, zorder_key, zorder_key_sql


def _py_z(x, y, bits=16):
    z = 0
    for i in range(bits):
        z |= ((x >> i) & 1) << (2 * i)
        z |= ((y >> i) & 1) << (2 * i + 1)
    return z


def test_interleave_matches_python_model(spark):
    rows = [(i, (i * 2654435761) % 65536, (i * 40503) % 65536) for i in range(200)]
    df = spark.createDataFrame(rows, "i long, x long, y long")
    got = {
        r.i: r.z
        for r in df.select("i", zorder_key(F.col("x"), F.col("y")).alias("z")).collect()
    }
    for i, x, y in rows:
        assert got[i] == _py_z(x, y), (i, x, y)


def test_interleave_small_bits_and_bounds(spark):
    df = spark.createDataFrame([(3, 5)], "x long, y long")
    # 3-bit: x=011 -> 0?0?1?1 even slots, y=101 -> odd slots: z = 100111b?
    assert df.select(zorder_key(F.col("x"), F.col("y"), 3).alias("z")).first().z == _py_z(3, 5, 3)
    with pytest.raises(ValueError):
        zorder_key(F.col("x"), F.col("y"), 17)


def test_sql_twin(spark):
    rows = [((i * 7919) % 65536, (i * 104729) % 65536) for i in range(500)]
    df = spark.createDataFrame(rows, "x long, y long")
    got = sorted(
        r.z for r in df.select(zorder_key(F.col("x"), F.col("y")).alias("z")).collect()
    )
    con = duckdb.connect()
    want = sorted(
        r[0]
        for r in con.execute(
            f"SELECT {zorder_key_sql('x', 'y')} FROM (SELECT UNNEST($1) x, UNNEST($2) y)",
            [[x for x, _ in rows], [y for _, y in rows]],
        ).fetchall()
    )
    assert got == want


def _files_overlapping_box(path, x_lo, x_hi, y_lo, y_hi):
    """Files whose parquet footer min/max stats overlap the box — exactly
    what an engine's scan pruning consults."""
    con = duckdb.connect()
    q = f"""
        SELECT file_name,
               BOOL_AND(NOT (
                 (path_in_schema = 'x' AND (stats_min_value::BIGINT > {x_hi}
                                         OR stats_max_value::BIGINT < {x_lo})) OR
                 (path_in_schema = 'y' AND (stats_min_value::BIGINT > {y_hi}
                                         OR stats_max_value::BIGINT < {y_lo}))
               )) AS overlaps
        FROM parquet_metadata('{path}/*.parquet')
        WHERE path_in_schema IN ('x', 'y')
        GROUP BY file_name
    """
    rows = con.execute(q).fetchall()
    return sum(1 for _, o in rows if o), len(rows)


def test_zorder_layout_actually_skips(spark, tmp_path):
    # deterministic uniform-ish 2-D points
    n = 40_000
    df = spark.range(n).select(
        ((F.col("id") * 2654435761) % 1000).alias("x"),
        ((F.col("id") * 97) % 1000).alias("y"),
    )
    zpath = str(tmp_path / "zorder")
    lpath = str(tmp_path / "linear")
    write_zordered(df, zpath, "x", "y", bits=10, n_files=16)
    # baseline: same data, same file count, single-column sort
    df.repartitionByRange(16, "x").sortWithinPartitions("x").write.parquet(lpath)

    # a selective box: 1/5 of each dimension
    z_hit, z_total = _files_overlapping_box(zpath, 100, 299, 400, 599)
    l_hit, l_total = _files_overlapping_box(lpath, 100, 299, 400, 599)
    assert z_total >= 8 and l_total >= 8
    # both layouts prune the 2-D box well below a full scan (the x-sorted
    # baseline via x alone; z-order via both dims, paying a little curve
    # fragmentation at this tiny file count)
    assert z_hit <= z_total // 2
    assert l_hit <= l_total // 2

    # the case single-column sort fundamentally cannot serve: a filter on
    # the OTHER dimension.  x-sorted files all span the full y range;
    # z-ordered files cover compact y ranges.
    zy_hit, _ = _files_overlapping_box(zpath, 0, 999, 400, 599)
    ly_hit, _ = _files_overlapping_box(lpath, 0, 999, 400, 599)
    assert ly_hit == l_total  # no pruning at all
    assert zy_hit < z_total  # z-order still skips files

    # and the layouts hold the same data
    a = sorted(map(tuple, spark.read.parquet(zpath).collect()))
    b = sorted(map(tuple, spark.read.parquet(lpath).collect()))
    assert a == b


def test_hive_partitioned_write_prunes_partitions(spark, tmp_path):
    """write_state_table(partition_by=...) must give the reader
    PARTITION-level pruning: a lang filter appears under PartitionFilters
    (not just PushedFilters) and only that partition's files are read."""
    import pyspark.sql.functions as F

    from ddspark.io import write_state_table

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    path = str(tmp_path / "by_lang")
    write_state_table(docs, path, partition_by=["lang"])

    rd = spark.read.parquet(path).where(F.col("lang") == "en")
    plan = rd._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [" in plan
    seg = plan.split("PartitionFilters: [", 1)[1].split("]", 1)[0]
    assert "lang" in seg, plan  # the predicate prunes at the LISTING, not the scan

    # physical check: the en-partition directory is the only one touched
    import os

    langs = [d for d in os.listdir(path) if d.startswith("lang=")]
    assert len(langs) > 1  # multiple partitions actually exist
    n_en = rd.count()
    exact = docs.where(F.col("lang") == "en").count()
    assert n_en == exact
