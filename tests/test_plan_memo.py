"""Plan-construction memo (ddspark.plancache): a cache hit must be the
same computation served as a FRESH Dataset (plans, never results — a hit
must re-execute from its inputs), and anything whose identity can't be
established must bypass."""

from __future__ import annotations

import os

import pandas as pd
import pytest
from pyspark.sql import functions as F

from ddspark import plancache
from ddspark.agg import quantile_sketch
from ddspark.sketch import SketchConfig
from ddspark.sqlpath import sql_quantile_sketch


@pytest.fixture(autouse=True)
def _clean_cache():
    plancache._PLAN_CACHE.clear()
    plancache._HITS = 0
    yield
    plancache._PLAN_CACHE.clear()


def _write_parquet(path: str, values: list[float], group: str = "a") -> None:
    pd.DataFrame({"g": [group] * len(values), "v": values}).to_parquet(path)


def test_hit_serves_fresh_dataset_same_results(spark, tmp_path):
    p = str(tmp_path / "t.parquet")
    _write_parquet(p, [1.0, 2.0, 3.0, 4.0])
    df = spark.read.parquet(p)

    def q():
        return quantile_sketch(
            df.where(F.col("v") > 0), "v", by=["g"], qs=[0.5], cfg=SketchConfig(0.01)
        )

    first = q()
    second = q()
    assert plancache._HITS == 1
    # a hit is a FRESH Dataset (fresh QueryExecution): returning the same
    # object would let AQE replay materialized stages across invocations
    assert second is not first
    assert len(plancache._PLAN_CACHE) == 1
    r1 = first.collect()
    r2 = second.collect()
    assert r1 == r2 and r1[0]["count"] == 4.0


def test_hit_recomputes_from_inputs(spark, tmp_path):
    """A memoized plan is not a result: once the backing file is gone, an
    action on a HIT must fail — there is no stored answer to fall back on.
    (Re-collecting the ORIGINAL object can succeed via AQE stage reuse,
    which is exactly why hits are fresh Datasets.)"""
    p = str(tmp_path / "gone.parquet")
    _write_parquet(p, [1.0, 2.0])
    df = spark.read.parquet(p)
    out = quantile_sketch(df, "v", by=["g"], qs=[0.5], cfg=SketchConfig(0.01))
    assert out.collect()[0]["count"] == 2.0
    again = quantile_sketch(df, "v", by=["g"], qs=[0.5], cfg=SketchConfig(0.01))
    assert plancache._HITS == 1
    os.remove(p)
    with pytest.raises(Exception):
        again.collect()


def test_different_files_miss(spark, tmp_path):
    pa, pb = str(tmp_path / "a.parquet"), str(tmp_path / "b.parquet")
    _write_parquet(pa, [1.0, 2.0])
    _write_parquet(pb, [10.0, 20.0, 30.0])
    qa = quantile_sketch(
        spark.read.parquet(pa), "v", by=["g"], qs=[0.5], cfg=SketchConfig(0.01)
    )
    qb = quantile_sketch(
        spark.read.parquet(pb), "v", by=["g"], qs=[0.5], cfg=SketchConfig(0.01)
    )
    # same schema, same params — the file list alone must split the key
    assert plancache._HITS == 0
    assert qa.collect()[0]["count"] == 2.0
    assert qb.collect()[0]["count"] == 3.0


def test_different_filter_and_params_miss(spark, tmp_path):
    p = str(tmp_path / "f.parquet")
    _write_parquet(p, [1.0, 2.0, 3.0])
    df = spark.read.parquet(p)
    base = quantile_sketch(df, "v", by=["g"], qs=[0.5], cfg=SketchConfig(0.01))
    filtered = quantile_sketch(
        df.where(F.col("v") > 1), "v", by=["g"], qs=[0.5], cfg=SketchConfig(0.01)
    )
    quantile_sketch(df, "v", by=["g"], qs=[0.9], cfg=SketchConfig(0.01))
    quantile_sketch(df, "v", by=["g"], qs=[0.5], cfg=SketchConfig(0.02))
    assert plancache._HITS == 0
    assert len(plancache._PLAN_CACHE) == 4
    assert base.collect()[0]["count"] == 3.0
    assert filtered.collect()[0]["count"] == 2.0


def test_new_file_in_directory_misses(spark, tmp_path):
    """Appending a part file to the input directory changes inputFiles() —
    the fresh read must rebuild, not serve the earlier snapshot."""
    d = tmp_path / "dir.parquet"
    d.mkdir()
    _write_parquet(str(d / "part-0.parquet"), [1.0, 2.0])
    q1 = quantile_sketch(
        spark.read.parquet(str(d)), "v", by=["g"], qs=[0.5], cfg=SketchConfig(0.01)
    )
    assert q1.collect()[0]["count"] == 2.0
    _write_parquet(str(d / "part-1.parquet"), [3.0])
    q2 = quantile_sketch(
        spark.read.parquet(str(d)), "v", by=["g"], qs=[0.5], cfg=SketchConfig(0.01)
    )
    assert plancache._HITS == 0
    assert q2.collect()[0]["count"] == 3.0


def test_local_relation_bypasses(spark):
    df = spark.createDataFrame([("a", 1.0), ("a", 2.0)], "g string, v double")
    assert plancache.source_key(df) is None
    quantile_sketch(df, "v", by=["g"], qs=[0.5], cfg=SketchConfig(0.01))
    quantile_sketch(df, "v", by=["g"], qs=[0.5], cfg=SketchConfig(0.01))
    # never memoized: identity not establishable for in-memory relations
    assert plancache._HITS == 0
    assert len(plancache._PLAN_CACHE) == 0


def test_sqlpath_memo(spark, tmp_path):
    p = str(tmp_path / "s.parquet")
    _write_parquet(p, [1.0, 2.0, 3.0, 4.0, 5.0])
    df = spark.read.parquet(p)
    a = sql_quantile_sketch(df, "v", ["g"], [0.5], 0.01)
    b = sql_quantile_sketch(df, "v", ["g"], [0.5], 0.01)
    sql_quantile_sketch(df, "v", ["g"], [0.5], 0.02)
    assert plancache._HITS == 1 and len(plancache._PLAN_CACHE) == 2
    assert a.collect() == b.collect()
    assert a.collect()[0]["count"] == 5.0


def test_kill_switch(spark, tmp_path, monkeypatch):
    p = str(tmp_path / "k.parquet")
    _write_parquet(p, [1.0])
    df = spark.read.parquet(p)
    monkeypatch.setenv("DDSPARK_PLAN_MEMO", "0")
    quantile_sketch(df, "v", by=["g"], qs=[0.5], cfg=SketchConfig(0.01))
    quantile_sketch(df, "v", by=["g"], qs=[0.5], cfg=SketchConfig(0.01))
    assert plancache._HITS == 0
    assert len(plancache._PLAN_CACHE) == 0


def test_fifo_bound(spark, tmp_path):
    p = str(tmp_path / "fifo.parquet")
    _write_parquet(p, [1.0, 2.0])
    df = spark.read.parquet(p)
    for i in range(plancache._MAX_ENTRIES + 8):
        quantile_sketch(
            df, "v", by=["g"], qs=[round(0.01 + i * 0.01, 2)], cfg=SketchConfig(0.01)
        )
    assert len(plancache._PLAN_CACHE) <= plancache._MAX_ENTRIES


def test_key_carries_session_identity(spark, tmp_path):
    p = str(tmp_path / "sess.parquet")
    _write_parquet(p, [1.0])
    key = plancache.source_key(spark.read.parquet(p))
    assert key is not None
    # stale-session guard: (python gateway id, JVM object id)
    assert key[0] == (id(spark._jvm), spark._jsparkSession._target_id)


def test_kernel_engine_memoized_separately(spark, tmp_path):
    p = str(tmp_path / "eng.parquet")
    _write_parquet(p, [1.0, 2.0, 3.0])
    df = spark.read.parquet(p)
    cells = quantile_sketch(df, "v", by=["g"], qs=[0.5], cfg=SketchConfig(0.01))
    kern = quantile_sketch(
        df, "v", by=["g"], qs=[0.5], cfg=SketchConfig(0.01), engine="kernel"
    )
    assert plancache._HITS == 0  # engine is part of the key
    kern2 = quantile_sketch(
        df, "v", by=["g"], qs=[0.5], cfg=SketchConfig(0.01), engine="kernel"
    )
    assert plancache._HITS == 1
    a = {r["g"]: r["p50"] for r in cells.collect()}
    b = {r["g"]: r["p50"] for r in kern.collect()}
    c = {r["g"]: r["p50"] for r in kern2.collect()}
    assert a == b == c
