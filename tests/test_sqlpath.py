"""Pure-SQL DDSketch path: accuracy, agreement with the pandas-UDF engine,
and agreement between the Spark SQL form and the DuckDB ANSI form."""

from __future__ import annotations

import math

import duckdb
import numpy as np
import pandas as pd
import pytest

from ddspark.agg import quantile_label, quantile_sketch
from ddspark.datasets import exact_quantile
from ddspark.mapping import LogarithmicMapping
from ddspark.sketch import SketchConfig
from ddspark.sqlpath import ansi_sql_quantile_sketch, sql_quantile_sketch
from ddspark.store import COLLAPSE_LOWEST

ALPHA = 0.01
QS = [0.5, 0.95, 0.99]


@pytest.fixture(scope="module")
def lineitem(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/lineitem.parquet")


def test_sql_path_accuracy(spark, lineitem):
    res = sql_quantile_sketch(
        lineitem, "l_extendedprice", ["l_returnflag"], QS, ALPHA
    ).toPandas()
    pdf = lineitem.select("l_returnflag", "l_extendedprice").toPandas()
    for rec in res.to_dict("records"):
        g = pdf[pdf["l_returnflag"] == rec["l_returnflag"]]["l_extendedprice"]
        v = g.to_numpy(np.float64)
        assert rec["count"] == len(v)
        for q in QS:
            exact = exact_quantile(v, q)
            assert abs(rec[quantile_label(q)] - exact) <= ALPHA * abs(exact) + 1e-15


def test_sql_path_matches_pandas_path(spark, lineitem):
    """Same bucket function, same rank rule -> results differ by at most the
    pow ulp; typically bit-identical."""
    sql_res = (
        sql_quantile_sketch(lineitem, "l_extendedprice", ["l_returnflag"], QS, ALPHA)
        .toPandas()
        .set_index("l_returnflag")
        .sort_index()
    )
    pd_res = (
        quantile_sketch(
            lineitem,
            "l_extendedprice",
            ["l_returnflag"],
            QS,
            SketchConfig(ALPHA),
        )
        .toPandas()
        .set_index("l_returnflag")
        .sort_index()
    )
    for q in QS:
        col = quantile_label(q)
        np.testing.assert_allclose(
            sql_res[col].to_numpy(), pd_res[col].to_numpy(), rtol=1e-12
        )
    np.testing.assert_array_equal(
        sql_res["count"].to_numpy(), pd_res["count"].to_numpy()
    )


def test_ansi_sql_matches_spark_sql(spark, lineitem, sf_dir):
    sql = ansi_sql_quantile_sketch(
        "lineitem", "l_extendedprice", ["l_returnflag"], QS, ALPHA, round_digits=6
    )
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW lineitem AS SELECT * FROM '{sf_dir}/lineitem.parquet'"
    )
    duck = con.execute(sql).df().set_index("l_returnflag").sort_index()
    spark_res = (
        sql_quantile_sketch(lineitem, "l_extendedprice", ["l_returnflag"], QS, ALPHA)
        .toPandas()
        .set_index("l_returnflag")
        .sort_index()
    )
    for q in QS:
        col = quantile_label(q)
        np.testing.assert_allclose(
            duck[col].to_numpy(),
            np.round(spark_res[col].to_numpy(), 6),
            rtol=0,
            atol=1e-9,
        )
    np.testing.assert_array_equal(
        duck["count"].to_numpy(), spark_res["count"].to_numpy()
    )


def test_sql_path_collapsing(spark, lineitem, sf_dir):
    """Collapse-lowest clamp in SQL == clamp oracle, vs DuckDB too."""
    limit = 8
    res = sql_quantile_sketch(
        lineitem, "l_extendedprice", ["l_returnflag"], QS, ALPHA,
        mode=COLLAPSE_LOWEST, bin_limit=limit,
    ).toPandas().set_index("l_returnflag").sort_index()
    sql = ansi_sql_quantile_sketch(
        "lineitem", "l_extendedprice", ["l_returnflag"], QS, ALPHA,
        mode=COLLAPSE_LOWEST, bin_limit=limit, round_digits=6,
    )
    con = duckdb.connect()
    con.execute(f"CREATE VIEW lineitem AS SELECT * FROM '{sf_dir}/lineitem.parquet'")
    duck = con.execute(sql).df().set_index("l_returnflag").sort_index()
    for q in QS:
        col = quantile_label(q)
        np.testing.assert_allclose(
            duck[col].to_numpy(), np.round(res[col].to_numpy(), 6), atol=1e-9
        )
    # p99 must still be accurate (collapse hits the lowest bins only)
    pdf = lineitem.select("l_returnflag", "l_extendedprice").toPandas()
    for flag, rec in res.iterrows():
        v = pdf[pdf["l_returnflag"] == flag]["l_extendedprice"].to_numpy(np.float64)
        exact = exact_quantile(v, 0.99)
        assert abs(rec[quantile_label(0.99)] - exact) <= ALPHA * exact + 1e-15


def test_sql_path_global(spark, lineitem):
    res = sql_quantile_sketch(lineitem, "l_quantity", None, [0.5], ALPHA).toPandas()
    assert len(res) == 1
    pdf = lineitem.select("l_quantity").toPandas()["l_quantity"].to_numpy(np.float64)
    exact = exact_quantile(pdf, 0.5)
    assert abs(res.iloc[0][quantile_label(0.5)] - exact) <= ALPHA * exact + 1e-15


def test_sql_path_plan_is_jvm_only(spark, lineitem):
    """No Python evaluation anywhere in the physical plan; scan prunes to the
    two referenced columns."""
    plan = (
        sql_quantile_sketch(lineitem, "l_extendedprice", ["l_returnflag"], QS, ALPHA)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "MapInPandas" not in plan and "FlatMapGroupsInPandas" not in plan
