"""One-scan table profiler (ddspark/profile.py)."""
import pytest
from pyspark.sql import functions as F

from ddspark.profile import profile_table


def test_profile_table_matches_per_column_aggregates(spark):
    df = spark.createDataFrame(
        [(1, "a", None), (2, None, 5.5), (2, "b", -1.0), (None, "a", 5.5)],
        "x long, s string, v double",
    )
    rows = {r["column"]: r for r in profile_table(df).collect()}
    assert set(rows) == {"x", "s", "v"}
    assert rows["x"]["dtype"] == "bigint" and rows["x"]["n"] == 4
    assert rows["x"]["n_null"] == 1 and rows["x"]["n_distinct"] == 2
    assert (rows["x"]["min_s"], rows["x"]["max_s"]) == ("1", "2")
    assert rows["s"]["n_null"] == 1 and rows["s"]["n_distinct"] == 2
    assert (rows["s"]["min_s"], rows["s"]["max_s"]) == ("a", "b")
    assert rows["v"]["n_null"] == 1 and rows["v"]["n_distinct"] == 2
    assert (rows["v"]["min_s"], rows["v"]["max_s"]) == ("-1.0", "5.5")

    lean = {r["column"]: r for r in profile_table(df, distinct=False).collect()}
    assert all(r["n_distinct"] is None for r in lean.values())
    assert lean["x"]["n_null"] == 1

    with pytest.raises(ValueError, match="not in DataFrame"):
        profile_table(df, ["nope"])


def test_profile_table_single_scan(spark):
    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    plan = (
        profile_table(ev, ["event_id", "user_id", "event_type"])
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert plan.count("FileScan") == 1, plan
    assert "Expand" in plan  # the multi-DISTINCT lowering
