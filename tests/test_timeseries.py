"""Multi-resolution downsampling + decayed features (ddspark/timeseries.py)."""
import pytest
from pyspark.sql import functions as F

from ddspark.timeseries import decayed_sum, downsample_multi


def test_downsample_multi_equals_per_resolution_groupbys(spark):
    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet").select(
        "ts", "event_type", F.floor(F.col("value") * 100).cast("long").alias("c")
    )
    got = downsample_multi(
        ev, "ts", "c", resolutions=("hour", "day", "week"), by=["event_type"]
    )
    rows = {
        (r["resolution"], r["bucket_start"], r["event_type"]): (
            r["n"], r["v_sum"], r["v_min"], r["v_max"]
        )
        for r in got.collect()
    }
    for res in ("hour", "day", "week"):
        want = (
            ev.where(F.col("ts").isNotNull())
            .groupBy(
                F.date_trunc(res, "ts").cast("timestamp_ntz").alias("b"),
                "event_type",
            )
            .agg(F.count(F.lit(1)), F.sum("c"), F.min("c"), F.max("c"))
            .collect()
        )
        assert len(want) > 0
        for r in want:
            assert rows[(res, r["b"], r["event_type"])] == tuple(r)[2:], (res, r)
    assert len(rows) == sum(
        ev.where(F.col("ts").isNotNull())
        .select(F.date_trunc(res, "ts").alias("b"), "event_type")
        .distinct()
        .count()
        for res in ("hour", "day", "week")
    )


def test_downsample_multi_is_one_scan_one_exchange(spark):
    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    plan = (
        downsample_multi(ev, "ts", "value", resolutions=("hour", "day"))
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert plan.count("FileScan") == 1, plan
    assert plan.count("Exchange") == 1, plan
    assert "Expand" in plan


def test_downsample_multi_rejects_bad_resolutions(spark):
    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    with pytest.raises(ValueError, match="unsupported"):
        downsample_multi(ev, "ts", "value", resolutions=("fortnight",))
    with pytest.raises(ValueError, match="duplicate"):
        downsample_multi(ev, "ts", "value", resolutions=("day", "day"))
    with pytest.raises(ValueError, match="depth"):
        decayed_sum(ev, "event_type", "ts", "value", depth=63)


def test_decayed_sum_matches_python_model(spark):
    import random

    rng = random.Random(3)
    rows = [(rng.randrange(4), i, rng.randrange(-50, 100)) for i in range(400)]
    df = spark.createDataFrame(rows, "k int, seq int, v long")
    got = {
        (r["k"], r["seq"]): r["d"]
        for r in decayed_sum(df, "k", "seq", "v", depth=8, alias="d").collect()
    }
    hist: dict[int, list[int]] = {}
    for k, seq, v in sorted(rows, key=lambda r: (r[0], r[1])):
        h = hist.setdefault(k, [])
        h.append(v)
        # newest row carries the highest weight 2^(depth-1)
        want = sum(x * (1 << (7 - i)) for i, x in enumerate(reversed(h[-8:])))
        assert got[(k, seq)] == want, (k, seq)


def test_seasonal_residuals_known(spark):
    import pandas as pd

    from ddspark.timeseries import seasonal_residuals

    t0 = pd.Timestamp("2026-05-04 00:00:00")  # a Monday
    rows = []
    # two weeks of hourly "10 per hour", then one anomalous hour in week 2
    for h in range(2 * 7 * 24):
        rows.append(("g", t0 + pd.Timedelta(hours=h), 10))
    rows.append(("g", t0 + pd.Timedelta(days=8, hours=3), 90))  # spike adds to hour
    df = spark.createDataFrame(
        pd.DataFrame(rows, columns=["g", "ts", "v"])
    )
    out = {
        (r["g"], str(r["bucket_start"])): r
        for r in seasonal_residuals(
            df, "ts", "v", by=["g"], granularity="hour", season=24 * 7,
            factor_num=1, factor_den=1,
        ).collect()
    }
    # first week has no seasonal baseline -> never anomalous
    r = out[("g", "2026-05-04 05:00:00")]
    assert r["v_lag"] is None and r["anomaly"] is False
    # normal second-week hour: residual 0
    r = out[("g", "2026-05-11 05:00:00")]
    assert (r["v"], r["v_lag"], r["residual"], r["anomaly"]) == (10, 10, 0, False)
    # the spiked hour: 100 vs 10 -> |90| > 1*10 -> anomaly
    r = out[("g", "2026-05-12 03:00:00")]
    assert (r["v"], r["v_lag"], r["residual"], r["anomaly"]) == (100, 10, 90, True)

    import pytest as _pytest

    with _pytest.raises(ValueError):
        seasonal_residuals(df, "ts", "v", season=0)


def test_autocorr_exact_perfect_period(spark):
    from ddspark.timeseries import autocorr_exact

    # strict 2-day alternation: lag-2 corr == 1, lag-1 corr == -1
    rows = [
        (f"2024-01-{d:02d} 12:00:00", 10.0 if d % 2 == 0 else 2.0)
        for d in range(1, 29)
    ]
    df = spark.createDataFrame(rows, "ts string, value double").withColumn(
        "ts", F.col("ts").cast("timestamp_ntz")
    )
    got = {r["lag"]: r["corr"] for r in autocorr_exact(df, "ts", "value", lags=[1, 2]).collect()}
    assert got[1] == -1.0 and got[2] == 1.0


def test_autocorr_exact_duckdb_twin(spark, sf_dir):
    import duckdb

    from ddspark.timeseries import autocorr_exact, autocorr_exact_oracle_sql

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    got = {
        r["lag"]: (r["n"], r["corr"])
        for r in autocorr_exact(ev, "ts", "value", lags=[1, 3, 7]).collect()
    }
    con = duckdb.connect()
    con.register("events", ev.toPandas())
    duck = {
        lag: (n, c)
        for lag, n, c in con.execute(
            autocorr_exact_oracle_sql("events", "ts", "value", lags=[1, 3, 7])
        ).fetchall()
    }
    assert got == duck
    with pytest.raises(ValueError, match="positive"):
        autocorr_exact(ev, "ts", "value", lags=[0]).collect()
