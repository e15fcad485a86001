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


def test_cusum_matches_python_replay_and_flags_the_shift(spark):
    """A series flat at 100/day for 30 days then shifted to 200/day must
    alarm upward only after the shift; the scaled statistics must equal a
    pure-Python replay of S_t = max(0, S_{t-1} + z_t)."""
    import datetime

    from ddspark.timeseries import cusum_changepoints

    vals = [100] * 30 + [200] * 15
    base = datetime.datetime(2024, 1, 1)
    rows = [
        (base + datetime.timedelta(days=i, hours=3), "g", v)
        for i, v in enumerate(vals)
    ]
    df = spark.createDataFrame(rows, "ts timestamp, k string, v long")
    got = (
        cusum_changepoints(
            df, "ts", "v", by=["k"], slack_num=1, slack_den=4,
            threshold_num=2, threshold_den=1,
        )
        .orderBy("bucket_start")
        .collect()
    )
    assert len(got) == len(vals)
    # pure-Python replay of the scaled recurrences
    n, t = len(vals), sum(vals)
    sp = sm = 0
    exp = []
    for v in vals:
        zp = 4 * n * v - 5 * t          # slack_den*n*v - (den+num)*t
        zm = 3 * t - 4 * n * v          # (den-num)*t - slack_den*n*v
        sp = max(0, sp + zp)
        sm = max(0, sm + zm)
        exp.append((sp, sm, sp > 2 * 4 * t, sm > 2 * 4 * t))
    for r, (esp, esm, eup, edown) in zip(got, exp):
        assert (r["s_pos"], r["s_neg"], r["alarm_up"], r["alarm_down"]) == (
            esp, esm, eup, edown
        ), r
    # the qualitative story: no alarms during the flat prefix, an upward
    # alarm eventually after the level shift, never a downward alarm
    assert not any(r["alarm_up"] or r["alarm_down"] for r in got[:30])
    assert any(r["alarm_up"] for r in got[30:])
    assert not any(r["alarm_down"] for r in got)


def test_cusum_oracle_twin_agrees_on_random_series(spark):
    import duckdb
    import random

    from ddspark.timeseries import (
        cusum_changepoints,
        cusum_changepoints_oracle_sql,
    )

    rng = random.Random(7)
    import datetime

    base = datetime.datetime(2024, 3, 1)
    rows = [
        (
            base + datetime.timedelta(hours=i * 7 % 720, days=i % 3),
            "ab"[i % 2],
            float(rng.randint(-50, 300)) / 100.0,
        )
        for i in range(400)
    ]
    df = spark.createDataFrame(rows, "ts timestamp, event_type string, value double")
    ev = df.select(
        "ts", "event_type", F.floor(F.col("value") * 100).cast("long").alias("c")
    )
    got = {
        (r["event_type"], str(r["bucket_start"])[:10]): (
            r["v"], r["s_pos"], r["s_neg"], r["alarm_up"], r["alarm_down"]
        )
        for r in cusum_changepoints(ev, "ts", "c", by=["event_type"]).collect()
    }
    con = duckdb.connect()
    con.register("events", df.toPandas())
    sql = cusum_changepoints_oracle_sql(
        "events", "ts", "CAST(floor(value * 100) AS BIGINT)", by=["event_type"]
    )
    want = {
        (r[0], str(r[1])[:10]): tuple(r[2:])
        for r in con.execute(sql).fetchall()
    }
    assert got == want and len(got) > 10
