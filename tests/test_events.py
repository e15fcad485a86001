"""Funnel + cohort retention (ddspark/events.py)."""
import pytest
from pyspark.sql import functions as F

from ddspark.events import cohort_retention, funnel


def test_funnel_matches_python_model(spark):
    import random

    rng = random.Random(41)
    types = ["signup", "view", "purchase", "other"]
    rows = [
        (rng.randrange(60), float(i), rng.choice(types)) for i in range(3000)
    ]
    rows += [(None, 1.0, "signup"), (1, None, "signup")]
    df = spark.createDataFrame(rows, "user_id int, ts double, event_type string")
    steps = ["signup", "view", "purchase"]
    got = {
        (r["step"], r["step_name"]): r["n_users"]
        for r in funnel(df, steps).collect()
    }

    # model: earliest-qualifying ordered subsequence per user
    by_user: dict[int, list[tuple[float, str]]] = {}
    for u, t, e in rows:
        if u is not None and t is not None:
            by_user.setdefault(u, []).append((t, e))
    counts = [0, 0, 0]
    for evs in by_user.values():
        evs.sort()
        t_prev, k = -1.0, 0
        for step in steps:
            nxt = min(
                (t for t, e in evs if e == step and t > t_prev), default=None
            )
            if nxt is None:
                break
            t_prev = nxt
            counts[k] += 1
            k += 1
    for i, s in enumerate(steps):
        assert got[(i + 1, s)] == counts[i], (s, got, counts)
    # monotone non-increasing
    assert counts[0] >= counts[1] >= counts[2] > 0

    with pytest.raises(ValueError, match="non-empty"):
        funnel(df, [])


def test_funnel_strict_order(spark):
    # purchase BEFORE view: user completes signup+view only
    df = spark.createDataFrame(
        [(1, 1.0, "signup"), (1, 2.0, "purchase"), (1, 3.0, "view")],
        "user_id int, ts double, event_type string",
    )
    got = {r["step_name"]: r["n_users"] for r in
           funnel(df, ["signup", "view", "purchase"]).collect()}
    assert got == {"signup": 1, "view": 1, "purchase": 0}
    # equal timestamps do NOT qualify (strictly increasing)
    df2 = spark.createDataFrame(
        [(1, 1.0, "signup"), (1, 1.0, "view")],
        "user_id int, ts double, event_type string",
    )
    got2 = {r["step_name"]: r["n_users"] for r in
            funnel(df2, ["signup", "view"]).collect()}
    assert got2 == {"signup": 1, "view": 0}


def test_cohort_retention_matches_model(spark):
    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    got = {
        (r["cohort"], r["offset"]): r["n_users"]
        for r in cohort_retention(ev).collect()
    }
    # model in pandas
    import pandas as pd

    pdf = ev.select("user_id", "ts").toPandas().dropna()
    pdf["b"] = pdf["ts"].dt.to_period("W-SUN").dt.start_time  # ISO Monday start
    first = pdf.groupby("user_id")["b"].min().rename("cb")
    j = pdf.join(first, on="user_id")
    j["cohort"] = j["cb"].dt.strftime("%Y-%m-%d")
    j["offset"] = ((j["b"] - j["cb"]).dt.days // 7).astype(int)
    want = (
        j.groupby(["cohort", "offset"])["user_id"].nunique().to_dict()
    )
    assert got == want
    assert sum(n for (c, o), n in got.items() if o == 0) >= len(first.groupby(level=0))

    with pytest.raises(ValueError, match="granularity"):
        cohort_retention(ev, granularity="month")


def test_top_paths_matches_model(spark):
    import random

    rng = random.Random(5)
    types = ["a", "b", "c"]
    rows = [
        (rng.randrange(40), i, float(i), rng.choice(types))
        for i in range(2000)
    ]
    df = spark.createDataFrame(rows, "user_id int, event_id int, ts double, event_type string")
    got = [(r["rank"], r["path"], r["n_users"]) for r in
           __import__("ddspark.events", fromlist=["top_paths"]).top_paths(
               df, max_steps=3, top=10).collect()]

    byu: dict[int, list[tuple[float, int, str]]] = {}
    for u, eid, t, e in rows:
        byu.setdefault(u, []).append((t, eid, e))
    pc: dict[str, int] = {}
    for evs in byu.values():
        evs.sort()
        p = " > ".join(e for _, _, e in evs[:3])
        pc[p] = pc.get(p, 0) + 1
    want = sorted(pc.items(), key=lambda kv: (-kv[1], kv[0]))[:10]
    assert got == [(i + 1, p, n) for i, (p, n) in enumerate(want)]


def test_flag_spikes_matches_model(spark):
    from ddspark.timeseries import flag_spikes

    rows = []
    base = "2024-01-"
    for day in range(1, 21):
        v = 100 if day != 15 else 900  # spike on the 15th
        rows.append((f"{base}{day:02d} 12:00:00", v))
    df = spark.createDataFrame(rows, "t string, c long").select(
        F.col("t").cast("timestamp_ntz").alias("t"), "c"
    )
    out = {r["bucket_start"].day: r for r in
           flag_spikes(df, "t", "c", window=7, factor=3).collect()}
    assert out[15]["spike"] and out[15]["trailing_sum"] == 700
    assert not any(r["spike"] for d, r in out.items() if d != 15)
    assert not out[1]["spike"] and out[1]["n_trailing"] == 0
    # day 16's trailing window contains the spike but 100*7 < 3*1500
    assert not out[16]["spike"]

    import pytest as _pytest

    with _pytest.raises(ValueError, match="window"):
        flag_spikes(df, "t", "c", window=0)


def test_markov_transitions_exact_counts(spark):
    from ddspark.events import markov_transitions

    rows = [
        # user 1: a -> b -> a ; user 2: a -> b ; user 3: b (no transition)
        (1, 1, "2024-01-01 00:00:00", "a"),
        (2, 1, "2024-01-01 01:00:00", "b"),
        (3, 1, "2024-01-01 02:00:00", "a"),
        (4, 2, "2024-01-01 00:00:00", "a"),
        (5, 2, "2024-01-01 01:00:00", "b"),
        (6, 3, "2024-01-01 00:00:00", "b"),
    ]
    df = spark.createDataFrame(
        rows, "event_id long, user_id long, ts string, event_type string"
    ).withColumn("ts", F.col("ts").cast("timestamp_ntz"))
    got = {
        (r["src"], r["dst"]): (r["n"], r["prob"])
        for r in markov_transitions(df).collect()
    }
    assert got == {("a", "b"): (2, 1.0), ("b", "a"): (1, 1.0)}


def test_markov_transitions_duckdb_twin(spark, sf_dir):
    import duckdb

    from ddspark.events import markov_transitions, markov_transitions_oracle_sql

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    got = {
        (r["src"], r["dst"]): (r["n"], r["prob"])
        for r in markov_transitions(ev).collect()
    }
    con = duckdb.connect()
    con.register("events", ev.toPandas())
    duck = {
        (s, d): (n, p)
        for s, d, n, p in con.execute(
            markov_transitions_oracle_sql("events")
        ).fetchall()
    }
    assert got == duck
    # probabilities per src sum to 1 (exact ratios of a common total)
    import collections

    sums = collections.defaultdict(float)
    for (s, _), (_, p) in got.items():
        sums[s] += p
    assert all(abs(v - 1.0) < 1e-4 for v in sums.values())


def test_rfm_segments_scores_and_duckdb(spark, sf_dir):
    import duckdb

    from ddspark.events import rfm_segments, rfm_segments_oracle_sql

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    res = rfm_segments(ev).toPandas()
    n_users = ev.where(F.col("user_id").isNotNull()).select("user_id").distinct().count()
    assert len(res) == n_users
    # quintile scores are 1..5 and balanced within 1
    for c in ("r", "f", "m"):
        assert set(res[c]) <= set(range(1, 6))
        sizes = res[c].value_counts()
        assert sizes.max() - sizes.min() <= 1
    # the most-recent user gets r=5, the least-recent r=1
    assert res.loc[res.recency_ts.idxmax(), "r"] == 5
    assert res.loc[res.recency_ts.idxmin(), "r"] == 1

    con = duckdb.connect()
    con.register("events", ev.toPandas())
    duck = {
        row[0]: row[2:]
        for row in con.execute(rfm_segments_oracle_sql("events")).fetchall()
    }
    got = {
        r.user: (r.frequency, r.monetary, r.r, r.f, r.m)
        for r in res.itertuples(index=False)
    }
    assert got == {u: tuple(v) for u, v in duck.items()}

    import pytest as _pytest

    with _pytest.raises(ValueError, match="q must be"):
        rfm_segments(ev, q=1)


def test_survival_km_hand_curve(spark):
    """5 at-risk users: 2 convert at t=1, censor at t=2, convert at t=3,
    censor at t=5 -> KM steps S(1)=3/5, S(3)=3/10, all replayed through
    the micro-nat quantization."""
    import math

    from ddspark.events import survival_km

    rows = [
        (1, "2024-01-01 00:00:00", "view"), (1, "2024-01-02 00:00:00", "purchase"),
        (2, "2024-01-01 00:00:00", "view"), (2, "2024-01-02 00:00:00", "purchase"),
        (3, "2024-01-01 00:00:00", "view"), (3, "2024-01-04 00:00:00", "purchase"),
        (4, "2024-01-04 00:00:00", "view"),
        (5, "2024-01-01 00:00:00", "view"),
        (9, "2024-01-06 00:00:00", "error"),   # horizon only (no view)
    ]
    ev = spark.createDataFrame(
        rows, "user_id long, ts string, event_type string"
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    got = {r["t"]: r for r in survival_km(ev, "view", "purchase").collect()}
    assert set(got) == {1, 3}
    r1, r3 = got[1], got[3]
    assert (r1["n_risk"], r1["n_events"], r1["n_censored"]) == (5, 2, 0)
    assert (r3["n_risk"], r3["n_events"], r3["n_censored"]) == (2, 1, 0)
    t1 = math.floor(1e6 * math.log(3 / 5))
    t3 = math.floor(1e6 * math.log(1 / 2))
    assert r1["logs_micro"] == t1
    assert r3["logs_micro"] == t1 + t3
    assert r1["survival"] == round(math.exp(t1 / 1e6), 6)
    assert r3["survival"] == round(math.exp((t1 + t3) / 1e6), 6)


def test_survival_km_zero_tail_and_twin(spark):
    """When everyone still at risk converts at the last step the curve
    hits exactly 0 (no ln(0)); random-events twin equality."""
    import duckdb

    from ddspark.events import survival_km, survival_km_oracle_sql

    rows = [
        (1, "2024-01-01 00:00:00", "view"), (1, "2024-01-02 00:00:00", "purchase"),
        (2, "2024-01-01 00:00:00", "view"), (2, "2024-01-03 00:00:00", "purchase"),
    ]
    ev = spark.createDataFrame(
        rows, "user_id long, ts string, event_type string"
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    got = sorted(
        survival_km(ev, "view", "purchase").collect(), key=lambda r: r["t"]
    )
    assert [r["t"] for r in got] == [1, 2]
    assert got[0]["survival"] == 0.5
    assert got[1]["n_risk"] == got[1]["n_events"] == 1
    assert got[1]["survival"] == 0.0 and got[1]["logs_micro"] is None

    ev2 = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    got2 = [tuple(r) for r in survival_km(ev2, "view", "purchase")
            .orderBy("t").collect()]
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW events AS SELECT * "
        "FROM '/root/testdata/sf0.001/events.parquet'"
    )
    want = [tuple(r) for r in con.execute(
        survival_km_oracle_sql("events", "view", "purchase")
        + " ORDER BY t"
    ).fetchall()]
    assert got2 == want and len(got2) >= 3
