"""Changelog compaction + MERGE semantics (ddspark/io.py)."""
import pytest
from pyspark.sql import functions as F

from ddspark.io import latest_snapshot, merge_upsert


def test_latest_snapshot_matches_model(spark):
    import random

    rng = random.Random(9)
    rows = []
    for seq in range(500):
        k = rng.randrange(40)
        rows.append((k, seq, f"v{seq}", rng.random() < 0.1))
    df = spark.createDataFrame(rows, "k int, seq int, val string, deleted boolean")

    # model: latest seq wins per key; tombstone winners drop the key
    last = {}
    for k, seq, val, deleted in rows:
        if k not in last or seq > last[k][0]:
            last[k] = (seq, val, deleted)
    want = sorted(
        (k, seq, val) for k, (seq, val, d) in last.items() if not d
    )

    got = latest_snapshot(df, "k", "seq", delete_col="deleted")
    assert sorted(tuple(r) for r in got.collect()) == want

    # no delete handling: tombstone rows win but stay
    got_all = latest_snapshot(df, "k", "seq")
    assert sorted((r["k"], r["seq"]) for r in got_all.collect()) == sorted(
        (k, v[0]) for k, v in last.items()
    )

    # partial aggregation, not a window sort: plan has partial_ rows
    plan = latest_snapshot(df, "k", "seq")._jdf.queryExecution().executedPlan().toString()
    assert "Window" not in plan
    assert plan.count("Exchange") == 1, plan


def test_merge_upsert_semantics(spark):
    base = spark.createDataFrame(
        [(1, "a", 10), (2, "b", 20), (3, "c", 30)], "k int, name string, v int"
    )
    updates = spark.createDataFrame(
        [(2, "B", 21, False), (4, "d", 40, False), (3, None, 0, True)],
        "k int, name string, v int, deleted boolean",
    )
    got = sorted(
        tuple(r)
        for r in merge_upsert(base, updates, "k", delete_col="deleted").collect()
    )
    assert got == [(1, "a", 10), (2, "B", 21), (4, "d", 40)]

    dup = spark.createDataFrame(
        [(2, "x", 1, False), (2, "y", 2, False)], "k int, name string, v int, deleted boolean"
    )
    from py4j.protocol import Py4JJavaError
    from pyspark.errors.exceptions.captured import SparkRuntimeException

    with pytest.raises((Py4JJavaError, SparkRuntimeException), match="duplicate update rows"):
        merge_upsert(base, dup, "k", delete_col="deleted").collect()

    with pytest.raises(ValueError, match="not in base"):
        merge_upsert(base, updates.withColumnRenamed("name", "nom"), "k",
                     delete_col="deleted")

    # join-free plan: one exchange, no SortMergeJoin/BroadcastHashJoin
    ok = spark.createDataFrame([(9, "z", 9, False)], "k int, name string, v int, deleted boolean")
    plan = merge_upsert(base, ok, "k", delete_col="deleted")._jdf.queryExecution() \
        .executedPlan().toString()
    assert "Join" not in plan, plan
    assert plan.count("Exchange") == 1, plan


def test_corpus_diff_classifies_all_statuses(spark):
    from ddspark.io import corpus_diff

    old = spark.createDataFrame(
        [(1, "a", 10), (2, "b", 20), (3, "c", 30), (None, "x", 0)],
        "k int, s string, v int",
    )
    new = spark.createDataFrame(
        [(1, "a", 10), (2, "B", 20), (4, "d", 40), (None, "y", 0)],
        "k int, s string, v int",
    )
    got = {r["k"]: r["status"] for r in corpus_diff(old, new, "k").collect()}
    assert got == {1: "unchanged", 2: "changed", 3: "removed", 4: "added"}

    # NULL payload participates in the fingerprint without false changes
    o2 = spark.createDataFrame([(1, None)], "k int, s string")
    n2 = spark.createDataFrame([(1, None)], "k int, s string")
    assert corpus_diff(o2, n2, "k").collect()[0]["status"] == "unchanged"
    # a real value equal to the NULL sentinel collides by design (the
    # sentinel contains \x00, which no sane text column carries)

    import pytest as _pytest

    with _pytest.raises(ValueError, match="missing"):
        corpus_diff(old, new.drop("v"), "k", compare=["v"])
