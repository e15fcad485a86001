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


def test_pearson_corr_exact_matches_numpy(spark):
    import numpy as np

    from ddspark.profile import pearson_corr_exact

    rng = np.random.default_rng(5)
    x = rng.integers(1, 50, 400).astype(float)
    y = np.round(3.0 * x + rng.normal(0, 20, 400), 2)
    g = rng.choice(["a", "b"], 400)
    df = spark.createDataFrame(
        list(zip(g.tolist(), x.tolist(), y.tolist())), "g string, x double, y double"
    )
    got = {
        r["g"]: (r["n"], r["corr"])
        for r in pearson_corr_exact(df, "x", "y", by=["g"], y_scale=100).collect()
    }
    for grp in ("a", "b"):
        m = g == grp
        want = np.corrcoef(x[m], np.round(y[m] * 100))[0, 1]
        n, corr = got[grp]
        assert n == int(m.sum())
        assert corr == pytest.approx(want, abs=1e-6)


def test_pearson_corr_exact_edge_cases(spark):
    from ddspark.profile import pearson_corr_exact

    df = spark.createDataFrame(
        [("a", 1.0, 5.0), ("a", 1.0, 7.0), ("b", 1.0, None), ("b", 2.0, 4.0), ("b", 3.0, 2.0)],
        "g string, x double, y double",
    )
    got = {r["g"]: (r["n"], r["corr"]) for r in pearson_corr_exact(df, "x", "y", by=["g"]).collect()}
    assert got["a"] == (2, None)  # zero x-variance -> NULL, not div-by-zero
    assert got["b"] == (2, -1.0)  # NULL row dropped; perfect inverse


def test_pearson_corr_partition_invariant(spark):
    from ddspark.profile import pearson_corr_exact

    li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
    a = pearson_corr_exact(li, "l_quantity", "l_extendedprice", y_scale=100).collect()
    b = pearson_corr_exact(
        li.repartition(13), "l_quantity", "l_extendedprice", y_scale=100
    ).collect()
    assert [tuple(r) for r in a] == [tuple(r) for r in b]
    assert a[0]["corr"] is not None


def test_crosstab_chi2_known_table(spark):
    from ddspark.profile import crosstab_chi2

    # 2x2 with a known chi2: O = [[10, 20], [20, 10]], N=60
    rows = (
        [("r1", "c1")] * 10 + [("r1", "c2")] * 20
        + [("r2", "c1")] * 20 + [("r2", "c2")] * 10
    )
    df = spark.createDataFrame(rows, "r string, c string")
    out = {(x["r"], x["c"]): x for x in crosstab_chi2(df, "r", "c").collect()}
    # every marginal is 30 -> E = 30*30/60 = 15 per cell, contrib = 25/15
    for k, rec in out.items():
        assert rec["expected"] == 15.0
        assert rec["chi2_contrib"] == pytest.approx(25 / 15, abs=1e-6)
    assert sum(rec["observed"] for rec in out.values()) == 60


def test_column_entropy_known_values(spark):
    import math

    from ddspark.profile import column_entropy

    rows = [("a", 1), ("a", 2), ("b", 3), ("c", None)] * 4  # 16 rows
    df = spark.createDataFrame(rows, "g string, v int")
    out = {r["column"]: r for r in column_entropy(df, ["g", "v"]).collect()}

    def h(counts):
        n = sum(counts)
        s = sum(math.floor(1e6 * c * math.log(c)) for c in counts)
        return round(math.log(n) - s / (1e6 * n), 6)

    assert out["g"]["n"] == 16 and out["g"]["n_distinct"] == 3
    assert out["g"]["entropy_nats"] == h([8, 4, 4])
    # NULL is its own category for v
    assert out["v"]["n_distinct"] == 4
    assert out["v"]["entropy_nats"] == h([4, 4, 4, 4])
    # uniform over 4 -> ln(4) (within quantization bias)
    assert abs(out["v"]["entropy_nats"] - math.log(4)) < 1e-5


def test_column_entropy_constant_and_unique(spark):
    from ddspark.profile import column_entropy

    import math

    df = spark.createDataFrame(
        [(i, "same") for i in range(100)], "id long, k string"
    )
    out = {r["column"]: r for r in column_entropy(df, ["id", "k"]).collect()}
    assert out["k"]["entropy_nats"] == 0.0  # constant column
    assert abs(out["id"]["entropy_nats"] - math.log(100)) < 1e-5  # ID leak

    with pytest.raises(ValueError, match="not in DataFrame"):
        column_entropy(df, ["nope"])


def test_spearman_matches_numpy_ranks(spark):
    import numpy as np

    from ddspark.profile import spearman_corr_exact

    rng = np.random.default_rng(9)
    x = rng.integers(1, 20, 300).astype(float)  # heavy ties
    y = np.exp(x / 3.0) + rng.normal(0, 5, 300)  # monotone-ish, nonlinear
    df = spark.createDataFrame(
        list(zip(x.tolist(), y.tolist())), "x double, y double"
    )
    got = spearman_corr_exact(df, "x", "y").collect()[0]

    def avg_rank(v):
        order = np.argsort(v, kind="stable")
        ranks = np.empty(len(v), dtype=float)
        sorted_v = v[order]
        i = 0
        while i < len(v):
            j = i
            while j + 1 < len(v) and sorted_v[j + 1] == sorted_v[i]:
                j += 1
            ranks[order[i : j + 1]] = (i + j) / 2.0 + 1.0
            i = j + 1
        return ranks

    rx, ry = avg_rank(x), avg_rank(y)
    want = np.corrcoef(rx, ry)[0, 1]
    assert got["n"] == 300
    assert got["corr"] == pytest.approx(want, abs=2e-6)
    # monotone signal -> strongly positive
    assert got["corr"] > 0.8


def test_spearman_invariance_and_perfect_monotone(spark):
    from ddspark.profile import spearman_corr_exact

    rows = [(float(i), float(i * i)) for i in range(1, 50)]  # nonlinear but monotone
    df = spark.createDataFrame(rows, "x double, y double")
    assert spearman_corr_exact(df, "x", "y").collect()[0]["corr"] == 1.0
    a = spearman_corr_exact(df.repartition(7), "x", "y").collect()
    b = spearman_corr_exact(df.repartition(1), "x", "y").collect()
    assert [tuple(r) for r in a] == [tuple(r) for r in b]


def test_fixed_width_histogram_known(spark):
    from ddspark.profile import fixed_width_histogram

    df = spark.createDataFrame([(float(v),) for v in range(0, 100)], "v double")
    out = {r["bucket"]: r for r in fixed_width_histogram(df, "v", 10).collect()}
    assert len(out) == 10
    # span [0, 99], width 9.9: bucket b covers [9.9b, 9.9(b+1))
    assert out[0]["n"] == 10 and out[0]["lo"] == 0.0 and out[0]["hi"] == 9.9
    assert out[9]["n"] == 10  # max lands in the last bucket (closed)
    assert sum(r["n"] for r in out.values()) == 100

    # empty buckets are emitted; degenerate min==max collapses to bucket 0
    one = spark.createDataFrame([(5.0,), (5.0,)], "v double")
    rows = {r["bucket"]: r["n"] for r in fixed_width_histogram(one, "v", 4).collect()}
    assert rows == {0: 2, 1: 0, 2: 0, 3: 0}

    with pytest.raises(ValueError, match="k must be"):
        fixed_width_histogram(df, "v", 0)


def test_ks_drift_known_and_identical(spark):
    from ddspark.profile import ks_drift

    # identical distributions -> ks == 0
    rows = [("a", float(v)) for v in range(10)] + [("b", float(v)) for v in range(10)]
    df = spark.createDataFrame(rows, "g string, v double")
    r = ks_drift(df, "v", "g", "a", "b").collect()[0]
    assert (r["n_a"], r["n_b"], r["ks"]) == (10, 10, 0.0)

    # disjoint supports -> ks == 1 at the boundary
    rows = [("a", float(v)) for v in range(5)] + [("b", float(v + 10)) for v in range(5)]
    df = spark.createDataFrame(rows, "g string, v double")
    r = ks_drift(df, "v", "g", "a", "b").collect()[0]
    assert r["ks"] == 1.0 and r["at_value"] == 4.0

    # hand-computed shifted case vs python
    import numpy as np

    rng = np.random.default_rng(21)
    xa = rng.integers(0, 50, 400)
    xb = rng.integers(5, 55, 300)
    rows = [("a", float(v)) for v in xa] + [("b", float(v)) for v in xb]
    df = spark.createDataFrame(rows, "g string, v double")
    r = ks_drift(df, "v", "g", "a", "b").collect()[0]
    pts = np.unique(np.concatenate([xa, xb]))
    fa = np.searchsorted(np.sort(xa), pts, side="right") / len(xa)
    fb = np.searchsorted(np.sort(xb), pts, side="right") / len(xb)
    want = np.abs(fa - fb).max()
    assert r["ks"] == pytest.approx(want, abs=1e-6)


def test_corr_matrix_matches_pairwise(spark):
    import numpy as np

    from ddspark.profile import pearson_corr_exact, pearson_corr_matrix

    rng = np.random.default_rng(31)
    n = 500
    a = rng.integers(0, 100, n).astype(float)
    b = a * 2 + rng.integers(0, 10, n)
    c = rng.integers(0, 100, n).astype(float)
    df = spark.createDataFrame(
        list(zip(a.tolist(), b.tolist(), c.tolist())),
        "a double, b double, c double",
    )
    mat = {
        (r["col_x"], r["col_y"]): (r["n"], r["corr"])
        for r in pearson_corr_matrix(df, ["a", "b", "c"]).collect()
    }
    assert set(mat) == {("a", "b"), ("a", "c"), ("b", "c")}
    for (x, y), (nn, corr) in mat.items():
        single = pearson_corr_exact(df, x, y).collect()[0]
        assert (nn, corr) == (single["n"], single["corr"]), (x, y)
    assert mat[("a", "b")][1] > 0.99  # near-collinear pair detected

    plan = (
        pearson_corr_matrix(df, ["a", "b", "c"])
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert plan.count("Scan") <= plan.count("HashAggregate")  # no per-pair rescans


def test_corr_matrix_shared_null_mask_and_guards(spark):
    from ddspark.profile import pearson_corr_matrix

    df = spark.createDataFrame(
        [(1.0, 2.0, None), (2.0, 4.0, 1.0), (3.0, 5.0, 2.0), (4.0, 9.0, 3.0)],
        "a double, b double, c double",
    )
    rows = pearson_corr_matrix(df, ["a", "b", "c"]).collect()
    # listwise deletion: the NULL c row drops from EVERY pair
    assert all(r["n"] == 3 for r in rows)

    with pytest.raises(ValueError, match="at least two"):
        pearson_corr_matrix(df, ["a"])
    with pytest.raises(ValueError, match="duplicate"):
        pearson_corr_matrix(df, ["a", "a"])
    with pytest.raises(ValueError, match="align"):
        pearson_corr_matrix(df, ["a", "b"], scales=[1])


def test_benford_screen(spark):
    import math

    from ddspark.profile import benford_screen

    # Benford-distributed synthetic data: v = floor(10^(u*3)) for uniform u
    import numpy as np

    rng = np.random.default_rng(41)
    vals = np.floor(10 ** (rng.uniform(0, 3, 20000))).astype(float)
    df = spark.createDataFrame([(float(v),) for v in vals], "v double")
    out = {r["digit"]: r for r in benford_screen(df, "v").collect()}
    assert set(out) == set(range(1, 10))
    n = sum(r["observed"] for r in out.values())
    for d in range(1, 10):
        exp = out[d]["expected_micro"] / 1e6
        assert exp == math.floor(1e6 * math.log10(1 + 1 / d)) * n / 1e6
        # Benford data ~matches its expectation within 4 sigma
        p = math.log10(1 + 1 / d)
        sigma = math.sqrt(n * p * (1 - p))
        assert abs(out[d]["observed"] - n * p) < 4 * sigma, d

    # truncation semantics: 0.9 -> floor 0 excluded; -25.7 -> digit 2
    edge = spark.createDataFrame([(0.9,), (-25.7,), (None,)], "v double")
    rows = {r["digit"]: r["observed"] for r in benford_screen(edge, "v").collect()}
    assert rows[2] == 1 and sum(rows.values()) == 1


def test_mannwhitney_matches_python_ranks(spark):
    import numpy as np

    from ddspark.profile import mannwhitney_u

    rng = np.random.default_rng(55)
    a = rng.integers(0, 30, 250)  # heavy ties
    b = rng.integers(5, 35, 180)  # shifted up
    rows = [("a", float(v)) for v in a] + [("b", float(v)) for v in b]
    df = spark.createDataFrame(rows, "g string, v double")
    r = mannwhitney_u(df, "v", "g", "a", "b").collect()[0]

    comb = np.concatenate([a, b]).astype(float)
    order = np.argsort(comb, kind="stable")
    ranks = np.empty(len(comb))
    sv = comb[order]
    i = 0
    while i < len(comb):
        j = i
        while j + 1 < len(comb) and sv[j + 1] == sv[i]:
            j += 1
        ranks[order[i : j + 1]] = (i + j) / 2.0 + 1.0
        i = j + 1
    r_a = ranks[: len(a)].sum()
    u_a = r_a - len(a) * (len(a) + 1) / 2.0
    assert r["n_a"] == len(a) and r["n_b"] == len(b)
    assert r["u2_a"] == int(round(2 * u_a))
    assert r["u2_a"] + r["u2_b"] == 2 * len(a) * len(b)  # identity
    assert r["auc"] == pytest.approx(u_a / (len(a) * len(b)), abs=1e-6)
    assert r["auc"] < 0.5  # b is shifted up, so P(a > b) < 0.5


def test_mannwhitney_extremes(spark):
    from ddspark.profile import mannwhitney_u

    # complete separation: every a below every b -> auc = 0
    rows = [("a", float(v)) for v in range(5)] + [("b", float(v + 10)) for v in range(5)]
    df = spark.createDataFrame(rows, "g string, v double")
    r = mannwhitney_u(df, "v", "g", "a", "b").collect()[0]
    assert (r["u2_a"], r["auc"]) == (0, 0.0)
    # identical single value -> pure ties, auc = 0.5
    rows = [("a", 7.0)] * 4 + [("b", 7.0)] * 6
    df = spark.createDataFrame(rows, "g string, v double")
    r = mannwhitney_u(df, "v", "g", "a", "b").collect()[0]
    assert r["auc"] == 0.5


def test_fixed_width_histogram_grouped(spark):
    from ddspark.profile import fixed_width_histogram_grouped

    rows = (
        [("a", float(v)) for v in range(0, 100)]     # a: [0, 99]
        + [("b", 5.0), ("b", 5.0)]                   # b: degenerate min==max
    )
    df = spark.createDataFrame(rows, "g string, v double")
    out = {(r["g"], r["bucket"]): r for r in
           fixed_width_histogram_grouped(df, "v", ["g"], 10).collect()}
    # each group gets its OWN extremes and a full k-bucket spine
    assert sum(1 for (g, _) in out if g == "a") == 10
    assert sum(1 for (g, _) in out if g == "b") == 10
    assert out[("a", 0)]["n"] == 10 and out[("a", 9)]["n"] == 10
    assert out[("b", 0)]["n"] == 2
    assert all(out[("b", i)]["n"] == 0 for i in range(1, 10))
    assert sum(r["n"] for r in out.values()) == 102

    with pytest.raises(ValueError, match="ungrouped"):
        fixed_width_histogram_grouped(df, "v", [], 10)


# ------------------------------------------------------------- OLS / Gini / MAD


def _duck(sql, frames):
    import duckdb

    con = duckdb.connect()
    for name, pdf in frames.items():
        con.register(name, pdf)
    return con.execute(sql).fetchall()


def test_ols_fit_exact_matches_numpy_and_duckdb(spark):
    import numpy as np

    from ddspark.profile import ols_fit_exact, ols_fit_exact_oracle_sql

    rng = np.random.default_rng(11)
    x = rng.integers(1, 60, 500).astype(float)
    y = np.round(2.5 * x + 7 + rng.normal(0, 9, 500), 2)
    g = rng.choice(["a", "b"], 500)
    df = spark.createDataFrame(
        list(zip(g.tolist(), x.tolist(), y.tolist())), "g string, x double, y double"
    )
    got = {
        r["g"]: r
        for r in ols_fit_exact(df, "x", "y", by=["g"], y_scale=100).collect()
    }
    for grp in ("a", "b"):
        m = g == grp
        yy = np.round(y[m] * 100) / 100
        slope, intercept = np.polyfit(x[m], yy, 1)
        assert abs(got[grp]["slope"] - slope) < 1e-4
        assert abs(got[grp]["intercept"] - intercept) < 1e-3
        r = np.corrcoef(x[m], yy)[0, 1]
        assert abs(got[grp]["r2"] - r * r) < 1e-4

    duck = _duck(
        ols_fit_exact_oracle_sql("t", "x", "y", by=["g"], y_scale=100),
        {"t": df.toPandas()},
    )
    want = {row[0]: row for row in duck}
    for grp in ("a", "b"):
        gr = got[grp]
        assert (gr["n"], gr["slope"], gr["intercept"], gr["r2"]) == want[grp][1:]


def test_ols_constant_x_yields_nulls(spark):
    from ddspark.profile import ols_fit_exact

    df = spark.createDataFrame([(1.0, 2.0), (1.0, 5.0)], "x double, y double")
    row = ols_fit_exact(df, "x", "y").collect()[0]
    assert row["slope"] is None and row["intercept"] is None and row["r2"] is None


def test_gini_exact_known_values_and_duckdb(spark):
    from ddspark.profile import gini_exact, gini_exact_oracle_sql

    # equal distribution -> 0
    eq = spark.createDataFrame([("a", 5.0)] * 6, "g string, v double")
    assert gini_exact(eq, "v", by=["g"]).collect()[0]["gini"] == 0.0
    # textbook: [1,2,3,4,5] -> G = (2*(1+4+9+16+25) - 6*15) / (5*15) = 20/75
    vals = spark.createDataFrame([(float(i),) for i in (3, 1, 5, 2, 4)], "v double")
    assert gini_exact(vals, "v").collect()[0]["gini"] == round(20 / 75, 6)

    import numpy as np

    rng = np.random.default_rng(3)
    v = rng.integers(0, 500, 400).astype(float)
    g = rng.choice(["x", "y", "z"], 400)
    df = spark.createDataFrame(list(zip(g.tolist(), v.tolist())), "g string, v double")
    got = {r["g"]: (r["n"], r["gini"]) for r in gini_exact(df, "v", by=["g"]).collect()}
    duck = dict(
        (row[0], (row[1], row[2]))
        for row in _duck(gini_exact_oracle_sql("t", "v", by=["g"]), {"t": df.toPandas()})
    )
    assert got == duck
    # numpy cross-check of the rank formula
    for grp in ("x", "y", "z"):
        s = np.sort(v[g == grp])
        n = len(s)
        gini = (2 * np.sum(np.arange(1, n + 1) * s) - (n + 1) * s.sum()) / (n * s.sum())
        assert abs(got[grp][1] - gini) < 1e-6


def test_mad_outliers_matches_numpy_and_duckdb(spark):
    import numpy as np

    from ddspark.profile import mad_outliers, mad_outliers_oracle_sql

    rng = np.random.default_rng(7)
    v = np.concatenate([rng.normal(100, 5, 380), rng.normal(500, 5, 20)])
    v = np.round(v, 2)
    g = np.array(["a"] * 200 + ["b"] * 200)
    df = spark.createDataFrame(list(zip(g.tolist(), v.tolist())), "g string, v double")
    got = {
        r["g"]: (r["n"], r["median"], r["mad"], r["n_outliers"])
        for r in mad_outliers(df, "v", by=["g"], scale=100).collect()
    }
    duck = {
        row[0]: tuple(row[1:])
        for row in _duck(
            mad_outliers_oracle_sql("t", "v", by=["g"], scale=100),
            {"t": df.toPandas()},
        )
    }
    assert got == duck
    for grp in ("a", "b"):
        s = np.round(v[g == grp] * 100)
        med = np.median(s)
        mad = np.median(np.abs(s - med))
        n_out = int(np.sum(np.abs(s - med) > 3 * mad))
        assert got[grp][1] == round(med / 100, 6)
        assert got[grp][2] == round(mad / 100, 6)
        assert got[grp][3] == n_out


def test_mad_outliers_odd_and_even_medians(spark):
    from ddspark.profile import mad_outliers

    odd = spark.createDataFrame([(float(x),) for x in (1, 9, 5)], "v double")
    assert mad_outliers(odd, "v").collect()[0]["median"] == 5.0
    even = spark.createDataFrame([(float(x),) for x in (1, 2, 8, 9)], "v double")
    row = mad_outliers(even, "v").collect()[0]
    assert row["median"] == 5.0  # (2+8)/2
    assert row["mad"] == 3.5  # deviations {4,3,3,4} -> median 3.5


def test_psi_drift_matches_python_model(spark):
    import math

    import numpy as np

    from ddspark.profile import psi_drift, psi_drift_oracle_sql

    rng = np.random.default_rng(19)
    a = rng.normal(0, 1, 600)
    b = rng.normal(0.8, 1.3, 400)  # shifted+widened -> real drift
    v = np.round(np.concatenate([a, b]), 3)
    s = np.array(["a"] * 600 + ["b"] * 400)
    df = spark.createDataFrame(list(zip(s.tolist(), v.tolist())), "s string, v double")
    row = psi_drift(df, "v", "s", "a", "b", k=10).collect()[0]
    # python replay
    mn, mx = v.min(), v.max()
    k = 10
    buckets = np.minimum(np.floor((v - mn) * k / (mx - mn)).astype(int), k - 1)
    nano = 0
    for i in range(k):
        ca = int(((buckets == i) & (s == "a")).sum())
        cb = int(((buckets == i) & (s == "b")).sum())
        pa = (ca + 1) / (600 + k)
        pb = (cb + 1) / (400 + k)
        nano += math.floor(1e9 * ((pa - pb) * math.log(pa / pb)))
    assert (row["n_a"], row["n_b"]) == (600, 400)
    assert row["psi"] == round(nano / 1e9, 6)
    assert row["psi"] > 0.25  # a real shift lands above the alert band

    got = (row["n_a"], row["n_b"], row["psi"])
    duck = _duck(
        psi_drift_oracle_sql("t", "v", "s", "a", "b", k=10), {"t": df.toPandas()}
    )[0]
    assert got == duck


def test_psi_drift_identical_segments_near_zero(spark):
    import numpy as np

    from ddspark.profile import psi_drift

    rng = np.random.default_rng(2)
    v = np.round(rng.normal(0, 1, 1000), 3)
    s = np.array(["a", "b"] * 500)  # interleaved halves of one distribution
    df = spark.createDataFrame(list(zip(s.tolist(), v.tolist())), "s string, v double")
    row = psi_drift(df, "v", "s", "a", "b").collect()[0]
    assert abs(row["psi"]) < 0.05


def test_bootstrap_ci_brackets_truth_and_matches_duckdb(spark):
    import numpy as np

    from ddspark.profile import bootstrap_ci_mean, bootstrap_ci_mean_oracle_sql

    rng = np.random.default_rng(23)
    v = np.round(rng.normal(50, 10, 2000), 2)
    df = spark.createDataFrame(
        [(i, float(x)) for i, x in enumerate(v)], "id long, v double"
    )
    row = bootstrap_ci_mean(df, "id", "v", b=80).collect()[0]
    assert row["n"] == 2000 and row["b"] == 80
    # CI must bracket the sample mean and be plausibly tight (se ~ 0.22)
    assert row["ci_lo"] < row["mean"] < row["ci_hi"]
    assert 0.2 < row["ci_hi"] - row["ci_lo"] < 2.5
    assert abs(row["mean"] - round(v.mean(), 2)) < 0.1

    duck = _duck(
        bootstrap_ci_mean_oracle_sql("t", "id", "v", b=80), {"t": df.toPandas()}
    )[0]
    assert (row["n"], row["b"], row["mean"], row["ci_lo"], row["ci_hi"]) == duck


def test_bootstrap_ci_partition_invariance(spark):
    import numpy as np

    from ddspark.profile import bootstrap_ci_mean

    rng = np.random.default_rng(29)
    v = np.round(rng.uniform(0, 100, 500), 2)
    df = spark.createDataFrame(
        [(i, float(x)) for i, x in enumerate(v)], "id long, v double"
    )
    a = bootstrap_ci_mean(df, "id", "v", b=50).collect()[0]
    b = bootstrap_ci_mean(df.repartition(13), "id", "v", b=50).collect()[0]
    assert a == b

    import pytest as _pytest

    with _pytest.raises(ValueError, match="b >= 2"):
        bootstrap_ci_mean(df, "id", "v", b=1)


def test_welch_t_matches_scipy_formula(spark):
    import numpy as np

    from ddspark.profile import welch_t, welch_t_oracle_sql

    rng = np.random.default_rng(31)
    a = np.round(rng.normal(50, 5, 300), 2)
    b = np.round(rng.normal(52, 15, 500), 2)
    v = np.concatenate([a, b])
    g = np.array(["a"] * 300 + ["b"] * 500)
    df = spark.createDataFrame(list(zip(g.tolist(), v.tolist())), "g string, v double")
    row = welch_t(df, "v", "g", "a", "b", scale=100).collect()[0]
    # textbook Welch on the quantized values
    aa, bb = np.round(a * 100), np.round(b * 100)
    va, vb = aa.var(ddof=1), bb.var(ddof=1)
    se2 = va / 300 + vb / 500
    t = (aa.mean() - bb.mean()) / np.sqrt(se2)
    dof = se2**2 / ((va / 300) ** 2 / 299 + (vb / 500) ** 2 / 499)
    assert abs(row["t"] - t) < 1e-4
    assert abs(row["dof"] - dof) < 1e-2
    assert (row["n_a"], row["n_b"]) == (300, 500)

    duck = _duck(
        welch_t_oracle_sql("t", "v", "g", "a", "b", scale=100), {"t": df.toPandas()}
    )[0]
    assert (
        row["n_a"], row["n_b"], row["mean_a"], row["mean_b"], row["t"], row["dof"]
    ) == duck


def test_welch_t_degenerate_groups(spark):
    from ddspark.profile import welch_t

    df = spark.createDataFrame(
        [("a", 1.0), ("b", 2.0), ("b", 3.0)], "g string, v double"
    )
    row = welch_t(df, "v", "g", "a", "b").collect()[0]
    assert row["t"] is None and row["dof"] is None  # n_a == 1


def test_cramers_v_known_association(spark):
    import numpy as np

    from ddspark.profile import cramers_v, cramers_v_oracle_sql

    # perfect association: r determines c -> V = 1
    perfect = spark.createDataFrame(
        [("a", "x")] * 50 + [("b", "y")] * 50, "r string, c string"
    )
    row = cramers_v(perfect, "r", "c").collect()[0]
    assert row["v"] == 1.0 and row["n"] == 100

    # independence: V ~ 0
    rng = np.random.default_rng(37)
    r = rng.choice(["a", "b", "c"], 3000)
    c = rng.choice(["x", "y"], 3000)
    df = spark.createDataFrame(list(zip(r.tolist(), c.tolist())), "r string, c string")
    row = cramers_v(df, "r", "c").collect()[0]
    assert row["v"] < 0.05

    # scipy-free chi2 cross-check on the random table
    import collections

    n = 3000
    cells = collections.Counter(zip(r, c))
    rt = collections.Counter(r)
    ct = collections.Counter(c)
    import math

    micro = 0
    for (rr, cc), o in cells.items():
        e = rt[rr] * ct[cc] / n
        micro += math.floor(1e6 * (o - e) * (o - e) / e)
    assert row["chi2"] == round(micro / 1e6, 6)

    duck = _duck(cramers_v_oracle_sql("t", "r", "c"), {"t": df.toPandas()})[0]
    assert tuple(row) == duck


def test_cramers_v_degenerate_single_row_level(spark):
    from ddspark.profile import cramers_v

    df = spark.createDataFrame(
        [("a", "x"), ("a", "y"), ("a", "x")], "r string, c string"
    )
    row = cramers_v(df, "r", "c").collect()[0]
    assert row["n_rows"] == 1 and row["v"] is None


def test_anova_f_matches_scipy_formula(spark):
    """Three groups with known means: F computed by the textbook
    between/within decomposition (replayed in pure Python) and eta2 in
    [0,1]; equal-groups F ~ 0."""
    import itertools

    from ddspark.profile import anova_f

    groups = {"a": [1, 2, 3, 4], "b": [2, 3, 4, 5], "c": [10, 11, 12, 13]}
    rows = [(g, float(v)) for g, vs in groups.items() for v in vs]
    df = spark.createDataFrame(rows, "g string, v double")
    got = anova_f(df, "v", "g").collect()[0]
    # python replay with the same quantization (scale=1, integer values)
    import math

    tg = {g: math.floor(sum(vs) ** 2 / len(vs)) for g, vs in groups.items()}
    allv = list(itertools.chain(*groups.values()))
    n, k = len(allv), len(groups)
    tsum = sum(tg.values())
    ssb = tsum - math.floor(sum(allv) ** 2 / n)
    ssw = sum(v * v for v in allv) - tsum
    f = (ssb / (k - 1)) / (ssw / (n - k))
    assert (got["k"], got["n"]) == (3, 12)
    assert got["ss_between"] == round(ssb, 6)
    assert got["ss_within"] == round(ssw, 6)
    assert got["f_stat"] == round(f, 6)
    assert got["eta2"] == round(ssb / (ssb + ssw), 6)
    # scipy-free sanity: same groups -> F near 0 is false here (c differs)
    assert got["f_stat"] > 10

    # identical groups -> SSB quantization noise only, eta2 ~ 0
    same = spark.createDataFrame(
        [(g, float(v)) for g in "ab" for v in [5, 6, 7]], "g string, v double"
    )
    r = anova_f(same, "v", "g").collect()[0]
    assert abs(r["eta2"]) < 0.01

    # degenerate: one group -> NULL stats, counts still there
    one = spark.createDataFrame([("a", 1.0), ("a", 2.0)], "g string, v double")
    r1 = anova_f(one, "v", "g").collect()[0]
    assert r1["k"] == 1 and r1["f_stat"] is None and r1["eta2"] is None


def test_anova_f_duckdb_twin(spark, sf_dir):
    import duckdb

    from ddspark.profile import anova_f, anova_f_oracle_sql

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    got = tuple(anova_f(ev, "value", "event_type", scale=100).collect()[0])
    con = duckdb.connect()
    con.execute(f"CREATE VIEW events AS SELECT * FROM '{sf_dir}/events.parquet'")
    want = tuple(
        con.execute(
            anova_f_oracle_sql("events", "value", "event_type", scale=100)
        ).fetchone()
    )
    assert got == want
