"""Table profiling — the ANALYZE pass a 100 TB ingest runs before anything
else: per-column null counts, exact distinct cardinalities, and min/max,
all from ONE scan.

Spark-first: every column's aggregates go into a single ``agg`` (multiple
DISTINCT aggregates lower to one Expand + partial aggregation — one pass
over the data, never one job per column), and the wide 1-row result
unpivots to one-row-per-column with ``stack`` — driver never sees raw
rows.  min/max surface as strings so heterogeneous column types fit one
output schema (numeric columns keep their natural formatting; profile a
floored integer copy when you need cross-engine exactness on doubles).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

__all__ = [
    "profile_table",
    "pearson_corr_exact",
    "pearson_corr_exact_oracle_sql",
    "crosstab_chi2",
    "crosstab_chi2_oracle_sql",
    "column_entropy",
    "column_entropy_oracle_sql",
    "spearman_corr_exact",
    "spearman_corr_exact_oracle_sql",
    "fixed_width_histogram",
    "fixed_width_histogram_oracle_sql",
    "fixed_width_histogram_grouped",
    "fixed_width_histogram_grouped_oracle_sql",
    "ks_drift",
    "ks_drift_oracle_sql",
    "pearson_corr_matrix",
    "pearson_corr_matrix_oracle_sql",
    "benford_screen",
    "benford_screen_oracle_sql",
    "mannwhitney_u",
    "mannwhitney_u_oracle_sql",
    "ols_fit_exact",
    "ols_fit_exact_oracle_sql",
    "gini_exact",
    "gini_exact_oracle_sql",
    "mad_outliers",
    "mad_outliers_oracle_sql",
    "psi_drift",
    "psi_drift_oracle_sql",
    "bootstrap_ci_mean",
    "bootstrap_ci_mean_oracle_sql",
    "welch_t",
    "welch_t_oracle_sql",
    "anova_f",
    "anova_f_oracle_sql",
    "cramers_v",
    "cramers_v_oracle_sql",
]


def profile_table(
    df: DataFrame,
    cols: list[str] | None = None,
    distinct: bool = True,
) -> DataFrame:
    """Profile ``cols`` (default: every column): one output row per column
    with ``(column, dtype, n, n_null, n_distinct, min_s, max_s)``.
    ``distinct=False`` skips the exact distinct counts (the Expand
    multiplies the pre-aggregation rows by the column count — exact
    cardinality is the expensive metric; nulls and extremes are nearly
    free)."""
    cols = list(cols or df.columns)
    missing = [c for c in cols if c not in df.columns]
    if missing:
        raise ValueError(f"columns not in DataFrame: {missing}")
    bad = [c for c in cols if "'" in c or "`" in c]
    if bad:
        # column names are spliced into the stack() SQL string literal
        raise ValueError(f"column names with quotes are unsupported: {bad}")
    dtypes = dict(df.dtypes)

    aggs = [F.count(F.lit(1)).alias("_n")]
    for i, c in enumerate(cols):
        aggs.append(F.count(F.col(c)).alias(f"_nn{i}"))
        if distinct:
            aggs.append(F.countDistinct(F.col(c)).alias(f"_nd{i}"))
        aggs.append(F.min(F.col(c)).cast("string").alias(f"_mn{i}"))
        aggs.append(F.max(F.col(c)).cast("string").alias(f"_mx{i}"))
    wide = df.agg(*aggs)

    nd = (lambda i: f"_nd{i}") if distinct else (lambda i: "CAST(NULL AS BIGINT)")
    parts = []
    for i, c in enumerate(cols):
        parts.append(
            f"'{c}', '{dtypes[c]}', _n, _n - _nn{i}, {nd(i)}, _mn{i}, _mx{i}"
        )
    stacked = wide.select(
        F.expr(
            f"stack({len(cols)}, {', '.join(parts)}) AS "
            "(column, dtype, n, n_null, n_distinct, min_s, max_s)"
        )
    )
    return stacked


def pearson_corr_exact(
    df: DataFrame,
    x_col: str,
    y_col: str,
    by: list[str] | None = None,
    x_scale: int = 1,
    y_scale: int = 1,
    ndigits: int = 6,
) -> DataFrame:
    """Pearson correlation with cross-engine bit-reproducible results:
    ``(by..., n, corr)``.

    ``F.corr``'s streaming-covariance accumulation is float and
    partition-order dependent, so two runs (or two engines) disagree in
    the last ulps and a value-hashing gate can't vouch for it.  This
    version is deterministic: values are scaled to integers (``x_scale``
    = 10^decimals, e.g. 100 for 2-dp prices), all five sums
    (Σx, Σy, Σxy, Σx², Σy²) accumulate as exact DECIMAL integers
    (order-independent), and only the final textbook combination

        corr = (nΣxy − ΣxΣy) / (√(nΣx² − Σx²) · √(nΣy² − Σy²))

    runs in double — a fixed sequence of correctly-rounded IEEE-754 ops
    on exact inputs, identical in any engine (sqrt is correctly rounded
    per IEEE).  One scan, one partial+final aggregation; the scan stays
    pruned to ``by + [x, y]``.

    Precision bounds: a scaled value must fit the per-row product —
    |x·y| < 10^18 after scaling (DECIMAL(18,0) each, product
    DECIMAL(37,0), sums DECIMAL(38,0) ≈ 10^38 headroom for ~10^19 rows
    of max-magnitude products; Spark raises on overflow under ANSI
    rather than wrapping).  Constant columns yield NULL (zero variance).
    """
    by = list(by or [])
    xi = F.round(F.col(x_col) * x_scale).cast("decimal(18,0)")
    yi = F.round(F.col(y_col) * y_scale).cast("decimal(18,0)")
    pre = df.where(
        F.col(x_col).isNotNull() & F.col(y_col).isNotNull()
    ).select(*by, xi.alias("_x"), yi.alias("_y"))
    sums = pre.groupBy(*by).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("_x").cast("double").alias("_sx"),
        F.sum("_y").cast("double").alias("_sy"),
        F.sum(F.col("_x") * F.col("_y")).cast("double").alias("_sxy"),
        F.sum(F.col("_x") * F.col("_x")).cast("double").alias("_sxx"),
        F.sum(F.col("_y") * F.col("_y")).cast("double").alias("_syy"),
    )
    nd = F.col("n").cast("double")
    var_x = nd * F.col("_sxx") - F.col("_sx") * F.col("_sx")
    var_y = nd * F.col("_syy") - F.col("_sy") * F.col("_sy")
    num = nd * F.col("_sxy") - F.col("_sx") * F.col("_sy")
    corr = F.when(
        (var_x > 0) & (var_y > 0),
        F.round(num / (F.sqrt(var_x) * F.sqrt(var_y)), ndigits),
    )
    return sums.select(*by, "n", corr.alias("corr"))


def pearson_corr_exact_oracle_sql(
    table: str,
    x_col: str,
    y_col: str,
    by: list[str] | None = None,
    x_scale: int = 1,
    y_scale: int = 1,
    ndigits: int = 6,
) -> str:
    """ANSI twin of :func:`pearson_corr_exact` — same decimal sums, same
    double combination order."""
    by = list(by or [])
    by_sel = "".join(f"{c}, " for c in by)
    group = f"GROUP BY {', '.join(by)}" if by else ""
    return f"""
WITH pre AS (
  SELECT {by_sel}
         CAST(ROUND({x_col} * {x_scale}) AS DECIMAL(18,0)) AS x,
         CAST(ROUND({y_col} * {y_scale}) AS DECIMAL(18,0)) AS y
  FROM {table}
  WHERE {x_col} IS NOT NULL AND {y_col} IS NOT NULL
),
sums AS (
  SELECT {by_sel}
         COUNT(*) AS n,
         CAST(SUM(x) AS DOUBLE) AS sx,
         CAST(SUM(y) AS DOUBLE) AS sy,
         CAST(SUM(x * y) AS DOUBLE) AS sxy,
         CAST(SUM(x * x) AS DOUBLE) AS sxx,
         CAST(SUM(y * y) AS DOUBLE) AS syy
  FROM pre {group}
)
SELECT {by_sel} n,
       CASE WHEN CAST(n AS DOUBLE) * sxx - sx * sx > 0
             AND CAST(n AS DOUBLE) * syy - sy * sy > 0
            THEN ROUND((CAST(n AS DOUBLE) * sxy - sx * sy) /
                       (SQRT(CAST(n AS DOUBLE) * sxx - sx * sx) *
                        SQRT(CAST(n AS DOUBLE) * syy - sy * sy)), {ndigits})
       END AS corr
FROM sums
""".strip()


def crosstab_chi2(
    df: DataFrame,
    row_col: str,
    col_col: str,
    ndigits: int = 6,
) -> DataFrame:
    """Chi-square contingency table: one row per (row, col) cell with
    ``observed`` (exact BIGINT), ``expected`` = row_total·col_total/N,
    and the cell's chi-square contribution ``(O−E)²/E`` (both rounded).

    The independence screen a corpus profiler runs on categorical pairs
    (language × source, split × label) to spot sampling bias.  Per-cell
    contributions are emitted instead of the summed statistic so every
    output value is a fixed-order double expression on exact integer
    counts — deterministic cross-engine, where a float sum over cells
    would be partition-order dependent.  Plan: one (row, col) count
    aggregation plus two marginal aggregations joined back on their
    keys — three narrow shuffles over counts, never over data rows.
    """
    cell = df.groupBy(row_col, col_col).agg(F.count(F.lit(1)).alias("observed"))
    rtot = df.groupBy(row_col).agg(F.count(F.lit(1)).alias("_rt"))
    ctot = df.groupBy(col_col).agg(F.count(F.lit(1)).alias("_ct"))
    ntot = df.agg(F.count(F.lit(1)).alias("_n"))
    e = (
        F.col("_rt").cast("double")
        * F.col("_ct").cast("double")
        / F.col("_n").cast("double")
    )
    o = F.col("observed").cast("double")
    return (
        cell.join(rtot, row_col)
        .join(ctot, col_col)
        .crossJoin(F.broadcast(ntot))
        .select(
            row_col,
            col_col,
            "observed",
            F.round(e, ndigits).alias("expected"),
            F.round((o - e) * (o - e) / e, ndigits).alias("chi2_contrib"),
        )
    )


def crosstab_chi2_oracle_sql(
    table: str, row_col: str, col_col: str, ndigits: int = 6
) -> str:
    """ANSI twin of :func:`crosstab_chi2`."""
    return f"""
WITH cell AS (
  SELECT {row_col}, {col_col}, COUNT(*) AS observed
  FROM {table} GROUP BY 1, 2
),
rtot AS (SELECT {row_col}, COUNT(*) AS rt FROM {table} GROUP BY 1),
ctot AS (SELECT {col_col}, COUNT(*) AS ct FROM {table} GROUP BY 1),
ntot AS (SELECT COUNT(*) AS n FROM {table})
SELECT cell.{row_col}, cell.{col_col}, observed,
       ROUND(CAST(rt AS DOUBLE) * CAST(ct AS DOUBLE) / CAST(n AS DOUBLE),
             {ndigits}) AS expected,
       ROUND((CAST(observed AS DOUBLE) -
              CAST(rt AS DOUBLE) * CAST(ct AS DOUBLE) / CAST(n AS DOUBLE))
             * (CAST(observed AS DOUBLE) -
                CAST(rt AS DOUBLE) * CAST(ct AS DOUBLE) / CAST(n AS DOUBLE))
             / (CAST(rt AS DOUBLE) * CAST(ct AS DOUBLE) / CAST(n AS DOUBLE)),
             {ndigits}) AS chi2_contrib
FROM cell
JOIN rtot USING ({row_col})
JOIN ctot USING ({col_col})
CROSS JOIN ntot
""".strip()


def column_entropy(
    df: DataFrame,
    cols: list[str],
    ndigits: int = 6,
) -> DataFrame:
    """Shannon entropy per column, deterministic cross-engine:
    ``(column, n, n_distinct, entropy_nats)``.

    The detector for near-constant columns (entropy ≈ 0), unique-ID
    leaks into features (entropy ≈ ln n), and skewed categoricals.
    ``H = ln N − (Σ_v c_v·ln c_v)/N`` — the inner sum is a float sum
    over distinct values, which would be partition-order dependent, so
    each value's term is floor-quantized to an integer
    (``floor(1e6·c·ln c)``, exact BIGINT) and summed EXACTLY; the final
    entropy is one fixed-order double expression over two exact
    integers.  Quantization bias is < 1e-6 nats per distinct value,
    bounded and documented rather than order-dependent.

    One scan for all columns: rows unpivot via ``stack`` to
    ``(column, value)`` (values compared as strings; NULL is its own
    category), then a single (column, value) count aggregation and a
    per-column rollup of the quantized terms.  Shuffle carries value
    counts, never rows beyond the unpivot projection.
    """
    missing = [c for c in cols if c not in df.columns]
    if missing:
        raise ValueError(f"columns not in DataFrame: {missing}")
    bad = [c for c in cols if "'" in c or "`" in c]
    if bad:
        raise ValueError(f"column names with quotes are unsupported: {bad}")
    parts = ", ".join(
        f"'{c}', coalesce(CAST(`{c}` AS STRING), '\\u0000NULL')" for c in cols
    )
    long = df.selectExpr(f"stack({len(cols)}, {parts}) AS (column, value)")
    counts = long.groupBy("column", "value").agg(
        F.count(F.lit(1)).alias("c")
    )
    per_col = counts.groupBy("column").agg(
        F.sum("c").alias("n"),
        F.count(F.lit(1)).alias("n_distinct"),
        F.sum(
            F.floor(
                F.lit(1e6)
                * F.col("c").cast("double")
                * F.log(F.col("c").cast("double"))
            ).cast("long")
        ).alias("_s_micro"),
    )
    h = F.log(F.col("n").cast("double")) - (
        F.col("_s_micro").cast("double")
        / (F.lit(1e6) * F.col("n").cast("double"))
    )
    return per_col.select(
        "column",
        "n",
        "n_distinct",
        F.round(h, ndigits).alias("entropy_nats"),
    )


def column_entropy_oracle_sql(
    table: str, cols: list[str], ndigits: int = 6
) -> str:
    """ANSI twin of :func:`column_entropy`."""
    selects = " UNION ALL ".join(
        f"SELECT '{c}' AS \"column\", "
        f"COALESCE(CAST({c} AS VARCHAR), chr(0) || 'NULL') AS value "
        f"FROM {table}"
        for c in cols
    )
    return f"""
WITH long AS ({selects}),
counts AS (SELECT "column", value, COUNT(*) AS c FROM long GROUP BY 1, 2),
per_col AS (
  SELECT "column",
         SUM(c) AS n,
         COUNT(*) AS n_distinct,
         SUM(CAST(FLOOR(1e6 * CAST(c AS DOUBLE) * ln(CAST(c AS DOUBLE))) AS BIGINT))
           AS s_micro
  FROM counts GROUP BY "column"
)
SELECT "column", CAST(n AS BIGINT) AS n, CAST(n_distinct AS BIGINT) AS n_distinct,
       ROUND(ln(CAST(n AS DOUBLE)) -
             (CAST(s_micro AS DOUBLE) / (1e6 * CAST(n AS DOUBLE))),
             {ndigits}) AS entropy_nats
FROM per_col
""".strip()


def spearman_corr_exact(
    df: DataFrame,
    x_col: str,
    y_col: str,
    by: list[str] | None = None,
    ndigits: int = 6,
) -> DataFrame:
    """Spearman rank correlation, deterministic cross-engine:
    ``(by..., n, corr)`` — the robust (monotone-relationship) companion
    to :func:`pearson_corr_exact`, immune to outliers and nonlinearity.

    Ties get average ranks; ``2·avg_rank = 2·min_rank + tie_count − 1``
    is an exact integer, so the whole computation is Pearson on integer
    ranks through the same exact-DECIMAL-sum / fixed-order-double path
    (the shared factor 2 cancels in the correlation).  Rank windows sort
    each group once per axis — two keyed sorts over ``by``; at extreme
    group sizes prefer the sketch quantile operators for distribution
    comparisons instead of a full rank sort.
    """
    from pyspark.sql import Window as _W

    by = list(by or [])
    part = by if by else [F.lit(1)]

    def rank2(c: str) -> F.Column:
        w = _W.partitionBy(*part).orderBy(F.col(c))
        tie = _W.partitionBy(*part, c)
        return (
            2 * F.rank().over(w) + F.count(F.lit(1)).over(tie) - 1
        ).cast("double")

    pre = df.where(
        F.col(x_col).isNotNull() & F.col(y_col).isNotNull()
    ).select(*by, F.col(x_col), F.col(y_col))
    ranked = pre.select(
        *by, rank2(x_col).alias("_rx"), rank2(y_col).alias("_ry")
    )
    return pearson_corr_exact(ranked, "_rx", "_ry", by=by, ndigits=ndigits)


def spearman_corr_exact_oracle_sql(
    table: str,
    x_col: str,
    y_col: str,
    by: list[str] | None = None,
    ndigits: int = 6,
) -> str:
    """ANSI twin of :func:`spearman_corr_exact`."""
    by = list(by or [])
    by_sel = "".join(f"{c}, " for c in by)
    part = ", ".join(by) if by else "1"
    ranked = f"""(
  SELECT {by_sel}
         CAST(2 * RANK() OVER (PARTITION BY {part} ORDER BY {x_col})
              + COUNT(*) OVER (PARTITION BY {part}, {x_col}) - 1 AS DOUBLE) AS _rx,
         CAST(2 * RANK() OVER (PARTITION BY {part} ORDER BY {y_col})
              + COUNT(*) OVER (PARTITION BY {part}, {y_col}) - 1 AS DOUBLE) AS _ry
  FROM {table}
  WHERE {x_col} IS NOT NULL AND {y_col} IS NOT NULL
) ranked"""
    return pearson_corr_exact_oracle_sql(
        ranked, "_rx", "_ry", by=by, ndigits=ndigits
    )


def fixed_width_histogram(
    df: DataFrame,
    col: str,
    k: int = 10,
    ndigits: int = 6,
) -> DataFrame:
    """Fixed-width histogram over the global [min, max] range of ``col``:
    ``(bucket, lo, hi, n)`` with ``k`` equal-width buckets (the last
    bucket closed on max).

    The complement to the sketch-driven equi-depth binning
    (``agg.bucket_by_quantiles``): equi-WIDTH shows the shape of the
    distribution; equi-DEPTH balances partition sizes.  Bucket
    assignment ``least(floor((v−min)·k/(max−min)), k−1)`` is a fixed
    sequence of correctly-rounded double ops on the broadcast global
    extremes, so cell counts are deterministic cross-engine.  Plan: one
    4-number extremes aggregate broadcast into a map-side bucket
    expression + one k-row count aggregation — two scans of one column
    or one with cache; empty buckets are emitted with n=0 via a
    sequence-generated bucket spine (so the output shape is always k).
    Degenerate min==max collapses to one bucket holding everything.
    """
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    ext = df.where(F.col(col).isNotNull()).agg(
        F.min(col).cast("double").alias("_mn"),
        F.max(col).cast("double").alias("_mx"),
    )
    v = F.col(col).cast("double")
    span = F.col("_mx") - F.col("_mn")
    bucket = F.when(span == 0, F.lit(0)).otherwise(
        F.least(
            F.floor((v - F.col("_mn")) * k / span).cast("int"), F.lit(k - 1)
        )
    )
    counts = (
        df.where(F.col(col).isNotNull())
        .crossJoin(F.broadcast(ext))
        .select(bucket.alias("bucket"), "_mn", "_mx")
        .groupBy("bucket", "_mn", "_mx")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    spine = (
        df.sparkSession.range(k)
        .select(F.col("id").cast("int").alias("bucket"))
        .crossJoin(F.broadcast(ext))
    )
    out = spine.join(counts, ["bucket", "_mn", "_mx"], "left").select(
        "bucket",
        F.round(
            F.col("_mn")
            + F.col("bucket") * (F.col("_mx") - F.col("_mn")) / k,
            ndigits,
        ).alias("lo"),
        F.round(
            F.col("_mn")
            + (F.col("bucket") + 1) * (F.col("_mx") - F.col("_mn")) / k,
            ndigits,
        ).alias("hi"),
        F.coalesce(F.col("n"), F.lit(0)).alias("n"),
    )
    return out


def fixed_width_histogram_oracle_sql(
    table: str, col: str, k: int = 10, ndigits: int = 6
) -> str:
    """ANSI twin of :func:`fixed_width_histogram`."""
    return f"""
WITH ext AS (
  SELECT CAST(MIN({col}) AS DOUBLE) AS mn, CAST(MAX({col}) AS DOUBLE) AS mx
  FROM {table} WHERE {col} IS NOT NULL
),
counts AS (
  SELECT CASE WHEN ext.mx - ext.mn = 0 THEN 0
              ELSE LEAST(CAST(FLOOR((CAST({col} AS DOUBLE) - ext.mn) * {k} / (ext.mx - ext.mn)) AS INT), {k - 1})
         END AS bucket,
         COUNT(*) AS n
  FROM {table} CROSS JOIN ext
  WHERE {col} IS NOT NULL
  GROUP BY 1
),
spine AS (SELECT CAST(u.b AS INT) AS bucket FROM UNNEST(generate_series(0, {k - 1})) AS u(b))
SELECT spine.bucket,
       ROUND(ext.mn + spine.bucket * (ext.mx - ext.mn) / {k}, {ndigits}) AS lo,
       ROUND(ext.mn + (spine.bucket + 1) * (ext.mx - ext.mn) / {k}, {ndigits}) AS hi,
       COALESCE(counts.n, 0) AS n
FROM spine
CROSS JOIN ext
LEFT JOIN counts ON counts.bucket = spine.bucket
""".strip()


def ks_drift(
    df: DataFrame,
    value_col: str,
    group_col: str,
    group_a: str,
    group_b: str,
    ndigits: int = 6,
) -> DataFrame:
    """Exact two-sample Kolmogorov-Smirnov statistic between two groups'
    distributions of ``value_col``: one row
    ``(n_a, n_b, ks, at_value)`` where ``ks = max_v |F_a(v) − F_b(v)|``
    and ``at_value`` is the smallest value attaining it.

    The drift detector for corpus refreshes (did this month's document
    lengths shift?) and split validation (train vs test covariate
    drift).  Exact and deterministic: per-value counts per group are
    integers, CDFs are one cumulative window over the merged DISTINCT
    value axis, and each |F_a − F_b| is a fixed-order double expression
    on exact integers.

    **Scale**: the cumulative window is a single global sort over the
    DISTINCT values (post-aggregation) — fine for integer-ish or
    bounded-cardinality columns (lengths, counts, scores).  For
    continuous high-cardinality columns, pre-bucket (e.g. round, or the
    sketch key expression) so the distinct axis is bounded; the result
    is then the KS of the bucketed CDFs, within one bucket width of
    exact.
    """
    from pyspark.sql import Window as _W

    counts = (
        df.where(F.col(group_col).isin([group_a, group_b]))
        .where(F.col(value_col).isNotNull())
        .groupBy(F.col(value_col).alias("v"))
        .agg(
            F.sum(
                F.when(F.col(group_col) == group_a, 1).otherwise(0)
            ).alias("ca"),
            F.sum(
                F.when(F.col(group_col) == group_b, 1).otherwise(0)
            ).alias("cb"),
        )
    )
    w = _W.orderBy("v").rowsBetween(_W.unboundedPreceding, 0)
    cum = counts.select(
        "v",
        F.sum("ca").over(w).alias("fa"),
        F.sum("cb").over(w).alias("fb"),
    )
    totals = counts.agg(
        F.sum("ca").alias("n_a"), F.sum("cb").alias("n_b")
    )
    diff = cum.crossJoin(F.broadcast(totals)).select(
        "v",
        "n_a",
        "n_b",
        F.abs(
            F.col("fa").cast("double") / F.col("n_a").cast("double")
            - F.col("fb").cast("double") / F.col("n_b").cast("double")
        ).alias("d"),
    )
    best = diff.orderBy(F.col("d").desc(), F.col("v").asc()).limit(1)
    return best.select(
        "n_a",
        "n_b",
        F.round(F.col("d"), ndigits).alias("ks"),
        F.col("v").cast("double").alias("at_value"),
    )


def ks_drift_oracle_sql(
    table: str,
    value_col: str,
    group_col: str,
    group_a: str,
    group_b: str,
    ndigits: int = 6,
) -> str:
    """ANSI twin of :func:`ks_drift`."""
    ea = group_a.replace("'", "''")
    eb = group_b.replace("'", "''")
    return f"""
WITH counts AS (
  SELECT {value_col} AS v,
         SUM(CASE WHEN {group_col} = '{ea}' THEN 1 ELSE 0 END) AS ca,
         SUM(CASE WHEN {group_col} = '{eb}' THEN 1 ELSE 0 END) AS cb
  FROM {table}
  WHERE {group_col} IN ('{ea}', '{eb}') AND {value_col} IS NOT NULL
  GROUP BY 1
),
cum AS (
  SELECT v,
         SUM(ca) OVER (ORDER BY v ROWS UNBOUNDED PRECEDING) AS fa,
         SUM(cb) OVER (ORDER BY v ROWS UNBOUNDED PRECEDING) AS fb
  FROM counts
),
totals AS (SELECT SUM(ca) AS n_a, SUM(cb) AS n_b FROM counts),
diff AS (
  SELECT v, n_a, n_b,
         ABS(CAST(fa AS DOUBLE) / CAST(n_a AS DOUBLE)
             - CAST(fb AS DOUBLE) / CAST(n_b AS DOUBLE)) AS d
  FROM cum CROSS JOIN totals
)
SELECT CAST(n_a AS BIGINT) AS n_a, CAST(n_b AS BIGINT) AS n_b,
       ROUND(d, {ndigits}) AS ks, CAST(v AS DOUBLE) AS at_value
FROM diff
ORDER BY d DESC, v ASC
LIMIT 1
""".strip()


def pearson_corr_matrix(
    df: DataFrame,
    cols: list[str],
    scales: list[int] | None = None,
    ndigits: int = 6,
) -> DataFrame:
    """All pairwise deterministic Pearson correlations among ``cols`` from
    ONE scan: ``(col_x, col_y, n, corr)`` for every pair x < y (by input
    order).

    The feature-redundancy screen of a corpus profiler.  A naive loop
    over :func:`pearson_corr_exact` scans the table k(k−1)/2 times; here
    every sum — k column sums, k squares, k(k−1)/2 cross-products, all
    exact DECIMAL integers — lands in ONE aggregation, and each pair's
    correlation is the same fixed-order double combination.  Rows with a
    NULL in ANY profiled column are dropped (one shared mask keeps every
    pair's n identical — the listwise-deletion convention).  Output rows
    come from exploding a computed struct array over the single wide agg
    row, so no branch recomputes the aggregate.  Same DECIMAL(18) per
    value / DECIMAL(37) per product overflow bounds as
    :func:`pearson_corr_exact`.
    """
    if len(cols) < 2:
        raise ValueError("pearson_corr_matrix needs at least two columns")
    if len(set(cols)) != len(cols):
        raise ValueError(f"duplicate columns: {cols}")
    missing = [c for c in cols if c not in df.columns]
    if missing:
        raise ValueError(f"columns not in DataFrame: {missing}")
    scales = list(scales) if scales is not None else [1] * len(cols)
    if len(scales) != len(cols):
        raise ValueError("scales must align with cols")

    mask = F.lit(True)
    for c in cols:
        mask = mask & F.col(c).isNotNull()
    pre = df.where(mask).select(
        *[
            F.round(F.col(c) * s).cast("decimal(18,0)").alias(f"_x{i}")
            for i, (c, s) in enumerate(zip(cols, scales))
        ]
    )
    aggs = [F.count(F.lit(1)).alias("_n")]
    for i in range(len(cols)):
        aggs.append(F.sum(f"_x{i}").cast("double").alias(f"_s{i}"))
        aggs.append(
            F.sum(F.col(f"_x{i}") * F.col(f"_x{i}")).cast("double").alias(f"_q{i}")
        )
    for i in range(len(cols)):
        for j in range(i + 1, len(cols)):
            aggs.append(
                F.sum(F.col(f"_x{i}") * F.col(f"_x{j}"))
                .cast("double")
                .alias(f"_p{i}_{j}")
            )
    wide = pre.agg(*aggs)

    nd = F.col("_n").cast("double")
    structs = []
    for i in range(len(cols)):
        for j in range(i + 1, len(cols)):
            var_x = nd * F.col(f"_q{i}") - F.col(f"_s{i}") * F.col(f"_s{i}")
            var_y = nd * F.col(f"_q{j}") - F.col(f"_s{j}") * F.col(f"_s{j}")
            num = nd * F.col(f"_p{i}_{j}") - F.col(f"_s{i}") * F.col(f"_s{j}")
            corr = F.when(
                (var_x > 0) & (var_y > 0),
                F.round(num / (F.sqrt(var_x) * F.sqrt(var_y)), ndigits),
            )
            structs.append(
                F.struct(
                    F.lit(cols[i]).alias("col_x"),
                    F.lit(cols[j]).alias("col_y"),
                    corr.alias("corr"),
                )
            )
    return wide.select(
        "_n", F.explode(F.array(*structs)).alias("_pair")
    ).select(
        F.col("_pair.col_x").alias("col_x"),
        F.col("_pair.col_y").alias("col_y"),
        F.col("_n").alias("n"),
        F.col("_pair.corr").alias("corr"),
    )


def pearson_corr_matrix_oracle_sql(
    table: str,
    cols: list[str],
    scales: list[int] | None = None,
    ndigits: int = 6,
) -> str:
    """ANSI twin of :func:`pearson_corr_matrix` — the same shared NULL
    mask and per-pair combination, one UNION ALL branch per pair."""
    scales = list(scales) if scales is not None else [1] * len(cols)
    mask = " AND ".join(f"{c} IS NOT NULL" for c in cols)
    masked = f"(SELECT * FROM {table} WHERE {mask}) m"
    parts = []
    for i in range(len(cols)):
        for j in range(i + 1, len(cols)):
            inner = pearson_corr_exact_oracle_sql(
                masked, cols[i], cols[j],
                x_scale=scales[i], y_scale=scales[j], ndigits=ndigits,
            )
            parts.append(
                f"SELECT '{cols[i]}' AS col_x, '{cols[j]}' AS col_y, n, corr "
                f"FROM ({inner}) p{i}_{j}"
            )
    return "\nUNION ALL\n".join(parts)


def benford_screen(
    df: DataFrame,
    col: str,
) -> DataFrame:
    """Benford first-digit screen over an integer-valued column: one row
    per leading digit 1-9 with ``observed`` (exact BIGINT) and
    ``expected_micro`` = N·floor(1e6·log10(1+1/d)) — the fabricated-data
    / unit-mixing detector for numeric columns spanning several orders
    of magnitude.

    Determinism notes: values route through ``floor(abs(col))`` (NOT a
    double->BIGINT cast: Spark's cast truncates where DuckDB's ROUNDS)
    and the digit is the first character of the BIGINT's decimal string
    — integer-to-string is identical cross-engine, where
    ``floor(log10(v))`` on doubles is NOT (log10(1000) rounds below 3
    in some libms).  The per-digit expectation quantizes the libm call
    behind the same floor(1e6·…) pattern the gate already vouches for,
    then scales by exact-integer N — every output value is a BIGINT.
    Zeros and NULLs are excluded from N.  One map-side digit expression
    + one 9-row aggregation; digits absent from the data are emitted
    with observed=0 via a spine.
    """
    import math

    v = F.floor(F.abs(F.col(col))).cast("bigint")
    digits = (
        df.where(F.col(col).isNotNull())
        .select(v.alias("_v"))
        .where(F.col("_v") > 0)
        .select(F.substring(F.col("_v").cast("string"), 1, 1).cast("int").alias("digit"))
    )
    counts = digits.groupBy("digit").agg(F.count(F.lit(1)).alias("observed"))
    total = digits.agg(F.count(F.lit(1)).alias("_n"))
    spine = df.sparkSession.range(1, 10).select(
        F.col("id").cast("int").alias("digit")
    )
    e_micro = {d: math.floor(1e6 * math.log10(1 + 1 / d)) for d in range(1, 10)}
    e_col = F.lit(None).cast("long")
    for d in range(1, 10):
        e_col = F.when(F.col("digit") == d, F.lit(e_micro[d])).otherwise(e_col)
    return (
        spine.join(counts, "digit", "left")
        .crossJoin(F.broadcast(total))
        .select(
            "digit",
            F.coalesce(F.col("observed"), F.lit(0)).alias("observed"),
            (e_col * F.col("_n")).alias("expected_micro"),
        )
    )


def benford_screen_oracle_sql(table: str, col: str) -> str:
    """ANSI twin of :func:`benford_screen` (same python-side quantized
    per-digit constants — the floor'd values are data-independent, so
    both engines splice in the SAME integers)."""
    import math

    cases = " ".join(
        f"WHEN {d} THEN {math.floor(1e6 * math.log10(1 + 1 / d))}"
        for d in range(1, 10)
    )
    return f"""
WITH digits AS (
  SELECT CAST(substr(CAST(CAST(FLOOR(ABS({col})) AS BIGINT) AS VARCHAR), 1, 1) AS INT) AS digit
  FROM {table}
  WHERE {col} IS NOT NULL AND FLOOR(ABS({col})) > 0
),
counts AS (SELECT digit, COUNT(*) AS observed FROM digits GROUP BY 1),
total AS (SELECT COUNT(*) AS n FROM digits),
spine AS (SELECT CAST(u.d AS INT) AS digit FROM UNNEST(generate_series(1, 9)) AS u(d))
SELECT spine.digit,
       COALESCE(counts.observed, 0) AS observed,
       (CASE spine.digit {cases} END) * total.n AS expected_micro
FROM spine
LEFT JOIN counts ON counts.digit = spine.digit
CROSS JOIN total
""".strip()


def mannwhitney_u(
    df: DataFrame,
    value_col: str,
    group_col: str,
    group_a: str,
    group_b: str,
    ndigits: int = 6,
) -> DataFrame:
    """Exact Mann-Whitney U (Wilcoxon rank-sum) between two groups: one
    row ``(n_a, n_b, u2_a, u2_b, auc)``.

    The nonparametric location-shift companion to :func:`ks_drift`
    (KS sees any distributional difference; U targets "does one group
    tend to have larger values", with AUC = U_a/(n_a·n_b) as the
    probability a random a-value exceeds a random b-value — the
    effect-size number a curation A/B readout wants).

    Everything is integer-exact: per-value counts, tie-averaged rank
    sums via the doubled form ``2·avg_rank(v) = 2·C_v + c_v + 1`` (C_v =
    rows before v, c_v = rows at v), ``u2 = 2U`` stays BIGINT, and the
    identity ``u2_a + u2_b = 2·n_a·n_b`` is a built-in self-check.  Only
    the AUC is a (fixed-order, rounded) double.  Same scale posture as
    :func:`ks_drift`: the cumulative window runs over DISTINCT values
    post-aggregation — pre-bucket continuous high-cardinality columns.
    """
    from pyspark.sql import Window as _W

    counts = (
        df.where(F.col(group_col).isin([group_a, group_b]))
        .where(F.col(value_col).isNotNull())
        .groupBy(F.col(value_col).alias("v"))
        .agg(
            F.sum(
                F.when(F.col(group_col) == group_a, 1).otherwise(0)
            ).alias("ca"),
            F.sum(
                F.when(F.col(group_col) == group_b, 1).otherwise(0)
            ).alias("cb"),
        )
    )
    w = _W.orderBy("v").rowsBetween(_W.unboundedPreceding, -1)
    with_c = counts.select(
        "v",
        "ca",
        "cb",
        F.coalesce(F.sum(F.col("ca") + F.col("cb")).over(w), F.lit(0)).alias(
            "_before"
        ),
    )
    # 2*rank-sum contribution of value v for group a: ca * (2C + c + 1)
    sums = with_c.agg(
        F.sum("ca").alias("n_a"),
        F.sum("cb").alias("n_b"),
        F.sum(
            F.col("ca")
            * (2 * F.col("_before") + F.col("ca") + F.col("cb") + 1)
        ).alias("_r2a"),
    )
    u2a = F.col("_r2a") - F.col("n_a") * (F.col("n_a") + 1)
    u2b = 2 * F.col("n_a") * F.col("n_b") - u2a
    return sums.select(
        "n_a",
        "n_b",
        u2a.alias("u2_a"),
        u2b.alias("u2_b"),
        F.round(
            u2a.cast("double")
            / (2.0 * F.col("n_a").cast("double") * F.col("n_b").cast("double")),
            ndigits,
        ).alias("auc"),
    )


def mannwhitney_u_oracle_sql(
    table: str,
    value_col: str,
    group_col: str,
    group_a: str,
    group_b: str,
    ndigits: int = 6,
) -> str:
    """ANSI twin of :func:`mannwhitney_u`."""
    ea = group_a.replace("'", "''")
    eb = group_b.replace("'", "''")
    return f"""
WITH counts AS (
  SELECT {value_col} AS v,
         SUM(CASE WHEN {group_col} = '{ea}' THEN 1 ELSE 0 END) AS ca,
         SUM(CASE WHEN {group_col} = '{eb}' THEN 1 ELSE 0 END) AS cb
  FROM {table}
  WHERE {group_col} IN ('{ea}', '{eb}') AND {value_col} IS NOT NULL
  GROUP BY 1
),
with_c AS (
  SELECT v, ca, cb,
         COALESCE(SUM(ca + cb) OVER (ORDER BY v
             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS before
  FROM counts
),
sums AS (
  SELECT SUM(ca) AS n_a, SUM(cb) AS n_b,
         SUM(ca * (2 * before + ca + cb + 1)) AS r2a
  FROM with_c
)
SELECT CAST(n_a AS BIGINT) AS n_a, CAST(n_b AS BIGINT) AS n_b,
       CAST(r2a - n_a * (n_a + 1) AS BIGINT) AS u2_a,
       CAST(2 * n_a * n_b - (r2a - n_a * (n_a + 1)) AS BIGINT) AS u2_b,
       ROUND(CAST(r2a - n_a * (n_a + 1) AS DOUBLE)
             / (2.0 * CAST(n_a AS DOUBLE) * CAST(n_b AS DOUBLE)),
             {ndigits}) AS auc
FROM sums
""".strip()


def fixed_width_histogram_grouped(
    df: DataFrame,
    col: str,
    by: list[str],
    k: int = 10,
    ndigits: int = 6,
) -> DataFrame:
    """Per-group fixed-width histogram: ``(by..., bucket, lo, hi, n)``
    with ``k`` equal-width buckets over EACH group's own [min, max].

    The grouped companion to :func:`fixed_width_histogram` — compare
    value distributions across languages/sources at a glance.  Per-group
    extremes come from one aggregation joined back on the group key
    (keyed join, no broadcast assumption: one row per group can be
    billions of rows); the bucket expression and the spine semantics
    match the global variant (last bucket closed, min==max degenerates
    to bucket 0, empty buckets emitted with n=0).
    """
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    if not by:
        raise ValueError("use fixed_width_histogram for the ungrouped case")
    base = df.where(F.col(col).isNotNull()).select(*by, col)
    ext = base.groupBy(*by).agg(
        F.min(col).cast("double").alias("_mn"),
        F.max(col).cast("double").alias("_mx"),
    )
    v = F.col(col).cast("double")
    span = F.col("_mx") - F.col("_mn")
    bucket = F.when(span == 0, F.lit(0)).otherwise(
        F.least(
            F.floor((v - F.col("_mn")) * k / span).cast("int"), F.lit(k - 1)
        )
    )
    counts = (
        base.join(ext, by)
        .select(*by, bucket.alias("bucket"), "_mn", "_mx")
        .groupBy(*by, "bucket", "_mn", "_mx")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    spine = ext.select(
        *by, "_mn", "_mx",
        F.explode(F.sequence(F.lit(0), F.lit(k - 1))).alias("bucket"),
    )
    return spine.join(counts, by + ["bucket", "_mn", "_mx"], "left").select(
        *by,
        "bucket",
        F.round(
            F.col("_mn") + F.col("bucket") * (F.col("_mx") - F.col("_mn")) / k,
            ndigits,
        ).alias("lo"),
        F.round(
            F.col("_mn")
            + (F.col("bucket") + 1) * (F.col("_mx") - F.col("_mn")) / k,
            ndigits,
        ).alias("hi"),
        F.coalesce(F.col("n"), F.lit(0)).alias("n"),
    )


def fixed_width_histogram_grouped_oracle_sql(
    table: str, col: str, by: list[str], k: int = 10, ndigits: int = 6
) -> str:
    """ANSI twin of :func:`fixed_width_histogram_grouped`."""
    by_sel = ", ".join(by)
    group_pos = ", ".join(str(i) for i in range(1, len(by) + 2))
    return f"""
WITH base AS (
  SELECT {by_sel}, {col} FROM {table} WHERE {col} IS NOT NULL
),
ext AS (
  SELECT {by_sel}, CAST(MIN({col}) AS DOUBLE) AS mn,
         CAST(MAX({col}) AS DOUBLE) AS mx
  FROM base GROUP BY {by_sel}
),
counts AS (
  SELECT {', '.join('base.' + c for c in by)},
         CASE WHEN ext.mx - ext.mn = 0 THEN 0
              ELSE LEAST(CAST(FLOOR((CAST({col} AS DOUBLE) - ext.mn) * {k} / (ext.mx - ext.mn)) AS INT), {k - 1})
         END AS bucket,
         COUNT(*) AS n
  FROM base JOIN ext USING ({by_sel})
  GROUP BY {group_pos}
),
spine AS (
  SELECT {by_sel}, mn, mx, CAST(u.b AS INT) AS bucket
  FROM ext, UNNEST(generate_series(0, {k - 1})) AS u(b)
)
SELECT {', '.join('spine.' + c for c in by)},
       spine.bucket,
       ROUND(spine.mn + spine.bucket * (spine.mx - spine.mn) / {k}, {ndigits}) AS lo,
       ROUND(spine.mn + (spine.bucket + 1) * (spine.mx - spine.mn) / {k}, {ndigits}) AS hi,
       COALESCE(counts.n, 0) AS n
FROM spine
LEFT JOIN counts USING ({by_sel}, bucket)
""".strip()


def ols_fit_exact(
    df: DataFrame,
    x_col: str,
    y_col: str,
    by: list[str] | None = None,
    x_scale: int = 1,
    y_scale: int = 1,
    ndigits: int = 6,
) -> DataFrame:
    """Simple-linear-regression fit per group, cross-engine exact:
    ``(by..., n, slope, intercept, r2)``.

    Same recipe as :func:`pearson_corr_exact`: values scale to integers,
    the five sufficient statistics accumulate as order-independent exact
    DECIMALs, and only the closed-form normal-equation combination

        slope = (nSxy - SxSy) / (nSxx - Sx^2)
        intercept = (Sy - slope_scaled * Sx) / n
        r2 = (nSxy - SxSy)^2 / ((nSxx - Sx^2)(nSyy - Sy^2))

    runs in double as a FIXED op sequence, so Spark and the ANSI twin
    produce bit-identical results.  One scan, one partial+final agg —
    at 10^12 rows this is a map-side-combined reduce to |groups| rows.
    Zero x-variance groups yield NULL slope/intercept/r2.
    """
    by = list(by or [])
    xi = F.round(F.col(x_col) * x_scale).cast("decimal(18,0)")
    yi = F.round(F.col(y_col) * y_scale).cast("decimal(18,0)")
    pre = df.where(
        F.col(x_col).isNotNull() & F.col(y_col).isNotNull()
    ).select(*by, xi.alias("_x"), yi.alias("_y"))
    sums = pre.groupBy(*by).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("_x").cast("double").alias("_sx"),
        F.sum("_y").cast("double").alias("_sy"),
        F.sum(F.col("_x") * F.col("_y")).cast("double").alias("_sxy"),
        F.sum(F.col("_x") * F.col("_x")).cast("double").alias("_sxx"),
        F.sum(F.col("_y") * F.col("_y")).cast("double").alias("_syy"),
    )
    nd = F.col("n").cast("double")
    var_x = nd * F.col("_sxx") - F.col("_sx") * F.col("_sx")
    var_y = nd * F.col("_syy") - F.col("_sy") * F.col("_sy")
    cov = nd * F.col("_sxy") - F.col("_sx") * F.col("_sy")
    # slope in SCALED units; unscale with the same op order as the twin
    slope_s = cov / var_x
    slope = F.round(slope_s * x_scale / y_scale, ndigits)
    intercept = F.round((F.col("_sy") - slope_s * F.col("_sx")) / nd / y_scale, ndigits)
    r2 = F.when(
        (var_x > 0) & (var_y > 0),
        F.round(cov * cov / (var_x * var_y), ndigits),
    )
    return sums.select(
        *by,
        "n",
        F.when(var_x > 0, slope).alias("slope"),
        F.when(var_x > 0, intercept).alias("intercept"),
        r2.alias("r2"),
    )


def ols_fit_exact_oracle_sql(
    table: str,
    x_col: str,
    y_col: str,
    by: list[str] | None = None,
    x_scale: int = 1,
    y_scale: int = 1,
    ndigits: int = 6,
) -> str:
    """ANSI twin of :func:`ols_fit_exact` — same decimal sums, same double
    combination order."""
    by = list(by or [])
    by_sel = "".join(f"{c}, " for c in by)
    group = f"GROUP BY {', '.join(by)}" if by else ""
    return f"""
WITH pre AS (
  SELECT {by_sel}
         CAST(ROUND({x_col} * {x_scale}) AS DECIMAL(18,0)) AS x,
         CAST(ROUND({y_col} * {y_scale}) AS DECIMAL(18,0)) AS y
  FROM {table}
  WHERE {x_col} IS NOT NULL AND {y_col} IS NOT NULL
),
sums AS (
  SELECT {by_sel}
         COUNT(*) AS n,
         CAST(SUM(x) AS DOUBLE) AS sx,
         CAST(SUM(y) AS DOUBLE) AS sy,
         CAST(SUM(x * y) AS DOUBLE) AS sxy,
         CAST(SUM(x * x) AS DOUBLE) AS sxx,
         CAST(SUM(y * y) AS DOUBLE) AS syy
  FROM pre {group}
),
comb AS (
  SELECT {by_sel} n,
         CAST(n AS DOUBLE) * sxx - sx * sx AS var_x,
         CAST(n AS DOUBLE) * syy - sy * sy AS var_y,
         CAST(n AS DOUBLE) * sxy - sx * sy AS cov,
         sx, sy
  FROM sums
)
SELECT {by_sel} n,
       CASE WHEN var_x > 0
            THEN ROUND(cov / var_x * {x_scale} / {y_scale}, {ndigits}) END AS slope,
       CASE WHEN var_x > 0
            THEN ROUND((sy - cov / var_x * sx) / CAST(n AS DOUBLE) / {y_scale}, {ndigits}) END AS intercept,
       CASE WHEN var_x > 0 AND var_y > 0
            THEN ROUND(cov * cov / (var_x * var_y), {ndigits}) END AS r2
FROM comb
""".strip()


def gini_exact(
    df: DataFrame,
    col: str,
    by: list[str] | None = None,
    scale: int = 1,
    ndigits: int = 6,
) -> DataFrame:
    """Gini coefficient of a non-negative measure per group, exact:
    ``(by..., n, gini)``.

    Uses the rank form ``G = (2 * sum(i * x_i) - (n + 1) * sum(x)) /
    (n * sum(x))`` with x sorted ascending.  Every term is an exact
    integer (x scales to integers; ties contribute the same sum under
    any tie order, so row_number's arbitrary tie-break is safe), and the
    final division is one double op on exact inputs — bit-identical
    cross-engine.  One keyed sort + one agg; at scale this is a single
    per-group sort, the same cost class as any exact rank statistic (use
    sketch quantiles when an approximate inequality measure suffices).
    """
    from pyspark.sql import Window as _W

    by = list(by or [])
    part = by if by else [F.lit(1)]
    xi = F.round(F.col(col) * scale).cast("decimal(18,0)")
    pre = df.where(F.col(col).isNotNull()).select(*by, xi.alias("_x"))
    w = _W.partitionBy(*part).orderBy(F.col("_x"))
    ranked = pre.select(
        *by, F.col("_x"), F.row_number().over(w).cast("decimal(18,0)").alias("_i")
    )
    sums = ranked.groupBy(*by).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("_x").alias("_sx"),
        F.sum(F.col("_i") * F.col("_x")).alias("_six"),
    )
    num = (
        F.lit(2).cast("decimal(38,0)") * F.col("_six")
        - (F.col("n") + 1).cast("decimal(38,0)") * F.col("_sx")
    ).cast("double")
    den = (F.col("n").cast("decimal(38,0)") * F.col("_sx")).cast("double")
    return sums.select(
        *by,
        "n",
        F.when(den > 0, F.round(num / den, ndigits)).alias("gini"),
    )


def gini_exact_oracle_sql(
    table: str,
    col: str,
    by: list[str] | None = None,
    scale: int = 1,
    ndigits: int = 6,
) -> str:
    """ANSI twin of :func:`gini_exact`."""
    by = list(by or [])
    by_sel = "".join(f"{c}, " for c in by)
    part = ", ".join(by) if by else "1"
    group = f"GROUP BY {', '.join(by)}" if by else ""
    return f"""
WITH pre AS (
  SELECT {by_sel}
         CAST(ROUND({col} * {scale}) AS DECIMAL(18,0)) AS x
  FROM {table}
  WHERE {col} IS NOT NULL
),
ranked AS (
  SELECT {by_sel} x,
         CAST(ROW_NUMBER() OVER (PARTITION BY {part} ORDER BY x) AS DECIMAL(18,0)) AS i
  FROM pre
),
sums AS (
  SELECT {by_sel}
         COUNT(*) AS n,
         SUM(x) AS sx,
         SUM(i * x) AS six
  FROM ranked {group}
)
SELECT {by_sel} n,
       CASE WHEN CAST(CAST(n AS DECIMAL(38,0)) * sx AS DOUBLE) > 0
            THEN ROUND(CAST(CAST(2 AS DECIMAL(38,0)) * six
                            - CAST(n + 1 AS DECIMAL(38,0)) * sx AS DOUBLE)
                       / CAST(CAST(n AS DECIMAL(38,0)) * sx AS DOUBLE), {ndigits})
       END AS gini
FROM sums
""".strip()


def mad_outliers(
    df: DataFrame,
    col: str,
    by: list[str] | None = None,
    scale: int = 1,
    k: int = 3,
    ndigits: int = 6,
) -> DataFrame:
    """Robust (median / MAD) outlier screen per group, exact:
    ``(by..., n, median, mad, n_outliers)``.

    Medians are rank-explicit — ``2*median = x[lo] + x[hi]`` with
    ``lo = (n+1)/2`` and ``hi = (n+2)/2`` over integer-scaled values, so
    both engines compute the identical integer; absolute deviations stay
    in 2x-scaled integers and the MAD doubles again (``m2dev = 4*mad``),
    making the outlier test ``|x - med| > k*mad`` the pure-integer
    comparison ``2*dev > k*m2dev``.  Two window passes (one sort per
    statistic), one final agg — no joins, no floats until the rounded
    display columns.  At extreme group sizes, swap the exact medians for
    the DDSketch quantile path; this operator is the exact gate twin.
    """
    from pyspark.sql import Window as _W

    by = list(by or [])
    part = by if by else [F.lit(1)]
    xi = F.round(F.col(col) * scale).cast("long")
    pre = df.where(F.col(col).isNotNull()).select(*by, xi.alias("_x"))
    grp = _W.partitionBy(*part)
    w1 = grp.orderBy(F.col("_x"))
    r1 = pre.select(
        *by,
        "_x",
        F.row_number().over(w1).alias("_rn"),
        F.count(F.lit(1)).over(grp).alias("_n"),
    )
    lo = (F.col("_n") + 1) / 2
    hi = (F.col("_n") + 2) / 2
    m2 = F.sum(
        F.when(F.col("_rn") == F.floor(lo), F.col("_x")).otherwise(F.lit(0))
        + F.when(F.col("_rn") == F.floor(hi), F.col("_x")).otherwise(F.lit(0))
    ).over(grp)
    dev = r1.select(
        *by,
        "_n",
        (F.abs(2 * F.col("_x") - m2)).alias("_dev"),
        m2.alias("_m2"),
    )
    w2 = grp.orderBy(F.col("_dev"))
    r2 = dev.select(
        *by,
        "_n",
        "_m2",
        "_dev",
        F.row_number().over(w2).alias("_dn"),
    )
    lo2 = (F.col("_n") + 1) / 2
    hi2 = (F.col("_n") + 2) / 2
    m2dev = F.sum(
        F.when(F.col("_dn") == F.floor(lo2), F.col("_dev")).otherwise(F.lit(0))
        + F.when(F.col("_dn") == F.floor(hi2), F.col("_dev")).otherwise(F.lit(0))
    ).over(grp)
    flagged = r2.select(
        *by,
        "_m2",
        m2dev.alias("_m2dev"),
        (2 * F.col("_dev") > k * m2dev).cast("int").alias("_out"),
    )
    return flagged.groupBy(*by).agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.first("_m2") / (2.0 * scale), ndigits).alias("median"),
        F.round(F.first("_m2dev") / (4.0 * scale), ndigits).alias("mad"),
        F.sum("_out").alias("n_outliers"),
    )


def mad_outliers_oracle_sql(
    table: str,
    col: str,
    by: list[str] | None = None,
    scale: int = 1,
    k: int = 3,
    ndigits: int = 6,
) -> str:
    """ANSI twin of :func:`mad_outliers` — identical rank-median algebra."""
    by = list(by or [])
    by_sel = "".join(f"{c}, " for c in by)
    part = ", ".join(by) if by else "1"
    group = f"GROUP BY {', '.join(by)}" if by else ""
    return f"""
WITH pre AS (
  SELECT {by_sel}
         CAST(ROUND({col} * {scale}) AS BIGINT) AS x
  FROM {table}
  WHERE {col} IS NOT NULL
),
r1 AS (
  SELECT {by_sel} x,
         ROW_NUMBER() OVER (PARTITION BY {part} ORDER BY x) AS rn,
         COUNT(*) OVER (PARTITION BY {part}) AS n
  FROM pre
),
dev AS (
  SELECT {by_sel} n,
         SUM(CASE WHEN rn = (n + 1) // 2 THEN x ELSE 0 END
             + CASE WHEN rn = (n + 2) // 2 THEN x ELSE 0 END)
           OVER (PARTITION BY {part}) AS m2,
         x
  FROM r1
),
dev2 AS (
  SELECT {by_sel} n, m2, ABS(2 * x - m2) AS d FROM dev
),
r2 AS (
  SELECT {by_sel} n, m2, d,
         ROW_NUMBER() OVER (PARTITION BY {part} ORDER BY d) AS dn
  FROM dev2
),
flagged AS (
  SELECT {by_sel} m2,
         SUM(CASE WHEN dn = (n + 1) // 2 THEN d ELSE 0 END
             + CASE WHEN dn = (n + 2) // 2 THEN d ELSE 0 END)
           OVER (PARTITION BY {part}) AS m2dev,
         d
  FROM r2
)
SELECT {by_sel}
       COUNT(*) AS n,
       ROUND(MIN(m2) / (2.0 * {scale}), {ndigits}) AS median,
       ROUND(MIN(m2dev) / (4.0 * {scale}), {ndigits}) AS mad,
       CAST(SUM(CASE WHEN 2 * d > {k} * m2dev THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers
FROM flagged {group}
""".strip()


def psi_drift(
    df: DataFrame,
    col: str,
    seg_col: str,
    seg_a: str,
    seg_b: str,
    k: int = 10,
    ndigits: int = 6,
) -> DataFrame:
    """Population Stability Index between two segments of ``col``:
    one row ``(n_a, n_b, psi)`` — the binned drift monitor that
    complements the exact-CDF :func:`ks_drift` (KS finds the largest
    pointwise gap; PSI integrates shift across the distribution, the
    convention in model-monitoring runbooks with 0.1/0.25 alert bands).

    Buckets are ``k`` equal widths over the COMBINED [min, max] (the
    same fixed double expression as :func:`fixed_width_histogram`);
    shares are Laplace-smoothed ``(c+1)/(n+k)`` so empty buckets stay
    finite.  Each bucket's term ``(p_a−p_b)·ln(p_a/p_b)`` floor-quantizes
    to nano units (exact BIGINT, same trick as :func:`column_entropy`)
    and the terms sum EXACTLY — no float-summation order anywhere.
    Plan: one extremes aggregate broadcast into a map-side bucket
    expression, one (bucket, seg) count aggregation, one k-row rollup.
    """
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    pre = df.where(
        F.col(col).isNotNull() & F.col(seg_col).isin([seg_a, seg_b])
    ).select(F.col(col).cast("double").alias("_v"), F.col(seg_col).alias("_s"))
    ext = pre.agg(
        F.min("_v").alias("_mn"), F.max("_v").alias("_mx")
    )
    span = F.col("_mx") - F.col("_mn")
    bucket = F.when(span == 0, F.lit(0)).otherwise(
        F.least(
            F.floor((F.col("_v") - F.col("_mn")) * k / span).cast("int"),
            F.lit(k - 1),
        )
    )
    counts = (
        pre.crossJoin(F.broadcast(ext))
        .select(bucket.alias("bucket"), "_s")
        .groupBy("bucket")
        .agg(
            F.sum(F.when(F.col("_s") == seg_a, 1).otherwise(0)).alias("ca"),
            F.sum(F.when(F.col("_s") == seg_b, 1).otherwise(0)).alias("cb"),
        )
    )
    # bucket spine so empty buckets contribute their smoothed term too
    spine = df.sparkSession.range(k).select(F.col("id").cast("int").alias("bucket"))
    cells = spine.join(counts, "bucket", "left").select(
        "bucket",
        F.coalesce("ca", F.lit(0)).alias("ca"),
        F.coalesce("cb", F.lit(0)).alias("cb"),
    )
    tot = cells.agg(
        F.sum("ca").alias("na"), F.sum("cb").alias("nb")
    )
    pa = (F.col("ca") + 1).cast("double") / (F.col("na") + k).cast("double")
    pb = (F.col("cb") + 1).cast("double") / (F.col("nb") + k).cast("double")
    term = (pa - pb) * F.log(pa / pb)
    micro = F.floor(F.lit(1e9) * term).cast("long")
    agg = (
        cells.crossJoin(F.broadcast(tot))
        .agg(
            F.first("na").alias("n_a"),
            F.first("nb").alias("n_b"),
            F.sum(micro).alias("_psi_nano"),
        )
    )
    return agg.select(
        "n_a",
        "n_b",
        F.round(F.col("_psi_nano").cast("double") / 1e9, ndigits).alias("psi"),
    )


def psi_drift_oracle_sql(
    table: str,
    col: str,
    seg_col: str,
    seg_a: str,
    seg_b: str,
    k: int = 10,
    ndigits: int = 6,
) -> str:
    """ANSI twin of :func:`psi_drift` — same bucket expression, same
    nano-quantized terms."""
    return f"""
WITH pre AS (
  SELECT CAST({col} AS DOUBLE) AS v, {seg_col} AS s
  FROM {table}
  WHERE {col} IS NOT NULL AND {seg_col} IN ('{seg_a}', '{seg_b}')
),
ext AS (
  SELECT MIN(v) AS mn, MAX(v) AS mx FROM pre
),
counts AS (
  SELECT CASE WHEN ext.mx - ext.mn = 0 THEN 0
              ELSE LEAST(CAST(FLOOR((v - ext.mn) * {k} / (ext.mx - ext.mn)) AS INT), {k - 1})
         END AS bucket,
         SUM(CASE WHEN s = '{seg_a}' THEN 1 ELSE 0 END) AS ca,
         SUM(CASE WHEN s = '{seg_b}' THEN 1 ELSE 0 END) AS cb
  FROM pre, ext
  GROUP BY 1
),
cells AS (
  SELECT CAST(u.b AS INT) AS bucket,
         COALESCE(counts.ca, 0) AS ca,
         COALESCE(counts.cb, 0) AS cb
  FROM UNNEST(generate_series(0, {k - 1})) AS u(b)
  LEFT JOIN counts ON counts.bucket = CAST(u.b AS INT)
),
tot AS (
  SELECT SUM(ca) AS na, SUM(cb) AS nb FROM cells
),
terms AS (
  SELECT CAST(FLOOR(1e9 * (
           (CAST(ca + 1 AS DOUBLE) / CAST(na + {k} AS DOUBLE)
            - CAST(cb + 1 AS DOUBLE) / CAST(nb + {k} AS DOUBLE))
           * LN((CAST(ca + 1 AS DOUBLE) / CAST(na + {k} AS DOUBLE))
                / (CAST(cb + 1 AS DOUBLE) / CAST(nb + {k} AS DOUBLE)))
         )) AS BIGINT) AS micro,
         na, nb
  FROM cells, tot
)
SELECT CAST(MIN(na) AS BIGINT) AS n_a,
       CAST(MIN(nb) AS BIGINT) AS n_b,
       ROUND(CAST(SUM(micro) AS DOUBLE) / 1e9, {ndigits}) AS psi
FROM terms
""".strip()


# Poisson(1) CDF thresholds c_k = e^-1 * sum_{j<=k} 1/j!: a draw's repeat
# count is #{k : u >= c_k} (capped at 9; P(K>9) ~ 1e-10, mirrored in the
# twin).  Literal doubles so both engines compare identical constants.
_POISSON1_CDF = (
    0.36787944117144233,
    0.7357588823428847,
    0.9196986029286058,
    0.9810118431238463,
    0.9963401531726563,
    0.9994058151824183,
    0.999916758850712,
    0.9999897508033253,
    0.999998874797402,
)
_U_DENOM = 1 << 53


def bootstrap_ci_mean(
    df: DataFrame,
    id_col: str,
    col: str,
    b: int = 100,
    lo_q: float = 0.025,
    hi_q: float = 0.975,
    scale: int = 100,
    seed: int = 42,
    ndigits: int = 6,
) -> DataFrame:
    """Poisson-bootstrap confidence interval for the mean of ``col``:
    one row ``(n, b, mean, ci_lo, ci_hi)``.

    The classic index-resample bootstrap needs a random-access indexed
    table (a global sort at 10^12 rows); the **Poisson bootstrap**
    replaces it with a per-row draw — in replica ``r`` each row appears
    ``K ~ Poisson(1)`` times, and ``K`` here is the deterministic
    inverse-CDF lookup of ``u = portable_hash(id, r, seed) / 2^53``
    against literal Poisson(1) CDF constants, so every engine replays the
    identical resample.  Replica sums accumulate ``K * x`` as exact
    DECIMALs; each replica mean is one double division; the CI bounds are
    rank-explicit order statistics of the ``b`` replica means (ranks
    ``ceil(b*q)``, clamped to [1, b]).

    **Scale**: one scan amplified by ``b`` replica tags (map-side — the
    explode feeds straight into a partial aggregation keyed by replica),
    one ``b``-row rollup.  No global sort, no driver loop; at 10^12 rows
    choose ``b`` to budget the ``b x`` scan amplification.
    """
    if b < 2:
        raise ValueError(f"need b >= 2 replicas, got {b}")
    if not (0 <= lo_q < hi_q <= 1):
        raise ValueError(f"need 0 <= lo_q < hi_q <= 1, got {lo_q}, {hi_q}")
    from pyspark.sql import Window as _W

    from .pipeline.hashing import portable_hash63

    xi = F.round(F.col(col) * scale).cast("decimal(18,0)")
    pre = df.where(F.col(col).isNotNull()).select(
        F.col(id_col).cast("string").alias("_id"), xi.alias("_x")
    )
    tagged = pre.select(
        "_id", "_x", F.explode(F.sequence(F.lit(0), F.lit(b - 1))).alias("_r")
    )
    u = (
        portable_hash63(
            F.concat_ws(":", F.col("_id"), F.col("_r"), F.lit(str(seed)))
        )
        % _U_DENOM
    ).cast("double") / F.lit(float(_U_DENOM))
    k = sum(
        (u >= F.lit(c)).cast("int") for c in _POISSON1_CDF
    ).cast("decimal(18,0)")
    reps = tagged.select("_r", (k * F.col("_x")).alias("_kx"), k.alias("_k")).groupBy(
        "_r"
    ).agg(F.sum("_kx").alias("_sx"), F.sum("_k").alias("_cnt"))
    mean_r = F.when(
        F.col("_cnt") > 0,
        F.col("_sx").cast("double") / F.col("_cnt").cast("double") / scale,
    )
    import math as _math

    lo_rank = min(max(1, _math.ceil(b * lo_q)), b)
    hi_rank = min(max(1, _math.ceil(b * hi_q)), b)
    w = _W.orderBy(F.col("_m").asc_nulls_first())
    ranked = reps.select(mean_r.alias("_m")).select(
        "_m", F.row_number().over(w).alias("_rn")
    )
    ci = ranked.agg(
        F.round(F.min(F.when(F.col("_rn") == lo_rank, F.col("_m"))), ndigits).alias(
            "ci_lo"
        ),
        F.round(F.min(F.when(F.col("_rn") == hi_rank, F.col("_m"))), ndigits).alias(
            "ci_hi"
        ),
    )
    base = pre.agg(
        F.count(F.lit(1)).alias("n"),
        F.round(
            F.sum("_x").cast("double") / F.count(F.lit(1)).cast("double") / scale,
            ndigits,
        ).alias("mean"),
    )
    return base.crossJoin(ci).select(
        "n", F.lit(b).cast("int").alias("b"), "mean", "ci_lo", "ci_hi"
    )


def bootstrap_ci_mean_oracle_sql(
    table: str,
    id_col: str,
    col: str,
    b: int = 100,
    lo_q: float = 0.025,
    hi_q: float = 0.975,
    scale: int = 100,
    seed: int = 42,
    ndigits: int = 6,
) -> str:
    """ANSI twin of :func:`bootstrap_ci_mean` — identical hash draws,
    Poisson constants, and rank conventions."""
    import math as _math

    from .pipeline.hashing import portable_hash63_sql

    lo_rank = min(max(1, _math.ceil(b * lo_q)), b)
    hi_rank = min(max(1, _math.ceil(b * hi_q)), b)
    h = portable_hash63_sql(
        f"CAST({id_col} AS VARCHAR) || ':' || CAST(r AS VARCHAR) || ':{seed}'"
    )
    ks = " + ".join(f"(CASE WHEN u >= {c!r} THEN 1 ELSE 0 END)" for c in _POISSON1_CDF)
    return f"""
WITH pre AS (
  SELECT CAST({id_col} AS VARCHAR) AS {id_col},
         CAST(ROUND({col} * {scale}) AS DECIMAL(18,0)) AS x
  FROM {table}
  WHERE {col} IS NOT NULL
),
tagged AS (
  SELECT {id_col}, x, CAST(t.r AS BIGINT) AS r
  FROM pre, UNNEST(generate_series(0, {b - 1})) AS t(r)
),
draws AS (
  SELECT r, x,
         CAST(({h} % {_U_DENOM}) AS DOUBLE) / {float(_U_DENOM)!r} AS u
  FROM tagged
),
reps AS (
  SELECT r,
         SUM(CAST({ks} AS DECIMAL(18,0)) * x) AS sx,
         SUM(CAST({ks} AS DECIMAL(18,0))) AS cnt
  FROM draws GROUP BY r
),
means AS (
  SELECT CASE WHEN cnt > 0
              THEN CAST(sx AS DOUBLE) / CAST(cnt AS DOUBLE) / {scale} END AS m
  FROM reps
),
ranked AS (
  SELECT m, ROW_NUMBER() OVER (ORDER BY m ASC NULLS FIRST) AS rn FROM means
),
ci AS (
  SELECT ROUND(MIN(CASE WHEN rn = {lo_rank} THEN m END), {ndigits}) AS ci_lo,
         ROUND(MIN(CASE WHEN rn = {hi_rank} THEN m END), {ndigits}) AS ci_hi
  FROM ranked
),
base AS (
  SELECT COUNT(*) AS n,
         ROUND(CAST(SUM(x) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) / {scale}, {ndigits}) AS mean
  FROM pre
)
SELECT n, CAST({b} AS INT) AS b, mean, ci_lo, ci_hi FROM base, ci
""".strip()


def welch_t(
    df: DataFrame,
    value_col: str,
    group_col: str,
    group_a: str,
    group_b: str,
    scale: int = 1,
    ndigits: int = 6,
) -> DataFrame:
    """Welch's unequal-variance t statistic between two groups: one row
    ``(n_a, n_b, mean_a, mean_b, t, dof)`` — the parametric companion to
    :func:`mannwhitney_u` (U ranks; Welch compares means under unequal
    variances, the default two-sample test in every stats package).

    Sums and squared sums accumulate as exact DECIMALs (values scaled to
    integers); means, sample variances (the n-1 form), t, and the
    Welch-Satterthwaite degrees of freedom are one fixed double
    combination each — bit-identical cross-engine.  One scan, one
    2-row-ish aggregation; p-values need the t CDF (no closed form), so
    the statistic and dof are the outputs — compare t against the normal
    bands at these corpus-scale dofs.
    """
    pre = df.where(
        F.col(group_col).isin([group_a, group_b]) & F.col(value_col).isNotNull()
    ).select(
        F.col(group_col).alias("_g"),
        F.round(F.col(value_col) * scale).cast("decimal(18,0)").alias("_x"),
    )
    is_a = F.col("_g") == group_a
    sums = pre.agg(
        F.sum(F.when(is_a, 1).otherwise(0)).alias("na"),
        F.sum(F.when(~is_a, 1).otherwise(0)).alias("nb"),
        F.sum(F.when(is_a, F.col("_x")).otherwise(0)).cast("double").alias("sa"),
        F.sum(F.when(~is_a, F.col("_x")).otherwise(0)).cast("double").alias("sb"),
        F.sum(F.when(is_a, F.col("_x") * F.col("_x")).otherwise(0))
        .cast("double")
        .alias("qa"),
        F.sum(F.when(~is_a, F.col("_x") * F.col("_x")).otherwise(0))
        .cast("double")
        .alias("qb"),
    )
    na, nb = F.col("na").cast("double"), F.col("nb").cast("double")
    # sample variance (n-1): (n*q - s^2) / (n * (n-1)), in scaled units
    va = (na * F.col("qa") - F.col("sa") * F.col("sa")) / (na * (na - 1))
    vb = (nb * F.col("qb") - F.col("sb") * F.col("sb")) / (nb * (nb - 1))
    sea = va / na
    seb = vb / nb
    se2 = sea + seb
    t = (F.col("sa") / na - F.col("sb") / nb) / F.sqrt(se2)
    dof = (se2 * se2) / (sea * sea / (na - 1) + seb * seb / (nb - 1))
    ok = (F.col("na") > 1) & (F.col("nb") > 1) & (se2 > 0)
    return sums.select(
        F.col("na").alias("n_a"),
        F.col("nb").alias("n_b"),
        F.round(F.col("sa") / na / scale, ndigits).alias("mean_a"),
        F.round(F.col("sb") / nb / scale, ndigits).alias("mean_b"),
        F.when(ok, F.round(t, ndigits)).alias("t"),
        F.when(ok, F.round(dof, ndigits)).alias("dof"),
    )


def welch_t_oracle_sql(
    table: str,
    value_col: str,
    group_col: str,
    group_a: str,
    group_b: str,
    scale: int = 1,
    ndigits: int = 6,
) -> str:
    """ANSI twin of :func:`welch_t` — same decimal sums, same double
    combination order."""
    return f"""
WITH pre AS (
  SELECT {group_col} AS g,
         CAST(ROUND({value_col} * {scale}) AS DECIMAL(18,0)) AS x
  FROM {table}
  WHERE {group_col} IN ('{group_a}', '{group_b}') AND {value_col} IS NOT NULL
),
sums AS (
  SELECT CAST(SUM(CASE WHEN g = '{group_a}' THEN 1 ELSE 0 END) AS BIGINT) AS na,
         CAST(SUM(CASE WHEN g != '{group_a}' THEN 1 ELSE 0 END) AS BIGINT) AS nb,
         CAST(SUM(CASE WHEN g = '{group_a}' THEN x ELSE 0 END) AS DOUBLE) AS sa,
         CAST(SUM(CASE WHEN g != '{group_a}' THEN x ELSE 0 END) AS DOUBLE) AS sb,
         CAST(SUM(CASE WHEN g = '{group_a}' THEN x * x ELSE 0 END) AS DOUBLE) AS qa,
         CAST(SUM(CASE WHEN g != '{group_a}' THEN x * x ELSE 0 END) AS DOUBLE) AS qb
  FROM pre
),
comb AS (
  SELECT na, nb, sa, sb,
         (CAST(na AS DOUBLE) * qa - sa * sa) / (CAST(na AS DOUBLE) * (CAST(na AS DOUBLE) - 1)) / CAST(na AS DOUBLE) AS sea,
         (CAST(nb AS DOUBLE) * qb - sb * sb) / (CAST(nb AS DOUBLE) * (CAST(nb AS DOUBLE) - 1)) / CAST(nb AS DOUBLE) AS seb
  FROM sums
)
SELECT na AS n_a, nb AS n_b,
       ROUND(sa / CAST(na AS DOUBLE) / {scale}, {ndigits}) AS mean_a,
       ROUND(sb / CAST(nb AS DOUBLE) / {scale}, {ndigits}) AS mean_b,
       CASE WHEN na > 1 AND nb > 1 AND sea + seb > 0
            THEN ROUND((sa / CAST(na AS DOUBLE) - sb / CAST(nb AS DOUBLE)) / SQRT(sea + seb), {ndigits}) END AS t,
       CASE WHEN na > 1 AND nb > 1 AND sea + seb > 0
            THEN ROUND(((sea + seb) * (sea + seb)) /
                       (sea * sea / (CAST(na AS DOUBLE) - 1) + seb * seb / (CAST(nb AS DOUBLE) - 1)), {ndigits}) END AS dof
FROM comb
""".strip()


def cramers_v(
    df: DataFrame,
    row_col: str,
    col_col: str,
    ndigits: int = 6,
) -> DataFrame:
    """Cramér's V association strength for a categorical pair: one row
    ``(n, n_rows, n_cols, chi2, v)`` — the normalized [0, 1] effect size
    on top of :func:`crosstab_chi2`'s per-cell screen (chi-square grows
    with n; V answers "how strong", comparable across tables).

    Each cell's ``(O−E)²/E`` term floor-quantizes to an exact BIGINT
    micro before summation (the :func:`column_entropy` trick), so the
    summed statistic has no float order anywhere;
    ``V = sqrt(chi2 / (n · min(r−1, c−1)))`` is one fixed double
    combination.  Same plan shape as the screen: count-level shuffles
    only.  Degenerate 1×k tables yield NULL v.
    """
    pre = df.where(F.col(row_col).isNotNull() & F.col(col_col).isNotNull())
    cell = pre.groupBy(row_col, col_col).agg(F.count(F.lit(1)).alias("o"))
    rtot = pre.groupBy(row_col).agg(F.count(F.lit(1)).alias("_rt"))
    ctot = pre.groupBy(col_col).agg(F.count(F.lit(1)).alias("_ct"))
    ntot = pre.agg(
        F.count(F.lit(1)).alias("_n"),
        F.countDistinct(row_col).alias("_r"),
        F.countDistinct(col_col).alias("_c"),
    )
    # the FULL r x c spine: unobserved cells contribute (0-E)^2/E = E —
    # summing only observed cells understates chi2 (a perfect 2x2
    # association would read half its true value)
    spine = rtot.crossJoin(ctot).join(cell, [row_col, col_col], "left")
    e = (
        F.col("_rt").cast("double")
        * F.col("_ct").cast("double")
        / F.col("_n").cast("double")
    )
    o = F.coalesce(F.col("o"), F.lit(0)).cast("double")
    micro = F.floor(F.lit(1e6) * (o - e) * (o - e) / e).cast("long")
    cells = spine.crossJoin(F.broadcast(ntot)).select(
        micro.alias("_m"), "_n", "_r", "_c"
    )
    agg = cells.agg(
        F.first("_n").alias("n"),
        F.first("_r").alias("n_rows"),
        F.first("_c").alias("n_cols"),
        F.sum("_m").alias("_chi2_micro"),
    )
    chi2 = F.col("_chi2_micro").cast("double") / 1e6
    denom = F.col("n").cast("double") * F.least(
        F.col("n_rows") - 1, F.col("n_cols") - 1
    ).cast("double")
    return agg.select(
        "n",
        "n_rows",
        "n_cols",
        F.round(chi2, ndigits).alias("chi2"),
        F.when(denom > 0, F.round(F.sqrt(chi2 / denom), ndigits)).alias("v"),
    )


def cramers_v_oracle_sql(
    table: str,
    row_col: str,
    col_col: str,
    ndigits: int = 6,
) -> str:
    """ANSI twin of :func:`cramers_v`."""
    return f"""
WITH pre AS (
  SELECT {row_col} AS r, {col_col} AS c FROM {table}
  WHERE {row_col} IS NOT NULL AND {col_col} IS NOT NULL
),
cell AS (SELECT r, c, COUNT(*) AS o FROM pre GROUP BY r, c),
rtot AS (SELECT r, COUNT(*) AS rt FROM pre GROUP BY r),
ctot AS (SELECT c, COUNT(*) AS ct FROM pre GROUP BY c),
ntot AS (
  SELECT COUNT(*) AS n,
         COUNT(DISTINCT r) AS nr,
         COUNT(DISTINCT c) AS nc
  FROM pre
),
spine AS (
  -- the FULL r x c spine: unobserved cells contribute (0-E)^2/E = E
  SELECT rtot.r, ctot.c, rtot.rt, ctot.ct, COALESCE(cell.o, 0) AS o
  FROM rtot CROSS JOIN ctot
  LEFT JOIN cell ON cell.r = rtot.r AND cell.c = ctot.c
),
micro AS (
  SELECT CAST(FLOOR(1e6 *
           (CAST(o AS DOUBLE) - CAST(rt AS DOUBLE) * CAST(ct AS DOUBLE) / CAST(n AS DOUBLE))
           * (CAST(o AS DOUBLE) - CAST(rt AS DOUBLE) * CAST(ct AS DOUBLE) / CAST(n AS DOUBLE))
           / (CAST(rt AS DOUBLE) * CAST(ct AS DOUBLE) / CAST(n AS DOUBLE))
         ) AS BIGINT) AS m,
         n, nr, nc
  FROM spine CROSS JOIN ntot
),
agg AS (
  SELECT CAST(MIN(n) AS BIGINT) AS n,
         CAST(MIN(nr) AS BIGINT) AS n_rows,
         CAST(MIN(nc) AS BIGINT) AS n_cols,
         CAST(SUM(m) AS DOUBLE) / 1e6 AS chi2
  FROM micro
)
SELECT n, n_rows, n_cols,
       ROUND(chi2, {ndigits}) AS chi2,
       CASE WHEN CAST(n AS DOUBLE) * CAST(LEAST(n_rows - 1, n_cols - 1) AS DOUBLE) > 0
            THEN ROUND(SQRT(chi2 / (CAST(n AS DOUBLE) * CAST(LEAST(n_rows - 1, n_cols - 1) AS DOUBLE))), {ndigits}) END AS v
FROM agg
""".strip()


def anova_f(
    df: DataFrame,
    value_col: str,
    group_col: str,
    scale: int = 1,
    ndigits: int = 6,
) -> DataFrame:
    """One-way ANOVA F statistic across ALL groups of ``group_col``: one
    row ``(k, n, ss_between, ss_within, f_stat, eta2)`` — the k-group
    generalization of :func:`welch_t` (is ANY group's mean different?),
    plus the effect size ``eta2 = SSB / (SSB + SSW)``.

    Per-group sufficient statistics ``(n_g, s_g, q_g)`` accumulate as
    exact integers/DECIMALs; each group's between-term ``s_g^2 / n_g``
    floor-quantizes to BIGINT BEFORE the cross-group sum (the shared
    per-term-quantization trick — k doubles summed in engine order would
    not value-hash), and the final F / eta2 are one fixed double
    combination each.  Overflow headroom: the quantized term is
    ``(sum of scaled values)^2 / n`` — with cents-scale sums to ~1e13
    the term stays under the BIGINT ceiling; lower ``scale`` first at
    extreme corpus sizes.

    **Scale** — one scan, one |groups|-row aggregation, one 1-row
    aggregation.  Degenerate inputs (k < 2 or n <= k) yield NULL
    ``f_stat``/``eta2`` with the counts still reported.
    """
    pre = df.where(
        F.col(group_col).isNotNull() & F.col(value_col).isNotNull()
    ).select(
        F.col(group_col).alias("_g"),
        F.round(F.col(value_col) * scale).cast("decimal(18,0)").alias("_x"),
    )
    grp = pre.groupBy("_g").agg(
        F.count(F.lit(1)).alias("ng"),
        F.sum("_x").cast("decimal(38,0)").alias("sg"),
        F.sum(F.col("_x") * F.col("_x")).cast("decimal(38,0)").alias("qg"),
    )
    tg = F.floor(
        F.col("sg").cast("double")
        * F.col("sg").cast("double")
        / F.col("ng").cast("double")
    ).cast("long")
    tot = grp.agg(
        F.count(F.lit(1)).alias("k"),
        F.sum("ng").alias("n"),
        F.sum("sg").alias("s"),
        F.sum("qg").alias("q"),
        F.sum(tg).alias("tsum"),
    )
    t_tot = F.floor(
        F.col("s").cast("double")
        * F.col("s").cast("double")
        / F.col("n").cast("double")
    ).cast("long")
    ssb = (F.col("tsum") - t_tot).cast("double")
    ssw = (F.col("q").cast("double") - F.col("tsum").cast("double"))
    ok = (F.col("k") > 1) & (F.col("n") > F.col("k")) & (ssw > 0)
    fstat = (ssb / (F.col("k") - 1).cast("double")) / (
        ssw / (F.col("n") - F.col("k")).cast("double")
    )
    eta2 = ssb / (ssb + ssw)
    sc2 = float(scale) ** 2
    return tot.select(
        F.col("k").cast("long").alias("k"),
        F.col("n").cast("long").alias("n"),
        F.round(ssb / sc2, ndigits).alias("ss_between"),
        F.round(ssw / sc2, ndigits).alias("ss_within"),
        F.when(ok, F.round(fstat, ndigits)).alias("f_stat"),
        F.when(ok, F.round(eta2, ndigits)).alias("eta2"),
    )


def anova_f_oracle_sql(
    table: str = "events",
    value_sql: str = "value",
    group_col: str = "event_type",
    scale: int = 1,
    ndigits: int = 6,
) -> str:
    """ANSI twin of :func:`anova_f` (same per-group quantized terms,
    same fixed double combination)."""
    sc2 = float(scale) ** 2
    return f"""
WITH grp AS (
  SELECT {group_col} AS g,
         COUNT(*) AS ng,
         CAST(SUM(CAST(ROUND({value_sql} * {scale}) AS DECIMAL(18,0))) AS DECIMAL(38,0)) AS sg,
         CAST(SUM(CAST(ROUND({value_sql} * {scale}) AS DECIMAL(18,0))
                  * CAST(ROUND({value_sql} * {scale}) AS DECIMAL(18,0))) AS DECIMAL(38,0)) AS qg
  FROM {table}
  WHERE {group_col} IS NOT NULL AND {value_sql} IS NOT NULL
  GROUP BY 1
),
tot AS (
  SELECT COUNT(*) AS k,
         CAST(SUM(ng) AS BIGINT) AS n,
         CAST(SUM(sg) AS DECIMAL(38,0)) AS s,
         CAST(SUM(qg) AS DECIMAL(38,0)) AS q,
         CAST(SUM(CAST(FLOOR(CAST(sg AS DOUBLE) * CAST(sg AS DOUBLE)
                             / CAST(ng AS DOUBLE)) AS BIGINT)) AS BIGINT) AS tsum
  FROM grp
),
f AS (
  SELECT k, n,
         CAST(tsum - CAST(FLOOR(CAST(s AS DOUBLE) * CAST(s AS DOUBLE)
                                / CAST(n AS DOUBLE)) AS BIGINT) AS DOUBLE) AS ssb,
         CAST(q AS DOUBLE) - CAST(tsum AS DOUBLE) AS ssw
  FROM tot
)
SELECT CAST(k AS BIGINT) AS k, n,
       ROUND(ssb / {sc2}, {ndigits}) AS ss_between,
       ROUND(ssw / {sc2}, {ndigits}) AS ss_within,
       CASE WHEN k > 1 AND n > k AND ssw > 0
            THEN ROUND((ssb / (k - 1)) / (ssw / (n - k)), {ndigits}) END AS f_stat,
       CASE WHEN k > 1 AND n > k AND ssw > 0
            THEN ROUND(ssb / (ssb + ssw), {ndigits}) END AS eta2
FROM f
""".strip()
