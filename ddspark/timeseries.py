"""Multi-resolution time-series rollups over event tables.

The hypertable "continuous aggregate" shape: one raw-event scan fans out
into N downsampled resolutions (hour/day/week/...) in a single job.
Spark-first design: the resolutions become one ``GROUPING SETS``
aggregate — Catalyst's ``Expand`` replicates rows *after* the scan and
*before* partial aggregation, so the corpus is read once and the shuffle
carries only the aggregated cells (distinct groups × resolutions), never
the expanded rows.  At 100 TB that is the difference between one pass
and one pass per resolution.

Decayed (recency-weighted) features use a fixed-depth lag chain per key:
a pure window expression, no Python, no iterative state — and with
integer inputs and power-of-two decay the result is bit-exact and
replayable in any engine.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, functions as F

__all__ = ["downsample_multi", "decayed_sum", "flag_spikes", "seasonal_residuals", "autocorr_exact", "autocorr_exact_oracle_sql", "cusum_changepoints", "cusum_changepoints_oracle_sql"]

# date_trunc units both Spark and ANSI engines agree on (week = ISO Monday)
_UNITS = ("year", "quarter", "month", "week", "day", "hour", "minute", "second")


def downsample_multi(
    df: DataFrame,
    ts: str,
    value: str,
    resolutions: tuple[str, ...] | list[str] = ("hour", "day", "week"),
    by: list[str] | None = None,
) -> DataFrame:
    """Downsample ``value`` to every resolution in one scan: output rows are
    ``(resolution, bucket_start, *by, n, v_sum, v_min, v_max)`` — the
    union of ``GROUP BY date_trunc(r, ts)`` for each ``r``, produced by a
    single GROUPING SETS aggregate (one scan, one shuffle of cells).

    ``bucket_start`` comes back as TIMESTAMP_NTZ (wall-clock bucket
    label).  NULL timestamps are dropped — a NULL bucket would be
    indistinguishable from the grouping-set NULL padding.
    """
    by = list(by or [])
    bad = [r for r in resolutions if r not in _UNITS]
    if bad or not resolutions:
        raise ValueError(f"unsupported resolutions {bad or resolutions}; use {_UNITS}")
    if len(set(resolutions)) != len(resolutions):
        raise ValueError(f"duplicate resolutions: {resolutions}")
    taken = {c for c in (by or []) if c == "_v" or c.startswith("_t_")}
    if taken:
        raise ValueError(f"by columns {sorted(taken)} are reserved internally")

    tcols = [f"_t_{r}" for r in resolutions]
    w = df.where(F.col(ts).isNotNull()).select(
        *by,
        F.col(value).alias("_v"),
        *[
            F.date_trunc(r, F.col(ts)).cast("timestamp_ntz").alias(t)
            for r, t in zip(resolutions, tcols)
        ],
    )
    sets = [[*(F.col(b) for b in by), F.col(t)] for t in tcols]
    all_cols = [F.col(b) for b in by] + [F.col(t) for t in tcols]
    res_label = None
    for r, t in zip(resolutions, tcols):
        cond = F.grouping(t) == 0
        res_label = F.when(cond, F.lit(r)) if res_label is None else res_label.when(cond, F.lit(r))
    g = w.groupingSets(sets, *all_cols).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("_v").alias("v_sum"),
        F.min("_v").alias("v_min"),
        F.max("_v").alias("v_max"),
        res_label.alias("resolution"),
        F.coalesce(*[F.col(t) for t in tcols]).alias("bucket_start"),
    )
    return g.select("resolution", "bucket_start", *by, "n", "v_sum", "v_min", "v_max")


def decayed_sum(
    df: DataFrame,
    key: str | list[str],
    order: str | list[str],
    value: str | Column,
    depth: int = 8,
    alias: str = "decayed",
) -> DataFrame:
    """Recency-weighted rolling feature per key: for each row, over its
    last ``depth`` rows (inclusive, ordered by ``order``),

        decayed = sum( value_{i} * 2^(depth - 1 - i) )

    with the newest row weighted ``2^(depth-1)`` down to ``1`` — a
    half-life-one EWMA truncated at ``depth`` taps.  Implemented as a lag
    chain (``depth`` window expressions over ONE keyed sort), so the job
    is a single shuffle and zero Python; with integer ``value`` the
    result is exactly replayable cross-engine (the gate oracle replays it
    with SQL LAG).  Missing history (first rows of a key) contributes 0.
    ``order`` must be a deterministic total order per key (tie-break with
    a unique id column).
    """
    key = [key] if isinstance(key, str) else list(key)
    order = [order] if isinstance(order, str) else list(order)
    if not 1 <= depth <= 62:
        raise ValueError(f"depth must be in [1, 62], got {depth}")
    v = F.col(value) if isinstance(value, str) else value
    w = Window.partitionBy(*key).orderBy(*[F.col(o) for o in order])
    expr = None
    for k in range(depth):
        term = F.coalesce(F.lag(v, k).over(w), F.lit(0)) * F.lit(
            1 << (depth - 1 - k)
        )
        expr = term if expr is None else expr + term
    return df.withColumn(alias, expr)


def flag_spikes(
    df: DataFrame,
    ts: str,
    value: str,
    by: list[str] | None = None,
    granularity: str = "day",
    window: int = 7,
    factor: int = 3,
) -> DataFrame:
    """Integer-exact spike detection on a downsampled series: bucket
    ``value`` by ``granularity`` (summed per ``by`` group), then flag
    buckets whose total exceeds ``factor`` times the trailing-``window``
    average — evaluated as the cross-multiplication
    ``v * n_trailing > factor * trailing_sum`` so no division ever
    happens and the flag replays exactly in any engine.  Buckets with no
    trailing history are never spikes.  Returns
    ``(*by, bucket_start, v, trailing_sum, n_trailing, spike)``.

    **Scale**: the heavy reduction is the bucket aggregate (map-side
    partial agg of raw events); the trailing window then runs over
    *buckets* — thousands of rows per group, not events — so the keyed
    sort is negligible.  With integer inputs every column is BIGINT.
    """
    by = list(by or [])
    if window < 1 or factor < 1:
        raise ValueError("window and factor must be >= 1")
    daily = (
        df.where(F.col(ts).isNotNull())
        .groupBy(
            *by,
            F.date_trunc(granularity, F.col(ts))
            .cast("timestamp_ntz")
            .alias("bucket_start"),
        )
        .agg(F.sum(F.col(value)).alias("v"))
    )
    w = (
        Window.partitionBy(*by)
        .orderBy("bucket_start")
        .rowsBetween(-window, -1)
    )
    out = daily.withColumns(
        {
            "trailing_sum": F.coalesce(F.sum("v").over(w), F.lit(0).cast("long")),
            "n_trailing": F.count("v").over(w),
        }
    )
    return out.withColumn(
        "spike",
        (F.col("n_trailing") > 0)
        & (
            F.col("v") * F.col("n_trailing")
            > F.lit(int(factor)) * F.col("trailing_sum")
        ),
    )


def seasonal_residuals(
    df: DataFrame,
    ts: str,
    value: str,
    by: list[str] | None = None,
    granularity: str = "hour",
    season: int = 24 * 7,
    factor_num: int = 2,
    factor_den: int = 1,
) -> DataFrame:
    """Seasonal-naive anomaly detection: each bucket's total compared to
    the SAME bucket one season earlier (hour-of-week for the default
    hourly buckets, season=168) — the detector for periodic series where
    a trailing average (:func:`flag_spikes`) would flag every daily peak.

    Returns ``(*by, bucket_start, v, v_lag, residual, anomaly)`` where
    ``residual = v - v_lag`` (exact BIGINT with integer inputs) and
    ``anomaly`` is true when ``|residual| * factor_den > factor_num *
    v_lag`` — an integer cross-multiplication (no division, no floats),
    i.e. the bucket moved by more than factor_num/factor_den of its
    seasonal baseline.  Buckets without a one-season-earlier bucket (the
    first season, gaps) are never anomalies.

    The seasonal join is a LAG over bucket ROWS only if the series is
    gap-free; to be gap-robust this uses an equality SELF-JOIN on the
    shifted bucket timestamp (bucket_start - season buckets), which is a
    keyed hash join over bucket-level rows — thousands per group, never
    raw events.
    """
    by = list(by or [])
    if season < 1 or factor_num < 1 or factor_den < 1:
        raise ValueError("season and factors must be >= 1")
    buckets = (
        df.where(F.col(ts).isNotNull())
        .groupBy(
            *by,
            F.date_trunc(granularity, F.col(ts))
            .cast("timestamp_ntz")
            .alias("bucket_start"),
        )
        .agg(F.sum(F.col(value)).alias("v"))
    )
    unit = {"hour": 3600, "day": 86400, "week": 7 * 86400, "minute": 60}[
        granularity
    ]
    shifted = buckets.select(
        *by,
        (
            F.col("bucket_start") + F.expr(f"INTERVAL {season * unit} SECONDS")
        ).alias("bucket_start"),
        F.col("v").alias("v_lag"),
    )
    j = buckets.join(shifted, by + ["bucket_start"], "left")
    residual = F.col("v") - F.col("v_lag")
    anomaly = F.when(
        F.col("v_lag").isNotNull(),
        F.abs(residual) * factor_den > factor_num * F.col("v_lag"),
    ).otherwise(F.lit(False))
    return j.select(
        *by,
        "bucket_start",
        "v",
        "v_lag",
        F.coalesce(residual, F.lit(None)).alias("residual"),
        anomaly.alias("anomaly"),
    )


def autocorr_exact(
    df: DataFrame,
    ts: str,
    value: str,
    lags: list[int] | None = None,
    scale: int = 100,
    ndigits: int = 6,
) -> DataFrame:
    """Lag-k autocorrelation of the daily-total series: ``(lag, n, corr)``
    — the periodicity detector behind seasonality-aware anomaly screens
    (a strong lag-7 says weekly structure; compare
    :func:`seasonal_residuals`, which assumes the period).

    The series is the per-day SUM of integer-quantized values (exact
    DECIMAL, order-free), and each lag correlates the series with its
    day-shifted self through the :func:`ddspark.profile.pearson_corr_exact`
    path — every sum exact, one fixed double combination per lag, so the
    result value-hashes cross-engine.

    **Scale**: the daily rollup is one aggregation (days << rows); the
    lag pairing is a self-join of the tiny daily table, one row per
    (lag, day) — cost lives entirely in the first rollup scan.
    """
    from ddspark.profile import pearson_corr_exact

    lags = list(lags or [1, 7])
    if not lags or any(l < 1 for l in lags):
        raise ValueError(f"lags must be positive, got {lags}")
    daily = (
        df.where(F.col(ts).isNotNull() & F.col(value).isNotNull())
        .groupBy(F.to_date(ts).alias("day"))
        .agg(
            F.sum(F.round(F.col(value) * scale).cast("decimal(18,0)"))
            .cast("double")
            .alias("v")
        )
    )
    pairs = None
    for lag in lags:
        a = daily.select(F.col("day"), F.col("v").alias("x"))
        b = daily.select(
            F.date_add(F.col("day"), lag).alias("day"), F.col("v").alias("y")
        )
        p = a.join(b, "day").select(F.lit(lag).alias("lag"), "x", "y")
        pairs = p if pairs is None else pairs.unionByName(p)
    return pearson_corr_exact(pairs, "x", "y", by=["lag"], ndigits=ndigits)


def autocorr_exact_oracle_sql(
    table: str = "events",
    ts: str = "ts",
    value: str = "value",
    lags: list[int] | None = None,
    scale: int = 100,
    ndigits: int = 6,
) -> str:
    """ANSI twin of :func:`autocorr_exact`."""
    from ddspark.profile import pearson_corr_exact_oracle_sql

    lags = list(lags or [1, 7])
    arms = "\nUNION ALL\n".join(
        f"""SELECT {lag} AS lag, a.v AS x, b.v AS y
FROM daily a JOIN daily b ON a.day = b.day + {lag}"""
        for lag in lags
    )
    pairs = f"""(
  WITH daily AS (
    SELECT CAST({ts} AS DATE) AS day,
           CAST(SUM(CAST(ROUND({value} * {scale}) AS DECIMAL(18,0))) AS DOUBLE) AS v
    FROM {table}
    WHERE {ts} IS NOT NULL AND {value} IS NOT NULL
    GROUP BY 1
  )
  {arms}
) pairs"""
    return pearson_corr_exact_oracle_sql(pairs, "x", "y", by=["lag"], ndigits=ndigits)


def cusum_changepoints(
    df: DataFrame,
    ts: str,
    value: str,
    by: list[str] | None = None,
    granularity: str = "day",
    slack_num: int = 1,
    slack_den: int = 2,
    threshold_num: int = 5,
    threshold_den: int = 1,
) -> DataFrame:
    """Integer-exact two-sided CUSUM change detection (Page 1954) on the
    downsampled series: bucket ``value`` by ``granularity`` (summed per
    ``by`` group), then accumulate the classic one-sided statistics

    ``S+_t = max(0, S+_{t-1} + (v_t - mu - k))`` (upward level shift)
    ``S-_t = max(0, S-_{t-1} - (v_t - mu - (-k)))`` (downward shift)

    with reference mean ``mu = mean(v)`` over the group's buckets, slack
    ``k = (slack_num/slack_den) * mu`` and alarm threshold
    ``h = (threshold_num/threshold_den) * mu``.  CUSUM catches small
    *persistent* level shifts that per-bucket detectors
    (:func:`flag_spikes`, :func:`seasonal_residuals`) miss, because the
    drift accumulates across buckets.

    **Exactness** — the max-recurrence has the closed form
    ``S_t = P_t - min(0, min_{i<=t} P_i)`` over the prefix sums
    ``P_t = sum_{j<=t} z_j``, so the whole statistic is two window
    passes (running sum, running min of the running sum), no recursion.
    Scaling every term by ``n * slack_den`` clears both divisions:

    ``z+_t = slack_den*n*v_t - (slack_den + slack_num)*T``
    ``z-_t = (slack_den - slack_num)*T - slack_den*n*v_t``

    with ``T = sum(v)``, ``n = count(v)`` per group — all BIGINT, so the
    alarm flags and the scaled statistics replay exactly in any engine.
    The alarm compare is the cross-multiplication
    ``S_scaled * threshold_den > threshold_num * slack_den * T``
    (both sides BIGINT; division-free).

    **Scale** — the raw-event scan collapses map-side into per-bucket
    partials; every window below runs over *buckets* (thousands of rows
    per group).  Overflow headroom: with cents-scale bucket totals
    ``<= 1e13`` and ``<= 1e4`` buckets, ``slack_den*n*v ~ 1e17`` stays
    under the 9.2e18 BIGINT ceiling; raise ``granularity`` before
    raising ``slack_den`` if both are extreme.

    Returns ``(*by, bucket_start, v, s_pos, s_neg, alarm_up,
    alarm_down)`` — ``s_pos``/``s_neg`` in the documented
    ``n*slack_den`` scaled units.
    """
    by = list(by or [])
    if granularity not in _UNITS:
        raise ValueError(f"granularity must be one of {_UNITS}")
    if min(slack_num, slack_den, threshold_num, threshold_den) < 0 or (
        slack_den == 0 or threshold_den == 0
    ):
        raise ValueError("slack/threshold fractions must be >= 0 with nonzero denominators")
    buckets = (
        df.where(F.col(ts).isNotNull())
        .groupBy(
            *by,
            F.date_trunc(granularity, F.col(ts))
            .cast("timestamp_ntz")
            .alias("bucket_start"),
        )
        .agg(F.sum(F.col(value)).cast("long").alias("v"))
    )
    wg = Window.partitionBy(*by)
    wo = Window.partitionBy(*by).orderBy("bucket_start")
    wrun = wo.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    t_tot = F.sum("v").over(wg)
    n_tot = F.count("v").over(wg)
    zp = F.lit(slack_den) * n_tot * F.col("v") - F.lit(slack_den + slack_num) * t_tot
    zm = F.lit(slack_den - slack_num) * t_tot - F.lit(slack_den) * n_tot * F.col("v")
    stats = buckets.withColumns({"_t": t_tot, "_zp": zp, "_zm": zm})
    pp = F.sum("_zp").over(wrun)
    pm = F.sum("_zm").over(wrun)
    s_pos = pp - F.least(F.lit(0).cast("long"), F.min(pp).over(wrun))
    s_neg = pm - F.least(F.lit(0).cast("long"), F.min(pm).over(wrun))
    h_rhs = F.lit(threshold_num * slack_den) * F.col("_t")
    out = stats.withColumns(
        {
            "s_pos": s_pos.cast("long"),
            "s_neg": s_neg.cast("long"),
        }
    ).withColumns(
        {
            "alarm_up": F.col("s_pos") * threshold_den > h_rhs,
            "alarm_down": F.col("s_neg") * threshold_den > h_rhs,
        }
    )
    return out.select(*by, "bucket_start", "v", "s_pos", "s_neg", "alarm_up", "alarm_down")


def cusum_changepoints_oracle_sql(
    table: str = "events",
    ts: str = "ts",
    value_sql: str = "CAST(floor(value * 100) AS BIGINT)",
    by: list[str] | None = None,
    granularity: str = "day",
    slack_num: int = 1,
    slack_den: int = 2,
    threshold_num: int = 5,
    threshold_den: int = 1,
) -> str:
    """ANSI twin of :func:`cusum_changepoints` (same prefix-sum /
    prefix-min closed form, same BIGINT scaling)."""
    by = list(by or [])
    bycols = "".join(f"{c}, " for c in by)
    part = ("PARTITION BY " + ", ".join(by)) if by else ""
    return f"""
WITH buckets AS (
  SELECT {bycols}date_trunc('{granularity}', {ts}) AS bucket_start,
         CAST(SUM({value_sql}) AS BIGINT) AS v
  FROM {table} WHERE {ts} IS NOT NULL
  GROUP BY ALL
),
z AS (
  SELECT {bycols}bucket_start, v,
         CAST(SUM(v) OVER ({part}) AS BIGINT) AS t,
         COUNT(v) OVER ({part}) AS n
  FROM buckets
),
p AS (
  SELECT {bycols}bucket_start, v, t,
         CAST(SUM({slack_den} * n * v - {slack_den + slack_num} * t)
              OVER w AS BIGINT) AS pp,
         CAST(SUM({slack_den - slack_num} * t - {slack_den} * n * v)
              OVER w AS BIGINT) AS pm
  FROM z
  WINDOW w AS ({part} ORDER BY bucket_start
               ROWS UNBOUNDED PRECEDING)
),
s AS (
  SELECT {bycols}bucket_start, v, t,
         pp - LEAST(0, MIN(pp) OVER w) AS s_pos,
         pm - LEAST(0, MIN(pm) OVER w) AS s_neg
  FROM p
  WINDOW w AS ({part} ORDER BY bucket_start
               ROWS UNBOUNDED PRECEDING)
)
SELECT {bycols}bucket_start, v,
       CAST(s_pos AS BIGINT) AS s_pos, CAST(s_neg AS BIGINT) AS s_neg,
       s_pos * {threshold_den} > {threshold_num * slack_den} * t AS alarm_up,
       s_neg * {threshold_den} > {threshold_num * slack_den} * t AS alarm_down
FROM s
""".strip()
