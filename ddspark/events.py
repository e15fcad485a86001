"""Event-stream analytics: ordered funnels and cohort retention.

The two product-analytics staples over an event table.  Both are exact
(counts and integer time arithmetic only — no floats anywhere), so the
gate replays them in ANSI SQL verbatim.

Scale notes: the funnel reduces the event table to ONE row per user per
step with conditional min-aggregates *before* any join, so the k-1 step
joins move |users| rows, not |events|; retention is a two-aggregate plan
(first-activity per user, then distinct users per (cohort, offset)) with
map-side partial aggregation on both.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

__all__ = ["funnel", "cohort_retention", "top_paths", "markov_transitions", "markov_transitions_oracle_sql", "rfm_segments", "rfm_segments_oracle_sql", "survival_km", "survival_km_oracle_sql"]


def funnel(
    events: DataFrame,
    steps: list[str],
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
) -> DataFrame:
    """Ordered conversion funnel: for each prefix of ``steps``, how many
    users performed those event types IN ORDER (strictly increasing
    timestamps; the earliest qualifying occurrence of each step is used).
    Returns ``(step, step_name, n_users)`` with ``step`` 1-based.

    Each step's per-user timestamp is the minimum event time strictly
    after the user's previous-step timestamp — computed as a conditional
    min-aggregate per user, then one |users|-row join per step.  NULL
    users and NULL timestamps never qualify.
    """
    if not steps:
        raise ValueError("steps must be non-empty")
    ev = events.where(
        F.col(user_col).isNotNull() & F.col(ts_col).isNotNull()
    ).select(F.col(user_col).alias("u"), F.col(ts_col).alias("t"),
             F.col(type_col).alias("e"))

    reached = None  # (u, t_k): users who completed steps[:k], with the time
    counts = []
    for i, s in enumerate(steps):
        if i == 0:
            cur = (
                ev.where(F.col("e") == s)
                .groupBy("u")
                .agg(F.min("t").alias("t"))
            )
        else:
            cur = (
                ev.where(F.col("e") == s)
                .join(reached.withColumnRenamed("t", "_prev"), "u")
                .where(F.col("t") > F.col("_prev"))
                .groupBy("u")
                .agg(F.min("t").alias("t"))
            )
        reached = cur
        counts.append(
            cur.agg(F.count(F.lit(1)).alias("n_users")).select(
                F.lit(i + 1).alias("step"),
                F.lit(s).alias("step_name"),
                "n_users",
            )
        )
    out = counts[0]
    for c in counts[1:]:
        out = out.unionByName(c)
    return out


def cohort_retention(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    granularity: str = "week",
) -> DataFrame:
    """Cohort retention matrix: users are cohorted by the ``granularity``
    bucket of their FIRST event; each later bucket they appear in
    increments ``(cohort, offset)``.  Returns ``(cohort, offset,
    n_users)`` with ``cohort`` a formatted bucket-start string and
    ``offset`` the whole number of buckets since the cohort bucket
    (0 = the cohort bucket itself).

    Exact integer arithmetic: offsets come from ``date_diff``-style day
    counts divided by the bucket length, not float date math.
    """
    days = {"day": 1, "week": 7}.get(granularity)
    if days is None:
        raise ValueError(f"granularity must be day/week, got {granularity!r}")
    ev = events.where(
        F.col(user_col).isNotNull() & F.col(ts_col).isNotNull()
    ).select(
        F.col(user_col).alias("u"),
        F.date_trunc(granularity, F.col(ts_col)).cast("date").alias("b"),
    )
    first = ev.groupBy("u").agg(F.min("b").alias("cb"))
    joined = ev.join(first, "u").select(
        "u",
        F.date_format("cb", "yyyy-MM-dd").alias("cohort"),
        (F.datediff("b", "cb") / days).cast("long").alias("offset"),
    )
    return joined.groupBy("cohort", "offset").agg(
        F.countDistinct("u").alias("n_users")
    )


def top_paths(
    events: DataFrame,
    user_col: str = "user_id",
    order_cols: list[str] | None = None,
    type_col: str = "event_type",
    max_steps: int = 5,
    top: int = 20,
) -> DataFrame:
    """Most frequent user journeys: each user's first ``max_steps`` event
    types in ``order_cols`` order joined with `` > ``, counted across
    users, top ``top`` by frequency (ties broken by path string —
    fully deterministic, so the gate replays it).  Returns ``(rank, path,
    n_users)``.

    **Scale**: one keyed window (row_number per user over the event sort)
    + one per-user aggregate; the path table is one row per user, and the
    final top-k is TakeOrdered, not a global sort.  ``order_cols`` must
    be a total order per user (e.g. ``["ts", "event_id"]``).
    """
    from pyspark.sql import Window

    order_cols = order_cols or ["ts", "event_id"]
    if max_steps < 1 or top < 1:
        raise ValueError("max_steps and top must be >= 1")
    ev = events.where(F.col(user_col).isNotNull())
    for c in order_cols:
        ev = ev.where(F.col(c).isNotNull())
    w = Window.partitionBy(user_col).orderBy(*[F.col(c) for c in order_cols])
    stepped = ev.select(
        F.col(user_col).alias("u"),
        F.col(type_col).alias("e"),
        F.row_number().over(w).alias("rn"),
    ).where(F.col("rn") <= max_steps)
    paths = stepped.groupBy("u").agg(
        F.concat_ws(
            " > ",
            F.transform(
                F.array_sort(F.collect_list(F.struct("rn", "e"))),
                lambda s: s["e"],
            ),
        ).alias("path")
    )
    counts = paths.groupBy("path").agg(F.count(F.lit(1)).alias("n_users"))
    head = counts.orderBy(F.col("n_users").desc(), F.col("path").asc()).limit(top)
    w2 = Window.orderBy(F.col("n_users").desc(), F.col("path").asc())
    return head.select(
        F.row_number().over(w2).alias("rank"), "path", "n_users"
    )


def markov_transitions(
    events: DataFrame,
    user_col: str = "user_id",
    order_cols: list[str] | None = None,
    type_col: str = "event_type",
    ndigits: int = 6,
) -> DataFrame:
    """First-order Markov transition table over per-user event sequences:
    ``(src, dst, n, prob)`` where ``prob = n / sum(n) over src`` — the
    behavioral model behind next-event prediction and anomaly screens.

    Each user's events order by ``order_cols`` (a total order, default
    ``[ts, event_id]``); consecutive pairs count into exact BIGINTs and
    the row probability is one double division of those ints (rounded) —
    value-hashes cross-engine.

    **Scale**: one keyed window (lead per user) + one ``(src, dst)``
    aggregation; output is |types|^2 rows.  No global sort, no driver
    state.
    """
    from pyspark.sql import Window

    order_cols = order_cols or ["ts", "event_id"]
    ev = events.where(F.col(user_col).isNotNull() & F.col(type_col).isNotNull())
    for c in order_cols:
        ev = ev.where(F.col(c).isNotNull())
    w = Window.partitionBy(user_col).orderBy(*[F.col(c) for c in order_cols])
    pairs = ev.select(
        F.col(type_col).alias("src"),
        F.lead(type_col).over(w).alias("dst"),
    ).where(F.col("dst").isNotNull())
    counts = pairs.groupBy("src", "dst").agg(F.count(F.lit(1)).alias("n"))
    tot = Window.partitionBy("src")
    return counts.select(
        "src",
        "dst",
        "n",
        F.round(
            F.col("n").cast("double") / F.sum("n").over(tot).cast("double"),
            ndigits,
        ).alias("prob"),
    )


def markov_transitions_oracle_sql(
    table: str = "events",
    user_col: str = "user_id",
    order_cols: list[str] | None = None,
    type_col: str = "event_type",
    ndigits: int = 6,
) -> str:
    """ANSI twin of :func:`markov_transitions`."""
    order_cols = order_cols or ["ts", "event_id"]
    order = ", ".join(order_cols)
    not_null = " AND ".join(
        f"{c} IS NOT NULL" for c in [user_col, type_col, *order_cols]
    )
    return f"""
WITH seq AS (
  SELECT {type_col} AS src,
         LEAD({type_col}) OVER (PARTITION BY {user_col} ORDER BY {order}) AS dst
  FROM {table}
  WHERE {not_null}
),
counts AS (
  SELECT src, dst, COUNT(*) AS n FROM seq WHERE dst IS NOT NULL GROUP BY src, dst
)
SELECT src, dst, n,
       ROUND(CAST(n AS DOUBLE) /
             CAST(SUM(n) OVER (PARTITION BY src) AS DOUBLE), {ndigits}) AS prob
FROM counts
""".strip()


def rfm_segments(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
    q: int = 5,
    scale: int = 100,
) -> DataFrame:
    """RFM segmentation: per user ``(user, recency_ts, frequency,
    monetary, r, f, m)`` with r/f/m the 1..q quantile scores (q=5 →
    quintiles; higher = more recent / frequent / valuable) — the
    classic audience-slicing table behind retention dashboards.

    Monetary sums integer-quantized values exactly; quantile scores are
    ``ntile(q)`` over deterministic total orders (metric, then user id as
    the tiebreak), so both engines assign identical scores.  One scan +
    one per-user aggregation; the three ntile windows run over the
    USER-level table (one row per user), not raw events.
    """
    from pyspark.sql import Window

    if q < 2:
        raise ValueError(f"q must be >= 2, got {q}")
    per_user = (
        events.where(F.col(user_col).isNotNull())
        .groupBy(F.col(user_col).alias("user"))
        .agg(
            F.max(ts_col).alias("recency_ts"),
            F.count(F.lit(1)).alias("frequency"),
            F.sum(F.round(F.col(value_col) * scale).cast("decimal(18,0)"))
            .cast("long")
            .alias("monetary"),
        )
    )
    wr = Window.orderBy(F.col("recency_ts").asc(), F.col("user").asc())
    wf = Window.orderBy(F.col("frequency").asc(), F.col("user").asc())
    wm = Window.orderBy(F.col("monetary").asc(), F.col("user").asc())
    return per_user.select(
        "user",
        "recency_ts",
        "frequency",
        "monetary",
        F.ntile(q).over(wr).alias("r"),
        F.ntile(q).over(wf).alias("f"),
        F.ntile(q).over(wm).alias("m"),
    )


def rfm_segments_oracle_sql(
    table: str = "events",
    user_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
    q: int = 5,
    scale: int = 100,
) -> str:
    """ANSI twin of :func:`rfm_segments`."""
    return f"""
WITH per_user AS (
  SELECT {user_col} AS "user",
         MAX({ts_col}) AS recency_ts,
         COUNT(*) AS frequency,
         CAST(SUM(CAST(ROUND({value_col} * {scale}) AS DECIMAL(18,0))) AS BIGINT) AS monetary
  FROM {table}
  WHERE {user_col} IS NOT NULL
  GROUP BY {user_col}
)
SELECT "user", recency_ts, frequency, monetary,
       CAST(NTILE({q}) OVER (ORDER BY recency_ts ASC, "user" ASC) AS INT) AS r,
       CAST(NTILE({q}) OVER (ORDER BY frequency ASC, "user" ASC) AS INT) AS f,
       CAST(NTILE({q}) OVER (ORDER BY monetary ASC, "user" ASC) AS INT) AS m
FROM per_user
""".strip()


def survival_km(
    events: DataFrame,
    start_type: str,
    target_type: str,
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    unit_seconds: int = 86400,
    scale: int = 10**6,
) -> DataFrame:
    """Kaplan-Meier time-to-conversion curve: for each elapsed-time step
    (in ``unit_seconds`` buckets since the user's first ``start_type``
    event), the survival probability that a user has NOT yet performed
    ``target_type``.  Users who never convert are right-censored at the
    corpus's last observed timestamp — the estimator the KM product-limit
    form exists for (dropping censored users would bias conversion fast).

    Returns one row per event time: ``(t, n_risk, n_events, n_censored,
    logs_micro, survival)`` where ``t`` is whole units since start,
    ``n_risk`` counts users still unconverted and uncensored just before
    ``t``, ``n_events`` conversions at exactly ``t``, and
    ``survival = exp(logs_micro/scale)`` with

    ``logs_micro = cumulative sum of floor(scale * ln((n_risk - n_events) / n_risk))``

    — each KM factor ``(1 - d_i/n_i)`` enters as a floor-quantized
    integer log BEFORE the cumulative sum (the shared micro-nat trick),
    so the curve replays cross-engine; a final time step where everyone
    at risk converts yields ``survival = 0`` exactly (flagged, not
    ln(0)).  ``n_censored`` counts users censored at exactly ``t``;
    censor-only times (no conversion event at ``t``) carry no output row,
    so per-row censored counts do not reconcile to the total — they drop
    out of ``n_risk`` at the next event time instead.

    **Scale** — two conditional min-aggregates collapse the event table
    to one row per user; everything after runs over distinct event
    TIMES (thousands of rows), so the windows are trivial.  The global
    censoring horizon is one scalar aggregate.
    """
    from pyspark.sql import Window

    if unit_seconds < 1 or scale < 1:
        raise ValueError("unit_seconds and scale must be >= 1")
    ev = events.where(F.col(ts_col).isNotNull() & F.col(user_col).isNotNull())
    per_user = ev.groupBy(user_col).agg(
        F.min(F.when(F.col(type_col) == start_type, F.col(ts_col))).alias("t0"),
        F.min(F.when(F.col(type_col) == target_type, F.col(ts_col))).alias("t1"),
    )
    horizon = ev.agg(F.max(ts_col).alias("hz"))
    obs = (
        per_user.where(F.col("t0").isNotNull())
        .crossJoin(F.broadcast(horizon))
        .select(
            F.when(
                F.col("t1").isNotNull() & (F.col("t1") >= F.col("t0")),
                F.floor(
                    (F.unix_timestamp("t1") - F.unix_timestamp("t0"))
                    / F.lit(unit_seconds)
                ),
            ).alias("t_event"),
            F.floor(
                (F.unix_timestamp("hz") - F.unix_timestamp("t0"))
                / F.lit(unit_seconds)
            ).alias("t_censor"),
        )
        .select(
            F.coalesce("t_event", "t_censor").cast("long").alias("t"),
            F.col("t_event").isNotNull().alias("converted"),
        )
    )
    times = obs.groupBy("t").agg(
        F.sum(F.when(F.col("converted"), 1).otherwise(0)).alias("n_events"),
        F.sum(F.when(F.col("converted"), 0).otherwise(1)).alias("n_censored"),
    )
    wo = Window.orderBy("t")
    wprev = wo.rowsBetween(Window.unboundedPreceding, -1)
    wrun = wo.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    total = obs.count()
    risk = times.withColumn(
        "n_risk",
        F.lit(int(total))
        - F.coalesce(
            F.sum(F.col("n_events") + F.col("n_censored")).over(wprev),
            F.lit(0).cast("long"),
        ),
    )
    term = F.when(
        F.col("n_risk") > F.col("n_events"),
        F.floor(
            F.lit(int(scale))
            * F.log(
                (F.col("n_risk") - F.col("n_events")).cast("double")
                / F.col("n_risk").cast("double")
            )
        ).cast("long"),
    ).otherwise(F.lit(0).cast("long"))
    out = (
        risk.where(F.col("n_events") > 0)
        .withColumn("_term", term)
        .withColumn("_zero", F.col("n_risk") == F.col("n_events"))
    )
    wrun2 = Window.orderBy("t").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    out = out.withColumns(
        {
            "logs_micro": F.sum("_term").over(wrun2),
            "_zero_seen": F.max(F.col("_zero").cast("int")).over(wrun2),
        }
    )
    return out.select(
        "t",
        "n_risk",
        "n_events",
        "n_censored",
        F.when(F.col("_zero_seen") == 1, F.lit(None).cast("long"))
        .otherwise(F.col("logs_micro"))
        .alias("logs_micro"),
        F.when(F.col("_zero_seen") == 1, F.lit(0.0))
        .otherwise(
            F.round(F.exp(F.col("logs_micro").cast("double") / int(scale)), 6)
        )
        .alias("survival"),
    )


def survival_km_oracle_sql(
    table: str = "events",
    start_type: str = "view",
    target_type: str = "purchase",
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    unit_seconds: int = 86400,
    scale: int = 10**6,
) -> str:
    """ANSI twin of :func:`survival_km` (same censoring horizon, same
    micro-nat factor quantization, same zero-survival flag)."""
    s = int(scale)
    return f"""
WITH ev AS (
  SELECT {user_col} AS u, {ts_col} AS ts, {type_col} AS et
  FROM {table} WHERE {ts_col} IS NOT NULL AND {user_col} IS NOT NULL
),
per_user AS (
  SELECT u,
         MIN(CASE WHEN et = '{start_type}' THEN ts END) AS t0,
         MIN(CASE WHEN et = '{target_type}' THEN ts END) AS t1
  FROM ev GROUP BY u
),
hz AS (SELECT MAX(ts) AS hz FROM ev),
obs AS (
  SELECT COALESCE(
           CASE WHEN t1 IS NOT NULL AND t1 >= t0
                THEN CAST(FLOOR(date_diff('second', t0, t1) / {unit_seconds}) AS BIGINT)
           END,
           CAST(FLOOR(date_diff('second', t0, hz.hz) / {unit_seconds}) AS BIGINT)
         ) AS t,
         (t1 IS NOT NULL AND t1 >= t0) AS converted
  FROM per_user CROSS JOIN hz
  WHERE t0 IS NOT NULL
),
times AS (
  SELECT t,
         CAST(SUM(CASE WHEN converted THEN 1 ELSE 0 END) AS BIGINT) AS n_events,
         CAST(SUM(CASE WHEN converted THEN 0 ELSE 1 END) AS BIGINT) AS n_censored
  FROM obs GROUP BY t
),
risk AS (
  SELECT t, n_events, n_censored,
         CAST((SELECT COUNT(*) FROM obs)
              - COALESCE(SUM(n_events + n_censored)
                         OVER (ORDER BY t ROWS BETWEEN UNBOUNDED PRECEDING
                               AND 1 PRECEDING), 0) AS BIGINT) AS n_risk
  FROM times
),
steps AS (
  SELECT t, n_risk, n_events, n_censored,
         CASE WHEN n_risk > n_events
              THEN CAST(FLOOR({s} * LN(CAST(n_risk - n_events AS DOUBLE)
                                       / CAST(n_risk AS DOUBLE))) AS BIGINT)
              ELSE 0 END AS term,
         CASE WHEN n_risk = n_events THEN 1 ELSE 0 END AS zero
  FROM risk WHERE n_events > 0
),
acc AS (
  SELECT t, n_risk, n_events, n_censored,
         SUM(term) OVER w AS logs_micro,
         MAX(zero) OVER w AS zero_seen
  FROM steps
  WINDOW w AS (ORDER BY t ROWS UNBOUNDED PRECEDING)
)
SELECT t, n_risk, n_events, n_censored,
       CAST(CASE WHEN zero_seen = 1 THEN NULL ELSE logs_micro END AS BIGINT) AS logs_micro,
       CASE WHEN zero_seen = 1 THEN 0.0
            ELSE ROUND(EXP(CAST(logs_micro AS DOUBLE) / {s}), 6) END AS survival
FROM acc
""".strip()
