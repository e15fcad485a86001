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

__all__ = ["funnel", "cohort_retention", "top_paths", "markov_transitions", "markov_transitions_oracle_sql", "rfm_segments", "rfm_segments_oracle_sql"]


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
