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

__all__ = ["funnel", "cohort_retention"]


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
