"""DDSketch expressed purely in Spark SQL expressions — no Python in the hot
path at all.

For strictly positive values the whole sketch pipeline is a composition of
relational operators, which keeps every stage inside Catalyst/Tungsten
whole-stage codegen:

* key assignment  — ``ceil(log2(v) * multiplier)``  (projection; the
  reference's ``LogarithmicMapping.key``, ``ddsketch/mapping.py:75-83,107-109``)
* bucket counting — ``groupBy(keys, k).count()``   (partial+final hash agg —
  Spark's own map-side combine does what ``store.add`` does)
* optional collapse — clamp ``k`` against the per-group max/min key
  (``max(k) over (partition by g)``), re-aggregate (the clamped-counter
  semantics of the collapsing stores, ``ddsketch/store.py:262-504``)
* quantile        — running count over keys ordered by ``k``; the bucket at
  rank ``q*(n-1)`` is the first with ``run > rank``
  (``ddsketch/store.py:234-242``), finished by
  ``pow(2, k/multiplier) * 2/(1+gamma)`` (``mapping.py:85-93``).

The same formula rendered as ANSI SQL is this engine's DuckDB oracle — see
:func:`ansi_sql_quantile_sketch`.

The window scan runs over *bucket counts*, not rows — after the groupBy the
per-group row count is at most a few hundred buckets, so the window stage is
negligible at any scale.  Use :mod:`ddspark.agg` when values can be negative
or zero, when you need the exact min/max/sum side stats, or when sketch
*state* must be persisted; use this path when the query is one-shot quantiles
over positive values and you want zero Python overhead.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from .mapping import LogarithmicMapping
from .sketch import SketchConfig
from .store import COLLAPSE_HIGHEST, COLLAPSE_LOWEST
from .agg import quantile_label

__all__ = ["sql_quantile_sketch", "ansi_sql_quantile_sketch"]


def sql_quantile_sketch(
    df: DataFrame,
    value_col: str,
    by: list[str] | None = None,
    qs: list[float] = (0.5, 0.95, 0.99),
    alpha: float = 0.01,
    mode: str | None = None,
    bin_limit: int | None = None,
    weight_col: str | None = None,
) -> DataFrame:
    """Pure-SQL grouped DDSketch quantiles over positive values.

    Returns one row per group: ``by... | count | p50 | p95 | ...`` with each
    estimate within ``alpha`` relative error of the exact rank value.
    Weighted adds (fractional weights included) via ``weight_col``.
    """
    by = list(by or [])
    mapping = LogarithmicMapping(alpha)
    m = mapping._multiplier
    gamma = mapping.gamma

    w = F.col(weight_col).cast("double") if weight_col else F.lit(1.0)
    keyed = df.where(F.col(value_col) > 0).select(
        *by,
        F.ceil(F.log2(F.col(value_col)) * F.lit(m)).cast("long").alias("k"),
        w.alias("w"),
    )
    counts = keyed.groupBy(*by, "k").agg(F.sum("w").alias("c"))

    if mode in (COLLAPSE_LOWEST, COLLAPSE_HIGHEST) and bin_limit:
        wg = Window.partitionBy(*by) if by else Window.partitionBy(F.lit(0))
        if mode == COLLAPSE_LOWEST:
            clamped = F.greatest(
                F.col("k"), F.max("k").over(wg) - F.lit(bin_limit - 1)
            )
        else:
            clamped = F.least(F.col("k"), F.min("k").over(wg) + F.lit(bin_limit - 1))
        counts = (
            counts.withColumn("k", clamped)
            .groupBy(*by, "k")
            .agg(F.sum("c").alias("c"))
        )

    w_cum = (
        (Window.partitionBy(*by) if by else Window.partitionBy(F.lit(0)))
        .orderBy("k")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_all = Window.partitionBy(*by) if by else Window.partitionBy(F.lit(0))
    cum = counts.withColumn("run", F.sum("c").over(w_cum)).withColumn(
        "n", F.sum("c").over(w_all)
    )

    aggs = [F.max("n").alias("count")]
    for q in qs:
        rank = F.lit(q) * (F.col("n") - 1)
        key_q = F.min(F.when(F.col("run") > rank, F.col("k")))
        value_q = F.pow(F.lit(2.0), key_q.cast("double") / F.lit(m)) * F.lit(
            2.0 / (1.0 + gamma)
        )
        aggs.append(value_q.alias(quantile_label(q)))
    grouped = cum.groupBy(*by) if by else cum.groupBy()
    return grouped.agg(*aggs)


def ansi_sql_quantile_sketch(
    table: str,
    value_expr: str,
    by: list[str] | None = None,
    qs: list[float] = (0.5, 0.95, 0.99),
    alpha: float = 0.01,
    mode: str | None = None,
    bin_limit: int | None = None,
    where: str | None = None,
    round_digits: int | None = 6,
    weight_expr: str = "1.0",
) -> str:
    """The same DDSketch computation as portable ANSI SQL (DuckDB-ready).

    Used as the independent oracle for this engine's correctness gate: the
    distributed Spark pipeline and this single-node SQL must produce the same
    quantile values for the same input.
    """
    by = list(by or [])
    mapping = LogarithmicMapping(alpha)
    m = repr(mapping._multiplier)
    gamma = repr(mapping.gamma)
    by_sel = ", ".join(by) + ", " if by else ""
    by_grp = ", ".join(by) if by else ""
    part = f"PARTITION BY {by_grp} " if by else ""
    filt = f"({value_expr}) > 0" + (f" AND ({where})" if where else "")

    if mode == COLLAPSE_LOWEST and bin_limit:
        clamp = (
            f"GREATEST(k, MAX(k) OVER ({part.strip() or 'PARTITION BY 1'}) "
            f"- {bin_limit - 1})"
        )
    elif mode == COLLAPSE_HIGHEST and bin_limit:
        clamp = (
            f"LEAST(k, MIN(k) OVER ({part.strip() or 'PARTITION BY 1'}) "
            f"+ {bin_limit - 1})"
        )
    else:
        clamp = "k"

    q_exprs = []
    for q in qs:
        val = (
            f"POWER(2.0, CAST(MIN(CASE WHEN run > {q!r} * (n - 1) THEN k END) "
            f"AS DOUBLE) / {m}) * (2.0 / (1.0 + {gamma}))"
        )
        if round_digits is not None:
            val = f"ROUND({val}, {round_digits})"
        q_exprs.append(f"{val} AS {quantile_label(q)}")
    q_sel = ",\n       ".join(q_exprs)

    return f"""
WITH keyed AS (
  SELECT {by_sel}CAST(CEIL(LOG2({value_expr}) * {m}) AS BIGINT) AS k,
         CAST(({weight_expr}) AS DOUBLE) AS w
  FROM {table}
  WHERE {filt}
),
counts0 AS (
  SELECT {by_sel}k, SUM(w) AS c
  FROM keyed GROUP BY {by_sel.rstrip(', ') + ', ' if by else ''}k
),
counts AS (
  SELECT {by_sel}ck AS k, SUM(c) AS c FROM (
    SELECT {by_sel}{clamp} AS ck, c FROM counts0
  ) GROUP BY {by_sel.rstrip(', ') + ', ' if by else ''}ck
),
cum AS (
  SELECT {by_sel}k, c,
         SUM(c) OVER ({part}ORDER BY k ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS run,
         SUM(c) OVER ({part.strip() or 'PARTITION BY 1'}) AS n
  FROM counts
)
SELECT {by_sel}MAX(n) AS count,
       {q_sel}
FROM cum
{('GROUP BY ' + by_grp) if by else ''}
""".strip()
