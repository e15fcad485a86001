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

__all__ = ["profile_table"]


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
