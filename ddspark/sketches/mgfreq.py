"""Misra-Gries frequent-items (heavy hitters) as a mergeable Spark
aggregation.

The MG summary keeps at most ``k`` counters; every compression that evicts
an item subtracts the same value from *all* counters, so for every item
``est <= true`` and ``true - est <= (total subtracted)``.  MG summaries are
mergeable — counter addition followed by re-compression preserves the
error bound for any merge tree (Agarwal et al., "Mergeable Summaries",
PODS 2012) — which makes the sketch exactly the shape of a Spark partial
aggregate, like the DDSketch engine itself.

Unlike a plain ``groupBy(item).count()`` (exact, but shuffles one row per
*distinct item* — unbounded at web scale), the MG pipeline's shuffle is
bounded: each partition emits at most ``k + 1`` rows regardless of how many
distinct items it saw, so the merge moves ``partitions x (k+1)`` rows total.

Instead of trusting the PODS ``N/(k+1)`` bound, this implementation
*certifies* its own error: every compression's subtraction is carried
through the pipeline (the NULL-item row per partition plus the final
compression), so the output's ``err_bound`` column is an exact upper bound
on the undercount of ANY item — present or evicted.  Guarantees (tested):

* ``est <= true <= est + err_bound`` for every emitted item;
* every item with ``true > err_bound`` is present in the summary.

Python appears only in Arrow-batched kernels (``mapInPandas`` partials with
incremental per-partition MG state, ``applyInPandas`` final merge); counting
inside a batch is vectorized pandas ``groupby``.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql.types import DoubleType, StringType, StructField, StructType

__all__ = ["mg_compress", "mg_partials", "mg_summary", "mg_check"]


def mg_compress(counts: pd.Series, k: int) -> tuple[pd.Series, float]:
    """Compress an item->count series to at most ``k`` counters.

    Subtracts the (k+1)-th largest count from every counter and drops the
    non-positive ones (classic MG decrement, batched).  Returns
    ``(kept, err)`` where ``err`` is the subtracted value — the undercount
    this step adds to every item.
    """
    if len(counts) <= k:
        return counts, 0.0
    vals = np.sort(counts.to_numpy(np.float64))[::-1]
    err = float(vals[k])
    kept = counts[counts > err] - err
    return kept, err


def _out_fields() -> list[StructField]:
    return [
        StructField("item", StringType(), True),  # NULL = subtracted-mass row
        StructField("cnt", DoubleType(), True),
        StructField("tot", DoubleType(), True),
    ]


def mg_partials(
    df: DataFrame,
    col: str,
    k: int = 64,
    by: list[str] | None = None,
    weight_col: str | None = None,
) -> DataFrame:
    """Per-partition MG summaries: at most ``k`` item rows plus one NULL-item
    row per (partition, group) carrying ``(subtracted mass, partition
    total)``.  Items are compared as strings (engine-portable, no hashing).
    """
    by = list(by or [])
    cols = by + [col] + ([weight_col] if weight_col else [])
    schema = StructType(
        [StructField(b, df.schema[b].dataType, True) for b in by] + _out_fields()
    )
    names = [f.name for f in schema.fields]

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # state per group key: (counts Series, err, total)
        state: dict[tuple, list] = {}
        for pdf in batches:
            pdf = pdf[pdf[col].notna()]
            if not len(pdf):
                continue
            item = pdf[col].astype(str)
            w = (
                pdf[weight_col].astype(np.float64)
                if weight_col
                else pd.Series(np.ones(len(pdf)), index=pdf.index)
            )
            if (w <= 0).any():
                raise ValueError("weight must be positive")
            gkeys = (
                list(zip(*[pdf[b] for b in by])) if by else [()] * len(pdf)
            )
            frame = pd.DataFrame({"_g": gkeys, "_i": item, "_w": w.to_numpy()})
            for g, sub in frame.groupby("_g", sort=False):
                counts = sub.groupby("_i", sort=False)["_w"].sum()
                st = state.setdefault(g, [pd.Series(dtype=np.float64), 0.0, 0.0])
                st[0] = st[0].add(counts, fill_value=0.0)
                st[0], e = mg_compress(st[0], k)
                st[1] += e
                st[2] += float(sub["_w"].sum())
        out = []
        for g, (counts, err, tot) in state.items():
            for it, c in counts.items():
                out.append(list(g) + [it, float(c), 0.0])
            out.append(list(g) + [None, err, tot])
        yield pd.DataFrame(out, columns=names)

    return df.select(*cols).mapInPandas(gen, schema)


def mg_summary(
    df: DataFrame,
    col: str,
    k: int = 64,
    by: list[str] | None = None,
    weight_col: str | None = None,
) -> DataFrame:
    """Frequent-items summary per group:
    ``by... | item | est | err_bound | total``.

    ``err_bound`` (same value on every row of a group) certifies
    ``est <= true <= est + err_bound`` for every item, and that any item
    with ``true > err_bound`` appears.  Shuffle: ``partitions x (k+1)``
    rows per group, never one row per distinct item.
    """
    by = list(by or [])
    part = mg_partials(df, col, k, by, weight_col)
    schema = StructType(
        [StructField(b, df.schema[b].dataType, True) for b in by]
        + [
            StructField("item", StringType(), True),
            StructField("est", DoubleType(), True),
            StructField("err_bound", DoubleType(), True),
            StructField("total", DoubleType(), True),
        ]
    )
    names = [f.name for f in schema.fields]

    def fin(pdf: pd.DataFrame) -> pd.DataFrame:
        null_rows = pdf[pdf["item"].isna()]
        err = float(null_rows["cnt"].sum())
        total = float(null_rows["tot"].sum())
        items = pdf[pdf["item"].notna()]
        counts = items.groupby("item", sort=False)["cnt"].sum()
        counts, e2 = mg_compress(counts, k)
        err += e2
        keys = {b: pdf[b].iloc[0] for b in by}
        out = [
            {**keys, "item": it, "est": float(c), "err_bound": err, "total": total}
            for it, c in counts.items()
        ]
        if not out:  # group existed but everything was compressed away
            out = [{**keys, "item": None, "est": 0.0, "err_bound": err, "total": total}]
        return pd.DataFrame(out, columns=names)

    if by:
        return part.groupBy(*by).applyInPandas(fin, schema)
    return (
        part.withColumn("_g", F.lit(0))
        .groupBy("_g")
        .applyInPandas(lambda pdf: fin(pdf.drop(columns=["_g"])), schema)
    )


def mg_check(
    df: DataFrame,
    col: str,
    k: int = 64,
    by: list[str] | None = None,
    weight_col: str | None = None,
) -> DataFrame:
    """Certified-guarantee check, one row per group:
    ``by... | n_rows | guarantee_ok BOOLEAN``.

    Computes the MG summary AND the exact per-item counts in one Spark job,
    then verifies (a) ``est <= true <= est + err_bound`` for every summary
    item and (b) every item with ``true > err_bound`` is in the summary.
    An independent engine can recompute ``n_rows`` and assert
    ``guarantee_ok`` — the sketch's contract reduced to a deterministic
    boolean (summary *contents* legitimately vary with partitioning; the
    guarantee may not).
    """
    by = list(by or [])
    w = F.col(weight_col).cast("double") if weight_col else F.lit(1.0)
    exact = (
        df.where(F.col(col).isNotNull())
        .groupBy(*by, F.col(col).cast("string").alias("item"))
        .agg(F.sum(w).alias("true_cnt"))
    )
    summ = mg_summary(df, col, k, by, weight_col)
    # null-safe join keys: a NULL group value must still pair its exact
    # rows with its summary rows (plain list-join EqualTo never matches
    # NULL, which would make every item of a NULL group look missing)
    ex, sm = exact.alias("ex"), summ.alias("sm")
    cond = F.lit(True)
    for c in [*by, "item"]:
        cond = cond & F.col(f"ex.{c}").eqNullSafe(F.col(f"sm.{c}"))
    joined = ex.join(sm, cond, "full").select(
        *[F.coalesce(f"ex.{b}", f"sm.{b}").alias(b) for b in by],
        F.coalesce("ex.item", "sm.item").alias("item"),
        F.col("ex.true_cnt").alias("true_cnt"),
        F.col("sm.est").alias("est"),
        F.col("sm.err_bound").alias("err_bound"),
    )
    grp = [F.col(b) for b in by]
    per_item_ok = F.when(
        F.col("est").isNotNull() & F.col("item").isNotNull(),
        (F.col("est") <= F.col("true_cnt"))
        & (F.col("true_cnt") <= F.col("est") + F.col("err_bound")),
    ).otherwise(F.lit(True))
    bound = F.first("err_bound", ignorenulls=True)
    agg = joined.groupBy(*grp if by else [F.lit(0).alias("_g")]).agg(
        F.sum(F.coalesce("true_cnt", F.lit(0.0))).alias("n_rows"),
        F.bool_and(per_item_ok).alias("_within"),
        bound.alias("_err"),
        F.max(
            F.when(F.col("est").isNull() & F.col("item").isNotNull(), F.col("true_cnt"))
        ).alias("_worst_missing"),
    )
    ok = F.col("_within") & (
        F.col("_worst_missing").isNull() | (F.col("_worst_missing") <= F.col("_err"))
    )
    keep = by if by else []
    return agg.select(*keep, "n_rows", ok.alias("guarantee_ok"))
