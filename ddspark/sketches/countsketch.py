"""Count-Sketch (AMS) as a mergeable Spark aggregation.

The sketch is ``depth`` rows of ``width`` signed counters; for item ``x``
row ``i`` adds ``s_i(x)`` (a +/-1 hash sign) at column ``h_i(x)``.  It
answers three estimation problems the plain Count-Min sketch cannot:

* **point frequency** — ``median_i(s_i(x) * C[i][h_i(x)])`` is an
  *unbiased* estimate (Count-Min only overestimates), error
  ``O(sqrt(F2/width))`` per row (Charikar, Chen, Farach-Colton 2002).
* **second frequency moment** ``F2 = sum_k count(k)^2`` —
  ``median_i(sum_j C[i][j]^2)`` (Alon-Matias-Szegedy 1996; the classic
  "tug-of-war" estimator, one per row), relative error
  ``O(1/sqrt(width))``.
* **join size / inner product** ``|A JOIN_k B| = sum_k cA(k)*cB(k)`` —
  ``median_i(sum_j A[i][j]*B[i][j])`` for two sketches built with the
  SAME hashes; this is the standard sketch-based join-cardinality
  estimator a query planner uses before committing to a shuffle.

Cells-native like :mod:`.countmin`: each input row explodes into ``depth``
``(i, j, sign)`` coordinates (pure JVM hash expressions), reduced by
Spark's partial+final hash aggregate into sparse ``(group, i, j) -> cnt``
cells.  Merging two sketches is cell addition — the same aggregation
performs it for free, so the estimate is independent of partitioning.

With the default integer weights every counter, row estimate, and median
is exact BIGINT arithmetic, so the ``portable=True`` path (md5-derived
:func:`~ddspark.pipeline.hashing.portable_hash63`) is replayed
*bit-for-bit* by the DuckDB oracle — no float tolerance anywhere.

``depth`` must be odd so the median is an order statistic (picked by
``array_sort`` + ``element_at``), never an average of two rows.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from ..pipeline.hashing import portable_hash63

__all__ = [
    "cs_cells",
    "cs_row_f2",
    "cs_f2_estimates",
    "cs_point_estimates",
    "cs_join_size",
]


def _check_depth(depth: int) -> None:
    if depth < 1 or depth % 2 == 0:
        raise ValueError(f"depth must be odd and >= 1, got {depth}")


def _coord(col: Column, i: int, width: int, portable: bool) -> Column:
    """Column index of row ``i`` for value ``col`` (non-negative)."""
    if portable:
        return portable_hash63(F.concat(col, F.lit(f"|{i}"))) % width
    return F.pmod(F.xxhash64(col, F.lit(i)), F.lit(width))


def _sign(col: Column, i: int, width: int, portable: bool) -> Column:
    """+/-1 sign hash of row ``i``, independent of :func:`_coord`."""
    if portable:
        bit = portable_hash63(F.concat(col, F.lit(f"|s{i}"))) % 2
    else:
        bit = F.pmod(F.xxhash64(col, F.lit(1000 + i)), F.lit(2))
    return (F.lit(1) - F.lit(2) * bit).cast("long")


def cs_cells(
    df: DataFrame,
    col: str,
    by: list[str] | None = None,
    depth: int = 5,
    width: int = 1024,
    weight_col: str | None = None,
    portable: bool = False,
) -> DataFrame:
    """Sparse sketch cells ``by... | _i | _j | _cnt`` (signed sums).

    NULL values are dropped (they are not countable items).  With no
    ``weight_col`` the counters are exact BIGINTs.
    """
    _check_depth(depth)
    by = list(by or [])
    v = F.col(col)
    w = F.col(weight_col).cast("long") if weight_col else F.lit(1).cast("long")
    coords = F.array(
        *[
            F.struct(
                F.lit(i).alias("i"),
                _coord(v, i, width, portable).alias("j"),
                _sign(v, i, width, portable).alias("s"),
            )
            for i in range(depth)
        ]
    )
    rows = df.where(v.isNotNull()).select(
        *by, w.alias("_w"), F.explode(coords).alias("_c")
    )
    return rows.groupBy(
        *by, F.col("_c.i").alias("_i"), F.col("_c.j").alias("_j")
    ).agg(F.sum(F.col("_c.s") * F.col("_w")).alias("_cnt"))


def cs_row_f2(cells: DataFrame, by: list[str] | None = None) -> DataFrame:
    """Per-row tug-of-war estimates ``by... | _i | row_f2`` from cells."""
    by = list(by or [])
    return cells.groupBy(*by, "_i").agg(
        F.sum(F.col("_cnt") * F.col("_cnt")).alias("row_f2")
    )


def _median_long(col: str, depth: int) -> Column:
    """Exact integer median of the ``depth`` (odd) values in ``col``."""
    return F.element_at(
        F.array_sort(F.collect_list(F.col(col))), (depth + 1) // 2
    )


def cs_f2_estimates(
    df: DataFrame,
    col: str,
    by: list[str] | None = None,
    depth: int = 5,
    width: int = 1024,
    weight_col: str | None = None,
    portable: bool = False,
) -> DataFrame:
    """F2 (self-join size) estimate per group: ``by... | f2_est``.

    Median over ``depth`` independent AMS rows; each row's standard error
    is ``<= F2 * sqrt(2/width)``, so at the default width the estimate is
    within a few percent with overwhelming probability.  The collect per
    group is ``depth`` BIGINTs — bounded, never data-sized.
    """
    by = list(by or [])
    cells = cs_cells(df, col, by, depth, width, weight_col, portable)
    rows = cs_row_f2(cells, by)
    agg = rows.groupBy(*by) if by else rows.groupBy()
    return agg.agg(_median_long("row_f2", depth).alias("f2_est"))


def cs_point_estimates(
    df: DataFrame,
    col: str,
    probes: DataFrame,
    probe_col: str,
    depth: int = 5,
    width: int = 1024,
    weight_col: str | None = None,
    portable: bool = False,
) -> DataFrame:
    """Unbiased point-frequency estimates for each probe value.

    Returns ``probe_col | cs_est`` (BIGINT).  The probe side is expected
    to be small and is broadcast; each probe reads ``depth`` cells of the
    sketch via an equi-join on the probe's own hash coordinates, so the
    big side is touched once to build cells and never again.
    """
    _check_depth(depth)
    cells = cs_cells(df, col, None, depth, width, weight_col, portable)
    p = F.col(probe_col)
    pc = F.array(
        *[
            F.struct(
                F.lit(i).alias("i"),
                _coord(p, i, width, portable).alias("j"),
                _sign(p, i, width, portable).alias("s"),
            )
            for i in range(depth)
        ]
    )
    probe_coords = probes.select(
        p.alias(probe_col), F.explode(pc).alias("_c")
    ).select(
        probe_col,
        F.col("_c.i").alias("_i"),
        F.col("_c.j").alias("_j"),
        F.col("_c.s").alias("_s"),
    )
    joined = cells.join(
        F.broadcast(probe_coords), on=["_i", "_j"], how="inner"
    ).select(probe_col, "_i", (F.col("_s") * F.col("_cnt")).alias("_est"))
    # A probe whose (i, j) cell is empty reads 0 for that row: re-attach
    # all depth rows per probe so the median sees exactly `depth` values.
    all_rows = probes.select(probe_col).crossJoin(
        F.broadcast(
            probes.sparkSession.range(depth).select(F.col("id").cast("int").alias("_i"))
        )
    )
    full = all_rows.join(joined, on=[probe_col, "_i"], how="left").select(
        probe_col, F.coalesce(F.col("_est"), F.lit(0)).alias("_est")
    )
    return full.groupBy(probe_col).agg(_median_long("_est", depth).alias("cs_est"))


def cs_join_size(
    df_a: DataFrame,
    col_a: str,
    df_b: DataFrame,
    col_b: str,
    depth: int = 5,
    width: int = 1024,
    portable: bool = False,
) -> DataFrame:
    """Equi-join cardinality estimate ``|A JOIN B ON a = b|`` — one row
    ``join_size_est`` (BIGINT).

    Builds one sketch per side with the SAME hash family and medians the
    per-row inner products.  Cost: one scan + one ``depth*width``-bounded
    aggregation per side, versus actually executing the join — this is
    the estimator to run before choosing a join strategy at 100 TB.
    """
    _check_depth(depth)
    ca = cs_cells(df_a.select(F.col(col_a).alias("_k")), "_k", None, depth, width, None, portable)
    cb = cs_cells(df_b.select(F.col(col_b).alias("_k")), "_k", None, depth, width, None, portable)
    prod = (
        ca.alias("a")
        .join(cb.alias("b"), on=["_i", "_j"], how="inner")
        .select("_i", (F.col("a._cnt") * F.col("b._cnt")).alias("_p"))
    )
    # Empty-intersection rows contribute 0; re-anchor all depth rows.
    spark = df_a.sparkSession
    rows = spark.range(depth).select(F.col("id").cast("int").alias("_i"))
    per_row = rows.join(
        prod.groupBy("_i").agg(F.sum("_p").alias("row_ip")), on="_i", how="left"
    ).select(F.coalesce(F.col("row_ip"), F.lit(0)).alias("row_ip"))
    return per_row.groupBy().agg(_median_long("row_ip", depth).alias("join_size_est"))
