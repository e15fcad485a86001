"""HyperLogLog distinct counting as a mergeable Spark aggregation.

Cells-native design (no raw row crosses the Python boundary):

* JVM: ``h = xxhash64(col)``; bucket = top ``p`` bits; the remaining bits,
  sign-flipped so signed MIN equals unsigned MIN, reduce per
  ``(group, bucket)`` with Spark's own hash aggregate — because the
  register value (leading-zero rank) is anti-monotone in the unsigned
  remainder, ``min`` of the flipped remainder IS the per-bucket register
  max.  The shuffle carries at most ``groups x 2^p`` cells.
* Python: one tiny stage turns each group's cells into registers and the
  bias-corrected HLL estimate (Flajolet et al. 2007 constants, linear
  counting below 2.5m).

Merging partial register arrays (e.g. across checkpoints) is element-wise
``max`` — :func:`merge_registers`.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql.types import (
    ArrayType,
    DoubleType,
    IntegerType,
    LongType,
    StructField,
    StructType,
)

__all__ = [
    "hll_cells",
    "hll_agg",
    "hll_cube",
    "hll_from_cells",
    "estimate_from_registers",
    "merge_registers",
]

_LONG_MIN = -(1 << 63)


def _alpha(m: int) -> float:
    if m == 16:
        return 0.673
    if m == 32:
        return 0.697
    if m == 64:
        return 0.709
    return 0.7213 / (1.0 + 1.079 / m)


def hll_cells(
    df: DataFrame, col: str, by: list[str] | None = None, p: int = 12
) -> DataFrame:
    """Per-(group, bucket) minimal flipped remainder — the mergeable state."""
    by = list(by or [])
    h = F.xxhash64(F.col(col))
    bucket = F.shiftrightunsigned(h, 64 - p)
    rest = F.shiftleft(h, p)  # low bits shifted up; 0 when all-zero
    flipped = rest.bitwiseXOR(F.lit(_LONG_MIN))  # signed order == unsigned order
    return (
        df.where(F.col(col).isNotNull())
        .select(*by, bucket.alias("_b"), flipped.alias("_r"))
        .groupBy(*by, "_b")
        .agg(F.min("_r").alias("_rmin"))
    )


def _rank_of_flipped(rmin: np.ndarray, p: int) -> np.ndarray:
    """leading_zeros(rest) + 1 from the sign-flipped minimal remainder."""
    rest = (rmin.astype(np.int64).view(np.uint64)) ^ np.uint64(1 << 63)
    ranks = np.zeros(len(rest), dtype=np.int64)
    nz = rest != 0
    # clz via float64 log2 is unsafe near 2^k; use bit_length per element
    bl = np.zeros(len(rest), dtype=np.int64)
    r = rest[nz]
    # vectorized bit_length: position of highest set bit
    out = np.zeros(r.shape, dtype=np.int64)
    for shift in (32, 16, 8, 4, 2, 1):
        mask = r >= (np.uint64(1) << np.uint64(shift))
        out[mask] += shift
        r = np.where(mask, r >> np.uint64(shift), r)
    bl[nz] = out + 1
    ranks[nz] = 64 - bl[nz] + 1
    ranks[~nz] = 64 - p + 1
    return np.minimum(ranks, 64 - p + 1)


def estimate_from_registers(registers: np.ndarray) -> float:
    """Bias-corrected HLL estimate with linear-counting small-range fix."""
    m = len(registers)
    raw = _alpha(m) * m * m / np.sum(np.power(2.0, -registers.astype(np.float64)))
    zeros = int((registers == 0).sum())
    if raw <= 2.5 * m and zeros > 0:
        return m * np.log(m / zeros)
    return float(raw)


def merge_registers(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    if len(a) != len(b):
        raise ValueError("register widths differ")
    return np.maximum(a, b)


def hll_agg(
    df: DataFrame, col: str, by: list[str] | None = None, p: int = 12
) -> DataFrame:
    """Distinct-count estimate per group:
    ``by... | hll_estimate DOUBLE | registers ARRAY<INT>``."""
    by = list(by or [])
    return hll_from_cells(hll_cells(df, col, by, p), by, p)


def hll_from_cells(
    cells: DataFrame, by: list[str] | None = None, p: int = 12
) -> DataFrame:
    """Finalize ``(group, bucket, rmin)`` cells (from :func:`hll_cells` or a
    streaming windowed variant) into per-group estimates + registers."""
    by = list(by or [])
    by_fields = [
        StructField(f.name, f.dataType, True)
        for f in cells.schema.fields
        if f.name in by
    ]
    schema = StructType(
        by_fields
        + [
            StructField("hll_estimate", DoubleType()),
            StructField("registers", ArrayType(IntegerType())),
        ]
    )

    def assemble(pdf: pd.DataFrame) -> pd.DataFrame:
        regs = np.zeros(1 << p, dtype=np.int64)
        b = pdf["_b"].to_numpy(np.int64)
        ranks = _rank_of_flipped(pdf["_rmin"].to_numpy(np.int64), p)
        regs[b] = ranks
        rec = {c: pdf[c].iloc[0] for c in by}
        rec["hll_estimate"] = estimate_from_registers(regs)
        rec["registers"] = regs.astype(np.int32).tolist()
        return pd.DataFrame([rec], columns=[f.name for f in schema.fields])

    if by:
        return cells.groupBy(*by).applyInPandas(assemble, schema)
    return (
        cells.withColumn("_g", F.lit(0))
        .groupBy("_g")
        .applyInPandas(lambda pdf: assemble(pdf.drop(columns=["_g"])), schema)
    )


def hll_cube(
    df: DataFrame,
    col: str,
    by: list[str],
    grouping_sets: list[list[str]] | None = None,
    p: int = 12,
) -> DataFrame:
    """Distinct-count estimates for MANY grouping levels from ONE scan:
    ``(set_id, by..., hll_estimate, registers)`` with one output row per
    group per grouping set (default: the ROLLUP prefixes of ``by``,
    including the grand total).  Aggregated-away columns are NULL, as in
    SQL ROLLUP; ``set_id`` is the index into ``grouping_sets`` so a NULL
    padding cell is never confused with a NULL data value.

    **Scale**: the register cells aggregate through a single GROUPING
    SETS min-aggregate — Catalyst's Expand replicates rows after the
    scan and *before* partial aggregation, so the shuffle carries only
    ``groups x 2^p`` register cells per level, never the expanded rows.
    N separate ``hll_agg`` calls would cost N scans.
    """
    by = list(by)
    if grouping_sets is None:
        grouping_sets = [by[:i] for i in range(len(by), -1, -1)]
    for lvl in grouping_sets:
        bad = [c for c in lvl if c not in by]
        if bad:
            raise ValueError(f"grouping set {lvl} has columns not in by: {bad}")

    h = F.xxhash64(F.col(col))
    bucket = F.shiftrightunsigned(h, 64 - p)
    flipped = F.shiftleft(h, p).bitwiseXOR(F.lit(_LONG_MIN))
    w = df.where(F.col(col).isNotNull()).select(
        *by, bucket.alias("_b"), flipped.alias("_r")
    )
    sets = [[*(F.col(c) for c in lvl), F.col("_b")] for lvl in grouping_sets]
    cells = w.groupingSets(sets, *[F.col(c) for c in by], F.col("_b")).agg(
        F.min("_r").alias("_rmin"), F.grouping_id().alias("_gid")
    )
    # grouping_id bit i (MSB-first over by + [_b]) set <=> column aggregated
    # away; _b is grouped in every set, so its bit is always 0
    n = len(by) + 1
    gid_of = {
        sum(1 << (n - 1 - i) for i, c in enumerate(by) if c not in lvl): si
        for si, lvl in enumerate(grouping_sets)
    }
    if len(gid_of) != len(grouping_sets):
        raise ValueError("duplicate grouping sets")
    sid = None
    for gid, si in gid_of.items():
        cond = F.col("_gid") == gid
        sid = F.when(cond, si) if sid is None else sid.when(cond, si)
    cells = cells.withColumn("_sid", sid.cast("int")).drop("_gid")
    out = hll_from_cells(cells, ["_sid", *by], p)
    return out.withColumnRenamed("_sid", "set_id")
