"""Count-Min sketch as a mergeable Spark aggregation.

The sketch is ``depth`` rows of ``width`` counters; item frequencies are
overestimated by at most ``eps * N`` with probability ``1 - delta`` for
``width = ceil(e/eps)``, ``depth = ceil(ln(1/delta))``.

Cells-native: each input row contributes ``depth`` (row, col) coordinates
(pairwise hashes ``(h1 + (i+1)*h2) mod width``, JVM expressions), reduced by
Spark's hash aggregate into sparse ``(group, i, j) -> count`` cells — merge
of two sketches is just cell-count addition, which the same aggregation
performs for free.  :func:`cm_agg` packs the cells into a dense
``depth x width`` matrix per group; :func:`cm_query` answers point
frequency queries (min over rows).
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql.types import (
    ArrayType,
    DoubleType,
    IntegerType,
    StructField,
    StructType,
)

__all__ = [
    "params_for",
    "cm_cells",
    "cm_agg",
    "cm_point_estimates",
    "cm_query",
    "merge_matrices",
]


def params_for(eps: float, delta: float) -> tuple[int, int]:
    """(depth, width) for an eps/delta guarantee."""
    return math.ceil(math.log(1.0 / delta)), math.ceil(math.e / eps)


def _coords(col: str, depth: int, width: int):
    h1 = F.pmod(F.xxhash64(F.col(col)), F.lit(width))
    h2 = F.pmod(F.xxhash64(F.col(col), F.lit(7)), F.lit(width - 1)) + 1
    return [
        F.struct(
            F.lit(i).alias("i"),
            F.pmod(h1 + F.lit(i + 1) * h2, F.lit(width)).alias("j"),
        )
        for i in range(depth)
    ]


def cm_cells(
    df: DataFrame,
    col: str,
    by: list[str] | None = None,
    depth: int = 5,
    width: int = 2048,
    weight_col: str | None = None,
) -> DataFrame:
    by = list(by or [])
    w = F.col(weight_col).cast("double") if weight_col else F.lit(1.0)
    rows = df.where(F.col(col).isNotNull()).select(
        *by, w.alias("_w"), F.explode(F.array(*_coords(col, depth, width))).alias("_c")
    )
    return rows.groupBy(
        *by, F.col("_c.i").alias("_i"), F.col("_c.j").alias("_j")
    ).agg(F.sum("_w").alias("_cnt"))


def cm_agg(
    df: DataFrame,
    col: str,
    by: list[str] | None = None,
    depth: int = 5,
    width: int = 2048,
    weight_col: str | None = None,
) -> DataFrame:
    """Dense sketch per group: ``by... | matrix ARRAY<ARRAY<DOUBLE>> | total``."""
    by = list(by or [])
    cells = cm_cells(df, col, by, depth, width, weight_col)
    by_fields = [
        StructField(f.name, f.dataType, True)
        for f in cells.schema.fields
        if f.name in by
    ]
    schema = StructType(
        by_fields
        + [
            StructField("matrix", ArrayType(ArrayType(DoubleType()))),
            StructField("total", DoubleType()),
            StructField("depth", IntegerType()),
            StructField("width", IntegerType()),
        ]
    )

    def assemble(pdf: pd.DataFrame) -> pd.DataFrame:
        mat = np.zeros((depth, width), dtype=np.float64)
        mat[pdf["_i"].to_numpy(np.int64), pdf["_j"].to_numpy(np.int64)] = pdf[
            "_cnt"
        ].to_numpy(np.float64)
        rec = {c: pdf[c].iloc[0] for c in by}
        rec.update(
            matrix=[row.tolist() for row in mat],
            total=float(mat[0].sum()),
            depth=depth,
            width=width,
        )
        return pd.DataFrame([rec], columns=[f.name for f in schema.fields])

    if by:
        return cells.groupBy(*by).applyInPandas(assemble, schema)
    return (
        cells.withColumn("_g", F.lit(0))
        .groupBy("_g")
        .applyInPandas(lambda pdf: assemble(pdf.drop(columns=["_g"])), schema)
    )


def cm_point_estimates(
    df: DataFrame,
    col: str,
    probes: DataFrame,
    probe_col: str = "v",
    depth: int = 5,
    width: int = 2048,
    weight_col: str | None = None,
) -> DataFrame:
    """Distributed point-frequency query: ``probe_col | cm_est DOUBLE``.

    Builds the (global) sparse cells from ``df[col]`` and answers each probe
    as ``min over rows of the probed cell`` — the CM guarantee
    ``exact <= est <= exact + (e/width) * N`` holds per probe.  Probe values
    must carry the same Spark type as the indexed column (the hash is
    type-sensitive).  The join moves only ``depth`` coordinates per probe
    against the bounded cell table — no matrix is ever densified."""
    cells = cm_cells(df, col, None, depth, width, weight_col)
    coords = probes.select(
        F.col(probe_col).alias("v"),
        F.explode(F.array(*_coords(probe_col, depth, width))).alias("_c"),
    ).select("v", F.col("_c.i").alias("_i"), F.col("_c.j").alias("_j"))
    return (
        coords.join(cells, ["_i", "_j"], "left")
        .groupBy("v")
        .agg(F.min(F.coalesce(F.col("_cnt"), F.lit(0.0))).alias("cm_est"))
    )


def _to_matrix(matrix) -> np.ndarray:
    """Rows may arrive as an object array of arrays (Arrow nested lists)."""
    return np.stack([np.asarray(r, dtype=np.float64) for r in matrix])


def cm_query(spark, matrix, items: list, depth: int, width: int) -> list[float]:
    """Point-frequency estimates (min over rows); never underestimates.

    Items must carry the same type the sketch was built on —
    ``xxhash64('42')`` and ``xxhash64(42L)`` hit different cells."""
    from .bloom import _probe_schema

    mat = _to_matrix(matrix)
    df = spark.createDataFrame([(v,) for v in items], _probe_schema(items))
    h1 = np.array(
        [r[0] for r in df.select(F.pmod(F.xxhash64("v"), F.lit(width))).collect()],
        dtype=np.int64,
    )
    h2 = (
        np.array(
            [
                r[0]
                for r in df.select(
                    F.pmod(F.xxhash64("v", F.lit(7)), F.lit(width - 1))
                ).collect()
            ],
            dtype=np.int64,
        )
        + 1
    )
    out = []
    for a, b in zip(h1, h2):
        js = [(a + (i + 1) * b) % width for i in range(depth)]
        out.append(float(min(mat[i, j] for i, j in enumerate(js))))
    return out


def merge_matrices(a, b) -> np.ndarray:
    a = _to_matrix(a)
    b = _to_matrix(b)
    if a.shape != b.shape:
        raise ValueError("sketch shapes differ")
    return a + b
