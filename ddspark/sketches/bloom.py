"""Bloom filter as a mergeable Spark aggregation.

JVM side: k bit positions per item via double hashing
``(h1 + i*h2) mod m`` (both hashes reduced mod m first so the arithmetic
never overflows int64), exploded and distinct-reduced per group — the
shuffle carries ``(group, bit)`` pairs, at most ``m`` per group.
Python side: one stage packs each group's bit set into a bytes bitmap.

Merging two filters with identical (m, k) is bitwise OR —
:func:`merge_bitmaps`; membership tests run driver-side
(:func:`contains`) or as a broadcast join against the bit table.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql.types import (
    BinaryType,
    DoubleType,
    IntegerType,
    LongType,
    StructField,
    StructType,
)

__all__ = [
    "bloom_bits",
    "bloom_agg",
    "bloom_contains_df",
    "contains",
    "merge_bitmaps",
    "false_positive_rate",
]


def _positions(col: str, m: int, k: int, portable: bool = False):
    """k bit positions per item.  ``portable`` uses the md5-derived hash pair
    (string columns only) so the positions — and therefore membership
    answers — are exactly replayable in ANSI SQL
    (:func:`ddspark.pipeline.oracles.bloom_membership_oracle_sql`)."""
    if portable:
        from ..pipeline.hashing import portable_hash63

        h1 = F.pmod(portable_hash63(F.col(col)), F.lit(m))
        h2 = F.pmod(
            portable_hash63(F.concat(F.col(col), F.lit("#1"))), F.lit(m - 1)
        ) + 1
    else:
        h1 = F.pmod(F.xxhash64(F.col(col)), F.lit(m))
        h2 = F.pmod(F.xxhash64(F.col(col), F.lit(1)), F.lit(m - 1)) + 1
    return [F.pmod(h1 + F.lit(i) * h2, F.lit(m)).alias(f"_p{i}") for i in range(k)]


def bloom_bits(
    df: DataFrame,
    col: str,
    by: list[str] | None = None,
    m: int = 1 << 16,
    k: int = 5,
    portable: bool = False,
) -> DataFrame:
    """Distinct ``(group, bit)`` pairs — the mergeable state."""
    by = list(by or [])
    exploded = (
        df.where(F.col(col).isNotNull())
        .select(*by, F.explode(F.array(*_positions(col, m, k, portable))).alias("_bit"))
        .distinct()
    )
    return exploded


def bloom_contains_df(
    df: DataFrame,
    col: str,
    probes: DataFrame,
    probe_col: str = "v",
    m: int = 1 << 16,
    k: int = 5,
    portable: bool = False,
) -> DataFrame:
    """Distributed membership test: ``probe_col | might_contain BOOLEAN``.

    Builds the (global) bit set from ``df[col]`` and checks each probe's k
    positions against it with a broadcast semi-join — no bitmap ever leaves
    the cluster, so this composes with arbitrarily large indexed sides."""
    bits = bloom_bits(df, col, None, m, k, portable)
    probe_bits = probes.select(
        F.col(probe_col).alias("v"),
        F.explode(F.array(*_positions(probe_col, m, k, portable))).alias("_bit"),
    )
    hit = probe_bits.join(bits, "_bit", "left_semi")
    hits_per_probe = hit.groupBy("v").agg(F.count(F.lit(1)).alias("_hits"))
    return (
        probes.select(F.col(probe_col).alias("v"))
        .join(hits_per_probe, "v", "left")
        .select("v", (F.coalesce(F.col("_hits"), F.lit(0)) == k).alias("might_contain"))
    )


def bloom_agg(
    df: DataFrame,
    col: str,
    by: list[str] | None = None,
    m: int = 1 << 16,
    k: int = 5,
    portable: bool = False,
) -> DataFrame:
    """Bitmap per group: ``by... | bitmap BINARY | n_bits_set | m | k``."""
    by = list(by or [])
    bits = bloom_bits(df, col, by, m, k, portable)
    by_fields = [
        StructField(f.name, f.dataType, True)
        for f in bits.schema.fields
        if f.name in by
    ]
    schema = StructType(
        by_fields
        + [
            StructField("bitmap", BinaryType()),
            StructField("n_bits_set", LongType()),
            StructField("m", IntegerType()),
            StructField("k", IntegerType()),
        ]
    )

    def assemble(pdf: pd.DataFrame) -> pd.DataFrame:
        arr = np.zeros(m, dtype=bool)
        arr[pdf["_bit"].to_numpy(np.int64)] = True
        rec = {c: pdf[c].iloc[0] for c in by}
        rec.update(
            bitmap=bytes(np.packbits(arr)),
            n_bits_set=int(arr.sum()),
            m=m,
            k=k,
        )
        return pd.DataFrame([rec], columns=[f.name for f in schema.fields])

    if by:
        return bits.groupBy(*by).applyInPandas(assemble, schema)
    return (
        bits.withColumn("_g", F.lit(0))
        .groupBy("_g")
        .applyInPandas(lambda pdf: assemble(pdf.drop(columns=["_g"])), schema)
    )


def _probe_schema(values: list) -> str:
    """Probe values must hash with the same Spark type as the indexed
    column — xxhash64('42') != xxhash64(42L)."""
    if all(isinstance(v, bool) for v in values):
        return "v boolean"
    if all(isinstance(v, int) for v in values):
        return "v bigint"
    if all(isinstance(v, float) for v in values):
        return "v double"
    return "v string"


def _xxhash64_py(spark, values: list, seed: int) -> np.ndarray:
    """Match Spark's xxhash64 for driver-side membership tests by asking the
    JVM itself (tiny lists only)."""
    df = spark.createDataFrame([(v,) for v in values], _probe_schema(values))
    return np.array(
        [
            r[0]
            for r in df.select(F.xxhash64(F.col("v"), F.lit(seed)) if seed else F.xxhash64("v")).collect()
        ],
        dtype=np.int64,
    )


def contains(spark, bitmap: bytes, m: int, k: int, values: list) -> list[bool]:
    """Driver-side membership check (no false negatives)."""
    bits = np.unpackbits(np.frombuffer(bitmap, dtype=np.uint8))[:m]
    h1 = _xxhash64_py(spark, values, 0) % m
    h2 = _xxhash64_py(spark, values, 1) % (m - 1) + 1
    out = []
    for a, b in zip(h1, h2):
        out.append(all(bits[(a + i * b) % m] for i in range(k)))
    return out


def merge_bitmaps(a: bytes, b: bytes) -> bytes:
    if len(a) != len(b):
        raise ValueError("bitmap widths differ")
    return bytes(
        np.frombuffer(a, dtype=np.uint8) | np.frombuffer(b, dtype=np.uint8)
    )


def false_positive_rate(n_bits_set: int, m: int, k: int) -> float:
    """Observed-load FPR estimate: (bits_set/m)^k."""
    return float((n_bits_set / m) ** k)
