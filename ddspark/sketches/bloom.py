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
    "bloom_words",
    "bloom_prefilter",
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


def bloom_words(
    keys: DataFrame, col: str, m: int = 1 << 22, k: int = 5
) -> DataFrame:
    """Dense 64-bit-word form of the global Bloom filter over ``keys[col]``:
    a ONE-row DataFrame ``(_bw ARRAY<BIGINT>[m/64], _bm INT, _bk INT)``.

    The sparse ``(word, bits)`` rows aggregate distributedly (``bit_or`` —
    map-side combined); only the bounded word list (``m/64`` longs, e.g.
    64 KB at m=2^22) ever reaches the driver.  ``m`` must be a multiple of
    64 and at most 2^27 (16 MB of words) — the point of the dense form is
    to be broadcastable."""
    if m % 64 or m > (1 << 27):
        raise ValueError(f"m must be a multiple of 64 and <= 2^27, got {m}")
    spark = keys.sparkSession
    sparse = (
        bloom_bits(keys, col, None, m, k)
        .select(
            (F.col("_bit") / 64).cast("int").alias("w"),
            # pyspark's shiftleft() only takes a Python-int amount; the SQL
            # form accepts a column expression
            F.expr("shiftleft(CAST(1 AS BIGINT), CAST(pmod(_bit, 64) AS INT))").alias("v"),
        )
        .groupBy("w")
        .agg(F.bit_or("v").alias("v"))
    )
    words = [0] * (m // 64)
    for r in sparse.collect():  # bounded: <= m/64 rows by construction
        words[r["w"]] = r["v"]
    return spark.createDataFrame([(words, m, k)], "_bw array<bigint>, _bm int, _bk int")


def bloom_prefilter(
    big: DataFrame,
    keys: DataFrame,
    key_col: str,
    big_col: str | None = None,
    m: int = 1 << 22,
    k: int = 5,
) -> DataFrame:
    """Semi-join reduction for shuffle-bound joins: drop ``big`` rows whose
    join key cannot appear in ``keys[key_col]`` BEFORE the join shuffles
    the big side.

    When the key side's distinct set is too large to broadcast exactly but
    its Bloom filter is not (10^8 keys -> ~5 MB of words at 10 bits/key),
    this is the classic distributed-join optimization: the dense word array
    (:func:`bloom_words`) rides a one-row broadcast nested-loop join and
    the k probes are pure shift/mask Catalyst expressions — the big side is
    filtered at scan speed with NO shuffle, no Python, and no false drops
    (Bloom filters have no false negatives); ~``(bits_set/m)^k`` of
    non-matching rows survive as false positives for the real join to
    discard.  Rows with a NULL key are dropped explicitly (they cannot
    match an inner join; without the explicit filter they would NOT be —
    ``xxhash64`` ignores NULL children and returns the seed, so NULL rows
    would probe k fixed positions and leak through whenever those bits
    happen to be set).  Returns ``big`` filtered, same schema.
    """
    big_col = big_col or key_col
    # xxhash64 hashes by Spark type: INT 42 and BIGINT 42 have different
    # hashes, so a silent type mismatch would drop EVERY matching row.
    bt = dict(big.dtypes)[big_col]
    kt = dict(keys.dtypes)[key_col]
    if bt != kt:
        raise ValueError(
            f"bloom_prefilter key types must match exactly (xxhash64 is "
            f"type-sensitive): big[{big_col}]={bt} vs keys[{key_col}]={kt}; "
            "cast one side first"
        )
    words = F.broadcast(bloom_words(keys, key_col, m, k))
    joined = big.where(F.col(big_col).isNotNull()).crossJoin(words)
    h1 = f"pmod(xxhash64(`{big_col}`), {m})"
    h2 = f"(pmod(xxhash64(`{big_col}`, 1), {m - 1}) + 1)"
    tests = []
    for i in range(k):
        pos = f"pmod({h1} + {i} * {h2}, {m})"
        word = f"element_at(_bw, CAST({pos} / 64 AS INT) + 1)"
        tests.append(
            f"(shiftright({word}, CAST(pmod({pos}, 64) AS INT)) & 1) = 1"
        )
    return joined.where(F.expr(" AND ".join(tests))).drop("_bw", "_bm", "_bk")
