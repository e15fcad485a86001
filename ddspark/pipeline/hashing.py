"""Hash primitives shared by the dedup / ANN / membership operators.

Two families:

* ``xxhash64`` (JVM built-in) — the fast scale path; full 64-bit signed
  range, one codegen'd expression per value.
* ``portable_hash63`` — an md5-derived 60-bit non-negative integer with an
  exact ANSI-SQL twin, so every hash-dependent pipeline (MinHash bands,
  SimHash fingerprints, Bloom bit positions) can be replayed bit-for-bit by
  an independent engine (DuckDB) for the correctness gate.  md5 is ~3-4x
  slower than xxhash64 per value but still a single JVM codegen expression —
  use it when cross-engine reproducibility matters more than peak hash
  throughput.

Spark:  ``conv(substr(md5(s), 1, 15), 16, 10)`` cast to BIGINT
DuckDB: ``CAST(('0x' || substr(md5(s), 1, 15)) AS BIGINT)``

Both take the first 15 hex digits (60 bits) of the md5 of the UTF-8 bytes,
so the value always fits a signed 64-bit integer and is non-negative —
``%`` / ``pmod`` then agree across engines.
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F

__all__ = ["portable_hash63", "portable_hash63_sql"]


def portable_hash63(col: Column | str) -> Column:
    """md5-derived non-negative 60-bit hash of a string column (JVM-side)."""
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("long")


def portable_hash63_sql(expr: str) -> str:
    """The ANSI-SQL twin of :func:`portable_hash63` (DuckDB-ready)."""
    return f"CAST(('0x' || substr(md5({expr}), 1, 15)) AS BIGINT)"
