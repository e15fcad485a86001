"""Deterministic source-code corpus generator (the ``input_hint`` table).

Produces the ``(repo, path, commit, lang, content, content_sha256)`` table of
FIXTURES.md §1 — the sandbox stand-in for the 10^12-file Iceberg corpus the
north star targets.  Generation is a pure function of the row index, so any
partitioning of ``spark.range(n)`` yields identical bytes (required for
merge-invariance and scaling runs), and ``content_sha256`` gives every row a
self-verifying invariant that any pipeline stage must preserve.

Zipf-skewed ``lang`` (top language ≈ 45% of rows) deliberately exercises
group skew; ~0.5% of rows have empty content (length 0 → ``zero_count``).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import LongType, StringType, StructField, StructType

__all__ = ["LANGS", "generate_corpus", "corpus_schema"]

LANGS = [
    "python", "javascript", "java", "c", "cpp", "go", "rust", "ruby", "php",
    "ts", "cs", "scala", "kotlin", "swift", "sh", "html", "css", "sql",
    "yaml", "md",
]
_EXT = {
    "python": "py", "javascript": "js", "java": "java", "c": "c", "cpp": "cc",
    "go": "go", "rust": "rs", "ruby": "rb", "php": "php", "ts": "ts",
    "cs": "cs", "scala": "scala", "kotlin": "kt", "swift": "swift", "sh": "sh",
    "html": "html", "css": "css", "sql": "sql", "yaml": "yaml", "md": "md",
}

# Zipf(s≈1.5) over 20 languages, normalized cumulative thresholds
_ZIPF_W = 1.0 / np.arange(1, len(LANGS) + 1) ** 1.5
_ZIPF_CDF = np.cumsum(_ZIPF_W / _ZIPF_W.sum())

# deterministic text pool the content lines are sliced from
_POOL = (
    "def compute(value, weight):\n    return value * weight\n"
    "for i in range(n): total += data[i] << 2 ^ mask\n"
    "if err != nil { return fmt.Errorf(\"sketch: %w\", err) }\n"
    "SELECT lang, count(*) FROM corpus GROUP BY lang ORDER BY 2 DESC;\n"
    "let buckets: Vec<f64> = keys.iter().map(|k| gamma.powi(*k)).collect();\n"
    "const merge = (a, b) => ({...a, bins: zip(a.bins, b.bins)});\n"
) * 64


def corpus_schema() -> StructType:
    return StructType(
        [
            StructField("id", LongType(), False),
            StructField("repo", StringType(), False),
            StructField("path", StringType(), False),
            StructField("commit", StringType(), False),
            StructField("lang", StringType(), False),
            StructField("content", StringType(), False),
            StructField("content_sha256", StringType(), False),
        ]
    )


def _rows_for_indices(idx: np.ndarray, seed: int) -> pd.DataFrame:
    n = len(idx)
    # per-row uniforms via splitmix-style hashing: a pure function of
    # (seed, salt, index), vectorized and partition-independent
    x = idx.astype(np.uint64)

    def h(salt: int) -> np.ndarray:
        z = x + np.uint64(0x9E3779B97F4A7C15) * np.uint64(salt + 1) + np.uint64(seed)
        z = (z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
        z = (z ^ (z >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
        z = z ^ (z >> np.uint64(31))
        return (z >> np.uint64(11)).astype(np.float64) / float(1 << 53)

    lang_ix = np.searchsorted(_ZIPF_CDF, h(1), side="left").clip(0, len(LANGS) - 1)
    langs = np.array(LANGS, dtype=object)[lang_ix]

    # line count ~ lognormal(3.0, 1.2) clipped [1, 20000]; chars/line ~ N(35,12)
    z1 = np.sqrt(-2.0 * np.log(h(2).clip(1e-12))) * np.cos(2 * np.pi * h(3))
    n_lines = np.exp(3.0 + 1.2 * z1).astype(np.int64).clip(1, 20_000)
    z2 = np.sqrt(-2.0 * np.log(h(4).clip(1e-12))) * np.cos(2 * np.pi * h(5))
    chars_per_line = (35.0 + 12.0 * z2).astype(np.int64).clip(1, 200)
    empty = h(6) < 0.005

    pool_len = len(_POOL)
    start = (h(7) * (pool_len - 4096)).astype(np.int64)

    contents = []
    shas = []
    for j in range(n):
        if empty[j]:
            c = ""
        else:
            total = int(n_lines[j]) * (int(chars_per_line[j]) + 1)
            s = int(start[j])
            body = _POOL * (total // pool_len + 2)
            c = body[s : s + total]
        contents.append(c)
        shas.append(hashlib.sha256(c.encode()).hexdigest())

    repos = np.char.add(
        np.char.add("org", (idx % 97).astype(str)),
        np.char.add("/repo", (idx % 1009).astype(str)),
    )
    exts = np.array([_EXT[l] for l in langs], dtype=object)
    paths = [
        f"src/m{int(i % 31)}/f{int(i)}.{e}" for i, e in zip(idx, exts)
    ]
    commits = [
        hashlib.sha256(f"commit{int(i) // 1000}".encode()).hexdigest()[:40]
        for i in idx
    ]
    return pd.DataFrame(
        {
            "id": idx,
            "repo": repos.astype(object),
            "path": paths,
            "commit": commits,
            "lang": langs,
            "content": contents,
            "content_sha256": shas,
        }
    )


def generate_corpus(
    spark: SparkSession, n_rows: int, seed: int = 42, parts: int | None = None
) -> DataFrame:
    """Distributed deterministic corpus: same bytes at any parallelism."""
    parts = parts or max(8, spark.sparkContext.defaultParallelism)

    def gen(batches):
        for pdf in batches:
            yield _rows_for_indices(pdf["id"].to_numpy(np.int64), seed)

    return spark.range(0, n_rows, 1, parts).mapInPandas(gen, corpus_schema())
