"""Multimodal column plumbing: images/audio/video as opaque ``binary``
columns with typed metadata.

The container has no image/audio codecs, so the *decode* step is stubbed
(clearly marked), but everything Spark-side is real and tested: the schema,
the Arrow batch shape through ``mapInPandas``, the partition sizing, and a
deterministic byte-level feature extractor (length, entropy, byte-histogram
moments) that exercises the same plumbing a real decoder would.

At 100 TB the pattern is: blobs stay in their own column (parquet stores
them page-compressed), metadata is pruned-scannable without touching blob
pages, and decode/featurize runs as an Arrow-batched Python stage sized by
``bytes_per_batch``, not rows.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql.types import (
    ArrayType,
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

__all__ = [
    "with_blob",
    "decode_image",
    "resize_image",
    "byte_features",
    "extract_features",
    "sample_frames",
]


def with_blob(df: DataFrame, text_col: str = "text", media_type: str = "image/fake") -> DataFrame:
    """Stand-in media table: encode text as the blob payload + typed metadata."""
    blob = F.to_binary(F.col(text_col), F.lit("utf-8"))
    return df.withColumn("blob", blob).withColumn(
        "media",
        F.struct(
            F.lit(media_type).alias("mime"),
            F.octet_length(F.col(text_col)).alias("n_bytes"),
            F.sha2(F.col(text_col), 256).alias("sha256"),
        ),
    )


def decode_image(blob: bytes) -> "np.ndarray":
    """STUB: real image decode requires a codec library not present in this
    container.  The Spark-side plumbing (schema, batching, partitioning) is
    exercised through :func:`byte_features` instead."""
    raise NotImplementedError(
        "image decode requires PIL/opencv; not available in this environment"
    )


def resize_image(blob: bytes, width: int, height: int) -> bytes:
    """STUB: real resize requires an image codec not present in this
    container.  The distributed shape it would run in is exactly
    :func:`extract_features` / :func:`sample_frames`: Arrow-batched
    ``mapInPandas`` over ``(id, blob)`` with a typed output schema."""
    raise NotImplementedError(
        "image resize requires PIL/opencv; not available in this environment"
    )


def sample_frames(
    df: DataFrame,
    id_col: str = "doc_id",
    blob_col: str = "blob",
    n_frames: int = 4,
    frame_bytes: int = 16,
) -> DataFrame:
    """Uniform frame sampling over a chunked binary payload — the
    frame-sample plumbing for video blobs.  With no video codec in the
    container a "frame" is a fixed-size byte chunk (deterministic fake),
    but the distributed mechanics are the real thing: column-pruned
    ``(id, blob)`` through Arrow batches, uniform index selection
    ``floor(i * n_chunks / n_frames)``, typed ``(id, frame_idx, frame)``
    output.  Deterministic, so the driver gate replays it byte-for-byte in
    SQL over the blob's hex form.
    """
    from pyspark.sql.types import BinaryType, IntegerType

    schema = StructType(
        [
            StructField(id_col, LongType()),
            StructField("frame_idx", IntegerType()),
            StructField("frame", BinaryType()),
        ]
    )

    def gen(batches):
        for pdf in batches:
            ids, idxs, frames = [], [], []
            for rid, b in zip(pdf[id_col], pdf[blob_col]):
                b = bytes(b) if b is not None else b""
                nc = (len(b) + frame_bytes - 1) // frame_bytes
                if nc == 0:
                    continue
                if nc <= n_frames:
                    chunks = list(range(nc))
                else:
                    chunks = [(i * nc) // n_frames for i in range(n_frames)]
                for fi, c in enumerate(chunks):
                    ids.append(rid)
                    idxs.append(fi)
                    frames.append(b[c * frame_bytes:(c + 1) * frame_bytes])
            yield pd.DataFrame({id_col: ids, "frame_idx": idxs, "frame": frames})

    return df.select(id_col, blob_col).mapInPandas(gen, schema)


def byte_features(blobs: pd.Series) -> pd.DataFrame:
    """Deterministic per-blob features from raw bytes (the decode stand-in):
    length, Shannon entropy, mean/std byte value, 16-bin histogram."""
    out = {"n_bytes": [], "entropy": [], "byte_mean": [], "byte_std": [], "hist16": []}
    for b in blobs:
        a = np.frombuffer(b if b is not None else b"", dtype=np.uint8)
        n = len(a)
        out["n_bytes"].append(n)
        if n == 0:
            out["entropy"].append(0.0)
            out["byte_mean"].append(0.0)
            out["byte_std"].append(0.0)
            out["hist16"].append([0.0] * 16)
            continue
        counts = np.bincount(a, minlength=256).astype(np.float64)
        p = counts[counts > 0] / n
        out["entropy"].append(float(-(p * np.log2(p)).sum()))
        out["byte_mean"].append(float(a.mean()))
        out["byte_std"].append(float(a.std()))
        h = counts.reshape(16, 16).sum(axis=1) / n
        out["hist16"].append([float(x) for x in h])
    return pd.DataFrame(out)


FEATURE_FIELDS = [
    StructField("n_bytes", LongType()),
    StructField("entropy", DoubleType()),
    StructField("byte_mean", DoubleType()),
    StructField("byte_std", DoubleType()),
    StructField("hist16", ArrayType(DoubleType())),
]


def extract_features(
    df: DataFrame, id_col: str = "doc_id", blob_col: str = "blob"
) -> DataFrame:
    """Arrow-batched feature extraction over the blob column.

    Real plumbing for the stubbed decoder: only ``(id, blob)`` crosses the
    Python boundary (column pruning), batches arrive as Arrow buffers, and
    the output schema is fixed and typed.
    """
    schema = StructType(
        [StructField(id_col, LongType()), *FEATURE_FIELDS]
    )

    def gen(batches):
        for pdf in batches:
            feats = byte_features(pdf[blob_col])
            feats.insert(0, id_col, pdf[id_col].to_numpy())
            yield feats

    return df.select(id_col, blob_col).mapInPandas(gen, schema)
