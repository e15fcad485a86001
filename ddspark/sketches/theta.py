"""KMV/theta sketch: a mergeable distinct-count summary that supports set
algebra — union, intersection, difference — which HyperLogLog cannot.

The sketch keeps the ``k`` smallest of the items' hashes mapped into
``[0, 1)``.  With ``theta`` = the k-th smallest value, the estimate is
``(k-1) / theta`` (unbiased; relative sigma ~ ``1/sqrt(k-2)``), and because
the retained values are a uniform sample of the *distinct* item space below
``theta``, two sketches can be combined:

* union       — merge value sets, keep the k smallest (same invariant);
* intersection — clip both to ``theta = min(theta_a, theta_b)`` and count
  common values: ``est = |common| / theta``;
* difference  — ``|A\\B| = |A| - |A∩B|`` on the clipped samples.

When a group's distinct count never reaches ``k`` the sketch degenerates to
the exact distinct set (``theta = 1``) and every estimate above is exact —
mixed exact/estimated combinations compose through the same formulas.

Distribution shape (the point, vs ``groupBy(item).count_distinct``):
per-partition k-min runs map-side in an Arrow kernel, so each partition
ships at most ``k`` doubles per group no matter how many distinct items it
saw; the final merge unions ``partitions x k`` values per group.  Summaries
are ``k`` doubles — small enough to collect for pairwise set algebra, like
the ANN centroids.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql.types import (
    ArrayType,
    BooleanType,
    DoubleType,
    StructField,
    StructType,
)

__all__ = [
    "theta_summary",
    "theta_estimate",
    "theta_union",
    "theta_intersect",
    "theta_intersect_bound",
    "theta_difference",
]

_PORTABLE_SCALE = float(1 << 60)


def _u01(col, portable: bool):
    """Item hash mapped uniformly into [0, 1)."""
    if portable:
        from ..pipeline.hashing import portable_hash63

        return portable_hash63(col) / F.lit(_PORTABLE_SCALE)
    # xxhash64 is signed; shift into the unsigned range first
    return (F.xxhash64(col).cast("double") + F.lit(float(2**63))) / F.lit(
        float(2**64)
    )


def theta_summary(
    df: DataFrame,
    item_col: str,
    k: int = 1024,
    by: list[str] | None = None,
    portable: bool = False,
) -> DataFrame:
    """Per-group theta sketch: ``by... | ks ARRAY<DOUBLE> | theta | est |
    is_exact``.

    ``ks`` is the sorted retained sample (< k values means the group's
    distinct set fit entirely and the sketch is exact).
    """
    by = list(by or [])
    hashed = df.where(F.col(item_col).isNotNull()).select(
        *by, _u01(F.col(item_col), portable).alias("_u")
    )
    part_schema = StructType(
        [StructField(b, df.schema[b].dataType, True) for b in by]
        + [StructField("_u", DoubleType(), True)]
    )

    def kmin_partial(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        state: dict[tuple, np.ndarray] = {}
        for pdf in batches:
            gkeys = list(zip(*[pdf[b] for b in by])) if by else [()] * len(pdf)
            frame = pd.DataFrame({"_g": gkeys, "_u": pdf["_u"].to_numpy()})
            for g, sub in frame.groupby("_g", sort=False):
                u = np.unique(sub["_u"].to_numpy(np.float64))
                prev = state.get(g)
                merged = u if prev is None else np.unique(np.concatenate([prev, u]))
                state[g] = merged[:k] if len(merged) > k else merged
        rows = []
        for g, arr in state.items():
            for v in arr:
                rows.append(list(g) + [float(v)])
        yield pd.DataFrame(rows, columns=[f.name for f in part_schema.fields])

    partials = hashed.mapInPandas(kmin_partial, part_schema)

    out_schema = StructType(
        [StructField(b, df.schema[b].dataType, True) for b in by]
        + [
            StructField("ks", ArrayType(DoubleType()), True),
            StructField("theta", DoubleType(), True),
            StructField("est", DoubleType(), True),
            StructField("is_exact", BooleanType(), True),
        ]
    )
    names = [f.name for f in out_schema.fields]

    def fin(pdf: pd.DataFrame) -> pd.DataFrame:
        u = np.unique(pdf["_u"].to_numpy(np.float64))
        keys = {b: pdf[b].iloc[0] for b in by}
        if len(u) < k:
            rec = {**keys, "ks": u.tolist(), "theta": 1.0,
                   "est": float(len(u)), "is_exact": True}
        else:
            ks = u[:k]
            theta = float(ks[-1])
            rec = {**keys, "ks": ks.tolist(), "theta": theta,
                   "est": (k - 1) / theta, "is_exact": False}
        return pd.DataFrame([rec], columns=names)

    if by:
        return partials.groupBy(*by).applyInPandas(fin, out_schema)
    return (
        partials.withColumn("_g", F.lit(0))
        .groupBy("_g")
        .applyInPandas(lambda pdf: fin(pdf.drop(columns=["_g"])), out_schema)
    )


# ------------------------------------------------------------- set algebra
# (pure functions over collected summary rows — KB-sized, like centroids)


def _clip(ks, theta: float) -> np.ndarray:
    a = np.asarray(ks, dtype=np.float64)
    return a[a < theta] if theta < 1.0 else a


def theta_estimate(ks, theta: float) -> float:
    """Distinct estimate of a sample set under ``theta``.

    Counts only values strictly below ``theta``: a truncated sketch's
    retained set includes the k-th minimum (theta itself), which is the
    order statistic that *defines* the sampling rate, not a sample drawn
    below it — counting it would bias the estimate high by 1/theta.  For
    ``ks`` of a truncated ``theta_summary``/``theta_union`` this yields
    exactly the unbiased ``(k-1)/theta``; exact-mode sets (theta=1) count
    fully.
    """
    a = np.asarray(ks, dtype=np.float64)
    if theta >= 1.0:
        return float(len(a))
    return int((a < theta).sum()) / theta


def theta_union(ks_a, theta_a: float, ks_b, theta_b: float, k: int):
    """Union sketch of two summaries: ``(ks, theta)`` with the same
    invariant, usable in further algebra."""
    theta = min(theta_a, theta_b)
    u = np.unique(np.concatenate([_clip(ks_a, theta), _clip(ks_b, theta)]))
    if theta >= 1.0 and len(u) < k:
        return u.tolist(), 1.0
    if len(u) > k:
        u = u[:k]
        theta = float(u[-1])
    return u.tolist(), theta


def theta_intersect(ks_a, theta_a: float, ks_b, theta_b: float) -> tuple[float, int, float]:
    """Intersection estimate: ``(est, n_common_samples, theta)``.

    Both samples are clipped to the smaller theta; the common values are a
    uniform sample of the true intersection at rate theta, so
    ``est = n_common / theta`` (exact when both sketches are exact).
    """
    theta = min(theta_a, theta_b)
    common = np.intersect1d(_clip(ks_a, theta), _clip(ks_b, theta))
    n = int(len(common))
    return (n / theta if theta < 1.0 else float(n)), n, theta


def theta_difference(
    ks_a, theta_a: float, ks_b, theta_b: float
) -> tuple[float, int, float]:
    """Set-difference estimate ``|A \\ B|``: ``(est, n_diff_samples,
    theta)`` — the A-not-B operation that completes the theta algebra
    (HLL supports union only; intersection/difference need the KMV
    sample).

    Both samples are clipped to the smaller theta; A's retained values
    absent from B's are a uniform sample of the true difference at rate
    theta, so ``est = n_diff / theta`` (exact when both sketches are
    exact).  The sampled count is ~Poisson(true * theta), so
    :func:`theta_intersect_bound` certifies this estimate too.
    """
    theta = min(theta_a, theta_b)
    diff = np.setdiff1d(_clip(ks_a, theta), _clip(ks_b, theta))
    n = int(len(diff))
    return (n / theta if theta < 1.0 else float(n)), n, theta


def theta_intersect_bound(n_common: int, theta: float, sigmas: float = 5.0) -> float:
    """Certified half-width for the intersection estimate: the sampled
    common count is ~Poisson(true * theta), so ``sigmas * sqrt(max(n,1)) /
    theta`` bounds the error at the given sigma level (0 when exact)."""
    if theta >= 1.0:
        return 0.0
    return sigmas * float(np.sqrt(max(n_common, 1))) / theta
