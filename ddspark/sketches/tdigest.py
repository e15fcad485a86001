"""Merging t-digest (Dunning's k1 scale) as a mergeable Spark aggregation.

Unlike DDSketch's relative-value error, the t-digest bounds *rank* error,
tighter at the tails — the two complement each other, so both live in this
library.  State is a bounded list of (mean, weight) centroids; merging is
concatenate + one merge pass, which is associative up to the usual t-digest
order caveats (accuracy, not correctness, is order-sensitive).

Spark layer is the kernel-engine pattern (the digest has no cells form):
``mapInPandas`` builds one digest per (group, partition), then
``groupBy().applyInPandas`` merges and extracts quantiles.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql.types import (
    ArrayType,
    DoubleType,
    LongType,
    StructField,
    StructType,
)

from ..agg import _by_fields, quantile_label

__all__ = ["TDigest", "tdigest_agg"]


def _k1(q: np.ndarray, delta: float) -> np.ndarray:
    return (delta / (2.0 * np.pi)) * np.arcsin(2.0 * np.clip(q, 0.0, 1.0) - 1.0)


class TDigest:
    """Immutable-by-convention t-digest value."""

    __slots__ = ("means", "weights", "min", "max", "delta")

    def __init__(self, means, weights, mn, mx, delta=100.0):
        self.means = np.asarray(means, dtype=np.float64)
        self.weights = np.asarray(weights, dtype=np.float64)
        self.min = float(mn)
        self.max = float(mx)
        self.delta = float(delta)

    @property
    def count(self) -> float:
        return float(self.weights.sum())

    @classmethod
    def from_values(cls, values: np.ndarray, delta: float = 100.0) -> "TDigest":
        v = np.sort(np.asarray(values, dtype=np.float64))
        if v.size == 0:
            return cls([], [], np.inf, -np.inf, delta)
        return cls._merge_pass(v, np.ones_like(v), float(v[0]), float(v[-1]), delta)

    @classmethod
    def _merge_pass(cls, means, weights, mn, mx, delta) -> "TDigest":
        total = weights.sum()
        out_m: list[float] = []
        out_w: list[float] = []
        cur_m = means[0]
        cur_w = weights[0]
        w_so_far = 0.0
        k_lo = _k1(np.array([0.0]), delta)[0]
        for m, w in zip(means[1:], weights[1:]):
            q_hi = (w_so_far + cur_w + w) / total
            if _k1(np.array([q_hi]), delta)[0] - k_lo <= 1.0:
                cur_m += (m - cur_m) * (w / (cur_w + w))
                cur_w += w
            else:
                out_m.append(cur_m)
                out_w.append(cur_w)
                w_so_far += cur_w
                k_lo = _k1(np.array([w_so_far / total]), delta)[0]
                cur_m, cur_w = m, w
        out_m.append(cur_m)
        out_w.append(cur_w)
        return cls(out_m, out_w, mn, mx, delta)

    def merge(self, other: "TDigest") -> "TDigest":
        if self.count == 0:
            return other
        if other.count == 0:
            return self
        means = np.concatenate([self.means, other.means])
        weights = np.concatenate([self.weights, other.weights])
        order = np.argsort(means, kind="stable")
        return TDigest._merge_pass(
            means[order],
            weights[order],
            min(self.min, other.min),
            max(self.max, other.max),
            self.delta,
        )

    @classmethod
    def merge_all(cls, digests: list["TDigest"]) -> "TDigest":
        live = [d for d in digests if d.count > 0]
        if not live:
            return cls([], [], np.inf, -np.inf)
        means = np.concatenate([d.means for d in live])
        weights = np.concatenate([d.weights for d in live])
        order = np.argsort(means, kind="stable")
        return cls._merge_pass(
            means[order],
            weights[order],
            min(d.min for d in live),
            max(d.max for d in live),
            live[0].delta,
        )

    def quantile(self, q: float) -> float | None:
        n = self.count
        if n == 0 or q < 0 or q > 1:
            return None
        if len(self.means) == 1:
            return float(self.means[0])
        target = q * n
        cum = np.cumsum(self.weights) - self.weights / 2.0
        if target <= cum[0]:
            lo_w = self.weights[0] / 2.0
            t = target / lo_w if lo_w else 0.0
            return float(self.min + (self.means[0] - self.min) * min(t, 1.0))
        if target >= cum[-1]:
            hi_w = self.weights[-1] / 2.0
            t = (n - target) / hi_w if hi_w else 0.0
            return float(self.max - (self.max - self.means[-1]) * min(t, 1.0))
        i = int(np.searchsorted(cum, target, side="right")) - 1
        frac = (target - cum[i]) / (cum[i + 1] - cum[i])
        return float(self.means[i] + frac * (self.means[i + 1] - self.means[i]))


_STATE_FIELDS = [
    StructField("means", ArrayType(DoubleType())),
    StructField("weights", ArrayType(DoubleType())),
    StructField("min", DoubleType()),
    StructField("max", DoubleType()),
]


def tdigest_agg(
    df: DataFrame,
    value_col: str,
    by: list[str] | None = None,
    qs: list[float] = (0.5, 0.95, 0.99),
    delta: float = 100.0,
) -> DataFrame:
    """Grouped t-digest quantiles: ``by... | count | td_p50 ...``."""
    by = list(by or [])
    partial_schema = StructType(_by_fields(df, by) + _STATE_FIELDS)

    def partials(batches):
        groups: dict[tuple, list[TDigest]] = {}
        for pdf in batches:
            pdf = pdf[pdf[value_col].notna()]
            grouped = pdf.groupby(by, sort=False, dropna=False) if by else [((), pdf)]
            for key, g in grouped:
                if not isinstance(key, tuple):
                    key = (key,)
                groups.setdefault(key, []).append(
                    TDigest.from_values(g[value_col].to_numpy(np.float64), delta)
                )
        out = []
        for key, ds in groups.items():
            d = TDigest.merge_all(ds)
            rec = dict(zip(by, key))
            rec.update(
                means=d.means.tolist(), weights=d.weights.tolist(), min=d.min, max=d.max
            )
            out.append(rec)
        if out:
            yield pd.DataFrame(out, columns=[f.name for f in partial_schema.fields])

    part = df.select(*by, value_col).mapInPandas(partials, partial_schema)
    q_cols = [f"td_{quantile_label(q)}" for q in qs]
    out_schema = StructType(
        _by_fields(df, by)
        + [StructField("count", DoubleType())]
        + [StructField(c, DoubleType()) for c in q_cols]
    )

    def fin(pdf: pd.DataFrame) -> pd.DataFrame:
        ds = [
            TDigest(r["means"], r["weights"], r["min"], r["max"], delta)
            for r in pdf.to_dict("records")
        ]
        d = TDigest.merge_all(ds)
        rec = {c: pdf[c].iloc[0] for c in by}
        rec["count"] = d.count
        for q, c in zip(qs, q_cols):
            rec[c] = d.quantile(q)
        return pd.DataFrame([rec], columns=[f.name for f in out_schema.fields])

    if by:
        return part.groupBy(*by).applyInPandas(fin, out_schema)
    return (
        part.withColumn("_g", F.lit(0))
        .groupBy("_g")
        .applyInPandas(lambda pdf: fin(pdf.drop(columns=["_g"])), out_schema)
    )
