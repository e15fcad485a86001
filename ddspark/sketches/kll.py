"""KLL rank sketch (Karnin–Lang–Liberty 2016) as a mergeable Spark
aggregation.

State is a stack of compactors: level ``h`` holds values each representing
``2^h`` originals.  When capacity is exceeded, the lowest over-full level
sorts itself and promotes every other element (seeded coin) to the level
above.  Rank error is O(1/k) with the default k=200 giving ~1% one-sided
rank error — like the t-digest this bounds *rank*, complementing DDSketch's
relative-value bound.

Spark wiring is the kernel-engine pattern: per-partition sketches via
``mapInPandas``, associative ``merge`` in ``groupBy().applyInPandas``.
Compaction coins are seeded from a stable per-sketch counter so a given
build is reproducible, though (as in every KLL implementation) different
partition splits give statistically-equivalent, not bit-identical, states.
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

from ..agg import _by_fields, quantile_label

__all__ = ["KLL", "kll_agg"]

_DECAY = 2.0 / 3.0


class KLL:
    __slots__ = ("k", "compactors", "n", "min", "max", "_coin")

    def __init__(self, k: int = 200):
        self.k = k
        self.compactors: list[list[float]] = [[]]
        self.n = 0
        self.min = float("+inf")
        self.max = float("-inf")
        self._coin = 0

    # ------------------------------------------------------------- internals

    def _capacity(self, level: int) -> int:
        height = len(self.compactors)
        return max(2, int(np.ceil(self.k * _DECAY ** (height - level - 1))))

    def _total_capacity(self) -> int:
        return sum(self._capacity(h) for h in range(len(self.compactors)))

    def _size(self) -> int:
        return sum(len(c) for c in self.compactors)

    def _compress(self) -> None:
        while self._size() >= self._total_capacity():
            for h, c in enumerate(self.compactors):
                if len(c) >= self._capacity(h):
                    if h + 1 == len(self.compactors):
                        self.compactors.append([])
                    c.sort()
                    self._coin += 1
                    start = int(
                        np.random.default_rng(self._coin * 2654435761 % (2**32)).integers(2)
                    )
                    promoted = c[start::2]
                    self.compactors[h + 1].extend(promoted)
                    self.compactors[h] = []
                    break
            else:
                break

    # ------------------------------------------------------------------ api

    def update(self, values: np.ndarray) -> "KLL":
        v = np.asarray(values, dtype=np.float64)
        if v.size == 0:
            return self
        self.n += len(v)
        self.min = min(self.min, float(v.min()))
        self.max = max(self.max, float(v.max()))
        self.compactors[0].extend(v.tolist())
        self._compress()
        return self

    @classmethod
    def from_values(cls, values: np.ndarray, k: int = 200) -> "KLL":
        sk = cls(k)
        v = np.asarray(values, dtype=np.float64)
        # feed in chunks so level-0 never explodes on huge arrays
        for i in range(0, len(v), 10 * k):
            sk.update(v[i : i + 10 * k])
        return sk

    def merge(self, other: "KLL") -> "KLL":
        if other.n == 0:
            return self
        if self.n == 0:
            return other
        out = KLL(min(self.k, other.k))
        height = max(len(self.compactors), len(other.compactors))
        out.compactors = [[] for _ in range(height)]
        for h in range(height):
            if h < len(self.compactors):
                out.compactors[h].extend(self.compactors[h])
            if h < len(other.compactors):
                out.compactors[h].extend(other.compactors[h])
        out.n = self.n + other.n
        out.min = min(self.min, other.min)
        out.max = max(self.max, other.max)
        out._coin = self._coin + other._coin
        out._compress()
        return out

    @classmethod
    def merge_all(cls, sketches: list["KLL"]) -> "KLL":
        out = cls() if not sketches else sketches[0]
        for s in sketches[1:]:
            out = out.merge(s)
        return out

    def _weighted_items(self) -> tuple[np.ndarray, np.ndarray]:
        vals = []
        wts = []
        for h, c in enumerate(self.compactors):
            vals.extend(c)
            wts.extend([2**h] * len(c))
        v = np.asarray(vals, dtype=np.float64)
        w = np.asarray(wts, dtype=np.float64)
        order = np.argsort(v, kind="stable")
        return v[order], w[order]

    def quantile(self, q: float) -> float | None:
        if self.n == 0 or q < 0 or q > 1:
            return None
        if q == 0:
            return self.min
        if q == 1:
            return self.max
        v, w = self._weighted_items()
        cum = np.cumsum(w)
        target = q * cum[-1]
        i = int(np.searchsorted(cum, target, side="left"))
        return float(v[min(i, len(v) - 1)])

    def rank(self, value: float) -> float:
        """Estimated fraction of items <= value."""
        if self.n == 0:
            return 0.0
        v, w = self._weighted_items()
        return float(w[v <= value].sum() / w.sum())

    # ------------------------------------------------------------ state rows

    def to_state(self) -> dict:
        flat = []
        levels = []
        for h, c in enumerate(self.compactors):
            flat.extend(c)
            levels.extend([h] * len(c))
        return {
            "k": self.k,
            "n": self.n,
            "min": self.min,
            "max": self.max,
            "items": flat,
            "levels": levels,
            "coin": self._coin,
        }

    @classmethod
    def from_state(cls, row: dict) -> "KLL":
        sk = cls(int(row["k"]))
        sk.n = int(row["n"])
        sk.min = float(row["min"])
        sk.max = float(row["max"])
        sk._coin = int(row["coin"])
        items = list(row["items"])
        levels = list(row["levels"])
        height = (max(levels) + 1) if levels else 1
        sk.compactors = [[] for _ in range(height)]
        for x, h in zip(items, levels):
            sk.compactors[int(h)].append(float(x))
        return sk


_STATE_FIELDS = [
    StructField("k", IntegerType()),
    StructField("n", LongType()),
    StructField("min", DoubleType()),
    StructField("max", DoubleType()),
    StructField("items", ArrayType(DoubleType())),
    StructField("levels", ArrayType(IntegerType())),
    StructField("coin", LongType()),
]


def kll_agg(
    df: DataFrame,
    value_col: str,
    by: list[str] | None = None,
    qs: list[float] = (0.5, 0.95, 0.99),
    k: int = 200,
) -> DataFrame:
    """Grouped KLL quantiles: ``by... | count | kll_p50 ...``."""
    by = list(by or [])
    partial_schema = StructType(_by_fields(df, by) + _STATE_FIELDS)

    def partials(batches):
        groups: dict[tuple, KLL] = {}
        for pdf in batches:
            pdf = pdf[pdf[value_col].notna()]
            grouped = pdf.groupby(by, sort=False, dropna=False) if by else [((), pdf)]
            for key, g in grouped:
                if not isinstance(key, tuple):
                    key = (key,)
                sk = groups.setdefault(key, KLL(k))
                sk.update(g[value_col].to_numpy(np.float64))
        out = []
        for key, sk in groups.items():
            rec = dict(zip(by, key))
            rec.update(sk.to_state())
            out.append(rec)
        if out:
            yield pd.DataFrame(out, columns=[f.name for f in partial_schema.fields])

    part = df.select(*by, value_col).mapInPandas(partials, partial_schema)
    q_cols = [f"kll_{quantile_label(q)}" for q in qs]
    out_schema = StructType(
        _by_fields(df, by)
        + [StructField("count", LongType())]
        + [StructField(c, DoubleType()) for c in q_cols]
    )

    def fin(pdf: pd.DataFrame) -> pd.DataFrame:
        sk = KLL.merge_all([KLL.from_state(r) for r in pdf.to_dict("records")])
        rec = {c: pdf[c].iloc[0] for c in by}
        rec["count"] = sk.n
        for q, c in zip(qs, q_cols):
            rec[c] = sk.quantile(q)
        return pd.DataFrame([rec], columns=[f.name for f in out_schema.fields])

    if by:
        return part.groupBy(*by).applyInPandas(fin, out_schema)
    return (
        part.withColumn("_g", F.lit(0))
        .groupBy("_g")
        .applyInPandas(lambda pdf: fin(pdf.drop(columns=["_g"])), out_schema)
    )
