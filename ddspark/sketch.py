"""DDSketch value semantics: build / merge / quantile on plain Python+NumPy.

This is the single-node core of the engine — a *pure* (non-mutating) sketch
algebra over the canonical ``(offset, bins)`` stores of :mod:`ddspark.store`.
Semantics match the reference (DataDog/sketches-py ``ddsketch/ddsketch.py``):

* ``from_values`` routes each value by sign against ``mapping.min_possible``
  (reference ``ddsketch.py:144-149``): positives keyed into the positive
  store, negatives keyed as ``key(-v)`` into the negative store, and values in
  ``(-min_possible, +min_possible)`` counted in ``zero_count``; exact
  ``count/sum/min/max`` are tracked alongside (``ddsketch.py:151-157``).
* ``merge`` enforces the gamma compatibility guard (``ddsketch.py:191-195,
  217-220``), handles empty operands (``ddsketch.py:197-202``) and never
  mutates its arguments — it returns a new sketch.
* ``quantile`` implements lower-rank semantics ``rank = q*(count-1)`` with the
  three-way negative/zero/positive branch, including the reversed-rank
  ``lower=False`` scan on the negative store (``ddsketch.py:159-184``).

The Spark layer (:mod:`ddspark.agg`) moves these sketches around as flat
columns; :meth:`Sketch.to_state` / :meth:`Sketch.from_state` define that
row representation.
"""

from __future__ import annotations

from dataclasses import dataclass, field, replace

import numpy as np

from .mapping import KeyMapping, mapping_from_name
from .store import (
    COLLAPSE_HIGHEST,
    COLLAPSE_LOWEST,
    DENSE,
    Bins,
    bins_from_keys,
    empty_bins,
    is_empty,
    key_at_rank,
    merge_many,
)

__all__ = ["SketchConfig", "Sketch", "DEFAULT_REL_ACC", "DEFAULT_BIN_LIMIT"]

DEFAULT_REL_ACC = 0.01  # alpha in the paper; reference ddsketch.py:52
DEFAULT_BIN_LIMIT = 2048  # reference ddsketch.py:53


@dataclass(frozen=True)
class SketchConfig:
    """Static sketch parameters; two sketches merge iff their gammas match."""

    relative_accuracy: float = DEFAULT_REL_ACC
    mapping: str = "logarithmic"
    mode: str = DENSE
    bin_limit: int | None = None  # only meaningful for collapsing modes
    offset: float = 0.0

    def __post_init__(self) -> None:
        if self.mode in (COLLAPSE_LOWEST, COLLAPSE_HIGHEST):
            if self.bin_limit is None or self.bin_limit < 0:
                object.__setattr__(self, "bin_limit", DEFAULT_BIN_LIMIT)

    @property
    def key_mapping(self) -> KeyMapping:
        m = _MAPPING_CACHE.get((self.mapping, self.relative_accuracy, self.offset))
        if m is None:
            m = mapping_from_name(self.mapping, self.relative_accuracy, self.offset)
            _MAPPING_CACHE[(self.mapping, self.relative_accuracy, self.offset)] = m
        return m

    @property
    def gamma(self) -> float:
        return self.key_mapping.gamma


_MAPPING_CACHE: dict[tuple, KeyMapping] = {}


@dataclass
class Sketch:
    """An immutable-by-convention DDSketch value."""

    cfg: SketchConfig
    zero_count: float = 0.0
    count: float = 0.0
    sum: float = 0.0
    min: float = float("+inf")
    max: float = float("-inf")
    pos: Bins = field(default_factory=empty_bins)
    neg: Bins = field(default_factory=empty_bins)

    # ------------------------------------------------------------------ build

    @classmethod
    def empty(cls, cfg: SketchConfig) -> "Sketch":
        return cls(cfg=cfg)

    @classmethod
    def from_values(
        cls,
        values: np.ndarray,
        cfg: SketchConfig | None = None,
        weights: np.ndarray | None = None,
    ) -> "Sketch":
        """Build a sketch from a whole batch of values in vectorized form."""
        cfg = cfg or SketchConfig()
        v = np.asarray(values, dtype=np.float64)
        if v.size == 0:
            return cls.empty(cfg)
        if weights is not None:
            w = np.asarray(weights, dtype=np.float64)
            if w.shape != v.shape:
                raise ValueError("weights must match values in shape")
            if np.any(w <= 0.0):
                raise ValueError("weight must be a positive float")
        else:
            w = None

        mapping = cfg.key_mapping
        pos_mask = v > mapping.min_possible
        neg_mask = v < -mapping.min_possible
        zero_mask = ~(pos_mask | neg_mask)

        pos = empty_bins()
        neg = empty_bins()
        if pos_mask.any():
            keys = mapping.key_vec(v[pos_mask])
            pos = bins_from_keys(
                keys, None if w is None else w[pos_mask], cfg.mode, cfg.bin_limit
            )
        if neg_mask.any():
            keys = mapping.key_vec(-v[neg_mask])
            neg = bins_from_keys(
                keys, None if w is None else w[neg_mask], cfg.mode, cfg.bin_limit
            )
        zero_count = (
            float(zero_mask.sum()) if w is None else float(w[zero_mask].sum())
        )
        count = float(v.size) if w is None else float(w.sum())
        total = float(v.sum()) if w is None else float((v * w).sum())
        # NaN routes to zero_count (like the reference's sign comparisons,
        # ddsketch.py:144-149) and leaves min/max untouched (ddsketch.py:154-157)
        finite_any = bool(np.isfinite(v).any()) or bool((~np.isnan(v)).any())
        with np.errstate(invalid="ignore"):
            mn = float(np.nanmin(v)) if finite_any else float("+inf")
            mx = float(np.nanmax(v)) if finite_any else float("-inf")
        return cls(
            cfg=cfg,
            zero_count=zero_count,
            count=count,
            sum=total,
            min=mn,
            max=mx,
            pos=pos,
            neg=neg,
        )

    # ------------------------------------------------------------------ merge

    @classmethod
    def merge_all(cls, sketches: list["Sketch"]) -> "Sketch":
        """Merge any number of sketches; commutative and associative."""
        if not sketches:
            raise ValueError("merge_all of no sketches")
        cfg = sketches[0].cfg
        gamma = cfg.gamma
        for s in sketches[1:]:
            if s.cfg.gamma != gamma:
                raise ValueError(
                    "Cannot merge DDSketches with different parameters: "
                    f"{gamma!r} vs {s.cfg.gamma!r}"
                )
        live = [s for s in sketches if s.count > 0]
        if not live:
            return cls.empty(cfg)
        return cls(
            cfg=cfg,
            zero_count=float(np.sum([s.zero_count for s in live])),
            count=float(np.sum([s.count for s in live])),
            sum=float(np.sum([s.sum for s in live])),
            min=min(s.min for s in live),
            max=max(s.max for s in live),
            pos=merge_many([s.pos for s in live], cfg.mode, cfg.bin_limit),
            neg=merge_many([s.neg for s in live], cfg.mode, cfg.bin_limit),
        )

    def merge(self, other: "Sketch") -> "Sketch":
        return Sketch.merge_all([self, other])

    # --------------------------------------------------------------- quantile

    @property
    def avg(self) -> float:
        return self.sum / self.count

    @property
    def num_values(self) -> float:
        return self.count

    def quantile(self, q: float) -> float | None:
        """Approximate value at quantile ``q``; None if empty or q out of range."""
        if q < 0 or q > 1 or self.count == 0:
            return None
        neg_count = float(self.neg[1].sum())
        rank = q * (self.count - 1)
        if rank < neg_count:
            reversed_rank = neg_count - rank - 1
            key = key_at_rank(self.neg, reversed_rank, lower=False)
            return -self.cfg.key_mapping.value(key)
        if rank < self.zero_count + neg_count:
            return 0.0
        key = key_at_rank(self.pos, rank - self.zero_count - neg_count)
        return self.cfg.key_mapping.value(key)

    def quantiles(self, qs: list[float]) -> list[float | None]:
        return [self.quantile(q) for q in qs]

    def __repr__(self) -> str:
        pos, neg = self.nonzero_bins()
        return (
            f"Sketch(alpha={self.cfg.relative_accuracy}, mode={self.cfg.mode}, "
            f"count={self.count}, zero_count={self.zero_count}, sum={self.sum}, "
            f"min={self.min}, max={self.max}, pos_bins={len(pos)}, "
            f"neg_bins={len(neg)})"
        )

    # ------------------------------------------------------------- state rows

    def to_state(self) -> dict:
        """Flat-column representation used for Spark transport."""
        return {
            "gamma": self.cfg.gamma,
            "zero_count": self.zero_count,
            "count": self.count,
            "sum": self.sum,
            "min": self.min,
            "max": self.max,
            "pos_offset": int(self.pos[0]),
            "pos_bins": np.asarray(self.pos[1], dtype=np.float64),
            "neg_offset": int(self.neg[0]),
            "neg_bins": np.asarray(self.neg[1], dtype=np.float64),
        }

    @classmethod
    def from_state(cls, cfg: SketchConfig, row: dict) -> "Sketch":
        return cls(
            cfg=cfg,
            zero_count=float(row["zero_count"]),
            count=float(row["count"]),
            sum=float(row["sum"]),
            min=float(row["min"]),
            max=float(row["max"]),
            pos=(int(row["pos_offset"]), np.asarray(row["pos_bins"], dtype=np.float64)),
            neg=(int(row["neg_offset"]), np.asarray(row["neg_bins"], dtype=np.float64)),
        )

    def with_cfg(self, cfg: SketchConfig) -> "Sketch":
        return replace(self, cfg=cfg)

    def nonzero_bins(self) -> tuple[dict[int, float], dict[int, float]]:
        """{key: count} views of both stores (for tests / debugging)."""

        def d(store: Bins) -> dict[int, float]:
            off, bins = store
            nz = np.nonzero(bins)[0]
            return {int(off + i): float(bins[i]) for i in nz}

        return d(self.pos), d(self.neg)
