"""Drop-in API compatibility with DataDog/sketches-py.

The reference exposes eight names (``ddsketch/__init__.py:15-24``); this
module provides the same classes with the same method signatures and
semantics — ``add(val, weight)``, ``merge(sketch)`` (mutating, like the
reference), ``get_quantile_value(q)``, ``count/num_values/sum/avg`` — backed
by this engine's vectorized core, so code written against ``ddsketch``
runs unchanged against ``ddspark.compat``:

    from ddspark.compat import DDSketch
    s = DDSketch(0.01)
    for v in values: s.add(v)
    s.get_quantile_value(0.95)

Single-value ``add`` buffers inputs and flushes through the batch kernel,
so even the scalar API is amortized-vectorized.
"""

from __future__ import annotations

import numpy as np

from .mapping import LogarithmicMapping
from .sketch import DEFAULT_BIN_LIMIT, DEFAULT_REL_ACC, Sketch, SketchConfig
from .store import COLLAPSE_HIGHEST, COLLAPSE_LOWEST, DENSE

__all__ = [
    "BaseDDSketch",
    "DDSketch",
    "LogCollapsingLowestDenseDDSketch",
    "LogCollapsingHighestDenseDDSketch",
]

_FLUSH_AT = 4096


class BaseDDSketch:
    def __init__(self, cfg: SketchConfig) -> None:
        self._cfg = cfg
        self._sketch = Sketch.empty(cfg)
        self._buf_v: list[float] = []
        self._buf_w: list[float] = []

    # ------------------------------------------------------------- plumbing

    def _flush(self) -> None:
        if self._buf_v:
            batch = Sketch.from_values(
                np.array(self._buf_v), self._cfg, np.array(self._buf_w)
            )
            self._sketch = self._sketch.merge(batch)
            self._buf_v = []
            self._buf_w = []

    @property
    def _mapping(self) -> LogarithmicMapping:
        return self._cfg.key_mapping  # type: ignore[return-value]

    # ------------------------------------------------------ reference surface

    @property
    def name(self) -> str:
        return "DDSketch"

    @property
    def count(self) -> float:
        self._flush()
        return self._sketch.count

    @property
    def num_values(self) -> float:
        return self.count

    @property
    def sum(self) -> float:  # noqa: A003
        self._flush()
        return self._sketch.sum

    @property
    def avg(self) -> float:
        self._flush()
        return self._sketch.avg

    def add(self, val: float, weight: float = 1.0) -> None:
        if weight <= 0.0:
            raise ValueError(f"weight must be a positive float, got {weight!r}")
        self._buf_v.append(float(val))
        self._buf_w.append(float(weight))
        if len(self._buf_v) >= _FLUSH_AT:
            self._flush()

    def add_all(self, values, weights=None) -> None:
        """Vectorized extension (not in the reference): bulk add."""
        self._flush()
        v = np.asarray(values, dtype=np.float64)
        w = None if weights is None else np.asarray(weights, dtype=np.float64)
        if v.size:
            self._sketch = self._sketch.merge(Sketch.from_values(v, self._cfg, w))

    def get_quantile_value(self, quantile: float):
        self._flush()
        return self._sketch.quantile(quantile)

    def merge(self, sketch: "BaseDDSketch") -> None:
        """Mutating merge, like the reference (``ddsketch.py:186-215``);
        does not modify the argument."""
        if self._cfg.gamma != sketch._cfg.gamma:
            raise ValueError(
                "Cannot merge two DDSketches with different parameters, got "
                f"{self._cfg.gamma!r} and {sketch._cfg.gamma!r}"
            )
        self._flush()
        sketch._flush()
        self._sketch = self._sketch.merge(sketch._sketch)

    def to_sketch(self) -> Sketch:
        """Bridge to the engine's value type (extension)."""
        self._flush()
        return self._sketch

    def __repr__(self) -> str:
        self._flush()
        return repr(self._sketch)


class DDSketch(BaseDDSketch):
    """Unbounded dense sketch (reference ``ddsketch.py:234-256``)."""

    def __init__(self, relative_accuracy: float | None = None) -> None:
        if relative_accuracy is None:
            relative_accuracy = DEFAULT_REL_ACC
        super().__init__(SketchConfig(relative_accuracy, mode=DENSE))


class LogCollapsingLowestDenseDDSketch(BaseDDSketch):
    """Bounded sketch collapsing lowest bins (reference ``ddsketch.py:259-286``)."""

    def __init__(
        self, relative_accuracy: float | None = None, bin_limit: int | None = None
    ) -> None:
        if relative_accuracy is None:
            relative_accuracy = DEFAULT_REL_ACC
        if bin_limit is None or bin_limit < 0:
            bin_limit = DEFAULT_BIN_LIMIT
        super().__init__(
            SketchConfig(relative_accuracy, mode=COLLAPSE_LOWEST, bin_limit=bin_limit)
        )


class LogCollapsingHighestDenseDDSketch(BaseDDSketch):
    """Bounded sketch collapsing highest bins (reference ``ddsketch.py:289-316``)."""

    def __init__(
        self, relative_accuracy: float | None = None, bin_limit: int | None = None
    ) -> None:
        if relative_accuracy is None:
            relative_accuracy = DEFAULT_REL_ACC
        if bin_limit is None or bin_limit < 0:
            bin_limit = DEFAULT_BIN_LIMIT
        super().__init__(
            SketchConfig(relative_accuracy, mode=COLLAPSE_HIGHEST, bin_limit=bin_limit)
        )


# --------------------------------------------------------------- store shims
#
# The remaining reference exports (``ddsketch/__init__.py:15-24``): the three
# mapping classes (ours are drop-ins already) and the two collapsing store
# classes.  The store shims wrap the batch-functional core (``bins_from_keys``
# / ``merge_bins`` / ``key_at_rank``) in the reference's mutable per-key API
# (``store.py:161-165,244-259,299-381,423-504``) with the same
# amortized-buffer trick the sketch shims use.

from .mapping import (  # noqa: E402  (re-exports for drop-in parity)
    CubicallyInterpolatedMapping,
    LinearlyInterpolatedMapping,
)
from .store import (  # noqa: E402
    bins_from_keys,
    empty_bins,
    is_empty,
    key_at_rank as _key_at_rank,
    merge_bins,
)

__all__ += [
    "LogarithmicMapping",
    "LinearlyInterpolatedMapping",
    "CubicallyInterpolatedMapping",
    "DenseStore",
    "CollapsingLowestDenseStore",
    "CollapsingHighestDenseStore",
]


class DenseStore:
    """Reference-API store over the canonical ``(offset, bins)`` core."""

    _mode = DENSE

    def __init__(self, bin_limit: int | None = None) -> None:
        self._limit = bin_limit
        self._bins = empty_bins()
        self._buf_k: list[int] = []
        self._buf_w: list[float] = []

    def _flush(self) -> None:
        if self._buf_k:
            batch = bins_from_keys(
                np.asarray(self._buf_k, dtype=np.int64),
                np.asarray(self._buf_w, dtype=np.float64),
                self._mode,
                self._limit,
            )
            self._bins = merge_bins(self._bins, batch, self._mode, self._limit)
            self._buf_k, self._buf_w = [], []

    # ------------------------------------------------------- reference API

    def add(self, key: int, weight: float = 1.0) -> None:
        self._buf_k.append(int(key))
        self._buf_w.append(float(weight))
        if len(self._buf_k) >= _FLUSH_AT:
            self._flush()

    def merge(self, other: "DenseStore") -> None:
        self._flush()
        other._flush()
        self._bins = merge_bins(self._bins, other._bins, self._mode, self._limit)

    def copy(self, other: "DenseStore") -> None:
        other._flush()
        self._bins = (other._bins[0], other._bins[1].copy())
        self._buf_k, self._buf_w = [], []

    def key_at_rank(self, rank: float, lower: bool = True) -> int:
        self._flush()
        return _key_at_rank(self._bins, rank, lower)

    @property
    def count(self) -> float:
        self._flush()
        return float(self._bins[1].sum())

    def to_store(self):
        """Canonical ``(offset, bins)`` tuple (this engine's native form)."""
        self._flush()
        return self._bins

    def __repr__(self) -> str:
        self._flush()
        off, bins = self._bins
        return f"{type(self).__name__}(offset={off}, n_bins={len(bins)})"


class CollapsingLowestDenseStore(DenseStore):
    """Bounded store collapsing lowest bins (reference ``store.py:262-381``)."""

    _mode = COLLAPSE_LOWEST

    def __init__(self, bin_limit: int) -> None:
        super().__init__(bin_limit)


class CollapsingHighestDenseStore(DenseStore):
    """Bounded store collapsing highest bins (reference ``store.py:384-504``)."""

    _mode = COLLAPSE_HIGHEST

    def __init__(self, bin_limit: int) -> None:
        super().__init__(bin_limit)
