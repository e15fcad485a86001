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
