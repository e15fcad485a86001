"""Deterministic value-stream generators mirroring the reference test
distributions (DataDog/sketches-py ``tests/datasets.py:69-387``).

The reference leaves its random generators unseeded; we pin every one to
``numpy.random.default_rng(seed)`` so the same bytes are produced at every
parallelism level — required for the merge-invariance tests and the two-level
scaling benchmark.  Deterministic (non-random) generators reproduce the
reference's emission order exactly.
"""

from __future__ import annotations

import zlib

import numpy as np

__all__ = ["generate", "DATASET_NAMES", "exact_quantile"]


def exact_quantile(values: np.ndarray, q: float) -> float:
    """The reference's exact oracle: ``sorted(data)[int(q * (n - 1))]``
    (lower-rank semantics, ``tests/datasets.py:30-33``)."""
    s = np.sort(np.asarray(values, dtype=np.float64))
    return float(s[int(q * (len(s) - 1))])


def _uniform_forward(n: int, rng) -> np.ndarray:
    return np.arange(n, dtype=np.float64)


def _uniform_backward(n: int, rng) -> np.ndarray:
    return np.arange(n, 0, -1, dtype=np.float64)


def _negative_uniform_forward(n: int, rng) -> np.ndarray:
    return -np.arange(n, 0, -1, dtype=np.float64)


def _negative_uniform_backward(n: int, rng) -> np.ndarray:
    return -np.arange(n, dtype=np.float64)


def _number_line_forward(n: int, rng) -> np.ndarray:
    return np.arange(-n // 2 + 1, n // 2 + 1, dtype=np.float64)


def _number_line_backward(n: int, rng) -> np.ndarray:
    # reference: range(size // 2, -size // 2, -1) — note floor division of
    # the NEGATED size (tests/datasets.py:143): -5 // 2 == -3, so odd sizes
    # still emit n values
    return np.arange(n // 2, (-n) // 2, -1, dtype=np.float64)


def _uniform_zoomin(n: int, rng) -> np.ndarray:
    out = []
    for item in range(n // 2):
        out.append(item)
        out.append(n - item - 1)
    if n % 2 == 1:
        out.append(n // 2)
    return np.array(out, dtype=np.float64)


def _uniform_zoomout(n: int, rng) -> np.ndarray:
    out = []
    if n % 2 == 1:
        out.append(n // 2)
        half = n // 2
        for item in range(1, half + 1):
            out.append(half + item)
            out.append(half - item)
    else:
        half = np.ceil(n / 2) - 0.5
        for item in range(0, int(half + 0.5)):
            out.append(int(half + item + 0.5))
            out.append(int(half - item - 0.5))
    return np.array(out, dtype=np.float64)


def _uniform_sqrt(n: int, rng) -> np.ndarray:
    out = []
    t = int(np.sqrt(2 * n))
    initial_item = 0
    initial_skip = 1
    emitted = 0
    i = 0
    while emitted < n:
        item = initial_item
        skip = initial_skip
        for _ in range(t - i):
            if item < n:
                out.append(item)
                emitted += 1
            item += skip
            skip += 1
        if t - i > 1:
            initial_skip += 1
            initial_item += initial_skip
            i += 1
        else:
            initial_item += 1
    return np.array(out, dtype=np.float64)


def _constant(n: int, rng) -> np.ndarray:
    return np.full(n, 42.0)


def _exponential(n: int, rng) -> np.ndarray:
    return rng.exponential(scale=0.01, size=n)


def _lognormal(n: int, rng) -> np.ndarray:
    return rng.lognormal(size=n) / 100.0


def _normal(n: int, rng) -> np.ndarray:
    return rng.normal(loc=37.4, scale=1.0, size=n)


def _laplace(n: int, rng) -> np.ndarray:
    return rng.laplace(loc=11278.0, scale=100.0, size=n)


def _bimodal(n: int, rng) -> np.ndarray:
    pick = rng.random(n) > 0.5
    return np.where(pick, rng.laplace(17.3, size=n), rng.normal(-2.0, 3.0, size=n))


def _trimodal(n: int, rng) -> np.ndarray:
    u = rng.random(n)
    a = rng.laplace(17.3, size=n)
    b = rng.normal(5.0, 0.5, size=n)
    c = rng.exponential(scale=0.01, size=n)
    return np.where(u > 2.0 / 3.0, a, np.where(u > 1.0 / 3.0, b, c))


def _mixed(n: int, rng) -> np.ndarray:
    pick = rng.random(n) < 0.9
    return np.where(
        pick, 0.1 * rng.lognormal(0.0, 0.25, size=n), rng.normal(10.0, 0.5, size=n)
    )


def _integers(n: int, rng) -> np.ndarray:
    return np.trunc(rng.normal(loc=4.3, scale=5.0, size=n))


_GENERATORS = {
    "uniform_forward": _uniform_forward,
    "uniform_backward": _uniform_backward,
    "uniform_zoomin": _uniform_zoomin,
    "uniform_zoomout": _uniform_zoomout,
    "uniform_sqrt": _uniform_sqrt,
    "constant": _constant,
    "negative_uniform_forward": _negative_uniform_forward,
    "negative_uniform_backward": _negative_uniform_backward,
    "number_line_forward": _number_line_forward,
    "number_line_backward": _number_line_backward,
    "exponential": _exponential,
    "lognormal": _lognormal,
    "normal": _normal,
    "laplace": _laplace,
    "bimodal": _bimodal,
    "trimodal": _trimodal,
    "mixed": _mixed,
    "integers": _integers,
}

DATASET_NAMES = tuple(_GENERATORS)


def generate(name: str, size: int, seed: int = 42) -> np.ndarray:
    """Deterministic value stream for (dataset, size).  Seeded with a stable
    (process-independent) hash so Spark workers and the driver agree."""
    stable = zlib.crc32(f"{name}|{size}|{seed}".encode())
    rng = np.random.default_rng(stable)
    return _GENERATORS[name](size, rng)
