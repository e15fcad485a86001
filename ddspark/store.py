"""Batch bucket-store kernels.

A store maps integer bucket keys to float counters.  Where the reference
(DataDog/sketches-py ``ddsketch/store.py``) maintains a mutable, chunk-grown,
centered Python list per sketch and adds one key at a time, this module works
on the *canonical* representation — ``(offset, bins)`` with
``bins: np.float64[max_key - min_key + 1]``, ``bins[0] != 0`` and
``bins[-1] != 0`` — and builds/merges whole batches of keys at once with
``np.bincount`` / aligned slice adds.  The canonical form is what travels
through Spark as ``(offset BIGINT, bins ARRAY<DOUBLE>)``.

Collapsing semantics: the reference's collapsing stores
(``store.py:262-504``) are history-dependent (a sticky ``is_collapsed`` flag
folds out-of-window keys into the boundary bin as they arrive), but their end
state provably equals the *clamped-counter oracle* the reference's own tests
use (``tests/test_store.py:216-218, 257-259``):

* collapse-lowest:  every key is clamped to ``max(k, true_max_key - bin_limit + 1)``
* collapse-highest: every key is clamped to ``min(k, true_min_key + bin_limit - 1)``

because the collapse window's far edge (max for lowest / min for highest) is
never clamped, moves monotonically, and every fold pushes counts toward the
final boundary bin.  Our kernels clamp against the batch/merge-wide window
directly, which makes build and merge commutative and associative across any
partition split — the property the distributed aggregation requires.
"""

from __future__ import annotations

import numpy as np

__all__ = [
    "DENSE",
    "COLLAPSE_LOWEST",
    "COLLAPSE_HIGHEST",
    "STORE_MODES",
    "empty_bins",
    "is_empty",
    "canonicalize",
    "bins_from_keys",
    "merge_bins",
    "merge_many",
    "key_at_rank",
]

DENSE = "dense"
COLLAPSE_LOWEST = "collapse_lowest"
COLLAPSE_HIGHEST = "collapse_highest"
STORE_MODES = (DENSE, COLLAPSE_LOWEST, COLLAPSE_HIGHEST)

Bins = tuple[int, np.ndarray]  # (offset == min_key, counters)


def empty_bins() -> Bins:
    return 0, np.zeros(0, dtype=np.float64)


def is_empty(store: Bins) -> bool:
    return len(store[1]) == 0


def canonicalize(offset: int, bins: np.ndarray) -> Bins:
    """Trim leading/trailing zero bins so offset == min_key, len == span."""
    bins = np.asarray(bins, dtype=np.float64)
    nz = np.nonzero(bins)[0]
    if len(nz) == 0:
        return empty_bins()
    lo, hi = int(nz[0]), int(nz[-1])
    return offset + lo, np.ascontiguousarray(bins[lo : hi + 1])


def _clamp_window(lo: int, hi: int, mode: str, bin_limit: int | None) -> tuple[int, int]:
    """The key window [lo, hi] a collapsing store with this limit keeps."""
    if bin_limit is None or bin_limit <= 0 or hi - lo + 1 <= bin_limit:
        return lo, hi
    if mode == COLLAPSE_LOWEST:
        return hi - bin_limit + 1, hi
    if mode == COLLAPSE_HIGHEST:
        return lo, lo + bin_limit - 1
    return lo, hi  # dense: never clamps


def bins_from_keys(
    keys: np.ndarray,
    weights: np.ndarray | None = None,
    mode: str = DENSE,
    bin_limit: int | None = None,
) -> Bins:
    """Aggregate a batch of bucket keys (+ optional weights) into canonical bins.

    Equivalent to replaying ``store.add(key, weight)`` for the whole batch
    (reference ``store.py:161-165``), with collapsing applied against the
    batch-wide window.
    """
    keys = np.asarray(keys, dtype=np.int64)
    if keys.size == 0:
        return empty_bins()
    lo = int(keys.min())
    hi = int(keys.max())
    lo, hi = _clamp_window(lo, hi, mode, bin_limit)
    if hi > lo + (1 << 26):
        raise ValueError(
            f"key span {hi - lo + 1} too wide for a dense store; "
            "use a collapsing mode with a bin_limit"
        )
    clamped = np.clip(keys, lo, hi)
    w = None if weights is None else np.asarray(weights, dtype=np.float64)
    bins = np.bincount(clamped - lo, weights=w, minlength=hi - lo + 1)
    if w is None:
        bins = bins.astype(np.float64)
    return canonicalize(lo, bins)


def _fold_into(dst: np.ndarray, dst_lo: int, dst_hi: int, src: Bins) -> None:
    """Add src's counters into dst, folding keys outside [dst_lo, dst_hi]
    into the nearest boundary bin (the collapse semantics of reference
    ``store.py:357-381`` and ``store.py:480-504``)."""
    src_lo, src_bins = src
    n = len(src_bins)
    if n == 0:
        return
    src_hi = src_lo + n - 1
    # below-window prefix -> dst[0]
    below = min(max(dst_lo - src_lo, 0), n)
    if below:
        dst[0] += src_bins[:below].sum()
    # above-window suffix -> dst[-1]
    above = min(max(src_hi - dst_hi, 0), n)
    if above:
        dst[-1] += src_bins[n - above :].sum()
    # aligned middle
    mid_lo = max(src_lo, dst_lo)
    mid_hi = min(src_hi, dst_hi)
    if mid_hi >= mid_lo:
        dst[mid_lo - dst_lo : mid_hi - dst_lo + 1] += src_bins[
            mid_lo - src_lo : mid_hi - src_lo + 1
        ]


def merge_many(
    stores: list[Bins], mode: str = DENSE, bin_limit: int | None = None
) -> Bins:
    """Merge any number of canonical stores in one allocation.

    Commutative and associative; for collapsing modes the result equals the
    clamped-counter oracle of the union of all inputs.
    """
    nonempty = [s for s in stores if len(s[1]) > 0]
    if not nonempty:
        return empty_bins()
    if len(nonempty) == 1:
        off, b = nonempty[0]
        return off, np.array(b, dtype=np.float64, copy=True)
    lo = min(s[0] for s in nonempty)
    hi = max(s[0] + len(s[1]) - 1 for s in nonempty)
    lo, hi = _clamp_window(lo, hi, mode, bin_limit)
    out = np.zeros(hi - lo + 1, dtype=np.float64)
    for s in nonempty:
        _fold_into(out, lo, hi, s)
    return canonicalize(lo, out)


def merge_bins(
    a: Bins, b: Bins, mode: str = DENSE, bin_limit: int | None = None
) -> Bins:
    """Merge two canonical stores (reference ``store.py:244-259``)."""
    return merge_many([a, b], mode=mode, bin_limit=bin_limit)


def key_at_rank(store: Bins, rank: float, lower: bool = True) -> int:
    """Key of the bucket holding the value at ``rank``.

    Contract matches reference ``store.py:90-103, 234-242``: with ``lower``
    the first key whose running count exceeds ``rank``; with ``lower=False``
    the first key whose running count reaches ``rank + 1``; falls back to
    ``max_key`` when the rank exceeds the total count.
    """
    offset, bins = store
    if len(bins) == 0:
        raise ValueError("key_at_rank on an empty store")
    cum = np.cumsum(bins)
    if lower:
        idx = int(np.searchsorted(cum, rank, side="right"))
    else:
        idx = int(np.searchsorted(cum, rank + 1.0, side="left"))
    if idx >= len(bins):
        idx = len(bins) - 1  # max_key fallback
    return offset + idx
