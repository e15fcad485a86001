"""Property-based invariants (hypothesis): the algebraic guarantees the
north rule requires — merge commutativity/associativity across arbitrary
splits, collapsing clamp oracles, and the alpha quantile bound — checked on
randomized inputs rather than fixed fixtures.  Pure NumPy core (no Spark),
so hundreds of examples run in seconds."""

from __future__ import annotations

import numpy as np
import pytest
from hypothesis import given, settings, strategies as st

from ddspark.sketch import Sketch, SketchConfig
from ddspark.store import (
    COLLAPSE_HIGHEST,
    COLLAPSE_LOWEST,
    DENSE,
    bins_from_keys,
    merge_bins,
)

finite_values = st.lists(
    st.floats(
        min_value=-1e12,
        max_value=1e12,
        allow_nan=False,
        allow_infinity=False,
    ),
    min_size=1,
    max_size=300,
)

modes = st.sampled_from(
    [(DENSE, None), (COLLAPSE_LOWEST, 16), (COLLAPSE_HIGHEST, 16), (COLLAPSE_LOWEST, 1)]
)


def _nonzero(bins):
    off, arr = bins
    return {off + i: c for i, c in enumerate(arr) if c}


@settings(max_examples=150, deadline=None)
@given(
    keys=st.lists(st.integers(-500, 500), min_size=0, max_size=200),
    split=st.integers(0, 200),
    mode=modes,
)
def test_store_build_split_invariance(keys, split, mode):
    """Building from any split of the key stream and merging equals building
    from the whole stream (the clamped-counter oracle is split-invariant)."""
    m, limit = mode
    k = np.asarray(keys, dtype=np.int64)
    w = np.ones(len(k))
    whole = bins_from_keys(k, w, m, limit)
    cut = min(split, len(k))
    a = bins_from_keys(k[:cut], w[:cut], m, limit)
    b = bins_from_keys(k[cut:], w[cut:], m, limit)
    assert _nonzero(merge_bins(a, b, m, limit)) == _nonzero(whole)
    # commutativity
    assert _nonzero(merge_bins(b, a, m, limit)) == _nonzero(whole)


@settings(max_examples=100, deadline=None)
@given(
    keys=st.lists(st.integers(-300, 300), min_size=0, max_size=150),
    cuts=st.tuples(st.integers(0, 150), st.integers(0, 150)),
    mode=modes,
)
def test_store_merge_associativity(keys, cuts, mode):
    m, limit = mode
    k = np.asarray(sorted(keys), dtype=np.int64)
    w = np.ones(len(k))
    c1, c2 = sorted((min(cuts[0], len(k)), min(cuts[1], len(k))))
    a = bins_from_keys(k[:c1], w[:c1], m, limit)
    b = bins_from_keys(k[c1:c2], w[c1:c2], m, limit)
    c = bins_from_keys(k[c2:], w[c2:], m, limit)
    left = merge_bins(merge_bins(a, b, m, limit), c, m, limit)
    right = merge_bins(a, merge_bins(b, c, m, limit), m, limit)
    assert _nonzero(left) == _nonzero(right)


@settings(max_examples=60, deadline=None)
@given(values=finite_values, q=st.floats(0.0, 1.0), alpha=st.sampled_from([0.01, 0.05]))
def test_sketch_quantile_alpha_bound(values, q, alpha):
    """The reference's own accuracy assertion
    (tests/test_ddsketch.py:76-86): |est - exact| <= alpha*|exact| + slack."""
    v = np.asarray(values, dtype=np.float64)
    cfg = SketchConfig(alpha)
    sk = Sketch.from_values(v, cfg)
    est = sk.quantile(q)
    assert est is not None
    # A fractional rank r = q*(n-1) strictly between two data points has
    # BOTH neighbors as valid rank values (the reference's negative branch
    # walks lower=False, so at r = i - eps it answers the upper neighbor;
    # the positive branch answers the lower one).  Accept either — the
    # alpha guarantee is relative to a value at the requested rank.
    s = np.sort(v)
    r = q * (len(v) - 1)
    candidates = {s[int(np.floor(r))], s[int(np.ceil(r))]}
    assert any(
        abs(est - exact) - alpha * abs(exact) <= 1e-9 * max(1.0, abs(exact))
        for exact in candidates
    )


@settings(max_examples=60, deadline=None)
@given(values=finite_values, splits=st.integers(1, 7))
def test_sketch_merge_split_invariance(values, splits):
    """merge over any partitioning == build over the whole stream
    (bit-identical bins, exact count) — the distributed-correctness core."""
    v = np.asarray(values, dtype=np.float64)
    cfg = SketchConfig(0.02)
    whole = Sketch.from_values(v, cfg)
    parts = [Sketch.from_values(p, cfg) for p in np.array_split(v, splits)]
    merged = Sketch.merge_all([s for s in parts])
    assert merged.nonzero_bins() == whole.nonzero_bins()
    assert merged.count == whole.count
    assert merged.min == whole.min and merged.max == whole.max
    for q in (0.0, 0.25, 0.5, 0.9, 1.0):
        assert merged.quantile(q) == whole.quantile(q)


@settings(max_examples=40, deadline=None)
@given(values=finite_values)
def test_proto_roundtrip_preserves_quantiles(values):
    from ddspark.proto import sketch_from_proto_bytes, sketch_to_proto_bytes

    v = np.asarray(values, dtype=np.float64)
    sk = Sketch.from_values(v, SketchConfig(0.02))
    rt = sketch_from_proto_bytes(sketch_to_proto_bytes(sk))
    assert rt.count == pytest.approx(sk.count)
    for q in (0.1, 0.5, 0.99):
        assert rt.quantile(q) == pytest.approx(sk.quantile(q), rel=1e-9)
