"""Property-based tests (hypothesis) for the sketch algebra: the invariants
the distributed engine relies on, checked over adversarial inputs."""

from __future__ import annotations

import numpy as np
import pytest
from hypothesis import given, settings, strategies as st

from ddspark.datasets import exact_quantile
from ddspark.sketch import Sketch, SketchConfig
from ddspark.store import COLLAPSE_HIGHEST, COLLAPSE_LOWEST, DENSE

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

configs = st.sampled_from(
    [
        SketchConfig(0.05, mode=DENSE),
        SketchConfig(0.01, mode=DENSE),
        SketchConfig(0.05, mode=COLLAPSE_LOWEST, bin_limit=32),
        SketchConfig(0.05, mode=COLLAPSE_HIGHEST, bin_limit=32),
        SketchConfig(0.02, mapping="linear"),
        SketchConfig(0.02, mapping="cubic"),
    ]
)


@settings(max_examples=150, deadline=None)
@given(values=finite_values, cfg=configs, seed=st.integers(0, 2**16))
def test_split_merge_equals_whole(values, cfg, seed):
    """merge(split(data)) == build(data) for any split — the exactly-once
    distributed-aggregation property."""
    v = np.array(values)
    whole = Sketch.from_values(v, cfg)
    rng = np.random.default_rng(seed)
    k = int(rng.integers(1, min(len(v), 7) + 1))
    parts = np.array_split(rng.permutation(v), k)
    merged = Sketch.merge_all([Sketch.from_values(p, cfg) for p in parts if len(p)])
    assert whole.nonzero_bins() == merged.nonzero_bins()
    assert whole.count == merged.count
    assert whole.zero_count == merged.zero_count
    assert whole.min == merged.min and whole.max == merged.max


@settings(max_examples=150, deadline=None)
@given(values=finite_values)
def test_dense_quantiles_within_alpha(values):
    cfg = SketchConfig(0.05)
    v = np.array(values)
    sk = Sketch.from_values(v, cfg)
    for q in [0.0, 0.25, 0.5, 0.75, 1.0]:
        est = sk.quantile(q)
        exact = exact_quantile(v, q)
        assert abs(est - exact) - 0.05 * abs(exact) <= 1e-9, (q, est, exact)


@settings(max_examples=100, deadline=None)
@given(values=finite_values, cfg=configs)
def test_merge_commutative(values, cfg):
    v = np.array(values)
    mid = len(v) // 2
    a = Sketch.from_values(v[:mid], cfg) if mid else Sketch.empty(cfg)
    b = Sketch.from_values(v[mid:], cfg)
    ab = a.merge(b)
    ba = b.merge(a)
    assert ab.nonzero_bins() == ba.nonzero_bins()
    assert ab.count == ba.count and ab.zero_count == ba.zero_count
    assert ab.min == ba.min and ab.max == ba.max
    for q in (0.0, 0.5, 1.0):
        assert ab.quantile(q) == ba.quantile(q)


@settings(max_examples=100, deadline=None)
@given(values=finite_values, cfg=configs)
def test_proto_roundtrip_bins(values, cfg):
    from ddspark.proto import sketch_from_proto_bytes, sketch_to_proto_bytes

    sk = Sketch.from_values(np.array(values), cfg)
    back = sketch_from_proto_bytes(sketch_to_proto_bytes(sk))
    assert back.nonzero_bins() == sk.nonzero_bins()
    assert back.zero_count == sk.zero_count


@settings(max_examples=100, deadline=None)
@given(
    keys=st.lists(st.integers(-(2**40), 2**40), min_size=1, max_size=200),
    bin_limit=st.sampled_from([1, 2, 20, 1000]),
    mode=st.sampled_from([COLLAPSE_LOWEST, COLLAPSE_HIGHEST]),
)
def test_collapsing_clamp_oracle_property(keys, bin_limit, mode):
    from collections import Counter

    from ddspark.store import bins_from_keys

    off, bins = bins_from_keys(np.array(keys, dtype=np.int64), mode=mode, bin_limit=bin_limit)
    want: Counter = Counter()
    if mode == COLLAPSE_LOWEST:
        lo = max(keys) - bin_limit + 1
        for k in keys:
            want[max(k, lo)] += 1
    else:
        hi = min(keys) + bin_limit - 1
        for k in keys:
            want[min(k, hi)] += 1
    got = {off + i: c for i, c in enumerate(bins) if c != 0}
    assert got == {k: float(c) for k, c in want.items()}
