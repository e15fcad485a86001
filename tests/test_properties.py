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


# ------------------------------------------------------- MG compress algebra


@settings(max_examples=100, deadline=None)
@given(
    data=st.lists(
        st.lists(st.integers(0, 30), min_size=1, max_size=200),
        min_size=1,
        max_size=6,
    ),
    k=st.integers(1, 20),
)
def test_mg_compress_composition_certificate(data, k):
    """The exact property the distributed MG pipeline relies on: under ANY
    composition of (add counts, compress to k) steps — per-batch, per
    partition, then a final merge — every kept item satisfies
    est <= true <= est + (sum of subtractions), and every item more
    frequent than that bound survives."""
    import pandas as pd

    from ddspark.sketches.mgfreq import mg_compress

    exact: dict[str, int] = {}
    partials = []
    for part in data:  # each inner list is one "partition"
        counts = pd.Series(dtype=float)
        err = 0.0
        for i in range(0, len(part), 37):  # mimic Arrow batch boundaries
            chunk = (
                pd.Series(part[i : i + 37]).astype(str).value_counts().astype(float)
            )
            counts = counts.add(chunk, fill_value=0.0)
            counts, e = mg_compress(counts, k)
            err += e
        partials.append((counts, err))
        for x in part:
            exact[str(x)] = exact.get(str(x), 0) + 1
    merged = pd.Series(dtype=float)
    bound = 0.0
    for c, e in partials:
        merged = merged.add(c, fill_value=0.0)
        bound += e
    merged, e2 = mg_compress(merged, k)
    bound += e2
    assert len(merged) <= k
    for it, est in merged.items():
        assert est <= exact[it] <= est + bound
    for it, true in exact.items():
        if true > bound:
            assert it in merged.index


# ------------------------------------------------------ split threshold math


@settings(max_examples=100, deadline=None)
@given(
    raw=st.lists(st.floats(0.01, 1.0), min_size=1, max_size=6),
)
def test_split_thresholds_partition_bucket_space(raw):
    """Normalized weights always tile [0, 1e6) exactly: thresholds are
    monotone, the last one closes at 1e6, and every bucket maps to exactly
    one split name."""
    from ddspark.pipeline.curation import _BUCKETS, _split_thresholds

    total = sum(raw)
    weights = {f"s{i}": w / total for i, w in enumerate(raw)}
    th = _split_thresholds(weights)
    assert th[-1][1] == _BUCKETS
    his = [hi for _, hi in th]
    assert his == sorted(his)
    # every threshold interval is assignable (no empty trailing interval
    # steals a name's mass entirely unless its weight rounded to zero)
    prev = 0
    for name, hi in th:
        assert hi >= prev
        prev = hi


@settings(max_examples=300, deadline=None)
@given(raw=st.binary(min_size=0, max_size=2000))
def test_packbits_roundtrip_property(raw):
    """PackBits encode/decode is the identity for arbitrary byte strings,
    and the encoding never inflates worse than the spec bound
    (1 header byte per 128-byte literal chunk)."""
    from ddspark.pipeline.multimodal import _packbits_decode, _packbits_encode

    enc = _packbits_encode(raw)
    assert _packbits_decode(enc, len(raw)) == raw
    assert len(enc) <= len(raw) + (len(raw) + 127) // 128 + 1


@settings(max_examples=60, deadline=None)
@given(
    w=st.integers(1, 12),
    h=st.integers(1, 10),
    seed=st.integers(0, 2**16),
    pb=st.booleans(),
    be=st.booleans(),
    rps=st.integers(1, 12),
)
def test_tiff_roundtrip_property(w, h, seed, pb, be, rps):
    """encode_tiff/_decode_tiff is the identity for any geometry, strip
    size, byte order, and compression."""
    from ddspark.pipeline.multimodal import _decode_tiff, encode_tiff

    rng = np.random.RandomState(seed)
    a = rng.randint(0, 256, size=(h, w, 3)).astype(np.uint8)
    blob = encode_tiff(a, packbits=pb, big_endian=be, rows_per_strip=rps)
    assert (_decode_tiff(blob) == a).all()


def test_poisson_cdf_constants_are_the_cdf():
    """The literal Poisson(1) thresholds both engines compare against are
    the true CDF to 1 ulp, strictly increasing, and the tail beyond the
    k=8 cap is negligible (< 2e-6) relative to the 1e9 quantization."""
    import math

    from ddspark.profile import _POISSON1_CDF

    c = 0.0
    f = 1
    for k, lit in enumerate(_POISSON1_CDF):
        if k > 0:
            f *= k
        c += math.exp(-1.0) / f
        assert abs(lit - c) < 5e-16
    assert all(b > a for a, b in zip(_POISSON1_CDF, _POISSON1_CDF[1:]))
    assert 1.0 - _POISSON1_CDF[-1] < 2e-6
