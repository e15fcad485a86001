"""Drop-in compatibility: ddspark.compat classes behave exactly like the
reference library on the reference's own usage patterns."""

from __future__ import annotations

import numpy as np
import pytest

from ddspark import compat
from ddspark.datasets import DATASET_NAMES, exact_quantile, generate

ALPHA = 0.05
QUANTILES = [0, 0.1, 0.25, 0.5, 0.75, 0.9, 0.95, 0.99, 0.999, 1]

PAIRS = [
    ("DDSketch", (ALPHA,)),
    ("LogCollapsingLowestDenseDDSketch", (ALPHA, 1024)),
    ("LogCollapsingHighestDenseDDSketch", (ALPHA, 1024)),
]


@pytest.mark.parametrize("cls_name,args", PAIRS)
@pytest.mark.parametrize("dataset", ["lognormal", "number_line_backward", "mixed"])
def test_identical_to_reference(ref, cls_name, args, dataset):
    import ddsketch as refmod

    ours = getattr(compat, cls_name)(*args)
    theirs = getattr(refmod, cls_name)(*args)
    values = generate(dataset, 1000)
    for v in values:
        ours.add(float(v))
        theirs.add(float(v))
    assert ours.count == theirs.count
    assert ours.sum == pytest.approx(theirs.sum)
    assert ours.avg == pytest.approx(theirs.avg)
    for q in QUANTILES:
        assert ours.get_quantile_value(q) == pytest.approx(
            theirs.get_quantile_value(q), rel=5e-15
        ), q


def test_merge_like_reference(ref):
    import ddsketch as refmod

    a, b = compat.DDSketch(ALPHA), compat.DDSketch(ALPHA)
    ra, rb = refmod.DDSketch(ALPHA), refmod.DDSketch(ALPHA)
    for v in generate("normal", 500):
        a.add(float(v))
        ra.add(float(v))
    for v in generate("laplace", 500):
        b.add(float(v))
        rb.add(float(v))
    a.merge(b)
    ra.merge(rb)
    assert a.count == ra.count
    for q in QUANTILES:
        assert a.get_quantile_value(q) == pytest.approx(
            ra.get_quantile_value(q), rel=5e-15
        )
    # merge must not mutate the argument
    assert b.count == rb.count
    assert b.get_quantile_value(0.5) == pytest.approx(rb.get_quantile_value(0.5), rel=5e-15)


def test_mixed_gamma_merge_raises():
    a = compat.DDSketch(0.05)
    b = compat.DDSketch(0.01)
    a.add(1.0)
    b.add(1.0)
    with pytest.raises(ValueError):
        a.merge(b)


def test_weight_validation_and_weighted_adds(ref):
    import ddsketch as refmod

    ours = compat.DDSketch(ALPHA)
    with pytest.raises(ValueError):
        ours.add(1.0, 0.0)
    theirs = refmod.DDSketch(ALPHA)
    for v in range(100):
        ours.add(float(v), 1.1)
        theirs.add(float(v), 1.1)
    ours.add(100.0, 110.0)
    theirs.add(100.0, 110.0)
    assert ours.num_values == pytest.approx(theirs.num_values)
    for q in QUANTILES:
        assert ours.get_quantile_value(q) == pytest.approx(
            theirs.get_quantile_value(q), rel=5e-15
        )


def test_empty_semantics():
    s = compat.DDSketch()
    assert s.get_quantile_value(0.5) is None
    assert s.count == 0


def test_add_all_extension():
    s = compat.DDSketch(ALPHA)
    values = generate("exponential", 2000)
    s.add_all(values)
    t = compat.DDSketch(ALPHA)
    for v in values:
        t.add(float(v))
    for q in QUANTILES:
        assert s.get_quantile_value(q) == t.get_quantile_value(q)


def test_buffer_flush_boundary():
    """Interleaved reads mid-buffer give the same results as batched adds."""
    s = compat.DDSketch(ALPHA)
    out = []
    for i, v in enumerate(generate("lognormal", 9000)):
        s.add(float(v))
        if i % 1234 == 0:
            out.append(s.get_quantile_value(0.5))
    assert s.count == 9000


def test_compat_store_classes_match_reference(ref):
    """The store shims complete the reference's 8-name export surface:
    bin-level equality against the reference store classes on mixed
    streams, including collapsing clamps and merge."""
    import numpy as np

    from ddspark import compat

    rng = np.random.default_rng(13)
    keys_a = rng.integers(-300, 300, 4000)
    keys_b = rng.integers(-50, 600, 3000)

    pairs = [
        (lambda: compat.DenseStore(), lambda: ref.store.DenseStore()),
        (
            lambda: compat.CollapsingLowestDenseStore(64),
            lambda: ref.store.CollapsingLowestDenseStore(64),
        ),
        (
            lambda: compat.CollapsingHighestDenseStore(64),
            lambda: ref.store.CollapsingHighestDenseStore(64),
        ),
    ]
    for mk_ours, mk_theirs in pairs:
        ours, theirs = mk_ours(), mk_theirs()
        ours_b, theirs_b = mk_ours(), mk_theirs()
        for k in keys_a:
            ours.add(int(k))
            theirs.add(int(k))
        for k in keys_b:
            ours_b.add(int(k), 2.0)
            theirs_b.add(int(k), 2.0)
        ours.merge(ours_b)
        theirs.merge(theirs_b)
        off, bins = ours.to_store()
        got = {off + i: c for i, c in enumerate(bins) if c}
        want = {
            theirs.offset + i: c
            for i, c in enumerate(theirs.bins)
            if c
        }
        assert got == want, type(ours).__name__
        assert ours.count == theirs.count
        for rank in [0.0, 10.5, 1000.0, ours.count - 1]:
            assert ours.key_at_rank(rank) == theirs.key_at_rank(rank)
            assert ours.key_at_rank(rank, lower=False) == theirs.key_at_rank(rank, lower=False)


def test_compat_mapping_reexports():
    from ddspark import compat

    for cls_name in [
        "LogarithmicMapping",
        "LinearlyInterpolatedMapping",
        "CubicallyInterpolatedMapping",
    ]:
        assert cls_name in compat.__all__
        m = getattr(compat, cls_name)(0.01)
        assert m.key(100.0) == m.key(100.0)
