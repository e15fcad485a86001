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
