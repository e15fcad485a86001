"""Sibling mergeable sketches (north-rule set): HyperLogLog, Bloom,
Count-Min, t-digest — same partial/merge/finalize skeleton as the DDSketch
engine, each with a JVM-native cell aggregation where the algebra allows."""

from . import bloom, countmin, hll, kll, mgfreq, tdigest, theta  # noqa: F401

__all__ = ["hll", "bloom", "countmin", "kll", "mgfreq", "tdigest", "theta"]
