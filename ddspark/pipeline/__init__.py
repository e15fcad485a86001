"""Training-data pipeline operators: text analysis, deduplication,
similarity search, multimodal column plumbing — the operations a 100 TB
pretraining-data pipeline runs alongside the sketch aggregations."""

from . import ann, curation, dedup, joins, multimodal, textops  # noqa: F401

__all__ = ["textops", "dedup", "ann", "multimodal", "curation", "joins"]
