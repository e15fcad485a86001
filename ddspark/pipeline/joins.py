"""Skew-safe join utilities.

AQE's skew-join handling (on by default in :func:`ddspark.session.get_spark`)
splits oversized shuffle partitions at runtime and covers most skew.  The
explicit salting here is for the cases AQE cannot fix: a single join key so
hot that even a split partition's rows all carry the same key (every
sub-partition still hashes back together downstream), streaming joins where
AQE does not apply, or when you need the mitigation to be part of the plan
contract rather than a runtime heuristic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

__all__ = ["salted_join"]


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: list[str] | str,
    n_salts: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Join a skewed ``big`` side to a modest ``small`` side with explicit
    key salting: each big-side row gets a salt in ``[0, n_salts)`` derived
    from its row position (so even bit-identical hot-key rows spread), the
    small side is replicated once per salt, and the join keys become
    ``on + [_salt]`` — a key carried by ``f`` of the rows now occupies
    ``n_salts`` shuffle partitions instead of one.

    Cost model: the small side shuffles ``n_salts`` times its size — size
    ``n_salts`` so that (hot-key rows / n_salts) fits one task, and keep the
    small side genuinely small (if it broadcasts, you don't need salting at
    all).  ``how`` may be ``inner`` or ``left`` (big side preserved); right
    and full joins would emit unmatched small-side rows once per replica and
    are rejected.

    The result is exactly the unsalted join's result — salting is pure
    partitioning, invisible in values.
    """
    on = [on] if isinstance(on, str) else list(on)
    if how not in ("inner", "left"):
        raise ValueError(
            f"salted_join supports how='inner'/'left', got {how!r}: an outer "
            "join would emit unmatched small-side rows once per salt replica"
        )
    # Retry-safety: monotonically_increasing_id is NOT deterministic across
    # task retries (a re-run partition can hand the same row a different
    # id), but that cannot change the join's VALUES — the small side
    # carries every salt in [0, n_salts), so a big-side row matches exactly
    # the same small-side rows whichever salt it lands on; the salt only
    # picks which replica (i.e. which shuffle partition) serves the match.
    # Do not "fix" this to a deterministic hash of the join key: bit-equal
    # hot-key rows would then all hash to ONE salt and the skew returns —
    # the whole point is that identical rows spread by position, not value.
    salt = F.pmod(F.xxhash64(F.monotonically_increasing_id()), F.lit(n_salts))
    big_s = big.withColumn("_salt", salt.cast("int"))
    small_s = small.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)))
    ).withColumn("_salt", F.col("_salt").cast("int"))
    return big_s.join(small_s, on + ["_salt"], how).drop("_salt")
