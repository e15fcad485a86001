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

__all__ = [
    "salted_join",
    "asof_join",
    "range_join",
    "attribution_join",
    "key_profile",
]


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


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str] | str,
    left_ts: str = "ts",
    right_ts: str | None = None,
    direction: str = "backward",
    tolerance: float | None = None,
    suffix: str = "_r",
) -> DataFrame:
    """Point-in-time (as-of) join: attach to every left row the right row
    with the greatest ``right_ts <= left_ts`` (``backward``, ties match)
    — or the least ``right_ts >= left_ts`` (``forward``) — sharing the
    equality keys ``on``.  The standard event-to-dimension-history join
    (prices, configs, feature snapshots) that plain equi-joins cannot
    express and pandas calls ``merge_asof``.

    All left rows survive (left-outer): unmatched rows carry NULLs.  With
    ``tolerance`` (seconds for timestamps, plain delta for numerics),
    matches farther than the tolerance are nulled out.  Right rows with a
    NULL key or NULL timestamp never match, mirroring SQL join-key
    semantics (DuckDB's native ``ASOF JOIN`` — the oracle for this
    operator — behaves the same).  Right value columns clashing with left
    names get ``suffix``; the matched timestamp comes back as
    ``right_ts + suffix``.

    **Scale**: no per-row Python and no windowed self-join — both sides
    union into ONE shuffle on the equality keys, a single sort by
    ``(ts, side)`` per key group, and a running ``last(..., ignorenulls)``
    carries the newest right values forward (backward mode; forward sorts
    descending).  That is the plan shape of a sort-merge join: linear in
    rows per key, skew bounded by the hottest key exactly like any keyed
    join (salt first if one key dominates).  Right-side history is
    typically tiny next to the event stream, so the union adds almost
    nothing to the shuffle.
    """
    from pyspark.sql import Window

    on = [on] if isinstance(on, str) else list(on)
    right_ts = right_ts or left_ts
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward/forward, got {direction!r}")
    bad = [c for c in on if c not in left.columns or c not in right.columns]
    if bad or left_ts not in left.columns or right_ts not in right.columns:
        raise ValueError(f"missing join columns: on={bad}, ts={left_ts}/{right_ts}")

    reserved = {"_ats", "_src"}
    taken = reserved & set(left.columns) | reserved & set(right.columns)
    if taken:
        raise ValueError(f"columns {sorted(taken)} are reserved by asof_join")
    val_cols = [c for c in right.columns if c not in on and c != right_ts]
    out_names = {c: (c + suffix if c in left.columns else c) for c in val_cols}
    ts_out = right_ts + suffix
    if ts_out in left.columns:
        raise ValueError(f"output column {ts_out!r} clashes with a left column")
    out_list = [ts_out, *out_names.values()]
    dups = sorted({n for n in out_list if out_list.count(n) > 1})
    if dups:
        raise ValueError(
            f"suffixed right columns collide on {dups}; rename the right "
            "side or pass a different suffix"
        )

    keys_ok = F.col(right_ts).isNotNull()
    for k in on:
        keys_ok = keys_ok & F.col(k).isNotNull()
    r = right.where(keys_ok).select(
        *on,
        F.col(right_ts).alias("_ats"),
        F.col(right_ts).alias(ts_out),
        F.lit(0).alias("_src"),
        *[F.col(c).alias(out_names[c]) for c in val_cols],
    )
    l = left.select(
        "*", F.col(left_ts).alias("_ats"), F.lit(1).alias("_src")
    )
    u = l.unionByName(r, allowMissingColumns=True)

    order = (
        [F.col("_ats").asc_nulls_first(), F.col("_src").asc()]
        if direction == "backward"
        else [F.col("_ats").desc_nulls_last(), F.col("_src").asc()]
    )
    w = (
        Window.partitionBy(*on)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    attach = {ts_out: F.last(ts_out, ignorenulls=True).over(w)}
    for c in val_cols:
        attach[out_names[c]] = F.last(out_names[c], ignorenulls=True).over(w)
    u = u.withColumns(attach).where(F.col("_src") == 1).drop("_ats", "_src")

    # null-guard + tolerance in one pass: a left row with a NULL ts or a
    # too-far match keeps its row but drops the attachment
    keep = F.col(left_ts).isNotNull() & F.col(ts_out).isNotNull()
    if tolerance is not None:
        lt_type = dict(left.dtypes).get(left_ts, "")
        if lt_type.startswith("timestamp"):
            # timestamp columns cannot cast to double (TIMESTAMP_NTZ
            # rejects it); exact integer microsecond difference instead
            delta = F.abs(
                F.expr(f"timestampdiff(MICROSECOND, `{ts_out}`, `{left_ts}`)")
            )
            limit = F.lit(int(float(tolerance) * 1_000_000))
        else:
            delta = F.abs(
                F.col(left_ts).cast("double") - F.col(ts_out).cast("double")
            )
            limit = F.lit(float(tolerance))
        keep = keep & (delta <= limit)
    fix = {name: F.when(keep, F.col(name)) for name in [ts_out, *out_names.values()]}
    return u.withColumns(fix)


def range_join(
    left: DataFrame,
    right: DataFrame,
    left_point: str,
    right_lo: str,
    right_hi: str,
    on: list[str] | str | None = None,
    bucket: float = 1.0,
    how: str = "inner",
    max_buckets_per_interval: int = 10_000,
) -> DataFrame:
    """Point-in-interval join (``left.point BETWEEN right.lo AND right.hi``,
    inclusive, plus optional equality keys ``on``) without the cartesian
    product a naive theta-join plans.  Both range columns must be numeric
    (convert timestamps with ``timestampdiff`` first).

    **Scale**: each interval explodes into the ``floor(lo/bucket) ..
    floor(hi/bucket)`` covering buckets; each point lives in exactly ONE
    bucket, so the bucket equi-join emits every qualifying (point,
    interval) pair exactly once — no post-dedup — and Catalyst gets a
    plain hash/sort-merge join it can broadcast or AQE-split like any
    other.  Pick ``bucket`` near the typical interval length: the
    explode factor is ``span/bucket + 1``, and intervals longer than
    ``max_buckets_per_interval`` buckets fail fast (raise_error, lazily
    per row — no extra pass) instead of silently exploding a job.
    ``how``: inner / left / left_semi / left_anti (the range predicate
    rides IN the join condition, so outer semantics stay SQL-exact).
    """
    on = [] if on is None else [on] if isinstance(on, str) else list(on)
    if how not in ("inner", "left", "left_semi", "left_anti"):
        raise ValueError(f"how must be inner/left/left_semi/left_anti, got {how!r}")
    for c, df, side in ((left_point, left, "left"), (right_lo, right, "right"), (right_hi, right, "right")):
        if c not in df.columns:
            raise ValueError(f"{side} side is missing column {c!r}")
    b = float(bucket)
    if not b > 0:
        raise ValueError(f"bucket must be positive, got {bucket!r}")
    taken = {"_lb", "_rb"} & (set(left.columns) | set(right.columns))
    if taken:
        raise ValueError(f"columns {sorted(taken)} are reserved by range_join")

    lo_b = F.floor(F.col(right_lo) / b)
    hi_b = F.floor(F.col(right_hi) / b)
    span_ok = (hi_b - lo_b) < F.lit(int(max_buckets_per_interval))
    # lazy guard: CASE branches evaluate per row, so an oversized interval
    # raises with its width instead of materialising a huge sequence
    buckets = F.when(span_ok, F.sequence(lo_b, hi_b)).otherwise(
        F.raise_error(
            F.concat(
                F.lit("range_join: interval spans "),
                (hi_b - lo_b + 1).cast("string"),
                F.lit(f" buckets (> {max_buckets_per_interval}); raise `bucket`"),
            )
        )
    )
    r = right.where(
        F.col(right_lo).isNotNull()
        & F.col(right_hi).isNotNull()
        & (F.col(right_hi) >= F.col(right_lo))
    ).withColumn("_rb", F.explode(buckets))
    l = left.withColumn("_lb", F.floor(F.col(left_point) / b))

    cond = l["_lb"] == r["_rb"]
    for k in on:
        cond = cond & (l[k] == r[k])
    cond = cond & (l[left_point] >= r[right_lo]) & (l[left_point] <= r[right_hi])
    clash = [
        c for c in right.columns if c in left.columns and c not in on
    ]
    if how in ("inner", "left") and clash:
        raise ValueError(
            f"right columns {clash} clash with left names: rename them first"
        )
    # Unlike interval_overlap_join, the LEFT side is never exploded (each
    # point lives in exactly one bucket), so semi/anti multiplicity is
    # already exact on the direct join — no matched-key-set pass needed.
    j = l.join(r, cond, how)
    if how in ("left_semi", "left_anti"):
        return j.drop("_lb")
    out = j.drop("_lb", "_rb")
    for k in on:
        # keep the left copy of the equality keys (right copy is equal or,
        # under `left`, NULL on unmatched rows)
        out = out.drop(r[k])
    return out


def attribution_join(
    lead: DataFrame,
    follow: DataFrame,
    on: list[str] | str,
    lead_ts: str,
    follow_ts: str,
    max_gap: str = "30 minutes",
    watermark: str | None = None,
) -> DataFrame:
    """Event attribution: every (lead, follow) pair with equal ``on`` keys
    where the follow event lands within ``max_gap`` AFTER the lead event
    (``lead_ts <= follow_ts <= lead_ts + max_gap``, inclusive) — the
    view→click / impression→purchase join of every funnel pipeline.

    Works identically on batch AND streaming inputs: the time-range
    predicate rides in the join condition, which is exactly the shape
    Structured Streaming's stream-stream inner join supports.  For
    streaming sources pass ``watermark`` (e.g. ``"1 hour"``): it is
    applied to both event-time columns and bounds the join state —
    Spark buffers a lead row only until the follow-side watermark passes
    ``lead_ts + max_gap``, so state is O(events inside the watermark
    horizon), not O(stream).  Inner-join matches emit as they arrive
    (no watermark wait on output, only on state eviction).

    Batch plan: a plain equi-join on ``on`` with the range predicate in
    the condition — hash/sort-merge joinable, AQE-splittable, no
    cartesian product.  Hot keys (one user with millions of events)
    concentrate pairs quadratically; profile with :func:`key_profile`
    and pre-cap pathological keys upstream.
    """
    on = [on] if isinstance(on, str) else list(on)
    if not on:
        raise ValueError("attribution_join needs at least one equality key")
    for c, df, side in ((lead_ts, lead, "lead"), (follow_ts, follow, "follow")):
        if c not in df.columns:
            raise ValueError(f"{side} side is missing column {c!r}")
    if lead_ts == follow_ts:
        raise ValueError(
            "lead_ts and follow_ts must be distinct column names "
            "(rename one side so both timestamps survive the join)"
        )
    clash = [
        c
        for c in follow.columns
        if c in lead.columns and c not in on
    ]
    if clash:
        raise ValueError(
            f"follow columns {clash} clash with lead names: rename them first"
        )
    streaming = lead.isStreaming or follow.isStreaming
    if streaming and watermark is None:
        raise ValueError(
            "streaming attribution_join requires `watermark` — without it "
            "the join state grows unboundedly"
        )
    if watermark is not None:
        lead = lead.withWatermark(lead_ts, watermark)
        follow = follow.withWatermark(follow_ts, watermark)
    cond = F.col(follow_ts).between(
        F.col(lead_ts), F.col(lead_ts) + F.expr(f"INTERVAL {max_gap}")
    )
    for k in on:
        cond = cond & (lead[k] == follow[k])
    j = lead.join(follow, cond, "inner")
    for k in on:
        j = j.drop(follow[k])
    return j


def key_profile(
    df: DataFrame,
    key: str | list[str],
    top: int = 20,
) -> DataFrame:
    """Skew diagnostics for a prospective join/aggregation key: the ``top``
    heaviest key values with exact count, share, and cumulative share in
    integer basis points — the numbers that decide between a plain
    shuffle, :func:`salted_join`, and AQE skew handling (a key above a
    few hundred bp of the table is a salting candidate).

    **Scale**: one count-aggregate per distinct key (map-side partial
    agg), totals re-aggregated from those cells (never a second corpus
    scan), top-N via TakeOrdered (no global sort materialisation), and
    the rank/cumulative window runs on ``top`` rows only.  Shares use
    integer ``(cnt * 10000) div total`` so the output is exact and
    engine-portable.
    """
    from pyspark.sql import Window

    key = [key] if isinstance(key, str) else list(key)
    if top < 1:
        raise ValueError(f"top must be >= 1, got {top}")
    counts = df.groupBy(*key).agg(F.count(F.lit(1)).alias("cnt"))
    totals = counts.agg(
        F.sum("cnt").alias("_total"), F.count(F.lit(1)).alias("_distinct")
    )
    head = (
        counts.orderBy(F.col("cnt").desc(), *[F.col(k).asc_nulls_last() for k in key])
        .limit(top)
        .crossJoin(F.broadcast(totals))
    )
    w = Window.orderBy(F.col("cnt").desc(), *[F.col(k).asc_nulls_last() for k in key])
    return head.select(
        F.row_number().over(w).alias("rank"),
        *key,
        "cnt",
        F.col("_total").alias("total"),
        F.col("_distinct").alias("n_keys"),
        F.expr("(cnt * 10000) div _total").alias("share_bp"),
        F.expr(
            "(sum(cnt) OVER (ORDER BY cnt DESC, "
            + ", ".join(f"{k} ASC NULLS LAST" for k in key)
            + " ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) * 10000)"
            " div _total"
        ).alias("cum_share_bp"),
    )


def interval_overlap_join(
    left: DataFrame,
    right: DataFrame,
    left_lo: str,
    left_hi: str,
    right_lo: str,
    right_hi: str,
    on: list[str] | str | None = None,
    bucket: float = 1.0,
    how: str = "inner",
    left_key: str | None = None,
    max_buckets_per_interval: int = 10_000,
) -> DataFrame:
    """Interval-overlap join: every (left, right) pair whose closed
    intervals intersect (``l.lo <= r.hi AND r.lo <= l.hi``, plus
    optional equality keys) — the two-sided sibling of
    :func:`range_join`, without the cartesian product a theta-join
    plans.

    **Scale / exactly-once** — BOTH sides explode into their covering
    buckets, and the join keeps a pair only in the single bucket that
    contains the overlap's START (``floor(greatest(l.lo, r.lo) /
    bucket)``).  The overlap start lies in exactly one bucket and both
    intervals cover it, so every overlapping pair is emitted exactly
    once with NO post-dedup — the join stays a plain equi-join Catalyst
    can broadcast or AQE-split.  Explode factor is ``span/bucket + 1``
    per side; intervals spanning more than ``max_buckets_per_interval``
    buckets fail fast with a per-row raise.  Pick ``bucket`` near the
    typical interval length.  ``how``: inner / left_semi / left_anti.
    """
    on = [] if on is None else [on] if isinstance(on, str) else list(on)
    if how not in ("inner", "left_semi", "left_anti"):
        raise ValueError(f"how must be inner/left_semi/left_anti, got {how!r}")
    if how in ("left_semi", "left_anti") and not left_key:
        raise ValueError(
            "left_semi/left_anti need left_key (a unique left column): the "
            "left side explodes into buckets, so existence is decided on "
            "the key set, then applied to the UNEXPLODED left"
        )
    for c, df, side in (
        (left_lo, left, "left"),
        (left_hi, left, "left"),
        (right_lo, right, "right"),
        (right_hi, right, "right"),
    ):
        if c not in df.columns:
            raise ValueError(f"{side} side is missing column {c!r}")
    b = float(bucket)
    if not b > 0:
        raise ValueError(f"bucket must be positive, got {bucket!r}")
    taken = {"_lb", "_rb"} & (set(left.columns) | set(right.columns))
    if taken:
        raise ValueError(
            f"columns {sorted(taken)} are reserved by interval_overlap_join"
        )

    def exploded(df: DataFrame, lo: str, hi: str, col: str) -> DataFrame:
        lo_b = F.floor(F.col(lo) / b)
        hi_b = F.floor(F.col(hi) / b)
        span_ok = (hi_b - lo_b) < F.lit(int(max_buckets_per_interval))
        buckets = F.when(span_ok, F.sequence(lo_b, hi_b)).otherwise(
            F.raise_error(
                F.concat(
                    F.lit("interval_overlap_join: interval spans "),
                    (hi_b - lo_b + 1).cast("string"),
                    F.lit(
                        f" buckets (> {max_buckets_per_interval}); raise `bucket`"
                    ),
                )
            )
        )
        return df.where(
            F.col(lo).isNotNull()
            & F.col(hi).isNotNull()
            & (F.col(hi) >= F.col(lo))
        ).withColumn(col, F.explode(buckets))

    l = exploded(left, left_lo, left_hi, "_lb")
    r = exploded(right, right_lo, right_hi, "_rb")
    cond = l["_lb"] == r["_rb"]
    for k in on:
        cond = cond & (l[k] == r[k])
    cond = (
        cond
        & (l[left_lo] <= r[right_hi])
        & (r[right_lo] <= l[left_hi])
        # keep the pair only in the bucket holding the overlap start
        & (l["_lb"] == F.floor(F.greatest(l[left_lo], r[right_lo]) / b))
    )
    clash = [c for c in right.columns if c in left.columns and c not in on]
    if how == "inner" and clash:
        raise ValueError(
            f"right columns {clash} clash with left names: rename them first"
        )
    if how in ("left_semi", "left_anti"):
        matched = (
            l.join(r, cond, "inner").select(l[left_key].alias("_mk")).distinct()
        )
        return left.join(
            matched, left[left_key] == matched["_mk"], how
        )
    j = l.join(r, cond, "inner")
    out = j.drop("_lb", "_rb")
    for k in on:
        out = out.drop(r[k])
    return out


def interval_overlap_join_oracle_sql(
    left_sql: str,
    right_sql: str,
    left_lo: str,
    left_hi: str,
    right_lo: str,
    right_hi: str,
    on: list[str] | None = None,
    select: str = "*",
) -> str:
    """ANSI twin of :func:`interval_overlap_join` (inner): the direct
    overlap theta-join over the same subqueries — tiny at gate scale,
    which is the point: the bucketed plan must emit exactly these rows."""
    on = list(on or [])
    eq = " AND ".join(f"l.{k} = r.{k}" for k in on)
    pred = f"l.{left_lo} <= r.{right_hi} AND r.{right_lo} <= l.{left_hi}"
    cond = f"{eq} AND {pred}" if eq else pred
    return f"""
SELECT {select}
FROM ({left_sql}) l
JOIN ({right_sql}) r ON {cond}
""".strip()
