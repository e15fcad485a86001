"""Structured Streaming sketch aggregation.

Two shapes, matching how DDSketch is used on live data:

1. **Continuous per-key sketches** — :func:`sketch_stream_state`:
   ``applyInPandasWithState`` keeps one flat sketch state per group
   (the reference's merge semantics applied incrementally per micro-batch)
   and emits updated quantiles every trigger.  State is the same flat
   column layout the batch engine uses, so it is bounded (bins array ≈ KBs)
   and watermark-free keys never grow it.

2. **Windowed quantiles** — :func:`windowed_sketch_cells` +
   :func:`finalize_cells_batch`: the cells trick from the batch engine
   applied to streams.  ``groupBy(window(ts), keys, sgn, k).agg(sum(w))``
   is a *native* Spark streaming stateful aggregation — watermarks, late
   data, and state eviction are Spark's own, with nothing custom in the
   loop — and the tiny per-window cell sets are finalized to quantiles in
   ``foreachBatch`` (or any downstream batch hop).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window, functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    DoubleType,
    StringType,
    StructField,
    StructType,
)

from .agg import STATE_FIELDS, STATE_COLS, _by_fields, quantile_label
from .sketch import Sketch, SketchConfig

__all__ = [
    "sketch_stream_state",
    "windowed_sketch_cells",
    "sessionize",
    "finalize_cells_batch",
]

_STATE_SCHEMA = StructType(STATE_FIELDS)


def sketch_stream_state(
    sdf: DataFrame,
    value_col: str,
    by: list[str],
    cfg: SketchConfig | None = None,
    qs: list[float] = (0.5, 0.95, 0.99),
) -> DataFrame:
    """Per-key running sketch over a stream; emits one updated row per key
    per micro-batch: ``by... | count sum min max | p...``."""
    cfg = cfg or SketchConfig()
    q_cols = [quantile_label(q) for q in qs]
    out_schema = StructType(
        _by_fields(sdf, by)
        + [
            StructField("count", DoubleType()),
            StructField("sum", DoubleType()),
            StructField("min", DoubleType()),
            StructField("max", DoubleType()),
        ]
        + [StructField(c, DoubleType()) for c in q_cols]
    )

    def update(key, pdfs, state: GroupState):
        if state.exists:
            row = dict(zip(STATE_COLS, state.get))
            if row["gamma"] != cfg.gamma:
                # same guard the batch merge applies (agg._merge_fn): a
                # restart with a changed alpha must not reinterpret old bins
                raise ValueError(
                    "checkpointed sketch state has gamma "
                    f"{row['gamma']!r}, current config {cfg.gamma!r}"
                )
            sk = Sketch.from_state(cfg, row)
        else:
            sk = Sketch.empty(cfg)
        for pdf in pdfs:
            vals = pdf[value_col].dropna().to_numpy(np.float64)
            if len(vals):
                sk = sk.merge(Sketch.from_values(vals, cfg))
        st = sk.to_state()
        state.update(tuple(
            st[c] if c not in ("pos_bins", "neg_bins") else st[c].tolist()
            for c in STATE_COLS
        ))
        rec = dict(zip(by, key))
        rec.update(count=sk.count, sum=sk.sum, min=sk.min, max=sk.max)
        for q, c in zip(qs, q_cols):
            rec[c] = sk.quantile(q)
        yield pd.DataFrame([rec], columns=[f.name for f in out_schema.fields])

    return (
        sdf.select(*by, value_col)
        .groupBy(*by)
        .applyInPandasWithState(
            update,
            outputStructType=out_schema,
            stateStructType=_STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


def windowed_sketch_cells(
    sdf: DataFrame,
    ts_col: str,
    value_col: str,
    by: list[str],
    window_duration: str = "1 minute",
    watermark: str = "2 minutes",
    cfg: SketchConfig | None = None,
) -> DataFrame:
    """Streaming bucket-cell aggregation per (event-time window, keys).

    Pure built-in streaming operators: watermark → window groupBy → sum.
    Late data past the watermark is dropped by Spark's own state manager.
    Output (append mode, on window close): one row per live bucket.
    """
    cfg = cfg or SketchConfig()
    from .agg import keyed_projection

    keyed = keyed_projection(
        sdf.withWatermark(ts_col, watermark),
        value_col,
        by,
        cfg,
        extra_cols=[ts_col],
    )
    return keyed.groupBy(
        F.window(ts_col, window_duration).alias("win"), *by, "_sgn", "_k"
    ).agg(
        F.sum("_w").alias("_c"),
        F.sum(F.col("_v") * F.col("_w")).alias("_s"),
        F.min("_v").alias("_mn"),
        F.max("_v").alias("_mx"),
        F.count(F.lit(1)).alias("_rc"),
    )


def sessionize(
    df: DataFrame,
    ts_col: str,
    by: list[str],
    gap: str = "30 minutes",
) -> DataFrame:
    """Row-level sessionization (batch): adds ``session_start`` — the first
    event time of the row's session, where a session is a maximal run of
    per-key events with inter-event gaps strictly below ``gap`` (the same
    boundary rule as Spark's ``session_window``: an event exactly ``gap``
    after the last one starts a new session).

    Why not ``F.session_window``?  Native session windows merge per *full
    grouping key*, so they cannot host the cells trick — adding the bucket
    key to the groupBy would fragment a session into per-bucket pseudo-
    sessions.  Row-level assignment (gaps-and-islands: LAG + running sum,
    two windows over the same per-key sort) composes with any downstream
    aggregation: ``quantile_sketch(sessionize(df, ...), v,
    by=[key, "session_start"])`` stays fully JVM.  For *streaming*
    per-session sketches use :func:`sketch_stream_state` (keyed custom
    state is the streaming-native sessionization vehicle); this helper is
    the batch/replay twin the correctness gate can oracle-check.

    Scale: the two windows sort rows within each key partition — the
    natural requirement of sessionization; keys are users/devices, so
    partitions stay bounded.
    """
    w = Window.partitionBy(*by).orderBy(ts_col)
    prev = F.lag(ts_col).over(w)
    gap_expr = F.expr(f"INTERVAL {gap}")
    new_s = F.when(
        prev.isNull() | (F.col(ts_col) >= prev + gap_expr), 1
    ).otherwise(0)
    cum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    out = df.withColumn("_sid", F.sum(new_s).over(cum))
    sw = Window.partitionBy(*by, "_sid")
    return out.withColumn("session_start", F.min(ts_col).over(sw)).drop("_sid")


def finalize_cells_batch(
    cells_batch: DataFrame,
    qs: list[float],
    by: list[str],
    cfg: SketchConfig | None = None,
) -> DataFrame:
    """Batch finalizer for the windowed cells (use inside ``foreachBatch``):
    assembles per-(window, keys) quantiles from the emitted cells."""
    from .agg import finalize_cells

    cfg = cfg or SketchConfig()
    return finalize_cells(cells_batch, list(qs), ["win"] + list(by), cfg)
