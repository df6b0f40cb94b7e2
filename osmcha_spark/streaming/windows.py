"""Streaming tumbling-window aggregation: the incremental twin of the
batch bucket aggregations (events.py gap_fill/TWAP bucketing) and the
most common streaming operator there is — per-(key, fixed window)
counts/sums maintained in the state store and emitted in append mode
once the watermark passes the window end.

Bounded state is the point: the store holds only windows the watermark
has not yet closed (open windows × keys), never history — the property
that lets a replication-style endless feed maintain per-user minutely /
hourly rollups forever. Cross-batch accumulation is the semantics the
q112 gate pins: one window receives rows from MULTIPLE micro-batches
and still emits once, with the total.

Emission semantics (same discipline as sessions.py): with watermark
delay d, a window emits when the watermark (max event time seen minus
d) passes its END. Windows still open when the stream drains are NOT
emitted; the q112 harness appends a far-future sentinel micro-batch so
every real window closes deterministically, and the sentinel's own
window never does (nothing later ever raises the watermark past it).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def tumbling_agg(
    events: DataFrame,
    key: str = "user_id",
    ts_col: str = "ts",
    width: str = "6 hours",
    cents_col: str = "cents",
    delay: str = "0 seconds",
) -> DataFrame:
    """Per-(key, tumbling window) count + integer-cents sum, append mode.
    Output: (key, win_start_us, n_events, cents) — window bounds leave
    as epoch micros so the q112 oracle's ``div``-bucket SQL hashes
    identically."""
    return (
        events.withWatermark(ts_col, delay)
        .groupBy(F.col(key), F.window(F.col(ts_col), width))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col(cents_col)).alias("cents"),
        )
        .select(
            key,
            F.unix_micros(F.col("window.start")).alias("win_start_us"),
            "n_events",
            "cents",
        )
    )


def tumbling_distinct(
    events: DataFrame,
    key: str = "user_id",
    ts_col: str = "ts",
    width: str = "6 hours",
    delay: str = "0 seconds",
) -> DataFrame:
    """Distinct-``key`` count per tumbling window — unique visitors per
    hour — as a CHAIN of two stateful operators in one streaming query:
    event-time dedup on (key, window) feeding a windowed count. Spark
    only allows stateful chaining when every stage is event-time driven
    in append mode (the dedup emits rows that still carry the window's
    event time for the downstream watermark); this operator exists
    partly to pin that the chain survives version bumps.

    State is bounded at BOTH stages: the dedup store holds (key, open
    window) pairs, the agg store open windows — each evicted as the
    watermark passes the window end. Output:
    ``(win_start_us, n_distinct)``."""
    return (
        events.withWatermark(ts_col, delay)
        .withColumn("__win", F.window(F.col(ts_col), width))
        .dropDuplicates([key, "__win"])
        .groupBy("__win")
        .agg(F.count(F.lit(1)).alias("n_distinct"))
        .select(
            F.unix_micros(F.col("__win.start")).alias("win_start_us"),
            "n_distinct",
        )
    )


def sliding_agg(
    events: DataFrame,
    key: str = "user_id",
    ts_col: str = "ts",
    width: str = "6 hours",
    slide: str = "2 hours",
    cents_col: str = "cents",
    delay: str = "0 seconds",
) -> DataFrame:
    """Per-(key, SLIDING window) count + integer-cents sum, append mode
    — tumbling_agg's overlapping generalization (the moving-average /
    trailing-rate shape: every event lands in width/slide windows, so
    each emitted row is a trailing ``width`` rollup refreshed every
    ``slide``). Spark assigns the window set natively (``F.window``
    with a slide): an event at t belongs to the windows starting at
    ``floor(t/slide)·slide − j·slide`` for j in 0..width/slide−1 —
    exactly the set the q163 oracle rebuilds with a range explode.

    State and emission follow tumbling_agg: a window emits once, when
    the watermark passes its END, with the cross-batch total; the
    store holds open (key, window) pairs — sliding multiplies that by
    width/slide, the price of overlap (state is still bounded by the
    watermark horizon, never history). Output: ``(key, win_start_us,
    n_events, cents)`` with epoch-micro bounds, q112's hashing rule."""
    return (
        events.withWatermark(ts_col, delay)
        .groupBy(F.col(key), F.window(F.col(ts_col), width, slide))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col(cents_col)).alias("cents"),
        )
        .select(
            key,
            F.unix_micros(F.col("window.start")).alias("win_start_us"),
            "n_events",
            "cents",
        )
    )
