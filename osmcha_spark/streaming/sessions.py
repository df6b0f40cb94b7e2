"""Streaming session windows: the incremental twin of
operators/events.py:sessionize (SURVEY §2.8 / §2.10 R2).

``session_window`` + watermark in append mode is Structured Streaming's
native stateful session operator: per-key open sessions live in the state
store, merge as events arrive, and are EMITTED (and evicted) once the
watermark passes their close instant (last event + gap). That gives the
production property batch sessionization can't: a replication-style
endless event feed sessionizes with bounded state — state size tracks
OPEN sessions only, not history.

Emission semantics (what the q45 gate pins): with watermark delay 0, a
session is emitted once a later micro-batch raises the watermark past
``last + gap``. Sessions still open when the stream drains are NOT
emitted — they are genuinely not closed yet; the q45 harness appends a
far-future sentinel file as its own final micro-batch so every real
session closes deterministically, and the oracle applies the same
closed-before-the-last-event filter.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from osmcha_spark.operators.events import session_aggs


def sessionized_stream(
    events: DataFrame,
    key: str = "user_id",
    ts_col: str = "ts",
    gap: str = "10 minutes",
    delay: str = "0 seconds",
) -> DataFrame:
    """Streaming gap sessions per key — same output schema as the batch
    :func:`~osmcha_spark.operators.events.sessionize`."""
    return (
        events.withWatermark(ts_col, delay)
        .groupBy(F.col(key), F.session_window(F.col(ts_col), gap))
        .agg(*session_aggs(ts_col))
        .drop("session_window")
    )


def run_session_stream(
    sessions: DataFrame,
    out_dir: str,
    checkpoint_dir: str,
) -> StreamingQuery:
    """Sink emitted (watermark-closed) sessions to parquet, checkpointed;
    AvailableNow drains the input directory then stops."""
    return (
        sessions.writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
