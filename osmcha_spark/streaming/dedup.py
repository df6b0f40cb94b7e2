"""Streaming exact deduplication with watermark-bounded state.

The incremental twin of operators/dedup.py:exact_dedup (SURVEY §2.8 /
§2.11): an endless feed (minutely replication, a training-corpus
ingest queue) deduplicated with BOUNDED state — the property batch
``distinct`` can't give. ``dropDuplicates`` over the key + event-time
column under a watermark keeps per-row state only until the watermark
passes the row's event time, so state tracks the delay window, not
history.

Emission semantics (pinned by tests/test_streaming.py::
test_dedup_stream_boundary, the q59 discipline):

- a row is emitted iff it is the FIRST arrival of its (keys, ts) AND it
  is not late — the late filter drops ``ts <= wm`` and keeps
  ``ts > wm``, where wm is the watermark in force DURING its
  micro-batch (max seen event time at the end of the previous batch,
  minus the delay);
- an exact replay while the original's state is live is dropped as a
  duplicate; a replay after eviction is necessarily ``ts <= wm`` and is
  dropped as late — so under EXACT-ROW replays (same event time) the
  emitted set is exactly ``distinct(non-late arrivals)``, which is what
  the q73 oracle states in SQL.

The same operator family also covers at-least-once source recovery:
replayed files after a sink failure re-offer rows whose state is still
live, and the dedup squashes them — demonstrated by the checkpoint
restart test for the replication stream (tools/job_dedup_pipeline.py).

Note the contrast with ``dropDuplicatesWithinWatermark`` (Spark 3.5+),
which dedups on the keys ALONE and re-emits a key after eviction; this
module includes the event time in the key because corpus replays carry
the original timestamp, making "same row, same instant" the right
identity — and making the emitted set batch-reproducible, hence
oracle-checkable.

Scale: state is a hash map keyed by (keys, ts) over the delay window;
at 100 TB/day the window size — not history — bounds memory, and the
stream stays partitioned by the state key (one shuffle, the stateful
exchange). Reference counterpart: none (osmcha fetches each replication
file once, osmcha/changeset.py:60-76); engine-mandated.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql.streaming import StreamingQuery


def deduped_stream(
    events: DataFrame,
    keys: tuple[str, ...] = ("user_id",),
    ts_col: str = "ts",
    delay: str = "0 seconds",
) -> DataFrame:
    """First-arrival rows of the stream, identity = (*keys, ts_col),
    state bounded by the watermark ``delay``."""
    return events.withWatermark(ts_col, delay).dropDuplicates(
        [*keys, ts_col]
    )


def run_dedup_stream(
    deduped: DataFrame,
    out_dir: str,
    checkpoint_dir: str,
) -> StreamingQuery:
    """Sink first-arrivals to parquet, checkpointed; AvailableNow drains
    the input directory then stops."""
    return (
        deduped.writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )


def deduped_stream_ttl(
    events: DataFrame,
    keys: tuple[str, ...] = ("user_id",),
    ts_col: str = "ts",
    ttl: str = "1 hour",
) -> DataFrame:
    """Key-ONLY streaming dedup with TTL re-emission —
    ``dropDuplicatesWithinWatermark`` (Spark 3.5+), the idempotency-key
    shape this module's header contrasts with :func:`deduped_stream`:
    identity is the key alone, so a retried request with a FRESH
    timestamp still squashes, and a key seen again after its state is
    evicted (watermark passed its last event time + ttl) legitimately
    RE-EMITS — retention-bounded idempotency, not exactly-once replay.

    Because re-emission depends on when the watermark crossed the
    eviction boundary, the emitted set is a function of BATCH
    BOUNDARIES, not of the data alone — so there is deliberately no
    SQL oracle (the q24 rule); the deterministic four-batch harness in
    tests/test_streaming.py pins the MEASURED semantics on this build:

    - a duplicate inside the window drops even with a DIFFERENT ts
      (key-only identity);
    - eviction is END-of-batch: a key re-emits only in the batch AFTER
      the watermark passed its expiry, never in the same batch;
    - the operator does NOT late-filter — a sub-watermark FIRST
      arrival still emits (it only manages dedup state; compose with
      :func:`deduped_stream`'s (key, ts) identity when the q59 late
      gate is required).

    State: one entry per live key — bounded by keys-per-window, not
    history."""
    return events.withWatermark(ts_col, ttl).dropDuplicatesWithinWatermark(
        list(keys)
    )
