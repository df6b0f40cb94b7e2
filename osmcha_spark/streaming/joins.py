"""Stream-stream interval join — correlating two live feeds.

The last big Structured Streaming surface after stateful aggregation
(stateful.py), sessions (sessions.py), and dedup (dedup.py): join two
UNBOUNDED streams on a key plus an event-time interval ("purchases
within an hour of the view", "replication edits within 30 min of a
flagged changeset"). Batch joins can't do this incrementally, and an
unconstrained stream-stream join would need infinite state — the
event-time bound is what makes state finite: Spark buffers each side
only until the other side's watermark passes the interval's reach,
then evicts (the state-cleanup policy derives from the join condition;
see SPARK-26154 for the semantics this relies on).

Both sides MUST carry watermarks and the condition MUST bound the time
difference in both directions — this module's API makes those
requirements impossible to forget (they are silent unbounded-state
bugs when hand-spelling the join).

Emission: append-mode, a match is emitted in the micro-batch where
both rows are present. With on-time data the emitted set equals the
batch join — which is exactly what the q78 oracle states; the
late/evicted boundary behaviors are already pinned for this engine's
watermark handling by q59 (sessions) and q73 (dedup).

Scale: state per side ≈ rate × (delay + interval width), keyed and
checkpointed like all stateful operators here; the join itself is the
stateful-exchange shuffle on the key. Reference counterpart: none
(osmcha correlates nothing across feeds); engine-mandated
(SURVEY §2.11).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def interval_stream_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    upper: str = "1 hour",
    left_delay: str = "0 seconds",
    right_delay: str = "0 seconds",
    how: str = "inner",
) -> DataFrame:
    """Join two streams on ``key`` with
    ``left_ts <= right_ts <= left_ts + upper`` (both ends inclusive).

    ``left``/``right`` column names must be disjoint apart from ``key``
    and the ts columns; the right key/ts are suffixed ``_r`` in the
    output to keep the join unambiguous.

    ``how='left_outer'`` is the SPARK-26154 unmatched-side regime (the
    "views with no purchase" production shape): a left row that finds no
    right match is emitted WITH NULL right columns — but only once the
    watermark passes ``left_ts + upper``, the instant a future match
    becomes impossible (emitting earlier could contradict a
    still-to-arrive right row; this is why outer results trail the
    watermark by design, and why a drain harness must push the watermark
    past the last left row's reach before reading the emitted set —
    q125 / tests/test_streaming.py pin the timing). State stays exactly
    as finite as the inner join's: the null emission happens at the same
    instant eviction does.

    ``how='full_outer'`` adds the symmetric regime (q182): an unmatched
    RIGHT row emits WITH NULL left columns once the watermark passes its
    own eviction point — the interval implies ``left_ts`` within
    ``[right_ts - upper, right_ts]``, so a right row's future-match
    window closes when the watermark passes ``right_ts`` (one ``upper``
    EARLIER than the left side's ``left_ts + upper`` release: the two
    null streams drain at different watermarks, which is why drain
    harnesses push sentinels on BOTH inputs). Drained set equals the
    batch FULL OUTER interval join; the state bound is unchanged.
    """
    l = left.withWatermark(left_ts, left_delay)
    r = right.withWatermark(right_ts, right_delay)
    r = r.select(
        F.col(key).alias(f"{key}_r"),
        F.col(right_ts).alias(f"{right_ts}_r"),
        *[c for c in right.columns if c not in (key, right_ts)],
    )
    cond = (
        (l[key] == r[f"{key}_r"])
        & (r[f"{right_ts}_r"] >= l[left_ts])
        & (r[f"{right_ts}_r"] <= l[left_ts] + F.expr(f"INTERVAL {upper}"))
    )
    return l.join(r, cond, how)


def run_stream_join(
    joined: DataFrame,
    out_dir: str,
    checkpoint_dir: str,
):
    """Sink emitted matches to parquet, checkpointed; AvailableNow
    drains both inputs then stops."""
    return (
        joined.writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )


def enrich_stream(
    stream: DataFrame,
    dim: DataFrame,
    key: str,
    payload_cols: tuple[str, ...],
    how: str = "inner",
) -> DataFrame:
    """Stream-static enrichment join — every micro-batch joins against a
    BROADCAST static dimension (users, customers, config): the standard
    "decorate the feed" step before stateful logic.

    Unlike the stream-stream join above this is STATELESS — no
    watermark, no buffering, nothing to evict: the static side is
    re-planned per micro-batch (for file-backed dims that means a
    slowly-changing dim is picked up on refresh without restarting the
    query) and the broadcast hint keeps the per-batch join a map-side
    hash probe instead of shuffling the feed. At production rates the
    feed never repartitions; the dim must fit the broadcast budget —
    for fact-sized dims use the stateful as-of machinery instead.

    ``how`` left_outer keeps unmatched feed rows (NULL payload);
    inner drops them.
    """
    return stream.join(
        F.broadcast(dim.select(key, *payload_cols)), key, how
    )



def anti_stream_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    upper: str = "1 hour",
    left_delay: str = "0 seconds",
    right_delay: str = "0 seconds",
) -> DataFrame:
    """Stream-stream LEFT ANTI interval join — "views with NO purchase
    within ``upper``", the alerting/abandonment production shape.
    Spark's streaming joiner supports leftOuter and leftSemi but NOT
    leftAnti, so this is the standard composition: the left-outer
    interval join (:func:`interval_stream_join`) followed by a
    stateless IS NULL filter on the right key, projecting back to the
    left columns. Emission timing is inherited from the outer join —
    an unmatched left row appears exactly when the watermark passes
    ``left_ts + upper`` (the instant a match becomes impossible), so
    the anti result is never retracted; a matched row simply never
    appears. Same bounded state as the inner join; the filter adds
    none."""
    out = interval_stream_join(
        left, right, key=key, left_ts=left_ts, right_ts=right_ts,
        upper=upper, left_delay=left_delay, right_delay=right_delay,
        how="left_outer",
    )
    return out.where(F.col(f"{key}_r").isNull()).select(
        *[F.col(c) for c in left.columns]
    )
