"""Interval (range-containment) join: points ⋈ intervals on
``start <= ts <= end``.

The reference has no interval operator (its only temporal logic is the
per-changeset ``created_at`` passthrough, osmcha/changeset.py:360-380);
a production event/corpus pipeline needs one constantly — "which
maintenance windows / labeling campaigns / replication outages contain
this event". Spark has no native interval join either: a bare
``ON p.ts BETWEEN i.start AND i.end`` predicate has no equi-key, so
Catalyst plans a BroadcastNestedLoopJoin — O(|points|·|intervals|)
comparisons, a scale killer the moment the interval side outgrows a
broadcast.

Scale shape (the classic fixed-width bucketing rewrite): pick a bucket
width ``w`` of the same order as the LONGEST interval, explode each
interval into the ``floor(start/w)..floor(end/w)`` buckets it covers
(≤ len/w + 1 rows, so ~2 when w ≈ max length), tag each point with its
single bucket ``floor(ts/w)``, equi-join on the bucket, and re-check the
exact predicate. This is EXACT, not approximate: any interval containing
a point covers the point's instant, hence the point's bucket, so every
qualifying pair meets in exactly ONE bucket (the point's) — exhaustive
and duplicate-free by construction, no ``distinct`` needed. The plan is
one shuffled equi-join (SortMergeJoin / broadcast when the exploded
interval side is dim-sized) — the 100-TB shape. Hot instants skew single
buckets; AQE's skew-join split handles that without salting because the
join key is already fine-grained.

Robustness at scale: a pathological interval (open-ended sentinel start,
a config row spanning years) would explode into millions of bucket rows
— Spark's ``sequence`` hard-fails past 2^31 elements. The operator
therefore clamps every interval's bucket range to the points' actual
[min, max] bucket, computed as a LAZY 1-row aggregate broadcast into the
plan (no driver-side action — the same in-plan-bound pattern as
``tfidf_topk``'s corpus size). Clamping is exact: buckets holding no
points can't produce pairs. Fan-out per interval is thus bounded by the
points' real span / w, and intervals wholly outside the point range are
dropped before the explode.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def interval_join(
    points: DataFrame,
    intervals: DataFrame,
    ts_col: str = "ts_us",
    start_col: str = "start_us",
    end_col: str = "end_us",
    bucket_width: int = 300_000_000,
    broadcast_intervals: bool = False,
) -> DataFrame:
    """Inner-join each point row to every interval row whose
    ``[start_col, end_col]`` (both ends INCLUSIVE) contains its
    ``ts_col``. All three columns are integers on one axis (the engine
    uses epoch microseconds; any monotone integer encoding works).

    ``bucket_width`` trades explode fan-out against bucket selectivity:
    each interval emits ``(end-start)/w + 1`` candidate rows, and each
    bucket's join partition holds ~``w``-worth of points — set it near
    the p99 interval length (default 300 s in µs). Correctness never
    depends on it; only the candidate count does.

    ``broadcast_intervals`` hints the exploded interval side: when the
    interval table is dim-sized, this turns the plan into a map-side
    hash join with ZERO shuffle of the (fact-sized) point side.

    Output: all point columns, then all interval columns; callers
    disambiguate names via projection before the join (the engine keeps
    this operator schema-transparent rather than forcing a prefix).
    """
    if bucket_width <= 0:
        raise ValueError(f"bucket_width must be positive: {bucket_width}")
    w = int(bucket_width)

    def _bucket(col: str):
        # Integer `div`, not `/`: double division of epoch-µs values can
        # round the quotient at exact bucket boundaries. Truncating
        # division is monotone, so bucket(ts) ∈ [bucket(start),
        # bucket(end)] holds for any contained ts, signs included.
        return F.expr(f"`{col}` div {w}")

    # Lazy points-range bounds: one row, broadcast — clamps runaway
    # interval fan-out without an eager driver action. On an empty point
    # side lo/hi are NULL → sequence(NULL, …) is NULL → explode yields
    # nothing, which is the right answer.
    # One-row broadcast build side (the tfidf_topk lazy-bound pattern):
    # this IS a BroadcastNestedLoopJoin node, but with a single-row build
    # it costs one comparison per interval — the O(n·m) hazard the
    # operator exists to avoid is a nested loop between the two FACT
    # sides, which the plan test pins onto the bucket equi-join instead.
    bounds = points.agg(
        F.min(_bucket(ts_col)).alias("_lo"),
        F.max(_bucket(ts_col)).alias("_hi"),
    )
    iv = (
        intervals.crossJoin(F.broadcast(bounds))
        # drop intervals wholly outside the point range BEFORE the
        # explode — also guards sequence()'s descending-step surprise
        # when the clamped start would exceed the clamped end
        .where(
            (_bucket(end_col) >= F.col("_lo"))
            & (_bucket(start_col) <= F.col("_hi"))
        )
        .withColumn(
            "_bucket",
            F.explode(
                F.sequence(
                    F.greatest(_bucket(start_col), F.col("_lo")),
                    F.least(_bucket(end_col), F.col("_hi")),
                )
            ),
        )
        .drop("_lo", "_hi")
    )
    if broadcast_intervals:
        iv = F.broadcast(iv)
    pt = points.withColumn("_bucket", _bucket(ts_col))
    return (
        pt.join(iv, on="_bucket")
        .where(
            (F.col(ts_col) >= F.col(start_col))
            & (F.col(ts_col) <= F.col(end_col))
        )
        .drop("_bucket")
    )
