"""2-D skyline (Pareto frontier) — maximal points under componentwise
dominance, the "best tradeoff set" primitive (Börzsönyi et al., "The
Skyline Operator", ICDE'01): a point survives iff no other point is ≥ in
BOTH dimensions and > in at least one.

The classic 2-D algorithm sorts by x descending and keeps every point
whose y exceeds the running maximum — correct, but the global sort +
running max is a single-partition window, the same scale-killer the
interval sweep (operators/events.py:concurrency_curve) avoids. This
module reuses that hierarchical decomposition:

1. per-x reduce: within equal x only the max-y rows can survive (one
   map-side-combined groupBy);
2. LOCAL prefix max of ymax within coarse x-range buckets (window
   partitioned by the bucket — parallel across buckets);
3. bucket maxima → EXCLUSIVE prefix max over buckets in descending
   order (a deliberately tiny one-row-per-bucket window), broadcast
   back. ``prev_max`` = max y among all points with strictly greater x;
   survive iff ``prev_max`` is NULL or < ymax.

Bucketing uses FLOOR division ``(x − pmod(x, B)) div B`` — Spark's
``div`` truncates toward zero, which is non-monotone across negative x
and would break "higher bucket ⇔ strictly greater x".

Dominance semantics at ties (pinned by pytest): equal points are NOT
dominated by each other (strictness must come from somewhere), a point
with equal x and lower y IS dominated, a point with equal y and lower x
IS dominated.

Reference counterpart: none (osmcha has no analytic surface); mandated
by the training-pipeline inventory (SURVEY §2.11) — e.g. the
quality-vs-cost corpus curation frontier.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def skyline_2d(df: DataFrame, x_col: str, y_col: str,
               bucket: int = 1024) -> DataFrame:
    """All rows of ``df`` whose (x, y) is Pareto-maximal (maximize both).

    Returns the original rows (duplicates of a surviving point all
    survive). ``bucket`` is the x-range width of the level-1 window
    partitions; correctness is bucket-invariant (pinned by pytest),
    only the parallelism changes.
    """
    x, y = F.col(x_col), F.col(y_col)
    byx = df.groupBy(x_col).agg(F.max(y_col).alias("_ymax"))
    bkt = F.expr(
        f"({x_col} - pmod({x_col}, {int(bucket)}L)) div {int(bucket)}L"
    )
    wloc = (
        Window.partitionBy("_bkt")
        .orderBy(F.col(x_col).desc())
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    loc = byx.withColumn("_bkt", bkt).withColumn(
        "_loc_prev", F.max("_ymax").over(wloc)
    )
    woff = Window.orderBy(F.col("_bkt").desc()).rowsBetween(
        Window.unboundedPreceding, -1
    )
    offs = (
        loc.groupBy("_bkt")
        .agg(F.max("_ymax").alias("_btot"))
        .withColumn("_off_prev", F.max("_btot").over(woff))
        .select("_bkt", "_off_prev")
    )
    frontier = (
        loc.join(F.broadcast(offs), "_bkt")
        .withColumn(
            # greatest() skips NULLs; NULL only when both are (first row
            # of the first bucket — nothing has greater x)
            "_prev", F.greatest(F.col("_loc_prev"), F.col("_off_prev")),
        )
        .where(F.col("_prev").isNull() | (F.col("_prev") < F.col("_ymax")))
        .select(F.col(x_col).alias("_sk_x"), F.col("_ymax").alias("_sk_y"))
    )
    return df.join(
        frontier,
        (x == F.col("_sk_x")) & (y == F.col("_sk_y")),
    ).select(*[df[c] for c in df.columns])
