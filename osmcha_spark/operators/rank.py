"""Exact global rank / ntile-style sharding WITHOUT a global sort.

The curriculum-ordering primitive: "order the corpus by quality score
and export S equal shards, easiest first". The naive spelling —
``row_number() OVER (ORDER BY score)`` — has an empty PARTITION BY, so
Spark moves EVERY row into a single partition/task: the canonical
100-TB scale killer. ``repartitionByRange`` + ``zipWithIndex`` fixes
the sort but leaves rank assignment partition-imperative (RDD-land,
and an extra driver action for partition offsets).

This operator computes the EXACT global rank as a pure DataFrame plan
with one fact-sized shuffle, via two-level ranking over fixed-width key
buckets (the distributed-rank decomposition every MPP engine uses for
windowed ranks — cf. bucketed histogram rank in the external-sort
literature):

1. bucket  = ``key div bucket_width``             (pure projection)
2. within  = ``row_number() OVER (PARTITION BY bucket ORDER BY key,id)``
   — the ONLY fact-sized shuffle, parallel across buckets;
3. offsets = per-bucket counts (map-side partial agg → bucket-level
   rows), prefix-summed with a single-partition window — safe because
   the frame is #buckets rows, not data-sized — and broadcast-joined
   back;
4. ``g_rank = offset + within`` — exact, duplicate-free, total.

Shards are then the integer split ``(g_rank-1)*S div N`` with N entering
the plan as a broadcast 1-row aggregate (the tfidf_topk lazy-bound
pattern — no driver-side ``count()``). NOTE this is deliberately NOT
SQL's ``NTILE``: NTILE's front-loaded ceil/floor group sizes and this
formula disagree when ``N % S != 0``; the arithmetic form is used on
BOTH engine and oracle sides (q69) because it is dialect-independent.

Skew: a bucket is a window hot key, so ``bucket_width`` bounds the
worst task at ``width × max key frequency`` rows. For a key with known
range, width ≈ range/(10×parallelism) keeps every task small; a single
pathological key value (all rows equal) is inherently rank-dense and
would need a composite key (key, salt) upstream — documented, not
hidden.

Preconditions: ``key_col`` is a NON-NEGATIVE integer (integer ``div``
truncates toward zero, which breaks bucket ordering for negatives);
``id_col`` is unique (the deterministic tiebreak).

Reference counterpart: none — osmcha's only ordering is the CLI's
changeset listing (osmcha/__init__.py); mandated by the
training-pipeline inventory (SURVEY §2.11).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def global_rank(
    df: DataFrame,
    key_col: str,
    id_col: str,
    bucket_width: int = 64,
    n_shards: int | None = None,
    rank_col: str = "g_rank",
    shard_col: str = "shard",
) -> DataFrame:
    """Add ``rank_col`` — the exact 1-based global rank by
    ``(key_col ASC, id_col ASC)`` — and, when ``n_shards`` is given,
    ``shard_col = (rank-1)*n_shards div N`` in [0, n_shards). Lazy: the
    whole computation (including N and the bucket offsets) is one plan;
    building this DataFrame triggers no job."""
    if bucket_width <= 0:
        raise ValueError("bucket_width must be positive")
    bkt = F.expr(f"cast({key_col} as long) div {int(bucket_width)}L")
    bucketed = df.withColumn("_bkt", bkt)

    counts = bucketed.groupBy("_bkt").agg(F.count(F.lit(1)).alias("_cnt"))
    # prefix sum over bucket-level rows only (#buckets, not data-sized)
    off_w = (
        Window.orderBy(F.col("_bkt").asc())
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = counts.select(
        "_bkt",
        F.coalesce(F.sum("_cnt").over(off_w), F.lit(0)).alias("_off"),
    )

    within_w = Window.partitionBy("_bkt").orderBy(
        F.col(key_col).asc(), F.col(id_col).asc()
    )
    ranked = (
        bucketed.join(F.broadcast(offsets), "_bkt")
        .withColumn(rank_col, F.col("_off") + F.row_number().over(within_w))
    )
    if n_shards is None:
        return ranked.drop("_bkt", "_off")
    n_rows = df.agg(F.count(F.lit(1)).alias("__n_rows"))
    return (
        ranked.join(F.broadcast(n_rows))
        .withColumn(
            shard_col,
            F.expr(
                f"(({rank_col} - 1) * {int(n_shards)}L) div __n_rows"
            ).cast("long"),
        )
        .drop("_bkt", "_off", "__n_rows")
    )


def quantile_normalize(
    df: DataFrame,
    group_col: str,
    value_col: str,
    id_col: str,
    scale: int = 1000,
) -> DataFrame:
    """Per-group quantile (percent-rank) normalization to integer
    per-``scale`` units — the move that makes heterogeneous quality
    scores comparable before mixing sources (a length-based score from
    one domain and a classifier score from another share no scale;
    their within-domain ranks do):

        pr = ((rank − 1) · scale) div (n − 1)    (n = 1 → pr = 0)

    with rank = row_number under the deterministic ``(value, id)``
    order (the q144 tiebreak — tied values get DISTINCT consecutive
    ranks cut by id, so the output is a pure integer function of the
    input in both engines; use the rational (rank−1, n−1) columns for
    tie-aware variants at the edge). pr spans exactly [0, scale] with
    min → 0 and max → scale.

    Scale shape: ONE group-hash window provides rank and n (single
    Exchange + sort, the trimmed_agg discipline); output is a
    projection of it — no second pass, no join. For a single global
    group use global_rank's two-phase bucket ranking instead (a
    one-group window serializes; documented there).
    """
    w = Window.partitionBy(group_col).orderBy(
        F.col(value_col), F.col(id_col))
    wc = Window.partitionBy(group_col)
    s = int(scale)
    return df.select(
        group_col, id_col, value_col,
        F.row_number().over(w).cast("long").alias("rnk"),
        F.count(F.lit(1)).over(wc).cast("long").alias("n"),
    ).select(
        group_col, id_col, value_col, "rnk", "n",
        F.when(F.col("n") == 1, F.lit(0).cast("long")).otherwise(
            F.expr(f"((rnk - 1) * {s}) div (n - 1)")
        ).alias("pr"),
    )
