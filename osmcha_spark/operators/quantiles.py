"""Exact order statistics without a global sort — two-phase histogram
refinement (the distributed selection algorithm: Blum et al. selection
generalized to one histogram pass + one bucket-local pass).

``percentile_approx`` trades accuracy for one pass; a global
``orderBy().limit()`` sorts the world. This operator returns EXACT
k-th order statistics with two scans and no global sort:

1. histogram pass: count rows per fixed-width value bucket (map-side
   combined groupBy — the only fact-sized shuffle);
2. a TINY cumulative pass over the bucket counts (one row per
   non-empty bucket) locates, for every requested rank, the bucket
   holding it and the rank's offset within that bucket;
3. refinement pass: only the located buckets' rows are re-read,
   row-numbered per bucket by value (window partitioned by bucket —
   never global), and the row at the in-bucket offset is the answer.

Ranks come from ppm fractions resolved IN-PLAN against a broadcast
1-row count (``rank = ceil(p·n / 10^6)`` in pure int64), so building
the DataFrame triggers no job (the VERDICT r2 lazy-bounds discipline).

Exactness under duplicates: ties within a bucket get arbitrary row
numbers, but every tie carries the same value, so the value at any
offset is deterministic — engine and oracle agree even though their
tie orders differ.

Scale: bucket width trades pass-2 size (#non-empty buckets) against
pass-3 size (widest bucket). Skew = one very hot value: its bucket is
large, but pass 3 only sorts THAT bucket, and only when a rank lands
in it. Reference counterpart: none; SURVEY §2.11 engine inventory
(q46 is the flat exact-quantile twin this replaces at scale).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def order_statistics(df: DataFrame, value_col: str, p_ppms: list[int],
                     bucket: int = 100) -> DataFrame:
    """(p_ppm, rank, value): the exact ceil(p·n/10^6)-th smallest value
    of ``value_col`` (int64) for each requested ppm fraction."""
    vals = df.select(F.col(value_col).cast("long").alias("v")).withColumn(
        # floor division (pmod keeps bucket order monotone for negatives)
        "bkt", F.expr(f"(v - pmod(v, {int(bucket)}L)) div {int(bucket)}L")
    )
    histo = vals.groupBy("bkt").agg(F.count(F.lit(1)).alias("cnt"))
    wb = Window.orderBy("bkt").rowsBetween(Window.unboundedPreceding, 0)
    cum = (
        histo.withColumn("cum", F.sum("cnt").over(wb))
        .withColumn("cum_prev", F.col("cum") - F.col("cnt"))
        .select("bkt", "cum", "cum_prev")
    )
    n_row = df.agg(F.count(F.lit(1)).alias("__n"))
    ranks = n_row.select(
        F.explode(
            F.array(*[F.lit(int(p)).cast("long") for p in p_ppms])
        ).alias("p_ppm"),
        "__n",
    ).select(
        "p_ppm",
        F.expr("(p_ppm * __n + 999999) div 1000000").alias("rank"),
    )
    located = (
        ranks.join(
            F.broadcast(cum),
            (F.col("cum_prev") < F.col("rank"))
            & (F.col("rank") <= F.col("cum")),
        )
        .select(
            "p_ppm", "rank",
            F.col("bkt").alias("_lb"),
            (F.col("rank") - F.col("cum_prev")).alias("_loff"),
        )
    )
    wv = Window.partitionBy("bkt").orderBy("v")
    picked = vals.join(
        F.broadcast(located.select(F.col("_lb").alias("bkt")).distinct()),
        "bkt",
    ).withColumn("rn", F.row_number().over(wv))
    return picked.join(
        F.broadcast(located),
        (picked["bkt"] == F.col("_lb")) & (picked["rn"] == F.col("_loff")),
    ).select("p_ppm", "rank", F.col("v").alias("value"))


def grouped_order_statistics(df: DataFrame, group_col: str,
                             value_col: str, p_ppms: list[int],
                             bucket: int = 100) -> DataFrame:
    """(group, p_ppm, rank, value): :func:`order_statistics` per group —
    exact per-group percentiles with NO per-group sort (the usual
    spelling windows row_number over every group's full contents; this
    sorts only the located buckets of each group).

    Same three phases, group-qualified: histogram per (group, bucket);
    cumulative locate per group (window partitioned by group — one row
    per non-empty (group, bucket), bounded); refinement window
    partitioned by (group, bucket). Per-group ranks resolve in-plan
    from each group's own count. All shuffles share the group key.
    """
    g = F.col(group_col)
    vals = df.select(
        g.alias("grp"), F.col(value_col).cast("long").alias("v")
    ).withColumn(
        "bkt", F.expr(f"(v - pmod(v, {int(bucket)}L)) div {int(bucket)}L")
    )
    histo = vals.groupBy("grp", "bkt").agg(F.count(F.lit(1)).alias("cnt"))
    wb = (
        Window.partitionBy("grp")
        .orderBy("bkt")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    cum = (
        histo.withColumn("cum", F.sum("cnt").over(wb))
        .withColumn("cum_prev", F.col("cum") - F.col("cnt"))
        .select("grp", "bkt", "cum", "cum_prev")
    )
    counts = df.groupBy(g.alias("grp")).agg(F.count(F.lit(1)).alias("__n"))
    ranks = counts.select(
        "grp",
        F.explode(
            F.array(*[F.lit(int(p)).cast("long") for p in p_ppms])
        ).alias("p_ppm"),
        "__n",
    ).select(
        "grp", "p_ppm",
        F.expr("(p_ppm * __n + 999999) div 1000000").alias("rank"),
    )
    located = (
        ranks.join(
            cum,
            (ranks["grp"] == cum["grp"])
            & (F.col("cum_prev") < F.col("rank"))
            & (F.col("rank") <= F.col("cum")),
        )
        .select(
            ranks["grp"].alias("_lg"), "p_ppm", "rank",
            F.col("bkt").alias("_lb"),
            (F.col("rank") - F.col("cum_prev")).alias("_loff"),
        )
    )
    wv = Window.partitionBy("grp", "bkt").orderBy("v")
    picked = vals.join(
        F.broadcast(
            located.select(
                F.col("_lg").alias("grp"), F.col("_lb").alias("bkt")
            ).distinct()
        ),
        ["grp", "bkt"],
    ).withColumn("rn", F.row_number().over(wv))
    return picked.join(
        F.broadcast(located),
        (picked["grp"] == F.col("_lg"))
        & (picked["bkt"] == F.col("_lb"))
        & (picked["rn"] == F.col("_loff")),
    ).select(
        picked["grp"].alias(group_col), "p_ppm", "rank",
        F.col("v").alias("value"),
    )


def trimmed_agg(
    df: DataFrame,
    group_col: str,
    value_col: str,
    trim_num: int,
    trim_den: int,
    id_col: str,
) -> DataFrame:
    """Per-group TRIMMED aggregates — the robust-mean rung between the
    exact percentiles (order_statistics) and the MAD outlier flags
    (curation.mad_outliers): drop the lowest and highest
    ``floor(n · trim_num / trim_den)`` rows of each group and return
    exact integer (count, sum) over the kept middle, so the caller's
    trimmed mean = sum_kept / n_kept is immune to the tail it chose to
    cut. trim_num/trim_den is an exact rational (1/10 = classic 10%
    trim); the cut count floors, so tiny groups degrade to the plain
    aggregate (n·p < 1 trims nothing) — pinned by pytest.

    Order within a group is ``(value, id_col)`` — the deterministic
    total order (ties cut by id, the q144 tiebreak rule), which makes
    WHICH duplicate of a tied value gets trimmed reproducible in both
    engines.

    Output: ``(group_col, n_total, n_kept, sum_kept)``, all int64.

    Scale shape: ONE group-hash window provides both row_number and
    the group count (same partitioning, one Exchange + sort); the
    final rollup groups on the SAME key, so Catalyst reuses the
    partitioning — per-task state is one group's sorted run, the
    grouped_order_statistics discipline. For extreme-cardinality
    single groups swap in q99's bucketed selection, same tradeoff as
    mad_outliers (documented there).
    """
    w = Window.partitionBy(group_col).orderBy(
        F.col(value_col), F.col(id_col))
    wc = Window.partitionBy(group_col)
    ranked = df.select(
        group_col, value_col,
        F.row_number().over(w).alias("__rk"),
        F.count(F.lit(1)).over(wc).alias("__n"),
    )
    cut = F.expr(f"(__n * {int(trim_num)}) div {int(trim_den)}")
    kept = ranked.where(
        (F.col("__rk") > cut) & (F.col("__rk") <= F.col("__n") - cut))
    return (
        kept.groupBy(group_col)
        .agg(F.max("__n").cast("long").alias("n_total"),
             F.count(F.lit(1)).cast("long").alias("n_kept"),
             F.sum(value_col).cast("long").alias("sum_kept"))
    )
