"""Deterministic splitting & sampling for training-data pipelines.

`randomSplit`/`sample` are seed- and partitioning-dependent: re-running
on a repartitioned table reassigns rows, which silently leaks validation
examples into training sets. The production-grade alternative is
CONTENT-ADDRESSED assignment — a stable hash of the row's identity picks
the split, so membership is a pure function of the data: reproducible
across runs, engines, partitionings, and cluster sizes, and new rows
never move old rows between splits.

Hash: md5 of the stringified id (the repo's one portable string hash —
see synth.py's oracle-portability rules), top 60 bits as int64, bucketed
mod 10_000 for 0.01% split granularity. Pure Column projection — no
shuffle, no UDF, and the identical expression runs in DuckDB, which is
what makes q50 oracle-exact rather than rows-only.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_BUCKETS = 10_000


def _hash_bucket_col(id_col: Column, salt: str) -> Column:
    # the repo's single sanctioned portable string hash — one
    # implementation site (operators/dedup.py), not a re-derivation
    from osmcha_spark.operators.dedup import md5_long_col

    return (
        md5_long_col(F.concat(id_col.cast("string"), F.lit(salt))) % _BUCKETS
    )


def hash_bucket_sql(id_expr: str, salt: str) -> str:
    """DuckDB twin of the bucket expression (oracle side)."""
    return (
        f"CAST('0x' || substring(md5(concat(CAST({id_expr} AS VARCHAR), "
        f"'{salt}')), 1, 15) AS BIGINT) % {_BUCKETS}"
    )


def split_assign(
    df: DataFrame,
    id_col: str,
    weights: dict[str, float],
    salt: str = "split",
) -> DataFrame:
    """Add a ``split`` column assigning each row to a named split with the
    given weights (must sum to ≤ 1; any remainder is an implicit 'rest').

    Assignment is by hash-bucket ranges, so every engine/run/partitioning
    agrees row-for-row and ratios hold to 1/10000.
    """
    total = sum(weights.values())
    if total > 1.0 + 1e-9:
        raise ValueError(f"weights sum to {total} > 1")
    bucket = _hash_bucket_col(F.col(id_col), salt)
    expr: Column | None = None
    edge = 0
    for name, w in weights.items():
        edge += int(round(w * _BUCKETS))
        cond = bucket < F.lit(edge)
        expr = F.when(cond, F.lit(name)) if expr is None else expr.when(
            cond, F.lit(name)
        )
    out = expr.otherwise(F.lit("rest")) if expr is not None else F.lit("rest")
    return df.withColumn("split", out)


def deterministic_sample(
    df: DataFrame,
    id_col: str,
    rate: float,
    salt: str = "sample",
) -> DataFrame:
    """Content-addressed Bernoulli sample: keeps rows whose hash bucket
    falls under ``rate`` — stable under reruns and repartitioning, and a
    sub-sample at a lower rate is always a subset of a higher-rate one
    (nested samples, the property iterative data ablations rely on)."""
    return df.where(
        _hash_bucket_col(F.col(id_col), salt) < F.lit(int(round(rate * _BUCKETS)))
    )


def stratified_take(
    df: DataFrame,
    strata_cols: list[str],
    n: int,
    id_col: str,
    salt: str = "strat",
) -> DataFrame:
    """Exactly ``min(n, |stratum|)`` rows per stratum, chosen by
    content-addressed hash order — the balanced-sampling primitive
    (class-balanced eval sets, per-language calibration corpora) that
    ``sampleBy`` can't give you: fraction-based sampling only hits n in
    expectation, and its membership moves when the table is
    repartitioned or appended to. Here the per-stratum ranking key is
    ``(md5-hash(id, salt), id)`` — a pure function of row identity — so
    reruns, engines, and cluster sizes agree row-for-row, and a stratum
    gaining new rows only ever displaces the highest-hash survivors.

    Plan: one shuffle on the strata (window partition), row_number, and
    the rank filter folds into the Window node — no join, no second
    pass. Skewed strata are the classic window hot-key; at 100 TB cap
    pathological strata first (this is a top-n, so a per-partition
    map-side pre-rank + re-rank would bound them; Spark's windowed
    top-n already stops at the limit within each partition's sort).

    Output: the input columns plus ``strat_rank`` (1-based within the
    stratum), so callers can tighten n later without resampling.
    """
    from pyspark.sql import Window

    from osmcha_spark.operators.dedup import md5_long_col

    key = md5_long_col(
        F.concat(F.col(id_col).cast("string"), F.lit(salt))
    )
    w = Window.partitionBy(*[F.col(c) for c in strata_cols]).orderBy(
        key.asc(), F.col(id_col).asc()
    )
    return (
        df.withColumn("strat_rank", F.row_number().over(w))
        .where(F.col("strat_rank") <= F.lit(int(n)))
    )
