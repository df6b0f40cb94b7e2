"""Embedding similarity search (engine-only; training-data pipeline ops).

- **brute_topk** — exact top-k neighbors by quantized dot product:
  scores are Σ round(a_i·Q)·round(b_i·Q) over int64 — integer math, so the
  score is independent of summation order and identical in any engine
  (float dot products are order-sensitive and can't be oracle-hashed
  reliably). Q=1024 keeps 64-dim unit-ish vectors well inside int64.
  Plan: broadcast the (small) query set against the corpus → window top-k.
- **cosine_topk** — the float variant (reported cosine, Spark-only path).
- **lsh_topk** — the scale path: random-hyperplane signatures (the
  hyperplane components come from the same splitmix hash family as the
  corpus, so they're deterministic without RNG state), bucket by signature
  prefix, search only within bucket ∪ Hamming-1 probe buckets. Recall<1 by
  design; rows-only checked.

At 10^12 rows brute force is O(N·Q) per query batch — fine when the query
side is broadcast and small; the LSH path bounds candidates per query.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

QUANT = 1024


def _qvec(col) -> F.Column:
    """array<long> of round(x · QUANT) — the portable integer embedding."""
    return F.transform(
        col, lambda x: F.round(x.cast("double") * QUANT).cast("long")
    )


def _dot_int(a, b) -> F.Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )


def brute_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(query_id, neighbor_id, score, rank): exact integer-quantized
    dot-product top-k, excluding self; ties broken by neighbor_id."""
    q = queries.select(
        F.col(id_col).alias("query_id"), _qvec(F.col(vec_col)).alias("qv")
    )
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"), _qvec(F.col(vec_col)).alias("cv")
    )
    pairs = (
        c.crossJoin(F.broadcast(q))
        .where(F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id", "neighbor_id",
            _dot_int(F.col("qv"), F.col("cv")).alias("score"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("score"), F.col("neighbor_id")
    )
    return (
        pairs.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
    )


def cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Float cosine variant (reports the actual cosine; Spark-only)."""
    def dvec(col):
        return F.transform(col, lambda x: x.cast("double"))

    def norm(col):
        return F.sqrt(
            F.aggregate(col, F.lit(0.0), lambda acc, x: acc + x * x)
        )

    q = queries.select(
        F.col(id_col).alias("query_id"), dvec(F.col(vec_col)).alias("qv")
    ).withColumn("qn", norm(F.col("qv")))
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"), dvec(F.col(vec_col)).alias("cv")
    ).withColumn("cn", norm(F.col("cv")))
    dot = F.aggregate(
        F.zip_with(F.col("qv"), F.col("cv"), lambda x, y: x * y),
        F.lit(0.0), lambda acc, x: acc + x,
    )
    pairs = (
        c.crossJoin(F.broadcast(q))
        .where(F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id", "neighbor_id",
            (dot / (F.col("qn") * F.col("cn"))).alias("cosine"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cosine"), F.col("neighbor_id")
    )
    return (
        pairs.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
    )


_PLANE_SALT = 0x5DEECE66D


def _sign_bits(vec, n_bits: int) -> F.Column:
    """LSH signature: bit j = sign(Σ_i c(i,j)·v_i) where c(i,j) ∈ {-1,+1}
    comes from a deterministic integer hash of (i, j) — no RNG state, no
    driver-side plane matrix to broadcast."""
    sig = F.lit(0).cast("long")
    for j in range(n_bits):
        proj = F.aggregate(
            F.zip_with(
                vec,
                F.sequence(F.lit(0), F.size(vec) - 1),
                lambda x, i: x.cast("double")
                * (
                    F.when(
                        F.pmod(
                            F.xxhash64(
                                i * F.lit(1_000_003) + F.lit(j * 7919 + _PLANE_SALT)
                            ),
                            F.lit(2),
                        )
                        == 0,
                        F.lit(1.0),
                    ).otherwise(F.lit(-1.0))
                ),
            ),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        sig = sig.bitwiseOR(
            F.shiftleft(
                F.when(proj > 0, F.lit(1).cast("long")).otherwise(
                    F.lit(0).cast("long")
                ),
                j,
            )
        )
    return sig


def lsh_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int,
    n_bits: int = 12,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate top-k: candidates share the exact signature bucket or a
    Hamming-1 probe bucket (multi-probe LSH); exact quantized scoring +
    window top-k within candidates."""
    sig = _sign_bits(F.col(vec_col), n_bits)
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        _qvec(F.col(vec_col)).alias("cv"),
        sig.alias("bucket"),
    )
    probes = F.array(
        F.col("qsig"),
        *[
            F.col("qsig").bitwiseXOR(F.lit(1 << j))
            for j in range(n_bits)
        ],
    )
    q = queries.select(
        F.col(id_col).alias("query_id"),
        _qvec(F.col(vec_col)).alias("qv"),
        sig.alias("qsig"),
    ).select(
        "query_id", "qv", F.explode(probes).alias("bucket")
    )
    pairs = (
        c.join(F.broadcast(q), "bucket")
        .where(F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id", "neighbor_id",
            _dot_int(F.col("qv"), F.col("cv")).alias("score"),
        )
        .dropDuplicates(["query_id", "neighbor_id"])
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("score"), F.col("neighbor_id")
    )
    return (
        pairs.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
    )
