"""Image near-duplicate detection: the phash-bucketed join (SURVEY.md §2.4
J5).

Banding over the 64-bit aHash: split into ``n_bands`` contiguous 16-bit
bands; by pigeonhole, any pair with Hamming distance < n_bands shares at
least one identical band → banding is *exact* (100% recall) for
``max_hamming ≤ n_bands - 1``. Candidates equi-join on (band_idx,
band_value) — an int key join Catalyst broadcasts or AQE-splits — then the
exact Hamming filter (``bit_count(xor)``, pure JVM) keeps true pairs.

This is the scale path for "find visually identical tiles across 10^12
images": no N² pass ever happens; the join fan-out is bounded by bucket
occupancy, and a hot bucket (e.g. all-black tiles) is exactly the salted /
AQE-skew case (operators/tiles.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from osmcha_spark.images.phash import hamming64

N_BANDS = 4
BAND_BITS = 16


def _bands(phash_col) -> F.Column:
    return F.array(
        *[
            F.struct(
                F.lit(i).alias("band"),
                F.shiftrightunsigned(phash_col, i * BAND_BITS)
                .bitwiseAND(F.lit((1 << BAND_BITS) - 1))
                .alias("val"),
            )
            for i in range(N_BANDS)
        ]
    )


def phash_near_dup_pairs(
    images: DataFrame,
    max_hamming: int = 3,
    id_col: str = "image_id",
    phash_col: str = "phash",
) -> DataFrame:
    """(a, b, hamming) with a < b and Hamming(phash_a, phash_b) ≤
    ``max_hamming``. Exact for max_hamming ≤ 3 (4 bands).

    A pair agreeing in k bands meets in k (band, val) buckets; instead of
    a ``distinct()`` (a full extra shuffle on the pair stream — VERDICT r1
    item 7) each pair is kept only in its FIRST agreeing band: both full
    hashes ride through the join, so "no earlier band agrees" is a pure
    codegen filter and the plan has exactly one exchange (the bucket
    join's)."""
    if max_hamming > N_BANDS - 1:
        raise ValueError(
            f"banding is exact only for max_hamming <= {N_BANDS - 1}"
        )
    e = images.select(
        F.col(id_col).alias("id"),
        F.col(phash_col).alias("ph"),
        F.explode(_bands(F.col(phash_col))).alias("b"),
    ).select("id", "ph", F.col("b.band").alias("band"),
             F.col("b.val").alias("val"))
    left = e.select(
        F.col("id").alias("a"), F.col("ph").alias("pha"), "band", "val"
    )
    right = e.select(
        F.col("id").alias("b"), F.col("ph").alias("phb"), "band", "val"
    )

    def band_of(c, i):
        return F.shiftrightunsigned(c, i * BAND_BITS).bitwiseAND(
            F.lit((1 << BAND_BITS) - 1)
        )

    first_band = F.least(
        *[
            F.when(
                band_of(F.col("pha"), i) == band_of(F.col("phb"), i),
                F.lit(i),
            ).otherwise(F.lit(N_BANDS))
            for i in range(N_BANDS)
        ]
    )
    return (
        left.join(right, ["band", "val"])
        .where((F.col("a") < F.col("b")) & (F.col("band") == first_band))
        .select(
            "a", "b",
            hamming64(F.col("pha"), F.col("phb")).alias("hamming"),
        )
        .where(F.col("hamming") <= max_hamming)
    )
