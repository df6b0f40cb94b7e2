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


def grid_near_dup_pairs(
    imgs: DataFrame,
    threshold: int,
    quant: int = 8000,
    bands: int = 4,
    id_col: str = "image_id",
    grid_col: str = "grid",
) -> DataFrame:
    """(a, b, l1) — visual near-duplicates by their per-block luma grids
    (images/features.py:block_means): banded candidate generation over
    QUANTIZED grid bands, exact integer L1 verify.

    Banding: the 16-value grid splits into ``bands`` contiguous runs;
    each run's values bucket by ``x − pmod(x, quant)`` (pure integer —
    same classes as ``x div quant``, no division anywhere) and
    serialize to a string band key (portable: no engine array-equality
    semantics reach the oracle). Near-identical images differ by a few
    hundred milli per block, so at quant 8000 some band almost surely
    matches bucket-for-bucket; a random pair rarely matches a whole
    4-value band. Like every banded op here (q19/q36/q86) recall is
    the honest tradeoff — a near-dup straddling a bucket boundary in
    every band is missed — so the q91 oracle mirrors the SAME candidate
    generation over the stored grids, never an exact all-pairs oracle.

    Scale: one explode (×bands), one equi-join on the band key, an
    O(candidates) in-row ``zip_with`` L1 verify. The grid is 16 longs
    per image — the blocking index is ~128 B/image where raw pixels
    are KBs, which is why thumbnail-grid blocking is the standard
    first pass of visual dedup at corpus scale.
    """
    run = -(-16 // bands)
    g = imgs.select(F.col(id_col).alias("id"), F.col(grid_col).alias("g"))
    bandrows = g.select(
        "id",
        F.explode(
            F.array(*[
                F.struct(
                    F.lit(b).alias("b"),
                    F.concat_ws(
                        ",",
                        F.transform(
                            F.slice(F.col("g"), b * run + 1, run),
                            lambda x: (x - F.pmod(x, F.lit(int(quant))))
                            .cast("string"),
                        ),
                    ).alias("key"),
                )
                for b in range(bands)
            ])
        ).alias("e"),
    ).select("id", F.col("e.b").alias("b"), F.col("e.key").alias("key"))
    cand = (
        bandrows.select(F.col("id").alias("a"), "b", "key")
        .join(bandrows.select(F.col("id").alias("b_id"), "b", "key"),
              ["b", "key"])
        .where(F.col("a") < F.col("b_id"))
        .select("a", F.col("b_id").alias("b"))
        .distinct()
    )
    l1 = F.aggregate(
        F.zip_with(F.col("ga"), F.col("gb"), lambda x, y: F.abs(x - y)),
        F.lit(0).cast("long"),
        lambda acc, d: acc + d,
    )
    return (
        cand.join(g.select(F.col("id").alias("a"), F.col("g").alias("ga")),
                  "a")
        .join(g.select(F.col("id").alias("b"), F.col("g").alias("gb")), "b")
        .withColumn("l1", l1)
        .where(F.col("l1") <= threshold)
        .select("a", "b", "l1")
    )


def exact_image_dup_groups(
    images: DataFrame,
    id_col: str = "image_id",
    bytes_col: str = "bytes",
) -> DataFrame:
    """Byte-exact duplicate groups — the cheapest rung of the visual
    dedup ladder (below phash q19 and luma-grid q91): group by a
    content hash of the RAW bytes, emit groups with more than one copy
    as ``(content_md5, n_copies, canonical_id)``, canonical = min id.

    The hash is ``md5(hex(bytes))`` — hex first because DuckDB's md5
    only takes VARCHAR, and both engines render identical uppercase hex
    of the same bytes, so the q120 oracle reproduces the key exactly
    (verified cross-engine). At 10^12 images this is ONE map-side
    projection (the 3 KB payload reduces to 32 hex chars before the
    shuffle) + one groupBy on the digest; re-encoded or resized copies
    don't hash equal — that's the perceptual tiers' job.
    """
    k = F.md5(F.hex(F.col(bytes_col))).alias("content_md5")
    return (
        images.select(k, F.col(id_col).alias("id"))
        .groupBy("content_md5")
        .agg(
            F.count(F.lit(1)).alias("n_copies"),
            F.min("id").alias("canonical_id"),
        )
        .where(F.col("n_copies") > 1)
    )
