

def test_block_means_spec_and_fixture_parity(spark):
    """block_means: uniform image → all 16 blocks equal brightness·1000
    // 1; recomputed grids equal the fixture's generation-time stored
    column for EVERY row (all formats, incl. lossy)."""
    import numpy as np

    from osmcha_spark.images.features import block_means, gray_int

    uni = np.full((32, 32, 3), 77, dtype=np.uint8)
    g = int(gray_int(uni)[0, 0])
    assert block_means(uni) == [g * 1000] * 16

    import pytest as _pytest
    with _pytest.raises(ValueError):
        block_means(np.zeros((3, 32, 3), dtype=np.uint8))

    import os

    from osmcha_spark.images.udfs import block_means_udf
    from pyspark.sql import functions as F

    fix = os.path.join(os.path.dirname(__file__), "data", "images.parquet")
    imgs = spark.read.parquet(fix)
    bad = imgs.select(
        block_means_udf(F.col("bytes"), F.col("fmt")).alias("re"),
        "block_means",
    ).where(F.col("re") != F.col("block_means")).count()
    assert bad == 0


def test_grid_near_dup_agrees_with_phash_pairs(spark):
    """The grid-banded near-dup path and the independent phash-banded
    path (q19) find the SAME fixture pairs; candidates verify
    cartesian-free and Python only in the grid recompute."""
    import os

    from pyspark.sql import functions as F

    from osmcha_spark.operators.dedup_images import (
        grid_near_dup_pairs,
        phash_near_dup_pairs,
    )

    fix = os.path.join(os.path.dirname(__file__), "data", "images.parquet")
    imgs = spark.read.parquet(fix)
    grid_pairs = {
        (r.a, r.b)
        for r in grid_near_dup_pairs(
            imgs.select("image_id", F.col("block_means").alias("grid")),
            threshold=20000,
        ).collect()
    }
    ph_pairs = {
        (r.a, r.b)
        for r in phash_near_dup_pairs(imgs, max_hamming=3).collect()
    }
    assert grid_pairs == ph_pairs and len(grid_pairs) == 5
    plan = grid_near_dup_pairs(
        imgs.select("image_id", F.col("block_means").alias("grid")),
        threshold=20000,
    )._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
