

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
