"""Cluster-sorted layout: MEASURED row-group pruning (footer stats),
file-level disjointness, and the Spark-side pushed filter — the
evidence behind operators/layout.py's scan-pruning claim."""

import pytest
from pyspark.sql import functions as F

from osmcha_spark.geo.cells import cell_col
from osmcha_spark.operators.layout import (
    row_groups_intersecting,
    write_clustered,
)


@pytest.fixture()
def spatial_rows(spark):
    # clustered points over a wide lon/lat domain → wide Morton range
    return spark.range(40_000).select(
        F.col("id"),
        ((F.col("id") % 997) / 997.0 * 300.0 - 150.0).alias("lon"),
        ((F.col("id") % 739) / 739.0 * 140.0 - 70.0).alias("lat"),
    ).withColumn("cell", cell_col(F.col("lon"), F.col("lat"), 10))


def test_clustered_layout_prunes_row_groups(spark, spatial_rows, tmp_path):
    clustered = str(tmp_path / "clustered")
    shuffled = str(tmp_path / "shuffled")
    write_clustered(spatial_rows, clustered, "cell", partitions=8)
    # control: same rows, hash-shuffled on id → every file spans the
    # whole cell domain
    spatial_rows.repartition(8, "id").write.parquet(shuffled)

    cells = [r.cell for r in spatial_rows.select("cell").collect()]
    cells.sort()
    lo, hi = cells[len(cells) // 2], cells[len(cells) // 2 + len(cells) // 50]

    hit_c, total_c = row_groups_intersecting(clustered, "cell", lo, hi)
    hit_s, total_s = row_groups_intersecting(shuffled, "cell", lo, hi)
    assert total_c >= 8 and total_s >= 8
    # clustered: a ~2% key range touches a small fraction of row groups;
    # shuffled: it touches ALL of them
    assert hit_s == total_s
    assert hit_c <= max(2, total_c // 4)

    # Spark side: the range predicate reaches the parquet scan
    scan = (
        spark.read.parquet(clustered)
        .where((F.col("cell") >= lo) & (F.col("cell") <= hi))
    )
    plan = scan._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters" in plan and "GreaterThanOrEqual(cell" in plan
    # and the result is intact (pruning is not dropping rows)
    want = sum(1 for c in cells if lo <= c <= hi)
    assert scan.count() == want
