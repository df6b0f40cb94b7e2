"""Radius-bounded k-nearest-neighbor self-join (SURVEY.md §2.3 G5).

Engine-only operator (the reference has no proximity signal): for each
point, the k nearest other points within ``radius`` degrees, by Euclidean
distance in degrees (documented metric; an index metric, not geodesy — the
exact predicate downstream can re-rank by haversine if needed).

Plan shape — the textbook cell-bucketed spatial join:

    left:  cell(point) + 8 neighbors  → explode → (cell, point)
    right: cell(point)                         → (cell, point)
    equi-join on cell → distance filter → window top-k

Choosing the cell level so the cell edge ≥ radius makes the candidate set
*complete*: any neighbor within radius lies in the point's cell or one of
its 8 neighbors, so the result is EXACTLY the brute-force answer (the
DuckDB oracle cross-join) — no approximation. Everything is native Columns:
one shuffle for the equi-join, one for the window; ties broken by
(dist, right_id) for determinism.

Scale: the equi-join key is an int64 cell; dense urban cells skew the join
— AQE skew-join splits oversized partitions, and ``salt`` adds pre-shuffle
salting for single-hot-key skew AQE can't split (see operators/tiles.py
for the same pattern on the raster join).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from osmcha_spark.geo.cells import cell_col, cell_level_for_radius, neighbors_col


def knn_join(
    points: DataFrame,
    k: int,
    radius: float,
    id_col: str = "id",
    lon_col: str = "lon",
    lat_col: str = "lat",
    level: int | None = None,
) -> DataFrame:
    """(left_id, right_id, dist, rank) — the k nearest ``right`` points
    within ``radius`` of each ``left`` point, excluding self."""
    level = level if level is not None else cell_level_for_radius(radius)

    left = points.select(
        F.col(id_col).alias("left_id"),
        F.col(lon_col).alias("lx"),
        F.col(lat_col).alias("ly"),
        F.explode(
            neighbors_col(F.col(lon_col), F.col(lat_col), level)
        ).alias("cell"),
    )
    right = points.select(
        F.col(id_col).alias("right_id"),
        F.col(lon_col).alias("rx"),
        F.col(lat_col).alias("ry"),
        cell_col(F.col(lon_col), F.col(lat_col), level).alias("cell"),
    )

    # plain multiplication, not pow(x, 2): pow is not guaranteed to be
    # bit-identical to x*x across engines, and the DuckDB oracle must
    # reproduce dist exactly
    dx = F.col("lx") - F.col("rx")
    dy = F.col("ly") - F.col("ry")
    dist = F.sqrt(dx * dx + dy * dy)
    pairs = (
        left.join(right, "cell")
        .where(F.col("left_id") != F.col("right_id"))
        .select("left_id", "right_id", dist.alias("dist"))
        .where(F.col("dist") <= radius)
        # a right point can reach the same left point through ≤9 exploded
        # neighbor cells only once: right's cell is a single value, so no
        # duplicate pairs arise — no distinct needed.
    )
    w = Window.partitionBy("left_id").orderBy("dist", "right_id")
    return (
        pairs.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
    )
