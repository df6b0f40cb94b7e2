"""AOI spatial filter: the scaled form of ``ChangesetList.filter``
(osmcha/changeset.py:239-245).

Two-stage coarse-then-exact (GeoBlocks-style):

1. **cell prefilter** — the AOI ring is polyfilled driver-side to a covering
   cell set at an adaptively chosen level (coarse enough that the literal
   set stays ≤ ``max_cells``); each changeset bbox's covering cells come from
   the pure-Column polyfill, and ``arrays_overlap`` against the literal cell
   array runs JVM-side with no join and no shuffle at all.
2. **exact test** — only on prefilter survivors: the vectorized
   rect-vs-ring predicate (geo/intersects.py), or the pure-Column interval
   test when the AOI is an axis-aligned rectangle (the reference fixture's
   map.geojson is).

At 100 TB stage 1 prunes the scan down to the AOI's cells — and because the
cell id is a plain int64 column expression, writing the corpus partitioned/
sorted by cell turns stage 1 into parquet row-group pruning via min/max
stats, before any executor even reads the data.

For *many* AOIs at once, ``aoi_join`` explodes both sides' covering cells
and equi-joins on the cell id (broadcast when the AOI side is small),
followed by the same exact predicate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from osmcha_spark.geo.cells import covering_cells_col
from osmcha_spark.geo.intersects import (
    rect_rect_intersects_col,
    rect_ring_intersects_udf,
)
from osmcha_spark.sources.geojson import ring_bbox, ring_is_rectangle

import numpy as np


def aoi_covering_cells(
    ring: list[tuple[float, float]], level: int
) -> list[int]:
    """Driver-side polyfill of the ring's bbox at ``level`` (numpy; the
    coarse set may overshoot the ring — stage 2 is exact anyway)."""
    min_lon, min_lat, max_lon, max_lat = ring_bbox(ring)
    lim = 1 << level

    def axis(v, off, span):
        return int(
            np.clip(np.floor((v + off) / span * lim), 0, lim - 1)
        )

    xi0, xi1 = axis(min_lon, 180.0, 360.0), axis(max_lon, 180.0, 360.0)
    yi0, yi1 = axis(min_lat, 90.0, 180.0), axis(max_lat, 90.0, 180.0)
    xs = np.arange(xi0, xi1 + 1, dtype=np.int64)
    ys = np.arange(yi0, yi1 + 1, dtype=np.int64)

    def spread(v):
        v = v & 0xFFFF
        for shift, mask in (
            (8, 0x00FF00FF), (4, 0x0F0F0F0F), (2, 0x33333333), (1, 0x55555555)
        ):
            v = (v | (v << shift)) & mask
        return v

    grid = spread(xs)[:, None] | (spread(ys)[None, :] << 1) | (level << 56)
    return [int(c) for c in grid.ravel()]


def pick_level(ring: list[tuple[float, float]], max_cells: int = 256) -> int:
    """Finest level whose AOI covering set stays within ``max_cells``."""
    for level in range(16, -1, -1):
        min_lon, min_lat, max_lon, max_lat = ring_bbox(ring)
        lim = 1 << level
        nx = int((max_lon + 180.0) / 360.0 * lim) - int(
            (min_lon + 180.0) / 360.0 * lim
        ) + 1
        ny = int((max_lat + 90.0) / 180.0 * lim) - int(
            (min_lat + 90.0) / 180.0 * lim
        ) + 1
        if nx * ny <= max_cells:
            return level
    return 0


def filter_by_aoi(
    changesets: DataFrame,
    ring: list[tuple[float, float]],
    level: int | None = None,
    exact: bool = True,
) -> DataFrame:
    """Keep changesets whose bbox intersects the AOI ring."""
    level = level if level is not None else pick_level(ring)
    cells = aoi_covering_cells(ring, level)

    coarse = F.arrays_overlap(
        covering_cells_col(
            F.col("min_lon"), F.col("min_lat"),
            F.col("max_lon"), F.col("max_lat"), level,
        ),
        F.array(*[F.lit(c) for c in cells]),
    )
    out = changesets.where(F.coalesce(coarse, F.lit(False)))
    if not exact:
        return out

    if ring_is_rectangle(ring):
        pred = rect_rect_intersects_col(
            F.col("min_lon"), F.col("min_lat"),
            F.col("max_lon"), F.col("max_lat"),
            ring_bbox(ring),
        )
    else:
        pred = rect_ring_intersects_udf(ring)(
            F.col("min_lon"), F.col("min_lat"),
            F.col("max_lon"), F.col("max_lat"),
        )
    return out.where(F.coalesce(pred, F.lit(False)))


def aoi_join(
    changesets: DataFrame,
    aois: DataFrame,
    level: int = 8,
    broadcast_aois: bool = True,
) -> DataFrame:
    """Many-AOI variant: ``aois(aoi_id, ring array<struct<lon,lat>>)`` ⋈
    changesets on covering cell, then the exact PIP/intersects predicate.

    Both sides polyfill to the same level and equi-join on the int64 cell —
    a plan Catalyst can broadcast, reorder, and AQE-skew-split. Result is
    (aoi_id, changeset columns), deduplicated per pair (a bbox covering k
    cells matches each AOI at most once).
    """
    cs = changesets.withColumn(
        "__cell",
        F.explode(
            covering_cells_col(
                F.col("min_lon"), F.col("min_lat"),
                F.col("max_lon"), F.col("max_lat"), level,
            )
        ),
    )
    ao = aois.select(
        "aoi_id", "ring",
        F.explode(
            covering_cells_col(
                F.aggregate(
                    "ring", F.lit(float("inf")),
                    lambda acc, p: F.least(acc, p["lon"]),
                ),
                F.aggregate(
                    "ring", F.lit(float("inf")),
                    lambda acc, p: F.least(acc, p["lat"]),
                ),
                F.aggregate(
                    "ring", F.lit(float("-inf")),
                    lambda acc, p: F.greatest(acc, p["lon"]),
                ),
                F.aggregate(
                    "ring", F.lit(float("-inf")),
                    lambda acc, p: F.greatest(acc, p["lat"]),
                ),
                level,
            )
        ).alias("__cell"),
    )
    if broadcast_aois:
        ao = F.broadcast(ao)
    joined = cs.join(ao, "__cell").drop("__cell").dropDuplicates(
        ["aoi_id", "id"]
    )

    # exact predicate per pair — the full rect∩ring decomposition, all
    # Column-side: (1) a bbox corner inside the ring, (2) a ring vertex
    # inside the bbox, (3) a ring edge crossing the bbox. (3) is required:
    # a "plus-sign" overlap (tall bbox × wide ring) contains no vertex of
    # either shape in the other, only edge crossings.
    from osmcha_spark.geo.pip import point_in_ring_col

    min_lon, min_lat = F.col("min_lon"), F.col("min_lat")
    max_lon, max_lat = F.col("max_lon"), F.col("max_lat")
    ring = F.col("ring")
    corner_in = (
        point_in_ring_col(min_lon, min_lat, ring)
        | point_in_ring_col(max_lon, min_lat, ring)
        | point_in_ring_col(max_lon, max_lat, ring)
        | point_in_ring_col(min_lon, max_lat, ring)
    )
    vertex_in = F.exists(
        ring,
        lambda p: (p["lon"] >= min_lon) & (p["lon"] <= max_lon)
        & (p["lat"] >= min_lat) & (p["lat"] <= max_lat),
    )
    edge_cross = F.exists(
        _ring_edges(ring),
        lambda e: _segment_hits_rect(
            e, min_lon, min_lat, max_lon, max_lat
        ),
    )
    return joined.where(
        F.coalesce(corner_in | vertex_in | edge_cross, F.lit(False))
    )


def _ring_edges(ring):
    """array<struct<ax,ay,bx,by>> of the closed ring's edges."""
    n = F.size(ring)
    return F.transform(
        F.sequence(F.lit(0), n - 1),
        lambda i: F.struct(
            ring[i]["lon"].alias("ax"), ring[i]["lat"].alias("ay"),
            ring[(i + 1) % n]["lon"].alias("bx"),
            ring[(i + 1) % n]["lat"].alias("by"),
        ),
    )


def _segment_hits_rect(e, min_lon, min_lat, max_lon, max_lat):
    """Inclusive segment ∩ axis-aligned rect, by separating axes (exact for
    this convex pair: axes = rect's x/y + the segment's normal):
    the segment's bbox overlaps the rect AND the rect's corners do not all
    lie strictly on one side of the segment's supporting line."""
    bbox_overlap = (
        (F.least(e["ax"], e["bx"]) <= max_lon)
        & (F.greatest(e["ax"], e["bx"]) >= min_lon)
        & (F.least(e["ay"], e["by"]) <= max_lat)
        & (F.greatest(e["ay"], e["by"]) >= min_lat)
    )
    dx = e["bx"] - e["ax"]
    dy = e["by"] - e["ay"]

    def side(px, py):
        return dx * (py - e["ay"]) - dy * (px - e["ax"])

    s1 = side(min_lon, min_lat)
    s2 = side(max_lon, min_lat)
    s3 = side(max_lon, max_lat)
    s4 = side(min_lon, max_lat)
    all_pos = (s1 > 0) & (s2 > 0) & (s3 > 0) & (s4 > 0)
    all_neg = (s1 < 0) & (s2 < 0) & (s3 < 0) & (s4 < 0)
    return bbox_overlap & ~all_pos & ~all_neg
