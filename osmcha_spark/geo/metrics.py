"""Polygon metrics — signed area and centroid by the shoelace formula,
as pure integer Column expressions over vertex arrays.

Completes the from-scratch geometry kernel (cells.py, pip.py,
intersects.py — the repo builds these itself; no shapely, mirroring the
no-PIL codec rule): after "which cell", "inside?", and "intersects?",
the remaining primitive an AOI/tiling pipeline needs is "how BIG is
this polygon and where is its mass" — area-weighted tile budgeting,
AOI-coverage ratios, label placement.

Formulas (Gauss's shoelace; centroid from the standard polygon-moment
derivation): for vertices (x_i, y_i), i = 0..n-1, cyclic,

    cross_i = x_i·y_{i+1} − x_{i+1}·y_i
    2A      = Σ cross_i                       (signed; CCW > 0)
    6A·C_x  = Σ (x_i + x_{i+1})·cross_i
    6A·C_y  = Σ (y_i + y_{i+1})·cross_i

The operator emits the INTEGER numerators (area2, cx6 = 6A·C_x,
cy6 = 6A·C_y) rather than dividing: with quantized integer vertices the
sums are exact in both engines (synth.py's oracle-portability rule —
no float division at the compare surface; callers divide at the edge:
C_x = cx6 / (3·area2)). Overflow bound: |x|,|y| < 2^20 keeps every term
< 2^42 — far under the 2^62 rule for any real vertex count.

Plan shape: pure Column projection (zip-with the rotated array, one
``aggregate`` fold per metric) — no shuffle, no UDF, no explode; at
100 TB polygon metrics are free riders on whatever scan is already
running, and whole-stage codegen keeps the fold JVM-side.

Input convention: ``array<struct<x:long, y:long>>``, open OR closed
ring (a duplicated closing vertex contributes zero to every sum, so
both spellings agree — same tolerance as pip.py's ring handling).
Degenerate rings (< 3 distinct vertices) yield area2 = 0, not an error.

Reference counterpart: osmcha builds shapely Polygons for changeset
bounds and the AOI (osmcha/changeset.py:123-139 ``get_bounds``,
:230-235 ``get_area``) but only ever calls ``.intersects`` — shapely
would supply area/centroid for free, and this module supplies the same
surface from scratch (SURVEY §2.3's no-shapely kernel).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _rotated(ring: Column) -> Column:
    """The ring advanced one vertex with wraparound: v_1..v_{n-1}, v_0."""
    return F.concat(
        F.slice(ring, 2, F.size(ring) - 1), F.slice(ring, 1, 1)
    )


def _fold_sum(pairs: Column) -> Column:
    return F.aggregate(
        pairs, F.lit(0).cast("long"), lambda acc, v: acc + v
    )


def ring_area2_col(ring: Column) -> Column:
    """Signed DOUBLED area (2A) of the ring — CCW positive."""
    nxt = _rotated(ring)
    return _fold_sum(
        F.zip_with(
            ring, nxt, lambda a, b: a["x"] * b["y"] - b["x"] * a["y"]
        )
    )


def ring_centroid6a_cols(ring: Column) -> tuple[Column, Column]:
    """(6A·C_x, 6A·C_y) integer centroid numerators."""
    nxt = _rotated(ring)
    cx = _fold_sum(
        F.zip_with(
            ring,
            nxt,
            lambda a, b: (a["x"] + b["x"])
            * (a["x"] * b["y"] - b["x"] * a["y"]),
        )
    )
    cy = _fold_sum(
        F.zip_with(
            ring,
            nxt,
            lambda a, b: (a["y"] + b["y"])
            * (a["x"] * b["y"] - b["x"] * a["y"]),
        )
    )
    return cx, cy


def ring_metrics(
    df: DataFrame, ring_col: str = "ring"
) -> DataFrame:
    """Append ``n_verts, area2, cx6, cy6`` for the ring column."""
    ring = F.col(ring_col)
    cx, cy = ring_centroid6a_cols(ring)
    return df.select(
        "*",
        F.size(ring).cast("long").alias("n_verts"),
        ring_area2_col(ring).alias("area2"),
        cx.alias("cx6"),
        cy.alias("cy6"),
    )
