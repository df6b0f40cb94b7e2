"""S2-style quadtree cell index: Morton (Z-order) interleave of quantized
lon/lat at a fixed level.

The reference has no spatial index at all — ``ChangesetList.filter``
(osmcha/changeset.py:239-245) runs an exact geometry test per row. At
10^12 rows that is the scalability cliff; this module supplies the coarse
cell equi-join key that turns every spatial predicate into a Catalyst-native
hash join with pushdown-able int64 keys.

Spec (ours, deterministic, golden-pinned):

- level ``L`` in [0, 24] (MAX_LEVEL; 48 payload bits); grid is ``2^L × 2^L`` over lon ∈ [-180, 180],
  lat ∈ [-90, 90] (equirectangular — adequate for an index; exact predicates
  always re-check).
- ``x = clamp(floor((lon+180)/360 * 2^L), 0, 2^L-1)``, same for ``y`` with
  (lat+90)/180.
- ``cell = morton(x, y) | (L << 56)``: x in even bits, y in odd bits, level
  tag in the high byte so ids from different levels never collide.

Three equivalent implementations, cross-checked in tests:
``cell_col`` (pure Column — JVM, codegen, no UDF), ``cell_sql`` (ANSI SQL
text for the DuckDB oracle), ``cell_np`` (numpy for inside-UDF contexts).
The bit-spread uses the classic branch-free magic-mask sequence, so the
Column version is 10 integer ops — cheap enough to compute inline at scan
time and never worth materializing RDD-side.
"""

from __future__ import annotations

import math

import numpy as np
from pyspark.sql import Column
from pyspark.sql import functions as F

# 64-bit part1by1 bit-spread (classic branch-free morton masks, public
# domain folklore): supports up to 24-bit axis inputs (level ≤ 24, 48
# payload bits < the 56-bit level-tag boundary). For ≤16-bit inputs the
# extra shift-16 step is a no-op and every mask acts like its 32-bit
# truncation, so cell ids at levels ≤ 16 are IDENTICAL to the narrow
# implementation this replaced (pinned in tests/test_geo.py).
MAX_LEVEL = 24

_SPREAD_MASKS = [
    (16, 0x0000FFFF0000FFFF),
    (8, 0x00FF00FF00FF00FF),
    (4, 0x0F0F0F0F0F0F0F0F),
    (2, 0x3333333333333333),
    (1, 0x5555555555555555),
]


def _spread_col(v: Column) -> Column:
    v = v.bitwiseAND(F.lit(0xFFFFFF))
    for shift, mask in _SPREAD_MASKS:
        v = (v.bitwiseOR(F.shiftleft(v, shift))).bitwiseAND(F.lit(mask))
    return v


def _axis_col(coord: Column, offset: float, span: float, level: int) -> Column:
    lim = 1 << level
    raw = F.floor((coord + F.lit(offset)) / F.lit(span) * F.lit(float(lim)))
    return F.least(F.greatest(raw.cast("long"), F.lit(0)), F.lit(lim - 1))


def cell_col(lon: Column, lat: Column, level: int) -> Column:
    """int64 cell id as a pure Column expression."""
    x = _spread_col(_axis_col(lon, 180.0, 360.0, level))
    y = _spread_col(_axis_col(lat, 90.0, 180.0, level))
    return (
        x.bitwiseOR(F.shiftleft(y, 1)).bitwiseOR(F.lit(level << 56))
    )


def _spread_sql(expr: str) -> str:
    out = f"({expr} & {0xFFFFFF})"
    for shift, mask in _SPREAD_MASKS:
        out = f"((({out} | ({out} << {shift}))) & {mask})"
    return out


def _axis_sql(expr: str, offset: float, span: float, level: int) -> str:
    lim = 1 << level
    raw = (
        f"CAST(floor((({expr}) + {offset}) / {span} * {float(lim)}) AS BIGINT)"
    )
    return f"least(greatest({raw}, 0), {lim - 1})"


def cell_sql(lon_expr: str, lat_expr: str, level: int) -> str:
    """The same cell id as dialect-neutral SQL (DuckDB + Spark SQL)."""
    x = _spread_sql(_axis_sql(lon_expr, 180.0, 360.0, level))
    y = _spread_sql(_axis_sql(lat_expr, 90.0, 180.0, level))
    return f"(({x}) | (({y}) << 1) | {level << 56})"


def _spread_np(v: np.ndarray) -> np.ndarray:
    v = v & 0xFFFFFF
    for shift, mask in _SPREAD_MASKS:
        v = (v | (v << shift)) & np.int64(mask)
    return v


def cell_np(lon: np.ndarray, lat: np.ndarray, level: int) -> np.ndarray:
    lim = 1 << level
    x = np.clip(
        np.floor((lon + 180.0) / 360.0 * float(lim)).astype(np.int64), 0, lim - 1
    )
    y = np.clip(
        np.floor((lat + 90.0) / 180.0 * float(lim)).astype(np.int64), 0, lim - 1
    )
    return _spread_np(x) | (_spread_np(y) << 1) | np.int64(level << 56)


def cell_level_for_radius(radius_deg: float) -> int:
    """Finest level whose cell edge still covers ``radius_deg`` on BOTH
    axes, so a cell + its 8 neighbors is a complete candidate set for any
    radius-bounded search. The binding axis is latitude: the grid maps a
    180° lat span to 2^L cells, so cell height = 180/2^L (half the lon
    width) — sizing by lon alone under-covers in lat."""
    level = (
        int(math.floor(math.log2(180.0 / radius_deg)))
        if radius_deg > 0
        else MAX_LEVEL
    )
    return max(0, min(MAX_LEVEL, level))


def _xy_cols(lon: Column, lat: Column, level: int) -> tuple[Column, Column]:
    return (
        _axis_col(lon, 180.0, 360.0, level),
        _axis_col(lat, 90.0, 180.0, level),
    )


def parent_cell_col(cell: Column) -> Column:
    """The level-(L-1) parent of a level-L cell id — drop one Morton bit
    pair and decrement the level byte.

    Identity with direct encoding (pinned in tests/test_geo.py):
    ``parent(cell_col(lon, lat, L)) == cell_col(lon, lat, L-1)`` for every
    coordinate, including clamped out-of-range ones — ``floor(x_L / 2) ==
    x_{L-1}`` holds both for the floor expression and at the clamp edges
    (``(2^L - 1) // 2 == 2^{L-1} - 1``). This is what makes hierarchical
    rollups reaggregate from the previous level instead of rescanning raw
    data (operators/tiles.py:tile_pyramid)."""
    level = F.shiftright(cell, 56)
    morton = cell.bitwiseAND(F.lit((1 << 56) - 1))
    return F.shiftright(morton, 2).bitwiseOR(F.shiftleft(level - 1, 56))


def _morton_from_xy(x: Column, y: Column, level: int) -> Column:
    return (
        _spread_col(x)
        .bitwiseOR(F.shiftleft(_spread_col(y), 1))
        .bitwiseOR(F.lit(level << 56))
    )


_NEIGHBOR_OFFSETS = [(dx, dy) for dx in (-1, 0, 1) for dy in (-1, 0, 1)]


def neighbors_col(lon: Column, lat: Column, level: int) -> Column:
    """array<long> of the point's cell and its ≤8 grid neighbors (clamped at
    the grid edge, deduplicated). The standard kNN/radius candidate key set.

    The quantized (x, y) pair is let-bound via a single-element struct array
    so the axis expression appears ONCE in the plan — inlining it 9× blows
    the expression tree past the whole-stage-codegen size limit and drops
    the projection to interpreted mode (observed; that is a real 100-TB
    regression, not cosmetics)."""
    lim = 1 << level
    x, y = _xy_cols(lon, lat, level)
    xy = F.array(F.struct(x.alias("x"), y.alias("y")))
    offsets = F.array(
        *[
            F.struct(F.lit(dx).alias("dx"), F.lit(dy).alias("dy"))
            for dx, dy in _NEIGHBOR_OFFSETS
        ]
    )
    return F.array_distinct(
        F.flatten(
            F.transform(
                xy,
                lambda s: F.transform(
                    offsets,
                    lambda d: _morton_from_xy(
                        F.least(
                            F.greatest(s["x"] + d["dx"], F.lit(0)),
                            F.lit(lim - 1),
                        ),
                        F.least(
                            F.greatest(s["y"] + d["dy"], F.lit(0)),
                            F.lit(lim - 1),
                        ),
                        level,
                    ),
                ),
            )
        )
    )


def covering_cells_col(
    min_lon: Column, min_lat: Column, max_lon: Column, max_lat: Column,
    level: int,
) -> Column:
    """Polyfill: array<long> of every level-L cell overlapping the bbox.

    Pure Column (sequence + nested transform + flatten) so Catalyst keeps it
    JVM-side; callers explode it to get the (cell, row) assignment pairs that
    feed the raster↔vector equi-join. Degenerate (point/line) bboxes yield
    their single covering cell. NULL coords yield NULL (no cells).

    Same let-binding pattern as neighbors_col: the four axis expressions are
    bound once in a struct array, keeping the tree codegen-sized.
    """
    x0, y0 = _xy_cols(min_lon, min_lat, level)
    x1, y1 = _xy_cols(max_lon, max_lat, level)
    bounds = F.array(
        F.struct(
            x0.alias("x0"), x1.alias("x1"), y0.alias("y0"), y1.alias("y1")
        )
    )
    return F.flatten(
        F.transform(
            bounds,
            lambda b: F.flatten(
                F.transform(
                    F.sequence(b["x0"], b["x1"]),
                    lambda x: F.transform(
                        F.sequence(b["y0"], b["y1"]),
                        lambda y: _morton_from_xy(x, y, level),
                    ),
                )
            ),
        )
    )


def _spread_int(v: int) -> int:
    v &= 0xFFFFFF
    for shift, mask in _SPREAD_MASKS:
        v = (v | (v << shift)) & mask
    return v


def cell_ranges_for_rect(
    min_lon: float, min_lat: float, max_lon: float, max_lat: float,
    coarse_level: int, fine_level: int,
) -> list[tuple[int, int]]:
    """Contiguous FINE-level cell-id ranges covering the rect, via its
    COARSE-level covering cells — the Z-order range decomposition that
    turns a lon/lat box into `cell BETWEEN lo AND hi` predicates over a
    cluster-sorted table (operators/layout.py:scan_cell_ranges).

    Z-order property: a coarse cell's fine descendants are one contiguous
    morton run `[m·4^k, (m+1)·4^k)` (k = fine−coarse), because
    interleave(x_P·2^k + dx, y_P·2^k + dy) = morton_P·4^k + morton(dx,dy)
    — so each coarse cell is ONE range, and morton-adjacent coarse cells
    merge. Driver-side on purpose: AOIs are metadata-scale, and literal
    ranges are statically pushed into the parquet scan (footer min/max
    row-group pruning, measured in tests/test_layout.py) — the same
    static-beats-dynamic pruning choice as upsert_partitioned.

    Axis indices clamp exactly like ``cell_col`` does, so padding a rect
    past ±180/±90 is safe and the ranges stay a superset of every
    ``cell_col(center)`` value inside the rect."""
    if fine_level < coarse_level:
        raise ValueError(
            f"fine_level={fine_level} < coarse_level={coarse_level}"
        )

    def axis(coord: float, offset: float, span: float) -> int:
        lim = 1 << coarse_level
        raw = int(math.floor((coord + offset) / span * float(lim)))
        return min(max(raw, 0), lim - 1)

    x0, x1 = axis(min_lon, 180.0, 360.0), axis(max_lon, 180.0, 360.0)
    y0, y1 = axis(min_lat, 90.0, 180.0), axis(max_lat, 90.0, 180.0)
    mortons = sorted(
        _spread_int(x) | (_spread_int(y) << 1)
        for x in range(x0, x1 + 1)
        for y in range(y0, y1 + 1)
    )
    span4 = 4 ** (fine_level - coarse_level)
    runs: list[list[int]] = []
    for m in mortons:
        lo, hi = m * span4, m * span4 + span4 - 1
        if runs and runs[-1][1] + 1 == lo:
            runs[-1][1] = hi
        else:
            runs.append([lo, hi])
    tag = fine_level << 56
    return [(tag | lo, tag | hi) for lo, hi in runs]


def covering_cells_count_sql(
    min_lon: str, min_lat: str, max_lon: str, max_lat: str, level: int
) -> str:
    """Oracle helper: |polyfill(bbox, L)| as portable SQL — the product of
    the x and y index ranges."""
    x0 = _axis_sql(min_lon, 180.0, 360.0, level)
    x1 = _axis_sql(max_lon, 180.0, 360.0, level)
    y0 = _axis_sql(min_lat, 90.0, 180.0, level)
    y1 = _axis_sql(max_lat, 90.0, 180.0, level)
    return f"(({x1}) - ({x0}) + 1) * (({y1}) - ({y0}) + 1)"
