"""Point-in-polygon containment (engine-only operator; SURVEY.md §2.3 G3).

Even-odd ray casting, two implementations:

- ``point_in_ring_col`` — pure Column: the crossing-parity fold is expressed
  with ``F.aggregate`` over the ring's edge list, so the whole predicate
  stays JVM-side (no Python boundary) and works with a per-row ring column
  or a broadcast literal ring.
- ``point_in_ring_np`` — vectorized numpy for use inside pandas UDFs
  (kNN / exact-intersects paths), O(#points × #edges) with no Python loop
  over points.

Boundary convention (documented + golden-tested): a point exactly on a
horizontal-edge vertex follows the half-open rule ``(yi > y) != (yj > y)``;
points on a non-horizontal edge count as inside iff the cast ray crossing
parity says so. This matches the classic PNPOLY formulation.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import Column
from pyspark.sql import functions as F


def ring_literal(ring: list[tuple[float, float]]) -> Column:
    """A (lon,lat) ring as an array<struct<lon,lat>> literal Column —
    the broadcast small side of every AOI predicate."""
    return F.array(
        *[
            F.struct(F.lit(float(x)).alias("lon"), F.lit(float(y)).alias("lat"))
            for x, y in ring
        ]
    )


def _edges(ring: Column) -> Column:
    """array<struct<ax,ay,bx,by>> of consecutive ring edges (closed:
    last→first edge included)."""
    n = F.size(ring)
    idx = F.sequence(F.lit(0), n - 1)
    return F.transform(
        idx,
        lambda i: F.struct(
            ring[i]["lon"].alias("ax"),
            ring[i]["lat"].alias("ay"),
            ring[(i + 1) % n]["lon"].alias("bx"),
            ring[(i + 1) % n]["lat"].alias("by"),
        ),
    )


def point_in_ring_col(lon: Column, lat: Column, ring: Column) -> Column:
    """Even-odd containment as a single Column expression."""
    crossings = F.aggregate(
        _edges(ring),
        F.lit(0),
        lambda acc, e: acc
        + F.when(
            ((e["ay"] > lat) != (e["by"] > lat))
            & (
                lon
                < (e["bx"] - e["ax"]) * (lat - e["ay"]) / (e["by"] - e["ay"])
                + e["ax"]
            ),
            F.lit(1),
        ).otherwise(F.lit(0)),
    )
    return crossings % 2 == 1


def point_in_ring_np(
    lon: np.ndarray, lat: np.ndarray, ring: np.ndarray
) -> np.ndarray:
    """Vectorized PNPOLY: ring is shape (n, 2) of (lon, lat); returns bool
    array aligned with lon/lat."""
    ax, ay = ring[:, 0], ring[:, 1]
    bx, by = np.roll(ax, -1), np.roll(ay, -1)
    lon = lon[:, None]
    lat = lat[:, None]
    straddles = (ay[None, :] > lat) != (by[None, :] > lat)
    with np.errstate(divide="ignore", invalid="ignore"):
        xints = (bx - ax)[None, :] * (lat - ay[None, :]) / (by - ay)[None, :] + ax[
            None, :
        ]
    crossings = (straddles & (lon < xints)).sum(axis=1)
    return (crossings % 2).astype(bool)
