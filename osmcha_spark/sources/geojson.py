"""GeoJSON area-of-interest source.

``ChangesetList.get_area`` (osmcha/changeset.py:230-237): first feature,
first ring. Config-sized → loaded driver-side; the ring travels to executors
as a literal/closure (the broadcast small side of the AOI join).
"""

from __future__ import annotations

import json


def load_aoi_ring(path: str) -> list[tuple[float, float]]:
    with open(path) as fh:
        gj = json.load(fh)
    coords = gj["features"][0]["geometry"]["coordinates"][0]
    return [(float(x), float(y)) for x, y in coords]


def ring_bbox(ring: list[tuple[float, float]]) -> tuple[float, float, float, float]:
    xs = [p[0] for p in ring]
    ys = [p[1] for p in ring]
    return (min(xs), min(ys), max(xs), max(ys))


def ring_is_rectangle(ring: list[tuple[float, float]]) -> bool:
    """True when the ring is an axis-aligned rectangle (each vertex sits on
    a bbox corner) — unlocks the pure-Column intersects fast path."""
    min_lon, min_lat, max_lon, max_lat = ring_bbox(ring)
    corners = {
        (min_lon, min_lat), (max_lon, min_lat),
        (max_lon, max_lat), (min_lon, max_lat),
    }
    return all((x, y) in corners for x, y in ring)
