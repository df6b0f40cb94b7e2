"""Image feature extraction (the multimodal feature-extract stage):
brightness / contrast / sharpness from decoded RGB, defined in exact
integer-friendly arithmetic so the engine-recomputed values equal the
generation-time stored columns bit-for-bit (the q51 gate, same spirit as
the stored-phash check in q25).

Definitions (one shared implementation used by BOTH the corpus fixture
writer and the Arrow-vectorized UDF, so there is exactly one spec):

- gray: the phash grayscale, ``(299R + 587G + 114B) // 1000`` (int).
- brightness_milli: ``floor(mean(gray) * 1000)`` — integer pixel sums are
  exact in float64, so the mean (and its floor) is reduction-order-free.
- contrast_milli:  ``floor(sqrt(mean(gray²) - mean(gray)²) * 1000)`` —
  population std via the moment form; both moments are exact integer
  sums / n, and the single sqrt is IEEE-defined, so the value is
  engine-stable.
- sharpness_milli: ``floor(mean(|4·g - left - right - up - down|) * 1000)``
  over the interior pixels (the mean |4-neighbor Laplacian|) — an
  integer-exact edge-energy proxy for focus/detail quality scoring.
"""

from __future__ import annotations

import numpy as np


def gray_int(px: np.ndarray) -> np.ndarray:
    """HxW int32 grayscale (phash spec, integer math)."""
    p = px.astype(np.int64)
    return ((299 * p[..., 0] + 587 * p[..., 1] + 114 * p[..., 2]) // 1000)


def image_features(px: np.ndarray) -> tuple[int, int, int]:
    """(brightness_milli, contrast_milli, sharpness_milli) of one HxWx3
    uint8 image."""
    g = gray_int(px)
    n = g.size
    s1 = int(g.sum())
    s2 = int((g * g).sum())
    mean = s1 / n
    var = s2 / n - mean * mean
    brightness = int(np.floor(mean * 1000.0))
    contrast = int(np.floor(np.sqrt(var if var > 0 else 0.0) * 1000.0))
    core = g[1:-1, 1:-1]
    lap = np.abs(
        4 * core - g[1:-1, :-2] - g[1:-1, 2:] - g[:-2, 1:-1] - g[2:, 1:-1]
    )
    sharpness = int(np.floor((int(lap.sum()) / lap.size) * 1000.0))
    return brightness, contrast, sharpness


def block_means(px: np.ndarray, grid: int = 4) -> list[int]:
    """Row-major ``grid×grid`` list of per-block mean-luma milli values —
    the tiny "thumbnail embedding" behind visual near-dup blocking and
    quality heatmaps (each block: ``sum(gray)·1000 // count``, pure
    integer, so engine-recomputed values equal the generation-time
    stored column bit-for-bit, the q51 discipline).

    Block boundaries are ``i·h // grid`` (deterministic for any dims ≥
    grid); requires ``min(h, w) ≥ grid``.
    """
    g = gray_int(px)
    h, w = g.shape
    if min(h, w) < grid:
        raise ValueError(f"image {w}x{h} smaller than grid {grid}")
    out = []
    for bi in range(grid):
        r0, r1 = bi * h // grid, (bi + 1) * h // grid
        for bj in range(grid):
            c0, c1 = bj * w // grid, (bj + 1) * w // grid
            blk = g[r0:r1, c0:c1]
            out.append(int(blk.sum()) * 1000 // blk.size)
    return out
