"""Perceptual hashing (SURVEY.md §2.7 F11): 8×8 mean-hash over grayscale.

Spec (pinned; the corpus generator and engine must agree bit-for-bit):
1. grayscale = (299·R + 587·G + 114·B) // 1000, integer math,
2. block-mean downsample to 8×8 (image dims must be multiples of 8 after
   cropping to the largest multiple — we crop bottom/right),
3. bit_i = cell_i > mean(cells), row-major i ∈ [0,64),
4. hash = Σ bit_i · 2^i as uint64, reinterpreted as int64 (Spark LongType).

``hamming64`` is the Column-side distance for the phash-bucketed join
(operators/dedup_images.py): bit_count(xor) — pure JVM.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import Column
from pyspark.sql import functions as F


def gray_cells_batch(px: np.ndarray) -> np.ndarray:
    """(B, 8, 8) float64 block-mean grayscale cells of a same-shape
    (B, H, W, 3) uint8 batch — steps 1-2 of the spec, amortized across
    images. Integer pixel sums are exact in float64, so the means are
    bit-identical however they're reduced (or batched)."""
    _, h, w, _ = px.shape
    hc, wc = (h // 8) * 8, (w // 8) * 8
    if hc == 0 or wc == 0:
        raise ValueError("image smaller than 8x8")
    p = px[:, :hc, :wc].astype(np.uint32)
    gray = (299 * p[..., 0] + 587 * p[..., 1] + 114 * p[..., 2]) // 1000
    return gray.reshape(-1, 8, hc // 8, 8, wc // 8).mean(axis=(2, 4))


def gray_cells(px: np.ndarray) -> np.ndarray:
    """(8, 8) cells of one HxWx3 image (scalar twin of the batch form)."""
    return gray_cells_batch(px[None])[0]


def ahash64(px: np.ndarray) -> int:
    return int(ahash64_batch(gray_cells_batch(px[None]))[0])


def ahash64_batch(gray_cells: np.ndarray) -> np.ndarray:
    """Vectorized variant: (N, 8, 8) float cell-means → (N,) int64."""
    means = gray_cells.reshape(-1, 64).mean(axis=1, keepdims=True)
    bits = (gray_cells.reshape(-1, 64) > means).astype(np.uint64)
    weights = (np.uint64(1) << np.arange(64, dtype=np.uint64))[None, :]
    return (bits * weights).sum(axis=1, dtype=np.uint64).view(np.int64)


def hamming64(a: Column, b: Column) -> Column:
    """Hamming distance between two int64 phashes — JVM-side."""
    return F.bit_count(a.bitwiseXOR(b))


def phash_bucket(col: Column, bits: int = 12) -> Column:
    """Bucket key: the low ``bits`` bits of the phash. Near-duplicate pairs
    within Hamming ≤ t share a bucket with probability shrinking in t —
    the multi-probe variant ORs several bit-rotations (dedup_images.py)."""
    return col.bitwiseAND(F.lit((1 << bits) - 1))
