"""Deterministic synthetic image+caption corpus (BASELINE.json input_hint
schema) — generated distributed, any scale, no external data.

``images(image_id string, bytes binary, w int, h int, fmt string,
caption string, phash long)`` plus geo anchor columns (lon, lat) used by
the tiling joins.

Every value is a pure function of the row index (splitmix64-style integer
mixing), so the corpus is identical across runs, partitionings, and
parallelism levels — the property the two-cluster-size scaling evidence
depends on. Pixel synthesis is a gradient + per-pixel hash noise,
numpy-vectorized; generation happens inside ``mapInPandas`` over
``spark.range(n)`` so a 10^12-row corpus needs no driver-side data at all.

Skew: 30% of images snap to one of 5 urban hotspots (one hotspot takes
half of that mass) — deliberately Zipf-flavored so the salted-join path
has real skew to beat.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession

from osmcha_spark.images.codec import encode_image
from osmcha_spark.images.phash import ahash64

IMAGES_SCHEMA = (
    "image_id string, bytes binary, w int, h int, fmt string, "
    "caption string, phash long, lon double, lat double"
)

_CAPTION_POOL = [
    # benign
    "aerial view of the city center",
    "rooftops along the river bank",
    "suburban street grid at noon",
    "forest clearing with a trail",
    "harbor with container cranes",
    # suspect (trip the word rules)
    "imported tiles from google maps",
    "test tile please ignore",
    "bad mosaic stitching here",
    "data import from waze traces",
    # excluded-word false-positive bait
    "important landmark in the old town",
    "yandex panorama style street view",
]

_FMTS = ("ppm", "bmp", "png", "qnt")
_DIMS = ((32, 32), (48, 32), (64, 64))

_HOTSPOTS = [
    (-74.0060, 40.7128),  # NYC
    (139.6917, 35.6895),  # Tokyo
    (-0.1276, 51.5074),   # London
    (2.3522, 48.8566),    # Paris
    (77.2090, 28.6139),   # Delhi
]


def _mix(x: np.ndarray, salt: int) -> np.ndarray:
    """splitmix64 finalizer over uint64 — the corpus's one source of
    pseudo-randomness."""
    z = (
        x.astype(np.uint64)
        + np.uint64((salt * 0x9E3779B97F4A7C15) & 0xFFFFFFFFFFFFFFFF)
    ) * np.uint64(0xBF58476D1CE4E5B9)
    z ^= z >> np.uint64(27)
    z *= np.uint64(0x94D049BB133111EB)
    z ^= z >> np.uint64(31)
    return z


def pixels_for(idx: int, w: int, h: int) -> np.ndarray:
    """HxWx3 uint8: per-id oriented wave pattern + hash noise.

    The pattern's frequency, orientation, and phase all derive from the id
    hash so the 8×8 block-mean structure (hence the phash) varies across
    images — a plain gradient makes every phash nearly identical and turns
    the near-dup join into an O(N²) degenerate case."""
    ys, xs = np.mgrid[0:h, 0:w].astype(np.int64)
    hp = int(_mix(np.array([idx], dtype=np.uint64), 9)[0])
    fx = 1 + (hp & 7)
    fy = 1 + ((hp >> 3) & 7)
    phase = (hp >> 6) & 255
    blk = 4 + ((hp >> 14) & 7)
    noise = _mix(
        xs.astype(np.uint64) * np.uint64(73856093)
        ^ ys.astype(np.uint64) * np.uint64(19349663),
        idx + 1,
    )
    wave = (xs * fx * 255) // w + (ys * fy * 255) // h + phase
    checker = ((xs // blk + ys // blk) & 1) * ((hp >> 20) & 127)
    r = (wave + checker + (noise & np.uint64(63)).astype(np.int64)) % 256
    g = (wave * 2 + ((noise >> np.uint64(8)) & np.uint64(63)).astype(np.int64)) % 256
    b = (checker * 2 + (xs * 255) // w
         + ((noise >> np.uint64(16)) & np.uint64(63)).astype(np.int64)) % 256
    return np.stack([r, g, b], axis=-1).astype(np.uint8)


def row_for(idx: int) -> dict:
    # every 37th row is a planted near-duplicate of its predecessor: same
    # base pattern, a sprinkle of perturbed pixels — Hamming(phash) is
    # usually 0-3, giving the near-dup join real positives to find.
    planted = idx % 37 == 1 and idx > 0
    pat_idx = idx - 1 if planted else idx
    h1 = int(_mix(np.array([pat_idx], dtype=np.uint64), 1)[0])
    h2 = int(_mix(np.array([idx], dtype=np.uint64), 2)[0])
    w, h = _DIMS[h1 % len(_DIMS)]
    fmt = _FMTS[(h1 >> 8) % len(_FMTS)]
    caption = _CAPTION_POOL[(h1 >> 16) % len(_CAPTION_POOL)]

    # geo anchor with hotspot skew
    sel = (h2 >> 32) % 10
    if sel < 3:  # 30% hotspot mass
        hx, hy = _HOTSPOTS[0] if sel == 0 else _HOTSPOTS[1 + (h2 % 4)]
        lon = hx + ((h2 % 20001) - 10000) / 1.0e5
        lat = hy + (((h2 >> 16) % 20001) - 10000) / 1.0e5
    else:
        lon = (h2 % 360_000_000) / 1.0e6 - 180.0
        lat = ((h2 >> 20) % 170_000_000) / 1.0e6 - 85.0

    px = pixels_for(pat_idx, w, h)
    if planted:
        px = px.copy()
        mask = (
            _mix(np.arange(h * w, dtype=np.uint64), idx + 77)
            % np.uint64(97)
        ).reshape(h, w) == 0
        px[mask] = 255 - px[mask]
    return {
        "image_id": f"img{idx:012d}",
        "bytes": encode_image(px, fmt),
        "w": w, "h": h, "fmt": fmt,
        "caption": caption,
        "phash": ahash64(px),
        "lon": lon, "lat": lat,
    }


def generate_images(
    spark: SparkSession, n: int, partitions: int | None = None
) -> DataFrame:
    """Distributed corpus: ``spark.range(n)`` → mapInPandas(row_for)."""
    rng = spark.range(0, n, numPartitions=partitions) if partitions else \
        spark.range(0, n)

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame([row_for(int(i)) for i in pdf["id"]])

    return rng.mapInPandas(gen, IMAGES_SCHEMA)


def write_images_parquet(path: str, n: int) -> None:
    """Driver-side small-scale writer (test fixtures) — same rows as the
    distributed generator by construction."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    rows = [row_for(i) for i in range(n)]
    schema = pa.schema([
        ("image_id", pa.string()), ("bytes", pa.binary()),
        ("w", pa.int32()), ("h", pa.int32()), ("fmt", pa.string()),
        ("caption", pa.string()), ("phash", pa.int64()),
        ("lon", pa.float64()), ("lat", pa.float64()),
    ])
    pq.write_table(pa.Table.from_pylist(rows, schema=schema), path)
