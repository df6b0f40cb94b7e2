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
from osmcha_spark.images.phash import ahash64, ahash64_batch

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


def _pixels_batch(pat_idx: np.ndarray, w: int, h: int) -> np.ndarray:
    """(B, h, w, 3) uint8 — vectorized twin of :func:`pixels_for` (same
    integer ops, wraparound, and order, so outputs are byte-identical;
    asserted in tests).

    All channel math runs in int32 (every intermediate is < 2^31 and
    non-negative: wave ≤ 2·8·255 + 255, checker ≤ 127·2, noise fields ≤ 63,
    so // and % match the scalar int64 path exactly); only the splitmix
    noise needs uint64. Output is written channel-by-channel into the final
    uint8 buffer — no stack, no wide temporaries."""
    B = len(pat_idx)
    ys, xs = np.mgrid[0:h, 0:w].astype(np.int32)
    xs = xs[None, :, :]
    ys = ys[None, :, :]
    hp = _mix(pat_idx.astype(np.uint64), 9)
    fx = (1 + (hp & np.uint64(7))).astype(np.int32)[:, None, None]
    fy = (1 + ((hp >> np.uint64(3)) & np.uint64(7))).astype(np.int32)[:, None, None]
    phase = ((hp >> np.uint64(6)) & np.uint64(255)).astype(np.int32)[:, None, None]
    blk = (4 + ((hp >> np.uint64(14)) & np.uint64(7))).astype(np.int32)[:, None, None]
    chk_amp = (
        ((hp >> np.uint64(20)) & np.uint64(127)).astype(np.int32)[:, None, None]
    )

    base = (
        xs.astype(np.uint64) * np.uint64(73856093)
        ^ ys.astype(np.uint64) * np.uint64(19349663)
    )
    # _mix(base, idx + 1) with a per-image salt, inlined batched: the salt
    # term (salt · golden) wraps mod 2^64 exactly like the scalar path.
    salt_term = (pat_idx.astype(np.uint64) + np.uint64(1)) * np.uint64(
        0x9E3779B97F4A7C15
    )
    z = base + salt_term[:, None, None]
    z *= np.uint64(0xBF58476D1CE4E5B9)
    z ^= z >> np.uint64(27)
    z *= np.uint64(0x94D049BB133111EB)
    z ^= z >> np.uint64(31)
    n0 = (z & np.uint64(63)).astype(np.int32)
    n1 = ((z >> np.uint64(8)) & np.uint64(63)).astype(np.int32)
    n2 = ((z >> np.uint64(16)) & np.uint64(63)).astype(np.int32)
    del z, base

    wave = (xs * fx * 255) // w
    wave += (ys * fy * 255) // h
    wave += phase
    checker = ((xs // blk + ys // blk) & 1) * chk_amp

    out = np.empty((B, h, w, 3), dtype=np.uint8)
    out[..., 0] = (wave + checker + n0) % 256
    out[..., 1] = (wave * 2 + n1) % 256
    out[..., 2] = (checker * 2 + (xs * 255) // w + n2) % 256
    return out


def _phash_batch(px: np.ndarray) -> np.ndarray:
    """(B,) int64 aHash of a (B, h, w, 3) uint8 batch — same arithmetic as
    phash.ahash64 (integer sums are exact in float64, so the block means and
    the global mean are bit-identical regardless of reduction order)."""
    B, h, w, _ = px.shape
    hc, wc = (h // 8) * 8, (w // 8) * 8
    p = px[:, :hc, :wc].astype(np.uint32)
    gray = (299 * p[:, :, :, 0] + 587 * p[:, :, :, 1] + 114 * p[:, :, :, 2]) // 1000
    cells = gray.reshape(B, 8, hc // 8, 8, wc // 8).mean(axis=(2, 4))
    return ahash64_batch(cells)


_BATCH_CHUNK = 1024


def rows_for_batch(indices: np.ndarray) -> pd.DataFrame:
    """Vectorized corpus rows for an int64 index array — identical values to
    ``[row_for(i) for i in indices]`` (golden-tested), ~5× faster: pixels and
    phash are batched numpy; only the format encoders loop per image."""
    from osmcha_spark.images.codec import encode_image as _enc

    indices = np.asarray(indices, dtype=np.int64)
    n = len(indices)
    idx_u = indices.astype(np.uint64)
    planted = (indices % 37 == 1) & (indices > 0)
    pat_idx = indices - planted.astype(np.int64)

    h1 = _mix(pat_idx.astype(np.uint64), 1)
    h2 = _mix(idx_u, 2)

    dim_sel = (h1 % np.uint64(len(_DIMS))).astype(np.int64)
    fmt_sel = ((h1 >> np.uint64(8)) % np.uint64(len(_FMTS))).astype(np.int64)
    cap_sel = (
        (h1 >> np.uint64(16)) % np.uint64(len(_CAPTION_POOL))
    ).astype(np.int64)

    # geo anchor with hotspot skew (same branch structure as row_for)
    sel = ((h2 >> np.uint64(32)) % np.uint64(10)).astype(np.int64)
    hot_i = np.where(
        sel == 0, 0, 1 + (h2 % np.uint64(4)).astype(np.int64)
    )
    hx = np.array([p[0] for p in _HOTSPOTS])[hot_i]
    hy = np.array([p[1] for p in _HOTSPOTS])[hot_i]
    lon_hot = hx + ((h2 % np.uint64(20001)).astype(np.int64) - 10000) / 1.0e5
    lat_hot = hy + (
        ((h2 >> np.uint64(16)) % np.uint64(20001)).astype(np.int64) - 10000
    ) / 1.0e5
    lon_uni = (h2 % np.uint64(360_000_000)).astype(np.int64) / 1.0e6 - 180.0
    lat_uni = (
        (h2 >> np.uint64(20)) % np.uint64(170_000_000)
    ).astype(np.int64) / 1.0e6 - 85.0
    lon = np.where(sel < 3, lon_hot, lon_uni)
    lat = np.where(sel < 3, lat_hot, lat_uni)

    img_bytes: list[bytes | None] = [None] * n
    phash = np.zeros(n, dtype=np.int64)
    w_col = np.zeros(n, dtype=np.int32)
    h_col = np.zeros(n, dtype=np.int32)

    for d, (w, h) in enumerate(_DIMS):
        grp = np.flatnonzero(dim_sel == d)
        w_col[grp] = w
        h_col[grp] = h
        for s in range(0, len(grp), _BATCH_CHUNK):
            sub = grp[s:s + _BATCH_CHUNK]
            px = _pixels_batch(pat_idx[sub], w, h)
            pl = np.flatnonzero(planted[sub])
            if len(pl):
                ar = np.arange(h * w, dtype=np.uint64)
                salts = (indices[sub][pl] + 77).astype(np.uint64)
                z = (
                    ar[None, :]
                    + salts[:, None] * np.uint64(0x9E3779B97F4A7C15)
                ) * np.uint64(0xBF58476D1CE4E5B9)
                z ^= z >> np.uint64(27)
                z *= np.uint64(0x94D049BB133111EB)
                z ^= z >> np.uint64(31)
                mask = (z % np.uint64(97) == 0).reshape(-1, h, w)
                flip = px[pl]
                flip[mask] = 255 - flip[mask]
                px[pl] = flip
            phash[sub] = _phash_batch(px)
            for j, row_i in enumerate(sub):
                img_bytes[row_i] = _enc(px[j], _FMTS[fmt_sel[row_i]])

    return pd.DataFrame(
        {
            "image_id": [f"img{i:012d}" for i in indices],
            "bytes": img_bytes,
            "w": w_col,
            "h": h_col,
            "fmt": [_FMTS[s] for s in fmt_sel],
            "caption": [_CAPTION_POOL[s] for s in cap_sel],
            "phash": phash,
            "lon": lon,
            "lat": lat,
        }
    )


def generate_images(
    spark: SparkSession, n: int, partitions: int | None = None
) -> DataFrame:
    """Distributed corpus: ``spark.range(n)`` → mapInPandas(rows_for_batch).
    Arrow-batched and numpy-vectorized; one yielded frame per input batch."""
    rng = spark.range(0, n, numPartitions=partitions) if partitions else \
        spark.range(0, n)

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield rows_for_batch(pdf["id"].to_numpy(np.int64))

    return rng.mapInPandas(gen, IMAGES_SCHEMA)


def write_images_parquet(path: str, n: int) -> None:
    """Driver-side small-scale writer (test fixtures) — same rows as the
    distributed generator by construction, plus generation-time expected
    feature columns (brightness/contrast/sharpness, images/features.py)
    computed from the RE-DECODED bytes so they equal what a consumer of
    the binary column recomputes — exact even for the lossy fmt."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from osmcha_spark.images.codec import decode_image
    from osmcha_spark.images.features import block_means, image_features

    rows = [row_for(i) for i in range(n)]
    for r in rows:
        px = decode_image(r["bytes"], r["fmt"])
        br, ct, sh = image_features(px)
        r["brightness_milli"] = br
        r["contrast_milli"] = ct
        r["sharpness_milli"] = sh
        r["block_means"] = block_means(px)
    schema = pa.schema([
        ("image_id", pa.string()), ("bytes", pa.binary()),
        ("w", pa.int32()), ("h", pa.int32()), ("fmt", pa.string()),
        ("caption", pa.string()), ("phash", pa.int64()),
        ("lon", pa.float64()), ("lat", pa.float64()),
        ("brightness_milli", pa.int64()), ("contrast_milli", pa.int64()),
        ("sharpness_milli", pa.int64()),
        ("block_means", pa.list_(pa.int64())),
    ])
    pq.write_table(pa.Table.from_pylist(rows, schema=schema), path)
