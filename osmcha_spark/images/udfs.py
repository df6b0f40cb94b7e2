"""Arrow-vectorized image UDFs: the Spark-side plumbing for the binary
image column (no per-row Python dispatch; batch loops only).

- ``decode_pixels_udf`` — (bytes, fmt) → struct(w, h, pixels binary):
  decoded RGB as a flat binary column (HxWx3 row-major). Binary-in/
  binary-out keeps Arrow transfer compact; downstream numpy views it
  zero-copy.
- ``phash_udf`` — (bytes, fmt) → int64 aHash recomputed from pixels
  (must equal the corpus generator's stored phash bit-for-bit).
- ``psnr_udf`` — (bytes_a, fmt_a, bytes_b, fmt_b) → double PSNR between
  two encodings' decoded pixels (the per-row lossy invariant).
- ``grayscale_stats_udf`` — feature extraction example: mean/std of the
  grayscale channel.
- ``resize_block_udf`` — block-mean downsample by integer factor: the
  decode → transform → re-encode plumbing for multimodal pipelines.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql.functions import pandas_udf

from osmcha_spark.images.codec import decode_image, encode_image, psnr
from osmcha_spark.images.phash import ahash64_batch, gray_cells_batch


@pandas_udf("w int, h int, pixels binary")
def decode_pixels_udf(data: pd.Series, fmt: pd.Series) -> pd.DataFrame:
    out = []
    for b, f in zip(data, fmt):
        if b is None:
            out.append({"w": None, "h": None, "pixels": None})
            continue
        px = decode_image(bytes(b), f)
        out.append({"w": px.shape[1], "h": px.shape[0],
                    "pixels": px.tobytes()})
    return pd.DataFrame(out)


_GRAY_CHUNK = 1024  # ≤ ~37 MB of stacked 64×64 pixels per vectorized call


@pandas_udf("long")
def phash_udf(data: pd.Series, fmt: pd.Series) -> pd.Series:
    # Per image only the decode runs scalar; the gray cell-means are
    # computed in same-shape stacks (chunked) and the 64-bit packing once
    # per Arrow batch — the two tails that dominated the per-image cost.
    # Bit-identical to scalar ahash64: integer pixel sums are exact in
    # float64, so cell/global means don't depend on reduction order or
    # batching (see corpus._phash_batch) — pinned by tests against the
    # stored phash column.
    n = len(data)
    cells = np.zeros((n, 8, 8), dtype=np.float64)
    valid = np.zeros(n, dtype=bool)
    groups: dict[tuple, tuple[list, list]] = {}
    for i, (b, f) in enumerate(zip(data, fmt)):
        if b is None:
            continue
        px = decode_image(bytes(b), f)
        idxs, imgs = groups.setdefault(px.shape, ([], []))
        idxs.append(i)
        imgs.append(px)
        valid[i] = True
    for idxs, imgs in groups.values():
        for lo in range(0, len(idxs), _GRAY_CHUNK):
            chunk = slice(lo, lo + _GRAY_CHUNK)
            cells[np.asarray(idxs[chunk])] = gray_cells_batch(
                np.stack(imgs[chunk])
            )
    out = pd.Series(ahash64_batch(cells), dtype="Int64")
    out[~valid] = pd.NA
    return out


@pandas_udf("double")
def psnr_udf(
    data_a: pd.Series, fmt_a: pd.Series,
    data_b: pd.Series, fmt_b: pd.Series,
) -> pd.Series:
    vals = []
    for ba, fa, bb, fb in zip(data_a, fmt_a, data_b, fmt_b):
        pa_ = decode_image(bytes(ba), fa)
        pb_ = decode_image(bytes(bb), fb)
        vals.append(psnr(pa_, pb_))
    return pd.Series(vals, dtype="float64")


@pandas_udf("mean double, std double")
def grayscale_stats_udf(data: pd.Series, fmt: pd.Series) -> pd.DataFrame:
    out = []
    for b, f in zip(data, fmt):
        px = decode_image(bytes(b), f).astype(np.float64)
        gray = 0.299 * px[:, :, 0] + 0.587 * px[:, :, 1] + 0.114 * px[:, :, 2]
        out.append({"mean": float(gray.mean()), "std": float(gray.std())})
    return pd.DataFrame(out)


@pandas_udf("w int, h int, ok boolean")
def roundtrip_ok_udf(data: pd.Series, fmt: pd.Series) -> pd.DataFrame:
    """The per-row image invariant (BASELINE.json input_hint): decode →
    re-encode in the same fmt → decode again; lossless fmts must match
    exactly, the quantized lossy fmt must reach PSNR ≥ 40 dB. Returns the
    decoded dims too, so the oracle can cross-check them against the stored
    (w, h) columns."""
    out = []
    for b, f in zip(data, fmt):
        px = decode_image(bytes(b), f)
        px2 = decode_image(encode_image(px, f), f)
        if f == "qnt":
            ok = bool(psnr(px, px2) >= 40.0)
        else:
            ok = bool(px.shape == px2.shape and (px == px2).all())
        out.append({"w": px.shape[1], "h": px.shape[0], "ok": ok})
    return pd.DataFrame(out)


def resize_block_udf(factor: int, out_fmt: str = "ppm"):
    """Factory: (bytes, fmt) → re-encoded bytes downsampled by block mean.
    Dims must be divisible by ``factor`` (corpus dims are)."""

    @pandas_udf("binary")
    def _resize(data: pd.Series, fmt: pd.Series) -> pd.Series:
        out = []
        for b, f in zip(data, fmt):
            px = decode_image(bytes(b), f)
            h, w, _ = px.shape
            hc, wc = h - h % factor, w - w % factor
            small = (
                px[:hc, :wc]
                .reshape(hc // factor, factor, wc // factor, factor, 3)
                .mean(axis=(1, 3))
                .astype(np.uint8)
            )
            out.append(encode_image(small, out_fmt))
        return pd.Series(out)

    return _resize


@pandas_udf("brightness_milli long, contrast_milli long, sharpness_milli long")
def image_features_udf(data: pd.Series, fmt: pd.Series) -> pd.DataFrame:
    """decode → brightness/contrast/sharpness (images/features.py — the
    single shared spec also used by the fixture writer, so recomputed
    values must equal the stored columns exactly)."""
    from osmcha_spark.images.features import image_features

    out = []
    for b, f in zip(data, fmt):
        if b is None:
            out.append({"brightness_milli": None, "contrast_milli": None,
                        "sharpness_milli": None})
            continue
        br, ct, sh = image_features(decode_image(bytes(b), f))
        out.append({"brightness_milli": br, "contrast_milli": ct,
                    "sharpness_milli": sh})
    return pd.DataFrame(out)


@pandas_udf("ok boolean, w int, h int, err string")
def decode_safe_udf(data: pd.Series, fmt: pd.Series) -> pd.DataFrame:
    """Fault-tolerant decode: a corrupt/truncated/mislabeled image yields
    (ok=false, err=<reason>) instead of failing the task — at 10^12 rows
    some inputs WILL be bad and one poison row must not kill a stage.
    Valid rows return the decoded dims for downstream verification."""
    out = []
    for b, f in zip(data, fmt):
        if b is None:
            out.append({"ok": False, "w": None, "h": None,
                        "err": "null bytes"})
            continue
        try:
            px = decode_image(bytes(b), f)
            out.append({"ok": True, "w": int(px.shape[1]),
                        "h": int(px.shape[0]), "err": None})
        except Exception as e:  # noqa: BLE001 — the point is containment
            out.append({"ok": False, "w": None, "h": None,
                        "err": f"{type(e).__name__}: {e}"[:80]})
    return pd.DataFrame(out)


@pandas_udf("array<bigint>")
def block_means_udf(data: pd.Series, fmt: pd.Series) -> pd.Series:
    """decode → 4×4 per-block mean-luma grid (images/features.py:
    block_means — one shared integer spec with the fixture writer, so
    recomputed grids equal the stored column exactly, every format
    including the lossy one)."""
    from osmcha_spark.images.features import block_means

    out = []
    for b, f in zip(data, fmt):
        out.append(None if b is None
                   else block_means(decode_image(bytes(b), f)))
    return pd.Series(out)
