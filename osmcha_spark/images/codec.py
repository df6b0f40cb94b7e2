"""From-scratch image codecs (SURVEY.md §2.7 F10): PPM, BMP, PNG, QNT.

No PIL/imageio in the environment — these are pure numpy + stdlib zlib,
built for the engine's binary `bytes` column (BASELINE.json input_hint
schema). All functions operate on HxWx3 uint8 RGB arrays.

Formats:
- **ppm** — binary P6, 8-bit RGB (the simplest interchange baseline).
- **bmp** — BI_RGB 24-bit, bottom-up, BGR, 4-byte row padding (the classic
  Windows DIB layout, written from the spec).
- **png** — 8-bit truecolor; encoder emits filter-0 scanlines + one zlib
  IDAT; decoder implements the full filter set 0-4 (Sub/Up/Average/Paeth)
  per the PNG spec so foreign 8-bit RGB PNGs decode too.
- **qnt** — the engine's deliberately-lossy format exercising the
  PSNR≥40 dB invariant: 5-bit uniform quantization per channel with
  midpoint reconstruction (step 8 → MSE ≈ 5.5 → PSNR ≈ 40.7 dB).

These run inside Arrow-batched pandas UDFs (images/udfs.py); per-image
work is numpy-vectorized, the per-batch Python loop is over images only.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np


# ---------------------------------------------------------------- ppm

def _encode_ppm(px: np.ndarray) -> bytes:
    h, w, _ = px.shape
    return b"P6\n%d %d\n255\n" % (w, h) + px.tobytes()


def _decode_ppm(data: bytes) -> np.ndarray:
    # header: magic, width, height, maxval — whitespace-separated, then one
    # whitespace byte before the raster.
    if not data.startswith(b"P6"):
        raise ValueError("not a P6 ppm")
    fields: list[int] = []
    i = 2
    while len(fields) < 3:
        while data[i : i + 1].isspace():
            i += 1
        if data[i : i + 1] == b"#":  # comment line
            while data[i : i + 1] not in (b"\n", b""):
                i += 1
            continue
        j = i
        while not data[j : j + 1].isspace():
            j += 1
        fields.append(int(data[i:j]))
        i = j
    i += 1  # single whitespace after maxval
    w, h, maxval = fields
    if maxval != 255:
        raise ValueError("only 8-bit ppm supported")
    return (
        np.frombuffer(data, dtype=np.uint8, count=w * h * 3, offset=i)
        .reshape(h, w, 3)
        .copy()
    )


# ---------------------------------------------------------------- bmp

def _encode_bmp(px: np.ndarray) -> bytes:
    h, w, _ = px.shape
    row_bytes = w * 3
    pad = (4 - row_bytes % 4) % 4
    bgr = px[::-1, :, ::-1]  # bottom-up, BGR
    if pad:
        rows = np.zeros((h, row_bytes + pad), dtype=np.uint8)
        rows[:, :row_bytes] = bgr.reshape(h, row_bytes)
        body = rows.tobytes()
    else:
        body = bgr.tobytes()
    data_size = len(body)
    header = struct.pack(
        "<2sIHHI", b"BM", 14 + 40 + data_size, 0, 0, 14 + 40
    ) + struct.pack(
        "<IiiHHIIiiII", 40, w, h, 1, 24, 0, data_size, 2835, 2835, 0, 0
    )
    return header + body


def _decode_bmp(data: bytes) -> np.ndarray:
    if data[:2] != b"BM":
        raise ValueError("not a BMP")
    offset = struct.unpack_from("<I", data, 10)[0]
    hdr_size = struct.unpack_from("<I", data, 14)[0]
    if hdr_size < 40:
        raise ValueError("unsupported BMP header")
    w, h = struct.unpack_from("<ii", data, 18)
    bpp = struct.unpack_from("<H", data, 28)[0]
    comp = struct.unpack_from("<I", data, 30)[0]
    if bpp != 24 or comp != 0:
        raise ValueError("only 24-bit BI_RGB supported")
    row_bytes = w * 3
    stride = (row_bytes + 3) & ~3
    flip = h > 0
    h = abs(h)
    raw = np.frombuffer(data, dtype=np.uint8, count=stride * h, offset=offset)
    rows = raw.reshape(h, stride)[:, :row_bytes].reshape(h, w, 3)
    if flip:
        rows = rows[::-1]
    return rows[:, :, ::-1].copy()  # BGR→RGB


# ---------------------------------------------------------------- png

def _png_chunk(tag: bytes, body: bytes) -> bytes:
    return (
        struct.pack(">I", len(body)) + tag + body
        + struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF)
    )


def _encode_png(px: np.ndarray) -> bytes:
    h, w, _ = px.shape
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)  # 8-bit truecolor
    scan = np.zeros((h, 1 + w * 3), dtype=np.uint8)
    scan[:, 1:] = px.reshape(h, w * 3)  # filter byte 0 per row
    return (
        b"\x89PNG\r\n\x1a\n"
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", zlib.compress(scan.tobytes(), 6))
        + _png_chunk(b"IEND", b"")
    )


def _paeth(a: np.ndarray, b: np.ndarray, c: np.ndarray) -> np.ndarray:
    p = a.astype(np.int16) + b.astype(np.int16) - c.astype(np.int16)
    pa, pb, pc = np.abs(p - a), np.abs(p - b), np.abs(p - c)
    out = np.where((pa <= pb) & (pa <= pc), a, np.where(pb <= pc, b, c))
    return out.astype(np.uint8)


def _decode_png(data: bytes) -> np.ndarray:
    if data[:8] != b"\x89PNG\r\n\x1a\n":
        raise ValueError("not a PNG")
    pos, idat, w = 8, [], None
    while pos < len(data):
        (length,) = struct.unpack_from(">I", data, pos)
        tag = data[pos + 4 : pos + 8]
        body = data[pos + 8 : pos + 8 + length]
        pos += 12 + length
        if tag == b"IHDR":
            w, h, depth, ctype, comp, filt, interlace = struct.unpack(
                ">IIBBBBB", body
            )
            if depth != 8 or ctype != 2 or interlace != 0:
                raise ValueError("only 8-bit truecolor non-interlaced PNG")
        elif tag == b"IDAT":
            idat.append(body)
        elif tag == b"IEND":
            break
    raw = zlib.decompress(b"".join(idat))
    stride = w * 3
    rows = np.frombuffer(raw, dtype=np.uint8).reshape(h, 1 + stride)
    filters = rows[:, 0]
    if not filters.any():
        # all filter-0 scanlines (what our encoder emits): the raster is the
        # payload verbatim — skip the per-row defilter loop entirely
        return rows[:, 1:].reshape(h, w, 3).copy()
    out = np.zeros((h, stride), dtype=np.uint8)
    bpp = 3
    for y in range(h):
        line = rows[y, 1:].copy()
        f = filters[y]
        prev = out[y - 1] if y else np.zeros(stride, dtype=np.uint8)
        if f == 0:
            out[y] = line
        elif f == 1:  # Sub — sequential in x, vectorize per pixel-chunk
            acc = line.reshape(-1, bpp).astype(np.int16)
            for i in range(1, acc.shape[0]):
                acc[i] = (acc[i] + acc[i - 1]) & 0xFF
            out[y] = acc.astype(np.uint8).reshape(-1)
        elif f == 2:  # Up
            out[y] = (line.astype(np.int16) + prev) & 0xFF
        elif f == 3:  # Average
            acc = line.reshape(-1, bpp).astype(np.int16)
            pr = prev.reshape(-1, bpp).astype(np.int16)
            left = np.zeros(bpp, dtype=np.int16)
            for i in range(acc.shape[0]):
                acc[i] = (acc[i] + ((left + pr[i]) >> 1)) & 0xFF
                left = acc[i]
            out[y] = acc.astype(np.uint8).reshape(-1)
        elif f == 4:  # Paeth
            acc = line.reshape(-1, bpp)
            pr = prev.reshape(-1, bpp)
            res = np.zeros_like(acc)
            left = np.zeros(bpp, dtype=np.uint8)
            upleft = np.zeros(bpp, dtype=np.uint8)
            for i in range(acc.shape[0]):
                pred = _paeth(left, pr[i], upleft)
                res[i] = (acc[i].astype(np.int16) + pred) & 0xFF
                left = res[i]
                upleft = pr[i]
            out[y] = res.reshape(-1)
        else:
            raise ValueError(f"bad PNG filter {f}")
    return out.reshape(h, w, 3).copy()


# ---------------------------------------------------------------- qnt

_QNT_MAGIC = b"QNT1"


def _encode_qnt(px: np.ndarray) -> bytes:
    h, w, _ = px.shape
    levels = (px >> 3).astype(np.uint8)  # 5-bit levels
    return _QNT_MAGIC + struct.pack("<II", w, h) + levels.tobytes()


def _decode_qnt(data: bytes) -> np.ndarray:
    if data[:4] != _QNT_MAGIC:
        raise ValueError("not QNT")
    w, h = struct.unpack_from("<II", data, 4)
    levels = np.frombuffer(
        data, dtype=np.uint8, count=w * h * 3, offset=12
    ).reshape(h, w, 3)
    return np.minimum(levels.astype(np.int16) * 8 + 4, 255).astype(np.uint8)


# ---------------------------------------------------------------- api

_ENCODERS = {
    "ppm": _encode_ppm, "bmp": _encode_bmp,
    "png": _encode_png, "qnt": _encode_qnt,
}
_DECODERS = {
    "ppm": _decode_ppm, "bmp": _decode_bmp,
    "png": _decode_png, "qnt": _decode_qnt,
}
FORMATS = tuple(_ENCODERS)
LOSSLESS = ("ppm", "bmp", "png")


def encode_image(px: np.ndarray, fmt: str) -> bytes:
    return _ENCODERS[fmt](np.ascontiguousarray(px, dtype=np.uint8))


def decode_image(data: bytes, fmt: str) -> np.ndarray:
    return _DECODERS[fmt](data)


def psnr(a: np.ndarray, b: np.ndarray) -> float:
    """10·log10(255² / MSE); inf when identical (F12)."""
    mse = np.mean(
        (a.astype(np.float64) - b.astype(np.float64)) ** 2
    )
    if mse == 0:
        return float("inf")
    return float(10.0 * np.log10(255.0**2 / mse))
