"""Audio/video columns as opaque binary + typed metadata (engine-only;
training-data pipeline ops).

The container ships no media codecs (no ffmpeg/PIL/librosa), so the
codec-dependent decodes are STUBS behind ``NotImplementedError`` with the
Spark-side plumbing — schema, partitioning, Arrow batch shape, mapInPandas
signatures — fully real and tested. Two raw formats ARE decoded for real,
so every downstream feature/sampling operator runs end-to-end:

- audio ``pcm16``: little-endian int16 mono samples (``np.frombuffer``),
- video ``rawrgb``: concatenated H×W×3 uint8 frames.

The deterministic generators below synthesize those raw formats from the
row index with the same splitmix64 family as the image corpus — identical
across runs, partitionings, and parallelism levels.

Operators (all Arrow-batched, no per-row Python dispatch):

- ``extract_audio_features`` — mapInPandas: (bytes, fmt, sample_rate) →
  duration_s, rms, zero-crossing rate, peak.
- ``sample_frames`` — mapInPandas flatMap: one row per sampled frame
  (every k-th), with the frame's bytes and channel means — the
  frame-sample primitive of a video-curation pipeline.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

AUDIO_SCHEMA = (
    "audio_id string, bytes binary, sample_rate int, n_samples int, "
    "fmt string, caption string"
)
VIDEO_SCHEMA = (
    "video_id string, bytes binary, w int, h int, n_frames int, "
    "fps double, fmt string, caption string"
)

AUDIO_FEATURES_SCHEMA = (
    "audio_id string, duration_s double, rms double, zcr double, "
    "peak int"
)
FRAME_SCHEMA = (
    "video_id string, frame_idx int, frame binary, mean_r double, "
    "mean_g double, mean_b double"
)


def decode_audio(data: bytes, fmt: str) -> np.ndarray:
    """int16 sample array. Only the raw ``pcm16`` fmt is decodable in this
    environment; compressed fmts need an audio codec library."""
    if fmt == "pcm16":
        return np.frombuffer(data, dtype="<i2")
    raise NotImplementedError(
        f"audio fmt {fmt!r}: no codec library in this environment — "
        "plug a decoder in here (same (bytes, fmt) -> int16[] contract)"
    )


def decode_frames(data: bytes, fmt: str, w: int, h: int) -> np.ndarray:
    """(n_frames, h, w, 3) uint8. Only raw ``rawrgb`` is decodable here."""
    if fmt == "rawrgb":
        frame_sz = w * h * 3
        n = len(data) // frame_sz
        return np.frombuffer(data, dtype=np.uint8)[: n * frame_sz].reshape(
            n, h, w, 3
        )
    raise NotImplementedError(
        f"video fmt {fmt!r}: no codec library in this environment — "
        "plug a decoder in here (same (bytes, fmt, w, h) -> frames contract)"
    )


def _mix(x: np.ndarray, salt: int) -> np.ndarray:
    z = (
        x.astype(np.uint64)
        + np.uint64((int(salt) * 0x9E3779B97F4A7C15) & 0xFFFFFFFFFFFFFFFF)
    ) * np.uint64(0xBF58476D1CE4E5B9)
    z ^= z >> np.uint64(27)
    z *= np.uint64(0x94D049BB133111EB)
    z ^= z >> np.uint64(31)
    return z


def audio_rows_for_batch(indices: np.ndarray) -> pd.DataFrame:
    """Deterministic pcm16 clips: a per-id sine + hash noise. Pure function
    of the index."""
    rows = []
    for idx in np.asarray(indices, dtype=np.int64):
        h = int(_mix(np.array([idx], dtype=np.uint64), 31)[0])
        sr = (8000, 16000)[h % 2]
        n = 400 + (h >> 8) % 1200
        t = np.arange(n, dtype=np.float64)
        freq = 100.0 + ((h >> 16) % 200)
        amp = 3000 + ((h >> 24) % 8000)
        noise = (
            (_mix(t.astype(np.uint64), idx + 5) % np.uint64(501)).astype(
                np.int64
            )
            - 250
        )
        samples = (
            amp * np.sin(2 * np.pi * freq * t / sr) + noise
        ).astype("<i2")
        rows.append({
            "audio_id": f"aud{int(idx):09d}",
            "bytes": samples.tobytes(),
            "sample_rate": sr,
            "n_samples": n,
            "fmt": "pcm16",
            "caption": f"clip {int(idx)} at {freq:.0f}hz",
        })
    return pd.DataFrame(rows)


#: shot-cut threshold: a frame pair is a CUT when the mean absolute
#: per-subpixel luma-sum jump exceeds this (integer rule, see shot_cuts).
#: The synthetic clips drift ~45/subpixel within a shot and jump
#: ~110/subpixel across the 4-frame shot boundaries.
SHOT_THR = 80
SHOT_LEN = 4


def video_rows_for_batch(indices: np.ndarray) -> pd.DataFrame:
    """Deterministic rawrgb clips: per-frame shifted gradient within
    4-frame SHOTS; each shot boundary adds a large gradient offset (the
    scene cut the q113 detector looks for)."""
    rows = []
    for idx in np.asarray(indices, dtype=np.int64):
        h = int(_mix(np.array([idx], dtype=np.uint64), 37)[0])
        w, ht = ((16, 12), (24, 16))[h % 2]
        n_frames = 4 + (h >> 8) % 12
        ys, xs = np.mgrid[0:ht, 0:w].astype(np.int64)
        frames = np.empty((n_frames, ht, w, 3), dtype=np.uint8)
        for f in range(n_frames):
            shot = f // SHOT_LEN
            base = (xs * 7 + ys * 3 + f * 11 + shot * 101
                    + (h >> 16) % 97)
            frames[f, :, :, 0] = base % 256
            frames[f, :, :, 1] = (base * 2) % 256
            frames[f, :, :, 2] = (base + f * 29) % 256
        rows.append({
            "video_id": f"vid{int(idx):09d}",
            "bytes": frames.tobytes(),
            "w": w, "h": ht, "n_frames": n_frames,
            "fps": 10.0,
            "fmt": "rawrgb",
            "caption": f"clip {int(idx)}",
        })
    return pd.DataFrame(rows)


def generate_audio(
    spark: SparkSession, n: int, partitions: int | None = None
) -> DataFrame:
    rng = spark.range(0, n, numPartitions=partitions) if partitions else \
        spark.range(0, n)

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield audio_rows_for_batch(pdf["id"].to_numpy(np.int64))

    return rng.mapInPandas(gen, AUDIO_SCHEMA)


def generate_video(
    spark: SparkSession, n: int, partitions: int | None = None
) -> DataFrame:
    rng = spark.range(0, n, numPartitions=partitions) if partitions else \
        spark.range(0, n)

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield video_rows_for_batch(pdf["id"].to_numpy(np.int64))

    return rng.mapInPandas(gen, VIDEO_SCHEMA)


def extract_audio_features(audio: DataFrame) -> DataFrame:
    """(audio_id, duration_s, rms, zcr, peak) via mapInPandas — the
    feature-extraction stage of an audio-curation pipeline."""
    cols = audio.select("audio_id", "bytes", "fmt", "sample_rate")

    def feats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for aid, data, fmt, sr in zip(
                pdf["audio_id"], pdf["bytes"], pdf["fmt"], pdf["sample_rate"]
            ):
                s = decode_audio(bytes(data), fmt).astype(np.float64)
                zc = np.count_nonzero(np.signbit(s[1:]) != np.signbit(s[:-1]))
                out.append({
                    "audio_id": aid,
                    "duration_s": len(s) / float(sr),
                    "rms": float(np.sqrt(np.mean(s * s))) if len(s) else 0.0,
                    "zcr": zc / max(len(s) - 1, 1),
                    "peak": int(np.max(np.abs(s))) if len(s) else 0,
                })
            yield pd.DataFrame(
                out, columns=["audio_id", "duration_s", "rms", "zcr", "peak"]
            )

    return cols.mapInPandas(feats, AUDIO_FEATURES_SCHEMA)


def sample_frames(video: DataFrame, every_k: int = 2) -> DataFrame:
    """One output row per sampled frame (frame 0, k, 2k, …) with the raw
    frame bytes and per-channel means — the frame-sample primitive. A
    flatMap-shaped mapInPandas: input batch of videos → larger batch of
    frames (Arrow handles the fan-out)."""
    cols = video.select("video_id", "bytes", "fmt", "w", "h")

    def frames(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for vid, data, fmt, w, h in zip(
                pdf["video_id"], pdf["bytes"], pdf["fmt"], pdf["w"], pdf["h"]
            ):
                fr = decode_frames(bytes(data), fmt, int(w), int(h))
                for i in range(0, fr.shape[0], every_k):
                    f = fr[i]
                    out.append({
                        "video_id": vid,
                        "frame_idx": i,
                        "frame": f.tobytes(),
                        "mean_r": float(f[:, :, 0].mean()),
                        "mean_g": float(f[:, :, 1].mean()),
                        "mean_b": float(f[:, :, 2].mean()),
                    })
            yield pd.DataFrame(
                out,
                columns=["video_id", "frame_idx", "frame",
                         "mean_r", "mean_g", "mean_b"],
            )

    return cols.mapInPandas(frames, FRAME_SCHEMA)


SAD_SCHEMA = (
    "video_id string, frame_idx int, sad long, denom long"
)


def frame_sads(video: DataFrame) -> DataFrame:
    """One row per CONSECUTIVE frame pair with the integer SAD (sum of
    absolute per-subpixel differences) — the classic shot-boundary
    signal. A per-frame aggregate (e.g. the luma-sum delta) cannot see a
    cut in wrap-around gradients: a mod-256 shift moves every pixel but
    leaves the frame SUM nearly unchanged, so the metric must difference
    pixels BEFORE reducing. All int64 (≤ 255·w·h·3 per pair), so the
    q113 expectations are exact.

    The whole clip sits in one row (bytes = all frames), so adjacent
    pairs difference inside the same Arrow batch — a flatMap-shaped
    mapInPandas like :func:`sample_frames`, no self-join on frame index.
    ``denom`` = w·h·3 rides along so the threshold rule downstream stays
    a pure Column comparison.
    """
    cols = video.select("video_id", "bytes", "fmt", "w", "h")

    def sads(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for vid, data, fmt, w, h in zip(
                pdf["video_id"], pdf["bytes"], pdf["fmt"], pdf["w"], pdf["h"]
            ):
                fr = decode_frames(bytes(data), fmt, int(w), int(h))
                a = fr.astype(np.int64)
                d = np.abs(a[1:] - a[:-1]).sum(axis=(1, 2, 3))
                for i, s in enumerate(d, start=1):
                    out.append({
                        "video_id": vid,
                        "frame_idx": i,
                        "sad": int(s),
                        "denom": int(w) * int(h) * 3,
                    })
            yield pd.DataFrame(
                out, columns=["video_id", "frame_idx", "sad", "denom"]
            )

    return cols.mapInPandas(sads, SAD_SCHEMA)


def shot_cuts(video: DataFrame, thr: int = SHOT_THR) -> DataFrame:
    """Per-video shot-cut report: ``(video_id, n_cuts, first_cut)`` where
    frame f is a cut iff SAD(f-1, f) > thr · w·h·3 (mean per-subpixel
    jump above ``thr``; exact integer comparison). ``first_cut`` = -1
    when a clip has no cuts. Everything after the Arrow crossing is
    Column algebra: one groupBy(video_id), conditional count + min."""
    s = frame_sads(video)
    is_cut = F.col("sad") > F.lit(int(thr)) * F.col("denom")
    return (
        s.groupBy("video_id")
        .agg(
            F.coalesce(
                F.sum(F.when(is_cut, 1)), F.lit(0)
            ).cast("int").alias("n_cuts"),
            F.coalesce(
                F.min(F.when(is_cut, F.col("frame_idx"))), F.lit(-1)
            ).cast("int").alias("first_cut"),
        )
    )
