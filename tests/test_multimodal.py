"""Audio/video multimodal plumbing: real raw-format decode end-to-end,
stubbed codec fmts raising cleanly, deterministic generators."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from osmcha_spark.images.multimodal import (
    audio_rows_for_batch,
    decode_audio,
    decode_frames,
    extract_audio_features,
    generate_audio,
    generate_video,
    sample_frames,
    video_rows_for_batch,
)


def test_stubbed_codecs_raise():
    with pytest.raises(NotImplementedError, match="mp3"):
        decode_audio(b"\x00\x01", "mp3")
    with pytest.raises(NotImplementedError, match="mp4"):
        decode_frames(b"\x00\x01", "mp4", 16, 12)


def test_audio_features_match_numpy(spark):
    audio = generate_audio(spark, 24, partitions=4)
    got = {r["audio_id"]: r for r in extract_audio_features(audio).collect()}
    ref = audio_rows_for_batch(np.arange(24))
    assert len(got) == 24
    for _, row in ref.iterrows():
        s = np.frombuffer(row["bytes"], dtype="<i2").astype(np.float64)
        g = got[row["audio_id"]]
        assert g["duration_s"] == pytest.approx(len(s) / row["sample_rate"])
        assert g["rms"] == pytest.approx(float(np.sqrt(np.mean(s * s))))
        assert g["peak"] == int(np.max(np.abs(s)))


def test_frame_sampling_exact(spark):
    video = generate_video(spark, 10, partitions=2)
    rows = sample_frames(video, every_k=3).collect()
    ref = video_rows_for_batch(np.arange(10))
    by_vid = {}
    for r in rows:
        by_vid.setdefault(r["video_id"], {})[r["frame_idx"]] = r
    for _, row in ref.iterrows():
        frames = np.frombuffer(row["bytes"], dtype=np.uint8).reshape(
            row["n_frames"], row["h"], row["w"], 3
        )
        sampled = by_vid[row["video_id"]]
        assert sorted(sampled) == list(range(0, row["n_frames"], 3))
        for i, r in sampled.items():
            f = frames[i]
            assert bytes(r["frame"]) == f.tobytes()
            assert r["mean_r"] == pytest.approx(float(f[:, :, 0].mean()))


def test_generators_deterministic(spark):
    a1 = generate_audio(spark, 8, partitions=2).collect()
    a2 = generate_audio(spark, 8, partitions=7).collect()
    k = lambda rows: sorted((r["audio_id"], bytes(r["bytes"])) for r in rows)
    assert k(a1) == k(a2)


def test_shot_cuts_land_on_shot_boundaries(spark):
    """shot_cuts (q113): detected cuts are EXACTLY the generator's
    4-frame shot boundaries — the threshold separates within-shot drift
    from the boundary jump with no false positives/negatives on any of
    the 24 fixture clips; clips shorter than one shot have none, and
    per-frame-aggregate deltas would see none of this (mod-256 shifts
    conserve frame sums — frame_sads docstring)."""
    from osmcha_spark.images.multimodal import (
        SHOT_LEN,
        generate_video,
        shot_cuts,
    )

    video = generate_video(spark, 24, partitions=4)
    meta = {r.video_id: r.n_frames
            for r in video.select("video_id", "n_frames").collect()}
    got = {r.video_id: (r.n_cuts, r.first_cut)
           for r in shot_cuts(video).collect()}
    assert set(got) == set(meta)
    saw_zero = saw_cuts = False
    for vid, nf in meta.items():
        boundaries = list(range(SHOT_LEN, nf, SHOT_LEN))
        want = (len(boundaries), boundaries[0] if boundaries else -1)
        assert got[vid] == want, (vid, nf, got[vid], want)
        saw_zero |= not boundaries
        saw_cuts |= bool(boundaries)
    assert saw_zero and saw_cuts
