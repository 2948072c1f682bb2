"""MJPEG video modality (operators/video.py): marker-accurate frame
splitting, per-frame real decode, quarantine, and the synthetic
corpus' closed-form contract."""

from __future__ import annotations

import numpy as np
import pytest

from toy_vector_db_spark.operators.jpeg import (
    demo_quant, encode_jpeg, encode_jpeg_planes,
)
from toy_vector_db_spark.operators.video import (
    _jpeg_frame_end, decode_video_frames, split_mjpeg, synth_mjpeg,
)


def _gray_frame(vals: np.ndarray) -> bytes:
    plane = np.repeat(np.repeat(vals.astype(np.float64), 8, 0), 8, 1)
    return encode_jpeg_planes([plane], [(1, 1)],
                              (plane.shape[1], plane.shape[0]))


def test_split_roundtrip():
    f1 = _gray_frame(np.array([[10, 20], [30, 40]]))
    f2 = _gray_frame(np.array([[50, 60], [70, 80]]))
    f3 = _gray_frame(np.array([[90, 91], [92, 93]]))
    frames = split_mjpeg(f1 + f2 + f3)
    assert frames == [f1, f2, f3]


def test_frame_end_walks_headers_not_bytescan():
    # a frame whose DQT contains the 0xFF 0xD8 byte pair must not be
    # split early — the walker skips segment payloads by length
    q = np.ones((8, 8), dtype=np.int64)
    q[0, 1] = 0xFF         # zigzag stream positions 1 and 2 are the
    q[1, 0] = 0xD8         # natural (0,1), (1,0) cells -> adjacent bytes
    rng = np.random.RandomState(0)
    img = rng.randint(0, 256, (8, 8)).astype(np.uint8)
    fb = encode_jpeg(img, quant=[q, q])
    assert b"\xff\xd8" in fb[4:]       # the pair really is inside
    assert _jpeg_frame_end(fb, 0) == len(fb)
    assert split_mjpeg(fb + fb) == [fb, fb]


def test_split_rejects_garbage():
    f1 = _gray_frame(np.array([[10, 20], [30, 40]]))
    for bad in (b"", b"junk", f1[:-2], f1 + b"trailing"):
        with pytest.raises(ValueError):
            split_mjpeg(bad)


def test_restart_marker_frames_split():
    rng = np.random.RandomState(1)
    img = rng.randint(0, 256, (16, 16, 3)).astype(np.uint8)
    fb = encode_jpeg(img, restart_interval=1)
    assert split_mjpeg(fb + fb) == [fb, fb]


def test_decode_video_frames_values(spark):
    rows = decode_video_frames(synth_mjpeg(spark, n=6)).collect()
    by_vid: dict = {}
    for r in rows:
        assert r["decoded"]
        by_vid.setdefault(r["media_id"], []).append(r)
    for i in range(6):
        frames = sorted(by_vid[f"vid_{i}"], key=lambda r: r["frame_idx"])
        assert len(frames) == i % 3 + 2
        for f, r in enumerate(frames):
            exp = np.mean([(i * 37 + f * 19 + k * 11) % 251
                           for k in range(4)])
            assert (r["width"], r["height"]) == (16, 16)
            assert abs(r["mean_intensity"] - exp) < 1e-9


def test_decode_video_quarantine(spark):
    df = spark.createDataFrame(
        [("junk", b"not a video")], "media_id string, payload binary")
    rows = decode_video_frames(df).collect()
    assert len(rows) == 1 and not rows[0]["decoded"]
    assert rows[0]["frame_idx"] is None


def test_decode_plan_is_map_only(spark):
    # the 100 TB contract: payloads never shuffle — the per-frame
    # decode plan must contain no Exchange
    plan = decode_video_frames(synth_mjpeg(spark, n=2)) \
        ._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
