"""Multimodal plumbing: schema, Arrow batch shape, map-only plans.
The codec itself is a documented deterministic stub (no media libs in
this environment) — what's under test is the Spark-side pipeline."""

from __future__ import annotations

from toy_vector_db_spark.operators.media import (
    FEATURE_DIM, decode_media, extract_media_features, frame_sample,
    resize_plan, synth_media,
)


def test_synth_media_deterministic(spark):
    a = synth_media(spark, 10).collect()
    b = synth_media(spark, 10).collect()
    assert [r["payload"] for r in a] == [r["payload"] for r in b]
    assert all(len(r["payload"]) == 128 for r in a)  # 4 x sha256-hex decoded


def test_decode_media_stub(spark):
    out = decode_media(synth_media(spark, 20)).collect()
    assert len(out) == 20
    for r in out:
        assert r["n_bytes"] == 128
        assert 1 <= r["width"] <= 1920 and 1 <= r["height"] <= 1080
        assert 0.0 <= r["mean_intensity"] <= 255.0
    # deterministic: same payload -> same decode
    again = decode_media(synth_media(spark, 20)).collect()
    assert sorted(map(tuple, out)) == sorted(map(tuple, again))


def test_extract_media_features(spark):
    rows = extract_media_features(synth_media(spark, 5)).collect()
    import numpy as np
    for r in rows:
        v = np.array(r["features"])
        assert v.shape == (FEATURE_DIM,)
        assert np.linalg.norm(v) == 1.0 or abs(np.linalg.norm(v) - 1) < 1e-5


def test_frame_sample(spark):
    vids = synth_media(spark, 6, modality="video")
    frames = frame_sample(vids, every_ms=1000)
    rows = frames.collect()
    per = {}
    for r in rows:
        per.setdefault(r["media_id"], []).append(r["frame_ms"])
    durations = {r["media_id"]: r["duration_ms"] for r in vids.collect()}
    for mid, offs in per.items():
        assert offs == list(range(0, durations[mid], 1000))
    assert frame_sample(synth_media(spark, 6, modality="image"),
                        1000).count() == 0  # images have no frames


def test_resize_plan(spark):
    rows = resize_plan(synth_media(spark, 8), 128, 128).collect()
    for r in rows:
        assert max(r["out_w"], r["out_h"]) <= 128
        assert r["out_w"] == int(r["width"] * r["scale"])
