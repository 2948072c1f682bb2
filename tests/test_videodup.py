"""Video sequence fingerprint (operators/videodup.py): rotate-XOR
fold properties (order sensitivity, retouch locality, wrap), the
Spark fingerprint/pair/group pipeline over real MJPEG payloads, and
the quarantine path."""

from __future__ import annotations

import numpy as np
import pytest

from toy_vector_db_spark.operators.imagedup import dhash_bits
from toy_vector_db_spark.operators.jpeg import _parse_jpeg, encode_jpeg_planes
from toy_vector_db_spark.operators.video import split_mjpeg
from toy_vector_db_spark.operators.videodup import (
    video_dup_groups, video_dup_pairs, video_fp, video_fp_bits,
)

VFP_STEP, VFP_FSTEP = 125, 131


def _mjpeg(i: int, bump: tuple[int, int, int] | None = None) -> bytes:
    """Python twin of synth_mjpeg(frame_w=32, block_step=125,
    frame_step=131)."""
    nf = i % 3 + 2
    p = b""
    for f in range(nf):
        ks = np.arange(8)
        vals = i * 37 + f * VFP_FSTEP + ks * VFP_STEP
        if bump and f == bump[0]:
            vals = vals + np.where(ks == bump[1], bump[2], 0)
        yv = (vals % 251).reshape(2, 4).astype(np.float64)
        plane = np.repeat(np.repeat(yv, 8, 0), 8, 1)
        p += encode_jpeg_planes([plane], [(1, 1)], (32, 16))
    return p


def _fp_of(payload: bytes) -> int:
    return video_fp_bits([dhash_bits(_parse_jpeg(fb))
                          for fb in split_mjpeg(payload)])


def test_single_frame_is_dhash():
    frames = split_mjpeg(_mjpeg(4))
    h0 = dhash_bits(_parse_jpeg(frames[0]))
    assert video_fp_bits([h0]) == h0


def test_fold_order_sensitive():
    frames = split_mjpeg(_mjpeg(4))          # nf = 4%3+2 = 3 frames
    hashes = [dhash_bits(_parse_jpeg(fb)) for fb in frames]
    assert hashes[0] != hashes[1]            # distinct frames
    swapped = [hashes[1], hashes[0]] + hashes[2:]
    assert video_fp_bits(hashes) != video_fp_bits(swapped)


def test_fold_swap_equal_frames_is_noop():
    h = dhash_bits(_parse_jpeg(split_mjpeg(_mjpeg(4))[0]))
    assert video_fp_bits([h, h]) == video_fp_bits([h, h])
    # XOR of a hash with its own 1-rotation: deterministic, int64 range
    v = video_fp_bits([h, h])
    assert -(1 << 63) <= v < (1 << 63)


def test_fold_wraps_past_64_frames():
    h = 0b1011
    # frame 64 rotates by 64 % 64 = 0 — same contribution as frame 0
    assert video_fp_bits([h] + [0] * 63 + [h]) == 0


def test_retouch_locality():
    # a one-block, one-frame retouch moves at most 4 fp bits (the
    # flipped comparison is replicated across 4 sample rows)
    for i in (5, 6, 11, 12, 13):
        base = _fp_of(_mjpeg(i))
        twin = _fp_of(_mjpeg(i, (0, 0, 100)))
        ham = bin((base ^ twin) & ((1 << 64) - 1)).count("1")
        assert ham == 4


def test_end_to_end_order_sensitivity():
    # reversing the frame order of a real payload changes the fp
    # (id 3: two frames, distinct hashes — a 3-frame clip can be a
    # hash palindrome on this corpus, which reversal cannot detect)
    frames = split_mjpeg(_mjpeg(3))
    assert len(frames) == 2
    hashes = [dhash_bits(_parse_jpeg(fb)) for fb in frames]
    assert hashes[0] != hashes[1]
    assert _fp_of(b"".join(frames)) != _fp_of(b"".join(frames[::-1]))


@pytest.fixture(scope="module")
def vfp_corpus(spark):
    from toy_vector_db_spark.operators.video import synth_mjpeg
    base = synth_mjpeg(spark, n=8, frame_w=32, block_step=VFP_STEP,
                       frame_step=VFP_FSTEP)
    twin = synth_mjpeg(spark, n=8, frame_w=32, block_step=VFP_STEP,
                       frame_step=VFP_FSTEP, bump=(0, 0, 100),
                       id_prefix="vidB_")
    return base.unionByName(twin).localCheckpoint()


def test_video_fp_matches_local(spark, vfp_corpus):
    rows = {r["media_id"]: r["vfp"]
            for r in video_fp(vfp_corpus).collect()}
    assert len(rows) == 16 and all(v is not None for v in rows.values())
    for i in (0, 5, 7):
        assert rows[f"vid_{i}"] == _fp_of(_mjpeg(i))
        assert rows[f"vidB_{i}"] == _fp_of(_mjpeg(i, (0, 0, 100)))


def test_quarantine_null_fp(spark):
    bad = spark.createDataFrame(
        [("junk", bytearray(b"not a video")),
         ("trunc", bytearray(_mjpeg(3)[:-4]))],
        "media_id string, payload binary")
    rows = video_fp(bad).collect()
    assert all(r["vfp"] is None for r in rows) and len(rows) == 2


def test_near_dup_fixture_pairs(spark, vfp_corpus):
    pairs = {(r["id_a"], r["id_b"]): r["hamming"]
             for r in video_dup_pairs(vfp_corpus).collect()}
    # every retouched twin pairs with its base within the budget,
    # including ids whose retouch actually flips a comparison (ham 4)
    for i in range(8):
        a, b = sorted([f"vid_{i}", f"vidB_{i}"])
        assert pairs[(a, b)] <= 7
    assert pairs[tuple(sorted(["vid_5", "vidB_5"]))] == 4


def test_groups_cover_all_rows(spark, vfp_corpus):
    rows = video_dup_groups(vfp_corpus).collect()
    assert {r["media_id"] for r in rows} == \
        {f"vid_{i}" for i in range(8)} | {f"vidB_{i}" for i in range(8)}
    by_id = {r["media_id"]: r for r in rows}
    # base and its twin always land in one group (pair budget holds)
    for i in range(8):
        assert by_id[f"vid_{i}"]["group_id"] == \
            by_id[f"vidB_{i}"]["group_id"]


def test_video_grid_features_closed_form_and_plan(spark, vfp_corpus):
    # video first-class in similarity search: fixed 192-dim anchor-
    # frame embedding, exact integers, and the whole featurize +
    # top-k pipeline plans with ZERO exchanges (map-only featurize ->
    # TakeOrderedAndProject merged top-k, like image/audio knn)
    from toy_vector_db_spark.operators.knn import knn
    from toy_vector_db_spark.operators.videodup import video_grid_features

    def cells_py(i: int) -> list[float]:
        nf = i % 3 + 2
        out = []
        for a in (0, nf // 2, nf - 1):
            for b in range(64):
                r, c = divmod(b, 8)
                k = (0 if r < 4 else 4) + c // 2
                out.append(float(3 * ((i * 37 + a * VFP_FSTEP
                                       + k * VFP_STEP) % 251)))
        return out

    feats = video_grid_features(vfp_corpus)
    got = {r["media_id"]: list(r["features"]) for r in feats.collect()}
    for i in (0, 3, 7):
        assert got[f"vid_{i}"] == cells_py(i)
    top = knn(feats, cells_py(0), k=3, metric="euclidean",
              vec_col="features", exclude_id="vid_0",
              id_col="media_id", tie_col="media_id")
    plan = top._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    assert "TakeOrderedAndProject" in plan
    assert len(top.collect()) == 3


def test_video_features_quarantine(spark):
    bad = spark.createDataFrame([("junk", bytearray(b"not mjpeg"))],
                                "media_id string, payload binary")
    from toy_vector_db_spark.operators.videodup import video_grid_features
    assert video_grid_features(bad).collect()[0]["features"] is None
