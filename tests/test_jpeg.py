"""Baseline JPEG codec (operators/jpeg.py): exact block-constant
round-trips, general lossy round-trips within quantization tolerance,
restart markers, 4:4:4 vs 4:2:0 vs grayscale paths, corruption
rejection, dispatch through media._try_decode_pixels, and the
perceptual-dedup pipeline riding JPEG payloads unchanged."""

from __future__ import annotations

import numpy as np
import pytest

from toy_vector_db_spark.operators.jpeg import (
    ZIGZAG, _parse_jpeg, demo_quant, encode_jpeg, encode_jpeg_planes,
    rgb_to_ycbcr, synth_jpeg, synth_jpeg_gray,
)
from toy_vector_db_spark.operators.media import _try_decode_pixels


def _block_constant_planes(i: int, w: int = 32):
    wb = w // 8
    yv = ((i * 37 + np.arange(2 * wb) * 11) % 251) \
        .reshape(2, wb).astype(np.float64)
    mx = wb // 2
    cbv = ((i * 53 + np.arange(mx) * 17) % 251) \
        .reshape(1, mx).astype(np.float64)
    crv = ((i * 29 + np.arange(mx) * 23) % 251) \
        .reshape(1, mx).astype(np.float64)
    rep = lambda a: np.repeat(np.repeat(a, 8, 0), 8, 1)
    return rep(yv), rep(cbv), rep(crv)


def _expected_rgb(y, cb, cr):
    """The JFIF conversion exactly as the decoder computes it."""
    cbf = np.repeat(np.repeat(cb, 2, 0), 2, 1)
    crf = np.repeat(np.repeat(cr, 2, 0), 2, 1)
    r = y + 1.402 * (crf - 128.0)
    g = y - 0.344136 * (cbf - 128.0) - 0.714136 * (crf - 128.0)
    b = y + 1.772 * (cbf - 128.0)
    return np.clip(np.floor(np.stack([r, g, b], -1) + 0.5),
                   0, 255).astype(np.uint8)


def test_zigzag_matches_spec_prefix():
    # first 16 entries of the T.81 zigzag in natural (row*8+col) form
    assert list(ZIGZAG[:16]) == [0, 1, 8, 16, 9, 2, 3, 10,
                                 17, 24, 32, 25, 18, 11, 4, 5]


def test_block_constant_color_roundtrip_exact():
    for i in (0, 3, 7, 250):
        y, cb, cr = _block_constant_planes(i)
        data = encode_jpeg_planes([y, cb, cr],
                                  [(2, 2), (1, 1), (1, 1)], (32, 16))
        assert np.array_equal(_parse_jpeg(data), _expected_rgb(y, cb, cr))


def test_block_constant_gray_roundtrip_exact():
    yv = ((5 * 37 + np.arange(8) * 11) % 251).reshape(2, 4)
    y = np.repeat(np.repeat(yv, 8, 0), 8, 1).astype(np.float64)
    px = _parse_jpeg(encode_jpeg_planes([y], [(1, 1)], (32, 16)))
    assert np.array_equal(px, np.stack([y.astype(np.uint8)] * 3, -1))


def test_gray_random_q1_near_lossless():
    rng = np.random.RandomState(1)
    img = rng.randint(0, 256, (17, 9)).astype(np.uint8)
    px = _parse_jpeg(encode_jpeg(img))
    assert px.shape == (17, 9, 3)
    # q=1 grayscale: error bounded by DCT quantization rounding only
    assert np.abs(px[:, :, 0].astype(int) - img.astype(int)).max() <= 2
    assert np.array_equal(px[:, :, 0], px[:, :, 1])


def test_color_444_random_q1_tolerance():
    rng = np.random.RandomState(2)
    img = rng.randint(0, 256, (13, 21, 3)).astype(np.uint8)
    px = _parse_jpeg(encode_jpeg(img, subsample=False))
    assert px.shape == img.shape
    # q=1, no subsampling: RGB<->YCbCr rounding + DCT rounding
    assert np.abs(px.astype(int) - img.astype(int)).max() <= 6


def test_color_420_smooth_tolerance():
    # 4:2:0 must be judged on chroma-smooth content (random noise has
    # no meaningful chroma after a 2x2 box filter)
    y, x = np.mgrid[0:24, 0:40]
    img = np.stack([(x * 6) % 256, (y * 9) % 256,
                    ((x + y) * 3) % 256], -1).astype(np.uint8)
    px = _parse_jpeg(encode_jpeg(img, subsample=True))
    assert px.shape == img.shape
    ycc_in = rgb_to_ycbcr(img).astype(int)
    ycc_out = rgb_to_ycbcr(px).astype(int)
    # luma is full-res: tight; chroma went through the 2x2 box filter
    assert np.abs(ycc_out[..., 0] - ycc_in[..., 0]).mean() < 3.0


def test_restart_markers_roundtrip():
    y, cb, cr = _block_constant_planes(9)
    base = encode_jpeg_planes([y, cb, cr],
                              [(2, 2), (1, 1), (1, 1)], (32, 16))
    with_rst = encode_jpeg_planes([y, cb, cr],
                                  [(2, 2), (1, 1), (1, 1)], (32, 16),
                                  restart_interval=1)
    assert b"\xFF\xD0" in with_rst  # RST0 actually emitted
    assert np.array_equal(_parse_jpeg(with_rst), _parse_jpeg(base))


def test_lossy_quant_table_decodes():
    rng = np.random.RandomState(3)
    img = rng.randint(0, 256, (16, 16, 3)).astype(np.uint8)
    px = _parse_jpeg(encode_jpeg(img, quant=[demo_quant(2), demo_quant(4)]))
    assert px.shape == img.shape  # lossy but structurally valid


def test_odd_dimensions_crop():
    rng = np.random.RandomState(4)
    img = rng.randint(0, 256, (11, 19, 3)).astype(np.uint8)
    for sub in (False, True):
        assert _parse_jpeg(encode_jpeg(img, subsample=sub)).shape == (11, 19, 3)


@pytest.mark.parametrize("mutate,msg", [
    (lambda d: d[:20], "trunc"),
    (lambda d: d[:-2], "no EOI"),
    (lambda d: b"\xFF\xD8\xFF\xC2" + d[4:], "progressive"),
    (lambda d: d.replace(b"\xFF\xC0", b"\xFF\xC2", 1), "progressive2"),
])
def test_corruption_rejected(mutate, msg):
    y, cb, cr = _block_constant_planes(1)
    data = encode_jpeg_planes([y, cb, cr],
                              [(2, 2), (1, 1), (1, 1)], (32, 16))
    with pytest.raises(ValueError):
        _parse_jpeg(mutate(data))


def test_sos_reorder_rejected():
    # spec-invalid but parseable: SOS listing components in a different
    # order than SOF must quarantine (coeffs are allocated in SOF order
    # but filled in scan order — decoding would swap channels)
    y, cb, cr = _block_constant_planes(1)
    data = encode_jpeg_planes([y, cb, cr],
                              [(2, 2), (1, 1), (1, 1)], (32, 16))
    sos = data.index(b"\xFF\xDA")
    ents = bytearray(data)
    base = sos + 5                      # FFDA + len(2) + ns(1)
    ents[base:base + 2], ents[base + 2:base + 4] = \
        data[base + 2:base + 4], data[base:base + 2]
    with pytest.raises(ValueError, match="SOS component order"):
        _parse_jpeg(bytes(ents))


def test_dispatch_magic():
    y, cb, cr = _block_constant_planes(2)
    data = encode_jpeg_planes([y, cb, cr],
                              [(2, 2), (1, 1), (1, 1)], (32, 16))
    px = _try_decode_pixels(data)
    assert px is not None and px.shape == (16, 32, 3)
    # corrupted JPEG falls to None (quarantine), never mis-decodes
    assert _try_decode_pixels(data[:-2]) is None


def test_synth_jpeg_decodes_in_spark(spark):
    from toy_vector_db_spark.operators.media import decode_media
    rows = {r["media_id"]: r for r in
            decode_media(synth_jpeg(spark, n=6)).collect()}
    assert len(rows) == 6
    for i in range(6):
        r = rows[f"jpg_{i}"]
        assert (r["width"], r["height"]) == (16 * (i % 2 + 1), 16)
        # replay the closed-form mean the oracle uses
        w = 16 * (i % 2 + 1)
        wb = w // 8
        y, cb, cr = _block_constant_planes(i, w=w)
        exp = _expected_rgb(y, cb, cr)
        assert abs(r["mean_intensity"] - exp.mean()) < 1e-9


def test_dedup_rides_jpeg(spark):
    # near-dup twins through the REAL jpeg decode: id_mod collapses
    # ids to 4 residue classes; each class's members are byte-identical
    # so dHash distance 0 -> every same-class pair is found.
    from toy_vector_db_spark.operators.imagedup import (
        dhash_media, image_dup_pairs)
    corpus = synth_jpeg_gray(spark, n=8, id_mod=4)
    hashed = {r["media_id"]: r["dhash"] for r in
              dhash_media(corpus).collect()}
    assert all(v is not None for v in hashed.values())
    assert hashed["jpgg_0"] == hashed["jpgg_4"]
    assert hashed["jpgg_1"] == hashed["jpgg_5"]
    pairs = {(r["id_a"], r["id_b"]): r["hamming"] for r in
             image_dup_pairs(corpus, bands=4, max_hamming=3).collect()}
    assert pairs[("jpgg_0", "jpgg_4")] == 0
    assert pairs[("jpgg_3", "jpgg_7")] == 0


def test_jpeg_gray_bump_twin_near(spark):
    # a one-block retouch stays within a few dHash bits of its base
    from toy_vector_db_spark.operators.imagedup import dhash_media
    base = dhash_media(synth_jpeg_gray(spark, n=4)).collect()
    twin = dhash_media(synth_jpeg_gray(spark, n=4, bump=(0, 97),
                                       id_prefix="jpgt_")).collect()
    bh = {r["media_id"].split("_")[1]: r["dhash"] for r in base}
    th = {r["media_id"].split("_")[1]: r["dhash"] for r in twin}
    for k in bh:
        ham = bin((bh[k] ^ th[k]) & ((1 << 64) - 1)).count("1")
        assert ham <= 8


def test_resize_media_rides_jpeg(spark):
    # resize_media dispatches through _try_decode_pixels, so JPEG
    # payloads resample for free (output re-encoded as PPM)
    from toy_vector_db_spark.operators.media import resize_media
    resized = resize_media(synth_jpeg(spark, n=4), target_w=8,
                           target_h=8)
    rows = {r["media_id"]: r for r in resized.collect()}
    for i in range(4):
        r = rows[f"jpg_{i}"]
        # 16x16 frames letterbox to 8x8; 32x16 frames to 8x4
        exp = (8, 8) if i % 2 == 0 else (8, 4)
        assert r["decoded"] and (r["width"], r["height"]) == exp
