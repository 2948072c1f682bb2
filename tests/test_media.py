"""Multimodal pipeline: schema, Arrow batch shape, map-only plans, and
(r8) the REAL pure-NumPy PPM/BMP codec path — decode, histogram
features, and nearest-neighbor resize are value-tested on generated
pixel fixtures; non-decodable payloads keep the deterministic
hash-fake contract."""

from __future__ import annotations

import numpy as np
import pytest

from toy_vector_db_spark.operators.media import (
    FEATURE_DIM, _parse_bmp, _parse_ppm, decode_media, encode_ppm,
    extract_media_features, frame_sample, resize_media, resize_plan,
    synth_media,
)


def _gradient(h: int, w: int) -> np.ndarray:
    """Deterministic pixel fixture: per-channel gradients."""
    y, x = np.mgrid[0:h, 0:w]
    return np.stack([(x * 255 // max(w - 1, 1)),
                     (y * 255 // max(h - 1, 1)),
                     ((x + y) % 256)], axis=-1).astype(np.uint8)


def _encode_bmp(arr: np.ndarray) -> bytes:
    """Minimal 24-bit BI_RGB bottom-up BMP writer (test-side inverse
    of _parse_bmp)."""
    h, w = arr.shape[:2]
    stride = (w * 3 + 3) & ~3
    raster = np.zeros((h, stride), dtype=np.uint8)
    raster[:, :w * 3] = arr[::-1, :, ::-1].reshape(h, w * 3)  # BGR bottom-up
    body = raster.tobytes()
    off = 14 + 40
    size = off + len(body)
    hdr = (b"BM" + size.to_bytes(4, "little") + b"\0\0\0\0"
           + off.to_bytes(4, "little")
           + (40).to_bytes(4, "little")
           + w.to_bytes(4, "little", signed=True)
           + h.to_bytes(4, "little", signed=True)
           + (1).to_bytes(2, "little") + (24).to_bytes(2, "little")
           + (0).to_bytes(4, "little") + len(body).to_bytes(4, "little")
           + (2835).to_bytes(4, "little") * 2
           + (0).to_bytes(4, "little") * 2)
    return hdr + body


def _media_df(spark, rows):
    return spark.createDataFrame(
        [(mid, "image", bytearray(payload), "image/x-test",
          None, None, None, {"source": "fixture"}) for mid, payload in rows],
        "media_id string, modality string, payload binary, mime_type string,"
        " width int, height int, duration_ms long,"
        " metadata map<string,string>")


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


# -- real codec path (r8) ----------------------------------------------------


def test_ppm_roundtrip_and_bmp_parse():
    px = _gradient(12, 17)
    assert np.array_equal(_parse_ppm(encode_ppm(px)), px)
    assert np.array_equal(_parse_bmp(_encode_bmp(px)), px)
    # comments + multi-whitespace PPM header
    hand = b"P6\n# a comment\n 3  2\n255\n" + bytes(range(18))
    assert _parse_ppm(hand).shape == (2, 3, 3)
    with pytest.raises(ValueError):
        _parse_ppm(b"P6\n3 2\n255\n\x00\x00")           # truncated raster
    with pytest.raises(ValueError):
        _parse_bmp(b"BM" + b"\x00" * 60)                # size field mismatch


def test_decode_media_real_pixels(spark):
    px_a, px_b = _gradient(8, 10), _gradient(16, 5)
    out = {r["media_id"]: r for r in decode_media(_media_df(spark, [
        ("ppm", encode_ppm(px_a)), ("bmp", _encode_bmp(px_b)),
        ("raw", b"\x01\x02\x03\x04"),
    ])).collect()}
    assert (out["ppm"]["width"], out["ppm"]["height"]) == (10, 8)
    assert out["ppm"]["mean_intensity"] == pytest.approx(px_a.mean())
    assert (out["bmp"]["width"], out["bmp"]["height"]) == (5, 16)
    assert out["bmp"]["mean_intensity"] == pytest.approx(px_b.mean())
    # non-decodable payload keeps the deterministic hash-fake contract
    assert 1 <= out["raw"]["width"] <= 1920


def test_features_are_real_histograms_for_pixels(spark):
    px = _gradient(9, 9)
    rows = {r["media_id"]: np.array(r["features"])
            for r in extract_media_features(_media_df(spark, [
                ("img", encode_ppm(px)), ("raw", b"\xde\xad\xbe\xef"),
            ])).collect()}
    hist, _ = np.histogram(px, bins=FEATURE_DIM, range=(0, 256))
    want = hist / np.linalg.norm(hist)
    assert np.allclose(rows["img"], want, atol=1e-6)
    assert abs(np.linalg.norm(rows["raw"]) - 1) < 1e-5


def test_resize_media_real_resample(spark):
    px = _gradient(64, 128)
    out = {r["media_id"]: r for r in resize_media(_media_df(spark, [
        ("img", encode_ppm(px)), ("raw", b"\x00\x01"),
    ]), 32, 32).collect()}
    r = out["img"]
    assert r["decoded"] and (r["width"], r["height"]) == (32, 16)
    resized = _parse_ppm(bytes(r["payload"]))
    assert resized.shape == (16, 32, 3)
    # nearest-neighbor: every output pixel exists in the source
    yi = (np.arange(16) * (64 / 16)).astype(int)
    xi = (np.arange(32) * (128 / 32)).astype(int)
    assert np.array_equal(resized, px[yi][:, xi])
    # aspect preserved within rounding
    assert abs(r["width"] / r["height"] - 128 / 64) < 0.2
    # non-decodable: untouched passthrough, flagged for quarantine
    assert not out["raw"]["decoded"]
    assert bytes(out["raw"]["payload"]) == b"\x00\x01"
    assert out["raw"]["width"] is None


def test_decode_rejects_magic_collision_gracefully(spark):
    # a payload that STARTS like a BMP but is garbage must fall back
    # to the hash-fake (the synthetic-corpus collision case), never
    # raise or mis-decode
    bad = b"BM" + bytes(range(48))
    out = decode_media(_media_df(spark, [("x", bad)])).collect()[0]
    assert out["n_bytes"] == 50 and 1 <= out["width"] <= 1920


# -- JVM-side real-format generators (r8 driver queries) ---------------------


def _formula_raster(i: int, n: int) -> np.ndarray:
    """The generators' shared pixel formula (media._PX)."""
    return np.array([(i * 37 + j * 11) % 251 for j in range(n)],
                    dtype=np.uint8)


def test_synth_ppm_bytes_match_real_parser(spark):
    from toy_vector_db_spark.operators.media import synth_ppm
    for r in synth_ppm(spark, n=8).collect():
        i = int(r["media_id"].split("_")[1])
        px = _parse_ppm(bytes(r["payload"]))
        assert px.shape == (r["height"], r["width"], 3)
        want = _formula_raster(i, r["width"] * r["height"] * 3)
        assert np.array_equal(px.reshape(-1), want)


def test_synth_bmp_bytes_match_real_parser(spark):
    from toy_vector_db_spark.operators.media import synth_bmp
    for r in synth_bmp(spark, n=6).collect():
        i = int(r["media_id"].split("_")[1])
        px = _parse_bmp(bytes(r["payload"]))
        assert px.shape == (r["height"], 4, 3)
        # parser un-does BGR bottom-up; re-apply to recover raster order
        raw = px[::-1, :, ::-1].reshape(-1)
        assert np.array_equal(raw, _formula_raster(i, 12 * r["height"]))


def test_synth_ppm_fixed_dims_resize_chain(spark):
    from pyspark.sql import functions as F
    from toy_vector_db_spark.operators.media import synth_ppm
    src = synth_ppm(spark, n=3, width=8, height=4)
    out = decode_media(
        resize_media(src, 2, 2).withColumn("modality", F.lit("image")))
    for r in out.collect():
        i = int(r["media_id"].split("_")[1])
        assert (r["width"], r["height"], r["n_bytes"]) == (2, 1, 17)
        want = _formula_raster(i, 96)[[0, 1, 2, 12, 13, 14]].mean()
        assert r["mean_intensity"] == pytest.approx(float(want))
    with pytest.raises(ValueError):
        synth_ppm(spark, n=1, width=10)  # header math is single-digit


# ---------------------------------------------------------------------------
# PNG (r9): stdlib-zlib codec
# ---------------------------------------------------------------------------

def test_png_roundtrip_every_filter():
    from toy_vector_db_spark.operators.media import _parse_png, encode_png
    rng = np.random.RandomState(11)
    for h, w in [(1, 1), (2, 3), (7, 5), (16, 9)]:
        px = rng.randint(0, 256, (h, w, 3), dtype=np.uint8)
        for filters in ([0], [1], [2], [3], [4], [0, 1, 2, 3, 4]):
            got = _parse_png(encode_png(px, filters=filters))
            assert np.array_equal(got, px), (h, w, filters)


def test_png_rejects_corruption_and_variants():
    from toy_vector_db_spark.operators.media import (
        _parse_png, _try_decode_pixels, encode_png,
    )
    px = _gradient(4, 4)
    good = encode_png(px)
    # CRC: flip one IDAT byte
    bad = bytearray(good)
    bad[45] ^= 0xFF
    with pytest.raises(ValueError, match="CRC"):
        _parse_png(bytes(bad))
    assert _try_decode_pixels(bytes(bad)) is None
    # unsupported variant: patch IHDR color type to grayscale (and
    # refresh the chunk CRC so only the variant check can fire)
    import zlib as _z
    hacked = bytearray(good)
    hacked[8 + 8 + 9] = 0                    # IHDR payload byte 9: color
    crc = _z.crc32(bytes(hacked[12:29])) & 0xFFFFFFFF
    hacked[29:33] = crc.to_bytes(4, "big")
    with pytest.raises(ValueError, match="unsupported"):
        _parse_png(bytes(hacked))
    # truncation
    with pytest.raises(ValueError):
        _parse_png(good[:30])


def test_synth_png_bytes_match_real_parser(spark):
    from toy_vector_db_spark.operators.media import _parse_png, synth_png
    for r in synth_png(spark, n=10).collect():
        i = int(r["media_id"].split("_")[1])
        px = _parse_png(bytes(r["payload"]))
        assert px.shape == (r["height"], r["width"], 3)
        want = _formula_raster(i, r["width"] * r["height"] * 3)
        assert np.array_equal(px.reshape(-1), want)


def test_png_through_decode_and_resize_and_dhash(spark):
    # the dispatch seam: PNG payloads flow through decode_media,
    # resize_media, and dhash_media exactly like PPM/BMP
    from pyspark.sql import functions as F
    from toy_vector_db_spark.operators.imagedup import (
        dhash_bits, dhash_media,
    )
    from toy_vector_db_spark.operators.media import (
        _parse_png, synth_png,
    )
    corpus = synth_png(spark, n=6)
    dec = {r["media_id"]: r for r in decode_media(corpus).collect()}
    pay = {r["media_id"]: bytes(r["payload"]) for r in corpus.collect()}
    for mid, r in dec.items():
        px = _parse_png(pay[mid])
        assert (r["width"], r["height"]) == (px.shape[1], px.shape[0])
        assert r["mean_intensity"] == pytest.approx(float(px.mean()))
    rs = resize_media(corpus, 2, 2)
    assert rs.filter("NOT decoded").count() == 0
    dh = {r["media_id"]: r["dhash"] for r in dhash_media(corpus).collect()}
    for mid, val in dh.items():
        assert val == dhash_bits(_parse_png(pay[mid]))


# ---------------------------------------------------------------------------
# WAV (r9): RIFF/WAVE PCM16 codec
# ---------------------------------------------------------------------------

def test_wav_roundtrip():
    from toy_vector_db_spark.operators.media import _parse_wav, encode_wav
    rng = np.random.RandomState(5)
    for frames, ch, rate in [(1, 1, 8000), (100, 2, 44100), (7, 3, 16000)]:
        s = rng.randint(-32768, 32768, (frames, ch)).astype(np.int16)
        back, r2 = _parse_wav(encode_wav(s, rate))
        assert r2 == rate and np.array_equal(back, s)


def test_wav_rejects_bad_payloads():
    from toy_vector_db_spark.operators.media import _parse_wav, encode_wav
    s = np.zeros((10, 1), dtype=np.int16)
    good = encode_wav(s, 8000)
    with pytest.raises(ValueError, match="RIFF"):
        _parse_wav(b"JUNK" + good[4:])
    with pytest.raises(ValueError, match="size field"):
        _parse_wav(good + b"extra")
    # non-PCM codec tag
    hacked = bytearray(good)
    hacked[20] = 3                                 # IEEE float tag
    with pytest.raises(ValueError, match="unsupported"):
        _parse_wav(bytes(hacked))
    with pytest.raises(ValueError):
        _parse_wav(good[:30])


def test_synth_wav_bytes_match_real_parser(spark):
    from toy_vector_db_spark.operators.media import _parse_wav, synth_wav
    for r in synth_wav(spark, n=8).collect():
        i = int(r["media_id"].split("_")[1])
        samples, rate = _parse_wav(bytes(r["payload"]))
        ns = (i % 4 + 1) * 50
        assert samples.shape == (ns, 1)
        assert rate == 8000 + (i % 3) * 4000
        want = (i * 1009 + np.arange(ns) * 757) % 30011
        assert np.array_equal(samples[:, 0], want.astype(np.int16))


def test_decode_audio_quarantines_undecodable(spark):
    from toy_vector_db_spark.operators.media import decode_audio, encode_wav
    s = (np.arange(6, dtype=np.int16) - 3).reshape(-1, 1)
    rows = [("ok", bytearray(encode_wav(s, 8000))),
            ("bad", bytearray(b"not audio at all"))]
    df = spark.createDataFrame(rows, "media_id STRING, payload BINARY")
    got = {r["media_id"]: r for r in decode_audio(df).collect()}
    assert got["ok"]["decoded"] and got["ok"]["n_samples"] == 6
    assert got["ok"]["mean_amplitude"] == pytest.approx(
        np.abs(np.arange(6) - 3).mean())
    assert not got["bad"]["decoded"]
    assert got["bad"]["n_samples"] is None
    assert got["bad"]["n_bytes"] == 16


def test_synth_bmp_padded_width_matches_parser(spark):
    # width 5 -> stride 16 with one pad byte per row; the parser must
    # slice the pad out, so the recovered raster is the formula at the
    # PIXEL positions only
    from toy_vector_db_spark.operators.media import synth_bmp
    for r in synth_bmp(spark, n=6, width=5).collect():
        i = int(r["media_id"].split("_")[1])
        px = _parse_bmp(bytes(r["payload"]))
        h = r["height"]
        assert px.shape == (h, 5, 3)
        raw = px[::-1, :, ::-1].reshape(h, 15)      # undo top-down + RGB
        full = _formula_raster(i, 16 * h).reshape(h, 16)
        assert np.array_equal(raw, full[:, :15])
    with pytest.raises(ValueError, match="header math"):
        synth_bmp(spark, n=1, width=20)
