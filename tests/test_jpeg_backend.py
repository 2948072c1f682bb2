"""JPEG backend seam (media._decode_jpeg, r11): knob resolution and
quarantine behavior everywhere; Pillow/libjpeg equivalence where
Pillow is installed (skip-marked otherwise — this sandbox ships no
image libraries, so the parity contract runs wherever the fast
backend actually exists).

Parity contract: grayscale block-constant fixtures are BIT-EXACT on
both backends (DC-only blocks, no color convert, no upsampling —
both decoders reduce to the same integer). Color goes through
libjpeg's fixed-point YCbCr math (coefficients rounded at 2^-16) and
fancy chroma upsampling, which can each move a pixel ±1 LSB vs the
reference codec's float64 JFIF arithmetic — so color parity is
tolerance-checked, and value-hash-critical pipelines pin
SPARK_GRAFT_JPEG_BACKEND=numpy (knob comment in media.py)."""

from __future__ import annotations

import numpy as np
import pytest

from toy_vector_db_spark.operators.jpeg import (
    _parse_jpeg, encode_jpeg, encode_jpeg_planes,
)
from toy_vector_db_spark.operators.media import (
    _HAVE_PIL, _decode_jpeg, _try_decode_pixels,
)

needs_pil = pytest.mark.skipif(not _HAVE_PIL, reason="Pillow not installed")


def _gray_payload(i: int = 5) -> bytes:
    yv = ((i * 37 + np.arange(8) * 11) % 251).reshape(2, 4)
    y = np.repeat(np.repeat(yv, 8, 0), 8, 1).astype(np.float64)
    return encode_jpeg_planes([y], [(1, 1)], (32, 16))


def test_numpy_backend_is_reference_codec():
    p = _gray_payload()
    assert np.array_equal(_decode_jpeg(p, "numpy"), _parse_jpeg(p))


def test_unknown_backend_rejected():
    with pytest.raises(ValueError, match="unknown JPEG backend"):
        _decode_jpeg(_gray_payload(), "nope")


def test_pil_backend_unavailable_raises():
    if _HAVE_PIL:
        pytest.skip("Pillow installed — the unavailable branch is moot")
    with pytest.raises(ValueError, match="not installed"):
        _decode_jpeg(_gray_payload(), "pil")


def test_auto_resolves_by_availability():
    # without Pillow, auto == numpy; with it, auto == pil (parity
    # below makes the two indistinguishable on gray fixtures)
    p = _gray_payload()
    auto = _decode_jpeg(p, "auto")
    assert np.array_equal(auto, _decode_jpeg(
        p, "pil" if _HAVE_PIL else "numpy"))


def test_env_knob_resolves_at_call_time(monkeypatch):
    p = _gray_payload()
    monkeypatch.setenv("SPARK_GRAFT_JPEG_BACKEND", "numpy")
    assert np.array_equal(_try_decode_pixels(p), _parse_jpeg(p))
    monkeypatch.setenv("SPARK_GRAFT_JPEG_BACKEND", "bogus")
    with pytest.raises(ValueError, match="unknown JPEG backend"):
        _try_decode_pixels(p)


def test_quarantine_contract_numpy():
    assert _decode_jpeg(_gray_payload()[:20], "numpy") is None


@needs_pil
def test_gray_block_constant_bit_exact():
    for i in (0, 3, 7, 250):
        p = _gray_payload(i)
        assert np.array_equal(_decode_jpeg(p, "pil"),
                              _decode_jpeg(p, "numpy"))


@needs_pil
def test_color_444_within_one_lsb():
    # fixed-point color-convert rounding only (no chroma upsample)
    rng = np.random.RandomState(7)
    img = rng.randint(0, 256, (16, 24, 3)).astype(np.uint8)
    p = encode_jpeg(img, subsample=False)
    a = _decode_jpeg(p, "pil").astype(int)
    b = _decode_jpeg(p, "numpy").astype(int)
    assert np.abs(a - b).max() <= 1


@needs_pil
def test_color_420_luma_close():
    # fancy vs nearest chroma upsampling differ at chroma-block
    # boundaries by design; luma is full-res on both
    y, x = np.mgrid[0:24, 0:40]
    img = np.stack([(x * 6) % 256, (y * 9) % 256,
                    ((x + y) * 3) % 256], -1).astype(np.uint8)
    p = encode_jpeg(img, subsample=True)
    a = _decode_jpeg(p, "pil").astype(int)
    b = _decode_jpeg(p, "numpy").astype(int)
    assert np.abs(a - b).mean() <= 4.0


@needs_pil
def test_pil_quarantines_garbage():
    assert _decode_jpeg(b"\xFF\xD8\xFF garbage", "pil") is None
