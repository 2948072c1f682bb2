"""Multimodal columns: image/audio/video as opaque binary + typed
metadata (schema.MEDIA_SCHEMA), with decode / feature-extract / resize /
frame-sample operators.

Beyond-parity training-data-pipeline tier. The Spark-side plumbing —
schema, Arrow batch shape, mapInPandas signatures, partitioning — is
real and tested. The codec layer is REAL for four dependency-free
image formats — binary PPM (P6), uncompressed 24-bit BMP (both r8,
pure NumPy), 8-bit RGB PNG (r9: stdlib zlib inflate + NumPy scanline
unfiltering, ``_parse_png``), and baseline JPEG (r10: marker walk +
Huffman + IDCT + 4:2:0 upsample, ``jpeg._parse_jpeg``) — plus
RIFF/WAVE PCM16 audio: width/height/intensity come from actual
pixels, and ``resize_media`` does an actual nearest-neighbor
resample. Payloads in any OTHER format fall back to
a deterministic payload-hash fake (clearly marked below) so synthetic
corpora stay testable end-to-end; plugging Pillow/torchaudio/PyAV in
means extending ``_decode_backend``'s dispatch only — every plan
shape stays identical.

Scale notes: payloads never shuffle — decode/feature UDFs are map-only
(mapInPandas, one Arrow batch at a time, bounded memory via
``maxRecordsPerBatch``); frame sampling is a pure Column explode.
"""

from __future__ import annotations

import hashlib
import io
import os
import zlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..schema import MEDIA_SCHEMA

FEATURE_DIM = 64

DECODED_DDL = ("media_id STRING, modality STRING, n_bytes LONG, "
               "width INT, height INT, mean_intensity DOUBLE")
FEATURES_DDL = f"media_id STRING, features ARRAY<FLOAT>"


def synth_media(spark: SparkSession, n: int = 100, modality: str = "image",
                seed: int = 42) -> DataFrame:
    """Deterministic synthetic media table: payload bytes derived from
    sha2 chains, JVM-side (no Python in the generator)."""
    base = spark.range(n).select(
        F.concat(F.lit(f"{modality}_"), F.col("id").cast("string")).alias("media_id"),
        F.lit(modality).alias("modality"),
        F.to_binary(F.concat(*[
            F.sha2(F.concat(F.lit(f"{seed}:{i}:"), F.col("id").cast("string")), 256)
            for i in range(4)]), F.lit("hex")).alias("payload"),
        F.lit("application/octet-stream").alias("mime_type"),
        (F.pmod(F.col("id"), 8) * 64 + 64).cast("int").alias("width"),
        (F.pmod(F.col("id"), 6) * 64 + 64).cast("int").alias("height"),
        (F.pmod(F.col("id"), 30) * 1000 + 1000).alias("duration_ms"),
        F.create_map(F.lit("source"), F.lit("synthetic")).alias("metadata"))
    _ = MEDIA_SCHEMA  # canonical schema; synth output matches it by construction
    return base


#: pixel-byte formula shared by the real-format generators below and
#: their ANSI-SQL oracles: byte j of image id is (id*37 + j*11) % 251.
#: 251 is prime and coprime to both strides, so every image gets a
#: distinct non-degenerate raster; the modulus stays < 256 so each
#: value is a single byte and < 2^53 so float64 sums are exact.
_PX = "lpad(hex((id*37 + j*11) % 251), 2, '0')"


def synth_ppm(spark: SparkSession, n: int = 40,
              width: int | None = None, height: int | None = None,
              id_mod: int | None = None,
              bump: tuple[int, int] | None = None,
              id_prefix: str = "ppm_") -> DataFrame:
    """Deterministic REAL binary-PPM corpus, generated JVM-side (pure
    Column expressions — no Python in the generator): image ``id`` is
    ``(id%4)+2 x (id%3)+2`` (or the fixed ``width x height``), pixel
    byte ``j`` = ``(eid*37 + j*11) % 251``. Because every decoded
    statistic is closed-form in (id, w, h), a DuckDB oracle can
    value-hash the real ``_parse_ppm`` path end to end.

    Near-dup corpus knobs (r9, for the perceptual-dedup queries —
    both stay closed-form for the oracle): ``id_mod`` makes the
    effective formula id ``id % id_mod`` (ids sharing a residue are
    byte-identical duplicates); ``bump=(j0, delta)`` adds ``delta``
    to raster byte ``j0`` before the modulus — a one-pixel retouch
    that perturbs only the dHash grid cells sampling that pixel."""
    if width is not None and not (0 < width <= 9):
        raise ValueError("fixed width must be a single digit (header math)")
    if height is not None and not (0 < height <= 9):
        raise ValueError("fixed height must be a single digit (header math)")
    df = spark.range(n).select(
        "id",
        (F.lit(width) if width is not None
         else F.pmod("id", F.lit(4)) + 2).cast("int").alias("w"),
        (F.lit(height) if height is not None
         else F.pmod("id", F.lit(3)) + 2).cast("int").alias("h"))
    header_hex = F.hex(F.concat(
        F.lit("P6\n"), F.col("w").cast("string"), F.lit(" "),
        F.col("h").cast("string"), F.lit("\n255\n")))
    eid = f"(id % {int(id_mod)})" if id_mod else "id"
    bump_t = f" + if(j = {int(bump[0])}, {int(bump[1])}, 0)" if bump else ""
    px = f"lpad(hex(({eid}*37 + j*11{bump_t}) % 251), 2, '0')"
    raster_hex = F.expr(
        f"array_join(transform(sequence(0, w*h*3 - 1), j -> {px}), '')")
    return df.select(
        F.concat(F.lit(id_prefix), F.col("id").cast("string")).alias("media_id"),
        F.lit("image").alias("modality"),
        F.to_binary(F.concat(header_hex, raster_hex), F.lit("hex")).alias("payload"),
        F.lit("image/x-portable-pixmap").alias("mime_type"),
        F.col("w").alias("width"), F.col("h").alias("height"),
        F.lit(0).cast("long").alias("duration_ms"),
        F.create_map(F.lit("source"), F.lit("synthetic-ppm")).alias("metadata"))


def _le32(hex_low_byte: str) -> str:
    """SQL fragment: little-endian 4-byte hex of a value < 256."""
    return f"lpad(hex({hex_low_byte}), 2, '0') || '000000'"


def synth_bmp(spark: SparkSession, n: int = 20,
              width: int = 4) -> DataFrame:
    """Deterministic REAL uncompressed 24-bit BMP corpus, JVM-side.
    The row stride is ``w*3`` rounded up to 4 bytes; the default
    width 4 gives stride 12 with NO padding (the raster is precisely
    the pixel formula), while e.g. width 5 gives stride 16 with one
    pad byte per row — pad positions also carry the formula, and the
    DECODER must skip them (``_parse_bmp`` slices ``rows[:, :w*3]``),
    so a pad-width corpus puts the stride arithmetic under the driver
    value hash (the oracle's mean then excludes pad positions; mean
    intensity stays invariant to the bottom-up row order and BGR
    channel order the decoder undoes). height = (id%3)+2; file size
    54 + stride*h must stay < 256 so every multi-byte header field
    fits one low byte."""
    stride = (width * 3 + 3) & ~3
    if not 0 < width or 54 + stride * 4 > 255:
        raise ValueError(f"width {width} overflows the one-byte header math")
    df = spark.range(n).select(
        "id", (F.pmod("id", F.lit(3)) + 2).cast("int").alias("h"))
    header_hex = F.expr(
        "'424D'"                                    # 'BM'
        f" || {_le32(f'54 + {stride}*h')}"          # file size
        " || '00000000'"                            # reserved
        " || '36000000'"                            # pixel offset 54
        " || '28000000'"                            # BITMAPINFOHEADER 40
        f" || {_le32(str(width))}"                  # width
        f" || {_le32('h')}"                         # height (bottom-up)
        " || '0100' || '1800'"                      # planes 1, bpp 24
        " || '00000000'"                            # compression BI_RGB
        " || repeat('0', 40)")                      # imagesize/ppm/colors
    raster_hex = F.expr(
        f"array_join(transform(sequence(0, {stride}*h - 1), j -> {_PX}), '')")
    return df.select(
        F.concat(F.lit("bmp_"), F.col("id").cast("string")).alias("media_id"),
        F.lit("image").alias("modality"),
        F.to_binary(F.concat(header_hex, raster_hex), F.lit("hex")).alias("payload"),
        F.lit("image/bmp").alias("mime_type"),
        F.lit(width).cast("int").alias("width"), F.col("h").alias("height"),
        F.lit(0).cast("long").alias("duration_ms"),
        F.create_map(F.lit("source"), F.lit("synthetic-bmp")).alias("metadata"))


# ---------------------------------------------------------------------------
# Codec backend — real pure-NumPy PPM/BMP, hash-fake for other formats
# ---------------------------------------------------------------------------


def _parse_ppm(data: bytes) -> np.ndarray:
    """Binary PPM (P6, maxval <= 255) -> uint8 array (H, W, 3).
    Header grammar: 'P6' then whitespace/comment-separated width,
    height, maxval, then ONE whitespace byte, then the raster."""
    if data[:2] != b"P6":
        raise ValueError("not a P6 PPM")
    pos, fields = 2, []
    while len(fields) < 3:
        while pos < len(data) and data[pos:pos + 1].isspace():
            pos += 1
        if data[pos:pos + 1] == b"#":            # comment to end of line
            while pos < len(data) and data[pos] != 0x0A:
                pos += 1
            continue
        start = pos
        while pos < len(data) and data[pos:pos + 1].isdigit():
            pos += 1
        if start == pos:
            raise ValueError("malformed PPM header")
        fields.append(int(data[start:pos]))
    w, h, maxval = fields
    if not (0 < w and 0 < h and 0 < maxval <= 255):
        raise ValueError(f"unsupported PPM geometry {w}x{h} maxval={maxval}")
    pos += 1                                     # the single ws after maxval
    raster = data[pos:pos + w * h * 3]
    if len(raster) != w * h * 3:
        raise ValueError("truncated PPM raster")
    return np.frombuffer(raster, dtype=np.uint8).reshape(h, w, 3)


def _parse_bmp(data: bytes) -> np.ndarray:
    """Uncompressed 24-bit BMP (BITMAPINFOHEADER, BI_RGB) -> uint8
    array (H, W, 3) in RGB order, top-down. Validates the file-size
    field so a random 'BM'-prefixed payload (a hash collision in the
    synthetic corpus) is rejected rather than mis-decoded."""
    if data[:2] != b"BM" or len(data) < 54:
        raise ValueError("not a BMP")
    file_size = int.from_bytes(data[2:6], "little")
    if file_size != len(data):
        raise ValueError("BMP file-size field mismatch")
    off = int.from_bytes(data[10:14], "little")
    hdr = int.from_bytes(data[14:18], "little")
    if hdr < 40:
        raise ValueError("unsupported BMP header")
    w = int.from_bytes(data[18:22], "little", signed=True)
    h = int.from_bytes(data[22:26], "little", signed=True)
    bpp = int.from_bytes(data[28:30], "little")
    comp = int.from_bytes(data[30:34], "little")
    if bpp != 24 or comp != 0 or w <= 0 or h == 0:
        raise ValueError(f"unsupported BMP variant bpp={bpp} comp={comp}")
    top_down = h < 0
    h = abs(h)
    stride = (w * 3 + 3) & ~3                    # rows pad to 4 bytes
    raster = data[off:off + stride * h]
    if len(raster) < stride * h:
        raise ValueError("truncated BMP raster")
    rows = np.frombuffer(raster, dtype=np.uint8).reshape(h, stride)
    px = rows[:, :w * 3].reshape(h, w, 3)[:, :, ::-1]   # BGR -> RGB
    return px if top_down else px[::-1]


_PNG_MAGIC = b"\x89PNG\r\n\x1a\n"


def _paeth(left: int, up: int, ul: int) -> int:
    """PNG Paeth predictor (RFC 2083 section 6.6)."""
    p = left + up - ul
    pa, pb, pc = abs(p - left), abs(p - up), abs(p - ul)
    if pa <= pb and pa <= pc:
        return left
    return up if pb <= pc else ul


def _parse_png(data: bytes) -> np.ndarray:
    """PNG (8-bit RGB, color type 2, non-interlaced) -> uint8 array
    (H, W, 3). Pure stdlib + NumPy: chunk walk with CRC32
    verification, zlib inflate of the concatenated IDAT stream, then
    per-row reversal of all five scanline filters (None/Sub/Up/
    Average/Paeth). Sub uses a per-channel cumsum (vectorized);
    Average/Paeth are inherently sequential in x (each byte needs the
    RECONSTRUCTED left neighbor) so they take a per-byte loop — fine
    for the thumbnail-scale work this tier does; a Pillow-backed
    backend plugs into the same ``_try_decode_pixels`` seam for bulk
    crawls. Anything but 8-bit/RGB/deflate/no-interlace is rejected,
    never mis-decoded."""
    if data[:8] != _PNG_MAGIC:
        raise ValueError("not a PNG")
    pos, ihdr, idat = 8, None, []
    while pos + 12 <= len(data):
        ln = int.from_bytes(data[pos:pos + 4], "big")
        typ = data[pos + 4:pos + 8]
        chunk = data[pos + 8:pos + 8 + ln]
        if len(chunk) != ln:
            raise ValueError("truncated PNG chunk")
        crc = int.from_bytes(data[pos + 8 + ln:pos + 12 + ln], "big")
        if zlib.crc32(typ + chunk) & 0xFFFFFFFF != crc:
            raise ValueError("PNG chunk CRC mismatch")
        if typ == b"IHDR":
            ihdr = chunk
        elif typ == b"IDAT":
            idat.append(chunk)
        elif typ == b"IEND":
            break
        pos += 12 + ln
    if ihdr is None or len(ihdr) != 13 or not idat:
        raise ValueError("missing PNG IHDR/IDAT")
    w = int.from_bytes(ihdr[0:4], "big")
    h = int.from_bytes(ihdr[4:8], "big")
    depth, ctype, comp, filt, interlace = ihdr[8:13]
    if (depth, ctype, comp, filt, interlace) != (8, 2, 0, 0, 0):
        raise ValueError(
            f"unsupported PNG variant depth={depth} color={ctype} "
            f"interlace={interlace}")
    if w <= 0 or h <= 0:
        raise ValueError("bad PNG geometry")
    raw = zlib.decompress(b"".join(idat))
    stride = w * 3
    if len(raw) != (stride + 1) * h:
        raise ValueError("PNG raster size mismatch")
    out = np.empty((h, stride), dtype=np.uint8)
    prior = np.zeros(stride, dtype=np.uint8)
    for r in range(h):
        ft = raw[r * (stride + 1)]
        line = np.frombuffer(
            raw[r * (stride + 1) + 1:(r + 1) * (stride + 1)],
            dtype=np.uint8)
        if ft == 0:                                   # None
            cur = line.copy()
        elif ft == 1:                                 # Sub: channel cumsum
            cur = np.cumsum(line.reshape(w, 3), axis=0,
                            dtype=np.uint64).astype(np.uint8).reshape(stride)
        elif ft == 2:                                 # Up (uint8 wraps)
            cur = line + prior
        elif ft in (3, 4):                            # Average / Paeth
            cur = np.empty(stride, dtype=np.uint8)
            for i in range(stride):
                left = int(cur[i - 3]) if i >= 3 else 0
                up = int(prior[i])
                if ft == 3:
                    pred = (left + up) >> 1
                else:
                    ul = int(prior[i - 3]) if i >= 3 else 0
                    pred = _paeth(left, up, ul)
                cur[i] = (int(line[i]) + pred) & 0xFF
        else:
            raise ValueError(f"bad PNG filter type {ft}")
        out[r] = cur
        prior = cur
    return out.reshape(h, w, 3)


def encode_png(arr: np.ndarray, filters: list[int] | None = None) -> bytes:
    """uint8 (H, W, 3) -> PNG bytes (8-bit RGB, non-interlaced) — the
    inverse of ``_parse_png``. ``filters`` picks the scanline filter
    per row (default Sub everywhere); the synthetic corpus cycles all
    five so every reversal branch sits under the driver hash. Encoding
    vectorizes cleanly (predictors read RAW neighbors)."""
    arr = np.ascontiguousarray(arr, dtype=np.uint8)
    h, w = arr.shape[:2]
    stride = w * 3
    rows = arr.reshape(h, stride).astype(np.int16)
    zero = np.zeros(stride, dtype=np.int16)
    pieces = []
    for r in range(h):
        ft = filters[r % len(filters)] if filters else 1
        raw = rows[r]
        left = np.concatenate([np.zeros(3, dtype=np.int16), raw[:-3]])
        up = rows[r - 1] if r else zero
        ul = (np.concatenate([np.zeros(3, dtype=np.int16), up[:-3]])
              if r else zero)
        if ft == 0:
            pred = zero
        elif ft == 1:
            pred = left
        elif ft == 2:
            pred = up
        elif ft == 3:
            pred = (left + up) >> 1
        elif ft == 4:
            p = left + up - ul
            pa, pb, pc = np.abs(p - left), np.abs(p - up), np.abs(p - ul)
            pred = np.where((pa <= pb) & (pa <= pc), left,
                            np.where(pb <= pc, up, ul))
        else:
            raise ValueError(f"bad PNG filter type {ft}")
        pieces.append(bytes([ft]))
        pieces.append(((raw - pred) & 0xFF).astype(np.uint8).tobytes())

    def chunk(typ: bytes, payload: bytes) -> bytes:
        return (len(payload).to_bytes(4, "big") + typ + payload
                + (zlib.crc32(typ + payload) & 0xFFFFFFFF)
                .to_bytes(4, "big"))

    ihdr = (w.to_bytes(4, "big") + h.to_bytes(4, "big")
            + bytes([8, 2, 0, 0, 0]))
    return (_PNG_MAGIC + chunk(b"IHDR", ihdr)
            + chunk(b"IDAT", zlib.compress(b"".join(pieces), 6))
            + chunk(b"IEND", b""))


def synth_png(spark: SparkSession, n: int = 30) -> DataFrame:
    """Deterministic REAL PNG corpus: image ``id`` is ``(id%5)+3 x
    (id%4)+2`` RGB, pixel byte ``j`` = ``(id*37 + j*11) % 251`` (the
    shared closed-form raster), scanline filters cycling
    ``(id + row) % 5`` so all five filter reversals are exercised.
    Generated via mapInPandas (deflate has no Column expression, so
    unlike synth_ppm this generator runs Python-side) — still fully
    deterministic: zlib output feeds only the DECODER, and every
    decoded statistic the oracle checks is closed-form in (id, w, h),
    independent of how deflate packed the bytes."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for i in pdf["id"]:
                i = int(i)
                w, h = i % 5 + 3, i % 4 + 2
                j = np.arange(w * h * 3, dtype=np.int64)
                px = ((i * 37 + j * 11) % 251).astype(np.uint8) \
                    .reshape(h, w, 3)
                payload = encode_png(px, filters=[(i + r) % 5
                                                  for r in range(h)])
                out.append((f"png_{i}", "image", payload, "image/png",
                            w, h, 0, {"source": "synthetic-png"}))
            yield pd.DataFrame(out, columns=[
                "media_id", "modality", "payload", "mime_type",
                "width", "height", "duration_ms", "metadata"])

    return spark.range(n).mapInPandas(gen, (
        "media_id STRING, modality STRING, payload BINARY, "
        "mime_type STRING, width INT, height INT, duration_ms LONG, "
        "metadata MAP<STRING,STRING>"))


def encode_ppm(arr: np.ndarray) -> bytes:
    """uint8 (H, W, 3) -> binary PPM (P6) bytes — the inverse of
    ``_parse_ppm``; used by ``resize_media`` output and test fixtures."""
    h, w = arr.shape[:2]
    return b"P6\n%d %d\n255\n" % (w, h) + \
        np.ascontiguousarray(arr, dtype=np.uint8).tobytes()


def _parse_wav(data: bytes) -> tuple[np.ndarray, int]:
    """RIFF/WAVE PCM (16-bit) -> (int16 array (n_frames, channels),
    sample_rate). Walks the chunk list (word-aligned sizes per the
    RIFF spec), validates the RIFF size field and the fmt codec tag,
    and rejects anything but integer PCM16 rather than mis-decoding."""
    if data[:4] != b"RIFF" or len(data) < 12 or data[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE file")
    riff_size = int.from_bytes(data[4:8], "little")
    if riff_size != len(data) - 8:
        raise ValueError("RIFF size field mismatch")
    pos, fmt, pcm = 12, None, None
    while pos + 8 <= len(data):
        typ = data[pos:pos + 4]
        ln = int.from_bytes(data[pos + 4:pos + 8], "little")
        chunk = data[pos + 8:pos + 8 + ln]
        if len(chunk) != ln:
            raise ValueError("truncated WAV chunk")
        if typ == b"fmt ":
            fmt = chunk
        elif typ == b"data":
            pcm = chunk
        pos += 8 + ln + (ln & 1)                 # chunks are word-aligned
    if fmt is None or pcm is None or len(fmt) < 16:
        raise ValueError("missing WAV fmt/data chunk")
    codec = int.from_bytes(fmt[0:2], "little")
    channels = int.from_bytes(fmt[2:4], "little")
    rate = int.from_bytes(fmt[4:8], "little")
    bits = int.from_bytes(fmt[14:16], "little")
    if codec != 1 or bits != 16 or channels < 1:
        raise ValueError(
            f"unsupported WAV variant codec={codec} bits={bits}")
    if len(pcm) % (2 * channels):
        raise ValueError("WAV data size not frame-aligned")
    samples = np.frombuffer(pcm, dtype="<i2").reshape(-1, channels)
    return samples, rate


def encode_wav(samples: np.ndarray, sample_rate: int) -> bytes:
    """(n_frames, channels) int16 + rate -> RIFF/WAVE PCM16 bytes —
    the inverse of ``_parse_wav``; test fixture + export path."""
    if samples.ndim == 1:
        samples = samples[:, None]
    channels = samples.shape[1]
    pcm = np.ascontiguousarray(samples, dtype="<i2").tobytes()
    block = 2 * channels
    fmt = ((1).to_bytes(2, "little") + channels.to_bytes(2, "little")
           + sample_rate.to_bytes(4, "little")
           + (sample_rate * block).to_bytes(4, "little")
           + block.to_bytes(2, "little") + (16).to_bytes(2, "little"))
    body = (b"WAVE" + b"fmt " + len(fmt).to_bytes(4, "little") + fmt
            + b"data" + len(pcm).to_bytes(4, "little") + pcm)
    return b"RIFF" + len(body).to_bytes(4, "little") + body


def synth_wav(spark: SparkSession, n: int = 30,
              id_mod: int | None = None,
              bump: tuple[int, int] | None = None,
              id_prefix: str = "wav_") -> DataFrame:
    """Deterministic REAL RIFF/WAVE PCM16 corpus, generated JVM-side
    (pure Column expressions, like synth_ppm/synth_bmp): audio ``id``
    is mono, ``(id%4 + 1)*50`` samples at ``8000 + (id%3)*4000`` Hz,
    sample ``j`` = ``(id*1009 + j*757) % 30011`` — non-negative and
    < 2^15, so every sample is exactly representable, |amplitude|
    sums are exact integers, and a DuckDB oracle value-hashes the
    real ``_parse_wav`` path with closed-form arithmetic.

    Near-dup corpus knobs (r10, for the audio-fingerprint dedup
    queries — both closed-form like synth_ppm's): ``id_mod`` makes
    EVERYTHING derive from ``id % id_mod`` (ids sharing a residue are
    byte-identical duplicate clips); ``bump=(j0, delta)`` adds
    ``delta`` to sample ``j0`` before the modulus — a one-sample
    retouch that moves one frame energy, flipping at most the two
    fingerprint bits that frame participates in."""
    eid = f"(id % {int(id_mod)})" if id_mod else "id"
    df = spark.range(n).select(
        "id",
        ((F.pmod(F.expr(eid), F.lit(4)) + 1) * 50).cast("int").alias("ns"),
        (F.lit(8000) + F.pmod(F.expr(eid), F.lit(3)) * 4000).cast("int")
        .alias("sr"))

    def le16(x: str) -> str:
        return (f"lpad(hex(({x}) % 256), 2, '0') || "
                f"lpad(hex((({x}) div 256) % 256), 2, '0')")

    def le32_small(x: str) -> str:               # values < 2^16
        return f"{le16(x)} || '0000'"

    header_hex = F.expr(
        "'52494646'"                              # 'RIFF'
        f" || {le32_small('36 + ns*2')}"          # riff size
        " || '57415645'"                          # 'WAVE'
        " || '666D7420' || '10000000'"            # 'fmt ', length 16
        " || '0100' || '0100'"                    # PCM, mono
        f" || {le32_small('sr')}"                 # sample rate
        f" || {le32_small('sr*2')}"               # byte rate
        " || '0200' || '1000'"                    # block align 2, 16 bit
        " || '64617461'"                          # 'data'
        f" || {le32_small('ns*2')}")
    bump_t = f" + if(j = {int(bump[0])}, {int(bump[1])}, 0)" if bump else ""
    data_hex = F.expr(
        "array_join(transform(sequence(0, ns - 1), "
        f"j -> {le16(f'({eid}*1009 + j*757{bump_t}) % 30011')}), '')")
    return df.select(
        F.concat(F.lit(id_prefix), F.col("id").cast("string")).alias("media_id"),
        F.lit("audio").alias("modality"),
        F.to_binary(F.concat(header_hex, data_hex), F.lit("hex"))
        .alias("payload"),
        F.lit("audio/wav").alias("mime_type"),
        F.lit(None).cast("int").alias("width"),
        F.lit(None).cast("int").alias("height"),
        (F.col("ns").cast("long") * 1000 / F.col("sr")).cast("long")
        .alias("duration_ms"),
        F.create_map(F.lit("source"), F.lit("synthetic-wav")).alias("metadata"))


AUDIO_DDL = ("media_id STRING, n_bytes LONG, n_samples LONG, "
             "sample_rate LONG, channels LONG, mean_amplitude DOUBLE, "
             "decoded BOOLEAN")


def decode_audio(df: DataFrame) -> DataFrame:
    """Audio twin of ``decode_media``: RIFF/WAVE PCM16 payloads get
    REAL stats from ``_parse_wav`` (frame count, rate, channels, mean
    |amplitude|); undecodable payloads pass through with NULL stats
    and ``decoded=false`` — the quarantine path, never fabricated.
    Map-only mapInPandas, same no-shuffle contract as the image
    decoders."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                raw = bytes(payload or b"")
                try:
                    samples, rate = _parse_wav(raw)
                except ValueError:
                    out.append((mid, len(raw), None, None, None, None,
                                False))
                    continue
                out.append((
                    mid, len(raw), samples.shape[0], rate,
                    samples.shape[1],
                    float(np.abs(samples.astype(np.int64)).mean())
                    if samples.size else 0.0, True))
            yield pd.DataFrame(out, columns=[
                "media_id", "n_bytes", "n_samples", "sample_rate",
                "channels", "mean_amplitude", "decoded"])

    return df.select("media_id", "payload").mapInPandas(batches, AUDIO_DDL)


# Optional fast-JPEG backend (r11, VERDICT r10 Next #2): Pillow wraps
# libjpeg-turbo (SIMD Huffman + IDCT — the public production decoder,
# ~10-50x the pure-NumPy codec at megapixel scale; tools/media_probe.py
# records both when available). The NumPy codec in operators/jpeg.py
# stays the ALWAYS-AVAILABLE reference implementation and the fixture
# ENCODER — the backend seam is decode-only.
try:  # pragma: no cover — availability depends on the environment
    from PIL import Image as _PILImage
    _HAVE_PIL = True
except ImportError:
    _PILImage = None
    _HAVE_PIL = False

#: JPEG decode backend: "auto" | "numpy" | "pil". chooser: "auto"
#: routes by AVAILABILITY (pil when importable, else numpy) — not a
#: tuning knob; "numpy"/"pil" pin one side for equivalence tests and
#: for environment-independent value hashing (libjpeg's fixed-point
#: color convert and fancy chroma upsampling can differ from the
#: reference codec by ±1 LSB on color images — grayscale block-
#: constant fixtures are bit-exact on both, test_jpeg_backend.py).
#: Read per call, not at import: Spark python workers are long-lived
#: and must honor an env pin set after they started.
_JPEG_BACKEND_ENV = "SPARK_GRAFT_JPEG_BACKEND"


def _decode_jpeg_pil(payload: bytes) -> np.ndarray:
    """Pillow/libjpeg decode -> uint8 (H, W, 3). Raises on anything
    Pillow rejects (the caller maps that to quarantine)."""
    img = _PILImage.open(io.BytesIO(payload))
    img.load()
    if img.mode != "RGB":
        img = img.convert("RGB")
    return np.asarray(img, dtype=np.uint8)


def _decode_jpeg(payload: bytes,
                 jpeg_backend: str | None = None) -> np.ndarray | None:
    """The backend seam: one JPEG payload -> pixels or None
    (quarantine). ``None`` backend resolves SPARK_GRAFT_JPEG_BACKEND
    (default "auto"). Note "auto"+Pillow WIDENS coverage: progressive
    JPEGs the reference codec rejects decode fine under libjpeg —
    pin "numpy" where quarantine behavior must match the reference
    codec exactly."""
    backend = jpeg_backend or os.environ.get(_JPEG_BACKEND_ENV, "auto")
    if backend not in ("auto", "numpy", "pil"):
        raise ValueError(f"unknown JPEG backend {backend!r}")
    if backend == "pil" and not _HAVE_PIL:
        raise ValueError("JPEG backend 'pil' requested but Pillow "
                         "is not installed")
    if backend == "pil" or (backend == "auto" and _HAVE_PIL):
        try:
            return _decode_jpeg_pil(payload)
        except Exception:
            return None
    from .jpeg import _parse_jpeg
    try:
        return _parse_jpeg(payload)
    except ValueError:
        return None


def _try_decode_pixels(payload: bytes,
                       jpeg_backend: str | None = None) -> np.ndarray | None:
    """Real decode if the payload is one of the supported formats,
    else None. Magic-matched payloads that fail validation (e.g. a
    synthetic payload that happens to start with 'BM') fall through
    to None — the hash-fake keeps the synthetic contract stable."""
    if payload[:8] == _PNG_MAGIC:
        try:
            return _parse_png(payload)
        except (ValueError, zlib.error):
            return None
    if payload[:3] == b"\xFF\xD8\xFF":
        return _decode_jpeg(payload, jpeg_backend)
    if payload[:2] in (b"P6", b"BM"):
        try:
            return (_parse_ppm if payload[:2] == b"P6"
                    else _parse_bmp)(payload)
        except ValueError:
            return None
    return None


def _decode_backend(payload: bytes, modality: str,
                    jpeg_backend: str | None = None) -> dict:
    """Dispatch: real pixel decode for PPM/BMP/PNG/JPEG; a deterministic
    payload-hash fake for every other format (this container ships no
    image/audio libraries — extend the dispatch with Pillow /
    torchaudio / PyAV to cover more formats; the Spark plan shapes do
    not change)."""
    px = _try_decode_pixels(payload, jpeg_backend)
    if px is not None:
        return {
            "n_bytes": len(payload),
            "width": int(px.shape[1]),
            "height": int(px.shape[0]),
            "mean_intensity": float(px.mean()),
        }
    # deterministic fake: statistics derived from the payload bytes —
    # stable across runs/engines, shaped like real decoder output.
    # Hashes the *hex* form so an ANSI-SQL oracle (sha256 over VARCHAR)
    # can reproduce width/height value-for-value.
    arr = np.frombuffer(payload, dtype=np.uint8)
    h = hashlib.sha256(payload.hex().encode()).digest()
    return {
        "n_bytes": int(arr.size),
        "width": int.from_bytes(h[0:2], "big") % 1920 + 1,
        "height": int.from_bytes(h[2:4], "big") % 1080 + 1,
        "mean_intensity": float(arr.mean()) if arr.size else 0.0,
    }


def decode_media(df: DataFrame,
                 jpeg_backend: str | None = None) -> DataFrame:
    """Decode payloads to typed stats via mapInPandas (Arrow-batched,
    map-only — no shuffle; executors stream one batch at a time).

    ``jpeg_backend``: pin "numpy" on VALUE-HASHED paths (the oracle
    replays the reference codec's exact float64 math, and 'auto'
    silently re-routes through Pillow/libjpeg when installed — ±1 LSB
    color differences AND different quarantine coverage would flip
    oracle hashes with no code change). None keeps the env/auto
    routing for throughput paths whose gate is backend-insensitive
    (tools/media_probe.py)."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out = []
            for mid, modality, payload in zip(pdf["media_id"], pdf["modality"],
                                              pdf["payload"]):
                d = _decode_backend(bytes(payload or b""), modality,
                                    jpeg_backend)
                out.append((mid, modality, d["n_bytes"], d["width"],
                            d["height"], d["mean_intensity"]))
            yield pd.DataFrame(out, columns=["media_id", "modality", "n_bytes",
                                             "width", "height", "mean_intensity"])

    return df.select("media_id", "modality", "payload") \
        .mapInPandas(batches, DECODED_DDL)


def extract_media_features(df: DataFrame, dim: int = FEATURE_DIM,
                           jpeg_backend: str | None = None) -> DataFrame:
    """Payload -> unit-norm feature vector via mapInPandas. Decodable
    payloads (PPM/BMP) get a REAL feature: the dim-bin pixel-intensity
    histogram, unit-normalized — near-identical images land near each
    other in cosine space, so the vector is usable by the ANN /
    near-dup operators downstream. Other formats keep the
    deterministic sha-seeded vector (same contract as the text
    embedder) so synthetic corpora stay stable."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            feats = []
            for payload in pdf["payload"]:
                raw = bytes(payload or b"")
                px = _try_decode_pixels(raw, jpeg_backend)
                if px is not None:
                    hist, _ = np.histogram(px, bins=dim, range=(0, 256))
                    v = hist.astype(np.float64)
                else:
                    digest = hashlib.sha256(raw).digest()
                    rng = np.random.RandomState(
                        int.from_bytes(digest[:4], "big"))
                    v = rng.uniform(-1, 1, dim)
                n = np.linalg.norm(v)
                feats.append((v / n if n else v).astype(np.float32))
            yield pd.DataFrame({"media_id": pdf["media_id"], "features": feats})

    return df.select("media_id", "payload").mapInPandas(batches, FEATURES_DDL)


def frame_sample(df: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame-sampling plan: one row per sampled frame offset.
    Pure Column explode — the (stubbed) per-frame decode would be a
    map-only UDF over (payload, frame_ms)."""
    return (df.filter(F.col("modality") == "video")
            .select("media_id", "duration_ms",
                    F.explode(F.sequence(
                        F.lit(0), F.col("duration_ms") - 1,
                        F.lit(every_ms))).alias("frame_ms")))


def resize_plan(df: DataFrame, target_w: int, target_h: int) -> DataFrame:
    """Resize metadata plan (letterbox scale computation JVM-side; the
    pixel resample itself is ``resize_media``)."""
    scale = F.least(target_w / F.col("width"), target_h / F.col("height"))
    return df.withColumn("scale", scale) \
             .withColumn("out_w", F.floor(F.col("width") * scale).cast("int")) \
             .withColumn("out_h", F.floor(F.col("height") * scale).cast("int"))


RESIZED_DDL = ("media_id STRING, payload BINARY, width INT, height INT, "
               "decoded BOOLEAN")


def resize_media(df: DataFrame, target_w: int, target_h: int,
                 jpeg_backend: str | None = None) -> DataFrame:
    """Actual pixel resample (nearest-neighbor, aspect-preserving
    letterbox scale — same geometry as ``resize_plan``) for decodable
    payloads (PPM/BMP), re-encoded as PPM. Map-only mapInPandas, same
    no-shuffle contract as ``decode_media``. Non-decodable payloads
    pass through untouched with ``decoded=false`` (a filter on that
    column is the quarantine path) — never silently fabricated."""
    if target_w <= 0 or target_h <= 0:
        raise ValueError("resize target must be positive")

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                raw = bytes(payload or b"")
                px = _try_decode_pixels(raw, jpeg_backend)
                if px is None:
                    out.append((mid, raw, None, None, False))
                    continue
                h, w = px.shape[:2]
                s = min(target_w / w, target_h / h)
                ow, oh = max(int(w * s), 1), max(int(h * s), 1)
                yi = (np.arange(oh) * (h / oh)).astype(np.int64)
                xi = (np.arange(ow) * (w / ow)).astype(np.int64)
                resized = px[yi][:, xi]
                out.append((mid, encode_ppm(resized), ow, oh, True))
            yield pd.DataFrame(out, columns=["media_id", "payload",
                                             "width", "height", "decoded"])

    return df.select("media_id", "payload").mapInPandas(batches, RESIZED_DDL)


RESAMPLED_DDL = ("media_id STRING, payload BINARY, n_samples LONG, "
                 "sample_rate LONG, decoded BOOLEAN")


def resample_audio(df: DataFrame, target_rate: int,
                   mono: bool = True) -> DataFrame:
    """Sample-rate conversion + optional mono mixdown — the audio twin
    of ``resize_media`` (r10): decodable RIFF/PCM16 payloads are
    resampled to ``target_rate`` by the same integer floor maps the
    image resize uses (source index of output ``j`` is
    ``(j*n_src)//n_dst`` with ``n_dst = (n_src*target)//src_rate`` —
    nearest-neighbor, exact integer arithmetic so a DuckDB oracle
    replays every output sample), mixed down by floor(mean + 0.5) in
    float64 (channel sums are exact), and re-encoded as WAV at the
    target rate. Non-decodable payloads pass through untouched with
    ``decoded=false`` — the quarantine path. Map-only mapInPandas,
    payloads never shuffle."""
    if target_rate <= 0:
        raise ValueError("target_rate must be positive")

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                raw = bytes(payload or b"")
                try:
                    samples, rate = _parse_wav(raw)
                except ValueError:
                    out.append((mid, raw, None, None, False))
                    continue
                if mono and samples.shape[1] > 1:
                    mixed = np.floor(
                        samples.astype(np.float64).mean(axis=1) + 0.5)
                    samples = np.clip(mixed, -32768, 32767) \
                        .astype(np.int16)[:, None]
                n_src = samples.shape[0]
                n_dst = (n_src * target_rate) // rate
                idx = (np.arange(n_dst, dtype=np.int64) * n_src) // n_dst \
                    if n_dst else np.zeros(0, dtype=np.int64)
                resampled = samples[idx]
                out.append((mid, encode_wav(resampled, target_rate),
                            n_dst, target_rate, True))
            yield pd.DataFrame(out, columns=[
                "media_id", "payload", "n_samples", "sample_rate",
                "decoded"])

    return df.select("media_id", "payload").mapInPandas(
        batches, RESAMPLED_DDL)
