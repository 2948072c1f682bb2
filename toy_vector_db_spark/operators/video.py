"""Video modality: MJPEG elementary streams (concatenated baseline
JPEG frames — the public Motion-JPEG stream layout) decoded per-frame
through the REAL JPEG codec (r10).

Until now video was the one modality whose decode stayed stubbed:
``media.frame_sample`` explodes frame OFFSETS but nothing decoded a
frame. With the baseline JPEG decoder in place the whole path is
real: split the payload at frame boundaries (a marker-accurate walk,
not a byte scan — entropy data is byte-stuffed so raw 0xFFD8 cannot
appear inside a frame, but headers could contain it, so the splitter
walks segments to each EOI), decode every frame with
``jpeg._parse_jpeg``, and emit typed per-frame stats. Map-only
mapInPandas — payloads never shuffle, same contract as
``media.decode_media``.

Non-MJPEG payloads (no leading SOI) and streams whose frames fail
validation quarantine to ``decoded=false`` rows, never fabricated.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

from .jpeg import _parse_jpeg, encode_jpeg_planes


def _jpeg_frame_end(data: bytes, start: int) -> int:
    """Index one past the EOI of the JPEG frame starting at
    ``start``. Walks marker segments (skipping lengths) to SOS, then
    scans the entropy stream honoring byte stuffing and RSTn, exactly
    like the decoder — so a 0xFFD8 byte pair inside a DQT table or a
    comment cannot split a frame early."""
    if data[start:start + 3] != b"\xFF\xD8\xFF":
        raise ValueError("frame does not start with SOI")
    pos = start + 2
    while pos + 2 <= len(data):
        if data[pos] != 0xFF:
            raise ValueError("bad marker alignment in MJPEG frame")
        marker = data[pos + 1]
        pos += 2
        if marker == 0xD9:                       # EOI with no scan
            return pos
        if marker == 0x01 or 0xD0 <= marker <= 0xD7:
            continue
        if pos + 2 > len(data):
            raise ValueError("truncated MJPEG segment header")
        ln = int.from_bytes(data[pos:pos + 2], "big")
        if ln < 2 or pos + ln > len(data):
            raise ValueError("truncated MJPEG segment")
        is_sos = marker == 0xDA
        pos += ln
        if not is_sos:
            continue
        while pos < len(data):                   # entropy scan
            if data[pos] != 0xFF:
                pos += 1
                continue
            nxt = data[pos + 1] if pos + 1 < len(data) else None
            if nxt == 0x00 or (nxt is not None and 0xD0 <= nxt <= 0xD7):
                pos += 2
                continue
            if nxt == 0xD9:
                return pos + 2
            raise ValueError("unexpected marker in MJPEG entropy data")
        break
    raise ValueError("MJPEG frame not terminated by EOI")


def split_mjpeg(data: bytes) -> list[bytes]:
    """Concatenated-JPEG payload -> list of single-frame byte slices.
    Raises ValueError on anything that is not a clean concatenation."""
    if not data:
        raise ValueError("empty MJPEG payload")
    frames = []
    pos = 0
    while pos < len(data):
        end = _jpeg_frame_end(data, pos)
        frames.append(data[pos:end])
        pos = end
    return frames


VIDEO_FRAMES_DDL = ("media_id STRING, frame_idx INT, width INT, "
                    "height INT, mean_intensity DOUBLE, decoded BOOLEAN")


def decode_video_frames(df: DataFrame) -> DataFrame:
    """(media_id, payload, ...) -> one row per decoded frame with REAL
    stats from the JPEG codec. A payload that fails the MJPEG split or
    whose frame fails decode validation yields a single quarantine row
    (frame_idx NULL, decoded=false). Map-only mapInPandas."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                raw = bytes(payload or b"")
                try:
                    frames = split_mjpeg(raw)
                    for i, fb in enumerate(frames):
                        px = _parse_jpeg(fb)
                        out.append((mid, i, px.shape[1], px.shape[0],
                                    float(px.mean()), True))
                except ValueError:
                    out.append((mid, None, None, None, None, False))
            yield pd.DataFrame(out, columns=[
                "media_id", "frame_idx", "width", "height",
                "mean_intensity", "decoded"])

    return df.select("media_id", "payload").mapInPandas(
        batches, VIDEO_FRAMES_DDL)


def synth_mjpeg(spark, n: int = 18, id_mod: int | None = None,
                bump: tuple[int, int, int] | None = None,
                id_prefix: str = "vid_", frame_w: int = 16,
                block_step: int = 11, frame_step: int = 19):
    """Deterministic REAL MJPEG corpus: video ``id`` has
    ``(id%3) + 2`` grayscale 16 x ``frame_w`` frames; frame ``f``'s
    luma block ``k`` (raster order, ``frame_w/8`` per row) is
    ``(id*37 + f*frame_step + k*block_step) % 251`` — block-constant, so each
    frame decodes EXACTLY (all-ones quant tables, jpeg.py docstring)
    and every per-frame statistic is closed-form for the DuckDB
    oracle (workload.media_video_frames). 30 ms/frame so frame_sample
    arithmetic has real durations to chew on.

    Same near-dup knobs as ``jpeg.synth_jpeg_gray``: ``id_mod``
    collapses ids to residue classes (byte-identical duplicate
    streams), ``bump=(f0, k0, delta)`` retouches block ``k0`` of
    frame ``f0`` only, before the modulus — a ONE-FRAME retouch, the
    videodup near-dup fixture (closed-form for the fingerprint
    oracle, workload.media_video_fp). The fingerprint corpus uses
    ``frame_w=32, block_step=125``: 8 blocks give the per-frame dHash
    6 live comparisons, and a ~half-modulus step makes each ~50/50
    instead of the default step's 11/251 — without that the
    fingerprints are near-zero and everything cross-collides; the
    same goes for ``frame_step`` (19 barely ever flips a comparison
    across frames, so frames within a clip hash identically and the
    order-sensitive fold has nothing to order)."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for i in pdf["id"]:
                i = int(i)
                eid = i % id_mod if id_mod else i
                nf = eid % 3 + 2
                wb = frame_w // 8
                payload = b""
                for f in range(nf):
                    ks = np.arange(2 * wb)
                    vals = eid * 37 + f * frame_step + ks * block_step
                    if bump and f == bump[0]:
                        vals = vals + np.where(ks == bump[1], bump[2], 0)
                    yv = (vals % 251).reshape(2, wb).astype(np.float64)
                    plane = np.repeat(np.repeat(yv, 8, 0), 8, 1)
                    payload += encode_jpeg_planes([plane], [(1, 1)],
                                                  (frame_w, 16))
                out.append((f"{id_prefix}{i}", "video", payload,
                            "video/x-mjpeg",
                            frame_w, 16, nf * 30,
                            {"source": "synthetic-mjpeg"}))
            yield pd.DataFrame(out, columns=[
                "media_id", "modality", "payload", "mime_type",
                "width", "height", "duration_ms", "metadata"])

    return spark.range(n).mapInPandas(gen, (
        "media_id STRING, modality STRING, payload BINARY, "
        "mime_type STRING, width INT, height INT, duration_ms LONG, "
        "metadata MAP<STRING,STRING>"))
