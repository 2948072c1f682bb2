"""Perceptual video dedup: an order-sensitive sequence fingerprint
over per-frame dHashes, banded through the hash-agnostic
``imagedup.dhash_hamming_pairs`` / ``hamming_ball_groups`` spine
(r11, VERDICT r10 Next #3).

Composition of existing pieces, nothing novel per stage:

  payload --marker-walk split--> frames        (video.split_mjpeg)
    --real JPEG decode--> pixels               (jpeg._parse_jpeg)
    --grid sample--> 64-bit dHash per frame    (imagedup.dhash_bits)
    --rotate-XOR fold--> 64-bit sequence fp    (this module)
    --pigeonhole banding + verify--> pairs     (imagedup spine)

The fold is ``fp = XOR_f rotl64(dhash_f, f mod 64)`` — the classic
position-salted XOR used by rolling fingerprints: rotation makes it
ORDER-SENSITIVE (swapping two unequal frames changes the fp), XOR
makes a single retouched frame flip exactly the bits its dHash
flipped (locality — the Hamming budget of the banding spine applies
per retouch, like the image path). Streams longer than 64 frames
wrap (rotation repeats); at that length the fp degrades toward a
bag-of-frames sketch, which is the standard trade for a fixed-width
fingerprint.

Determinism contract (same as imagedup/audiodup): the split is a
marker-accurate byte walk, the decode is exact for block-constant
corpora, and dHash bits are pure integer comparisons — so the DuckDB
oracle replays every fingerprint bit from ``synth_mjpeg``'s
closed-form frame formula (workload.media_video_fp /
dedup_video_fp).

Pipeline shape: fingerprinting is map-only (mapInPandas — payloads
never shuffle); pairing is ONE shuffle of (id, 64-bit fp) rows. Star
caps and pigeonhole completeness are inherited from
dhash_hamming_pairs.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame

from .imagedup import GRID, dhash_bits, dhash_hamming_pairs, hamming_ball_groups
from .jpeg import _parse_jpeg
from .video import split_mjpeg

_MASK64 = (1 << 64) - 1

VIDEO_FP_DDL = "media_id STRING, vfp LONG"


def video_fp_bits(frame_hashes: list[int]) -> int:
    """Fold per-frame 64-bit dHashes (signed int64 convention, as
    produced by ``imagedup.dhash_bits``) into one sequence fingerprint:
    frame ``f``'s hash is rotated LEFT by ``f mod 64`` bits and XORed
    in. Returns a Python int in int64 range (two's-complement wrap
    when bit 63 is set), the packing every hash in the banding spine
    uses."""
    fp = 0
    for f, h in enumerate(frame_hashes):
        u = h & _MASK64
        r = f % 64
        if r:
            u = ((u << r) | (u >> (64 - r))) & _MASK64
        fp ^= u
    return fp - (1 << 64) if fp >= (1 << 63) else fp


def video_fp(df: DataFrame, grid: int = GRID) -> DataFrame:
    """(media_id, payload, ...) -> (media_id, vfp BIGINT). Map-only
    mapInPandas; payloads that fail the MJPEG split or whose frames
    fail decode validation get a NULL fingerprint — the quarantine
    path, same as dhash_media (never a fabricated hash)."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                try:
                    frames = split_mjpeg(bytes(payload or b""))
                    hashes = [dhash_bits(_parse_jpeg(fb), grid)
                              for fb in frames]
                except ValueError:
                    out.append((mid, None))
                    continue
                out.append((mid, video_fp_bits(hashes)))
            yield pd.DataFrame(out, columns=["media_id", "vfp"])

    return df.select("media_id", "payload").mapInPandas(
        batches, VIDEO_FP_DDL)


def video_dup_pairs(df: DataFrame, grid: int = GRID, bands: int = 8,
                    max_hamming: int = 7,
                    max_bucket: int | None = 64) -> DataFrame:
    """End-to-end near-dup video pairs: split -> decode -> per-frame
    dHash -> rotate-XOR fold -> banded buckets -> verified (id_a,
    id_b, hamming). One shuffle total, carrying (id, 64-bit fp) rows
    — never frames or pixels.

    Defaults differ from the image path (bands=8, max_hamming=7, not
    4/3): a retouch confined to ONE frame flips that frame's dHash
    bits only, but a block-constant frame replicates each luminance
    comparison across the sample rows (4x on the synthetic corpus),
    so a single-comparison retouch already moves 4 fp bits; 8x8-bit
    bands keep the pigeonhole (max_hamming < bands) while budgeting a
    full one-frame retouch.
    cap: max_bucket=64 — the dhash_hamming_pairs star-cap default."""
    return dhash_hamming_pairs(video_fp(df, grid), hash_col="vfp",
                               bands=bands, max_hamming=max_hamming,
                               max_bucket=max_bucket)


VIDEO_FEATURES_DDL = "media_id STRING, features ARRAY<DOUBLE>"


def video_grid_features(df: DataFrame, grid: int = GRID) -> DataFrame:
    """(media_id, payload, ...) -> (media_id, features): the video
    EMBEDDING that makes clips first-class in similarity search
    through the existing knn/ANN tiers (the image/audio precedent,
    r10). Three anchor frames — first, middle (nf//2), last — each
    contribute their grid x grid integer luminance cells
    (``imagedup.grid_luminance_features``'s sample maps), concatenated
    into a fixed 3*grid*grid-dim vector regardless of clip length; a
    2-frame clip anchors (0, 1, 1). Anchors keep coarse temporal
    order (a reversed clip embeds differently when its ends differ)
    while staying fixed-width and CLOSED-FORM: cells are exact
    integers (channel sums, 0..765) emitted as DOUBLE, distance sums
    stay far under 2^53, so the DuckDB oracle value-hashes the full
    split -> decode -> embed -> knn pipeline
    (workload.knn_video_topk). Map-only mapInPandas; NULL quarantine
    for payloads that fail the split or a frame decode."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np
        for pdf in it:
            out = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                try:
                    frames = split_mjpeg(bytes(payload or b""))
                    nf = len(frames)
                    anchors = (0, nf // 2, nf - 1)
                    cells = []
                    for a in anchors:
                        px = _parse_jpeg(frames[a])
                        h, w = px.shape[:2]
                        yi = (np.arange(grid) * h) // grid
                        xi = (np.arange(grid) * w) // grid
                        cells.append(px[yi][:, xi]
                                     .sum(axis=2, dtype=np.int64)
                                     .flatten())
                except ValueError:
                    out.append((mid, None))
                    continue
                out.append((mid, np.concatenate(cells)
                            .astype(np.float64)))
            yield pd.DataFrame(out, columns=["media_id", "features"])

    return df.select("media_id", "payload").mapInPandas(
        batches, VIDEO_FEATURES_DDL)


def video_dup_groups(df: DataFrame, grid: int = GRID, bands: int = 8,
                     max_hamming: int = 7,
                     max_bucket: int | None = 64) -> DataFrame:
    """split -> decode -> fingerprint -> ``hamming_ball_groups``:
    full-coverage Hamming-ball grouping with the exact-hash-class
    collapse (a corpus-sized family of byte-identical clips costs one
    aggregate row — the r9 image pathology fix, inherited).
    cap: max_bucket=64 — the dhash_hamming_pairs star-cap default."""
    return hamming_ball_groups(video_fp(df, grid), hash_col="vfp",
                               bands=bands, max_hamming=max_hamming,
                               max_bucket=max_bucket)
