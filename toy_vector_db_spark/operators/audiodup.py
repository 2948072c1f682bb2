"""Perceptual audio dedup: frame-energy sign-bit fingerprint over the
REAL WAV/PCM16 decode path, banded through the hash-agnostic
``imagedup.dhash_hamming_pairs`` verifier (r10, VERDICT r9 Next #3).

The fingerprint is the audio twin of the image dHash (Krawetz-style
delta hashing applied to the energy envelope, the simplest member of
the Haitsma-Kalker/Shazam family of spectral-delta fingerprints):
split the |sample| envelope into ``frames+1 = 65`` integer-boundary
frames, emit one bit per adjacent-frame energy comparison. A few
retouched samples move one frame's energy and flip at most the two
bits that frame participates in, so near-identical clips land within
a couple of Hamming bits — robust to trailing edits, unlike byte
hashing.

Determinism contract (same as imagedup): frame boundaries are pure
integer floor maps ``(k*n)//frames`` and energies are exact integer
|sample| sums, so the DuckDB oracle replays every bit from the
synthetic corpus' closed-form sample formula
(workload.media_audio_fp / dedup_audio_fp).

Pipeline shape: fingerprinting is map-only (mapInPandas — payloads
never shuffle); pairing reuses the pigeonhole banding + xor/popcount
verify, ONE shuffle of (id, 64-bit fingerprint) rows. Star caps and
pigeonhole completeness are inherited from dhash_hamming_pairs.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

from .imagedup import dhash_hamming_pairs
from .media import _parse_wav

#: 64 delta bits need 65 frames; matches the image-hash BITS so the
#: banding geometry (4 x 16-bit bands) is shared.
FRAMES = 65

AUDIO_FP_DDL = "media_id STRING, afp LONG"


def audio_fp_bits(samples: np.ndarray, frames: int = FRAMES) -> int:
    """(n, channels) int16 samples -> 64-bit fingerprint as a Python
    int in int64 range. Bit ``k`` is 1 iff the energy (exact integer
    sum of channel-summed |sample|) of frame ``k`` exceeds frame
    ``k+1``; frame k covers samples [(k*n)//frames, ((k+1)*n)//frames).
    Short clips leave trailing frames empty (energy 0) — deterministic,
    never an error."""
    mag = np.abs(samples.astype(np.int64)).sum(axis=1)
    n = mag.size
    cuts = (np.arange(frames + 1, dtype=np.int64) * n) // frames
    cs = np.concatenate([[0], np.cumsum(mag)])
    e = cs[cuts[1:]] - cs[cuts[:-1]]
    bits = e[:-1] > e[1:]
    val = int(bits @ (1 << np.arange(bits.size, dtype=np.uint64)))
    return val - (1 << 64) if val >= (1 << 63) else val


def audio_fp(df: DataFrame, frames: int = FRAMES) -> DataFrame:
    """(media_id, payload, ...) -> (media_id, afp BIGINT). Map-only
    mapInPandas; payloads the WAV codec cannot decode get a NULL
    fingerprint — the quarantine path, same as dhash_media."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                try:
                    samples, _ = _parse_wav(bytes(payload or b""))
                except ValueError:
                    out.append((mid, None))
                    continue
                out.append((mid, audio_fp_bits(samples, frames)))
            yield pd.DataFrame(out, columns=["media_id", "afp"])

    return df.select("media_id", "payload").mapInPandas(
        batches, AUDIO_FP_DDL)


def audio_dup_pairs(df: DataFrame, frames: int = FRAMES, bands: int = 4,
                    max_hamming: int = 3,
                    max_bucket: int | None = 64) -> DataFrame:
    """End-to-end perceptual near-dup pairs over an audio table:
    decode -> fingerprint -> banded buckets -> verified (id_a, id_b,
    hamming). One shuffle total, carrying (id, 64-bit fingerprint)
    rows — never samples.
    cap: max_bucket=64 — the dhash_hamming_pairs star-cap default."""
    return dhash_hamming_pairs(audio_fp(df, frames), hash_col="afp",
                               bands=bands, max_hamming=max_hamming,
                               max_bucket=max_bucket)


ENERGY_FEATURES_DDL = "media_id STRING, features ARRAY<DOUBLE>"


def energy_features(df: DataFrame, frames: int = FRAMES) -> DataFrame:
    """(media_id, payload, ...) -> (media_id, features): the 65 frame
    energies UNTHRESHOLDED (exact integer |sample| sums as DOUBLE) —
    the audio twin of ``imagedup.grid_luminance_features``, so audio
    clips are first-class in similarity search through the existing
    knn/IVF tiers (r10). Energies stay well under 2^53 (30011 * a few
    hundred samples), so L2 distance sums are exact in float64 and a
    closed-form oracle value-hashes decode -> embed -> knn end to end
    (workload.knn_audio_topk). Map-only; NULL quarantine."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                try:
                    samples, _ = _parse_wav(bytes(payload or b""))
                except ValueError:
                    out.append((mid, None))
                    continue
                mag = np.abs(samples.astype(np.int64)).sum(axis=1)
                n = mag.size
                cuts = (np.arange(frames + 1, dtype=np.int64) * n) // frames
                cs = np.concatenate([[0], np.cumsum(mag)])
                e = (cs[cuts[1:]] - cs[cuts[:-1]]).astype(np.float64)
                out.append((mid, e))
            yield pd.DataFrame(out, columns=["media_id", "features"])

    return df.select("media_id", "payload").mapInPandas(
        batches, ENERGY_FEATURES_DDL)


def audio_dup_groups(df: DataFrame, frames: int = FRAMES,
                     bands: int = 4, max_hamming: int = 3,
                     max_bucket: int | None = 64) -> DataFrame:
    """decode -> fingerprint -> ``imagedup.hamming_ball_groups``:
    full-coverage Hamming-ball grouping with the exact-hash-class
    collapse, so a corpus-sized family of byte-identical clips costs
    one aggregate row and cannot be lost to the star cap (the r9
    image pathology, inherited fix).
    cap: max_bucket=64 — the dhash_hamming_pairs star-cap default."""
    from .imagedup import hamming_ball_groups
    return hamming_ball_groups(audio_fp(df, frames), hash_col="afp",
                               bands=bands, max_hamming=max_hamming,
                               max_bucket=max_bucket)
