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


# ---------------------------------------------------------------------------
# Spectral-band fingerprint (r11, VERDICT r10 Next #6): the
# Haitsma-Kalker band-energy-delta scheme ("A Highly Robust Audio
# Fingerprint", CBMI 2002) — the frequency-domain robustness tier the
# envelope fingerprint above lacks. 17 time frames x 5 frequency
# bands; bit (t, b) is the sign of the time-delta of the band-delta:
#   (E[t+1][b] - E[t+1][b+1]) - (E[t][b] - E[t][b+1]) > 0
# 16 transitions x 4 band-deltas = 64 bits, riding the same
# hash-agnostic banding spine as the image/audio/video fingerprints.
#
# WHY NO VALUE ORACLE (the one fingerprint family without one): the
# band energies are float64 FFT magnitudes — DuckDB has no FFT, and
# replaying one in SQL would be a reimplementation, not an oracle.
# The driver-checkable surface is the scheme's DEFINING property
# instead: band-energy comparisons are homogeneous in gain, and a
# power-of-two gain is EXACT in float64 (scaling commutes with every
# FFT multiply-add bit-for-bit), so fp(x) == fp(gain * x) exactly —
# workload.audio_fp_spectral hashes that derived statistic (hamming
# 0 for every clip) while pytest property gates cover determinism,
# retouch locality, and resample robustness.
#
# Bands are RATE-AWARE: edges are fixed fractions of [0, TOP_HZ), not
# of the clip's own Nyquist, so clips at different sample rates (the
# corpus mixes 8/12/16 kHz) band comparably and an upsample's mirror
# images (which land above the source Nyquist >= TOP_HZ) are excluded
# from every band.
# ---------------------------------------------------------------------------

#: 16 frame transitions x 4 band deltas = the spine's 64-bit width.
SPECTRAL_FRAMES = 17
SPECTRAL_BANDS = 5
#: analysis ceiling: the lowest Nyquist in scope (8 kHz clips) so all
#: rates cover every band and upsample images stay out of band.
TOP_HZ = 4000

SPECTRAL_FP_DDL = "media_id STRING, sfp LONG"


def spectral_band_energies(mono: np.ndarray, rate: int,
                           frames: int = SPECTRAL_FRAMES,
                           bands: int = SPECTRAL_BANDS,
                           top_hz: int = TOP_HZ) -> np.ndarray:
    """(frames, bands) float64 band energies of a mono float signal:
    integer-floor frame cuts (same maps as the envelope fp), per-frame
    rfft power spectrum, bin k (frequency k*rate/m) accumulated into
    band (k*rate*bands) // (m*top_hz) when below ``top_hz``. Empty
    frames (clips shorter than ``frames`` samples) stay all-zero."""
    n = mono.size
    cuts = (np.arange(frames + 1, dtype=np.int64) * n) // frames
    out = np.zeros((frames, bands), dtype=np.float64)
    for t in range(frames):
        seg = mono[cuts[t]:cuts[t + 1]]
        if seg.size == 0:
            continue
        spec = np.abs(np.fft.rfft(seg)) ** 2
        k = np.arange(spec.size, dtype=np.int64)
        bidx = (k * rate * bands) // (seg.size * top_hz)
        live = bidx < bands                  # freq < top_hz only
        np.add.at(out[t], bidx[live], spec[live])
    return out


def spectral_fp_bits(samples: np.ndarray, rate: int,
                     frames: int = SPECTRAL_FRAMES,
                     bands: int = SPECTRAL_BANDS) -> int:
    """(n, channels) int16 (or float mono) samples -> 64-bit spectral
    fingerprint as a Python int in int64 range. Mono mixdown is the
    exact channel sum (the envelope fp's convention)."""
    mono = (samples.astype(np.float64).sum(axis=1)
            if samples.ndim == 2 else samples.astype(np.float64))
    e = spectral_band_energies(mono, rate, frames, bands)
    d = e[:, :-1] - e[:, 1:]                 # band deltas per frame
    bits = ((d[1:] - d[:-1]) > 0).flatten()  # bit t*(bands-1)+b
    val = int(bits @ (1 << np.arange(bits.size, dtype=np.uint64)))
    return val - (1 << 64) if val >= (1 << 63) else val


def spectral_fp(df: DataFrame, frames: int = SPECTRAL_FRAMES,
                bands: int = SPECTRAL_BANDS) -> DataFrame:
    """(media_id, payload, ...) -> (media_id, sfp BIGINT). Map-only
    mapInPandas; undecodable payloads quarantine to NULL."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                try:
                    samples, rate = _parse_wav(bytes(payload or b""))
                except ValueError:
                    out.append((mid, None))
                    continue
                out.append((mid, spectral_fp_bits(samples, rate,
                                                  frames, bands)))
            yield pd.DataFrame(out, columns=["media_id", "sfp"])

    return df.select("media_id", "payload").mapInPandas(
        batches, SPECTRAL_FP_DDL)


def spectral_gain_check(df: DataFrame, gain: float = 0.5,
                        frames: int = SPECTRAL_FRAMES,
                        bands: int = SPECTRAL_BANDS) -> DataFrame:
    """(media_id, gain_hamming BIGINT): Hamming distance between the
    spectral fingerprint of each decoded clip and of the same clip
    scaled by ``gain`` — the scheme's gain-invariance property as a
    derived statistic (0 for every decodable clip when ``gain`` is a
    power of two, which scales every FFT term exactly). This is the
    driver-hashable surface of an operator whose raw values have no
    SQL oracle (module comment). Undecodable payloads quarantine to
    NULL. Map-only mapInPandas."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                try:
                    samples, rate = _parse_wav(bytes(payload or b""))
                except ValueError:
                    out.append((mid, None))
                    continue
                mono = samples.astype(np.float64).sum(axis=1)
                a = spectral_fp_bits(mono, rate, frames, bands)
                b = spectral_fp_bits(mono * gain, rate, frames, bands)
                out.append((mid, ((a ^ b) & ((1 << 64) - 1)).bit_count()))
            yield pd.DataFrame(out, columns=["media_id", "gain_hamming"])

    return df.select("media_id", "payload").mapInPandas(
        batches, "media_id STRING, gain_hamming LONG")


def audio_spectral_dup_pairs(df: DataFrame, bands: int = 4,
                             max_hamming: int = 3,
                             max_bucket: int | None = 64) -> DataFrame:
    """End-to-end spectral near-dup pairs: decode -> spectral fp ->
    banded buckets -> verified (id_a, id_b, hamming). Same one-shuffle
    shape as audio_dup_pairs (``bands`` here is the BANDING split of
    the 64-bit fp, not the frequency-band count).
    cap: max_bucket=64 — the dhash_hamming_pairs star-cap default."""
    return dhash_hamming_pairs(spectral_fp(df), hash_col="sfp",
                               bands=bands, max_hamming=max_hamming,
                               max_bucket=max_bucket)


def audio_spectral_dup_groups(df: DataFrame, bands: int = 4,
                              max_hamming: int = 3,
                              max_bucket: int | None = 64) -> DataFrame:
    """decode -> spectral fp -> ``imagedup.hamming_ball_groups`` (the
    exact-hash-class collapse, inherited).
    cap: max_bucket=64 — the dhash_hamming_pairs star-cap default."""
    from .imagedup import hamming_ball_groups
    return hamming_ball_groups(spectral_fp(df), hash_col="sfp",
                               bands=bands, max_hamming=max_hamming,
                               max_bucket=max_bucket)


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
