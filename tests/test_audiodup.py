"""Audio fingerprint dedup (operators/audiodup.py): bit exactness vs
a naive reference, empty-frame short clips, NULL quarantine, stereo
channel summing, and banded near-dup pairs over the real WAV path."""

from __future__ import annotations

import numpy as np

from toy_vector_db_spark.operators.audiodup import (
    audio_dup_pairs, audio_fp, audio_fp_bits,
)
from toy_vector_db_spark.operators.media import encode_wav, synth_wav


def _naive_bits(mag: list[int], frames: int = 65) -> int:
    n = len(mag)
    e = []
    for k in range(frames):
        lo, hi = (k * n) // frames, ((k + 1) * n) // frames
        e.append(sum(mag[lo:hi]))
    val = 0
    for k in range(frames - 1):
        if e[k] > e[k + 1]:
            val |= 1 << k
    return val - (1 << 64) if val >= (1 << 63) else val


def test_bits_match_naive():
    rng = np.random.RandomState(0)
    for n in (1, 50, 64, 65, 130, 1000):
        s = rng.randint(-30000, 30000, (n, 1)).astype(np.int16)
        assert audio_fp_bits(s) == _naive_bits(
            [abs(int(x)) for x in s[:, 0]])


def test_short_clip_empty_frames_deterministic():
    # 50 samples < 65 frames: trailing frames are empty (energy 0);
    # equal adjacent zeros compare false -> deterministic bits
    s = np.full((50, 1), 100, dtype=np.int16)
    b1 = audio_fp_bits(s)
    b2 = audio_fp_bits(s.copy())
    assert b1 == b2


def test_stereo_channels_summed():
    rng = np.random.RandomState(1)
    mono = rng.randint(0, 30000, (130, 1)).astype(np.int16)
    stereo = np.repeat(mono, 2, axis=1)
    # |a|+|a| per frame doubles every energy: same comparisons
    assert audio_fp_bits(stereo) == audio_fp_bits(mono)


def test_one_sample_retouch_flips_at_most_one_bit():
    rng = np.random.RandomState(2)
    s = rng.randint(0, 30000, (200, 1)).astype(np.int16)
    t = s.copy()
    t[0, 0] = (int(t[0, 0]) + 5000) % 30011
    ham = bin((audio_fp_bits(s) ^ audio_fp_bits(t))
              & ((1 << 64) - 1)).count("1")
    assert ham <= 1  # sample 0 is only in frame 0 -> only bit 0


def test_quarantine_and_values(spark):
    df = spark.createDataFrame(
        [("good", encode_wav(np.arange(130, dtype=np.int16)
                             .reshape(-1, 1), 8000)),
         ("junk", b"not audio at all")],
        "media_id string, payload binary")
    rows = {r["media_id"]: r["afp"] for r in audio_fp(df).collect()}
    assert rows["junk"] is None
    mag = [abs(int(x)) for x in np.arange(130)]
    assert rows["good"] == _naive_bits(mag)


def test_dup_pairs_find_retouched_twins(spark):
    base = synth_wav(spark, n=8)
    twin = synth_wav(spark, n=8, bump=(0, 5000), id_prefix="wavB_")
    pairs = {(r["id_a"], r["id_b"]): r["hamming"] for r in
             audio_dup_pairs(base.unionByName(twin),
                             bands=4, max_hamming=3).collect()}
    # every base/twin pair differs in at most bit 0 -> all found
    for i in range(8):
        key = tuple(sorted([f"wav_{i}", f"wavB_{i}"]))
        assert key in pairs and pairs[key] <= 1


def test_fingerprint_plan_is_map_only(spark):
    # payloads never shuffle: fingerprinting itself must plan with no
    # Exchange (the ONE shuffle lives in the banding groupBy)
    plan = audio_fp(synth_wav(spark, n=2)) \
        ._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_energy_features_closed_form(spark):
    from toy_vector_db_spark.operators.audiodup import energy_features
    feats = {r["media_id"]: r["features"] for r in
             energy_features(synth_wav(spark, n=4)).collect()}
    for i in range(4):
        ns = (i % 4 + 1) * 50
        mag = [(i * 1009 + j * 757) % 30011 for j in range(ns)]
        cuts = [(k * ns) // 65 for k in range(66)]
        exp = [float(sum(mag[cuts[k]:cuts[k + 1]])) for k in range(65)]
        assert list(feats[f"wav_{i}"]) == exp
    df = spark.createDataFrame([("junk", b"nope")],
                               "media_id string, payload binary")
    assert energy_features(df).collect()[0]["features"] is None


def test_audio_features_through_ivf_tier(spark):
    # audio first-class in similarity search: the energy embedding
    # rides the existing IVF index with exhaustive-probe exact recall
    from toy_vector_db_spark.operators.ann import IvfIndex
    from toy_vector_db_spark.operators.audiodup import energy_features
    from toy_vector_db_spark.operators.knn import knn
    feats = energy_features(synth_wav(spark, n=16)).localCheckpoint()
    qvec = [float(v) for v in feats.filter(
        "media_id = 'wav_0'").collect()[0]["features"]]
    exact = [r["media_id"] for r in
             knn(feats, qvec, k=5, metric="euclidean",
                 vec_col="features", tie_col="media_id").collect()]
    idx = IvfIndex.build_deterministic(
        feats, n_centroids=4, id_col="media_id", vec_col="features")
    approx = [r["media_id"] for r in
              knn(idx.candidates(qvec, nprobe=4), qvec, k=5,
                  metric="euclidean", vec_col="features",
                  tie_col="media_id").collect()]
    assert approx == exact


def test_audio_dup_groups_full_coverage(spark):
    from toy_vector_db_spark.operators.audiodup import audio_dup_groups
    # 12 clips in 4 byte-identical families (id_mod) — every clip
    # grouped, keep = min id per family
    corpus = synth_wav(spark, n=12, id_mod=4)
    rows = audio_dup_groups(corpus).collect()
    assert len(rows) == 12
    groups: dict = {}
    for r in rows:
        groups.setdefault(r["group_id"], set()).add(r["media_id"])
        assert r["keep"] == min(
            (f"wav_{i}" for i in range(12)
             if i % 4 == int(r["media_id"].split("_")[1]) % 4))
    assert len(groups) == 4
    for members in groups.values():
        assert len(members) == 3


def test_resample_audio_exact_and_quarantine(spark):
    import numpy as np

    from toy_vector_db_spark.operators.media import (
        _parse_wav, resample_audio)
    rows = {r["media_id"]: r for r in
            resample_audio(synth_wav(spark, n=6), 8000).collect()}
    for i in range(6):
        ns = (i % 4 + 1) * 50
        sr = 8000 + (i % 3) * 4000
        nd = (ns * 8000) // sr
        r = rows[f"wav_{i}"]
        assert r["decoded"] and r["n_samples"] == nd
        samples, rate = _parse_wav(bytes(r["payload"]))
        assert rate == 8000 and samples.shape == (nd, 1)
        src = np.array([(i * 1009 + j * 757) % 30011 for j in range(ns)])
        exp = src[(np.arange(nd) * ns) // nd]
        assert np.array_equal(samples[:, 0], exp.astype(np.int16))
    junk = spark.createDataFrame([("junk", b"xx")],
                                 "media_id string, payload binary")
    jr = resample_audio(junk, 8000).collect()[0]
    assert not jr["decoded"] and bytes(jr["payload"]) == b"xx"


def test_resample_audio_stereo_mixdown(spark):
    import numpy as np

    from toy_vector_db_spark.operators.media import (
        _parse_wav, encode_wav, resample_audio)
    stereo = np.stack([np.arange(100, dtype=np.int16),
                       np.arange(100, dtype=np.int16) + 3], axis=1)
    df = spark.createDataFrame(
        [("st", encode_wav(stereo, 8000))],
        "media_id string, payload binary")
    r = resample_audio(df, 8000).collect()[0]
    samples, _ = _parse_wav(bytes(r["payload"]))
    # floor(mean + 0.5): (j + j+3)/2 + .5 = j+2 exactly
    assert np.array_equal(samples[:, 0],
                          (np.arange(100) + 2).astype(np.int16))


# ---------------------------------------------------------------------------
# Spectral-band fingerprint (r11): Haitsma-Kalker band-energy deltas.
# The fp values have no SQL oracle (FFT — see the module comment), so
# these property gates plus the workload gain-check derived statistic
# are its correctness surface.
# ---------------------------------------------------------------------------

def _wav_np(i: int):
    ns = (i % 4 + 1) * 50
    s = np.array([(i * 1009 + j * 757) % 30011 for j in range(ns)],
                 dtype=np.int16).reshape(-1, 1)
    return s, 8000 + (i % 3) * 4000


def _ham64(a: int, b: int) -> int:
    return bin((a ^ b) & ((1 << 64) - 1)).count("1")


def test_spectral_deterministic_and_int64():
    from toy_vector_db_spark.operators.audiodup import spectral_fp_bits
    for i in range(8):
        s, r = _wav_np(i)
        v = spectral_fp_bits(s, r)
        assert v == spectral_fp_bits(s.copy(), r)
        assert -(1 << 63) <= v < (1 << 63)


def test_spectral_gain_invariance_exact():
    # power-of-two gain scales every FFT multiply-add exactly in
    # float64 -> identical comparisons, hamming 0 (the property the
    # driver hashes via workload.audio_fp_spectral)
    from toy_vector_db_spark.operators.audiodup import spectral_fp_bits
    for i in range(8):
        s, r = _wav_np(i)
        mono = s.astype(np.float64).sum(axis=1)
        base = spectral_fp_bits(s, r)
        for g in (0.5, 0.25, 2.0):
            assert spectral_fp_bits(mono * g, r) == base


def test_spectral_stereo_mixdown_matches_mono_sum():
    from toy_vector_db_spark.operators.audiodup import spectral_fp_bits
    s, r = _wav_np(5)
    stereo = np.repeat(s, 2, axis=1)
    # channel sum doubles the mono signal = a gain of 2 -> invariant
    assert spectral_fp_bits(stereo, r) == spectral_fp_bits(s, r)


def test_spectral_retouch_locality():
    # silencing exactly frame 0 can only move band deltas at
    # transition 0 -> at most (bands-1) = 4 bits flip
    from toy_vector_db_spark.operators.audiodup import spectral_fp_bits
    flips = []
    for i in range(16):
        s, r = _wav_np(i)
        mono = s.astype(np.float64).sum(axis=1)
        t = mono.copy()
        t[: mono.size // 17] = 0.0
        flips.append(_ham64(spectral_fp_bits(mono, r),
                            spectral_fp_bits(t, r)))
    assert max(flips) <= 4
    assert any(f > 0 for f in flips)     # sensitivity is not vacuous


def test_spectral_resample_robustness():
    # 2x repeat-upsample at 2x rate: images land above TOP_HZ and are
    # excluded by the rate-aware banding; residual drift comes from
    # the |1 + W^k| comb tilt only — bounded well under half the bits
    from toy_vector_db_spark.operators.audiodup import spectral_fp_bits
    hams = []
    for i in range(16):
        s, r = _wav_np(i)
        up = np.repeat(s, 2, axis=0)
        hams.append(_ham64(spectral_fp_bits(s, r),
                           spectral_fp_bits(up, 2 * r)))
    assert max(hams) <= 24
    assert sum(hams) / len(hams) <= 10


def test_spectral_fp_spark_quarantine_and_pairs(spark):
    from toy_vector_db_spark.operators.audiodup import (
        audio_spectral_dup_pairs, spectral_fp,
    )
    base = synth_wav(spark, n=8)
    twin = synth_wav(spark, n=8, id_prefix="wavC_")   # byte-identical
    corpus = base.unionByName(twin)
    rows = {r["media_id"]: r["sfp"] for r in spectral_fp(corpus).collect()}
    assert len(rows) == 16 and all(v is not None for v in rows.values())
    from toy_vector_db_spark.operators.audiodup import spectral_fp_bits
    for i in (0, 3):
        s, r = _wav_np(i)
        assert rows[f"wav_{i}"] == spectral_fp_bits(s, r)
    pairs = {(p["id_a"], p["id_b"]): p["hamming"]
             for p in audio_spectral_dup_pairs(corpus).collect()}
    for i in range(8):
        a, b = sorted([f"wav_{i}", f"wavC_{i}"])
        assert pairs[(a, b)] == 0         # identical clips pair at 0
    bad = spark.createDataFrame([("junk", bytearray(b"nope"))],
                                "media_id string, payload binary")
    assert spectral_fp(bad).collect()[0]["sfp"] is None


def test_spectral_gain_check_all_zero(spark):
    from toy_vector_db_spark.operators.audiodup import spectral_gain_check
    rows = spectral_gain_check(synth_wav(spark, n=6), gain=0.5).collect()
    assert len(rows) == 6
    assert all(r["gain_hamming"] == 0 for r in rows)
