"""Property-style correctness: metric axioms checked in bulk against
numpy on adversarial vector pairs (zeros, equal, opposite, tiny/huge
magnitudes), plus hypothesis on the driver-side pure functions."""

from __future__ import annotations

import math

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from toy_vector_db_spark.functions.distance import METRICS, distance
from toy_vector_db_spark.functions.embedding import embed_one
from toy_vector_db_spark.functions.vector import normalize
from toy_vector_db_spark.operators.ann import probe_signatures, query_signature

DIM = 16
N = 200


def _corpus():
    rng = np.random.RandomState(7)
    vs = rng.normal(size=(N, DIM)) * rng.choice([1e-3, 1.0, 1e3], size=(N, 1))
    vs[0] = 0.0                      # zero vector
    vs[1] = vs[2]                    # identical pair
    vs[3] = -vs[4]                   # opposite pair
    return vs


@pytest.fixture(scope="module")
def pairs_df(spark):
    vs = _corpus()
    rows = [(i, vs[i].tolist(), vs[(i + 1) % N].tolist()) for i in range(N)]
    return spark.createDataFrame(rows, "i INT, a ARRAY<DOUBLE>, b ARRAY<DOUBLE>")


def _np_dist(metric, a, b):
    if metric == "euclidean":
        return float(np.sqrt(((a - b) ** 2).sum()))
    if metric == "manhattan":
        return float(np.abs(a - b).sum())
    if metric == "dotproduct":
        return float(-(a * b).sum())
    na, nb = np.linalg.norm(a), np.linalg.norm(b)
    if na == 0 or nb == 0:
        return 1.0
    return float(1.0 - np.clip((a * b).sum() / (na * nb), -1.0, 1.0))


@pytest.mark.parametrize("metric", sorted(METRICS))
def test_metric_matches_numpy_on_adversarial_pairs(pairs_df, metric):
    vs = _corpus()
    got = {r["i"]: r["d"] for r in pairs_df.select(
        "i", distance(metric, F.col("a"), F.col("b")).alias("d")).collect()}
    for i in range(N):
        want = _np_dist(metric, vs[i], vs[(i + 1) % N])
        scale = max(abs(want), 1.0)
        assert got[i] == pytest.approx(want, rel=1e-6, abs=1e-9 * scale), (metric, i)


def test_metric_axioms(pairs_df):
    a, b = F.col("a"), F.col("b")
    rows = pairs_df.select(
        distance("euclidean", a, b).alias("l2"),
        distance("euclidean", b, a).alias("l2r"),
        distance("manhattan", a, b).alias("l1"),
        distance("cosine", a, b).alias("cos"),
        distance("euclidean", a, a).alias("self")).collect()
    for r in rows:
        assert r["self"] == 0.0
        assert r["l2"] == pytest.approx(r["l2r"], rel=1e-12)   # symmetry
        assert r["l1"] >= r["l2"] - 1e-9                       # L1 >= L2
        assert -1e-12 <= r["cos"] <= 2.0 + 1e-12               # range


def test_normalize_unit_norm_and_zero_fixed(spark):
    vs = _corpus()[:50]
    df = spark.createDataFrame([(v.tolist(),) for v in vs], "v ARRAY<DOUBLE>")
    out = df.select(normalize(F.col("v")).alias("n"),
                    F.col("v")).collect()
    for r in out:
        norm = math.sqrt(sum(x * x for x in r["n"]))
        if all(x == 0.0 for x in r["v"]):
            assert r["n"] == r["v"]          # zero vector untouched
        else:
            assert norm == pytest.approx(1.0, rel=1e-9)


# -- driver-side pure functions (hypothesis) -------------------------------

@given(st.text(max_size=200))
@settings(max_examples=200, deadline=None)
def test_embedder_contract(text):
    v1, v2 = embed_one(text), embed_one(text)
    assert np.array_equal(v1, v2)                       # deterministic
    assert v1.shape == (384,) and v1.dtype == np.float64
    assert np.linalg.norm(v1) == pytest.approx(1.0, rel=1e-5)


@given(st.integers(2, 12), st.integers(0, 3), st.integers(0, 4095))
@settings(max_examples=200, deadline=None)
def test_probe_signatures_hamming_ball(n_planes, multiprobe, raw_sig):
    sig = raw_sig % (1 << n_planes)
    probes = probe_signatures(sig, n_planes, multiprobe)
    assert sig in probes
    for p in probes:
        assert 0 <= p < (1 << n_planes)
        assert bin(p ^ sig).count("1") <= multiprobe


@given(st.lists(st.floats(-1e3, 1e3, allow_nan=False), min_size=4, max_size=4))
@settings(max_examples=100, deadline=None)
def test_query_signature_matches_columnwise(qvec):
    planes = np.random.RandomState(3).normal(size=(5, 4))
    sig = query_signature(qvec, planes)
    want = sum(1 << i for i, d in enumerate(planes @ np.asarray(qvec))
               if d > 0)
    assert sig == want
