"""Clustered-corpus recall gates for the ANN tiers.

BASELINE.md documents that the driver's near-uniform synthetic
embeddings make recall track candidate fraction almost linearly — a
weak test of ANN quality. Real corpora are clustered; that is the
regime LSH/IVF/PQ are built for. This module plants deterministic
Gaussian clusters (centroid scale 10x the intra-cluster noise) and
gates each approximate tier at

    mean recall@10 >= 0.9   with   mean candidate fraction <= 0.1

i.e. >=90% of the true neighbors while scanning <=10% of the corpus.
Also pins the residual-encoding claim: residual IVF-PQ (codes quantize
v - centroid[cluster], Lloyd-trained codebooks) must beat raw-vector
IVF-PQ at EQUAL code size on clustered data.
"""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from toy_vector_db_spark.operators.ann import IvfIndex, LshIndex
from toy_vector_db_spark.operators.knn import knn
from toy_vector_db_spark.operators.pq import IvfPqIndex

N, DIM, N_CLUSTERS = 4096, 32, 16
K = 10
N_QUERIES = 5


@pytest.fixture(scope="module")
def clustered(spark):
    rng = np.random.default_rng(7)
    cents = rng.normal(size=(N_CLUSTERS, DIM)) * 10.0
    assign = rng.integers(0, N_CLUSTERS, size=N)
    pts = cents[assign] + rng.normal(size=(N, DIM))
    rows = [(int(i), [float(x) for x in pts[i]]) for i in range(N)]
    df = spark.createDataFrame(
        rows, "vec_id BIGINT, embedding ARRAY<FLOAT>").repartition(8) \
        .localCheckpoint()
    queries = [[float(x) for x in cents[c] + rng.normal(size=DIM)]
               for c in range(N_QUERIES)]
    exact = [
        {r["vec_id"] for r in
         knn(df, q, k=K, metric="euclidean", tie_col="vec_id").collect()}
        for q in queries]
    return df, queries, exact


def _gate(df, queries, exact, search_fn, candidates_fn):
    recalls, fractions = [], []
    for q, truth in zip(queries, exact):
        got = {r["vec_id"] for r in search_fn(q).collect()}
        recalls.append(len(got & truth) / len(truth))
        fractions.append(candidates_fn(q).count() / N)
    return float(np.mean(recalls)), float(np.mean(fractions))


def test_lsh_recall_gate(spark, clustered):
    df, queries, exact = clustered
    idx = LshIndex.build(df, n_planes=12)
    recall, fraction = _gate(
        df, queries, exact,
        lambda q: idx.search(q, k=K, metric="euclidean", multiprobe=2),
        lambda q: idx.candidates(q, multiprobe=2))
    assert recall >= 0.9, f"LSH recall {recall:.3f} < 0.9"
    assert fraction <= 0.1, f"LSH candidate fraction {fraction:.3f} > 0.1"


def test_ivf_recall_gate(spark, clustered):
    df, queries, exact = clustered
    idx = IvfIndex.build(df, n_centroids=32, train_rows=N)
    recall, fraction = _gate(
        df, queries, exact,
        lambda q: idx.search(q, k=K, metric="euclidean", nprobe=2),
        lambda q: idx.candidates(q, nprobe=2))
    assert recall >= 0.9, f"IVF recall {recall:.3f} < 0.9"
    assert fraction <= 0.1, f"IVF candidate fraction {fraction:.3f} > 0.1"


def test_ivfpq_residual_recall_gate(spark, clustered):
    df, queries, exact = clustered
    idx = IvfPqIndex.build_residual(df, n_centroids=32, m=8, ks=16,
                                    trained_centroids=True, train_rows=N)
    recall, fraction = _gate(
        df, queries, exact,
        lambda q: idx.search(q, k=K, nprobe=2, rerank=10),
        lambda q: idx.candidates(q, nprobe=2))
    assert recall >= 0.9, f"IVF-PQ recall {recall:.3f} < 0.9"
    assert fraction <= 0.1, f"IVF-PQ candidate fraction {fraction:.3f} > 0.1"


def test_knn_join_ivf_batch_recall_gate(spark, clustered):
    """The batch join must hit the same quality bar as the per-query
    search path: >=90% of true neighbors per query at nprobe=2 over a
    32-cluster index — one equi-join for all queries at once."""
    from toy_vector_db_spark.operators.knn import knn_join_ivf
    df, queries, exact = clustered
    idx = IvfIndex.build(df, n_centroids=32, train_rows=N)
    qdf = spark.createDataFrame(
        [(i, q) for i, q in enumerate(queries)],
        "query_id BIGINT, query_vec ARRAY<DOUBLE>")
    rows = knn_join_ivf(qdf, idx, k=K, nprobe=2,
                        metric="euclidean").collect()
    recalls = []
    for i, truth in enumerate(exact):
        got = {r["vec_id"] for r in rows if r["query_id"] == i}
        recalls.append(len(got & truth) / len(truth))
    recall = float(np.mean(recalls))
    assert recall >= 0.9, f"batch IVF join recall {recall:.3f} < 0.9"


def test_knn_join_ivfpq_batch_recall_gate(spark, clustered):
    """Compressed-domain batch join with residual codes + exact rerank
    reaches the same gate while the join scans only code bytes."""
    from toy_vector_db_spark.operators.pq import knn_join_ivfpq
    df, queries, exact = clustered
    idx = IvfPqIndex.build_residual(df, n_centroids=32, m=8, ks=16,
                                    trained_centroids=True, train_rows=N)
    qdf = spark.createDataFrame(
        [(i, q) for i, q in enumerate(queries)],
        "query_id BIGINT, query_vec ARRAY<DOUBLE>")
    rows = knn_join_ivfpq(qdf, idx, k=K, nprobe=2, rerank=10).collect()
    recalls = []
    for i, truth in enumerate(exact):
        got = {r["vec_id"] for r in rows if r["query_id"] == i}
        recalls.append(len(got & truth) / len(truth))
    recall = float(np.mean(recalls))
    assert recall >= 0.9, f"batch IVF-PQ join recall {recall:.3f} < 0.9"


def test_residual_beats_raw_at_equal_code_size(spark, clustered):
    """The residual claim (pq.py IvfPqIndex docstring): at identical
    (n_centroids, m, ks) — same bytes per row — residual codes must
    rank true neighbors into the rerank shortlist far better than raw
    codes. Shortlist containment (true top-10 inside the ADC top-50)
    is the operative quantity: it is exactly what the exact re-rank
    consumes. On iid-Gaussian clusters distances concentrate, so
    ADC-only top-k recall is weak for ANY code; the shortlist metric
    isolates code quality. Measured on this fixture: residual ~0.70
    vs raw ~0.26 at shortlist 50."""
    df, queries, exact = clustered
    raw = IvfPqIndex.build_deterministic(df, n_centroids=24, m=8, ks=16)
    res = IvfPqIndex.build_residual(df, n_centroids=24, m=8, ks=16,
                                    train_rows=N)
    shortlist = 50

    def containment(idx):
        recs = []
        for q, truth in zip(queries, exact):
            got = {r["vec_id"] for r in
                   idx.search(q, k=shortlist, nprobe=3).collect()}
            recs.append(len(got & truth) / len(truth))
        return float(np.mean(recs))

    c_raw, c_res = containment(raw), containment(res)
    assert c_res >= c_raw, f"residual {c_res:.3f} < raw {c_raw:.3f}"
    assert c_res >= 0.6, f"residual shortlist containment {c_res:.3f} < 0.6"


def test_residual_index_roundtrip_and_add(spark, clustered, tmp_path):
    """Maintenance + persistence work in residual mode: add() encodes
    the delta against the SAME centroids/codebooks; save/load keeps
    the residual flag so searches stay correct."""
    df, queries, exact = clustered
    half = df.filter(F.col("vec_id") < N // 2)
    rest = df.filter(F.col("vec_id") >= N // 2)
    idx = IvfPqIndex.build_residual(half, n_centroids=24, m=8, ks=16,
                                    train_rows=N)
    idx = idx.add(rest)
    assert idx.size() == N
    path = str(tmp_path / "ivfpq_res")
    idx.save(path)
    idx2 = IvfPqIndex.load(spark, path)
    assert idx2.residual is True
    # Recall here only sanity-checks that the reloaded residual codes
    # still rank correctly (centroids/codebooks were trained on HALF
    # the corpus, so the 0.9 quality gate above doesn't apply).
    q = queries[0]
    got = {r["vec_id"] for r in
           idx2.search(q, k=K, nprobe=4, rerank=10).collect()}
    assert len(got & exact[0]) / K >= 0.7
