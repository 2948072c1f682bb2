"""Product quantization: compressed-domain ANN (operators/pq.py).

ADC is an approximation of euclidean distance, so the contract is
recall-vs-exact plus exactness of the deterministic pipeline itself
(codes and ADC scores are value-oracled in workload.ann_pq_adc_topk).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from toy_vector_db_spark.operators.knn import knn, lookup_vector
from toy_vector_db_spark.operators.pq import PqCodec, PqIndex

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet(f"{SF}/embeddings.parquet").cache()


@pytest.fixture(scope="module")
def qvec(emb):
    return lookup_vector(emb, "vec_id", 7)


@pytest.fixture(scope="module")
def idx(emb):
    return PqIndex.build(emb, m=4, ks=8)


def test_codes_shape_and_range(emb, idx):
    dim = len(emb.select("embedding").first()[0])
    assert idx.codec.m * idx.codec.dsub == dim
    stats = idx.table.select(
        F.min(F.size("__code")).alias("lo"), F.max(F.size("__code")).alias("hi"),
        F.max(F.array_max("__code")).alias("cmax"),
        F.min(F.array_min("__code")).alias("cmin")).first()
    assert stats["lo"] == stats["hi"] == 4
    assert 0 <= stats["cmin"] and stats["cmax"] <= 7


def test_encode_deterministic(emb):
    a = PqIndex.build(emb, m=4, ks=8)
    b = PqIndex.build(emb, m=4, ks=8)
    rows_a = {r["vec_id"]: list(r["__code"]) for r in a.table.collect()}
    rows_b = {r["vec_id"]: list(r["__code"]) for r in b.table.collect()}
    assert rows_a == rows_b


def test_adc_self_match_small(idx, qvec):
    # the query row's own ADC distance is the quantization error —
    # must be among the smallest, and far below the corpus median
    top = idx.search(qvec, k=10).collect()
    ids = [r["vec_id"] for r in top]
    assert 7 in ids


def test_adc_recall_and_rerank(emb, idx, qvec):
    exact = {r["vec_id"] for r in
             knn(emb, qvec, k=10, metric="euclidean").collect()}
    adc = {r["vec_id"] for r in idx.search(qvec, k=10).collect()}
    rr = {r["vec_id"] for r in idx.search(qvec, k=10, rerank=4).collect()}
    # m=4 x ks=8 is a very coarse code (32 bits/vector): ADC alone is a
    # shortlist generator; with rerank the true ranking reasserts
    assert len(adc & exact) >= 2
    assert len(rr & exact) >= len(adc & exact)
    # reranked distances are TRUE euclidean: monotone + match exact knn
    rr_rows = idx.search(qvec, k=3, rerank=10).collect()
    ds = [r["distance"] for r in rr_rows]
    assert ds == sorted(ds)


def test_rerank_distances_are_exact(emb, idx, qvec):
    rr = {r["vec_id"]: r["distance"]
          for r in idx.search(qvec, k=5, rerank=20).collect()}
    ex = {r["vec_id"]: r["distance"]
          for r in knn(emb, qvec, k=500, metric="euclidean").collect()}
    for vid, d in rr.items():
        assert abs(d - ex[vid]) < 1e-6


def test_save_load_roundtrip(spark, idx, qvec, tmp_path):
    path = str(tmp_path / "pq")
    idx.save(path)
    idx2 = PqIndex.load(spark, path)
    a = [(r["vec_id"], round(r["distance"], 6))
         for r in idx.search(qvec, k=5).collect()]
    b = [(r["vec_id"], round(r["distance"], 6))
         for r in idx2.search(qvec, k=5).collect()]
    assert a == b


def test_save_drop_vectors_is_compact(spark, idx, qvec, tmp_path):
    path = str(tmp_path / "pq_small")
    idx.save(path, drop_vectors=True)
    idx2 = PqIndex.load(spark, path)
    assert idx.vec_col not in idx2.table.columns
    # codes-only search still works (ADC needs no raw vectors)
    assert idx2.search(qvec, k=5).count() == 5
    with pytest.raises(Exception):
        idx2.search(qvec, k=5, rerank=2).collect()  # no vectors to rerank


def test_pq_maintenance_add_delete(spark, emb, idx, qvec):
    n0 = idx.size()
    clone = emb.filter(F.col("vec_id") == 7) \
        .withColumn("vec_id", F.lit(900007).cast("bigint"))
    idx2 = idx.add(clone)
    assert idx2.size() == n0 + 1
    hits = {r["vec_id"] for r in idx2.search(qvec, k=5).collect()}
    assert 900007 in hits  # identical vector -> identical code -> same ADC
    idx3 = idx2.delete([7, 900007])
    hits3 = {r["vec_id"] for r in idx3.search(qvec, k=5).collect()}
    assert hits3.isdisjoint({7, 900007})


def test_ip_adc_recall_and_rerank_exact(emb, idx, qvec):
    # inner-product ADC (faiss METRIC_INNER_PRODUCT): ranking must
    # broadly agree with the exact dotproduct tier, and rerank must
    # return EXACT dotproduct distances
    exact = {r["vec_id"] for r in
             knn(emb, qvec, k=10, metric="dotproduct",
                 tie_col="vec_id").collect()}
    adc = {r["vec_id"] for r in
           idx.search(qvec, k=10, metric="dotproduct").collect()}
    # dot-product ranking is norm-dominated and ks=8 deterministic
    # codebooks quantize coarsely, so the compressed-domain floor is
    # low (measured 2-4/10 here); rerank below is the accuracy path
    assert len(exact & adc) >= 2
    rer = idx.search(qvec, k=5, metric="dotproduct", rerank=4).collect()
    want = {r["vec_id"]: r["distance"] for r in
            knn(emb, qvec, k=50, metric="dotproduct",
                tie_col="vec_id").collect()}
    for r in rer:
        if r["vec_id"] in want:
            assert r["distance"] == pytest.approx(want[r["vec_id"]],
                                                  rel=1e-9)


def test_ip_lut_matches_numpy(idx, qvec):
    import numpy as np
    lut = idx.codec.lut(qvec, metric="dotproduct")
    q = np.asarray(list(qvec)).reshape(idx.codec.m, idx.codec.dsub)
    want = (idx.codec.codebooks * q[:, None, :]).sum(axis=2)
    assert np.allclose(lut, want)
    with pytest.raises(ValueError):
        idx.codec.lut(qvec, metric="manhattan")


def test_ivfpq_ip_search_and_residual_rejection(spark, emb, qvec):
    from toy_vector_db_spark.operators.pq import IvfPqIndex
    det = IvfPqIndex.build_deterministic(emb, n_centroids=4, m=4, ks=8)
    # IP probe + IP ADC + exact IP rerank: ranking must broadly agree
    # with the exact dotproduct tier
    exact = {r["vec_id"] for r in
             knn(emb, qvec, k=10, metric="dotproduct",
                 tie_col="vec_id").collect()}
    got = {r["vec_id"] for r in
           det.search(qvec, k=10, metric="dotproduct", nprobe=3,
                      rerank=4).collect()}
    assert len(exact & got) >= 3
    # residual codes have no IP decomposition: must refuse, not guess
    res = IvfPqIndex.build_residual(emb, n_centroids=4, m=4, ks=8)
    with pytest.raises(ValueError):
        res.search(qvec, k=5, metric="dotproduct").collect()


def test_codec_dim_mismatch_errors(idx):
    with pytest.raises(ValueError, match="dim"):
        idx.codec.lut([0.0] * 3)


def test_fit_requires_divisible_dim(emb):
    with pytest.raises(ValueError, match="divisible"):
        PqCodec.fit_deterministic(emb, m=7, ks=4)


# ---------------------------------------------------------------------------
# IVF-PQ composition (coarse pruning + compressed scoring)
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def ivfpq(emb):
    from toy_vector_db_spark.operators.pq import IvfPqIndex
    return IvfPqIndex.build_deterministic(emb, n_centroids=8, m=4, ks=8)


def test_ivfpq_prunes_to_probed_clusters(ivfpq, qvec):
    cands = ivfpq.candidates(qvec, nprobe=2)
    assert cands.select("__cluster").distinct().count() <= 2
    full = ivfpq.table.count()
    assert cands.count() < full


def test_ivfpq_search_recall(emb, ivfpq, qvec):
    exact = {r["vec_id"] for r in
             knn(emb, qvec, k=10, metric="euclidean").collect()}
    # full probe (all clusters) + heavy rerank must converge on exact
    rr = {r["vec_id"] for r in
          ivfpq.search(qvec, k=10, nprobe=8, rerank=20).collect()}
    assert len(rr & exact) >= 8
    # pruned compressed-domain search still finds the self-match
    hits = [r["vec_id"] for r in ivfpq.search(qvec, k=10, nprobe=3).collect()]
    assert 7 in hits


def test_ivfpq_matches_pq_at_full_probe(emb, idx, ivfpq, qvec):
    # with every cluster probed, IVF-PQ degenerates to plain PQ-ADC
    a = [(r["vec_id"], round(r["distance"], 6))
         for r in ivfpq.search(qvec, k=10, nprobe=8).collect()]
    b = [(r["vec_id"], round(r["distance"], 6))
         for r in idx.search(qvec, k=10).collect()]
    assert a == b


def test_ivfpq_save_load_partition_pruning(spark, ivfpq, qvec, tmp_path):
    from toy_vector_db_spark.operators.pq import IvfPqIndex
    path = str(tmp_path / "ivfpq")
    ivfpq.save(path)
    idx2 = IvfPqIndex.load(spark, path)
    a = [r["vec_id"] for r in ivfpq.search(qvec, k=5, nprobe=3).collect()]
    b = [r["vec_id"] for r in idx2.search(qvec, k=5, nprobe=3).collect()]
    assert a == b
    # cluster filter on the partitioned table must prune at the source
    plan = idx2.candidates(qvec, nprobe=2)._jdf.queryExecution() \
        .executedPlan().toString()
    assert "PartitionFilters: [" in plan and "__cluster" in plan


def test_ivfpq_maintenance(spark, emb, ivfpq, qvec):
    clone = emb.filter(F.col("vec_id") == 7) \
        .withColumn("vec_id", F.lit(910007).cast("bigint"))
    idx2 = ivfpq.add(clone)
    hits = {r["vec_id"] for r in idx2.search(qvec, k=5, nprobe=3).collect()}
    assert 910007 in hits  # same vector -> same cluster + code
    idx3 = idx2.delete([910007])
    assert 910007 not in {r["vec_id"]
                          for r in idx3.search(qvec, k=5, nprobe=3).collect()}


# ---------------------------------------------------------------------------
# Compressed-domain batch join (knn_join_ivfpq)
# ---------------------------------------------------------------------------


def _batch_queries(emb, ids):
    return emb.filter(F.col("vec_id").isin(*ids)).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("query_vec"))


def test_join_ivfpq_matches_single_query_search(emb, ivfpq):
    # the batch join must reproduce the single-query ADC search
    # per query, distances included
    from toy_vector_db_spark.operators.pq import knn_join_ivfpq
    queries = _batch_queries(emb, [7, 11])
    joined = knn_join_ivfpq(queries, ivfpq, k=5, nprobe=3).collect()
    for qid in (7, 11):
        qvec = lookup_vector(emb, "vec_id", qid)
        single = [(r["vec_id"], round(r["distance"], 6))
                  for r in ivfpq.search(qvec, k=5, nprobe=3).collect()]
        batch = sorted(((r["vec_id"], round(r["distance"], 6))
                        for r in joined if r["query_id"] == qid),
                       key=lambda t: (t[1], t[0]))
        assert batch == single


def test_join_ivfpq_residual_mode_matches_single(emb):
    # residual mode: per-(query, cluster) LUTs via the equi-join must
    # equal the single-query nprobe-way CASE scoring
    from toy_vector_db_spark.operators.pq import IvfPqIndex, knn_join_ivfpq
    idx = IvfPqIndex.build_residual(emb, n_centroids=8, m=4, ks=8)
    queries = _batch_queries(emb, [7, 11])
    joined = knn_join_ivfpq(queries, idx, k=5, nprobe=3).collect()
    for qid in (7, 11):
        qvec = lookup_vector(emb, "vec_id", qid)
        single = [(r["vec_id"], round(r["distance"], 6))
                  for r in idx.search(qvec, k=5, nprobe=3).collect()]
        batch = sorted(((r["vec_id"], round(r["distance"], 6))
                        for r in joined if r["query_id"] == qid),
                       key=lambda t: (t[1], t[0]))
        assert batch == single


def test_join_ivfpq_rerank_distances_are_exact(emb, ivfpq):
    # reranked distances must equal true euclidean distances
    from toy_vector_db_spark.functions.distance import distance
    from toy_vector_db_spark.operators.pq import knn_join_ivfpq
    queries = _batch_queries(emb, [7])
    res = knn_join_ivfpq(queries, ivfpq, k=5, nprobe=8, rerank=4).collect()
    qvec = lookup_vector(emb, "vec_id", 7)
    truth = {r["vec_id"]: r["distance"] for r in emb.withColumn(
        "distance", distance("euclidean", F.col("embedding"),
                             F.lit(qvec).cast("array<double>"))).collect()}
    assert len(res) == 5
    for r in res:
        assert abs(r["distance"] - truth[r["vec_id"]]) < 1e-9


def test_join_ivfpq_validates_params(emb, ivfpq):
    from toy_vector_db_spark.operators.pq import knn_join_ivfpq
    queries = _batch_queries(emb, [7])
    with pytest.raises(ValueError):
        knn_join_ivfpq(queries, ivfpq, k=0)
    with pytest.raises(ValueError):
        knn_join_ivfpq(queries, ivfpq, nprobe=0)


# ---------------------------------------------------------------------------
# OPQ: learned-rotation PQ (Ge et al., CVPR 2013)
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def aniso(spark):
    """Anisotropic correlated corpus — the regime OPQ exists for:
    variance concentrated in a few directions that CROSS the fixed
    subspace boundaries, so identity-rotation PQ quantizes badly."""
    import numpy as np
    rng = np.random.default_rng(7)
    dim, n = 16, 600
    # low-rank mixing: 3 strong latent factors spread across all dims
    A = rng.normal(size=(3, dim)) * np.array([[10.0], [5.0], [2.0]])
    X = rng.normal(size=(n, 3)) @ A + 0.05 * rng.normal(size=(n, dim))
    rows = [(int(i), [float(x) for x in X[i]]) for i in range(n)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    return df.cache(), X


def test_opq_rotation_orthonormal(aniso):
    import numpy as np

    from toy_vector_db_spark.operators.pq import OpqCodec
    df, _ = aniso
    codec = OpqCodec.fit(df, m=4, ks=8, opq_iters=4, seed=1)
    R = codec.rotation
    assert np.allclose(R @ R.T, np.eye(R.shape[0]), atol=1e-8)


def test_opq_reduces_quantization_error(aniso):
    """The alternation's whole point: mean ||xR - decode(encode(xR))||^2
    strictly below plain KMeans-PQ (identity rotation) on data whose
    correlation crosses subspace boundaries."""
    import numpy as np

    from toy_vector_db_spark.operators.pq import OpqCodec, PqCodec, _reconstruct
    df, X = aniso
    opq = OpqCodec.fit(df, m=4, ks=8, opq_iters=6, seed=1)
    pq = PqCodec.fit_kmeans(df, m=4, ks=8, seed=1)
    pq_err = float(((X - _reconstruct(X, pq.codebooks)) ** 2).sum(1).mean())
    opq_err = opq.quantization_error(X)
    assert opq_err < pq_err * 0.9  # >=10% better, not a tie-break fluke


def test_opq_index_search_and_roundtrip(spark, aniso, tmp_path):
    """End-to-end OPQ index: Arrow encode produces one code array per
    row; ADC top-k beats identity-PQ recall on the anisotropic corpus;
    save/load preserves the rotation (results identical)."""
    from toy_vector_db_spark.operators.knn import knn
    from toy_vector_db_spark.operators.pq import PqIndex
    df, _ = aniso
    qvec = lookup_vector(df, "vec_id", 3)
    truth = {r["vec_id"] for r in
             knn(df, qvec, k=10, tie_col="vec_id").collect()}

    opq_idx = PqIndex.build_opq(df, m=4, ks=8, opq_iters=6, seed=1)
    got = opq_idx.search(qvec, k=10).collect()
    assert len(got) == 10
    opq_recall = len({r["vec_id"] for r in got} & truth) / 10

    from toy_vector_db_spark.operators.pq import PqCodec
    pq_codec = PqCodec.fit_kmeans(df, m=4, ks=8, seed=1)
    pq_idx = PqIndex(pq_codec, pq_codec.encode(df), "vec_id", "embedding")
    pq_recall = len({r["vec_id"] for r in
                     pq_idx.search(qvec, k=10).collect()} & truth) / 10
    assert opq_recall >= pq_recall

    path = str(tmp_path / "opq_idx")
    opq_idx.save(path)
    loaded = PqIndex.load(spark, path)
    from toy_vector_db_spark.operators.pq import OpqCodec
    assert isinstance(loaded.codec, OpqCodec)
    reloaded = loaded.search(qvec, k=10).collect()
    assert [(r["vec_id"], round(r["distance"], 6)) for r in reloaded] == \
        [(r["vec_id"], round(r["distance"], 6)) for r in got]
