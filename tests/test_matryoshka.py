from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from toy_vector_db_spark.operators.knn import knn, lookup_vector
from toy_vector_db_spark.operators.matryoshka import matryoshka_knn


@pytest.fixture(scope="module")
def emb(spark):
    from toy_vector_db_spark.workload import _t
    return _t(spark, "/root/testdata/sf0.001", "embeddings")


@pytest.fixture(scope="module")
def qvec(emb):
    return lookup_vector(emb, "vec_id", 0)


def _ids(df):
    return [r["vec_id"] for r in df.collect()]


def test_full_prefix_equals_exact(emb, qvec):
    """prefix_dim >= dim makes the coarse pass the exact ranking, so
    the result must equal plain knn for any candidates >= k."""
    dim = len(qvec)
    exact = knn(emb, qvec, k=10, exclude_id=0, id_col="vec_id",
                tie_col="vec_id")
    mrl = matryoshka_knn(emb, qvec, k=10, prefix_dim=dim, candidates=10,
                         exclude_id=0, id_col="vec_id", tie_col="vec_id")
    assert _ids(mrl) == _ids(exact)


def test_candidates_equal_corpus_is_exact(emb, qvec):
    """With the shortlist as large as the corpus the prefix pass can't
    drop a true neighbor — any prefix_dim gives the exact answer."""
    n = emb.count()
    exact = knn(emb, qvec, k=5, exclude_id=0, id_col="vec_id",
                tie_col="vec_id")
    mrl = matryoshka_knn(emb, qvec, k=5, prefix_dim=4, candidates=n,
                         exclude_id=0, id_col="vec_id", tie_col="vec_id")
    assert _ids(mrl) == _ids(exact)


def test_recall_at_reasonable_shortlist(emb, qvec):
    """A 16-of-64-dim prefix with a ~25% shortlist must recover most
    of the exact top-10. (The synthetic embeddings are RANDOM — no MRL
    training concentrates information in the prefix — so this is the
    operator's worst case; measured 10/10 at candidates=300, 5/10 at
    100.)"""
    exact = set(_ids(knn(emb, qvec, k=10, exclude_id=0, id_col="vec_id",
                         tie_col="vec_id")))
    mrl = set(_ids(matryoshka_knn(emb, qvec, k=10, prefix_dim=16,
                                  candidates=300, exclude_id=0,
                                  id_col="vec_id", tie_col="vec_id")))
    assert len(mrl & exact) >= 8


def test_distance_is_full_dim(emb, qvec):
    """Reported distances are FULL-dimension distances (the coarse
    column must not leak)."""
    exact = knn(emb, qvec, k=3, exclude_id=0, id_col="vec_id",
                tie_col="vec_id").collect()
    mrl = matryoshka_knn(emb, qvec, k=3, prefix_dim=len(qvec),
                         candidates=3, exclude_id=0, id_col="vec_id",
                         tie_col="vec_id").collect()
    for e, m in zip(exact, mrl):
        assert m["distance"] == pytest.approx(e["distance"])
    assert "__coarse_dist" not in matryoshka_knn(
        emb, qvec, k=3, prefix_dim=8, candidates=5).columns


def test_validation():
    with pytest.raises(ValueError, match="candidates"):
        matryoshka_knn(None, [0.0], k=10, candidates=5)
    with pytest.raises(ValueError, match="prefix_dim"):
        matryoshka_knn(None, [0.0], prefix_dim=0)
