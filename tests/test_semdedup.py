from __future__ import annotations

import pytest
from pyspark.sql import functions as F
from pyspark.sql.types import (ArrayType, FloatType, IntegerType, LongType,
                               StructField, StructType)

from toy_vector_db_spark.operators.semdedup import (
    semantic_clusters, semantic_dedup, semantic_dup_pairs,
)

# Two tight semantic groups far apart, plus two loners. Vectors are
# 4-d so the deterministic-IVF assignment is easy to eyeball.
VECS = [
    (1, [1.0, 0.0, 0.0, 0.0], 0),
    (2, [0.999, 0.01, 0.0, 0.0], 0),     # near-dup of 1
    (3, [0.998, 0.0, 0.02, 0.0], 0),     # near-dup of 1 and 2
    (10, [0.0, 1.0, 0.0, 0.0], 1),
    (11, [0.0, 0.999, 0.02, 0.0], 1),    # near-dup of 10
    (20, [0.0, 0.0, 0.0, 1.0], 2),       # loner
    (21, [0.5, 0.5, 0.5, 0.5], 3),       # loner
]

SCHEMA = StructType([
    StructField("vec_id", LongType()),
    StructField("embedding", ArrayType(FloatType())),
    StructField("label", IntegerType()),
])


@pytest.fixture(scope="module")
def vecs(spark):
    return spark.createDataFrame(VECS, SCHEMA)


def test_clusters_cover_all_rows(vecs):
    clustered = semantic_clusters(vecs, n_clusters=4)
    assert clustered.count() == len(VECS)
    assert "__cluster" in clustered.columns
    n_clusters = clustered.select("__cluster").distinct().count()
    assert 1 <= n_clusters <= 4


def test_pairs_are_within_cluster_and_thresholded(vecs):
    clustered = semantic_clusters(vecs, n_clusters=4)
    assign = {r["vec_id"]: r["__cluster"] for r in clustered.collect()}
    pairs = semantic_dup_pairs(vecs, n_clusters=4, threshold=0.99).collect()
    assert pairs, "tight groups must produce at least one pair"
    for r in pairs:
        assert r["id_a"] < r["id_b"]
        assert r["cosine_sim"] >= 0.99
        assert assign[r["id_a"]] == assign[r["id_b"]]


def test_dedup_keeps_one_per_group(vecs):
    kept = sorted(r["vec_id"]
                  for r in semantic_dedup(vecs, n_clusters=4,
                                          threshold=0.99).collect())
    # loners always survive; each near-dup group keeps its smallest id
    assert 20 in kept and 21 in kept
    assert 1 in kept and 10 in kept
    # transitive collapse: IF 1,2,3 share a cluster they collapse to
    # {1}; they can only survive together by landing in different
    # clusters (SemDeDup's documented cross-cluster blindness)
    assign = {r["vec_id"]: r["__cluster"]
              for r in semantic_clusters(vecs, n_clusters=4).collect()}
    for a, b in [(1, 2), (1, 3), (2, 3), (10, 11)]:
        if assign[a] == assign[b]:
            assert b not in kept or a not in kept


def test_dedup_no_pairs_is_identity(vecs):
    # threshold above any non-identical similarity: nothing dropped
    kept = semantic_dedup(vecs, n_clusters=4, threshold=1.0)
    assert kept.count() == len(VECS)


def test_explicit_n_clusters_keeps_the_block_guard(vecs):
    """ADVICE r7: allow_quadratic=None resolves False when n_clusters
    is EXPLICIT — a hand-picked small cluster count on a big corpus is
    the latent-N^2 shape the guard exists for; the ivf_nlist rationale
    only covers the auto-sized key. max_block_rows shrinks the cap so
    the 3-row cluster trips it in-test."""
    with pytest.raises(ValueError, match="allow_quadratic"):
        semantic_dup_pairs(vecs, n_clusters=1, threshold=0.99,
                           max_block_rows=2).collect()
    # explicit override still wins
    got = semantic_dup_pairs(vecs, n_clusters=1, threshold=0.99,
                             max_block_rows=2, allow_quadratic=True)
    assert got.count() >= 1
    # and the auto-sized learned key skips the guard by default
    auto = semantic_dup_pairs(vecs, threshold=0.99, max_block_rows=2)
    assert auto.count() >= 0       # no raise — guard skipped


def test_kmeans_path_runs(vecs):
    # the Lloyd-trained (non-oracle) path: shape only
    out = semantic_dedup(vecs, n_clusters=2, threshold=0.99,
                         deterministic=False)
    assert 0 < out.count() <= len(VECS)
    assert out.columns == ["vec_id", "embedding", "label"]
