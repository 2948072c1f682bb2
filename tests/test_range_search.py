from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from toy_vector_db_spark.operators.ann import IvfIndex
from toy_vector_db_spark.operators.knn import range_search

# two tight clusters far apart + one outlier
VECS = [
    (0, [0.0, 0.0]), (1, [0.1, 0.0]), (2, [0.0, 0.1]),
    (3, [10.0, 10.0]), (4, [10.1, 10.0]), (5, [10.0, 10.1]),
    (6, [100.0, 100.0]),
]


@pytest.fixture(scope="module")
def vecs(spark):
    return spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in VECS],
        "vec_id bigint, embedding array<float>")


def test_exact_radius_membership(vecs):
    got = {r["vec_id"]
           for r in range_search(vecs, [0.0, 0.0], 0.15).collect()}
    assert got == {0, 1, 2}
    # radius 0 matches only the exact point
    got0 = {r["vec_id"] for r in range_search(vecs, [0.0, 0.0], 0.0).collect()}
    assert got0 == {0}


def test_exclude_and_limit(vecs):
    rows = range_search(vecs, [0.0, 0.0], 0.15, exclude_id=0,
                        id_col="vec_id", limit=1, tie_col="vec_id").collect()
    assert [r["vec_id"] for r in rows] == [1]


def test_radius_validation(vecs):
    with pytest.raises(ValueError):
        range_search(vecs, [0.0, 0.0], -1.0)
    with pytest.raises(ValueError):
        IvfIndex.build_deterministic(vecs).range_search([0.0, 0.0], -1.0)


def test_pruned_equals_exact(vecs):
    idx = IvfIndex.build_deterministic(vecs, n_centroids=3)
    for q, r in ([0.0, 0.0], 0.15), ([10.0, 10.0], 0.2), ([50.0, 50.0], 1.0):
        pruned = {x["vec_id"] for x in idx.range_search(q, r).collect()}
        exact = {x["vec_id"] for x in range_search(vecs, q, r).collect()}
        assert pruned == exact, (q, r)


def test_pruning_skips_far_clusters(vecs):
    import numpy as np

    idx = IvfIndex.build_deterministic(vecs, n_centroids=3)
    qd = np.linalg.norm(idx.centroids - np.array([0.0, 0.0]), axis=1)
    keep = np.nonzero(qd <= 0.15 + idx.cluster_radii())[0]
    # a query inside one tight cluster must not scan them all
    assert 0 < len(keep) < len(idx.centroids)


def test_add_invalidates_radii_cache(vecs, spark):
    idx = IvfIndex.build_deterministic(vecs, n_centroids=3)
    r0 = idx.cluster_radii().copy()
    # a new far-flung member of some cluster grows its covering radius
    delta = spark.createDataFrame(
        [(7, [0.0, 5.0])], "vec_id bigint, embedding array<float>")
    idx2 = idx.add(delta)
    r1 = idx2.cluster_radii()
    assert r1.max() > r0.max()
    # and the grown-radius index still finds the new point exactly
    got = {r["vec_id"] for r in idx2.range_search([0.0, 4.9], 0.2).collect()}
    assert got == {7}


def test_cluster_stats_report(vecs):
    idx = IvfIndex.build_deterministic(
        vecs.withColumn("label", (F.col("vec_id") % 2).cast("int")),
        n_centroids=3)
    rows = idx.cluster_stats(label_col="label").collect()
    assert sum(r["n_members"] for r in rows) == len(VECS)
    for r in rows:
        assert r["max_dist"] >= r["avg_dist"] >= 0.0
        assert 0 < r["top_label_n"] <= r["n_members"]
    # without labels: no label columns in the schema
    plain = idx.cluster_stats()
    assert set(plain.columns) == {"cluster_id", "n_members",
                                  "avg_dist", "max_dist"}
