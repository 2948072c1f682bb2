"""knn on the canonical 5-vector fixture
(/root/reference/pkg/sql/sql_test.go:218-235, FIXTURES.md F1)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from toy_vector_db_spark.operators.knn import knn, knn_join, lookup_vector
from toy_vector_db_spark.schema import five_vectors


def test_nearest_to_top1_is_vec1(spark):
    df = five_vectors(spark)
    res = knn(df, [1.0, 0.0, 0.0], k=3, metric="euclidean",
              vec_col="embedding").collect()
    assert len(res) == 3
    assert res[0]["id"] == "vec1"
    assert res[0]["distance"] == 0.0


def test_self_exclusion(spark):
    df = five_vectors(spark)
    qvec = lookup_vector(df.withColumnRenamed("id", "vid"), "vid", "vec1")
    res = knn(df, qvec, k=3, metric="euclidean",
              exclude_id="vec1", id_col="id").collect()
    assert all(r["id"] != "vec1" for r in res)
    assert res[0]["id"] == "vec4"  # [1,1,0] is nearest to [1,0,0] after self


def test_default_limit_10(spark):
    # default LIMIT 10 (executor.go:306-309); fixture smaller than 10
    df = five_vectors(spark)
    assert knn(df, [1.0, 0.0, 0.0]).count() == 5


def test_k_clamp_and_error(spark):
    df = five_vectors(spark)
    assert knn(df, [1.0, 0.0, 0.0], k=100).count() == 5  # clamp (flat.go:113)
    with pytest.raises(ValueError):
        knn(df, [1.0, 0.0, 0.0], k=0)


def test_lookup_missing_raises(spark):
    with pytest.raises(KeyError):
        lookup_vector(five_vectors(spark), "id", "nope")


def test_metric_changes_ordering(spark):
    df = five_vectors(spark)
    # cosine: vec4=[1,1,0] at 45deg; euclidean: vec4 at distance 1
    eu = knn(df, [1.0, 0.0, 0.0], k=5, metric="euclidean").collect()
    co = knn(df, [1.0, 0.0, 0.0], k=5, metric="cosine").collect()
    assert eu[0]["id"] == co[0]["id"] == "vec1"
    assert [r["id"] for r in eu] != [] and len(co) == 5


def test_knn_join_matches_single_knn(spark):
    df = five_vectors(spark)
    queries = df.select(F.col("id").alias("query_id"),
                        F.col("embedding").alias("query_vec"))
    joined = knn_join(queries, df.select(F.col("id").alias("vec_id"),
                                         "embedding"),
                      k=2, metric="euclidean")
    rows = {(r["query_id"], r["vec_id"]) for r in joined.collect()}
    assert len(rows) == 10  # 5 queries x k=2
    # each row's nearest neighbor (distance 0) is itself
    for qid in ("vec1", "vec2", "vec3", "vec4", "vec5"):
        assert (qid, qid) in rows


def test_knn_join_two_phase_equals_window(spark):
    df = five_vectors(spark)
    queries = df.select(F.col("id").alias("query_id"),
                        F.col("embedding").alias("query_vec"))
    corpus = df.select(F.col("id").alias("vec_id"), "embedding")
    a = knn_join(queries, corpus, k=3, two_phase=True)
    b = knn_join(queries, corpus, k=3, two_phase=False)
    norm = lambda d: sorted((r["query_id"], r["vec_id"], round(r["distance"], 9))
                            for r in d.collect())
    assert norm(a) == norm(b)


def test_knn_join_ivf_full_probe_equals_exact(spark):
    # probing every cluster makes the IVF join exhaustive, so it must
    # reproduce the exact knn_join answer bit-for-bit
    from toy_vector_db_spark.operators.ann import IvfIndex
    from toy_vector_db_spark.operators.knn import knn_join_ivf
    df = five_vectors(spark)
    corpus = df.select(F.col("id").alias("vec_id"), "embedding")
    queries = df.select(F.col("id").alias("query_id"),
                        F.col("embedding").alias("query_vec"))
    idx = IvfIndex.build_deterministic(corpus, n_centroids=3,
                                       id_col="vec_id")
    exact = knn_join(queries, corpus, k=2, metric="euclidean")
    approx = knn_join_ivf(queries, idx, k=2, nprobe=3, metric="euclidean")
    norm = lambda d: sorted((r["query_id"], r["vec_id"], round(r["distance"], 9))
                            for r in d.collect())
    assert norm(approx) == norm(exact)


def test_knn_join_ivf_respects_tombstones(spark):
    from toy_vector_db_spark.operators.ann import IvfIndex
    from toy_vector_db_spark.operators.knn import knn_join_ivf
    df = five_vectors(spark)
    corpus = df.select(F.col("id").alias("vec_id"), "embedding")
    queries = df.limit(2).select(F.col("id").alias("query_id"),
                                 F.col("embedding").alias("query_vec"))
    idx = IvfIndex.build_deterministic(corpus, n_centroids=2,
                                       id_col="vec_id").delete(["vec1"])
    res = knn_join_ivf(queries, idx, k=5, nprobe=2).collect()
    assert res and all(r["vec_id"] != "vec1" for r in res)


def test_knn_join_ivf_validates_params(spark):
    from toy_vector_db_spark.operators.ann import IvfIndex
    from toy_vector_db_spark.operators.knn import knn_join_ivf
    df = five_vectors(spark)
    corpus = df.select(F.col("id").alias("vec_id"), "embedding")
    queries = df.limit(1).select(F.col("id").alias("query_id"),
                                 F.col("embedding").alias("query_vec"))
    idx = IvfIndex.build_deterministic(corpus, n_centroids=2,
                                       id_col="vec_id")
    with pytest.raises(ValueError):
        knn_join_ivf(queries, idx, k=0)
    with pytest.raises(ValueError):
        knn_join_ivf(queries, idx, nprobe=0)


def test_dim_mismatch_yields_null_distance_sorted_last(spark):
    """Reference errors on dimension mismatch (distance.go:56-58); the
    Spark engine scores mismatched rows as NULL distance, which sorts
    after every real match in ascending knn order — a documented
    divergence (mismatches are excluded rather than fatal)."""
    from toy_vector_db_spark.operators.knn import knn

    df = spark.createDataFrame(
        [("a", [1.0, 0.0]), ("b", [0.0, 1.0]), ("bad", [1.0, 0.0, 0.0])],
        "id STRING, embedding ARRAY<DOUBLE>")
    out = knn(df, [1.0, 0.0], k=3, metric="euclidean").collect()
    assert [r["id"] for r in out[:2]] == ["a", "b"]
    assert out[2]["id"] == "bad" and out[2]["distance"] is None


def test_knn_arrow_matches_hof_tier(spark):
    """The Arrow/NumPy scoring tier returns the same top-k as the
    pure-Column tier on every metric (values to 1e-9, ids exactly)."""
    from toy_vector_db_spark.operators.knn import knn, knn_arrow
    from toy_vector_db_spark.workload import _t

    e = _t(spark, "/root/testdata/sf0.001", "embeddings")
    dim = len(e.select("embedding").first()[0])
    q = [0.1] * dim
    for metric in ("euclidean", "cosine", "dotproduct", "manhattan"):
        a = knn(e, q, k=5, metric=metric).collect()
        b = knn_arrow(e, q, k=5, metric=metric).collect()
        assert [r["vec_id"] for r in a] == [r["vec_id"] for r in b], metric
        for ra, rb in zip(a, b):
            assert ra["distance"] == pytest.approx(rb["distance"], abs=1e-9)


def test_knn_auto_tier_selection(spark):
    """knn_auto routes by query dimension: >= ARROW_TIER_MIN_DIM goes
    to the Arrow/BLAS tier (plan contains a MapInPandas/ArrowEvalPython
    node), below stays pure-Column (no Python node in the plan). Both
    tiers are oracle-checked to agree; this pins the dispatch itself."""
    from toy_vector_db_spark.operators.knn import ARROW_TIER_MIN_DIM, knn_auto
    from toy_vector_db_spark.workload import _t

    e = _t(spark, "/root/testdata/sf0.001", "embeddings")
    dim = len(e.select("embedding").first()[0])
    assert dim >= ARROW_TIER_MIN_DIM  # testdata is dim 64

    wide = knn_auto(e, [0.1] * dim, k=3, id_cols=["vec_id"])
    wide_plan = wide._jdf.queryExecution().executedPlan().toString()
    assert "MapInPandas" in wide_plan or "ArrowEval" in wide_plan

    narrow_df = spark.createDataFrame(
        [("a", [1.0, 0.0]), ("b", [0.0, 1.0])],
        "vec_id STRING, embedding ARRAY<DOUBLE>")
    narrow = knn_auto(narrow_df, [1.0, 0.0], k=1)
    narrow_plan = narrow._jdf.queryExecution().executedPlan().toString()
    assert "MapInPandas" not in narrow_plan and "ArrowEval" not in narrow_plan
    assert narrow.first()["vec_id"] == "a"

    # knob override: force the Column tier even for wide vectors
    forced = knn_auto(e, [0.1] * dim, k=3, arrow_min_dim=dim + 1)
    forced_plan = forced._jdf.queryExecution().executedPlan().toString()
    assert "MapInPandas" not in forced_plan


def test_knn_join_ivf_shuffle_path_equals_broadcast(spark):
    # broadcast_queries=False (the both-sides-large tier) must return
    # the identical answer via a shuffle equi-join on the cluster id
    from toy_vector_db_spark.operators.ann import IvfIndex
    from toy_vector_db_spark.operators.knn import knn_join_ivf
    df = five_vectors(spark)
    corpus = df.select(F.col("id").alias("vec_id"), "embedding")
    queries = df.select(F.col("id").alias("query_id"),
                        F.col("embedding").alias("query_vec"))
    idx = IvfIndex.build_deterministic(corpus, n_centroids=3,
                                       id_col="vec_id")
    a = knn_join_ivf(queries, idx, k=2, nprobe=2)
    b = knn_join_ivf(queries, idx, k=2, nprobe=2, broadcast_queries=False)
    norm = lambda d: sorted((r["query_id"], r["vec_id"], round(r["distance"], 9))
                            for r in d.collect())
    assert norm(a) == norm(b)
    # and it must not plan as a broadcast of the query side
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        plan = knn_join_ivf(queries, idx, k=2, nprobe=2,
                            broadcast_queries=False)._jdf \
            .queryExecution().executedPlan().toString()
        assert "BroadcastHashJoin" not in plan
        assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


def test_knn_join_ivf_arrow_matches_column_tier(spark):
    """The BLAS cogroup tier (knn_join_ivf_arrow) must return the
    identical all-pairs answer as the Column-expression shuffle path —
    same probes, same candidates, same (dist, id) tie order — across
    every metric."""
    from toy_vector_db_spark.operators.ann import IvfIndex
    from toy_vector_db_spark.operators.knn import (knn_join_ivf,
                                                   knn_join_ivf_arrow)
    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    idx = IvfIndex.build_deterministic(emb, n_centroids=4)
    queries = emb.select(F.col("vec_id").alias("query_id"),
                         F.col("embedding").alias("query_vec"))
    norm = lambda d: sorted((r["query_id"], r["vec_id"],
                             round(r["distance"], 6)) for r in d.collect())
    for metric in ("euclidean", "cosine", "dotproduct", "manhattan"):
        a = knn_join_ivf(queries, idx, k=3, nprobe=2, metric=metric,
                         broadcast_queries=False)
        b = knn_join_ivf_arrow(queries, idx, k=3, nprobe=2, metric=metric)
        assert norm(a) == norm(b), metric
    with pytest.raises(ValueError):
        knn_join_ivf_arrow(queries, idx, k=0)
    with pytest.raises(ValueError):
        knn_join_ivf_arrow(queries, idx, nprobe=0)


def test_knn_join_arrow_matches_column_tier(spark):
    """The exact Arrow batch join must return the identical answer as
    the Column-expression knn_join — same top-k, same (dist, id) tie
    order — across every metric, plus the mismatched-dim exclusion."""
    from toy_vector_db_spark.operators.knn import knn_join_arrow
    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    queries = emb.filter(F.col("vec_id") < 15).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("query_vec"))
    norm = lambda d: sorted((r["query_id"], r["vec_id"],
                             round(r["distance"], 6)) for r in d.collect())
    for metric in ("euclidean", "cosine", "dotproduct", "manhattan"):
        a = knn_join(queries, emb, k=5, metric=metric)
        b = knn_join_arrow(queries, emb, k=5, metric=metric)
        assert norm(a) == norm(b), metric
    # corpus rows of a different dimension are excluded, not scored
    bad = spark.createDataFrame([(999999, [1.0, 2.0])],
                                "vec_id long, embedding array<float>")
    c = knn_join_arrow(queries,
                       emb.unionByName(bad, allowMissingColumns=True), k=5)
    assert 999999 not in {r["vec_id"] for r in c.collect()}
    with pytest.raises(ValueError, match="share one dimension"):
        knn_join_arrow(queries.unionByName(
            spark.createDataFrame([(7777, [0.5, 0.5])],
                                  "query_id long, query_vec array<float>")),
            emb, k=5)
    with pytest.raises(ValueError):
        knn_join_arrow(queries, emb, k=0)


def test_knn_join_arrow_boundary_ties_in_one_batch(spark):
    """Candidates tied at the k-th distance WITHIN one Arrow batch must
    resolve by the (distance, corpus id) order, not by whichever subset
    argpartition happened to keep: dists [1,5,5,5] with cids stored in
    order [40,30,10,20] and k=2 must keep cid 10, the smallest tie.
    Exact ties are common in dedup-centric corpora (duplicate vectors)."""
    from toy_vector_db_spark.operators.knn import knn_join_arrow
    corpus = spark.createDataFrame(
        [(40, [1.0]), (30, [5.0]), (10, [-5.0]), (20, [5.0])],
        "vec_id long, embedding array<double>").coalesce(1)
    queries = spark.createDataFrame([(0, [0.0])],
                                    "query_id long, query_vec array<double>")
    for metric in ("euclidean", "manhattan"):
        got = [(r["vec_id"], r["distance"])
               for r in knn_join_arrow(queries, corpus, k=2, metric=metric)
               .orderBy("distance", "vec_id").collect()]
        assert got == [(40, 1.0), (10, 5.0)], metric
        col = [(r["vec_id"], r["distance"])
               for r in knn_join(queries, corpus, k=2, metric=metric)
               .orderBy("distance", "vec_id").collect()]
        assert got == col, metric


def test_knn_per_group_quota_and_order(spark):
    from toy_vector_db_spark.operators.knn import knn_per_group

    df = spark.createDataFrame(
        [(1, "a", [0.0, 0.0]), (2, "a", [1.0, 0.0]), (3, "a", [2.0, 0.0]),
         (4, "b", [5.0, 0.0]), (5, "b", [6.0, 0.0])],
        "vec_id long, label string, embedding array<float>")
    rows = knn_per_group(df, [0.0, 0.0], "label", k=2,
                         tie_col="vec_id").collect()
    by = {}
    for r in rows:
        by.setdefault(r["label"], []).append(r["vec_id"])
    assert sorted(by["a"]) == [1, 2]   # 2 closest of 3
    assert sorted(by["b"]) == [4, 5]   # group smaller than k kept whole
    import pytest as _pytest
    with _pytest.raises(ValueError):
        knn_per_group(df, [0.0, 0.0], "label", k=0)


def test_knn_per_group_null_distance_excluded(spark):
    from toy_vector_db_spark.operators.knn import knn_per_group

    df = spark.createDataFrame(
        [(1, "a", [0.0, 0.0]), (2, "a", None)],
        "vec_id long, label string, embedding array<float>")
    rows = knn_per_group(df, [0.0, 0.0], "label", k=5).collect()
    assert [r["vec_id"] for r in rows] == [1]
