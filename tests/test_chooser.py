"""Cost-based search-tier selection (operators/chooser.py): the
decision table as a pure function, plus routed end-to-end searches
whose answers must match the exact tier."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from toy_vector_db_spark.operators.chooser import (
    EXACT_MAX_ROWS, choose_search_tier, search_auto,
)

SF = "/root/testdata/sf0.001"


# -- decision table (no Spark) ------------------------------------------------

def test_small_corpus_routes_exact():
    assert choose_search_tier(10_000, 64, 10).tier == "flat-arrow"
    assert choose_search_tier(10_000, 8, 10).tier == "flat-column"


def test_exact_recall_forces_flat_even_at_scale():
    p = choose_search_tier(10**9, 64, 10, recall_target=1.0)
    assert p.tier == "flat-arrow"


def test_angular_metrics_route_to_lsh():
    p = choose_search_tier(10**8, 64, 10, metric="cosine",
                           recall_target=0.9)
    assert p.tier == "lsh"
    assert 4 <= p.params["n_planes"] <= 24
    assert p.params["multiprobe"] >= 1


def test_euclidean_routes_to_ivf_with_classic_sizing():
    n = 10**8
    p = choose_search_tier(n, 64, 10, metric="euclidean",
                           recall_target=0.9)
    assert p.tier == "ivf"
    assert p.params["n_centroids"] == int(4 * n ** 0.5)
    assert 1 <= p.params["nprobe"] <= p.params["n_centroids"]


def test_higher_recall_probes_wider():
    lo = choose_search_tier(10**8, 64, 10, recall_target=0.5)
    hi = choose_search_tier(10**8, 64, 10, recall_target=0.95)
    assert hi.params["nprobe"] > lo.params["nprobe"]


def test_memory_budget_forces_pq_with_dividing_m():
    n, dim = 10**8, 64
    p = choose_search_tier(n, dim, 10, recall_target=0.9,
                           memory_budget_bytes=n * dim)  # 1/4 of raw
    assert p.tier == "ivfpq"
    assert dim % p.params["m"] == 0


def test_budget_never_hijacks_non_euclidean_metrics():
    # the IVF-PQ route is euclidean-only: a cosine query under memory
    # pressure must NOT be routed there (it would silently return
    # euclidean answers) — it stays on the angular tier
    n, dim = 10**8, 64
    p = choose_search_tier(n, dim, 10, metric="cosine",
                           recall_target=0.9, memory_budget_bytes=n * dim)
    assert p.tier == "lsh"
    p = choose_search_tier(n, dim, 10, metric="manhattan",
                           recall_target=0.9, memory_budget_bytes=n * dim)
    assert p.tier == "ivf" and "no compressed tier" in p.reason
    # dotproduct DOES have an ADC form (faiss METRIC_INNER_PRODUCT) —
    # the compressed route carries the metric through
    p = choose_search_tier(n, dim, 10, metric="dotproduct",
                           recall_target=0.9, memory_budget_bytes=n * dim)
    assert p.tier == "ivfpq" and p.params["metric"] == "dotproduct"


def test_exact_recall_with_budget_conflict_is_flagged():
    p = choose_search_tier(10**9, 64, 10, recall_target=1.0,
                           memory_budget_bytes=1 << 30)
    assert p.tier == "flat-arrow" and "over the" in p.reason


def test_join_exact_recall_honored_even_over_pair_cap():
    from toy_vector_db_spark.operators.chooser import choose_join_tier
    # default recall (1.0) must stay exact — the caller never opted
    # into approximate answers — with the overage noted in the reason
    p = choose_join_tier(10**6, 10**7, 64, 5)
    assert p.tier == "exact-broadcast" and "NOTE" in p.reason


def test_invalid_inputs_raise():
    with pytest.raises(ValueError):
        choose_search_tier(-1, 64, 10)
    with pytest.raises(ValueError):
        choose_search_tier(100, 64, 10, recall_target=0.0)


# -- routed execution ---------------------------------------------------------

@pytest.fixture(scope="module")
def emb(spark):
    from toy_vector_db_spark.workload import _t
    return _t(spark, SF, "embeddings").cache()


def test_search_auto_exact_route_matches_knn(spark, emb):
    from toy_vector_db_spark.operators.knn import knn
    qvec = [r for r in emb.filter("vec_id = 1").select("embedding")
            .collect()][0][0]
    plan, res = search_auto(emb, qvec, k=5, tie_col="vec_id")
    assert plan.tier == "flat-arrow"
    got = [(r["vec_id"], round(r["distance"], 4)) for r in res.collect()]
    want = [(r["vec_id"], round(r["distance"], 4))
            for r in knn(emb, qvec, k=5, tie_col="vec_id").collect()]
    assert got == want


def test_search_auto_ivf_route_returns_neighbors(spark, emb):
    # force the approximate path with a tiny exact cap: the chosen tier
    # must be IVF and the query's own stored row must come back first
    qvec = [r for r in emb.filter("vec_id = 2").select("embedding")
            .collect()][0][0]
    plan, res = search_auto(emb, qvec, k=5, metric="euclidean",
                            recall_target=0.9, exact_max_rows=10)
    assert plan.tier == "ivf"
    rows = res.collect()
    assert rows and rows[0]["vec_id"] == 2 and rows[0]["distance"] == 0.0


def test_join_tier_decision_table():
    from toy_vector_db_spark.operators.chooser import choose_join_tier
    # small x small, exact recall -> exact broadcast
    assert choose_join_tier(5, 10_000, 64, 5).tier == "exact-broadcast"
    # too many pairs -> IVF prune, queries still broadcastable
    p = choose_join_tier(10_000, 10**7, 64, 5, recall_target=0.9)
    assert p.tier == "ivf-broadcast" and p.params["nprobe"] >= 1
    # corpus-sized query side -> co-partitioned BLAS cogroup
    p = choose_join_tier(10**7, 10**7, 64, 5, recall_target=0.9)
    assert p.tier == "ivf-cogroup"


def test_knn_join_auto_ivf_route_matches_ivf_join(spark, emb):
    # force the pruned route with a tiny pair cap; its answers must
    # equal knn_join_ivf on the same deterministic index
    from toy_vector_db_spark.operators.ann import IvfIndex
    from toy_vector_db_spark.operators.chooser import knn_join_auto
    from toy_vector_db_spark.operators.knn import knn_join_ivf
    from pyspark.sql import functions as FF
    queries = emb.filter("vec_id in (1, 2, 3)").select(
        FF.col("vec_id").alias("query_id"),
        FF.col("embedding").alias("query_vec"))
    plan, res = knn_join_auto(queries, emb, k=5, recall_target=0.9,
                              exact_max_pairs=10)
    assert plan.tier == "ivf-broadcast"
    idx = IvfIndex.build_deterministic(
        emb, n_centroids=min(plan.params["n_centroids"], emb.count()))
    want = knn_join_ivf(queries, idx, k=5, nprobe=plan.params["nprobe"])
    got = {(r["query_id"], r["vec_id"]) for r in res.collect()}
    exp = {(r["query_id"], r["vec_id"]) for r in want.collect()}
    assert got == exp


def test_search_auto_lsh_route_returns_neighbors(spark, emb):
    qvec = [r for r in emb.filter("vec_id = 3").select("embedding")
            .collect()][0][0]
    plan, res = search_auto(emb, qvec, k=5, metric="cosine",
                            recall_target=0.5, exact_max_rows=10)
    assert plan.tier == "lsh"
    rows = res.collect()
    assert rows and rows[0]["vec_id"] == 3
