"""connected_components / dup_clusters on hand-built graphs.

Shape tests run on BOTH tiers (the local union-find task and the
iterative min-label propagation) — the r8 auto router means small
graphs take the local tier by default, so the propagation algorithm
keeps its own explicit coverage here.
"""

from __future__ import annotations

import pytest

from toy_vector_db_spark.operators.components import (
    connected_components, dup_clusters,
)

TIERS = ["local", "propagate"]


def _df(spark, edges):
    return spark.createDataFrame(edges, "id_a BIGINT, id_b BIGINT")


@pytest.mark.parametrize("tier", TIERS)
def test_chain_and_triangle_and_pair(spark, tier):
    # chain 1-2-3-4, triangle 10-11, 11-12, 10-12, pair 20-21
    pairs = _df(spark, [(1, 2), (2, 3), (3, 4),
                        (10, 11), (11, 12), (10, 12),
                        (20, 21)])
    got = {r["node"]: r["component"]
           for r in connected_components(pairs, tier=tier).collect()}
    assert got == {1: 1, 2: 1, 3: 1, 4: 1,
                   10: 10, 11: 10, 12: 10,
                   20: 20, 21: 20}


@pytest.mark.parametrize("tier", TIERS)
def test_transitivity_without_direct_edge(spark, tier):
    # A~B and B~C but never A~C: all three must share a component
    pairs = _df(spark, [(100, 5), (5, 200)])
    got = {r["node"]: r["component"]
           for r in connected_components(pairs, tier=tier).collect()}
    assert got == {5: 5, 100: 5, 200: 5}


def test_dup_clusters_summary(spark):
    pairs = _df(spark, [(1, 2), (2, 3), (20, 21)])
    got = {r["component"]: (r["n_docs"], r["keep"])
          for r in dup_clusters(pairs).collect()}
    assert got == {1: (3, 1), 20: (2, 20)}


@pytest.mark.parametrize("tier", TIERS)
def test_long_chain_converges(spark, tier):
    # diameter 20: label must walk the whole chain
    pairs = _df(spark, [(i, i + 1) for i in range(20)])
    got = {r["node"]: r["component"]
           for r in connected_components(pairs, tier=tier).collect()}
    assert set(got.values()) == {0}
    assert len(got) == 21


def test_chain_longer_than_max_iter_converges(spark):
    # diameter 300 >> max_iter 50: 1-hop propagation alone would need
    # ~300 rounds and raise; path compression compounds the covered
    # distance geometrically, so this must converge well inside the
    # default budget (the drifting-boilerplate / versioned-document
    # chain shape real corpora produce)
    pairs = _df(spark, [(i, i + 1) for i in range(300)])
    got = {r["node"]: r["component"]
           for r in connected_components(pairs, tier="propagate").collect()}
    assert set(got.values()) == {0}
    assert len(got) == 301


def test_chain_round_count_is_logarithmic(spark):
    # the geometric-compounding bound, asserted: a 60-edge chain must
    # converge in far fewer rounds than its diameter (Fibonacci-style
    # growth of the covered distance, engaged from round 2, needs
    # ~11 rounds for 60 plus the fixpoint-detection round)
    pairs = _df(spark, [(i, i + 1) for i in range(60)])
    got = connected_components(pairs, max_iter=16, tier="propagate").collect()
    assert {r["component"] for r in got} == {0}


@pytest.mark.parametrize("tier", TIERS)
def test_string_node_ids(spark, tier):
    # non-numeric ids: the propagate tier's SUM convergence probe would
    # be NULL/error so the changed-label probe must kick in; the local
    # tier's Python `<` must match `least` lexicographically
    pairs = spark.createDataFrame(
        [("docA", "docB"), ("docB", "docC"), ("x", "y")],
        "id_a STRING, id_b STRING")
    got = {r["node"]: r["component"]
           for r in connected_components(pairs, tier=tier).collect()}
    assert got == {"docA": "docA", "docB": "docA", "docC": "docA",
                   "x": "x", "y": "x"}


def test_nonconvergence_raises(spark):
    # propagate-tier budget contract (the local tier has no rounds —
    # tier="auto" would route this small graph there and never raise)
    pairs = _df(spark, [(i, i + 1) for i in range(10)])
    with pytest.raises(RuntimeError, match="converge"):
        connected_components(pairs, max_iter=1, tier="propagate")


def test_unknown_tier_raises(spark):
    with pytest.raises(ValueError, match="tier"):
        connected_components(_df(spark, [(1, 2)]), tier="driver")


def test_auto_routes_small_graph_local(spark, monkeypatch):
    # auto must take the one-task union-find below the crossover and
    # the iterative tier above it (crossover forced to 0 to observe)
    from toy_vector_db_spark.operators import components as mod

    pairs = _df(spark, [(1, 2), (2, 3)])
    calls = []
    real_local = mod._components_local
    monkeypatch.setattr(mod, "_components_local",
                        lambda e: calls.append("local") or real_local(e))
    got = {r["node"]: r["component"]
           for r in mod.connected_components(pairs).collect()}
    assert got == {1: 1, 2: 1, 3: 1} and calls == ["local"]

    import toy_vector_db_spark.operators.chooser as chooser
    monkeypatch.setattr(chooser, "CC_LOCAL_MAX_EDGES", 0)
    calls.clear()
    got = {r["node"]: r["component"]
           for r in mod.connected_components(pairs).collect()}
    assert got == {1: 1, 2: 1, 3: 1} and calls == []  # propagate path


def test_local_tier_multi_batch_accumulation(spark):
    # the union-find generator must accumulate across Arrow batches of
    # the single coalesced partition: 4k chain edges become 8k
    # bidirectional rows, UNDER the default 10k maxRecordsPerBatch, so
    # force 500-row batches (16+ batches) for the duration of the call
    key = "spark.sql.execution.arrow.maxRecordsPerBatch"
    old = spark.conf.get(key)
    spark.conf.set(key, "500")
    try:
        pairs = _df(spark, [(i, i + 1) for i in range(4000)])
        got = connected_components(pairs, tier="local").collect()
    finally:
        spark.conf.set(key, old)
    assert {r["component"] for r in got} == {0}
    assert len(got) == 4001


@pytest.mark.parametrize("tier", TIERS)
def test_null_edges_dropped(spark, tier):
    # a null endpoint carries no duplicate evidence: the edge is
    # dropped before routing (the local tier's Arrow conversion would
    # otherwise turn the BIGINT column float64 and find(NaN) would
    # never terminate). Non-null edges are untouched.
    pairs = spark.createDataFrame(
        [(1, 2), (3, None), (None, None), (2, 4)],
        "id_a BIGINT, id_b BIGINT")
    got = {r["node"]: r["component"]
           for r in connected_components(pairs, tier=tier).collect()}
    assert got == {1: 1, 2: 1, 4: 1}


def test_auto_string_ids_route_by_byte_estimate(spark, monkeypatch):
    # long string ids must route through the byte budget, not the raw
    # edge count: shrink the budget so even a 3-edge graph of 64-char
    # ids overflows it and auto falls back to the propagate tier
    from toy_vector_db_spark.operators import components as mod
    import toy_vector_db_spark.operators.chooser as chooser

    wide = [("a" * 64 + str(i), "b" * 64 + str(i + 1)) for i in range(3)]
    pairs = spark.createDataFrame(wide, "id_a STRING, id_b STRING")
    calls = []
    real_local = mod._components_local
    monkeypatch.setattr(mod, "_components_local",
                        lambda e: calls.append("local") or real_local(e))
    mod.connected_components(pairs).collect()
    assert calls == ["local"]          # fits the default budget

    monkeypatch.setattr(chooser, "CC_LOCAL_MEM_BUDGET_BYTES", 100)
    calls.clear()
    got = mod.connected_components(pairs).collect()
    assert calls == [] and len(got) == 6   # propagate path, same answer
