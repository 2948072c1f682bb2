from __future__ import annotations

from toy_vector_db_spark.operators.decontam import (
    contamination_report, decontaminate, shingle_hash_set,
)

TRAIN = [
    (1, "alpha beta gamma delta epsilon zeta eta"),
    (2, "one two three four five six seven eight"),
    (3, "the quick brown fox jumps over the lazy dog"),
    (4, "totally unrelated words live in this row"),
]
EVAL = [
    (100, "prefix words then one two three four five six and more"),
    (101, "the quick brown fox jumps over something else"),
]


def _dfs(spark):
    train = spark.createDataFrame(TRAIN, ["doc_id", "text"])
    ev = spark.createDataFrame(EVAL, ["doc_id", "text"])
    return train, ev


def test_shingle_hash_set_distinct_per_doc(spark):
    train, _ = _dfs(spark)
    sh = shingle_hash_set(train, n=5)
    # doc 1 has 7 tokens -> 3 distinct 5-shingles
    assert sh.filter("doc_id = 1").count() == 3
    assert sh.columns == ["doc_id", "shingle_hash"]


def test_contamination_report_flags_overlap(spark):
    train, ev = _dfs(spark)
    rep = contamination_report(train, ev, n=5).collect()
    by_id = {r["doc_id"]: r for r in rep}
    assert len(by_id) == 4                      # every train doc reported
    # doc 2 shares "one two three four five"/"two three four five six"
    # (+1 more); doc 3 shares "the quick brown fox jumps" (+1)
    assert by_id[2]["contaminated"] and by_id[2]["n_shared"] >= 2
    assert by_id[3]["contaminated"] and by_id[3]["n_shared"] >= 1
    assert not by_id[1]["contaminated"] and by_id[1]["n_shared"] == 0
    assert not by_id[4]["contaminated"]
    assert all(r["n_shingles"] >= r["n_shared"] for r in rep)


def test_shuffle_join_path_matches_broadcast(spark):
    train, ev = _dfs(spark)
    a = sorted(map(tuple, contamination_report(
        train, ev, n=5, broadcast_eval=True).collect()))
    b = sorted(map(tuple, contamination_report(
        train, ev, n=5, broadcast_eval=False).collect()))
    assert a == b


def test_decontaminate_removes_only_contaminated(spark):
    train, ev = _dfs(spark)
    kept = sorted(r["doc_id"] for r in decontaminate(train, ev, n=5).collect())
    assert kept == [1, 4]
    # a stricter threshold keeps the single-shingle overlap
    kept3 = sorted(r["doc_id"]
                   for r in decontaminate(train, ev, n=5,
                                          min_shared=3).collect())
    assert kept3 == [1, 2, 3, 4]


def test_report_plan_broadcasts_eval_side(spark):
    train, ev = _dfs(spark)
    df = contamination_report(train, ev, n=5)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan


def test_bloom_tier_matches_exact_report(spark):
    from toy_vector_db_spark.operators.decontam import (
        contamination_report_bloom,
    )
    train, ev = _dfs(spark)
    exact = sorted(map(tuple, contamination_report(train, ev, n=5).collect()))
    bloom = sorted(map(tuple,
                       contamination_report_bloom(train, ev, n=5).collect()))
    assert bloom == exact


def test_bloom_tier_matches_under_heavy_fpp(spark):
    """A deliberately tiny filter (64 bits for ~20 shingles -> nearly
    every probe collides) must STILL give the exact answer — false
    positives only reach the verification join."""
    from toy_vector_db_spark.operators.decontam import (
        contamination_report_bloom,
    )
    train, ev = _dfs(spark)
    exact = sorted(map(tuple, contamination_report(train, ev, n=5).collect()))
    bloom = sorted(map(tuple,
                       contamination_report_bloom(train, ev, n=5,
                                                  m_bits=64, k=2).collect()))
    assert bloom == exact


def test_bloom_filter_size_and_validation(spark):
    from toy_vector_db_spark.operators.decontam import build_shingle_bloom
    _, ev = _dfs(spark)
    arr = build_shingle_bloom(ev, m_bits=1 << 10, k=4)
    assert len(arr) == (1 << 10) // 64
    assert any(w != 0 for w in arr)           # something was inserted
    import pytest
    with pytest.raises(ValueError, match="multiple of 64"):
        build_shingle_bloom(ev, m_bits=100)


def test_sharded_tier_matches_exact_report(spark):
    from toy_vector_db_spark.operators.decontam import (
        contamination_report_sharded)
    train, ev = _dfs(spark)
    a = sorted(map(tuple, contamination_report(train, ev, n=5).collect()))
    b = sorted(map(tuple, contamination_report_sharded(
        train, ev, n=5, n_shards=4).collect()))
    assert a == b


def test_sharded_tier_matches_under_heavy_fpp(spark):
    # a filter this tiny (64 bits/shard, 1 probe) false-positives
    # constantly — the exact verify join must still keep the report
    # identical to the broadcast tier
    from toy_vector_db_spark.operators.decontam import (
        contamination_report_sharded)
    train, ev = _dfs(spark)
    a = sorted(map(tuple, contamination_report(train, ev, n=5).collect()))
    b = sorted(map(tuple, contamination_report_sharded(
        train, ev, n=5, n_shards=2, m_bits=64, k=1).collect()))
    assert a == b


def test_sharded_tier_never_broadcasts_eval_side(spark):
    # the verify semi-join must be a shuffle join — broadcasting the
    # eval hash set is exactly what this tier exists to avoid; the
    # ONLY broadcast allowed is the bounded filter frame (shard join).
    # r13: the shuffle join is a ShuffledHashJoin building on the
    # bounded eval side (guide §3.1) — the old merge hint paid two
    # full sorts per verify
    from toy_vector_db_spark.operators.decontam import (
        contamination_report_sharded)
    train, ev = _dfs(spark)
    plan = contamination_report_sharded(
        train, ev, n=5, n_shards=4)._jdf.queryExecution() \
        .executedPlan().toString()
    semi = [ln for ln in plan.splitlines() if "LeftSemi" in ln]
    assert semi, plan
    assert all("Broadcast" not in ln for ln in semi), semi
    assert any("ShuffledHashJoin" in ln for ln in semi), semi


def test_sharded_bloom_build_is_bounded_and_valid(spark):
    from toy_vector_db_spark.operators.decontam import build_sharded_bloom
    import pytest
    _, ev = _dfs(spark)
    filt = build_sharded_bloom(ev, n=5, n_shards=4).collect()
    assert 1 <= len(filt) <= 4
    assert all(0 <= r["__s"] < 4 for r in filt)
    with pytest.raises(ValueError):
        build_sharded_bloom(ev, m_bits=63)
    with pytest.raises(ValueError):
        build_sharded_bloom(ev, n_shards=0)
