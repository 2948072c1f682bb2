"""Deterministic sampling/splits and vocabulary/tf-idf operators
(training-pipeline tier; oracle-checked end-to-end in workload.py —
these tests pin the operator-level contracts)."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from toy_vector_db_spark.operators.sampling import (
    cluster_safe_split, deterministic_shuffle, hash_sample,
    stratified_sample, temperature_sample, train_test_split,
)
from toy_vector_db_spark.operators.tfidf import (
    term_frequencies, tfidf_top_terms, vocabulary,
)


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(
        [(i, f"doc number {i}", "en" if i % 3 else "de")
         for i in range(300)], ["doc_id", "text", "lang"]).cache()


def test_hash_sample_fraction_and_determinism(docs):
    s1 = hash_sample(docs, "doc_id", 0.3)
    s2 = hash_sample(docs, "doc_id", 0.3)
    ids1 = {r["doc_id"] for r in s1.collect()}
    ids2 = {r["doc_id"] for r in s2.collect()}
    assert ids1 == ids2                       # no RNG state anywhere
    assert 0.15 < len(ids1) / 300 < 0.45      # roughly the fraction


def test_hash_sample_stable_under_growth(spark, docs):
    # adding rows never evicts a previously sampled row
    small = hash_sample(docs.filter("doc_id < 100"), "doc_id", 0.3)
    big = hash_sample(docs, "doc_id", 0.3)
    small_ids = {r["doc_id"] for r in small.collect()}
    big_ids = {r["doc_id"] for r in big.collect()}
    assert small_ids <= big_ids
    assert small_ids == {i for i in big_ids if i < 100}


def test_hash_sample_nested_fractions(docs):
    # a 10% sample is a subset of a 30% sample (same salt): thresholds
    # nest, which is what makes fraction tuning reproducible
    s10 = {r["doc_id"] for r in hash_sample(docs, "doc_id", 0.1).collect()}
    s30 = {r["doc_id"] for r in hash_sample(docs, "doc_id", 0.3).collect()}
    assert s10 <= s30


def test_train_test_split_partition(docs):
    out = train_test_split(docs, "doc_id", 0.2).collect()
    assert len(out) == 300                    # every row exactly once
    frac = sum(r["split"] == "test" for r in out) / 300
    assert 0.1 < frac < 0.3


def test_temperature_sample_flattens_rare_sources(spark):
    # 900 rows of "big" vs 100 of "rare": alpha<1 must lift the rare
    # source's keep RATE above the big source's, while alpha=1
    # reproduces the natural (uniform) sampling rate for both
    rows = [(i, "big" if i < 900 else "rare") for i in range(1000)]
    df = spark.createDataFrame(rows, ["doc_id", "source"]).cache()

    def rates(alpha):
        kept = temperature_sample(df, "doc_id", "source", alpha=alpha,
                                  total_fraction=0.2).collect()
        n = {"big": 0, "rare": 0}
        for r in kept:
            n[r["source"]] += 1
        return n["big"] / 900, n["rare"] / 100

    big_flat, rare_flat = rates(0.0)     # equal-rows target
    assert rare_flat > 2 * big_flat      # rare source heavily upsampled
    big_nat, rare_nat = rates(1.0)       # natural mix: same keep rate
    assert abs(big_nat - rare_nat) < 0.12
    # determinism: same call, same membership
    a = {r["doc_id"] for r in temperature_sample(
        df, "doc_id", "source", 0.5, 0.2).collect()}
    b = {r["doc_id"] for r in temperature_sample(
        df, "doc_id", "source", 0.5, 0.2).collect()}
    assert a == b


def test_cluster_safe_split_family_atomicity(spark, docs):
    # near-dup families: {0,1,2} via chain 0-1, 1-2 (0~2 never scored)
    # and {10,11}; everything else is a singleton
    pairs = spark.createDataFrame(
        [(0, 1), (1, 2), (10, 11)], ["id_a", "id_b"])
    out = cluster_safe_split(docs, pairs, "doc_id", 0.2).collect()
    assert len(out) == 300                    # left join keeps every doc
    by_id = {r["doc_id"]: r for r in out}
    # the transitive family shares one representative and one side
    assert {by_id[i]["rep"] for i in (0, 1, 2)} == {0}
    assert len({by_id[i]["split"] for i in (0, 1, 2)}) == 1
    assert {by_id[i]["rep"] for i in (10, 11)} == {10}
    assert by_id[10]["split"] == by_id[11]["split"]
    # singletons fall back to their own key and match the per-doc rule
    plain = {r["doc_id"]: r["split"]
             for r in train_test_split(docs, "doc_id", 0.2).collect()}
    for i, r in by_id.items():
        if i not in (0, 1, 2, 10, 11):
            assert r["rep"] == i and r["split"] == plain[i]


def test_cluster_safe_split_deterministic(spark, docs):
    pairs = spark.createDataFrame([(5, 6)], ["id_a", "id_b"])
    a = sorted((r["doc_id"], r["split"]) for r in
               cluster_safe_split(docs, pairs, "doc_id", 0.2).collect())
    b = sorted((r["doc_id"], r["split"]) for r in
               cluster_safe_split(docs, pairs, "doc_id", 0.2).collect())
    assert a == b


def test_stratified_sample_respects_quotas(docs):
    out = stratified_sample(docs, "doc_id", "lang",
                            {"en": 0.5, "de": 0.0}).collect()
    assert out and all(r["lang"] == "en" for r in out)  # de quota is 0


def test_deterministic_shuffle_reproducible(docs):
    a = [r["doc_id"] for r in deterministic_shuffle(docs, "doc_id").collect()]
    b = [r["doc_id"] for r in deterministic_shuffle(docs, "doc_id").collect()]
    assert a == b and a != sorted(a)          # shuffled, but stable


def test_term_frequencies_and_vocabulary(spark):
    d = spark.createDataFrame(
        [(1, "the cat sat, the cat!"), (2, "the dog"), (3, "")],
        ["doc_id", "text"])
    tf = {(r["doc_id"], r["term"]): r["tf"]
          for r in term_frequencies(d).collect()}
    assert tf[(1, "the")] == 2 and tf[(1, "cat")] == 2 and tf[(1, "sat")] == 1
    assert tf[(2, "dog")] == 1
    assert not any(k[0] == 3 for k in tf)     # empty text -> no terms
    v = {r["term"]: (r["doc_freq"], r["total_tf"])
         for r in vocabulary(d).collect()}
    assert v["the"] == (2, 3) and v["cat"] == (1, 2)


def test_tfidf_top_terms_ranking(spark):
    d = spark.createDataFrame(
        [(1, "apple apple banana"), (2, "banana cherry"), (3, "cherry date")],
        ["doc_id", "text"])
    out = {(r["doc_id"], r["rank"]): (r["term"], r["tfidf"])
           for r in tfidf_top_terms(d, k=2).collect()}
    # doc 1: apple tf=2 df=1 beats banana tf=1 df=2
    term, score = out[(1, 1)]
    assert term == "apple"
    assert score == pytest.approx(2 * math.log(4 / 2), rel=1e-9)
    assert out[(1, 2)][0] == "banana"


# -- token-budget mixture sampling ------------------------------------------

@pytest.fixture(scope="module")
def sourced_docs(spark):
    # 3 sources x 10 docs, each doc exactly 4 whitespace tokens
    rows = [(s * 100 + i, "tok one two three", f"src{s}")
            for s in range(3) for i in range(10)]
    return spark.createDataFrame(rows, ["doc_id", "text", "source"]).cache()


def test_token_budget_cutoff(sourced_docs):
    from toy_vector_db_spark.operators.sampling import token_budget_sample
    # budget 10 tokens at 4 tokens/doc: cum_before 0,4,8 < 10 -> 3 docs
    out = token_budget_sample(sourced_docs, {"src0": 10}).collect()
    assert len(out) == 3
    assert all(r["source"] == "src0" for r in out)
    assert sorted(r["cum_before"] for r in out) == [0, 4, 8]
    # the crossing doc is kept: total taken = 12 >= budget
    assert sum(r["n_tok"] for r in out) == 12


def test_token_budget_per_source_and_unlisted(sourced_docs):
    from toy_vector_db_spark.operators.sampling import token_budget_sample
    out = token_budget_sample(sourced_docs,
                              {"src0": 40, "src1": 1}).collect()
    by_src = {}
    for r in out:
        by_src.setdefault(r["source"], []).append(r)
    # src0: all 10 docs (budget == exactly the full 40 tokens)
    assert len(by_src["src0"]) == 10
    # src1: budget 1 -> just the first doc in hash order
    assert len(by_src["src1"]) == 1
    # src2 unlisted -> contributes nothing
    assert "src2" not in by_src


def test_token_budget_deterministic(sourced_docs):
    from toy_vector_db_spark.operators.sampling import token_budget_sample
    a = {r["doc_id"] for r in
         token_budget_sample(sourced_docs, {"src1": 20}).collect()}
    b = {r["doc_id"] for r in
         token_budget_sample(sourced_docs, {"src1": 20}).collect()}
    assert a == b and len(a) == 5


def test_token_budget_validation(sourced_docs):
    from toy_vector_db_spark.operators.sampling import token_budget_sample
    with pytest.raises(ValueError, match="at least one"):
        token_budget_sample(sourced_docs, {})
    with pytest.raises(ValueError, match="negative"):
        token_budget_sample(sourced_docs, {"src0": -1})


def test_sample_k_per_group_exact_quota_and_stability(spark):
    from toy_vector_db_spark.operators.sampling import sample_k_per_group

    df = spark.createDataFrame(
        [(i, "big" if i < 40 else "small") for i in range(45)],
        ["doc_id", "grp"])
    got = sample_k_per_group(df, "doc_id", "grp", k=5).collect()
    by = {}
    for r in got:
        by.setdefault(r["grp"], set()).add(r["doc_id"])
    assert len(by["big"]) == 5
    assert len(by["small"]) == 5  # exactly the whole small group
    # growth stability: adding rows never ADDS a previously-excluded row
    df2 = spark.createDataFrame(
        [(i, "big" if i < 40 else "small") for i in range(60)],
        ["doc_id", "grp"])
    by2 = {}
    for r in sample_k_per_group(df2, "doc_id", "grp", k=5).collect():
        by2.setdefault(r["grp"], set()).add(r["doc_id"])
    assert by2["big"] <= by["big"] | set(range(40, 60))
    import pytest as _pytest
    with _pytest.raises(ValueError):
        sample_k_per_group(df, "doc_id", "grp", k=0)


def test_token_budget_sample_pretokenized_counts(spark):
    # n_tok_col: the walk runs on supplied (e.g. BPE) counts, not the
    # whitespace token_count of text — same ordering, different cutoff
    from toy_vector_db_spark.operators.sampling import token_budget_sample
    rows = [(i, "s", "one two three", 10) for i in range(10)]
    df = spark.createDataFrame(
        rows, "doc_id LONG, source STRING, text STRING, bpe LONG")
    ws = token_budget_sample(df, {"s": 30})
    bpe = token_budget_sample(df, {"s": 30}, n_tok_col="bpe")
    # whitespace counts are 3/doc -> 10 docs kept; BPE counts are
    # 10/doc -> only 3 cross the same budget
    assert ws.count() == 10 and bpe.count() == 3
    got = bpe.orderBy("cum_before").collect()
    assert [r["n_tok"] for r in got] == [10, 10, 10]
    assert [r["cum_before"] for r in got] == [0, 10, 20]
    # membership prefix agrees with the whitespace walk's md5 order
    ws_ids = [r["doc_id"] for r in ws.orderBy("cum_before").collect()]
    assert [r["doc_id"] for r in got] == ws_ids[:3]


def test_bpe_budget_composition_matches_manual(spark):
    # end-to-end: the registered query's pieces — learned merges,
    # segmentation counts, budget walk — agree with a hand-replayed
    # pipeline on a small corpus
    from toy_vector_db_spark.operators.bpe import (
        _segment_word_py, learn_bpe, segment,
    )
    from pyspark.sql import functions as F
    from toy_vector_db_spark.functions.text import normalize_for_fingerprint
    rows = [(i, "s", ("aa ab " * (i + 1)).strip()) for i in range(4)]
    d = spark.createDataFrame(rows, "doc_id LONG, source STRING, text STRING")
    merges, _ = learn_bpe(d, n_merges=2)
    toks = F.split(normalize_for_fingerprint(F.col("text")), " ")
    wpd = (d.select("doc_id", F.explode(toks).alias("word"))
           .filter(F.col("word") != ""))
    wn = segment(wpd.select("word").distinct(), merges) \
        .select("word", F.size("syms").alias("n_sym"))
    got = {r["doc_id"]: r["n"] for r in
           wpd.join(wn, "word").groupBy("doc_id")
           .agg(F.sum("n_sym").alias("n")).collect()}
    for i in range(4):
        want = sum(len(_segment_word_py(w, merges))
                   for w in ("aa ab " * (i + 1)).strip().split())
        assert got[i] == want
