from __future__ import annotations

import math

import pytest

from toy_vector_db_spark.operators.lmscore import (
    token_instances, unigram_model, unigram_scores,
)

DOCS = [
    (1, "common common common"),
    (2, "common rare"),
    (3, ""),
]


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(DOCS, ["doc_id", "text"])


def test_token_instances_keep_repeats(docs):
    rows = token_instances(docs).collect()
    assert sum(1 for r in rows if r["term"] == "common") == 4
    # empty doc contributes nothing
    assert all(r["doc_id"] != 3 for r in rows)


def test_unigram_model_counts(docs):
    counts = {r["term"]: r["c"] for r in unigram_model(docs).collect()}
    assert counts == {"common": 4, "rare": 1}


def test_scores_match_hand_computation(docs):
    # N=5, V=2, alpha=0.5: p(common)=(4.5)/6, p(rare)=1.5/6
    p_common, p_rare = 4.5 / 6.0, 1.5 / 6.0
    out = {r["doc_id"]: r for r in unigram_scores(docs, alpha=0.5).collect()}
    assert out[1]["n_tokens"] == 3
    assert out[1]["avg_neg_logprob"] == pytest.approx(-math.log(p_common))
    assert out[2]["avg_neg_logprob"] == pytest.approx(
        (-math.log(p_common) - math.log(p_rare)) / 2)
    # rarer content scores strictly higher
    assert out[2]["avg_neg_logprob"] > out[1]["avg_neg_logprob"]
    # tokenless docs are omitted
    assert 3 not in out


def test_alpha_validation(docs):
    with pytest.raises(ValueError, match="alpha"):
        unigram_scores(docs, alpha=0.0)


def test_score_against_frozen_model(spark, docs):
    import math
    from toy_vector_db_spark.operators.lmscore import (
        score_against, unigram_model,
    )
    model = unigram_model(docs)          # N=5, V=2 (common:4, rare:1)
    new = spark.createDataFrame(
        [(10, "common unseen")], ["doc_id", "text"])
    out = {r["doc_id"]: r
           for r in score_against(new, model, alpha=0.5).collect()}
    p_common, p_floor = 4.5 / 6.0, 0.5 / 6.0
    assert out[10]["n_tokens"] == 2
    assert out[10]["avg_neg_logprob"] == pytest.approx(
        (-math.log(p_common) - math.log(p_floor)) / 2)
    # scoring docs already in the corpus under their own model matches
    # the closed-form unigram_scores
    from toy_vector_db_spark.operators.lmscore import unigram_scores
    a = {r["doc_id"]: r["avg_neg_logprob"]
         for r in unigram_scores(docs).collect()}
    b = {r["doc_id"]: r["avg_neg_logprob"]
         for r in score_against(docs, model).collect()}
    assert a == pytest.approx(b)


def test_perplexity_buckets_per_group(spark):
    from toy_vector_db_spark.operators.lmscore import perplexity_buckets

    scored = spark.createDataFrame(
        [(1, "en", 1.0), (2, "en", 2.0), (3, "en", 3.0),
         (4, "en", 4.0), (5, "en", 5.0), (6, "en", 6.0),
         (7, "de", 1.0), (8, "de", 2.0)],
        ["doc_id", "lang", "avg_neg_logprob"])
    got = {r["doc_id"]: r["bucket"]
           for r in perplexity_buckets(scored, 3, group_col="lang").collect()}
    # en: 6 docs / 3 buckets = 2 each, ordered by score
    assert [got[i] for i in (1, 2, 3, 4, 5, 6)] == [1, 1, 2, 2, 3, 3]
    # de: 2 docs into 3 buckets -> first buckets get the rows
    assert (got[7], got[8]) == (1, 2)


def test_perplexity_buckets_tie_break_deterministic(spark):
    from toy_vector_db_spark.operators.lmscore import perplexity_buckets

    scored = spark.createDataFrame(
        [(10, 1.0), (11, 1.0), (12, 1.0)],
        ["doc_id", "avg_neg_logprob"])
    a = {r["doc_id"]: r["bucket"]
         for r in perplexity_buckets(scored, 3).collect()}
    assert a == {10: 1, 11: 2, 12: 3}  # equal scores fall to the id
    with pytest.raises(ValueError):
        perplexity_buckets(scored, 0)


def test_bigram_instances_pairs(spark):
    from toy_vector_db_spark.operators.lmscore import bigram_instances

    d = spark.createDataFrame([(1, "a b c"), (2, "solo"), (3, "")],
                              ["doc_id", "text"])
    got = {(r["doc_id"], r["prev"], r["cur"])
           for r in bigram_instances(d).collect()}
    assert got == {(1, "a", "b"), (1, "b", "c")}


def test_bigram_scores_order_sensitivity(spark):
    """Same unigram bag, different order -> different bigram score;
    the common order scores better (lower -ln p)."""
    from toy_vector_db_spark.operators.lmscore import bigram_scores

    d = spark.createDataFrame(
        [(1, "the cat sat"), (2, "the cat sat"), (3, "sat the cat"),
         (4, "cat sat the")],
        ["doc_id", "text"])
    got = {r["doc_id"]: r["avg_neg_logprob"]
           for r in bigram_scores(d).collect()}
    # docs 1/2 share the dominant order -> best scores
    assert got[1] == pytest.approx(got[2])
    assert got[1] < got[3] and got[1] < got[4]
    with pytest.raises(ValueError):
        bigram_scores(d, alpha=0)
