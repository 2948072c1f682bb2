from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from toy_vector_db_spark.operators.dsir import (
    dsir_sample, hashed_feature_instances, importance_weights,
    selection_report,
)

# target-looking docs share a vocabulary; off-target docs use another
DOCS = [
    (1, "the quick brown fox jumps over the lazy dog", 1),
    (2, "the quick brown fox sleeps near the lazy dog", 1),
    (3, "quick brown animals jump over lazy dogs", 1),
    (4, "zzz qqq xxx vvv kkk jjj www", 0),
    (5, "qqq zzz vvv xxx jjj kkk uuu", 0),
    (6, "the quick brown fox", 0),  # off-target flag, target-like text
    (7, "", 0),
]


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(DOCS, ["doc_id", "text", "is_tgt"])


def test_feature_instances_unigrams_and_bigrams(spark):
    d = spark.createDataFrame([(1, "a b c")], ["doc_id", "text"])
    rows = hashed_feature_instances(d, buckets=64).collect()
    # 3 unigrams + 2 bigrams
    assert len(rows) == 5
    assert all(0 <= r["bucket"] < 64 for r in rows)
    uni = hashed_feature_instances(d, buckets=64, bigrams=False).collect()
    assert len(uni) == 3


def test_feature_instances_short_doc_no_bigrams(spark):
    d = spark.createDataFrame([(1, "solo"), (2, "")], ["doc_id", "text"])
    rows = hashed_feature_instances(d, buckets=64).collect()
    assert len(rows) == 1  # one unigram, no bigram, empty doc dropped


def test_importance_weights_direction(docs):
    w = {r["doc_id"]: r["weight"]
         for r in importance_weights(docs, F.col("is_tgt") == 1,
                                     buckets=256).collect()}
    # target-vocabulary docs outscore the off-distribution ones
    assert min(w[1], w[2], w[3]) > max(w[4], w[5])
    # doc 6 shares the target vocabulary -> scores like the target even
    # though its own flag is 0 (that's the point of DSIR: the MODEL
    # generalizes past the labeled subset)
    assert w[6] > max(w[4], w[5])
    assert 7 not in w  # empty doc unscored


def test_sample_is_deterministic_topk(docs):
    a = dsir_sample(docs, F.col("is_tgt") == 1, k=3, buckets=256).collect()
    b = dsir_sample(docs, F.col("is_tgt") == 1, k=3, buckets=256).collect()
    assert [r["doc_id"] for r in a] == [r["doc_id"] for r in b]
    assert len(a) == 3


def test_selection_report_matches_sample(docs):
    rep = selection_report(docs, F.col("is_tgt") == 1, k=3,
                           buckets=256).collect()
    sel = {r["doc_id"] for r in rep if r["selected"]}
    smp = {r["doc_id"] for r in
           dsir_sample(docs, F.col("is_tgt") == 1, k=3, buckets=256).collect()}
    assert sel == smp
    assert len(rep) == 6  # every scored doc reported, empty doc omitted


def test_param_validation(docs):
    with pytest.raises(ValueError):
        hashed_feature_instances(docs, buckets=1)
    with pytest.raises(ValueError):
        importance_weights(docs, F.col("is_tgt") == 1, alpha=0.0)
    with pytest.raises(ValueError):
        dsir_sample(docs, F.col("is_tgt") == 1, k=0)
