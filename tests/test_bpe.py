from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from toy_vector_db_spark.operators.bpe import (
    learn_bpe, pair_counts, segment, word_freqs,
)


@pytest.fixture(scope="module")
def docs(spark):
    # classic BPE teaching corpus: 'ab' dominates, then 'abc'
    return spark.createDataFrame(
        [(1, "abab abc"), (2, "abab abab"), (3, "xy")],
        ["doc_id", "text"])


def test_word_freqs(docs):
    got = {r["word"]: r["freq"] for r in word_freqs(docs).collect()}
    assert got == {"abab": 3, "abc": 1, "xy": 1}


def test_pair_counts_weighted_overlapping(spark):
    v = spark.createDataFrame([("aaa", ["a", "a", "a"], 2)],
                              ["word", "syms", "freq"])
    got = {(r["left"], r["right"]): r["weight"]
           for r in pair_counts(v).collect()}
    assert got == {("a", "a"): 4}  # 2 overlapping pairs x freq 2


def test_learn_bpe_merge_order_and_fuse(docs):
    merges, vocab = learn_bpe(docs, n_merges=2)
    # round 1: (a,b) dominates — weight 2*3 + 1 = 7
    assert merges[0] == ("a", "b")
    # round 2: after fusing, 'abab'->[ab,ab] makes (ab,ab) weight 3;
    # (ab,c) has 1, (x,y) 1 -> (ab,ab) wins
    assert merges[1] == ("ab", "ab")
    syms = {r["word"]: r["syms"] for r in vocab.collect()}
    assert syms["abab"] == ["abab"]
    assert syms["abc"] == ["ab", "c"]
    assert syms["xy"] == ["x", "y"]


def test_greedy_fuse_nonoverlapping(spark):
    # 'aaa' under merge (a,a): greedy left-to-right -> [aa, a]
    d = spark.createDataFrame([(1, "aaa aaaa")], ["doc_id", "text"])
    merges, vocab = learn_bpe(d, n_merges=1)
    assert merges == [("a", "a")]
    syms = {r["word"]: r["syms"] for r in vocab.collect()}
    assert syms["aaa"] == ["aa", "a"]
    assert syms["aaaa"] == ["aa", "aa"]


def test_segment_applies_merges_in_order(spark, docs):
    merges, _ = learn_bpe(docs, n_merges=2)
    new = spark.createDataFrame([("ababab",), ("bab",)], ["word"])
    syms = {r["word"]: r["syms"]
            for r in segment(new, merges).collect()}
    assert syms["ababab"] == ["abab", "ab"]  # (a,b)x3 then (ab,ab) once
    assert syms["bab"] == ["b", "ab"]


def test_learn_bpe_exhausts_gracefully(spark):
    d = spark.createDataFrame([(1, "ab")], ["doc_id", "text"])
    merges, vocab = learn_bpe(d, n_merges=5)  # only 1 merge possible
    assert merges == [("a", "b")]
    assert vocab.collect()[0]["syms"] == ["ab"]
    with pytest.raises(ValueError):
        learn_bpe(d, n_merges=0)
