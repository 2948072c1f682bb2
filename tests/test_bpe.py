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


def test_segment_tiers_equivalent_property(spark):
    # the Arrow tier (> EXPR_MAX_MERGES merges) must produce EXACTLY
    # the expression tier's output — same words, same merges applied
    # in order on both sides of the threshold
    import string

    from hypothesis import given, settings
    from hypothesis import strategies as st

    from toy_vector_db_spark.operators.bpe import (EXPR_MAX_MERGES,
                                                   _fuse,
                                                   _segment_word_py)
    from pyspark.sql import functions as F

    chars = st.sampled_from(string.ascii_lowercase[:4])
    words_st = st.lists(st.text(chars, min_size=0, max_size=10),
                        min_size=1, max_size=8)
    merges_st = st.lists(
        st.tuples(st.text(chars, min_size=1, max_size=2),
                  st.text(chars, min_size=1, max_size=2)),
        min_size=1, max_size=6)

    @settings(max_examples=25, deadline=None)
    @given(words_st, merges_st)
    def check(words, merges):
        df = spark.createDataFrame([(w,) for w in words], "word string")
        syms = F.split(F.col("word"), "")
        for a, b in merges:
            syms = _fuse(syms, a, b)
        expr = {r["word"]: list(r["syms"])
                for r in df.withColumn("syms", syms).collect()}
        py = {w: _segment_word_py(w, merges) for w in words}
        assert expr == py

    check()


def test_segment_thousand_merges_arrow_tier(spark):
    # the r4 codegen-depth limit, lifted: a 1k-merge vocabulary
    # segments through the Arrow tier (in-order semantics preserved,
    # dead merges skipped by the symbol-set guard)
    merges = [("a", "a"), ("aa", "aa"), ("b", "c")]
    merges += [(f"x{i}", f"y{i}") for i in range(997)]
    assert len(merges) == 1000
    words = spark.createDataFrame(
        [("aaaa",), ("aaab",), ("abcbc",), ("",)], "word string")
    got = {r["word"]: list(r["syms"])
           for r in segment(words, merges).collect()}
    assert got["aaaa"] == ["aaaa"]          # aa+aa fused by merge 2
    assert got["aaab"] == ["aa", "a", "b"]  # greedy L2R, no aa+ab
    assert got["abcbc"] == ["a", "bc", "bc"]
    assert got[""] == [""]                  # split("", "") convention


# ---------------------------------------------------------------------------
# r10: batched merge rounds (VERDICT r9 Next #2)
# ---------------------------------------------------------------------------


def test_pick_disjoint_batch_rules():
    from toy_vector_db_spark.operators.bpe import pick_disjoint_batch
    ranked = [("a", "b"), ("a", "c"), ("c", "d"), ("ab", "e"),
              ("x", "y"), ("e", "f")]
    # (a,c) shares a; (ab,e) uses pick 1's fused output 'ab';
    # (e,f) shares e with nothing picked yet -> kept
    assert pick_disjoint_batch(ranked, 4) == [
        ("a", "b"), ("c", "d"), ("x", "y"), ("e", "f")]
    assert pick_disjoint_batch(ranked, 2) == [("a", "b"), ("c", "d")]
    assert pick_disjoint_batch([], 3) == []


def test_batched_equals_sequential_two_symbol_words(spark):
    # two-symbol words never CREATE pairs when fused, so run to
    # exhaustion: batched learning must find exactly the sequential
    # MERGE SET and the identical final vocab for any batch size.
    # (Within a round, a pair skipped for symbol overlap is emitted
    # AFTER the round's disjoint picks, so list ORDER may interleave —
    # harmless here because disjoint merges commute; the vocab check
    # is the semantic equivalence.)
    import random
    rng = random.Random(7)
    chars = "abcdefgh"
    words = sorted({rng.choice(chars) + rng.choice(chars)
                    for _ in range(24)})
    text = " ".join(w for w in
                    [w for w in words for _ in range(rng.randint(1, 9))])
    d = spark.createDataFrame([(1, text)], ["doc_id", "text"])
    seq, seq_vocab = learn_bpe(d, n_merges=len(words), batch=1)
    seq_syms = {r["word"]: r["syms"] for r in seq_vocab.collect()}
    for b in (2, 3, 8):
        bat, bat_vocab = learn_bpe(d, n_merges=len(words), batch=b)
        assert sorted(bat) == sorted(seq), f"batch={b} set diverged"
        got = {r["word"]: r["syms"] for r in bat_vocab.collect()}
        assert got == seq_syms, f"batch={b} vocab diverged"


def test_batched_vocab_matches_merge_list(spark, docs):
    # whatever list batched learning returns, the final vocab must be
    # exactly segment(merge list) applied to the word table
    merges, vocab = learn_bpe(docs, n_merges=4, batch=3)
    got = {r["word"]: r["syms"] for r in vocab.collect()}
    words = spark.createDataFrame([(w,) for w in got], ["word"])
    exp = {r["word"]: r["syms"]
           for r in segment(words, merges).collect()}
    assert got == exp


def test_batched_round_count(spark):
    # ceil(n_merges/batch) driver rounds: count localCheckpoint cuts
    # indirectly by asserting the merge list fills in few rounds
    d = spark.createDataFrame(
        [(1, "aa bb cc dd ee ff gg hh ii jj kk ll")],
        ["doc_id", "text"])
    merges, _ = learn_bpe(d, n_merges=12, batch=6)
    assert len(merges) == 12
    assert sorted(merges) == [(c, c) for c in "abcdefghijkl"]
