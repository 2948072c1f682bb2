from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from toy_vector_db_spark.functions.text import (
    fingerprint, lang_id, quality_score, rolling_fingerprint, token_count,
    word_shingles,
)


def _vals(spark, texts, col_fn):
    df = spark.createDataFrame([(t,) for t in texts], ["t"])
    return [r["v"] for r in df.select(col_fn(F.col("t")).alias("v")).collect()]


def test_token_count(spark):
    got = _vals(spark, ["", "   ", "one", "one two  three"], token_count)
    assert got == [0, 0, 1, 3]


def test_lang_id(spark):
    got = _vals(spark, [
        "the cat sat on the mat and it was happy",
        "der hund ist nicht auf der couch und das ist gut",
        "le chat est dans la maison et il est content",
        "el perro es un animal que vive por la casa",
        "zzz qqq xxx",
    ], lang_id)
    assert got == ["en", "de", "fr", "es", "und"]


def test_fingerprint_normalization(spark):
    a, b, c = _vals(spark, ["Hello,  World!?", "hello world", "hello worlds"],
                    fingerprint)
    # wait: '!' and '?' are punctuation but our class is [.,!?;:]
    assert a == b
    assert a != c


def test_rolling_fingerprint_properties(spark):
    base = "alpha beta gamma delta epsilon zeta eta theta"
    noisy = "Alpha, beta gamma;  delta epsilon zeta eta theta."
    fa, fn = _vals(spark, [base, noisy], lambda c: rolling_fingerprint(c, 4))
    assert fa == fn          # normalization-invariant
    # the fingerprint is the min shingle hash => appending text can only
    # keep it or lower it, never raise it
    fb = _vals(spark, [base + " omega"], lambda c: rolling_fingerprint(c, 4))[0]
    assert fb <= fa
    assert _vals(spark, ["totally different words here"],
                 lambda c: rolling_fingerprint(c, 4))[0] != fa


def test_quality_score_range_and_ordering(spark):
    good = ("the quick brown fox jumps over the lazy dog. it was a "
            "sunny day, and the fox was happy. that is the story.")
    bad = "x"
    g, b = _vals(spark, [good, bad], quality_score)
    assert 0.0 <= b < g <= 1.0


def test_word_shingles(spark):
    got = _vals(spark, ["a b c d"], lambda c: word_shingles(c, 3))
    assert sorted(got[0]) == ["a b c", "b c d"]
    short = _vals(spark, ["a b"], lambda c: word_shingles(c, 3))
    assert short[0] == ["a b"]


def test_quality_score_null_safe_empty(spark):
    got = _vals(spark, [""], quality_score)
    assert got[0] == pytest.approx(0.1)  # only the 0.5 tok-len term * 0.2


def test_repetition_struct_signals(spark):
    from toy_vector_db_spark.functions.text import repetition_struct
    rows = _vals(spark, [
        "a a a a a a a a a a",            # 1 distinct / 10 tokens
        "one two three four five six",    # all distinct
        "x",                              # single token: no bigrams
        "#### @@@@ //// {}{}",            # symbol soup
    ], repetition_struct)
    dup = rows[0]
    assert dup["dup_word_frac"] == pytest.approx(0.9)
    assert dup["top_bigram_frac"] == pytest.approx(1.0)  # "a a" is every bigram
    assert not dup["keep"]
    clean = rows[1]
    assert clean["dup_word_frac"] == pytest.approx(0.0)
    assert clean["top_bigram_frac"] == 0.0   # no bigram repeats
    assert clean["keep"]
    single = rows[2]
    assert single["top_bigram_frac"] == 0.0
    sym = rows[3]
    assert sym["symbol_ratio"] > 0.5
    assert not sym["keep"]


def test_chunk_windows_straddle_and_empty(spark):
    from toy_vector_db_spark.operators.packing import chunk_windows
    docs = spark.createDataFrame(
        [(1, "en", "a b c"),        # off 0, windows: [0]
         (2, "en", "d e f g"),      # off 3..6 -> straddles w0/w1 (budget 4)
         (3, "en", "   "),          # zero tokens: occupies nothing
         (4, "en", "h"),            # off 7 -> w1
         (5, "fr", "x y z w v")],   # own group: off 0, w0..w1
        ["doc_id", "lang", "text"])
    got = {r["doc_id"]: (r["n_tok"], r["start_off"], r["start_window"],
                         r["n_windows"])
           for r in chunk_windows(docs, budget=4).collect()}
    assert got[1] == (3, 0, 0, 1)
    assert got[2] == (4, 3, 0, 2)   # tokens 3..6 cross the 4-boundary
    assert got[3] == (0, 7, 1, 0)   # empty doc spans no window
    assert got[4] == (1, 7, 1, 1)
    assert got[5] == (5, 0, 0, 2)   # groups pack independently
    import pytest as _pytest
    with _pytest.raises(ValueError):
        chunk_windows(docs, budget=0)


def test_strip_markup(spark):
    from toy_vector_db_spark.functions.text import strip_markup
    cases = [
        ("<p>hello <b>world</b></p>", "hello world"),
        ("<script>var x = '<b>'</script>rest", "rest"),
        ("<STYLE>p{}</STYLE>kept", "kept"),
        ("a &amp; b &lt;c&gt; &quot;d&quot; &#39;e&#39;&nbsp;f",
         "a & b <c> \"d\" 'e' f"),
        ("  plain   text  ", "plain text"),
        ("<div attr='>v'>x</div>", "v'>x"),  # naive tag regex, documented
    ]
    df = spark.createDataFrame([(i, c) for i, (c, _) in enumerate(cases)],
                               ["i", "raw"])
    import pyspark.sql.functions as F
    got = {r["i"]: r["clean"]
           for r in df.select("i", strip_markup(F.col("raw"))
                              .alias("clean")).collect()}
    for i, (_, want) in enumerate(cases):
        assert got[i] == want, (i, got[i], want)


def test_chunk_with_overlap_windows(spark):
    from toy_vector_db_spark.operators.packing import chunk_with_overlap

    docs = spark.createDataFrame(
        [(1, "a b c d e f g"),   # 7 tokens
         (2, "x y"),             # shorter than one chunk
         (3, "")],               # empty: no chunks
        ["doc_id", "text"])
    rows = chunk_with_overlap(docs, chunk_tokens=4, stride=3).collect()
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r["doc_id"], []).append(r)
    # doc 1: starts 0 and 3 (ceil((7-4)/3)=1 extra chunk)
    got = sorted((r["chunk_id"], r["start_tok"], r["n_tok"], r["chunk_text"])
                 for r in by_doc[1])
    assert got == [(0, 0, 4, "a b c d"), (1, 3, 4, "d e f g")]
    # overlap: token 'd' appears in both chunks
    assert by_doc[2][0]["chunk_text"] == "x y"
    assert len(by_doc[2]) == 1
    assert 3 not in by_doc


def test_chunk_with_overlap_full_coverage(spark):
    """Every token position is covered by at least one chunk and
    consecutive chunks overlap by chunk-stride tokens."""
    from toy_vector_db_spark.operators.packing import chunk_with_overlap

    text = " ".join(f"t{i}" for i in range(50))
    docs = spark.createDataFrame([(1, text)], ["doc_id", "text"])
    rows = sorted(chunk_with_overlap(docs, chunk_tokens=8, stride=5).collect(),
                  key=lambda r: r["chunk_id"])
    covered = set()
    for r in rows:
        covered |= set(range(r["start_tok"], r["start_tok"] + r["n_tok"]))
    assert covered == set(range(50))
    assert all(rows[i + 1]["start_tok"] - rows[i]["start_tok"] == 5
               for i in range(len(rows) - 1))


def test_chunk_with_overlap_validation(spark):
    import pytest as _pytest

    from toy_vector_db_spark.operators.packing import chunk_with_overlap

    docs = spark.createDataFrame([(1, "a")], ["doc_id", "text"])
    with _pytest.raises(ValueError):
        chunk_with_overlap(docs, chunk_tokens=0)
    with _pytest.raises(ValueError):
        chunk_with_overlap(docs, chunk_tokens=4, stride=5)
    with _pytest.raises(ValueError):
        chunk_with_overlap(docs, chunk_tokens=4, stride=0)


def test_chunk_windows_exchange_carries_scalars_only(spark):
    """Plan audit: tokenization must run BEFORE the per-group exchange
    — once, in parallel — so the shuffle carries (id, group, n_tok)
    scalars, never document text, and the |groups|-partition window
    stage is integer-only. (The regression shape: referencing the raw
    token_count expression in the window select shipped text through
    the exchange and re-split every doc on a handful of cores — 31x
    wall for 10x data.)"""
    from toy_vector_db_spark.operators.packing import chunk_windows

    docs = spark.createDataFrame(
        [(i, "some words here", "en") for i in range(10)],
        ["doc_id", "text", "lang"])
    plan = chunk_windows(docs, budget=4)._jdf.queryExecution() \
        .executedPlan().toString()
    # tokenization appears exactly once (the pre-exchange project)
    assert plan.count("split(trim(lower(text") == 1
