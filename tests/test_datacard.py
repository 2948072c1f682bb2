from __future__ import annotations

import pytest

from toy_vector_db_spark.operators.datacard import corpus_card


def test_corpus_card_metrics(spark):
    docs = spark.createDataFrame(
        [(1, "one two three four", "en"),
         (2, "one two three four", "en"),   # exact dup of 1
         (3, "", "de"),
         (4, "five six", "de")],
        ["doc_id", "text", "lang"])
    card = {r["metric"]: r["value"] for r in corpus_card(docs).collect()}
    assert card["n_docs"] == 4.0
    assert card["n_tokens"] == 10.0
    assert card["empty_rate"] == 0.25
    assert card["exact_dup_rate"] == 0.25  # 3 distinct fingerprints of 4
    assert card["lang_share:en"] == 0.5
    assert card["lang_share:de"] == 0.5
    assert card["tokens_p50"] == pytest.approx(3.0)  # [0,2,4,4] -> 3
    assert 0.0 <= card["mean_quality"] <= 1.0


def test_corpus_card_without_lang(spark):
    docs = spark.createDataFrame([(1, "a b c")], ["doc_id", "text"])
    card = {r["metric"]: r["value"]
            for r in corpus_card(docs, lang_col=None).collect()}
    assert "n_docs" in card
    assert not any(m.startswith("lang_share") for m in card)
