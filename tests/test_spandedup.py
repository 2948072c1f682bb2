from __future__ import annotations

import pytest

from toy_vector_db_spark.operators.spandedup import doc_spans, span_dedup

# span_tokens=2 for readable cases. Doc 1 and 2 share the span
# "alpha beta" (and 2 repeats it internally); doc 3 is clean.
DOCS = [
    (1, "alpha beta gamma delta"),
    (2, "alpha beta alpha beta epsilon zeta"),
    (3, "one two three four"),
    (4, ""),
    (5, "alpha beta"),
]


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(DOCS, ["doc_id", "text"])


def test_doc_spans_chunking(docs):
    rows = sorted((r["doc_id"], r["pos"], r["span"])
                  for r in doc_spans(docs, span_tokens=2).collect())
    assert (1, 0, "alpha beta") in rows and (1, 1, "gamma delta") in rows
    # repeats stay distinct instances
    assert (2, 0, "alpha beta") in rows and (2, 1, "alpha beta") in rows
    # empty doc -> one empty span
    assert (4, 0, "") in rows
    with pytest.raises(ValueError, match="span_tokens"):
        doc_spans(docs, span_tokens=0)


def test_span_dedup_first_occurrence_wins(docs):
    out = {r["doc_id"]: r for r in span_dedup(docs, span_tokens=2).collect()}
    # doc 1 holds the first "alpha beta" -> untouched
    assert out[1]["clean_text"] == "alpha beta gamma delta"
    assert out[1]["n_removed"] == 0
    # doc 2 loses BOTH its copies (first occurrence lives in doc 1)
    assert out[2]["clean_text"] == "epsilon zeta"
    assert out[2]["n_spans"] == 3 and out[2]["n_removed"] == 2
    # doc 3 untouched
    assert out[3]["n_removed"] == 0
    # doc 5 is entirely a duplicate span -> rebuilt empty
    assert out[5]["clean_text"] == "" and out[5]["n_removed"] == 1


def test_empty_docs_pass_through(docs):
    out = {r["doc_id"]: r for r in span_dedup(docs, span_tokens=2).collect()}
    assert out[4]["clean_text"] == "" and out[4]["n_removed"] == 0


def test_no_duplicates_is_identity(spark):
    docs = spark.createDataFrame(
        [(1, "a b c d"), (2, "e f g h")], ["doc_id", "text"])
    out = {r["doc_id"]: r for r in span_dedup(docs, span_tokens=2).collect()}
    assert out[1]["clean_text"] == "a b c d"
    assert out[2]["clean_text"] == "e f g h"
    assert all(r["n_removed"] == 0 for r in out.values())
