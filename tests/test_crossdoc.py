from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from toy_vector_db_spark.operators.crossdoc import (
    filter_boilerplate, shared_shingle_stats, top_shared_shingles,
)

DOCS = [
    # 1 and 2: identical after normalization -> every shingle shared
    (1, "alpha beta gamma delta epsilon"),
    (2, "Alpha beta gamma delta epsilon."),
    # 3: shares the leading 3-gram with 1/2, rest unique
    (3, "alpha beta gamma zeta eta theta"),
    # 4: fully unique
    (4, "one two three four five six"),
    # 5: shorter than k words -> whole text is the single shingle
    (5, "solo"),
]


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(DOCS, ["doc_id", "text"])


def test_shared_shingle_stats(docs):
    rows = {r["doc_id"]: r for r in shared_shingle_stats(docs).collect()}
    assert set(rows) == {1, 2, 3, 4, 5}
    # 5-word doc at k=3 -> 3 shingles
    assert rows[1]["n_shingles"] == 3
    assert rows[1]["n_shared"] == 3 and rows[1]["shared_frac"] == 1.0
    assert rows[2]["n_shared"] == 3     # the normalized twin
    # doc 3 shares exactly "alpha beta gamma"
    assert rows[3]["n_shingles"] == 4
    assert rows[3]["n_shared"] == 1
    assert rows[3]["shared_frac"] == pytest.approx(0.25)
    assert rows[4]["n_shared"] == 0 and rows[4]["shared_frac"] == 0.0
    # short doc: one whole-text shingle, shared with nobody
    assert rows[5]["n_shingles"] == 1 and rows[5]["n_shared"] == 0


def test_min_docs_threshold(docs):
    # min_docs=3: "alpha beta gamma" occurs in docs 1,2,3 -> still
    # shared; the rest of 1/2's shingles occur in only 2 docs -> not
    rows = {r["doc_id"]: r
            for r in shared_shingle_stats(docs, min_docs=3).collect()}
    assert rows[1]["n_shared"] == 1
    assert rows[3]["n_shared"] == 1


def test_min_docs_validation(docs):
    with pytest.raises(ValueError, match="min_docs"):
        shared_shingle_stats(docs, min_docs=0)


def test_filter_boilerplate(docs):
    kept = sorted(r["doc_id"]
                  for r in filter_boilerplate(docs,
                                              max_shared_frac=0.5).collect())
    # 1 and 2 are 100% corpus-repeated -> dropped; 3 (25%), 4, 5 stay
    assert kept == [3, 4, 5]
    # schema passthrough: original columns survive
    assert filter_boilerplate(docs).columns == ["doc_id", "text"]


def test_top_shared_shingles(docs):
    top = top_shared_shingles(docs, limit=2).collect()
    assert top[0]["sh"] == "alpha beta gamma" and top[0]["n_docs"] == 3
    # deterministic tie-break: count desc then shingle asc
    assert top[1]["n_docs"] == 2
