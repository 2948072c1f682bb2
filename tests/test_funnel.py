from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from toy_vector_db_spark.operators.funnel import apply_funnel, funnel_report

DOCS = [
    (1, "good long doc", 1),
    (2, "", 1),            # fails rule 0
    (3, "short", 1),       # fails rule 1
    (4, "good long doc", 0),  # fails rule 2
    (5, "also long text", 1),
]


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(DOCS, ["doc_id", "text", "flag"])


def _rules():
    return [
        ("nonempty", F.length(F.col("text")) > 0),
        ("min_len", F.length(F.col("text")) >= 10),
        ("flagged", F.col("flag") == 1),
    ]


def test_funnel_report_cascade(docs):
    rows = {r["rule"]: r for r in funnel_report(docs, _rules()).collect()}
    assert (rows["nonempty"]["n_evaluated"],
            rows["nonempty"]["n_dropped"],
            rows["nonempty"]["n_surviving"]) == (5, 1, 4)
    assert (rows["min_len"]["n_evaluated"],
            rows["min_len"]["n_dropped"],
            rows["min_len"]["n_surviving"]) == (4, 1, 3)
    assert (rows["flagged"]["n_evaluated"],
            rows["flagged"]["n_dropped"],
            rows["flagged"]["n_surviving"]) == (3, 1, 2)


def test_apply_funnel_matches_report_tail(docs):
    kept = {r["doc_id"] for r in apply_funnel(docs, _rules()).collect()}
    assert kept == {1, 5}
    tail = funnel_report(docs, _rules()).collect()[-1]["n_surviving"]
    assert tail == len(kept)


def test_null_predicate_counts_as_drop(spark):
    d = spark.createDataFrame([(1, None), (2, "x")], ["doc_id", "text"])
    rows = funnel_report(d, [("nonnull_len",
                              F.length(F.col("text")) > 0)]).collect()
    assert rows[0]["n_dropped"] == 1 and rows[0]["n_surviving"] == 1
    assert {r["doc_id"]
            for r in apply_funnel(d, [("nonnull_len",
                                       F.length(F.col("text")) > 0)])
            .collect()} == {2}


def test_empty_rules_rejected(docs):
    with pytest.raises(ValueError):
        funnel_report(docs, [])
    with pytest.raises(ValueError):
        apply_funnel(docs, [])
