from __future__ import annotations

import math

import pytest

from toy_vector_db_spark.operators.drift import (
    divergence_summary, term_divergence, top_divergent_terms,
)


@pytest.fixture(scope="module")
def corpora(spark):
    ref = spark.createDataFrame(
        [(1, "aa bb aa"), (2, "aa cc")], ["doc_id", "text"])
    cand = spark.createDataFrame(
        [(3, "aa zz zz"), (4, "zz")], ["doc_id", "text"])
    return ref, cand


def test_identical_corpora_near_zero_js(spark):
    d = spark.createDataFrame([(1, "x y z")], ["doc_id", "text"])
    row = divergence_summary(d, d).collect()[0]
    assert row["js_divergence"] == pytest.approx(0.0, abs=1e-12)
    assert row["n_terms_ref_only"] == 0 == row["n_terms_cand_only"]


def test_term_table_union_vocab(corpora):
    ref, cand = corpora
    rows = {r["term"]: r for r in term_divergence(ref, cand).collect()}
    assert set(rows) == {"aa", "bb", "cc", "zz"}
    assert rows["zz"]["c_ref"] == 0 and rows["zz"]["c_cand"] == 3
    assert all(r["js_contrib"] >= 0 for r in rows.values())


def test_summary_matches_contrib_sum_and_bound(corpora):
    ref, cand = corpora
    s = divergence_summary(ref, cand).collect()[0]
    contribs = sum(r["js_contrib"]
                   for r in term_divergence(ref, cand).collect())
    assert s["js_divergence"] == pytest.approx(contribs, rel=1e-9)
    assert 0 < s["js_divergence"] < math.log(2)
    assert s["n_terms_ref_only"] == 2   # bb, cc
    assert s["n_terms_cand_only"] == 1  # zz


def test_top_divergent_direction(corpora):
    ref, cand = corpora
    top = top_divergent_terms(ref, cand, k=2).collect()
    assert top[0]["term"] == "zz" and top[0]["direction"] == "cand"
    with pytest.raises(ValueError):
        top_divergent_terms(ref, cand, k=0)
    with pytest.raises(ValueError):
        term_divergence(ref, cand, alpha=0.0)


def test_embedding_drift_identical_and_shifted(spark):
    from toy_vector_db_spark.operators.drift import embedding_drift

    ref = spark.createDataFrame(
        [(1, 0, [1.0, 0.0]), (2, 0, [1.0, 0.2]),
         (3, 1, [0.0, 1.0])],
        "vec_id long, label int, embedding array<double>")
    same = embedding_drift(ref, ref).collect()
    assert all(r["centroid_dist"] == pytest.approx(0.0, abs=1e-12)
               for r in same)
    assert all(r["centroid_cos"] == pytest.approx(1.0, rel=1e-12)
               for r in same)
    # shift label 1's vectors: drift shows up only there
    cand = spark.createDataFrame(
        [(4, 0, [1.0, 0.0]), (5, 0, [1.0, 0.2]),
         (6, 1, [1.0, 0.0])],
        "vec_id long, label int, embedding array<double>")
    rows = {r["label"]: r for r in embedding_drift(ref, cand).collect()}
    assert rows[0]["centroid_dist"] == pytest.approx(0.0, abs=1e-12)
    assert rows[1]["centroid_dist"] == pytest.approx(2 ** 0.5, rel=1e-9)
    assert rows[1]["centroid_cos"] == pytest.approx(0.0, abs=1e-12)
    assert rows[1]["n_ref"] == 1 and rows[1]["n_cand"] == 1
