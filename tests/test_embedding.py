"""Embedding pipeline contract: determinism, 384 dims, unit norm
(reference pkg/embedding/embedding_test.go:11-51, FIXTURES.md F5)."""

from __future__ import annotations

import math

import numpy as np
import pytest
from pyspark.sql import functions as F

from toy_vector_db_spark.functions.embedding import (
    EMBEDDING_DIM, embed_documents, embed_one, embed_text, process_json,
    register_udfs, search_text,
)


def test_embed_one_contract():
    v1, v2 = embed_one("hello world"), embed_one("hello world")
    assert np.array_equal(v1, v2)                     # deterministic
    assert v1.shape == (EMBEDDING_DIM,)               # 384 dims
    assert np.linalg.norm(v1) == pytest.approx(1.0, abs=1e-5)  # unit norm
    assert not np.array_equal(v1, embed_one("hello worlds"))


def test_embed_udf_matches_driver_side(spark):
    df = spark.createDataFrame([("a", "some text"), ("b", "other text")],
                               ["id", "text"])
    rows = df.select("id", embed_text("text").alias("v")).collect()
    got = {r["id"]: np.array(r["v"]) for r in rows}
    assert np.allclose(got["a"], embed_one("some text"), atol=1e-6)
    assert np.allclose(got["b"], embed_one("other text"), atol=1e-6)


def test_register_udfs_sql(spark):
    register_udfs(spark)
    row = spark.sql("SELECT embedding('hi') AS v").first()
    assert len(row["v"]) == EMBEDDING_DIM
    norm = math.sqrt(sum(x * x for x in row["v"]))
    assert norm == pytest.approx(1.0, abs=1e-5)


def test_process_json_sorted_deterministic(spark):
    # Go map iteration made the reference nondeterministic
    # (processor.go:67-73); ours sorts keys.
    df = spark.createDataFrame(
        [('{"b": "2", "a": "1", "c": "3"}',)], ["j"])
    got = df.select(process_json(F.col("j")).alias("t")).first()["t"]
    assert got == "a: 1 b: 2 c: 3"


def test_embed_documents_and_search_text(spark):
    docs = spark.createDataFrame(
        [(1, "the quick brown fox"), (2, "lorem ipsum dolor"),
         (3, "completely different content")], ["doc_id", "text"])
    emb = embed_documents(docs)
    assert emb.columns == ["doc_id", "text", "vector"]
    # searching with a stored doc's exact text ranks that doc first at
    # distance ~0 (deterministic embedder)
    res = search_text(emb, "lorem ipsum dolor", k=2).collect()
    assert res[0]["doc_id"] == 2
    assert res[0]["distance"] == pytest.approx(0.0, abs=1e-5)


def test_embed_json_documents(spark):
    docs = spark.createDataFrame(
        [(1, '{"title": "x", "body": "y"}')], ["doc_id", "text"])
    emb = embed_documents(docs, content_type="json")
    v = emb.first()["vector"]
    assert np.allclose(np.array(v), embed_one("body: y title: x"), atol=1e-6)
