"""Streaming similarity search (streaming/search.py): an unbounded
query feed served against a static IVF index.

Contract: drain a multi-micro-batch query stream and the sink holds
exactly the batch knn_join_ivf answer over the same query set — same
rows, same distances — and a re-run of the drained stream changes
nothing (idempotent foreachBatch sink)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from toy_vector_db_spark.operators.ann import IvfIndex
from toy_vector_db_spark.operators.knn import knn_join_ivf
from toy_vector_db_spark.streaming.search import (
    read_search_results, start_streaming_search)

SF = "/root/testdata/sf0.001"
QUERY_IDS = [1, 2, 7, 11, 42, 101]


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet(f"{SF}/embeddings.parquet").cache()


@pytest.fixture(scope="module")
def idx(emb):
    return IvfIndex.build_deterministic(emb, n_centroids=8)


def _queries(emb):
    return emb.filter(F.col("vec_id").isin(*QUERY_IDS)).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("query_vec"))


def _norm(rows):
    return sorted((r["query_id"], r["vec_id"], round(r["distance"], 6))
                  for r in rows)


def _drain(spark, emb, idx, tmp_path, name):
    src = str(tmp_path / f"{name}_src")
    out = str(tmp_path / f"{name}_out")
    ckpt = str(tmp_path / f"{name}_ckpt")
    qdf = _queries(emb)
    qdf.repartition(3).write.mode("overwrite").parquet(src)
    stream = (spark.readStream.schema(qdf.schema)
              .option("maxFilesPerTrigger", 1).parquet(src))
    q = start_streaming_search(idx, stream, out, ckpt, k=5, nprobe=3,
                               available_now=True)
    q.awaitTermination(120)
    return src, out, ckpt


def test_streamed_search_matches_batch_join(spark, emb, idx, tmp_path):
    src, out, ckpt = _drain(spark, emb, idx, tmp_path, "parity")
    streamed = _norm(read_search_results(spark, out).collect())
    batch = _norm(knn_join_ivf(_queries(emb), idx, k=5, nprobe=3).collect())
    assert streamed == batch
    assert len(streamed) == len(QUERY_IDS) * 5

    # drained stream: re-running adds nothing (checkpoint + idempotent
    # per-batch-partition overwrite)
    stream = (spark.readStream.schema(_queries(emb).schema)
              .option("maxFilesPerTrigger", 1).parquet(src))
    q2 = start_streaming_search(idx, stream, out, ckpt, k=5, nprobe=3,
                                available_now=True)
    q2.awaitTermination(120)
    assert _norm(read_search_results(spark, out).collect()) == streamed


def test_stream_static_join_carries_no_state(spark, emb, idx, tmp_path):
    # the scored stream must be a stateless stream-static join: no
    # state store operators in the streaming plan
    from toy_vector_db_spark.streaming.search import score_query_stream
    src = str(tmp_path / "stateless_src")
    qdf = _queries(emb)
    qdf.write.mode("overwrite").parquet(src)
    stream = spark.readStream.schema(qdf.schema).parquet(src)
    scored = score_query_stream(idx, stream, nprobe=2)
    assert scored.isStreaming
    plan = scored._jdf.queryExecution().analyzed().toString()
    assert "stateStore" not in plan.lower()
