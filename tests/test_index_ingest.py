"""Streaming index maintenance (streaming/index_ingest.py): a saved
ANN index stays fresh by streaming new vectors through the same
map-only index transform into a sibling file-sink layout.

Contract: after draining the stream, the loaded index is
indistinguishable from a batch build over bootstrap + delta (the
transforms are deterministic), and re-running the drained stream adds
nothing (file-sink exactly-once)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from toy_vector_db_spark.operators.ann import LshIndex
from toy_vector_db_spark.operators.pq import IvfPqIndex
from toy_vector_db_spark.streaming.index_ingest import (
    load_fresh, start_index_ingest)

SF = "/root/testdata/sf0.001"
SPLIT_ID = 300


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet(f"{SF}/embeddings.parquet").cache()


def _drain(index, spark, emb, tmp_path, name):
    """Save the bootstrap index, stream the delta in (2 files -> 2
    micro-batches), return the ingest dirs."""
    path = str(tmp_path / f"{name}_idx")
    ckpt = str(tmp_path / f"{name}_ckpt")
    src = str(tmp_path / f"{name}_src")
    index.save(path)
    emb.filter(F.col("vec_id") >= SPLIT_ID).repartition(2) \
        .write.mode("overwrite").parquet(src)
    stream = (spark.readStream.schema(emb.schema)
              .option("maxFilesPerTrigger", 1).parquet(src))
    q = start_index_ingest(index, stream, path, ckpt, available_now=True)
    q.awaitTermination(120)
    return path, ckpt, src


def test_lsh_stream_ingest_matches_batch_build(spark, emb, tmp_path):
    boot = emb.filter(F.col("vec_id") < SPLIT_ID)
    idx = LshIndex.build(boot, n_planes=6)
    path, ckpt, src = _drain(idx, spark, emb, tmp_path, "lsh")

    fresh = load_fresh(LshIndex, spark, path)
    assert fresh.size() == emb.count()

    # deterministic planes: the streamed index IS the full batch build
    full = LshIndex.build(emb, n_planes=6)
    qvec = list(emb.filter(F.col("vec_id") == 450).first()["embedding"])
    a = [(r["vec_id"], round(r["distance"], 6))
         for r in fresh.search(qvec, k=5, metric="cosine").collect()]
    b = [(r["vec_id"], round(r["distance"], 6))
         for r in full.search(qvec, k=5, metric="cosine").collect()]
    assert a == b
    # the query row arrived via the stream and is its own best match
    assert a[0][0] == 450

    # exactly-once: draining the same source+checkpoint again is a no-op
    stream = (spark.readStream.schema(emb.schema)
              .option("maxFilesPerTrigger", 1).parquet(src))
    q = start_index_ingest(idx, stream, path, ckpt, available_now=True)
    q.awaitTermination(120)
    assert load_fresh(LshIndex, spark, path).size() == emb.count()


def test_ivfpq_stream_ingest_partitioned(spark, emb, tmp_path):
    boot = emb.filter(F.col("vec_id") < SPLIT_ID)
    idx = IvfPqIndex.build_deterministic(boot, n_centroids=4, m=4, ks=4)
    path, ckpt, src = _drain(idx, spark, emb, tmp_path, "ivfpq")

    fresh = load_fresh(IvfPqIndex, spark, path)
    assert fresh.size() == emb.count()
    # streamed rows carry cluster + code from the FROZEN params: with
    # exact re-rank the streamed row is its own best match (ADC alone
    # ranks by quantization error, which a ks=4 codebook can't pin)
    qvec = list(emb.filter(F.col("vec_id") == 420).first()["embedding"])
    hits = [r["vec_id"] for r in
            fresh.search(qvec, k=3, nprobe=4, rerank=10).collect()]
    assert hits[0] == 420
    # partition layout preserved on the stream side too
    import glob
    assert glob.glob(f"{path}/clusters_stream/__cluster=*")
