from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from toy_vector_db_spark.functions.text import fingerprint, text_stats_struct
from toy_vector_db_spark.streaming.corpus import (
    clean_report_stream, quality_gate_stream, read_document_stream,
)
from toy_vector_db_spark.streaming.events import run_available_now

DOCS_GLOB = os.path.join("/root/testdata/sf0.001", "documents.parque[t]")


def _batch_report(spark, q_threshold=0.6):
    d = spark.read.parquet(os.path.join("/root/testdata/sf0.001", "documents.parquet"))
    gated = d.withColumn("quality",
                         text_stats_struct(F.col("text"))["quality"]) \
        .filter(F.col("quality") >= q_threshold) \
        .withColumn("fingerprint", fingerprint(F.col("text")))
    return (gated.groupBy("fingerprint")
            .agg(F.min("doc_id").alias("canonical_doc_id"),
                 F.count("*").alias("n_copies"),
                 F.round(F.max("quality"), 4).alias("best_quality")))


def test_gate_is_stateless_filter(spark):
    src = read_document_stream(spark, DOCS_GLOB, max_files_per_trigger=None)
    gated = quality_gate_stream(src)
    assert gated.isStreaming
    assert "fingerprint" in gated.columns and "quality" in gated.columns


def test_clean_report_matches_batch(spark):
    """AvailableNow drain of the per-fingerprint registry must equal
    the batch GROUP BY value-for-value (every output column is an
    order-insensitive aggregate)."""
    src = read_document_stream(spark, DOCS_GLOB, max_files_per_trigger=None)
    run_available_now(clean_report_stream(src), "t_corpus_clean")
    got = {tuple(r) for r in spark.table("t_corpus_clean").collect()}
    want = {tuple(r) for r in _batch_report(spark).collect()}
    assert got == want
    assert len(got) > 0


def test_dup_fingerprints_collapse(spark, tmp_path):
    """Replayed/duplicated documents land in one registry row with the
    smallest id as canonical."""
    rows = [(7, "the quick brown fox jumps over the lazy dog today ok", "en",
             "s", 52),
            (9, "The quick brown fox jumps over the lazy dog today ok.", "en",
             "s", 53)]
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, "
              "n_chars long")
    src_dir = str(tmp_path / "docs")
    df.coalesce(1).write.parquet(src_dir)
    src = read_document_stream(spark, src_dir, max_files_per_trigger=None)
    # threshold 0: both docs pass the gate regardless of quality score
    run_available_now(clean_report_stream(src, q_threshold=0.0),
                      "t_corpus_dups")
    out = spark.table("t_corpus_dups").collect()
    assert len(out) == 1
    assert out[0]["canonical_doc_id"] == 7
    assert out[0]["n_copies"] == 2


def test_lm_score_stream_matches_batch(spark):
    """Frozen-model scoring drained from the stream equals score_against
    on the same batch (identical math, stream-static joins)."""
    from toy_vector_db_spark.operators.lmscore import (
        score_against, unigram_model,
    )
    from toy_vector_db_spark.streaming.corpus import lm_score_stream

    batch = spark.read.parquet(
        os.path.join("/root/testdata/sf0.001", "documents.parquet"))
    model = unigram_model(batch).localCheckpoint(eager=True)
    src = read_document_stream(spark, DOCS_GLOB, max_files_per_trigger=None)
    run_available_now(lm_score_stream(src, model), "t_lm_scores")
    got = {(r["doc_id"], r["n_tokens"], r["avg_neg_logprob"])
           for r in spark.table("t_lm_scores").collect()}
    want = {(r["doc_id"], r["n_tokens"], round(r["avg_neg_logprob"], 4))
            for r in score_against(batch, model).collect()}
    assert got == want and len(got) > 0


def test_lm_score_stream_unseen_tokens_floor(spark, tmp_path):
    """Docs whose tokens the frozen model never saw score at the
    smoothing floor, not an error/null."""
    from toy_vector_db_spark.operators.lmscore import unigram_model
    from toy_vector_db_spark.streaming.corpus import lm_score_stream

    fit = spark.createDataFrame([(1, "aaa bbb")], ["doc_id", "text"])
    model = unigram_model(fit).localCheckpoint(eager=True)
    new_dir = str(tmp_path / "newdocs")
    spark.createDataFrame([(9, "zzz yyy", "en", "s", 7)],
                          "doc_id long, text string, lang string, "
                          "source string, n_chars long") \
        .coalesce(1).write.parquet(new_dir)
    src = read_document_stream(spark, new_dir, max_files_per_trigger=None)
    run_available_now(lm_score_stream(src, model), "t_lm_floor")
    rows = spark.table("t_lm_floor").collect()
    assert len(rows) == 1 and rows[0]["n_tokens"] == 2
    import math
    # floor: -ln(alpha / (N + alpha*V)) with N=2, V=2, alpha=0.5
    assert rows[0]["avg_neg_logprob"] == round(-math.log(0.5 / 3.0), 4)


def test_contamination_report_lifts_onto_stream(spark):
    """The BATCH decontam operator runs unchanged on a streaming train
    side (map-side shingles, stream-static broadcast join, one
    stateful agg) and the drained report equals the batch run."""
    from toy_vector_db_spark.operators.decontam import contamination_report

    batch = spark.read.parquet(
        os.path.join("/root/testdata/sf0.001", "documents.parquet"))
    ev = batch.filter("doc_id % 10 = 0")
    tr_batch = batch.filter("doc_id % 10 <> 0")
    src = read_document_stream(spark, DOCS_GLOB, max_files_per_trigger=None) \
        .filter("doc_id % 10 <> 0")
    run_available_now(contamination_report(src, ev, n=5),
                      "t_decontam_stream")
    got = {tuple(r) for r in spark.table("t_decontam_stream").collect()}
    want = {tuple(r) for r in contamination_report(tr_batch, ev, n=5).collect()}
    assert got == want and len(got) > 0
    assert all(r[1] > 0 for r in got)  # every doc has shingles counted


# ---------------------------------------------------------------------------
# r10: streaming multimodal ingest
# ---------------------------------------------------------------------------


def test_media_decode_stream_multi_batch(spark, tmp_path):
    import numpy as np

    from toy_vector_db_spark.operators.jpeg import synth_jpeg_gray
    from toy_vector_db_spark.streaming.corpus import (
        decode_media_stream, read_media_stream)
    from toy_vector_db_spark.streaming.events import run_available_now
    src = str(tmp_path / "media_src")
    # cap: 3 files -> 3 micro-batches under maxFilesPerTrigger=1 (a
    # fixture-size layout knob, not a scale knob)
    synth_jpeg_gray(spark, n=9).repartition(3) \
        .write.mode("overwrite").parquet(src)
    run_available_now(
        decode_media_stream(read_media_stream(spark, src)),
        "t_media_stream", output_mode="append")
    rows = {r["media_id"]: r for r in
            spark.table("t_media_stream").collect()}
    assert len(rows) == 9
    for i in range(9):
        exp = np.mean([(i * 37 + k * 11) % 251 for k in range(8)])
        r = rows[f"jpgg_{i}"]
        assert (r["width"], r["height"]) == (32, 16)
        assert abs(r["mean_intensity"] - exp) < 1e-9
