"""Structured Streaming over the documents corpus.

The streaming twin of the batch training-data cleaning tier
(workload.corpus_clean_pipeline): documents arrive as files, each
micro-batch is quality-gated with the SAME Column expressions the
batch path uses (functions/text.text_stats_struct — map-only, so they
lift onto a stream unchanged), and exact-duplicate groups are tracked
by fingerprint with a streaming aggregate.

Batch-parity contract (how the value oracle works): with
Trigger.AvailableNow and complete output mode, the per-fingerprint
aggregate over the whole drained input must equal the batch GROUP BY
— every output column is an order-insensitive aggregate (count, min,
max), so the answer is independent of file/partition arrival order.

Scale design: the gate is stateless map-side work; the only state is
one row per DISTINCT fingerprint (the dedup registry a real ingest
keeps anyway), sharded across the state store by fingerprint hash. On
an unbounded feed you would bound that state with a watermark on
ingest time (dropDuplicatesWithinWatermark — see
streaming/events.dedup_stream for the evented version); the documents
table carries no event time, so the bounded-drain registry is the
honest shape here.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.text import fingerprint, text_stats_struct

DOCUMENTS_DDL = ("doc_id LONG, text STRING, lang STRING, "
                 "source STRING, n_chars LONG")


def read_document_stream(spark: SparkSession, path: str,
                         max_files_per_trigger: int | None = 1) -> DataFrame:
    """File-source stream over documents parquet (schema fixed:
    streaming sources cannot infer). cap: max_files_per_trigger=1 is
    the TEST default so fixtures exercise multi-batch paths; a
    deployment sizes it to its micro-batch SLA (None = drain all) —
    it bounds batch size, larger values only mean fewer batches."""
    reader = spark.readStream.schema(DOCUMENTS_DDL)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    return reader.parquet(path)


def quality_gate_stream(docs: DataFrame,
                        q_threshold: float = 0.6) -> DataFrame:
    """Stateless quality gate: docs scoring below ``q_threshold`` are
    dropped; survivors carry ``quality`` and ``fingerprint``. Pure
    per-row Column expressions — identical plan fragment to the batch
    pipeline's gate, just under a streaming scan."""
    scored = docs.withColumn(
        "quality", text_stats_struct(F.col("text"))["quality"])
    return scored.filter(F.col("quality") >= q_threshold) \
        .withColumn("fingerprint", fingerprint(F.col("text")))


def lm_score_stream(docs: DataFrame, model: DataFrame,
                    alpha: float = 0.5) -> DataFrame:
    """Frozen-model LM scoring ON THE STREAM: each arriving document is
    rated under a unigram model fit OFFLINE (``lmscore.unigram_model``)
    — the incremental-ingest quality gate. Per doc:
    (doc_id, n_tokens, avg_neg_logprob), identical math to
    ``lmscore.score_against``.

    Streaming shape: the token explode is map-side; the model counts
    are a STATIC broadcast side of a stream-static left join (unseen
    tokens get the smoothing floor); the model scalars (total tokens
    N, vocab V) join on a constant key — also stream-static, also
    broadcast — so the only stateful operator is the final per-doc
    aggregate (complete mode, one state row per doc in flight; bound
    with a watermark on ingest time for an unbounded feed)."""
    if alpha <= 0:
        raise ValueError(f"alpha must be > 0, got {alpha}")
    counts = model.select("term", F.col("c").alias("__c"))
    scalars = (counts.agg(F.sum("__c").alias("__n"),
                          F.count(F.lit(1)).alias("__v"))
               .withColumn("__k", F.lit(1)))
    from ..operators.lmscore import token_instances
    p = (F.coalesce(F.col("__c"), F.lit(0)) + F.lit(alpha)) \
        / (F.col("__n") + F.lit(alpha) * F.col("__v"))
    return (token_instances(docs)
            .join(F.broadcast(counts), "term", "left")
            .withColumn("__k", F.lit(1))
            .join(F.broadcast(scalars), "__k")
            .groupBy("doc_id")
            .agg(F.count(F.lit(1)).alias("n_tokens"),
                 F.round(F.avg(-F.log(p)), 4).alias("avg_neg_logprob")))


def clean_report_stream(docs: DataFrame,
                        q_threshold: float = 0.6) -> DataFrame:
    """Per-fingerprint dedup registry over the gated stream:
    (fingerprint, canonical_doc_id = smallest id seen, n_copies,
    best_quality). Complete-mode output; every column is an
    order-insensitive aggregate, so the drained result equals the
    batch GROUP BY value-for-value."""
    return (quality_gate_stream(docs, q_threshold)
            .groupBy("fingerprint")
            .agg(F.min("doc_id").alias("canonical_doc_id"),
                 F.count("*").alias("n_copies"),
                 F.round(F.max("quality"), 4).alias("best_quality")))


MEDIA_STREAM_DDL = ("media_id STRING, modality STRING, payload BINARY, "
                    "mime_type STRING, width INT, height INT, "
                    "duration_ms LONG, metadata MAP<STRING,STRING>")


def read_media_stream(spark: SparkSession, path: str,
                      max_files_per_trigger: int | None = 1) -> DataFrame:
    """File-source stream over a media parquet directory (r10 —
    streaming multimodal ingest: a crawler drops payload files, the
    decode pipeline drains them). Schema fixed like
    read_document_stream. cap: max_files_per_trigger=1 is the TEST
    default forcing multi-batch paths; deployments size it to their
    micro-batch SLA (None = drain all)."""
    reader = spark.readStream.schema(MEDIA_STREAM_DDL)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    return reader.parquet(path)


def decode_media_stream(media: DataFrame,
                        jpeg_backend: str | None = None) -> DataFrame:
    """Streaming decode: the BATCH ``decode_media`` applied under a
    streaming scan — mapInPandas is stateless/map-only, so the plan
    fragment is identical and append-mode per-row output needs no
    state store. Quarantine contract unchanged (undecodable payloads
    keep hash-fake stats via the shared dispatch). ``jpeg_backend``:
    see decode_media — oracle-hashed drains pin "numpy"."""
    from ..operators.media import decode_media
    return decode_media(media, jpeg_backend)
