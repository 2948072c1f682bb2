"""Multimodal columns: image/audio/video as opaque binary + typed
metadata (schema.MEDIA_SCHEMA), with decode / feature-extract / resize /
frame-sample operators.

Beyond-parity training-data-pipeline tier. The Spark-side plumbing —
schema, Arrow batch shape, mapInPandas signatures, partitioning — is
real and tested. The codec layer is STUBBED: this environment ships no
image/audio libraries, so ``decode_media`` uses a deterministic fake
decoder (clearly marked below) unless a real backend is importable.
Swapping in Pillow/torchaudio/PyAV means replacing ``_decode_backend``
only; every plan shape stays identical.

Scale notes: payloads never shuffle — decode/feature UDFs are map-only
(mapInPandas, one Arrow batch at a time, bounded memory via
``maxRecordsPerBatch``); frame sampling is a pure Column explode.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..schema import MEDIA_SCHEMA

FEATURE_DIM = 64

DECODED_DDL = ("media_id STRING, modality STRING, n_bytes LONG, "
               "width INT, height INT, mean_intensity DOUBLE")
FEATURES_DDL = f"media_id STRING, features ARRAY<FLOAT>"


def synth_media(spark: SparkSession, n: int = 100, modality: str = "image",
                seed: int = 42) -> DataFrame:
    """Deterministic synthetic media table: payload bytes derived from
    sha2 chains, JVM-side (no Python in the generator)."""
    base = spark.range(n).select(
        F.concat(F.lit(f"{modality}_"), F.col("id").cast("string")).alias("media_id"),
        F.lit(modality).alias("modality"),
        F.to_binary(F.concat(*[
            F.sha2(F.concat(F.lit(f"{seed}:{i}:"), F.col("id").cast("string")), 256)
            for i in range(4)]), F.lit("hex")).alias("payload"),
        F.lit("application/octet-stream").alias("mime_type"),
        (F.pmod(F.col("id"), 8) * 64 + 64).cast("int").alias("width"),
        (F.pmod(F.col("id"), 6) * 64 + 64).cast("int").alias("height"),
        (F.pmod(F.col("id"), 30) * 1000 + 1000).alias("duration_ms"),
        F.create_map(F.lit("source"), F.lit("synthetic")).alias("metadata"))
    _ = MEDIA_SCHEMA  # canonical schema; synth output matches it by construction
    return base


# ---------------------------------------------------------------------------
# Codec backend — STUB
# ---------------------------------------------------------------------------


def _decode_backend(payload: bytes, modality: str) -> dict:
    """STUB DECODER. A real deployment implements this with Pillow /
    torchaudio / PyAV; none are available in this container, so we
    raise for real media and fall back to a deterministic fake for
    synthetic payloads (keeps the full pipeline testable end-to-end).
    """
    try:  # real backend, if ever installed
        import PIL.Image  # noqa: F401
        raise NotImplementedError(
            "real image decode not wired up: plug Pillow into _decode_backend")
    except ImportError:
        pass
    # deterministic fake: statistics derived from the payload bytes —
    # stable across runs/engines, shaped like real decoder output.
    # Hashes the *hex* form so an ANSI-SQL oracle (sha256 over VARCHAR)
    # can reproduce width/height value-for-value.
    arr = np.frombuffer(payload, dtype=np.uint8)
    h = hashlib.sha256(payload.hex().encode()).digest()
    return {
        "n_bytes": int(arr.size),
        "width": int.from_bytes(h[0:2], "big") % 1920 + 1,
        "height": int.from_bytes(h[2:4], "big") % 1080 + 1,
        "mean_intensity": float(arr.mean()) if arr.size else 0.0,
    }


def decode_media(df: DataFrame) -> DataFrame:
    """Decode payloads to typed stats via mapInPandas (Arrow-batched,
    map-only — no shuffle; executors stream one batch at a time)."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out = []
            for mid, modality, payload in zip(pdf["media_id"], pdf["modality"],
                                              pdf["payload"]):
                d = _decode_backend(bytes(payload or b""), modality)
                out.append((mid, modality, d["n_bytes"], d["width"],
                            d["height"], d["mean_intensity"]))
            yield pd.DataFrame(out, columns=["media_id", "modality", "n_bytes",
                                             "width", "height", "mean_intensity"])

    return df.select("media_id", "modality", "payload") \
        .mapInPandas(batches, DECODED_DDL)


def extract_media_features(df: DataFrame, dim: int = FEATURE_DIM) -> DataFrame:
    """Payload -> unit-norm feature vector (deterministic sha-seeded,
    same contract as the text embedder) via mapInPandas."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            feats = []
            for payload in pdf["payload"]:
                digest = hashlib.sha256(bytes(payload or b"")).digest()
                rng = np.random.RandomState(int.from_bytes(digest[:4], "big"))
                v = rng.uniform(-1, 1, dim)
                n = np.linalg.norm(v)
                feats.append((v / n if n else v).astype(np.float32))
            yield pd.DataFrame({"media_id": pdf["media_id"], "features": feats})

    return df.select("media_id", "payload").mapInPandas(batches, FEATURES_DDL)


def frame_sample(df: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame-sampling plan: one row per sampled frame offset.
    Pure Column explode — the (stubbed) per-frame decode would be a
    map-only UDF over (payload, frame_ms)."""
    return (df.filter(F.col("modality") == "video")
            .select("media_id", "duration_ms",
                    F.explode(F.sequence(
                        F.lit(0), F.col("duration_ms") - 1,
                        F.lit(every_ms))).alias("frame_ms")))


def resize_plan(df: DataFrame, target_w: int, target_h: int) -> DataFrame:
    """Resize metadata plan (letterbox scale computation JVM-side; the
    pixel resample itself belongs to the stubbed codec layer)."""
    scale = F.least(target_w / F.col("width"), target_h / F.col("height"))
    return df.withColumn("scale", scale) \
             .withColumn("out_w", F.floor(F.col("width") * scale).cast("int")) \
             .withColumn("out_h", F.floor(F.col("height") * scale).cast("int"))
