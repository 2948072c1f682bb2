"""Canonical schemas + hand-built correctness fixtures.

Reference data model (SURVEY.md §1):
- Vector{ID string, Values []float32, Metadata map[string]string}
  (/root/reference/pkg/core/vector/vector.go:18-23) — ``dimension`` is
  derivable, so we do NOT store it.
- Document{ID, Content, ContentType, Vector, Metadata, CreatedAt, UpdatedAt}
  (/root/reference/pkg/embedding/document.go:18-26).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

# One DataFrame per collection; Parquet gives the columnar layout the
# reference's one-file-per-vector .vec format lacks.
VECTORS_SCHEMA = T.StructType([
    T.StructField("id", T.StringType(), nullable=False),
    T.StructField("embedding", T.ArrayType(T.FloatType()), nullable=True),
    T.StructField("metadata", T.MapType(T.StringType(), T.StringType()), nullable=True),
])

DOCUMENTS_SCHEMA = T.StructType([
    T.StructField("doc_id", T.StringType(), nullable=False),
    T.StructField("content", T.StringType(), nullable=True),
    T.StructField("content_type", T.StringType(), nullable=True),  # text | json
    T.StructField("vector", T.ArrayType(T.FloatType()), nullable=True),
    T.StructField("metadata", T.MapType(T.StringType(), T.StringType()), nullable=True),
    T.StructField("created_at", T.TimestampType(), nullable=True),
    T.StructField("updated_at", T.TimestampType(), nullable=True),
])

# Multimodal extension: opaque binary payload + typed metadata.
MEDIA_SCHEMA = T.StructType([
    T.StructField("media_id", T.StringType(), nullable=False),
    T.StructField("modality", T.StringType(), nullable=False),  # image|audio|video
    T.StructField("payload", T.BinaryType(), nullable=True),
    T.StructField("mime_type", T.StringType(), nullable=True),
    T.StructField("width", T.IntegerType(), nullable=True),
    T.StructField("height", T.IntegerType(), nullable=True),
    T.StructField("duration_ms", T.LongType(), nullable=True),
    T.StructField("metadata", T.MapType(T.StringType(), T.StringType()), nullable=True),
])


def five_vectors(spark: SparkSession) -> DataFrame:
    """Canonical 5-vector knn fixture (reference pkg/sql/sql_test.go:218-235)."""
    rows = [
        ("vec1", [1.0, 0.0, 0.0], {}),
        ("vec2", [0.0, 1.0, 0.0], {}),
        ("vec3", [0.0, 0.0, 1.0], {}),
        ("vec4", [1.0, 1.0, 0.0], {}),
        ("vec5", [0.0, 1.0, 1.0], {}),
    ]
    return spark.createDataFrame(rows, VECTORS_SCHEMA)


def vectors_meta(spark: SparkSession) -> DataFrame:
    """Metadata-filtering fixture (FIXTURES.md F2): shared id prefixes,
    category/tags keys, and rows with *missing* keys to pin the
    missing-key semantics of = (false) and != (true)
    (reference pkg/sql/executor/executor.go:698-700 vs :716-718)."""
    rows = [
        ("test1", [1.0, 0.0, 0.0, 0.0], {"category": "image", "tags": "important,urgent"}),
        ("test2", [0.0, 1.0, 0.0, 0.0], {"category": "text"}),
        ("prod1", [0.0, 0.0, 1.0, 0.0], {"tags": "archive"}),
        ("prod2", [0.0, 0.0, 0.0, 1.0], {}),
        ("test3", [1.0, 1.0, 0.0, 0.0], {"category": "image", "tags": "important"}),
    ]
    return spark.createDataFrame(rows, VECTORS_SCHEMA)
