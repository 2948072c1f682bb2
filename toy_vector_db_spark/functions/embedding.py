"""Deterministic mock embedding pipeline.

Reference: /root/reference/pkg/embedding/
  - Mock "all-MiniLM-L6-v2" model (models/huggingface.go:36-87): sha256
    of the text seeds a PRNG that draws 384 floats in [-1, 1], then
    L2-normalizes. Deterministic per text.
  - Text processor (pipeline/processor.go:21-40): pass-through.
  - JSON processor (pipeline/processor.go:43-78): map -> "k: v" pairs
    joined by spaces — Go map iteration makes the reference's output
    NONDETERMINISTIC; we sort keys (SURVEY §2.7 F12 fix).
  - EMBEDDING() SQL function (sql/executor/functions.go:45-92) exists in
    the reference but is never registered (:95-97 registers only COUNT);
    here ``register_udfs`` actually installs it.

Parity scope (SURVEY §7 risk 5): Go's math/rand stream cannot be
reproduced bit-for-bit in Python, and the oracle can't run it either.
The contract is determinism + 384 dims + unit norm, which IS testable.

The embedder is a pandas UDF: Arrow-batched, one Python roundtrip per
~10k rows instead of per row. Hashing+PRNG per text is pure NumPy.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.functions import pandas_udf

EMBEDDING_DIM = 384  # mocked all-MiniLM-L6-v2 (huggingface.go:31)


def embed_one(text: str, dim: int = EMBEDDING_DIM) -> np.ndarray:
    """sha256(text) -> seed -> uniform[-1,1)^dim -> L2 normalize.
    Same shape/contract as huggingface.go:36-87."""
    digest = hashlib.sha256(text.encode("utf-8")).digest()
    seed = int.from_bytes(digest[:4], "big")
    rng = np.random.RandomState(seed)
    v = rng.uniform(-1.0, 1.0, dim)
    norm = float(np.linalg.norm(v))
    if norm > 0:
        v = v / norm
    return v.astype(np.float32)


# explicit DataType (not a DDL string): keeps the UDF constructible
# before any SparkSession exists
@pandas_udf(T.ArrayType(T.FloatType()))
def embed_text(texts: pd.Series) -> pd.Series:
    """EMBEDDING(text) as an Arrow-batched pandas UDF (F8/F9/F10)."""
    return texts.map(lambda t: embed_one("" if t is None else str(t)))


def register_udfs(spark: SparkSession) -> None:
    """Install EMBEDDING for SQL use — completing the reference's
    orphaned registration (functions.go:95-97)."""
    spark.udf.register("embedding", embed_text)


def process_text(col: Column) -> Column:
    """Text processor: pass-through to string (processor.go:21-40)."""
    return col.cast("string")


def process_json(col: Column) -> Column:
    """JSON object -> "k: v" pairs joined by spaces, keys sorted for
    determinism (processor.go:43-78; sorting fixes the Go map-order
    nondeterminism). Pure Column expr — no UDF."""
    m = F.from_json(col, "map<string,string>")
    entries = F.array_sort(F.map_entries(m))  # struct sort = key order
    return F.concat_ws(
        " ", F.transform(entries,
                         lambda e: F.concat(e["key"], F.lit(": "), e["value"])))


def embed_documents(docs: DataFrame, content_col: str = "text",
                    content_type: str = "text",
                    out_col: str = "vector") -> DataFrame:
    """Document ingest (D7, cmd_embed.go:21-120): process content by
    type, append the embedding column."""
    from ..sources.tables import ensure_parallelism
    col = F.col(content_col)
    processed = process_json(col) if content_type == "json" else process_text(col)
    return ensure_parallelism(docs).withColumn(out_col, embed_text(processed))


def search_text(corpus: DataFrame, text: str, k: int = 10,
                metric: str = "cosine", vec_col: str = "vector",
                content_type: str = "text"):
    """search-text composition (K11, cmd_search_text.go:15-118): embed
    the free-text query driver-side (one string — no cluster roundtrip),
    then run exact knn against the already-embedded corpus. No SQL
    string round-trip, unlike the reference (:39-50)."""
    from ..operators.knn import knn
    qvec = [float(x) for x in embed_one(text)]
    return knn(corpus, qvec, k=k, metric=metric, vec_col=vec_col)
