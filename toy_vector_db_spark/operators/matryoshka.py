"""Matryoshka (prefix-dimension) two-stage exact search.

Public recipe (Kusupati et al., "Matryoshka Representation Learning",
NeurIPS 2022; adopted by e.g. OpenAI/Nomic embedding APIs): an
MRL-trained embedding's leading dimensions form a usable
lower-dimensional embedding, so search can run the cheap pass on a
short PREFIX of every vector and rerank only the surviving candidates
at full dimension. Unlike PQ/SQ the "compressed" representation is a
plain slice — no training step, no codebook, and the coarse pass is
exact in the prefix space.

This composes entirely from existing pieces:

- stage 1: ``knn`` over ``slice(vec, 1, prefix_dim)`` vs the query's
  prefix — TakeOrderedAndProject keeps ``candidates`` rows; the scan
  computes a fold over ``prefix_dim`` elements instead of the full
  dimension (the 100 TB win: per-row distance flops drop by
  dim/prefix_dim, and with a column layout storing the prefix
  separately the scan would read prefix_dim floats per row);
- stage 2: full-dimension rerank of the ``candidates`` survivors —
  a few hundred rows, distributed but trivially small.

Exactness: stage 1 is a filter, so the final top-k is exact only when
the true top-k survive the prefix pass (MRL's training objective makes
prefix distances track full distances). ``candidates`` is the
recall/cost knob, same contract as PQ's rerank depth. Both stages and
their composition are deterministic — value-oracled end to end in
workload.knn_matryoshka_topk (reference analogue: the flat index's
exact Search, flat.go:100-144, run at two dimensionalities).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.distance import distance
from ..functions.util import bind_once
from ..functions.vector import vector_lit
from .knn import DEFAULT_K, knn


def matryoshka_knn(df: DataFrame, query_vec: Sequence[float],
                   k: int = DEFAULT_K, prefix_dim: int = 16,
                   candidates: int = 100, metric: str = "euclidean",
                   vec_col: str = "embedding",
                   exclude_id=None, id_col: str | None = None,
                   tie_col: str | None = None) -> DataFrame:
    """Two-stage exact search: prefix-dim coarse top-``candidates``,
    full-dim rerank to top-``k``. Output matches ``knn``'s shape
    (input columns + ``distance``)."""
    if prefix_dim < 1:
        raise ValueError(f"prefix_dim must be >= 1, got {prefix_dim}")
    if candidates < k:
        raise ValueError(
            f"candidates ({candidates}) must be >= k ({k}): the rerank "
            "can only return rows the coarse pass kept")
    q = [float(x) for x in query_vec]
    q_prefix = q[:prefix_dim]

    coarse = df.withColumn("__prefix",
                           F.slice(F.col(vec_col), 1, prefix_dim))
    shortlist = knn(coarse, q_prefix, k=candidates, metric=metric,
                    vec_col="__prefix", exclude_id=exclude_id,
                    id_col=id_col, dist_col="__coarse_dist",
                    tie_col=tie_col).drop("__prefix")
    # Rerank at full dimension: the survivors still carry vec_col, so
    # no join back to the base table — one scan total.
    q_lit = vector_lit(q)
    reranked = shortlist.withColumn(
        "distance",
        bind_once(F.col(vec_col), lambda v: distance(metric, v, q_lit)))
    order = [F.col("distance").asc_nulls_last()]
    if tie_col is not None:
        order.append(F.col(tie_col).asc())
    return reranked.orderBy(*order).limit(k).drop("__coarse_dist")
