"""Product quantization (PQ): compressed-domain ANN scoring.

Beyond-parity scale tier. The reference's indexes (flat
/root/reference/pkg/index/flat/flat.go, HNSW hnsw.go) score raw
float32 vectors; at 100 TB a 384-dim float corpus is ~1.5 KB/row and
even a pruned IVF probe drags full vectors through the scan. PQ
(Jegou, Douze, Schmid, "Product Quantization for Nearest Neighbor
Search", TPAMI 2011) splits each vector into ``m`` subvectors,
quantizes each against a ``ks``-entry codebook, and stores only the
``m`` code bytes — ~100x smaller scan footprint — while asymmetric
distance computation (ADC) approximates the true distance from a
per-query lookup table without touching any raw vector.

Spark mapping:
- **Fit**: codebooks are chosen deterministically — the ``ks`` corpus
  vectors with the smallest ``md5(id)``, sliced into subvectors (the
  same engine-portable trick as ``IvfIndex.build_deterministic``), so
  any SQL engine reproduces codebooks, codes, and ADC scores —
  the whole pipeline is value-oracle-checkable, which a KMeans
  codebook can never be.
- **Encode**: pure Column expression (argmin over per-subspace
  distances) — one map-only pass, whole-stage codegen, no shuffle.
- **ADC search**: the query's lookup table (m x ks floats) is built
  driver-side in NumPy and inlined as literals; the scan computes
  ``sqrt(sum_j lut[j][code_j])`` via ``element_at`` — a few array
  lookups per row instead of a 384-dim fold — then
  TakeOrderedAndProject merges per-partition top-k. Optional exact
  re-rank re-scores only the ADC short-list with true distances.

At cluster scale the encoded table is written WITHOUT the raw vector
column (codes + ids only); re-rank then joins the short-list back to
the base table — a k-row broadcast join, not a scan.
"""

from __future__ import annotations

import json
import os
from collections.abc import Sequence

import numpy as np
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .ann import IvfIndex, _MaintainableIndex
from .knn import DEFAULT_K


class PqCodec:
    """Deterministic PQ codebooks: shape (m, ks, dim/m)."""

    def __init__(self, codebooks: np.ndarray):
        self.codebooks = codebooks
        self.m, self.ks, self.dsub = codebooks.shape

    @classmethod
    def fit_deterministic(cls, df: DataFrame, m: int = 4, ks: int = 8,
                          id_col: str = "vec_id",
                          vec_col: str = "embedding") -> "PqCodec":
        """Codebook entries = subvector slices of the ``ks`` corpus
        vectors with smallest (md5(id), id) — a deterministic
        pseudo-random sample any engine reproduces. Real deployments
        swap in KMeans-per-subspace; the fit API is the same."""
        rows = (df.select(F.col(vec_col).cast("array<double>").alias("v"),
                          F.col(id_col).alias("i"))
                .orderBy(F.md5(F.col("i").cast("string")), F.col("i"))
                .limit(ks).collect())
        if len(rows) < ks:
            raise ValueError(f"need >= {ks} rows to fit {ks} codes")
        dim = len(rows[0]["v"])
        if dim % m:
            raise ValueError(f"dim {dim} not divisible by m={m}")
        dsub = dim // m
        sample = np.array([list(r["v"]) for r in rows])  # (ks, dim)
        books = np.stack([sample[:, j * dsub:(j + 1) * dsub]
                          for j in range(m)])            # (m, ks, dsub)
        return cls(books)

    def encode_expr(self, vec_col: str):
        """``array<int>`` of length m: per-subspace argmin code (ties ->
        lowest code, matching SQL list_position-of-min). Pure Column
        expression; runs in codegen."""
        v = F.col(vec_col).cast("array<double>")
        codes = []
        for j in range(self.m):
            sub = F.slice(v, j * self.dsub + 1, self.dsub)
            dists = F.array(*[
                F.aggregate(
                    F.zip_with(sub, F.lit([float(x) for x in c]),
                               lambda x, y: (x - y) * (x - y)),
                    F.lit(0.0), lambda s, x: s + x)
                for c in self.codebooks[j]])
            codes.append((F.array_position(dists, F.array_min(dists)) - 1)
                         .cast("int"))
        return F.array(*codes)

    def encode(self, df: DataFrame, vec_col: str = "embedding",
               code_col: str = "__code") -> DataFrame:
        return df.withColumn(code_col, self.encode_expr(vec_col))

    def lut(self, qvec: Sequence[float]) -> np.ndarray:
        """ADC lookup table, shape (m, ks): squared L2 from each query
        subvector to each codebook entry."""
        q = np.asarray(list(qvec), dtype=np.float64)
        if q.size != self.m * self.dsub:
            raise ValueError(
                f"query dim {q.size} != codec dim {self.m * self.dsub}")
        qs = q.reshape(self.m, self.dsub)
        return ((self.codebooks - qs[:, None, :]) ** 2).sum(axis=2)

    def adc_expr(self, qvec: Sequence[float], code_col: str = "__code"):
        """Approximate euclidean distance from the stored codes alone:
        ``sqrt(sum_j lut[j][code_j])``. m array lookups per row."""
        lut = self.lut(qvec)
        total = F.lit(0.0)
        for j in range(self.m):
            lut_j = F.lit([float(x) for x in lut[j]])
            total = total + F.element_at(
                lut_j, F.element_at(F.col(code_col), j + 1) + 1)
        return F.sqrt(total)


class PqIndex(_MaintainableIndex):
    """Encoded-table index with ADC search + optional exact re-rank.
    Maintenance (Add/Delete/Size/GetIDs — reference
    pkg/index/index.go:19-49) via _MaintainableIndex; ``add`` encodes
    only the delta."""

    TABLE_DIR = "codes"
    PARTITION_COL = None

    def __init__(self, codec: PqCodec, table: DataFrame,
                 id_col: str, vec_col: str):
        self.codec = codec
        self.table = table  # base columns + __code
        self.id_col = id_col
        self.vec_col = vec_col
        self._deleted = None

    @classmethod
    def build(cls, df: DataFrame, m: int = 4, ks: int = 8,
              id_col: str = "vec_id", vec_col: str = "embedding") -> "PqIndex":
        codec = PqCodec.fit_deterministic(df, m, ks, id_col, vec_col)
        return cls(codec, codec.encode(df, vec_col), id_col, vec_col)

    def _index_rows(self, df: DataFrame) -> DataFrame:
        return self.codec.encode(df, self.vec_col)

    def search(self, qvec: Sequence[float], k: int = DEFAULT_K,
               rerank: int = 0, dist_col: str = "distance") -> DataFrame:
        """ADC top-k. ``rerank > 0``: take the top ``rerank * k`` ADC
        candidates, re-score them with the TRUE euclidean distance
        (only the short-list — k*rerank rows — touches raw vectors),
        return the exact-ranked top-k. The standard PQ accuracy knob."""
        if k < 1:
            raise ValueError(f"k must be >= 1, got {k}")
        scored = self._live(self.table).withColumn(
            dist_col, self.codec.adc_expr(qvec))
        if not rerank:
            return (scored.orderBy(F.col(dist_col).asc_nulls_last(),
                                   F.col(self.id_col).asc())
                    .limit(k).drop("__code"))
        from ..functions.distance import distance
        short = (scored.orderBy(F.col(dist_col).asc_nulls_last(),
                                F.col(self.id_col).asc())
                 .limit(rerank * k).drop(dist_col))
        exact = short.withColumn(
            dist_col, distance("euclidean", F.col(self.vec_col),
                               F.lit([float(x) for x in qvec])
                               .cast("array<double>")))
        return (exact.orderBy(F.col(dist_col).asc_nulls_last(),
                              F.col(self.id_col).asc())
                .limit(k).drop("__code"))

    # -- persistence (S5 analogue) --------------------------------------

    def save(self, path: str, drop_vectors: bool = False) -> None:
        """Persist codes (+ params). ``drop_vectors=True`` writes the
        compressed form only — the 100 TB layout; searches then need
        ``rerank=0`` or an external base table for re-rank."""
        t = self._live(self.table)
        if drop_vectors:
            t = t.drop(self.vec_col)
        t.write.mode("overwrite").parquet(os.path.join(path, "codes"))
        meta = {"codebooks": self.codec.codebooks.tolist(),
                "id_col": self.id_col, "vec_col": self.vec_col}
        with open(os.path.join(path, "pq_meta.json"), "w") as f:
            json.dump(meta, f)

    @classmethod
    def load(cls, spark: SparkSession, path: str) -> "PqIndex":
        with open(os.path.join(path, "pq_meta.json")) as f:
            meta = json.load(f)
        table = spark.read.parquet(os.path.join(path, "codes"))
        return cls(PqCodec(np.asarray(meta["codebooks"])), table,
                   meta["id_col"], meta["vec_col"])


class IvfPqIndex(_MaintainableIndex):
    """IVF coarse pruning composed with PQ compressed scoring — the
    canonical billion-scale ANN layout (faiss ``IVFx,PQy``): the probe
    prunes to ``nprobe`` clusters (partition pruning when saved
    partitioned by ``__cluster``), then ADC ranks the survivors from
    their code bytes alone. A 100 TB search touches
    ``nprobe/n_centroids`` of the partitions and m bytes per surviving
    row; raw vectors only appear in the optional k-row re-rank.

    Codes quantize the RAW vectors (not residuals v - centroid): the
    codes stay cluster-independent, so one codec serves all clusters,
    ``add`` needs no per-cluster state, and the DuckDB value oracle
    (workload.ann_ivfpq_topk) stays an exact composition of the IVF
    and PQ oracles. Residual encoding buys accuracy at equal code size
    — swap the encode/LUT to ``v - centroid[cluster]`` if needed.
    """

    TABLE_DIR = "clusters"
    PARTITION_COL = "__cluster"

    def __init__(self, centroids: np.ndarray, codec: PqCodec,
                 table: DataFrame, id_col: str, vec_col: str):
        self.centroids = centroids
        self.codec = codec
        self.table = table  # base columns + __cluster + __code
        self.id_col = id_col
        self.vec_col = vec_col
        self._deleted = None

    @classmethod
    def build_deterministic(cls, df: DataFrame, n_centroids: int = 8,
                            m: int = 4, ks: int = 8,
                            id_col: str = "vec_id",
                            vec_col: str = "embedding") -> "IvfPqIndex":
        """One map-only pass adds both the cluster id and the code."""
        ivf = IvfIndex.build_deterministic(df, n_centroids, id_col, vec_col)
        codec = PqCodec.fit_deterministic(df, m, ks, id_col, vec_col)
        return cls(ivf.centroids, codec, codec.encode(ivf.table, vec_col),
                   id_col, vec_col)

    def _index_rows(self, df: DataFrame) -> DataFrame:
        assigned = df.withColumn(
            "__cluster", IvfIndex._assign_expr(self.centroids, self.vec_col))
        return self.codec.encode(assigned, self.vec_col)

    def candidates(self, qvec: Sequence[float], nprobe: int = 3) -> DataFrame:
        q = np.asarray(list(qvec), dtype=np.float64)
        dists = np.linalg.norm(self.centroids - q, axis=1)
        probe = [int(c) for c in np.argsort(dists, kind="stable")[:nprobe]]
        return self._live(self.table.filter(F.col("__cluster").isin(probe)))

    def search(self, qvec: Sequence[float], k: int = DEFAULT_K,
               nprobe: int = 3, rerank: int = 0,
               dist_col: str = "distance") -> DataFrame:
        if k < 1:
            raise ValueError(f"k must be >= 1, got {k}")
        scored = self.candidates(qvec, nprobe).withColumn(
            dist_col, self.codec.adc_expr(qvec))
        top = (scored.orderBy(F.col(dist_col).asc_nulls_last(),
                              F.col(self.id_col).asc())
               .limit(rerank * k if rerank else k))
        if not rerank:
            return top.drop("__code", "__cluster")
        from ..functions.distance import distance
        exact = top.drop(dist_col).withColumn(
            dist_col, distance("euclidean", F.col(self.vec_col),
                               F.lit([float(x) for x in qvec])
                               .cast("array<double>")))
        return (exact.orderBy(F.col(dist_col).asc_nulls_last(),
                              F.col(self.id_col).asc())
                .limit(k).drop("__code", "__cluster"))

    def save(self, path: str, drop_vectors: bool = False) -> None:
        t = self._live(self.table)
        if drop_vectors:
            t = t.drop(self.vec_col)
        t.write.mode("overwrite").partitionBy("__cluster") \
            .parquet(os.path.join(path, "clusters"))
        meta = {"centroids": self.centroids.tolist(),
                "codebooks": self.codec.codebooks.tolist(),
                "id_col": self.id_col, "vec_col": self.vec_col}
        with open(os.path.join(path, "ivfpq_meta.json"), "w") as f:
            json.dump(meta, f)

    @classmethod
    def load(cls, spark: SparkSession, path: str) -> "IvfPqIndex":
        with open(os.path.join(path, "ivfpq_meta.json")) as f:
            meta = json.load(f)
        table = spark.read.parquet(os.path.join(path, "clusters"))
        return cls(np.asarray(meta["centroids"]),
                   PqCodec(np.asarray(meta["codebooks"])), table,
                   meta["id_col"], meta["vec_col"])
