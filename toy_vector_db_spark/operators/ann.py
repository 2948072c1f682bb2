"""Approximate nearest neighbor: the Spark-idiomatic HNSW analogue.

Reference HNSW (/root/reference/pkg/index/hnsw/hnsw.go) is a
pointer-chasing graph — an anti-pattern on Spark (SURVEY §7 risk 1).
Capability parity is "approximate knn, much cheaper than brute force,
tunable recall" (README.md:190-195); delivered here as:

  1. Random-hyperplane LSH (cosine-family): signature = sign bits of
     dot(v, plane_i). Index build is one scan; search probes the
     query's bucket plus ``multiprobe`` Hamming-adjacent buckets, then
     exact-scores only candidates. Recall tunes with n_planes (fewer
     planes = bigger buckets = higher recall, more work) and
     multiprobe — the efSearch analogue (hnsw.go:50).
  2. IVF via MLlib KMeans: centroid table (broadcast-sized), cluster
     assignment at build, ``nprobe``-nearest-centroid pruning at
     search — partition pruning does the rest when the index table is
     written partitioned by cluster.

Index persistence (reference Save/Load, hnsw.go:556-652 — gob
snapshots) maps to writing the signed/assigned table + params as
Parquet: ``save_index`` / ``load_index``.

Scale: build is embarrassingly parallel (no shuffle unless writing
partitioned); search reads only matching buckets/clusters — with a
partitioned index table that is real partition pruning at the source.
"""

from __future__ import annotations

import json
import os
from collections.abc import Sequence

import numpy as np
import pandas as pd  # module-level: pandas_udf resolves string hints here
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .knn import knn

# ---------------------------------------------------------------------------
# Incremental maintenance shared by both index types
# ---------------------------------------------------------------------------


class _MaintainableIndex:
    """Add/Delete/Size/GetIDs from the reference ``Index`` interface
    (pkg/index/index.go:19-49), Spark-idiomatic:

    - ``add``: index only the NEW rows (sign / assign — a map-only pass
      over the delta, never a rebuild) and union them in. Duplicate ids
      error like flat.go:72-80 / hnsw.go:145-156 (ErrVectorAlreadyExists).
    - ``delete``: tombstones, exactly the HNSW strategy (hnsw.go:391-412
      sets ``Deleted=true``; every search skips deleted nodes). Here the
      tombstone set is a DataFrame anti-joined at candidate time — with
      a driver-side id list it broadcasts, so the per-query cost is a
      broadcast hash anti-join over the already-pruned candidate set.
    - ``compact``: fold tombstones into the table (the rebuild the
      reference never does); ``save`` compacts implicitly so persisted
      indexes carry no tombstone debt.

    Mutations return a NEW index object (DataFrames are immutable);
    callers rebind, which is the reference's mutate-in-place under a
    lock re-expressed without shared state.
    """

    table: DataFrame
    id_col: str
    vec_col: str
    _deleted: DataFrame | None  # single column __del_id

    def _with_table(self, table: DataFrame, deleted: DataFrame | None):
        import copy

        out = copy.copy(self)
        out.table = table
        out._deleted = deleted
        # membership changed: a cached covering radius could be too
        # small after add() (breaking range-search pruning exactness)
        out.__dict__.pop("_radii", None)
        return out

    def _index_rows(self, df: DataFrame) -> DataFrame:
        raise NotImplementedError

    def _live(self, df: DataFrame) -> DataFrame:
        d = getattr(self, "_deleted", None)
        if d is None:
            return df
        return df.join(d, df[self.id_col] == d["__del_id"], "left_anti")

    def add(self, rows: DataFrame, check_dups: bool = True):
        """Index a delta of new rows. ``check_dups=True`` replicates the
        reference's ErrVectorAlreadyExists (one anti-join count job);
        disable for bulk loads where ids are known fresh."""
        if check_dups:
            clash = rows.join(
                self._live(self.table).select(self.id_col), self.id_col,
                "semi").limit(1).count()
            if clash:
                raise ValueError("vector already exists")  # flat.go:19
        delta = self._index_rows(rows).select(*self.table.columns)
        # re-adding a previously deleted id resurrects it: drop its
        # tombstone AND its stale physical row (otherwise the old row
        # stays in self.table alongside the new delta row — size()
        # over-counts and searches can surface the stale vector).
        base = self.table
        d = getattr(self, "_deleted", None)
        if d is not None:
            add_ids = rows.select(F.col(self.id_col).alias("__del_id"))
            readded = d.join(add_ids, "__del_id", "semi")
            base = base.join(
                readded.withColumnRenamed("__del_id", self.id_col),
                self.id_col, "left_anti")
            d = d.join(add_ids, "__del_id", "left_anti")
        return self._with_table(base.unionByName(delta), d)

    def delete(self, ids: Sequence | DataFrame):
        """Tombstone ids (HNSW hnsw.go:391-412). Accepts a driver-side
        list (broadcast at search) or a DataFrame of ids for bulk
        deletes too large to collect."""
        spark = self.table.sparkSession
        if isinstance(ids, DataFrame):
            d = ids.select(F.col(ids.columns[0]).alias("__del_id"))
        else:
            id_type = self.table.schema[self.id_col].dataType
            d = spark.createDataFrame(
                [(i,) for i in ids], f"__del_id {id_type.simpleString()}")
        prev = getattr(self, "_deleted", None)
        if prev is not None:
            d = prev.unionByName(d).distinct()
        return self._with_table(self.table, d)

    def compact(self):
        """Materialize tombstones: the live view becomes the table."""
        return self._with_table(self._live(self.table), None)

    def size(self) -> int:
        """Live row count (flat.go:147-151; HNSW counts non-deleted)."""
        return self._live(self.table).count()

    def get_ids(self) -> list:
        """All live ids (flat.go:155-163). Driver-side by contract —
        use ``self.table`` directly when the corpus is large."""
        return [r[0] for r in
                self._live(self.table).select(self.id_col).collect()]


# ---------------------------------------------------------------------------
# Random-hyperplane LSH
# ---------------------------------------------------------------------------


def hyperplanes(n_planes: int, dim: int, seed: int = 42) -> np.ndarray:
    """Deterministic engine-portable hyperplanes, shape (n_planes, dim):
    coefficient (i, j) = first 8 hex digits of md5(f"{seed}:{i}:{j}")
    scaled to [-1, 1). Any SQL engine with md5 derives the identical
    matrix, which makes the LSH bucketing itself oracle-checkable
    (workload.ann_lsh_topk) — something a PRNG-seeded matrix can't do.
    Uniform directions bucket as well as Gaussian for sign-LSH."""
    import hashlib

    def coef(i: int, j: int) -> float:
        h = hashlib.md5(f"{seed}:{i}:{j}".encode()).hexdigest()[:8]
        return int(h, 16) / 2 ** 31 - 1.0

    return np.array([[coef(i, j) for j in range(dim)]
                     for i in range(n_planes)])


def _sig_expr(vec_col: str, planes: np.ndarray):
    """Signature as an int: bit i = [dot(v, plane_i) > 0]. Pure Column
    expression — the dot products run JVM-side, no Python.

    One ``transform`` lambda over the plane matrix as a nested-array
    literal instead of n_planes copies of the dot fold (r12): identical
    per-plane arithmetic and bit weights (bit-identical signatures,
    same oracle), ~n_planes-fold smaller expression tree. The bit
    weights sum in a LONG accumulator (the old int + chain overflowed
    past n_planes 30 in principle; same values for every real size)."""
    pows = F.lit([1 << i for i in range(len(planes))])
    mat = F.lit([[float(x) for x in p] for p in planes])
    v = F.col(vec_col).cast("array<double>")
    bits = F.transform(mat, lambda p, i: F.when(
        F.aggregate(F.zip_with(v, p, lambda x, y: x * y),
                    F.lit(0.0), lambda s, x: s + x) > 0,
        F.element_at(pows, i + 1)).otherwise(F.lit(0).cast("long")))
    return F.aggregate(bits, F.lit(0).cast("long"), lambda s, x: s + x)


def add_lsh_signature(df: DataFrame, planes: np.ndarray,
                      vec_col: str = "embedding",
                      sig_col: str = "__sig") -> DataFrame:
    return df.withColumn(sig_col, _sig_expr(vec_col, planes))


def query_signature(qvec: Sequence[float], planes: np.ndarray) -> int:
    dots = planes @ np.asarray(qvec, dtype=np.float64)
    return int(sum(1 << i for i, d in enumerate(dots) if d > 0))


def probe_signatures(sig: int, n_planes: int, multiprobe: int = 1) -> list[int]:
    """The query bucket plus all buckets within Hamming distance
    ``multiprobe`` (efSearch-style recall knob)."""
    sigs = {sig}
    frontier = {sig}
    for _ in range(multiprobe):
        frontier = {s ^ (1 << b) for s in frontier for b in range(n_planes)}
        sigs |= frontier
    return sorted(sigs)


class LshIndex(_MaintainableIndex):
    """Bucket-table ANN index (flat/HNSW ``Index`` interface analogue,
    reference pkg/index/index.go:19-49: Build/Add/Delete/Search/Size/
    GetIDs/Save/Load — maintenance via _MaintainableIndex)."""

    TABLE_DIR = "buckets"
    PARTITION_COL = "__sig"

    def __init__(self, planes: np.ndarray, table: DataFrame,
                 id_col: str, vec_col: str):
        self.planes = planes
        self.table = table  # base columns + __sig
        self.id_col = id_col
        self.vec_col = vec_col
        self._deleted = None

    def _index_rows(self, df: DataFrame) -> DataFrame:
        return add_lsh_signature(df, self.planes, self.vec_col)

    @classmethod
    def build(cls, df: DataFrame, n_planes: int = 12, seed: int = 42,
              id_col: str = "vec_id", vec_col: str = "embedding",
              dim: int | None = None) -> "LshIndex":
        if dim is None:
            row = df.select(F.size(vec_col)).first()
            if row is None:
                raise ValueError("cannot build index over an empty corpus")
            dim = int(row[0])
        planes = hyperplanes(n_planes, dim, seed)
        return cls(planes, add_lsh_signature(df, planes, vec_col), id_col, vec_col)

    def candidates(self, qvec: Sequence[float],
                   multiprobe: int = 1) -> DataFrame:
        """Rows in the query's bucket plus Hamming-adjacent buckets
        (partition pruning when the table was saved partitioned)."""
        qsig = query_signature(qvec, self.planes)
        probes = probe_signatures(qsig, len(self.planes), multiprobe)
        return self._live(self.table.filter(F.col("__sig").isin(probes)))

    def search(self, qvec: Sequence[float], k: int = 10,
               metric: str = "cosine", multiprobe: int = 1) -> DataFrame:
        return knn(self.candidates(qvec, multiprobe),
                   [float(x) for x in qvec], k=k, metric=metric,
                   vec_col=self.vec_col).drop("__sig")

    # -- persistence (S5 analogue) --------------------------------------

    def save(self, path: str, partitioned: bool = True) -> None:
        """Write the bucket table (optionally partitioned by signature:
        bucket probes then become partition pruning at the source) and
        the plane matrix + params as JSON. Tombstones are compacted
        away — persisted indexes carry only live rows."""
        w = self._live(self.table).write.mode("overwrite")
        if partitioned:
            w = w.partitionBy("__sig")
        w.parquet(os.path.join(path, "buckets"))
        meta = {"planes": self.planes.tolist(), "id_col": self.id_col,
                "vec_col": self.vec_col}
        with open(os.path.join(path, "lsh_meta.json"), "w") as f:
            json.dump(meta, f)

    @classmethod
    def load(cls, spark: SparkSession, path: str) -> "LshIndex":
        with open(os.path.join(path, "lsh_meta.json")) as f:
            meta = json.load(f)
        table = spark.read.parquet(os.path.join(path, "buckets"))
        return cls(np.asarray(meta["planes"]), table,
                   meta["id_col"], meta["vec_col"])


# ---------------------------------------------------------------------------
# IVF (inverted file) via KMeans centroids
# ---------------------------------------------------------------------------


def det_sample(df: DataFrame, n: int, id_col: str,
               vec_col: str) -> np.ndarray:
    """The ``n`` corpus vectors with smallest (md5(id), id) as a
    matrix — the deterministic pseudo-random sample behind every
    engine-reproducible fit (det-IVF centroids, PQ codebooks). One
    TakeOrdered job; callers needing both centroids AND codebooks
    collect once with max(n_centroids, ks) and slice."""
    rows = (df.select(F.col(vec_col).cast("array<double>").alias("v"),
                      F.col(id_col).alias("i"))
            .orderBy(F.md5(F.col("i").cast("string")), F.col("i"))
            .limit(n).collect())
    if not rows:
        raise ValueError("cannot build index over an empty corpus")
    return np.array([list(r["v"]) for r in rows])


class IvfIndex(_MaintainableIndex):
    """Centroid-partitioned ANN index. Build: MLlib KMeans (public
    Spark API) over a sample; assign every row to its nearest centroid.
    Search: score centroids driver-side (they're broadcast-sized),
    scan only the ``nprobe`` nearest clusters. ``add`` assigns new rows
    to the EXISTING centroids (standard IVF — no retrain; faiss
    add_with_ids does the same); ``delete`` tombstones."""

    TABLE_DIR = "clusters"
    PARTITION_COL = "__cluster"

    def __init__(self, centroids: np.ndarray, table: DataFrame,
                 id_col: str, vec_col: str):
        self.centroids = centroids
        self.table = table  # base columns + __cluster
        self.id_col = id_col
        self.vec_col = vec_col
        self._deleted = None

    def _index_rows(self, df: DataFrame) -> DataFrame:
        return df.withColumn(
            "__cluster", self._assign_expr(self.centroids, self.vec_col))

    @classmethod
    def build(cls, df: DataFrame, n_centroids: int = 16, seed: int = 42,
              id_col: str = "vec_id", vec_col: str = "embedding",
              max_iter: int = 5, train_rows: int = 20_000) -> "IvfIndex":
        """Train centroids on a bounded sample, then assign every row.

        Training on a sample is the standard IVF recipe (faiss trains
        on ~50*nlist points): KMeans quality saturates quickly, and a
        full-corpus fit would iterate over 100 TB per step. Assignment
        is one map-only pass over the full table. max_iter=5 measured
        within recall noise of 10 on the synthetic corpus at half the
        build jobs; raise it for strongly clustered data.

        cap: the n_centroids default is a small-demo layout — corpus-
        scale callers size it via chooser.ivf_nlist (~4*sqrt(n)), the
        one shared IVF rule (a pinned nlist is the latent-N^2 class).
        """
        from pyspark.ml.clustering import KMeans
        from pyspark.ml.functions import array_to_vector

        feats_col = array_to_vector(F.col(vec_col).cast("array<double>"))
        n = df.count()
        sample = df if n <= train_rows else \
            df.sample(fraction=min(1.0, train_rows / n), seed=seed)
        km = KMeans(k=n_centroids, seed=seed, maxIter=max_iter,
                    featuresCol="__features", predictionCol="__cluster")
        model = km.fit(sample.select(feats_col.alias("__features")))
        centroids = np.array([np.asarray(c) for c in model.clusterCenters()])
        table = model.transform(df.withColumn("__features", feats_col)) \
            .drop("__features")
        return cls(centroids, table, id_col, vec_col)

    @classmethod
    def build_deterministic(cls, df: DataFrame, n_centroids: int = 8,
                            id_col: str = "vec_id",
                            vec_col: str = "embedding",
                            sample: np.ndarray | None = None) -> "IvfIndex":
        """Init-only IVF: centroids are the ``n_centroids`` corpus
        vectors with the smallest md5(id) — a deterministic pseudo-random
        sample that any SQL engine reproduces, so cluster assignment,
        probe selection, and the pruned search are all value-checkable
        by the DuckDB oracle (workload.ann_ivf_det_topk). Recall behaves
        like sampled-centroid IVF; use ``build`` for Lloyd-trained
        centroids when bit-reproducibility isn't needed. ``sample``
        short-circuits the collect when the caller already holds the
        det_sample matrix (first ``n_centroids`` rows are used).

        cap: n_centroids=8 is the oracle-demo default; scale callers
        size via chooser.ivf_nlist (semdedup, the auto join tiers)."""
        if sample is None:
            sample = det_sample(df, n_centroids, id_col, vec_col)
        centroids = np.asarray(sample)[:n_centroids]
        table = df.withColumn("__cluster", cls._assign_expr(centroids, vec_col))
        return cls(centroids, table, id_col, vec_col)

    @staticmethod
    def _assign_expr(centroids: np.ndarray, vec_col: str):
        """Nearest-centroid id as a Column (ties -> the lowest centroid
        index, matching SQL list_position-of-min). Two tiers, same
        semantics: a pure fold expression while the centroid count fits
        whole-stage codegen, an Arrow-batched BLAS argmin above it
        (sqrt(N)-sized builds; np.argmin also returns the FIRST minimum,
        so duplicate-centroid ties resolve identically)."""
        from .knn import (EXPR_MAX_CENTROIDS, _centroid_d2, _stack_vecs)
        v = F.col(vec_col).cast("array<double>")
        if len(centroids) > EXPR_MAX_CENTROIDS:
            import pandas as pd
            C = np.asarray(centroids, dtype=np.float64)
            cn = (C ** 2).sum(1)

            @F.pandas_udf("int")
            def _assign(batch: pd.Series) -> pd.Series:
                if not len(batch):
                    return pd.Series([], dtype="int32")
                X = _stack_vecs(batch)
                d2 = _centroid_d2(X, C, cn)
                return pd.Series(np.argmin(d2, axis=1).astype(np.int32))

            return _assign(v)
        # one transform lambda over the centroid matrix as a nested-
        # array literal instead of n_centroids copies of the fold
        # (r12): identical per-entry arithmetic and enumeration order
        # (bit-identical assignment, same oracle), ~n_centroids-fold
        # smaller expression tree -> cheaper analysis/codegen per plan
        cents = F.lit([[float(x) for x in c] for c in centroids])
        dists = F.transform(cents, lambda c: F.sqrt(F.aggregate(
            F.zip_with(v, c, lambda x, y: (x - y) * (x - y)),
            F.lit(0.0), lambda s, x: s + x)))
        return (F.array_position(dists, F.array_min(dists)) - 1).cast("int")

    def probe_clusters(self, qvec: Sequence[float], nprobe: int = 3) -> list[int]:
        """The ``nprobe`` centroids nearest the query (ties -> lowest
        centroid index; stable sort mirrors the oracle's total order)."""
        q = np.asarray(qvec, dtype=np.float64)
        dists = np.linalg.norm(self.centroids - q, axis=1)
        return [int(c) for c in np.argsort(dists, kind="stable")[:nprobe]]

    def candidates(self, qvec: Sequence[float], nprobe: int = 3) -> DataFrame:
        """Rows of the ``nprobe`` clusters nearest the query (partition
        pruning when the table was saved partitioned by cluster)."""
        probe = self.probe_clusters(qvec, nprobe)
        return self._live(self.table.filter(F.col("__cluster").isin(probe)))

    def search(self, qvec: Sequence[float], k: int = 10,
               metric: str = "cosine", nprobe: int = 3) -> DataFrame:
        return knn(self.candidates(qvec, nprobe),
                   [float(x) for x in qvec], k=k, metric=metric,
                   vec_col=self.vec_col).drop("__cluster")

    def _dist_to_own_centroid(self):
        """Column: euclidean distance from a member row to the centroid
        of its assigned cluster."""
        v = F.col(self.vec_col).cast("array<double>")
        cents = F.lit([[float(x) for x in c] for c in self.centroids])
        # fold only the OWN centroid's entry (element_at before the
        # fold, r12): one distance per row instead of n_centroids —
        # same arithmetic on the same entry, bit-identical result
        return F.sqrt(F.aggregate(
            F.zip_with(v, F.element_at(cents, F.col("__cluster") + 1),
                       lambda x, y: (x - y) * (x - y)),
            F.lit(0.0), lambda s, x: s + x))

    def cluster_radii(self) -> np.ndarray:
        """Per-cluster covering radius: max euclidean distance from any
        live member to its centroid. One partial-aggregated pass over
        the table, <= n_centroids rows collected; cached on the index
        (production path: compute at build and persist in the meta —
        ``save`` does exactly that via this cache). Empty clusters get
        radius 0."""
        cached = getattr(self, "_radii", None)
        if cached is not None:
            return cached
        rows = (self._live(self.table)
                .groupBy("__cluster")
                .agg(F.max(self._dist_to_own_centroid()).alias("r"))
                .collect())
        radii = np.zeros(len(self.centroids))
        for r in rows:
            radii[r["__cluster"]] = r["r"]
        self._radii = radii
        return radii

    def cluster_stats(self, label_col: str | None = None) -> DataFrame:
        """Corpus cartography: per-cluster membership count, mean and
        max distance to centroid, and (with ``label_col``) the dominant
        label + its count — the SemDeDup-style \"what lives where\" map
        used to spot over-represented regions before pruning. One
        aggregate on the compact cluster key; the dominant label adds
        one (cluster, label) aggregate and a per-cluster top-1 window —
        group count is bounded by n_centroids x labels, never rows."""
        base = self._live(self.table) \
            .withColumn("__cd", self._dist_to_own_centroid())
        stats = (base.groupBy("__cluster")
                 .agg(F.count(F.lit(1)).alias("n_members"),
                      F.round(F.avg("__cd"), 4).alias("avg_dist"),
                      F.round(F.max("__cd"), 4).alias("max_dist"))
                 .withColumnRenamed("__cluster", "cluster_id"))
        if label_col is None:
            return stats
        from pyspark.sql import Window
        lc = (base.groupBy("__cluster", label_col)
              .agg(F.count(F.lit(1)).alias("top_label_n")))
        win = Window.partitionBy("__cluster").orderBy(
            F.col("top_label_n").desc(), F.col(label_col).asc())
        top = (lc.withColumn("__rk", F.row_number().over(win))
               .filter(F.col("__rk") == 1)
               .select(F.col("__cluster").alias("cluster_id"),
                       F.col(label_col).alias("top_label"), "top_label_n"))
        return stats.join(top, "cluster_id")

    def range_search(self, qvec: Sequence[float], radius: float,
                     dist_col: str = "distance") -> DataFrame:
        """EXACT euclidean radius query with cluster pruning: by the
        triangle inequality a cluster can hold a point within
        ``radius`` of q only if d(q, centroid) <= radius + covering
        radius, so every other cluster is skipped (partition pruning on
        a saved layout) with zero recall loss. Exactness means the
        pruned tier shares the brute-force oracle — the workload query
        value-checks that pruning loses nothing. Euclidean only: the
        bound needs a metric distance (cosine distance violates the
        triangle inequality)."""
        from .knn import range_search as _range
        if radius < 0:
            raise ValueError(f"radius must be >= 0, got {radius}")
        q = np.asarray(qvec, dtype=np.float64)
        qd = np.linalg.norm(self.centroids - q, axis=1)
        keep = [int(c) for c in np.nonzero(qd <= radius
                                           + self.cluster_radii())[0]]
        cand = self._live(self.table.filter(F.col("__cluster").isin(keep)))
        return _range(cand, [float(x) for x in qvec], radius,
                      metric="euclidean", vec_col=self.vec_col,
                      dist_col=dist_col).drop("__cluster")

    def save(self, path: str) -> None:
        self._live(self.table).write.mode("overwrite") \
            .partitionBy("__cluster").parquet(os.path.join(path, "clusters"))
        meta = {"centroids": self.centroids.tolist(), "id_col": self.id_col,
                "vec_col": self.vec_col,
                "radii": self.cluster_radii().tolist()}
        with open(os.path.join(path, "ivf_meta.json"), "w") as f:
            json.dump(meta, f)

    @classmethod
    def load(cls, spark: SparkSession, path: str) -> "IvfIndex":
        with open(os.path.join(path, "ivf_meta.json")) as f:
            meta = json.load(f)
        table = spark.read.parquet(os.path.join(path, "clusters"))
        out = cls(np.asarray(meta["centroids"]), table,
                  meta["id_col"], meta["vec_col"])
        if "radii" in meta:  # persisted covering radii (pre-r4 saves lack them)
            out._radii = np.asarray(meta["radii"])
        return out


# ---------------------------------------------------------------------------
# Recall harness (ANN tiers are validated by recall@k vs the exact
# tier, not value hashes — SURVEY §5)
# ---------------------------------------------------------------------------


def recall_at_k(approx: DataFrame, exact: DataFrame, id_col: str) -> float:
    a = {r[0] for r in approx.select(id_col).collect()}
    e = {r[0] for r in exact.select(id_col).collect()}
    return len(a & e) / max(len(e), 1)
