"""Exact k-nearest-neighbor operators.

Reference: flat (brute-force) index Search at
/root/reference/pkg/index/flat/flat.go:100-144 — distance to every
vector, sort all, take k — and the NEAREST TO executor at
/root/reference/pkg/sql/executor/executor.go:251-388 (default LIMIT 10
:306-309, self-match exclusion :363-366). The reference rebuilds its
index from a full scan on every query (:311-339) — a misfeature we do
NOT replicate: here knn is a plain scan+top-k over the base table.

Scale design:
- ``knn`` compiles to TakeOrderedAndProject: per-partition top-k then a
  driver-side merge of k*num_partitions rows — no shuffle of the scan.
  That plan survives 100 TB (each executor returns only k rows).
- ``knn_join`` (many queries at once) broadcasts the query set, computes
  distances partition-locally, then reduces with a two-phase top-k
  (per-partition groupBy -> global groupBy) so the shuffle carries at
  most |queries| x num_partitions x k rows instead of |queries| x N.
"""

from __future__ import annotations

from collections.abc import Sequence

import pandas as pd  # module-level: pandas_udf resolves string hints here
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.distance import distance
from ..functions.util import bind_once
from ..functions.vector import vector_lit

DEFAULT_K = 10  # reference executor.go:306-309


def lookup_vector(df: DataFrame, id_col: str, id_value) -> list[float]:
    """Fetch one stored embedding (query-by-id, reference main.go:366-374).

    A single-row point lookup; the filter is pushed down to the Parquet
    scan. Driver-side collect of ONE row is the query parameter, not a
    data move.
    """
    row = df.filter(F.col(id_col) == id_value).select("embedding").first()
    if row is None:
        raise KeyError(f"vector not found: {id_col}={id_value!r}")
    return list(row[0])


def knn(df: DataFrame, query_vec: Sequence[float] | Column, k: int = DEFAULT_K,
        metric: str = "euclidean", vec_col: str = "embedding",
        exclude_id=None, id_col: str | None = None,
        dist_col: str = "distance", tie_col: str | None = None) -> DataFrame:
    """Top-k nearest rows to ``query_vec``. Errors on k < 1 like the
    reference (flat.go:108-110). ``exclude_id`` drops the self-match
    when the query is itself a stored row (executor.go:363-366).
    ``tie_col`` adds a secondary ascending sort so ties at the k
    boundary resolve to a deterministic total order (required when the
    result is compared value-for-value against another engine)."""
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    q = query_vec if isinstance(query_vec, Column) else vector_lit(query_vec)
    # bind_once: cosine references its first argument ~6x (dot, two
    # norms, zero-check); if vec_col is a DERIVED column (e.g. an
    # unmaterialized embedding_expr projection) Catalyst's projection
    # collapse would re-inline the whole chain at every reference —
    # measured 19x on search-text over a freshly embedded corpus.
    # Binding the vector as a lambda variable evaluates it once per row;
    # for a plain parquet column the wrap is a no-op-cost array of one.
    out = df.withColumn(
        dist_col, bind_once(F.col(vec_col), lambda v: distance(metric, v, q)))
    if exclude_id is not None:
        if id_col is None:
            raise ValueError("exclude_id requires id_col")
        out = out.filter(F.col(id_col) != exclude_id)
    # orderBy + limit => TakeOrderedAndProject (no full sort, no shuffle).
    # NULLS LAST: Spark's asc is nulls-FIRST, which would rank rows with
    # null distance (dimension mismatch, null embedding) above every
    # real match. The reference hard-errors on mismatch
    # (distance.go:56-58); we exclude — documented divergence.
    order = [F.col(dist_col).asc_nulls_last()]
    if tie_col is not None:
        order.append(F.col(tie_col).asc())
    return out.orderBy(*order).limit(k)


def knn_arrow(df: DataFrame, query_vec: Sequence[float], k: int = DEFAULT_K,
              metric: str = "euclidean", vec_col: str = "embedding",
              id_cols: Sequence[str] | None = None,
              exclude_id=None, id_col: str | None = None,
              dist_col: str = "distance",
              tie_col: str | None = None) -> DataFrame:
    """Exact top-k via Arrow-batched NumPy scoring.

    The pure-Column ``knn`` keeps everything in the JVM, but Catalyst
    evaluates higher-order distance folds element-at-a-time; for wide
    embeddings the BLAS path wins by an order of magnitude. Plan shape:
    mapInPandas scores a batch (one matrix-vector product) and emits
    only that batch's local top-k, then TakeOrderedAndProject merges —
    the executors return k rows per batch, never the scored corpus.

    Same null/mismatch semantics as ``knn``: rows whose vector length
    differs from the query are excluded. ``tie_col`` (must be in
    ``id_cols``) makes the top-k a deterministic total order — applied
    both inside each batch's local top-k and in the global merge, so a
    tie at the k boundary resolves identically to a tie-broken oracle.
    """
    import numpy as np
    import pandas as pd

    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    if metric not in ("euclidean", "cosine", "dotproduct", "manhattan"):
        raise ValueError(f"unsupported metric: {metric!r}")
    if id_cols is None:
        id_cols = [c for c in df.columns if c != vec_col]
    if tie_col is not None and tie_col not in id_cols:
        raise ValueError(f"tie_col {tie_col!r} must be in id_cols")
    q = np.asarray(list(query_vec), dtype=np.float64)
    src = df.select(*id_cols, vec_col)
    if exclude_id is not None:
        if id_col is None:
            raise ValueError("exclude_id requires id_col")
        # exclusion must precede the per-batch top-k, or a batch whose
        # local top-k contained the excluded row under-contributes
        src = src.filter(F.col(id_col) != exclude_id)
    out_ddl = ", ".join(f"{f.name} {f.dataType.simpleString()}"
                        for f in src.schema.fields
                        if f.name != vec_col) + f", {dist_col} double"

    def score(batches):
        for pdf in batches:
            vecs = pdf[vec_col]
            ok = vecs.map(lambda v: v is not None and len(v) == q.size)
            pdf = pdf[ok.values]
            if not len(pdf):
                continue
            m = np.stack(pdf[vec_col].map(
                lambda v: np.asarray(v, dtype=np.float64)).values)
            if metric == "euclidean":
                d = np.sqrt(((m - q) ** 2).sum(axis=1))
            elif metric == "manhattan":
                d = np.abs(m - q).sum(axis=1)
            elif metric == "dotproduct":
                d = -(m @ q)
            else:  # cosine, reference branch semantics (distance.go:73-107)
                nm = np.linalg.norm(m, axis=1)
                nq = np.linalg.norm(q)
                dot = m @ q
                with np.errstate(divide="ignore", invalid="ignore"):
                    sim = np.clip(dot / (nm * nq), -1.0, 1.0)
                d = np.where((nm == 0) | (nq == 0), 1.0, 1.0 - sim)
            res = pdf[list(id_cols)].copy()
            res[dist_col] = d
            sort_cols = [dist_col] + ([tie_col] if tie_col else [])
            top = res.sort_values(sort_cols, kind="stable").head(k)
            yield pd.DataFrame(top)

    scored = src.mapInPandas(score, out_ddl)
    order = [F.col(dist_col).asc_nulls_last()]
    if tie_col is not None:
        order.append(F.col(tie_col).asc())
    return scored.orderBy(*order).limit(k)


# Measured crossover (BASELINE.md "Arrow exact tier"): the Column-
# expression fold wins for narrow vectors (per-element codegen is cheap,
# no Python round-trip); the BLAS matrix-vector path wins from roughly
# dim 32 up (2.6x on dim-64 cosine). Tunable per call.
ARROW_TIER_MIN_DIM = 32


def knn_auto(df: DataFrame, query_vec: Sequence[float], k: int = DEFAULT_K,
             metric: str = "euclidean", vec_col: str = "embedding",
             id_cols: Sequence[str] | None = None,
             exclude_id=None, id_col: str | None = None,
             dist_col: str = "distance", tie_col: str | None = None,
             arrow_min_dim: int | None = None) -> DataFrame:
    """Exact top-k with explicit tier selection: dispatches to the
    Arrow/BLAS tier (``knn_arrow``) when the query dimension is >=
    ``arrow_min_dim`` (default ``ARROW_TIER_MIN_DIM``), else the pure
    Column-expression tier (``knn``). Both tiers return identical
    answers (both are oracle-checked); the knob trades JVM codegen
    against NumPy batch scoring."""
    threshold = ARROW_TIER_MIN_DIM if arrow_min_dim is None else arrow_min_dim
    if len(list(query_vec)) >= threshold:
        return knn_arrow(df, query_vec, k, metric, vec_col, id_cols,
                         exclude_id, id_col, dist_col, tie_col)
    return knn(df, query_vec, k, metric, vec_col,
               exclude_id, id_col, dist_col, tie_col)


def range_search(df: DataFrame, query_vec: Sequence[float] | Column,
                 radius: float, metric: str = "euclidean",
                 vec_col: str = "embedding", dist_col: str = "distance",
                 exclude_id=None, id_col: str | None = None,
                 limit: int | None = None,
                 tie_col: str | None = None) -> DataFrame:
    """Radius query: every row within ``radius`` of the query (faiss
    ``range_search`` shape — the \"all neighbors this close\" dual of
    top-k). The distance predicate is a map-side filter, so the scan
    parallelizes like any filter; unlike top-k there is no shuffle at
    all unless the caller asks for an ordered ``limit`` head (which
    compiles to TakeOrderedAndProject, per-partition heaps). Rows with
    null distance (dim mismatch / null vector) are excluded, matching
    the knn tier's documented divergence from the reference's
    hard-error (distance.go:56-58)."""
    if radius < 0:
        raise ValueError(f"radius must be >= 0, got {radius}")
    q = query_vec if isinstance(query_vec, Column) else vector_lit(query_vec)
    out = df.withColumn(
        dist_col, bind_once(F.col(vec_col), lambda v: distance(metric, v, q)))
    if exclude_id is not None:
        if id_col is None:
            raise ValueError("exclude_id requires id_col")
        out = out.filter(F.col(id_col) != exclude_id)
    out = out.filter(F.col(dist_col) <= radius)
    if limit is not None:
        order = [F.col(dist_col).asc_nulls_last()]
        if tie_col is not None:
            order.append(F.col(tie_col).asc())
        out = out.orderBy(*order).limit(limit)
    return out


def knn_per_group(df: DataFrame, query_vec: Sequence[float] | Column,
                  group_col: str, k: int = DEFAULT_K,
                  metric: str = "euclidean", vec_col: str = "embedding",
                  dist_col: str = "distance",
                  tie_col: str | None = None) -> DataFrame:
    """Top-``k`` nearest rows to the query PER GROUP — "the k best
    matches from every source/label/shard" (diversified retrieval; a
    plain top-k would let one dense group crowd out the rest). One
    map-side distance projection + one per-group window rank: the
    shuffle is on the group key only, there is no global sort, and
    each group's rank is a bounded per-partition pass. Rows with null
    distance are excluded (the knn tier's contract)."""
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    from pyspark.sql import Window
    q = query_vec if isinstance(query_vec, Column) else vector_lit(query_vec)
    scored = df.withColumn(
        dist_col, bind_once(F.col(vec_col), lambda v: distance(metric, v, q))
    ).filter(F.col(dist_col).isNotNull())
    order = [F.col(dist_col).asc()]
    if tie_col is not None:
        order.append(F.col(tie_col).asc())
    win = Window.partitionBy(group_col).orderBy(*order)
    return (scored.withColumn("__rk", F.row_number().over(win))
            .filter(F.col("__rk") <= k).drop("__rk"))


def _per_query_topk(pairs: DataFrame, k: int, dist_col: str,
                    two_phase: bool = True) -> DataFrame:
    """Reduce scored (__qid, __cid, dist) pairs to the k best per query.

    Two-phase: per-(query, partition) top-k first — a partition-local
    aggregation, no shuffle — then the global merge shuffles at most
    |queries| x num_partitions x k rows instead of |queries| x N.
    struct(dist, id) sorts lexicographically, so ties at the k boundary
    break on ascending corpus id — a deterministic total order.
    """
    def local_topk(df: DataFrame, keys: list[str]) -> DataFrame:
        agg = df.groupBy(*keys).agg(
            F.slice(F.sort_array(F.collect_list(F.struct(dist_col, "__cid"))),
                    1, k).alias("__top"))
        return agg.select(*[c for c in keys if c == "__qid"],
                          F.explode("__top").alias("__t")).select(
            "__qid", F.col(f"__t.__cid").alias("__cid"),
            F.col(f"__t.{dist_col}").alias(dist_col))

    if two_phase:
        phase1 = local_topk(
            pairs.withColumn("__pid", F.spark_partition_id()),
            ["__qid", "__pid"])
        return local_topk(phase1, ["__qid"])
    from pyspark.sql import Window
    w = Window.partitionBy("__qid").orderBy(F.col(dist_col).asc(),
                                            F.col("__cid").asc())
    return pairs.withColumn("__rn", F.row_number().over(w)) \
        .filter(F.col("__rn") <= k).drop("__rn")


def knn_join(queries: DataFrame, corpus: DataFrame, k: int = DEFAULT_K,
             metric: str = "euclidean",
             query_id_col: str = "query_id", query_vec_col: str = "query_vec",
             corpus_id_col: str = "vec_id", corpus_vec_col: str = "embedding",
             dist_col: str = "distance",
             two_phase: bool = True) -> DataFrame:
    """For every query row, its k nearest corpus rows (exact).

    Output: (query_id, vec_id, distance). The query side is broadcast
    (it is the small side by construction); each corpus partition emits
    only its local top-k per query before the single shuffle.
    """
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    q = F.broadcast(queries.select(
        F.col(query_id_col).alias("__qid"), F.col(query_vec_col).alias("__qvec")))
    pairs = corpus.select(
        F.col(corpus_id_col).alias("__cid"), F.col(corpus_vec_col).alias("__cvec")
    ).crossJoin(q).select(
        "__qid", "__cid",
        distance(metric, F.col("__cvec"), F.col("__qvec")).alias(dist_col)
    ).filter(F.col(dist_col).isNotNull())  # drop dim-mismatch scores
    topk = _per_query_topk(pairs, k, dist_col, two_phase)
    return topk.select(F.col("__qid").alias(query_id_col),
                       F.col("__cid").alias(corpus_id_col),
                       F.col(dist_col))


def knn_join_arrow(queries: DataFrame, corpus: DataFrame,
                   k: int = DEFAULT_K, metric: str = "euclidean",
                   query_id_col: str = "query_id",
                   query_vec_col: str = "query_vec",
                   corpus_id_col: str = "vec_id",
                   corpus_vec_col: str = "embedding",
                   dist_col: str = "distance") -> DataFrame:
    """Exact batch knn join, Arrow/BLAS tier — ``knn_join`` with the
    scoring done as one matrix product per Arrow batch instead of the
    Catalyst per-element distance fold (which is interpreted for
    higher-order functions; at dim 384 the fold made a 20-query exact
    recall gate cost as much as building a 200k-node graph index:
    48.7 s vs 5 s for this tier, same result). Bit-equal top-k to
    ``knn_join`` including boundary ties (parity-tested): the
    per-batch local top-k and the global reduce both order by
    (distance, corpus id).

    The query side is collected to one matrix — bounded by the same
    contract under which the Column tier broadcasts it (queries are
    the small side). All queries must share one dimension; corpus
    rows of any other length are excluded, the per-pair mismatch rule
    specialized to a uniform query batch.
    """
    import numpy as np
    import pandas as pd

    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    if metric not in ("euclidean", "cosine", "dotproduct", "manhattan"):
        raise ValueError(f"unsupported metric: {metric!r}")
    rows = queries.select(query_id_col, query_vec_col).collect()
    if not rows:
        empty = corpus.sparkSession.createDataFrame(
            [], f"{query_id_col} {dict(queries.dtypes)[query_id_col]}, "
                f"{corpus_id_col} {dict(corpus.dtypes)[corpus_id_col]}, "
                f"{dist_col} double")
        return empty
    dims = {len(r[1]) for r in rows}
    if len(dims) != 1:
        raise ValueError(f"queries must share one dimension, got {dims}")
    d = dims.pop()
    qids = [r[0] for r in rows]
    Q = np.stack([np.asarray(r[1], dtype=np.float64) for r in rows])
    qn = np.linalg.norm(Q, axis=1)
    qid_t = dict(queries.dtypes)[query_id_col]
    cid_t = dict(corpus.dtypes)[corpus_id_col]
    out_ddl = f"__qid {qid_t}, __cid {cid_t}, {dist_col} double"

    def score(batches):
        for pdf in batches:
            vecs = pdf[corpus_vec_col]
            ok = vecs.map(lambda v: v is not None and len(v) == d)
            pdf = pdf[ok.values]
            if not len(pdf):
                continue
            M = np.stack(pdf[corpus_vec_col].map(
                lambda v: np.asarray(v, dtype=np.float64)).values)
            if metric == "euclidean":
                # direct form per query (nq is small by contract), not
                # the BLAS expansion: bit-identical to knn_arrow's
                # single-query scoring, no cancellation drift
                D = np.stack([np.sqrt(((M - q) ** 2).sum(axis=1))
                              for q in Q], axis=1)
            elif metric == "dotproduct":
                D = -(M @ Q.T)
            elif metric == "manhattan":
                D = np.stack([np.abs(M - q).sum(axis=1) for q in Q], axis=1)
            else:  # cosine, reference branch semantics
                nm = np.linalg.norm(M, axis=1)
                dot = M @ Q.T
                with np.errstate(divide="ignore", invalid="ignore"):
                    sim = np.clip(dot / (nm[:, None] * qn[None, :]),
                                  -1.0, 1.0)
                D = np.where((nm[:, None] == 0) | (qn[None, :] == 0),
                             1.0, 1.0 - sim)
            cids = pdf[corpus_id_col].values
            out_q, out_c, out_d = [], [], []
            for j, qid in enumerate(qids):
                col = D[:, j]
                top = min(k, len(col))
                # boundary ties break on corpus id, like the struct
                # sort — so the batch-local cut must keep EVERY
                # candidate tied at the k-th distance before the
                # (distance, cid) order picks the winners; a bare
                # argpartition[:top] keeps an arbitrary tied subset
                # and can drop the smallest-cid tie (common with
                # duplicate vectors in dedup-centric corpora)
                if top == len(col):
                    idx = np.arange(len(col))
                else:
                    part = np.argpartition(col, top - 1)
                    kth = col[part[top - 1]]
                    idx = np.nonzero(col <= kth)[0]
                idx = idx[np.lexsort((cids[idx], col[idx]))][:top]
                out_q += [qid] * top
                out_c += list(cids[idx])
                out_d += list(col[idx])
            yield pd.DataFrame({"__qid": out_q, "__cid": out_c,
                                dist_col: out_d})

    scored = corpus.select(corpus_id_col, corpus_vec_col) \
        .mapInPandas(score, out_ddl)
    topk = _per_query_topk(scored, k, dist_col, two_phase=False)
    return topk.select(F.col("__qid").alias(query_id_col),
                       F.col("__cid").alias(corpus_id_col),
                       F.col(dist_col))


#: per-centroid Column expressions stop being the right tier past this
#: many centroids: each row pays an O(nlist*dim) interpreted-HOF walk
#: (transform/aggregate lambdas never enter whole-stage codegen).
#: Above it, one Arrow-batched BLAS matmul against the
#: (broadcast-sized) centroid matrix does the same work vectorized.
#: r13 re-measure (VERDICT r12 #2 — the r12 expression folding changed
#: the balance this was tuned under; tools/tier_probe.py, sf0.1
#: embeddings 2000 rows x dim 64, best-of-3 noop):
#:   nlist      8     16     32     64    128    179    256    565
#:   expr    0.27   0.28   0.50   0.86   1.38   1.89   2.84   5.90
#:   arrow   0.27   0.25   0.24   0.18   0.17   0.19   0.20   0.18
#: (assign pass; the probe pass tracks it within 10%). The tiers TIE
#: at 8 and the Arrow tier wins from 16 up — the folding cut plan
#: analysis cost ~2x but the per-row interpreted walk still scales
#: linearly with nlist, so the crossover drops 32 -> 16. Every
#: fixed-nlist oracle query (nlist=8) stays on the bit-exact fold
#: path; sqrt(N)-sized builds take the BLAS tier as before (both
#: tiers are value-identical — first-minimum argmin / stable-argsort
#: tie-breaks, parity-tested in test_ann.py, and the 18 ANN oracle
#: queries were re-proven after this change).
#: cap: a TIER-CROSSOVER (same answers both sides), not a work bound —
#: past it the Arrow tier takes over, so nothing degenerates at scale.
EXPR_MAX_CENTROIDS = 16


def _centroid_d2(X, C, cn):
    """Squared euclidean row-x-centroid distances, BLAS expansion form
    (||x||^2 + ||c||^2 - 2 x.c). Cancellation can leave tiny negatives
    — harmless for the argmin/argsort consumers here."""
    import numpy as np
    return (X ** 2).sum(1)[:, None] + cn[None, :] - 2.0 * (X @ C.T)


def _stack_vecs(batch):
    import numpy as np
    return np.stack(batch.map(
        lambda v: np.asarray(v, dtype=np.float64)).values)


def probe_clusters_expr(centroids, qvec_col: Column, nprobe: int) -> Column:
    """Each row's ``nprobe`` nearest centroid indexes as an
    ``array<int>`` Column — the distributed analogue of
    ``IvfIndex.probe_clusters``. Orders by (centroid distance,
    centroid index): struct sort gives the same total order as the
    deterministic-IVF oracle's ``ORDER BY d, i``. The centroid matrix
    is broadcast-sized by construction — inlined as literals on the
    expression tier, shipped once in the UDF closure on the Arrow tier
    (> EXPR_MAX_CENTROIDS, where a stable argsort over one BLAS matmul
    replaces nlist generated-code branches; ties still break by
    centroid index)."""
    import numpy as np
    qv = qvec_col.cast("array<double>")
    if len(centroids) > EXPR_MAX_CENTROIDS:
        import pandas as pd
        C = np.asarray(centroids, dtype=np.float64)
        cn = (C ** 2).sum(1)
        take = min(nprobe, len(centroids))

        @F.pandas_udf("array<int>")
        def _probe(batch: pd.Series) -> pd.Series:
            if not len(batch):
                return pd.Series([], dtype=object)
            X = _stack_vecs(batch)
            d2 = _centroid_d2(X, C, cn)
            # stable argsort == ORDER BY (d, centroid index)
            idx = np.argsort(d2, axis=1, kind="stable")[:, :take]
            return pd.Series(list(idx.astype(np.int32)))

        return _probe(qv)
    # one transform lambda (with the element index as the tie-break
    # field) over the centroid matrix as a nested-array literal
    # instead of n_centroids struct copies (r12): same per-entry
    # arithmetic, same (d, i) total order — bit-identical probes,
    # ~n_centroids-fold smaller expression tree
    cents = F.lit([[float(x) for x in c] for c in centroids])
    cdist = F.transform(cents, lambda c, i: F.struct(
        F.sqrt(F.aggregate(
            F.zip_with(qv, c, lambda x, y: (x - y) * (x - y)),
            F.lit(0.0), lambda s, x: s + x)).alias("d"),
        i.alias("i")))
    return F.transform(F.slice(F.sort_array(cdist), 1, nprobe),
                       lambda s: s["i"])


def _np_dists(Q, C, metric: str):
    """(q, c) distance matrix, NumPy/BLAS — same metric semantics as
    functions/distance.py (cosine zero-norm => 1.0, clamped sim)."""
    import numpy as np
    if metric == "euclidean":
        # ||q-c||^2 = ||q||^2 + ||c||^2 - 2 q.c: one BLAS matmul, no
        # (q, c, d) diff tensor (the chunked diff variant measured 67 s
        # on the 10x all-pairs join; this is seconds). Cancellation can
        # produce tiny negatives -> clip before sqrt.
        sq = (Q ** 2).sum(1)[:, None] + (C ** 2).sum(1)[None, :] \
            - 2.0 * (Q @ C.T)
        return np.sqrt(np.clip(sq, 0.0, None))
    if metric == "manhattan":
        out = np.empty((len(Q), len(C)))
        step = max(1, int(4e7 // (C.shape[0] * C.shape[1] + 1)))
        for s in range(0, len(Q), step):
            out[s:s + step] = np.abs(
                Q[s:s + step, None, :] - C[None, :, :]).sum(-1)
        return out
    if metric == "dotproduct":
        return -(Q @ C.T)
    if metric == "cosine":
        nq = np.linalg.norm(Q, axis=1)
        nc = np.linalg.norm(C, axis=1)
        with np.errstate(divide="ignore", invalid="ignore"):
            sim = np.clip((Q @ C.T) / (nq[:, None] * nc[None, :]), -1.0, 1.0)
        return np.where((nq[:, None] == 0) | (nc[None, :] == 0), 1.0,
                        1.0 - sim)
    raise ValueError(f"unsupported metric: {metric!r}")


def knn_join_ivf_arrow(queries: DataFrame, index, k: int = DEFAULT_K,
                       nprobe: int = 3, metric: str = "euclidean",
                       query_id_col: str = "query_id",
                       query_vec_col: str = "query_vec",
                       dist_col: str = "distance") -> DataFrame:
    """The BLAS tier of the IVF similarity join — built for the
    all-pairs / corpus-sized-queries regime where the Column-expression
    tier's per-pair interpreted fold dominates (measured 28 s vs ~2 s
    at sf0.1 all-pairs).

    Plan shape: both sides shuffle ONCE on cluster id (the same
    co-partitioning as ``knn_join_ivf(broadcast_queries=False)``), then
    a cogroup-applyInPandas scores each cluster's queries against its
    corpus rows as one (q, c) matrix op and emits only the per-query
    local top-k; the global merge reduces queries x nprobe x k rows.
    Per-cluster candidate work is identical to the Column tier — same
    probes, same candidates, same answers (shared value oracle).
    """
    import numpy as np
    import pandas as pd

    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    if nprobe < 1:
        raise ValueError(f"nprobe must be >= 1, got {nprobe}")
    pcol = index.PARTITION_COL
    probes = probe_clusters_expr(index.centroids,
                                 F.col(query_vec_col), nprobe)
    q = queries.select(F.col(query_id_col).alias("__qid"),
                       F.col(query_vec_col).alias("__qvec"),
                       F.explode(probes).alias(pcol))
    corpus = index._live(index.table).select(
        F.col(index.id_col).alias("__cid"),
        F.col(index.vec_col).alias("__cvec"), pcol)

    def score(key, qpdf, cpdf):
        if not len(qpdf) or not len(cpdf):
            return pd.DataFrame({"__qid": [], "__cid": [], dist_col: []})
        Q = np.stack(qpdf["__qvec"].map(
            lambda v: np.asarray(v, dtype=np.float64)).values)
        C = np.stack(cpdf["__cvec"].map(
            lambda v: np.asarray(v, dtype=np.float64)).values)
        cids = cpdf["__cid"].values
        qids = qpdf["__qid"].values
        # local top-k per query, ties -> ascending corpus id (the same
        # total order as the struct-sort merge and the SQL oracle).
        # The query side scores in chunks bounding the D matrix to
        # ~4e7 cells (~320 MB f64): a skewed/under-partitioned cluster
        # degrades to more matmul calls, never to an OOM.
        out_q, out_c, out_d = [], [], []
        step = max(1, int(4e7) // max(1, len(C)))
        for s in range(0, len(Q), step):
            D = _np_dists(Q[s:s + step], C, metric)
            for r in range(D.shape[0]):
                idx = np.lexsort((cids, D[r]))[:k]
                out_q.extend([qids[s + r]] * len(idx))
                out_c.extend(cids[idx])
                out_d.extend(D[r, idx])
        return pd.DataFrame({"__qid": out_q, "__cid": out_c,
                             dist_col: out_d})

    qid_t = dict(q.dtypes)["__qid"]
    cid_t = dict(corpus.dtypes)["__cid"]
    pairs = q.groupBy(pcol).cogroup(corpus.groupBy(pcol)).applyInPandas(
        score, f"__qid {qid_t}, __cid {cid_t}, {dist_col} double")
    topk = _per_query_topk(pairs, k, dist_col, two_phase=False)
    return topk.select(F.col("__qid").alias(query_id_col),
                       F.col("__cid").alias(index.id_col),
                       F.col(dist_col))


def knn_join_ivf(queries: DataFrame, index, k: int = DEFAULT_K,
                 nprobe: int = 3, metric: str = "euclidean",
                 query_id_col: str = "query_id",
                 query_vec_col: str = "query_vec",
                 dist_col: str = "distance",
                 two_phase: bool = True,
                 broadcast_queries: bool = True) -> DataFrame:
    """IVF-accelerated similarity join: each query scores only the rows
    of its ``nprobe`` nearest clusters.

    ``knn_join`` is exact but every corpus row meets every query (a
    broadcast nested-loop by construction). At 100 TB that is the
    bottleneck: |corpus| x |queries| distance evaluations. This variant
    turns the crossJoin into a broadcast hash EQUI-join on the cluster
    id: queries explode to (query, probe_cluster) rows driver-free (the
    centroid table is broadcast-sized, probe selection is a pure Column
    expression), the corpus side keeps its IVF assignment from the
    index, and the join prunes the candidate set to ~nprobe/n_centroids
    of the corpus per query before any distance is computed. With the
    index table saved partitioned by cluster, the probe filter is real
    partition pruning at the source.

    ``index`` is an :class:`~..operators.ann.IvfIndex` (tombstones are
    respected). Probe selection orders by (centroid distance, centroid
    index) — the same total order as the deterministic-IVF oracle, so
    the whole join is value-checkable when the index was built with
    ``IvfIndex.build_deterministic``.

    Reference: generalizes NEAREST TO (executor.go:251-388) to batch
    queries, accelerated the way faiss IVF batch search prunes, but as
    a join the optimizer can reorder.
    """
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    if nprobe < 1:
        raise ValueError(f"nprobe must be >= 1, got {nprobe}")
    probes = probe_clusters_expr(index.centroids,
                                 F.col(query_vec_col), nprobe)
    q = queries.select(
        F.col(query_id_col).alias("__qid"),
        F.col(query_vec_col).alias("__qvec"),
        F.explode(probes).alias(index.PARTITION_COL))
    # small query batches broadcast (and get dynamic partition pruning
    # on a saved layout); a query side too big to broadcast — e.g.
    # all-pairs near-neighbor where queries ARE a corpus — shuffles
    # both sides by cluster id instead, so each cluster's candidates
    # co-locate and the pairwise work stays bounded per cluster
    q = F.broadcast(q) if broadcast_queries else q
    corpus = index._live(index.table)
    pairs = corpus.select(
        F.col(index.id_col).alias("__cid"),
        F.col(index.vec_col).alias("__cvec"), index.PARTITION_COL
    ).join(q, index.PARTITION_COL).select(
        "__qid", "__cid",
        distance(metric, F.col("__cvec"), F.col("__qvec")).alias(dist_col)
    ).filter(F.col(dist_col).isNotNull())
    topk = _per_query_topk(pairs, k, dist_col, two_phase)
    return topk.select(F.col("__qid").alias(query_id_col),
                       F.col("__cid").alias(index.id_col),
                       F.col(dist_col))
