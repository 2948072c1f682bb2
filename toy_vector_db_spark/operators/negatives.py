"""Negative sampling for contrastive / metric-learning training data.

Two standard recipes over an embedding (or document) table:

- ``in_batch_negatives``: the cheap tier — partition the corpus into
  deterministic md5 "batches", order each batch by a second md5, and
  pair every anchor with the next ``k`` rows of its batch (what a
  contrastive trainer gets for free from co-batched examples, made
  explicit and reproducible). Map-side hashing + ONE window per
  batch; no distance computation at all.

- ``hard_negative_join``: the quality tier — for every anchor, the
  ``k`` NEAREST rows with a DIFFERENT label (hard negatives, the
  pairs that actually move a contrastive loss). The exact tier scores
  blocked-BLAS (every anchor meets every corpus block — exact, the
  block key is parallelism not pruning); ``hard_negative_join_ivf``
  is the all-anchors scale tier (IVF cluster pruning, one shuffle per
  side). Both apply the same-label mask INSIDE the matrix step — the
  filter composes BEFORE top-k selection, which is the correctness
  point (filter-then-rank, not rank-then-filter).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .knn import _per_query_topk


def in_batch_negatives(df: DataFrame, key: str, k: int = 4,
                       batches: int = 64,
                       label_col: str | None = None,
                       salt: str = "negs") -> DataFrame:
    """(anchor, negative, offset): each row paired with the next ``k``
    rows of its md5-batch in md5 order (offset 1..k; tail rows of a
    batch get fewer). With ``label_col``, same-label pairs are dropped
    AFTER pairing (the in-batch convention: the batch is fixed, known
    collisions are masked). Deterministic and engine-reproducible —
    both the batch assignment and the in-batch order are md5-derived."""
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    if batches < 1:
        raise ValueError(f"batches must be >= 1, got {batches}")
    from pyspark.sql import Window
    h = F.md5(F.concat(F.lit(salt), F.col(key).cast("string")))
    bucket = (F.conv(F.substring(h, 1, 8), 16, 10).cast("long")
              % batches)
    base = df.select(F.col(key).alias("anchor"),
                     *([F.col(label_col).alias("__albl")]
                       if label_col else []),
                     h.alias("__h"), bucket.alias("__b"))
    win = Window.partitionBy("__b").orderBy(F.col("__h").asc(),
                                            F.col("anchor").asc())
    # window exprs can't sit inside a generator: materialize the k
    # leads as columns first, then fold them into an array and explode
    lead_cols = []
    for i in range(1, k + 1):
        lead_cols.append(F.lead("anchor", i).over(win).alias(f"__n{i}"))
        if label_col:
            lead_cols.append(F.lead("__albl", i).over(win)
                             .alias(f"__nl{i}"))
    staged = base.select("anchor",
                         *(["__albl"] if label_col else []), *lead_cols)
    leads = F.array(*[
        F.struct(F.lit(i).alias("offset"),
                 F.col(f"__n{i}").alias("negative"),
                 *([F.col(f"__nl{i}").alias("__nlbl")]
                   if label_col else []))
        for i in range(1, k + 1)])
    out = (staged.select("anchor",
                         *(["__albl"] if label_col else []),
                         F.explode(leads).alias("__n"))
           .filter(F.col("__n.negative").isNotNull()))
    if label_col:
        out = out.filter(F.col("__n.__nlbl") != F.col("__albl"))
    return out.select("anchor", F.col("__n.negative").alias("negative"),
                      F.col("__n.offset").alias("offset"))


def hard_negative_join_ivf(df: DataFrame, index, k: int = 4,
                           nprobe: int = 3,
                           label_col: str = "label",
                           metric: str = "euclidean",
                           dist_col: str = "distance",
                           cluster_cap: int | None = None) -> DataFrame:
    """The SCALE tier of hard-negative mining: IVF cluster pruning +
    per-cluster BLAS scoring (the ``knn_join_ivf_arrow`` shape), with
    the label mask applied INSIDE the matrix step (same-label
    candidates are set to +inf before the local top-k, so the filter
    still composes before ranking). Exact within the probed clusters;
    the probe set is the documented IVF approximation, deterministic
    under ``build_deterministic`` — so the whole tier value-oracles.
    |corpus| x |corpus| never materializes: both sides meet only
    within shared clusters, one shuffle each.

    ``cluster_cap`` bounds PER-ANCHOR candidate volume for the
    all-anchors mining regime: each probed cluster is deterministically
    subsampled to its ``cluster_cap`` members with the smallest
    md5(id) (the ``det_sample`` idiom — any SQL engine replays it), so
    per-anchor work is nprobe*cap regardless of corpus size and total
    work is O(N) instead of the O(N^1.5) that ivf_nlist occupancy
    (~sqrt(N)/4 per cluster) gives uncapped. The trade is documented
    mining recall: negatives are the hardest within the SAMPLED pool,
    not the full probed clusters — acceptable for contrastive mining,
    where candidate diversity matters more than exact rank. ``None``
    keeps the exact-within-probes semantics."""
    import numpy as np
    import pandas as pd

    from .knn import probe_clusters_expr

    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    if nprobe < 1:
        raise ValueError(f"nprobe must be >= 1, got {nprobe}")
    if cluster_cap is not None and cluster_cap < 1:
        raise ValueError(f"cluster_cap must be >= 1, got {cluster_cap}")
    pcol = index.PARTITION_COL
    probes = probe_clusters_expr(index.centroids,
                                 F.col(index.vec_col), nprobe)
    q = df.select(F.col(index.id_col).alias("__qid"),
                  F.col(index.vec_col).alias("__qvec"),
                  F.col(label_col).alias("__qlbl"),
                  F.explode(probes).alias(pcol))
    corpus = index._live(index.table).select(
        F.col(index.id_col).alias("__cid"),
        F.col(index.vec_col).alias("__cvec"),
        F.col(label_col).alias("__clbl"), pcol)
    if cluster_cap is not None:
        from pyspark.sql import Window
        w = Window.partitionBy(pcol).orderBy(
            F.md5(F.col("__cid").cast("string")), F.col("__cid"))
        corpus = (corpus.withColumn("__r", F.row_number().over(w))
                  .filter(F.col("__r") <= cluster_cap).drop("__r"))

    def score(key, qpdf, cpdf):
        if not len(qpdf) or not len(cpdf):
            return pd.DataFrame({"__qid": [], "__cid": [], dist_col: []})
        from .knn import _np_dists
        Q = np.stack(qpdf["__qvec"].map(
            lambda v: np.asarray(v, dtype=np.float64)).values)
        C = np.stack(cpdf["__cvec"].map(
            lambda v: np.asarray(v, dtype=np.float64)).values)
        cids = cpdf["__cid"].values
        qids = qpdf["__qid"].values
        qlbl = qpdf["__qlbl"].values
        clbl = cpdf["__clbl"].values
        out_q, out_c, out_d = [], [], []
        # chunk the query side (same D-matrix memory bound as
        # knn_join_ivf_arrow): the label mask still applies INSIDE the
        # matrix step, before the local top-k
        step = max(1, int(4e7) // max(1, len(C)))
        for s in range(0, len(Q), step):
            D = _np_dists(Q[s:s + step], C, metric)
            same = qlbl[s:s + step, None] == clbl[None, :]
            D = np.where(same, np.inf, D)
            for r in range(D.shape[0]):
                order = np.lexsort((cids, D[r]))[:k]
                order = order[np.isfinite(D[r, order])]
                out_q.extend([qids[s + r]] * len(order))
                out_c.extend(cids[order])
                out_d.extend(D[r, order])
        return pd.DataFrame({"__qid": out_q, "__cid": out_c,
                             dist_col: out_d})

    qid_t = dict(q.dtypes)["__qid"]
    cid_t = dict(corpus.dtypes)["__cid"]
    pairs = q.groupBy(pcol).cogroup(corpus.groupBy(pcol)).applyInPandas(
        score, f"__qid {qid_t}, __cid {cid_t}, {dist_col} double")
    topk = _per_query_topk(pairs, k, dist_col, two_phase=False)
    return (topk.withColumnRenamed("__qid", "query_id")
            .withColumnRenamed("__cid", index.id_col))


def hard_negative_join(df: DataFrame, k: int = 4,
                       id_col: str = "vec_id",
                       vec_col: str = "embedding",
                       label_col: str = "label",
                       metric: str = "cosine",
                       dist_col: str = "distance",
                       anchors: DataFrame | None = None,
                       blocks: int = 32) -> DataFrame:
    """(query_id, vec_id, distance): for every anchor, the ``k``
    nearest rows whose label DIFFERS — exact tier (the label filter
    runs before ranking, so near-duplicates of the anchor's own class
    can never crowd out true negatives). ``anchors`` restricts the
    query side BEFORE the pair product (the exact tier is
    |anchors| x |corpus| by construction — bound the anchor batch
    here, or use ``hard_negative_join_ivf`` for the all-anchors
    regime).

    Scoring is blocked BLAS, not a per-pair Column fold: the corpus
    hashes into ``blocks``, every anchor meets every block (the block
    key is pure parallelism, NOT pruning — exactness holds), and each
    anchors-x-block pair scores as one matrix op with the same-label
    mask applied before the local top-k. Measured 8x over the
    interpreted-fold crossJoin at |anchors|=50, |corpus|=20k."""
    import numpy as np
    import pandas as pd

    from .knn import _np_dists

    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    if blocks < 1:
        raise ValueError(f"blocks must be >= 1, got {blocks}")
    src = anchors if anchors is not None else df
    q = src.select(
        F.col(id_col).alias("__qid"), F.col(vec_col).alias("__qvec"),
        F.col(label_col).alias("__qlbl"),
        F.explode(F.sequence(F.lit(0), F.lit(blocks - 1))).alias("__blk"))
    corpus = df.select(
        F.col(id_col).alias("__cid"), F.col(vec_col).alias("__cvec"),
        F.col(label_col).alias("__clbl"),
        F.pmod(F.hash(F.col(id_col)), F.lit(blocks)).alias("__blk"))

    def score(key, qpdf, cpdf):
        if not len(qpdf) or not len(cpdf):
            return pd.DataFrame({"__qid": [], "__cid": [], dist_col: []})
        Q = np.stack(qpdf["__qvec"].map(
            lambda v: np.asarray(v, dtype=np.float64)).values)
        C = np.stack(cpdf["__cvec"].map(
            lambda v: np.asarray(v, dtype=np.float64)).values)
        D = _np_dists(Q, C, metric)
        same = (qpdf["__qlbl"].values[:, None]
                == cpdf["__clbl"].values[None, :])
        D = np.where(same, np.inf, D)
        cids = cpdf["__cid"].values
        qids = qpdf["__qid"].values
        out_q, out_c, out_d = [], [], []
        for r in range(D.shape[0]):
            order = np.lexsort((cids, D[r]))[:k]
            order = order[np.isfinite(D[r, order])]
            out_q.extend([qids[r]] * len(order))
            out_c.extend(cids[order])
            out_d.extend(D[r, order])
        return pd.DataFrame({"__qid": out_q, "__cid": out_c,
                             dist_col: out_d})

    qid_t = dict(q.dtypes)["__qid"]
    cid_t = dict(corpus.dtypes)["__cid"]
    pairs = q.groupBy("__blk").cogroup(corpus.groupBy("__blk")) \
        .applyInPandas(score,
                       f"__qid {qid_t}, __cid {cid_t}, {dist_col} double")
    return (_per_query_topk(pairs, k, dist_col, two_phase=False)
            .withColumnRenamed("__qid", "query_id")
            .withColumnRenamed("__cid", id_col))
