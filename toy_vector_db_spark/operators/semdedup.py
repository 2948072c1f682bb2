"""SemDeDup-style semantic deduplication over an embedding column.

Public recipe (Abbas et al., "SemDeDup: Data-efficient learning at
web-scale through semantic deduplication", arXiv:2303.09540): cluster
the embedding space, compare points only WITHIN their cluster, and
keep one representative per group of semantically-near-identical
points. Clustering turns the global O(n^2) pairwise problem into
per-cluster work — the same blocking idea as
``dedup.cosine_near_dup_blocked``, with the block key learned from the
data instead of taken from a label column.

Spark-first composition (no new physical operator needed):

1. cluster assignment — ``IvfIndex`` (map-only nearest-centroid pass;
   ``build_deterministic`` for a bit-reproducible, SQL-checkable
   assignment, ``build`` for Lloyd-trained centroids);
2. within-cluster cosine pairs — ``cosine_near_dup_blocked`` on the
   ``__cluster`` key (Arrow/BLAS tier per cluster);
3. group → representative — ``connected_components`` on the pair
   graph, winner = smallest id per component.

Scale design (100 TB): the only all-to-all movement is the hash
shuffle of (id, vector) rows on cluster id; pair generation is
cluster-local BLAS; components iterate on the (usually tiny) pair
graph. Cluster count is the knob that bounds per-executor work —
``n_clusters=None`` (the default) sizes it by the one shared IVF
rule, ``chooser.ivf_nlist`` (~4*sqrt(n)), so per-cluster occupancy
stays ~sqrt(n)/4 and total pair work is O(n^1.5) instead of the
O(n^2/k) a pinned k degenerates to as the corpus grows (measured:
the pinned-8 form went 38x for the second 10x decade on the derived
set; auto-sized it tracks the suite's sublinear envelope). Pass an
explicit n_clusters only when the block count must match an
external partitioning.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .ann import IvfIndex
from .chooser import ivf_nlist
from .components import connected_components
from .dedup import cosine_near_dup_blocked


def semantic_clusters(df: DataFrame, n_clusters: int | None = None,
                      id_col: str = "vec_id", vec_col: str = "embedding",
                      deterministic: bool = True) -> DataFrame:
    """Rows of ``df`` plus a ``__cluster`` int column (nearest
    centroid). ``n_clusters=None`` auto-sizes via ``ivf_nlist``
    (one footer-served count job). ``deterministic=True`` uses
    md5-sampled init-only centroids (any SQL engine reproduces them —
    the value-oracle path); ``False`` trains KMeans on a bounded
    sample (better blocking on strongly clustered data, not
    bit-reproducible)."""
    if n_clusters is None:
        n_clusters = ivf_nlist(df.count())
    if deterministic:
        idx = IvfIndex.build_deterministic(df, n_centroids=n_clusters,
                                           id_col=id_col, vec_col=vec_col)
    else:
        idx = IvfIndex.build(df, n_centroids=n_clusters,
                             id_col=id_col, vec_col=vec_col)
    return idx.table


def semantic_dup_pairs(df: DataFrame, n_clusters: int | None = None,
                       threshold: float = 0.95,
                       id_col: str = "vec_id", vec_col: str = "embedding",
                       deterministic: bool = True) -> DataFrame:
    """Within-cluster cosine near-dup pairs (id_a < id_b, cosine_sim).

    Cross-cluster near-dups are invisible by design — SemDeDup's
    documented recall/cost trade; raise n_clusters for cost, lower it
    for recall."""
    clustered = semantic_clusters(df, n_clusters, id_col, vec_col,
                                  deterministic)
    return cosine_near_dup_blocked(clustered, "__cluster", id_col=id_col,
                                   vec_col=vec_col, threshold=threshold)


def semantic_dedup(df: DataFrame, n_clusters: int | None = None,
                   threshold: float = 0.95,
                   id_col: str = "vec_id", vec_col: str = "embedding",
                   deterministic: bool = True) -> DataFrame:
    """Survivors after semantic dedup: one representative (smallest
    id) per connected group of within-cluster near-dups; rows with no
    near-dup pass through untouched.

    The anti-join driver is the loser set (nodes whose component
    label — the group minimum — is not themselves), which is at most
    the number of near-dup rows: tiny next to the corpus, so Spark
    broadcasts it and the survivors pass is map-side."""
    pairs = semantic_dup_pairs(df, n_clusters, threshold, id_col, vec_col,
                               deterministic)
    comps = connected_components(pairs)
    losers = comps.filter(F.col("node") != F.col("component")) \
        .select(F.col("node").alias(id_col))
    return df.join(losers, id_col, "left_anti")
