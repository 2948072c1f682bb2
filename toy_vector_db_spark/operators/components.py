"""Connected components over candidate-pair graphs.

Near-dup pairs are edges; the training-pipeline need is the transitive
cluster (keep one doc per component, not per pair — A~B, B~C must
collapse A,B,C together even when A~C was never scored).

Two tiers (r8), routed by measured size (``chooser.cc_local_fits`` —
edge count for integral ids, a measured-RSS byte estimate for string
ids whose objects live in the union-find dict):
small graphs — micro-batch sweeps, LSH-capped candidate sets — run
union-find as ONE executor task (``_components_local``: linear work,
no iteration, ~2 s at 4M edges vs ~17 s of round-trip latency the
propagation rounds cost on a 100k-edge graph at the 100x scale);
larger graphs take the iterative tier below.

Spark-idiomatic iterative algorithm: min-label propagation with path
compression. Each round every node takes the minimum label among
itself and its neighbors (one join + one groupBy, both shuffling on
node id), then compresses one pointer level — label <-
prev_label(label) — with a join against the PREVIOUS round's
materialized label table. Plain 1-hop propagation moves the minimum
along a duplicate CHAIN one edge per round: O(diameter) rounds, and a
chain longer than ``max_iter`` (drifting boilerplate, versioned
documents — a real shape at corpus scale) would fail to converge.
Compression makes the covered distance compound
Fibonacci-style (d_t ~ d_{t-1} + d_{t-2}: the lookup table lags one
round) — still O(log diameter) rounds, so ``max_iter=50`` covers any
diameter that fits in an id type. Two cost decisions keep the common
case at plain 1-hop cost: (a) the lookup uses the PREVIOUS round's
checkpointed table, not the current frame — the current-table variant
feeds one unmaterialized frame into both sides of the self-join,
re-executing the neighbor-min aggregation twice per round (measured
2x wall on the 100x corpus); (b) the first two rounds skip
compression entirely, because the capped candidate generators that
feed this operator emit star-shaped families (diameter ~2) that
converge immediately — only graphs still unconverged by round 2 pay
for the compression join. AQE coalesces the shuffles as labels
shrink; ``localCheckpoint`` truncates the growing lineage each round
(the standard guard for iterative DataFrame algorithms).

Convergence detection: for integral node ids the global label sum
(summed as decimal(38,0) — a bigint SUM overflows Long at extreme
node-count x id magnitude, and ANSI mode raises) is strictly monotone
until fixpoint, so the probe is one cheap agg per round. For any
other id type (strings, fractional numerics — where the exact sum is
unavailable) the probe joins old vs new labels and stops at the first
changed row (``limit(1).count()`` — an early-exit existence check,
not a full count).

Oracle: DuckDB recursive CTE computes the transitive closure and takes
min reachable id per node — see workload.dedup_components.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _components_local(edges: DataFrame) -> DataFrame:
    """Union-find over the whole edge list in ONE executor task
    (``coalesce(1)`` on the already-checkpointed frame — no shuffle,
    one task reads the cached blocks). Union-by-min with path
    compression keeps the invariant component = min reachable id
    (linking always attaches the larger root under the smaller;
    Python ``<`` matches the propagate tier's ``least`` for both
    integral and string ids). Linear work, executor-side — never a
    driver collect."""
    from collections.abc import Iterator

    import pandas as pd

    id_t = dict(edges.dtypes)["src"]
    schema = f"node {id_t}, component {id_t}"

    def uf(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        parent: dict = {}

        def find(x):
            root = x
            while parent[root] != root:
                root = parent[root]
            while parent[x] != root:
                parent[x], x = root, parent[x]
            return root

        for pdf in batches:
            # .tolist() up front: Python ints/strs, not boxed numpy
            # scalars — measured 12.2 s vs 14.8 s at 4M edges, and the
            # dict holds one shared object per node instead of a ~32 B
            # numpy box per reference. The caller already dropped null
            # edges, so a BIGINT column arrives int64 (a null would
            # have forced float64 and >2^53 ids would lose precision —
            # and find(NaN) would loop forever since NaN != NaN).
            for a, b in zip(pdf["src"].tolist(), pdf["dst"].tolist()):
                parent.setdefault(a, a)
                parent.setdefault(b, b)
                ra, rb = find(a), find(b)
                if ra != rb:
                    lo, hi = (ra, rb) if ra < rb else (rb, ra)
                    parent[hi] = lo
        yield pd.DataFrame([(n, find(n)) for n in parent],
                           columns=["node", "component"])

    # cap: single-task by DESIGN — this tier only runs when the auto
    # route's byte estimate fits chooser.CC_LOCAL_MEM_BUDGET (explicit
    # tier="local" callers own the bound). Measured worker peak at the
    # 4M-edge crossover: ~0.9 GB for int ids, ~1.7 GB for 64-char
    # string ids (see chooser.py) — the distributed tier takes over
    # past the crossover.
    return edges.coalesce(1).mapInPandas(uf, schema)


def connected_components(pairs: DataFrame, a_col: str = "id_a",
                         b_col: str = "id_b",
                         max_iter: int = 50,
                         tier: str = "auto") -> DataFrame:
    """(id_a, id_b) edge list -> (node, component), component = min id
    reachable. Only nodes that appear in an edge are returned.

    ``tier``: "local" runs union-find as one executor task (exact at
    any diameter, no rounds — right for micro-batch pair graphs and
    LSH-capped candidate sets); "propagate" is the iterative
    min-label propagation documented above (right for corpus-scale
    graphs); "auto" routes via ``chooser.cc_local_fits`` (one cheap
    agg over the checkpointed edge frame — edge count, plus avg id
    length for string ids whose footprint scales with length).
    ``max_iter`` applies to the propagate tier only. Edges with a
    null endpoint are dropped before routing (no duplicate evidence;
    and NaN ids would hang the local tier's union-find)."""
    if tier not in ("auto", "local", "propagate"):
        raise ValueError(f"unknown components tier {tier!r}")
    fwd = pairs.select(F.col(a_col).alias("src"), F.col(b_col).alias("dst"))
    rev = pairs.select(F.col(b_col).alias("src"), F.col(a_col).alias("dst"))
    # Drop edges with a null endpoint BEFORE routing: a null id carries
    # no duplicate evidence (the candidate generators never emit one),
    # and the local tier's union-find would otherwise hang — Arrow
    # converts a BIGINT column containing a null to float64, and
    # find(NaN) loops forever because NaN != NaN. Dropping also keeps
    # BIGINT ids int64 in pandas (no >2^53 float64 precision loss).
    edges = fwd.unionByName(rev).na.drop().distinct().localCheckpoint()

    if tier == "auto":
        from .chooser import cc_local_fits
        from pyspark.sql.types import StringType
        if isinstance(edges.schema["src"].dataType, StringType):
            # string ids: the union-find dict holds the id OBJECTS, so
            # the footprint scales with id length — estimate bytes
            # from the measured per-edge cost (one agg over the
            # checkpointed frame; avg twice is fine, it is cheap).
            n, avg_len = edges.agg(
                F.count(F.lit(1)),
                F.avg(F.length("src") + F.length("dst"))).first()
            tier = "local" if cc_local_fits(n, avg_len or 0.0) \
                else "propagate"
        else:
            tier = "local" if cc_local_fits(edges.count()) \
                else "propagate"
    if tier == "local":
        return _components_local(edges)

    labels = edges.select(F.col("src").alias("node")).distinct() \
        .withColumn("label", F.col("node")).localCheckpoint()

    from pyspark.sql.types import IntegralType
    numeric_ids = isinstance(labels.schema["label"].dataType, IntegralType)

    def label_sum(df: DataFrame):
        # decimal(38,0), not the native type: a bigint SUM over enough
        # nodes x large ids overflows Long (ANSI mode raises), and the
        # probe must stay exact — any precision loss could fake a
        # fixpoint. Exact to 1e38; the agg stays one cheap job.
        # (Integral ids only — a fractional id would truncate in this
        # cast, so non-integral types take the changed-label probe.)
        return df.agg(F.sum(F.col("label").cast("decimal(38,0)"))) \
            .first()[0]

    prev_sum = label_sum(labels) if numeric_ids else None

    for rnd in range(max_iter):
        nbr_min = (edges.join(labels, edges.dst == labels.node)
                   .groupBy("src").agg(F.min("label").alias("__nl")))
        stepped = (labels.join(nbr_min, labels.node == nbr_min.src, "left")
                   .select("node",
                           F.least("label", F.coalesce("__nl", "label"))
                           .alias("label")))
        if rnd < 2:
            # Skip compression while it cannot pay: round 0's lookup
            # table is the identity (a no-op join), and the capped
            # candidate generators feeding this operator emit
            # star-shaped families (diameter ~2) that converge in the
            # first rounds anyway — those invocations run at plain
            # 1-hop cost. Only graphs still unconverged by round 2
            # (long chains) buy the extra per-round join.
            new_labels = stepped.localCheckpoint()
        else:
            # path compression: label <- prev_label(label). Every label
            # is itself a node id (labels start as ids and only node ids
            # propagate), so the PREVIOUS round's checkpointed table
            # serves as the lookup — already materialized, no
            # re-execution of the stepped frame. A label's owner may
            # have moved further this round; using its last-round
            # position is still monotone (labels only ever decrease
            # toward the component minimum) and still compounds the
            # covered distance geometrically.
            lut = labels.select(F.col("node").alias("label"),
                                F.col("label").alias("__l2"))
            new_labels = (stepped.join(lut, "label", "left")
                          .select("node",
                                  F.least("label",
                                          F.coalesce("__l2", "label"))
                                  .alias("label"))
                          .localCheckpoint())
        if numeric_ids:
            cur_sum = label_sum(new_labels)
            converged = cur_sum == prev_sum
            prev_sum = cur_sum
        else:
            # SUM over string labels would be NULL / an ANSI error;
            # probe for any changed label instead (early-exit limit 1).
            converged = (new_labels.alias("n")
                         .join(labels.alias("o"), "node")
                         .filter(F.col("n.label") != F.col("o.label"))
                         .limit(1).count() == 0)
        labels = new_labels
        if converged:
            break
    else:
        raise RuntimeError(f"did not converge within {max_iter} rounds")

    return labels.select(F.col("node"), F.col("label").alias("component"))


def dup_clusters(pairs: DataFrame, a_col: str = "id_a",
                 b_col: str = "id_b") -> DataFrame:
    """Components summarized: (component, n_docs, keep=min id)."""
    cc = connected_components(pairs, a_col, b_col)
    return (cc.groupBy("component")
            .agg(F.count("*").alias("n_docs"),
                 F.min("node").alias("keep")))
