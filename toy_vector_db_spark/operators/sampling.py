"""Deterministic sampling and dataset splitting for training pipelines.

Beyond-parity extension (the reference has no sampling; its only
"random" surface is the random-vector constructor,
/root/reference/pkg/core/vector/vector.go:56-71). These are the
data-mixing primitives a 100 TB pre-training corpus needs: drawing a
reproducible subsample, carving train/held-out splits, and enforcing
per-stratum quotas — WITHOUT a global shuffle or a stateful RNG.

Everything keys off ``md5(key)``: each row's fate is a pure function
of its id, so

  * results are identical across runs, executors, partition layouts,
    and engines (the DuckDB oracle recomputes the same md5 ordering),
  * membership is stable under corpus growth (a row never flips split
    when other rows are added — critical for contamination control),
  * no shuffle: sampling/splitting is a map-only filter; Catalyst
    pushes the projection to the scan.

The hash is uniform on [0, 1) via the first 8 hex digits / 2^32 —
the same engine-portable construction as operators/ann.hyperplanes.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def hash_uniform(key: Column, salt: str = "") -> Column:
    """Deterministic uniform [0, 1) from a row key: first 8 hex digits
    of md5(salt + key) / 2^32. Engine-portable (md5 + hex parse)."""
    h = F.md5(F.concat(F.lit(salt), key.cast("string")))
    return F.conv(F.substring(h, 1, 8), 16, 10).cast("long") / F.lit(2.0 ** 32)


def hash_sample(df: DataFrame, key: str, fraction: float,
                salt: str = "") -> DataFrame:
    """Reproducible ``fraction``-sample: keep rows with
    hash_uniform(key) < fraction. Map-only — no shuffle, no RNG state;
    the sample is a stable subset (growing the corpus never evicts a
    previously sampled row)."""
    return df.filter(hash_uniform(F.col(key), salt) < fraction)


def train_test_split(df: DataFrame, key: str, test_fraction: float = 0.1,
                     salt: str = "split") -> DataFrame:
    """Append a ``split`` column ('test' iff hash_uniform < fraction,
    else 'train'). One deterministic pass; a row's split never changes
    as the corpus grows — the contamination-safety property."""
    return df.withColumn(
        "split",
        F.when(hash_uniform(F.col(key), salt) < test_fraction,
               F.lit("test")).otherwise(F.lit("train")))


def stratified_sample(df: DataFrame, key: str, strata_col: str,
                      fractions: dict[str, float],
                      default_fraction: float = 0.0,
                      salt: str = "") -> DataFrame:
    """Per-stratum hash sampling (data-mixing quotas): stratum s keeps
    ``fractions[s]`` of its rows, unlisted strata keep
    ``default_fraction``. Still map-only — the per-stratum threshold is
    a CASE expression, not a per-group shuffle."""
    thr = F.lit(default_fraction)
    for value, frac in sorted(fractions.items()):
        thr = F.when(F.col(strata_col) == value, F.lit(frac)).otherwise(thr)
    return df.filter(hash_uniform(F.col(key), salt) < thr)


def weighted_sample(df: DataFrame, key: str, weight: Column,
                    salt: str = "") -> DataFrame:
    """Quality-weighted deterministic sampling (curriculum mixing):
    keep a row iff ``hash_uniform(key) < weight``, where ``weight`` is
    any per-row Column in [0, 1] — e.g. a quality score, or
    ``pow(quality, 2)`` to bias harder toward the top of the
    distribution. Expected keep-rate per row IS its weight; membership
    is stable under corpus growth, the draw is reproducible across
    engines (md5), and the whole thing stays a map-only scan filter —
    the curriculum never costs a shuffle."""
    return df.filter(hash_uniform(F.col(key), salt) < weight)


def token_budget_sample(df: DataFrame, budgets: dict[str, int],
                        key: str = "doc_id", source_col: str = "source",
                        text_col: str = "text",
                        salt: str = "budget",
                        n_tok_col: str | None = None) -> DataFrame:
    """Per-source token-budget mixture construction (the Pile/Dolma
    recipe: "take ~N tokens from each source"): within every source,
    walk the docs in deterministic md5 order and keep them until the
    source's token budget is met. The doc that CROSSES the budget is
    kept (the mixture reaches >= budget whenever the source has enough
    tokens), every later doc is dropped. Unlisted sources contribute
    nothing.

    Output: the kept rows + (n_tok, cum_before) — cum_before is the
    tokens taken from this source BEFORE this doc, so downstream
    curriculum code can trim the final doc if exact budgets matter.

    Determinism: ordering is (hash_uniform(key), key) — fully
    reproducible and engine-portable; membership changes only if the
    source's doc SET changes (unlike fraction sampling, adding docs can
    displace later-ordered ones — budgets are quotas, not fractions).

    Scale: the per-source running sum is a window over
    partitionBy(source) — one source = one task, the honest exact
    semantics (a cumulative walk is sequential by definition). At
    100 TB per source, cut the sequential span first with the map-only
    ``hash_sample`` at fraction ~= 2*budget/total_source_tokens (the
    per-source totals are one cheap agg), then run this exact pass on
    the ~2x-budget remainder — the window then walks bounded data.
    """
    from pyspark.sql import Window

    from ..functions.text import token_count

    if not budgets:
        raise ValueError("budgets must name at least one source")
    budget = F.lit(None).cast("long")
    for src, b in sorted(budgets.items()):
        if b < 0:
            raise ValueError(f"negative budget for {src!r}: {b}")
        budget = F.when(F.col(source_col) == src, F.lit(int(b))) \
            .otherwise(budget)
    w = (Window.partitionBy(source_col)
         .orderBy(hash_uniform(F.col(key), salt), F.col(key))
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    # n_tok_col: pre-tokenized counts (a real tokenizer — e.g. BPE
    # symbol counts from operators/bpe.segment) instead of the default
    # whitespace token_count; the walk itself is tokenizer-agnostic
    n_tok = (F.col(n_tok_col) if n_tok_col
             else token_count(F.col(text_col)))
    staged = df.withColumn("n_tok", n_tok.cast("bigint")) \
        .withColumn("cum_before",
                    (F.sum("n_tok").over(w) - F.col("n_tok")).cast("bigint"))
    return staged.filter(budget.isNotNull() & (F.col("cum_before") < budget))


def sample_k_per_group(df: DataFrame, key: str, group_col: str,
                       k: int, salt: str = "kpg") -> DataFrame:
    """EXACT ``k`` rows per group (fewer if the group is smaller) —
    the quota form of stratified sampling for when the spec is "N
    examples per source/language", not a fraction. Membership is the
    md5 rank within the group, so it is deterministic, engine-
    reproducible, and STABLE under corpus growth in the hash-sample
    sense: a row leaves the sample only when a new row hashes below
    it, never by reshuffling.

    Requires ``key`` to be UNIQUE within each group: both sort keys
    (md5(salt+key), then key) collapse for rows sharing a key value,
    so duplicate keys make the tie-break — and therefore sample
    membership — engine-dependent. Deduplicate or synthesize a unique
    key first if the frame can carry repeats.

    One shuffle on the group key; the rank is a per-group window (no
    global sort). Hot groups are bounded by the same skew treatments
    as any keyed window (salt the group upstream if one group is half
    the corpus)."""
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    from pyspark.sql import Window
    h = F.md5(F.concat(F.lit(salt), F.col(key).cast("string")))
    win = Window.partitionBy(group_col).orderBy(h.asc(),
                                                F.col(key).asc())
    return (df.withColumn("__rk", F.row_number().over(win))
            .filter(F.col("__rk") <= k).drop("__rk"))


def temperature_sample(df: DataFrame, key: str, source_col: str,
                       alpha: float = 0.7, total_fraction: float = 0.1,
                       salt: str = "temp") -> DataFrame:
    """Temperature-flattened source mixing — the exponential-smoothing
    recipe multilingual/multi-source pretraining uses to keep large
    sources from drowning small ones: source ``s`` with share ``p_s``
    is sampled with weight ``p_s**alpha`` (renormalized), so
    ``alpha=1`` reproduces the natural mix, ``alpha=0`` targets equal
    rows per source, and values between interpolate. The overall
    target size is ``total_fraction`` of the corpus; a source whose
    quota exceeds its population keeps everything (the quota is NOT
    redistributed — the standard recipe; renormalize upstream if the
    exact total matters more than per-source weights).

    Membership is ``hash_uniform(key) < keep_s`` with
    ``keep_s = min(1, total_fraction * N * q_s / n_s)`` — fully
    deterministic, and per-row STABLE for any fixed set of keep
    fractions; but unlike ``hash_sample``, the fractions themselves
    depend on every source's count, so corpus growth shifts
    thresholds and can move rows in or out (inherent to the recipe —
    pin the computed fractions and filter with ``hash_uniform``
    directly if snapshot-stable membership matters). Shuffle budget:
    ONE source-keyed count aggregate (tiny result, broadcast back
    onto a map-side filter); the corpus itself never shuffles.

    Rows with a NULL ``source_col`` are dropped (the keep-fraction
    join is an equality join; null never matches a group) — assign a
    sentinel source upstream if unattributed rows should participate.
    """
    from pyspark.sql import Window

    # N and Z come from a GLOBAL window over the counts frame, not a
    # join against its own aggregate (which trips Catalyst's self-join
    # attribute disambiguation). An unpartitioned window is normally a
    # scale smell; here it runs over the source-cardinality-sized
    # counts frame — S rows, never the corpus.
    w = Window.partitionBy()
    keep = df.groupBy(source_col).agg(F.count("*").alias("__n")) \
        .withColumn("__keep", F.least(
            F.lit(1.0),
            F.lit(total_fraction) * F.sum("__n").over(w)
            * (F.pow("__n", F.lit(alpha))
               / F.sum(F.pow("__n", F.lit(alpha))).over(w))
            / F.col("__n"))) \
        .select(source_col, "__keep")
    return (df.join(F.broadcast(keep), source_col)
            .filter(hash_uniform(F.col(key), salt) < F.col("__keep"))
            .drop("__keep"))


def cluster_safe_split(df: DataFrame, pairs: DataFrame, key: str,
                       test_fraction: float = 0.1, salt: str = "split",
                       rep_col: str = "rep",
                       a_col: str = "id_a", b_col: str = "id_b") -> DataFrame:
    """Leakage-safe train/test split: hash the near-duplicate
    COMPONENT representative instead of the row key, so an entire
    duplicate family lands on one side of the split. A per-document
    ``train_test_split`` lets near-identical documents straddle the
    boundary — the held-out set then "evaluates" on paraphrases of
    training data, the contamination mode decontamination cannot see
    because neither copy is in an external eval set.

    ``pairs`` is any near-dup edge list (minhash_lsh_pairs,
    simhash_hamming_pairs, cosine near-dup, ...). Components collapse
    the transitive family (A~B, B~C puts A,B,C on one side even when
    A~C was never scored); a document in no pair is its own singleton
    component. Appends ``rep_col`` (the representative id) and
    ``split``; splits keep ``train_test_split``'s growth-stability —
    adding documents never flips an existing family unless new edges
    merge it into another family (inherent to the semantics).
    ``pairs`` ids must share ``df[key]``'s type — a mismatched pair id
    type would make the coalesce silently widen ``rep_col`` (and with
    it the hashed string) to the common type.

    Scale: components over the pairs graph shuffles edge keys only
    (see connected_components); the label join shuffles on the doc
    key, with the label side pinned SHUFFLE_HASH — it holds one row
    per document that appears in ANY near-dup pair, which at corpus
    scale can far exceed broadcast size, and checkpoint-truncated
    lineage gives Catalyst no honest size estimate to decide with.
    The split itself stays a map-side hash.
    """
    from .components import connected_components
    comp = (connected_components(pairs, a_col=a_col, b_col=b_col)
            .withColumnRenamed("node", "__node"))
    out = (df.join(comp.hint("shuffle_hash"),
                   df[key] == F.col("__node"), "left")
             .withColumn(rep_col,
                         F.coalesce(F.col("component"), F.col(key)))
             .drop("__node", "component"))
    return out.withColumn(
        "split",
        F.when(hash_uniform(F.col(rep_col), salt) < test_fraction,
               F.lit("test")).otherwise(F.lit("train")))


def deterministic_shuffle(df: DataFrame, key: str,
                          salt: str = "shuffle") -> DataFrame:
    """Global reproducible shuffle for training-order randomization:
    sort by md5(salt + key). The one intentionally wide op here — a
    range-partitioned sort (Spark samples hash boundaries, so skew is
    bounded); downstream writers get the same order every run."""
    return df.orderBy(F.md5(F.concat(F.lit(salt), F.col(key).cast("string"))))
