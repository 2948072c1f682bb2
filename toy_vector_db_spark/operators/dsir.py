"""DSIR — Data Selection via Importance Resampling.

Public recipe (Xie et al., arXiv:2302.03169): pick pretraining
documents that look like a small high-quality TARGET set by scoring
every candidate under two bag-of-hashed-n-gram unigram models — one
fit on the target, one on the raw pool — and resampling with
probability proportional to the importance ratio
``p_target(x) / p_raw(x)``. Hashing n-grams into a fixed bucket space
keeps both models tiny (``buckets`` rows, broadcastable) regardless of
corpus vocabulary.

Spark-first plan shape (the lmscore discipline):

1. feature instances (doc_id, is_target, bucket) exploded ONCE per doc
   with the doc's target flag attached map-side — ``localCheckpoint``
   cut so the explode feeds both consumers without re-running;
2. BOTH models in ONE partial-aggregated groupBy(bucket): raw count
   and conditional target count per bucket (<= ``buckets`` rows);
3. model scalars (target/raw totals) as a 1-row broadcast aggregate —
   no driver collect; the smoothing category count is the constant
   ``buckets``, known without a scan;
4. per-doc log importance weight: broadcast-join instances to the
   bucket counts, sum ``ln p_t - ln p_r`` per doc (the only shuffles
   carry (doc_id, bucket) pairs and scalar partials — never text);
5. Gumbel top-k resampling without replacement: key = weight + g where
   g = -ln(-ln(u)) and u is an md5-derived uniform — deterministic,
   engine-independent, and a single TakeOrderedAndProject (no global
   sort materialized). The audit tier derives the selection threshold
   the same way (top-k -> 1-row min -> broadcast), so no global
   window either.

At 100 TB the shape holds: the bucket-count frame is bounded by
``buckets`` (default 4096) and broadcast; everything else is map-side
expansion plus two aggregations on compact keys.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.text import normalize_for_fingerprint
from ..functions.util import bind_once


def hashed_feature_instances(docs: DataFrame, id_col: str = "doc_id",
                             text_col: str = "text",
                             buckets: int = 4096,
                             bigrams: bool = True,
                             keep_cols: tuple[str, ...] = ()) -> DataFrame:
    """(id, *keep_cols, bucket): one row per unigram/bigram INSTANCE,
    hashed into ``buckets`` via the engine-independent md5 prefix (same
    idiom as the minhash tier, so a SQL oracle can reproduce it
    bit-for-bit). The tokenizer is bound once per row (HOFs don't
    CSE); ``keep_cols`` rides along map-side — no join needed to tag
    instances with per-doc flags."""
    if buckets < 2:
        raise ValueError(f"buckets must be >= 2, got {buckets}")

    def feats(toks: Column) -> Column:
        if not bigrams:
            return toks
        n = F.size(toks)
        bi = F.when(n >= 2, F.transform(
            F.sequence(F.lit(0), n - 2),
            lambda i: F.concat_ws(" ", F.slice(toks, i + 1, 2)))
        ).otherwise(F.array().cast("array<string>"))
        return F.concat(toks, bi)

    toks = F.filter(F.split(normalize_for_fingerprint(F.col(text_col)), " "),
                    lambda t: t != "")
    feat = F.explode(bind_once(toks, feats)).alias("__feat")
    return (docs.select(F.col(id_col), *[F.col(c) for c in keep_cols], feat)
            .select(id_col, *keep_cols,
                    (F.conv(F.substring(F.md5(F.col("__feat")), 1, 8), 16, 10)
                     .cast("long") % buckets).alias("bucket")))


def importance_weights(docs: DataFrame, target_pred: Column,
                       id_col: str = "doc_id", text_col: str = "text",
                       buckets: int = 4096, alpha: float = 0.5,
                       bigrams: bool = True) -> DataFrame:
    """(id, n_feats, weight): per-document log importance ratio
    ``sum ln p_target(bucket) - ln p_raw(bucket)`` over hashed n-gram
    instances, Laplace-smoothed over the fixed bucket space. The
    target model is fit on pool rows matching ``target_pred``; the raw
    model on the whole pool. Docs with no tokens are omitted (no
    features -> no evidence either way)."""
    if alpha <= 0:
        raise ValueError(f"alpha must be > 0, got {alpha}")
    flagged = docs.withColumn("__tgt", target_pred.cast("bigint"))
    ti = hashed_feature_instances(flagged, id_col, text_col, buckets,
                                  bigrams, keep_cols=("__tgt",))
    ti = ti.localCheckpoint(eager=True)
    counts = ti.groupBy("bucket").agg(
        F.count(F.lit(1)).alias("__c_raw"),
        F.sum("__tgt").alias("__c_tgt"))
    scalars = counts.agg(F.sum("__c_raw").alias("__n_raw"),
                         F.sum("__c_tgt").alias("__n_tgt"))
    p_t = (F.col("__c_tgt") + F.lit(alpha)) \
        / (F.col("__n_tgt") + F.lit(alpha) * buckets)
    p_r = (F.col("__c_raw") + F.lit(alpha)) \
        / (F.col("__n_raw") + F.lit(alpha) * buckets)
    return (ti.join(F.broadcast(counts), "bucket")
            .crossJoin(F.broadcast(scalars))
            .groupBy(id_col)
            .agg(F.count(F.lit(1)).alias("n_feats"),
                 F.sum(F.log(p_t) - F.log(p_r)).alias("weight")))


def gumbel_key(weight: Column, id_col: Column, salt: str = "dsir") -> Column:
    """Deterministic Gumbel perturbation: key = weight - ln(-ln(u)),
    u = md5-uniform of (salt, id) in (0, 1). Top-k by this key is an
    exact sample-without-replacement with P(select) proportional to
    exp(weight) — the Gumbel-top-k trick, reproducible across engines
    because u comes from md5, not a PRNG. +0.5 keeps u strictly inside
    (0, 1) so neither log can hit an infinity."""
    u = (F.conv(F.substring(
        F.md5(F.concat(F.lit(salt + ":"), id_col.cast("string"))), 1, 8),
        16, 10).cast("double") + 0.5) / 4294967296.0
    return weight - F.log(-F.log(u))


def dsir_sample(docs: DataFrame, target_pred: Column, k: int,
                id_col: str = "doc_id", text_col: str = "text",
                buckets: int = 4096, alpha: float = 0.5,
                bigrams: bool = True, salt: str = "dsir") -> DataFrame:
    """Top-``k`` Gumbel-resampled docs by importance weight:
    (id, n_feats, weight). orderBy+limit compiles to
    TakeOrderedAndProject — per-partition heaps, no global sort."""
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    w = importance_weights(docs, target_pred, id_col, text_col,
                           buckets, alpha, bigrams)
    key = gumbel_key(F.col("weight"), F.col(id_col), salt)
    return (w.withColumn("__key", key)
            .orderBy(F.col("__key").desc(), F.col(id_col).asc())
            .limit(k)
            .drop("__key"))


def selection_report(docs: DataFrame, target_pred: Column, k: int,
                     id_col: str = "doc_id", text_col: str = "text",
                     buckets: int = 4096, alpha: float = 0.5,
                     bigrams: bool = True, salt: str = "dsir") -> DataFrame:
    """Every scored doc with its weight AND a ``selected`` flag for the
    Gumbel top-k — the auditable form (value-checks the weights for the
    whole pool, not just the chosen head). The selection threshold is
    the k-th largest gumbel key, derived as top-k -> 1-row min ->
    broadcast — NOT a global window, so the report scales like the
    sample tier. Gumbel keys are continuous and md5-derived, so exact
    key ties across docs don't occur in practice; the id tiebreak in
    the top-k makes the cut deterministic regardless."""
    w = importance_weights(docs, target_pred, id_col, text_col,
                           buckets, alpha, bigrams)
    w = w.withColumn("__key", gumbel_key(F.col("weight"), F.col(id_col), salt))
    w = w.localCheckpoint(eager=True)  # weights feed threshold + report
    thresh = (w.orderBy(F.col("__key").desc(), F.col(id_col).asc()).limit(k)
              .agg(F.min("__key").alias("__thresh")))
    return (w.crossJoin(F.broadcast(thresh))
            .withColumn("selected", F.col("__key") >= F.col("__thresh"))
            .drop("__key", "__thresh"))
