"""Corpus-relative unigram language-model quality scoring.

Public recipe (CCNet, Wenzek et al. arXiv:1911.00359: bucket web text
by LM perplexity; here the LM is the corpus's own smoothed unigram
model — no external model needed, which keeps the operator closed
over its inputs and value-oracle-able): a document whose tokens are
typical of the corpus scores low, boilerplate/garbage with rare or
out-of-distribution tokens scores high. Standard use: rank docs by
``avg_neg_logprob`` and keep the head/middle buckets.

Plan shape (the tfidf discipline):

1. token instances exploded once, ``localCheckpoint`` cut so the
   explode doesn't run on both consumers (corpus counts + per-doc
   score);
2. corpus unigram counts: one partial-aggregated groupBy(term);
3. the model scalars (total tokens N, vocab size V) are a 1-row
   aggregate cross-joined as a broadcast — no driver collect;
4. per-doc score: join token instances to counts on term (the only
   other shuffle), then avg(-ln p) per doc.

Laplace smoothing: p(t) = (c(t) + alpha) / (N + alpha * V). Every
token in the corpus is in-vocabulary by construction (the model IS
the corpus), so smoothing only softens head/tail contrast here; it
matters when ``score_against`` rates NEW docs under a frozen corpus
model, where unseen tokens get the alpha / (N + alpha*V) floor.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.text import normalize_for_fingerprint


def token_instances(docs: DataFrame, id_col: str = "doc_id",
                    text_col: str = "text") -> DataFrame:
    """(id, term): one row per token INSTANCE (repeats kept — the LM
    weighs a doc by all its tokens, unlike the distinct-shingle ops)."""
    toks = F.split(normalize_for_fingerprint(F.col(text_col)), " ")
    return (docs.select(F.col(id_col), F.explode(toks).alias("term"))
            .filter(F.col("term") != ""))


def unigram_model(docs: DataFrame, id_col: str = "doc_id",
                  text_col: str = "text") -> DataFrame:
    """(term, c) corpus unigram counts over token instances."""
    return (token_instances(docs, id_col, text_col)
            .groupBy("term").agg(F.count(F.lit(1)).alias("c")))


def score_against(docs: DataFrame, model: DataFrame,
                  id_col: str = "doc_id", text_col: str = "text",
                  alpha: float = 0.5) -> DataFrame:
    """Rate NEW documents under a FROZEN unigram model (the
    incremental-ingest path: fit the model once on the reference
    corpus with ``unigram_model``, then score every new batch against
    it — map-only apart from the term join, so it lifts onto a stream
    unchanged). ``model`` is a (term, c) frame; unseen tokens get the
    smoothing floor alpha / (N + alpha * V) via a left join."""
    if alpha <= 0:
        raise ValueError(f"alpha must be > 0, got {alpha}")
    counts = model.select("term", F.col("c").alias("__c"))
    scalars = counts.agg(F.sum("__c").alias("__n"),
                         F.count(F.lit(1)).alias("__v"))
    p = (F.coalesce(F.col("__c"), F.lit(0)) + F.lit(alpha)) \
        / (F.col("__n") + F.lit(alpha) * F.col("__v"))
    return (token_instances(docs, id_col, text_col)
            .join(F.broadcast(counts), "term", "left")
            .crossJoin(F.broadcast(scalars))
            .groupBy(id_col)
            .agg(F.count(F.lit(1)).alias("n_tokens"),
                 F.avg(-F.log(p)).alias("avg_neg_logprob")))


def bigram_instances(docs: DataFrame, id_col: str = "doc_id",
                     text_col: str = "text") -> DataFrame:
    """(id, prev, cur): one row per adjacent token pair — built
    map-side from the token array (no positional self-join). Docs with
    fewer than 2 tokens contribute nothing."""
    from ..functions.util import bind_once

    def pairs(toks: Column) -> Column:
        n = F.size(toks)
        return F.when(n >= 2, F.transform(
            F.sequence(F.lit(1), n - 1),
            lambda i: F.struct(F.element_at(toks, i).alias("prev"),
                               F.element_at(toks, i + 1).alias("cur")))
        ).otherwise(F.array().cast(
            "array<struct<prev:string,cur:string>>"))

    toks = F.filter(F.split(normalize_for_fingerprint(F.col(text_col)),
                            " "), lambda t: t != "")
    return (docs.select(F.col(id_col),
                        F.explode(bind_once(toks, pairs)).alias("__p"))
            .select(id_col, F.col("__p.prev").alias("prev"),
                    F.col("__p.cur").alias("cur")))


def bigram_scores(docs: DataFrame, id_col: str = "doc_id",
                  text_col: str = "text",
                  alpha: float = 0.5) -> DataFrame:
    """(id, n_bigrams, avg_neg_logprob): mean -ln p(cur | prev) per
    document under the corpus's own Laplace-smoothed bigram model —
    the next rung of the CCNet quality ladder (catches scrambled or
    repetitive word ORDER the unigram model scores as normal).

    p(b|a) = (c(a,b) + alpha) / (c(a) + alpha * V), V = unigram vocab
    size. Plan shape mirrors ``unigram_scores`` with ONE corpus scan:
    the text parse lands in a checkpointed token-ARRAY frame, the pair
    explode (also checkpointed, so it runs once for its three
    consumers) and the vocab count BOTH read from that cut — V needs
    the token arrays, not a second pass over the raw text, because
    tokens whose only occurrence is a 1-token doc appear in no bigram.
    Bigram counts one aggregate; context (prev-token) counts one more
    small aggregate; instances join both count frames on their keys."""
    if alpha <= 0:
        raise ValueError(f"alpha must be > 0, got {alpha}")
    def pairs(toks: Column) -> Column:
        n = F.size(toks)
        return F.when(n >= 2, F.transform(
            F.sequence(F.lit(1), n - 1),
            lambda i: F.struct(F.element_at(toks, i).alias("prev"),
                               F.element_at(toks, i + 1).alias("cur")))
        ).otherwise(F.array().cast(
            "array<struct<prev:string,cur:string>>"))

    toks = F.filter(F.split(normalize_for_fingerprint(F.col(text_col)),
                            " "), lambda t: t != "")
    arr = docs.select(F.col(id_col), toks.alias("__toks")) \
        .localCheckpoint(eager=True)
    bi = (arr.select(F.col(id_col),
                     F.explode(pairs(F.col("__toks"))).alias("__p"))
          .select(id_col, F.col("__p.prev").alias("prev"),
                  F.col("__p.cur").alias("cur"))
          .localCheckpoint(eager=True))
    big_c = bi.groupBy("prev", "cur").agg(F.count(F.lit(1)).alias("__cb"))
    ctx_c = bi.groupBy("prev").agg(F.count(F.lit(1)).alias("__ca"))
    vocab = (arr.select(F.explode("__toks").alias("term"))
             .agg(F.count_distinct(F.col("term")).alias("__v")))
    p = (F.col("__cb") + F.lit(alpha)) \
        / (F.col("__ca") + F.lit(alpha) * F.col("__v"))
    return (bi.join(big_c, ["prev", "cur"])
            .join(ctx_c, "prev")
            .crossJoin(F.broadcast(vocab))
            .groupBy(id_col)
            .agg(F.count(F.lit(1)).alias("n_bigrams"),
                 F.avg(-F.log(p)).alias("avg_neg_logprob")))


def perplexity_buckets(scored: DataFrame, n_buckets: int = 3,
                       group_col: str | None = None,
                       score_col: str = "avg_neg_logprob",
                       id_col: str = "doc_id") -> DataFrame:
    """CCNet's final step: rank documents by LM score and cut into
    ``n_buckets`` equal-frequency buckets (1 = best / most in-
    distribution ... n = worst), optionally per group (CCNet buckets
    per LANGUAGE — head/middle/tail at n_buckets=3). Standard SQL
    NTILE over (score, id) — the id tiebreak makes the cut
    deterministic, so the bucket assignment is value-checkable.

    Scale note: NTILE needs each partition's rows ordered together —
    one shuffle on ``group_col``. With no group column the window is
    a single partition: fine for bounded score tables, but at corpus
    scale pass the grouping (language/source) the recipe buckets by
    anyway, or pre-aggregate to quantile BOUNDARIES and broadcast.
    (cap: n_buckets is the OUTPUT quantile count — one NTILE window at
    any value, never a work bound.)"""
    if n_buckets < 1:
        raise ValueError(f"n_buckets must be >= 1, got {n_buckets}")
    from pyspark.sql import Window
    part = Window.partitionBy(group_col) if group_col else \
        Window.partitionBy()
    win = part.orderBy(F.col(score_col).asc(), F.col(id_col).asc())
    return scored.withColumn("bucket", F.ntile(n_buckets).over(win))


def unigram_scores(docs: DataFrame, id_col: str = "doc_id",
                   text_col: str = "text",
                   alpha: float = 0.5) -> DataFrame:
    """(id, n_tokens, avg_neg_logprob): mean -ln p(token) per document
    under the corpus's own smoothed unigram model. Docs with no tokens
    are omitted (no tokens -> no distribution to score)."""
    if alpha <= 0:
        raise ValueError(f"alpha must be > 0, got {alpha}")
    ti = token_instances(docs, id_col, text_col).localCheckpoint(eager=True)
    counts = ti.groupBy("term").agg(F.count(F.lit(1)).alias("__c"))
    scalars = counts.agg(F.sum("__c").alias("__n"),
                         F.count(F.lit(1)).alias("__v"))
    p = (F.col("__c") + F.lit(alpha)) \
        / (F.col("__n") + F.lit(alpha) * F.col("__v"))
    return (ti.join(counts, "term")
            .crossJoin(F.broadcast(scalars))
            .groupBy(id_col)
            .agg(F.count(F.lit(1)).alias("n_tokens"),
                 F.avg(-F.log(p)).alias("avg_neg_logprob")))
