"""Corpus drift: vocabulary divergence between two document sets.

The data-QA question every recurring crawl/ingest asks: did the new
batch's token distribution shift against the reference corpus — and
WHICH terms moved? Standard information-theoretic form: smoothed
unigram distributions p (reference) and q (candidate) over the union
vocabulary, Jensen-Shannon divergence as the headline scalar
(symmetric, bounded by ln 2, defined even for disjoint vocabularies),
per-term JS contributions for attribution.

Plan shape:

1. one token explode + partial-aggregated count per side;
2. FULL OUTER join of the two count frames on term — the only
   data-sized shuffle, carrying (term, count) pairs;
3. the joined vocab is ``localCheckpoint``-cut: scalars (N_a, N_b,
   union vocab size V) are a 1-row broadcast aggregate OF that frame,
   so neither side's explode re-runs;
4. per-term probabilities/contributions are map-side arithmetic;
   the summary is one more aggregate, top-k attribution a
   TakeOrderedAndProject.

At 100 TB each side's counts shrink to vocabulary size at the first
partial aggregation; everything after is vocab-sized, not corpus-
sized.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .lmscore import token_instances


def vocab_counts(docs: DataFrame, id_col: str = "doc_id",
                 text_col: str = "text") -> DataFrame:
    """(term, c): corpus token-instance counts."""
    return (token_instances(docs, id_col, text_col)
            .groupBy("term").agg(F.count(F.lit(1)).alias("c")))


def term_divergence(ref: DataFrame, cand: DataFrame,
                    id_col: str = "doc_id", text_col: str = "text",
                    alpha: float = 0.5) -> DataFrame:
    """Per-term drift table over the UNION vocabulary:
    (term, c_ref, c_cand, p_ref, p_cand, js_contrib) where js_contrib
    is the term's share of the Jensen-Shannon divergence
    (0.5*p*ln(p/m) + 0.5*q*ln(q/m), m = (p+q)/2) — non-negative,
    summing to JS(p, q). Laplace smoothing over the union vocab keeps
    one-sided terms finite."""
    if alpha <= 0:
        raise ValueError(f"alpha must be > 0, got {alpha}")
    a = vocab_counts(ref, id_col, text_col) \
        .select("term", F.col("c").alias("c_ref"))
    b = vocab_counts(cand, id_col, text_col) \
        .select("term", F.col("c").alias("c_cand"))
    joined = (a.join(b, "term", "full_outer")
              .select("term",
                      F.coalesce("c_ref", F.lit(0)).alias("c_ref"),
                      F.coalesce("c_cand", F.lit(0)).alias("c_cand"))
              .localCheckpoint(eager=True))
    scalars = joined.agg(F.sum("c_ref").alias("__na"),
                         F.sum("c_cand").alias("__nb"),
                         F.count(F.lit(1)).alias("__v"))
    p = (F.col("c_ref") + alpha) / (F.col("__na") + alpha * F.col("__v"))
    q = (F.col("c_cand") + alpha) / (F.col("__nb") + alpha * F.col("__v"))
    m = (p + q) / 2
    return (joined.crossJoin(F.broadcast(scalars))
            .select("term", "c_ref", "c_cand",
                    p.alias("p_ref"), q.alias("p_cand"),
                    (0.5 * p * F.log(p / m)
                     + 0.5 * q * F.log(q / m)).alias("js_contrib")))


def divergence_summary(ref: DataFrame, cand: DataFrame,
                       id_col: str = "doc_id", text_col: str = "text",
                       alpha: float = 0.5) -> DataFrame:
    """One row: (js_divergence, n_terms_union, n_terms_ref_only,
    n_terms_cand_only). JS is bounded by ln 2 ~ 0.6931; a stable
    corpus re-crawl sits near 0."""
    t = term_divergence(ref, cand, id_col, text_col, alpha)
    return t.agg(
        F.sum("js_contrib").alias("js_divergence"),
        F.count(F.lit(1)).alias("n_terms_union"),
        F.sum((F.col("c_cand") == 0).cast("bigint"))
        .alias("n_terms_ref_only"),
        F.sum((F.col("c_ref") == 0).cast("bigint"))
        .alias("n_terms_cand_only"))


def embedding_drift(ref: DataFrame, cand: DataFrame,
                    group_col: str = "label",
                    vec_col: str = "embedding") -> DataFrame:
    """Embedding-space drift per group: how far each group's centroid
    moved between a reference and a candidate embedding set —
    (group, n_ref, n_cand, centroid_dist, centroid_cos). The vector
    twin of the vocabulary report: catches representation shift the
    token distribution can't see (same words, new embedding model or
    new content mix).

    Plan shape: each side reduces to group-cardinality centroids via
    ``mean_vectors`` (shuffle carries (group, pos, partial) scalars,
    never vectors), then the two tiny centroid frames broadcast-join
    on the group key; the distance arithmetic is a per-row fold over
    dim elements. Groups missing from either side are omitted (no
    centroid to compare)."""
    from ..functions.vector import mean_vectors
    a = mean_vectors(ref, group_col, vec_col, "__ca") \
        .withColumnRenamed("n_vectors", "n_ref")
    b = mean_vectors(cand, group_col, vec_col, "__cb") \
        .withColumnRenamed("n_vectors", "n_cand")
    diff2 = F.aggregate(
        F.zip_with("__ca", "__cb", lambda x, y: (x - y) * (x - y)),
        F.lit(0.0), lambda s, x: s + x)
    dot = F.aggregate(F.zip_with("__ca", "__cb", lambda x, y: x * y),
                      F.lit(0.0), lambda s, x: s + x)
    na = F.sqrt(F.aggregate(F.transform("__ca", lambda x: x * x),
                            F.lit(0.0), lambda s, x: s + x))
    nb = F.sqrt(F.aggregate(F.transform("__cb", lambda x: x * x),
                            F.lit(0.0), lambda s, x: s + x))
    cos = F.when((na == 0) | (nb == 0), F.lit(0.0)) \
        .otherwise(dot / (na * nb))
    return (a.join(F.broadcast(b), group_col)
            .select(group_col, "n_ref", "n_cand",
                    F.sqrt(diff2).alias("centroid_dist"),
                    cos.alias("centroid_cos")))


def top_divergent_terms(ref: DataFrame, cand: DataFrame, k: int = 20,
                        id_col: str = "doc_id", text_col: str = "text",
                        alpha: float = 0.5) -> DataFrame:
    """The k terms contributing most drift, with direction:
    direction = 'cand' when the term is over-represented in the
    candidate, else 'ref'. Deterministic order (contrib desc, term
    asc) via TakeOrderedAndProject."""
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    t = term_divergence(ref, cand, id_col, text_col, alpha)
    return (t.withColumn(
        "direction",
        F.when(F.col("p_cand") > F.col("p_ref"), F.lit("cand"))
        .otherwise(F.lit("ref")))
        .orderBy(F.col("js_contrib").desc(), F.col("term").asc())
        .limit(k))
