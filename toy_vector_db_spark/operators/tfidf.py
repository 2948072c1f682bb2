"""Vocabulary building and TF-IDF over a document corpus.

Beyond-parity extension: the classic shuffle-heavy text statistics a
training-data pipeline runs before filtering/mixing. The reference has
no aggregation at all (SURVEY §2.4 — COUNT(*) is its only aggregate);
here the interesting part is the Spark shape:

  * ``term_frequencies`` explodes tokens — a fan-out projection, no
    shuffle; tokenization is the same normalize -> split used by the
    dedup/fingerprint family (functions/text.py), so every text
    operator agrees on what a token is.
  * ``vocabulary`` is a two-level aggregate. Spark plans it as partial
    (map-side) aggregation per partition followed by one shuffle on
    ``term`` — the only way a 100 TB explode stays tractable. Top-k by
    corpus frequency is TakeOrderedAndProject (no global sort).
  * ``tfidf_top_terms`` joins per-doc term counts against the
    document-frequency table on ``term``. Both sides are keyed by term
    and AQE handles the skewed head of the Zipf curve (and can turn
    the df side into a broadcast when min_df prunes it small); the
    per-doc top-k is a window over doc_id — one more shuffle, keyed by
    doc, bounded output.

All values are plain arithmetic over md5-free counts, so the DuckDB
oracle checks them exactly (ln() may differ in the last ulp between
libm implementations; oracle comparisons round to 4 decimals).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.text import normalize_for_fingerprint


def term_frequencies(docs: DataFrame, id_col: str = "doc_id",
                     text_col: str = "text") -> DataFrame:
    """(id, term, tf): per-document counts of normalized whitespace
    tokens. Explode + groupBy(id, term) — the aggregate is partial
    per partition before the shuffle."""
    toks = F.split(normalize_for_fingerprint(F.col(text_col)), " ")
    return (docs.select(F.col(id_col), F.explode(toks).alias("term"))
            .filter(F.col("term") != "")
            .groupBy(id_col, "term")
            .agg(F.count("*").alias("tf")))


def vocabulary(docs: DataFrame, id_col: str = "doc_id",
               text_col: str = "text", min_df: int = 1) -> DataFrame:
    """(term, doc_freq, total_tf): corpus vocabulary. ``min_df`` prunes
    the hapax tail (at scale, most of the vocabulary)."""
    tf = term_frequencies(docs, id_col, text_col)
    v = tf.groupBy("term").agg(F.count("*").alias("doc_freq"),
                               F.sum("tf").alias("total_tf"))
    return v.filter(F.col("doc_freq") >= min_df) if min_df > 1 else v


def tfidf(docs: DataFrame, id_col: str = "doc_id",
          text_col: str = "text") -> DataFrame:
    """(id, term, tf, tfidf) with the smooth idf
    ln((N + 1) / (doc_freq + 1)); N via a scalar count so the plan has
    no driver-side collect."""
    # localCheckpoint: dfreq is DERIVED from tf and joined back to it,
    # so without a cut the explode + partial-agg subtree sits on BOTH
    # join branches and the dominant cost runs twice (r3 verdict #3).
    # Checkpointing materializes the (id, term, tf) frame once; both
    # branches then read the materialized partitions. eager=True keeps
    # the materialization inside this operator's first job. On a
    # cluster the same cut is a persist() to local disk/shuffle files.
    tf = term_frequencies(docs, id_col, text_col).localCheckpoint(eager=True)
    dfreq = tf.groupBy("term").agg(F.count("*").alias("doc_freq"))
    # scalar N as a broadcast 1-row aggregate — no driver collect
    n = docs.agg(F.countDistinct(id_col).alias("__n"))
    scored = (tf.join(dfreq, "term")
              .crossJoin(F.broadcast(n))
              .withColumn("tfidf",
                          F.col("tf") * F.log((F.col("__n") + 1.0)
                                              / (F.col("doc_freq") + 1.0)))
              .drop("__n"))
    return scored


def tfidf_top_terms(docs: DataFrame, k: int = 3, id_col: str = "doc_id",
                    text_col: str = "text") -> DataFrame:
    """Top-``k`` characteristic terms per document by tf-idf
    (ties -> lexicographic term, so the result is a total order any
    engine reproduces)."""
    scored = tfidf(docs, id_col, text_col)
    w = Window.partitionBy(id_col).orderBy(
        F.col("tfidf").desc(), F.col("term").asc())
    return (scored.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
            .select(id_col, "term", "tf", "tfidf", "rank"))
