"""Corpus-wide duplicated-span removal (substring-level dedup).

Public recipe (Lee et al., "Deduplicating Training Data Makes
Language Models Better", arXiv:2107.06499 — remove repeated ~50-token
spans corpus-wide; C4 does the same at line level): document-level
dedup misses boilerplate that is EMBEDDED in otherwise-distinct
documents, so the corpus is cut into token spans, every span that
occurs more than once keeps only its FIRST occurrence (smallest
(doc_id, position)), and documents are reassembled from their
surviving spans.

Spark shape:

1. tokenize + chunk into fixed ``span_tokens``-token spans per doc
   (one pass of pure Column exprs, bind_once-disciplined);
2. posexplode -> (doc_id, pos, span);
3. global winner pick: ``row_number() OVER (PARTITION BY span ORDER BY
   doc_id, pos) = 1`` — ONE hash shuffle on the span text;
4. reassemble: groupBy(doc_id), spans sorted by pos, whitespace join.

Scale honesty: step 3-4 shuffle the tokenized corpus twice (once on
span, once on doc_id) — inherent to the operation (the published
pipelines pay a suffix-array build over the full corpus instead).
Span text could be replaced by its md5 in the shuffle key to cap key
width; kept as text here so the oracle stays byte-transparent.

Reconstruction is whitespace-normalized (original spacing/case are
not preserved) — same contract as the normalized fingerprints in
functions/text. Empty/whitespace-only documents pass through: their
single empty span is never treated as a duplicate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.text import tokens
from ..functions.util import bind_once

DEFAULT_SPAN_TOKENS = 8


def doc_spans(df: DataFrame, span_tokens: int = DEFAULT_SPAN_TOKENS,
              id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """(id, pos, span): the document cut into consecutive
    ``span_tokens``-token chunks (last span may be shorter). One row
    per span INSTANCE — unlike word_shingles, repeats within a doc
    stay distinct rows, because each instance needs its own
    keep/remove verdict."""
    if span_tokens < 1:
        raise ValueError(f"span_tokens must be >= 1, got {span_tokens}")

    def chunks(toks):
        n_spans = F.ceil(F.size(toks) / F.lit(span_tokens)).cast("int")
        return F.transform(
            F.sequence(F.lit(0), F.greatest(n_spans - 1, F.lit(0))),
            lambda i: F.concat_ws(" ", F.slice(toks, i * span_tokens + 1,
                                               span_tokens)))

    return (df.select(F.col(id_col),
                      F.posexplode(bind_once(tokens(F.col(text_col)), chunks))
                      .alias("pos", "span")))


def span_dedup(df: DataFrame, span_tokens: int = DEFAULT_SPAN_TOKENS,
               id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Documents rebuilt with every non-first duplicate span removed:
    (id, clean_text, n_spans, n_removed). Deterministic: the winner of
    each span group is the smallest (doc_id, pos) — engine-portable
    total order, no hashing involved."""
    spans = doc_spans(df, span_tokens, id_col, text_col)
    w = Window.partitionBy("span").orderBy(F.col(id_col), F.col("pos"))
    ranked = spans.withColumn("__rk", F.row_number().over(w))
    keep = (F.col("__rk") == 1) | (F.col("span") == "")
    # one grouped pass: totals, removals, and the ordered reassembly
    # (collect_list skips the NULLs that when() leaves for dropped
    # spans; array_sort on struct(pos, span) restores document order)
    return (ranked.groupBy(id_col)
            .agg(F.count(F.lit(1)).cast("bigint").alias("n_spans"),
                 F.sum(F.when(keep, 0).otherwise(1))
                 .cast("bigint").alias("n_removed"),
                 F.concat_ws(" ", F.transform(
                     F.array_sort(F.collect_list(
                         F.when(keep, F.struct("pos", "span")))),
                     lambda s: s["span"])).alias("clean_text"))
            .select(id_col, "clean_text", "n_spans", "n_removed"))
