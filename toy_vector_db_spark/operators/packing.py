"""Training-window layout: concat-and-chunk sequence packing.

GPT-style pretraining does not feed one document per sequence — it
concatenates the (shuffled/ordered) token stream of a corpus slice and
slices it into fixed-size context windows; a document can straddle a
window boundary. This operator computes that layout as METADATA
(offsets and window spans per document) without materializing tokens:

    start_off    cumulative tokens before this doc within its group
    start_window floor(start_off / budget)
    n_windows    how many windows the doc touches

One window shuffle per group (cumulative sum over the group's document
order); integer arithmetic only, so a SQL engine reproduces it exactly
(workload ``corpus_chunk_windows`` oracle). At 100 TB the group column
is the unit of parallelism (per-language / per-shard streams) — each
group's running offset is independent, so no global sequential pass
exists anywhere.

Greedy no-split bin packing (whole docs per window) is the OTHER
packing regime; it is inherently prefix-sequential per group, which is
why the industry default for pretraining is exactly this
concat-and-chunk layout.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from ..functions.text import token_count
from ..functions.util import bind_once

DEFAULT_WINDOW_TOKENS = 2048


def chunk_windows(df: DataFrame, budget: int = DEFAULT_WINDOW_TOKENS,
                  group_col: str = "lang", id_col: str = "doc_id",
                  text_col: str = "text") -> DataFrame:
    """Per-group concat-and-chunk window assignment (doc order =
    ascending ``id_col``; pin the order upstream for a shuffled
    curriculum). Zero-token docs occupy no window: n_windows = 0 and
    start_window is where the NEXT token would land."""
    if budget < 1:
        raise ValueError(f"budget must be >= 1, got {budget}")
    # Tokenize BEFORE the per-group exchange: referencing the raw
    # token_count expression inside the window select made Catalyst
    # ship the full text column through the exchange and re-split
    # every document inside the window stage — which has only
    # |groups| effective partitions, so the whole corpus re-tokenized
    # on a handful of cores (measured 31x wall for 10x data; with this
    # pre-projection the exchange carries three scalars and the window
    # stage is integer-only).
    base = df.select(F.col(id_col), F.col(group_col),
                     token_count(F.col(text_col)).alias("n_tok"))
    w = Window.partitionBy(group_col).orderBy(id_col) \
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    cum = F.sum("n_tok").over(w)
    start_off = (cum - F.col("n_tok")).cast("bigint")
    end_off = cum.cast("bigint")  # exclusive
    # bigint `div`, not floor(double division): offsets are exact over
    # the full bigint range, while float64 loses integer precision past
    # 2^53 — real territory for a 100 TB per-group token stream
    b = int(budget)
    staged = base.select(
        F.col(id_col), F.col(group_col), F.col("n_tok"),
        start_off.alias("start_off"),
        (end_off - 1).alias("__last_off"))
    return staged.select(
        id_col, group_col, "n_tok", "start_off",
        F.expr(f"start_off div {b}").alias("start_window"),
        F.when(F.col("n_tok") == 0, F.lit(0)).otherwise(
            F.expr(f"(__last_off div {b}) - (start_off div {b}) + 1")
        ).cast("bigint").alias("n_windows"))


def chunk_with_overlap(df: DataFrame, chunk_tokens: int = 256,
                       stride: int = 192, id_col: str = "doc_id",
                       text_col: str = "text") -> DataFrame:
    """PER-DOCUMENT sliding-window chunking with overlap — the RAG /
    embedding-input regime (vs ``chunk_windows``'s cross-document
    concat-and-chunk): chunk ``i`` of a doc covers whitespace tokens
    ``[i*stride, i*stride + chunk_tokens)``; ``stride < chunk_tokens``
    gives ``chunk_tokens - stride`` tokens of overlap so no boundary
    context is lost. Output: (id, chunk_id, start_tok, n_tok,
    chunk_text); the final chunk may be short; empty docs emit nothing.

    Entirely map-side — the token array is bound ONCE per row (HOFs
    don't CSE), chunk structs are built in one ``transform`` and
    inlined; there is no shuffle anywhere, so the operator scales as a
    pure scan. Per-doc token counts stay far below 2^53, so the
    chunk-count ceil may use double division safely (unlike the
    corpus-cumulative offsets above, which must stay integer)."""
    if chunk_tokens < 1:
        raise ValueError(f"chunk_tokens must be >= 1, got {chunk_tokens}")
    if not 0 < stride <= chunk_tokens:
        raise ValueError(
            f"stride must be in [1, chunk_tokens], got {stride}")

    def chunks(t: Column) -> Column:
        n = F.size(t)
        # n <= chunk_tokens => the ceil term is <= 0 => one chunk
        n_chunks = F.when(n <= 0, F.lit(0)).otherwise(
            1 + F.greatest(
                F.lit(0),
                F.ceil((n - chunk_tokens) / F.lit(float(stride)))
                .cast("int")))
        return F.when(n_chunks > 0, F.transform(
            F.sequence(F.lit(0), n_chunks - 1),
            lambda i: F.struct(
                (i * stride).cast("bigint").alias("start_tok"),
                F.slice(t, i * stride + 1, chunk_tokens).alias("__ctoks")))
        ).otherwise(F.array().cast(
            "array<struct<start_tok:bigint,__ctoks:array<string>>>"))

    toks = F.filter(F.split(F.trim(F.col(text_col)), r"\s+"),
                    lambda x: x != "")
    return (df.select(F.col(id_col),
                      F.posexplode(bind_once(toks, chunks))
                      .alias("chunk_id", "__c"))
            .select(id_col, F.col("chunk_id").cast("bigint"),
                    F.col("__c.start_tok").alias("start_tok"),
                    F.size("__c.__ctoks").cast("bigint").alias("n_tok"),
                    F.concat_ws(" ", F.col("__c.__ctoks"))
                    .alias("chunk_text")))
