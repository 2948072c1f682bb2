"""Corpus data card: the one-call dataset summary.

The "Datasheets for Datasets" deliverable every released training
corpus ships with — size, token volume, emptiness, duplication rate,
quality distribution, language mix — as a single long
(metric, value) frame a report renders directly.

Plan shape: TWO aggregates total. Every scalar metric (counts, token
sums, distinct fingerprints, mean quality, token quantiles) rides ONE
aggregate over one scan — map-side partial aggregation does the work,
the shuffle carries one partial-state row per partition. The language
mix is the second (groupBy lang) aggregate. Both results unpivot
plan-side and union; nothing data-sized crosses to the driver.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.text import fingerprint, text_stats_struct, token_count


def corpus_card(docs: DataFrame, text_col: str = "text",
                lang_col: str | None = "lang") -> DataFrame:
    """(metric, value): doc/token counts, empty + exact-duplicate
    rates, mean quality, token-count quartiles, and per-language
    document shares (``lang_share:<lang>`` rows). Rates are fractions
    in [0, 1]; values rounded to 4."""
    n_tok = token_count(F.col(text_col))
    quality = text_stats_struct(F.col(text_col))["quality"]
    agg = docs.agg(
        F.count(F.lit(1)).alias("__docs"),
        F.sum(n_tok).alias("__toks"),
        F.sum((F.trim(F.col(text_col)) == "").cast("bigint"))
        .alias("__empty"),
        F.count_distinct(fingerprint(F.col(text_col))).alias("__fps"),
        F.avg(quality).alias("__q"),
        F.expr("percentile(" + _tok_sql(text_col)
               + ", array(0.25D, 0.5D, 0.75D))").alias("__tq"))
    scalars = agg.selectExpr(
        "stack(8, "
        "'n_docs', CAST(__docs AS DOUBLE), "
        "'n_tokens', CAST(__toks AS DOUBLE), "
        "'empty_rate', __empty / __docs, "
        "'exact_dup_rate', 1.0 - __fps / CAST(__docs AS DOUBLE), "
        "'mean_quality', __q, "
        "'tokens_p25', __tq[0], "
        "'tokens_p50', __tq[1], "
        "'tokens_p75', __tq[2]"
        ") AS (metric, value)")
    out = scalars
    if lang_col is not None:
        mix = (docs.groupBy(lang_col)
               .agg(F.count(F.lit(1)).alias("__n"))
               .crossJoin(F.broadcast(agg.select("__docs")))
               .select(F.concat(F.lit("lang_share:"), F.col(lang_col))
                       .alias("metric"),
                       (F.col("__n") / F.col("__docs")).alias("value")))
        out = scalars.unionByName(mix)
    return out.select("metric", F.round("value", 4).alias("value"))


def _tok_sql(text_col: str) -> str:
    """token_count as a SQL string (percentile's DSL form can't take
    a Column argument list) — must match functions.text.token_count."""
    return (f"CASE WHEN trim({text_col}) = '' THEN 0 "
            f"ELSE size(split(trim({text_col}), '\\\\s+')) END")
