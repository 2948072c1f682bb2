"""Train/eval decontamination: n-gram-overlap detection and removal.

Beyond-parity extension (the reference has no corpus tooling; its text
surface is the embedding pass-through, pipeline/processor.go:21-40).
This is the standard pre-training hygiene step — find training
documents that share word-n-gram content with an evaluation set and
drop them — expressed as pure DataFrame ops:

  * each side is exploded to DISTINCT per-document shingle hashes, so
    the shuffle carries (id, 16-byte md5), never document text;
  * the eval side collapses to a distinct hash SET and is broadcast by
    default (eval suites are tiny next to a 100 TB train corpus), so
    the only wide operation is the single groupBy(doc_id) that builds
    the report — one shuffle end-to-end;
  * with ``broadcast_eval=False`` the membership probe becomes a
    shuffle equi-join on shingle_hash (md5 keys are uniform, so no
    skew) for the eval-set-too-big-to-broadcast case;
  * thresholds are counts of SHARED DISTINCT shingles per train doc —
    growth-stable (adding train docs never flips another doc's
    verdict), matching the hash-split stability in operators/sampling.

Everything here has an exact DuckDB twin (workload.decontam_overlap),
so the whole pipeline is value-checked by the driver oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.text import word_shingles


def shingle_hash_set(df: DataFrame, id_col: str = "doc_id",
                     text_col: str = "text", n: int = 5) -> DataFrame:
    """(id, shingle_hash) with one row per DISTINCT n-word shingle of
    the normalized text (word_shingles already dedups per document).
    Map-side explode only — no shuffle; the projection prunes every
    other column before the explode."""
    return (df.select(F.col(id_col),
                      F.explode(word_shingles(F.col(text_col), n))
                      .alias("__shingle"))
            .select(id_col, F.md5("__shingle").alias("shingle_hash")))


def contamination_report(train: DataFrame, eval_df: DataFrame,
                         id_col: str = "doc_id", text_col: str = "text",
                         n: int = 5, min_shared: int = 1,
                         broadcast_eval: bool = True) -> DataFrame:
    """Per-train-document overlap report: ``n_shingles`` (distinct
    n-grams in the doc), ``n_shared`` (of those, how many appear
    anywhere in the eval set), ``contaminated`` (n_shared >=
    min_shared). One shuffle: the membership probe is a broadcast left
    join, then a single groupBy(id) aggregates both counts."""
    tr = shingle_hash_set(train, id_col, text_col, n)
    ev = (shingle_hash_set(eval_df, id_col, text_col, n)
          .select("shingle_hash").distinct()
          .withColumn("__hit", F.lit(1)))
    if broadcast_eval:
        ev = F.broadcast(ev)
    return (tr.join(ev, "shingle_hash", "left")
            .groupBy(id_col)
            .agg(F.count(F.lit(1)).alias("n_shingles"),
                 F.count("__hit").alias("n_shared"))
            .withColumn("contaminated", F.col("n_shared") >= min_shared))


def decontaminate(train: DataFrame, eval_df: DataFrame,
                  id_col: str = "doc_id", text_col: str = "text",
                  n: int = 5, min_shared: int = 1,
                  broadcast_eval: bool = True) -> DataFrame:
    """Training corpus with contaminated documents removed — a
    broadcast-able anti-join against the (small) contaminated-id set,
    so the full train table streams through untouched."""
    bad = (contamination_report(train, eval_df, id_col, text_col, n,
                                min_shared, broadcast_eval)
           .filter("contaminated").select(id_col))
    return train.join(F.broadcast(bad), id_col, "left_anti")
