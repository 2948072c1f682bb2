"""Streaming ingest loop over the incremental dedup store.

The true production shape of `operators/incdedup.MinHashStore`:
documents arrive as files, each micro-batch is checked against the
persisted signature store, flags land in a parquet sink, and —
optionally — accepted (non-duplicate) documents are appended to the
store so LATER micro-batches dedup against them too.

Why foreachBatch and not a stream-static join: ``dedup_batch``'s plan
contains two row_number windows (the deterministic candidate cap and
the best-match pick), and non-time windows are unsupported in a
streaming plan. Inside ``foreachBatch`` every micro-batch is an
ordinary batch DataFrame, so the EXACT batch operator runs unchanged
— one code path, one oracle. This is the standard Structured
Streaming escape hatch for batch-only operators and also what makes
the evolving store possible at all: a streaming plan cannot append to
the static side of its own join, but a foreachBatch step can.

Semantics:
  * ``add_unique=False`` (the oracle mode): the store is read-only;
    draining all input in one AvailableNow batch equals the batch
    operator exactly, so the batch value oracle applies verbatim.
  * ``add_unique=True`` (the ingest mode): accepted docs join the
    store, so results depend on micro-batch arrival order BY DESIGN
    (the first copy wins, later copies are flagged against it) —
    covered by sequenced-drain unit tests, not a value oracle.
    "First copy wins" also holds INSIDE one micro-batch: store-
    accepted docs are swept against each other with the same banded
    MinHash + verify pipeline before the store append, so two copies
    of a novel document arriving together yield one winner (smallest
    id — there is no arrival order within a batch) and one flagged
    row; only winners reach the store. A flagged doc's ``dup_of`` is
    its best intra-batch partner, which in a transitive near-dup
    chain (a~b, b~c, a!~c) can itself be flagged — the store-side
    guarantee (dup_of is always an accepted doc) applies to
    cross-batch flags only.

Scale: per micro-batch cost is the batch operator's (store never
shuffled or broadcast); the file sink appends executor-side (no
driver collect); exactly-once comes from the sink checkpoint, and the
store append in ingest mode is idempotent per epoch only if the
upstream source replays whole files (Spark's file source does) —
a re-run epoch re-appends, the documented at-least-once trade of
side effects in foreachBatch.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..operators.incdedup import MinHashStore


def dedup_stream_against_store(docs: DataFrame, store: MinHashStore,
                               out_dir: str, checkpoint_dir: str,
                               threshold: float = 0.5,
                               max_candidates: int = 64,
                               add_unique: bool = False) -> None:
    """Drain ``docs`` (a streaming frame) through the store check with
    Trigger.AvailableNow; (id, is_dup, dup_of, sim) rows append to
    ``out_dir`` as parquet. Returns when the stream has drained."""

    def step(batch_df: DataFrame, epoch_id: int) -> None:
        res = store.dedup_batch(batch_df, threshold=threshold,
                                max_candidates=max_candidates)
        if add_unique:
            # intra-batch sweep: without it, two copies of a novel doc
            # in the SAME micro-batch would both pass the store check
            # and both be appended permanently. Same banded-minhash +
            # exact-jaccard pipeline, same store parameters, run over
            # the store-accepted slice only (batch-sized work).
            from pyspark.sql import Window

            from ..operators.dedup import minhash_lsh_pairs
            accepted = batch_df.join(
                F.broadcast(res.filter(~F.col("is_dup"))
                            .select(store.id_col)), store.id_col,
                "left_semi")
            pairs = minhash_lsh_pairs(
                accepted, text_col=store.text_col, id_col=store.id_col,
                num_perm=store.num_perm, bands=store.bands,
                shingle_k=store.shingle_k, threshold=threshold,
                max_bucket=max_candidates)
            best = Window.partitionBy("id_b").orderBy(
                F.desc("jaccard"), F.asc("id_a"))
            intra = (pairs.withColumn("__rn", F.row_number().over(best))
                     .filter(F.col("__rn") == 1)
                     .select(F.col("id_b").alias(store.id_col),
                             F.col("id_a").alias("__dup_of"),
                             F.col("jaccard").alias("__sim")))
            res = (res.join(F.broadcast(intra), store.id_col, "left")
                   .select(store.id_col,
                           (F.col("is_dup")
                            | F.col("__dup_of").isNotNull())
                           .alias("is_dup"),
                           F.coalesce("dup_of", "__dup_of")
                           .alias("dup_of"),
                           F.coalesce("sim", "__sim").alias("sim")))
            res.write.mode("append").parquet(out_dir)
            winners = accepted.join(
                F.broadcast(intra.select(store.id_col)), store.id_col,
                "left_anti")
            store.add(winners)
        else:
            res.write.mode("append").parquet(out_dir)

    q = (docs.writeStream.foreachBatch(step)
         .option("checkpointLocation", checkpoint_dir)
         .trigger(availableNow=True).start())
    q.awaitTermination()
