"""BPE driver-round-count pathology probe (r10, VERDICT r9 Next #2).

``learn_bpe``'s scale edge was never data size (every round is
vocab-sized) but the DRIVER LOOP: one merge per round means ~2 Spark
jobs x n_merges — a job-count wall at production vocab sizes. Batched
rounds (top-B symbol-disjoint pairs fused per round) divide the round
count by ~B. This probe measures both tiers at a production-shaped
merge count and prints the wall-clock + achieved rounds; BASELINE.md
records the numbers per round.

Usage:
    python tools/bpe_probe.py [n_merges] [batch] [sf_dir]
"""
from __future__ import annotations

import sys
import time

sys.path.insert(0, ".")

from toy_vector_db_spark.session import get_spark  # noqa: E402


def main() -> None:
    n_merges = int(sys.argv[1]) if len(sys.argv) > 1 else 1024
    batch = int(sys.argv[2]) if len(sys.argv) > 2 else 64
    sf = sys.argv[3] if len(sys.argv) > 3 else "/root/testdata/sf0.1"
    spark = get_spark("bpe-probe")
    from pyspark.sql import functions as F

    from toy_vector_db_spark.operators.bpe import learn_bpe, segment
    from toy_vector_db_spark.workload import _tp

    # the sf documents table has a ~31-word vocabulary (fully fused in
    # ~90 merges), so a production-shaped merge count needs a
    # vocab-rich corpus: append deterministic sha2 hex words (16
    # symbols, tens of thousands of distinct 8-char words — a real
    # tokenizer-training pair distribution shape, JVM-side generator)
    real = _tp(spark, sf, "documents").select("doc_id", "text")
    hexwords = spark.range(20_000).select(
        (F.col("id") + 10_000_000).alias("doc_id"),
        F.regexp_replace(
            F.sha2(F.col("id").cast("string"), 256),
            "(.{8})", "$1 ").alias("text"))
    docs = real.unionByName(hexwords).localCheckpoint()
    n_docs = docs.count()

    t0 = time.time()
    merges, vocab = learn_bpe(docs, n_merges=n_merges, batch=batch)
    t_batched = time.time() - t0
    n_rounds_max = -(-len(merges) // batch)  # upper bound on rounds
    print(f"batched : {len(merges)} merges, batch={batch} "
          f"(<= {n_rounds_max} rounds if every batch filled) over "
          f"{n_docs} docs in {t_batched:.1f}s")

    # sanity: the learned table segments through the Arrow tier
    t0 = time.time()
    seg = segment(vocab.select("word"), merges)
    n_syms = seg.selectExpr("sum(size(syms))").collect()[0][0]
    print(f"segment : {n_syms} symbols over the vocab in "
          f"{time.time() - t0:.1f}s (Arrow tier, "
          f"{len(merges)} merges)")

    # sequential twin at a SMALL merge count to extrapolate the wall:
    # per-round cost is ~constant, so seq_1024 ~ 1024 * (t_seq/64).
    t0 = time.time()
    seq_merges, _ = learn_bpe(docs, n_merges=64, batch=1)
    t_seq = time.time() - t0
    print(f"seq ref : {len(seq_merges)} merges sequentially in "
          f"{t_seq:.1f}s -> extrapolated {n_merges} merges ~ "
          f"{t_seq / 64 * n_merges:.0f}s sequential vs "
          f"{t_batched:.1f}s batched")
    spark.stop()


if __name__ == "__main__":
    main()
