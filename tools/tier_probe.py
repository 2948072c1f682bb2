"""A/B the IVF expression-vs-Arrow tier crossover (r13, VERDICT r12 #2).

The r12 expression folding (one transform lambda over a nested-array
literal instead of n_centroids fold copies) changed the cost balance
the EXPR_MAX_CENTROIDS=32 crossover was tuned under (r7). This probe
times the two tiers of `IvfIndex._assign_expr` and
`knn.probe_clusters_expr` — the per-row hot loops of every IVF/IVF-PQ
build and batch join — at a sweep of centroid counts over the sf
embeddings, forced through each tier by monkeypatching the constant.

Both tiers are value-identical by contract (first-minimum argmin /
stable argsort tie-breaks; parity-tested), so this is purely a speed
measurement: each cell is best-of-``runs`` of a full noop-sink pass.

Usage: python tools/tier_probe.py [sf_dir] [runs]
"""

from __future__ import annotations

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

NLISTS = [8, 16, 32, 64, 128, 179, 256, 565]


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    runs = int(sys.argv[2]) if len(sys.argv) > 2 else 3

    import numpy as np

    import importlib
    # operators/__init__ re-exports the knn FUNCTION under the same
    # name, shadowing the submodule on attribute access
    knn_mod = importlib.import_module("toy_vector_db_spark.operators.knn")
    from toy_vector_db_spark.operators.ann import IvfIndex, det_sample
    from toy_vector_db_spark.session import get_spark

    spark = get_spark("tier-probe")
    spark.sparkContext.setLogLevel("ERROR")
    e = spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet"))
    e.count()  # warm footers/JVM
    n_rows = e.count()
    sample = det_sample(e, max(NLISTS), "vec_id", "embedding")
    print(f"rows={n_rows} dim={sample.shape[1]}")

    def t_noop(df) -> float:
        best = float("inf")
        for _ in range(runs):
            t0 = time.perf_counter()
            df.write.format("noop").mode("overwrite").save()
            best = min(best, time.perf_counter() - t0)
        return best

    from pyspark.sql import functions as F
    for nlist in NLISTS:
        if nlist > len(sample):
            continue
        cents = np.asarray(sample)[:nlist]
        row = [f"nlist={nlist:4d}"]
        for tier, cap in (("expr", 10**9), ("arrow", 0)):
            prev = knn_mod.EXPR_MAX_CENTROIDS
            knn_mod.EXPR_MAX_CENTROIDS = cap
            try:
                spark.sparkContext.setJobDescription(
                    f"assign nlist={nlist} tier={tier}")
                assign = e.withColumn(
                    "__cluster", IvfIndex._assign_expr(cents, "embedding"))
                ta = t_noop(assign.select("vec_id", "__cluster"))
                spark.sparkContext.setJobDescription(
                    f"probe nlist={nlist} tier={tier}")
                probes = knn_mod.probe_clusters_expr(
                    cents, F.col("embedding"), 3)
                tp = t_noop(e.select("vec_id", probes.alias("__p")))
            finally:
                knn_mod.EXPR_MAX_CENTROIDS = prev
                spark.sparkContext.setJobDescription(None)
            row.append(f"{tier}: assign {ta:6.2f}s probe {tp:6.2f}s")
        print(" | ".join(row), flush=True)


if __name__ == "__main__":
    main()
