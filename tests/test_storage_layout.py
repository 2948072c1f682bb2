"""Storage-layout scale proofs: bucketed co-located joins and
partition-pruned index loads — the claims in README's 100 TB section
that depend on how tables are WRITTEN, not how queries are phrased."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


def test_bucketed_join_has_no_exchange(spark, tmp_path):
    """Two tables bucketed on the join key join WITHOUT a shuffle:
    the pre-bucketed layout replaces both Exchange nodes (this is the
    'bucketing for co-located joins' strategy for repeated big-big
    joins at scale)."""
    a = spark.range(10_000).select(F.col("id").alias("k"),
                                   (F.col("id") * 2).alias("va"))
    b = spark.range(10_000).select(F.col("id").alias("k"),
                                   (F.col("id") * 3).alias("vb"))
    import shutil
    warehouse = spark.conf.get("spark.sql.warehouse.dir").removeprefix("file:")
    for name, df in [("bkt_a", a), ("bkt_b", b)]:
        spark.sql(f"DROP TABLE IF EXISTS {name}")
        shutil.rmtree(f"{warehouse}/{name}", ignore_errors=True)
        df.write.bucketBy(8, "k").sortBy("k").mode("overwrite") \
            .saveAsTable(name)
    # force the big-big join path (broadcast would sidestep bucketing)
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = spark.table("bkt_a").join(spark.table("bkt_b"), "k")
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan
        assert "Exchange hashpartitioning" not in plan, plan
        assert joined.count() == 10_000
        # same data, non-bucketed: both sides shuffle
        a.createOrReplaceTempView("plain_a")
        b.createOrReplaceTempView("plain_b")
        plan2 = spark.table("plain_a").join(spark.table("plain_b"), "k") \
            ._jdf.queryExecution().executedPlan().toString()
        assert "Exchange hashpartitioning" in plan2
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        for name in ("bkt_a", "bkt_b"):
            spark.sql(f"DROP TABLE IF EXISTS {name}")


def test_saved_lsh_index_prunes_partitions(spark, tmp_path):
    """LshIndex.save writes the bucket table partitioned by signature;
    searching a loaded index turns bucket probes into partition pruning
    at the source (only the probed directories are read)."""
    from toy_vector_db_spark.operators.ann import LshIndex
    from toy_vector_db_spark.workload import _t

    e = _t(spark, "/root/testdata/sf0.001", "embeddings")
    idx = LshIndex.build(e, n_planes=4)
    path = str(tmp_path / "lsh")
    idx.save(path)
    loaded = LshIndex.load(spark, path)
    qvec = [float(x) for x in e.select("embedding").first()[0]]
    res = loaded.search(qvec, k=5, metric="cosine", multiprobe=1)
    plan = res._jdf.queryExecution().executedPlan().toString()
    # partition filter on __sig present, and no pushed row-filter needed
    assert "PartitionFilters" in plan
    assert "__sig" in plan.split("PartitionFilters")[1][:200]
    assert len(res.collect()) == 5


def test_batch_join_dynamic_partition_pruning(spark, tmp_path):
    """knn_join_ivf over a LOADED partitioned index: the probed-cluster
    set lives on the broadcast query side, not in a static filter, so
    source-level pruning must come from DYNAMIC partition pruning —
    Spark plants a dynamicpruning subquery on the partitioned scan.
    This is the 100 TB property: a batch of queries reads only the
    cluster directories their probes name, however big the corpus."""
    from pyspark.sql import functions as F
    from toy_vector_db_spark.operators.ann import IvfIndex
    from toy_vector_db_spark.operators.knn import knn_join_ivf
    from toy_vector_db_spark.workload import _t

    e = _t(spark, "/root/testdata/sf0.001", "embeddings")
    idx = IvfIndex.build_deterministic(e, n_centroids=8)
    path = str(tmp_path / "ivf")
    idx.save(path)
    loaded = IvfIndex.load(spark, path)
    queries = e.filter(F.col("vec_id").isin(1, 2)).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("query_vec"))
    res = knn_join_ivf(queries, loaded, k=5, nprobe=2)
    plan = res._jdf.queryExecution().executedPlan().toString()
    assert "dynamicpruning" in plan.lower()
    assert "PartitionFilters" in plan
    rows = res.collect()
    assert len(rows) == 10  # 2 queries x k=5
