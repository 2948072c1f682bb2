"""Testdata table loading / registration.

The reference's storage layer (one .vec file per vector,
/root/reference/pkg/storage/storage.go:133-292) maps to plain Parquet
scans here — columnar, splittable, predicate-pushdown-capable.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

TABLES = (
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def load_table(spark: SparkSession, name: str, sf_dir: str = DEFAULT_SF_DIR) -> DataFrame:
    return spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))


def ensure_parallelism(df: DataFrame, factor: int = 1) -> DataFrame:
    """Rebalance before CPU-heavy per-row work (hash folds, Arrow UDFs).

    Parquet scans parallelize at row-group granularity; a coarse
    upstream layout (testdata ships single-row-group files) serializes
    everything downstream of the scan. When the source already has >=
    cores*factor partitions (any real 100 TB layout), this is a no-op —
    the round-robin shuffle is only inserted where the alternative is
    idle executors."""
    sc = df.sparkSession.sparkContext
    target = sc.defaultParallelism * factor
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df


def register_all(spark: SparkSession, sf_dir: str = DEFAULT_SF_DIR) -> dict[str, DataFrame]:
    """Register every testdata table as a temp view (enables spark.sql)."""
    out = {}
    for name in TABLES:
        path = os.path.join(sf_dir, f"{name}.parquet")
        if os.path.exists(path):
            df = spark.read.parquet(path)
            df.createOrReplaceTempView(name)
            out[name] = df
    return out
