"""Training-shard export: materialize a reproducible training order.

The last mile of the data pipeline: after cleaning/dedup/mixing, the
corpus is written out in a SHUFFLED, REPRODUCIBLE order as fixed-size
shards that the training loader streams sequentially. Composition of
existing pieces:

- order: ``sampling.deterministic_shuffle`` — sort by md5(salt+key),
  a range-partitioned sort (Spark samples split points, skew bounded);
- sharding: the parquet writer's ``maxRecordsPerFile`` splits each
  sorted partition into bounded files WITHOUT another shuffle; file
  names inherit the partition index, so lexicographic file order IS
  the global shuffled order;
- manifest: one distributed pass over the written files
  (input_file_name + count) — the loader's index, also the audit
  that row counts survived the write.

Scale: one wide op total (the sort). Everything else is map-side or
metadata. Re-running with the same salt reproduces byte-identical
order — the property training-restart reproducibility depends on.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .sampling import deterministic_shuffle


def write_training_shards(df: DataFrame, path: str, key: str,
                          records_per_file: int = 100_000,
                          salt: str = "shuffle") -> DataFrame:
    """Write ``df`` as ordered training shards under ``path``; returns
    the manifest (shard file name, n_rows) ordered by shard. Global
    row order = ascending md5(salt + key), recovered by reading shards
    in file-name order."""
    if records_per_file < 1:
        raise ValueError(
            f"records_per_file must be >= 1, got {records_per_file}")
    spark = df.sparkSession
    ordered = deterministic_shuffle(df, key, salt)
    (ordered.write.mode("overwrite")
     .option("maxRecordsPerFile", records_per_file)
     .parquet(path))
    return shard_manifest(spark, path)


def shard_manifest(spark: SparkSession, path: str) -> DataFrame:
    """(shard, n_rows) per written file, shard = bare file name,
    ordered — one distributed scan of file metadata + counts."""
    return (spark.read.parquet(path)
            .groupBy(F.element_at(F.split(F.input_file_name(), "/"), -1)
                     .alias("shard"))
            .agg(F.count(F.lit(1)).alias("n_rows"))
            .orderBy("shard"))
