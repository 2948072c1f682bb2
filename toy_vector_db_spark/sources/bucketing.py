"""Bucketed table layouts: pre-shuffled storage for co-located joins.

At 100 TB the single most expensive physical operator is the shuffle
that hash-partitions both sides of a big equi-join (or a groupBy) on
the key. Spark's bucketing writes that partitioning INTO the layout:
``bucketBy(n, key)`` hashes each row to a bucket file at write time, so
a later join/agg on the key reads both sides already co-partitioned —
the planner drops the Exchange on every bucketed side (asserted in
tests/test_plans.py::test_bucketed_join_skips_shuffle). Pay the shuffle
once at ingest; every subsequent join of fact tables (orders ⋈
lineitem, events ⋈ sessions, corpus ⋈ dedup-verdicts) is shuffle-free.

Reference parity note: the reference has no layout control at all (one
.vec file per vector, pkg/storage/storage.go:133-292); this is the
beyond-parity scale path for the repeated-join regime. The ANN indexes
achieve the same co-location a different way (partitioned-by-cluster
parquet, operators/ann.py).

Bucketing rules the planner enforces (worth knowing at design time):
- both sides must be bucketed on the join key with compatible bucket
  counts (equal, or one a multiple of the other);
- buckets are per-table-write; appending with a different count errors;
- bucketed tables live in the session catalog (``saveAsTable``), not at
  bare paths — path-written parquet keeps no bucket metadata.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession


def save_bucketed(df: DataFrame, table: str, bucket_cols: Sequence[str],
                  n_buckets: int, sort_cols: Sequence[str] | None = None,
                  mode: str = "overwrite") -> None:
    """Write ``df`` as a catalog table bucketed on ``bucket_cols``.

    ``sort_cols`` additionally sorts within each bucket file (enables
    sort-merge joins without a per-task sort when both sides are
    bucket-sorted on the key). ``n_buckets`` should be sized so one
    bucket of the LARGER table fits an executor core's working set —
    at 100 TB that means thousands of buckets, not dozens.
    """
    if n_buckets < 1:
        raise ValueError(f"n_buckets must be >= 1, got {n_buckets}")
    writer = (df.write.mode(mode)
              .bucketBy(n_buckets, *bucket_cols)
              .format("parquet"))
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    writer.saveAsTable(table)


def bucketed(spark: SparkSession, table: str) -> DataFrame:
    """Read a bucketed catalog table (the bucket spec rides along in
    the catalog; a plain ``spark.table`` read uses it)."""
    return spark.table(table)


def cobucket_tables(spark: SparkSession, frames: dict[str, tuple[DataFrame,
                                                                 Sequence[str]]],
                    n_buckets: int) -> None:
    """Bucket several tables on their (shared) join keys with one
    compatible bucket count — the ingest-time step that makes every
    pairwise equi-join among them shuffle-free. ``frames`` maps table
    name -> (df, bucket_cols)."""
    for table, (df, cols) in frames.items():
        save_bucketed(df, table, cols, n_buckets, sort_cols=cols)
