"""Skew-aware join: salting for hot keys.

At 100 TB a handful of hot keys (a bot user_id, an empty-string
metadata value) can put one shuffle partition hours behind the rest.
AQE's skew-join splitting (enabled in session.py) handles sort-merge
skew at runtime; ``salted_join`` is the explicit variant for when the
build side must be replicated anyway (e.g. aggregation follows, or AQE
is unavailable on the deployment).

Mechanics: the skewed (big) side gets a random salt in [0, buckets);
the small side is exploded ``buckets`` times so every (key, salt) pair
finds its match. The hot key's rows now spread over ``buckets``
partitions. Equivalent rows, bounded replication (|small| * buckets).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(big: DataFrame, small: DataFrame, on: str,
                buckets: int = 8, how: str = "inner",
                seed: int = 42) -> DataFrame:
    """Join ``big`` (skewed) with ``small`` on column ``on``, spreading
    each key of ``big`` across ``buckets`` shuffle partitions."""
    if buckets < 1:
        raise ValueError(f"buckets must be >= 1, got {buckets}")
    salted_big = big.withColumn(
        "__salt", (F.rand(seed) * buckets).cast("int"))
    salted_small = small.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(buckets - 1))))
    out = salted_big.join(salted_small, [on, "__salt"], how)
    return out.drop("__salt")


def top_keys(df: DataFrame, key: str, n: int = 10) -> DataFrame:
    """Key-frequency profile — run this before deciding to salt."""
    return (df.groupBy(key).count()
            .orderBy(F.col("count").desc_nulls_last()).limit(n))
