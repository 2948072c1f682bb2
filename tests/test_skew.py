"""salted_join equivalence + spreading behavior."""

from __future__ import annotations

from pyspark.sql import functions as F

from toy_vector_db_spark.operators.skew import salted_join, top_keys


def _fixture(spark):
    # one hot key (0) with 5k rows, long tail of 100 keys
    big = spark.range(6000).select(
        F.when(F.col("id") < 5000, 0).otherwise(F.col("id") % 100)
        .alias("k"), F.col("id").alias("payload"))
    small = spark.range(100).select(F.col("id").alias("k"),
                                    (F.col("id") * 10).alias("dim"))
    return big, small


def test_salted_join_matches_plain_join(spark):
    big, small = _fixture(spark)
    want = sorted((r["k"], r["payload"], r["dim"]) for r in
                  big.join(small, "k").collect())
    got = sorted((r["k"], r["payload"], r["dim"]) for r in
                 salted_join(big, small, "k", buckets=8).collect())
    assert got == want


def test_salted_join_left_outer(spark):
    big, small = _fixture(spark)
    # drop key 7 from small: left join must keep big's rows with null dim
    small7 = small.filter(F.col("k") != 7)
    want = sorted((r["k"], r["payload"], r["dim"]) for r in
                  big.join(small7, "k", "left").collect())
    got = sorted((r["k"], r["payload"], r["dim"]) for r in
                 salted_join(big, small7, "k", buckets=4, how="left").collect())
    assert got == want


def test_salt_spreads_hot_key(spark):
    big, _ = _fixture(spark)
    salted = big.withColumn("__salt", (F.rand(42) * 8).cast("int"))
    per_salt = salted.filter(F.col("k") == 0).groupBy("__salt").count()
    rows = per_salt.collect()
    assert len(rows) == 8                      # hot key hits every bucket
    assert max(r["count"] for r in rows) < 5000  # no bucket holds it all


def test_top_keys_profile(spark):
    big, _ = _fixture(spark)
    top = top_keys(big, "k", n=1).collect()
    # 5000 hot rows + the tail ids divisible by 100
    assert top[0]["k"] == 0 and top[0]["count"] == 5010
