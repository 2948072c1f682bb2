from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from toy_vector_db_spark.operators.sampling import deterministic_shuffle
from toy_vector_db_spark.operators.shards import (
    shard_manifest, write_training_shards,
)


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(
        [(i, f"text {i}") for i in range(95)], ["doc_id", "text"])


def test_shards_bounded_and_counted(spark, docs, tmp_path):
    out = str(tmp_path / "shards")
    manifest = write_training_shards(docs, out, "doc_id",
                                     records_per_file=10).collect()
    assert sum(r["n_rows"] for r in manifest) == 95
    assert all(r["n_rows"] <= 10 for r in manifest)
    assert len(manifest) >= 10
    # manifest names are the actual files
    files = {f for f in os.listdir(out) if f.endswith(".parquet")}
    assert {r["shard"] for r in manifest} <= files


def test_shard_order_is_the_deterministic_shuffle(spark, docs, tmp_path):
    out = str(tmp_path / "ordered")
    write_training_shards(docs, out, "doc_id", records_per_file=10)
    expected = [r["doc_id"]
                for r in deterministic_shuffle(docs, "doc_id").collect()]
    got = []
    for f in sorted(os.listdir(out)):
        if f.endswith(".parquet"):
            got += [r["doc_id"] for r in
                    spark.read.parquet(os.path.join(out, f)).collect()]
    assert got == expected


def test_rewrite_reproduces_order(spark, docs, tmp_path):
    a, b = str(tmp_path / "a"), str(tmp_path / "b")
    write_training_shards(docs, a, "doc_id", records_per_file=25)
    write_training_shards(docs, b, "doc_id", records_per_file=25)

    def seq(path):
        rows = []
        for f in sorted(os.listdir(path)):
            if f.endswith(".parquet"):
                rows += [r["doc_id"] for r in
                         spark.read.parquet(os.path.join(path, f)).collect()]
        return rows
    assert seq(a) == seq(b)


def test_validation(docs, tmp_path):
    with pytest.raises(ValueError, match="records_per_file"):
        write_training_shards(docs, str(tmp_path / "x"), "doc_id",
                              records_per_file=0)
