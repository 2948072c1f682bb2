"""SQ8 scalar quantization + sign-bit binarization/Hamming tiers."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from toy_vector_db_spark.operators.sq import (
    Sq8Codec, binarize_expr, binarize_one, hamming_topk, sq8_topk,
)


@pytest.fixture(scope="module")
def corpus(spark):
    rows = [
        (0, [0.0, 1.0, -1.0, 5.0]),
        (1, [0.5, 0.5, 0.0, 5.0]),      # dim 3 constant across corpus
        (2, [1.0, -1.0, 1.0, 5.0]),
        (3, [-1.0, 0.0, -0.5, 5.0]),
    ]
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>")


def test_sq8_codes_range_and_error_bound(spark, corpus):
    codec = Sq8Codec.fit(corpus)
    enc = codec.encode(corpus).collect()
    for r in enc:
        for j, c in enumerate(r["__sq8"]):
            assert 0 <= c <= 255
            # dequantized value within half a step of the original
            x = float(r["embedding"][j])
            xh = codec.mins[j] + c * codec.scales[j]
            assert abs(x - xh) <= codec.scales[j] / 2 + 1e-9


def test_sq8_constant_dimension_no_nan(spark, corpus):
    codec = Sq8Codec.fit(corpus)
    assert codec.scales[3] == 0.0          # constant dim -> scale 0
    res = sq8_topk(corpus, [0.0, 0.0, 0.0, 5.0], k=4, tie_col="vec_id")
    ds = [r["distance"] for r in res.collect()]
    assert len(ds) == 4 and all(d == d for d in ds)  # no NaN


def test_sq8_topk_ranks_like_exact_on_coarse_data(spark, corpus):
    # the fixture's values sit exactly on quantization grid points a
    # 255-step scale resolves; top-1 must be the true nearest
    res = sq8_topk(corpus, [1.0, -1.0, 1.0, 5.0], k=1, tie_col="vec_id")
    assert res.first()["vec_id"] == 2


def test_sq8_validates(spark, corpus):
    with pytest.raises(ValueError, match="k must be"):
        sq8_topk(corpus, [0.0] * 4, k=0)
    codec = Sq8Codec.fit(corpus)
    with pytest.raises(ValueError, match="query dim"):
        codec.score_expr([0.0] * 3)


def test_binarize_multiword_matches_python_twin(spark):
    # dim 130 -> 3 words; signs alternate so every word has structure,
    # incl. bit 63 (the sign bit of the BIGINT)
    vec = [(1.0 if (i * 7) % 3 else -1.0) for i in range(130)]
    df = spark.createDataFrame([(0, vec)], "id long, v array<float>")
    got = df.select(binarize_expr("v", 130).alias("w")).first()["w"]
    assert list(got) == binarize_one(vec)
    assert len(got) == 3


def test_hamming_topk_semantics(spark):
    rows = [(0, [1.0] * 64),
            (1, [1.0] * 64),                       # identical -> dist 0
            (2, [-1.0] + [1.0] * 63),              # 1 bit flipped
            (3, [-1.0] * 64)]                      # all 64 flipped
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    res = hamming_topk(df, [1.0] * 64, k=3, exclude_id=0, tie_col="vec_id")
    got = [(r["vec_id"], r["hamming"]) for r in res.collect()]
    assert got == [(1, 0), (2, 1), (3, 64)]
