"""Interval-join strategies and the approx-distinct error contract."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from toy_vector_db_spark.operators.rangejoin import (
    banded_interval_join, interval_join,
)

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def points(spark):
    return spark.createDataFrame(
        [(i, float(v)) for i, v in enumerate(
            [0.0, 0.5, 1.0, 2.5, 9.99, 10.0, 49.9, 50.0, 420.0, 7.0])],
        ["pid", "value"]).cache()


@pytest.fixture(scope="module")
def bands(spark):
    return spark.createDataFrame(
        [("a", 0.0, 1.0), ("b", 1.0, 10.0), ("c", 10.0, 50.0),
         ("d", 50.0, 1e9), ("empty", 5.0, 5.0)],
        ["band", "lo", "hi"])


def _pairs(df):
    return sorted((r["pid"], r["band"]) for r in df.collect())


def test_interval_join_edges(points, bands):
    got = dict(_pairs(interval_join(points, bands, "value")))
    assert got[0] == "a" and got[1] == "a"      # lo inclusive
    assert got[2] == "b"                        # hi exclusive
    assert got[5] == "c" and got[7] == "d"      # boundary points move up
    assert len(_pairs(interval_join(points, bands, "value"))) == 10


@pytest.mark.parametrize("w", [0.5, 1.0, 3.0, 64.0])
def test_banded_equals_broadcast(points, bands, w):
    # the 1e9 catch-all band requires the domain clamp (otherwise the
    # explode would materialize hi/w buckets)
    a = _pairs(interval_join(points, bands, "value"))
    b = _pairs(banded_interval_join(points, bands, "value", band_width=w,
                                    domain=(0.0, 512.0)))
    assert a == b


def test_banded_unbounded_interval_fails_fast(points, bands):
    with pytest.raises(Exception, match="wider than"):
        banded_interval_join(points, bands, "value", band_width=0.5).collect()


def test_banded_is_equi_join(spark, points, bands):
    plan = banded_interval_join(points, bands, "value", band_width=8.0,
                                domain=(0.0, 512.0)) \
        ._jdf.queryExecution().executedPlan().toString()
    assert "__band" in plan
    assert "CartesianProduct" not in plan and "NestedLoop" not in plan


def test_broadcast_path_is_bnlj(spark, points, bands):
    plan = interval_join(points, bands, "value") \
        ._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" in plan


def test_approx_distinct_error_bound(spark):
    from toy_vector_db_spark.workload import _t
    e = _t(spark, SF, "events")
    approx = e.agg(F.approx_count_distinct("user_id", 0.02).alias("a")).first()["a"]
    exact = e.select("user_id").distinct().count()
    assert abs(approx - exact) / max(exact, 1) < 0.05
