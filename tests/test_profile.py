from __future__ import annotations

import pytest

from toy_vector_db_spark.operators.profile import profile_table


@pytest.fixture(scope="module")
def table(spark):
    return spark.createDataFrame(
        [(1, "a", None), (2, "b", 1.5), (3, "b", 2.5), (4, None, 2.5)],
        "id long, cat string, val double")


def test_profile_metrics(table):
    rows = {r["col_name"]: r for r in profile_table(table).collect()}
    assert set(rows) == {"id", "cat", "val"}
    assert rows["id"]["n_nulls"] == 0 and rows["id"]["n_distinct"] == 4
    assert rows["id"]["min_value"] == "1" and rows["id"]["max_value"] == "4"
    assert rows["cat"]["n_nulls"] == 1 and rows["cat"]["n_distinct"] == 2
    assert rows["val"]["n_nulls"] == 1 and rows["val"]["n_distinct"] == 2
    # native-type ordering, not lexicographic: min over doubles
    assert float(rows["val"]["min_value"]) == 1.5


def test_profile_column_subset_and_validation(table):
    out = profile_table(table, ["cat"]).collect()
    assert len(out) == 1 and out[0]["col_name"] == "cat"
    with pytest.raises(KeyError, match="no such column"):
        profile_table(table, ["nope"])


def test_profile_approximate_tier(table):
    rows = {r["col_name"]: r
            for r in profile_table(table, approximate=True).collect()}
    # HLL++ on 4 tiny groups is exact in practice; bound it loosely
    assert 3 <= rows["id"]["n_distinct"] <= 5
