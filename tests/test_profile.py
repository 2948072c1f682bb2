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


def test_numeric_quantiles_exact_and_grouped(spark):
    from toy_vector_db_spark.operators.profile import numeric_quantiles

    df = spark.createDataFrame(
        [(1.0, "a"), (2.0, "a"), (3.0, "b"), (4.0, "b"), (None, "b")],
        "x double, g string")
    flat = {(r["q"]): r["value"]
            for r in numeric_quantiles(df, ["x"], [0.0, 0.5, 1.0]).collect()}
    assert flat == {0.0: 1.0, 0.5: 2.5, 1.0: 4.0}  # nulls ignored
    by_g = {(r["g"], r["q"]): r["value"]
            for r in numeric_quantiles(df, ["x"], [0.5],
                                       group_col="g").collect()}
    assert by_g == {("a", 0.5): 1.5, ("b", 0.5): 3.5}


def test_numeric_quantiles_validation(spark):
    import pytest as _pytest

    from toy_vector_db_spark.operators.profile import numeric_quantiles

    df = spark.createDataFrame([(1.0,)], ["x"])
    with _pytest.raises(ValueError):
        numeric_quantiles(df, [])
    with _pytest.raises(ValueError):
        numeric_quantiles(df, ["x"], [1.5])
    with _pytest.raises(KeyError):
        numeric_quantiles(df, ["nope"])
