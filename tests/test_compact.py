"""Catalog compaction (OPTIMIZE analogue): rewrite the current
snapshot into few files as a NEW version — data identical, old
versions untouched, optional range-cluster + sort for min/max
pruning."""

from __future__ import annotations

import pytest

from toy_vector_db_spark.plans.catalog import CollectionCatalog


@pytest.fixture()
def catalog(spark, tmp_path):
    return CollectionCatalog(spark, str(tmp_path / "collections"))


def _fill(catalog, name, n_batches=5, rows_per=4):
    catalog.create(name)
    for b in range(n_batches):
        catalog.insert(name, [
            (f"v{b}_{i}", [float(b), float(i)], {"b": str(b)})
            for i in range(rows_per)])


def test_compact_reduces_files_keeps_data(catalog):
    _fill(catalog, "c")
    def snap():
        return sorted((r["id"], tuple(r["embedding"]),
                       tuple(sorted((r["metadata"] or {}).items())))
                      for r in catalog.read("c").collect())
    before_rows = snap()
    v_before = catalog._version("c")
    files_before, files_after = catalog.compact("c", target_files=1)
    assert files_after == 1
    assert files_before >= 1
    # new committed version, data bit-identical
    assert catalog._version("c") == v_before + 1
    assert snap() == before_rows


def test_compact_preserves_time_travel(catalog):
    _fill(catalog, "tt")
    v_before = catalog._version("tt")
    n_before = catalog.read_version("tt", v_before).count()
    catalog.compact("tt", target_files=1)
    # the pre-compaction snapshot is still readable and unchanged
    assert catalog.read_version("tt", v_before).count() == n_before


def test_compact_sorted_files(catalog, spark):
    _fill(catalog, "s", n_batches=6)
    catalog.compact("s", target_files=2, sort_by=["id"])
    # each output file is internally sorted by id (range partition +
    # sortWithinPartitions); verify per-file monotonicity
    import pyspark.sql.functions as F
    df = spark.read.parquet(catalog._data_path("s")) \
        .withColumn("f", F.input_file_name())
    for _, grp in __import__("itertools").groupby(
            sorted(df.select("f", "id").collect(), key=lambda r: r["f"]),
            key=lambda r: r["f"]):
        ids = [r["id"] for r in grp]
        assert ids == sorted(ids)


def test_compact_validation(catalog):
    _fill(catalog, "v", n_batches=1)
    with pytest.raises(ValueError, match="target_files"):
        catalog.compact("v", target_files=0)


def test_sql_optimize_verb(spark, catalog):
    from toy_vector_db_spark.plans.dialect import SqlEngine
    _fill(catalog, "o", n_batches=4)
    eng = SqlEngine(spark, catalog)
    res = eng.execute("OPTIMIZE o FILES 1")
    assert "compacted" in res.message and res.affected == 1
    assert catalog._file_count("o") == 1
    # sorted form parses too
    res2 = eng.execute("OPTIMIZE o FILES 2 SORT BY id")
    assert res2.affected == 2
    assert "OPTIMIZE" in eng.explain("OPTIMIZE o")


def test_sql_optimize_zorder_verb(spark, catalog):
    # ZORDER BY over a docs sidecar (the catalog surface with numeric
    # columns); data identical after the layout rewrite, sort_by and
    # zorder_by mutually exclusive at the verb level too
    from toy_vector_db_spark.plans.catalog import DOCS_SUFFIX
    from toy_vector_db_spark.plans.dialect import SqlEngine
    import os
    import datetime as dt
    name = "d" + DOCS_SUFFIX
    epoch = dt.datetime(2024, 1, 1)
    docs = spark.createDataFrame(
        [(f"doc{i}", f"text {i}", "text", None, None,
          epoch + dt.timedelta(hours=(i * 37) % 90),
          epoch + dt.timedelta(hours=i))
         for i in range(40)],
        "doc_id string, content string, content_type string, "
        "vector array<float>, metadata map<string,string>, "
        "created_at timestamp, updated_at timestamp")
    os.makedirs(catalog._dir(name), exist_ok=True)
    catalog._commit(name, docs)
    eng = SqlEngine(spark, catalog)
    res = eng.execute(
        f"OPTIMIZE {name} FILES 2 ZORDER BY created_at, updated_at")
    assert "compacted" in res.message
    got = sorted((r["doc_id"], r["created_at"], r["updated_at"])
                 for r in catalog.read(name).collect())
    assert got == sorted((r["doc_id"], r["created_at"], r["updated_at"])
                         for r in docs.collect())
    with pytest.raises(ValueError, match="mutually exclusive"):
        catalog.compact(name, 1, sort_by=["doc_id"],
                        zorder_by=["created_at"])


def test_history_lists_versions(catalog):
    _fill(catalog, "h", n_batches=2)   # create + 2 inserts = 3 commits
    hist = catalog.history("h")
    assert [e["version"] for e in hist] == sorted(e["version"] for e in hist)
    assert sum(e["is_current"] for e in hist) == 1
    assert hist[-1]["is_current"]
    assert all(e["n_files"] >= 0 and e["committed_at"] > 0 for e in hist)
    import pytest
    with pytest.raises(KeyError):
        catalog.history("nope")


def test_vacuum_removes_old_versions(catalog):
    _fill(catalog, "vac", n_batches=2)
    assert len(catalog.versions("vac")) > 1      # keep_versions=2
    removed = catalog.vacuum("vac", retain_versions=1)
    assert removed
    assert catalog.versions("vac") == [catalog._version("vac")]
    # data still readable after the sweep
    assert catalog.read("vac").count() == 8
    import pytest
    with pytest.raises(ValueError, match="retain_versions"):
        catalog.vacuum("vac", retain_versions=0)
