"""Every workload query matches its DuckDB oracle at sf0.001 (the
driver's gate runs the same comparison at sf0.01)."""

from __future__ import annotations

import os

import duckdb
import pytest

from tools.check_oracle import norm_rows

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def ducks():
    con = duckdb.connect()
    for t in ("region nation customer supplier part orders lineitem events "
              "documents embeddings").split():
        p = os.path.join(SF, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    return con


def _pairs():
    import __spark_entry__ as e
    qs, os_ = e.queries(), e.oracle_sql()
    return [(n, qs[n], os_.get(n)) for n in qs]


@pytest.mark.parametrize("name,fn,oracle",
                         _pairs(), ids=[n for n, _, _ in _pairs()])
def test_query_matches_oracle(spark, ducks, name, fn, oracle):
    sdf = fn(spark, SF)
    # Registry guard: the driver's canonicalizer sorts rows across all
    # columns before hashing and crashes on list/map/struct columns
    # (embedding_centroids_by_label went driver-RED in r5 this way).
    # Every registered query must emit atomic-typed columns only.
    from pyspark.sql import types as T
    bad = [f.name for f in sdf.schema.fields
           if isinstance(f.dataType, (T.ArrayType, T.MapType, T.StructType))]
    assert not bad, (f"query {name!r} emits non-atomic columns {bad}; "
                     "the driver hash harness cannot canonicalize them — "
                     "explode or stringify before returning")
    scols, srows = sdf.columns, [tuple(r) for r in sdf.collect()]
    if oracle is None:
        assert len(srows) >= 0  # rows-only check
        return
    res = ducks.execute(oracle)
    ocols = [d[0] for d in res.description]
    orows = [tuple(r) for r in res.fetchall()]
    sc, sr = norm_rows(scols, srows)
    oc, orr = norm_rows(ocols, orows)
    assert sc == oc
    assert len(sr) == len(orr)
    assert sr == orr


def test_entry_smoke(spark):
    import __spark_entry__ as e
    df = e.entry(spark)
    rows = df.collect()
    assert len(rows) >= 1
    assert "distance" in df.columns
