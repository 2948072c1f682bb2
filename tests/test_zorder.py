"""Z-order clustering (functions/zorder + catalog.compact zorder_by):
key correctness against a Python Morton reference, and the actual
file-skipping property the layout exists for, measured from real
parquet footer stats."""

from __future__ import annotations

import os

import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F

from toy_vector_db_spark.functions.zorder import (
    fixed_width_bucket, interleave_bits, z_value,
)


def _py_morton(vals: list[int], bits: int) -> int:
    z = 0
    for i in range(bits):
        for j, v in enumerate(vals):
            z |= ((v >> i) & 1) << (i * len(vals) + j)
    return z


def test_interleave_matches_python_reference(spark):
    rows = [(a, b) for a in range(0, 64, 7) for b in range(0, 64, 11)]
    df = spark.createDataFrame(rows, ["a", "b"]).withColumn(
        "z", interleave_bits([F.col("a"), F.col("b")], bits=6))
    for r in df.collect():
        assert r["z"] == _py_morton([r["a"], r["b"]], 6)


def test_fixed_width_bucket_bounds(spark):
    df = spark.range(0, 1000).withColumn(
        "b", fixed_width_bucket(F.col("id"), 0, 999, 64))
    got = df.agg(F.min("b"), F.max("b"), F.countDistinct("b")).first()
    assert got[0] == 0 and got[1] == 63 and got[2] == 64
    # every bucket id stays below the cap even at the exact max value
    edge = spark.createDataFrame([(999,)], ["id"]).withColumn(
        "b", fixed_width_bucket(F.col("id"), 0, 999, 64)).first()
    assert edge["b"] == 63


def test_z_value_handles_dates(spark):
    df = spark.createDataFrame(
        [(1, "2024-01-01"), (2, "2024-06-30"), (3, "2024-12-31")],
        ["k", "d"]).withColumn("d", F.col("d").cast("date"))
    out = z_value(df, ["k", "d"], buckets=4).collect()
    assert len({r["__z"] for r in out}) == 3   # distinct corners separate


def test_z_value_null_edges(spark):
    """Empty input / all-null columns raise with the real cause (not a
    bare TypeError from int(None)); a null VALUE in an interleave
    column gets the min bucket, never a null __z key."""
    import pytest
    empty = spark.createDataFrame([], "k bigint, v bigint")
    with pytest.raises(ValueError, match="no non-null values"):
        z_value(empty, ["k", "v"])
    allnull = spark.createDataFrame([(1, None), (2, None)],
                                    "k bigint, v bigint")
    with pytest.raises(ValueError, match=r"\['v'\]"):
        z_value(allnull, ["k", "v"])
    mixed = spark.createDataFrame([(1, 10), (2, None), (3, 90)],
                                  "k bigint, v bigint")
    out = {r["k"]: r["__z"] for r in z_value(mixed, ["k", "v"],
                                             buckets=4).collect()}
    assert all(z is not None for z in out.values())
    # null v sorts with the smallest v values: same v-bits as row k=1
    low = {r["k"]: r["__z"] for r in
           z_value(mixed.fillna(10, subset=["v"]), ["k", "v"],
                   buckets=4).collect()}
    assert out[2] == low[2]


def _file_boxes(path: str, xcol: str, ycol: str):
    boxes = []
    for f in sorted(os.listdir(path)):
        if not (f.startswith("part-") and f.endswith(".parquet")):
            continue
        md = pq.read_metadata(os.path.join(path, f))
        lo = {xcol: None, ycol: None}
        hi = {xcol: None, ycol: None}
        for rg in range(md.num_row_groups):
            row = md.row_group(rg)
            for ci in range(row.num_columns):
                col = row.column(ci)
                nm = col.path_in_schema
                if nm in lo and col.statistics is not None:
                    s = col.statistics
                    lo[nm] = s.min if lo[nm] is None else min(lo[nm], s.min)
                    hi[nm] = s.max if hi[nm] is None else max(hi[nm], s.max)
        boxes.append((lo[xcol], hi[xcol], lo[ycol], hi[ycol]))
    return boxes


@pytest.mark.parametrize("n_files", [16])
def test_write_zordered_skips_files_on_both_dims(spark, tmp_path, n_files):
    from toy_vector_db_spark.functions.zorder import write_zordered
    # 4096 points on a 64x64 grid, hash order so ingest order
    # correlates with NEITHER dimension
    rows = [((i * 2654435761) % 4096,) for i in range(4096)]
    df = spark.createDataFrame(rows, ["h"]).select(
        (F.col("h") % 64).alias("x"), (F.col("h") / 64).cast("int").alias("y"))

    def intersecting(path, pred):
        return sum(1 for (xl, xh, yl, yh) in _file_boxes(path, "x", "y")
                   if pred(xl, xh, yl, yh))

    # single-key sort on x: perfect x pruning, ZERO y selectivity
    sortx = str(tmp_path / "sortx")
    df.repartitionByRange(n_files, "x").sortWithinPartitions("x") \
        .write.parquet(sortx)
    sortx_y = intersecting(sortx, lambda xl, xh, yl, yh:
                           not (yh < 0 or yl > 7))
    assert sortx_y == n_files          # y-box predicate touches every file

    zpath = str(tmp_path / "z")
    write_zordered(df, zpath, ["x", "y"], target_files=n_files)
    z_y = intersecting(zpath, lambda xl, xh, yl, yh: not (yh < 0 or yl > 7))
    z_x = intersecting(zpath, lambda xl, xh, yl, yh: not (xh < 0 or xl > 7))
    assert z_y <= n_files // 2         # both dims now partially selective
    assert z_x <= n_files // 2
    # the layout rewrite must not change the data
    got = sorted((r["x"], r["y"])
                 for r in spark.read.parquet(zpath).collect())
    want = sorted((r["x"], r["y"]) for r in df.collect())
    assert got == want


def test_compact_zorder_mutual_exclusion(spark, tmp_path):
    from toy_vector_db_spark.plans.catalog import CollectionCatalog
    cat = CollectionCatalog(spark, str(tmp_path))
    cat.create("c")
    with pytest.raises(ValueError, match="mutually exclusive"):
        cat.compact("c", sort_by=["id"], zorder_by=["id"])
