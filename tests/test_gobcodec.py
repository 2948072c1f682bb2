"""Go gob interop (sources/gobcodec.py): decoder anchored to the
worked example in the public encoding/gob documentation, plus
round-trips through our own encoder for both reference snapshot
shapes (flat.go:168-246, hnsw.go:556-652)."""

from __future__ import annotations

import pytest

from toy_vector_db_spark.sources.gobcodec import (
    GobDecoder, read_gob_flat_index, read_gob_hnsw_index,
    write_gob_flat_index,
)

# The byte stream for struct Point{X, Y int}{22, 33} given in the Go
# encoding/gob package documentation ("The representation of types and
# values", the worked example) — a ground-truth fixture from the spec:
# typedef message for Point (id 65), then the value message.
POINT_STREAM = bytes([
    0x1f,                           # typedef message length 31
    0xff, 0x81,                     # type id -65: defining type 65
    0x03,                           # wireType field 2 (StructT)
    0x01,                           # structType field 0 (commonType)
    0x01, 0x05, 0x50, 0x6f, 0x69, 0x6e, 0x74,  # Name "Point"
    0x01, 0xff, 0x82,               # Id 65
    0x00,                           # end commonType
    0x01, 0x02,                     # structType field 1: 2 fields
    0x01, 0x01, 0x58, 0x01, 0x04, 0x00,  # {Name "X", Id 2 (int)}
    0x01, 0x01, 0x59, 0x01, 0x04, 0x00,  # {Name "Y", Id 2 (int)}
    0x00,                           # end structType
    0x00,                           # end wireType
    0x07,                           # value message length 7
    0xff, 0x82,                     # type id 65
    0x01, 0x2c,                     # field X (delta 1) = 22
    0x01, 0x42,                     # field Y (delta 1) = 33
    0x00,                           # end struct
])


def test_point_example_from_go_docs():
    val = GobDecoder(POINT_STREAM).decode()
    assert val == {"X": 22, "Y": 33}


def test_uint_int_float_primitives():
    from toy_vector_db_spark.sources.gobcodec import (
        _Reader, _enc_float, _enc_int, _enc_uint,
    )
    for u in (0, 1, 127, 128, 255, 256, 65536, 2**40):
        assert _Reader(_enc_uint(u)).read_uint() == u
    for i in (0, 1, -1, 22, -22, 2**31, -(2**31)):
        assert _Reader(_enc_int(i)).read_int() == i
    for f in (0.0, 1.0, 17.0, -2.5, 3.14159, 1e-30):
        assert _Reader(_enc_float(f)).read_float() == pytest.approx(
            f, rel=0, abs=0)
    # the doc's example: 17.0 encodes as fe 31 40
    assert _enc_float(17.0) == bytes([0xfe, 0x31, 0x40])


def test_flat_index_roundtrip(spark, tmp_path):
    rows = [("a", [1.0, 2.0], {"k": "v"}),
            ("b", [0.5, -0.25], {}),
            ("c", [0.0, 0.0], {"x": "1", "y": "2"})]
    df = spark.createDataFrame(
        rows, "id string, embedding array<float>, metadata map<string,string>")
    p = str(tmp_path / "flat.gob")
    assert write_gob_flat_index(df, p, metric="cosine") == 3
    back, metric = read_gob_flat_index(spark, p)
    assert metric == "cosine"
    got = {r["id"]: (list(r["embedding"]), dict(r["metadata"]))
           for r in back.collect()}
    assert got["a"] == ([1.0, 2.0], {"k": "v"})
    assert got["b"] == ([0.5, -0.25], {})
    # zero-length/zero-valued vectors survive (gob omits zero fields;
    # Values [0,0] is non-zero as a slice and must round-trip)
    assert got["c"] == ([0.0, 0.0], {"x": "1", "y": "2"})


def _hnsw_fixture_bytes() -> bytes:
    """Synthesize an HNSW snapshot stream with the encoder primitives —
    same shape the reference writes (hnsw.go:571-592)."""
    from toy_vector_db_spark.sources.gobcodec import (
        BOOL, FLOAT, INT, STRING, _enc_common, _enc_field_list, _enc_float,
        _enc_int, _enc_string, _enc_struct, _enc_uint, _typedef_msg,
    )
    T_FLOATS, T_META, T_VEC, T_EDGEMAP, T_EDGES, T_NODE, T_NODEMAP, \
        T_CFG, T_IDX = range(65, 74)
    header = b"".join([
        _typedef_msg(T_FLOATS, 1, _enc_struct(
            [(0, _enc_common("", T_FLOATS)), (1, _enc_int(FLOAT))])),
        _typedef_msg(T_META, 3, _enc_struct(
            [(0, _enc_common("", T_META)), (1, _enc_int(STRING)),
             (2, _enc_int(STRING))])),
        _typedef_msg(T_VEC, 2, _enc_struct(
            [(0, _enc_common("Vector", T_VEC)),
             (1, _enc_field_list([("ID", STRING), ("Values", T_FLOATS),
                                  ("Dimension", INT),
                                  ("Metadata", T_META)]))])),
        # map[string]float32 (one edge level)
        _typedef_msg(T_EDGEMAP, 3, _enc_struct(
            [(0, _enc_common("", T_EDGEMAP)), (1, _enc_int(STRING)),
             (2, _enc_int(FLOAT))])),
        # []map[string]float32
        _typedef_msg(T_EDGES, 1, _enc_struct(
            [(0, _enc_common("", T_EDGES)), (1, _enc_int(T_EDGEMAP))])),
        _typedef_msg(T_NODE, 2, _enc_struct(
            [(0, _enc_common("Node", T_NODE)),
             (1, _enc_field_list([("Vector", T_VEC), ("Edges", T_EDGES),
                                  ("Level", INT), ("Deleted", BOOL)]))])),
        _typedef_msg(T_NODEMAP, 3, _enc_struct(
            [(0, _enc_common("", T_NODEMAP)), (1, _enc_int(STRING)),
             (2, _enc_int(T_NODE))])),
        _typedef_msg(T_CFG, 2, _enc_struct(
            [(0, _enc_common("HNSWConfig", T_CFG)),
             (1, _enc_field_list([("M", INT), ("EfConstruction", INT),
                                  ("EfSearch", INT), ("MaxLevel", INT)]))])),
        _typedef_msg(T_IDX, 2, _enc_struct(
            [(0, _enc_common("indexData", T_IDX)),
             (1, _enc_field_list([("Nodes", T_NODEMAP),
                                  ("EntryPoint", STRING),
                                  ("CurrentMaxLevel", INT),
                                  ("Config", T_CFG),
                                  ("Metric", STRING)]))])),
    ])

    def vec(vid, values):
        return _enc_struct([
            (0, _enc_string(vid)),
            (1, _enc_uint(len(values))
             + b"".join(_enc_float(v) for v in values)),
            (2, _enc_int(len(values)))])

    def edge_level(links: dict) -> bytes:
        out = _enc_uint(len(links))
        for k, d in links.items():
            out += _enc_string(k) + _enc_float(d)
        return out

    def node(vid, values, links, deleted=False):
        fields = [(0, vec(vid, values)),
                  (1, _enc_uint(1) + edge_level(links))]
        if deleted:
            fields.append((3, _enc_uint(1)))
        return _enc_struct(fields)

    # 3 live nodes in a line a<->b<->c, plus a deleted node d
    nodes = {
        "a": node("a", [0.0, 0.0], {"b": 1.0}),
        "b": node("b", [1.0, 0.0], {"a": 1.0, "c": 1.0}),
        "c": node("c", [2.0, 0.0], {"b": 1.0, "d": 1.0}),
        "d": node("d", [9.0, 9.0], {"c": 1.0}, deleted=True),
    }
    nodemap = _enc_uint(len(nodes))
    for k, v in nodes.items():
        nodemap += _enc_string(k) + v
    cfg = _enc_struct([(0, _enc_int(2)), (1, _enc_int(200)),
                       (2, _enc_int(50)), (3, _enc_int(3))])
    value = _enc_int(T_IDX) + _enc_struct([
        (0, nodemap), (1, _enc_string("a")), (2, _enc_int(1)),
        (3, cfg), (4, _enc_string("euclidean"))])
    return header + _enc_uint(len(value)) + value


def test_hnsw_snapshot_imports_into_graph_tier(spark, tmp_path):
    p = str(tmp_path / "hnsw.gob")
    with open(p, "wb") as f:
        f.write(_hnsw_fixture_bytes())
    idx, metric = read_gob_hnsw_index(spark, p)
    assert metric == "euclidean"
    assert idx.m == 2
    # deleted node dropped from table AND edges
    ids = {r["id"] for r in idx.table.select("id").collect()}
    assert ids == {"a", "b", "c"}
    assert idx.edges.filter("src = 'd' OR dst = 'd'").count() == 0
    # the imported graph is searchable: nearest to (1.9, 0) is c then b
    rows = idx.search([1.9, 0.0], k=2, ef=4).collect()
    assert [r["id"] for r in rows] == ["c", "b"]


def test_cli_gob_export_import(spark, tmp_path, capsys):
    from toy_vector_db_spark.cli import main

    data_dir = str(tmp_path / "colls")

    def run(*argv):
        assert main(["--data-dir", data_dir, *argv]) == 0
        return capsys.readouterr().out

    run("add", "g1", "[1,2,3]", "--metadata", "k=v")
    run("add", "g2", "[4,5,6]")
    gob_path = str(tmp_path / "snapshot.gob")
    out = run("export", gob_path, "--format", "gob")
    assert "2 vector(s)" in out
    out = run("--collection", "fromgob", "import", gob_path)
    assert "Imported 2 vector(s)" in out
    got = run("--collection", "fromgob", "get", "g1")
    assert "g1" in got
    assert "k" in got and "v" in got  # metadata survived the round-trip


def test_truncated_stream_errors():
    with pytest.raises(ValueError):
        GobDecoder(POINT_STREAM[:-3]).decode()
    with pytest.raises(ValueError):
        GobDecoder(b"").decode()


# -- property fuzz: wire primitives are self-inverse over their full
# domains (no Go toolchain in this container, so spec conformance rests
# on the docs' byte anchors above + exhaustive round-trip coverage) ----

from hypothesis import given, settings
from hypothesis import strategies as st


@given(st.integers(min_value=0, max_value=2**64 - 1))
@settings(max_examples=300, deadline=None)
def test_fuzz_uint_roundtrip(u):
    from toy_vector_db_spark.sources.gobcodec import _Reader, _enc_uint
    assert _Reader(_enc_uint(u)).read_uint() == u


@given(st.integers(min_value=-(2**63), max_value=2**63 - 1))
@settings(max_examples=300, deadline=None)
def test_fuzz_int_roundtrip(i):
    from toy_vector_db_spark.sources.gobcodec import _Reader, _enc_int
    assert _Reader(_enc_int(i)).read_int() == i


@given(st.floats(allow_nan=False, width=64))
@settings(max_examples=300, deadline=None)
def test_fuzz_float_roundtrip(f):
    from toy_vector_db_spark.sources.gobcodec import _Reader, _enc_float
    got = _Reader(_enc_float(f)).read_float()
    assert got == f or (got == 0.0 and f == 0.0)


@given(st.text(max_size=64))
@settings(max_examples=200, deadline=None)
def test_fuzz_string_roundtrip(s):
    from toy_vector_db_spark.sources.gobcodec import _Reader, _enc_string
    assert _Reader(_enc_string(s)).read_string() == s


def test_hnsw_export_roundtrip(spark, tmp_path):
    # closing the one-way graph interop: OUR graph index -> HNSW-shaped
    # gob -> generic decode shows the reference's Load schema -> graph
    # re-import carries the identical edges and vectors
    from pyspark.sql import functions as F

    from toy_vector_db_spark.operators.graph import KnnGraphIndex
    from toy_vector_db_spark.sources.gobcodec import write_gob_hnsw_index
    from toy_vector_db_spark.workload import _t

    emb = _t(spark, "/root/testdata/sf0.001", "embeddings") \
        .filter(F.col("vec_id") < 60)
    idx = KnnGraphIndex.build(emb, m=4)
    path = str(tmp_path / "graph.gob")
    n = write_gob_hnsw_index(idx, path)
    assert n == 60

    with open(path, "rb") as f:
        data = GobDecoder(f.read()).decode()
    # the decoded shape is exactly what hnsw.go:602-652 Load expects
    assert set(data) <= {"Nodes", "EntryPoint", "CurrentMaxLevel",
                         "Config", "Metric"}
    assert data["Metric"] == "euclidean"
    assert data["Config"]["M"] == 4
    assert data["Config"]["EfConstruction"] == 200
    assert data["EntryPoint"] in data["Nodes"]
    node = data["Nodes"][data["EntryPoint"]]
    assert node["Vector"]["Dimension"] == 64
    assert len(node["Edges"]) == 1          # level 0 only
    assert not node.get("Deleted", False)

    # graph re-import: same topology, same vectors
    back, metric = read_gob_hnsw_index(spark, path)
    assert metric == "euclidean"
    orig_edges = {(str(r["src"]), str(r["dst"]))
                  for r in idx.edges.select("src", "dst").collect()}
    back_edges = {(r["src"], r["dst"])
                  for r in back.edges.select("src", "dst").collect()}
    assert back_edges == orig_edges
    assert back.table.count() == 60
    # and the re-imported graph still answers searches
    q = list(emb.filter("vec_id = 3").select("embedding").first()[0])
    got = back.search(q, k=5).collect()
    assert got and got[0]["id"] == "3"


def test_hnsw_export_skips_tombstones(spark, tmp_path):
    from pyspark.sql import functions as F

    from toy_vector_db_spark.operators.graph import KnnGraphIndex
    from toy_vector_db_spark.sources.gobcodec import write_gob_hnsw_index
    from toy_vector_db_spark.workload import _t

    emb = _t(spark, "/root/testdata/sf0.001", "embeddings") \
        .filter(F.col("vec_id") < 30)
    idx = KnnGraphIndex.build(emb, m=4).delete([1, 2])
    path = str(tmp_path / "graph_del.gob")
    assert write_gob_hnsw_index(idx, path) == 28
    with open(path, "rb") as f:
        data = GobDecoder(f.read()).decode()
    assert "1" not in data["Nodes"] and "2" not in data["Nodes"]
    # no dangling links to the dropped nodes either
    for node in data["Nodes"].values():
        for level in node.get("Edges", []):
            assert "1" not in level and "2" not in level
