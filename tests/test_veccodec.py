"""Binary .vec codec: byte-level parity with the reference's Encode/
Decode (pkg/core/vector/vector.go:90-177) and file-store layout
(pkg/storage/storage.go:248,280), including its escape quirks."""

from __future__ import annotations

import struct

import pytest

from toy_vector_db_spark.sources.veccodec import (
    decode_metadata, decode_vector, encode_metadata, encode_vector,
    read_vec_dir, write_vec_dir,
)


def test_layout_bytes_exact():
    # hand-assembled reference layout: u32 id_len | id | u32 dim |
    # dim*f32 | u32 meta_len | meta
    buf = encode_vector("v1", [1.0, -2.5], {"cat": "a"})
    expect = (struct.pack("<I", 2) + b"v1"
              + struct.pack("<I", 2) + struct.pack("<2f", 1.0, -2.5)
              + struct.pack("<I", 5) + b"cat=a")
    assert buf == expect


def test_escape_roundtrip_mirrors_reference_lossiness():
    """The reference's decoder consumes ALL backslashes in the first
    (';') split pass, so the second ('=') split sees formerly-escaped
    '=' unprotected: any pair whose key/value contains '=' splits
    3-way and is silently dropped (vector.go:203-226 + :228-254).
    Escaped ';' in values DOES survive (it is protected in the pass
    that splits on ';'). We mirror both behaviors bit-for-bit rather
    than fixing an on-disk format we don't own."""
    meta = {"k=ey": "va;lue", "plain": "x", "both": "a=b;c",
            "semi": "a;b"}
    vid, vals, m = decode_vector(encode_vector("id;=1", [0.5], meta))
    assert vid == "id;=1"  # the id is length-prefixed — never escaped
    assert vals == [0.5]
    # pairs containing '=' dropped; ';'-only pairs survive
    assert m == {"plain": "x", "semi": "a;b"}


def test_metadata_keys_sorted_but_order_insensitive_decode():
    # we emit sorted (fixing the reference's Go-map nondeterminism);
    # decode accepts any order like the reference's does
    s = encode_metadata({"b": "2", "a": "1"})
    assert s == "a=1;b=2"
    assert decode_metadata("b=2;a=1") == {"a": "1", "b": "2"}


def test_malformed_pairs_dropped_like_reference():
    # a pair that does not split into exactly key=value is dropped
    # (vector.go:214-216); bare backslash escapes (and drops before)
    # any char
    assert decode_metadata("novalue;k=v") == {"k": "v"}
    assert decode_metadata("a=b=c;k=v") == {"k": "v"}
    assert decode_metadata("k\\x=v") == {"kx": "v"}


def test_truncated_buffers_error():
    buf = encode_vector("abc", [1.0, 2.0], {"m": "1"})
    with pytest.raises(ValueError):
        decode_vector(buf[:4])  # shorter than the 8-byte minimum
    with pytest.raises(ValueError):
        decode_vector(buf[:9])  # id present, dim header cut
    with pytest.raises(ValueError):
        decode_vector(buf[:16])  # values cut
    # truncated METADATA section decodes as empty map, not an error
    # (the reference only reads metadata when fully present)
    vid, vals, m = decode_vector(buf[:4 + 3 + 4 + 8 + 2])
    assert (vid, vals, m) == ("abc", [1.0, 2.0], {})


def test_empty_vector_and_no_metadata():
    vid, vals, m = decode_vector(encode_vector("e", [], None))
    assert (vid, vals, m) == ("e", [], {})


def test_spark_dir_roundtrip(spark, tmp_path):
    rows = [("a", [1.0, 2.0, 3.0], {"cat": "x"}),
            ("b", [0.0, -1.0, 0.5], {}),
            ("c;d", [9.0, 9.0, 9.0], {"semi": "x;y", "k=": "dropped"})]
    df = spark.createDataFrame(
        rows, "id string, embedding array<float>, metadata map<string,string>")
    d = str(tmp_path / "store")
    assert write_vec_dir(df, d) == 3
    back = {r["id"]: (list(r["embedding"]), dict(r["metadata"]))
            for r in read_vec_dir(spark, d).collect()}
    assert set(back) == {"a", "b", "c;d"}
    assert back["a"] == ([1.0, 2.0, 3.0], {"cat": "x"})
    # the '='-bearing pair is dropped by the reference's decode rules
    assert back["c;d"] == ([9.0, 9.0, 9.0], {"semi": "x;y"})


def test_write_vec_dir_rejects_path_escaping_ids(spark, tmp_path):
    import pytest
    rows = [("../evil", [1.0], {})]
    df = spark.createDataFrame(
        rows, "id string, embedding array<float>, metadata map<string,string>")
    d = str(tmp_path / "store")
    with pytest.raises(Exception):  # executor ValueError surfaces as Py4J error
        write_vec_dir(df, d)
    import os
    assert not os.path.exists(str(tmp_path / "evil.vec"))


def test_cli_vec_export_import(spark, tmp_path, capsys):
    from toy_vector_db_spark.cli import main

    data_dir = str(tmp_path / "colls")

    def run(*argv):
        assert main(["--data-dir", data_dir, *argv]) == 0
        return capsys.readouterr().out

    run("add", "v1", "[1,0]", "--metadata", "cat=a")
    run("add", "v2", "[0,1]")
    store = str(tmp_path / "vecstore")
    out = run("export", store, "--format", "vec")
    assert "2 vector(s)" in out
    out = run("--collection", "restored", "import", store)
    assert "Imported 2" in out
    listing = run("--collection", "restored", "list")
    assert "v1" in listing and "v2" in listing
