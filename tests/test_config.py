"""Config surface parity (reference internal/config/config.go +
config.yaml): defaults, missing-file fallback, load/save round-trip,
partial-file merge, and CLI wiring (--config feeds data_dir /
default_dimension / index type)."""

from __future__ import annotations

import pytest

from toy_vector_db_spark.config import (EngineConfig, load_config,
                                        save_config, _parse_simple_yaml)


def test_defaults_match_reference():
    # DefaultConfig values, config.go:42-61
    cfg = EngineConfig()
    assert cfg.server.host == "127.0.0.1" and cfg.server.port == 8080
    assert cfg.storage.data_dir == "./data"
    assert cfg.vector.default_dimension == 128
    assert cfg.indexing.type == "hnsw"
    assert cfg.indexing.hnsw_max_links == 16
    assert cfg.indexing.hnsw_ef_construct == 200


def test_missing_file_returns_defaults(tmp_path):
    # config.go:76-79: nonexistent path -> defaults, no error
    cfg = load_config(str(tmp_path / "nope.yaml"))
    assert cfg == EngineConfig()
    assert load_config(None) == EngineConfig()


def test_save_load_roundtrip(tmp_path):
    cfg = EngineConfig()
    cfg.storage.data_dir = "/tmp/x y"   # space survives quoting
    cfg.vector.default_dimension = 64
    cfg.indexing.type = "ivf"
    path = str(tmp_path / "sub" / "cfg.yaml")  # parent dir created
    save_config(cfg, path)
    assert load_config(path) == cfg


def test_partial_file_merges_over_defaults(tmp_path):
    p = tmp_path / "cfg.yaml"
    p.write_text("vector:\n  default_dimension: 32\n")
    cfg = load_config(str(p))
    assert cfg.vector.default_dimension == 32
    assert cfg.indexing.type == "hnsw"        # untouched default
    assert cfg.storage.data_dir == "./data"


def test_reference_config_yaml_shape_parses():
    # the exact shipped file shape (config.yaml), via the fallback
    # parser so both loaders are covered
    text = ('server:\n  host: "127.0.0.1"\n  port: 8080\n\n'
            'storage:\n  data_dir: "./data"\n\n'
            'vector:\n  default_dimension: 128\n\n'
            'indexing:\n  type: "hnsw"\n  hnsw_max_links: 16\n'
            '  hnsw_ef_construct: 200\n')
    data = _parse_simple_yaml(text)
    assert data["server"] == {"host": "127.0.0.1", "port": 8080}
    assert data["indexing"]["type"] == "hnsw"


def test_resolve_index_type_and_params():
    cfg = EngineConfig()
    # hnsw -> graph since r4 (the direct analogue exists)
    assert cfg.resolve_index_type() == "graph"
    cfg.indexing.type = "IVFPQ"
    assert cfg.resolve_index_type() == "ivfpq"
    cfg.indexing.type = "btree"
    with pytest.raises(ValueError):
        cfg.resolve_index_type()
    params = EngineConfig().spark_index_params()
    assert params["nlist"] == 100 and params["nprobe"] == 8
    assert params["num_hash_tables"] == 7
    assert params["m"] == 16 and params["ef"] == 50  # reference knobs


def test_cli_uses_config(tmp_path, capsys):
    from toy_vector_db_spark.cli import main

    cfg = EngineConfig()
    cfg.storage.data_dir = str(tmp_path / "cfg_driven")
    cfg.vector.default_dimension = 5
    path = str(tmp_path / "cfg.yaml")
    save_config(cfg, path)

    def run(*argv):
        assert main(["--config", path, *argv]) == 0
        return capsys.readouterr().out

    out = run("random", "r1")            # dim omitted -> config's 5
    assert "dim 5" in out
    assert "1" in run("count")
    # data lived under the config's data_dir, not the default
    assert (tmp_path / "cfg_driven").exists()
    # search with index omitted -> hnsw -> graph tier
    run("add", "a", "[1,0,0,0,0]")
    run("add", "b", "[0.9,0.1,0,0,0]")
    out = run("search", "a", "1")
    assert "b" in out
