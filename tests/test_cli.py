"""CLI front-end round-trip (reference cmd surface, main.go:99-282),
run in-process against the shared test SparkSession."""

from __future__ import annotations

import pytest

from toy_vector_db_spark.cli import main


@pytest.fixture()
def run(spark, tmp_path, capsys):
    data_dir = str(tmp_path / "colls")

    def _run(*argv: str) -> str:
        assert main(["--data-dir", data_dir, *argv]) == 0
        return capsys.readouterr().out

    return _run


def test_crud_roundtrip(run):
    run("add", "v1", "[1,0,0]", "--metadata", "cat=a")
    run("add", "v2", "[0,1,0]")
    assert "2" in run("count")
    got = run("get", "v1")
    assert "v1" in got
    listing = run("list")
    assert "v1" in listing and "v2" in listing
    run("delete", "v2")
    assert "1" in run("count")


def test_search_and_sql(run):
    for vid, vec in [("a", "[1,0,0]"), ("b", "[0,1,0]"), ("c", "[0.9,0.1,0]")]:
        run("add", vid, vec)
    out = run("search", "flat", "a", "1")
    assert "c" in out and "a" not in out.split("distance")[1]  # self excluded
    out = run("search", "graph", "a", "1")  # HNSW-analogue tier
    assert "c" in out
    out = run("search", "auto", "a", "1")   # cost-based chooser route
    assert "c" in out
    out = run("sql", "SELECT id FROM vectors NEAREST TO [1,0,0] LIMIT 2")
    assert "a" in out and "c" in out
    out = run("sql", "SELECT count(*) FROM vectors")
    assert "3" in out


def test_embed_and_search_text(run):
    run("embed", "text", "doc1", "spark distributed query engine")
    run("embed", "text", "doc2", "cooking pasta at home")
    # the mock embedder is deterministic-random: only IDENTICAL text
    # lands on the same vector, so query with doc1's exact content
    out = run("search-text", "spark distributed query engine", "--k", "1")
    assert "doc1" in out and "0.0" in out


def test_embed_writes_document_sidecar(run, spark, tmp_path):
    # embed persists the FULL document (content + vector + metadata +
    # timestamps) alongside the vector row — reference cmd_embed.go:100-112
    run("embed", "text", "docA", "hello sidecar world")
    run("embed", "json", "docB", '{"title": "b", "body": "text"}')
    from toy_vector_db_spark.plans.catalog import CollectionCatalog
    cat = CollectionCatalog(spark, str(tmp_path / "colls"))
    docs = {r["doc_id"]: r for r in cat.read_docs("vectors").collect()}
    assert set(docs) == {"docA", "docB"}
    a = docs["docA"]
    assert a["content"] == "hello sidecar world"
    assert a["content_type"] == "text"
    assert len(a["vector"]) == 384
    assert a["created_at"] is not None and a["updated_at"] is not None
    assert docs["docB"]["content_type"] == "json"
    # the sidecar vector IS the stored vector row
    vec = cat.read("vectors").filter("id = 'docA'").first()["embedding"]
    assert list(vec) == list(a["vector"])
    # re-embedding the same id: the vector insert runs first and errors
    # on the duplicate (reference INSERT semantics), sidecar untouched
    with pytest.raises(ValueError, match="duplicate id"):
        run("embed", "text", "docA", "changed")
    assert cat.read_docs("vectors").filter(
        "content = 'changed'").count() == 0


def test_export_import(run, tmp_path):
    run("add", "x", "[1,2]")
    path = str(tmp_path / "dump")
    run("export", path)
    run("--collection", "restored", "import", path)
    out = run("--collection", "restored", "list")
    assert "x" in out


def test_export_docs_vec_rejected(run, tmp_path):
    # --docs has no .vec representation; must be an argparse error,
    # not a silent export of the wrong table
    with pytest.raises(SystemExit) as e:
        run("export", str(tmp_path / "x"), "--docs", "--format", "vec")
    assert e.value.code == 2


def test_export_docs_parquet_roundtrips_via_import(run, spark, tmp_path):
    # `export --docs --format parquet` output must be consumable by
    # `import` (restores sidecar + vector rows) — r3 advice: this combo
    # previously produced a parquet import couldn't round-trip
    run("embed", "text", "docRT", "round trip body")
    path = str(tmp_path / "docs_pq")
    run("export", path, "--docs", "--format", "parquet")
    out = run("--collection", "other", "import", path)
    assert "Imported 1 vector(s)" in out
    got = run("--collection", "other", "get", "docRT")
    assert "docRT" in got
    # sidecar restored too: docs export from the new collection works
    out2 = run("--collection", "other", "export",
               str(tmp_path / "docs_json2"), "--docs", "--format", "json")
    assert "1 document(s)" in out2


def test_export_docs_json(run, spark, tmp_path):
    # JSON sidecar export: format parity with the reference, which
    # persists each embedded Document as JSON (cmd_embed.go:100-112)
    import json as _json
    run("embed", "text", "docA", "json export body")
    path = str(tmp_path / "docs_json")
    out = run("export", path, "--docs", "--format", "json")
    assert "1 document(s)" in out
    rows = [r.asDict() for r in spark.read.json(path).collect()]
    assert len(rows) == 1
    d = rows[0]
    assert d["doc_id"] == "docA"
    assert d["content"] == "json export body"
    assert d["content_type"] == "text"
    assert len(d["vector"]) == 384
    assert d["created_at"] is not None and d["updated_at"] is not None
    # and the raw files really are JSON lines a non-Spark reader can load
    import glob
    files = glob.glob(f"{path}/part-*")
    assert files
    with open(files[0]) as f:
        first = _json.loads(f.readline())
    assert first["doc_id"] == "docA"
