"""CLI front-end — the reference's command surface on Spark.

Reference: /root/reference/cmd/vectodb/main.go
  add/get/list/delete/count/random/set-metadata  (:101-282)
  search <index> <id> <k>                        (:335-429)
  sql "<query>"                                  (:291-332)
  search-text "<text>"                           (cmd_search_text.go)
  embed text|json <id> <content>                 (cmd_embed.go)
  import/export — TODO stubs in the reference    (:84-98); implemented here.

Usage: python -m toy_vector_db_spark.cli <command> [...]
State lives in --data-dir (versioned-parquet collections, plans/catalog.py).
"""

from __future__ import annotations

import argparse
import json
import sys

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def format_result(df: DataFrame, max_width: int = 50, limit: int = 1000) -> str:
    """ASCII table like the reference's formatResult
    (pkg/sql/cli/service.go:100-174, 50-char column cap :116-118)."""
    rows = df.limit(limit).collect()
    cols = df.columns

    def cell(v) -> str:
        if v is None:
            return "NULL"
        s = str(v)
        return s[: max_width - 3] + "..." if len(s) > max_width else s

    table = [[cell(v) for v in row] for row in rows]
    widths = [max(len(c), *(len(r[i]) for r in table)) if table else len(c)
              for i, c in enumerate(cols)]
    sep = "+" + "+".join("-" * (w + 2) for w in widths) + "+"
    out = [sep, "|" + "|".join(f" {c:<{w}} " for c, w in zip(cols, widths)) + "|", sep]
    for r in table:
        out.append("|" + "|".join(f" {v:<{w}} " for v, w in zip(r, widths)) + "|")
    out.append(sep)
    out.append(f"{len(table)} row(s)")
    return "\n".join(out)


def _parse_vector(text: str) -> list[float]:
    text = text.strip()
    if text.startswith("["):
        return [float(x) for x in json.loads(text)]
    return [float(x) for x in text.split(",")]


def _parse_metadata(text: str | None) -> dict[str, str] | None:
    if not text:
        return None
    return dict(kv.split("=", 1) for kv in text.split(","))


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(prog="toy_vector_db_spark",
                                description=__doc__.splitlines()[0])
    p.add_argument("--config", default=None,
                   help="YAML config (reference config.yaml surface; "
                        "missing file -> defaults). Flags override it.")
    p.add_argument("--data-dir", default=None)
    p.add_argument("--collection", default="vectors")
    p.add_argument("--metric", default="euclidean")
    p.add_argument("--master", default=None)
    p.add_argument("-v", "--verbose", action="store_true",
                   help="print the query plan before results "
                        "(reference -verbose, service.go:69-78)")
    sub = p.add_subparsers(dest="command", required=True)

    sub.add_parser("sql").add_argument("query")
    a = sub.add_parser("add")
    a.add_argument("id"); a.add_argument("vector")
    a.add_argument("--metadata", default=None)
    sub.add_parser("get").add_argument("id")
    sub.add_parser("list")
    sub.add_parser("count")
    sub.add_parser("delete").add_argument("id")
    r = sub.add_parser("random")
    r.add_argument("id")
    r.add_argument("dim", type=int, nargs="?", default=None,
                   help="defaults to vector.default_dimension from --config")
    m = sub.add_parser("set-metadata")
    m.add_argument("id"); m.add_argument("key"); m.add_argument("value")
    s = sub.add_parser("search")
    s.add_argument("index", nargs="?", default=None,
                   choices=["flat", "lsh", "ivf", "pq", "ivfpq", "graph",
                            "auto"],
                   help="defaults to indexing.type from --config "
                        "(hnsw maps to graph, config.resolve_index_type); "
                        "auto picks a tier by corpus size/dim/metric "
                        "(operators/chooser.py)")
    s.add_argument("id"); s.add_argument("k", type=int)
    st = sub.add_parser("search-text")
    st.add_argument("text"); st.add_argument("--k", type=int, default=10)
    e = sub.add_parser("embed")
    e.add_argument("content_type", choices=["text", "json"])
    e.add_argument("id"); e.add_argument("content")
    sub.add_parser("import").add_argument("path")
    x = sub.add_parser("export")
    x.add_argument("path")
    x.add_argument("--format", choices=["parquet", "json", "vec", "gob"],
                   default="parquet")
    x.add_argument("--docs", action="store_true",
                   help="export the document sidecar (content + vector + "
                        "metadata + timestamps) instead of the vector table "
                        "— as JSON this mirrors the reference's per-doc "
                        "JSON persistence (cmd_embed.go:100-112)")
    return p


def main(argv: list[str] | None = None) -> int:
    parser = build_parser()
    args = parser.parse_args(argv)
    if getattr(args, "command", None) == "export" and args.docs \
            and args.format in ("vec", "gob"):
        # the binary vector layouts have no document representation
        # (content/timestamps) — silently dropping --docs exported the
        # wrong table; fail loudly instead
        parser.error(f"--docs cannot be combined with --format "
                     f"{args.format} (it holds vectors only; "
                     "use json/parquet)")
    from .config import load_config
    from .plans.catalog import CollectionCatalog
    from .plans.dialect import SqlEngine
    from .session import get_spark

    cfg = load_config(args.config)
    data_dir = args.data_dir if args.data_dir is not None \
        else (cfg.storage.data_dir if args.config else "./vectodb_data")
    spark = get_spark("vectodb-cli", master=args.master)
    catalog = CollectionCatalog(spark, data_dir)
    engine = SqlEngine(spark, catalog, default_metric=args.metric)
    coll = args.collection
    out = sys.stdout

    def ensure():
        catalog.create(coll, if_not_exists=True)

    cmd = args.command
    if cmd == "sql":
        if args.verbose:
            print(engine.explain(args.query), file=out)
        res = engine.execute(args.query)
        print(format_result(res.df) if res.df is not None else res.message,
              file=out)
    elif cmd == "add":
        ensure()
        catalog.insert(coll, [(args.id, _parse_vector(args.vector),
                               _parse_metadata(args.metadata))])
        print(f"Added vector {args.id}", file=out)
    elif cmd == "get":
        ensure()
        df = catalog.read(coll).filter(F.col("id") == args.id)
        print(format_result(df), file=out)
    elif cmd == "list":
        ensure()
        print(format_result(catalog.read(coll).select("id").orderBy("id")),
              file=out)
    elif cmd == "count":
        ensure()
        print(catalog.read(coll).count(), file=out)
    elif cmd == "delete":
        ensure()
        n = catalog.delete(coll, "id = '{}'".format(args.id.replace("'", "''")))
        print(f"Deleted {n} row(s)", file=out)
    elif cmd == "random":
        import random as _random
        ensure()
        dim = args.dim if args.dim is not None else cfg.vector.default_dimension
        vec = [_random.random() for _ in range(dim)]
        catalog.insert(coll, [(args.id, vec, None)])
        print(f"Added random vector {args.id} (dim {dim})", file=out)
    elif cmd == "set-metadata":
        ensure()
        n = catalog.set_metadata(coll, args.id, args.key, args.value)
        print(f"Updated {n} row(s)", file=out)
    elif cmd == "search":
        ensure()
        from .operators.knn import knn, lookup_vector
        df = catalog.read(coll)
        qvec = lookup_vector(df.withColumnRenamed("id", "__id"), "__id", args.id)
        index_type = args.index or cfg.resolve_index_type()
        if index_type == "auto":
            from .operators.chooser import search_auto
            plan, res = search_auto(
                df.filter(F.col("id") != args.id), qvec, k=args.k,
                metric=args.metric, id_col="id", vec_col="embedding",
                tie_col="id")
            print(f"tier: {plan.tier} ({plan.reason})", file=sys.stderr)
        elif index_type == "flat":
            res = knn(df, qvec, k=args.k + 1, metric=args.metric,
                      exclude_id=args.id, id_col="id").limit(args.k)
        elif index_type in ("lsh", "ivf"):
            from .operators.ann import IvfIndex, LshIndex
            params = cfg.spark_index_params()
            if index_type == "lsh":
                idx = LshIndex.build(df, id_col="id", vec_col="embedding")
                res = idx.search(qvec, k=args.k + 1, metric=args.metric)
            else:
                # nlist from config, bounded by corpus size (KMeans
                # needs k <= points; toy collections are tiny)
                nlist = min(params["nlist"], max(1, df.count()))
                idx = IvfIndex.build(df, n_centroids=nlist,
                                     id_col="id", vec_col="embedding")
                res = idx.search(qvec, k=args.k + 1, metric=args.metric,
                                 nprobe=min(params["nprobe"], nlist))
            res = res.filter(F.col("id") != args.id).limit(args.k)
        elif index_type == "graph":
            # the HNSW analogue (operators/graph.py): m/ef derive from
            # the reference's max_links/ef_construct config knobs
            from .operators.graph import KnnGraphIndex
            params = cfg.spark_index_params()
            n = df.count()
            m_deg = min(params["m"], max(1, n - 1))
            idx = KnnGraphIndex.build(df, m=m_deg, metric=args.metric,
                                      id_col="id", vec_col="embedding",
                                      n_centroids=min(8, max(1, n)))
            res = idx.search(qvec, k=args.k + 1, ef=params["ef"]) \
                .filter(F.col("id") != args.id).limit(args.k)
        else:  # pq / ivfpq: ADC is euclidean-only, rerank exact
            from .operators.pq import IvfPqIndex, PqIndex
            idx = (PqIndex.build(df, id_col="id", vec_col="embedding")
                   if index_type == "pq" else
                   IvfPqIndex.build_deterministic(df, id_col="id",
                                                  vec_col="embedding"))
            res = idx.search(qvec, k=args.k + 1, rerank=4) \
                .filter(F.col("id") != args.id).limit(args.k)
        print(format_result(res.select("id", F.round("distance", 6).alias("distance"))), file=out)
    elif cmd == "search-text":
        ensure()
        from .functions.embedding import search_text
        res = search_text(catalog.read(coll), args.text, k=args.k,
                          metric=args.metric, vec_col="embedding")
        print(format_result(res.select("id", F.round("distance", 6).alias("distance"))), file=out)
    elif cmd == "embed":
        ensure()
        # writes BOTH the vector row and the full document sidecar
        # (content + vector + metadata + timestamps), matching the
        # reference's embed command (cmd_embed.go:100-112)
        from .functions.embedding import EMBEDDING_DIM, ingest_documents
        df = spark.createDataFrame([(args.id, args.content)],
                                   "doc_id STRING, text STRING")
        ingest_documents(catalog, coll, df,
                         content_type=args.content_type)
        print(f"Embedded and stored {args.id} (dim {EMBEDDING_DIM})", file=out)
    elif cmd == "import":
        ensure()
        import glob as _glob
        import os as _os
        if _os.path.isfile(args.path) and args.path.endswith(".gob"):
            # a reference gob index snapshot (flat or HNSW)
            from .sources.gobcodec import read_gob_index_vectors
            src = read_gob_index_vectors(spark, args.path)
        elif (_os.path.isdir(args.path)
                and _glob.glob(_os.path.join(args.path, "*.vec"))):
            # a reference file-store directory (one <id>.vec per vector)
            from .sources.veccodec import read_vec_dir
            src = read_vec_dir(spark, args.path)
        else:
            try:
                src = spark.read.parquet(args.path)
            except Exception:
                src = spark.read.json(args.path)
        docs_src = None
        if "doc_id" in src.columns and "vector" in src.columns:
            # a docs-sidecar export (`export --docs`): restore BOTH the
            # sidecar and the vector rows so the round-trip is lossless.
            # JSON drops all-null columns entirely and reads a map
            # column back as a struct — normalize both shapes
            if "metadata" not in src.columns:
                src = src.withColumn("metadata",
                                     F.lit(None).cast("map<string,string>"))
            elif dict(src.dtypes)["metadata"].startswith("struct"):
                fields = src.schema["metadata"].dataType.fieldNames()
                src = src.withColumn("metadata", F.map_filter(
                    F.map_from_arrays(
                        F.array(*[F.lit(f) for f in fields]),
                        F.array(*[F.col(f"metadata.{f}").cast("string")
                                  for f in fields])),
                    lambda k, v: v.isNotNull())) if fields else \
                    src.withColumn(
                        "metadata",
                        F.lit(None).cast("map<string,string>"))
            docs_src = src
            src = src.select(F.col("doc_id").alias("id"),
                             F.col("vector").cast("array<float>")
                              .alias("embedding"),
                             F.col("metadata"))
        # insert FIRST: its duplicate-id check raises before anything is
        # committed, so a failed import leaves both stores untouched
        # (upserting the sidecar first left them inconsistent on error)
        n = catalog.insert_df(coll, src)  # distributed append, no collect
        if docs_src is not None:
            catalog.upsert_docs(coll, docs_src)
        print(f"Imported {n} vector(s)", file=out)
    elif cmd == "export":
        ensure()
        if args.format == "vec":
            # reference-readable binary file store (<id>.vec per row)
            from .sources.veccodec import write_vec_dir
            n = write_vec_dir(catalog.read(coll), args.path)
            print(f"Exported {n} vector(s) to {args.path}", file=out)
        elif args.format == "gob":
            # reference-loadable flat-index snapshot (flat.go Load)
            from .sources.gobcodec import write_gob_flat_index
            n = write_gob_flat_index(catalog.read(coll), args.path,
                                     metric=args.metric)
            print(f"Exported {n} vector(s) to {args.path}", file=out)
        elif args.docs and args.format == "json":
            n = catalog.export_docs_json(coll, args.path)
            print(f"Exported {n} document(s) to {args.path}", file=out)
        else:
            src = catalog.read_docs(coll) if args.docs else catalog.read(coll)
            writer = src.write.mode("overwrite")
            (writer.json(args.path) if args.format == "json"
             else writer.parquet(args.path))
            print(f"Exported to {args.path}", file=out)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
