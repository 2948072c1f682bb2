"""Workload registry: named queries + matching DuckDB oracle SQL.

Each entry maps an operator from SURVEY.md §2 (or a scale extension) to
  spark_fn(spark, sf_dir) -> DataFrame      (the engine under test)
  oracle sql (ANSI, DuckDB-runnable)        (ground truth), or None for
                                            non-SQL-expressible ops.

Parity rules (driver hashes values order-insensitively, so):
- every computed column is aliased IDENTICALLY on both sides;
- computed floats are rounded (4 decimals for distances, 2 for big sums)
  AFTER the top-k/aggregate, so float64 accumulation-order noise between
  engines is absorbed;
- computed integers are cast to BIGINT on both sides;
- LIMIT appears only under a deterministic total order.
"""

from __future__ import annotations

import os
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window
from pyspark.sql import functions as F

from .functions.distance import METRICS, distance
from .operators.knn import knn, lookup_vector

QUERY_VEC_ID = 0  # stored row used as the knn query (self excluded, K9)
KNN_K = 10        # reference default LIMIT (executor.go:306-309)

WorkloadFn = Callable[[SparkSession, str], DataFrame]
_REGISTRY: dict[str, tuple[WorkloadFn, str | None]] = {}


def q(name: str, oracle: str | None):
    def deco(fn: WorkloadFn):
        _REGISTRY[name] = (fn, oracle)
        return fn
    return deco


def spark_queries() -> dict[str, WorkloadFn]:
    return {name: fn for name, (fn, _) in _REGISTRY.items()}


def oracle_queries() -> dict[str, str]:
    return {name: sql for name, (_, sql) in _REGISTRY.items() if sql is not None}


# Testdata timestamps are parquet TIMESTAMP(NANOS), which Spark 4
# rejects by default; read them as long nanos and convert (truncating to
# micros exactly like DuckDB's nanos->micros read path).
_TS_COLS = {"events": ("ts",), "orders": ("o_orderdate",), "lineitem": ("l_shipdate",)}


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    dtypes = dict(df.dtypes)
    for c in _TS_COLS.get(name, ()):
        if dtypes.get(c) == "bigint":
            df = df.withColumn(c, F.expr(f"timestamp_micros({c} div 1000)"))
    return df


# ---------------------------------------------------------------------------
# k-NN: flat (exact brute-force) search under all 4 metrics
# (SURVEY §2.8 K1/K9; reference flat.go:100-144, executor.go:251-388)
#
# Query vector = stored embedding of vec_id=0 (query-by-id path,
# main.go:366-374); self-match excluded (executor.go:363-366).
# ---------------------------------------------------------------------------

_ORACLE_DIST = {
    # DuckDB expressions over a (corpus) and q (query), DOUBLE[] both.
    "euclidean": "list_distance(a, q)",
    "cosine": ("CASE WHEN sqrt(list_inner_product(a, a)) = 0"
               "       OR sqrt(list_inner_product(q, q)) = 0 THEN 1.0 "
               "ELSE 1.0 - LEAST(GREATEST(list_inner_product(a, q) /"
               " (sqrt(list_inner_product(a, a)) * sqrt(list_inner_product(q, q))),"
               " -1.0), 1.0) END"),
    "dotproduct": "-list_inner_product(a, q)",
    "manhattan": "list_sum(list_transform(list_zip(a, q), p -> abs(p[1] - p[2])))",
}


def _knn_oracle(metric: str) -> str:
    d = _ORACLE_DIST[metric]
    return f"""
WITH qv AS (
  SELECT CAST(embedding AS DOUBLE[]) AS q FROM embeddings WHERE vec_id = {QUERY_VEC_ID}
), scored AS (
  SELECT vec_id, label, {d} AS dist
  FROM (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS a FROM embeddings), qv
  WHERE vec_id <> {QUERY_VEC_ID}
)
SELECT vec_id, label, ROUND(dist, 4) AS distance
FROM scored ORDER BY dist ASC, vec_id ASC LIMIT {KNN_K}
"""


def _make_knn(metric: str) -> WorkloadFn:
    def fn(spark: SparkSession, sf_dir: str) -> DataFrame:
        emb = _t(spark, sf_dir, "embeddings")
        qvec = lookup_vector(emb, "vec_id", QUERY_VEC_ID)
        res = knn(emb, qvec, k=KNN_K, metric=metric,
                  exclude_id=QUERY_VEC_ID, id_col="vec_id")
        # deterministic tiebreak on vec_id matches the oracle's ORDER BY
        res = (emb.withColumn("distance", distance(metric, F.col("embedding"),
                                                   F.lit(qvec).cast("array<double>")))
               .filter(F.col("vec_id") != QUERY_VEC_ID)
               .orderBy(F.col("distance").asc(), F.col("vec_id").asc())
               .limit(KNN_K))
        return res.select("vec_id", "label",
                          F.round("distance", 4).alias("distance"))
    return fn


for _m in METRICS:
    q(f"knn_{_m}", _knn_oracle(_m))(_make_knn(_m))


# ---------------------------------------------------------------------------
# Scan / projection / limit (SURVEY §2.1 S2, §2.2 P1, §2.5 W2)
# `dimension` is computed, not stored (SURVEY §1.1).
# ---------------------------------------------------------------------------

@q("scan_project_limit", f"""
SELECT vec_id, CAST(len(embedding) AS BIGINT) AS dimension, label
FROM embeddings ORDER BY vec_id LIMIT 5
""")
def scan_project_limit(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (_t(spark, sf_dir, "embeddings")
            .select("vec_id",
                    F.size("embedding").cast("bigint").alias("dimension"),
                    "label")
            .orderBy("vec_id").limit(5))


# Point lookup: WHERE id = literal (P5/P10 — pushed to the parquet scan).
@q("filter_id_eq", """
SELECT vec_id, label FROM embeddings WHERE vec_id = 42
""")
def filter_id_eq(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (_t(spark, sf_dir, "embeddings")
            .filter(F.col("vec_id") == 42).select("vec_id", "label"))


# LIKE with %/_ semantics on a string column (P8, executor.go:721-759).
@q("filter_like", """
SELECT doc_id FROM documents
WHERE text LIKE '%model%' OR CAST(doc_id AS VARCHAR) LIKE '1%'
""")
def filter_like(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _t(spark, sf_dir, "documents")
    return d.filter(F.col("text").like("%model%")
                    | F.col("doc_id").cast("string").like("1%")) \
            .select("doc_id")


# Metadata map access: '=' on a possibly-missing key => missing ⇒ FALSE
# (P6, executor.go:698-700). The map is derived deterministically from
# documents: key 'lang' exists only for non-web sources.
@q("filter_meta_eq", """
SELECT doc_id FROM documents
WHERE (CASE WHEN source <> 'web' THEN lang END) = 'en'
""")
def filter_meta_eq(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _t(spark, sf_dir, "documents")
    meta = F.when(F.col("source") != "web",
                  F.create_map(F.lit("lang"), F.col("lang"))) \
            .otherwise(F.create_map())
    return (d.withColumn("metadata", meta)
             .filter(F.col("metadata")["lang"] == "en")
             .select("doc_id"))


# '!=' on a possibly-missing key => missing ⇒ TRUE (P7, executor.go:716-718):
# needs the coalesce wrapper, Spark's null != v would drop those rows.
@q("filter_meta_ne", """
SELECT doc_id FROM documents
WHERE COALESCE((CASE WHEN source <> 'web' THEN lang END) <> 'en', TRUE)
""")
def filter_meta_ne(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _t(spark, sf_dir, "documents")
    meta = F.when(F.col("source") != "web",
                  F.create_map(F.lit("lang"), F.col("lang"))) \
            .otherwise(F.create_map())
    return (d.withColumn("metadata", meta)
             .filter(F.coalesce(F.col("metadata")["lang"] != "en", F.lit(True)))
             .select("doc_id"))


# COUNT(*) — the reference's only aggregate (A1, executor.go:158-165).
@q("count_star", """
SELECT CAST(count(*) AS BIGINT) AS cnt FROM lineitem
""")
def count_star(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _t(spark, sf_dir, "lineitem").agg(F.count("*").alias("cnt"))


# ---------------------------------------------------------------------------
# Relational surface beyond the reference (free via Catalyst; SURVEY
# §2.4/§2.5 note GROUP BY / ORDER BY / joins are reserved-but-unparsed
# in the reference — we implement them fully).
# ---------------------------------------------------------------------------

@q("agg_pricing_summary", """
SELECT l_returnflag, l_linestatus,
       ROUND(SUM(l_quantity), 2)                                    AS sum_qty,
       ROUND(SUM(l_extendedprice), 2)                               AS sum_base_price,
       ROUND(SUM(l_extendedprice * (1 - l_discount)), 2)            AS sum_disc_price,
       ROUND(AVG(l_quantity), 4)                                    AS avg_qty,
       CAST(COUNT(*) AS BIGINT)                                     AS count_order
FROM lineitem
GROUP BY l_returnflag, l_linestatus
""")
def agg_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    return (li.groupBy("l_returnflag", "l_linestatus")
            .agg(F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
                 F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
                 F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2)
                  .alias("sum_disc_price"),
                 F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
                 F.count("*").alias("count_order")))


@q("join_region_revenue", """
SELECT r.r_name AS region, ROUND(SUM(o.o_totalprice), 2) AS revenue,
       CAST(COUNT(*) AS BIGINT) AS n_orders
FROM orders o
JOIN customer c ON o.o_custkey = c.c_custkey
JOIN nation n   ON c.c_nationkey = n.n_nationkey
JOIN region r   ON n.n_regionkey = r.r_regionkey
GROUP BY r.r_name
""")
def join_region_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region")
    # nation/region are tiny dims: force broadcast so only the
    # orders⋈customer join shuffles (and AQE may broadcast customer too).
    return (o.join(c, o.o_custkey == c.c_custkey)
             .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
             .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
             .groupBy(F.col("r_name").alias("region"))
             .agg(F.round(F.sum("o_totalprice"), 2).alias("revenue"),
                  F.count("*").alias("n_orders")))


@q("window_topn_orders", """
SELECT o_orderpriority, o_orderkey, ROUND(o_totalprice, 2) AS total
FROM orders
QUALIFY row_number() OVER (PARTITION BY o_orderpriority
                           ORDER BY o_totalprice DESC, o_orderkey ASC) <= 3
""")
def window_topn_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_orderpriority") \
              .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey").asc())
    return (o.withColumn("__rn", F.row_number().over(w))
             .filter(F.col("__rn") <= 3)
             .select("o_orderpriority", "o_orderkey",
                     F.round("o_totalprice", 2).alias("total")))


# ---------------------------------------------------------------------------
# SQL dialect end-to-end (SURVEY §3.1): the statement goes through the
# NEAREST TO rewriter / metadata-sugar rewriter in plans/dialect.py, so
# these exercise tokenize->rewrite->spark.sql->Catalyst against the
# same DuckDB oracle as the DataFrame-level knn.
# ---------------------------------------------------------------------------

@q("sql_nearest_by_id", f"""
WITH qv AS (
  SELECT CAST(embedding AS DOUBLE[]) AS q FROM embeddings WHERE vec_id = {QUERY_VEC_ID}
), scored AS (
  SELECT CAST(vec_id AS VARCHAR) AS id, list_distance(CAST(embedding AS DOUBLE[]), q) AS dist
  FROM embeddings, qv
  WHERE vec_id <> {QUERY_VEC_ID}
)
SELECT id, ROUND(dist, 4) AS distance
FROM scored ORDER BY dist ASC, CAST(id AS BIGINT) ASC LIMIT {KNN_K}
""")
def sql_nearest_by_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .plans.dialect import SqlEngine
    _t(spark, sf_dir, "embeddings").select(
        F.col("vec_id").cast("string").alias("id"), "embedding"
    ).createOrReplaceTempView("vectors_dialect_knn")
    eng = SqlEngine(spark)
    df = eng.sql(
        f"SELECT id, distance FROM vectors_dialect_knn "
        f"NEAREST TO '{QUERY_VEC_ID}' USING euclidean LIMIT {KNN_K}")
    return df.select("id", F.round("distance", 4).alias("distance"))


@q("sql_meta_ne_dialect", """
SELECT CAST(doc_id AS VARCHAR) AS id FROM documents
WHERE COALESCE((CASE WHEN source <> 'web' THEN lang END) <> 'en', TRUE)
""")
def sql_meta_ne_dialect(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .plans.dialect import SqlEngine
    d = _t(spark, sf_dir, "documents")
    meta = F.when(F.col("source") != "web",
                  F.create_map(F.lit("lang"), F.col("lang"))) \
            .otherwise(F.create_map())
    d.select(F.col("doc_id").cast("string").alias("id"),
             F.array(F.col("n_chars").cast("float")).alias("embedding"),
             meta.alias("metadata")) \
        .createOrReplaceTempView("vectors_dialect_meta")
    eng = SqlEngine(spark)
    return eng.sql(
        "SELECT id FROM vectors_dialect_meta WHERE metadata.lang != 'en'")


# Hourly rollup over the events table (batch equivalent of the
# streaming windowed aggregation in streaming/events.py). Buckets are
# epoch-aligned on the instant, so tz-independent; emitted as BIGINT
# epoch seconds to dodge session-timezone display differences.
@q("events_hourly_rollup", """
SELECT CAST(epoch(time_bucket(INTERVAL '1 hour', ts)) AS BIGINT) AS bucket_epoch,
       event_type,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       ROUND(SUM(value), 2) AS sum_value
FROM events
GROUP BY 1, 2
""")
def events_hourly_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _t(spark, sf_dir, "events")
    bucket = F.window("ts", "1 hour").getField("start")
    return (e.groupBy(F.unix_timestamp(bucket).alias("bucket_epoch"), "event_type")
             .agg(F.count("*").alias("n_events"),
                  F.round(F.sum("value"), 2).alias("sum_value")))
