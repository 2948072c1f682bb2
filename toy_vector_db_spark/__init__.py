"""toy_vector_db_spark — a PySpark-native analytics engine with the query
and data-processing capabilities of kennethmuyoyo/toy_vector_db ("VectoDB").

The reference (at /root/reference, Go) is a single-process toy vector
database: named float32 vectors + string metadata, k-NN under 4 distance
metrics, a small SQL dialect (``SELECT ... FROM vectors NEAREST TO [v]
USING metric LIMIT k``), and a deterministic mock embedding pipeline.

This package re-expresses those capabilities Spark-first:

- data model  -> DataFrames over Parquet (schema.py, sources/)
- distances   -> Catalyst Column expressions, no UDFs (functions/distance.py)
- k-NN        -> orderBy/limit (TakeOrderedAndProject) + scalable
                 two-phase top-k join (operators/knn.py)
- ANN tier    -> LSH bucket tables, the Spark-idiomatic HNSW analogue
                 (operators/ann.py)
- SQL dialect -> thin NEAREST TO rewriter, everything else spark.sql
                 (plans/dialect.py)
- embedding   -> deterministic sha256-seeded pandas UDF (functions/embedding.py)
- scale extensions: dedup (exact/minhash/simhash/jaccard), text analytics,
  streaming over events (operators/dedup.py, functions/text.py, streaming/)
"""

__version__ = "0.1.0"
