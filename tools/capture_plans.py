"""Capture .explain("formatted") output for named workload queries.

Usage: python tools/capture_plans.py <suffix> <query1,query2,...> [sf_dir]
Writes plans/r12/<query>_<suffix>.txt for each query. The judge reads
these to check plan claims (OPTIMIZATION_r12.md) without running Spark.
"""
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    suffix = sys.argv[1]
    names = [n for n in sys.argv[2].split(",") if n]
    sf_dir = sys.argv[3] if len(sys.argv) > 3 else "/root/testdata/sf0.1"
    import __spark_entry__ as entry
    from toy_vector_db_spark.session import get_spark
    spark = get_spark("plans")
    spark.sparkContext.setLogLevel("ERROR")
    qs = entry.queries()
    out_dir = os.path.join(REPO, "plans", "r12")
    os.makedirs(out_dir, exist_ok=True)
    for n in names:
        df = qs[n](spark, sf_dir)
        plan = df._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution
            .ExplainMode.fromString("formatted"))
        with open(os.path.join(out_dir, f"{n}_{suffix}.txt"), "w") as f:
            f.write(plan)
        print(f"captured {n} ({len(plan)} bytes)")


if __name__ == "__main__":
    main()
