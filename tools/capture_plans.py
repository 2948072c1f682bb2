"""Capture .explain("formatted") output for named workload queries.

Usage: python tools/capture_plans.py <suffix> <query1,query2,...> [sf_dir] [round_dir]
Writes plans/<round_dir>/<query>_<suffix>.txt for each query (round_dir
defaults to $SPARK_GRAFT_PLANS_ROUND or "r13" — ADVICE r12: the r12
hardcode silently landed next-round captures in the old directory).
The judge reads these to check plan claims (OPTIMIZATION_rNN.md)
without running Spark.
"""
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    suffix = sys.argv[1]
    names = [n for n in sys.argv[2].split(",") if n]
    sf_dir = sys.argv[3] if len(sys.argv) > 3 else "/root/testdata/sf0.1"
    round_dir = sys.argv[4] if len(sys.argv) > 4 else \
        os.environ.get("SPARK_GRAFT_PLANS_ROUND", "r13")
    import __spark_entry__ as entry
    from toy_vector_db_spark.session import get_spark
    spark = get_spark("plans")
    spark.sparkContext.setLogLevel("ERROR")
    qs = entry.queries()
    out_dir = os.path.join(REPO, "plans", round_dir)
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
