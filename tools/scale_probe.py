"""Targeted multi-scale probe: run a NAMED subset of workload queries
at one sf dir and print a JSON timing line — the per-scale leg of the
10x/100x design sweeps (BASELINE.md), where the full bench would take
too long at the 100x derived point.

Usage:  python tools/scale_probe.py SF_DIR query [query ...]
        python tools/scale_probe.py /tmp/sf10_derived ann_ivf_topk ...

Protocol matches bench.py: noop sink (executor materialization, no
driver collect), best-of-2, warm-up count first.
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    sf_dir = sys.argv[1]
    names = sys.argv[2:]
    import __spark_entry__ as entrymod
    from toy_vector_db_spark.session import get_spark

    spark = get_spark("scale_probe")
    spark.sparkContext.setLogLevel("ERROR")
    qs = entrymod.queries()
    unknown = [n for n in names if n not in qs]
    if unknown:
        raise SystemExit(f"unknown queries: {unknown}")
    spark.read.parquet(os.path.join(sf_dir, "lineitem.parquet")).count()
    spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet")).count()
    timings: dict[str, float] = {}
    for name in names:
        best = None
        for _ in range(2):
            t0 = time.time()
            try:
                qs[name](spark, sf_dir).write.format("noop") \
                    .mode("overwrite").save()
                took = round(time.time() - t0, 3)
                best = took if best is None else min(best, took)
            except Exception as e:
                print(f"probe error in {name}: {e}", file=sys.stderr)
                best = -1.0
                break
        timings[name] = best
        print(f"probe {name}: {best}s", file=sys.stderr, flush=True)
    print(json.dumps({"sf_dir": sf_dir, "queries": timings},
                     separators=(",", ":")))


if __name__ == "__main__":
    main()
