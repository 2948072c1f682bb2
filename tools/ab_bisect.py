"""Interleaved A/B bisect — the load-vs-code attribution tool,
mechanized (r10, VERDICT r9 Next #5).

The failure mode this answers: a bench row regresses between rounds on
a MULTI-TENANT host, and neither the evidence-based load flag nor a
rerun can say whether the cause is the code delta or a sustained
co-tenant burst (r8 sessionize, r9 dedup_components — both turned out
to be load). The proven procedure, now one command: check out both
refs side by side (git worktrees), import each tree's package in
isolation, and time the SAME work in ONE Spark session, alternating
A/B in BOTH orders (ABBA per round) so slow ambient windows hit both
trees symmetrically; inputs are warmed once so the page cache is
shared. If the tree means differ well beyond the within-tree spread,
it's code; if both trees wobble together, it's load.

Usage:
    python tools/ab_bisect.py QUERY_NAME REF_A REF_B \
        [--rounds 3] [--sf /root/testdata/sf0.1]
    python tools/ab_bisect.py --probe components REF_A REF_B \
        [--edges 700000] [--rounds 3]

REF is any git ref (commit, tag, branch) or '.' for the CURRENT
working tree (uncommitted state included). The probe mode rebuilds
the r9 dedup_components bisect: a cached chain-heavy edge graph fed
to each tree's connected_components.
"""
from __future__ import annotations

import argparse
import importlib
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

_PKGS = ("toy_vector_db_spark", "__spark_entry__")


def _purge_modules() -> None:
    for k in list(sys.modules):
        if k.split(".")[0] in _PKGS:
            del sys.modules[k]


def load_tree(path: str) -> dict:
    """Import a tree's package in isolation: purge the package from
    sys.modules, import from ``path``, purge again. The returned
    module OBJECTS stay alive (their functions hold the references),
    so two trees' implementations coexist in one process."""
    _purge_modules()
    sys.path.insert(0, path)
    try:
        return {
            "workload": importlib.import_module(
                "toy_vector_db_spark.workload"),
            "components": importlib.import_module(
                "toy_vector_db_spark.operators.components"),
        }
    finally:
        sys.path.pop(0)
        _purge_modules()


def add_worktree(ref: str, slot: str) -> str:
    if ref == ".":
        return REPO
    path = f"/tmp/ab_bisect_{slot}"
    subprocess.run(["git", "-C", REPO, "worktree", "remove", "--force",
                    path], capture_output=True)
    subprocess.run(["git", "-C", REPO, "worktree", "add", "--detach",
                    path, ref], check=True, capture_output=True)
    return path


def drop_worktree(ref: str, slot: str) -> None:
    if ref == ".":
        return
    subprocess.run(["git", "-C", REPO, "worktree", "remove", "--force",
                    f"/tmp/ab_bisect_{slot}"], capture_output=True)


def _time_noop(df) -> float:
    t0 = time.time()
    df.write.format("noop").mode("overwrite").save()
    return round(time.time() - t0, 3)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("target", help="workload query name, or ignored "
                                   "with --probe")
    ap.add_argument("ref_a")
    ap.add_argument("ref_b")
    ap.add_argument("--probe", choices=["components"], default=None)
    ap.add_argument("--rounds", type=int, default=3,
                    help="ABBA rounds (each tree timed 2x per round)")
    ap.add_argument("--edges", type=int, default=700_000)
    ap.add_argument("--sf", default=os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    args = ap.parse_args()

    from toy_vector_db_spark.session import get_spark
    spark = get_spark("ab-bisect")
    spark.sparkContext.setLogLevel("ERROR")

    paths = {"A": add_worktree(args.ref_a, "A"),
             "B": add_worktree(args.ref_b, "B")}
    try:
        trees = {s: load_tree(p) for s, p in paths.items()}

        if args.probe == "components":
            # the r9 bisect input: a chain-heavy graph, built ONCE and
            # cached so both trees see identical warmed input
            from pyspark.sql import functions as F
            n = args.edges
            edges = (spark.range(n)
                     .select(F.col("id").alias("src"),
                             F.when(F.col("id") % 1000 < 999,
                                    F.col("id") + 1)
                             .otherwise(F.col("id") - 998).alias("dst"))
                     .localCheckpoint())
            edges.count()

            def make_run(slot: str):
                cc = trees[slot]["components"].connected_components
                return lambda: _time_noop(
                    cc(edges, a_col="src", b_col="dst"))
        else:
            name = args.target

            def make_run(slot: str):
                fn = trees[slot]["workload"].spark_queries()[name]
                return lambda: _time_noop(fn(spark, args.sf))

        runs = {s: make_run(s) for s in ("A", "B")}
        for s in ("A", "B"):          # shared warm-up, page cache + codegen
            runs[s]()

        times: dict[str, list[float]] = {"A": [], "B": []}
        loads: list[float] = []
        for r in range(args.rounds):
            for s in ("A", "B", "B", "A"):     # both orders every round
                loads.append(os.getloadavg()[0])
                t = runs[s]()
                times[s].append(t)
                print(f"round {r} tree {s}: {t:.3f}s "
                      f"(load1 {loads[-1]:.1f})", file=sys.stderr)

        print(f"\n{'tree':<6}{'ref':<14}{'n':>3}{'mean':>9}{'min':>9}"
              f"{'max':>9}")
        for s, ref in (("A", args.ref_a), ("B", args.ref_b)):
            ts = times[s]
            print(f"{s:<6}{ref[:13]:<14}{len(ts):>3}"
                  f"{sum(ts)/len(ts):>9.3f}{min(ts):>9.3f}"
                  f"{max(ts):>9.3f}")
        spread_a = max(times["A"]) / max(min(times["A"]), 1e-9)
        mean_a = sum(times["A"]) / len(times["A"])
        mean_b = sum(times["B"]) / len(times["B"])
        ratio = mean_a / mean_b if mean_b else float("inf")
        verdict = ("CODE: tree means differ beyond within-tree spread"
                   if (max(ratio, 1 / ratio) > 1.3
                       and max(ratio, 1 / ratio) > spread_a)
                   else "LOAD/NOISE: trees wobble together")
        print(f"mean A/B = {ratio:.2f}x, within-A spread "
              f"{spread_a:.2f}x, load1 {min(loads):.1f}-{max(loads):.1f}"
              f" -> {verdict}")
        return 0
    finally:
        spark.stop()
        drop_worktree(args.ref_a, "A")
        drop_worktree(args.ref_b, "B")


if __name__ == "__main__":
    sys.exit(main())
