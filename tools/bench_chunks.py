"""Run the full bench suite in chunks of fresh sessions.

Why: one 128-query session accumulates JVM + checkpoint-block +
reused-python-worker pressure. At sf0.1 that inflates late queries
(BASELINE.md wave-2 note: lm_perplexity_buckets 32.8 s in-suite vs
6.3 s fresh); at the 100x derived scale it crashed a reused python
worker outright 48 queries in. Chunked fresh sessions measure the
steady state a real cluster job sees — each chunk still gets the
warm-up + best-of-2 protocol from bench.py itself.

Rows flagged by bench.py's evidence-based load predicate (session
started loaded, or in-row attempt spread under high load — see
bench.row_flagged) are AUTO-RE-MEASURED in a final idle pass. r9:
that pass now LIVES in bench.py (``remeasure_flagged`` — the
single-session protocol the driver records runs it too); this runner
shares it, so both artifacts carry {"loaded", "fresh"} twins and the
merged "queries" line carries the fresh value.

Usage:
    python tools/bench_chunks.py [sf_dir] [chunk_size]

Prints each chunk's per-query line as it lands, then ONE merged
summary pair in bench.py's exact format.
"""

from __future__ import annotations

import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sf10_derived"
    chunk = int(sys.argv[2]) if len(sys.argv) > 2 else 16

    import __spark_entry__ as entrymod
    from bench import (CORE, calib_settled_constant, calibration_probe,
                       per_query_lines, remeasure_flagged, row_flagged,
                       run_subset, settled_start_load,
                       sustained_load_stamp)

    names = list(entrymod.queries())
    # ONE pre-suite load measurement (settled, in case this runner
    # itself starts right after other work) shared by every child:
    # chunk N's own session start is polluted by chunk N-1's exit
    # bleed and must not feed the start-load flag leg (bench.py
    # chunk-bleed guard)
    suite_start = settled_start_load()
    print(f"suite start load1: {suite_start:.1f}", file=sys.stderr)
    # settled matmul constant measured once here (idle, pre-Spark) and
    # pinned into every child via env so runner + children share one
    # absolute reference (ADVICE r12: no baked-in per-host constant)
    settled = calib_settled_constant()
    if settled > 0:
        os.environ["SPARK_GRAFT_CALIB_S"] = str(settled)
    merged: dict[str, float] = {}
    merged_load: dict[str, list] = {}
    # sustained-load sentinel, chunk-grained: one absolute calibration
    # probe before each chunk + one at the end (probes run between
    # child sessions, where this runner is otherwise idle) — PLUS each
    # child session's own in-suite stamp (r12 granularity gap: a burst
    # contained entirely inside one chunk evaded the between-chunk
    # probes; the children have probed inside their suites since r12,
    # but the merged artifact never aggregated those stamps)
    calib_probes: list[float] = []
    chunk_stamps: list[dict] = []
    for i in range(0, len(names), chunk):
        calib_probes.append(calibration_probe())
        sub = names[i:i + chunk]
        got, loads, child_sum = run_subset(sub, sf_dir,
                                           suite_start=suite_start)
        merged_load.update(loads)
        chunk_stamps.append(
            {"chunk": i // chunk,
             "sustained": bool(child_sum.get("sustained_load", False)),
             "drift": child_sum.get("calib_drift", [])})
        if not got:
            for n in sub:
                merged[n] = -1.0
            continue
        merged.update(got)
        print(f"chunk {i // chunk} ({len(sub)} queries): "
              f"{round(sum(v for v in got.values() if v >= 0), 1)}s",
              file=sys.stderr)

    calib_probes.append(calibration_probe())
    runner_sustained, drifts = sustained_load_stamp(calib_probes,
                                                    settled=settled)
    # merged stamp = runner-level OR any child-level stamp, so a
    # burst contained inside one chunk stamps the merged artifact
    sustained = runner_sustained or any(c["sustained"]
                                        for c in chunk_stamps)

    remeasured = remeasure_flagged(merged, merged_load, sf_dir, chunk)

    total = round(sum(v for v in merged.values() if v >= 0), 3)
    core = round(sum(v for n, v in merged.items()
                     if n in CORE and v >= 0), 3)
    still_flagged = sorted(n for n, e in merged_load.items()
                           if row_flagged(e))
    max_load = max((e[0] for e in merged_load.values()), default=0.0)
    sf = os.path.basename(sf_dir.rstrip("/"))
    print(json.dumps({"load": merged_load}, separators=(",", ":")))
    if remeasured:
        print(json.dumps({"remeasured": remeasured},
                         separators=(",", ":")))
    # per-chunk provenance: which chunk(s) were polluted, each child's
    # own drift curve (burst forensics at derived scale is per-chunk)
    print(json.dumps({"chunk_calib": chunk_stamps},
                     separators=(",", ":")))
    for line in per_query_lines({n: round(v, 2)
                                 for n, v in merged.items()}):
        print(line)
    print(json.dumps({"metric": "workload_total", "value": total,
                      "core_total": core, "unit": "sec", "sf": sf,
                      "max_load1": max_load, "flagged_load": still_flagged,
                      "sustained_load": sustained,
                      "runner_sustained": runner_sustained,
                      "calib_drift": drifts,
                      "calib_s": round(settled, 5),
                      "protocol": "chunked"},
                     separators=(",", ":")))


if __name__ == "__main__":
    main()
