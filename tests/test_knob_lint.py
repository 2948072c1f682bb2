"""Pinned-blocking-constant lint (r6 verdict item 4).

The r5 bug class — a pinned blocking/partitioning constant is a
latent N^2 (or a latent one-task bottleneck) that only shows up a
decade of scale later — was fixed point-by-point (`ivf_nlist`,
`max_bucket`, `cluster_cap`, `_stream_partitions`,
`BATCH_MAX_QUERIES`, `QUADRATIC_BLOCK_MAX_ROWS`). This test keeps the
next operator from reintroducing it: every work-bounding knob in the
package must either ROUTE through the one sizing-policy module
(``operators/chooser.py``) or carry an explicit ``cap:`` rationale
where it is pinned. Adding a raw pinned knob fails this test with the
offending file:line until its author either wires it to chooser or
writes down why the fixed value is scale-safe.

Scope (deliberately narrow so the signal stays strong):

- module-level ``NAME = <int>`` whose name smells like a bound /
  partition count (MAX/CAP/NLIST/CLUSTERS/PARTITION/BATCH/BUCKET/
  BLOCK/CHUNK/SHARD/ROUNDS/MERGES) — rationale must sit in the
  preceding comment block (``cap:`` or a ``chooser`` reference);
- function parameters with a literal int default whose name is a
  known work-bounding knob (``max_ids``, ``max_candidates``,
  ``max_bucket``, ``max_block_rows``, ``max_batch``, ``max_pairs``,
  ``max_bands_per_interval``, ``max_files_per_trigger``,
  ``n_clusters``, ``n_centroids``, ``nlist``, ``*_cap``,
  ``*_partitions``, ``*_buckets``, ``*_shards``) — rationale
  (``cap:``) or a chooser/ivf_nlist reference must appear in the
  function's own source (docstring included);
- literal partition counts at CALL sites (r7 verdict item 5): a raw
  ``.repartition(64)`` / ``.coalesce(8)`` / ``numPartitions=16``
  inside a function body is the same latent one-task-bottleneck /
  tiny-task-storm shape as a pinned module constant, but the two
  visitors above can't see it — rationale must sit within the call's
  preceding comment block (same 8-line window as module constants);
- driver-round LOOPS (r9 verdict item 8, after learn_bpe's batching):
  a ``for``/``while`` whose BODY materializes a frame (``collect``/
  ``count``/``localCheckpoint``/``checkpoint``/``toPandas``) runs one-
  or-more Spark jobs PER ITERATION — the job-count wall class that
  made learn_bpe unusable at 32k merges. Rationale (``cap:`` or a
  chooser reference) must appear in the enclosing function's source.
  Loops over a literal tuple/list/constant are exempt (bounded by
  construction), as are calls in the loop's ITER expression (one job,
  iterating the result).

NOT in scope: convergence/depth/radius knobs (``max_iter``,
``max_hops``, ``max_hamming``), display widths, algorithm parameters
(``num_perm``, ``bands``, ``bits``, ``k``) — those change answers or
iteration counts, not the work-per-task shape at scale.
"""

from __future__ import annotations

import ast
import pathlib
import re

PKG = pathlib.Path(__file__).resolve().parent.parent / "toy_vector_db_spark"

MOD_CONST = re.compile(
    r"(MAX|_CAP$|^CAP_|NLIST|CLUSTERS|PARTITION|BATCH|BUCKET|BLOCK|CHUNK"
    r"|SHARD|ROUNDS|MERGES)", re.I)

PARAM_EXACT = {
    "max_ids", "max_candidates", "max_bucket", "max_block_rows",
    "max_batch", "max_pairs", "max_bands_per_interval",
    "max_files_per_trigger", "n_clusters", "n_centroids", "nlist",
}
PARAM_SUFFIX = re.compile(r".*_(cap|partitions|buckets|shards)$")

RATIONALE = re.compile(r"cap:|chooser|ivf_nlist", re.I)

#: DataFrame/RDD methods whose first positional arg is a partition
#: count, and call keywords that carry one anywhere in the API
PARTITION_METHODS = {"repartition", "repartitionByRange", "coalesce"}
PARTITION_KWARGS = {"numPartitions", "num_partitions", "parallelism",
                    "numSlices"}

#: unambiguous Spark driver-materializers (``head``/``take``/``first``
#: excluded: pandas shares those names inside Arrow-batch generators)
DRIVER_CALLS = {"collect", "count", "localCheckpoint", "checkpoint",
                "toPandas"}


def _loop_body_driver_calls(node) -> set[str]:
    hits: set[str] = set()
    for stmt in node.body + node.orelse:
        for sub in ast.walk(stmt):
            if (isinstance(sub, ast.Call)
                    and isinstance(sub.func, ast.Attribute)
                    and sub.func.attr in DRIVER_CALLS):
                hits.add(sub.func.attr)
    return hits


def _iter_findings():
    for f in sorted(PKG.rglob("*.py")):
        src = f.read_text()
        lines = src.splitlines()
        tree = ast.parse(src)
        seen_loops: set[int] = set()  # dedupe loops inside nested defs
        for node in tree.body:
            if (isinstance(node, ast.Assign)
                    and isinstance(node.value, ast.Constant)
                    and isinstance(node.value.value, int)
                    and not isinstance(node.value.value, bool)):
                for t in node.targets:
                    if isinstance(t, ast.Name) and MOD_CONST.search(t.id):
                        ctx = "\n".join(
                            lines[max(0, node.lineno - 9):node.lineno])
                        if not RATIONALE.search(ctx):
                            yield (f"{f.relative_to(PKG.parent)}:"
                                   f"{node.lineno} module constant {t.id}="
                                   f"{node.value.value}")
        for node in ast.walk(tree):
            if isinstance(node, ast.Call):
                lits = []
                if (isinstance(node.func, ast.Attribute)
                        and node.func.attr in PARTITION_METHODS
                        and node.args
                        and isinstance(node.args[0], ast.Constant)
                        and isinstance(node.args[0].value, int)
                        and not isinstance(node.args[0].value, bool)):
                    lits.append(f"{node.func.attr}({node.args[0].value})")
                for kw in node.keywords:
                    if (kw.arg in PARTITION_KWARGS
                            and isinstance(kw.value, ast.Constant)
                            and isinstance(kw.value.value, int)
                            and not isinstance(kw.value.value, bool)):
                        lits.append(f"{kw.arg}={kw.value.value}")
                if lits:
                    ctx = "\n".join(
                        lines[max(0, node.lineno - 9):node.lineno])
                    if not RATIONALE.search(ctx):
                        for lit in lits:
                            yield (f"{f.relative_to(PKG.parent)}:"
                                   f"{node.lineno} call-site {lit}")
            if not isinstance(node, (ast.FunctionDef, ast.AsyncFunctionDef)):
                continue
            fn_seg = None
            for sub in ast.walk(node):
                if not isinstance(sub, (ast.For, ast.While)):
                    continue
                if (isinstance(sub, ast.For)
                        and isinstance(sub.iter,
                                       (ast.Tuple, ast.List, ast.Constant))):
                    continue  # literal sequence: bounded by construction
                if sub.lineno in seen_loops:
                    continue
                calls = _loop_body_driver_calls(sub)
                if not calls:
                    continue
                seen_loops.add(sub.lineno)
                if fn_seg is None:
                    fn_seg = ast.get_source_segment(src, node) or ""
                if not RATIONALE.search(fn_seg):
                    yield (f"{f.relative_to(PKG.parent)}:{sub.lineno} "
                           f"driver-round loop in {node.name}() "
                           f"({', '.join(sorted(calls))} per iteration)")
            args = node.args
            pos = args.args[len(args.args) - len(args.defaults):]
            pairs = list(zip(pos, args.defaults)) + \
                list(zip(args.kwonlyargs, args.kw_defaults))
            seg = None
            for p, d in pairs:
                if d is None or not isinstance(d, ast.Constant):
                    continue
                if not isinstance(d.value, int) or isinstance(d.value, bool):
                    continue
                if not (p.arg in PARAM_EXACT or PARAM_SUFFIX.match(p.arg)):
                    continue
                if seg is None:
                    seg = ast.get_source_segment(src, node) or ""
                if not RATIONALE.search(seg):
                    yield (f"{f.relative_to(PKG.parent)}:{node.lineno} "
                           f"{node.name}({p.arg}={d.value})")


def test_every_blocking_knob_routes_through_chooser_or_declares_cap():
    misses = list(_iter_findings())
    assert not misses, (
        "pinned blocking/partitioning knobs without a chooser route or "
        "a 'cap:' rationale (the r5 latent-N^2 bug class):\n  "
        + "\n  ".join(misses)
        + "\nEither size the knob via operators/chooser (ivf_nlist & "
        "friends) or write a 'cap:' comment explaining why the pinned "
        "value is scale-safe.")


def test_lint_catches_a_raw_knob(tmp_path):
    """The lint itself must fire on an unannotated knob — guard the
    guard: a refactor that silently empties the patterns would make
    the audit vacuous."""
    probe = PKG / "_lint_probe_tmp.py"
    probe.write_text(
        "MAX_PROBE_ROWS = 123\n"
        "def f(max_bucket: int = 7):\n    return max_bucket\n"
        "def g(df, sc):\n"
        "    df = df.repartition(64)\n"
        "    sc.parallelize([], numSlices=16)\n"
        "    return df.coalesce(1)\n"
        "def h(df):\n"
        "    # cap: single output file for a bounded report\n"
        "    return df.coalesce(1)\n"
        "def loopy(df, n):\n"
        "    for _ in range(n):\n        df = df.localCheckpoint()\n"
        "    return df\n"
        "def loopy_ok(df, n):\n"
        "    '''cap: n is a convergence bound, jobs stay vocab-sized'''\n"
        "    for _ in range(n):\n        df = df.localCheckpoint()\n"
        "    return df\n"
        "def loopy_lit(df):\n"
        "    out = []\n"
        "    for i in (1, 2, 3):\n        out.append(df.count())\n"
        "    return out\n"
        "def loopy_iter(df):\n"
        "    for r in df.collect():\n        pass\n")
    try:
        misses = [m for m in _iter_findings() if "_lint_probe_tmp" in m]
        # 2 knob findings + 3 call-site findings + 1 driver-round
        # loop; h()'s annotated coalesce, loopy_ok's cap'd loop,
        # loopy_lit's literal-tuple loop, and loopy_iter's
        # iterate-the-result loop must NOT fire
        assert len(misses) == 6, misses
        assert sum("call-site" in m for m in misses) == 3, misses
        assert sum("driver-round loop" in m for m in misses) == 1, misses
    finally:
        probe.unlink()
