"""Property-style invariants for the sixth-wave operators: funnel
conservation laws, drift symmetry/bounds, DSIR weight identities,
chunk-overlap coverage — random corpora, Spark answers checked
against independently computed ground truth."""

from __future__ import annotations

import math
import random

import pytest
from pyspark.sql import functions as F

WORDS = ["alpha", "beta", "gamma", "delta", "epsilon", "zeta"]


def _random_docs(seed, n_docs=24, max_tokens=12):
    rng = random.Random(seed)
    return [(i, " ".join(rng.choice(WORDS)
                         for _ in range(rng.randrange(0, max_tokens))),
             rng.choice(["en", "de"]))
            for i in range(n_docs)]


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_funnel_conservation(spark, seed):
    """n_evaluated[k+1] == n_surviving[k]; drops + survivors ==
    evaluated at every rule; final survivors == apply_funnel count."""
    from toy_vector_db_spark.operators.funnel import (
        apply_funnel, funnel_report,
    )
    docs = spark.createDataFrame(_random_docs(seed),
                                 ["doc_id", "text", "lang"])
    rules = [
        ("nonempty", F.length(F.trim("text")) > 0),
        ("min_tok", F.size(F.split(F.col("text"), " ")) >= 4),
        ("en", F.col("lang") == "en"),
    ]
    rows = sorted(funnel_report(docs, rules).collect(),
                  key=lambda r: r["rule_idx"])
    assert rows[0]["n_evaluated"] == docs.count()
    for r in rows:
        assert r["n_dropped"] + r["n_surviving"] == r["n_evaluated"]
    for a, b in zip(rows, rows[1:]):
        assert b["n_evaluated"] == a["n_surviving"]
    assert rows[-1]["n_surviving"] == apply_funnel(docs, rules).count()


@pytest.mark.parametrize("seed", [0, 1])
def test_drift_symmetry_and_bound(spark, seed):
    """JS is symmetric, non-negative, bounded by ln 2; per-term
    contributions are non-negative and sum to the total."""
    from toy_vector_db_spark.operators.drift import (
        divergence_summary, term_divergence,
    )
    rng = random.Random(seed)
    a = spark.createDataFrame(_random_docs(seed), ["doc_id", "text", "l"])
    b = spark.createDataFrame(_random_docs(seed + 100),
                              ["doc_id", "text", "l"])
    ab = divergence_summary(a, b).collect()[0]["js_divergence"]
    ba = divergence_summary(b, a).collect()[0]["js_divergence"]
    assert ab == pytest.approx(ba, rel=1e-9)
    assert 0 <= ab <= math.log(2) + 1e-12
    contribs = [r["js_contrib"] for r in term_divergence(a, b).collect()]
    assert all(c >= -1e-15 for c in contribs)
    assert sum(contribs) == pytest.approx(ab, rel=1e-9)


@pytest.mark.parametrize("seed", [0, 1])
def test_dsir_weight_identity(spark, seed):
    """With target == whole pool, p_target == p_raw for every bucket,
    so every weight is exactly 0."""
    from toy_vector_db_spark.operators.dsir import importance_weights
    docs = spark.createDataFrame(_random_docs(seed),
                                 ["doc_id", "text", "lang"])
    w = importance_weights(docs, F.lit(True), buckets=64).collect()
    assert len(w) > 0
    assert all(abs(r["weight"]) < 1e-9 for r in w)


@pytest.mark.parametrize("seed", [0, 1])
def test_chunk_overlap_reassembles_text(spark, seed):
    """Concatenating each doc's chunks at stride offsets reproduces
    the exact token sequence (no token lost or duplicated beyond the
    declared overlap)."""
    from toy_vector_db_spark.operators.packing import chunk_with_overlap
    docs = spark.createDataFrame(
        [(i, t) for i, t, _ in _random_docs(seed)], ["doc_id", "text"])
    chunk, stride = 5, 3
    rows = chunk_with_overlap(docs, chunk, stride).collect()
    rebuilt = {}
    for r in sorted(rows, key=lambda r: (r["doc_id"], r["chunk_id"])):
        toks = r["chunk_text"].split(" ")
        assert r["n_tok"] == len(toks) <= chunk
        cur = rebuilt.setdefault(r["doc_id"], [])
        # tokens before start_tok must already be present; splice
        assert len(cur) >= r["start_tok"]
        rebuilt[r["doc_id"]] = cur[:r["start_tok"]] + toks
    for i, text, _ in _random_docs(seed):
        want = [t for t in text.split(" ") if t]
        if want:
            assert rebuilt[i] == want, i
        else:
            assert i not in rebuilt


@pytest.mark.parametrize("seed", [0, 1])
def test_journey_monotone_and_subset(spark, seed):
    """Funnel times strictly increase along steps; adding a
    conversion window can only shrink per-user progression."""
    import datetime as dt

    from toy_vector_db_spark.operators.journey import event_funnel
    rng = random.Random(seed)
    types = ["view", "click", "purchase"]
    rows = [(rng.randrange(6),
             rng.choice(types),
             dt.datetime(2026, 1, 1, 0, 0)
             + dt.timedelta(seconds=rng.randrange(120)))
            for _ in range(80)]
    ev = spark.createDataFrame(rows,
                               "user_id long, event_type string, "
                               "ts timestamp")
    full = {r["user_id"]: r for r in event_funnel(ev, types).collect()}
    for r in full.values():
        ts = [r["t1"], r["t2"], r["t3"]]
        seen = [t for t in ts if t is not None]
        assert seen == sorted(seen) and len(set(seen)) == len(seen)
        # nulls only at the tail
        assert ts == seen + [None] * (3 - len(seen))
    windowed = {r["user_id"]: r
                for r in event_funnel(ev, types, within=30).collect()}
    for u, r in windowed.items():
        assert r["steps_completed"] <= full[u]["steps_completed"]
