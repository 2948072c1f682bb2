"""Property-style invariants for the training-pipeline operators
added in r4: span dedup conservation laws, mixture budget bounds,
Bloom-tier exactness — random corpora, Spark answers checked against
independently computed ground truth."""

from __future__ import annotations

import random

import pytest

from toy_vector_db_spark.operators.decontam import (
    contamination_report, contamination_report_bloom,
)
from toy_vector_db_spark.operators.sampling import token_budget_sample
from toy_vector_db_spark.operators.spandedup import span_dedup

WORDS = ["alpha", "beta", "gamma", "delta", "epsilon", "zeta"]


def _random_docs(seed, n_docs=24, max_tokens=12):
    rng = random.Random(seed)
    return [(i, " ".join(rng.choice(WORDS)
                         for _ in range(rng.randrange(0, max_tokens))))
            for i in range(n_docs)]


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_span_dedup_conservation(spark, seed):
    """Conservation laws on random corpora: counts add up, every
    surviving span instance is the corpus-wide first occurrence, and
    the number of kept non-empty spans equals the number of DISTINCT
    non-empty spans."""
    docs = spark.createDataFrame(_random_docs(seed), ["doc_id", "text"])
    out = span_dedup(docs, span_tokens=2).collect()
    assert all(0 <= r["n_removed"] <= r["n_spans"] for r in out)

    # independent ground truth
    from toy_vector_db_spark.operators.spandedup import doc_spans
    spans = sorted(((r["doc_id"], r["pos"], r["span"])
                    for r in doc_spans(docs, span_tokens=2).collect()))
    nonempty = [s for s in spans if s[2] != ""]
    distinct = {s[2] for s in nonempty}
    kept_nonempty = sum(
        (r["n_spans"] - r["n_removed"]) for r in out) - \
        sum(1 for s in spans if s[2] == "")
    assert kept_nonempty == len(distinct)

    # reassembled text of an untouched doc round-trips its tokens
    for r in out:
        if r["n_removed"] == 0 and r["clean_text"]:
            doc_text = dict((d, t) for d, t in _random_docs(seed))[r["doc_id"]]
            assert r["clean_text"].split() == doc_text.lower().split()


@pytest.mark.parametrize("seed", [3, 4])
def test_mixture_budget_bounds(spark, seed):
    """When a source holds at least `budget` tokens, the sample's
    total lands in [budget, budget + max_doc_tokens); when it holds
    fewer, everything is taken."""
    rows = [(i, " ".join(f"w{i}_{j}" for j in range(1 + i % 5)),
             f"s{i % 2}") for i in range(20)]
    docs = spark.createDataFrame(rows, ["doc_id", "text", "source"])
    totals = {}
    for d, t, s in rows:
        totals[s] = totals.get(s, 0) + len(t.split())
    budget = 9
    out = token_budget_sample(docs, {"s0": budget, "s1": 10_000}).collect()
    by_src = {}
    for r in out:
        by_src.setdefault(r["source"], 0)
        by_src[r["source"]] += r["n_tok"]
    assert budget <= by_src["s0"] < budget + 5   # max doc = 5 tokens
    assert by_src["s1"] == totals["s1"]          # budget exceeds supply


@pytest.mark.parametrize("m_bits,k", [(64, 2), (256, 3), (1 << 12, 4)])
def test_bloom_exactness_across_filter_sizes(spark, m_bits, k):
    """The Bloom tier equals the exact tier for ANY filter geometry —
    saturation included (64 bits is effectively all-ones here)."""
    train = spark.createDataFrame(_random_docs(7, n_docs=12, max_tokens=10),
                                  ["doc_id", "text"])
    ev = spark.createDataFrame(_random_docs(8, n_docs=6, max_tokens=10),
                               ["doc_id", "text"])
    exact = sorted(map(tuple,
                       contamination_report(train, ev, n=2).collect()))
    bloom = sorted(map(tuple,
                       contamination_report_bloom(train, ev, n=2,
                                                  m_bits=m_bits,
                                                  k=k).collect()))
    assert bloom == exact
