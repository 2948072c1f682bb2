from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from toy_vector_db_spark.operators.urlstats import (
    doc_domains, domain_stats, extract_urls, filter_blocklist, url_domain,
)

DOCS = [
    (1, "intro https://a.example.com/x and http://b.org/y?z=1."),
    (2, "see https://A.EXAMPLE.COM/other, twice https://a.example.com/2"),
    (3, "no links here"),
    (4, "bare scheme https:// and https://c.net"),
]


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(DOCS, ["doc_id", "text"])


def test_extract_urls_trims_trailing_punct(spark):
    d = spark.createDataFrame([(1, "x https://a.com/p. y (http://b.io)")],
                              ["doc_id", "text"])
    rows = d.select(extract_urls(F.col("text")).alias("u")).collect()
    assert rows[0]["u"] == ["https://a.com/p", "http://b.io"]


def test_url_domain_lowercases(spark):
    d = spark.createDataFrame([("https://A.Example.COM/path?q=1",),
                               ("not-a-url",)], ["u"])
    got = [r[0] for r in d.select(url_domain(F.col("u"))).collect()]
    assert got == ["a.example.com", ""]


def test_doc_domains_distinct_per_doc(docs):
    rows = {(r["doc_id"], r["domain"]) for r in doc_domains(docs).collect()}
    assert rows == {(1, "a.example.com"), (1, "b.org"),
                    (2, "a.example.com"), (4, "c.net")}


def test_domain_stats_counts(docs):
    stats = {r["domain"]: (r["n_docs"], r["n_urls"])
             for r in domain_stats(docs).collect()}
    assert stats["a.example.com"] == (2, 3)  # doc2 mentions it twice
    assert stats["b.org"] == (1, 1)


def test_filter_blocklist_with_subdomains(docs):
    kept = {r["doc_id"]
            for r in filter_blocklist(docs, ["example.com"]).collect()}
    assert kept == {3, 4}  # 1 and 2 reference a.example.com
    # exact-only: a.example.com is not the literal entry
    kept_exact = {r["doc_id"]
                  for r in filter_blocklist(docs, ["example.com"],
                                            subdomains=False).collect()}
    assert kept_exact == {1, 2, 3, 4}
    # empty blocklist keeps everything
    assert filter_blocklist(docs, []).count() == 4
