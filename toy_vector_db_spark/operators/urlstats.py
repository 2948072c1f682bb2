"""URL / domain analysis over a document corpus.

The RefinedWeb-style (Penedo et al., arXiv:2306.01116) URL-level
curation step: extract URLs mentioned in each document, aggregate
per-domain frequencies, and drop documents referencing blocklisted
domains. All extraction is codegen-only regexp work (RE2-compatible
patterns, so a SQL oracle reproduces it character-for-character);
the only shuffle is the per-domain aggregate on a compact key, and
the blocklist filter is map-side (broadcast set semantics via an
``array_exists`` over the per-row extraction — no join at all for
driver-sized blocklists, the normal case).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# RE2-compatible: no lookaround/backrefs. Terminal .,;:!?)'" are
# excluded so prose punctuation doesn't stick to the URL.
URL_PATTERN = r"https?://[^\s]*[^\s.,;:!?)'\"]"
DOMAIN_PATTERN = r"^https?://([^/:?#]+)"


def extract_urls(text: Column) -> Column:
    """array<string> of URLs appearing in the text (may be empty)."""
    return F.regexp_extract_all(text, F.lit(URL_PATTERN), 0)


def url_domain(url: Column) -> Column:
    """Host part of a URL, lowercased ('' if the URL doesn't parse)."""
    return F.lower(F.regexp_extract(url, DOMAIN_PATTERN, 1))


def doc_domains(docs: DataFrame, id_col: str = "doc_id",
                text_col: str = "text") -> DataFrame:
    """(id, domain): one row per DISTINCT domain per document —
    document-level presence, the unit RefinedWeb curates on."""
    doms = F.array_distinct(F.transform(extract_urls(F.col(text_col)),
                                        url_domain))
    return (docs.select(F.col(id_col), F.explode(doms).alias("domain"))
            .filter(F.col("domain") != ""))


def domain_stats(docs: DataFrame, id_col: str = "doc_id",
                 text_col: str = "text") -> DataFrame:
    """(domain, n_docs, n_urls): documents mentioning the domain and
    total URL occurrences pointing at it. One explode + one aggregate
    on the domain key (partial aggregation applies; domains are a
    compact, low-cardinality shuffle key)."""
    urls = (docs.select(F.col(id_col),
                        F.explode(extract_urls(F.col(text_col)))
                        .alias("__url"))
            .select(id_col, url_domain(F.col("__url")).alias("domain"))
            .filter(F.col("domain") != ""))
    return (urls.groupBy("domain")
            .agg(F.count_distinct(F.col(id_col)).alias("n_docs"),
                 F.count(F.lit(1)).alias("n_urls")))


def filter_blocklist(docs: DataFrame, blocked_domains: Sequence[str],
                     text_col: str = "text",
                     subdomains: bool = True) -> DataFrame:
    """Drop documents that reference any blocklisted domain.

    Map-side only: the blocklist is embedded as a literal array (the
    driver-sized case — blocklists are thousands of entries, not
    data-sized), and a doc is dropped when ``exists`` finds any of its
    URL domains in it. ``subdomains=True`` also blocks
    ``*.blocked.tld``. For a data-sized blocklist TABLE, use
    ``doc_domains`` + a broadcast anti-join instead."""
    blocked = [d.lower() for d in blocked_domains]
    doms = F.transform(extract_urls(F.col(text_col)), url_domain)

    def hit(d: Column) -> Column:
        direct = d.isin(*blocked) if blocked else F.lit(False)
        if not subdomains:
            return direct
        return direct | F.exists(
            F.lit(blocked).cast("array<string>"),
            lambda b: d.endswith(F.concat(F.lit("."), b)))

    return docs.filter(~F.exists(doms, hit))
