"""PII detection and redaction for training-corpus scrubbing.

Beyond-parity extension (the reference has no text tooling). Standard
pre-training hygiene: count and mask emails / phone numbers / IPv4
addresses before a corpus ships to training. Pure Column expressions —
regexp_extract_all / regexp_replace run inside whole-stage codegen, so
scrubbing is map-only at 100 TB (no UDF, no shuffle, nothing leaves
the JVM).

The patterns avoid lookaround and use only syntax with identical
semantics in Java regex (Spark) and RE2 (DuckDB), so the driver oracle
replays detection AND redaction value-for-value
(workload.pii_scrub).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Deliberately conservative recall-oriented patterns: corpus scrubbing
# wants cheap high-recall masks, not RFC-grade validation.
PII_PATTERNS: dict[str, tuple[str, str]] = {
    # kind -> (pattern, replacement token); dict order IS redaction order
    "email": (r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    "phone": (r"\b\d{3}[-. ]\d{3}[-. ]\d{4}\b", "<PHONE>"),
    "ipv4": (r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "<IP>"),
}


def pii_counts(text: Column) -> Column:
    """Per-kind match counts as a struct (n_email, n_phone, n_ipv4).
    Counts are on the ORIGINAL text, independent of redaction order."""
    fields = []
    for kind, (pat, _) in PII_PATTERNS.items():
        n = F.size(F.regexp_extract_all(text, F.lit(pat), F.lit(0)))
        fields.append(n.cast("bigint").alias(f"n_{kind}"))
    return F.struct(*fields)


def redact_pii(text: Column) -> Column:
    """Text with every PII match replaced by its token, applied in
    PII_PATTERNS order (emails first so an address is never half-eaten
    by the broader numeric patterns). Sequential regexp_replace — still
    one codegen'd projection."""
    out = text
    for pat, token in PII_PATTERNS.values():
        out = F.regexp_replace(out, pat, token)
    return out
