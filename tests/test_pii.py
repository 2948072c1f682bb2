from __future__ import annotations

from pyspark.sql import functions as F

from toy_vector_db_spark.functions.pii import pii_counts, redact_pii


def _one(spark, text):
    df = spark.createDataFrame([(text,)], ["t"])
    return df.select(
        F.inline(F.array(pii_counts(F.col("t")))),
        redact_pii(F.col("t")).alias("red")).collect()[0]


def test_detects_and_redacts_each_kind(spark):
    r = _one(spark, "mail a.b+c@ex-ample.co.uk or call 415-555-1234, "
                    "server at 10.0.0.1 ok")
    assert (r["n_email"], r["n_phone"], r["n_ipv4"]) == (1, 1, 1)
    assert r["red"] == "mail <EMAIL> or call <PHONE>, server at <IP> ok"


def test_email_redacted_before_numeric_patterns(spark):
    # digits+dots inside an address must not be half-eaten by the
    # ipv4 pattern: the email mask runs first
    r = _one(spark, "x 1.2.3.4@mail.com y")
    assert r["n_email"] == 1
    assert r["red"] == "x <EMAIL> y"


def test_clean_text_untouched(spark):
    r = _one(spark, "no personal data here, just words and 42")
    assert (r["n_email"], r["n_phone"], r["n_ipv4"]) == (0, 0, 0)
    assert r["red"] == "no personal data here, just words and 42"


def test_multiple_matches_counted(spark):
    r = _one(spark, "a@b.io c@d.io 1.1.1.1 2.2.2.2 3.3.3.3")
    assert (r["n_email"], r["n_phone"], r["n_ipv4"]) == (2, 0, 3)
