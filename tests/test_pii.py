"""PII redaction: per-rule matches, ordering (earlier rules win on
overlapping patterns), and the no-PII identity."""

from __future__ import annotations

from polygon_io_data_ingestion_pipeline_spark.operators.text import pii_redact


def _redact_one(spark, text: str):
    df = spark.createDataFrame([(text,)], "text string")
    return pii_redact(df).collect()[0]


def test_email_phone_ip_id_all_redacted(spark):
    r = _redact_one(
        spark,
        "mail a.user+tag@example.co.uk call 555-123-4567 from 192.168.0.1 acct 123456789",
    )
    assert r["n_email"] == 1
    assert r["n_phone"] == 1
    assert r["n_ipv4"] == 1
    assert r["n_id"] == 1
    assert r["n_redactions"] == 4
    assert r["redacted"] == "mail <EMAIL> call <PHONE> from <IP> acct <ID>"


def test_rule_order_prevents_double_counting(spark):
    # The email's digits must not also fire the phone/id rules, and an
    # IPv4 must not be eaten by the bare-digit rule.
    r = _redact_one(spark, "x123456789@host.com and 10.0.0.255")
    assert r["n_email"] == 1
    assert r["n_ipv4"] == 1
    assert r["n_phone"] == 0 and r["n_id"] == 0
    assert r["redacted"] == "<EMAIL> and <IP>"


def test_bare_digit_run_is_id_not_phone(spark):
    # Separator-less digit runs are identifiers; the phone rule requires
    # internal separators so it never claims them.
    r = _redact_one(spark, "Customer#000000042")
    assert r["n_id"] == 1 and r["n_phone"] == 0
    assert r["redacted"] == "Customer#<ID>"
    r2 = _redact_one(spark, "+44 20 7946 0958")
    assert r2["n_phone"] == 1 and r2["n_id"] == 0
    assert r2["redacted"] == "<PHONE>"


def test_clean_text_is_identity(spark):
    text = "no personal data in this sentence at all"
    r = _redact_one(spark, text)
    assert r["n_redactions"] == 0
    assert r["redacted"] == text


def test_multiple_matches_counted(spark):
    r = _redact_one(spark, "a@b.io c@d.io e@f.io")
    assert r["n_email"] == 3
    assert r["redacted"] == "<EMAIL> <EMAIL> <EMAIL>"


def test_dates_and_numeric_ranges_are_not_phones(spark):
    """Regression: the old phone rule ate every ISO date and dash
    range. Dates/ranges must survive; real phone shapes must not."""
    rows = [
        (1, "released on 2026-08-14 in prod"),
        (2, "versions 10-20-30 rolled back"),
        (3, "call 555-123-4567 now"),
        (4, "intl +44 20 7946 0958 line"),
        (5, "eu 12 34 56 78 90 form"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: (r["redacted"], r["n_phone"]) for r in pii_redact(df).collect()}
    assert got[1] == ("released on 2026-08-14 in prod", 0)
    assert got[2] == ("versions 10-20-30 rolled back", 0)
    assert got[3] == ("call <PHONE> now", 1)
    assert got[4] == ("intl <PHONE> line", 1)
    assert got[5] == ("eu <PHONE> form", 1)
