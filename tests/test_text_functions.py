"""Text-cleaning column functions (functions/text.py): PII scrubbing,
repetition scoring, boilerplate line stripping — all JVM built-ins."""

from __future__ import annotations


from sending_weekly_daily_csv_reports_from_hudi_datalake_to_customers_via_email_using_glue_and_sns_or_ses_spark.functions import (
    pii_hit_count,
    repetition_ratio,
    scrub_pii,
    strip_repeated_lines,
)


def _one(spark, text, expr):
    df = spark.createDataFrame([(text,)], "text string")
    return df.select(expr.alias("v")).first()["v"]


def test_scrub_pii_replaces_all_shapes(spark):
    text = (
        "mail a.b@example.com or visit https://example.com/x "
        "ssn 123-45-6789 ip 10.1.2.3 call +1 (415) 555-0100 now"
    )
    out = _one(spark, text, scrub_pii("text"))
    assert "<EMAIL>" in out and "<URL>" in out and "<SSN>" in out
    assert "<PHONE>" in out and "<IP>" in out
    assert "example.com" not in out and "555" not in out


def test_pii_hit_count(spark):
    assert _one(spark, "no pii here at all", pii_hit_count("text")) == 0
    assert _one(spark, "x@y.io and 1.2.3.4", pii_hit_count("text")) == 2


def test_pii_ip_not_eaten_by_phone(spark):
    out = _one(spark, "server at 192.168.100.200 up", scrub_pii("text"))
    assert out == "server at <IP> up"
    # ...and counted once, as an IP — not double-counted by the phone shape
    assert _one(spark, "server at 192.168.100.200 up", pii_hit_count("text")) == 1


def test_pii_ssn_counted_once(spark):
    assert _one(spark, "ssn 123-45-6789 on file", pii_hit_count("text")) == 1


def test_pii_dates_are_not_phones(spark):
    text = "logged 2026-08-13 14:30:45 ok"
    assert _one(spark, text, scrub_pii("text")) == text
    assert _one(spark, text, pii_hit_count("text")) == 0


def test_pii_null_text_counts_zero(spark):
    assert _one(spark, None, pii_hit_count("text")) == 0


def test_repetition_ratio_bounds(spark):
    assert _one(spark, "all tokens are unique words", repetition_ratio("text")) == 0.0
    high = _one(spark, "spam spam spam spam spam", repetition_ratio("text"))
    assert high == 0.8  # 1 - 1/5


def test_strip_repeated_lines(spark):
    text = "header\nheader\nbody one\nbody two\nbody two\nfooter"
    out = _one(spark, text, strip_repeated_lines("text"))
    assert out == "header\nbody one\nbody two\nfooter"


def test_scrub_is_scan_only(spark):
    """The cleaning sweep stays a zero-shuffle projection."""
    df = spark.createDataFrame([("a@b.co x",)], "text string").select(
        scrub_pii("text").alias("clean"),
        pii_hit_count("text").alias("hits"),
        repetition_ratio("text").alias("rep"),
    )
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
