"""Text-cleaning column functions (functions/text.py): PII scrubbing,
repetition scoring, boilerplate line stripping — all JVM built-ins."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


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


def test_duplicate_line_fraction(spark):
    from sending_weekly_daily_csv_reports_from_hudi_datalake_to_customers_via_email_using_glue_and_sns_or_ses_spark.functions.text import (
        duplicate_line_fraction,
    )

    df = spark.createDataFrame(
        [
            (1, "a\nb\nc\nd"),  # unique → 0
            (2, "nav\nnav\nnav\nnav"),  # one distinct of 4 → 0.75
            (3, "x\ny\nx\ny"),  # two distinct of 4 → 0.5
            (4, ""),  # single empty line → 0
            (5, None),  # NULL text → 0, not NULL (exported-API contract)
        ],
        "id long, text string",
    )
    got = {
        r["id"]: r["f"]
        for r in df.select("id", duplicate_line_fraction("text").alias("f")).collect()
    }
    assert got[1] == 0.0
    assert got[2] == 0.75
    assert got[3] == 0.5
    assert got[4] == 0.0
    assert got[5] == 0.0


def test_repetition_signals_known_values(spark):
    from sending_weekly_daily_csv_reports_from_hudi_datalake_to_customers_via_email_using_glue_and_sns_or_ses_spark.operators.textual import (
        repetition_signals,
    )

    df = spark.createDataFrame(
        [
            # 6 tokens, every 2-gram unique → top = 2/6, dup = 0
            (1, "a b c d e f"),
            # "a b" appears 3x in 6 tokens → top = 6/6 = 1.0 (capped);
            # all 5 bigrams are "a b"/"b a", each duplicated → dup = 1.0
            (2, "a b a b a b"),
            # shorter than the window → both 0
            (3, "solo"),
        ],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r for r in repetition_signals(df, n=2).collect()}
    assert got[1]["top_ngram_frac"] == pytest.approx(2 / 6)
    assert got[1]["dup_ngram_frac"] == 0.0
    assert got[2]["top_ngram_frac"] == 1.0
    assert got[2]["dup_ngram_frac"] == 1.0
    assert got[3]["top_ngram_frac"] == 0.0
    assert got[3]["dup_ngram_frac"] == 0.0
    assert got[3]["n_tokens"] == 1


def test_repetition_signals_on_fixture_corpus(spark):
    from sending_weekly_daily_csv_reports_from_hudi_datalake_to_customers_via_email_using_glue_and_sns_or_ses_spark.catalog import (
        load_table,
    )
    from sending_weekly_daily_csv_reports_from_hudi_datalake_to_customers_via_email_using_glue_and_sns_or_ses_spark.operators.textual import (
        repetition_signals,
    )

    docs = load_table(spark, "/root/testdata/sf0.001", "documents")
    sig = repetition_signals(docs, n=2)
    assert sig.count() == docs.count()
    bad = sig.filter(
        (F.col("top_ngram_frac") < 0)
        | (F.col("top_ngram_frac") > 1)
        | (F.col("dup_ngram_frac") < 0)
        | (F.col("dup_ngram_frac") > 1)
        # a doc whose top gram repeats contributes it to dup coverage
        # (dup ≥ top unless the top gram is a singleton, in which case
        # top covers exactly one window's tokens)
        | (
            (F.col("dup_ngram_frac") < F.col("top_ngram_frac") - 1e-9)
            & (F.col("top_ngram_frac") * F.col("n_tokens") > 2 + 1e-9)
        )
    )
    assert bad.isEmpty()


def test_regex_token_count(spark):
    from sending_weekly_daily_csv_reports_from_hudi_datalake_to_customers_via_email_using_glue_and_sns_or_ses_spark.functions.text import (
        regex_token_count,
    )

    df = spark.createDataFrame(
        [
            (1, "Hello world"),  # "Hello", " world"
            (2, "it's 42 tokens!"),  # "it" "'s" " 42" " tokens" "!"
            (3, None),
            (4, ""),
            (5, "a,b"),  # "a" "," "b"
        ],
        "id long, text string",
    )
    got = {
        r["id"]: r["n"]
        for r in df.select("id", regex_token_count("text").alias("n")).collect()
    }
    assert got[1] == 2
    assert got[2] == 5
    assert got[3] == 0
    assert got[4] == 0
    assert got[5] == 3


def test_compression_signals_twin_and_ordering(spark):
    """compression_signals matches a direct Python zlib twin byte-for-
    byte, ranks repetitive text below prose and below random-ish text,
    and scores empty/NULL neutrally (ratio 1.0, 0 bytes)."""
    import zlib

    from sending_weekly_daily_csv_reports_from_hudi_datalake_to_customers_via_email_using_glue_and_sns_or_ses_spark.operators.textual import (
        compression_signals,
    )

    prose = (
        "the quick brown fox jumps over the lazy dog while a curious "
        "observer takes careful notes about seasonal migration patterns"
    )
    boiler = "click here to subscribe " * 40
    randomish = "qz7xv2 jk9wp4 mn3rt8 bl5gy1 cd6hs0 fw8ne2 " * 3
    rows = [(1, prose), (2, boiler), (3, randomish), (4, ""), (5, None)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: r for r in compression_signals(docs).collect()}

    for doc_id, text in rows:
        if not text:
            assert got[doc_id]["n_bytes"] == 0
            assert got[doc_id]["compressed_bytes"] == 0
            assert got[doc_id]["compression_ratio"] == 1.0
            continue
        b = text.encode("utf-8")
        assert got[doc_id]["n_bytes"] == len(b)
        assert got[doc_id]["compressed_bytes"] == len(zlib.compress(b, 6))
        assert got[doc_id]["compression_ratio"] == pytest.approx(
            len(zlib.compress(b, 6)) / len(b)
        )

    # boilerplate compresses far below prose; random-ish gibberish sits
    # above prose — the two drop-candidate tails
    assert got[2]["compression_ratio"] < got[1]["compression_ratio"]
    assert got[3]["compression_ratio"] > got[2]["compression_ratio"]
    assert got[2]["compression_ratio"] < 0.2


def test_compression_signals_byte_cap(spark):
    """max_bytes caps the measured prefix: a doc longer than the cap
    scores exactly what its first max_bytes bytes score (zlib cost
    O(min(doc, cap)) at scale), shorter docs are unaffected, and
    max_bytes=None keeps the uncapped signal."""
    import zlib

    from sending_weekly_daily_csv_reports_from_hudi_datalake_to_customers_via_email_using_glue_and_sns_or_ses_spark.operators.textual import (
        compression_signals,
    )

    long_doc = ("lorem ipsum dolor sit amet " * 40)[:1000] + "Z" * 500
    short_doc = "a modest document under every cap"
    docs = spark.createDataFrame(
        [(1, long_doc), (2, short_doc)], "doc_id long, text string"
    )

    capped = {
        r["doc_id"]: r
        for r in compression_signals(docs, max_bytes=256).collect()
    }
    prefix = long_doc.encode("utf-8")[:256]
    assert capped[1]["n_bytes"] == 256
    assert capped[1]["compressed_bytes"] == len(zlib.compress(prefix, 6))
    assert capped[1]["compression_ratio"] == pytest.approx(
        len(zlib.compress(prefix, 6)) / 256
    )
    assert capped[1]["truncated"] is True  # the cap's effect is visible
    # short doc: cap is a no-op
    sb = short_doc.encode("utf-8")
    assert capped[2]["n_bytes"] == len(sb)
    assert capped[2]["compressed_bytes"] == len(zlib.compress(sb, 6))
    assert capped[2]["truncated"] is False

    # uncapped path unchanged (parity lane)
    full = {
        r["doc_id"]: r
        for r in compression_signals(docs, max_bytes=None).collect()
    }
    lb = long_doc.encode("utf-8")
    assert full[1]["n_bytes"] == len(lb)
    assert full[1]["compressed_bytes"] == len(zlib.compress(lb, 6))
    assert full[1]["truncated"] is False and full[2]["truncated"] is False

    import pytest as _pytest

    with _pytest.raises(ValueError, match="max_bytes"):
        compression_signals(docs, max_bytes=0)
