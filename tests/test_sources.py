"""In-memory / KV source (SURVEY.md §2.1 S5/S6)."""

from __future__ import annotations

from pyspark.sql import types as T

from sending_weekly_daily_csv_reports_from_hudi_datalake_to_customers_via_email_using_glue_and_sns_or_ses_spark.sources.memory import (
    chunked,
    kv_source,
    paginated,
)


def test_kv_source_with_schema(spark):
    schema = T.StructType(
        [
            T.StructField("pk", T.StringType(), False),
            T.StructField("qty", T.LongType(), True),
        ]
    )
    df = kv_source(spark, [{"pk": "a", "qty": 1}, {"pk": "b", "qty": None}], schema)
    assert df.schema == schema
    assert df.count() == 2


def test_kv_source_inferred(spark):
    df = kv_source(spark, [{"pk": "a", "qty": 1}])
    assert set(df.columns) == {"pk", "qty"}


def test_paginated_consumes_all_pages(spark):
    """The reference reads only the first scan page (template.py:289);
    paginated() flattens every page."""
    pages = [[{"pk": "a"}, {"pk": "b"}], [{"pk": "c"}], [{"pk": "d"}]]
    df = kv_source(spark, paginated(pages), "pk string")
    assert df.count() == 4


def test_chunked_roundtrip():
    rows = [{"i": n} for n in range(10)]
    chunks = list(chunked(rows, 3))
    assert [len(c) for c in chunks] == [3, 3, 3, 1]
    assert [r["i"] for c in chunks for r in c] == list(range(10))
