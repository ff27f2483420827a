"""Hypothesis property tests (SURVEY.md §5.4): upsert-merge laws over
arbitrary keyed batches. Examples are kept small (Spark job per
example); the properties, not the volume, carry the weight.
"""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from sending_weekly_daily_csv_reports_from_hudi_datalake_to_customers_via_email_using_glue_and_sns_or_ses_spark.sinks.upsert import (
    _merge_latest,
)

rows = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=5),  # key (collisions likely)
        st.integers(min_value=0, max_value=100),  # precombine
        st.integers(min_value=0, max_value=9),  # payload
    ),
    min_size=1,
    max_size=12,
)


def _df(spark, data):
    return spark.createDataFrame(data, "key int, pre int, payload int")


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(data=rows)
def test_merge_latest_law(spark, data):
    """After the merge: exactly one row per key, holding the global max
    precombine value for that key."""
    out = _merge_latest(_df(spark, data), "key", "pre").collect()
    expect = {}
    for k, p, _ in data:
        expect[k] = max(expect.get(k, -1), p)
    assert len(out) == len(expect)
    assert {r["key"]: r["pre"] for r in out} == expect


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(a=rows, b=rows)
def test_merge_is_associative_on_winners(spark, a, b):
    """merge(a ∪ b) ≡ merge(merge(a) ∪ merge(b)) on (key, pre) winners —
    the law that makes partial (map-side / per-batch) combining safe,
    i.e. why Hudi may precombine within batches before the global merge.
    """
    da, db = _df(spark, a), _df(spark, b)
    direct = _merge_latest(da.unionByName(db), "key", "pre")
    staged = _merge_latest(
        _merge_latest(da, "key", "pre").unionByName(_merge_latest(db, "key", "pre")),
        "key",
        "pre",
    )
    key_pre = lambda df: sorted(  # noqa: E731
        (r["key"], r["pre"]) for r in df.select("key", "pre").collect()
    )
    assert key_pre(direct) == key_pre(staged)


batches = st.lists(rows, min_size=1, max_size=3)


@settings(
    max_examples=5,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(data=batches)
def test_mor_equals_cow_on_arbitrary_batches(spark, data, tmp_path_factory):
    """P3 law: for ANY sequence of keyed batches, the MOR table's
    log-merged snapshot equals the COW table's materialized snapshot —
    the read-time merge is exactly sequential COW application."""
    from sending_weekly_daily_csv_reports_from_hudi_datalake_to_customers_via_email_using_glue_and_sns_or_ses_spark.sinks.upsert import (
        KeyedTable,
    )

    base = tmp_path_factory.mktemp("morprop")
    cow = KeyedTable(spark, str(base / "cow"), record_key="key", precombine="pre")
    mor = KeyedTable(
        spark,
        str(base / "mor"),
        record_key="key",
        precombine="pre",
        table_type="MERGE_ON_READ",
    )
    for batch in data:
        df = _df(spark, batch)
        cow.upsert(df)
        mor.upsert(df)
    rows_of = lambda t: sorted(  # noqa: E731
        (r["key"], r["pre"], r["payload"])
        for r in t.snapshot().select("key", "pre", "payload").collect()
    )
    assert rows_of(mor) == rows_of(cow)
