"""SCD2 history maintenance (sinks/scd2.py)."""

from __future__ import annotations

import datetime as dt

from sending_weekly_daily_csv_reports_from_hudi_datalake_to_customers_via_email_using_glue_and_sns_or_ses_spark.sinks.scd2 import (
    scd2_apply,
    scd2_as_of,
    scd2_current,
)


def _updates(spark, rows):
    return spark.createDataFrame(
        rows, "customer_id string, city string, changed_at timestamp"
    )


T0 = dt.datetime(2024, 1, 1)
T1 = dt.datetime(2024, 2, 1)
T2 = dt.datetime(2024, 3, 1)


def test_scd2_lifecycle(spark):
    h = scd2_apply(None, _updates(spark, [("c1", "NYC", T0), ("c2", "LA", T0)]),
                   key="customer_id", change_ts="changed_at")
    assert scd2_current(h).count() == 2

    # c1 moves; c2 unchanged no-op update
    h = scd2_apply(h, _updates(spark, [("c1", "SF", T1), ("c2", "LA", T1)]),
                   key="customer_id", change_ts="changed_at")
    cur = {r["customer_id"]: r["city"] for r in scd2_current(h).collect()}
    assert cur == {"c1": "SF", "c2": "LA"}
    assert h.count() == 3  # two c1 versions + one c2 (no-op not versioned)

    c1 = {(r["valid_from"], r["valid_to"], r["city"])
          for r in h.filter(h.customer_id == "c1").collect()}
    assert c1 == {(T0, T1, "NYC"), (T1, None, "SF")}


def test_scd2_as_of_time_travel(spark):
    h = scd2_apply(None, _updates(spark, [("c1", "NYC", T0)]),
                   key="customer_id", change_ts="changed_at")
    h = scd2_apply(h, _updates(spark, [("c1", "SF", T1)]),
                   key="customer_id", change_ts="changed_at")
    h = scd2_apply(h, _updates(spark, [("c1", "CHI", T2)]),
                   key="customer_id", change_ts="changed_at")
    assert scd2_as_of(h, T0)["city"] is not None
    assert [r["city"] for r in scd2_as_of(h, dt.datetime(2024, 1, 15)).collect()] == ["NYC"]
    assert [r["city"] for r in scd2_as_of(h, dt.datetime(2024, 2, 15)).collect()] == ["SF"]
    assert [r["city"] for r in scd2_as_of(h, T2).collect()] == ["CHI"]


def test_scd2_multiple_updates_in_one_batch(spark):
    """Two changes for the same key in one batch chain correctly."""
    h = scd2_apply(
        None,
        _updates(spark, [("c1", "NYC", T0), ("c1", "SF", T1), ("c1", "CHI", T2)]),
        key="customer_id",
        change_ts="changed_at",
    )
    rows = sorted((r["valid_from"], r["valid_to"], r["city"]) for r in h.collect())
    assert rows == [(T0, T1, "NYC"), (T1, T2, "SF"), (T2, None, "CHI")]
