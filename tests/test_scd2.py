"""SCD2 history maintenance (sinks/scd2.py)."""

from __future__ import annotations

import pytest
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


# -- CDC-driven maintained SCD2 (r10, VERDICT r9 #8) ----------------------


def _scd2_fixture(spark, tmp_path):
    from sending_weekly_daily_csv_reports_from_hudi_datalake_to_customers_via_email_using_glue_and_sns_or_ses_spark.sinks.upsert import (
        KeyedTable,
    )
    from sending_weekly_daily_csv_reports_from_hudi_datalake_to_customers_via_email_using_glue_and_sns_or_ses_spark.sources.incremental import (
        CDCReader,
    )

    sch = "k int, pre int, seg string, tier int"
    t = KeyedTable(
        spark, str(tmp_path / "dim"), record_key="k", precombine="pre",
        keep_versions=20,
    )
    t.upsert(spark.createDataFrame(
        [(1, 0, "a", 10), (2, 0, "b", 20)], sch))
    t.upsert(spark.createDataFrame(
        [(1, 1, "a2", 10), (3, 0, "c", 30)], sch))   # update + insert
    t.delete(spark.createDataFrame([(2,)], "k int"))  # close k=2
    t.upsert(spark.createDataFrame(
        [(2, 2, "b2", 25), (3, 1, "c2", 30)], sch))  # re-insert + update
    t.delete(spark.createDataFrame([(3,)], "k int"))
    reader = CDCReader(
        spark, "dim", t.root, checkpoint_root=str(tmp_path / "ck")
    )
    return t, reader, sch


def _hist_rows(view):
    h = view.history()
    return sorted(
        (r["k"], r["seg"], r["tier"], r["valid_from"], r["valid_to"])
        for r in h.collect()
    )


@pytest.mark.slow
def test_maintained_scd2_windowed_equals_one_shot(spark, tmp_path):
    """Window-by-window CDC folds must land on the SAME history as one
    whole-history fold — the telescoping/idempotence contract the
    other maintained artifacts obey."""
    from sending_weekly_daily_csv_reports_from_hudi_datalake_to_customers_via_email_using_glue_and_sns_or_ses_spark.sinks.scd2 import (
        MaintainedSCD2,
    )

    t, reader, _ = _scd2_fixture(spark, tmp_path)
    stepped = MaintainedSCD2(spark, str(tmp_path / "h_step"), key="k")
    prev = None
    for c in t.instants():
        win = t.cdc(begin=prev, end=c)
        if win is not None:
            stepped.apply(win, through=c)
        prev = c
    oneshot = MaintainedSCD2(spark, str(tmp_path / "h_one"), key="k")
    oneshot.apply(t.cdc(), through=t.latest_commit())
    assert _hist_rows(stepped) == _hist_rows(oneshot)
    assert stepped.through() == t.latest_commit()
    # deletes closed versions without successors: k=3's last version
    # is closed and k=3 is absent from current
    cur = sorted(r["k"] for r in stepped.current().collect())
    assert cur == [1, 2]


def test_maintained_scd2_redelivery_noop_and_token_guard(spark, tmp_path):
    from sending_weekly_daily_csv_reports_from_hudi_datalake_to_customers_via_email_using_glue_and_sns_or_ses_spark.sinks.scd2 import (
        MaintainedSCD2,
    )

    t, reader, _ = _scd2_fixture(spark, tmp_path)
    view = MaintainedSCD2(spark, str(tmp_path / "h"), key="k")
    insts = t.instants()
    mid = insts[1]
    assert view.apply(t.cdc(end=mid), through=mid) is True
    before = _hist_rows(view)
    # redelivered window: covered token → no-op, history unchanged
    assert view.apply(t.cdc(end=mid), through=mid) is False
    assert _hist_rows(view) == before
    # tokenless apply on a tokened history raises (the unguard hazard)
    import pytest

    with pytest.raises(ValueError, match="through"):
        view.apply(t.cdc(begin=mid))
    # resume past the token
    assert view.apply(
        t.cdc(begin=mid), through=t.latest_commit()
    ) is True


@pytest.mark.slow
def test_maintained_scd2_point_in_time_matches_time_travel(
    spark, tmp_path
):
    """as_of(c) == table.snapshot(as_of=c) for EVERY commit — the
    point-in-time dimension-join guarantee."""
    from sending_weekly_daily_csv_reports_from_hudi_datalake_to_customers_via_email_using_glue_and_sns_or_ses_spark.sinks.scd2 import (
        MaintainedSCD2,
    )

    t, reader, _ = _scd2_fixture(spark, tmp_path)
    view = MaintainedSCD2(spark, str(tmp_path / "h"), key="k")
    view.apply(t.cdc(), through=t.latest_commit())
    for c in t.instants():
        got = sorted(
            (r["k"], r["seg"], r["tier"])
            for r in view.as_of(c).collect()
        )
        want = sorted(
            (r["k"], r["seg"], r["tier"])
            for r in t.snapshot(as_of=c).collect()
        )
        assert got == want, f"diverged at {c}"


def test_maintained_scd2_via_cdc_reader_loop(spark, tmp_path):
    """The production loop shape: CDCReader windows drive the history,
    checkpoint commits AFTER the fold; a seed-from-snapshot rebuild
    aligns the reader (the replace-commit recipe)."""
    from sending_weekly_daily_csv_reports_from_hudi_datalake_to_customers_via_email_using_glue_and_sns_or_ses_spark.sinks.scd2 import (
        MaintainedSCD2,
    )

    t, reader, sch = _scd2_fixture(spark, tmp_path)
    view = MaintainedSCD2(spark, str(tmp_path / "h"), key="k")
    while True:
        win = reader.read(after=view.through())
        if win is None:
            reader.commit()
            break
        view.apply(win, through=reader.staged_end())
        reader.commit()
    assert view.through() == t.latest_commit()
    cur = sorted(
        (r["k"], r["seg"], r["tier"]) for r in view.current().collect()
    )
    want = sorted(
        (r["k"], r["seg"], r["tier"]) for r in t.snapshot().collect()
    )
    assert cur == want
    # new commits: the loop resumes from the token
    t.upsert(spark.createDataFrame([(5, 0, "e", 50)], sch))
    win = reader.read(after=view.through())
    view.apply(win, through=reader.staged_end())
    reader.commit()
    assert (5, "e", 50) in {
        (r["k"], r["seg"], r["tier"]) for r in view.current().collect()
    }
    # replace commit: CDC raises → rebuild from the post-replace
    # snapshot (seeded rows open at the replace instant)
    t.overwrite(spark.createDataFrame([(9, 0, "z", 90)], sch))
    import pytest

    from sending_weekly_daily_csv_reports_from_hudi_datalake_to_customers_via_email_using_glue_and_sns_or_ses_spark.sinks.upsert import (
        ReplaceCommitError,
    )

    with pytest.raises(ReplaceCommitError):
        t.cdc(begin=view.through()).collect()
    end = t.latest_commit()
    view.rebuild(t.snapshot(), through=end)
    assert view.through() == end
    assert sorted(
        (r["k"], r["seg"], r["tier"]) for r in view.current().collect()
    ) == [(9, "z", 90)]


def test_maintained_scd2_survives_dimension_schema_evolution(
    spark, tmp_path
):
    """A dimension that ADDS a column between windows folds cleanly:
    pre-evolution versions NULL-fill the new column, post-evolution
    versions carry it (the engine-wide evolution read contract)."""
    from sending_weekly_daily_csv_reports_from_hudi_datalake_to_customers_via_email_using_glue_and_sns_or_ses_spark.sinks.scd2 import (
        MaintainedSCD2,
    )
    from sending_weekly_daily_csv_reports_from_hudi_datalake_to_customers_via_email_using_glue_and_sns_or_ses_spark.sinks.upsert import (
        KeyedTable,
    )

    t = KeyedTable(
        spark, str(tmp_path / "evdim"), record_key="k",
        precombine="pre", keep_versions=20,
    )
    t.upsert(spark.createDataFrame(
        [(1, 0, "a")], "k int, pre int, seg string"))
    view = MaintainedSCD2(spark, str(tmp_path / "evh"), key="k")
    c1 = t.latest_commit()
    view.apply(t.cdc(end=c1), through=c1)
    # evolution: the next upsert adds a `tier` column
    t.upsert(spark.createDataFrame(
        [(1, 1, "a2", 10), (2, 0, "b", 20)],
        "k int, pre int, seg string, tier int"))
    view.apply(t.cdc(begin=c1), through=t.latest_commit())
    rows = sorted(
        (r["k"], r["seg"], r["tier"], r["valid_to"] is None)
        for r in view.history().collect()
    )
    assert rows == [
        (1, "a", None, False),   # pre-evolution version: tier NULL
        (1, "a2", 10, True),
        (2, "b", 20, True),
    ]
