"""Incremental view maintenance over CDC streams (operators/ivm.py):
the maintained aggregate must equal a direct recompute over the source
snapshot after every window — inserts, merge updates, deletes, group
migrations, and group disappearance included."""

from __future__ import annotations

import pytest
import random

from pyspark.sql import functions as F

from sending_weekly_daily_csv_reports_from_hudi_datalake_to_customers_via_email_using_glue_and_sns_or_ses_spark.operators.ivm import (
    MaintainedAggregate,
    cdc_agg_delta,
    merge_agg_delta,
)
from sending_weekly_daily_csv_reports_from_hudi_datalake_to_customers_via_email_using_glue_and_sns_or_ses_spark.sinks.upsert import (
    KeyedTable,
)
from sending_weekly_daily_csv_reports_from_hudi_datalake_to_customers_via_email_using_glue_and_sns_or_ses_spark.sources.incremental import (
    CDCReader,
)

SCHEMA = "k int, pre int, grp string, amount long"


def _df(spark, rows):
    return spark.createDataFrame(rows, SCHEMA)


def _recompute(t: KeyedTable):
    snap = t.snapshot()
    if snap is None:
        return []
    return sorted(
        (r["grp"], r["n_rows"], r["sum_amount"])
        for r in snap.groupBy("grp")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.sum("amount").alias("sum_amount"),
        )
        .collect()
    )


def _maintained(df):
    if df is None:
        return []
    return sorted(
        (r["grp"], r["n_rows"], r["sum_amount"]) for r in df.collect()
    )


@pytest.mark.slow
def test_ivm_tracks_recompute_over_random_history(spark, tmp_path):
    """Property: after every applied window, union+re-agg maintenance
    equals a full groupBy recompute — seeded random upserts/deletes
    with heavy key collisions and group churn (integer sums → exact)."""
    rng = random.Random(7)
    src = KeyedTable(
        spark, str(tmp_path / "src"), record_key="k", precombine="pre"
    )
    reader = CDCReader(
        spark, "src", src.root, checkpoint_root=str(tmp_path / "ck")
    )
    current = None
    for step in range(6):
        if step in (2, 4):
            live = src.snapshot()
            keys = [r["k"] for r in live.select("k").collect()]
            victims = rng.sample(keys, k=max(1, len(keys) // 3))
            src.delete(
                spark.createDataFrame([(k,) for k in victims], "k int")
            )
        else:
            batch = [
                (
                    rng.randrange(10),
                    rng.randrange(100),
                    rng.choice(["a", "b", "c"]),
                    # NULL measures included: the n_<col> machinery must
                    # keep maintained sums equal to SQL-semantics
                    # recomputes (NULL over all-NULL groups)
                    None if rng.random() < 0.25 else rng.randrange(-50, 500),
                )
                for _ in range(rng.randrange(2, 8))
            ]
            src.upsert(_df(spark, batch))
        win = reader.read()
        assert win is not None
        delta = cdc_agg_delta(win, ["grp"], ["amount"])
        current = merge_agg_delta(current, delta, ["grp"], ["amount"])
        current = spark.createDataFrame(
            current.collect(), current.schema
        )  # pin (simulates the parquet roundtrip between windows)
        reader.commit()
        assert _maintained(current) == _recompute(src)


def test_ivm_group_migration_and_disappearance(spark, tmp_path):
    """An update that moves a key between groups retracts from the old
    group and adds to the new; emptying a group drops its row."""
    src = KeyedTable(
        spark, str(tmp_path / "src2"), record_key="k", precombine="pre"
    )
    src.upsert(_df(spark, [(1, 1, "a", 10), (2, 1, "b", 20)]))
    delta = cdc_agg_delta(src.cdc(), ["grp"], ["amount"])
    current = merge_agg_delta(None, delta, ["grp"], ["amount"])
    assert _maintained(current) == [("a", 1, 10), ("b", 1, 20)]

    begin = src.latest_commit()
    src.upsert(_df(spark, [(1, 2, "b", 15)]))  # a → b migration
    delta = cdc_agg_delta(src.cdc(begin=begin), ["grp"], ["amount"])
    current = merge_agg_delta(current, delta, ["grp"], ["amount"])
    # group a emptied → dropped; b holds both rows
    assert _maintained(current) == [("b", 2, 35)] == _recompute(src)


def test_maintained_aggregate_end_to_end(spark, tmp_path):
    """The parquet-backed loop: CDCReader windows → MaintainedAggregate
    apply/publish; survives process-style reopen (fresh object reads
    the pointer), and rebuild() heals from a snapshot."""
    src = KeyedTable(
        spark, str(tmp_path / "src3"), record_key="k", precombine="pre"
    )
    reader = CDCReader(
        spark, "src3", src.root, checkpoint_root=str(tmp_path / "ck3")
    )
    view = MaintainedAggregate(
        spark, str(tmp_path / "view"), group_cols=["grp"], sum_cols=["amount"]
    )
    src.upsert(_df(spark, [(1, 1, "a", 5), (2, 1, "a", 7), (3, 1, "b", 1)]))
    view.apply(reader.read())
    reader.commit()
    assert _maintained(view.current()) == [("a", 2, 12), ("b", 1, 1)]

    src.delete(spark.createDataFrame([(2,)], "k int"))
    src.upsert(_df(spark, [(4, 1, "b", 9)]))
    view.apply(reader.read())
    reader.commit()
    assert _maintained(view.current()) == _recompute(src)

    # reopen (new object over the same path) sees the published state
    reopened = MaintainedAggregate(
        spark, str(tmp_path / "view"), group_cols=["grp"], sum_cols=["amount"]
    )
    assert _maintained(reopened.current()) == _recompute(src)

    # rebuild from snapshot reproduces the maintained state exactly
    reopened.rebuild(src.snapshot())
    assert _maintained(reopened.current()) == _recompute(src)


def test_ivm_empty_group_row_not_dropped_on_zero_delta(spark, tmp_path):
    """A window that touches a group but nets to zero delta must leave
    the group's row intact (the drop rule keys on merged count, not on
    delta count)."""
    src = KeyedTable(
        spark, str(tmp_path / "src4"), record_key="k", precombine="pre"
    )
    src.upsert(_df(spark, [(1, 1, "a", 10), (2, 1, "a", 3)]))
    current = merge_agg_delta(
        None, cdc_agg_delta(src.cdc(), ["grp"], ["amount"]), ["grp"], ["amount"]
    )
    begin = src.latest_commit()
    # delete one key and insert another in the same group, same amount
    src.delete(spark.createDataFrame([(1,)], "k int"))
    src.upsert(_df(spark, [(9, 1, "a", 10)]))
    delta = cdc_agg_delta(src.cdc(begin=begin), ["grp"], ["amount"])
    current = merge_agg_delta(current, delta, ["grp"], ["amount"])
    assert _maintained(current) == [("a", 2, 13)] == _recompute(src)


def test_ivm_null_measure_retraction(spark, tmp_path):
    """Retracting the last non-null value must take the maintained sum
    to NULL (SQL SUM over an all-NULL group), not 0 — the silent
    divergence the n_<col> companion count exists to prevent."""
    src = KeyedTable(
        spark, str(tmp_path / "srcN"), record_key="k", precombine="pre"
    )
    src.upsert(_df(spark, [(1, 1, "a", None), (2, 1, "a", 5)]))
    current = merge_agg_delta(
        None, cdc_agg_delta(src.cdc(), ["grp"], ["amount"]), ["grp"], ["amount"]
    )
    assert _maintained(current) == [("a", 2, 5)]
    begin = src.latest_commit()
    src.delete(spark.createDataFrame([(2,)], "k int"))
    delta = cdc_agg_delta(src.cdc(begin=begin), ["grp"], ["amount"])
    current = merge_agg_delta(current, delta, ["grp"], ["amount"])
    assert _maintained(current) == [("a", 1, None)] == _recompute(src)
    # and back: a non-null insert revives the sum
    begin = src.latest_commit()
    src.upsert(_df(spark, [(3, 1, "a", 7)]))
    delta = cdc_agg_delta(src.cdc(begin=begin), ["grp"], ["amount"])
    current = merge_agg_delta(current, delta, ["grp"], ["amount"])
    assert _maintained(current) == [("a", 2, 7)] == _recompute(src)


def test_maintained_aggregate_exactly_once_token(spark, tmp_path):
    """The through-token redelivery guard: re-applying a window with
    the same staged end is a no-op (returns False, state unchanged) —
    the crash-between-apply-and-commit recovery path."""
    src = KeyedTable(
        spark, str(tmp_path / "srcT"), record_key="k", precombine="pre"
    )
    reader = CDCReader(
        spark, "srcT", src.root, checkpoint_root=str(tmp_path / "ckT")
    )
    view = MaintainedAggregate(
        spark, str(tmp_path / "viewT"), group_cols=["grp"], sum_cols=["amount"]
    )
    src.upsert(_df(spark, [(1, 1, "a", 5)]))
    win = reader.read()
    end = reader.staged_end()
    assert view.apply(win, through=end) is True
    # crash before reader.commit(): the window is redelivered
    win2 = reader.read()
    assert reader.staged_end() == end
    assert view.apply(win2, through=end) is False  # guarded no-op
    reader.commit()
    assert _maintained(view.current()) == [("a", 1, 5)] == _recompute(src)
    assert view.through() == end
    # the next real window applies normally
    src.upsert(_df(spark, [(2, 1, "a", 3)]))
    win3 = reader.read()
    assert view.apply(win3, through=reader.staged_end()) is True
    reader.commit()
    assert _maintained(view.current()) == [("a", 2, 8)] == _recompute(src)


def test_maintained_aggregate_extended_window_no_double_count(spark, tmp_path):
    """Crash between apply and reader.commit, then NEW upstream
    commits: the next window must start at the view's through-instant,
    not the stale checkpoint — otherwise the redelivered prefix
    re-folds and every count/sum inflates silently."""
    src = KeyedTable(
        spark, str(tmp_path / "srcX"), record_key="k", precombine="pre"
    )
    reader = CDCReader(
        spark, "srcX", src.root, checkpoint_root=str(tmp_path / "ckX")
    )
    view = MaintainedAggregate(
        spark, str(tmp_path / "viewX"), group_cols=["grp"], sum_cols=["amount"]
    )
    src.upsert(_df(spark, [(1, 1, "a", 10)]))
    win = reader.read(after=view.through())
    view.apply(win, through=reader.staged_end())
    reader.commit()
    src.upsert(_df(spark, [(2, 1, "a", 5)]))
    win = reader.read(after=view.through())
    view.apply(win, through=reader.staged_end())
    # CRASH: reader.commit() never runs. New upstream commit lands:
    src.upsert(_df(spark, [(3, 1, "a", 2)]))
    win = reader.read(after=view.through())  # must exclude (ck, through]
    view.apply(win, through=reader.staged_end())
    reader.commit()
    assert _maintained(view.current()) == _recompute(src) == [("a", 3, 17)]
    # and when the view is FULLY ahead: read stages a catch-up
    src_latest = src.latest_commit()
    reader.reset()
    assert view.through() == src_latest
    win = reader.read(after=view.through())
    assert win is None and reader.staged_end() == src_latest
    reader.commit()  # checkpoint catch-up without a fold
    assert reader.read(after=view.through()) is None


# ---------------------------------------------------------------- MIN/MAX


def _recompute_mm(t: KeyedTable):
    snap = t.snapshot()
    if snap is None:
        return []
    return sorted(
        (r["grp"], r["n_rows"], r["sum_amount"], r["min_amount"], r["max_amount"])
        for r in snap.groupBy("grp")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.sum("amount").alias("sum_amount"),
            F.min("amount").alias("min_amount"),
            F.max("amount").alias("max_amount"),
        )
        .collect()
    )


def _maintained_mm(df):
    if df is None:
        return []
    return sorted(
        (r["grp"], r["n_rows"], r["sum_amount"], r["min_amount"], r["max_amount"])
        for r in df.collect()
    )


@pytest.mark.slow
def test_ivm_minmax_tracks_recompute_over_random_history(spark, tmp_path):
    """Property: maintained MIN/MAX (dirty-group recompute protocol)
    equals a full recompute after every window — random upserts,
    updates, deletes, NULL measures, group churn."""
    rng = random.Random(11)
    src = KeyedTable(
        spark, str(tmp_path / "srcmm"), record_key="k", precombine="pre"
    )
    reader = CDCReader(
        spark, "srcmm", src.root, checkpoint_root=str(tmp_path / "ckmm")
    )
    view = MaintainedAggregate(
        spark,
        str(tmp_path / "viewmm"),
        group_cols=["grp"],
        sum_cols=["amount"],
        minmax_cols=["amount"],
    )
    for step in range(7):
        if step in (2, 5):
            live = src.snapshot()
            keys = [r["k"] for r in live.select("k").collect()]
            victims = rng.sample(keys, k=max(1, len(keys) // 3))
            src.delete(
                spark.createDataFrame([(k,) for k in victims], "k int")
            )
        else:
            batch = [
                (
                    rng.randrange(10),
                    step * 100 + i,  # increasing precombine: updates win
                    rng.choice(["a", "b", "c"]),
                    None if rng.random() < 0.25 else rng.randrange(-50, 500),
                )
                for i in range(rng.randrange(2, 8))
            ]
            src.upsert(_df(spark, batch))
        win = reader.read()
        assert win is not None
        assert view.apply(win, base=src.snapshot())
        reader.commit()
        assert _maintained_mm(view.current()) == _recompute_mm(src)


def test_ivm_minmax_insert_only_never_touches_base(spark, tmp_path):
    """Inserts can only improve an extremum — apply(base=None) must
    succeed across insert-only windows (the common append workload
    stays base-free)."""
    src = KeyedTable(
        spark, str(tmp_path / "srcins"), record_key="k", precombine="pre"
    )
    reader = CDCReader(
        spark, "srcins", src.root, checkpoint_root=str(tmp_path / "ckins")
    )
    view = MaintainedAggregate(
        spark,
        str(tmp_path / "viewins"),
        group_cols=["grp"],
        sum_cols=[],
        minmax_cols=["amount"],
    )
    src.upsert(_df(spark, [(1, 1, "a", 10), (2, 1, "a", 30)]))
    view.apply(reader.read(), base=None)
    reader.commit()
    src.upsert(_df(spark, [(3, 1, "a", 5), (4, 1, "b", None)]))
    view.apply(reader.read(), base=None)
    reader.commit()
    got = _maintained_mm2(view.current())
    assert got == [("a", 3, 5, 30), ("b", 1, None, None)]


def _maintained_mm2(df):
    return sorted(
        (r["grp"], r["n_rows"], r["min_amount"], r["max_amount"])
        for r in df.collect()
    )


def test_ivm_minmax_clean_retraction_stays_base_free(spark, tmp_path):
    """Deleting a row strictly inside the (min, max) interval proves
    the stored extremes intact — no base needed; deleting the extremum
    without a base raises instead of publishing a stale value."""
    import pytest

    src = KeyedTable(
        spark, str(tmp_path / "srccl"), record_key="k", precombine="pre"
    )
    reader = CDCReader(
        spark, "srccl", src.root, checkpoint_root=str(tmp_path / "ckcl")
    )
    view = MaintainedAggregate(
        spark,
        str(tmp_path / "viewcl"),
        group_cols=["grp"],
        sum_cols=["amount"],
        minmax_cols=["amount"],
    )
    src.upsert(
        _df(spark, [(1, 1, "a", 10), (2, 1, "a", 20), (3, 1, "a", 30)])
    )
    view.apply(reader.read(), base=None)
    reader.commit()

    src.delete(spark.createDataFrame([(2,)], "k int"))  # mid value
    view.apply(reader.read(), base=None)  # clean: 10 < 20 < 30
    reader.commit()
    assert _maintained_mm(view.current()) == [("a", 2, 40, 10, 30)]

    src.delete(spark.createDataFrame([(1,)], "k int"))  # the min
    win = reader.read()
    with pytest.raises(ValueError, match="not.*self-maintainable"):
        view.apply(win, base=None)
    # same window with a base: recompute heals exactly the dirty group
    assert view.apply(win, base=src.snapshot())
    reader.commit()
    assert _maintained_mm(view.current()) == [("a", 1, 30, 30, 30)]


def test_ivm_minmax_null_exhaustion_is_base_free(spark, tmp_path):
    """Retracting the LAST non-null value needs no base: the answer is
    the empty-aggregate NULL, and the n_<c> witness proves it."""
    src = KeyedTable(
        spark, str(tmp_path / "srcnx"), record_key="k", precombine="pre"
    )
    reader = CDCReader(
        spark, "srcnx", src.root, checkpoint_root=str(tmp_path / "cknx")
    )
    view = MaintainedAggregate(
        spark,
        str(tmp_path / "viewnx"),
        group_cols=["grp"],
        sum_cols=["amount"],
        minmax_cols=["amount"],
    )
    src.upsert(_df(spark, [(1, 1, "a", 42), (2, 1, "a", None)]))
    view.apply(reader.read(), base=None)
    reader.commit()
    src.delete(spark.createDataFrame([(1,)], "k int"))
    view.apply(reader.read(), base=None)  # n_amount -> 0: NULL, clean
    reader.commit()
    assert _maintained_mm(view.current()) == [("a", 1, None, None, None)]


def test_ivm_minmax_group_migration_dirties_old_group(spark, tmp_path):
    """An update moving the extremum row to another group retracts it
    from the old group (dirty there) and inserts into the new (clean
    there) — one window, both effects."""
    src = KeyedTable(
        spark, str(tmp_path / "srcmg"), record_key="k", precombine="pre"
    )
    reader = CDCReader(
        spark, "srcmg", src.root, checkpoint_root=str(tmp_path / "ckmg")
    )
    view = MaintainedAggregate(
        spark,
        str(tmp_path / "viewmg"),
        group_cols=["grp"],
        sum_cols=["amount"],
        minmax_cols=["amount"],
    )
    src.upsert(_df(spark, [(1, 1, "a", 5), (2, 1, "a", 50), (3, 1, "b", 7)]))
    view.apply(reader.read(), base=None)
    reader.commit()
    src.upsert(_df(spark, [(1, 2, "b", 5)]))  # min of a migrates to b
    view.apply(reader.read(), base=src.snapshot())
    reader.commit()
    assert _maintained_mm(view.current()) == [
        ("a", 1, 50, 50, 50),
        ("b", 2, 12, 5, 7),
    ]


def test_ivm_minmax_callable_base_lazy(spark, tmp_path):
    """A callable base is only invoked on dirty windows: clean windows
    succeed even when constructing the base would RAISE (the lagging-
    consumer-with-aggressive-cleaner scenario)."""
    src = KeyedTable(
        spark, str(tmp_path / "srclz"), record_key="k", precombine="pre"
    )
    reader = CDCReader(
        spark, "srclz", src.root, checkpoint_root=str(tmp_path / "cklz")
    )
    view = MaintainedAggregate(
        spark,
        str(tmp_path / "viewlz"),
        group_cols=["grp"],
        sum_cols=[],
        minmax_cols=["amount"],
    )

    def exploding_base():
        raise AssertionError("base constructed on a clean window")

    src.upsert(_df(spark, [(1, 1, "a", 10), (2, 1, "a", 30)]))
    view.apply(reader.read(), base=exploding_base)  # insert-only: clean
    reader.commit()

    src.delete(spark.createDataFrame([(2,)], "k int"))  # retract max
    win = reader.read()
    calls = []

    def counting_base():
        calls.append(1)
        return src.snapshot()

    view.apply(win, base=counting_base)
    reader.commit()
    assert calls == [1]
    assert _maintained_mm2(view.current()) == [("a", 1, 10, 10)]


@pytest.mark.slow
def test_ivm_distinct_count_tracks_recompute(spark, tmp_path):
    """COUNT(DISTINCT) maintenance (r9, VERDICT r8 #7): the auxiliary
    per-(group, value) multiplicity state must keep distinct_<c> exact
    through inserts, updates that change the value, NULLs, and —
    critically — deletes that UN-DISTINCT a value (retracting one of
    two equal rows must NOT drop the value; retracting the last one
    must). read() also exposes avg_<c>."""
    rng = random.Random(13)
    src = KeyedTable(
        spark, str(tmp_path / "dsrc"), record_key="k", precombine="pre"
    )
    reader = CDCReader(
        spark, "dsrc", src.root, checkpoint_root=str(tmp_path / "dck")
    )
    view = MaintainedAggregate(
        spark,
        str(tmp_path / "dview"),
        group_cols=["grp"],
        sum_cols=["amount"],
        distinct_cols=["amount"],
    )

    def recompute():
        snap = src.snapshot()
        if snap is None:
            return []
        return sorted(
            (
                r["grp"],
                r["n_rows"],
                r["sum_amount"],
                r["avg_amount"],
                r["distinct_amount"],
            )
            for r in snap.groupBy("grp")
            .agg(
                F.count(F.lit(1)).alias("n_rows"),
                F.sum("amount").alias("sum_amount"),
                F.avg("amount").alias("avg_amount"),
                F.countDistinct("amount").alias("distinct_amount"),
            )
            .collect()
        )

    def maintained():
        df = view.read()
        if df is None:
            return []
        return sorted(
            (
                r["grp"],
                r["n_rows"],
                r["sum_amount"],
                r["avg_amount"],
                r["distinct_amount"],
            )
            for r in df.collect()
        )

    # amounts drawn from a TINY domain so equal values collide within
    # groups constantly — the un-distinct cases happen organically —
    # plus NULLs (excluded from both distinct and avg)
    for step in range(7):
        if step in (2, 5):
            live = src.snapshot()
            keys = [r["k"] for r in live.select("k").collect()]
            victims = rng.sample(keys, k=max(1, len(keys) // 3))
            src.delete(
                spark.createDataFrame([(k,) for k in victims], "k int")
            )
        else:
            batch = [
                (
                    rng.randrange(12),
                    rng.randrange(100),
                    rng.choice(["a", "b"]),
                    rng.choice([10, 20, 30, None]),
                )
                for _ in range(8)
            ]
            src.upsert(_df(spark, batch))
        win = reader.read()
        if win is not None:
            view.apply(win, through=reader.staged_end())
            reader.commit()
        assert maintained() == recompute(), f"step {step}"


def test_ivm_distinct_targeted_un_distinct_delete(spark, tmp_path):
    """The surgical case: group g holds amounts [5, 5, 9]. Deleting one
    5 keeps distinct=2 (a twin survives); deleting the second 5 drops
    it to 1. A view with main state but missing aux raises loudly."""
    import pytest

    src = KeyedTable(
        spark, str(tmp_path / "tsrc"), record_key="k", precombine="pre"
    )
    view = MaintainedAggregate(
        spark,
        str(tmp_path / "tview"),
        group_cols=["grp"],
        sum_cols=["amount"],
        distinct_cols=["amount"],
    )
    src.upsert(
        _df(spark, [(1, 1, "g", 5), (2, 1, "g", 5), (3, 1, "g", 9)])
    )
    c1 = src.latest_commit()
    view.apply(src.cdc(end=c1), through=c1)

    def distinct():
        return view.read().collect()[0]["distinct_amount"]

    assert distinct() == 2
    src.delete(spark.createDataFrame([(1,)], "k int"))
    c2 = src.latest_commit()
    view.apply(src.cdc(begin=c1, end=c2), through=c2)
    assert distinct() == 2  # the twin 5 survives
    src.delete(spark.createDataFrame([(2,)], "k int"))
    c3 = src.latest_commit()
    view.apply(src.cdc(begin=c2, end=c3), through=c3)
    assert distinct() == 1  # the value 5 is gone

    # upgrade rail: a view with published state but no aux for a NEWLY
    # configured distinct col refuses the fold (rebuild to seed)
    legacy = MaintainedAggregate(
        spark,
        str(tmp_path / "tview"),
        group_cols=["grp"],
        sum_cols=["amount"],
        distinct_cols=["amount", "pre"],
    )
    src.upsert(_df(spark, [(4, 1, "g", 7)]))
    c4 = src.latest_commit()
    with pytest.raises(ValueError, match="distinct-state"):
        legacy.apply(src.cdc(begin=c3, end=c4), through=c4)
    # rebuild seeds BOTH aux cols; maintenance then resumes
    legacy.rebuild(src.snapshot(as_of=c4), through=c4)
    row = legacy.read().collect()[0]
    # live rows: (3, pre 1, g, 9), (4, pre 1, g, 7)
    assert row["distinct_amount"] == 2 and row["distinct_pre"] == 1
    src.delete(spark.createDataFrame([(3,)], "k int"))
    c5 = src.latest_commit()
    legacy.apply(src.cdc(begin=c4, end=c5), through=c5)
    row = legacy.read().collect()[0]
    # live rows: (4, pre 1, g, 7) — the delete retracted one of the two
    # pre=1 twins (multiplicity 2→1, value survives) and the only 9
    assert row["distinct_amount"] == 1 and row["distinct_pre"] == 1
    assert row["avg_amount"] == 7.0


def test_ivm_distinct_config_guards(spark, tmp_path):
    """distinct_cols config rails: no group cols (the aux needs a key),
    and a distinct col that IS a group col (trivially 1, and the aux's
    group+value keying would duplicate the column) both refuse at
    construction."""
    import pytest

    with pytest.raises(ValueError, match="requires group_cols"):
        MaintainedAggregate(
            spark, str(tmp_path / "g1"), group_cols=[],
            sum_cols=["amount"], distinct_cols=["amount"],
        )
    with pytest.raises(ValueError, match="are group columns"):
        MaintainedAggregate(
            spark, str(tmp_path / "g2"), group_cols=["grp"],
            sum_cols=["amount"], distinct_cols=["grp"],
        )


def test_ivm_tokenless_apply_on_tokened_view_raises(spark, tmp_path):
    """r9 review fix: a tokenless apply on a token-carrying view would
    publish through=None, erasing the redelivery guard for every
    previously covered window — refuse loudly instead."""
    import pytest

    src = KeyedTable(
        spark, str(tmp_path / "tok"), record_key="k", precombine="pre"
    )
    view = MaintainedAggregate(
        spark, str(tmp_path / "tokview"),
        group_cols=["grp"], sum_cols=["amount"],
    )
    c1 = src.upsert(_df(spark, [(1, 1, "a", 5)]))
    view.apply(src.cdc(end=c1), through=c1)
    c2 = src.upsert(_df(spark, [(2, 1, "a", 7)]))
    with pytest.raises(ValueError, match="erase the token"):
        view.apply(src.cdc(begin=c1, end=c2))
    # the token survived; the tokened retry folds normally
    assert view.through() == c1
    view.apply(src.cdc(begin=c1, end=c2), through=c2)
    assert view.through() == c2
    assert _maintained(view.current()) == [("a", 2, 12)]


def test_ivm_global_aggregate_keeps_row_when_table_empties(spark, tmp_path):
    """r9 review fix: group_cols=[] is a GLOBAL aggregate — SQL yields
    exactly one row even over an empty table, so emptying the source
    must leave (n_rows=0, sum NULL), not zero rows."""
    src = KeyedTable(
        spark, str(tmp_path / "glob"), record_key="k", precombine="pre"
    )
    view = MaintainedAggregate(
        spark, str(tmp_path / "globview"), group_cols=[], sum_cols=["amount"]
    )
    c1 = src.upsert(_df(spark, [(1, 1, "a", 5), (2, 1, "b", 7)]))
    view.apply(src.cdc(end=c1), through=c1)
    row = view.current().collect()[0]
    assert (row["n_rows"], row["sum_amount"]) == (2, 12)
    src.delete(spark.createDataFrame([(1,), (2,)], "k int"))
    c2 = src.latest_commit()
    view.apply(src.cdc(begin=c1, end=c2), through=c2)
    rows = view.current().collect()
    assert len(rows) == 1
    assert (rows[0]["n_rows"], rows[0]["sum_amount"]) == (0, None)
