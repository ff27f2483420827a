"""Incremental reader semantics (SURVEY.md §3.2; FIXTURES.md scenario 3):
first read returns everything, subsequent reads only new commits, empty
increments leave the checkpoint unchanged, checkpoint advances only on
explicit commit() (after sink success)."""

from __future__ import annotations

from sending_weekly_daily_csv_reports_from_hudi_datalake_to_customers_via_email_using_glue_and_sns_or_ses_spark import (
    fixtures,
)
from sending_weekly_daily_csv_reports_from_hudi_datalake_to_customers_via_email_using_glue_and_sns_or_ses_spark.sinks.upsert import (
    KeyedTable,
)
from sending_weekly_daily_csv_reports_from_hudi_datalake_to_customers_via_email_using_glue_and_sns_or_ses_spark.sources.incremental import (
    IncrementalReader,
)


def _reader(spark, table: KeyedTable, tmp_path) -> IncrementalReader:
    r = IncrementalReader(
        spark,
        "orders",
        table.root,
        checkpoint_root=str(tmp_path / "metadata"),
    )
    # read from the table's commit log (carries _commit_time)
    r._snapshot = table.log  # type: ignore[method-assign]
    return r


def test_incremental_progression(spark, tmp_path):
    t = KeyedTable(
        spark,
        str(tmp_path / "orders"),
        record_key="order_id",
        precombine="order_date",
    )
    t.upsert(fixtures.orders(spark, 30, batch=0))
    r = _reader(spark, t, tmp_path)

    # first run: everything
    first = r.read()
    assert first.count() == 30
    r.commit()

    # no new commits → empty increment, checkpoint untouched
    ckpt_before = r.store.read("orders").last_processed_commit
    assert r.read().count() == 0
    r.commit()
    assert r.store.read("orders").last_processed_commit == ckpt_before

    # new commit → exactly the new rows
    t.upsert(fixtures.orders(spark, 10, n_customers=50, batch=99))
    inc = r.read()
    assert inc.count() == 10
    r.commit()
    assert r.read().count() == 0


def test_union_of_increments_equals_log(spark, tmp_path):
    """Property: reading increment-by-increment loses nothing vs the
    full log (completeness)."""
    t = KeyedTable(
        spark,
        str(tmp_path / "orders2"),
        record_key="order_id",
        precombine="order_date",
    )
    r = _reader(spark, t, tmp_path)
    seen = 0
    for b in range(3):
        t.upsert(fixtures.orders(spark, 20, batch=b))
        seen += r.read().count()
        r.commit()
    assert seen == t.log().count()


def test_uncommitted_read_is_replayed(spark, tmp_path):
    """Crash between read and sink: without commit(), the next read
    returns the same rows again (at-least-once — the reference loses
    them, template.py:244-251)."""
    t = KeyedTable(
        spark,
        str(tmp_path / "orders3"),
        record_key="order_id",
        precombine="order_date",
    )
    t.upsert(fixtures.orders(spark, 15))
    r = _reader(spark, t, tmp_path)
    assert r.read().count() == 15
    # no commit() — simulated sink failure
    r2 = _reader(spark, t, tmp_path)
    assert r2.read().count() == 15


def test_reset_reloads_everything(spark, tmp_path):
    t = KeyedTable(
        spark,
        str(tmp_path / "orders4"),
        record_key="order_id",
        precombine="order_date",
    )
    t.upsert(fixtures.orders(spark, 12))
    r = _reader(spark, t, tmp_path)
    r.read()
    r.commit()
    r.reset()  # clean_check_point, template.py:193-195
    assert r.read().count() == 12


def test_reader_consumes_keyed_table_root_directly(spark, tmp_path):
    """ADVICE r1: IncrementalReader consumes a KeyedTable root (log/
    layout) first-class — no monkeypatching of _snapshot needed."""
    t = KeyedTable(
        spark,
        str(tmp_path / "orders5"),
        record_key="order_id",
        precombine="order_date",
    )
    t.upsert(fixtures.orders(spark, 20, batch=0))
    r = IncrementalReader(
        spark, "orders", t.root, checkpoint_root=str(tmp_path / "md5x")
    )
    assert r.read().count() == 20
    r.commit()
    t.upsert(fixtures.orders(spark, 7, batch=1))
    assert r.read().count() == 7


def test_catalog_keeps_inc_reader_and_commits(spark, tmp_path):
    """Catalog.register(INC) keeps the reader handle; commit_incremental
    advances the checkpoint so the next run reads only new commits."""
    from sending_weekly_daily_csv_reports_from_hudi_datalake_to_customers_via_email_using_glue_and_sns_or_ses_spark.catalog import (
        Catalog,
        SourceSpec,
    )

    t = KeyedTable(
        spark,
        str(tmp_path / "orders6"),
        record_key="order_id",
        precombine="order_date",
    )
    t.upsert(fixtures.orders(spark, 18, batch=0))
    spec = SourceSpec(
        table_name="orders_inc",
        path=t.root,
        load_type="INC",
        options={"checkpoint_root": str(tmp_path / "md6")},
    )
    cat = Catalog(spark)
    assert cat.register(spec).count() == 18
    cat.commit_incremental()
    t.upsert(fixtures.orders(spark, 5, batch=1))
    cat2 = Catalog(spark)
    assert cat2.register(spec).count() == 5


def test_catalog_full_hudi_fmt_reads_keyed_snapshot(spark, tmp_path):
    """fmt='hudi' FULL source: without Hudi jars the catalog serves the
    KeyedTable emulation's (MOR log-merged) snapshot."""
    from sending_weekly_daily_csv_reports_from_hudi_datalake_to_customers_via_email_using_glue_and_sns_or_ses_spark.catalog import (
        Catalog,
        SourceSpec,
    )

    t = KeyedTable(
        spark,
        str(tmp_path / "orders7"),
        record_key="order_id",
        precombine="order_date",
        table_type="MERGE_ON_READ",
    )
    t.upsert(fixtures.orders(spark, 9, batch=0))
    df = Catalog(spark).register(
        SourceSpec(table_name="orders_hudi", path=t.root, fmt="hudi")
    )
    assert df.count() == 9
    assert spark.table("orders_hudi").count() == 9


# -- CDC reader + apply (replication) -----------------------------------


def _kv(spark, rows):
    return spark.createDataFrame(rows, "k int, pre int, v string")


def _state(t: KeyedTable):
    snap = t.snapshot()
    if snap is None:
        return []
    return sorted((r["k"], r["pre"], r["v"]) for r in snap.collect())


def _cdc_reader(spark, t: KeyedTable, tmp_path, name="src"):
    from sending_weekly_daily_csv_reports_from_hudi_datalake_to_customers_via_email_using_glue_and_sns_or_ses_spark.sources.incremental import (
        CDCReader,
    )

    return CDCReader(
        spark, name, t.root, checkpoint_root=str(tmp_path / "cdc_meta")
    )


def test_cdc_replication_end_to_end(spark, tmp_path):
    """The full consume loop: CDCReader windows + apply_cdc keep a
    replica byte-equal (data columns) with the source across upserts,
    merges, deletes, and re-inserts — syncing after every phase."""
    src = KeyedTable(
        spark, str(tmp_path / "src"), record_key="k", precombine="pre"
    )
    dst = KeyedTable(
        spark, str(tmp_path / "dst"), record_key="k", precombine="pre"
    )
    r = _cdc_reader(spark, src, tmp_path)

    phases = [
        lambda: src.upsert(_kv(spark, [(1, 10, "a"), (2, 10, "b")])),
        lambda: (
            src.upsert(_kv(spark, [(1, 20, "a2"), (3, 5, "c")])),
            src.delete(spark.createDataFrame([(2,)], "k int")),
        ),
        lambda: (
            src.delete(spark.createDataFrame([(1,)], "k int")),
            src.upsert(_kv(spark, [(1, 1, "reborn"), (4, 7, "d")])),
        ),
    ]
    for phase in phases:
        phase()
        win = r.read()
        assert win is not None
        dst.apply_cdc(win)
        r.commit()
        assert _state(dst) == _state(src)

    # quiescent source → empty window, checkpoint untouched
    assert r.read() is None


def test_apply_cdc_forces_smaller_precombine(spark, tmp_path):
    """The stale-win hazard: upstream delete + re-insert with a SMALLER
    precombine must not lose the merge against the replica's old row —
    apply must force-converge those keys."""
    src = KeyedTable(
        spark, str(tmp_path / "src2"), record_key="k", precombine="pre"
    )
    dst = KeyedTable(
        spark, str(tmp_path / "dst2"), record_key="k", precombine="pre"
    )
    r = _cdc_reader(spark, src, tmp_path, name="src2")
    src.upsert(_kv(spark, [(1, 100, "old")]))
    dst.apply_cdc(r.read())
    r.commit()
    src.delete(spark.createDataFrame([(1,)], "k int"))
    src.upsert(_kv(spark, [(1, 1, "new")]))
    dst.apply_cdc(r.read())
    r.commit()
    assert _state(dst) == [(1, 1, "new")] == _state(src)


def test_apply_cdc_net_effect_and_idempotence(spark, tmp_path):
    """A multi-commit window nets to final states (insert+update+delete
    of one key → net delete); re-applying the same window is a state
    no-op (the at-least-once contract)."""
    src = KeyedTable(
        spark, str(tmp_path / "src3"), record_key="k", precombine="pre"
    )
    dst = KeyedTable(
        spark, str(tmp_path / "dst3"), record_key="k", precombine="pre"
    )
    src.upsert(_kv(spark, [(1, 1, "a"), (2, 1, "b")]))
    src.upsert(_kv(spark, [(1, 2, "a2")]))
    src.delete(spark.createDataFrame([(1,)], "k int"))
    win = src.cdc()
    commits = dst.apply_cdc(win)
    assert commits  # at least the upsert commit
    assert _state(dst) == _state(src) == [(2, 1, "b")]
    # redelivery: same window again → unchanged state
    dst.apply_cdc(win)
    assert _state(dst) == [(2, 1, "b")]


def test_apply_cdc_delete_only_window(spark, tmp_path):
    src = KeyedTable(
        spark, str(tmp_path / "src4"), record_key="k", precombine="pre"
    )
    dst = KeyedTable(
        spark, str(tmp_path / "dst4"), record_key="k", precombine="pre"
    )
    r = _cdc_reader(spark, src, tmp_path, name="src4")
    src.upsert(_kv(spark, [(1, 1, "a"), (2, 1, "b")]))
    dst.apply_cdc(r.read())
    r.commit()
    src.delete(spark.createDataFrame([(1,)], "k int"))
    commits = dst.apply_cdc(r.read())
    r.commit()
    assert len(commits) == 1  # one delete commit, no upsert commit
    assert _state(dst) == [(2, 1, "b")]


def test_apply_cdc_redelivery_writes_no_commits(spark, tmp_path):
    """Commit-level idempotence: a redelivered window (crash between
    sink and reader.commit) must not rewrite the replica at all — no
    delete commit (presence-filtered) and no upsert commit (byte-equal
    rows dropped)."""
    src = KeyedTable(
        spark, str(tmp_path / "src5"), record_key="k", precombine="pre"
    )
    dst = KeyedTable(
        spark, str(tmp_path / "dst5"), record_key="k", precombine="pre"
    )
    src.upsert(_kv(spark, [(1, 1, "a"), (2, 1, "b")]))
    src.delete(spark.createDataFrame([(2,)], "k int"))
    win = src.cdc()
    assert len(dst.apply_cdc(win)) >= 1
    before_instants = dst.instants()
    assert dst.apply_cdc(win) == []  # redelivery: zero commits
    assert dst.instants() == before_instants
    assert _state(dst) == _state(src)


def test_apply_cdc_partial_replica_reborn_key_converges(spark, tmp_path):
    """Partial-payload replica: a reborn upstream key whose after-image
    carries NULL columns must NOT inherit the replica's pre-delete
    values — apply force-converges every changed present key on
    partial replicas."""
    mk = lambda name: KeyedTable(
        spark,
        str(tmp_path / name),
        record_key="k",
        precombine="pre",
        payload="partial_update",
        keep_versions=10,
    )
    src, dst = mk("psrc"), mk("pdst")
    r = _cdc_reader(spark, src, tmp_path, name="psrc")
    src.upsert(
        spark.createDataFrame(
            [(1, 1, "a", 1)], "k int, pre int, v string, n int"
        )
    )
    dst.apply_cdc(r.read())
    r.commit()
    src.delete(spark.createDataFrame([(1,)], "k int"))
    src.upsert(
        spark.createDataFrame(
            [(1, 5, None, 7)], "k int, pre int, v string, n int"
        )
    )
    dst.apply_cdc(r.read())
    r.commit()
    want = sorted(
        (r_["k"], r_["v"], r_["n"]) for r_ in src.snapshot().collect()
    )
    got = sorted(
        (r_["k"], r_["v"], r_["n"]) for r_ in dst.snapshot().collect()
    )
    assert got == want == [(1, None, 7)]


def test_incremental_bigint_commit_column_precision(spark, tmp_path):
    """r9 review fix: commit filters must compare in the COLUMN's type.
    A bigint commit column holding 17-digit ids exceeds double's
    mantissa (ulp=4 up there) — a string literal coerced both sides to
    double, collapsing commits 1-2 apart and silently dropping or
    duplicating boundary rows."""
    from sending_weekly_daily_csv_reports_from_hudi_datalake_to_customers_via_email_using_glue_and_sns_or_ses_spark.sources.incremental import (
        IncrementalReader,
    )

    base = 20260816120000000  # > 2^53: double ulp is 4 here
    path = str(tmp_path / "bigsrc")
    spark.createDataFrame(
        [(1, base), (2, base + 1), (3, base + 2)],
        "id int, commit_ts long",
    ).write.parquet(path)
    r = IncrementalReader(
        spark, "bigsrc", path,
        checkpoint_root=str(tmp_path / "ck"), commit_col="commit_ts",
    )
    first = r.read()
    assert first.count() == 3
    r.commit()
    # new rows ONE id apart from the checkpoint — indistinguishable
    # from it as doubles
    spark.createDataFrame(
        [(4, base + 3), (5, base + 4)], "id int, commit_ts long"
    ).write.mode("append").parquet(path)
    second = r.read()
    got = sorted(x["id"] for x in second.collect())
    assert got == [4, 5], got
    r.commit()
    assert r.read().count() == 0


def test_incremental_empty_keyed_root_and_empty_increment_pin(
    spark, tmp_path
):
    """r9 review fixes: an INC source over a KeyedTable root with no
    published commits gets an actionable error (or a typed empty frame
    once a schema exists), and an EMPTY increment's returned frame is
    pinned — rows committed upstream AFTER the read must not leak into
    a late evaluation of it."""
    import pytest

    from sending_weekly_daily_csv_reports_from_hudi_datalake_to_customers_via_email_using_glue_and_sns_or_ses_spark.sinks.upsert import (
        KeyedTable,
    )
    from sending_weekly_daily_csv_reports_from_hudi_datalake_to_customers_via_email_using_glue_and_sns_or_ses_spark.sources.incremental import (
        IncrementalReader,
    )

    t = KeyedTable(
        spark, str(tmp_path / "esrc"), record_key="k", precombine="pre"
    )
    r = IncrementalReader(
        spark, "esrc", t.root, checkpoint_root=str(tmp_path / "eck")
    )
    with pytest.raises(ValueError, match="no published commits"):
        r.read()
    t.upsert(spark.createDataFrame([(1, 1, "a")], "k int, pre int, v string"))
    assert r.read().count() == 1
    r.commit()
    # empty increment, held lazily
    empty = r.read()
    # upstream commits AFTER the read; the held frame must stay empty
    t.upsert(spark.createDataFrame([(2, 1, "b")], "k int, pre int, v string"))
    assert empty.count() == 0
    r.commit()  # no-op (nothing staged)
    assert sorted(
        x["k"] for x in r.read().collect()
    ) == [2]  # the late commit arrives in ITS OWN window, exactly once
