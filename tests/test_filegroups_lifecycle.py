"""BucketedTable lifecycle: P9 OCC multi-writer + P6b savepoint /
restore / rollback on the manifest engine (r11, VERDICT r10 #1/#6).

The protocol mirrors KeyedTable's (sinks/concurrency.py emulating the
reference's generate_hudi_table.py:174-175 optimistic concurrency +
lock provider), with conflict detection at Hudi's own OCC unit for
this engine: FILE-GROUP buckets, not record keys. Load-bearing claims:
  * concurrent writers on DISJOINT bucket sets both commit — the
    later one rebases onto the now-current manifest under the lock;
  * OVERLAPPING bucket sets conflict deterministically
    (CommitConflictError names the buckets' unit), retry converges;
  * whole-table ops (overwrite/alter) conflict with everything;
  * conflict detection works against pre-r11 manifests (no recorded
    ``touched`` field — derived by slice-map diff);
  * a savepoint pins its manifest's slice set against the cleaner;
    restore republishes an older manifest (one pointer flip) and
    reaps everything beyond it; rollback drops the trailing commit;
  * a restore past a CDCReader's checkpoint RAISES on the reader's
    next read (both engines) — never a silent skipped window.
"""

from __future__ import annotations

import json
import os
import threading

import pytest
from pyspark.sql import functions as F

from sending_weekly_daily_csv_reports_from_hudi_datalake_to_customers_via_email_using_glue_and_sns_or_ses_spark import (
    fixtures,
)
from sending_weekly_daily_csv_reports_from_hudi_datalake_to_customers_via_email_using_glue_and_sns_or_ses_spark.sinks.concurrency import (
    CommitConflictError,
    InProcessLockProvider,
    LockAcquireTimeout,
)
from sending_weekly_daily_csv_reports_from_hudi_datalake_to_customers_via_email_using_glue_and_sns_or_ses_spark.sinks.filegroups import (
    BucketedTable,
)
from sending_weekly_daily_csv_reports_from_hudi_datalake_to_customers_via_email_using_glue_and_sns_or_ses_spark.sinks.upsert import (
    KeyedTable,
)


def _kv_df(spark, rows):
    return spark.createDataFrame(rows, "k int, pre int, v string")


def _btable(spark, tmp_path, name="b", **kw):
    kw.setdefault("num_buckets", 8)
    kw.setdefault("keep_versions", 10)
    return BucketedTable(
        spark, str(tmp_path / name), record_key="k", precombine="pre", **kw
    )


# -- P9: OCC multi-writer ------------------------------------------------


def test_bucketed_occ_conflict_on_overlapping_buckets(spark, tmp_path):
    """A writer whose base instant predates a concurrent commit with an
    overlapping BUCKET set gets CommitConflictError (message names the
    file-group unit); a retry with a fresh base succeeds and the
    precombine merge applies."""
    lock = InProcessLockProvider()
    root = str(tmp_path / "occ")
    a = _btable(spark, tmp_path, "occ", lock_provider=lock)
    a.upsert(_kv_df(spark, [(k, 1, f"a{k}") for k in range(10)]))

    base = a.latest_commit()
    incoming = _kv_df(spark, [(k, 3, f"new{k}") for k in range(10)])
    b = BucketedTable.open(spark, root, lock_provider=lock)
    b.upsert(_kv_df(spark, [(0, 2, "b0"), (1, 2, "b1")]))

    with pytest.raises(CommitConflictError, match="file-group bucket"):
        with a._txn():
            a._check_conflict(base, set(a._touched_buckets(incoming)))

    a.upsert(incoming)  # fresh base: no conflict
    snap = {r["k"]: (r["pre"], r["v"]) for r in a.snapshot().collect()}
    assert snap == {k: (3, f"new{k}") for k in range(10)}


def test_bucketed_occ_disjoint_buckets_rebase(spark, tmp_path):
    """Concurrent commits on DISJOINT bucket sets are not conflicts —
    the stale-base writer passes the check and rebases onto the
    now-current manifest, so both writes survive."""
    lock = InProcessLockProvider()
    root = str(tmp_path / "occ2")
    a = _btable(spark, tmp_path, "occ2", lock_provider=lock)
    # split a key range into two disjoint BUCKET sets by actual routing
    keys = list(range(40))
    frame = _kv_df(spark, [(k, 1, f"v{k}") for k in keys])
    routed = {
        r["k"]: r["b"]
        for r in frame.select(
            "k", a._bucket_expr().alias("b")
        ).collect()
    }
    buckets = sorted(set(routed.values()))
    assert len(buckets) >= 2, "need at least two buckets to split"
    low_set = set(buckets[: len(buckets) // 2])
    low = [k for k in keys if routed[k] in low_set]
    high = [k for k in keys if routed[k] not in low_set]

    a.upsert(_kv_df(spark, [(k, 1, f"v{k}") for k in low]))
    base = a.latest_commit()
    b = BucketedTable.open(spark, root, lock_provider=lock)
    b.upsert(_kv_df(spark, [(k, 1, f"v{k}") for k in high]))

    more_low = _kv_df(spark, [(low[0], 5, "rebased")])
    with a._txn():
        a._check_conflict(base, set(a._touched_buckets(more_low)))
    a.upsert(more_low)
    snap = {r["k"]: r["v"] for r in a.snapshot().collect()}
    assert len(snap) == 40  # both concurrent writes survived
    assert snap[low[0]] == "rebased"
    assert snap[high[0]] == f"v{high[0]}"


def test_bucketed_occ_whole_table_commit_conflicts(spark, tmp_path):
    """An overwrite (whole-table replace) conflicts with ANY in-flight
    transaction, regardless of bucket overlap."""
    lock = InProcessLockProvider()
    root = str(tmp_path / "occ3")
    a = _btable(spark, tmp_path, "occ3", lock_provider=lock)
    a.upsert(_kv_df(spark, [(k, 1, "x") for k in range(6)]))
    base = a.latest_commit()
    b = BucketedTable.open(spark, root, lock_provider=lock)
    b.overwrite(_kv_df(spark, [(99, 1, "replaced")]))
    with pytest.raises(CommitConflictError, match="no key/bucket manifest"):
        with a._txn():
            # ANY bucket set conflicts with the published overwrite
            a._check_conflict(base, {0})


def test_bucketed_occ_threaded_writers_serialize(spark, tmp_path):
    """Three threads upserting through a shared lock via the PUBLIC
    API: unique commit ids, all keys land, retry-on-conflict
    converges, and the largest precombine wins everywhere."""
    lock = InProcessLockProvider()
    root = str(tmp_path / "occ4")
    _btable(spark, tmp_path, "occ4", lock_provider=lock)
    commits, errors = [], []

    def writer(batch: int) -> None:
        t = BucketedTable.open(spark, root, lock_provider=lock)
        df = _kv_df(spark, [(k, batch, f"b{batch}.{k}") for k in range(15)])
        for _ in range(6):  # retry loop — the documented OCC contract
            try:
                commits.append(t.upsert(df))
                return
            except CommitConflictError:
                continue
        errors.append(f"batch {batch} never committed")

    threads = [threading.Thread(target=writer, args=(i,)) for i in (1, 2, 3)]
    for th in threads:
        th.start()
    for th in threads:
        th.join()
    assert not errors
    assert len(commits) == 3 and len(set(commits)) == 3
    final = BucketedTable.open(spark, root)
    snap = {r["k"]: r["pre"] for r in final.snapshot().collect()}
    assert snap == {k: 3 for k in range(15)}
    # manifest chain is consistent: every commit's touched set recorded
    for c in final.commits():
        assert final._manifest(c)["touched"] is not None


def test_bucketed_occ_pre_r11_manifest_slice_diff(spark, tmp_path):
    """Conflict detection against a manifest WITHOUT the recorded
    ``touched`` field (pre-r11 vintage): the bucket set is derived by
    diffing its slice map against its predecessor's."""
    lock = InProcessLockProvider()
    t = _btable(spark, tmp_path, "occ5", lock_provider=lock)
    t.upsert(_kv_df(spark, [(k, 1, "x") for k in range(10)]))
    base = t.latest_commit()
    c2 = t.upsert(_kv_df(spark, [(0, 2, "y")]))
    # strip the touched field — simulate an old-format manifest
    mpath = t._manifest_path(c2)
    with open(mpath) as f:
        doc = json.load(f)
    doc.pop("touched")
    with open(mpath, "w") as f:
        json.dump(doc, f)
    touched_c2 = t._touched_of(c2, base)
    assert touched_c2 == set(
        t._touched_buckets(_kv_df(spark, [(0, 2, "y")]))
    )
    with pytest.raises(CommitConflictError):
        with t._txn():
            t._check_conflict(base, touched_c2)


def test_bucketed_lock_timeout(spark, tmp_path):
    """A held table lock times out the next writer with
    LockAcquireTimeout (not a silent unlocked write)."""
    lock = InProcessLockProvider()
    t = _btable(
        spark, tmp_path, "occ6", lock_provider=lock, lock_timeout_s=0.3
    )
    assert lock.try_lock(timeout_s=1)  # an outside holder
    try:
        with pytest.raises(LockAcquireTimeout):
            t.upsert(_kv_df(spark, [(1, 1, "a")]))
    finally:
        lock.unlock()
    t.upsert(_kv_df(spark, [(1, 1, "a")]))  # released → lands


def test_bucketed_occ_orphan_manifest_reaped(spark, tmp_path):
    """A crashed writer's beyond-pointer debris (manifest + slice dir
    with a future commit id) is reaped by the next transaction and
    never adopted into the timeline."""
    t = _btable(spark, tmp_path, "occ7")
    c1 = t.upsert(_kv_df(spark, [(1, 1, "a")]))
    ghost = str(int(c1) + 10_000)
    mdir = os.path.join(t.root, "manifests")
    with open(os.path.join(mdir, f"{ghost}.json"), "w") as f:
        json.dump({"op": "upsert", "slices": {}, "touched": []}, f)
    sdir = os.path.join(t.root, "slices", "b=0", f"v={ghost}")
    os.makedirs(sdir)
    c2 = t.upsert(_kv_df(spark, [(2, 1, "b")]))
    assert t.commits() == [c1, c2]
    assert not os.path.exists(os.path.join(mdir, f"{ghost}.json"))
    assert not os.path.isdir(sdir)


# -- P6b: savepoint / restore / rollback ---------------------------------


def test_bucketed_savepoint_protects_history_from_cleaner(spark, tmp_path):
    """keep_versions=1 with churn on the SAME buckets would normally
    clean every old slice; a savepoint keeps its instant readable
    (time travel) and restorable forever."""
    t = _btable(spark, tmp_path, "sp", keep_versions=1)
    t.upsert(_kv_df(spark, [(1, 1, "a")]))
    sp = t.upsert(_kv_df(spark, [(2, 1, "b")]))
    t.savepoint(sp, name="weekly")
    for i in range(4):  # churn rewrites the same buckets
        t.upsert(_kv_df(spark, [(1, 10 + i, f"x{i}"), (2, 10 + i, f"y{i}")]))
    assert t.savepoints()[sp]["name"] == "weekly"
    state = sorted((r["k"], r["v"]) for r in t.snapshot(as_of=sp).collect())
    assert state == [(1, "a"), (2, "b")]
    t.restore(sp)
    assert t.latest_commit() == sp
    assert sorted(
        (r["k"], r["v"]) for r in t.snapshot().collect()
    ) == [(1, "a"), (2, "b")]


def test_bucketed_savepoint_validation(spark, tmp_path):
    t = _btable(spark, tmp_path, "spv")
    with pytest.raises(ValueError, match="empty"):
        t.savepoint()
    c1 = t.upsert(_kv_df(spark, [(1, 1, "a")]))
    with pytest.raises(ValueError, match="unknown instant"):
        t.savepoint("19990101000000000")
    t.savepoint()  # defaults to latest
    assert list(t.savepoints()) == [c1]
    t.delete_savepoint(c1)
    assert t.savepoints() == {}
    with pytest.raises(ValueError, match="no savepoint"):
        t.delete_savepoint(c1)


def test_bucketed_restore_truncates_history(spark, tmp_path):
    """Restore drops every newer commit from EVERY read path —
    snapshot, commits, the incremental log stream, CDC — reaps the
    orphaned manifests/slices/logs, and the table continues from the
    restored instant."""
    t = _btable(spark, tmp_path, "rt")
    t.upsert(_kv_df(spark, [(1, 1, "a")]))
    c2 = t.upsert(_kv_df(spark, [(2, 1, "b")]))
    c3 = t.upsert(_kv_df(spark, [(1, 9, "a-new"), (3, 1, "c")]))
    t.delete(spark.createDataFrame([(2,)], "k int"))
    t.savepoint(c3)
    t.restore(c2)
    assert t.latest_commit() == c2
    assert t.commits() == t.commits()[:2]
    assert sorted(
        (r["k"], r["v"]) for r in t.snapshot().collect()
    ) == [(1, "a"), (2, "b")]
    assert t.log().select("_commit_time").distinct().count() == 2
    assert t.cdc().count() == 2  # two inserts
    assert t.savepoints() == {}  # dangling savepoint removed
    # orphans reaped from disk, not just hidden
    assert not os.path.exists(t._manifest_path(c3))
    assert not any(
        v.startswith("v=") and v[2:] > c2
        for b in os.listdir(os.path.join(t.root, "slices"))
        for v in os.listdir(os.path.join(t.root, "slices", b))
    )
    # table remains writable; restore to an unknown instant refuses
    t.upsert(_kv_df(spark, [(4, 1, "d")]))
    assert sorted(r["k"] for r in t.snapshot().collect()) == [1, 2, 4]
    with pytest.raises(ValueError, match="unknown instant"):
        t.restore("19990101000000000")


def test_bucketed_rollback_last_commit_and_to_empty(spark, tmp_path):
    t = _btable(spark, tmp_path, "rb")
    c1 = t.upsert(_kv_df(spark, [(1, 1, "a")]))
    t.upsert(_kv_df(spark, [(2, 1, "b")]))
    assert t.rollback() == c1
    assert sorted(r["k"] for r in t.snapshot().collect()) == [1]
    assert t.rollback() is None
    assert t.snapshot() is None
    assert t.commits() == []
    assert t.rollback() is None  # idempotent on empty
    t.upsert(_kv_df(spark, [(5, 1, "e")]))  # fresh history accepted
    assert sorted(r["k"] for r in t.snapshot().collect()) == [5]


def test_bucketed_restore_cleaned_instant_refuses(spark, tmp_path):
    """Restore to an instant whose slices the cleaner already removed
    raises the retained-history message instead of publishing a
    manifest that cannot be read."""
    t = _btable(spark, tmp_path, "rc", keep_versions=1)
    c1 = t.upsert(_kv_df(spark, [(1, 1, "a")]))
    for i in range(3):  # churn the same bucket: c1's slice gets cleaned
        t.upsert(_kv_df(spark, [(1, 2 + i, f"x{i}")]))
    with pytest.raises(ValueError, match="cleaner"):
        t.restore(c1)
    # the failed restore mutated nothing
    assert t.snapshot().collect()[0]["v"] == "x2"


def test_bucketed_restore_then_overwrite_and_cdc(spark, tmp_path):
    """Lifecycle ops compose after a restore: overwrite replaces the
    restored state, its replace marker publishes, and CDC across the
    boundary keeps the documented overwrite rail."""
    t = _btable(spark, tmp_path, "ro")
    t.upsert(_kv_df(spark, [(1, 1, "a")]))
    c2 = t.upsert(_kv_df(spark, [(2, 1, "b")]))
    t.upsert(_kv_df(spark, [(3, 1, "c")]))
    t.restore(c2)
    t.overwrite(_kv_df(spark, [(9, 1, "z")]))
    assert sorted(r["k"] for r in t.snapshot().collect()) == [9]
    # the replace marker exists for the post-restore overwrite commit
    latest = t.latest_commit()
    assert os.path.exists(
        os.path.join(t.root, "replaces", f"{latest}.json")
    )


@pytest.mark.parametrize("engine", ["keyed", "bucketed"])
def test_cdc_reader_raises_after_restore_past_checkpoint(
    spark, tmp_path, engine
):
    """A restore/rollback past a CDCReader's committed checkpoint makes
    the reader's next read RAISE (documented caveat) — silent None
    would let the consumer fold windows that skip the rewound range.
    reset() + re-read recovers. Both engines share the contract."""
    from sending_weekly_daily_csv_reports_from_hudi_datalake_to_customers_via_email_using_glue_and_sns_or_ses_spark.sources.incremental import (
        CDCReader,
    )

    root = str(tmp_path / engine)
    if engine == "keyed":
        t = KeyedTable(spark, root, record_key="k", precombine="pre")
    else:
        t = BucketedTable(
            spark, root, record_key="k", precombine="pre", num_buckets=4
        )
    c1 = t.upsert(_kv_df(spark, [(1, 1, "a")]))
    t.upsert(_kv_df(spark, [(2, 1, "b")]))
    t.upsert(_kv_df(spark, [(3, 1, "c")]))

    reader = CDCReader(
        spark, f"{engine}-tbl", root,
        checkpoint_root=str(tmp_path / "ckpt"),
    )
    win = reader.read()
    assert win.count() == 3
    reader.commit()
    assert reader.read() is None  # caught up

    t.restore(c1)
    with pytest.raises(ValueError, match="restored/rolled back"):
        reader.read()
    reader.reset()
    win = reader.read()  # re-seed from scratch: full replay of survivors
    assert sorted(r["k"] for r in win.collect()) == [1]
    reader.commit()
    assert reader.read() is None


@pytest.mark.parametrize("engine", ["keyed", "bucketed"])
def test_cdc_reader_raises_after_restore_even_with_new_commits(
    spark, tmp_path, engine
):
    """r11 review: a restore past the checkpoint FOLLOWED by a fresh
    commit moves the pointer ahead of the checkpoint again (commit ids
    are wall-clock) — the reader must still raise, via the timeline-
    membership check, not hand out a window seeded from the rewound
    state."""
    from sending_weekly_daily_csv_reports_from_hudi_datalake_to_customers_via_email_using_glue_and_sns_or_ses_spark.sources.incremental import (
        CDCReader,
    )

    root = str(tmp_path / f"rn{engine}")
    if engine == "keyed":
        t = KeyedTable(spark, root, record_key="k", precombine="pre")
    else:
        t = BucketedTable(
            spark, root, record_key="k", precombine="pre", num_buckets=4
        )
    c1 = t.upsert(_kv_df(spark, [(1, 1, "a")]))
    t.upsert(_kv_df(spark, [(2, 1, "b")]))
    reader = CDCReader(
        spark, f"rn-{engine}", root,
        checkpoint_root=str(tmp_path / "ck"),
    )
    reader.read()
    reader.commit()  # checkpoint at c2
    t.restore(c1)
    t.upsert(_kv_df(spark, [(3, 1, "c")]))  # pointer moves AHEAD again
    with pytest.raises(ValueError, match="restored/rolled back"):
        reader.read()
    reader.reset()
    win = reader.read()
    assert sorted(r["k"] for r in win.collect()) == [1, 3]


# -- r11: bucket rescale --------------------------------------------------


def _routed_buckets(t, df):
    return set(t._touched_buckets(df.select("k")))


def test_rescale_preserves_state_and_routing(spark, tmp_path):
    """rescale_buckets rewrites the live state under the new count:
    snapshot identical (per-row _commit_time included), later upserts
    merge correctly under the new routing, point lookups prune to the
    NEW buckets, and time travel across the boundary routes by each
    manifest's own pinned count."""
    import re

    t = _btable(spark, tmp_path, "rs", num_buckets=4)
    c1 = t.upsert(_kv_df(spark, [(k, 1, f"a{k}") for k in range(40)]))
    c2 = t.upsert(_kv_df(spark, [(0, 2, "updated")]))
    before = sorted(
        (r["k"], r["pre"], r["v"], r["_commit_time"])
        for r in t.snapshot().collect()
    )
    rc = t.rescale_buckets(16)
    assert rc is not None and t.num_buckets == 16
    after = sorted(
        (r["k"], r["pre"], r["v"], r["_commit_time"])
        for r in t.snapshot().collect()
    )
    assert after == before  # a rescale changes NO data

    # later upsert merges against the re-routed existing row
    t.upsert(_kv_df(spark, [(0, 1, "stale"), (0, 3, "wins")]))
    snap = {r["k"]: r["v"] for r in t.snapshot().collect()}
    assert snap[0] == "wins" and len(snap) == 40

    # point lookup prunes under the NEW count
    probe = spark.createDataFrame([(7,)], "k int")
    got = t.read_keys(probe)
    assert [r["k"] for r in got.collect()] == [7]
    buckets = {
        int(m.group(1))
        for f in got.inputFiles()
        for m in [re.search(r"/b=(\d+)/", f)]
        if m
    }
    assert buckets <= _routed_buckets(t, probe)

    # time travel BEFORE the rescale: snapshot + routed lookup both
    # use the pinned manifest (old slices, old count)
    old_snap = {r["k"]: r["v"] for r in t.snapshot(as_of=c2).collect()}
    assert old_snap[0] == "updated"
    got_old = t.read_keys(probe, as_of=c1)
    assert [r["k"] for r in got_old.collect()] == [7]
    old_buckets = {
        int(m.group(1))
        for f in got_old.inputFiles()
        for m in [re.search(r"/b=(\d+)/", f)]
        if m
    }
    assert old_buckets and max(old_buckets) < 4  # routed by the OLD count


def test_rescale_is_cdc_noop_and_conflicts_with_writers(spark, tmp_path):
    """A rescale commit emits NOTHING on the CDC stream (no data
    changed), and under OCC it is a whole-table op: a stale-base
    writer conflicts with it and lands on retry under the new
    routing."""
    lock = InProcessLockProvider()
    t = _btable(spark, tmp_path, "rsc", num_buckets=4, lock_provider=lock)
    t.upsert(_kv_df(spark, [(k, 1, "x") for k in range(10)]))
    d1 = t.latest_commit()
    base = d1
    rc = t.rescale_buckets(8)
    # CDC window spanning the rescale: zero ops for its instant
    win = t.cdc(begin=d1)
    assert win is None or win.count() == 0
    t.upsert(_kv_df(spark, [(3, 2, "y")]))
    win2 = {
        (r["k"], r["_commit_time"]) for r in t.cdc(begin=d1).collect()
    }
    assert all(c != rc for _, c in win2)
    # stale-base writer conflicts with the published rescale
    with pytest.raises(CommitConflictError):
        with t._txn():
            t._check_conflict(base, {0})


def test_rescale_stale_meta_heals(spark, tmp_path):
    """Crash window: rescale published but _table.json not yet
    updated. A fresh open() under the stale cached count must adopt
    the manifest's count at its first transaction and route
    correctly — no duplicate keys across buckets."""
    t = _btable(spark, tmp_path, "rsh", num_buckets=4)
    t.upsert(_kv_df(spark, [(k, 1, "x") for k in range(20)]))
    t.rescale_buckets(16)
    # simulate the crash: force the META back to the old count
    mp = os.path.join(t.root, "_table.json")
    with open(mp) as f:
        meta = json.load(f)
    meta["num_buckets"] = 4
    with open(mp, "w") as f:
        json.dump(meta, f)

    re = BucketedTable.open(spark, t.root)
    assert re.num_buckets == 4  # stale cache adopted at open ...
    re.upsert(_kv_df(spark, [(5, 2, "updated")]))  # ... healed in-txn
    assert re.num_buckets == 16
    snap = [
        (r["k"], r["v"]) for r in re.snapshot().collect() if r["k"] == 5
    ]
    assert snap == [(5, "updated")]  # merged, not duplicated
    with open(mp) as f:
        assert json.load(f)["num_buckets"] == 16  # cache healed on disk


def test_rescale_validation_and_noop(spark, tmp_path):
    t = _btable(spark, tmp_path, "rsv", num_buckets=4)
    with pytest.raises(ValueError, match=">= 1"):
        t.rescale_buckets(0)
    assert t.rescale_buckets(4) is None  # same count: no commit
    # empty table: count repoints without a commit
    assert t.rescale_buckets(8) is None
    assert t.num_buckets == 8 and t.commits() == []
    t.upsert(_kv_df(spark, [(1, 1, "a")]))
    assert t._manifest(t.latest_commit())["num_buckets"] == 8


def test_rescale_interacts_with_restore_and_cleaner(spark, tmp_path):
    """Restore to a pre-rescale instant republishes the old manifest —
    the old count becomes authoritative again; the cleaner keeps
    pre-rescale slices while retained manifests reference them."""
    t = _btable(spark, tmp_path, "rsr", num_buckets=4, keep_versions=10)
    t.upsert(_kv_df(spark, [(k, 1, "x") for k in range(12)]))
    c1 = t.latest_commit()
    t.rescale_buckets(8)
    t.upsert(_kv_df(spark, [(1, 2, "y")]))
    t.restore(c1)
    assert t.latest_commit() == c1
    # next transaction adopts the restored manifest's count
    t.upsert(_kv_df(spark, [(2, 2, "z")]))
    assert t.num_buckets == 4
    snap = {r["k"]: r["v"] for r in t.snapshot().collect()}
    assert snap[1] == "x" and snap[2] == "z" and len(snap) == 12
