"""BucketedTable: Hudi bucket-index COW with file groups (SURVEY.md
§2.5 P7 made mechanical — bounded write amplification).

The load-bearing claims, each tested directly:
  * P1/P2 merge parity with KeyedTable (shared payloads) — snapshots of
    both engines agree over a seeded random upsert/delete history;
  * a commit rewrites ONLY the file groups its batch touches
    (write-amplification bound, asserted on slice dirs AND stats());
  * point lookups scan only the probed keys' buckets (inputFiles);
  * time travel reads old manifests without any delete rail;
  * the slice-granular cleaner keeps carry-forward slices alive while
    retained manifests reference them, and raises clearly past history;
  * schema evolution rewrites only touched slices; snapshot mergeSchema
    unions across slice schema versions.
"""

from __future__ import annotations

import os
import random

import pytest
from pyspark.sql import functions as F

from sending_weekly_daily_csv_reports_from_hudi_datalake_to_customers_via_email_using_glue_and_sns_or_ses_spark import (
    fixtures,
)
from sending_weekly_daily_csv_reports_from_hudi_datalake_to_customers_via_email_using_glue_and_sns_or_ses_spark.sinks.filegroups import (
    BucketedTable,
)
from sending_weekly_daily_csv_reports_from_hudi_datalake_to_customers_via_email_using_glue_and_sns_or_ses_spark.sinks.upsert import (
    KeyedTable,
)


@pytest.fixture()
def btable(spark, tmp_path):
    return BucketedTable(
        spark,
        str(tmp_path / "bucketed"),
        record_key="customer_id",
        precombine="created_at",
        num_buckets=8,
    )


def _sorted_rows(df, cols=None):
    cols = cols or [c for c in df.columns if c != "_commit_time"]
    return sorted(
        tuple(r) for r in df.select(*sorted(cols)).collect()
    )


def test_first_upsert_then_merge(spark, btable):
    btable.upsert(fixtures.customers(spark, 20))
    snap = btable.snapshot()
    assert snap.count() == 20
    # newer batch wins on precombine
    btable.upsert(fixtures.customers(spark, 10, batch=1))
    snap = btable.snapshot()
    assert snap.count() == 20
    newer = snap.filter(F.col("created_at") >= "2024-01-02").count()
    assert newer == 10


def test_upsert_touches_only_routed_buckets(spark, tmp_path):
    t = BucketedTable(
        spark,
        str(tmp_path / "t"),
        record_key="customer_id",
        precombine="created_at",
        num_buckets=16,
    )
    c0 = t.upsert(fixtures.customers(spark, 200))
    # pick keys that all route to ONE bucket, via the engine's own
    # routing expression (driver-side recompute would have to clone it)
    routed = (
        fixtures.customers(spark, 200)
        .select("customer_id", t._bucket_expr().alias("b"))
        .collect()
    )
    target = routed[0]["b"]
    one_bucket_keys = [r["customer_id"] for r in routed if r["b"] == target]
    assert len(one_bucket_keys) >= 2
    batch = fixtures.customers(spark, 200, batch=2).filter(
        F.col("customer_id").isin(one_bucket_keys)
    )
    c1 = t.upsert(batch)
    # exactly one new slice dir for this commit
    slices_dir = tmp_path / "t" / "slices"
    new_slices = [
        (b.name, v.name)
        for b in slices_dir.iterdir()
        for v in b.iterdir()
        if v.name == f"v={c1}"
    ]
    assert new_slices == [(f"b={target}", f"v={c1}")]
    st = t.stats()
    assert st["commits"][c1]["touched_groups"] == 1
    assert st["commits"][c0]["touched_groups"] == 16
    # bytes written for the small commit are a fraction of the load
    assert (
        st["commits"][c1]["bytes_written"]
        < st["commits"][c0]["bytes_written"] / 4
    )
    # and the merge is correct: updated rows newer, count unchanged
    snap = t.snapshot()
    assert snap.count() == 200
    assert (
        snap.filter(F.col("customer_id").isin(one_bucket_keys))
        .filter(F.col("created_at") >= "2024-01-03")
        .count()
        == len(one_bucket_keys)
    )


def test_point_lookup_prunes_to_buckets(spark, tmp_path):
    t = BucketedTable(
        spark,
        str(tmp_path / "t"),
        record_key="customer_id",
        precombine="created_at",
        num_buckets=16,
    )
    t.upsert(fixtures.customers(spark, 500))
    probe = spark.createDataFrame(
        [("cust-7",), ("cust-123",)], ["customer_id"]
    )
    got = t.read_keys(probe)
    assert got.count() == 2
    # the scan read at most 2 of 16 buckets' files
    touched_dirs = {os.path.dirname(f) for f in got.inputFiles()}
    assert len(touched_dirs) <= 2
    all_files = t.snapshot().inputFiles()
    assert len({os.path.dirname(f) for f in all_files}) == 16


@pytest.mark.slow
def test_parity_with_keyed_table_random_history(spark, tmp_path):
    """Seeded random upsert/delete history applied to both engines →
    identical live state after every commit, and identical time-travel
    states for the retained window."""
    rng = random.Random(74)
    kt = KeyedTable(
        spark,
        str(tmp_path / "kt"),
        record_key="customer_id",
        precombine="created_at",
        keep_versions=50,
    )
    bt = BucketedTable(
        spark,
        str(tmp_path / "bt"),
        record_key="customer_id",
        precombine="created_at",
        num_buckets=4,
        keep_versions=50,
    )
    for step in range(6):
        if step and rng.random() < 0.4:
            doomed = [f"cust-{rng.randrange(40)}" for _ in range(5)]
            keys = spark.createDataFrame(
                [(k,) for k in doomed], ["customer_id"]
            )
            kt.delete(keys)
            bt.delete(keys)
        else:
            n = rng.randrange(5, 40)
            batch = fixtures.customers(spark, n, batch=step)
            kt.upsert(batch)
            bt.upsert(batch)
        ks, bs = kt.snapshot(), bt.snapshot()
        cols = [c for c in ks.columns if c != "_commit_time"]
        assert _sorted_rows(ks, cols) == _sorted_rows(bs, cols)
    # time travel: bucketed as_of agrees with keyed as_of at every
    # retained bucketed commit (commit ids differ between the tables,
    # so align by ordinal)
    kcommits, bcommits = kt.commits(), bt.commits()
    assert len(kcommits) == len(bcommits)
    for kc, bc in zip(kcommits, bcommits):
        ks, bs = kt.snapshot(as_of=kc), bt.snapshot(as_of=bc)
        cols = [c for c in ks.columns if c != "_commit_time"]
        assert _sorted_rows(ks, cols) == _sorted_rows(bs, cols)


def test_delete_all_rows_leaves_empty_snapshot(spark, btable):
    btable.upsert(fixtures.customers(spark, 10))
    keys = fixtures.customers(spark, 10).select("customer_id")
    btable.delete(keys)
    snap = btable.snapshot()
    assert snap.count() == 0
    assert "customer_id" in snap.columns  # committed schema retained


def test_cleaner_keeps_carry_forward_slices(spark, tmp_path):
    """A slice untouched for many commits must survive the cleaner as
    long as a retained manifest references it; a slice referenced only
    by evicted manifests must go, and reading past retained history
    must raise the clear message."""
    t = BucketedTable(
        spark,
        str(tmp_path / "t"),
        record_key="customer_id",
        precombine="created_at",
        num_buckets=16,
        keep_versions=2,
    )
    c0 = t.upsert(fixtures.customers(spark, 200))
    routed = (
        fixtures.customers(spark, 200)
        .select("customer_id", t._bucket_expr().alias("b"))
        .collect()
    )
    target = routed[0]["b"]
    hot = [r["customer_id"] for r in routed if r["b"] == target]
    commits = [c0]
    for i in range(3):
        batch = fixtures.customers(spark, 200, batch=i + 1).filter(
            F.col("customer_id").isin(hot)
        )
        commits.append(t.upsert(batch))
    # untouched groups still read from the c0 slices — carried forward
    snap = t.snapshot()
    assert snap.count() == 200
    assert any(f"v={c0}" in f for f in snap.inputFiles())
    # the hot bucket's INTERMEDIATE slices are gone (only the last
    # keep_versions=2 manifests' references survive)
    hot_dir = tmp_path / "t" / "slices" / f"b={target}"
    versions = sorted(v.name for v in hot_dir.iterdir())
    assert versions == [f"v={commits[-2]}", f"v={commits[-1]}"]
    # time travel into evicted history raises the retained-history error
    with pytest.raises(ValueError, match="cleaner"):
        t.snapshot(as_of=commits[1]).count()
    # within retained history it works
    assert t.snapshot(as_of=commits[-2]).count() == 200


def test_schema_evolution_touches_only_written_slices(spark, tmp_path):
    t = BucketedTable(
        spark,
        str(tmp_path / "t"),
        record_key="customer_id",
        precombine="created_at",
        num_buckets=8,
    )
    t.upsert(fixtures.customers(spark, 100))
    widened = fixtures.customers(spark, 5, batch=1).withColumn(
        "loyalty_tier", F.lit("gold")
    )
    t.upsert(widened)
    snap = t.snapshot()
    assert "loyalty_tier" in snap.columns
    assert snap.filter(F.col("loyalty_tier") == "gold").count() == 5
    # pre-evolution rows read NULL for the new column
    assert snap.filter(F.col("loyalty_tier").isNull()).count() == 95


def test_composite_key_routing(spark, tmp_path):
    t = BucketedTable(
        spark,
        str(tmp_path / "t"),
        record_key=["state", "customer_id"],
        precombine="created_at",
        num_buckets=8,
    )
    t.upsert(fixtures.customers(spark, 30))
    t.upsert(fixtures.customers(spark, 30, batch=1))
    assert t.snapshot().count() == 30
    probe = fixtures.customers(spark, 3).select("state", "customer_id")
    assert t.read_keys(probe).count() == 3


def test_open_from_meta_and_bucket_count_pinned(spark, tmp_path):
    root = str(tmp_path / "t")
    t = BucketedTable(
        spark, root, record_key="customer_id", precombine="created_at",
        num_buckets=8,
    )
    t.upsert(fixtures.customers(spark, 10))
    reopened = BucketedTable.open(spark, root)
    assert reopened.num_buckets == 8
    assert reopened.snapshot().count() == 10
    with pytest.raises(ValueError, match="num_buckets"):
        BucketedTable(
            spark, root, record_key="customer_id",
            precombine="created_at", num_buckets=16,
        )


def test_partial_update_payload(spark, tmp_path):
    t = BucketedTable(
        spark,
        str(tmp_path / "t"),
        record_key="k",
        precombine="pre",
        num_buckets=4,
        payload="partial_update",
    )
    t.upsert(
        spark.createDataFrame(
            [("a", 1, "x", 10), ("b", 1, "y", 20)], ["k", "pre", "s", "v"]
        )
    )
    # NULL column keeps existing value, non-null patches
    t.upsert(
        spark.createDataFrame(
            [("a", 2, None, 99)], "k string, pre bigint, s string, v bigint"
        )
    )
    rows = {
        r["k"]: (r["s"], r["v"]) for r in t.snapshot().collect()
    }
    assert rows == {"a": ("x", 99), "b": ("y", 20)}


def test_log_feeds_incremental_reader(spark, btable):
    from sending_weekly_daily_csv_reports_from_hudi_datalake_to_customers_via_email_using_glue_and_sns_or_ses_spark.sources.incremental import (
        read_commit_log,
    )

    c0 = btable.upsert(fixtures.customers(spark, 10))
    c1 = btable.upsert(fixtures.customers(spark, 5, batch=1))
    log = read_commit_log(spark, btable.root)
    assert log.count() == 15
    per_commit = {
        r["_commit_time"]: r["n"]
        for r in log.groupBy("_commit_time").agg(F.count("*").alias("n")).collect()
    }
    assert {str(k): v for k, v in per_commit.items()} == {c0: 10, c1: 5}


def test_overwrite_manifest_native_replace(spark, tmp_path):
    """overwrite(): the commit's manifest references ONLY the batch's
    slices — old groups vanish by omission, a lower-precombine batch
    row wins by construction, time travel stays manifest-pinned on
    both sides, and later upserts merge against the replaced state."""
    from pyspark.sql import functions as F

    t = BucketedTable(
        spark,
        str(tmp_path / "owb"),
        record_key="k",
        precombine="pre",
        num_buckets=8,
        keep_versions=10,
    )

    def df(rows):
        return spark.createDataFrame(rows, "k int, pre int, v string")

    t.upsert(df([(i, 10, f"old{i}") for i in range(20)]))
    pre_ow = t.latest_commit()
    ow = t.overwrite(df([(2, 1, "new2"), (99, 1, "new99")]))
    got = sorted(
        (r["k"], r["pre"], r["v"])
        for r in t.snapshot().select("k", "pre", "v").collect()
    )
    assert got == [(2, 1, "new2"), (99, 1, "new99")]
    # manifest holds only the touched buckets' slices
    assert all(
        c == ow for c in t._manifest(ow)["slices"].values()
    ) and len(t._manifest(ow)["slices"]) <= 2
    # time travel across the replace, both directions
    assert t.snapshot(as_of=pre_ow).count() == 20
    assert t.snapshot(as_of=ow).count() == 2
    # later upsert merges normally onto the replaced state
    t.upsert(df([(2, 5, "merged2"), (3, 5, "back3")]))
    final = sorted(
        (r["k"], r["v"]) for r in t.snapshot().select("k", "v").collect()
    )
    assert final == [(2, "merged2"), (3, "back3"), (99, "new99")]

    # predicate delete sugar
    t.delete_where(F.col("k") > 50)
    assert sorted(r["k"] for r in t.snapshot().collect()) == [2, 3]
    assert t.delete_where("k > 1000") is None or t.snapshot().count() == 2


def test_catalog_registers_bucketed_source(spark, tmp_path):
    """fmt='bucketed' in a SourceSpec serves the manifest-pinned
    snapshot through the same config surface as every other source,
    including the as.of.instant time-travel option."""
    from sending_weekly_daily_csv_reports_from_hudi_datalake_to_customers_via_email_using_glue_and_sns_or_ses_spark.catalog import (
        Catalog,
        SourceSpec,
    )

    t = BucketedTable(
        spark, str(tmp_path / "bt"), record_key="k", precombine="pre",
        num_buckets=4,
    )
    c1 = t.upsert(
        spark.createDataFrame(
            [(1, 1, 10.0), (2, 1, 20.0)], "k long, pre long, v double"
        )
    )
    t.upsert(
        spark.createDataFrame([(3, 1, 30.0)], "k long, pre long, v double")
    )
    cat = Catalog(spark)
    cat.register(SourceSpec("bt", t.root, fmt="bucketed"))
    assert spark.sql("select sum(v) as s from bt").first()["s"] == 60.0
    cat.register(
        SourceSpec(
            "bt_old", t.root, fmt="bucketed",
            options={"as.of.instant": c1},
        )
    )
    assert spark.sql("select sum(v) as s from bt_old").first()["s"] == 30.0


def test_stream_incremental_reads_bucketed_log(spark, tmp_path):
    """The streaming incremental source works over a BucketedTable root
    too — the two engines share the log/c=<commit>/ layout contract."""
    from sending_weekly_daily_csv_reports_from_hudi_datalake_to_customers_via_email_using_glue_and_sns_or_ses_spark.streaming.source import (
        stream_incremental,
    )

    t = BucketedTable(
        spark, str(tmp_path / "bts"), record_key="k", precombine="pre",
        num_buckets=4,
    )
    c1 = t.upsert(
        spark.createDataFrame([(1, 1, "a")], "k long, pre long, v string")
    )
    seen = []

    def sink(batch, _bid):
        seen.extend(
            (r["k"], r["_commit_time"])
            for r in batch.select("k", "_commit_time").collect()
        )

    q = (
        stream_incremental(spark, t.root)
        .writeStream.foreachBatch(sink)
        .option("checkpointLocation", str(tmp_path / "ck"))
        .start()
    )
    q.processAllAvailable()
    assert seen == [(1, c1)]
    c2 = t.upsert(
        spark.createDataFrame([(2, 1, "b")], "k long, pre long, v string")
    )
    q.processAllAvailable()
    assert sorted(seen) == [(1, c1), (2, c2)]
    q.stop()


def test_bucketed_type_widening_across_slices(spark, tmp_path):
    """Type widening on the bucketed engine (r8): a LONG batch widens
    an INT measure; untouched groups keep their narrow slices on disk
    and the explicit-schema read widens them at scan time — parquet
    mergeSchema cannot span int32/int64, so the committed manifest
    schema is what every slice read declares. Non-promotable changes
    raise before any slice is written."""
    import pytest
    from pyspark.sql.types import LongType

    t = BucketedTable(
        spark,
        str(tmp_path / "wb"),
        record_key="k",
        precombine="pre",
        num_buckets=4,
    )
    t.upsert(
        spark.createDataFrame(
            [(i, 1, i * 10) for i in range(12)], "k int, pre int, n int"
        )
    )
    # touches a subset of groups with a WIDER type
    t.upsert(
        spark.createDataFrame(
            [(0, 2, 4_000_000_000)], "k int, pre int, n long"
        )
    )
    snap = t.snapshot()
    assert snap.schema["n"].dataType == LongType()
    got = {r["k"]: r["n"] for r in snap.collect()}
    assert got[0] == 4_000_000_000 and got[5] == 50 and len(got) == 12
    # point lookups read mixed-vintage slices under the same schema
    probe = spark.createDataFrame([(0,), (5,)], "k int")
    assert {
        r["k"]: r["n"] for r in t.read_keys(probe).collect()
    } == {0: 4_000_000_000, 5: 50}
    # narrower follow-up batch: schema unchanged, value lands
    t.upsert(spark.createDataFrame([(5, 3, 7)], "k int, pre int, n int"))
    assert t.snapshot().schema["n"].dataType == LongType()
    assert {
        r["k"]: r["n"] for r in t.snapshot().collect()
    }[5] == 7
    # non-promotable change raises before any write
    with pytest.raises(ValueError, match="not this change"):
        t.upsert(
            spark.createDataFrame(
                [(1, 4, "oops")], "k int, pre int, n string"
            )
        )


def test_bucketed_rename_column(spark, tmp_path):
    """alter_rename_column on the bucketed engine (r9): metadata-only —
    the manifest re-references the same slices under the renamed
    schema; old slices serve the new name through the prior-name
    mapping, time travel before the rename shows the vintage name,
    the old name is reserved, and structural columns refuse."""
    import pytest

    from sending_weekly_daily_csv_reports_from_hudi_datalake_to_customers_via_email_using_glue_and_sns_or_ses_spark.sinks.filegroups import (
        BucketedTable,
    )

    t = BucketedTable(
        spark, str(tmp_path / "rn"), record_key="k", precombine="pre",
        num_buckets=4,
    )
    t.upsert(
        spark.createDataFrame(
            [(1, 1, "a", 10), (2, 1, "b", 20)],
            "k int, pre int, v string, amt int",
        )
    )
    pre_rename = t.latest_commit()
    t.alter_rename_column("v", "label")
    snap = {r["k"]: (r["label"], r["amt"]) for r in t.snapshot().collect()}
    assert snap == {1: ("a", 10), 2: ("b", 20)}
    assert "v" not in t.snapshot().columns
    # new-name writes touch only their buckets; untouched old slices
    # keep serving through the mapping
    t.upsert(
        spark.createDataFrame(
            [(1, 5, "a2", 11), (3, 1, "c", 30)],
            "k int, pre int, label string, amt int",
        )
    )
    assert {
        r["k"]: r["label"] for r in t.snapshot().collect()
    } == {1: "a2", 2: "b", 3: "c"}
    # time travel before the rename: the manifest pins the old schema
    old = t.snapshot(as_of=pre_rename)
    assert "v" in old.columns and "label" not in old.columns
    assert {r["k"]: r["v"] for r in old.collect()} == {1: "a", 2: "b"}
    # the old name cannot come back
    with pytest.raises(ValueError, match="renamed"):
        t.upsert(
            spark.createDataFrame(
                [(4, 1, "x", 40)], "k int, pre int, v string, amt int"
            )
        )
    with pytest.raises(ValueError, match="already in use"):
        t.alter_rename_column("amt", "v")
    for col in ("k", "pre"):
        with pytest.raises(ValueError, match="structural"):
            t.alter_rename_column(col, "zz")
    # point lookups route through the mapping too
    got = t.read_keys(spark.createDataFrame([(2,)], "k int")).collect()
    assert [(r["k"], r["label"]) for r in got] == [(2, "b")]
    # reopen survives
    reopened = BucketedTable.open(spark, t.root)
    assert {
        r["k"]: r["label"] for r in reopened.snapshot().collect()
    } == {1: "a2", 2: "b", 3: "c"}


# -- data-skipping indexes (r10, VERDICT r9 #5) ---------------------------


def _mk_skipping_table(spark, tmp_path, **kw):
    return BucketedTable(
        spark,
        str(tmp_path / "skip"),
        record_key="k",
        precombine="pre",
        num_buckets=8,
        **kw,
    )


SKIP_S = "k int, pre int, ts long, uid string, amount long"


def _skip_rows(spark, keys, ts_lo, step, tag):
    return spark.createDataFrame(
        [
            (k, step, ts_lo + (k % 50), f"{tag}-{k}", k * 10)
            for k in keys
        ],
        SKIP_S,
    )


@pytest.mark.slow
def test_bucketed_colstats_skipping_equivalence_and_pruning(
    spark, tmp_path
):
    """The realistic bucketed-stats win: a time-range predicate on a
    table where only SOME buckets got recent writes — untouched
    buckets' carried-forward slices have max(ts) below the range and
    are pruned from the manifest alone; touched buckets survive. The
    read must equal the full snapshot + filter exactly."""
    t = _mk_skipping_table(spark, tmp_path, stats_cols=["ts"])
    # batch 1: every key, old timestamps (ts in [0, 50))
    t.upsert(_skip_rows(spark, range(200), 0, 0, "a"))
    c1 = t.latest_commit()
    # batch 2: THREE keys, recent timestamps (ts >= 1000) — touches at
    # most 3 of 8 buckets; the rest carry their batch-1 stats forward
    t.upsert(_skip_rows(spark, [5, 6, 7], 1000, 1, "b"))

    df, report = t.snapshot_where({"ts": (1000, None)}, with_report=True)
    expected = t.snapshot().where(F.col("ts") >= 1000)
    assert _sorted_rows(df) == _sorted_rows(expected)
    assert report["indexed"]
    assert report["n_kept"] < report["n_slices"], report
    assert report["n_kept"] <= 3

    # equivalence on a range that keeps everything
    df2 = t.snapshot_where({"ts": (0, None)})
    assert df2.count() == t.snapshot().count()

    # time travel: as of c1 every slice is old → the range keeps none
    df3, rep3 = t.snapshot_where(
        {"ts": (1000, None)}, as_of=c1, with_report=True
    )
    assert df3.count() == 0
    assert rep3["n_kept"] == 0


def test_bucketed_colstats_unstamped_history_kept_conservatively(
    spark, tmp_path
):
    """Enabling stats_cols on an existing table: pre-index slices have
    no stats and must be KEPT (skipping is an optimization, never the
    semantics); post-enable commits stamp and prune."""
    t = _mk_skipping_table(spark, tmp_path)  # no stats_cols
    t.upsert(_skip_rows(spark, range(100), 0, 0, "a"))
    # reopen with stats enabled — applies to future commits
    t2 = BucketedTable(
        spark, t.root, record_key="k", precombine="pre",
        num_buckets=8, stats_cols=["ts"],
    )
    df, rep = t2.snapshot_where({"ts": (10_000, None)}, with_report=True)
    assert df.count() == 0
    # every slice is unstamped → all kept (conservative)
    assert rep["n_kept"] == rep["n_slices"]
    t2.upsert(_skip_rows(spark, [1], 1000, 1, "b"))
    df2, rep2 = t2.snapshot_where(
        {"ts": (10_000, None)}, with_report=True
    )
    assert df2.count() == 0
    # the touched bucket is now stamped (max ts 1000 < 10000 → pruned);
    # untouched buckets stay unstamped-kept
    assert rep2["n_kept"] < rep2["n_slices"]
    # open() restores the persisted index config
    assert BucketedTable.open(spark, t.root).stats_cols == ["ts"]


@pytest.mark.slow
def test_bucketed_bloom_secondary_lookup(spark, tmp_path):
    """Per-slice Bloom sidecars answer non-key equality probes the
    bucket routing can't touch: a probe for one uid opens only
    may-contain slices; result equals snapshot().where(isin) exactly;
    empty probes match nothing."""
    t = _mk_skipping_table(spark, tmp_path, bloom_cols=["uid"])
    t.upsert(_skip_rows(spark, range(400), 0, 0, "a"))
    probe = ["a-37", "a-251"]
    df, rep = t.read_where_in("uid", probe, with_report=True)
    expected = t.snapshot().where(F.col("uid").isin(probe))
    assert _sorted_rows(df) == _sorted_rows(expected)
    assert rep["n_indexed"] == rep["n_slices"]
    assert rep["n_kept"] < rep["n_slices"], rep

    # absent value: blooms keep (almost) nothing, result is empty
    df2, rep2 = t.read_where_in("uid", ["nope-999"], with_report=True)
    assert df2.count() == 0

    # empty probe list ≡ isin([]) = false
    df3 = t.read_where_in("uid", [])
    assert df3.count() == 0

    # unindexed column falls back to conservative keep + exact filter
    df4, rep4 = t.read_where_in("amount", [370], with_report=True)
    assert _sorted_rows(df4) == _sorted_rows(
        t.snapshot().where(F.col("amount") == 370)
    )
    assert rep4["n_kept"] == rep4["n_slices"]


def test_bucketed_skipping_survives_delete_and_rename(spark, tmp_path):
    """Stats re-stamp on delete rewrites and follow a column rename
    (manifest carry with the key remapped); blooms under the old name
    go conservative after the rename."""
    t = _mk_skipping_table(
        spark, tmp_path, stats_cols=["ts"], bloom_cols=["uid"]
    )
    t.upsert(_skip_rows(spark, range(100), 0, 0, "a"))
    t.upsert(_skip_rows(spark, [3], 1000, 1, "b"))
    t.delete(spark.createDataFrame([(3,)], "k int"))
    # the recent row is gone; its bucket's rewritten slice re-stamped
    df, rep = t.snapshot_where({"ts": (1000, None)}, with_report=True)
    assert df.count() == 0
    assert rep["n_kept"] == 0, rep
    t.alter_rename_column("ts", "event_ts")
    df2, rep2 = t.snapshot_where(
        {"event_ts": (0, 50)}, with_report=True
    )
    assert rep2["indexed"]
    assert _sorted_rows(df2) == _sorted_rows(
        t.snapshot().where(F.col("event_ts").between(0, 50))
    )
    # config followed the rename and persisted
    assert BucketedTable.open(spark, t.root).stats_cols == ["event_ts"]


def test_bucketed_cdc_matches_keyed_cdc(spark, tmp_path):
    """r10 (VERDICT r9 #6): BucketedTable.cdc shares cdc_window with
    KeyedTable — the same upsert/delete/re-insert history applied to
    both engines must produce the identical (commit-ordinal, op, key,
    before, after) change set (commit ids differ per table; ordinals
    align them)."""
    sch = "k long, pre long, v string"
    hist = [
        ("u", [(1, 1, "a"), (2, 1, "b"), (3, 1, "c")]),
        ("d", [2, 3]),
        ("u", [(3, 2, "c2"), (1, 0, "stale")]),  # re-insert + merge-loser
        ("d", [1]),
        ("u", [(4, 1, "d"), (3, 3, "c3")]),
    ]
    kt = KeyedTable(
        spark, str(tmp_path / "kcdc"), record_key="k", precombine="pre",
        keep_versions=10,
    )
    bt = BucketedTable(
        spark, str(tmp_path / "bcdc"), record_key="k", precombine="pre",
        num_buckets=4, keep_versions=10,
    )
    for t in (kt, bt):
        for op, payload in hist:
            if op == "u":
                t.upsert(spark.createDataFrame(payload, sch))
            else:
                t.delete(
                    spark.createDataFrame([(k,) for k in payload], "k long")
                )

    def ops(t):
        ordinal = {c: i for i, c in enumerate(t.instants())}
        out = set()
        for r in t.cdc().collect():
            before = None if r["_before"] is None else tuple(r["_before"])
            after = None if r["_after"] is None else tuple(r["_after"])
            out.add(
                (ordinal[r["_commit_time"]], r["_change_op"], r["k"],
                 before, after)
            )
        return out

    assert ops(bt) == ops(kt)
    # windowed form agrees too (begin/end are per-table instants)
    ki, bi = kt.instants(), bt.instants()
    k_win = {
        (r["_change_op"], r["k"])
        for r in kt.cdc(begin=ki[1], end=ki[3]).collect()
    }
    b_win = {
        (r["_change_op"], r["k"])
        for r in bt.cdc(begin=bi[1], end=bi[3]).collect()
    }
    assert b_win == k_win
    # the replace rail raises on bucketed too
    bt.overwrite(spark.createDataFrame([(9, 1, "z")], sch))
    import pytest as _pytest

    from sending_weekly_daily_csv_reports_from_hudi_datalake_to_customers_via_email_using_glue_and_sns_or_ses_spark.sinks.upsert import (
        ReplaceCommitError,
    )

    with _pytest.raises(ReplaceCommitError):
        bt.cdc(begin=bi[0]).collect()
