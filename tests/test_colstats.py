"""Column-stats file index (sources/colstats.py — Hudi metadata-table
``col_stats``, P8): the skipping reader must be EQUIVALENT to a
full-scan filter on every layout, and must MEASURABLY prune files on
a clustered one. Also covers the KeyedTable integration
(``compact_snapshot(stats_cols=...)`` → ``snapshot_where``)."""

from __future__ import annotations

import datetime
import os

import pytest
from pyspark.sql import functions as F

from sending_weekly_daily_csv_reports_from_hudi_datalake_to_customers_via_email_using_glue_and_sns_or_ses_spark.sinks.upsert import (
    KeyedTable,
    compact_snapshot,
)
from sending_weekly_daily_csv_reports_from_hudi_datalake_to_customers_via_email_using_glue_and_sns_or_ses_spark.sources.colstats import (
    COLSTATS_NAME,
    collect_file_stats,
    load_colstats,
    prune_files,
    read_skipping,
    write_colstats,
)


def _mkdata(spark, n=4000):
    """n rows with a range-clusterable key ``k``, a correlated date,
    some NULLs, and a payload."""
    return spark.range(n).select(
        F.col("id").alias("k"),
        F.date_add(
            F.lit(datetime.date(2024, 1, 1)), (F.col("id") / 40).cast("int")
        ).alias("d"),
        F.when(F.col("id") % 13 == 0, None)
        .otherwise((F.col("id") * 7) % 1000)
        .cast("double")
        .alias("v"),
        F.concat(F.lit("u"), F.lpad(F.col("id").cast("string"), 6, "0")).alias(
            "s"
        ),
    )


@pytest.fixture(scope="module")
def clustered_dir(spark, tmp_path_factory):
    """16-file layout range-clustered on k (so d clusters too — they
    are correlated), with a colstats manifest over (k, d, v, s)."""
    path = str(tmp_path_factory.mktemp("colstats") / "t")
    _mkdata(spark).repartitionByRange(16, "k").write.parquet(path)
    write_colstats(spark, path, ["k", "d", "v", "s"])
    return path


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_manifest_shape_and_totals(spark, clustered_dir):
    m = load_colstats(spark, clustered_dir)
    assert m is not None and m["cols"] == ["k", "d", "v", "s"]
    assert len(m["files"]) == 16
    assert sum(e["rows"] for e in m["files"].values()) == 4000
    assert all(e["bytes"] > 0 for e in m["files"].values())
    # per-file null accounting survives the round trip
    assert (
        sum(e["stats"]["v"]["nulls"] for e in m["files"].values())
        == 4000 // 13 + 1
    )


def test_skipping_read_equivalent_to_filter(spark, clustered_dir):
    full = spark.read.parquet(clustered_dir)
    cases = [
        {"k": (1000, 1999)},
        {"k": (None, 57)},
        {"k": (3990, None)},
        {"v": (250.0, 260.0)},  # uncorrelated with layout: no pruning
        {"k": (500, 2500), "d": (datetime.date(2024, 1, 20), None)},
        {"s": ("u000100", "u000199")},
        {"k": (7, 7)},  # equality as a closed range
        {"k": (-50, -1)},  # zero survivors
    ]
    for preds in cases:
        got, report = read_skipping(
            spark, clustered_dir, preds, with_report=True
        )
        cond = F.lit(True)
        for c, (lo, hi) in preds.items():
            if lo is not None:
                cond = cond & (F.col(c) >= F.lit(lo))
            if hi is not None:
                cond = cond & (F.col(c) <= F.lit(hi))
        assert _rows(got) == _rows(full.where(cond)), preds
        assert report["n_kept"] <= report["n_files"] == 16


def test_skipping_actually_prunes_clustered_layout(spark, clustered_dir):
    """The measured claim: a narrow range on the cluster key plans over
    a fraction of the files — via the report AND the scan's real file
    list — and the correlated date column prunes too."""
    got, report = read_skipping(
        spark, clustered_dir, {"k": (1000, 1499)}, with_report=True
    )
    assert report["n_kept"] <= 4  # 500/4000 rows in a 16-file layout
    assert len(got.inputFiles()) == report["n_kept"]
    assert report["bytes_kept"] < report["bytes_total"]

    _, dreport = read_skipping(
        spark,
        clustered_dir,
        {"d": (datetime.date(2024, 1, 5), datetime.date(2024, 1, 9))},
        with_report=True,
    )
    assert dreport["n_kept"] <= 4  # correlated column rides the layout

    # zero-survivor predicate: empty result, schema intact, no full list
    empty, zreport = read_skipping(
        spark, clustered_dir, {"k": (-50, -1)}, with_report=True
    )
    assert zreport["n_kept"] == 0
    assert empty.count() == 0
    assert empty.columns == spark.read.parquet(clustered_dir).columns


def test_all_null_file_prunes_and_nan_keeps(spark, tmp_path):
    path = str(tmp_path / "nulls")
    df = spark.createDataFrame(
        [(0, None), (1, None), (2, None)], "k long, v double"
    )
    df.coalesce(1).write.parquet(path)
    write_colstats(spark, path, ["v"])
    got, report = read_skipping(
        spark, path, {"v": (0.0, 1e9)}, with_report=True
    )
    assert report["n_kept"] == 0 and got.count() == 0

    # NaN stats: unusable bounds keep the file, residual filter decides
    npath = str(tmp_path / "nan")
    spark.createDataFrame(
        [(0, float("nan")), (1, 5.0)], "k long, v double"
    ).coalesce(1).write.parquet(npath)
    write_colstats(spark, npath, ["v"])
    got, report = read_skipping(
        spark, npath, {"v": (100.0, 200.0)}, with_report=True
    )
    assert report["n_kept"] == 1 and got.count() == 0


def test_fallback_without_manifest(spark, tmp_path):
    path = str(tmp_path / "plain")
    _mkdata(spark, 500).coalesce(2).write.parquet(path)
    got, report = read_skipping(
        spark, path, {"k": (100, 199)}, with_report=True
    )
    assert report == {"fallback": True}
    assert got.count() == 100


def test_untracked_column_predicate_conservative(spark, tmp_path):
    path = str(tmp_path / "partial")
    _mkdata(spark, 1000).repartitionByRange(4, "k").write.parquet(path)
    write_colstats(spark, path, ["k"])  # v untracked
    got = read_skipping(spark, path, {"v": (100.0, 120.0)})
    want = spark.read.parquet(path).where(
        (F.col("v") >= 100.0) & (F.col("v") <= 120.0)
    )
    assert _rows(got) == _rows(want)


def test_hive_partitioned_dir_keeps_partition_columns(spark, tmp_path):
    """File-level reads must not lose hive partition columns: the
    reader sets basePath, so a kept file under p=2/ still yields p."""
    path = str(tmp_path / "hive")
    _mkdata(spark, 1200).withColumn(
        "p", (F.col("k") / 400).cast("int")
    ).repartitionByRange(3, "k").write.partitionBy("p").parquet(path)
    write_colstats(spark, path, ["k"])
    got, report = read_skipping(
        spark, path, {"k": (0, 399)}, with_report=True
    )
    assert "p" in got.columns
    assert _rows(got.select("p").distinct()) == [(0,)]
    assert report["n_kept"] < report["n_files"]


def test_validation_errors(spark, clustered_dir, tmp_path):
    with pytest.raises(ValueError, match="non-empty"):
        read_skipping(spark, clustered_dir, {})
    with pytest.raises(ValueError, match="unbounded on"):
        read_skipping(spark, clustered_dir, {"k": (None, None)})
    with pytest.raises(ValueError, match="tuple"):
        read_skipping(spark, clustered_dir, {"k": 5})
    df = _mkdata(spark, 10).withColumn("arr", F.array(F.lit(1)))
    p = str(tmp_path / "badcol")
    df.write.parquet(p)
    with pytest.raises(ValueError, match="not in schema"):
        collect_file_stats(spark, p, ["nope"])
    with pytest.raises(ValueError, match="total order"):
        collect_file_stats(spark, p, ["arr"])


def test_prune_files_report_matches_hand_computed(spark, tmp_path):
    """The report is data, not vibes: 4 files of 100 rows each over
    disjoint k-ranges → a range covering files 1-2 keeps exactly 2
    files and their bytes."""
    path = str(tmp_path / "hand")
    _mkdata(spark, 400).repartitionByRange(4, "k").write.parquet(path)
    m = write_colstats(spark, path, ["k"])
    kept, report = prune_files(m, {"k": (100, 299)})
    assert report["n_files"] == 4 and report["n_kept"] == 2
    assert report["bytes_kept"] == sum(
        m["files"][rel]["bytes"] for rel in kept
    )


def test_keyed_table_snapshot_where(spark, tmp_path):
    """End to end through the engine: upsert → z-order compaction with
    stats → snapshot_where equals snapshot().filter AND prunes; a MOR
    log window after the compaction falls back (correctly merged)."""
    root = str(tmp_path / "kt")
    t = KeyedTable(
        spark, root, record_key="k", precombine="pre", keep_versions=5
    )
    data = _mkdata(spark, 3000).withColumn("pre", F.col("k"))
    t.upsert(data)
    c = compact_snapshot(
        t, target_files=8, zorder_cols=["k", "v"], stats_cols=["k", "d", "v"]
    )
    assert c is not None
    assert os.path.exists(
        os.path.join(root, "snapshots", f"v={c}", COLSTATS_NAME)
    )
    preds = {"k": (500, 799)}
    got, report = t.snapshot_where(preds, with_report=True)
    want = t.snapshot().where((F.col("k") >= 500) & (F.col("k") <= 799))
    assert _rows(got) == _rows(want)
    assert report["n_kept"] < report["n_files"] == 8

    # MOR append after compaction: fast path must NOT fire — a log row
    # moving key 600's v out of range has to win over the base row
    t2 = KeyedTable(
        spark,
        root,
        record_key="k",
        precombine="pre",
        keep_versions=5,
        table_type="MERGE_ON_READ",
    )
    upd = spark.createDataFrame(
        [(600, datetime.date(2030, 1, 1), 9999.0, "u-upd", 10**9)],
        "k long, d date, v double, s string, pre long",
    )
    t2.upsert(upd)
    got2, rep2 = t2.snapshot_where({"v": (9000.0, 10000.0)}, with_report=True)
    assert rep2 == {"fallback": True}
    assert _rows(got2.select("k", "v")) == [(600, 9999.0)]


def test_driver_entry_prunes_files(spark):
    """The colstats_skipping DRIVER ENTRY must actually skip: its scan
    plans over a strict subset of the 16-file z-ordered layout."""
    from sending_weekly_daily_csv_reports_from_hudi_datalake_to_customers_via_email_using_glue_and_sns_or_ses_spark.operators import (
        QUERIES,
    )

    df = QUERIES["colstats_skipping"](spark, "/root/testdata/sf0.001")
    n = len(df.inputFiles())
    assert 0 < n < 16, n
