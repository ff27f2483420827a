"""Inline table services (sinks/services.py): compaction fires at the
delta-commit threshold on MOR tables only, clustering fires at the
commit threshold and re-stamps the skipping indexes, and both triggers
derive from durable table state (fresh policy objects don't re-run
services an earlier process already ran)."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from sending_weekly_daily_csv_reports_from_hudi_datalake_to_customers_via_email_using_glue_and_sns_or_ses_spark.sinks.services import (
    ServicePolicy,
    delta_commits_above_base,
    run_table_services,
)
from sending_weekly_daily_csv_reports_from_hudi_datalake_to_customers_via_email_using_glue_and_sns_or_ses_spark.sinks.upsert import (
    KeyedTable,
)
from sending_weekly_daily_csv_reports_from_hudi_datalake_to_customers_via_email_using_glue_and_sns_or_ses_spark.sources.bloomindex import (
    BLOOM_NAME,
)
from sending_weekly_daily_csv_reports_from_hudi_datalake_to_customers_via_email_using_glue_and_sns_or_ses_spark.sources.colstats import (
    COLSTATS_NAME,
)


def _batch(spark, lo, n=10):
    return spark.range(lo, lo + n).select(
        F.col("id").alias("k"),
        F.col("id").alias("pre"),
        (F.col("id") * 2.5).alias("v"),
    )


def test_mor_compaction_fires_at_threshold(spark, tmp_path):
    t = KeyedTable(
        spark,
        str(tmp_path / "mor"),
        record_key="k",
        precombine="pre",
        table_type="MERGE_ON_READ",
    )
    pol = ServicePolicy(compact_after_delta_commits=3)
    compactions = []
    for i in range(6):
        t.upsert(_batch(spark, i * 10))
        rep = run_table_services(t, pol)
        if rep["compacted"]:
            compactions.append(rep["compacted"])
    # 6 commits, threshold 3: compaction at commit 3 and commit 6
    assert len(compactions) == 2
    assert delta_commits_above_base(t) == 0
    assert t.snapshot().count() == 60


def test_cow_never_compacts_and_none_disables(spark, tmp_path):
    t = KeyedTable(
        spark, str(tmp_path / "cow"), record_key="k", precombine="pre"
    )
    pol = ServicePolicy(compact_after_delta_commits=1)
    t.upsert(_batch(spark, 0))
    assert run_table_services(t, pol) == {
        "compacted": None,
        "clustered": None,
    }
    t2 = KeyedTable(
        spark,
        str(tmp_path / "mor2"),
        record_key="k",
        precombine="pre",
        table_type="MERGE_ON_READ",
    )
    t2.upsert(_batch(spark, 0))
    off = ServicePolicy(compact_after_delta_commits=None)
    assert run_table_services(t2, off)["compacted"] is None


def test_inline_clustering_restamps_indexes(spark, tmp_path):
    t = KeyedTable(
        spark, str(tmp_path / "cl"), record_key="k", precombine="pre"
    )
    pol = ServicePolicy(
        compact_after_delta_commits=None,
        cluster_after_commits=2,
        target_files=2,
        stats_cols=["k"],
        bloom_key="k",
    )
    t.upsert(_batch(spark, 0))
    assert run_table_services(t, pol)["clustered"] is None  # 1 < 2
    t.upsert(_batch(spark, 100))
    c1 = run_table_services(t, pol)["clustered"]
    assert c1 is not None
    snap_dir = os.path.join(t.root, "snapshots", f"v={c1}")
    assert os.path.exists(os.path.join(snap_dir, BLOOM_NAME))
    assert os.path.exists(os.path.join(snap_dir, COLSTATS_NAME))
    # the clustering commit itself must not immediately re-trigger
    assert run_table_services(t, pol)["clustered"] is None
    t.upsert(_batch(spark, 200))
    assert run_table_services(t, pol)["clustered"] is None  # 1 new < 2
    t.upsert(_batch(spark, 300))
    c2 = run_table_services(t, pol)["clustered"]
    assert c2 is not None and c2 > c1
    assert t.snapshot().count() == 40


def test_fresh_policy_adopts_prior_clustering(spark, tmp_path):
    """A restarted service process (new policy object) must not
    re-cluster a table whose newest instants are the earlier run's
    replace commit — the trigger reads durable state."""
    t = KeyedTable(
        spark, str(tmp_path / "ad"), record_key="k", precombine="pre"
    )
    pol = ServicePolicy(
        compact_after_delta_commits=None, cluster_after_commits=2
    )
    t.upsert(_batch(spark, 0))
    t.upsert(_batch(spark, 100))
    assert run_table_services(t, pol)["clustered"] is not None
    fresh = ServicePolicy(
        compact_after_delta_commits=None, cluster_after_commits=2
    )
    assert run_table_services(t, fresh)["clustered"] is None


def test_one_policy_shared_across_tables(spark, tmp_path):
    """A single ServicePolicy object drives two tables independently:
    table A's clustering marker must not suppress (or prematurely
    fire) table B's trigger — the marker is keyed by table root."""
    a = KeyedTable(
        spark, str(tmp_path / "a"), record_key="k", precombine="pre"
    )
    b = KeyedTable(
        spark, str(tmp_path / "b"), record_key="k", precombine="pre"
    )
    pol = ServicePolicy(
        compact_after_delta_commits=None, cluster_after_commits=2
    )
    clustered = {"a": 0, "b": 0}
    for i in range(4):
        a.upsert(_batch(spark, i * 10))
        if run_table_services(a, pol)["clustered"]:
            clustered["a"] += 1
        b.upsert(_batch(spark, i * 10))
        if run_table_services(b, pol)["clustered"]:
            clustered["b"] += 1
    # 4 commits each at threshold 2 → 2 clusterings each; a shared
    # scalar marker would let A's first clustering (a LATER wall-clock
    # instant than B's earlier commits) swallow B's count
    assert clustered == {"a": 2, "b": 2}
    assert a.snapshot().count() == 40 and b.snapshot().count() == 40
