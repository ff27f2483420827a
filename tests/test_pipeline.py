"""End-to-end pipeline (template.py:470-519 semantics): sources → SQL
transform → date-partitioned CSV → presigned URL → email double."""

from __future__ import annotations

import pytest
import csv
import glob
import os
from datetime import datetime, timezone

from sending_weekly_daily_csv_reports_from_hudi_datalake_to_customers_via_email_using_glue_and_sns_or_ses_spark import (
    fixtures,
)
from sending_weekly_daily_csv_reports_from_hudi_datalake_to_customers_via_email_using_glue_and_sns_or_ses_spark.catalog import (
    SourceSpec,
)
from sending_weekly_daily_csv_reports_from_hudi_datalake_to_customers_via_email_using_glue_and_sns_or_ses_spark.delivery import (
    EmailSender,
)
from sending_weekly_daily_csv_reports_from_hudi_datalake_to_customers_via_email_using_glue_and_sns_or_ses_spark.pipeline import (
    PipelineConfig,
    run_pipeline,
)
from sending_weekly_daily_csv_reports_from_hudi_datalake_to_customers_via_email_using_glue_and_sns_or_ses_spark.sinks.report import (
    write_csv_report,
)

#: the reference's report query (template.py:485-490) over the
#: reference-shaped fixtures
REPORT_QUERY = """
SELECT o.*, c.name AS customer_name, c.email AS customer_email
FROM orders o JOIN customers c ON o.customer_id = c.customer_id
WHERE o.priority = 'URGENT'
"""


def test_report_key_layout(spark, tmp_path):
    """template.py:460: reports/year=Y/month=M/day=D/<id>."""
    df = fixtures.customers(spark, 5)
    path = write_csv_report(df, str(tmp_path / "reports"), report_id="r1")
    now = datetime.now(timezone.utc)
    assert path.endswith(
        os.path.join(f"year={now.year}", f"month={now.month}", f"day={now.day}", "r1")
    )
    assert glob.glob(os.path.join(path, "*.csv"))


def test_report_idempotent_overwrite(spark, tmp_path):
    """Same report_id re-run → one report, not two (idempotent retry)."""
    df = fixtures.customers(spark, 5)
    p1 = write_csv_report(df, str(tmp_path / "reports"), report_id="rX", single_file=True)
    p2 = write_csv_report(df, str(tmp_path / "reports"), report_id="rX", single_file=True)
    assert p1 == p2
    files = glob.glob(os.path.join(p1, "*.csv"))
    assert len(files) == 1


def test_pipeline_end_to_end(spark, tmp_path):
    # stage the two keyed tables as parquet sources
    cust_path = str(tmp_path / "src" / "customers")
    ord_path = str(tmp_path / "src" / "orders")
    fixtures.customers(spark, 30).write.parquet(cust_path)
    fixtures.orders(spark, 200, n_customers=30).write.parquet(ord_path)

    sender = EmailSender()
    cfg = PipelineConfig(
        sources=[
            SourceSpec("customers", cust_path),
            SourceSpec("orders", ord_path),
        ],
        query=REPORT_QUERY,
        report_base=str(tmp_path / "reports"),
        recipients=["a@example.com"],
        report_id="run-1",
    )
    res = run_pipeline(spark, cfg, sender=sender)

    # the transform did join+filter
    rows = res.df.collect()
    assert rows and all(r["priority"] == "URGENT" for r in rows)
    assert "customer_email" in res.df.columns

    # a single CSV landed with a header and the right rowcount
    files = glob.glob(os.path.join(res.report_path, "*.csv"))
    assert len(files) == 1
    with open(files[0]) as f:
        data = list(csv.DictReader(f))
    assert len(data) == len(rows)

    # delivery: one email with a presigned link to the report
    assert len(sender.outbox) == 1
    assert res.report_path in sender.outbox[0].html_body
    assert "expires_in=86400" in sender.outbox[0].html_body


def test_multi_recipient_parsing():
    """template.py:402 documents comma-separated recipients — both the
    string form and an explicit list parse to the same clean list."""
    from sending_weekly_daily_csv_reports_from_hudi_datalake_to_customers_via_email_using_glue_and_sns_or_ses_spark.delivery import (
        parse_recipients,
    )

    assert parse_recipients("a@x.com, b@y.com ,,c@z.com ") == [
        "a@x.com",
        "b@y.com",
        "c@z.com",
    ]
    assert parse_recipients(["a@x.com", " b@y.com "]) == ["a@x.com", "b@y.com"]
    assert parse_recipients("") == []


def test_config_from_loaders_reference_shape():
    """The reference's loaders dict (template.py:471-500) maps onto
    PipelineConfig without edits: hudi_path→hudi source, FULL|INC
    passthrough, comma-separated recipients, email knobs."""
    from sending_weekly_daily_csv_reports_from_hudi_datalake_to_customers_via_email_using_glue_and_sns_or_ses_spark.pipeline import (
        config_from_loaders,
    )

    loaders = {
        "source": [
            {"table_name": "orders", "hudi_path": "/data/orders", "type": "FULL"},
            {"table_name": "customers", "hudi_path": "/data/customers", "type": "INC"},
        ],
        "transform": {"query": "SELECT * FROM orders"},
        "email": {
            "sender_email": "noreply@example.com",
            "recipient_email": "a@example.com, b@example.com",
            "subject": "Download Link for Data",
            "report_bucket": "/tmp/reports",
            "file_expires_in": 3600,
        },
    }
    cfg = config_from_loaders(loaders)
    assert [s.fmt for s in cfg.sources] == ["hudi", "hudi"]
    assert [s.load_type for s in cfg.sources] == ["FULL", "INC"]
    assert cfg.recipients == ["a@example.com", "b@example.com"]
    assert cfg.subject == "Download Link for Data"
    assert cfg.report_base == "/tmp/reports"
    assert cfg.file_expires_in == 3600


def test_cli_runs_reference_config(tmp_path, capsys):
    """python -m <pkg> --config loaders.json end-to-end over testdata
    parquet sources (plain path+format entries)."""
    import json

    from sending_weekly_daily_csv_reports_from_hudi_datalake_to_customers_via_email_using_glue_and_sns_or_ses_spark.__main__ import (
        main,
    )

    loaders = {
        "source": [
            {
                "table_name": "orders",
                "path": "/root/testdata/sf0.001/orders.parquet",
                "format": "parquet",
                "type": "FULL",
            },
            {
                "table_name": "customer",
                "path": "/root/testdata/sf0.001/customer.parquet",
                "format": "parquet",
                "type": "FULL",
            },
        ],
        "transform": {
            "query": """
              SELECT o.o_orderkey, o.o_totalprice, c.c_name AS customer_name
              FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
              WHERE o.o_orderpriority = '1-URGENT'
            """
        },
        "email": {
            "recipient_email": "ops@example.com",
            "subject": "Urgent orders",
            "report_bucket": str(tmp_path / "reports"),
            "file_expires_in": 60,
        },
    }
    cfg_path = tmp_path / "loaders.json"
    cfg_path.write_text(json.dumps(loaders))

    rc = main(["--config", str(cfg_path), "--shuffle-partitions", "4"])
    assert rc == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["rows"] > 0
    assert out["recipients"] == ["ops@example.com"]
    assert glob.glob(os.path.join(out["report_path"], "*.csv"))


@pytest.mark.slow
def test_maintained_report_loop(spark, tmp_path):
    """The reference's nightly report, incrementally (late r7): CDC
    window → maintained aggregate → CSV → email, exactly-once effect.
    Three runs: seed, quiescent (no report), changed (delta applied);
    plus a crash-redelivery run that must not double-count."""
    from sending_weekly_daily_csv_reports_from_hudi_datalake_to_customers_via_email_using_glue_and_sns_or_ses_spark.pipeline import (
        MaintainedReportConfig,
        run_maintained_report,
    )
    from sending_weekly_daily_csv_reports_from_hudi_datalake_to_customers_via_email_using_glue_and_sns_or_ses_spark.sinks.upsert import (
        KeyedTable,
    )

    src = KeyedTable(
        spark, str(tmp_path / "src"), record_key="k", precombine="pre"
    )
    cfg = MaintainedReportConfig(
        source_path=src.root,
        table_name="orders_src",
        group_cols=["grp"],
        sum_cols=["amount"],
        view_path=str(tmp_path / "view"),
        report_base=str(tmp_path / "reports"),
        checkpoint_root=str(tmp_path / "ck"),
        recipients=["a@example.com"],
    )
    sender = EmailSender()

    def rows(df):
        return sorted(
            (r["grp"], r["n_rows"], r["sum_amount"], r["avg_amount"])
            for r in df.collect()
        )

    src.upsert(
        spark.createDataFrame(
            [(1, 1, "a", 10), (2, 1, "a", 20), (3, 1, "b", 6)],
            "k int, pre int, grp string, amount long",
        )
    )
    res = run_maintained_report(spark, cfg, sender=sender)
    assert rows(res.df) == [("a", 2, 30, 15.0), ("b", 1, 6, 6.0)]
    assert len(sender.outbox) == 1
    assert os.path.isdir(res.report_path)

    # quiescent source → no report, no email
    assert run_maintained_report(spark, cfg, sender=sender) is None
    assert len(sender.outbox) == 1

    # a change → next run folds only the delta
    src.delete(spark.createDataFrame([(2,)], "k int"))
    src.upsert(
        spark.createDataFrame(
            [(4, 1, "b", 4)], "k int, pre int, grp string, amount long"
        )
    )
    res2 = run_maintained_report(spark, cfg, sender=sender)
    assert rows(res2.df) == [("a", 1, 10, 10.0), ("b", 2, 10, 5.0)]
    assert res2.report_path != res.report_path  # new instant, new key

    # crash redelivery: reader checkpoint NOT advanced (simulated by
    # cleaning it back), same window re-runs — the through-token guard
    # must keep the aggregate state identical
    src.upsert(
        spark.createDataFrame(
            [(5, 1, "a", 100)], "k int, pre int, grp string, amount long"
        )
    )
    res3 = run_maintained_report(spark, cfg, sender=sender)
    want = rows(res3.df)
    # simulate: the commit never landed; the SAME window redelivers
    from sending_weekly_daily_csv_reports_from_hudi_datalake_to_customers_via_email_using_glue_and_sns_or_ses_spark.sources.incremental import (
        CheckpointStore,
    )

    store = CheckpointStore(cfg.checkpoint_root, spark=spark)
    store.advance(
        cfg.table_name, src.root, res2.report_path.rsplit("cdc_", 1)[1]
    )
    n_sent = len(sender.outbox)
    # the view's through-instant already covers the redelivered window:
    # the run is a pure checkpoint catch-up — no re-fold, no duplicate
    # report or email — and the view state is untouched
    assert run_maintained_report(spark, cfg, sender=sender) is None
    assert len(sender.outbox) == n_sent
    from sending_weekly_daily_csv_reports_from_hudi_datalake_to_customers_via_email_using_glue_and_sns_or_ses_spark.operators.ivm import (
        MaintainedAggregate,
    )

    view = MaintainedAggregate(
        spark, cfg.view_path, group_cols=["grp"], sum_cols=["amount"]
    )
    assert sorted(
        (r["grp"], r["n_rows"], r["sum_amount"])
        for r in view.current().collect()
    ) == [(g, n, s) for g, n, s, _ in want]
    # and the catch-up really advanced the checkpoint: next run is a
    # plain no-op, not another catch-up
    assert run_maintained_report(spark, cfg, sender=sender) is None


@pytest.mark.slow
def test_maintained_report_minmax(spark, tmp_path):
    """Report loop with maintained MIN/MAX: the delete-the-extremum
    window drives the dirty-group recompute through the pipeline's
    as-of-window-end snapshot (no config beyond minmax_cols)."""
    from sending_weekly_daily_csv_reports_from_hudi_datalake_to_customers_via_email_using_glue_and_sns_or_ses_spark.pipeline import (
        MaintainedReportConfig,
        run_maintained_report,
    )
    from sending_weekly_daily_csv_reports_from_hudi_datalake_to_customers_via_email_using_glue_and_sns_or_ses_spark.sinks.upsert import (
        KeyedTable,
    )

    src = KeyedTable(
        spark, str(tmp_path / "srcm"), record_key="k", precombine="pre"
    )
    cfg = MaintainedReportConfig(
        source_path=src.root,
        table_name="orders_srcm",
        group_cols=["grp"],
        sum_cols=["amount"],
        minmax_cols=["amount"],
        view_path=str(tmp_path / "viewm"),
        report_base=str(tmp_path / "reportsm"),
        checkpoint_root=str(tmp_path / "ckm"),
    )

    def rows(df):
        return sorted(
            (r["grp"], r["n_rows"], r["min_amount"], r["max_amount"])
            for r in df.collect()
        )

    src.upsert(
        spark.createDataFrame(
            [(1, 1, "a", 10), (2, 1, "a", 99), (3, 1, "b", 6)],
            "k int, pre int, grp string, amount long",
        )
    )
    res = run_maintained_report(spark, cfg, sender=EmailSender())
    assert rows(res.df) == [("a", 2, 10, 99), ("b", 1, 6, 6)]

    src.delete(spark.createDataFrame([(2,)], "k int"))  # retract max(a)
    res2 = run_maintained_report(spark, cfg, sender=EmailSender())
    assert rows(res2.df) == [("a", 1, 10, 10), ("b", 1, 6, 6)]


def test_maintained_report_self_heals_across_overwrite(spark, tmp_path):
    """insert_overwrite_table on the source breaks CDC derivability by
    contract — the report loop must re-seed the view from the
    post-replace snapshot, still deliver that run's report, and resume
    incremental maintenance afterwards."""
    from sending_weekly_daily_csv_reports_from_hudi_datalake_to_customers_via_email_using_glue_and_sns_or_ses_spark.pipeline import (
        MaintainedReportConfig,
        run_maintained_report,
    )
    from sending_weekly_daily_csv_reports_from_hudi_datalake_to_customers_via_email_using_glue_and_sns_or_ses_spark.sinks.upsert import (
        KeyedTable,
    )

    src = KeyedTable(
        spark, str(tmp_path / "srco"), record_key="k", precombine="pre"
    )
    cfg = MaintainedReportConfig(
        source_path=src.root,
        table_name="orders_srco",
        group_cols=["grp"],
        sum_cols=["amount"],
        minmax_cols=["amount"],
        view_path=str(tmp_path / "viewo"),
        report_base=str(tmp_path / "reportso"),
        checkpoint_root=str(tmp_path / "cko"),
    )
    sch = "k int, pre int, grp string, amount long"

    def rows(df):
        return sorted(
            (r["grp"], r["n_rows"], r["sum_amount"], r["min_amount"])
            for r in df.collect()
        )

    src.upsert(
        spark.createDataFrame([(1, 1, "a", 10), (2, 1, "a", 20)], sch)
    )
    run_maintained_report(spark, cfg, sender=EmailSender())

    # replace the table wholesale; the next run must re-seed, not crash
    src.overwrite(
        spark.createDataFrame([(5, 1, "b", 7), (6, 1, "b", 9)], sch)
    )
    res = run_maintained_report(spark, cfg, sender=EmailSender())
    assert res is not None
    assert rows(res.df) == [("b", 2, 16, 7)]

    # incremental maintenance resumes after the re-seed
    src.upsert(spark.createDataFrame([(7, 1, "b", 1)], sch))
    res2 = run_maintained_report(spark, cfg, sender=EmailSender())
    assert rows(res2.df) == [("b", 3, 17, 1)]
    # quiescent afterwards
    assert run_maintained_report(spark, cfg, sender=EmailSender()) is None


def test_pipeline_quality_gate_blocks_bad_reports(spark, tmp_path):
    """quality_rules on PipelineConfig: a failing rule aborts BEFORE
    any write or email; a passing rule set changes nothing."""
    import pytest

    from sending_weekly_daily_csv_reports_from_hudi_datalake_to_customers_via_email_using_glue_and_sns_or_ses_spark.operators.quality import (
        DataQualityError,
        completeness,
        min_rows,
    )

    cust_path = str(tmp_path / "src" / "customers")
    ord_path = str(tmp_path / "src" / "orders")
    fixtures.customers(spark, 10).write.parquet(cust_path)
    fixtures.orders(spark, 50, n_customers=10).write.parquet(ord_path)
    sender = EmailSender()

    def cfg(rules, rid):
        return PipelineConfig(
            sources=[
                SourceSpec("customers", cust_path),
                SourceSpec("orders", ord_path),
            ],
            query=REPORT_QUERY,
            report_base=str(tmp_path / "reports"),
            recipients=["a@example.com"],
            report_id=rid,
            quality_rules=rules,
        )

    # the URGENT filter keeps a strict subset: min_rows(10**6) fails
    with pytest.raises(DataQualityError, match="min_rows"):
        run_pipeline(spark, cfg([min_rows(10**6)], "gated"), sender=sender)
    assert sender.outbox == []  # nothing delivered
    assert not glob.glob(
        os.path.join(str(tmp_path / "reports"), "**", "gated", "*.csv"),
        recursive=True,
    )  # nothing written

    res = run_pipeline(
        spark,
        cfg([min_rows(1), completeness("customer_email")], "ok"),
        sender=sender,
    )
    assert len(sender.outbox) == 1
    assert glob.glob(os.path.join(res.report_path, "*.csv"))


def test_maintained_report_drift_gate(spark, tmp_path):
    """quality_rules + metric_history_path on the maintained loop: each
    run's metrics land in the history, a drifting metric fails the run
    BEFORE delivery, and the unconsumed window retries after the data
    is fixed."""
    import pytest

    from sending_weekly_daily_csv_reports_from_hudi_datalake_to_customers_via_email_using_glue_and_sns_or_ses_spark.operators.quality import (
        DataQualityError,
        completeness,
        min_rows,
    )
    from sending_weekly_daily_csv_reports_from_hudi_datalake_to_customers_via_email_using_glue_and_sns_or_ses_spark.pipeline import (
        MaintainedReportConfig,
        run_maintained_report,
    )
    from sending_weekly_daily_csv_reports_from_hudi_datalake_to_customers_via_email_using_glue_and_sns_or_ses_spark.sinks.upsert import (
        KeyedTable,
    )

    src = KeyedTable(
        spark, str(tmp_path / "src"), record_key="k", precombine="pre"
    )
    cfg = MaintainedReportConfig(
        source_path=src.root,
        table_name="orders_src",
        group_cols=["grp"],
        sum_cols=["amount"],
        view_path=str(tmp_path / "view"),
        report_base=str(tmp_path / "reports"),
        checkpoint_root=str(tmp_path / "ck"),
        recipients=["a@example.com"],
        quality_rules=[min_rows(1), completeness("sum_amount", 0.5)],
        metric_history_path=str(tmp_path / "dqhist"),
        max_rel_change=0.4,
    )
    sender = EmailSender()
    # three clean runs build the baseline: completeness(sum_amount)=1.0
    for i in range(3):
        src.upsert(
            spark.createDataFrame(
                [(i * 2, 1, "a", 10), (i * 2 + 1, 1, "b", 5)],
                "k int, pre int, grp string, amount long",
            )
        )
        assert run_maintained_report(spark, cfg, sender=sender) is not None
    assert len(sender.outbox) == 3
    # a batch of NULL amounts craters completeness on half the groups:
    # passes the absolute 0.5 threshold but DRIFTS >40% vs the 1.0
    # baseline... completeness of sum over groups: make most sums NULL
    src.upsert(
        spark.createDataFrame(
            [(100 + i, 1, f"g{i}", None) for i in range(18)],
            "k int, pre int, grp string, amount long",
        )
    )
    with pytest.raises(DataQualityError, match="drifted"):
        run_maintained_report(spark, cfg, sender=sender)
    assert len(sender.outbox) == 3  # nothing delivered
    # the failed run's metrics are ON FILE for debugging
    from sending_weekly_daily_csv_reports_from_hudi_datalake_to_customers_via_email_using_glue_and_sns_or_ses_spark.operators.quality import (
        MetricHistory,
    )

    hist = MetricHistory(spark, cfg.metric_history_path)
    assert hist.load().select("run").distinct().count() == 4
    # fix the data (delete the NULL-amount keys); the UNCONSUMED window
    # plus the fix folds in one retried run and delivery resumes
    src.delete(
        spark.createDataFrame([(100 + i,) for i in range(18)], "k int")
    )
    res = run_maintained_report(spark, cfg, sender=sender)
    assert res is not None and len(sender.outbox) == 4


@pytest.mark.slow
def test_maintained_join_report_loop(spark, tmp_path):
    """The reference's ACTUAL report (orders ⋈ customers,
    template.py:485-490) maintained incrementally from both CDC streams
    (r8): seed pair, quiescent no-op, fact-only delta, dim-only
    attribute migration (the F₀⋈ΔD path), crash-redelivery catch-up —
    the maintained view must equal a direct join recompute at every
    step."""
    from pyspark.sql import functions as F

    from sending_weekly_daily_csv_reports_from_hudi_datalake_to_customers_via_email_using_glue_and_sns_or_ses_spark.pipeline import (
        MaintainedJoinReportConfig,
        run_maintained_join_report,
    )
    from sending_weekly_daily_csv_reports_from_hudi_datalake_to_customers_via_email_using_glue_and_sns_or_ses_spark.sinks.upsert import (
        KeyedTable,
    )

    fact = KeyedTable(
        spark, str(tmp_path / "jfact"), record_key="okey", precombine="opre"
    )
    dim = KeyedTable(
        spark, str(tmp_path / "jdim"), record_key="ckey", precombine="cpre"
    )
    cfg = MaintainedJoinReportConfig(
        fact_path=fact.root,
        fact_name="orders_j",
        dim_path=dim.root,
        dim_name="customers_j",
        on=("cust", "ckey"),
        group_cols=["segment"],
        sum_cols=["amount"],
        view_path=str(tmp_path / "jview"),
        report_base=str(tmp_path / "jreports"),
        checkpoint_root=str(tmp_path / "jck"),
        recipients=["a@example.com"],
    )
    sender = EmailSender()

    def recompute():
        fs, ds = fact.snapshot(), dim.snapshot()
        if fs is None or ds is None:
            return []
        return sorted(
            (r["segment"], r["n_rows"], r["sum_amount"])
            for r in fs.join(ds, fs["cust"] == ds["ckey"])
            .groupBy("segment")
            .agg(
                F.count(F.lit(1)).alias("n_rows"),
                F.sum("amount").alias("sum_amount"),
            )
            .collect()
        )

    def rows(df):
        return sorted(
            (r["segment"], r["n_rows"], r["sum_amount"])
            for r in df.collect()
        )

    FACT_S = "okey int, opre int, cust int, amount long"
    DIM_S = "ckey int, cpre int, segment string"
    dim.upsert(spark.createDataFrame([(1, 0, "RETAIL"), (2, 0, "AUTO")], DIM_S))
    fact.upsert(
        spark.createDataFrame(
            [(10, 0, 1, 100), (11, 0, 1, 50), (12, 0, 2, 7), (13, 0, 9, 1)],
            FACT_S,  # okey 13 joins nothing (cust 9 unknown)
        )
    )
    res = run_maintained_join_report(spark, cfg, sender=sender)
    assert rows(res.df) == recompute() == [("AUTO", 1, 7), ("RETAIL", 2, 150)]
    assert len(sender.outbox) == 1 and os.path.isdir(res.report_path)

    # quiescent → no report, no email
    assert run_maintained_join_report(spark, cfg, sender=sender) is None
    assert len(sender.outbox) == 1

    # fact-only window
    fact.delete(spark.createDataFrame([(11,)], "okey int"))
    fact.upsert(spark.createDataFrame([(14, 0, 2, 3)], FACT_S))
    res2 = run_maintained_join_report(spark, cfg, sender=sender)
    assert rows(res2.df) == recompute() == [("AUTO", 2, 10), ("RETAIL", 1, 100)]

    # dim-only window: customer 1 migrates RETAIL → AUTO; every joined
    # fact row moves with it (the delta-join term, no fact change)
    dim.upsert(spark.createDataFrame([(1, 1, "AUTO")], DIM_S))
    res3 = run_maintained_join_report(spark, cfg, sender=sender)
    assert rows(res3.df) == recompute() == [("AUTO", 3, 110)]

    # the unknown customer arrives: okey 13 enters the view via F₀⋈ΔD
    dim.upsert(spark.createDataFrame([(9, 0, "GOV")], DIM_S))
    res4 = run_maintained_join_report(spark, cfg, sender=sender)
    assert rows(res4.df) == recompute() == [("AUTO", 3, 110), ("GOV", 1, 1)]

    # crash redelivery: roll the FACT checkpoint back; the pair token
    # already covers it → pure catch-up, no re-fold, no email
    from sending_weekly_daily_csv_reports_from_hudi_datalake_to_customers_via_email_using_glue_and_sns_or_ses_spark.sources.incremental import (
        CheckpointStore,
    )

    fact.upsert(spark.createDataFrame([(15, 0, 9, 30)], FACT_S))
    res5 = run_maintained_join_report(spark, cfg, sender=sender)
    want = rows(res5.df)
    store = CheckpointStore(cfg.checkpoint_root, spark=spark)
    store.advance(cfg.fact_name, fact.root, fact.instants()[-2])
    n_sent = len(sender.outbox)
    assert run_maintained_join_report(spark, cfg, sender=sender) is None
    assert len(sender.outbox) == n_sent
    from sending_weekly_daily_csv_reports_from_hudi_datalake_to_customers_via_email_using_glue_and_sns_or_ses_spark.operators.ivm import (
        MaintainedJoinAggregate,
    )

    view = MaintainedJoinAggregate(
        spark, cfg.view_path, on=("cust", "ckey"),
        group_cols=["segment"], sum_cols=["amount"],
    )
    assert (
        sorted(
            (r["segment"], r["n_rows"], r["sum_amount"])
            for r in view.current().collect()
        )
        == [(g, n, s) for g, n, s in want]
        == recompute()
    )
    # and the catch-up really advanced both checkpoints
    assert run_maintained_join_report(spark, cfg, sender=sender) is None


def test_maintained_join_report_heals_across_overwrite(spark, tmp_path):
    """insert_overwrite_table on the DIM side: CDC across the replace is
    underivable, so the loop re-seeds the view from the post-replace
    joined snapshot and resumes incremental maintenance."""
    from pyspark.sql import functions as F

    from sending_weekly_daily_csv_reports_from_hudi_datalake_to_customers_via_email_using_glue_and_sns_or_ses_spark.pipeline import (
        MaintainedJoinReportConfig,
        run_maintained_join_report,
    )
    from sending_weekly_daily_csv_reports_from_hudi_datalake_to_customers_via_email_using_glue_and_sns_or_ses_spark.sinks.upsert import (
        KeyedTable,
    )

    fact = KeyedTable(
        spark, str(tmp_path / "ofact"), record_key="okey", precombine="opre"
    )
    dim = KeyedTable(
        spark, str(tmp_path / "odim"), record_key="ckey", precombine="cpre"
    )
    cfg = MaintainedJoinReportConfig(
        fact_path=fact.root,
        fact_name="orders_o",
        dim_path=dim.root,
        dim_name="customers_o",
        on=("cust", "ckey"),
        group_cols=["segment"],
        sum_cols=["amount"],
        view_path=str(tmp_path / "oview"),
        report_base=str(tmp_path / "oreports"),
        checkpoint_root=str(tmp_path / "ock"),
    )
    FACT_S = "okey int, opre int, cust int, amount long"
    DIM_S = "ckey int, cpre int, segment string"
    dim.upsert(spark.createDataFrame([(1, 0, "A"), (2, 0, "B")], DIM_S))
    fact.upsert(
        spark.createDataFrame([(10, 0, 1, 5), (11, 0, 2, 9)], FACT_S)
    )
    run_maintained_join_report(spark, cfg, sender=EmailSender())

    # replace the whole dimension (new segmentation scheme)
    dim.overwrite(
        spark.createDataFrame([(1, 0, "Z"), (2, 0, "Z")], DIM_S)
    )
    res = run_maintained_join_report(spark, cfg, sender=EmailSender())
    assert sorted(
        (r["segment"], r["n_rows"], r["sum_amount"]) for r in res.df.collect()
    ) == [("Z", 2, 14)]

    # incremental maintenance resumes cleanly after the heal
    fact.upsert(spark.createDataFrame([(12, 0, 1, 100)], FACT_S))
    res2 = run_maintained_join_report(spark, cfg, sender=EmailSender())
    assert sorted(
        (r["segment"], r["n_rows"], r["sum_amount"])
        for r in res2.df.collect()
    ) == [("Z", 3, 114)]
    fs, ds = fact.snapshot(), dim.snapshot()
    assert sorted(
        (r["segment"], r["n_rows"], r["sum_amount"])
        for r in fs.join(ds, fs["cust"] == ds["ckey"])
        .groupBy("segment")
        .agg(F.count(F.lit(1)).alias("n_rows"), F.sum("amount").alias("sum_amount"))
        .collect()
    ) == [("Z", 3, 114)]


def test_maintained_join_report_dim_first_seed(spark, tmp_path):
    """A dim-only window at fact genesis folds to nothing (F₀ empty):
    the run returns None, consumes the window, and the first fact
    window later produces the correct joined report — plus the N:1
    contract check rejects a non-record-key dim join column."""
    import pytest

    from sending_weekly_daily_csv_reports_from_hudi_datalake_to_customers_via_email_using_glue_and_sns_or_ses_spark.pipeline import (
        MaintainedJoinReportConfig,
        run_maintained_join_report,
    )
    from sending_weekly_daily_csv_reports_from_hudi_datalake_to_customers_via_email_using_glue_and_sns_or_ses_spark.sinks.upsert import (
        KeyedTable,
    )

    fact = KeyedTable(
        spark, str(tmp_path / "sfact"), record_key="okey", precombine="opre"
    )
    dim = KeyedTable(
        spark, str(tmp_path / "sdim"), record_key="ckey", precombine="cpre"
    )

    def cfg(on):
        return MaintainedJoinReportConfig(
            fact_path=fact.root,
            fact_name="orders_s",
            dim_path=dim.root,
            dim_name="customers_s",
            on=on,
            group_cols=["segment"],
            sum_cols=["amount"],
            view_path=str(tmp_path / "sview"),
            report_base=str(tmp_path / "sreports"),
            checkpoint_root=str(tmp_path / "sck"),
        )

    DIM_S = "ckey int, cpre int, segment string"
    dim.upsert(spark.createDataFrame([(1, 0, "X")], DIM_S))
    with pytest.raises(ValueError, match="record key"):
        run_maintained_join_report(
            spark, cfg(("cust", "segment")), sender=EmailSender()
        )
    # dim seeded, fact empty: no report, window consumed
    assert (
        run_maintained_join_report(
            spark, cfg(("cust", "ckey")), sender=EmailSender()
        )
        is None
    )
    fact.upsert(
        spark.createDataFrame(
            [(10, 0, 1, 5)], "okey int, opre int, cust int, amount long"
        )
    )
    res = run_maintained_join_report(
        spark, cfg(("cust", "ckey")), sender=EmailSender()
    )
    assert sorted(
        (r["segment"], r["n_rows"], r["sum_amount"]) for r in res.df.collect()
    ) == [("X", 1, 5)]


def test_maintained_join_report_gate_fails_before_publish(spark, tmp_path):
    """The join loop's quality gate runs PRE-pointer-flip (r8 review):
    a red window leaves the previous view version live, the pair token
    unchanged, and BOTH readers unconsumed — so the next run genuinely
    retries the window instead of the old behavior (bad aggregate
    published + token advanced, then the quiescent branch silently
    marked the window consumed and the report stopped forever)."""
    import pytest

    from sending_weekly_daily_csv_reports_from_hudi_datalake_to_customers_via_email_using_glue_and_sns_or_ses_spark.operators.ivm import (
        MaintainedJoinAggregate,
    )
    from sending_weekly_daily_csv_reports_from_hudi_datalake_to_customers_via_email_using_glue_and_sns_or_ses_spark.operators.quality import (
        DataQualityError,
        min_rows,
    )
    from sending_weekly_daily_csv_reports_from_hudi_datalake_to_customers_via_email_using_glue_and_sns_or_ses_spark.pipeline import (
        MaintainedJoinReportConfig,
        run_maintained_join_report,
    )
    from sending_weekly_daily_csv_reports_from_hudi_datalake_to_customers_via_email_using_glue_and_sns_or_ses_spark.sinks.upsert import (
        KeyedTable,
    )

    fact = KeyedTable(
        spark, str(tmp_path / "gfact"), record_key="okey", precombine="opre"
    )
    dim = KeyedTable(
        spark, str(tmp_path / "gdim"), record_key="ckey", precombine="cpre"
    )
    cfg = MaintainedJoinReportConfig(
        fact_path=fact.root,
        fact_name="orders_g",
        dim_path=dim.root,
        dim_name="customers_g",
        on=("cust", "ckey"),
        group_cols=["segment"],
        sum_cols=["amount"],
        view_path=str(tmp_path / "gview"),
        report_base=str(tmp_path / "greports"),
        checkpoint_root=str(tmp_path / "gck"),
        recipients=["a@example.com"],
        quality_rules=[min_rows(2)],  # needs >= 2 groups
    )
    sender = EmailSender()
    FACT_S = "okey int, opre int, cust int, amount long"
    DIM_S = "ckey int, cpre int, segment string"
    dim.upsert(
        spark.createDataFrame([(1, 0, "RETAIL"), (2, 0, "AUTO")], DIM_S)
    )
    # first window joins only segment RETAIL -> 1 group -> gate fails
    fact.upsert(spark.createDataFrame([(10, 0, 1, 100)], FACT_S))
    with pytest.raises(DataQualityError, match="min_rows"):
        run_maintained_join_report(spark, cfg, sender=sender)
    assert sender.outbox == []
    view = MaintainedJoinAggregate(
        spark, cfg.view_path, on=("cust", "ckey"),
        group_cols=["segment"], sum_cols=["amount"],
    )
    # nothing published: no live version, no token
    assert view.current() is None and view.through() is None
    # new commits repair the data; the retried run folds the ORIGINAL
    # window plus the fix (both readers stayed unconsumed) and delivers
    fact.upsert(spark.createDataFrame([(11, 0, 2, 7)], FACT_S))
    res = run_maintained_join_report(spark, cfg, sender=sender)
    assert res is not None and len(sender.outbox) == 1
    assert sorted(
        (r["segment"], r["n_rows"], r["sum_amount"])
        for r in res.df.collect()
    ) == [("AUTO", 1, 7), ("RETAIL", 1, 100)]


def test_star_apply_rejects_token_missing_a_side(spark, tmp_path):
    """MaintainedStarAggregate.apply must raise when the through token
    omits a side the view has covered (r8 review): a None instant
    means genesis-empty to the pinned-state terms, so an omitted side
    would silently drop the fact term AND regress the published
    token."""
    import pytest

    from sending_weekly_daily_csv_reports_from_hudi_datalake_to_customers_via_email_using_glue_and_sns_or_ses_spark.operators.ivm import (
        MaintainedStarAggregate,
    )
    from sending_weekly_daily_csv_reports_from_hudi_datalake_to_customers_via_email_using_glue_and_sns_or_ses_spark.sinks.upsert import (
        KeyedTable,
    )

    fact = KeyedTable(
        spark, str(tmp_path / "sfact"), record_key="fk", precombine="fpre",
        keep_versions=10,
    )
    cust = KeyedTable(
        spark, str(tmp_path / "scust"), record_key="ck", precombine="cpre",
        keep_versions=10,
    )
    part = KeyedTable(
        spark, str(tmp_path / "spart"), record_key="pk", precombine="ppre",
        keep_versions=10,
    )
    view = MaintainedStarAggregate(
        spark,
        str(tmp_path / "sview"),
        dims=[("cust", "ck", "ck"), ("part", "pk", "pk")],
        group_cols=["seg", "cat"],
        sum_cols=["amount"],
    )
    c1 = cust.upsert(
        spark.createDataFrame([(1, 0, "x")], "ck int, cpre int, seg string")
    )
    p1 = part.upsert(
        spark.createDataFrame([(1, 0, "m")], "pk int, ppre int, cat string")
    )
    f1 = fact.upsert(
        spark.createDataFrame(
            [(10, 0, 1, 1, 7)], "fk int, fpre int, ck int, pk int, amount long"
        )
    )
    states = {
        "cust": lambda t: cust.snapshot(as_of=t),
        "part": lambda t: part.snapshot(as_of=t),
    }
    view.apply(
        fact.cdc(end=f1),
        {"cust": cust.cdc(end=c1), "part": part.cdc(end=p1)},
        dim_states=states,
        through={"fact": f1, "cust": c1, "part": p1},
    )
    f2 = fact.upsert(
        spark.createDataFrame(
            [(11, 0, 1, 1, 5)], "fk int, fpre int, ck int, pk int, amount long"
        )
    )
    # 'part' omitted from the token — must raise, not silently fold
    # the fact window against an empty part dimension
    with pytest.raises(ValueError, match="omits side 'part'"):
        view.apply(
            fact.cdc(begin=f1, end=f2),
            {"cust": None, "part": None},
            dim_states=states,
            fact_base=lambda: fact.snapshot(as_of=f1),
            through={"fact": f2, "cust": c1},
        )
    # the correctly carried-forward token folds fine
    view.apply(
        fact.cdc(begin=f1, end=f2),
        {"cust": None, "part": None},
        dim_states=states,
        fact_base=lambda: fact.snapshot(as_of=f1),
        through={"fact": f2, "cust": c1, "part": p1},
    )
    assert [
        (r["seg"], r["cat"], r["n_rows"], r["sum_amount"])
        for r in view.current().collect()
    ] == [("x", "m", 2, 12)]


def test_maintained_star_report_loop(spark, tmp_path):
    """run_maintained_star_report (r8): the k-dim scheduled loop —
    three-way seed, quiescent no-op, fact-only delta, one-dim
    migration, BOTH dims in one run, dim replace self-heal — the
    maintained view must equal a direct star recompute at every
    step."""
    from pyspark.sql import functions as F

    from sending_weekly_daily_csv_reports_from_hudi_datalake_to_customers_via_email_using_glue_and_sns_or_ses_spark.pipeline import (
        MaintainedStarReportConfig,
        run_maintained_star_report,
    )
    from sending_weekly_daily_csv_reports_from_hudi_datalake_to_customers_via_email_using_glue_and_sns_or_ses_spark.sinks.upsert import (
        KeyedTable,
    )

    fact = KeyedTable(
        spark, str(tmp_path / "stfact"), record_key="okey",
        precombine="opre", keep_versions=10,
    )
    cust = KeyedTable(
        spark, str(tmp_path / "stcust"), record_key="ck",
        precombine="cpre", keep_versions=10,
    )
    part = KeyedTable(
        spark, str(tmp_path / "stpart"), record_key="pk",
        precombine="ppre", keep_versions=10,
    )
    cfg = MaintainedStarReportConfig(
        fact_path=fact.root,
        fact_name="orders_st",
        dims=[
            ("cust", cust.root, "cust", "ck"),
            ("part", part.root, "prt", "pk"),
        ],
        group_cols=["segment", "cat"],
        sum_cols=["amount"],
        view_path=str(tmp_path / "stview"),
        report_base=str(tmp_path / "streports"),
        checkpoint_root=str(tmp_path / "stck"),
        recipients=["a@example.com"],
    )
    sender = EmailSender()

    def recompute():
        fs, cs, ps = fact.snapshot(), cust.snapshot(), part.snapshot()
        if fs is None or cs is None or ps is None:
            return []
        return sorted(
            (r["segment"], r["cat"], r["n_rows"], r["sum_amount"])
            for r in fs.join(cs, fs["cust"] == cs["ck"])
            .join(ps, fs["prt"] == ps["pk"])
            .groupBy("segment", "cat")
            .agg(
                F.count(F.lit(1)).alias("n_rows"),
                F.sum("amount").alias("sum_amount"),
            )
            .collect()
        )

    def rows(df):
        return sorted(
            (r["segment"], r["cat"], r["n_rows"], r["sum_amount"])
            for r in df.collect()
        )

    FACT_S = "okey int, opre int, cust int, prt int, amount long"
    CUST_S = "ck int, cpre int, segment string"
    PART_S = "pk int, ppre int, cat string"
    cust.upsert(
        spark.createDataFrame([(1, 0, "RETAIL"), (2, 0, "AUTO")], CUST_S)
    )
    part.upsert(spark.createDataFrame([(1, 0, "A"), (2, 0, "B")], PART_S))
    fact.upsert(
        spark.createDataFrame(
            [(10, 0, 1, 1, 100), (11, 0, 1, 2, 50), (12, 0, 2, 1, 7)],
            FACT_S,
        )
    )
    res = run_maintained_star_report(spark, cfg, sender=sender)
    assert rows(res.df) == recompute() == [
        ("AUTO", "A", 1, 7), ("RETAIL", "A", 1, 100), ("RETAIL", "B", 1, 50)
    ]
    assert len(sender.outbox) == 1

    # quiescent → no report
    assert run_maintained_star_report(spark, cfg, sender=sender) is None
    assert len(sender.outbox) == 1

    # fact-only window
    fact.delete(spark.createDataFrame([(11,)], "okey int"))
    res2 = run_maintained_star_report(spark, cfg, sender=sender)
    assert rows(res2.df) == recompute()

    # one-dim migration (cust 1 RETAIL -> AUTO)
    cust.upsert(spark.createDataFrame([(1, 1, "AUTO")], CUST_S))
    res3 = run_maintained_star_report(spark, cfg, sender=sender)
    assert rows(res3.df) == recompute() == [("AUTO", "A", 2, 107)]

    # BOTH dims change in one run (the telescoped pinning path)
    cust.upsert(spark.createDataFrame([(2, 1, "GOV")], CUST_S))
    part.upsert(spark.createDataFrame([(1, 1, "C")], PART_S))
    res4 = run_maintained_star_report(spark, cfg, sender=sender)
    assert rows(res4.df) == recompute() == [
        ("AUTO", "C", 1, 100), ("GOV", "C", 1, 7)
    ]

    # replace on a dim: self-heal by rebuild from the star snapshot,
    # then incremental maintenance resumes
    part.overwrite(spark.createDataFrame([(1, 5, "Z")], PART_S))
    res5 = run_maintained_star_report(spark, cfg, sender=sender)
    assert rows(res5.df) == recompute() == [
        ("AUTO", "Z", 1, 100), ("GOV", "Z", 1, 7)
    ]
    fact.upsert(spark.createDataFrame([(13, 0, 1, 1, 3)], FACT_S))
    res6 = run_maintained_star_report(spark, cfg, sender=sender)
    assert rows(res6.df) == recompute() == [
        ("AUTO", "Z", 2, 103), ("GOV", "Z", 1, 7)
    ]


def test_maintained_star_report_gate_fails_before_publish(spark, tmp_path):
    """The star loop's quality gate runs pre-pointer-flip, same as the
    join loop's (r8 review): a red window set publishes nothing,
    leaves the token unset, and keeps every reader unconsumed — the
    retried run folds the original windows plus the fix and
    delivers."""
    import pytest

    from sending_weekly_daily_csv_reports_from_hudi_datalake_to_customers_via_email_using_glue_and_sns_or_ses_spark.operators.ivm import (
        MaintainedStarAggregate,
    )
    from sending_weekly_daily_csv_reports_from_hudi_datalake_to_customers_via_email_using_glue_and_sns_or_ses_spark.operators.quality import (
        DataQualityError,
        min_rows,
    )
    from sending_weekly_daily_csv_reports_from_hudi_datalake_to_customers_via_email_using_glue_and_sns_or_ses_spark.pipeline import (
        MaintainedStarReportConfig,
        run_maintained_star_report,
    )
    from sending_weekly_daily_csv_reports_from_hudi_datalake_to_customers_via_email_using_glue_and_sns_or_ses_spark.sinks.upsert import (
        KeyedTable,
    )

    fact = KeyedTable(
        spark, str(tmp_path / "sgfact"), record_key="okey",
        precombine="opre", keep_versions=10,
    )
    cust = KeyedTable(
        spark, str(tmp_path / "sgcust"), record_key="ck",
        precombine="cpre", keep_versions=10,
    )
    part = KeyedTable(
        spark, str(tmp_path / "sgpart"), record_key="pk",
        precombine="ppre", keep_versions=10,
    )
    cfg = MaintainedStarReportConfig(
        fact_path=fact.root,
        fact_name="orders_sg",
        dims=[
            ("cust", cust.root, "cust", "ck"),
            ("part", part.root, "prt", "pk"),
        ],
        group_cols=["segment", "cat"],
        sum_cols=["amount"],
        view_path=str(tmp_path / "sgview"),
        report_base=str(tmp_path / "sgreports"),
        checkpoint_root=str(tmp_path / "sgck"),
        recipients=["a@example.com"],
        quality_rules=[min_rows(2)],
    )
    sender = EmailSender()
    cust.upsert(
        spark.createDataFrame(
            [(1, 0, "RETAIL"), (2, 0, "AUTO")],
            "ck int, cpre int, segment string",
        )
    )
    part.upsert(
        spark.createDataFrame([(1, 0, "A")], "pk int, ppre int, cat string")
    )
    fact.upsert(
        spark.createDataFrame(
            [(10, 0, 1, 1, 100)],
            "okey int, opre int, cust int, prt int, amount long",
        )
    )
    with pytest.raises(DataQualityError, match="min_rows"):
        run_maintained_star_report(spark, cfg, sender=sender)
    assert sender.outbox == []
    view = MaintainedStarAggregate(
        spark, cfg.view_path,
        dims=[("cust", "cust", "ck"), ("part", "prt", "pk")],
        group_cols=["segment", "cat"], sum_cols=["amount"],
    )
    assert view.current() is None and view.through() is None
    # the fix arrives; the retried run folds everything and delivers
    fact.upsert(
        spark.createDataFrame(
            [(11, 0, 2, 1, 7)],
            "okey int, opre int, cust int, prt int, amount long",
        )
    )
    res = run_maintained_star_report(spark, cfg, sender=sender)
    assert res is not None and len(sender.outbox) == 1
    assert sorted(
        (r["segment"], r["cat"], r["n_rows"], r["sum_amount"])
        for r in res.df.collect()
    ) == [("AUTO", "A", 1, 7), ("RETAIL", "A", 1, 100)]


def test_maintained_join_report_drift_gate(spark, tmp_path):
    """metric_history_path on the JOIN loop (ADVICE r8: drift gating
    was single-table only): clean runs build the baseline, a drifting
    window fails pre-delivery with the pair unconsumed, the failed
    run's metrics land in the history, and the retried run recovers."""
    import pytest

    from sending_weekly_daily_csv_reports_from_hudi_datalake_to_customers_via_email_using_glue_and_sns_or_ses_spark.operators.quality import (
        DataQualityError,
        MetricHistory,
        completeness,
        min_rows,
    )
    from sending_weekly_daily_csv_reports_from_hudi_datalake_to_customers_via_email_using_glue_and_sns_or_ses_spark.pipeline import (
        MaintainedJoinReportConfig,
        run_maintained_join_report,
    )
    from sending_weekly_daily_csv_reports_from_hudi_datalake_to_customers_via_email_using_glue_and_sns_or_ses_spark.sinks.upsert import (
        KeyedTable,
    )

    fact = KeyedTable(
        spark, str(tmp_path / "dfact"), record_key="okey", precombine="opre"
    )
    dim = KeyedTable(
        spark, str(tmp_path / "ddim"), record_key="ckey", precombine="cpre"
    )
    cfg = MaintainedJoinReportConfig(
        fact_path=fact.root,
        fact_name="orders_dj",
        dim_path=dim.root,
        dim_name="customers_dj",
        on=("cust", "ckey"),
        group_cols=["segment"],
        sum_cols=["amount"],
        view_path=str(tmp_path / "djview"),
        report_base=str(tmp_path / "djreports"),
        checkpoint_root=str(tmp_path / "djck"),
        recipients=["a@example.com"],
        quality_rules=[min_rows(1), completeness("sum_amount", 0.4)],
        metric_history_path=str(tmp_path / "djhist"),
        max_rel_change=0.4,
    )
    sender = EmailSender()
    FACT_S = "okey int, opre int, cust int, amount long"
    dim.upsert(
        spark.createDataFrame(
            [(1, 0, "RETAIL"), (2, 0, "AUTO")],
            "ckey int, cpre int, segment string",
        )
    )
    # three clean runs: completeness(sum_amount) = 1.0 baseline
    for i in range(3):
        fact.upsert(
            spark.createDataFrame(
                [(i * 2, 0, 1, 100), (i * 2 + 1, 0, 2, 5)], FACT_S
            )
        )
        assert (
            run_maintained_join_report(spark, cfg, sender=sender)
            is not None
        )
    assert len(sender.outbox) == 3
    # NULL-amount rows across many fresh dim keys crater completeness:
    # above the 0.4 absolute floor but >40% below the 1.0 baseline
    dim.upsert(
        spark.createDataFrame(
            [(10 + i, 0, f"g{i}") for i in range(6)],
            "ckey int, cpre int, segment string",
        )
    )
    fact.upsert(
        spark.createDataFrame(
            [(100 + i, 0, 10 + i, None) for i in range(6)], FACT_S
        )
    )
    with pytest.raises(DataQualityError, match="drifted"):
        run_maintained_join_report(spark, cfg, sender=sender)
    assert len(sender.outbox) == 3  # nothing delivered
    hist = MetricHistory(spark, cfg.metric_history_path)
    assert hist.load().select("run").distinct().count() == 4
    # fix the data; the UNCONSUMED pair plus the fix retries green
    fact.delete(
        spark.createDataFrame([(100 + i,) for i in range(6)], "okey int")
    )
    res = run_maintained_join_report(spark, cfg, sender=sender)
    assert res is not None and len(sender.outbox) == 4


@pytest.mark.slow
def test_maintained_report_distinct_columns(spark, tmp_path):
    """distinct_cols on the scheduled loop (r9): reports carry exact
    distinct_<c> columns maintained through deletes that un-distinct a
    value, and a source replace re-seeds the auxiliary state with the
    view."""
    from sending_weekly_daily_csv_reports_from_hudi_datalake_to_customers_via_email_using_glue_and_sns_or_ses_spark.pipeline import (
        MaintainedReportConfig,
        run_maintained_report,
    )
    from sending_weekly_daily_csv_reports_from_hudi_datalake_to_customers_via_email_using_glue_and_sns_or_ses_spark.sinks.upsert import (
        KeyedTable,
    )

    src = KeyedTable(
        spark, str(tmp_path / "dsrc2"), record_key="k", precombine="pre"
    )
    cfg = MaintainedReportConfig(
        source_path=src.root,
        table_name="dsrc2",
        group_cols=["grp"],
        sum_cols=["amount"],
        view_path=str(tmp_path / "dview2"),
        report_base=str(tmp_path / "dreports2"),
        checkpoint_root=str(tmp_path / "dck2"),
        recipients=["a@example.com"],
        distinct_cols=["amount"],
    )
    sender = EmailSender()
    sch = "k int, pre int, grp string, amount long"
    src.upsert(
        spark.createDataFrame(
            [(1, 1, "a", 10), (2, 1, "a", 10), (3, 1, "a", 20)], sch
        )
    )
    res = run_maintained_report(spark, cfg, sender=sender)
    row = {r["grp"]: r for r in res.df.collect()}["a"]
    assert row["distinct_amount"] == 2 and row["avg_amount"] > 0
    # delete ONE of the twin 10s: distinct stays 2
    src.delete(spark.createDataFrame([(1,)], "k int"))
    res = run_maintained_report(spark, cfg, sender=sender)
    assert res.df.collect()[0]["distinct_amount"] == 2
    # delete the second 10: the value drops out
    src.delete(spark.createDataFrame([(2,)], "k int"))
    res = run_maintained_report(spark, cfg, sender=sender)
    assert res.df.collect()[0]["distinct_amount"] == 1
    # replace re-seeds view AND aux together
    src.overwrite(
        spark.createDataFrame(
            [(7, 1, "b", 5), (8, 1, "b", 5), (9, 1, "b", 6)], sch
        )
    )
    res = run_maintained_report(spark, cfg, sender=sender)
    row = {r["grp"]: r for r in res.df.collect()}["b"]
    assert row["n_rows"] == 3 and row["distinct_amount"] == 2


def test_maintained_left_star_report_loop(spark, tmp_path):
    """r10: the scheduled star loop with how='left' — unmatched fact
    rows report under NULL dim attributes at seed, a late-arriving dim
    key migrates them out through the loop's normal window fold, and
    every step equals the direct LEFT-star recompute."""
    from pyspark.sql import functions as F

    from sending_weekly_daily_csv_reports_from_hudi_datalake_to_customers_via_email_using_glue_and_sns_or_ses_spark.pipeline import (
        MaintainedStarReportConfig,
        run_maintained_star_report,
    )
    from sending_weekly_daily_csv_reports_from_hudi_datalake_to_customers_via_email_using_glue_and_sns_or_ses_spark.sinks.upsert import (
        KeyedTable,
    )

    fact = KeyedTable(
        spark, str(tmp_path / "lfact"), record_key="okey",
        precombine="opre", keep_versions=10,
    )
    cust = KeyedTable(
        spark, str(tmp_path / "lcust"), record_key="ck",
        precombine="cpre", keep_versions=10,
    )
    part = KeyedTable(
        spark, str(tmp_path / "lpart"), record_key="pk",
        precombine="ppre", keep_versions=10,
    )
    cfg = MaintainedStarReportConfig(
        fact_path=fact.root,
        fact_name="orders_lst",
        dims=[
            ("cust", cust.root, "cust", "ck"),
            ("part", part.root, "prt", "pk"),
        ],
        group_cols=["segment", "cat"],
        sum_cols=["amount"],
        view_path=str(tmp_path / "lview"),
        report_base=str(tmp_path / "lreports"),
        checkpoint_root=str(tmp_path / "lck"),
        how="left",
    )
    sender = EmailSender()

    def key_nf(t):
        return tuple((v is not None, v) for v in t)

    def recompute():
        fs, cs, ps = fact.snapshot(), cust.snapshot(), part.snapshot()
        return sorted(
            (
                (r["segment"], r["cat"], r["n_rows"], r["sum_amount"])
                for r in fs.join(cs, fs["cust"] == cs["ck"], "left")
                .join(ps, fs["prt"] == ps["pk"], "left")
                .groupBy("segment", "cat")
                .agg(
                    F.count(F.lit(1)).alias("n_rows"),
                    F.sum("amount").alias("sum_amount"),
                )
                .collect()
            ),
            key=key_nf,
        )

    def rows(df):
        return sorted(
            (
                (r["segment"], r["cat"], r["n_rows"], r["sum_amount"])
                for r in df.collect()
            ),
            key=key_nf,
        )

    FACT_S = "okey int, opre int, cust int, prt int, amount long"
    cust.upsert(spark.createDataFrame(
        [(1, 0, "RETAIL")], "ck int, cpre int, segment string"))
    part.upsert(spark.createDataFrame(
        [(1, 0, "A")], "pk int, ppre int, cat string"))
    fact.upsert(spark.createDataFrame(
        [(10, 0, 1, 1, 100), (11, 0, 9, 1, 50), (12, 0, 1, 9, 7)],
        FACT_S,
    ))  # cust=9 / prt=9 unmatched
    res = run_maintained_star_report(spark, cfg, sender=sender)
    assert rows(res.df) == recompute() == [
        (None, "A", 1, 50), ("RETAIL", None, 1, 7),
        ("RETAIL", "A", 1, 100),
    ]
    # a late-arriving dim key: the next run's window fold migrates the
    # NULL-group row out through the existence counterweight
    cust.upsert(spark.createDataFrame(
        [(9, 1, "NEW")], "ck int, cpre int, segment string"))
    res = run_maintained_star_report(spark, cfg, sender=sender)
    assert rows(res.df) == recompute() == [
        ("NEW", "A", 1, 50), ("RETAIL", None, 1, 7),
        ("RETAIL", "A", 1, 100),
    ]


def test_maintained_left_join_report_loop(spark, tmp_path):
    """r10: the scheduled 2-table loop with how='left' — unmatched fact
    rows report under the NULL dim group and a late dim key migrates
    them out through the loop's window fold."""
    from pyspark.sql import functions as F

    from sending_weekly_daily_csv_reports_from_hudi_datalake_to_customers_via_email_using_glue_and_sns_or_ses_spark.pipeline import (
        MaintainedJoinReportConfig,
        run_maintained_join_report,
    )
    from sending_weekly_daily_csv_reports_from_hudi_datalake_to_customers_via_email_using_glue_and_sns_or_ses_spark.sinks.upsert import (
        KeyedTable,
    )

    fact = KeyedTable(
        spark, str(tmp_path / "ljf"), record_key="okey",
        precombine="opre", keep_versions=10,
    )
    dim = KeyedTable(
        spark, str(tmp_path / "ljd"), record_key="ck",
        precombine="cpre", keep_versions=10,
    )
    cfg = MaintainedJoinReportConfig(
        fact_path=fact.root,
        fact_name="orders_lj",
        dim_path=dim.root,
        dim_name="cust_lj",
        on=("cust", "ck"),
        group_cols=["segment"],
        sum_cols=["amount"],
        view_path=str(tmp_path / "ljview"),
        report_base=str(tmp_path / "ljreports"),
        checkpoint_root=str(tmp_path / "ljck"),
        how="left",
    )
    sender = EmailSender()

    def key_nf(t):
        return tuple((v is not None, v) for v in t)

    def rows(df):
        return sorted(
            (
                (r["segment"], r["n_rows"], r["sum_amount"])
                for r in df.collect()
            ),
            key=key_nf,
        )

    dim.upsert(spark.createDataFrame(
        [(1, 0, "RETAIL")], "ck int, cpre int, segment string"))
    fact.upsert(spark.createDataFrame(
        [(10, 0, 1, 100), (11, 0, 9, 50)],
        "okey int, opre int, cust int, amount long"))  # cust=9 unmatched
    res = run_maintained_join_report(spark, cfg, sender=sender)
    assert rows(res.df) == [(None, 1, 50), ("RETAIL", 1, 100)]
    dim.upsert(spark.createDataFrame(
        [(9, 1, "NEW")], "ck int, cpre int, segment string"))
    res = run_maintained_join_report(spark, cfg, sender=sender)
    fs, ds = fact.snapshot(), dim.snapshot()
    want = sorted(
        (
            (r["segment"], r["n_rows"], r["sum_amount"])
            for r in fs.join(ds, fs["cust"] == ds["ck"], "left")
            .groupBy("segment")
            .agg(
                F.count(F.lit(1)).alias("n_rows"),
                F.sum("amount").alias("sum_amount"),
            )
            .collect()
        ),
        key=key_nf,
    )
    assert rows(res.df) == want == [("NEW", 1, 50), ("RETAIL", 1, 100)]
