"""Data-quality verification (operators/quality.py): metric math on
crafted frames (nulls, dups, out-of-range, broken FKs), vacuous truth
on empty input, the expect() circuit breaker, validation, and the
single-scan plan shape."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from sending_weekly_daily_csv_reports_from_hudi_datalake_to_customers_via_email_using_glue_and_sns_or_ses_spark.operators import (
    QUERIES,
)
from sending_weekly_daily_csv_reports_from_hudi_datalake_to_customers_via_email_using_glue_and_sns_or_ses_spark.operators.quality import (
    DataQualityError,
    completeness,
    expect,
    in_range,
    in_set,
    matches,
    min_rows,
    referential,
    run_checks,
    uniqueness,
)

SF = "/root/testdata/sf0.001"


def _frame(spark):
    # 10 rows: 2 NULL vals, key 5 duplicated, v=99 out of [0,10],
    # s='x' outside {a,b}
    rows = [
        (1, 1.0, "a"),
        (2, 2.0, "a"),
        (3, None, "b"),
        (4, 4.0, "b"),
        (5, 5.0, "a"),
        (5, 6.0, "a"),
        (7, 99.0, "b"),
        (8, 8.0, "x"),
        (9, None, "a"),
        (10, 10.0, "b"),
    ]
    return spark.createDataFrame(rows, "k long, v double, s string")


def _report(spark, rules, **kw):
    return {
        (r["rule"], r["column"]): (r["metric"], r["passed"])
        for r in run_checks(_frame(spark), rules, **kw).collect()
    }


def test_metric_math_on_crafted_frame(spark):
    got = _report(
        spark,
        [
            completeness("v"),
            uniqueness("k"),
            in_range("v", 0, 10),
            in_set("s", ["a", "b"]),
            matches("s", "^[ab]$"),
            min_rows(11),
        ],
    )
    assert got[("completeness", "v")] == (0.8, False)
    # 9 distinct of 10 non-null keys
    assert got[("uniqueness", "k")] == (0.9, False)
    # 8 non-null v, 1 out of range
    assert got[("in_range", "v")] == (7 / 8, False)
    # 10 non-null s, 1 outside the set
    assert got[("in_set", "s")] == (0.9, False)
    assert got[("matches", "s")] == (0.9, False)
    m, p = got[("min_rows", None)]
    assert (m, p) == (10.0, False)


def test_thresholds_make_rules_pass(spark):
    got = _report(
        spark,
        [
            completeness("v", threshold=0.7),
            in_range("v", 0, 10, threshold=0.8),
        ],
    )
    assert all(p for _, p in got.values())


def test_referential_integrity(spark):
    dim = spark.createDataFrame([(1,), (2,), (3,)], "id long")
    df = spark.createDataFrame(
        [(1,), (2,), (2,), (4,), (None,)], "fk long"
    )
    rep = run_checks(df, [referential("fk", dim, "id")]).collect()[0]
    # NULL fk is completeness's business: 3 of 4 non-null match
    assert rep["metric"] == 0.75 and not rep["passed"]


def test_vacuous_truth_on_empty_input(spark):
    empty = spark.createDataFrame([], "k long, v double, s string")
    rep = {
        (r["rule"], r["column"]): (r["metric"], r["passed"])
        for r in run_checks(
            empty,
            [
                completeness("v"),
                uniqueness("k"),
                in_range("v", 0, 1),
                min_rows(1),
            ],
        ).collect()
    }
    assert rep[("completeness", "v")] == (1.0, True)
    assert rep[("uniqueness", "k")] == (1.0, True)
    assert rep[("in_range", "v")] == (1.0, True)
    assert rep[("min_rows", None)] == (0.0, False)  # the emptiness rule


def test_expect_raises_listing_failures(spark):
    with pytest.raises(DataQualityError, match="uniqueness"):
        expect(_frame(spark), [uniqueness("k")])
    # and is silent when everything passes
    expect(_frame(spark), [in_set("s", ["a", "b", "x"])])


def test_validation_errors(spark):
    with pytest.raises(ValueError, match="empty rule list"):
        run_checks(_frame(spark), [])
    with pytest.raises(ValueError, match="not in schema"):
        run_checks(_frame(spark), [completeness("nope")])


def test_approx_uniqueness_mode(spark):
    rep = run_checks(
        _frame(spark), [uniqueness("k", threshold=0.85)],
        exact_uniqueness=False,
    ).collect()[0]
    # HLL on 10 values is exact in practice; the contract is ±2% s.e.
    assert abs(rep["metric"] - 0.9) < 0.05


def test_single_scan_plan_shape(spark):
    """All scan rules fold into ONE aggregate over one relation scan —
    the Deequ property that makes 50 rules cost one pass at 100 TB."""
    from sending_weekly_daily_csv_reports_from_hudi_datalake_to_customers_via_email_using_glue_and_sns_or_ses_spark.plans.explain import (
        physical_plan,
    )

    rep = run_checks(
        _frame(spark),
        [
            completeness("v"),
            in_range("v", 0, 10),
            in_set("s", ["a", "b"]),
            matches("s", "^[ab]$"),
            min_rows(1),
        ],
    )
    plan = physical_plan(rep)
    # one scan of the in-memory relation (no per-rule re-scans)
    assert plan.count("LocalTableScan") + plan.count("Scan ExistingRDD") <= 2


def test_driver_entry_rows_and_failing_rule(spark):
    rep = QUERIES["dq_report"](spark, SF).toPandas()
    table = rep[rep.scope == "table"]
    grouped = rep[rep.scope != "table"]
    assert len(table) == 6
    # grouped lane (r8): 2 rules × one row per o_orderstatus group
    assert len(grouped) % 2 == 0 and len(grouped) >= 4
    assert set(grouped.scope.str.startswith("status=")) == {True}
    byrule = {(r.rule, r.column): r for r in table.itertuples()}
    # FK integrity and key uniqueness hold on the generated data
    assert byrule[("uniqueness", "o_orderkey")].passed
    assert byrule[("referential", "o_custkey")].passed
    # the deliberately binding range rule actually bites (metric < 1)
    assert table[(table.rule == "in_range")].metric.min() < 1.0
    # per-group metrics are real fractions and the binding rule varies
    # by group (the reason the grouped lane exists)
    assert grouped.metric.between(0, 1).all()


def test_metric_history_drift(spark, tmp_path):
    """MetricHistory: stable metrics don't drift, a sudden drop does,
    the first run has no baseline, and re-appending a run_id is
    idempotent."""
    from sending_weekly_daily_csv_reports_from_hudi_datalake_to_customers_via_email_using_glue_and_sns_or_ses_spark.operators.quality import (
        MetricHistory,
    )

    hist = MetricHistory(spark, str(tmp_path / "dqhist"))

    def report(metric):
        return spark.createDataFrame(
            [(0, "completeness", "v", metric, 1.0, metric >= 1.0),
             (1, "uniqueness", None, 100.0, 1.0, True)],
            "rule_seq int, rule string, column string, metric double, "
            "threshold double, passed boolean",
        )

    # first run: drift undefined, not failed
    first = hist.check_drift(report(0.98), "r1").collect()
    assert all(not r["drifted"] and r["baseline"] is None for r in first)
    hist.append(report(0.98), "r1")
    hist.append(report(0.97), "r2")
    hist.append(report(0.99), "r3")
    # stable metric: no drift at 10%
    ok = {
        (r["rule"]): r["drifted"]
        for r in hist.check_drift(report(0.98), "r4").collect()
    }
    assert ok == {"completeness": False, "uniqueness": False}
    # sudden drop: completeness drifts, the NULL-column rule joins
    # NULL-safely and stays quiet
    bad = {
        r["rule"]: (r["drifted"], r["rel_change"])
        for r in hist.check_drift(report(0.70), "r4").collect()
    }
    assert bad["completeness"][0] and bad["completeness"][1] > 0.1
    assert not bad["uniqueness"][0]
    # idempotent re-append: r2 rewritten, history still 3 runs
    hist.append(report(0.97), "r2")
    assert hist.load().select("run").distinct().count() == 3
    # the current run is excluded from its own baseline
    hist.append(report(0.50), "r4")
    again = {
        r["rule"]: r["baseline"]
        for r in hist.check_drift(report(0.50), "r4").collect()
    }
    assert abs(again["completeness"] - 0.98) < 0.02


def test_expect_schema(spark):
    from sending_weekly_daily_csv_reports_from_hudi_datalake_to_customers_via_email_using_glue_and_sns_or_ses_spark.operators.quality import (
        expect_schema,
    )

    df = _frame(spark)  # k long, v double, s string
    expect_schema(df, {"k": "bigint", "v": "double"})  # extras OK
    with pytest.raises(DataQualityError, match="missing column nope"):
        expect_schema(df, {"nope": "string"})
    with pytest.raises(DataQualityError, match="k is bigint, expected int"):
        expect_schema(df, {"k": "int"})
    with pytest.raises(DataQualityError, match="unexpected column s"):
        expect_schema(
            df, {"k": "bigint", "v": "double"}, allow_extra=False
        )


def test_duplicate_rules_keep_separate_baselines(spark, tmp_path):
    """Two same-kind rules on one column (two in_range bands, the
    dq_report pattern) must NOT blend into one baseline: stable runs
    stay drift-free because baselines key on rule_seq."""
    from sending_weekly_daily_csv_reports_from_hudi_datalake_to_customers_via_email_using_glue_and_sns_or_ses_spark.operators.quality import (
        MetricHistory,
    )

    hist = MetricHistory(spark, str(tmp_path / "dup"))

    def report():
        return spark.createDataFrame(
            [(0, "in_range", "v", 1.0, 1.0, True),
             (1, "in_range", "v", 0.6, 0.5, True)],
            "rule_seq int, rule string, column string, metric double, "
            "threshold double, passed boolean",
        )

    hist.append(report(), "r1")
    hist.append(report(), "r2")
    judged = hist.check_drift(report(), "r3").collect()
    assert all(not r["drifted"] for r in judged)
    by_seq = {r["rule_seq"]: r["baseline"] for r in judged}
    assert by_seq == {0: 1.0, 1: 0.6}  # separate, unblended baselines


def test_min_rows_growth_is_not_drift(spark, tmp_path):
    """min_rows is a VOLUME metric — a growing table must not trip the
    relative-drift gate (its absolute threshold still applies)."""
    from sending_weekly_daily_csv_reports_from_hudi_datalake_to_customers_via_email_using_glue_and_sns_or_ses_spark.operators.quality import (
        MetricHistory,
    )

    hist = MetricHistory(spark, str(tmp_path / "growth"))

    def report(n):
        return spark.createDataFrame(
            [(0, "min_rows", None, float(n), 1.0, True)],
            "rule_seq int, rule string, column string, metric double, "
            "threshold double, passed boolean",
        )

    hist.append(report(100), "r1")
    hist.append(report(100), "r2")
    judged = hist.check_drift(report(150), "r3").collect()[0]
    assert not judged["drifted"]  # +50% growth, exempt kind


def test_rules_from_config(spark):
    """JSON-shaped rule specs (the loaders-config form) build the same
    rules the Python API does; errors surface at CONFIG time; the
    referential form resolves its ref TABLE at check time."""
    from sending_weekly_daily_csv_reports_from_hudi_datalake_to_customers_via_email_using_glue_and_sns_or_ses_spark.operators.quality import (
        rules_from_config,
    )

    rules = rules_from_config(
        [
            {"kind": "completeness", "column": "v", "threshold": 0.7},
            {"kind": "in_range", "column": "v", "lo": 0, "hi": 10,
             "threshold": 0.8},
            {"kind": "min_rows", "n": 5},
            {"kind": "referential", "column": "k",
             "ref_table": "dq_dim", "ref_column": "id"},
        ]
    )
    spark.createDataFrame(
        [(i,) for i in range(1, 11)], "id long"
    ).createOrReplaceTempView("dq_dim")
    rep = {
        r["rule"]: r["passed"]
        for r in run_checks(_frame(spark), rules).collect()
    }
    assert rep == {
        "completeness": True, "in_range": True, "min_rows": True,
        "referential": True,
    }
    with pytest.raises(ValueError, match="unknown kind"):
        rules_from_config([{"kind": "nope"}])
    with pytest.raises(ValueError, match="missing field"):
        rules_from_config([{"kind": "in_range", "column": "v"}])
    with pytest.raises(ValueError, match="exactly one"):
        rules_from_config(
            [{"kind": "referential", "column": "k",
              "ref_table": None, "ref_column": "id"}]
        )


def test_rules_from_config_rejects_unexpected_fields(spark):
    from sending_weekly_daily_csv_reports_from_hudi_datalake_to_customers_via_email_using_glue_and_sns_or_ses_spark.operators.quality import (
        rules_from_config,
    )

    # a field the factory never reads is a silently weaker gate
    with pytest.raises(ValueError, match="unexpected field"):
        rules_from_config([{"kind": "min_rows", "n": 5, "threshold": 100}])
    with pytest.raises(ValueError, match="unexpected field"):
        rules_from_config(
            [{"kind": "completeness", "column": "v", "treshold": 0.9}]
        )


def test_funnel_input_quality_gate(spark, tmp_path):
    """prepare_training_data(input_quality_rules=…): a failing rule on
    the documents table aborts before any funnel stage; passing rules
    leave the funnel unchanged."""
    from sending_weekly_daily_csv_reports_from_hudi_datalake_to_customers_via_email_using_glue_and_sns_or_ses_spark.operators.curation import (
        prepare_training_data,
    )
    from sending_weekly_daily_csv_reports_from_hudi_datalake_to_customers_via_email_using_glue_and_sns_or_ses_spark.operators.quality import (
        completeness,
        min_rows,
    )

    with pytest.raises(DataQualityError, match="min_rows"):
        prepare_training_data(
            spark, SF, str(tmp_path / "t1"),
            input_quality_rules=[min_rows(10**9)],
        )
    assert not (tmp_path / "t1").exists()  # nothing written
    stats = prepare_training_data(
        spark, SF, str(tmp_path / "t2"),
        input_quality_rules=[min_rows(1), completeness("text", 0.9)],
    )
    assert stats["n_input"] > 0


def test_grouped_checks_surface_the_bad_group(spark):
    """run_checks_by: a corpus healthy overall can hide one broken
    group — the per-group rows surface it; referential rules and bad
    columns are rejected."""
    from sending_weekly_daily_csv_reports_from_hudi_datalake_to_customers_via_email_using_glue_and_sns_or_ses_spark.operators.quality import (
        referential,
        run_checks_by,
    )

    rows = [("web", float(i), "ok") for i in range(8)] + [
        ("scan", None, "ok"),
        ("scan", 1.0, None),
        ("scan", None, "ok"),
        ("scan", 2.0, "ok"),
    ]
    df = spark.createDataFrame(rows, "source string, v double, s string")
    rep = {
        (r["source"], r["column"]): (round(r["metric"], 3), r["passed"])
        for r in run_checks_by(
            df, [completeness("v", 0.7), completeness("s", 0.7)], "source"
        ).collect()
    }
    # whole-table v-completeness would be 10/12 = 0.83 (passes 0.7);
    # the per-group view shows scan at 0.5 — the hidden break
    assert rep[("web", "v")] == (1.0, True)
    assert rep[("scan", "v")] == (0.5, False)
    assert rep[("scan", "s")] == (0.75, True)
    with pytest.raises(ValueError, match="whole-table"):
        run_checks_by(
            df, [referential("v", df, "v")], "source"
        )
    with pytest.raises(ValueError, match="not in schema"):
        run_checks_by(df, [completeness("nope")], "source")


def test_grouped_checks_guard_rails(spark):
    """run_checks_by raises on empty input (an empty report silently
    blesses the empty table) and on by-columns colliding with report
    columns; an empty funnel rule LIST raises instead of silently
    skipping the gate."""
    from sending_weekly_daily_csv_reports_from_hudi_datalake_to_customers_via_email_using_glue_and_sns_or_ses_spark.operators.curation import (
        prepare_training_data,
    )
    from sending_weekly_daily_csv_reports_from_hudi_datalake_to_customers_via_email_using_glue_and_sns_or_ses_spark.operators.quality import (
        run_checks_by,
    )

    empty = spark.createDataFrame([], "source string, v double")
    with pytest.raises(ValueError, match="no rows"):
        run_checks_by(empty, [completeness("v")], "source")
    clashing = spark.createDataFrame([(1.0, 2.0)], "metric double, v double")
    with pytest.raises(ValueError, match="collide"):
        run_checks_by(clashing, [completeness("v")], "metric")
    with pytest.raises(ValueError, match="empty rule list"):
        prepare_training_data(
            spark, SF, "/tmp/never-written", input_quality_rules=[]
        )


def test_metric_history_mixed_vintage_keeps_appended_at(spark, tmp_path):
    """A history mixing pre-r8 runs (no appended_at column) with
    stamped runs must still order drift windows chronologically: the
    load merges footers (r8 review — a single sampled pre-r8 footer
    would drop the column for ALL rows and silently revert the window
    to lexicographic run-id order, the exact bug the stamp fixed)."""
    from pyspark.sql import functions as F

    from sending_weekly_daily_csv_reports_from_hudi_datalake_to_customers_via_email_using_glue_and_sns_or_ses_spark.operators.quality import (
        MetricHistory,
    )

    path = str(tmp_path / "mixhist")
    hist = MetricHistory(spark, path)

    def report(metric):
        return spark.createDataFrame(
            [(0, "completeness", "v", metric, 1.0, True)],
            "rule_seq int, rule string, column string, metric double, "
            "threshold double, passed boolean",
        )

    # legacy vintage: a run dir WITHOUT appended_at, written directly
    report(0.9).withColumn("ok", F.lit(True)).coalesce(1).write.parquet(
        f"{path}/run=legacy_1"
    )
    # modern appends stamp appended_at
    hist.append(report(0.95), "run_9")
    hist.append(report(0.97), "run_10")
    loaded = hist.load()
    assert "appended_at" in loaded.columns
    rows = {r["run"]: r["appended_at"] for r in loaded.collect()}
    assert rows["legacy_1"] is None
    assert rows["run_9"] is not None and rows["run_10"] is not None
    # chronological order survives the lexicographic trap
    assert rows["run_10"] > rows["run_9"]
    # drift against the mixed history still works end-to-end
    judged = hist.check_drift(report(0.96), "run_11").collect()
    assert judged and judged[0]["baseline"] is not None
