"""Plan inspection helpers (SURVEY.md §4): programmatic access to the
physical plan so tests — and operators' own docs — can assert the
scale-critical properties instead of eyeballing ``explain()``:

  * filters reached the parquet scan (PushedFilters),
  * scans read only needed columns (ReadSchema),
  * small dimensions joined as BroadcastHashJoin,
  * aggregates have a map-side partial step,
  * expressions run inside WholeStageCodegen.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def physical_plan(df: DataFrame) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def formatted_plan(df: DataFrame) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(  # type: ignore[attr-defined]
        df._jdf.queryExecution(), "formatted"
    )


def pushed_filters(df: DataFrame) -> str:
    """The PushedFilters fragments of every scan in the plan."""
    return "\n".join(
        line.strip()
        for line in physical_plan(df).splitlines()
        if "PushedFilters" in line
    )


def has_pushed_filter(df: DataFrame, fragment: str) -> bool:
    return fragment in pushed_filters(df)


def has_broadcast_join(df: DataFrame, final: bool = False) -> bool:
    """AQE caveat: the default inspects the INITIAL plan — a runtime
    SMJ→BHJ conversion (stats-based) is invisible until execution. Pass
    ``final=True`` to execute first and read the AQE-final plan when the
    broadcast decision is runtime-dependent."""
    if final:
        df.collect()
    return "BroadcastHashJoin" in physical_plan(df)


def has_partial_aggregate(df: DataFrame, final: bool = False) -> bool:
    """Same AQE caveat as has_broadcast_join."""
    if final:
        df.collect()
    plan = physical_plan(df)
    return "partial_" in plan or "HashAggregate" in plan and "merge_" in plan


def read_schema_of(df: DataFrame, table_fragment: str) -> str:
    """ReadSchema line of the scan whose path matches table_fragment.
    Raises when no scan line matches — a silent all-scans fallback
    would let a pruning assertion about table X pass on table Y's
    schema."""
    plan = physical_plan(df)
    out = [
        line.strip()
        for line in plan.splitlines()
        if "ReadSchema" in line and table_fragment in line
    ]
    if not out:
        all_scans = [
            line.strip() for line in plan.splitlines() if "ReadSchema" in line
        ]
        raise ValueError(
            f"no scan matches {table_fragment!r}; scans present:\n"
            + "\n".join(all_scans)
        )
    return "\n".join(out)


def codegen_stage_count(df: DataFrame, execute: bool = True) -> int:
    """Number of DISTINCT whole-stage-codegen spans. Every operator
    inside one span shares the same ``*(n)`` prefix, so count distinct
    ids, not prefix occurrences. Under AQE the markers only exist on
    the FINAL plan, so by default the plan is executed first."""
    import re

    if execute:
        # must execute THIS DataFrame's own QueryExecution (a .write
        # would build a separate one and leave this plan non-final)
        df.collect()
    plan = physical_plan(df)
    span_ids = set(re.findall(r"\*\((\d+)\)", plan))
    if span_ids:
        return len(span_ids)
    return plan.count("WholeStageCodegen")


def plan_health(df: DataFrame, execute: bool = True) -> dict:
    """One-call plan triage — the counters a 100 TB deployment reviews
    before shipping a query, as data instead of eyeballed explain():

      * ``shuffles``: data-moving Exchange nodes (broadcasts excluded);
        every one is a full network pass over its input;
      * ``broadcast_joins`` / ``sortmerge_joins`` /
        ``nested_loop_joins`` / ``cartesian_products``: join strategy
        mix — an unexpected SMJ where a dimension should broadcast, or
        ANY cartesian product, is the first thing to fix;
      * ``python_stages``: Arrow/Pandas eval nodes (the deliberate
        Python hot-path surface — should match the operator's design,
        zero for pure-SQL queries);
      * ``codegen_stages``: distinct whole-stage-codegen spans;
      * ``scans`` / ``scans_with_pushdown``: file scans and how many
        carry a non-empty PushedFilters — a scan reading everything
        for a filtered query means the predicate didn't push.

    Executes the frame by default (AQE: only the FINAL plan tells the
    truth about joins and codegen) via ``toLocalIterator`` — the plan
    runs fully but the driver holds ONE partition of results at a
    time, so triaging a large-result query streams instead of
    buffering the whole result set (the ``collect`` trap)."""
    if execute:
        for _ in df.toLocalIterator():
            pass
    lines = physical_plan(df).splitlines()

    def _count(pred) -> int:
        return sum(1 for line in lines if pred(line))

    return {
        # per-LINE so a ReusedExchange (whose line also prints the
        # exchange it reuses) is never double-counted as new work, and
        # a broadcast exchange is never counted as a shuffle
        "shuffles": _count(
            lambda s: "Exchange" in s
            and "BroadcastExchange" not in s
            and "ReusedExchange" not in s
        ),
        "broadcast_joins": _count(lambda s: "BroadcastHashJoin" in s),
        "sortmerge_joins": _count(lambda s: "SortMergeJoin" in s),
        "nested_loop_joins": _count(
            lambda s: "BroadcastNestedLoopJoin" in s
        ),
        "cartesian_products": _count(lambda s: "CartesianProduct" in s),
        # every Python execution node family: *EvalPython (scalar
        # UDFs), *InPandas (mapInPandas / applyInPandas / cogroup /
        # window / aggregate), *InArrow (mapInArrow)
        "python_stages": _count(
            lambda s: "EvalPython" in s
            or "InPandas" in s
            or "InArrow" in s
        ),
        "codegen_stages": codegen_stage_count(df, execute=False),
        "scans": _count(lambda s: "ReadSchema" in s),
        "scans_with_pushdown": _count(
            lambda s: "PushedFilters" in s
            and "PushedFilters: []" not in s
        ),
    }
