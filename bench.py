"""Benchmark harness: runs the headline query set at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on
local[$SPARK_GRAFT_CPUS] and prints ONE JSON line:

    {"metric": "...", "value": total_sec, "unit": "sec",
     "queries": {name: sec, ...},
     "first_eval_total": sec, "queries_first_eval": {name: sec, ...},
     "sf": "..."}

Timing: each query's plan is fully executed into Spark's ``noop`` sink
(materializes every row, no driver-side collect bias). One JVM-warmup
run of the flagship query precedes timing.

Cold vs warm (VERDICT r4 next-round #4): several operators share
per-(session, sf) intermediates — the jaccard pair graph, the tf table,
the approx-agg sketch, the IVF layout — so a query's SECOND evaluation
can be 10-20× its first. Both numbers are real: ``queries`` /
``value`` report STEADY STATE (min of two runs; the long-running
cluster's behavior, and the comparable-across-rounds headline), while
``queries_first_eval`` / ``first_eval_total`` report each query's FIRST
run in suite order (cache-build cost included — an intermediate already
built by an EARLIER suite query is not rebuilt, exactly as a production
session would behave)."""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

from sending_weekly_daily_csv_reports_from_hudi_datalake_to_customers_via_email_using_glue_and_sns_or_ses_spark import (  # noqa: E402
    get_spark,
)
from sending_weekly_daily_csv_reports_from_hudi_datalake_to_customers_via_email_using_glue_and_sns_or_ses_spark.operators import (  # noqa: E402
    QUERIES,
)

#: entries EXCLUDED from the headline set — fast scan/point-lookup
#: micro-entries whose steady-state cost is noise-scale (they stay
#: driver-oracled every round; excluding them keeps the suite total
#: dominated by real operator work). Every other LIVE registry entry
#: benches automatically: the suite list derives from ``QUERIES`` at
#: run time (VERDICT r10 #7 — the r10 crash class was a hand-
#: maintained HEADLINE naming a retired entry, masked by the driver's
#: pipe; retiring an entry now needs zero bench.py edits, and a stale
#: name HERE fails the run loudly instead).
EXCLUDE = {
    "approx_aggregates",
    "bloom_point_lookup",
    "filegroup_snapshot",
    "incremental_scan",
    "ivm_report",
    "q3_shipping_priority",
    "salted_heavy_hitter_agg",
    "scalar_datetime_keys",
    "streaming_hourly_rollup",
    "streaming_session_window",
}


def headline() -> list[str]:
    """The benched suite: the live registry minus :data:`EXCLUDE`, in
    registration order (suite order is the first-eval cache-build
    order). Unknown EXCLUDE names raise — a retired/renamed entry left
    here is a stale config, not a silent skip."""
    stale = EXCLUDE - set(QUERIES)
    if stale:
        raise ValueError(
            f"bench.py EXCLUDE names unknown queries {sorted(stale)} — "
            "the registry no longer has them; drop the stale entries"
        )
    return [name for name in QUERIES if name not in EXCLUDE]


HEADLINE = headline()


def run_once(spark, sf_dir: str, name: str) -> float:
    t0 = time.time()
    QUERIES[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
    return time.time() - t0


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name="bench")

    run_once(spark, sf_dir, "flagship_report")  # JVM warmup

    # three runs per query: run 1 = first_eval (pays codegen + any
    # shared intermediate not built by an earlier suite query), min of
    # all three = steady state (the long-running cluster's number;
    # headline `value`). Three, not two: this host shows multi-second
    # noise bursts (2-3× on a single query) that can span two
    # back-to-back runs; the warm runs are cache-hit cheap, so a third
    # sample costs little and clips the burst from the steady number.
    timings: dict[str, float] = {}
    first_eval: dict[str, float] = {}
    for name in HEADLINE:
        try:
            runs = [run_once(spark, sf_dir, name) for _ in range(3)]
        except Exception as exc:  # noqa: BLE001 — fail LOUDLY, pipe-proof
            # the r10 failure mode: a raising query died with its
            # traceback on stderr and the pipe masked the exit code —
            # emit a tail-surviving JSON error line AND exit non-zero
            print(
                json.dumps(
                    {
                        "metric": "headline_suite_total",
                        "error": f"{name}: {type(exc).__name__}: {exc}",
                        "sf": sf_dir,
                    }
                )
            )
            raise SystemExit(1) from exc
        first_eval[name] = round(runs[0], 3)
        timings[name] = round(min(runs), 3)

    total = round(sum(timings.values()), 3)
    full = {
        "metric": "headline_suite_total",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "first_eval_total": round(sum(first_eval.values()), 3),
        "queries_first_eval": first_eval,
        "sf": sf_dir,
    }
    print(json.dumps(full))
    # capture-proof forensics (VERDICT r8 #8): the driver keeps only the
    # TAIL of stdout, which truncates the per-query dict above — write
    # the complete record to a committed file so per-query history stops
    # depending on capture length.
    with open(Path(__file__).resolve().parent / "bench_last.json", "w") as f:
        json.dump(full, f, indent=1)
        f.write("\n")
    # compact totals-only line LAST: the driver captures only the tail
    # of the output, and the full per-query line above has outgrown it
    # (BENCH_r07.json lost the suite total to truncation — VERDICT r7
    # #5). The headline numbers must survive any tail capture.
    print(
        json.dumps(
            {
                "metric": "headline_suite_total",
                "value": total,
                "unit": "sec",
                "n_queries": len(timings),
                "first_eval_total": round(sum(first_eval.values()), 3),
                "sf": sf_dir,
            }
        )
    )


if __name__ == "__main__":
    main()
