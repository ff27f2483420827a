"""Capture per-query physical plans for the optimization round.

For every live registry entry (or the names given on the CLI), writes
``plans/<round>/<name>_<tag>.txt`` (round from $SPARK_GRAFT_PLANS_ROUND, default r12) containing:

  * the ``explain("formatted")`` output (the judge-checkable artifact),
  * the AQE-final executed plan (``executedPlan`` after running the
    frame into the noop sink — the only plan that tells the truth about
    runtime join strategy / coalescing),
  * the ``plan_health`` counter dict (shuffles, join mix, python
    stages, codegen spans, scans with pushdown).

Usage: python tools/capture_plans.py <tag> [query ...]
       (tag is e.g. "before" or "after"; default sf dir
        $SPARK_GRAFT_SF_DIR or /root/testdata/sf0.1)
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from sending_weekly_daily_csv_reports_from_hudi_datalake_to_customers_via_email_using_glue_and_sns_or_ses_spark import (  # noqa: E402
    get_spark,
)
from sending_weekly_daily_csv_reports_from_hudi_datalake_to_customers_via_email_using_glue_and_sns_or_ses_spark.operators import (  # noqa: E402
    QUERIES,
)
from sending_weekly_daily_csv_reports_from_hudi_datalake_to_customers_via_email_using_glue_and_sns_or_ses_spark.plans.explain import (  # noqa: E402
    formatted_plan,
    physical_plan,
    plan_health,
)


def main() -> int:
    tag = sys.argv[1] if len(sys.argv) > 1 else "before"
    names = sys.argv[2:] or list(QUERIES)
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    out_dir = (
        Path(__file__).resolve().parents[1]
        / "plans"
        / os.environ.get("SPARK_GRAFT_PLANS_ROUND", "r12")
    )
    out_dir.mkdir(parents=True, exist_ok=True)
    spark = get_spark(app_name=f"capture_plans_{tag}")
    summary: dict[str, dict] = {}
    for name in names:
        spark.sparkContext.setJobDescription(f"capture:{name}")
        t0 = time.time()
        try:
            df = QUERIES[name](spark, sf_dir)
            fmt = formatted_plan(df)
            health = plan_health(df)  # executes via toLocalIterator
            final = physical_plan(df)
        except Exception as exc:  # noqa: BLE001 — record, keep going
            summary[name] = {"error": f"{type(exc).__name__}: {exc}"}
            print(f"ERR  {name}: {exc}")
            continue
        dt = time.time() - t0
        health["capture_sec"] = round(dt, 2)
        summary[name] = health
        text = (
            f"# {name} ({tag}) — sf={sf_dir}\n"
            f"# plan_health: {json.dumps(health)}\n\n"
            "== explain(formatted) ==\n"
            f"{fmt}\n\n"
            "== AQE-final executed plan ==\n"
            f"{final}\n"
        )
        (out_dir / f"{name}_{tag}.txt").write_text(text)
        print(
            f"OK   {name:32s} {dt:6.2f}s shuffles={health['shuffles']} "
            f"smj={health['sortmerge_joins']} bhj={health['broadcast_joins']} "
            f"py={health['python_stages']} "
            f"pushdown={health['scans_with_pushdown']}/{health['scans']}"
        )
    (out_dir / f"_summary_{tag}.json").write_text(json.dumps(summary, indent=1))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
