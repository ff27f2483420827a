"""Routed dim-term F₀ read at organic scale (r11, VERDICT r10 #3).

Measures the IVM dim term's fact-side read on a BUCKETED fact keyed on
the join column — the layout `operators/ivm.py::routed_fact_base`
routes — against the pre-r11 behavior (full time-travel snapshot, rows
pruned only by the fold's join): wall time, files opened, and result
parity, at x1 and x10 fact sizes with a fixed small dim window (the
dims-change-rarely schedule the dim term exists for).

Bench-only tooling. Usage:

    python tools/ivm_route_bench.py [N_X10_KEYS]   (default 100_000)

Prints one JSON line {x1: {...}, x10: {...}}.
"""

from __future__ import annotations

import json
import shutil
import sys
import tempfile
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from pyspark.sql import functions as F  # noqa: E402

from sending_weekly_daily_csv_reports_from_hudi_datalake_to_customers_via_email_using_glue_and_sns_or_ses_spark import (  # noqa: E402
    get_spark,
)
from sending_weekly_daily_csv_reports_from_hudi_datalake_to_customers_via_email_using_glue_and_sns_or_ses_spark.operators.ivm import (  # noqa: E402
    routed_fact_base,
)
from sending_weekly_daily_csv_reports_from_hudi_datalake_to_customers_via_email_using_glue_and_sns_or_ses_spark.sinks.filegroups import (  # noqa: E402
    BucketedTable,
)
from sending_weekly_daily_csv_reports_from_hudi_datalake_to_customers_via_email_using_glue_and_sns_or_ses_spark.sinks.upsert import (  # noqa: E402
    KeyedTable,
)

NUM_BUCKETS = 64


def _measure(spark, n_keys: int, n_changed: int) -> dict:
    root = tempfile.mkdtemp(prefix="ivm_route_")
    try:
        fact = BucketedTable(
            spark, f"{root}/fact", record_key="ck", precombine="fpre",
            num_buckets=NUM_BUCKETS, keep_versions=10,
        )
        dim = KeyedTable(
            spark, f"{root}/dim", record_key="ck", precombine="dpre"
        )
        rows = spark.range(n_keys).select(
            F.col("id").cast("int").alias("ck"),
            F.lit(0).alias("fpre"),
            (F.col("id") * 10).alias("amount"),
        )
        fact.upsert(rows)
        f1 = fact.latest_commit()
        dim.upsert(
            spark.range(n_keys).select(
                F.col("id").cast("int").alias("ck"),
                F.lit(0).alias("dpre"),
                (F.col("id") % 7).cast("string").alias("grp"),
            )
        )
        d1 = dim.latest_commit()
        # fact moves on (f1 becomes the OLD instant), dim changes a
        # fixed small key set — the dim-only window shape
        fact.upsert(rows.filter(F.col("ck") < 10).withColumn("fpre", F.lit(1)))
        dim.upsert(
            spark.range(n_changed).select(
                F.col("id").cast("int").alias("ck"),
                F.lit(1).alias("dpre"),
                F.lit("MOVED").alias("grp"),
            )
        )
        win = dim.cdc(begin=d1)

        t0 = time.time()
        fb = routed_fact_base(fact, [("ck", "ck", win)], as_of=f1)
        n_routed = fb.count()
        t_routed = time.time() - t0
        files_routed = len(fb.inputFiles())

        t0 = time.time()
        snap = fact.snapshot(as_of=f1)
        keys = win.select("ck").distinct()
        pruned = snap.join(keys, "ck", "left_semi")  # the pre-r11 shape
        n_full = pruned.count()
        t_full = time.time() - t0
        files_full = len(snap.inputFiles())

        assert n_routed == n_full == n_changed, (n_routed, n_full)
        return {
            "fact_keys": n_keys,
            "dim_changed": n_changed,
            "routed_sec": round(t_routed, 2),
            "routed_files": files_routed,
            "snapshot_sec": round(t_full, 2),
            "snapshot_files": files_full,
            "files_ratio": round(files_full / max(1, files_routed), 1),
        }
    finally:
        shutil.rmtree(root, ignore_errors=True)


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000
    spark = get_spark(app_name="ivm_route_bench")
    out = {
        "metric": "ivm_routed_fact_base",
        "unit": "sec",
        # 8 changed keys = the dims-change-rarely shape routing exists
        # for (keys << buckets -> most file groups untouched); 100 =
        # the wide-window crossover where routing converges to a full
        # read (coupon-collector: 100 random keys hit ~55/64 buckets)
        "x1_narrow": _measure(spark, n // 10, 8),
        "x10_narrow": _measure(spark, n, 8),
        "x10_wide": _measure(spark, n, 100),
    }
    print(json.dumps(out))


if __name__ == "__main__":
    raise SystemExit(main())
