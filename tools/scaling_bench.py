"""Scaling-slope measurement (VERDICT r1 next-round #8): run the most
expensive headline queries at sf0.1 and at an N×-replicated copy, and
report the time ratios — the 100× design claims argued from plans get a
measured slope to back them.

The scaled copy is BENCH-ONLY synthetic replication (correctness still
runs exclusively on the driver's testdata): every table is unioned N
times with key offsets so joins stay consistent; document texts are
token-tagged per replica so the corpus grows in DISTINCT content —
replicating identical texts would make every replica an exact near-dup
of its original and measure pathological pair blow-up, not engine
scaling.

Usage: python tools/scaling_bench.py [N]     (default N=4)
Writes /tmp/spark_graft_scale/x{N}/ and prints one JSON line.
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from pyspark.sql import DataFrame, functions as F  # noqa: E402

from sending_weekly_daily_csv_reports_from_hudi_datalake_to_customers_via_email_using_glue_and_sns_or_ses_spark import (  # noqa: E402
    get_spark,
)
from sending_weekly_daily_csv_reports_from_hudi_datalake_to_customers_via_email_using_glue_and_sns_or_ses_spark.catalog import (  # noqa: E402
    TABLES,
    load_table,
)
from sending_weekly_daily_csv_reports_from_hudi_datalake_to_customers_via_email_using_glue_and_sns_or_ses_spark.operators import (  # noqa: E402
    QUERIES,
    RETIRED_QUERIES,
)

BASE_SF = "/root/testdata/sf0.1"

#: the queries whose scaling matters most (top cost in BENCH_r01 + the
#: r2 rewrites whose scale behavior the verdict questioned)
SCALE_QUERIES = [
    "cdc_scan",
    "q1_pricing_summary",
    "join_multiway_revenue",
    "join_range_asof",
    "sessionization",
    "dedup_ngram_jaccard",
    "dedup_minhash_lsh",
    "dedup_simhash",
    "dedup_clusters",
    "dedup_lines",
    "decontaminate",
    "knn_bruteforce",
    "tf_idf",
]

#: key DOMAINS: every FK family shares ONE replica step, derived from
#: the domain's owning table. Deriving steps per-table (each table's own
#: max) desynchronizes FK pairs whenever parent and child maxes differ —
#: e.g. trailing orders with no lineitems would shift l_orderkey by a
#: smaller step than o_orderkey and the scaled joins would time a
#: different (mostly-miss) workload.
_DOMAIN_OWNER = {
    "custkey": ("customer", "c_custkey"),
    "orderkey": ("orders", "o_orderkey"),
    "partkey": ("part", "p_partkey"),
    "suppkey": ("supplier", "s_suppkey"),
    "event": ("events", "event_id"),
    "user": ("events", "user_id"),
    "doc": ("documents", "doc_id"),
    "vec": ("embeddings", "vec_id"),
}

#: table → {column: domain}
_COLUMN_DOMAIN = {
    "customer": {"c_custkey": "custkey"},
    "supplier": {"s_suppkey": "suppkey"},
    "part": {"p_partkey": "partkey"},
    "orders": {"o_orderkey": "orderkey", "o_custkey": "custkey"},
    "lineitem": {
        "l_orderkey": "orderkey",
        "l_partkey": "partkey",
        "l_suppkey": "suppkey",
    },
    "events": {"event_id": "event", "user_id": "user"},
    "documents": {"doc_id": "doc"},
    "embeddings": {"vec_id": "vec"},
}


def _domain_steps(spark) -> dict[str, int]:
    return {
        domain: load_table(spark, BASE_SF, table).agg(F.max(col)).first()[0] + 1
        for domain, (table, col) in _DOMAIN_OWNER.items()
    }


def _replicate(df: DataFrame, name: str, n: int, domain_steps: dict[str, int]) -> DataFrame:
    steps = {
        col: domain_steps[dom] for col, dom in _COLUMN_DOMAIN.get(name, {}).items()
    }
    parts = []
    for i in range(n):
        part = df
        for c, step in steps.items():
            part = part.withColumn(c, F.col(c) + F.lit(i * step))
        if name == "documents" and i > 0:
            # distinct content per replica: tag every token so shingle
            # posting lists stay constant-depth while the corpus grows
            part = part.withColumn(
                "text",
                F.array_join(
                    F.transform(
                        F.split("text", " "),
                        lambda t: F.concat(F.lit(f"r{i}_"), t),
                    ),
                    " ",
                ),
            )
        parts.append(part)
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def build_scaled(spark, n: int) -> str:
    out_dir = f"/tmp/spark_graft_scale/x{n}"
    marker = os.path.join(out_dir, "_DONE")
    if os.path.exists(marker):
        return out_dir
    domain_steps = _domain_steps(spark)
    for t in TABLES:
        df = load_table(spark, BASE_SF, t)
        if t in ("region", "nation"):
            scaled = df  # shared dimensions — realistic at any scale
        else:
            scaled = _replicate(df, t, n, domain_steps)
        scaled.write.mode("overwrite").parquet(os.path.join(out_dir, f"{t}.parquet"))
    open(marker, "w").close()
    return out_dir


def run_once(spark, sf_dir: str, name: str) -> float:
    from sending_weekly_daily_csv_reports_from_hudi_datalake_to_customers_via_email_using_glue_and_sns_or_ses_spark.operators import (
        clear_intermediate_caches,
    )

    # slope measurements time FIRST evaluations — a warm intermediate
    # cache would masquerade as a flat scaling curve
    clear_intermediate_caches()
    t0 = time.time()
    fn = QUERIES.get(name) or RETIRED_QUERIES[name]
    fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
    return time.time() - t0


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    spark = get_spark(app_name="scaling-bench")
    scaled_dir = build_scaled(spark, n)

    run_once(spark, BASE_SF, "q1_pricing_summary")  # warmup
    result: dict[str, dict[str, float]] = {}
    for name in SCALE_QUERIES:
        t1 = min(run_once(spark, BASE_SF, name) for _ in range(2))
        tn = min(run_once(spark, scaled_dir, name) for _ in range(2))
        result[name] = {
            "x1_sec": round(t1, 3),
            f"x{n}_sec": round(tn, 3),
            "ratio": round(tn / t1, 2),
        }
    print(json.dumps({"scale": n, "base": BASE_SF, "queries": result}))


if __name__ == "__main__":
    main()
