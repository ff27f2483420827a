"""PQ recall + slope at organic 10× (r8, VERDICT r7 #8): the IVF-PQ
family gets the same organic-scale treatment every other r7 family
already has — time `ivf_pq_topk` and the partitioned
write-once/probe-many path at sf0.1 vs the organically-grown 10×
embeddings (tools/gen_organic_sf.py corpus: fresh seeded draws, not
replicas), and measure RECALL vs the exact brute-force top-10 at both
scales. Codebook/centroid caches are cleared between runs so every
timing includes training from its own corpus (first-evaluation cost,
the honest slope).

Bench-only tooling. Usage:

    python tools/pq_scale_bench.py [N]      (default N=10)

Prints one JSON line: per-path {base_sec, x10_sec, slope, base_recall,
x10_recall}.
"""

from __future__ import annotations

import json
import sys
import tempfile
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from sending_weekly_daily_csv_reports_from_hudi_datalake_to_customers_via_email_using_glue_and_sns_or_ses_spark import (  # noqa: E402
    get_spark,
)
from sending_weekly_daily_csv_reports_from_hudi_datalake_to_customers_via_email_using_glue_and_sns_or_ses_spark.operators import (  # noqa: E402
    QUERIES,
    clear_intermediate_caches,
)
from sending_weekly_daily_csv_reports_from_hudi_datalake_to_customers_via_email_using_glue_and_sns_or_ses_spark.operators import (  # noqa: E402
    pq,
)
from tools.gen_organic_sf import BASE_SF, build_organic  # noqa: E402


def _topk_sets(df) -> dict[int, set[int]]:
    out: dict[int, set[int]] = {}
    for r in df.select("query_id", "vec_id").collect():
        out.setdefault(r["query_id"], set()).add(r["vec_id"])
    return out


def _recall(exact: dict[int, set[int]], got: dict[int, set[int]]) -> float:
    rs = [
        len(exact[q] & got.get(q, set())) / len(exact[q]) for q in exact
    ]
    return sum(rs) / len(rs)


def _measure(spark, sf_dir: str) -> dict:
    clear_intermediate_caches()
    exact = _topk_sets(QUERIES["knn_bruteforce"](spark, sf_dir))

    # fixed absolute pool (the r7-era default): decays with corpus size
    r_fixed = _recall(
        exact, _topk_sets(pq.ivf_pq_topk(spark, sf_dir, refine=50))
    )
    t0 = time.time()
    # BOTH dials auto (r10): K sized to the corpus, nprobe an
    # iso-fraction of K, refine an iso-fraction of the corpus — the
    # production default with no scale-tuned constants left
    got = _topk_sets(
        pq.ivf_pq_topk(
            spark, sf_dir, K="auto", nprobe="auto", refine="auto"
        )
    )
    t_topk = time.time() - t0
    r_topk = _recall(exact, got)
    # the nprobe dial isolated (r10, VERDICT r9 #7): at a GROWN cell
    # count (K=64 — what auto-K produces once the corpus passes
    # 128k vectors) a fixed nprobe=8 probes 12.5% of cells where the
    # x1 operating point probed 50%; nprobe='auto' holds the fraction
    r_nprobe_fixed = _recall(
        exact,
        _topk_sets(
            pq.ivf_pq_topk(spark, sf_dir, K=64, nprobe=8, refine="auto")
        ),
    )
    r_nprobe_auto = _recall(
        exact,
        _topk_sets(
            pq.ivf_pq_topk(
                spark, sf_dir, K=64, nprobe="auto", refine="auto"
            )
        ),
    )

    layout = tempfile.mkdtemp(prefix="pq_layout_")
    t0 = time.time()
    pq.ivf_pq_write_partitioned(spark, sf_dir, layout)
    t_write = time.time() - t0
    t0 = time.time()
    got_p = _topk_sets(
        pq.ivf_pq_probe_partitioned(spark, sf_dir, layout)
    )
    t_probe = time.time() - t0
    r_probe = _recall(exact, got_p)

    # r11 (VERDICT r10 #2): a full maintenance cycle on the layout —
    # delete 1% of indexed vectors, then recluster with a target that
    # forces splits — and re-probe: deleted ids must be gone, survivor
    # recall must hold, and both ops must stay O(touched cells).
    import pyspark.sql.functions as F

    live = spark.read.parquet(layout)
    n_live = live.count()
    victims = [
        r["vec_id"]
        for r in live.select("vec_id")
        .orderBy(F.xxhash64("vec_id"))
        .limit(max(10, n_live // 100))
        .collect()
    ]
    t0 = time.time()
    n_del = pq.ivf_pq_delete(spark, victims, layout)
    t_delete = time.time() - t0
    counts = [
        r["n"]
        for r in spark.read.parquet(layout)
        .groupBy("cell")
        .agg(F.count("*").alias("n"))
        .collect()
    ]
    t0 = time.time()
    recl = pq.ivf_pq_recluster(
        spark, sf_dir, layout, rows_per_cell=max(100, max(counts) // 3)
    )
    t_recl = time.time() - t0
    got_m = _topk_sets(pq.ivf_pq_probe_partitioned(spark, sf_dir, layout))
    leaked = sum(len(g & set(victims)) for g in got_m.values())
    exact_surv = {
        q: s - set(victims) for q, s in exact.items() if s - set(victims)
    }
    r_after = _recall(exact_surv, got_m)
    return {
        "ivf_pq_topk_sec": round(t_topk, 2),
        "ivf_pq_topk_recall": round(r_topk, 3),
        "ivf_pq_topk_recall_fixed50": round(r_fixed, 3),
        "ivf_pq_topk_recall_k64_nprobe8": round(r_nprobe_fixed, 3),
        "ivf_pq_topk_recall_k64_nprobe_auto": round(r_nprobe_auto, 3),
        "layout_write_sec": round(t_write, 2),
        "layout_probe_sec": round(t_probe, 2),
        "layout_probe_recall": round(r_probe, 3),
        "maintain_delete_sec": round(t_delete, 2),
        "maintain_deleted_rows": n_del,
        "maintain_recluster_sec": round(t_recl, 2),
        "maintain_cells_split": len(recl["split_cells"]),
        "maintain_leaked_deleted_ids": leaked,
        "maintain_survivor_recall": round(r_after, 3),
    }


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    spark = get_spark(app_name="pq_scale_bench")
    organic_dir = build_organic(spark, n)
    base = _measure(spark, BASE_SF)
    big = _measure(spark, organic_dir)
    print(
        json.dumps(
            {
                "metric": "pq_organic_slope",
                "n": n,
                "unit": "sec",
                "base": base,
                "x10": big,
                "slopes": {
                    k: round(big[k] / base[k], 2)
                    for k in base
                    if k.endswith("_sec") and base[k] > 0
                },
            }
        )
    )


if __name__ == "__main__":
    raise SystemExit(main())
