"""Planted-skew stress for the banded self-joins (r8, VERDICT r7 #7):
drive a deliberately Zipfian window/shingle distribution through
`dedup_minhash_lsh` and `exact_substring_pairs` at organic 10× and
measure whether round times stay bounded and the postings caps fire.

The adversarial corpus: 10× the sf0.1 documents row count, each doc
~100 random vocabulary tokens, and a PLANTED boilerplate block of 30
tokens — 30% of all docs carry the SAME block 1 (the brutal hot key:
at x10 that is ~15,000 occurrences of every one of its k-token
windows, 60× over the 256 cap), a further 30% carry one of 39 uniform
tail blocks, 40% carry none. Generation is fully distributed
(xxhash64 over spark.range — the gen_organic_sf.py recipe) and
deterministic.

What bounded-ness means per operator:

* ``exact_substring_pairs``: the Σ postings² join would be ~15k² × 11
  windows ≈ 2.5 G rows without the cap; `_window_postings` drops
  >256-occurrence windows (boilerplate by definition — the documented
  LOSSY trade), so the stress must show the cap report firing with
  ~165k dropped postings and a round time in the organic-10× band.
* ``dedup_minhash_lsh``: NO bucket cap exists — by design: the
  signature is a min over ALL of a doc's shingles, so shared
  boilerplate among otherwise-random docs only collides a band when
  the block's shingles win ~4 independent minimums at once
  (≈ (30/130)⁴ ≈ 0.3% per band). The stress verifies that claim holds
  at 15k hot docs: candidate volume stays linear-ish, not 15k²/2.

Bench-only tooling (correctness always runs on the driver's read-only
testdata). Usage:

    python tools/skew_stress.py [N]      (default N=10)

Writes /tmp/spark_graft_skew/x{N}/ once (marker-gated), then times the
two operators at sf0.1 vs the skewed copy and prints one JSON line.
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from pyspark.sql import SparkSession  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from sending_weekly_daily_csv_reports_from_hudi_datalake_to_customers_via_email_using_glue_and_sns_or_ses_spark import (  # noqa: E402
    get_spark,
)
from sending_weekly_daily_csv_reports_from_hudi_datalake_to_customers_via_email_using_glue_and_sns_or_ses_spark.operators import (  # noqa: E402
    QUERIES,
    clear_intermediate_caches,
)

BASE_SF = "/root/testdata/sf0.1"
BASE_DOCS = 5_000  # sf0.1 documents rows (TESTDATA.md)

_VOCAB = (
    "spark line column order small sort fast value scan hash slow batch "
    "part a the query agg table stream filter big merge group key join "
    "customer vector data plan shuffle"
).split()

#: tokens per boilerplate block; > k=20 so every block plants full
#: k-token windows, and 30/130 of a carrier doc's shingles are shared
_BLOCK_TOKENS = 30
_DOC_TOKENS = 100


def _h(salt: int):
    return F.abs(F.xxhash64(F.col("id"), F.lit(salt)))


def _token(salt: int):
    arr = F.array(*[F.lit(v) for v in _VOCAB])
    return F.element_at(arr, (_h(salt) % len(_VOCAB) + 1).cast("int"))


def _block_text(block_id) -> F.Column:
    """Deterministic 30-token block text for a block id (a column):
    token j = vocab[(block_id * 31 + j) % |vocab|] — fixed per block,
    shared verbatim by every carrier."""
    toks = [
        F.element_at(
            F.array(*[F.lit(v) for v in _VOCAB]),
            ((block_id * 31 + F.lit(j)) % len(_VOCAB) + 1).cast("int"),
        )
        for j in range(_BLOCK_TOKENS)
    ]
    return F.concat_ws(" ", *toks)


def build_skewed(spark: SparkSession, n: int) -> str:
    out_dir = f"/tmp/spark_graft_skew/x{n}"
    marker = os.path.join(out_dir, "_BUILT")
    if os.path.exists(marker):
        return out_dir
    n_docs = BASE_DOCS * n
    ids = spark.range(n_docs).repartition(32)
    body = F.concat_ws(
        " ", *[_token(1000 + j) for j in range(_DOC_TOKENS)]
    )
    u = (_h(1) % 1_000_000) / F.lit(1_000_000.0)
    block_id = (
        F.when(u < 0.3, F.lit(1))  # 30% of docs: THE hot block
        .when(u < 0.6, (_h(2) % 39 + 2).cast("int"))  # 30%: uniform tail
        .otherwise(F.lit(None))  # 40%: no boilerplate
    )
    text = F.when(
        block_id.isNotNull(),
        F.concat_ws(" ", body, _block_text(block_id)),
    ).otherwise(body)
    docs = ids.select(
        F.col("id").alias("doc_id"),
        text.alias("text"),
        F.lit("en").alias("lang"),
        F.concat(F.lit("src_"), (_h(3) % 5).cast("string")).alias("source"),
    ).withColumn("n_chars", F.length("text"))
    docs.write.mode("overwrite").parquet(
        os.path.join(out_dir, "documents.parquet")
    )
    with open(marker, "w") as f:
        f.write("ok")
    return out_dir


def _time_query(spark, name: str, sf_dir: str) -> tuple[float, int]:
    clear_intermediate_caches()
    t0 = time.time()
    df = QUERIES[name](spark, sf_dir)
    n = df.count()
    return time.time() - t0, n


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    spark = get_spark(app_name="skew_stress")
    skew_dir = build_skewed(spark, n)

    result: dict = {"metric": "skew_stress", "n": n, "unit": "sec"}
    for name in ("exact_substring_pairs", "dedup_minhash_lsh"):
        t_base, rows_base = _time_query(spark, name, BASE_SF)
        t_skew, rows_skew = _time_query(spark, name, skew_dir)
        result[name] = {
            "base_sec": round(t_base, 2),
            "skew_sec": round(t_skew, 2),
            "slope": round(t_skew / t_base, 2),
            "base_rows": rows_base,
            "skew_rows": rows_skew,
        }

    # the cap observability report on the skewed corpus (r7 machinery)
    from sending_weekly_daily_csv_reports_from_hudi_datalake_to_customers_via_email_using_glue_and_sns_or_ses_spark.operators.dedup import (
        exact_substring_pairs,
    )

    docs = spark.read.parquet(os.path.join(skew_dir, "documents.parquet"))
    _, cap = exact_substring_pairs(docs, k=20, cap_report=True)
    r = cap.first()
    result["cap_report"] = {
        "n_hot_windows": int(r["n_hot_windows"] or 0),
        "dropped_postings": int(r["dropped_postings"] or 0),
        "max_postings": int(r["max_postings"]),
    }
    # LSH candidate volume sanity: hot-clique quadratic would be ~n²/2
    hot_docs = docs.filter(
        F.col("text").contains(" ".join(_probe_block_tokens()))
    ).count()
    result["hot_block_docs"] = hot_docs
    print(json.dumps(result))


def _probe_block_tokens() -> list[str]:
    """Block 1's literal tokens, computed driver-side with the same
    formula as _block_text (for the carrier count probe)."""
    return [_VOCAB[(1 * 31 + j) % len(_VOCAB)] for j in range(_BLOCK_TOKENS)]


if __name__ == "__main__":
    raise SystemExit(main())
