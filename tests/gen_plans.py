"""Regenerate PLANS.md: executed (AQE-final) physical plans for the
plan-reviewed headline queries. Run: python tests/gen_plans.py"""

from __future__ import annotations

import io
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from sending_weekly_daily_csv_reports_from_hudi_datalake_to_customers_via_email_using_glue_and_sns_or_ses_spark import (  # noqa: E402
    get_spark,
)
from sending_weekly_daily_csv_reports_from_hudi_datalake_to_customers_via_email_using_glue_and_sns_or_ses_spark.operators import (  # noqa: E402
    QUERIES,
    RETIRED_QUERIES,
)
from sending_weekly_daily_csv_reports_from_hudi_datalake_to_customers_via_email_using_glue_and_sns_or_ses_spark.operators.relational import (  # noqa: E402
    distinct_sort_limit,
)

def _repetition_signals(spark, sf):
    from sending_weekly_daily_csv_reports_from_hudi_datalake_to_customers_via_email_using_glue_and_sns_or_ses_spark.catalog import (
        load_table,
    )
    from sending_weekly_daily_csv_reports_from_hudi_datalake_to_customers_via_email_using_glue_and_sns_or_ses_spark.operators.textual import (
        repetition_signals,
    )

    return repetition_signals(load_table(spark, sf, "documents"))


def _mixture_sample(spark, sf):
    from sending_weekly_daily_csv_reports_from_hudi_datalake_to_customers_via_email_using_glue_and_sns_or_ses_spark.catalog import (
        load_table,
    )
    from sending_weekly_daily_csv_reports_from_hudi_datalake_to_customers_via_email_using_glue_and_sns_or_ses_spark.operators.curation import (
        mixture_sample,
    )

    sampled, _ = mixture_sample(
        load_table(spark, sf, "documents"), {"src0": 2.0, "src1": 1.0}
    )
    return sampled


def _dedup_incremental(spark, sf):
    from pyspark.sql import functions as F

    from sending_weekly_daily_csv_reports_from_hudi_datalake_to_customers_via_email_using_glue_and_sns_or_ses_spark.catalog import (
        load_table,
    )
    from sending_weekly_daily_csv_reports_from_hudi_datalake_to_customers_via_email_using_glue_and_sns_or_ses_spark.operators.dedup import (
        build_corpus_index,
        dedup_incremental,
    )

    import atexit
    import shutil
    import tempfile

    d = load_table(spark, sf, "documents")
    is_batch = F.col("doc_id") % 10 == 0
    # per-run private dir (a fixed /tmp path would collide across
    # concurrent runs/users), removed at interpreter exit — it must
    # outlive this function because the returned plan is lazy
    idx_path = tempfile.mkdtemp(prefix="plans_dedup_idx_")
    atexit.register(shutil.rmtree, idx_path, ignore_errors=True)
    build_corpus_index(d.filter(~is_batch)).write.mode("overwrite").parquet(idx_path)
    clean, _ = dedup_incremental(
        d.filter(is_batch), spark.read.parquet(idx_path)
    )
    return clean


def _exact_substring_pairs(spark, sf):
    from sending_weekly_daily_csv_reports_from_hudi_datalake_to_customers_via_email_using_glue_and_sns_or_ses_spark.catalog import (
        load_table,
    )
    from sending_weekly_daily_csv_reports_from_hudi_datalake_to_customers_via_email_using_glue_and_sns_or_ses_spark.operators.dedup import (
        exact_substring_pairs,
    )

    return exact_substring_pairs(load_table(spark, sf, "documents"), k=10)


def _remove_shared_substrings(spark, sf):
    from sending_weekly_daily_csv_reports_from_hudi_datalake_to_customers_via_email_using_glue_and_sns_or_ses_spark.catalog import (
        load_table,
    )
    from sending_weekly_daily_csv_reports_from_hudi_datalake_to_customers_via_email_using_glue_and_sns_or_ses_spark.operators.dedup import (
        remove_shared_substrings,
    )

    return remove_shared_substrings(
        load_table(spark, sf, "documents").select("doc_id", "text"), k=10
    )


def _shared_substring_runs(spark, sf):
    from sending_weekly_daily_csv_reports_from_hudi_datalake_to_customers_via_email_using_glue_and_sns_or_ses_spark.catalog import (
        load_table,
    )
    from sending_weekly_daily_csv_reports_from_hudi_datalake_to_customers_via_email_using_glue_and_sns_or_ses_spark.operators.dedup import (
        shared_substring_runs,
    )

    return shared_substring_runs(
        load_table(spark, sf, "documents").select("doc_id", "text"), k=10
    )


def _decontaminate_fuzzy(spark, sf):
    from sending_weekly_daily_csv_reports_from_hudi_datalake_to_customers_via_email_using_glue_and_sns_or_ses_spark.catalog import (
        load_table,
    )
    from sending_weekly_daily_csv_reports_from_hudi_datalake_to_customers_via_email_using_glue_and_sns_or_ses_spark.operators.curation import (
        decontaminate_fuzzy,
    )

    d = load_table(spark, sf, "documents").select("doc_id", "text")
    _clean, report = decontaminate_fuzzy(d, d.filter("doc_id % 10 = 7"))
    return report



def _compression_signals(spark, sf):
    from sending_weekly_daily_csv_reports_from_hudi_datalake_to_customers_via_email_using_glue_and_sns_or_ses_spark.catalog import (
        load_table,
    )
    from sending_weekly_daily_csv_reports_from_hudi_datalake_to_customers_via_email_using_glue_and_sns_or_ses_spark.operators.textual import (
        compression_signals,
    )

    return compression_signals(
        load_table(spark, sf, "documents").select("doc_id", "text")
    )


#: library functions reviewed alongside the registered corpus
def _quality_threshold_gate(spark, sf):
    from pyspark.sql import functions as F

    from sending_weekly_daily_csv_reports_from_hudi_datalake_to_customers_via_email_using_glue_and_sns_or_ses_spark.catalog import (
        load_table,
    )
    from sending_weekly_daily_csv_reports_from_hudi_datalake_to_customers_via_email_using_glue_and_sns_or_ses_spark.operators.curation import (
        quality_threshold_gate,
    )
    from sending_weekly_daily_csv_reports_from_hudi_datalake_to_customers_via_email_using_glue_and_sns_or_ses_spark.operators.textual import (
        quality_score_column,
    )

    d = load_table(spark, sf, "documents").select(
        "doc_id", "source", quality_score_column(F.col("text")).alias("quality")
    )
    return quality_threshold_gate(d, 0.25)


def _url_dedup(spark, sf):
    from sending_weekly_daily_csv_reports_from_hudi_datalake_to_customers_via_email_using_glue_and_sns_or_ses_spark.operators.weburl import (
        _fabricated_urls,
        url_dedup,
    )

    return url_dedup(_fabricated_urls(spark, sf))


def _dedup_lines(spark, sf):
    from sending_weekly_daily_csv_reports_from_hudi_datalake_to_customers_via_email_using_glue_and_sns_or_ses_spark.catalog import (
        load_table,
    )
    from sending_weekly_daily_csv_reports_from_hudi_datalake_to_customers_via_email_using_glue_and_sns_or_ses_spark.operators.dedup import (
        dedup_lines,
    )

    return dedup_lines(load_table(spark, sf, "documents").select("doc_id", "text"))


EXTRA = {
    "distinct_sort_limit": distinct_sort_limit,
    "dedup_lines": _dedup_lines,
    "quality_threshold_gate": _quality_threshold_gate,
    "url_dedup": _url_dedup,
    "repetition_signals": _repetition_signals,
    "mixture_sample": _mixture_sample,
    "dedup_incremental": _dedup_incremental,
    "exact_substring_pairs": _exact_substring_pairs,
    "remove_shared_substrings": _remove_shared_substrings,
    "shared_substring_runs": _shared_substring_runs,
    "decontaminate_fuzzy": _decontaminate_fuzzy,
    "compression_signals": _compression_signals,
}

SF = "/root/testdata/sf0.001"

PICK = {
    "flagship_report": "URGENT filter pushed to orders scan; customer arrives as BroadcastHashJoin.",
    "q1_pricing_summary": "shipdate pushdown; partial_sum map-side combine before one hash shuffle; 7-column ReadSchema (pruned).",
    "join_multiway_revenue": "three dimension BroadcastHashJoins; the only shuffle is lineitem joined to filtered orders; orderdate pushdown.",
    "distinct_sort_limit": "TakeOrderedAndProject top-k (no global sort).",
    "window_ranking_topk": "single hash shuffle on o_custkey, in-partition sort, rank filter.",
    "dedup_exact": "md5 projection then partial/final hash aggregate on the fingerprint.",
    "incremental_scan": "commit predicate + all report predicates as PushedFilters on the scan.",
    "join_range_asof": "union of tagged sides, ONE Window (running last ignorenulls) keyed by custkey — no join, no fan-out.",
    "knn_approx": "query signatures broadcast (BroadcastNestedLoopJoin over 3 rows); corpus scanned once, no SortMergeJoin anywhere.",
    "dedup_embedding_cosine": "ONE bucket self-equi-join over the exploded band keys; exact cosine verified on the joined row.",
    "dedup_simhash": "ONE exploded (chunk-id, value) struct self-join (r5 rewrite; was 4 per-chunk join branches); signature rides the exploded rows.",
    "knn_approx_ivf": "probe scan of the cell-partitioned layout carries PartitionFilters (cell IN probed set) — only nprobe/K directories read.",
    "decontaminate": "eval shingles arrive as BroadcastExchange; corpus branch is exchange-free up to the join (no distinct shuffle); first corpus shuffle is the per-doc hit aggregation.",
    "repetition_signals": "no join anywhere: short docs restored by UNION of a filtered second scan; two aggregation exchanges only.",
    "mixture_sample": "membership is a filter fused into the scan — zero Exchange, zero join; the planning aggregate is a separate already-collected job.",
    "dedup_incremental": "every index-side join (fingerprint, band key, verify signatures) broadcasts the batch-derived side and the persisted index only streams — probed at organic x10: 6 BroadcastHashJoins, and the only 2 SortMergeJoins are between batch-sized frames (final anti-join, candidate×signature). At this sf0.001 snapshot some of those batch-sized joins also print as SMJ (tiny-stats AQE); the x10 shape is the contract.",
    "exact_substring_pairs": "narrow (doc, h1, h2) postings — no window text in the shuffle; ONE self-equi-join on the hash pair feeds the per-pair count aggregate. The hot-window guard is a broadcast LeftAnti in the logical plan, but at this sf0.001 snapshot the hot set is EMPTY and AQE's empty-relation propagation elides the node from the final plan (the dedup_incremental tiny-stats caveat, anti-join edition). Since r6 also a driver entry (documents, k=20) with a hash-free DuckDB window-string oracle. The postings are PERSISTED (InMemoryTableScan below the join): three plan paths consume them and AQE does not fold the identical subtrees — without the persist the corpus scan ran 3x (BASELINE r6).",
    "dedup_lines": "corpus-wide line dedup (late r7, also a driver entry over 12-token-chunked docs): hot-line marking is ONE partial-aggregated groupBy over the double-xxhash64 line key — map-side combine absorbs million-fold banners, nothing pairwise, no cap needed; exchanges carry (id, line_no, h1, h2) only, never line text; consecutive cut lines merge to intervals on the SAME per-doc partitioning as the rejoin; untouched docs rebuilt from the split array (single evaluation point — an expression-valued text input is computed once, BASELINE r7).",
    "remove_shared_substrings": "the REMOVAL pass never builds the detector's pairwise join: duplicate marking is one partial-aggregated groupBy over the window hash; the three joins are keyed (hash → marks → doc_id rejoin); r7: cut starts merge into disjoint intervals via ONE Window + groupBy on the SAME per-doc partitioning (no extra exchange) before the token surgery, so the per-token array probe is O(n_merged_intervals) — the interpreted-HOF quadratic on boilerplate-heavy docs is gone (18x on the adversarial 50k-token doc, BASELINE r7). Driver entry since r7 with a hash-free cleaned-text-rebuilding oracle.",
    "shared_substring_runs": "driver entry since r7 (hash-free window-string oracle). The detector's narrow postings with positions kept (4-long rows — no window text in any exchange); the hot cap counts OCCURRENCES, not distinct docs, bounding the self-join to max_postings² per window even for within-doc repeats; run assembly is one Window over (pair, diagonal), data-proportional to the join output; postings persisted (shared _window_postings builder, see exact_substring_pairs).",
    "substring_incremental": "driver entry since r7: the standing-corpus substring check — the window index's narrow (doc, h1, h2) rows stream into the union-cap aggregate and the probe/build joins; the batch side broadcasts its id set for the replay anti-join; corpus TEXT appears in no exchange anywhere (only the index build scans it, once).",
    "decontaminate_fuzzy": "driver entry since r7 (exact string-shingle DuckDB oracle). One HOF layer then explode, shingle identity hashed AFTER the explode (codegen'd xxhash64) — every exchange moves 16-byte (id, hash) rows, never shingle strings (plan test greps the hashpartitioning args); eval side broadcasts, Jaccard + strongest-match window run over HIT rows only. r12: the corpus stream is pre-partitioned by doc_id before the distinct, so the distinct, pair aggregate, size aggregate and window all share ONE corpus exchange (the explicit REPARTITION_BY_COL — pinned; was 3 executed exchanges). The first-cut array_distinct∘transform form was interpreted-HOF and 8× slower (BASELINE r6).",
    "compression_signals": "one Arrow-batched zlib scan (single ArrowEvalPython node, the UDF deduplicated across its three consumers) — zero Exchange, zero Join; the one quality signal that genuinely needs a library call (plan-pinned by test_compression_signals_zero_shuffle).",
    "lm_perplexity": "train collects only the capped top-V vocab; scoring is one corpus scan → explode_outer → BroadcastHashJoin against the literal vocab frame → one per-doc aggregation exchange (pinned by test_lm_score_is_single_scan_broadcast_join).",
    "quality_quantile_gate": "driver entry since r7: exact per-source quantile cut — the rank and group-count window specs share one source-keyed Exchange (pinned); 3-column ReadSchema (text scored in the scan projection, nothing else read).",
    "quality_threshold_gate": "the 100 TB gate path: approx_percentile partial/final (sketch merge moves #partitions×#sources sketches, not rows) → #sources-row BroadcastHashJoin → stateless score filter. Two scans of the input by contract — materialize expensive scores first (docstring + BASELINE r7).",
    "url_canonical_dedup": "driver entry since r7: URL fabrication + canonicalization fuse into the scan as pure codegen (no Python, no join); ONE Exchange on the canonical URL feeding a partial/final count-min aggregate; text column never read (pinned).",
    "url_dedup": "library keep-one-per-canonical-URL: same scan-fused canonicalization; the ordered row_number and unordered count window specs share ONE canon_url Exchange (pinned).",
    "cdc_scan": "driver entry since late r7: the whole CDC window family (epoch count, running struct-max state, lag before-images) shares ONE record-key Exchange; delete fabrication is a bare key-only tombstone scan (no join of any kind, cleaner-proof); the log scan is partition-pruned on its commit dir column (pinned).",
    "dq_report": "driver entry since late r7 (Deequ shape): ALL five scan rules fold into ONE partial/final aggregate over ONE orders scan (the count_distinct Expand is that aggregate's only widening); the FK rule is a second small aggregate over a BroadcastHashJoin against DISTINCT customer keys; the per-rule rows come from exploding a literal struct array over the single agg row — free. 50 rules cost the same one pass.",
    "filegroup_snapshot": "driver entry since end-r7: the bucket-index engine's snapshot (latest AND manifest time travel) is a pure union of write-time-merged file slices — zero Exchange, zero Window, zero Aggregate in the read plan (pinned). Write amplification is bounded at commit time instead: only touched file groups rewrite (BASELINE r7: 16x bytes/commit reduction at 64 buckets / 4 touched).",
}


def main() -> None:
    spark = get_spark("plans", master="local[8]")
    out = io.StringIO()
    out.write(
        "# PLANS — reviewed physical plans (sf0.001, AQE final)\n\n"
        "Generated by `python tests/gen_plans.py` (regenerate after plan-shape\n"
        "changes). Each plan was executed so AQE's FINAL plan is shown. The\n"
        "one-line note states the property `tests/test_plans.py` pins.\n\n"
    )
    for name, note in PICK.items():
        # EXTRA first (mirrors tools/gen_organic_sf.py): where a name
        # exists in both — exact_substring_pairs since its r6 registry
        # promotion — the reviewed plan is the library shape (k=10)
        df = (EXTRA.get(name) or QUERIES.get(name) or RETIRED_QUERIES[name])(
            spark, SF
        )
        df.collect()
        plan = df._jdf.queryExecution().executedPlan().toString()
        out.write(f"## {name}\n\n{note}\n\n```\n{plan[:3000]}\n```\n\n")
    Path(__file__).resolve().parents[1].joinpath("PLANS.md").write_text(
        out.getvalue()
    )
    print(f"PLANS.md written ({len(out.getvalue())} chars)")


if __name__ == "__main__":
    main()
