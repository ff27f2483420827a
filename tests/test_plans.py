"""Plan-shape assertions (SURVEY.md §4): the properties that decide
whether a query survives a 100×-1000× scale-up — filter pushdown, column
pruning, broadcast joins, partial aggregation, codegen coverage — are
pinned as tests so a refactor can't silently regress them.
"""

from __future__ import annotations

from sending_weekly_daily_csv_reports_from_hudi_datalake_to_customers_via_email_using_glue_and_sns_or_ses_spark.operators import (
    QUERIES,
    RETIRED_QUERIES,
)
from sending_weekly_daily_csv_reports_from_hudi_datalake_to_customers_via_email_using_glue_and_sns_or_ses_spark.plans.explain import (
    codegen_stage_count,
    has_broadcast_join,
    has_partial_aggregate,
    physical_plan,
    pushed_filters,
)

SF = "/root/testdata/sf0.001"


def test_flagship_filter_pushdown_and_broadcast(spark):
    df = QUERIES["flagship_report"](spark, SF)
    pf = pushed_filters(df)
    # the URGENT predicate must reach the orders parquet scan
    assert "o_orderpriority" in pf and "1-URGENT" in pf
    # the customer dimension must come in as a broadcast
    assert has_broadcast_join(df)


def test_incremental_scan_all_predicates_pushed(spark):
    # S2's commit predicate plus the conjunctive R3 predicates must ALL
    # reach the parquet scan
    pf = pushed_filters(QUERIES["incremental_scan"](spark, SF))
    for col in ("o_orderstatus", "o_totalprice", "o_orderdate", "o_orderpriority"):
        assert col in pf, f"{col} not pushed to scan: {pf}"
    assert "GreaterThanOrEqual" in pf


def test_q1_partial_aggregation_and_codegen(spark):
    df = QUERIES["q1_pricing_summary"](spark, SF)
    assert has_partial_aggregate(df)
    assert codegen_stage_count(df) >= 1
    # shipdate filter pushed
    assert "l_shipdate" in pushed_filters(df)


def test_q1_column_pruning(spark):
    plan = physical_plan(QUERIES["q1_pricing_summary"](spark, SF))
    # lineitem scan must not read the join keys it doesn't need
    scan_lines = [l for l in plan.splitlines() if "ReadSchema" in l]
    assert scan_lines
    assert "l_partkey" not in scan_lines[0]
    assert "l_suppkey" not in scan_lines[0]


def test_multiway_join_broadcasts_dimensions(spark):
    plan = physical_plan(QUERIES["join_multiway_revenue"](spark, SF))
    # customer/nation/region arrive broadcast; at most the
    # lineitem⋈orders join may shuffle
    assert plan.count("BroadcastHashJoin") >= 3
    # orderdate filter pushed to the orders scan
    assert "o_orderdate" in pushed_filters(QUERIES["join_multiway_revenue"](spark, SF))


def test_distinct_sort_limit_is_topk(spark):
    # distinct_sort_limit is a library function (retired from the driver
    # corpus in round 5 to fit the 50-entry budget); the plan property
    # stays pinned here.
    from sending_weekly_daily_csv_reports_from_hudi_datalake_to_customers_via_email_using_glue_and_sns_or_ses_spark.operators.relational import (
        distinct_sort_limit,
    )

    plan = physical_plan(distinct_sort_limit(spark, SF))
    # ORDER BY + LIMIT must plan as top-k (TakeOrderedAndProject),
    # never a global sort
    assert "TakeOrderedAndProject" in plan


def test_semi_anti_join_prunes_probe_columns(spark):
    plan = physical_plan(QUERIES["join_semi_anti"](spark, SF))
    assert "LeftSemi" in plan and "LeftAnti" in plan
    # the orders side only needs o_custkey (+ the pushed filter column)
    scan_lines = [l for l in plan.splitlines() if "ReadSchema" in l and "orders" in l]
    if scan_lines:
        assert "o_totalprice" not in scan_lines[0]


def test_range_asof_is_union_window_not_join(spark):
    # the scale-safe as-of: ONE window over the unioned stream — no
    # join-then-aggregate fan-out (VERDICT r1 item #4)
    plan = physical_plan(QUERIES["join_range_asof"](spark, SF))
    assert "Window" in plan
    assert "Join" not in plan, "as-of must not plan as a join"
    # orders side is pruned to the event key space before the shuffle
    pf = pushed_filters(QUERIES["join_range_asof"](spark, SF))
    assert "o_custkey" in pf


def test_ivf_partition_pruning_end_to_end(spark, tmp_path):
    """IVF production story: corpus written partitionBy(cell); the probe
    query's cell predicate becomes PartitionFilters and the scan reads
    only the probed nprobe/K directories."""
    from sending_weekly_daily_csv_reports_from_hudi_datalake_to_customers_via_email_using_glue_and_sns_or_ses_spark.operators.similarity import (
        ivf_probe_partitioned,
        ivf_write_partitioned,
    )

    out = str(tmp_path / "ivf_corpus")
    cent = ivf_write_partitioned(spark, SF, out, K=16)
    df = ivf_probe_partitioned(spark, SF, out, cent, nprobe=8)
    plan = physical_plan(df)
    # the cell predicate must prune at the FILE LISTING level: the scan
    # node carries it as PartitionFilters (an IN over the partition
    # column), not a post-scan Filter — that's what makes the probe read
    # only nprobe/K directories at any scale
    scan_lines = [l for l in plan.splitlines() if "PartitionFilters" in l]
    assert scan_lines, plan
    assert "cell" in scan_lines[0] and "IN" in scan_lines[0]
    # rows can only come from probed cells (behavioral half of pruning)
    from pyspark.sql import functions as F

    src = (
        spark.read.parquet(out)
        .filter(F.col("cell").isin(list(range(16))))
        .select("cell")
        .distinct()
    )
    assert src.count() == 16  # corpus spans all K cells...
    pdf = df.toPandas()
    assert set(pdf["rank"]) == set(range(1, 11))  # ...probe stays correct


def test_knn_ivf_entry_reads_partitioned_layout(spark):
    """The knn_approx_ivf DRIVER ENTRY (not just the library functions)
    must go through the cell-partitioned layout: its scan carries the
    probe's cell predicate as PartitionFilters."""
    plan = physical_plan(QUERIES["knn_approx_ivf"](spark, SF))
    scan_lines = [l for l in plan.splitlines() if "PartitionFilters" in l]
    assert scan_lines, plan
    assert "cell" in scan_lines[0] and "IN" in scan_lines[0]


def test_merged_windows_share_one_exchange(spark):
    """The consolidated window queries keep ONE shuffle each: every
    window spec partitions on the same high-cardinality key, so
    EnsureRequirements reuses the exchange (extra specs cost only an
    in-partition sort, never another shuffle)."""
    for name in ("window_frames", "window_ranking_topk", "sessionization"):
        fn = QUERIES.get(name) or RETIRED_QUERIES[name]
        plan = physical_plan(fn(spark, SF))
        n_exchanges = plan.count("Exchange") - plan.count("BroadcastExchange")
        assert n_exchanges == 1, f"{name}: {n_exchanges} shuffles\n{plan}"


def test_text_profile_is_single_scan_no_shuffle(spark):
    """text_profile merges 4 per-doc analyses into one embarrassingly
    parallel scan: no Exchange at all."""
    plan = physical_plan(QUERIES["text_profile"](spark, SF))
    assert "Exchange" not in plan
    assert plan.count("Scan parquet") + plan.count("FileScan") >= 1


def test_bucketed_join_has_no_shuffle(spark, tmp_path):
    """Co-located join via bucketing: orders and lineitem published
    bucketBy(join key) join with ZERO shuffle exchanges — the write-time
    amortization of the report pipeline's recurring fact⋈fact join."""
    from pyspark.sql import functions as F

    from sending_weekly_daily_csv_reports_from_hudi_datalake_to_customers_via_email_using_glue_and_sns_or_ses_spark.catalog import (
        Catalog,
        load_table,
    )

    cat = Catalog(spark)
    cat.publish_bucketed(
        load_table(spark, SF, "orders"), "orders_b", "o_orderkey", n_buckets=8
    )
    cat.publish_bucketed(
        load_table(spark, SF, "lineitem"), "lineitem_b", "l_orderkey", n_buckets=8
    )
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        # disable broadcast so the (at-scale) shuffle-join path is what
        # gets planned — at sf0.001 everything broadcasts otherwise
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        o = spark.table("orders_b")
        li = spark.table("lineitem_b")
        joined = (
            li.join(o, li.l_orderkey == o.o_orderkey)
            .groupBy("o_orderpriority")
            .agg(F.count("*").alias("n"))
        )
        plan = physical_plan(joined)
        assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan
        assert "SelectedBucketsCount" in plan  # scan is bucket-aware
        # bucket specs match → the JOIN inputs need no Exchange; only
        # the final tiny aggregation may shuffle
        join_part = plan.split("Join", 1)[1]
        assert "Exchange" not in join_part, plan
        assert joined.count() > 0
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        spark.sql("DROP TABLE IF EXISTS orders_b")
        spark.sql("DROP TABLE IF EXISTS lineitem_b")


def test_minhash_banding_is_single_join(spark):
    """The LSH banding must stay ONE exploded-struct self-join (plus the
    two candidate-verify joins) — a refactor back to per-band join
    branches would multiply the shuffle count by the band count."""
    plan = physical_plan(QUERIES["dedup_minhash_lsh"](spark, SF))
    joins = sum(
        plan.count(k)
        for k in ("SortMergeJoin", "ShuffledHashJoin", "BroadcastHashJoin")
    )
    assert joins <= 4, f"expected ≤4 joins (1 banding + verify), got {joins}"


def test_knn_lsh_query_side_is_broadcast(spark):
    """The LSH retrieval's candidate step must broadcast the (tiny)
    query-signature side against the corpus scan — a shuffle of the
    corpus keyed by band would be a full extra pass at 100 TB."""
    plan = physical_plan(QUERIES["knn_approx"](spark, SF))
    assert "Broadcast" in plan
    # no corpus-wide shuffle join anywhere in the candidate step
    assert "SortMergeJoin" not in plan


def test_simhash_banding_is_single_join(spark):
    """The simhash pigeonhole banding must stay ONE exploded-struct
    self-join (the minhash pattern) — a refactor back to four per-chunk
    join branches would multiply the shuffle count by the chunk count."""
    plan = physical_plan(RETIRED_QUERIES["dedup_simhash"](spark, SF))
    joins = sum(
        plan.count(k)
        for k in ("SortMergeJoin", "ShuffledHashJoin", "BroadcastHashJoin")
    )
    assert joins <= 1, f"expected a single banding self-join, got {joins}"


def test_embedding_cosine_banding_is_single_self_join(spark):
    """The embedding near-dup LSH must stay ONE bucket self-equi-join;
    the exact-verify cosine is computed on the joined row, not via
    extra joins back to the corpus."""
    plan = physical_plan(QUERIES["dedup_embedding_cosine"](spark, SF))
    joins = sum(
        plan.count(k)
        for k in ("SortMergeJoin", "ShuffledHashJoin", "BroadcastHashJoin")
    )
    assert joins <= 1, f"expected a single banding self-join, got {joins}"


def test_decontaminate_is_broadcast_join_single_corpus_scan(spark):
    # the eval side (a benchmark suite in production) must arrive as a
    # broadcast, and the corpus side must reach the join with NO
    # exchange of its own — its first shuffle is the final per-doc
    # aggregation (curation.py's distinct-free corpus rule)
    df = QUERIES["decontaminate"](spark, SF)
    assert has_broadcast_join(df)
    plan = physical_plan(df)
    join_at = plan.index("BroadcastHashJoin")
    corpus_side = plan[join_at:]
    # below the join, the only Exchange allowed is inside the broadcast
    # build side; the probe (corpus) branch must be exchange-free
    probe_branch = corpus_side.split("BroadcastExchange")[0]
    assert "Exchange" not in probe_branch.replace("BroadcastExchange", ""), (
        "corpus side shuffles before the join:\n" + probe_branch
    )


def test_repetition_signals_no_join_back(spark):
    """Short docs are restored by UNION of a filtered second scan, not
    a join back to the aggregate — the plan must contain NO join and
    only the two aggregation exchanges."""
    from sending_weekly_daily_csv_reports_from_hudi_datalake_to_customers_via_email_using_glue_and_sns_or_ses_spark.catalog import (
        load_table,
    )
    from sending_weekly_daily_csv_reports_from_hudi_datalake_to_customers_via_email_using_glue_and_sns_or_ses_spark.operators.textual import (
        repetition_signals,
    )

    plan = physical_plan(repetition_signals(load_table(spark, SF, "documents")))
    for k in ("SortMergeJoin", "ShuffledHashJoin", "BroadcastHashJoin"):
        assert k not in plan, f"unexpected {k} in repetition_signals plan"
    assert plan.count("Exchange") <= 2, plan


def test_mixture_sample_is_scan_fused_filter(spark):
    """The returned sample must be a filter fused into the scan — zero
    Exchange, zero join; the per-source planning aggregate is a separate
    (already collected) job."""
    from sending_weekly_daily_csv_reports_from_hudi_datalake_to_customers_via_email_using_glue_and_sns_or_ses_spark.catalog import (
        load_table,
    )
    from sending_weekly_daily_csv_reports_from_hudi_datalake_to_customers_via_email_using_glue_and_sns_or_ses_spark.operators.curation import (
        mixture_sample,
    )

    docs = load_table(spark, SF, "documents")
    sampled, _plan = mixture_sample(docs, {"src0": 2.0, "src1": 1.0})
    plan = physical_plan(sampled)
    assert "Exchange" not in plan, plan
    assert "Join" not in plan, plan


def test_pack_sequences_is_partition_local(spark):
    """Packing is per-partition mapInPandas by contract — no Exchange
    unless the caller asks for a rebalance."""
    from pyspark.sql import functions as F

    from sending_weekly_daily_csv_reports_from_hudi_datalake_to_customers_via_email_using_glue_and_sns_or_ses_spark.catalog import (
        load_table,
    )
    from sending_weekly_daily_csv_reports_from_hudi_datalake_to_customers_via_email_using_glue_and_sns_or_ses_spark.operators.mlprep import (
        pack_sequences,
    )

    docs = load_table(spark, SF, "documents").withColumn(
        "n_tokens", F.size(F.split("text", r"\s+"))
    )
    plan = physical_plan(pack_sequences(docs, max_tokens=256))
    assert "Exchange" not in plan, plan


def test_remove_shared_substrings_no_pairwise_join(spark):
    """The substring REMOVAL pass must never build the detector's
    pairwise postings self-join: duplicate marking is one groupBy over
    the window-hash (partial-aggregated, so hot boilerplate windows
    combine map-side), and every join in the plan is keyed by doc_id /
    the hash — no cartesian anywhere."""
    from sending_weekly_daily_csv_reports_from_hudi_datalake_to_customers_via_email_using_glue_and_sns_or_ses_spark.catalog import (
        load_table,
    )
    from sending_weekly_daily_csv_reports_from_hudi_datalake_to_customers_via_email_using_glue_and_sns_or_ses_spark.operators.dedup import (
        remove_shared_substrings,
    )

    docs = load_table(spark, SF, "documents").select("doc_id", "text")
    df = remove_shared_substrings(docs, k=10)
    plan = physical_plan(df)
    assert "CartesianProduct" not in plan and "BroadcastNestedLoop" not in plan
    assert has_partial_aggregate(df), plan
    joins = sum(
        plan.count(k)
        for k in ("SortMergeJoin", "ShuffledHashJoin", "BroadcastHashJoin")
    )
    assert joins <= 3, f"expected ≤3 keyed joins (dup, marks, rejoin): {joins}"


def test_dedup_lines_no_pairwise_join_partial_agg(spark):
    """The line-dedup pass is the same shape as the substring removal
    pass: hot-line marking is ONE groupBy over the line-key hash
    (partial-aggregated — a 10⁶× banner combines map-side), every join
    keys on doc_id / the hash, nothing pairwise, and no line text
    enters the hash shuffle (the exploded projection carries only id,
    line_no and the two 64-bit hashes)."""
    from sending_weekly_daily_csv_reports_from_hudi_datalake_to_customers_via_email_using_glue_and_sns_or_ses_spark.catalog import (
        load_table,
    )
    from sending_weekly_daily_csv_reports_from_hudi_datalake_to_customers_via_email_using_glue_and_sns_or_ses_spark.operators.dedup import (
        dedup_lines,
    )

    docs = load_table(spark, SF, "documents").select("doc_id", "text")
    df = dedup_lines(docs)
    plan = physical_plan(df)
    assert "CartesianProduct" not in plan and "BroadcastNestedLoop" not in plan
    assert has_partial_aggregate(df), plan
    joins = sum(
        plan.count(k)
        for k in ("SortMergeJoin", "ShuffledHashJoin", "BroadcastHashJoin")
    )
    assert joins <= 2, f"expected ≤2 keyed joins (hot, rejoin): {joins}"


def test_compression_signals_zero_shuffle(spark):
    """The compressibility signal is one Arrow-batched scan — no
    Exchange, no join; the only non-scan node is the ArrowEvalPython
    batch."""
    from sending_weekly_daily_csv_reports_from_hudi_datalake_to_customers_via_email_using_glue_and_sns_or_ses_spark.catalog import (
        load_table,
    )
    from sending_weekly_daily_csv_reports_from_hudi_datalake_to_customers_via_email_using_glue_and_sns_or_ses_spark.operators.textual import (
        compression_signals,
    )

    docs = load_table(spark, SF, "documents").select("doc_id", "text")
    plan = physical_plan(compression_signals(docs))
    assert "Exchange" not in plan, plan
    assert "Join" not in plan, plan
    assert "ArrowEvalPython" in plan, plan


def test_shared_substring_runs_narrow_postings_shape(spark):
    """The run assembler must keep the detector's narrow shape: every
    shuffle row is longs-only (the 4-long postings / joined diagonals —
    no token or window STRINGS in any exchange), the hot-window guard
    is a broadcast join (anti; AQE may elide it when the hot set is
    empty at tiny sf), and there is exactly one equi-self-join plus the
    run-assembly window — no cartesian anywhere."""
    from sending_weekly_daily_csv_reports_from_hudi_datalake_to_customers_via_email_using_glue_and_sns_or_ses_spark.catalog import (
        load_table,
    )
    from sending_weekly_daily_csv_reports_from_hudi_datalake_to_customers_via_email_using_glue_and_sns_or_ses_spark.operators.dedup import (
        shared_substring_runs,
    )

    docs = load_table(spark, SF, "documents").select("doc_id", "text")
    df = shared_substring_runs(docs, k=10)
    plan = physical_plan(df)
    assert "CartesianProduct" not in plan and "BroadcastNestedLoop" not in plan
    assert "Window" in plan, plan
    import re

    for args in re.findall(r"Exchange hashpartitioning\(([^)]*)\)", plan):
        assert "toks" not in args and not re.search(r"\bw\b", args), (
            f"window/token strings shuffle: {args}"
        )


def test_substring_incremental_narrow_no_text_shape(spark):
    """The standing-corpus substring check must keep the family's
    narrow shape: the batch's id set arrives at the index as a
    BROADCAST anti-join build side (no index shuffle to exclude replay
    rows), no cartesian anywhere, and no token/window STRINGS in any
    exchange — only the index build's one corpus scan ever touches
    text."""
    from sending_weekly_daily_csv_reports_from_hudi_datalake_to_customers_via_email_using_glue_and_sns_or_ses_spark.catalog import (
        load_table,
    )
    from sending_weekly_daily_csv_reports_from_hudi_datalake_to_customers_via_email_using_glue_and_sns_or_ses_spark.operators.dedup import (
        build_window_index,
        exact_substring_pairs_incremental,
    )
    from pyspark.sql import functions as F

    d = load_table(spark, SF, "documents").select("doc_id", "text")
    idx = build_window_index(d.filter(F.col("doc_id") % 10 != 3), k=10)
    df = exact_substring_pairs_incremental(
        d.filter(F.col("doc_id") % 10 == 3), idx, k=10
    )
    plan = physical_plan(df)
    assert "CartesianProduct" not in plan and "BroadcastNestedLoop" not in plan
    assert "BroadcastExchange" in plan, plan  # replay anti-join + hot cap
    # the index is filtered MAP-SIDE to batch-touched windows by a
    # broadcast semi-join BEFORE the cap aggregate and the pair join —
    # without it, both stages aggregate/shuffle the FULL index per batch
    assert "LeftSemi" in plan, plan
    import re

    for args in re.findall(r"Exchange hashpartitioning\(([^)]*)\)", plan):
        assert "toks" not in args and not re.search(r"\bw\b", args), (
            f"window/token strings shuffle: {args}"
        )


def test_decontaminate_fuzzy_narrow_codegen_shape(spark):
    """decontaminate_fuzzy must stay in the narrow-hash shape: the eval
    side broadcasts (no shuffle join against the corpus), there is no
    cartesian anywhere, and the shingle identity is hashed BEFORE any
    exchange so every shuffle moves 16-byte (id, hash) rows — never
    shingle STRINGS (the exchanges' output schemas carry no string
    shingle column)."""
    from sending_weekly_daily_csv_reports_from_hudi_datalake_to_customers_via_email_using_glue_and_sns_or_ses_spark.catalog import (
        load_table,
    )
    from sending_weekly_daily_csv_reports_from_hudi_datalake_to_customers_via_email_using_glue_and_sns_or_ses_spark.operators.curation import (
        decontaminate_fuzzy,
    )

    docs = load_table(spark, SF, "documents").select("doc_id", "text")
    eval_docs = docs.filter("doc_id % 10 = 7")
    _clean, report = decontaminate_fuzzy(docs, eval_docs)
    plan = physical_plan(report)
    assert "BroadcastHashJoin" in plan, plan
    assert "CartesianProduct" not in plan and "BroadcastNestedLoop" not in plan
    import re

    for args in re.findall(r"Exchange hashpartitioning\(([^)]*)\)", plan):
        assert "shingle" not in args, f"shingle strings shuffle: {args}"
    # r12 one-exchange corpus path: the ONLY doc_id-keyed exchange is
    # the explicit pre-partition (REPARTITION_BY_COL) — the distinct,
    # the (doc_id, eval_doc_id) pair aggregate, the per-doc size
    # aggregate and the strongest-match window all reuse its
    # partitioning, so no planner-inserted (ENSURE_REQUIREMENTS)
    # doc_id exchange may appear on the corpus side.
    corpus_exchanges = [
        line
        for line in plan.splitlines()
        if "Exchange hashpartitioning(doc_id" in line
    ]
    assert corpus_exchanges, plan
    assert all(
        "REPARTITION_BY_COL" in line for line in corpus_exchanges
    ), plan


def test_lm_score_is_single_scan_broadcast_join(spark):
    """LM scoring must stay one corpus scan feeding a broadcast vocab
    join and ONE aggregation exchange — the zero-token sentinel rides
    the same lineage (explode_outer), not a unioned second scan."""
    from sending_weekly_daily_csv_reports_from_hudi_datalake_to_customers_via_email_using_glue_and_sns_or_ses_spark.catalog import (
        load_table,
    )
    from sending_weekly_daily_csv_reports_from_hudi_datalake_to_customers_via_email_using_glue_and_sns_or_ses_spark.operators.scoring import (
        lm_score,
        train_unigram_lm,
    )

    docs = load_table(spark, SF, "documents")
    vocab, stats = train_unigram_lm(docs, vocab_size=100)
    plan = physical_plan(lm_score(docs, vocab, stats["oov_logp"]))
    assert plan.count("FileScan") == 1, plan
    assert "SortMergeJoin" not in plan and "ShuffledHashJoin" not in plan
    assert plan.replace("BroadcastExchange", "").count("Exchange") <= 1, plan


def test_quality_threshold_gate_broadcasts_thresholds(spark):
    """The 100 TB gate path: the per-source threshold table (#groups
    rows) must come back as a BROADCAST join — a shuffle join here
    would re-key the whole corpus by source (the skew axis) just to
    apply #groups scalar thresholds. The corpus side stays one scan:
    the sketch agg's partial phase reads it once, the filter reads it
    once more (no cache — callers persist if they fan out)."""
    from sending_weekly_daily_csv_reports_from_hudi_datalake_to_customers_via_email_using_glue_and_sns_or_ses_spark.catalog import (
        load_table,
    )
    from sending_weekly_daily_csv_reports_from_hudi_datalake_to_customers_via_email_using_glue_and_sns_or_ses_spark.operators.curation import (
        quality_threshold_gate,
    )
    from sending_weekly_daily_csv_reports_from_hudi_datalake_to_customers_via_email_using_glue_and_sns_or_ses_spark.operators.textual import (
        quality_score_column,
    )
    from pyspark.sql import functions as F

    docs = load_table(spark, SF, "documents").select(
        "doc_id", "source", quality_score_column(F.col("text")).alias("quality")
    )
    df = quality_threshold_gate(docs, 0.25)
    assert has_broadcast_join(df)
    # the sketch aggregation must combine map-side (partial_percentile
    # rows, not raw docs, cross the exchange)
    assert has_partial_aggregate(df)


def test_quality_quantile_gate_entry_single_window_pruned_scan(spark):
    """The exact driver entry: ONE window pass (rank and group count
    share the source partitioning — a second exchange would mean the
    two window specs diverged), and the documents scan is pruned to the
    three referenced columns."""
    df = QUERIES["quality_quantile_gate"](spark, SF)
    plan = physical_plan(df)
    assert plan.count("Exchange") == 1, plan
    read_schema = [
        line for line in plan.splitlines() if "ReadSchema" in line
    ]
    assert read_schema and "text" in read_schema[0]
    assert "n_chars" not in read_schema[0]  # unused column pruned


def test_url_canonical_dedup_scan_fused_single_exchange(spark):
    """URL curation's 100 TB contract: fabrication + canonicalization
    are pure codegen fused into the scan, and the dedup aggregate is
    partial (map-side combine) with ONE exchange on the canonical URL.
    No join, no window, no second shuffle."""
    df = QUERIES["url_canonical_dedup"](spark, SF)
    plan = physical_plan(df)
    assert plan.count("Exchange") == 1, plan
    assert "Join" not in plan, plan
    assert has_partial_aggregate(df)
    # only doc_id + source leave the parquet scan (text never read)
    read_schema = [l for l in plan.splitlines() if "ReadSchema" in l]
    assert read_schema and "text" not in read_schema[0]


def test_url_dedup_library_single_exchange(spark):
    """url_dedup's two window specs (ordered row_number, unordered
    count) share the canon_url partitioning — they must resolve to ONE
    exchange, not one per spec."""
    from sending_weekly_daily_csv_reports_from_hudi_datalake_to_customers_via_email_using_glue_and_sns_or_ses_spark.operators.weburl import (
        _fabricated_urls,
        url_dedup,
    )

    plan = physical_plan(url_dedup(_fabricated_urls(spark, SF)))
    assert plan.count("Exchange") == 1, plan
    assert "Join" not in plan, plan


def test_cdc_scan_single_exchange_pruned_diffs(spark):
    """cdc_scan's scale contract: the whole window family (epoch count,
    running struct-max state, lag before-images) shares ONE shuffle on
    the record key; delete fabrication is a bare key-only TOMBSTONE
    scan (no join against any snapshot — the late-r7 cleaner-proof
    path); the log scan is partition-pruned on its commit dir column."""
    from sending_weekly_daily_csv_reports_from_hudi_datalake_to_customers_via_email_using_glue_and_sns_or_ses_spark.plans.explain import (
        formatted_plan,
    )

    plan = formatted_plan(QUERIES["cdc_scan"](spark, SF))
    n_exchanges = plan.count("Exchange (") - plan.count("BroadcastExchange (")
    assert n_exchanges == 1, f"{n_exchanges} shuffles\n{plan}"
    # no join of any kind: deleted keys come straight from tombstones
    assert "Join" not in plan, plan
    scans = [
        frag
        for frag in plan.split("\n\n")
        if "/tombstones/" in frag and "ReadSchema" in frag
    ]
    assert scans, f"no tombstone scans found in plan\n{plan}"
    for frag in scans:
        line = next(l for l in frag.splitlines() if "ReadSchema" in l)
        assert "struct<k:int>" in line, line
    # the log scan prunes on the c= partition column
    assert "PartitionFilters" in plan


def test_filegroup_snapshot_zero_read_side_merge(spark):
    """The bucket-index engine's read contract: a snapshot (latest OR
    time-travel) is the UNION of the manifest's file slices — per-key
    merged at write time — so the read plan has no Window, no
    aggregate, and no shuffle at all: parquet scans + projections +
    union, wholly codegen. That is the read-optimized half of COW,
    preserved under bounded-write-amplification commits."""
    from sending_weekly_daily_csv_reports_from_hudi_datalake_to_customers_via_email_using_glue_and_sns_or_ses_spark.plans.explain import (
        formatted_plan,
    )

    plan = formatted_plan(QUERIES["filegroup_snapshot"](spark, SF))
    assert "Exchange" not in plan, plan
    assert "Window" not in plan, plan
    assert "Aggregate" not in plan, plan
    assert "Union" in plan, plan


def test_ivm_merge_and_recompute_plan_shapes(spark):
    """The IVM scale contract (operators/ivm.py): merging a window
    delta into the maintained aggregate is ONE shuffle on the group
    key (union + re-agg of two |groups|-sized frames — never a join);
    the dirty-group extremum recompute is a SEMI join with the tiny
    dirty-group list BROADCAST, so the base scan never shuffles."""
    from pyspark.sql import functions as F

    from sending_weekly_daily_csv_reports_from_hudi_datalake_to_customers_via_email_using_glue_and_sns_or_ses_spark.operators.ivm import (
        recompute_extremes,
    )
    from sending_weekly_daily_csv_reports_from_hudi_datalake_to_customers_via_email_using_glue_and_sns_or_ses_spark.plans.explain import (
        formatted_plan,
    )

    base = spark.range(100_000).select(
        (F.col("id") % 97).cast("int").alias("grp"),
        F.col("id").cast("double").alias("v"),
    )
    dirty = spark.range(5).select(F.col("id").cast("int").alias("grp"))
    plan = formatted_plan(recompute_extremes(base, dirty, ["grp"], ["v"]))
    assert "LeftSemi" in plan, plan
    assert "BroadcastExchange" in plan, plan
    # the only real shuffle is the final group-by of the base side
    n_shuffles = plan.count("Exchange (") - plan.count("BroadcastExchange (")
    assert n_shuffles <= 1, f"{n_shuffles} shuffles\n{plan}"


def test_dq_report_plan_shape(spark):
    """The Deequ property, pinned on the DRIVER entry: all five scan
    rules fold into ONE aggregate over ONE orders scan, the FK rule
    adds exactly one more scan feeding a broadcast join aggregate, and
    (r8) the grouped lane adds exactly one more scan feeding the
    per-status groupBy aggregate — rule count never multiplies passes;
    LANE count is what adds scans."""
    plan = physical_plan(QUERIES["dq_report"](spark, SF))
    # scan-rules agg + FK probe + grouped-lane agg
    assert plan.count("orders.parquet") == 3
    assert plan.count("BroadcastHashJoin") == 1  # distinct customer keys
    assert "SortMergeJoin" not in plan
    assert "HashAggregate" in plan  # partial/final shape


def test_plan_health_triage(spark):
    """plan_health turns the explain-and-eyeball discipline into data:
    a pure-SQL star join reads as broadcast-joined zero-Python, a
    Pandas-UDF pipeline shows its deliberate Python stages, and the
    counters expose any cartesian product."""
    from sending_weekly_daily_csv_reports_from_hudi_datalake_to_customers_via_email_using_glue_and_sns_or_ses_spark.plans.explain import (
        plan_health,
    )

    h = plan_health(QUERIES["flagship_report"](spark, SF))
    assert h["broadcast_joins"] >= 1
    assert h["cartesian_products"] == 0
    assert h["python_stages"] == 0
    assert h["scans"] >= 2 and h["scans_with_pushdown"] >= 1
    assert h["codegen_stages"] >= 1

    m = plan_health(QUERIES["media_decode_pipeline"](spark, SF))
    assert m["python_stages"] >= 1  # the deliberate Arrow decode stage
