"""Organic (non-replicated) scale-factor generator + bench
(VERDICT r2 #8 / r3 #8): validate the replica-based scaling slopes with
data that GROWS organically — fresh seeded draws at N× the sf0.1 row
counts, same schemas and value distributions, rather than key-offset
copies of the same rows.

Generation is fully distributed: every column derives from
xxhash64(row_id, salt) over a spark.range frame — deterministic under
any partitioning, no driver-side loops, no numpy materialization. The
same approach a 1000-executor cluster would use to fabricate a 100 TB
test corpus.

The documents table plants near-dup structure organically (every 20th
doc is a token-perturbed copy of its predecessor) so the jaccard /
minhash / simhash family does real candidate-pair work, like the
driver corpus.

Bench-only tooling: correctness always runs on the driver's read-only
testdata. Usage:

    python tools/gen_organic_sf.py [N]     (default N=10 ≈ sf1)

Writes /tmp/spark_graft_organic/x{N}/ once (marker-gated), then times
the scaling query set at sf0.1 vs the organic copy and prints one JSON
line (same shape as tools/scaling_bench.py).
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from pyspark.sql import Column, DataFrame, SparkSession  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from sending_weekly_daily_csv_reports_from_hudi_datalake_to_customers_via_email_using_glue_and_sns_or_ses_spark import (  # noqa: E402
    get_spark,
)
from sending_weekly_daily_csv_reports_from_hudi_datalake_to_customers_via_email_using_glue_and_sns_or_ses_spark.catalog import (  # noqa: E402
    load_table,
)
from sending_weekly_daily_csv_reports_from_hudi_datalake_to_customers_via_email_using_glue_and_sns_or_ses_spark.operators import (  # noqa: E402
    QUERIES,
    RETIRED_QUERIES,
)
from tools.scaling_bench import SCALE_QUERIES  # noqa: E402

BASE_SF = "/root/testdata/sf0.1"

#: sf0.1 row counts (TESTDATA.md tables); organic N× scales these.
_BASE_ROWS = {
    "customer": 15_000,
    "supplier": 1_000,
    "part": 20_000,
    "orders": 150_000,
    "lineitem": 600_000,
    "events": 100_000,
    "documents": 5_000,
    "embeddings": 2_000,
}

_VOCAB = (
    "spark line column order small sort fast value scan hash slow batch "
    "part a the query agg table stream filter big merge group key join "
    "customer vector data plan shuffle"
).split()


def _h(salt: int) -> Column:
    """Deterministic 63-bit positive hash of the row id — the seed
    stream every column derives from."""
    return F.abs(F.xxhash64(F.col("id"), F.lit(salt)))


def _unit(salt: int) -> Column:
    """Uniform double in [0, 1) derived from the row id."""
    return (_h(salt) % 1_000_000) / F.lit(1_000_000.0)


def _pick(salt: int, values: list[str]) -> Column:
    arr = F.array(*[F.lit(v) for v in values])
    return F.element_at(arr, (_h(salt) % len(values) + 1).cast("int"))


def _ids(spark: SparkSession, n: int) -> DataFrame:
    return spark.range(0, n, 1, 32)


def _doc_text(seed_id: Column, perturb: Column) -> Column:
    """Seeded word sequence of 8..110 tokens; when ``perturb`` is set
    the first token is replaced — a near-dup of the same seed_id's
    organic text (high n-gram Jaccard, not an exact copy)."""
    vocab = F.array(*[F.lit(w) for w in _VOCAB])
    n_tok = (F.abs(F.xxhash64(seed_id, F.lit(101))) % 103 + 8).cast("int")
    words = F.transform(
        F.sequence(F.lit(1), n_tok),
        lambda i: F.element_at(
            vocab,
            (F.abs(F.xxhash64(seed_id, i, F.lit(202))) % len(_VOCAB) + 1).cast(
                "int"
            ),
        ),
    )
    words = F.when(
        perturb, F.concat(F.array(F.lit("perturbed")), F.slice(words, 2, 2_000))
    ).otherwise(words)
    return F.array_join(words, " ")


def build_organic(spark: SparkSession, n: int) -> str:
    out_dir = f"/tmp/spark_graft_organic/x{n}"
    marker = os.path.join(out_dir, "_DONE")
    if os.path.exists(marker):
        return out_dir
    rows = {t: c * n for t, c in _BASE_ROWS.items()}

    # fixed catalogs: identical at every scale (TPC-H semantics)
    for t in ("region", "nation"):
        load_table(spark, BASE_SF, t).write.mode("overwrite").parquet(
            os.path.join(out_dir, f"{t}.parquet")
        )

    nations = 25
    customer = _ids(spark, rows["customer"]).select(
        F.col("id").alias("c_custkey"),
        F.concat(F.lit("Customer#"), F.col("id")).alias("c_name"),
        (_h(1) % nations).cast("int").alias("c_nationkey"),
        F.round(_unit(2) * 11_000 - 1_000, 2).alias("c_acctbal"),
        _pick(3, ["BUILDING", "AUTOMOBILE", "MACHINERY", "HOUSEHOLD", "FURNITURE"]).alias(
            "c_mktsegment"
        ),
    )
    supplier = _ids(spark, rows["supplier"]).select(
        F.col("id").alias("s_suppkey"),
        F.concat(F.lit("Supplier#"), F.col("id")).alias("s_name"),
        (_h(4) % nations).cast("int").alias("s_nationkey"),
        F.round(_unit(5) * 11_000 - 1_000, 2).alias("s_acctbal"),
    )
    part = _ids(spark, rows["part"]).select(
        F.col("id").alias("p_partkey"),
        F.concat(F.lit("part "), _pick(6, _VOCAB), F.lit(" "), _pick(7, _VOCAB)).alias(
            "p_name"
        ),
        F.concat(F.lit("Brand#"), (_h(8) % 25 + 11)).alias("p_brand"),
        F.concat(
            _pick(9, ["STANDARD", "SMALL", "MEDIUM", "LARGE", "ECONOMY", "PROMO"]),
            F.lit(" "),
            _pick(10, ["ANODIZED", "BURNISHED", "PLATED", "POLISHED", "BRUSHED"]),
            F.lit(" "),
            _pick(11, ["TIN", "NICKEL", "BRASS", "STEEL", "COPPER"]),
        ).alias("p_type"),
        (_h(12) % 50 + 1).cast("int").alias("p_size"),
        F.round(_unit(13) * 1_900 + 100, 2).alias("p_retailprice"),
    )
    orders = _ids(spark, rows["orders"]).select(
        F.col("id").alias("o_orderkey"),
        (_h(14) % rows["customer"]).alias("o_custkey"),
        _pick(15, ["O", "F", "P"]).alias("o_orderstatus"),
        F.round(_unit(16) * 499_000 + 1_000, 2).alias("o_totalprice"),
        (
            F.to_timestamp(F.lit("1995-01-01"))
            + F.make_dt_interval(days=(_h(17) % 2404).cast("int"))
        ).alias("o_orderdate"),
        _pick(
            18,
            ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"],
        ).alias("o_orderpriority"),
    )
    lineitem = _ids(spark, rows["lineitem"]).select(
        (F.col("id") / 4).cast("bigint").alias("l_orderkey"),
        (_h(19) % rows["part"]).alias("l_partkey"),
        (_h(20) % rows["supplier"]).alias("l_suppkey"),
        (F.col("id") % 4 + 1).cast("int").alias("l_linenumber"),
        (_h(21) % 50 + 1).cast("double").alias("l_quantity"),
        F.round(_unit(22) * 104_099 + 900, 2).alias("l_extendedprice"),
        ((_h(23) % 11) / F.lit(100.0)).alias("l_discount"),
        ((_h(24) % 9) / F.lit(100.0)).alias("l_tax"),
        _pick(25, ["A", "N", "R"]).alias("l_returnflag"),
        _pick(26, ["O", "F"]).alias("l_linestatus"),
        (
            F.to_timestamp(F.lit("1995-01-02"))
            + F.make_dt_interval(days=(_h(27) % 2498).cast("int"))
        ).alias("l_shipdate"),
    )
    events = _ids(spark, rows["events"]).select(
        F.col("id").alias("event_id"),
        (
            F.to_timestamp(F.lit("2024-01-01"))
            + F.make_dt_interval(secs=(_h(28) % 2_592_000).cast("double"))
        ).alias("ts"),
        (_h(29) % (15 * max(n, 1) * 100)).alias("user_id"),
        _pick(30, ["view", "click", "purchase", "signup", "error"]).alias(
            "event_type"
        ),
        F.round(_unit(31) * 560, 2).alias("value"),
        F.concat(F.lit('{"k": '), (_h(32) % 100), F.lit("}")).alias("props"),
    )
    documents = (
        _ids(spark, rows["documents"])
        .select(
            F.col("id").alias("doc_id"),
            # every 20th doc re-rolls its predecessor's seed → a planted
            # organic near-dup family, density matching the driver corpus
            F.when(F.col("id") % 20 == 19, F.col("id") - 1)
            .otherwise(F.col("id"))
            .alias("seed_id"),
            (F.col("id") % 20 == 19).alias("is_dup"),
        )
        .select(
            "doc_id",
            _doc_text(F.col("seed_id"), F.col("is_dup")).alias("text"),
            F.when(F.abs(F.xxhash64("seed_id", F.lit(33))) % 10 < 8, F.lit("en"))
            .otherwise(
                F.element_at(
                    F.array(F.lit("zh"), F.lit("de")),
                    (F.abs(F.xxhash64("seed_id", F.lit(34))) % 2 + 1).cast("int"),
                )
            )
            .alias("lang"),
            F.concat(
                F.lit("src"), F.abs(F.xxhash64("seed_id", F.lit(35))) % 20
            ).alias("source"),
        )
        .withColumn("n_chars", F.length("text"))
    )
    embeddings = _ids(spark, rows["embeddings"]).select(
        F.col("id").alias("vec_id"),
        F.transform(
            F.sequence(F.lit(1), F.lit(64)),
            lambda i: (
                (F.abs(F.xxhash64(F.col("id"), i, F.lit(36))) % 2_000_001)
                / F.lit(1_000_000.0)
                - 1.0
            ).cast("float"),
        ).alias("embedding"),
        (_h(37) % 10).cast("int").alias("label"),
    )

    frames = {
        "customer": customer,
        "supplier": supplier,
        "part": part,
        "orders": orders,
        "lineitem": lineitem,
        "events": events,
        "documents": documents,
        "embeddings": embeddings,
    }
    for t, df in frames.items():
        df.write.mode("overwrite").parquet(os.path.join(out_dir, f"{t}.parquet"))
    open(marker, "w").close()
    return out_dir


def _minhash_clusters(spark, sf_dir):
    from sending_weekly_daily_csv_reports_from_hudi_datalake_to_customers_via_email_using_glue_and_sns_or_ses_spark.operators.dedup import (
        dedup_clusters,
    )

    return dedup_clusters(spark, sf_dir, edge_source="minhash")


def _docs(spark, sf_dir):
    from sending_weekly_daily_csv_reports_from_hudi_datalake_to_customers_via_email_using_glue_and_sns_or_ses_spark.catalog import (
        load_table,
    )

    return load_table(spark, sf_dir, "documents")


def _pack_sequences(spark, sf_dir):
    from pyspark.sql import functions as F

    from sending_weekly_daily_csv_reports_from_hudi_datalake_to_customers_via_email_using_glue_and_sns_or_ses_spark.operators.mlprep import (
        pack_sequences,
    )

    d = _docs(spark, sf_dir).withColumn("n_tokens", F.size(F.split("text", r"\s+")))
    return pack_sequences(d, max_tokens=256)


def _embedding_pca(spark, sf_dir):
    from sending_weekly_daily_csv_reports_from_hudi_datalake_to_customers_via_email_using_glue_and_sns_or_ses_spark.catalog import (
        load_table,
    )
    from sending_weekly_daily_csv_reports_from_hudi_datalake_to_customers_via_email_using_glue_and_sns_or_ses_spark.operators.mlprep import (
        embedding_pca,
    )

    e = load_table(spark, sf_dir, "embeddings")
    # the two partial-reduction passes run inside the call; the timed
    # write then forces the broadcast-matmul projection pass
    _, _, projected = embedding_pca(e, k=8)
    return projected


def _repetition_signals(spark, sf_dir):
    from sending_weekly_daily_csv_reports_from_hudi_datalake_to_customers_via_email_using_glue_and_sns_or_ses_spark.operators.textual import (
        repetition_signals,
    )

    return repetition_signals(_docs(spark, sf_dir))


def _mixture_sample(spark, sf_dir):
    from sending_weekly_daily_csv_reports_from_hudi_datalake_to_customers_via_email_using_glue_and_sns_or_ses_spark.operators.curation import (
        mixture_sample,
    )

    # skewed target over half the sources: some thinned hard, the
    # binding source kept whole, the other half dropped (weight 0)
    weights = {f"src{i}": float(10 - i) for i in range(10)}
    sampled, _ = mixture_sample(_docs(spark, sf_dir), weights)
    return sampled


def _dedup_incremental(spark, sf_dir):
    import hashlib
    import os

    from pyspark.sql import functions as F

    from sending_weekly_daily_csv_reports_from_hudi_datalake_to_customers_via_email_using_glue_and_sns_or_ses_spark.operators.dedup import (
        build_corpus_index,
        dedup_incremental,
    )

    # standing corpus = 90% of docs, today's batch = 10%. The corpus
    # index is PERSISTED parquet in the operator's contract (built once
    # when the corpus lands, appended per ingest) — so the slope must
    # time an ingest cycle READING the index, not re-deriving 90% of
    # the corpus's signatures from text. The one-time build lands here
    # on the first timed run; min-of-2 in _run_once then reports the
    # steady ingest cost. (A first naive wrapper timed the re-derivation
    # and read 6.5× at x10 — that slope was the index build's, which
    # amortizes to zero across a standing corpus's ingests.)
    d = _docs(spark, sf_dir)
    is_batch = F.col("doc_id") % 10 == 0
    tag = hashlib.md5(sf_dir.encode()).hexdigest()[:10]
    idx_path = f"/tmp/spark_graft_organic/dedup_index_{tag}"
    if not os.path.exists(os.path.join(idx_path, "_SUCCESS")):
        build_corpus_index(d.filter(~is_batch)).write.mode("overwrite").parquet(
            idx_path
        )
    index = spark.read.parquet(idx_path)
    clean, _report = dedup_incremental(d.filter(is_batch), index)
    return clean


#: non-registry variants measured alongside SCALE_QUERIES: the
#: minhash-edge clusters path is the claimed scale route for saturated
#: corpora (VERDICT r4 next-round #5), and the round-5 library
#: operators (mlprep/curation/incremental-dedup) have no registry
#: entry (50-entry budget), so THIS is where their slopes get measured
#: rather than argued
def _exact_substring(spark, sf_dir):
    from sending_weekly_daily_csv_reports_from_hudi_datalake_to_customers_via_email_using_glue_and_sns_or_ses_spark.operators.dedup import (
        exact_substring_pairs,
    )

    return exact_substring_pairs(_docs(spark, sf_dir), k=20)


def _lm_perplexity(spark, sf_dir):
    from sending_weekly_daily_csv_reports_from_hudi_datalake_to_customers_via_email_using_glue_and_sns_or_ses_spark.operators.scoring import (
        lm_score,
        train_unigram_lm,
    )

    # train + score in one timed region: one ingest-and-gate cycle
    d = _docs(spark, sf_dir)
    vocab, stats = train_unigram_lm(d, vocab_size=1 << 14)
    return lm_score(d, vocab, stats["oov_logp"])


def _lm_perplexity_bigram(spark, sf_dir):
    from sending_weekly_daily_csv_reports_from_hudi_datalake_to_customers_via_email_using_glue_and_sns_or_ses_spark.operators.scoring import (
        lm_score_bigram,
        train_bigram_lm,
    )

    d = _docs(spark, sf_dir)
    vocab, bigrams, stats = train_bigram_lm(
        d, vocab_size=1 << 14, bigram_size=1 << 14
    )
    return lm_score_bigram(d, vocab, bigrams, stats)


def _quality_classifier(spark, sf_dir):
    from pyspark.sql import functions as F

    from sending_weekly_daily_csv_reports_from_hudi_datalake_to_customers_via_email_using_glue_and_sns_or_ses_spark.operators.scoring import (
        doc_features,
        score_quality,
        train_quality_classifier,
    )

    # bootstrap labels from a deterministic split (stands in for the
    # curated-vs-crawl label source); train + score timed together
    feats = doc_features(_docs(spark, sf_dir)).withColumn(
        "label", (F.pmod(F.col("doc_id"), F.lit(2))).cast("double")
    )
    model = train_quality_classifier(feats, max_iter=20)
    return score_quality(model, feats)


def _remove_shared_substrings(spark, sf_dir):
    from sending_weekly_daily_csv_reports_from_hudi_datalake_to_customers_via_email_using_glue_and_sns_or_ses_spark.operators.dedup import (
        remove_shared_substrings,
    )

    return remove_shared_substrings(
        _docs(spark, sf_dir).select("doc_id", "text"), k=20
    )


def _shared_substring_runs(spark, sf_dir):
    from sending_weekly_daily_csv_reports_from_hudi_datalake_to_customers_via_email_using_glue_and_sns_or_ses_spark.operators.dedup import (
        shared_substring_runs,
    )

    return shared_substring_runs(_docs(spark, sf_dir), k=20)


def _decontaminate_fuzzy(spark, sf_dir):
    from pyspark.sql import functions as F

    from sending_weekly_daily_csv_reports_from_hudi_datalake_to_customers_via_email_using_glue_and_sns_or_ses_spark.operators.curation import (
        decontaminate_fuzzy,
    )

    d = _docs(spark, sf_dir).select("doc_id", "text")
    is_eval = F.col("doc_id") % 10 == 7
    clean, _report = decontaminate_fuzzy(d.filter(~is_eval), d.filter(is_eval))
    return clean


def _decontaminate_fuzzy_fixedeval(spark, sf_dir):
    """Production-shaped fuzzy-decontamination slope: the eval side is
    pinned to the x1 id range (doc_id % 10 == 7 AND doc_id < 5000 —
    ~500 docs at BOTH scales) while the corpus side grows with the
    data. The plain `decontaminate_fuzzy` slope entry grows the
    pseudo-eval split WITH the corpus (both join sides 10×), which
    overstates the scaling of the real workload — an eval suite is a
    fixed-size artifact, only the corpus being scanned grows."""
    from pyspark.sql import functions as F

    from sending_weekly_daily_csv_reports_from_hudi_datalake_to_customers_via_email_using_glue_and_sns_or_ses_spark.operators.curation import (
        decontaminate_fuzzy,
    )

    d = _docs(spark, sf_dir).select("doc_id", "text")
    is_eval = (F.col("doc_id") % 10 == 7) & (F.col("doc_id") < 5000)
    clean, _report = decontaminate_fuzzy(d.filter(~is_eval), d.filter(is_eval))
    return clean



def _compression_signals(spark, sf_dir):
    from sending_weekly_daily_csv_reports_from_hudi_datalake_to_customers_via_email_using_glue_and_sns_or_ses_spark.operators.textual import (
        compression_signals,
    )

    return compression_signals(_docs(spark, sf_dir))


def _substring_incremental(spark, sf_dir):
    """Standing-corpus substring check: window-index the 90% 'corpus'
    split, then run the incremental detector for the 10% 'batch'
    split. The timed cost is index build (one linear corpus scan) +
    union-cap aggregate + batch-vs-index join — every component
    data-proportional, so the 10× ratio should stay near the batch
    detector's."""
    from pyspark.sql import functions as F

    from sending_weekly_daily_csv_reports_from_hudi_datalake_to_customers_via_email_using_glue_and_sns_or_ses_spark.operators.dedup import (
        build_window_index,
        exact_substring_pairs_incremental,
    )

    d = _docs(spark, sf_dir).select("doc_id", "text")
    corpus = d.filter(F.col("doc_id") % 10 != 3)
    batch = d.filter(F.col("doc_id") % 10 == 3)
    idx = build_window_index(corpus, k=20)
    return exact_substring_pairs_incremental(batch, idx, k=20)


def _quality_threshold_gate(spark, sf_dir):
    """Slope of the 100 TB gate path in its PRODUCTION shape: score
    once into a persisted narrow projection (the gate's documented
    contract — it scans its input twice, sketch pass + filter pass, so
    an expensive score expression must be materialized first, as the
    funnel materializes text_profile). Timed region = the scoring scan
    (cache build) + sketch merge + broadcast filter."""
    from pyspark.sql import functions as F

    from sending_weekly_daily_csv_reports_from_hudi_datalake_to_customers_via_email_using_glue_and_sns_or_ses_spark.operators.curation import (
        quality_threshold_gate,
    )
    from sending_weekly_daily_csv_reports_from_hudi_datalake_to_customers_via_email_using_glue_and_sns_or_ses_spark.operators.textual import (
        quality_score_column,
    )

    d = _docs(spark, sf_dir).select(
        "doc_id", "source", quality_score_column(F.col("text")).alias("quality")
    ).persist()  # bench process; released with the session
    return quality_threshold_gate(d, 0.25)


def _url_dedup(spark, sf_dir):
    """Canonical-URL dedup slope over the fabricated messy URLs: pure
    codegen canonicalization + one shuffle keyed by the canonical URL
    (window keep, the library path — the driver entry's groupBy shape
    shares the same single exchange)."""
    from sending_weekly_daily_csv_reports_from_hudi_datalake_to_customers_via_email_using_glue_and_sns_or_ses_spark.operators.weburl import (
        _fabricated_urls,
        url_dedup,
    )

    return url_dedup(_fabricated_urls(spark, sf_dir))


EXTRA_SCALE = {
    "quality_threshold_gate": _quality_threshold_gate,
    "url_dedup": _url_dedup,
    "dedup_clusters_minhash": _minhash_clusters,
    "pack_sequences": _pack_sequences,
    "embedding_pca": _embedding_pca,
    "repetition_signals": _repetition_signals,
    "mixture_sample": _mixture_sample,
    "dedup_incremental": _dedup_incremental,
    "lm_perplexity": _lm_perplexity,
    "lm_perplexity_bigram": _lm_perplexity_bigram,
    "quality_classifier": _quality_classifier,
    "exact_substring_pairs": _exact_substring,
    "substring_incremental": _substring_incremental,
    "remove_shared_substrings": _remove_shared_substrings,
    "shared_substring_runs": _shared_substring_runs,
    "decontaminate_fuzzy": _decontaminate_fuzzy,
    "decontaminate_fuzzy_fixedeval": _decontaminate_fuzzy_fixedeval,
    "compression_signals": _compression_signals,
}


def _run_once(spark, sf_dir: str, name: str) -> float:
    from sending_weekly_daily_csv_reports_from_hudi_datalake_to_customers_via_email_using_glue_and_sns_or_ses_spark.operators import (
        clear_intermediate_caches,
    )

    # slope measurements time FIRST evaluations — a warm intermediate
    # cache would masquerade as a flat scaling curve
    clear_intermediate_caches()
    # EXTRA_SCALE first: where a name exists in both (lm_perplexity,
    # exact_substring_pairs since their r6 registry promotion), the
    # EXTRA variant is the production-sized shape whose slope matters
    # (e.g. 2^14 vocab vs the oracle entry's OOV-exercising 50)
    fn = EXTRA_SCALE.get(name) or QUERIES.get(name) or RETIRED_QUERIES[name]
    t0 = time.time()
    fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
    return time.time() - t0


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    only = set(sys.argv[2:])
    known = set(SCALE_QUERIES) | set(EXTRA_SCALE)
    unknown = only - known
    if unknown:
        # fail BEFORE the multi-minute corpus build: a typo'd name would
        # otherwise produce an empty result with no complaint
        raise SystemExit(
            f"unknown query name(s) {sorted(unknown)}; "
            f"choose from {sorted(known)}"
        )
    spark = get_spark(app_name="organic-bench")
    organic_dir = build_organic(spark, n)

    _run_once(spark, BASE_SF, "q1_pricing_summary")  # warmup
    result: dict[str, dict[str, float]] = {}
    for name in list(SCALE_QUERIES) + list(EXTRA_SCALE):
        if only and name not in only:
            continue
        t1 = min(_run_once(spark, BASE_SF, name) for _ in range(2))
        tn = min(_run_once(spark, organic_dir, name) for _ in range(2))
        result[name] = {
            "x1_sec": round(t1, 3),
            f"x{n}_sec": round(tn, 3),
            "ratio": round(tn / t1, 2),
        }
    print(json.dumps({"scale": n, "mode": "organic", "base": BASE_SF, "queries": result}))


if __name__ == "__main__":
    main()
