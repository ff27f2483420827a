"""URL-level corpus curation: canonical-URL dedup, domain blocklist /
allowlist filtering, per-domain profiling.

Web-scale training corpora are curated by URL before any text is read —
C4 and RefinedWeb dedup on a normalized URL and apply domain blocklists
as the first funnel stage, because a URL-keyed pass touches only a few
hundred bytes per document. Reference parity: the reference repo
(template.py) has no web curation — this module is part of the
LLM-pipeline extension mandate, same family as operators/curation.py.

Scale design:
  * canonicalization (functions/web.py) is a pure codegen expression —
    the sweep is one embarrassingly-parallel scan;
  * ``url_dedup`` shuffles ONCE on the canonical URL (high-cardinality,
    near-uniform key: per-key fan-in is the duplication degree of one
    page, not a skew axis);
  * ``domain_filter`` against a list broadcasts it (blocklists are
    10³-10⁶ domains ≪ corpus) and stays map-side;
  * ``domain_profile`` is one partial-aggregated groupBy on the
    registered domain (domains are Zipfian, but the aggregate is
    algebraic — map-side combine absorbs the head).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load_table
from ..functions.web import (
    canonicalize_url,
    canonicalize_url_sql_steps,
    registered_domain,
    url_host,
)
from . import query


def url_dedup(
    docs: DataFrame,
    url_col: str = "url",
    id_col: str = "doc_id",
    quality_col: str | None = None,
) -> DataFrame:
    """Keep ONE document per canonical URL: the highest ``quality_col``
    (NULLs last) when given, ties and the no-quality case broken by
    ``id_col`` ascending — the cut is deterministic and stable across
    runs. Adds ``canon_url`` and ``n_url_dups`` (how many raw rows
    collapsed into the kept one) to the surviving rows.

    Rows with a NULL or empty URL have no page identity: they BYPASS
    the dedup untouched (``n_url_dups`` = 1) — grouping them would
    silently collapse every URL-less document into one survivor, and
    it would also make the no-identity key the one hot partition. Same
    no-attribution contract as ``domain_filter``/``cap_per_domain``.

    One shuffle, keyed by the canonical URL. The window partitions are
    per-page duplication degrees — bounded small numbers, never a skew
    axis (contrast content-hash dedup where an empty-text key can be
    hot; a URL IS the identity being deduped)."""
    canon = docs.withColumn("canon_url", canonicalize_url(url_col))
    no_page = F.col("canon_url").isNull() | (F.col("canon_url") == "")
    order = [F.col(id_col).asc()]
    if quality_col is not None:
        order = [F.col(quality_col).desc_nulls_last(), F.col(id_col).asc()]
    w = Window.partitionBy("canon_url").orderBy(*order)
    deduped = (
        canon.filter(~no_page)
        .withColumn("_rn", F.row_number().over(w))
        .withColumn("n_url_dups", F.count("*").over(Window.partitionBy("canon_url")))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )
    bypass = canon.filter(no_page).withColumn(
        "n_url_dups", F.lit(1).cast("bigint")
    )
    return deduped.unionByName(bypass)


def domain_filter(
    docs: DataFrame,
    domains: list[str] | DataFrame,
    url_col: str = "url",
    mode: str = "block",
) -> DataFrame:
    """Filter documents by the registered domain (eTLD+1) of their URL.
    ``mode='block'`` drops listed domains, ``mode='allow'`` keeps only
    listed domains. Subdomains match their registered domain
    (``ads.foo.example.com`` is governed by a listed ``example.com``) —
    the standard blocklist contract.

    A Python-list ``domains`` becomes an ``isin`` literal set (fine to
    ~10⁴ entries); a single-column DataFrame becomes a BROADCAST
    left-semi/anti join — the list side of a real blocklist is at most
    millions of short strings, always ≪ the corpus. Rows whose URL has
    no extractable host (relative references, NULL) have no domain to
    match: they are KEPT under 'block' (nothing matched the blocklist)
    and DROPPED under 'allow'."""
    if mode not in ("block", "allow"):
        raise ValueError(f"mode must be 'block' or 'allow', got {mode!r}")
    dom = registered_domain(url_host(url_col))
    tagged = docs.withColumn("_dom", dom)
    if isinstance(domains, DataFrame):
        cols = domains.columns
        if len(cols) != 1:
            raise ValueError(
                f"domains frame must have exactly one column, got {cols}"
            )
        listed = F.broadcast(domains.select(F.col(cols[0]).alias("_dom")).distinct())
        how = "left_semi" if mode == "allow" else "left_anti"
        return tagged.join(listed, on="_dom", how=how).drop("_dom")
    hit = F.col("_dom").isin(*domains)
    keep = hit if mode == "allow" else F.col("_dom").isNull() | ~hit
    return tagged.filter(keep).drop("_dom")


def domain_profile(
    docs: DataFrame, url_col: str = "url", quality_col: str | None = None
) -> DataFrame:
    """Per-registered-domain corpus profile: document count, distinct
    canonical URLs, and (when given) mean quality — the table a curation
    policy (blocklists, per-domain caps, mixture weights) is written
    against. Algebraic aggregates only: map-side combine flattens the
    Zipfian domain head before the single shuffle."""
    canon = docs.withColumn("canon_url", canonicalize_url(url_col)).withColumn(
        "domain", registered_domain(url_host(url_col))
    )
    aggs = [
        F.count("*").alias("n_docs"),
        F.countDistinct("canon_url").alias("n_urls"),
    ]
    if quality_col is not None:
        aggs.append(F.avg(quality_col).alias("avg_quality"))
    return canon.groupBy("domain").agg(*aggs)


def cap_per_domain(
    docs: DataFrame,
    max_docs: int,
    url_col: str = "url",
    id_col: str = "doc_id",
    quality_col: str | None = None,
    prefilter: bool = True,
) -> DataFrame:
    """Keep at most ``max_docs`` documents per registered domain — the
    standard anti-SEO-farm / boilerplate-site cap (RefinedWeb caps
    documents per domain for exactly this reason): a single template
    site must not dominate the corpus no matter how many URLs it
    crawled. Keeps the best ``quality_col`` (NULLs last) then lowest
    ``id_col`` — the same deterministic order as :func:`url_dedup`.
    Rows with no extractable domain (relative/NULL URLs) are never
    capped (each is its own unattributable 'domain').

    Scale: Catalyst rewrites the rank-filter into WindowGroupLimit
    (plan-pinned) — each MAP partition forwards at most ``max_docs``
    rows per domain into the shuffle, so a billion-doc domain shuffles
    ≤ max_docs × #map-partitions rows, not a billion. On top of that,
    ``prefilter=True`` (default) routes UNDER-cap domains — the
    Zipfian long tail, usually >90% of domains — around the window
    shuffle entirely via a tiny per-domain count broadcast: they union
    straight through. Cost of the option: one extra (cheap, counted)
    pass over the input for the counts; set ``prefilter=False`` when
    the input is a one-shot stream that must be scanned once."""
    if max_docs < 1:
        raise ValueError(f"max_docs must be >= 1, got {max_docs}")
    dom = registered_domain(url_host(url_col))
    tagged = docs.withColumn("_dom", dom)
    order = [F.col(id_col).asc()]
    if quality_col is not None:
        order = [F.col(quality_col).desc_nulls_last(), F.col(id_col).asc()]
    w = Window.partitionBy("_dom").orderBy(*order)
    ranked = lambda df: (  # noqa: E731 — tiny plan builder used twice
        df.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= max_docs)
        .drop("_rn")
    )
    if not prefilter:
        return ranked(tagged.filter(F.col("_dom").isNotNull())).unionByName(
            tagged.filter(F.col("_dom").isNull())
        ).drop("_dom")
    counts = tagged.groupBy("_dom").agg(F.count("*").alias("_n_dom"))
    over = F.broadcast(
        counts.filter(F.col("_n_dom") > max_docs).select("_dom")
    )
    head = tagged.join(over, on="_dom", how="left_semi")
    tail = tagged.join(over, on="_dom", how="left_anti")  # incl. NULL domains
    return ranked(head).unionByName(tail).drop("_dom")


# --------------------------------------------------------------------
# driver entry — deterministic URL fabrication (the documents table has
# no URL column; the fabrication IS part of the checked contract, same
# twin-fabrication pattern as media_decode_pipeline / the augmented
# embeddings)
# --------------------------------------------------------------------


def _fabricated_urls(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic messy URLs from (doc_id, source): several doc_ids
    share one canonical page (doc_id % 40 path, % 7 query page) while
    the raw strings differ in every canonicalization axis — www,
    default port, trailing slash, utm tracker, fragment."""
    d = load_table(spark, sf_dir, "documents")
    m = F.col("doc_id")
    return d.select(
        "doc_id",
        "source",
        F.concat(
            F.lit("https://"),
            F.when(m % 2 == 0, F.lit("www.")).otherwise(F.lit("")),
            F.col("source"),
            F.lit(".example.com"),
            F.when(m % 5 == 0, F.lit(":443")).otherwise(F.lit("")),
            F.lit("/docs/"),
            (m % 40).cast("string"),
            F.when(m % 3 == 0, F.lit("/")).otherwise(F.lit("")),
            F.when(m % 4 == 0, F.lit("?utm_source=feed&page=")).otherwise(
                F.lit("?page=")
            ),
            (m % 7).cast("string"),
            F.when(m % 6 == 0, F.concat(F.lit("#sec"), (m % 3).cast("string"))).otherwise(
                F.lit("")
            ),
        ).alias("url"),
    )


_FABRICATE_SQL = """
      SELECT doc_id, source,
             'https://'
             || CASE WHEN doc_id % 2 = 0 THEN 'www.' ELSE '' END
             || source || '.example.com'
             || CASE WHEN doc_id % 5 = 0 THEN ':443' ELSE '' END
             || '/docs/' || CAST(doc_id % 40 AS VARCHAR)
             || CASE WHEN doc_id % 3 = 0 THEN '/' ELSE '' END
             || CASE WHEN doc_id % 4 = 0 THEN '?utm_source=feed&page='
                     ELSE '?page=' END
             || CAST(doc_id % 7 AS VARCHAR)
             || CASE WHEN doc_id % 6 = 0 THEN '#sec' || CAST(doc_id % 3 AS VARCHAR)
                     ELSE '' END AS url
      FROM documents
"""


def _url_dedup_oracle() -> str:
    """DuckDB twin: identical fabrication, the shared canonicalization
    step list (functions/web.canonicalize_url_sql_steps — one
    definition of truth with the Spark expression, cross-checked
    case-by-case in tests/test_web.py), then min-doc-id-per-canonical
    with collapse counts."""
    return f"""
    WITH raw AS ({_FABRICATE_SQL}),
    canon AS (
      SELECT doc_id, {canonicalize_url_sql_steps("url")}
      FROM raw)
    SELECT canon_url,
           count(*) AS n_docs,
           min(doc_id) AS keep_doc_id
    FROM canon
    GROUP BY canon_url
    """


@query("url_canonical_dedup", oracle=_url_dedup_oracle())
def url_canonical_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver entry: canonical-URL dedup over deterministically
    fabricated messy URLs — per canonical page, how many raw URL
    variants collapsed and which doc survives (min doc_id, the
    no-quality tie-break of :func:`url_dedup`). Exercises every
    canonicalization axis (case, www, default port, duplicate/trailing
    slash, tracker params, fragments) against the DuckDB twin."""
    raw = _fabricated_urls(spark, sf_dir)
    return (
        raw.withColumn("canon_url", canonicalize_url("url"))
        .groupBy("canon_url")
        .agg(
            F.count("*").alias("n_docs"),
            F.min("doc_id").alias("keep_doc_id"),
        )
    )
