"""Aggregation operators (SURVEY.md §2.7 X1/X2/X6).

The reference's transform slot accepts arbitrary Spark SQL
(template.py:319-322), so group-by aggregation is part of its declared
capability; these give it first-class named coverage.

Scale notes: every groupBy here is a partial-aggregate (map-side
combine) + final aggregate — Spark does that automatically for all
built-in aggregates, so the shuffle carries pre-aggregated rows keyed by
the (low-cardinality) group keys, not raw data. That is the right shape
at 100 TB. Money sums go through decimal(18,2) so the DuckDB oracle is
bit-identical (double only at the very end).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from . import query


def _dec(col: str) -> F.Column:
    return F.col(col).cast("decimal(18,2)")


@query(
    "q1_pricing_summary",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
           CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
           CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS sum_disc_price,
           CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2))) * (1 + CAST(l_tax AS DECIMAL(18,2)))) AS DOUBLE) AS sum_charge,
           CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / count(*) AS avg_qty,
           CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / count(*) AS avg_price,
           CAST(sum(CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) / count(*) AS avg_disc,
           count(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 shape: the canonical scan→filter→groupBy→8 aggregates.
    Whole plan stays in WholeStageCodegen; shipdate filter pushes to
    parquet. Averages are computed as exact-decimal sum ÷ count so both
    engines produce the identical double.
    """
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp")
    )
    disc_price = _dec("l_extendedprice") * (1 - _dec("l_discount"))
    charge = disc_price * (1 + _dec("l_tax"))
    return li.groupBy("l_returnflag", "l_linestatus").agg(
        F.sum(_dec("l_quantity")).cast("double").alias("sum_qty"),
        F.sum(_dec("l_extendedprice")).cast("double").alias("sum_base_price"),
        F.sum(disc_price).cast("double").alias("sum_disc_price"),
        F.sum(charge).cast("double").alias("sum_charge"),
        (F.sum(_dec("l_quantity")).cast("double") / F.count("*")).alias("avg_qty"),
        (F.sum(_dec("l_extendedprice")).cast("double") / F.count("*")).alias(
            "avg_price"
        ),
        (F.sum(_dec("l_discount")).cast("double") / F.count("*")).alias("avg_disc"),
        F.count("*").alias("count_order"),
    )


@query(
    "agg_stats",
    oracle="""
    SELECT c_mktsegment,
           count(*) AS n_customers,
           count(DISTINCT c_nationkey) AS n_nations,
           CAST(min(c_acctbal) AS DOUBLE) AS min_bal,
           CAST(max(c_acctbal) AS DOUBLE) AS max_bal,
           CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS sum_bal
    FROM customer
    GROUP BY c_mktsegment
    """,
)
def agg_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X1: min/max/sum/count/count-distinct in one pass. min/max of raw
    doubles are order-independent picks of stored values → exact parity.
    """
    c = load_table(spark, sf_dir, "customer")
    return c.groupBy("c_mktsegment").agg(
        F.count("*").alias("n_customers"),
        F.countDistinct("c_nationkey").alias("n_nations"),
        F.min("c_acctbal").alias("min_bal"),
        F.max("c_acctbal").alias("max_bal"),
        F.sum(_dec("c_acctbal")).cast("double").alias("sum_bal"),
    )


@query(
    "rollup_revenue",
    oracle="""
    SELECT o_orderstatus, o_orderpriority,
           CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue,
           count(*) AS n_orders
    FROM orders
    GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
    """,
)
def rollup_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X2: ROLLUP — subtotals per status, per (status, priority), grand
    total. Spark expands grouping sets in a single Expand+Aggregate; no
    extra scans.
    """
    o = load_table(spark, sf_dir, "orders")
    return o.rollup("o_orderstatus", "o_orderpriority").agg(
        F.sum(_dec("o_totalprice")).cast("double").alias("revenue"),
        F.count("*").alias("n_orders"),
    )


@query(
    "cube_counts",
    oracle="""
    SELECT l_returnflag, l_linestatus, count(*) AS n
    FROM lineitem
    GROUP BY CUBE (l_returnflag, l_linestatus)
    """,
)
def cube_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X2: CUBE over two low-cardinality dims."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.cube("l_returnflag", "l_linestatus").agg(F.count("*").alias("n"))


@query(
    "having_filter",
    oracle="""
    SELECT o_custkey, count(*) AS n_orders,
           CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS spend
    FROM orders
    GROUP BY o_custkey
    HAVING count(*) >= 10
    """,
)
def having_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X1 + HAVING: post-aggregation predicate."""
    o = load_table(spark, sf_dir, "orders")
    return (
        o.groupBy("o_custkey")
        .agg(
            F.count("*").alias("n_orders"),
            F.sum(_dec("o_totalprice")).cast("double").alias("spend"),
        )
        .filter(F.col("n_orders") >= 10)
    )


@query("approx_aggregates")
def approx_aggregates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X6: sketch-based aggregates — approx_count_distinct (HLL++) and
    percentile_approx (KLL-style). Sketch internals differ across
    engines, so no value oracle (rows-only check); the pytest suite
    asserts bounded relative error against exact values instead.

    At 100 TB these are the *only* sane distinct-count/quantile plans:
    constant memory per group, one pass, mergeable partials.
    """
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.approx_count_distinct("l_orderkey").alias("approx_orders"),
        F.percentile_approx("l_extendedprice", 0.5, 10000).alias("p50_price"),
        F.percentile_approx("l_extendedprice", 0.95, 10000).alias("p95_price"),
    )


@query(
    "pivot_status",
    oracle="""
    SELECT l_returnflag,
           CAST(sum(CASE WHEN l_linestatus = 'O' THEN CAST(l_quantity AS DECIMAL(18,2)) END) AS DOUBLE) AS qty_O,
           CAST(sum(CASE WHEN l_linestatus = 'F' THEN CAST(l_quantity AS DECIMAL(18,2)) END) AS DOUBLE) AS qty_F
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def pivot_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot with an explicit value list (no discovery scan — at scale,
    always pass the values so Spark skips the extra distinct job).
    """
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .pivot("l_linestatus", ["O", "F"])
        .agg(F.sum(_dec("l_quantity")).cast("double"))
        .withColumnRenamed("O", "qty_O")
        .withColumnRenamed("F", "qty_F")
    )


_GROUPING_SETS_SQL = """
SELECT o_orderstatus, o_orderpriority,
       CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue,
       count(*) AS n_orders
FROM orders
GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
"""


@query("grouping_sets_revenue", oracle=_GROUPING_SETS_SQL)
def grouping_sets_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X2: explicit GROUPING SETS (per-status, per-priority, grand total
    — a shape rollup/cube can't express). Spark SQL string path: the
    reference's transform slot accepts exactly this."""
    from ..catalog import Catalog

    Catalog(spark).register_testdata(sf_dir)
    return spark.sql(_GROUPING_SETS_SQL)


@query(
    "salted_heavy_hitter_agg",
    oracle="""
    SELECT l_returnflag,
           CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS total_qty,
           count(*) AS n
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def salted_heavy_hitter_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew-resistant aggregation by salting: l_returnflag has only 3
    values (extreme key skew — at 100 TB each key is one giant reducer).
    Phase 1 aggregates (key, salt) over 16 salts, spreading each hot key
    across 16 tasks; phase 2 merges the 48 partials. Result is provably
    identical to the plain GROUP BY — which is exactly what the oracle
    checks. (Spark's partial aggregation often hides this problem for
    algebraic aggs; salting is the general fix, e.g. for
    collect_list/distinct-style states.)"""
    li = load_table(spark, sf_dir, "lineitem")
    salted = li.withColumn("__salt", F.pmod(F.xxhash64("l_orderkey"), 16))
    phase1 = salted.groupBy("l_returnflag", "__salt").agg(
        F.sum(_dec("l_quantity")).alias("qty_part"),
        F.count("*").alias("n_part"),
    )
    return phase1.groupBy("l_returnflag").agg(
        F.sum("qty_part").cast("double").alias("total_qty"),
        F.sum("n_part").alias("n"),
    )


@query(
    "stratified_sample",
    oracle="""
    SELECT lang, count(*) AS n_sampled, min(doc_id) AS min_id
    FROM documents
    WHERE CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT) % 10 = 0
    GROUP BY lang
    """,
)
def stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic 10% sample summarized per stratum (lang): the
    hash-gate form of sampling — reproducible across runs, engines and
    partitionings, unlike rand()-seeded sample(). The per-row gate is a
    pushable predicate (scan-side, no shuffle to sample)."""
    d = load_table(spark, sf_dir, "documents")
    gate = (
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8), 16, 10)
        .cast("bigint") % 10 == 0
    )
    return (
        d.filter(gate)
        .groupBy("lang")
        .agg(F.count("*").alias("n_sampled"), F.min("doc_id").alias("min_id"))
    )


@query(
    "profile_columns",
    oracle="""
    SELECT count(*) AS n_rows,
           count(c_name) AS name_nonnull,
           count(DISTINCT c_nationkey) AS nation_distinct,
           count(DISTINCT c_mktsegment) AS segment_distinct,
           CAST(min(c_acctbal) AS DOUBLE) AS bal_min,
           CAST(max(c_acctbal) AS DOUBLE) AS bal_max,
           CAST(sum(CASE WHEN c_acctbal < 0 THEN 1 ELSE 0 END) AS BIGINT) AS bal_negative
    FROM customer
    """,
)
def profile_columns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-pass data-profiling aggregate (null counts, cardinalities,
    ranges, rule violations) — the data-quality gate a pipeline runs
    before training ingestion. All in a single scan + aggregate."""
    c = load_table(spark, sf_dir, "customer")
    return c.agg(
        F.count("*").alias("n_rows"),
        F.count("c_name").alias("name_nonnull"),
        F.countDistinct("c_nationkey").alias("nation_distinct"),
        F.countDistinct("c_mktsegment").alias("segment_distinct"),
        F.min("c_acctbal").alias("bal_min"),
        F.max("c_acctbal").alias("bal_max"),
        F.sum(F.when(F.col("c_acctbal") < 0, 1).otherwise(0))
        .cast("bigint")
        .alias("bal_negative"),
    )


@query(
    "daily_value_outliers",
    oracle="""
    WITH stats AS (
      SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
             CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS s,
             CAST(sum(CAST(value AS DECIMAL(18,6)) * CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS ss,
             count(*) AS n
      FROM events GROUP BY day
    ), scored AS (
      SELECT e.event_id, CAST(date_trunc('day', e.ts) AS TIMESTAMP) AS day, e.value,
             (e.value - st.s / st.n)
               / sqrt((st.ss - st.s * st.s / st.n) / (st.n - 1)) AS z
      FROM events e JOIN stats st ON CAST(date_trunc('day', e.ts) AS TIMESTAMP) = st.day
      WHERE st.n > 1
    )
    SELECT event_id, day, CAST(value AS DOUBLE) AS value,
           CAST(round(z, 3) AS DOUBLE) AS z_score
    FROM scored WHERE abs(z) > 3.0
    """,
)
def daily_value_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-day z-score outliers over event values — the drift/anomaly
    gate. Mean/std are derived from EXACT decimal sums (sum, sum-of-
    squares), so both engines compute identical doubles and the z-score
    comparison is reproducible (stddev_samp's float accumulation order
    would not be). Broadcast join of per-day stats back onto events."""
    e = load_table(spark, sf_dir, "events").withColumn(
        "day", F.date_trunc("day", "ts")
    )
    dec = F.col("value").cast("decimal(18,6)")
    stats = e.groupBy("day").agg(
        F.sum(dec).cast("double").alias("s"),
        F.sum(dec * dec).cast("double").alias("ss"),
        F.count("*").alias("n"),
    ).filter(F.col("n") > 1)
    mean = F.col("s") / F.col("n")
    std = F.sqrt((F.col("ss") - F.col("s") * F.col("s") / F.col("n")) / (F.col("n") - 1))
    z = (F.col("value") - mean) / std
    return (
        e.join(F.broadcast(stats), "day")
        .withColumn("z", z)
        .filter(F.abs(F.col("z")) > 3.0)
        .select(
            "event_id",
            "day",
            "value",
            F.round("z", 3).cast("double").alias("z_score"),
        )
    )
