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
