"""Window-function operators (SURVEY.md §2.7 X3).

Needed both as user-facing ops and as the engine's upsert/precombine
primitive (latest-row-per-key, sinks/upsert.py). A window is one shuffle
on partitionBy keys + per-partition sort; at 100 TB the key choice is
what matters (customer/order keys → high cardinality → even spread).

Two consolidated entries cover the X3 surface (ranking functions +
top-k; frames, offsets and value functions); the latest-per-key
precombine primitive is driver-checked as ``dedup_latest_per_key``
(operators/dedup.py) and exercised by every upsert test.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load_table
from . import query


@query(
    "window_ranking_topk",
    oracle="""
    SELECT * FROM (
      SELECT o_custkey, o_orderkey, o_totalprice, o_orderdate,
             row_number() OVER (PARTITION BY o_custkey
                                ORDER BY o_totalprice DESC, o_orderkey ASC) AS rn,
             rank()       OVER wv AS price_rank,
             dense_rank() OVER wv AS price_dense_rank,
             CAST(round(percent_rank() OVER wv, 6) AS DOUBLE) AS price_pct_rank
      FROM orders
      WINDOW wv AS (PARTITION BY o_custkey ORDER BY o_totalprice DESC))
    WHERE rn <= 3
    """,
)
def window_ranking_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ranking-function family + top-k-per-group in one pass: row_number
    with a deterministic tie-break (orderkey) drives the top-3 filter;
    rank / dense_rank / percent_rank rank by value only (tie-stable by
    definition). The canonical top-k-per-group: one shuffle, no
    self-join."""
    o = load_table(spark, sf_dir, "orders")
    w_rn = Window.partitionBy("o_custkey").orderBy(
        F.desc("o_totalprice"), F.asc("o_orderkey")
    )
    w_val = Window.partitionBy("o_custkey").orderBy(F.desc("o_totalprice"))
    return (
        o.select(
            "o_custkey",
            "o_orderkey",
            "o_totalprice",
            "o_orderdate",
            F.row_number().over(w_rn).alias("rn"),
            F.rank().over(w_val).alias("price_rank"),
            F.dense_rank().over(w_val).alias("price_dense_rank"),
            F.round(F.percent_rank().over(w_val), 6)
            .cast("double")
            .alias("price_pct_rank"),
        )
        .filter(F.col("rn") <= 3)
    )


@query(
    "window_frames",
    retired=True,  # r7: slot funded colstats_skipping; the frame/offset/
    # ntile/range-frame primitives stay value-checked by
    # test_retired_parity, and X3 keeps a live driver row via
    # window_ranking_topk
    oracle="""
    SELECT o_custkey, o_orderkey, o_orderdate, o_totalprice,
           CAST(sum(CAST(o_totalprice AS DECIMAL(18,2)))
                OVER (wt ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
             AS running_spend,
           lag(o_orderdate)  OVER wt AS prev_order,
           lead(o_orderdate) OVER wt AS next_order,
           CAST(date_diff('day', lag(o_orderdate) OVER wt, o_orderdate) AS BIGINT)
             AS days_since_prev,
           first_value(o_totalprice) OVER wt AS first_price,
           last_value(o_totalprice) OVER
             (wt ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS last_price,
           ntile(4) OVER wt AS quartile,
           count(*) OVER (PARTITION BY o_custkey ORDER BY o_totalprice
                          RANGE BETWEEN 1000.0 PRECEDING AND 1000.0 FOLLOWING)
             AS n_within_1k
    FROM orders
    WINDOW wt AS (PARTITION BY o_custkey ORDER BY o_orderdate ASC, o_orderkey ASC)
    """,
)
def window_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame / offset / value window functions over the per-customer
    order timeline: running decimal sum (explicit ROWS frame), lag/lead
    + day gaps, first_value / last_value (full frame — the default
    growing frame makes last_value a footgun), ntile quartiles, and a
    value-based RANGE frame (orders within ±1000 of each price).

    Every window is partitioned by o_custkey — high-cardinality key, so
    the single shuffle spreads evenly at any scale (no global windows).
    """
    o = load_table(spark, sf_dir, "orders")
    wt = Window.partitionBy("o_custkey").orderBy(
        F.asc("o_orderdate"), F.asc("o_orderkey")
    )
    wt_run = wt.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    wt_full = wt.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    prev = F.lag("o_orderdate").over(wt)
    return o.select(
        "o_custkey",
        "o_orderkey",
        "o_orderdate",
        "o_totalprice",
        F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
        .over(wt_run)
        .cast("double")
        .alias("running_spend"),
        prev.alias("prev_order"),
        F.lead("o_orderdate").over(wt).alias("next_order"),
        F.datediff(F.col("o_orderdate"), prev).cast("bigint").alias("days_since_prev"),
        F.first("o_totalprice").over(wt).alias("first_price"),
        F.last("o_totalprice").over(wt_full).alias("last_price"),
        F.ntile(4).over(wt).alias("quartile"),
        # fractional RANGE bounds need the SQL form — the pyspark
        # Window.rangeBetween API accepts integral offsets only
        F.expr(
            "count(*) OVER (PARTITION BY o_custkey ORDER BY o_totalprice"
            " RANGE BETWEEN 1000.0 PRECEDING AND 1000.0 FOLLOWING)"
        ).alias("n_within_1k"),
    )
