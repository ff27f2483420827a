"""Set operations (SURVEY.md §2.7 X5): union all / union distinct /
intersect / except, exercised in one tagged query.

All four are key-hashed shuffles in Spark (UNION ALL is shuffle-free
concatenation); at scale INTERSECT/EXCEPT plan as aggregations or
left-semi/anti joins — Catalyst rewrites them, nothing custom needed.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from . import query


@query(
    "set_operations",
    retired=True,  # r7: slot funded filegroup_snapshot; every set-op
    # primitive (UNION ALL/DISTINCT, INTERSECT→semi, EXCEPT→anti) is
    # load-bearing inside other driver-oracled entries (dedup unions,
    # decontaminate anti-joins, join_semi_anti); value-checked by
    # tests/test_retired_parity.py
    oracle="""
    SELECT 'union_all' AS op, nationkey FROM (
      SELECT c_nationkey AS nationkey FROM customer
      UNION ALL
      SELECT s_nationkey AS nationkey FROM supplier)
    UNION ALL
    SELECT 'union_distinct' AS op, nationkey FROM (
      SELECT c_nationkey AS nationkey FROM customer
      UNION
      SELECT s_nationkey AS nationkey FROM supplier)
    UNION ALL
    SELECT 'intersect' AS op, nationkey FROM (
      SELECT c_nationkey AS nationkey FROM customer
      INTERSECT
      SELECT s_nationkey AS nationkey FROM supplier)
    UNION ALL
    SELECT 'except' AS op, nationkey FROM (
      SELECT c_nationkey AS nationkey FROM customer
      EXCEPT
      SELECT s_nationkey AS nationkey FROM supplier)
    """,
)
def set_operations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X5 in one pass, each arm tagged: UNION ALL (partition concat, no
    shuffle), UNION DISTINCT (hash dedup), INTERSECT (nations with both
    customers and suppliers), EXCEPT (customer-only nations)."""
    c = load_table(spark, sf_dir, "customer").select(
        F.col("c_nationkey").alias("nationkey")
    )
    s = load_table(spark, sf_dir, "supplier").select(
        F.col("s_nationkey").alias("nationkey")
    )

    def tag(df: DataFrame, op: str) -> DataFrame:
        return df.select(F.lit(op).alias("op"), "nationkey")

    return (
        tag(c.unionAll(s), "union_all")
        .unionByName(tag(c.union(s).distinct(), "union_distinct"))
        .unionByName(tag(c.intersect(s), "intersect"))
        .unionByName(tag(c.subtract(s), "except"))
    )
