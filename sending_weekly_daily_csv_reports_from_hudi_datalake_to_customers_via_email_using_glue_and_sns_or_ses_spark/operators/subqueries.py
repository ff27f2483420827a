"""Subquery operators: scalar, IN / NOT IN, correlated EXISTS, CTEs —
part of the arbitrary-Spark-SQL capability the reference's transform
slot exposes (template.py:319-322). Catalyst rewrites all of these into
joins/aggregates; the tests here pin that the rewrites stay sane.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..catalog import Catalog
from . import query


def _sql(spark: SparkSession, sf_dir: str, statement: str) -> DataFrame:
    Catalog(spark).register_testdata(sf_dir)
    return spark.sql(statement)


_EXISTS_SCALAR = """
SELECT o_orderpriority,
       count(*) AS order_count,
       CAST(round(
         CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) / count(*)
         - (SELECT CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
                   / count(*)
            FROM orders),
         2) AS DOUBLE) AS prio_minus_global_avg
FROM orders o
WHERE EXISTS (
  SELECT 1 FROM lineitem l
  WHERE l.l_orderkey = o.o_orderkey AND l.l_quantity > 45
)
GROUP BY o_orderpriority
"""


@query("subquery_exists_scalar", oracle=_EXISTS_SCALAR)
def subquery_exists_scalar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape + scalar subquery in one statement: correlated
    EXISTS → semi join on the correlation key with the inner predicate
    pushed to the lineitem scan; the global-average scalar subquery is
    evaluated once and broadcast into the projection.

    The averages go through the repo's parity convention — exact
    DECIMAL sum, cast to DOUBLE, divided by count — so the value is
    independent of partial-aggregation order (a raw avg(double) would
    be partitioning-dependent and could flip the 2-decimal rounding at
    a x.xx5 boundary under the driver's session settings).
    """
    return _sql(spark, sf_dir, _EXISTS_SCALAR)


_IN_NOT_IN = """
SELECT 'in_urgent_region0' AS op, c_custkey AS key, c_name AS name
FROM customer
WHERE c_custkey IN (SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT')
  AND c_nationkey IN (SELECT n_nationkey FROM nation WHERE n_regionkey = 0)
UNION ALL
SELECT 'not_in_supplier_nation' AS op, n_nationkey AS key, n_name AS name
FROM nation
WHERE n_nationkey NOT IN (SELECT s_nationkey FROM supplier)
"""


@query(
    "subquery_in_not_in",
    retired=True,  # r7: slot funded substring_incremental; the semi/
    # anti-join rewrites stay driver-green via subquery_exists_scalar
    # and join_semi_anti, this entry via test_retired_parity
    oracle=_IN_NOT_IN,
)
def subquery_in_not_in(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IN-subqueries (→ left-semi joins, one per subquery) and null-aware
    NOT IN (→ null-aware anti join) as one tagged union. Both engines
    agree on the NOT IN arm because s_nationkey is non-null; the operator
    exists for the capability surface."""
    return _sql(spark, sf_dir, _IN_NOT_IN)


_CTE_QUERY = """
WITH cust_spend AS (
  SELECT o_custkey, CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS spend,
         count(*) AS n_orders
  FROM orders GROUP BY o_custkey
  HAVING count(*) >= 5
), ranked AS (
  SELECT o_custkey, spend, n_orders,
         row_number() OVER (ORDER BY spend DESC, o_custkey ASC) AS rnk
  FROM cust_spend
)
SELECT r.rnk, r.o_custkey, r.spend, r.n_orders, c.c_name, c.c_mktsegment
FROM ranked r JOIN customer c ON r.o_custkey = c.c_custkey
WHERE r.rnk <= 25
"""


@query(
    "cte_top_spenders",
    retired=True,  # r7: slot funded quality_quantile_gate; the CTE/
    # HAVING/global-rank/dim-join primitives stay driver-green via
    # window_ranking_topk, join_multiway_revenue and
    # subquery_exists_scalar, this entry via test_retired_parity
    oracle=_CTE_QUERY,
)
def cte_top_spenders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chained CTEs + HAVING + global ranking + dimension join: top-25
    repeat customers (≥5 orders — the post-aggregation HAVING predicate)
    by lifetime spend. The global row_number is a single-partition sort
    of the *aggregated* (one row per customer) set — acceptable because
    aggregation shrank the data first; the plan test asserts the
    aggregate happens before the sort."""
    return _sql(spark, sf_dir, _CTE_QUERY)
