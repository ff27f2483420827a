"""Subquery operators: scalar, IN, correlated EXISTS, CTEs — part of
the arbitrary-Spark-SQL capability the reference's transform slot
exposes (template.py:319-322). Catalyst rewrites all of these into
joins/aggregates; the tests here pin that the rewrites stay sane.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..catalog import Catalog
from . import query


def _sql(spark: SparkSession, sf_dir: str, statement: str) -> DataFrame:
    Catalog(spark).register_testdata(sf_dir)
    return spark.sql(statement)


_SCALAR_SUBQUERY = """
SELECT o_orderkey, o_totalprice,
       CAST(round(o_totalprice - (SELECT avg(o_totalprice) FROM orders), 2) AS DOUBLE)
         AS diff_from_mean
FROM orders
WHERE o_totalprice > (SELECT avg(o_totalprice) FROM orders) * 1.5
"""


@query("subquery_scalar", oracle=_SCALAR_SUBQUERY)
def subquery_scalar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar subquery (global mean) in both projection and predicate —
    Catalyst evaluates it once and broadcasts the scalar.

    avg(double) is sequence-dependent in general, but both engines
    compute it over identical values and the result feeds a *strict*
    comparison plus a 2-decimal rounding — stable in practice (verified
    via the parity harness at both SFs).
    """
    return _sql(spark, sf_dir, _SCALAR_SUBQUERY)


_IN_SUBQUERY = """
SELECT c_custkey, c_name FROM customer
WHERE c_custkey IN (SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT')
  AND c_nationkey IN (SELECT n_nationkey FROM nation WHERE n_regionkey = 0)
"""


@query("subquery_in", oracle=_IN_SUBQUERY)
def subquery_in(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IN-subqueries → left-semi joins (one per subquery)."""
    return _sql(spark, sf_dir, _IN_SUBQUERY)


_CORRELATED_EXISTS = """
SELECT o_orderpriority, count(*) AS order_count
FROM orders o
WHERE EXISTS (
  SELECT 1 FROM lineitem l
  WHERE l.l_orderkey = o.o_orderkey AND l.l_quantity > 45
)
GROUP BY o_orderpriority
"""


@query("subquery_correlated_exists", oracle=_CORRELATED_EXISTS)
def subquery_correlated_exists(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape: correlated EXISTS → semi join on the correlation
    key with the inner predicate pushed to the lineitem scan."""
    return _sql(spark, sf_dir, _CORRELATED_EXISTS)


_CTE_QUERY = """
WITH cust_spend AS (
  SELECT o_custkey, CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS spend
  FROM orders GROUP BY o_custkey
), ranked AS (
  SELECT o_custkey, spend,
         row_number() OVER (ORDER BY spend DESC, o_custkey ASC) AS rnk
  FROM cust_spend
)
SELECT r.rnk, r.o_custkey, r.spend, c.c_name, c.c_mktsegment
FROM ranked r JOIN customer c ON r.o_custkey = c.c_custkey
WHERE r.rnk <= 25
"""


@query("cte_top_spenders", oracle=_CTE_QUERY)
def cte_top_spenders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chained CTEs + global ranking + dimension join: top-25 customers
    by lifetime spend. The global row_number is a single-partition sort
    of the *aggregated* (one row per customer) set — acceptable because
    aggregation shrank the data first; the plan test asserts the
    aggregate happens before the sort."""
    return _sql(spark, sf_dir, _CTE_QUERY)


_NOT_IN_NULLSAFE = """
SELECT n_nationkey, n_name FROM nation
WHERE n_nationkey NOT IN (SELECT s_nationkey FROM supplier)
"""


@query("subquery_not_in", oracle=_NOT_IN_NULLSAFE)
def subquery_not_in(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NOT IN → null-aware anti join (both engines agree here because
    s_nationkey is non-null; the operator exists for the capability
    surface)."""
    return _sql(spark, sf_dir, _NOT_IN_NULLSAFE)
