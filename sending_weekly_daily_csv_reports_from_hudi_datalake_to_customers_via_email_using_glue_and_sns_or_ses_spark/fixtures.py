"""Seeded, distributed generator for the reference-shaped keyed tables
(FIXTURES.md §B; shapes from generate_hudi_table.py:42-77).

The reference generates rows driver-side with Faker (fine at 150 rows);
here generation is a ``spark.range`` + column expressions — fully
distributed and deterministic (hash-derived pseudo-randomness, no RNG
state), so the same fixture works at any scale factor.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_STATES = ["NY", "CA", "TX", "WA", "IL", "FL", "MA", "GA"]
_PRIORITIES = ["LOW", "MEDIUM", "HIGH", "URGENT"]


def _pick(col: F.Column, values: list[str]) -> F.Column:
    """Deterministic choice: element of ``values`` selected by hash."""
    arr = F.array(*[F.lit(v) for v in values])
    return F.element_at(arr, (F.pmod(F.xxhash64(col), len(values)) + 1).cast("int"))


def customers(spark: SparkSession, n: int = 50, batch: int = 0) -> DataFrame:
    """generate_hudi_table.py:42-56 shape: record key customer_id,
    precombine created_at, partition field state. ``batch`` shifts
    created_at so successive batches are newer (precombine testing)."""
    base = spark.range(n).withColumnRenamed("id", "i")
    return base.select(
        F.concat(F.lit("cust-"), F.col("i").cast("string")).alias("customer_id"),
        F.concat(F.lit("Name "), F.col("i").cast("string")).alias("name"),
        _pick(F.col("i"), _STATES).alias("state"),
        F.concat(F.lit("City "), (F.col("i") % 20).cast("string")).alias("city"),
        F.concat(F.lit("user"), F.col("i").cast("string"), F.lit("@example.com")).alias(
            "email"
        ),
        (
            F.to_timestamp(F.lit("2024-01-01 00:00:00"))
            + F.make_dt_interval(days=F.lit(batch), hours=F.col("i") % 24)
        ).alias("created_at"),
        F.concat(F.lit("Addr "), F.col("i").cast("string")).alias("address"),
    )


def orders(
    spark: SparkSession, n: int = 100, n_customers: int = 50, batch: int = 0
) -> DataFrame:
    """generate_hudi_table.py:59-77 shape: record key order_id,
    precombine order_date, FK customer_id."""
    base = spark.range(n).withColumnRenamed("id", "i")
    return base.select(
        F.concat(F.lit("ord-"), F.col("i").cast("string")).alias("order_id"),
        F.concat(F.lit("order text "), (F.col("i") % 7).cast("string")).alias("name"),
        (F.pmod(F.xxhash64(F.col("i"), F.lit("value")), 991) + 10)
        .cast("int")
        .alias("order_value"),
        _pick(F.col("i") + 1000, _PRIORITIES).alias("priority"),
        F.date_add(F.to_date(F.lit("2024-01-01")), (F.col("i") % 30 + batch).cast("int")).alias(
            "order_date"
        ),
        F.concat(
            F.lit("cust-"), (F.pmod(F.xxhash64("i"), n_customers)).cast("string")
        ).alias("customer_id"),
    )
