"""Scalar-function coverage (SURVEY.md §2.6 F1-F7 lifted into the plan,
plus the string/date/conditional function families any report transform
uses). All JVM built-ins inside codegen; each expression is written so
the DuckDB oracle is value-identical.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from . import query


@query(
    "scalar_date_functions",
    oracle="""
    SELECT o_orderkey,
           CAST(year(o_orderdate) AS INT)       AS order_year,
           CAST(month(o_orderdate) AS INT)      AS order_month,
           CAST(day(o_orderdate) AS INT)        AS order_day,
           CAST(quarter(o_orderdate) AS INT)    AS order_quarter,
           strftime(o_orderdate, '%Y-%m')       AS year_month,
           CAST(o_orderdate + INTERVAL 30 DAY AS TIMESTAMP) AS due_date,
           CAST(date_diff('day', o_orderdate, TIMESTAMP '2000-01-01 00:00:00') AS BIGINT)
             AS days_to_y2k
    FROM orders
    """,
)
def scalar_date_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F1/F4 family: year/month/day/quarter extraction, formatting,
    interval arithmetic, day differences — the reference computes these
    driver-side (template.py:437-448); here they're plan expressions."""
    o = load_table(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.year("o_orderdate").alias("order_year"),
        F.month("o_orderdate").alias("order_month"),
        F.dayofmonth("o_orderdate").alias("order_day"),
        F.quarter("o_orderdate").alias("order_quarter"),
        F.date_format("o_orderdate", "yyyy-MM").alias("year_month"),
        (F.col("o_orderdate") + F.expr("INTERVAL 30 DAY")).alias("due_date"),
        F.datediff(F.lit("2000-01-01").cast("timestamp"), F.col("o_orderdate"))
        .cast("bigint")
        .alias("days_to_y2k"),
    )


@query(
    "scalar_string_functions",
    oracle="""
    SELECT p_partkey,
           upper(p_name)                                   AS name_uc,
           lower(p_brand)                                  AS brand_lc,
           substr(p_type, 1, 5)                            AS type_prefix,
           length(p_name)                                  AS name_len,
           concat(p_brand, ':', p_type)                    AS brand_type,
           replace(p_name, ' ', '_')                       AS name_snake,
           trim(p_name)                                    AS name_trim,
           lpad(CAST(p_size AS VARCHAR), 4, '0')           AS size_padded,
           split_part(p_type, ' ', 1)                      AS type_first_word,
           CASE WHEN p_name LIKE '%steel%' THEN 1 ELSE 0 END AS is_steel,
           CASE WHEN regexp_matches(p_type, '^(STANDARD|SMALL)') THEN 1 ELSE 0 END AS is_std_small
    FROM part
    """,
)
def scalar_string_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F5/F6 family: case, substring, concat, pad, split, LIKE, regex."""
    p = load_table(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.upper("p_name").alias("name_uc"),
        F.lower("p_brand").alias("brand_lc"),
        F.substring("p_type", 1, 5).alias("type_prefix"),
        F.length("p_name").alias("name_len"),
        F.concat_ws(":", "p_brand", "p_type").alias("brand_type"),
        F.replace(F.col("p_name"), F.lit(" "), F.lit("_")).alias("name_snake"),
        F.trim("p_name").alias("name_trim"),
        F.lpad(F.col("p_size").cast("string"), 4, "0").alias("size_padded"),
        F.split(F.col("p_type"), " ").getItem(0).alias("type_first_word"),
        F.when(F.col("p_name").like("%steel%"), 1).otherwise(0).alias("is_steel"),
        F.when(F.col("p_type").rlike("^(STANDARD|SMALL)"), 1)
        .otherwise(0)
        .alias("is_std_small"),
    )


@query(
    "scalar_conditional_null",
    oracle="""
    SELECT c_custkey,
           coalesce(nullif(c_mktsegment, 'MACHINERY'), 'OTHER') AS segment_or_other,
           CASE WHEN c_acctbal < 0 THEN 'debt'
                WHEN c_acctbal < 5000 THEN 'low'
                ELSE 'high' END                               AS balance_band,
           CAST(greatest(c_acctbal, 0.0) AS DOUBLE)           AS non_negative_bal,
           CAST(abs(c_acctbal) AS DOUBLE)                     AS abs_bal,
           (c_acctbal IS NULL)                                AS bal_missing
    FROM customer
    """,
)
def scalar_conditional_null(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CASE/COALESCE/NULLIF/greatest/abs — the conditional family."""
    c = load_table(spark, sf_dir, "customer")
    return c.select(
        "c_custkey",
        F.coalesce(
            F.nullif(F.col("c_mktsegment"), F.lit("MACHINERY")), F.lit("OTHER")
        ).alias("segment_or_other"),
        F.when(F.col("c_acctbal") < 0, "debt")
        .when(F.col("c_acctbal") < 5000, "low")
        .otherwise("high")
        .alias("balance_band"),
        F.greatest(F.col("c_acctbal"), F.lit(0.0)).alias("non_negative_bal"),
        F.abs("c_acctbal").alias("abs_bal"),
        F.col("c_acctbal").isNull().alias("bal_missing"),
    )


@query(
    "unpivot_measures",
    oracle="""
    SELECT s_suppkey, measure, CAST(value AS DOUBLE) AS value
    FROM (SELECT s_suppkey,
                 s_acctbal AS acctbal,
                 CAST(s_nationkey AS DOUBLE) AS nationkey_num
          FROM supplier)
    UNPIVOT (value FOR measure IN (acctbal, nationkey_num))
    """,
)
def unpivot_measures(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unpivot (melt): wide measures → (key, measure, value) rows."""
    s = load_table(spark, sf_dir, "supplier").select(
        "s_suppkey",
        F.col("s_acctbal").alias("acctbal"),
        F.col("s_nationkey").cast("double").alias("nationkey_num"),
    )
    return s.unpivot(
        ids=["s_suppkey"],
        values=["acctbal", "nationkey_num"],
        variableColumnName="measure",
        valueColumnName="value",
    )


@query(
    "uuid_surrogate_keys",
    oracle="""
    SELECT o_orderkey,
           md5(concat('orders|', CAST(o_orderkey AS VARCHAR))) AS surrogate_key
    FROM orders
    """,
)
def uuid_surrogate_keys(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F2 done deterministically: the reference names artifacts with
    uuid4 (template.py:460) — non-reproducible. The engine's surrogate
    key is a content hash (stable across runs and engines); true random
    uuid() stays available for file naming (sinks/report.py)."""
    o = load_table(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.md5(F.concat(F.lit("orders|"), F.col("o_orderkey").cast("string"))).alias(
            "surrogate_key"
        ),
    )


@query(
    "array_functions",
    oracle="""
    SELECT vec_id, label,
           len(embedding) AS dim,
           CAST(round(CAST(embedding[1] AS DOUBLE), 4) AS DOUBLE) AS first_elem,
           CAST(round(CAST(list_max(embedding) AS DOUBLE), 4) AS DOUBLE) AS max_elem,
           CAST(round(CAST(list_min(embedding) AS DOUBLE), 4) AS DOUBLE) AS min_elem,
           (list_max(embedding) > 0) AS has_positive
    FROM embeddings
    """,
)
def array_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array-column function family over the embedding vectors: size,
    element access, min/max, predicates — all JVM-side array exprs
    (float cells widened to double then rounded for parity)."""
    e = load_table(spark, sf_dir, "embeddings")
    return e.select(
        "vec_id",
        "label",
        F.size("embedding").alias("dim"),
        F.round(F.element_at("embedding", 1).cast("double"), 4)
        .cast("double")
        .alias("first_elem"),
        F.round(F.array_max("embedding").cast("double"), 4)
        .cast("double")
        .alias("max_elem"),
        F.round(F.array_min("embedding").cast("double"), 4)
        .cast("double")
        .alias("min_elem"),
        (F.array_max("embedding") > 0).alias("has_positive"),
    )


@query(
    "price_histogram",
    oracle="""
    SELECT CAST(floor(o_totalprice / 50000.0) AS BIGINT) AS bucket,
           count(*) AS n,
           CAST(min(o_totalprice) AS DOUBLE) AS lo,
           CAST(max(o_totalprice) AS DOUBLE) AS hi
    FROM orders
    GROUP BY bucket
    """,
)
def price_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-width histogram by bucket arithmetic — the one-pass
    distribution profile (floor division is engine-portable where
    width_bucket isn't)."""
    o = load_table(spark, sf_dir, "orders")
    bucket = F.floor(F.col("o_totalprice") / 50000.0).cast("bigint")
    return o.groupBy(bucket.alias("bucket")).agg(
        F.count("*").alias("n"),
        F.min("o_totalprice").alias("lo"),
        F.max("o_totalprice").alias("hi"),
    )
