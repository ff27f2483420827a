"""Scalar-function coverage (SURVEY.md §2.6 F1-F7 lifted into the plan,
plus the string/date/conditional function families any report transform
uses). All JVM built-ins inside codegen; each expression is written so
the DuckDB oracle is value-identical.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from ..functions.vector import l2_norm
from . import query


@query(
    "scalar_datetime_keys",
    oracle="""
    SELECT o_orderkey,
           CAST(year(o_orderdate) AS INT)       AS order_year,
           CAST(month(o_orderdate) AS INT)      AS order_month,
           CAST(day(o_orderdate) AS INT)        AS order_day,
           CAST(quarter(o_orderdate) AS INT)    AS order_quarter,
           strftime(o_orderdate, '%Y-%m')       AS year_month,
           CAST(o_orderdate + INTERVAL 30 DAY AS TIMESTAMP) AS due_date,
           CAST(date_diff('day', o_orderdate, TIMESTAMP '2000-01-01 00:00:00') AS BIGINT)
             AS days_to_y2k,
           md5(concat('orders|', CAST(o_orderkey AS VARCHAR))) AS surrogate_key,
           coalesce(nullif(o_orderpriority, '3-MEDIUM'), 'OTHER') AS priority_or_other,
           CASE WHEN o_totalprice < 50000 THEN 'small'
                WHEN o_totalprice < 200000 THEN 'mid'
                ELSE 'large' END                AS price_band,
           CAST(greatest(o_totalprice - 100000.0, 0.0) AS DOUBLE) AS above_100k,
           (nullif(o_orderstatus, 'O') IS NULL) AS is_open
    FROM orders
    """,
)
def scalar_datetime_keys(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F1/F2/F4 + the conditional family in one scan of orders:
    year/month/day/quarter extraction, formatting, interval arithmetic,
    day differences (the reference computes these driver-side,
    template.py:437-448; here they're plan expressions); a deterministic
    surrogate key (content hash — the reference names artifacts with
    uuid4 at template.py:460, which is non-reproducible; true-random
    uuid() stays available for file naming in sinks/report.py); and
    CASE / COALESCE / NULLIF / greatest / IS NULL conditionals."""
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
        F.md5(F.concat(F.lit("orders|"), F.col("o_orderkey").cast("string"))).alias(
            "surrogate_key"
        ),
        F.coalesce(
            F.nullif(F.col("o_orderpriority"), F.lit("3-MEDIUM")), F.lit("OTHER")
        ).alias("priority_or_other"),
        F.when(F.col("o_totalprice") < 50000, "small")
        .when(F.col("o_totalprice") < 200000, "mid")
        .otherwise("large")
        .alias("price_band"),
        F.greatest(F.col("o_totalprice") - 100000.0, F.lit(0.0)).alias("above_100k"),
        F.nullif(F.col("o_orderstatus"), F.lit("O")).isNull().alias("is_open"),
    )


@query(
    "scalar_string_functions",
    retired=True,  # r6: slot funded exact_substring_pairs; value-checked by
    # tests/test_retired_parity.py; F5/F6 exprs also run inside flagship/q-queries
    oracle="""
    SELECT p_partkey,
           upper(p_name)                                   AS name_uc,
           lower(p_brand)                                  AS brand_lc,
           substr(p_type, 1, 5)                            AS type_prefix,
           length(p_name)                                  AS name_len,
           concat(coalesce(p_brand, ''), ':', coalesce(p_type, '')) AS brand_type,
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
        # explicit coalesce on BOTH sides: Spark concat_ws drops a NULL
        # element AND its separator while DuckDB concat keeps the
        # separator — with '' neither engine's NULL rule is in play
        F.concat_ws(
            ":",
            F.coalesce(F.col("p_brand"), F.lit("")),
            F.coalesce(F.col("p_type"), F.lit("")),
        ).alias("brand_type"),
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
    "array_functions",
    retired=True,  # r6: slot funded semantic_dedup; value-checked by
    # tests/test_retired_parity.py; l2_norm/array exprs also hash-checked via knn entries
    oracle="""
    SELECT vec_id, label,
           len(embedding) AS dim,
           CAST(round(CAST(embedding[1] AS DOUBLE), 4) + 0 AS DOUBLE) AS first_elem,
           CAST(round(CAST(list_max(embedding) AS DOUBLE), 4) + 0 AS DOUBLE) AS max_elem,
           CAST(round(CAST(list_min(embedding) AS DOUBLE), 4) + 0 AS DOUBLE) AS min_elem,
           (list_max(embedding) > 0) AS has_positive,
           CAST(round((SELECT sqrt(sum(CAST(a AS DOUBLE) * CAST(a AS DOUBLE)))
                       FROM (SELECT unnest(embedding) AS a)), 4) AS DOUBLE) AS l2_norm
    FROM embeddings
    """,
)
def array_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array-column function family over the embedding vectors: size,
    element access, min/max, predicates, and the L2 norm via a
    JVM-side aggregate fold (functions/vector.py — the vector-hygiene
    op that catches zero/denormal vectors before they poison cosine
    math). All JVM array exprs; float cells widened to double then
    rounded for parity."""
    e = load_table(spark, sf_dir, "embeddings")
    return e.select(
        "vec_id",
        "label",
        F.size("embedding").alias("dim"),
        (F.round(F.element_at("embedding", 1).cast("double"), 4) + F.lit(0.0))
        .cast("double")
        .alias("first_elem"),
        (F.round(F.array_max("embedding").cast("double"), 4) + F.lit(0.0))
        .cast("double")
        .alias("max_elem"),
        (F.round(F.array_min("embedding").cast("double"), 4) + F.lit(0.0))
        .cast("double")
        .alias("min_elem"),
        (F.array_max("embedding") > 0).alias("has_positive"),
        F.round(l2_norm(F.col("embedding")), 4).cast("double").alias("l2_norm"),
    )
