"""SparkSession factory.

Mirrors the reference's session setup (template.py:34-38: Kryo serializer,
Hudi extensions) minus Glue/Hudi specifics, plus the settings a
large-scale deployment wants on by default: AQE (runtime re-planning,
skew-join handling, partition coalescing), Arrow for any pandas
interchange, UTC session timezone (oracle parity + sanity), and a
shuffle-partition count sized to the machine instead of Spark's default
200.

On a real cluster the same factory applies — only ``master`` and the
memory/instance sizing change; everything else here is
cluster-appropriate (AQE does the per-stage sizing at 100 TB).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "report_engine",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 8))
    master = master or f"local[{cpus}]"
    shuffle_partitions = shuffle_partitions or cpus

    builder = (
        SparkSession.builder.master(master)
        .appName(app_name)
        .config("spark.serializer", "org.apache.spark.serializer.KryoSerializer")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.parquet.filterPushdown", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "8g"))
    )
    # real-Hudi lane (SURVEY.md S1/S2 passthrough): point
    # SPARK_GRAFT_HUDI_JARS at a hudi-spark bundle and every session —
    # tests included — gets the datasource + the reference's session
    # extension (template.py:35-37). The sandbox has no network and no
    # bundled jar (documented in tests/test_hudi_passthrough.py), so
    # this is the activation path for environments that do.
    hudi_jars = os.environ.get("SPARK_GRAFT_HUDI_JARS")
    if hudi_jars:
        builder = (
            builder.config("spark.jars", hudi_jars)
            .config(
                "spark.sql.extensions",
                "org.apache.spark.sql.hudi.HoodieSparkSessionExtension",
            )
            .config(
                "spark.sql.catalog.spark_catalog",
                "org.apache.spark.sql.hudi.catalog.HoodieCatalog",
            )
        )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
