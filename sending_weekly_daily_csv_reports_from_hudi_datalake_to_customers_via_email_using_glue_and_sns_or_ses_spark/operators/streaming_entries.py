"""Streaming operators exposed as driver-checkable queries: each entry
lands the (bounded) events table as a file stream source, drives the
Structured Streaming plan to completion through the memory sink, and
returns the materialized result — so the SAME DuckDB oracle that checks
the batch twin checks the streaming implementation.

Complete output mode emits every window regardless of watermark, which
is exactly the bounded-input semantics the batch oracle computes; the
append-mode + watermark behavior (late-data dropping) is covered by
tests/test_streaming.py instead, where it's the property under test.
"""

from __future__ import annotations

import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from . import query


def _events_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events as a bounded file-stream source (re-landed so the nanos
    fix from load_table is baked into the parquet)."""
    path = tempfile.mkdtemp(prefix="events_stream_")
    batch = load_table(spark, sf_dir, "events")
    batch.write.mode("overwrite").parquet(path)
    return spark.readStream.schema(batch.schema).parquet(path)


def _drain(stream_df: DataFrame, output_mode: str) -> DataFrame:
    spark = stream_df.sparkSession
    name = f"q{abs(hash(stream_df)) % 10_000_000}"
    q = (
        stream_df.writeStream.outputMode(output_mode)
        .format("memory")
        .queryName(name)
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    return spark.table(name)


@query(
    "streaming_hourly_rollup",
    oracle="""
    SELECT date_trunc('hour', ts) AS hour, event_type,
           count(*) AS n_events,
           CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS total_value
    FROM events
    GROUP BY hour, event_type
    """,
)
def streaming_hourly_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X12 streaming, oracle-checked: tumbling 1-hour windows computed by
    Structured Streaming (complete mode over the bounded source) match
    the batch GROUP BY exactly — same engine state machinery that runs
    unbounded in production, verified against DuckDB here."""
    stream = _events_stream(spark, sf_dir)
    agg = (
        stream.groupBy(F.window("ts", "1 hour").alias("win"), "event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,6)"))
            .cast("double")
            .alias("total_value"),
        )
    )
    out = _drain(agg, "complete")
    return out.select(
        F.col("win.start").alias("hour"), "event_type", "n_events", "total_value"
    )


@query("streaming_session_window")
def streaming_session_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X12 streaming sessionization via session_window (gap 30 min) over
    the bounded source with a watermark. Rows-only driver check (session
    boundary semantics at exact-gap edges differ microscopically from
    the lag+cumsum batch formulation); tests/test_streaming.py asserts
    structural properties."""
    stream = _events_stream(spark, sf_dir)
    agg = (
        stream.withWatermark("ts", "1 hour")
        .groupBy(F.session_window("ts", "30 minutes").alias("sess"), "user_id")
        .agg(F.count("*").alias("n_events"))
    )
    out = _drain(agg, "append")
    return out.select(
        "user_id",
        F.col("sess.start").alias("session_start"),
        F.col("sess.end").alias("session_end"),
        "n_events",
    )
