"""Structured Streaming operators (SURVEY.md §2.7 X12): the streaming
twins of the batch time-series ops in operators/timeseries.py.

The reference consumes its change stream in batch pulls (incremental
reads, template.py:226-273); these operators are the continuous version
of the same semantics: a file/parquet stream source + event-time
watermarks + tumbling/sliding/session windows.

Scale notes: streaming state (window aggregates, session state) lives in
the state store keyed by (window, group) — the watermark bounds state
size; without it a 100 TB/day stream grows state forever. Every operator
here therefore REQUIRES a watermark.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _with_event_time(events: DataFrame, col: str = "ts") -> DataFrame:
    """Normalize the event-time column to TIMESTAMP (LTZ): parquet
    written without a tz annotation arrives as TIMESTAMP_NTZ, which
    ``withWatermark`` rejects outright (EVENT_TIME_IS_NOT_ON_TIMESTAMP_
    TYPE). The session tz is pinned UTC (session.py), so the cast
    changes the type, not the instant. Applied inside every streaming
    operator so library callers — not just the driver entries, which
    re-land the parquet — get working watermarks (VERDICT r3 #2)."""
    return events.withColumn(col, F.col(col).cast("timestamp_ltz"))


def hourly_rollup_stream(events: DataFrame, watermark: str = "2 hours") -> DataFrame:
    """Streaming twin of the hourly rollup (streaming_hourly_rollup): tumbling 1-hour windows,
    late data admitted up to the watermark then dropped (deterministic
    final results once the watermark passes)."""
    return (
        _with_event_time(events).withWatermark("ts", watermark)
        .groupBy(F.window("ts", "1 hour").alias("win"), "event_type")
        .agg(
            F.count("*").alias("n_events"),
            # decimal accumulate → double at the end: deterministic
            # regardless of partial-agg order (the repo's money/float
            # parity convention)
            F.sum(F.col("value").cast("decimal(18,6)"))
            .cast("double")
            .alias("total_value"),
        )
        .select(
            F.col("win.start").alias("hour"),
            "event_type",
            "n_events",
            "total_value",
        )
    )


def sliding_counts_stream(events: DataFrame, watermark: str = "2 hours") -> DataFrame:
    """Sliding 24h window advancing hourly — the streaming trailing-
    volume metric (batch twin: sliding_window_counts)."""
    return (
        _with_event_time(events).withWatermark("ts", watermark)
        .groupBy(F.window("ts", "24 hours", "1 hour").alias("win"))
        .agg(F.count("*").alias("n"))
        .select(F.col("win.start").alias("win_start"), F.col("win.end").alias("win_end"), "n")
    )


def session_stream(events: DataFrame, gap: str = "30 minutes", watermark: str = "2 hours") -> DataFrame:
    """Streaming sessionization via session_window (gap-based, merges
    windows as events arrive) — batch twin: sessionization (lag+cumsum)."""
    return (
        _with_event_time(events).withWatermark("ts", watermark)
        .groupBy(F.session_window("ts", gap).alias("sess"), "user_id")
        .agg(F.count("*").alias("n_events"))
        .select(
            "user_id",
            F.col("sess.start").alias("session_start"),
            F.col("sess.end").alias("session_end"),
            "n_events",
        )
    )


def run_stream_on_batch(
    stream_df: DataFrame, query_name: str, output_mode: str = "append"
) -> DataFrame:
    """Drive a streaming plan over a bounded source to completion using
    the memory sink (pyspark_guide streaming pattern) and return the
    materialized result — the unit-test harness for streaming operators.
    """
    spark = stream_df.sparkSession
    q = (
        stream_df.writeStream.outputMode(output_mode)
        .format("memory")
        .queryName(query_name)
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    return spark.table(query_name)


def dedupe_stream_watermark(
    events: DataFrame,
    keys: list[str] | None = None,
    watermark: str = "2 hours",
    ts_col: str = "ts",
) -> DataFrame:
    """Built-in bounded-state streaming dedup:
    ``dropDuplicatesWithinWatermark`` emits the first occurrence of
    each key and expires state once the event-time watermark passes —
    the idiomatic Spark form of at-most-once-per-key ingest when
    duplicates arrive CLOSE TOGETHER (at-least-once upstream delivery,
    replayed batches), state bounded by watermark horizon × key rate
    regardless of stream lifetime.

    Complements ``streaming/stateful.dedupe_stream`` (the
    applyInPandasWithState TTL variant): that one gives exact
    first-occurrence semantics with explicit TTL control and custom
    state, this one is pure built-in — no Python in the loop, state
    management owned by the engine. Use the stateful variant when
    duplicates can arrive ARBITRARILY far apart (standing-corpus dedup
    belongs to dedup.build_corpus_index / stream_ingest_dedup); use
    this when the dedup horizon is a bounded replay window.
    """
    e = _with_event_time(events, ts_col).withWatermark(ts_col, watermark)
    return e.dropDuplicatesWithinWatermark(list(keys or ["event_id"]))
