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

import itertools
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from . import query

#: landed-stream cache: (sf_dir, sentinel_hours) → parquet path. The
#: landing is content-stable per key, so repeated driver/parity/bench
#: invocations reuse one copy instead of leaking a fresh tempdir (and a
#: full re-land write + max(ts) scan) per call.
_LANDED: dict[tuple[str, int], str] = {}


def _events_stream(
    spark: SparkSession, sf_dir: str, sentinel_hours: int = 0
) -> DataFrame:
    """events as a bounded file-stream source (re-landed so the nanos
    fix from load_table is baked into the parquet).

    ``sentinel_hours`` > 0 appends ONE far-future sentinel event
    (user_id = −1, ts = max(ts) + sentinel_hours) — the standard
    bounded-replay trick for append-mode watermark queries: the sentinel
    advances the global watermark past every real window so final state
    flushes; callers filter ``user_id >= 0`` from the result."""
    key = (sf_dir, sentinel_hours)
    if key in _LANDED:
        path = _LANDED[key]
        schema = spark.read.parquet(path).schema
        return spark.readStream.schema(schema).parquet(path)
    path = tempfile.mkdtemp(prefix="events_stream_")
    # watermarks/event-time require TIMESTAMP (LTZ): parquet without a
    # tz annotation arrives as TIMESTAMP_NTZ, which EventTimeWatermark
    # rejects outright. Session tz is pinned UTC (session.py), so the
    # cast changes the type, not the instant — and the landed copy then
    # serves both streaming entries identically.
    batch = load_table(spark, sf_dir, "events").withColumn(
        "ts", F.col("ts").cast("timestamp_ltz")
    )
    if sentinel_hours:
        max_ts = batch.agg(F.max("ts")).first()[0]
        sentinel = spark.createDataFrame(
            [(-1, max_ts, -1, "__sentinel__", 0.0, "{}")],
            "event_id long, ts timestamp, user_id long, event_type string,"
            " value double, props string",
        ).withColumn("ts", F.col("ts") + F.expr(f"INTERVAL {sentinel_hours} HOURS"))
        batch = batch.select(
            "event_id", "ts", "user_id", "event_type", "value", "props"
        ).unionByName(sentinel)
    batch.write.mode("overwrite").parquet(path)
    _LANDED[key] = path
    return spark.readStream.schema(batch.schema).parquet(path)


#: monotonic drain names — naming by hash(stream_df) (CPython id-based)
#: could recycle a GC'd frame's id and silently rebind an earlier
#: still-lazy result's memory-sink view to the new query's data
_DRAIN_SEQ = itertools.count()


def _drain(stream_df: DataFrame, output_mode: str) -> DataFrame:
    spark = stream_df.sparkSession
    name = f"stream_drain_{next(_DRAIN_SEQ)}"
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
    from ..streaming.windows import hourly_rollup_stream

    stream = _events_stream(spark, sf_dir)
    # the PRODUCTION operator (streaming/windows.py), not a re-built
    # twin — so the oracle checks the exact plan test_streaming drives
    return _drain(hourly_rollup_stream(stream), "complete")


@query(
    "streaming_session_window",
    oracle="""
    WITH marked AS (
      SELECT user_id, ts, event_id,
             CASE WHEN lag(ts) OVER w IS NULL
                       OR epoch(ts) - epoch(lag(ts) OVER w) > 1800.0
                  THEN 1 ELSE 0 END AS is_new_session
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts ASC, event_id ASC)
    ), sessioned AS (
      SELECT user_id, ts,
             sum(is_new_session) OVER (PARTITION BY user_id
                                       ORDER BY ts ASC, event_id ASC
                                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS session_no
      FROM marked
    )
    SELECT user_id,
           min(ts) AS session_start,
           CAST(max(ts) + INTERVAL 30 MINUTE AS TIMESTAMP) AS session_end,
           count(*) AS n_events
    FROM sessioned
    GROUP BY user_id, session_no
    """,
)
def streaming_session_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X12 streaming sessionization via session_window (gap 30 min) over
    the bounded source with a watermark, in APPEND mode — the real
    production shape (sessions emit only once the watermark passes their
    end). A far-future sentinel event advances the watermark so every
    real session flushes; the oracle is the batch lag+cumsum twin with
    session_window's exact merge rule (merge iff gap <= 1800 s — an
    exactly-gap-sized silence still merges, pinned by the r4 organic
    corpus whose integer-second timestamps hit the boundary; session
    end = last event + gap)."""
    from ..streaming.windows import session_stream

    stream = _events_stream(spark, sf_dir, sentinel_hours=3)
    # the PRODUCTION operator (streaming/windows.py) — one session plan,
    # oracle-checked here, watermark-behavior-checked in test_streaming
    out = _drain(session_stream(stream, "30 minutes", "1 hour"), "append")
    return out.filter(F.col("user_id") >= 0).select(
        "user_id", "session_start", "session_end", "n_events"
    )
