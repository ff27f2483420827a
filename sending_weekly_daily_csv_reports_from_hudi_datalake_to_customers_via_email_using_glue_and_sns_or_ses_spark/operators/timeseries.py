"""Time-series / event-stream operators over ``events``
(SURVEY.md §2.7 X11/X12): JSON props extraction, time-bucketed sliding
aggregation, sessionization with ordered event sequences, as-of
alignment.

Batch forms here; the Structured Streaming variants (watermarks,
session_window) live in streaming/windows.py and
operators/streaming_entries.py with the same semantics (the streaming
hourly rollup carries the tumbling-bucket oracle for both).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load_table
from . import query


@query(
    "sessionization",
    retired=True,  # r10: slot funded scd2_history (the CDC-driven SCD2
    # dimension history's external correctness row). The 30-min-gap
    # session semantics stay driver-green via the oracle-checked
    # streaming_session_window (the same sessions through the REAL
    # streaming engine), the lag/cumsum window primitives via
    # window_ranking_topk and join_range_asof, and this entry keeps
    # its full oracle under test_retired_parity.
    oracle="""
    WITH marked AS (
      SELECT user_id, ts, event_id, event_type,
             CASE WHEN lag(ts) OVER w IS NULL
                       OR date_diff('second', lag(ts) OVER w, ts) > 1800
                  THEN 1 ELSE 0 END AS is_new_session
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts ASC, event_id ASC)
    ), sessioned AS (
      SELECT user_id, ts, event_id, event_type,
             CAST(sum(is_new_session) OVER (PARTITION BY user_id
                                            ORDER BY ts ASC, event_id ASC
                                            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                  AS BIGINT) AS session_id
      FROM marked
    )
    SELECT user_id, session_id,
           count(*) AS n_events,
           min(ts) AS session_start,
           max(ts) AS session_end,
           string_agg(event_type, ',' ORDER BY ts ASC, event_id ASC) AS event_seq
    FROM sessioned
    GROUP BY user_id, session_id
    """,
)
def sessionization(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based sessionization (30-min inactivity) + the ordered
    per-session event sequence (the behavioral-sequence shape fed to
    sequence models): lag + cumulative sum of session-break flags — one
    shuffle on user_id, no iteration. Spark has no ORDER BY inside an
    aggregate, so the deterministic sequence is collect_list of
    (ts, event_id, type) structs → array_sort (lexicographic on struct
    fields = the desired order) → project the type. Per-user arrays stay
    small (bounded by user activity, not total SF).

    Streaming counterpart: session_window(ts, '30 minutes') in
    operators/streaming_entries.py. NOT an exact twin at the boundary:
    both split on gap > 1800 (session_window MERGES an exactly-1800 s
    gap — verified empirically on an integer-second corpus, r4 organic
    parity), but this op truncates to whole seconds first while
    session_window compares exact epochs, so a true gap in
    (1800.0 s, 1801.0 s) merges here but splits there — each op matches
    its own oracle; don't share one oracle between them."""
    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(F.asc("ts"), F.asc("event_id"))
    # parquet timestamps without tz annotation arrive as TIMESTAMP_NTZ,
    # which Spark refuses to cast straight to long; routing through
    # timestamp_ltz (session tz is pinned UTC in session.py) gives the
    # same epoch seconds for both NTZ and LTZ inputs
    ts_s = F.col("ts").cast("timestamp_ltz").cast("long")
    gap_s = ts_s - F.lag(ts_s).over(w)
    marked = e.withColumn(
        "is_new_session",
        F.when(gap_s.isNull() | (gap_s > 1800), F.lit(1)).otherwise(F.lit(0)),
    )
    w2 = (
        Window.partitionBy("user_id")
        .orderBy(F.asc("ts"), F.asc("event_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    sessioned = marked.withColumn("session_id", F.sum("is_new_session").over(w2))
    seq = F.array_join(
        F.transform(
            F.array_sort(F.collect_list(F.struct("ts", "event_id", "event_type"))),
            lambda x: x["event_type"],
        ),
        ",",
    )
    return sessioned.groupBy("user_id", "session_id").agg(
        F.count("*").alias("n_events"),
        F.min("ts").alias("session_start"),
        F.max("ts").alias("session_end"),
        seq.alias("event_seq"),
    )


@query(
    "sliding_json_counts",
    oracle="""
    WITH buckets AS (
      SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
             count(*) AS n,
             CAST(sum(CASE WHEN CAST(json_extract_string(props, '$.k') AS BIGINT) > 50
                           THEN 1 ELSE 0 END) AS BIGINT) AS n_hot
      FROM events GROUP BY day)
    SELECT day, n, n_hot,
           CAST(sum(n) OVER w7 AS BIGINT) AS n_7d,
           CAST(sum(n_hot) OVER w7 AS BIGINT) AS n_hot_7d
    FROM buckets
    WINDOW w7 AS (ORDER BY day ASC ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)
    """,
)
def sliding_json_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X11 + X12 batch: pull a typed field out of the JSON ``props``
    string (get_json_object is JVM-side Jackson — no UDF), pre-aggregate
    to daily buckets (map-side combine shrinks the data), then trailing
    7-day totals as a tiny frame window over days. Never a sliding
    window over raw rows at scale — bucket first; the day-grain window
    input is SF-independent (cardinality = number of days)."""
    e = load_table(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("bigint")
    daily = e.groupBy(F.date_trunc("day", "ts").alias("day")).agg(
        F.count("*").alias("n"),
        F.sum(F.when(k > 50, 1).otherwise(0)).cast("bigint").alias("n_hot"),
    )
    w7 = Window.orderBy(F.asc("day")).rowsBetween(-6, Window.currentRow)
    return daily.select(
        "day",
        "n",
        "n_hot",
        F.sum("n").over(w7).cast("bigint").alias("n_7d"),
        F.sum("n_hot").over(w7).cast("bigint").alias("n_hot_7d"),
    )


@query(
    "asof_align_pandas",
    retired=True,  # r7: slot funded ivm_report — as-of semantics stay
    # driver-checked via join_range_asof and the pandas-UDF surface via
    # media_decode_pipeline; this entry keeps its full oracle contract
    # in the retired registry (tests/test_retired_parity.py)
    oracle="""
    SELECT e.event_id, e.user_id, e.ts, p.purchase_ts
    FROM events e ASOF LEFT JOIN
         (SELECT user_id, ts AS purchase_ts FROM events
          WHERE event_type = 'purchase') p
      ON e.user_id = p.user_id AND e.ts >= p.purchase_ts
    """,
)
def asof_align_pandas(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of alignment via grouped ``applyInPandas`` + ``pd.merge_asof``
    — the escape hatch for semantics the built-ins can't express
    (pyspark_guide: as-of pattern). Each user's events align to that
    user's most recent prior 'purchase' event (inclusive at equal ts,
    matching merge_asof's allow_exact_matches default).

    Hash-checked against DuckDB's native ASOF LEFT JOIN (same inclusive
    backward-match semantics); pytest additionally checks a per-group
    reference implementation. The pure-DataFrame as-of form (union +
    running last, one shuffle) is driver-checked as ``join_range_asof``.

    Scale: groups hash-shuffle once; each group is a small pandas frame
    (bounded by per-user activity, not total SF). The purchase rows ride
    the union under an ``is_purchase`` FLAG — nulling event_id instead
    would force Arrow's int64-with-nulls → float64 pandas conversion,
    which silently rounds ids above 2^53 (snowflake-style id corruption
    with no error).
    """
    e = load_table(spark, sf_dir, "events")
    purchases = e.filter(F.col("event_type") == "purchase").select(
        "user_id", F.col("ts").alias("purchase_ts")
    )
    joined = e.select(
        "event_id", "user_id", "ts", F.lit(False).alias("is_purchase")
    ).unionByName(
        purchases.select(
            F.lit(-1).cast("long").alias("event_id"),  # dummy, dropped below
            "user_id",
            F.col("purchase_ts").alias("ts"),
            F.lit(True).alias("is_purchase"),
        )
    )

    def align(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("ts")
        ev = pdf[~pdf.is_purchase][["event_id", "user_id", "ts"]]
        pu = pdf[pdf.is_purchase][["ts"]].rename(columns={"ts": "purchase_ts"})
        if ev.empty:
            return ev.assign(purchase_ts=pd.Series(dtype="datetime64[us]"))
        if pu.empty:
            return ev.assign(purchase_ts=pd.NaT)
        out = pd.merge_asof(ev, pu, left_on="ts", right_on="purchase_ts")
        return out[["event_id", "user_id", "ts", "purchase_ts"]]

    return joined.groupBy("user_id").applyInPandas(
        align,
        schema="event_id long, user_id long, ts timestamp, purchase_ts timestamp",
    )
