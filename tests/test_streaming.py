"""Structured Streaming operators driven over bounded parquet sources
with the memory sink (synchronous processAllAvailable)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from sending_weekly_daily_csv_reports_from_hudi_datalake_to_customers_via_email_using_glue_and_sns_or_ses_spark.catalog import (
    load_table,
)
from sending_weekly_daily_csv_reports_from_hudi_datalake_to_customers_via_email_using_glue_and_sns_or_ses_spark.streaming.stateful import (
    dedupe_stream,
)
from sending_weekly_daily_csv_reports_from_hudi_datalake_to_customers_via_email_using_glue_and_sns_or_ses_spark.streaming.windows import (
    hourly_rollup_stream,
    run_stream_on_batch,
    session_stream,
    sliding_counts_stream,
)

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def events_stream(spark, tmp_path_factory):
    """events as a bounded stream: re-land the (nanos-fixed) batch table
    as parquet, then readStream over it with an explicit schema."""
    path = str(tmp_path_factory.mktemp("stream") / "events")
    batch = load_table(spark, SF, "events")
    batch.write.parquet(path)
    return spark.readStream.schema(batch.schema).parquet(path)


def test_hourly_rollup_stream_matches_batch(spark, events_stream):
    got = run_stream_on_batch(
        hourly_rollup_stream(events_stream), "hourly_out", output_mode="append"
    )
    batch = (
        load_table(spark, SF, "events")
        .groupBy(F.date_trunc("hour", "ts").alias("hour"), "event_type")
        .agg(F.count("*").alias("n_events"))
    )
    g = {(r["hour"], r["event_type"]): r["n_events"] for r in got.collect()}
    b = {(r["hour"], r["event_type"]): r["n_events"] for r in batch.collect()}
    # append mode emits only windows closed by the watermark; every
    # emitted window must match the batch result exactly
    assert g and all(b[k] == v for k, v in g.items())


def test_sliding_counts_stream_matches_batch(spark, events_stream):
    """Sliding 24h/1h windows from the stream agree with the batch
    window() aggregation on every window the watermark closed."""
    got = run_stream_on_batch(
        sliding_counts_stream(events_stream), "sliding_out", output_mode="append"
    )
    batch = (
        load_table(spark, SF, "events")
        .groupBy(F.window("ts", "24 hours", "1 hour").alias("win"))
        .agg(F.count("*").alias("n"))
        .select(
            F.col("win.start").alias("win_start"),
            F.col("win.end").alias("win_end"),
            "n",
        )
    )
    g = {(r["win_start"], r["win_end"]): r["n"] for r in got.collect()}
    b = {(r["win_start"], r["win_end"]): r["n"] for r in batch.collect()}
    assert g and all(b[k] == v for k, v in g.items())


def test_session_stream_produces_sessions(spark, events_stream):
    got = run_stream_on_batch(
        session_stream(events_stream), "session_out", output_mode="append"
    )
    rows = got.collect()
    assert rows
    assert all(r["session_end"] >= r["session_start"] for r in rows)
    assert all(r["n_events"] >= 1 for r in rows)


def test_session_window_gap_boundary(spark, tmp_path):
    """Pin session_window's merge rule at the exact boundary: an
    exactly-gap-sized silence still MERGES (split only when gap is
    STRICTLY greater). The r4 organic corpus — integer-second
    timestamps, so exact-1800 s gaps actually occur — caught the
    oracle encoding >= instead of >; this test keeps the boundary
    pinned against Spark behavior changes too."""
    import datetime as dt

    t0 = dt.datetime(2024, 1, 1, 0, 0, 0)
    rows = [
        (1, t0, 10, "a", 0.0, "{}"),
        (2, t0 + dt.timedelta(seconds=1800), 10, "a", 0.0, "{}"),  # == gap
        (3, t0 + dt.timedelta(seconds=1800 + 1801), 10, "a", 0.0, "{}"),  # > gap
    ]
    df = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    )
    p = str(tmp_path / "boundary_events")
    df.write.parquet(p)
    stream = spark.readStream.schema(df.schema).parquet(p)
    out = run_stream_on_batch(
        session_stream(stream, "30 minutes", "0 seconds"),
        "session_boundary_out",
        output_mode="complete",
    )
    sessions = sorted(
        (r["session_start"], r["n_events"]) for r in out.collect()
    )
    assert sessions == [
        (t0, 2),  # the exactly-1800s pair merged
        (t0 + dt.timedelta(seconds=3601), 1),  # the 1801s gap split
    ]


def test_stateful_dedupe_stream(spark, tmp_path):
    """Streaming first-occurrence dedup: duplicate fingerprints across
    micro-batches are emitted exactly once."""
    docs = (
        load_table(spark, SF, "documents")
        .select(
            "doc_id",
            F.md5(F.lower(F.trim(F.regexp_replace("text", r"\s+", " ")))).alias(
                "fingerprint"
            ),
        )
    )
    # two landings of the same data = guaranteed duplicates
    path = str(tmp_path / "docs_stream")
    docs.write.parquet(path)
    docs.write.mode("append").parquet(path)

    stream = spark.readStream.schema(docs.schema).parquet(path)
    out = run_stream_on_batch(
        dedupe_stream(stream.select("fingerprint", "doc_id")), "dedupe_out"
    )
    emitted = out.collect()
    n_unique = docs.select("fingerprint").distinct().count()
    assert len(emitted) == n_unique
    assert len({r["fingerprint"] for r in emitted}) == n_unique


def test_dedupe_stream_matches_batch_on_seeded_dups(spark, tmp_path):
    """Stream-vs-batch EQUALITY for the stateful dedup (VERDICT r4 #7,
    the sliding_counts_stream playbook): on a seeded near-dup stream —
    every 4th doc an exact copy of its predecessor, landed twice to
    force cross-micro-batch repeats — the streaming first-occurrence
    output must equal the batch rule (min doc_id per fingerprint)
    row-for-row, not just by count."""
    rows = []
    for i in range(120):
        base = i - 1 if i % 4 == 3 else i  # doc 3 copies doc 2, ...
        rows.append((i, f"seeded document body number {base}"))
    docs = spark.createDataFrame(rows, "doc_id long, text string").select(
        "doc_id", F.md5("text").alias("fingerprint")
    )
    # each landing is ONE file holding the full corpus, so whichever
    # micro-batch a landing falls in contains every fingerprint with its
    # global-min doc_id — the emitted row is deterministic under any
    # file-to-batch assignment
    path = str(tmp_path / "seeded_docs_stream")
    docs.coalesce(1).write.parquet(path)
    docs.coalesce(1).write.mode("append").parquet(path)

    stream = spark.readStream.schema(docs.schema).parquet(path)
    out = run_stream_on_batch(
        dedupe_stream(stream.select("fingerprint", "doc_id")),
        "dedupe_batch_eq_out",
    )
    got = {(r["fingerprint"], r["doc_id"]) for r in out.collect()}
    batch = {
        (r["fingerprint"], r["doc_id"])
        for r in docs.groupBy("fingerprint")
        .agg(F.min("doc_id").alias("doc_id"))
        .collect()
    }
    assert got == batch
    assert len(got) == 90  # 120 docs, 30 duplicated fingerprints


@pytest.mark.slow
def test_stream_upsert_exactly_once_convergence(spark, tmp_path):
    """foreachBatch streaming ingest into KeyedTable: after the stream
    drains, the table holds exactly one row per key with the max
    precombine value; re-processing the same source (fresh stream over
    identical data, simulating replay) leaves the snapshot unchanged."""
    from sending_weekly_daily_csv_reports_from_hudi_datalake_to_customers_via_email_using_glue_and_sns_or_ses_spark import (
        fixtures,
    )
    from sending_weekly_daily_csv_reports_from_hudi_datalake_to_customers_via_email_using_glue_and_sns_or_ses_spark.sinks.upsert import (
        KeyedTable,
    )
    from sending_weekly_daily_csv_reports_from_hudi_datalake_to_customers_via_email_using_glue_and_sns_or_ses_spark.streaming.ingest import (
        stream_upsert,
    )

    src = str(tmp_path / "src")
    fixtures.customers(spark, 20, batch=0).write.parquet(src)
    fixtures.customers(spark, 20, batch=2).write.mode("append").parquet(src)

    table = KeyedTable(
        spark,
        str(tmp_path / "tbl"),
        record_key="customer_id",
        precombine="created_at",
    )
    stream = spark.readStream.schema(
        fixtures.customers(spark, 1).schema
    ).option("maxFilesPerTrigger", "1").parquet(src)
    q = stream_upsert(stream, table, str(tmp_path / "ckpt"))
    q.processAllAvailable()
    q.stop()

    snap1 = sorted(
        (r["customer_id"], r["created_at"])
        for r in table.snapshot().collect()
    )
    assert len(snap1) == 20
    newest = {r["customer_id"]: r["created_at"]
              for r in fixtures.customers(spark, 20, batch=2).collect()}
    assert dict(snap1) == newest

    # replay: a new stream over the same files (fresh checkpoint) —
    # the table converges to the same state (idempotent upserts)
    stream2 = spark.readStream.schema(
        fixtures.customers(spark, 1).schema
    ).parquet(src)
    q2 = stream_upsert(stream2, table, str(tmp_path / "ckpt2"), "replay")
    q2.processAllAvailable()
    q2.stop()
    snap2 = sorted(
        (r["customer_id"], r["created_at"])
        for r in table.snapshot().collect()
    )
    assert snap2 == snap1


def test_dedupe_fn_ttl_branches():
    """Unit-level check of the TTL arm/expiry logic against a fake
    GroupState (the engine path for ProcessingTimeTimeout busy-loops
    the ASAP-trigger test harness, so the timer branches are verified
    here and the engine path runs with NoTimeout above)."""
    import pandas as pd

    from sending_weekly_daily_csv_reports_from_hudi_datalake_to_customers_via_email_using_glue_and_sns_or_ses_spark.streaming.stateful import (
        _make_dedupe_fn,
    )

    class FakeState:
        def __init__(self):
            self.exists = False
            self.hasTimedOut = False
            self._v = None
            self.removed = False
            self.timeout_set = None

        @property
        def get(self):
            return self._v

        def update(self, v):
            self._v = v
            self.exists = True

        def remove(self):
            self.removed = True
            self.exists = False

        def setTimeoutDuration(self, ms):
            self.timeout_set = ms

    fn = _make_dedupe_fn(60_000)
    st = FakeState()
    # chunked input: the global min doc_id (7) lives in the SECOND chunk
    chunks = [
        pd.DataFrame({"fingerprint": ["f", "f"], "doc_id": [12, 9]}),
        pd.DataFrame({"fingerprint": ["f"], "doc_id": [7]}),
    ]
    out = list(fn(("f",), iter(chunks), st))
    assert len(out) == 1 and out[0]["doc_id"].iloc[0] == 7
    assert st.timeout_set == 60_000 and st._v == (3,)

    # repeat: suppressed, count accumulates, TTL re-armed
    st.timeout_set = None
    out = list(fn(("f",), iter([chunks[0]]), st))
    assert out == [] and st._v == (5,) and st.timeout_set == 60_000

    # TTL expiry: state dropped, nothing emitted
    st.hasTimedOut = True
    out = list(fn(("f",), iter([]), st))
    assert out == [] and st.removed

    # no-TTL variant never arms a timer
    fn2 = _make_dedupe_fn(None)
    st2 = FakeState()
    list(fn2(("g",), iter([chunks[1]]), st2))
    assert st2.timeout_set is None


def test_stream_upsert_fresh_checkpoint_not_skipped(spark, tmp_path):
    """Replay protection is scoped by checkpoint lineage: a NEW stream
    (fresh checkpoint) over NEW data must apply its batch 0 even though
    an earlier stream already recorded a batch 0 on the same table."""
    from sending_weekly_daily_csv_reports_from_hudi_datalake_to_customers_via_email_using_glue_and_sns_or_ses_spark import (
        fixtures,
    )
    from sending_weekly_daily_csv_reports_from_hudi_datalake_to_customers_via_email_using_glue_and_sns_or_ses_spark.sinks.upsert import (
        KeyedTable,
    )
    from sending_weekly_daily_csv_reports_from_hudi_datalake_to_customers_via_email_using_glue_and_sns_or_ses_spark.streaming.ingest import (
        stream_upsert,
    )

    table = KeyedTable(
        spark, str(tmp_path / "tbl"), record_key="customer_id",
        precombine="created_at",
    )

    def run_stream(src_dir: str, ckpt: str) -> None:
        src = spark.readStream.schema(
            fixtures.customers(spark, 1).schema
        ).parquet(src_dir)
        q = stream_upsert(src, table, ckpt)
        q.processAllAvailable()
        q.stop()

    first = str(tmp_path / "src1")
    fixtures.customers(spark, 10, batch=0).write.parquet(first)
    run_stream(first, str(tmp_path / "ckpt1"))
    assert table.snapshot().count() == 10

    # same table, DIFFERENT stream + checkpoint, disjoint-ish new data:
    # its batch 0 must not be mistaken for the first stream's batch 0
    second = str(tmp_path / "src2")
    fixtures.customers(spark, 25, batch=1).write.parquet(second)
    run_stream(second, str(tmp_path / "ckpt2"))
    assert table.snapshot().count() == 25

    # and a genuine REPLAY (same checkpoint lineage, fresh stream over
    # the same source) is skipped: the log gains no third commit
    n_commits_before = len(table._timeline_meta())
    run_stream(second, str(tmp_path / "ckpt2_replaylike"))
    # new checkpoint => applied; same checkpoint re-run => skipped
    run_stream(second, str(tmp_path / "ckpt2"))
    meta = table._timeline_meta()
    applied_for_ckpt2 = [
        m for m in meta.values()
        if m.get("checkpoint") == str(tmp_path / "ckpt2")
    ]
    assert len(applied_for_ckpt2) == 1  # the replay was skipped
    assert len(meta) == n_commits_before + 1  # only ckpt2_replaylike added


def test_stream_ingest_dedup_standing_corpus(spark, tmp_path):
    """Dedup-on-ingest: micro-batches are deduped within themselves and
    against the persisted corpus index; replaying the whole source over
    the already-built corpus (fresh checkpoint) converges because a
    doc's own index rows are self-excluded."""
    from sending_weekly_daily_csv_reports_from_hudi_datalake_to_customers_via_email_using_glue_and_sns_or_ses_spark.sinks.upsert import (
        KeyedTable,
    )
    from sending_weekly_daily_csv_reports_from_hudi_datalake_to_customers_via_email_using_glue_and_sns_or_ses_spark.streaming.ingest import (
        stream_ingest_dedup,
    )

    def txt(i):
        return " ".join(f"w{i}x{j}" for j in range(30))

    src = str(tmp_path / "src")
    # file 1: docs 0-2 (doc 2 = exact copy of doc 0 → intra-batch dup)
    spark.createDataFrame(
        [(0, txt(0)), (1, txt(1)), (2, txt(0))], "doc_id long, text string"
    ).coalesce(1).write.parquet(src)
    # file 2: doc 3 = exact copy of 1 (cross-batch), doc 4 = near-dup of
    # 1 (one word changed), doc 5 = fresh
    near = txt(1).split(); near[29] = "CHANGED"
    spark.createDataFrame(
        [(3, txt(1)), (4, " ".join(near)), (5, txt(5))],
        "doc_id long, text string",
    ).coalesce(1).write.mode("append").parquet(src)

    table = KeyedTable(
        spark, str(tmp_path / "tbl"), record_key="doc_id", precombine="doc_id"
    )
    index_path = str(tmp_path / "dedup_index")
    stream = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
    )
    q = stream_ingest_dedup(stream, table, index_path, str(tmp_path / "ck"))
    q.processAllAvailable()
    q.stop()

    kept = sorted(r["doc_id"] for r in table.snapshot().collect())
    assert kept == [0, 1, 5]
    idx_ids = sorted(
        r["doc_id"] for r in spark.read.parquet(index_path).collect()
    )
    assert idx_ids == [0, 1, 5]

    # full-source replay under a fresh checkpoint: decisions identical
    # (self-matches excluded), table unchanged
    stream2 = spark.readStream.schema("doc_id long, text string").parquet(src)
    q2 = stream_ingest_dedup(
        stream2, table, index_path, str(tmp_path / "ck2"), query_name="replay"
    )
    q2.processAllAvailable()
    q2.stop()
    assert sorted(r["doc_id"] for r in table.snapshot().collect()) == [0, 1, 5]
    assert sorted(
        r["doc_id"] for r in spark.read.parquet(index_path).collect()
    ) == [0, 1, 5]


@pytest.mark.slow
def test_stream_ingest_dedup_window_index_substring_lane(spark, tmp_path):
    """stream_ingest_dedup(window_index_path=...): a later micro-batch
    doc QUOTING a k-token span from the standing corpus (whole-doc
    Jaccard far below the near threshold — only substring granularity
    can catch it) is dropped with the standing window index, never a
    corpus text rescan; unique docs land and append their own window
    rows; a full-source replay under a fresh checkpoint converges
    (the window lane anti-joins the batch's own ids by construction)."""
    from sending_weekly_daily_csv_reports_from_hudi_datalake_to_customers_via_email_using_glue_and_sns_or_ses_spark.sinks.upsert import (
        KeyedTable,
    )
    from sending_weekly_daily_csv_reports_from_hudi_datalake_to_customers_via_email_using_glue_and_sns_or_ses_spark.streaming.ingest import (
        stream_ingest_dedup,
    )

    span = " ".join(f"Q{j}" for j in range(8))
    src = str(tmp_path / "wsrc")
    # batch 1: the corpus doc carrying the span, plus an unrelated doc
    spark.createDataFrame(
        [
            (0, " ".join(f"a{j}" for j in range(10)) + f" {span} " + " ".join(f"b{j}" for j in range(10))),
            (1, " ".join(f"c{j}" for j in range(25))),
        ],
        "doc_id long, text string",
    ).coalesce(1).write.parquet(src)
    # batch 2: doc 10 quotes the span inside otherwise-unique text
    # (J ≈ 0.17 — the near lane at 0.5 cannot see it), doc 11 is fresh
    spark.createDataFrame(
        [
            (10, " ".join(f"x{j}" for j in range(10)) + f" {span} " + " ".join(f"y{j}" for j in range(10))),
            (11, " ".join(f"z{j}" for j in range(25))),
        ],
        "doc_id long, text string",
    ).coalesce(1).write.mode("append").parquet(src)

    table = KeyedTable(
        spark, str(tmp_path / "wtbl"), record_key="doc_id", precombine="doc_id"
    )
    index_path = str(tmp_path / "w_fp_index")
    window_path = str(tmp_path / "w_win_index")
    stream = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
    )
    q = stream_ingest_dedup(
        stream,
        table,
        index_path,
        str(tmp_path / "wck"),
        window_index_path=window_path,
        window_k=8,
    )
    q.processAllAvailable()
    q.stop()

    kept = sorted(r["doc_id"] for r in table.snapshot().collect())
    assert kept == [0, 1, 11]  # the quoting doc 10 was dropped
    widx = spark.read.parquet(window_path)
    assert sorted(set(r["doc_id"] for r in widx.collect())) == [0, 1, 11]

    # full-source replay, fresh checkpoint: decisions converge (doc 0
    # is not dropped against its own window rows — batch-id anti-join)
    stream2 = spark.readStream.schema("doc_id long, text string").parquet(src)
    q2 = stream_ingest_dedup(
        stream2,
        table,
        index_path,
        str(tmp_path / "wck2"),
        window_index_path=window_path,
        window_k=8,
        query_name="wreplay",
    )
    q2.processAllAvailable()
    q2.stop()
    assert sorted(r["doc_id"] for r in table.snapshot().collect()) == [0, 1, 11]
    assert sorted(
        set(r["doc_id"] for r in spark.read.parquet(window_path).collect())
    ) == [0, 1, 11]


@pytest.mark.slow
def test_stream_ingest_dedup_line_lane_rewrites(spark, tmp_path):
    """stream_ingest_dedup(line_index_path=...): the only lane that
    REWRITES — a boilerplate line arriving in batch 1 twice is cut
    from the non-canonical doc at ingest; a batch-2 doc carrying the
    now-indexed line lands CLEANED against the standing line index
    (no corpus rescan); fresh lines land intact; the line index rows
    reflect the text that actually landed; a full-source replay under
    a fresh checkpoint converges (batch-id anti-join exclusion)."""
    from sending_weekly_daily_csv_reports_from_hudi_datalake_to_customers_via_email_using_glue_and_sns_or_ses_spark.sinks.upsert import (
        KeyedTable,
    )
    from sending_weekly_daily_csv_reports_from_hudi_datalake_to_customers_via_email_using_glue_and_sns_or_ses_spark.streaming.ingest import (
        stream_ingest_dedup,
    )

    banner = "click here to accept cookies"
    src = str(tmp_path / "lsrc")
    # batch 1: docs 0 and 1 both carry the banner line (doc 0 is the
    # (doc, line) canonical and keeps it); texts otherwise unrelated
    spark.createDataFrame(
        [
            (0, f"{banner}\n" + " ".join(f"a{j}" for j in range(12))),
            (1, f"{banner}\n" + " ".join(f"b{j}" for j in range(12))),
        ],
        "doc_id long, text string",
    ).coalesce(1).write.parquet(src)
    # batch 2: doc 10 carries the standing banner + fresh content;
    # doc 11 is entirely fresh multi-line text
    spark.createDataFrame(
        [
            (10, " ".join(f"x{j}" for j in range(6)) + f"\n{banner}\n" + " ".join(f"y{j}" for j in range(6))),
            (11, "totally new line one\ntotally new line two"),
        ],
        "doc_id long, text string",
    ).coalesce(1).write.mode("append").parquet(src)

    table = KeyedTable(
        spark, str(tmp_path / "ltbl"), record_key="doc_id", precombine="doc_id"
    )
    index_path = str(tmp_path / "l_fp_index")
    line_path = str(tmp_path / "l_line_index")
    stream = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
    )
    q = stream_ingest_dedup(
        stream,
        table,
        index_path,
        str(tmp_path / "lck"),
        line_index_path=line_path,
    )
    q.processAllAvailable()
    q.stop()

    snap = {r["doc_id"]: r["text"] for r in table.snapshot().collect()}
    assert sorted(snap) == [0, 1, 10, 11]  # nothing dropped, only cut
    assert snap[0].startswith(banner)  # canonical keeps the line
    assert banner not in snap[1] and snap[1] == " ".join(
        f"b{j}" for j in range(12)
    )
    # batch 2: cut against the STANDING index (batch 2 alone has one
    # occurrence — only the union makes it hot)
    assert banner not in snap[10]
    assert snap[10] == (
        " ".join(f"x{j}" for j in range(6))
        + "\n"
        + " ".join(f"y{j}" for j in range(6))
    )
    assert snap[11] == "totally new line one\ntotally new line two"
    # the line index reflects LANDED text: doc 1/10 carry no banner row
    from sending_weekly_daily_csv_reports_from_hudi_datalake_to_customers_via_email_using_glue_and_sns_or_ses_spark.operators.dedup import (
        build_line_index,
    )

    lidx = spark.read.parquet(line_path)
    banner_key = build_line_index(
        spark.createDataFrame([(0, banner)], "doc_id long, text string")
    ).select("h1", "h2")
    carriers = sorted(
        r["doc_id"]
        for r in lidx.join(banner_key, ["h1", "h2"]).collect()
    )
    assert carriers == [0]

    # full-source replay under a fresh checkpoint: decisions converge
    # (each batch's docs are excluded from their own lookup by id)
    stream2 = spark.readStream.schema("doc_id long, text string").parquet(src)
    q2 = stream_ingest_dedup(
        stream2,
        table,
        index_path,
        str(tmp_path / "lck2"),
        line_index_path=line_path,
        query_name="lreplay",
    )
    q2.processAllAvailable()
    q2.stop()
    snap2 = {r["doc_id"]: r["text"] for r in table.snapshot().collect()}
    assert snap2 == snap
    lidx2 = spark.read.parquet(line_path)
    carriers2 = sorted(
        r["doc_id"]
        for r in lidx2.join(banner_key, ["h1", "h2"]).collect()
    )
    assert carriers2 == [0]


@pytest.mark.slow
def test_stream_ingest_window_lane_first_batch_and_partial_heal(
    spark, tmp_path
):
    """Two review-found holes, pinned closed: (a) the substring lane
    runs from the FIRST batch — a span owner and quoter arriving
    together before any index file exists still resolve (min-id
    keeper), instead of both slipping through; (b) a PARTIALLY
    committed window append (crash mid-append leaves a subset of a
    doc's window rows) is healed on replay — the row-granular
    anti-join appends exactly the missing remainder, no duplicates, no
    permanently orphaned windows."""
    from sending_weekly_daily_csv_reports_from_hudi_datalake_to_customers_via_email_using_glue_and_sns_or_ses_spark.operators.dedup import (
        build_window_index,
    )
    from sending_weekly_daily_csv_reports_from_hudi_datalake_to_customers_via_email_using_glue_and_sns_or_ses_spark.sinks.upsert import (
        KeyedTable,
    )
    from sending_weekly_daily_csv_reports_from_hudi_datalake_to_customers_via_email_using_glue_and_sns_or_ses_spark.streaming.ingest import (
        stream_ingest_dedup,
    )

    span = " ".join(f"P{j}" for j in range(8))
    owner = " ".join(f"a{j}" for j in range(10)) + f" {span} " + " ".join(
        f"b{j}" for j in range(10)
    )
    quoter = " ".join(f"x{j}" for j in range(10)) + f" {span} " + " ".join(
        f"y{j}" for j in range(10)
    )
    batch = spark.createDataFrame(
        [(0, owner), (10, quoter)], "doc_id long, text string"
    )
    src = str(tmp_path / "fb_src")
    batch.coalesce(1).write.parquet(src)

    # (a) no index file exists yet; owner and quoter share one batch
    table = KeyedTable(
        spark, str(tmp_path / "fb_tbl"), record_key="doc_id", precombine="doc_id"
    )
    window_path = str(tmp_path / "fb_win")
    stream = spark.readStream.schema("doc_id long, text string").parquet(src)
    q = stream_ingest_dedup(
        stream,
        table,
        str(tmp_path / "fb_fp"),
        str(tmp_path / "fb_ck"),
        window_index_path=window_path,
        window_k=8,
    )
    q.processAllAvailable()
    q.stop()
    assert sorted(r["doc_id"] for r in table.snapshot().collect()) == [0]

    # (b) partial-append heal: seed a window index holding only HALF
    # of doc 20's rows (the crash-mid-append state), then ingest a
    # batch containing doc 20 — the replay must append the remainder
    doc20 = " ".join(f"m{j}" for j in range(30))
    b2 = spark.createDataFrame([(20, doc20)], "doc_id long, text string")
    full_rows = sorted(
        map(tuple, build_window_index(b2, k=8).collect())
    )
    partial_path = str(tmp_path / "heal_win")
    part = spark.createDataFrame(
        full_rows[: len(full_rows) // 2],
        build_window_index(b2, k=8).schema,
    )
    part.write.parquet(partial_path)

    src2 = str(tmp_path / "heal_src")
    b2.coalesce(1).write.parquet(src2)
    table2 = KeyedTable(
        spark, str(tmp_path / "heal_tbl"), record_key="doc_id",
        precombine="doc_id",
    )
    stream2 = spark.readStream.schema("doc_id long, text string").parquet(src2)
    q2 = stream_ingest_dedup(
        stream2,
        table2,
        str(tmp_path / "heal_fp"),
        str(tmp_path / "heal_ck"),
        window_index_path=partial_path,
        window_k=8,
        query_name="heal",
    )
    q2.processAllAvailable()
    q2.stop()
    # doc 20 landed (its own partial rows are batch-id-excluded from
    # the lookup) and its index rows are now COMPLETE with no dups
    assert [r["doc_id"] for r in table2.snapshot().collect()] == [20]
    got_rows = sorted(
        map(tuple, spark.read.parquet(partial_path).collect())
    )
    assert got_rows == full_rows


def test_stream_ingest_dedup_replay_sibling_near_dup(spark, tmp_path):
    """Crash window between index append and table commit, with a
    WITHIN-BATCH near-dup pair: the replayed batch must not drop a doc
    because it band-matches its same-batch sibling's freshly-appended
    index row. The lookup path excludes index rows tagged with this
    (checkpoint, batch_id), so a replay sees exactly the pre-batch
    index and reaches the original decisions (keep both — within-batch
    near-dups are out of scope by contract)."""
    from pyspark.sql import functions as F

    from sending_weekly_daily_csv_reports_from_hudi_datalake_to_customers_via_email_using_glue_and_sns_or_ses_spark.operators.dedup import (
        build_corpus_index,
    )
    from sending_weekly_daily_csv_reports_from_hudi_datalake_to_customers_via_email_using_glue_and_sns_or_ses_spark.sinks.upsert import (
        KeyedTable,
    )
    from sending_weekly_daily_csv_reports_from_hudi_datalake_to_customers_via_email_using_glue_and_sns_or_ses_spark.streaming.ingest import (
        stream_ingest_dedup,
    )

    def txt(i):
        return " ".join(f"w{i}x{j}" for j in range(30))

    near = txt(10).split()
    near[29] = "CHANGED"
    batch = spark.createDataFrame(
        [(10, txt(10)), (11, " ".join(near))], "doc_id long, text string"
    )
    src = str(tmp_path / "src")
    batch.coalesce(1).write.parquet(src)

    # simulate the partial original run: index rows appended WITH this
    # lineage's (checkpoint, batch 0) tag, no table commit, no batch-id
    # marker — exactly what the sink leaves behind on a crash
    from sending_weekly_daily_csv_reports_from_hudi_datalake_to_customers_via_email_using_glue_and_sns_or_ses_spark.streaming.ingest import (
        _canon_checkpoint,
    )

    index_path = str(tmp_path / "dedup_index")
    build_corpus_index(batch).select(
        "*",
        F.lit(_canon_checkpoint(str(tmp_path / "ck"))).alias("__src_ck"),
        F.lit(0).cast("long").alias("__src_batch"),
    ).write.parquet(index_path)

    table = KeyedTable(
        spark, str(tmp_path / "tbl"), record_key="doc_id", precombine="doc_id"
    )
    stream = (
        spark.readStream.schema("doc_id long, text string").parquet(src)
    )
    # the replay spells the SAME checkpoint with a trailing slash — the
    # tag comparison must canonicalize, or the exclusion silently skips
    q = stream_ingest_dedup(stream, table, index_path, str(tmp_path / "ck") + "/")
    q.processAllAvailable()
    q.stop()

    # both docs land (11 was NOT dropped against 10's orphan index row)
    assert sorted(r["doc_id"] for r in table.snapshot().collect()) == [10, 11]
    # and their index rows were not appended a second time
    assert sorted(
        r["doc_id"] for r in spark.read.parquet(index_path).collect()
    ) == [10, 11]


def test_canon_checkpoint_case_and_recovery_under_new_checkpoint(
    spark, tmp_path
):
    """Two lineage-tag rules from the r6 ADVICE review: (a) the URI
    authority is case-insensitive, so hdfs://HOST/ck and hdfs://host/ck
    must canonicalize identically (urlparse lowercases only the
    scheme); (b) recovery under a DIFFERENT checkpoint dir after a
    crash between index append and table commit must not drop each doc
    against its own orphan index row — exact self-matches are excluded
    from the lookup on top of the tag scoping."""
    from sending_weekly_daily_csv_reports_from_hudi_datalake_to_customers_via_email_using_glue_and_sns_or_ses_spark.operators.dedup import (
        build_corpus_index,
    )
    from sending_weekly_daily_csv_reports_from_hudi_datalake_to_customers_via_email_using_glue_and_sns_or_ses_spark.sinks.upsert import (
        KeyedTable,
    )
    from sending_weekly_daily_csv_reports_from_hudi_datalake_to_customers_via_email_using_glue_and_sns_or_ses_spark.streaming.ingest import (
        _canon_checkpoint,
        stream_ingest_dedup,
    )

    assert _canon_checkpoint("hdfs://NAMENODE:9000/ck") == _canon_checkpoint(
        "hdfs://namenode:9000/ck/"
    )
    assert _canon_checkpoint("file:///tmp/ck") == _canon_checkpoint("/tmp/ck")

    def txt(i):
        # fully disjoint token streams: the docs must not near-match
        # EACH OTHER, so the only index hits are the self-matches the
        # exclusion is for
        return " ".join(f"w{i}_{j}" for j in range(24))

    batch = spark.createDataFrame(
        [(20, txt(20)), (21, txt(21))], "doc_id long, text string"
    )
    src = str(tmp_path / "src2")
    batch.coalesce(1).write.parquet(src)

    # orphan state: index rows tagged by the ORIGINAL checkpoint's
    # batch 0, but no table commit and no batch-id marker — then the
    # operator resumes ingestion under a DIFFERENT checkpoint dir, so
    # the tags no longer match and only the self-match exclusion
    # stands between each doc and a permanent silent drop
    index_path = str(tmp_path / "dedup_index2")
    build_corpus_index(batch).select(
        "*",
        F.lit(_canon_checkpoint(str(tmp_path / "ck_old"))).alias("__src_ck"),
        F.lit(0).cast("long").alias("__src_batch"),
    ).write.parquet(index_path)

    table = KeyedTable(
        spark, str(tmp_path / "tbl2"), record_key="doc_id", precombine="doc_id"
    )
    stream = spark.readStream.schema("doc_id long, text string").parquet(src)
    q = stream_ingest_dedup(
        stream, table, index_path, str(tmp_path / "ck_new")
    )
    q.processAllAvailable()
    q.stop()

    # the docs land despite their own orphan index rows (the two docs
    # are genuinely distinct texts, so neither matches the other's row)
    assert sorted(r["doc_id"] for r in table.snapshot().collect()) == [20, 21]
    # and the anti-join kept the index single-rowed per doc
    assert sorted(
        r["doc_id"] for r in spark.read.parquet(index_path).collect()
    ) == [20, 21]


def test_dedupe_stream_watermark_exactly_once(spark, tmp_path):
    """The built-in bounded-state dedup: the same events landed twice
    (duplicates arrive within the watermark horizon) emit exactly once
    per event_id, matching the batch distinct."""
    from sending_weekly_daily_csv_reports_from_hudi_datalake_to_customers_via_email_using_glue_and_sns_or_ses_spark.streaming.windows import (
        dedupe_stream_watermark,
    )

    batch = load_table(spark, SF, "events").select("event_id", "user_id", "ts")
    path = str(tmp_path / "dup_events")
    batch.write.parquet(path)
    batch.write.mode("append").parquet(path)

    stream = spark.readStream.schema(batch.schema).parquet(path)
    out = run_stream_on_batch(
        dedupe_stream_watermark(stream, keys=["event_id"]),
        "wm_dedupe_out",
    )
    n_unique = batch.select("event_id").distinct().count()
    emitted = out.collect()
    assert len(emitted) == n_unique
    assert len({r["event_id"] for r in emitted}) == n_unique


@pytest.mark.slow
def test_stream_upsert_inline_services(spark, tmp_path):
    """service_policy on the streaming sink: a MOR table ingesting
    micro-batches compacts at the delta-commit threshold (read cost
    stays flat) and the result equals the no-services ingest."""
    from sending_weekly_daily_csv_reports_from_hudi_datalake_to_customers_via_email_using_glue_and_sns_or_ses_spark import (
        fixtures,
    )
    from sending_weekly_daily_csv_reports_from_hudi_datalake_to_customers_via_email_using_glue_and_sns_or_ses_spark.sinks.services import (
        ServicePolicy,
        delta_commits_above_base,
    )
    from sending_weekly_daily_csv_reports_from_hudi_datalake_to_customers_via_email_using_glue_and_sns_or_ses_spark.sinks.upsert import (
        KeyedTable,
    )
    from sending_weekly_daily_csv_reports_from_hudi_datalake_to_customers_via_email_using_glue_and_sns_or_ses_spark.streaming.ingest import (
        stream_upsert,
    )

    src = str(tmp_path / "srcsvc")
    for b in range(4):
        fixtures.customers(spark, 15, batch=b).write.mode(
            "append"
        ).parquet(src)
    table = KeyedTable(
        spark,
        str(tmp_path / "tblsvc"),
        record_key="customer_id",
        precombine="created_at",
        table_type="MERGE_ON_READ",
    )
    stream = spark.readStream.schema(
        fixtures.customers(spark, 1).schema
    ).option("maxFilesPerTrigger", "1").parquet(src)
    q = stream_upsert(
        stream,
        table,
        str(tmp_path / "cksvc"),
        service_policy=ServicePolicy(compact_after_delta_commits=2),
    )
    q.processAllAvailable()
    q.stop()
    # every ingested batch above the threshold got folded back
    assert delta_commits_above_base(table) < 2
    snap = {r["customer_id"]: r["created_at"]
            for r in table.snapshot().collect()}
    want = {r["customer_id"]: r["created_at"]
            for r in fixtures.customers(spark, 15, batch=3).collect()}
    assert snap == want


def test_stream_incremental_delivers_each_commit_once(spark, tmp_path):
    """streaming/source.py: the file-source checkpoint is the
    incremental cursor — two commits stream in full, a third arrives
    as a delta, and a restart on the same checkpoint re-delivers
    nothing (foreachBatch sink: the one that supports recovery)."""
    from sending_weekly_daily_csv_reports_from_hudi_datalake_to_customers_via_email_using_glue_and_sns_or_ses_spark.sinks.upsert import (
        KeyedTable,
    )
    from sending_weekly_daily_csv_reports_from_hudi_datalake_to_customers_via_email_using_glue_and_sns_or_ses_spark.streaming.source import (
        stream_incremental,
    )

    t = KeyedTable(
        spark, str(tmp_path / "src"), record_key="k", precombine="pre"
    )
    c1 = t.upsert(
        spark.createDataFrame([(1, 1, "a"), (2, 1, "b")], "k long, pre long, v string")
    )
    c2 = t.upsert(
        spark.createDataFrame([(3, 1, "c")], "k long, pre long, v string")
    )
    ck = str(tmp_path / "ck")
    seen: list = []

    def sink(batch, _bid):
        seen.extend(
            (r["k"], r["_commit_time"])
            for r in batch.select("k", "_commit_time").collect()
        )

    stream = stream_incremental(spark, t.root)
    assert stream.isStreaming
    q = (
        stream.writeStream.foreachBatch(sink)
        .option("checkpointLocation", ck)
        .start()
    )
    q.processAllAvailable()
    assert set(seen) == {(1, c1), (2, c1), (3, c2)}
    # a NEW commit arrives as a delta into the running stream
    c3 = t.upsert(
        spark.createDataFrame([(4, 1, "d")], "k long, pre long, v string")
    )
    q.processAllAvailable()
    assert len(seen) == 4 and (4, c3) in set(seen)
    q.stop()
    # restart on the SAME checkpoint: nothing re-delivered; only the
    # post-restart commit arrives
    seen2: list = []

    def sink2(batch, _bid):
        seen2.extend((r["k"],) for r in batch.select("k").collect())

    q2 = (
        stream_incremental(spark, t.root)
        .writeStream.foreachBatch(sink2)
        .option("checkpointLocation", ck)
        .start()
    )
    q2.processAllAvailable()
    assert seen2 == []
    t.upsert(
        spark.createDataFrame([(5, 1, "e")], "k long, pre long, v string")
    )
    q2.processAllAvailable()
    assert seen2 == [(5,)]
    q2.stop()


def test_stream_incremental_validates_root(spark, tmp_path):
    from sending_weekly_daily_csv_reports_from_hudi_datalake_to_customers_via_email_using_glue_and_sns_or_ses_spark.streaming.source import (
        stream_incremental,
    )

    with pytest.raises(ValueError, match="no commit log"):
        stream_incremental(spark, str(tmp_path / "nope"))


def test_stream_incremental_sees_evolved_schema(spark, tmp_path):
    """A widening upsert evolves the committed schema; a stream opened
    AFTER it reads old commits with the new column NULL-filled (the
    explicit-schema contract read_commit_log pins)."""
    from sending_weekly_daily_csv_reports_from_hudi_datalake_to_customers_via_email_using_glue_and_sns_or_ses_spark.sinks.upsert import (
        KeyedTable,
    )
    from sending_weekly_daily_csv_reports_from_hudi_datalake_to_customers_via_email_using_glue_and_sns_or_ses_spark.streaming.source import (
        stream_incremental,
    )

    t = KeyedTable(
        spark, str(tmp_path / "ev"), record_key="k", precombine="pre"
    )
    t.upsert(spark.createDataFrame([(1, 1)], "k long, pre long"))
    t.upsert(
        spark.createDataFrame([(2, 1, "x")], "k long, pre long, extra string")
    )
    q = (
        stream_incremental(spark, t.root)
        .writeStream.format("memory")
        .queryName("ev_stream")
        .option("checkpointLocation", str(tmp_path / "ev_ck"))
        .start()
    )
    q.processAllAvailable()
    rows = {
        r["k"]: r["extra"]
        for r in spark.sql("select * from ev_stream").collect()
    }
    assert rows == {1: None, 2: "x"}
    q.stop()


def test_stream_cdc_op_parity_with_batch_cdc(spark, tmp_path):
    """stream_cdc (r8): the streamed op set — upsert rows from the log,
    delete keys from the tombstone log — must equal batch
    KeyedTable.cdc's (op, key, commit) set over a delete-heavy history
    (suppress_unchanged=False: the stream's 'u' lane is the file-level
    notion; batch 'i'/'u' both map to streamed 'u'), and a replica
    maintained by applying the streamed ops in commit order must equal
    the source snapshot."""
    from sending_weekly_daily_csv_reports_from_hudi_datalake_to_customers_via_email_using_glue_and_sns_or_ses_spark.sinks.upsert import (
        KeyedTable,
    )
    from sending_weekly_daily_csv_reports_from_hudi_datalake_to_customers_via_email_using_glue_and_sns_or_ses_spark.streaming.source import (
        stream_cdc,
    )

    sch = "k long, pre long, v string"
    t = KeyedTable(
        spark, str(tmp_path / "cdc_src"), record_key="k", precombine="pre"
    )
    t.upsert(
        spark.createDataFrame(
            [(1, 1, "a"), (2, 1, "b"), (3, 1, "c")], sch
        )
    )
    t.delete(spark.createDataFrame([(2,), (3,)], "k long"))
    t.upsert(  # re-insert a deleted key + a merge-losing row for k=1
        spark.createDataFrame([(3, 2, "c2"), (1, 0, "stale")], sch)
    )
    t.delete(spark.createDataFrame([(1,)], "k long"))
    t.upsert(spark.createDataFrame([(4, 1, "d")], sch))

    rows: list = []

    def sink(batch, _bid):
        rows.extend(batch.collect())

    q = (
        stream_cdc(spark, t.root)
        .writeStream.foreachBatch(sink)
        .option("checkpointLocation", str(tmp_path / "cdc_ck"))
        .start()
    )
    q.processAllAvailable()
    q.stop()

    streamed_ops = {
        (r["_change_op"], r["k"], r["_commit_time"]) for r in rows
    }
    batch_ops = {
        ("u" if r["_change_op"] in ("i", "u") else "d", r["k"],
         r["_commit_time"])
        for r in t.cdc(suppress_unchanged=False).collect()
    }
    assert streamed_ops == batch_ops
    # delete rows carry the key and NULL payload; upsert rows carry the
    # raw log payload (the merge-LOSING row streams as written)
    assert all(
        r["v"] is None and r["pre"] is None
        for r in rows
        if r["_change_op"] == "d"
    )
    assert ("stale", 0) in {
        (r["v"], r["pre"]) for r in rows if r["_change_op"] == "u"
    }

    # replica parity: apply streamed ops commit-by-commit
    replica = KeyedTable(
        spark, str(tmp_path / "cdc_replica"), record_key="k",
        precombine="pre",
    )
    for commit in sorted({r["_commit_time"] for r in rows}):
        batch_rows = [r for r in rows if r["_commit_time"] == commit]
        ups = [r for r in batch_rows if r["_change_op"] == "u"]
        dels = [r for r in batch_rows if r["_change_op"] == "d"]
        if ups:
            replica.upsert(
                spark.createDataFrame(
                    [(r["k"], r["pre"], r["v"]) for r in ups], sch
                )
            )
        if dels:
            replica.delete(
                spark.createDataFrame([(r["k"],) for r in dels], "k long")
            )
    src_state = sorted(
        (r["k"], r["pre"], r["v"]) for r in t.snapshot().collect()
    )
    rep_state = sorted(
        (r["k"], r["pre"], r["v"]) for r in replica.snapshot().collect()
    )
    assert rep_state == src_state == [(3, 2, "c2"), (4, 1, "d")]


def test_stream_cdc_live_deletes_and_checkpoint(spark, tmp_path):
    """Deletes landing AFTER the stream started are delivered (the
    tombstone glob discovers new commit dirs), a no-delete table
    streams cleanly (the lane exists before the first delete), and a
    restart on the same checkpoint re-delivers nothing from either
    lane."""
    from sending_weekly_daily_csv_reports_from_hudi_datalake_to_customers_via_email_using_glue_and_sns_or_ses_spark.sinks.upsert import (
        KeyedTable,
    )
    from sending_weekly_daily_csv_reports_from_hudi_datalake_to_customers_via_email_using_glue_and_sns_or_ses_spark.streaming.source import (
        stream_cdc,
    )

    sch = "k long, pre long, v string"
    t = KeyedTable(
        spark, str(tmp_path / "live_src"), record_key="k", precombine="pre"
    )
    c1 = t.upsert(spark.createDataFrame([(1, 1, "a"), (2, 1, "b")], sch))
    ck = str(tmp_path / "live_ck")
    seen: list = []

    def sink(batch, _bid):
        seen.extend(
            (r["_change_op"], r["k"], r["_commit_time"])
            for r in batch.collect()
        )

    q = (
        stream_cdc(spark, t.root)
        .writeStream.foreachBatch(sink)
        .option("checkpointLocation", ck)
        .start()
    )
    q.processAllAvailable()
    assert set(seen) == {("u", 1, c1), ("u", 2, c1)}  # no-delete table
    # a delete lands on the RUNNING stream
    c2 = t.delete(spark.createDataFrame([(2,)], "k long"))
    q.processAllAvailable()
    assert ("d", 2, c2) in set(seen) and len(seen) == 3
    q.stop()
    # restart: nothing re-delivered; only post-restart ops arrive
    seen2: list = []

    def sink2(batch, _bid):
        seen2.extend((r["_change_op"], r["k"]) for r in batch.collect())

    q2 = (
        stream_cdc(spark, t.root)
        .writeStream.foreachBatch(sink2)
        .option("checkpointLocation", ck)
        .start()
    )
    q2.processAllAvailable()
    assert seen2 == []
    t.delete(spark.createDataFrame([(1,)], "k long"))
    q2.processAllAvailable()
    assert seen2 == [("d", 1)]
    q2.stop()


def test_stream_cdc_replace_commits_stream_as_r_rows(spark, tmp_path):
    """stream_cdc replace lane (r8 review): an insert_overwrite_table
    commit must surface as an explicit 'r' row — its batch ALSO
    streams as 'u' rows, and applying those alone silently diverges a
    replica (stale keys survive the replace; replacement rows that
    lose the precombine merge lose again). The log-shipping recipe —
    per commit: clear state on 'r', then apply that commit's 'u'
    rows — must reach exact source parity across the replace."""
    from sending_weekly_daily_csv_reports_from_hudi_datalake_to_customers_via_email_using_glue_and_sns_or_ses_spark.sinks.upsert import (
        KeyedTable,
    )
    from sending_weekly_daily_csv_reports_from_hudi_datalake_to_customers_via_email_using_glue_and_sns_or_ses_spark.streaming.source import (
        stream_cdc,
    )

    sch = "k long, pre long, v string"
    t = KeyedTable(
        spark, str(tmp_path / "rep_src"), record_key="k", precombine="pre"
    )
    t.upsert(
        spark.createDataFrame([(1, 5, "a"), (2, 5, "b")], sch)
    )
    # the replace: key 2 vanishes, key 1's replacement row has a LOWER
    # precombine (would lose an upsert merge — the divergence trap)
    rep_commit = t.overwrite(
        spark.createDataFrame([(1, 0, "z"), (9, 1, "new")], sch)
    )
    t.upsert(spark.createDataFrame([(4, 1, "d")], sch))

    rows: list = []

    def sink(batch, _bid):
        rows.extend(batch.collect())

    q = (
        stream_cdc(spark, t.root)
        .writeStream.foreachBatch(sink)
        .option("checkpointLocation", str(tmp_path / "rep_ck"))
        .start()
    )
    q.processAllAvailable()
    q.stop()

    r_rows = [r for r in rows if r["_change_op"] == "r"]
    assert [r["_commit_time"] for r in r_rows] == [rep_commit]
    assert all(r["k"] is None and r["v"] is None for r in r_rows)

    # replica recipe: per commit, 'r' clears state, then 'u' applies
    state: dict = {}
    for commit in sorted({r["_commit_time"] for r in rows}):
        batch_rows = [r for r in rows if r["_commit_time"] == commit]
        if any(r["_change_op"] == "r" for r in batch_rows):
            state.clear()
        for r in batch_rows:
            if r["_change_op"] == "u":
                cur = state.get(r["k"])
                if cur is None or r["pre"] >= cur[0]:
                    state[r["k"]] = (r["pre"], r["v"])
            elif r["_change_op"] == "d":
                state.pop(r["k"], None)
    src = sorted(
        (r["k"], r["pre"], r["v"]) for r in t.snapshot().collect()
    )
    rep = sorted((k, p, v) for k, (p, v) in state.items())
    assert rep == src == [(1, 0, "z"), (4, 1, "d"), (9, 1, "new")]


def test_stream_cdc_replace_lane_is_publish_gated(spark, tmp_path):
    """ADVICE r8 (medium): an ABORTED overwrite — log rows, snapshot
    and timeline marker written, pointer never flipped — must NOT
    stream an 'r' row: the phantom would make replicas WIPE state and
    apply the rolled-back batch. The retried (published) overwrite
    streams exactly one 'r'; and a marker lost in the flip→marker
    crash window is backfilled at stream open."""
    import os

    from sending_weekly_daily_csv_reports_from_hudi_datalake_to_customers_via_email_using_glue_and_sns_or_ses_spark.sinks.upsert import (
        KeyedTable,
    )
    from sending_weekly_daily_csv_reports_from_hudi_datalake_to_customers_via_email_using_glue_and_sns_or_ses_spark.streaming.source import (
        stream_cdc,
    )

    sch = "k long, pre long, v string"
    t = KeyedTable(
        spark, str(tmp_path / "gate_src"), record_key="k", precombine="pre"
    )
    t.upsert(spark.createDataFrame([(1, 5, "a"), (2, 5, "b")], sch))

    # simulate a CRASHED overwrite: every pre-flip artifact exists
    # (snapshot, log rows, timeline marker) but the pointer never moved
    from pyspark.sql import functions as F

    orphan = t._new_commit_id()
    batch = spark.createDataFrame([(9, 0, "aborted")], sch).withColumn(
        "_commit_time", F.lit(orphan)
    )
    t._write_snapshot(batch, orphan)
    t._write_log(batch, orphan)
    t._record_instant(orphan, "overwrite")

    rows: list = []

    def sink(b, _bid):
        rows.extend(b.collect())

    def run_stream():
        q = (
            stream_cdc(spark, t.root)
            .writeStream.foreachBatch(sink)
            .option("checkpointLocation", str(tmp_path / "gate_ck"))
            .start()
        )
        q.processAllAvailable()
        q.stop()

    run_stream()
    # the aborted batch's 'u' rows may stream (the documented phantom
    # caveat) but no 'r' row exists for the unpublished commit
    assert [r for r in rows if r["_change_op"] == "r"] == []

    # the retry: a real transaction reaps the orphan and publishes a
    # fresh replace commit — exactly one 'r', the published commit's
    rep = t.overwrite(spark.createDataFrame([(1, 0, "z")], sch))
    rows.clear()
    run_stream()
    r_rows = [r for r in rows if r["_change_op"] == "r"]
    assert [r["_commit_time"] for r in r_rows] == [rep]

    # flip→marker crash window: lose the marker, a fresh overwrite's
    # marker plus stream-open backfill must restore BOTH
    rep2 = t.overwrite(spark.createDataFrame([(3, 0, "w")], sch))
    os.remove(os.path.join(t._replace_marker_dir(), f"{rep2}.json"))
    rows.clear()
    run_stream()
    assert sorted(
        r["_commit_time"] for r in rows if r["_change_op"] == "r"
    ) == [rep2]


def test_stream_incremental_serves_renamed_columns(spark, tmp_path):
    """A renamed table's commit log holds old-name files and new-name
    files side by side; the streaming source must serve BOTH vintages
    under the current logical name (the batch reader's rename mapping,
    applied to the streaming scan)."""
    from sending_weekly_daily_csv_reports_from_hudi_datalake_to_customers_via_email_using_glue_and_sns_or_ses_spark.sinks.upsert import (
        KeyedTable,
    )
    from sending_weekly_daily_csv_reports_from_hudi_datalake_to_customers_via_email_using_glue_and_sns_or_ses_spark.streaming.source import (
        stream_incremental,
    )

    t = KeyedTable(
        spark, str(tmp_path / "rnstream"), record_key="k", precombine="pre"
    )
    t.upsert(
        spark.createDataFrame([(1, 1, "old-vintage")], "k int, pre int, v string")
    )
    t.alter_rename_column("v", "label")
    t.upsert(
        spark.createDataFrame(
            [(2, 1, "new-vintage")], "k int, pre int, label string"
        )
    )
    rows: list = []
    q = (
        stream_incremental(spark, t.root)
        .writeStream.foreachBatch(lambda b, _i: rows.extend(b.collect()))
        .option("checkpointLocation", str(tmp_path / "rnck"))
        .start()
    )
    q.processAllAvailable()
    q.stop()
    got = sorted((r["k"], r["label"]) for r in rows)
    assert got == [(1, "old-vintage"), (2, "new-vintage")]
    assert all("v" not in r.asDict() for r in rows)


@pytest.mark.slow
def test_stream_cdc_bucketed_op_parity_and_replace(spark, tmp_path):
    """r10 (VERDICT r9 #6): stream_cdc over a BUCKETED root — the 'u'
    lane reads the shared log, the 'd' lane the (new) bucketed
    tombstones, the 'r' lane the (new) publish-gated replace markers —
    and the streamed op set must equal batch BucketedTable.cdc's over
    the delete-heavy prefix, with the overwrite streaming as an 'r'
    row replicas wipe on."""
    from sending_weekly_daily_csv_reports_from_hudi_datalake_to_customers_via_email_using_glue_and_sns_or_ses_spark.sinks.filegroups import (
        BucketedTable,
    )
    from sending_weekly_daily_csv_reports_from_hudi_datalake_to_customers_via_email_using_glue_and_sns_or_ses_spark.streaming.source import (
        stream_cdc,
    )

    sch = "k long, pre long, v string"
    t = BucketedTable(
        spark, str(tmp_path / "bsrc"), record_key="k", precombine="pre",
        num_buckets=4, keep_versions=10,
    )
    t.upsert(spark.createDataFrame(
        [(1, 1, "a"), (2, 1, "b"), (3, 1, "c")], sch))
    t.delete(spark.createDataFrame([(2,), (3,)], "k long"))
    t.upsert(spark.createDataFrame([(3, 2, "c2"), (1, 0, "stale")], sch))
    pre_replace = t.latest_commit()
    t.overwrite(spark.createDataFrame([(7, 1, "z"), (8, 1, "w")], sch))
    t.upsert(spark.createDataFrame([(8, 2, "w2")], sch))

    rows: list = []

    def sink(batch, _bid):
        rows.extend(batch.collect())

    q = (
        stream_cdc(spark, t.root)
        .writeStream.foreachBatch(sink)
        .option("checkpointLocation", str(tmp_path / "bck"))
        .start()
    )
    q.processAllAvailable()
    q.stop()

    # op-set parity over the pre-replace prefix (batch CDC's window)
    streamed_pre = {
        (r["_change_op"], r["k"], r["_commit_time"])
        for r in rows
        if r["_commit_time"] <= pre_replace and r["_change_op"] != "r"
    }
    batch_pre = {
        ("u" if r["_change_op"] in ("i", "u") else "d", r["k"],
         r["_commit_time"])
        for r in t.cdc(end=pre_replace, suppress_unchanged=False).collect()
    }
    assert streamed_pre == batch_pre
    # the overwrite streamed exactly one 'r' row (publish-gated marker)
    r_rows = [r for r in rows if r["_change_op"] == "r"]
    assert len(r_rows) == 1 and r_rows[0]["k"] is None
    r_commit = r_rows[0]["_commit_time"]

    # wipe-then-apply replica over the full stream equals the source
    replica = BucketedTable(
        spark, str(tmp_path / "brep"), record_key="k", precombine="pre",
        num_buckets=4,
    )
    for commit in sorted({r["_commit_time"] for r in rows}):
        batch_rows = [r for r in rows if r["_commit_time"] == commit]
        if commit == r_commit:
            # 'r' first: clear state, then apply the same commit's 'u'
            live = replica.snapshot()
            if live is not None and live.count():
                replica.delete(live.select("k"))
        ups = [r for r in batch_rows if r["_change_op"] == "u"]
        dels = [r for r in batch_rows if r["_change_op"] == "d"]
        if ups:
            replica.upsert(spark.createDataFrame(
                [(r["k"], r["pre"], r["v"]) for r in ups], sch))
        if dels:
            replica.delete(spark.createDataFrame(
                [(r["k"],) for r in dels], "k long"))
    src_state = sorted(
        (r["k"], r["pre"], r["v"]) for r in t.snapshot().collect())
    rep_state = sorted(
        (r["k"], r["pre"], r["v"]) for r in replica.snapshot().collect())
    assert rep_state == src_state == [(7, 1, "z"), (8, 2, "w2")]


def test_stream_incremental_serves_bucketed_renamed_and_evolved(
    spark, tmp_path
):
    """r10 review: the streaming schema lane is engine-aware — a
    BUCKETED table's committed schema lives in its manifests, so a
    rename + an added column must stream under the current logical
    names (old-vintage log files folded through their prior physical
    name, pre-evolution rows NULL-filled), exactly like the KeyedTable
    lane."""
    from sending_weekly_daily_csv_reports_from_hudi_datalake_to_customers_via_email_using_glue_and_sns_or_ses_spark.sinks.filegroups import (
        BucketedTable,
    )
    from sending_weekly_daily_csv_reports_from_hudi_datalake_to_customers_via_email_using_glue_and_sns_or_ses_spark.streaming.source import (
        stream_incremental,
    )

    t = BucketedTable(
        spark, str(tmp_path / "brn"), record_key="k", precombine="pre",
        num_buckets=4,
    )
    t.upsert(spark.createDataFrame(
        [(1, 1, "old-vintage")], "k int, pre int, v string"))
    t.alter_rename_column("v", "label")
    t.upsert(spark.createDataFrame(
        [(2, 1, "new-vintage", 7)],
        "k int, pre int, label string, extra int"))
    rows: list = []
    q = (
        stream_incremental(spark, t.root)
        .writeStream.foreachBatch(lambda b, _i: rows.extend(b.collect()))
        .option("checkpointLocation", str(tmp_path / "brnck"))
        .start()
    )
    q.processAllAvailable()
    q.stop()
    got = sorted((r["k"], r["label"], r["extra"]) for r in rows)
    assert got == [(1, "old-vintage", None), (2, "new-vintage", 7)]
    assert all("v" not in r.asDict() for r in rows)
