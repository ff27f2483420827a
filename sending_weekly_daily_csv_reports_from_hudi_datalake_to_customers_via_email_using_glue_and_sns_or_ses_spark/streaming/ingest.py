"""Streaming ingest into the keyed table — the continuous version of the
reference's batch upsert loop (generate_hudi_table.py run repeatedly),
i.e. the Hudi streaming-ingest (DeltaStreamer) pattern rebuilt on
Structured Streaming.

Replay protection: each applied micro-batch's id is recorded in the
table's durable commit metadata (timeline marker — the DeltaStreamer
checkpoint-in-commit pattern), and the sink SKIPS a batch whose id is
already recorded. A crash between publish and the marker write can
still replay one batch (at-least-once); the snapshot converges anyway
because the precombine merge picks identical winners — only the change
log would carry the one replayed batch twice, and only in that narrow
window. Crash-before-publish replays cleanly (nothing was committed).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql.streaming import StreamingQuery

from ..sinks.upsert import KeyedTable


def applied_batch_ids(table: KeyedTable, checkpoint_dir: str) -> set[int]:
    """Micro-batch ids recorded in the table's commit metadata FOR THIS
    stream. Batch ids are only unique within one checkpoint lineage —
    a fresh stream (new checkpoint) also numbers from 0 with different
    data, so the marker must be scoped by the checkpoint identity or a
    new stream's first batches would be wrongly skipped."""
    return {
        m["batch_id"]
        for m in table._timeline_meta().values()
        if "batch_id" in m and m.get("checkpoint") == checkpoint_dir
    }


def stream_upsert(
    stream_df: DataFrame,
    table: KeyedTable,
    checkpoint_dir: str,
    query_name: str = "stream_upsert",
    service_policy=None,  # sinks.services.ServicePolicy | None
) -> StreamingQuery:
    """Continuously upsert a stream into a KeyedTable.

    Exactly-once reasoning: Structured Streaming replays an unacked
    micro-batch after failure; the batch-id check above skips batches
    whose commit already landed, and for the narrow publish-vs-marker
    crash window KeyedTable.upsert is idempotent for identical rows
    (precombine picks the same winners), so the snapshot converges.
    The streaming checkpoint_dir provides source-offset tracking.

    ``service_policy`` runs inline table services after each applied
    batch (the DeltaStreamer ``--enable-compaction``/clustering
    pattern — sinks/services.py): MOR log windows fold back into a
    base at the delta-commit threshold and clustering re-stamps the
    layout + skipping indexes, so a long-running ingest keeps read
    cost flat instead of accreting log to merge. Services derive
    their triggers from durable table state, so a crashed run resumes
    cleanly and a REPLAYED batch (skipped above) never re-triggers
    them."""

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        if batch_id in applied_batch_ids(table, checkpoint_dir):
            return  # replayed micro-batch: its commit already landed
        if not batch_df.isEmpty():
            table.upsert(
                batch_df,
                instant_meta={
                    "batch_id": batch_id,
                    "checkpoint": checkpoint_dir,
                },
            )
            if service_policy is not None:
                from ..sinks.services import run_table_services

                run_table_services(table, service_policy)

    return (
        stream_df.writeStream.foreachBatch(sink)
        .option("checkpointLocation", checkpoint_dir)
        .queryName(query_name)
        .start()
    )


def _canon_checkpoint(checkpoint_dir: str) -> str:
    """Canonical form of a checkpoint path for the index-row tags: a
    replayed batch may spell the SAME checkpoint differently (relative
    vs absolute, trailing slash, file:// URI) and a raw string compare
    would then silently skip the tag exclusion — re-opening the exact
    sibling-drop hole the tags close. URI-aware, same rules as
    connected_components' checkpoint-dir conflict check."""
    import os
    from urllib.parse import urlparse

    u = urlparse(checkpoint_dir)
    if (u.scheme or "file") == "file" and not u.netloc:
        return os.path.normpath(os.path.abspath(u.path))
    # authorities are case-insensitive (urlparse lowercases only the
    # scheme): hdfs://HOST/ck and hdfs://host/ck are the same lineage,
    # and differing tags would silently skip the replay exclusion
    return (
        f"{u.scheme}://{u.netloc.lower()}"
        f"{os.path.normpath(u.path.rstrip('/') or '/')}"
    )


def stream_ingest_dedup(
    stream_df: DataFrame,
    table: KeyedTable,
    index_path: str,
    checkpoint_dir: str,
    threshold: float = 0.5,
    id_col: str = "doc_id",
    text_col: str = "text",
    query_name: str = "stream_ingest_dedup",
    window_index_path: str | None = None,
    window_k: int = 20,
    min_shared_windows: int = 1,
    line_index_path: str | None = None,
    line_min_occurrences: int = 2,
    line_keep: str = "first",
    line_count_mode: str = "occurrences",
) -> StreamingQuery:
    """Continuously ingest a document stream with STANDING dedup: each
    micro-batch is deduped within itself (min-id keeper per content
    fingerprint), then against the corpus's persisted dedup index
    (``operators.dedup.build_corpus_index`` parquet at ``index_path``
    — fingerprints + MinHash signatures, never the corpus text), and
    only the survivors are upserted; their index rows are appended so
    the NEXT batch dedups against them too.

    Crash-replay reasoning (the stream_upsert contract extended):
    the batch-id marker skips fully-acked batches; for a replay inside
    the window, the index rows are appended BEFORE the table commit,
    and every appended row is TAGGED with the (checkpoint, batch_id)
    that wrote it. The lookup path excludes rows carrying the current
    batch's own tag — i.e. exactly the rows a prior partial attempt of
    THIS batch appended. Excluding only self-matches would be
    insufficient: a replayed doc could band-match a same-batch
    SIBLING's freshly-appended index row (different doc_id) and be
    dropped where the original run kept it, leaving an orphan index
    row for a doc that never lands in the table. With the tag-scoped
    exclusion, a replay sees exactly the pre-batch index, reaches
    identical drop/keep decisions, and the idempotent upsert converges
    — while a whole-source re-stream under a FRESH checkpoint (new
    lineage, different tags) still dedups against every committed
    index row and converges to an unchanged table. Exact SELF-matches
    (index doc_id == batch doc_id) are additionally excluded: the tags
    only cover replays under the SAME checkpoint, and recovery under a
    different checkpoint dir after a crash between index append and
    table commit would otherwise band-match each doc against its own
    orphan index row and drop it forever without it ever landing in
    the table — safe because the upsert is idempotent and the append
    path anti-joins the index, so a doc whose committed row pre-exists
    neither double-appends nor changes outcome. ``id_col`` must be
    globally unique across the stream (it is the record key). An index bootstrapped directly via
    ``build_corpus_index`` (no tag columns) is read with mergeSchema,
    its untagged rows never excluded — correct, since they predate any
    streaming lineage.

    ``window_index_path`` (r7) adds the SUBSTRING lane: a persisted
    ``build_window_index`` parquet checked and appended the same way —
    docs sharing ≥ ``min_shared_windows`` identical ``window_k``-token
    windows with the standing corpus are dropped (reason 'substring'),
    catching quote/boilerplate reuse whole-document fingerprints and
    MinHash dilute away. This lane needs NO lineage tags: the
    incremental checker always anti-joins index rows carrying the
    batch's own ids (self AND same-batch siblings — the whole batch's
    id set), so a replay after a crash between window append and table
    commit sees exactly the pre-batch window index; the append path
    anti-joins at (doc, h1, h2) ROW granularity against the batch
    docs' existing rows (broadcast-semi-filtered, batch-sized), so a
    partially committed append is healed — a replay appends exactly
    the missing remainder, never a duplicate row. The lane runs from
    the FIRST batch (empty index frame when the file does not exist
    yet), so within-batch pairs are caught under any batching; replay
    decisions are batching-invariant when doc ids are monotone with
    arrival order (see ``dedup_incremental``'s non-monotone caveat).

    ``line_index_path`` (late r7) adds the LINE lane — the only lane
    that REWRITES instead of drops: boilerplate lines occurring ≥
    ``line_min_occurrences`` times across standing corpus + batch are
    CUT from surviving docs (``dedup_lines_incremental`` against a
    persisted ``build_line_index`` parquet; ``line_keep`` as there)
    before the doc lands, and the cleaned docs append their own line
    rows. It runs AFTER the drop lanes (no point cutting lines from a
    doc about to be dropped) and BEFORE the fingerprint/window index
    appends and the upsert, so every persisted artifact reflects the
    text that actually landed. Replay exclusion is the window lane's
    pattern: the lookup anti-joins index rows carrying any of the
    batch's own doc ids (covers self, same-batch siblings, and
    orphan rows under a DIFFERENT recovery checkpoint — doc ids match
    regardless of lineage), and the append anti-joins at
    (line-key, doc) row granularity so a torn append heals to exactly
    the missing remainder. Caveat shared with the batch operator: two
    docs whose texts differ only by cut boilerplate land as distinct
    rows (the exact lane saw their ORIGINAL fingerprints); re-run the
    offline exact pass if post-cut convergence matters.

    Scale: the index append is one job over the batch (≪ corpus); the
    dedup joins shuffle batch + index rows by fingerprint/band key,
    and the window lane adds one aggregate over the window index's
    narrow long rows (cap parity — see
    ``exact_substring_pairs_incremental``). At a standing 100 TB
    corpus the fingerprint index is a few hundred GB and the window
    index a few TB — the whole point: ingest-time dedup without
    rescanning corpus text. Every micro-batch appends a few parquet
    files to each index, so a long-running ingest should periodically
    quiesce at a committed batch boundary and run
    :func:`~..operators.dedup.compact_window_index` (small-file
    rewrite plus the monotone-safe hot-window trim) and
    :func:`~..operators.dedup.compact_corpus_index` (rewrite only —
    one row per doc by construction) /
    :func:`~..operators.dedup.compact_line_index` (rewrite +
    conflicting-aggregate and mixed-norm rails).
    """
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from ..fs import fs_for
    from ..operators.dedup import (
        _norm_text,
        build_corpus_index,
        build_line_index,
        build_window_index,
        dedup_incremental,
        dedup_lines_incremental,
    )

    def _read_index(spark, path: str) -> DataFrame | None:
        """None when the index is genuinely absent: the path does not
        exist, or a first-batch crash left only uncommitted _temporary
        files (no committed part file) — treat as empty rather than
        wedging the stream forever. A read FAILURE over committed data
        (object-store throttle, corrupt footer) RE-RAISES so the
        streaming engine retries the batch: silently treating a
        populated index as empty would skip the dedup lanes AND the
        append anti-joins for one batch — double-appending rows and
        landing docs a healthy read would have dropped."""
        fs = fs_for(spark)
        if not fs.exists(path):
            return None
        try:
            return spark.read.option("mergeSchema", "true").parquet(path)
        except Exception:
            # committed-ness probe through the SAME fs abstraction the
            # read used: any part-* file means data landed (raise →
            # batch retry); only _temporary/_SUCCESS-less wreckage
            # means the first append crashed pre-commit (→ empty). An
            # os.path probe here would misclassify every URI store
            # (hdfs://, s3a://, file://) as committed and wedge the
            # stream in exactly the state this branch exists to heal.
            committed = any(
                n.startswith("part-") for n in fs.list_names(path)
            )
            if committed:
                raise
            return None

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        if batch_id in applied_batch_ids(table, checkpoint_dir):
            return  # replayed micro-batch: its commit already landed
        if batch_df.isEmpty():
            return
        spark = batch_df.sparkSession
        src = batch_df.withColumnRenamed(id_col, "doc_id").withColumnRenamed(
            text_col, "text"
        )
        # within-batch exact dedup: deterministic min-id keeper
        w = Window.partitionBy(F.md5(_norm_text())).orderBy(F.asc("doc_id"))
        intra = (
            src.withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") == 1)
            .drop("__rn")
        )
        # mergeSchema: a bootstrapped index (plain build_corpus_index
        # parquet) has no tag columns; streaming appends add them —
        # merge so both coexist
        index = _read_index(spark, index_path)
        windex = (
            _read_index(spark, window_index_path)
            if window_index_path
            else None
        )
        # the substring lane must run from the FIRST batch when it is
        # configured: its within-batch half needs no standing rows, and
        # skipping it until the index file exists would let a span
        # owner and quoter that arrive together slip through where any
        # later batching catches them. An empty index frame keeps one
        # code path.
        windex_lookup = windex
        if window_index_path and windex is None:
            windex_lookup = build_window_index(intra.limit(0), k=window_k)
        if index is not None or windex_lookup is not None:
            # replay protection: drop index rows tagged by a prior
            # partial attempt of THIS (checkpoint, batch_id) — not
            # just self-matches (see the docstring's same-batch-
            # sibling scenario) — so a replay dedups against exactly
            # the pre-batch index. Untagged (bootstrap) rows have NULL
            # tags and are always kept.
            if index is not None and "__src_ck" in index.columns:
                lookup = index.filter(
                    F.col("__src_ck").isNull()
                    | (F.col("__src_ck") != F.lit(_canon_checkpoint(checkpoint_dir)))
                    | (F.col("__src_batch") != F.lit(batch_id))
                )
            elif index is not None:
                lookup = index
            else:
                # window lane only (fingerprint index not created yet):
                # an empty fingerprint index keeps the exact/near lanes
                # quiet without a separate code path
                lookup = build_corpus_index(intra.limit(0))
            # exclude_self on top of the tag scoping: the tags cover a
            # replay under the SAME checkpoint, but a crash between
            # index append and table commit followed by re-ingestion
            # under a DIFFERENT checkpoint dir leaves orphan index rows
            # whose tags no longer match — without the self exclusion
            # each such doc would match its own orphan row and be
            # dropped forever without ever landing in the table. Safe:
            # the upsert is idempotent and the append path anti-joins
            # the index, so a legitimate committed self-row never
            # double-appends; sibling matches still resolve via tags.
            # The window lane needs neither tags nor the flag: its
            # checker anti-joins the batch's whole id set.
            clean, _report = dedup_incremental(
                intra,
                lookup,
                threshold,
                exclude_self=True,
                window_index=windex_lookup,
                min_shared_windows=min_shared_windows,
                window_k=window_k,
            )
        else:
            clean = intra
        lindex = (
            _read_index(spark, line_index_path) if line_index_path else None
        )
        if line_index_path:
            batch_ids_l = intra.select("doc_id").distinct()
            if lindex is None:
                lookup_l = build_line_index(intra.limit(0))
            else:
                # replay exclusion, window-lane style: drop index rows
                # carrying ANY batch doc id — a prior partial attempt's
                # appended rows (self or sibling) vanish from the
                # lookup, so a replay cuts against exactly the
                # pre-batch index; works under a different recovery
                # checkpoint too (ids match regardless of lineage)
                lookup_l = lindex.join(
                    F.broadcast(batch_ids_l), "doc_id", "left_anti"
                )
            clean = dedup_lines_incremental(
                clean,
                lookup_l,
                min_occurrences=line_min_occurrences,
                keep=line_keep,
                count_mode=line_count_mode,
            ).drop("n_lines_removed")
        # persist decisions before acking: index rows first (replay
        # self-matches are excluded above), then the marked table commit
        clean = clean.persist()

        def append_healed(rows: DataFrame, index_df, path: str) -> None:
            """Replay-safe index append shared by the window and line
            lanes — anti-join at (doc, h1, h2) ROW granularity: a
            crash mid-append can commit only SOME of a doc's rows, and
            a doc-level anti-join would then permanently orphan the
            missing remainder (future matches of those keys never
            caught). The existing rows of this batch's docs are
            fetched by a broadcast semi-join (map-side filter on the
            index, batch-sized output), then the exact anti-join
            appends precisely what is missing — idempotent AND
            self-healing."""
            if index_df is not None:
                ids = clean.select("doc_id").distinct()
                existing = index_df.select("doc_id", "h1", "h2").join(
                    F.broadcast(ids), "doc_id", "left_semi"
                )
                rows = rows.join(
                    existing, ["doc_id", "h1", "h2"], "left_anti"
                )
            rows.write.mode("append").parquet(path)

        try:
            if not clean.isEmpty():
                idx_rows = build_corpus_index(clean).select(
                    "*",
                    F.lit(_canon_checkpoint(checkpoint_dir)).alias("__src_ck"),
                    F.lit(batch_id).cast("long").alias("__src_batch"),
                )
                if index is not None:
                    # replayed survivors already indexed themselves:
                    # don't append their rows twice
                    idx_rows = idx_rows.join(
                        index.select("doc_id"), "doc_id", "left_anti"
                    )
                idx_rows.write.mode("append").parquet(index_path)
                if window_index_path:
                    append_healed(
                        build_window_index(clean, k=window_k),
                        windex,
                        window_index_path,
                    )
                if line_index_path:
                    append_healed(
                        build_line_index(clean), lindex, line_index_path
                    )
                table.upsert(
                    clean.withColumnRenamed("doc_id", id_col).withColumnRenamed(
                        "text", text_col
                    ),
                    instant_meta={
                        "batch_id": batch_id,
                        "checkpoint": checkpoint_dir,
                    },
                )
        finally:
            clean.unpersist()

    return (
        stream_df.writeStream.foreachBatch(sink)
        .option("checkpointLocation", checkpoint_dir)
        .queryName(query_name)
        .start()
    )
