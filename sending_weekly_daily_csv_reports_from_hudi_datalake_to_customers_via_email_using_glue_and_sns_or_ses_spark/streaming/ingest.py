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
) -> StreamingQuery:
    """Continuously upsert a stream into a KeyedTable.

    Exactly-once reasoning: Structured Streaming replays an unacked
    micro-batch after failure; the batch-id check above skips batches
    whose commit already landed, and for the narrow publish-vs-marker
    crash window KeyedTable.upsert is idempotent for identical rows
    (precombine picks the same winners), so the snapshot converges.
    The streaming checkpoint_dir provides source-offset tracking.
    """

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

    return (
        stream_df.writeStream.foreachBatch(sink)
        .option("checkpointLocation", checkpoint_dir)
        .queryName(query_name)
        .start()
    )
