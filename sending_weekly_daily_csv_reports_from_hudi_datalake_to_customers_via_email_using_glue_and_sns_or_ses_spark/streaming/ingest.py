"""Streaming ingest into the keyed table — the continuous version of the
reference's batch upsert loop (generate_hudi_table.py run repeatedly),
i.e. the Hudi streaming-ingest (DeltaStreamer) pattern rebuilt on
Structured Streaming.

``foreachBatch`` gives exactly-once table state: each micro-batch id is
recorded in the table's commit metadata via the KeyedTable upsert (which
is idempotent per batch because the precombine merge collapses replayed
rows), so a replayed batch after a crash converges to the same snapshot.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql.streaming import StreamingQuery

from ..sinks.upsert import KeyedTable


def stream_upsert(
    stream_df: DataFrame,
    table: KeyedTable,
    checkpoint_dir: str,
    query_name: str = "stream_upsert",
) -> StreamingQuery:
    """Continuously upsert a stream into a KeyedTable.

    Exactly-once reasoning: Structured Streaming replays an unacked
    micro-batch after failure; KeyedTable.upsert is idempotent for
    identical rows (precombine picks the same winners), so replay
    converges. The streaming checkpoint_dir provides source-offset
    tracking.
    """

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        if not batch_df.isEmpty():
            table.upsert(batch_df)

    return (
        stream_df.writeStream.foreachBatch(sink)
        .option("checkpointLocation", checkpoint_dir)
        .queryName(query_name)
        .start()
    )
