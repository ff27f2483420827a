"""Structured-Streaming incremental source over a KeyedTable commit
log — S2 (template.py:207-217, ``hoodie.datasource.query.type =
incremental``) in its readStream form, the mapping SURVEY.md §2.1
names as the Spark-first alternative to driver-side begin-instant
arithmetic: each published commit appends an immutable ``log/c=<id>/``
directory, so Spark's file streaming source — whose checkpoint
already tracks exactly which files it has delivered — IS the
incremental-consumption bookkeeping. No ``last_processed_commit``
JSON, no distinct+orderBy+collect (template.py:197-224): the
checkpointLocation the caller passes to ``writeStream`` replaces the
reference's whole metadata/{table}.json protocol.

Delivery contract (vs. the batch readers in sources/incremental.py):

* rows of every PUBLISHED commit are delivered exactly once per
  checkpoint (file-source tracking; restarts resume, never re-read);
* UPSERT rows only — deletes write no log rows (their keys go to the
  tombstone dir; a streaming consumer that must see deletes consumes
  :class:`~..sources.incremental.CDCReader` windows in batch instead);
* a writer that crashed between its log write and its pointer flip
  leaves orphan log files until its next transaction reaps them; a
  streaming microbatch that fires inside that window can deliver the
  orphan rows (phantoms). The batch readers bound reads by the
  ``_latest`` pointer per call and are immune; a STREAMING plan cannot
  re-evaluate the pointer per batch (the filter would freeze at its
  planning-time value — exactly the bug bounding here would invite).
  Where phantoms are unacceptable, run the single-writer pattern the
  engine's sinks already follow (writer process == service process:
  `_rollback_failed` runs before each commit, closing the window) or
  consume in batch.

Scale: the source lists only NEW files per trigger (the checkpoint
prunes seen ones); ``maxFilesPerTrigger`` bounds microbatch size under
backlog. At 100 TB this is the continuous-ingestion read path — the
write side is `streaming/ingest.py`'s foreachBatch upsert sink, and
the two compose into a log-shipping replica chain.

Schema evolution mid-stream: a running streaming plan's schema is
FROZEN at open (a Spark file-source property) — commits that ADD,
WIDEN, or RENAME columns after the stream started deliver those
columns as NULL/narrow/missing until the stream RESTARTS (same
checkpoint: file tracking persists, the schema re-resolves at plan
time). Restart streams on schema-change commits — the same operator
contract as rename replication in batch. The maintained-view drivers
(streaming/maintained.py) are immune: they re-read real windows from
the table per batch, never the frozen stream schema.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    LongType,
    StringType,
    StructField,
    StructType,
)

from ..sources.incremental import COMMIT_COL, read_commit_log


def stream_incremental(
    spark: SparkSession,
    root: str,
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """Open a KeyedTable root's commit log as a STREAMING DataFrame:
    the table's data columns plus ``_commit_time`` (string, the commit
    id, restored from the ``c=`` partition dir). Attach any
    writeStream sink with a ``checkpointLocation``; the checkpoint is
    the incremental cursor. See the module docstring for the delivery
    contract."""
    log_dir = os.path.join(root, "log")
    # both guards raise the same actionable message: a missing log dir
    # (not a table root / nothing ever written) and an EMPTY log dir
    # (a crashed writer's orphan commit was reaped) would otherwise
    # surface as an opaque AnalysisException from the glob below
    has_commits = os.path.isdir(log_dir) and any(
        n.startswith("c=") for n in os.listdir(log_dir)
    )
    if not has_commits:
        raise ValueError(
            f"{root} has no commit log — not a keyed-table root, or no "
            "commit has been published yet; create the table and write "
            "one batch before opening the stream"
        )
    # streaming file sources require an explicit schema, resolved
    # ENGINE-AWARE (r10 review): a bucketed root records its committed
    # schema in the MANIFESTS (not the schema/ log), so the KeyedTable
    # lane's `_committed_schema` returns None there and the old
    # fallback inferred from parquet footers — an evolved/renamed
    # bucketed table then streamed wrong/NULL columns. Each engine now
    # declares its own recorded schema + rename priors; the stream
    # reads the raw layout, so it wants data fields + c(long)
    # pre-rename.
    from ..sources.incremental import (
        _committed_schema,
        coalesce_renamed,
        physical_read_schema,
    )

    is_bucketed = False
    bt_meta = os.path.join(root, "_table.json")
    if os.path.exists(bt_meta):
        import json as _json

        try:
            with open(bt_meta) as f:
                is_bucketed = _json.load(f).get("engine") == "bucketed"
        except (OSError, ValueError):
            pass
    priors: dict[str, list[str]] = {}
    if is_bucketed:
        from ..sinks.filegroups import BucketedTable

        t = BucketedTable.open(spark, root)
        recorded = StructType(
            [
                f
                for f in t._union_schema(None).fields
                if f.name != COMMIT_COL
            ]
        )
        phys, priors = physical_read_schema(recorded)
        data_fields = list(phys.fields)
    else:
        batch = read_commit_log(spark, root)
        data_fields = [
            f for f in batch.schema.fields if f.name != COMMIT_COL
        ]
        # renamed tables: declare prior physical names too and fold
        # them into the logical columns after the read (the batch
        # reader's rename mapping, applied to the streaming scan)
        recorded = _committed_schema(root)
        if recorded is not None:
            phys, priors = physical_read_schema(recorded)
            if priors:
                data_fields = list(phys.fields)
    if "c" in (f.name for f in data_fields):
        # read_commit_log catches this for schema-recorded tables; this
        # guard covers inferred-schema vintages too (ADVICE r7: a data
        # column named 'c' collides with the log's partition dir and
        # makes the rename below ambiguous)
        raise ValueError(
            f"{root}: table data schema contains a column named 'c', "
            "which collides with the commit-log partition column "
            "(log/c=<commit>/) — rename the data column before "
            "streaming this table"
        )
    reader = (
        spark.readStream.schema(
            StructType(data_fields + [StructField("c", LongType())])
        )
        .option("basePath", log_dir)
    )
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    out = (
        reader.parquet(os.path.join(log_dir, "c=*"))
        .withColumnRenamed("c", COMMIT_COL)
        .withColumn(COMMIT_COL, F.col(COMMIT_COL).cast("string"))
    )
    if priors:
        out = coalesce_renamed(out, priors)
    return out


def stream_cdc(
    spark: SparkSession,
    root: str,
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """CDC-mode streaming source over a KeyedTable root (r8, VERDICT r7
    #2): ``stream_incremental`` delivers upsert rows only — deletes
    were invisible to streaming consumers (the documented contract
    above). But the tombstone dir is itself an append-only file stream
    (every delete commit writes its dropped keys under
    ``tombstones/c=<id>/``), and so is the per-commit timeline marker
    dir — the op stream is three file sources unioned:

    * **upsert lane**: the commit log, each row tagged
      ``_change_op = 'u'`` — the log row's payload (the incoming
      merged batch), NOT the key's post-merge state: a streamed 'u'
      whose row loses the precombine merge downstream is a no-op
      there, exactly as it was here;
    * **delete lane**: the tombstone log, each dropped key tagged
      ``_change_op = 'd'`` with every non-key data column NULL;
    * **replace lane**: each PUBLISHED insert_overwrite_table commit's
      post-publish replace marker (``replaces/<commit>.json``) as an
      ``_change_op = 'r'`` row (ALL data columns NULL) — the signal to
      CLEAR replica state before applying the same commit's 'u' rows,
      which are exactly the replacement batch. Within a commit the op
      order is 'r' first; without this lane a replace would stream as
      plain upserts and silently diverge any replica (batch
      ``CDCReader`` raises ReplaceCommitError for the same window).
      Publish-gated (ADVICE r8): an ABORTED overwrite never emits the
      'r' — a phantom state wipe is qualitatively heavier than the
      phantom upserts the other lanes can deliver.

    Output schema: the table's data columns + ``_commit_time`` +
    ``_change_op``. Consumers sequence by ``_commit_time`` within each
    microbatch (commit ids are totally ordered) and apply upserts via
    the precombine merge, deletes by key — the log-shipping replica
    recipe; ``tests/test_streaming.py`` pins replica-state parity and
    op-set parity against batch ``KeyedTable.cdc`` windows.

    Same phantom caveat as ``stream_incremental`` for the 'u'/'d'
    lanes (log rows and tombstones are written before the pointer
    flip, so a crashed writer's orphans can stream until the next
    transaction reaps them) — but NOT for the 'r' lane, which is
    gated on published commits (see the replace-lane comment below).
    Same exactly-once file tracking via the caller's
    checkpointLocation, and the same ``maxFilesPerTrigger`` backlog
    bound per lane.

    Checkpoint-vintage caveat: the 'r' lane moved from the timeline
    dir to ``replaces/`` in r9 — a PRE-r9 stream checkpoint restarted
    over an upgraded engine will see every historical overwrite's
    backfilled marker as a NEW file and replay it as a late 'r' with
    no accompanying 'u' redelivery; wipe-then-apply replicas must
    RE-SEED (fresh checkpoint from a snapshot) across that upgrade.
    The maintained-view drivers (streaming/maintained.py) are immune:
    they treat any 'r' as a pointer-bounded rebuild signal.

    Vintage: tables whose deletes predate the tombstone log (early-r7)
    stream those deletes as nothing — consume batch ``CDCReader``
    windows for them instead (its snapshot-diff fallback covers the
    old vintage)."""
    from ..sinks.filegroups import open_any_table  # late: avoids cycle

    # r10 (VERDICT r9 #6): both engines speak the streaming layout
    # contract (log/c=, tombstones/c=, replaces/*.json) — KeyedTable
    # always did; BucketedTable.delete/overwrite now write the same
    # tombstones and publish-gated replace markers
    table = open_any_table(spark, root)
    key = table.record_key
    up = stream_incremental(spark, root, max_files_per_trigger).withColumn(
        "_change_op", F.lit("u")
    )
    data_fields = [
        f
        for f in up.schema.fields
        if f.name not in (COMMIT_COL, "_change_op")
    ]
    if key not in (f.name for f in data_fields):
        raise ValueError(
            f"{root}: record key {key!r} not in the log schema "
            f"({[f.name for f in data_fields]}) — not a valid keyed/"
            "bucketed table commit log"
        )
    ts_dir = os.path.join(root, "tombstones")
    # the glob below must resolve from stream start even on a table
    # that has never deleted (the dir appears with the first delete,
    # but a STREAMING plan cannot add a source later) — materializing
    # the empty layout dir is metadata-only and changes no table state
    os.makedirs(ts_dir, exist_ok=True)
    treader = spark.readStream.schema(
        StructType(
            [f for f in data_fields if f.name == key]
            + [StructField("c", LongType())]
        )
    ).option("basePath", ts_dir)
    if max_files_per_trigger is not None:
        treader = treader.option("maxFilesPerTrigger", max_files_per_trigger)
    deletes = (
        treader.parquet(os.path.join(ts_dir, "c=*"))
        .withColumnRenamed("c", COMMIT_COL)
        .withColumn(COMMIT_COL, F.col(COMMIT_COL).cast("string"))
        .select(
            *[
                (
                    F.col(f.name)
                    if f.name == key
                    else F.lit(None).cast(f.dataType)
                ).alias(f.name)
                for f in data_fields
            ],
            F.col(COMMIT_COL),
            F.lit("d").alias("_change_op"),
        )
    )
    # replace lane (r8 review): an insert_overwrite_table commit ships
    # its batch as ordinary 'u' log rows, which ALONE would silently
    # diverge a replica — the old state is never merged away
    # downstream (stale keys survive; replacement rows that lose the
    # precombine merge lose again), the exact divergence the batch
    # CDCReader raises ReplaceCommitError for. Replaces stream as
    # explicit 'r' rows (every data column NULL): a consumer CLEARS
    # replica state at the 'r', then applies the SAME commit's 'u'
    # rows — which ARE the replacement batch — restoring full
    # log-shipping parity across replaces (the op-sequencing rule:
    # within a commit, 'r' applies first).
    #
    # The lane reads the POST-publish replace markers (root/replaces/,
    # ADVICE r8 medium), NOT the timeline: timeline markers precede
    # the pointer flip (the time-travel rail needs that order), so a
    # crashed, never-published overwrite would stream a phantom 'r'
    # whose state WIPE is qualitatively heavier than the phantom
    # upsert rows the other lanes can deliver — the replica would
    # apply the aborted (rolled-back) replacement batch. With the
    # published-marker gate an aborted overwrite degrades to the same
    # documented phantom-'u' caveat as every lane, and a PUBLISHED
    # overwrite always has its marker: it is written right after the
    # flip, and the crash window between the two is backfilled at
    # every writer transaction and at this stream's open. A marker
    # backfilled late can reach a running stream AFTER the commit's
    # 'u' rows — consumers that cannot tolerate a late 'r' should
    # treat any 'r' as a re-seed-from-snapshot signal (order-
    # insensitive; streaming/maintained.py does exactly that).
    table._backfill_replace_markers()
    rm_dir = table._replace_marker_dir()
    os.makedirs(rm_dir, exist_ok=True)  # metadata-only, like tombstones
    mreader = spark.readStream.schema(
        StructType([StructField("op", StringType())])
    )
    if max_files_per_trigger is not None:
        mreader = mreader.option("maxFilesPerTrigger", max_files_per_trigger)
    replaces = (
        mreader.json(os.path.join(rm_dir, "*.json"))
        .filter(F.col("op") == "overwrite")
        .select(
            *[
                F.lit(None).cast(f.dataType).alias(f.name)
                for f in data_fields
            ],
            F.regexp_replace(
                F.col("_metadata").getField("file_name"),
                r"\.json$",
                "",
            ).alias(COMMIT_COL),
            F.lit("r").alias("_change_op"),
        )
    )
    return up.unionByName(deletes).unionByName(replaces)
