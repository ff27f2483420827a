"""Incremental (checkpointed) table reader — the engine version of the
reference's HUDIIncrementalReader (template.py:158-281).

Semantics preserved exactly (SURVEY.md §3.2):
  * first run: begin = min(commit) − 1 so the first commit is included
    (template.py:197-205), i.e. read everything;
  * subsequent runs: rows with commit_time strictly greater than the
    checkpoint (template.py:207-217);
  * empty increment leaves the checkpoint unchanged (template.py:243);
  * checkpoint advances to max(commit_time) of the increment
    (template.py:219-224).

Fixes over the reference:
  * begin/last commit discovery is a min/max aggregate, not
    distinct+sort+limit(50)+collect — the reference silently breaks
    when a table has >50 distinct commits (template.py:200-204);
  * checkpoint advancement is the caller's explicit ``commit()`` call
    AFTER the downstream sink succeeds → at-least-once instead of the
    reference's at-most-once (it checkpoints before delivery,
    template.py:244-251);
  * no global ``hudi_incremental`` temp-view collision between two
    incremental sources (template.py:213) — views are per-table.

Scale: the commit filter is a pushed-down range predicate; on a
commit-time-partitioned layout it's partition pruning (only new files
are listed/read), which is exactly Hudi's incremental-query behavior.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .checkpoint import CheckpointStore

#: the versioned-table commit column (FIXTURES.md: emulates
#: _hoodie_commit_time, a string yyyyMMddHHmmssSSS with total ordering)
COMMIT_COL = "_commit_time"

#: the real Hudi meta-column the reference filters on (template.py:200)
HUDI_COMMIT_COL = "_hoodie_commit_time"


def _committed_schema(
    root: str, include_dropped: bool = False, as_of: str | None = None
):
    """The table's committed data schema: newest schema/<commit>.json
    at or below the ``_latest`` pointer (and, with ``as_of``, at or
    below that instant too — the time-travel vintage), the legacy
    _schema.json as a fallback, else None (infer from files).

    Dropped columns (``alter_drop_column``) stay in the recorded file
    as TOMBSTONED fields — metadata ``{"dropped": true}`` — so a later
    re-add of the same name can be checked against the residual data
    old files still hold; readers get the ACTIVE fields only unless
    ``include_dropped`` asks for the raw record."""
    import json as _json

    from pyspark.sql.types import StructType

    try:
        with open(os.path.join(root, "_latest")) as f:
            latest = f.read().strip() or None
    except FileNotFoundError:
        latest = None
    if latest is not None and as_of is not None and as_of < latest:
        latest = as_of
    schema = None
    sd = os.path.join(root, "schema")
    if latest is not None and os.path.isdir(sd):
        eligible = sorted(
            name[: -len(".json")]
            for name in os.listdir(sd)
            if name.endswith(".json")
            and not name.startswith(".")
            and name[: -len(".json")] <= latest
        )
        if eligible:
            with open(os.path.join(sd, f"{eligible[-1]}.json")) as f:
                schema = StructType.fromJson(_json.load(f))
    if schema is None:
        legacy = os.path.join(root, "_schema.json")
        if os.path.isfile(legacy):
            with open(legacy) as f:
                schema = StructType.fromJson(_json.load(f))
    if schema is None or include_dropped:
        return schema
    return StructType(
        [f for f in schema.fields if not f.metadata.get("dropped")]
    )


def rename_priors(schema) -> dict[str, list[str]]:
    """Per field, its PRIOR physical names (most recent first) from the
    ``renamed_from`` metadata an ``alter_rename_column`` commit records
    — empty for never-renamed fields. Rename is metadata-only: old
    files keep their written column names forever, so every
    explicit-schema read must know which physical names can serve a
    logical field."""
    return {
        f.name: list(f.metadata["renamed_from"])
        for f in schema.fields
        if f.metadata.get("renamed_from")
    }


def physical_read_schema(data_schema):
    """The schema to DECLARE over mixed-vintage parquet files of a
    renamed table: every logical field plus, per rename, its prior
    names as same-typed extra fields (a file carries exactly one of
    the names; the others read NULL). Pair with
    :func:`coalesce_renamed` to fold them into the logical columns —
    one scan, no per-vintage slicing, composing with the scan-time
    type widening (priors are declared at the CURRENT, widest type).
    Returns ``(physical StructType, priors map)``."""
    from pyspark.sql.types import StructField, StructType

    priors = rename_priors(data_schema)
    fields = list(data_schema.fields)
    have = {f.name for f in fields}
    for f in data_schema.fields:
        for p in priors.get(f.name, ()):
            if p not in have:
                fields.append(StructField(p, f.dataType, True))
                have.add(p)
    return StructType(fields), priors


def coalesce_renamed(df: DataFrame, priors: dict[str, list[str]]) -> DataFrame:
    """Fold each renamed field's prior-name columns into its logical
    column (``coalesce(new, *priors)`` — sound because no file ever
    carries two of the names: a rename tombstones the old name for
    reuse) and drop the priors."""
    for cur, olds in priors.items():
        present = [p for p in olds if p in df.columns]
        if not present:
            continue
        df = df.withColumn(
            cur, F.coalesce(F.col(cur), *[F.col(p) for p in present])
        ).drop(*present)
    return df


def read_commit_log(
    spark: SparkSession, root: str, include_dropped: bool = False
) -> DataFrame | None:
    """Read a KeyedTable commit log (root/log/c=<commit>/) as the change
    stream, commit ids restored into ``_commit_time``. Returns None when
    ``root`` has no log — i.e. it isn't a KeyedTable root.

    ``include_dropped`` reads under the RAW recorded schema (tombstoned
    dropped columns included) — the internal time-travel
    reconstruction needs the dropped columns' VALUES so a read pinned
    before the drop can still show them; the public change stream
    stays at the active schema.

    Only PUBLISHED commits are visible: when the root carries a
    ``_latest`` pointer, log dirs beyond it (a crashed writer's
    uncommitted append — the pointer flip is the commit point) are
    excluded by a partition-pruning filter on the ``c=`` dir column, so
    their files are never even scanned. Without the bound an
    incremental reader could deliver rows from a commit that never
    completed (ADVICE r2)."""
    log_dir = os.path.join(root, "log")
    if not os.path.isdir(log_dir):
        return None
    if not any(n.startswith("c=") for n in os.listdir(log_dir)):
        # an EMPTIED log (rollback-to-empty removes every c= child but
        # leaves log/ itself) must read as "no log" for EVERY caller —
        # the c=* glob below would otherwise raise PATH_NOT_FOUND (r8
        # review: the guard first landed at one call site only)
        return None
    reader = spark.read.option("basePath", log_dir)
    # schema evolution (late r7): when the table records its committed
    # schema (schema/<commit>.json, stamped by every widening upsert;
    # legacy single-file _schema.json honored), read the log with it
    # EXPLICITLY — parquet fills columns a pre-evolution commit dir
    # lacks with NULL, and no per-file footer sweep (mergeSchema) is
    # ever needed. Only files at or below the published pointer count
    # (crash consistency — same bound the row filter below applies).
    data_schema = _committed_schema(root, include_dropped=include_dropped)
    priors: dict[str, list[str]] = {}
    if data_schema is not None:
        from pyspark.sql.types import LongType, StructField, StructType

        # renamed fields read through their prior physical names
        # (metadata-only rename: old files are never rewritten)
        data_schema, priors = physical_read_schema(data_schema)
        if "c" in data_schema.fieldNames():
            # the log layout reserves `c` for its commit partition dir
            # (log/c=<id>/); a data column of the same name would make
            # the schema duplicate-field and the rename below ambiguous
            # (ADVICE r7) — refuse loudly instead
            raise ValueError(
                f"{root}: table data schema contains a column named 'c', "
                "which collides with the commit-log partition column "
                "(log/c=<commit>/) — rename the data column before "
                "writing this table"
            )
        # the partition-dir column is appended by the source, typed as
        # it parses (int64 for the numeric commit ids)
        reader = reader.schema(
            StructType(
                list(data_schema.fields) + [StructField("c", LongType())]
            )
        )
    df = (
        reader.parquet(os.path.join(log_dir, "c=*"))
        .withColumnRenamed("c", COMMIT_COL)
        .withColumn(COMMIT_COL, F.col(COMMIT_COL).cast("string"))
    )
    if priors:
        df = coalesce_renamed(df, priors)
    try:
        with open(os.path.join(root, "_latest")) as f:
            latest = f.read().strip() or None
    except FileNotFoundError:
        latest = None
    if latest is not None:
        df = df.filter(F.col(COMMIT_COL) <= F.lit(latest))
    return df


class IncrementalReader:
    def __init__(
        self,
        spark: SparkSession,
        table_name: str,
        path: str,
        checkpoint_root: str = "/tmp/report_engine_metadata",
        commit_col: str = COMMIT_COL,
    ):
        self.spark = spark
        self.table_name = table_name
        self.path = path
        self.commit_col = commit_col
        self.store = CheckpointStore(checkpoint_root, spark=spark)
        self._pending_commit: str | None = None
        self._materialized: DataFrame | None = None
        # layout detection is pinned at construction (a source path's
        # layout doesn't change under a live reader) so the per-read
        # paths don't pay a JVM FS round-trip each
        self._real_hudi = self._detect_real_hudi()
        # the Hudi meta-column override applies only when the real Hudi
        # datasource will actually serve the reads — a caller-supplied
        # commit_col must survive for any fallback path
        if self._hudi_passthrough():
            self.commit_col = HUDI_COMMIT_COL

    # -- source-layout dispatch ----------------------------------------
    def _detect_real_hudi(self) -> bool:
        """A real Hudi table root carries a .hoodie timeline dir.
        Detection goes through the Hadoop FS abstraction (fs.py), not
        os.path — os.path.isdir is always False for hdfs://, s3a://,
        … URIs, which would silently disable both the passthrough and
        the loud no-jars guard for every remote Hudi root and fall
        back to a stale-file-slice raw parquet read (ADVICE r2)."""
        from ..fs import fs_for

        return fs_for(self.spark).exists(
            self.path.rstrip("/") + "/.hoodie"
        )

    def _is_real_hudi(self) -> bool:
        return self._real_hudi

    def _hudi_passthrough(self) -> bool:
        from ..sinks.upsert import hudi_available  # late: avoids cycle

        return self._is_real_hudi() and hudi_available(self.spark)

    # -- commit discovery (template.py:197-224, as aggregates) ---------
    def _snapshot(self) -> DataFrame:
        """The change stream this reader filters: real-Hudi snapshot
        read (template.py:305) when jars are present; a KeyedTable
        commit log when ``path`` is a KeyedTable root (ADVICE r1: the
        log/ layout is consumed first-class, no monkeypatching); plain
        parquet with a commit column otherwise."""
        if self._hudi_passthrough():
            return self.spark.read.format("hudi").load(self.path)
        if self._is_real_hudi():
            # fail LOUDLY: a raw parquet read of a Hudi table root
            # returns superseded file slices (stale + duplicate rows for
            # every updated key) — silently wrong customer reports
            raise RuntimeError(
                f"{self.path} is a Hudi table (.hoodie present) but the "
                "Hudi Spark bundle is not on this session's classpath; "
                "refusing the raw-parquet fallback, which would read "
                "stale/duplicate file slices. Add the hudi-spark bundle "
                "or point the source at an exported copy."
            )
        log = read_commit_log(self.spark, self.path)
        if log is not None:
            return log
        if os.path.isfile(os.path.join(self.path, "_meta.json")):
            # a KeyedTable root with NO published commits (pre-first-
            # commit, or rolled back to empty): the raw-parquet
            # fallback below would raise an opaque schema-inference
            # error (r9 review). With a recorded schema the increment
            # is a typed EMPTY frame; without one there is genuinely
            # nothing to serve yet — say so.
            from pyspark.sql.types import StringType, StructField, StructType

            sch = _committed_schema(self.path)
            if sch is not None:
                return self.spark.createDataFrame(
                    [],
                    StructType(
                        list(sch.fields)
                        + [StructField(COMMIT_COL, StringType())]
                    ),
                )
            raise ValueError(
                f"{self.path} is a KeyedTable root with no published "
                "commits and no recorded schema — write one batch "
                "before registering it as an incremental source"
            )
        return self.spark.read.parquet(self.path)

    def _read_after(self, begin: str) -> DataFrame:
        """Rows with commit strictly after ``begin``. Real-Hudi path uses
        the incremental query type (template.py:207-217) so Hudi prunes
        at the timeline, not per-row."""
        if self._hudi_passthrough():
            return (
                self.spark.read.format("hudi")
                .option("hoodie.datasource.query.type", "incremental")
                .option("hoodie.datasource.read.begin.instanttime", begin)
                .load(self.path)
            )
        snap = self._snapshot()
        # literal typed to the COLUMN (r9 review): comparing a string
        # literal against a bigint commit column coerces BOTH sides to
        # double, whose 53-bit mantissa cannot hold 17-digit commit
        # ids — boundary commits would silently drop or duplicate. The
        # cast is exact for string (no-op), integral, and timestamp
        # commit columns.
        lit = F.lit(begin).cast(snap.schema[self.commit_col].dataType)
        return snap.filter(F.col(self.commit_col) > lit)

    # -- the incremental read (template.py:226-273) ---------------------
    def read(self) -> DataFrame:
        """Return exactly the not-yet-processed rows and stage (not yet
        persist) the new checkpoint; call ``commit()`` after the
        downstream sink succeeds.

        The increment is PERSISTED before the max-commit aggregate: the
        agg and the caller's sink then share one scan (not two).
        The cache alone is only a best-effort pin (lost blocks
        recompute from source and could pull in commits that landed
        after the staged checkpoint — delivered now AND redelivered
        next run), so the returned frame is additionally HARD-pinned
        with ``commit_col <= staged max``: recompute is then
        deterministic whether or not the cached blocks survive
        (ADVICE r2). ``commit()``/``reset()`` release the cache;
        callers should finish consuming the returned frame before
        committing. Increments are deltas, not the table; if one is
        genuinely too big to cache, MEMORY_AND_DISK degrades to disk
        spill, not recompute."""
        from pyspark import StorageLevel

        if self.store.exists(self.table_name):
            begin = self.store.read(self.table_name).last_processed_commit
            inc = self._read_after(begin)
        else:
            # first run: include everything (begin = min − 1 in the
            # reference, template.py:204; > is exclusive so we simply
            # take the whole snapshot)
            inc = self._snapshot()

        self._release()
        inc = inc.persist(StorageLevel.MEMORY_AND_DISK)
        self._materialized = inc
        last = inc.agg(F.max(self.commit_col).alias("c")).first()["c"]
        self._pending_commit = (
            str(last) if last is not None else None
        )
        if last is not None:
            # hard pin: an upper bound makes a cache-loss recompute
            # return exactly the staged row set, not a wider one. The
            # literal keeps the aggregate's NATIVE type (r9 review:
            # str() against a bigint column coerced both sides to
            # double, losing 17-digit precision).
            inc = inc.filter(F.col(self.commit_col) <= F.lit(last))
        else:
            # the EMPTY increment is pinned too: without it, a caller
            # evaluating the returned frame AFTER new upstream commits
            # land would deliver those rows now — and redeliver them
            # next run, since commit() was a no-op (r9 review)
            inc = inc.filter(F.lit(False))
        view_name = f"{self.table_name}_incremental"
        inc.createOrReplaceTempView(view_name)
        return inc

    def _release(self) -> None:
        if self._materialized is not None:
            self._materialized.unpersist()
            self._materialized = None

    def commit(self) -> None:
        """Advance the checkpoint to the staged max commit. No-op when
        the last read was empty (template.py:243 semantics)."""
        if self._pending_commit is not None:
            self.store.advance(self.table_name, self.path, str(self._pending_commit))
            self._pending_commit = None
        self._release()

    def reset(self) -> None:
        self.store.clean(self.table_name)
        self._release()


class CDCReader:
    """Checkpointed change-data-capture reader over a KeyedTable root —
    the CDC twin of :class:`IncrementalReader`, for consumers that need
    op/before/after rows (replication, incremental view maintenance)
    rather than the raw upserted-row stream.

    Same at-least-once protocol: ``read()`` returns the window
    (checkpoint, latest] and STAGES the new checkpoint; call
    ``commit()`` only after the downstream sink succeeds. Unlike the
    row-stream reader no cache pin is needed: the window is bounded by
    explicit (begin, end] instants, so a recompute re-reads exactly the
    staged window (the reader never reads beyond its staged ``end``).

    Retention coupling: the window's BEFORE-images reconstruct state
    as of the checkpoint, which needs a surviving snapshot ≤ it (or a
    clean log replay) — exactly the time-travel rail. Deleted-key
    fabrication is cleaner-proof on tombstone-vintage tables, but a
    consumer lagging further than the upstream's snapshot retention
    can still hit the rail on its seed; size ``keep_versions`` to
    cover the maximum consumer lag, or pin a ``savepoint`` at the
    slowest checkpoint (the same sizing rule Hudi's cleaner-vs-
    incremental-query docs give). For sinks that need exactly-once,
    pair each window with :meth:`staged_end` — e.g.
    ``MaintainedAggregate.apply(win, through=reader.staged_end())``
    makes redelivered windows no-ops."""

    def __init__(
        self,
        spark: SparkSession,
        table_name: str,
        path: str,
        checkpoint_root: str = "/tmp/report_engine_metadata",
    ):
        # either engine (r11): KeyedTable and BucketedTable share the
        # CDC protocol, so the checkpointed reader speaks to both
        from ..sinks.filegroups import open_any_table  # late: avoids cycle

        self.spark = spark
        self.table_name = table_name
        self.table = open_any_table(spark, path)
        self.store = CheckpointStore(checkpoint_root, spark=spark)
        self._pending_commit: str | None = None

    def checkpoint(self) -> str | None:
        """The COMMITTED checkpoint (last instant a finished run
        processed), or None before the first commit — the accessor the
        report loops use for 'covered instant' bookkeeping, so the
        store layout stays this class's private concern."""
        if not self.store.exists(self.table_name):
            return None
        return self.store.read(self.table_name).last_processed_commit

    def read(self, after: str | None = None) -> DataFrame | None:
        """The not-yet-processed CDC window, or None when the upstream
        table has no new commits (checkpoint already at latest).

        ``after``: a downstream high-water instant (e.g. a
        MaintainedAggregate's ``through()``) that may be AHEAD of this
        reader's checkpoint when a previous run crashed between the
        sink and ``commit()`` — the window then starts at
        max(checkpoint, after), so the already-applied prefix is never
        re-read. Without it, a crash followed by NEW upstream commits
        would hand the sink an extended window whose redelivered
        prefix double-counts in any delta-folding consumer (state
        replicas are immune, aggregates are not). If ``after`` already
        covers everything, read returns None but still STAGES the end
        so ``commit()`` can catch the checkpoint up."""
        begin = (
            self.store.read(self.table_name).last_processed_commit
            if self.store.exists(self.table_name)
            else None
        )
        end = self.table.latest_commit()
        if begin is not None and (
            end is None
            or end < begin
            # pointer AHEAD again but the checkpoint instant is gone
            # from the timeline: a restore/rollback removed it and a
            # NEW commit (wall-clock id > the removed ones) already
            # landed — without this membership check the window
            # (begin, end] would seed its before-images from the
            # REWOUND state and a delta-folding consumer would
            # double-count the rolled-back range (r11 review)
            or begin not in self.table.instants()
        ):
            # the table's published history no longer contains this
            # reader's checkpoint: a restore/rollback removed history
            # the checkpoint refers to (commit ids are monotonic, so
            # this is unreachable any other way). Silent None here
            # would look like "no new commits" and the consumer would
            # later fold windows that skip the rewound range — raise
            # instead (the documented restore caveat): reset() the
            # reader and re-seed the consumer from a snapshot.
            raise ValueError(
                f"{self.table_name}: checkpoint {begin} is not in the "
                f"table's published history (latest commit: {end}) — "
                "the table was restored/rolled back past this "
                "reader's checkpoint; reset() the reader and re-seed "
                "the consumer"
            )
        if end is None or end == begin:
            self._pending_commit = None
            return None
        if after is not None and (begin is None or after > begin):
            begin = after
        self._pending_commit = end
        if begin is not None and end <= begin:
            return None  # downstream already covers it; commit() catches up
        return self.table.cdc(begin=begin, end=end)

    def staged_end(self) -> str | None:
        """The staged window's end instant (None when the last read
        found nothing) — the idempotence token exactly-once sinks pair
        with each window (see class docstring)."""
        return self._pending_commit

    def commit(self) -> None:
        """Advance the checkpoint to the staged window end. No-op when
        the last read found nothing."""
        if self._pending_commit is not None:
            self.store.advance(
                self.table_name, self.table.root, self._pending_commit
            )
            self._pending_commit = None

    def reset(self) -> None:
        self.store.clean(self.table_name)
        self._pending_commit = None
