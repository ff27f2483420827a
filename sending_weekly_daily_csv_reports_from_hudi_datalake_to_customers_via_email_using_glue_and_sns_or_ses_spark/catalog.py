"""Typed catalog: the engine's replacement for the reference's
``loaders["source"]`` config dicts (template.py:471-483, README.md:9-38).

The reference materializes every source as a session temp view named by
``table_name`` and lets the transform address views by name in SQL
(template.py:305, 317). We keep exactly that model — it IS Spark's model —
but make the specs typed and the registration explicit, and declare
schemas instead of inferring them (SURVEY.md §1.3).
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

#: The driver-generated testdata tables (TESTDATA.md).
TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Snapshot scan of one testdata table (SURVEY.md §2.1 S1).

    Parquet scan → Catalyst handles predicate pushdown / column pruning /
    row-group skipping downstream; nothing to hand-roll here.

    ``events.ts`` is parquet TIMESTAMP(NANOS), which Spark's vectorized
    reader rejects; we read it as raw int64 nanos
    (spark.sql.legacy.parquet.nanosAsLong) and truncate to microseconds
    JVM-side with integer division (``div`` — a double division would
    lose precision above 2^53 ns). DuckDB applies the same ns→µs
    truncation, so oracle comparisons line up exactly.

    The nanosAsLong conf is necessarily SESSION-WIDE and stays set
    (row decode happens lazily at action time, so it can't be scoped to
    this call; it must also hold in the driver's own vanilla session).
    Consequence: any OTHER nanos-timestamped parquet read in the same
    session also arrives as int64 — apply this function's dtype-guarded
    ``timestamp_micros(ts div 1000)`` conversion, don't read it raw.
    """
    path = os.path.join(sf_dir, f"{name}.parquet")
    if name == "events":
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        from pyspark.sql import functions as F

        df = spark.read.parquet(path)
        # the conversion applies only to NANOS-typed sources (read as
        # long under the legacy conf); a re-landed copy written by Spark
        # already carries TIMESTAMP(MICROS)
        if dict(df.dtypes).get("ts") in ("bigint", "long"):
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
        return df
    return spark.read.parquet(path)


@dataclass(frozen=True)
class SourceSpec:
    """Typed version of one ``loaders["source"]`` entry
    (template.py:474-483): name, path, format, load type.
    """

    table_name: str
    path: str
    fmt: str = "parquet"
    load_type: str = "FULL"  # FULL | INC  (template.py:301-317 dispatch)
    options: dict[str, str] = field(default_factory=dict)


class Catalog:
    """Registers sources as temp views so SQL transforms can address them
    by name — the reference's load_hudi_tables() (template.py:297-322)
    without the Hudi/S3 coupling.
    """

    def __init__(self, spark: SparkSession):
        self.spark = spark
        #: live IncrementalReader per INC source — callers (or
        #: commit_incremental) advance the checkpoint AFTER their sink
        #: succeeds, closing the ADVICE-r1 gap where the INC branch
        #: discarded the reader and re-read everything each run.
        self.incremental: dict[str, object] = {}

    def _read_full(self, spec: SourceSpec) -> DataFrame:
        opts = dict(spec.options)
        # "schema" is the engine's declared-schema contract
        # (SURVEY.md §1.3), not a reader option: DDL string or
        # StructType applied via .schema() so nothing is inferred.
        schema = opts.pop("schema", None)
        if spec.fmt == "hudi":
            # the reference's snapshot read (template.py:305): real Hudi
            # datasource when jars are present; otherwise the KeyedTable
            # emulation's log-merged snapshot (same observable rows)
            from .sinks.upsert import KeyedTable, hudi_available

            from .fs import fs_for

            if hudi_available(self.spark):
                df = self.spark.read.format("hudi").options(**opts).load(spec.path)
            elif fs_for(self.spark).exists(spec.path.rstrip("/") + "/.hoodie"):
                # fs-routed, not os.path.isdir: the guard must fire for
                # hdfs:// / s3a:// roots too (ADVICE r2)
                # same loud guard as IncrementalReader: a raw fallback
                # over a real Hudi root reads stale/duplicate file slices
                raise RuntimeError(
                    f"{spec.path} is a Hudi table (.hoodie present) but "
                    "the Hudi Spark bundle is not on this session's "
                    "classpath; add the bundle or point the source at "
                    "an exported copy."
                )
            else:
                snap = KeyedTable.open(self.spark, spec.path).snapshot()
                if snap is None:
                    raise FileNotFoundError(f"empty keyed table at {spec.path}")
                df = snap
            if schema is not None:
                self._validate_declared_schema(df, schema, spec)
            return df
        if spec.fmt == "bucketed":
            # the bucket-index engine (sinks/filegroups.py) behind the
            # same config surface: snapshot = manifest-pinned slice
            # union, optionally as of options["as.of.instant"] (the
            # Hudi time-travel knob, same name the KeyedTable lane
            # honors)
            from .sinks.filegroups import BucketedTable

            as_of = opts.pop("as.of.instant", None)
            if opts:
                # the other lanes forward options to a Spark reader;
                # there is no reader here, so silence would be a lie
                raise ValueError(
                    f"source {spec.table_name!r}: fmt='bucketed' "
                    f"supports options 'schema' and 'as.of.instant' "
                    f"only; got unsupported {sorted(opts)}"
                )
            table = BucketedTable.open(self.spark, spec.path)
            snap = table.snapshot(as_of=as_of)
            if snap is None:
                # distinguish a too-early time travel from a truly
                # empty table — the wrong diagnosis sends the user
                # debugging table creation instead of their option
                if as_of is not None and table.commits():
                    raise ValueError(
                        f"source {spec.table_name!r}: as.of.instant="
                        f"{as_of} predates the first commit "
                        f"({table.commits()[0]}) of {spec.path}"
                    )
                raise FileNotFoundError(
                    f"empty bucketed table at {spec.path}"
                )
            if schema is not None:
                self._validate_declared_schema(snap, schema, spec)
            return snap
        reader = self.spark.read.format(spec.fmt).options(**opts)
        if schema is not None:
            reader = reader.schema(schema)
        return reader.load(spec.path)

    def _validate_declared_schema(self, df: DataFrame, schema, spec: SourceSpec):
        """Keyed/Hudi reads can't take ``.schema()`` (the table defines
        it), so a DECLARED schema is validated against what the table
        actually carries instead of being silently dropped: every
        declared field must exist with the declared type."""
        from pyspark.sql.types import StructType

        declared = (
            StructType.fromDDL(schema) if isinstance(schema, str) else schema
        )
        actual = {f.name: f.dataType for f in df.schema.fields}
        problems = [
            f"{f.name}: declared {f.dataType.simpleString()}, "
            f"actual {actual.get(f.name).simpleString() if f.name in actual else 'MISSING'}"
            for f in declared.fields
            if actual.get(f.name) != f.dataType
        ]
        if problems:
            raise ValueError(
                f"source {spec.table_name!r}: declared schema does not "
                f"match the table: " + "; ".join(problems)
            )

    def register(self, spec: SourceSpec) -> DataFrame:
        if spec.load_type == "FULL":
            df = self._read_full(spec)
        elif spec.load_type == "INC":
            # Incremental sources go through the checkpointed reader
            # (sources/incremental.py); the reader handle is kept so the
            # checkpoint can be committed after the sink succeeds.
            from .sources.incremental import IncrementalReader

            allowed = {"checkpoint_root", "commit_col"}
            unknown = set(spec.options) - allowed
            if unknown:
                # fail clearly instead of TypeError-ing inside the
                # constructor: INC options are reader-config, not Spark
                # datasource options
                raise ValueError(
                    f"INC source {spec.table_name!r}: unsupported "
                    f"options {sorted(unknown)}; supported: {sorted(allowed)}"
                )
            reader = IncrementalReader(
                self.spark, spec.table_name, spec.path, **spec.options
            )
            old = self.incremental.get(spec.table_name)
            if old is not None:
                old._release()  # free the superseded reader's cached increment
            self.incremental[spec.table_name] = reader
            df = reader.read()
        else:
            raise ValueError(f"unknown load_type: {spec.load_type!r}")
        df.createOrReplaceTempView(spec.table_name)
        return df

    def commit_incremental(self) -> None:
        """Advance every INC source's checkpoint — call after the
        downstream sink succeeded (at-least-once ordering)."""
        for reader in self.incremental.values():
            reader.commit()  # type: ignore[attr-defined]

    def register_testdata(self, sf_dir: str) -> None:
        """Register all driver testdata tables as temp views."""
        for name in TABLES:
            load_table(self.spark, sf_dir, name).createOrReplaceTempView(name)

    def sql(self, query: str) -> DataFrame:
        """The transform runner (template.py:319-322): arbitrary Spark SQL
        over the registered views; Catalyst optimizes the whole plan.
        """
        return self.spark.sql(query)

    def publish(self, df: DataFrame, table_name: str, mode: str = "overwrite") -> None:
        """P10 hive-sync emulation (generate_hudi_table.py:123-131): make
        a table durable and discoverable in the session catalog
        (spark_catalog / metastore when configured) instead of a
        session-scoped temp view."""
        df.write.mode(mode).saveAsTable(table_name)

    def publish_bucketed(
        self,
        df: DataFrame,
        table_name: str,
        key: str,
        n_buckets: int = 32,
        mode: str = "overwrite",
    ) -> None:
        """Publish hash-bucketed on the join key — the co-located-join
        layout: two tables bucketed the same way join WITHOUT a shuffle
        (Spark matches bucket specs and skips both Exchanges; pinned by
        tests/test_plans.py). At 100 TB this is how a repeatedly-joined
        fact pair (orders⋈lineitem every report run) amortizes its
        shuffle once at write time instead of paying it per query.
        Rows are sorted within buckets on the key for row-group
        locality (the P5 clustering story applied to the join path)."""
        (
            df.repartition(n_buckets, key)
            .write.mode(mode)
            .bucketBy(n_buckets, key)
            .sortBy(key)
            .saveAsTable(table_name)
        )
