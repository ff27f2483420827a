"""In-memory / KV source (SURVEY.md §2.1 S5/S6)."""

from __future__ import annotations

import pytest
from pyspark.sql import types as T

from sending_weekly_daily_csv_reports_from_hudi_datalake_to_customers_via_email_using_glue_and_sns_or_ses_spark.sources.memory import (
    chunked,
    kv_source,
    paginated,
)


def test_kv_source_with_schema(spark):
    schema = T.StructType(
        [
            T.StructField("pk", T.StringType(), False),
            T.StructField("qty", T.LongType(), True),
        ]
    )
    df = kv_source(spark, [{"pk": "a", "qty": 1}, {"pk": "b", "qty": None}], schema)
    assert df.schema == schema
    assert df.count() == 2


def test_kv_source_inferred(spark):
    df = kv_source(spark, [{"pk": "a", "qty": 1}])
    assert set(df.columns) == {"pk", "qty"}


def test_paginated_consumes_all_pages(spark):
    """The reference reads only the first scan page (template.py:289);
    paginated() flattens every page."""
    pages = [[{"pk": "a"}, {"pk": "b"}], [{"pk": "c"}], [{"pk": "d"}]]
    df = kv_source(spark, paginated(pages), "pk string")
    assert df.count() == 4


def test_kv_source_dynamodb_decimal_pages(spark):
    """Pin the boto3 type quirk the reference actually hits
    (template.py:284-294): DynamoDB deserializes EVERY number — ints
    and floats alike — as decimal.Decimal. Feed kv_source a
    DynamoDB-shaped paginated scan with Decimal values and pin the
    mapping on both paths:

    * explicit decimal schema (the engine-recommended path): values
      land exactly, and a downstream cast gives clean doubles;
    * schema inference (the reference's behavior): Spark infers
      DecimalType(38,18), so fractional cents SURVIVE — unlike the
      float round-trip a naive reader would do.
    """
    from decimal import Decimal

    pages = [
        [
            {"pk": "c1", "balance": Decimal("1234.56"), "visits": Decimal("3")},
            {"pk": "c2", "balance": Decimal("-0.07"), "visits": Decimal("0")},
        ],
        [{"pk": "c3", "balance": Decimal("99999999.99"), "visits": Decimal("12")}],
    ]

    schema = T.StructType(
        [
            T.StructField("pk", T.StringType(), False),
            T.StructField("balance", T.DecimalType(18, 2), True),
            T.StructField("visits", T.DecimalType(10, 0), True),
        ]
    )
    df = kv_source(spark, paginated(pages), schema)
    rows = {r["pk"]: r for r in df.collect()}
    assert rows["c1"]["balance"] == Decimal("1234.56")
    assert rows["c3"]["visits"] == Decimal("12")
    as_double = df.selectExpr("pk", "CAST(balance AS DOUBLE) AS balance_d")
    got = {r["pk"]: r["balance_d"] for r in as_double.collect()}
    assert got["c2"] == pytest.approx(-0.07)

    inferred = kv_source(spark, paginated(pages))
    btype = inferred.schema["balance"].dataType
    assert isinstance(btype, T.DecimalType)
    irows = {r["pk"]: r for r in inferred.collect()}
    assert irows["c1"]["balance"] == Decimal("1234.56")


def test_chunked_roundtrip():
    rows = [{"i": n} for n in range(10)]
    chunks = list(chunked(rows, 3))
    assert [len(c) for c in chunks] == [3, 3, 3, 1]
    assert [r["i"] for c in chunks for r in c] == list(range(10))


def test_sourcespec_csv_and_json(spark, tmp_path):
    """Catalog handles csv/json sources with explicit schemas — the
    format surface beyond parquet (SURVEY.md §2.1 S7 generalized)."""
    from sending_weekly_daily_csv_reports_from_hudi_datalake_to_customers_via_email_using_glue_and_sns_or_ses_spark import (
        fixtures,
    )
    from sending_weekly_daily_csv_reports_from_hudi_datalake_to_customers_via_email_using_glue_and_sns_or_ses_spark.catalog import (
        Catalog,
        SourceSpec,
    )

    df = fixtures.orders(spark, 25)
    csv_path = str(tmp_path / "orders_csv")
    json_path = str(tmp_path / "orders_json")
    df.write.option("header", "true").csv(csv_path)
    df.write.json(json_path)

    ddl = "order_id string, name string, order_value int, priority string, order_date date, customer_id string"
    cat = Catalog(spark)
    cat.register(SourceSpec("orders_csv", csv_path, fmt="csv",
                            options={"header": "true", "schema": ddl}))
    cat.register(SourceSpec("orders_json", json_path, fmt="json",
                            options={"schema": ddl}))
    a = spark.table("orders_csv")
    b = spark.table("orders_json")
    assert a.count() == b.count() == 25
    assert a.schema == b.schema
    # same content through both formats
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))


def test_compaction(spark, tmp_path):
    import glob

    from sending_weekly_daily_csv_reports_from_hudi_datalake_to_customers_via_email_using_glue_and_sns_or_ses_spark import (
        fixtures,
    )
    from sending_weekly_daily_csv_reports_from_hudi_datalake_to_customers_via_email_using_glue_and_sns_or_ses_spark.sinks.upsert import (
        KeyedTable,
        compact_snapshot,
    )

    t = KeyedTable(spark, str(tmp_path / "t"), record_key="order_id",
                   precombine="order_date")
    for b in range(3):
        t.upsert(fixtures.orders(spark, 40, batch=b).repartition(8))
    before = sorted(map(tuple, t.snapshot().drop("_commit_time").collect()))
    commit = compact_snapshot(t, target_files=1)
    assert commit == t.latest_commit()
    after_files = glob.glob(
        str(tmp_path / "t" / "snapshots" / f"v={commit}" / "*.parquet")
    )
    assert len(after_files) == 1
    after = sorted(map(tuple, t.snapshot().drop("_commit_time").collect()))
    assert before == after  # compaction changes layout, never content


def test_binary_file_source(spark, tmp_path):
    """binaryFile ingestion: files on disk -> media table with
    content-sniffed mime (extension is never trusted)."""
    from sending_weekly_daily_csv_reports_from_hudi_datalake_to_customers_via_email_using_glue_and_sns_or_ses_spark.sources.binary import (
        read_media_dir,
    )

    media = tmp_path / "media"
    media.mkdir()
    (media / "a.png").write_bytes(b"\x89PNG\r\n\x1a\n" + b"x" * 64)
    (media / "b.jpg").write_bytes(b"\xff\xd8\xff\xe0" + b"y" * 32)
    (media / "c.wav").write_bytes(b"RIFF....WAVE" + b"z" * 16)
    # RIFF is a container: the subtype bytes must disambiguate — a WebP
    # image and an AVI video share the WAV file's RIFF magic
    (media / "d.webp").write_bytes(b"RIFF....WEBP" + b"w" * 16)
    (media / "e.avi").write_bytes(b"RIFF....AVI " + b"v" * 16)
    (media / "liar.png").write_bytes(b"not an image at all")

    df = read_media_dir(spark, str(media))
    rows = {r["uri"].rsplit("/", 1)[-1]: r for r in df.collect()}
    assert rows["a.png"]["mime"] == "image/png"
    assert rows["b.jpg"]["mime"] == "image/jpeg"
    assert rows["c.wav"]["mime"] == "audio/wav"
    assert rows["d.webp"]["mime"] == "image/webp"
    assert rows["e.avi"]["mime"] == "video/x-msvideo"
    # content wins over the lying extension
    assert rows["liar.png"]["mime"] == "application/octet-stream"
    assert rows["a.png"]["n_bytes"] == 8 + 64
    # glob pushdown
    only_png = read_media_dir(spark, str(media), glob="*.png")
    assert only_png.count() == 2


def test_checkpoint_store_hadoop_fs_file_scheme(spark, tmp_path):
    """The Hadoop-FS-backed store works against an explicit file:// URI —
    the same code path serves hdfs:// and s3a:// roots (scheme dispatch
    inside the Hadoop FileSystem API)."""
    from sending_weekly_daily_csv_reports_from_hudi_datalake_to_customers_via_email_using_glue_and_sns_or_ses_spark.fs import (
        HadoopFS,
    )
    from sending_weekly_daily_csv_reports_from_hudi_datalake_to_customers_via_email_using_glue_and_sns_or_ses_spark.sources.checkpoint import (
        CheckpointStore,
    )

    root = f"file://{tmp_path}/meta_uri"
    store = CheckpointStore(root, spark=spark)
    assert isinstance(store.fs, HadoopFS)
    assert not store.exists("orders")
    store.advance("orders", "/data/orders", "20260813000000001")
    assert store.exists("orders")
    ckpt = store.read("orders")
    assert ckpt.last_processed_commit == "20260813000000001"
    store.advance("orders", "/data/orders", "20260813000000002")  # overwrite
    assert store.read("orders").last_processed_commit == "20260813000000002"
    store.clean("orders")
    assert not store.exists("orders")


def test_checkpoint_store_local_fallback(tmp_path):
    """Without a JVM/session the store still works via the os fallback."""
    from pyspark.sql import SparkSession

    from sending_weekly_daily_csv_reports_from_hudi_datalake_to_customers_via_email_using_glue_and_sns_or_ses_spark.fs import (
        LocalFS,
    )
    from sending_weekly_daily_csv_reports_from_hudi_datalake_to_customers_via_email_using_glue_and_sns_or_ses_spark.sources.checkpoint import (
        CheckpointStore,
    )

    active = SparkSession.getActiveSession()
    store = CheckpointStore(str(tmp_path / "meta_local"))
    if active is None:
        assert isinstance(store.fs, LocalFS)
    store.advance("t", "/p", "1")
    assert store.read("t").last_processed_commit == "1"


def test_hudi_full_source_without_jars_fails_loudly(spark, tmp_path):
    """A FULL source pointing at a real Hudi root (.hoodie) without the
    Hudi bundle must get the explicit bundle-missing error, not a
    cryptic _meta.json FileNotFoundError."""
    import pytest as _pytest

    from sending_weekly_daily_csv_reports_from_hudi_datalake_to_customers_via_email_using_glue_and_sns_or_ses_spark.catalog import (
        Catalog,
        SourceSpec,
    )
    from sending_weekly_daily_csv_reports_from_hudi_datalake_to_customers_via_email_using_glue_and_sns_or_ses_spark.sinks.upsert import (
        hudi_available,
    )

    if hudi_available(spark):
        _pytest.skip("Hudi jars present: passthrough handles this")
    root = tmp_path / "real_hudi"
    (root / ".hoodie").mkdir(parents=True)
    with _pytest.raises(RuntimeError, match="Hudi Spark bundle"):
        Catalog(spark).register(
            SourceSpec(table_name="t", path=str(root), fmt="hudi")
        )


def test_hudi_source_declared_schema_validated(spark, tmp_path):
    """A declared schema on a keyed/hudi source is VALIDATED against the
    table (it can't be applied via .schema()), not silently dropped."""
    import pytest as _pytest

    from sending_weekly_daily_csv_reports_from_hudi_datalake_to_customers_via_email_using_glue_and_sns_or_ses_spark import (
        fixtures,
    )
    from sending_weekly_daily_csv_reports_from_hudi_datalake_to_customers_via_email_using_glue_and_sns_or_ses_spark.catalog import (
        Catalog,
        SourceSpec,
    )
    from sending_weekly_daily_csv_reports_from_hudi_datalake_to_customers_via_email_using_glue_and_sns_or_ses_spark.sinks.upsert import (
        KeyedTable,
    )

    t = KeyedTable(
        spark, str(tmp_path / "kt"), record_key="customer_id",
        precombine="created_at",
    )
    t.upsert(fixtures.customers(spark, 5))
    cat = Catalog(spark)
    ok = cat.register(
        SourceSpec(
            table_name="kt_ok", path=t.root, fmt="hudi",
            options={"schema": "customer_id string, created_at timestamp"},
        )
    )
    assert ok.count() == 5
    with _pytest.raises(ValueError, match="declared schema"):
        cat.register(
            SourceSpec(
                table_name="kt_bad", path=t.root, fmt="hudi",
                options={"schema": "customer_id int, nope string"},
            )
        )


def test_checkpoint_survives_flip_crash_on_no_filecontext_store(spark, tmp_path):
    """VERDICT r2 #4: on a store with no FileContext binding (S3A), the
    old fallback's delete+rename gap could leave NO checkpoint file —
    silently resetting an incremental source to first-run. The
    versioned-copy protocol must keep every crash state readable."""
    from sending_weekly_daily_csv_reports_from_hudi_datalake_to_customers_via_email_using_glue_and_sns_or_ses_spark.fs import (
        HadoopFS,
    )

    class S3LikeFS(HadoopFS):
        """file:// driven through the NO-FileContext code path — the
        exact branch an s3a:// URI takes."""

        def _replace_via_filecontext(self, tmp, dst):
            return False

    class CrashDuringFlip(S3LikeFS):
        """Crashes inside the plain-name flip, right after the delete —
        the worst instant of the old protocol."""

        def _flip_plain(self, fs, path, text):
            dst = self._path(path)
            if fs.exists(dst):
                fs.delete(dst, False)
            raise RuntimeError("simulated crash between delete and rename")

    path = f"file://{tmp_path}/meta/orders.json"
    healthy = S3LikeFS(spark)
    healthy.write_text_atomic(path, "v1")
    assert healthy.read_text(path) == "v1"
    healthy.write_text_atomic(path, "v2")  # fallback overwrite works
    assert healthy.read_text(path) == "v2"

    crasher = CrashDuringFlip(spark)
    with pytest.raises(RuntimeError, match="simulated crash"):
        crasher.write_text_atomic(path, "v3")
    # the commit point (versioned copy) was reached before the crash:
    # no reader sees an absent or stale checkpoint
    assert healthy.exists(path)
    assert healthy.read_text(path) == "v3"

    # recovery write over the crash state lands normally
    healthy.write_text_atomic(path, "v4")
    assert healthy.read_text(path) == "v4"
    healthy.delete(path)
    assert not healthy.exists(path)


def test_incremental_hard_pin_upper_bound(spark, tmp_path):
    """ADVICE r2: the increment returned by read() must be HARD-pinned
    with an upper commit bound — a cache-loss recompute then returns
    exactly the staged row set even if newer commits landed meanwhile."""
    from sending_weekly_daily_csv_reports_from_hudi_datalake_to_customers_via_email_using_glue_and_sns_or_ses_spark.sinks.upsert import (
        KeyedTable,
    )
    from sending_weekly_daily_csv_reports_from_hudi_datalake_to_customers_via_email_using_glue_and_sns_or_ses_spark.sources.incremental import (
        IncrementalReader,
    )
    from sending_weekly_daily_csv_reports_from_hudi_datalake_to_customers_via_email_using_glue_and_sns_or_ses_spark import (
        fixtures,
    )

    t = KeyedTable(
        spark, str(tmp_path / "tbl"), record_key="customer_id",
        precombine="created_at",
    )
    t.upsert(fixtures.customers(spark, 10, batch=0))
    reader = IncrementalReader(
        spark, "pin_tbl", t.root, checkpoint_root=str(tmp_path / "meta")
    )
    inc = reader.read()
    assert inc.count() == 10
    # a commit lands AFTER read() staged its checkpoint; simulate total
    # cache loss so the returned frame recomputes from source
    t.upsert(fixtures.customers(spark, 10, batch=1))
    reader._materialized.unpersist(blocking=True)
    # without the upper bound this recompute would widen to 20 rows —
    # delivering rows now that will be REdelivered after commit()
    assert inc.count() == 10
    reader.commit()
    nxt = reader.read()
    assert nxt.count() == 10  # the new commit arrives exactly once
    reader.commit()


def test_hadoopfs_rename_refuses_existing_directory_dest(spark, tmp_path):
    """HadoopFS.rename must return False when the destination exists
    (r8 review): Hadoop's FileSystem.rename with an existing DIRECTORY
    destination moves src INTO it and returns true (posix-mv), which
    would defeat every caller using the False return as concurrent-
    publisher detection — the src would silently vanish into an
    invisible subdir instead of raising."""
    import os

    from sending_weekly_daily_csv_reports_from_hudi_datalake_to_customers_via_email_using_glue_and_sns_or_ses_spark.fs import (
        fs_for,
    )

    fs = fs_for(spark)
    src = str(tmp_path / "staging")
    dst = str(tmp_path / "published")
    os.makedirs(src)
    open(os.path.join(src, "part-0"), "w").write("x")
    os.makedirs(dst)
    open(os.path.join(dst, "part-0"), "w").write("y")
    assert fs.rename(src, dst) is False
    # src intact (NOT swallowed into dst), dst untouched
    assert os.path.isfile(os.path.join(src, "part-0"))
    assert open(os.path.join(dst, "part-0")).read() == "y"
    assert not os.path.isdir(os.path.join(dst, "staging"))
    # and a fresh destination still renames
    dst2 = str(tmp_path / "published2")
    assert fs.rename(src, dst2) is True
    assert os.path.isfile(os.path.join(dst2, "part-0"))
