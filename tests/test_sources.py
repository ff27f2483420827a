"""In-memory / KV source (SURVEY.md §2.1 S5/S6)."""

from __future__ import annotations

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
