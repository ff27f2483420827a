"""Per-file Bloom key index (sources/bloomindex.py — Hudi BLOOM,
P7): point lookups must be EQUIVALENT to a full-scan isin filter,
must skip files on layouts col_stats cannot prune, and the
false-positive rate must track the analytic bound."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from sending_weekly_daily_csv_reports_from_hudi_datalake_to_customers_via_email_using_glue_and_sns_or_ses_spark.sources.bloomindex import (
    BLOOM_NAME,
    load_bloom,
    probe_bloom,
    read_keys_bloom,
    write_bloom,
)


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


@pytest.fixture(scope="module")
def scattered_dir(spark, tmp_path_factory):
    """16-file layout clustered by v — the KEY is scattered across
    every file (each file's key min/max spans ~the full range), which
    is exactly where min/max stats prune nothing and the bloom must."""
    path = str(tmp_path_factory.mktemp("bloom") / "t")
    df = spark.range(8000).select(
        F.col("id").alias("k"),
        ((F.col("id") * 2654435761) % 100003).alias("v"),
        F.concat(F.lit("p"), F.col("id").cast("string")).alias("payload"),
    )
    df.repartitionByRange(16, "v").write.parquet(path)
    write_bloom(spark, path, "k", m_bits=1 << 14, num_hashes=7)
    return path


def test_lookup_equivalent_to_isin(spark, scattered_dir):
    full = spark.read.parquet(scattered_dir)
    for keys in ([17], [0, 1, 2, 3, 4], [7999], [123456789], [5, 123456789]):
        got = read_keys_bloom(spark, scattered_dir, "k", keys)
        assert _rows(got) == _rows(full.where(F.col("k").isin(keys))), keys


def test_bloom_skips_where_minmax_cannot(spark, scattered_dir):
    """5 probe keys live in ≤5 of 16 files; the bloom plans the scan
    over about that many (plus rare false positives), while every
    file's key [min, max] covers the probes — min/max would keep 16."""
    m = load_bloom(spark, scattered_dir)
    assert m is not None and len(m["files"]) == 16
    keys = [11, 222, 3333, 4444, 7777]
    got, report = read_keys_bloom(
        spark, scattered_dir, "k", keys, with_report=True
    )
    assert got.count() == 5
    assert report["n_kept"] <= 8 < report["n_files"] == 16
    assert len(got.inputFiles()) == report["n_kept"]

    # absent key: usually zero files survive (fp-rate is ~0.6% at
    # these parameters); equivalence holds regardless
    got2, rep2 = read_keys_bloom(
        spark, scattered_dir, "k", [10**12 + 7], with_report=True
    )
    assert got2.count() == 0
    assert rep2["n_kept"] <= 2


def test_false_positive_rate_tracks_bound(spark, scattered_dir):
    """Probe 400 ABSENT keys one-per-file-check: the per-file hit rate
    must stay within ~3x of the analytic (1 - e^{-kn/m})^k ≈ 0.55% for
    n=500 keys/file, m=2^14, k=7 (slack for variance, not a vibe: 3x
    the bound at 400×16 trials would still be <0.02 hit fraction)."""
    kept, report = probe_bloom(
        spark, scattered_dir, [10**9 + i for i in range(400)]
    )
    # 400 absent keys × 16 files = 6400 membership tests; bound 0.0055
    # per test → expect ~35 file-hits spread over ≤ min(16, ...) kept
    # files. Assert on the conservative aggregate: kept files stay
    # well under total.
    assert report["n_kept"] <= 16  # sanity
    total_tests = 400 * 16
    # count actual per-key hits for the real fp accounting
    m = load_bloom(spark, scattered_dir)
    import base64

    from sending_weekly_daily_csv_reports_from_hudi_datalake_to_customers_via_email_using_glue_and_sns_or_ses_spark.sources.bloomindex import (
        _probe_positions,
    )

    pos = _probe_positions(spark, [10**9 + i for i in range(400)], m, "k")
    hits = 0
    for b64 in m["files"].values():
        bm = base64.b64decode(b64)
        for plist in pos.values():
            if all(bm[p >> 3] & (1 << (p & 7)) for p in plist):
                hits += 1
    assert hits / total_tests < 3 * 0.0055, hits


def test_fallback_and_validation(spark, tmp_path):
    path = str(tmp_path / "plain")
    spark.range(100).select(F.col("id").alias("k")).write.parquet(path)
    got, report = read_keys_bloom(spark, path, "k", [7], with_report=True)
    assert report == {"fallback": True}
    assert got.count() == 1

    with pytest.raises(ValueError, match="not in schema"):
        write_bloom(spark, path, "nope")
    with pytest.raises(ValueError, match="m_bits"):
        write_bloom(spark, path, "k", m_bits=4)


def test_string_keys_and_manifest_presence(spark, tmp_path):
    import os

    path = str(tmp_path / "str")
    spark.range(2000).select(
        F.concat(F.lit("user-"), F.col("id").cast("string")).alias("k"),
        F.col("id").alias("v"),
    ).repartitionByRange(8, "v").write.parquet(path)
    write_bloom(spark, path, "k", m_bits=1 << 13)
    assert os.path.exists(os.path.join(path, BLOOM_NAME))
    got, report = read_keys_bloom(
        spark, path, "k", ["user-42", "user-1999"], with_report=True
    )
    assert _rows(got.select("v")) == [(42,), (1999,)]
    assert report["n_kept"] < report["n_files"] == 8


def test_keyed_table_read_keys(spark, tmp_path):
    """Engine integration: upsert → z-order compaction over NON-key
    columns with bloom_key=record key → read_keys prunes files AND
    matches snapshot().isin; a MOR log append falls back merged."""
    from sending_weekly_daily_csv_reports_from_hudi_datalake_to_customers_via_email_using_glue_and_sns_or_ses_spark.sinks.upsert import (
        KeyedTable,
        compact_snapshot,
    )

    root = str(tmp_path / "kt")
    t = KeyedTable(spark, root, record_key="k", precombine="pre")
    data = spark.range(4000).select(
        F.col("id").alias("k"),
        ((F.col("id") * 40503) % 99991).cast("double").alias("a"),
        ((F.col("id") * 2654435761) % 100003).cast("double").alias("b"),
        F.col("id").alias("pre"),
    )
    t.upsert(data)
    compact_snapshot(t, target_files=8, zorder_cols=["a", "b"], bloom_key="k")
    got, report = t.read_keys([5, 1234, 3999], with_report=True)
    assert _rows(got.select("k")) == [(5,), (1234,), (3999,)]
    assert report["n_kept"] < report["n_files"] == 8

    # MOR append: bloom fast path must not serve the stale base row
    t2 = KeyedTable(
        spark, root, record_key="k", precombine="pre",
        table_type="MERGE_ON_READ",
    )
    t2.upsert(
        spark.createDataFrame(
            [(1234, -1.0, -1.0, 10**9)], "k long, a double, b double, pre long"
        )
    )
    got2, rep2 = t2.read_keys([1234], with_report=True)
    assert rep2 == {"fallback": True}
    assert _rows(got2.select("k", "a")) == [(1234, -1.0)]


def test_auto_sized_m_tracks_largest_file(spark, tmp_path):
    """m_bits=None sizes the bitmap from the data: next power of two
    >= bits_per_key x the largest file's rows (floored at 2^14). At
    12k keys in one file, 10 bits/key needs >= 120k bits -> 2^17; the
    fixed old default would have been at ~37% fp for 37k keys, the
    auto-size keeps absent-key probes near zero."""
    path = str(tmp_path / "auto")
    spark.range(12_000).select(
        F.col("id").alias("k"), (F.col("id") % 7).alias("v")
    ).coalesce(1).write.parquet(path)
    m = write_bloom(spark, path, "k")
    assert m["m_bits"] == 1 << 17
    kept, report = probe_bloom(spark, path, [10**9 + i for i in range(50)])
    assert report["n_kept"] == 0  # 50 absent probes, fp ~1e-2 per file

    # tiny file floors at _MIN_M_BITS
    p2 = str(tmp_path / "tiny")
    spark.range(10).select(F.col("id").alias("k")).write.parquet(p2)
    assert write_bloom(spark, p2, "k")["m_bits"] == 1 << 14

    with pytest.raises(ValueError, match="bits_per_key"):
        write_bloom(spark, path, "k", bits_per_key=0)


def test_empty_keys_keep_nothing(spark, scattered_dir):
    """isin([]) is false everywhere: empty probes keep zero files and
    the read returns an empty frame in the dir's schema — never an
    error (review finding: the old path raised on the fast path but
    returned empty on the fallback path)."""
    kept, report = probe_bloom(spark, scattered_dir, [])
    assert kept == [] and report["n_kept"] == 0 < report["n_files"]
    got = read_keys_bloom(spark, scattered_dir, "k", [])
    assert got.count() == 0
    assert set(got.columns) == {"k", "v", "payload"}


def test_probe_hash_parity_for_nonstring_keys(spark, tmp_path):
    """Doubles (and booleans) are where Python str() and Spark's
    cast-to-string disagree ('1e+20' vs '1.0E20'): the typed probe
    must still find every present key."""
    path = str(tmp_path / "dbl")
    spark.sql(
        "SELECT id, cast(pow(10.0, id) as double) AS k FROM range(30)"
    ).repartitionByRange(4, "id").write.parquet(path)
    write_bloom(spark, path, "k", m_bits=1 << 13)
    probes = [1e20, 1e5, 1.0]  # 1e20 is the str()-vs-cast poster child
    got, report = read_keys_bloom(spark, path, "k", probes, with_report=True)
    assert sorted(r["k"] for r in got.collect()) == sorted(probes)
    assert 0 < report["n_kept"] < report["n_files"]


def test_keyed_table_read_keys_empty_list(spark, tmp_path):
    from sending_weekly_daily_csv_reports_from_hudi_datalake_to_customers_via_email_using_glue_and_sns_or_ses_spark.sinks.upsert import (
        KeyedTable,
        compact_snapshot,
    )

    root = str(tmp_path / "kte")
    t = KeyedTable(spark, root, record_key="k", precombine="pre")
    t.upsert(spark.createDataFrame([(1, 1)], "k long, pre long"))
    compact_snapshot(t, bloom_key="k")
    assert t.read_keys([]).count() == 0


def test_multi_column_index_v2(spark, tmp_path):
    """One build scan indexes several columns (Hudi 1.0 secondary
    indexes); each column probes independently with its own type, and
    an un-indexed column falls back instead of erroring."""
    path = str(tmp_path / "multi")
    spark.range(4000).select(
        F.col("id").alias("k"),
        (F.col("id") % 50).cast("double").alias("price"),
        F.concat(F.lit("c"), (F.col("id") % 37).cast("string")).alias("cust"),
        ((F.col("id") * 2654435761) % 100003).alias("v"),
    ).repartitionByRange(8, "v").write.parquet(path)
    m = write_bloom(spark, path, ["k", "cust"], m_bits=1 << 14)
    assert m["version"] == 2
    assert set(m["columns"]) == {"k", "cust"}

    full = spark.read.parquet(path)
    # primary column
    got, rep = read_keys_bloom(spark, path, "k", [7, 3999], with_report=True)
    assert _rows(got) == _rows(full.where(F.col("k").isin([7, 3999])))
    assert rep["n_kept"] < rep["n_files"] == 8
    # secondary string column: present in MANY files (37 values over
    # 4000 rows) — equivalence still exact, pruning not expected
    got2 = read_keys_bloom(spark, path, "cust", ["c5"])
    assert _rows(got2) == _rows(full.where(F.col("cust") == "c5"))
    # un-indexed column: clean fallback
    got3, rep3 = read_keys_bloom(
        spark, path, "price", [5.0], with_report=True
    )
    assert rep3 == {"fallback": True}
    assert _rows(got3) == _rows(full.where(F.col("price") == 5.0))

    # probe_bloom on a multi-column index requires naming the column
    with pytest.raises(ValueError, match="name the column"):
        probe_bloom(spark, path, [7])

    with pytest.raises(ValueError, match="distinct columns"):
        write_bloom(spark, path, ["k", "k"])


def test_keyed_table_read_where_in_secondary(spark, tmp_path):
    """Engine path: compact with bloom_key=[record key, secondary] →
    read_where_in prunes on the secondary column where min/max cannot
    (z-order scattered it), matches the exact filter, and a MOR log
    append falls back merged."""
    from sending_weekly_daily_csv_reports_from_hudi_datalake_to_customers_via_email_using_glue_and_sns_or_ses_spark.sinks.upsert import (
        KeyedTable,
        compact_snapshot,
    )

    root = str(tmp_path / "kts")
    t = KeyedTable(spark, root, record_key="k", precombine="pre")
    data = spark.range(4000).select(
        F.col("id").alias("k"),
        # ~800 distinct secondary values, each in ~1-2 of 8 files
        F.concat(
            F.lit("s"), ((F.col("id") * 48271) % 797).cast("string")
        ).alias("sec"),
        ((F.col("id") * 40503) % 99991).cast("double").alias("a"),
        ((F.col("id") * 2654435761) % 100003).cast("double").alias("b"),
        F.col("id").alias("pre"),
    )
    t.upsert(data)
    compact_snapshot(
        t, target_files=8, zorder_cols=["a", "b"], bloom_key=["k", "sec"]
    )
    want = t.snapshot().where(F.col("sec").isin(["s5", "s123"]))
    got, rep = t.read_where_in("sec", ["s5", "s123"], with_report=True)
    assert _rows(got) == _rows(want)
    assert 0 < rep["n_kept"] < rep["n_files"] == 8
    # read_keys still routes through the same index
    got2, rep2 = t.read_keys([17], with_report=True)
    assert _rows(got2.select("k")) == [(17,)]
    assert rep2["n_kept"] < 8

    t2 = KeyedTable(
        spark, root, record_key="k", precombine="pre",
        table_type="MERGE_ON_READ",
    )
    t2.upsert(
        spark.createDataFrame(
            [(17, "s5", -1.0, -1.0, 10**9)],
            "k long, sec string, a double, b double, pre long",
        )
    )
    got3, rep3 = t2.read_where_in("sec", ["s5"], with_report=True)
    assert rep3 == {"fallback": True}
    assert (17, -1.0) in {(r["k"], r["a"]) for r in got3.collect()}
