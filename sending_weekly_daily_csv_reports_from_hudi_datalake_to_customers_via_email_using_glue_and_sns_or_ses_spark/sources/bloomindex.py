"""Per-file Bloom-filter key index — Hudi's BLOOM index (SURVEY.md
§2.5 P7, ``hoodie.index.type=BLOOM``) for the emulation's immutable
parquet dirs, completing the index family:

  * BUCKET (``..sinks.filegroups.BucketedTable``) routes keys by hash
    arithmetic — no per-file metadata at all, but the bucket count is
    fixed at table creation;
  * col_stats (``.colstats``) prunes by min/max — powerful exactly
    where the LAYOUT clusters the column, useless for point lookups
    on a key the layout scattered (a z-order over other columns
    leaves every file spanning the full key range);
  * BLOOM (this module) answers "which files MAY contain these keys"
    for arbitrary layouts: ~10 bits per key of index regardless of
    clustering, false positives only (a miss is definitive — the
    property upsert-style workloads need: most files answer "no" and
    are never opened).

Mechanics (everything hot is JVM codegen — no Python UDF anywhere):

  * build: one scan of the key column emits, per row and per hash
    seed j < k, the bit ``pmod(xxhash64(j, key_string), m)``;
    ``collect_set`` per (file, seed-agnostic) gives each file's set
    bits (bounded by m), and the driver packs them into a bitmap —
    ``_bloom.json`` stores base64 bitmaps + (m, k) per dir. The
    distinct partial-aggregate absorbs the k× row fan-out map-side
    (rows of one parquet file live in one scan partition).
  * probe: ONE tiny Spark job hashes the probe keys with the same
    ``xxhash64(j, key)`` expressions (hash parity with the build side
    by construction — no Python reimplementation of xxhash to drift),
    then membership math runs driver-side: Python's ``%`` on a
    non-negative modulus equals Spark's ``pmod`` for signed longs.
    Files where NO probe key has all k bits set are skipped; the
    survivors are scanned in one multi-path read with the exact
    ``isin`` filter applied (false positives cost a scan, never a
    wrong row).

Sizing: with k = 7 hashes, m ≈ 10 bits per key gives ~1% false
positives (the classic (1-e^{-kn/m})^k curve; Hudi's
``hoodie.index.bloom.num_entries``/``fpp`` trade the same knobs). The
default m = 2^17 bits (16 KiB/file) carries ~13k keys per file at 1%.
A 10^5-file snapshot therefore costs ~1.6 GB of bloom JSON — real
Hudi keeps blooms in parquet footers / the metadata table's
``bloom_filters`` partition for that reason; the one-document manifest
here is the emulation trade (same as the slice manifests), and m is a
knob when it matters.

tests/test_bloomindex.py checks exact-lookup equivalence on a layout
col_stats CANNOT prune (key scattered by a z-order over other
columns), measures the skipped-file counts, and pins the
false-positive rate against the analytic bound.
"""

from __future__ import annotations

import base64

from pyspark.sql import SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from .skipindex import (
    file_ref,
    load_manifest,
    read_refs,
    write_manifest,
)

#: manifest name, underscore-prefixed (ignored by parquet discovery)
BLOOM_NAME = "_bloom.json"


def _bit_exprs(key_col: str, m: int, k: int) -> list:
    """The k bit positions of one key: ``pmod(xxhash64(j, key), m)``.
    Seed-FIRST (``xxhash64(j, key)``): Spark's multi-arg xxhash64
    folds left, so putting the seed second would make every hash a
    pure function of hash(key) and collapse the k functions into one
    (the exact_substring_pairs independence caveat). The key is cast
    to string so int/bigint writers and probers hash identically."""
    key = F.col(key_col).cast("string")
    return [
        F.pmod(F.xxhash64(F.lit(j), key), F.lit(m)).cast("long")
        for j in range(k)
    ]


#: auto-sizing bounds: never below 2 KiB/file (tiny files round up to a
#: still-negligible bitmap), never above 2 MiB/file (a 10^5-file
#: snapshot stays ≤ ~27 GB of index even at the rail — past it, split
#: files or raise bits explicitly)
_MIN_M_BITS = 1 << 14
_MAX_M_BITS = 1 << 24


def write_bloom(
    spark: SparkSession,
    path: str,
    key_cols: str | list[str],
    m_bits: int | None = None,
    num_hashes: int = 7,
    bits_per_key: int = 10,
) -> dict:
    """Build and persist the per-file Bloom index over one or several
    columns for every parquet file under ``path`` (immutable dirs only
    — same contract as colstats). Returns the manifest. Multiple
    columns make this Hudi 1.0's SECONDARY-index story: the record key
    plus any equality-probed dimension columns, indexed in the SAME
    single scan (per-row work is k hashes per column), queried
    per-column at read time (``KeyedTable.read_where_in``).

    ``m_bits=None`` (default) auto-sizes the bitmap from the data: one
    column-pruned count of rows per file, then m = the next power of
    two ≥ ``bits_per_key`` × the LARGEST file's row count (one global
    m keeps probe hashing uniform; sizing to the largest file keeps
    the worst file at the target rate and only over-provisions the
    rest — and rows bound distinct values, so one m serves every
    column). 10 bits/key with k = 7 sits at the classic ~1% false-
    positive point — the fixed-default footgun this replaces kept
    ~2/3 of files at 37k keys/file where the auto-size keeps the
    true-hit count. Hudi exposes the same pair as
    ``hoodie.index.bloom.num_entries`` / ``fpp``."""
    cols = [key_cols] if isinstance(key_cols, str) else list(key_cols)
    if not cols or len(set(cols)) != len(cols):
        raise ValueError(f"bloom: need distinct columns, got {cols!r}")
    if m_bits is not None and m_bits < 8 or num_hashes < 1:
        raise ValueError(
            f"bloom: need m_bits >= 8 and num_hashes >= 1, got "
            f"{m_bits}/{num_hashes}"
        )
    df = spark.read.parquet(path)
    for c in cols:
        if c not in df.columns:
            raise ValueError(
                f"bloom: key column {c!r} not in schema {df.columns}"
            )
    if m_bits is None:
        if bits_per_key < 1:
            raise ValueError(f"bloom: bits_per_key >= 1, got {bits_per_key}")
        per_file = (
            df.groupBy(F.input_file_name()).count().agg(F.max("count"))
        ).first()[0]
        need = max(int(per_file or 1) * bits_per_key, _MIN_M_BITS)
        m_bits = _MIN_M_BITS
        while m_bits < need and m_bits < _MAX_M_BITS:
            m_bits <<= 1
    # one scan for every column: explode (column-id, bit) pairs, set
    # bits per (file, column); the distinct partial-agg absorbs the
    # |cols| x k fan-out map-side as before
    pairs = [
        F.struct(F.lit(ci).alias("c"), b.alias("b"))
        for ci, col in enumerate(cols)
        for b in _bit_exprs(col, m_bits, num_hashes)
    ]
    bits = (
        df.select(
            F.input_file_name().alias("__f"),
            F.explode(F.array(*pairs)).alias("__cb"),
        )
        .groupBy("__f", F.col("__cb.c").alias("__c"))
        .agg(F.collect_set("__cb.b").alias("__bits"))
        .collect()
    )
    files: dict[str, dict] = {}
    for r in bits:
        bitmap = bytearray((m_bits + 7) // 8)
        for b in r["__bits"]:
            bitmap[b >> 3] |= 1 << (b & 7)
        ref = file_ref(path, r["__f"])
        files.setdefault(ref, {})[cols[r["__c"]]] = base64.b64encode(
            bytes(bitmap)
        ).decode("ascii")
    if len(cols) == 1:
        # single-column: keep the v1 layout (existing manifests and
        # their readers stay valid)
        manifest = {
            "version": 1,
            "key_col": cols[0],
            # the key's Spark type (DDL string), so probe values hash
            # through the SAME type-to-string cast the build used
            # (Python str() disagrees with Spark's cast on doubles)
            "key_type": df.schema[cols[0]].dataType.simpleString(),
            "m_bits": m_bits,
            "num_hashes": num_hashes,
            "files": {ref: by_col[cols[0]] for ref, by_col in files.items()},
        }
    else:
        manifest = {
            "version": 2,
            "columns": {
                c: df.schema[c].dataType.simpleString() for c in cols
            },
            "m_bits": m_bits,
            "num_hashes": num_hashes,
            "files": files,
        }
    write_manifest(spark, path, BLOOM_NAME, manifest)
    return manifest


def load_bloom(spark: SparkSession, path: str) -> dict | None:
    return load_manifest(spark, path, BLOOM_NAME)


def bloom_columns(manifest: dict) -> dict:
    """column -> Spark type DDL string, across manifest versions."""
    if manifest.get("version") == 2:
        return dict(manifest["columns"])
    out = {}
    if "key_col" in manifest:
        out[manifest["key_col"]] = manifest.get("key_type", "string")
    return out


def _col_bitmaps(manifest: dict, col: str) -> dict:
    """ref -> base64 bitmap for one indexed column."""
    if manifest.get("version") == 2:
        return {
            ref: by_col[col]
            for ref, by_col in manifest["files"].items()
            if col in by_col
        }
    return dict(manifest["files"])


def _resolve_col(manifest: dict, col: str | None) -> str | None:
    """The indexed column to probe: an explicit name (None if absent
    from the index), or the sole indexed column when unambiguous."""
    cols = bloom_columns(manifest)
    if col is None:
        if len(cols) != 1:
            raise ValueError(
                f"bloom: index covers {sorted(cols)} — name the column"
            )
        return next(iter(cols))
    return col if col in cols else None


def _probe_positions(
    spark: SparkSession, keys: list, manifest: dict, col: str
) -> dict:
    """key index -> its k bit positions, via ONE row-parallel Spark job
    over the probe keys (|keys| rows — point lookups are small by
    definition). Probe values are carried in the COLUMN'S OWN Spark
    type (from the manifest) and cast to string by the same
    expressions the build used — hash parity by construction for every
    key type, not just the ones where Python's str() happens to
    agree."""
    m, k = manifest["m_bits"], manifest["num_hashes"]
    type_ddl = bloom_columns(manifest).get(col)
    legacy = manifest.get("version") != 2 and "key_type" not in manifest
    key_type = (
        T.StringType() if legacy else T._parse_datatype_string(type_ddl)
    )
    schema = T.StructType(
        [
            T.StructField("__i", T.IntegerType()),
            T.StructField("__k", key_type),
        ]
    )
    rows_in = (
        [(i, str(x)) for i, x in enumerate(keys)]  # legacy stringly path
        if legacy
        else list(enumerate(keys))
    )
    kdf = spark.createDataFrame(rows_in, schema)
    rows = kdf.select(
        "__i", F.array(*_bit_exprs("__k", m, k)).alias("__pos")
    ).collect()
    return {r["__i"]: list(r["__pos"]) for r in rows}


def _probe_manifest(
    spark: SparkSession, manifest: dict, keys: list, col: str
) -> tuple[list[str], dict]:
    """The membership math over an already-loaded manifest: files where
    at least one probe key has all k bits set in ``col``'s bitmap.
    Empty ``keys`` keep nothing — the vacuous truth matching
    ``isin([]) = false``."""
    bitmaps = _col_bitmaps(manifest, col)
    report = {"n_files": len(manifest["files"]), "n_kept": 0}
    if not keys:
        return [], report
    positions = _probe_positions(spark, keys, manifest, col)
    kept = []
    for rel, b64 in bitmaps.items():
        bitmap = base64.b64decode(b64)
        hit = any(
            all(bitmap[p >> 3] & (1 << (p & 7)) for p in pos)
            for pos in positions.values()
        )
        if hit:
            kept.append(rel)
    report["n_kept"] = len(kept)
    return sorted(kept), report


def probe_bloom(
    spark: SparkSession, path: str, keys: list, col: str | None = None
) -> tuple[list[str] | None, dict]:
    """Files that MAY contain at least one of ``keys`` in ``col`` (the
    sole indexed column when omitted), plus a report. Returns
    (None, {"fallback": True}) when the dir has no manifest or the
    column isn't indexed (caller must full-scan); empty ``keys`` keep
    zero files (``isin([])`` is false everywhere)."""
    manifest = load_bloom(spark, path)
    if manifest is None:
        return None, {"fallback": True}
    resolved = _resolve_col(manifest, col)
    if resolved is None:
        return None, {"fallback": True}
    return _probe_manifest(spark, manifest, keys, resolved)


def read_keys_bloom(
    spark: SparkSession,
    path: str,
    key_col: str,
    keys: list,
    with_report: bool = False,
):
    """Point lookup through the Bloom index: semantically IDENTICAL to
    ``spark.read.parquet(path).where(col(key_col).isin(keys))`` — the
    index only shrinks the file list (false positives add scanned
    files, never rows: the exact isin filter always applies). Falls
    back to the full-scan filter when the dir carries no index or the
    index doesn't cover ``key_col`` (secondary lookups route here
    too — ``KeyedTable.read_where_in``)."""
    exact = F.col(key_col).isin(keys) if keys else F.lit(False)
    manifest = load_bloom(spark, path)
    resolved = None if manifest is None else _resolve_col(manifest, key_col)
    if resolved is None:
        df = spark.read.parquet(path).where(exact)
        return (df, {"fallback": True}) if with_report else df
    kept, report = _probe_manifest(spark, manifest, keys, resolved)
    df = read_refs(spark, path, kept, manifest["files"], exact)
    return (df, report) if with_report else df
