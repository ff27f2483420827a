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
import json
import os
from urllib.parse import unquote, urlparse

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from ..fs import fs_for

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
    key_col: str,
    m_bits: int | None = None,
    num_hashes: int = 7,
    bits_per_key: int = 10,
) -> dict:
    """Build and persist the per-file Bloom index over ``key_col`` for
    every parquet file under ``path`` (immutable dirs only — same
    contract as colstats). Returns the manifest.

    ``m_bits=None`` (default) auto-sizes the bitmap from the data: one
    column-pruned count of rows per file, then m = the next power of
    two ≥ ``bits_per_key`` × the LARGEST file's row count (one global
    m keeps probe hashing uniform; sizing to the largest file keeps
    the worst file at the target rate and only over-provisions the
    rest). 10 bits/key with k = 7 sits at the classic ~1% false-
    positive point — the fixed-default footgun this replaces kept
    ~2/3 of files at 37k keys/file where the auto-size keeps the
    true-hit count. Hudi exposes the same pair as
    ``hoodie.index.bloom.num_entries`` / ``fpp``."""
    if m_bits is not None and m_bits < 8 or num_hashes < 1:
        raise ValueError(
            f"bloom: need m_bits >= 8 and num_hashes >= 1, got "
            f"{m_bits}/{num_hashes}"
        )
    df = spark.read.parquet(path)
    if key_col not in df.columns:
        raise ValueError(
            f"bloom: key column {key_col!r} not in schema {df.columns}"
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
    bits = (
        df.select(
            F.input_file_name().alias("__f"),
            F.explode(
                F.array(*_bit_exprs(key_col, m_bits, num_hashes))
            ).alias("__bit"),
        )
        .groupBy("__f")
        .agg(F.collect_set("__bit").alias("__bits"))
        .collect()
    )
    base = os.path.abspath(path)
    files: dict[str, str] = {}
    for r in bits:
        uri = urlparse(r["__f"])
        fpath = unquote(uri.path)
        rel = (
            os.path.relpath(fpath, base)
            if uri.scheme in ("", "file")
            else fpath
        )
        bitmap = bytearray((m_bits + 7) // 8)
        for b in r["__bits"]:
            bitmap[b >> 3] |= 1 << (b & 7)
        files[rel] = base64.b64encode(bytes(bitmap)).decode("ascii")
    manifest = {
        "version": 1,
        "key_col": key_col,
        "m_bits": m_bits,
        "num_hashes": num_hashes,
        "files": files,
    }
    fs_for(spark).write_text_atomic(
        os.path.join(path, BLOOM_NAME), json.dumps(manifest)
    )
    return manifest


def load_bloom(spark: SparkSession, path: str) -> dict | None:
    fs = fs_for(spark)
    mpath = os.path.join(path, BLOOM_NAME)
    if not fs.exists(mpath):
        return None
    return json.loads(fs.read_text(mpath))


def _probe_positions(
    spark: SparkSession, keys: list, m: int, k: int
) -> dict:
    """key -> its k bit positions, via ONE row-parallel Spark job over
    the probe keys (hash parity with the build expressions; the job is
    |keys| rows — point lookups are small by definition)."""
    kdf = spark.createDataFrame([(str(x),) for x in keys], "__k string")
    rows = kdf.select(
        "__k", F.array(*_bit_exprs("__k", m, k)).alias("__pos")
    ).collect()
    return {r["__k"]: list(r["__pos"]) for r in rows}


def probe_bloom(
    spark: SparkSession, path: str, keys: list
) -> tuple[list[str] | None, dict]:
    """Files that MAY contain at least one of ``keys`` per the index,
    plus a report. Returns (None, {"fallback": True}) when the dir
    has no manifest (caller must full-scan)."""
    if not keys:
        raise ValueError("probe_bloom: need at least one key")
    manifest = load_bloom(spark, path)
    if manifest is None:
        return None, {"fallback": True}
    m, k = manifest["m_bits"], manifest["num_hashes"]
    positions = _probe_positions(spark, keys, m, k)
    kept = []
    for rel, b64 in manifest["files"].items():
        bitmap = base64.b64decode(b64)
        hit = any(
            all(bitmap[p >> 3] & (1 << (p & 7)) for p in pos)
            for pos in positions.values()
        )
        if hit:
            kept.append(rel)
    return sorted(kept), {
        "n_files": len(manifest["files"]),
        "n_kept": len(kept),
    }


def read_keys_bloom(
    spark: SparkSession,
    path: str,
    key_col: str,
    keys: list,
    with_report: bool = False,
):
    """Point lookup through the Bloom index: semantically IDENTICAL to
    ``spark.read.parquet(path).where(col(key).isin(keys))`` — the
    index only shrinks the file list (false positives add scanned
    files, never rows: the exact isin filter always applies). Falls
    back to the full-scan filter when the dir carries no index."""
    kept, report = probe_bloom(spark, path, keys)
    exact = F.col(key_col).isin(keys)
    if kept is None:
        df = spark.read.parquet(path).where(exact)
    elif not kept:
        manifest = load_bloom(spark, path)
        any_rel = next(iter(manifest["files"]), None)
        if any_rel is None:
            df = spark.read.parquet(path).where(exact)
        else:
            df = (
                spark.read.option("basePath", path)
                .parquet(os.path.join(path, any_rel))
                .where(F.lit(False))
            )
    else:
        df = (
            spark.read.option("basePath", path)
            .parquet(*[os.path.join(path, rel) for rel in kept])
            .where(exact)
        )
    return (df, report) if with_report else df
