"""Column-stats file index + data-skipping reads — Hudi's metadata
table ``col_stats`` partition made real (SURVEY.md §2.5 P8; the
reference enables ``hoodie.metadata.enable`` and leaves the rest to
Hudi, generate_hudi_table.py:150-167).

Spark already skips parquet ROW GROUPS via pushed filters, but it must
still list the directory and open every footer to do it — at 100 TB a
snapshot is 10⁴-10⁵ files, and "open every footer" is 10⁵ S3 GETs per
query. Hudi's answer is a table-level index: per-FILE min/max/null
stats collected at write time, so the reader picks the surviving file
set from ONE small manifest and never touches a pruned file. This
module is that index for the emulation's immutable snapshot dirs:

  * :func:`write_colstats` — one column-pruned scan of a just-written
    parquet dir (the write path already paid the full write; the stats
    scan reads only the indexed columns, i.e. footer + a few columns),
    aggregated per ``input_file_name`` — a bounded driver collect of
    n_files rows — and persisted as ``_colstats.json`` INSIDE the dir
    (underscore-prefixed: Spark's file index ignores it). The manifest
    rides the snapshot's atomic rename, so a published snapshot either
    has its complete index or none.
  * :func:`read_skipping` — resolve the manifest, keep only files
    whose [min, max] can intersect the predicates (NULL-aware: a
    range predicate matches no NULLs, so an all-null or empty file
    prunes), and scan the survivors in one multi-path read with
    ``basePath`` set (hive partition columns survive file-level
    reads). The residual filter is ALWAYS applied — pruning is an
    optimization, never the semantics — and a skipping report
    (files/bytes total vs kept) is available on request: the
    no-silent-caps principle inverted, "how much did the index save"
    as data.

Pruning only fires where the LAYOUT gives files value-locality —
exactly what ``functions/layout.py``'s z-order (or a plain
``repartitionByRange``) produces, and why ``compact_snapshot`` is the
integration point (clustering and indexing are two halves of one
feature; a hash-bucketed layout has no per-file locality to index,
which is why :class:`..sinks.filegroups.BucketedTable` routes point
lookups by bucket arithmetic instead). tests/test_colstats.py checks
the reader is EQUIVALENT to a full-scan filter and MEASURES the
pruned file counts; BASELINE.md records the sf0.1 numbers.
"""

from __future__ import annotations

import datetime
import decimal
import math

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from .skipindex import (
    file_ref,
    load_manifest,
    local_size,
    read_refs,
    write_manifest,
)

#: manifest file name, underscore-prefixed so Spark's parquet file
#: discovery treats it as metadata and never reads it as data
COLSTATS_NAME = "_colstats.json"

_ORDERABLE = (
    T.NumericType,
    T.StringType,
    T.DateType,
    T.TimestampType,
    T.TimestampNTZType,
    T.BooleanType,
)


def _check_orderable(df: DataFrame, cols: list[str]) -> None:
    """Fail at the API boundary (not deep inside an agg) when a column
    is missing or has no total order worth indexing (array/map/struct/
    binary min-max would not support range pruning anyway)."""
    fields = {f.name: f.dataType for f in df.schema.fields}
    for c in cols:
        if c not in fields:
            raise ValueError(
                f"colstats: column {c!r} not in schema "
                f"{sorted(fields)}"
            )
        if not isinstance(fields[c], _ORDERABLE):
            raise ValueError(
                f"colstats: column {c!r} has type {fields[c].simpleString()}"
                " — index numeric, string, boolean, date, or timestamp "
                "columns (range pruning needs a total order)"
            )


def _enc(v):
    """JSON-encode a min/max value with a type tag (stats round-trip
    through the manifest without losing date/timestamp/decimal-ness)."""
    if v is None:
        return None
    if isinstance(v, bool) or isinstance(v, (int, str)):
        return {"t": "p", "v": v}
    if isinstance(v, float):
        # NaN/Inf are not JSON — tag them (NaN stats mean "no usable
        # bound": the pruner treats them as unbounded)
        if math.isnan(v):
            return {"t": "f", "v": "nan"}
        if math.isinf(v):
            return {"t": "f", "v": "inf" if v > 0 else "-inf"}
        return {"t": "p", "v": v}
    if isinstance(v, datetime.datetime):
        return {"t": "dt", "v": v.isoformat()}
    if isinstance(v, datetime.date):
        return {"t": "d", "v": v.isoformat()}
    if isinstance(v, decimal.Decimal):
        return {"t": "dec", "v": str(v)}
    raise TypeError(f"colstats: cannot encode stat value {v!r}")


def _dec_val(e):
    if e is None:
        return None
    t, v = e["t"], e["v"]
    if t == "p":
        return v
    if t == "f":
        return float(v)
    if t == "dt":
        return datetime.datetime.fromisoformat(v)
    if t == "d":
        return datetime.date.fromisoformat(v)
    if t == "dec":
        return decimal.Decimal(v)
    raise ValueError(f"colstats: unknown value tag {t!r}")


def _norm_bound(v):
    """Normalize a user predicate bound for comparison against decoded
    stats: tz-aware datetimes become naive UTC (Spark collects
    session-UTC naive timestamps)."""
    if isinstance(v, datetime.datetime) and v.tzinfo is not None:
        return v.astimezone(datetime.timezone.utc).replace(tzinfo=None)
    return v


def _is_nan(v) -> bool:
    return isinstance(v, float) and math.isnan(v)


def collect_file_stats(
    spark: SparkSession, path: str, cols: list[str]
) -> dict:
    """Per-file (rows, bytes, per-col min/max/nulls) for every parquet
    file under ``path`` — ONE scan reading only the indexed columns
    (column pruning does the rest), grouped by ``input_file_name``,
    collected driver-side (n_files rows — bounded by the layout, and a
    layout with 10⁶ files per snapshot dir has bigger problems).
    Returns the manifest dict (not yet persisted)."""
    df = spark.read.parquet(path)
    _check_orderable(df, cols)
    aggs = [F.count(F.lit(1)).alias("__rows")]
    for i, c in enumerate(cols):
        aggs.append(F.min(c).alias(f"__mn{i}"))
        aggs.append(F.max(c).alias(f"__mx{i}"))
        aggs.append(
            F.sum(F.col(c).isNull().cast("long")).alias(f"__nl{i}")
        )
    rows = (
        df.select(F.input_file_name().alias("__f"), *cols)
        .groupBy("__f")
        .agg(*aggs)
        .collect()
    )
    files: dict[str, dict] = {}
    for r in rows:
        rel = file_ref(path, r["__f"])
        # best-effort (local fs only): lets the report count bytes
        nbytes = local_size(r["__f"])
        files[rel] = {
            "rows": r["__rows"],
            "bytes": nbytes,
            "stats": {
                c: {
                    "min": _enc(r[f"__mn{i}"]),
                    "max": _enc(r[f"__mx{i}"]),
                    "nulls": r[f"__nl{i}"],
                }
                for i, c in enumerate(cols)
            },
        }
    return {"version": 1, "cols": list(cols), "files": files}


def write_colstats(
    spark: SparkSession, path: str, cols: list[str]
) -> dict:
    """Collect and persist the ``_colstats.json`` manifest inside
    ``path`` (atomic write via the FS abstraction — works on file://,
    hdfs://, s3a://). Call AFTER the dir's files are final: snapshot
    dirs here are immutable once renamed into place, so the manifest
    can never go stale. Returns the manifest."""
    manifest = collect_file_stats(spark, path, cols)
    write_manifest(spark, path, COLSTATS_NAME, manifest)
    return manifest


def load_colstats(spark: SparkSession, path: str) -> dict | None:
    """The dir's manifest, or None when it was written without one
    (readers then fall back to a full scan — skipping is always an
    optimization, never a requirement)."""
    return load_manifest(spark, path, COLSTATS_NAME)


def _file_survives(entry: dict, predicates: dict) -> bool:
    """Can ANY row of the file satisfy every range predicate? Missing
    stats for a predicated column keep the file (conservative);
    NaN bounds are unusable and keep the file; an empty or (for a
    predicated column) all-NULL file is pruned — SQL range predicates
    match no NULLs."""
    if entry["rows"] == 0:
        return False
    for col, (lo, hi) in predicates.items():
        st = entry["stats"].get(col)
        if st is None:
            continue
        mn, mx = _dec_val(st["min"]), _dec_val(st["max"])
        if mn is None and mx is None:
            return False  # every value NULL → no range match possible
        lo, hi = _norm_bound(lo), _norm_bound(hi)
        if lo is not None and not _is_nan(mx) and mx is not None and mx < lo:
            return False
        if hi is not None and not _is_nan(mn) and mn is not None and mn > hi:
            return False
    return True


def prune_files(manifest: dict, predicates: dict) -> tuple[list[str], dict]:
    """Apply :func:`_file_survives` over the manifest. Returns
    (kept relative paths, skipping report). The report — files and
    bytes, total vs kept — is the index's observability surface: at
    100 TB "the index saved 97% of the scan" should be a number in a
    log line, not a belief."""
    kept, kept_bytes, total_bytes = [], 0, 0
    for rel, entry in manifest["files"].items():
        total_bytes += entry.get("bytes", 0)
        if _file_survives(entry, predicates):
            kept.append(rel)
            kept_bytes += entry.get("bytes", 0)
    report = {
        "n_files": len(manifest["files"]),
        "n_kept": len(kept),
        "bytes_total": total_bytes,
        "bytes_kept": kept_bytes,
    }
    return sorted(kept), report


def predicates_to_filter(predicates: dict) -> Column:
    """The residual filter the pruned read still applies: closed-range
    ``lo <= col <= hi`` per entry (one side may be None). Also the
    fallback filter when a dir has no manifest — ONE definition of the
    semantics for both paths."""
    cond = F.lit(True)
    for col, (lo, hi) in predicates.items():
        if lo is not None:
            cond = cond & (F.col(col) >= F.lit(_norm_bound(lo)))
        if hi is not None:
            cond = cond & (F.col(col) <= F.lit(_norm_bound(hi)))
    return cond


def _validate_predicates(predicates: dict) -> None:
    if not predicates:
        raise ValueError(
            "read_skipping: predicates must be a non-empty "
            "{col: (lo, hi)} dict (use spark.read.parquet for a full scan)"
        )
    for col, bounds in predicates.items():
        if not isinstance(bounds, tuple) or len(bounds) != 2:
            raise ValueError(
                f"read_skipping: predicate for {col!r} must be a "
                f"(lo, hi) tuple (None for an unbounded side), got "
                f"{bounds!r}"
            )
        if bounds == (None, None):
            raise ValueError(
                f"read_skipping: predicate for {col!r} is unbounded on "
                "both sides — drop the entry instead"
            )


def read_skipping(
    spark: SparkSession,
    path: str,
    predicates: dict,
    with_report: bool = False,
):
    """Data-skipping read of a parquet dir: semantically IDENTICAL to
    ``spark.read.parquet(path).filter(lo <= col <= hi ...)`` — the
    manifest only shrinks the file list the scan plans over. With no
    manifest, falls back to exactly that full-scan filter.

    ``predicates`` is ``{col: (lo, hi)}``, closed ranges, None for an
    unbounded side; equality is ``(v, v)``. ``with_report=True``
    additionally returns the skipping report dict (see
    :func:`prune_files`; fallback reads report kept == total with
    ``"fallback": True``).
    """
    _validate_predicates(predicates)
    manifest = load_colstats(spark, path)
    residual = predicates_to_filter(predicates)
    if manifest is None:
        df = spark.read.parquet(path).where(residual)
        if with_report:
            return df, {"fallback": True}
        return df
    kept, report = prune_files(manifest, predicates)
    df = read_refs(spark, path, kept, manifest["files"], residual)
    if with_report:
        return df, report
    return df
