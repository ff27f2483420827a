"""Shared scaffolding for the per-file skipping indexes (col_stats and
Bloom): manifest file-reference encoding, loading, and the
zero-survivor empty read. One implementation so a path-handling fix
lands once — both manifests store the same kind of file reference and
resolve it the same way at read time."""

from __future__ import annotations

import json
import os
from urllib.parse import unquote, urlparse

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from ..fs import fs_for


def file_ref(base: str, uri_str: str) -> str:
    """The manifest key for one data file (from ``input_file_name()``):
    relative to ``base`` for local/file URIs; the FULL scheme-qualified
    URI for object stores — a bare path would lose the scheme and
    bucket and be unresolvable at read time."""
    uri = urlparse(uri_str)
    fpath = unquote(uri.path)
    if uri.scheme in ("", "file"):
        return os.path.relpath(fpath, os.path.abspath(base))
    return f"{uri.scheme}://{uri.netloc}{fpath}"


def resolve_ref(base: str, ref: str) -> str:
    """Back from manifest key to a readable path: full URIs pass
    through verbatim, relative refs join under the snapshot dir."""
    return ref if "://" in ref else os.path.join(base, ref)


def local_size(uri_str: str) -> int:
    """Best-effort byte size (local filesystems only — object-store
    sizes would need a listing; 0 keeps the report additive)."""
    uri = urlparse(uri_str)
    if uri.scheme not in ("", "file"):
        return 0
    try:
        return os.path.getsize(unquote(uri.path))
    except OSError:
        return 0


def load_manifest(spark: SparkSession, path: str, name: str) -> dict | None:
    fs = fs_for(spark)
    mpath = os.path.join(path, name)
    if not fs.exists(mpath):
        return None
    return json.loads(fs.read_text(mpath))


def write_manifest(
    spark: SparkSession, path: str, name: str, manifest: dict
) -> None:
    fs_for(spark).write_text_atomic(
        os.path.join(path, name), json.dumps(manifest)
    )


def read_refs(
    spark: SparkSession,
    base: str,
    refs: list[str],
    all_refs,
    residual,
):
    """The pruned multi-path read all skipping indexes share: scan only
    ``refs`` (with ``base`` as basePath so partition columns survive),
    applying the exact ``residual`` filter. Zero survivors read ONE
    indexed file's footer under ``lit(False)`` for the schema instead
    of listing the whole dir; a dir the manifest says is empty falls
    back to the plain read (schema must come from somewhere)."""
    reader = spark.read.option("basePath", base)
    if not refs:
        any_ref = next(iter(all_refs), None)
        if any_ref is None:
            return spark.read.parquet(base).where(residual)
        return reader.parquet(resolve_ref(base, any_ref)).where(F.lit(False))
    return reader.parquet(
        *[resolve_ref(base, r) for r in refs]
    ).where(residual)
