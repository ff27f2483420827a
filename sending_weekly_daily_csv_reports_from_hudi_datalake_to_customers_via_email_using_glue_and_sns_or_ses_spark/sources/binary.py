"""Binary-file source for multimodal ingestion: raw media files on
disk/object storage → the engine's binary-column table shape
(media_id, blob, mime, n_bytes) that operators/multimodal.py processes.

Built on Spark's ``binaryFile`` datasource — distributed file listing +
content loading, with pathGlobFilter pushdown for format selection.
At 100 TB of media, ``maxBytesPerPartition``-style sizing comes from
spark.sql.files.maxPartitionBytes; huge single objects should instead be
registered as (uri, offset, length) pointers and ranged-read inside the
decode UDF (see media_frame_sample's pointer math).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

#: public file-format magic signatures → mime (sniffed from content,
#: never trusted from the extension). RIFF is handled separately: it is
#: a CONTAINER magic — bytes 9-12 name the payload (WAVE/WEBP/AVI).
_MAGIC_TO_MIME = {
    "89504E47": "image/png",
    "FFD8FF": "image/jpeg",
    "47494638": "image/gif",
}

_RIFF_SUBTYPE_TO_MIME = {
    "WAVE": "audio/wav",
    "WEBP": "image/webp",
    "AVI ": "video/x-msvideo",
}


def sniff_mime(blob: F.Column) -> F.Column:
    """Magic-byte mime detection as a column expression.

    Built as ONE chained ``when`` evaluated most-specific-first (a
    ``when().otherwise(prev)`` loop would invert the priority: the last
    wrapping becomes the first test, so the SHORTEST magic would win
    whenever one magic prefixes another)."""
    hexpfx = F.upper(F.hex(F.substring(blob, 1, 4)))
    riff = hexpfx.startswith("52494646")
    subtype = F.substring(blob, 9, 4).cast("string")
    expr: F.Column | None = None
    for tag, mime in _RIFF_SUBTYPE_TO_MIME.items():
        cond = riff & (subtype == F.lit(tag))
        expr = F.when(cond, mime) if expr is None else expr.when(cond, mime)
    expr = expr.when(riff, "application/x-riff")
    for magic, mime in sorted(_MAGIC_TO_MIME.items(), key=lambda kv: -len(kv[0])):
        expr = expr.when(hexpfx.startswith(magic), mime)
    return expr.otherwise("application/octet-stream")


def read_media_dir(
    spark: SparkSession, path: str, glob: str | None = None
) -> DataFrame:
    """Load a directory of media files as the engine's media table."""
    reader = spark.read.format("binaryFile")
    if glob:
        reader = reader.option("pathGlobFilter", glob)
    raw = reader.load(path)
    return raw.select(
        F.xxhash64("path").alias("media_id"),
        F.col("path").alias("uri"),
        F.col("content").alias("blob"),
        sniff_mime(F.col("content")).alias("mime"),
        F.col("length").alias("n_bytes"),
        F.col("modificationTime").alias("modified_at"),
    )
