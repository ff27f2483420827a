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
#: never trusted from the extension)
_MAGIC_TO_MIME = {
    "89504E47": "image/png",
    "FFD8FF": "image/jpeg",
    "47494638": "image/gif",
    "52494646": "audio/wav",
}


def sniff_mime(blob: F.Column) -> F.Column:
    """Magic-byte mime detection as a column expression."""
    hex8 = F.upper(F.hex(F.substring(blob, 1, 4)))
    out = F.lit("application/octet-stream")
    for magic, mime in sorted(_MAGIC_TO_MIME.items(), key=lambda kv: -len(kv[0])):
        out = F.when(hex8.startswith(magic), F.lit(mime)).otherwise(out)
    return out


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
