"""Multimodal-column operators (LLM-pipeline extension set).

Model: media is an opaque ``binary`` column plus typed metadata columns
(mime, width/height/duration, …) — the lakehouse-native layout (media
inline for small blobs; at 100 TB, the binary column holds either the
bytes or a (uri, offset, length) pointer struct and the scan stays the
same shape).

The testdata has no binary table, so ``media_from_documents`` fabricates
one deterministically (utf-8 bytes of the text, a per-row synthetic
"format" tag) — the point is the Spark-side plumbing: binary schema,
magic-byte sniffing with built-ins, Arrow-batched mapInPandas for the
decode/feature stage, partition sizing.

The image decode dispatches on an import-try (`_pil`): REAL PIL decode
when the lib is installed on workers; in this container (no
PIL/ffmpeg) `decode_image_batch` raises NotImplementedError unless
``fake=True``, in which case it emits a deterministic fake feature
vector derived from the bytes with the real decoder's exact schema —
the distributed plumbing around it is real and tested either way.
"""

from __future__ import annotations

import sys
from collections.abc import Iterator

import pandas as pd
from pyspark import cloudpickle
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# decode_image_batch is referenced from mapInPandas closures that run on
# Python workers; register this module for by-value pickling so workers
# don't need the package importable (driver cwd independence)
cloudpickle.register_pickle_by_value(sys.modules[__name__])

from ..catalog import load_table
from . import query

#: magic prefixes for sniffing (public file-format signatures)
_MAGIC = {
    "89504E47": "image/png",
    "FFD8FF": "image/jpeg",
    "47494638": "image/gif",
    "52494646": "audio/wav",  # RIFF
}


def media_from_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic binary-column table fabricated from documents:
    (media_id, blob binary, mime string, n_bytes long)."""
    d = load_table(spark, sf_dir, "documents")
    return d.select(
        F.col("doc_id").alias("media_id"),
        F.encode("text", "utf-8").alias("blob"),
        F.when(F.col("doc_id") % 3 == 0, "image/png")
        .when(F.col("doc_id") % 3 == 1, "image/jpeg")
        .otherwise("audio/wav")
        .alias("mime"),
        F.length(F.encode("text", "utf-8")).cast("long").alias("n_bytes"),
    )


@query(
    "media_metadata_sniff",
    retired=True,  # r6: slot funded lm_perplexity; the sniff EXPRESSION
    # (magic-prefix hex) is still driver-hash-checked via the
    # magic_prefix column folded into media_decode_pipeline, and this
    # aggregate shape is value-checked by tests/test_retired_parity.py
    oracle="""
    SELECT
      CASE WHEN doc_id % 3 = 0 THEN 'image/png'
           WHEN doc_id % 3 = 1 THEN 'image/jpeg'
           ELSE 'audio/wav' END AS mime,
      upper(substr(hex(encode(text)), 1, 8)) AS magic_prefix,
      count(*) AS n_media,
      CAST(sum(octet_length(encode(text))) AS BIGINT) AS total_bytes,
      CAST(max(octet_length(encode(text))) AS BIGINT) AS max_bytes
    FROM documents
    GROUP BY mime, magic_prefix
    ORDER BY n_media DESC, mime ASC, magic_prefix ASC
    LIMIT 30
    """,
)
def media_metadata_sniff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Metadata sweep + format sniffing over a binary column in one
    pass: size stats per (declared mime, sniffed magic-byte prefix) —
    the triage query before any decode, and the mislabeled-blob detector
    (on real media the prefix maps through _MAGIC). Binary length and
    the hex-of-first-4-bytes sniff are JVM built-ins; blobs are never
    shipped to Python."""
    m = media_from_documents(spark, sf_dir)
    return (
        m.groupBy(
            "mime", F.upper(F.hex(F.substring("blob", 1, 4))).alias("magic_prefix")
        )
        .agg(
            F.count("*").alias("n_media"),
            F.sum("n_bytes").alias("total_bytes"),
            F.max("n_bytes").alias("max_bytes"),
        )
        .orderBy(F.desc("n_media"), F.asc("mime"), F.asc("magic_prefix"))
        .limit(30)
    )


def _pil():
    """Import-try gate for the real decoder (same dispatch pattern as
    hudi_available): PIL when installed, None in this container."""
    try:
        from PIL import Image  # noqa: PLC0415

        return Image
    except ImportError:
        return None


def decode_image_batch(blobs: pd.Series, fake: bool = False) -> pd.DataFrame:
    """Decode stage. With PIL on the worker (import-try gated) each blob
    is really opened → (width, height, brightness of a 1×1 thumbnail);
    this container has no imaging libs, so ``fake=True`` derives a
    deterministic pseudo-feature from the bytes (length + simple byte
    statistics) with the same output shape and dtypes the real decoder
    produces. The Spark-side plumbing (Arrow batches via mapInPandas,
    schema, partitioning) is identical either way.
    """
    if not fake:
        Image = _pil()
        if Image is None:
            raise NotImplementedError(
                "image decode requires PIL/opencv (not in this container); "
                "call with fake=True for the deterministic test double"
            )
        import io

        w, h, bright = [], [], []
        for b in blobs:
            try:
                img = Image.open(io.BytesIO(b))
                w.append(img.width)
                h.append(img.height)
                px = img.convert("L").resize((1, 1)).getpixel((0, 0))
                bright.append(float(px))
            except Exception:  # undecodable blob → sentinel row, not a crash
                w.append(0)
                h.append(0)
                bright.append(0.0)
        return pd.DataFrame(
            {
                "width": pd.Series(w, dtype="int32"),
                "height": pd.Series(h, dtype="int32"),
                "brightness": pd.Series(bright, dtype="double"),
            }
        )
    n = blobs.str.len().fillna(0).astype("int64")
    first = blobs.str[:1].apply(lambda b: b[0] if isinstance(b, bytes) and b else 0)
    last = blobs.apply(lambda b: b[-1] if isinstance(b, bytes) and b else 0)
    return pd.DataFrame(
        {
            "width": (n % 640).astype("int32"),
            "height": (n % 480).astype("int32"),
            "brightness": ((first.astype("int64") + last.astype("int64")) % 256).astype(
                "double"
            ),
        }
    )


def resize_image_batch(
    blobs: pd.Series, width: int, height: int, fake: bool = False
) -> pd.DataFrame:
    """Resize stage (the brief's decode/feature/RESIZE/frame-sample
    list). With PIL on the worker each blob is opened, resized to
    (width, height), and re-encoded as PNG; this container has no
    imaging libs, so ``fake=True`` emits a deterministic stand-in —
    first ``width·height//64`` bytes of the input (bounded, derived
    only from the blob) — with the real path's exact schema
    (resized binary, out_width int, out_height int). Undecodable blobs
    become (NULL, 0, 0) sentinel rows, not crashes."""
    if not fake:
        Image = _pil()
        if Image is None:
            raise NotImplementedError(
                "image resize requires PIL (not in this container); "
                "call with fake=True for the deterministic test double"
            )
        import io

        out, ws, hs = [], [], []
        for b in blobs:
            try:
                img = Image.open(io.BytesIO(b)).resize((width, height))
                buf = io.BytesIO()
                img.save(buf, format="PNG")
                out.append(buf.getvalue())
                ws.append(width)
                hs.append(height)
            except Exception:  # undecodable blob → sentinel row
                out.append(None)
                ws.append(0)
                hs.append(0)
        return pd.DataFrame(
            {
                "resized": out,
                "out_width": pd.Series(ws, dtype="int32"),
                "out_height": pd.Series(hs, dtype="int32"),
            }
        )
    cap = max(1, width * height // 64)
    return pd.DataFrame(
        {
            "resized": blobs.apply(
                lambda b: b[:cap] if isinstance(b, bytes) else None
            ),
            "out_width": pd.Series(
                [width if isinstance(b, bytes) else 0 for b in blobs],
                dtype="int32",
            ),
            "out_height": pd.Series(
                [height if isinstance(b, bytes) else 0 for b in blobs],
                dtype="int32",
            ),
        }
    )


def media_resize(
    media: DataFrame,
    width: int = 64,
    height: int = 64,
    blob_col: str = "blob",
    fake: bool = False,
) -> DataFrame:
    """Distributed resize over a binary column: one Arrow-batched
    ``mapInPandas`` pass appending (resized, out_width, out_height).
    The resize is the canonical pre-processing normalization before
    feature extraction/training; at 100 TB the win is that the
    RESIZED (smaller) bytes are what flow downstream — run it early,
    right after ingestion pruning."""
    cols = media.columns

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = resize_image_batch(
                pdf[blob_col], width, height, fake=fake
            )
            yield pd.concat(
                [pdf.reset_index(drop=True), feats], axis=1
            )

    schema = ", ".join(
        f"{f.name} {f.dataType.simpleString()}" for f in media.schema.fields
    )
    return media.mapInPandas(
        run,
        schema=f"{schema}, resized binary, out_width int, out_height int",
    )


def embed_media(
    media: DataFrame,
    dim: int = 64,
    blob_col: str = "blob",
    id_col: str = "media_id",
    out_col: str = "embedding",
) -> DataFrame:
    """Media → embedding bridge into the ANN/dedup stack: a REAL (not
    stubbed) deterministic featurizer — the L2-normalized byte-value
    histogram folded into ``dim`` bins — computed vectorized per Arrow
    batch (np.bincount over the concatenated buffer, split by offsets).
    A byte histogram is a legitimate weak content signature (format
    markers, character distribution); the point is the PIPELINE: its
    output column is exactly the ``array<float>`` the similarity/PQ
    operators consume, so `embed_media → pq_encode → knn` runs
    end-to-end today and swapping a learned encoder in later changes
    one function, not the plumbing. NULL/empty blobs embed to NULL."""
    if 256 % dim != 0:
        raise ValueError(f"dim must divide 256, got {dim}")
    fold = 256 // dim
    # the id column keeps ITS OWN type — hardcoding long would fail
    # Arrow conversion for string/int keys the parameter invites
    id_type = media.schema[id_col].dataType.simpleString()

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            embs = []
            for b in pdf[blob_col]:
                if not isinstance(b, (bytes, bytearray)) or len(b) == 0:
                    embs.append(None)
                    continue
                hist = np.bincount(
                    np.frombuffer(b, dtype=np.uint8) // fold,
                    minlength=dim,
                ).astype(np.float64)
                hist /= np.linalg.norm(hist)
                embs.append(hist.astype(np.float32))
            out = pdf[[id_col]].reset_index(drop=True)
            out[out_col] = embs
            yield out

    return media.mapInPandas(
        run, schema=f"{id_col} {id_type}, {out_col} array<float>"
    )


def media_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame/segment sampling plumbing: explode each blob into k
    deterministic (offset, length) chunk pointers — the video
    frame-sample pattern where the expensive decode runs only on sampled
    chunks. Pointer math is pure SQL; only sampled chunks cross to the
    decoder. pytest asserts chunk coverage/boundaries.
    """
    m = media_from_documents(spark, sf_dir)
    k = 4
    return (
        m.select(
            "media_id",
            "mime",
            "blob",
            "n_bytes",
            F.posexplode(F.sequence(F.lit(0), F.lit(k - 1))).alias("chunk_idx", "_i"),
        )
        .select(
            "media_id",
            "mime",
            "blob",
            "n_bytes",
            "chunk_idx",
            (F.col("chunk_idx") * (F.col("n_bytes") / k).cast("long")).alias("offset"),
            F.least(
                (F.col("n_bytes") / k).cast("long"),
                F.col("n_bytes") - F.col("chunk_idx") * (F.col("n_bytes") / k).cast("long"),
            ).alias("length"),
        )
        .filter(F.col("length") > 0)
    )


@query(
    "media_decode_pipeline",
    oracle="""
    WITH m AS (
      SELECT doc_id AS media_id,
             CASE WHEN doc_id % 3 = 0 THEN 'image/png'
                  WHEN doc_id % 3 = 1 THEN 'image/jpeg'
                  ELSE 'audio/wav' END AS mime,
             text,
             octet_length(encode(text)) AS n_bytes
      FROM documents
    ), chunks AS (
      SELECT media_id, mime, text, n_bytes,
             CAST(i AS INT) AS chunk_idx,
             i * CAST(floor(n_bytes / 4.0) AS BIGINT) AS "offset",
             least(CAST(floor(n_bytes / 4.0) AS BIGINT),
                   n_bytes - i * CAST(floor(n_bytes / 4.0) AS BIGINT)) AS length
      FROM m, LATERAL (SELECT unnest(generate_series(0, 3)) AS i)
    )
    SELECT media_id, mime,
           upper(substr(hex(encode(text)), 1, 8)) AS magic_prefix,
           n_bytes, chunk_idx, "offset", length,
           CAST(length % 640 AS INT) AS width,
           CAST(length % 480 AS INT) AS height,
           CAST((ascii(substr(text, CAST("offset" AS INT) + 1, 1))
               + ascii(substr(text, CAST("offset" + length AS INT), 1))) % 256
                AS DOUBLE) AS brightness
    FROM chunks WHERE length > 0
    """,
)
def media_decode_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full decode pipeline: frame/segment sampling (deterministic
    (offset, length) chunk pointers, pure SQL — only sampled chunks are
    materialized) → per-chunk byte extraction (JVM substr on binary) →
    Arrow-batched ``mapInPandas`` decode/feature-extract. Chunk bytes
    cross to Python in columnar batches once, features come back
    columnar. At scale this is the pattern for any Python-only media
    library; batch size is bounded by
    spark.sql.execution.arrow.maxRecordsPerBatch so executor memory is
    blob-size-aware.

    Hash-checked end-to-end: the deterministic decode double's byte
    math (length mod / first+last byte) is replicated in the DuckDB
    oracle (documents are pure ASCII, so char ops = byte ops), which
    pins the whole chunk-pointer + Arrow round-trip, not just row
    counts. pytest additionally pins decode values and chunk
    coverage/boundaries.
    """
    chunks = media_frame_sample(spark, sf_dir).select(
        "media_id",
        "mime",
        # metadata-sniff projection folded in (r6): the magic-byte
        # format sniff and blob size ride along per chunk, JVM-side —
        # the media_metadata_sniff triage aggregate retired to
        # tests/test_retired_parity.py is a groupBy over exactly these
        F.upper(F.hex(F.substring("blob", 1, 4))).alias("magic_prefix"),
        "n_bytes",
        "chunk_idx",
        "offset",
        "length",
        F.expr("substr(blob, cast(offset AS INT) + 1, cast(length AS INT))").alias(
            "chunk_bytes"
        ),
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = decode_image_batch(pdf["chunk_bytes"], fake=True)
            out = pd.concat(
                [
                    pdf[
                        [
                            "media_id",
                            "mime",
                            "magic_prefix",
                            "n_bytes",
                            "chunk_idx",
                            "offset",
                            "length",
                        ]
                    ].reset_index(drop=True),
                    feats,
                ],
                axis=1,
            )
            yield out

    return chunks.mapInPandas(
        run,
        schema=(
            "media_id long, mime string, magic_prefix string, n_bytes long,"
            " chunk_idx int, offset long, length long,"
            " width int, height int, brightness double"
        ),
    )
