"""Z-order (Morton-curve) clustering keys for multi-column file
pruning — the layout trick behind Hudi's z-order clustering service
(``hoodie.clustering.plan.strategy.sort.columns`` with the spatial
curve option; the reference job's tables cluster lexicographically,
see generate_hudi_table.py:150-167, which only prunes on the LEADING
sort column).

Lexicographic ``sortWithinPartitions(a, b)`` gives file-level min/max
locality on ``a`` only: a filter on ``b`` alone overlaps every file.
Interleaving the bits of quantile-bucketed column ranks orders rows
along a space-filling curve, so every indexed column gets partial
min/max locality and a single-column filter skips most files — the
property `tests/test_layout.py` measures rather than asserts by
folklore.

Mechanics (all JVM-side; one driver-side quantile pass at write time):

1. per column, ``approxQuantile`` computes 2^bits − 1 interior split
   points (one pass over the column, mergeable sketch — the same
   machinery a 1000-executor cluster uses);
2. an MLlib ``Bucketizer`` maps values to bucket ids by binary search
   (JVM, vectorized; NULL/NaN land in the overflow bucket and are
   clamped to the top id — they cluster together at the curve's end);
3. bucket-id bits interleave into one long via shiftleft/bitwise-or
   expressions — pure codegen, no UDF.

The quantile pass is a WRITE-time cost (clustering is already a
rewrite); readers never pay it.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

#: bytes of a string's UTF-8 prefix folded into its numeric surrogate:
#: 48 bits — the largest whole-byte width exactly representable in a
#: double (the Bucketizer/approxQuantile currency; 7 bytes would lose
#: the low 3 bits to the 53-bit mantissa and introduce spurious ties).
_PREFIX_BYTES = 6


def _surrogate_expr(df: DataFrame, col: str) -> Column | None:
    """Order-preserving numeric surrogate for a z-order column, or
    ``None`` when the column is already numeric. Validates the type at
    the API boundary — an unsupported column used to fail deep inside
    approxQuantile/Bucketizer with an opaque engine error.

    Strings map to their first ``_PREFIX_BYTES`` UTF-8 bytes read as a
    big-endian integer (zero-padded, so shorter strings stay smaller):
    byte-wise comparison of zero-padded prefixes IS numeric comparison
    of those integers, and UTF-8 byte order is code-point order — the
    surrogate preserves the column's sort order through the quantile
    bucketing. Strings equal in their first 6 bytes collapse to one
    surrogate (and one curve bucket) — exactly the locality a prefix
    can give; min/max file stats on the REAL column still prune,
    because rows that share a prefix cluster together. Timestamps and
    dates cast to epoch seconds (dates via the session-zone midnight —
    deterministic within a session, and layout only needs an order).
    """
    dt = df.schema[col].dataType
    if isinstance(dt, T.NumericType):
        return None
    if isinstance(dt, T.StringType):
        padded = F.concat(
            F.encode(F.col(col), "utf-8"), F.lit(bytes(_PREFIX_BYTES))
        )
        prefix = F.substring(padded, 1, _PREFIX_BYTES)
        return F.conv(F.hex(prefix), 16, 10).cast("long")
    if isinstance(dt, T.TimestampType):
        return F.col(col).cast("double")
    if isinstance(dt, (T.TimestampNTZType, T.DateType)):
        # Spark rejects a direct TIMESTAMP_NTZ/DATE → DOUBLE cast;
        # hop through the session-zone timestamp first
        return F.col(col).cast("timestamp").cast("double")
    raise ValueError(
        f"z-order column {col!r} has unsupported type {dt.simpleString()}: "
        "pass a numeric, string, timestamp, or date column"
    )


def _with_surrogates(
    df: DataFrame, cols: list[str]
) -> tuple[DataFrame, dict[str, str], list[str]]:
    """Append surrogate columns for the non-numeric z-order columns.
    Returns (frame, original→quantile-column name map, added names)."""
    mapping: dict[str, str] = {}
    added: list[str] = []
    for c in cols:
        expr = _surrogate_expr(df, c)
        if expr is None:
            mapping[c] = c
        else:
            name = f"__zs_{c}"
            df = df.withColumn(name, expr)
            mapping[c] = name
            added.append(name)
    return df, mapping, added


def interleave_bits(bucket_cols: list[Column], bits: int) -> Column:
    """Morton-interleave the low ``bits`` bits of the given bucket-id
    columns into one long: output bit ``i*k + j`` is bit ``i`` of
    column ``j`` (k = number of columns). Pure shiftleft/bitwise-and
    expressions — whole-stage codegen keeps this in the JVM loop."""
    if not bucket_cols:
        raise ValueError("interleave_bits: need at least one column")
    if bits * len(bucket_cols) > 63:
        raise ValueError(
            f"interleave_bits: {bits} bits × {len(bucket_cols)} columns "
            "overflows a signed long (max 63 interleaved bits)"
        )
    k = len(bucket_cols)
    out = F.lit(0).cast("long")
    for j, c in enumerate(bucket_cols):
        c = c.cast("long")
        for i in range(bits):
            out = out.bitwiseOR(
                F.shiftleft(
                    F.shiftright(c, i).bitwiseAND(F.lit(1)), i * k + j
                )
            )
    return out


def zorder_splits(
    df: DataFrame, cols: list[str], bits: int = 8
) -> dict[str, list[float]]:
    """One ``approxQuantile`` pass computing each column's bucket
    boundaries (2^bits quantile cuts, deduplicated — skewed columns
    with few distinct values simply use fewer buckets). Driver memory
    is ``cols × 2^bits`` doubles — KB at the default 8 bits.
    Non-numeric columns (string/timestamp/date) quantile their
    order-preserving numeric surrogates (see :func:`_surrogate_expr`);
    the returned dict is keyed by the ORIGINAL column names, so split
    reuse across incremental writes works unchanged."""
    n_buckets = 1 << bits
    probs = [i / n_buckets for i in range(1, n_buckets)]
    rel_err = 1.0 / (4 * n_buckets)
    sdf, mapping, _added = _with_surrogates(df, cols)
    quantiles = sdf.approxQuantile([mapping[c] for c in cols], probs, rel_err)
    out = {}
    for col, qs in zip(cols, quantiles):
        interior = sorted(set(qs))
        if not interior:
            # constant, all-NULL, or empty column: approxQuantile
            # returns nothing, and Bucketizer REQUIRES ≥3 split points
            # — degenerate to one real boundary (every value lands in
            # one bucket, the column contributes no curve bits, and
            # compaction still succeeds)
            interior = [0.0]
        out[col] = [float("-inf")] + interior + [float("inf")]
    return out


def add_zorder_key(
    df: DataFrame,
    cols: list[str],
    bits: int = 8,
    key_col: str = "__zkey",
    splits: dict[str, list[float]] | None = None,
) -> DataFrame:
    """Append a Morton z-order key over ``cols`` — numeric, string,
    timestamp, or date (strings ride an order-preserving 6-byte-prefix
    integer surrogate, see :func:`_surrogate_expr`; anything else
    raises a descriptive ValueError at the API boundary instead of an
    opaque engine error mid-job — the reference's own clustering sort
    columns are strings like ``state``, generate_hudi_table.py:150-156).
    Pass precomputed ``splits`` (from :func:`zorder_splits`) to reuse
    boundaries across incremental writes — stable boundaries keep new
    files aligned with the existing curve; omit to compute them from
    ``df`` in one quantile pass."""
    if not cols:
        raise ValueError("add_zorder_key: need at least one column")
    sdf, mapping, added = _with_surrogates(df, cols)
    if splits is None:
        splits = zorder_splits(df, cols, bits)
    from pyspark.ml.feature import Bucketizer

    bucket_names = [f"__zb_{c}" for c in cols]
    bucketizer = Bucketizer(
        inputCols=[mapping[c] for c in cols],
        outputCols=bucket_names,
        splitsArray=[splits[c] for c in cols],
        handleInvalid="keep",  # NULL/NaN → overflow bucket, clamped below
    )
    top = F.lit((1 << bits) - 1)
    bucketed = bucketizer.transform(sdf)
    # A low-cardinality column (few distinct values → deduplicated
    # splits → few buckets) must still occupy the FULL bit range:
    # raw bucket ids 0..20 only touch the interleave's LOW bits, which
    # silently demotes the column to the curve's fine detail — a
    # 20-state string column measured ZERO partition-level locality
    # unscaled. Spreading ids across 2^bits (exact integer arithmetic)
    # restores each column's share of the significant bits.
    scaled = []
    for c, b in zip(cols, bucket_names):
        n_col = max(len(splits[c]) - 1, 1)
        scaled.append(
            F.least(
                (F.col(b).cast("long") * F.lit(1 << bits))
                / F.lit(n_col),
                top,
            ).cast("long")
        )
    key = interleave_bits(scaled, bits)
    return bucketed.withColumn(key_col, key).drop(*bucket_names, *added)
