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
    is ``cols × 2^bits`` doubles — KB at the default 8 bits."""
    n_buckets = 1 << bits
    probs = [i / n_buckets for i in range(1, n_buckets)]
    rel_err = 1.0 / (4 * n_buckets)
    quantiles = df.approxQuantile(cols, probs, rel_err)
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
    """Append a Morton z-order key over ``cols`` (numeric). Pass
    precomputed ``splits`` (from :func:`zorder_splits`) to reuse
    boundaries across incremental writes — stable boundaries keep new
    files aligned with the existing curve; omit to compute them from
    ``df`` in one quantile pass."""
    if not cols:
        raise ValueError("add_zorder_key: need at least one column")
    if splits is None:
        splits = zorder_splits(df, cols, bits)
    from pyspark.ml.feature import Bucketizer

    bucket_names = [f"__zb_{c}" for c in cols]
    bucketizer = Bucketizer(
        inputCols=cols,
        outputCols=bucket_names,
        splitsArray=[splits[c] for c in cols],
        handleInvalid="keep",  # NULL/NaN → overflow bucket, clamped below
    )
    top = F.lit((1 << bits) - 1)
    bucketed = bucketizer.transform(df)
    key = interleave_bits(
        [F.least(F.col(b).cast("long"), top) for b in bucket_names], bits
    )
    return bucketed.withColumn(key_col, key).drop(*bucket_names)
