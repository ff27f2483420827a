"""SCD2 (slowly-changing-dimension, type 2) history maintenance —
MERGE-INTO semantics emulated with anti-join + union + window (the
pattern for engines without a native MERGE; pyspark_guide CDC/SCD2
note). Complements the KeyedTable upsert (which keeps only the latest
row): SCD2 keeps EVERY version with a validity interval.

History table schema: business columns + ``valid_from`` (timestamp) and
``valid_to`` (timestamp, null = current row).

Scale: one shuffle keyed by the business key per apply (the window);
history grows append-only — at 100 TB partition it by valid_from date
so current-row queries prune to recent partitions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def scd2_apply(
    history: DataFrame | None,
    updates: DataFrame,
    key: str,
    change_ts: str,
    compare_cols: list[str] | None = None,
) -> DataFrame:
    """Apply a batch of updates to an SCD2 history.

    * new keys → inserted as current rows (valid_from = change_ts);
    * changed keys (any compare_col differs from the current version) →
      current row closed at the update's change_ts, new current row
      appended;
    * unchanged keys and duplicate no-op updates → untouched;
    * multiple updates for one key within the batch → applied in
      change_ts order (each closes the previous).

    Returns the new history DataFrame (caller persists it — e.g. via
    KeyedTable or a date-partitioned append).
    """
    upd_cols = [c for c in updates.columns if c != change_ts]
    compare_cols = compare_cols or [c for c in upd_cols if c != key]

    incoming = updates.select(
        *upd_cols, F.col(change_ts).alias("valid_from")
    ).withColumn("valid_to", F.lit(None).cast("timestamp"))

    if history is None:
        versions = incoming
    else:
        versions = history.select(*upd_cols, "valid_from", "valid_to").unionByName(
            incoming
        )

    # rebuild validity chains per key: order versions, drop consecutive
    # no-op duplicates, close each version at the next one's start
    w = Window.partitionBy(key).orderBy(F.asc("valid_from"))
    change_flag = F.lit(False)
    for c in compare_cols:
        prev = F.lag(F.col(c)).over(w)
        change_flag = change_flag | ~(
            (F.col(c) == prev) | (F.col(c).isNull() & prev.isNull())
        )
    deduped = (
        versions.withColumn("__first", F.lag(key).over(w).isNull())
        .withColumn("__changed", change_flag)
        .filter(F.col("__first") | F.col("__changed"))
        .drop("__first", "__changed")
    )
    w2 = Window.partitionBy(key).orderBy(F.asc("valid_from"))
    return deduped.withColumn(
        "valid_to", F.lead("valid_from").over(w2)
    )


def scd2_current(history: DataFrame) -> DataFrame:
    """The current view: rows whose validity is open."""
    return history.filter(F.col("valid_to").isNull())


def scd2_as_of(history: DataFrame, ts) -> DataFrame:
    """Time travel: the dimension as of ``ts``."""
    t = F.lit(ts).cast("timestamp")
    return history.filter(
        (F.col("valid_from") <= t)
        & (F.col("valid_to").isNull() | (F.col("valid_to") > t))
    )
