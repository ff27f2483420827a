"""Incremental view maintenance (IVM) over CDC streams: keep a grouped
aggregate table in sync with an upstream KeyedTable by folding in each
CDC window's ±delta — never rescanning the source.

This is the reference's report use case done incrementally: its Glue job
recomputes the full report query per run (template.py:485-490); at
100 TB the nightly "orders per status per day" style aggregate should
cost O(changed rows), not O(table). The classic IVM result (e.g.
Gupta & Mumick, "Maintenance of Materialized Views: Problems,
Techniques, and Applications", IEEE Data Eng. Bull. 1995) is that
COUNT/SUM (and AVG = SUM/COUNT) are self-maintainable from insert/
delete/update deltas alone; MIN/MAX are not (a retraction of the
current extremum needs the base table) — this module implements the
self-maintainable family and refuses the rest loudly.

Contract: each CDC row contributes −(before state) and +(after state)
to the groups those states belong to. Summed over any window the
intermediate states telescope away, so the total delta equals
(final − initial) per key — group migrations included (the −before
lands in the old group, the +after in the new one), and rows
suppressed as no-ops would have contributed exactly 0.

Float caveat: retraction arithmetic (+x then −x) is exact for integer
and decimal columns; for double columns the maintained sum drifts from
a recompute by accumulated rounding, as in every IVM system. Money
columns should be decimal — the engine-wide oracle convention.

Scale: one scan of the CDC window, map-side partial aggregation into
|groups| rows, then a union+re-aggregate with the current aggregate
frame (itself |groups| rows). No join against the source table, ever.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: the maintained row-count column (also the group-liveness witness)
COUNT_COL = "n_rows"


def cdc_agg_delta(
    cdc_df: DataFrame,
    group_cols: list[str],
    sum_cols: list[str],
) -> DataFrame:
    """The window's aggregate delta: for each group (fields of the CDC
    payload structs), the net change to the row count and to each
    ``sum_cols`` total. Output schema: ``group_cols + [n_rows] +
    [sum_<c> for c in sum_cols]`` — the same shape the maintained
    aggregate table uses, so :func:`merge_agg_delta` is one union."""
    sides = []
    for img, sign in (("_before", -1), ("_after", 1)):
        sides.append(
            cdc_df.filter(F.col(img).isNotNull()).select(
                *[F.col(img)[g].alias(g) for g in group_cols],
                F.lit(sign).cast("long").alias(COUNT_COL),
                *[
                    (F.col(img)[c] * sign).alias(f"sum_{c}")
                    for c in sum_cols
                ],
            )
        )
    contrib = sides[0].unionByName(sides[1])
    return contrib.groupBy(*group_cols).agg(
        F.sum(COUNT_COL).alias(COUNT_COL),
        *[F.sum(f"sum_{c}").alias(f"sum_{c}") for c in sum_cols],
    )


def merge_agg_delta(current: DataFrame | None, delta: DataFrame) -> DataFrame:
    """Fold a delta into the maintained aggregate: union + re-aggregate
    (both sides share the delta schema), dropping groups whose row
    count reaches zero — the group no longer exists upstream. With
    ``current=None`` (first window) the delta IS the aggregate.

    The union+re-agg form beats a full-outer join at every scale: both
    inputs are |groups|-sized, the aggregation is partial-combined, and
    there is exactly one shuffle on the group key."""
    if current is None:
        merged = delta
    else:
        group_cols = [
            c
            for c in delta.columns
            if c != COUNT_COL and not c.startswith("sum_")
        ]
        value_cols = [c for c in delta.columns if c not in group_cols]
        merged = (
            current.unionByName(delta)
            .groupBy(*group_cols)
            .agg(*[F.sum(c).alias(c) for c in value_cols])
        )
    return merged.filter(F.col(COUNT_COL) != 0)


class MaintainedAggregate:
    """A parquet-backed grouped aggregate kept in sync with an upstream
    KeyedTable via CDC windows — the end-to-end report-maintenance
    loop::

        reader = CDCReader(spark, "orders", src_root, ck_root)
        view = MaintainedAggregate(
            spark, path, group_cols=["status"], sum_cols=["amount"])
        win = reader.read()
        if win is not None:
            view.apply(win)          # write-after-read
            reader.commit()          # checkpoint only after the sink

    Durability: each apply writes a NEW versioned dir and flips a
    pointer file (the KeyedTable commit discipline in miniature) — a
    crash mid-write leaves the previous version live. Combined with the
    reader's commit-after-sink protocol the loop is at-least-once with
    an idempotence caveat unlike ``apply_cdc``'s: re-applying the SAME
    window double-counts (deltas are not idempotent), so the caller
    must pair one reader.commit() with each successful apply() — the
    crash window between them re-delivers, which for a maintained
    REPORT means one stale-refresh, healed by ``rebuild()`` from the
    source snapshot (O(table), the escape hatch IVM systems ship)."""

    def __init__(
        self,
        spark,
        path: str,
        group_cols: list[str],
        sum_cols: list[str],
    ):
        import os

        self.spark = spark
        self.path = path
        self.group_cols = group_cols
        self.sum_cols = sum_cols
        os.makedirs(path, exist_ok=True)

    def _pointer(self) -> str:
        import os

        return os.path.join(self.path, "_latest")

    def _version(self) -> int | None:
        try:
            with open(self._pointer()) as f:
                return int(f.read().strip())
        except (FileNotFoundError, ValueError):
            return None

    def current(self) -> DataFrame | None:
        import os

        v = self._version()
        if v is None:
            return None
        return self.spark.read.parquet(os.path.join(self.path, f"v={v}"))

    def apply(self, cdc_window: DataFrame) -> None:
        """Fold one CDC window into the aggregate and publish."""
        delta = cdc_agg_delta(cdc_window, self.group_cols, self.sum_cols)
        self._publish(merge_agg_delta(self.current(), delta))

    def rebuild(self, source_snapshot: DataFrame) -> None:
        """O(table) recompute from a source snapshot — initial seeding,
        or healing after a crash in the apply/commit window."""
        agg = source_snapshot.groupBy(*self.group_cols).agg(
            F.count(F.lit(1)).alias(COUNT_COL),
            *[F.sum(c).alias(f"sum_{c}") for c in self.sum_cols],
        )
        self._publish(agg)

    def _publish(self, df: DataFrame) -> None:
        import os

        v = (self._version() or 0) + 1
        out = os.path.join(self.path, f"v={v}")
        df.write.mode("overwrite").parquet(out)
        tmp = self._pointer() + ".tmp"
        with open(tmp, "w") as f:
            f.write(str(v))
        os.replace(tmp, self._pointer())
        # keep last two versions (readers of v-1 may be in flight)
        for name in os.listdir(self.path):
            if name.startswith("v=") and int(name[2:]) < v - 1:
                import shutil

                shutil.rmtree(
                    os.path.join(self.path, name), ignore_errors=True
                )
