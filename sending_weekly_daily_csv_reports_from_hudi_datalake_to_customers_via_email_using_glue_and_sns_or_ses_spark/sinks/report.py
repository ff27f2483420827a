"""CSV report sink (SURVEY.md §2.2 K2) + report-key layout.

The reference materializes the query result on the driver
(``toPandas``, template.py:456 — a driver OOM at scale) and uploads one
CSV to ``reports/year=Y/month=M/day=D/{uuid}.csv`` (template.py:460).

Here the write is distributed: executors write CSV shards directly
under the same date-partitioned key layout. ``single_file=True``
coalesces to one shard first — same single-CSV deliverable as the
reference, still written by an executor, never the driver; for 100 TB
results leave it False and deliver the directory (or a manifest of
shard URLs).
"""

from __future__ import annotations

import os
import uuid
from datetime import datetime, timezone

from pyspark.sql import DataFrame


def report_key(base: str, report_id: str | None = None) -> str:
    """Date-partitioned report path — template.py:437-448 + 460."""
    now = datetime.now(timezone.utc)
    rid = report_id or str(uuid.uuid4())
    return os.path.join(
        base, f"year={now.year}", f"month={now.month}", f"day={now.day}", rid
    )


def write_csv_report(
    df: DataFrame,
    base: str,
    report_id: str | None = None,
    single_file: bool = False,
    header: bool = True,
) -> str:
    """Write the report; returns the output directory path.

    ``report_id`` doubles as the idempotence token: re-running a failed
    job with the same id overwrites the same key instead of appending a
    second report (at-least-once delivery without duplicates — fixes
    the reference's checkpoint-before-deliver data-loss window,
    template.py:244-254).
    """
    path = report_key(base, report_id)
    out = df.coalesce(1) if single_file else df
    out.write.mode("overwrite").option("header", str(header).lower()).csv(path)
    return path
