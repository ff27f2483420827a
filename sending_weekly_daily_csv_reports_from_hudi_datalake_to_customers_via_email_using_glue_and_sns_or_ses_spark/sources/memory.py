"""In-memory / key-value sources (SURVEY.md §2.1 S5/S6).

The reference lifts DynamoDB scan pages into a DataFrame by schema
inference (template.py:284-294 — with a pagination bug: only the first
scan page is read) and builds fixture DataFrames from tuples + column
names (generate_hudi_table.py:225-228). The engine version takes any
iterable of dicts (paginated iterators included), with an explicit
schema option instead of silent inference.
"""

from __future__ import annotations

from collections.abc import Iterable, Iterator
from itertools import islice

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType


def kv_source(
    spark: SparkSession,
    items: Iterable[dict],
    schema: StructType | str | None = None,
) -> DataFrame:
    """Build a DataFrame from dict rows (a DynamoDB-style scan).

    Unlike the reference this consumes the WHOLE iterator (all scan
    pages). With ``schema=None`` types are inferred (the reference's
    behavior); passing a schema is the engine-recommended path
    (SURVEY.md §1.3 — declared, validated types).

    For truly large KV snapshots, land pages to parquet and scan that
    instead — a driver-side list is the wrong vehicle past ~10^6 rows;
    this source is for small dimension/config tables.
    """
    if schema is not None:
        return spark.createDataFrame(iter(items), schema=schema)
    return spark.createDataFrame(list(items))


def paginated(scan_pages: Iterable[list[dict]]) -> Iterator[dict]:
    """Flatten a paginated scan (e.g. DynamoDB ``scan`` + LastEvaluatedKey
    loop) into one row iterator — the fix for template.py:289's
    first-page-only bug."""
    for page in scan_pages:
        yield from page


def chunked(rows: Iterable[dict], size: int) -> Iterator[list[dict]]:
    it = iter(rows)
    while chunk := list(islice(it, size)):
        yield chunk
