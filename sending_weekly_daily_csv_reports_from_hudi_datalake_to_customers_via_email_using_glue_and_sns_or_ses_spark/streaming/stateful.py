"""Custom stateful streaming operators (SURVEY.md §2.7 X12/X13):
applyInPandasWithState — the escape hatch for per-key streaming logic
the built-in windows can't express.

``dedupe_stream``: streaming exact-dedup with per-key state — emit each
record key's FIRST occurrence only, remember seen keys in the state
store with a TTL. This is the streaming twin of the batch
dedup_exact / dedup_latest_per_key operators and the core of a continuously-
deduplicating ingest pipeline (the LLM-data use case: drop repeat
documents as they stream in).

Scale: state is one tiny row per key partition-local in the state
store; the TTL (timeout) bounds it. Keys hash-partition across the
cluster — no global coordination.
"""

from __future__ import annotations

import sys
from collections.abc import Iterator

import pandas as pd
from pyspark import cloudpickle
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

# functions from this module cross to Python workers; pickle them by
# VALUE so workers don't need this package on their import path (the
# driver may run from any cwd — sys.path edits don't propagate)
cloudpickle.register_pickle_by_value(sys.modules[__name__])


def _dedupe_fn(
    key: tuple,
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    (fingerprint,) = key
    already_seen = state.exists
    first_rows = None
    n_new = 0
    for pdf in pdfs:
        n_new += len(pdf)
        if first_rows is None and len(pdf):
            first_rows = pdf.nsmallest(1, "doc_id")
    if already_seen:
        (count,) = state.get
        state.update((count + n_new,))
        return  # key already emitted once — suppress duplicates
    state.update((n_new,))
    if first_rows is not None:
        yield first_rows[["fingerprint", "doc_id"]]


def dedupe_stream(docs_with_fingerprint: DataFrame) -> DataFrame:
    """Streaming first-occurrence dedup over a fingerprinted document
    stream. Input columns: fingerprint (string), doc_id (long)."""
    return docs_with_fingerprint.groupBy("fingerprint").applyInPandasWithState(
        _dedupe_fn,
        outputStructType="fingerprint string, doc_id long",
        stateStructType="n_seen long",
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
