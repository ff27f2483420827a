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
store; the opt-in TTL (``ttl_ms``) bounds it for long-running streams.
Keys hash-partition across the cluster — no global coordination.
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


def _make_dedupe_fn(ttl_ms: int | None):
    def _dedupe_fn(
        key: tuple,
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        if state.hasTimedOut:
            state.remove()  # TTL expiry: forget the key, emit nothing
            return
        already_seen = state.exists
        first_rows = None
        n_new = 0
        for pdf in pdfs:
            n_new += len(pdf)
            if len(pdf):
                # global min across ALL pandas chunks — a hot key can
                # span several Arrow batches and the smallest doc_id may
                # arrive in a later one
                cand = pdf.nsmallest(1, "doc_id")
                if (
                    first_rows is None
                    or cand["doc_id"].iloc[0] < first_rows["doc_id"].iloc[0]
                ):
                    first_rows = cand
        if already_seen:
            (count,) = state.get
            state.update((count + n_new,))
        else:
            state.update((n_new,))
        if ttl_ms is not None:
            state.setTimeoutDuration(ttl_ms)  # (re)arm the TTL on activity
        if already_seen:
            return  # key already emitted once — suppress duplicates
        if first_rows is not None:
            yield first_rows[["fingerprint", "doc_id"]]

    return _dedupe_fn


def dedupe_stream(
    docs_with_fingerprint: DataFrame, ttl_ms: int | None = None
) -> DataFrame:
    """Streaming first-occurrence dedup over a fingerprinted document
    stream. Input columns: fingerprint (string), doc_id (long).

    State growth: one row per distinct fingerprint — UNBOUNDED under
    the default ``ttl_ms=None``. For a long-running production stream
    pass a TTL (ms): state idle that long is dropped and a later repeat
    re-emits — the explicit bounded-state trade. The TTL uses
    ProcessingTimeTimeout, so pair it with a real trigger interval
    (``.trigger(processingTime=...)``): with the default run-ASAP
    trigger the engine busy-loops empty micro-batches evaluating
    timers (observed, not hypothetical — it also wedges the
    ``processAllAvailable`` test harness).
    """
    timeout = (
        GroupStateTimeout.NoTimeout
        if ttl_ms is None
        else GroupStateTimeout.ProcessingTimeTimeout
    )
    return docs_with_fingerprint.groupBy("fingerprint").applyInPandasWithState(
        _make_dedupe_fn(ttl_ms),
        outputStructType="fingerprint string, doc_id long",
        stateStructType="n_seen long",
        outputMode="append",
        timeoutConf=timeout,
    )
