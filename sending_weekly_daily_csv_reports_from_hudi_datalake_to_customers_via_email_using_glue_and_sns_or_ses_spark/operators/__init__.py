"""Operator corpus registry.

Every implemented operator from SURVEY.md §2 registers itself here via
the ``@query`` decorator: a named PySpark program ``(spark, sf_dir) ->
DataFrame`` plus (when SQL-expressible) an equivalent ANSI-SQL oracle
that DuckDB runs on the same parquet for the driver's correctness gate.

Oracle-parity conventions (SURVEY.md §7.3d):
  * every computed column is aliased identically on both sides;
  * money/float aggregates go through exact decimal arithmetic and are
    cast to double only at the end (bit-identical across engines);
  * session timezone is UTC on the Spark side; timestamps compare raw;
  * deterministic tie-breaks everywhere a top-k / dedup picks a row.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, QueryFn] = {}
ORACLES: dict[str, str] = {}

#: entries retired from the driver registry to fund slots for newer
#: operators (the driver checks at most ~50 entries). A retired entry
#: keeps its full (query, oracle) pair and stays value-hash-checked —
#: by tests/test_retired_parity.py instead of the driver.
RETIRED_QUERIES: dict[str, QueryFn] = {}
RETIRED_ORACLES: dict[str, str] = {}


def query(
    name: str, oracle: str | None = None, retired: bool = False
) -> Callable[[QueryFn], QueryFn]:
    """Register a named query; ``oracle`` is DuckDB-ready ANSI SQL over the
    pre-registered views (region nation customer supplier part orders
    lineitem events documents embeddings). Omit it for ops that aren't
    SQL-expressible (driver then records a rows-only check).
    ``retired=True`` moves the entry to the pytest-checked RETIRED
    registries (no driver slot, same oracle contract).
    """

    def deco(fn: QueryFn) -> QueryFn:
        queries = RETIRED_QUERIES if retired else QUERIES
        oracles = RETIRED_ORACLES if retired else ORACLES
        queries[name] = fn
        if oracle is not None:
            oracles[name] = oracle
        return fn

    return deco


def evict_dead_app_entries(registry: dict, app_id: str) -> None:
    """Drop (and best-effort unpersist) cache entries whose key names a
    DIFFERENT applicationId than the live one. The (applicationId, …)
    keying keeps a restarted session from being served frames built by
    a dead SparkContext — but without eviction, each restart's entries
    would accumulate forever, pinning py4j references into dead JVMs.
    Every cache getter calls this on miss, so at most one session's
    entries are ever retained per cache."""
    for key in [k for k in registry if k[0] != app_id]:
        stale = registry.pop(key)
        try:
            stale.unpersist()
        except Exception:  # noqa: BLE001 — dead context / non-frame value
            pass


def clear_intermediate_caches() -> None:
    """Unpersist and forget the shared per-(session, sf) intermediates
    (jaccard pair graph, tf table, approx-agg sketch, IVF centroids and
    cell-partitioned layout path). Benchmarking helper: the headline
    suite deliberately measures steady state (caches warm — a
    long-running session's behavior), but SLOPE measurements
    (tools/scaling_bench.py, tools/gen_organic_sf.py) must time first
    evaluations, or a cache hit would masquerade as a flat scaling
    curve."""
    from . import aggregates, dedup, relational, similarity, textual

    for registry in (
        relational._FIXTURE_FRAME_CACHE,
        dedup._PAIRS_CACHE,
        dedup._PAIRS_SHINGLE_HANDLE,
        dedup._MINHASH_SIG_CACHE,
        dedup._SIMHASH_CHUNK_CACHE,
        dedup._WINDOW_INDEX_CACHE,
        textual._TF_CACHE,
        aggregates._SKETCH_CACHE,
    ):
        for frame in registry.values():
            try:
                frame.unpersist()
            except Exception:  # noqa: BLE001 — dead context: forget it
                pass
        registry.clear()
    for frame in dedup._POSTINGS_HANDLES:  # list, not keyed — same idea
        try:
            frame.unpersist()
        except Exception:  # noqa: BLE001 — dead context: forget it
            pass
    dedup._POSTINGS_HANDLES.clear()
    # plain dicts (numpy matrices / layout paths) — nothing to unpersist
    from . import pq

    similarity._CENT_CACHE.clear()
    similarity._QROWS_CACHE.clear()
    pq._PQ_CACHE.clear()
    from . import scoring

    scoring._LM_CACHE.clear()
    import logging
    import shutil

    for path in similarity._IVF_LAYOUT_CACHE.values():
        try:
            shutil.rmtree(path)
        except OSError as exc:  # best-effort temp cleanup
            logging.getLogger(__name__).debug(
                "could not remove IVF layout dir %s: %s", path, exc
            )
    similarity._IVF_LAYOUT_CACHE.clear()


def _load_all() -> None:
    # Registration order = the driver's correctness-check order. The
    # corpus is consolidated to fit the driver's ~50-entry budget in
    # full; families the round-1 driver never reached register first so
    # any residual budget cut lands on the longest-green entries last.
    from . import (  # noqa: F401
        scoring,
        windows,
        subqueries,
        textual,
        curation,
        weburl,
        timeseries,
        streaming_entries,
        similarity,
        multimodal,
        tokenizer,
        joins,
        quality,
        dedup,
        aggregates,
        relational,
        scalars,
        setops,
    )


_load_all()
