"""Inline table services — Hudi's compaction/clustering schedulers
(the ``hoodie.compact.inline.max.delta.commits`` /
``hoodie.clustering.inline.max.commits`` knob family) as one policy
object the write loop calls after each batch. The reference's Glue job
never compacts or clusters; at 100 TB a MOR table left uncompacted
log-merges an ever-growing window on every read, and an unclustered
snapshot loses its skipping indexes — table services are what keep
read cost flat under continuous ingestion.

Mechanics: both triggers count PUBLISHED delta commits (from the
table's instant list vs its base/replace state), so the policy is a
pure function of durable table state — a crashed service run simply
re-triggers next time (compaction and clustering are both idempotent
replace-style writes under the table lock).
"""

from __future__ import annotations

from dataclasses import dataclass, field

from .upsert import KeyedTable, compact_snapshot


@dataclass
class ServicePolicy:
    """When and how to run inline services.

    ``compact_after_delta_commits``: MOR only — materialize the
    log-merged base once that many commits sit above the newest base
    snapshot (Hudi: ``hoodie.compact.inline.max.delta.commits``).
    ``cluster_after_commits``: rewrite the snapshot via
    :func:`compact_snapshot` once that many commits landed since the
    last clustering (Hudi: ``hoodie.clustering.inline.max.commits``);
    clustering layout/knobs come from the remaining fields and the
    rewrite re-stamps the skipping indexes so point/range lookups stay
    sharp after churn."""

    compact_after_delta_commits: int | None = 5
    cluster_after_commits: int | None = None
    target_files: int = 1
    zorder_cols: list[str] | None = None
    stats_cols: list[str] | None = None
    bloom_key: str | list[str] | None = None
    #: service bookkeeping PER TABLE ROOT — instants at or below a
    #: table's marker don't re-trigger clustering. Keyed by root so one
    #: policy object can be shared across tables (natural for shared
    #: config) without table A's clustering marker suppressing — or
    #: prematurely firing — table B's.
    _last_cluster: dict[str, str | None] = field(
        default_factory=dict, repr=False
    )


def delta_commits_above_base(table: KeyedTable) -> int:
    """PUBLISHED commits newer than the newest materialized snapshot —
    the log window every MOR read must merge."""
    base = table._base_commit()
    return sum(1 for c in table.instants() if base is None or c > base)


def run_table_services(
    table: KeyedTable, policy: ServicePolicy
) -> dict[str, str | None]:
    """Run whichever services the policy says are due; returns
    ``{"compacted": commit | None, "clustered": commit | None}``.
    Safe to call after every write batch: each check is a directory
    listing, and services run only at their thresholds."""
    report: dict[str, str | None] = {"compacted": None, "clustered": None}
    n = policy.compact_after_delta_commits
    if (
        n is not None
        and table.table_type == "MERGE_ON_READ"
        and delta_commits_above_base(table) >= n
    ):
        report["compacted"] = table.compact()

    m = policy.cluster_after_commits
    if m is not None:
        since = policy._last_cluster.get(table.root)
        if since is None:
            # adopt the newest REPLACE instant as the starting marker so
            # a fresh policy object doesn't re-cluster an already-
            # clustered table on its first call
            tl = table._timeline_instants()
            replaces = [c for c, op in tl.items() if op == "replace"]
            since = max(replaces) if replaces else None
        due = sum(
            1 for c in table.instants() if since is None or c > since
        )
        if due >= m:
            commit = compact_snapshot(
                table,
                target_files=policy.target_files,
                zorder_cols=policy.zorder_cols,
                stats_cols=policy.stats_cols,
                bloom_key=policy.bloom_key,
            )
            report["clustered"] = commit
            policy._last_cluster[table.root] = commit
        else:
            policy._last_cluster[table.root] = since
    return report
