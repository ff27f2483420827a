"""Multi-writer safety for KeyedTable (SURVEY.md §2.5 P9): optimistic
concurrency control in the shape Hudi's public OCC model defines
(hoodie.write.concurrency.mode=OPTIMISTIC_CONCURRENCY_CONTROL plus a
lock provider — the reference configures the DynamoDB provider,
generate_hudi_table.py:174-175 / template.py:48; this emulation ships
the filesystem and in-process providers, Hudi's other two public
options).

The protocol, matching Hudi's documented behavior:

  1. A writer snapshots the table's latest completed instant at
     transaction start (``base_instant``).
  2. The write is planned optimistically — no lock held while the
     incoming batch is combined/deduped.
  3. The COMMIT phase runs under the table lock: detect conflicts
     (any concurrent commit since ``base_instant`` whose touched
     record keys overlap this write's keys), then merge-and-publish.
     Non-overlapping concurrent commits are NOT conflicts — the merge
     under the lock reads the now-current snapshot, so the write
     rebases onto them automatically.
  4. On overlap the writer aborts with ``CommitConflictError`` and the
     caller retries (Hudi: ``HoodieWriteConflictException``).

Scale note: the conflict check is one broadcast-able left-semi join of
the concurrent commits' log rows (bounded: commits-since-base only)
against the incoming keys — never a table scan. Holding the lock for
the merge+publish serializes only the commit phase, exactly the
critical section Hudi's timeline lock covers.
"""

from __future__ import annotations

import logging
import os
import threading
import time
import uuid


class LockAcquireTimeout(Exception):
    """Could not acquire the table lock within the timeout."""


class CommitConflictError(Exception):
    """A concurrent commit conflicts with this transaction; retry the
    write (Hudi's HoodieWriteConflictException equivalent).

    ``n_overlapping`` is the number of DISTINCT conflict units both the
    transaction and a concurrent commit touched — record keys on
    KeyedTable, file-group buckets on BucketedTable (Hudi's own OCC
    unit; ``unit`` names it in the message); ``None`` means the
    concurrent commit carries no key/bucket manifest (delete / snapshot
    replacement / table-wide op), which conflicts with any in-flight
    transaction.
    """

    def __init__(
        self,
        conflicting_commits: list[str],
        n_overlapping: int | None = None,
        unit: str = "record key",
    ):
        self.conflicting_commits = conflicting_commits
        self.n_overlapping = n_overlapping
        if n_overlapping is None:
            detail = "whole-table commit(s) (no key/bucket manifest)"
        else:
            detail = f"{n_overlapping} overlapping {unit}(s)"
        super().__init__(
            f"concurrent commit(s) {conflicting_commits}: {detail}; "
            "retry the transaction"
        )


class InProcessLockProvider:
    """Hudi's InProcessLockProvider equivalent: serializes writers that
    share one JVM/driver process (threads in one Spark application)."""

    def __init__(self) -> None:
        self._lock = threading.Lock()

    def try_lock(self, timeout_s: float = 60.0) -> bool:
        return self._lock.acquire(timeout=timeout_s)

    def unlock(self) -> None:
        self._lock.release()


class FileSystemLockProvider:
    """Hudi's FileSystemBasedLockProvider equivalent: an atomically
    created lock file under the table root serializes writers across
    processes. Atomic-create (O_EXCL) is the mutual-exclusion primitive
    — valid on local FS and HDFS; on S3 prefer a conditional-put or
    external lock service, same caveat Hudi documents.

    Crash recovery (``ttl_s``, Hudi's FILESYSTEM_LOCK_EXPIRE): a lock
    file older than the TTL is presumed abandoned and broken. The
    break is RENAME-based, so exactly one waiter wins it — two waiters
    can never both break the same stale lock and both acquire. Each
    provider instance writes a unique ownership token into the file and
    ``unlock`` releases only its own lock, so a holder whose lock was
    TTL-broken cannot delete its successor's lock.

    LIVENESS (ADVICE r2): the holder runs a heartbeat thread that
    refreshes the lock file's mtime every ``ttl_s/4`` while held, so a
    commit that runs longer than the TTL is never broken mid-critical-
    section — TTL breaking only ever fires on locks whose holder
    stopped heartbeating (crashed process / dead host). ``ttl_s`` can
    therefore be sized for failure-detection latency (how long a
    crashed writer blocks the table), not worst-case commit duration.
    Set ``ttl_s=0`` to disable breaking and clear crashed writers'
    locks operationally.
    """

    def __init__(self, lock_path: str, ttl_s: float = 3600.0) -> None:
        self.lock_path = lock_path
        self.ttl_s = ttl_s
        self._token = f"{os.getpid()}-{uuid.uuid4().hex}"
        self._hb_stop: threading.Event | None = None
        self._hb_thread: threading.Thread | None = None

    def try_lock(self, timeout_s: float = 60.0, poll_s: float = 0.05) -> bool:
        deadline = time.monotonic() + timeout_s
        while True:
            try:
                fd = os.open(self.lock_path, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
                try:
                    os.write(fd, self._token.encode())
                finally:
                    os.close(fd)
                self._start_heartbeat()
                return True
            except FileExistsError:
                self._break_if_stale()
                if time.monotonic() >= deadline:
                    return False
                time.sleep(poll_s)

    def _start_heartbeat(self) -> None:
        if self.ttl_s <= 0:
            return  # breaking disabled → refresh unnecessary
        stop = threading.Event()

        def beat() -> None:
            while not stop.wait(max(self.ttl_s / 4.0, 0.05)):
                try:
                    # fencing check: touch only OUR lock — if the file
                    # was TTL-broken and re-acquired, the token differs
                    # and this holder must not refresh the successor's
                    # lock (it should treat its own lease as lost)
                    with open(self.lock_path) as f:
                        if f.read() != self._token:
                            return
                    os.utime(self.lock_path)
                except OSError:
                    return

        t = threading.Thread(target=beat, name="fs-lock-heartbeat", daemon=True)
        t.start()
        self._hb_stop, self._hb_thread = stop, t

    def _break_if_stale(self) -> None:
        if self.ttl_s <= 0:
            return  # breaking disabled
        try:
            if time.time() - os.stat(self.lock_path).st_mtime <= self.ttl_s:
                return
        except FileNotFoundError:
            return  # holder released — nothing to break
        # rename-to-break: os.replace is atomic, so exactly one waiter
        # moves the stale file aside (the losers see FileNotFoundError
        # and fall through to the normal O_EXCL race). Removing the
        # renamed file can never touch a successor's fresh lock.
        broken = f"{self.lock_path}.broken.{self._token}"
        try:
            os.replace(self.lock_path, broken)
            os.remove(broken)
        except FileNotFoundError:
            # another contender broke the expired lock first — the lock
            # file is gone either way, which is the post-condition here
            logging.getLogger(__name__).debug(
                "expired lock %s already broken by a peer", self.lock_path
            )

    def unlock(self) -> None:
        # stop the heartbeat first so it can't resurrect the mtime of a
        # lock we are about to release
        if self._hb_stop is not None:
            self._hb_stop.set()
            self._hb_thread.join(timeout=5.0)
            self._hb_stop = self._hb_thread = None
        # release only OUR lock: after a TTL break the path may belong
        # to another writer (ownership token mismatch → no-op).
        try:
            with open(self.lock_path) as f:
                owner = f.read()
        except FileNotFoundError:
            return
        if owner == self._token:
            try:
                os.remove(self.lock_path)
            except FileNotFoundError:
                # released twice / broken by a peer after expiry: the
                # desired end state (no lock file) already holds
                logging.getLogger(__name__).debug(
                    "lock %s already released", self.lock_path
                )
